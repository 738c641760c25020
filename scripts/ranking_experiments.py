"""Eval-time energy-ranking experiments on held-out CV folds (VERDICT r3 #3).

Round-3 CV showed the min-energy pick underperforming a random pick on
held-out targets (0.019 vs 0.024 mean DockQ) and Spearman(energy, DockQ)
~ 0 (scripts/ranking_analysis.py).  Two cheap hypotheses are testable with
EXISTING fold checkpoints, no retraining:

  H1 (edge noise): the energy is evaluated through ONE stochastic sparse
     graph draw (Gumbel top-k edge sampling, models/edges.py) — if the
     within-pose energy std across edge draws rivals the between-pose
     spread, single-draw ranking is mostly noise, and averaging K draws
     should recover whatever signal exists.
  H2 (t mismatch): the reference ranks by energy at t ~ 0, where held-out
     poses are far off-manifold; the energy surface at moderate t is
     smoother and may rank better.  (reference inference.py:533 ranks by
     the terminal-step energy; we re-score the SAME final poses at several
     t values.)

For each held-out complex: re-sample P poses with the fold checkpoint
(same protocol as cv_folds eval: 40 samples, 40-step EM), then re-score
every pose at each t in --t-list with K independent edge draws.  Alongside
the energy it records two confidence keys with no reference counterpart:
icons (interface self-consistency BCE between the ires head and the pose's
own contacts) and snorm (predicted score magnitude; small near the learned
manifold) — both rank like energy (lower = better).  Writes a per-pose CSV
({energy,icons,snorm}_t*_mean/std/first) that scripts/ranking_analysis.py
can rank with any --energy-key.

    python scripts/ranking_experiments.py --fold 0 [--t-list ...] [--k 8]

ONE TPU process at a time (NOTES.md).
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.cli.common import (
    build_sampler, dock_complex, load_model, make_runner, write_csv,
)
from dfmdock_tpu.config import DFMDockConfig, ModelConfig, SamplerConfig
from dfmdock_tpu.data.batching import round_up
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch

CV_DIR = os.path.join(REPO, "ckpts/db5_cv")


def fold_holdout(i):
    ds = NPZDataset(os.path.join(REPO, "data/db5_npz"))
    ids = sorted(ds.ids)
    k = len(ids) // 6
    return ids[i * k : (i + 1) * k]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold", type=int, required=True)
    ap.add_argument("--ckpt", default=None,
                    help="default: ckpts/db5_cv/fold{fold}/last")
    ap.add_argument("--ids", default=None)
    ap.add_argument("--num-samples", type=int, default=40)
    ap.add_argument("--num-steps", type=int, default=40)
    ap.add_argument("--t-list", default="1e-5,0.05,0.1,0.2,0.4")
    ap.add_argument("--k", type=int, default=8,
                    help="independent edge draws per (pose, t)")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--out-csv", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    ckpt = args.ckpt or os.path.join(CV_DIR, f"fold{args.fold}", "last")
    out_csv = args.out_csv or os.path.join(
        CV_DIR, f"fold{args.fold}", "ranking_exp.csv")
    ids = (args.ids.split(",") if args.ids else fold_holdout(args.fold))
    t_list = [float(s) for s in args.t_list.split(",")]

    cfg = DFMDockConfig(
        model=ModelConfig.fast(),
        sampler=SamplerConfig(num_steps=args.num_steps),
    )
    net, params = load_model(ckpt, cfg)
    sampler = build_sampler(net, cfg)
    run_fn = make_runner(sampler, args.num_samples)

    # vmapped re-scorer: one executable per bucket size (t and key are
    # device values, not trace constants)
    def score_one(params_, batch_, pos_p, t, key):
        from dfmdock_tpu.train.losses import _bce_logits, interface_labels

        b = dict(batch_)
        b["pos"] = pos_p
        b["t"] = t
        out = net.apply(params_, b, key, predict=True)
        # confidence keys beyond the reference's terminal energy:
        #   icons — interface self-consistency: BCE between the predicted
        #     interface-residue logits (trained on TRUE interfaces) and the
        #     scored pose's OWN geometric interface; native-like poses agree
        #     with the head, decoys need not (lower = better, like energy).
        #   snorm — predicted score magnitude at this t: poses on the learned
        #     manifold sit near a fixed point of the reverse SDE, so small
        #     |score| signals an on-distribution pose (lower = better).
        labels = interface_labels(pos_p, batch_["lig_mask"], batch_["node_mask"])
        icons = _bce_logits(out["ires"], labels,
                            batch_["node_mask"].astype(jnp.float32))
        snorm = jnp.sqrt((out["tr_score"] ** 2).sum()) + jnp.sqrt(
            (out["rot_score"] ** 2).sum())
        return out["energy"], icons, snorm

    scorer = jax.jit(jax.vmap(score_one, in_axes=(None, None, 0, None, 0)))

    done = set()
    rows = []
    if args.resume and os.path.exists(out_csv):
        with open(out_csv) as f:
            for r in csv.DictReader(f):
                rows.append(r)
                done.add(r["id"])

    ds = NPZDataset(os.path.join(REPO, "data/db5_npz"))
    key = jax.random.PRNGKey(args.seed)
    for cid in ids:
        key, sub = jax.random.split(key)
        if cid in done:
            continue
        raw = ds.load_raw(ds.ids.index(cid))
        native = (raw["rec_pos"], raw["lig_pos"])
        n = raw["rec_x"].shape[0] + raw["lig_x"].shape[0]
        pad_to = round_up(n, 128)
        recs, results, (R, L) = dock_complex(
            sampler, params, raw, sub, args.num_samples, native=native,
            pad_to=pad_to, run_fn=run_fn,
        )
        print(f"{cid}: sampled {args.num_samples} poses", flush=True)

        batch = {k_: jnp.asarray(v)
                 for k_, v in complex_to_batch(raw, pad_to=pad_to).items()}
        # append the NATIVE pose as one extra row so every energy column is
        # also evaluated on it (GT-vs-decoy margin, scripts/gt_margin_probe)
        pos_all = jnp.concatenate(
            [results["pos"], batch["pos"][None]], axis=0)
        P = args.num_samples + 1
        gt_rec = {"id": cid, "index": "gt", "DockQ": 1.0, "c_rmsd": 0.0,
                  "i_rmsd": 0.0, "l_rmsd": 0.0, "fnat": 1.0,
                  "energy": "", "num_clashes": ""}
        recs = recs + [gt_rec]

        for ti, t in enumerate(t_list):
            t_dev = jnp.float32(t)
            draws = {"energy": [], "icons": [], "snorm": []}
            cidx = ds.ids.index(cid)
            for kk in range(args.k):
                # deterministic per (complex, t, draw): fold indices, never
                # python hash() (randomized per process)
                kdraw = jax.random.PRNGKey(args.seed + 1000)
                for fold_val in (cidx, ti, kk):
                    kdraw = jax.random.fold_in(kdraw, fold_val)
                keys = jax.random.split(kdraw, P)
                e, ic, sn = scorer(params, batch, pos_all, t_dev, keys)
                for name, v in (("energy", e), ("icons", ic), ("snorm", sn)):
                    draws[name].append(np.asarray(v, np.float64))
            tname = f"{t:g}".replace("-", "m")
            for name, ds_ in draws.items():
                arr = np.stack(ds_, 1)  # [P, K]
                for i in range(P):
                    recs[i][f"{name}_t{tname}_first"] = arr[i, 0]
                    recs[i][f"{name}_t{tname}_mean"] = arr[i].mean()
                    recs[i][f"{name}_t{tname}_std"] = arr[i].std()
            e_draws = np.stack(draws["energy"], 1)
            print(f"{cid}: t={t} within-pose std {e_draws.std(1).mean():.4f} "
                  f"between-pose std {e_draws.mean(1).std():.4f}", flush=True)

        rows.extend(recs)
        write_csv(out_csv, rows)  # checkpoint after every complex
    print(f"wrote {out_csv} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
