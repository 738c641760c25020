"""Benchmark sweep over a dataset — the inference_mlsb.py equivalent.

Runs N sampled poses per complex over an NPZ dataset (default: the bundled
DB5 test set), writes the DockQ/energy CSV, optional final-pose PDBs and
multi-MODEL trajectory PDBs, and supports the gt-energy probe mode
(inference_mlsb.py:219-227).  The sweep is re-entrant: finished complexes
found in the CSV are skipped on resume (--resume).
"""
from __future__ import annotations

import argparse
import csv
import os

import jax
import numpy as np

from dfmdock_tpu.cli.common import build_sampler, dock_complex, load_model, make_runner
from dfmdock_tpu.config import DFMDockConfig, SamplerConfig
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
from dfmdock_tpu.data.pdb_io import get_full_coords, save_pdb, save_trajectory
from dfmdock_tpu.eval import compute_metrics

import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="data/db5_npz")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out-csv", default="csv_files/sweep.csv")
    ap.add_argument("--out-pdb-dir", default=None, help="write best-pose PDBs here")
    ap.add_argument("--out-trj-dir", default=None, help="write trajectory PDBs here")
    ap.add_argument("--num-samples", type=int, default=1)
    ap.add_argument("--num-steps", type=int, default=40)
    ap.add_argument("--tr-noise-scale", type=float, default=0.5)
    ap.add_argument("--rot-noise-scale", type=float, default=0.5)
    ap.add_argument("--ode", action="store_true")
    ap.add_argument("--integrator", choices=["em", "heun"], default="em",
                    help="heun: 2nd-order probability-flow ODE (implies --ode)")
    ap.add_argument("--use-clash-force", action="store_true")
    ap.add_argument("--gt-energy", action="store_true",
                    help="evaluate the ground-truth pose energy only")
    ap.add_argument("--energy-draws", type=int, default=1,
                    help="> 1: replace each pose's ranking energy with the "
                         "mean over K independent edge-sampling draws "
                         "(denoises the stochastic-graph energy estimate; "
                         "the reference scores one draw, inference.py:533)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--ids", default=None,
                    help="comma-separated complex ids to run (e.g. a held-out split)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--bucket", type=int, default=128,
                    help="pad N up to multiples of this (fewer recompiles)")
    ap.add_argument("--lineage", choices=["mlsb", "dfmdock"], default="mlsb")
    ap.add_argument("--exact", action="store_true",
                    help="f32 XLA path (default: bf16 + fused Pallas kernels)")
    ap.add_argument("--dp", action="store_true",
                    help="shard poses over all visible devices (jax.sharding "
                         "Mesh; num-samples must divide by the device count)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from dfmdock_tpu.config import ModelConfig

    cfg = DFMDockConfig(
        model=ModelConfig() if args.exact else ModelConfig.fast(),
        sampler=SamplerConfig(
            num_steps=args.num_steps,
            tr_noise_scale=args.tr_noise_scale,
            rot_noise_scale=args.rot_noise_scale,
            use_clash_force=args.use_clash_force,
            ode=args.ode or args.integrator == "heun",
            integrator=args.integrator,
        )
    )
    net, params = load_model(args.ckpt, cfg, lineage=args.lineage)
    sampler = build_sampler(net, cfg)
    run_fn = make_runner(sampler, args.num_samples, dp=args.dp)
    ds = NPZDataset(args.data_dir)
    # --ids filters the FULL dataset; --limit truncates afterwards (applying
    # the limit first would silently drop explicitly requested complexes)
    ids = ds.ids
    if args.ids:
        want = {s.strip() for s in args.ids.split(",") if s.strip()}
        missing = sorted(want - set(ds.ids))
        assert not missing, f"--ids not in dataset: {missing}"
        ids = [i for i in ids if i in want]
    if args.limit:
        ids = ids[: args.limit]

    done = set()
    rows = []
    if args.resume and os.path.exists(args.out_csv):
        with open(args.out_csv) as f:
            for row in csv.DictReader(f):
                rows.append(row)
                done.add(row["id"])

    key = jax.random.PRNGKey(args.seed)
    for idx, cid in enumerate(ids):
        if cid in done:
            continue
        raw = ds.load_raw(ds.ids.index(cid))
        native = (raw["rec_pos"], raw["lig_pos"])
        key, sub = jax.random.split(key)

        if args.gt_energy:
            batch = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}
            batch["t"] = jnp.float32(1e-5)
            out = net.apply(params, batch, sub, predict=True)
            rec = {"id": cid}
            rec.update(compute_metrics(native, native))
            rec["energy"] = float(out["energy"])
            rec["num_clashes"] = int(out["num_clashes"])
            rows.append(rec)
        else:
            from dfmdock_tpu.data.batching import round_up

            n = raw["rec_x"].shape[0] + raw["lig_x"].shape[0]
            recs, results, (R, L) = dock_complex(
                sampler, params, raw, sub, args.num_samples, native=native,
                pad_to=round_up(n, args.bucket), run_fn=run_fn,
            )
            if args.energy_draws > 1:
                e = _multi_draw_energy(
                    net, params, raw, results["pos"],
                    round_up(n, args.bucket), args.energy_draws, args.seed,
                    t_eval=cfg.sampler.eps,
                )
                for i, r in enumerate(recs):
                    r["energy_first_draw"] = r["energy"]
                    r["energy"] = float(e[i])
            rows.extend(recs)
            pos = np.asarray(results["pos"])
            if args.out_pdb_dir:
                os.makedirs(args.out_pdb_dir, exist_ok=True)
                for i in range(args.num_samples):
                    coords = np.concatenate([pos[i, :R], pos[i, R : R + L]])
                    save_pdb(
                        os.path.join(args.out_pdb_dir, f"{cid}_p{i}.pdb"),
                        get_full_coords(coords),
                        raw["rec_seq"] + raw["lig_seq"],
                        delim=R - 1,
                    )
            if args.out_trj_dir:
                os.makedirs(args.out_trj_dir, exist_ok=True)
                # re-run pose 0 with trajectory recording
                batch = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}
                one = sampler.sample_one(
                    params, batch, jax.random.split(sub, args.num_samples)[0],
                    record_trajectory=True,
                )
                traj = np.asarray(one["trajectory"])
                save_trajectory(
                    os.path.join(args.out_trj_dir, f"{cid}_p0.pdb"),
                    [t[:R] for t in traj],
                    [t[R : R + L] for t in traj],
                    raw["rec_seq"],
                    raw["lig_seq"],
                )
        print(f"[{idx + 1}/{len(ids)}] {cid} done")
        _write(args.out_csv, rows)

    _write(args.out_csv, rows)
    print(f"wrote {args.out_csv} ({len(rows)} rows)")


_SCORERS = {}


def _multi_draw_scores(net, params, raw, pos_all, pad_to, k_draws, seed,
                       t_eval=1e-3):
    """Mean ranking scores over k independent edge-sampling draws, vmapped
    over poses: energy (the reference's key), icons (interface
    self-consistency BCE) and snorm (predicted score magnitude) — all
    lower-is-better.  The per-pose scores depend on ONE stochastic
    sparse-graph draw; averaging draws denoises the ranking without touching
    sampling (one executable per bucket size; t_eval matches the sampler's
    terminal step)."""
    batch = {k: jnp.asarray(v)
             for k, v in complex_to_batch(raw, pad_to=pad_to).items()}

    if id(net) not in _SCORERS:
        def score_one(params_, batch_, pos_p, t, key):
            from dfmdock_tpu.train.losses import _bce_logits, interface_labels

            b = dict(batch_)
            b["pos"] = pos_p
            b["t"] = t
            out = net.apply(params_, b, key, predict=True)
            labels = interface_labels(
                pos_p, batch_["lig_mask"], batch_["node_mask"])
            icons = _bce_logits(out["ires"], labels,
                                batch_["node_mask"].astype(jnp.float32))
            snorm = jnp.sqrt((out["tr_score"] ** 2).sum()) + jnp.sqrt(
                (out["rot_score"] ** 2).sum())
            return out["energy"], icons, snorm

        _SCORERS[id(net)] = jax.jit(
            jax.vmap(score_one, in_axes=(None, None, 0, None, 0)))
    scorer = _SCORERS[id(net)]

    p_count = pos_all.shape[0]
    acc = {k: np.zeros(p_count, np.float64)
           for k in ("energy", "icons", "snorm")}
    t_dev = jnp.float32(t_eval)
    for kk in range(k_draws):
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(seed + 99), kk), p_count)
        e, ic, sn = scorer(params, batch, pos_all, t_dev, keys)
        for name, v in (("energy", e), ("icons", ic), ("snorm", sn)):
            acc[name] += np.asarray(v, np.float64)
    return {k: v / k_draws for k, v in acc.items()}


def _multi_draw_energy(net, params, raw, pos_all, pad_to, k_draws, seed,
                       t_eval=1e-3):
    return _multi_draw_scores(
        net, params, raw, pos_all, pad_to, k_draws, seed, t_eval)["energy"]


def _write(path, rows):
    if not rows:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keys = sorted({k for r in rows for k in r}, key=lambda k: (k != "id", k))
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in rows:
            w.writerow(r)


if __name__ == "__main__":
    main()
