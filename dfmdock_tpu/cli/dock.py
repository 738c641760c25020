"""Single/batch docking CLI — the inference_single.py / inference_base.py
equivalent, TPU-native.

Inputs: either a preprocessed --npz complex (carries ESM embeddings) or two
PDB files (--pdb REC LIG; ESM2 via a locally cached HF model).  All requested
poses run as ONE jitted vmapped reverse SDE; the minimum-energy pose is
written (inference_base.py:601-670 semantics).

Examples:
  python -m dfmdock_tpu.cli.dock --npz data/db5_npz/1AVX.npz --num-samples 16
  python -m dfmdock_tpu.cli.dock --pdb rec.pdb lig.pdb --ckpt ckpts/dips.ckpt
  python -m dfmdock_tpu.cli.dock --csv pairs.csv --out-dir out/
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from dfmdock_tpu.cli.common import build_sampler, dock_complex, load_model, make_runner, write_csv
from dfmdock_tpu.config import DFMDockConfig, SamplerConfig
from dfmdock_tpu.data.convert import load_npz_complex
from dfmdock_tpu.data.pdb_io import get_full_coords, parse_pdb, save_pdb
from dfmdock_tpu.sampler import EMSampler


def load_inputs(args) -> list[dict]:
    """Resolve inputs to a list of raw complex dicts."""
    jobs = []
    if args.npz:
        d = load_npz_complex(args.npz)
        d["id"] = os.path.splitext(os.path.basename(args.npz))[0]
        jobs.append(d)
    elif args.pdb:
        jobs.append(_complex_from_pdbs("complex", args.pdb[0], args.pdb[1], args))
    elif args.csv:
        import csv

        with open(args.csv) as f:
            for row in csv.reader(f):
                cid, p1, p2 = row[0], row[1], row[2]
                if p1.endswith(".npz"):
                    d = load_npz_complex(p1)
                    d["id"] = cid
                    jobs.append(d)
                else:
                    jobs.append(_complex_from_pdbs(cid, p1, p2, args))
    return jobs


def _complex_from_pdbs(cid, rec_pdb, lig_pdb, args):
    rec = parse_pdb(rec_pdb)
    lig = parse_pdb(lig_pdb)
    if args.one_hot_only:
        rec_x = np.zeros((len(rec.seq), 1280), np.float32)
        lig_x = np.zeros((len(lig.seq), 1280), np.float32)
    else:
        from dfmdock_tpu.data.esm import get_provider

        esm = get_provider(args.esm_backend)
        rec_x = esm.embed(rec.seq)
        lig_x = esm.embed(lig.seq)
    return {
        "id": cid,
        "rec_x": rec_x,
        "rec_pos": rec.bb_coords,
        "rec_seq": rec.seq,
        "lig_x": lig_x,
        "lig_pos": lig.bb_coords,
        "lig_seq": lig.seq,
    }


def _reranker_scores(net, params, raw, results, rows, weights_path,
                     k_draws, seed):
    """Score every pose with the learned linear re-ranker (higher = better).

    Reproduces scripts/fit_reranker.py's deployment contract exactly: the
    feature matrix is the (family, t)-grid of K-draw mean scores named in the
    weights JSON (e.g. ``energy_t1em05_mean``) plus ``num_clashes``, z-scored
    WITHIN this complex, then dotted with the fitted weights.  Feature t
    values are parsed back from the column names, so the CLI follows whatever
    grid the weights were fit on."""
    import json

    from dfmdock_tpu.cli.sweep import _multi_draw_scores

    with open(weights_path) as f:
        spec = json.load(f)
    feats, w = spec["features"], np.asarray(spec["weights"], np.float64)
    pos_all = results["pos"]
    n_poses, pad_to = int(pos_all.shape[0]), int(pos_all.shape[1])
    per_t = {}  # t -> {energy/icons/snorm: [P]}
    X = np.zeros((n_poses, len(feats)), np.float64)
    for j, name in enumerate(feats):
        if name == "num_clashes":
            X[:, j] = [r["num_clashes"] for r in rows]
            continue
        fam, rest = name.split("_t", 1)
        if not rest.endswith("_mean") or fam not in ("energy", "icons", "snorm"):
            raise ValueError(f"unsupported reranker feature {name!r} — the "
                             "CLI computes *_t*_mean grids and num_clashes")
        t = float(rest[: -len("_mean")].replace("m", "-"))
        if t not in per_t:
            per_t[t] = _multi_draw_scores(
                net, params, raw, pos_all, pad_to, k_draws, seed, t_eval=t)
        X[:, j] = per_t[t][fam]
    mu, sd = X.mean(0), X.std(0)
    Xz = (X - mu) / np.where(sd > 1e-12, sd, 1.0)
    return Xz @ w


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--npz", help="preprocessed complex npz")
    src.add_argument("--pdb", nargs=2, metavar=("REC", "LIG"), help="two PDB files")
    src.add_argument("--csv", help="CSV of (id, input1, input2) rows")
    ap.add_argument("--ckpt", default=None,
                    help="orbax dir or torch Lightning .ckpt (default: random init)")
    ap.add_argument("--out-dir", default="./out")
    ap.add_argument("--out-csv", default="metrics.csv")
    ap.add_argument("--num-samples", type=int, default=16)
    ap.add_argument("--num-steps", type=int, default=40)
    ap.add_argument("--tr-noise-scale", type=float, default=0.5)
    ap.add_argument("--rot-noise-scale", type=float, default=0.5)
    ap.add_argument("--use-clash-force", action="store_true")
    ap.add_argument("--noise-annealing", action="store_true")
    ap.add_argument("--ode", action="store_true")
    ap.add_argument("--integrator", choices=["em", "heun"], default="em",
                    help="heun: 2nd-order probability-flow ODE (implies --ode)")
    ap.add_argument("--picard-iters", type=int, default=0,
                    help="latency mode: solve the probability-flow ODE by K "
                         "parallel-in-time Picard iterations instead of "
                         "num-steps sequential evals (implies --ode; measured "
                         "SLOWER than sequential on v5e at this model size — "
                         "see NOTES.md/scripts/picard_latency.py)")
    ap.add_argument("--one-hot-only", action="store_true",
                    help="skip ESM (model must be trained without it)")
    ap.add_argument("--esm-backend", choices=["auto", "jax", "hf"], default="auto",
                    help="'jax' = pure-JAX ESM2 on TPU; 'hf' = torch CPU")
    ap.add_argument("--energy-draws", type=int, default=1,
                    help="> 1: rank by the mean energy over K independent "
                         "edge-sampling draws (denoised ranking; the "
                         "reference scores one draw)")
    ap.add_argument("--rank-by",
                    choices=["energy", "icons", "snorm", "reranker"],
                    default="energy",
                    help="pose-ranking key: energy (reference behavior, "
                         "inference_base.py:653-657), icons (interface "
                         "self-consistency) or snorm (score magnitude) — all "
                         "lower = better — or 'reranker': the learned linear "
                         "combination of t-grid energy/icons/snorm features "
                         "(scripts/fit_reranker.py; the only key measured "
                         "held-out-positive on the DB5 CV rotation, "
                         "ckpts/db5_cv/reranker.md)")
    ap.add_argument("--reranker-weights",
                    default=os.path.join(
                        os.path.dirname(os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__)))),
                        "ckpts", "db5_cv", "reranker_weights.json"),
                    help="feature/weight JSON from scripts/fit_reranker.py "
                         "--weights-out (used by --rank-by reranker)")
    ap.add_argument("--reranker-draws", type=int, default=4,
                    help="edge-sampling draws per t when computing reranker "
                         "features (4 = the value the committed weights were "
                         "fit with)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--write-all-poses", action="store_true")
    ap.add_argument("--exact", action="store_true",
                    help="f32 XLA path (default: bf16 + fused Pallas kernels)")
    ap.add_argument("--dp", action="store_true",
                    help="shard poses over all visible devices (jax.sharding "
                         "Mesh; num-samples must divide by the device count)")
    args = ap.parse_args(argv)

    from dfmdock_tpu.config import ModelConfig

    cfg = DFMDockConfig(
        model=ModelConfig() if args.exact else ModelConfig.fast(),
        sampler=SamplerConfig(
            num_steps=args.num_steps,
            tr_noise_scale=args.tr_noise_scale,
            rot_noise_scale=args.rot_noise_scale,
            use_clash_force=args.use_clash_force,
            noise_annealing=args.noise_annealing,
            ode=args.ode or args.integrator == "heun" or args.picard_iters > 0,
            integrator=args.integrator,
        )
    )
    net, params = load_model(args.ckpt, cfg)
    sampler = build_sampler(net, cfg)
    if args.picard_iters > 0:
        from dfmdock_tpu.sampler import PicardSampler

        assert not args.dp, "--picard-iters does not support --dp pose sharding"
        assert args.integrator == "em", "--picard-iters is its own scheme; drop --integrator"
        # each Picard pose holds a [T, N, 3, 3] state and runs T net evals per
        # iteration; vmapping many poses compiles T*P concurrent evals and can
        # exhaust HBM at full model size (ADVICE r2) — it is a latency (P~1)
        # mode, not a throughput mode
        assert args.num_samples <= 4, (
            f"--picard-iters is a single-pose latency mode; --num-samples "
            f"{args.num_samples} > 4 would vmap {args.num_samples} full "
            f"[T,N,3,3] Picard states (HBM hazard). Use the default sampler "
            f"for throughput."
        )
        # reuse the EMSampler's diffusers (a fresh SO3Diffuser would redo the
        # IGSO3 table load)
        sampler = PicardSampler(
            net, sampler.r3, sampler.so3, cfg.sampler, num_iters=args.picard_iters
        )
        run_fn = jax.jit(
            lambda p, b, k: sampler.sample(p, b, k, args.num_samples)
        )
    else:
        run_fn = make_runner(sampler, args.num_samples, dp=args.dp)
    os.makedirs(args.out_dir, exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    all_rows = []
    for job in load_inputs(args):
        key, sub = jax.random.split(key)
        native = (job["rec_pos"], job["lig_pos"])
        rows, results, (R, L) = dock_complex(
            sampler, params, job, sub, args.num_samples, native=native,
            run_fn=run_fn,
        )
        if args.rank_by == "reranker":
            scores = _reranker_scores(
                net, params, job, results, rows, args.reranker_weights,
                args.reranker_draws, args.seed)
            for i, r in enumerate(rows):
                r["rerank_score"] = float(scores[i])
            best = int(np.argmax(scores))  # reranker: higher = better
        elif args.energy_draws > 1 or args.rank_by != "energy":
            from dfmdock_tpu.cli.sweep import _multi_draw_scores

            scores = _multi_draw_scores(
                net, params, job, results["pos"],
                int(results["pos"].shape[1]), args.energy_draws, args.seed,
                t_eval=cfg.sampler.eps,
            )
            for i, r in enumerate(rows):
                if args.energy_draws > 1:
                    r["energy_first_draw"] = r["energy"]
                    r["energy"] = float(scores["energy"][i])
                r["icons"] = float(scores["icons"][i])
                r["snorm"] = float(scores["snorm"][i])
            best = int(np.argmin(scores[args.rank_by]))
        else:
            best = int(EMSampler.rank_by_energy(results))
        all_rows.extend(rows)
        pos = np.asarray(results["pos"])
        indices = range(args.num_samples) if args.write_all_poses else [best]
        for i in indices:
            coords = np.concatenate([pos[i, :R], pos[i, R : R + L]])
            save_pdb(
                os.path.join(args.out_dir, f"{job['id']}_{i}.pdb"),
                get_full_coords(coords),
                job["rec_seq"] + job["lig_seq"],
                delim=R - 1,
            )
        print(
            f"{job['id']}: best pose {best} energy {rows[best]['energy']:.4f}"
            + (f" DockQ {rows[best].get('DockQ', float('nan')):.3f}" if "DockQ" in rows[best] else "")
        )

    write_csv(os.path.join(args.out_dir, args.out_csv), all_rows)
    print(f"wrote {os.path.join(args.out_dir, args.out_csv)}")


if __name__ == "__main__":
    main()
