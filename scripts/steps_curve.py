"""DockQ-vs-num_steps curve: do fewer reverse-SDE steps preserve pose quality?

Runs a checkpoint over chosen complexes at several step counts (default
5/10/20/40), sampling P poses per complex per setting, and reports per-steps:
wall sec/pose, mean DockQ, best-energy-pose DockQ, and best-pose DockQ.
(VERDICT r1 #9: algorithmic sampling wins need a quality-vs-steps curve.)

Usage:
  python scripts/steps_curve.py --ckpt ckpts/db5_holdout/last \\
      --ids 1QA9,7CEI,2SIC,1JPS --num-samples 16 --steps 5,10,20,40
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from dfmdock_tpu.cli.common import build_sampler, dock_complex, load_model
from dfmdock_tpu.config import DFMDockConfig, ModelConfig, SamplerConfig
from dfmdock_tpu.data.batching import round_up
from dfmdock_tpu.data.dataset import NPZDataset


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="data/db5_npz")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--ids", default="1QA9,7CEI,2SIC,1JPS")
    ap.add_argument("--num-samples", type=int, default=16)
    ap.add_argument("--steps", default="5,10,20,40")
    ap.add_argument("--ode", action="store_true")
    ap.add_argument("--integrator", choices=["em", "heun"], default="em")
    ap.add_argument("--exact", action="store_true", help="f32 XLA (no Pallas)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    ds = NPZDataset(args.data_dir)
    ids = [s for s in args.ids.split(",") if s]
    step_counts = [int(s) for s in args.steps.split(",")]

    rows = []
    for num_steps in step_counts:
        cfg = DFMDockConfig(
            model=ModelConfig(
                use_pallas=not args.exact,
                compute_dtype="float32" if args.exact else "bfloat16",
            ),
            sampler=SamplerConfig(
                num_steps=num_steps, ode=args.ode or args.integrator == "heun",
                integrator=args.integrator,
            ),
        )
        net, params = load_model(args.ckpt, cfg)
        sampler = build_sampler(net, cfg)

        dockqs, best_e_dockqs, best_dockqs = [], [], []
        wall = 0.0
        for cid in ids:
            raw = ds.load_raw(ds.ids.index(cid))
            native = (raw["rec_pos"], raw["lig_pos"])
            n = raw["rec_x"].shape[0] + raw["lig_x"].shape[0]
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), num_steps)
            key = jax.random.fold_in(key, ds.ids.index(cid))
            # warmup/compile excluded from wall
            recs, results, _ = dock_complex(
                sampler, params, raw, key, args.num_samples, native=native,
                pad_to=round_up(n, 128),
            )
            t0 = time.perf_counter()
            recs, results, _ = dock_complex(
                sampler, params, raw, jax.random.fold_in(key, 1),
                args.num_samples, native=native, pad_to=round_up(n, 128),
            )
            wall += time.perf_counter() - t0

            dq = np.array([r["DockQ"] for r in recs])
            e = np.array([r["energy"] for r in recs])
            dockqs.extend(dq.tolist())
            best_e_dockqs.append(float(dq[np.argmin(e)]))
            best_dockqs.append(float(dq.max()))
            print(f"  steps={num_steps} {cid}: mean DockQ {dq.mean():.3f} "
                  f"best {dq.max():.3f} best-energy {dq[np.argmin(e)]:.3f}")

        row = {
            "num_steps": num_steps,
            "integrator": args.integrator,
            "sec_per_pose": round(wall / (len(ids) * args.num_samples), 4),
            "mean_dockq": round(float(np.mean(dockqs)), 4),
            "mean_best_energy_dockq": round(float(np.mean(best_e_dockqs)), 4),
            "mean_best_dockq": round(float(np.mean(best_dockqs)), 4),
        }
        rows.append(row)
        print(json.dumps(row))

    print(json.dumps({"curve": rows, "ids": ids, "num_samples": args.num_samples}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"curve": rows, "ids": ids, "num_samples": args.num_samples}, f, indent=1)


if __name__ == "__main__":
    main()
