"""Latency: Picard parallel-in-time ODE vs the sequential sampler, on-device.

Measures single-pose wall-clock (P=1, the latency-critical regime) for the
sequential ODE sampler at T steps vs Picard at K iterations, plus the Picard
iterate's convergence (max ligand-CA deviation from the sequential solution
as a function of K) on a trained checkpoint.

Usage: python scripts/picard_latency.py --ckpt ckpts/db5_holdout/last
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from dfmdock_tpu.cli.common import build_diffusers, load_model
from dfmdock_tpu.config import DFMDockConfig, ModelConfig, SamplerConfig
from dfmdock_tpu.data.batching import round_up
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
from dfmdock_tpu.sampler import EMSampler, PicardSampler
from dfmdock_tpu.sampler.em import randomize_pose


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--complex", default="1AVX")
    ap.add_argument("--num-steps", type=int, default=40)
    ap.add_argument("--iters", default="2,4,6,8,12")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

    cfg = DFMDockConfig(
        model=ModelConfig.fast(),
        sampler=SamplerConfig(num_steps=args.num_steps, ode=True),
    )
    net, params = load_model(args.ckpt, cfg)
    r3, so3 = build_diffusers(cfg)
    em = EMSampler(net, r3, so3, cfg.sampler)

    ds = NPZDataset("data/db5_npz")
    raw = ds.load_raw(ds.ids.index(args.complex))
    n = raw["rec_x"].shape[0] + raw["lig_x"].shape[0]
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in
             complex_to_batch(raw, pad_to=round_up(n, 128)).items()}

    key = jax.random.PRNGKey(0)
    init = randomize_pose(
        jax.random.fold_in(key, 0), batch["pos"], batch["lig_mask"],
        batch["node_mask"], cfg.sampler,
    )

    def timed(fn, label):
        out = fn()
        ref = np.asarray(out["pos"])  # host materialization == sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
            np.asarray(out["pos"]).sum()
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{label:34s} {ms:8.1f} ms/pose")
        return ms, ref

    seq = jax.jit(lambda: em.sample_one(params, batch, key, init=init))
    seq_ms, seq_pos = timed(seq, f"sequential ODE T={args.num_steps}")

    lig = np.asarray(batch["lig_mask"]) > 0
    rows = []
    for k_it in [int(s) for s in args.iters.split(",")]:
        pc = PicardSampler(net, r3, so3, cfg.sampler, num_iters=k_it)
        fn = jax.jit(lambda pc=pc: pc.sample_one(params, batch, key, init=init))
        ms, pos = timed(fn, f"picard K={k_it}")
        dev = float(np.abs(pos[lig, 1] - seq_pos[lig, 1]).max())
        rows.append({"K": k_it, "ms": round(ms, 1),
                     "speedup": round(seq_ms / ms, 2),
                     "max_lig_ca_dev_A": round(dev, 3)})
        print(f"    max lig-CA deviation vs sequential: {dev:.3f} A")

    import json
    print(json.dumps({"sequential_ms": round(seq_ms, 1), "picard": rows,
                      "num_steps": args.num_steps, "complex": args.complex}))


if __name__ == "__main__":
    main()
