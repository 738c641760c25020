"""Measure training-step throughput on the current backend (VERDICT r1 #8).

Breaks one mlsb training step into host batch-prep vs device step and times
the device step for f32 vs bf16 compute, with and without grad_energy
(the energy-conservation loss's second-order dedx path).

Usage: python scripts/profile_train.py [--crop 448] [--reps 20]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=448)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

    from dfmdock_tpu.cli.train import make_training_batch
    from dfmdock_tpu.config import DFMDockConfig, ExperimentConfig, ModelConfig
    from dfmdock_tpu.data.batching import round_up
    from dfmdock_tpu.data.dataset import NPZDataset
    from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
    from dfmdock_tpu.models import ScoreNet
    from dfmdock_tpu.train import make_optimizer
    from dfmdock_tpu.train.losses import loss_fn

    cfg = DFMDockConfig()
    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(cfg.diffuser.so3)
    ds = NPZDataset("data/db5_npz")
    rng = np.random.RandomState(0)
    pad_to = round_up(args.crop)

    raw = ds.load_raw(ds.ids.index("1AVX"))

    # host-side batch prep cost
    t0 = time.perf_counter()
    for _ in range(args.reps):
        b = make_training_batch(raw, args.crop, pad_to, rng)
    host_ms = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"host batch-prep: {host_ms:.1f} ms (crop {args.crop} pad {pad_to})")

    batch = {k: jnp.asarray(v) for k, v in b.items()}

    def sync(tree):
        return sum(float(np.asarray(x).sum()) for x in jax.tree.leaves(tree) if hasattr(x, "sum"))

    for dtype in ("float32", "bfloat16"):
        for ge in (False, True):
            net = ScoreNet(dataclasses.replace(cfg.model, compute_dtype=dtype))
            exp = dataclasses.replace(cfg.experiment, grad_energy=ge)
            params = net.init(jax.random.PRNGKey(0))
            opt = make_optimizer(params, exp)
            opt_state = opt.init(params)

            @jax.jit
            def step(params, opt_state, batch, key, net=net, exp=exp, opt=opt):
                (l, m), g = jax.value_and_grad(
                    lambda p: loss_fn(p, net, r3, so3, batch, key, exp), has_aux=True
                )(params)
                u, opt_state = opt.update(g, opt_state, params)
                return optax.apply_updates(params, u), opt_state, m

            t0 = time.perf_counter()
            p2, o2, m = step(params, opt_state, batch, jax.random.PRNGKey(1))
            sync(m)
            compile_s = time.perf_counter() - t0
            # warm
            p2, o2, m = step(p2, o2, batch, jax.random.PRNGKey(2))
            sync(m)
            t0 = time.perf_counter()
            for i in range(args.reps):
                p2, o2, m = step(p2, o2, batch, jax.random.PRNGKey(3 + i))
            sync(m)
            sync(p2)
            dt = (time.perf_counter() - t0) / args.reps
            print(
                f"dtype={dtype:9s} grad_energy={ge!s:5s}: {dt*1e3:8.1f} ms/step "
                f"({1/dt:6.2f} steps/s) loss={float(m['loss']):.4f} "
                f"[compile+first {compile_s:.1f}s]"
            )


if __name__ == "__main__":
    main()
