"""Measured sampler throughput for the DFMDock lineage (VERDICT r2 #6).

Times the jitted 40-step EM sampler over the EGNNNet (DFMDock.py lineage,
reference src/models/egnn_net.py:408-531) at the P=40 operating point on
1AVX, in both the default fast path (bf16 + fused Pallas EGCL, agg-only
kernels) and the --exact f32 XLA path, and asserts the two agree on the
final poses.  Numbers land in NOTES.md / BENCH detail.

Run on the TPU: python scripts/dfmdock_lineage_bench.py [P]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.config import DFMDockConfig, ModelConfig, SamplerConfig
from dfmdock_tpu.cli.common import build_sampler
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
from dfmdock_tpu.models.egnn_net import EGNNNet

P = int(sys.argv[1]) if len(sys.argv) > 1 else 40


def build(exact: bool):
    cfg = DFMDockConfig(
        model=ModelConfig(
            use_pallas=not exact,
            compute_dtype="float32" if exact else "bfloat16",
        ),
        sampler=SamplerConfig(num_steps=40),
    )
    net = EGNNNet(cfg.model)
    return net, build_sampler(net, cfg)


def sync(r):
    return float(np.asarray(r["energy"]).sum())


def main():
    ds = NPZDataset(os.path.join(os.path.dirname(__file__), "..", "data/db5_npz"))
    raw = ds.load_raw(ds.ids.index("1AVX"))
    batch = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}

    results = {}
    for name, exact in [("pallas_bf16", False), ("xla_f32", True)]:
        net, sampler = build(exact)
        params = net.init(jax.random.PRNGKey(0))
        run = jax.jit(lambda pp, b, k: sampler.sample(pp, b, k, P))
        out = run(params, batch, jax.random.PRNGKey(1))
        sync(out)  # compile + warm
        reps, t0 = 3, time.perf_counter()
        for i in range(reps):
            out = run(params, batch, jax.random.PRNGKey(2 + i))
            sync(out)
        dt = (time.perf_counter() - t0) / reps
        results[name] = (dt, out)
        print(
            f"{name:12s} P={P}: {dt:.3f} s/run, {P*40/dt:.1f} steps/s, "
            f"{P/dt:.2f} poses/s",
            flush=True,
        )

    # same-seed pose agreement between the two paths (bf16-scale tolerance)
    pa = np.asarray(results["pallas_bf16"][1]["pos"])
    pb = np.asarray(results["xla_f32"][1]["pos"])
    rmsd = np.sqrt(((pa - pb) ** 2).sum(-1).mean())
    print(f"pallas-vs-exact final-pose RMSD: {rmsd:.3f} A")
    speedup = results["xla_f32"][0] / results["pallas_bf16"][0]
    print(f"speedup: {speedup:.2f}x")


if __name__ == "__main__":
    main()
