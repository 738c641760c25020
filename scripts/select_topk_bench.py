"""A/B the fused selection kernel (ops/select_topk.py) on the real TPU.

Times the jitted 40-step EM sampler at P poses with edge selection done by
the Pallas extraction kernel (select_kernel=True) vs the XLA approx_max_k
sorts (False), plus an on-device output-parity check (bit-exact expected:
same key -> same Gumbel -> same selections).

Run AFTER any training/CV process has released the TPU (one process rule,
NOTES.md):  python scripts/select_topk_bench.py [P] [--edge-table]
(--edge-table turns the round-3 edge-table kernel on in BOTH arms, so the
A/B isolates selection with the featurize already fused.)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dfmdock_tpu.config import DFMDockConfig, ModelConfig, SamplerConfig
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler

args = [a for a in sys.argv[1:] if not a.startswith("-")]
P = int(args[0]) if args else 40
T = 40
EDGE_TABLE = "--edge-table" in sys.argv


def main():
    import jax.numpy as jnp

    ds = NPZDataset(os.path.join(os.path.dirname(__file__), "../data/db5_npz"))
    raw = ds.load_raw(ds.ids.index("1AVX"))
    batch = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}

    results = {}
    outs = {}
    for flag in (False, True):
        mcfg = ModelConfig(
            compute_dtype="bfloat16", use_pallas=True,
            edge_table_kernel=EDGE_TABLE, select_kernel=flag,
        )
        cfg = DFMDockConfig(model=mcfg, sampler=SamplerConfig(num_steps=T))
        net = ScoreNet(mcfg)
        params = net.init(jax.random.PRNGKey(0))
        sampler = EMSampler(
            net, R3Diffuser(cfg.diffuser.r3), SO3Diffuser(cfg.diffuser.so3),
            cfg.sampler,
        )
        run = jax.jit(lambda p, b, k: sampler.sample(p, b, k, P))

        sync = lambda r: float(np.asarray(r["energy"]).sum()) + float(
            np.asarray(r["pos"]).sum()
        )
        t0 = time.perf_counter()
        sync(run(params, batch, jax.random.PRNGKey(1)))
        print(f"select_kernel={flag}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            sync(run(params, batch, jax.random.PRNGKey(2 + i)))
        dt = (time.perf_counter() - t0) / reps
        results[flag] = dt
        outs[flag] = run(params, batch, jax.random.PRNGKey(99))
        print(
            f"select_kernel={flag}: {dt*1e3:.1f} ms/run "
            f"({P * T / dt:.1f} steps/s/chip, {P / dt:.2f} poses/s)",
            flush=True,
        )

    # same key -> same Gumbel -> bit-identical selections -> identical
    # trajectories (interpret-mode tests prove equality; this re-proves it
    # under the Mosaic lowering).  A HARD gate: this A/B is what flips
    # select_kernel in ModelConfig.fast(), so divergence must fail the run,
    # not just print.
    ok = True
    for k in ("pos", "energy"):
        a, b = np.asarray(outs[False][k]), np.asarray(outs[True][k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f"parity {k}: max-abs-rel {rel:.2e}", flush=True)
        ok &= rel < 1e-6
    if not ok:
        print("PARITY FAILED — compiled selections diverge; do NOT flip "
              "select_kernel", flush=True)
        sys.exit(1)

    speedup = results[False] / results[True]
    print(f"SPEEDUP x{speedup:.3f} (XLA sorts {results[False]*1e3:.1f} ms -> "
          f"kernel {results[True]*1e3:.1f} ms) [edge_table={EDGE_TABLE}]",
          flush=True)


if __name__ == "__main__":
    main()
