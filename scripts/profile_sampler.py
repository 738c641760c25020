"""xprof trace + hlo_stats of the full bench sampler on the real TPU.

Captures a jax.profiler trace of the jitted 40-step EM sampler at P poses
(the bench operating point), converts the raw trace with
xprof.convert.raw_to_tool_data (hlo_stats / op_profile), and prints the
top-k HLO ops by self time — the round-3 "where does the time go" table.

Run: python scripts/profile_sampler.py [P]
"""
import glob
import os
import sys
import time

os.environ.setdefault(
    "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
)  # xprof proto parsing (NOTES.md recipe)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dfmdock_tpu.config import DFMDockConfig, ModelConfig, SamplerConfig
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler

P = int(sys.argv[1]) if len(sys.argv) > 1 else 40
TRACE_DIR = "/tmp/xprof_sampler"


def main():
    import jax.numpy as jnp

    cfg = DFMDockConfig(
        model=ModelConfig.fast(),
        sampler=SamplerConfig(num_steps=40),
    )
    net = ScoreNet(cfg.model)
    params = net.init(jax.random.PRNGKey(0))
    ds = NPZDataset("data/db5_npz")
    raw = ds.load_raw(ds.ids.index("1AVX"))
    batch = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}

    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(cfg.diffuser.so3)
    sampler = EMSampler(net, r3, so3, cfg.sampler)

    run = jax.jit(lambda pp, b, k: sampler.sample(pp, b, k, P))

    def sync(r):
        return float(np.asarray(r["energy"]).sum())

    sync(run(params, batch, jax.random.PRNGKey(1)))  # compile + warm
    t0 = time.perf_counter()
    sync(run(params, batch, jax.random.PRNGKey(2)))
    dt = time.perf_counter() - t0
    print(f"P={P}: {dt:.3f} s/run, {P*40/dt:.1f} steps/s, {P/dt:.2f} poses/s")

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        sync(run(params, batch, jax.random.PRNGKey(3)))

    # ---- convert to hlo_stats
    xspaces = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xspaces)
    from xprof.convert import raw_to_tool_data as rttd

    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data, _ = rttd.xspace_to_tool_data([xspaces[0]], tool, {})
        except Exception as e:
            print(f"{tool} failed: {e}")
            continue
        out = f"/tmp/{tool}_{P}.csv"
        if isinstance(data, bytes):
            data = data.decode()
        with open(out, "w") as f:
            f.write(data)
        print(f"wrote {out} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
