"""Driver benchmark: denoising steps/sec/chip on the 40-step reverse SDE.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- TPU side: the flagship mlsb ScoreNet (full 256-dim config) docking the DB5
  complex 1AVX (395 residues) with NUM_POSES vmapped poses x 40 jitted SDE
  steps on one chip.
- Baseline: a reference-cost eager-PyTorch implementation (single pose,
  sequential steps, dense O(N^2) featurization — the reference's operating
  mode; see dfmdock_tpu/bench/torch_baseline.py) measured on this host's CPU,
  since the reference's checkpoints/deps are absent (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_POSES = 16
NUM_STEPS = 40


def measure_tpu():
    import jax
    import jax.numpy as jnp

    from dfmdock_tpu.config import DFMDockConfig, ModelConfig, SamplerConfig
    from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
    from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
    from dfmdock_tpu.models import ScoreNet
    from dfmdock_tpu.sampler import EMSampler

    # fused Pallas edge pipeline + bf16 MXU compute (f32 accumulation): score
    # errors are orders of magnitude below the SDE's injected noise
    cfg = DFMDockConfig(
        model=ModelConfig(compute_dtype="bfloat16", use_pallas=True),
        sampler=SamplerConfig(num_steps=NUM_STEPS),
    )
    net = ScoreNet(cfg.model)
    params = net.init(jax.random.PRNGKey(0))
    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(cfg.diffuser.so3)
    sampler = EMSampler(net, r3, so3, cfg.sampler)

    ds = NPZDataset("data/db5_npz")
    raw = ds.load_raw(ds.ids.index("1AVX"))
    batch = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}

    run = jax.jit(lambda p, b, k: sampler.sample(p, b, k, NUM_POSES))

    import numpy as np

    def sync(r):
        # materialize on host: block_until_ready is not reliable on the
        # experimental axon backend
        return float(np.asarray(r["energy"]).sum()) + float(
            np.asarray(r["pos"]).sum()
        )

    # compile + warmup
    res = run(params, batch, jax.random.PRNGKey(1))
    sync(res)

    reps = 3
    start = time.perf_counter()
    for i in range(reps):
        res = run(params, batch, jax.random.PRNGKey(2 + i))
        sync(res)
    elapsed = time.perf_counter() - start

    total_steps = reps * NUM_POSES * NUM_STEPS
    return {
        "steps_per_sec_chip": total_steps / elapsed,
        "poses_per_sec": reps * NUM_POSES / elapsed,
        "sec_per_pose": elapsed / (reps * NUM_POSES),
        "complex": raw["id"],
        "n_residues": int(raw["rec_x"].shape[0] + raw["lig_x"].shape[0]),
    }


def measure_torch_baseline():
    from dfmdock_tpu.bench.torch_baseline import time_em_steps
    from dfmdock_tpu.data.convert import load_npz_complex
    from dfmdock_tpu.features.residues import sequence_to_onehot
    import numpy as np

    raw = load_npz_complex("data/db5_npz/1AVX.npz")
    rec_x = np.concatenate([raw["rec_x"], sequence_to_onehot(raw["rec_seq"])], -1)
    lig_x = np.concatenate([raw["lig_x"], sequence_to_onehot(raw["lig_seq"])], -1)
    sec_per_step = time_em_steps(
        rec_x, lig_x, raw["rec_pos"], raw["lig_pos"], num_steps=4
    )
    return 1.0 / sec_per_step  # steps/sec, single pose, CPU


def main():
    tpu = measure_tpu()
    try:
        baseline_sps = measure_torch_baseline()
    except Exception as e:  # keep the bench line intact if torch breaks
        print(f"# torch baseline failed: {e}", file=sys.stderr)
        baseline_sps = None

    value = tpu["steps_per_sec_chip"]
    vs = (value / baseline_sps) if baseline_sps else None
    print(
        json.dumps(
            {
                "metric": "denoising_steps_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "steps/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "detail": {
                    **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in tpu.items()},
                    "baseline_steps_per_sec_torch_cpu_1pose": round(baseline_sps, 4)
                    if baseline_sps
                    else None,
                    "num_poses": NUM_POSES,
                    "num_steps": NUM_STEPS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
