"""Driver benchmark: denoising steps/sec/chip on the 40-step reverse SDE.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

- Headline: flagship mlsb ScoreNet (full 256-dim config, pallas + bf16)
  docking DB5 1AVX (395 residues, padded 448) at the reference's pinder
  operating point of 40 samples/complex (inference.py:533) x 40 jitted SDE
  steps, one chip.  detail.scaling covers P in {16, 40, 64, 120} (120 =
  the dips operating point, inference_base.py:644).
- Compiled-Pallas parity gate (VERDICT r2 Weak #5): before timing, the fused
  bf16 kernels' predict outputs are checked on-device against the f32 XLA
  path over a MATRIX of padded sizes (synthetic complexes at N in {128, 256,
  640} + real 1AVX at 448) and diffusion times t in {0.1, 0.5, 0.9}; the
  worst deviation per output is asserted and recorded.
- MFU is reported TWO ways (VERDICT r2 Weak #2):
    device_matmul_mfu  — FLOPs the MXU actually executes, including the
                         one-hot gather/broadcast/seg-sum matmuls that
                         implement index ops (a device-busy proxy);
    algorithmic_mfu    — only algorithmically-required FLOPs (edge/node
                         MLPs, projections; gathers counted at ~zero) —
                         the honest utilization number.
- Baseline: a reference-cost eager-PyTorch implementation (single pose,
  sequential steps, dense O(N^2) featurization — the reference's operating
  mode; see dfmdock_tpu/bench/torch_baseline.py) measured on this host's
  CPU, since the reference's checkpoints/deps are absent (BASELINE.md).
  NOTE the caveat: the reference would typically run on one GPU; a modern
  GPU is plausibly 10-50x this CPU baseline, so read vs_baseline
  accordingly (it is NOT a GPU comparison).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache (same dir the CLIs use): the bench builds
# ~13 executables (parity matrix + P sweep) and the TPU tunnel's
# first-compile/first-exec cost dominates a cold run — warm runs reuse them
import jax  # noqa: E402

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

NUM_STEPS = 40
POSE_COUNTS = (16, 40, 64, 120)
HEADLINE_POSES = 40

# Outage resilience (VERDICT r3 Missing #1): the axon TPU tunnel can be down
# when the driver runs this — probe the backend in SUBPROCESSES (a failed
# in-process init is cached by jax) and retry for a bounded window before
# giving up with a structured error line.
BACKEND_WAIT_TOTAL_S = 600
BACKEND_PROBE_TIMEOUT_S = 330  # first device init can stall 3-5 min
BACKEND_PROBE_INTERVAL_S = 45


def wait_for_backend():
    """Block until a jax backend initializes in a probe subprocess, retrying
    through tunnel outages for <= BACKEND_WAIT_TOTAL_S.  Returns True if a
    backend came up, False if the window expired."""
    import subprocess

    deadline = time.monotonic() + BACKEND_WAIT_TOTAL_S
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.monotonic()
        if budget <= 0:
            return False
        try:
            # the probe must EXECUTE work, not just enumerate devices: in
            # the observed outage mode the backend registers fine while
            # every dispatch hangs (round-5 tunnel drop — a futex-wedged
            # trainer with jax.devices() still answering)
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp, numpy as np\n"
                 "y = jax.jit(lambda a: a @ a)(jnp.ones((128, 128)))\n"
                 "assert float(np.asarray(y).sum()) == 128.0 ** 3\n"
                 "print(jax.devices()[0].platform)"],
                capture_output=True, text=True,
                timeout=min(BACKEND_PROBE_TIMEOUT_S, max(budget, 30)),
            )
        except subprocess.TimeoutExpired:
            r = None
        if r is not None and r.returncode == 0:
            print(f"# backend up ({r.stdout.strip()}) after {attempt} probe(s)",
                  file=sys.stderr, flush=True)
            return True
        msg = (r.stderr.strip().splitlines() or ["timeout"])[-1] if r else "probe timeout"
        print(f"# backend probe {attempt} failed: {msg[:200]}; retrying",
              file=sys.stderr, flush=True)
        time.sleep(min(BACKEND_PROBE_INTERVAL_S, max(deadline - time.monotonic(), 0)))

# compiled-Pallas vs XLA-f32 tolerance (max |diff| / max |ref|), worst case
# over the full parity matrix.  The fused kernels run their big matmuls in
# bf16 with f32 accumulation and 2-3-pass bf16-split dots on gate-sensitive
# reductions, so deviations are bf16-rounding scale (r3 measured: energy
# ~2e-3, tr ~6e-4, rot ~4e-3, f ~9e-3, ires ~2e-2 worst-case over the
# matrix — orders below the SDE's injected noise).
PARITY_TOL = {"energy": 1e-2, "tr_score": 1e-2, "rot_score": 2e-2, "f": 5e-2,
              "ires": 1e-1}
# The rel metric divides by max|ref|; the energy/ires outputs are means of
# many cancelling terms, so their magnitude can be arbitrarily small at
# random weights while the absolute error stays at bf16 scale of the
# underlying h activations.  A case passes on EITHER criterion.
PARITY_ABS = {"energy": 5e-3, "tr_score": 1e-3, "rot_score": 2e-3, "f": 5e-3,
              "ires": 5e-3}
PARITY_T = (0.1, 0.5, 0.9)

V5E_PEAK_BF16 = 197e12  # FLOP/s per chip


def _nets():
    import jax

    from dfmdock_tpu.config import ModelConfig
    from dfmdock_tpu.models import ScoreNet

    fast = ScoreNet(ModelConfig.fast())
    slow = ScoreNet(ModelConfig())
    params = fast.init(jax.random.PRNGKey(0))
    return fast, slow, params


def _batch():
    import jax.numpy as jnp

    from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch

    ds = NPZDataset("data/db5_npz")
    raw = ds.load_raw(ds.ids.index("1AVX"))
    return raw, {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}


def _synthetic_batch(n_pad, seed=0):
    """A synthetic padded complex at an arbitrary bucket size."""
    import jax.numpy as jnp
    import numpy as np

    from dfmdock_tpu.data.batching import pad_complex

    r = np.random.RandomState(seed)
    n_rec = int(n_pad * 0.55)
    n_lig = int(n_pad * 0.38)
    # N/CA/C must NOT be collinear: a collinear backbone degenerates the
    # virtual-CB frame and puts every omega/theta dihedral EXACTLY on a bin
    # boundary (0/180 deg), turning the measure-zero boundary-flip case into
    # 7% of edges in the edge-table HW gate (round 4).  Realistic tetrahedral
    # offsets + per-residue jitter keep the synthetic geometry generic.
    mk = lambda ca: np.stack(
        [
            ca + [-1.2, 0.8, 0.35] + r.randn(*ca.shape) * 0.05,
            ca,
            ca + [1.3, 0.7, -0.4] + r.randn(*ca.shape) * 0.05,
        ],
        1,
    )
    rec_ca = np.cumsum(r.randn(n_rec, 3) * 1.5 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(r.randn(n_lig, 3) * 1.5 + [3.8, 0, 0], axis=0) + [12, 6, 0]
    b = pad_complex(
        r.randn(n_rec, 1301).astype(np.float32),
        r.randn(n_lig, 1301).astype(np.float32),
        mk(rec_ca).astype(np.float32), mk(lig_ca).astype(np.float32),
        pad_to=n_pad,
    )
    return {k: jnp.asarray(v) for k, v in b.items()}


def pallas_parity_check(fast, slow, params, real_batch):
    """Compiled fused-kernel outputs vs the f32 XLA path, on-device, over a
    matrix of padded sizes and diffusion times.  Returns worst-case rels."""
    import jax
    import numpy as np

    cases = [("1AVX/448", real_batch)]
    for n_pad in (128, 256, 640):
        cases.append((f"synth/{n_pad}", _synthetic_batch(n_pad, seed=n_pad)))

    f_fast = jax.jit(lambda p, b, k: fast.apply(p, b, k, predict=True))
    f_slow = jax.jit(lambda p, b, k: slow.apply(p, b, k, predict=True))

    worst = {name: 0.0 for name in PARITY_TOL}
    worst_case = {name: "" for name in PARITY_TOL}
    # which criterion each (output, case) passed on — "rel", "abs", or
    # "both" — so an abs-only escape on a normally rel-passing output is
    # visible as a regression in the bench JSON (ADVICE r3)
    criteria = {name: {"rel": 0, "abs_only": 0} for name in PARITY_TOL}
    abs_only_at = {name: [] for name in PARITY_TOL}
    for label, batch in cases:
        for t in PARITY_T:
            b = dict(batch)
            # device scalar, NOT a python float: a float constant-folds into
            # the trace and every t value becomes its own executable — 24
            # cold compiles through the TPU tunnel instead of 8
            b["t"] = jax.numpy.float32(t)
            key = jax.random.PRNGKey(7)
            print(f"# parity {label} t={t}", file=sys.stderr, flush=True)
            o_fast = f_fast(params, b, key)
            o_slow = f_slow(params, b, key)
            for name, tol in PARITY_TOL.items():
                a = np.asarray(o_fast[name], np.float32)
                r = np.asarray(o_slow[name], np.float32)
                abs_err = float(np.abs(a - r).max())
                rel = abs_err / (float(np.abs(r).max()) + 1e-8)
                if rel > worst[name]:
                    worst[name] = rel
                    worst_case[name] = f"{label}@t={t} (abs {abs_err:.2e})"
                if rel < tol:
                    criteria[name]["rel"] += 1
                else:
                    criteria[name]["abs_only"] += 1
                    abs_only_at[name].append(f"{label}@t={t}")
                assert rel < tol or abs_err < PARITY_ABS[name], (
                    f"compiled Pallas parity FAILED at {label} t={t}: "
                    f"{name} max-rel {rel} >= {tol} AND abs {abs_err} >= "
                    f"{PARITY_ABS[name]}"
                )
    return {k: {"max_rel": round(v, 6), "at": worst_case[k],
                "passed_on": criteria[k],
                **({"abs_only_cases": abs_only_at[k]} if abs_only_at[k] else {})}
            for k, v in worst.items()}


def _flops_per_step_pose(cfg, n):
    """(device_matmul, algorithmic) FLOPs of one scores_only forward.

    device: what the MXU executes in the r3 fused kernel (real rows, not
    K-padding): one stacked one-hot matmul (gather+broadcast+spatial+relpos),
    edge-MLP l1, 2-pass seg-sum, XLA-side projections/node MLP and the
    hi/mid/lo one-hot gathers of the 6D featurizer.
    algorithmic: only the math the algorithm requires — table lookups and
    gathers at ~zero FLOPs."""
    e = n * cfg.edges_per_node
    c = cfg.node_dim
    bn = 64 if n % 128 == 64 else 128  # ops/fused_egcl.block_n
    stacked_rows = n + bn + 103 + 66
    per_layer_dev = (
        2 * e * stacked_rows * c   # stacked one-hot mega-matmul
        + 2 * e * c * c            # edge MLP l1
        + 2 * (2 * e * bn * c)     # seg-sum (2-pass bf16 split)
        + 2 * e * c                # att reduce
        + 2 * 2 * n * c * c        # a/b projections
        + 2 * n * (2 * c) * c + 2 * n * c * c  # node MLP
    )
    coord_dev = 2 * e * c * c + 3 * 2 * e * c  # cw matmul + w/trans dots
    featurize_dev = 3 * 2 * e * n * 8  # sixd/relpos one-hot gathers (hi/mid/lo)
    device = cfg.depth * per_layer_dev + coord_dev + featurize_dev

    per_layer_alg = (
        2 * e * c * c              # edge MLP l1
        + 2 * 2 * n * c * c        # a/b projections
        + 7 * e * c                # edge-feature adds + att + seg-sum + gate
        + 2 * n * (2 * c) * c + 2 * n * c * c  # node MLP
    )
    algorithmic = cfg.depth * per_layer_alg + 2 * e * c * c + 20 * e
    return device, algorithmic


def measure_tpu():
    import jax
    import numpy as np

    from dfmdock_tpu.config import DFMDockConfig, ModelConfig, SamplerConfig
    from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
    from dfmdock_tpu.sampler import EMSampler

    fast, slow, params = _nets()
    raw, batch = _batch()
    parity = pallas_parity_check(fast, slow, params, batch)

    cfg = DFMDockConfig(
        model=ModelConfig.fast(),
        sampler=SamplerConfig(num_steps=NUM_STEPS),
    )
    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(cfg.diffuser.so3)
    sampler = EMSampler(fast, r3, so3, cfg.sampler)

    def sync(r):
        # materialize on host: block_until_ready is unreliable on this backend
        return float(np.asarray(r["energy"]).sum()) + float(np.asarray(r["pos"]).sum())

    n = int(batch["x"].shape[0])
    dev_flops, alg_flops = _flops_per_step_pose(cfg.model, n)
    scaling = {}
    for p_count in POSE_COUNTS:
        print(f"# timing P={p_count}", file=sys.stderr, flush=True)
        run = jax.jit(lambda pp, b, k, P=p_count: sampler.sample(pp, b, k, P))
        sync(run(params, batch, jax.random.PRNGKey(1)))  # compile + warmup
        reps = 3 if p_count <= 40 else 2
        start = time.perf_counter()
        for i in range(reps):
            sync(run(params, batch, jax.random.PRNGKey(2 + i)))
        dt = (time.perf_counter() - start) / reps
        steps = p_count * NUM_STEPS
        scaling[p_count] = {
            "steps_per_sec_chip": round(steps / dt, 2),
            "poses_per_sec": round(p_count / dt, 3),
            "sec_per_pose": round(dt / p_count, 4),
            "device_matmul_mfu_pct": round(
                100 * dev_flops * steps / dt / V5E_PEAK_BF16, 2
            ),
            "algorithmic_mfu_pct": round(
                100 * alg_flops * steps / dt / V5E_PEAK_BF16, 2
            ),
        }

    # DFMDock lineage (EGNN_Net, egnn_net.py:408-531) on the same fused
    # stack at the headline operating point (VERDICT r2 #6)
    from dfmdock_tpu.models.egnn_net import EGNNNet

    print("# timing dfmdock lineage", file=sys.stderr, flush=True)
    dnet = EGNNNet(cfg.model)
    dparams = dnet.init(jax.random.PRNGKey(0))
    dsampler = EMSampler(dnet, r3, so3, cfg.sampler)
    drun = jax.jit(lambda pp, b, k: dsampler.sample(pp, b, k, HEADLINE_POSES))
    sync(drun(dparams, batch, jax.random.PRNGKey(1)))
    start = time.perf_counter()
    for i in range(2):
        sync(drun(dparams, batch, jax.random.PRNGKey(2 + i)))
    ddt = (time.perf_counter() - start) / 2
    dfmdock_sps = round(HEADLINE_POSES * NUM_STEPS / ddt, 2)

    head = scaling[HEADLINE_POSES]
    return {
        "steps_per_sec_chip": head["steps_per_sec_chip"],
        "scaling": scaling,
        "pallas_parity": parity,
        "dfmdock_lineage_steps_per_sec_chip": dfmdock_sps,
        "complex": raw["id"],
        "n_residues": int(raw["rec_x"].shape[0] + raw["lig_x"].shape[0]),
        "n_padded": n,
    }


def measure_torch_baseline():
    import numpy as np

    from dfmdock_tpu.bench.torch_baseline import time_em_steps
    from dfmdock_tpu.data.convert import load_npz_complex
    from dfmdock_tpu.features.residues import sequence_to_onehot

    raw = load_npz_complex("data/db5_npz/1AVX.npz")
    rec_x = np.concatenate([raw["rec_x"], sequence_to_onehot(raw["rec_seq"])], -1)
    lig_x = np.concatenate([raw["lig_x"], sequence_to_onehot(raw["lig_seq"])], -1)
    sec_per_step = time_em_steps(
        rec_x, lig_x, raw["rec_pos"], raw["lig_pos"], num_steps=4
    )
    return 1.0 / sec_per_step  # steps/sec, single pose, CPU


def main():
    if not wait_for_backend():
        print(json.dumps({
            "metric": "denoising_steps_per_sec_per_chip",
            "value": None, "unit": "steps/s", "vs_baseline": None,
            "detail": {"error": "no jax backend came up within "
                       f"{BACKEND_WAIT_TOTAL_S}s (TPU tunnel outage?)"},
        }))
        sys.exit(1)
    from dfmdock_tpu.config import ModelConfig

    tpu = measure_tpu()
    try:
        baseline_sps = measure_torch_baseline()
    except Exception as e:  # keep the bench line intact if torch breaks
        print(f"# torch baseline failed: {e}", file=sys.stderr)
        baseline_sps = None

    value = tpu.pop("steps_per_sec_chip")
    vs = (value / baseline_sps) if baseline_sps else None
    print(
        json.dumps(
            {
                "metric": "denoising_steps_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "steps/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "detail": {
                    **tpu,
                    "baseline_steps_per_sec_torch_cpu_1pose": round(baseline_sps, 4)
                    if baseline_sps
                    else None,
                    "baseline_caveat": "eager-torch on host CPU; a single GPU would plausibly be 10-50x this",
                    "num_steps": NUM_STEPS,
                    "headline_poses": HEADLINE_POSES,
                    # which fused kernels this capture ran with (flipped in
                    # ModelConfig.fast after their hardware A/Bs)
                    "kernels": {
                        "edge_table": ModelConfig.fast().edge_table_kernel,
                        "select": ModelConfig.fast().select_kernel,
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
