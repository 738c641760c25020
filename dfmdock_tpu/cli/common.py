"""Shared CLI plumbing: model/params loading and per-complex docking runs."""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

# persistent compilation cache: dataset sweeps re-use per-bucket executables
# across processes (first-compile on the TPU tunnel is expensive)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import numpy as np

from dfmdock_tpu.config import DFMDockConfig, SamplerConfig
from dfmdock_tpu.data.dataset import complex_to_batch
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.eval import compute_metrics
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler


def load_model(ckpt: str | None, cfg: DFMDockConfig, seed: int = 0,
               lineage: str = "mlsb"):
    """Build a score model (mlsb ScoreNet or DFMDock wrapper) and load params.

    ckpt: None -> random init; *.ckpt -> torch Lightning conversion;
    directory -> orbax restore.
    """
    if lineage == "mlsb":
        net = ScoreNet(cfg.model)
    else:
        from dfmdock_tpu.models.dfmdock import DFMDockModel

        net = DFMDockModel(cfg.model)
    params = net.init(jax.random.PRNGKey(seed))
    if ckpt is None:
        return net, params
    if os.path.isdir(ckpt):
        from dfmdock_tpu.train.trainer import Trainer

        return net, Trainer.load(ckpt, params)
    from dfmdock_tpu.utils.torch_convert import load_lightning_checkpoint

    converted, _ = load_lightning_checkpoint(ckpt, lineage=lineage)
    return net, jax.tree_util.tree_map(jnp.asarray, converted)


def build_diffusers(cfg: DFMDockConfig):
    return R3Diffuser(cfg.diffuser.r3), SO3Diffuser(cfg.diffuser.so3)


def build_sampler(net, cfg: DFMDockConfig):
    r3, so3 = build_diffusers(cfg)
    return EMSampler(net, r3, so3, cfg.sampler)


def make_runner(sampler, num_samples: int, dp: bool = False):
    """Pose runner: (params, batch, key) -> results with a leading pose axis.

    dp=True shards the poses over all visible devices via the 'dp' mesh
    (zero collectives in the hot loop — poses are independent); dp=False runs
    them vmapped on one device.  Build ONCE per sweep so the jit cache is
    shared across complexes (bucketed shapes retrace, same executable cache).
    """
    if dp:
        from dfmdock_tpu.parallel import make_mesh, make_pose_parallel_sampler

        mesh = make_mesh()
        n_dev = mesh.devices.size
        assert num_samples % n_dev == 0, (
            f"--dp needs num_samples ({num_samples}) divisible by the device "
            f"count ({n_dev})"
        )
        return make_pose_parallel_sampler(sampler, mesh, num_samples)
    return lambda params, batch, key: sampler.sample_jit(
        params, batch, key, num_samples
    )


def dock_complex(
    sampler,
    params,
    raw: dict,
    key,
    num_samples: int,
    native: tuple | None = None,
    pad_to: int | None = None,
    run_fn=None,
):
    """Sample num_samples poses for one complex; return per-sample records
    and the raw results (positions padded)."""
    batch_np = complex_to_batch(raw, pad_to=pad_to)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    if run_fn is None:
        results = sampler.sample_jit(params, batch, key, num_samples)
    else:
        results = run_fn(params, batch, key)

    R = int(raw["rec_x"].shape[0])
    L = int(raw["lig_x"].shape[0])
    pos = np.asarray(results["pos"])
    energies = np.asarray(results["energy"])
    clashes = np.asarray(results["num_clashes"])

    records = []
    for i in range(num_samples):
        rec = {"id": raw.get("id", "complex"), "index": str(i)}
        if native is not None:
            rec.update(
                compute_metrics((pos[i, :R], pos[i, R : R + L]), native)
            )
        rec["energy"] = float(energies[i])
        rec["num_clashes"] = int(clashes[i])
        records.append(rec)
    return records, results, (R, L)


def write_csv(path: str, rows: list[dict]):
    import csv

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # union of keys in first-seen order: resumed rows from an older run may
    # lack columns a newer run adds (missing cells write empty)
    fields = {}
    for r in rows:
        for k in r:
            fields[k] = None
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(fields))
        w.writeheader()
        for r in rows:
            w.writerow(r)
