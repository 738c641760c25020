"""In-jit ablation timing: which part of the ScoreNet forward costs what.

Each variant runs 20 scan iterations inside ONE jit (feedback carry defeats
CSE), so per-iteration numbers exclude dispatch overhead.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.config import ModelConfig
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
from dfmdock_tpu.features.positional import relpos_bin_at
from dfmdock_tpu.features.sixd import pairwise_ca_dist, sixd_bins_at, spatial_embed_from_bins
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models import modules as nnm
from dfmdock_tpu.models.edges import select_edges
from dfmdock_tpu.models.egnn import egnn_apply

P, ITERS = 16, 20
cfg = ModelConfig()
net = ScoreNet(cfg)
params = net.init(jax.random.PRNGKey(0))
ds = NPZDataset("data/db5_npz")
raw = ds.load_raw(ds.ids.index("1AVX"))
batch = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}
batch["t"] = jnp.float32(0.5)
N = batch["x"].shape[0]
keys = jax.random.split(jax.random.PRNGKey(1), P)

valid = batch["node_mask"].astype(jnp.float32)
lig_valid = batch["lig_mask"] * valid
rec_valid = (1 - batch["lig_mask"]) * valid


def timed(name, step_fn):
    """step_fn(carry_scalar, key) -> scalar; scanned ITERS times, vmapped P."""

    @jax.jit
    def run(params, batch, keys):
        def pose(k):
            def body(c, i):
                kk = jax.random.fold_in(k, i)
                return step_fn(c, kk), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
            return out

        return jax.vmap(pose)(keys)

    float(np.asarray(run(params, batch, keys)).sum())
    t0 = time.perf_counter()
    for _ in range(3):
        float(np.asarray(run(params, batch, keys)).sum())
    ms = (time.perf_counter() - t0) / 3 / ITERS * 1e3
    print(f"{name:34s} {ms:8.2f} ms/iter ({ms/P:6.3f} ms/pose)")
    return ms


def perturbed_pos(c):
    # feed the carry back into positions to defeat CSE across iterations
    return batch["pos"] + c * 1e-6


# 1. full forward
def full_step(c, k):
    b = dict(batch)
    b["pos"] = perturbed_pos(c)
    return net.apply(params, b, k, predict=True)["energy"] + c


# 2. distance matrix + edge selection only
def edges_step(c, k):
    pos = perturbed_pos(c)
    d = pairwise_ca_dist(pos)
    idx, em = select_edges(k, d, batch["node_mask"])
    return em.sum() * 1e-9 + idx.sum() * 1e-12 + c


# 3. + 6D bins + edge embed
def feats_step(c, k):
    pos = perturbed_pos(c)
    d = pairwise_ca_dist(pos)
    idx, em = select_edges(k, d, batch["node_mask"])
    db, ob, tb, pb = sixd_bins_at(pos, idx)
    e = spatial_embed_from_bins(params["spatial_embed"]["w"], db, ob, tb, pb)
    rp = relpos_bin_at(batch["res_id"], batch["asym_id"], idx)
    e = e + params["positional_embed"]["w"][rp]
    return e.sum() * 1e-9 + c


# 4. + EGNN stack
def egnn_step(c, k):
    pos = perturbed_pos(c)
    d = pairwise_ca_dist(pos)
    idx, em = select_edges(k, d, batch["node_mask"])
    db, ob, tb, pb = sixd_bins_at(pos, idx)
    e = spatial_embed_from_bins(params["spatial_embed"]["w"], db, ob, tb, pb)
    rp = relpos_bin_at(batch["res_id"], batch["asym_id"], idx)
    e = e + params["positional_embed"]["w"][rp]
    h0 = nnm.linear(params["single_embed"], batch["x"])
    h, co = egnn_apply(
        params["egnn"], h0, pos[:, 1], idx, em, e,
        batch["node_mask"], lig_valid, normalize=True,
    )
    return h.sum() * 1e-9 + co.sum() * 1e-9 + c


# 5. energy head alone (h persistent)
h_fixed = nnm.linear(params["single_embed"], batch["x"])
d_fixed = pairwise_ca_dist(batch["pos"])
pm_fixed = rec_valid[:, None] * lig_valid[None, :] * (d_fixed < 20.0)


def energy_step(c, k):
    return net._energy(params["to_energy"], h_fixed + c * 1e-6, pm_fixed) + c


# 6. single_embed alone
def embed_step(c, k):
    return nnm.linear(params["single_embed"], batch["x"] + c * 1e-6).sum() * 1e-9 + c


print(f"N={N} P={P} iters={ITERS}")
timed("full forward", full_step)
timed("dist + edge selection", edges_step)
timed("+ 6D/relpos edge features", feats_step)
timed("+ EGNN 6 layers", egnn_step)
timed("energy head alone", energy_step)
timed("single_embed alone", embed_step)
