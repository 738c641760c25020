"""Component-level timing of the ScoreNet forward on the real TPU.

Times (P=16 vmapped, N=448): full forward, edge selection, 6D bins, EGNN
stack, energy head, and the single_embed matmul — to rank optimization
targets.  Run: python scripts/profile_forward.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.config import DFMDockConfig
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
from dfmdock_tpu.features.positional import relpos_bin_at
from dfmdock_tpu.features.sixd import pairwise_ca_dist, sixd_bins_at, spatial_embed_from_bins
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models import modules as nnm
from dfmdock_tpu.models.edges import select_edges
from dfmdock_tpu.models.egnn import egnn_apply

P = 16
REPS = 10

cfg = DFMDockConfig()
net = ScoreNet(cfg.model)
params = net.init(jax.random.PRNGKey(0))
ds = NPZDataset("data/db5_npz")
raw = ds.load_raw(ds.ids.index("1AVX"))
batch = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}
batch["t"] = jnp.float32(0.5)
keys = jax.random.split(jax.random.PRNGKey(1), P)


def bench(name, fn, *args):
    out = fn(*args)
    s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())  # sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        s += float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:28s} {dt:8.2f} ms  ({dt/P:6.3f} ms/pose)")
    return dt


@jax.jit
def full(params, batch, keys):
    return jax.vmap(lambda k: net.apply(params, batch, k, predict=True)["energy"])(keys)


@jax.jit
def edges_only(batch, keys):
    d = pairwise_ca_dist(batch["pos"])
    return jax.vmap(
        lambda k: select_edges(k, d, batch["node_mask"])[1].sum()
    )(keys)


@jax.jit
def feats_only(batch, keys):
    d = pairwise_ca_dist(batch["pos"])

    def one(k):
        idx, em = select_edges(k, d, batch["node_mask"])
        db, ob, tb, pb = sixd_bins_at(batch["pos"], idx)
        e = spatial_embed_from_bins(params["spatial_embed"]["w"], db, ob, tb, pb)
        rp = relpos_bin_at(batch["res_id"], batch["asym_id"], idx)
        return (e + params["positional_embed"]["w"][rp]).sum()

    return jax.vmap(one)(keys)


@jax.jit
def embed_only(params, batch, keys):
    return jax.vmap(lambda k: nnm.linear(params["single_embed"], batch["x"]).sum())(keys)


@jax.jit
def egnn_only(params, batch, keys):
    d = pairwise_ca_dist(batch["pos"])
    h0 = nnm.linear(params["single_embed"], batch["x"])
    lig_valid = batch["lig_mask"] * batch["node_mask"].astype(jnp.float32)

    def one(k):
        idx, em = select_edges(k, d, batch["node_mask"])
        db, ob, tb, pb = sixd_bins_at(batch["pos"], idx)
        e = spatial_embed_from_bins(params["spatial_embed"]["w"], db, ob, tb, pb)
        rp = relpos_bin_at(batch["res_id"], batch["asym_id"], idx)
        e = e + params["positional_embed"]["w"][rp]
        h, c = egnn_apply(
            params["egnn"], h0, batch["pos"][:, 1], idx, em, e,
            batch["node_mask"], lig_valid, normalize=True,
        )
        return h.sum() + c.sum()

    return jax.vmap(one)(keys)


@jax.jit
def energy_only(params, batch, keys):
    h = nnm.linear(params["single_embed"], batch["x"])
    valid = batch["node_mask"].astype(jnp.float32)
    lig_valid = batch["lig_mask"] * valid
    rec_valid = (1 - batch["lig_mask"]) * valid
    d = pairwise_ca_dist(batch["pos"])
    pm = rec_valid[:, None] * lig_valid[None, :] * (d < 20.0)
    return jax.vmap(lambda k: net._energy(params["to_energy"], h * (k[0] % 2 + 1), pm))(keys)


print(f"N={batch['x'].shape[0]}  P={P}  reps={REPS}")
bench("full forward", full, params, batch, keys)
bench("edge selection", edges_only, batch, keys)
bench("edge features (6D+relpos)", feats_only, batch, keys)
bench("single_embed", embed_only, params, batch, keys)
bench("egnn stack (all above+6L)", egnn_only, params, batch, keys)
bench("energy head", energy_only, params, batch, keys)
