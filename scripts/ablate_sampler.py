"""In-scan ablation of the CURRENT sampler hot path (pallas + bf16 +
scores_only), at a configurable pose count.  Each variant runs ITERS scan
iterations inside one jit with a feedback carry (defeats CSE/LICM), so the
per-iteration cost is what the EM sampler actually pays per step.

Usage: python scripts/ablate_sampler.py [P]
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
from dfmdock_tpu.features.sixd import pairwise_ca_dist, sixd_bins_at
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models.edges import select_edges
from dfmdock_tpu.models.egnn import egnn_apply_fused

P = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = 20

cfg = ModelConfig.fast()
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
h0 = net.embed_nodes(params, batch["x"])


def timed(name, step_fn):
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
    print(f"{name:36s} {ms:8.2f} ms/iter ({ms/P:6.3f} ms/pose)")
    return ms


def perturbed_pos(c):
    return batch["pos"] + c * 1e-6


def full_step(c, k):
    b = dict(batch)
    b["h0"] = h0
    b["pos"] = perturbed_pos(c)
    out = net.apply(params, b, k, predict=True, scores_only=True)
    return out["tr_score"].sum() * 1e-6 + c


def dist_step(c, k):
    d = pairwise_ca_dist(perturbed_pos(c))
    return d.sum() * 1e-12 + c


def edges_step(c, k):
    d = pairwise_ca_dist(perturbed_pos(c))
    idx, em = select_edges(k, d, batch["node_mask"])
    return em.sum() * 1e-9 + idx.sum() * 1e-12 + c


def knn_only_step(c, k):
    d = pairwise_ca_dist(perturbed_pos(c))
    masked_neg = jnp.where(batch["node_mask"][None, :], -d, -1e30)
    _, knn_idx = jax.lax.top_k(masked_neg, 20)
    return knn_idx.sum() * 1e-12 + c


def gumbel_only_step(c, k):
    d = pairwise_ca_dist(perturbed_pos(c))
    g = jax.random.gumbel(k, d.shape)
    _, si = jax.lax.top_k(-3.0 * jnp.log(jnp.maximum(d, 1e-10)) + g, 40)
    return si.sum() * 1e-12 + c


def bins_step(c, k):
    pos = perturbed_pos(c)
    d = pairwise_ca_dist(pos)
    idx, em = select_edges(k, d, batch["node_mask"])
    db, ob, tb, pb = sixd_bins_at(pos, idx)
    rp = relpos_bin_at(batch["res_id"], batch["asym_id"], idx)
    return (db.sum() + ob.sum() + tb.sum() + pb.sum() + rp.sum()).astype(
        jnp.float32
    ) * 1e-9 + c


def egnn_step(c, k):
    pos = perturbed_pos(c)
    d = pairwise_ca_dist(pos)
    idx, em = select_edges(k, d, batch["node_mask"])
    db, ob, tb, pb = sixd_bins_at(pos, idx)
    rp = relpos_bin_at(batch["res_id"], batch["asym_id"], idx)
    h, co = egnn_apply_fused(
        params["egnn"], params["spatial_embed"]["w"],
        params["positional_embed"]["w"],
        h0, pos[:, 1], idx, em, (db, ob, tb, pb), rp,
        batch["node_mask"], lig_valid,
        normalize=True, dtype=jnp.bfloat16,
    )
    return h.sum() * 1e-9 + co.sum() * 1e-9 + c


print(f"N={N} P={P} iters={ITERS} (pallas + bf16 + scores_only)")
timed("full scores_only step", full_step)
timed("dist matrix", dist_step)
timed("dist + select_edges", edges_step)
timed("dist + knn top_k only", knn_only_step)
timed("dist + gumbel top_k only", gumbel_only_step)
timed("dist + edges + 6D/relpos bins", bins_step)
timed("... + fused EGNN", egnn_step)
