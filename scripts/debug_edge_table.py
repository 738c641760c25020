"""Debug the edge-table kernel's HW dist-bin flips (round-4 hw_parity fail).

Dumps, on the real TPU, the error structure of every row vs the XLA builder:
which rows are off, by how much, and whether the error localizes to the
i-side gather (e//K broadcast), the j-side gather, or the trig/binning.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))

import bench  # noqa: E402
from dfmdock_tpu.features.sixd import pairwise_ca_dist, virtual_cb  # noqa: E402
from dfmdock_tpu.models.edges import select_edges  # noqa: E402
from dfmdock_tpu.models.egnn import build_edge_table_xla  # noqa: E402
from dfmdock_tpu.ops.edge_table import build_edge_table  # noqa: E402
from dfmdock_tpu.ops.fused_egcl import (  # noqa: E402
    R_CD, R_DB, R_IDX, R_MASK, R_OB, R_PB, R_RAD, R_RP, R_TB,
)

KNN, SAMPLE = 20, 40


def main():
    _, b = bench._batch()
    idx, edge_mask = select_edges(
        jax.random.PRNGKey(11), pairwise_ca_dist(b["pos"]),
        b["node_mask"].astype(bool), knn=KNN, sample_size=SAMPLE,
    )
    args = (idx, edge_mask, b["pos"], b["res_id"], b["asym_id"])
    t_pl = np.asarray(jax.jit(lambda *a: build_edge_table(*a, normalize=True))(*args))
    t_xla = np.asarray(jax.jit(lambda *a: build_edge_table_xla(*a, normalize=True))(*args))

    n, k = idx.shape
    valid = np.asarray(edge_mask).reshape(-1) > 0.5
    names = {"idx": R_IDX, "mask": R_MASK, "db": R_DB, "ob": R_OB, "tb": R_TB,
             "pb": R_PB, "rp": R_RP, "rad": R_RAD, "cdx": R_CD,
             "cdy": R_CD + 1, "cdz": R_CD + 2}
    for name, r in names.items():
        a, x = t_pl[r].reshape(-1)[valid], t_xla[r].reshape(-1)[valid]
        d = np.abs(a - x)
        print(f"{name:5s} maxabs={d.max():.6g} n_diff={(d > 0).sum()}", flush=True)

    # localize: recompute the true rad from numpy gathers and compare both
    pos = np.asarray(b["pos"], np.float64)
    ca = pos[:, 1, :]
    iidx = np.repeat(np.arange(n), k)
    jidx = np.asarray(idx).reshape(-1)
    true_rad = ((ca[iidx] - ca[jidx]) ** 2).sum(-1)
    rad_pl = t_pl[R_RAD].reshape(-1)
    rad_xla = t_xla[R_RAD].reshape(-1)
    e_pl = np.abs(rad_pl - true_rad)[valid]
    e_xla = np.abs(rad_xla - true_rad)[valid]
    print(f"rad err vs f64 truth: pl max={e_pl.max():.6g} mean={e_pl.mean():.6g} "
          f"| xla max={e_xla.max():.6g} mean={e_xla.mean():.6g}", flush=True)

    # which i-rows have db flips? (is it block-structured?)
    db_flip = (t_pl[R_DB].reshape(n, k) != t_xla[R_DB].reshape(n, k)) & (
        np.asarray(edge_mask) > 0.5)
    rows_with = np.where(db_flip.any(1))[0]
    print(f"db flips: {db_flip.sum()} total, rows {rows_with.min() if len(rows_with) else -1}"
          f"..{rows_with.max() if len(rows_with) else -1}, "
          f"n_rows={len(rows_with)}", flush=True)
    # dist delta at flipped edges
    dist_pl = np.sqrt(np.maximum(rad_pl, 0)).reshape(n, k)
    dist_xla = np.sqrt(np.maximum(rad_xla, 0)).reshape(n, k)
    if db_flip.any():
        dd = np.abs(dist_pl - dist_xla)[db_flip]
        print(f"dist delta at flipped edges: min={dd.min():.6g} max={dd.max():.6g}",
              flush=True)
    # CB check: db bins in trRosetta use CB-CB distance, not CA
    cb = np.asarray(virtual_cb(b["pos"]), np.float64)
    true_cb_dist = np.sqrt(((cb[iidx] - cb[jidx]) ** 2).sum(-1))
    from dfmdock_tpu.ops.edge_table import _boundaries
    from dfmdock_tpu.features.sixd import NUM_DIST_BINS
    bounds = np.asarray(_boundaries(3.25, 50.75, NUM_DIST_BINS))
    db_true = (true_cb_dist[:, None] > bounds[None, :]).sum(1)
    agree_pl = (db_true == t_pl[R_DB].reshape(-1))[valid].mean()
    agree_xla = (db_true == t_xla[R_DB].reshape(-1))[valid].mean()
    print(f"db vs f64-CB-truth: pl agree {agree_pl:.4f}, xla agree {agree_xla:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
