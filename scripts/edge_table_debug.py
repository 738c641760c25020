"""Debug the compiled edge-table kernel vs the XLA builder: locate db flips.

Dumps, for the 1AVX/448 case, per-row max|diff| of the f32 geometry rows and
the spatial pattern of distance-bin flips (which i-block / lane / edge slot),
plus the underlying dist error at flip sites.  Run on TPU, one process.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

import bench
from dfmdock_tpu.features.sixd import pairwise_ca_dist
from dfmdock_tpu.models.edges import select_edges
from dfmdock_tpu.models.egnn import build_edge_table_xla
from dfmdock_tpu.ops.edge_table import build_edge_table
from dfmdock_tpu.ops.fused_egcl import (
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
    t_pl = np.asarray(jax.jit(
        lambda *a: build_edge_table(*a, normalize=True))(*args), np.float32)
    t_xla = np.asarray(jax.jit(
        lambda *a: build_edge_table_xla(*a, normalize=True))(*args), np.float32)

    n, k = idx.shape
    e = n * k
    valid = np.asarray(edge_mask).reshape(-1) > 0.5

    names = {"idx": R_IDX, "mask": R_MASK, "db": R_DB, "ob": R_OB,
             "tb": R_TB, "pb": R_PB, "rp": R_RP, "rad": R_RAD,
             "cdx": R_CD, "cdy": R_CD + 1, "cdz": R_CD + 2}
    for name, r in names.items():
        d = np.abs(t_pl[r] - t_xla[r]).reshape(-1)[valid]
        flips = int((t_pl[r].reshape(-1)[valid]
                     != t_xla[r].reshape(-1)[valid]).sum())
        print(f"{name:5s} row {r:2d}: flips/nonzero={flips:6d} "
              f"max|d|={d.max():.6g} mean|d|={d.mean():.6g}")

    # distance error at flip sites
    rad_pl = t_pl[R_RAD].reshape(-1)
    rad_xla = t_xla[R_RAD].reshape(-1)
    dist_pl = np.sqrt(np.maximum(rad_pl, 1e-12))
    dist_xla = np.sqrt(np.maximum(rad_xla, 1e-12))
    db_flip = (t_pl[R_DB].reshape(-1) != t_xla[R_DB].reshape(-1)) & valid
    fl = np.where(db_flip)[0]
    print(f"\ndb flips: {len(fl)}")
    if len(fl):
        i_node = fl // k
        slot = fl % k
        print("flip i-node range:", i_node.min(), i_node.max(),
              " unique i:", len(np.unique(i_node)))
        print("flip slot hist (first 10 slots):",
              np.bincount(slot, minlength=k)[:10], "...")
        print("slots>=20 (sampled) flips:", int((slot >= KNN).sum()),
              " slots<20 (knn):", int((slot < KNN).sum()))
        print("dist err at flips: max",
              float(np.abs(dist_pl[fl] - dist_xla[fl]).max()),
              "mean", float(np.abs(dist_pl[fl] - dist_xla[fl]).mean()))
        # are the flips off-by-one or worse?
        delta = (t_pl[R_DB].reshape(-1)[fl] - t_xla[R_DB].reshape(-1)[fl])
        vals, cnts = np.unique(delta, return_counts=True)
        print("db delta histogram:", dict(zip(vals.tolist(), cnts.tolist())))
        for j in fl[:8]:
            print(f"  edge {j} (i={j // k}, slot={j % k}, "
                  f"j={int(t_xla[R_IDX].reshape(-1)[j])}): "
                  f"dist pl={dist_pl[j]:.6f} xla={dist_xla[j]:.6f} "
                  f"db pl={t_pl[R_DB].reshape(-1)[j]:.0f} "
                  f"xla={t_xla[R_DB].reshape(-1)[j]:.0f}")


if __name__ == "__main__":
    main()
