"""Pallas edge-table builder (ops/edge_table.py) vs the XLA featurize
(models/egnn.build_edge_table_xla), interpret mode on CPU.

The table rows are compared on VALID edges only: masked edges may diverge
(guarded in-kernel math vs NaN propagation on degenerate padding geometry)
and every consumer folds the mask row into its segment-sums.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfmdock_tpu.config import ModelConfig
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.features.sixd import pairwise_ca_dist
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models.edges import select_edges
from dfmdock_tpu.models.egnn import build_edge_table_xla
from dfmdock_tpu.ops.edge_table import build_edge_table
from dfmdock_tpu.ops.fused_egcl import (
    R_CD,
    R_DB,
    R_IDX,
    R_MASK,
    R_OB,
    R_PB,
    R_RAD,
    R_RP,
    R_TB,
)

INT_ROWS = {"db": R_DB, "ob": R_OB, "tb": R_TB, "pb": R_PB, "rp": R_RP}
F32_ROWS = {"rad": R_RAD, "cdx": R_CD, "cdy": R_CD + 1, "cdz": R_CD + 2}


def make_complex(n_rec, n_lig, seed=13):
    """Random-walk CA trace with NON-COLLINEAR N/CA/C offsets: a collinear
    backbone (the test_pallas_ops fixture) makes every omega/theta dihedral
    degenerate (~0 +- fp-noise), so bins flip on 1e-5-deg builder
    differences that real geometry never sees."""
    RNG = np.random.RandomState(seed)
    rec_ca = np.cumsum(RNG.randn(n_rec, 3) * 2 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(RNG.randn(n_lig, 3) * 2 + [3.8, 0, 0], axis=0) + [10, 5, 0]
    d_n = np.float32([-1.2, 0.6, 0.3]) + RNG.randn(n_rec + n_lig, 3) * 0.05
    d_c = np.float32([1.3, -0.4, 0.5]) + RNG.randn(n_rec + n_lig, 3) * 0.05
    rec_pos = np.stack([rec_ca + d_n[:n_rec], rec_ca, rec_ca + d_c[:n_rec]], 1)
    lig_pos = np.stack([lig_ca + d_n[n_rec:], lig_ca, lig_ca + d_c[n_rec:]], 1)
    feat = 8
    return (
        RNG.randn(n_rec, feat).astype(np.float32),
        RNG.randn(n_lig, feat).astype(np.float32),
        rec_pos.astype(np.float32),
        lig_pos.astype(np.float32),
    )


def _tables(n_rec, n_lig, pad_to, seed, normalize, knn=6, sample=10):
    raw = make_complex(n_rec, n_lig, seed=seed)
    batch = pad_complex(*raw, pad_to=pad_to)
    pos = jnp.asarray(batch["pos"])
    node_mask = jnp.asarray(batch["node_mask"])
    idx, edge_mask = select_edges(
        jax.random.PRNGKey(seed), pairwise_ca_dist(pos), node_mask,
        knn=knn, sample_size=sample,
    )
    args = (
        idx, edge_mask, pos,
        jnp.asarray(batch["res_id"]), jnp.asarray(batch["asym_id"]),
    )
    t_pl = np.asarray(build_edge_table(*args, normalize=normalize))
    t_xla = np.asarray(build_edge_table_xla(*args, normalize=normalize))
    return t_pl, t_xla


@pytest.mark.parametrize(
    "n_rec,n_lig,pad_to,seed",
    [
        (20, 12, 64, 3),    # one grid block (bn = 64)
        (48, 30, 128, 5),   # bn = 128
        (80, 60, 192, 7),   # three grid blocks (bn = 64)
    ],
)
def test_table_matches_xla_builder(n_rec, n_lig, pad_to, seed):
    t_pl, t_xla = _tables(n_rec, n_lig, pad_to, seed, normalize=True)

    # idx / mask rows are pass-throughs: exact everywhere
    np.testing.assert_array_equal(t_pl[R_IDX], t_xla[R_IDX])
    np.testing.assert_array_equal(t_pl[R_MASK], t_xla[R_MASK])

    valid = t_xla[R_MASK] > 0.5
    assert valid.sum() > 100  # the comparison is not vacuous
    for name, r in INT_ROWS.items():
        mismatch = (t_pl[r] != t_xla[r]) & valid
        assert mismatch.sum() == 0, (
            f"{name}: {mismatch.sum()} bin mismatches on valid edges"
        )
    for name, r in F32_ROWS.items():
        np.testing.assert_allclose(
            t_pl[r][valid], t_xla[r][valid], rtol=1e-5, atol=1e-5,
            err_msg=name,
        )


def test_table_on_real_complex():
    """Bundled DB5 complex at the shipped edge budget (K=60).  Real geometry
    may land within the builders' ~1e-5-deg angle difference of a bin
    boundary on isolated edges, so a <=0.1% flip budget is allowed; float
    rows must still agree everywhere valid."""
    import glob
    import os

    npz = sorted(glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "data/db5_npz/*.npz")
    ))[0]
    d = np.load(npz)
    batch = pad_complex(
        d["rec_x"], d["lig_x"], d["rec_pos"], d["lig_pos"], pad_to=448
    )
    pos = jnp.asarray(batch["pos"])
    idx, edge_mask = select_edges(
        jax.random.PRNGKey(0), pairwise_ca_dist(pos),
        jnp.asarray(batch["node_mask"]), knn=20, sample_size=40,
    )
    args = (
        idx, edge_mask, pos,
        jnp.asarray(batch["res_id"]), jnp.asarray(batch["asym_id"]),
    )
    t_pl = np.asarray(build_edge_table(*args, normalize=True))
    t_xla = np.asarray(build_edge_table_xla(*args, normalize=True))
    valid = t_xla[R_MASK] > 0.5
    for name, r in INT_ROWS.items():
        frac = ((t_pl[r] != t_xla[r]) & valid).sum() / valid.sum()
        assert frac <= 1e-3, f"{name}: {frac:.2%} bin flips on valid edges"
    for name, r in F32_ROWS.items():
        np.testing.assert_allclose(
            t_pl[r][valid], t_xla[r][valid], rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_table_unnormalized_coord_diff():
    t_pl, t_xla = _tables(20, 12, 64, 11, normalize=False)
    valid = t_xla[R_MASK] > 0.5
    for r in (R_CD, R_CD + 1, R_CD + 2):
        np.testing.assert_allclose(
            t_pl[r][valid], t_xla[r][valid], rtol=1e-5, atol=1e-5
        )


def test_scorenet_outputs_match_across_builders():
    """End-to-end: the fused forward is builder-agnostic (same layer
    kernels, tables equal to ~2^-27 on valid edges)."""
    small = ModelConfig(
        lm_embed_dim=8, node_dim=32, edge_dim=16, inner_dim=16, depth=2,
        dropout=0.0, knn=6, sample_size=10, use_pallas=True,
    )
    raw = make_complex(40, 24, seed=17)
    batch = {k: jnp.asarray(v) for k, v in pad_complex(*raw).items()}
    batch["t"] = jnp.float32(0.5)
    key = jax.random.PRNGKey(1)

    net_xla_tab = ScoreNet(small)
    params = net_xla_tab.init(jax.random.PRNGKey(0))
    net_pl_tab = ScoreNet(dataclasses.replace(small, edge_table_kernel=True))

    o1 = net_xla_tab.apply(params, batch, key, predict=True)
    o2 = net_pl_tab.apply(params, batch, key, predict=True)
    np.testing.assert_allclose(
        float(o1["energy"]), float(o2["energy"]), rtol=1e-3, atol=1e-5
    )
    for name in ["tr_score", "rot_score", "f", "ires"]:
        np.testing.assert_allclose(
            np.asarray(o1[name]), np.asarray(o2[name]), rtol=1e-3, atol=1e-5,
            err_msg=name,
        )
    assert int(o1["num_clashes"]) == int(o2["num_clashes"])


def test_egnn_net_runs_with_kernel_table():
    from dfmdock_tpu.models.egnn_net import EGNNNet

    small = ModelConfig(
        lm_embed_dim=8, node_dim=32, edge_dim=16, inner_dim=16, depth=2,
        dropout=0.0, knn=6, sample_size=10, use_pallas=True,
        edge_table_kernel=True,
    )
    raw = make_complex(40, 24, seed=23)
    batch = {k: jnp.asarray(v) for k, v in pad_complex(*raw).items()}
    batch["t"] = jnp.float32(0.4)
    net = EGNNNet(small)
    params = net.init(jax.random.PRNGKey(0))
    out = net.apply(params, batch, jax.random.PRNGKey(3), predict=True)
    assert np.isfinite(float(out["energy"]))
    assert np.isfinite(np.asarray(out["tr_score"])).all()
