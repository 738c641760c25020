"""Tests for 6D pairwise geometry bins, relpos, and sequence one-hots.

The numpy references here are written directly from the published trRosetta /
AF2-multimer formulas as an independent check on the jnp implementations.
"""
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.features import (
    pairwise_ca_dist,
    relpos_bin,
    relpos_onehot,
    sequence_to_onehot,
    sixd_bins_at,
    sixd_bins_dense,
    virtual_cb,
)
from dfmdock_tpu.features.positional import relpos_bin_at
from dfmdock_tpu.features.sixd import spatial_embed_from_bins, SPATIAL_DIM

RNG = np.random.RandomState(7)


def make_backbone(n):
    """Synthetic but protein-scaled backbone: CA on a jittered walk, N/C offset."""
    ca = np.cumsum(RNG.randn(n, 3) * 2.0 + np.array([3.8, 0, 0]), axis=0)
    n_at = ca + RNG.randn(n, 3) * 0.5 + np.array([-1.45, 0, 0])
    c_at = ca + RNG.randn(n, 3) * 0.5 + np.array([1.52, 0, 0])
    return np.stack([n_at, ca, c_at], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# numpy reference (independent implementation of the trRosetta formulas)


def np_virtual_cb(pos):
    n, ca, c = pos[:, 0], pos[:, 1], pos[:, 2]
    b = ca - n
    cc = c - ca
    a = np.cross(b, cc)
    return -0.58273431 * a + 0.56802827 * b - 0.54067466 * cc + ca


def np_dihedral(a, b, c, d):
    b1, b2, b3 = a - b, b - c, c - d
    n1 = np.cross(b1, b2)
    n1 /= np.linalg.norm(n1, axis=-1, keepdims=True)
    n2 = np.cross(b2, b3)
    n2 /= np.linalg.norm(n2, axis=-1, keepdims=True)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2, axis=-1, keepdims=True))
    return np.degrees(np.arctan2((m1 * n2).sum(-1), (n1 * n2).sum(-1)))


def np_planar(a, b, c):
    v1, v2 = a - b, c - b
    cos = (v1 * v2).sum(-1) / (np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1))
    return np.degrees(np.arccos(cos))


def np_bins(x, lo, hi, nb):
    boundaries = np.linspace(lo, hi, nb - 1)
    with np.errstate(invalid="ignore"):
        return (x[..., None] > boundaries).sum(-1)


def np_sixd_bins(pos):
    n = pos.shape[0]
    ca = pos[:, 1]
    cb = np_virtual_cb(pos)
    n_at = pos[:, 0]
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    dist = np.linalg.norm(ca[ii] - ca[jj], axis=-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        omega = np_dihedral(ca[ii], cb[ii], cb[jj], ca[jj])
        theta = np_dihedral(n_at[ii], ca[ii], cb[ii], cb[jj])
        phi = np_planar(ca[ii], cb[ii], cb[jj])
    db = np_bins(dist, 3.25, 50.75, 40)
    ob = np_bins(omega, -180.0, 180.0, 24)
    tb = np_bins(theta, -180.0, 180.0, 24)
    pb = np_bins(phi, 0.0, 180.0, 12)
    keep = (dist < 22.0) & (ii != jj)
    for m in (ob, tb, pb):
        m[~keep] = 0
    return db, ob, tb, pb


def test_virtual_cb_matches():
    pos = make_backbone(30)
    np.testing.assert_allclose(
        np.asarray(virtual_cb(jnp.asarray(pos))), np_virtual_cb(pos), atol=1e-4
    )


def test_dense_bins_match_numpy_reference():
    pos = make_backbone(40)
    got = [np.asarray(b) for b in sixd_bins_dense(jnp.asarray(pos))]
    want = np_sixd_bins(pos)
    names = ["dist", "omega", "theta", "phi"]
    for g, w, name in zip(got, want, names):
        # angles sitting exactly on a bin boundary can flip by one bin in f32;
        # demand exact match on >99.5% of pairs and off-by-one elsewhere
        mismatch = (g != w).mean()
        assert mismatch < 0.005, f"{name}: {mismatch:.4f} mismatched"
        assert np.abs(g - w).max() <= 1, f"{name}: larger than off-by-one"


def test_bins_at_matches_dense_gather():
    pos = make_backbone(25)
    idx = RNG.randint(0, 25, size=(25, 8)).astype(np.int32)
    dense = sixd_bins_dense(jnp.asarray(pos))
    at = sixd_bins_at(jnp.asarray(pos), jnp.asarray(idx))
    for d, a in zip(dense, at):
        np.testing.assert_array_equal(
            np.asarray(a), np.take_along_axis(np.asarray(d), idx, axis=1)
        )


def test_diagonal_bins_are_zero():
    pos = make_backbone(12)
    db, ob, tb, pb = [np.asarray(b) for b in sixd_bins_dense(jnp.asarray(pos))]
    assert (np.diag(ob) == 0).all() and (np.diag(tb) == 0).all() and (np.diag(pb) == 0).all()
    assert (np.diag(db) == 0).all()  # dist 0 -> lowest bin
    assert np.isfinite(db).all()


def test_pairwise_ca_dist():
    pos = make_backbone(15)
    d = np.asarray(pairwise_ca_dist(jnp.asarray(pos)))
    want = np.linalg.norm(pos[:, None, 1] - pos[None, :, 1], axis=-1)
    np.testing.assert_allclose(d, want, atol=1e-3)


def test_spatial_embed_equals_onehot_matmul():
    pos = make_backbone(20)
    db, ob, tb, pb = sixd_bins_dense(jnp.asarray(pos))
    w = jnp.asarray(RNG.randn(SPATIAL_DIM, 16).astype(np.float32))
    got = np.asarray(spatial_embed_from_bins(w, db, ob, tb, pb))
    onehot = np.concatenate(
        [
            np.eye(40, dtype=np.float32)[np.asarray(db)],
            np.eye(24, dtype=np.float32)[np.asarray(ob)],
            np.eye(24, dtype=np.float32)[np.asarray(tb)],
            np.eye(12, dtype=np.float32)[np.asarray(pb)],
        ],
        axis=-1,
    )
    want = onehot @ np.asarray(w)
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# relpos


def test_relpos_against_naive():
    n_rec, n_lig = 11, 7
    n = n_rec + n_lig
    res_id = np.arange(n)
    asym_id = np.array([0] * n_rec + [1] * n_lig)
    bins = np.asarray(relpos_bin(jnp.asarray(res_id), jnp.asarray(asym_id)))
    for i in range(n):
        for j in range(n):
            if asym_id[i] != asym_id[j]:
                expected = 65
            else:
                expected = int(np.clip(res_id[i] - res_id[j] + 32, 0, 64))
            assert bins[i, j] == expected, (i, j)
    # one-hot variant
    oh = np.asarray(relpos_onehot(jnp.asarray(res_id), jnp.asarray(asym_id)))
    assert oh.shape == (n, n, 66)
    np.testing.assert_array_equal(oh.argmax(-1), bins)
    assert (oh.sum(-1) == 1).all()


def test_relpos_bin_at_matches_dense():
    n = 20
    res_id = jnp.asarray(np.arange(n))
    asym_id = jnp.asarray((np.arange(n) >= 12).astype(np.int64))
    idx = jnp.asarray(RNG.randint(0, n, size=(n, 5)))
    dense = np.asarray(relpos_bin(res_id, asym_id))
    at = np.asarray(relpos_bin_at(res_id, asym_id, idx))
    np.testing.assert_array_equal(at, np.take_along_axis(dense, np.asarray(idx), axis=1))


# ---------------------------------------------------------------------------
# sequence one-hot


def test_sequence_to_onehot():
    seq = "ARNDCQEGHILKMFPSTWYVX"
    oh = sequence_to_onehot(seq)
    assert oh.shape == (21, 21)
    np.testing.assert_array_equal(oh, np.eye(21, dtype=np.float32))
    # unknown letters map to X (index 20)
    oh2 = sequence_to_onehot("AB")
    assert oh2[0, 0] == 1 and oh2[1, 20] == 1
