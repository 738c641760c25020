"""Interpret-mode correctness tests for the parked Pallas kernels.

`ops/edge_bins.py` (gather-free 6D bins) and `ops/energy_head.py` (fused pair
energy) are functionally complete but disabled on the hot path — edge_bins
trips Mosaic in its fully-2D form and energy_head was perf-neutral vs the XLA
row-chunk scan (NOTES.md).  These tests pin their numerics against the live
XLA implementations so the kernels stay correct while parked (VERDICT r1
"resolve the parked kernels").
"""
import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.features.positional import relpos_bin_at
from dfmdock_tpu.features.sixd import sixd_bins_at, virtual_cb
from dfmdock_tpu.models import modules as nn
from dfmdock_tpu.ops.edge_bins import edge_bins
from dfmdock_tpu.ops.energy_head import fused_energy

def _padded_batch(seed=23, n_rec=48, n_lig=32, feat=32):
    """Random complex with NON-collinear backbones (unlike test_pallas_ops's
    generator, whose collinear N/CA/C make every dihedral degenerate — NaN in
    XLA, guarded-finite in the kernel, so bins would differ for bogus
    reasons)."""
    from dfmdock_tpu.data import pad_complex

    rng = np.random.RandomState(seed)

    def chain(n, shift):
        ca = np.cumsum(rng.randn(n, 3) * 2 + [3.8, 0, 0], axis=0) + shift
        n_at = ca + rng.randn(n, 3) * 0.3 + [-1.2, 0.6, 0.2]
        c_at = ca + rng.randn(n, 3) * 0.3 + [1.3, 0.5, -0.2]
        return np.stack([n_at, ca, c_at], 1).astype(np.float32)

    raw = (
        rng.randn(n_rec, feat).astype(np.float32),
        rng.randn(n_lig, feat).astype(np.float32),
        chain(n_rec, np.zeros(3)),
        chain(n_lig, np.array([10.0, 5.0, 0.0])),
    )
    return {k: jnp.asarray(v) for k, v in pad_complex(*raw).items()}


def test_edge_bins_kernel_matches_xla():
    batch = _padded_batch()
    pos = batch["pos"]
    n = pos.shape[0]
    k = 8
    # deterministic neighbour set incl. self-edges (exercises the i==j mask);
    # targets restricted to VALID nodes — select_edges never picks padded
    # rows, whose zero coords give NaN dihedrals in XLA vs guarded-finite in
    # the kernel
    n_valid = int(np.asarray(batch["node_mask"]).sum())
    idx = (jnp.arange(n)[:, None] + jnp.arange(k)[None, :] * 7) % n_valid
    idx = idx.astype(jnp.int32)

    db, ob, tb, pb, rp = edge_bins(
        idx, pos, virtual_cb(pos), batch["res_id"], batch["asym_id"]
    )
    db_r, ob_r, tb_r, pb_r = sixd_bins_at(pos, idx)
    rp_r = relpos_bin_at(batch["res_id"], batch["asym_id"], idx)

    # compare valid source rows only: padded rows have all-zero coords whose
    # degenerate dihedrals are NaN in XLA (-> bin 0) but finite in the
    # kernel's guarded math — the model multiplies those edges by edge_mask,
    # so their bins are dont-cares
    v = np.asarray(batch["node_mask"]).astype(bool)
    # the kernel's minimax atan2/acos differ from XLA's by ~2e-7 rad; on
    # random geometry no angle lands that close to a bin boundary
    for got, want in [(db, db_r), (ob, ob_r), (tb, tb_r), (pb, pb_r), (rp, rp_r)]:
        np.testing.assert_array_equal(np.asarray(got)[v], np.asarray(want)[v])


def test_fused_energy_kernel_matches_xla():
    batch = _padded_batch(seed=31)
    n, c = 128, 64
    rng = np.random.RandomState(5)
    h = jnp.asarray(rng.randn(n, c).astype(np.float32))
    w0 = jnp.asarray(rng.randn(2 * c, c).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    ln = nn.layer_norm_init(c)
    # non-trivial LN affine so the kernel's fused LN is actually exercised
    ln = {"g": ln["g"] * 1.3 + 0.1, "b": ln["b"] + 0.05}

    valid = np.ones(n, np.float32)
    valid[100:] = 0.0  # padding rows
    lig = np.zeros(n, np.float32)
    lig[60:100] = 1.0
    pair_mask = jnp.asarray(
        (1.0 - lig)[:, None] * valid[:, None] * (lig * valid)[None, :]
        * (rng.rand(n, n) < 0.4)
    )

    hr = h @ w0[:c]
    hl = h @ w0[c:]
    got = fused_energy(hr, hl, pair_mask, ln["g"], ln["b"], w2)

    pair = hr[:, None, :] + hl[None, :, :]
    e = jax.nn.silu(nn.layer_norm(ln, pair)) @ w2
    want = (e * pair_mask).sum() / (pair_mask.sum() + 1e-6)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_fused_energy_degenerate_mask():
    """All-masked pair set: the +1e-6 denominator must keep it finite (the
    vacuous-dryrun regime of VERDICT r1 Weak #2)."""
    n, c = 64, 32
    rng = np.random.RandomState(9)
    hr = jnp.asarray(rng.randn(n, c).astype(np.float32))
    hl = jnp.asarray(rng.randn(n, c).astype(np.float32))
    ln = nn.layer_norm_init(c)
    out = fused_energy(
        hr, hl, jnp.zeros((n, n)), ln["g"], ln["b"], jnp.ones((c,))
    )
    assert np.isfinite(float(out)) and float(out) == 0.0
