"""Pallas TPU kernel: per-edge 6D geometry bins + relpos class, gather-free.

Computes, for the selected neighbour set idx [N, K], the trRosetta 6D bins
(dist/omega/theta/phi — semantics of features.sixd) and the AF2 relpos class
(features.positional) in one pass.  Fully 2D over flattened edges (Mosaic
rejects [BN, K, X] reshapes): j-side quantities come from one one-hot MXU
matmul against a packed [N, 8] source ([CA | CB | res_id | asym_id]), i-side
rows from a second one-hot against the block rows.  atan2/arccos are not
lowered by Mosaic and are built from a minimax arctan polynomial (max err
~2e-7 rad, far below bin width).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfmdock_tpu.features.positional import MAX_RELATIVE_IDX
from dfmdock_tpu.features.sixd import (
    NUM_DIST_BINS,
    NUM_OMEGA_BINS,
    NUM_PHI_BINS,
    NUM_THETA_BINS,
    SPATIAL_MASK_CUTOFF,
)

BLOCK_N = 32
_DEG = 180.0 / math.pi


def _interpret():
    return jax.default_backend() != "tpu"


def _bins(x, lo, hi, nb):
    """x [E] -> int bins via comparisons against linspace(lo, hi, nb-1)
    (boundaries built from an integer iota — Mosaic has no f32 iota)."""
    m = nb - 1
    i = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], m), 1)
    bounds = lo + i.astype(jnp.float32) * ((hi - lo) / (m - 1))
    return (x[:, None] > bounds).sum(-1, keepdims=True).astype(jnp.int32)


def _atan_poly(z):
    """Minimax atan(z) on |z| <= 1 (max err ~2e-7 rad)."""
    z2 = z * z
    p = -0.0040540580
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        p = p * z2 + c
    return z * p


def _atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    a = _atan_poly(num / den)
    a = jnp.where(swap, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    return jnp.where(y < 0, -a, a)


def _acos(z):
    z = jnp.clip(z, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0)), z)


def _kernel(idx_ref, cai_ref, cbi_ref, ni_ref, ridi_ref, aidi_ref, rowi_ref,
            ca_ref, cb_ref, rid_ref, aid_ref,
            db_ref, ob_ref, tb_ref, pb_ref, rp_ref, *, k: int):
    n = ca_ref.shape[0]
    bn = cai_ref.shape[0]
    idx = idx_ref[:][:, 0]  # [E]
    e = idx.shape[0]

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (e, n), 1)
    oh_j = (idx[:, None] == iota_n).astype(jnp.float32)
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (e, bn), 0)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (e, bn), 1)
    oh_i = ((e_ids // k) == r_ids).astype(jnp.float32)

    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ca_j = dot(oh_j, ca_ref[:])
    cb_j = dot(oh_j, cb_ref[:])
    rid_j = dot(oh_j, rid_ref[:])[:, 0]
    aid_j = dot(oh_j, aid_ref[:])[:, 0]
    ca_i = dot(oh_i, cai_ref[:])
    cb_i = dot(oh_i, cbi_ref[:])
    n_i = dot(oh_i, ni_ref[:])
    rid_i = dot(oh_i, ridi_ref[:])[:, 0]
    aid_i = dot(oh_i, aidi_ref[:])[:, 0]
    row_i = dot(oh_i, rowi_ref[:])[:, 0]

    diff = ca_i - ca_j
    dist = jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 1e-12))  # [E]

    def dihedral(a, b, c, d):
        b1, b2, b3 = a - b, b - c, c - d
        n1 = jnp.cross(b1, b2)
        n1 = n1 / jnp.sqrt(jnp.maximum((n1 * n1).sum(-1, keepdims=True), 1e-30))
        n2 = jnp.cross(b2, b3)
        n2 = n2 / jnp.sqrt(jnp.maximum((n2 * n2).sum(-1, keepdims=True), 1e-30))
        m1 = jnp.cross(n1, b2 / jnp.sqrt(jnp.maximum((b2 * b2).sum(-1, keepdims=True), 1e-30)))
        return _atan2((m1 * n2).sum(-1), (n1 * n2).sum(-1)) * _DEG

    omega = dihedral(ca_i, cb_i, cb_j, ca_j)
    theta = dihedral(n_i, ca_i, cb_i, cb_j)
    v1 = ca_i - cb_i
    v2 = cb_j - cb_i
    cosp = (v1 * v2).sum(-1) / jnp.sqrt(
        jnp.maximum((v1 * v1).sum(-1) * (v2 * v2).sum(-1), 1e-30)
    )
    phi = _acos(cosp) * _DEG

    db = _bins(dist, 3.25, 50.75, NUM_DIST_BINS)
    ob = _bins(omega, -180.0, 180.0, NUM_OMEGA_BINS)
    tb = _bins(theta, -180.0, 180.0, NUM_THETA_BINS)
    pb = _bins(phi, 0.0, 180.0, NUM_PHI_BINS)

    # zero-mask angle bins where dist >= 22 A or i == j (sixd semantics)
    keep = ((dist < SPATIAL_MASK_CUTOFF) & (idx != row_i.astype(jnp.int32)))[:, None]
    zero = jnp.zeros_like(ob)
    ob = jnp.where(keep, ob, zero)
    tb = jnp.where(keep, tb, zero)
    pb = jnp.where(keep, pb, zero)

    # relpos class (positional.relpos_bin_at semantics)
    offset = rid_i - rid_j
    clipped = jnp.clip(offset + MAX_RELATIVE_IDX, 0, 2 * MAX_RELATIVE_IDX)
    same = jnp.abs(aid_i - aid_j) < 0.5
    rp = jnp.where(same, clipped, 2 * MAX_RELATIVE_IDX + 1)[:, None].astype(jnp.int32)

    db_ref[:] = db
    ob_ref[:] = ob
    tb_ref[:] = tb
    pb_ref[:] = pb
    rp_ref[:] = rp


def edge_bins(idx, pos, cb, res_id, asym_id):
    """idx [N,K] int32, pos [N,3,3], cb [N,3] virtual C-beta,
    res_id/asym_id [N] int -> (db, ob, tb, pb, rp) each [N,K] int32."""
    import functools

    n, k = idx.shape
    ca = pos[:, 1, :]
    n_at = pos[:, 0, :]
    rid = res_id.astype(jnp.float32)[:, None]
    aid = asym_id.astype(jnp.float32)[:, None]
    rows = jnp.arange(n, dtype=jnp.float32)[:, None]

    bn = BLOCK_N
    bnk = bn * k
    erow = pl.BlockSpec((bnk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row = lambda *shape: pl.BlockSpec(
        (bn,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n * k, 1), jnp.int32)

    outs = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=(n // bn,),
        in_specs=[
            erow,                       # idx
            row(3), row(3), row(3),     # ca_i, cb_i, n_i
            row(1), row(1), row(1),     # rid_i, aid_i, row_i
            full(n, 3), full(n, 3),     # ca, cb
            full(n, 1), full(n, 1),     # rid, aid
        ],
        out_specs=(erow,) * 5,
        out_shape=(out_shape,) * 5,
        interpret=_interpret(),
    )(idx.reshape(-1, 1).astype(jnp.int32), ca, cb, n_at, rid, aid, rows,
      ca, cb, rid, aid)
    return tuple(o.reshape(n, k) for o in outs)
