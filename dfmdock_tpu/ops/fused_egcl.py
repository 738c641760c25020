"""Pallas TPU kernel: fused E_GCL edge pipeline (gather + messages + agg).

Round-3 redesign.  The round-2 kernel passed every per-edge scalar as an
[E, 1] column; XLA tiles a 1-wide minor dim to T(8,128), inflating each such
tensor ~128x in HBM and VMEM (xprof r3: ~670 ms/run of reshape/select fusions
producing s32[P,26880,1] plus ~2.3 ms/call of wasted DMA).  This version:

- packs ALL per-edge scalars (idx, mask, 5 bin families, radial, unit
  coord-diff) into ONE [16, E] f32 "edge table" (perfectly tiled rows), built
  once per SDE step and shared by all 6 layer calls;
- builds every one-hot row-major from broadcasted_iota against table rows
  (no in-kernel transposes, which Mosaic lowers as slow relayouts):
    oh_j_T [N, E]  = (iota_n == idx_row)      gather:    b_j = oh_j_T 'T@' B
    oh_i_b [E, BN] = (iota_e // K == iota_bn) broadcast: a_e = oh_i_b @ a_blk
    oh_i_f [BN, E] = (iota_bn == iota_e // K) seg-sum:   agg = (oh_i_f * gate_row) @ m2
  where 'T@' is dot_general contracting dim 0 of both operands (lhs
  transposed — lowered natively by Mosaic, verified on v5e);
- computes attention / coord-weight reductions as ROW dots
  ([1, C] x [E, C] -> [1, E]) so gates fold into the segment-sum matrix
  instead of needing [E, 1] columns;
- takes coordinate geometry (radial, normalized coord-diff) from the table —
  computed once per step in XLA from the same one-hot CA gather the 6D
  featurizer already does — instead of re-gathering f32 coords per layer.

Edge features arrive as integer bins with pre-fused embed tables
(one-hot @ W_embed @ W_e == one-hot @ T).  Inference-only (predict path);
training uses the differentiable XLA formulation in models/egnn.py.

Reference semantics: src/models/egnn.py:95-159 (E_GCL edge/att/coord models).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfmdock_tpu.features.sixd import OMEGA_OFFSET, PHI_OFFSET, THETA_OFFSET
from dfmdock_tpu.ops.gather import split_bf16_2

def block_n(n: int) -> int:
    """Rows per program: chosen so the fused gather's contraction (N + BN)
    lands exactly on a 128 multiple (N is a multiple of 64 by bucketing)."""
    assert n % 64 == 0, f"padded N={n} must be a multiple of 64"
    return 64 if n % 128 == 64 else 128


BLOCK_N = 64  # fallback export (tests); real calls use block_n(n)

# Edge-table row layout ([ROWS, E] f32; integer rows hold exact small ints)
R_IDX, R_MASK, R_DB, R_OB, R_TB, R_PB, R_RP, R_RAD = range(8)
R_CD = 8  # rows 8:11 = normalized coord-diff (i - j) x/y/z
ROWS = 16  # padded to a full f32 sublane tile

_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MB VMEM; default scoped cap is 16


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret():
    return jax.default_backend() != "tpu"


def _dot(a, b):
    """Standard [M, K] @ [K, N] MXU matmul, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t0(a, b):
    """Contract dim 0 of both: [K, M] 'T@' [K, N] -> [M, N] (lhs transposed)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _split_f32(x):
    """bf16 hi/lo split: x == hi + lo to ~2^-15 relative (truncation split;
    residual up to 2x a round-to-nearest split's — ADVICE r4).

    Fold-proof integer-mask formulation (ops/gather.split_bf16_2): Mosaic's
    excess-precision pass elides a convert-based `x - f32(bf16(x))` to zero
    in-kernel (measured round 4 — the 3-pass dots were silently single-pass
    bf16 on hardware)."""
    return split_bf16_2(x)


def _dot3(a, b, dims):
    """3-pass bf16-split matmul (~f32 precision; Mosaic supports only DEFAULT
    and HIGHEST dot precision, and HIGHEST's 6 passes measured +4 us/program
    on the segment-sum — this is the cheap middle).  Gate-sensitive spots
    (segment-sum, att/coord row reductions) measurably shift the energy ~1%
    at single-pass bf16."""
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    d = lambda x, y: jax.lax.dot_general(
        x, y, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _row_dot(w_row, m):
    """[1, C] x [E, C] -> [1, E] (contract dim 1 of both), ~f32 exact."""
    return _dot3(w_row, m, ((1,), (1,)))


def _seg_dot(a, b):
    """[BN, E] @ [E, C] segment-sum, ~f32 exact.  The lhs (one-hot x binary
    mask) is exactly bf16-representable, so two passes suffice."""
    ah = a.astype(jnp.bfloat16)
    bh, bl = _split_f32(b)
    d = lambda x, y: jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d(ah, bh) + d(ah, bl)


def pack_edge_table(idx, edge_mask, bins, rp, cdn, radial):
    """Build the [ROWS, N*K] f32 kernel input from [N, K] per-edge tensors.

    Args:
      idx: [N, K] int neighbor indices; edge_mask: [N, K] float validity.
      bins: (db, ob, tb, pb) [N, K] int 6D-geometry bins.
      rp: [N, K] int relpos class.  cdn: [N, K, 3] normalized coord-diff
      (i - j, the EGNN `coord_diff`).  radial: [N, K] raw squared distance.

    One packed tensor (vs seven [E, 1] columns) keeps every row perfectly
    T(8,128)-tiled and costs one DMA per block.
    """
    db, ob, tb, pb = bins
    e = idx.shape[0] * idx.shape[1]
    rows = [idx, edge_mask, db, ob, tb, pb, rp, radial] + [
        cdn[..., d] for d in range(3)
    ]
    tab = jnp.stack([r.reshape(e).astype(jnp.float32) for r in rows])
    return jnp.pad(tab, ((0, ROWS - len(rows)), (0, 0)))


def _message_chain(tab_ref, a_ref, B_ref, tsp_ref, tp_ref,
                   wl1_ref, bl1_ref, watt_ref, batt_ref,
                   k: int, n: int):
    """Shared edge pipeline -> (m2 [E, C] f32, m2g gated [E, C],
    oh_mask [BN, E] mask-folded seg-sum matrix)."""
    bn = a_ref.shape[0]
    e = tab_ref.shape[1]

    idx = tab_ref[R_IDX : R_IDX + 1, :]      # [1, E] f32 (exact ints)
    mask = tab_ref[R_MASK : R_MASK + 1, :]   # [1, E]
    radial = tab_ref[R_RAD : R_RAD + 1, :]   # [1, E]

    # The ENTIRE edge-MLP input is ONE stacked one-hot/value matmul:
    #   rows 0..N-1            select B[idx[e]]            (neighbor gather)
    #   rows N..N+BN-1         select a[e // K]            (source broadcast
    #                          — K = N + BN lands exactly on a 128 multiple,
    #                          see block_n, so this rides the K-padding free)
    #   next 100 rows          spatial-bin multi-hot @ pre-fused embed table
    #   next 3 rows            radial VALUE rows (rad_hi/lo x w_r hi/lo bf16
    #                          splits ~= rad * w_r to ~2^-15 relative)
    #   last 66 rows           relpos one-hot @ pre-fused embed table
    # Total padded contraction equals the sum of the separately-padded dots,
    # but one MXU pipeline replaces four dots + two [E, C] adds.
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, e), 0).astype(jnp.float32)
    oh_j = (iota_n == idx).astype(jnp.bfloat16)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (bn, e), 0)
    e_over_k = jax.lax.broadcasted_iota(jnp.int32, (bn, e), 1) // k
    oh_i = iota_i == e_over_k  # [BN, E]
    n_sp = tsp_ref.shape[0] - 3
    iota_sp = jax.lax.broadcasted_iota(jnp.int32, (n_sp, e), 0).astype(jnp.float32)
    oh_sp = (
        (iota_sp == tab_ref[R_DB : R_DB + 1, :])
        | (iota_sp == tab_ref[R_OB : R_OB + 1, :] + float(OMEGA_OFFSET))
        | (iota_sp == tab_ref[R_TB : R_TB + 1, :] + float(THETA_OFFSET))
        | (iota_sp == tab_ref[R_PB : R_PB + 1, :] + float(PHI_OFFSET))
    ).astype(jnp.bfloat16)
    rad_hi, rad_lo = split_bf16_2(radial)
    n_rp = tp_ref.shape[0]
    iota_rp = jax.lax.broadcasted_iota(jnp.int32, (n_rp, e), 0).astype(jnp.float32)
    oh_rp = (iota_rp == tab_ref[R_RP : R_RP + 1, :]).astype(jnp.bfloat16)
    oh_all = jnp.concatenate(
        [oh_j, oh_i.astype(jnp.bfloat16), oh_sp, rad_hi, rad_lo, rad_hi, oh_rp],
        axis=0,
    )  # [N+BN+SP+3+RP, E]
    t_all = jnp.concatenate(
        [B_ref[:].astype(jnp.bfloat16), a_ref[:].astype(jnp.bfloat16),
         tsp_ref[:], tp_ref[:]],
        axis=0,
    )  # [N+BN+SP+3+RP, C]
    pre = _dot_t0(oh_all, t_all)  # [E, C]
    m = jax.nn.silu(pre)
    m2 = jax.nn.silu(
        _dot(m.astype(jnp.bfloat16), wl1_ref[:].astype(jnp.bfloat16))
        + bl1_ref[:]
    )  # [E, C] f32

    # attention gate as an exact-f32 VPU column reduce (egnn.py:91-103);
    # folded into m2 so the seg-sum needs no gate row at all
    att_col = jax.nn.sigmoid(
        (m2 * watt_ref[:]).sum(-1, keepdims=True) + batt_ref[0, 0]
    )  # [E, 1]
    m2g = m2 * att_col

    # seg-sum matrix with the edge mask folded in (mask is binary)
    oh_mask = oh_i.astype(jnp.float32) * mask  # [BN, E]
    return m2, m2g, oh_mask


def _kernel(tab_ref, a_ref, B_ref, tsp_ref, tp_ref,
            wl1_ref, bl1_ref, watt_ref, batt_ref,
            agg_ref, *, k, n):
    m2, m2g, oh_mask = _message_chain(
        tab_ref, a_ref, B_ref, tsp_ref, tp_ref,
        wl1_ref, bl1_ref, watt_ref, batt_ref, k, n,
    )
    agg_ref[:] = _seg_dot(oh_mask, m2g)


def _kernel_coord(tab_ref, a_ref, B_ref, tsp_ref, tp_ref,
                  wl1_ref, bl1_ref, watt_ref, batt_ref,
                  wc0_ref, bc0_ref, wc1_ref,
                  agg_ref, trans_ref, *, k, n):
    m2, m2g, oh_mask = _message_chain(
        tab_ref, a_ref, B_ref, tsp_ref, tp_ref,
        wl1_ref, bl1_ref, watt_ref, batt_ref, k, n,
    )
    agg_ref[:] = _seg_dot(oh_mask, m2g)

    # coord branch (last layer): the coord MLP consumes the gated message
    # m2 * att * mask (egnn.py:118-126); the mask factor is deferred to the
    # seg-sum matrix (oh_mask) — masked edges vanish there either way, and
    # for valid edges m2 * att == m2g exactly (mask is binary).
    cw = jax.nn.silu(
        _dot(m2g.astype(jnp.bfloat16), wc0_ref[:].astype(jnp.bfloat16))
        + bc0_ref[:]
    )  # [E, C]
    w_row = _row_dot(wc1_ref[:], cw)  # [1, E]
    w_row = jnp.clip(w_row, -2.0, 2.0)
    oh_w = oh_mask * w_row  # [BN, E]
    cdn = tab_ref[R_CD : R_CD + 3, :]  # [3, E]
    trans_ref[:] = _dot3(oh_w, cdn, ((1,), (1,)))


def _build_specs(bn):
    def tab_spec(e_blk):
        return pl.BlockSpec(
            (ROWS, e_blk), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    row = lambda *shape: pl.BlockSpec(
        (bn,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return tab_spec, row, full


def fused_edge_layer(
    tab, a_i, B, t_sp, t_p, w_r, w_l1, b_l1, w_att, b_att,
    *, k: int, coord_params=None,
):
    """One E_GCL edge pipeline.

    Args:
      tab: [ROWS, N*K] f32 packed edge table (pack_edge_table).
      a_i: [N, C] f32 source-node projection incl. edge-MLP bias.
      B: [N, C] f32 dest-node projection (gathered in-kernel).
      t_sp: [S, C] bf16 pre-fused spatial embed table (W_sp @ W_e).
      t_p: [Rp, C] bf16 pre-fused relpos embed table.
      w_r: [1, C] f32 radial row of the edge-MLP input weight (folded into
        the spatial matmul as three bf16 hi/lo rows — see _message_chain).
      w_l1: [C, C] f32; b_l1: [1, C] f32.
      w_att: [1, C] f32; b_att: [1, 1] f32.
      coord_params: optional (wc0 [C, C], bc0 [1, C], wc1 [1, C]).

    Returns agg [N, C] f32 (+ trans_sum [N, 3] f32 with coord_params).
    """
    n, c = B.shape
    bn = block_n(n)
    e_blk = bn * k
    grid = (n // bn,)
    # augment the spatial table with the radial rows (rad_hi*wr_hi +
    # rad_lo*wr_hi + rad_hi*wr_lo ~= rad*w_r to ~2^-15 relative)
    wr_hi, wr_lo = split_bf16_2(w_r)
    t_sp_aug = jnp.concatenate([t_sp, wr_hi, wr_hi, wr_lo], axis=0)
    tab_spec, row, full = _build_specs(bn)
    in_specs = [
        tab_spec(e_blk),
        row(c),            # a_i rows
        full(n, c),        # B
        full(t_sp_aug.shape[0], c),
        full(t_p.shape[0], c),
        full(c, c),        # w_l1
        full(1, c),        # b_l1
        full(1, c),        # w_att
        full(1, 1),        # b_att
    ]
    common = (tab, a_i, B, t_sp_aug, t_p, w_l1, b_l1, w_att, b_att)
    if coord_params is None:
        return pl.pallas_call(
            functools.partial(_kernel, k=k, n=n),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bn, c), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
            interpret=_interpret(),
            compiler_params=_params(),
        )(*common)
    wc0, bc0, wc1 = coord_params
    in_specs += [full(c, c), full(1, c), full(1, c)]
    return pl.pallas_call(
        functools.partial(_kernel_coord, k=k, n=n),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
        ),
        interpret=_interpret(),
        compiler_params=_params(),
    )(*common, wc0, bc0, wc1)
