"""Pallas TPU kernel: fused kNN + Gumbel-top-k edge selection.

Replaces the two per-step [P, N, N] sorts in `models/edges.select_edges`
(xprof r3: 86 ms of a 1.50 s P=40 sampler run, the largest non-kernel cost
after the 6D featurize) with one pass of iterative max-extraction:

- a sort network touches every element ~log^2(N) (~81) times; extracting
  knn+sample (60) maxima touches it 60 times with far simpler ops, and both
  selections (kNN by distance, then Gumbel-weighted sampling of the
  non-kNN remainder) happen in ONE kernel on ONE read of the distance block
  — the kth-distance threshold that forces XLA to run the two sorts
  back-to-back is just a register here;
- the neighbour-validity lookup (`gather_vec(node_mask, idx)` — a one-hot
  MXU matmul in XLA) rides along for free: the extraction one-hot dotted
  with the mask row IS that gather;
- everything stays row-major [BN, N] (minor-dim-1 tensors are a 128x tax,
  NOTES.md round 3); per-iteration outputs accumulate into [BN, LANES]
  via iota-column one-hots, never through width-1 stores.

Bit-exactness: extraction-by-iterated-max yields exactly `lax.top_k`'s
output (values in descending order, ties broken by lower index — the
min-index reduce below) given bit-identical inputs, so the Gumbel tensor and
the inverse-cubic logits are precomputed in XLA with the SAME ops as the
slow path and passed in; the kernel only compares and selects.  Pose
trajectories are therefore bit-identical to the XLA path whenever the graph
has >= knn+sample valid candidates (every real complex); for tiny graphs the
paths may pick different PADDED slots, which `edge_mask` zeroes either way.

Reference semantics: src/models/score_net_mlsb.py:85-157 (knn + multinomial
1/d^3 sampling without replacement).  Inference fast path only; training
uses the XLA formulation (select_edges is not differentiated through).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfmdock_tpu.ops.fused_egcl import _interpret, _params, block_n

_NEG_INF = -1e30  # masked-lane value, matches models/edges._NEG_INF
_SUPPRESS = -2e30  # post-extraction value: below every representable input
_BIG = 1e30


def _extract_topk(x, mask_row, iota_lane, iota_out, k, col0, out_idx, out_mj):
    """Iteratively extract the k row-maxima of x [BN, N].

    Ties resolve to the lowest lane index (lax.top_k's order).  Returns the
    updated (suppressed) x, the k-th max value [BN, 1], and out_idx/out_mj
    [BN, LANES] with extraction t's index (and the mask row's value at it)
    accumulated into column col0 + t.
    """
    kth = None
    for t in range(k):
        m = jnp.max(x, axis=1, keepdims=True)  # [BN, 1]
        eq = x == m
        idx_c = jnp.min(
            jnp.where(eq, iota_lane, _BIG), axis=1, keepdims=True
        )  # [BN, 1] lowest tying lane, as exact f32
        sel = iota_lane == idx_c  # one-hot [BN, N]
        mj = jnp.max(
            jnp.where(sel, mask_row, 0.0), axis=1, keepdims=True
        )  # mask[idx_c]: the gather_vec(node_mask, idx) lookup, free here
        x = jnp.where(sel, _SUPPRESS, x)
        col = iota_out == float(col0 + t)  # [BN, LANES]
        out_idx = out_idx + jnp.where(col, idx_c, 0.0)
        out_mj = out_mj + jnp.where(col, mj, 0.0)
        kth = m
    return x, kth, out_idx, out_mj


def _kernel(dist_ref, y_ref, mask_ref, idx_ref, mj_ref, *, knn, sample, lanes):
    bn = dist_ref.shape[0]
    n = dist_ref.shape[1]
    mask_row = mask_ref[0:1, :]  # [1, N]
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (bn, n), 1).astype(
        jnp.float32
    )
    iota_out = jax.lax.broadcasted_iota(jnp.int32, (bn, lanes), 1).astype(
        jnp.float32
    )
    out_idx = jnp.zeros((bn, lanes), jnp.float32)
    out_mj = jnp.zeros((bn, lanes), jnp.float32)

    # phase 1: kNN on masked -dist (same where/negate ops as the XLA path)
    masked_neg = jnp.where(mask_row > 0.5, -dist_ref[:, :], _NEG_INF)
    x, kth, out_idx, out_mj = _extract_topk(
        masked_neg, mask_row, iota_lane, iota_out, knn, 0, out_idx, out_mj
    )

    if sample > 0:
        # phase 2: Gumbel top-k over non-kNN lanes.  y_ref holds the
        # XLA-precomputed (valid-masked logits + gumbel); re-masking kNN
        # members by the kth-distance threshold reproduces the slow path's
        # `masked_neg < kth_neg` exclusion bit-for-bit (pure compares on
        # bit-identical values).
        y = jnp.where(masked_neg < kth, y_ref[:, :], _NEG_INF)
        _, _, out_idx, out_mj = _extract_topk(
            y, mask_row, iota_lane, iota_out, sample, knn, out_idx, out_mj
        )

    idx_ref[:, :] = out_idx
    mj_ref[:, :] = out_mj


def select_topk_fused(
    key: jax.Array,
    dist: jnp.ndarray,
    node_mask: jnp.ndarray,
    knn: int = 20,
    sample_size: int = 40,
):
    """Drop-in fast path for `models.edges.select_edges` (same signature and
    return contract: idx [N, knn+sample] int32, edge_mask [N, knn+sample]).

    Exact at EVERY padded width (extraction is exact selection, no
    approx_max_k recall question), so no verified-width gating is needed.
    """
    n_tot = dist.shape[0]
    k_tot = knn + sample_size
    assert 0 < knn and k_tot <= 128, (knn, sample_size)
    lanes = 64 if k_tot <= 64 else 128
    valid_col = node_mask[None, :]
    n = node_mask.sum()

    # Same-op precompute as the slow path (bit-identical inputs -> identical
    # selections): models/edges.py logits/gumbel construction.
    if sample_size > 0:
        logits = -3.0 * jnp.log(jnp.maximum(dist, 1e-10))
        y_all = jnp.where(valid_col, logits, _NEG_INF) + jax.random.gumbel(
            key, (n_tot, n_tot)
        )
    else:
        y_all = jnp.zeros_like(dist)
    mask_row = jnp.broadcast_to(
        node_mask.astype(jnp.float32)[None, :], (8, n_tot)
    )  # sublane-tile-high so the block never pads implicitly

    bn = block_n(n_tot)
    grid = (n_tot // bn,)
    row = lambda w: pl.BlockSpec((bn, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    idx_f, mj = pl.pallas_call(
        functools.partial(_kernel, knn=knn, sample=sample_size, lanes=lanes),
        grid=grid,
        in_specs=[
            row(n_tot),
            row(n_tot),
            pl.BlockSpec((8, n_tot), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(row(lanes), row(lanes)),
        out_shape=(
            jax.ShapeDtypeStruct((n_tot, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_tot, lanes), jnp.float32),
        ),
        interpret=_interpret(),
        compiler_params=_params(),
    )(dist, y_all, mask_row)

    idx = idx_f[:, :k_tot].astype(jnp.int32)

    # slot validity: identical to the slow path (models/edges.py:81-92)
    n_knn = jnp.minimum(n, knn)
    n_samp = jnp.clip(n - knn, 0, sample_size)
    slot = jnp.arange(k_tot)
    slot_ok = jnp.where(slot < knn, slot < n_knn, (slot - knn) < n_samp)
    edge_mask = (
        node_mask[:, None] & slot_ok[None, :] & (mj[:, :k_tot] > 0.5)
    ).astype(jnp.float32)
    return idx, edge_mask
