"""Exact row gathers as one-hot MXU matmuls + fold-proof bf16 splits.

XLA lowers small dynamic-index gathers on TPU as scalar loops (~5 ns/element:
a [448, 60] index set costs ~2.5-3.5 ms per gather inside the sampler scan —
measured via hlo_stats, round 2).  one_hot(idx) @ src runs on the MXU instead.

Exactness: bf16 one-hot entries are exact (0/1), and the source is split into
three bf16 terms hi + mid + lo (successive truncation residuals); 8+8+8
significand bits cover f32's full 24-bit significand, so hi + mid + lo == x
EXACTLY for every normal f32 (the only rounding would be at the bf16
subnormal floor, ~2^-133 — far below anything here).  The products accumulate
in f32 and a one-hot row selects a single element, so the gather is bit-exact;
scripts/hw_parity.py's split_fold_check asserts max reconstruction err == 0.0
on hardware, and the code relies on that exactness.
Differentiable w.r.t. src (the backward pass is the transpose matmul, i.e. a
segment-sum scatter — also MXU).

CRITICAL (round 4, measured on hardware): the split MUST NOT be written as
`x - f32(bf16(x))`.  Both XLA-on-TPU and Mosaic run with excess-precision
folding that elides the f32->bf16->f32 convert pair, collapsing the residual
to exactly zero — every gather silently truncated its source to single bf16
(max coord error 0.24 A at 1AVX scale; 1425 distance-bin flips).  The split
here rounds toward zero by masking the low 16 mantissa bits with integer ops
(`bitcast & 0xFFFF0000`), which no precision pass can fold; hw-gated by
scripts/hw_parity.py (split3 nonzero-residual check + edge-table rows).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HI_MASK = np.uint32(0xFFFF0000)


def _trunc16(x: jnp.ndarray) -> jnp.ndarray:
    """The f32 value of x with its low 16 bits zeroed (round-toward-zero
    bf16) — exactly bf16-representable, computed without any f32<->bf16
    convert for excess-precision passes to elide.

    Inputs are assumed finite: a NaN whose payload lives entirely in the
    low 16 mantissa bits (e.g. 0x7F800001) truncates to +/-Inf here, so
    hi/lo garbage propagation on non-finite inputs differs from a
    convert-based split.  Benign in this codebase — every consumer folds
    edge_mask over any masked/degenerate rows (same caveat as
    ops/edge_table.build_edge_table)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & _HI_MASK, jnp.float32)


def split_bf16_2(x: jnp.ndarray):
    """f32 -> (hi, lo) bf16 with hi + lo == x to ~2^-15 relative.
    hi is exact (truncation); the residual subtraction is exact (trunc
    toward zero shares x's sign and exponent), lo's bf16 cast rounds.
    NOTE: truncation (round-toward-zero) makes the residual up to 2x a
    round-to-nearest split's, so downstream products that drop an
    lo*lo-class cross term see ~2^-15 rel error, not ~2^-16 — the
    fold-proofness is worth the one lost bit (ADVICE r4)."""
    hi = _trunc16(x)
    lo = x - hi
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def split_bf16_3(x: jnp.ndarray):
    """f32 -> (hi, mid, lo) bf16 with hi + mid + lo == x EXACTLY for every
    normal f32: the truncations are exact, and lo's final bf16 cast is too
    (8+8+8 significand bits cover the 24-bit f32 significand; only values
    at the bf16 subnormal floor could round).  scripts/hw_parity.py gates
    this with a max-err == 0.0 assertion — reintroducing any rounding here
    is a contract violation, not a tolerance change.  Safe inside Pallas
    kernels and under jit on hardware — see module docstring for why the
    convert-based formulation is not."""
    hi = _trunc16(x)
    r1 = x - hi
    mid = _trunc16(r1)
    lo = r1 - mid
    return (
        hi.astype(jnp.bfloat16),
        mid.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


def gather_rows(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """src[idx] for src [N, S] float32, idx [..., ] int -> [..., S] float32.

    The one-hot (idx[..., None] == iota) is written identically at every call
    site so XLA CSE materializes it once per distinct idx.
    """
    n, s = src.shape
    oh = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).astype(jnp.bfloat16)
    hi, mid, lo = split_bf16_3(src)
    flat = oh.reshape(-1, n)
    out = (
        jnp.dot(flat, hi, preferred_element_type=jnp.float32)
        + jnp.dot(flat, mid, preferred_element_type=jnp.float32)
        + jnp.dot(flat, lo, preferred_element_type=jnp.float32)
    )
    return out.reshape(idx.shape + (s,))


def gather_vec(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """src[idx] for a 1-D src [N] (ints or flags) -> [...] float32."""
    return gather_rows(src.astype(jnp.float32)[:, None], idx)[..., 0]
