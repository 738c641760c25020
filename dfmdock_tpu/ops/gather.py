"""Exact row gathers as one-hot MXU matmuls.

XLA lowers small dynamic-index gathers on TPU as scalar loops (~5 ns/element:
a [448, 60] index set costs ~2.5-3.5 ms per gather inside the sampler scan —
measured via hlo_stats, round 2).  one_hot(idx) @ src runs on the MXU instead.

Exactness: bf16 one-hot entries are exact (0/1), and the source is split into
three bf16 terms hi + mid + lo (successive residuals); each part is exactly
representable, the products accumulate in f32, and a one-hot row selects a
single element, so the sum reconstructs the f32 value to ~2^-27 relative —
below f32 ulp for the magnitudes here (exact for integers < 2^16).
Differentiable w.r.t. src (the backward pass is the transpose matmul, i.e. a
segment-sum scatter — also MXU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_rows(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """src[idx] for src [N, S] float32, idx [..., ] int -> [..., S] float32.

    The one-hot (idx[..., None] == iota) is written identically at every call
    site so XLA CSE materializes it once per distinct idx.
    """
    n, s = src.shape
    oh = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).astype(jnp.bfloat16)
    hi = src.astype(jnp.bfloat16)
    r1 = src - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
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
