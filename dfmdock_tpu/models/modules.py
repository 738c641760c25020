"""Minimal functional NN building blocks (params as plain dict pytrees).

Parameters use the JAX convention w: [in, out] (apply is x @ w); the
torch-checkpoint converter transposes.  Initialization matches the reference
nets' effective init: every Linear ~ N(0, 0.02), biases 0, norms (1, 0)
(score_net_mlsb.py:332-341 — note the blanket `apply(_init_weights)` runs
last, so it also overwrites the EGNN coord head's xavier init).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch nn.LayerNorm / PyG GraphNorm default


def linear_init(key, in_dim, out_dim, bias=True, std=0.02):
    p = {"w": jax.random.normal(key, (in_dim, out_dim)) * std}
    if bias:
        p["b"] = jnp.zeros((out_dim,))
    return p


def linear(p, x, dtype=None):
    """x @ w (+ b). With `dtype` (e.g. bfloat16), inputs are cast for the MXU
    and the product accumulates in float32 (preferred_element_type)."""
    if dtype is None:
        y = x @ p["w"]
    else:
        y = jnp.dot(
            x.astype(dtype), p["w"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
    if "b" in p:
        y = y + p["b"]
    return y


def layer_norm_init(dim):
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def layer_norm(p, x):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * p["g"] + p["b"]


def graph_norm_init(dim):
    # PyG GraphNorm: weight=1, bias=0, mean_scale=1
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,)), "mean_scale": jnp.ones((dim,))}


def graph_norm(p, x, node_mask):
    """torch_geometric.nn.norm.GraphNorm over a single (masked) graph.

    out = g * (x - mean(x) * mean_scale) / sqrt(var(x - mean*mean_scale) + eps) + b
    with mean/var over *valid* nodes (reference egnn.py:74 operates on the
    unpadded graph; the mask reproduces that under padding).
    """
    m = node_mask.astype(x.dtype)[:, None]
    count = jnp.maximum(m.sum(), 1.0)
    mean = (x * m).sum(0, keepdims=True) / count
    shifted = x - mean * p["mean_scale"]
    var = ((shifted**2) * m).sum(0, keepdims=True) / count
    return p["g"] * shifted * jax.lax.rsqrt(var + LN_EPS) + p["b"]


def dropout(key, x, rate, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def gaussian_fourier_init(key, embed_dim, scale=1.0):
    """Fixed (non-trainable) random features W ~ N(0, scale)
    (score_net_mlsb.py:162-172)."""
    return {"W": jax.random.normal(key, (embed_dim // 2,)) * scale}


def gaussian_fourier(p, t):
    """t: [...] -> [..., embed_dim]: concat(sin, cos) of 2*pi*W*t."""
    x_proj = t[..., None] * p["W"] * (2 * jnp.pi)
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)
