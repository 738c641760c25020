"""Residue rigid frames and frame-relative pair features.

Mirrors reference src/utils/frame.py: Gram-Schmidt frames from N/CA/C
(get_rotat, frame.py:7-23) and the 25-dim pair features
[dist-RBF(16) | direction(3) | orientation-6D(6)] (get_pairs, frame.py:48-53)
that the (absent) force_model config expects — kept for inventory parity and
future model variants.
"""
from __future__ import annotations

import jax.numpy as jnp

from dfmdock_tpu.geom import matrix_to_rotation_6d


def residue_frames(pos: jnp.ndarray) -> jnp.ndarray:
    """[N, 3, 3] backbone -> [N, 3, 3] rotation matrices (columns e1,e2,e3).

    e1 = unit(C - CA); e2 = unit((N - CA) orthogonalized against e1);
    e3 = e1 x e2 (frame.py:7-23).
    """
    n_at, ca, c_at = pos[:, 0], pos[:, 1], pos[:, 2]
    v1 = c_at - ca
    v2 = n_at - ca
    e1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True).clip(1e-12)
    u2 = v2 - e1 * (e1 * v2).sum(-1, keepdims=True)
    e2 = u2 / jnp.linalg.norm(u2, axis=-1, keepdims=True).clip(1e-12)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)


def rbf(values, v_min=2.0, v_max=22.0, n_bins=16):
    """Radial basis encoding (frame.py:55-64)."""
    centers = jnp.linspace(v_min, v_max, n_bins)
    std = (v_max - v_min) / n_bins
    z = (values[..., None] - centers) / std
    return jnp.exp(-(z**2))


def pair_features(trans: jnp.ndarray, rotat: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] CA + [N, 3, 3] frames -> [N, N, 25] pair features
    (frame.py:25-53): RBF(16) of distances, frame-local direction (3),
    relative orientation as 6D (6)."""
    vec = trans[:, None, :] - trans[None, :, :]
    dist = jnp.linalg.norm(vec, axis=-1)
    d_feat = rbf(dist)

    direct = vec / jnp.maximum(dist[..., None], 1e-12)
    # rotate into frame i: R_i^T @ v_ij
    direct = jnp.einsum("ikc,ijk->ijc", rotat, direct)

    orient = jnp.einsum("iab,jac->ijbc", rotat, rotat)  # R_i^T R_j
    o_feat = matrix_to_rotation_6d(orient)

    return jnp.concatenate([d_feat, direct, o_feat], axis=-1)
