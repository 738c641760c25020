"""Rotation parameterizations and rigid alignment, in pure JAX.

Mirrors the semantics of the reference's pytorch3d-derived conversions
(reference src/utils/geometry.py:18-328) and Kabsch alignment
(geometry.py:225-260, metrics.py:87-121), implemented independently with
jit/vmap/grad-safe formulations (no boolean indexing, no data-dependent
branches).

Conventions: quaternions are (w, x, y, z) with real part first; axis-angle
vectors have magnitude = rotation angle in radians (right-handed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


# ----------------------------------------------------------------------------
# Quaternion <-> matrix


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3, 3] rotation matrices."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    o = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - z * w),
            2 * (x * z + y * w),
            2 * (x * y + z * w),
            1 - 2 * (x * x + z * z),
            2 * (y * z - x * w),
            2 * (x * z - y * w),
            2 * (y * z + x * w),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return o.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w,x,y,z), branch-free (select of 4 candidates).

    Uses the standard 4-way stable extraction: compute all four candidate
    quaternions (one per largest diagonal choice) and select by the largest
    denominator, which is jit/vmap safe.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Each candidate is the true quaternion scaled by 2*s for its own s
    # (s = sqrt of the diagonal combination), so the pivot entry is s^2:
    # candidate 0: w largest
    q0 = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    # candidate 1: x largest
    q1 = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    # candidate 2: y largest
    q2 = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    # candidate 3: z largest
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)

    # normalize each candidate; the scale factors cancel
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    cands = cands / jnp.linalg.norm(cands, axis=-1, keepdims=True).clip(_EPS)

    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    idx = jnp.argmax(scores, axis=-1)
    quat = jnp.take_along_axis(cands, idx[..., None, None], axis=-2).squeeze(-2)
    # canonical sign: non-negative real part
    quat = quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)
    return quat


# ----------------------------------------------------------------------------
# Axis-angle <-> quaternion / matrix


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 4] (w,x,y,z). Taylor-safe near zero angle."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    # sin(half)/angle: stable via Taylor 0.5 - angle^2/48 near zero
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3]."""
    quat = quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)
    norms = jnp.linalg.norm(quat[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, quat[..., :1])
    angle = 2.0 * half
    small = jnp.abs(angle) < 1e-6
    # angle / sin(half): stable via Taylor 2 + angle^2/12 near zero
    scale = jnp.where(
        small, 2.0 + (angle * angle) / 12.0, angle / jnp.where(small, 1.0, jnp.sin(half))
    )
    return quat[..., 1:] * scale


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def compose_axis_angle(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle of R2 @ R1 (matches reference rot_compose, inference_base.py:311-316)."""
    return matrix_to_axis_angle(axis_angle_to_matrix(r2) @ axis_angle_to_matrix(r1))


# ----------------------------------------------------------------------------
# 6D rotation representation (Zhou et al. 2019; reference geometry.py:202-284)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6]: first two ROWS of the matrix, flattened."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] via Gram-Schmidt."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(_EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True).clip(_EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


# ----------------------------------------------------------------------------
# Sampling


def random_rotation_matrix(key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
    """Uniform random rotations (Haar measure on SO(3)) via normalized quaternions.

    Replaces scipy Rotation.random() (reference inference_base.py:326) with an
    on-device sampler.
    """
    quat = jax.random.normal(key, shape + (4,))
    return quaternion_to_matrix(quat)


# ----------------------------------------------------------------------------
# Rigid alignment (Kabsch; reference metrics.py:87-121)


def kabsch(A: jnp.ndarray, B: jnp.ndarray, weights: jnp.ndarray | None = None):
    """Optimal rotation R and translation t aligning A onto B: R @ A.T + t ~= B.

    Args:
      A, B: [N, 3] paired point clouds.
      weights: optional [N] non-negative weights (used for masked/padded input).

    Returns:
      (R [3,3], t [3]) with det(R) = +1 (reflections corrected, branch-free).
    """
    # full-precision matmuls: this is an eval-path op (DockQ RMSDs) where the
    # TPU's default bf16 MXU accumulation costs ~1e-3 rotation error.
    mm = lambda x, y: jnp.matmul(x, y, precision=jax.lax.Precision.HIGHEST)
    if weights is None:
        a_mean = A.mean(axis=0)
        b_mean = B.mean(axis=0)
        H = mm((A - a_mean).T, B - b_mean)
    else:
        w = weights[:, None] / jnp.maximum(weights.sum(), _EPS)
        a_mean = (A * w).sum(axis=0)
        b_mean = (B * w).sum(axis=0)
        H = mm(((A - a_mean) * w).T, B - b_mean)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(mm(Vt.T, U.T)))
    S = jnp.diag(jnp.array([1.0, 1.0, 0.0])) + jnp.diag(jnp.array([0.0, 0.0, 1.0])) * d
    R = mm(mm(Vt.T, S), U.T)
    t = b_mean - R @ a_mean
    return R, t


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric cross-product matrices
    (reference geometry.py:286-328)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
