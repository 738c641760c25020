"""Golden tests for geom.rotations against scipy.spatial.transform.Rotation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from dfmdock_tpu.geom import (
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    compose_axis_angle,
    kabsch,
    matrix_to_axis_angle,
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
    random_rotation_matrix,
    rotation_6d_to_matrix,
)

RNG = np.random.RandomState(0)


def random_rotvecs(n=64):
    v = RNG.randn(n, 3)
    # mix of tiny, moderate, near-pi angles
    scales = np.concatenate(
        [np.full(n // 4, 1e-8), RNG.uniform(0.1, 3.0, n - n // 2), np.full(n // 4, np.pi - 1e-4)]
    )
    return v / np.linalg.norm(v, axis=-1, keepdims=True) * scales[:, None]


def test_axis_angle_matrix_roundtrip_vs_scipy():
    rv = random_rotvecs()
    R_scipy = Rotation.from_rotvec(rv).as_matrix()
    R_jax = np.asarray(axis_angle_to_matrix(jnp.asarray(rv)))
    np.testing.assert_allclose(R_jax, R_scipy, atol=1e-5)

    rv_back = np.asarray(matrix_to_axis_angle(jnp.asarray(R_scipy)))
    # axis-angle is unique up to 2pi wraps; all angles here are in (0, pi)
    np.testing.assert_allclose(rv_back, rv, atol=1e-4)


def test_quaternion_vs_scipy():
    rv = random_rotvecs()
    q_scipy = Rotation.from_rotvec(rv).as_quat()  # (x,y,z,w)
    q_scipy_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=-1)
    # fix sign: canonical non-negative w
    q_scipy_wxyz *= np.where(q_scipy_wxyz[:, :1] < 0, -1.0, 1.0)

    q_jax = np.asarray(axis_angle_to_quaternion(jnp.asarray(rv)))
    np.testing.assert_allclose(q_jax, q_scipy_wxyz, atol=1e-5)

    R = Rotation.from_rotvec(rv).as_matrix()
    q_from_mat = np.asarray(matrix_to_quaternion(jnp.asarray(R)))
    np.testing.assert_allclose(q_from_mat, q_scipy_wxyz, atol=1e-5)

    rv_back = np.asarray(quaternion_to_axis_angle(jnp.asarray(q_scipy_wxyz)))
    np.testing.assert_allclose(rv_back, rv, atol=1e-4)

    R_back = np.asarray(quaternion_to_matrix(jnp.asarray(q_scipy_wxyz)))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_compose_axis_angle():
    rv1, rv2 = random_rotvecs(8), random_rotvecs(8)
    # reference rot_compose: axis-angle of R2 @ R1 (inference_base.py:311-316)
    expected_mat = Rotation.from_rotvec(rv2).as_matrix() @ Rotation.from_rotvec(rv1).as_matrix()
    got = np.asarray(compose_axis_angle(jnp.asarray(rv1), jnp.asarray(rv2)))
    # compare on the matrix level (rotvec near theta=pi amplifies f32 noise)
    np.testing.assert_allclose(
        Rotation.from_rotvec(got).as_matrix(), expected_mat, atol=1e-4
    )
    np.testing.assert_allclose(got, Rotation.from_matrix(expected_mat).as_rotvec(), atol=5e-3)


def test_rotation_6d_roundtrip():
    rv = random_rotvecs(16)
    R = Rotation.from_rotvec(rv).as_matrix()
    d6 = matrix_to_rotation_6d(jnp.asarray(R))
    R_back = np.asarray(rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_random_rotation_uniform():
    R = np.asarray(random_rotation_matrix(jax.random.PRNGKey(0), (512,)))
    # valid rotations
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ np.transpose(R, (0, 2, 1)), eye, atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    # mean of uniformly random rotation matrices approaches 0
    assert np.abs(R.mean(axis=0)).max() < 0.1


def test_kabsch_recovers_transform():
    A = RNG.randn(50, 3)
    R_true = Rotation.from_rotvec([0.3, -1.2, 0.5]).as_matrix()
    t_true = np.array([1.0, -2.0, 3.0])
    B = A @ R_true.T + t_true
    R, t = kabsch(jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)
    # alignment achieves ~0 RMSD
    aligned = A @ np.asarray(R).T + np.asarray(t)
    assert np.abs(aligned - B).max() < 1e-5


def test_kabsch_reflection_corrected():
    # degenerate/reflected case: ensure det(R) = +1 still
    A = RNG.randn(10, 3)
    B = A.copy()
    B[:, 2] *= -1  # reflection
    R, _ = kabsch(jnp.asarray(A), jnp.asarray(B))
    assert np.linalg.det(np.asarray(R)) > 0.99


def test_kabsch_weighted_matches_subset():
    A = RNG.randn(30, 3)
    R_true = Rotation.random(random_state=1).as_matrix()
    B = A @ R_true.T + np.array([0.5, 0.5, -1.0])
    # corrupt the last 10 points, zero their weights
    B_corrupt = B.copy()
    B_corrupt[20:] += 100.0
    w = np.ones(30)
    w[20:] = 0.0
    R, t = kabsch(jnp.asarray(A), jnp.asarray(B_corrupt), weights=jnp.asarray(w))
    R_ref, t_ref = kabsch(jnp.asarray(A[:20]), jnp.asarray(B[:20]))
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), atol=1e-4)


def test_jit_and_vmap_safe():
    rv = jnp.asarray(random_rotvecs(8))
    f = jax.jit(jax.vmap(axis_angle_to_matrix))
    np.testing.assert_allclose(
        np.asarray(f(rv)), np.asarray(axis_angle_to_matrix(rv)), atol=1e-6
    )
    g = jax.grad(lambda v: axis_angle_to_matrix(v).sum())
    assert np.isfinite(np.asarray(g(rv[0]))).all()
