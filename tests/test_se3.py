import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu.utils import se3


def rand_rot(rng, scale=np.pi * 0.9):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0, scale)
    return np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)))


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * rng.uniform(1e-4, 3.0)
        w = jnp.asarray(w, jnp.float32)
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-2)


def test_so3_exp_small_angle():
    w = jnp.array([1e-8, -2e-8, 3e-8], jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        xi = jnp.asarray(rng.normal(size=6) * 0.8, jnp.float32)
        T = se3.se3_exp(xi)
        xi2 = se3.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-2)


def test_mat_inv():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.normal(size=6), jnp.float32)
    T = se3.se3_exp(xi)
    eye = se3.mat_inv(T) @ T
    np.testing.assert_allclose(np.asarray(eye), np.eye(4), atol=1e-5)


def test_rotation_is_orthonormal():
    rng = np.random.default_rng(3)
    R = rand_rot(rng)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1) < 1e-5


def test_euler_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(10):
        yaw = rng.uniform(-np.pi, np.pi)
        pitch = rng.uniform(-1.4, 1.4)
        roll = rng.uniform(-np.pi, np.pi)
        R = se3.euler_zyx_to_mat(jnp.float32(yaw), jnp.float32(pitch),
                                 jnp.float32(roll))
        y2, p2, r2 = se3.mat_to_euler_zyx(R)
        np.testing.assert_allclose([float(y2), float(p2), float(r2)],
                                   [yaw, pitch, roll], atol=1e-4)


def test_pose6_roundtrip():
    p = jnp.array([0.1, -0.2, 1.3, 4.0, -5.0, 0.5], jnp.float32)
    T = se3.pose6_to_mat(p)
    p2 = se3.mat_to_pose6(T)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-5)


def test_transform_points():
    T = se3.se3_exp(jnp.array([0, 0, np.pi / 2, 1, 0, 0], jnp.float32))
    pts = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)
    out = se3.transform_points(T, pts)
    # 90 deg yaw about z maps (1,0,0)->(0,1,0); translation part of exp is
    # V@v, not v, so just check consistency with the matrix itself.
    expect = (np.asarray(T)[:3, :3] @ np.array([1, 0, 0.0])) + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(out)[0], expect, atol=1e-6)


def test_best_fit_transform_recovers_rigid_motion():
    rng = np.random.default_rng(5)
    src = rng.normal(size=(50, 3)).astype(np.float32) * 5
    T_true = se3.se3_exp(jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32))
    dst = se3.transform_points(T_true, jnp.asarray(src))
    T_est = se3.best_fit_transform(jnp.asarray(src), dst)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_true), atol=1e-4)


def test_umeyama_identity():
    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.normal(size=(30, 3)), jnp.float32)
    R, t, s = se3.umeyama_alignment(pts, pts)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.zeros(3), atol=1e-5)


def test_batched_ops():
    rng = np.random.default_rng(7)
    xi = jnp.asarray(rng.normal(size=(4, 6)) * 0.5, jnp.float32)
    T = se3.se3_exp(xi)
    assert T.shape == (4, 4, 4)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-2)
