"""SO(3)/SE(3) utilities.

The reference runs its odometry in an Euler-angle "camera" frame with
hand-expanded trig (featureAssociation.cpp:955-1032, mapOptmization.cpp:
397-482).  We keep a single lidar frame and represent poses as 4x4
homogeneous matrices; incremental updates use the se(3) exponential map.
All functions are pure jnp and batch-friendly (leading dims broadcast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def hat(w):
    """so(3) hat operator: (...,3) -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def so3_exp(w):
    """Rodrigues: (...,3) -> (...,3,3).

    Gradient-safe at w = 0: the small-angle branch is a polynomial in
    ||w||^2 and sqrt never sees values near zero (double-where trick), so
    jax.grad/jacfwd through this is finite everywhere.
    """
    t2 = jnp.sum(w * w, -1)[..., None, None]
    small = t2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, t2))
    W = hat(w)
    W2 = W @ W
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R):
    """(...,3,3) -> (...,3). Principal log of a rotation matrix.

    Gradient-safe at R = I (arccos never sees +-1 on the taken branch)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    # NOTE: the guard must be coarser than f32 epsilon at 1.0 (1.19e-7) or
    # it never fires and arccos'(1) = -inf poisons jacfwd through this.
    small = cos > 1.0 - 1e-5
    cos_safe = jnp.where(small, 0.0, cos)
    theta = jnp.where(small, 0.0, jnp.arccos(cos_safe))
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)
    s = jnp.sin(theta)
    # theta/(2 sin theta); near theta=0 use Taylor in theta^2 ~ 2(1-cos).
    t2_small = 2.0 * (1.0 - cos)
    coef = jnp.where(small[..., None],
                     0.5 + t2_small[..., None] / 12.0,
                     theta[..., None] / jnp.where(small[..., None], 1.0,
                                                  2.0 * s[..., None] + _EPS))
    w = coef * w
    # Near theta = pi the above is ill-conditioned; fall back to sqrt of the
    # diagonal (sign from the off-diagonal terms).
    near_pi = theta > 3.0
    d = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis2 = jnp.clip((d + 1.0) * 0.5 + (1.0 - cos[..., None]) * 0.0, 0.0, None)
    axis = jnp.sqrt(jnp.clip((d - cos[..., None]) /
                             jnp.maximum(1.0 - cos[..., None], _EPS), 0.0, 1.0))
    del axis2
    sign = jnp.sign(jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1) + 1e-12)
    w_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def se3_exp(xi):
    """(...,6) twist [w, v] -> (...,4,4). Gradient-safe at xi = 0."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t2 = jnp.sum(w * w, -1)[..., None, None]
    small = t2 < 1e-8
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    W = hat(w)
    W2 = W @ W
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / (t2s * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b * W + c * W2
    t = (V @ v[..., None])[..., 0]
    return rt_to_mat(R, t)


def se3_log(T):
    """(...,4,4) -> (...,6) twist [w, v]. Gradient-safe at T = I."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = so3_log(R)
    t2 = jnp.sum(w * w, -1)[..., None, None]
    small = t2 < 1e-8
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    W = hat(w)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/theta^2 - (1+cos)/(2 theta sin)) W^2
    s, cth = jnp.sin(theta), jnp.cos(theta)
    coef = jnp.where(
        small, 1.0 / 12.0 + t2 / 720.0,
        (1.0 / t2s) - (1.0 + cth) / (2.0 * theta * s + _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = eye - 0.5 * W + coef * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], -1)


def rt_to_mat(R, t):
    """(...,3,3),(...,3) -> (...,4,4)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def mat_inv(T):
    """Inverse of an SE(3) matrix (no general 4x4 inversion)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T, pts):
    """Apply (...,4,4) to (...,N,3)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def euler_zyx_to_mat(yaw, pitch, roll):
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll) (x-fwd, y-left, z-up lidar frame)."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], -2)


def mat_to_euler_zyx(R):
    """Inverse of euler_zyx_to_mat: returns (yaw, pitch, roll)."""
    pitch = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return yaw, pitch, roll


def pose6_to_mat(p):
    """6-vec (roll, pitch, yaw, x, y, z) -> 4x4 (matches PointTypePose layout
    semantics, utility.h:175-193, but in the single lidar frame)."""
    R = euler_zyx_to_mat(p[..., 2], p[..., 1], p[..., 0])
    return rt_to_mat(R, p[..., 3:6])


def mat_to_pose6(T):
    yaw, pitch, roll = mat_to_euler_zyx(T[..., :3, :3])
    return jnp.concatenate(
        [jnp.stack([roll, pitch, yaw], -1), T[..., :3, 3]], -1)


def umeyama_alignment(src, dst, with_scale: bool = False):
    """Least-squares similarity transform aligning src -> dst, both (N,3).

    Used by trajectory evaluation (ATE) — no reference equivalent (the
    reference ships only qualitative overlays, SURVEY.md par.6).
    Returns (R, t, s) such that dst ~ s * R @ src + t.
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_s = (xs ** 2).sum() / src.shape[0]
    s = jnp.where(with_scale, (D * jnp.diag(S)).sum() / jnp.maximum(var_s, _EPS), 1.0)
    t = mu_d - s * R @ mu_s
    return R, t, s


def best_fit_transform(src, dst, weights=None):
    """Weighted point-to-point rigid fit: finds T with dst ~ R src + t.

    The SVD-based solve used inside ICP verification (replacing PCL's
    internal SVD estimator, mapOptmization.cpp:1012/1060 icp.align).
    src, dst: (N,3); weights: (N,) or None.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    wsum = jnp.maximum(weights.sum(), _EPS)
    mu_s = (weights[:, None] * src).sum(0) / wsum
    mu_d = (weights[:, None] * dst).sum(0) / wsum
    xs = src - mu_s
    xd = dst - mu_d
    cov = (weights[:, None] * xd).T @ xs
    U, _, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    t = mu_d - R @ mu_s
    return rt_to_mat(R, t)


def rotation_angle(R):
    """Geodesic angle of a rotation matrix (radians)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))
