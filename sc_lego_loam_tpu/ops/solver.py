"""Gauss-Newton machinery shared by scan-to-scan and scan-to-map LM
(reference C9: featureAssociation.cpp:1270-1478, C13: mapOptmization.cpp:
1401-1499).

The reference builds Jacobians from hand-expanded Euler trig and solves
``J^T J x = J^T (-0.05 d)`` with cv::solve; here residuals are differentiated
with jax.grad around an se(3) twist (or a stage-restricted subset) and the
normal equations are solved densely — with the reference's degeneracy guard:
eigen-decompose J^T W J once, zero-out update components along eigenvectors
whose eigenvalue is below a threshold (fA.cpp:1329-1356, mO.cpp:1450-1477).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) batched 3x3 solve — elementwise VPU math,
    ~20x cheaper than batched jnp.linalg.solve on this runtime."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c01 * b1 + c02 * b2) * inv_det
    x1 = (c10 * b0 + c11 * b1 + c12 * b2) * inv_det
    x2 = (c20 * b0 + c21 * b1 + c22 * b2) * inv_det
    return jnp.stack([x0, x1, x2], -1)


def robust_weight(abs_res: jnp.ndarray, slope: float, min_weight: float,
                  enabled) -> jnp.ndarray:
    """LOAM's linear robust weight s = 1 - slope*|d| (fA.cpp:1137-1140,
    mO.cpp:1332); points with s <= min_weight are dropped. ``enabled``
    gates it (the reference applies it only after iteration 5 in odometry)."""
    s = 1.0 - slope * abs_res
    w = jnp.where(s > min_weight, s, 0.0)
    return jnp.where(enabled, w, 1.0)


def solve_spd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled-Cholesky solve for a single small (n<=8) SPD system.

    jnp.linalg.solve lowers to a pivoted-LU LAPACK-style kernel on TPU
    (~100 us of sequential control flow); the damped normal equations are
    SPD, so an unrolled Cholesky — ~n^3/3 scalar ops that fuse into the
    surrounding elementwise kernel — does the same work at VPU cost.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                # Non-positive pivot = singular/indefinite H: propagate NaN
                # so the callers' isfinite guards zero the step (the same
                # contract the LU path had; clamping instead would emit a
                # huge-but-finite delta that slips past those guards).
                L[i][j] = jnp.sqrt(jnp.where(s > 0, s, jnp.nan))
            else:
                L[i][j] = s / L[j][j]
    # Forward substitution L y = b.
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Back substitution L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, -1)


def gauss_newton_step(J: jnp.ndarray, r: jnp.ndarray, w: jnp.ndarray,
                      damping: float = 1e-6):
    """One damped GN step. J: (N,P), r: (N,), w: (N,) weights (0 = dropped).
    Returns (delta (P,), H (P,P), g (P,))  minimizing sum w (J d + r)^2."""
    Jw = J * w[:, None]
    H = Jw.T @ J
    g = Jw.T @ r
    P = J.shape[1]
    delta = solve_spd(H + damping * jnp.eye(P, dtype=J.dtype), -g)
    return delta, H, g


def sym3_eig(A: jnp.ndarray):
    """Closed-form eigendecomposition of batched symmetric 3x3 matrices.

    Returns (evals (...,3) ascending, v_max (...,3) unit eigenvector of the
    LARGEST eigenvalue).  Replaces jnp.linalg.eigh in the per-point line
    fits (cornerOptimization analog): the iterative batched eigh is ~50x
    slower on TPU than this trigonometric form (elementwise VPU math).
    """
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    iso = p2 < 1e-20                       # (near-)isotropic: all evals = q
    ps = jnp.where(iso, 1.0, p)
    # det((A - qI)/p) / 2
    b00, b11, b22 = d0 / ps, d1 / ps, d2 / ps
    b01, b02, b12 = a01 / ps, a02 / ps, a12 / ps
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_max = q + 2.0 * p * jnp.cos(phi)
    e_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_max - e_min
    e_max = jnp.where(iso, q, e_max)
    e_mid = jnp.where(iso, q, e_mid)
    e_min = jnp.where(iso, q, e_min)
    evals = jnp.stack([e_min, e_mid, e_max], -1)

    # Eigenvector of e_max: any nonzero column of (A - e_mid I)(A - e_min I)
    # (Cayley-Hamilton); pick the largest-norm column for stability.
    eye = jnp.eye(3, dtype=A.dtype)
    C = (A - e_mid[..., None, None] * eye) @ (A - e_min[..., None, None] * eye)
    norms = jnp.linalg.norm(C, axis=-2)                       # (...,3) per col
    best = jnp.argmax(norms, -1)
    v = jnp.take_along_axis(
        C, best[..., None, None].repeat(3, -2), axis=-1)[..., 0]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(eye[2], v.shape)
    v = jnp.where(vn > 1e-12, v / jnp.maximum(vn, 1e-12), fallback)
    return evals, v


def degeneracy_projector(H: jnp.ndarray, eig_threshold: float):
    """Null-space projection matrix matP (fA.cpp:1329-1356): eigen-decompose
    H, zero components of the update along eigenvectors with small
    eigenvalues. Returns (P_mat, is_degenerate)."""
    evals, evecs = jnp.linalg.eigh(H)            # ascending
    ok = (evals > eig_threshold).astype(H.dtype)
    # matP = V diag(ok) V^T  (V orthonormal)
    Pm = (evecs * ok[None, :]) @ evecs.T
    return Pm, jnp.any(ok < 0.5)


def converged(delta_w: jnp.ndarray, delta_v: jnp.ndarray,
              rot_deg: float, trans_cm: float):
    """LOAM convergence test (fA.cpp:1367-1376): rotation update below
    ``rot_deg`` degrees and translation update below ``trans_cm`` cm."""
    dr = jnp.rad2deg(jnp.linalg.norm(delta_w))
    dt = jnp.linalg.norm(delta_v) * 100.0
    return (dr < rot_deg) & (dt < trans_cm)
