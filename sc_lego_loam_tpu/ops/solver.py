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


def robust_weight(abs_res: jnp.ndarray, slope: float, min_weight: float,
                  enabled) -> jnp.ndarray:
    """LOAM's linear robust weight s = 1 - slope*|d| (fA.cpp:1137-1140,
    mO.cpp:1332); points with s <= min_weight are dropped. ``enabled``
    gates it (the reference applies it only after iteration 5 in odometry)."""
    s = 1.0 - slope * abs_res
    w = jnp.where(s > min_weight, s, 0.0)
    return jnp.where(enabled, w, 1.0)


def gauss_newton_step(J: jnp.ndarray, r: jnp.ndarray, w: jnp.ndarray,
                      damping: float = 1e-6):
    """One damped GN step. J: (N,P), r: (N,), w: (N,) weights (0 = dropped).
    Returns (delta (P,), H (P,P), g (P,))  minimizing sum w (J d + r)^2."""
    Jw = J * w[:, None]
    H = Jw.T @ J
    g = Jw.T @ r
    P = J.shape[1]
    delta = jnp.linalg.solve(H + damping * jnp.eye(P, dtype=J.dtype), -g)
    return delta, H, g


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
