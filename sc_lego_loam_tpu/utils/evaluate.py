"""Trajectory evaluation: ATE/RPE with Umeyama alignment.

No reference equivalent — SC-LeGO-LOAM ships only qualitative overlays
(README.md:22-29); this is the quantitative replacement used by the test
suite and benchmarks (SURVEY.md par.4/par.6)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import se3


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE over positions.

    est, gt: (N,4,4) pose arrays.  With align=True a rigid Umeyama
    alignment is applied first (standard ATE protocol)."""
    p_est = est[:, :3, 3]
    p_gt = gt[:, :3, 3]
    if align:
        R, t, _ = se3.umeyama_alignment(
            jnp.asarray(p_est, jnp.float32), jnp.asarray(p_gt, jnp.float32))
        p_est = p_est @ np.asarray(R).T + np.asarray(t)
    err = np.linalg.norm(p_est - p_gt, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def rpe(est: np.ndarray, gt: np.ndarray, delta: int = 1):
    """Relative pose error over ``delta``-frame intervals.
    Returns (trans_rmse, rot_rmse_rad)."""
    terr, rerr = [], []
    for i in range(len(est) - delta):
        T_e = np.linalg.inv(est[i]) @ est[i + delta]
        T_g = np.linalg.inv(gt[i]) @ gt[i + delta]
        E = np.linalg.inv(T_g) @ T_e
        terr.append(np.linalg.norm(E[:3, 3]))
        c = np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)
        rerr.append(np.arccos(c))
    return float(np.sqrt(np.mean(np.square(terr)))), \
        float(np.sqrt(np.mean(np.square(rerr))))


def trajectory_length(gt: np.ndarray) -> float:
    p = gt[:, :3, 3]
    return float(np.linalg.norm(np.diff(p, axis=0), axis=1).sum())
