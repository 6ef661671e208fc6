"""Pose-graph optimization on SE(3) (reference C14: the GTSAM/iSAM2 layer,
mapOptmization.cpp:241-244, 1525-1664).

From-scratch robust Gauss-Newton replacing gtsam::ISAM2:
- nodes: keyframe poses (fixed-capacity bank, masked by count);
- factors: one prior on node 0 (mO.cpp:1544-1551), between factors linking
  consecutive keyframes (mO.cpp:1552-1560), and Cauchy-robust loop factors
  (mO.cpp:990-997 robustNoiseModel with Cauchy(1), variance 0.5);
- residual of a between factor (i,j,Z): log(Z^-1 Xi^-1 Xj); per-factor
  6x12 Jacobians via vmapped jax.jacfwd through the se(3) exponential,
  scatter-assembled into dense block normal equations (the exact sparsity
  pattern a distributed Schur-complement solve partitions over hosts);
- IRLS: Cauchy weights recomputed from the current residual each iteration;
- batch re-solve on loop closure (the reference's incremental iSAM2 update
  reduces to this: without loops the odometry chain is already the exact
  solution, and ``correctPoses`` only fires after a loop, mO.cpp:1642-1664).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import PipelineConfig
from .utils import se3


class LoopFactors(NamedTuple):
    """Fixed-capacity loop-factor store."""

    i: jnp.ndarray        # (L,) int32 — newer keyframe index
    j: jnp.ndarray        # (L,) int32 — older keyframe index
    z: jnp.ndarray        # (L,4,4) measured Xi^-1 Xj
    count: jnp.ndarray    # () int32


def init_loops(config: PipelineConfig, max_loops: int = 128) -> LoopFactors:
    del config
    return LoopFactors(
        i=jnp.zeros((max_loops,), jnp.int32),
        j=jnp.zeros((max_loops,), jnp.int32),
        z=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                           (max_loops, 4, 4)).copy(),
        count=jnp.int32(0),
    )


@jax.jit
def add_loop(loops: LoopFactors, i, j, z) -> LoopFactors:
    k = jnp.minimum(loops.count, loops.i.shape[0] - 1)
    return LoopFactors(
        i=loops.i.at[k].set(i), j=loops.j.at[k].set(j),
        z=loops.z.at[k].set(z),
        count=jnp.minimum(loops.count + 1, loops.i.shape[0]),
    )


def _factor_residual(dij, Xi, Xj, Z):
    """Residual of one between factor with local updates dij = [di, dj]."""
    Xi2 = se3.se3_exp(dij[:6]) @ Xi
    Xj2 = se3.se3_exp(dij[6:]) @ Xj
    return se3.se3_log(se3.mat_inv(Z) @ se3.mat_inv(Xi2) @ Xj2)


@functools.partial(jax.jit, static_argnums=0)
def solve(config: PipelineConfig, poses6: jnp.ndarray, count: jnp.ndarray,
          odom_z: jnp.ndarray, loops: LoopFactors):
    """Robust GN re-solve of the full graph.

    poses6: (K,6) current keyframe pose estimates (initialization);
    odom_z: (K,4,4) — odom_z[k] = measured X_{k-1}^-1 X_k for k >= 1;
    odom_z[0] holds the prior pose of node 0.
    Returns optimized poses6 (K,6).
    """
    pg = config.posegraph
    K = poses6.shape[0]
    L = loops.i.shape[0]
    node_ok = (jnp.arange(K) < count)

    w_prior = 1.0 / jnp.sqrt(jnp.asarray(pg.prior_var, jnp.float32))
    w_odom = 1.0 / jnp.sqrt(jnp.asarray(pg.odom_var, jnp.float32))
    w_loop = 1.0 / jnp.sqrt(jnp.float32(config.loop.loop_noise_var))
    c2 = jnp.float32(config.loop.cauchy_k) ** 2

    # Factor table: K-1 odometry betweens then L loop betweens.
    fi = jnp.concatenate([jnp.arange(K - 1), loops.i])
    fj = jnp.concatenate([jnp.arange(1, K), loops.j])
    Z = jnp.concatenate([odom_z[1:], loops.z])
    sqrtw = jnp.concatenate([
        jnp.broadcast_to(w_odom, (K - 1, 6)),
        jnp.broadcast_to(w_loop, (L, 6)),
    ])
    odom_ok = node_ok[1:]                      # factor k-1 valid iff node k is
    loop_ok = jnp.arange(L) < loops.count
    f_ok = jnp.concatenate([odom_ok, loop_ok]).astype(jnp.float32)
    is_loop = jnp.concatenate(
        [jnp.zeros((K - 1,), bool), jnp.ones((L,), bool)])

    zero12 = jnp.zeros((12,), jnp.float32)
    zero6 = jnp.zeros((6,), jnp.float32)
    r_fn = jax.vmap(_factor_residual, in_axes=(None, 0, 0, 0))
    J_fn = jax.vmap(jax.jacfwd(_factor_residual), in_axes=(None, 0, 0, 0))

    def gn_iter(it, carry):
        X, _ = carry
        Xi, Xj = X[fi], X[fj]
        r = r_fn(zero12, Xi, Xj, Z)                      # (F,6)
        J = J_fn(zero12, Xi, Xj, Z)                      # (F,6,12)
        rw = r * sqrtw
        e2 = (rw * rw).sum(-1)
        w_c = jnp.where(is_loop, jnp.sqrt(c2 / (c2 + e2)), 1.0) * f_ok
        sw = sqrtw * w_c[:, None]                        # (F,6) row scaling
        rws = r * sw
        Jws = J * sw[:, :, None]
        Ji, Jj = Jws[:, :, :6], Jws[:, :, 6:]

        Hii = jnp.einsum("fri,frj->fij", Ji, Ji)
        Hjj = jnp.einsum("fri,frj->fij", Jj, Jj)
        Hij = jnp.einsum("fri,frj->fij", Ji, Jj)
        gi = jnp.einsum("fri,fr->fi", Ji, rws)
        gj = jnp.einsum("fri,fr->fi", Jj, rws)

        H = jnp.zeros((K, 6, K, 6), jnp.float32)
        H = H.at[fi, :, fi, :].add(Hii)
        H = H.at[fj, :, fj, :].add(Hjj)
        H = H.at[fi, :, fj, :].add(Hij)
        H = H.at[fj, :, fi, :].add(jnp.swapaxes(Hij, -1, -2))
        g = jnp.zeros((K, 6), jnp.float32)
        g = g.at[fi].add(gi)
        g = g.at[fj].add(gj)

        # Prior on node 0 (anchors the gauge).
        rp = se3.se3_log(se3.mat_inv(odom_z[0]) @ X[0]) * w_prior
        Jp = jax.jacfwd(
            lambda d: se3.se3_log(
                se3.mat_inv(odom_z[0]) @ se3.se3_exp(d) @ X[0]) * w_prior
        )(zero6)
        H = H.at[0, :, 0, :].add(Jp.T @ Jp)
        g = g.at[0].add(Jp.T @ rp)

        freeze = jnp.repeat(~node_ok, 6).astype(jnp.float32)
        Hd = H.reshape(K * 6, K * 6) + jnp.diag(
            freeze * 1e3 + pg.damping)
        upd = -jnp.linalg.solve(Hd, g.reshape(-1)).reshape(K, 6)
        upd = jnp.where(jnp.isfinite(upd), upd, 0.0)
        upd = upd * node_ok[:, None]
        X = se3.se3_exp(upd) @ X
        return X, jnp.linalg.norm(upd)

    X0 = se3.pose6_to_mat(poses6)
    X_opt, _ = jax.lax.fori_loop(0, pg.max_gn_iterations, gn_iter,
                                 (X0, jnp.float32(1.0)))
    out = se3.mat_to_pose6(X_opt)
    return jnp.where(node_ok[:, None], out, poses6)
