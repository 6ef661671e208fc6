"""Distributed pose-graph Gauss-Newton (BASELINE.json north star: the
pose-graph solve distributed over ICI collectives).

Factor-parallel decomposition: the between-factor set (odometry chain +
loop factors) is sharded over the 'kf' mesh axis.  Each device linearizes
its factor shard (vmapped 6x12 Jacobians), assembles its partial block
normal equations H_p, g_p, and one psum over ICI reduces them; the (small)
dense solve runs replicated on every device.  This is the reduce form of a
Schur-complement elimination — exact, one collective per GN iteration, and
the per-device work scales as O(F/d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PipelineConfig
from ..posegraph import _factor_residual
from ..utils import se3


@functools.partial(jax.jit, static_argnums=(0, 1))
def solve_dist(config: PipelineConfig, mesh: Mesh, poses6, count,
               fi, fj, Z, sqrtw, f_ok, is_loop):
    """Distributed robust GN.

    fi/fj/Z/sqrtw/f_ok/is_loop: flat factor table, length F divisible by the
    'kf' mesh size, sharded on the leading axis.  poses6 replicated.
    Returns optimized poses6.
    """
    pg = config.posegraph
    K = poses6.shape[0]
    node_ok = (jnp.arange(K) < count)
    c2 = jnp.float32(config.loop.cauchy_k) ** 2

    zero12 = jnp.zeros((12,), jnp.float32)
    r_fn = jax.vmap(_factor_residual, in_axes=(None, 0, 0, 0))
    J_fn = jax.vmap(jax.jacfwd(_factor_residual), in_axes=(None, 0, 0, 0))

    def shard_Hg(X, fi_s, fj_s, Z_s, sqrtw_s, ok_s, isloop_s):
        """Partial normal equations from this device's factor shard."""
        Xi, Xj = X[fi_s], X[fj_s]
        r = r_fn(zero12, Xi, Xj, Z_s)
        J = J_fn(zero12, Xi, Xj, Z_s)
        rw = r * sqrtw_s
        e2 = (rw * rw).sum(-1)
        w_c = jnp.where(isloop_s, jnp.sqrt(c2 / (c2 + e2)), 1.0) * ok_s
        sw = sqrtw_s * w_c[:, None]
        rws = r * sw
        Jws = J * sw[:, :, None]
        Ji, Jj = Jws[:, :, :6], Jws[:, :, 6:]
        H = jnp.zeros((K, 6, K, 6), jnp.float32)
        H = H.at[fi_s, :, fi_s, :].add(jnp.einsum("fri,frj->fij", Ji, Ji))
        H = H.at[fj_s, :, fj_s, :].add(jnp.einsum("fri,frj->fij", Jj, Jj))
        Hij = jnp.einsum("fri,frj->fij", Ji, Jj)
        H = H.at[fi_s, :, fj_s, :].add(Hij)
        H = H.at[fj_s, :, fi_s, :].add(jnp.swapaxes(Hij, -1, -2))
        g = jnp.zeros((K, 6), jnp.float32)
        g = g.at[fi_s].add(jnp.einsum("fri,fr->fi", Ji, rws))
        g = g.at[fj_s].add(jnp.einsum("fri,fr->fi", Jj, rws))
        return H, g

    w_prior = 1.0 / jnp.sqrt(jnp.asarray(pg.prior_var, jnp.float32))
    prior_pose = se3.pose6_to_mat(poses6[0])   # anchor at initial node-0 pose

    def gn_iter(it, X):
        def shard_fn(fi_s, fj_s, Z_s, sqrtw_s, ok_s, isloop_s):
            H_p, g_p = shard_Hg(X, fi_s, fj_s, Z_s, sqrtw_s, ok_s, isloop_s)
            H = jax.lax.psum(H_p, "kf")           # ICI reduce
            g = jax.lax.psum(g_p, "kf")
            return H, g

        H, g = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("kf"), P("kf"), P("kf"), P("kf"), P("kf"), P("kf")),
            out_specs=(P(), P()),
        )(fi, fj, Z, sqrtw, f_ok, is_loop)

        # Prior on node 0 (replicated).
        zero6 = jnp.zeros((6,), jnp.float32)
        rp = se3.se3_log(se3.mat_inv(prior_pose) @ X[0]) * w_prior
        Jp = jax.jacfwd(lambda d: se3.se3_log(
            se3.mat_inv(prior_pose) @ se3.se3_exp(d) @ X[0]) * w_prior)(zero6)
        H = H.at[0, :, 0, :].add(Jp.T @ Jp)
        g = g.at[0].add(Jp.T @ rp)

        freeze = jnp.repeat(~node_ok, 6).astype(jnp.float32)
        Hd = H.reshape(K * 6, K * 6) + jnp.diag(freeze * 1e3 + pg.damping)
        upd = -jnp.linalg.solve(Hd, g.reshape(-1)).reshape(K, 6)
        upd = jnp.where(jnp.isfinite(upd), upd, 0.0) * node_ok[:, None]
        return se3.se3_exp(upd) @ X

    X0 = se3.pose6_to_mat(poses6)
    X_opt = jax.lax.fori_loop(0, pg.max_gn_iterations, gn_iter, X0)
    out = se3.mat_to_pose6(X_opt)
    return jnp.where(node_ok[:, None], out, poses6)


def build_factor_table(config: PipelineConfig, kf_count_pad: int, odom_z,
                       loops, pad_to_multiple: int):
    """Flatten odometry chain + loop factors into the sharded table
    expected by solve_dist. Returns (fi, fj, Z, sqrtw, f_ok, is_loop)."""
    pg = config.posegraph
    K = odom_z.shape[0]
    L = loops.i.shape[0]
    w_odom = 1.0 / jnp.sqrt(jnp.asarray(pg.odom_var, jnp.float32))
    w_loop = 1.0 / jnp.sqrt(jnp.float32(config.loop.loop_noise_var))
    fi = jnp.concatenate([jnp.arange(K - 1), loops.i])
    fj = jnp.concatenate([jnp.arange(1, K), loops.j])
    Z = jnp.concatenate([odom_z[1:], loops.z])
    sqrtw = jnp.concatenate([
        jnp.broadcast_to(w_odom, (K - 1, 6)),
        jnp.broadcast_to(w_loop, (L, 6))])
    f_ok = jnp.concatenate([
        (jnp.arange(1, K) < kf_count_pad),
        jnp.arange(L) < loops.count]).astype(jnp.float32)
    is_loop = jnp.concatenate(
        [jnp.zeros((K - 1,), bool), jnp.ones((L,), bool)])
    F = fi.shape[0]
    pad = (-F) % pad_to_multiple
    if pad:
        fi = jnp.concatenate([fi, jnp.zeros((pad,), fi.dtype)])
        fj = jnp.concatenate([fj, jnp.zeros((pad,), fj.dtype)])
        Z = jnp.concatenate(
            [Z, jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                 (pad, 4, 4))])
        sqrtw = jnp.concatenate([sqrtw, jnp.zeros((pad, 6), jnp.float32)])
        f_ok = jnp.concatenate([f_ok, jnp.zeros((pad,), jnp.float32)])
        is_loop = jnp.concatenate([is_loop, jnp.zeros((pad,), bool)])
    return fi, fj, Z, sqrtw, f_ok, is_loop
