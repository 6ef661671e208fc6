"""Eager replay of posegraph.solve on the exact failing test fixture."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import jax, jax.numpy as jnp, numpy as np
from sc_lego_loam_tpu.config import tiny_test_config, PoseGraphConfig, LoopClosureConfig
from sc_lego_loam_tpu import posegraph
from sc_lego_loam_tpu.posegraph import _factor_residual
from sc_lego_loam_tpu.utils import se3
from test_posegraph import _chain

cfg = tiny_test_config().replace(
    posegraph=PoseGraphConfig(odom_var=(1e-2,) * 6),
    loop=LoopClosureConfig(loop_noise_var=1e-2))
n = 20
gt, poses6, odom_z, count = _chain(cfg, n, drift=0.02, seed=1)
Z = jnp.asarray(np.linalg.inv(gt[n - 1]) @ gt[0], jnp.float32)
loops = posegraph.init_loops(cfg)
for _ in range(3):
    loops = posegraph.add_loop(loops, jnp.int32(n - 1), jnp.int32(0), Z)
print("loops count", int(loops.count))

pg = cfg.posegraph
K = poses6.shape[0]
L = loops.i.shape[0]
node_ok = np.arange(K) < n
w_prior = 1.0 / np.sqrt(np.asarray(pg.prior_var, np.float32))
w_odom = 1.0 / np.sqrt(np.asarray(pg.odom_var, np.float32))
w_loop = 1.0 / np.sqrt(np.float32(cfg.loop.loop_noise_var))
c2 = np.float32(cfg.loop.cauchy_k) ** 2

fi = jnp.concatenate([jnp.arange(K - 1), loops.i])
fj = jnp.concatenate([jnp.arange(1, K), loops.j])
Zs = jnp.concatenate([odom_z[1:], loops.z])
sqrtw = jnp.concatenate([jnp.broadcast_to(jnp.asarray(w_odom), (K - 1, 6)),
                         jnp.broadcast_to(w_loop, (L, 6))])
odom_ok = jnp.asarray(node_ok)[1:]
loop_ok = jnp.arange(L) < loops.count
f_ok = jnp.concatenate([odom_ok, loop_ok]).astype(jnp.float32)
is_loop = jnp.concatenate([jnp.zeros((K - 1,), bool), jnp.ones((L,), bool)])

zero12 = jnp.zeros((12,))
r_fn = jax.vmap(_factor_residual, in_axes=(None, 0, 0, 0))
J_fn = jax.vmap(jax.jacfwd(_factor_residual), in_axes=(None, 0, 0, 0))

X = se3.pose6_to_mat(poses6)
for it in range(5):
    Xi, Xj = X[fi], X[fj]
    r = r_fn(zero12, Xi, Xj, Zs)
    J = J_fn(zero12, Xi, Xj, Zs)
    rw = r * sqrtw
    e2 = (rw * rw).sum(-1)
    w_c = jnp.where(is_loop, jnp.sqrt(c2 / (c2 + e2)), 1.0) * f_ok
    print(f"it{it}: loop r rows 63..66: {np.asarray(r)[63:66, :3].round(3)}"
          f" wc={np.asarray(w_c)[63:66].round(3)}")
    sw = sqrtw * w_c[:, None]
    rws = r * sw
    Jws = J * sw[:, :, None]
    Ji, Jj = Jws[:, :, :6], Jws[:, :, 6:]
    Hii = jnp.einsum("fri,frj->fij", Ji, Ji)
    Hjj = jnp.einsum("fri,frj->fij", Jj, Jj)
    Hij = jnp.einsum("fri,frj->fij", Ji, Jj)
    gi = jnp.einsum("fri,fr->fi", Ji, rws)
    gj = jnp.einsum("fri,fr->fi", Jj, rws)
    H = jnp.zeros((K, 6, K, 6))
    H = H.at[fi, :, fi, :].add(Hii)
    H = H.at[fj, :, fj, :].add(Hjj)
    H = H.at[fi, :, fj, :].add(Hij)
    H = H.at[fj, :, fi, :].add(jnp.swapaxes(Hij, -1, -2))
    g = jnp.zeros((K, 6))
    g = g.at[fi].add(gi)
    g = g.at[fj].add(gj)
    zero6 = jnp.zeros((6,))
    rp = se3.se3_log(se3.mat_inv(odom_z[0]) @ X[0]) * w_prior
    Jp = jax.jacfwd(lambda d: se3.se3_log(
        se3.mat_inv(odom_z[0]) @ se3.se3_exp(d) @ X[0]) * w_prior)(zero6)
    H = H.at[0, :, 0, :].add(Jp.T @ Jp)
    g = g.at[0].add(Jp.T @ rp)
    freeze = jnp.repeat(~jnp.asarray(node_ok), 6).astype(jnp.float32)
    Hd = H.reshape(K * 6, K * 6) + jnp.diag(freeze * 1e3 + pg.damping)
    upd = -jnp.linalg.solve(Hd, g.reshape(-1)).reshape(K, 6)
    print(f"   |g|={float(jnp.linalg.norm(g)):.4f} "
          f"|upd|={float(jnp.linalg.norm(upd)):.5f} "
          f"finite={bool(jnp.isfinite(upd).all())}")
    upd = jnp.where(jnp.isfinite(upd), upd, 0.0) * jnp.asarray(node_ok)[:, None]
    X = se3.se3_exp(upd) @ X

def loop_res(Xm):
    return float(jnp.linalg.norm(se3.se3_log(
        se3.mat_inv(Z) @ se3.mat_inv(Xm[n - 1]) @ Xm[0])))
print("loop_res final:", loop_res(X))
print("ref loop_res initial:", loop_res(se3.pose6_to_mat(poses6)))

out = posegraph.solve(cfg, poses6, jnp.int32(n), odom_z, loops)
print("solve() loop_res:", loop_res(se3.pose6_to_mat(out)))
