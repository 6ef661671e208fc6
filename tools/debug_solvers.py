"""Instrumented repro of the three failing solver paths."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from sc_lego_loam_tpu.config import tiny_test_config, PoseGraphConfig, LoopClosureConfig
from sc_lego_loam_tpu import frontend, odometry, posegraph
from sc_lego_loam_tpu.ops import features as F
from sc_lego_loam_tpu.utils import se3, synthetic

print("=== 1. odometry feature counts & stage behavior ===")
cfg = tiny_test_config()
scans, valids, poses = synthetic.make_sequence(
    cfg.lidar, 3, trajectory="straight", step=0.3, yaw_rate=0.02,
    noise=0.005, seed=5)

def feats(i):
    fo = frontend.run(cfg, jnp.asarray(scans[i]), jnp.asarray(valids[i]))
    return F.extract(fo.cloud, cfg.feat, cfg.cap)

fs0, fs1 = feats(0), feats(1)
print("frame0: sharp", int(fs0.sharp.mask.sum()), "less_sharp",
      int(fs0.less_sharp.mask.sum()), "flat", int(fs0.flat.mask.sum()),
      "less_flat", int(fs0.less_flat.mask.sum()))
print("frame1: sharp", int(fs1.sharp.mask.sum()), "flat",
      int(fs1.flat.mask.sum()))
print("enough?", int(fs1.sharp.mask.sum()) >= cfg.odom.min_feature_points,
      int(fs1.flat.mask.sum()) >= cfg.odom.min_surf_points)

# Manually run correspondence search at xi=0.
from sc_lego_loam_tpu.odometry import _find_surf, _find_corner, _deskew
flat = fs1.flat._replace(rel_time=jnp.ones_like(fs1.flat.rel_time))
sharp = fs1.sharp._replace(rel_time=jnp.ones_like(fs1.sharp.rel_time))
surf_t, corner_t = fs0.less_flat, fs0.less_sharp
xi = jnp.zeros(6)
j, l2, l3, v = _find_surf(flat.xyz, flat.mask, surf_t, cfg.odom)
print("surf correspondences valid:", int(v.sum()), "/", int(flat.mask.sum()))
jc, lc2, vc = _find_corner(sharp.xyz, sharp.mask, corner_t, cfg.odom)
print("corner correspondences valid:", int(vc.sum()), "/", int(sharp.mask.sum()))

# Residuals at xi=0 vs at xi=true.
from sc_lego_loam_tpu.odometry import _surf_residual
r0 = _surf_residual(xi, flat.xyz, flat.rel_time, surf_t.xyz[j], surf_t.xyz[l2], surf_t.xyz[l3])
print("surf |r| at xi=0: mean", float(jnp.abs(r0 * v).sum() / jnp.maximum(v.sum(), 1)))

st = odometry.init_state(cfg)
st, p0, _ = odometry.step(cfg, st, fs0)
st, p1, xi1 = odometry.step(cfg, st, fs1)
print("estimated xi after frame1:", np.asarray(xi1))
T_gt = np.linalg.inv(poses[0]) @ poses[1]
print("gt rel:", np.asarray(se3.se3_log(jnp.asarray(T_gt))))

print()
print("=== 2. posegraph g/H magnitudes ===")
cfgpg = tiny_test_config().replace(
    posegraph=PoseGraphConfig(odom_var=(1e-4,) * 6),
    loop=LoopClosureConfig(loop_noise_var=1e-4))
K = cfgpg.cap.max_keyframes
n = 20
rng = np.random.default_rng(1)
gt = [np.eye(4, dtype=np.float32)]
side = n // 4
for i in range(1, n):
    step = np.eye(4, dtype=np.float32); step[0, 3] = 1.0
    if i % side == 0:
        step[:2, :2] = [[0, -1], [1, 0]]
    gt.append((gt[-1] @ step).astype(np.float32))
gt = np.stack(gt)
odom_z = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
odom_z[0] = gt[0]
est = [gt[0]]
for i in range(1, n):
    Z = np.linalg.inv(gt[i - 1]) @ gt[i]
    noise = np.asarray(se3.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32)))
    Z = (Z @ noise).astype(np.float32)
    odom_z[i] = Z
    est.append((est[-1] @ Z).astype(np.float32))
poses6 = np.zeros((K, 6), np.float32)
poses6[:n] = np.asarray(se3.mat_to_pose6(jnp.asarray(np.stack(est))))
Zl = jnp.asarray(np.linalg.inv(gt[n - 1]) @ gt[0], jnp.float32)
loops = posegraph.init_loops(cfgpg)
loops = posegraph.add_loop(loops, jnp.int32(n - 1), jnp.int32(0), Zl)
print("loops.count =", int(loops.count), "i,j =", int(loops.i[0]), int(loops.j[0]))

out = posegraph.solve(cfgpg, jnp.asarray(poses6), jnp.int32(n),
                      jnp.asarray(odom_z), loops)
delta = np.abs(np.asarray(out)[:n] - poses6[:n])
print("pose change after solve: max", delta.max(), "mean", delta.mean())

def loop_res(X):
    return np.linalg.norm(se3.se3_log(jnp.asarray(
        np.linalg.inv(np.asarray(Zl)) @ np.linalg.inv(X[n - 1]) @ X[0], jnp.float32)))
before = np.asarray(se3.pose6_to_mat(jnp.asarray(poses6[:n])))
after = np.asarray(se3.pose6_to_mat(out[:n]))
print("loop_res before", loop_res(before), "after", loop_res(after))
