"""Micro-profile of pipeline sub-ops on the current backend."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu import frontend, odometry, mapping, pipeline
from sc_lego_loam_tpu.ops import projection, ground, segmentation, compaction, voxel, knn
from sc_lego_loam_tpu.ops import features as F
from sc_lego_loam_tpu.utils import synthetic
import functools

cfg = synthetic_config()
print("backend:", jax.default_backend())

scans, valids, poses = synthetic.make_sequence(cfg.lidar, 2, step=0.5, seed=3)
pts = jax.device_put(jnp.asarray(scans[0]))
msk = jax.device_put(jnp.asarray(valids[0]))

def bench(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<28} {dt*1e3:8.2f} ms")
    return out

# Tunnel round-trip latency.
tiny = jnp.zeros((8, 128))
f_noop = jax.jit(lambda x: x + 1)
bench("noop jit roundtrip", f_noop, tiny, n=20)

# H2D transfer.
host_scan = np.asarray(scans[1])
def h2d(x):
    return jax.device_put(x)
bench("device_put 64k scan", h2d, host_scan, n=10)

lid, seg = cfg.lidar, cfg.seg
f_proj = jax.jit(lambda p, m: projection.project(p, m, lid))
img = bench("projection", f_proj, pts, msk)
f_gnd = jax.jit(lambda im: ground.ground_mask(im, lid, seg))
g = bench("ground", f_gnd, img)
f_seg = jax.jit(lambda im, gg: segmentation.segment(im, gg, lid, seg))
s = bench("segmentation", f_seg, img, g)
f_cmp = jax.jit(lambda im, ss, gg: compaction.compact(im, ss, gg, lid, seg))
cloud, outl = bench("compaction", f_cmp, img, s, g)
f_ext = jax.jit(lambda c: F.extract(c, cfg.feat, cfg.cap))
fs = bench("feature extract", f_ext, cloud)
f_full = jax.jit(lambda p, m: frontend.run(cfg, p, m))
bench("frontend.run fused", f_full, pts, msk)

st = odometry.init_state(cfg)
st, _, _ = odometry.step(cfg, st, fs)
bench("odometry.step", lambda s_: odometry.step(cfg, s_, fs)[1], st, n=5)

# Voxel downsample scaling.
big = jnp.asarray(np.random.default_rng(0).normal(0, 30, (716800, 3)), jnp.float32)
bigm = jnp.ones((716800,), bool)
bench("voxel DS 717k->64k", lambda: voxel.voxel_downsample(big, bigm, 0.3, 65536)[0], n=3)

# knn block.
q = jnp.asarray(np.random.default_rng(1).normal(0, 30, (12288, 3)), jnp.float32)
t_ = jnp.asarray(np.random.default_rng(2).normal(0, 30, (65536, 3)), jnp.float32)
tm = jnp.ones((65536,), bool)
f_knn = jax.jit(lambda a, b, c: knn.knn(a, b, c, 5))
bench("knn 12k x 65k (k=5)", f_knn, q, t_, tm, n=3)

# scan_to_map full.
kfst = mapping.init_state(cfg)
c, cm, s2, sm2, o, om = mapping.downsample_scan(
    cfg, st.corner_last.xyz, st.corner_last.mask,
    st.surf_last.xyz, st.surf_last.mask,
    jnp.zeros((cfg.cap.outlier_pad, 3)), jnp.zeros((cfg.cap.outlier_pad,), bool))
kf = mapping.insert_keyframe(cfg, kfst.kf, jnp.eye(4), jnp.float32(0.0),
                             c, cm, s2, sm2, o, om)
bench("build_submap (1 kf)", lambda: mapping.build_submap(cfg, kf), n=3)
sub_c, sub_cm, sub_s, sub_sm = mapping.build_submap(cfg, kf)
surf_q = jnp.concatenate([s2, o])
surf_qm = jnp.concatenate([sm2, om])
bench("scan_to_map", lambda: mapping.scan_to_map(
    cfg, jnp.eye(4), c, cm, surf_q, surf_qm, sub_c, sub_cm, sub_s, sub_sm), n=3)
