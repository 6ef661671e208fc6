"""Microbenchmark the exact hot kernels at production shapes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu.ops import pallas_knn, knn, voxel
from sc_lego_loam_tpu.models import scan_context

cfg = synthetic_config()
print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)


def bench(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:<42} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)


# --- pallas knn at the two production shapes -------------------------------
for (Q, T) in [(2048, 16384), (12288, 65536)]:
    q = jax.random.uniform(key, (Q, 3), minval=-50, maxval=50)
    t = jax.random.uniform(key, (T, 3), minval=-50, maxval=50)
    tm = jnp.ones((T,), bool)
    tpad, tt = pallas_knn.prepare_targets(t, tm)
    jax.block_until_ready((tpad, tt))
    bench(f"pallas knn {Q}x{T} (prepared)",
          lambda q=q, tpad=tpad, tt=tt: pallas_knn.knn_pallas_prepared(
              q, tpad, tt, k=5, max_sq_dist=4.0))
    bench(f"prepare_targets {T}",
          lambda t=t, tm=tm: pallas_knn.prepare_targets(t, tm))
    bench(f"xla knn {Q}x{T}",
          lambda q=q, t=t, tm=tm: knn.knn(q, t, tm, 5))

# --- voxel decimate at submap shape ----------------------------------------
big = jax.random.uniform(key, (50 * 12288, 3), minval=-80, maxval=80)
bigm = jnp.ones((big.shape[0],), bool)
bench("voxel_decimate 614k->64k",
      lambda: voxel.voxel_decimate(big, bigm, 0.3, 65536))
med = jax.random.uniform(key, (50 * 2048, 3), minval=-80, maxval=80)
medm = jnp.ones((med.shape[0],), bool)
bench("voxel_decimate 102k->16k",
      lambda: voxel.voxel_decimate(med, medm, 0.2, 16384))

# --- keyframe insert / bank update -----------------------------------------
from sc_lego_loam_tpu import mapping
st = mapping.init_state(cfg)
kf0 = st.kf
pose = jnp.eye(4)
c = jnp.zeros((cfg.cap.kf_corner_pad, 3)); cm = jnp.ones((cfg.cap.kf_corner_pad,), bool)
s = jnp.zeros((cfg.cap.kf_surf_pad, 3)); sm = jnp.ones((cfg.cap.kf_surf_pad,), bool)
o = jnp.zeros((cfg.cap.kf_outlier_pad, 3)); om = jnp.ones((cfg.cap.kf_outlier_pad,), bool)

kf = kf0
jax.block_until_ready(kf)
t0 = time.perf_counter()
for i in range(20):
    kf = mapping.insert_keyframe(cfg, kf, pose, jnp.float32(i), c, cm, s, sm, o, om)
jax.block_until_ready(kf)
print(f"{'insert_keyframe (donated chain)':<42} {(time.perf_counter()-t0)/20*1e3:8.2f} ms", flush=True)

# --- scan context -----------------------------------------------------------
pts = jax.random.uniform(key, (cfg.lidar.max_points, 3), minval=-80, maxval=80)
msk = jnp.ones((pts.shape[0],), bool)
bench("sc descriptor (65k pts)",
      lambda: scan_context.make_descriptor(pts, msk, cfg.sc))
bank = scan_context.init_bank(cfg)
desc = scan_context.make_descriptor(pts, msk, cfg.sc)
bank = scan_context.append(bank, desc, cfg.cap.max_keyframes)
bench("sc detect (512 bank)",
      lambda: scan_context.detect(cfg, bank, desc))

# --- posegraph solve ---------------------------------------------------------
from sc_lego_loam_tpu import posegraph
loops = posegraph.init_loops(cfg)
bench("posegraph solve (512 cap)",
      lambda: posegraph.solve(cfg, kf.poses6, kf.count, kf.odom_z, loops))
