"""Decompose the mapping-tick cost on TPU with realistic state."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu.pipeline import SlamEngine, _sc_input, _build_submap
from sc_lego_loam_tpu import mapping, odometry
from sc_lego_loam_tpu.ops import pallas_knn, knn
from sc_lego_loam_tpu.utils import synthetic, se3

cfg = synthetic_config()
print("backend:", jax.default_backend(), flush=True)

# Build realistic engine state by running a few scans.
scans, valids, gt = synthetic.make_sequence(cfg.lidar, 14, step=0.5,
                                            seed=11, shuffle=False)
eng = SlamEngine(cfg)
for i in range(14):
    eng.process_scan(scans[i], valids[i], t=i * 0.1)
print("kf:", int(eng.map.kf.count), flush=True)


def bench(name, fn, n=6):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    print(f"{name:<30} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)


pts = jnp.asarray(scans[13])
msk = jnp.asarray(valids[13])
odo = eng.odo
st = eng.map
out_pts = jnp.zeros((cfg.cap.outlier_pad, 3))
out_mask = jnp.zeros((cfg.cap.outlier_pad,), bool)

c, cm, s, sm, o, om = mapping.downsample_scan(
    cfg, odo.corner_last.xyz, odo.corner_last.mask,
    odo.surf_last.xyz, odo.surf_last.mask, out_pts, out_mask)
sub = _build_submap(cfg, st.kf)
surf_q = jnp.concatenate([s, o])
surf_qm = jnp.concatenate([sm, om])
T_guess = st.pose

bench("downsample_scan", lambda: mapping.downsample_scan(
    cfg, odo.corner_last.xyz, odo.corner_last.mask,
    odo.surf_last.xyz, odo.surf_last.mask, out_pts, out_mask))
bench("build_submap", lambda: _build_submap(cfg, st.kf))
bench("scan_to_map", lambda: mapping.scan_to_map(
    cfg, T_guess, c, cm, surf_q, surf_qm, *sub))
bench("sc_input+descriptor", lambda: _sc_input(cfg, pts, msk))
bench("insert_keyframe", lambda: mapping.insert_keyframe(
    cfg, st.kf, st.pose, jnp.float32(1.0), c, cm, s, sm, o, om))
bench("pallas knn 12k x 64k", lambda: pallas_knn.knn_pallas(
    surf_q, sub[2], sub[3], k=5, max_sq_dist=4.0))
bench("xla knn 12k x 64k", lambda: knn.knn(surf_q, sub[2], sub[3], 5))
print("submap occupancy:", int(sub[1].sum()), int(sub[3].sum()), flush=True)
