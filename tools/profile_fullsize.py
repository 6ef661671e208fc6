#!/usr/bin/env python
"""Time each engine stage at full OS1-64 scale on the current backend.

Isolates where the figure-8 bench time goes: perception (frontend +
features + odometry LM), mapping tick (downsample / scan-to-map / submap
rebuild / keyframe insert), loop tick (SC retrieval / history submap / ICP
/ pose-graph solve at K=4096)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu import frontend, loop, mapping, odometry, pipeline, posegraph
from sc_lego_loam_tpu.models import scan_context
from sc_lego_loam_tpu.ops import features as features_op, icp
from sc_lego_loam_tpu.utils import synthetic, se3


def bench(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:34s} {dt:9.2f} ms")
    return out


def main():
    cfg = synthetic_config()
    print("backend:", jax.default_backend())
    n_sc = 24
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, n_sc, trajectory="figure8", radius=30.0, loops=0.15,
        noise=0.01, seed=11, shuffle=False)

    # Warm an engine to populate realistic state.
    eng = pipeline.SlamEngine(cfg)
    for i in range(n_sc):
        eng.process_scan(scans[i], valids[i], t=i * 0.1)
    jax.block_until_ready(eng.state.traj)
    st = eng.state
    print("keyframes in state:", int(st.map.kf.count))

    pts = jnp.asarray(scans[-1]); msk = jnp.asarray(valids[-1])

    bench("frontend.run", lambda: frontend.run(cfg, pts, msk))
    fo = frontend.run(cfg, pts, msk)
    bench("features.extract",
          lambda: pipeline._extract(cfg, fo.cloud, fo.outlier))
    fs, out_pts, out_mask = pipeline._extract(cfg, fo.cloud, fo.outlier)
    bench("odometry.step (turning)",
          lambda: odometry.step(cfg, st.odo, fs))
    bench("perception_step (fused)",
          lambda: pipeline._perception_step(cfg, pts, msk, st.odo,
                                            st.imu, jnp.float32(2.0)))

    c, cm, s, sm, o, om = mapping.downsample_scan(
        cfg, st.odo.corner_last.xyz, st.odo.corner_last.mask,
        st.odo.surf_last.xyz, st.odo.surf_last.mask, out_pts, out_mask)
    bench("mapping.downsample_scan",
          lambda: mapping.downsample_scan(
              cfg, st.odo.corner_last.xyz, st.odo.corner_last.mask,
              st.odo.surf_last.xyz, st.odo.surf_last.mask,
              out_pts, out_mask))
    surf_q = jnp.concatenate([s, o]); surf_qm = jnp.concatenate([sm, om])
    bench("mapping.scan_to_map",
          lambda: mapping.scan_to_map(cfg, st.map.pose, c, cm, surf_q,
                                      surf_qm, st.sub_c, st.sub_cm,
                                      st.sub_s, st.sub_sm))
    bench("mapping.build_submap",
          lambda: pipeline._build_submap(cfg, st.map.kf))
    bench("insert_keyframe",
          lambda: mapping.insert_keyframe(
              cfg, jax.tree.map(jnp.copy, st.map.kf), st.map.pose,
              jnp.float32(2.0), c, cm, s, sm, o, om), n=5)
    bench("sc.make_descriptor",
          lambda: scan_context.make_descriptor(pts, msk, cfg.sc))
    bench("sc.detect (4096 bank)",
          lambda: scan_context.detect(cfg, st.bank, st.bank.desc[0]))
    cur = jnp.int32(max(int(st.map.kf.count) - 1, 0))
    bench("loop.detect_radius",
          lambda: loop.detect_radius(cfg, st.map.kf, cur))
    bench("loop.history_submap",
          lambda: loop.history_submap(cfg, st.map.kf, jnp.int32(0)))
    place = se3.pose6_to_mat(st.map.kf.poses6[0])
    bench("loop.verify (ICP)",
          lambda: loop.verify(cfg, st.map.kf, cur, jnp.int32(0), place),
          n=5)
    bench("posegraph.solve K=4096",
          lambda: posegraph.solve(cfg, st.map.kf.poses6, st.map.kf.count,
                                  st.map.kf.odom_z, st.loops), n=5)
    bench("engine_step (no mapping)",
          lambda: pipeline.engine_step(
              cfg, jax.tree.map(jnp.copy, st), pts, msk, jnp.float32(2.0),
              jnp.bool_(False)), n=10)
    bench("engine_step (mapping)",
          lambda: pipeline.engine_step(
              cfg, jax.tree.map(jnp.copy, st), pts, msk, jnp.float32(2.0),
              jnp.bool_(True)), n=10)


if __name__ == "__main__":
    main()
