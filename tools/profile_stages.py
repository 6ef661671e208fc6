#!/usr/bin/env python
"""Per-sub-stage DEVICE times of perception_step and mapping_step on the
bench config with realistic engine state — the numbers PERF.md's budget
table is built from (VERDICT r4 next #2).

Each sub-stage is timed as its own jitted call (serialized, block_until_
ready) on state captured from a short real run, so occupancies match the
bench.  Device-only: timings exclude the bench loop's host dispatch.
"""
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

import bench
from sc_lego_loam_tpu import frontend, mapping, odometry, pipeline
from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu.models import scan_context
from sc_lego_loam_tpu.runner import mulran_engine_config
from sc_lego_loam_tpu.utils import se3


def timeit(name, f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time() - t0) / n * 1e3:8.3f} ms", flush=True)
    return out


def main():
    real = os.environ.get("PROF_REAL", "0") == "1"
    cfg = mulran_engine_config() if real else synthetic_config()
    kw = dict(trajectory="figure8", noise=0.01, seed=11, shuffle=False,
              radius=30.0, loops=1.05)
    if real:
        kw["skew"] = True
    scans, valids, _ = bench.get_sequence(cfg.lidar, bench.N_SCANS, **kw)
    print("config:", "real(skew+deskew)" if real else "ordered")

    # Populate realistic state: run the engine for 60 scans.
    eng = pipeline.SlamEngine(cfg)
    for i in range(60):
        eng.process_scan(scans[i], valids[i], t=i * 0.1)
    jax.block_until_ready(eng.p.traj)
    pts = jnp.asarray(scans[60], jnp.float32)
    msk = jnp.asarray(valids[60], bool)
    odo = eng.p.odo
    m = eng.m

    # ---- perception sub-stages ---------------------------------------- #
    fr = jax.jit(lambda p, v: frontend.run(cfg, p, v))
    fo = timeit("frontend.run", fr, pts, msk)

    pd = jax.jit(lambda f, o: pipeline._pre_deskew(cfg, f, o))
    fo2 = timeit("pre_deskew", pd, fo, odo) if cfg.odom.deskew else fo

    ex = jax.jit(lambda c, o: pipeline._extract(cfg, c, o))
    fs, out_pts, out_rel, out_mask = timeit(
        "extract (features + outlier compact)", ex, fo2.cloud, fo2.outlier)

    od = jax.jit(lambda s, f: odometry.step(cfg, s, f))
    timeit("odometry.step", od, odo, fs)

    full = jax.jit(lambda st, c, p, v, t: pipeline.perception_step.__wrapped__(
        cfg, st, c, p, v, t))
    eye = jnp.eye(4, dtype=jnp.float32)
    st = jax.tree.map(jnp.copy, eng.p)
    timeit("perception_step (fused whole)", full, st, eye, pts, msk,
           jnp.float32(6.0))

    # ---- mapping sub-stages ------------------------------------------- #
    bs = jax.jit(lambda kf: mapping.build_submap(cfg, kf))
    sub_c, sub_cm, sub_s, sub_sm = timeit("build_submap (incl. decimate)",
                                          bs, m.kf)

    ds = jax.jit(lambda c, cm, s, sm, o, om: mapping.downsample_scan(
        cfg, c, cm, s, sm, o, om))
    c, cm, s, sm, o, om = timeit(
        "downsample_scan", ds, odo.corner_last.xyz, odo.corner_last.mask,
        odo.surf_last.xyz, odo.surf_last.mask, out_pts, out_mask)

    surf_q = jnp.concatenate([s, o])
    surf_qm = jnp.concatenate([sm, om])
    s2m = jax.jit(lambda T, a, b, cc, dd: mapping.scan_to_map(
        cfg, T, a, b, cc, dd, sub_c, sub_cm, sub_s, sub_sm))
    timeit("scan_to_map (8 it, 3 research)", s2m, m.pose, c, cm, surf_q,
           surf_qm)

    md = jax.jit(lambda p, v: scan_context.make_descriptor(p, v, cfg.sc))
    timeit("make_descriptor", md, pts, msk)

    ins = jax.jit(lambda kf: mapping.insert_keyframe(
        cfg, kf, jnp.bool_(True), m.pose, jnp.float32(6.0), c, cm, s, sm,
        o, om))
    timeit("insert_keyframe", ins, m.kf)

    mp = jax.jit(lambda mst: pipeline.mapping_step.__wrapped__(
        cfg, mst, odo.corner_last.xyz, odo.corner_last.mask,
        odo.surf_last.xyz, odo.surf_last.mask, out_pts, out_mask,
        odo.pose, pts, msk, jnp.float32(6.0), eng.p.imu))
    mst = jax.tree.map(jnp.copy, m)
    timeit("mapping_step (fused whole)", mp, mst, n=10)

    lp = jax.jit(lambda mst: pipeline.loop_step.__wrapped__(cfg, mst))
    mst = jax.tree.map(jnp.copy, m)
    timeit("loop_step (no close)", lp, mst, n=10)

    # Transfers LAST: the first device->host copy permanently degrades the
    # dispatch stream on this runtime (PERF.md), so occupancy stats print
    # only after every timing above.
    print(f"submap occupancy: corner {int(sub_cm.sum())}/"
          f"{sub_cm.shape[0]} surf {int(sub_sm.sum())}/{sub_sm.shape[0]}")


if __name__ == "__main__":
    main()
