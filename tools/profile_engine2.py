#!/usr/bin/env python
"""Serialized-latency measurement of the split engine dispatches
(perception_step / mapping_step / loop_step), to localize engine-level
overhead that per-stage profiles miss."""
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
from sc_lego_loam_tpu import pipeline
from sc_lego_loam_tpu.utils import synthetic

N = 16


def main():
    import dataclasses
    cfg = synthetic_config()
    # The lax.scan timing harness carries the mapper state WITHOUT
    # donation (two live copies + temporaries); at the 16k production
    # caps that exceeds HBM.  Per-tick cost does not scale with the cap
    # (submap gathers 50 recent; retrieval is one matmul), so profile at
    # the 4k bank.
    cfg = cfg.replace(
        cap=dataclasses.replace(cfg.cap, max_keyframes=4096),
        posegraph=dataclasses.replace(cfg.posegraph, max_loops=128))
    print("backend:", jax.default_backend())
    scans, valids, _ = synthetic.make_sequence(
        cfg.lidar, N, trajectory="figure8", radius=30.0, loops=0.15,
        noise=0.01, seed=11, shuffle=False)
    xs = (jnp.asarray(scans), jnp.asarray(valids))

    eng = pipeline.SlamEngine(cfg)
    for i in range(N):
        eng.process_scan(xs[0][i], xs[1][i], t=i * 0.1)
    jax.block_until_ready(eng.p.traj)

    # Steps are donate-jitted; run each via lax.scan over scans with the
    # state as carry (no donation inside scan, but same compute graph).
    corr = jnp.eye(4, dtype=jnp.float32)

    def body_percep(st, x):
        p, m = x
        st2, *_ = pipeline.perception_step.__wrapped__(
            cfg, st, corr, p, m, jnp.float32(1.0))
        return st2, None

    f = jax.jit(lambda c, x: jax.lax.scan(body_percep, c, x))
    st = jax.tree.map(jnp.copy, eng.p)
    out, _ = f(st, xs)
    jax.block_until_ready(out.scan_i)   # NO transfer: a device->host copy
    t0 = time.time()                    # permanently degrades dispatch
    for _ in range(3):                  # (PERF.md "transfer cliff")
        out, _ = f(st, xs)
    jax.block_until_ready(out.scan_i)
    print(f"{'perception_step':36s} {(time.time()-t0)/3/N*1e3:8.3f} ms/scan",
          flush=True)

    # mapping_step: chain the mapper state, fixed perception outputs.
    odo = eng.p.odo
    op = jnp.zeros((cfg.cap.outlier_pad, 3), jnp.float32)
    om = jnp.zeros((cfg.cap.outlier_pad,), bool)

    def body_map(mst, x):
        p, m = x
        mst2 = pipeline.mapping_step.__wrapped__(
            cfg, mst, odo.corner_last.xyz, odo.corner_last.mask,
            odo.surf_last.xyz, odo.surf_last.mask, op, om,
            odo.pose, p, m, jnp.float32(1.0), eng.p.imu)
        return mst2, None

    f = jax.jit(lambda c, x: jax.lax.scan(body_map, c, x))
    mst = jax.tree.map(jnp.copy, eng.m)
    out, _ = f(mst, xs)
    jax.block_until_ready(out.kf.count)
    t0 = time.time()
    for _ in range(3):
        out, _ = f(mst, xs)
    jax.block_until_ready(out.kf.count)
    print(f"{'mapping_step':36s} {(time.time()-t0)/3/N*1e3:8.3f} ms/tick",
          flush=True)

    def body_loop(mst, _):
        return pipeline.loop_step.__wrapped__(cfg, mst), None

    f = jax.jit(lambda c, x: jax.lax.scan(body_loop, c, x))
    mst = jax.tree.map(jnp.copy, eng.m)
    out, _ = f(mst, jnp.zeros((N, 1)))
    jax.block_until_ready(out.kf.count)
    t0 = time.time()
    for _ in range(3):
        out, _ = f(mst, jnp.zeros((N, 1)))
    jax.block_until_ready(out.kf.count)
    print(f"{'loop_step (no close)':36s} {(time.time()-t0)/3/N*1e3:8.3f} "
          "ms/tick", flush=True)

    # Dispatch-loop timing (the bench path): per-scan process_scan wall.
    eng2 = pipeline.SlamEngine(cfg)
    for i in range(N):
        eng2.process_scan(xs[0][i], xs[1][i], t=i * 0.1)
    jax.block_until_ready(eng2.p.traj)
    t0 = time.time()
    reps = 6
    for r in range(reps):
        for i in range(N):
            pose = eng2.process_scan(xs[0][i], xs[1][i],
                                     t=(r * N + i + N) * 0.1)
    jax.block_until_ready(pose)
    print(f"{'process_scan loop (bench path)':36s} "
          f"{(time.time()-t0)/reps/N*1e3:8.3f} ms/scan", flush=True)


if __name__ == "__main__":
    main()
