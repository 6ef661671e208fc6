#!/usr/bin/env python
"""Serialized-latency measurement of the full engine_step (mapping on/off),
to localize engine-level overhead that per-stage profiles miss."""
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
    cfg = synthetic_config()
    print("backend:", jax.default_backend())
    scans, valids, _ = synthetic.make_sequence(
        cfg.lidar, N, trajectory="figure8", radius=30.0, loops=0.15,
        noise=0.01, seed=11, shuffle=False)
    xs = (jnp.asarray(scans), jnp.asarray(valids))

    eng = pipeline.SlamEngine(cfg)
    for i in range(N):
        eng.process_scan(xs[0][i], xs[1][i], t=i * 0.1)
    jax.block_until_ready(eng.state.traj)

    # engine_step is donate-jitted; run it via lax.scan over scans with the
    # state as carry (no donation inside scan, but same compute graph).
    def body_nomap(st, x):
        p, m = x
        st2, fused = pipeline.engine_step.__wrapped__(
            cfg, st, p, m, jnp.float32(1.0), jnp.bool_(False))
        return st2, None

    def body_map(st, x):
        p, m = x
        st2, fused = pipeline.engine_step.__wrapped__(
            cfg, st, p, m, jnp.float32(1.0), jnp.bool_(True))
        return st2, None

    for name, body in (("engine_step map=False", body_nomap),
                       ("engine_step map=True", body_map)):
        f = jax.jit(lambda c, x: jax.lax.scan(body, c, x))
        st = jax.tree.map(jnp.copy, eng.state)
        out, _ = f(st, xs)
        np.asarray(out.scan_i)
        t0 = time.time()
        for _ in range(3):
            out, _ = f(st, xs)
        np.asarray(out.scan_i)
        print(f"{name:36s} {(time.time()-t0)/3/N*1e3:8.3f} ms/scan",
              flush=True)

    # Dispatch-loop timing (the bench path): per-scan process_scan wall.
    eng2 = pipeline.SlamEngine(cfg)
    for i in range(N):
        eng2.process_scan(xs[0][i], xs[1][i], t=i * 0.1)
    jax.block_until_ready(eng2.state.traj)
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
