#!/usr/bin/env python
"""Measurement-methodology check: chained vs independent vs per-call-block
timings for the composite stages.  Determines whether the axon platform
overlaps independent dispatches (which would make queued-independent
timings underestimate true per-call latency)."""

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
from sc_lego_loam_tpu import frontend, odometry, pipeline
from sc_lego_loam_tpu.utils import synthetic


def bench3(name, fn, chain_fn, *args, n=20):
    """fn(*args) -> out; chain_fn(out, *args) -> args' (forces dependence)."""
    out = fn(*args)
    jax.block_until_ready(out)
    # independent, queued
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    t_ind = (time.time() - t0) / n * 1e3
    # independent, block each call
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    t_blk = (time.time() - t0) / n * 1e3
    # chained
    a = args
    out = fn(*a)
    t0 = time.time()
    for _ in range(n):
        a = chain_fn(out, *a)
        out = fn(*a)
    jax.block_until_ready(out)
    t_ch = (time.time() - t0) / n * 1e3
    print(f"{name:30s} queued={t_ind:8.3f}  blocked={t_blk:8.3f}  "
          f"chained={t_ch:8.3f} ms")


def main():
    cfg = synthetic_config()
    print("backend:", jax.default_backend())
    scans, valids, _ = synthetic.make_sequence(
        cfg.lidar, 2, trajectory="figure8", radius=30.0, loops=0.05,
        noise=0.01, seed=11, shuffle=False)
    pts = jnp.asarray(scans[-1]); msk = jnp.asarray(valids[-1])

    @jax.jit
    def perturb(out_scalar, p, m):
        return p + 0.0 * out_scalar, m

    bench3("frontend.run",
           lambda p, m: frontend.run(cfg, p, m),
           lambda out, p, m: perturb(out.image.rng[0, 0], p, m),
           pts, msk)

    fo = frontend.run(cfg, pts, msk)
    bench3("pipeline._extract",
           lambda c, o: pipeline._extract(cfg, c, o),
           lambda out, c, o: (c._replace(
               xyz=c.xyz + 0.0 * out[0].sharp.xyz[0, 0]), o),
           fo.cloud, fo.outlier)

    fs, _, _ = pipeline._extract(cfg, fo.cloud, fo.outlier)
    st = odometry.init_state(cfg)
    st, _, _ = odometry.step(cfg, st, fs)   # initialized
    bench3("odometry.step",
           lambda s, f: odometry.step(cfg, s, f),
           lambda out, s, f: (out[0]._replace(
               corner_last=s.corner_last, surf_last=s.surf_last), f),
           st, fs)

    bench3("perception_step",
           lambda p, m, s: pipeline._perception_step(cfg, p, m, s),
           lambda out, p, m, s: (p + 0.0 * out[1][0, 0], m, out[0]),
           pts, msk, st)


if __name__ == "__main__":
    main()
