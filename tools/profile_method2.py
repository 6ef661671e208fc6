#!/usr/bin/env python
"""Round 2 of methodology: distinct pre-uploaded inputs, transfer costs,
and true engine_step cost under bench-like conditions."""

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


def main():
    cfg = synthetic_config()
    print("backend:", jax.default_backend())
    n_sc = 20
    scans, valids, _ = synthetic.make_sequence(
        cfg.lidar, n_sc, trajectory="figure8", radius=30.0, loops=0.1,
        noise=0.01, seed=11, shuffle=False)

    # 1. host->device transfer cost (786 KB scan)
    t0 = time.time()
    for i in range(n_sc):
        d = jax.device_put(scans[i])
        jax.block_until_ready(d)
    print(f"device_put 786KB blocked          {(time.time()-t0)/n_sc*1e3:8.3f} ms")

    dev_scans = [jax.device_put(jnp.asarray(s)) for s in scans]
    dev_valids = [jax.device_put(jnp.asarray(v)) for v in valids]
    jax.block_until_ready(dev_scans)

    # 2. frontend over DISTINCT device-resident inputs, queued
    out = frontend.run(cfg, dev_scans[0], dev_valids[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n_sc):
        out = frontend.run(cfg, dev_scans[i], dev_valids[i])
    jax.block_until_ready(out)
    print(f"frontend.run distinct queued      {(time.time()-t0)/n_sc*1e3:8.3f} ms")
    t0 = time.time()
    for i in range(n_sc):
        out = frontend.run(cfg, dev_scans[i], dev_valids[i])
        jax.block_until_ready(out)
    print(f"frontend.run distinct blocked     {(time.time()-t0)/n_sc*1e3:8.3f} ms")

    # 3. full engine_step chained, device-resident scans (bench reality)
    eng = pipeline.SlamEngine(cfg)
    for i in range(8):
        pose = eng.process_scan(dev_scans[i], dev_valids[i], t=i * 0.1)
    jax.block_until_ready(pose)
    t0 = time.time()
    for i in range(8, n_sc):
        pose = eng.process_scan(dev_scans[i], dev_valids[i], t=i * 0.1)
    jax.block_until_ready(pose)
    print(f"engine_step chained (mix map)     {(time.time()-t0)/(n_sc-8)*1e3:8.3f} ms")

    # 4. perception-only chained through real state (no mapping ticks):
    eng2 = pipeline.SlamEngine(cfg)
    pose = eng2.process_scan(dev_scans[0], dev_valids[0], t=0.0)
    jax.block_until_ready(pose)
    eng2.last_map_time = 1e9   # suppress mapping ticks entirely
    t0 = time.time()
    for i in range(1, n_sc):
        pose = eng2.process_scan(dev_scans[i], dev_valids[i], t=i * 0.1)
    jax.block_until_ready(pose)
    print(f"engine_step chained (no mapping)  {(time.time()-t0)/(n_sc-1)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
