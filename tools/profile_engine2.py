#!/usr/bin/env python
"""Per-stage engine cost via DIFFERENTIAL dispatch-loop timing.

The engine's stages are measured from the real process_scan loop (distinct
scans, zero host<->device transfers before/inside any timed window — the
first transfer of a process permanently degrades all later dispatches on
this runtime, see PERF.md "the transfer cliff"):

  A. mapping+loop disabled        -> perception-only ms/scan
  B. mapping every scan, no loop  -> A + mapping ms/tick
  C. mapping every scan + loop every tick -> B + loop ms/tick

Stage costs are the differences.  This replaces the earlier lax.scan
timing harness, which poisoned its own process and reported the degraded-
mode numbers (r4's 16/27 ms "device times" were this artifact)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from sc_lego_loam_tpu import pipeline
from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu.runner import mulran_engine_config

WARM = 16
N = bench.N_SCANS


def run(cfg, scans, valids):
    eng = pipeline.SlamEngine(cfg)
    for i in range(WARM):
        pose = eng.process_scan(scans[i], valids[i], t=i * 0.1)
    jax.block_until_ready(pose)
    t0 = time.time()
    for i in range(WARM, N):
        pose = eng.process_scan(scans[i], valids[i], t=i * 0.1)
    jax.block_until_ready(pose)
    return (time.time() - t0) / (N - WARM) * 1e3


def main():
    real = os.environ.get("PROF_REAL", "0") == "1"
    base = mulran_engine_config() if real else synthetic_config()
    kw = dict(trajectory="figure8", noise=0.01, seed=11, shuffle=False,
              radius=30.0, loops=1.05)
    if real:
        kw["skew"] = True
    scans, valids, _ = bench.get_sequence(base.lidar, N, **kw)
    print("backend:", jax.default_backend(),
          "| config:", "real" if real else "ordered", flush=True)

    cfg_a = base.replace(
        mapping=dataclasses.replace(base.mapping, process_interval=1e9),
        loop=dataclasses.replace(base.loop, enabled=False))
    a = run(cfg_a, scans, valids)
    print(f"{'A perception only':34s} {a:8.3f} ms/scan", flush=True)

    cfg_b = base.replace(
        mapping=dataclasses.replace(base.mapping, process_interval=0.0),
        loop=dataclasses.replace(base.loop, enabled=False))
    b = run(cfg_b, scans, valids)
    print(f"{'B + mapping every scan':34s} {b:8.3f} ms/scan "
          f"(mapping ~{b - a:.3f} ms/tick)", flush=True)

    cfg_c = base.replace(
        mapping=dataclasses.replace(base.mapping, process_interval=0.0),
        loop=dataclasses.replace(base.loop, check_every_ticks=1))
    c = run(cfg_c, scans, valids)
    print(f"{'C + loop every tick':34s} {c:8.3f} ms/scan "
          f"(loop ~{c - b:.3f} ms/tick)", flush=True)

    d = run(base, scans, valids)
    print(f"{'bench config (map/3, loop/9)':34s} {d:8.3f} ms/scan "
          f"= {1e3 / d:.0f} fps", flush=True)


if __name__ == "__main__":
    main()
