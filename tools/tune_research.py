#!/usr/bin/env python
"""A/B research-cadence and approximation-stack settings on the ordered
bench path, reporting fps + ATE across seeds — tuning decisions must
clear the measured noise band (VERDICT r3 weak #1 / missing #8).

Usage: python tools/tune_research.py [variant ...]
Variants: base, map_re4, odo_re3, both_re, exact (SCLOAM_NO_PALLAS +
exact XLA top-k NN path).
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from sc_lego_loam_tpu.config import synthetic_config

SEEDS = [11, 12, 13]
N = int(os.environ.get("BENCH_SCANS", "240"))
WARM = 16


def variant_cfg(name):
    cfg = synthetic_config()
    if name in ("map_re4", "both_re"):
        cfg = cfg.replace(mapping=dataclasses.replace(
            cfg.mapping, research_every=4))
    if name in ("odo_re3", "both_re"):
        cfg = cfg.replace(odom=dataclasses.replace(
            cfg.odom, research_every=3))
    return cfg


def main():
    names = sys.argv[1:] or ["base", "map_re4", "odo_re3", "both_re"]
    for name in names:
        if name == "exact":
            os.environ["SCLOAM_NO_PALLAS"] = "1"
            cfg = variant_cfg("base")
        else:
            os.environ.pop("SCLOAM_NO_PALLAS", None)
            cfg = variant_cfg(name)
        ates, fpss, loops = [], [], []
        for seed in SEEDS:
            scans, valids, gt = bench.get_sequence(
                cfg.lidar, N, trajectory="figure8", noise=0.01,
                seed=seed, shuffle=False, radius=30.0, loops=1.05)
            eng, fps = bench.run_engine(cfg, scans, valids, WARM)
            ate, ate_s = bench.ates(eng, gt, WARM)
            ates.append(ate)
            fpss.append(fps)
            loops.append(int(eng.loops_closed))
        print(f"{name:10s} fps={min(fpss):6.1f}-{max(fpss):6.1f} "
              f"ate={min(ates):.3f}-{max(ates):.3f} "
              f"mean={sum(ates)/len(ates):.3f} loops={loops}", flush=True)


if __name__ == "__main__":
    main()
