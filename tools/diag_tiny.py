#!/usr/bin/env python
"""Quick regression diagnostic: tiny-config figure-8, prints ATE + loops."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIAG_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.pipeline import SlamEngine
from sc_lego_loam_tpu.utils import evaluate, synthetic

N = 80


def main():
    cfg = tiny_test_config()
    cfg = cfg.replace(
        sc=dataclasses.replace(cfg.sc, exclude_recent=10),
        loop=dataclasses.replace(
            cfg.loop, enabled=True, check_every_ticks=2,
            rs_time_gap=4.0, rs_search_radius=4.0),
    )
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, N, trajectory="figure8", radius=12.0, loops=1.05,
        noise=0.01, seed=3, shuffle=not cfg.lidar.ordered)
    engine = SlamEngine(cfg)
    for i in range(N):
        engine.process_scan(scans[i], valids[i], t=i * 0.1)
    est = engine.trajectory_array()
    ate = evaluate.ate_rmse(est, gt[:len(est)])
    print(f"ate={ate:.4f} loops={int(engine.loops_closed)} "
          f"kf={int(engine.map.kf.count)}")


if __name__ == "__main__":
    main()
