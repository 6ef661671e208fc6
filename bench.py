#!/usr/bin/env python
"""Benchmark: full-pipeline frames/sec on one chip.

Runs the complete SLAM engine (frontend -> features -> odometry -> mapping
-> scan context -> loop closure) on a synthetic OS1-64 sequence and reports
steady-state frames/sec.  Baseline = the reference's design target of
10 Hz real-time on a desktop CPU (utility.h:111 scanPeriod=0.1; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SCANS = int(os.environ.get("BENCH_SCANS", "60"))
# Warmup must cover every compile path: mapping ticks, keyframe insertion,
# and the first loop-closure check (fires at check_every keyframes).
WARMUP = int(os.environ.get("BENCH_WARMUP", "16"))
BASELINE_FPS = 10.0   # reference real-time rate (BASELINE.md)


def main():
    import jax
    # f32 accuracy for the small-matrix SE(3)/solver math on TPU (MXU
    # defaults to bf16 inputs); the hot large matmuls opt back down to
    # lower precision explicitly where profiled safe.
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sc_lego_loam_tpu.config import synthetic_config
    from sc_lego_loam_tpu.pipeline import SlamEngine
    from sc_lego_loam_tpu.utils import synthetic, evaluate

    cfg = synthetic_config()
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, N_SCANS, trajectory="straight", step=0.4, noise=0.01,
        seed=11, shuffle=False)    # beam-ordered, as real sensors emit

    engine = SlamEngine(cfg)
    # Warmup: trigger every compile path (incl. mapping + the loop-closure
    # detector, which first fires once check_every keyframes exist).
    for i in range(WARMUP):
        pose = engine.process_scan(scans[i], valids[i], t=i * 0.1)
    jax.block_until_ready(pose)   # drain the async dispatch queue

    t0 = time.time()
    for i in range(WARMUP, N_SCANS):
        pose = engine.process_scan(scans[i], valids[i], t=i * 0.1)
    # The engine is fully asynchronous (zero per-scan syncs); the clock
    # must wait for the device to finish the last scan.
    jax.block_until_ready(pose)
    wall = time.time() - t0
    fps = (N_SCANS - WARMUP) / wall
    print(engine.timer.table(skip_first=2), file=sys.stderr)

    est = engine.trajectory_array()
    ate = evaluate.ate_rmse(est, gt[:len(est)])

    print(json.dumps({
        "metric": "frames_per_sec_full_pipeline",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "extra": {
            "ate_rmse_m": round(ate, 4),
            "scans": N_SCANS - WARMUP,
            "keyframes": int(engine.map.kf.count),
            "platform": _backend(),
        },
    }))


def _backend():
    import jax
    return jax.default_backend()


if __name__ == "__main__":
    main()
