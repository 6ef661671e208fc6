#!/usr/bin/env python
"""Benchmark: full-pipeline frames/sec on one chip, loops included.

Runs the complete SLAM engine (frontend -> features -> odometry -> mapping
-> scan context -> loop closure -> pose graph) on a REVISITING figure-8
OS1-64 synthetic sequence, so Scan Context retrieval, ICP verification and
the pose-graph re-solve all execute inside the timed region (the reference
headline feature; a straight-line run would never take the loop branch).
Baseline = the reference's design target of 10 Hz real-time on a desktop
CPU (utility.h:111 scanPeriod=0.1; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Long enough that keyframes exceed the SC exclude-recent window (50) and
# the revisit closes loops with the reference's real thresholds.
N_SCANS = int(os.environ.get("BENCH_SCANS", "240"))
# Warmup must cover every compile path: mapping ticks, keyframe insertion,
# and the first loop-closure check (fires at check_every keyframes).
WARMUP = int(os.environ.get("BENCH_WARMUP", "16"))
TRAJ = os.environ.get("BENCH_TRAJ", "figure8")
SEED = int(os.environ.get("BENCH_SEED", "11"))
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
    kw = dict(radius=30.0, loops=1.05) if TRAJ == "figure8" else \
        dict(step=0.4)
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, N_SCANS, trajectory=TRAJ, noise=0.01,
        seed=SEED, shuffle=False, **kw)  # beam-ordered, as real sensors emit

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
    # Steady-state ATE over the timed region: the first scans carry a
    # bootstrap transient (cold-start odometry at this sequence's 7 m/s
    # per-scan motion) that dominates the full-run RMSE; fps is measured
    # on the same post-warmup window.
    ate_steady = evaluate.ate_rmse(est[WARMUP:], gt[WARMUP:len(est)])

    n_revisits = _revisit_events(gt, engine, cfg)
    loops = int(engine.loops_closed)
    recall = round(min(loops, n_revisits) / n_revisits, 3) \
        if n_revisits else None

    print(json.dumps({
        "metric": "frames_per_sec_full_pipeline",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "extra": {
            "trajectory": TRAJ,
            "ate_rmse_m": round(ate, 4),
            "ate_steady_m": round(ate_steady, 4),
            "scans": N_SCANS - WARMUP,
            "keyframes": int(engine.map.kf.count),
            "loops_closed": loops,
            "revisit_events": n_revisits,
            "loop_recall": recall,
            "platform": _backend(),
        },
    }))


def _revisit_events(gt, engine, cfg):
    """Ground-truth loop opportunities (BASELINE.json 'equivalent recall'):
    contiguous runs of scans whose true position lies within the loop
    search radius of a sufficiently older part of the trajectory.  "Older"
    mirrors the Scan Context exclude-recent window (the RS 30 s gate can't
    fire on a short bench run): exclude_recent keyframes at the run's
    observed keyframe cadence."""
    import numpy as np
    pos = gt[:, :3, 3]
    n = len(pos)
    dt = 0.1
    kf_per_s = float(engine.map.kf.count) / (n * dt)
    min_gap = cfg.sc.exclude_recent / max(kf_per_s, 1e-6)
    radius = cfg.loop.rs_search_radius
    rev = np.zeros(n, bool)
    for i in range(1, n):
        gap_ok = np.arange(i) * dt < i * dt - min_gap
        if gap_ok.any():
            d = np.linalg.norm(pos[:i][gap_ok] - pos[i], axis=1)
            rev[i] = bool((d < radius).any())
    return int(((~rev[:-1]) & rev[1:]).sum() + int(rev[0]))


def _backend():
    import jax
    return jax.default_backend()


if __name__ == "__main__":
    main()
