#!/usr/bin/env python
"""Real-path (skewed, unordered, de-skew solver) accuracy diagnosis.

Runs the engine configurations of bench.py's `real` block on the cached
skewed figure-8 and prints per-scan relative-pose error statistics — the
tool behind the round-5 "make the real path track" work (VERDICT r4 next
round #1).  Variants:

  python tools/diag_real.py lidar      # lidar-only constant-twist de-skew
  python tools/diag_real.py imu        # IMU-driven de-skew (deskew_to_end)
  python tools/diag_real.py ordered    # undistorted control (same course)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rel_errors(est, gt):
    """Per-scan relative-pose errors: (rot deg, trans m) arrays."""
    n = min(len(est), len(gt))
    rot, trans = [], []
    for i in range(1, n):
        z_est = np.linalg.inv(est[i - 1]) @ est[i]
        z_gt = np.linalg.inv(gt[i - 1]) @ gt[i]
        e = np.linalg.inv(z_gt) @ z_est
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rot.append(np.degrees(np.arccos(c)))
        trans.append(np.linalg.norm(e[:3, 3]))
    return np.asarray(rot), np.asarray(trans)


def main():
    variants = sys.argv[1:] or ["lidar"]
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import bench
    from sc_lego_loam_tpu.config import ImuConfig, synthetic_config
    from sc_lego_loam_tpu.runner import mulran_engine_config
    from sc_lego_loam_tpu.utils import evaluate

    seed = int(os.environ.get("BENCH_SEED", "11"))
    for variant in variants:
        import dataclasses
        rcfg = mulran_engine_config()
        imu = None
        if variant == "ordered":
            cfg = synthetic_config()
            scans, valids, gt = bench.get_sequence(
                cfg.lidar, bench.N_SCANS, trajectory="figure8", noise=0.01,
                seed=seed, shuffle=False, radius=30.0, loops=1.05)
        else:
            cfg = rcfg
            if variant == "imu":
                cfg = rcfg.replace(imu=ImuConfig(enabled=True))
            elif variant == "odo":
                # Pure odometry: mapping/loop never tick.
                cfg = rcfg.replace(
                    mapping=dataclasses.replace(rcfg.mapping,
                                                process_interval=1e9),
                    loop=dataclasses.replace(rcfg.loop, enabled=False))
            elif variant == "odo-nodeskew":
                cfg = rcfg.replace(
                    odom=dataclasses.replace(rcfg.odom, deskew=False),
                    mapping=dataclasses.replace(rcfg.mapping,
                                                process_interval=1e9),
                    loop=dataclasses.replace(rcfg.loop, enabled=False))
            scans, valids, gt = bench.get_sequence(
                rcfg.lidar, bench.N_SCANS, trajectory="figure8", noise=0.01,
                seed=seed, shuffle=False, skew=True, radius=30.0, loops=1.05)
            if variant == "imu":
                imu = bench.make_imu(gt, seed=seed)

        engine, fps = bench.run_engine(cfg, scans, valids, bench.WARMUP,
                                       imu=imu)
        est = engine.trajectory_array()
        ate = evaluate.ate_rmse(est, gt[:len(est)])
        ate_steady = evaluate.ate_rmse(est[bench.WARMUP:],
                                       gt[bench.WARMUP:len(est)])
        rot, trans = rel_errors(est, gt)
        w = bench.WARMUP
        # Twist-scale diagnostic: |est per-scan rotation| / |gt rotation| —
        # a systematic ~0.5 means the solver is aligning the scan MIDDLE
        # (de-skew effectively dead); ~1.0 means unbiased tracking.
        n = min(len(est), len(gt))
        ratios = []
        for i in range(w, n):
            ze = np.linalg.inv(est[i - 1]) @ est[i]
            zg = np.linalg.inv(gt[i - 1]) @ gt[i]
            ae = np.degrees(np.arccos(np.clip(
                (np.trace(ze[:3, :3]) - 1) / 2, -1, 1)))
            ag = np.degrees(np.arccos(np.clip(
                (np.trace(zg[:3, :3]) - 1) / 2, -1, 1)))
            if ag > 0.5:
                ratios.append(ae / ag)
        ratios = np.asarray(ratios)
        print(f"\n=== {variant}: fps={fps:.1f} ate={ate:.3f} "
              f"steady={ate_steady:.3f} kf={int(engine.map.kf.count)} "
              f"loops={int(engine.loops_closed)}")
        print(f"rel-rot deg  (post-warmup): mean={rot[w:].mean():.3f} "
              f"p95={np.percentile(rot[w:], 95):.3f} max={rot[w:].max():.3f}")
        print(f"rel-trans m  (post-warmup): mean={trans[w:].mean():.3f} "
              f"p95={np.percentile(trans[w:], 95):.3f} "
              f"max={trans[w:].max():.3f}")
        if len(ratios):
            print(f"rot scale est/gt (|gt rot|>0.5deg): "
                  f"mean={ratios.mean():.3f} p10={np.percentile(ratios, 10):.3f} "
                  f"p90={np.percentile(ratios, 90):.3f} n={len(ratios)}")
        worst = np.argsort(trans)[-8:][::-1]
        print("worst scans (idx, rot deg, trans m):")
        for i in worst:
            print(f"  {i + 1:4d}  {rot[i]:7.3f}  {trans[i]:7.3f}")


if __name__ == "__main__":
    main()
