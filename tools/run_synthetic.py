#!/usr/bin/env python
"""Drive the full SLAM engine end-to-end on a synthetic sequence.

Usage:
  python tools/run_synthetic.py [--scans N] [--traj straight|figure8]
                                [--preset tiny|os1-64] [--platform cpu]

Prints per-scan poses, final ATE vs ground truth, loop-closure count, and
stage timings. This is the primary "does the product work" driver — it
exercises frontend -> features -> odometry -> mapping -> scan context ->
loop closure -> pose graph through the public SlamEngine API.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=30)
    ap.add_argument("--traj", default="straight",
                    choices=["straight", "figure8"])
    ap.add_argument("--preset", default="tiny",
                    choices=["tiny", "os1-64", "vlp-16"])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--step", type=float, default=0.4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--skew", action="store_true",
                    help="motion-distorted scans + deskew=True odometry "
                    "(the real-data / MulRan code path)")
    ap.add_argument("--export", default=None,
                    help="optional path prefix for map/trajectory export")
    args = ap.parse_args()

    import jax
    if args.platform:
        # Env vars are overridden by a site hook on this box; the config
        # API wins (see tests/conftest.py).
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sc_lego_loam_tpu.config import (tiny_test_config, synthetic_config,
                                         vlp16_config, OdometryConfig)
    from sc_lego_loam_tpu.pipeline import SlamEngine
    from sc_lego_loam_tpu.utils import synthetic, evaluate
    import dataclasses

    if args.preset == "tiny":
        cfg = tiny_test_config()
    elif args.preset == "vlp-16":
        # 16-beam sparse-lidar variant (BASELINE.json config 5), adapted
        # for instantaneous synthetic clouds.
        base = vlp16_config()
        cfg = base.replace(
            lidar=dataclasses.replace(base.lidar, ordered=True),
            odom=OdometryConfig(deskew=False, min_surf_points=30,
                                eig_threshold=2.0))
    else:
        cfg = synthetic_config()
    if args.skew:
        # The mulran_engine_config semantics: unordered scatter projection
        # + motion-interpolated de-skew on genuinely distorted scans.
        cfg = cfg.replace(
            lidar=dataclasses.replace(cfg.lidar, ordered=False),
            odom=dataclasses.replace(cfg.odom, deskew=True))

    print(f"generating {args.scans}-scan synthetic sequence "
          f"({cfg.lidar.name}, {args.traj}{', skewed' if args.skew else ''})"
          "...", flush=True)
    kw = dict(step=args.step) if args.traj == "straight" else dict(
        radius=30.0, loops=1.05)
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, args.scans, trajectory=args.traj, noise=0.01,
        seed=args.seed, shuffle=False if args.skew else not cfg.lidar.ordered,
        skew=args.skew, **kw)

    engine = SlamEngine(cfg)
    t0 = time.time()
    for i in range(args.scans):
        ts = time.time()
        pose = engine.process_scan(scans[i], valids[i], t=i * 0.1)
        import numpy as np
        p = np.asarray(pose)[:3, 3]
        print(f"scan {i:3d}: pos=({p[0]:7.2f},{p[1]:7.2f},{p[2]:6.2f})  "
              f"gt=({gt[i][0,3]:7.2f},{gt[i][1,3]:7.2f},{gt[i][2,3]:6.2f})  "
              f"kf={int(engine.map.kf.count)} loops={int(engine.loops_closed)} "
              f"[{time.time()-ts:5.2f}s]", flush=True)
    wall = time.time() - t0

    import numpy as np
    est = engine.trajectory_array()
    ate = evaluate.ate_rmse(est, gt[:len(est)])
    rpe_t, rpe_r = evaluate.rpe(est, gt[:len(est)])
    print(f"\n=== {args.scans} scans in {wall:.1f}s "
          f"({args.scans/wall:.2f} scans/s incl. compile) ===")
    print(f"ATE RMSE: {ate:.3f} m   RPE: {rpe_t:.3f} m / "
          f"{np.degrees(rpe_r):.3f} deg")
    print(f"keyframes: {int(engine.map.kf.count)}  "
          f"loop closures: {int(engine.loops_closed)}")
    print("\nper-stage timings (post-warmup):")
    print(engine.timer.table(skip_first=2))

    if args.export:
        from sc_lego_loam_tpu.utils import export
        pts = export.global_map_points(engine)
        export.save_ply(args.export + "_map.ply", pts)
        export.save_trajectory_tum(
            args.export + "_traj.txt",
            engine.trajectory_times(), est)
        export.save_checkpoint(args.export + "_ckpt.npz", engine)
        print(f"exported map ({len(pts)} pts) + trajectory + checkpoint "
              f"to {args.export}_*")

    ok = ate < 1.0
    print("VERDICT:", "PASS" if ok else "FAIL", f"(ate={ate:.3f})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
