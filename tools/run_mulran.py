#!/usr/bin/env python
"""Run the SLAM engine over a MulRan sequence (BASELINE.json configs 1-3).

Usage:
  python tools/run_mulran.py --root /data/mulran/DCC01 [--scans 500]
                             [--no-loop] [--platform cpu] [--export PREFIX]

Prints one JSON line with fps / ATE / keyframes / loop count — the
reference's own validation protocol (README.md:22-34) made quantitative.
The sequence directory must hold sensor_data/Ouster/<ts>.bin scans and
(optionally, for ATE) global_pose.csv.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="MulRan sequence dir")
    ap.add_argument("--scans", type=int, default=None, help="limit scans")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--no-native", action="store_true",
                    help="skip the native prefetching loader")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--progress", type=int, default=20,
                    help="print progress every N scans (0 = quiet)")
    ap.add_argument("--export", default=None,
                    help="path prefix for trajectory/map export")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sc_lego_loam_tpu import runner

    res = runner.run_mulran(
        args.root, limit=args.scans, use_native=not args.no_native,
        loop_enabled=not args.no_loop,
        progress_every=args.progress or None)

    if args.export:
        from sc_lego_loam_tpu.utils import export
        engine = res["engine"]
        export.save_trajectory_tum(args.export + "_traj.txt",
                                   res["times"], res["est"])
        pts = export.global_map_points(engine)
        export.save_ply(args.export + "_map.ply", pts)
        export.save_checkpoint(args.export + "_ckpt.npz", engine)

    print(json.dumps({
        "sequence": res["sequence"],
        "scans": res["scans"],
        "fps": round(res["fps"], 3),
        "keyframes": res["keyframes"],
        "loops_closed": res["loops_closed"],
        "ate_rmse_m": round(res["ate_rmse_m"], 4)
        if "ate_rmse_m" in res else None,
        "gt_length_m": round(res.get("gt_length_m", 0.0), 1) or None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
