#!/usr/bin/env python
"""Seed-tail loop diagnosis (VERDICT r4 missing #6): replay the ordered
figure-8 at given seeds and, at every loop tick, print what the detector
and verifier actually saw — SC distance vs threshold, RS candidate,
ICP fitness and inlier ratio vs gates — so a high-ATE seed can be
attributed to retrieval misses vs verification rejects vs geometry.

Usage: python tools/diag_loops.py [seed ...]     (default: 11 15)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [11, 15]
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench
    from sc_lego_loam_tpu import loop as loop_mod
    from sc_lego_loam_tpu.config import synthetic_config
    from sc_lego_loam_tpu.models import scan_context
    from sc_lego_loam_tpu.ops import icp
    from sc_lego_loam_tpu.pipeline import SlamEngine
    from sc_lego_loam_tpu.utils import evaluate, se3

    cfg = synthetic_config()
    clover = os.environ.get("DIAG_CLOVER", "0") == "1"
    for seed in seeds:
        if clover:
            scans, valids, gt = bench.get_sequence(
                cfg.lidar, bench.CLOVER_SCANS, trajectory="cloverleaf",
                noise=0.01, seed=seed, shuffle=False, radius=32.0, petals=4)
        else:
            scans, valids, gt = bench.get_sequence(
                cfg.lidar, bench.N_SCANS, trajectory="figure8", noise=0.01,
                seed=seed, shuffle=False, radius=30.0, loops=1.05)
        eng = SlamEngine(cfg)
        print(f"\n===== seed {seed} =====")
        prev_ticks = 0
        for i in range(len(scans)):
            eng.process_scan(scans[i], valids[i], t=i * 0.1)
            tick_now = eng.map_ticks
            looped = (tick_now != prev_ticks and cfg.loop.enabled and
                      tick_now % cfg.loop.check_every_ticks == 0)
            prev_ticks = tick_now
            if not looped:
                continue
            m = eng.m
            kf = m.kf
            cur = max(int(kf.count) - 1, 0)
            sc_idx, sc_dist, sc_yaw = scan_context.detect(
                cfg, m.bank, m.bank.desc[cur])
            rs_idx = loop_mod.detect_radius(cfg, kf, jnp.int32(cur))
            si, ri, sd = int(sc_idx), int(rs_idx), float(sc_dist)
            if si < 0 and ri < 0:
                # Print near-misses: best eligible SC distance.
                print(f"scan {i:4d} kf {cur:3d}: no candidate "
                      f"(best SC dist {sd:.3f} vs thr "
                      f"{cfg.sc.dist_threshold})")
                continue
            parts = [f"scan {i:4d} kf {cur:3d}:"]
            if si >= 0:
                place = se3.pose6_to_mat(kf.poses6[si])
                src, srcm = loop_mod.keyframe_cloud(cfg, kf, jnp.int32(cur),
                                                    place)
                dst, dstm = loop_mod.history_submap(cfg, kf, jnp.int32(si))
                phi = -sc_yaw
                Rz = se3.rt_to_mat(
                    se3.euler_zyx_to_mat(phi, jnp.float32(0), jnp.float32(0)),
                    jnp.zeros(3))
                T0 = place @ Rz @ se3.mat_inv(place)
                _, fit, inl = icp.align(cfg, src, srcm, dst, dstm, T0=T0)
                ok = (float(fit) < cfg.loop.fitness_threshold and
                      float(inl) >= cfg.loop.min_inlier_ratio)
                parts.append(f"SC->{si} dist={sd:.3f} fit={float(fit):.3f} "
                             f"inl={float(inl):.3f} accept={ok}")
            if ri >= 0 and ri != si:
                place = se3.pose6_to_mat(kf.poses6[cur])
                src, srcm = loop_mod.keyframe_cloud(cfg, kf, jnp.int32(cur),
                                                    place)
                dst, dstm = loop_mod.history_submap(cfg, kf, jnp.int32(ri))
                _, fit, inl = icp.align(cfg, src, srcm, dst, dstm)
                ok = (float(fit) < cfg.loop.fitness_threshold and
                      float(inl) >= cfg.loop.min_inlier_ratio)
                parts.append(f"RS->{ri} fit={float(fit):.3f} "
                             f"inl={float(inl):.3f} accept={ok}")
            print(" ".join(parts))
        est = eng.trajectory_array()
        ate = evaluate.ate_rmse(est, gt[:len(est)])
        print(f"seed {seed}: ate={ate:.3f} loops_closed="
              f"{int(eng.loops_closed)} kf={int(eng.map.kf.count)}")
        # Per accepted factor: ground-truth relative-translation error
        # (the bench's truth gate, loop_precision_recall).
        loops = eng.loops
        kf_times = np.asarray(eng.map.kf.times)
        for k in range(min(int(loops.count), loops.i.shape[0])):
            a, b = int(loops.i[k]), int(loops.j[k])
            sa = min(int(round(float(kf_times[a]) / 0.1)), len(gt) - 1)
            sb = min(int(round(float(kf_times[b]) / 0.1)), len(gt) - 1)
            z_gt = np.linalg.inv(gt[sa]) @ gt[sb]
            err = np.linalg.norm(np.asarray(loops.z[k])[:3, 3]
                                 - z_gt[:3, 3])
            print(f"  factor {k:2d}: kf {a:3d}->{b:3d} "
                  f"gt-err={err:6.2f} m {'TRUE' if err < 2.0 else 'FALSE'}")


if __name__ == "__main__":
    main()
