"""End-to-end loop-closure test: drive SlamEngine around a revisiting
figure-8 until Scan Context / radius-search loops fire, and assert they
improve the trajectory (reference behavior: mapOptmization.cpp:829-1110
performLoopClosure + :1642-1664 correctPoses).

Thresholds are scaled to the tiny sensor + short sequence (exclude_recent
10 instead of 50, time gap 4 s instead of 30 s) so the full machinery —
SC retrieval, ICP verification, factor insertion, pose-graph re-solve,
correctPoses — runs in CI time; the full-scale thresholds are exercised by
tools/run_synthetic.py --traj figure8 --scans 200 and by bench.py.
"""

import dataclasses

import numpy as np
import pytest

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.pipeline import SlamEngine
from sc_lego_loam_tpu.utils import evaluate, synthetic

N = 80


def _cfg(loop_enabled: bool):
    cfg = tiny_test_config()
    return cfg.replace(
        sc=dataclasses.replace(cfg.sc, exclude_recent=10),
        loop=dataclasses.replace(
            cfg.loop, enabled=loop_enabled, check_every_ticks=2,
            rs_time_gap=4.0, rs_search_radius=4.0),
    )


@pytest.fixture(scope="module")
def seq():
    cfg = _cfg(True)
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, N, trajectory="figure8", radius=12.0, loops=1.05,
        noise=0.01, seed=3, shuffle=not cfg.lidar.ordered)
    return scans, valids, gt


def _run(cfg, seq):
    scans, valids, gt = seq
    engine = SlamEngine(cfg)
    for i in range(N):
        engine.process_scan(scans[i], valids[i], t=i * 0.1)
    est = engine.trajectory_array()
    ate = evaluate.ate_rmse(est, gt[:len(est)])
    return engine, ate


@pytest.fixture(scope="module")
def loop_run(seq):
    return _run(_cfg(True), seq)


@pytest.fixture(scope="module")
def noloop_run(seq):
    return _run(_cfg(False), seq)


def test_loop_closure_fires(loop_run):
    engine, ate = loop_run
    assert int(engine.loops_closed) >= 1, \
        "no loop closure fired on a revisiting trajectory"
    assert int(engine.loops.count) >= 1


def test_loop_closure_trajectory_sane(loop_run):
    engine, ate = loop_run
    est = engine.trajectory_array()
    assert np.isfinite(est).all()
    assert ate < 1.0, f"ATE with loops {ate}"


def test_loop_closure_improves_or_matches_drift(loop_run, noloop_run):
    _, ate_loop = loop_run
    _, ate_free = noloop_run
    # Loop closure must not make things worse, and on this revisiting
    # sequence is expected to strictly help once odometry drift accrues.
    assert ate_loop <= ate_free + 0.05, (ate_loop, ate_free)
