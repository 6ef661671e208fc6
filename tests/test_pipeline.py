"""End-to-end engine test on a short synthetic sequence (the pytest analog
of tools/run_synthetic.py; BASELINE.json config-1 odometry-only scale)."""

import numpy as np
import pytest

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.pipeline import SlamEngine
from sc_lego_loam_tpu.utils import evaluate, synthetic


@pytest.fixture(scope="module")
def run_result():
    cfg = tiny_test_config()
    n = 10
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, n, trajectory="straight", step=0.4, noise=0.01, seed=7)
    engine = SlamEngine(cfg)
    for i in range(n):
        engine.process_scan(scans[i], valids[i], t=i * 0.1)
    return cfg, engine, gt


def test_engine_tracks_straight_motion(run_result):
    cfg, engine, gt = run_result
    est = engine.trajectory_array()
    assert np.isfinite(est).all()
    ate = evaluate.ate_rmse(est, gt[:len(est)])
    # Regression bound ~3x the current value (ATE ~0.07 m on this fixture;
    # full-size OS1-64 reaches ~0.06 m over 240 scans, see bench).
    assert ate < 0.25, f"ATE {ate}"
    # Moved roughly the right distance (tiny-sensor floor; see bench for
    # the full-size accuracy).
    d_est = np.linalg.norm(est[-1][:3, 3] - est[0][:3, 3])
    d_gt = np.linalg.norm(gt[len(est) - 1][:3, 3] - gt[0][:3, 3])
    assert abs(d_est - d_gt) < 0.3 * d_gt


def test_engine_inserts_keyframes(run_result):
    cfg, engine, gt = run_result
    # 0.4 m steps with 0.3 m keyframe threshold: most mapping ticks keyframe.
    assert int(engine.map.kf.count) >= 2
    assert int(engine.bank.count) == int(engine.map.kf.count)


def test_checkpoint_roundtrip(tmp_path, run_result):
    cfg, engine, gt = run_result
    from sc_lego_loam_tpu.utils import export
    p = str(tmp_path / "ckpt.npz")
    export.save_checkpoint(p, engine)
    fresh = SlamEngine(cfg)
    export.load_checkpoint(p, fresh)
    assert int(fresh.map.kf.count) == int(engine.map.kf.count)
    np.testing.assert_allclose(np.asarray(fresh.map.pose),
                               np.asarray(engine.map.pose))
    np.testing.assert_allclose(np.asarray(fresh.bank.desc),
                               np.asarray(engine.bank.desc))


def test_map_export(tmp_path, run_result):
    cfg, engine, gt = run_result
    from sc_lego_loam_tpu.utils import export
    pts = export.global_map_points(engine)
    assert len(pts) > 100
    n = min(500, len(pts))
    ply = str(tmp_path / "map.ply")
    export.save_ply(ply, pts[:n])
    with open(ply) as f:
        head = f.read(200)
    assert f"element vertex {n}" in head
