import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu import frontend, odometry
from sc_lego_loam_tpu.ops import features as F
from sc_lego_loam_tpu.utils import se3, synthetic


def _features(cfg, pts, valid):
    out = frontend.run(cfg, jnp.asarray(pts), jnp.asarray(valid))
    return F.extract(out.cloud, cfg.feat, cfg.cap)


@pytest.fixture(scope="module")
def seq():
    cfg = tiny_test_config()
    scans, valids, poses = synthetic.make_sequence(
        cfg.lidar, 6, trajectory="straight", step=0.3, yaw_rate=0.02,
        noise=0.005, seed=5)
    return cfg, scans, valids, poses


def test_odometry_recovers_motion(seq):
    cfg, scans, valids, poses = seq
    state = odometry.init_state(cfg)
    est = [np.eye(4)]
    for i in range(len(scans)):
        fs = _features(cfg, scans[i], valids[i])
        state, pose, xi = odometry.step(cfg, state, fs)
        est.append(np.asarray(pose))
    est = est[1:]
    # Compare relative motions against ground truth.
    for i in range(1, len(scans)):
        T_gt = np.linalg.inv(poses[i - 1]) @ poses[i]
        T_est = np.linalg.inv(est[i - 1]) @ est[i]
        dt = np.linalg.norm(T_gt[:3, 3] - T_est[:3, 3])
        dR = se3.rotation_angle(jnp.asarray(
            T_gt[:3, :3].T @ T_est[:3, :3], jnp.float32))
        # Tiny 16x128 grid (2.8deg azimuth) floor; the full-size OS1-64
        # config tracks at ~cm (see bench).  Current worst-case on this
        # fixture: dt 0.087, dR 0.008 — bounds sit ~30% above as a
        # regression guard, not a smoke floor.
        assert dt < 0.1, f"frame {i}: trans err {dt}"
        assert float(dR) < 0.012, f"frame {i}: rot err {float(dR)}"


def test_odometry_stationary(seq):
    """Identical consecutive scans -> near-identity relative pose."""
    cfg, scans, valids, _ = seq
    state = odometry.init_state(cfg)
    fs = _features(cfg, scans[0], valids[0])
    state, _, _ = odometry.step(cfg, state, fs)
    state, pose, xi = odometry.step(cfg, state, fs)
    assert np.linalg.norm(np.asarray(xi)) < 0.01
    assert np.linalg.norm(np.asarray(pose)[:3, 3]) < 0.01


def test_odometry_insufficient_features():
    """Degenerate input (almost no points) falls back to the motion prior
    without NaNs (fA.cpp:1668,1677 minimum-count guards)."""
    cfg = tiny_test_config()
    state = odometry.init_state(cfg)
    n = cfg.lidar.max_points
    pts = jnp.zeros((n, 3), jnp.float32)
    mask = jnp.zeros((n,), bool)
    fs = _features(cfg, pts, mask)
    state, pose, xi = odometry.step(cfg, state, fs)
    state, pose, xi = odometry.step(cfg, state, fs)
    assert np.isfinite(np.asarray(pose)).all()
    np.testing.assert_allclose(np.asarray(xi), 0.0, atol=1e-6)
