"""IMU fusion wired into the engine (reference C7 integration:
fA.cpp:1639-1664 initial guess, mO.cpp:484-517 roll/pitch blend,
fA.cpp:491-619 de-skew)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu import imu
from sc_lego_loam_tpu.config import tiny_test_config, ImuConfig
from sc_lego_loam_tpu.pipeline import SlamEngine
from sc_lego_loam_tpu.utils import evaluate, se3, synthetic

N = 30


def _rpy_of(T):
    yaw, pitch, roll = se3.mat_to_euler_zyx(jnp.asarray(T[:3, :3]))
    return np.array([float(roll), float(pitch), float(yaw)], np.float32)


@pytest.fixture(scope="module")
def seq():
    cfg = tiny_test_config()
    return synthetic.make_sequence(
        cfg.lidar, N, trajectory="figure8", radius=12.0, loops=0.4,
        noise=0.01, seed=9, shuffle=not cfg.lidar.ordered)


def _run(with_imu, seq):
    scans, valids, gt = seq
    cfg = tiny_test_config()
    cfg = cfg.replace(imu=ImuConfig(enabled=with_imu, deskew=False))
    eng = SlamEngine(cfg)
    for i in range(N):
        t = i * 0.1
        if with_imu:
            # Synthetic IMU from ground truth: exact attitude samples at
            # 2x scan rate (acc/gyro only feed the dead-reckoned shift,
            # which the prior intentionally does not trust).
            for dt in (0.0, 0.05):
                j = min(i, N - 1)
                eng.push_imu(t + dt, _rpy_of(gt[j]), np.zeros(3),
                             np.zeros(3))
        eng.process_scan(scans[i], valids[i], t=t)
    est = eng.trajectory_array()
    return evaluate.ate_rmse(est, gt[:len(est)]), est


def test_imu_prior_no_worse_and_finite(seq):
    ate_imu, est = _run(True, seq)
    ate_raw, _ = _run(False, seq)
    assert np.isfinite(est).all()
    # With exact-attitude IMU the turning trajectory must not get worse.
    assert ate_imu <= ate_raw * 1.5 + 0.05, (ate_imu, ate_raw)


def test_motion_prior_matches_analytic_rotation():
    """motion_prior recovers a pure yaw rate from attitude samples."""
    buf = imu.init_buffer(64)
    rate = 0.3   # rad/s
    for k in range(20):
        t = k * 0.02
        buf = imu.push(buf, jnp.float32(t),
                       jnp.asarray([0.0, 0.0, rate * t], jnp.float32),
                       jnp.zeros(3), jnp.asarray([0, 0, rate], jnp.float32))
    xi = np.asarray(imu.motion_prior(buf, jnp.float32(0.1),
                                     jnp.float32(0.3)))
    np.testing.assert_allclose(xi[2], rate * 0.2, atol=1e-3)
    np.testing.assert_allclose(xi[:2], 0.0, atol=1e-4)


def test_rpy_at_interpolates():
    buf = imu.init_buffer(32)
    for k in range(10):
        buf = imu.push(buf, jnp.float32(k * 0.1),
                       jnp.asarray([0.01 * k, -0.02 * k, 0.0], jnp.float32),
                       jnp.zeros(3), jnp.zeros(3))
    rpy = np.asarray(imu.rpy_at(buf, jnp.float32(0.45)))
    np.testing.assert_allclose(rpy[0], 0.045, atol=1e-4)
    np.testing.assert_allclose(rpy[1], -0.09, atol=1e-4)
