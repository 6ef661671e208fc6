import jax.numpy as jnp
import numpy as np

from sc_lego_loam_tpu import imu


def test_push_integrates_constant_velocity():
    """Constant world velocity, zero rotation: shift accumulates linearly."""
    buf = imu.init_buffer(32)
    # Body at rest orientation; acceleration = gravity only (so world acc=0).
    rpy = jnp.zeros(3)
    acc = jnp.array([0.0, 0.0, 9.81])
    gyro = jnp.zeros(3)
    for k in range(10):
        buf = imu.push(buf, jnp.float32(k * 0.01), rpy, acc, gyro)
    # zero world acceleration -> velocity stays 0, shift stays 0.
    np.testing.assert_allclose(np.asarray(buf.velo[9]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(buf.shift[9]), 0.0, atol=1e-6)


def test_push_integrates_acceleration():
    buf = imu.init_buffer(64)
    rpy = jnp.zeros(3)
    acc = jnp.array([1.0, 0.0, 9.81])   # 1 m/s^2 forward
    gyro = jnp.zeros(3)
    n, dt = 20, 0.01
    for k in range(n):
        buf = imu.push(buf, jnp.float32(k * dt), rpy, acc, gyro)
    t = (n - 1) * dt
    i = (n - 1) % 64
    np.testing.assert_allclose(float(buf.velo[i][0]), t, atol=1e-3)
    np.testing.assert_allclose(float(buf.shift[i][0]), 0.5 * t * t, atol=1e-3)


def test_deskew_removes_rotation():
    """Sensor yaws during the scan: points captured late must be rotated
    back into the scan-start frame."""
    buf = imu.init_buffer(64)
    yaw_rate = 0.5   # rad/s
    for k in range(30):
        t = k * 0.01
        rpy = jnp.array([0.0, 0.0, yaw_rate * t])
        buf = imu.push(buf, jnp.float32(t), rpy,
                       jnp.array([0.0, 0.0, 9.81]), jnp.zeros(3))
    # One point seen at rel_time=0.5 of a 0.1s scan starting at t=0.1:
    # true world point p_w; sensor frame at capture = yaw(0.15*0.5).
    p_world = np.array([10.0, 0.0, 0.0], np.float32)
    t_cap = 0.1 + 0.5 * 0.1
    yaw_cap = yaw_rate * t_cap
    c, s = np.cos(yaw_cap), np.sin(yaw_cap)
    Rcap = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    p_sensor = Rcap.T @ p_world
    out = imu.deskew(buf, jnp.asarray(p_sensor[None]),
                     jnp.asarray([0.5], jnp.float32), jnp.float32(0.1))
    # Expected: point in the scan-START frame (yaw at t=0.1).
    yaw0 = yaw_rate * 0.1
    c0, s0 = np.cos(yaw0), np.sin(yaw0)
    R0 = np.array([[c0, -s0, 0], [s0, c0, 0], [0, 0, 1]], np.float32)
    expect = R0.T @ p_world
    np.testing.assert_allclose(np.asarray(out)[0], expect, atol=0.02)
