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


def test_deskew_to_end_removes_rotation():
    """Sensor yaws during the scan: a point captured mid-scan must be
    rotated into the scan-END frame (stationary sensor, v_world=0)."""
    buf = imu.init_buffer(64)
    yaw_rate = 0.5   # rad/s
    for k in range(30):
        t = k * 0.01
        rpy = jnp.array([0.0, 0.0, yaw_rate * t])
        buf = imu.push(buf, jnp.float32(t), rpy,
                       jnp.array([0.0, 0.0, 9.81]), jnp.zeros(3))
    # One point seen at rel_time=0.5 of a 0.1s scan starting at t=0.1:
    # true world point p_w; sensor frame at capture = yaw(0.15).
    p_world = np.array([10.0, 0.0, 0.0], np.float32)
    t_cap = 0.1 + 0.5 * 0.1
    yaw_cap = yaw_rate * t_cap
    c, s = np.cos(yaw_cap), np.sin(yaw_cap)
    Rcap = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    p_sensor = Rcap.T @ p_world
    out = imu.deskew_to_end(buf, jnp.asarray(p_sensor[None]),
                            jnp.asarray([0.5], jnp.float32),
                            jnp.float32(0.1), 0.1, jnp.zeros(3))
    # Expected: point in the scan-END frame (yaw at t=0.2).
    yaw1 = yaw_rate * 0.2
    c1, s1 = np.cos(yaw1), np.sin(yaw1)
    R1 = np.array([[c1, -s1, 0], [s1, c1, 0], [0, 0, 1]], np.float32)
    expect = R1.T @ p_world
    np.testing.assert_allclose(np.asarray(out)[0], expect, atol=0.02)


def test_deskew_to_end_translation_via_velocity_estimate():
    """Constant-velocity translation: the IMU deviation term is zero, so
    the caller's v_world estimate must carry the whole correction."""
    buf = imu.init_buffer(64)
    v = np.array([5.0, 0.0, 0.0], np.float32)   # m/s along +x
    for k in range(30):
        t = k * 0.01
        # Attitude flat, accel = gravity only (constant velocity).
        buf = imu.push(buf, jnp.float32(t), jnp.zeros(3),
                       jnp.array([0.0, 0.0, 9.81]), jnp.zeros(3))
    # Point captured at rel_time=0.25 of the scan [0.1, 0.2): the sensor
    # sits 0.75*0.1*v BEHIND its end pose, so the point appears that far
    # ahead relative to the end frame.
    p_world = np.array([10.0, 3.0, 1.0], np.float32)
    t_cap = 0.1 + 0.25 * 0.1
    sensor_pos = v * t_cap
    p_sensor = p_world - sensor_pos
    out = imu.deskew_to_end(buf, jnp.asarray(p_sensor[None]),
                            jnp.asarray([0.25], jnp.float32),
                            jnp.float32(0.1), 0.1, jnp.asarray(v))
    expect = p_world - v * 0.2                   # end frame at t=0.2
    np.testing.assert_allclose(np.asarray(out)[0], expect, atol=1e-3)
