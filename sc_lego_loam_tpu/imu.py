"""IMU integration & de-skew support (reference C7:
featureAssociation.cpp:327-619).

The reference keeps a 200-entry circular IMU buffer (utility.h:113), dead-
reckons gravity-compensated shift/velocity (AccumulateIMUShiftAndRotation,
fA.cpp:392-429), and de-skews each point by interpolating orientation /
shift to its intra-scan timestamp (ShiftToStartIMU / TransformToStartIMU,
fA.cpp:327-390,525-618).

TPU-native formulation: the buffer is a fixed-shape pytree; integration is
a lax.scan over samples; per-point de-skew is one vectorized gather + lerp
against the integrated trajectory (no per-point branching).  MulRan runs
are lidar-only (utility.h:91), so the pipeline treats this as optional —
when no IMU samples are present the constant-velocity model in
odometry.step applies instead.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .utils import se3

QUE_LEN = 200   # utility.h:113 imuQueLength


class ImuBuffer(NamedTuple):
    """Circular buffer of IMU samples (fixed capacity)."""

    time: jnp.ndarray      # (Q,) seconds
    rpy: jnp.ndarray       # (Q,3) roll,pitch,yaw (world orientation)
    acc: jnp.ndarray       # (Q,3) body-frame linear acceleration (m/s^2)
    gyro: jnp.ndarray      # (Q,3) body angular velocity (rad/s)
    # Dead-reckoned trajectory (AccumulateIMUShiftAndRotation analog):
    shift: jnp.ndarray     # (Q,3) world position
    velo: jnp.ndarray      # (Q,3) world velocity
    count: jnp.ndarray     # () int32 total samples seen (head = count % Q)


def init_buffer(que_len: int = QUE_LEN) -> ImuBuffer:
    z = jnp.zeros((que_len, 3), jnp.float32)
    return ImuBuffer(time=jnp.full((que_len,), -1e18, jnp.float32),
                     rpy=z, acc=z, gyro=z, shift=z, velo=z,
                     count=jnp.int32(0))


def world_acceleration(rpy, acc_raw, g: float = 9.81):
    """Rotate body acceleration to world and remove gravity
    (fA.cpp:438-440 does this with hand-expanded trig; here one matmul)."""
    R = se3.euler_zyx_to_mat(rpy[..., 2], rpy[..., 1], rpy[..., 0])
    acc_w = (R @ acc_raw[..., None])[..., 0]
    return acc_w - jnp.array([0.0, 0.0, g], jnp.float32)


_world_acc = world_acceleration


@jax.jit
def push_many(buf: ImuBuffer, ts, rpys, accs, gyros, valid) -> ImuBuffer:
    """Insert a PADDED batch of samples in one dispatch (a per-sample
    jitted push costs one host->device dispatch each — at 10-20 samples
    per scan that would double the per-scan dispatch count; the batch is
    one lax.scan).  ``valid`` masks the padding: invalid rows leave the
    buffer untouched.

    The gravity compensation (a 3x3 matvec) is hoisted OUT of the scan
    and batched: a scan whose body contains a dot_general permanently
    degrades all subsequent dispatches on this runtime (see
    odometry._stage_loop); the scanned dead-reckoning is elementwise."""
    acc_ws = _world_acc(rpys, accs)                    # (P,3), outside scan

    def body(b, x):
        t, r, a, g, aw, ok = x
        nb = _push_precomp(b, t, r, a, g, aw)
        return jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                            nb, b), None

    out, _ = jax.lax.scan(body, buf,
                          (ts, rpys, accs, gyros, acc_ws, valid))
    return out


def _push(buf: ImuBuffer, t, rpy, acc_raw, gyro) -> ImuBuffer:
    """Insert one sample and dead-reckon shift/velocity from the previous
    entry (fA.cpp:392-429): x += v dt + 1/2 a dt^2, v += a dt."""
    return _push_precomp(buf, t, rpy, acc_raw, gyro,
                         _world_acc(rpy, acc_raw))


def _push_precomp(buf: ImuBuffer, t, rpy, acc_raw, gyro,
                  acc_w) -> ImuBuffer:
    """_push with the world acceleration supplied by the caller (so
    push_many can batch the matvec outside its scan)."""
    Q = buf.time.shape[0]
    i = buf.count % Q
    prev = (buf.count - 1) % Q
    dt = t - buf.time[prev]
    fresh = (buf.count > 0) & (dt < 0.1) & (dt > 0)   # scanPeriod guard
    shift = jnp.where(
        fresh, buf.shift[prev] + buf.velo[prev] * dt + 0.5 * acc_w * dt * dt,
        buf.shift[prev] * 0.0)
    velo = jnp.where(fresh, buf.velo[prev] + acc_w * dt, jnp.zeros(3))
    return buf._replace(
        time=buf.time.at[i].set(t),
        rpy=buf.rpy.at[i].set(rpy),
        acc=buf.acc.at[i].set(acc_raw),
        gyro=buf.gyro.at[i].set(gyro),
        shift=buf.shift.at[i].set(shift),
        velo=buf.velo.at[i].set(velo),
        count=buf.count + 1,
    )


push = jax.jit(_push)


def _interp(buf: ImuBuffer, ts: jnp.ndarray):
    """Linear interpolation of (rpy, shift, velo) at query times ts (N,).

    The circular buffer is time-sorted within its valid window; we find the
    bracketing samples with a masked searchsorted over the unrolled order.
    """
    Q = buf.time.shape[0]
    # Unroll so times are ascending: order = (head, head+1, ..., head-1).
    head = buf.count % Q
    order = (jnp.arange(Q) + head) % Q
    times = buf.time[order]
    valid = times > -1e17
    # searchsorted over the valid ascending suffix.
    tq = ts[:, None]
    le = (times[None, :] <= tq) & valid[None, :]
    # Invalid (empty) slots carry time -1e18 and sort to the front of the
    # unrolled order; offset indices past them.
    n_invalid = (~valid).sum()
    i0 = jnp.clip(n_invalid + le.sum(-1) - 1, 0, Q - 1)  # last sample <= t
    i1 = jnp.minimum(i0 + 1, Q - 1)
    t0 = times[i0]
    t1 = times[i1]
    w = jnp.where(t1 > t0, (ts - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0)
    w = jnp.clip(w, 0.0, 1.0)[:, None]

    def lerp(a):
        a = a[order]
        return a[i0] * (1 - w) + a[i1] * w

    return lerp(buf.rpy), lerp(buf.shift), lerp(buf.velo)


@jax.jit
def deskew_to_end(buf: ImuBuffer, points: jnp.ndarray, rel_time: jnp.ndarray,
                  scan_start: jnp.ndarray, scan_period: float,
                  v_world: jnp.ndarray):
    """Full IMU de-skew into the scan-END frame.  The caller then marks the
    cloud instantaneous (rel_time := 1), so the odometry's motion-
    interpolated exp(s*xi) degenerates to the plain relative transform —
    the skew is removed HERE, once, instead of being re-estimated by the
    solver every iteration.

    Composition of the correction, per point captured at time t:
    - rotation: R_end^T R_t from the interpolated IMU attitude (absolute
      and drift-bounded — the part the reference also trusts outright,
      TransformToStartIMU fA.cpp:365-390);
    - translation: dev(t) + v_world (t - t_end), where dev is the IMU
      dead-reckoned deviation from constant velocity ((shift_t - shift_e)
      - velo_e (t - t_e), the initial-velocity-INDEPENDENT observable the
      reference isolates in ShiftToStartIMU, fA.cpp:327-345) and v_world
      is the engine's own velocity estimate (previous solved scan motion)
      supplying the constant-velocity part the IMU alone cannot observe.
      The reference instead leaves the constant-velocity part in the
      cloud for the solver's s-interpolation to handle; folding the
      engine velocity in here keeps the output cloud FULLY de-skewed so
      downstream stages see one consistent frame.

    points: (N,3) sensor frame; rel_time: (N,) in [0,1); scan_start: ()
    absolute scan start; v_world: (3,) world-frame velocity estimate.
    Returns corrected points (N,3) in the scan-end sensor frame.
    """
    ts = scan_start + rel_time * scan_period
    te = scan_start + scan_period
    rpy_t, shift_t, _ = _interp(buf, ts)
    rpy_e, shift_e, velo_e = _interp(buf, jnp.reshape(te, (1,)))
    dt = (ts - te)[:, None]                               # (N,1), <= 0
    dev = shift_t - shift_e[0] - velo_e[0] * dt
    rel = dev + v_world[None, :] * dt                     # pos(t) - pos(te)
    R_t = se3.euler_zyx_to_mat(rpy_t[:, 2], rpy_t[:, 1], rpy_t[:, 0])
    R_e = se3.euler_zyx_to_mat(rpy_e[0, 2], rpy_e[0, 1], rpy_e[0, 0])
    p_w = (R_t @ points[..., None])[..., 0] + rel
    return p_w @ R_e          # row-vector form of R_e^T p_w


def shift_from_start(buf: ImuBuffer, scan_start, scan_end):
    """Accumulated IMU translation across one scan (the odometry prior the
    reference feeds into updateInitialGuess, fA.cpp:1639-1664)."""
    _, sh, _ = _interp(buf, jnp.stack([scan_start, scan_end]))
    return sh[1] - sh[0]


def motion_prior(buf: ImuBuffer, scan_start, scan_end):
    """Dead-reckoned sensor motion over one scan as an se(3) twist — the
    scan-to-scan initial guess (updateInitialGuess, fA.cpp:1639-1664)."""
    rpy, sh, _ = _interp(buf, jnp.stack([scan_start, scan_end]))
    R0 = se3.euler_zyx_to_mat(rpy[0, 2], rpy[0, 1], rpy[0, 0])
    R1 = se3.euler_zyx_to_mat(rpy[1, 2], rpy[1, 1], rpy[1, 0])
    R_rel = R0.T @ R1
    v = R0.T @ (sh[1] - sh[0])
    return se3.se3_log(se3.rt_to_mat(R_rel, v))


def rpy_at(buf: ImuBuffer, t):
    """World roll/pitch/yaw interpolated at time t (the transformUpdate
    blend input, mO.cpp:484-517)."""
    rpy, _, _ = _interp(buf, jnp.reshape(t, (1,)))
    return rpy[0]
