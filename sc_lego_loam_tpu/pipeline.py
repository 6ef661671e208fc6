"""The full SLAM engine: one compiled device step per scan, zero host syncs.

The reference runs four OS processes wired by ROS topics with
timestamp-matching gates (SURVEY.md par.1).  Here the whole topic graph is
ONE jitted function over device-resident state:

  raw scan -> frontend.run -> features -> odometry.step      (every scan)
           -> [cond] scan-to-map + keyframe insert            (>= 0.3 s apart,
                                                               utility.h:109)
           -> [cond] SC/RS loop detect + ICP verify +         (every
              pose-graph re-solve + correctPoses               check_every
                                                               keyframes)
           -> fused pose -> device trajectory ring buffer     (every scan)

Why this shape: on this runtime a host<->device synchronization costs
~25 ms while an async dispatch costs <0.5 ms, so ANY per-scan host readback
(a `bool()` keyframe decision, a `np.asarray(pose)` trajectory append)
dominates the frame budget.  Every decision the reference makes on the CPU
between its nodes (keyframe-or-not, loop-or-not, correctPoses) therefore
runs under `lax.cond` on device; the host only chooses the mapping cadence
(it knows the scan timestamps) and fetches the trajectory once at the end.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import frontend, imu as imu_mod, loop, mapping, odometry, posegraph
from .config import PipelineConfig
from .models import scan_context
from .ops import features as features_op
from .utils import se3
from .utils.profiling import StageTimer


@functools.partial(jax.jit, static_argnums=0)
def _extract(config: PipelineConfig, cloud, outlier_grid):
    """Feature extraction + outlier-list compaction (jitted)."""
    fs = features_op.extract(cloud, config.feat, config.cap)
    # Outlier grid -> padded list (adjustOutlierCloud analog,
    # fA.cpp:1746-1757 just forwards it at 5 Hz).
    from .ops.compact import compact
    out_pts, ok = compact(outlier_grid.xyz.reshape(-1, 3),
                          outlier_grid.valid.reshape(-1),
                          config.cap.outlier_pad)
    return fs, out_pts, ok


@functools.partial(jax.jit, static_argnums=0)
def _perception_step(config: PipelineConfig, points, mask, odo_state,
                     imu_buf=None, t=None):
    """Fused per-scan device step: frontend -> features -> odometry.
    One dispatch per scan; XLA schedules the whole graph."""
    cfg = config
    fo = frontend.run(cfg, points, mask)
    if cfg.imu.enabled and cfg.imu.deskew and imu_buf is not None:
        # IMU point de-skew on the segmented cloud (adjustDistortion,
        # fA.cpp:491-619) — applied before feature extraction, as in the
        # reference; no-op until the buffer holds samples.
        cloud = fo.cloud
        shp = cloud.xyz.shape
        pts_d = imu_mod.deskew(
            imu_buf, cloud.xyz.reshape(-1, 3), cloud.rel_time.reshape(-1),
            t, cfg.lidar.scan_period)
        xyz = jnp.where(imu_buf.count > 1, pts_d.reshape(shp), cloud.xyz)
        fo = fo._replace(cloud=cloud._replace(
            xyz=jnp.where(cloud.valid[..., None], xyz, 0.0)))
    fs, out_pts, out_mask = _extract(cfg, fo.cloud, fo.outlier)
    if cfg.imu.enabled and cfg.imu.prior and imu_buf is not None:
        # IMU initial guess (updateInitialGuess, fA.cpp:1639-1664): the
        # orientation delta is trusted (attitude is drift-bounded); the
        # dead-reckoned translation depends on an unobservable initial
        # velocity, so translation keeps the constant-velocity prior.
        xi_imu = imu_mod.motion_prior(imu_buf, t,
                                      t + cfg.lidar.scan_period)
        ok = (imu_buf.count > 1) & jnp.isfinite(xi_imu).all()
        xi_prior = jnp.where(
            ok,
            jnp.concatenate([xi_imu[:3], odo_state.motion[3:]]),
            odo_state.motion)
    else:
        xi_prior = None
    new_state, odom_pose, xi = odometry.step(cfg, odo_state, fs, xi_prior)
    return new_state, odom_pose, xi, out_pts, out_mask


@functools.partial(jax.jit, static_argnums=0)
def _sc_input(config: PipelineConfig, points, mask):
    """Scan Context descriptor from the raw cloud.

    The reference voxel-downsamples first (mO.cpp:263,1626-1634) purely as
    a CPU economy; the descriptor is a per-bin MAX, which downsampling can
    only lower (centroids sit below the true max).  Scatter-max over the
    raw cloud is both faster here and closer to the paper's definition."""
    return scan_context.make_descriptor(points, mask, config.sc)


@functools.partial(jax.jit, static_argnums=0)
def _build_submap(config: PipelineConfig, kf):
    return mapping.build_submap(config, kf)


class EngineState(NamedTuple):
    """Complete device-resident SLAM state (the analog of the combined
    mutable state of the reference's four nodes)."""

    odo: odometry.OdometryState
    map: mapping.MapState
    bank: scan_context.DescriptorBank
    loops: posegraph.LoopFactors
    imu: imu_mod.ImuBuffer
    # Cached world-frame submap (extractSurroundingKeyFrames analog,
    # mO.cpp:1122-1231) — rebuilt on keyframe insert / pose correction.
    sub_c: jnp.ndarray
    sub_cm: jnp.ndarray
    sub_s: jnp.ndarray
    sub_sm: jnp.ndarray
    # Fused-pose trajectory ring buffer (the /integrated_to_init stream).
    traj: jnp.ndarray          # (max_scans, 4, 4)
    traj_t: jnp.ndarray        # (max_scans,)
    scan_i: jnp.ndarray        # () int32
    kf_since_check: jnp.ndarray  # () int32 — loop-check cadence counter
    last_kf_odom: jnp.ndarray  # (4,4) odometry pose at last keyframe
    loops_closed: jnp.ndarray  # () int32 — total accepted loop factors


def init_engine_state(config: PipelineConfig) -> EngineState:
    cap = config.cap
    kf0 = mapping.init_state(config)
    sub = _build_submap(config, kf0.kf)
    state = EngineState(
        odo=odometry.init_state(config),
        map=kf0,
        bank=scan_context.init_bank(config),
        loops=posegraph.init_loops(config),
        imu=imu_mod.init_buffer(config.imu.que_len),
        sub_c=sub[0], sub_cm=sub[1], sub_s=sub[2], sub_sm=sub[3],
        traj=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                              (cap.max_scans, 4, 4)).copy(),
        traj_t=jnp.zeros((cap.max_scans,), jnp.float32),
        scan_i=jnp.int32(0),
        kf_since_check=jnp.int32(0),
        last_kf_odom=jnp.eye(4, dtype=jnp.float32),
        loops_closed=jnp.int32(0),
    )
    # engine_step donates the state; XLA rejects aliased buffers in a
    # donated pytree (jnp constants like eye(4) are cached and shared), so
    # give every leaf its own buffer.
    return jax.tree.map(jnp.copy, state)


def _mapping_tick(config: PipelineConfig, st: EngineState, points, mask,
                  odom_pose, out_pts, out_mask, t) -> EngineState:
    """Scan-to-map refinement + keyframe/loop logic (reference run(),
    mO.cpp:1673-1708), all under device control flow."""
    cfg = config

    c, cm, s, sm, o, om = mapping.downsample_scan(
        cfg, st.odo.corner_last.xyz, st.odo.corner_last.mask,
        st.odo.surf_last.xyz, st.odo.surf_last.mask,
        out_pts, out_mask)

    T_guess = st.map.correction @ odom_pose
    surf_q = jnp.concatenate([s, o])
    surf_qm = jnp.concatenate([sm, om])
    pose = mapping.scan_to_map(cfg, T_guess, c, cm, surf_q, surf_qm,
                               st.sub_c, st.sub_cm, st.sub_s, st.sub_sm)
    if cfg.imu.enabled:
        # transformUpdate (mO.cpp:484-517): blend a sliver of the IMU
        # roll/pitch into the mapped pose to bound long-horizon tilt drift.
        rpy_i = imu_mod.rpy_at(st.imu, t)
        p6 = se3.mat_to_pose6(pose)
        b = cfg.imu.blend
        p6b = p6.at[0].set((1 - b) * p6[0] + b * rpy_i[0])
        p6b = p6b.at[1].set((1 - b) * p6[1] + b * rpy_i[1])
        pose = jnp.where(st.imu.count > 1, se3.pose6_to_mat(p6b), pose)
    correction = pose @ se3.mat_inv(odom_pose)
    st = st._replace(map=st.map._replace(pose=pose, correction=correction))

    def insert(st: EngineState) -> EngineState:
        kf = mapping.insert_keyframe(
            cfg, st.map.kf, pose, t, c, cm, s, sm, o, om)
        desc = scan_context.make_descriptor(points, mask, cfg.sc)
        bank = scan_context.append(st.bank, desc, cfg.cap.max_keyframes)
        sub = mapping.build_submap(cfg, kf)
        return st._replace(
            map=st.map._replace(kf=kf, last_kf_pose=pose),
            bank=bank,
            sub_c=sub[0], sub_cm=sub[1], sub_s=sub[2], sub_sm=sub[3],
            kf_since_check=st.kf_since_check + 1,
            last_kf_odom=odom_pose)

    st = jax.lax.cond(
        mapping.should_insert_keyframe(cfg, st.map, pose),
        insert, lambda s: s, st)

    if cfg.loop.enabled:
        def loop_tick(st: EngineState) -> EngineState:
            """1 Hz loop-closure thread analog (mO.cpp:829-839)."""
            kf = st.map.kf
            cur = jnp.maximum(kf.count - 1, 0)
            kf, loops, closed = loop.device_tick(
                cfg, kf, st.bank, st.loops, st.bank.desc[cur])

            def apply_correction(st: EngineState) -> EngineState:
                """correctPoses (mO.cpp:1642-1664): rewrite pose/correction
                from the re-solved graph and rebuild the submap."""
                new_pose = se3.pose6_to_mat(kf.poses6[cur])
                corr = new_pose @ se3.mat_inv(st.last_kf_odom)
                sub = mapping.build_submap(cfg, kf)
                return st._replace(
                    map=st.map._replace(pose=new_pose, correction=corr,
                                        last_kf_pose=new_pose),
                    sub_c=sub[0], sub_cm=sub[1], sub_s=sub[2], sub_sm=sub[3],
                    loops_closed=st.loops_closed + 1)

            st = st._replace(map=st.map._replace(kf=kf), loops=loops,
                             kf_since_check=jnp.int32(0))
            return jax.lax.cond(closed, apply_correction, lambda s: s, st)

        st = jax.lax.cond(
            st.kf_since_check >= cfg.loop.check_every_keyframes,
            loop_tick, lambda s: s, st)
    return st


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def engine_step(config: PipelineConfig, state: EngineState,
                points, mask, t, do_mapping):
    """One scan through the whole engine. Returns (state, fused_pose).

    ``do_mapping`` (bool scalar) is the host-chosen mapping cadence — the
    host knows the scan timestamps, so the >=0.3 s gate (utility.h:109)
    stays host-side; everything else is device control flow."""
    cfg = config
    odo, odom_pose, _, out_pts, out_mask = _perception_step(
        cfg, points, mask, state.odo, state.imu, t)
    state = state._replace(odo=odo)

    state = jax.lax.cond(
        do_mapping,
        lambda st: _mapping_tick(cfg, st, points, mask, odom_pose,
                                 out_pts, out_mask, t),
        lambda st: st, state)

    # High-rate fusion (transformFusion.cpp:94-179): one matrix multiply.
    fused = state.map.correction @ odom_pose
    i = jnp.minimum(state.scan_i, cfg.cap.max_scans - 1)
    state = state._replace(
        traj=state.traj.at[i].set(fused),
        traj_t=state.traj_t.at[i].set(t),
        scan_i=state.scan_i + 1)
    return state, fused


def _shard_state(state: EngineState, mesh) -> EngineState:
    """Shard the trajectory-length-proportional banks over the 'kf' axis;
    everything else stays replicated (small, or updated every scan)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    kf = state.map.kf
    kf = kf._replace(
        corner=put(kf.corner, P("kf")),
        corner_mask=put(kf.corner_mask, P("kf")),
        surf=put(kf.surf, P("kf")),
        surf_mask=put(kf.surf_mask, P("kf")),
        outlier=put(kf.outlier, P("kf")),
        outlier_mask=put(kf.outlier_mask, P("kf")),
    )
    bank = state.bank._replace(
        desc=put(state.bank.desc, P("kf")),
        ringkey=put(state.bank.ringkey, P("kf")),
    )
    return state._replace(map=state.map._replace(kf=kf), bank=bank)


class SlamEngine:
    """Single-sequence SLAM (BASELINE.json configs 1-3).

    Host-side responsibilities are scheduling-only: the mapping-cadence
    gate and feeding scans.  `process_scan` performs no host sync — the
    returned pose is a lazy device array; `trajectory_array()` fetches the
    whole run with one sync.

    ``mesh``: optional Mesh with a 'kf' axis.  The keyframe cloud banks and
    the Scan Context descriptor bank — the memory that grows with
    trajectory length — are sharded over it; the jitted engine step then
    runs SPMD with XLA-inserted collectives for the submap gathers and the
    retrieval matmul (keyframe-bank scale-out, SURVEY.md par.5
    "long-context" row)."""

    def __init__(self, config: PipelineConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        self.state = init_engine_state(config)
        if mesh is not None:
            self.state = _shard_state(self.state, mesh)
        self.last_map_time = -1e9
        self.timer = StageTimer()  # per-stage wall clock (SURVEY.md par.5)
        self._scans_fed = 0
        self._warned_kf_cap = False
        self._warned_loop_cap = False
        # Cap-overflow checks force a host sync (~ms on this runtime), so
        # they run on a cadence instead of per scan; the warning fires
        # within cap_check_every scans of the overflowing insert.
        self.cap_check_every = 256

    # ------------------------------------------------------------------ #
    # Device-state views (kept for the export/checkpoint API and tests).

    @property
    def odo(self):
        return self.state.odo

    @odo.setter
    def odo(self, v):
        self.state = self.state._replace(odo=jax.tree.map(jnp.copy, v))

    @property
    def map(self):
        return self.state.map

    @map.setter
    def map(self, v):
        self.state = self.state._replace(map=jax.tree.map(jnp.copy, v))
        sub = _build_submap(self.config, v.kf)
        self.state = self.state._replace(
            sub_c=sub[0], sub_cm=sub[1], sub_s=sub[2], sub_sm=sub[3])

    @property
    def bank(self):
        return self.state.bank

    @bank.setter
    def bank(self, v):
        self.state = self.state._replace(bank=jax.tree.map(jnp.copy, v))

    @property
    def loops(self):
        return self.state.loops

    @loops.setter
    def loops(self, v):
        self.state = self.state._replace(loops=jax.tree.map(jnp.copy, v))

    # ------------------------------------------------------------------ #

    def push_imu(self, t: float, rpy, acc, gyro):
        """Feed one IMU sample (imuHandler, fA.cpp:431-489): world-frame
        roll/pitch/yaw, body linear acceleration (m/s^2, gravity included),
        body angular rate (rad/s).  Push all samples with timestamps up to
        a scan's end before feeding that scan."""
        self.state = self.state._replace(imu=imu_mod.push(
            self.state.imu, jnp.float32(t),
            jnp.asarray(rpy, jnp.float32), jnp.asarray(acc, jnp.float32),
            jnp.asarray(gyro, jnp.float32)))

    def process_scan(self, points, mask, t: float):
        """Feed one scan (padded (N,3) + mask). Returns the fused pose as a
        lazy device array (no sync)."""
        cfg = self.config
        points = jnp.asarray(points, jnp.float32)
        mask = jnp.asarray(mask, bool)

        self._scans_fed += 1
        if self._scans_fed == cfg.cap.max_scans + 1:
            import warnings
            warnings.warn(
                f"trajectory ring buffer full ({cfg.cap.max_scans} scans): "
                "later poses overwrite the last slot; raise "
                "CapacityConfig.max_scans", RuntimeWarning)

        do_mapping = t - self.last_map_time >= cfg.mapping.process_interval
        if do_mapping:
            self.last_map_time = t

        with self.timer.stage("step"):
            self.state, fused = engine_step(
                cfg, self.state, points, mask, jnp.float32(t),
                jnp.bool_(do_mapping))
        if self._scans_fed % self.cap_check_every == 0:
            self._check_caps()
        return fused

    def _check_caps(self):
        """Warn (once each) when the keyframe bank or loop-factor bank hit
        capacity — past the cap new inserts overwrite the last slot."""
        import warnings
        if not self._warned_kf_cap and \
                int(self.state.map.kf.count) >= self.config.cap.max_keyframes:
            warnings.warn(
                f"keyframe bank full ({self.config.cap.max_keyframes}): new "
                "keyframes overwrite the last slot; raise "
                "CapacityConfig.max_keyframes", RuntimeWarning)
            self._warned_kf_cap = True
        if not self._warned_loop_cap and \
                int(self.state.loops.count) >= self.config.posegraph.max_loops:
            warnings.warn(
                f"loop-factor bank full ({self.config.posegraph.max_loops}): "
                "new loop factors overwrite the last slot; raise "
                "PoseGraphConfig.max_loops", RuntimeWarning)
            self._warned_loop_cap = True

    # ------------------------------------------------------------------ #

    def trajectory_array(self):
        """(N,4,4) fused trajectory so far (one device sync)."""
        n = int(self.state.scan_i)
        self._check_caps()
        return np.asarray(self.state.traj[:n])

    def trajectory_times(self):
        n = int(self.state.scan_i)
        return np.asarray(self.state.traj_t[:n])
