"""The full SLAM engine: three compiled device dispatches, zero host syncs.

The reference runs four OS processes wired by ROS topics with
timestamp-matching gates (SURVEY.md par.1).  Here the topic graph becomes
THREE jitted functions over device-resident state, mirroring the
reference's process split but asynchronously dispatched to one device
queue:

  perception_step   every scan      frontend -> features -> odometry ->
                                    fused pose -> trajectory ring buffer
                                    (imageProjection + featureAssociation +
                                     transformFusion)
  mapping_step      >= 0.3 s apart  submap gather -> scan-to-map LM ->
                                    keyframe + descriptor insert
                                    (mapOptmization::run, utility.h:109)
  loop_step         every Nth       SC/RS detect -> ICP verify -> pose
                    mapping tick    graph re-solve -> correctPoses
                                    (loopClosureThread, mO.cpp:829-839)

Why three dispatches instead of one fused step with `lax.cond` branches
(the round-3 design): the keyframe/descriptor banks are ~700 MB, and XLA
conditionals cannot alias donated buffers that a branch writes — every
mapping-gated `cond` over the whole engine state paid full-bank HBM copies
(~39 ms measured overhead per mapping scan vs ~16 ms of actual stage
compute).  With the split, every bank update is an UNCONDITIONAL
dynamic-update-slice on a donated buffer (in-place); the only `cond`s left
gate small arrays (poses, loop factors).  The keyframe decision
(mO.cpp:1531-1538) happens on device as a guarded slot write: the
candidate keyframe is always written at slot `count` (invisible — every
reader masks by `< count`) and `should_insert` merely bumps the count.

Why a host-visible correction with one-scan lag is correct: the reference
publishes the mapping correction asynchronously too — transformFusion
(transformFusion.cpp:181-216) re-applies the LATEST received
/aft_mapped_to_init to each 10 Hz odometry pose, which is exactly "the
correction from the previous mapping tick".

Host-side responsibilities are scheduling-only (the mapping cadence and
the loop cadence are wall-clock gates in the reference); every numeric
decision runs on device.  A host<->device synchronization costs ~25 ms on
this runtime while an async dispatch costs <0.5 ms, so the host never
reads device values in the hot loop; the trajectory is fetched once at the
end of a run.
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
    """Feature extraction + outlier-list compaction (jitted).  The sparse
    pick sets are skipped when the dense-query odometry never reads them
    (see features.extract)."""
    fs = features_op.extract(
        cloud, config.feat, config.cap,
        sparse_picks=not (config.odom.joint_6dof
                          and config.odom.dense_queries))
    # Outlier grid -> padded list (adjustOutlierCloud analog,
    # fA.cpp:1746-1757 just forwards it at 5 Hz).  rel_time rides along so
    # the mapping path can de-skew outliers with the solved twist — the
    # reference forwards them RAW-SKEWED into the map (its mapping-side
    # surf targets inherit up to a full scan's motion of distortion).
    from .ops.compact import compact_indices
    idx, ok = compact_indices(outlier_grid.valid.reshape(-1),
                              config.cap.outlier_pad)
    out_pts = jnp.where(ok[:, None],
                        outlier_grid.xyz.reshape(-1, 3)[idx], 0.0)
    out_rel = jnp.where(ok, outlier_grid.rel_time.reshape(-1)[idx], 0.0)
    return fs, out_pts, out_rel, ok


def _pre_deskew(config: PipelineConfig, fo, odo_state, imu_buf=None,
                t=None):
    """De-skew the frontend's segmented cloud AND outlier grid into the
    scan-END frame, once per scan, before features/odometry/mapping see
    them (the adjustDistortion slot, fA.cpp:491-619 — but into one
    consistent frame; see odometry._apply for why de-skew lives here and
    not inside the solver).

    Lidar-only: constant-twist prediction from the previous solved motion
    (odometry.deskew_with_twist).  With IMU enabled and samples buffered:
    imu.deskew_to_end (attitude + deviation translation).  rel_time is
    set to 1 — the cloud is instantaneous-at-end from here on."""
    cfg = config
    use_ct = cfg.odom.deskew
    use_imu = cfg.imu.enabled and cfg.imu.deskew
    if not (use_ct or use_imu):
        return fo
    xi0 = odo_state.motion
    if use_imu:
        imu_ok = imu_buf.count > 1
        v_world = (odo_state.pose[:3, :3] @ odo_state.motion[3:]) \
            / cfg.lidar.scan_period

    def ds(grid_xyz, grid_rel, grid_valid):
        flat = grid_xyz.reshape(-1, 3)
        rel = grid_rel.reshape(-1)
        pts = odometry.deskew_with_twist(xi0, flat, rel) if use_ct else flat
        if use_imu:
            pts_imu = imu_mod.deskew_to_end(
                imu_buf, flat, rel, t, cfg.lidar.scan_period, v_world)
            pts = jnp.where(imu_ok, pts_imu, pts)
        xyz = pts.reshape(grid_xyz.shape)
        return (jnp.where(grid_valid[..., None], xyz, 0.0),
                jnp.where(grid_valid, jnp.ones_like(grid_rel), 0.0))

    cloud, outl = fo.cloud, fo.outlier
    c_xyz, c_rel = ds(cloud.xyz, cloud.rel_time, cloud.valid)
    o_xyz, o_rel = ds(outl.xyz, outl.rel_time, outl.valid)
    return fo._replace(
        cloud=cloud._replace(xyz=c_xyz, rel_time=c_rel),
        outlier=outl._replace(xyz=o_xyz, rel_time=o_rel))


def _odo_perception(config: PipelineConfig, points, mask, odo_state):
    """Frontend -> features -> odometry, no trajectory bookkeeping — the
    vmappable core shared with parallel.batch.  Returns
    (new_odo_state, odom_pose, out_pts, out_mask)."""
    fo = frontend.run(config, points, mask)
    fo = _pre_deskew(config, fo, odo_state)
    fs, out_pts, out_rel, out_mask = _extract(config, fo.cloud, fo.outlier)
    odo, odom_pose, _ = odometry.step(config, odo_state, fs)
    return odo, odom_pose, out_pts, out_mask


class PerceptionState(NamedTuple):
    """Device state of the every-scan path (reference processes 1, 2, 4)."""

    odo: odometry.OdometryState
    imu: imu_mod.ImuBuffer
    # Fused-pose trajectory ring buffer (the /integrated_to_init stream).
    traj: jnp.ndarray          # (max_scans, 4, 4)
    # Raw odometry poses per scan: with the keyframe store's odom anchors
    # these let trajectory_array() retro-correct the whole history through
    # the post-loop-closure pose graph at export time (the reference's
    # exported trajectory IS the corrected key-pose path, mO.cpp:756-781).
    odom_traj: jnp.ndarray     # (max_scans, 4, 4)
    traj_t: jnp.ndarray        # (max_scans,)
    scan_i: jnp.ndarray        # () int32


class MapperState(NamedTuple):
    """Device state of the mapping/backend path (reference process 3)."""

    kf: mapping.KeyframeStore
    bank: scan_context.DescriptorBank
    loops: posegraph.LoopFactors
    correction: jnp.ndarray    # (4,4) map-from-odom drift correction
    pose: jnp.ndarray          # (4,4) latest mapped pose
    last_kf_pose: jnp.ndarray  # (4,4) pose at last keyframe insertion
    last_kf_odom: jnp.ndarray  # (4,4) odometry pose at last keyframe
    loops_closed: jnp.ndarray  # () int32 — total accepted loop factors
    kf_dropped: jnp.ndarray    # () int32 — keyframes dropped at full bank


def init_perception_state(config: PipelineConfig) -> PerceptionState:
    cap = config.cap
    state = PerceptionState(
        odo=odometry.init_state(config),
        imu=imu_mod.init_buffer(config.imu.que_len),
        traj=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                              (cap.max_scans, 4, 4)).copy(),
        odom_traj=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                   (cap.max_scans, 4, 4)).copy(),
        traj_t=jnp.zeros((cap.max_scans,), jnp.float32),
        scan_i=jnp.int32(0),
    )
    # The step donates this state; XLA rejects aliased buffers in a donated
    # pytree (jnp constants like eye(4) are cached and shared), so give
    # every leaf its own buffer.
    return jax.tree.map(jnp.copy, state)


def init_mapper_state(config: PipelineConfig) -> MapperState:
    eye = jnp.eye(4, dtype=jnp.float32)
    kf0 = mapping.init_state(config)
    state = MapperState(
        kf=kf0.kf,
        bank=scan_context.init_bank(config),
        loops=posegraph.init_loops(config),
        correction=eye,
        pose=eye,
        last_kf_pose=kf0.last_kf_pose,
        last_kf_odom=eye,
        loops_closed=jnp.int32(0),
        kf_dropped=jnp.int32(0),
    )
    return jax.tree.map(jnp.copy, state)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def perception_step(config: PipelineConfig, state: PerceptionState,
                    correction, points, mask, t):
    """Per-scan device step: frontend -> features -> odometry -> fusion.
    One dispatch per scan; XLA schedules the whole graph.

    Returns (state, odom_pose, out_pts, out_mask, fused_pose)."""
    cfg = config
    fo = frontend.run(cfg, points, mask)
    fo = _pre_deskew(cfg, fo, state.odo, state.imu, t)
    fs, out_pts, out_rel, out_mask = _extract(cfg, fo.cloud, fo.outlier)
    if cfg.imu.enabled and cfg.imu.prior:
        # IMU initial guess (updateInitialGuess, fA.cpp:1639-1664): the
        # orientation delta is trusted (attitude is drift-bounded); the
        # dead-reckoned translation depends on an unobservable initial
        # velocity, so translation keeps the constant-velocity prior.
        xi_imu = imu_mod.motion_prior(state.imu, t,
                                      t + cfg.lidar.scan_period)
        ok = (state.imu.count > 1) & jnp.isfinite(xi_imu).all()
        xi_prior = jnp.where(
            ok,
            jnp.concatenate([xi_imu[:3], state.odo.motion[3:]]),
            state.odo.motion)
    else:
        xi_prior = None
    odo, odom_pose, _ = odometry.step(cfg, state.odo, fs, xi_prior)

    # High-rate fusion (transformFusion.cpp:94-179): one matrix multiply
    # with the latest mapping correction (one mapping tick stale, exactly
    # like the reference's async /aft_mapped_to_init re-application).
    fused = correction @ odom_pose
    i = jnp.minimum(state.scan_i, cfg.cap.max_scans - 1)
    state = PerceptionState(
        odo=odo, imu=state.imu,
        traj=state.traj.at[i].set(fused),
        odom_traj=state.odom_traj.at[i].set(odom_pose),
        traj_t=state.traj_t.at[i].set(t),
        scan_i=state.scan_i + 1)
    return state, odom_pose, out_pts, out_mask, fused


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def mapping_step(config: PipelineConfig, mst: MapperState,
                 corner_xyz, corner_mask, surf_xyz, surf_mask,
                 out_pts, out_mask, odom_pose, points, mask, t, imu_buf):
    """One mapping tick (reference run(), mO.cpp:1673-1708):
    submap -> scan-to-map LM -> correction -> guarded keyframe insert.

    No `lax.cond` anywhere: the submap is rebuilt every tick (the
    reference's extractSurroundingKeyFrames also runs per tick and the
    keyframe cadence is ~1 insert/tick at the 0.3 m / 0.3 s rules), and
    the insert is an unconditional slot write whose visibility is the
    count bump."""
    cfg = config

    # Submap from the CURRENT keyframe poses — built at tick start as in
    # the reference, so a loop correction from loop_step is picked up
    # immediately (correctPoses -> next tick's extractSurroundingKeyFrames).
    sub_c, sub_cm, sub_s, sub_sm = mapping.build_submap(cfg, mst.kf)

    c, cm, s, sm, o, om = mapping.downsample_scan(
        cfg, corner_xyz, corner_mask, surf_xyz, surf_mask,
        out_pts, out_mask)

    T_guess = mst.correction @ odom_pose
    surf_q = jnp.concatenate([s, o])
    surf_qm = jnp.concatenate([sm, om])
    pose = mapping.scan_to_map(cfg, T_guess, c, cm, surf_q, surf_qm,
                               sub_c, sub_cm, sub_s, sub_sm)
    if cfg.imu.enabled:
        # transformUpdate (mO.cpp:484-517): blend a sliver of the IMU
        # roll/pitch into the mapped pose to bound long-horizon tilt drift.
        rpy_i = imu_mod.rpy_at(imu_buf, t)
        p6 = se3.mat_to_pose6(pose)
        b = cfg.imu.blend
        p6b = p6.at[0].set((1 - b) * p6[0] + b * rpy_i[0])
        p6b = p6b.at[1].set((1 - b) * p6[1] + b * rpy_i[1])
        pose = jnp.where(imu_buf.count > 1, se3.pose6_to_mat(p6b), pose)
    correction = pose @ se3.mat_inv(odom_pose)

    # Keyframe decision (mO.cpp:1531-1538) + guarded insert.
    should = mapping.should_insert_keyframe(cfg, mst.last_kf_pose, pose)
    kf, inserted = mapping.insert_keyframe(
        cfg, mst.kf, should, pose, t, c, cm, s, sm, o, om,
        odom_pose=odom_pose)
    desc = scan_context.make_descriptor(points, mask, cfg.sc)
    bank = scan_context.append(mst.bank, desc, cfg.cap.max_keyframes,
                               should)

    return MapperState(
        kf=kf, bank=bank, loops=mst.loops,
        correction=correction, pose=pose,
        last_kf_pose=jnp.where(inserted, pose, mst.last_kf_pose),
        last_kf_odom=jnp.where(inserted, odom_pose, mst.last_kf_odom),
        loops_closed=mst.loops_closed,
        kf_dropped=mst.kf_dropped + (should & ~inserted))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def loop_step(config: PipelineConfig, mst: MapperState) -> MapperState:
    """One loop-closure tick (loopClosureThread analog, mO.cpp:829-839):
    SC + RS detection, ICP verification, factor insertion, pose-graph
    re-solve and correctPoses — all on device.  The `lax.cond`s inside
    gate only small arrays (poses6, loop factors); the big keyframe cloud
    banks are read-only here, so nothing large is copied."""
    cfg = config
    kf = mst.kf
    cur = jnp.maximum(kf.count - 1, 0)
    kf, loops, closed = loop.device_tick(
        cfg, kf, mst.bank, mst.loops, mst.bank.desc[cur])

    def apply_correction(ops):
        """correctPoses (mO.cpp:1642-1664): rewrite pose/correction from
        the re-solved graph."""
        _pose, _corr, _lkp, _n = ops
        new_pose = se3.pose6_to_mat(kf.poses6[cur])
        corr = new_pose @ se3.mat_inv(mst.last_kf_odom)
        return new_pose, corr, new_pose, _n + 1

    pose, correction, last_kf_pose, loops_closed = jax.lax.cond(
        closed, apply_correction, lambda ops: ops,
        (mst.pose, mst.correction, mst.last_kf_pose, mst.loops_closed))

    return MapperState(
        kf=kf, bank=mst.bank, loops=loops,
        correction=correction, pose=pose,
        last_kf_pose=last_kf_pose, last_kf_odom=mst.last_kf_odom,
        loops_closed=loops_closed, kf_dropped=mst.kf_dropped)


def _shard_mapper_state(mst: MapperState, mesh) -> MapperState:
    """Shard the trajectory-length-proportional banks over the 'kf' axis;
    everything else stays replicated (small, or updated every scan)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    kf = mst.kf
    kf = kf._replace(
        corner=put(kf.corner, P("kf")),
        corner_mask=put(kf.corner_mask, P("kf")),
        surf=put(kf.surf, P("kf")),
        surf_mask=put(kf.surf_mask, P("kf")),
        outlier=put(kf.outlier, P("kf")),
        outlier_mask=put(kf.outlier_mask, P("kf")),
    )
    bank = mst.bank._replace(
        desc=put(mst.bank.desc, P("kf")),
        ringkey=put(mst.bank.ringkey, P("kf")),
    )
    return mst._replace(kf=kf, bank=bank)


class SlamEngine:
    """Single-sequence SLAM (BASELINE.json configs 1-3).

    Host-side responsibilities are scheduling-only: the mapping-cadence
    and loop-cadence gates and feeding scans.  `process_scan` performs no
    host sync — the returned pose is a lazy device array;
    `trajectory_array()` fetches the whole run with one sync.

    ``mesh``: optional Mesh with a 'kf' axis.  The keyframe cloud banks
    and the Scan Context descriptor bank — the memory that grows with
    trajectory length — are sharded over it (`jax.device_put` +
    NamedSharding); the jitted mapping/loop steps then run SPMD with
    XLA-inserted collectives for the submap gathers and the retrieval
    matmul (keyframe-bank scale-out, SURVEY.md par.5 "long-context" row).
    """

    def __init__(self, config: PipelineConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        self.p = init_perception_state(config)
        self.m = init_mapper_state(config)
        if mesh is not None:
            self.m = _shard_mapper_state(self.m, mesh)
        self._correction = jnp.eye(4, dtype=jnp.float32)
        self.last_map_time = -1e9
        self.map_ticks = 0
        self.timer = StageTimer()  # per-stage wall clock (SURVEY.md par.5)
        self._scans_fed = 0
        self._warned_kf_cap = False
        self._warned_loop_cap = False

    # ------------------------------------------------------------------ #
    # Device-state views (kept for the export/checkpoint API and tests).

    @property
    def odo(self):
        return self.p.odo

    @odo.setter
    def odo(self, v):
        self.p = self.p._replace(odo=jax.tree.map(jnp.copy, v))

    @property
    def map(self):
        return mapping.MapState(
            kf=self.m.kf, correction=self.m.correction, pose=self.m.pose,
            last_kf_pose=self.m.last_kf_pose)

    @map.setter
    def map(self, v: mapping.MapState):
        self.m = self.m._replace(
            kf=jax.tree.map(jnp.copy, v.kf),
            correction=jnp.copy(v.correction), pose=jnp.copy(v.pose),
            last_kf_pose=jnp.copy(v.last_kf_pose))
        self._correction = self.m.correction

    @property
    def bank(self):
        return self.m.bank

    @bank.setter
    def bank(self, v):
        self.m = self.m._replace(bank=jax.tree.map(jnp.copy, v))

    @property
    def loops(self):
        return self.m.loops

    @loops.setter
    def loops(self, v):
        self.m = self.m._replace(loops=jax.tree.map(jnp.copy, v))

    @property
    def loops_closed(self):
        return self.m.loops_closed

    # ------------------------------------------------------------------ #

    def push_imu(self, t: float, rpy, acc, gyro):
        """Feed one IMU sample (imuHandler, fA.cpp:431-489): world-frame
        roll/pitch/yaw, body linear acceleration (m/s^2, gravity included),
        body angular rate (rad/s).  Push all samples with timestamps up to
        a scan's end before feeding that scan."""
        self.p = self.p._replace(imu=imu_mod.push(
            self.p.imu, jnp.float32(t),
            jnp.asarray(rpy, jnp.float32), jnp.asarray(acc, jnp.float32),
            jnp.asarray(gyro, jnp.float32)))

    # Fixed pad so per-scan IMU batches share one compiled push_many.
    IMU_BATCH_PAD = 32

    def push_imu_batch(self, times, rpy, acc, gyro):
        """Feed up to IMU_BATCH_PAD samples in ONE device dispatch (a
        per-sample push costs a dispatch each — more than the whole
        perception step at typical 100-200 Hz IMU rates)."""
        import numpy as np_
        m = len(times)
        P = self.IMU_BATCH_PAD
        assert m <= P, f"feed at most {P} samples per call, got {m}"
        ts = np_.zeros((P,), np_.float32)
        vec = np_.zeros((3, P, 3), np_.float32)
        ts[:m] = times
        vec[0, :m] = rpy
        vec[1, :m] = acc
        vec[2, :m] = gyro
        ok = np_.arange(P) < m
        self.p = self.p._replace(imu=imu_mod.push_many(
            self.p.imu, jnp.asarray(ts), jnp.asarray(vec[0]),
            jnp.asarray(vec[1]), jnp.asarray(vec[2]), jnp.asarray(ok)))

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

        with self.timer.stage("perception"):
            self.p, odom_pose, out_pts, out_mask, fused = perception_step(
                cfg, self.p, self._correction, points, mask, jnp.float32(t))

        if t - self.last_map_time >= cfg.mapping.process_interval:
            self.last_map_time = t
            with self.timer.stage("mapping"):
                self.m = mapping_step(
                    cfg, self.m,
                    self.p.odo.corner_last.xyz, self.p.odo.corner_last.mask,
                    self.p.odo.surf_last.xyz, self.p.odo.surf_last.mask,
                    out_pts, out_mask, odom_pose, points, mask,
                    jnp.float32(t), self.p.imu)
                self._correction = self.m.correction
            self.map_ticks += 1
            # Loop-closure cadence: every Nth mapping tick (the reference's
            # 1 Hz thread vs its ~3.3 Hz mapping = every ~3rd tick).
            if cfg.loop.enabled and \
                    self.map_ticks % cfg.loop.check_every_ticks == 0:
                with self.timer.stage("loop"):
                    self.m = loop_step(cfg, self.m)
                    self._correction = self.m.correction

        # Cap monitoring WITHOUT device reads: process_scan performs ZERO
        # host<->device transfers, ever — on this runtime the first
        # transfer permanently degrades every subsequent dispatch ~14-40x
        # (PERF.md), so even a rare counter fetch would cost more than it
        # warns about.  The host-side tick counters BOUND the device
        # counters (keyframe inserts <= mapping ticks; loop factors <= 2
        # per loop tick), so overflow risk is detectable transfer-free
        # within one mapping tick; the exact device counters are reported
        # by trajectory_array()/_check_caps() after the run.
        if not (self._warned_kf_cap and self._warned_loop_cap):
            self._check_caps_host_bound()
        return fused

    def _check_caps_host_bound(self):
        """Warn from host-side tick counters alone (no transfers): fires
        within one mapping tick of the earliest possible overflow."""
        import warnings
        cfg = self.config
        if not self._warned_kf_cap and \
                self.map_ticks >= cfg.cap.max_keyframes:
            warnings.warn(
                f"keyframe bank may be full ({cfg.cap.max_keyframes}): "
                f"{self.map_ticks} mapping ticks elapsed; new keyframes "
                "past the cap are dropped.  Exact dropped count is "
                "reported at trajectory_array() (a mid-run fetch would "
                "degrade the dispatch stream); raise "
                "CapacityConfig.max_keyframes", RuntimeWarning)
            self._warned_kf_cap = True
        loop_ticks = self.map_ticks // max(cfg.loop.check_every_ticks, 1)
        if not self._warned_loop_cap and \
                2 * loop_ticks > cfg.posegraph.max_loops:
            warnings.warn(
                f"loop-factor bank may be full "
                f"({cfg.posegraph.max_loops}): lowest-information factors "
                "are overwritten past the cap; raise "
                "PoseGraphConfig.max_loops", RuntimeWarning)
            self._warned_loop_cap = True

    def _check_caps(self):
        """Fetch the cap counters (one device transfer — run-ending on
        this runtime, see process_scan) and warn exactly."""
        self._warned_kf_cap = False
        self._warned_loop_cap = False
        self._check_cap_values(int(self.m.kf_dropped),
                               int(self.m.loops.count))

    def _check_cap_values(self, kf_dropped: int, loops_count: int):
        """Warn (once each) when the keyframe bank or loop-factor bank hit
        capacity.  Policy past the cap: new KEYFRAMES are dropped (the map
        stops growing; odometry and correction continue); new LOOP factors
        overwrite the highest-residual factor (posegraph.add_loop)."""
        import warnings
        if not self._warned_kf_cap and kf_dropped > 0:
            warnings.warn(
                f"keyframe bank full ({self.config.cap.max_keyframes}): "
                f"{kf_dropped} keyframes dropped so far; raise "
                "CapacityConfig.max_keyframes", RuntimeWarning)
            self._warned_kf_cap = True
        if not self._warned_loop_cap and \
                loops_count > self.config.posegraph.max_loops:
            warnings.warn(
                f"loop-factor bank full ({self.config.posegraph.max_loops}):"
                " lowest-information loop factors are being overwritten; "
                "raise PoseGraphConfig.max_loops", RuntimeWarning)
            self._warned_loop_cap = True

    # ------------------------------------------------------------------ #

    def trajectory_array(self, retro_correct: bool = True):
        """(N,4,4) trajectory so far (one device sync; on this runtime the
        first transfer also ends fast dispatch — export is end-of-run).

        ``retro_correct=True`` re-expresses every scan through the
        CURRENT (post-loop-closure) keyframe graph: scan i anchored at
        the last keyframe k at-or-before it becomes
        X_k_corrected @ odom_k^-1 @ odom_i.  This is the reference's
        export semantics — its saved trajectory is the iSAM-corrected
        key-pose path (correctPoses + mO.cpp:756-781) — where the raw
        fused stream keeps whatever drift each pose was published with.
        ``False`` returns the as-published fused stream
        (/integrated_to_init parity)."""
        n = int(self.p.scan_i)
        self._check_caps()
        fused = np.asarray(self.p.traj[:n])
        if not retro_correct or n == 0:
            return fused
        kf_n = int(self.m.kf.count)
        if kf_n == 0:
            return fused
        kf_t = np.asarray(self.m.kf.times[:kf_n])
        kf_pose = np.asarray(
            se3.pose6_to_mat(self.m.kf.poses6[:kf_n]))
        kf_odom = np.asarray(self.m.kf.odom_pose[:kf_n])
        odom = np.asarray(self.p.odom_traj[:n])
        t = np.asarray(self.p.traj_t[:n])
        k = np.searchsorted(kf_t, t + 1e-6) - 1          # last kf <= t_i
        out = fused.copy()
        ok = k >= 0
        ki = np.clip(k, 0, kf_n - 1)
        anchor = kf_pose[ki] @ np.linalg.inv(kf_odom[ki])
        out[ok] = (anchor[ok] @ odom[ok])
        return out

    def trajectory_times(self):
        n = int(self.p.scan_i)
        return np.asarray(self.p.traj_t[:n])
