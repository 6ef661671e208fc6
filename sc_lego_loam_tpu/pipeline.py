"""The full SLAM engine: host-side orchestration of the jitted stages.

The reference runs four OS processes wired by ROS topics with
timestamp-matching gates (SURVEY.md par.1); here each stage is a pure jitted
function and the "topic graph" is function composition inside one process
per host.  The host loop only makes scheduling decisions (mapping cadence,
keyframe/loop bookkeeping) — all math runs on device:

  raw scan -> frontend.run -> features -> odometry.step      (every scan)
           -> scan-to-map + keyframe insert                  (>= 0.3 s apart,
                                                              utility.h:109)
           -> SC/RS loop detect + ICP verify + pose-graph    (every
              re-solve + correctPoses                         check_every
                                                              keyframes)
           -> fused pose out                                  (every scan)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import frontend, fusion, loop, mapping, odometry, posegraph
from .config import PipelineConfig
from .models import scan_context
from .ops import features as features_op
from .ops import voxel
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
def _perception_step(config: PipelineConfig, points, mask, odo_state):
    """Fused per-scan device step: frontend -> features -> odometry.
    One dispatch per scan; XLA schedules the whole graph."""
    fo = frontend.run(config, points, mask)
    fs, out_pts, out_mask = _extract(config, fo.cloud, fo.outlier)
    new_state, odom_pose, xi = odometry.step(config, odo_state, fs)
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


class SlamEngine:
    """Single-sequence SLAM (BASELINE.json configs 1-3)."""

    def __init__(self, config: PipelineConfig):
        self.config = config
        self.odo = odometry.init_state(config)
        self.map = mapping.init_state(config)
        self.bank = scan_context.init_bank(config)
        self.loops = posegraph.init_loops(config)
        self.last_map_time = -1e9
        self.last_kf_odom = jnp.eye(4, dtype=jnp.float32)
        self.kf_since_check = 0
        self.n_loops_closed = 0
        self.trajectory = []       # host record: (t, fused pose np (4,4))
        self.timer = StageTimer()  # per-stage wall clock (SURVEY.md par.5)
        # Submap cache: rebuilt only when the keyframe set (or its poses,
        # after a loop closure) changes — the reference's incremental
        # radius-search cache plays the same role (mO.cpp:1167-1222).
        self._submap = None
        self._submap_key = -1

    # ------------------------------------------------------------------ #

    def process_scan(self, points, mask, t: float):
        """Feed one scan (padded (N,3) + mask). Returns fused pose (4,4)."""
        cfg = self.config
        points = jnp.asarray(points, jnp.float32)
        mask = jnp.asarray(mask, bool)

        with self.timer.stage("perception"):
            self.odo, odom_pose, _, out_pts, out_mask = _perception_step(
                cfg, points, mask, self.odo)
            jax.block_until_ready(odom_pose)

        if t - self.last_map_time >= cfg.mapping.process_interval:
            with self.timer.stage("mapping"):
                self._mapping_tick(points, mask, odom_pose, out_pts,
                                   out_mask, t)
            self.last_map_time = t

        fused = fusion.fuse(self.map.correction, odom_pose)
        self.trajectory.append((t, np.asarray(fused)))
        return fused

    # ------------------------------------------------------------------ #

    def _mapping_tick(self, points, mask, odom_pose, out_pts, out_mask, t):
        cfg = self.config
        st = self.map

        c, cm, s, sm, o, om = mapping.downsample_scan(
            cfg, self.odo.corner_last.xyz, self.odo.corner_last.mask,
            self.odo.surf_last.xyz, self.odo.surf_last.mask,
            out_pts, out_mask)

        T_guess = st.correction @ odom_pose
        key = int(st.kf.count) + (self.n_loops_closed << 32)
        if self._submap is None or self._submap_key != key:
            self._submap = _build_submap(cfg, st.kf)
            self._submap_key = key
        sub_c, sub_cm, sub_s, sub_sm = self._submap
        surf_q = jnp.concatenate([s, o])
        surf_qm = jnp.concatenate([sm, om])
        pose = mapping.scan_to_map(cfg, T_guess, c, cm, surf_q, surf_qm,
                                   sub_c, sub_cm, sub_s, sub_sm)
        correction = pose @ se3.mat_inv(odom_pose)
        self.map = st._replace(pose=pose, correction=correction)

        if bool(mapping.should_insert_keyframe(cfg, self.map, pose)):
            kf = mapping.insert_keyframe(
                cfg, self.map.kf, pose, jnp.float32(t),
                c, cm, s, sm, o, om)
            desc = _sc_input(cfg, points, mask)
            self.bank = scan_context.append(self.bank, desc,
                                            cfg.cap.max_keyframes)
            self.map = self.map._replace(kf=kf, last_kf_pose=pose)
            self.last_kf_odom = odom_pose
            self.kf_since_check += 1

            if (cfg.loop.enabled and
                    self.kf_since_check >= cfg.loop.check_every_keyframes):
                self.kf_since_check = 0
                self._loop_closure_tick(desc)

    # ------------------------------------------------------------------ #

    def _loop_closure_tick(self, cur_desc):
        """1 Hz loop-closure thread analog (mO.cpp:829-839)."""
        cfg = self.config
        kf = self.map.kf
        cur_idx = int(kf.count) - 1

        closed = False
        # Scan Context path (mO.cpp:914-949,1053-1093); the SC yaw seeds
        # the verification ICP so reverse loops close too.
        sc_idx, sc_dist, sc_yaw = scan_context.detect(cfg, self.bank,
                                                      cur_desc)
        sc_idx = int(sc_idx)
        if sc_idx >= 0:
            place = se3.pose6_to_mat(kf.poses6[sc_idx])
            Z, fit, ok = loop.verify(cfg, kf, jnp.int32(cur_idx),
                                     jnp.int32(sc_idx), place,
                                     yaw_init=sc_yaw)
            if bool(ok):
                self.loops = posegraph.add_loop(
                    self.loops, jnp.int32(cur_idx), jnp.int32(sc_idx), Z)
                closed = True

        # Radius-search path (mO.cpp:854-873,1005-1048).
        rs_idx = int(loop.detect_radius(cfg, kf, jnp.int32(cur_idx)))
        if rs_idx >= 0 and rs_idx != sc_idx:
            place = se3.pose6_to_mat(kf.poses6[cur_idx])
            Z, fit, ok = loop.verify(cfg, kf, jnp.int32(cur_idx),
                                     jnp.int32(rs_idx), place)
            if bool(ok):
                self.loops = posegraph.add_loop(
                    self.loops, jnp.int32(cur_idx), jnp.int32(rs_idx), Z)
                closed = True

        if closed:
            self._correct_poses()

    def _correct_poses(self):
        """Pose-graph re-solve + correctPoses (mO.cpp:1642-1664)."""
        cfg = self.config
        kf = self.map.kf
        new_poses = posegraph.solve(cfg, kf.poses6, kf.count, kf.odom_z,
                                    self.loops)
        kf = kf._replace(poses6=new_poses)
        last = jnp.maximum(kf.count - 1, 0)
        new_pose = se3.pose6_to_mat(kf.poses6[last])
        correction = new_pose @ se3.mat_inv(self.last_kf_odom)
        self.map = self.map._replace(
            kf=kf, pose=new_pose, correction=correction,
            last_kf_pose=new_pose)
        self.n_loops_closed += 1

    # ------------------------------------------------------------------ #

    def trajectory_array(self):
        """(N,4,4) fused trajectory so far."""
        return np.stack([p for _, p in self.trajectory])
