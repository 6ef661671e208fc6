"""Loop detection & verification (reference C17: mapOptmization.cpp:829-1110).

Two detectors, as in the reference:
- RS: radius search over key poses (20 m, >=30 s time gap, oldest wins,
  mO.cpp:854-873) — here a masked argmin over the pose bank;
- SC: Scan Context retrieval (models/scan_context.py).

Verification: ICP of the current keyframe cloud against a +-history_num
keyframe submap (mO.cpp:896-949), accepted if fitness < 1.5 (utility.h:139).
The resulting between-factor measurement is the geometrically exact
Z = (dT @ X_place)^-1 @ X_cand, where X_place is the pose the query cloud
was expressed at (the current estimate for RS; the candidate pose for SC,
mO.cpp:926-929) and dT the ICP correction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import posegraph
from .config import PipelineConfig
from .mapping import KeyframeStore
from .models import scan_context
from .ops import icp, voxel
from .utils import se3

_BIG = 1e18   # python float (module-level jnp constants poison the stream)


@functools.partial(jax.jit, static_argnums=0)
def detect_radius(config: PipelineConfig, kf: KeyframeStore,
                  cur_idx: jnp.ndarray):
    """Nearest keyframe within rs_search_radius and >= rs_time_gap older.
    Returns index or -1.

    The reference's radius search returns candidates distance-sorted and
    takes the first one meeting the time gap, i.e. the NEAREST
    (mapOptmization.cpp:854-873) — handing ICP the easiest candidate."""
    lcfg = config.loop
    cur_pos = kf.poses6[cur_idx, 3:6]
    cur_time = kf.times[cur_idx]
    K = kf.poses6.shape[0]
    ids = jnp.arange(K)
    d = jnp.linalg.norm(kf.poses6[:, 3:6] - cur_pos, axis=-1)
    ok = (ids < kf.count) & (d < lcfg.rs_search_radius) & \
         (cur_time - kf.times >= lcfg.rs_time_gap)
    best = jnp.argmin(jnp.where(ok, d, jnp.inf))
    return jnp.where(ok[best], best, -1)


@functools.partial(jax.jit, static_argnums=0)
def history_submap(config: PipelineConfig, kf: KeyframeStore,
                   center: jnp.ndarray):
    """World-frame submap of +-history_num keyframes around ``center``,
    voxel-downsampled (mO.cpp:896-903, leaf history_leaf).
    Returns (pts (history_pad,3), mask)."""
    cap, lcfg = config.cap, config.loop
    n = 2 * lcfg.history_num + 1
    idx = center + jnp.arange(-lcfg.history_num, lcfg.history_num + 1)
    ok = (idx >= 0) & (idx < kf.count)
    idx = jnp.clip(idx, 0, cap.max_keyframes - 1)
    poses = se3.pose6_to_mat(kf.poses6[idx])

    def world(pts, mask):
        out = (poses[:, None, :3, :3] @ pts[..., None])[..., 0] \
            + poses[:, None, :3, 3]
        return out.reshape(-1, 3), (mask & ok[:, None]).reshape(-1)

    c, cm = world(kf.corner[idx], kf.corner_mask[idx])
    s, sm = world(kf.surf[idx], kf.surf_mask[idx])
    o, om = world(kf.outlier[idx], kf.outlier_mask[idx])
    pts = jnp.concatenate([c, s, o])
    mask = jnp.concatenate([cm, sm, om])
    out, omask = voxel.voxel_decimate(pts, mask, lcfg.history_leaf,
                                      cap.history_pad)
    return out, omask


@functools.partial(jax.jit, static_argnums=0)
def keyframe_cloud(config: PipelineConfig, kf: KeyframeStore,
                   idx: jnp.ndarray, place_pose: jnp.ndarray):
    """Corner+surf cloud of keyframe ``idx`` expressed at ``place_pose``
    (mO.cpp:880-894/926-929). Returns (pts (icp_query_pad,3), mask)."""
    cap = config.cap
    c = kf.corner[idx]
    s = kf.surf[idx]
    pts = jnp.concatenate([c, s])[:cap.icp_query_pad]
    mask = jnp.concatenate([kf.corner_mask[idx],
                            kf.surf_mask[idx]])[:cap.icp_query_pad]
    out = se3.transform_points(place_pose, pts[None])[0]
    return jnp.where(mask[:, None], out, 0.0), mask


@functools.partial(jax.jit, static_argnums=0)
def verify(config: PipelineConfig, kf: KeyframeStore,
           cur_idx: jnp.ndarray, cand_idx: jnp.ndarray,
           place_pose: jnp.ndarray, yaw_init: jnp.ndarray | None = None):
    """ICP-verify a loop hypothesis. Returns (Z (4,4), fitness, accept).

    ``yaw_init``: relative yaw from Scan Context retrieval.  The reference
    leaves its ICP-with-initial-guess path disabled, so its reverse loops
    go unverified (README.md:39, mO.cpp:1062-1068); seeding the ICP with
    the SC yaw enables reverse-loop closure (BASELINE.json config 3)."""
    src, src_mask = keyframe_cloud(config, kf, cur_idx, place_pose)
    dst, dst_mask = history_submap(config, kf, cand_idx)
    if yaw_init is not None:
        # Scene yawed by +yaw => sensor yawed by -yaw; conjugate into the
        # world frame around the placement pose.
        phi = -yaw_init
        Rz = se3.rt_to_mat(
            se3.euler_zyx_to_mat(phi, jnp.float32(0), jnp.float32(0)),
            jnp.zeros(3))
        T0 = place_pose @ Rz @ se3.mat_inv(place_pose)
    else:
        T0 = jnp.eye(4, dtype=jnp.float32)
    dT, fitness, inliers = icp.align(config, src, src_mask, dst, dst_mask,
                                     T0=T0)
    x_cand = se3.pose6_to_mat(kf.poses6[cand_idx])
    x_true = dT @ place_pose
    Z = se3.mat_inv(x_true) @ x_cand
    # Three gates (the reference has only the first, utility.h:139 — its
    # measured loop precision is ~0.69):
    # 1. mean-square fitness; 2. overlap (ops/icp.align inlier_ratio);
    # 3. orientation plausibility — the factor's implied ROTATION vs the
    #    current graph must be within accumulated-heading-drift range
    #    (LoopClosureConfig.max_rot_residual; kills aliased matches
    #    between self-similar places that ICP aligns at a structurally
    #    wrong yaw).
    x_cur = se3.pose6_to_mat(kf.poses6[cur_idx])
    r = se3.se3_log(se3.mat_inv(Z) @ se3.mat_inv(x_cur) @ x_cand)
    rot_ok = jnp.linalg.norm(r[:3]) <= config.loop.max_rot_residual
    accept = (fitness < config.loop.fitness_threshold) & \
             (inliers >= config.loop.min_inlier_ratio) & rot_ok
    return Z, fitness, accept


def device_tick(config: PipelineConfig, kf: KeyframeStore,
                bank, loops, cur_desc: jnp.ndarray):
    """One full loop-closure tick, entirely on device (the reference's 1 Hz
    loopClosureThread, mO.cpp:829-839, as pure compiled control flow —
    detection, ICP verification, factor insertion, and the pose-graph
    re-solve all live under lax.cond so a non-loop tick costs nothing and
    the host never synchronizes).

    Returns (kf, loops, closed: bool scalar) with kf.poses6 rewritten from
    the pose-graph solution when a loop was accepted (correctPoses,
    mO.cpp:1642-1664)."""
    cur = jnp.maximum(kf.count - 1, 0)

    # Scan Context path (mO.cpp:914-949,1053-1093); the SC yaw seeds the
    # verification ICP so reverse loops close too.
    sc_idx, sc_dist, sc_yaw = scan_context.detect(config, bank, cur_desc)

    def sc_verify(loops):
        idx = jnp.maximum(sc_idx, 0)
        place = se3.pose6_to_mat(kf.poses6[idx])
        Z, fit, ok = verify(config, kf, cur, idx, place, yaw_init=sc_yaw)
        new = posegraph.add_loop(loops, cur, idx, Z, kf.poses6)
        loops = jax.tree.map(lambda a, b: jnp.where(ok, b, a), loops, new)
        return loops, ok

    loops, sc_ok = jax.lax.cond(
        sc_idx >= 0, sc_verify, lambda l: (l, jnp.bool_(False)), loops)

    # Radius-search path (mO.cpp:854-873,1005-1048).
    rs_idx = detect_radius(config, kf, cur)

    def rs_verify(loops):
        idx = jnp.maximum(rs_idx, 0)
        place = se3.pose6_to_mat(kf.poses6[cur])
        Z, fit, ok = verify(config, kf, cur, idx, place)
        new = posegraph.add_loop(loops, cur, idx, Z, kf.poses6)
        loops = jax.tree.map(lambda a, b: jnp.where(ok, b, a), loops, new)
        return loops, ok

    loops, rs_ok = jax.lax.cond(
        (rs_idx >= 0) & (rs_idx != sc_idx),
        rs_verify, lambda l: (l, jnp.bool_(False)), loops)

    closed = sc_ok | rs_ok

    # Re-solve under cond, producing ONLY the (K,6) pose array — never the
    # whole keyframe store: XLA conditionals copy branch-written buffers,
    # and the cloud banks are ~700 MB (see pipeline.py).
    new_poses = jax.lax.cond(
        closed,
        lambda: posegraph.solve(config, kf.poses6, kf.count, kf.odom_z,
                                loops),
        lambda: kf.poses6)
    return kf._replace(poses6=new_poses), loops, closed
