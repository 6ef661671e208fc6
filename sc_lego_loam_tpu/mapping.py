"""Scan-to-map refinement & keyframe store (reference L5 node,
mapOptmization.cpp — components C11, C12, C13 of SURVEY.md).

TPU-native design:
- Keyframe clouds live in preallocated (max_keyframes x pad) tensors with a
  high-water count (the reference grows std::vectors, mO.cpp:88-90); this is
  the bank that shards across hosts in the multi-chip config.
- The submap is the union of the ``submap_recent_num`` most recent
  keyframes' clouds transformed to the world frame and voxel-downsampled
  (loop-closure-ON path, mO.cpp:1127-1166) — a gather + one fused voxel DS.
- Scan-to-map is a 6-DOF Gauss-Newton over an se(3) twist around the
  current pose: per iteration, 5-NN in the submap (brute-force MXU tiles),
  line fit by 3x3 eigendecomposition for corners (mO.cpp:1265-1346), plane
  fit by 3x3 normal equations for surfs (mO.cpp:1348-1399), robust weights,
  degeneracy projection, early exit — unrolled cond-gated iterations
  (see odometry._stage_loop for why not lax.while_loop).
- The reference's Euler bookkeeping (transformAssociateToMap,
  mO.cpp:397-482) collapses to one matrix expression:
  guess = T_correction @ T_odom.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import PipelineConfig
from .ops import knn, pallas_knn, solver, voxel
from .utils import se3


def _make_knn5(submap, submap_mask, m):
    """5-NN closure ``knn5(q, qcnt)``: fused Pallas kernel on TPU (with the
    loop-invariant target prep hoisted; ``qcnt`` = valid-query prefix count
    for query-side tile skipping), XLA tiles elsewhere.  SCLOAM_NO_PALLAS=1
    forces the exact XLA path (A/B debugging)."""
    import os
    if jax.default_backend() == "tpu" and \
            os.environ.get("SCLOAM_NO_PALLAS", "0") != "1":
        prep = pallas_knn.prepare_targets(submap, submap_mask)
        return lambda q, qcnt=None: pallas_knn.knn_pallas_prepared(
            q, prep, k=m.knn, max_sq_dist=4.0 * m.max_nn_sq_dist, qcnt=qcnt)
    return lambda q, qcnt=None: knn.knn(q, submap, submap_mask, m.knn)

_BIG = 1e18   # python float (module-level jnp constants poison the stream)


class KeyframeStore(NamedTuple):
    """Fixed-capacity keyframe bank (C12)."""

    poses6: jnp.ndarray        # (K,6) (roll,pitch,yaw,x,y,z) world poses
    times: jnp.ndarray         # (K,) scan timestamps (s)
    corner: jnp.ndarray        # (K,Ckf,3) sensor-frame corner clouds
    corner_mask: jnp.ndarray   # (K,Ckf)
    surf: jnp.ndarray          # (K,Skf,3)
    surf_mask: jnp.ndarray
    outlier: jnp.ndarray       # (K,Okf,3)
    outlier_mask: jnp.ndarray
    odom_z: jnp.ndarray        # (K,4,4) pose-graph odometry factors:
                               # odom_z[k] = X_{k-1}^-1 X_k at insertion
                               # (k>=1); odom_z[0] = prior pose of node 0
    odom_pose: jnp.ndarray     # (K,4,4) raw ODOMETRY pose at insertion —
                               # anchors export-time retro-correction of
                               # the per-scan trajectory after loop
                               # closures (pipeline.trajectory_array)
    count: jnp.ndarray         # () int32 high-water


class MapState(NamedTuple):
    kf: KeyframeStore
    correction: jnp.ndarray    # (4,4) map-from-odom drift correction
    pose: jnp.ndarray          # (4,4) latest mapped pose
    last_kf_pose: jnp.ndarray  # (4,4) pose at last keyframe insertion


def init_state(config: PipelineConfig) -> MapState:
    cap = config.cap
    K = cap.max_keyframes
    kf = KeyframeStore(
        poses6=jnp.zeros((K, 6), jnp.float32),
        times=jnp.zeros((K,), jnp.float32),
        corner=jnp.zeros((K, cap.kf_corner_pad, 3), jnp.float32),
        corner_mask=jnp.zeros((K, cap.kf_corner_pad), bool),
        surf=jnp.zeros((K, cap.kf_surf_pad, 3), jnp.float32),
        surf_mask=jnp.zeros((K, cap.kf_surf_pad), bool),
        outlier=jnp.zeros((K, cap.kf_outlier_pad, 3), jnp.float32),
        outlier_mask=jnp.zeros((K, cap.kf_outlier_pad), bool),
        odom_z=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                (K, 4, 4)).copy(),
        odom_pose=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                   (K, 4, 4)).copy(),
        count=jnp.int32(0),
    )
    eye = jnp.eye(4, dtype=jnp.float32)
    # last_kf_pose starts far away so the first scan becomes a keyframe.
    far = eye.at[:3, 3].set(jnp.array([1e6, 1e6, 1e6]))
    return MapState(kf=kf, correction=eye, pose=eye, last_kf_pose=far)


def _transform(T, pts):
    return (T[:3, :3] @ pts[..., None])[..., 0] + T[:3, 3]


def build_submap(config: PipelineConfig, kf: KeyframeStore):
    """Union of selected keyframe clouds in world frame, voxel-downsampled
    (extractSurroundingKeyFrames; corner DS 0.2, surf(+outlier) DS 0.3,
    mO.cpp:1223-1230).

    Loop-closure ON: the ``submap_recent_num`` most recent keyframes
    (mO.cpp:1127-1166 deque path).  OFF: the nearest keyframes within
    ``submap_search_radius`` of the latest pose (mO.cpp:1167-1222 radius
    search path) — capped at the same count to keep shapes static (the
    reference's incremental add/remove cache is a CPU economy; here the
    gather is one batched top-k)."""
    cap, m = config.cap, config.mapping
    R = m.submap_recent_num
    last = kf.count - 1
    if config.loop.enabled:
        idx = jnp.clip(last - jnp.arange(R), 0, cap.max_keyframes - 1)
        sel_ok = (last - jnp.arange(R)) >= 0
    else:
        cur = kf.poses6[jnp.maximum(last, 0), 3:6]
        d = jnp.linalg.norm(kf.poses6[:, 3:6] - cur, axis=-1)
        ok = (jnp.arange(cap.max_keyframes) < kf.count) & \
             (d < m.submap_search_radius)
        score = jnp.where(ok, -d, -jnp.inf)
        score_k, idx = jax.lax.top_k(score, R)
        sel_ok = jnp.isfinite(score_k)
        idx = jnp.clip(idx, 0, cap.max_keyframes - 1)

    poses = se3.pose6_to_mat(kf.poses6[idx])              # (R,4,4)

    def world(pts, mask):
        out = (poses[:, None, :3, :3] @ pts[..., None])[..., 0] \
            + poses[:, None, :3, 3]
        return out, mask & sel_ok[:, None]

    c_pts, c_mask = world(kf.corner[idx], kf.corner_mask[idx])
    s_pts, s_mask = world(kf.surf[idx], kf.surf_mask[idx])
    o_pts, o_mask = world(kf.outlier[idx], kf.outlier_mask[idx])

    # O(n) hash decimation instead of exact centroid voxel grids: the
    # submap is purely a nearest-neighbor target (see voxel.voxel_decimate).
    corner, corner_mask = voxel.voxel_decimate(
        c_pts.reshape(-1, 3), c_mask.reshape(-1), m.corner_leaf,
        cap.submap_corner_pad)
    surf_all = jnp.concatenate([s_pts.reshape(-1, 3), o_pts.reshape(-1, 3)])
    surf_allm = jnp.concatenate([s_mask.reshape(-1), o_mask.reshape(-1)])
    surf, surf_mask = voxel.voxel_decimate(
        surf_all, surf_allm, m.surf_leaf, cap.submap_surf_pad)
    return corner, corner_mask, surf, surf_mask


def _corner_geometry(p_w, submap, knn5, qcnt, m):
    """Line fits from 5-NN (cornerOptimization, mO.cpp:1265-1346).
    Returns (a, b, valid): the two virtual line points per query."""
    idx, sqd = knn5(p_w, qcnt)
    nn_ok = sqd[:, m.knn - 1] < m.max_nn_sq_dist
    pts = submap[idx]                              # (Q,5,3)
    center = pts.mean(1)
    d = pts - center[:, None]
    cov = jnp.einsum("qki,qkj->qij", d, d) / m.knn
    evals, dirv = solver.sym3_eig(cov)             # ascending, v of largest
    is_line = evals[:, 2] > m.corner_eig_ratio * evals[:, 1]
    a = center + 0.1 * dirv
    b = center - 0.1 * dirv
    return a, b, nn_ok & is_line


def _surf_geometry(p_w, submap, knn5, qcnt, m):
    """Plane fits from 5-NN (surfOptimization, mO.cpp:1348-1399).
    Returns (n, d, valid): unit plane normal + offset per query."""
    idx, sqd = knn5(p_w, qcnt)
    nn_ok = sqd[:, m.knn - 1] < m.max_nn_sq_dist
    pts = submap[idx]                              # (Q,5,3)
    # Solve A n = -1 (least squares via normal equations, closed form).
    AtA = jnp.einsum("qki,qkj->qij", pts, pts)
    Atb = -pts.sum(1)
    n = solver.solve3(AtA + 1e-8 * jnp.eye(3, dtype=pts.dtype)[None], Atb)
    norm = jnp.linalg.norm(n, axis=-1)
    norm = jnp.maximum(norm, 1e-9)
    nu = n / norm[:, None]
    dof = 1.0 / norm
    # Validity: every NN within plane_fit_tol of the plane (mO.cpp:1368-1377).
    pd = jnp.abs(jnp.einsum("qki,qi->qk", pts, nu) + dof[:, None])
    plane_ok = (pd <= m.plane_fit_tol).all(-1)
    return nu, dof, nn_ok & plane_ok


@functools.partial(jax.jit, static_argnums=0)
def scan_to_map(config: PipelineConfig, T_guess: jnp.ndarray,
                corner_q: jnp.ndarray, corner_qmask: jnp.ndarray,
                surf_q: jnp.ndarray, surf_qmask: jnp.ndarray,
                submap_c: jnp.ndarray, submap_cm: jnp.ndarray,
                submap_s: jnp.ndarray, submap_sm: jnp.ndarray):
    """6-DOF LM refinement (scan2MapOptimization, mO.cpp:1501-1522).
    Returns the refined world pose (4,4)."""
    m = config.mapping

    enough = (submap_cm.sum() > 10) & (submap_sm.sum() > m.min_submap_points)

    # Prefix-compact both query sets once (loop-invariant): the Pallas
    # kernel then skips query tiles past the live count — the engine's
    # query pads run at ~25-50% occupancy, so this halves NN work.
    from .ops.compact import compact
    corner_q, corner_qmask = compact(corner_q, corner_qmask,
                                     corner_q.shape[0])
    surf_q, surf_qmask = compact(surf_q, surf_qmask, surf_q.shape[0])
    qcnt_c = corner_qmask.sum().astype(jnp.int32)[None]
    qcnt_s = surf_qmask.sum().astype(jnp.int32)[None]

    knn_c = _make_knn5(submap_c, submap_cm, m)
    knn_s = _make_knn5(submap_s, submap_sm, m)

    def research(T):
        pc_w = _transform(T, corner_q)
        ps_w = _transform(T, surf_q)
        la, lb, c_ok = _corner_geometry(pc_w, submap_c, knn_c, qcnt_c, m)
        nu, dof, s_ok = _surf_geometry(ps_w, submap_s, knn_s, qcnt_s, m)
        return la, lb, c_ok & corner_qmask, nu, dof, s_ok & surf_qmask

    def iteration(it, state):
        # it is a PYTHON int: the LM loop is unrolled with lax.cond-gated
        # iterations instead of lax.while_loop — a scan/while whose body
        # contains a dot_general permanently degrades all subsequent
        # dispatches ~14x on this runtime (see odometry._stage_loop).
        T, Pm, degen, geom = state
        if it % m.research_every == 0 and it > 0:
            geom = research(T)
        la, lb, c_ok, nu, dof, s_ok = geom

        def resid(delta):
            Td = se3.se3_exp(delta) @ T
            pc = _transform(Td, corner_q)
            ps = _transform(Td, surf_q)
            pa, pb = pc - la, pc - lb
            cr = jnp.cross(pa, pb)
            rc = jnp.linalg.norm(cr, axis=-1) / jnp.maximum(
                jnp.linalg.norm(la - lb, axis=-1), 1e-9)
            rs = jnp.einsum("qi,qi->q", ps, nu) + dof
            return jnp.concatenate([rc, rs])

        delta0 = jnp.zeros((6,), jnp.float32)
        r = resid(delta0)
        J = jax.jacfwd(resid)(delta0)
        nq = corner_q.shape[0]
        # Robust weights (mO.cpp:1332,1384); surf gets the depth discount.
        wc = solver.robust_weight(jnp.abs(r[:nq]), m.robust_slope,
                                  m.robust_min_weight, True)
        depth = jnp.linalg.norm(surf_q, axis=-1)
        ws_raw = 1.0 - m.robust_slope * jnp.abs(r[nq:]) / jnp.sqrt(
            jnp.maximum(depth, 1e-6))
        ws = jnp.where(ws_raw > m.robust_min_weight, ws_raw, 0.0)
        w = jnp.concatenate([wc * c_ok, ws * s_ok])

        n_sel = (w > 0).sum()
        delta, H, _ = solver.gauss_newton_step(J, r, w, damping=1e-6)
        # Degeneracy eigh only on iteration 0 (matP computed once,
        # mO.cpp:1450-1477).
        if it == 0:
            Pm, degen = solver.degeneracy_projector(H, m.eig_threshold)
        delta = jnp.where(degen, Pm @ delta, delta)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        # Minimum-correspondence guard (mO.cpp:1410).
        delta = jnp.where(n_sel >= m.min_correspondences, delta, 0.0)
        T = se3.se3_exp(delta) @ T
        done = solver.converged(delta[:3], delta[3:], m.delta_rot_deg,
                                m.delta_trans_cm) | \
            (n_sel < m.min_correspondences)
        return done, (T, Pm, degen, geom)

    state = (T_guess, jnp.eye(6, dtype=jnp.float32), jnp.bool_(False),
             research(T_guess))
    done = jnp.bool_(False)
    for it in range(m.max_iterations):
        def live(s, it=it):
            return iteration(it, s)

        def frozen(s):
            return jnp.bool_(True), s

        done, state = jax.lax.cond(done, frozen, live, state)
    return jnp.where(enough, state[0], T_guess)


@functools.partial(jax.jit, static_argnums=0)
def downsample_scan(config: PipelineConfig,
                    corner: jnp.ndarray, corner_mask: jnp.ndarray,
                    surf: jnp.ndarray, surf_mask: jnp.ndarray,
                    outlier: jnp.ndarray, outlier_mask: jnp.ndarray):
    """Current-scan voxel DS (downsampleCurrentScan, mO.cpp:1233-1263).
    Per-scan clouds are <=8k points: 2^14 hash buckets suffice (and the
    bucket-table passes dominate the cost)."""
    cap, m = config.cap, config.mapping
    c, cm, _ = voxel.voxel_downsample_hash(corner, corner_mask, m.corner_leaf,
                                           cap.kf_corner_pad, table_bits=14)
    s, sm, _ = voxel.voxel_downsample_hash(surf, surf_mask, m.surf_leaf,
                                           cap.kf_surf_pad, table_bits=14)
    o, om, _ = voxel.voxel_downsample_hash(outlier, outlier_mask,
                                           m.outlier_leaf, cap.kf_outlier_pad,
                                           table_bits=14)
    return c, cm, s, sm, o, om


def insert_keyframe(config: PipelineConfig, kf: KeyframeStore,
                    should: jnp.ndarray,
                    pose: jnp.ndarray, time: jnp.ndarray,
                    corner: jnp.ndarray, corner_mask: jnp.ndarray,
                    surf: jnp.ndarray, surf_mask: jnp.ndarray,
                    outlier: jnp.ndarray, outlier_mask: jnp.ndarray,
                    odom_pose: jnp.ndarray | None = None):
    """Guarded keyframe append (saveKeyFramesAndFactor, mO.cpp:1525-1639).
    Clouds are stored in the sensor frame; pose as a 6-vec.  Also records
    the pose-graph odometry factor (prior for node 0, between otherwise,
    mO.cpp:1544-1560).

    Returns (kf, inserted).  Cond-free by design (this runs on the donated
    engine state, and XLA conditionals cannot alias donated buffers a
    branch writes — see pipeline.py): the candidate keyframe is ALWAYS
    written at slot ``count`` — invisible, since every reader masks by
    ``< count`` — and ``should`` merely bumps the count.  When the bank is
    full the write re-writes the last slot's own contents (a one-slot
    gather+select, ~100 KB) and the keyframe is dropped: the map stops
    growing rather than silently corrupting the newest keyframe."""
    K = config.cap.max_keyframes
    room = kf.count < K
    i = jnp.minimum(kf.count, K - 1)
    inserted = should & room

    def put(bank, new):
        return bank.at[i].set(jnp.where(room, new, bank[i]))

    prev = se3.pose6_to_mat(kf.poses6[jnp.maximum(i - 1, 0)])
    z = jnp.where(i == 0, pose, se3.mat_inv(prev) @ pose)
    if odom_pose is None:
        odom_pose = pose
    kf = kf._replace(
        odom_z=put(kf.odom_z, z),
        odom_pose=put(kf.odom_pose, odom_pose),
        poses6=put(kf.poses6, se3.mat_to_pose6(pose)),
        times=put(kf.times, time),
        corner=put(kf.corner, corner),
        corner_mask=put(kf.corner_mask, corner_mask),
        surf=put(kf.surf, surf),
        surf_mask=put(kf.surf_mask, surf_mask),
        outlier=put(kf.outlier, outlier),
        outlier_mask=put(kf.outlier_mask, outlier_mask),
        count=kf.count + inserted.astype(jnp.int32),
    )
    return kf, inserted


def should_insert_keyframe(config: PipelineConfig, last_kf_pose: jnp.ndarray,
                           pose: jnp.ndarray) -> jnp.ndarray:
    """Keyframe if moved >= keyframe_dist (mO.cpp:1531-1538)."""
    d = jnp.linalg.norm(pose[:3, 3] - last_kf_pose[:3, 3])
    return d >= config.mapping.keyframe_dist
