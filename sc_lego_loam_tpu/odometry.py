"""Scan-to-scan odometry (reference L4 node, featureAssociation.cpp).

Replaces the two-stage 3-DOF Levenberg-Marquardt of the reference
(C9: fA.cpp:860-1705) with the same structure expressed TPU-natively:

- correspondences by batched brute-force nearest neighbor over padded
  feature banks (distance matrices on the MXU) instead of kd-trees,
  re-searched every ``research_every`` iterations (fA.cpp:1052,1163);
- motion parametrized as a single se(3) twist xi with T_rel = exp(xi);
  stage 1 solves [roll, pitch, tz] on planar (ground) features
  (fA.cpp:1270-1377 calculateTransformationSurf), stage 2 [yaw, tx, ty]
  on edge features (fA.cpp:1379-1478 calculateTransformationCorner) —
  the lidar-frame equivalent of the reference's camera-frame split;
- intra-scan de-skew happens ONCE PER SCAN before the solve
  (deskew_with_twist with the carried previous twist, or IMU — see
  _apply for why the reference's in-solver TransformToStart
  s-interpolation, fA.cpp:860-883, was deliberately not kept);
- Jacobians via jax.grad of the residual instead of hand-expanded Euler
  trig; degeneracy guard and robust reweighting as in the reference;
- the LM loop is UNROLLED with lax.cond-gated iterations (early exit
  preserved); see _stage_loop for the runtime reason.

Pose accumulation (C10, fA.cpp:1697-1725) is plain SE(3) composition; the
Euler "AccumulateRotation/PluginIMURotation" trig is gone.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import PipelineConfig
from .ops.features import FeatureCloud, FeatureSet
from .ops import residuals, solver
from .utils import se3

_BIG = 1e18   # python float (module-level jnp constants poison the stream)


class OdometryState(NamedTuple):
    corner_last: FeatureCloud   # prev less-sharp, in prev scan-end frame
    surf_last: FeatureCloud     # prev less-flat, in prev scan-end frame
    pose: jnp.ndarray           # (4,4) world_from_scan_end
    motion: jnp.ndarray         # (6,) last relative twist (const-vel prior)
    initialized: jnp.ndarray    # () bool


def init_state(config: PipelineConfig) -> OdometryState:
    cap = config.cap

    def empty(pad):
        return FeatureCloud(
            xyz=jnp.zeros((pad, 3), jnp.float32),
            mask=jnp.zeros((pad,), bool),
            ring=jnp.zeros((pad,), jnp.int32),
            rel_time=jnp.zeros((pad,), jnp.float32))

    return OdometryState(
        corner_last=empty(cap.less_sharp_pad),
        surf_last=empty(cap.less_flat_pad),
        pose=jnp.eye(4, dtype=jnp.float32),
        motion=jnp.zeros((6,), jnp.float32),
        initialized=jnp.bool_(False),
    )


def _sqdist(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(Q,3),(T,3) -> (Q,T) squared distances via the MXU."""
    qq = (q * q).sum(-1)[:, None]
    tt = (t * t).sum(-1)[None, :]
    return jnp.maximum(qq + tt - 2.0 * (q @ t.T), 0.0)


# --------------------------------------------------------------------- #
# Correspondence search via packed (quantized-distance | index) int32
# keys: each ring relation becomes ONE min-reduction over the (Q,T) key
# matrix instead of an argmin + take_along_axis pair over a separate f32
# distance copy, halving the HBM passes of the research (the dominant
# odometry cost: profile_iters measured the research at ~7x an LM
# iteration).  Quantization (18 bits over [0, 64] m^2 ~ 0.25 mm^2) only
# re-breaks exact-distance ties, which the reference's kd-tree breaks
# arbitrarily too.

_NN_MAXKEY = 2 ** 31 - 1
_NN_MAX_SQ = 64.0                # quantization range >= nearest_sq_dist


def _nn_idx_bits(T: int) -> int:
    """Index bits for a T-entry target bank (trace-time static).  The
    distance field gets the remaining 31-bits budget, so larger pads
    trade quantization resolution (still sub-mm^2 at 2^17 targets) for
    capacity instead of hitting a hard limit."""
    bits = max(1, (T - 1).bit_length())
    assert bits <= 24, f"target pad {T} leaves <7 distance bits"
    return bits


def _packed_keys(q_xyz, tgt: FeatureCloud):
    """(Q,T) packed keys; invalid targets hold MAXKEY."""
    T = tgt.xyz.shape[0]
    bits = _nn_idx_bits(T)
    d = _sqdist(q_xyz, tgt.xyz)
    scale = float((1 << (31 - bits)) - 4) / _NN_MAX_SQ
    dq = jnp.clip(d * scale, 0,
                  float((1 << (31 - bits)) - 2)).astype(jnp.int32)
    tidx = jax.lax.broadcasted_iota(jnp.int32, dq.shape, 1)
    key = (dq << bits) | tidx
    return jnp.where(tgt.mask[None, :], key, _NN_MAXKEY), (scale, bits)


def _unpack(key, scale_bits):
    scale, bits = scale_bits
    dd = (key >> bits).astype(jnp.float32) / scale
    return jnp.where(key == _NN_MAXKEY, _BIG, dd), \
        key & ((1 << bits) - 1)


def _find_corner(q_xyz, q_mask, tgt: FeatureCloud, ocfg):
    """Edge correspondences (fA.cpp:1044-1153): nearest neighbor j plus the
    nearest point l2 in a *different* ring within +-near_ring_span."""
    key, scale = _packed_keys(q_xyz, tgt)
    k1 = key.min(-1)
    dj, j = _unpack(k1, scale)
    ring_j = tgt.ring[j]
    dr = jnp.abs(tgt.ring[None, :] - ring_j[:, None])
    m2 = (dr > 0) & (dr <= ocfg.near_ring_span)
    k2 = jnp.where(m2, key, _NN_MAXKEY).min(-1)
    dl2, l2 = _unpack(k2, scale)
    valid = q_mask & (dj < ocfg.nearest_sq_dist) & (dl2 < ocfg.nearest_sq_dist)
    return j, l2, valid


def _find_surf(q_xyz, q_mask, tgt: FeatureCloud, ocfg):
    """Planar correspondences (fA.cpp:1155-1268): nearest j, nearest l2 in
    the SAME ring (excluding j), nearest l3 in a different ring within
    +-near_ring_span."""
    key, scale = _packed_keys(q_xyz, tgt)
    k1 = key.min(-1)
    dj, j = _unpack(k1, scale)
    ring_j = tgt.ring[j]
    same = tgt.ring[None, :] == ring_j[:, None]
    # key != k1 excludes exactly j (indices make keys unique).
    k2 = jnp.where(same & (key != k1[:, None]), key, _NN_MAXKEY).min(-1)
    dl2, l2 = _unpack(k2, scale)
    dr = jnp.abs(tgt.ring[None, :] - ring_j[:, None])
    m3 = (dr > 0) & (dr <= ocfg.near_ring_span)
    k3 = jnp.where(m3, key, _NN_MAXKEY).min(-1)
    dl3, l3 = _unpack(k3, scale)
    thr = ocfg.nearest_sq_dist
    valid = q_mask & (dj < thr) & (dl2 < thr) & (dl3 < thr)
    return j, l2, l3, valid


def _apply(xi, pts):
    """exp(xi) p — the rigid scan-to-prev-end transform.  The solver is
    PURELY RIGID: intra-scan de-skew happens once per scan BEFORE the
    solve (deskew_with_twist / imu.deskew_to_end at the perception level),
    never inside it.  The round-4 in-solver motion-interpolated
    exp(s*xi) model was removed after measurement: solving the de-skew
    twist jointly with the alignment is self-referentially unstable
    through the stored targets — the first scan's raw-skewed targets bias
    the fit by exactly E[s]/E[s^2] = 1.5x of the true rotation (fitting a
    constant against s-proportional residuals), and re-association plus
    robust reweighting keeps the error from damping (measured: rotation
    scale est/gt mean 1.49 on the skewed figure-8, vs 1.005 rigid —
    tools/diag_real.py).  The reference avoids the instability only
    because its IMU removes the rotation first (fA.cpp:491-619)."""
    T = se3.se3_exp(xi)
    return pts @ T[:3, :3].T + T[:3, 3]


def deskew_with_twist(xi, pts, s):
    """Constant-twist de-skew into the scan-END frame:
    p_end = exp(xi)^-1 exp(s xi) p = exp((s-1) xi) p (colinear twists
    commute).  ``xi`` is the CARRIED per-scan twist estimate — the
    previous scan's solved motion (the lidar-only prediction; VERDICT r4
    next #1b "carry the previous scan's solved twist as the de-skew
    base"), replacing the reference's TransformToStart s-interpolation
    inside the solver (fA.cpp:860-883).  Prediction error leaves residual
    skew (xi_true - xi)(s-1) — bounded by the per-scan RATE CHANGE, not
    the motion, and it does not feed back through the stored targets
    (each scan is de-skewed from its own prediction, not from the value
    the solver is currently estimating)."""
    T = se3.se3_exp((s - 1.0)[:, None] * xi[None, :])   # (N,4,4)
    return (T[:, :3, :3] @ pts[..., None])[..., 0] + T[:, :3, 3]


def _corner_residual(xi, q, a, b):
    return residuals.point_to_line(_apply(xi, q), a, b)


def _surf_residual(xi, q, a, b, c):
    return residuals.point_to_plane(_apply(xi, q), a, b, c)


def _stage_loop(xi0, xi_anchor, tube, param_idx, research_fn, resid_fn,
                jac_fn, corres0, ocfg):
    """Generic 3-DOF LM stage. ``research_fn(xi) -> corres`` (pytree of
    arrays incl. 'valid'); ``resid_fn(xi, corres) -> (r, valid)``;
    ``jac_fn(xi, corres) -> (N,6)`` (exact jacfwd through the rigid
    transform).

    The reference stabilizes its Gauss-Newton with a fixed 5% step
    (matB = -0.05*d, fA.cpp:1321); here we use proper adaptive
    Levenberg-Marquardt (accept/reject with lambda adaptation), which
    converges in far fewer iterations.

    UNROLLED, not lax.while_loop: on this runtime, executing any
    scan/while whose body contains a dot_general permanently degrades
    every subsequent dispatch in the process ~14x (measured: a 0.026 ms
    dispatch becomes 0.37 ms, op-rich programs ~40x — the round-1..4
    ~30 fps ceiling).  A Python-unrolled loop with lax.cond-gated
    iterations (cond is NOT a trigger) keeps the early-exit economics:
    converged iterations skip their branch at runtime."""
    idx = jnp.asarray(param_idx)

    def iteration(it, state):
        xi, corres, Pm, degen, lam = state
        if it % ocfg.research_every == 0 and it > 0:
            corres = research_fn(xi)

        r, valid = resid_fn(xi, corres)
        J = jac_fn(xi, corres)                     # (N,6)
        w = solver.robust_weight(jnp.abs(r), ocfg.robust_slope,
                                 ocfg.robust_min_weight,
                                 it >= ocfg.robust_after_iter)
        w = w * valid.astype(r.dtype)
        J3 = J[:, idx]
        Jw = J3 * w[:, None]
        H = Jw.T @ J3
        g = Jw.T @ r
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(
            len(param_idx), dtype=xi.dtype)
        delta3 = -solver.solve_spd(Hd, g)
        # Degeneracy eigendecomposition only on the first iteration (the
        # reference computes matP once, fA.cpp:1329-1356).
        if it == 0:
            Pm, degen = solver.degeneracy_projector(H, ocfg.eig_threshold)
        delta3 = jnp.where(degen, Pm @ delta3, delta3)
        delta3 = jnp.where(jnp.isfinite(delta3), delta3, 0.0)
        delta6 = jnp.zeros((6,), xi.dtype).at[idx].set(delta3)
        delta6 = _clamp_step(delta6, ocfg)
        xi_new = _clamp_to_prior(xi + delta6, xi_anchor, tube)

        cost_old = (w * r * r).sum()
        r_new, _ = resid_fn(xi_new, corres)
        cost_new = (w * r_new * r_new).sum()
        accept = (cost_new < cost_old) & jnp.isfinite(cost_new)
        xi = jnp.where(accept, xi_new, xi)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-5, 1e4)
        done = accept & solver.converged(delta6[:3], delta6[3:],
                                         ocfg.delta_rot_deg,
                                         ocfg.delta_trans_cm)
        return done, (xi, corres, Pm, degen, lam)

    state = (xi0, corres0, jnp.eye(len(param_idx), dtype=xi0.dtype),
             jnp.bool_(False), jnp.float32(1e-3))
    done = jnp.bool_(False)
    for it in range(ocfg.max_iterations):
        def live(s, it=it):
            return iteration(it, s)

        def frozen(s):
            return jnp.bool_(True), s

        done, state = jax.lax.cond(done, frozen, live, state)
    return state[0]


def _clamp_step(delta, ocfg):
    """Trust-region clamp: scale the 6-twist step so rotation and translation
    magnitudes stay within per-iteration bounds (see OdometryConfig)."""
    wn = jnp.linalg.norm(delta[:3])
    vn = jnp.linalg.norm(delta[3:])
    s = jnp.minimum(1.0, jnp.minimum(
        ocfg.max_step_rot / jnp.maximum(wn, 1e-12),
        ocfg.max_step_trans / jnp.maximum(vn, 1e-12)))
    return delta * s


def _clamp_to_prior(xi_new, xi_prior, bounds):
    """Per-scan trust tube: bound the TOTAL deviation of the candidate
    solution from the motion prior (see OdometryConfig.max_rot_from_prior
    — the anti-basin-jump guard the reference's creeping steps provide
    implicitly).  ``bounds`` = (rot_bound, trans_bound); when an IMU prior
    is active the caller inflates them by the prior's own deviation from
    the previous motion so a genuine measured rate change is never clamped
    back toward constant velocity."""
    rot_bound, trans_bound = bounds
    d = xi_new - xi_prior
    wn = jnp.linalg.norm(d[:3])
    vn = jnp.linalg.norm(d[3:])
    s = jnp.minimum(1.0, jnp.minimum(
        rot_bound / jnp.maximum(wn, 1e-12),
        trans_bound / jnp.maximum(vn, 1e-12)))
    return xi_prior + d * s


def _joint_loop(xi0, xi_anchor, tube, corner_research, corner_resid,
                surf_research, surf_resid, corner_jac, surf_jac, ocfg):
    """Joint 6-DOF LM over corner (point-to-line) + surf (point-to-plane)
    residuals together.  Unlike the reference's two-stage 3-DOF split
    (fA.cpp:1270-1478) this keeps all six DOF coupled, so a large yaw error
    cannot poison the roll/pitch/z solve through bad correspondences: the
    corners pull yaw in the *same* iterations that the planes pin z.

    ``*_resid(xi, corres) -> (r, valid)`` are EXACT; ``*_jac(xi, corres)``
    return the Jacobians.

    UNROLLED with lax.cond-gated iterations, NOT lax.while_loop — see
    _stage_loop for the runtime pathology this avoids."""

    def research(xi):
        return corner_research(xi), surf_research(xi)

    def iteration(it, state):
        xi, corres, Pm, degen, lam = state
        if it % ocfg.research_every == 0 and it > 0:
            corres = research(xi)
        cc, sc = corres

        rc, cval = corner_resid(xi, cc)
        rs, sval = surf_resid(xi, sc)
        r = jnp.concatenate([rc, rs])
        J = jnp.concatenate([corner_jac(xi, cc), surf_jac(xi, sc)])
        valid = jnp.concatenate([cval, sval])
        w = solver.robust_weight(jnp.abs(r), ocfg.robust_slope,
                                 ocfg.robust_min_weight,
                                 it >= ocfg.robust_after_iter)
        w = w * valid.astype(r.dtype)
        Jw = J * w[:, None]
        H = Jw.T @ J
        g = Jw.T @ r
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=xi.dtype)
        delta = -solver.solve_spd(Hd, g)
        # Degeneracy eigh only on iteration 0 (see _stage_loop).
        if it == 0:
            Pm, degen = solver.degeneracy_projector(H, ocfg.eig_threshold)
        delta = jnp.where(degen, Pm @ delta, delta)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        delta = _clamp_step(delta, ocfg)
        xi_new = _clamp_to_prior(xi + delta, xi_anchor, tube)

        cost_old = (w * r * r).sum()
        rc2, _ = corner_resid(xi_new, cc)
        rs2, _ = surf_resid(xi_new, sc)
        r_new = jnp.concatenate([rc2, rs2])
        cost_new = (w * r_new * r_new).sum()
        accept = (cost_new < cost_old) & jnp.isfinite(cost_new)
        xi = jnp.where(accept, xi_new, xi)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-5, 1e4)
        done = accept & solver.converged(delta[:3], delta[3:],
                                         ocfg.delta_rot_deg,
                                         ocfg.delta_trans_cm)
        return done, (xi, corres, Pm, degen, lam)

    state = (xi0, research(xi0), jnp.eye(6, dtype=xi0.dtype),
             jnp.bool_(False), jnp.float32(1e-3))
    done = jnp.bool_(False)
    for it in range(ocfg.max_iterations):
        def live(s, it=it):
            return iteration(it, s)

        def frozen(s):
            return jnp.bool_(True), s

        done, state = jax.lax.cond(done, frozen, live, state)
    xi, corres = state[0], state[1]
    # Valid-correspondence count at the solution (gates trust in the result).
    _, cval = corner_resid(xi, corres[0])
    _, sval = surf_resid(xi, corres[1])
    return xi, cval.sum() + sval.sum()


@functools.partial(jax.jit, static_argnums=0)
def step(config: PipelineConfig, state: OdometryState, feats: FeatureSet,
         xi_prior: jnp.ndarray | None = None):
    """One odometry tick. Returns (new_state, world_pose (4,4), rel twist).

    ``xi_prior``: optional initial-guess twist (the IMU dead-reckoned
    motion, updateInitialGuess fA.cpp:1639-1664); defaults to the
    constant-velocity prior (previous twist)."""
    ocfg = config.odom

    def do_init():
        new = OdometryState(
            corner_last=feats.less_sharp, surf_last=feats.less_flat,
            pose=state.pose, motion=jnp.zeros((6,), jnp.float32),
            initialized=jnp.bool_(True))
        return new, state.pose, jnp.zeros((6,), jnp.float32)

    def do_track():
        # Constant-velocity prior, unless an (IMU) prior is supplied.
        xi0 = state.motion if xi_prior is None else xi_prior
        # The trust tube is a DYNAMICS bound (bounded rate change per
        # scan), so it anchors at the previous scan's ESTIMATED motion —
        # never at the initial guess, whose own bias (e.g. a coarse IMU
        # prior) it would otherwise lock in.  When an IMU prior IS
        # supplied, the tube radius inflates by the prior's deviation
        # from the previous motion: a measured rate change larger than
        # the dynamics bound must stay reachable (the IMU escape hatch
        # the OdometryConfig comment promises).
        xi_anchor = state.motion
        tube = (jnp.float32(ocfg.max_rot_from_prior),
                jnp.float32(ocfg.max_trans_from_prior))
        if xi_prior is not None:
            dprior = xi_prior - state.motion
            tube = (tube[0] + jnp.linalg.norm(dprior[:3]),
                    tube[1] + jnp.linalg.norm(dprior[3:]))
        if ocfg.joint_6dof and ocfg.dense_queries:
            def subsample(fc: FeatureCloud, cap: int) -> FeatureCloud:
                # Strided static-shape subsample of the padded bank (entries
                # are hash-scattered, so a stride is an unbiased sample).
                n = fc.xyz.shape[0]
                k = max(1, n // cap)
                return jax.tree.map(lambda a: a[::k][:cap], fc)

            sharp = subsample(feats.less_sharp, ocfg.query_corner_cap)
            flat = subsample(feats.less_flat, ocfg.query_surf_cap)
        else:
            sharp, flat = feats.sharp, feats.flat
        corner_t, surf_t = state.corner_last, state.surf_last
        # Materialization fence: without it XLA fuses the feature-pipeline
        # producers (frontend -> extract -> subsample) into the while_loop
        # body below and RECOMPUTES them every LM iteration — measured
        # +12 ms/scan on the fused perception_step (17.9 ms vs 5.9 ms for
        # the identical solve on precomputed features).
        sharp, flat, corner_t, surf_t = jax.lax.optimization_barrier(
            (sharp, flat, corner_t, surf_t))

        # The solver is purely rigid (see _apply): input clouds are either
        # instantaneous or already de-skewed into the scan-end frame by
        # the perception-level pre-de-skew (pipeline.perception_step).

        # Stage 1: surf features -> [roll, pitch, tz] = twist idx [0,1,5].
        def surf_research(xi):
            return _find_surf(_apply(xi, flat.xyz), flat.mask, surf_t, ocfg)

        def surf_resid(xi, corres):
            j, l2, l3, valid = corres
            r = _surf_residual(xi, flat.xyz, surf_t.xyz[j], surf_t.xyz[l2],
                               surf_t.xyz[l3])
            return r, valid

        def corner_research(xi):
            return _find_corner(_apply(xi, sharp.xyz), sharp.mask, corner_t,
                                ocfg)

        def corner_resid(xi, corres):
            j, l2, valid = corres
            r = _corner_residual(xi, sharp.xyz, corner_t.xyz[j],
                                 corner_t.xyz[l2])
            return r, valid

        def corner_jac(xi, corres):
            return jax.jacfwd(lambda x: corner_resid(x, corres)[0])(xi)

        def surf_jac(xi, corres):
            return jax.jacfwd(lambda x: surf_resid(x, corres)[0])(xi)

        if ocfg.joint_6dof:
            xi2, n_corres = _joint_loop(xi0, xi_anchor, tube,
                                        corner_research, corner_resid,
                                        surf_research, surf_resid,
                                        corner_jac, surf_jac, ocfg)
            enough = n_corres >= ocfg.min_total_corres
        else:
            # Reference two-stage split: surf -> [roll, pitch, tz], then
            # corner -> [yaw, tx, ty] (fA.cpp:1270-1478).
            enough = (sharp.mask.sum() >= ocfg.min_feature_points) & \
                     (flat.mask.sum() >= ocfg.min_surf_points)
            xi1 = _stage_loop(xi0, xi_anchor, tube, (0, 1, 5),
                              surf_research, surf_resid, surf_jac,
                              surf_research(xi0), ocfg)
            # Stage 2: corner features -> [yaw, tx, ty] = twist idx [2,3,4].
            xi2 = _stage_loop(xi1, xi_anchor, tube, (2, 3, 4),
                              corner_research, corner_resid, corner_jac,
                              corner_research(xi1), ocfg)

        xi = jnp.where(enough, xi2, xi0)
        xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
        T_rel = se3.se3_exp(xi)
        pose = state.pose @ T_rel

        # The reference's TransformToEnd (fA.cpp:885-953) re-projects
        # features to scan end here; our clouds already LIVE in the
        # scan-end frame (instantaneous input or perception pre-de-skew),
        # so they become the next frame's targets as-is.
        new = OdometryState(
            corner_last=feats.less_sharp, surf_last=feats.less_flat,
            pose=pose, motion=xi, initialized=jnp.bool_(True))
        return new, pose, xi

    return jax.lax.cond(state.initialized, do_track, do_init)
