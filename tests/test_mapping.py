import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu import mapping
from sc_lego_loam_tpu.ops import knn, icp
from sc_lego_loam_tpu.utils import se3


def test_knn_exact():
    rng = np.random.default_rng(0)
    tgt = rng.normal(size=(512, 3)).astype(np.float32) * 10
    q = rng.normal(size=(64, 3)).astype(np.float32) * 10
    qp = np.zeros((512, 3), np.float32)
    qp[:64] = q
    idx, sqd = knn.knn(jnp.asarray(qp), jnp.asarray(tgt),
                       jnp.ones((512,), bool), 5)
    idx, sqd = np.asarray(idx)[:64], np.asarray(sqd)[:64]
    d_full = ((q[:, None] - tgt[None]) ** 2).sum(-1)
    ref = np.sort(d_full, axis=1)[:, :5]
    np.testing.assert_allclose(np.sort(sqd, 1), ref, rtol=1e-4, atol=1e-4)


def test_knn_respects_mask():
    tgt = np.zeros((256, 3), np.float32)
    tgt[0] = [0, 0, 0]
    tgt[1] = [10, 0, 0]
    mask = np.zeros(256, bool)
    mask[:2] = True
    q = np.zeros((256, 3), np.float32)
    idx, sqd = knn.nn1(jnp.asarray(q), jnp.asarray(tgt), jnp.asarray(mask))
    assert int(idx[0]) == 0
    assert float(sqd[0]) < 1e-9


def _make_scene(rng, n_surf=2048, n_corner=256):
    """Synthetic map: ground plane + two walls + vertical edge lines.

    Ground sits at z=-2 (sensor-height convention): planes through the
    origin are degenerate for the A.n = -1 plane parametrization — the same
    limitation the reference has (mO.cpp:989-991 matB0 = -1)."""
    surf = np.zeros((n_surf, 3), np.float32)
    k = n_surf // 2
    surf[:k, 0] = rng.uniform(-20, 20, k)
    surf[:k, 1] = rng.uniform(-20, 20, k)
    surf[:k, 2] = -2.0
    surf[k:, 0] = rng.uniform(-20, 20, n_surf - k)
    surf[k:, 1] = 15.0
    surf[k:, 2] = rng.uniform(0, 8, n_surf - k)
    corner = np.zeros((n_corner, 3), np.float32)
    nb = n_corner // 4
    for b in range(4):
        x0, y0 = [(-10, -5), (8, 3), (-3, 9), (12, -12)][b]
        corner[b * nb:(b + 1) * nb, 0] = x0
        corner[b * nb:(b + 1) * nb, 1] = y0
        corner[b * nb:(b + 1) * nb, 2] = rng.uniform(0, 6, nb)
    return surf, corner


def test_scan_to_map_recovers_perturbation():
    """Query = map transformed by a small rigid motion; scan-to-map must
    recover the inverse."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(1)
    # Dense map: 5-NN must fall within the reference's 1 m^2 gate
    # (mO.cpp:1287,1359) as it does for real 0.2/0.3 m-leaf submaps.
    surf_map, corner_map = _make_scene(rng, n_surf=8192, n_corner=1024)

    cap = cfg.cap
    sub_s = np.zeros((cap.submap_surf_pad, 3), np.float32)
    sub_s[:len(surf_map)] = surf_map
    sub_sm = np.zeros(cap.submap_surf_pad, bool)
    sub_sm[:len(surf_map)] = True
    sub_c = np.zeros((cap.submap_corner_pad, 3), np.float32)
    sub_c[:len(corner_map)] = corner_map
    sub_cm = np.zeros(cap.submap_corner_pad, bool)
    sub_cm[:len(corner_map)] = True

    # Current scan: subsample of the map, in sensor frame of true pose T.
    xi_true = np.array([0.01, -0.02, 0.03, 0.2, -0.1, 0.05], np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi_true)))
    Tinv = np.linalg.inv(T_true)

    def to_sensor(p):
        return (p @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)

    cq = np.zeros((cap.kf_corner_pad, 3), np.float32)
    cqm = np.zeros(cap.kf_corner_pad, bool)
    # Enough correspondences that the reference's absolute degeneracy
    # threshold (eigThre=100, mO.cpp:1459) is not tripped by a healthy
    # scene: real submaps give thousands of matches.
    sel_c = rng.permutation(len(corner_map))[:500]
    cq[:500] = to_sensor(corner_map[sel_c])
    cqm[:500] = True
    nsq = cap.kf_surf_pad + cap.kf_outlier_pad
    sq = np.zeros((nsq, 3), np.float32)
    sqm = np.zeros(nsq, bool)
    sel_s = rng.permutation(len(surf_map))[:3000]
    sq[:3000] = to_sensor(surf_map[sel_s])
    sqm[:3000] = True

    T0 = jnp.eye(4, dtype=jnp.float32)   # guess = identity (off by T_true)
    T_est = mapping.scan_to_map(
        cfg, T0, jnp.asarray(cq), jnp.asarray(cqm), jnp.asarray(sq),
        jnp.asarray(sqm), jnp.asarray(sub_c), jnp.asarray(sub_cm),
        jnp.asarray(sub_s), jnp.asarray(sub_sm))
    T_est = np.asarray(T_est)
    err_t = np.linalg.norm(T_est[:3, 3] - T_true[:3, 3])
    err_r = float(se3.rotation_angle(jnp.asarray(
        T_true[:3, :3].T @ T_est[:3, :3], jnp.float32)))
    assert err_t < 0.03, f"translation error {err_t}"
    assert err_r < 0.01, f"rotation error {err_r}"


def test_keyframe_insert_and_submap():
    cfg = tiny_test_config()
    st = mapping.init_state(cfg)
    cap = cfg.cap
    rng = np.random.default_rng(2)
    c = rng.normal(size=(cap.kf_corner_pad, 3)).astype(np.float32)
    cm = np.ones(cap.kf_corner_pad, bool)
    s = rng.normal(size=(cap.kf_surf_pad, 3)).astype(np.float32) * 5
    sm = np.ones(cap.kf_surf_pad, bool)
    o = np.zeros((cap.kf_outlier_pad, 3), np.float32)
    om = np.zeros(cap.kf_outlier_pad, bool)

    pose1 = jnp.eye(4, dtype=jnp.float32)
    pose2 = jnp.asarray(np.array(se3.se3_exp(jnp.asarray(
        [0, 0, 0.1, 1.0, 0, 0], jnp.float32))))

    kf, ins1 = mapping.insert_keyframe(
        cfg, st.kf, jnp.bool_(True), pose1, jnp.float32(0.0),
        jnp.asarray(c), jnp.asarray(cm), jnp.asarray(s), jnp.asarray(sm),
        jnp.asarray(o), jnp.asarray(om))
    assert bool(ins1)
    # A non-inserting tick's slot write must stay invisible.
    kf, ins_no = mapping.insert_keyframe(
        cfg, kf, jnp.bool_(False), pose2, jnp.float32(0.5),
        jnp.asarray(c), jnp.asarray(cm), jnp.asarray(s), jnp.asarray(sm),
        jnp.asarray(o), jnp.asarray(om))
    assert not bool(ins_no) and int(kf.count) == 1
    kf, _ = mapping.insert_keyframe(
        cfg, kf, jnp.bool_(True), pose2, jnp.float32(1.0),
        jnp.asarray(c), jnp.asarray(cm), jnp.asarray(s), jnp.asarray(sm),
        jnp.asarray(o), jnp.asarray(om))
    assert int(kf.count) == 2
    # odom_z[1] must equal pose1^-1 @ pose2.
    np.testing.assert_allclose(np.asarray(kf.odom_z[1]),
                               np.asarray(pose2), atol=1e-5)

    sub_c, sub_cm, sub_s, sub_sm = mapping.build_submap(cfg, kf)
    assert int(sub_cm.sum()) > 0
    assert int(sub_sm.sum()) > 0
    # Submap points live in world frame: keyframe-2 corners shifted by +1 x.
    assert np.asarray(sub_c)[np.asarray(sub_cm)][:, 0].max() > \
        np.asarray(c)[:, 0].max() + 0.5


def test_icp_recovers_transform():
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    surf_map, corner_map = _make_scene(rng, n_surf=1024, n_corner=128)
    pts = np.concatenate([surf_map, corner_map])
    cap = cfg.cap
    dst = np.zeros((cap.history_pad, 3), np.float32)
    dst[:len(pts)] = pts
    dstm = np.zeros(cap.history_pad, bool)
    dstm[:len(pts)] = True

    T_true = np.asarray(se3.se3_exp(jnp.asarray(
        [0.0, 0.0, 0.05, 0.5, -0.3, 0.1], jnp.float32)))
    src = np.zeros((cap.icp_query_pad, 3), np.float32)
    sel = rng.permutation(len(pts))[:800]
    Tinv = np.linalg.inv(T_true)
    src[:800] = (pts[sel] @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)
    srcm = np.zeros(cap.icp_query_pad, bool)
    srcm[:800] = True

    T_est, fit, inliers = icp.align(cfg, jnp.asarray(src), jnp.asarray(srcm),
                                    jnp.asarray(dst), jnp.asarray(dstm))
    np.testing.assert_allclose(np.asarray(T_est), T_true, atol=0.05)
    assert float(fit) < 0.05
    # A genuine alignment of co-visible geometry must pass the overlap gate.
    assert float(inliers) >= 0.85


def test_keyframe_bank_overflow_drops_not_clobbers():
    """Capacity policy (VERDICT r3 missing #4): past max_keyframes, new
    keyframes are DROPPED — the newest stored keyframe keeps its data
    (the r2/r3 behavior silently overwrote the last slot)."""
    import dataclasses
    cfg = tiny_test_config()
    cfg = cfg.replace(cap=dataclasses.replace(cfg.cap, max_keyframes=3))
    st = mapping.init_state(cfg)
    cap = cfg.cap
    kf = st.kf

    def mk(i):
        c = np.full((cap.kf_corner_pad, 3), float(i), np.float32)
        cm = np.ones(cap.kf_corner_pad, bool)
        s = np.zeros((cap.kf_surf_pad, 3), np.float32)
        sm = np.zeros(cap.kf_surf_pad, bool)
        o = np.zeros((cap.kf_outlier_pad, 3), np.float32)
        om = np.zeros(cap.kf_outlier_pad, bool)
        pose = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(float(i))
        return pose, c, cm, s, sm, o, om

    dropped = 0
    for i in range(5):
        pose, c, cm, s, sm, o, om = mk(i)
        kf, ins = mapping.insert_keyframe(
            cfg, kf, jnp.bool_(True), pose, jnp.float32(i),
            jnp.asarray(c), jnp.asarray(cm), jnp.asarray(s),
            jnp.asarray(sm), jnp.asarray(o), jnp.asarray(om))
        dropped += int(~np.asarray(ins))
    assert int(kf.count) == 3
    assert dropped == 2
    # Slot 2 (the newest stored keyframe) still holds insert #2's data.
    np.testing.assert_allclose(np.asarray(kf.corner[2])[:, 0], 2.0)
    np.testing.assert_allclose(float(kf.poses6[2, 3]), 2.0)
