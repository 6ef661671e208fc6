"""Reverse-direction loop closure (BASELINE.json config 3 / Riverside).

The reference's Scan Context detects reverse revisits but its ICP cannot
verify them (no initial guess path, README.md:39 + mO.cpp:1062-1068); here
the SC yaw seeds the verification ICP (loop.py verify), so a 180-degree
revisit must close.  Also covers the loop-OFF radius-search submap path
(mO.cpp:1167-1222)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu import mapping
from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.pipeline import SlamEngine
from sc_lego_loam_tpu.utils import evaluate, synthetic


def _out_and_back(n, step=0.7, height=2.0, turn_frames=8):
    """Drive +x, U-turn over a few frames, come back along the same street
    facing -x (a physical turnaround; a single-frame 180-degree flip would
    exceed any scan-to-scan tracker's basin, ours and the reference's)."""
    half = (n - turn_frames) // 2
    poses = []
    x, y, yaw = 0.0, 0.0, 0.0
    for i in range(n):
        c, s = np.cos(yaw), np.sin(yaw)
        poses.append(np.array([[c, -s, 0, x], [s, c, 0, y],
                               [0, 0, 1, height], [0, 0, 0, 1]], np.float32))
        if i < half:
            s_i = step                # straight out
        elif i < half + turn_frames:
            yaw += np.pi / turn_frames  # tight U-turn (short steps), so the
            s_i = 0.2                   # return street nearly overlays the
        else:                           # outbound one
            s_i = step
        x += s_i * np.cos(yaw)
        y += s_i * np.sin(yaw)
    return np.stack(poses)


def test_reverse_loop_closes():
    cfg = tiny_test_config()
    cfg = cfg.replace(
        sc=dataclasses.replace(cfg.sc, exclude_recent=8),
        loop=dataclasses.replace(cfg.loop, check_every_ticks=2,
                                 rs_time_gap=1e9))   # force the SC path
    n = 56
    gt = _out_and_back(n)
    world = synthetic.default_world(seed=3)
    rng = np.random.default_rng(4)
    engine = SlamEngine(cfg)
    for i in range(n):
        pts, valid = synthetic.raycast(world, gt[i], cfg.lidar, noise=0.01,
                                       rng=rng)
        perm = rng.permutation(pts.shape[0])
        engine.process_scan(pts[perm], valid[perm], t=i * 0.1)
    est = engine.trajectory_array()
    assert np.isfinite(est).all()
    assert int(engine.loops_closed) >= 1, \
        "reverse revisit produced no loop closure"
    ate = evaluate.ate_rmse(est, gt[: len(est)])
    # Smoke floor only: the 16x128 tiny sensor drifts ~2 m in z over this
    # 40 m out-and-back; the point of the test is that reversed revisits
    # CLOSE (SC yaw-seeded ICP), which the reference cannot (README.md:39).
    # Measured spread: 1.4 on a single CPU device vs 2.1 on the 8-device
    # test mesh (GSPMD reduction-order chaos at tiny scale — see
    # tests/test_engine_mesh.py for why bit-parity is not the contract).
    assert ate < 2.5, f"ATE {ate}"


def test_loop_off_radius_submap():
    """With loop closure OFF the submap comes from a 50 m radius search
    around the latest pose, not the recent deque (mO.cpp:1167-1222)."""
    cfg = tiny_test_config()
    cfg_off = cfg.replace(
        loop=dataclasses.replace(cfg.loop, enabled=False),
        mapping=dataclasses.replace(cfg.mapping, submap_recent_num=4,
                                    submap_search_radius=5.0))
    st = mapping.init_state(cfg_off)
    kf = st.kf
    # 10 keyframes marching +x by 10 m; the LAST is back at the origin.
    rng = np.random.default_rng(0)
    for k in range(10):
        x = 0.0 if k == 9 else k * 10.0
        pose = jnp.eye(4).at[0, 3].set(x)
        pts = jnp.asarray(rng.normal(0, 1, (cfg_off.cap.kf_corner_pad, 3)),
                          jnp.float32) + jnp.array([x, 0.0, 0.0])
        m = jnp.ones((cfg_off.cap.kf_corner_pad,), bool)
        surf = jnp.zeros((cfg_off.cap.kf_surf_pad, 3), jnp.float32)
        sm = jnp.zeros((cfg_off.cap.kf_surf_pad,), bool)
        out = jnp.zeros((cfg_off.cap.kf_outlier_pad, 3), jnp.float32)
        om = jnp.zeros((cfg_off.cap.kf_outlier_pad,), bool)
        kf, _ = mapping.insert_keyframe(
            cfg_off, kf, jnp.bool_(True), pose, jnp.float32(k),
            pts, m, surf, sm, out, om)
    c, cm, s, sm_ = mapping.build_submap(cfg_off, kf)
    pts = np.asarray(c)[np.asarray(cm)]
    # Radius 5 m around the origin: only keyframes 0 and 9 qualify; their
    # clouds sit near x=0, so no submap point can be near x=50+.
    assert len(pts) > 0
    assert np.abs(pts[:, 0]).max() < 15.0, np.abs(pts[:, 0]).max()

    # Same store with loop ON picks the most recent 4 (x = 70..90 + 0).
    cfg_on = cfg.replace(
        mapping=dataclasses.replace(cfg.mapping, submap_recent_num=4))
    c2, cm2, *_ = mapping.build_submap(cfg_on, kf)
    pts2 = np.asarray(c2)[np.asarray(cm2)]
    assert pts2[:, 0].max() > 60.0
