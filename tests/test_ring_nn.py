"""Parity: ring-blocked correspondence search vs the flat (Q,T) reference
implementation (same semantics, fA.cpp:1044-1268 ring relations).

Agreement is up to distance-quantization ties (the packed keys quantize
squared distance to ~1e-4 of the 64 m^2 range), so the test compares the
*chosen neighbor geometry*, not raw indices."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu import odometry
from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.ops.features import FeatureCloud


R = 16
P = 32


def _random_cloud(rng, n, r_rings, spread=8.0):
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    ring = rng.integers(0, r_rings, n).astype(np.int32)
    mask = rng.random(n) > 0.15
    return FeatureCloud(
        xyz=jnp.asarray(xyz), mask=jnp.asarray(mask),
        ring=jnp.asarray(ring), rel_time=jnp.zeros((n,), jnp.float32))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    tgt = _random_cloud(rng, 256, R)
    q = rng.uniform(-8.0, 8.0, (64, 3)).astype(np.float32)
    qm = rng.random(64) > 0.1
    return tgt, jnp.asarray(q), jnp.asarray(qm)


def _cfg():
    return tiny_test_config().odom


def _xyz(tgt, idx):
    return np.asarray(tgt.xyz)[np.asarray(idx)]


def test_ring_block_preserves_points(data):
    tgt, _, _ = data
    rb = odometry.ring_block(tgt, R, P)
    # Every valid input point appears exactly once (P is large enough).
    a = np.asarray(tgt.xyz)[np.asarray(tgt.mask)]
    b = np.asarray(rb.xyz)[np.asarray(rb.mask)]
    assert b.shape == a.shape
    sa = a[np.lexsort(a.T)]
    sb = b[np.lexsort(b.T)]
    np.testing.assert_allclose(sa, sb)
    # Ring labels consistent with block position.
    rows = np.nonzero(np.asarray(rb.mask))[0] // P
    orig = {tuple(p): r for p, r in zip(a, np.asarray(tgt.ring)[
        np.asarray(tgt.mask)])}
    for p, rr in zip(b, rows):
        assert orig[tuple(p)] == rr


def test_corner_parity(data):
    tgt, q, qm = data
    ocfg = _cfg()
    rb = odometry.ring_block(tgt, R, P)
    j_f, l2_f, v_f = odometry._find_corner(q, qm, tgt, ocfg)
    j_r, l2_r, v_r = odometry._find_corner_rb(q, qm, rb, ocfg, R)
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_r))
    v = np.asarray(v_f)
    np.testing.assert_allclose(_xyz(tgt, j_f)[v], _xyz(rb, j_r)[v],
                               atol=1e-4)
    np.testing.assert_allclose(_xyz(tgt, l2_f)[v], _xyz(rb, l2_r)[v],
                               atol=1e-4)


def test_surf_parity(data):
    tgt, q, qm = data
    ocfg = _cfg()
    rb = odometry.ring_block(tgt, R, P)
    j_f, l2_f, l3_f, v_f = odometry._find_surf(q, qm, tgt, ocfg)
    j_r, l2_r, l3_r, v_r = odometry._find_surf_rb(q, qm, rb, ocfg, R)
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_r))
    v = np.asarray(v_f)
    for a, b in ((j_f, j_r), (l2_f, l2_r), (l3_f, l3_r)):
        np.testing.assert_allclose(_xyz(tgt, a)[v], _xyz(rb, b)[v],
                                   atol=1e-4)


def test_step_parity():
    """Whole odometry step: ring-blocked vs flat on a real tiny sequence."""
    from sc_lego_loam_tpu import frontend, pipeline
    from sc_lego_loam_tpu.utils import synthetic

    base = tiny_test_config()
    cfg_rb = base.replace(odom=dataclasses.replace(
        base.odom, ring_blocked_nn=True))
    cfg_fl = base.replace(odom=dataclasses.replace(
        base.odom, ring_blocked_nn=False))
    scans, valids, _ = synthetic.make_sequence(
        cfg_rb.lidar, 6, trajectory="figure8", radius=12.0, loops=0.1,
        noise=0.01, seed=5, shuffle=True)
    poses = {}
    for name, cfg in (("rb", cfg_rb), ("fl", cfg_fl)):
        st = odometry.init_state(cfg)
        out = []
        for i in range(6):
            fo = frontend.run(cfg, scans[i], valids[i])
            fs, _, _ = pipeline._extract(cfg, fo.cloud, fo.outlier)
            st, pose, _ = odometry.step(cfg, st, fs)
            out.append(np.asarray(pose))
        poses[name] = np.stack(out)
    # Same trajectory to sub-centimeter (quantization ties move picks
    # between equally-near neighbors).
    np.testing.assert_allclose(poses["rb"][:, :3, 3], poses["fl"][:, :3, 3],
                               atol=2e-2)
