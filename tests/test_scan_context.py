import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.models import scan_context as sc
from sc_lego_loam_tpu.utils import synthetic


def _cloud(seed=0, n=20000):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-60, 60, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 10, n)
    return jnp.asarray(pts), jnp.ones((n,), bool)


def test_descriptor_shape_and_heights():
    cfg = tiny_test_config()
    pts, mask = _cloud()
    d = sc.make_descriptor(pts, mask, cfg.sc)
    assert d.shape == (cfg.sc.num_ring, cfg.sc.num_sector)
    dn = np.asarray(d)
    # Max height + lidar offset: bounded by data range.
    assert dn.max() <= 10 + cfg.sc.lidar_height + 1e-5
    assert dn.min() >= 0.0
    assert (dn > 0).sum() > 100


def test_descriptor_bin_placement():
    cfg = tiny_test_config()
    # A single point at rho=10, theta=45deg, z=1.
    p = np.array([[10 * np.cos(np.pi / 4), 10 * np.sin(np.pi / 4), 1.0]],
                 np.float32)
    d = sc.make_descriptor(jnp.asarray(p), jnp.ones((1,), bool), cfg.sc)
    ring = int(10.0 / (cfg.sc.max_radius / cfg.sc.num_ring))
    sector = int(45.0 / (360.0 / cfg.sc.num_sector))
    assert abs(float(d[ring, sector]) - (1.0 + cfg.sc.lidar_height)) < 1e-5
    assert (np.asarray(d) > 0).sum() == 1


def test_rotation_shifts_columns():
    """Yaw rotation of the cloud circularly shifts descriptor columns —
    the invariance Scan Context is built on."""
    cfg = tiny_test_config()
    pts, mask = _cloud(1)
    d0 = sc.make_descriptor(pts, mask, cfg.sc)
    shift = 7
    ang = shift * 2 * np.pi / cfg.sc.num_sector
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    d1 = sc.make_descriptor(pts @ jnp.asarray(R.T), mask, cfg.sc)
    np.testing.assert_allclose(np.asarray(d1), np.roll(np.asarray(d0),
                                                       shift, axis=1),
                               atol=1e-4)


def test_ringkey_rotation_invariant():
    cfg = tiny_test_config()
    pts, mask = _cloud(2)
    d0 = sc.make_descriptor(pts, mask, cfg.sc)
    ang = 1.1
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    d1 = sc.make_descriptor(pts @ jnp.asarray(R.T), mask, cfg.sc)
    k0, k1 = np.asarray(sc.ring_key(d0)), np.asarray(sc.ring_key(d1))
    # Max-height bins re-sample under continuous rotation, so invariance is
    # statistical, not exact: compare in aggregate.
    assert np.abs(k0 - k1).mean() < 0.25
    assert np.corrcoef(k0, k1)[0, 1] > 0.99


def test_distance_zero_for_identical():
    cfg = tiny_test_config()
    pts, mask = _cloud(3)
    d = sc.make_descriptor(pts, mask, cfg.sc)
    dist = sc.distance_all_shifts(d, d[None])
    assert abs(float(dist[0, 0])) < 1e-5
    # Unshifted must be the minimum over shifts.
    assert int(jnp.argmin(dist[0])) == 0


def test_distance_recovers_known_yaw():
    cfg = tiny_test_config()
    pts, mask = _cloud(4)
    d = sc.make_descriptor(pts, mask, cfg.sc)
    shift = 13
    d_rot = jnp.roll(d, shift, axis=1)
    dist = sc.distance_all_shifts(d_rot, d[None])
    best = int(jnp.argmin(dist[0]))
    assert best == shift
    assert float(dist[0, best]) < 0.05


def test_detect_finds_revisit_excludes_recent():
    cfg = tiny_test_config()
    bank = sc.init_bank(cfg)
    K = cfg.cap.max_keyframes
    rng = np.random.default_rng(5)
    descs = []
    for i in range(60):
        pts, mask = _cloud(100 + i)
        d = sc.make_descriptor(pts, mask, cfg.sc)
        descs.append(d)
        bank = sc.append(bank, d, K)
    # Query identical to keyframe 2 -> detect 2 (far enough in the past:
    # exclude_recent=50, count=60 -> eligible ids < 10).
    idx, dist, yaw = sc.detect(cfg, bank, descs[2])
    assert int(idx) == 2
    assert float(dist) < 1e-4
    # Query identical to keyframe 55 (recent) -> must NOT return 55.
    idx2, _, _ = sc.detect(cfg, bank, descs[55])
    assert int(idx2) != 55
