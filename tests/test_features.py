import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu import frontend
from sc_lego_loam_tpu.ops import features as F
from sc_lego_loam_tpu.ops.voxel import voxel_downsample
from sc_lego_loam_tpu.utils import synthetic


@pytest.fixture(scope="module")
def fe_out():
    cfg = tiny_test_config()
    world = synthetic.default_world(seed=3)
    pose = np.eye(4)
    pose[2, 3] = 2.0
    pts, valid = synthetic.raycast(world, pose, cfg.lidar, noise=0.0)
    out = frontend.run(cfg, jnp.asarray(pts), jnp.asarray(valid))
    return cfg, out


def test_voxel_downsample_centroids():
    pts = jnp.asarray(np.array([
        [0.05, 0.05, 0.05], [0.15, 0.05, 0.05],   # same 0.2-voxel
        [1.05, 0.0, 0.0],                          # another voxel
        [9.0, 9.0, 9.0],                           # masked out
    ], np.float32))
    mask = jnp.array([True, True, True, False])
    out, omask, _ = voxel_downsample(pts, mask, 0.2, 8)
    o = np.asarray(out)[np.asarray(omask)]
    assert len(o) == 2
    got = sorted(o.tolist())
    np.testing.assert_allclose(got[0], [0.1, 0.05, 0.05], atol=1e-6)
    np.testing.assert_allclose(got[1], [1.05, 0.0, 0.0], atol=1e-6)


def test_voxel_downsample_extras_averaged():
    pts = jnp.asarray(np.array([[0.0, 0, 0], [0.1, 0, 0]], np.float32))
    mask = jnp.array([True, True])
    ex = jnp.asarray(np.array([[2.0], [4.0]], np.float32))
    _, omask, oex = voxel_downsample(pts, mask, 1.0, 4, extras=ex)
    assert int(omask.sum()) == 1
    assert abs(float(oex[0, 0]) - 3.0) < 1e-6


def test_curvature_flat_vs_corner():
    """Analytic check: constant-range row has ~0 curvature; a range step has
    high curvature at the discontinuity."""
    cfg = tiny_test_config()
    H, W = cfg.lidar.n_scan, cfg.lidar.horizon_scan
    from sc_lego_loam_tpu.ops.compaction import SegmentedCloud
    rng = np.full((H, W), 10.0, np.float32)
    rng[0, 60:] = 20.0    # step in row 0
    cloud = SegmentedCloud(
        xyz=jnp.zeros((H, W, 3)), rng=jnp.asarray(rng),
        col=jnp.broadcast_to(jnp.arange(W), (H, W)),
        ground=jnp.zeros((H, W), bool),
        valid=jnp.ones((H, W), bool),
        count=jnp.full((H,), W, jnp.int32),
        rel_time=jnp.zeros((H, W)),
    )
    curv, ok = F.curvature(cloud, cfg.feat)
    c = np.asarray(curv)
    # Flat region: zero curvature.
    assert c[1, 30] < 1e-6
    # Near the step: large curvature.
    assert c[0, 59] > 100.0
    assert np.asarray(ok)[0, 59]


def test_extract_counts_within_budget(fe_out):
    cfg, out = fe_out
    fs = F.extract(out.cloud, cfg.feat, cfg.cap)
    S = cfg.feat.sections
    H = cfg.lidar.n_scan
    n_sharp = int(fs.sharp.mask.sum())
    n_less = int(fs.less_sharp.mask.sum())
    n_flat = int(fs.flat.mask.sum())
    n_lf = int(fs.less_flat.mask.sum())
    assert 0 < n_sharp <= cfg.feat.edge_per_section * S * H
    assert n_sharp <= n_less <= cfg.feat.edge_less_per_section * S * H
    assert 0 < n_flat <= cfg.feat.surf_per_section * S * H
    assert n_lf > n_flat


def test_edges_are_on_discontinuities(fe_out):
    """Sharp features should be non-ground points (building edges/pillars)."""
    cfg, out = fe_out
    fs = F.extract(out.cloud, cfg.feat, cfg.cap)
    m = np.asarray(fs.sharp.mask)
    xyz = np.asarray(fs.sharp.xyz)[m]
    # Corners in this world are above ground level (z > -2 + small).
    assert (xyz[:, 2] > -1.9).mean() > 0.9


def test_flats_are_ground(fe_out):
    cfg, out = fe_out
    fs = F.extract(out.cloud, cfg.feat, cfg.cap)
    m = np.asarray(fs.flat.mask)
    xyz = np.asarray(fs.flat.xyz)[m]
    # Flat points picked from ground: z near -2.
    assert np.abs(xyz[:, 2] + 2.0).mean() < 0.5


def test_feature_separation(fe_out):
    """No point is both sharp and flat; picked suppression leaves gaps."""
    cfg, out = fe_out
    fs = F.extract(out.cloud, cfg.feat, cfg.cap)
    sh = np.asarray(fs.sharp.xyz)[np.asarray(fs.sharp.mask)]
    fl = np.asarray(fs.flat.xyz)[np.asarray(fs.flat.mask)]
    if len(sh) and len(fl):
        d = np.linalg.norm(sh[:, None] - fl[None], axis=-1)
        assert d.min() > 1e-3
