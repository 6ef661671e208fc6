import jax.numpy as jnp
import numpy as np

from sc_lego_loam_tpu.ops.compact import compact, compact_indices
from sc_lego_loam_tpu.ops.voxel import voxel_downsample_hash, voxel_decimate


def test_compact_matches_nonzero():
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(1000) > 0.7)
    vals = jnp.asarray(rng.normal(size=(1000, 3)), jnp.float32)
    out, ok = compact(vals, mask, 64)
    ref = np.asarray(vals)[np.asarray(mask)][:64]
    n = min(len(ref), 64)
    assert int(ok.sum()) == n
    np.testing.assert_array_equal(np.asarray(out)[:n], ref)
    assert (np.asarray(out)[n:] == 0).all()


def test_compact_indices_empty_and_full():
    idx, ok = compact_indices(jnp.zeros(16, bool), 8)
    assert int(ok.sum()) == 0
    idx, ok = compact_indices(jnp.ones(16, bool), 8)
    assert int(ok.sum()) == 8
    np.testing.assert_array_equal(np.asarray(idx), np.arange(8))


def test_voxel_hash_centroids():
    pts = jnp.asarray(np.array([
        [0.05, 0.05, 0.05], [0.15, 0.05, 0.05],
        [5.0, 5.0, 5.0],
        [9.0, 9.0, 9.0],
    ], np.float32))
    mask = jnp.array([True, True, True, False])
    out, ok, _ = voxel_downsample_hash(pts, mask, 0.2, 8)
    o = np.asarray(out)[np.asarray(ok)]
    assert len(o) == 2
    got = sorted(o.tolist())
    np.testing.assert_allclose(got[0], [0.1, 0.05, 0.05], atol=1e-6)
    np.testing.assert_allclose(got[1], [5.0, 5.0, 5.0], atol=1e-6)


def test_voxel_hash_extras():
    pts = jnp.asarray(np.array([[0.0, 0, 0], [0.1, 0, 0]], np.float32))
    mask = jnp.array([True, True])
    ex = jnp.asarray(np.array([[2.0], [4.0]], np.float32))
    _, ok, oex = voxel_downsample_hash(pts, mask, 1.0, 4, extras=ex)
    assert int(ok.sum()) == 1
    assert abs(float(oex[0, 0]) - 3.0) < 1e-6


def test_voxel_decimate_one_per_voxel():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0, 10, (5000, 3)), jnp.float32)
    mask = jnp.ones(5000, bool)
    out, ok = voxel_decimate(pts, mask, 1.0, 4096)
    o = np.asarray(out)[np.asarray(ok)]
    # ~1000 voxels occupied; representative points are original points.
    assert 500 < len(o) < 1300
    v = np.floor(o / 1.0).astype(int)
    uniq = {tuple(r) for r in v}
    assert len(uniq) >= len(o) * 0.95   # rare hash collisions only
