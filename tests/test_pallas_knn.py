"""Fused 5-NN kernel vs brute force (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu.ops.pallas_knn import knn_pallas


def _ref_knn(q, t, mask, k):
    d = ((q[:, None] - t[None]) ** 2).sum(-1)
    d = np.where(mask[None, :], d, np.inf)
    idx = np.argsort(d, axis=1)[:, :k]
    return idx, np.take_along_axis(d, idx, 1)


def test_matches_bruteforce():
    rng = np.random.default_rng(0)
    Q, T = 256, 2048
    q = rng.normal(0, 5, (Q, 3)).astype(np.float32)
    t = rng.normal(0, 5, (T, 3)).astype(np.float32)
    mask = rng.random(T) > 0.1
    idx, sqd = knn_pallas(jnp.asarray(q), jnp.asarray(t), jnp.asarray(mask),
                          k=5, max_sq_dist=16.0, tile_q=128, block_t=512,
                          interpret=True)
    ref_idx, ref_d = _ref_knn(q, t, mask, 5)
    idx, sqd = np.asarray(idx), np.asarray(sqd)
    # Compare neighbor SETS via distances (quantized ties may reorder).
    close = np.isclose(np.sort(sqd, 1), np.sort(ref_d, 1),
                       atol=16.0 / (2 ** 13))
    assert close[ref_d.max(1) < 16.0].all()
    # Indices must point at genuinely near targets.
    d_actual = ((q[:, None] - t[None]) ** 2).sum(-1)
    got = np.take_along_axis(d_actual, idx, 1)
    ok_rows = ref_d.max(1) < 16.0
    np.testing.assert_allclose(np.sort(got[ok_rows], 1), ref_d[ok_rows],
                               rtol=1e-4, atol=1e-4)


def test_respects_mask_and_saturation():
    Q, T = 128, 512
    q = np.zeros((Q, 3), np.float32)
    t = np.full((T, 3), 100.0, np.float32)   # all far beyond max_sq_dist
    t[3] = [0.1, 0.0, 0.0]
    mask = np.ones(T, bool)
    idx, sqd = knn_pallas(jnp.asarray(q), jnp.asarray(t), jnp.asarray(mask),
                          k=5, max_sq_dist=4.0, tile_q=128, block_t=512,
                          interpret=True)
    # Nearest is index 3 with d=0.01; the rest saturate near max_sq_dist.
    assert (np.asarray(idx)[:, 0] == 3).all()
    np.testing.assert_allclose(np.asarray(sqd)[:, 0], 0.01, atol=1e-3)
    assert (np.asarray(sqd)[:, 1] > 3.9).all()
