"""Fused 5-NN kernel vs brute force (interpret mode on CPU).

The kernel selects candidates as per-128-lane chunk minima (see
ops/pallas_knn.py): the top-1 neighbor is exact; deeper neighbors can be
replaced by the next-nearest when two true neighbors share a chunk, with
probability ~C(k,2)*128/T per query for randomly ordered targets."""

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


def test_near_exact_vs_bruteforce():
    rng = np.random.default_rng(0)
    Q, T, K = 256, 8192, 5
    q = rng.normal(0, 5, (Q, 3)).astype(np.float32)
    t = rng.normal(0, 5, (T, 3)).astype(np.float32)   # random order ~ hash
    mask = rng.random(T) > 0.1
    idx, sqd = knn_pallas(jnp.asarray(q), jnp.asarray(t), jnp.asarray(mask),
                          k=K, max_sq_dist=16.0, tile_q=128, block_t=1024,
                          interpret=True)
    ref_idx, ref_d = _ref_knn(q, t, mask, K)
    idx, sqd = np.asarray(idx), np.asarray(sqd)

    # Top-1 is exact wherever it lies safely inside the quantization range.
    rows = ref_d[:, 0] < 15.0
    assert (idx[rows, 0] == ref_idx[rows, 0]).all()

    # Unsaturated slots report honest distances for their indices.
    d_actual = ((q[:, None] - t[None]) ** 2).sum(-1)
    got = np.take_along_axis(d_actual, idx, 1)
    live = sqd < 15.9          # saturated slots mean "no neighbor in range"
    np.testing.assert_allclose(got[live], sqd[live], atol=16.0 / 2 ** 12)

    # High per-neighbor recall vs the exact top-5 where all 5 are in range
    # (collision prob ~10*128/8192 = 16% per QUERY => recall >> 0.9).
    full_rows = ref_d[:, -1] < 15.0
    recall = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / K
        for i in range(Q) if full_rows[i]])
    assert recall > 0.9, recall

    # Every live returned neighbor is within the ref 7-NN distance bound
    # (a chunk collision skips at most a couple of ranks).
    _, ref_d7 = _ref_knn(q, t, mask, K + 2)
    ok = got[full_rows] <= ref_d7[full_rows, -1][:, None] + 1e-2
    assert ok.mean() > 0.99


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
