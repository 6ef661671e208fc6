"""Batched k-nearest-neighbor search (replaces pcl::KdTreeFLANN, used by the
reference's scan-to-map loop at mapOptmization.cpp:1283,1355 and ICP).

TPU-native: tiled brute force — distance blocks computed on the MXU via the
||q||^2 + ||t||^2 - 2 q.t expansion, reduced with lax.top_k, streamed over
query chunks with lax.map so the full (Q,T) matrix never materializes.
Feature clouds are small (1e3-1e5 points), so brute force beats tree
traversal on this hardware by a wide margin.

NOT used on the TPU hot path: mapping/_make_knn5 and icp._make_nn1 route
to the fused Pallas kernel there (ops/pallas_knn).  Besides speed, the
lax.map here contains a dot_general, which on the axon runtime
permanently degrades all subsequent dispatches once executed (see
odometry._stage_loop) — this XLA path is for CPU tests and the
SCLOAM_NO_PALLAS exact-NN A/B only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e18   # python float (module-level jnp constants poison the stream)


def _fit_chunk(Q: int, chunk: int) -> int:
    """Largest divisor of Q that is <= chunk (Q is a static pad size)."""
    chunk = min(chunk, Q)
    while Q % chunk:
        chunk -= 1
    return chunk


def _block_sqdist(q, t):
    qq = (q * q).sum(-1)[:, None]
    tt = (t * t).sum(-1)[None, :]
    return jnp.maximum(qq + tt - 2.0 * (q @ t.T), 0.0)


def knn(query: jnp.ndarray, target: jnp.ndarray, target_mask: jnp.ndarray,
        k: int, chunk: int = 512, approx: bool | None = None):
    """query (Q,3), target (T,3) with mask; returns (idx (Q,k), sqd (Q,k)).

    Invalid targets are pushed to +inf distance; callers gate on sqd.
    Q must be divisible by ``chunk`` (pads are powers of two by config).

    ``approx=True`` uses the TPU-native approx_max_k reduction (recall
    ~0.95) instead of a full per-row sort — the LM solvers' robust weights
    tolerate the occasional 6th-nearest substitute, and it is several
    times faster at T ~ 1e5.
    """
    Q = query.shape[0]
    chunk = _fit_chunk(Q, chunk)
    if approx is None:
        approx = target.shape[0] >= 32768   # wins only at large T
    tmask = jnp.where(target_mask, 0.0, _BIG)[None, :]

    def one(qc):
        d = _block_sqdist(qc, target) + tmask
        if approx:
            neg, idx = jax.lax.approx_max_k(-d, k, recall_target=0.95)
        else:
            neg, idx = jax.lax.top_k(-d, k)
        return idx, -neg

    idx, sqd = jax.lax.map(one, query.reshape(-1, chunk, 3))
    return idx.reshape(Q, k), sqd.reshape(Q, k)


def nn1(query: jnp.ndarray, target: jnp.ndarray, target_mask: jnp.ndarray,
        chunk: int = 512):
    """Nearest single neighbor: returns (idx (Q,), sqd (Q,))."""
    Q = query.shape[0]
    chunk = _fit_chunk(Q, chunk)
    tmask = jnp.where(target_mask, 0.0, _BIG)[None, :]

    def one(qc):
        d = _block_sqdist(qc, target) + tmask
        i = jnp.argmin(d, -1)
        return i, jnp.take_along_axis(d, i[:, None], -1)[:, 0]

    idx, sqd = jax.lax.map(one, query.reshape(-1, chunk, 3))
    return idx.reshape(Q), sqd.reshape(Q)
