"""Fused 5-NN Pallas kernel — the flagship map-matching kernel
(SURVEY.md C13: "batched k-NN ... this is the hot loop of the whole
system").

Design (v3, chunk-candidate selection): each grid cell owns a (query tile
x target block) pair; it streams the target block through the MXU, packs
(quantized distance | target index) into one int32 key, and writes only
the per-chunk MINIMUM keys, where chunk c = targets {c, c+128, c+256, ...}
of the block (STRIDED membership — the reduction runs over the vreg axis
with zero lane shuffles).  A cheap XLA epilogue of k masked-min sweeps
then selects the best k chunk-minima per query and unpacks index/distance.

Occupancy awareness (v4): the scalar-prefetched counts carry the number of
VALID targets AND queries; grid cells entirely past either count skip the
matmul (one predicated branch).  prepare_targets prefix-compacts the
targets itself (so the contract cannot be violated by a holey mask — the
round-3 advisor finding) and callers prefix-compact queries; kernel cost
then tracks true occupancy of both sides, not the static pads (2-5x).

Why this is sound: the global nearest neighbor is always a chunk minimum
(exact top-1).  For k>1 the candidate set misses a true neighbor only if
two of the true top-k fall in the SAME chunk.  Strided membership puts
memory-adjacent targets in DIFFERENT chunks, so for voxel-hash-ordered
targets (ops/voxel.py bucket order — spatially scattered) the collision
probability is ~C(k,2)*128/T (~4% per query at k=5, T=64k) and for
spatially-contiguous orders it is even lower; a collision merely replaces
the 5th neighbor with the 6th in a distance-gated 5-point fit.

HBM traffic: targets read once per query tile (~38 MB total at 12k
queries) instead of ~10 GB of distance-matrix spill via the XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128        # lanes per candidate chunk (one chunk-min key each)
_IDX_BITS = 17      # supports T up to 131072
_IDX_MASK = (1 << _IDX_BITS) - 1
_MAXKEY = 2 ** 31 - 1   # python int: jnp constants get captured by pallas


class PreparedTargets(NamedTuple):
    """Loop-invariant target-side state for knn_pallas_prepared."""

    tpad: jnp.ndarray   # (8, T) prefix-compacted transposed coordinates
    tt: jnp.ndarray     # (1, T) squared norms
    cnt: jnp.ndarray    # (1,) number of valid targets
    perm: jnp.ndarray   # (T,) compacted slot -> original target index


def _kernel(cnt_ref, q_ref, t_ref, tt_ref, out_ref, *, block_t, scale):
    """cnt_ref (SMEM scalar prefetch): [n_valid_targets, n_valid_queries].
    Targets are prefix-compacted BY prepare_targets, queries by the caller
    (ops/compact), so any block past its count is entirely invalid —
    skipped with one predicated branch."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile_q = out_ref.shape[0]

    @pl.when((j * block_t < cnt_ref[0]) & (i * tile_q < cnt_ref[1]))
    def _live():
        q = q_ref[:]                               # (TQ, 8); cols 3..7 zero
        qq = jnp.sum(q * q, -1, keepdims=True)     # (TQ, 1)
        TQ = q.shape[0]
        t = t_ref[:]                               # (8, BT)
        tt = tt_ref[:]                             # (1, BT)
        dots = jax.lax.dot_general(
            q, t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (TQ, BT)
        d = qq + tt - 2.0 * dots
        # Negative d (numerical) is handled by the clip's lower bound.
        dq = jnp.clip(d * scale, 0, float((1 << (31 - _IDX_BITS)) - 2)
                      ).astype(jnp.int32)
        gidx = j * block_t + jax.lax.broadcasted_iota(
            jnp.int32, (TQ, block_t), 1)
        key = (dq << _IDX_BITS) | (gidx & _IDX_MASK)
        # STRIDED chunks: output lane l holds min over targets
        # {l, 128+l, ...} within the block — a reduction over the middle
        # (vreg) axis, which is pure element-wise vreg mins.  Reducing over
        # the last axis instead (contiguous chunks) needs log2(128)
        # in-register lane shuffles per vreg and measured ~10x slower.
        # Chunk membership is internal: the packed key carries the true
        # target index, so callers are unaffected.
        out_ref[:] = jnp.min(
            key.reshape(TQ, block_t // _CHUNK, _CHUNK), axis=1)

    @pl.when((j * block_t >= cnt_ref[0]) | (i * tile_q >= cnt_ref[1]))
    def _dead():
        out_ref[:] = jnp.full_like(out_ref, _MAXKEY)


def prepare_targets(target: jnp.ndarray,
                    target_mask: jnp.ndarray) -> PreparedTargets:
    """Loop-invariant target preprocessing: prefix-compaction + (8,T)
    transposed layout + squared norms + valid count (for dead-block
    skipping).  Hoist this out of LM loops — the transpose of a big (T,3)
    array is the costliest part of a single query.

    Compacting HERE (one cumsum + gather) makes the dead-block-skip
    contract self-enforcing for ANY caller mask — and packs valid targets
    densely, so the live-block count is minimal.  Kernel indices refer to
    the ORIGINAL target array via ``perm``."""
    from .compact import compact_indices
    T = target.shape[0]
    perm, ok = compact_indices(target_mask, T)
    tgt = jnp.where(ok[:, None], target[perm], 1e6)
    tpad = jnp.zeros((8, T), jnp.float32).at[:3, :].set(tgt.T)
    tt = jnp.sum(tpad * tpad, 0, keepdims=True)            # (1, T)
    cnt = ok.sum().astype(jnp.int32)[None]                 # (1,)
    return PreparedTargets(tpad=tpad, tt=tt, cnt=cnt, perm=perm)


@functools.partial(jax.jit,
                   static_argnames=("k", "max_sq_dist", "tile_q", "block_t",
                                    "interpret"))
def knn_pallas(query: jnp.ndarray, target: jnp.ndarray,
               target_mask: jnp.ndarray, k: int = 5,
               max_sq_dist: float = 4.0, tile_q: int = 64,
               block_t: int = 16384, interpret: bool = False,
               qcnt: jnp.ndarray | None = None):
    """k-NN (k <= 5 recommended) via the fused kernel; near-exact for
    hash-ordered targets (see module docstring; top-1 always exact).

    query (Q,3), target (T,3) + mask. ``max_sq_dist`` sets the distance
    quantization range — distances beyond it saturate (callers gate far
    below it).  ``qcnt``: number of valid queries IF the query array is
    prefix-compacted (enables query-side tile skipping; omit for dense
    queries).  Returns (idx (Q,k), sqd (Q,k))."""
    prep = prepare_targets(target, target_mask)
    return knn_pallas_prepared(query, prep, k=k,
                               max_sq_dist=max_sq_dist, tile_q=tile_q,
                               block_t=block_t, interpret=interpret,
                               qcnt=qcnt)


@functools.partial(jax.jit,
                   static_argnames=("k", "max_sq_dist", "tile_q", "block_t",
                                    "interpret"))
def knn_pallas_prepared(query: jnp.ndarray, prep: PreparedTargets,
                        k: int = 5, max_sq_dist: float = 4.0,
                        tile_q: int = 64, block_t: int = 8192,
                        interpret: bool = False,
                        qcnt: jnp.ndarray | None = None):
    Q = query.shape[0]
    T = prep.tpad.shape[1]
    # Largest block <= requested that divides T (T need not be a power of
    # two: submaps are submap_recent_num x store-size unions).
    block_t = min(block_t, T)
    block_t -= block_t % _CHUNK
    while block_t > _CHUNK and T % block_t:
        block_t -= _CHUNK
    assert Q % tile_q == 0 and T % block_t == 0, (Q, T, block_t)
    assert T <= (1 << _IDX_BITS)
    assert block_t % _CHUNK == 0
    scale = float((1 << (31 - _IDX_BITS)) - 4) / float(max_sq_dist)

    qpad = jnp.zeros((Q, 8), jnp.float32).at[:, :3].set(query)
    if qcnt is None:
        qcnt = jnp.full((1,), Q, jnp.int32)
    cnts = jnp.concatenate([prep.cnt.reshape(-1),
                            qcnt.reshape(-1)]).astype(jnp.int32)

    # Strided chunks: each block yields _CHUNK (=128, one per lane) minima,
    # each over block_t/_CHUNK members.  The valid counts ride in SMEM
    # scalar prefetch; blocks past either count are skipped (see _kernel).
    grid = (Q // tile_q, T // block_t)
    cmin = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_q, 8), lambda i, j, c: (i, 0)),
                pl.BlockSpec((8, block_t), lambda i, j, c: (0, j)),
                pl.BlockSpec((1, block_t), lambda i, j, c: (0, j)),
            ],
            out_specs=pl.BlockSpec((tile_q, _CHUNK), lambda i, j, c: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((Q, (T // block_t) * _CHUNK),
                                       jnp.int32),
        interpret=interpret,
    )(cnts, qpad, prep.tpad, prep.tt)

    # Top-k chunk-minimum keys (ascending key = ascending distance).
    # k iterative masked mins instead of lax.top_k: top_k lowers to a full
    # sort of the (Q, n_chunks) key matrix on TPU (log^2 n bitonic passes
    # of the whole array); k<=5 min+mask sweeps touch it only 2k times.
    if cmin.shape[1] < k:                          # tiny target sets
        cmin = jnp.concatenate(
            [cmin, jnp.full((Q, k), _MAXKEY, jnp.int32)], axis=1)
    cols = []
    for _ in range(k):
        m = jnp.min(cmin, axis=1, keepdims=True)   # (Q, 1)
        cols.append(m[:, 0])
        cmin = jnp.where(cmin == m, _MAXKEY, cmin)
    best = jnp.stack(cols, axis=1)                 # (Q, k)
    idx = prep.perm[jnp.clip(best & _IDX_MASK, 0, T - 1)]
    sqd = (best >> _IDX_BITS).astype(jnp.float32) / scale
    return idx, sqd
