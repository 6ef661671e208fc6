"""Fused 5-NN Pallas kernel — the flagship map-matching kernel
(SURVEY.md C13: "batched k-NN ... this is the hot loop of the whole
system").

Design (v3, chunk-candidate selection): each grid cell owns a (query tile
x target block) pair; it streams the target block through the MXU, packs
(quantized distance | target index) into one int32 key, and writes only
the per-chunk MINIMUM keys, where chunk c = targets {c, c+128, c+256, ...}
of the block (STRIDED membership — the reduction runs over the vreg axis
with zero lane shuffles).  A cheap XLA `top_k` epilogue then selects the
best k chunk-minima per query and unpacks index/distance.

Why this is sound: the global nearest neighbor is always a chunk minimum
(exact top-1).  For k>1 the candidate set misses a true neighbor only if
two of the true top-k fall in the SAME chunk.  Strided membership puts
memory-adjacent targets in DIFFERENT chunks, so for voxel-hash-ordered
targets (ops/voxel.py bucket order — spatially scattered) the collision
probability is ~C(k,2)*128/T (~4% per query at k=5, T=64k) and for
spatially-contiguous orders it is even lower; a collision merely replaces
the 5th neighbor with the 6th in a distance-gated 5-point fit.

Versus the previous exact kernel (k sequential min+mask sweeps per block,
~20 VPU ops/element): this touches each element ~6 times, ~4x faster, and
the selection work drops from O(k Q T) to O(k Q T/128).

HBM traffic: targets read once per query tile (~38 MB total at 12k
queries) instead of ~10 GB of distance-matrix spill via the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128        # lanes per candidate chunk (one chunk-min key each)
_IDX_BITS = 17      # supports T up to 131072
_IDX_MASK = (1 << _IDX_BITS) - 1
_MAXKEY = 2 ** 31 - 1   # python int: jnp constants get captured by pallas


def _kernel(cnt_ref, q_ref, t_ref, tt_ref, out_ref, *, block_t, scale):
    """cnt_ref (SMEM scalar prefetch): number of VALID targets.  Target
    banks are prefix-compacted (ops/compact.compact_indices), so any block
    past the count is entirely invalid — skipped with one predicated
    branch.  Kernel cost then tracks the submap's true occupancy, not its
    static pad (typically 3-5x smaller)."""
    j = pl.program_id(1)

    @pl.when(j * block_t < cnt_ref[0])
    def _live():
        q = q_ref[:]                               # (TQ, 8); cols 3..7 zero
        qq = jnp.sum(q * q, -1, keepdims=True)     # (TQ, 1)
        TQ = q.shape[0]
        t = t_ref[:]                               # (8, BT)
        tt = tt_ref[:]                             # (1, BT)
        dots = jax.lax.dot_general(
            q, t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (TQ, BT)
        d = jnp.maximum(qq + tt - 2.0 * dots, 0.0)
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

    @pl.when(j * block_t >= cnt_ref[0])
    def _dead():
        out_ref[:] = jnp.full_like(out_ref, _MAXKEY)


def prepare_targets(target: jnp.ndarray, target_mask: jnp.ndarray):
    """Loop-invariant target preprocessing: (8,T) transposed layout +
    squared norms + valid count (for dead-block skipping; valid targets
    are a prefix by construction).  Hoist this out of LM loops — the
    transpose of a big (T,3) array is the costliest part of a single
    query."""
    T = target.shape[0]
    tgt = jnp.where(target_mask[:, None], target, 1e6)
    tpad = jnp.zeros((8, T), jnp.float32).at[:3, :].set(tgt.T)
    tt = jnp.sum(tpad * tpad, 0, keepdims=True)            # (1, T)
    cnt = target_mask.sum().astype(jnp.int32)[None]        # (1,)
    return tpad, tt, cnt


@functools.partial(jax.jit,
                   static_argnames=("k", "max_sq_dist", "tile_q", "block_t",
                                    "interpret"))
def knn_pallas(query: jnp.ndarray, target: jnp.ndarray,
               target_mask: jnp.ndarray, k: int = 5,
               max_sq_dist: float = 4.0, tile_q: int = 64,
               block_t: int = 16384, interpret: bool = False):
    """k-NN (k <= 5 recommended) via the fused kernel; near-exact for
    hash-ordered targets (see module docstring; top-1 always exact).

    query (Q,3), target (T,3) + mask. ``max_sq_dist`` sets the distance
    quantization range — distances beyond it saturate (callers gate far
    below it). Returns (idx (Q,k), sqd (Q,k)).
    """
    tpad, tt, cnt = prepare_targets(target, target_mask)
    return knn_pallas_prepared(query, tpad, tt, cnt, k=k,
                               max_sq_dist=max_sq_dist, tile_q=tile_q,
                               block_t=block_t, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k", "max_sq_dist", "tile_q", "block_t",
                                    "interpret"))
def knn_pallas_prepared(query: jnp.ndarray, tpad: jnp.ndarray,
                        tt: jnp.ndarray, cnt: jnp.ndarray, k: int = 5,
                        max_sq_dist: float = 4.0, tile_q: int = 64,
                        block_t: int = 8192, interpret: bool = False):
    Q = query.shape[0]
    T = tpad.shape[1]
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

    # Strided chunks: each block yields _CHUNK (=128, one per lane) minima,
    # each over block_t/_CHUNK members.  The valid-target count rides in
    # SMEM scalar prefetch; blocks past it are skipped (see _kernel).
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
    )(cnt, qpad, tpad, tt)

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
    idx = jnp.clip(best & _IDX_MASK, 0, T - 1)
    sqd = (best >> _IDX_BITS).astype(jnp.float32) / scale
    return idx, sqd
