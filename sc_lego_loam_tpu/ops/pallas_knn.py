"""Fused 5-NN Pallas kernel — the flagship map-matching kernel
(SURVEY.md C13: "batched k-NN ... this is the hot loop of the whole
system").

The XLA path (ops/knn.py) materializes 134 MB distance blocks in HBM and
runs a separate top-k pass (~40 ms at 12k x 65k).  This kernel keeps
everything in VMEM: the full target set (8 x T layout, <=2 MB) stays
resident; each program owns a query tile, streams target blocks through
the MXU, packs (quantized distance | target index) into one int32 key,
extracts each block's top-k with k min+mask sweeps, and folds them into a
running best-8 buffer.  Every global top-5 neighbor is necessarily within
its own block's top-5, so the final 8-slot buffer contains the exact
top-5 (up to distance quantization, which only affects tie order — the
consumers gate on distance and gather points by index).

HBM traffic: targets read once per query tile (~38 MB total at 12k
queries) instead of ~10 GB of distance-matrix spill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOTS = 8          # running-best buffer width (>= k, power of two)
_IDX_BITS = 17      # supports T up to 131072
_IDX_MASK = (1 << _IDX_BITS) - 1
_MAXKEY = 2 ** 31 - 1   # python int: jnp constants get captured by pallas


def _kernel(q_ref, t_ref, tt_ref, out_d_ref, out_i_ref, *, n_blocks,
            block_t, k, scale):
    q = q_ref[:]                                   # (TQ, 8); cols 3..7 zero
    qq = jnp.sum(q * q, -1, keepdims=True)         # (TQ, 1)
    TQ = q.shape[0]

    def block(j, best):
        t = t_ref[:, pl.ds(j * block_t, block_t)]          # (8, BT)
        tt = tt_ref[:, pl.ds(j * block_t, block_t)]        # (1, BT)
        dots = jax.lax.dot_general(
            q, t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (TQ, BT)
        d = jnp.maximum(qq + tt - 2.0 * dots, 0.0)
        dq = jnp.clip(d * scale, 0, float((1 << (31 - _IDX_BITS)) - 2)
                      ).astype(jnp.int32)
        gidx = j * block_t + jax.lax.broadcasted_iota(
            jnp.int32, (TQ, block_t), 1)
        key = (dq << _IDX_BITS) | (gidx & _IDX_MASK)

        for _ in range(k):
            m = jnp.min(key, -1, keepdims=True)            # (TQ, 1)
            # Every key is distinct (unique index bits; sentinels are made
            # distinct below), so the max slot is unique — no tie breaking.
            worst = jnp.max(best, -1, keepdims=True)
            best = jnp.where((best == worst) & (m < worst), m, best)
            key = jnp.where(key == m, jnp.int32(_MAXKEY), key)
        return best

    best0 = (jnp.full((TQ, _SLOTS), _MAXKEY, jnp.int32) -
             jax.lax.broadcasted_iota(jnp.int32, (TQ, _SLOTS), 1))
    best = jax.lax.fori_loop(0, n_blocks, block, best0)
    out_i_ref[:] = best & _IDX_MASK
    out_d_ref[:] = (best >> _IDX_BITS).astype(jnp.float32) / scale


def prepare_targets(target: jnp.ndarray, target_mask: jnp.ndarray):
    """Loop-invariant target preprocessing: (8,T) transposed layout +
    squared norms.  Hoist this out of LM loops — the transpose of a big
    (T,3) array is the costliest part of a single query."""
    T = target.shape[0]
    tgt = jnp.where(target_mask[:, None], target, 1e6)
    tpad = jnp.zeros((8, T), jnp.float32).at[:3, :].set(tgt.T)
    tt = jnp.sum(tpad * tpad, 0, keepdims=True)            # (1, T)
    return tpad, tt


@functools.partial(jax.jit,
                   static_argnames=("k", "max_sq_dist", "tile_q", "block_t",
                                    "interpret"))
def knn_pallas(query: jnp.ndarray, target: jnp.ndarray,
               target_mask: jnp.ndarray, k: int = 5,
               max_sq_dist: float = 4.0, tile_q: int = 256,
               block_t: int = 2048, interpret: bool = False):
    """Exact k-NN (k <= 5 recommended) via the fused kernel.

    query (Q,3), target (T,3) + mask. ``max_sq_dist`` sets the distance
    quantization range — distances beyond it saturate (callers gate far
    below it). Returns (idx (Q,k), sqd (Q,k)).
    """
    tpad, tt = prepare_targets(target, target_mask)
    return knn_pallas_prepared(query, tpad, tt, k=k, max_sq_dist=max_sq_dist,
                               tile_q=tile_q, block_t=block_t,
                               interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k", "max_sq_dist", "tile_q", "block_t",
                                    "interpret"))
def knn_pallas_prepared(query: jnp.ndarray, tpad: jnp.ndarray,
                        tt: jnp.ndarray, k: int = 5,
                        max_sq_dist: float = 4.0, tile_q: int = 256,
                        block_t: int = 2048, interpret: bool = False):
    Q = query.shape[0]
    T = tpad.shape[1]
    assert Q % tile_q == 0 and T % block_t == 0, (Q, T)
    assert T <= (1 << _IDX_BITS)
    scale = float((1 << (31 - _IDX_BITS)) - 4) / float(max_sq_dist)

    qpad = jnp.zeros((Q, 8), jnp.float32).at[:, :3].set(query)

    grid = (Q // tile_q,)
    out_d, out_i = pl.pallas_call(
        functools.partial(_kernel, n_blocks=T // block_t, block_t=block_t,
                          k=k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, _SLOTS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, _SLOTS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, _SLOTS), jnp.float32),
            jax.ShapeDtypeStruct((Q, _SLOTS), jnp.int32),
        ),
        interpret=interpret,
    )(qpad, tpad, tt)

    # The 8-slot buffer is unordered; take the k smallest.
    neg, order = jax.lax.top_k(-out_d, k)
    idx = jnp.take_along_axis(out_i, order, -1)
    # Saturated slots (beyond max_sq_dist or empty) -> clamp index, flag
    # with the saturated distance so caller gates reject them.
    idx = jnp.clip(idx, 0, T - 1)
    return idx, -neg
