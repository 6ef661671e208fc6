"""Scan Context place recognition (reference C15/C16: Scancontext.cpp).

Descriptor (makeScancontext, Scancontext.cpp:151-195): a 20x60 polar
max-height image of the (0.5 m downsampled) raw cloud, +2 m lidar-height
offset, 80 m radius — here a single scatter-max.

Retrieval (detectLoopClosureID, Scancontext.cpp:247-338): the reference
kd-trees 20-D ring keys for 10 candidates, then per candidate scans column
shifts (+-10%) minimizing the column-wise cosine distance.  The TPU-native
reformulation evaluates ALL keyframes x ALL 60 shifts in one batched einsum
on the MXU (the "batched descriptor-distance matmul" of BASELINE.json):
column-normalized descriptors make each column-cosine a dot product, and a
circular index gather turns the shift search into diagonal sums of a single
(K, 60, 60) correlation tensor.  This strictly dominates the reference's
two-stage pruning (exact minimum over the full bank), so loop recall is >=
the reference's at the same SC_DIST_THRES.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig, ScanContextConfig

_BIG = 1e9   # python float (module-level jnp constants poison the stream)


class DescriptorBank(NamedTuple):
    """Fixed-capacity descriptor store, sharded over hosts at scale."""

    desc: jnp.ndarray       # (K, R, S) scan contexts
    ringkey: jnp.ndarray    # (K, R) row means (rotation invariant)
    count: jnp.ndarray      # () int32


def init_bank(config: PipelineConfig) -> DescriptorBank:
    sc = config.sc
    K = config.cap.max_keyframes
    return DescriptorBank(
        desc=jnp.zeros((K, sc.num_ring, sc.num_sector), jnp.float32),
        ringkey=jnp.zeros((K, sc.num_ring), jnp.float32),
        count=jnp.int32(0),
    )


def make_descriptor(points: jnp.ndarray, mask: jnp.ndarray,
                    sc: ScanContextConfig) -> jnp.ndarray:
    """(N,3) sensor-frame cloud -> (R,S) scan context.

    Scatter-max of z + lidar_height into polar bins (Scancontext.cpp:151-195;
    empty bins stay 0 as in the reference, where NO_POINT=-1000 bins are
    zeroed before use via the initial zero matrix semantics)."""
    R, S = sc.num_ring, sc.num_sector
    if points.shape[0] > sc.max_input_points:
        stride = -(-points.shape[0] // sc.max_input_points)
        points = points[::stride]
        mask = mask[::stride]
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    rho = jnp.sqrt(x * x + y * y)
    theta = jnp.degrees(jnp.arctan2(y, x)) % 360.0
    ok = mask & (rho < sc.max_radius) & (rho > 1e-3)
    ring = jnp.clip((rho / (sc.max_radius / R)).astype(jnp.int32), 0, R - 1)
    sector = jnp.clip((theta / (360.0 / S)).astype(jnp.int32), 0, S - 1)
    flat = jnp.where(ok, ring * S + sector, 0)
    val = jnp.where(ok, z + sc.lidar_height, -_BIG)
    # Chunked scatter-max: TPU scatters serialize over colliding updates,
    # so one 65k-point scatter is ~memory-latency bound; C independent
    # per-chunk scatters (vmapped) + one max-reduce run ~C-way parallel.
    n = points.shape[0]
    C = 64
    while n % C:
        C //= 2
    desc = jax.vmap(
        lambda f, v: jnp.full((R * S,), -_BIG, jnp.float32).at[f].max(
            v, mode="drop")
    )(flat.reshape(C, -1), val.reshape(C, -1)).max(0)
    desc = jnp.where(desc <= -_BIG * 0.5, 0.0, desc)
    return desc.reshape(R, S)


def ring_key(desc: jnp.ndarray) -> jnp.ndarray:
    """Row means (makeRingkeyFromScancontext, Scancontext.cpp:198-211)."""
    return desc.mean(-1)


def sector_key(desc: jnp.ndarray) -> jnp.ndarray:
    """Column means (makeSectorkeyFromScancontext, Scancontext.cpp:214-227)."""
    return desc.mean(-2)


def append(bank: DescriptorBank, desc: jnp.ndarray, max_k: int,
           should=None) -> DescriptorBank:
    """Guarded append, mirroring mapping.insert_keyframe's cond-free slot
    write: the descriptor is always written at slot ``count`` (invisible —
    readers mask by ``< count``); ``should`` gates only the count bump.
    When full, the write re-writes the last slot's own contents and the
    descriptor is dropped (the bank tracks the keyframe bank exactly)."""
    if should is None:
        should = jnp.bool_(True)
    room = bank.count < max_k
    i = jnp.minimum(bank.count, max_k - 1)
    return DescriptorBank(
        desc=bank.desc.at[i].set(jnp.where(room, desc, bank.desc[i])),
        ringkey=bank.ringkey.at[i].set(
            jnp.where(room, ring_key(desc), bank.ringkey[i])),
        count=bank.count + (should & room).astype(jnp.int32),
    )


def distance_all_shifts(query: jnp.ndarray, bank_desc: jnp.ndarray):
    """Column-wise cosine distance between ``query`` (R,S) and every bank
    descriptor at every circular column shift.

    Returns (K, S) distances.  Columns with zero norm in either descriptor
    are skipped from the mean (distDirectSC, Scancontext.cpp:69-90).

    Shift s compares query column (m+s) % S with bank column m, i.e. shift
    s is the column roll applied to the BANK descriptor that best
    reproduces the query (circshift convention, Scancontext.cpp:39-59).
    Formulation: materialize all S rolled copies of the (tiny) query once
    and contract them against the whole bank in ONE (S, R*S) x (R*S, K)
    matmul — the "batched descriptor-distance matmul" of BASELINE.json.
    (The shifted-diagonal-gather alternative is ~80x slower on TPU: it
    gathers a (K,S,S) tensor with materialized indices instead of running
    on the MXU.)
    """
    K, R, S = bank_desc.shape
    qn = jnp.linalg.norm(query, axis=0)                    # (S,)
    bn = jnp.linalg.norm(bank_desc, axis=1)                # (K,S)
    q_unit = query / jnp.maximum(qn, 1e-12)[None, :]
    b_unit = bank_desc / jnp.maximum(bn, 1e-12)[:, None, :]
    q_ok = (qn > 0).astype(jnp.float32)
    b_ok = (bn > 0).astype(jnp.float32)

    # All rolled query copies: Qs[s, r, m] = q_unit[r, (m+s) % S], with
    # invalid columns zeroed so they contribute no similarity.
    m_idx = jnp.arange(S)[None, :]
    s_idx = jnp.arange(S)[:, None]
    roll_idx = (m_idx + s_idx) % S                         # (S_shift, S_m)
    Qs = (q_unit * q_ok[None, :])[:, roll_idx]             # (R, S_shift, S_m)
    Qs = jnp.swapaxes(Qs, 0, 1)                            # (S_shift, R, S_m)
    q_ok_s = q_ok[roll_idx]                                # (S_shift, S_m)

    # sim_sum[k, s] = sum_{r,m} Qs[s,r,m] * b_unit[k,r,m]   (one MXU matmul)
    sim_sum = jnp.einsum("srm,krm->ks", Qs, b_unit,
                         preferred_element_type=jnp.float32)
    # cnt_sum[k, s] = number of mutually valid columns at that shift.
    cnt_sum = jnp.einsum("sm,km->ks", q_ok_s, b_ok,
                         preferred_element_type=jnp.float32)
    dist = 1.0 - sim_sum / jnp.maximum(cnt_sum, 1.0)
    return jnp.where(cnt_sum > 0, dist, _BIG)


@functools.partial(jax.jit, static_argnums=0)
def detect(config: PipelineConfig, bank: DescriptorBank,
           query_desc: jnp.ndarray):
    """Loop retrieval. Returns (best_idx, best_dist, best_yaw_rad).

    best_idx = -1 when no candidate beats SC_DIST_THRES.  Recent
    ``exclude_recent`` keyframes are excluded (Scancontext.cpp:257-261).
    The returned yaw is the aligning rotation (shift * sector angle),
    reported like Scancontext.cpp:333-336.
    """
    sc = config.sc
    d = distance_all_shifts(query_desc, bank.desc)          # (K,S)
    dist_k = d.min(-1)
    shift_k = jnp.argmin(d, -1)
    K = bank.desc.shape[0]
    ids = jnp.arange(K)
    eligible = (ids < bank.count - sc.exclude_recent)
    dist_k = jnp.where(eligible, dist_k, _BIG)
    best = jnp.argmin(dist_k)
    best_dist = dist_k[best]
    ok = best_dist < sc.dist_threshold
    yaw = shift_k[best].astype(jnp.float32) * (
        2.0 * jnp.pi / sc.num_sector)
    return jnp.where(ok, best, -1), best_dist, yaw
