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

_BIG = jnp.float32(1e9)


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
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    rho = jnp.sqrt(x * x + y * y)
    theta = jnp.degrees(jnp.arctan2(y, x)) % 360.0
    ok = mask & (rho < sc.max_radius) & (rho > 1e-3)
    ring = jnp.clip((rho / (sc.max_radius / R)).astype(jnp.int32), 0, R - 1)
    sector = jnp.clip((theta / (360.0 / S)).astype(jnp.int32), 0, S - 1)
    flat = ring * S + sector
    val = jnp.where(ok, z + sc.lidar_height, -_BIG)
    desc = jnp.full((R * S,), -_BIG, jnp.float32).at[
        jnp.where(ok, flat, 0)].max(val, mode="drop")
    desc = jnp.where(desc <= -_BIG * 0.5, 0.0, desc)
    return desc.reshape(R, S)


def ring_key(desc: jnp.ndarray) -> jnp.ndarray:
    """Row means (makeRingkeyFromScancontext, Scancontext.cpp:198-211)."""
    return desc.mean(-1)


def sector_key(desc: jnp.ndarray) -> jnp.ndarray:
    """Column means (makeSectorkeyFromScancontext, Scancontext.cpp:214-227)."""
    return desc.mean(-2)


def append(bank: DescriptorBank, desc: jnp.ndarray,
           max_k: int) -> DescriptorBank:
    i = jnp.minimum(bank.count, max_k - 1)
    return DescriptorBank(
        desc=bank.desc.at[i].set(desc),
        ringkey=bank.ringkey.at[i].set(ring_key(desc)),
        count=jnp.minimum(bank.count + 1, max_k),
    )


def distance_all_shifts(query: jnp.ndarray, bank_desc: jnp.ndarray):
    """Column-wise cosine distance between ``query`` (R,S) and every bank
    descriptor at every circular column shift.

    Returns (K, S) distances.  Columns with zero norm in either descriptor
    are skipped from the mean (distDirectSC, Scancontext.cpp:69-90).
    """
    K, R, S = bank_desc.shape
    qn = jnp.linalg.norm(query, axis=0)                    # (S,)
    bn = jnp.linalg.norm(bank_desc, axis=1)                # (K,S)
    q_unit = query / jnp.maximum(qn, 1e-12)[None, :]
    b_unit = bank_desc / jnp.maximum(bn, 1e-12)[:, None, :]
    q_ok = (qn > 0).astype(jnp.float32)
    b_ok = (bn > 0).astype(jnp.float32)

    # M[k, j, m] = cos sim of query col j with bank-k col m  (MXU einsum).
    M = jnp.einsum("rj,krm->kjm", q_unit, b_unit,
                   preferred_element_type=jnp.float32)
    M = M * q_ok[None, :, None] * b_ok[:, None, :]
    Nv = q_ok[None, :, None] * b_ok[:, None, :]            # valid-col indicator

    # Shift s compares query col (m+s) % S with bank col m (i.e. shift s is
    # the column roll applied to the BANK descriptor that best reproduces
    # the query: query ~ roll(bank, s, axis=cols), matching the circshift
    # convention of Scancontext.cpp:39-59).  Sum over the wrapped diagonal
    # via a circular gather.
    m_idx = jnp.arange(S)[:, None]
    s_idx = jnp.arange(S)[None, :]
    gather = (m_idx + s_idx) % S                           # (S_m, S_shift)
    Mt = jnp.swapaxes(M, 1, 2)                             # (K, m, j)
    Nt = jnp.swapaxes(Nv, 1, 2)
    sims = jnp.take_along_axis(
        Mt, gather[None].repeat(K, 0), axis=2)             # (K, S_m, S_shift)
    cnts = jnp.take_along_axis(Nt, gather[None].repeat(K, 0), axis=2)
    sim_sum = sims.sum(1)                                  # (K, S)
    cnt_sum = cnts.sum(1)
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
