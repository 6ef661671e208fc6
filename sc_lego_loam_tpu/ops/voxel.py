"""Voxel-grid downsampling (replaces pcl::VoxelGrid, used by the reference
at featureAssociation.cpp:225 and mapOptmization.cpp:262-272).

TPU-native formulation with fixed shapes: points are lexicographically
sorted by integer voxel coordinates (three stable argsorts — exact, no hash
collisions), group boundaries come from consecutive-key inequality, and the
per-voxel centroid is a segment-mean scattered into a fixed-size padded
output.  Matches PCL semantics (centroid of the points in each voxel); the
output voxel order differs (sorted by coords vs PCL's hash order), which no
consumer depends on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENT = 2**30   # python int (module-level jnp constants poison the stream)


def voxel_keys(points: jnp.ndarray, mask: jnp.ndarray, leaf: float):
    """Integer voxel coords (N,3) with invalid points pushed to a sentinel."""
    v = jnp.floor(points / leaf).astype(jnp.int32)
    return jnp.where(mask[:, None], v, _SENT)


def _lex_order(v: jnp.ndarray) -> jnp.ndarray:
    """Stable lexicographic argsort of (N,3) int rows (x major)."""
    order = jnp.argsort(v[:, 2], stable=True)
    order = order[jnp.argsort(v[order, 1], stable=True)]
    order = order[jnp.argsort(v[order, 0], stable=True)]
    return order


def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     out_pad: int, extras: jnp.ndarray | None = None):
    """Centroid-downsample a padded cloud.

    points: (N,3), mask: (N,) bool, leaf: voxel edge (m), out_pad: output
    capacity.  extras: optional (N,K) per-point channels averaged alongside.
    Returns (out_points (out_pad,3), out_mask (out_pad,), out_extras or None).
    """
    v = voxel_keys(points, mask, leaf)
    order = _lex_order(v)
    vs = v[order]
    ps = points[order]
    ms = mask[order]

    new_group = jnp.any(vs != jnp.roll(vs, 1, 0), axis=1)
    new_group = new_group.at[0].set(True)
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1   # (N,) group index

    n = points.shape[0]
    w = ms.astype(points.dtype)
    gsum = jnp.zeros((n, 3), points.dtype).at[gid].add(ps * w[:, None])
    gcnt = jnp.zeros((n,), points.dtype).at[gid].add(w)
    centroid = gsum / jnp.maximum(gcnt, 1.0)[:, None]

    out_pts = centroid[:out_pad]
    out_mask = (gcnt[:out_pad] > 0)
    out_pts = jnp.where(out_mask[:, None], out_pts, 0.0)
    if extras is not None:
        es = extras[order]
        esum = jnp.zeros((n, extras.shape[1]), extras.dtype).at[gid].add(
            es * w[:, None])
        out_ex = esum[:out_pad] / jnp.maximum(gcnt[:out_pad], 1.0)[:, None]
        out_ex = jnp.where(out_mask[:, None], out_ex, 0.0)
        return out_pts, out_mask, out_ex
    return out_pts, out_mask, None


def downsample_count(mask_out: jnp.ndarray) -> jnp.ndarray:
    return mask_out.sum().astype(jnp.int32)


def voxel_downsample_hash(points: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                          out_pad: int, table_bits: int = 16,
                          extras: jnp.ndarray | None = None):
    """Hash-bucket centroid voxel downsample — the sort-free fast path.

    Same semantics as voxel_downsample (per-voxel centroids) except voxels
    are identified by a hashed id, so rare collisions merge distant voxels
    (~load-factor/2 probability per bucket); all hot-path consumers
    (feature DS, scan DS, submap assembly) tolerate that.  Cost: two
    scatter-adds + a cumsum compaction — no argsort.
    """
    from .compact import compact_indices
    T = 1 << table_bits
    v = jnp.floor(points / leaf).astype(jnp.int32)
    h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349669) ^ (v[:, 2] * 83492791)
    bucket = jnp.where(mask, (h & (T - 1)).astype(jnp.int32), 0)
    w = mask.astype(points.dtype)
    sums = jnp.zeros((T, 3), points.dtype).at[bucket].add(
        points * w[:, None], mode="drop")
    cnts = jnp.zeros((T,), points.dtype).at[bucket].add(w, mode="drop")
    occupied = cnts > 0
    idx, ok = compact_indices(occupied, out_pad)
    centroid = sums[idx] / jnp.maximum(cnts[idx], 1.0)[:, None]
    out = jnp.where(ok[:, None], centroid, 0.0)
    if extras is not None:
        esums = jnp.zeros((T, extras.shape[1]), extras.dtype).at[bucket].add(
            extras * w[:, None], mode="drop")
        eout = esums[idx] / jnp.maximum(cnts[idx], 1.0)[:, None]
        return out, ok, jnp.where(ok[:, None], eout, 0.0)
    return out, ok, None


def voxel_decimate(points: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                   out_pad: int, table_bits: int = 18,
                   return_indices: bool = False):
    """O(n) voxel decimation: keep ONE representative point per voxel via a
    hash scatter-min (no sort).  Used for large submap assembly where the
    map is only a nearest-neighbor target — PCL-style centroids (see
    voxel_downsample) are unnecessary there, and the three stable argsorts
    they need dominate the frame budget at ~1e6 points.

    Hash collisions merge distant voxels (rare at 2^table_bits buckets);
    acceptable for NN targets. Returns (points (out_pad,3), mask (out_pad,))
    [+ source indices (out_pad,) with return_indices=True, for gathering
    per-point side channels of the winners].
    """
    n = points.shape[0]
    T = 1 << table_bits
    v = jnp.floor(points / leaf).astype(jnp.int32)
    h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349669) ^ (v[:, 2] * 83492791)
    bucket = jnp.where(mask, (h & (T - 1)).astype(jnp.int32), 0)
    idx = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), n)
    # Chunked scatter-min (TPU scatters serialize over colliding updates;
    # C independent chunk scatters + one min-reduce run C-way parallel —
    # this call sees ~1e6 updates per submap rebuild, so wide chunking
    # pays: 64 x 2^18 int32 tables are 67 MB of sequential HBM traffic
    # (~0.2 ms) against a ~4x cut in serialized scatter depth).
    C = 64
    while n % C:
        C //= 2
    winner = jax.vmap(
        lambda b, i: jnp.full((T,), n, jnp.int32).at[b].min(i, mode="drop")
    )(bucket.reshape(C, -1), idx.reshape(C, -1)).min(0)
    occupied = winner < n
    # Compact occupied buckets to the fixed-size output (sort-free).
    from .compact import compact_indices
    sel, ok = compact_indices(occupied, out_pad)
    out_idx = jnp.clip(winner[sel], 0, n - 1)
    out = jnp.where(ok[:, None], points[out_idx], 0.0)
    if return_indices:
        return out, ok, out_idx
    return out, ok
