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

_SENT = jnp.int32(2**30)


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
