"""Segmented-cloud assembly (reference C6: imageProjection.cpp:312-368).

The reference packs surviving pixels into a per-ring contiguous point list
(the ``segmentedCloud`` + ``cloud_info`` side channel).  The TPU-native
equivalent keeps the (H, W) grid shape and *compacts each row in place*:
pixels to keep are sorted to the front of their row in column order via one
argsort per row (key = col for kept pixels, +inf otherwise).  Downstream
stages (curvature, sectioning, picking) then operate on fixed-shape (H, W)
arrays with a per-row count — no dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import LidarConfig, SegmentationConfig
from .projection import RangeImage
from .segmentation import Segmentation


class SegmentedCloud(NamedTuple):
    """Per-ring compacted segmented cloud. All (H, W) unless noted.

    Mirrors the ``cloud_info`` contract (cloud_msgs/msg/cloud_info.msg:1-12):
    per-point ground flag, column index and range, plus per-ring counts in
    place of start/end indices.
    """

    xyz: jnp.ndarray        # (H, W, 3)
    rng: jnp.ndarray        # (H, W) range
    col: jnp.ndarray        # (H, W) original column index
    ground: jnp.ndarray     # (H, W) bool
    valid: jnp.ndarray      # (H, W) bool — position < per-ring count
    count: jnp.ndarray      # (H,) int32 kept points per ring
    rel_time: jnp.ndarray   # (H, W) intra-scan relative time


class OutlierCloud(NamedTuple):
    xyz: jnp.ndarray        # (H, W, 3) row-compacted
    valid: jnp.ndarray      # (H, W)
    count: jnp.ndarray      # (H,)
    rel_time: jnp.ndarray   # (H, W) intra-scan relative time (outliers are
                            # skewed like every other return; the mapping
                            # path de-skews them with the solved twist)


def compact(img: RangeImage, seg_res: Segmentation, ground: jnp.ndarray,
            lidar: LidarConfig, seg: SegmentationConfig
            ) -> tuple[SegmentedCloud, OutlierCloud]:
    H, W = img.rng.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    # Keep rule (imageProjection.cpp:326-351): cluster points always; ground
    # points only every 5th column (plus the ring edges).
    ground_keep = ground & (
        (cols % seg.ground_keep_stride == 0) | (cols <= 5) | (cols >= W - 5))
    keep = seg_res.is_cluster | ground_keep

    # Outliers (imageProjection.cpp:328-335): failed-segment pixels above the
    # ground rows, every 5th column.
    out_keep = seg_res.is_outlier & (rows > lidar.ground_scan_ind) & (
        cols % seg.outlier_keep_stride == 0)

    segmented = _row_compact(img, keep, ground, cols)
    outlier = _row_compact(img, out_keep, ground, cols)
    out = OutlierCloud(xyz=outlier.xyz, valid=outlier.valid,
                       count=outlier.count, rel_time=outlier.rel_time)
    return segmented, out


def _row_compact(img: RangeImage, keep: jnp.ndarray, ground: jnp.ndarray,
                 cols: jnp.ndarray) -> SegmentedCloud:
    """Kept pixels to the front of their row, preserving column order.

    Sort-free: since the W axis IS column order, this is a stable masked
    compaction — one row-wise cumsum for destinations plus one scatter per
    channel (sorts at this size cost ~ms on the TPU runtime; this is ~us).
    """
    H, W = keep.shape
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    dest = jnp.where(keep, rows * W + pos, H * W)    # junk slot at the end

    def scat(a, fill=0):
        a2 = a.reshape(H * W, -1)
        table = jnp.full((H * W + 1, a2.shape[1]), fill, a2.dtype).at[
            dest.reshape(-1)].set(a2)
        out = table[:H * W]
        return out.reshape((H, W) + a.shape[2:])

    count = keep.sum(-1).astype(jnp.int32)
    posw = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = posw < count[:, None]
    return SegmentedCloud(
        xyz=scat(img.xyz),
        rng=scat(img.rng),
        col=scat(cols),
        ground=scat(ground),
        valid=valid,
        count=count,
        rel_time=scat(img.rel_time),
    )
