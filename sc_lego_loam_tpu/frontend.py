"""Front-end stage: raw cloud -> segmented cloud (reference L3 node).

Replaces the ``imageProjection`` ROS node (imageProjection.cpp:181-197
``cloudHandler``): projection (C3) -> ground extraction (C4) -> cluster
segmentation (C5) -> per-ring compaction (C6), as one jitted pure function.
The ROS topic outputs (/segmented_cloud, /segmented_cloud_info,
/outlier_cloud) become one pytree return value.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import PipelineConfig
from .ops import compaction, ground, projection, segmentation


class FrontendOutput(NamedTuple):
    image: projection.RangeImage
    ground: jnp.ndarray
    seg: segmentation.Segmentation
    cloud: compaction.SegmentedCloud
    outlier: compaction.OutlierCloud


@functools.partial(jax.jit, static_argnums=0)
def run(config: PipelineConfig, points: jnp.ndarray,
        mask: jnp.ndarray) -> FrontendOutput:
    """points: (N,3) float32 sensor frame (padded), mask: (N,) bool."""
    if config.lidar.ordered:
        img = projection.project_ordered(points, mask, config.lidar)
    else:
        img = projection.project(points, mask, config.lidar)
    g = ground.ground_mask(img, config.lidar, config.seg)
    s = segmentation.segment(img, g, config.lidar, config.seg)
    cloud, outlier = compaction.compact(img, s, g, config.lidar, config.seg)
    return FrontendOutput(image=img, ground=g, seg=s, cloud=cloud,
                          outlier=outlier)
