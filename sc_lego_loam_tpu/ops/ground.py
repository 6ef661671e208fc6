"""Ground extraction (reference C4: imageProjection.cpp:260-310).

For the lower ``ground_scan_ind`` rows, a pixel pair (r, r+1) in the same
column is ground if the elevation angle of the segment joining them is
within 10 degrees of the sensor mount angle.  Embarrassingly parallel —
one vectorized angle test over the whole grid.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import LidarConfig, SegmentationConfig
from .projection import RangeImage


def ground_mask(img: RangeImage, lidar: LidarConfig,
                seg: SegmentationConfig) -> jnp.ndarray:
    """(H, W) bool: pixel is ground.

    Mirrors imageProjection.cpp:267-291: both pixels of a qualifying
    vertical pair are marked; pairs with a missing return are skipped.
    """
    H, W = img.rng.shape
    xyz = img.xyz
    lower = xyz[:-1]          # rows 0..H-2
    upper = xyz[1:]           # rows 1..H-1
    diff = upper - lower
    angle = jnp.degrees(jnp.arctan2(
        diff[..., 2], jnp.sqrt(diff[..., 0] ** 2 + diff[..., 1] ** 2)))
    pair_ok = (img.valid[:-1] & img.valid[1:] &
               (jnp.abs(angle - lidar.mount_angle) <= seg.ground_angle_deg))
    # Only pairs whose lower row is below ground_scan_ind participate
    # (imageProjection.cpp:268: loop i < groundScanInd).
    row_ok = (jnp.arange(H - 1) < lidar.ground_scan_ind)[:, None]
    pair_ok &= row_ok
    g = jnp.zeros((H, W), bool)
    g = g.at[:-1].set(pair_ok)
    g = g.at[1:].max(pair_ok)
    return g & img.valid
