"""Range-image projection (reference C3: imageProjection.cpp:199-257).

The reference walks points one-by-one writing into a 64x1024 cv::Mat.  Here
the whole cloud is projected with one vectorized row/col computation and a
scatter-min into the grid (ties on the same pixel resolve to the nearest
return, where the reference keeps the last-written point; both are valid
samplings of the same surface).

Everything is fixed-shape: input is a padded (N,3) cloud + validity mask,
output is the (H,W) range image plus per-pixel point attributes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import LidarConfig

INVALID_RANGE = 0.0   # python float: a module-level jnp constant is a
                      # DEVICE value; jits capturing one permanently
                      # degrade the axon dispatch stream (PERF.md).
                      # rangeMat init is FLT_MAX in the reference;
                                   # we use 0 + a validity mask instead.


class RangeImage(NamedTuple):
    """Pixelized scan. All arrays are (H, W) or (H, W, 3)."""

    xyz: jnp.ndarray        # point coords in sensor frame
    rng: jnp.ndarray        # range (m); 0 where no return
    valid: jnp.ndarray      # bool: pixel has a return
    rel_time: jnp.ndarray   # azimuth-interpolated intra-scan time in [0,1)
                            # (reference packs this into intensity,
                            #  featureAssociation.cpp:504-523)


def project_ordered(points: jnp.ndarray, mask: jnp.ndarray,
                    lidar: LidarConfig) -> RangeImage:
    """Beam-ordered fast path: point i IS pixel (i//W, i%W) — a reshape
    plus elementwise validation; no scatter (the useCloudRing analog,
    imageProjection.cpp:225-231 with the ring channel trusted)."""
    H, W = lidar.n_scan, lidar.horizon_scan
    xyz = points.reshape(H, W, 3)
    r = jnp.linalg.norm(xyz, axis=-1)
    valid = mask.reshape(H, W) & (r > lidar.min_range) & (r < lidar.max_range)
    rel = (jnp.arange(W, dtype=jnp.float32) / W)[None, :].repeat(H, 0)
    return RangeImage(xyz=jnp.where(valid[..., None], xyz, 0.0),
                      rng=jnp.where(valid, r, 0.0), valid=valid,
                      rel_time=jnp.where(valid, rel, 0.0))


def project(points: jnp.ndarray, mask: jnp.ndarray,
            lidar: LidarConfig) -> RangeImage:
    """Project a padded unordered cloud into an (n_scan, horizon) range image.

    points: (N,3) float32 sensor-frame, mask: (N,) bool.
    Row from vertical angle (imageProjection.cpp:225-231; ring channel not
    needed since rows are recomputed exactly), col from horizontal angle
    (imageProjection.cpp:235-242), min-range cull (imageProjection.cpp:244).

    INPUT CONTRACT (same as the reference, findStartEndAngle
    iP.cpp:199-209): the array's first and last VALID points must be the
    first and last CAPTURED returns — their azimuths anchor the
    intra-scan sweep that rel_time (the de-skew time base) interpolates.
    Beam/ring interleaving between them is fine (every real sensor
    stream qualifies); a fully shuffled cloud randomizes the time base.
    """
    H, W = lidar.n_scan, lidar.horizon_scan
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    ok = mask & (r > lidar.min_range) & (r < lidar.max_range)

    vert_deg = jnp.degrees(jnp.arctan2(z, jnp.sqrt(x * x + y * y)))
    row = jnp.round((vert_deg + lidar.ang_bottom) / lidar.ang_res_y).astype(jnp.int32)
    ok &= (row >= 0) & (row < H)

    azim = jnp.arctan2(y, x)                      # (-pi, pi]
    colf = azim / jnp.float32(lidar.ang_res_x_rad)
    col = jnp.mod(jnp.round(colf).astype(jnp.int32), W)

    # ONE scatter-min of a packed (quantized range, point index) key picks
    # the nearest return per pixel and its source point together.  (The
    # reference keeps the LAST writer, imageProjection.cpp:247-256; nearest
    # is an equally valid sampling and deterministic.)  Packing: range
    # quantized to 12.5 cm in the upper bits — ties broken by point index —
    # exact range recovered from the winning point.
    n = points.shape[0]
    assert n <= (1 << 16), "pack assumes <=65536 points per scan"
    flat = jnp.where(ok, row * W + col, 0)
    rq = jnp.clip((r * 8.0).astype(jnp.int32), 0, (1 << 14) - 2)  # < sentinel
    idx = jnp.arange(n, dtype=jnp.int32)
    key = (rq << 16) | idx
    SENT = jnp.int32((1 << 30) - 1)
    key = jnp.where(ok, key, SENT)
    # Chunked scatter-min (TPU scatters serialize over colliding updates;
    # C independent per-chunk scatters + one min-reduce run C-way parallel).
    C = 64
    while n % C:
        C //= 2
    packed = jax.vmap(
        lambda f, k: jnp.full((H * W,), SENT, jnp.int32).at[f].min(
            k, mode="drop")
    )(flat.reshape(C, -1), key.reshape(C, -1)).min(0)
    valid = packed < SENT
    win = jnp.clip(packed & 0xFFFF, 0, n - 1)
    pts_w = points[win]
    rngm = jnp.where(valid, jnp.linalg.norm(pts_w, axis=-1), 0.0
                     ).reshape(H, W)
    xyz = jnp.where(valid[:, None], pts_w, 0.0).reshape(H, W, 3)
    validm = valid.reshape(H, W)

    # Intra-scan relative time from the scan's actual azimuth span
    # (findStartEndAngle, imageProjection.cpp:199-209 + fA.cpp:504-523):
    # capture order starts at the first point's azimuth and sweeps ~2 pi to
    # the last point's; rel_time = fraction of that sweep, NOT col/W (which
    # silently assumes the sweep starts at azimuth 0 — wrong for real
    # sensors and for partial scans).
    first_i = jnp.argmax(ok)
    last_i = n - 1 - jnp.argmax(ok[::-1])
    a0 = azim[first_i]
    a1 = azim[last_i]
    two_pi = jnp.float32(2.0 * jnp.pi)
    # Span adjusted into [pi, 3 pi] as the reference does (iP.cpp:203-208).
    span = a1 + two_pi - a0
    span = jnp.where(span > 3.0 * jnp.pi, span - two_pi, span)
    span = jnp.where(span < jnp.pi, span + two_pi, span)
    rel_pts = jnp.mod(azim - a0, two_pi) / span
    rel = jnp.where(valid, rel_pts[win], 0.0).reshape(H, W)
    return RangeImage(xyz=xyz, rng=rngm, valid=validm, rel_time=rel)
