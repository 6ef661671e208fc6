"""Cluster segmentation (reference C5: imageProjection.cpp:312-460).

The reference runs a sequential BFS flood fill per seed pixel with an
angle-based connectivity test.  That is inherently serial; the TPU-native
reformulation is *iterative min-label propagation with pointer jumping*
over the whole grid at once:

  1. Build the 4-neighbor connectivity once (the angle criterion
     ``atan2(d2 sin a, d1 - d2 cos a) > segmentTheta`` is symmetric in the
     pair, so connected components are well defined).
  2. Initialize every valid non-ground pixel's label to its own flat index.
  3. Repeat: label <- min(label, labels of connected neighbors), then a few
     rounds of pointer jumping label <- label[label], which contracts long
     chains exponentially (O(log diameter) rounds for grid components).
  4. Per-component stats (pixel count, distinct-row count) via scatter-adds;
     apply the reference's validity rule (>=30 px, or >=5 px spanning >=3
     rows, utility.h:118-119 + imageProjection.cpp:440-451); survivors keep
     their component id, failures become outliers.

Connectivity wraps horizontally (imageProjection.cpp:403-406).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import LidarConfig, SegmentationConfig
from .projection import RangeImage


class Segmentation(NamedTuple):
    label: jnp.ndarray      # (H,W) int32 component root index; -1 = no component
    is_cluster: jnp.ndarray  # (H,W) bool: valid segment member
    is_outlier: jnp.ndarray  # (H,W) bool: failed-segment pixel (label 999999)


def _pair_connected(d_a, d_b, valid_a, valid_b, alpha, theta_rad):
    """Angle criterion for one neighbor direction (imageProjection.cpp:411-423)."""
    d1 = jnp.maximum(d_a, d_b)
    d2 = jnp.minimum(d_a, d_b)
    ang = jnp.arctan2(d2 * math.sin(alpha), d1 - d2 * math.cos(alpha))
    return valid_a & valid_b & (ang > theta_rad)


def segment(img: RangeImage, ground: jnp.ndarray, lidar: LidarConfig,
            seg: SegmentationConfig) -> Segmentation:
    H, W = img.rng.shape
    theta = math.radians(seg.segment_theta_deg)
    ax = lidar.ang_res_x_rad
    ay = lidar.ang_res_y_rad

    active = img.valid & ~ground      # ground/invalid get label -1 and are
                                      # skipped (imageProjection.cpp:295-301)
    r = img.rng

    # Neighbor connectivity (H,W) per direction; horizontal wraps.
    right = jnp.roll(r, -1, 1)
    right_ok = jnp.roll(active, -1, 1)
    conn_r = _pair_connected(r, right, active, right_ok, ax, theta)
    conn_l = jnp.roll(conn_r, 1, 1)
    up = jnp.concatenate([r[1:], jnp.zeros((1, W), r.dtype)], 0)
    up_ok = jnp.concatenate([active[1:], jnp.zeros((1, W), bool)], 0)
    conn_u = _pair_connected(r, up, active, up_ok, ay, theta)
    conn_d = jnp.concatenate([jnp.zeros((1, W), bool), conn_u[:-1]], 0)

    n = H * W
    init2d = jnp.where(active, jax.lax.broadcasted_iota(
        jnp.int32, (H, W), 0) * W + jax.lax.broadcasted_iota(
        jnp.int32, (H, W), 1), n)

    # Label propagation by SEGMENTED MIN-SCANS (shift-based associative
    # scans — no gathers/scatters, which this TPU runtime executes poorly).
    # A segment boundary sits wherever two neighbors fail the angle
    # criterion; one scan propagates the running min along every connected
    # run in one direction; a round does all four directions (rows wrap via
    # width doubling).  Bounded rounds replace the reference's BFS: shapes
    # needing more direction changes than rounds (deep spirals) would
    # split — irrelevant for real lidar clusters and gated by the
    # BFS-parity test.
    # The (label, boundary-flag) pair is PACKED into one int32
    # (label<<1 | flag, label <= H*W < 2^30): the scan then moves one
    # array instead of two through its log-depth shift steps.  Segmented-
    # min op on packed values: if b's flag is set the left operand cannot
    # cross it, which `min(la + LOCK, lb)` realizes with LOCK > any label.
    LOCK = jnp.int32(1 << 30)

    def seg_scan(vals, boundary, axis, reverse):
        packed = (vals << 1) | boundary.astype(jnp.int32)

        def op(a, b):
            la = a >> 1
            lb = b >> 1
            l = jnp.minimum(la + (b & 1) * LOCK, lb)
            return (l << 1) | ((a | b) & 1)

        v = jax.lax.associative_scan(op, packed, axis=axis, reverse=reverse)
        return v >> 1

    def one_round(_, lab):
        # Rows, with horizontal wrap: double the width.
        lab2 = jnp.concatenate([lab, lab], 1)
        bl = jnp.concatenate([~conn_l, ~conn_l], 1)
        lab = seg_scan(lab2, bl, 1, False)[:, W:]
        lab2 = jnp.concatenate([lab, lab], 1)
        br = jnp.concatenate([~conn_r, ~conn_r], 1)
        lab = seg_scan(lab2, br, 1, True)[:, :W]
        # Columns (no wrap).
        lab = seg_scan(lab, ~conn_d, 0, False)
        lab = seg_scan(lab, ~conn_u, 0, True)
        return jnp.where(active, lab, n)

    label = jax.lax.fori_loop(0, seg.max_label_rounds, one_round,
                              init2d).reshape(-1)
    init = init2d.reshape(-1)

    # Component statistics: count and distinct-row count per root label.
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1)
    activef = init < n
    safe_label = jnp.where(activef, label, 0)
    counts = jnp.zeros((n,), jnp.int32).at[safe_label].add(
        activef.astype(jnp.int32))
    lines = _distinct_rows(safe_label, rows, activef, n, H)

    cnt_pix = counts[safe_label]
    cnt_lines = lines[safe_label]
    ok = (cnt_pix >= seg.min_cluster_size) | (
        (cnt_pix >= seg.valid_point_num) & (cnt_lines >= seg.valid_line_num))
    is_cluster = activef & ok
    is_outlier = activef & ~ok
    out_label = jnp.where(is_cluster, label, -1)
    return Segmentation(label=out_label.reshape(H, W),
                        is_cluster=is_cluster.reshape(H, W),
                        is_outlier=is_outlier.reshape(H, W))


def _distinct_rows(safe_label, rows, active, n, H):
    """lines[l] = number of distinct rows among active pixels with label l.

    Exact scatter into an (n*H,) presence table: for 64x1024 grids this is
    64k*64 = 4.2M int8 — cheap in HBM and touched once per frame.
    """
    key = safe_label * H + rows
    presence = jnp.zeros((n * H,), jnp.int8).at[
        jnp.where(active, key, 0)].max(
        jnp.where(active, jnp.int8(1), jnp.int8(0)), mode="drop")
    return presence.reshape(n, H).astype(jnp.int32).sum(-1)
