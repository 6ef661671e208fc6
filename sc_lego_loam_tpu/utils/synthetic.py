"""Synthetic LiDAR world: analytic raycaster for tests and benchmarks.

The reference is validated only on MulRan rosbags (README.md:22-29); since
the rebuild needs deterministic fixtures with analytically known geometry
(SURVEY.md par.4), this module raycasts a structured world — ground plane,
axis-aligned box "buildings" (planar walls -> surf features, vertical edges
-> corner features) and vertical cylinders ("pillars") — from arbitrary
sensor poses, producing scans in the sensor frame with exact beam geometry.

Host-side numpy: data generation is not on the device hot path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import LidarConfig

_INF = 1e9


@dataclasses.dataclass
class World:
    """Axis-aligned boxes (n,6: xmin ymin zmin xmax ymax zmax), vertical
    cylinders (m,4: cx cy r h), and a flat ground plane at z=0."""

    boxes: np.ndarray
    cylinders: np.ndarray
    ground_z: float = 0.0


def default_world(seed: int = 0, extent: float = 90.0, n_boxes: int = 40,
                  n_cyls: int = 60) -> World:
    """An urban-ish block world: buildings along two corridors + pillars."""
    rng = np.random.default_rng(seed)
    boxes = []
    # Street corridor along x: buildings on both sides of y = +-12.
    for i in range(n_boxes):
        side = 1 if i % 2 == 0 else -1
        cx = rng.uniform(-extent, extent)
        cy = side * rng.uniform(10.0, 28.0)
        w = rng.uniform(4.0, 14.0)
        d = rng.uniform(4.0, 14.0)
        h = rng.uniform(4.0, 18.0)
        boxes.append([cx - w / 2, cy - d / 2, 0.0, cx + w / 2, cy + d / 2, h])
    cyls = []
    for _ in range(n_cyls):
        cx = rng.uniform(-extent, extent)
        cy = rng.uniform(-12.0, 12.0)
        # keep the immediate origin area clear
        if abs(cx) < 6 and abs(cy) < 6:
            cx += 12.0
        r = rng.uniform(0.25, 0.9)
        h = rng.uniform(3.0, 9.0)
        cyls.append([cx, cy, r, h])
    return World(boxes=np.asarray(boxes, np.float64),
                 cylinders=np.asarray(cyls, np.float64))


def beam_directions(lidar: LidarConfig) -> np.ndarray:
    """Unit ray directions in the sensor frame, shape (n_scan, horizon, 3).

    Row r elevation = r*ang_res_y - ang_bottom (row 0 = lowest beam), column c
    azimuth = c*ang_res_x, matching ops/projection.py's inverse mapping.
    """
    elev = np.deg2rad(np.arange(lidar.n_scan) * lidar.ang_res_y - lidar.ang_bottom)
    azim = np.deg2rad(np.arange(lidar.horizon_scan) * lidar.ang_res_x)
    ce, se = np.cos(elev)[:, None], np.sin(elev)[:, None]
    ca, sa = np.cos(azim)[None, :], np.sin(azim)[None, :]
    shape = (lidar.n_scan, lidar.horizon_scan)
    return np.stack([ce * ca, ce * sa, np.broadcast_to(se, shape)], -1)


def _ray_ground(o, d, ground_z):
    dz = d[..., 2]
    t = (ground_z - o[2]) / np.where(np.abs(dz) < 1e-12, 1e-12, dz)
    return np.where((dz < -1e-9) & (t > 0), t, _INF)


def _ray_boxes(o, d, boxes):
    """Slab method, vectorized over rays x boxes. o:(3,), d:(...,3)."""
    if boxes.shape[0] == 0:
        return np.full(d.shape[:-1], _INF)
    lo = boxes[:, :3]
    hi = boxes[:, 3:]
    dd = d[..., None, :]  # (...,1,3)
    inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmax >= np.maximum(tmin, 0)) & (tmin > 0)
    return np.where(hit, tmin, _INF).min(-1)


def _ray_cylinders(o, d, cyls):
    if cyls.shape[0] == 0:
        return np.full(d.shape[:-1], _INF)
    cx, cy, r, h = cyls[:, 0], cyls[:, 1], cyls[:, 2], cyls[:, 3]
    dx, dy, dz = d[..., 0:1], d[..., 1:2], d[..., 2:3]
    ox, oy = o[0] - cx, o[1] - cy
    a = dx * dx + dy * dy
    b = 2 * (dx * ox + dy * oy)
    c = ox * ox + oy * oy - r * r
    disc = b * b - 4 * a * c
    ok = disc > 0
    sq = np.sqrt(np.maximum(disc, 0))
    t = (-b - sq) / np.where(np.abs(a) < 1e-12, 1e-12, 2 * a)
    z = o[2] + t * dz
    hit = ok & (t > 0) & (z >= 0) & (z <= h)
    return np.where(hit, t, _INF).min(-1)


def raycast(world: World, pose: np.ndarray, lidar: LidarConfig,
            noise: float = 0.0, rng=None, drop_rate: float = 0.0):
    """Raycast one scan from a 4x4 world-from-sensor pose.

    Returns (points, valid): points (n_scan*horizon, 3) in the SENSOR frame
    (invalid rays zeroed), valid bool mask. Points are beam-ordered; callers
    that want an unordered cloud should shuffle.
    """
    R, p = pose[:3, :3], pose[:3, 3]
    dirs_s = beam_directions(lidar)                       # sensor frame
    dirs_w = dirs_s @ R.T
    t = np.minimum.reduce([
        _ray_ground(p, dirs_w, world.ground_z),
        _ray_boxes(p, dirs_w, world.boxes),
        _ray_cylinders(p, dirs_w, world.cylinders),
    ])
    valid = (t > lidar.min_range) & (t < min(lidar.max_range, 1e8))
    if rng is None:
        rng = np.random.default_rng(0)
    if noise > 0:
        t = t + rng.normal(0, noise, t.shape)
    if drop_rate > 0:
        valid &= rng.random(t.shape) > drop_rate
    pts = dirs_s * np.where(valid, t, 0.0)[..., None]
    return pts.reshape(-1, 3).astype(np.float32), valid.reshape(-1)


def figure8_trajectory(n_poses: int, radius: float = 40.0, height: float = 2.0,
                       loops: float = 1.0) -> np.ndarray:
    """World-from-sensor poses along a figure-8 (guaranteed revisits for
    loop-closure tests). Returns (n,4,4); x-axis tangent to the path."""
    s = np.linspace(0, 2 * np.pi * loops, n_poses, endpoint=False)
    x = radius * np.sin(s)
    y = 0.5 * radius * np.sin(2 * s)
    dx = radius * np.cos(s)
    dy = radius * np.cos(2 * s)
    yaw = np.arctan2(dy, dx)
    poses = np.zeros((n_poses, 4, 4))
    cy, sy = np.cos(yaw), np.sin(yaw)
    poses[:, 0, 0] = cy
    poses[:, 0, 1] = -sy
    poses[:, 1, 0] = sy
    poses[:, 1, 1] = cy
    poses[:, 2, 2] = 1.0
    poses[:, 0, 3] = x
    poses[:, 1, 3] = y
    poses[:, 2, 3] = height
    poses[:, 3, 3] = 1.0
    return poses


def straight_trajectory(n_poses: int, step: float = 0.4, height: float = 2.0,
                        yaw_rate: float = 0.0) -> np.ndarray:
    """Constant-velocity (optionally turning) trajectory."""
    poses = np.zeros((n_poses, 4, 4))
    x = y = yaw = 0.0
    for i in range(n_poses):
        c, s = np.cos(yaw), np.sin(yaw)
        poses[i] = np.array([[c, -s, 0, x], [s, c, 0, y],
                             [0, 0, 1, height], [0, 0, 0, 1]])
        x += step * c
        y += step * s
        yaw += yaw_rate
    return poses


def make_sequence(lidar: LidarConfig, n_scans: int, *, seed: int = 0,
                  trajectory: str = "straight", noise: float = 0.01,
                  shuffle: bool = True, **traj_kw):
    """Generate a full synthetic sequence.

    Returns (scans, valids, poses): scans (n, N, 3) sensor-frame clouds,
    valids (n, N) masks, poses (n, 4, 4) ground-truth world-from-sensor.
    """
    world = default_world(seed=seed)
    if trajectory == "straight":
        poses = straight_trajectory(n_scans, **traj_kw)
    elif trajectory == "figure8":
        poses = figure8_trajectory(n_scans, **traj_kw)
    else:
        raise ValueError(trajectory)
    rng = np.random.default_rng(seed + 1)
    scans, valids = [], []
    for i in range(n_scans):
        pts, valid = raycast(world, poses[i], lidar, noise=noise, rng=rng)
        if shuffle:
            perm = rng.permutation(pts.shape[0])
            pts, valid = pts[perm], valid[perm]
        scans.append(pts)
        valids.append(valid)
    return np.stack(scans), np.stack(valids), poses.astype(np.float32)
