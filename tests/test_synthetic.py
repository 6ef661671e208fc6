import numpy as np

from sc_lego_loam_tpu.config import tiny_test_config, OS1_64
from sc_lego_loam_tpu.utils import synthetic


def test_raycast_hits_ground_and_walls():
    cfg = tiny_test_config()
    world = synthetic.default_world(seed=0)
    pose = np.eye(4)
    pose[2, 3] = 2.0
    pts, valid = synthetic.raycast(world, pose, cfg.lidar)
    assert valid.sum() > 200
    p = pts[valid]
    # Sensor at z=2 above ground at z=0: hit points in the sensor frame have
    # z >= -2 (ground) and below building tops.
    assert p[:, 2].min() >= -2.0 - 1e-3
    r = np.linalg.norm(p, axis=1)
    assert (r > cfg.lidar.min_range).all()
    # Downward beams must find the ground (z approx -2 at far range).
    assert (np.abs(p[:, 2] + 2.0) < 0.3).sum() > 50


def test_beam_geometry_invertible():
    lidar = OS1_64
    dirs = synthetic.beam_directions(lidar)
    # Row 0 is the lowest beam.
    assert dirs[0, 0, 2] < dirs[-1, 0, 2]
    # Azimuth of column c is c * ang_res_x.
    az = np.rad2deg(np.arctan2(dirs[0, :, 1], dirs[0, :, 0])) % 360
    expect = (np.arange(lidar.horizon_scan) * lidar.ang_res_x) % 360
    np.testing.assert_allclose(az, expect, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)


def test_sequence_shapes_and_motion():
    cfg = tiny_test_config()
    scans, valids, poses = synthetic.make_sequence(
        cfg.lidar, 3, trajectory="straight", step=0.5)
    assert scans.shape == (3, cfg.lidar.max_points, 3)
    assert valids.shape == (3, cfg.lidar.max_points)
    assert poses.shape == (3, 4, 4)
    # Ground truth moves 0.5 m per scan along +x.
    np.testing.assert_allclose(poses[1][:3, 3] - poses[0][:3, 3],
                               [0.5, 0, 0], atol=1e-6)


def test_figure8_closes_loop():
    poses = synthetic.figure8_trajectory(100, radius=40.0)
    start = poses[0][:3, 3]
    # The path returns near its start.
    d = np.linalg.norm(poses[:, :3, 3] - start, axis=1)
    assert d[1:].max() > 30.0
    assert d[50:].min() < 5.0 or d[-1] < 10.0
