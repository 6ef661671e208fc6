"""MulRan runner path, golden-tested on generated MulRan-format fixtures
(SURVEY.md par.4: dataset-level validation without shipping the dataset).

Writes a synthetic sequence in the exact MulRan raw layout
(sensor_data/Ouster/<timestamp_ns>.bin float32 x,y,z,i + global_pose.csv)
and drives the full engine through runner.run_mulran — the same code path
tools/run_mulran.py uses on the real DCC/KAIST/Riverside sequences."""

import os

import numpy as np
import pytest

from sc_lego_loam_tpu import runner
from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.utils import mulran, synthetic

N_SCANS = 12


@pytest.fixture(scope="module")
def mulran_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("mulran_seq")
    cfg = tiny_test_config()
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, N_SCANS, trajectory="straight", step=0.4, noise=0.01,
        seed=5)
    d = root / "sensor_data" / "Ouster"
    os.makedirs(d)
    t0_ns = 1_566_535_000_000_000_000        # MulRan-era epoch ns
    rows = []
    for i in range(N_SCANS):
        ts = t0_ns + i * 100_000_000         # 10 Hz
        pts = scans[i][valids[i]]            # only real returns, like the bins
        raw = np.concatenate(
            [pts, np.ones((len(pts), 1), np.float32)], 1).astype(np.float32)
        raw.tofile(str(d / f"{ts}.bin"))
        rows.append([ts] + list(gt[i][:3, :4].reshape(-1)))
    np.savetxt(str(root / "global_pose.csv"),
               np.asarray(rows, np.float64), delimiter=",")
    return str(root), cfg, scans, valids, gt


def test_loader_roundtrip(mulran_fixture):
    root, cfg, scans, valids, gt = mulran_fixture
    files = mulran.scan_files(root)
    assert len(files) == N_SCANS
    pts, mask = mulran.load_scan(files[0], cfg.lidar)
    assert pts.shape == (cfg.lidar.max_points, 3)
    got = pts[mask]
    want = scans[0][valids[0]]
    np.testing.assert_allclose(got, want[: len(got)], atol=1e-6)
    assert abs(int(mask.sum()) - int(valids[0].sum())) <= 1


def test_gt_loader(mulran_fixture):
    root, cfg, scans, valids, gt = mulran_fixture
    ts, poses = mulran.load_gt_poses(root)
    assert poses.shape == (N_SCANS, 4, 4)
    np.testing.assert_allclose(poses[3], gt[3], atol=1e-5)


def test_run_mulran_end_to_end(mulran_fixture):
    root, cfg, scans, valids, gt = mulran_fixture
    res = runner.run_mulran(root, config=cfg, use_native=False,
                            loop_enabled=False)
    assert res["scans"] == N_SCANS
    assert np.isfinite(res["est"]).all()
    assert res["keyframes"] >= 2
    # ATE computed against the fixture's global_pose.csv.
    assert "ate_rmse_m" in res
    assert res["ate_rmse_m"] < 0.8, res["ate_rmse_m"]


def test_golden_bytes_hand_written(tmp_path):
    """Bit-exact parser fixture (VERDICT r4 #8): the .bin / global_pose.csv
    bytes are HAND-BUILT with struct.pack and literal text — not produced
    by the same numpy writer under test — pinning endianness and field
    order (MulRan Ouster layout: little-endian float32 x,y,z,intensity;
    global_pose.csv: timestamp_ns, then the 3x4 [R|t] row-major)."""
    import struct

    from sc_lego_loam_tpu.config import tiny_test_config

    root = tmp_path / "seq"
    d = root / "sensor_data" / "Ouster"
    os.makedirs(d)
    ts_ns = 1566535200123456789
    # Three points with distinct, exactly-representable coordinates.
    pts = [(1.5, -2.25, 0.5, 7.0),
           (10.0, 0.0, -1.0, 0.0),
           (0.0, 0.0, 0.0, 3.0)]   # zero return -> must be masked out
    blob = b"".join(struct.pack("<ffff", *p) for p in pts)
    with open(d / f"{ts_ns}.bin", "wb") as f:
        f.write(blob)
    # Pose row: yaw=90 deg rotation, translation (100, -50, 3).
    csv = (f"{ts_ns},0,-1,0,100,1,0,0,-50,0,0,1,3\n")
    with open(root / "global_pose.csv", "w") as f:
        f.write(csv)
        # loadtxt needs >= 2 rows for a 2-D result only when squeezed;
        # write a second row 0.1 s later, identity rotation.
        f.write(f"{ts_ns + 100000000},1,0,0,101,0,1,0,-50,0,0,1,3\n")

    cfg = tiny_test_config()
    files = mulran.scan_files(str(root))
    assert files == [str(d / f"{ts_ns}.bin")]
    out, mask = mulran.load_scan(files[0], cfg.lidar)
    np.testing.assert_array_equal(out[0], np.float32([1.5, -2.25, 0.5]))
    np.testing.assert_array_equal(out[1], np.float32([10.0, 0.0, -1.0]))
    assert mask[0] and mask[1]
    assert not mask[2]            # zero return masked
    assert not mask[3:].any()     # padding masked

    ts, poses = mulran.load_gt_poses(str(root))
    np.testing.assert_allclose(ts[0], ts_ns * 1e-9, rtol=0, atol=1e-6)
    want = np.array([[0, -1, 0, 100],
                     [1, 0, 0, -50],
                     [0, 0, 1, 3],
                     [0, 0, 0, 1]], np.float32)
    np.testing.assert_array_equal(poses[0], want)

    # The native C++ loader must decode the identical bytes identically.
    from sc_lego_loam_tpu.utils import native_io
    if native_io.available():
        loader = native_io.NativeScanLoader(files, cfg.lidar.max_points)
        pts_n, mask_n = next(iter(loader))
        loader.close()
        np.testing.assert_array_equal(pts_n[:3], out[:3])
        np.testing.assert_array_equal(mask_n, mask)


def test_run_mulran_native_loader(mulran_fixture):
    from sc_lego_loam_tpu.utils import native_io
    if not native_io.available():
        pytest.skip("native IO unavailable")
    root, cfg, scans, valids, gt = mulran_fixture
    files = mulran.scan_files(root)
    loader = native_io.NativeScanLoader(files, cfg.lidar.max_points)
    pts_n, mask_n = next(iter(loader))
    pts_p, mask_p = mulran.load_scan(files[0], cfg.lidar)
    loader.close()
    np.testing.assert_allclose(pts_n[mask_n], pts_p[mask_p], atol=1e-6)
