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
