import numpy as np
import pytest

from sc_lego_loam_tpu.utils import native_io


pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="g++ toolchain unavailable")


def _write_bin(path, pts):
    rec = np.zeros((len(pts), 4), np.float32)
    rec[:, :3] = pts
    rec.tofile(path)


def test_loader_prefetches_in_order(tmp_path):
    rng = np.random.default_rng(0)
    files = []
    truths = []
    for i in range(6):
        pts = rng.normal(size=(100 + i, 3)).astype(np.float32) * 5 + 1
        p = str(tmp_path / f"{i:03d}.bin")
        _write_bin(p, pts)
        files.append(p)
        truths.append(pts)
    loader = native_io.NativeScanLoader(files, max_points=256, n_threads=3)
    for i, (xyz, mask) in enumerate(loader):
        n = len(truths[i])
        assert mask[:n].all() and not mask[n:].any()
        np.testing.assert_allclose(xyz[:n], truths[i], rtol=1e-6)
    assert i == 5
    loader.close()


def test_loader_truncates_to_max_points(tmp_path):
    pts = np.ones((500, 3), np.float32)
    p = str(tmp_path / "big.bin")
    _write_bin(p, pts)
    loader = native_io.NativeScanLoader([p], max_points=128)
    xyz, mask = next(loader)
    assert xyz.shape == (128, 3)
    assert mask.all()
    loader.close()


def test_pcd_ply_roundtrip(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    pcd = str(tmp_path / "m.pcd")
    ply = str(tmp_path / "m.ply")
    native_io.write_pcd(pcd, pts)
    native_io.write_ply(ply, pts)
    with open(pcd, "rb") as f:
        data = f.read()
    hdr, bin_ = data.split(b"DATA binary\n")
    assert b"POINTS 10" in hdr
    got = np.frombuffer(bin_, np.float32).reshape(10, 3)
    np.testing.assert_array_equal(got, pts)
    with open(ply, "rb") as f:
        data = f.read()
    hdr, bin_ = data.split(b"end_header\n")
    assert b"element vertex 10" in hdr
    np.testing.assert_array_equal(np.frombuffer(bin_, np.float32).reshape(10, 3), pts)
