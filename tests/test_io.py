"""IO tests: PCD/PLY/XYZ roundtrips, LZF codec, loader node."""
import numpy as np
import pytest

from autodriver_pointcloud_preprocessor_tpu.io import (
    PointcloudLoader,
    lzf_compress,
    lzf_decompress,
    read_point_cloud,
    soa_to_pointcloud2,
    write_point_cloud,
)
from autodriver_pointcloud_preprocessor_tpu.core import read_points
from autodriver_pointcloud_preprocessor_tpu.runtime import TopicBus


def _soa(rng, n=200, rgb=False, normals=False):
    soa = {
        "positions": rng.normal(0, 10, (n, 3)).astype(np.float32),
        "intensity": rng.uniform(0, 255, n).astype(np.float32),
        "ring": rng.integers(0, 16, n).astype(np.uint16),
    }
    if rgb:
        soa["rgb"] = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    if normals:
        nm = rng.normal(size=(n, 3))
        soa["normals"] = (nm / np.linalg.norm(nm, axis=1, keepdims=True)).astype(
            np.float32
        )
    return soa


def test_lzf_roundtrip(rng):
    for data in (
        b"",
        b"a",
        b"abcabcabcabc" * 100,
        rng.integers(0, 256, 10000).astype(np.uint8).tobytes(),
        np.zeros(5000, np.float32).tobytes(),
    ):
        comp = lzf_compress(data)
        assert lzf_decompress(comp, len(data)) == data


@pytest.mark.parametrize("ascii_mode,compressed", [(True, False), (False, False), (False, True)])
def test_pcd_roundtrip(tmp_path, rng, ascii_mode, compressed):
    soa = _soa(rng, rgb=True, normals=True)
    path = str(tmp_path / "cloud.pcd")
    write_point_cloud(path, soa, ascii=ascii_mode, compressed=compressed)
    back = read_point_cloud(path)
    atol = 1e-4 if ascii_mode else 0
    np.testing.assert_allclose(back["positions"], soa["positions"], atol=atol)
    np.testing.assert_allclose(back["intensity"], soa["intensity"], atol=atol)
    np.testing.assert_array_equal(back["ring"], soa["ring"])
    np.testing.assert_array_equal(back["rgb"], soa["rgb"])
    np.testing.assert_allclose(back["normals"], soa["normals"], atol=atol)


@pytest.mark.parametrize("ascii_mode", [True, False])
def test_ply_roundtrip(tmp_path, rng, ascii_mode):
    soa = _soa(rng, rgb=True)
    path = str(tmp_path / "cloud.ply")
    write_point_cloud(path, soa, ascii=ascii_mode)
    back = read_point_cloud(path)
    atol = 1e-4 if ascii_mode else 0
    np.testing.assert_allclose(back["positions"], soa["positions"], atol=atol)
    np.testing.assert_array_equal(back["rgb"], soa["rgb"])


def test_xyz_roundtrip(tmp_path, rng):
    soa = {"positions": rng.normal(size=(50, 3)).astype(np.float32)}
    path = str(tmp_path / "cloud.xyz")
    write_point_cloud(path, soa)
    back = read_point_cloud(path)
    np.testing.assert_allclose(back["positions"], soa["positions"], atol=1e-5)


def test_soa_to_pointcloud2(rng):
    soa = _soa(rng, rgb=True)
    msg = soa_to_pointcloud2(soa, frame_id="lidar")
    arr = read_points(msg)
    assert msg.header.frame_id == "lidar"
    np.testing.assert_allclose(arr["x"], soa["positions"][:, 0])
    np.testing.assert_array_equal(arr["ring"], soa["ring"])


def test_loader_directory_and_looping(tmp_path, rng):
    for i in range(3):
        write_point_cloud(
            str(tmp_path / f"{i:04d}.pcd"), _soa(rng, n=50 + i)
        )
    bus = TopicBus()
    received = []
    bus.create_subscription("/loader/points", received.append)
    loader = PointcloudLoader(str(tmp_path), bus=bus, rate_hz=0, loop=False)
    assert len(loader.files) == 3
    n = loader.spin()
    assert n == 3
    assert [m.width for m in received] == [50, 51, 52]
    # looping: max_scans bounds an endless stream
    loader2 = PointcloudLoader(str(tmp_path), bus=bus, rate_hz=0, loop=True)
    assert loader2.spin(max_scans=7) == 7


def test_loader_feeds_preprocessor(tmp_path, rng):
    from autodriver_pointcloud_preprocessor_tpu.runtime import (
        PointcloudPreprocessorNode,
    )

    write_point_cloud(str(tmp_path / "scan.pcd"), _soa(rng, n=300))
    bus = TopicBus()
    node = PointcloudPreprocessorNode(
        bus=bus,
        overrides={
            "input_topic": "/loader/points",
            "voxel_size": 0.0,
            "estimate_normals": False,
        },
    )
    outputs = []
    bus.create_subscription(node.output_topic, outputs.append)
    loader = PointcloudLoader(str(tmp_path), bus=bus, rate_hz=0)
    loader.spin()
    assert len(outputs) == 1
    # default ROI crop (z in ±20) trims a few N(0,10) tail points
    assert 250 < read_points(outputs[0]).shape[0] <= 300


def test_kitti_bin_roundtrip(tmp_path, rng):
    soa = {
        "positions": rng.normal(0, 10, (500, 3)).astype(np.float32),
        "intensity": rng.uniform(0, 1, 500).astype(np.float32),
    }
    path = str(tmp_path / "000000.bin")
    write_point_cloud(path, soa)
    back = read_point_cloud(path)
    np.testing.assert_array_equal(back["positions"], soa["positions"])
    np.testing.assert_array_equal(back["intensity"], soa["intensity"])
