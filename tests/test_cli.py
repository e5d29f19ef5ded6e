"""Console entry-point tests (reference setup.py:63-68 parity + stubs made real)."""
import json
import os

import numpy as np

from autodriver_pointcloud_preprocessor_tpu.cli import (
    compressor_main,
    concatenator_main,
    loader_main,
    preprocessor_main,
)
from autodriver_pointcloud_preprocessor_tpu.io.pcd import (
    read_point_cloud,
    write_point_cloud,
)


def _write_scans(d, rng, count=2, n=300):
    os.makedirs(d, exist_ok=True)
    for i in range(count):
        write_point_cloud(
            os.path.join(d, f"{i:04d}.pcd"),
            {"positions": rng.normal(0, 5, (n, 3)).astype(np.float32),
             "intensity": rng.uniform(0, 255, n).astype(np.float32)},
        )


def test_preprocessor_cli(tmp_path, rng, capsys):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_scans(src, rng)
    rc = preprocessor_main(
        [src, "-o", out, "--set", "voxel_size=0.5",
         "--set", "estimate_normals=false"]
    )
    assert rc == 0
    files = sorted(os.listdir(out))
    assert files == ["00000000.pcd", "00000001.pcd"]
    cloud = read_point_cloud(os.path.join(out, files[0]))
    assert 0 < cloud["positions"].shape[0] <= 300


def test_preprocessor_cli_params_json(tmp_path, rng):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_scans(src, rng, count=1)
    params = {"voxel_size": 0.0, "estimate_normals": False, "crop_to_roi": False}
    pfile = str(tmp_path / "p.json")
    with open(pfile, "w") as f:
        json.dump(params, f)
    assert preprocessor_main([src, "-o", out, "--params", pfile]) == 0
    cloud = read_point_cloud(os.path.join(out, "00000000.pcd"))
    assert cloud["positions"].shape[0] == 300  # no filtering configured


def test_compressor_cli_roundtrip(tmp_path, rng):
    src = str(tmp_path / "in")
    comp = str(tmp_path / "comp")
    restored = str(tmp_path / "restored")
    _write_scans(src, rng, count=2)
    assert compressor_main([src, "-o", comp, "-q", "16"]) == 0
    assert sorted(os.listdir(comp)) == ["00000000.apcz", "00000001.apcz"]
    assert compressor_main([comp + "/00000000.apcz", "-o", restored, "-d"]) == 0
    orig = read_point_cloud(os.path.join(src, "0000.pcd"))
    back = read_point_cloud(os.path.join(restored, "00000000.pcd"))
    np.testing.assert_allclose(
        np.sort(back["positions"][:, 0]),
        np.sort(orig["positions"][:, 0]),
        atol=1e-3,
    )


def test_loader_cli(tmp_path, rng, capsys):
    src = str(tmp_path / "in")
    _write_scans(src, rng, count=3)
    assert loader_main([src, "--rate-hz", "0"]) == 0
    out = capsys.readouterr().out
    assert out.count("scan ") == 3


def test_concatenator_cli(tmp_path, rng):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    out = str(tmp_path / "merged")
    _write_scans(a, rng, count=2, n=100)
    _write_scans(b, rng, count=2, n=150)
    ex = str(tmp_path / "ex.json")
    with open(ex, "w") as f:
        json.dump({b: (np.eye(4) + 0).ravel().tolist()}, f)
    assert concatenator_main([a, b, "-o", out, "--extrinsics", ex]) == 0
    files = sorted(os.listdir(out))
    assert len(files) == 2
    merged = read_point_cloud(os.path.join(out, files[0]))
    assert merged["positions"].shape[0] == 250


def test_warmup_cli(tmp_path, capsys):
    from autodriver_pointcloud_preprocessor_tpu.cli import warmup_main

    cache = str(tmp_path / "cache")
    rc = warmup_main([
        "--buckets", "1024,2048", "--attrs", "intensity",
        "--cache-dir", cache,
        "--set", "voxel_size=0.5", "--set", "estimate_normals=false",
        "--set", "remove_statistical_outliers=false",
    ])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "warmup bucket 1024:" in outp
    assert "warmup bucket 2048:" in outp
    assert "warmed 1024,2048" in outp


def test_warmup_cli_preset(capsys):
    # the production preset must at least resolve through the config path
    # (tiny bucket so the CPU compile stays fast; the preset's 51200
    # shrink is above the bucket so it is a no-op here)
    from autodriver_pointcloud_preprocessor_tpu.cli import warmup_main

    rc = warmup_main([
        "--preset", "production_128k", "--buckets", "2048",
        "--cache-dir", "/tmp/jax_warmup_test_cache",
    ])
    assert rc == 0
    assert "warmup bucket 2048:" in capsys.readouterr().out


def test_parse_set_value_string_fallback():
    """Values that start with a JSON-ish char but are legitimate strings
    (ADVICE r4: --set knn_d2mode=fast3 crashed with JSONDecodeError)."""
    from autodriver_pointcloud_preprocessor_tpu.cli import _parse_set_value

    assert _parse_set_value("fast3") == "fast3"
    assert _parse_set_value("farthest") == "farthest"
    assert _parse_set_value("true") is True
    assert _parse_set_value("-1.5") == -1.5
    assert _parse_set_value("[1, 0]") == [1, 0]
    assert _parse_set_value("") == ""
    assert _parse_set_value("2scans") == "2scans"
