"""Codec layer tests: PointCloud2 <-> structured <-> SoA roundtrips, RGB packing,
vendor alias resolution. Oracle semantics from reference utils.py (see
SURVEY.md §2a rows for convert_pointcloud_to_numpy / rgb codecs /
get_pointcloud_metadata)."""
import numpy as np
import pytest

from autodriver_pointcloud_preprocessor_tpu.core import (
    Header,
    PointCloud2,
    PointField,
    PointFieldType,
    build_pointfields,
    check_field,
    create_cloud,
    extract_rgb_from_packed,
    get_pointcloud_metadata,
    merge_rgb_fields,
    pack_rgb_float,
    pointcloud_to_dict,
    read_points,
    resolve_field_alias,
    rgb_to_intensity,
    soa_to_structured,
    structured_to_soa,
)
from autodriver_pointcloud_preprocessor_tpu.core.msg import (
    Time,
    make_pointcloud2,
    structured_dtype_from_fields,
)


def _velodyne_cloud(n=64, seed=0, with_nans=False):
    rng = np.random.default_rng(seed)
    fields, step = build_pointfields(
        ["x", "y", "z", "intensity", "ring", "time"],
        [
            PointFieldType.FLOAT32,
            PointFieldType.FLOAT32,
            PointFieldType.FLOAT32,
            PointFieldType.FLOAT32,
            PointFieldType.UINT16,
            PointFieldType.FLOAT64,
        ],
    )
    dtype = structured_dtype_from_fields(fields, step)
    arr = np.zeros(n, dtype=dtype)
    arr["x"] = rng.normal(size=n).astype(np.float32)
    arr["y"] = rng.normal(size=n).astype(np.float32)
    arr["z"] = rng.normal(size=n).astype(np.float32)
    arr["intensity"] = rng.uniform(0, 255, size=n).astype(np.float32)
    arr["ring"] = rng.integers(0, 16, size=n).astype(np.uint16)
    arr["time"] = 1.7e9 + rng.uniform(0, 0.1, size=n)
    if with_nans:
        arr["x"][::7] = np.nan
    msg = make_pointcloud2(arr, fields, header=Header(Time(1, 2), "velodyne"),
                           is_dense=not with_nans)
    return msg, arr


def test_build_pointfields_offsets():
    fields, step = build_pointfields(
        ["x", "y", "z", "intensity", "ring"],
        [PointFieldType.FLOAT32] * 4 + [PointFieldType.UINT16],
    )
    assert [f.offset for f in fields] == [0, 4, 8, 12, 16]
    assert step == 18
    assert fields[4].datatype == PointFieldType.UINT16


def test_read_points_roundtrip():
    msg, arr = _velodyne_cloud()
    out = read_points(msg)
    for name in arr.dtype.names:
        np.testing.assert_array_equal(out[name], arr[name])


def test_read_points_field_selection_and_nan_skip():
    msg, arr = _velodyne_cloud(with_nans=True)
    out = read_points(msg, field_names=["x", "y", "z"], skip_nans=True)
    assert out.dtype.names == ("x", "y", "z")
    assert np.isfinite(out["x"]).all()
    assert out.shape[0] == np.isfinite(arr["x"]).sum()


def test_pointcloud_to_dict_metadata_and_soa():
    msg, arr = _velodyne_cloud()
    soa, meta = pointcloud_to_dict(msg)
    assert meta["has_intensity"] and meta["intensity_field_name"] == "intensity"
    assert meta["has_ring"] and meta["ring_field_name"] == "ring"
    assert meta["has_time"] and meta["time_field_name"] == "time"
    assert not meta["has_rgb"]
    assert soa["positions"].shape == (64, 3)
    assert soa["positions"].dtype == np.float32
    assert soa["ring"].dtype == np.uint16
    assert soa["time"].dtype == np.float64
    np.testing.assert_allclose(soa["positions"][:, 0], arr["x"], rtol=0)


def test_pointcloud_to_dict_metadata_cache():
    msg, _ = _velodyne_cloud()
    _, meta = pointcloud_to_dict(msg)
    assert not meta["has_return_type"]
    meta["return_type_field_name"] = "CACHED"
    _, meta2 = pointcloud_to_dict(msg, metadata_dict=meta)
    # has_intensity already set -> vendor resolution skipped (utils.py:217-219)
    assert meta2["return_type_field_name"] == "CACHED"


def test_rgb_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    rgb_u8 = rng.integers(0, 256, size=(100, 3)).astype(np.uint8)
    packed = merge_rgb_fields(rgb_u8[:, 0], rgb_u8[:, 1], rgb_u8[:, 2])
    assert packed.dtype == np.float32
    unpacked = extract_rgb_from_packed(packed)
    np.testing.assert_array_equal(unpacked, rgb_u8)


def test_pack_rgb_float_matches_merge():
    rng = np.random.default_rng(2)
    rgb01 = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    packed = pack_rgb_float(rgb01)
    u8 = (rgb01 * 255).clip(0, 255).astype(np.uint8)
    expected = merge_rgb_fields(u8[:, 0], u8[:, 1], u8[:, 2])
    np.testing.assert_array_equal(packed.view(np.uint32), expected.view(np.uint32))


def test_rgb_to_intensity_luma():
    rgb = np.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32)
    lum = rgb_to_intensity(rgb)
    np.testing.assert_allclose(lum, [0.2126, 0.7152, 0.0722, 1.0], atol=1e-6)


def test_vendor_alias_resolution():
    found, name = resolve_field_alias(["C", "ring", "line"], ["x", "y", "z", "line"])
    assert found and name == "line"
    meta = get_pointcloud_metadata(["x", "y", "z", "I", "tag", "timestamp"])
    assert meta["has_intensity"] and meta["intensity_field_name"] == "I"
    assert meta["has_return_type"] and meta["return_type_field_name"] == "tag"
    assert meta["has_time"] and meta["time_field_name"] == "timestamp"
    meta_rgb = get_pointcloud_metadata(["x", "y", "z", "r", "g", "b"])
    assert meta_rgb["has_rgb"] and meta_rgb["rgb_field_name"] == ["r", "g", "b"]


def test_check_field():
    assert check_field("intensity", {"intensity": np.ones(3)}, {})
    assert check_field("intensity", {}, {"has_intensity": True})
    assert not check_field("intensity", {"intensity": None}, {})


def test_soa_to_structured_egress():
    msg, arr = _velodyne_cloud()
    soa, meta = pointcloud_to_dict(msg)
    names = list(arr.dtype.names) + ["normal_x", "normal_y", "normal_z"]
    dtypes = [arr.dtype[n] for n in arr.dtype.names] + [np.float32] * 3
    new_dtype = list(zip(names, dtypes))
    soa["normals"] = np.tile(np.array([[0, 0, 1.0]], np.float32), (64, 1))
    out = soa_to_structured(soa, meta, new_dtype, include_normals=True)
    np.testing.assert_array_equal(out["x"], arr["x"])
    np.testing.assert_array_equal(out["ring"], arr["ring"])
    np.testing.assert_array_equal(out["time"], arr["time"])
    np.testing.assert_array_equal(out["normal_z"], np.ones(64, np.float32))


def test_soa_to_structured_passes_through_all_schema_attributes():
    # regression (VERDICT r1): azimuth/distance (PCAP-decoded attributes)
    # were zero-filled at egress because only 4 canonical names passed
    # through; any SoA attribute present in the output schema must survive.
    n = 32
    rng = np.random.default_rng(0)
    soa = {
        "positions": rng.normal(size=(n, 3)).astype(np.float32),
        "intensity": rng.uniform(0, 255, n).astype(np.float32),
        "azimuth": rng.uniform(0, 360, n).astype(np.float32),
        "distance": rng.uniform(0.5, 80, n).astype(np.float32),
    }
    new_dtype = [
        ("x", np.float32), ("y", np.float32), ("z", np.float32),
        ("intensity", np.float32), ("azimuth", np.float32),
        ("distance", np.float32),
    ]
    out = soa_to_structured(soa, {}, new_dtype)
    np.testing.assert_array_equal(out["azimuth"], soa["azimuth"])
    np.testing.assert_array_equal(out["distance"], soa["distance"])
    np.testing.assert_array_equal(out["intensity"], soa["intensity"])


def test_create_cloud_wire_roundtrip():
    msg, arr = _velodyne_cloud()
    again = create_cloud(msg.header, msg.fields, read_points(msg))
    assert again.data == msg.data
    assert again.point_step == msg.point_step
    assert again.width == msg.width


def test_rgb_packed_ingest():
    fields, step = build_pointfields(
        ["x", "y", "z", "rgb"], [PointFieldType.FLOAT32] * 4
    )
    dtype = structured_dtype_from_fields(fields, step)
    arr = np.zeros(10, dtype=dtype)
    rgb_u8 = np.arange(30, dtype=np.uint8).reshape(10, 3)
    arr["rgb"] = merge_rgb_fields(rgb_u8[:, 0], rgb_u8[:, 1], rgb_u8[:, 2])
    msg = make_pointcloud2(arr, fields)
    soa, meta = pointcloud_to_dict(msg)
    assert meta["has_rgb"]
    np.testing.assert_array_equal(soa["rgb"], rgb_u8)


def test_read_points_organized_and_skip_nans_independent():
    # reference utils.py:206-211 passes skip_nans and
    # reshape_organized_cloud to read_points INDEPENDENTLY (they are not
    # mutually exclusive). An organized DENSE cloud with skip_nans=True
    # must still come back (H, W); a non-dense one with NaNs loses the
    # grid (rows dropped) and stays flat instead of raising (documented
    # deviation from sensor_msgs_py, which would raise on the reshape).
    rng = np.random.default_rng(3)
    fields, step = build_pointfields(["x", "y", "z"], [PointFieldType.FLOAT32] * 3)
    dtype = structured_dtype_from_fields(fields, step)
    arr = np.zeros(64, dtype=dtype)
    arr["x"] = rng.normal(size=64).astype(np.float32)

    dense = make_pointcloud2(arr, fields, height=8, is_dense=True)
    out = read_points(dense, skip_nans=True, reshape_organized_cloud=True)
    assert out.shape == (8, 8)

    # non-dense but actually NaN-free: skip drops nothing -> still (8, 8)
    clean = make_pointcloud2(arr, fields, height=8, is_dense=False)
    out = read_points(clean, skip_nans=True, reshape_organized_cloud=True)
    assert out.shape == (8, 8)

    arr2 = arr.copy()
    arr2["y"][::5] = np.nan
    holey = make_pointcloud2(arr2, fields, height=8, is_dense=False)
    out = read_points(holey, skip_nans=True, reshape_organized_cloud=True)
    assert out.ndim == 1 and out.shape[0] == 64 - 13
    assert np.isfinite(out["y"]).all()
