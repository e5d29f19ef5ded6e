"""Full-system composition: the reference's intended multi-node graph.

loader x3 -> preprocessor x3 (namespaced, one process) -> concatenator ->
compressor, all on one bus — the deployment the reference sketches across
its modules (parameter_namespace for composition :121-126, concatenator +
compressor stubs).
"""
import numpy as np

from autodriver_pointcloud_preprocessor_tpu.core import read_points
from autodriver_pointcloud_preprocessor_tpu.core.msg import Time
from autodriver_pointcloud_preprocessor_tpu.io.compressor import (
    PointcloudCompressorNode,
    decompress_soa,
)
from autodriver_pointcloud_preprocessor_tpu.io.loader import soa_to_pointcloud2
from autodriver_pointcloud_preprocessor_tpu.parallel import (
    PointcloudConcatenatorNode,
)
from autodriver_pointcloud_preprocessor_tpu.runtime import (
    PointcloudPreprocessorNode,
    TopicBus,
)


def _sensor_scan(rng, n, x_offset, t):
    soa = {
        "positions": (rng.normal(0, 2, (n, 3)) + [x_offset, 0, 0]).astype(
            np.float32
        ),
        "intensity": rng.uniform(0, 255, n).astype(np.float32),
    }
    return soa_to_pointcloud2(soa, frame_id="sensor", stamp=Time.from_float(t))


def test_three_sensor_graph(rng):
    bus = TopicBus()

    # three namespaced preprocessors in one "process" (reference :121-126)
    nodes = []
    for i in range(3):
        nodes.append(
            PointcloudPreprocessorNode(
                node_name=f"pre_{i}",
                parameter_namespace=f"lidar{i}",
                bus=bus,
                overrides={
                    "input_topic": f"/lidar{i}/points",
                    "output_topic": f"/lidar{i}/processed",
                    "voxel_size": 0.0,
                    "estimate_normals": False,
                    "remove_duplicates": False,
                },
            )
        )

    # concatenator merges the three processed streams with extrinsics
    ext = {}
    for i in range(3):
        m = np.eye(4, dtype=np.float32)
        m[1, 3] = 10.0 * i  # separate sensors along y in the target frame
        ext[f"/lidar{i}/processed"] = m
    concat = PointcloudConcatenatorNode(
        bus,
        [f"/lidar{i}/processed" for i in range(3)],
        output_topic="/merged",
        extrinsics=ext,
        mode="sync",
        slop=0.05,
    )

    # compressor at the edge
    comp = PointcloudCompressorNode(bus, "/merged", "/merged/compressed")
    compressed = []
    bus.create_subscription("/merged/compressed", compressed.append)

    # publish one synchronized round from all three sensors
    sizes = [200, 300, 250]
    for i in range(3):
        bus.create_publisher(f"/lidar{i}/points").publish(
            _sensor_scan(rng, sizes[i], x_offset=5.0 * i, t=1.0 + 0.01 * i)
        )

    assert concat.frame_count == 1
    assert comp.frame_count == 1
    assert len(compressed) == 1

    # decompress the end product and verify the merged geometry
    soa = decompress_soa(compressed[0].data)
    pts = soa["positions"]
    assert pts.shape[0] == sum(sizes)
    # sensor i contributes a cluster near y = 10*i (extrinsic applied)
    for i in range(3):
        near = np.abs(pts[:, 1] - 10.0 * i) < 6.0
        assert near.sum() >= sizes[i] * 0.95

    # live reconfigure one namespaced node without disturbing the others
    from autodriver_pointcloud_preprocessor_tpu.runtime import Parameter

    res = nodes[1].set_parameters([Parameter("lidar1.voxel_size", 1.0)])
    assert res[0].successful
    for i in range(3):
        bus.create_publisher(f"/lidar{i}/points").publish(
            _sensor_scan(rng, sizes[i], x_offset=5.0 * i, t=2.0 + 0.01 * i)
        )
    assert concat.frame_count == 2
    soa2 = decompress_soa(compressed[1].data)
    # sensor 1's stream is now voxelized -> fewer merged points
    assert soa2["positions"].shape[0] < sum(sizes)
