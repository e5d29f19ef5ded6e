"""The shipped bench profile must be reachable through the public
parameter surface (VERDICT r3 item 2): models/presets.py ->
settings_from_config / params_from_config -> the exact settings bench.py
measures, and the node's declared parameters must accept + reconfigure
every knob in it (including ground_plane/use_height, dead in the
reference pointcloud_preprocessor.py:184-185 but real here)."""
import numpy as np
import pytest

from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
    PipelineSettings,
    params_from_config,
    settings_from_config,
)
from autodriver_pointcloud_preprocessor_tpu.models.presets import (
    PRODUCTION_128K_CONFIG,
)
from autodriver_pointcloud_preprocessor_tpu.runtime.node import (
    PointcloudPreprocessorNode,
)
from autodriver_pointcloud_preprocessor_tpu.runtime.params import Parameter


def test_production_config_reproduces_bench_settings():
    s = settings_from_config(PRODUCTION_128K_CONFIG)
    assert s == PipelineSettings(
        remove_statistical_outliers=True,
        nb_neighbors=20,
        estimate_normals=True,
        max_neighbors=30,
        remove_ground=True,
        ransac_n=3,
        num_iterations=64,  # round 5: P(miss) <= 1.4e-2 at 40% ground
        knn_method="window",
        ground_before_voxel=True,
        voxel_compact_keys="box",  # auto-derived: 80.4 m / 0.08 m = 1005 cells
        post_downsample_capacity=51_200,
        pre_voxel_compact_capacity=65_536,  # round 5: compact before the sort
        voxel_first_attrs=False,  # round 5: unstable voxel sort
        knn_d2mode="fast3",
        knn_kmode="csel",
        window_blocks=(1, 0),
        normals_merge_passes=False,
    )
    p = params_from_config(PRODUCTION_128K_CONFIG)
    assert float(p.voxel_size) == pytest.approx(0.08)
    assert float(p.distance_threshold) == pytest.approx(0.12)
    np.testing.assert_allclose(np.asarray(p.roi_max), [40.2, 40.2, 20.0])


def test_node_overrides_reach_the_same_settings():
    node = PointcloudPreprocessorNode(
        "prod_node", overrides=dict(PRODUCTION_128K_CONFIG)
    )
    assert node.engine.settings == settings_from_config(PRODUCTION_128K_CONFIG)
    assert float(node.engine.params.voxel_size) == pytest.approx(0.08)


def _set(node, name, value):
    (res,) = node.set_parameters([Parameter(name, value)])
    return res


def test_perf_knobs_reconfigure_and_validate():
    node = PointcloudPreprocessorNode("knob_node")
    assert node.engine.settings.knn_d2mode == "highest"
    assert _set(node, "knn_d2mode", "fast3").successful
    assert node.engine.settings.knn_d2mode == "fast3"
    # invalid enum rejected, settings unchanged
    res = _set(node, "knn_d2mode", "fast99")
    assert not res.successful
    assert node.engine.settings.knn_d2mode == "fast3"

    # per-pass window tuple: length must match neighborhood_passes
    assert _set(node, "window_blocks", [1, 0]).successful
    assert node.engine.settings.window_blocks == (1, 0)
    res = _set(node, "window_blocks", [1, 0, 0])
    assert not res.successful
    assert node.engine.settings.window_blocks == (1, 0)
    # ... unless passes changes WITH it (atomic coupled reconfigure)
    res = node.set_parameters_atomically(
        [Parameter("neighborhood_passes", 3),
         Parameter("window_blocks", [1, 0, 0])]
    )
    assert res.successful, res.reason
    assert node.engine.settings.neighborhood_passes == 3
    assert node.engine.settings.window_blocks == (1, 0, 0)
    # single-element array = uniform int
    assert _set(node, "window_blocks", [2]).successful
    assert node.engine.settings.window_blocks == 2
    assert _set(node, "knn_kmode", "bisect").successful
    assert node.engine.settings.knn_kmode == "bisect"
    assert not _set(node, "knn_kmode", "nope").successful


def test_ground_plane_reconfigure_moves_the_cut_live():
    """ground_plane is a traced param of the height method: reconfigure
    must move the cut WITHOUT changing the static settings (no recompile)."""
    node = PointcloudPreprocessorNode(
        "plane_node",
        overrides={
            "remove_ground": True,
            "remove_ground.method": "height",
            "ground_plane": [0.0, 0.0, 1.0, 0.0],  # z = 0 plane
            "remove_ground.distance_threshold": 0.05,
            "remove_statistical_outliers": False,
            "estimate_normals": False,
            "voxel_size": 0.0,
            "remove_duplicates": False,
        },
    )
    settings_before = node.engine.settings
    pts = np.zeros((6, 3), np.float32)
    pts[:, 2] = [0.0, 0.01, 0.5, 0.52, 1.0, 2.0]
    out, _meta = node.engine.process_soa({"positions": pts})
    kept_z = sorted(out["positions"][:, 2].tolist())
    assert kept_z == pytest.approx([0.5, 0.52, 1.0, 2.0])

    # move the plane to z = 0.5: the cut must follow, settings identical
    res = _set(node, "ground_plane", [0.0, 0.0, 1.0, -0.5])
    assert res.successful
    assert node.engine.settings == settings_before  # traced-only change
    out, _meta = node.engine.process_soa({"positions": pts})
    kept_z = sorted(out["positions"][:, 2].tolist())
    assert kept_z == pytest.approx([0.0, 0.01, 1.0, 2.0])

    # malformed plane rejected
    assert not _set(node, "ground_plane", [0.0, 0.0, 1.0]).successful


def test_use_height_reconfigure_switches_ground_method():
    node = PointcloudPreprocessorNode(
        "height_node", overrides={"remove_ground": True}
    )
    assert node.engine.settings.ground_method == "ransac"  # default intact
    assert _set(node, "use_height", True).successful
    assert node.engine.settings.ground_method == "height"
    assert _set(node, "use_height", False).successful
    assert node.engine.settings.ground_method == "ransac"


def test_quality_preset_resolves():
    from autodriver_pointcloud_preprocessor_tpu.models.presets import (
        PRODUCTION_128K_QUALITY_CONFIG,
    )

    s = settings_from_config(PRODUCTION_128K_QUALITY_CONFIG)
    assert s.window_blocks == (2, 0)
    assert s.knn_kmode == "csel"
    assert s.normals_merge_passes is True
    # everything else inherits the production profile
    assert s.ground_before_voxel and s.post_downsample_capacity == 51_200


def test_failed_batch_leaves_engine_untouched():
    """All-or-nothing contract (ADVICE r4): a batch with one invalid param
    must not apply the valid engine deltas either — the parameter store
    rolls back every value, so the engine must stay on the previous config
    or store and engine diverge."""
    node = PointcloudPreprocessorNode("atomic_gate_node")
    before = node.engine.settings
    res = node.set_parameters_atomically(
        [Parameter("knn_d2mode", "fast3"),
         Parameter("roi_min", [1.0, 2.0])]  # bad length -> batch fails
    )
    assert not res.successful
    assert node.engine.settings == before
    assert node.engine.settings.knn_d2mode == "highest"
