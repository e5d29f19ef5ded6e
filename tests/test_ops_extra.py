"""Tests for the extension ops: radius outliers, downsamplers, height ground."""
import jax
import jax.numpy as jnp
import numpy as np

from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
from autodriver_pointcloud_preprocessor_tpu.models import (
    PipelineParams,
    PipelineSettings,
    build_pipeline,
)
from autodriver_pointcloud_preprocessor_tpu.ops import (
    farthest_point_downsample,
    random_downsample,
    remove_ground_by_height,
    remove_radius_outliers,
    uniform_downsample,
)


def _buf(points):
    return from_soa({"positions": np.asarray(points, np.float32)})


def test_radius_outliers_exact(rng):
    cluster = rng.normal(0, 0.05, (400, 3)).astype(np.float32)
    isolated = rng.uniform(20, 30, (10, 3)).astype(np.float32)
    pts = np.vstack([cluster, isolated])
    buf, _ = _buf(pts)
    out = remove_radius_outliers(buf, nb_points=5, search_radius=0.2, method="exact")
    mask = np.asarray(out.mask)[:410]
    assert mask[:400].mean() > 0.98
    assert mask[400:].sum() == 0


def test_radius_outliers_window_agrees(rng):
    cluster = rng.normal(0, 0.3, (2000, 3)).astype(np.float32)
    isolated = rng.uniform(30, 40, (20, 3)).astype(np.float32)
    pts = np.vstack([cluster, isolated])
    buf, _ = _buf(pts)
    e = remove_radius_outliers(buf, 5, 0.3, method="exact")
    w = remove_radius_outliers(buf, 5, 0.3, method="window")
    me, mw = np.asarray(e.mask)[:2020], np.asarray(w.mask)[:2020]
    assert (me == mw).mean() > 0.97
    assert mw[2000:].sum() == 0


def test_random_downsample(rng):
    pts = rng.normal(size=(4000, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    out = random_downsample(buf, 0.25, jax.random.PRNGKey(0))
    n = int(valid_count(out))
    assert 800 < n < 1200  # ~1000 expected
    # reproducible
    out2 = random_downsample(buf, 0.25, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(out2.mask))


def test_uniform_downsample(rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    out = uniform_downsample(buf, 5)
    assert int(valid_count(out)) == 200
    # every 5th live point by ordinal
    mask = np.asarray(out.mask)[:1000]
    assert mask[0] and mask[5] and not mask[1]


def test_farthest_point_downsample(rng):
    # two far clusters: FPS must cover both even with few samples
    a = rng.normal(0, 0.1, (500, 3)).astype(np.float32)
    b = rng.normal(0, 0.1, (500, 3)).astype(np.float32) + 50.0
    pts = np.vstack([a, b])
    buf, _ = _buf(pts)
    out = farthest_point_downsample(buf, 16)
    mask = np.asarray(out.mask)[:1000]
    assert mask.sum() == 16
    assert mask[:500].sum() >= 4 and mask[500:].sum() >= 4
    # fewer live points than samples -> keep all
    small, _ = _buf(rng.normal(size=(8, 3)).astype(np.float32))
    out2 = farthest_point_downsample(small, 16)
    assert int(valid_count(out2)) == 8


def test_remove_ground_by_height(rng):
    ground = np.column_stack(
        [rng.uniform(-5, 5, (2, 500)).T, rng.normal(0, 0.01, 500)]
    ).astype(np.float32)
    objects = rng.normal([0, 0, 2], 0.3, (200, 3)).astype(np.float32)
    buf, _ = _buf(np.vstack([ground, objects]))
    out = remove_ground_by_height(buf, [0.0, 0.0, 1.0, 0.0], 0.1)
    mask = np.asarray(out.mask)[:700]
    assert mask[:500].mean() < 0.02
    assert mask[500:].mean() > 0.98
    # signed variant removes everything below the plane too
    out2 = remove_ground_by_height(
        buf, [0.0, 0.0, 1.0, 0.0], 0.1, signed=True
    )
    assert int(valid_count(out2)) <= int(valid_count(out))


def test_pipeline_downsample_methods(rng):
    pts = rng.normal(0, 5, (3000, 3)).astype(np.float32)
    buf, _ = from_soa({"positions": pts})
    params = PipelineParams.make(sampling_ratio=0.3, every_k_points=4)
    key = jax.random.PRNGKey(0)
    base = dict(estimate_normals=False, crop_to_roi=False,
                remove_duplicates=False)
    for method, check in [
        ("random", lambda n: 700 < n < 1100),
        ("uniform", lambda n: n == 750),
        ("farthest_point", lambda n: n == 256),
    ]:
        s = PipelineSettings(downsample_method=method, fps_num_samples=256, **base)
        out, _ = build_pipeline(s)(buf, params, key)
        n = int(valid_count(out))
        assert check(n), (method, n)


def test_pipeline_ground_height_method(rng):
    ground = np.column_stack(
        [rng.uniform(-5, 5, (2, 800)).T, rng.normal(0, 0.01, 800)]
    ).astype(np.float32)
    objects = rng.normal([0, 0, 2], 0.3, (200, 3)).astype(np.float32)
    buf, _ = from_soa({"positions": np.vstack([ground, objects])})
    s = PipelineSettings(
        remove_ground=True, ground_method="height",
        estimate_normals=False, voxel_downsample=False,
        remove_duplicates=False, crop_to_roi=False,
    )
    params = PipelineParams.make(
        distance_threshold=0.1, ground_plane=(0.0, 0.0, 1.0, 0.0)
    )
    out, plane = build_pipeline(s)(buf, params, jax.random.PRNGKey(0))
    mask = np.asarray(out.mask)[:1000]
    assert mask[:800].mean() < 0.02 and mask[800:].mean() > 0.98
    np.testing.assert_array_equal(np.asarray(plane), [0, 0, 1, 0])


def test_pipeline_radius_outlier_stage(rng):
    cluster = rng.normal(0, 0.2, (1500, 3)).astype(np.float32)
    isolated = rng.uniform(20, 25, (15, 3)).astype(np.float32)
    buf, _ = from_soa({"positions": np.vstack([cluster, isolated])})
    s = PipelineSettings(
        remove_radius_outliers=True, knn_method="exact",
        estimate_normals=False, voxel_downsample=False,
        remove_duplicates=False, crop_to_roi=False,
    )
    params = PipelineParams.make(radius_nb_points=5, radius_search_radius=0.3)
    out, _ = build_pipeline(s)(buf, params, jax.random.PRNGKey(0))
    mask = np.asarray(out.mask)[:1515]
    assert mask[1500:].sum() == 0
    assert mask[:1500].mean() > 0.95
