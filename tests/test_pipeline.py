"""Fused pipeline + Preprocessor engine tests."""
import jax
import numpy as np

from autodriver_pointcloud_preprocessor_tpu.models import (
    PipelineParams,
    PipelineSettings,
    Preprocessor,
    build_pipeline,
    settings_from_config,
    stage_functions,
)
from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count


def _scene(rng, n_ground=2000, n_obj=500):
    ground = np.column_stack(
        [rng.uniform(-10, 10, (2, n_ground)).T, rng.normal(0, 0.02, n_ground)]
    )
    obj = rng.normal([0, 0, 2.0], 0.4, (n_obj, 3))
    pts = np.vstack([ground, obj]).astype(np.float32)
    return pts


def test_settings_from_config_defaults():
    s = settings_from_config({})
    assert s.remove_duplicates and s.remove_nans and s.remove_infs
    assert s.crop_to_roi and s.voxel_downsample
    assert not s.remove_statistical_outliers and not s.remove_ground
    assert s.estimate_normals and s.max_neighbors == 30
    assert not s.apply_offset_lidar  # identity offset -> disabled (:284-287)


def test_settings_offset_frames():
    offset = np.eye(4); offset[0, 3] = 1.0
    cfg = {"offset_pointcloud_matrix": offset.ravel().tolist()}
    s = settings_from_config(cfg)
    assert s.apply_offset_lidar and not s.apply_offset_robot
    cfg["offset_pointcloud_frame"] = "robot"
    cfg["_has_tf"] = True
    s = settings_from_config(cfg)
    assert not s.apply_offset_lidar and s.apply_offset_robot and s.apply_tf


def test_stage_order_matches_reference():
    s = PipelineSettings(
        remove_statistical_outliers=True, remove_ground=True,
        apply_tf=True, fuse_neighborhood=False,
    )
    # separate_stages (profile mode): reference stage order, one stage per
    # reference timing key
    names = [n for n, _ in stage_functions(s, separate_stages=True)]
    assert names == [
        "remove_duplicates", "non_finite", "transform", "crop", "voxel",
        "outliers", "normals", "ground",
    ]
    # production program: dedup fuses into the voxel sort (equivalent
    # result, one fewer sort)
    names = [n for n, _ in stage_functions(s)]
    assert names == [
        "non_finite", "transform", "crop", "voxel",
        "outliers", "normals", "ground",
    ]


def test_stage_order_fused_neighborhood():
    # default: outliers+normals fuse into one shared neighborhood sweep,
    # dedup fuses into the voxel sort
    s = PipelineSettings(remove_statistical_outliers=True, remove_ground=True)
    names = [n for n, _ in stage_functions(s)]
    assert names == [
        "non_finite", "crop", "voxel", "neighborhood", "ground",
    ]
    # dedup stays standalone when voxel downsampling is off
    import dataclasses

    s2 = dataclasses.replace(s, voxel_downsample=False)
    names2 = [n for n, _ in stage_functions(s2)]
    assert names2[0] == "remove_duplicates"


def test_fused_neighborhood_matches_sequential(rng):
    pts = _scene(rng, 2000, 400)
    buf, _ = from_soa({"positions": pts})
    import jax as _jax

    params = PipelineParams.make(voxel_size=0.0, std_ratio=2.0, search_radius=0.5)
    base = dict(
        remove_statistical_outliers=True, nb_neighbors=10,
        estimate_normals=True, max_neighbors=16,
        voxel_downsample=False, knn_method="window",
    )
    fused_fn = build_pipeline(PipelineSettings(fuse_neighborhood=True, **base))
    seq_fn = build_pipeline(PipelineSettings(fuse_neighborhood=False, **base))
    key = _jax.random.PRNGKey(0)
    out_f, _ = fused_fn(buf, params, key)
    out_s, _ = seq_fn(buf, params, key)
    mf, ms = np.asarray(out_f.mask), np.asarray(out_s.mask)
    assert (mf == ms).mean() > 0.99  # same outlier decisions
    nf = np.asarray(out_f.attributes["normals"]).T
    ns = np.asarray(out_s.attributes["normals"]).T
    both = mf & ms
    dots = np.abs((nf[both] * ns[both]).sum(1))
    # same normals where both live (fused computes normals pre-filter,
    # sequential post-filter; 384-candidate windows agree to ~96.5%)
    assert (dots > 0.99).mean() > 0.955


def test_fused_pipeline_runs(rng):
    pts = _scene(rng)
    pts[::101] = np.nan
    buf, _ = from_soa({"positions": pts})
    settings = PipelineSettings(
        remove_statistical_outliers=True, nb_neighbors=10,
        remove_ground=True, num_iterations=32, ransac_n=3,
        estimate_normals=True, max_neighbors=12,
    )
    fn = build_pipeline(settings)
    params = PipelineParams.make(voxel_size=0.2, distance_threshold=0.08)
    out, plane = fn(buf, params, jax.random.PRNGKey(0))
    n = int(valid_count(out))
    assert 0 < n < pts.shape[0]
    assert abs(float(plane[2])) > 0.99  # found the ground plane
    assert "normals" in out.attributes


def test_build_pipeline_cached():
    s1 = PipelineSettings()
    s2 = PipelineSettings()
    assert build_pipeline(s1) is build_pipeline(s2)
    s3 = PipelineSettings(remove_ground=True)
    assert build_pipeline(s3) is not build_pipeline(s1)


def test_preprocessor_engine_roundtrip(rng):
    pts = _scene(rng)
    engine = Preprocessor({"voxel_size": 0.3, "estimate_normals": True,
                           "remove_ground": True})
    out, meta = engine.process_soa({"positions": pts})
    assert out["positions"].shape[0] < pts.shape[0]
    assert meta["has_normals"]
    assert out["normals"].shape == out["positions"].shape
    assert meta["ground_plane_estimate"] is not None
    assert "preprocessing_time" in engine.processing_times
    assert "tensor_transfer" in engine.processing_times


def test_preprocessor_reconfigure_numeric_no_recompile(rng):
    pts = _scene(rng, 500, 100)
    engine = Preprocessor({"voxel_size": 0.2, "estimate_normals": False})
    engine.process_soa({"positions": pts})
    fn_before = build_pipeline(engine.settings)
    engine.update_config({"voxel_size": 0.4, "roi_min": [-5.0, -5.0, -5.0]})
    engine.process_soa({"positions": pts})
    assert build_pipeline(engine.settings) is fn_before  # same program


def test_preprocessor_profile_mode_stage_keys(rng):
    pts = _scene(rng, 500, 100)
    engine = Preprocessor(
        {"voxel_size": 0.2, "estimate_normals": True, "remove_ground": True},
        profile=True,
    )
    engine.process_soa({"positions": pts})
    for key in ("remove_duplicate_points", "remove_nan_points", "crop",
                "voxel_downsampling", "normal_estimation",
                "ground_segmentation", "preprocessing_time"):
        assert key in engine.processing_times, key


def test_preprocessor_tf_applied(rng):
    pts = np.zeros((10, 3), np.float32)
    engine = Preprocessor({"voxel_size": 0.0, "estimate_normals": False,
                           "remove_duplicates": False, "crop_to_roi": False})
    tf = np.eye(4, dtype=np.float32)
    tf[:3, 3] = [1.0, 2.0, 3.0]
    engine.set_tf_matrix(tf)
    out, _ = engine.process_soa({"positions": pts})
    np.testing.assert_allclose(out["positions"], np.tile([1, 2, 3], (10, 1)), atol=1e-6)


def test_preprocessor_batch(rng):
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count

    engine = Preprocessor({"voxel_size": 0.3, "estimate_normals": False,
                           "remove_ground": True})
    bufs = []
    for i in range(3):
        pts = _scene(np.random.default_rng(i), 800, 200)
        b, _ = from_soa({"positions": pts}, capacity=1024)
        bufs.append(b)
    outs, planes = engine.process_batch(bufs)
    assert len(outs) == 3
    assert planes.shape == (3, 4)
    for o, p in zip(outs, np.asarray(planes)):
        assert 0 < int(valid_count(o)) < 1024
        assert abs(p[2]) > 0.9


def test_post_downsample_shrink_matches_unshrunk(rng):
    # voxel output is front-compacted, so a post-downsample bucket with
    # headroom must leave the survivor SET (and downstream results)
    # identical — only the capacity changes.
    import dataclasses

    pts = _scene(rng)  # 2500 pts; voxel @0.2 leaves ~2200 (< 2560 bucket)
    buf, _ = from_soa({"positions": pts}, capacity=4096)
    base = PipelineSettings(
        remove_statistical_outliers=True, nb_neighbors=10,
        remove_ground=True, num_iterations=32, ransac_n=3,
        estimate_normals=True, max_neighbors=12,
    )
    shrunk = dataclasses.replace(base, post_downsample_capacity=2560)
    params = PipelineParams.make(voxel_size=0.2, distance_threshold=0.08)
    key = jax.random.PRNGKey(0)
    out_a, plane_a = build_pipeline(base)(buf, params, key)
    out_b, plane_b = build_pipeline(shrunk)(buf, params, key)
    assert out_b.capacity == 2560 and out_a.capacity == 4096
    na, nb = int(valid_count(out_a)), int(valid_count(out_b))
    assert na == nb
    pa = np.asarray(out_a.positions)[:, np.asarray(out_a.mask)]
    pb = np.asarray(out_b.positions)[:, np.asarray(out_b.mask)]
    np.testing.assert_allclose(
        np.sort(pa, axis=1), np.sort(pb, axis=1), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(plane_a), np.asarray(plane_b), atol=1e-6)


def test_post_downsample_shrink_caps_overflow(rng):
    # survivors beyond the bucket are dropped (capped-output semantics) —
    # and the retained subset is spatially UNBIASED: a voxel-key-order
    # prefix would keep one contiguous slab of the scene
    pts = rng.uniform(-50, 50, (3000, 3)).astype(np.float32)  # no voxel merging
    buf, _ = from_soa({"positions": pts}, capacity=4096)
    s = PipelineSettings(
        estimate_normals=False, crop_to_roi=False,
        post_downsample_capacity=512,
    )
    params = PipelineParams.make(voxel_size=0.01)
    out, _ = build_pipeline(s)(buf, params, jax.random.PRNGKey(0))
    assert out.capacity == 512
    assert int(valid_count(out)) == 512
    kept = np.asarray(out.positions)[:, np.asarray(out.mask)]
    # uniform cube input: an unbiased 512-point subsample spans nearly the
    # full bbox on every axis (a slab prefix would span ~1/6 of one axis)
    span = kept.max(axis=1) - kept.min(axis=1)
    assert (span > 80.0).all(), span


def test_post_downsample_overflow_keeps_all_structures(rng):
    # regression: cap overflow + ground removal. With a biased (voxel-key
    # prefix) cap the bucket filled with the lowest band of the scene and
    # ground removal then deleted EVERYTHING (0 survivors). The unbiased
    # subsample must retain off-ground structure.
    ground = np.column_stack(
        [rng.uniform(-10, 10, (3000, 2)), rng.normal(0, 0.01, 3000)]
    ).astype(np.float32)
    cluster = rng.normal([2.0, 2.0, 1.0], 0.2, (500, 3)).astype(np.float32)
    buf, _ = from_soa(
        {"positions": np.vstack([ground, cluster])}, capacity=4096
    )
    s = PipelineSettings(
        remove_statistical_outliers=True, estimate_normals=False,
        remove_ground=True, post_downsample_capacity=1024,
    )
    params = PipelineParams.make(voxel_size=0.15, distance_threshold=0.05)
    out, plane = build_pipeline(s)(buf, params, jax.random.PRNGKey(0))
    n = int(valid_count(out))
    assert n > 50, n  # cluster points survive ground removal
    kept = np.asarray(out.positions)[:, np.asarray(out.mask)]
    assert kept[2].max() > 0.5  # and they are the off-ground ones
    assert abs(np.asarray(plane)[2]) > 0.9


def test_post_downsample_shrink_noop_when_larger(rng):
    # bucket >= capacity: stage is a static no-op, shapes unchanged
    pts = _scene(rng, 300, 100)
    buf, _ = from_soa({"positions": pts}, capacity=512)
    s = PipelineSettings(estimate_normals=False, post_downsample_capacity=1024)
    out, _ = build_pipeline(s)(buf, params=PipelineParams.make(voxel_size=0.2),
                               key=jax.random.PRNGKey(0))
    assert out.capacity == 512


def test_pipeline_fused_dedup_voxel_equivalence(rng):
    # dedup fuses into the voxel sort (models/pipeline.py fuse_dedup): the
    # pipeline on an input WITH exact duplicates must match the pipeline
    # (dedup disabled) on the pre-deduplicated input.
    import dataclasses

    base = _scene(rng)
    pts = np.vstack([base, base[:400]]).astype(np.float32)  # 400 copies
    buf_dup, _ = from_soa({"positions": pts}, capacity=4096)
    buf_clean, _ = from_soa({"positions": base}, capacity=4096)
    s = PipelineSettings(
        remove_duplicates=True, remove_statistical_outliers=True,
        nb_neighbors=10, remove_ground=True, num_iterations=32, ransac_n=3,
        estimate_normals=False,
    )
    s_nodedup = dataclasses.replace(s, remove_duplicates=False)
    params = PipelineParams.make(voxel_size=0.2, distance_threshold=0.08)
    key = jax.random.PRNGKey(0)
    out_a, plane_a = build_pipeline(s)(buf_dup, params, key)
    out_b, plane_b = build_pipeline(s_nodedup)(buf_clean, params, key)
    assert int(valid_count(out_a)) == int(valid_count(out_b))
    pa = np.asarray(out_a.positions)[:, np.asarray(out_a.mask)]
    pb = np.asarray(out_b.positions)[:, np.asarray(out_b.mask)]
    np.testing.assert_allclose(np.sort(pa, axis=1), np.sort(pb, axis=1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(plane_a), np.asarray(plane_b),
                               atol=1e-5)


def test_preprocessor_batch_with_radius_outliers(rng):
    # batched (vmapped) pipeline with remove_radius_outliers enabled — the
    # round-1 backend hole: the radius stage picked the Pallas backend
    # under vmap and crashed on real TPU (VERDICT r1 weak #3)
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa

    engine = Preprocessor({
        "voxel_size": 0.0, "estimate_normals": False,
        "remove_duplicates": False, "crop_to_roi": False,
        "remove_radius_outliers": True,
        "remove_radius_outliers.nb_points": 5,
        "remove_radius_outliers.search_radius": 0.3,
    })
    bufs = []
    for i in range(3):
        r = np.random.default_rng(i)
        cluster = r.normal(0, 0.2, (900, 3)).astype(np.float32)
        isolated = r.uniform(20, 25, (10, 3)).astype(np.float32)
        b, _ = from_soa(
            {"positions": np.vstack([cluster, isolated])}, capacity=1024
        )
        bufs.append(b)
    outs, _planes = engine.process_batch(bufs)
    for o in outs:
        m = np.asarray(o.mask)[:910]
        assert m[900:].sum() == 0  # isolated specks removed in every scan
        assert m[:900].mean() > 0.95


def test_ground_before_neighborhood_survivor_parity(rng):
    # the ground-first performance ordering must produce (near-)identical
    # survivor sets to reference order — ground points die either way, and
    # the outlier threshold shifts only marginally (PipelineSettings
    # docstring). Also checks the deferred capacity shrink engages and
    # attributes (incl. int ring) survive the in-sort shrink.
    import dataclasses

    pts = _scene(rng, 7000, 1800)
    buf, _ = from_soa(
        {"positions": pts, "ring": rng.integers(0, 16, len(pts)).astype(np.uint16)},
        capacity=16384,
    )
    base = PipelineSettings(
        remove_statistical_outliers=True, nb_neighbors=8,
        estimate_normals=True, max_neighbors=8, remove_ground=True,
        ransac_n=3, num_iterations=64, knn_method="window",
    )
    params = PipelineParams.make(
        voxel_size=0.1, distance_threshold=0.1, std_ratio=1.5,
        search_radius=0.4,
    )
    key = jax.random.PRNGKey(0)
    out_ref, plane_ref = build_pipeline(base)(buf, params, key)
    gf = dataclasses.replace(
        base, ground_before_neighborhood=True, post_downsample_capacity=4096
    )
    out_gf, plane_gf = build_pipeline(gf)(buf, params, key)

    assert out_gf.capacity == 4096  # shrink engaged
    assert abs(np.asarray(plane_gf)[2]) > 0.99
    assert "normals" in out_gf.attributes
    assert out_gf.attributes["ring"].shape == (4096,)

    a = np.asarray(out_ref.positions).T[np.asarray(out_ref.mask)]
    b = np.asarray(out_gf.positions).T[np.asarray(out_gf.mask)]
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    fwd = (d2.min(axis=1) < 1e-8).mean()
    bwd = (d2.min(axis=0) < 1e-8).mean()
    # the documented semantic shift: outlier mean/std are computed over the
    # non-ground cloud only, so the threshold tightens on object-dense
    # scenes and some borderline points flip (here ~5% fwd). Everything
    # ground-first keeps must also survive reference order (bwd ~ 1).
    assert fwd >= 0.93, (fwd, bwd)
    assert bwd >= 0.97, (fwd, bwd)


def test_ground_before_neighborhood_stage_order():
    import dataclasses

    s = PipelineSettings(
        remove_statistical_outliers=True, estimate_normals=True,
        remove_ground=True, knn_method="window",
        ground_before_neighborhood=True, post_downsample_capacity=1024,
    )
    names = [n for n, _ in stage_functions(s)]
    assert names.index("ground") < names.index("neighborhood")
    assert "shrink" not in names  # folded into the neighborhood sort
    # unfused variant pays an explicit shrink stage after ground
    s2 = dataclasses.replace(s, fuse_neighborhood=False)
    names2 = [n for n, _ in stage_functions(s2)]
    assert names2.index("ground") < names2.index("shrink") < names2.index("outliers")


def test_preprocessor_batch_sequential(rng):
    # sequential (lax.map) batch mode: one dispatch, scans run back-to-back
    # — the large-scan deployment throughput mode (PERF_NOTES.md round 3)
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa

    engine = Preprocessor(
        {"voxel_size": 0.1, "estimate_normals": True,
         "estimate_normals.max_neighbors": 8, "knn_method": "exact"}
    )
    bufs = [
        from_soa({"positions": _scene(rng, 800, 200)}, capacity=2048)[0]
        for _ in range(3)
    ]
    outs, planes = engine.process_batch(bufs, sequential=True)
    assert len(outs) == 3 and planes.shape == (3, 4)
    outs_v, _ = engine.process_batch(bufs, sequential=False)
    for a, b in zip(outs, outs_v):
        assert int(valid_count(a)) == int(valid_count(b))
        assert "normals" in a.attributes


def test_ground_before_voxel_survivor_parity(rng):
    # pre-voxel ground ordering (+ curve-ordered voxel + presorted fused
    # neighborhood) must match the post-voxel ground-first ordering's
    # survivor set almost exactly: the plane is fit to the raw cloud
    # instead of the voxel centroids but lands on the same ground.
    import dataclasses

    pts = _scene(rng, 7000, 1800)
    buf, _ = from_soa(
        {"positions": pts, "ring": rng.integers(0, 16, len(pts)).astype(np.uint16)},
        capacity=16384,
    )
    base = PipelineSettings(
        remove_statistical_outliers=True, nb_neighbors=8,
        estimate_normals=True, max_neighbors=8, remove_ground=True,
        ransac_n=3, num_iterations=64, knn_method="window",
        ground_before_neighborhood=True, post_downsample_capacity=4096,
    )
    params = PipelineParams.make(
        voxel_size=0.1, distance_threshold=0.1, std_ratio=1.5,
        search_radius=0.4,
    )
    key = jax.random.PRNGKey(0)
    out_gf, _ = build_pipeline(base)(buf, params, key)
    gv = dataclasses.replace(base, ground_before_voxel=True)
    out_gv, plane_gv = build_pipeline(gv)(buf, params, key)

    assert out_gv.capacity == 4096  # deferred shrink engaged
    assert abs(np.asarray(plane_gv)[2]) > 0.99
    assert "normals" in out_gv.attributes
    assert out_gv.attributes["ring"].shape == (4096,)

    a = np.asarray(out_gf.positions).T[np.asarray(out_gf.mask)]
    b = np.asarray(out_gv.positions).T[np.asarray(out_gv.mask)]
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    fwd = (d2.min(axis=1) < 1e-8).mean()
    bwd = (d2.min(axis=0) < 1e-8).mean()
    assert fwd >= 0.95, (fwd, bwd)
    assert bwd >= 0.95, (fwd, bwd)


def test_ground_before_voxel_stage_order():
    s = PipelineSettings(
        remove_statistical_outliers=True, estimate_normals=True,
        remove_ground=True, knn_method="window",
        ground_before_voxel=True, post_downsample_capacity=1024,
    )
    names = [n for n, _ in stage_functions(s)]
    assert names.index("ground") < names.index("voxel") < names.index(
        "neighborhood"
    )
    assert names.count("ground") == 1
    assert "shrink" not in names  # folded into the presorted prefix slice


def test_pre_voxel_compaction_is_bit_exact(rng, monkeypatch):
    """The round-5 pre-voxel stream compaction must be invisible to the
    result: bit-identical survivor positions/attributes vs the same
    pipeline without it (the compactor is an exact passthrough and
    preserves live-row order, so the voxel sort sees the same sequence)."""
    monkeypatch.setenv("APC_WINDOW_BACKEND", "pallas_interpret")
    n, cap = 6000, 8192
    ground = np.column_stack(
        [rng.uniform(-8, 8, (2, 4000)).T, rng.normal(0, 0.02, 4000)]
    )
    obj = rng.normal([0, 0, 2.0], 0.7, (2000, 3))
    pts = np.vstack([ground, obj]).astype(np.float32)
    pts[::53] = np.nan
    buf, _ = from_soa(
        {
            "positions": pts,
            "intensity": rng.uniform(0, 255, n).astype(np.float32),
            "ring": rng.integers(0, 16, n).astype(np.uint16),
        },
        capacity=cap,
    )
    base = dict(
        remove_ground=True,
        ground_before_voxel=True,
        num_iterations=64,
        ransac_n=3,
        remove_statistical_outliers=True,
        nb_neighbors=8,
        estimate_normals=True,
        knn_method="window",
        voxel_compact_keys="box",
        post_downsample_capacity=2048,
    )
    params = PipelineParams.make(voxel_size=0.15, distance_threshold=0.08)
    key = jax.random.PRNGKey(0)
    out_ref, plane_ref = build_pipeline(PipelineSettings(**base))(
        buf, params, key
    )
    out_c, plane_c = build_pipeline(
        PipelineSettings(pre_voxel_compact_capacity=4096, **base)
    )(buf, params, key)
    np.testing.assert_array_equal(np.asarray(plane_ref), np.asarray(plane_c))
    m_r, m_c = np.asarray(out_ref.mask), np.asarray(out_c.mask)
    assert m_r.sum() == m_c.sum() > 100
    np.testing.assert_array_equal(
        np.asarray(out_ref.positions)[:, m_r], np.asarray(out_c.positions)[:, m_c]
    )
    for k in ("intensity", "ring"):
        np.testing.assert_array_equal(
            np.asarray(out_ref.attributes[k])[..., m_r],
            np.asarray(out_c.attributes[k])[..., m_c],
        )
