"""Named production configurations, expressed on the PUBLIC config surface.

The headline bench profile used to be a hand-built ``PipelineSettings``
object, which meant the configuration the published numbers were measured
on was not reachable through the reference-shaped parameter surface
(VERDICT r3 item 2). This module states it as a plain config dict using
the same dotted parameter names the node declares
(runtime/node.py PARAMETER_DEFAULTS; reference parameter list:
pointcloud_preprocessor.py:129-199) — ``bench.py`` builds its settings and
params exclusively via ``settings_from_config`` / ``params_from_config``
on this dict, and a node constructed with ``overrides=PRODUCTION_128K_CONFIG``
runs the identical program (pinned by tests/test_presets.py).
"""
from __future__ import annotations

#: The 128k-point full-pipeline production profile (the headline bench).
#:
#: Every stage enabled: dedup (fused into the voxel sort), non-finite,
#: crop, voxel downsample, statistical outliers, normals, RANSAC ground.
#: Performance posture (measured in PERF_NOTES.md round 3):
#: * ground RANSAC on the raw post-crop cloud (remove_ground.before_voxel)
#:   so the voxel sort emits compacted + ground-free + curve-ordered
#:   output and the neighborhood runs at the 51200-point bucket;
#: * compact voxel keys auto-derive to tier 'box' from the ROI/voxel-size
#:   bound (span 80.4 m / 0.08 m = 1005 cells <= 1008);
#: * mixed per-pass windows (1, 0): full symmetric 384-candidate window on
#:   the free presorted pass, one-sided 256 window on the re-sorted pass;
#: * 3-pass bf16-split distance matmul (knn_d2mode='fast3');
#: * own-block threshold k-select (knn_kmode='csel', round 4): quality
#:   94.9% vs the exact sweep's 95.15% at this operating point (floor
#:   93), p50 1.80 -> 1.72 ms together with the adaptive 16-block kernel
#:   grid grouping. The quality-first alternative is window_blocks=(2,0)
#:   with csel (95.6%, ~1.85 ms).
#: The crop ROI bounds the bench scene (+-40 m ground plane) with margin
#: while keeping the compact-key 'box' tier provable.
PRODUCTION_128K_CONFIG: dict = {
    "crop_to_roi": True,
    "roi_min": [-40.2, -40.2, -20.0],
    "roi_max": [40.2, 40.2, 20.0],
    "voxel_size": 0.08,
    "remove_statistical_outliers": True,
    "remove_statistical_outliers.nb_neighbors": 20,
    "remove_statistical_outliers.std_ratio": 2.0,
    "estimate_normals": True,
    "estimate_normals.max_neighbors": 30,
    "estimate_normals.search_radius": 0.1,
    "remove_ground": True,
    "remove_ground.ransac_number": 3,
    # 64 hypotheses (round 5; reference default 100): with >= 40% ground
    # inliers, P(no all-inlier triple in 64 draws) = (1 - 0.4^3)^64 =
    # 1.4e-2 worst case, and at the bench scene's ~60% ground it is
    # 1.7e-7; the winner refits on ALL inliers either way. Measured
    # 0.143 -> 0.101 ms for the ground stage at 131k.
    "remove_ground.num_iterations": 64,
    "remove_ground.distance_threshold": 0.12,
    "remove_ground.before_voxel": True,
    # remove_ground.score_subsample stays 0 (full vote): measured a
    # PESSIMIZATION here — the strided vote slice costs a relayout that
    # dwarfs the saved [N, H] pass (0.058 ms full vote vs 0.553 ms at
    # sub=16384; PERF_NOTES round 5, tools/profile_r5_ground.py).
    "downsample.max_points": 51_200,
    # round 5: stream-compact the post-ground cloud (live ~51k of 131k)
    # into a 65536 bucket before the voxel sort — the sort and segmean are
    # capacity-bound, so they run at half cost for the compactor's ~0.14
    # ms (ops.compact.stream_compact_to). Sized with ~28% headroom over
    # the worst-case post-ground live count; overflow drops points
    # (capped-output semantics), which bench.py's survivor assertion
    # would catch.
    "downsample.pre_voxel_capacity": 65_536,
    # round 5: unstable voxel sort — among exact coordinate duplicates an
    # arbitrary copy donates ring/intensity (reference keeps the first);
    # positions/survivors unaffected. Saves the stable-sort tax.
    "voxel_first_attrs": False,
    "knn_method": "window",
    "knn_d2mode": "fast3",
    "knn_kmode": "csel",
    "window_blocks": (1, 0),
    # normals from pass 0 only: 3 normal rows ride the pass-1 re-sort
    # instead of 6 covariance entries and pass 1 skips the moment matmul.
    # Free at this operating point: kNN means are bit-identical and
    # normals-vs-exact-PCA agreement measures 95.0% within 10 degrees
    # WITH OR WITHOUT the merge (bench scene, round 4).
    "normals_merge_passes": False,
}

#: Quality-first variant of the production profile (round 4): a wider
#: symmetric first window — wb(2,0) with the own-block select costs only
#: ~0.3 ms over the shipped profile (measured 1.85 vs 1.56 ms p50)
#: because csel's select cost is window-independent, and buys 95.6%
#: outlier-classification agreement vs the shipped 94.9% (exact-sweep
#: wb(1,0): 95.15%). Same stage semantics; pass-merged normals kept.
PRODUCTION_128K_QUALITY_CONFIG: dict = {
    **PRODUCTION_128K_CONFIG,
    "window_blocks": (2, 0),
    "normals_merge_passes": True,
    # reference-exact duplicate semantics (first occurrence donates attrs)
    "voxel_first_attrs": True,
}
