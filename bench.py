"""Headline benchmark: 128k-point full preprocessing pipeline on one TPU core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* value: full-pipeline scans/sec on a 128k-point scan (every stage enabled:
  dedup, non-finite, crop, voxel, statistical outliers, normals, RANSAC
  ground — the BASELINE.json north-star configuration), measured with
  independent glue-free dispatches so the device pipelines scans
  (deployment streaming behavior). Since round 3 the stage ORDER uses the
  production ground-first mode (ground RANSAC before the neighborhood
  stages + post-ground capacity shrink; PipelineSettings
  .ground_before_neighborhood) — same stages, documented semantic
  difference from reference order (see settings note below).
* vs_baseline = 1 ms / p50 device latency per scan, against the
  BASELINE.json north-star target of 1 ms (>= 1.0 means target met).

Timing methodology (PERF_NOTES.md, round-2 revision): this backend's
block_until_ready does not block AND every eager op / extra dispatch costs
up to tens of ms of queue overhead, so

* LATENCY is measured inside ONE jitted program: a lax.fori_loop chains K
  pipeline invocations through a scalar data dependency (XLA cannot
  collapse iterations); per-scan = (T(K) - T(1)) / (K - 1). This is pure
  device compute with zero dispatch overhead — the number that scales.
* THROUGHPUT uses K independent dispatches with pre-materialized keys (no
  eager glue in the loop) and one final pull; the fixed sync cost cancels
  via (T(K_hi) - T(K_lo)) / (K_hi - K_lo).
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def _scene(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n_ground = int(n * 0.6)
    n_obj = n - n_ground
    ground = np.column_stack(
        [rng.uniform(-40, 40, (2, n_ground)).T, rng.normal(0, 0.03, n_ground)]
    )
    # a handful of object clusters above ground
    centers = rng.uniform(-30, 30, (24, 3)) * [1, 1, 0] + [0, 0, 1.5]
    obj = (
        centers[rng.integers(0, len(centers), n_obj)]
        + rng.normal(0, 0.8, (n_obj, 3))
    )
    pts = np.vstack([ground, obj]).astype(np.float32)
    pts[:: max(n // 200, 1)] = np.nan  # sprinkle of invalid returns
    return pts


def main() -> None:
    import jax

    # persistent compilation cache: repeated bench runs skip the 1-4 min
    # XLA compile of the fused pipeline
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
    from autodriver_pointcloud_preprocessor_tpu.models import build_pipeline
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        params_from_config,
        pipeline_runner,
        settings_from_config,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.presets import (
        PRODUCTION_128K_CONFIG,
    )

    n_points = 128_000
    capacity = 131_072
    pts = _scene(n_points)
    rng = np.random.default_rng(1)
    buf, _ = from_soa(
        {
            "positions": pts,
            "intensity": rng.uniform(0, 255, n_points).astype(np.float32),
            "ring": rng.integers(0, 32, n_points).astype(np.uint16),
        },
        capacity=capacity,
    )

    # The production profile comes in THROUGH the public config surface
    # (VERDICT r3 item 2): the same dotted parameter names the node
    # declares. Rationale for each knob (ground-before-voxel ordering,
    # compact 'box' voxel keys, mixed (1, 0) per-pass windows, fast3
    # distance matmul, 51200 shrink bucket) lives with the dict in
    # models/presets.py; measurements in PERF_NOTES.md. tests/
    # test_presets.py pins that this path reproduces the shipped profile.
    settings = settings_from_config(PRODUCTION_128K_CONFIG)
    params = params_from_config(PRODUCTION_128K_CONFIG)
    key = jax.random.PRNGKey(0)
    runner = pipeline_runner(settings)
    fn = build_pipeline(settings)

    # --- compile split (VERDICT r4 item 3): the first call is COLD iff the
    # persistent cache has no entries yet (the driver's bench runs start
    # from an empty /tmp); otherwise it is a warm (cache-served) compile.
    # When this process pays the cold compile, the warm figure is measured
    # in the same run by dropping the in-memory executable cache and
    # re-tracing — XLA then serves the persistent cache.
    import glob as _glob

    cache_was_warm = bool(_glob.glob("/tmp/jax_comp_cache/*"))
    t0 = time.perf_counter()
    out, plane = fn(buf, params, key)
    survivors = int(valid_count(out))
    compile_s = time.perf_counter() - t0
    if cache_was_warm:
        compile_cold_s, compile_warm_s = None, compile_s
    else:
        compile_cold_s = compile_s
        jax.clear_caches()
        runner = pipeline_runner(settings)
        fn = build_pipeline(settings)
        t0 = time.perf_counter()
        out, plane = fn(buf, params, key)
        compile_warm_s = time.perf_counter() - t0
    plane = np.asarray(plane)
    assert survivors > 0, "pipeline produced an empty cloud"
    assert np.isfinite(plane).all() and abs(plane[2]) > 0.9, plane
    # the shrink bucket must NOT be the binding constraint: well under
    # capacity means no live points were dropped by the capacity shrink
    assert survivors < 50_000, (
        f"survivors {survivors} too close to the 51200 shrink bucket; "
        "the bench would be silently dropping points"
    )

    # --- p50 LATENCY: K chained invocations inside ONE program -----------
    # The reduction must consume EVERY output leaf (positions, MASK,
    # attributes, plane): anything unconsumed is dead code XLA deletes
    # from the chained program, so mask-only tail stages (outlier
    # filters) would silently drop out of the measurement (caught round
    # 3 — a ground-only suite config read 0.001 ms). NaN-sentinel rows
    # are zeroed so they cannot poison the perturbation chain.
    def _consume(out):
        def red(leaf):
            f = leaf.astype(jnp.float32)
            return jnp.sum(jnp.where(jnp.isfinite(f), f, 0.0))

        return sum(red(leaf) for leaf in jax.tree_util.tree_leaves(out))

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def chain(b0, p, k0, n_iter):
        def body(i, acc):
            b = b0.replace(positions=b0.positions * (1.0 + acc * 1e-30))
            out = runner(b, p, jax.random.fold_in(k0, i))
            return acc + _consume(out) * 1e-30
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    # K=64/reps=9 (round 4, was 32/7): the tunnel's sync noise lands on
    # T(1) and divides by K-1, so doubling the chain halves the p50's
    # run-to-run band (PERF_NOTES: single-run deltas under ~0.15 ms are
    # noise at K=32)
    K = 64
    reps = 9
    t = {}
    for n_iter in (1, K):
        np.asarray(chain(buf, params, key, n_iter))  # compile + settle
        samples = []
        for _ in range(reps):
            s0 = time.perf_counter()
            np.asarray(chain(buf, params, key, n_iter))
            samples.append(time.perf_counter() - s0)
        t[n_iter] = float(np.median(samples))
    latency_ms = max((t[K] - t[1]) * 1e3 / (K - 1), 1e-3)

    # --- THROUGHPUT: sequential-batched dispatches ------------------------
    # Independent single-scan dispatches pay ~2.3 ms of per-dispatch queue
    # overhead on this backend (measured round 3: host dispatch loop is
    # only 0.14 ms/call, so the cost is tunnel/device-queue side). The
    # deployment throughput mode is therefore Preprocessor.process_batch
    # (sequential=True): one dispatch runs B scans back-to-back via
    # lax.map, sustaining chained-program throughput at +B-1 scans of
    # latency. Measured 3.68 -> 1.39 ms/scan at B=8.
    B = 8
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), buf
    )
    kstack = jax.random.split(key, B)

    def one(bk):
        return _consume(runner(bk[0], params, bk[1]))

    @jax.jit
    def batched(bs, ks):
        return jax.lax.map(one, (bs, ks))

    np.asarray(batched(stacked, kstack))  # compile + settle
    k_lo, k_hi = 2, 8
    tput = {}
    for kk in (k_lo, k_hi):
        samples = []
        for _ in range(reps):
            s0 = time.perf_counter()
            for _i in range(kk):
                r = batched(stacked, kstack)
            np.asarray(r)[:1]
            samples.append(time.perf_counter() - s0)
        tput[kk] = float(np.median(samples))
    tput_ms = max((tput[k_hi] - tput[k_lo]) * 1e3 / ((k_hi - k_lo) * B), 1e-3)
    scans_per_sec = 1000.0 / tput_ms

    # --- e2e QUALITY: survivor jaccard vs exact kNN (VERDICT r4 item 4) --
    # The shipped profile's end-to-end quality rides in the bench JSON so
    # round-over-round drift is visible in BENCH_r*.json (0.9898 -> 0.9880
    # -> 0.9860 went unguarded through round 4). Same protocol as
    # tools/quality_e2e_jaccard.py; set APC_BENCH_JACCARD=0 to skip (saves
    # the exact program's one-off compile).
    import dataclasses
    import os

    e2e_jaccard = None
    if os.environ.get("APC_BENCH_JACCARD", "1") != "0":
        exact_settings = dataclasses.replace(
            settings,
            knn_method="exact",
            window_blocks=1,
            knn_d2mode="highest",
            knn_kmode="sweep",
        )

        def _survivor_set(s):
            o, _pl = build_pipeline(s)(buf, params, key)
            m = np.asarray(o.mask)
            pos = np.asarray(o.positions)[:, m].T
            return {tuple(r) for r in np.round(pos, 5).tolist()}

        sw = _survivor_set(settings)
        se = _survivor_set(exact_settings)
        e2e_jaccard = round(len(sw & se) / max(len(sw | se), 1), 4)

    target_ms = 1.0  # BASELINE.json north star
    result = {
        "metric": "128k-pt full-pipeline scans/sec (one TPU core)",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(target_ms / latency_ms, 3),
        "p50_latency_ms": round(latency_ms, 3),
        "compile_cold_s": (
            None if compile_cold_s is None else round(compile_cold_s, 1)
        ),
        "compile_warm_s": round(compile_warm_s, 1),
        "e2e_jaccard": e2e_jaccard,
    }
    print(
        f"[bench] compile cold {compile_cold_s and round(compile_cold_s, 1)}s "
        f"/ warm {compile_warm_s:.1f}s, "
        f"p50 device latency {latency_ms:.2f}ms/scan, "
        f"pipelined {tput_ms:.2f}ms/scan, survivors {survivors}, "
        f"e2e jaccard {e2e_jaccard}, "
        f"plane {np.round(plane, 3).tolist()}",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
