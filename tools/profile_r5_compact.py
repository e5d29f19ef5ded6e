"""Round-5 profile: pre-voxel stream compaction, old vs new preset (real TPU).

Measures, with the PERF_NOTES chained harness (iters=64):
1. full-pipeline p50, r4 shipped profile (no pre-voxel compaction)
2. full-pipeline p50, r5 profile (pre_voxel_compact_capacity=65536)
3. front-stage prefixes of the r5 path (non_finite / ground / compact /
   voxel) to attribute the delta
4. the stream compactor isolated at 131072 -> 65536 (5 channels)

Usage: python tools/profile_r5_compact.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    sys.path.insert(0, ".")
    from bench import _scene
    from tools.device_timer import device_time_ms
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu import ops
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        params_from_config,
        pipeline_runner,
        settings_from_config,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.presets import (
        PRODUCTION_128K_CONFIG,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()

    n_points, capacity = 128_000, 131_072
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
    key = jax.random.PRNGKey(0)
    params = params_from_config(PRODUCTION_128K_CONFIG)

    cfg_old = {
        k: v for k, v in PRODUCTION_128K_CONFIG.items()
        if k != "downsample.pre_voxel_capacity"
    }
    for label, cfg in (("r4-shipped", cfg_old), ("r5-compact", PRODUCTION_128K_CONFIG)):
        runner = pipeline_runner(settings_from_config(cfg))

        def full(pos, _runner=runner):
            return _runner(buf.replace(positions=pos), params, key)

        t0 = time.perf_counter()
        ms = device_time_ms(full, buf.positions, iters=64, reps=7)
        print(f"[full] {label}: p50 {ms:.3f} ms "
              f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)

    # front prefixes of the r5 path
    def front(positions, stop_after):
        b = buf.replace(positions=positions)
        b = ops.mask_non_finite(b, True, True)
        if stop_after == "non_finite":
            return b
        b, plane = ops.remove_ground(b, key, 0.12, 3, 100, live_prefix=False)
        if stop_after == "ground":
            return b, plane
        b = ops.stream_compact_to(b, 65_536, backend="pallas")
        if stop_after == "compact":
            return b, plane
        b = ops.voxel_downsample(
            b, 0.08, backend="auto", dedup_exact=True,
            curve_order=True, compact_keys=True,
        )
        return b, plane

    for st in ("non_finite", "ground", "compact", "voxel"):
        t0 = time.perf_counter()
        ms = device_time_ms(
            lambda p, _st=st: front(p, _st), buf.positions, iters=64, reps=5
        )
        print(f"[front-r5] through {st}: {ms:.3f} ms "
              f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)

    # isolated compactor
    def compact_only(pos):
        b = buf.replace(positions=pos)
        return ops.stream_compact_to(b, 65_536, backend="pallas")

    ms = device_time_ms(compact_only, buf.positions, iters=64, reps=5)
    print(f"[isolated] stream_compact_to 131072->65536 (5ch): {ms:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
