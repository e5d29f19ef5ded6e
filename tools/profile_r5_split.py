"""Honest stage split of the round-5 headline at the shipped knobs.

Times cumulative prefixes of the PRODUCTION_128K_CONFIG fused stage
list (models.pipeline.stage_functions, fused mode — the exact program
bench.py runs) with the in-jit chained device timer, iters=64, and
prints per-stage deltas. Replaces the stale tools/profile_front_stages
decomposition (pre round-5 knobs: no pre-voxel compact, H=100 ground).

Usage: python tools/profile_r5_split.py  (real TPU)
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
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        params_from_config,
        settings_from_config,
        stage_functions,
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
    settings = settings_from_config(PRODUCTION_128K_CONFIG)
    params = params_from_config(PRODUCTION_128K_CONFIG)
    stages = stage_functions(settings)
    names = [nm for nm, _ in stages]
    print("stage order:", names, flush=True)

    prev = 0.0
    for i in range(1, len(stages) + 1):
        sub = stages[:i]

        def prefix(b, p, k):
            for _nm, fn in sub:
                b, _aux = fn(b, p, k)
            return b

        t0 = time.perf_counter()
        ms = device_time_ms(
            lambda b: prefix(b, params, key), buf, iters=64, reps=5,
        )
        print(
            f"[split] through {names[i - 1]:<22s} {ms:.3f} ms "
            f"(+{ms - prev:.3f})  (wall {time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
