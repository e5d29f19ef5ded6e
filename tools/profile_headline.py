"""Quick headline latency: full PRODUCTION_128K_CONFIG fused pipeline,
in-jit chained timer (iters=64, reps=5), one number. For A/B of kernel
changes without the full bench.py run (no jaccard, no throughput).

Usage: python tools/profile_headline.py  (real TPU)
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
    from autodriver_pointcloud_preprocessor_tpu.models import build_pipeline
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        params_from_config,
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
    settings = settings_from_config(PRODUCTION_128K_CONFIG)
    params = params_from_config(PRODUCTION_128K_CONFIG)
    fn = build_pipeline(settings)

    t0 = time.perf_counter()
    ms = device_time_ms(lambda b: fn(b, params, key), buf, iters=64, reps=5)
    print(
        f"[headline] {ms:.3f} ms/scan (wall {time.perf_counter() - t0:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
