"""End-to-end survivor jaccard: bench window profile vs exact kNN.

Runs the FULL headline pipeline twice on the bench scene — once with the
bench's window-kNN profile (settings imported from bench.py so this can
never drift from what the bench ships) and once with
``knn_method='exact'`` (same stages, exact neighborhoods, reference
voxel path) — and reports survivor-set jaccard over positions. This is
the end-to-end number behind the README quality row.

Usage: python tools/quality_e2e_jaccard.py   (real TPU; one-off compile
of the exact program is minutes).
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    sys.path.insert(0, ".")
    import bench as B
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
    from autodriver_pointcloud_preprocessor_tpu.models import (
        PipelineParams,
        PipelineSettings,
        build_pipeline,
    )

    n_points, capacity = 128_000, 131_072
    pts = B._scene(n_points)
    rng = np.random.default_rng(1)
    buf, _ = from_soa(
        {
            "positions": pts,
            "intensity": rng.uniform(0, 255, n_points).astype(np.float32),
            "ring": rng.integers(0, 32, n_points).astype(np.uint16),
        },
        capacity=capacity,
    )
    params = PipelineParams.make(voxel_size=0.08, distance_threshold=0.12)
    key = jax.random.PRNGKey(0)

    # the bench's exact settings object, via the SAME public config path
    # bench.py uses (models/presets.py) — cannot drift from what ships
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        settings_from_config,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.presets import (
        PRODUCTION_128K_CONFIG,
    )

    bench_settings = settings_from_config(PRODUCTION_128K_CONFIG)
    exact_settings = dataclasses.replace(
        bench_settings,
        knn_method="exact",
        window_blocks=1,
        knn_d2mode="highest",
        knn_kmode="sweep",
    )

    def survivors(settings):
        t0 = time.perf_counter()
        out, _plane = build_pipeline(settings)(buf, params, key)
        m = np.asarray(out.mask)
        P = np.asarray(out.positions)[:, m].T
        print(f"  {settings.knn_method}: {int(m.sum())} survivors "
              f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)
        return {tuple(row) for row in np.round(P, 5).tolist()}

    sw = survivors(bench_settings)
    se = survivors(exact_settings)
    inter = len(sw & se)
    union = len(sw | se)
    print(f"[e2e] jaccard {inter / union:.4f} "
          f"(window keeps {inter / max(len(se), 1):.4f} of exact, "
          f"exact keeps {inter / max(len(sw), 1):.4f} of window)",
          flush=True)


if __name__ == "__main__":
    main()
