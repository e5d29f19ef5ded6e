"""Round-5 ground-stage levers: vote subsampling + csel wb=0 skip.

Measures, on the real chip (iters=64 chained device timer):
1. isolated non_finite+ground @131072, H=64, score_subsample in
   {0, 32768, 16384, 8192} — the vote pass is the [N, H] distance
   matmul + compare + reduce, so cost should scale ~1/stride;
2. full headline pipeline p50: r5-prev preset (no subsample; csel wb=0
   refinement skip is in the kernel either way) vs the updated
   PRODUCTION_128K_CONFIG (subsample 16384);
3. quality: survivor-set jaccard between the two full programs across 4
   scene seeds (the ONLY way subsampling can change output is by picking
   a different winning hypothesis; refit + mask are full-N either way).

Usage: python tools/profile_r5_ground.py  (real TPU)
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

    # 1. isolated ground stage vs subsample
    for sub in (0, 32_768, 16_384, 8_192):
        def ground(pos, _s=sub):
            b = buf.replace(positions=pos)
            b = ops.mask_non_finite(b, True, True)
            return ops.remove_ground(
                b, key, 0.12, 3, 64, live_prefix=False, score_subsample=_s
            )

        ms = device_time_ms(ground, buf.positions, iters=64, reps=5)
        print(f"[isolated] non_finite+ground H=64 sub={sub}: {ms:.3f} ms",
              flush=True)

    # 2. full pipeline p50: prev (sub=0) vs shipped preset
    cfg_prev = dict(PRODUCTION_128K_CONFIG)
    cfg_prev["remove_ground.score_subsample"] = 0
    runners = {}
    for label, cfg in (("r5-prev (sub=0)", cfg_prev),
                       ("r5-ship (sub=16384)", PRODUCTION_128K_CONFIG)):
        runner = pipeline_runner(settings_from_config(cfg))
        runners[label] = runner

        def full(pos, _r=runner):
            return _r(buf.replace(positions=pos), params, key)

        t0 = time.perf_counter()
        ms = device_time_ms(full, buf.positions, iters=64, reps=7)
        print(f"[full] {label}: p50 {ms:.3f} ms "
              f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)

    # 3. survivor jaccard across scenes (winner-selection stability)
    import jax.numpy as jnp

    for seed in (0, 1, 2, 3):
        r2 = np.random.default_rng(100 + seed)
        jitter = r2.normal(0, 0.003, pts.shape).astype(np.float32)
        b2, _ = from_soa(
            {"positions": pts + jitter,
             "intensity": r2.uniform(0, 255, n_points).astype(np.float32),
             "ring": r2.integers(0, 32, n_points).astype(np.uint16)},
            capacity=capacity,
        )
        k2 = jax.random.PRNGKey(seed)
        outs = {}
        for label, runner in runners.items():
            out, _plane = runner(b2, params, k2)
            pos = np.asarray(out.positions).T[np.asarray(out.mask)]
            outs[label] = {tuple(np.round(p, 4)) for p in pos}
        a, b = outs.values()
        jac = len(a & b) / max(len(a | b), 1)
        print(f"[quality] seed={seed} survivors {len(a)} vs {len(b)} "
              f"jaccard {jac:.4f}", flush=True)


if __name__ == "__main__":
    main()
