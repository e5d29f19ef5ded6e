"""Round-5 lever measurements, part II (real TPU).

1. full pipeline r5 profile (now: IN-KERNEL masked compaction + unstable
   voxel sort via the preset's voxel_first_attrs=False) vs the r4 profile
2. isolated masked_compact_pallas at 131072 (8ch)
3. isolated smallest_eigvec_entries at 51200 (the eigensolve glue)
4. isolated remove_ground at 131072 for num_iterations 100 / 64 / 48
5. in-context voxel stage: first_attrs True vs False at 65536

Usage: python tools/profile_r5_levers.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

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
        if k not in ("downsample.pre_voxel_capacity", "voxel_first_attrs")
    }
    for label, cfg in (("r4-shipped", cfg_old),
                       ("r5-kernel-compact+unstable", PRODUCTION_128K_CONFIG)):
        runner = pipeline_runner(settings_from_config(cfg))

        def full(pos, _runner=runner):
            return _runner(buf.replace(positions=pos), params, key)

        t0 = time.perf_counter()
        ms = device_time_ms(full, buf.positions, iters=64, reps=7)
        print(f"[full] {label}: p50 {ms:.3f} ms "
              f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)

    # isolated in-kernel compactor (8 channels raw)
    from autodriver_pointcloud_preprocessor_tpu.ops.pallas_segmean import (
        masked_compact_pallas,
    )

    mask8 = jnp.asarray(np.asarray(buf.mask))

    def compact_raw(pos):
        rows = jnp.concatenate(
            [pos, jnp.broadcast_to(pos[:1], (5, capacity))], axis=0
        )
        return masked_compact_pallas(rows, mask8)

    ms = device_time_ms(compact_raw, buf.positions, iters=64, reps=5)
    print(f"[isolated] masked_compact_pallas 131072 (8ch): {ms:.3f} ms",
          flush=True)

    def compact_op(pos):
        b = buf.replace(positions=pos)
        return ops.stream_compact_to(b, 65_536, backend="pallas")

    ms = device_time_ms(compact_op, buf.positions, iters=64, reps=5)
    print(f"[isolated] stream_compact_to 131072->65536 (5ch): {ms:.3f} ms",
          flush=True)

    # eigensolve glue at the neighborhood operating size
    from autodriver_pointcloud_preprocessor_tpu.ops.linalg import (
        smallest_eigvec_entries,
    )

    m = 51_200
    ent = [jnp.asarray(rng.uniform(0.1, 2.0, m).astype(np.float32))
           for _ in range(6)]

    def eig(a00):
        return smallest_eigvec_entries(a00, ent[1], ent[2], ent[3],
                                       ent[4], ent[5])

    ms = device_time_ms(eig, ent[0], iters=64, reps=5)
    print(f"[isolated] smallest_eigvec_entries @51200: {ms:.3f} ms",
          flush=True)

    # ground RANSAC iteration count
    for h in (100, 64, 48):
        def ground(pos, _h=h):
            b = buf.replace(positions=pos)
            b = ops.mask_non_finite(b, True, True)
            return ops.remove_ground(b, key, 0.12, 3, _h, live_prefix=False)

        ms = device_time_ms(ground, buf.positions, iters=64, reps=5)
        print(f"[isolated] non_finite+ground H={h} @131072: {ms:.3f} ms",
              flush=True)

    # voxel stage at 65536: stable vs unstable sort
    small, _ = from_soa(
        {
            "positions": pts[:60_000],
            "intensity": rng.uniform(0, 255, 60_000).astype(np.float32),
            "ring": rng.integers(0, 32, 60_000).astype(np.uint16),
        },
        capacity=65_536,
    )
    for fa in (True, False):
        def vox(pos, _fa=fa):
            b = small.replace(positions=pos)
            return ops.voxel_downsample(
                b, 0.08, backend="auto", dedup_exact=True,
                curve_order=True, compact_keys=True, first_attrs=_fa,
            )

        ms = device_time_ms(vox, small.positions, iters=64, reps=5)
        print(f"[isolated] voxel @65536 first_attrs={fa}: {ms:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
