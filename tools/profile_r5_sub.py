"""Sub-blocks-per-step ablation for the segmean/compact kernel (real TPU).

Measures masked_compact_pallas (131k, 8ch) and segmented_sums_pallas
(voxel-like run structure at 65536) at sub in {4, 8, 16} via the
_FORCE_SUB hook.

Usage: python tools/profile_r5_sub.py
"""
from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    sys.path.insert(0, ".")
    from tools.device_timer import device_time_ms
    import autodriver_pointcloud_preprocessor_tpu.ops.pallas_segmean as psm

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    n = 131072
    vals = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=n) < 0.39)

    n2 = 65536
    vals2 = jnp.asarray(rng.normal(size=(8, n2)).astype(np.float32))
    # voxel-like runs: ~70% of rows start a run
    starts = jnp.asarray(rng.uniform(size=n2) < 0.7)

    try:
        for sub in (4, 8, 16):
            psm._FORCE_SUB = sub
            jax.clear_caches()

            def compact_raw(v):
                return psm.masked_compact_pallas(v, mask)

            ms = device_time_ms(compact_raw, vals, iters=64, reps=5)
            print(f"[sub={sub}] masked_compact 131k 8ch: {ms:.3f} ms",
                  flush=True)

            def seg(v):
                return psm.segmented_sums_pallas(v, starts)

            ms = device_time_ms(seg, vals2, iters=64, reps=5)
            print(f"[sub={sub}] segmented_sums 65536 8ch: {ms:.3f} ms",
                  flush=True)
    finally:
        psm._FORCE_SUB = None


if __name__ == "__main__":
    main()
