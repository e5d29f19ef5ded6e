"""Bisect the production voxel op's 1.5 ms in-context cost (real TPU).

tools/profile_front_stages.py (iters=64) measured the bench voxel stage
at 1.50 ms — ~2x the sum of its parts from the sort table + segmean
kernel numbers. This times ops.voxel_downsample variants and inline
sub-pieces at iters=64 to localize the gap. (profile_voxel_bisect.py's
iters=16 numbers were noise-dominated: +-0.15 ms swings, 'full' < 'sums'.)

Usage: python tools/profile_voxel_variants.py
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
    from autodriver_pointcloud_preprocessor_tpu.ops.pallas_segmean import (
        segmented_sums_pallas,
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
    buf_noattr = buf.replace(attributes={})
    buf_inten = buf.replace(attributes={"intensity": buf.attributes["intensity"]})

    variants = [
        ("prod (curve+compact+dedup, intensity+ring)", buf,
         dict(dedup_exact=True, curve_order=True, compact_keys=True)),
        ("no ring (drops first-slice + stable)", buf_inten,
         dict(dedup_exact=True, curve_order=True, compact_keys=True)),
        ("no attrs", buf_noattr,
         dict(dedup_exact=True, curve_order=True, compact_keys=True)),
        ("no dedup (1 hilbert key)", buf,
         dict(dedup_exact=False, curve_order=True, compact_keys=True)),
        ("plain (no curve/compact/dedup)", buf,
         dict(dedup_exact=False, curve_order=False, compact_keys=False)),
        ("xla backend (prod keys)", buf,
         dict(dedup_exact=True, curve_order=True, compact_keys=True,
              backend="xla")),
    ]
    for name, b, kw in variants:
        t0 = time.perf_counter()
        ms = device_time_ms(
            lambda p, m, a, _b=b, _kw=kw: ops.voxel_downsample(
                _b.replace(positions=p, mask=m, attributes=dict(a)),
                0.08, **_kw),
            b.positions, b.mask, dict(b.attributes), iters=64, reps=5,
        )
        print(f"[voxel] {name}: {ms:.3f} ms (wall {time.perf_counter()-t0:.0f}s)",
              flush=True)

    # isolated segmean on realistic run structure (voxel survivors ~51k
    # groups of 131k rows)
    flags = np.zeros(capacity, bool)
    flags[np.cumsum(rng.integers(1, 5, 60000))[:-1].clip(0, capacity - 1)] = True
    vals = rng.normal(size=(6, capacity)).astype(np.float32)
    ms = device_time_ms(
        lambda v, f: segmented_sums_pallas(v, f),
        jnp.asarray(vals), jnp.asarray(flags), iters=64, reps=5,
    )
    print(f"[segmean] isolated 6ch @131k: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
