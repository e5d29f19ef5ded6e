"""Inline profile of the HEADLINE bench's exact front half on the real TPU.

The bench program is: non_finite -> ground(raw RANSAC) -> voxel
(curve-order compact-key dedup-fused) -> fused neighborhood (presorted,
shrink 51200). tools/profile_r3_honest.py measured the neighborhood stage
at 1.48 ms but its "front" config took a DIFFERENT (non-fused) voxel
path, so the bench front half was never honestly decomposed. This builds
the front stages inline with the bench's exact knobs and times cumulative
prefixes with iters=64 (the +-0.1 ms noise at iters=16 swamped sub-stage
deltas).

Usage: python tools/profile_front_stages.py
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

    def front(positions, mask, attrs, stop_after):
        b = buf.replace(positions=positions, mask=mask,
                        attributes=dict(attrs))
        b = ops.mask_non_finite(b, True, True)
        if stop_after == "non_finite":
            return b
        b, plane = ops.remove_ground(b, key, 0.12, 3, 100, live_prefix=False)
        if stop_after == "ground":
            return b, plane
        b = ops.voxel_downsample(
            b, 0.08, backend="auto", dedup_exact=True,
            curve_order=True, compact_keys=True,
        )
        return b, plane

    for st in ("non_finite", "ground", "voxel"):
        t0 = time.perf_counter()
        ms = device_time_ms(
            lambda p, m, a, _st=st: front(p, m, a, _st),
            buf.positions, buf.mask, dict(buf.attributes),
            iters=64, reps=5,
        )
        print(f"[front] through {st}: {ms:.3f} ms "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
