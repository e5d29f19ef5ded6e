"""Honest post-chain-fix profile of the headline pipeline's hot stages.

Round 3 discovered the chained-timing harness was dead-code-eliminating
every stage whose output feeds only the mask or attributes (the ENTIRE
fused pallas neighborhood). This script re-measures the stage costs with
the fixed tools.device_timer (consume-every-leaf) at the production
operating point: the bench scene, post-voxel post-ground curve-ordered
input, shrink to 51200 inside the neighborhood stage.

Usage:  python tools/profile_r3_honest.py [--quick]
Prints one line per measurement; run on the real TPU.
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
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
    from autodriver_pointcloud_preprocessor_tpu.models import (
        PipelineParams,
        PipelineSettings,
        build_pipeline,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
        _sorted_rows,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.pallas_window import (
        window_stats_pallas,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    quick = "--quick" in sys.argv

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
    params = PipelineParams.make(voxel_size=0.08, distance_threshold=0.12)
    key = jax.random.PRNGKey(0)

    # ---- produce the neighborhood stage's production input: the
    # curve-ordered, compacted, ground-free voxel survivors (the bench
    # settings minus the neighborhood consumers; shrink deferred) --------
    prep_settings = PipelineSettings(
        remove_ground=True,
        ransac_n=3,
        num_iterations=100,
        ground_before_voxel=True,
        voxel_compact_keys=True,
    )
    prep = build_pipeline(prep_settings)
    t0 = time.perf_counter()
    pre, _plane = prep(buf, params, key)
    live = int(valid_count(pre))
    print(f"[prep] compile {time.perf_counter() - t0:.1f}s, "
          f"voxel+ground survivors {live} of {capacity}", flush=True)
    pos = jax.device_put(pre.positions)
    msk = jax.device_put(pre.mask)
    attrs = {k: jax.device_put(v) for k, v in pre.attributes.items()}

    shrink = 51_200

    def nb_cfg(**kw):
        def fn(p, m, a):
            out = fused_neighborhood_stats_reordered(
                p, m, dict(a), k=20, radius=params.search_radius,
                backend="pallas", shrink_to=shrink,
                radius2=None, presorted=True, **kw,
            )
            return out
        return fn

    configs = [
        ("nb p2 wb1 sweep highest (prod)", dict(window_blocks=1, passes=2, kmode="sweep", d2mode="highest")),
        ("nb p2 wb1 bisect highest", dict(window_blocks=1, passes=2, kmode="bisect", d2mode="highest")),
        ("nb p2 wb1 sweep fast3", dict(window_blocks=1, passes=2, kmode="sweep", d2mode="fast3")),
        ("nb p2 wb1 bisect fast3", dict(window_blocks=1, passes=2, kmode="bisect", d2mode="fast3")),
        ("nb p1 wb1 sweep highest", dict(window_blocks=1, passes=1, kmode="sweep", d2mode="highest")),
    ]
    if quick:
        configs = configs[:2]
    for name, kw in configs:
        ms = device_time_ms(nb_cfg(**kw), pos, msk, attrs, iters=16, reps=5)
        print(f"[stage] {name}: {ms:.3f} ms", flush=True)

    # ---- pure kernel (no sorts, no attr carry): sorted 51200 rows ------
    sx, sy, sz, sv = _sorted_rows(pos, msk, 0, with_idx=False)
    sx, sy, sz, sv = (v[:shrink] for v in (sx, sy, sz, sv))
    sx = jax.device_put(np.asarray(sx))
    sy = jax.device_put(np.asarray(sy))
    sz = jax.device_put(np.asarray(sz))
    sv = jax.device_put(np.asarray(sv))

    def kern_cfg(**kw):
        def fn(x, y, z, v):
            return window_stats_pallas(x, y, z, v, 0.1, k=20, **kw)
        return fn

    kconfigs = [
        ("kernel wb1 sweep highest", dict(window_blocks=1, kmode="sweep", d2mode="highest")),
        ("kernel wb1 bisect highest", dict(window_blocks=1, kmode="bisect", d2mode="highest")),
        ("kernel wb1 sweep fast3", dict(window_blocks=1, kmode="sweep", d2mode="fast3")),
        ("kernel wb1 bisect fast3", dict(window_blocks=1, kmode="bisect", d2mode="fast3")),
        ("kernel wb0 sweep highest", dict(window_blocks=0, kmode="sweep", d2mode="highest")),
    ]
    if quick:
        kconfigs = kconfigs[:2]
    for name, kw in kconfigs:
        ms = device_time_ms(kern_cfg(**kw), sx, sy, sz, sv, iters=16, reps=5)
        print(f"[kernel] {name}: {ms:.3f} ms", flush=True)

    # ---- the pass-1 re-sort with the full payload (2 attr rows + 5 stat
    # rows + xyz) — the sort half of a second pass ------------------------
    def resort(x, y, z, v, extra):
        return _sorted_rows(jnp.stack([x, y, z]), v, 1, extra=tuple(extra),
                            with_idx=False)

    extra = tuple(jnp.zeros_like(sx) for _ in range(7))
    ms = device_time_ms(resort, sx, sy, sz, sv, extra, iters=16, reps=5)
    print(f"[sort] pass-1 re-sort 1key+10pay @51200: {ms:.3f} ms", flush=True)

    # ---- front end (transform+crop+finite+ground+voxel) ----------------
    def front(p, m, a):
        b = buf.replace(positions=p, mask=m, attributes=dict(a))
        out, plane = prep(b, params, key)
        return out, plane

    ms = device_time_ms(front, buf.positions, buf.mask, dict(buf.attributes),
                        iters=16, reps=5)
    print(f"[stage] front end (ground+voxel, no neighborhood): {ms:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
