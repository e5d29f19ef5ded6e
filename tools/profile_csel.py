"""Chained-latency comparison of k-select/window variants on real TPU.

Reuses bench.py's harness (chained fori_loop, consume-every-leaf
reduction — tests/test_bench_harness.py pins the DCE-safety) on the
PRODUCTION_128K_CONFIG with the candidate round-4 neighborhood profiles:

    sweep wb(1,0)  — the round-3 shipped profile (baseline)
    csel  wb(1,0)  — own-block threshold select, same windows
    csel  wb(2,0)  — wider symmetric first window (quality 95.61% vs
                     shipped 95.15%; csel makes wide windows cheap)
    csel  wb1      — uniform window tuple

Run: python tools/profile_csel.py   (one TPU process at a time!)
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from bench import _scene
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        params_from_config,
        pipeline_runner,
        settings_from_config,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.presets import (
        PRODUCTION_128K_CONFIG,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    n_points = 128_000
    pts = _scene(n_points)
    rng = np.random.default_rng(1)
    buf, _ = from_soa(
        {
            "positions": pts,
            "intensity": rng.uniform(0, 255, n_points).astype(np.float32),
            "ring": rng.integers(0, 32, n_points).astype(np.uint16),
        },
        capacity=131_072,
    )
    key = jax.random.PRNGKey(0)

    def _consume(out):
        def red(leaf):
            f = leaf.astype(jnp.float32)
            return jnp.sum(jnp.where(jnp.isfinite(f), f, 0.0))

        return sum(red(leaf) for leaf in jax.tree_util.tree_leaves(out))

    from autodriver_pointcloud_preprocessor_tpu.ops import pallas_window as pw

    variants = [
        ("sweep wb(1,0) _G4 [shipped r3]", {}, 4),
        ("csel  wb(1,0) _G4", {"knn_kmode": "csel"}, 4),
        ("csel  wb(1,0) _G16", {"knn_kmode": "csel"}, 16),
        ("csel  wb(2,0) _G16",
         {"knn_kmode": "csel", "window_blocks": (2, 0)}, 16),
    ]
    K, reps = 64, 9
    for name, delta, g in variants:
        pw._G = g
        pw._make_window_stats.cache_clear()
        cfg = dict(PRODUCTION_128K_CONFIG, **delta)
        settings = settings_from_config(cfg)
        params = params_from_config(cfg)
        runner = pipeline_runner(settings)

        @functools.partial(jax.jit, static_argnames=("n_iter",))
        def chain(b0, p, k0, n_iter, runner=runner):
            def body(i, acc):
                b = b0.replace(positions=b0.positions * (1.0 + acc * 1e-30))
                out = runner(b, p, jax.random.fold_in(k0, i))
                return acc + _consume(out) * 1e-30

            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

        t = {}
        c0 = time.perf_counter()
        for n_iter in (1, K):
            np.asarray(chain(buf, params, key, n_iter))  # compile + settle
            samples = []
            for _ in range(reps):
                s0 = time.perf_counter()
                np.asarray(chain(buf, params, key, n_iter))
                samples.append(time.perf_counter() - s0)
            t[n_iter] = float(np.median(samples))
        lat = max((t[K] - t[1]) * 1e3 / (K - 1), 1e-3)
        print(
            f"[csel-profile] {name}: p50 {lat:.3f} ms/scan "
            f"(wall incl compile {time.perf_counter() - c0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
