"""VERDICT r4 item 3: bisect the headline program's cold-compile blowup.

BENCH_r04 recorded 703.8 s cold compile vs 75.2 s in r03; the suspects are
the round-4 kernel changes — _G=16 grid grouping (16 unrolled sub-blocks x
matmuls x unrolled sweeps multiply Mosaic program size) and kmode='csel'
(extra unrolled own-block sweeps). This times COLD compiles (persistent
cache off, jit caches cleared) of the production pipeline runner for
_G x kmode, plus the bench's actual K=64 chain program for the shipped
knobs.

Usage: python tools/profile_compile_budget.py   (real TPU; budget ~30 min)
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    # NO persistent cache: every compile below must be honest-cold
    sys.path.insert(0, ".")
    from bench import _scene
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    import autodriver_pointcloud_preprocessor_tpu.ops.pallas_window as pw
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

    def compile_runner(g, kmode, chain_k=0):
        pw._G = g
        # _make_window_stats caches per knob tuple; clear everything
        jax.clear_caches()
        cfg = dict(PRODUCTION_128K_CONFIG, knn_kmode=kmode)
        runner = pipeline_runner(settings_from_config(cfg))
        if chain_k:
            @functools.partial(jax.jit, static_argnames=("n_iter",))
            def chain(b0, p, k0, n_iter):
                def body(i, acc):
                    b = b0.replace(
                        positions=b0.positions * (1.0 + acc * 1e-30)
                    )
                    out = runner(b, p, jax.random.fold_in(k0, i))
                    tot = jnp.float32(0.0)
                    for leaf in jax.tree_util.tree_leaves(out):
                        f = leaf.astype(jnp.float32)
                        tot += jnp.sum(jnp.where(jnp.isfinite(f), f, 0.0))
                    return acc + tot * 1e-30

                return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

            t0 = time.perf_counter()
            chain.lower(buf, params, key, n_iter=chain_k).compile()
            return time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.jit(runner).lower(buf, params, key).compile()
        return time.perf_counter() - t0

    g_orig = pw._G
    try:
        for g in (4, 8, 16):
            for kmode in ("sweep", "csel"):
                s = compile_runner(g, kmode)
                print(f"[compile] runner _G={g} kmode={kmode}: {s:.1f} s",
                      flush=True)
        # the bench's actual chain program, shipped knobs
        s = compile_runner(16, "csel", chain_k=64)
        print(f"[compile] K=64 chain _G=16 csel: {s:.1f} s", flush=True)
        s = compile_runner(4, "csel", chain_k=64)
        print(f"[compile] K=64 chain _G=4 csel: {s:.1f} s", flush=True)
    finally:
        pw._G = g_orig


if __name__ == "__main__":
    main()
