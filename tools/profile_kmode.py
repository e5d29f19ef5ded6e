"""Isolated window-kernel cost by kmode on real TPU (chained harness).

Measures window_stats_pallas alone at the production operating point
(51200 curve-sorted rows, k=20) for sweep / bisect / csel and csel
refinement-count variants, to localize where the k-select time actually
goes (round 4: the csel pipeline number came out SLOWER than sweep
despite ~2.5x fewer full-window VPU pass-equivalents — per-op overhead
vs element-throughput question).

Run: python tools/profile_kmode.py   (one TPU process at a time!)
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

    from autodriver_pointcloud_preprocessor_tpu.ops import pallas_window as pw

    assert jax.default_backend() == "tpu", jax.default_backend()
    n = 51200
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 10, (3, n)).astype(np.float32)
    order = np.lexsort((pts[2], pts[1], pts[0]))
    sx = jnp.asarray(pts[0, order])
    sy = jnp.asarray(pts[1, order])
    sz = jnp.asarray(pts[2, order])
    sv = jnp.ones(n, bool)

    K, reps = 64, 7

    def timed(fn, label):
        @functools.partial(jax.jit, static_argnames=("n_iter",))
        def chain(x, n_iter):
            def body(i, acc):
                mean, cnt, mom = fn(x * (1.0 + acc * 1e-30))
                return (
                    acc
                    + jnp.sum(mean) * 1e-30
                    + jnp.sum(cnt) * 1e-30
                    + jnp.sum(mom) * 1e-30
                )

            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

        t = {}
        for n_iter in (1, K):
            np.asarray(chain(sx, n_iter))
            s = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(chain(sx, n_iter))
                s.append(time.perf_counter() - t0)
            t[n_iter] = float(np.median(s))
        ms = max((t[K] - t[1]) * 1e3 / (K - 1), 1e-3)
        print(f"[kmode] {label}: {ms:.3f} ms/pass", flush=True)
        return ms

    variants = [
        ("wb1 sweep fast3", dict(window_blocks=1, kmode="sweep")),
        ("wb1 bisect fast3", dict(window_blocks=1, kmode="bisect")),
        ("wb1 csel fast3", dict(window_blocks=1, kmode="csel")),
        ("wb0 sweep fast3", dict(window_blocks=0, kmode="sweep")),
        ("wb0 csel fast3", dict(window_blocks=0, kmode="csel")),
        ("wb2 csel fast3", dict(window_blocks=2, kmode="csel")),
    ]
    for label, kw in variants:
        def call(x, kw=kw):
            return pw.window_stats_pallas(
                x, sy, sz, sv, 0.1, k=20, d2mode="fast3", **kw
            )

        timed(call, label)

    # csel refinement-count ablation via the module constant
    for r in (0, 1, 4):
        pw._CSEL_R, saved = r, pw._CSEL_R
        pw._make_window_stats.cache_clear()

        def call(x):
            return pw.window_stats_pallas(
                x, sy, sz, sv, 0.1, k=20, d2mode="fast3",
                window_blocks=1, kmode="csel",
            )

        timed(call, f"wb1 csel R={r}")
        pw._CSEL_R = saved
        pw._make_window_stats.cache_clear()

    # floor probes: k=1 sweep approximates the select-free pass cost
    # (DMA + d2 + moments + output); _G widens the per-step group, so a
    # per-STEP overhead shows as a drop while per-sub-block cost does not.
    def call_k1(x):
        return pw.window_stats_pallas(
            x, sy, sz, sv, 0.1, k=1, d2mode="fast3",
            window_blocks=1, kmode="sweep",
        )

    timed(call_k1, "wb1 sweep k=1 (floor probe)")
    for g in (8, 16):
        pw._G, saved_g = g, pw._G
        pw._make_window_stats.cache_clear()

        def call_g(x):
            return pw.window_stats_pallas(
                x, sy, sz, sv, 0.1, k=20, d2mode="fast3",
                window_blocks=1, kmode="csel",
            )

        timed(call_g, f"wb1 csel _G={g}")

        def call_gs(x):
            return pw.window_stats_pallas(
                x, sy, sz, sv, 0.1, k=20, d2mode="fast3",
                window_blocks=1, kmode="sweep",
            )

        timed(call_gs, f"wb1 sweep _G={g}")
        pw._G = saved_g
        pw._make_window_stats.cache_clear()


if __name__ == "__main__":
    main()
