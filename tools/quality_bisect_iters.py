"""Bisect-mode quality vs iteration count (CPU interpret mode).

kmode='bisect' at _BISECT=9 measured 92.7% (bench8k) / 85.8% (ring15k)
agreement — below the floors. Each extra iteration halves the threshold
band at ~2 VPU passes; this sweeps iteration counts to find where (if
anywhere) bisect becomes floor-safe.

Usage: JAX_PLATFORMS=cpu python tools/quality_bisect_iters.py
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    from scipy.spatial import cKDTree

    from bench import _scene
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import mask_non_finite
    from autodriver_pointcloud_preprocessor_tpu.ops import pallas_window as pw
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats,
    )

    assert jax.default_backend() == "cpu", jax.default_backend()
    k = 20

    scenes = []
    pts = _scene(8000)
    scenes.append(("bench8k", pts[np.isfinite(pts).all(1)], 8192))
    ring = np.load(
        os.path.join("tests", "fixtures", "ring_scene.npz")
    )["positions"]
    scenes.append(("ring15k", ring, 16384))

    prepared = []
    for sname, p, cap in scenes:
        buf, _ = from_soa({"positions": p.astype(np.float32)}, capacity=cap)
        buf = mask_non_finite(buf, True, True)
        v = np.asarray(buf.mask)
        live = p[: v.sum()]
        exact = cKDTree(live).query(live, k=k)[0].mean(axis=1)
        ce = exact <= exact.mean() + exact.std()
        prepared.append((sname, buf, v, exact, ce))

    for iters in (11, 13, 15):
        pw._BISECT = iters
        pw._make_window_stats.cache_clear()
        for sname, buf, v, exact, ce in prepared:
            mean, _, _ = fused_neighborhood_stats(
                buf.positions, buf.mask, k=k, radius=0.1, window_blocks=1,
                passes=2, backend="pallas_interpret", kmode="bisect",
            )
            # fused_neighborhood_stats is jit-cached on static args only —
            # but kmode is static and the pallas fn is rebuilt after
            # cache_clear, so clear jit cache too to be safe
            mw = np.asarray(mean)[v]
            cw = mw <= mw.mean() + mw.std()
            agree = (ce == cw).mean()
            relerr = np.median(np.abs(mw - exact) / np.maximum(exact, 1e-9))
            print(f"[{sname}] bisect iters={iters}: agree {agree:.4f}, "
                  f"median relerr {relerr:.2e}", flush=True)
        fused_neighborhood_stats.clear_cache()


if __name__ == "__main__":
    main()
