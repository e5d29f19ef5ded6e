"""Outlier-classification quality of window-kernel knobs vs exact kNN.

Runs the PALLAS kernel in interpret mode on CPU (algorithmic quality of
kmode/d2mode/window_blocks/passes is backend-independent; bf16 effects of
d2mode='fast3' are reproduced faithfully — XLA CPU implements bf16
arithmetic exactly). Scenes: the 8k sparse bench scene (the HARD case for
curve windows) and the ring-structured VLP-16 fixture.

Usage: JAX_PLATFORMS=cpu python tools/quality_knobs.py
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

    configs = [
        ("sweep highest p2 wb1 (prod)", dict(kmode="sweep"), {}),
        ("bisect highest p2 wb1", dict(kmode="bisect"), {}),
        ("sweep fast3 p2 wb1", dict(kmode="sweep", d2mode="fast3"), {}),
        ("bisect fast3 p2 wb1", dict(kmode="bisect", d2mode="fast3"), {}),
        # wb0 = one-sided 256-candidate windows, directions alternating
        # across passes (kernel cost 0.242 vs 0.483 ms at 51k, round 3)
        ("sweep highest p2 wb0", dict(kmode="sweep", window_blocks=0), {}),
        ("sweep fast3 p2 wb0",
         dict(kmode="sweep", d2mode="fast3", window_blocks=0), {}),
        ("sweep highest p3 wb0",
         dict(kmode="sweep", window_blocks=0, passes=3), {}),
        ("sweep highest p4 wb0",
         dict(kmode="sweep", window_blocks=0, passes=4), {}),
    ]

    for sname, p, cap in scenes:
        buf, _ = from_soa({"positions": p.astype(np.float32)}, capacity=cap)
        buf = mask_non_finite(buf, True, True)
        pos, mask = buf.positions, buf.mask
        v = np.asarray(mask)
        live = p[: v.sum()]
        exact = cKDTree(live).query(live, k=k)[0].mean(axis=1)
        ce = exact <= exact.mean() + exact.std()

        for cname, kw, _ in configs:
            kw = dict({"window_blocks": 1, "passes": 2}, **kw)
            mean, _, _ = fused_neighborhood_stats(
                pos, mask, k=k, radius=0.1,
                backend="pallas_interpret", **kw,
            )
            mw = np.asarray(mean)[v]
            cw = mw <= mw.mean() + mw.std()
            agree = (ce == cw).mean()
            relerr = np.median(np.abs(mw - exact) / np.maximum(exact, 1e-9))
            print(f"[{sname}] {cname}: agree {agree:.4f}, "
                  f"median relerr {relerr:.2e}", flush=True)


if __name__ == "__main__":
    main()
