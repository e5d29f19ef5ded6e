"""Quality ablation of csel's refinement passes (_CSEL_R) at the shipped
operating point: wb(1,0) p2 fast3 csel, presorted 32k protocol
(tools/quality_presorted_knobs.py). Round-4 isolated cost: R=2 0.365,
R=1 0.341, R=0 0.318 ms/pass at 51200 — this measures what each pass buys
in outlier-classification agreement so the quality budget can price R=1.

Usage: python tools/quality_csel_refine.py   (CPU interpret, minutes)
"""
from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    from scipy.spatial import cKDTree

    from bench import _scene
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import (
        mask_non_finite,
        voxel_downsample,
    )
    import autodriver_pointcloud_preprocessor_tpu.ops.pallas_window as pw
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )

    assert jax.default_backend() == "cpu", jax.default_backend()
    k = 20

    pts = _scene(32_000)
    buf, _ = from_soa({"positions": pts.astype(np.float32)}, capacity=32768)
    buf = mask_non_finite(buf, True, True)
    vox = voxel_downsample(buf, 0.08, backend="xla", curve_order=True,
                           compact_keys=True)
    live = np.asarray(vox.mask)
    vp = np.asarray(vox.positions)[:, live].T
    print(f"voxel survivors {live.sum()} of {len(live)}", flush=True)
    exact = cKDTree(vp).query(vp, k=k)[0].mean(axis=1)
    ce = exact <= exact.mean() + exact.std()

    r_orig = pw._CSEL_R
    try:
        for r in (2, 1, 0):
            pw._CSEL_R = r
            jax.clear_caches()
            out = fused_neighborhood_stats_reordered(
                vox.positions, vox.mask, {}, k=k, radius=0.1,
                backend="pallas_interpret", presorted=True,
                window_blocks=(1, 0), passes=2, d2mode="fast3",
                kmode="csel",
            )
            pos_r, m_r, _a, mean_r = out[0], out[1], out[2], out[3]
            m = np.asarray(m_r)
            P = np.asarray(pos_r).T[m]
            order_r = np.lexsort(P.T)
            order_e = np.lexsort(vp.T)
            mw = np.asarray(mean_r)[m][order_r]
            ex = exact[order_e]
            cw = mw <= mw.mean() + mw.std()
            agree = (cw == ce[order_e]).mean()
            rel = np.median(np.abs(mw - ex) / np.maximum(ex, 1e-9))
            print(f"[csel-R] R={r}: agree {agree:.4f}, "
                  f"median relerr {rel:.2e}", flush=True)
    finally:
        pw._CSEL_R = r_orig


if __name__ == "__main__":
    main()
