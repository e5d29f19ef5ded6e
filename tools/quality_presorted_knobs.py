"""Window-config quality at the PRODUCTION presorted operating point.

The bench pipeline runs the fused neighborhood on the curve-ordered
voxel survivors (presorted mode). tools/quality_knobs.py measures raw
scenes; this measures the presorted path itself: bench scene -> voxel
0.08 -> fused_neighborhood_stats_reordered(presorted) vs an exact
KD-tree oracle over the voxel survivors, for the candidate cheap
configs (wb0 alternating-direction passes, fast3).

CPU interpret mode (backend-independent algorithmic quality); a 32k
scene keeps interpret runtime in minutes.

Usage: python tools/quality_presorted_knobs.py
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
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )

    assert jax.default_backend() == "cpu", jax.default_backend()
    k = 20

    pts = _scene(32_000)
    buf, _ = from_soa({"positions": pts.astype(np.float32)}, capacity=32768)
    buf = mask_non_finite(buf, True, True)
    # bench voxel size scaled so survivors/capacity matches the 128k
    # config's ~36% (0.08 at 128k -> ~46.5k of 131k)
    vox = voxel_downsample(buf, 0.08, backend="xla", curve_order=True,
                           compact_keys=True)
    live = np.asarray(vox.mask)
    vp = np.asarray(vox.positions)[:, live].T
    print(f"voxel survivors {live.sum()} of {len(live)}", flush=True)
    exact = cKDTree(vp).query(vp, k=k)[0].mean(axis=1)
    ce = exact <= exact.mean() + exact.std()

    configs = [
        ("wb1 p2 sweep highest (prod)", dict(window_blocks=1, passes=2)),
        ("wb0 p2 sweep highest", dict(window_blocks=0, passes=2)),
        ("wb0 p3 sweep highest", dict(window_blocks=0, passes=3)),
        ("wb0 p3 sweep fast3", dict(window_blocks=0, passes=3,
                                    d2mode="fast3")),
        ("wb0 p4 sweep highest", dict(window_blocks=0, passes=4)),
        ("wb1 p2 sweep fast3", dict(window_blocks=1, passes=2,
                                    d2mode="fast3")),
        # mixed profile: symmetric wb1 on the free presorted pass,
        # one-sided wb0 on the re-sorted pass (kernels 0.427 + 0.21 vs
        # 0.427 x2 at 51k)
        ("wb(1,0) p2 sweep fast3", dict(window_blocks=(1, 0), passes=2,
                                        d2mode="fast3")),
        ("wb(1,0,0) p3 sweep fast3", dict(window_blocks=(1, 0, 0),
                                          passes=3, d2mode="fast3")),
        # round-4 candidates: SINGLE presorted pass with a wider window
        # (no re-sort, no merge, no second kernel) and/or the own-block
        # threshold k-select (kmode='csel')
        ("wb2 p1 sweep fast3", dict(window_blocks=2, passes=1,
                                    d2mode="fast3")),
        ("wb3 p1 sweep fast3", dict(window_blocks=3, passes=1,
                                    d2mode="fast3")),
        ("wb(2,0) p2 sweep fast3", dict(window_blocks=(2, 0), passes=2,
                                        d2mode="fast3")),
        # own-block threshold select at the shipped operating point
        ("wb(1,0) p2 csel fast3", dict(window_blocks=(1, 0), passes=2,
                                       d2mode="fast3", kmode="csel")),
        ("wb(2,0) p2 csel fast3", dict(window_blocks=(2, 0), passes=2,
                                       d2mode="fast3", kmode="csel")),
        ("wb1 p2 csel fast3", dict(window_blocks=1, passes=2,
                                   d2mode="fast3", kmode="csel")),
    ]
    for name, kw in configs:
        out = fused_neighborhood_stats_reordered(
            vox.positions, vox.mask, {}, k=k, radius=0.1,
            backend="pallas_interpret", presorted=True, **kw,
        )
        pos_r, m_r, _a, mean_r = out[0], out[1], out[2], out[3]
        m = np.asarray(m_r)
        P = np.asarray(pos_r).T[m]
        # survivors come back curve-reordered: match to the oracle order
        order_r = np.lexsort(P.T)
        order_e = np.lexsort(vp.T)
        mw = np.asarray(mean_r)[m][order_r]
        ex = exact[order_e]
        cw = mw <= mw.mean() + mw.std()
        cx = ce[order_e]
        agree = (cw == cx).mean()
        rel = np.median(np.abs(mw - ex) / np.maximum(ex, 1e-9))
        print(f"[presorted32k] {name}: agree {agree:.4f}, "
              f"median relerr {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
