"""Statistical outlier removal.

Replaces Open3D's ``remove_statistical_outliers`` kernel (reference:
pointcloud_preprocessor.py:514-519): per point, the mean distance to its
``nb_neighbors`` nearest neighbors (self included, Open3D KNN semantics);
points whose mean distance exceeds ``global_mean + std_ratio * global_std``
are masked out. Two-pass masked mean/std reduction per SURVEY.md §2b.

``method``: 'exact' uses brute-force kNN (oracle; O(N^2) top_k, slow at
large N), 'window' uses Morton-window approximate neighborhoods
(PERF_NOTES.md), 'auto' picks by capacity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer
from .knn import knn_exact
from .window import window_mean_knn_dist

__all__ = ["remove_statistical_outliers"]

#: capacities at or below this use the exact path under method='auto'
_AUTO_EXACT_MAX = 8192


def remove_statistical_outliers(
    buf: ScanBuffer,
    nb_neighbors: int = 20,
    std_ratio: jax.Array | float = 2.0,
    method: str = "auto",
    window_backend: str = "auto",
    window_blocks: int | tuple = 2,
    passes: int = 2,
    kmode: str = "sweep",
) -> ScanBuffer:
    """Mask out points with anomalously large mean kNN distance.

    ``nb_neighbors`` is static (it shapes the top-k); ``std_ratio`` is
    traced so live reconfigure (reference :962-965) never recompiles.
    """
    if method == "auto":
        method = "exact" if buf.capacity <= _AUTO_EXACT_MAX else "window"

    if method == "exact":
        sq_dists, _ = knn_exact(buf.positions, buf.mask, k=nb_neighbors)
        d = jnp.sqrt(sq_dists)
        # Neighbors that don't exist (cloud smaller than k) come back +inf;
        # treat them as absent rather than poisoning the mean.
        finite = jnp.isfinite(d)
        d = jnp.where(finite, d, 0.0)
        neigh_count = jnp.maximum(jnp.sum(finite, axis=-1), 1)
        mean_d = jnp.sum(d, axis=-1) / neigh_count
    elif method == "window":
        mean_d = window_mean_knn_dist(
            buf.positions, buf.mask, k=nb_neighbors, backend=window_backend,
            window_blocks=window_blocks, passes=passes, kmode=kmode,
        )
    else:
        raise ValueError(f"unknown kNN method {method!r}")

    valid = buf.mask
    n_live = jnp.maximum(jnp.sum(valid), 1)
    mu = jnp.sum(jnp.where(valid, mean_d, 0.0)) / n_live
    var = jnp.sum(jnp.where(valid, (mean_d - mu) ** 2, 0.0)) / n_live
    std = jnp.sqrt(var)

    keep = mean_d <= mu + jnp.asarray(std_ratio, mean_d.dtype) * std
    return buf.with_mask(keep)
