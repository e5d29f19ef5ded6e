"""Radius outlier removal.

The reference lists radius outlier removal among its planned filters
(reference: pointcloud_preprocessor.py:37 "add other preprocessing steps
such as ... radius outlier removal") and BASELINE.json config 2 benches
"statistical & radius outlier removal"; Open3D's ``remove_radius_outliers``
is the model: drop points with fewer than ``nb_points`` neighbors within
``search_radius``.

TPU-native: the in-radius neighbor count is exactly the window kernel's
moment row 0 (ops/pallas_window.py) / the window stats count — no extra
machinery. Exact path uses brute-force kNN distances.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer
from .knn import knn_exact
from .window import window_normal_stats

__all__ = ["remove_radius_outliers"]

_AUTO_EXACT_MAX = 8192


def remove_radius_outliers(
    buf: ScanBuffer,
    nb_points: jax.Array | int = 16,
    search_radius: jax.Array | float = 0.05,
    method: str = "auto",
    exact_k: int = 64,
    window_backend: str = "auto",
    window_blocks: int | tuple = 2,
    passes: int = 2,
) -> ScanBuffer:
    """Mask out points with fewer than ``nb_points`` in-radius neighbors.

    Self counts as a neighbor (Open3D semantics). ``nb_points`` and
    ``search_radius`` are traced — reconfigure never recompiles. The exact
    path counts among the ``exact_k`` nearest (static), so the test is
    exact whenever ``nb_points <= exact_k``.
    """
    if method == "auto":
        method = "exact" if buf.capacity <= _AUTO_EXACT_MAX else "window"

    r2 = jnp.asarray(search_radius, jnp.float32) ** 2
    if method == "exact":
        k = min(exact_k, buf.capacity)
        sq, _ = knn_exact(buf.positions, buf.mask, k=k)
        count = jnp.sum((sq <= r2) & jnp.isfinite(sq), axis=-1)
    elif method == "window":
        _entries, count = window_normal_stats(
            buf.positions, buf.mask, search_radius, backend=window_backend,
            window_blocks=window_blocks, passes=passes,
        )
    else:
        raise ValueError(f"unknown kNN method {method!r}")

    keep = count >= jnp.asarray(nb_points, count.dtype)
    return buf.with_mask(keep)
