"""k-nearest-neighbor search over padded planar point buffers.

The reference delegates kNN to Open3D's C++/CUDA KD-tree kernels (statistical
outlier removal at pointcloud_preprocessor.py:514-519, hybrid normal search
at :521-530). KD-trees are pointer-chasing machines — the wrong shape for a
TPU. Two dense formulations replace them (SURVEY.md §7 hard part 1):

* ``knn_exact`` (this module): tiled brute force over the full database.
  Exact; O(N^2). Measured cost is dominated by the per-tile ``top_k``
  (~6 ms per 512-query tile at N=131k -> ~1.5 s full scan, PERF_NOTES.md),
  so this is the *oracle/correctness* path and the production path for
  small N.
* Morton-window neighborhoods (ops/window.py): sort by Morton code, take a
  contiguous window of sorted neighbors via cheap rolls — the production
  path for large N.

Self-matches are included (distance 0), matching Open3D's KNN semantics.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["knn_exact"]


@functools.partial(jax.jit, static_argnames=("k", "query_tile"))
def knn_exact(
    positions: jax.Array,
    mask: jax.Array,
    k: int,
    query_tile: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN among live points (self included).

    Args:
        positions: float32[3, N] planar padded points.
        mask: bool[N]; False rows are excluded as both query and neighbor.
        k: neighbor count (static).
        query_tile: query rows per pass (static; bounds the transient
            (query_tile, N) distance tile).
    Returns:
        (sq_dists float32[N, k] ascending, indices int32[N, k]).
        Rows of masked-out queries contain +inf / arbitrary indices. When
        fewer than k live neighbors exist, trailing entries are +inf.
    """
    n = positions.shape[-1]
    if n % query_tile != 0:
        # capacities are power-of-two bucketed, so this only trips on
        # hand-made buffers; fall back to one tile.
        query_tile = n
    k = min(k, n)

    x = positions[0].astype(jnp.float32)
    y = positions[1].astype(jnp.float32)
    z = positions[2].astype(jnp.float32)
    sq_norm = x * x + y * y + z * z
    dead = jnp.where(mask, 0.0, jnp.inf)  # additive neighbor exclusion

    num_tiles = n // query_tile

    def tile_fn(i):
        s = i * query_tile
        qx = jax.lax.dynamic_slice_in_dim(x, s, query_tile)
        qy = jax.lax.dynamic_slice_in_dim(y, s, query_tile)
        qz = jax.lax.dynamic_slice_in_dim(z, s, query_tile)
        qn = jax.lax.dynamic_slice_in_dim(sq_norm, s, query_tile)
        # squared distances via (Q,1)x(1,N) lane broadcasts (PERF_NOTES.md)
        cross = (
            qx[:, None] * x[None, :]
            + qy[:, None] * y[None, :]
            + qz[:, None] * z[None, :]
        )
        d = qn[:, None] + sq_norm[None, :] - 2.0 * cross
        d = jnp.maximum(d, 0.0) + dead[None, :]
        neg_top, idx = jax.lax.top_k(-d, k)
        return -neg_top, idx.astype(jnp.int32)

    dists, idx = jax.lax.map(tile_fn, jnp.arange(num_tiles))
    return dists.reshape(n, k), idx.reshape(n, k)
