"""Additional downsampling methods: random, uniform, farthest-point.

The reference planned these alongside voxel downsampling (reference:
pointcloud_preprocessor.py:37 "furthest point downsampling, uniform
downsampling, random downsampling"); Open3D's tensor API is the semantic
model. All are mask-only ops over the padded buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer, valid_count

__all__ = [
    "random_downsample",
    "uniform_downsample",
    "farthest_point_downsample",
]


def random_downsample(
    buf: ScanBuffer, sampling_ratio: jax.Array | float, key: jax.Array
) -> ScanBuffer:
    """Keep each live point independently with probability ``sampling_ratio``.

    Open3D ``random_down_sample`` semantics (expected survivor count
    ratio*N; exact count varies). Seeded and reproducible.
    """
    u = jax.random.uniform(key, (buf.capacity,))
    return buf.with_mask(u < jnp.asarray(sampling_ratio, jnp.float32))


def uniform_downsample(buf: ScanBuffer, every_k_points: int) -> ScanBuffer:
    """Keep every k-th live point (by live ordinal, Open3D semantics).

    ``every_k_points`` is traced via modulo — no recompile on change.
    """
    ordinal = jnp.cumsum(buf.mask.astype(jnp.int32)) - 1
    k = jnp.maximum(jnp.asarray(every_k_points, jnp.int32), 1)
    return buf.with_mask(ordinal % k == 0)


def farthest_point_downsample(
    buf: ScanBuffer, num_samples: int, key: jax.Array | None = None
) -> ScanBuffer:
    """Greedy farthest-point sampling of ``num_samples`` live points.

    Exact FPS is inherently sequential; each of the ``num_samples``
    iterations is one fused masked-argmax over [N] (cheap on the VPU), so
    cost is O(num_samples * N) — appropriate for the typical "reduce to a
    few thousand seeds" use. ``num_samples`` is static (loop bound).
    """
    x, y, z = buf.x, buf.y, buf.z
    n = buf.capacity
    live = buf.mask
    count = valid_count(buf)

    # start from the first live point (deterministic; Open3D starts at 0).
    # argmax of a bool mask IS the first-True index — no argsort needed.
    start = jnp.argmax(buf.mask).astype(jnp.int32)

    inf = jnp.float32(jnp.inf)
    init_d = jnp.where(live, inf, -inf)  # dead points never get selected

    def body(i, carry):
        mind, selected, last = carry
        dx = x - x[last]
        dy = y - y[last]
        dz = z - z[last]
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind, jnp.where(live, d, -inf))
        nxt = jnp.argmax(mind)
        selected = selected.at[i].set(last)
        return mind, selected, nxt

    selected0 = jnp.full((num_samples,), start, jnp.int32)
    _, selected, _ = jax.lax.fori_loop(
        0, num_samples, body, (init_d, selected0, start)
    )
    keep = jnp.zeros(n, bool).at[selected].set(True)
    # if fewer live points than samples, keep all live points
    keep = jnp.where(count <= num_samples, live, keep & live)
    return buf.with_mask(keep)
