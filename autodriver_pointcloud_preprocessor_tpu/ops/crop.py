"""Axis-aligned box crop (passthrough filter).

Replaces the reference's triple-backend ``crop_pointcloud``
(reference: utils.py:240-301) with one masked elementwise kernel over the
planar rows — six scalar compares, no vector broadcasts (PERF_NOTES.md).
Semantics follow the reference's numpy path exactly: bounds are inclusive,
and ``invert=True`` keeps points *outside* the ROI using
``any(p <= min | p >= max)`` (utils.py:267) — note this is not the strict
complement of the keep-inside test; boundary points are kept by both. The
ROI bounds and the invert flag are traced values, so live reconfigure
(reference :935-957) never recompiles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer

__all__ = ["crop_box"]


def crop_box(
    buf: ScanBuffer,
    min_bound: jax.Array,
    max_bound: jax.Array,
    invert: jax.Array | bool = False,
) -> ScanBuffer:
    """Keep points inside [min_bound, max_bound] (or outside when invert)."""
    x, y, z = buf.x, buf.y, buf.z
    lo = jnp.asarray(min_bound, x.dtype)
    hi = jnp.asarray(max_bound, x.dtype)
    inside = (
        (x >= lo[0]) & (x <= hi[0])
        & (y >= lo[1]) & (y <= hi[1])
        & (z >= lo[2]) & (z <= hi[2])
    )
    outside_any = (
        (x <= lo[0]) | (x >= hi[0])
        | (y <= lo[1]) | (y >= hi[1])
        | (z <= lo[2]) | (z >= hi[2])
    )
    keep = jnp.where(jnp.asarray(invert, bool), outside_any, inside)
    return buf.with_mask(keep)
