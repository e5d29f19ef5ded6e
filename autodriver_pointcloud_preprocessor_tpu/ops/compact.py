"""Mask compaction: gather live points to the front of a buffer.

The reference compacts after every filter (Open3D ``select_by_mask`` /
``select_by_index``, e.g. utils.py:271, pointcloud_preprocessor.py:542);
here compaction is a single explicit op used at egress or between
size-reducing stages to shrink the capacity bucket — everything else is
mask-only (SURVEY.md §7 design stance). The gather is stable: surviving
points keep their relative order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer, valid_count

__all__ = ["compact", "compact_to", "compaction_order"]


def compaction_order(mask: jax.Array) -> jax.Array:
    """Stable permutation putting True rows first (int32[capacity])."""
    return jnp.argsort(jnp.logical_not(mask), stable=True).astype(jnp.int32)


def _gather(buf: ScanBuffer, order: jax.Array, capacity: int) -> ScanBuffer:
    idx = order[:capacity]
    n = valid_count(buf)
    new_mask = jnp.arange(capacity, dtype=jnp.int32) < n
    return ScanBuffer(
        positions=buf.positions[:, idx],
        mask=new_mask,
        attributes={k: v[..., idx] for k, v in buf.attributes.items()},
    )


def compact(buf: ScanBuffer) -> ScanBuffer:
    """Move all live points to the front (same capacity)."""
    return _gather(buf, compaction_order(buf.mask), buf.capacity)


def compact_to(buf: ScanBuffer, capacity: int) -> ScanBuffer:
    """Compact into a smaller (static) capacity bucket.

    Points beyond ``capacity`` survivors are dropped; callers should pick a
    bucket from a host-side count when lossless shrinking is required.
    """
    if capacity > buf.capacity:
        raise ValueError(
            f"compact_to grows capacity {buf.capacity} -> {capacity}; use pad_to_capacity"
        )
    return _gather(buf, compaction_order(buf.mask), capacity)
