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

__all__ = [
    "compact", "compact_to", "compaction_order", "shrink_front",
    "subsample_to",
]


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


def shrink_front(buf: ScanBuffer, capacity: int) -> ScanBuffer:
    """Static prefix slice into a smaller capacity bucket — gather-free.

    Only valid when live points already occupy a prefix of the buffer
    (e.g. the output of ``ops.voxel_downsample``, whose segment reduction
    lands survivors at slots 0..n_voxels-1). Unlike ``compact_to`` (an
    argsort + per-row gather, ~1 ms at 131k) a prefix slice costs nothing:
    XLA fuses it into the consumer. Live points beyond ``capacity`` are
    dropped (capped-output semantics, like farthest-point's num_samples).
    """
    if capacity > buf.capacity:
        raise ValueError(
            f"shrink_front grows capacity {buf.capacity} -> {capacity}"
        )
    return ScanBuffer(
        positions=buf.positions[:, :capacity],
        mask=buf.mask[:capacity],
        attributes={k: v[..., :capacity] for k, v in buf.attributes.items()},
    )


def subsample_to(buf: ScanBuffer, capacity: int) -> ScanBuffer:
    """Cap to ``capacity`` keeping an UNBIASED subset of live points.

    ``shrink_front``/``compact_to`` keep a *prefix* in buffer order; after
    voxel downsampling that order is voxel-key order, so an overflowing cap
    would keep one spatially contiguous slab (e.g. only the lowest-z band —
    and a later ground-removal stage then deletes everything). Here each
    live point gets a fixed pseudo-random priority (multiplicative hash of
    its slot index) and the ``capacity`` best-priority live points survive:
    a deterministic uniform subsample, independent of buffer order.

    One variadic ``lax.sort`` carrying every row (~0.3 ms @131k,
    PERF_NOTES.md) — cheaper than ``compact_to``'s per-row gathers. Output
    is compacted (live points first); live-point order is hash order, which
    no downstream stage depends on (the window ops re-sort by curve, RANSAC
    and reductions are order-free).
    """
    if capacity > buf.capacity:
        raise ValueError(
            f"subsample_to grows capacity {buf.capacity} -> {capacity}"
        )
    n = buf.capacity
    idx = jnp.arange(n, dtype=jnp.int32)
    pri = (idx * jnp.int32(-1640531527)) & jnp.int32(0x7FFFFFFF)
    pri = jnp.where(buf.mask, pri, jnp.int32(0x7FFFFFFF))  # invalid last
    flat_attrs = []
    specs = []
    for k, v in buf.attributes.items():
        rows = v.reshape(-1, n)
        specs.append((k, v.shape, rows.shape[0]))
        flat_attrs.extend(rows[i] for i in range(rows.shape[0]))
    # unstable: valid rows' priorities are effectively distinct (hash of
    # the index; rare collisions only shuffle which of two RANDOM-priority
    # rows wins a boundary slot) and the invalid tail is masked anyway —
    # stability would only add the implicit iota tiebreak key's cost.
    out = jax.lax.sort(
        (pri, buf.positions[0], buf.positions[1], buf.positions[2],
         buf.mask, *flat_attrs),
        num_keys=1,
        is_stable=False,
    )
    _, sx, sy, sz, sm, *sattrs = out
    attrs = {}
    i = 0
    for k, shape, nrows in specs:
        rows = [sattrs[i + j][:capacity] for j in range(nrows)]
        i += nrows
        # unconditional reshape: preserves leading singleton dims of
        # (..., N) attributes (a (1, N) attr must come back (1, capacity))
        attrs[k] = jnp.stack(rows).reshape(shape[:-1] + (capacity,))
    return ScanBuffer(
        positions=jnp.stack([sx[:capacity], sy[:capacity], sz[:capacity]]),
        mask=sm[:capacity],
        attributes=attrs,
    )
