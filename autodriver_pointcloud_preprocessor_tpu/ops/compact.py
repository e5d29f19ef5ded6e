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
import numpy as np

from ..core.scan import ScanBuffer, valid_count

__all__ = [
    "compact", "compact_to", "compaction_order", "shrink_front",
    "stream_compact_to", "subsample_to",
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


def stream_compact_to(
    buf: ScanBuffer, capacity: int, backend: str = "auto"
) -> ScanBuffer:
    """Compact live points to the front of a smaller capacity bucket —
    gather-free AND sort-free, via the pipelined segmented-sums kernel.

    Insight (round 5): ``segmented_sums_pallas(values, run_start)`` with
    ``run_start[j] = mask[j-1]`` (the mask shifted right by one) makes
    ``cumsum(run_start)[j] == rank(j)`` — the number of live rows before
    ``j`` — so each live row's values land at output column ``rank(j)``,
    and the dead rows grouped into the same run contribute exactly zero
    (their values are zeroed up front). That IS stable stream compaction,
    at the segmean kernel's cost (~0.14 ms at 131k for 8 channels vs ~1 ms
    for the argsort+gather ``compact_to`` and ~0.3 ms for a sort) — the
    primitive this backend otherwise lacks (PERF_NOTES.md: "sorts are the
    ONLY viable bulk data-movement primitive").

    Exactness: every output value is the f32 sum of ONE untouched input
    value and zeros — bit-exact passthrough for floats and for narrow
    ints riding f32; wide (> 16-bit host) integer attributes ride as an
    exact hi/lo 16-bit pair of f32 rows.

    Live rows with rank >= ``capacity`` are DROPPED (capped-output
    semantics like ``shrink_front``); callers size the bucket above the
    worst-case live count. Dead output rows hold zeros, not NaNs.

    Backend 'xla' falls back to ``compact_to`` (identical survivor set
    and order; per-row gathers — fine on CPU, pathological on the TPU
    backend).
    """
    if capacity > buf.capacity:
        raise ValueError(
            f"stream_compact_to grows capacity {buf.capacity} -> {capacity}"
        )
    n = buf.capacity
    if backend == "auto":
        from .window import default_backend

        resolved = default_backend()
        backend = resolved if (
            resolved in ("pallas", "pallas_interpret")
            and n % 512 == 0
            and capacity % 512 == 0
        ) else "xla"
    if backend == "xla" or n % 512 != 0:
        return compact_to(buf, capacity)
    interpret = backend == "pallas_interpret"

    from ..core.scan import ATTR_HOST_DTYPES
    from .pallas_segmean import masked_compact_pallas

    mask = buf.mask
    # rank computation, dead-row zeroing (NaN discipline) and the
    # alignment shift all live inside the kernel (masked_compact_pallas):
    # rows go in RAW — no per-channel XLA prep (measured ~0.1 ms of
    # elementwise at 131k x 8 with the where-based first cut).
    rows = [buf.positions[c] for c in range(3)]
    specs = []  # (name, shape, start, n_rows, kind)
    for name, v in sorted(buf.attributes.items()):
        r2 = v.reshape(-1, n)
        host_wide = (
            jnp.issubdtype(v.dtype, jnp.integer)
            and np.dtype(ATTR_HOST_DTYPES.get(name, np.int64)).itemsize > 2
        )
        kind = "wide" if host_wide else "f32"
        specs.append((name, v.shape, len(rows), r2.shape[0], kind))
        for c in range(r2.shape[0]):
            if host_wide:
                # exact 16/16 split: both halves are f32-exact
                rows.append(jnp.right_shift(r2[c], 16).astype(jnp.float32))
                rows.append(
                    jnp.bitwise_and(r2[c], 0xFFFF).astype(jnp.float32)
                )
            else:
                rows.append(r2[c].astype(jnp.float32))

    count = jnp.sum(mask.astype(jnp.int32))
    new_mask = jnp.arange(capacity, dtype=jnp.int32) < count
    out_rows = []
    for start in range(0, len(rows), 8):
        group = jnp.stack(rows[start : start + 8])
        sums = masked_compact_pallas(group, mask, interpret=interpret)
        # columns beyond the kernel's last committed tile are unwritten
        # HBM — re-zero by rank over the (smaller) output capacity for
        # the documented "dead rows hold zeros" contract
        out_rows.extend(
            jnp.where(new_mask, sums[c, :capacity], 0.0)
            for c in range(group.shape[0])
        )
    attrs = {}
    for name, shape, start, n_rows, kind in specs:
        orig = buf.attributes[name]
        if kind == "wide":
            vals = [
                (
                    out_rows[start + 2 * c].astype(jnp.int32) * 65536
                    + out_rows[start + 2 * c + 1].astype(jnp.int32)
                )
                for c in range(n_rows)
            ]
        else:
            vals = [out_rows[start + c].astype(orig.dtype) for c in range(n_rows)]
        attrs[name] = (
            vals[0] if orig.ndim == 1
            else jnp.stack(vals).reshape(shape[:-1] + (capacity,))
        ).astype(orig.dtype)
    return ScanBuffer(
        positions=jnp.stack(out_rows[:3]),
        mask=new_mask,
        attributes=attrs,
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
