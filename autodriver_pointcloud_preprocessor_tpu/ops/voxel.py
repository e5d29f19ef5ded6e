"""Voxel-grid downsampling.

Replaces Open3D's hash-map ``voxel_down_sample`` kernel (reference:
pointcloud_preprocessor.py:509-512) with the TPU-native recipe from
SURVEY.md §2b: quantize -> sort by voxel key -> segment-mean, with a
fixed-capacity output. Hash maps are hostile to XLA; a sort + segmented
reduction is the same O(N log N) work expressed as dense, tileable
primitives (lexsort 0.2 ms / segment_sum 1.1 ms per channel @131k,
PERF_NOTES.md).

Semantics: one output point per occupied voxel at the *mean* of its live
points; float attributes are averaged, integer attributes (ring,
return_type) take the first (lowest buffer index) point's value — Open3D
averages those too, but averaging laser-ring IDs is meaningless; set parity
is defined on positions (SURVEY.md §7 hard part 2).

Output order is by voxel key (x-major lexicographic), with all survivors
compacted to the front of the same-capacity buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer

__all__ = ["voxel_downsample"]


def voxel_downsample(buf: ScanBuffer, voxel_size: jax.Array | float) -> ScanBuffer:
    """Average live points within each cubic voxel of edge ``voxel_size``.

    ``voxel_size`` is traced (live reconfigure never recompiles); callers
    gate the stage on ``voxel_size > 0`` statically like the reference does.
    """
    n = buf.capacity
    valid = buf.mask
    x, y, z = buf.x, buf.y, buf.z
    inv = 1.0 / jnp.asarray(voxel_size, x.dtype)

    # Quantize. floor() matches Open3D's voxel index convention.
    big = jnp.int32(2**30)
    vx = jnp.where(valid, jnp.floor(x * inv).astype(jnp.int32), big)
    vy = jnp.where(valid, jnp.floor(y * inv).astype(jnp.int32), big)
    vz = jnp.where(valid, jnp.floor(z * inv).astype(jnp.int32), big)

    # Stable sort by (vx, vy, vz): invalid rows sort last.
    order = jnp.lexsort((vz, vy, vx))
    sx, sy, sz = vx[order], vy[order], vz[order]
    svalid = valid[order]

    new_group = jnp.ones(n, dtype=bool)
    same = (sx[1:] == sx[:-1]) & (sy[1:] == sy[:-1]) & (sz[1:] == sz[:-1])
    new_group = new_group.at[1:].set(jnp.logical_not(same))
    new_group = new_group & svalid
    seg_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1  # -1 before first group
    seg_id = jnp.maximum(seg_id, 0)

    w = svalid.astype(jnp.float32)
    counts = jax.ops.segment_sum(w, seg_id, num_segments=n)
    denom = jnp.maximum(counts, 1.0)

    def seg_mean_row(row_sorted):
        s = jax.ops.segment_sum(row_sorted * w, seg_id, num_segments=n)
        return s / denom

    def seg_mean(arr):
        """[capacity] or [C, capacity] (already gathered by ``order``)."""
        if arr.ndim == 1:
            return seg_mean_row(arr)
        return jnp.stack([seg_mean_row(arr[c]) for c in range(arr.shape[0])])

    new_pos = seg_mean(buf.positions[:, order].astype(jnp.float32))
    new_mask = counts > 0

    # first (lowest original index) row of each segment, for integer attrs
    first_idx = jax.ops.segment_min(
        jnp.where(svalid, order, jnp.int32(n - 1)), seg_id, num_segments=n
    )
    first_idx = jnp.clip(first_idx, 0, n - 1)

    attrs = {}
    for name, arr in buf.attributes.items():
        if jnp.issubdtype(arr.dtype, jnp.floating):
            attrs[name] = seg_mean(arr[..., order]).astype(arr.dtype)
        else:
            attrs[name] = arr[..., first_idx]

    return ScanBuffer(positions=new_pos, mask=new_mask, attributes=attrs)
