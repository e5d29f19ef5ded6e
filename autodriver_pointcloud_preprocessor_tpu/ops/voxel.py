"""Voxel-grid downsampling.

Replaces Open3D's hash-map ``voxel_down_sample`` kernel (reference:
pointcloud_preprocessor.py:509-512) with the TPU-native recipe from
SURVEY.md §2b: quantize -> sort by voxel key -> segment-mean, with a
fixed-capacity output. Hash maps are hostile to XLA; a sort + segmented
reduction is the same O(N log N) work expressed as dense, tileable
primitives. One variadic ``lax.sort`` carries positions, validity, index
and all float attributes alongside the three voxel keys — post-sort
gathers cost ~1 ms per row on this backend (PERF_NOTES.md).

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
import numpy as np

from ..core.scan import ScanBuffer

__all__ = ["voxel_downsample"]


def voxel_downsample(
    buf: ScanBuffer,
    voxel_size: jax.Array | float,
    backend: str = "auto",
    dedup_exact: bool = False,
    curve_order: bool = False,
    compact_keys: bool | str = False,
    first_attrs: bool = True,
) -> ScanBuffer:
    """Average live points within each cubic voxel of edge ``voxel_size``.

    ``voxel_size`` is traced (live reconfigure never recompiles); callers
    gate the stage on ``voxel_size > 0`` statically like the reference does.
    ``backend``: 'pallas' uses the segmented-sum kernel
    (ops/pallas_segmean.py, ~5x cheaper than scatter-based segment_sum);
    'xla' is the portable path; 'auto' picks by platform.

    ``dedup_exact=True`` fuses exact duplicate-coordinate removal
    (ops/dedup semantics) into the SAME variadic sort: bit-exact
    coordinate keys ride as secondary sort keys, so exact duplicates land
    adjacent within their voxel segment and all copies after the first
    are excluded from the segment statistics — equivalent to
    ``remove_duplicates`` followed by ``voxel_downsample`` (duplicates
    share a voxel, so excluding the copies from the mean is exactly what
    deduping first would have produced), for the cost of zero extra
    sorts. Used by the pipeline when both stages are enabled
    (models/pipeline.py). Representative-integer-attribute choice under
    fusion: the segment's first row in (voxel, coordinate-bits) order —
    deterministic; the reference's Open3D kernel averages integer attrs,
    which is already documented as not replicated.

    ``curve_order=True`` prepends a Hilbert code of the (center-shifted,
    clipped-to-1024^3) voxel cell as the PRIMARY sort key, so the
    compacted output comes back in space-filling-curve order — exactly
    the order the fused window-kNN stage's pass-0 sort would produce at
    voxel granularity, letting the pipeline skip that whole ~0.33 ms
    131k curve sort (ops/window.py presorted mode). The exact voxel
    indices remain secondary keys, so GROUPING is identical to
    ``curve_order=False`` (same voxels, same member rows — clipping far-
    field voxels beyond 1024 cells from the scan center onto the box
    faces only degrades curve locality there, never correctness); means
    agree to f32 rounding (segment slot offsets shift the reduction's
    partial-sum grouping by ~1 ulp). Output ORDER differs (curve vs
    x-major voxel-key order); the pipeline has no order contract after
    this stage.

    ``compact_keys`` (requires ``curve_order``) drops the exact
    voxel-index secondary keys from the sort — the hilbert key alone
    identifies the voxel (bijective inside its curve box). Dedup stays
    EXACT (the bit-exact coordinate keys remain and double as the
    position payload). Two tiers, chosen STATICALLY by the caller from
    the ROI/voxel-size bound (models/pipeline.settings_from_config);
    out-of-box voxels WOULD be silently mis-merged, so the in-box
    promise is on the caller:

    * ``'box'`` (``True`` is an alias): one 30-bit hilbert key over the
      1024^3 curve box. Caller promises the live points span at most
      1008 voxel cells per axis (the center shift plus floor
      quantization consume up to 16 cells of margin). 4 keys + attrs
      instead of 7 (dedup) / 1 key + positions instead of 4 (no dedup)
      — ~0.1-0.15 ms at 131k.
    * ``'wide'``: a 60-bit hilbert index carried as TWO int32 keys
      (ops/window.hilbert_cell_codes_wide) over a 2^20-cell box —
      10.5 km span at 0.01 m voxels, so effectively any real scene a
      crop ROI can bound (margin: 64 cells). 5 keys + attrs instead of
      7 (dedup) / 2 keys + positions instead of 4 (no dedup); the curve
      box never clips in-promise points, so far-field curve locality is
      BETTER than the non-compact 1024-box order.
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

    # float rows ride the sort (segment MEAN); narrow int attrs (<= 16-bit
    # values, exact in f32) ALSO ride the sort as f32 rows and take the
    # segment's first value via the same flag-masked run-sum trick as
    # first_idx — eliminating the [N] gather (~0.9 ms at 131k,
    # PERF_NOTES.md) that wide ints still need as the fallback.
    from ..core.scan import ATTR_HOST_DTYPES

    float_rows = []
    row_slices = []  # (name, start, num_rows) — segment-MEAN channels
    first_slices = []  # (name, start, num_rows) — first-of-segment channels
    gather_attrs = []  # wide ints: fall back to the first_idx gather
    for name, arr in sorted(buf.attributes.items()):
        rows = arr[None, :] if arr.ndim == 1 else arr.reshape(-1, n)
        # Values are f32-exact when the attribute's HOST dtype is <= 16
        # bits — canonical narrow ints (ring u16, return_type u8) ride
        # the DEVICE as int32 (core/scan.ATTR_DEVICE_DTYPES), so testing
        # the device itemsize alone silently routed them to the [N]
        # gather fallback (~0.9 ms each at 131k, the exact pathology
        # this path exists to avoid — caught round 3 when the bench's
        # ring attr showed up as +0.9 ms of voxel time).
        host_narrow = np.dtype(
            ATTR_HOST_DTYPES.get(name, np.int64)
        ).itemsize <= 2
        if jnp.issubdtype(arr.dtype, jnp.floating):
            row_slices.append((name, len(float_rows), rows.shape[0]))
            float_rows.extend(rows[c] for c in range(rows.shape[0]))
        elif arr.dtype.itemsize <= 2 or host_narrow:
            first_slices.append((name, len(float_rows), rows.shape[0]))
            float_rows.extend(
                rows[c].astype(jnp.float32) for c in range(rows.shape[0])
            )
        else:
            gather_attrs.append(name)

    # index channel only when a wide-int attribute needs the gather
    # fallback; validity is derived from the sort keys post-sort — every
    # dropped channel saves ~0.02-0.03 ms at 131k (PERF_NOTES.md).
    idx_rows = (jnp.arange(n, dtype=jnp.int32),) if gather_attrs else ()
    # A stable sort pays an implicit iota tiebreak key (~0.7 ms at 1M,
    # ~21% of a 5-key sort — measured round 3). Stability only matters
    # when equal-key row ORDER is observable: a first-of-segment int
    # representative rides the sort, or dedup_exact must keep the FIRST
    # duplicate's attributes (reference np.unique return_index keeps the
    # first occurrence, utils.py:532-534). Segment MEANS are
    # order-independent (fp summation order aside), so attr-less and
    # mean-only sorts drop stability for free.
    needs_stable = bool(first_slices) or bool(gather_attrs) or (
        dedup_exact and bool(float_rows)
    )
    # ``first_attrs=False`` (round 5): under dedup_exact the bit-exact
    # coordinate keys make the sort order TOTAL except among exact
    # coordinate duplicates, so dropping stability (~1 implicit key of
    # cost, 0.05 ms at 131k — PERF_NOTES "stable-sort tax") only changes
    # WHICH duplicate copy donates the representative attributes
    # (reference np.unique keeps the first occurrence; 'any copy' is the
    # documented relaxation). Without dedup_exact, ties span whole voxel
    # segments and stability stays load-bearing — the flag is ignored.
    if dedup_exact and not first_attrs:
        needs_stable = False
    if compact_keys and not curve_order:
        raise ValueError("compact_keys requires curve_order")
    if compact_keys is True:
        compact_keys = "box"
    if compact_keys not in (False, "box", "wide"):
        raise ValueError(f"unknown compact_keys tier {compact_keys!r}")
    if curve_order:
        # Hilbert code of the voxel cell, center-shifted into the curve
        # box and clipped at its faces. Same-voxel rows get the same
        # code (grouping preserved by the exact secondary keys — or by
        # in-box bijectivity under compact_keys); invalid rows get the
        # sentinel (sort last). Cell size == voxel size, i.e. one point
        # per cell post-voxel — full curve resolution for the downstream
        # window stage at any scene scale.
        from .window import hilbert_cell_codes, hilbert_cell_codes_wide

        half = 1 << 19 if compact_keys == "wide" else 512
        cells = []
        for v in (vx, vy, vz):
            lo = jnp.min(jnp.where(valid, v, big))
            hi = jnp.max(jnp.where(valid, v, -big))
            center = lo + (hi - lo) // 2
            cells.append(jnp.clip(v - center + half, 0, 2 * half - 1))
        if compact_keys == "wide":
            hkey = hilbert_cell_codes_wide(cells, valid)
        else:
            hkey = (hilbert_cell_codes(cells, valid),)
    else:
        hkey = ()
    if dedup_exact:
        from .dedup import _coordinate_keys

        kx, ky, kz = _coordinate_keys(buf.positions, valid)
        if compact_keys:
            # the hilbert key IS the voxel identity (bijective in-box),
            # so the exact voxel-index keys drop out entirely; the
            # bit-exact coordinate keys remain (duplicates adjacent,
            # EXACT dedup) and double as the position payload via the
            # usual bitcast restore: 4 ('box') / 5 ('wide') keys + attrs
            # vs the exact path's 7 keys + attrs.
            nh = len(hkey)
            sorted_ops = jax.lax.sort(
                (*hkey, kx, ky, kz, *idx_rows, *float_rows),
                num_keys=nh + 3,
                is_stable=needs_stable,
            )
            shk = sorted_ops[:nh]
            skx, sky, skz = sorted_ops[nh], sorted_ops[nh + 1], sorted_ops[nh + 2]
            px = jax.lax.bitcast_convert_type(skx, jnp.float32)
            py = jax.lax.bitcast_convert_type(sky, jnp.float32)
            pz = jax.lax.bitcast_convert_type(skz, jnp.float32)
            rest = sorted_ops[nh + 3:]
        else:
            # the bit-exact key rows ARE the positions (canonicalized
            # -0.0 -> +0.0, value-equal; invalid rows become the NaN
            # sentinel and are zeroed below) — no separate x/y/z payload
            # rows needed: 8 sort rows instead of 11
            sorted_ops = jax.lax.sort(
                (*hkey, vx, vy, vz, kx, ky, kz, *idx_rows, *float_rows),
                num_keys=6 + len(hkey),
                is_stable=needs_stable,
            )
            shk = sorted_ops[:len(hkey)]
            sorted_ops = sorted_ops[len(hkey):]
            sx, sy, sz = sorted_ops[0], sorted_ops[1], sorted_ops[2]
            skx, sky, skz = sorted_ops[3], sorted_ops[4], sorted_ops[5]
            px = jax.lax.bitcast_convert_type(skx, jnp.float32)
            py = jax.lax.bitcast_convert_type(sky, jnp.float32)
            pz = jax.lax.bitcast_convert_type(skz, jnp.float32)
            rest = sorted_ops[6:]
    elif compact_keys:
        # the hilbert key alone is the voxel identity (bijective in-box)
        nh = len(hkey)
        sorted_ops = jax.lax.sort(
            (*hkey, x, y, z, *idx_rows, *float_rows),
            num_keys=nh,
            is_stable=needs_stable,
        )
        shk = sorted_ops[:nh]
        px, py, pz = sorted_ops[nh], sorted_ops[nh + 1], sorted_ops[nh + 2]
        rest = sorted_ops[nh + 3:]
    else:
        sorted_ops = jax.lax.sort(
            (*hkey, vx, vy, vz, x, y, z, *idx_rows, *float_rows),
            num_keys=3 + len(hkey),
            is_stable=needs_stable,
        )
        shk = sorted_ops[:len(hkey)]
        sorted_ops = sorted_ops[len(hkey):]
        sx, sy, sz = sorted_ops[0], sorted_ops[1], sorted_ops[2]
        px, py, pz = sorted_ops[3], sorted_ops[4], sorted_ops[5]
        rest = sorted_ops[6:]
    # validity derived from the sort keys: invalid rows carry the int
    # sentinel (hilbert 0x7FFFFFFF / voxel-index `big`; a valid point
    # only reaches `big` on quantization overflow, where results are
    # already undefined). Live hilbert codes stay below the sentinel
    # (30-bit interleaves), so the FIRST curve key suffices.
    svalid = (shk[0] < jnp.int32(0x7FFFFFFF)) if curve_order else (sx < big)
    if gather_attrs:
        sidx, sorted_attr_rows = rest[0], list(rest[1:])
    else:
        sidx, sorted_attr_rows = None, list(rest)

    new_group = jnp.ones(n, dtype=bool)
    if compact_keys:
        # hilbert key(s) == voxel identity in-box (1 row 'box', 2 'wide')
        same = shk[0][1:] == shk[0][:-1]
        for k in shk[1:]:
            same = same & (k[1:] == k[:-1])
    else:
        same = (sx[1:] == sx[:-1]) & (sy[1:] == sy[:-1]) & (sz[1:] == sz[:-1])
    new_group = new_group.at[1:].set(jnp.logical_not(same))
    new_group = new_group & svalid
    included = svalid
    if dedup_exact:
        # duplicate copies: identical bit-exact coordinates as the previous
        # row (necessarily the same voxel). Exclude them from every segment
        # statistic — equivalent to deduping before voxelizing.
        dup = jnp.zeros(n, dtype=bool)
        dup = dup.at[1:].set(
            (skx[1:] == skx[:-1])
            & (sky[1:] == sky[:-1])
            & (skz[1:] == skz[:-1])
        )
        included = svalid & jnp.logical_not(dup)
    w = included.astype(jnp.float32)

    # NaN discipline (PERF_NOTES.md): masked-out points KEEP their NaN
    # coordinates, and every excluded row contributes to the segment sums
    # only via a `* w` product — where NaN * 0 = NaN would poison the
    # segment it sorted next to (observed: live voxels with NaN means on
    # scans with non-finite returns). Zero excluded float rows up front;
    # exact for included rows, and NaN-in-VALID points still propagate
    # (same garbage-in behavior as the reference's Open3D kernel).
    px = jnp.where(included, px, 0.0)
    py = jnp.where(included, py, 0.0)
    pz = jnp.where(included, pz, 0.0)
    sorted_attr_rows = [
        jnp.where(included, r, 0.0) for r in sorted_attr_rows
    ]

    if backend == "auto":
        from .window import default_backend

        backend = "pallas" if (
            default_backend() == "pallas" and n % 512 == 0
        ) else "xla"

    if backend in ("pallas", "pallas_interpret"):
        return _voxel_reduce_pallas(
            buf, new_group, w, (px, py, pz), sidx, sorted_attr_rows,
            row_slices, first_slices, gather_attrs,
            interpret=(backend == "pallas_interpret"),
        )

    seg_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1  # -1 before first group
    seg_id = jnp.maximum(seg_id, 0)
    counts = jax.ops.segment_sum(w, seg_id, num_segments=n)
    denom = jnp.maximum(counts, 1.0)

    def seg_mean_row(row_sorted):
        s = jax.ops.segment_sum(row_sorted * w, seg_id, num_segments=n)
        return s / denom

    def seg_first_row(row_sorted):
        # exactly one new_group flag per segment -> first value is a sum
        return jax.ops.segment_sum(
            jnp.where(new_group, row_sorted, 0.0), seg_id, num_segments=n
        )

    new_pos = jnp.stack(
        [seg_mean_row(px), seg_mean_row(py), seg_mean_row(pz)]
    )
    new_mask = counts > 0

    attrs = {}
    for name, start, num_rows in row_slices:
        means = [seg_mean_row(sorted_attr_rows[start + c]) for c in range(num_rows)]
        orig = buf.attributes[name]
        if orig.ndim == 1:
            attrs[name] = means[0].astype(orig.dtype)
        else:
            attrs[name] = jnp.stack(means).reshape(
                orig.shape[:-1] + (n,)
            ).astype(orig.dtype)
    for name, start, num_rows in first_slices:
        firsts = [
            seg_first_row(sorted_attr_rows[start + c]) for c in range(num_rows)
        ]
        orig = buf.attributes[name]
        stacked = jnp.round(jnp.stack(firsts))  # f32-exact values
        attrs[name] = (
            stacked[0] if orig.ndim == 1
            else stacked.reshape(orig.shape[:-1] + (n,))
        ).astype(orig.dtype)
    if gather_attrs:
        # the segment-START row's original index, for WIDE integer attrs
        # only (values not exact in f32). With num_keys=3 the start row is
        # also the lowest original index (stable sort); under dedup_exact
        # it is the first row in coordinate-bits order (see docstring).
        first_idx = jax.ops.segment_sum(
            jnp.where(new_group, sidx, 0), seg_id, num_segments=n
        )
        first_idx = jnp.clip(first_idx, 0, n - 1)
        for name in gather_attrs:
            attrs[name] = buf.attributes[name][..., first_idx]

    return ScanBuffer(positions=new_pos, mask=new_mask, attributes=attrs)


def _voxel_reduce_pallas(
    buf, new_group, w, sorted_pos, sidx, sorted_attr_rows, row_slices,
    first_slices, gather_attrs, interpret,
):
    """Segment means via the Pallas run-sum kernel (channels of <= 8)."""
    from .pallas_segmean import segmented_sums_pallas

    px, py, pz = sorted_pos
    n = buf.capacity
    flag_f = new_group.astype(jnp.float32)
    # stable sort => first element of each run has the smallest original
    # index; flag-masking turns "first index" into a plain run sum. Narrow
    # int attrs use the SAME trick on their values directly (first_slices),
    # eliminating the per-attr gather; the index channel is only needed for
    # wide ints that cannot ride f32 exactly.
    first_rows = {start + c for _, start, nr in first_slices for c in range(nr)}

    channels = [w, px * w, py * w, pz * w]
    if gather_attrs:
        channels.append(sidx.astype(jnp.float32) * flag_f)
    idx_ch = len(channels) - 1 if gather_attrs else None
    attr_ch0 = len(channels)
    channels += [
        row * (flag_f if i in first_rows else w)
        for i, row in enumerate(sorted_attr_rows)
    ]

    sums_rows = []
    for start in range(0, len(channels), 8):
        group = jnp.stack(channels[start : start + 8])
        sums = segmented_sums_pallas(group, new_group, interpret=interpret)
        sums_rows.extend(sums[c] for c in range(group.shape[0]))

    counts = sums_rows[0]
    denom = jnp.maximum(counts, 1.0)
    new_pos = jnp.stack(
        [sums_rows[1] / denom, sums_rows[2] / denom, sums_rows[3] / denom]
    )
    new_mask = counts > 0

    attrs = {}
    for name, start, num_rows in row_slices:
        means = [
            sums_rows[attr_ch0 + start + c] / denom for c in range(num_rows)
        ]
        orig = buf.attributes[name]
        if orig.ndim == 1:
            attrs[name] = means[0].astype(orig.dtype)
        else:
            attrs[name] = jnp.stack(means).reshape(
                orig.shape[:-1] + (n,)
            ).astype(orig.dtype)
    for name, start, num_rows in first_slices:
        firsts = [sums_rows[attr_ch0 + start + c] for c in range(num_rows)]
        orig = buf.attributes[name]
        stacked = jnp.round(jnp.stack(firsts))  # f32-exact values
        attrs[name] = (
            stacked[0] if orig.ndim == 1
            else stacked.reshape(orig.shape[:-1] + (n,))
        ).astype(orig.dtype)
    if gather_attrs:
        first_idx = jnp.clip(
            (sums_rows[idx_ch] + 0.5).astype(jnp.int32), 0, n - 1
        )
        for name in gather_attrs:
            attrs[name] = buf.attributes[name][..., first_idx]

    return ScanBuffer(positions=new_pos, mask=new_mask, attributes=attrs)
