"""Space-filling-curve window neighborhoods: the large-N path for kNN ops.

Brute-force kNN costs ~1.5 s at 131k points on this backend (top_k over the
full database per query tile) and grid-bucket gathers are just as dead
(29 ms per (131k, 32) random gather) — see PERF_NOTES.md. This module uses
the TPU-shaped alternative:

1. sort points along a 3-D Hilbert curve (one ~0.2 ms sort; the curve
   encode is ~100 elementwise int ops, effectively free),
2. reshape the sorted stream into (num_blocks, B) tiles with B in the lane
   dimension,
3. take each block's candidate set as its own + R rolled neighbor blocks —
   pure block shifts, no gathers,
4. run masked distance reductions / small top_k over the (2R+1)*B-wide
   candidate window.

Hilbert order (vs Morton/Z-order) has no discontinuity jumps: curve-adjacent
points are always spatially adjacent, so a window of W sorted points is a
compact spatial neighborhood. Still *approximate*: a window can miss true
neighbors. Two properties make this safe:

* window distance estimates only ever OVERESTIMATE (missed neighbors can
  only push the k-th distance up), so a min-merge across ``passes`` runs
  with jittered quantization origins is monotonically closer to exact;
* consumers (outlier stats, normal PCA) are statistical, not exact — and
  ops accept ``method='exact'`` (ops/knn.py) when exactness matters
  (SURVEY.md §7 hard part 1).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "default_backend",
    "fused_neighborhood_stats",
    "fused_neighborhood_stats_reordered",
    "hilbert_codes",
    "hilbert_cell_codes",
    "hilbert_cell_codes_wide",
    "morton_codes",
    "window_mean_knn_dist",
    "window_normal_stats",
]

_BITS = 10  # per-axis quantization bits (30-bit curve index)


def _spread_bits_10(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of int32 v so consecutive bits are 3 apart."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _quantize_axes(positions, mask, origin_shift: float, bounds=None):
    """Per-axis 10-bit quantization over the live bounding box.

    ``origin_shift`` (in cells) jitters the grid between passes so curve
    boundaries land differently. The shift COMPRESSES the range into
    [shift, 1023] instead of clipping — clipping would collapse the top
    ``shift`` cells of every axis into one mega-cell (terrible windows for
    any scene hugging the bbox max faces). Large shifts matter: the
    Hilbert hierarchy's damaging discontinuities are the HIGH-level
    superblock boundaries, and only a shift comparable to the superblock
    size moves them (measured: pass-1 shift 128 lifts 2-pass agreement vs
    exact kNN from 87.4% to 97.7% on the sparse bench scene; a half-cell
    shift does nothing).

    ``bounds``: optional ``(lo[3], hi[3])`` quantization box aligned with
    the rows of ``positions`` (callers that permute axes must permute the
    bounds identically). Sharded callers pass the pmin/pmax GLOBAL live
    bbox so every shard quantizes into the same grid — with local (per-
    shard) boxes, each slab's curve hierarchy has different superblock
    boundaries than the global curve, degrading window quality for
    interior points too (PERF_NOTES.md "sharded window path", error
    source b).
    """
    big = jnp.float32(3.4e38)
    out = []
    for c in range(3):
        v = positions[c]
        if bounds is None:
            lo = jnp.min(jnp.where(mask, v, big))
            hi = jnp.max(jnp.where(mask, v, -big))
        else:
            lo, hi = bounds[0][c], bounds[1][c]
        scale = (1023.0 - origin_shift) / jnp.maximum(hi - lo, 1e-12)
        q = jnp.clip((v - lo) * scale + origin_shift, 0.0, 1023.0).astype(jnp.int32)
        out.append(q)
    return out


def morton_codes(
    positions: jax.Array, mask: jax.Array, origin_shift: float = 0.0,
    bounds=None,
) -> jax.Array:
    """30-bit Morton (Z-order) code per point, invalid rows pushed last."""
    qx, qy, qz = _quantize_axes(positions, mask, origin_shift, bounds)
    code = (
        _spread_bits_10(qx)
        | (_spread_bits_10(qy) << 1)
        | (_spread_bits_10(qz) << 2)
    )
    return jnp.where(mask, code, jnp.int32(0x7FFFFFFF))


def _hilbert_transpose(cells, bits: int):
    """Skilling: integer coordinates -> transposed Hilbert index.

    ``cells``: three int32 [N] rows in [0, 2**bits). Fully unrolled and
    branch-free over [N] int32 rows (data-dependent branches become
    ``where`` selects). The returned transposed rows interleave to the
    Hilbert index with X[0] carrying each level's most significant bit.
    """
    X = list(cells)

    # --- Skilling: coordinates -> transposed Hilbert index ---
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:
        P = jnp.int32(Q - 1)
        for i in range(3):
            hit = (X[i] & Q) != 0
            # if bit set: invert low bits of X[0]; else swap low bits X[0]<->X[i]
            t = (X[0] ^ X[i]) & P
            x0_inv = X[0] ^ P
            x0_swp = X[0] ^ t
            xi_swp = X[i] ^ t
            X[0] = jnp.where(hit, x0_inv, x0_swp)
            if i != 0:
                X[i] = jnp.where(hit, X[i], xi_swp)
        Q >>= 1

    # Gray encode
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    Q = M
    while Q > 1:
        cond = (X[2] & Q) != 0
        t = jnp.where(cond, t ^ jnp.int32(Q - 1), t)
        Q >>= 1
    return [x ^ t for x in X]


def hilbert_cell_codes(cells, mask: jax.Array) -> jax.Array:
    """30-bit Hilbert index from integer cells, invalid rows pushed last.

    ``cells``: three int32 [N] rows in [0, 1023] (callers quantize —
    from float positions via ``_quantize_axes``, or from voxel indices
    for the curve-ordered voxel sort, ops/voxel.py).
    """
    X = _hilbert_transpose(cells, _BITS)
    # interleave transposed bits: X[0] carries the most significant bit
    code = (
        (_spread_bits_10(X[0]) << 2)
        | (_spread_bits_10(X[1]) << 1)
        | _spread_bits_10(X[2])
    )
    return jnp.where(mask, code, jnp.int32(0x7FFFFFFF))


def hilbert_cell_codes_wide(cells, mask: jax.Array):
    """60-bit Hilbert index as an (hi, lo) int32 key pair, invalid last.

    ``cells``: three int32 [N] rows in [0, 2**20). Lexicographic order on
    ``(hi, lo)`` equals the full 60-bit Hilbert index order, and the pair
    is bijective in the cell (Skilling's transform is a bijection and the
    bit interleave is injective), so a variadic sort on the two keys both
    CURVE-ORDERS and GROUPS voxels exactly — the tier-2 compact-key mode
    of ops/voxel.voxel_downsample for scenes wider than the 1024-cell box
    (e.g. an 80 m ROI at 0.05 m voxels = 1600 cells). ``hi`` is the
    30-bit interleave of each axis's top 10 bits, ``lo`` of the low 10;
    both stay below the int32 sentinel 0x7FFFFFFF.
    """
    X = _hilbert_transpose(cells, 20)
    lo10 = jnp.int32(0x3FF)
    hi = (
        (_spread_bits_10((X[0] >> 10) & lo10) << 2)
        | (_spread_bits_10((X[1] >> 10) & lo10) << 1)
        | _spread_bits_10((X[2] >> 10) & lo10)
    )
    lo = (
        (_spread_bits_10(X[0] & lo10) << 2)
        | (_spread_bits_10(X[1] & lo10) << 1)
        | _spread_bits_10(X[2] & lo10)
    )
    sent = jnp.int32(0x7FFFFFFF)
    return jnp.where(mask, hi, sent), jnp.where(mask, lo, sent)


def hilbert_codes(
    positions: jax.Array, mask: jax.Array, origin_shift: float = 0.0,
    bounds=None,
) -> jax.Array:
    """30-bit Hilbert-curve index per point, invalid rows pushed last."""
    return hilbert_cell_codes(
        _quantize_axes(positions, mask, origin_shift, bounds), mask
    )


def _window(blocks: jax.Array, num_rolls: int) -> jax.Array:
    """(NB, B) -> (NB, (2R+1)*B) candidate window via block rolls.

    num_rolls == 0 (the pallas kernel's half-block fast profile) is
    approximated here by one full block per side — the XLA path has no
    sub-block roll, so it errs toward the LARGER window.
    """
    num_rolls = max(num_rolls, 1)
    parts = [
        jnp.roll(blocks, -r, axis=0) for r in range(-num_rolls, num_rolls + 1)
    ]
    return jnp.concatenate(parts, axis=1)


#: per-pass axis permutations: distinct curve orientations so a neighborhood
#: split across two curve passages in one orientation is contiguous in another
_PASS_PERMS = ((0, 1, 2), (1, 2, 0), (2, 0, 1), (0, 2, 1))


def _pass_shift(pass_idx: int) -> float:
    """Origin jitter (in cells) for pass ``pass_idx``.

    Pass 0 is unshifted; later passes shift by 128 cells each (range-
    compressed, see _quantize_axes) so their curve hierarchies decorrelate
    at every level, capped to keep at least half the resolution.
    """
    return float(min(128 * pass_idx, 512))


def _permute_bounds(bounds, perm):
    """Reorder a (lo[3], hi[3]) bounds pair by the pass axis permutation."""
    if bounds is None:
        return None
    lo, hi = bounds
    return (
        jnp.stack([lo[perm[0]], lo[perm[1]], lo[perm[2]]]),
        jnp.stack([hi[perm[0]], hi[perm[1]], hi[perm[2]]]),
    )


def _hilbert_order(positions, mask, pass_idx, bounds=None):
    """Sort permutation for pass ``pass_idx`` (axis-permuted, jittered curve)."""
    perm = _PASS_PERMS[pass_idx % len(_PASS_PERMS)]
    permuted = jnp.stack([positions[perm[0]], positions[perm[1]], positions[perm[2]]])
    return jnp.argsort(
        hilbert_codes(
            permuted, mask, _pass_shift(pass_idx), _permute_bounds(bounds, perm)
        )
    )


def _sorted_window_arrays(
    positions, mask, block_size, window_blocks, pass_idx, bounds=None
):
    order = _hilbert_order(positions, mask, pass_idx, bounds)
    sx = positions[0][order].reshape(-1, block_size)
    sy = positions[1][order].reshape(-1, block_size)
    sz = positions[2][order].reshape(-1, block_size)
    sv = mask[order].reshape(-1, block_size)
    wx = _window(sx, window_blocks)
    wy = _window(sy, window_blocks)
    wz = _window(sz, window_blocks)
    wv = _window(sv, window_blocks)
    return order, (sx, sy, sz, sv), (wx, wy, wz, wv)


def _chunk_size(num_blocks: int, chunk_blocks: int) -> int:
    """Largest divisor of ``num_blocks`` that is <= ``chunk_blocks``.

    The chunked XLA fallback maps ``fn`` over equal chunks; a non-divisor
    chunk size would silently DROP the remainder blocks (found round 4:
    halo-extended sharded slabs make nb = 136 while chunk_blocks = 64,
    truncating 8 blocks and crashing the unsort scatter). Capacities are
    128-multiples so nb is rarely prime; worst case degrades to cb = 1
    (more sequential chunks, same math)."""
    cb = min(chunk_blocks, num_blocks)
    while num_blocks % cb:
        cb -= 1
    return cb


def _map_chunks(fn, num_blocks, chunk_blocks):
    assert num_blocks % chunk_blocks == 0, (num_blocks, chunk_blocks)
    num_chunks = max(num_blocks // chunk_blocks, 1)
    return jax.lax.map(fn, jnp.arange(num_chunks))


def default_backend() -> str:
    """'pallas' on real TPU, 'xla' elsewhere (CPU tests, interpreters).

    ``APC_WINDOW_BACKEND`` overrides the resolution ('pallas' |
    'pallas_interpret' | 'xla') — used by the multichip dryrun and tests
    to force the Mosaic kernel path (interpret mode) under shard_map on
    the virtual CPU mesh, where 'auto' would pick the XLA fallback.
    """
    import os

    forced = os.environ.get("APC_WINDOW_BACKEND")
    if forced:
        valid = ("pallas", "pallas_interpret", "xla")
        if forced not in valid:
            raise ValueError(
                f"APC_WINDOW_BACKEND={forced!r} is not a window backend; "
                f"expected one of {valid}. (Unset the variable to let the "
                "platform pick: 'pallas' on TPU, 'xla' elsewhere.)"
            )
        return forced
    try:
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


def _sorted_rows(positions, mask, pass_idx, extra=(), with_idx=True,
                 bounds=None, stable=True):
    """Curve-sort x/y/z/valid (+extra rows) via ONE variadic lax.sort.

    Gather-free: the sort carries every payload row alongside the key
    (payload [N] gathers cost ~1 ms each on this backend, the variadic
    sort ~0.3 ms total — PERF_NOTES.md). Returns the sorted rows plus the
    original index row for sort-back; ``with_idx=False`` drops that row
    (every sort channel costs ~0.02 ms at 131k) for callers that never
    unsort (the reordering fused path). The validity row is derived from
    the key (invalid rows carry the hilbert sentinel) instead of being
    carried.

    ``stable=False`` skips the implicit iota tiebreak (~20% of sort cost,
    PERF_NOTES round 3): equal-key points land in a deterministic but
    network-dependent order. Safe when most keys are distinct — the fused
    re-sorts run post-voxel, where every point is a distinct voxel mean
    and the curve cell (~span/1024) is about the voxel size, so ties are
    a boundary-collision sliver (quality delta measured in PERF_NOTES
    round 5).
    """
    perm = _PASS_PERMS[pass_idx % len(_PASS_PERMS)]
    permuted = jnp.stack(
        [positions[perm[0]], positions[perm[1]], positions[perm[2]]]
    )
    codes = hilbert_codes(
        permuted, mask, _pass_shift(pass_idx), _permute_bounds(bounds, perm)
    )
    if with_idx:
        idx_rows = (jnp.arange(positions.shape[-1], dtype=jnp.int32),)
    else:
        idx_rows = ()
    out = jax.lax.sort(
        (codes, positions[0], positions[1], positions[2], *idx_rows, *extra),
        num_keys=1,
        is_stable=stable,
    )
    sv = out[0] < jnp.int32(0x7FFFFFFF)  # key sentinel == invalid
    return (*out[1:4], sv, *out[4:])  # sx, sy, sz, sv[, sidx], *extra


def _unsort(sidx, rows):
    """Restore original order by sorting on the carried index row.

    ``sidx`` is a permutation (all keys distinct), so an unstable sort is
    bit-identical to a stable one and skips the implicit iota tiebreak
    key a stable sort pays (~20% of sort cost — PERF_NOTES.md round 3).
    """
    out = jax.lax.sort((sidx, *rows), num_keys=1, is_stable=False)
    return out[1:]


def _entries_from_moments(mom):
    """Centered covariance entries (6, ...) from raw moment rows (10, ...)."""
    nw = jnp.maximum(mom[0], 1.0)
    mx, my, mz = mom[1] / nw, mom[2] / nw, mom[3] / nw
    a00 = mom[4] - nw * mx * mx
    a11 = mom[5] - nw * my * my
    a22 = mom[6] - nw * mz * mz
    a01 = mom[7] - nw * mx * my
    a02 = mom[8] - nw * mx * mz
    a12 = mom[9] - nw * my * mz
    return jnp.stack([a00, a11, a22, a01, a02, a12])


def _pallas_pass(positions, mask, pass_idx, k, radius, window_blocks,
                 interpret, kmode="sweep", bounds=None):
    """One curve pass through the fused Pallas kernel (ops/pallas_window.py).

    Returns (mean_knn[N], cov_entries[6, N], count[N]) in ORIGINAL order.
    """
    from .pallas_window import window_stats_pallas

    sx, sy, sz, sv, sidx = _sorted_rows(positions, mask, pass_idx,
                                        bounds=bounds)
    mean_s, cnt_s, mom_s = window_stats_pallas(
        sx, sy, sz, sv, radius, k=k, window_blocks=window_blocks,
        interpret=interpret, kmode=kmode, direction=pass_idx % 2,
    )
    entries_s = _entries_from_moments(mom_s)
    mean, count, *entry_rows = _unsort(
        sidx, (mean_s, mom_s[0], *[entries_s[i] for i in range(6)])
    )
    return mean, jnp.stack(entry_rows), count


def _oct_encode(nx, ny, nz):
    """Unit vector -> octahedral (u, v) pair: 3 re-sort payload rows
    become 2 (~0.013 ms/row at 51k). f32 roundtrip error ~1e-7 —
    orders below the window-PCA approximation itself."""
    s = jnp.abs(nx) + jnp.abs(ny) + jnp.abs(nz)
    s = jnp.where(s > 0, s, 1.0)
    u, v = nx / s, ny / s
    down = nz < 0
    su = jnp.where(u >= 0, 1.0, -1.0)
    sv = jnp.where(v >= 0, 1.0, -1.0)
    return (
        jnp.where(down, (1.0 - jnp.abs(v)) * su, u),
        jnp.where(down, (1.0 - jnp.abs(u)) * sv, v),
    )


def _oct_pack(u, v):
    """Octahedral (u, v) -> ONE int32 re-sort payload row (round 5).

    16-bit quantization per component: worst-case normal deflection
    ~2^-15 rad (~0.002 deg) — three orders below the window-PCA noise
    floor, measured invisible on the 10-degree normal-agreement metric.
    Halves the merge-free normal payload (2 f32 rows -> 1 int32 row,
    ~0.013 ms/re-sort at 51k; payload rows are permuted, not compared,
    so the int row rides the variadic sort unchanged)."""
    qu = jnp.clip(jnp.round((u * 0.5 + 0.5) * 65535.0), 0.0, 65535.0)
    qv = jnp.clip(jnp.round((v * 0.5 + 0.5) * 65535.0), 0.0, 65535.0)
    return (qu.astype(jnp.int32) << 16) | qv.astype(jnp.int32)


def _oct_unpack(p):
    qu = (p >> 16) & 0xFFFF
    qv = p & 0xFFFF
    u = qu.astype(jnp.float32) * (2.0 / 65535.0) - 1.0
    v = qv.astype(jnp.float32) * (2.0 / 65535.0) - 1.0
    return u, v


def _oct_decode(u, v):
    z = 1.0 - jnp.abs(u) - jnp.abs(v)
    down = z < 0
    su = jnp.where(u >= 0, 1.0, -1.0)
    sv = jnp.where(v >= 0, 1.0, -1.0)
    x = jnp.where(down, (1.0 - jnp.abs(v)) * su, u)
    y = jnp.where(down, (1.0 - jnp.abs(u)) * sv, v)
    nrm = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x / nrm, y / nrm, z / nrm


def _fused_passes(positions, mask, carry, *, k, radius, window_blocks,
                  passes, interp, kmode, shrink_to=0, radius2=None,
                  d2mode="highest", presorted=False, bounds=None,
                  entries_merge=True, carry_count=True):
    """Shared sort-chained multi-pass core of the fused neighborhood ops.

    Runs ``passes`` curve passes through the Pallas kernel, chaining each
    pass's outputs (and the caller's ``carry`` rows) through the next
    pass's variadic sort instead of unsorting after every pass — passes=2
    costs 2 sorts instead of 4 (~0.3 ms/sort at 131k, PERF_NOTES.md).
    Min-merges the kNN means, keeps the higher-count pass's normals.

    ``shrink_to`` (static, multiple of 128): shrink the buffer to this
    capacity FOR FREE inside the first curve sort — invalid rows sort
    last (hilbert_codes sentinel), so a static prefix slice of the sorted
    rows keeps every live point whenever live <= shrink_to. On overflow a
    deterministic binomial pre-subsample (hash of slot index) thins live
    points to ~shrink_to first, so the prefix drop is unbiased up to the
    small binomial excess (~sqrt(shrink_to) points from the curve tail).
    This replaces a standalone subsample_to stage (a full extra variadic
    sort) when a capacity shrink immediately precedes the neighborhood.

    Returns ``(sx, sy, sz, sv, carry_rows, mean, count, nx, ny, nz,
    count2)`` all in the FINAL pass's curve order (length ``shrink_to``
    when set); ``count2`` is None unless ``radius2`` was given (in-radius2
    counts, max-merged across passes — windows only ever UNDERCOUNT, so
    max is the best estimator).

    ``window_blocks`` may be a per-pass tuple (len == ``passes``): mixed
    profiles run a full symmetric window on the free presorted pass and
    cheaper one-sided windows on the re-sorted passes.

    ``entries_merge=False`` (round 4, opt-in): normals come from PASS 0
    only — the eigens are solved in pass-0 order and 3 normal rows ride
    the re-sorts instead of 6 covariance-entry rows, and later passes
    skip the moment matmul entirely (``moments=False``, 3 MXU passes per
    sub-block). Pass 0's symmetric window usually wins the per-point
    best-count merge anyway (it sees the widest window of the mixed
    profile); quality cost measured in tools/quality_presorted_knobs.py.
    """
    from .normals import _normals_from_entries
    from .pallas_window import window_stats_pallas

    use_r2 = radius2 is not None
    wbs = (
        (window_blocks,) * passes
        if isinstance(window_blocks, int)
        else tuple(window_blocks)
    )
    assert len(wbs) == passes, (wbs, passes)

    def one_pass(px, py, pz, pv, direction, wb, moments=True):
        out = window_stats_pallas(
            px, py, pz, pv, radius, k=k, window_blocks=wb,
            interpret=interp, kmode=kmode, direction=direction,
            radius2=radius2, d2mode=d2mode, moments=moments,
        )
        mean_s, _cnt_s, mom_s = out[:3]
        cnt2_s = out[3] if use_r2 else None
        # covariance ENTRIES (cheap elementwise moment conversion) are
        # carried across passes; the eigensolve itself is deferred until
        # after the per-point best-pass merge — identical normals (the
        # merge picks ONE pass's entries per point, so solving after
        # choosing equals choosing after solving) for one eigensolve
        # total instead of one per pass, at +1 payload row per re-sort
        # (6 entry rows vs mean+3 normal rows... net +2 rows vs the old
        # 5-row stat carry — ~0.03 ms/re-sort at 51k vs an ~0.1 ms
        # closed-form trig eigensolve per extra pass).
        e = _entries_from_moments(mom_s)
        return mean_s, mom_s[0], e, cnt2_s

    n = positions.shape[-1]

    def _thin_sort_slice(px, py, pz, m, cr):
        """Binomial pre-thin (on overflow) + pass-0 curve sort + static
        prefix slice to ``shrink_to`` (see docstring)."""
        n_live = jnp.sum(m.astype(jnp.int32))
        slot = jnp.arange(n, dtype=jnp.int32)
        pri = (slot * jnp.int32(-1640531527)).astype(jnp.uint32)
        p = jnp.float32(shrink_to) / jnp.maximum(
            n_live.astype(jnp.float32), 1.0
        )
        keep = pri.astype(jnp.float32) < p * jnp.float32(2.0**32)
        m = m & ((n_live <= shrink_to) | keep)
        ax, ay, az, av, *acr = _sorted_rows(
            jnp.stack([px, py, pz]), m, 0, extra=tuple(cr), with_idx=False,
            bounds=bounds,
        )
        return (
            ax[:shrink_to], ay[:shrink_to], az[:shrink_to], av[:shrink_to],
            *[c[:shrink_to] for c in acr],
        )

    if presorted:
        # Caller promises: live points front-compacted AND already in a
        # pass-0-quality curve order (the curve-ordered voxel sort,
        # ops/voxel.py). The pass-0 sort is then pure waste — a static
        # prefix slice implements the shrink, except in the (rare,
        # deployment-sized-bucket) overflow case where the unbiased
        # binomial thin punches holes in the prefix, so the compacting
        # sort path runs under a lax.cond (compiled, almost never taken).
        if shrink_to and shrink_to < n:
            n_live = jnp.sum(mask.astype(jnp.int32))
            sx, sy, sz, sv, *carry = jax.lax.cond(
                n_live > shrink_to,
                lambda a: _thin_sort_slice(a[0], a[1], a[2], a[3], a[4:]),
                lambda a: (
                    a[0][:shrink_to], a[1][:shrink_to], a[2][:shrink_to],
                    a[3][:shrink_to], *[c[:shrink_to] for c in a[4:]],
                ),
                (positions[0], positions[1], positions[2], mask, *carry),
            )
        else:
            sx, sy, sz, sv = positions[0], positions[1], positions[2], mask
            carry = list(carry)
    elif shrink_to and shrink_to < n:
        sx, sy, sz, sv, *carry = _thin_sort_slice(
            positions[0], positions[1], positions[2], mask, carry
        )
    else:
        sx, sy, sz, sv, *carry = _sorted_rows(
            positions, mask, 0, extra=tuple(carry), with_idx=False,
            bounds=bounds,
        )
    mean, count, ent, cnt2 = one_pass(sx, sy, sz, sv, 0, wbs[0])
    # entries_merge=False: the count row rides the re-sorts only to be
    # returned; callers that ignore the count output (the fused pipeline
    # stage thresholds on the kNN mean alone) pass carry_count=False and
    # get zeros back, saving the payload row (~0.013 ms/re-sort at 51k).
    drop_count = not entries_merge and not carry_count
    if not entries_merge:
        # solve the eigens NOW (pass-0 order); the OCTAHEDRAL-PACKED
        # normal (ONE int32 row, 16-bit per component — _oct_pack) rides
        # the re-sorts instead of 6 entry rows
        nrm0 = _normals_from_entries(
            ent[0], ent[1], ent[2], ent[3], ent[4], ent[5], count
        )
        stat_n = (_oct_pack(*_oct_encode(nrm0[0], nrm0[1], nrm0[2])),)
    for p_i in range(1, passes):
        ent_rows = ent if entries_merge else stat_n
        cnt_rows = () if drop_count else (count,)
        stat_rows = (mean, *cnt_rows, *ent_rows) + (
            (cnt2,) if use_r2 else ()
        )
        # unstable re-sort (round 5): post-voxel points are distinct voxel
        # means, curve cell ~= voxel size, so key ties are a boundary
        # sliver — skips the stable tiebreak tax (~20% of the sort)
        sx, sy, sz, sv, *rest = _sorted_rows(
            jnp.stack([sx, sy, sz]), sv, p_i,
            extra=(*carry, *stat_rows), with_idx=False, bounds=bounds,
            stable=False,
        )
        ns = len(stat_rows)
        carry, stat_rows = rest[:-ns], rest[-ns:]
        mean = stat_rows[0]
        nc = 0 if drop_count else 1
        count = mean * 0.0 if drop_count else stat_rows[1]
        ne = 6 if entries_merge else 1
        cnt2 = stat_rows[1 + nc + ne] if use_r2 else None
        m2, c2, ent2, cnt2b = one_pass(
            sx, sy, sz, sv, p_i % 2, wbs[p_i], moments=entries_merge
        )
        mean = jnp.minimum(mean, m2)
        if entries_merge:
            ent = stat_rows[2:8]
            better = c2 > count
            ent = tuple(
                jnp.where(better, e2, e1) for e1, e2 in zip(ent, ent2)
            )
            count = jnp.where(better, c2, count)
        else:
            # normals/count stay pass-0's (consistent pair); the kNN mean
            # and the radius count still merge across passes
            stat_n = stat_rows[1 + nc : 2 + nc]
        if use_r2:
            cnt2 = jnp.maximum(cnt2, cnt2b)
    if entries_merge:
        nrm = _normals_from_entries(
            ent[0], ent[1], ent[2], ent[3], ent[4], ent[5], count
        )
    else:
        nrm = _oct_decode(*_oct_unpack(stat_n[0]))
    return (sx, sy, sz, sv, tuple(carry), mean, count,
            nrm[0], nrm[1], nrm[2], cnt2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "window_blocks", "passes", "backend", "kmode", "d2mode",
        "entries_merge", "carry_count",
    ),
)
def fused_neighborhood_stats(
    positions: jax.Array,
    mask: jax.Array,
    k: int,
    radius: jax.Array | float,
    window_blocks: int = 2,
    passes: int = 2,
    backend: str = "auto",
    kmode: str = "sweep",
    bounds=None,
    d2mode: str = "highest",
    radius2=None,
    entries_merge: bool = True,
    carry_count: bool = True,
) -> Tuple[jax.Array, ...]:
    """One shared neighborhood sweep serving BOTH statistical-outlier and
    normal estimation: (mean_knn_dist[N], normals[3, N] unit, count[N]).

    On TPU this is 2 variadic sorts + the Pallas kernel per pass — the
    sort/gather/scatter glue is shared between the two consumers instead
    of paid 4x. The XLA fallback composes the two window ops. Note the
    documented semantic: neighborhoods are computed on the pre-outlier
    cloud (the reference filters outliers first, then estimates normals;
    true outliers are out-of-radius for their neighbors, so the normals
    are statistically unchanged).

    ``bounds``: optional (lo[3], hi[3]) quantization box for the curve
    sorts (see ``_quantize_axes``; sharded callers pass the global bbox).
    ``radius2``: optional second in-radius threshold (traced) — when
    given, a 4th output is returned: the in-radius2 candidate count [N]
    (max-merged across passes), so radius-outlier removal rides the same
    sweep like the reordered variant / the sharded fused stage
    (parallel/sharding.py) instead of paying a second window sweep.
    """
    if backend == "auto":
        backend = default_backend()
    n = positions.shape[-1]
    use_r2 = radius2 is not None

    if backend in ("pallas", "pallas_interpret") and n % 128 == 0:
        # sort-chained passes with the original index carried as payload;
        # one final unsort restores input order
        idx = jnp.arange(n, dtype=jnp.int32)
        _sx, _sy, _sz, sv, (orig,), mean, count, nx, ny, nz, c2 = (
            _fused_passes(
                positions, mask, (idx,), k=k, radius=radius,
                window_blocks=window_blocks, passes=passes,
                interp=(backend == "pallas_interpret"), kmode=kmode,
                bounds=bounds, d2mode=d2mode, radius2=radius2,
                entries_merge=entries_merge, carry_count=carry_count,
            )
        )
        rows = (mean, count, nx, ny, nz) + ((c2,) if use_r2 else ())
        mean, count, nx, ny, nz, *rest = _unsort(orig, rows)
        normals = jnp.stack([nx, ny, nz])
        base = (
            jnp.where(mask, mean, 0.0), normals, jnp.where(mask, count, 0.0)
        )
        if use_r2:
            return base + (jnp.where(mask, rest[0], 0.0),)
        return base

    # XLA fallback: compose the two window ops (no sharing, same results).
    # Per-pass window tuples thread straight through (the window ops index
    # the tuple per pass since round 5).
    wb_flat = (
        window_blocks if isinstance(window_blocks, int)
        else tuple(window_blocks)
    )
    mean = window_mean_knn_dist(
        positions, mask, k=k, window_blocks=wb_flat, passes=passes,
        backend="xla", bounds=bounds,
    )
    entries, count = window_normal_stats(
        positions, mask, radius, window_blocks=wb_flat, passes=passes,
        backend="xla", bounds=bounds,
    )
    from .normals import _normals_from_entries as _nfe

    normals = _nfe(
        entries[0], entries[1], entries[2], entries[3], entries[4],
        entries[5], count,
    )
    if use_r2:
        _e2, count2 = window_normal_stats(
            positions, mask, radius2, window_blocks=wb_flat, passes=passes,
            backend="xla", bounds=bounds,
        )
        return mean, normals, count, count2
    return mean, normals, count


def fused_neighborhood_stats_reordered(
    positions: jax.Array,
    mask: jax.Array,
    attrs: dict,
    k: int,
    radius: jax.Array | float,
    window_blocks: int = 2,
    passes: int = 2,
    backend: str = "auto",
    kmode: str = "sweep",
    shrink_to: int = 0,
    radius2=None,
    d2mode: str = "highest",
    presorted: bool = False,
    bounds=None,
    entries_merge: bool = True,
    carry_count: bool = True,
):
    """`fused_neighborhood_stats` that REORDERS the buffer instead of
    unsorting the stats.

    ``presorted=True`` (pallas path): caller promises the input is
    front-compacted AND in curve order (the ``curve_order`` voxel sort)
    — the pass-0 sort is skipped and the shrink becomes a static prefix
    slice (overflow falls back to the sorting path under a lax.cond).
    Ignored on the XLA fallback, which computes stats in input order
    anyway.

    Post-voxel the pipeline has no point-order contract (the voxel stage
    already reordered to voxel-key order; egress compacts by mask), so
    the final unsort back to input order (~0.3 ms at 131k) is pure waste:
    carry positions/mask/attributes THROUGH the curve sorts and leave
    everything in the final pass's curve order, stats aligned.

    Returns ``(positions, mask, attrs, mean_knn, normals, count[,
    count2])`` — all in the SAME (reordered) order on the pallas path; the
    XLA fallback returns the inputs unchanged with stats in input order
    (alignment is the only contract). ``shrink_to`` (static, multiple of
    128, pallas path only): shrink the buffer to this capacity inside the
    first curve sort (see ``_fused_passes``) — outputs come back at the
    smaller capacity; 0 disables. The XLA fallback applies
    ``subsample_to`` semantics via ops.compact before computing (same
    output capacity). ``radius2``: when given, the in-radius2 candidate
    count rides the same sweep and is returned as a 7th element
    (radius-outlier fusion; max-merged across passes).
    """
    if backend == "auto":
        backend = default_backend()
    n = positions.shape[-1]

    if backend not in ("pallas", "pallas_interpret") or n % 128 != 0:
        if shrink_to and shrink_to < n:
            from ..core.scan import ScanBuffer
            from .compact import subsample_to

            b = subsample_to(
                ScanBuffer(positions=positions, mask=mask, attributes=attrs),
                shrink_to,
            )
            positions, mask, attrs = b.positions, b.mask, dict(b.attributes)
        mean, normals, count = fused_neighborhood_stats(
            positions, mask, k=k, radius=radius,
            window_blocks=window_blocks, passes=passes, backend=backend,
            kmode=kmode, bounds=bounds,
        )
        if radius2 is None:
            return positions, mask, attrs, mean, normals, count
        _entries, count2 = window_normal_stats(
            positions, mask, radius2,
            window_blocks=(
                window_blocks if isinstance(window_blocks, int)
                else tuple(window_blocks)
            ),
            passes=passes, backend="xla", bounds=bounds,
        )
        return positions, mask, attrs, mean, normals, count, count2

    # flatten attributes to [N] rows so they ride the variadic sorts
    flat = []
    specs = []
    for name, v in attrs.items():
        rows = v.reshape(-1, n)
        specs.append((name, v.shape, rows.shape[0]))
        flat.extend(rows[i] for i in range(rows.shape[0]))

    sx, sy, sz, sv, flat, mean, count, nx, ny, nz, cnt2 = _fused_passes(
        positions, mask, tuple(flat), k=k, radius=radius,
        window_blocks=window_blocks, passes=passes,
        interp=(backend == "pallas_interpret"), kmode=kmode,
        shrink_to=shrink_to, radius2=radius2, d2mode=d2mode,
        presorted=presorted, bounds=bounds, entries_merge=entries_merge,
        carry_count=carry_count,
    )

    out_attrs = {}
    i = 0
    n_out = sx.shape[-1]  # == shrink_to when the in-sort shrink engaged
    for name, shape, nrows in specs:
        rows = flat[i : i + nrows]
        i += nrows
        # unconditional reshape: preserves leading singleton dims of
        # (..., N) attributes (a (1, N) attr must come back (1, n_out))
        out_attrs[name] = jnp.stack(rows).reshape(shape[:-1] + (n_out,))
    normals = jnp.stack([nx, ny, nz])
    base = (
        jnp.stack([sx, sy, sz]),
        sv,
        out_attrs,
        jnp.where(sv, mean, 0.0),
        normals,
        jnp.where(sv, count, 0.0),
    )
    if radius2 is None:
        return base
    return base + (jnp.where(sv, cnt2, 0.0),)


def _wb_per_pass(window_blocks, passes: int) -> tuple:
    """Normalize ``window_blocks`` (int | per-pass tuple) to a len-``passes``
    tuple. The standalone window ops accept the same per-pass tuples as the
    fused path (VERDICT r4: collapsing tuples to ``max`` was a silent config
    rewrite on the unfused/sharded stages)."""
    wbs = (
        (window_blocks,) * passes
        if isinstance(window_blocks, int)
        else tuple(window_blocks)
    )
    if len(wbs) != passes:
        raise ValueError(
            f"per-pass window_blocks tuple length {len(wbs)} != passes "
            f"{passes}"
        )
    return wbs


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_size", "window_blocks", "chunk_blocks", "passes",
        "backend", "kmode",
    ),
)
def window_mean_knn_dist(
    positions: jax.Array,
    mask: jax.Array,
    k: int,
    block_size: int = 128,
    window_blocks: int = 2,
    chunk_blocks: int = 64,
    passes: int = 2,
    backend: str = "auto",
    kmode: str = "sweep",
    bounds=None,
) -> jax.Array:
    """Mean distance to the k nearest window candidates (self included).

    Returns float32[N] in original buffer order; masked-out rows get 0.
    Backs statistical outlier removal (reference :514-519 semantics).
    Estimates are exact-or-overestimates; ``passes`` jittered runs are
    min-merged (see module docstring).
    """
    n = positions.shape[-1]
    block_size = min(block_size, n)
    wbs = _wb_per_pass(window_blocks, passes)
    if backend == "auto":
        backend = default_backend()
    if backend in ("pallas", "pallas_interpret") and n % 128 == 0:
        interp = backend == "pallas_interpret"

        def pallas_one(pass_idx):
            mean, _entries, _cnt = _pallas_pass(
                positions, mask, pass_idx, k, 0.0, wbs[pass_idx], interp,
                kmode=kmode, bounds=bounds,
            )
            return mean

        best = pallas_one(0)
        for p_i in range(1, passes):
            best = jnp.minimum(best, pallas_one(p_i))
        return jnp.where(mask, best, 0.0)

    def one_pass(pass_idx):
        order, (sx, sy, sz, sv), (wx, wy, wz, wv) = _sorted_window_arrays(
            positions, mask, block_size, wbs[pass_idx], pass_idx, bounds
        )
        nb = sx.shape[0]
        cb = _chunk_size(nb, chunk_blocks)
        kk = min(k, wx.shape[1])

        def chunk_fn(ci):
            s = ci * cb
            qx = jax.lax.dynamic_slice_in_dim(sx, s, cb)
            qy = jax.lax.dynamic_slice_in_dim(sy, s, cb)
            qz = jax.lax.dynamic_slice_in_dim(sz, s, cb)
            cx = jax.lax.dynamic_slice_in_dim(wx, s, cb)
            cy = jax.lax.dynamic_slice_in_dim(wy, s, cb)
            cz = jax.lax.dynamic_slice_in_dim(wz, s, cb)
            cv = jax.lax.dynamic_slice_in_dim(wv, s, cb)
            d = (
                (qx[:, :, None] - cx[:, None, :]) ** 2
                + (qy[:, :, None] - cy[:, None, :]) ** 2
                + (qz[:, :, None] - cz[:, None, :]) ** 2
            )
            d = jnp.where(cv[:, None, :], d, jnp.inf)
            neg_top, _ = jax.lax.top_k(-d, kk)  # (cb, B, k)
            top = -neg_top
            finite = jnp.isfinite(top)
            cnt = jnp.maximum(jnp.sum(finite, axis=-1), 1)
            return jnp.sum(jnp.where(finite, jnp.sqrt(top), 0.0), axis=-1) / cnt

        mean_sorted = _map_chunks(chunk_fn, nb, cb).reshape(-1)
        return jnp.zeros(n, jnp.float32).at[order].set(mean_sorted)

    best = one_pass(0)
    for p in range(1, passes):
        best = jnp.minimum(best, one_pass(p))
    return jnp.where(mask, best, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "window_blocks", "chunk_blocks", "passes", "backend"
    ),
)
def window_normal_stats(
    positions: jax.Array,
    mask: jax.Array,
    radius: jax.Array | float,
    block_size: int = 128,
    window_blocks: int = 2,
    chunk_blocks: int = 64,
    passes: int = 2,
    backend: str = "auto",
    bounds=None,
) -> Tuple[jax.Array, jax.Array]:
    """In-radius covariance entries over the curve window, per point.

    Returns ``(cov_entries float32[6, N], count float32[N])`` in original
    buffer order, where entries are (a00, a11, a22, a01, a02, a12) of the
    centered covariance over in-radius candidates (self included). Across
    ``passes`` jittered runs, each point keeps the pass that found MORE
    in-radius neighbors. Backs normal estimation; using *all* in-radius
    candidates rather than only the max_nn nearest is a documented
    quality-positive deviation from Open3D's hybrid search.
    """
    n = positions.shape[-1]
    block_size = min(block_size, n)
    wbs = _wb_per_pass(window_blocks, passes)
    if backend == "auto":
        backend = default_backend()
    if backend in ("pallas", "pallas_interpret") and n % 128 == 0:
        interp = backend == "pallas_interpret"
        entries, counts = None, None
        for p_i in range(passes):
            _mean, e2, c2 = _pallas_pass(
                positions, mask, p_i, 1, radius, wbs[p_i], interp,
                bounds=bounds,
            )
            if entries is None:
                entries, counts = e2, c2
            else:
                better = c2 > counts
                entries = jnp.where(better[None, :], e2, entries)
                counts = jnp.where(better, c2, counts)
        return entries, jnp.where(mask, counts, 0.0)
    r2 = jnp.asarray(radius, jnp.float32) ** 2

    def one_pass(pass_idx):
        order, (sx, sy, sz, sv), (wx, wy, wz, wv) = _sorted_window_arrays(
            positions, mask, block_size, wbs[pass_idx], pass_idx, bounds
        )
        nb = sx.shape[0]
        cb = _chunk_size(nb, chunk_blocks)

        def chunk_fn(ci):
            s = ci * cb
            qx = jax.lax.dynamic_slice_in_dim(sx, s, cb)
            qy = jax.lax.dynamic_slice_in_dim(sy, s, cb)
            qz = jax.lax.dynamic_slice_in_dim(sz, s, cb)
            cx = jax.lax.dynamic_slice_in_dim(wx, s, cb)
            cy = jax.lax.dynamic_slice_in_dim(wy, s, cb)
            cz = jax.lax.dynamic_slice_in_dim(wz, s, cb)
            cv = jax.lax.dynamic_slice_in_dim(wv, s, cb)
            dx = cx[:, None, :] - qx[:, :, None]
            dy = cy[:, None, :] - qy[:, :, None]
            dz = cz[:, None, :] - qz[:, :, None]
            d2 = dx * dx + dy * dy + dz * dz
            w = (cv[:, None, :] & (d2 <= r2)).astype(jnp.float32)
            cnt = jnp.sum(w, axis=-1)
            denom = jnp.maximum(cnt, 1.0)
            mx = jnp.sum(w * cx[:, None, :], axis=-1) / denom
            my = jnp.sum(w * cy[:, None, :], axis=-1) / denom
            mz = jnp.sum(w * cz[:, None, :], axis=-1) / denom
            ex = cx[:, None, :] - mx[:, :, None]
            ey = cy[:, None, :] - my[:, :, None]
            ez = cz[:, None, :] - mz[:, :, None]
            a00 = jnp.sum(w * ex * ex, axis=-1)
            a11 = jnp.sum(w * ey * ey, axis=-1)
            a22 = jnp.sum(w * ez * ez, axis=-1)
            a01 = jnp.sum(w * ex * ey, axis=-1)
            a02 = jnp.sum(w * ex * ez, axis=-1)
            a12 = jnp.sum(w * ey * ez, axis=-1)
            return jnp.stack([a00, a11, a22, a01, a02, a12]), cnt

        entries, counts = _map_chunks(chunk_fn, nb, cb)
        entries = jnp.moveaxis(entries, 1, 0).reshape(6, -1)
        counts = counts.reshape(-1)
        out_entries = jnp.zeros((6, n), jnp.float32).at[:, order].set(entries)
        out_counts = jnp.zeros(n, jnp.float32).at[order].set(counts)
        return out_entries, out_counts

    entries, counts = one_pass(0)
    for p in range(1, passes):
        e2, c2 = one_pass(p)
        better = c2 > counts
        entries = jnp.where(better[None, :], e2, entries)
        counts = jnp.where(better, c2, counts)
    return entries, jnp.where(mask, counts, 0.0)
