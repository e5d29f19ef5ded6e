"""Pallas TPU kernel for windowed neighborhood statistics.

The XLA formulation of the Hilbert-window kNN ops (ops/window.py)
materializes (N, window) candidate/distance tensors in HBM — ~2 GB of
traffic per pass at 131k points, measured at +57 ms (outliers) / +14 ms
(normals) per scan. This kernel keeps everything in VMEM:

* each grid step DMAs a 4-row (x, y, z, invalid-flag) window slice from
  HBM into a double-buffered VMEM scratch (prefetching step i+1 while
  computing step i) and derives all matmul feature rows IN-KERNEL from
  those four rows — 8x less HBM traffic than shipping precomputed
  features, and it lets every feature be computed about a LOCAL origin;
* coordinates are centered per 128-query sub-block (subtract the query
  block's mean): squared distances and covariance moments are
  translation-invariant, and centering shrinks the |c|^2 + |q|^2 - 2 c.q
  cancellation from (scene radius)^2 to (window span)^2, so the f32
  matmul's conditioning no longer depends on how far the scan sits from
  the sensor origin;
* squared distances for one 128-query block against its candidate window
  come from ONE MXU matmul via the feature trick
  ``[x, y, z, |c|^2, 1, BIG*invalid] . [-2x, -2y, -2z, 1, |q|^2, 1]``
  — invalid-candidate exclusion is folded into the same contraction.
  ``Precision.HIGHEST`` is still required (the MXU's default bf16
  multiply rounds ~0.4% of the span — enough to misorder near ties);
* mean-of-k-nearest comes from k min-extraction sweeps on the VPU, or
  ~2x cheaper threshold bisection (kmode='bisect') whose initial upper
  bound is the query block's own max distance (a valid bound on the k-th
  distance whenever the block holds >= k valid candidates — typically
  5-10x tighter than the whole window's max, worth ~2 bisection bits);
* covariance raw moments (for normal PCA) come from a second matmul
  ``G(10, M) @ w(M, B)`` where G rows are [1, x, y, z, xx, yy, zz, xy,
  xz, yz] of the CENTERED coordinates — centering outside the kernel
  (ops/window._entries_from_moments) is origin-invariant, so moments
  about the per-block origin yield identical covariance entries.

Candidate windows overlap between grid blocks, which BlockSpec cannot
express; the window slices are DMA'd explicitly with 128-aligned offsets.

HBM traffic per pass is ~4.5 MB. Used by ops/window.py when running on
TPU; the XLA path remains as the portable fallback and the
interpret-mode oracle for tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_segmean import _dot3_exact

__all__ = ["window_stats_pallas"]

_BIG = 1e30
_CSEL_R = 2  # refinement bisections for kmode='csel'. The own-block k-th
             # smallest is already a tight upper bound on the window k-th
             # (exact for every query whose k nearest sit in its own 128
             # block — the large majority in curve order), so 2 iterations
             # close most of the residual band; quality measured in
             # tools/quality_presorted_knobs.py.
_BISECT = 13  # bisection iterations for kmode='bisect'. Measured round 3
              # (tools/quality_bisect_iters.py, CPU interpret): 9 iters
              # (the r2 value) gave 92.7%/85.8% outlier-classification
              # agreement on bench8k/ring15k — BELOW the quality floors;
              # 13 iters restores sweep-level agreement (97.0%/99.8%,
              # median relerr 7e-5) for +8 VPU passes (~+0.04 ms/pass at
              # 51k rows — bisect stays k-independent and cheaper than
              # sweep only for large nb_neighbors).
_B = 128  # sweep block: keeps the k-extraction loop carry small (a (window,
          # 512) carry spills VMEM and measures ~1.5x slower end to end)
_G = 16  # MAX sweep blocks per grid step: one wide DMA + fewer grid steps
         # amortize per-step cost. _call_batched picks the largest of
         # (16, 8, 4) that divides n/128 (else 1). Round-4 measured
         # (51200 rows, csel): _G=4 0.380, _G=8 0.370, _G=16 0.330
         # ms/pass; pipeline p50 1.768 -> 1.723 ms. Per-sub-block work
         # (matmuls, sweeps) is unchanged — the win is pure per-step
         # overhead (~0.7 us/step).
_F = 4  # HBM rows per scan: x, y, z, BIG*invalid


def _dot_fast3(a, b, dims):
    """dot_general at ~2^-16 relative accuracy in 3 bf16 MXU passes.

    ``Precision.HIGHEST`` costs 6 passes. Split BOTH operands hi+lo
    (hi = bf16 round, |lo| <= 2^-8|x|) and drop only the lo*lo term:
    error ~2^-16 of the term-magnitude sum. For the distance matmul that
    is ~2^-16 * (window span)^2 — after per-block centering the span is a
    few meters, so the absolute error sits below the k-select's 2^-12
    mantissa-packing noise and far below the Hilbert-window approximation
    itself (quality measured unchanged; PERF_NOTES.md round 3).
    """
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for x, y in ((ah, bh), (ah, bl), (al, bh)):
        d = jax.lax.dot_general(
            x, y, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


def _kernel(
    r2_ref,  # SMEM (batch, 2) squared radii per scan: [normals, radius2]
    feat_hbm,  # ANY (batch, 4, Npad) x/y/z/BIG*invalid rows
    mom_ref,  # VMEM out (16, B): rows 0-9 moments, 10 mean_knn, 11 count,
              # 12 in-radius2 count
    feat_vmem,  # scratch (2, 4, window) double buffer
    sems,  # DMA semaphores (2,)
    *,
    k: int,
    window: int,
    qb: int,
    kmode: str,
    dma_off: int,
    qoff: int,
    d2mode: str,
    moments_on: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    nbatch = pl.num_programs(0)
    sub_window = window - (qb - _B)  # candidate span per 128-query sub-block
    halo = qoff  # query block's offset within its candidate span

    def window_dma(bb, step, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[bb, :, pl.ds(step * qb + dma_off, window)],
            feat_vmem.at[slot],
            sems.at[slot],
        )

    # linear step t = b*nb + i; prefetch t+1 (grid iterates last dim fastest)
    t = b * nb + i

    @pl.when(t == 0)
    def _():
        window_dma(0, 0, 0).start()

    @pl.when(t + 1 < nbatch * nb)
    def _():
        window_dma((t + 1) // nb, (t + 1) % nb, (t + 1) % 2).start()

    window_dma(b, i, t % 2).wait()
    feat = feat_vmem[t % 2]

    r2 = r2_ref[b, 0]
    r2b = r2_ref[b, 1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (sub_window, _B), 0)
    center_row = (rows >= halo) & (rows < halo + _B)
    results = []
    for g in range(qb // _B):
        cx = feat[0:1, g * _B : g * _B + sub_window]
        cy = feat[1:2, g * _B : g * _B + sub_window]
        cz = feat[2:3, g * _B : g * _B + sub_window]
        cbig = feat[3:4, g * _B : g * _B + sub_window]
        qx = feat[0:1, halo + g * _B : halo + (g + 1) * _B]
        qy = feat[1:2, halo + g * _B : halo + (g + 1) * _B]
        qz = feat[2:3, halo + g * _B : halo + (g + 1) * _B]

        # local origin: the query block's coordinate mean (any fixed point
        # near the window works — d2 and centered covariance are
        # translation-invariant; see module docstring)
        c0x = jnp.sum(qx, axis=1, keepdims=True) * (1.0 / _B)
        c0y = jnp.sum(qy, axis=1, keepdims=True) * (1.0 / _B)
        c0z = jnp.sum(qz, axis=1, keepdims=True) * (1.0 / _B)
        cxc, cyc, czc = cx - c0x, cy - c0y, cz - c0z
        qxc, qyc, qzc = qx - c0x, qy - c0y, qz - c0z

        one = jnp.ones_like(cx)
        qone = jnp.ones_like(qx)
        nsq = cxc * cxc + cyc * cyc + czc * czc
        qnsq = qxc * qxc + qyc * qyc + qzc * qzc
        cand = jnp.concatenate([cxc, cyc, czc, nsq, one, cbig], axis=0)
        qry = jnp.concatenate(
            [-2.0 * qxc, -2.0 * qyc, -2.0 * qzc, qone, qnsq, qone], axis=0
        )

        # (sub_window, B) squared distances (+BIG for invalid candidates)
        # in one matmul
        dims = (((0,), (0,)), ((), ()))
        if d2mode == "fast3":
            d2 = _dot_fast3(cand, qry, dims)
        else:
            d2 = jax.lax.dot_general(
                cand,
                qry,
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        d2 = jnp.maximum(d2, 0.0)

        # in-radius2 count (radius-outlier consumer; ~free alongside the
        # sweep — one compare + row-reduction)
        cnt2 = jnp.sum(
            jnp.where((d2 <= r2b) & (d2 < _BIG / 2), 1.0, 0.0),
            axis=0, keepdims=True,
        )

        # ---- covariance raw moments over in-radius candidates ----
        # about the block origin c0 — origin-invariant consumers only.
        # w is 0/1, so the 3-term bf16 split is f32-exact at half the
        # HIGHEST pass count (ops/pallas_segmean._dot3_exact).
        # `moments=False` (round 4: merge-free later passes when normals
        # come from pass 0 only) skips the 3 MXU passes and emits zeros.
        if moments_on:
            w = jnp.where((d2 <= r2) & (d2 < _BIG / 2), 1.0, 0.0)
            gmat = jnp.concatenate(
                [
                    one, cxc, cyc, czc,
                    cxc * cxc, cyc * cyc, czc * czc,
                    cxc * cyc, cxc * czc, cyc * czc,
                ],
                axis=0,
            )
            moments = _dot3_exact(
                gmat, w, dims=(((1,), (0,)), ((), ()))
            )
        else:
            moments = jnp.zeros((10, _B), jnp.float32)

        if kmode == "sweep":
            # ---- mean distance of k nearest (min-extraction sweeps) ----
            # Pack the candidate row index into the low 11 mantissa bits of
            # d2: packed values are then UNIQUE, so each sweep is just a min
            # plus an equality mask (no argmin pass, no tie ambiguity).
            # d2 >= 0 so the f32 bit pattern is order-preserving; zeroing 11
            # low mantissa bits costs 2^-12 relative distance error (below
            # the matmul cancellation noise).
            d2i = pltpu.bitcast(d2, jnp.int32)
            packed_d = pltpu.bitcast((d2i & ~2047) | rows, jnp.float32)

            def sweep(carry):
                d, acc, cnt = carry
                mn = jnp.min(d, axis=0, keepdims=True)  # (1, B), unique
                hit = mn < _BIG / 2
                dist2 = pltpu.bitcast(
                    pltpu.bitcast(mn, jnp.int32) & ~2047, jnp.float32
                )
                acc = acc + jnp.where(
                    hit, jnp.sqrt(jnp.maximum(dist2, 0.0)), 0.0
                )
                cnt = cnt + jnp.where(hit, 1.0, 0.0)
                d = jnp.where(d == mn, _BIG, d)
                return d, acc, cnt

            zero = jnp.zeros((1, _B), jnp.float32)
            # UNROLLED (k is static): a lax.fori_loop here costs ~0.9 ms of
            # pure Mosaic loop overhead per kernel pass at 131k — unrolling
            # lets the compiler software-pipeline the iterations (measured
            # 2.22 -> 1.31 ms/pass for the bisect variant)
            carry = (packed_d, zero, zero)
            for _ in range(k):
                carry = sweep(carry)
            _, acc, cnt = carry
            mean = acc / jnp.maximum(cnt, 1.0)
        else:
            # ---- mean distance of ~k nearest (threshold + correction) ----
            # Shared structure for kmode='bisect' and kmode='csel': narrow
            # a distance threshold t to where count(d2 <= t) ~= k, then one
            # masked sum gives the mean with an at-threshold correction for
            # the overcount.
            #
            # 'bisect' starts from the query block's own max distance (a
            # valid but loose bound) and pays _BISECT=13 full-window
            # count passes. NOTE: when a query block has fewer than k
            # valid candidates (sparse regions, scan edges) hi0 falls back
            # to the full-window max below, where the iterations leave a
            # wider relative band than the tight center-block bound —
            # accuracy-sensitive callers default to kmode='sweep' (exact).
            #
            # 'csel' (round 4) starts from the own-block K-TH SMALLEST
            # instead: k min-extraction sweeps over ONLY the query's own
            # 128-row center slice (a static slice — 1/sub_window-th of
            # the sweep branch's per-iteration cost) yield a threshold
            # that is EXACT for every query whose k nearest live in its
            # own block (the large majority in curve order: count(d2 <=
            # thr) == k makes the correction vanish), so only _CSEL_R=2
            # refinement passes follow. Comparisons use the
            # mantissa-truncated d2 (consistent with the packed sweep
            # values) so the extracted k-th element itself always counts
            # inside.
            validd = d2 < _BIG / 2
            kf = jnp.float32(k)
            hi_full = jnp.max(
                jnp.where(validd, d2, 0.0), axis=0, keepdims=True
            )
            if kmode == "csel":
                # wb=0 (sub_window == _B): the own block IS the whole
                # window, so thr_own is already the EXACT window k-th and
                # the refinement bisections are provable no-ops — for
                # non-sparse queries count(d2cmp <= mid) < k for any
                # mid < thr_own (hi never moves), and for sparse queries
                # the correction is inactive (count < k => extra = 0), so
                # `lo`'s movement is unobservable. Skip them: bit-identical
                # output, _CSEL_R fewer 128-row count passes per sub-block.
                iters = 0 if sub_window == _B else _CSEL_R
                d2i = pltpu.bitcast(d2, jnp.int32)
                d2cmp = pltpu.bitcast(d2i & ~2047, jnp.float32)
                packed_d = pltpu.bitcast((d2i & ~2047) | rows, jnp.float32)
                own = packed_d[halo : halo + _B, :]  # (128, B) static slice
                d = own
                mn = jnp.min(d, axis=0, keepdims=True)
                # UNROLLED (k static): see the sweep branch note
                for _ in range(k - 1):
                    d = jnp.where(d == mn, _BIG, d)
                    mn = jnp.min(d, axis=0, keepdims=True)
                thr_own = pltpu.bitcast(
                    pltpu.bitcast(mn, jnp.int32) & ~2047, jnp.float32
                )
                # own block sparse (< k valid): fall back to the window max
                sparse = mn >= _BIG / 2
                hi0 = jnp.where(sparse, hi_full, thr_own)
            else:
                iters = _BISECT
                d2cmp = d2
                # tighter initial bound: the query block's own max distance
                # bounds the k-th smallest whenever the block has >= k
                # valid candidates (k=20 of 128); fall back to the window
                # max when it does not
                validc = validd & center_row
                cnt_c = jnp.sum(
                    jnp.where(validc, 1.0, 0.0), axis=0, keepdims=True
                )
                hi_c = jnp.max(
                    jnp.where(validc, d2, 0.0), axis=0, keepdims=True
                )
                hi0 = jnp.where(cnt_c >= kf, hi_c, hi_full)
            lo0 = jnp.zeros_like(hi0)

            def bisect(carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                c = jnp.sum(
                    jnp.where(d2cmp <= mid, 1.0, 0.0), axis=0, keepdims=True
                )
                enough = c >= kf
                return jnp.where(enough, lo, mid), jnp.where(enough, mid, hi)

            # UNROLLED (iters is static): see the sweep branch note —
            # fori_loop costs ~0.9 ms/pass of Mosaic loop overhead here
            carry = (lo0, hi0)
            for _ in range(iters):
                carry = bisect(carry)
            lo, thr = carry
            inside = jnp.where(d2cmp <= thr, 1.0, 0.0)
            cnt = jnp.sum(inside, axis=0, keepdims=True)
            sum_d = jnp.sum(
                inside * jnp.sqrt(jnp.maximum(d2, 0.0)), axis=0, keepdims=True
            )
            extra = jnp.maximum(cnt - kf, 0.0)
            # at-threshold correction stand-in for the overcounted
            # extras: sqrt(thr) when the band is tight (bisect@13 and
            # csel's own-block bound — extras cluster just below thr),
            # but the BAND MIDPOINT (sqrt(thr)+sqrt(lo))/2 for csel's
            # sparse-own-block FALLBACK, whose band after only _CSEL_R
            # iterations is wide enough that sqrt(thr) undershoots the
            # mean by up to 4x (measured; the midpoint halves the band
            # error — tests/test_pallas_window.py sparse-own-block test).
            thr_d = jnp.sqrt(jnp.maximum(thr, 0.0))
            if kmode == "csel":
                mid_d = 0.5 * (thr_d + jnp.sqrt(jnp.maximum(lo, 0.0)))
                stand_in = jnp.where(sparse, mid_d, thr_d)
            else:
                stand_in = thr_d
            mean = jnp.where(
                cnt >= kf,
                (sum_d - extra * stand_in) / kf,
                sum_d / jnp.maximum(cnt, 1.0),
            )
            # a wide fallback band can still overshoot the correction;
            # the true mean is nonnegative
            mean = jnp.maximum(mean, 0.0)
            cnt = jnp.minimum(cnt, kf)
        results.append(
            jnp.concatenate(
                [moments, mean, cnt, cnt2, jnp.zeros((3, _B), jnp.float32)]
            )
        )
    mom_ref[0, :, :] = jnp.concatenate(results, axis=1)


def _call_batched(sx, sy, sz, sv, radius, radius2, *, k, window_blocks,
                  interpret, kmode, direction=0, d2mode="highest",
                  moments_on=True):
    """Batched kernel invocation:
    (B, N) rows -> mean (B, N), cnt (B, N), mom (B, 10, N), cnt2 (B, N).

    One pallas_call with a (batch, num_blocks) grid; the double-buffered
    window DMA prefetches across batch boundaries (linear step order).
    """
    batch, n = sx.shape
    qb = _B
    # APC_FORCE_G overrides the grid grouping for ablations (compile-time
    # knob; tools/profile_compile_bisect.py uses it to bisect the cold
    # compile cost of _G x kmode combinations in fresh subprocesses).
    import os as _os

    _forced = int(_os.environ.get("APC_FORCE_G", "0")) or None
    for g in ((_forced,) if _forced else (_G, 8, 4)):
        if n % (g * _B) == 0:
            qb = g * _B
            break
    assert n % qb == 0, f"sorted length {n} not a multiple of {qb}"
    nb = n // qb
    if window_blocks > 0:
        # symmetric halo of window_blocks 128-point blocks per side
        halo = window_blocks * 128
        window = qb + 2 * halo
        pad = halo
        dma_off = 0  # array pre-padded by halo; window starts at step*qb
        qoff = halo
    else:
        # window_blocks == 0, the FAST profile: a ONE-SIDED 128-point halo
        # — each 128-query block sees its own block plus the next
        # (direction=0) or previous (direction=1) block: 256 candidates at
        # ~2/3 the kernel cost of the symmetric 384. A symmetric 64-point
        # halo is not expressible: Mosaic requires 128-aligned slice
        # offsets (a 64-offset query slice fails to lower), so passes
        # ALTERNATE direction instead (ops/window.py) — the union over two
        # opposite-sided passes covers what one symmetric window would.
        halo = 128
        window = qb + 128
        pad = 128
        dma_off = 128 if direction == 0 else 0
        qoff = 0 if direction == 0 else 128

    # Non-finite coordinates would poison the distance matmul (the kernel
    # folds invalid-candidate exclusion into the contraction, and NaN*0 is
    # NaN — one NaN candidate turns its whole window's min-sweep to NaN).
    # Masked-out points KEEP their NaN positions (mask-only pipeline), so
    # sanitize here: non-finite rows become invalid points at the origin.
    sx = sx.astype(jnp.float32)
    sy = sy.astype(jnp.float32)
    sz = sz.astype(jnp.float32)
    finite = jnp.isfinite(sx) & jnp.isfinite(sy) & jnp.isfinite(sz)
    valid_f = (sv & finite).astype(jnp.float32)
    zero = jnp.zeros_like(sx)
    feat = jnp.stack(
        [
            jnp.where(finite, sx, zero),
            jnp.where(finite, sy, zero),
            jnp.where(finite, sz, zero),
            (1.0 - valid_f) * _BIG,
        ],
        axis=-2,
    )  # (B, 4, N)
    feat = jnp.pad(feat, ((0, 0), (0, 0), (pad, pad)))
    # padded candidate columns must be invalid -> BIG in feature row 3
    pad_mask = jnp.zeros(n + 2 * pad, jnp.float32).at[pad : pad + n].set(1.0)
    feat = feat.at[:, 3, :].add((1.0 - pad_mask) * _BIG)

    r2 = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(radius, jnp.float32) ** 2, (batch,)),
            jnp.broadcast_to(jnp.asarray(radius2, jnp.float32) ** 2, (batch,)),
        ],
        axis=1,
    )  # (batch, 2)

    packed = pl.pallas_call(
        functools.partial(
            _kernel, k=k, window=window, qb=qb, kmode=kmode,
            dma_off=dma_off, qoff=qoff, d2mode=d2mode,
            moments_on=moments_on,
        ),
        grid=(batch, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # write each step's (16, qb) stat block straight into its column
        # span of the (16, n) output — round 4: the previous
        # (batch, nb*16, qb) layout needed a full XLA
        # reshape/transpose/reshape after the call (~3.3 MB HBM shuffle
        # per pass at 51k); BlockSpec expresses the layout directly.
        out_specs=pl.BlockSpec(
            (1, 16, qb), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 16, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _F, window), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(r2, feat)

    return packed[:, 10], packed[:, 11], packed[:, :10], packed[:, 12]


@functools.lru_cache(maxsize=32)
def _make_window_stats(k: int, window_blocks: int, interpret: bool,
                       kmode: str, direction: int, d2mode: str,
                       moments_on: bool = True):
    """custom_vmap wrapper per static config: vmapping routes to the batch
    grid dimension instead of Mosaic's (unsupported) pallas batching."""

    @jax.custom_batching.custom_vmap
    def fn(sx, sy, sz, sv, radius, radius2):
        mean, cnt, mom, cnt2 = _call_batched(
            sx[None], sy[None], sz[None], sv[None], radius, radius2,
            k=k, window_blocks=window_blocks, interpret=interpret,
            kmode=kmode, direction=direction, d2mode=d2mode,
            moments_on=moments_on,
        )
        return mean[0], cnt[0], mom[0], cnt2[0]

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, sx, sy, sz, sv, radius, radius2):
        bx, by, bz, bv, br, br2 = in_batched

        def bcast(x, is_b):
            return x if is_b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        out = _call_batched(
            bcast(sx, bx), bcast(sy, by), bcast(sz, bz),
            bcast(sv, bv),
            bcast(jnp.asarray(radius, jnp.float32), br),
            bcast(jnp.asarray(radius2, jnp.float32), br2),
            k=k, window_blocks=window_blocks, interpret=interpret,
            kmode=kmode, direction=direction, d2mode=d2mode,
            moments_on=moments_on,
        )
        return out, (True, True, True, True)

    return fn


def window_stats_pallas(
    sorted_x: jax.Array,
    sorted_y: jax.Array,
    sorted_z: jax.Array,
    sorted_valid: jax.Array,
    radius: jax.Array | float,
    k: int = 20,
    window_blocks: int = 2,
    interpret: bool = False,
    kmode: str = "sweep",
    direction: int = 0,
    radius2=None,
    d2mode: str = "highest",
    moments: bool = True,
) -> Tuple[jax.Array, ...]:
    """Windowed stats over curve-sorted planar rows.

    vmap-safe: batching maps onto a leading grid dimension of the same
    kernel (one level; nested vmap is unsupported).

    Args:
        sorted_x/y/z: float32[N] positions in curve order (N % 128 == 0).
        sorted_valid: bool[N].
        radius: in-radius threshold for the covariance moments (traced).
        k: neighbor count for the mean-distance statistic (static).
        window_blocks: candidate radius in 128-point blocks (static);
            0 = fast profile: a one-sided 128-point halo (own block plus
            the next or previous block per ``direction``) — 256-wide
            windows at ~2/3 the kernel cost of window_blocks=1.
        direction: for window_blocks == 0 only: 0 = forward halo (next
            block), 1 = backward (previous block). Callers running
            multiple curve passes should alternate (ops/window.py).
        interpret: run in Pallas interpreter mode (CPU tests).
        kmode: 'sweep' = exact k min-extractions (oracle-parity; after
            unrolling it costs the same as bisect at k=20); 'bisect' =
            threshold bisection whose mean is within the bisection band of
            the sweep result — its cost is k-INDEPENDENT, so prefer it for
            large k; 'csel' (round 4, the production default) = own-block
            threshold select: k min-sweeps over only the query's own
            128-row center slice give the threshold (exact whenever the k
            nearest sit in the own block — the curve-order common case),
            refined by _CSEL_R=2 full-window bisections + the at-threshold
            correction. ~2-3x cheaper than 'sweep' at k=20.
        radius2: optional second in-radius threshold (traced). When given,
            a fourth output — the in-radius2 candidate count [N] — is
            returned, letting radius-outlier removal ride the same sweep
            (one compare + row-reduction, ~free).
        d2mode: 'highest' = Precision.HIGHEST distance matmul (6 bf16 MXU
            passes, ~2^-24); 'fast3' = dual hi/lo bf16 split dropping the
            lo*lo term (3 passes, ~2^-16 of the window span^2 — see
            _dot_fast3; below the k-select packing noise).
        moments: when False, skip the covariance-moment matmul entirely
            (3 MXU passes) and emit zero moment rows — for merge-free
            later passes when normals come from pass 0 only
            (ops/window._fused_passes entries_merge=False).
    Returns:
        (mean_knn_dist float32[N], knn_count float32[N],
         moments float32[10, N]) — moments rows are
         [n, Sx, Sy, Sz, Sxx, Syy, Szz, Sxy, Sxz, Syz] over in-radius
         candidates (self included), taken about an ARBITRARY per-block
         origin: only origin-invariant consumers (the count and the
         centered covariance entries, ops/window._entries_from_moments)
         may use them. Entries for invalid queries are meaningless;
         callers mask.
    """
    if kmode not in ("sweep", "bisect", "csel"):
        raise ValueError(
            f"kmode must be 'sweep', 'bisect' or 'csel', got {kmode!r}"
        )
    if window_blocks > 7:
        # the sweep/csel paths pack the candidate row index into the low
        # 11 mantissa bits of d2 ((d2i & ~2047) | rows); sub_window =
        # (2*wb + 1) * 128 must stay <= 2048 or row indices alias and
        # distances silently corrupt. wb=7 -> 1920 rows is the last safe
        # value (presets use <= 2).
        raise ValueError(
            f"window_blocks={window_blocks} exceeds 7: the 11-bit "
            "mantissa row packing supports sub-windows up to 2048 rows "
            "((2*wb+1)*128 <= 2048)"
        )
    if d2mode not in ("highest", "fast3"):
        raise ValueError(f"d2mode must be 'highest' or 'fast3', got {d2mode!r}")
    fn = _make_window_stats(
        k, window_blocks, interpret, kmode,
        direction if window_blocks == 0 else 0, d2mode, moments,
    )
    out = fn(
        sorted_x, sorted_y, sorted_z, sorted_valid,
        jnp.asarray(radius, jnp.float32),
        jnp.asarray(0.0 if radius2 is None else radius2, jnp.float32),
    )
    # 3-tuple unless the caller asked for the second-radius count
    return out if radius2 is not None else out[:3]
