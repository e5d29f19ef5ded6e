"""Pallas TPU kernel for windowed neighborhood statistics.

The XLA formulation of the Hilbert-window kNN ops (ops/window.py)
materializes (N, window) candidate/distance tensors in HBM — ~2 GB of
traffic per pass at 131k points, measured at +57 ms (outliers) / +14 ms
(normals) per scan. This kernel keeps everything in VMEM:

* squared distances for one 128-query block against its 640-candidate
  window come from ONE MXU matmul via the feature trick
  ``[x, y, z, |c|^2, 1, BIG*invalid] . [-2x, -2y, -2z, 1, |q|^2, 1]``
  — invalid-candidate exclusion is folded into the same contraction.
  ``Precision.HIGHEST`` is required: the MXU's default bf16 multiply
  destroys the |c|^2+|q|^2-2cq cancellation (measured: every mean-kNN
  distance off by ~1%, and collided float values made tie-masking skip
  real neighbors);
* mean-of-k-nearest comes from k min-extraction sweeps on the VPU, each
  masking exactly one argmin winner;
* covariance raw moments (for normal PCA) come from a second matmul
  ``G(10, M) @ w(M, B)`` where G rows are [1, x, y, z, xx, yy, zz, xy,
  xz, yz] and w is the in-radius indicator — centering happens outside
  the kernel from the raw moments.

Candidate windows overlap between grid blocks, which BlockSpec cannot
express; all 32 feature rows live in one HBM array and each grid step
DMAs one (32, window) slice into a double-buffered VMEM scratch,
prefetching step i+1's window while computing step i.

HBM traffic per pass drops to ~35 MB. Used by ops/window.py when running
on TPU; the XLA path remains as the portable fallback and the
interpret-mode oracle for tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_stats_pallas"]

_BIG = 1e30
_BISECT = 11  # bisection iterations for kmode='bisect' (band ~ hi / 2^11)
_B = 128  # sweep block: keeps the k-extraction loop carry small (a (window,
          # 512) carry spills VMEM and measures ~1.5x slower end to end)
_G = 4  # sweep blocks per grid step: one wide DMA amortizes per-step cost
_F = 32  # feature rows: 0-7 candidate, 8-23 moment, 24-31 query


def _kernel(
    r2_ref,  # SMEM (batch, 1) squared radius per scan
    feat_hbm,  # ANY (batch, 32, Npad) combined feature rows
    mom_ref,  # VMEM out (16, B): rows 0-9 moments, 10 mean_knn, 11 count
    feat_vmem,  # scratch (2, 32, window) double buffer
    sems,  # DMA semaphores (2,)
    *,
    k: int,
    window: int,
    qb: int,
    kmode: str,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    nbatch = pl.num_programs(0)
    sub_window = window - (qb - _B)  # candidate span per 128-query sub-block
    halo = (sub_window - _B) // 2

    def window_dma(bb, step, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[bb, :, pl.ds(step * qb, window)],
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
    rows = jax.lax.broadcasted_iota(jnp.int32, (sub_window, _B), 0)
    results = []
    for g in range(qb // _B):
        cand = feat[0:8, g * _B : g * _B + sub_window]
        qry = feat[24:32, halo + g * _B : halo + (g + 1) * _B]

        # (sub_window, B) squared distances (+BIG for invalid candidates)
        # in one matmul
        d2 = jax.lax.dot_general(
            cand,
            qry,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = jnp.maximum(d2, 0.0)

        # ---- covariance raw moments over in-radius candidates ----
        w = jnp.where((d2 <= r2) & (d2 < _BIG / 2), 1.0, 0.0)
        moments = jax.lax.dot_general(
            feat[8:24, g * _B : g * _B + sub_window],
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

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
            # ---- mean distance of ~k nearest (threshold bisection) ----
            # ~2x fewer window passes than k min-extraction sweeps: _BISECT
            # iterations narrow a distance threshold t to where
            # count(d2 <= t) ~= k, then one masked sum gives the mean with
            # an at-threshold correction for the overcount. Error bound:
            # the band width hi/2^_BISECT (relative), on an estimate the
            # Hilbert window already makes approximate.
            validd = d2 < _BIG / 2
            kf = jnp.float32(k)
            hi0 = jnp.max(jnp.where(validd, d2, 0.0), axis=0, keepdims=True)
            lo0 = jnp.zeros_like(hi0)

            def bisect(carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                c = jnp.sum(
                    jnp.where(d2 <= mid, 1.0, 0.0), axis=0, keepdims=True
                )
                enough = c >= kf
                return jnp.where(enough, lo, mid), jnp.where(enough, mid, hi)

            # UNROLLED (_BISECT is static): see the sweep branch note —
            # fori_loop costs ~0.9 ms/pass of Mosaic loop overhead here
            carry = (lo0, hi0)
            for _ in range(_BISECT):
                carry = bisect(carry)
            _lo, t = carry
            inside = jnp.where(d2 <= t, 1.0, 0.0)
            cnt = jnp.sum(inside, axis=0, keepdims=True)
            sum_d = jnp.sum(
                inside * jnp.sqrt(jnp.maximum(d2, 0.0)), axis=0, keepdims=True
            )
            extra = jnp.maximum(cnt - kf, 0.0)
            mean = jnp.where(
                cnt >= kf,
                (sum_d - extra * jnp.sqrt(jnp.maximum(t, 0.0))) / kf,
                sum_d / jnp.maximum(cnt, 1.0),
            )
            cnt = jnp.minimum(cnt, kf)
        results.append(
            jnp.concatenate([moments[:10], mean, cnt, moments[12:]])
        )
    mom_ref[0, :, :] = jnp.concatenate(results, axis=1)


def _features(x, y, z, valid_f):
    """Combined (..., 32, N) feature rows: candidate, moment, query."""
    nsq = x * x + y * y + z * z
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    big_invalid = (1.0 - valid_f) * _BIG
    return jnp.stack(
        [
            # 0-7: candidate features
            x, y, z, nsq, one, big_invalid, zero, zero,
            # 8-23: moment features
            one, x, y, z,
            x * x, y * y, z * z,
            x * y, x * z, y * z,
            zero, zero, zero, zero, zero, zero,
            # 24-31: query features
            -2.0 * x, -2.0 * y, -2.0 * z, one, nsq, one, zero, zero,
        ],
        axis=-2,
    )


def _call_batched(sx, sy, sz, sv, radius, *, k, window_blocks, interpret,
                  kmode):
    """Batched kernel invocation: (B, N) rows -> (B, N), (B, N), (B, 10, N).

    One pallas_call with a (batch, num_blocks) grid; the double-buffered
    window DMA prefetches across batch boundaries (linear step order).
    """
    batch, n = sx.shape
    qb = _G * _B if n % (_G * _B) == 0 else _B
    assert n % qb == 0, f"sorted length {n} not a multiple of {qb}"
    nb = n // qb
    halo = window_blocks * 128  # candidate halo on each side (128-pt blocks)
    window = qb + 2 * halo
    pad = halo

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
    feat = _features(
        jnp.where(finite, sx, zero),
        jnp.where(finite, sy, zero),
        jnp.where(finite, sz, zero),
        valid_f,
    )  # (B, 32, N)
    feat = jnp.pad(feat, ((0, 0), (0, 0), (pad, pad)))
    # padded candidate columns must be invalid -> BIG in feature row 5
    pad_mask = jnp.zeros(n + 2 * pad, jnp.float32).at[pad : pad + n].set(1.0)
    feat = feat.at[:, 5, :].add((1.0 - pad_mask) * _BIG)

    r2 = jnp.broadcast_to(
        jnp.asarray(radius, jnp.float32) ** 2, (batch,)
    ).reshape(batch, 1)

    packed = pl.pallas_call(
        functools.partial(_kernel, k=k, window=window, qb=qb, kmode=kmode),
        grid=(batch, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 16, qb), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, nb * 16, qb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _F, window), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(r2, feat)

    packed = (
        packed.reshape(batch, nb, 16, qb)
        .transpose(0, 2, 1, 3)
        .reshape(batch, 16, n)
    )
    return packed[:, 10], packed[:, 11], packed[:, :10]


@functools.lru_cache(maxsize=32)
def _make_window_stats(k: int, window_blocks: int, interpret: bool,
                       kmode: str):
    """custom_vmap wrapper per static config: vmapping routes to the batch
    grid dimension instead of Mosaic's (unsupported) pallas batching."""

    @jax.custom_batching.custom_vmap
    def fn(sx, sy, sz, sv, radius):
        mean, cnt, mom = _call_batched(
            sx[None], sy[None], sz[None], sv[None], radius,
            k=k, window_blocks=window_blocks, interpret=interpret,
            kmode=kmode,
        )
        return mean[0], cnt[0], mom[0]

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, sx, sy, sz, sv, radius):
        bx, by, bz, bv, br = in_batched

        def bcast(x, is_b):
            return x if is_b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        out = _call_batched(
            bcast(sx, bx), bcast(sy, by), bcast(sz, bz),
            bcast(sv, bv),
            bcast(jnp.asarray(radius, jnp.float32), br),
            k=k, window_blocks=window_blocks, interpret=interpret,
            kmode=kmode,
        )
        return out, (True, True, True)

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
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Windowed stats over curve-sorted planar rows.

    vmap-safe: batching maps onto a leading grid dimension of the same
    kernel (one level; nested vmap is unsupported).

    Args:
        sorted_x/y/z: float32[N] positions in curve order (N % 128 == 0).
        sorted_valid: bool[N].
        radius: in-radius threshold for the covariance moments (traced).
        k: neighbor count for the mean-distance statistic (static).
        window_blocks: candidate radius in 128-point blocks (static).
        interpret: run in Pallas interpreter mode (CPU tests).
        kmode: 'sweep' = exact k min-extractions (oracle-parity);
            'bisect' = ~2x-cheaper threshold bisection whose mean is within
            the bisection band of the sweep result (production default via
            PipelineSettings.knn_kmode).
    Returns:
        (mean_knn_dist float32[N], knn_count float32[N],
         moments float32[10, N]) — moments rows are
         [n, Sx, Sy, Sz, Sxx, Syy, Szz, Sxy, Sxz, Syz] over in-radius
         candidates (self included). Entries for invalid queries are
         meaningless; callers mask.
    """
    fn = _make_window_stats(k, window_blocks, interpret, kmode)
    return fn(
        sorted_x, sorted_y, sorted_z, sorted_valid,
        jnp.asarray(radius, jnp.float32),
    )
