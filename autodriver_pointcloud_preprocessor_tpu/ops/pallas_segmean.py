"""Pallas TPU kernel: segmented sums over sorted runs (voxel reduction).

``jax.ops.segment_sum`` costs ~1.1 ms per [131k] channel on this backend
(scatter-add), and the voxel stage needs 6+ of them (PERF_NOTES.md). This
kernel exploits what the scatter can't: after the voxel sort, segments are
CONTIGUOUS RUNS, so a block's per-segment sums are one MXU matmul
``values(C, BLK) @ one_hot(BLK, BLK)^T`` where ``one_hot[j, s] =
(run_index(j) == s)`` — and the run index is itself a matmul (flags times
an upper-triangular ones matrix: exact 0/1 arithmetic, no precision pass
needed).

Runs crossing block boundaries are handled with the TPU grid's sequential
execution: scratch carries (open-segment partial sum, its global slot,
and the pending 128-column output tile) across steps in VMEM.

Round-3 pipelining redesign history (this kernel is DMA-LATENCY-bound —
count round trips per step, not bytes):
* v1 (0.53 ms @131k): three serialized HBM round trips per 512-column
  step (input DMA, output RMW read, output write) plus a shift matmul.
* v2: fold the global-slot shift into the one-hot comparison; append-only
  output writes (the incomplete trailing 128-column tile stays in VMEM as
  carry); double-buffered input DMAs. Still ~0.55 ms in-context at 131k:
  the per-step output write was started AND waited in the same step, and
  256 grid steps each paid a DMA-wait latency the double buffer couldn't
  hide behind ~1 us of compute.
* v3 (this version): each grid step processes SUB=4 sub-blocks of 512
  columns from ONE (C, 2048)-wide double-buffered input DMA (4x fewer
  input round trips, 4x more compute to hide them behind), sub-block
  results are staged into a step-local VMEM window, and ONE output write
  per step is started fire-and-forget — the NEXT step waits it before
  re-staging. The channel dim stays padded to 8 rows for every DMA-facing
  array: Mosaic requires second-minor DMA slices to be 8-aligned (a
  6-row ``memref_slice`` fails to lower), and the MXU pads (C, ...)
  operands to 8 sublanes regardless, so the 8-row compute is free.

Channel convention (C <= 8, float32): callers typically pack
[valid(count), x, y, z, attr..., first_index*flag]. Because the voxel sort
is stable with the original index as a carried row, the first element of
every run holds the smallest original index — multiplying it by the run
flag makes "first index per segment" just another summed channel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_compact_pallas", "segmented_sums_pallas"]

_BLK = 512
_FORCE_SUB = None  # profiling hook: force the sub-blocks-per-step choice


def _dot3_exact(a, b01, dims):
    """f32-exact ``dot_general(a, b01)`` in 3 single-pass bf16 matmuls.

    Valid ONLY when ``b01`` is a 0/1 matrix (exact in bf16): split ``a``
    into three bf16 terms covering the full 24-bit mantissa
    (a = hi + mid + lo exactly) and sum the three exact partial products
    in f32. Halves the MXU passes vs ``Precision.HIGHEST`` (6 passes);
    Mosaic does not support ``Precision.HIGH``.
    """
    bh = b01.astype(jnp.bfloat16)
    hi = a.astype(jnp.bfloat16)
    r = a - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for part in (hi, mid, lo):
        d = jax.lax.dot_general(
            part, bh, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


_W = _BLK + 128  # per-sub-block partials window: off (< 128) + up to BLK runs


def _make_kernel(c: int, sub: int, compact: bool = False):
    """Kernel body for ``c`` channels and ``sub`` 512-column sub-blocks
    per grid step (step width = sub * 512).

    ``compact=True`` (round 5, stream compaction): ``flags`` is the LIVE
    MASK instead of run starts. Each live row's values land at column
    rank(row) = the EXCLUSIVE cumsum of the mask, and dead rows are
    dropped by folding the mask into the one-hot (their row of the
    matmul is zero) — so callers skip both the host-side flag shift and
    the per-channel ``where`` zeroing (~0.1 ms of XLA elementwise at
    131k x 8 channels; NaN coordinates on dead rows never reach the
    sum)."""
    blk_w = sub * _BLK
    stage_w = blk_w + 128  # staged output window per step

    def _kernel(values_hbm, flags_hbm, sums_hbm, state_ref, vals2, flags2,
                carry_vmem, pend_vmem, stage_vmem, smem, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        nb = pl.num_programs(1)
        nbatch = pl.num_programs(0)

        def in_dma(slot, blk):
            return pltpu.make_async_copy(
                values_hbm.at[b, :, pl.ds(blk * blk_w, blk_w)],
                vals2.at[slot], sems.at[slot],
            )

        def fl_dma(slot, blk):
            return pltpu.make_async_copy(
                flags_hbm.at[b, :, pl.ds(blk * blk_w, blk_w)],
                flags2.at[slot], sems.at[2 + slot],
            )

        # the grid iterates the block axis fastest: i == 0 is the start of
        # each batch element — reset the run state and warm up the pipeline
        @pl.when(i == 0)
        def _():
            in_dma(0, 0).start()
            fl_dma(0, 0).start()
            carry_vmem[:, :] = jnp.zeros((c, 1), jnp.float32)
            pend_vmem[:, :] = jnp.zeros((c, 128), jnp.float32)
            smem[0] = 0

        slot = jax.lax.rem(i, 2)

        # prefetch the next block while this one computes (double buffer)
        @pl.when(i + 1 < nb)
        def _():
            nslot = jax.lax.rem(i + 1, 2)
            in_dma(nslot, i + 1).start()
            fl_dma(nslot, i + 1).start()

        in_dma(slot, i).wait()
        fl_dma(slot, i).wait()

        # the previous step's output write (possibly the previous batch
        # element's last step) must land before this step re-stages. One
        # step of DMA-wait + compute hides a ~70 KB write entirely.
        @pl.when(b + i > 0)
        def _():
            pltpu.make_async_copy(
                stage_vmem,
                sums_hbm.at[
                    smem[2], :, pl.ds(pl.multiple_of(smem[1], 128), stage_w)
                ],
                sems.at[4],
            ).wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 1)
        tri = (rows_i <= cols_i).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (c, _W), 1)
        slot_i = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _W), 1)

        gid = smem[0]
        base0 = pl.multiple_of((gid // 128) * 128, 128)
        carry = carry_vmem[:, :]
        pend = pend_vmem[:, :]

        for s in range(sub):
            flags = flags2[slot][:, s * _BLK:(s + 1) * _BLK]  # (1, BLK) 0/1
            vals = vals2[slot][:, s * _BLK:(s + 1) * _BLK]
            # inclusive cumsum via triangular matmul: cs[j] = sum_{i<=j}
            # flags[i]. 0/1 operands are exact in bf16; f32 accumulation
            # keeps counts exact.
            cs = jax.lax.dot_general(
                flags, tri, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, BLK), values in [0, S_new]

            s_new = cs[0, _BLK - 1].astype(jnp.int32)  # runs started here
            base_s = pl.multiple_of((gid // 128) * 128, 128)
            off = gid - base_s  # in [0, 128)

            if compact:
                # live row at rank r -> column r: EXCLUSIVE cumsum. A dead
                # row shares the next live row's target column but its
                # values are zeroed here in VMEM (dead rows carry NaN
                # coordinates in the mask-only pipeline; NaN would poison
                # the matmul through its zero one-hot row otherwise).
                vals = jnp.where(flags > 0.0, vals, 0.0)
                cs_t = cs - flags
            else:
                cs_t = cs
            # one_hot[j, t] = (cs_t[j] + off == t): the 128-alignment shift
            # folds into the comparison, so the main matmul emits partials
            # already at window-local columns — no separate shift matmul.
            one_hot = (
                cs_t.reshape(_BLK, 1).astype(jnp.int32) + off == slot_i
            ).astype(jnp.float32)

            # partials[ch, t] = sum_j vals[ch, j] * one_hot[j, t]. Values
            # include coordinates that bf16 would round, but one_hot is
            # 0/1: 3-term bf16 split is f32-exact at half the HIGHEST
            # pass count.
            partials = _dot3_exact(
                vals, one_hot, dims=(((1,), (0,)), ((), ())),
            )  # (C, _W)

            # fold the carried open-run partial at column `off` (the
            # sub-block's first element continues it: flags[0] of the
            # whole buffer is forced 0 upstream)
            partials = partials + jnp.where(col == off, carry, 0.0)
            # fold the pending (incomplete) output tile into columns
            # [0, 128)
            partials = partials + jnp.concatenate(
                [pend, jnp.zeros((c, _W - 128), jnp.float32)], axis=1
            )

            end = off + s_new  # filled columns; the open run sits AT end
            # new open-run carry = column `end` (masked reduction:
            # dynamic value slices are not lowerable in Mosaic)
            carry = jnp.sum(
                jnp.where(col == end, partials, 0.0), axis=1, keepdims=True
            )
            closed = jnp.where(col < end, partials, 0.0)

            # the incomplete tail tile stays as the next sub-block's
            # pending
            tiles_done = end // 128
            pend = closed[:, 4 * 128:]
            for k in range(3, -1, -1):
                pend = jnp.where(
                    tiles_done == k, closed[:, k * 128:(k + 1) * 128], pend
                )

            # stage this sub-block's window at its step-relative, 128-
            # aligned column. Later sub-blocks re-stage their overlap with
            # UPDATED accumulations (sequential stores: last write wins),
            # so every staged column below the step's final open run is
            # final when the step's single output write ships.
            rel = pl.multiple_of(base_s - base0, 128)
            stage_vmem[:, pl.ds(rel, _W)] = closed

            gid = gid + s_new

        carry_vmem[:, :] = carry
        pend_vmem[:, :] = pend

        # one fire-and-forget output write per step; the next step (or the
        # final-step wait below) completes it. Columns past the committed
        # tiles carry in-progress values and are overwritten by the next
        # step's write at its (>= this step's committed-tile boundary)
        # base — sequential grid => ordered writes.
        wr = pltpu.make_async_copy(
            stage_vmem, sums_hbm.at[b, :, pl.ds(base0, stage_w)], sems.at[4]
        )
        wr.start()
        smem[0] = gid
        smem[1] = base0
        smem[2] = b

        @pl.when((b == nbatch - 1) & (i == nb - 1))
        def _():
            wr.wait()

        # final state (the batch element's last step wins): row 0 = gid,
        # rows 1..C = open carry, rows C+1..2C = pending tile
        state_ref[0, :, :] = jnp.concatenate(
            [
                jnp.full((1, 128), gid.astype(jnp.float32)),
                jnp.broadcast_to(carry, (c, 128)),
                pend,
            ]
        )

    return _kernel, stage_w


def _call_batched(values, run_start, interpret, compact=False):
    """(batch, C, N), (batch, N) -> (batch, C, N) per-run sums."""
    batch, c, n = values.shape
    assert c <= 8 and n % _BLK == 0, (c, n)
    # Sub-blocks per grid step (ablated on real chip, tools/profile_r5_sub.py
    # round 5): compact mode wins at 8 (0.185 vs 0.199 ms @131k — fewer grid
    # steps amortize the per-step overhead; no pending-tile work to grow),
    # segmean at 4 (0.095 vs 0.114 — the carry/pending update tax grows with
    # the step width). 512-wide steps when the capacity is not a multiple.
    # _FORCE_SUB is the ablation hook.
    best = 8 if compact else 4
    sub = next(
        (s for s in (_FORCE_SUB, best, 4, 1) if s and n % (s * _BLK) == 0), 1
    )
    vals = values.astype(jnp.float32)
    # Mosaic DMA slices must be 8-aligned on the second-minor dim; the MXU
    # pads to 8 sublanes anyway, so run the kernel at 8 channels and slice
    # the caller's c rows back out at the end.
    c_out = c
    if c < 8:
        vals = jnp.pad(vals, ((0, 0), (0, 8 - c), (0, 0)))
        c = 8
    flags = run_start.astype(jnp.float32).reshape(batch, 1, n)
    if not compact:
        # element 0 always opens run 0; its flag must be 0 so cs starts
        # at 0 (compact mode uses the exclusive cumsum — no forcing)
        flags = flags.at[:, 0, 0].set(0.0)

    kernel, stage_w = _make_kernel(c, sub, compact)
    blk_w = sub * _BLK
    nb = n // blk_w
    n_out = n + stage_w + 128
    sums, state = pl.pallas_call(
        kernel,
        grid=(batch, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1 + 2 * c, 128), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, c, n_out), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1 + 2 * c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c, blk_w), jnp.float32),
            pltpu.VMEM((2, 1, blk_w), jnp.float32),
            pltpu.VMEM((c, 1), jnp.float32),
            pltpu.VMEM((c, 128), jnp.float32),
            pltpu.VMEM((c, stage_w), jnp.float32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(vals, flags)

    final_gid = state[:, 0, 0].astype(jnp.int32)  # (batch,)
    final_carry = state[:, 1:1 + c, 0]  # (batch, C)
    final_pend = state[:, 1 + c:, :]  # (batch, C, 128)
    # overlay the final pending tile at its 128-aligned base — the in-HBM
    # columns there hold early-committed partial values
    final_base = (final_gid // 128) * 128

    def overlay(s, p, bse):
        return jax.lax.dynamic_update_slice(s, p, (0, bse))

    sums = jax.vmap(overlay)(sums, final_pend, final_base)
    if compact:
        # compact mode's "open run" past the last live row accumulates
        # only zeros (dead rows) — skip the one-hot carry fold AND the
        # full-width tail zeroing (two (C, N) elementwise passes, ~0.04
        # ms at 131k x 8). Columns beyond the last committed tile hold
        # UNCOMMITTED garbage; the public wrapper (stream_compact_to)
        # re-zeroes by rank over its (smaller) output capacity.
        return sums[:, :c_out, :n]
    # fold each batch element's final open run in at its slot (one-hot add
    # keeps this vmap-free and shape-static)
    cols = jnp.arange(n_out, dtype=jnp.int32)
    onehot = (cols[None, :] == final_gid[:, None]).astype(jnp.float32)
    sums = sums + onehot[:, None, :] * final_carry[:, :, None]
    sums = sums[:, :c_out, :n]
    # slots beyond the final run were never committed — zero them
    live = jnp.arange(n, dtype=jnp.int32)[None, None, :] <= final_gid[:, None, None]
    return jnp.where(live, sums, 0.0)


@functools.lru_cache(maxsize=8)
def _make_segmented_sums(interpret: bool, compact: bool = False):
    """custom_vmap wrapper: vmapping maps onto a batch grid dimension (the
    sequential run-state carry resets at each batch element's first block),
    instead of Mosaic's unsupported pallas batching."""

    @jax.custom_batching.custom_vmap
    def fn(values, run_start):
        return _call_batched(
            values[None], run_start[None], interpret, compact
        )[0]

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, values, run_start):
        bv, bf = in_batched

        def bcast(x, is_b):
            return x if is_b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        out = _call_batched(
            bcast(values, bv), bcast(run_start, bf), interpret, compact
        )
        return out, True

    return fn


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmented_sums_pallas(
    values: jax.Array,
    run_start: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Per-run sums of ``values`` over contiguous runs.

    vmap-safe: batching maps onto a leading kernel grid dimension (one
    level; nested vmap is unsupported).

    Args:
        values: float32[C<=8, N] channel rows (N % 512 == 0).
        run_start: bool/float[N]; True where a new run begins (element 0's
            flag is ignored — it always starts run 0).
    Returns:
        float32[C, N] run sums: [.., s] holds the sum of run s; entries
        beyond the last run are zero.
    """
    return _make_segmented_sums(interpret)(values, run_start)


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_compact_pallas(
    values: jax.Array,
    mask: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Stream-compact channel rows by a live mask (round 5).

    ``out[:, r]`` = the values of the r-th live row (stable order). Columns
    beyond the last 128-aligned committed tile hold UNSPECIFIED values
    (never-written HBM) — mask-disciplined consumers ignore them;
    ``ops.compact.stream_compact_to`` re-zeroes by rank for its public
    ScanBuffer contract. The masking, rank computation (exclusive cumsum)
    and dead-row zeroing happen IN the kernel — callers pass raw rows
    (NaNs on dead rows included) and the mask, no host-side prep. Cost =
    one segmean-kernel pass (~0.14 ms at 131k x 8 channels).

    Args:
        values: float32[C<=8, N] channel rows (N % 512 == 0), unmasked.
        mask: bool[N] live flags.
    Returns:
        float32[C, N] compacted rows.
    """
    return _make_segmented_sums(interpret, compact=True)(values, mask)
