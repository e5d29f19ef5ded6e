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
execution: scratch carries (open-segment partial sum, its global slot)
across steps in VMEM, and each step DMA-writes its closed segments at a
dynamic offset. Slots beyond a step's closed count are written as zeros
and later overwritten by the steps that own them (writes are ordered);
the final open segment is returned as a separate small output and folded
in by the caller.

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

__all__ = ["segmented_sums_pallas"]

_BLK = 512
_C = 8


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


def _kernel(values_hbm, flags_hbm, sums_hbm, state_ref, vals_vmem, flags_vmem,
            carry_vmem, gid_ref, rmw_vmem, sems):
    b = pl.program_id(0)
    i = pl.program_id(1)

    in_dma = pltpu.make_async_copy(
        values_hbm.at[b, :, pl.ds(i * _BLK, _BLK)], vals_vmem, sems.at[0]
    )
    fl_dma = pltpu.make_async_copy(
        flags_hbm.at[b, :, pl.ds(i * _BLK, _BLK)], flags_vmem, sems.at[1]
    )
    in_dma.start()
    fl_dma.start()

    # the grid iterates the block axis fastest: i == 0 is the start of each
    # batch element, so the open-run state resets per scan
    @pl.when(i == 0)
    def _():
        carry_vmem[:, :] = jnp.zeros((_C, 1), jnp.float32)
        gid_ref[0] = 0

    in_dma.wait()
    fl_dma.wait()

    flags = flags_vmem[:, :]  # (1, BLK) f32 0/1 run-start flags
    # inclusive cumsum via triangular matmul: cs[j] = sum_{i<=j} flags[i].
    # 0/1 operands are exact in bf16; f32 accumulation keeps counts exact.
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 1)
    tri = (rows_i <= cols_i).astype(jnp.float32)
    cs = jax.lax.dot_general(
        flags, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, BLK), values in [0, S_new]

    # one_hot[j, s] = (cs[j] == s): contributions of element j to local run
    # s. Slot axis is BLK+128 wide: when every element opens a run the open
    # run's slot equals BLK (one past the element count).
    slot_i = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK + 128), 1)
    one_hot = (
        cs.reshape(_BLK, 1).astype(jnp.int32) == slot_i
    ).astype(jnp.float32)

    # partials[c, s] = sum_j values[c, j] * one_hot[j, s]. Values include
    # coordinates and integer-index channels that bf16 would round, but
    # one_hot is 0/1: 3-term bf16 split of the values is f32-exact at half
    # the HIGHEST pass count.
    partials = _dot3_exact(
        vals_vmem[:, :], one_hot,
        dims=(((1,), (0,)), ((), ())),
    )  # (C, BLK+128)

    s_new = cs[0, _BLK - 1].astype(jnp.int32)  # runs started in this block
    gid = gid_ref[0]

    # fold the carried open-run partial into local slot 0 (scatter-add is
    # not lowerable in Mosaic; a masked broadcast add is)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (_C, _BLK + 128), 1) == 0
    partials = partials + jnp.where(col0, carry_vmem[:, :], 0.0)

    # new carry = slot s_new (the run left open at block end); dynamic
    # column extraction as a masked row-reduction (dynamic_slice of a
    # value is not lowerable in Mosaic)
    col = jax.lax.broadcasted_iota(jnp.int32, (_C, _BLK + 128), 1)
    carry_vmem[:, :] = jnp.sum(
        jnp.where(col == s_new, partials, 0.0), axis=1, keepdims=True
    )

    # keep slots [0, s_new) — closed runs; zero the rest
    partials = jnp.where(col < s_new, partials, 0.0)

    # HBM DMA offsets must be 128-aligned and gid is arbitrary: write via a
    # read-modify-write of the aligned window [aligned, aligned+BLK+128),
    # shifting partials to column offset gid-aligned with a 0/1 matmul
    # (dynamic_update_slice is not lowerable). The sequential grid makes
    # the RMW race-free.
    aligned = pl.multiple_of((gid // 128) * 128, 128)
    off = gid - aligned  # in [0, 128)
    src_j = jax.lax.broadcasted_iota(jnp.int32, (_BLK + 128, _BLK + 256), 0)
    dst_t = jax.lax.broadcasted_iota(jnp.int32, (_BLK + 128, _BLK + 256), 1)
    shift = (dst_t - src_j == off).astype(jnp.float32)
    shifted = _dot3_exact(
        partials, shift,
        dims=(((1,), (0,)), ((), ())),
    )  # (C, BLK+256)

    rd = pltpu.make_async_copy(
        sums_hbm.at[b, :, pl.ds(aligned, _BLK + 256)], rmw_vmem, sems.at[2]
    )
    rd.start()
    rd.wait()
    col_g = aligned + jax.lax.broadcasted_iota(jnp.int32, (_C, _BLK + 256), 1)
    rmw_vmem[:, :] = jnp.where(col_g < gid, rmw_vmem[:, :], shifted)
    wr = pltpu.make_async_copy(
        rmw_vmem, sums_hbm.at[b, :, pl.ds(aligned, _BLK + 256)], sems.at[2]
    )
    wr.start()
    wr.wait()

    gid_ref[0] = gid + s_new

    # final open-run state (the batch element's last step wins): row 0 =
    # gid, 1.. = carry
    state_ref[0, :, :] = jnp.concatenate(
        [
            jnp.full((1, 128), (gid + s_new).astype(jnp.float32)),
            jnp.broadcast_to(carry_vmem[:, :], (_C, 128)),
        ]
    )


def _call_batched(values, run_start, interpret):
    """(batch, C, N), (batch, N) -> (batch, 8, N) per-run sums."""
    batch, c, n = values.shape
    assert c <= _C and n % _BLK == 0, (c, n)
    vals = (
        jnp.zeros((batch, _C, n), jnp.float32)
        .at[:, :c].set(values.astype(jnp.float32))
    )
    flags = run_start.astype(jnp.float32).reshape(batch, 1, n)
    # element 0 always opens run 0; its flag must be 0 so cs starts at 0
    flags = flags.at[:, 0, 0].set(0.0)

    nb = n // _BLK
    sums, state = pl.pallas_call(
        _kernel,
        grid=(batch, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, _C + 1, 128), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, _C, n + _BLK + 256), jnp.float32),
            jax.ShapeDtypeStruct((batch, _C + 1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_C, _BLK), jnp.float32),
            pltpu.VMEM((1, _BLK), jnp.float32),
            pltpu.VMEM((_C, 1), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((_C, _BLK + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(vals, flags)

    # fold each batch element's final open run in at its slot (one-hot add
    # keeps this vmap-free and shape-static)
    final_gid = state[:, 0, 0].astype(jnp.int32)  # (batch,)
    final_carry = state[:, 1:, 0]  # (batch, C)
    cols = jnp.arange(n + _BLK + 256, dtype=jnp.int32)
    onehot = (cols[None, :] == final_gid[:, None]).astype(jnp.float32)
    sums = sums + onehot[:, None, :] * final_carry[:, :, None]
    sums = sums[:, :, :n]
    # slots beyond the final run are uninitialized HBM — zero them
    live = jnp.arange(n, dtype=jnp.int32)[None, None, :] <= final_gid[:, None, None]
    return jnp.where(live, sums, 0.0)


@functools.lru_cache(maxsize=4)
def _make_segmented_sums(interpret: bool):
    """custom_vmap wrapper: vmapping maps onto a batch grid dimension (the
    sequential run-state carry resets at each batch element's first block),
    instead of Mosaic's unsupported pallas batching."""

    @jax.custom_batching.custom_vmap
    def fn(values, run_start):
        return _call_batched(values[None], run_start[None], interpret)[0]

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, values, run_start):
        bv, bf = in_batched

        def bcast(x, is_b):
            return x if is_b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        out = _call_batched(
            bcast(values, bv), bcast(run_start, bf), interpret
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
        values: float32[C<=8, N] channel rows (N % 512 == 0); rows beyond
            the caller's channels should be zero.
        run_start: bool/float[N]; True where a new run begins (element 0's
            flag is ignored — it always starts run 0).
    Returns:
        float32[8, N] run sums: row block [.., s] holds the sum of run s;
        entries beyond the last run are zero.
    """
    return _make_segmented_sums(interpret)(values, run_start)
