"""Exact duplicate-coordinate removal.

Replaces the reference's triple-backend ``remove_duplicates``
(reference: utils.py:509-547 — numpy ``np.unique(axis=0)``, torch
``torch.unique(dim=0)``, Open3D ``remove_duplicated_points``) with one
sort-based kernel over bit-exact coordinate keys (a variadic lexsort is a
single 0.2 ms pass at 131k points, PERF_NOTES.md). Semantics implemented
are the *intent* (first occurrence of each distinct coordinate survives, in
original buffer order) — NOT the reference's latent torch bug of passing
inverse indices to ``select_by_index`` (utils.py:538-542, see SURVEY.md
§7 "quirks to NOT replicate").

Mask-only: survivors stay in place; nothing is compacted or reordered.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer

__all__ = ["remove_duplicates", "duplicate_mask"]

_SENTINEL = jnp.uint32(0xFFFFFFFF)


def _coordinate_keys(positions: jax.Array, valid: jax.Array):
    """Bit-exact uint32 keys per planar row; -0.0 canonicalized to +0.0 so
    that -0.0 == 0.0 dedups like ``np.unique`` does. Invalid rows get an
    all-ones sentinel so they sort last and never match a live key."""
    canon = positions + 0.0  # -0.0 + 0.0 -> +0.0; NaN unchanged
    bits = jax.lax.bitcast_convert_type(canon, jnp.uint32)
    bits = jnp.where(valid[None, :], bits, _SENTINEL)
    return bits[0], bits[1], bits[2]


def duplicate_mask(positions: jax.Array, valid: jax.Array) -> jax.Array:
    """bool[capacity]: True for the first occurrence of each live coordinate."""
    kx, ky, kz = _coordinate_keys(positions, valid)
    n = positions.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    # ONE variadic sort carries the payload (index, validity) with the keys
    # — stable, so equal coordinates keep original index order and the
    # first element of each group is the first occurrence in buffer order.
    # (~4x cheaper than lexsort + post-sort gathers on this backend.)
    sx, sy, sz, sidx, sval = jax.lax.sort(
        (kx, ky, kz, idx, valid), num_keys=3, is_stable=True
    )
    first = jnp.ones(n, dtype=bool)
    same_as_prev = (
        (sx[1:] == sx[:-1]) & (sy[1:] == sy[:-1]) & (sz[1:] == sz[:-1])
    )
    first = first.at[1:].set(jnp.logical_not(same_as_prev))
    keep_sorted = first & sval
    # restore original order by sorting on the carried index (a
    # permutation: unstable == stable, minus the implicit iota tiebreak)
    _, keep = jax.lax.sort((sidx, keep_sorted), num_keys=1, is_stable=False)
    return keep


def remove_duplicates(buf: ScanBuffer) -> ScanBuffer:
    """Mask out all but the first occurrence of duplicated coordinates."""
    return buf.with_mask(duplicate_mask(buf.positions, buf.mask))
