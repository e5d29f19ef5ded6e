"""Non-finite point masking.

Replaces Open3D's ``remove_non_finite_points`` kernel (reference:
pointcloud_preprocessor.py:466-472): instead of compacting the buffer, rows
with NaN/Inf positions are masked out — compaction is deferred to egress
(SURVEY.md §7 design stance).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.scan import ScanBuffer

__all__ = ["mask_non_finite"]


def mask_non_finite(
    buf: ScanBuffer, remove_nan: bool = True, remove_inf: bool = True
) -> ScanBuffer:
    """Mask out rows whose positions contain NaN (and/or) Inf.

    ``remove_nan``/``remove_inf`` are static Python bools (they change graph
    structure, like the reference's stage toggles).
    """
    if not remove_nan and not remove_inf:
        return buf
    x, y, z = buf.x, buf.y, buf.z
    if remove_nan and remove_inf:
        ok = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    elif remove_nan:
        ok = ~(jnp.isnan(x) | jnp.isnan(y) | jnp.isnan(z))
    else:
        ok = ~(jnp.isinf(x) | jnp.isinf(y) | jnp.isinf(z))
    return buf.with_mask(ok)
