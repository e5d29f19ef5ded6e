"""Height/plane-based ground removal (the reference's declared-but-dead path).

The reference declares ``ground_plane`` and ``use_height`` parameters but
never uses them — "add onetime height/ground estimation" is listed as
future work (reference: pointcloud_preprocessor.py:47, :184-185, dead per
SURVEY.md §5). This op makes the capability real: remove points within
``distance_threshold`` of a FIXED plane (no RANSAC) — the cheap path when
the ground plane is known (e.g. calibrated robot frame: z = 0).

One fused elementwise pass; orders of magnitude cheaper than RANSAC when
the extrinsics already level the cloud.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer

__all__ = ["remove_ground_by_height"]


def remove_ground_by_height(
    buf: ScanBuffer,
    plane: jax.Array,
    distance_threshold: jax.Array | float = 0.2,
    signed: bool = False,
) -> ScanBuffer:
    """Mask out points near (or below, when ``signed``) a fixed plane.

    Args:
        plane: float32[4] = [a, b, c, d] with a*x + b*y + c*z + d = 0.
            Reference parameter default [0, 1, 0, 0] (:184).
        distance_threshold: removal band (traced).
        signed: False removes |dist| <= threshold (slab around the plane);
            True removes dist <= threshold (everything below, measured
            along the normal) — the classic "height cut".
    """
    plane = jnp.asarray(plane, jnp.float32)
    norm = jnp.sqrt(jnp.maximum(plane[0] ** 2 + plane[1] ** 2 + plane[2] ** 2, 1e-12))
    dist = (
        buf.x * plane[0] + buf.y * plane[1] + buf.z * plane[2] + plane[3]
    ) / norm
    thresh = jnp.asarray(distance_threshold, jnp.float32)
    if signed:
        keep = dist > thresh
    else:
        keep = jnp.abs(dist) > thresh
    return buf.with_mask(keep)
