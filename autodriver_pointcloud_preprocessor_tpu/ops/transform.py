"""SE(3) point-cloud transforms.

Replaces Open3D's ``PointCloud.transform(4x4)`` kernel as invoked at
reference pointcloud_preprocessor.py:482, :487, :490. The rotation is
scalar-expanded over the planar (3, N) rows — nine scalar-times-vector FMAs
on the VPU — because a ``(N,3) @ (3,3)`` matmul cannot tile the MXU (K=3)
and hits a measured ~1000x-slow path on this backend (PERF_NOTES.md).
Normals (when present) are rotated without translation, matching Open3D.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer

__all__ = ["se3_transform", "transform_points", "rotate_rows"]


def rotate_rows(rows: jax.Array, matrix: jax.Array) -> jax.Array:
    """Rotate planar (3, N) rows by the 3x3 part of ``matrix`` (no translation)."""
    x, y, z = rows[0], rows[1], rows[2]
    m = matrix.astype(rows.dtype)
    nx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z
    ny = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z
    nz = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z
    return jnp.stack([nx, ny, nz])


def transform_points(points: jax.Array, matrix: jax.Array) -> jax.Array:
    """Apply a homogeneous 4x4 to planar float32[3, N] points."""
    x, y, z = points[0], points[1], points[2]
    m = matrix.astype(points.dtype)
    nx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
    ny = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
    nz = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3]
    return jnp.stack([nx, ny, nz])


def se3_transform(buf: ScanBuffer, matrix: jax.Array) -> ScanBuffer:
    """Transform a ScanBuffer in the homogeneous frame given by ``matrix``.

    Padded (masked-out) rows are transformed too — harmless, and cheaper
    than predication on TPU.
    """
    new_positions = transform_points(buf.positions, matrix)
    attrs = dict(buf.attributes)
    if "normals" in attrs:
        attrs["normals"] = rotate_rows(attrs["normals"], matrix)
    return buf.replace(positions=new_positions, attributes=attrs)
