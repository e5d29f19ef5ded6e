"""Small geometric linear algebra: quaternions, SE(3), symmetric 3x3 eigen.

TPU-first replacements for the scipy/tf_transformations quaternion path
(reference: pointcloud_preprocessor.py:734-760) and for the eigensolves
hidden inside Open3D's normal estimation / plane fitting kernels. Everything
is branch-free closed form so it fuses into the surrounding XLA program and
vmaps over batches of matrices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quaternion_to_matrix",
    "se3_matrix",
    "smallest_eigenvector_sym3x3",
    "smallest_eigvec_entries",
]


def quaternion_to_matrix(qx, qy, qz, qw) -> jax.Array:
    """Unit quaternion (x, y, z, w order, scipy convention) -> 3x3 rotation.

    Same convention as the reference's ``R.from_quat([qx,qy,qz,qw])``
    (pointcloud_preprocessor.py:743-748, scalar-last).
    """
    qx, qy, qz, qw = (jnp.asarray(v, jnp.float32) for v in (qx, qy, qz, qw))
    n = qx * qx + qy * qy + qz * qz + qw * qw
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    xx, yy, zz = qx * qx * s, qy * qy * s, qz * qz * s
    xy, xz, yz = qx * qy * s, qx * qz * s, qy * qz * s
    wx, wy, wz = qw * qx * s, qw * qy * s, qw * qz * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy]),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx]),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)]),
        ]
    )


def se3_matrix(translation, quaternion_xyzw) -> jax.Array:
    """(t, q) -> homogeneous 4x4 float32 transform.

    Replaces the reference's ``transform_to_matrix``
    (pointcloud_preprocessor.py:734-760).
    """
    tx, ty, tz = translation
    qx, qy, qz, qw = quaternion_xyzw
    rot = quaternion_to_matrix(qx, qy, qz, qw)
    top = jnp.concatenate(
        [rot, jnp.asarray([tx, ty, tz], jnp.float32).reshape(3, 1)], axis=1
    )
    bottom = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def smallest_eigenvector_sym3x3(mats: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Smallest eigenpair of symmetric 3x3 matrices, batched and branch-free.

    Args:
        mats: float32[..., 3, 3] symmetric.
    Returns:
        (eigenvector float32[..., 3] unit-norm, eigenvalue float32[...]).

    Uses the trigonometric closed form for the eigenvalues then recovers the
    eigenvector as the largest cross product of rows of (A - lambda I); fully
    degenerate inputs (isotropic / zero) fall back to (0, 0, 1), matching the
    convention used for under-determined normals.
    """
    mats = mats.astype(jnp.float32)
    a00 = mats[..., 0, 0]
    a11 = mats[..., 1, 1]
    a22 = mats[..., 2, 2]
    a01 = mats[..., 0, 1]
    a02 = mats[..., 0, 2]
    a12 = mats[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)

    # det((A - qI) / p) / 2
    b00, b11, b22 = d0 / safe_p, d1 / safe_p, d2 / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eig_min corresponds to phi + 2*pi/3
    eig_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # rows of (A - eig_min I)
    lam = eig_min
    r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)

    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    norm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), best.shape
    )
    vec = jnp.where(norm > 1e-20, best / jnp.where(norm > 0, norm, 1.0), fallback)
    # isotropic matrices (p == 0): every direction is an eigenvector
    vec = jnp.where((p > 0)[..., None], vec, fallback)
    return vec, eig_min


def smallest_eigvec_entries(a00, a11, a22, a01, a02, a12):
    """Closed-form smallest eigenvector of a symmetric 3x3, entrywise.

    Takes the six unique entries as same-shaped arrays and returns the
    eigenvector components (vx, vy, vz) — the planar-layout variant of
    ``smallest_eigenvector_sym3x3`` that never materializes an
    [..., 3, 3] minor-dim tensor (PERF_NOTES.md). Degenerate inputs fall
    back to (0, 0, 1).
    """
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)
    b00, b11, b22 = d0 / safe_p, d1 / safe_p, d2 / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # rows of (A - lam I); eigenvector = largest cross product of row pairs
    r0x, r0y, r0z = a00 - lam, a01, a02
    r1x, r1y, r1z = a01, a11 - lam, a12
    r2x, r2y, r2z = a02, a12, a22 - lam

    def cross(ax, ay, az, bx, by, bz):
        return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx

    c01 = cross(r0x, r0y, r0z, r1x, r1y, r1z)
    c02 = cross(r0x, r0y, r0z, r2x, r2y, r2z)
    c12 = cross(r1x, r1y, r1z, r2x, r2y, r2z)

    def norm2(c):
        return c[0] * c[0] + c[1] * c[1] + c[2] * c[2]

    n01, n02, n12 = norm2(c01), norm2(c02), norm2(c12)
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = (~use01) & (n02 >= n12)

    def pick(i):
        return jnp.where(use01, c01[i], jnp.where(use02, c02[i], c12[i]))

    vx, vy, vz = pick(0), pick(1), pick(2)
    nrm = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 0.0))
    ok = (nrm > 1e-20) & (p > 0)
    safe = jnp.where(nrm > 0, nrm, 1.0)
    vx = jnp.where(ok, vx / safe, 0.0)
    vy = jnp.where(ok, vy / safe, 0.0)
    vz = jnp.where(ok, vz / safe, 1.0)
    return vx, vy, vz
