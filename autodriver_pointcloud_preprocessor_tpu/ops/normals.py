"""Normal estimation via radius/kNN PCA.

Replaces Open3D's ``estimate_normals(radius, max_nn)`` kernel (reference:
pointcloud_preprocessor.py:521-530): a covariance over each live point's
neighborhood, whose smallest eigenvector is the normal — computed with the
closed-form 3x3 eigensolve over entry vectors (no [..., 3, 3] layouts,
PERF_NOTES.md), so the whole stage is dense reductions + elementwise.

``method='exact'`` reproduces the hybrid radius+max_nn search with
brute-force kNN (oracle path). ``method='window'`` computes the covariance
over *all* in-radius candidates inside the Morton window (production path;
ignoring max_nn there is a documented quality-positive deviation — Open3D
truncates to max_nn for KD-tree cost reasons that don't apply here).

Points with fewer than 3 neighbors get the (0, 0, 1) fallback. Normals are
unoriented; the sign convention makes the largest-|component| positive.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer
from .linalg import smallest_eigvec_entries as _smallest_eigvec_entries
from .knn import knn_exact
from .window import window_normal_stats

__all__ = ["estimate_normals"]

_AUTO_EXACT_MAX = 8192


def _normals_from_entries(a00, a11, a22, a01, a02, a12, count):
    nx, ny, nz = _smallest_eigvec_entries(a00, a11, a22, a01, a02, a12)
    # deterministic sign: flip so the largest-|component| is positive
    ax, ay, az = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
    lead = jnp.where(
        (ax >= ay) & (ax >= az), nx, jnp.where(ay >= az, ny, nz)
    )
    flip = jnp.where(lead < 0, -1.0, 1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip
    ok = count >= 3
    return jnp.stack(
        [jnp.where(ok, nx, 0.0), jnp.where(ok, ny, 0.0), jnp.where(ok, nz, 1.0)]
    )


def estimate_normals(
    buf: ScanBuffer,
    search_radius: jax.Array | float = 0.1,
    max_nn: int = 30,
    method: str = "auto",
    window_backend: str = "auto",
    window_blocks: int | tuple = 2,
    passes: int = 2,
) -> ScanBuffer:
    """Attach float32[3, capacity] unit normals as attribute ``normals``.

    ``max_nn`` is static (shapes the exact-path gather); ``search_radius``
    is traced.
    """
    if method == "auto":
        method = "exact" if buf.capacity <= _AUTO_EXACT_MAX else "window"

    x, y, z = buf.x, buf.y, buf.z
    r2 = jnp.asarray(search_radius, jnp.float32) ** 2

    if method == "exact":
        sq_dists, idx = knn_exact(buf.positions, buf.mask, k=max_nn)
        within = (sq_dists <= r2) & jnp.isfinite(sq_dists)  # [N, k]
        w = within.astype(jnp.float32)
        nxk = x[idx]  # [N, k] gathers — exact path only (slow at large N)
        nyk = y[idx]
        nzk = z[idx]
        cnt = jnp.sum(w, axis=-1)
        denom = jnp.maximum(cnt, 1.0)
        mx = jnp.sum(w * nxk, axis=-1) / denom
        my = jnp.sum(w * nyk, axis=-1) / denom
        mz = jnp.sum(w * nzk, axis=-1) / denom
        ex = (nxk - mx[:, None]) * w
        ey = (nyk - my[:, None]) * w
        ez = (nzk - mz[:, None]) * w
        a00 = jnp.sum(ex * (nxk - mx[:, None]), axis=-1)
        a11 = jnp.sum(ey * (nyk - my[:, None]), axis=-1)
        a22 = jnp.sum(ez * (nzk - mz[:, None]), axis=-1)
        a01 = jnp.sum(ex * (nyk - my[:, None]), axis=-1)
        a02 = jnp.sum(ex * (nzk - mz[:, None]), axis=-1)
        a12 = jnp.sum(ey * (nzk - mz[:, None]), axis=-1)
        count = cnt
    elif method == "window":
        entries, count = window_normal_stats(
            buf.positions, buf.mask, search_radius, backend=window_backend,
            window_blocks=window_blocks, passes=passes,
        )
        a00, a11, a22, a01, a02, a12 = (entries[i] for i in range(6))
    else:
        raise ValueError(f"unknown kNN method {method!r}")

    normals = _normals_from_entries(a00, a11, a22, a01, a02, a12, count)

    attrs = dict(buf.attributes)
    attrs["normals"] = normals.astype(jnp.float32)
    return buf.replace(attributes=attrs)
