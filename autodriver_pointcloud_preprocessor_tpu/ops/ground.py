"""RANSAC plane segmentation (ground removal).

Replaces Open3D's sequential ``segment_plane`` RANSAC kernel (reference:
pointcloud_preprocessor.py:533-543) with the batched TPU formulation from
SURVEY.md §7.4c: all hypotheses are sampled at once with seeded
``jax.random``, every hypothesis scores every point in one fused pass,
argmax picks the winner, and a final least-squares refit on the winning
inliers reproduces Open3D's terminal refinement.

The point-vs-plane distances are computed as three (N,1)x(1,H) lane
broadcasts (x*nx_h + y*ny_h + z*nz_h + d_h), NOT an (N,3)@(3,H) matmul —
K=3 matmuls hit a measured pathological path on this backend
(PERF_NOTES.md).

The ``probability`` early-exit parameter is accepted for API parity but is
advisory only — with all iterations batched there is nothing to exit early
(documented deviation; statistical parity is tested on inlier counts,
SURVEY.md §7 hard part 4).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.scan import ScanBuffer, valid_count
from .linalg import smallest_eigvec_entries as _smallest_eigvec_entries

__all__ = ["segment_plane", "remove_ground"]


def _fit_planes_batched(sx, sy, sz) -> Tuple[jax.Array, jax.Array]:
    """Least-squares plane per hypothesis from planar samples float32[H, n].

    Returns (normals float32[3, H] unit, d float32[H]) with n.p + d = 0.
    Covariances are scalar-expanded 3x3 symmetric entries; the smallest
    eigenvector comes from the closed-form trigonometric solve (same math
    as ops/linalg.py, expressed over [H]-vectors of matrix entries).
    """
    cx = jnp.mean(sx, axis=1)
    cy = jnp.mean(sy, axis=1)
    cz = jnp.mean(sz, axis=1)
    dx = sx - cx[:, None]
    dy = sy - cy[:, None]
    dz = sz - cz[:, None]
    a00 = jnp.sum(dx * dx, axis=1)
    a11 = jnp.sum(dy * dy, axis=1)
    a22 = jnp.sum(dz * dz, axis=1)
    a01 = jnp.sum(dx * dy, axis=1)
    a02 = jnp.sum(dx * dz, axis=1)
    a12 = jnp.sum(dy * dz, axis=1)
    nx, ny, nz = _smallest_eigvec_entries(a00, a11, a22, a01, a02, a12)
    d = -(nx * cx + ny * cy + nz * cz)
    return jnp.stack([nx, ny, nz]), d


def _plane_distances(x, y, z, nx, ny, nz, d):
    """|x_i*nx_h + ...| via (N,1)x(1,H) lane broadcasts -> float32[N, H]."""
    return jnp.abs(
        x[:, None] * nx[None, :]
        + y[:, None] * ny[None, :]
        + z[:, None] * nz[None, :]
        + d[None, :]
    )


def segment_plane(
    buf: ScanBuffer,
    key: jax.Array,
    distance_threshold: jax.Array | float = 0.2,
    ransac_n: int = 5,
    num_iterations: int = 100,
    probability: float = 0.99,  # advisory; see module docstring
    live_prefix: bool = False,
    score_subsample: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Find the dominant plane among live points.

    Args:
        buf: scan buffer.
        key: jax PRNG key (reproducible, unlike Open3D's hidden RNG).
        distance_threshold: inlier distance (traced; no recompile on change).
        ransac_n: points per hypothesis (static).
        num_iterations: hypothesis count (static; all run as one batch).
        live_prefix: static promise that live points occupy slots
            [0, count) (e.g. the front-compacted output of
            ``voxel_downsample``). Skips the cumsum/searchsorted rank
            lookup — the draw IS the buffer index. Sample indices are
            bit-identical to the general path on genuinely compacted
            input; on non-compacted input the promise is WRONG (dead
            slots get sampled and score ~0 votes).
        score_subsample: static; when > 0 and smaller than the capacity,
            the HYPOTHESIS VOTE (the [N, H] distance pass) runs on a
            systematic strided subsample of ~this many slots instead of
            every point — an unbiased inlier-FRACTION estimate whose
            binomial noise at 16384 samples is ~0.5pp, well under the
            separation between competing planes. Winner selection only;
            the terminal refit and the returned inlier mask always use
            every live point, so the output plane is still polished on
            the full cloud. NOTE: on the TPU backend this is a measured
            PESSIMIZATION at 131k/H=64 (0.058 -> 0.553 ms — the strided
            slice relayout costs far more than the saved vote pass;
            PERF_NOTES round 5, tools/profile_r5_ground.py); it exists
            for hosts where the [N, H] pass dominates (CPU meshes,
            larger H).
    Returns:
        (plane float32[4] = [nx, ny, nz, d] with unit normal,
         inlier_mask bool[capacity] over live points).
    """
    del probability
    x, yy, zz = buf.x, buf.y, buf.z
    count = valid_count(buf)

    # Sample with replacement among the live points. (Open3D samples without
    # replacement; with 10^4-10^5 live points the collision probability per
    # hypothesis is negligible and a degenerate draw simply scores 0 votes.)
    u = jax.random.uniform(key, (num_iterations, ransac_n))
    safe_count = jnp.maximum(count, 1)
    draw = jnp.minimum((u * safe_count).astype(jnp.int32), safe_count - 1)
    if live_prefix:
        # compacted input: the (draw+1)-th live point sits at slot `draw`
        sample_idx = draw
    else:
        # Index of the (draw+1)-th live point WITHOUT a full compaction
        # argsort: cumsum(mask) is monotone, so searchsorted finds the
        # same index the stable live-first permutation would
        # (bit-identical samples, and ~10x cheaper than argsort at 131k —
        # the argsort made this stage 0.97 ms of the round-3 headline).
        csum = jnp.cumsum(buf.mask.astype(jnp.int32))
        sample_idx = jnp.minimum(
            jnp.searchsorted(csum, draw + 1, side="left").astype(jnp.int32),
            buf.capacity - 1,
        )  # [H, n] indices into the buffer
    normals, ds = _fit_planes_batched(
        x[sample_idx], yy[sample_idx], zz[sample_idx]
    )

    thresh = jnp.asarray(distance_threshold, x.dtype)
    if score_subsample and score_subsample < buf.capacity:
        # systematic strided subsample for the vote only (see docstring);
        # stride sampling over sensor-stream (or curve) order covers every
        # ring/region, and the static stride keeps it a strided slice —
        # no gather
        stride = buf.capacity // score_subsample
        vx, vy, vz = x[::stride], yy[::stride], zz[::stride]
        vm = buf.mask[::stride]
    else:
        vx, vy, vz, vm = x, yy, zz, buf.mask
    dist = _plane_distances(vx, vy, vz, normals[0], normals[1], normals[2], ds)
    votes = jnp.sum(
        (dist <= thresh) & vm[:, None], axis=0, dtype=jnp.int32
    )  # [H]
    best = jnp.argmax(votes)

    # Terminal refinement: least-squares refit on the winning inliers,
    # then recompute the inlier set (Open3D does the same final polish).
    # The winner's distances are RE-derived as one [N] pass (bit-identical
    # elementwise ops) instead of dist[:, best]: with the [N, H] matrix
    # consumed only by the vote reduction, XLA streams it without ever
    # materializing ~52 MB in HBM.
    bnx, bny, bnz = normals[0][best], normals[1][best], normals[2][best]
    bd = ds[best]
    best_dist = jnp.abs(x * bnx + yy * bny + zz * bnz + bd)
    best_inliers = (best_dist <= thresh) & buf.mask
    w = best_inliers.astype(x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    cx = jnp.sum(x * w) / wsum
    cy = jnp.sum(yy * w) / wsum
    cz = jnp.sum(zz * w) / wsum
    dx, dy, dz = (x - cx) * w, (yy - cy) * w, (zz - cz) * w
    # one factor of w per centered term is enough for 0/1 weights
    nx, ny, nz = _smallest_eigvec_entries(
        jnp.sum(dx * (x - cx)),
        jnp.sum(dy * (yy - cy)),
        jnp.sum(dz * (zz - cz)),
        jnp.sum(dx * (yy - cy)),
        jnp.sum(dx * (zz - cz)),
        jnp.sum(dy * (zz - cz)),
    )
    d_ref = -(nx * cx + ny * cy + nz * cz)
    final_dist = jnp.abs(x * nx + yy * ny + zz * nz + d_ref)
    inlier_mask = (final_dist <= thresh) & buf.mask

    refined_votes = jnp.sum(inlier_mask, dtype=jnp.int32)
    # full-N inlier count of the winning hypothesis (== votes[best] when
    # the vote ran on every point; the subsampled vote is selection-only,
    # so the refit comparison must not mix sample scales)
    best_votes_full = jnp.sum(best_inliers, dtype=jnp.int32)
    use_refined = refined_votes >= best_votes_full
    plane = jnp.where(
        use_refined,
        jnp.stack([nx, ny, nz, d_ref]),
        jnp.stack([bnx, bny, bnz, bd]),
    )
    inlier_mask = jnp.where(use_refined, inlier_mask, best_inliers)
    return plane, inlier_mask


def remove_ground(
    buf: ScanBuffer,
    key: jax.Array,
    distance_threshold: jax.Array | float = 0.2,
    ransac_n: int = 5,
    num_iterations: int = 100,
    probability: float = 0.99,
    live_prefix: bool = False,
    score_subsample: int = 0,
) -> Tuple[ScanBuffer, jax.Array]:
    """Mask out the dominant plane's inliers (keep the complement).

    Matches the node semantics at reference pointcloud_preprocessor.py:542
    (``select_by_index(inliers, invert=True)``). Returns (buffer, plane).
    ``live_prefix`` / ``score_subsample``: see ``segment_plane``.
    """
    plane, inliers = segment_plane(
        buf, key, distance_threshold, ransac_n, num_iterations, probability,
        live_prefix=live_prefix, score_subsample=score_subsample,
    )
    return buf.with_mask(jnp.logical_not(inliers)), plane
