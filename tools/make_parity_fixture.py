"""Generate the frozen parity fixture + golden outputs (SURVEY.md §7.8).

Writes tests/fixtures/parity_scan.npz (a deterministic 24k-point LiDAR-like
scene: ground plane, walls, object clusters, outlier specks, exact
duplicates, NaN returns) and tests/fixtures/parity_golden.npz (this repo's
kernel outputs on it, stored with the §7.2 parity definitions: survivor
index SETS for mask stages, voxel representative positions, plane
coefficients, normals).

Run on the CPU backend so CI reproduces bit-identical goldens:
    JAX_PLATFORMS=cpu python tools/make_parity_fixture.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

VOXEL = 0.2
ROI_MIN = (-25.0, -25.0, -3.0)
ROI_MAX = (25.0, 25.0, 6.0)
NB_NEIGHBORS = 16
STD_RATIO = 2.0
RADIUS = 0.35
MAX_NN = 24
DIST_THRESH = 0.08
RANSAC_N = 3
NUM_ITER = 128
SEED = 1234


def build_scene() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    n_ground = 14_000
    ground = np.column_stack(
        [
            rng.uniform(-30, 30, (2, n_ground)).T,
            rng.normal(0.0, 0.02, n_ground),
        ]
    )
    wall = np.column_stack(
        [
            rng.uniform(-30, 30, 3000),
            np.full(3000, 12.0) + rng.normal(0, 0.03, 3000),
            rng.uniform(0, 4, 3000),
        ]
    )
    centers = rng.uniform(-20, 20, (12, 3)) * [1, 1, 0] + [0, 0, 1.2]
    obj = centers[rng.integers(0, 12, 5000)] + rng.normal(0, 0.35, (5000, 3))
    specks = rng.uniform(-28, 28, (120, 3)) * [1, 1, 0] + [0, 0, 8.0]
    pts = np.vstack([ground, wall, obj, specks]).astype(np.float32)
    pts = np.vstack([pts, pts[:400]])  # exact duplicates
    pts[::500] = np.nan  # dead returns
    perm = rng.permutation(len(pts))
    return pts[perm]


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from autodriver_pointcloud_preprocessor_tpu import ops
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa

    pts = build_scene()
    n = len(pts)
    buf, _ = from_soa({"positions": pts}, capacity=32_768)

    golden = {"points": pts}

    # stage-by-stage goldens, each from the same post-non-finite state so
    # every kernel is tested in isolation (parity defs in SURVEY §7.2)
    clean = ops.mask_non_finite(buf, True, True)
    golden["nonfinite_keep_idx"] = np.flatnonzero(np.asarray(clean.mask)[:n])

    dd = ops.remove_duplicates(clean)
    golden["dedup_keep_idx"] = np.flatnonzero(np.asarray(dd.mask)[:n])

    crop = ops.crop_box(
        clean, jnp.asarray(ROI_MIN), jnp.asarray(ROI_MAX), jnp.asarray(False)
    )
    golden["crop_keep_idx"] = np.flatnonzero(np.asarray(crop.mask)[:n])
    crop_inv = ops.crop_box(
        clean, jnp.asarray(ROI_MIN), jnp.asarray(ROI_MAX), jnp.asarray(True)
    )
    golden["crop_invert_keep_idx"] = np.flatnonzero(
        np.asarray(crop_inv.mask)[:n]
    )

    vox = ops.voxel_downsample(clean, jnp.float32(VOXEL))
    vmask = np.asarray(vox.mask)
    golden["voxel_positions"] = np.asarray(vox.positions).T[vmask]

    out = ops.remove_statistical_outliers(
        clean, NB_NEIGHBORS, jnp.float32(STD_RATIO), method="exact"
    )
    golden["outlier_keep_idx"] = np.flatnonzero(np.asarray(out.mask)[:n])

    nrm = ops.estimate_normals(
        clean, jnp.float32(RADIUS), MAX_NN, method="exact"
    )
    golden["normals"] = np.asarray(nrm.attributes["normals"]).T[:n]

    gnd, plane = ops.remove_ground(
        clean, jax.random.PRNGKey(0), jnp.float32(DIST_THRESH),
        RANSAC_N, NUM_ITER,
    )
    golden["ground_keep_idx"] = np.flatnonzero(np.asarray(gnd.mask)[:n])
    golden["plane"] = np.asarray(plane)

    os.makedirs(FIXDIR, exist_ok=True)
    np.savez_compressed(os.path.join(FIXDIR, "parity_scan.npz"), points=pts)
    np.savez_compressed(os.path.join(FIXDIR, "parity_golden.npz"), **golden)
    print(
        "fixture:", pts.shape,
        "| dedup", len(golden["dedup_keep_idx"]),
        "| crop", len(golden["crop_keep_idx"]),
        "| voxel", len(golden["voxel_positions"]),
        "| outliers", len(golden["outlier_keep_idx"]),
        "| ground", len(golden["ground_keep_idx"]),
        "| plane", np.round(golden["plane"], 4).tolist(),
    )


if __name__ == "__main__":
    main()
