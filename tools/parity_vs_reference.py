"""Numerical parity + CPU-baseline harness vs the actual Open3D reference.

Run this where Open3D is installed (it is NOT in the TPU sandbox) to
compare this repo's kernels against the reference implementation's actual
compute stack (reference pointcloud_preprocessor.py:447-544 delegates to
Open3D: voxel :511, statistical outliers :516, normals :523, RANSAC plane
:535-543; dedup/crop live in utils.py:509-547/:240-301) on the SAME frozen
fixture the golden tests use, under the SURVEY.md §7.2 parity definitions:

* mask stages (crop, dedup, outliers, ground complement): survivor-set
  Jaccard overlap;
* voxel: representative-position set match within voxel_size/2 (mean-point
  semantics match Open3D's voxel_down_sample average);
* normals: |cos| angle agreement on shared survivors;
* plane: sign-normalized coefficient distance + mutual inlier agreement.

Also benchmarks the reference's CPU kernels per stage (the BASELINE.md
"measure the reference itself" requirement) and writes everything as one
JSON document.

Usage:
    python tools/parity_vs_reference.py [--out parity_report.json]

Exits 0 with {"open3d": false, ...} when Open3D is unavailable, so CI in
the sandbox records the attempt without failing.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

# identical knobs to tools/make_parity_fixture.py
VOXEL, ROI_MIN, ROI_MAX = 0.2, (-25.0, -25.0, -3.0), (25.0, 25.0, 6.0)
NB_NEIGHBORS, STD_RATIO = 16, 2.0
RADIUS, MAX_NN = 0.35, 24
DIST_THRESH, RANSAC_N, NUM_ITER = 0.08, 3, 128


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b))
    union = len(np.union1d(a, b))
    return inter / max(union, 1)


def match_sets(a: np.ndarray, b: np.ndarray, tol: float) -> float:
    """Symmetric fraction of rows of each set matched within tol."""
    if len(a) == 0 or len(b) == 0:
        return float(len(a) == len(b))
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    fwd = (d2.min(axis=1) < tol * tol).mean()
    bwd = (d2.min(axis=0) < tol * tol).mean()
    return float(min(fwd, bwd))


def run_reference(pts_clean: np.ndarray, report: dict) -> dict:
    """Reference (Open3D CPU) kernels on the clean fixture, timed."""
    import open3d as o3d

    out = {}

    def timed(name, fn, reps=3):
        vals = []
        res = None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn()
            vals.append(time.perf_counter() - t0)
        report["reference_cpu_ms"][name] = round(min(vals) * 1e3, 3)
        return res

    def pcd_of(p):
        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(p.astype(np.float64))
        return pc

    pcd = pcd_of(pts_clean)

    # crop (reference utils.py:240-301 numpy semantics: keep inside box)
    lo, hi = np.asarray(ROI_MIN), np.asarray(ROI_MAX)
    out["crop_keep"] = np.flatnonzero(
        ((pts_clean >= lo) & (pts_clean <= hi)).all(axis=1)
    )

    # dedup (utils.py:532-534 numpy np.unique(axis=0) intent)
    _, uniq_idx = np.unique(pts_clean, axis=0, return_index=True)
    out["dedup_keep"] = np.sort(uniq_idx)

    # voxel (pointcloud_preprocessor.py:511)
    vox = timed("voxel", lambda: pcd.voxel_down_sample(VOXEL))
    out["voxel_positions"] = np.asarray(vox.points, dtype=np.float32)

    # statistical outliers (:516-518)
    _, keep = timed(
        "outliers",
        lambda: pcd.remove_statistical_outlier(NB_NEIGHBORS, STD_RATIO),
    )
    out["outlier_keep"] = np.asarray(keep)

    # normals (:523-526 hybrid radius+kNN)
    def norms():
        pc = pcd_of(pts_clean)
        pc.estimate_normals(
            o3d.geometry.KDTreeSearchParamHybrid(radius=RADIUS, max_nn=MAX_NN)
        )
        return np.asarray(pc.normals, dtype=np.float32)

    out["normals"] = timed("normals", norms)

    # RANSAC ground plane (:535-543; node keeps the complement :542)
    def ransac():
        return pcd.segment_plane(DIST_THRESH, RANSAC_N, NUM_ITER)

    plane, inliers = timed("ransac", ransac)
    out["plane"] = np.asarray(plane, dtype=np.float64)
    keep = np.ones(len(pts_clean), bool)
    keep[np.asarray(inliers)] = False
    out["ground_keep"] = np.flatnonzero(keep)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    report = {
        "fixture": "tests/fixtures/parity_scan.npz",
        "reference_cpu_ms": {},
        "parity": {},
    }

    scan = np.load(os.path.join(FIXDIR, "parity_scan.npz"))
    golden = np.load(os.path.join(FIXDIR, "parity_golden.npz"))
    pts = scan["points"]
    clean_idx = golden["nonfinite_keep_idx"]
    pts_clean = pts[clean_idx]

    try:
        import open3d  # noqa: F401

        report["open3d"] = True
    except ImportError:
        report["open3d"] = False
        print(json.dumps(report, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
        return

    ref = run_reference(pts_clean, report)

    # map this repo's goldens (indices into the RAW fixture) onto the
    # clean subset the reference sees
    pos_in_clean = {int(g): i for i, g in enumerate(clean_idx)}

    def to_clean(idx):
        return np.asarray(
            [pos_in_clean[int(i)] for i in idx if int(i) in pos_in_clean]
        )

    p = report["parity"]
    p["crop_jaccard"] = jaccard(to_clean(golden["crop_keep_idx"]), ref["crop_keep"])
    p["dedup_jaccard"] = jaccard(to_clean(golden["dedup_keep_idx"]), ref["dedup_keep"])
    p["voxel_set_match"] = match_sets(
        golden["voxel_positions"], ref["voxel_positions"], tol=VOXEL / 2
    )
    p["outlier_jaccard"] = jaccard(
        to_clean(golden["outlier_keep_idx"]), ref["outlier_keep"]
    )
    p["ground_jaccard"] = jaccard(
        to_clean(golden["ground_keep_idx"]), ref["ground_keep"]
    )

    ours_plane = golden["plane"].astype(np.float64)
    ref_plane = ref["plane"]
    if np.dot(ours_plane[:3], ref_plane[:3]) < 0:
        ours_plane = -ours_plane
    p["plane_coeff_maxdiff"] = float(np.abs(ours_plane - ref_plane).max())

    ours_n = golden["normals"][clean_idx]
    dots = np.abs((ours_n * ref["normals"]).sum(1))
    p["normals_cos_p50"] = float(np.median(dots))
    p["normals_agree_5deg"] = float((dots > np.cos(np.deg2rad(5))).mean())

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
