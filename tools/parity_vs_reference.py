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


def _load_reference_utils():
    """Import the ACTUAL reference utils.py from /root/reference.

    The module imports ROS message types unconditionally (sensor_msgs) and
    uses Open3D tensors only as interop containers in its numpy/torch
    backends; neither is installed here. We stub the ROS modules with the
    standard PointField wire constants and give the module a minimal
    duck-typed ``o3c`` so its OWN compute lines (crop mask formulas
    utils.py:262-284, np.unique dedup :530-534, torch dedup :536-542, RGB
    codecs :304-356, metadata resolver :423-472) execute verbatim.
    """
    import importlib.util
    import types

    if "sensor_msgs" not in sys.modules:
        pf = types.SimpleNamespace(
            INT8=1, UINT8=2, INT16=3, UINT16=4, INT32=5, UINT32=6,
            FLOAT32=7, FLOAT64=8,
        )
        msg_mod = types.ModuleType("sensor_msgs.msg")
        msg_mod.PointField = pf
        msg_mod.PointCloud2 = type("PointCloud2", (), {})
        pkg = types.ModuleType("sensor_msgs")
        pkg.msg = msg_mod
        sys.modules["sensor_msgs"] = pkg
        sys.modules["sensor_msgs.msg"] = msg_mod
        smp = types.ModuleType("sensor_msgs_py")
        pc2 = types.ModuleType("sensor_msgs_py.point_cloud2")
        smp.point_cloud2 = pc2
        sys.modules["sensor_msgs_py"] = smp
        sys.modules["sensor_msgs_py.point_cloud2"] = pc2

    spec = importlib.util.spec_from_file_location(
        "reference_utils",
        "/root/reference/autodriver_pointcloud_preprocessor/utils.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class _T:
        """Minimal o3c.Tensor stand-in: carries a numpy array."""

        def __init__(self, a):
            self.a = np.asarray(a)

        def to(self, *args, **kwargs):
            return self

    def _from_dlpack(t):
        if hasattr(t, "numpy"):
            return _T(t.numpy())
        # torch.utils.dlpack.to_dlpack hands over a raw PyCapsule; route it
        # back through torch to get a numpy view
        try:
            import torch

            return _T(torch.utils.dlpack.from_dlpack(t).numpy())
        except Exception:
            return _T(np.from_dlpack(t))

    o3c = types.SimpleNamespace(
        Tensor=types.SimpleNamespace(
            from_numpy=lambda x: _T(x),
            from_dlpack=_from_dlpack,
        ),
        Dtype=types.SimpleNamespace(Bool="bool"),
    )
    mod.o3c = o3c

    class _Positions:
        """Duck-typed pointcloud.point.positions for the numpy/torch paths."""

        def __init__(self, arr):
            self._arr = np.asarray(arr)
            self.is_cpu = True

        def numpy(self):
            return self._arr

        def cpu(self):
            return self

        def to_dlpack(self):
            # torch.utils.dlpack.from_dlpack accepts __dlpack__ providers;
            # numpy arrays implement the protocol
            return self._arr

        def __getattr__(self, name):
            return getattr(self._arr, name)

    class FakePcd:
        """Duck-typed o3d.t.geometry.PointCloud for crop/dedup."""

        def __init__(self, arr):
            self._arr = np.asarray(arr)
            self.point = types.SimpleNamespace(positions=_Positions(arr))
            self.device = "CPU:0"

        def select_by_mask(self, mask):
            return FakePcd(self._arr[mask.a.astype(bool)])

        def select_by_index(self, idx):
            return FakePcd(self._arr[np.asarray(idx.a)])

    return mod, FakePcd


def run_runnable_reference(pts_clean: np.ndarray, report: dict) -> None:
    """Execute the reference's RUNNABLE (non-Open3D-kernel) code paths.

    Open3D cannot be installed in this sandbox (zero egress —
    tools/open3d_install_attempt.txt), but the reference's numpy/torch
    crop backends, numpy/torch dedup, RGB codecs, and vendor-field
    resolver run on CPU. This section times them and checks OUR
    implementations against the reference's actual outputs — making the
    crop/dedup/codec parity claims non-self-referential.
    """
    ref, FakePcd = _load_reference_utils()
    sect = report["runnable_reference"] = {}
    times = report["reference_cpu_ms"]

    lo, hi = np.asarray(ROI_MIN), np.asarray(ROI_MAX)

    def timed(name, fn, reps=5):
        vals, res = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn()
            vals.append(time.perf_counter() - t0)
        times[name] = round(min(vals) * 1e3, 3)
        return res

    # --- crop: numpy and torch backends (utils.py:254-297) --------------
    ours_keep = ((pts_clean >= lo) & (pts_clean <= hi)).all(axis=1)
    for backend in ("numpy", "torch"):
        try:
            cropped, _msg = timed(
                f"crop_{backend}",
                lambda: ref.crop_pointcloud(
                    FakePcd(pts_clean), backend=backend,
                    min_bound=lo, max_bound=hi, invert=False,
                ),
            )
            sect[f"crop_{backend}_match"] = bool(
                cropped._arr.shape[0] == int(ours_keep.sum())
                and np.array_equal(cropped._arr, pts_clean[ours_keep])
            )
        except Exception as e:  # pragma: no cover - environment-specific
            sect[f"crop_{backend}_match"] = f"error: {e}"

    # invert semantics (utils.py:267: any(<=min | >=max))
    inv_ref, _ = ref.crop_pointcloud(
        FakePcd(pts_clean), backend="numpy",
        min_bound=lo, max_bound=hi, invert=True,
    )
    ours_inv = ((pts_clean <= lo) | (pts_clean >= hi)).any(axis=1)
    sect["crop_invert_match"] = bool(
        np.array_equal(inv_ref._arr, pts_clean[ours_inv])
    )

    # --- dedup: numpy backend (utils.py:530-534) -------------------------
    # The reference passes ``sorted=False`` to np.unique, a kwarg that
    # does not exist on this numpy (2.x) — the reference's numpy dedup
    # path CRASHES as written here. Recorded, then executed with the
    # unsupported kwarg dropped so its semantics can still be compared.
    dup_pts = np.vstack([pts_clean, pts_clean[:500]])
    try:
        ref.remove_duplicates(FakePcd(dup_pts), backend="numpy")
        sect["dedup_numpy_sorted_kwarg_ok"] = True
    except TypeError as e:
        sect["dedup_numpy_sorted_kwarg_ok"] = (
            f"reference crashes on numpy {np.__version__}: {e}"
        )
        _orig_unique = ref.np.unique

        def _unique_compat(*a, **kw):
            kw.pop("sorted", None)
            return _orig_unique(*a, **kw)

        ref.np = types_compat = __import__("types").SimpleNamespace(
            **{k: getattr(np, k) for k in dir(np) if not k.startswith("_")}
        )
        ref.np.unique = _unique_compat
    deduped, _ = timed(
        "dedup_numpy",
        lambda: ref.remove_duplicates(FakePcd(dup_pts), backend="numpy"),
    )
    ours_set = np.unique(dup_pts, axis=0)
    ref_sorted = deduped._arr[np.lexsort(deduped._arr.T)]
    sect["dedup_numpy_set_match"] = bool(
        np.array_equal(ref_sorted, ours_set[np.lexsort(ours_set.T)])
    )

    # torch backend: the reference passes torch.unique's INVERSE indices
    # to select_by_index (utils.py:538-542) — the latent bug SURVEY §7
    # documents as intent-not-bug to replicate. Demonstrate it live.
    try:
        t_deduped, _ = ref.remove_duplicates(FakePcd(dup_pts), backend="torch")
        n_unique = ours_set.shape[0]
        sect["dedup_torch_bug_reproduced"] = bool(
            t_deduped._arr.shape[0] == dup_pts.shape[0]  # inverse has N entries
            and t_deduped._arr.shape[0] != n_unique
        )
    except Exception as e:  # pragma: no cover
        sect["dedup_torch_bug_reproduced"] = f"error: {e}"

    # --- RGB codecs (utils.py:304-356) bit-exact -------------------------
    rng = np.random.default_rng(0)
    r, g, b = (rng.integers(0, 256, 4096).astype(np.uint8) for _ in range(3))
    import autodriver_pointcloud_preprocessor_tpu.core.codec as our_codec

    packed_ref = ref.merge_rgb_fields(r, g, b)
    packed_ours = our_codec.merge_rgb_fields(r, g, b)
    sect["merge_rgb_bitexact"] = bool(
        np.array_equal(packed_ref.view(np.uint32), packed_ours.view(np.uint32))
    )
    un_ref = ref.extract_rgb_from_pointcloud(packed_ref.astype(np.float32))
    un_ours = our_codec.extract_rgb_from_packed(packed_ours)
    sect["extract_rgb_bitexact"] = bool(np.array_equal(un_ref, un_ours))
    cols = rng.uniform(0, 1, (2048, 3))
    sect["rgb_int_to_float_bitexact"] = bool(
        np.array_equal(
            ref.rgb_int_to_float(cols).view(np.uint32),
            our_codec.pack_rgb_float(cols).view(np.uint32),
        )
    )
    sect["rgb_to_intensity_allclose"] = bool(
        np.allclose(
            ref.rgb_to_intensity(cols.astype(np.float32)),
            our_codec.rgb_to_intensity(cols.astype(np.float32)),
            atol=1e-6,
        )
    )

    # --- vendor-field metadata resolver (utils.py:423-472) ---------------
    from autodriver_pointcloud_preprocessor_tpu.core.fields import (
        get_pointcloud_metadata as ours_meta,
    )

    for fields in (
        ["x", "y", "z", "intensity", "ring", "time"],
        ["x", "y", "z", "I", "C", "t", "tag"],
        ["x", "y", "z", "r", "g", "b", "timestamp", "line"],
    ):
        m_ref = ref.get_pointcloud_metadata(fields)
        m_ours = ours_meta(fields)
        keys = [
            "has_rgb", "has_intensity", "has_ring", "has_time",
            "has_return_type",
        ]
        ok = all(
            bool(m_ref.get(k, False)) == bool(m_ours.get(k, False))
            for k in keys
        )
        # field-name resolution must agree wherever both report one
        for k in ("intensity", "ring", "time", "return_type"):
            a = m_ref.get(f"{k}_field_name")
            o = m_ours.get(f"{k}_field_name")
            if a is not None and o is not None:
                ok = ok and (a == o)
        sect[f"metadata_match[{'+'.join(fields[3:])or 'xyz'}]"] = bool(ok)


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

    # the reference's runnable (non-Open3D-kernel) paths execute here
    # regardless of Open3D availability
    run_runnable_reference(pts_clean, report)

    try:
        import open3d  # noqa: F401

        report["open3d"] = True
    except ImportError:
        report["open3d"] = False
        report["open3d_evidence"] = "tools/open3d_install_attempt.txt"
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
