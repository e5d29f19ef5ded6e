"""Point-wise op tests vs numpy oracles: transform, finite, crop, compact, dedup.

Oracle semantics from the reference (SURVEY.md §2b rows): SE(3) transform
(pointcloud_preprocessor.py:482), remove_non_finite_points (:469-471), crop
incl. invert (utils.py:254-271), np.unique dedup intent (utils.py:532-534).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from autodriver_pointcloud_preprocessor_tpu.core import from_soa, to_soa, valid_count
from autodriver_pointcloud_preprocessor_tpu.ops import (
    compact,
    compact_to,
    crop_box,
    mask_non_finite,
    quaternion_to_matrix,
    remove_duplicates,
    se3_matrix,
    se3_transform,
    smallest_eigenvector_sym3x3,
    transform_points,
)


def _buf(points, **attrs):
    soa = {"positions": np.asarray(points, np.float32), **attrs}
    buf, meta = from_soa(soa)
    return buf, meta


def test_quaternion_to_matrix_vs_scipy(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        ours = np.asarray(quaternion_to_matrix(*q))
        scipys = R.from_quat(q).as_matrix()
        np.testing.assert_allclose(ours, scipys, atol=1e-6)


def test_se3_matrix(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    m = np.asarray(se3_matrix(tuple(t), tuple(q)))
    np.testing.assert_allclose(m[:3, :3], R.from_quat(q).as_matrix(), atol=1e-6)
    np.testing.assert_allclose(m[:3, 3], t, atol=1e-6)
    np.testing.assert_array_equal(m[3], [0, 0, 0, 1])


def test_se3_transform_points_and_normals(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    normals = rng.normal(size=(100, 3)).astype(np.float32)
    buf, _ = _buf(pts, normals=normals)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3).astype(np.float32)
    m = se3_matrix(tuple(t), tuple(q))
    out = se3_transform(buf, m)
    rot = R.from_quat(q).as_matrix().astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(out.positions).T[:100], pts @ rot.T + t, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.attributes["normals"]).T[:100], normals @ rot.T, atol=1e-4
    )


def test_mask_non_finite():
    pts = np.array(
        [[0, 0, 0], [np.nan, 0, 0], [np.inf, 1, 1], [1, 1, 1], [0, -np.inf, 0]],
        np.float32,
    )
    buf, _ = _buf(pts)
    both = mask_non_finite(buf, True, True)
    np.testing.assert_array_equal(np.asarray(both.mask)[:5], [1, 0, 0, 1, 0])
    only_nan = mask_non_finite(buf, True, False)
    np.testing.assert_array_equal(np.asarray(only_nan.mask)[:5], [1, 0, 1, 1, 1])
    only_inf = mask_non_finite(buf, False, True)
    np.testing.assert_array_equal(np.asarray(only_inf.mask)[:5], [1, 1, 0, 1, 0])
    noop = mask_non_finite(buf, False, False)
    assert int(valid_count(noop)) == 5


def test_crop_box_oracle(rng):
    pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    lo, hi = np.array([-5, -4, -3.0]), np.array([5, 4, 3.0])
    out = crop_box(buf, lo, hi, invert=False)
    expected = np.all((pts >= lo) & (pts <= hi), axis=1)
    np.testing.assert_array_equal(np.asarray(out.mask)[:500], expected)
    # invert keeps points outside: any(p<=min | p>=max) (utils.py:267)
    inv = crop_box(buf, lo, hi, invert=True)
    expected_inv = np.any((pts <= lo) | (pts >= hi), axis=1)
    np.testing.assert_array_equal(np.asarray(inv.mask)[:500], expected_inv)


def test_crop_invert_is_traced_no_recompile(rng):
    pts = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    traced = jax.jit(lambda b, inv: crop_box(b, jnp.array([-1.0] * 3), jnp.array([1.0] * 3), inv))
    m1 = traced(buf, jnp.array(False))
    m2 = traced(buf, jnp.array(True))
    # both variants from one trace; together they cover every live point
    live = np.asarray(buf.mask)[:64]
    assert ((np.asarray(m1.mask) | np.asarray(m2.mask))[:64] >= live).all()


def test_compact_stable_order(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    intensity = np.arange(50, dtype=np.float32)
    buf, meta = _buf(pts, intensity=intensity)
    keep = np.zeros(buf.capacity, bool)
    keep[:50] = rng.uniform(size=50) < 0.5
    buf = buf.with_mask(jnp.asarray(keep))
    out = compact(buf)
    n_keep = keep.sum()
    np.testing.assert_array_equal(
        np.asarray(out.positions).T[:n_keep], pts[keep[:50]]
    )
    np.testing.assert_array_equal(
        np.asarray(out.attributes["intensity"])[:n_keep], intensity[keep[:50]]
    )
    assert int(valid_count(out)) == n_keep


def test_compact_to_shrinks():
    pts = np.ones((10, 3), np.float32)
    buf, _ = _buf(pts)
    small = compact_to(buf, 16)
    assert small.capacity == 16
    assert int(valid_count(small)) == 10
    with pytest.raises(ValueError):
        compact_to(small, 1024)


def test_remove_duplicates_oracle(rng):
    base = rng.normal(size=(40, 3)).astype(np.float32)
    pts = np.vstack([base, base[::3], base[::5]])  # exact dup rows
    order = rng.permutation(pts.shape[0])
    pts = pts[order]
    buf, _ = _buf(pts)
    out = remove_duplicates(buf)
    mask = np.asarray(out.mask)[: pts.shape[0]]
    # survivors are unique and cover the full distinct set
    survivors = pts[mask]
    uniq = np.unique(pts, axis=0)
    assert survivors.shape[0] == uniq.shape[0]
    np.testing.assert_array_equal(np.unique(survivors, axis=0), uniq)
    # first occurrence in buffer order survives
    for i in range(pts.shape[0]):
        first = np.flatnonzero((pts == pts[i]).all(axis=1))[0]
        assert mask[first]


def test_remove_duplicates_negative_zero():
    pts = np.array([[0.0, 0, 0], [-0.0, 0, 0], [1, 1, 1]], np.float32)
    buf, _ = _buf(pts)
    out = remove_duplicates(buf)
    assert int(valid_count(out)) == 2  # -0.0 == 0.0 dedups like np.unique


def test_smallest_eigenvector_vs_numpy(rng):
    mats = rng.normal(size=(64, 3, 3)).astype(np.float32)
    mats = mats @ mats.transpose(0, 2, 1)  # PSD symmetric
    vecs, vals = smallest_eigenvector_sym3x3(jnp.asarray(mats))
    vecs, vals = np.asarray(vecs), np.asarray(vals)
    w, v = np.linalg.eigh(mats)
    np.testing.assert_allclose(vals, w[:, 0], rtol=2e-3, atol=2e-3)
    dots = np.abs(np.sum(vecs * v[:, :, 0], axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=5e-3)


def test_smallest_eigenvector_degenerate():
    mats = jnp.stack([jnp.zeros((3, 3)), 2.5 * jnp.eye(3)])
    vecs, _ = smallest_eigenvector_sym3x3(mats)
    np.testing.assert_allclose(np.asarray(vecs), [[0, 0, 1], [0, 0, 1]])


def test_stream_compact_matches_compact_to(rng):
    """stream_compact_to (segmean-kernel compaction, round 5) must equal
    compact_to bit-for-bit: same survivors, same stable order, exact f32
    passthrough, narrow ints intact, wide ints via the 16/16 split."""
    from autodriver_pointcloud_preprocessor_tpu.ops.compact import (
        stream_compact_to,
    )

    n, cap = 2048, 1024
    pts = rng.normal(0, 5, (n, 3)).astype(np.float32)
    pts[::17] = np.nan  # NaN rows must not poison neighbouring live rows
    buf, _ = from_soa(
        {
            "positions": pts,
            "intensity": rng.uniform(0, 255, n).astype(np.float32),
            "ring": rng.integers(0, 32, n).astype(np.uint16),
        },
        capacity=n,
    )
    # wide-int attribute exercising the hi/lo split (values beyond 2^24)
    wide = jnp.asarray(
        rng.integers(0, 2**31 - 1, n, dtype=np.int64).astype(np.int32)
    )
    buf = buf.replace(attributes={**buf.attributes, "stamp32": wide})
    kill = np.asarray(rng.uniform(size=n) < 0.6)
    kill[np.isnan(pts).any(axis=1)] = True
    buf = buf.with_mask(buf.mask & jnp.asarray(~kill))
    assert int(valid_count(buf)) < cap

    ref = compact_to(buf, cap)
    out = stream_compact_to(buf, cap, backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(
        np.asarray(out.positions)[:, m], np.asarray(ref.positions)[:, m]
    )
    for k in ("intensity", "ring", "stamp32"):
        np.testing.assert_array_equal(
            np.asarray(out.attributes[k])[..., m],
            np.asarray(ref.attributes[k])[..., m],
        )

    # overflow: capped-output semantics — first `cap` survivors kept
    tiny = stream_compact_to(buf, 512, backend="pallas_interpret")
    np.testing.assert_array_equal(
        np.asarray(tiny.positions)[:, np.asarray(tiny.mask)],
        np.asarray(ref.positions)[:, m][:, :512],
    )
