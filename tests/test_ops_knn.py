"""kNN / statistical outliers / normal estimation tests vs numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
from autodriver_pointcloud_preprocessor_tpu.ops import (
    estimate_normals,
    knn_exact,
    remove_statistical_outliers,
)


def _buf(points, **attrs):
    return from_soa({"positions": np.asarray(points, np.float32), **attrs})


def _knn_oracle(pts, mask, k):
    live = np.flatnonzero(mask)
    d2 = ((pts[:, None, :] - pts[None, live, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1)[:, :k]
    return np.sort(d2, axis=1)[:, :k], live[order]


def test_knn_exact_oracle(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    k = 8
    d, idx = knn_exact(buf.positions, buf.mask, k=k)
    d = np.asarray(d)[:300]
    idx = np.asarray(idx)[:300]
    od, oidx = _knn_oracle(pts, np.ones(300, bool), k)
    np.testing.assert_allclose(d, od, atol=1e-3)
    # self is included as nearest
    np.testing.assert_array_equal(idx[:, 0], np.arange(300))


def test_knn_respects_mask(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    mask = np.asarray(buf.mask).copy()
    mask[50:] = False
    d, idx = knn_exact(buf.positions, jnp.asarray(mask), k=5)
    idx = np.asarray(idx)
    d = np.asarray(d)
    # live queries only ever reference live neighbors
    assert (idx[:50][np.isfinite(d[:50])] < 50).all()


def test_knn_fewer_than_k(rng):
    pts = rng.normal(size=(3, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    d, idx = knn_exact(buf.positions, buf.mask, k=8)
    d = np.asarray(d)[:3]
    assert np.isfinite(d[:, :3]).all()
    assert np.isinf(d[:, 3:]).all()


def _outlier_oracle(pts, k, ratio):
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    d = np.sqrt(np.sort(d2, axis=1)[:, :k])
    mean_d = d.mean(axis=1)
    mu, std = mean_d.mean(), mean_d.std()
    return mean_d <= mu + ratio * std


def test_statistical_outliers_oracle(rng):
    pts = rng.normal(size=(400, 3)).astype(np.float32)
    pts[::50] *= 8.0  # inject outliers
    buf, _ = _buf(pts)
    out = remove_statistical_outliers(buf, nb_neighbors=10, std_ratio=1.5)
    got = np.asarray(out.mask)[:400]
    expected = _outlier_oracle(pts.astype(np.float64), 10, 1.5)
    assert (got == expected).mean() > 0.995  # float-precision boundary slack


def test_statistical_outliers_removes_injected(rng):
    cluster = rng.normal(0, 0.1, size=(500, 3)).astype(np.float32)
    outliers = rng.uniform(5, 10, size=(10, 3)).astype(np.float32)
    pts = np.vstack([cluster, outliers])
    buf, _ = _buf(pts)
    out = remove_statistical_outliers(buf, nb_neighbors=20, std_ratio=2.0)
    mask = np.asarray(out.mask)[:510]
    assert mask[:500].mean() > 0.98
    assert mask[500:].sum() == 0


def test_estimate_normals_plane(rng):
    # noiseless plane z = 2x + 3y -> normal ∝ (-2, -3, 1)/norm
    xy = rng.uniform(-1, 1, size=(400, 2)).astype(np.float32)
    z = 2 * xy[:, 0] + 3 * xy[:, 1]
    pts = np.column_stack([xy, z])
    buf, _ = _buf(pts)
    out = estimate_normals(buf, search_radius=1.0, max_nn=16)
    normals = np.asarray(out.attributes["normals"]).T[:400]
    expected = np.array([-2, -3, 1.0]) / np.linalg.norm([-2, -3, 1.0])
    dots = np.abs(normals @ expected)
    assert (dots > 0.999).mean() > 0.99


def test_estimate_normals_isolated_point_fallback(rng):
    pts = np.vstack(
        [rng.normal(0, 0.01, (50, 3)), [[100, 100, 100]]]
    ).astype(np.float32)
    buf, _ = _buf(pts)
    out = estimate_normals(buf, search_radius=0.5, max_nn=8)
    normals = np.asarray(out.attributes["normals"]).T
    np.testing.assert_allclose(normals[50], [0, 0, 1])


def test_normals_attribute_survives_jit(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    jitted = jax.jit(lambda b: estimate_normals(b, 0.5, 8))
    out = jitted(buf)
    assert out.attributes["normals"].shape == (3, buf.capacity)
