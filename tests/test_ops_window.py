"""Morton-window neighborhood tests: statistical agreement with exact kNN."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
from autodriver_pointcloud_preprocessor_tpu.ops import (
    estimate_normals,
    morton_codes,
    remove_statistical_outliers,
    window_mean_knn_dist,
)
from autodriver_pointcloud_preprocessor_tpu.ops.knn import knn_exact


def _buf(points):
    return from_soa({"positions": np.asarray(points, np.float32)})


def test_morton_codes_locality(rng):
    # nearby points get nearby codes: sorted order clusters spatially
    pts = rng.uniform(0, 10, size=(512, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    codes = np.asarray(morton_codes(buf.positions, buf.mask))[:512]
    order = np.argsort(codes)
    sorted_pts = pts[order]
    step = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1)
    rand_step = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert np.median(step) < 0.5 * np.median(rand_step)


def test_morton_invalid_rows_last():
    pts = np.ones((4, 3), np.float32)
    buf, _ = _buf(pts)
    codes = np.asarray(morton_codes(buf.positions, buf.mask))
    assert (codes[4:] == 0x7FFFFFFF).all()
    assert (codes[:4] < 0x7FFFFFFF).all()


def test_hilbert_wide_true_curve_on_aligned_subcube(rng):
    """hilbert_cell_codes_wide must be a genuine 20-bit/axis Hilbert
    index: restricted to an 8^3 subcube ALIGNED to the curve hierarchy
    (offset a multiple of 8), the curve visits the subcube contiguously
    and each step moves to a face-adjacent cell. Verifies order AND
    bijectivity of the (hi, lo) int32 pair in one shot."""
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        hilbert_cell_codes_wide,
    )

    for seed in range(3):
        r = np.random.default_rng(seed)
        off = (r.integers(0, (1 << 20) // 8, 3) * 8).astype(np.int64)
        g = np.stack(
            np.meshgrid(*[np.arange(8)] * 3, indexing="ij"), 0
        ).reshape(3, -1)
        cells = [jnp.asarray((g[c] + off[c]).astype(np.int32)) for c in range(3)]
        mask = jnp.ones(512, bool)
        hi, lo = hilbert_cell_codes_wide(cells, mask)
        full = np.asarray(hi).astype(np.int64) * (1 << 30) + np.asarray(lo)
        order = np.argsort(full)
        f = full[order]
        # contiguous visit: 512 consecutive curve positions (bijective)
        assert (np.diff(f) == 1).all()
        # each step is face-adjacent: |delta| == 1 on exactly one axis
        path = g[:, order]
        d = np.abs(np.diff(path, axis=1))
        assert (d.sum(axis=0) == 1).all()

    # masked rows carry the sentinel in BOTH keys
    hi, lo = hilbert_cell_codes_wide(
        [jnp.zeros(4, jnp.int32)] * 3, jnp.array([True, False, True, False])
    )
    assert np.asarray(hi)[1] == 0x7FFFFFFF and np.asarray(lo)[3] == 0x7FFFFFFF
    assert np.asarray(hi)[0] < 0x7FFFFFFF


def test_window_mean_knn_vs_exact(rng):
    # surface-like cloud (LiDAR-ish): window stats track exact kNN closely
    xy = rng.uniform(-5, 5, size=(2000, 2)).astype(np.float32)
    z = 0.05 * np.sin(xy[:, 0]) + rng.normal(0, 0.01, 2000)
    pts = np.column_stack([xy, z]).astype(np.float32)
    buf, _ = _buf(pts)
    k = 10
    approx = np.asarray(
        window_mean_knn_dist(buf.positions, buf.mask, k=k)
    )[:2000]
    d_exact, _ = knn_exact(buf.positions, buf.mask, k=k)
    d_exact = np.sqrt(np.asarray(d_exact))[:2000]
    exact_mean = d_exact.mean(axis=1)
    rel_err = np.abs(approx - exact_mean) / np.maximum(exact_mean, 1e-9)
    # window estimates are exact-or-overestimates (missed neighbors only
    # push distances up); slack covers the cancellation noise of the
    # brute-force |q|^2+|p|^2-2qp oracle formula
    assert (approx >= exact_mean * (1 - 1e-3) - 1e-5).all()
    # approximate: majority exact, tail bounded (consumers are statistical
    # filters; see test_outliers_window_vs_exact_agreement for the
    # application-level gate)
    assert (rel_err < 1e-5).mean() > 0.55
    assert np.median(rel_err) < 1e-4
    assert np.percentile(rel_err, 99) < 0.6


def test_outliers_window_vs_exact_agreement(rng):
    cluster = rng.normal(0, 0.5, size=(3000, 3)).astype(np.float32)
    outliers = rng.uniform(8, 12, size=(30, 3)).astype(np.float32)
    pts = np.vstack([cluster, outliers])
    buf, _ = _buf(pts)
    exact = remove_statistical_outliers(buf, 16, 2.0, method="exact")
    window = remove_statistical_outliers(buf, 16, 2.0, method="window")
    me = np.asarray(exact.mask)[: pts.shape[0]]
    mw = np.asarray(window.mask)[: pts.shape[0]]
    assert (me == mw).mean() > 0.98
    # injected outliers are removed by both
    assert mw[3000:].sum() == 0


def test_normals_window_vs_exact_agreement(rng):
    xy = rng.uniform(-2, 2, size=(3000, 2)).astype(np.float32)
    z = 0.5 * xy[:, 0] - 0.25 * xy[:, 1]
    pts = np.column_stack([xy, z]).astype(np.float32)
    buf, _ = _buf(pts)
    exact = estimate_normals(buf, search_radius=0.5, max_nn=24, method="exact")
    window = estimate_normals(buf, search_radius=0.5, max_nn=24, method="window")
    ne = np.asarray(exact.attributes["normals"]).T[:3000]
    nw = np.asarray(window.attributes["normals"]).T[:3000]
    dots = np.abs(np.sum(ne * nw, axis=1))
    assert (dots > 0.999).mean() > 0.98


def test_window_respects_mask(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    dead = np.asarray(buf.mask).copy()
    dead[250:] = False
    md = window_mean_knn_dist(buf.positions, jnp.asarray(dead), k=5)
    md = np.asarray(md)
    assert (md[250:] == 0).all()
    assert (md[:250] > 0).all()


def test_fused_reordered_matches_unsorted_stats(rng):
    # the reordered variant must produce the same (point -> stats) pairs
    # as fused_neighborhood_stats, just in curve order instead of input
    # order; attributes must ride along consistently
    import jax.numpy as jnp

    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats,
        fused_neighborhood_stats_reordered,
    )

    n = 512
    pts = rng.normal(0, 1, (n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::37] = False
    pos = jnp.stack([jnp.asarray(pts[:, i]) for i in range(3)])
    m = jnp.asarray(valid)
    ring = jnp.asarray(rng.integers(0, 16, n).astype(np.uint16))

    mean_u, normals_u, cnt_u = fused_neighborhood_stats(
        pos, m, k=8, radius=0.6, window_blocks=1, passes=2,
        backend="pallas_interpret",
    )
    pos_r, m_r, attrs_r, mean_r, normals_r, cnt_r = (
        fused_neighborhood_stats_reordered(
            pos, m, {"ring": ring}, k=8, radius=0.6, window_blocks=1,
            passes=2, backend="pallas_interpret",
        )
    )
    # same live-point multiset
    assert int(np.asarray(m_r).sum()) == int(valid.sum())
    pu = np.asarray(pos).T[valid]
    pr = np.asarray(pos_r).T[np.asarray(m_r)]
    # match reordered rows back to input rows by position
    order_u = np.lexsort(pu.T)
    order_r = np.lexsort(pr.T)
    np.testing.assert_allclose(pu[order_u], pr[order_r], atol=0)
    # stats travel with their points
    mu = np.asarray(mean_u)[valid][order_u]
    mr = np.asarray(mean_r)[np.asarray(m_r)][order_r]
    np.testing.assert_allclose(mu, mr, atol=1e-6)
    nu = np.asarray(normals_u).T[valid][order_u]
    nr = np.asarray(normals_r).T[np.asarray(m_r)][order_r]
    np.testing.assert_allclose(np.abs((nu * nr).sum(1)), 1.0, atol=1e-5)
    # attributes travel with their points
    ru = np.asarray(ring)[valid][order_u]
    rr = np.asarray(attrs_r["ring"])[np.asarray(m_r)][order_r]
    np.testing.assert_array_equal(ru, rr)


def test_fused_reordered_vmaps(rng):
    # process_batch runs the reordered fused stage under vmap on TPU; the
    # sort-chain + custom_vmap kernel composition must batch cleanly
    import jax
    import jax.numpy as jnp

    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )

    n, b = 512, 3
    stacks, masks = [], []
    for s in range(b):
        r = np.random.default_rng(s)
        pts = r.normal(0, 1, (n, 3)).astype(np.float32)
        valid = np.ones(n, bool)
        valid[:: (29 + s)] = False
        stacks.append(pts.T)
        masks.append(valid)
    pos = jnp.asarray(np.stack(stacks))
    msk = jnp.asarray(np.stack(masks))

    def one(p, m):
        out = fused_neighborhood_stats_reordered(
            p, m, {}, k=6, radius=0.6, window_blocks=1, passes=2,
            backend="pallas_interpret",
        )
        pos_r, mask_r, _attrs, mean_r, normals_r, cnt_r = out
        return pos_r, mask_r, mean_r, normals_r, cnt_r

    bp, bm, bmean, bnorm, bcnt = jax.vmap(one)(pos, msk)
    for i in range(b):
        sp, sm, smean, snorm, scnt = one(pos[i], msk[i])
        np.testing.assert_allclose(np.asarray(bp[i]), np.asarray(sp), atol=0)
        np.testing.assert_array_equal(np.asarray(bm[i]), np.asarray(sm))
        np.testing.assert_allclose(
            np.asarray(bmean[i]), np.asarray(smean), rtol=1e-6, atol=1e-6
        )


def test_window_quality_floor_vs_exact(rng):
    # quality regression floor: the jittered 2-pass default must keep
    # outlier-classification agreement vs EXACT kNN above 93% on this
    # scene (measured 97.0% at 8k after the large-origin-jitter fix;
    # 87.4% before it — this test would have caught shipping without it)
    import jax.numpy as jnp

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import mask_non_finite
    from autodriver_pointcloud_preprocessor_tpu.ops.knn import knn_exact
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats,
    )
    import bench as B

    pts = B._scene(8000)
    buf, _ = from_soa({"positions": pts}, capacity=8192)
    buf = mask_non_finite(buf, True, True)
    pos, mask = buf.positions, buf.mask
    k = 20
    d2k, _ = knn_exact(pos, mask, k=k)
    d2k = np.asarray(d2k)
    fin = np.isfinite(d2k)
    exact = np.sqrt(np.where(fin, d2k, 0.0)).sum(1) / np.maximum(fin.sum(1), 1)
    v = np.asarray(mask)
    ce = exact[v] <= exact[v].mean() + exact[v].std()
    mean, _, _ = fused_neighborhood_stats(
        pos, mask, k=k, radius=0.1, window_blocks=1, passes=2, backend="xla"
    )
    mw = np.asarray(mean)[v]
    cw = mw <= mw.mean() + mw.std()
    agree = (ce == cw).mean()
    assert agree > 0.93, agree


def test_bisect_kmode_quality_floor(rng):
    # kmode='bisect' regression floor (ADVICE r2 item 4 follow-up): at
    # _BISECT=9 the bisection band was wide enough to cost real quality
    # (92.7% bench8k / 85.8% ring15k agreement — below the floors); 13
    # iterations restore sweep-level agreement (measured 97.0% / 99.8%,
    # tools/quality_bisect_iters.py). This pins the bench8k number so a
    # future iteration-count "optimization" cannot silently regress it.
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import mask_non_finite
    from autodriver_pointcloud_preprocessor_tpu.ops.knn import knn_exact
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats,
    )
    import bench as B

    pts = B._scene(8000)
    buf, _ = from_soa({"positions": pts}, capacity=8192)
    buf = mask_non_finite(buf, True, True)
    pos, mask = buf.positions, buf.mask
    k = 20
    d2k, _ = knn_exact(pos, mask, k=k)
    d2k = np.asarray(d2k)
    fin = np.isfinite(d2k)
    exact = np.sqrt(np.where(fin, d2k, 0.0)).sum(1) / np.maximum(fin.sum(1), 1)
    v = np.asarray(mask)
    ce = exact[v] <= exact[v].mean() + exact[v].std()
    mean, _, _ = fused_neighborhood_stats(
        pos, mask, k=k, radius=0.1, window_blocks=1, passes=2,
        backend="pallas_interpret", kmode="bisect",
    )
    mw = np.asarray(mean)[v]
    cw = mw <= mw.mean() + mw.std()
    agree = (ce == cw).mean()
    assert agree > 0.93, agree


def test_window_quality_floor_ring_structured_scan():
    # VERDICT r2 missing #2: quality on a REAL-structured scan, not only
    # uniform noise. The fixture is one synthetic VLP-16 revolution
    # (ground rings + wall stripes) decoded through the production packet
    # decoder (tools/make_ring_fixture.py). Ring/azimuth structure helps
    # the curve windows — curve-adjacent points ARE the spatial neighbors
    # along a ring — measured 99.8% agreement at the 2-pass default
    # (92.8% at 1 pass). Floor pinned at 97%.
    import os

    from scipy.spatial import cKDTree

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats,
    )

    path = os.path.join(os.path.dirname(__file__), "fixtures", "ring_scene.npz")
    pts = np.load(path)["positions"]
    buf, _ = from_soa({"positions": pts}, capacity=16384)
    k = 20
    exact = cKDTree(pts).query(pts, k=k)[0].mean(axis=1)
    mean, _, _ = fused_neighborhood_stats(
        buf.positions, buf.mask, k=k, radius=0.1, window_blocks=1,
        passes=2, backend="xla",
    )
    mw = np.asarray(mean)[np.asarray(buf.mask)][: len(exact)]
    ce = exact <= exact.mean() + exact.std()
    cw = mw <= mw.mean() + mw.std()
    agree = (ce == cw).mean()
    assert agree > 0.97, agree


def test_radius_outlier_window_quality_floor():
    # VERDICT r2 item 10: quality floor for the RADIUS-outlier window path
    # (in-radius counts, window_normal_stats count channel / kernel row 12).
    # Measured: 100% classification agreement and 99.95% mean count recall
    # vs an exact KD-tree oracle at the 2-pass default on the bench scene.
    from scipy.spatial import cKDTree

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        window_normal_stats,
    )
    import bench as B

    pts = B._scene(8000)
    pts = pts[np.isfinite(pts).all(1)]
    buf, _ = from_soa({"positions": pts}, capacity=8192)
    radius, nb = 0.35, 8
    exact = np.array(
        cKDTree(pts).query_ball_point(pts, radius, return_length=True)
    )
    _e, cnt = window_normal_stats(
        buf.positions, buf.mask, radius, window_blocks=1, passes=2,
        backend="xla",
    )
    cw = np.asarray(cnt)[np.asarray(buf.mask)][: len(pts)]
    agree = ((cw >= nb) == (exact >= nb)).mean()
    assert agree > 0.99, agree
    recall = np.minimum(cw / np.maximum(exact, 1), 1).mean()
    assert recall > 0.98, recall


def test_fused_presorted_matches_sorted_on_curve_ordered_input(rng):
    # presorted mode (the curve-ordered-voxel fast path,
    # models/pipeline.py) skips the pass-0 sort; on input that IS
    # curve-ordered and front-compacted its pass-0 windows come from the
    # voxel-cell hilbert order instead of the position-quantized one —
    # slightly different window membership, so assert statistical
    # agreement plus exact mechanics (shrink slice, attribute transport).
    import jax.numpy as jnp

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import voxel_downsample
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )

    n = 4096
    pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    buf, _ = from_soa(
        {"positions": pts,
         "ring": rng.integers(0, 16, n).astype(np.uint16)},
        capacity=n,
    )
    vox = voxel_downsample(buf, 0.35, backend="xla", curve_order=True)
    live = int(np.asarray(vox.mask).sum())
    assert live > 2048  # shrink below will actually slice

    outs = {}
    for presorted in (False, True):
        out = fused_neighborhood_stats_reordered(
            vox.positions, vox.mask, dict(vox.attributes), k=8, radius=0.8,
            window_blocks=1, passes=2, backend="pallas_interpret",
            shrink_to=0, presorted=presorted,
        )
        pos_r, m_r, attrs_r, mean_r = out[0], out[1], out[2], out[3]
        m = np.asarray(m_r)
        P = np.asarray(pos_r).T[m]
        order = np.lexsort(P.T)
        outs[presorted] = (
            P[order],
            np.asarray(mean_r)[m][order],
            np.asarray(attrs_r["ring"])[m][order],
        )
    # same live-point set, attributes transported identically
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=0)
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
    # kNN means agree closely for nearly all points (window membership
    # differs only where the two curve orders cut blocks differently)
    rel = np.abs(outs[0][1] - outs[1][1]) / np.maximum(outs[0][1], 1e-6)
    assert (rel < 0.05).mean() > 0.9, (rel < 0.05).mean()

    # shrink: no-overflow prefix slice keeps every live point
    cap = 2560  # multiple of 128, > live/2... ensure >= live? choose below
    cap = ((live + 127) // 128) * 128
    out = fused_neighborhood_stats_reordered(
        vox.positions, vox.mask, dict(vox.attributes), k=8, radius=0.8,
        window_blocks=1, passes=2, backend="pallas_interpret",
        shrink_to=cap, presorted=True,
    )
    assert out[0].shape[-1] == cap
    assert int(np.asarray(out[1]).sum()) == live

    # overflow: the cond fallback thins to ~cap without bias
    cap_small = 1280
    out = fused_neighborhood_stats_reordered(
        vox.positions, vox.mask, dict(vox.attributes), k=8, radius=0.8,
        window_blocks=1, passes=2, backend="pallas_interpret",
        shrink_to=cap_small, presorted=True,
    )
    kept = int(np.asarray(out[1]).sum())
    assert 0.7 * cap_small < kept <= cap_small


def test_presorted_quality_floor_ring_structured_scan():
    # quality floor for the PRODUCTION presorted path (pass-0 = the
    # curve-ordered voxel sort's hilbert-of-voxel-cell order) on the
    # ring-structured fixture: voxelize, then window-kNN means vs an
    # exact KD-tree oracle over the voxel survivors. End-to-end at the
    # bench config this path measures 0.990 survivor jaccard vs
    # knn_method='exact' (PERF_NOTES "Round-3 endgame").
    import os

    from scipy.spatial import cKDTree

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import voxel_downsample
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )

    path = os.path.join(os.path.dirname(__file__), "fixtures", "ring_scene.npz")
    pts = np.load(path)["positions"]
    buf, _ = from_soa({"positions": pts}, capacity=16384)
    vox = voxel_downsample(buf, 0.12, backend="xla", curve_order=True,
                           compact_keys=True)
    live = np.asarray(vox.mask)
    vp = np.asarray(vox.positions)[:, live].T
    k = 20
    exact = cKDTree(vp).query(vp, k=k)[0].mean(axis=1)

    out = fused_neighborhood_stats_reordered(
        vox.positions, vox.mask, {}, k=k, radius=0.1, window_blocks=1,
        passes=2, backend="pallas_interpret", presorted=True,
    )
    pos_r, m_r, _attrs, mean_r = out[0], out[1], out[2], out[3]
    m = np.asarray(m_r)
    Pr = np.asarray(pos_r)[:, m].T
    mw = np.asarray(mean_r)[m]
    # align reordered outputs to oracle rows by position
    oa = np.lexsort(vp.T)
    ob = np.lexsort(Pr.T)
    np.testing.assert_allclose(vp[oa], Pr[ob], atol=0)
    ce = exact[oa] <= exact.mean() + exact.std()
    cw = mw[ob] <= mw[ob].mean() + mw[ob].std()
    agree = (ce == cw).mean()
    assert agree > 0.97, agree


def test_window_bounds_match_default_on_live_bbox(rng):
    # `bounds` threading (sharded global-bbox quantization): passing the
    # live bounding box explicitly must reproduce the default (internally
    # computed) quantization bit-for-bit, on both the sort codes and the
    # window stats.
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        hilbert_codes, window_normal_stats,
    )

    pts = rng.uniform(-8, 8, size=(2000, 3)).astype(np.float32)
    buf, _ = _buf(pts)
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(buf.mask[None, :], buf.positions, big), axis=-1)
    hi = jnp.max(jnp.where(buf.mask[None, :], buf.positions, -big), axis=-1)

    c_default = np.asarray(hilbert_codes(buf.positions, buf.mask, 128.0))
    c_bounds = np.asarray(
        hilbert_codes(buf.positions, buf.mask, 128.0, bounds=(lo, hi))
    )
    np.testing.assert_array_equal(c_default, c_bounds)

    m_default = window_mean_knn_dist(buf.positions, buf.mask, k=8)
    m_bounds = window_mean_knn_dist(
        buf.positions, buf.mask, k=8, bounds=(lo, hi)
    )
    np.testing.assert_array_equal(np.asarray(m_default), np.asarray(m_bounds))

    e_default, n_default = window_normal_stats(buf.positions, buf.mask, 0.5)
    e_bounds, n_bounds = window_normal_stats(
        buf.positions, buf.mask, 0.5, bounds=(lo, hi)
    )
    np.testing.assert_array_equal(np.asarray(e_default), np.asarray(e_bounds))
    np.testing.assert_array_equal(np.asarray(n_default), np.asarray(n_bounds))


def test_window_bounds_enlarged_box_still_accurate(rng):
    # a DIFFERENT (larger) quantization box changes the curve but must not
    # change what the stats mean: kNN-mean classification stays accurate
    # (this is the sharded regime, where the global box is larger than any
    # one shard's local bbox).
    xy = rng.uniform(-5, 5, size=(3000, 2)).astype(np.float32)
    z = 0.05 * np.sin(xy[:, 0]) + rng.normal(0, 0.01, 3000)
    pts = np.column_stack([xy, z]).astype(np.float32)
    buf, _ = _buf(pts)
    lo = jnp.asarray([-20.0, -20.0, -20.0], jnp.float32)
    hi = jnp.asarray([20.0, 20.0, 20.0], jnp.float32)
    k = 8
    approx = np.asarray(
        window_mean_knn_dist(buf.positions, buf.mask, k=k, bounds=(lo, hi))
    )[:3000]
    d_exact, _ = knn_exact(buf.positions, buf.mask, k=k)
    exact_mean = np.sqrt(np.asarray(d_exact))[:3000].mean(axis=1)
    thr_a = approx.mean() + approx.std()
    thr_e = exact_mean.mean() + exact_mean.std()
    agree = ((approx <= thr_a) == (exact_mean <= thr_e)).mean()
    # slightly looser than the local-box floor: a 4x larger box costs two
    # levels of curve resolution (measured 0.9697 here vs 0.973 local)
    assert agree > 0.96, agree


def test_presorted_quality_floor_bench_fast_profile():
    # floor for the BENCH fast profile (window_blocks=0 one-sided windows
    # alternating direction across passes=3, d2mode='fast3') on the
    # presorted production path. Measured round 3
    # (tools/quality_presorted_knobs.py, 32k bench scene -> voxel 0.08):
    # 96.1% outlier-classification agreement vs exact KD-tree (prod
    # wb1/p2/highest: 96.7%); wb0 at passes=2 measured 93.0% — BELOW this
    # floor, which is what pins passes=3 for the wb0 profile.
    from scipy.spatial import cKDTree

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import (
        mask_non_finite,
        voxel_downsample,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )
    import bench as B

    pts = B._scene(16_000)
    buf, _ = from_soa({"positions": pts}, capacity=16384)
    buf = mask_non_finite(buf, True, True)
    vox = voxel_downsample(buf, 0.08, backend="xla", curve_order=True,
                           compact_keys=True)
    live = np.asarray(vox.mask)
    vp = np.asarray(vox.positions)[:, live].T
    k = 20
    exact = cKDTree(vp).query(vp, k=k)[0].mean(axis=1)

    out = fused_neighborhood_stats_reordered(
        vox.positions, vox.mask, {}, k=k, radius=0.1, window_blocks=0,
        passes=3, d2mode="fast3", backend="pallas_interpret",
        presorted=True,
    )
    pos_r, m_r, _attrs, mean_r = out[0], out[1], out[2], out[3]
    m = np.asarray(m_r)
    Pr = np.asarray(pos_r)[:, m].T
    mw = np.asarray(mean_r)[m]
    oa = np.lexsort(vp.T)
    ob = np.lexsort(Pr.T)
    np.testing.assert_allclose(vp[oa], Pr[ob], atol=0)
    ce = exact[oa] <= exact.mean() + exact.std()
    cw = mw[ob] <= mw[ob].mean() + mw[ob].std()
    agree = (ce == cw).mean()
    assert agree > 0.94, agree


def test_mixed_window_blocks_tuple(rng):
    # per-pass window_blocks tuple: (1, 0) = symmetric first pass +
    # one-sided second. Means must be >= the wb1-everywhere result minus
    # merge tolerance (a narrower second pass can only see fewer
    # candidates -> its min-merge can only RAISE the mean), and the XLA
    # fallback must accept the tuple (collapses to max).
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats,
    )

    pts = rng.normal(size=(1000, 3)).astype(np.float32) * 2.0
    buf, _ = from_soa({"positions": pts}, capacity=1024)
    pos, mask = buf.positions, buf.mask
    m_mixed, _, c_mixed = fused_neighborhood_stats(
        pos, mask, k=8, radius=0.5, window_blocks=(1, 0), passes=2,
        backend="pallas_interpret",
    )
    m_full, _, _ = fused_neighborhood_stats(
        pos, mask, k=8, radius=0.5, window_blocks=1, passes=2,
        backend="pallas_interpret",
    )
    v = np.asarray(mask)
    a, b = np.asarray(m_mixed)[v], np.asarray(m_full)[v]
    # the mixed profile sees a subset of the full profile's candidates
    assert (a >= b - 1e-5).all()
    # but most points already find their k nearest in the first pass
    assert (np.abs(a - b) < 1e-6).mean() > 0.8
    # XLA fallback accepts the tuple
    m_xla, _, _ = fused_neighborhood_stats(
        pos, mask, k=8, radius=0.5, window_blocks=(1, 0), passes=2,
        backend="xla",
    )
    assert np.isfinite(np.asarray(m_xla)[v]).all()


def test_xla_chunking_handles_non_divisor_block_counts(rng):
    # Found round 4 by the 16k-slab halo study: halo-extended sharded
    # slabs make nb (row blocks) a NON-multiple of chunk_blocks (e.g.
    # 17408/128 = 136 vs chunk_blocks=64) and _map_chunks silently
    # dropped the remainder blocks, crashing the unsort scatter.
    # _chunk_size now picks the largest divisor <= chunk_blocks; the
    # result must be identical to the single-chunk run.
    n = 136 * 128  # 136 blocks: 136 % 64 != 0
    pts = rng.normal(size=(n - 50, 3)).astype(np.float32) * 5.0
    buf, _ = from_soa({"positions": pts}, capacity=n)
    kw = dict(k=8, window_blocks=2, passes=1, backend="xla")
    m_chunked = window_mean_knn_dist(
        buf.positions, buf.mask, chunk_blocks=64, **kw
    )
    m_one = window_mean_knn_dist(
        buf.positions, buf.mask, chunk_blocks=136, **kw
    )
    np.testing.assert_allclose(
        np.asarray(m_chunked), np.asarray(m_one), rtol=1e-6, atol=1e-6
    )


def test_window_quality_floor_hdl32_multirev_scan():
    # VERDICT r3 item 8: a SECOND structured fixture beyond the VLP-16
    # ring scene — 3 HDL-32E revolutions with moving box clusters and
    # dual-return packets (tools/make_hdl32_fixture.py), decoded through
    # the production packet decoder. Dual-return mode duplicates most
    # rays exactly (the canopy rays split into two distinct points), so
    # the test dedups first, mirroring the reference pipeline order
    # (remove_duplicates precedes the outlier stages). Measured 99.7%
    # agreement at the 2-pass default; floor pinned at 98%.
    import os

    from scipy.spatial import cKDTree

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats,
    )

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "hdl32_scene.npz")
    d = np.load(path)
    raw = d["positions"]
    pts = np.unique(raw, axis=0)
    # fixture structure pins: dual-return duplication (about half the
    # points collapse) and multi-revolution motion smear (movers cover
    # more azimuth than one revolution's box width)
    assert len(pts) < 0.6 * len(raw)
    assert len(np.unique(d["ring"])) >= 30
    buf, _ = from_soa({"positions": pts}, capacity=65536)
    k = 20
    exact = cKDTree(pts).query(pts, k=k)[0].mean(axis=1)
    mean, _, _ = fused_neighborhood_stats(
        buf.positions, buf.mask, k=k, radius=0.1, window_blocks=1,
        passes=2, backend="xla",
    )
    mw = np.asarray(mean)[np.asarray(buf.mask)][: len(pts)]
    ce = exact <= exact.mean() + exact.std()
    cw = mw <= mw.mean() + mw.std()
    agree = (ce == cw).mean()
    assert agree > 0.98, agree


def test_presorted_quality_floor_shipped_csel_profile():
    # floor for the SHIPPED round-4 production profile (window_blocks
    # (1, 0), passes=2, d2mode='fast3', kmode='csel') on the presorted
    # path. Measured round 4 (tools/quality_presorted_knobs.py, 32k
    # bench scene -> voxel 0.08): 94.92% outlier-classification
    # agreement vs exact KD-tree (exact-sweep same windows: 95.15%).
    # Floor 93% — the same bar the round-3 profile was held to.
    from scipy.spatial import cKDTree

    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops import (
        mask_non_finite,
        voxel_downsample,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )
    import bench as B

    pts = B._scene(16_000)
    buf, _ = from_soa({"positions": pts}, capacity=16384)
    buf = mask_non_finite(buf, True, True)
    vox = voxel_downsample(buf, 0.08, backend="xla", curve_order=True,
                           compact_keys=True)
    live = np.asarray(vox.mask)
    vp = np.asarray(vox.positions)[:, live].T
    k = 20
    exact = cKDTree(vp).query(vp, k=k)[0].mean(axis=1)

    out = fused_neighborhood_stats_reordered(
        vox.positions, vox.mask, {}, k=k, radius=0.1,
        window_blocks=(1, 0), passes=2, d2mode="fast3", kmode="csel",
        backend="pallas_interpret", presorted=True,
    )
    pos_r, m_r, _attrs, mean_r = out[0], out[1], out[2], out[3]
    m = np.asarray(m_r)
    Pr = np.asarray(pos_r)[:, m].T
    mw = np.asarray(mean_r)[m]
    oa = np.lexsort(vp.T)
    ob = np.lexsort(Pr.T)
    np.testing.assert_allclose(vp[oa], Pr[ob], atol=0)
    ce = exact[oa] <= exact.mean() + exact.std()
    cw = mw[ob] <= mw[ob].mean() + mw[ob].std()
    agree = (ce == cw).mean()
    assert agree > 0.93, agree


def test_entries_merge_off_matches_means_and_normal_quality(rng):
    # normals_merge_passes=False (round 4, shipped): kNN means must be
    # BIT-IDENTICAL (the mean merge is untouched); normals come from
    # pass 0 only — on the bench scene the vs-exact-PCA agreement is
    # identical with or without the merge (95.0% within 10 degrees), so
    # this pins alignment + mean equality and that the two modes' normal
    # fields agree for the large majority of points.
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )

    pts = rng.normal(size=(1500, 3)).astype(np.float32) * 2.0
    buf, _ = from_soa({"positions": pts}, capacity=2048)
    outs = {}
    for em in (True, False):
        outs[em] = fused_neighborhood_stats_reordered(
            buf.positions, buf.mask, {}, k=8, radius=0.5,
            window_blocks=(1, 0), passes=2, d2mode="fast3", kmode="csel",
            backend="pallas_interpret", entries_merge=em,
        )
    m1, m2 = np.asarray(outs[True][1]), np.asarray(outs[False][1])
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(
        np.asarray(outs[True][3])[m1], np.asarray(outs[False][3])[m2]
    )
    n1 = np.asarray(outs[True][4])[:, m1]
    n2 = np.asarray(outs[False][4])[:, m2]
    dot = np.abs((n1 * n2).sum(0))
    assert np.median(dot) > 0.999
    assert (dot > 0.99).mean() > 0.85  # ~9% legitimately take pass-0's window


def test_default_backend_rejects_bogus_env(monkeypatch):
    """A typo'd APC_WINDOW_BACKEND must fail loudly at resolution time, not
    as an opaque Mosaic lowering error later (ADVICE r4)."""
    from autodriver_pointcloud_preprocessor_tpu.ops.window import default_backend

    monkeypatch.setenv("APC_WINDOW_BACKEND", "palas")
    with pytest.raises(ValueError, match="APC_WINDOW_BACKEND"):
        default_backend()
    monkeypatch.setenv("APC_WINDOW_BACKEND", "xla")
    assert default_backend() == "xla"


def test_window_blocks_row_packing_bound():
    """window_blocks > 7 would alias the 11-bit mantissa row packing
    ((2*wb+1)*128 <= 2048) — both the kernel entry and PipelineSettings
    must reject it (ADVICE r4)."""
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        PipelineSettings,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.pallas_window import (
        window_stats_pallas,
    )

    z = jnp.zeros((1024,), jnp.float32)
    v = jnp.ones((1024,), bool)
    with pytest.raises(ValueError, match="window_blocks"):
        window_stats_pallas(z, z, z, v, 0.5, k=4, window_blocks=8,
                            interpret=True)
    with pytest.raises(ValueError, match="window_blocks"):
        PipelineSettings(window_blocks=8)
    with pytest.raises(ValueError, match="window_blocks"):
        PipelineSettings(window_blocks=(1, 8), neighborhood_passes=2)


def test_standalone_ops_thread_per_pass_window_tuples(rng):
    """VERDICT r4 weak #4: standalone (unfused) window ops must honor
    per-pass window_blocks tuples instead of silently collapsing to max.

    mean-kNN estimates are min-merged across passes and monotonically
    improve (shrink) with wider windows, so uniform-wide <= mixed <=
    uniform-narrow elementwise, with strict difference from the old
    max-collapse behavior (== uniform-wide)."""
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        window_mean_knn_dist,
    )

    n = 2048
    pts = jnp.asarray(rng.uniform(-5, 5, size=(3, n)), jnp.float32)
    mask = jnp.ones((n,), bool)

    def run(wb):
        return np.asarray(
            window_mean_knn_dist(
                pts, mask, k=8, window_blocks=wb, passes=2, backend="xla"
            )
        )

    wide = run(2)       # == the old max-collapse of (2, 0)
    mixed = run((2, 0))
    narrow = run(0)
    assert (wide <= mixed + 1e-6).all()
    assert (mixed <= narrow + 1e-6).all()
    # the tuple genuinely reaches the second pass: the mixed result must
    # differ from the uniform-wide (max-collapsed) one somewhere
    assert (mixed > wide + 1e-6).any()

    # tuple length mismatches fail loudly at the op boundary too
    with pytest.raises(ValueError, match="window_blocks"):
        run((2, 0, 1))


def test_sharded_window_kwargs_preserve_tuple():
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        PipelineSettings,
    )
    from autodriver_pointcloud_preprocessor_tpu.parallel.sharding import (
        _window_kwargs,
    )

    s = PipelineSettings(window_blocks=(1, 0), neighborhood_passes=2)
    assert _window_kwargs(s)["window_blocks"] == (1, 0)


def test_oct_encode_roundtrip(rng):
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        _oct_decode,
        _oct_encode,
    )

    v = rng.normal(size=(3, 4096)).astype(np.float32)
    v /= np.linalg.norm(v, axis=0, keepdims=True)
    u, w = _oct_encode(jnp.asarray(v[0]), jnp.asarray(v[1]), jnp.asarray(v[2]))
    x, y, z = _oct_decode(u, w)
    back = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)])
    np.testing.assert_allclose((back * v).sum(0), 1.0, atol=1e-6)
    # the (0,0,1) fallback of degenerate normals roundtrips exactly
    u0, w0 = _oct_encode(jnp.zeros(4), jnp.zeros(4), jnp.ones(4))
    x0, y0, z0 = _oct_decode(u0, w0)
    np.testing.assert_array_equal(np.asarray(z0), 1.0)


def test_carry_count_false_same_stats(rng):
    """carry_count=False (round 5): identical means/normals, count zeroed."""
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        fused_neighborhood_stats_reordered,
    )

    pts = rng.normal(size=(1500, 3)).astype(np.float32) * 2.0
    buf, _ = from_soa({"positions": pts}, capacity=2048)
    outs = {}
    for cc in (True, False):
        outs[cc] = fused_neighborhood_stats_reordered(
            buf.positions, buf.mask, {}, k=8, radius=0.5,
            window_blocks=(1, 0), passes=2, d2mode="fast3", kmode="csel",
            backend="pallas_interpret", entries_merge=False, carry_count=cc,
        )
    m1, m2 = np.asarray(outs[True][1]), np.asarray(outs[False][1])
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(
        np.asarray(outs[True][3]), np.asarray(outs[False][3])
    )
    np.testing.assert_array_equal(
        np.asarray(outs[True][4]), np.asarray(outs[False][4])
    )
    assert (np.asarray(outs[False][5]) == 0).all()  # count zeroed, documented
