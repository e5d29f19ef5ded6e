"""Segmented-sum Pallas kernel tests (interpret mode) vs scatter-add oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
from autodriver_pointcloud_preprocessor_tpu.ops.pallas_segmean import (
    segmented_sums_pallas,
)
from autodriver_pointcloud_preprocessor_tpu.ops.voxel import voxel_downsample


def _oracle(vals, flags):
    seg = np.cumsum(flags) - 1
    out = np.zeros_like(vals)
    for c in range(vals.shape[0]):
        np.add.at(out[c], seg, vals[c])
    return out, seg.max() + 1


def test_random_runs(rng):
    n = 2048
    flags = rng.uniform(size=n) < 0.13
    flags[0] = True
    vals = rng.normal(size=(5, n)).astype(np.float32)
    out = np.asarray(
        segmented_sums_pallas(jnp.asarray(vals), jnp.asarray(flags), interpret=True)
    )
    oracle, nseg = _oracle(vals, flags)
    np.testing.assert_allclose(out[:5, :nseg], oracle[:, :nseg], atol=1e-4)
    assert np.abs(out[:, nseg:]).max() == 0


def test_block_boundary_runs(rng):
    # runs engineered to straddle the 512-element kernel blocks
    n = 2048
    flags = np.zeros(n, bool)
    for start in (0, 500, 512, 513, 1023, 1024, 1536, 2047):
        flags[start] = True
    vals = rng.normal(size=(3, n)).astype(np.float32)
    out = np.asarray(
        segmented_sums_pallas(jnp.asarray(vals), jnp.asarray(flags), interpret=True)
    )
    oracle, nseg = _oracle(vals, flags)
    np.testing.assert_allclose(out[:3, :nseg], oracle[:, :nseg], atol=1e-4)


def test_single_and_all_runs(rng):
    n = 1024
    vals = rng.normal(size=(2, n)).astype(np.float32)
    # one run
    flags = np.zeros(n, bool); flags[0] = True
    out = np.asarray(
        segmented_sums_pallas(jnp.asarray(vals), jnp.asarray(flags), interpret=True)
    )
    np.testing.assert_allclose(out[:2, 0], vals.sum(1), atol=1e-3)
    assert np.abs(out[:, 1:]).max() == 0
    # every element its own run
    flags = np.ones(n, bool)
    out = np.asarray(
        segmented_sums_pallas(jnp.asarray(vals), jnp.asarray(flags), interpret=True)
    )
    np.testing.assert_allclose(out[:2], vals, atol=1e-5)


def test_voxel_pallas_backend_matches_xla(rng):
    pts = rng.uniform(-5, 5, size=(1800, 3)).astype(np.float32)
    intensity = rng.uniform(0, 255, 1800).astype(np.float32)
    ring = rng.integers(0, 16, 1800).astype(np.uint16)
    buf, _ = from_soa(
        {"positions": pts, "intensity": intensity, "ring": ring}, capacity=2048
    )
    ox = voxel_downsample(buf, 0.7, backend="xla")
    op = voxel_downsample(buf, 0.7, backend="pallas_interpret")
    assert int(valid_count(ox)) == int(valid_count(op))
    px = np.asarray(ox.positions).T[np.asarray(ox.mask)]
    pp = np.asarray(op.positions).T[np.asarray(op.mask)]
    np.testing.assert_allclose(
        px[np.lexsort(px.T)], pp[np.lexsort(pp.T)], atol=1e-4
    )
    rx = np.sort(np.asarray(ox.attributes["ring"])[np.asarray(ox.mask)])
    rp = np.sort(np.asarray(op.attributes["ring"])[np.asarray(op.mask)])
    np.testing.assert_array_equal(rx, rp)


def test_multi_step_wide_path(rng):
    # n = 8192 drives the SUB=4 path (2048-wide grid steps) across 4 grid
    # steps; mix run lengths so some runs span entire steps (pure carry),
    # some close exactly at sub-block and step boundaries.
    n = 8192
    flags = np.zeros(n, bool)
    for start in (0, 100, 511, 512, 640, 2047, 2048, 2049, 4096 - 1,
                  4096 + 128, 6143, 6144, 8191):
        flags[start] = True
    vals = rng.normal(size=(6, n)).astype(np.float32)
    out = np.asarray(
        segmented_sums_pallas(jnp.asarray(vals), jnp.asarray(flags), interpret=True)
    )
    oracle, nseg = _oracle(vals, flags)
    np.testing.assert_allclose(out[:, :nseg], oracle[:, :nseg], atol=1e-3)
    assert np.abs(out[:, nseg:]).max() == 0

    # dense random runs over the same width (many commits per step)
    flags = rng.uniform(size=n) < 0.3
    flags[0] = True
    out = np.asarray(
        segmented_sums_pallas(jnp.asarray(vals), jnp.asarray(flags), interpret=True)
    )
    oracle, nseg = _oracle(vals, flags)
    np.testing.assert_allclose(out[:, :nseg], oracle[:, :nseg], atol=1e-3)


def test_segmented_sums_vmap_batches_on_grid(rng):
    # regression: vmapping the segmean kernel crashed Mosaic ("ANY memory
    # space blocks must cover the whole array") — config6 of the bench
    # suite (batched 1M merged clouds) hit it on real TPU. custom_vmap now
    # maps batches onto a leading grid dimension with per-scan state reset.
    import jax

    b, n = 3, 1024
    vals, flags = [], []
    for s in range(b):
        r = np.random.default_rng(s)
        v = r.normal(0, 1, (5, n)).astype(np.float32)
        f = r.random(n) < 0.2
        vals.append(v)
        flags.append(f)
    vals = jnp.asarray(np.stack(vals))
    flags = jnp.asarray(np.stack(flags))

    batched = jax.vmap(
        lambda v, f: segmented_sums_pallas(v, f, interpret=True)
    )(vals, flags)
    for i in range(b):
        single = segmented_sums_pallas(vals[i], flags[i], interpret=True)
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), rtol=1e-6, atol=1e-6
        )
