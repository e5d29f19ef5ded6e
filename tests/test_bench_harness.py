"""Smoke coverage for the bench_suite chained-timing harness (CPU).

The suite itself runs on the real TPU; this pins the harness machinery —
jit chain with scalar data dependency, perturb hook, tuple-of-buffers
support — so refactors can't silently break the benchmark path.
"""
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autodriver_pointcloud_preprocessor_tpu.core import from_soa
from autodriver_pointcloud_preprocessor_tpu.models import (
    PipelineParams,
    PipelineSettings,
)
from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
    pipeline_runner,
)


def _tiny_buf(rng):
    pts = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    buf, _ = from_soa({"positions": pts}, capacity=1024)
    return buf


def test_chained_ms_runs_pipeline(rng):
    from bench_suite import _chained_ms

    buf = _tiny_buf(rng)
    settings = PipelineSettings(estimate_normals=False)
    params = PipelineParams.make(voxel_size=0.2)
    ms = _chained_ms(
        pipeline_runner(settings), buf, params, jax.random.PRNGKey(0),
        reps=1, K=3,
    )
    assert ms >= 1e-3  # clamped positive


def test_chain_consumes_mask_only_stages(rng):
    """DCE regression (round 3): a runner whose expensive work feeds ONLY
    the output mask must still appear in the optimized chain program.
    The old chain reduced over positions alone, so XLA deleted mask-only
    stages (RANSAC, outlier filters) and the bench read ~0 ms."""
    from bench_suite import _make_chain

    buf = _tiny_buf(rng)

    def mask_only_runner(b, _p, k):
        # the sort feeds ONLY the mask; positions pass through untouched
        order = jnp.sort(b.positions[0] * jax.random.uniform(k, ()))
        return b.replace(mask=b.mask & (order[:1] < 1e30))

    chain = _make_chain(mask_only_runner)
    hlo = (
        chain.lower(buf, None, jax.random.PRNGKey(0), n_iter=3)
        .compile()
        .as_text()
    )
    assert "sort" in hlo, "mask-only stage was dead-code-eliminated"


def test_chained_ms_perturb_hook_tuple_of_buffers(rng):
    from bench_suite import _chained_ms

    bufs = tuple(_tiny_buf(rng) for _ in range(2))

    def runner(bs, _p, _k):
        merged = bs[0].replace(
            positions=jnp.concatenate([b.positions for b in bs], axis=-1),
            mask=jnp.concatenate([b.mask for b in bs]),
            attributes={},
        )
        return merged

    def perturb(bs, acc):
        return tuple(
            b.replace(positions=b.positions * (1.0 + acc * 1e-30))
            for b in bs
        )

    ms = _chained_ms(runner, bufs, None, jax.random.PRNGKey(0),
                     reps=1, K=2, perturb=perturb)
    assert ms >= 1e-3
