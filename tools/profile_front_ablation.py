"""Honest per-stage ablation of the round-3 headline pipeline's front end.

The post-chain-fix profile (tools/profile_r3_honest.py) put the fused
neighborhood at 1.38 ms but the full headline at ~3.16 ms — so ~1.8 ms
lives in the front end (non-finite/crop/ground/voxel) and glue. This
script measures each piece in isolation with the fixed consume-every-leaf
harness (tools/device_timer), plus sub-ablations of the voxel stage
(sort alone, hilbert codes alone, segmean alone) so the optimization
target is a measured number, not a guess.

Run on the real TPU (never concurrently with another TPU benchmark).
"""
from __future__ import annotations

import sys
import time
from dataclasses import replace as dataclasses_replace

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _scene
    from tools.device_timer import device_time_ms
    from autodriver_pointcloud_preprocessor_tpu import ops
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.core.scan import ScanBuffer
    from autodriver_pointcloud_preprocessor_tpu.models import (
        PipelineParams,
        PipelineSettings,
    )
    from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
        pipeline_runner,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()

    n_points, capacity = 128_000, 131_072
    pts = _scene(n_points)
    rng = np.random.default_rng(1)
    buf, _ = from_soa(
        {
            "positions": pts,
            "intensity": rng.uniform(0, 255, n_points).astype(np.float32),
            "ring": rng.integers(0, 32, n_points).astype(np.uint16),
        },
        capacity=capacity,
    )
    params = PipelineParams.make(voxel_size=0.08, distance_threshold=0.12)
    key = jax.random.PRNGKey(0)

    settings = PipelineSettings(
        remove_statistical_outliers=True,
        nb_neighbors=20,
        estimate_normals=True,
        max_neighbors=30,
        remove_ground=True,
        ransac_n=3,
        num_iterations=100,
        knn_method="window",
        ground_before_voxel=True,
        voxel_compact_keys=True,
        post_downsample_capacity=51_200,
    )
    runner = pipeline_runner(settings)

    only = [a for a in sys.argv[1:] if not a.startswith("-")]

    def t(name, fn, *args, iters=16):
        if only and not any(o in name for o in only):
            return None
        t0 = time.perf_counter()
        ms = device_time_ms(fn, *args, iters=iters, reps=5)
        print(f"[abl] {name}: {ms:.3f} ms  (wall {time.perf_counter()-t0:.0f}s)",
              flush=True)
        return ms

    pos = buf.positions
    msk = buf.mask
    attrs = dict(buf.attributes)

    def rebuf(p, m, a):
        return ScanBuffer(positions=p, mask=m, attributes=dict(a))

    # 1. full headline pipeline (should reproduce the BENCH number)
    t("full headline", lambda p, m, a: runner(rebuf(p, m, a), params, key),
      pos, msk, attrs)

    # 1b. the same pipeline with the fast3 distance matmul (quality
    # measured identical to 'highest': tools/quality_knobs.py)
    runner_f3 = pipeline_runner(
        dataclasses_replace(settings, knn_d2mode="fast3")
    )
    t("full headline fast3",
      lambda p, m, a: runner_f3(rebuf(p, m, a), params, key),
      pos, msk, attrs)

    # 2. front trio: dedup is fused into voxel; bench has no transform.
    t("non_finite+crop",
      lambda p, m, a: ops.crop_box(
          ops.mask_non_finite(rebuf(p, m, a), True, True),
          params.roi_min, params.roi_max, params.crop_invert),
      pos, msk, attrs)

    # 3. ground RANSAC on the raw cloud (headline: ground_before_voxel)
    t("ground raw (H=100, n=3)",
      lambda p, m, a: ops.remove_ground(
          rebuf(p, m, a), key, params.distance_threshold, 3, 100,
          live_prefix=False),
      pos, msk, attrs)

    # 4. voxel with the exact headline flags
    t("voxel (dedup_exact, curve, compact box)",
      lambda p, m, a: ops.voxel_downsample(
          rebuf(p, m, a), params.voxel_size, backend="pallas",
          dedup_exact=True, curve_order=True, compact_keys="box"),
      pos, msk, attrs)

    # 4b. voxel without curve order / compact keys (plain exact path)
    t("voxel (dedup_exact, plain)",
      lambda p, m, a: ops.voxel_downsample(
          rebuf(p, m, a), params.voxel_size, backend="pallas",
          dedup_exact=True),
      pos, msk, attrs)

    # 5. voxel sub-ablations -------------------------------------------------
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        hilbert_cell_codes,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.dedup import (
        _coordinate_keys,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.pallas_segmean import (
        segmented_sums_pallas,
    )

    inv = 1.0 / 0.08
    big = jnp.int32(2**30)

    def quant_and_hilbert(p, m):
        x, y, z = p[0], p[1], p[2]
        vx = jnp.where(m, jnp.floor(x * inv).astype(jnp.int32), big)
        vy = jnp.where(m, jnp.floor(y * inv).astype(jnp.int32), big)
        vz = jnp.where(m, jnp.floor(z * inv).astype(jnp.int32), big)
        cells = []
        for v in (vx, vy, vz):
            lo = jnp.min(jnp.where(m, v, big))
            hi = jnp.max(jnp.where(m, v, -big))
            center = lo + (hi - lo) // 2
            cells.append(jnp.clip(v - center + 512, 0, 1023))
        return hilbert_cell_codes(cells, m)

    t("voxel.quant+hilbert code", lambda p, m: quant_and_hilbert(p, m),
      pos, msk)

    hk = quant_and_hilbert(pos, msk)
    kx, ky, kz = _coordinate_keys(pos, msk)
    frows = (attrs["intensity"], attrs["ring"].astype(jnp.float32))

    def sort4k2p(p, *rest):
        h = quant_and_hilbert(p, msk)  # key depends on perturbed arg
        return jax.lax.sort((h, *rest), num_keys=4, is_stable=True)

    t("voxel.sort 4key+2pay stable",
      lambda p: sort4k2p(p, kx, ky, kz, *frows), pos)

    def sort_unstable(p):
        h = quant_and_hilbert(p, msk)
        return jax.lax.sort((h, kx, ky, kz, *frows), num_keys=4,
                            is_stable=False)

    t("voxel.sort 4key+2pay UNstable", sort_unstable, pos)

    sorted_ops = jax.lax.sort((hk, kx, ky, kz, *frows), num_keys=4,
                              is_stable=True)
    shk = sorted_ops[0]
    svalid = shk < jnp.int32(0x7FFFFFFF)
    px = jax.lax.bitcast_convert_type(sorted_ops[1], jnp.float32)
    grp = jnp.ones(capacity, bool).at[1:].set(shk[1:] != shk[:-1]) & svalid
    w = svalid.astype(jnp.float32)

    def segmean(pxx):
        ch = jnp.stack([w, pxx * w, pxx * w, pxx * w, pxx * w, pxx * flag])
        return segmented_sums_pallas(ch, grp)

    flag = grp.astype(jnp.float32)
    t("voxel.segmean 6ch pallas", segmean, px)

    # 6. everything-but-neighborhood, composed exactly like the headline
    def front_all(p, m, a):
        b = rebuf(p, m, a)
        b = ops.mask_non_finite(b, True, True)
        b = ops.crop_box(b, params.roi_min, params.roi_max,
                         params.crop_invert)
        b, plane = ops.remove_ground(b, key, params.distance_threshold, 3,
                                     100, live_prefix=False)
        b = ops.voxel_downsample(b, params.voxel_size, backend="pallas",
                                 dedup_exact=True, curve_order=True,
                                 compact_keys="box")
        return b, plane

    t("front composed (finite+crop+ground+voxel)", front_all, pos, msk, attrs)


if __name__ == "__main__":
    main()
