"""Sharded window-kNN boundary residual vs halo width, at a given slab size.

Replicates the round-3 protocol (PERF_NOTES.md "sharded window path"):
plane+cluster scene, statistical-outlier-ONLY stage (the keep-mask IS the
kNN-mean classification), knn_method='window', k=8, std_ratio=1, global-
bounds quantization — agreement = keep-mask match with the single-device
window pipeline on live points, evaluated in the shard frame (spatial
sort). Round 3 measured 8 slabs of 2048 (16k capacity); VERDICT r3 item 4
asks for the PRODUCTION slab size: 131072/8 = 16384-point slabs.

Run on the 8-virtual-CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/halo_study.py [capacity ...]
(the script pins jax_platforms='cpu' itself; default capacities 16384 and
131072). Prints one agreement row per (capacity, halo).
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autodriver_pointcloud_preprocessor_tpu.core import from_soa  # noqa: E402
from autodriver_pointcloud_preprocessor_tpu.models import (  # noqa: E402
    PipelineParams,
    PipelineSettings,
    build_pipeline,
)
from autodriver_pointcloud_preprocessor_tpu.parallel import (  # noqa: E402
    build_sharded_pipeline,
    make_mesh,
    shard_buffer,
)
from autodriver_pointcloud_preprocessor_tpu.parallel.sharding import (  # noqa: E402
    spatial_sort,
)


def scene(rng, n):
    """Plane + clusters, the round-3 study's family scaled to n points."""
    n_ground = int(n * 0.8)
    n_obj = n - n_ground
    ground = np.column_stack(
        [rng.uniform(-10, 10, (2, n_ground)).T, rng.normal(0, 0.02, n_ground)]
    )
    obj = rng.normal([0, 0, 2.0], 0.4, (n_obj, 3))
    return np.vstack([ground, obj]).astype(np.float32)


def study(capacity: int, halos=(0, 512)):
    assert len(jax.devices()) >= 8 and jax.default_backend() == "cpu", (
        jax.default_backend(), len(jax.devices()))
    rng = np.random.default_rng(0)
    pts = scene(rng, capacity - capacity // 16)  # ~94% fill like round 3
    buf, _ = from_soa({"positions": pts}, capacity=capacity)
    settings = PipelineSettings(
        remove_duplicates=False, crop_to_roi=False, voxel_downsample=False,
        estimate_normals=False, remove_statistical_outliers=True,
        nb_neighbors=8, knn_method="window",
    )
    params = PipelineParams.make(std_ratio=1.0)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh()
    sb = shard_buffer(buf, mesh)

    ref, _ = build_pipeline(settings)(spatial_sort(buf), params, key)
    m_ref = np.asarray(ref.mask)
    live = np.asarray(spatial_sort(buf).mask)
    slab = capacity // 8
    for halo in halos:
        out_h, _ = build_sharded_pipeline(settings, mesh, "point", halo)(
            sb, params, key
        )
        agree = (m_ref == np.asarray(out_h.mask))[live].mean()
        print(
            f"capacity {capacity} ({slab}-pt slabs) halo={halo}: "
            f"agreement vs single-device window = {agree:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    caps = [int(a) for a in sys.argv[1:]] or [16384, 131072]
    for cap in caps:
        study(cap)
