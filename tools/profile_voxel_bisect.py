"""Bisect the voxel_downsample op's internal cost on the real TPU.

The sub-piece mocks (profile_front_ablation.py) sum to ~0.45 ms but the
real op measures 1.32 ms at 131k — this inlines the EXACT body of
ops/voxel.voxel_downsample (box-tier compact keys, dedup_exact, the
bench's intensity+ring attrs) with a stop_after knob so the gap can be
localized. Stages: keys -> sort -> groups -> zeroed -> sums -> full.

Usage: python tools/profile_voxel_bisect.py [stage ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _scene
    from tools.device_timer import device_time_ms
    from autodriver_pointcloud_preprocessor_tpu.core import from_soa
    from autodriver_pointcloud_preprocessor_tpu.ops.dedup import (
        _coordinate_keys,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.pallas_segmean import (
        segmented_sums_pallas,
    )
    from autodriver_pointcloud_preprocessor_tpu.ops.window import (
        hilbert_cell_codes,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()

    n_points, n = 128_000, 131_072
    pts = _scene(n_points)
    rng = np.random.default_rng(1)
    buf, _ = from_soa(
        {
            "positions": pts,
            "intensity": rng.uniform(0, 255, n_points).astype(np.float32),
            "ring": rng.integers(0, 32, n_points).astype(np.uint16),
        },
        capacity=n,
    )
    inten = buf.attributes["intensity"]
    ring = buf.attributes["ring"]
    valid0 = buf.mask & jnp.isfinite(buf.positions).all(axis=0)
    inv = 1.0 / 0.08
    big = jnp.int32(2**30)

    def body(positions, valid, stop_after):
        x, y, z = positions[0], positions[1], positions[2]
        vx = jnp.where(valid, jnp.floor(x * inv).astype(jnp.int32), big)
        vy = jnp.where(valid, jnp.floor(y * inv).astype(jnp.int32), big)
        vz = jnp.where(valid, jnp.floor(z * inv).astype(jnp.int32), big)
        cells = []
        for v in (vx, vy, vz):
            lo = jnp.min(jnp.where(valid, v, big))
            hi = jnp.max(jnp.where(valid, v, -big))
            center = lo + (hi - lo) // 2
            cells.append(jnp.clip(v - center + 512, 0, 1023))
        hk = hilbert_cell_codes(cells, valid)
        kx, ky, kz = _coordinate_keys(positions, valid)
        if stop_after == "keys":
            return hk, kx, ky, kz
        float_rows = (inten, ring.astype(jnp.float32))
        sorted_ops = jax.lax.sort(
            (hk, kx, ky, kz, *float_rows), num_keys=4, is_stable=True
        )
        if stop_after == "sort":
            return sorted_ops
        shk = sorted_ops[0]
        skx, sky, skz = sorted_ops[1], sorted_ops[2], sorted_ops[3]
        px = jax.lax.bitcast_convert_type(skx, jnp.float32)
        py = jax.lax.bitcast_convert_type(sky, jnp.float32)
        pz = jax.lax.bitcast_convert_type(skz, jnp.float32)
        rest = list(sorted_ops[4:])
        svalid = shk < jnp.int32(0x7FFFFFFF)
        same = shk[1:] == shk[:-1]
        new_group = jnp.ones(n, bool).at[1:].set(jnp.logical_not(same))
        new_group = new_group & svalid
        dup = jnp.zeros(n, bool).at[1:].set(
            (skx[1:] == skx[:-1]) & (sky[1:] == sky[:-1])
            & (skz[1:] == skz[:-1])
        )
        included = svalid & jnp.logical_not(dup)
        w = included.astype(jnp.float32)
        if stop_after == "groups":
            return new_group, included, px, py, pz
        px = jnp.where(included, px, 0.0)
        py = jnp.where(included, py, 0.0)
        pz = jnp.where(included, pz, 0.0)
        rest = [jnp.where(included, r, 0.0) for r in rest]
        if stop_after == "zeroed":
            return px, py, pz, rest, w
        flag_f = new_group.astype(jnp.float32)
        channels = jnp.stack(
            [w, px * w, py * w, pz * w, rest[0] * w, rest[1] * flag_f]
        )
        sums = segmented_sums_pallas(channels, new_group)
        if stop_after == "sums":
            return sums
        counts = sums[0]
        denom = jnp.maximum(counts, 1.0)
        new_pos = jnp.stack(
            [sums[1] / denom, sums[2] / denom, sums[3] / denom]
        )
        new_mask = counts > 0
        a_int = (sums[4] / denom).astype(inten.dtype)
        a_ring = jnp.round(sums[5]).astype(ring.dtype)
        return new_pos, new_mask, a_int, a_ring

    stages = sys.argv[1:] or ["keys", "sort", "groups", "zeroed", "sums",
                              "full"]
    for st in stages:
        t0 = time.perf_counter()
        ms = device_time_ms(
            lambda p, v, _st=st: body(p, v, _st), buf.positions, valid0,
            iters=16, reps=5,
        )
        print(f"[vox] stop_after={st}: {ms:.3f} ms  "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
