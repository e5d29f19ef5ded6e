"""Pin down the voxel sort's +0.86 ms ring-row cliff (real TPU).

profile_voxel_variants.py: prod voxel (6-operand sort: 4 int32 keys +
intensity f32 + ring f32) = 1.38 ms; without ring (5 operands) = 0.52.
profile_u16.py cleared the dtype conversions. This times lax.sort with
the exact operand sets/dtypes to find the cliff.

Usage: python tools/profile_sort_rows.py
"""
from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from tools.device_timer import device_time_ms

    assert jax.default_backend() == "tpu", jax.default_backend()
    n = 131_072
    rng = np.random.default_rng(0)
    ki = [jnp.asarray(rng.integers(0, 2**30, n).astype(np.int32))
          for _ in range(4)]
    pf = [jnp.asarray(rng.normal(size=n).astype(np.float32))
          for _ in range(4)]

    def srt(num_keys, rows, stable):
        return jax.lax.sort(tuple(rows), num_keys=num_keys, is_stable=stable)

    cases = [
        ("4ikey+1f stable (no-ring set)", 4, ki[:4] + pf[:1], True),
        ("4ikey+2f stable (prod set)", 4, ki[:4] + pf[:2], True),
        ("4ikey+3f stable", 4, ki[:4] + pf[:3], True),
        ("4ikey+2f unstable", 4, ki[:4] + pf[:2], False),
        ("1ikey+5f stable", 1, ki[:1] + pf[:4] + [pf[0]], True),
        ("4fkey+2f stable (all-f32)", 4,
         [k.astype(jnp.float32) for k in ki[:4]] + pf[:2], True),
    ]
    for name, nk, rows, stable in cases:
        ms = device_time_ms(
            lambda r0, *rest: srt(nk, (r0, *rest), stable), *rows,
            iters=64, reps=5,
        )
        print(f"[sort] {name}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
