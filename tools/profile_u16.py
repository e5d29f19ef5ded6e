"""Localize the u16 attribute pathology (real TPU).

tools/profile_voxel_variants.py: the ring u16 attr adds 0.86 ms to the
voxel stage — far beyond its sort-row cost (~0.03). Suspects: u16<->f32
dtype conversion layout cost, u16 output leaf materialization, or the
round/astype finalize. Times each in isolation at 131k.

Usage: python tools/profile_u16.py
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
    ring16 = jnp.asarray(rng.integers(0, 32, n).astype(np.uint16))
    ringf = ring16.astype(jnp.float32)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))

    cases = [
        ("u16 -> f32 astype", lambda f, r16: f + r16.astype(jnp.float32)),
        ("u16 -> i32 -> f32", lambda f, r16: f
         + r16.astype(jnp.int32).astype(jnp.float32)),
        ("f32 -> round -> u16 output", lambda f, r16:
         jnp.round(f * 0 + ringf).astype(jnp.uint16)),
        ("f32 -> round -> i32 output", lambda f, r16:
         jnp.round(f * 0 + ringf).astype(jnp.int32)),
        ("f32 passthrough output", lambda f, r16: jnp.round(f * 0 + ringf)),
        ("u16 add (native u16 arith)", lambda f, r16:
         (r16 + jnp.uint16(1)) * jnp.uint16(f[0].astype(jnp.int32).astype(jnp.uint16))),
    ]
    for name, fn in cases:
        ms = device_time_ms(fn, x, ring16, iters=64, reps=5)
        print(f"[u16] {name}: {ms:.4f} ms", flush=True)


if __name__ == "__main__":
    main()
