"""In-jit device timing harness for this backend (PERF_NOTES.md method).

``block_until_ready`` does not block through the axon tunnel and every
eager op between timed calls costs 20-50 ms wall, so honest device time
requires chaining K invocations INSIDE one jitted program with a scalar
data dependency and differencing against a single invocation:

    from tools.device_timer import device_time_ms
    ms = device_time_ms(lambda p, m: my_op(p, m), pos, mask)

Used by the perf experiments in rounds 1-2 (the numbers in PERF_NOTES.md
were all measured with this exact pattern); kept in-tree so future
experiments do not re-derive it.
"""
from __future__ import annotations

import time

import numpy as np


def device_time_ms(fn, *args, iters: int = 32, reps: int = 5) -> float:
    """Median per-call device time of ``fn(*args)`` in milliseconds.

    ``fn`` must accept ``*args`` where the FIRST argument is a float32
    array (the chain perturbs it by a zero-scaled data dependency so XLA
    cannot collapse the iterations). Returns (T(iters) - T(1)) /
    (iters - 1): pure device time, dispatch and sync costs cancelled.
    """
    import jax
    import jax.numpy as jnp

    first, rest = args[0], args[1:]

    # Reduce over FULL leaves: a [..., :1] slice lets XLA narrow
    # elementwise producers to computing one element (and delete ops
    # feeding unconsumed leaves entirely) — the op being measured must be
    # fully live. NaN-safe so sentinel rows can't poison the chain. The
    # added [N] reduction costs <0.05 ms; negligible for every op worth
    # timing, but don't trust this harness below ~0.05 ms/op.
    def _consume(out):
        def red(leaf):
            f = leaf.astype(jnp.float32)
            return jnp.sum(jnp.where(jnp.isfinite(f), f, 0.0))

        return sum(red(leaf) for leaf in jax.tree_util.tree_leaves(out))

    @jax.jit
    def chain(a0, *rst):
        def body(i, acc):
            # perturb every float leaf (works for arrays AND pytrees like
            # ScanBuffer) so each iteration depends on the previous one
            scale = 1.0 + acc * 1e-30
            a2 = jax.tree_util.tree_map(
                lambda l: l * scale
                if jnp.issubdtype(l.dtype, jnp.floating)
                else l,
                a0,
            )
            return acc + _consume(fn(a2, *rst)) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def chain1(a0, *rst):
        return _consume(fn(a0, *rst))

    # warm both programs (compile) with real syncs
    np.asarray(chain(first, *rest))
    np.asarray(chain1(first, *rest))
    t_k, t_1 = [], []
    for _ in range(reps):
        s = time.perf_counter()
        np.asarray(chain(first, *rest))
        t_k.append(time.perf_counter() - s)
        s = time.perf_counter()
        np.asarray(chain1(first, *rest))
        t_1.append(time.perf_counter() - s)
    return (float(np.median(t_k)) - float(np.median(t_1))) / (iters - 1) * 1e3
