"""Cold-compile bisect for the headline program (VERDICT r4 item 3).

BENCH_r04 reported a 703.8 s cold compile vs 75.2 s in r03. The two
round-4 kernel changes that grow the Mosaic program are the _G=16 grid
grouping (16 unrolled sub-blocks per grid step) and kmode='csel' (extra
unrolled own-block sweeps). This tool bisects them: each (G, kmode)
combination compiles the FULL headline pipeline program in a fresh
subprocess with NO persistent compilation cache, so every figure is a
true cold compile.

Also times the exact-kNN jaccard program (bench.py compiles it too when
APC_BENCH_JACCARD=1) so the driver-observed bench wall time decomposes.

Usage: python tools/profile_compile_bisect.py  (real TPU, ~20-45 min)
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

_CHILD = r"""
import sys, time, dataclasses
import numpy as np
import jax
sys.path.insert(0, ".")
from bench import _scene
from autodriver_pointcloud_preprocessor_tpu.core import from_soa, valid_count
from autodriver_pointcloud_preprocessor_tpu.models import build_pipeline
from autodriver_pointcloud_preprocessor_tpu.models.pipeline import (
    params_from_config, settings_from_config,
)
from autodriver_pointcloud_preprocessor_tpu.models.presets import (
    PRODUCTION_128K_CONFIG,
)

assert jax.default_backend() == "tpu", jax.default_backend()
kmode = sys.argv[1]
exact = len(sys.argv) > 2 and sys.argv[2] == "exact"

n_points, capacity = 128_000, 131_072
pts = _scene(n_points)
rng = np.random.default_rng(1)
buf, _ = from_soa(
    {"positions": pts,
     "intensity": rng.uniform(0, 255, n_points).astype(np.float32),
     "ring": rng.integers(0, 32, n_points).astype(np.uint16)},
    capacity=capacity,
)
settings = settings_from_config(PRODUCTION_128K_CONFIG)
if kmode != "csel":
    settings = dataclasses.replace(settings, knn_kmode=kmode)
if exact:
    settings = dataclasses.replace(
        settings, knn_method="exact", window_blocks=1,
        knn_d2mode="highest", knn_kmode="sweep",
    )
params = params_from_config(PRODUCTION_128K_CONFIG)
key = jax.random.PRNGKey(0)
fn = build_pipeline(settings)
t0 = time.perf_counter()
out, plane = fn(buf, params, key)
sv = int(valid_count(out))
print(f"COMPILE_S {time.perf_counter() - t0:.1f} survivors {sv}", flush=True)
"""


def main() -> None:
    combos = [
        (16, "csel", False),   # shipped
        (4, "csel", False),    # _G off
        (16, "sweep", False),  # csel off
        (4, "sweep", False),   # both off (~r3 shape)
        (16, "csel", True),    # exact-kNN jaccard program (bench extra)
    ]
    for g, kmode, exact in combos:
        env = dict(os.environ)
        env["APC_FORCE_G"] = str(g)
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        args = [sys.executable, "-c", _CHILD, kmode] + (
            ["exact"] if exact else []
        )
        t0 = time.perf_counter()
        r = subprocess.run(
            args, env=env, capture_output=True, text=True, timeout=3000,
        )
        wall = time.perf_counter() - t0
        line = [
            ln for ln in r.stdout.splitlines() if ln.startswith("COMPILE_S")
        ]
        tag = f"G={g} kmode={kmode}" + (" EXACT" if exact else "")
        if line:
            print(f"[{tag}] {line[0]} (proc wall {wall:.1f}s)", flush=True)
        else:
            print(f"[{tag}] FAILED rc={r.returncode} "
                  f"{r.stderr.strip().splitlines()[-3:]}", flush=True)


if __name__ == "__main__":
    main()
