"""Test harness: force an 8-virtual-device CPU JAX platform.

Tests never need real TPU hardware; multi-chip sharding paths run on a
virtual 8-device CPU mesh (the driver separately dry-runs the multichip
path). Must run before anything imports jax backends.
"""
import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox presets jax_platforms to "axon,cpu"; env vars don't override it,
# so pin it programmatically before the backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def dev_pos(buf) -> np.ndarray:
    """Device planar positions (3, cap) -> host point-major (cap, 3)."""
    return np.asarray(buf.positions).T


def dev_attr(buf, name) -> np.ndarray:
    """Device attribute -> host point-major layout."""
    arr = np.asarray(buf.attributes[name])
    return arr.T if arr.ndim == 2 else arr
