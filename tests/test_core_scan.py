"""ScanBuffer pytree tests: bucketing, H2D/D2H roundtrips, mask semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from autodriver_pointcloud_preprocessor_tpu.core import (
    ScanBuffer,
    bucket_capacity,
    from_soa,
    pad_to_capacity,
    to_soa,
    valid_count,
)


def test_bucket_capacity():
    assert bucket_capacity(1) == 1024
    assert bucket_capacity(1024) == 1024
    assert bucket_capacity(1025) == 2048
    assert bucket_capacity(130_000) == 131_072


def test_from_to_soa_roundtrip(rng):
    n = 777
    soa = {
        "positions": rng.normal(size=(n, 3)).astype(np.float32),
        "intensity": rng.uniform(0, 255, n).astype(np.float32),
        "ring": rng.integers(0, 16, n).astype(np.uint16),
        "time": 1.7e9 + rng.uniform(0, 0.1, n),
        "return_type": rng.integers(0, 3, n).astype(np.uint8),
    }
    buf, meta = from_soa(soa)
    assert buf.capacity == 1024
    assert int(valid_count(buf)) == n
    out = to_soa(buf, meta)
    np.testing.assert_array_equal(out["positions"], soa["positions"])
    np.testing.assert_array_equal(out["ring"], soa["ring"])
    assert out["ring"].dtype == np.uint16
    assert out["return_type"].dtype == np.uint8
    # time survives the f64 -> base + f32 offset split to ns precision
    np.testing.assert_allclose(out["time"], soa["time"], atol=1e-6)
    assert out["time"].dtype == np.float64


def test_rgb_normalization(rng):
    n = 10
    soa = {
        "positions": np.zeros((n, 3), np.float32),
        "rgb": rng.integers(0, 256, (n, 3)).astype(np.uint8),
    }
    buf, _ = from_soa(soa)
    rgb = np.asarray(buf.attributes["rgb"]).T[:n]
    np.testing.assert_allclose(rgb, soa["rgb"] / 255.0, atol=1e-7)


def test_scanbuffer_is_pytree():
    buf, _ = from_soa({"positions": np.ones((4, 3), np.float32)})
    doubled = jax.tree_util.tree_map(lambda x: x * 2, buf)
    assert isinstance(doubled, ScanBuffer)
    np.testing.assert_array_equal(
        np.asarray(doubled.positions).T[:4], 2 * np.ones((4, 3))
    )


def test_with_mask_ands():
    buf, _ = from_soa({"positions": np.ones((4, 3), np.float32)}, capacity=1024)
    new = buf.with_mask(jnp.arange(1024) < 2)
    assert int(valid_count(new)) == 2


def test_pad_to_capacity():
    buf, _ = from_soa({"positions": np.ones((4, 3), np.float32)}, capacity=1024)
    big = pad_to_capacity(buf, 2048)
    assert big.capacity == 2048
    assert int(valid_count(big)) == 4


def test_jit_through_scanbuffer():
    @jax.jit
    def shift(buf: ScanBuffer) -> ScanBuffer:
        return buf.replace(positions=buf.positions + 1.0)

    buf, _ = from_soa({"positions": np.zeros((8, 3), np.float32)})
    out = shift(buf)
    np.testing.assert_array_equal(np.asarray(out.positions).T[:8], np.ones((8, 3)))
