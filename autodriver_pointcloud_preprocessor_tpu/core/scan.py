"""ScanBuffer: the fixed-capacity, mask-validated point buffer every op works on.

This is the TPU-first replacement for the reference's dynamically-shaped
Open3D tensor PointCloud (reference: pointcloud_preprocessor.py:309,
utils.py:135-137). XLA traces one program per static shape, so instead of
compacting after every filter (reference pattern), points live in padded
struct-of-arrays buffers with a validity mask; filters only update the mask
and compaction happens once at egress (SURVEY.md §7 design stance).

Layout is **channel-major planar**: positions are float32[3, capacity]
(rows x/y/z), multi-channel attributes are [C, capacity], scalars are
[capacity]. The point axis lives in the TPU lane (minor) dimension; kernels
scalar-expand over channels. A point-major (N, 3) layout wastes 125 of 128
lanes per tile and its (3,)-vector broadcasts hit a pathological ~1000x-slow
path on this backend — see PERF_NOTES.md (measured, banned).

Capacities are bucketed (powers of two) so recompiles are bounded: a stream
of scans with jittering point counts hits at most ``log2`` distinct programs.

Device dtypes: positions/intensity/rgb/time-offset float32, ring/return_type
int32 (TPU-friendly lanes); narrow host dtypes are restored by the codec at
egress. ``time`` is carried as float32 offsets from a float64 host-side
``time_base`` (see core/codec.py docstring).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ScanBuffer",
    "bucket_capacity",
    "from_soa",
    "to_soa",
    "valid_count",
    "pad_to_capacity",
]

#: Smallest capacity bucket; below this every scan shares one program.
MIN_CAPACITY = 1024

#: Device dtype for each canonical attribute.
ATTR_DEVICE_DTYPES = {
    "intensity": jnp.float32,
    "rgb": jnp.float32,
    "ring": jnp.int32,
    "time": jnp.float32,  # offsets from metadata['time_base'] (float64 host scalar)
    "return_type": jnp.int32,
    "normals": jnp.float32,
    "azimuth": jnp.float32,
    "distance": jnp.float32,
}

#: Host dtype each attribute is restored to at egress (reference parity,
#: utils.py:120-131).
ATTR_HOST_DTYPES = {
    "intensity": np.float32,
    "rgb": np.float32,
    "ring": np.uint16,
    "time": np.float64,
    "return_type": np.uint8,
    "normals": np.float32,
    "azimuth": np.float32,
    "distance": np.float32,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScanBuffer:
    """Padded channel-major struct-of-arrays point buffer.

    Attributes:
        positions: float32[3, capacity] — rows are x, y, z.
        mask: bool[capacity]; True for live points.
        attributes: dict of per-point arrays, each [capacity] or [C, capacity].
    """

    positions: jax.Array
    mask: jax.Array
    attributes: Dict[str, jax.Array]

    @property
    def capacity(self) -> int:
        return self.positions.shape[-1]

    @property
    def x(self) -> jax.Array:
        return self.positions[0]

    @property
    def y(self) -> jax.Array:
        return self.positions[1]

    @property
    def z(self) -> jax.Array:
        return self.positions[2]

    def replace(self, **kwargs) -> "ScanBuffer":
        return dataclasses.replace(self, **kwargs)

    def with_mask(self, mask: jax.Array) -> "ScanBuffer":
        """New buffer keeping only points where ``mask`` (ANDed with current)."""
        return self.replace(mask=jnp.logical_and(self.mask, mask))


def bucket_capacity(n: int, minimum: int = MIN_CAPACITY) -> int:
    """Round a point count up to its capacity bucket (next power of two)."""
    n = max(int(n), 1)
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def valid_count(buf: ScanBuffer) -> jax.Array:
    """Number of live points (traced int32)."""
    return jnp.sum(buf.mask.astype(jnp.int32))


def _to_channel_major(arr: np.ndarray) -> np.ndarray:
    """Host (N, C) -> (C, N); 1-D passes through."""
    return arr.T if arr.ndim == 2 else arr


def from_soa(
    soa: Dict[str, np.ndarray],
    capacity: Optional[int] = None,
    metadata: Optional[dict] = None,
) -> Tuple[ScanBuffer, dict]:
    """Host SoA dict -> padded device ScanBuffer (the single H2D hop per scan).

    Host arrays use the point-major (N,)/(N, C) convention of the codec;
    they are transposed to channel-major here. RGB uint8 (N, 3) is
    normalized to [0, 1] float, matching the ingest at reference
    pointcloud_preprocessor.py:428-431. Returns ``(buffer, metadata)`` where
    metadata gains ``time_base`` when a time attribute is present.
    """
    metadata = dict(metadata or {})
    positions = np.asarray(soa["positions"], dtype=np.float32)
    n = positions.shape[0]
    cap = capacity if capacity is not None else bucket_capacity(n)
    if n > cap:
        raise ValueError(f"{n} points exceed capacity {cap}")

    pos_pad = np.zeros((3, cap), dtype=np.float32)
    pos_pad[:, :n] = positions.T
    mask = np.zeros(cap, dtype=bool)
    mask[:n] = True

    attrs: Dict[str, jax.Array] = {}
    for name, arr in soa.items():
        if name == "positions" or arr is None:
            continue
        arr = np.asarray(arr)
        if name == "rgb" and arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        if name == "time":
            base = float(arr.min()) if n else 0.0
            metadata["time_base"] = base
            arr = (arr - base).astype(np.float32)
        arr = _to_channel_major(arr)
        dev_dtype = ATTR_DEVICE_DTYPES.get(name, jnp.float32)
        pad_shape = arr.shape[:-1] + (cap,)
        pad = np.zeros(pad_shape, dtype=np.dtype(dev_dtype))
        pad[..., :n] = arr
        attrs[name] = jnp.asarray(pad)

    buf = ScanBuffer(
        positions=jnp.asarray(pos_pad), mask=jnp.asarray(mask), attributes=attrs
    )
    return buf, metadata


import functools


@functools.lru_cache(maxsize=64)
def _pack_for_egress(attr_spec: tuple):
    """jitted packer: ScanBuffer -> one float32[(rows), capacity] matrix.

    Every attribute in this framework is exactly representable in float32
    (ring < 2^16, return_type < 2^8, indices < 2^24), so a single f32
    matrix carries mask + positions + all attributes in ONE D2H transfer —
    this backend's D2H costs ~25 ms latency PER PULL (PERF_NOTES.md), so
    per-array pulls dominated the egress path (measured 8 pulls = ~200 ms).
    """

    def pack(buf: ScanBuffer) -> jax.Array:
        rows = [buf.mask.astype(jnp.float32)[None, :], buf.positions]
        for name, _nrows in attr_spec:
            arr = buf.attributes[name]
            arr2 = arr[None, :] if arr.ndim == 1 else arr
            rows.append(arr2.astype(jnp.float32))
        return jnp.concatenate(rows, axis=0)

    return jax.jit(pack)


def to_soa(buf: ScanBuffer, metadata: Optional[dict] = None) -> Dict[str, np.ndarray]:
    """Device ScanBuffer -> compacted host SoA dict (ONE D2H transfer).

    Invalid rows are dropped; host arrays are point-major (N,)/(N, C) with
    dtypes restored to their host conventions (ring uint16, return_type
    uint8, time float64 rebuilt from ``metadata['time_base']``).
    """
    metadata = metadata or {}
    attr_spec = tuple(
        (name, 1 if buf.attributes[name].ndim == 1 else buf.attributes[name].shape[0])
        for name in sorted(buf.attributes)
    )
    packed = np.asarray(_pack_for_egress(attr_spec)(buf))

    mask = packed[0] > 0.5
    out: Dict[str, np.ndarray] = {
        "positions": np.ascontiguousarray(packed[1:4, mask].T)
    }
    row = 4
    for name, nrows in attr_spec:
        host = packed[row : row + nrows, mask]
        row += nrows
        host = host[0] if nrows == 1 else host.T
        if name == "time":
            host = host.astype(np.float64) + float(metadata.get("time_base", 0.0))
        else:
            host = host.astype(ATTR_HOST_DTYPES.get(name, np.float32))
        out[name] = np.ascontiguousarray(host)
    return out


def pad_to_capacity(buf: ScanBuffer, capacity: int) -> ScanBuffer:
    """Grow a buffer to a larger capacity (device-side zero padding)."""
    cap = buf.capacity
    if capacity == cap:
        return buf
    if capacity < cap:
        raise ValueError(f"cannot shrink {cap} -> {capacity}; use ops.compact")
    extra = capacity - cap

    def _pad(x):
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(0, extra)]
        return jnp.pad(x, pad_widths)

    return ScanBuffer(
        positions=_pad(buf.positions),
        mask=_pad(buf.mask),
        attributes={k: _pad(v) for k, v in buf.attributes.items()},
    )
