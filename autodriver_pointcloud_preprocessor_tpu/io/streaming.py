"""StreamingEngine: the BASELINE north-star data path.

"pointcloud_loader and pcap_player feed device-resident scans so the only
host<->device traffic is raw packets in and compressed clouds out"
(BASELINE.json north_star). One fused program per scan:

  packet bytes (u8, ~1.2 KB/packet) --H2D--> device Velodyne decode
  --> full preprocessing pipeline --> device quantization
  --int16, ~8 B/pt--D2H--> host varint+DEFLATE --> APCZ blob

The host only restructures packet bytes with numpy strided views (free),
runs the final entropy stage (native sidecar), and splits revolutions by
peeking block azimuths (24 of 1206 bytes per packet).

Per 28.8k-point VLP-16 scan this moves ~90 KB up and ~170 KB down instead
of ~1 MB each way for float SoA egress — the difference between 0.5x and
>5x real-time on this sandbox's ~20 MB/s host link, and less host-link
pressure on any deployment.
"""
from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scan import ScanBuffer
from ..models.pipeline import (
    PipelineParams,
    PipelineSettings,
    params_from_config,
    pipeline_runner,
    settings_from_config,
)
from .pcap import _ELEVATIONS, VLP16, _read_payloads

__all__ = ["StreamingEngine"]


def _split_packet_fields(payloads: np.ndarray) -> np.ndarray:
    """(P, 1206) u8 -> ONE (1176, P) u8 field matrix (host strided copies).

    Row layout: az_lo(12), az_hi(12), d_lo(384), d_hi(384), refl(384) —
    packet index in the lane axis so the device never transposes, and the
    whole scan ships in a single H2D transfer (each transfer costs ~25 ms
    latency on this backend, PERF_NOTES.md).
    """
    p = payloads.shape[0]
    blocks = payloads[:, :1200].reshape(p, 12, 100)
    ch = blocks[:, :, 4:100].reshape(p, 12, 32, 3)
    return np.concatenate(
        [
            blocks[:, :, 2].T,  # az_lo (12, P)
            blocks[:, :, 3].T,  # az_hi (12, P)
            ch[:, :, :, 0].reshape(p, 384).T,  # d_lo (384, P)
            ch[:, :, :, 1].reshape(p, 384).T,  # d_hi (384, P)
            ch[:, :, :, 2].reshape(p, 384).T,  # refl (384, P)
        ]
    )


@functools.lru_cache(maxsize=16)
def _decode_fn(model: str, packet_bucket: int):
    """jitted device decode: (1176, P) byte matrix -> ScanBuffer.

    Point ordering is laser-major (flat index = j * P + pkt where
    j = blk * 32 + laser): every field row flattens without a transpose.
    """
    elev_host = np.deg2rad(_ELEVATIONS[model]).astype(np.float32)
    n_pts = packet_bucket * 384

    def decode(packed, stamp_off, n_packets, min_range, max_range):
        pb = packet_bucket
        az_lo = packed[0:12].astype(jnp.float32)  # (12, P)
        az_hi = packed[12:24].astype(jnp.float32)
        az_raw = az_lo + az_hi * 256.0
        if model == VLP16:
            # next block's azimuth (within packet; last extrapolates)
            az_next = jnp.concatenate(
                [az_raw[1:], (az_raw[-1] + (az_raw[-1] - az_raw[-2]))[None]]
            )
            daz = (az_next - az_raw) % 36000.0
        dist = (
            packed[24:408].astype(jnp.float32)
            + packed[408:792].astype(jnp.float32) * 256.0
        ).reshape(-1) * 0.002  # [384 * P], laser-major
        inten = packed[792:1176].astype(jnp.float32).reshape(-1)

        pt = jnp.arange(n_pts, dtype=jnp.int32)
        j = pt // pb  # channel slot 0..383
        pkt = pt % pb
        blk = j // 32
        laser = j % 32

        az_b = az_raw.reshape(-1)[blk * pb + pkt]
        if model == VLP16:
            ring = laser % 16
            seq = (laser // 16).astype(jnp.float32)
            daz_b = daz.reshape(-1)[blk * pb + pkt]
            az = (az_b + 0.5 * daz_b * seq) % 36000.0
        else:
            ring = laser
            az = az_b % 36000.0

        az_rad = az * jnp.float32(np.pi / 18000.0)
        el = jnp.asarray(elev_host)[ring]
        cos_el = jnp.cos(el)
        x = dist * cos_el * jnp.sin(az_rad)
        y = dist * cos_el * jnp.cos(az_rad)
        z = dist * jnp.sin(el)

        valid = (
            (dist >= min_range)
            & (dist <= max_range)
            & (pkt < n_packets)
        )
        time_off = stamp_off[pkt]
        attrs = {
            "intensity": inten,
            "ring": ring.astype(jnp.int32),
            "time": time_off,
            "azimuth": az / 100.0,
            "distance": dist,
        }
        return ScanBuffer(
            positions=jnp.stack([x, y, z]), mask=valid, attributes=attrs
        )

    return decode


class StreamingEngine:
    """PCAP/UDP packets -> preprocessed, compressed clouds, device-resident.

    Args:
        config: reference-named pipeline parameters (like Preprocessor).
        model: 'VLP16' or 'HDL32E'.
        packet_bucket: packets-per-scan capacity (static; 80 covers a
            10 Hz VLP-16 revolution with margin).
        quantization_bits: codec quantization for the compressed egress.
    """

    def __init__(
        self,
        config: Optional[Dict[str, object]] = None,
        model: str = VLP16,
        packet_bucket: int = 80,
        quantization_bits: int = 14,
        min_range: float = 0.4,
        max_range: float = 130.0,
        seed: int = 0,
    ):
        self.config = dict(config or {})
        self.model = model
        self.packet_bucket = packet_bucket
        self.qbits = quantization_bits
        self.min_range = min_range
        self.max_range = max_range
        self.settings: PipelineSettings = settings_from_config(self.config)
        self.params: PipelineParams = params_from_config(self.config)
        self._key = jax.random.PRNGKey(seed)
        self._frame = 0
        self._fn = None
        self._batched_fns = {}

    def _full_fn(self):
        if self._fn is not None:
            return self._fn
        from .compressor import device_quantizer

        decode = _decode_fn(self.model, self.packet_bucket)
        runner = pipeline_runner(self.settings)
        quantize = device_quantizer(self.qbits)

        @jax.jit
        def full(packed, stamp_off, n_packets, params, key, intensity_scale):
            buf = decode(
                packed, stamp_off, n_packets,
                jnp.float32(self.min_range), jnp.float32(self.max_range),
            )
            buf, plane = runner(buf, params, key)
            packed, meta = quantize(buf, intensity_scale)
            return packed, meta, plane

        self._fn = full
        return full

    # -- per-scan ---------------------------------------------------------

    def _dispatch_scan(
        self, payloads: np.ndarray, stamps: np.ndarray,
        intensity_scale: float = 1.0,
    ):
        """Dispatch one revolution (H2D + fused program); NO sync.

        Returns the device result handles; resolve with ``_encode_result``.
        Splitting dispatch from encode lets ``replay_pcap`` overlap scan
        N+1's device work with scan N's host entropy coding (the two run
        concurrently: the D2H pull for N blocks only the host).
        """
        pb = self.packet_bucket
        p = payloads.shape[0]
        if p > pb:
            payloads, stamps = payloads[:pb], stamps[:pb]
            p = pb
        fields = _split_packet_fields(payloads)  # (1176, p)
        fields_pad = np.zeros((1176, pb), np.uint8)
        fields_pad[:, :p] = fields
        base = float(stamps.min()) if p else 0.0
        stamp_off = np.zeros(pb, np.float32)
        stamp_off[:p] = (stamps - base).astype(np.float32)

        key = jax.random.fold_in(self._key, self._frame)
        self._frame += 1
        packed, meta, _plane = self._full_fn()(
            jnp.asarray(fields_pad), jnp.asarray(stamp_off), jnp.int32(p),
            self.params, key, jnp.float32(intensity_scale),
        )
        return packed, meta, intensity_scale

    def _encode_result(self, handle) -> bytes:
        """Pull a dispatched scan's quantized buffers and entropy-code."""
        from .compressor import encode_device_quantized

        packed, meta, intensity_scale = handle
        return encode_device_quantized(
            np.asarray(packed), np.asarray(meta), self.qbits, intensity_scale
        )

    def process_scan_packets(
        self, payloads: np.ndarray, stamps: np.ndarray,
        intensity_scale: float = 1.0,
    ) -> bytes:
        """One revolution's packets -> APCZ compressed blob."""
        return self._encode_result(
            self._dispatch_scan(payloads, stamps, intensity_scale)
        )

    def process_scan_batch(
        self,
        scans,
        intensity_scale: float = 1.0,
    ):
        """Process B revolutions in ONE vmapped program + ONE transfer pair.

        ``scans``: list of (payloads, stamps). Batching amortizes the
        host-link latency across revolutions — the replay-throughput mode
        (adds B-1 scans of latency; live streaming uses
        process_scan_packets).
        """
        b = len(scans)
        pb = self.packet_bucket
        fields = np.zeros((b, 1176, pb), np.uint8)
        stamp_off = np.zeros((b, pb), np.float32)
        n_packets = np.zeros(b, np.int32)
        for i, (payloads, stamps) in enumerate(scans):
            p = min(payloads.shape[0], pb)
            fields[i, :, :p] = _split_packet_fields(payloads[:p])
            base = float(stamps[:p].min()) if p else 0.0
            stamp_off[i, :p] = (stamps[:p] - base).astype(np.float32)
            n_packets[i] = p

        fn = self._batched_fns.get(b)
        if fn is None:
            from .compressor import device_quantizer

            # the Pallas window kernel batches natively under vmap via its
            # custom_vmap batch-grid rule (ops/pallas_window.py)
            decode = _decode_fn(self.model, self.packet_bucket)
            runner = pipeline_runner(self.settings)
            quantize = device_quantizer(self.qbits)

            def single(packed_in, stamp_off, n_packets, params, key, iscale):
                buf = decode(
                    packed_in, stamp_off, n_packets,
                    jnp.float32(self.min_range), jnp.float32(self.max_range),
                )
                buf, _plane = runner(buf, params, key)
                pk, mt = quantize(buf, iscale)
                return pk, mt, _plane

            fn = jax.jit(
                jax.vmap(single, in_axes=(0, 0, 0, None, 0, None))
            )
            self._batched_fns[b] = fn
        keys = jax.random.split(
            jax.random.fold_in(self._key, self._frame), b
        )
        self._frame += 1
        packed, meta, planes = fn(
            jnp.asarray(fields), jnp.asarray(stamp_off),
            jnp.asarray(n_packets), self.params, keys,
            jnp.float32(intensity_scale),
        )
        from .compressor import encode_device_quantized

        packed = np.asarray(packed)  # ONE D2H for the whole batch
        meta = np.asarray(meta)
        return [
            encode_device_quantized(
                packed[i], meta[i], self.qbits, intensity_scale
            )
            for i in range(b)
        ]

    # -- replay -----------------------------------------------------------

    def replay_pcap(self, path: str, batch: int = 1) -> Iterator[bytes]:
        """Yield one compressed blob per revolution of a capture.

        ``batch`` > 1 processes that many revolutions per device dispatch
        (throughput mode; see process_scan_batch).
        """
        payloads, stamps = _read_payloads(path)
        if payloads.shape[0] == 0:
            return
        # revolution split from block-0 azimuths (2 peeked bytes/packet)
        az0 = (
            payloads[:, 2].astype(np.int32)
            | (payloads[:, 3].astype(np.int32) << 8)
        )
        wraps = np.flatnonzero(np.diff(az0) < -18000) + 1
        bounds = [0, *wraps.tolist(), payloads.shape[0]]
        spans = [(a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
        if batch <= 1:
            # one-revolution pipelining: dispatch N+1 BEFORE pulling +
            # entropy-coding N, so the device computes the next revolution
            # while the host encodes the previous one (VERDICT r2 item 5)
            pending = None
            for a, b in spans:
                handle = self._dispatch_scan(payloads[a:b], stamps[a:b])
                if pending is not None:
                    yield self._encode_result(pending)
                pending = handle
            if pending is not None:
                yield self._encode_result(pending)
            return
        for i in range(0, len(spans), batch):
            group = spans[i : i + batch]
            blobs = self.process_scan_batch(
                [(payloads[a:b], stamps[a:b]) for a, b in group]
            )
            yield from blobs
