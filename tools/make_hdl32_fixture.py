"""Generate the HDL-32E multi-revolution fixture (tests/fixtures/hdl32_scene.npz).

VERDICT r3 item 8: the quality floors leaned on one synthetic scene family
(uniform-noise bench scene) plus a single VLP-16 revolution. This adds a
second STRUCTURED fixture with the properties the round-3 fixtures lack:

* HDL-32E geometry (32 rings, -30.67..+10.67 deg, single firing sequence
  per block) instead of VLP-16;
* THREE revolutions with MOVING clusters — two box obstacles whose
  azimuth advances per revolution, so the accumulated cloud contains the
  motion-smeared double/triple surfaces a real multi-scan aggregate has;
* DUAL-RETURN packets: like the sensor's dual-return mode, each azimuth
  block is emitted twice (last return, then strongest return). Rays that
  graze the porous canopy object produce a canopy hit in one copy and the
  ground/wall hit behind it in the other — genuinely multi-return
  geometry (two points along one ray) through the REAL packet decoder.

Packed into real 1206-byte packets and decoded back through the
production decoder (io/pcap.VelodynePcapReader, model='HDL32E') so the
fixture exercises the same path a live capture would. Deterministic.

Usage: python tools/make_hdl32_fixture.py [out.npz]
"""
from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autodriver_pointcloud_preprocessor_tpu.io.pcap import (  # noqa: E402
    _ELEVATIONS,
    HDL32E,
)

SENSOR_Z = 2.0  # sensor height above ground (m)
MAX_RANGE = 70.0

#: static walls: (azimuth_start_deg, azimuth_end_deg, distance_m, height_m)
WALLS = [
    (30.0, 80.0, 10.0, 3.0),
    (120.0, 150.0, 6.0, 2.0),
    (200.0, 290.0, 18.0, 4.0),
]

#: moving box clusters: (azimuth_center_deg@rev0, deg_per_rev, distance_m,
#: half_width_deg, height_m)
MOVERS = [
    (100.0, 12.0, 7.0, 4.0, 1.6),   # crossing car-sized object
    (310.0, -8.0, 12.0, 6.0, 2.2),  # opposing larger object
]

#: porous canopy (vegetation-like): rays either hit the canopy (strongest)
#: or pass through to whatever is behind (last): (az0, az1, distance_m,
#: z_lo_m, z_hi_m, hit_probability)
CANOPY = (160.0, 190.0, 9.0, 0.5, 3.5, 0.55)


def _surface_range(az_deg: float, el_rad: float, rev: int) -> float:
    """Range of the first SOLID hit (ground/walls/movers); 0 = no return."""
    az_deg = az_deg % 360.0
    best = 0.0
    if el_rad < -1e-4:
        r_ground = SENSOR_Z / -np.sin(el_rad)
        if r_ground <= MAX_RANGE:
            best = r_ground
    segs = list(WALLS)
    for az_c, dps, d, hw, h in MOVERS:
        c = (az_c + dps * rev) % 360.0
        segs.append((c - hw, c + hw, d, h))
    for a0, a1, d, h in segs:
        da = (az_deg - a0) % 360.0
        if da > (a1 - a0) % 360.0:
            continue
        cos_el = np.cos(el_rad)
        if cos_el < 1e-6:
            continue
        r = d / cos_el
        z = r * np.sin(el_rad)
        if -SENSOR_Z <= z <= -SENSOR_Z + h and r <= MAX_RANGE:
            if best == 0.0 or r < best:
                best = r
    return best


def _canopy_range(az_deg: float, el_rad: float,
                  rng: np.random.Generator) -> float:
    """Range of a canopy hit, or 0 when the ray passes through."""
    a0, a1, d, z_lo, z_hi, p_hit = CANOPY
    az_deg = az_deg % 360.0
    if not (a0 <= az_deg <= a1):
        return 0.0
    cos_el = np.cos(el_rad)
    if cos_el < 1e-6:
        return 0.0
    r = d / cos_el
    z = r * np.sin(el_rad) + SENSOR_Z
    if not (z_lo <= z <= z_hi) or r > MAX_RANGE:
        return 0.0
    if rng.uniform() > p_hit:
        return 0.0
    return r + rng.normal(0.0, 0.05)  # foliage is rough


def _dual_returns(az_deg: float, el_rad: float, rev: int,
                  rng: np.random.Generator):
    """(last_return_range, strongest_return_range) for one ray."""
    solid = _surface_range(az_deg, el_rad, rev)
    if solid > 0.0:
        solid += rng.normal(0.0, 0.01)
    canopy = _canopy_range(az_deg, el_rad, rng)
    if canopy > 0.0 and (solid == 0.0 or canopy < solid):
        # canopy in front: strongest = canopy, last = solid behind (or
        # canopy again when nothing solid is behind)
        return (solid if solid > 0.0 else canopy), canopy
    return solid, solid


def _payload(start_az_cdeg: int, rev: int, rng: np.random.Generator) -> bytes:
    """One 1206-byte dual-return packet: 6 azimuth steps x 2 return blocks.

    HDL-32E dual-return mode: consecutive block PAIRS share an azimuth —
    even block = last return, odd block = strongest return.
    """
    elev = np.deg2rad(_ELEVATIONS[HDL32E])
    out = bytearray()
    for pair in range(6):
        az_cdeg = (start_az_cdeg + pair * 40) % 36000
        az = az_cdeg / 100.0
        rays = [_dual_returns(az, elev[laser], rev, rng)
                for laser in range(32)]
        for sel in (0, 1):  # last, strongest
            out += struct.pack("<HH", 0xEEFF, az_cdeg)
            for laser in range(32):
                r = rays[laser][sel]
                ticks = int(round(r / 0.002))
                refl = int(60 + 40 * np.sin(np.deg2rad(az))) & 0xFF
                out += struct.pack("<HB", min(ticks, 65535), refl)
    out += struct.pack("<IH", 0, 0x2137)
    return bytes(out)


def _wrap_udp(payload: bytes, ts_sec: int, ts_usec: int) -> bytes:
    eth = b"\x00" * 6 + b"\x11" * 6 + struct.pack(">H", 0x0800)
    total_len = 20 + 8 + len(payload)
    ip = struct.pack(
        ">BBHHHBBH4s4s", 0x45, 0, total_len, 0, 0, 64, 17, 0,
        b"\xc0\xa8\x01\x01", b"\xc0\xa8\x01\x03",
    )
    udp = struct.pack(">HHHH", 51001, 2368, 8 + len(payload), 0)
    frame = eth + ip + udp + payload
    rec = struct.pack("<IIII", ts_sec, ts_usec, len(frame), len(frame))
    return rec + frame


def build(out_path: str) -> None:
    rng = np.random.default_rng(11)
    pcap_path = out_path + ".pcap"
    hdr = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    # 6 azimuth pairs x 0.4 deg = 2.4 deg/packet; 150 packets = 360 deg
    per_rev = 150
    revs = 3
    with open(pcap_path, "wb") as f:
        f.write(hdr)
        for rev in range(revs):
            for i in range(per_rev):
                f.write(
                    _wrap_udp(
                        _payload((i * 240) % 36000, rev, rng),
                        ts_sec=2000 + rev, ts_usec=i * 1103,
                    )
                )

    from autodriver_pointcloud_preprocessor_tpu.io.pcap import (
        VelodynePcapReader,
    )

    soa = VelodynePcapReader(pcap_path, model=HDL32E).read_all()
    os.remove(pcap_path)
    # subsample deterministically to keep the fixture test-sized while
    # preserving the ring/dual-return/motion structure
    n = soa["positions"].shape[0]
    keep = np.arange(n) % 2 == 0
    np.savez_compressed(
        out_path,
        positions=soa["positions"][keep].astype(np.float32),
        intensity=soa["intensity"][keep].astype(np.float32),
        ring=soa["ring"][keep].astype(np.uint16),
        azimuth=soa["azimuth"][keep].astype(np.float32),
        distance=soa["distance"][keep].astype(np.float32),
        time=soa["time"][keep].astype(np.float64),
    )
    kept = int(keep.sum())
    r = np.linalg.norm(soa["positions"][keep], axis=1)
    # dual-return evidence: rays with two distinct ranges at one azimuth
    print(
        f"wrote {out_path}: {kept} points (of {n} decoded), "
        f"range [{r.min():.2f}, {r.max():.2f}] m, "
        f"rings {len(set(soa['ring'].tolist()))}, revs {revs}"
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hdl32_scene.npz",
    )
    build(out)
