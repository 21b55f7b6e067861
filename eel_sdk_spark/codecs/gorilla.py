"""Gorilla-style XOR codec for smooth float series.

Gorilla (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015 — public paper) observed that successive
floats in sensor/telemetry series XOR to values with long runs of
leading and trailing zero bits. The original is a sequential bit-packer;
this is the whole-array re-expression for a vectorized engine:

1. XOR every value's bit pattern with its predecessor (pure numpy on the
   uint view — losslessly covers NaN/Inf/-0.0, it's bits in, bits out);
2. transpose the XOR stream into byte planes (the byteshuffle trick):
   "leading zero bytes" become entire all-zero PLANES;
3. drop all-zero planes outright (a bitmask records which survived) and
   let the shared zstd cascade squeeze the near-zero survivors.

Decode is the exact inverse: re-interleave planes, XOR prefix-scan
(``np.bitwise_xor.accumulate`` — C-speed), reinterpret as floats.
Everything is O(n) whole-array numpy, zero per-row Python, matching the
engine's kernel contract.

Fills the float gap ALP leaves: ALP (alp.py) wins on decimals-in-
disguise; Gorilla wins on genuinely continuous, slowly-varying doubles
(timestamps-as-seconds, temperatures, cumulative meters) where no
decimal exponent round-trips. The selector trial-encodes a sample and
keeps whichever is measured smallest — never guessed from type. The
reference has no float codec at all (doubles go to parquet plain pages,
eel-core RowParquetWriterFn.scala:44); north-rule addition.
"""

from __future__ import annotations

import numpy as np

from .base import Encoded

NAME = "gor"


def _uint_view(vals: np.ndarray) -> np.ndarray:
    if vals.dtype == np.float64:
        return vals.view(np.uint64)
    if vals.dtype == np.float32:
        return vals.view(np.uint32)
    raise ValueError(f"gorilla: unsupported dtype {vals.dtype}")


def xor_planes(vals: np.ndarray) -> np.ndarray:
    """(width, n) uint8 byte planes of the XOR-with-previous stream."""
    u = _uint_view(np.ascontiguousarray(vals))
    x = np.empty_like(u)
    if u.size:
        x[0] = u[0]
        np.bitwise_xor(u[1:], u[:-1], out=x[1:])
    width = vals.dtype.itemsize
    return np.ascontiguousarray(x.view(np.uint8).reshape(-1, width).T)


def encode(vals: np.ndarray) -> Encoded:
    vals = np.ascontiguousarray(vals)
    width = vals.dtype.itemsize
    planes = xor_planes(vals)
    keep = [i for i in range(width) if planes[i].any()]
    mask = 0
    for i in keep:
        mask |= 1 << i
    payload = np.ascontiguousarray(planes[keep]).tobytes() if keep else b""
    return Encoded(NAME, payload,
                   params={"pm": mask, "w": width, "n": int(len(vals))})


def decode(payload: bytes, params: dict, tables: dict) -> np.ndarray:
    width, n, mask = params["w"], params["n"], params["pm"]
    planes = np.zeros((width, n), dtype=np.uint8)
    buf = np.frombuffer(payload, dtype=np.uint8)
    k = 0
    for i in range(width):
        if (mask >> i) & 1:
            planes[i] = buf[k * n:(k + 1) * n]
            k += 1
    utype = np.uint64 if width == 8 else np.uint32
    x = np.ascontiguousarray(planes.T).reshape(-1).view(utype)
    u = np.bitwise_xor.accumulate(x) if x.size else x
    ftype = np.float64 if width == 8 else np.float32
    return u.view(ftype)


def estimate_payload(sample: np.ndarray) -> bytes:
    """The pre-cascade payload for a sample — the selector zstd-trials
    this against raw/byteshuffle payloads and keeps the measured winner."""
    planes = xor_planes(sample)
    keep = [i for i in range(sample.dtype.itemsize) if planes[i].any()]
    return np.ascontiguousarray(planes[keep]).tobytes() if keep else b""
