"""Vectorized bit-packing primitives.

The moral analogue of parquet's PLAIN/bit-packed encodings that the
reference enables via ``withDictionaryEncoding`` (reference:
eel-core/src/main/scala/io/eels/component/parquet/RowParquetWriterFn.scala:42-50);
here implemented as pure numpy so it runs inside Arrow UDF batches with no
per-row Python.

``pack_uints``/``unpack_uints`` pack an array of uint64 values into
``width`` bits each, MSB-first, via ``np.unpackbits``/``np.packbits`` —
every step is a whole-array numpy op.
"""

from __future__ import annotations

import numpy as np


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (0 -> width 0: all values equal)."""
    if max_value < 0:
        raise ValueError("bit_width expects a non-negative value")
    return int(max_value).bit_length()


def _container(width: int) -> tuple[int, str]:
    """Smallest big-endian container dtype covering ``width`` bits."""
    if width <= 8:
        return 1, ">u1"
    if width <= 16:
        return 2, ">u2"
    if width <= 32:
        return 4, ">u4"
    return 8, ">u8"


def pack_uints(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 ``values`` into ``width``-bit big-endian fields.

    width == 0 encodes a constant column: the payload is empty. Values are
    staged through the smallest containing dtype so the transient bit
    matrix is width-proportional, not 64-bit (8x memory/time for codes).
    """
    if width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width % 8 == 0:
        # byte-aligned fast path: slice the low big-endian bytes directly
        # (no bit expansion — 8x less transient memory traffic)
        nb = width // 8
        sliced = v.astype(">u8").view(np.uint8).reshape(-1, 8)[:, 8 - nb:]
        return np.ascontiguousarray(sliced).tobytes()
    nb, dt = _container(width)
    as_bytes = v.astype(dt).view(np.uint8).reshape(-1, nb)
    bits = np.unpackbits(as_bytes, axis=1)[:, nb * 8 - width:]
    return np.packbits(bits.ravel()).tobytes()


def unpack_uints(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns uint64 array of length ``n``."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width % 8 == 0:
        nb = width // 8
        raw = np.frombuffer(payload, dtype=np.uint8)[: n * nb].reshape(n, nb)
        out = np.zeros((n, 8), dtype=np.uint8)
        out[:, 8 - nb:] = raw
        return out.view(">u8").ravel().astype(np.uint64)
    nb, dt = _container(width)
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8), count=n * width)
    out = np.zeros((n, nb * 8), dtype=np.uint8)
    out[:, nb * 8 - width:] = bits.reshape(n, width)
    return np.packbits(out, axis=1).view(dt).ravel().astype(np.uint64)


def pack_bools(mask: np.ndarray) -> bytes:
    """Bitmap for a boolean array (also used for null bitmaps)."""
    return np.packbits(np.ascontiguousarray(mask, dtype=np.uint8)).tobytes()


def unpack_bools(payload: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(payload, dtype=np.uint8), count=n).astype(bool)
