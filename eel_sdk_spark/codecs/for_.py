"""Frame-of-reference codec for integer-kind columns (ints, timestamps, dates, bools).

Subtract a per-block reference (the min), bit-pack the residuals; a ``delta``
mode first differences the sequence (crawl timestamps arrive nearly sorted,
so deltas are tiny — the reference instead stores INT96 per value:
eel-core/src/main/scala/io/eels/component/parquet/RecordWriter.scala:201-214).

All arithmetic is uint64 wraparound (mod 2^64), which makes subtract/add
exact for any int64 input including extreme ranges.
"""

from __future__ import annotations

import numpy as np

from .base import Encoded
from .bitpack import bit_width, pack_uints, unpack_uints

NAME = "for"


def _width_for(deltas: np.ndarray) -> int:
    return bit_width(int(deltas.max())) if deltas.size else 0


def _maybe_align(width: int, byte_align: bool) -> int:
    """speed-profile width policy: widths over 24 bits round up to the next
    byte so pack_uints takes its no-bit-expansion path (measured 80x faster
    at 37->40 bits for +8% pre-cascade payload); narrow widths stay exact —
    their containers are small and the byte padding costs zstd more than
    the expansion costs CPU."""
    if byte_align and width > 24 and width % 8:
        return min(width + 8 - width % 8, 64)
    return width


def encode(values: np.ndarray, byte_align: bool = False) -> Encoded:
    """values: int64 numpy array (non-null). Picks plain-FOR or delta-FOR."""
    v = values.astype(np.uint64, copy=False)
    n = v.size
    if n == 0:
        return Encoded(NAME, b"", {"mode": "for", "ref": "0", "w": 0, "n": 0})

    # mode 1: FOR against min
    ref = v[int(np.argmin(values))]  # min in signed order
    resid = v - ref  # wraparound-correct for signed min
    w_for = _maybe_align(_width_for(resid), byte_align)

    # mode 2: delta (first value + wrapped diffs, FOR'd against their min)
    if n > 1:
        d = v[1:] - v[:-1]  # uint64 wraparound diffs
        dref = d[int(np.argmin(d.astype(np.int64)))]
        dresid = d - dref
        w_delta = _maybe_align(_width_for(dresid), byte_align)
        delta_bits = (n - 1) * w_delta
    else:
        delta_bits = 1 << 62
        dref = np.uint64(0)

    if delta_bits + 128 < n * w_for:
        payload = pack_uints(dresid, w_delta)
        return Encoded(
            NAME, payload,
            {"mode": "delta", "first": str(int(v[0])), "ref": str(int(dref)),
             "w": w_delta, "n": n},
        )
    payload = pack_uints(resid, w_for)
    return Encoded(NAME, payload, {"mode": "for", "ref": str(int(ref)), "w": w_for, "n": n})


def decode(payload: bytes, params: dict, tables: dict) -> np.ndarray:
    """Returns int64 numpy array."""
    n = params["n"]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    w = params["w"]
    ref = np.uint64(int(params["ref"]) & 0xFFFFFFFFFFFFFFFF)
    if params["mode"] == "delta":
        d = unpack_uints(payload, w, n - 1) + ref
        out = np.empty(n, dtype=np.uint64)
        out[0] = np.uint64(int(params["first"]) & 0xFFFFFFFFFFFFFFFF)
        np.cumsum(d, out=out[1:])  # partial sums of diffs
        out[1:] += out[0]
        return out.view(np.int64)
    resid = unpack_uints(payload, w, n)
    return (resid + ref).view(np.int64)


def estimate_bytes(n: int, value_range: int, delta_range: int | None = None) -> int:
    """Cost-model hook for the selector: bits = n * width(range)."""
    w = bit_width(value_range) if value_range >= 0 else 64
    est = (n * w + 7) // 8
    if delta_range is not None and delta_range >= 0:
        est = min(est, (n * bit_width(delta_range) + 7) // 8)
    return est + 64
