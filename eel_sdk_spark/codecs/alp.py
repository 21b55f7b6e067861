"""ALP-style decimal-float codec.

Like ALP (Afroozeh & Boncz, "ALP: Adaptive Lossless floating-Point
Compression", SIGMOD 2024 — public paper), exploits that most real-world
doubles are decimals in disguise: scale by 10^e to integers, verify the
round-trip BIT-exactly per value, encode the integers with FOR/bitpack
(where prices/measurements become a few bits each), and patch the rare
non-decimal values as positional exceptions. Construction is from scratch
and whole-array numpy only (zero per-row Python, like every kernel here).

Applicability is decided by measurement, not by type: ``probe`` finds the
best exponent on a sample and the selector only routes a column here when
the sample round-trips ~fully. NaN/Inf/-0.0 mismatches and magnitudes past
2^52 (where int64<->float64 stops being exact) all land in the exception
list, so correctness never depends on the data actually being decimal.

The reference has no float codec at all (doubles go to parquet plain
pages, eel-core RowParquetWriterFn.scala:44); north-rule addition.
"""

from __future__ import annotations

import numpy as np

from . import for_
from .base import Encoded

NAME = "alp"

MAX_EXP = 14          # 10^14 covers every practical decimal scale
SAFE_MAG = 2.0 ** 52  # int64->float64 exact range for scaled values


def _exact_mask(vals: np.ndarray, p: float) -> tuple[np.ndarray, np.ndarray]:
    """(ints, ok): ok marks values that round-trip bit-exactly at 10^p.

    The check mirrors the decode computation EXACTLY (through the int64
    cast, not just float division) — e.g. -0.0 survives ``scaled / p``
    but not ``int64 -> float64``, so it must land in the exceptions."""
    with np.errstate(all="ignore"):
        scaled = np.round(vals * p)
        in_range = np.isfinite(vals) & (np.abs(scaled) < SAFE_MAG)
        ints = np.where(in_range, scaled, 0.0).astype(np.int64)
        back = ints.astype(np.float64) / p
    ok = in_range & (back.view(np.uint64) == vals.view(np.uint64))
    return ints, ok


def probe(vals: np.ndarray) -> tuple[int, float]:
    """Best decimal exponent (smallest wins ties) and its exact fraction."""
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    if vals.size == 0:
        return 0, 0.0
    best_e, best_frac = 0, -1.0
    for e in range(MAX_EXP + 1):
        _, ok = _exact_mask(vals, 10.0 ** e)
        frac = float(ok.mean())
        if frac > best_frac + 1e-12:
            best_e, best_frac = e, frac
        if frac >= 1.0:
            break
    return best_e, best_frac


def encode(vals: np.ndarray, e: int | None = None) -> Encoded:
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    if e is None:
        e, _ = probe(vals)
    p = 10.0 ** e
    ints, ok = _exact_mask(vals, p)
    exc_idx = np.flatnonzero(~ok)
    if exc_idx.size and ok.any():
        # placeholder = an in-range value so exceptions don't widen the FOR
        ints[exc_idx] = ints[np.flatnonzero(ok)[0]]
    enc = for_.encode(ints)
    tables = {}
    if exc_idx.size:
        tables["exc_i"] = exc_idx.astype(np.uint32).tobytes()
        tables["exc_v"] = vals[exc_idx].tobytes()
    return Encoded(NAME, enc.payload,
                   {"e": e, "n": int(vals.size), "ip": enc.params,
                    "nx": int(exc_idx.size)},
                   tables)


def decode(payload: bytes, params: dict, tables: dict) -> np.ndarray:
    ints = for_.decode(payload, params["ip"], {})
    out = ints.astype(np.float64) / 10.0 ** params["e"]
    if params["nx"]:
        idx = np.frombuffer(tables["exc_i"], dtype=np.uint32)
        out[idx] = np.frombuffer(tables["exc_v"], dtype=np.float64)
    return out
