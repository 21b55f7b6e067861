"""Run-length encoding for integer-kind columns (and dictionary codes).

Runs are detected with one vectorized ``np.flatnonzero(diff != 0)``; run
values and run lengths are each frame-of-reference bit-packed via the
``for_`` kernel (composition, not duplication). Sorted/low-churn columns
(lang, crawl ids, dict codes of skewed text) collapse to a few runs.

Reference analogue: parquet's RLE/dictionary hybrid that eel toggles with
``withDictionaryEncoding`` (RowParquetWriterFn.scala:44) — here an explicit,
selectable codec.
"""

from __future__ import annotations

import struct

import numpy as np

from . import for_
from .base import Encoded

NAME = "rle"


def encode(values: np.ndarray) -> Encoded:
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = v.size
    if n == 0:
        return Encoded(NAME, b"", {"n": 0, "vp": {}, "lp": {}})
    # run starts: index 0 plus every change point
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate([[0], change])
    run_values = v[starts]
    run_lengths = np.diff(np.concatenate([starts, [n]]))
    ev = for_.encode(run_values)
    el = for_.encode(run_lengths.astype(np.int64))
    payload = struct.pack("<Q", len(ev.payload)) + ev.payload + el.payload
    return Encoded(NAME, payload, {"n": n, "vp": ev.params, "lp": el.params})


def decode(payload: bytes, params: dict, tables: dict) -> np.ndarray:
    n = params["n"]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    (vlen,) = struct.unpack_from("<Q", payload, 0)
    vbuf = payload[8 : 8 + vlen]
    lbuf = payload[8 + vlen :]
    run_values = for_.decode(vbuf, params["vp"], {})
    run_lengths = for_.decode(lbuf, params["lp"], {})
    return np.repeat(run_values, run_lengths)


def estimate_bytes(n_runs: int, value_range: int, max_run: int) -> int:
    return for_.estimate_bytes(n_runs, value_range) + for_.estimate_bytes(n_runs, max_run)
