"""Plain codecs: the universal fallback and the raw fast paths.

- ``plain``  — Arrow IPC serialization of the chunk; correct for *every*
  Arrow type (nested lists, maps, structs, decimals), so the engine always
  has a total fallback; zstd cascade usually applies on top.
- ``raw``    — bytes-kind fast path: FOR-encoded lengths + concatenated data
  (smaller than IPC: no 8-byte offsets in the payload).
- ``rawf``   — float fast path: the IEEE bytes as-is.

Reference analogue: eel's parquet PLAIN pages when dictionary is toggled
off (RowParquetWriterFn.scala:44 with dictionary=false).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import for_
from .base import Encoded

NAME = "plain"


def encode_arrow(arr: pa.Array) -> Encoded:
    batch = pa.record_batch([arr], names=["v"])
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    return Encoded(NAME, sink.getvalue().to_pybytes(), {"n": len(arr)})


def decode_arrow(payload: bytes, params: dict, tables: dict) -> pa.Array:
    with pa.ipc.open_stream(pa.py_buffer(payload)) as r:
        batch = r.read_next_batch()
    return batch.column(0)


def encode_raw_bytes(lengths: np.ndarray, data: bytes) -> Encoded:
    lens_enc = for_.encode(lengths.astype(np.int64))
    return Encoded("raw", data, {"n": len(lengths), "lp": lens_enc.params},
                   {"lens": lens_enc.payload})


def decode_raw_bytes(payload: bytes, params: dict, tables: dict) -> tuple[np.ndarray, bytes]:
    lengths = for_.decode(tables["lens"], params["lp"], {})
    return lengths, payload


def encode_floats(values: np.ndarray) -> Encoded:
    return Encoded("rawf", values.tobytes(), {"n": values.size, "dt": values.dtype.str})


def decode_floats(payload: bytes, params: dict, tables: dict) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.dtype(params["dt"]), count=params["n"])


def encode_floats_shuffled(values: np.ndarray) -> Encoded:
    """Byte-shuffle (a la blosc/parquet BYTE_STREAM_SPLIT): transpose the
    byte planes so exponents/high mantissa bytes — which vary slowly —
    become long runs the zstd cascade crushes. Standard trick for float
    and embedding columns; lossless by construction."""
    v = np.ascontiguousarray(values)
    itemsize = v.dtype.itemsize
    planes = v.view(np.uint8).reshape(-1, itemsize).T
    return Encoded("shuf", np.ascontiguousarray(planes).tobytes(),
                   {"n": v.size, "dt": v.dtype.str})


def decode_floats_shuffled(payload: bytes, params: dict, tables: dict) -> np.ndarray:
    dt = np.dtype(params["dt"])
    n = params["n"]
    planes = np.frombuffer(payload, dtype=np.uint8).reshape(dt.itemsize, n)
    return np.ascontiguousarray(planes.T).reshape(-1).view(dt)[:n]
