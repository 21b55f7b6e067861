"""Dictionary encoding for bytes-kind (string/binary) and integer columns.

Factorization is done by Arrow's C++ ``dictionary_encode`` (vectorized hash
table — no Python loop), codes are then either bit-packed or RLE'd
(whichever is smaller: skewed columns like ``lang`` collapse to runs).

This is the engine's replacement for the parquet dictionary toggle the
reference exposes (eel-core/.../parquet/ParquetSink.scala:13-16,
RowParquetWriterFn.scala:44) — explicit, per-block, with the dictionary
serialized into the block header.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import for_, rle
from .bitpack import bit_width
from .base import Encoded, bytes_view, bytes_to_arrow

NAME = "dict"


def _encode_codes(codes: np.ndarray) -> tuple[str, Encoded]:
    """Pick bit-pack vs RLE for the code stream."""
    packed = for_.encode(codes)
    runs = rle.encode(codes)
    if len(runs.payload) + 96 < len(packed.payload):
        return "rle", runs
    return "for", packed


def _decode_codes(mode: str, payload: bytes, params: dict) -> np.ndarray:
    if mode == "rle":
        return rle.decode(payload, params, {})
    return for_.decode(payload, params, {})


def encode_bytes(arr: pa.Array) -> Encoded:
    """arr: non-null string/binary Arrow array."""
    d = pc.dictionary_encode(arr, null_encoding="encode")
    codes = np.asarray(d.indices).astype(np.int64)
    dict_lengths, dict_data = bytes_view(d.dictionary)
    mode, enc_codes = _encode_codes(codes)
    lens_enc = for_.encode(dict_lengths.astype(np.int64))
    return Encoded(
        NAME,
        enc_codes.payload,
        {
            "vk": "bytes",
            "n": len(codes),
            "card": len(d.dictionary),
            "cmode": mode,
            "cp": enc_codes.params,
            "dlp": lens_enc.params,
        },
        {"dict_data": dict_data, "dict_lens": lens_enc.payload},
    )


def decode_bytes(payload: bytes, params: dict, tables: dict) -> tuple[np.ndarray, bytes]:
    """Returns (lengths, data) for bytes_to_arrow."""
    codes = _decode_codes(params["cmode"], payload, params["cp"])
    dict_lengths = for_.decode(tables["dict_lens"], params["dlp"], {})
    dict_data = tables["dict_data"]
    # gather: offsets of dictionary entries, then slice per code — vectorized
    # via arrow take on the reconstructed dictionary array
    darr = bytes_to_arrow(dict_lengths, dict_data, pa.large_binary())
    out = pc.take(darr, pa.array(codes, type=pa.int64()))
    return bytes_view(out)


def encode_ints(values: np.ndarray) -> Encoded:
    """Dictionary for integer columns with few distinct but wide-range values."""
    uniq, codes = np.unique(values, return_inverse=True)
    mode, enc_codes = _encode_codes(codes.astype(np.int64))
    uenc = for_.encode(uniq.astype(np.int64))
    return Encoded(
        NAME,
        enc_codes.payload,
        {"vk": "int", "n": len(codes), "card": len(uniq), "cmode": mode,
         "cp": enc_codes.params, "up": uenc.params},
        {"dict_ints": uenc.payload},
    )


def decode_ints(payload: bytes, params: dict, tables: dict) -> np.ndarray:
    codes = _decode_codes(params["cmode"], payload, params["cp"])
    uniq = for_.decode(tables["dict_ints"], params["up"], {})
    return uniq[codes]


def estimate_bytes_bytes(n: int, card: int, dict_bytes: int) -> int:
    w = bit_width(max(card - 1, 0))
    return (n * w + 7) // 8 + dict_bytes + card + 96
