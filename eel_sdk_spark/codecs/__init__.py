"""Codec registry + the column-level encode/decode entry points.

``encode_column(arr)`` takes one Arrow array (one column of one batch),
strips nulls into a bitmap, routes the non-null values to a kernel chosen by
the selector, applies the zstd cascade, and returns ``(header, payload)``
bytes. ``decode_column(header, payload)`` is its exact inverse — the
round-trip is bit-identical including null positions and Arrow type
(timestamp unit/tz, string vs binary).

Kernel modules: ``for_`` (frame-of-reference/delta), ``rle``, ``dictionary``,
``fsst`` (symbol table), ``plain``/``raw`` fallbacks, ``bitpack`` primitives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import blocks
from . import alp, dictionary, for_, fsst, gorilla, plain, rle
from .base import (
    Encoded,
    bytes_to_arrow,
    bytes_view,
    cascade_compress,
    cascade_decompress,
    deserialize_type,
    int_view,
    ints_to_arrow,
    kind_of,
    serialize_type,
)

_ZSTD = pa.Codec("zstd", compression_level=3)

CODEC_NAMES = ("for", "rle", "dict", "fsst", "raw", "rawf", "shuf", "alp",
               "gor", "plain")


def _compress_tables(enc: Encoded) -> None:
    zt = []
    for name, data in list(enc.tables.items()):
        if len(data) > 512:
            comp = _ZSTD.compress(data, asbytes=True)
            if len(comp) < len(data) * 0.96:
                enc.tables[name] = comp
                zt.append([name, len(data)])
    if zt:
        enc.params["zt"] = zt


def _decompress_tables(params: dict, tables: dict) -> None:
    for name, orig_len in params.get("zt", []):
        tables[name] = _ZSTD.decompress(tables[name], decompressed_size=orig_len,
                                        asbytes=True)


def encode_values(values: pa.Array, kind: str, codec: str,
                  ctx: dict | None = None, ctx_key: str = "",
                  profile: str = "speed") -> Encoded:
    """Encode a non-null Arrow array with an explicit codec.

    ``ctx`` is a per-partition mutable cache: FSST symbol tables are
    trained once per (partition, column) and reused for later blocks —
    amortizing training the way parquet reuses a dictionary per row group.
    """
    if codec == "plain":
        return plain.encode_arrow(values)
    if kind == "int":
        iv = int_view(values)
        if codec == "for":
            return for_.encode(iv, byte_align=(profile == "speed"))
        if codec == "rle":
            return rle.encode(iv)
        if codec == "dict":
            return dictionary.encode_ints(iv)
    elif kind == "float":
        if codec == "rawf":
            return plain.encode_floats(np.asarray(values))
        if codec == "shuf":
            return plain.encode_floats_shuffled(np.asarray(values))
        if codec == "alp":
            return alp.encode(np.asarray(values))
        if codec == "gor":
            return gorilla.encode(np.asarray(values))
    elif kind == "bytes":
        if codec == "dict":
            return dictionary.encode_bytes(values)
        if codec == "fsst":
            lengths, data = bytes_view(values)
            merges = ctx.get(("fsst", ctx_key)) if ctx is not None else None
            if merges is None:
                merges = fsst.train(
                    data, min_pair_frac=fsst.frac_for_profile(profile))
                if ctx is not None:
                    ctx[("fsst", ctx_key)] = merges
            return fsst.encode(lengths, data, merges=merges)
        if codec == "raw":
            lengths, data = bytes_view(values)
            return plain.encode_raw_bytes(lengths, data)
    raise ValueError(f"codec {codec!r} not applicable to kind {kind!r}")


def decode_values(codec: str, kind: str, payload: bytes, params: dict,
                  tables: dict, typ: pa.DataType) -> pa.Array:
    if codec == "plain":
        return plain.decode_arrow(payload, params, tables)
    if kind == "int":
        if codec == "for":
            return ints_to_arrow(for_.decode(payload, params, tables), typ)
        if codec == "rle":
            return ints_to_arrow(rle.decode(payload, params, tables), typ)
        if codec == "dict":
            return ints_to_arrow(dictionary.decode_ints(payload, params, tables), typ)
    elif kind == "float":
        if codec == "rawf":
            return pa.array(plain.decode_floats(payload, params, tables), type=typ)
        if codec == "shuf":
            return pa.array(plain.decode_floats_shuffled(payload, params, tables),
                            type=typ)
        if codec == "alp":
            return pa.array(alp.decode(payload, params, tables), type=typ)
        if codec == "gor":
            return pa.array(gorilla.decode(payload, params, tables), type=typ)
    elif kind == "bytes":
        if codec == "dict":
            lengths, data = dictionary.decode_bytes(payload, params, tables)
        elif codec == "fsst":
            lengths, data = fsst.decode(payload, params, tables)
        elif codec == "raw":
            lengths, data = plain.decode_raw_bytes(payload, params, tables)
        else:
            raise ValueError(codec)
        return bytes_to_arrow(lengths, data, typ)
    raise ValueError(f"codec {codec!r} not applicable to kind {kind!r}")


def encode_column(arr: pa.Array, codec: str | None = None,
                  profile: str = "speed", ctx: dict | None = None,
                  ctx_key: str = "") -> tuple[bytes, bytes, dict]:
    """One column chunk -> (header, payload, info). info feeds metrics.

    ``profile``: 'speed' (default) optimizes GB/s, 'compression' minimizes
    bytes (FSST for text) — the engine's analogue of ORC's
    SPEED/COMPRESSION EncodingStrategy (eel-orc/.../OrcSink.scala:15-33).
    """
    from .. import selector  # late import: selector uses kernel cost hooks

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    typ = arr.type
    n_total = len(arr)
    n_nulls = arr.null_count
    kind = kind_of(typ)
    values = arr.drop_null() if n_nulls else arr
    if kind == "other":
        codec = "plain"
    if codec is None:
        codec = selector.choose(values, kind, profile=profile)
    # plain (Arrow IPC) carries nulls inline: feed it the full array
    enc = encode_values(arr if codec == "plain" else values, kind, codec,
                        ctx=ctx, ctx_key=ctx_key, profile=profile)
    enc = cascade_compress(
        enc, level={"speed": 3, "archive": 19}.get(profile, 9))
    _compress_tables(enc)

    enc.params.update({"codec": enc.codec, "kind": kind, "nt": n_total, "nn": n_nulls})
    enc.tables["schema"] = serialize_type(typ)
    if n_nulls and enc.codec != "plain":
        enc.tables["nulls"] = np.packbits(
            np.asarray(arr.is_valid(), dtype=np.uint8), bitorder="little").tobytes()
    header = blocks.pack_header(enc.params, enc.tables)
    info = {"codec": enc.codec, "kind": kind, "n": n_total, "nn": n_nulls,
            "enc_bytes": len(header) + len(enc.payload)}
    return header, enc.payload, info


def decode_column(header: bytes, payload: bytes) -> pa.Array:
    params, tables = blocks.unpack_header(header)
    _decompress_tables(params, tables)
    payload = cascade_decompress(payload, params)
    typ = deserialize_type(tables["schema"])
    codec, kind = params["codec"], params["kind"]
    n_total, n_nulls = params["nt"], params["nn"]

    values = decode_values(codec, kind, payload, params, tables, typ)
    if codec == "plain" or n_nulls == 0:
        return values
    validity = np.unpackbits(np.frombuffer(tables["nulls"], dtype=np.uint8),
                             count=n_total, bitorder="little").astype(bool)
    return _scatter_with_nulls(values, validity, typ)


def _scatter_with_nulls(values: pa.Array, validity: np.ndarray,
                        typ: pa.DataType) -> pa.Array:
    """Re-insert nulls: positions where validity is False become null."""
    n = validity.size
    kind = kind_of(typ)
    idx = np.flatnonzero(validity)
    if kind == "int":
        out = np.zeros(n, dtype=np.int64)
        out[idx] = int_view(values)
        return _int_scatter_special(out, validity, typ)
    if kind == "float":
        np_vals = np.asarray(values)
        out = np.zeros(n, dtype=np_vals.dtype)
        out[idx] = np_vals
        return pa.Array.from_pandas(out, mask=~validity, type=typ)
    # bytes kind: rebuild lengths with zeros at null slots
    lengths, data = bytes_view(values)
    full_lengths = np.zeros(n, dtype=np.int64)
    full_lengths[idx] = lengths
    dense = bytes_to_arrow(full_lengths, data, pa.large_binary())
    # attach validity bitmap
    bitmap = pa.py_buffer(np.packbits(validity, bitorder="little").tobytes())
    buffers = dense.buffers()
    with_nulls = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [bitmap, buffers[1], buffers[2]],
        null_count=int(n - idx.size))
    return with_nulls.cast(typ)


def _int_scatter_special(out: np.ndarray, validity: np.ndarray,
                         typ: pa.DataType) -> pa.Array:
    """Timestamps/dates/bools with nulls: build int array then view/cast."""
    if pa.types.is_decimal128(typ):
        from .base import unscaled_to_decimal

        bitmap = pa.py_buffer(
            np.packbits(validity, bitorder="little").tobytes())
        return unscaled_to_decimal(
            out, typ, validity=bitmap,
            null_count=int(validity.size - np.count_nonzero(validity)))
    arr64 = pa.Array.from_pandas(out.astype(np.int64), mask=~validity, type=pa.int64())
    if pa.types.is_boolean(typ):
        return arr64.cast(pa.bool_())
    if pa.types.is_timestamp(typ) or pa.types.is_duration(typ) or pa.types.is_time64(typ):
        return arr64.view(typ)
    if pa.types.is_date32(typ) or pa.types.is_time32(typ):
        return arr64.cast(pa.int32()).view(typ)
    if pa.types.is_date64(typ):
        return arr64.view(typ)
    return arr64.cast(typ)
