"""Shared codec machinery: the Encoded container, type views, cascade compression.

Codecs are pure functions over numpy/Arrow values — no Spark imports here, so
kernels are unit-testable without a JVM (mirrors the reference's per-component
round-trip test strategy, eel-core/src/test/scala/io/eels/component/parquet/
ParquetComponentTest.scala).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

# General-purpose cascade compressor applied on top of codec payloads when it
# wins. zstd via pyarrow's bundled codec (JVM parquet uses snappy; zstd
# compresses strictly better at similar speed and is what we report against
# the reference's snappy+dict baseline). Level per profile: speed -> 3
# (~500 MB/s/core), compression -> 9 (~70 MB/s/core, ~1.7x smaller text),
# archive -> 19 (round 7: measured on FSST'd webtext 26.9x -> 36.3x e2e
# for the payload at ~1.5 MB/s/core — archival data is written once and
# its bytes are paid forever; decode speed is level-independent, zstd
# frames self-describe so reads never care which level wrote them).
_ZSTD_BY_LEVEL = {3: pa.Codec("zstd", compression_level=3),
                  9: pa.Codec("zstd", compression_level=9),
                  19: pa.Codec("zstd", compression_level=19)}
_ZSTD = _ZSTD_BY_LEVEL[3]


@dataclass
class Encoded:
    """One encoded column chunk, pre-header-serialization."""

    codec: str
    payload: bytes
    params: dict = field(default_factory=dict)
    tables: dict = field(default_factory=dict)

    @property
    def nbytes(self) -> int:
        return len(self.payload) + sum(len(t) for t in self.tables.values()) + 64


def cascade_compress(enc: Encoded, min_gain: float = 0.96,
                     level: int = 3) -> Encoded:
    """Apply zstd on the payload if it shrinks it below ``min_gain`` ×.

    Records ``z: 1`` in params so decode knows to decompress (zstd frames
    self-describe, so the level never needs to round-trip). Side tables
    stay uncompressed (they are small by construction).
    """
    if not enc.payload:
        return enc
    codec = _ZSTD_BY_LEVEL.get(level, _ZSTD)
    comp = codec.compress(enc.payload, asbytes=True)
    if len(comp) < len(enc.payload) * min_gain:
        enc.params = dict(enc.params, z=1, zlen=len(enc.payload))
        enc.payload = comp
    return enc


def cascade_decompress(payload: bytes, params: dict) -> bytes:
    if params.get("z"):
        return _ZSTD.decompress(payload, decompressed_size=params["zlen"], asbytes=True)
    return payload


# ---------------------------------------------------------------------------
# Arrow type round-tripping: serialize the exact arrow type into a side table
# so decode reconstructs bit-identical arrays (timestamp tz/unit, string vs
# large_string, etc.).
# ---------------------------------------------------------------------------

def serialize_type(typ: pa.DataType) -> bytes:
    return pa.schema([pa.field("v", typ)]).serialize().to_pybytes()


def deserialize_type(buf: bytes) -> pa.DataType:
    return pa.ipc.read_schema(pa.py_buffer(buf)).field(0).type


# ---------------------------------------------------------------------------
# Kind views: normalize a non-null Arrow array into numpy-friendly shapes.
# ---------------------------------------------------------------------------

INT_KINDS = {
    pa.types.is_integer,
    pa.types.is_timestamp,
    pa.types.is_date,
    pa.types.is_time,
    pa.types.is_boolean,
    pa.types.is_duration,
}


def kind_of(typ: pa.DataType) -> str:
    """'int' | 'float' | 'bytes' | 'other' — selects the codec family.

    Decimals with precision <= 18 route to the int family: their unscaled
    value fits int64 exactly, so prices/quantities get FOR/delta/dict/RLE
    instead of the uncompressed plain-IPC fallback (the DecimalType the
    reference round-trips through parquet INT64/FIXED decimals,
    ParquetSchemaFns.scala). Wider decimals stay 'other' -> plain."""
    if (
        pa.types.is_integer(typ)
        or pa.types.is_timestamp(typ)
        or pa.types.is_date(typ)
        or pa.types.is_time(typ)
        or pa.types.is_boolean(typ)
        or pa.types.is_duration(typ)
    ):
        return "int"
    if pa.types.is_decimal128(typ) and typ.precision <= 18:
        return "int"
    if pa.types.is_floating(typ):
        return "float"
    if (
        pa.types.is_string(typ)
        or pa.types.is_large_string(typ)
        or pa.types.is_binary(typ)
        or pa.types.is_large_binary(typ)
    ):
        return "bytes"
    return "other"


def int_view(arr: pa.Array) -> np.ndarray:
    """Non-null int-kind arrow array -> int64 numpy array (bit-exact).

    Timestamps/dates/times/durations reinterpret their physical integers;
    bools widen to 0/1.
    """
    typ = arr.type
    if pa.types.is_boolean(typ):
        return np.asarray(arr.cast(pa.int64()))
    if pa.types.is_timestamp(typ) or pa.types.is_duration(typ) or pa.types.is_time64(typ):
        return np.asarray(arr.view(pa.int64()))
    if pa.types.is_date32(typ) or pa.types.is_time32(typ):
        return np.asarray(arr.view(pa.int32())).astype(np.int64)
    if pa.types.is_date64(typ):
        return np.asarray(arr.view(pa.int64()))
    if pa.types.is_decimal128(typ):
        # unscaled value: decimal128 stores 16-byte two's-complement
        # little-endian words; for precision <= 18 (|v| < 2^63) the low
        # word reinterpreted as int64 IS the value
        words = np.frombuffer(arr.buffers()[1], dtype="<i8")
        lo = words[arr.offset * 2:(arr.offset + len(arr)) * 2:2]
        return np.ascontiguousarray(lo)
    return np.asarray(arr.cast(pa.int64()))


def unscaled_to_decimal(lo: np.ndarray, typ: pa.DataType,
                        validity: "pa.Buffer | None" = None,
                        null_count: int = 0) -> pa.Array:
    """int64 unscaled values -> decimal128 array (inverse of the
    ``int_view`` decimal branch): sign-extend into the high word and
    interleave into the 16-byte little-endian storage."""
    lo = lo.astype("<i8", copy=False)
    words = np.empty(lo.size * 2, dtype="<i8")
    words[0::2] = lo
    words[1::2] = np.where(lo < 0, np.int64(-1), np.int64(0))
    return pa.Array.from_buffers(
        typ, lo.size, [validity, pa.py_buffer(words.tobytes())],
        null_count=null_count if validity is not None else 0)


def ints_to_arrow(values: np.ndarray, typ: pa.DataType) -> pa.Array:
    """Inverse of :func:`int_view` for a given target arrow type."""
    if pa.types.is_boolean(typ):
        return pa.array(values.astype(bool), type=pa.bool_())
    if pa.types.is_decimal128(typ):
        return unscaled_to_decimal(values.astype(np.int64), typ)
    if pa.types.is_timestamp(typ) or pa.types.is_duration(typ) or pa.types.is_time64(typ):
        return pa.array(values.astype(np.int64), type=pa.int64()).view(typ)
    if pa.types.is_date32(typ) or pa.types.is_time32(typ):
        return pa.array(values.astype(np.int32), type=pa.int32()).view(typ)
    if pa.types.is_date64(typ):
        return pa.array(values.astype(np.int64), type=pa.int64()).view(typ)
    return pa.array(values.astype(np.int64), type=pa.int64()).cast(typ)


def bytes_view(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """Non-null string/binary arrow array -> (lengths int64, concatenated data)."""
    big = arr.cast(pa.large_binary())
    # combine_chunks not needed: single Array. Buffers: [validity, offsets, data]
    offsets = np.frombuffer(big.buffers()[1], dtype=np.int64, count=len(big) + 1,
                            offset=big.offset * 8)
    data_buf = big.buffers()[2]
    if data_buf is None:
        data = b""
    else:
        # slice the Arrow buffer first (zero-copy), then materialize once
        data = data_buf.slice(int(offsets[0]),
                              int(offsets[-1] - offsets[0])).to_pybytes()
    lengths = np.diff(offsets)
    return lengths, data


def bytes_to_arrow(lengths: np.ndarray, data: bytes, typ: pa.DataType) -> pa.Array:
    offsets = np.concatenate([[0], np.cumsum(lengths, dtype=np.int64)])
    big = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(lengths),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
    )
    return big.cast(typ)
