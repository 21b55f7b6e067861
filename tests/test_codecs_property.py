"""Property-based round-trip tests for codec kernels (hypothesis).

Complements the example-based suite: any int64 array, any byte-string
column, any null pattern must round-trip bit-identically through every
applicable codec. (The reference has no property testing — SURVEY.md §5 —
this is a strict upgrade on its round-trip suites.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from eel_sdk_spark.codecs import decode_column, encode_column, for_, fsst, rle

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(st.lists(i64, max_size=300))
def test_for_any_ints(xs):
    vals = np.array(xs, dtype=np.int64)
    enc = for_.encode(vals)
    np.testing.assert_array_equal(
        for_.decode(enc.payload, enc.params, enc.tables), vals)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), max_size=300))
def test_rle_any_ints(xs):
    vals = np.array(xs, dtype=np.int64)
    enc = rle.encode(vals)
    np.testing.assert_array_equal(
        rle.decode(enc.payload, enc.params, enc.tables), vals)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=80))
def test_fsst_any_bytes(bs):
    data = b"".join(bs)
    lengths = np.array([len(b) for b in bs], dtype=np.int64)
    enc = fsst.encode(lengths, data)
    lens2, data2 = fsst.decode(enc.payload, enc.params, enc.tables)
    assert data2 == data
    np.testing.assert_array_equal(lens2, lengths)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), i64), max_size=200),
       st.sampled_from(["for", "rle", "dict", "plain", None]))
def test_column_any_nullable_ints(xs, codec):
    arr = pa.array(xs, type=pa.int64())
    header, payload, _ = encode_column(arr, codec=codec)
    assert decode_column(header, payload).equals(arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=150),
       st.sampled_from(["dict", "fsst", "raw", "plain", None]))
def test_column_any_nullable_strings(xs, codec):
    arr = pa.array(xs, type=pa.string())
    header, payload, _ = encode_column(arr, codec=codec)
    assert decode_column(header, payload).equals(arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=40)), max_size=120))
def test_column_any_nullable_binary(xs):
    arr = pa.array(xs, type=pa.binary())
    header, payload, _ = encode_column(arr)
    assert decode_column(header, payload).equals(arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(min_value=0, max_value=2**63 - 1)),
                max_size=150))
def test_column_timestamps(xs):
    arr = pa.array(xs, type=pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    header, payload, _ = encode_column(arr)
    assert decode_column(header, payload).equals(arr)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.integers(min_value=-10**10, max_value=10**10).map(
        lambda i: i / 100.0),  # decimal-ish values: the ALP sweet spot
), max_size=300))
def test_alp_any_doubles(xs):
    """Any float64 array — decimal, random-precision, NaN/Inf/-0.0 —
    round-trips BIT-identically through alp (exceptions catch the rest)."""
    from eel_sdk_spark.codecs import alp

    vals = np.array(xs, dtype=np.float64)
    enc = alp.encode(vals)
    out = alp.decode(enc.payload, enc.params, enc.tables)
    np.testing.assert_array_equal(out.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=False, allow_infinity=False,
                                    width=64)),
                min_size=1, max_size=200))
def test_column_nullable_doubles_alp(xs):
    """Full column path with nulls, forced through alp."""
    arr = pa.array(xs, type=pa.float64())
    h, p, _ = encode_column(arr, codec="alp")
    assert decode_column(h, p).equals(arr)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
                max_size=300))
def test_gorilla_any_doubles(xs):
    """Any float64 array — NaN/Inf/-0.0 included — round-trips
    BIT-identically through the XOR codec (it's bits in, bits out)."""
    from eel_sdk_spark.codecs import gorilla

    vals = np.array(xs, dtype=np.float64)
    enc = gorilla.encode(vals)
    out = gorilla.decode(enc.payload, enc.params, enc.tables)
    np.testing.assert_array_equal(out.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=False, allow_infinity=False,
                                    width=32)),
                min_size=1, max_size=200),
       st.sampled_from([pa.float32(), pa.float64()]))
def test_column_nullable_floats_gorilla(xs, typ):
    """Full column path with nulls, forced through gor — both widths."""
    arr = pa.array(xs, type=typ)
    h, p, _ = encode_column(arr, codec="gor")
    assert decode_column(h, p).equals(arr)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_whole_table_random_schema_roundtrip(data):
    """Table-level fuzz: a random schema (1-6 columns over ints, floats,
    strings, binary, bools, timestamps — nullable) encodes column by
    column through the FULL selector-driven path and decodes
    bit-identically. This is the schema-space sweep the fixed-table Spark
    tests can't cover."""
    col_strats = {
        pa.int64(): st.one_of(st.none(), st.integers(-2**62, 2**62)),
        pa.int32(): st.one_of(st.none(), st.integers(-2**31, 2**31 - 1)),
        pa.float64(): st.one_of(st.none(), st.floats(
            allow_nan=True, allow_infinity=True, width=64)),
        pa.float32(): st.one_of(st.none(), st.floats(
            allow_nan=False, allow_infinity=False, width=32)),
        pa.large_string(): st.one_of(st.none(), st.text(max_size=40)),
        pa.large_binary(): st.one_of(st.none(), st.binary(max_size=40)),
        pa.bool_(): st.one_of(st.none(), st.booleans()),
        pa.timestamp("us"): st.one_of(st.none(), st.integers(
            -2**52, 2**52)),
    }
    types = data.draw(st.lists(st.sampled_from(list(col_strats)),
                               min_size=1, max_size=6))
    n = data.draw(st.integers(min_value=0, max_value=200))
    ctx: dict = {}
    for i, typ in enumerate(types):
        vals = data.draw(st.lists(col_strats[typ], min_size=n, max_size=n))
        if pa.types.is_timestamp(typ):
            arr = pa.array(vals, type=pa.int64()).cast(typ)
        else:
            arr = pa.array(vals, type=typ)
        h, p, info = encode_column(arr, ctx=ctx, ctx_key=f"c{i}")
        out = decode_column(h, p)
        assert out.type == arr.type, (info, out.type, arr.type)
        if pa.types.is_floating(typ):
            # Arrow .equals applies IEEE NaN != NaN; the engine contract
            # is BIT identity — compare bit patterns + null masks
            assert out.is_null().equals(arr.is_null()), info
            a = np.asarray(out.fill_null(0.0))
            b = np.asarray(arr.fill_null(0.0))
            np.testing.assert_array_equal(
                a.view(np.uint64 if typ == pa.float64() else np.uint32),
                b.view(np.uint64 if typ == pa.float64() else np.uint32))
        else:
            assert out.equals(arr), (info, typ)
