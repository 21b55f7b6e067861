"""Kernel-level round-trip tests on adversarial arrays (no Spark needed).

Patterned on the reference's per-component round-trip suites
(eel-core/src/test/scala/io/eels/component/parquet/ParquetComponentTest.scala):
write -> read back -> exact equality. Adversarial slices per FIXTURES.md §1:
empty, all-null, single-value, max-cardinality, non-ASCII, embedded NULs.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest

from eel_sdk_spark import blocks
from eel_sdk_spark.codecs import (
    bitpack,
    decode_column,
    encode_column,
    for_,
    fsst,
    rle,
)

rng = np.random.default_rng(42)


# ---------------------------------------------------------------- bitpack
@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 31, 33, 64])
def test_bitpack_roundtrip(width):
    n = 257
    if width == 0:
        vals = np.zeros(n, dtype=np.uint64)
    else:
        vals = rng.integers(0, 2 ** min(width, 63), size=n, dtype=np.uint64)
        if width == 64:
            vals[0] = np.uint64(2**64 - 1)
        vals[1] = np.uint64((1 << width) - 1)
    buf = bitpack.pack_uints(vals, width)
    out = bitpack.unpack_uints(buf, width, n)
    np.testing.assert_array_equal(vals, out)


# ---------------------------------------------------------------- for / rle
INT_CASES = [
    np.array([], dtype=np.int64),
    np.array([7], dtype=np.int64),
    np.full(1000, -3, dtype=np.int64),
    np.arange(10_000, dtype=np.int64),                    # delta-friendly
    rng.integers(-(2**62), 2**62, 5000).astype(np.int64),  # wide range
    np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0], dtype=np.int64),
    np.repeat(np.array([5, -1, 5, 9], dtype=np.int64), [100, 1, 3000, 7]),
]


@pytest.mark.parametrize("vals", INT_CASES)
def test_for_roundtrip(vals):
    enc = for_.encode(vals)
    out = for_.decode(enc.payload, enc.params, enc.tables)
    np.testing.assert_array_equal(vals, out)


@pytest.mark.parametrize("vals", INT_CASES)
def test_rle_roundtrip(vals):
    enc = rle.encode(vals)
    out = rle.decode(enc.payload, enc.params, enc.tables)
    np.testing.assert_array_equal(vals, out)


def test_for_sorted_uses_delta():
    enc = for_.encode(np.arange(1_000_000, 2_000_000, dtype=np.int64))
    assert enc.params["mode"] == "delta"
    assert len(enc.payload) < 1000  # constant delta packs to ~0 bits


def test_rle_compresses_runs():
    vals = np.repeat(np.arange(10, dtype=np.int64), 10_000)
    enc = rle.encode(vals)
    assert len(enc.payload) < 400


# ---------------------------------------------------------------- fsst
def test_fsst_roundtrip_text():
    docs = [f"the quick brown fox {i} jumps over the lazy dog" for i in range(200)]
    data = "".join(docs).encode()
    lengths = np.array([len(d.encode()) for d in docs], dtype=np.int64)
    enc = fsst.encode(lengths, data)
    lens2, data2 = fsst.decode(enc.payload, enc.params, enc.tables)
    assert data2 == data
    np.testing.assert_array_equal(lengths, lens2)
    assert len(enc.payload) < len(data) * 0.7  # actually compresses


def test_fsst_roundtrip_binary_and_empty():
    raws = [b"", b"\x00\xff\x00seq", "héllo wörld".encode() * 3, b"\x00" * 50]
    data = b"".join(raws)
    lengths = np.array([len(r) for r in raws], dtype=np.int64)
    enc = fsst.encode(lengths, data)
    lens2, data2 = fsst.decode(enc.payload, enc.params, enc.tables)
    assert data2 == data
    np.testing.assert_array_equal(lengths, lens2)


# ---------------------------------------------------------------- header
def test_header_roundtrip():
    params = {"codec": "for", "n": 3, "nested": {"a": [1, 2]}}
    tables = {"dict": b"\x00\x01binary\xff", "nulls": b""}
    buf = blocks.pack_header(params, tables)
    p2, t2 = blocks.unpack_header(buf)
    assert p2 == params
    assert t2 == tables


# ------------------------------------------------------- column round-trips
TS = pa.timestamp("us", tz="UTC")
COLUMN_CASES = [
    pa.array([], type=pa.int64()),
    pa.array([None, None, None], type=pa.int64()),
    pa.array([1, None, 3, None, 5], type=pa.int64()),
    pa.array(rng.integers(0, 50, 10_000), type=pa.int32()),
    pa.array([True, False, None, True] * 100),
    pa.array(rng.normal(size=1000), type=pa.float64()),
    pa.array([1.5, None, float("nan"), float("inf")], type=pa.float32()),
    pa.array(["en"] * 500 + ["de"] * 20 + [None, "fr"]),
    pa.array([f"https://example-{i}.com/p/{i*7}" for i in range(2000)]),
    pa.array([b"\x00\xff", None, b"", b"x" * 1000], type=pa.binary()),
    pa.array(["多语言文本", "多语言文本", None, "héllo"], type=pa.large_string()),
    pa.array(
        [dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
         + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 86400, 500)],
        type=TS),
    pa.array([None, dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)], type=TS),
    pa.array([dt.date(2020, 1, 1), None, dt.date(1970, 1, 1)]),
    pa.array([[1, 2], None, [3]], type=pa.list_(pa.int64())),   # nested -> plain
    pa.array([{"a": 1}, {"a": None}], type=pa.struct([("a", pa.int64())])),
]


def assert_arrays_equal(a: pa.Array, b: pa.Array):
    """Bit-exact comparison with IEEE-NaN treated as equal to itself."""
    assert a.type == b.type
    assert len(a) == len(b)
    if pa.types.is_floating(a.type):
        np.testing.assert_array_equal(np.asarray(a.is_null()), np.asarray(b.is_null()))
        av = np.asarray(a.fill_null(0.0))
        bv = np.asarray(b.fill_null(0.0))
        np.testing.assert_array_equal(av.view(np.uint8), bv.view(np.uint8))
    else:
        assert a.equals(b)


@pytest.mark.parametrize("arr", COLUMN_CASES, ids=range(len(COLUMN_CASES)))
def test_column_roundtrip(arr):
    header, payload, info = encode_column(arr)
    out = decode_column(header, payload)
    assert_arrays_equal(out, arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)


@pytest.mark.parametrize("codec", ["for", "rle", "dict", "plain"])
def test_column_forced_codec_int(codec):
    arr = pa.array([5, 5, 5, 9, None, 9, 123456], type=pa.int64())
    header, payload, _ = encode_column(arr, codec=codec)
    assert decode_column(header, payload).equals(arr)


@pytest.mark.parametrize("codec", ["dict", "fsst", "raw", "plain"])
def test_column_forced_codec_bytes(codec):
    arr = pa.array(["aa", None, "bb", "aa", "the the the", ""], type=pa.string())
    header, payload, _ = encode_column(arr, codec=codec)
    assert decode_column(header, payload).equals(arr)


def test_selected_codecs_are_sensible():
    _, _, info_lang = encode_column(pa.array(["en"] * 900 + ["de"] * 100))
    assert info_lang["codec"] in ("dict",)
    _, _, info_sorted_ts = encode_column(
        pa.array(np.arange(10_000) * 1000, type=pa.int64()))
    assert info_sorted_ts["codec"] == "for"


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_byteshuffle_float_roundtrip(dtype):
    vals = rng.normal(loc=1.0, scale=0.01, size=5000).astype(dtype)
    arr = pa.array(vals, type=pa.float32() if dtype == "float32"
                   else pa.float64())
    header, payload, info = encode_column(arr, codec="shuf")
    out = decode_column(header, payload)
    np.testing.assert_array_equal(np.asarray(out).view(np.uint8),
                                  vals.view(np.uint8))


def test_byteshuffle_beats_raw_on_embeddings():
    """Clustered low-variance floats (embedding-like): shuffled planes
    compress better and the selector picks shuf."""
    vals = (rng.normal(size=(200, 64)) * 0.1 + 1.0).astype(np.float32).ravel()
    arr = pa.array(vals, type=pa.float32())
    h_raw, p_raw, _ = encode_column(arr, codec="rawf")
    h_shuf, p_shuf, info = encode_column(arr, codec="shuf")
    assert len(p_shuf) < len(p_raw)
    _, _, auto = encode_column(arr)
    assert auto["codec"] == "shuf"


def test_decimal_and_map_roundtrip():
    """Map columns ride the Arrow-IPC plain fallback; decimals with
    precision <= 18 route through the INT family on their unscaled
    int64 value (the reference writes these as parquet INT64/FLBA
    decimals, RecordWriter.scala:178-186) — lightweight codecs instead
    of uncompressed IPC."""
    import decimal
    dec = pa.array([decimal.Decimal("123.45"), None,
                    decimal.Decimal("-0.01")], type=pa.decimal128(10, 2))
    h, p, info = encode_column(dec)
    assert info["kind"] == "int" and info["codec"] != "plain"
    assert decode_column(h, p).equals(dec)

    mp = pa.array([{"a": 1}, None, {"b": 2, "c": 3}],
                  type=pa.map_(pa.string(), pa.int64()))
    h, p, _ = encode_column(mp)
    assert decode_column(h, p).equals(mp)


def test_decimal_int_family_roundtrips():
    """Decimal-as-int coverage: dict on repeats, FOR/delta on sorted
    prices (tiny output), nulls + negatives + offset slices bit-exact,
    and precision > 18 stays on the plain fallback (unscaled no longer
    fits int64)."""
    import decimal as D

    vals = [None, "12.34", "-99999999.99", "0.01", None, "4500.00",
            "-0.01"] * 300
    arr = pa.array([None if v is None else D.Decimal(v) for v in vals],
                   type=pa.decimal128(12, 2))
    for sl in (arr, arr.slice(3, 1500)):
        h, p, info = encode_column(sl)
        assert info["kind"] == "int"
        assert decode_column(h, p).equals(sl)

    prices = pa.array([D.Decimal(i) / 100 for i in range(20000)],
                      type=pa.decimal128(12, 2))
    h, p, info = encode_column(prices)
    assert info["codec"] == "for"
    assert info["enc_bytes"] < 2000  # constant-delta ramp collapses
    assert decode_column(h, p).equals(prices)

    wide = pa.array([D.Decimal("1.23456789012345678901")] * 100,
                    type=pa.decimal128(38, 20))
    h, p, info = encode_column(wide)
    assert info["codec"] == "plain"
    assert decode_column(h, p).equals(wide)

    # int64-boundary unscaled values at exactly precision 18
    edge = pa.array([D.Decimal("9.99999999e9"), D.Decimal("-9.99999999e9"),
                     D.Decimal(0)], type=pa.decimal128(18, 8))
    h, p, info = encode_column(edge)
    assert info["kind"] == "int"
    assert decode_column(h, p).equals(edge)


class TestAlp:
    """ALP-style decimal doubles: scale-to-int + FOR, exceptions patched."""

    def test_decimal_roundtrip(self):
        import numpy as np

        from eel_sdk_spark.codecs import alp

        vals = np.round(np.linspace(1.0, 99999.99, 10_000), 2)
        enc = alp.encode(vals)
        assert enc.params["e"] == 2 and enc.params["nx"] == 0
        out = alp.decode(enc.payload, enc.params, enc.tables)
        assert out.view(np.uint64).tolist() == vals.view(np.uint64).tolist()
        # the scaled ints FOR-pack far below 8 bytes/value
        assert len(enc.payload) < vals.nbytes / 2

    def test_exceptions_patched_bit_exact(self):
        import numpy as np

        from eel_sdk_spark.codecs import alp

        vals = np.round(np.arange(1000, dtype=np.float64) * 0.01, 2)
        vals[10] = np.pi
        vals[500] = np.nan
        vals[999] = np.inf
        vals[3] = -0.0
        enc = alp.encode(vals)
        assert enc.params["nx"] >= 3
        out = alp.decode(enc.payload, enc.params, enc.tables)
        assert out.view(np.uint64).tolist() == vals.view(np.uint64).tolist()

    def test_non_decimal_probe_rejects(self):
        import numpy as np

        from eel_sdk_spark.codecs import alp

        rng = np.random.default_rng(7)
        vals = rng.standard_normal(4096)  # full-precision: not decimal
        _, frac = alp.probe(vals)
        assert frac < 0.5

    def test_selector_routes_prices_to_alp(self, spark=None):
        import numpy as np
        import pyarrow as pa

        from eel_sdk_spark import selector
        from eel_sdk_spark.codecs import decode_column, encode_column

        prices = pa.array(np.round(
            np.random.default_rng(3).uniform(1, 9e4, 20_000), 2))
        assert selector.choose(prices, "float") == "alp"
        h, p, info = encode_column(prices)
        assert info["codec"] == "alp"
        assert decode_column(h, p).equals(prices)
        # and genuinely random doubles do NOT route to alp
        noise = pa.array(np.random.default_rng(4).standard_normal(8192))
        assert selector.choose(noise, "float") in ("rawf", "shuf")

    def test_float_tiebreak_prefers_cheapest_decode(self, monkeypatch=None):
        """An exact tie among penalized trial sizes must select the
        CHEAPEST decode (raw < shuf < gor), not the most expensive: rig
        the trial compressor so raw*100 == shuf*102 == gor*103 exactly
        (LCM sizes 5253/5150/5100) and assert rawf wins."""
        from unittest import mock

        import numpy as np
        import pyarrow as pa

        from eel_sdk_spark import selector

        sizes = iter([5253, 5150, 5100])  # raw, shuf, gor call order

        class RiggedCodec:
            def compress(self, data, asbytes=True):
                return b"\x00" * next(sizes)

        noise = pa.array(
            np.random.default_rng(5).standard_normal(4096).astype(
                np.float32))  # float32 skips the ALP probe
        with mock.patch.object(selector, "_ZSTD_TRIAL", RiggedCodec()):
            assert selector._choose_float(noise, "speed") == "rawf"


class TestGorilla:
    """XOR codec: the float path for smooth non-decimal series that fall
    through the ALP probe (it used to land on raw/shuf)."""

    def _sensor(self, n=20_000):
        import numpy as np

        # event-time ramp: epoch-seconds with jittered sub-second arrival
        # gaps — continuous full-precision doubles (ALP probe fails), and
        # the value RANGE drifts (shuffled high-byte planes are not
        # constant) while successive bit patterns agree (XOR zeroes them)
        rng = np.random.default_rng(11)
        return 1.7e9 + np.cumsum(rng.uniform(0.05, 0.15, n))

    def test_sensor_roundtrip_and_wins(self):
        import numpy as np
        import pyarrow as pa

        from eel_sdk_spark.codecs import decode_column, encode_column

        vals = self._sensor()
        arr = pa.array(vals)
        h_gor, p_gor, _ = encode_column(arr, codec="gor")
        h_shuf, p_shuf, _ = encode_column(arr, codec="shuf")
        h_raw, p_raw, _ = encode_column(arr, codec="rawf")
        assert decode_column(h_gor, p_gor).equals(arr)  # bit-identical
        assert len(p_gor) < len(p_shuf) < len(p_raw)

    def test_selector_routes_sensor_to_gor(self):
        import numpy as np
        import pyarrow as pa

        from eel_sdk_spark import selector
        from eel_sdk_spark.codecs import alp, encode_column

        vals = self._sensor()
        _, frac = alp.probe(vals[:4096])
        assert frac < 0.5  # genuinely non-decimal
        arr = pa.array(vals)
        assert selector.choose(arr, "float") == "gor"
        _, _, info = encode_column(arr)
        assert info["codec"] == "gor"
        # prices still route to alp, pure noise never to gor
        prices = pa.array(np.round(
            np.random.default_rng(3).uniform(1, 9e4, 20_000), 2))
        assert selector.choose(prices, "float") == "alp"
        noise = pa.array(np.random.default_rng(4).standard_normal(8192))
        assert selector.choose(noise, "float") in ("rawf", "shuf")

    def test_float32_roundtrip(self):
        import numpy as np
        import pyarrow as pa

        from eel_sdk_spark.codecs import decode_column, encode_column

        vals = self._sensor(5000).astype(np.float32)
        arr = pa.array(vals, type=pa.float32())
        h, p, _ = encode_column(arr, codec="gor")
        assert decode_column(h, p).equals(arr)


def test_fsst_profile_ladder_archive_vs_compression():
    """The profile ladder orders honestly: 'archive' (exhaustive merges)
    learns at least as many merges and never produces MORE bytes than
    'compression' (knee-stopped), and both round-trip bit-exactly through
    the full column path."""
    import numpy as np
    import pyarrow as pa

    from eel_sdk_spark.codecs import decode_column, encode_column, fsst

    rng = np.random.default_rng(7)
    words = ["the", "quick", "brown", "compression", "profile", "ladder",
             "webtext", "corpus", "symbol", "table"]
    texts = [" ".join(rng.choice(words, size=30)) + f" #{i}"
             for i in range(2000)]
    arr = pa.array(texts, type=pa.large_string())

    data = " ".join(texts).encode()
    m_arch = fsst.train(data, min_pair_frac=fsst.frac_for_profile("archive"))
    m_comp = fsst.train(data,
                        min_pair_frac=fsst.frac_for_profile("compression"))
    assert len(m_arch) >= len(m_comp) > 0

    sizes = {}
    for profile in ("compression", "archive"):
        header, payload, info = encode_column(arr, profile=profile)
        assert info["codec"] == "fsst"
        sizes[profile] = len(header) + len(payload)
        out = decode_column(header, payload)
        assert out.cast(pa.large_string()).equals(arr)
    assert sizes["archive"] <= sizes["compression"]
