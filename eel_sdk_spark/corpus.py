"""Deterministic synthetic Common-Crawl-style webtext corpus.

Generates the north-rule input table ``(url string, warc_ts timestamp,
html binary, text string, lang string)`` (BASELINE.json input_hint) purely
from the row id via a splitmix64 mixer — no RNG state, so generation is
order- and partition-independent: the same id yields the same row whether
generated on 1 or 1000 executors. Distributed generation is one
``spark.range(n).mapInArrow(...)`` — embarrassingly parallel, zero shuffle.

Corpus shape mirrors FIXTURES.md §1:
- zipf-skewed domains (hot-domain skew exercises salting),
- warc_ts clustered into crawl windows (frame-of-reference-friendly),
- lang from a small skewed alphabet (dict/RLE-friendly),
- text assembled from a shared sentence vocabulary (FSST/dict-friendly),
- html with boilerplate tags, non-ASCII and embedded NULs,
- ~1% nulls in lang / text for adversarial coverage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

SEED = 42
N_DOMAINS = 10_000
ZIPF_S = 1.2
LANGS = np.array(["en", "zh", "de", "fr", "es", "ru", "ja", "pt", "it", "nl"],
                 dtype=object)
LANG_CUM = np.cumsum([0.62, 0.10, 0.06, 0.05, 0.05, 0.04, 0.03, 0.02, 0.02, 0.01])
# four crawl windows, one week apart, 2024-01 epoch (microseconds)
CRAWL_BASE_US = np.int64(1_704_067_200_000_000)
WEEK_US = np.int64(7 * 86400 * 1_000_000)

_VOCAB = None


def _vocab() -> np.ndarray:
    """128 deterministic sentences sharing many n-grams (compressible text)."""
    global _VOCAB
    if _VOCAB is None:
        subjects = ["the crawler", "a web page", "the archive", "this document",
                    "the parser", "an index", "the dataset", "a record"]
        verbs = ["fetches", "stores", "compresses", "extracts", "deduplicates",
                 "tokenizes", "renders", "links"]
        objects = ["the raw html content", "unicode text with accents éàü",
                   "timestamps from the warc header", "zipf distributed domains",
                   "dictionary encoded languages", "run length encoded flags",
                   "frame of reference packed integers", "symbol table entries"]
        out = []
        for i in range(128):
            s = subjects[i % 8]
            v = verbs[(i // 8) % 8]
            o = objects[(i // 64 + i) % 8]
            out.append(f"{s} {v} {o} at step {i}. ")
        _VOCAB = np.array(out, dtype=object)
    return _VOCAB


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer, vectorized; x: uint64 ids."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _uniform(ids: np.ndarray, salt: int) -> np.ndarray:
    return _mix(ids, salt).astype(np.float64) / 2.0**64


def gen_batch(ids: np.ndarray) -> pa.RecordBatch:
    """ids: int64 row ids -> one RecordBatch of the webtext schema."""
    ids_u = ids.astype(np.uint64)
    n = ids.size

    # domains: bounded-pareto inverse CDF (zipf-ish skew; rank 1 is hottest)
    u = _uniform(ids_u, 1)
    h = 1.0 - N_DOMAINS ** (1.0 - ZIPF_S)
    rank = np.floor((1.0 - u * h) ** (1.0 / (1.0 - ZIPF_S))).astype(np.int64)
    rank = np.clip(rank, 1, N_DOMAINS)

    # url: unique per id
    url = ("https://d" + rank.astype(str).astype(object) + ".example.com/p/"
           + ids.astype(str).astype(object))

    # warc_ts: crawl window + in-window jitter up to 2 days (sorted-ish per window)
    window = (_mix(ids_u, 2) % np.uint64(4)).astype(np.int64)
    jitter = (_mix(ids_u, 3) % np.uint64(2 * 86400 * 1_000_000)).astype(np.int64)
    warc_ts = CRAWL_BASE_US + window * WEEK_US + jitter

    # lang: skewed small alphabet, ~1% null
    lu = _uniform(ids_u, 4)
    lang_idx = np.searchsorted(LANG_CUM, lu, side="right").clip(0, len(LANGS) - 1)
    lang = LANGS[lang_idx].copy()
    lang_null = _uniform(ids_u, 5) < 0.01
    lang[lang_null] = None

    # text: 3..20 vocab sentences keyed off the id, ~0.5% null
    vocab = _vocab()
    k = (3 + (_mix(ids_u, 6) % np.uint64(18))).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(k)])[:-1]
    total = int(k.sum())
    # within-row sentence position (0..k_i-1): batch-boundary independent
    flat_pos = np.arange(total, dtype=np.int64) - np.repeat(starts, k)
    row_of = np.repeat(ids_u, k)
    with np.errstate(over="ignore"):
        seed = row_of * np.uint64(1_000_003) + flat_pos.astype(np.uint64)
    sent_idx = (_mix(seed, 7) % np.uint64(128)).astype(np.int64)
    pieces = vocab[sent_idx]
    text = np.add.reduceat(pieces, starts) if total else np.array([], dtype=object)
    text = text.astype(object)
    text_null = _uniform(ids_u, 8) < 0.005
    text[text_null] = None

    # html: boilerplate + text + occasional embedded NUL, non-ASCII title
    nul = np.where((_mix(ids_u, 9) % np.uint64(17)) == 0, "\x00", "").astype(object)
    body = np.where(text_null, "", text).astype(object)
    html_str = ("<html><head><title>página δοκιμή №" + rank.astype(str).astype(object)
                + "</title></head><body>" + body + nul + "</body></html>")
    # string -> binary cast is a zero-copy buffer reinterpret (utf-8 bytes)
    html = pa.array(html_str, type=pa.string()).cast(pa.binary())

    return pa.record_batch(
        [
            pa.array(url, type=pa.string()),
            pa.array(warc_ts, type=pa.int64()).cast(pa.timestamp("us", tz="UTC")),
            html,
            pa.array(text, type=pa.string()),
            pa.array(lang, type=pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


SCHEMA_DDL = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")


def webtext_df(spark, n_rows: int, parts: int | None = None):
    """Distributed deterministic corpus as a Spark DataFrame."""
    parts = parts or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            yield gen_batch(np.asarray(b.column(0)))

    return spark.range(0, n_rows, numPartitions=parts).mapInArrow(gen, SCHEMA_DDL)


def webtext_table(n_rows: int, seed_offset: int = 0) -> pa.Table:
    """Local (driver-side) corpus for Spark-free tests."""
    return pa.Table.from_batches(
        [gen_batch(np.arange(seed_offset, seed_offset + n_rows, dtype=np.int64))])


# -- the reference's speed-test row shape ----------------------------------

EELROWS_DDL = "b boolean, f float, d double, l bigint, s string"


def gen_eelrows_batch(ids: np.ndarray) -> pa.RecordBatch:
    """The row shape of the reference's published numbers: 5 columns
    (bool, float, gaussian double, long, 4-char string) —
    eel-core/src/test/scala/io/eels/component/parquet/ParquetSpeedTest.scala:46-48.
    Deterministic from the row id so throughput comparisons are stable."""
    ids_u = ids.astype(np.uint64)
    b = (_mix(ids_u, 11) & np.uint64(1)).astype(bool)
    f = (_uniform(ids_u, 12) * 1000).astype(np.float32)
    # Box-Muller for the gaussian double, fully vectorized
    u1 = np.clip(_uniform(ids_u, 13), 1e-12, 1.0)
    u2 = _uniform(ids_u, 14)
    d = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    l = _mix(ids_u, 15).view(np.int64)  # noqa: E741
    chars = np.array(list("abcdefghijklmnopqrstuvwxyz"), dtype="U1")
    sidx = np.stack([( _mix(ids_u, 16 + k) % np.uint64(26)).astype(np.int64)
                     for k in range(4)], axis=1)
    s = chars[sidx[:, 0]]
    for k in range(1, 4):
        s = np.char.add(s, chars[sidx[:, k]])
    return pa.record_batch(
        [pa.array(b), pa.array(f, type=pa.float32()), pa.array(d),
         pa.array(l, type=pa.int64()), pa.array(s.astype(object))],
        names=["b", "f", "d", "l", "s"])


def eelrows_df(spark, n_rows: int, parts: int | None = None):
    parts = parts or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield gen_eelrows_batch(np.asarray(batch.column(0)))

    return spark.range(0, n_rows, numPartitions=parts).mapInArrow(
        gen, EELROWS_DDL)
