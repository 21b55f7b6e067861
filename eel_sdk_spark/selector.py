"""Codec auto-selection: the engine's only "planner".

Per (partition, column, batch) the selector computes bounded-cost stats
(:mod:`eel_sdk_spark.stats`) and picks the codec minimizing *estimated
encoded bytes* — dictionary, RLE, FSST, bit-packed FOR/delta, or the
plain/raw fallbacks — mirroring in user-space what the reference delegates
to parquet writer knobs (dictionary toggle RowParquetWriterFn.scala:44,
ORC SPEED/COMPRESSION strategy OrcSink.scala:15-33). Estimated sizes use
the kernels' own cost hooks so the model and the encoders cannot drift
apart structurally.

The decision is recorded per block (CODEC column in the blocks table) so
decisions are auditable in the encode_metrics output.
"""

from __future__ import annotations

import pyarrow as pa

from . import stats as stats_mod
from .codecs import dictionary, for_, rle
from .codecs.bitpack import bit_width

# Below this distinct-fraction a dictionary is considered for strings.
DICT_CARD_FRACTION = 0.5
# FSST only pays off for text with skewed symbol distributions.
FSST_MIN_BYTES = 1 << 14


def choose(values: pa.Array, kind: str, st: dict | None = None,
           profile: str = "speed") -> str:
    """Pick a codec name for a non-null Arrow array of the given kind.

    ``profile='speed'`` targets throughput (text -> raw + zstd cascade:
    measured ~500 MB/s/core at ~10x on webtext); ``'compression'``
    minimizes bytes (text -> FSST symbol tables: ~2.4x smaller again at
    ~2.5 MB/s/core, embarrassingly parallel across executors)."""
    st = st or stats_mod.chunk_stats(values, kind)
    n = st.get("n", 0)
    if n == 0:
        return "plain" if kind == "other" else _empty_default(kind)
    if kind == "int":
        return _choose_int(st)
    if kind == "float":
        return _choose_float(values, profile)
    if kind == "bytes":
        return _choose_bytes(st, profile)
    return "plain"


def _empty_default(kind: str) -> str:
    return {"int": "for", "float": "rawf", "bytes": "raw"}.get(kind, "plain")


def _choose_int(st: dict) -> str:
    n = st["n"]
    est_for = for_.estimate_bytes(n, st["range"], st.get("delta_range"))
    n_runs = st["n_runs"]
    est_rle = rle.estimate_bytes(n_runs, st["range"], n)
    # dict pays off when few distinct values but a wide range
    card = st.get("card_sample", n)
    sample_n = st.get("sample_n", n)
    est_dict = float("inf")
    if card < sample_n * 0.5:
        card_full = _scale_card(card, sample_n, n)
        est_dict = (n * bit_width(max(card_full - 1, 0)) + 7) // 8 + card_full * 8 + 96
    best = min(est_for, est_rle, est_dict)
    if best == est_rle and n_runs < n // 4:
        return "rle"
    if best == est_dict:
        return "dict"
    return "for"


def _choose_float(values: pa.Array, profile: str) -> str:
    """Measured, not modeled: (1) if a sample round-trips as scaled
    decimals bit-exactly, ALP-style scale-to-int + FOR wins by an order of
    magnitude (prices, ratings, quantized sensor readings); (2) otherwise
    trial-encode raw vs byte-shuffled vs Gorilla-XOR under the zstd
    cascade and keep the measured smallest (ties break toward the cheaper
    decode: raw < shuf < gor). Gorilla wins on genuinely continuous,
    slowly-varying series — timestamps-as-seconds, temperatures — where
    no decimal exponent round-trips but successive bit patterns agree."""
    import numpy as np

    n = len(values)
    sample = np.asarray(values.slice(0, min(n, 4096)))
    if sample.nbytes < 4096:
        return "rawf"
    if sample.dtype == np.float64:
        from .codecs import alp

        _, frac = alp.probe(sample)
        if frac >= 0.98:
            return "alp"
    from .codecs import gorilla

    raw = _ZSTD_TRIAL.compress(sample.tobytes(), asbytes=True)
    planes = np.ascontiguousarray(
        sample.view(np.uint8).reshape(-1, sample.dtype.itemsize).T).tobytes()
    shuf = _ZSTD_TRIAL.compress(planes, asbytes=True)
    gor = _ZSTD_TRIAL.compress(gorilla.estimate_payload(sample), asbytes=True)
    # evaluate cheap-decode-first (raw < shuf < gor) and take the FIRST
    # candidate at the minimum penalized size, so an exact tie selects the
    # cheapest decode instead of the most expensive one; integer penalized
    # sizes avoid the fragile float-equality compare
    candidates = [("rawf", len(raw) * 100),
                  ("shuf", len(shuf) * 102),
                  ("gor", len(gor) * 103)]
    best = min(size for _, size in candidates)
    for name, size in candidates:
        if size == best:
            return name
    return "rawf"  # unreachable


_ZSTD_TRIAL = pa.Codec("zstd", compression_level=1)


def _choose_bytes(st: dict, profile: str = "speed") -> str:
    n = st["n"]
    card = st.get("card_sample", n)
    sample_n = st.get("sample_n", n)
    avg_len = st.get("avg_len", 0.0)
    if sample_n and card < sample_n * DICT_CARD_FRACTION:
        # low cardinality: dict; runs of identical values make it stronger
        return "dict"
    if profile in ("compression", "archive"):
        total_bytes_est = avg_len * n
        if (total_bytes_est >= FSST_MIN_BYTES
                and st.get("byte_skew", 0.0) > 0.75):
            # skewed symbol distribution (natural-language text): FSST
            # symbol table + zstd cascade beats raw+zstd ~2.4x on webtext
            return "fsst"
    return "raw"


def _scale_card(card_sample: int, sample_n: int, n: int) -> int:
    """Crude cardinality scale-up: linear until half the sample is distinct."""
    if sample_n == 0:
        return 0
    frac = card_sample / sample_n
    if frac >= 0.5:
        return max(int(frac * n), card_sample)
    return card_sample if sample_n == n else min(int(card_sample * 1.5) + 16, n)
