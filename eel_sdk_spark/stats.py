"""Per-chunk value-distribution sampler feeding the codec selector.

Computes, with whole-array numpy/Arrow ops only: cardinality (exact on a
bounded sample), run structure, value/delta ranges, and byte-symbol
compressibility probes for text. This is the engine's analogue of the
stats the reference reads from parquet footers / ORC stripe stats
(eel-core/.../parquet/ParquetSource.scala:58-75, eel-orc/.../OrcSource.scala:47-50)
— but computed *before* encoding to drive codec choice, in the spirit of
ORC's SPEED/COMPRESSION EncodingStrategy (eel-orc/.../OrcSink.scala:15-33).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs.base import bytes_view, int_view, kind_of

SAMPLE_ROWS = 4096


def chunk_stats(values: pa.Array, kind: str | None = None) -> dict:
    """Stats for a non-null Arrow array. Bounded cost: samples large chunks."""
    kind = kind or kind_of(values.type)
    n = len(values)
    st: dict = {"n": n, "kind": kind}
    if n == 0:
        return st
    sample = values if n <= SAMPLE_ROWS else values.slice(0, SAMPLE_ROWS)

    if kind == "int":
        iv = int_view(values)
        st["min"] = int(iv.min())
        st["max"] = int(iv.max())
        # wraparound-safe range in uint64 space
        st["range"] = (st["max"] - st["min"]) & 0xFFFFFFFFFFFFFFFF
        d = iv[1:].astype(np.uint64) - iv[:-1].astype(np.uint64)
        if d.size:
            ds = d.astype(np.int64)
            st["delta_range"] = (int(ds.max()) - int(ds.min())) & 0xFFFFFFFFFFFFFFFF
        runs = int(np.count_nonzero(iv[1:] != iv[:-1])) + 1
        st["n_runs"] = runs
        sv = int_view(sample)
        st["card_sample"] = int(np.unique(sv).size)
        st["sample_n"] = len(sample)
    elif kind == "float":
        st["card_sample"] = int(pc.count_distinct(sample).as_py())
        st["sample_n"] = len(sample)
    elif kind == "bytes":
        lengths, data = bytes_view(sample)
        st["sample_n"] = len(sample)
        st["card_sample"] = int(pc.count_distinct(sample).as_py())
        st["avg_len"] = float(lengths.mean()) if lengths.size else 0.0
        st["sample_bytes"] = len(data)
        # distinct-bytes estimate for dict sizing: sum of lengths of uniques
        if st["card_sample"] < st["sample_n"]:
            uniq = pc.unique(sample)
            ul, _ = bytes_view(uniq)
            st["uniq_bytes_sample"] = int(ul.sum()) if ul.size else 0
        else:
            st["uniq_bytes_sample"] = len(data)
        # symbol skew probe: top-16 byte frequency share (FSST-friendliness)
        if len(data):
            counts = np.bincount(np.frombuffer(data[: 1 << 16], dtype=np.uint8),
                                 minlength=256)
            top = np.sort(counts)[-16:]
            st["byte_skew"] = float(top.sum() / max(counts.sum(), 1))
        runs = int(np.count_nonzero(
            np.asarray(pc.equal(sample.slice(1), sample.slice(0, len(sample) - 1))
                       ).astype(bool) == False)) + 1 if len(sample) > 1 else 1  # noqa: E712
        st["n_runs_sample"] = runs
    return st
