"""Sequence packing: fill fixed-length training sequences with documents.

Trainers consume fixed ``max_len``-token sequences; feeding one short doc
per sequence wastes the tail, so pipelines PACK documents until the
budget is full (sample packing). The exact global optimum is bin packing
(NP-hard) and irrelevant at corpus scale — the standard practice this
implements is greedy next-fit per Spark partition, which is embarrassingly
parallel, deterministic for a fixed partitioning, and within a few
percent of optimal on heavy-tailed web docs.

Scale shape: only (id, n_tokens) metadata flows through the operator —
the document text never moves; packs reference ids. Per partition the
next-fit boundaries are found with ``np.searchsorted`` over the running
token cumsum — O(n_packs · log n) numpy, not a per-row Python loop.
Over-long docs (n_tokens > max_len) land alone in their own pack
(truncation policy belongs to the trainer, not the packer).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_DDL = ("pack_id string, doc_ids array<bigint>, n_docs int, "
            "total_tokens bigint, fill_ratio double")


def pack_sequences(df: DataFrame, id_col: str, len_col: str,
                   max_len: int = 2048) -> DataFrame:
    """One row per pack: ids, doc count, token total, fill ratio.

    Pack ids are ``<spark_partition>-<seq>``: unique across the corpus
    without any global coordination."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        carry_ids: list = []
        carry_tok = 0

        def flush(ids_, tok):
            nonlocal seq
            row = (f"{pid}-{seq}", list(ids_), len(ids_), int(tok),
                   round(tok / max_len, 4))
            seq += 1
            return row

        rows = []
        for batch in batches:
            ids = np.asarray(batch.column(id_col).cast(pa.int64()))
            lens = np.asarray(batch.column(len_col).cast(pa.int64()))
            cum = np.cumsum(lens)
            i = 0
            n = len(ids)
            while i < n:
                base = cum[i - 1] if i else 0
                budget = max_len - carry_tok
                # last j with cum[j-1] - base <= budget
                j = int(np.searchsorted(cum, base + budget, side="right"))
                if j <= i:
                    if carry_ids:  # nothing fits the open pack: close it
                        rows.append(flush(carry_ids, carry_tok))
                        carry_ids, carry_tok = [], 0
                        continue
                    j = i + 1  # oversized doc: alone in its own pack
                carry_ids.extend(ids[i:j].tolist())
                carry_tok += int(cum[j - 1] - base)
                i = j
                if carry_tok >= max_len:
                    rows.append(flush(carry_ids, carry_tok))
                    carry_ids, carry_tok = [], 0
        if carry_ids:
            rows.append(flush(carry_ids, carry_tok))
        if rows:
            yield pa.record_batch(
                [pa.array([r[0] for r in rows], type=pa.string()),
                 pa.array([r[1] for r in rows],
                          type=pa.list_(pa.int64())),
                 pa.array([r[2] for r in rows], type=pa.int32()),
                 pa.array([r[3] for r in rows], type=pa.int64()),
                 pa.array([r[4] for r in rows], type=pa.float64())],
                names=["pack_id", "doc_ids", "n_docs", "total_tokens",
                       "fill_ratio"])

    return df.select(id_col, len_col).mapInArrow(run, PACK_DDL)


def materialize_packs(packs: DataFrame, docs: DataFrame,
                      id_col: str, text_col: str,
                      sep: str = "<|endofdoc|>") -> DataFrame:
    """Gather stage: turn pack manifests into actual training sequences.
    The document text shuffles exactly ONCE (on id, to meet its pack
    assignment) — the unavoidable data motion of packing — then one
    groupBy(pack_id) assembles the sequence with pack-local order
    preserved (posexplode position rides the shuffle; array_sort on the
    (pos, text) structs restores it before the join)."""
    assign = packs.select(
        "pack_id", F.posexplode("doc_ids").alias("pos", id_col))
    joined = assign.join(docs.select(id_col, text_col), id_col)
    seq = (joined.groupBy("pack_id")
           .agg(F.array_sort(F.collect_list(
               F.struct(F.col("pos"), F.col(text_col).alias("t"))))
               .alias("parts")))
    return seq.select(
        "pack_id",
        F.array_join(F.transform("parts", lambda s: s["t"]), sep)
        .alias("sequence"))


def packing_stats(packs: DataFrame, max_len: int = 2048) -> DataFrame:
    """Pipeline health: pack count, mean fill, token waste fraction."""
    return packs.agg(
        F.count("*").alias("n_packs"),
        F.round(F.avg("fill_ratio"), 4).alias("mean_fill"),
        F.round(1 - F.sum("total_tokens")
                / (F.count("*") * F.lit(max_len)), 4).alias("waste"))
