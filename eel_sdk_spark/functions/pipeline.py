"""The training-data cleanup pipeline: what a 10^12-doc corpus actually
runs before a token ever reaches a model — composed entirely from this
package's oracle-checked building blocks, so the WHOLE pipeline stays
DuckDB-replayable for the correctness gate.

Stages (each optional, all one lazy plan — Catalyst fuses the filters):
0. line dedup           — within-doc repeated-line removal (boilerplate:
                          nav bars / cookie banners, text.dedup_lines)
1. exact dedup          — md5-fingerprint groupBy, keep min-id (dedup.py)
2. near-dup removal     — MinHash/LSH candidates + exact Jaccard verify;
                          of each verified pair (a < b) the larger id is
                          dropped. Pair-wise removal, not connected
                          components: one shuffle instead of an iterative
                          algorithm, and for web near-dup clusters (dense:
                          every member collides with the min under LSH)
                          it keeps exactly the min-id representative.
3. quality filter       — text.quality_score threshold (text.py)
4. decontamination      — drop docs sharing a 13-gram with a benchmark
                          table (dedup.contaminated_ids)
5. split assignment     — deterministic md5-routed train/val/test
                          (text.hash_split): stable across runs, cluster
                          sizes, and row order.

Scale shape: nothing here shuffles document text except the n-gram
explode inside MinHash (inherent); every filter is a broadcast-able
left_anti on 8-byte ids or a Column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from . import text as T


def clean_corpus(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 exact: bool = True,
                 near_dup_threshold: float | None = 0.5,
                 cluster_exact: bool = False,
                 n_hashes: int = 4, band_size: int = 2,
                 min_quality: float | None = 0.3,
                 splits: list[int] | None = None,
                 split_labels: list[str] | None = None,
                 dedup_lines: bool = False,
                 benchmark: DataFrame | None = None,
                 bench_text_col: str = "text",
                 decontam_ngram: int = 13) -> DataFrame:
    """Returns the cleaned corpus with an added ``split`` column.

    ``near_dup_threshold=None`` / ``min_quality=None`` / ``splits=None``
    skip the respective stage; ``dedup_lines=True`` rewrites each doc's
    repeated lines away BEFORE dedup/quality (so boilerplate doesn't mask
    near-dups); ``benchmark`` enables 13-gram decontamination."""
    out = df
    if dedup_lines:
        out = out.withColumn(text_col, T.dedup_lines(F.col(text_col)))
    if exact:
        out = dedup.exact_dedup(out, text_col, id_col)
    if near_dup_threshold is not None:
        pairs = dedup.jaccard_pairs(out, text_col, id_col,
                                    threshold=near_dup_threshold,
                                    n_hashes=n_hashes, band_size=band_size)
        if cluster_exact:
            # exact keep-one-per-cluster: connected components over the
            # verified pairs (handles chained duplicates; O(diameter)
            # label-propagation rounds)
            comps = dedup.connected_components(pairs.select("a", "b"))
            losers = (comps.filter(F.col("id") != F.col("component"))
                      .select(F.col("id").alias(id_col)))
        else:
            losers = pairs.select(F.col("b").alias(id_col)).distinct()
        out = out.join(losers, id_col, "left_anti")
    if min_quality is not None:
        # quality_score is 4dp-rounded; the text_metrics oracle proves both
        # engines agree on it bit-for-bit, so the threshold is deterministic
        out = out.filter(T.quality_score(F.col(text_col)) >= min_quality)
    if benchmark is not None:
        bad = dedup.contaminated_ids(out, text_col, id_col,
                                     benchmark, bench_text_col,
                                     n=decontam_ngram)
        out = out.join(bad, id_col, "left_anti")
    if splits is not None:
        out = out.withColumn(
            "split", T.hash_split(F.col(id_col).cast("string"),
                                  splits, split_labels))
    return out
