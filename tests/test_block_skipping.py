"""Projection pushdown + stats-based block skipping on the encoded table.

The reference skips parquet row groups / ORC stripes via predicate stats
(ParquetPredicateTest.scala:13-48, OrcPredicateTest.scala); our blocks
carry min/max in header rows and are skipped with plain JVM filters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
from eel_sdk_spark.encode import decode_blocks_df, encode_df, prune_block_groups

N = 4000


@pytest.fixture(scope="module")
def blocks(spark):
    df = webtext_df(spark, N, parts=4).cache()
    df.count()
    b = encode_df(df, key="url", n_parts=8).cache()
    b.count()
    yield df, b
    b.unpersist()
    df.unpersist()


def test_block_stats_present(spark, blocks):
    _, b = blocks
    ts = b.filter(F.col("col") == "warc_ts")
    assert ts.filter(F.col("min_i").isNull()).count() == 0
    row = ts.select(F.min("min_i"), F.max("max_i")).first()
    assert row[0] < row[1]
    url = b.filter(F.col("col") == "url").first()
    assert url["min_s"] is not None and url["min_s"].startswith("https://")


def test_projection_pushdown(spark, blocks):
    df, b = blocks
    dec = decode_blocks_df(b, SCHEMA_DDL, columns=["url", "lang"])
    assert dec.columns == ["url", "lang"]
    assert dec.count() == N
    # values survive projection
    j = dec.alias("d").join(df.alias("o"), "url")
    assert j.filter(~F.col("d.lang").eqNullSafe(F.col("o.lang"))).count() == 0


def test_stats_skipping_correct_and_effective(spark, blocks):
    df, b = blocks
    # predicate: warc_ts in the first crawl window only
    cut = df.agg(F.min(F.unix_timestamp("warc_ts"))).first()[0] + 3 * 86400
    cut_us = cut * 1_000_000
    pruned = prune_block_groups(b, "warc_ts", upper=cut_us)
    n_groups_all = b.select("part_id", "block_seq").distinct().count()
    n_groups_kept = pruned.select("part_id", "block_seq").distinct().count()
    # decode pruned + residual filter == full filter on original
    dec = decode_blocks_df(pruned, SCHEMA_DDL) \
        .filter(F.unix_timestamp("warc_ts") * 1_000_000 <= cut_us)
    expected = df.filter(F.unix_timestamp("warc_ts") * 1_000_000 <= cut_us)
    assert dec.count() == expected.count()
    assert n_groups_kept <= n_groups_all  # never grows
    # conservative: every url of the expected result present
    missing = expected.select("url").exceptAll(dec.select("url")).count()
    assert missing == 0


def test_skipping_impossible_range_drops_everything(spark, blocks):
    _, b = blocks
    pruned = prune_block_groups(b, "warc_ts", upper=0)  # before every ts
    assert pruned.count() == 0
