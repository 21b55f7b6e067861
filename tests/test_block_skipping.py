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


def test_banded_sort_by_gives_disjoint_key_ranges(spark):
    """The banded default + value-primary sort_by: within each task the
    key is fully sorted, so banded block key-ranges are DISJOINT per
    task and a point predicate keeps ~1 block per task — stat-based
    lookup pruning without part-aligned files (the lookup story for
    tables that keep the no-exchange layout)."""
    from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
    from eel_sdk_spark.encode import (decode_blocks_df, encode_df,
                                      prune_block_groups)

    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        df = webtext_df(spark, 4000, parts=4)
        blocks = encode_df(df, key="url", n_parts=8,
                           sort_by=["url"]).cache()
        n_tasks = blocks.select("writer_uid").distinct().count()
        total = (blocks.select("part_id", "block_seq", "writer_uid")
                 .distinct().count())
        assert total >= n_tasks * 2  # several blocks per task
        target = df.select("url", "text").collect()[1234]
        kept = prune_block_groups(blocks, "url", lower_s=target["url"],
                                  upper_s=target["url"])
        n_kept = (kept.select("part_id", "block_seq", "writer_uid")
                  .distinct().count())
        assert n_kept <= n_tasks, (n_kept, n_tasks, total)
        row = (decode_blocks_df(kept, SCHEMA_DDL)
               .filter(F.col("url") == target["url"]).first())
        assert row is not None and row["text"] == target["text"]
        blocks.unpersist()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       old_batch)


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order clustering: with the table sorted by the Morton key of
    (user_id, ts-as-micros), block min/max stats prune block groups on
    BOTH columns; a 1-D ts sort prunes only on ts. Round-trip exact."""
    from eel_sdk_spark.encode import (decode_blocks_df, encode_df,
                                      prune_block_groups, zorder_key)

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet") \
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "250")
    try:
        z = encode_df(e, key="event_id", n_parts=2,
                      sort_by=[zorder_key(e, ["user_id", "ts_us"])]).cache()
        t = encode_df(e, key="event_id", n_parts=2,
                      sort_by=["ts_us"]).cache()

        def kept(blocks, col, lo, hi):
            return (prune_block_groups(blocks, col, lower=lo, upper=hi)
                    .select("part_id", "block_seq").distinct().count())

        total = z.select("part_id", "block_seq").distinct().count()
        assert total >= 16
        u_lo, u_hi = 5, 10          # narrow user slice
        bounds = e.agg(F.min("ts_us"), F.max("ts_us")).first()
        t_lo = bounds[0]
        t_hi = bounds[0] + (bounds[1] - bounds[0]) // 8  # narrow time slice

        # both layouts prune the ts dimension...
        assert kept(z, "ts_us", t_lo, t_hi) < total
        assert kept(t, "ts_us", t_lo, t_hi) < total
        # ...but only z-order ALSO prunes the user dimension
        z_user = kept(z, "user_id", u_lo, u_hi)
        t_user = kept(t, "user_id", u_lo, u_hi)
        assert z_user < total * 0.8, (z_user, total)
        assert z_user < t_user, (z_user, t_user)

        # clustering never changes content
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in e.schema.fields)
        assert decode_blocks_df(z, ddl).count() == e.count()
        z.unpersist()
        t.unpersist()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       old_batch)


def test_banded_groups_prune_independently_per_writer(spark):
    """r6 regression: banded tasks all anchor at (part_id=0, block_seq=0)
    and are distinguished ONLY by writer_uid — the pruning semi-join
    must include it, else any task's passing group keeps every task's
    same-seq group and block skipping is silently vacuous on the
    DEFAULT layout."""
    from pyspark.sql import functions as F

    from eel_sdk_spark.encode import encode_df, prune_block_groups

    # key-clustered input (repartitionByRange) -> disjoint per-task id
    # ranges -> stats CAN prune; banded default layout
    df = (spark.range(64_000)
          .repartitionByRange(16, "id")
          .select(F.col("id").alias("k"),
                  F.concat(F.lit("u"), F.col("id")).alias("url")))
    blocks = encode_df(df, key="url", sort_by=["k"]).cache()
    keys = ["part_id", "block_seq", "writer_uid"]
    n_all = blocks.select(*keys).distinct().count()
    assert n_all >= 8
    # groups share (part_id, block_seq) across writers — the bug shape
    assert blocks.select("part_id", "block_seq").distinct().count() < n_all

    kept = (prune_block_groups(blocks, "k", lower=7, upper=7)
            .select(*keys).distinct().count())
    assert kept <= 2, (kept, n_all)  # ~1 task's range covers id=7
    # and the surviving groups still decode the right row
    from eel_sdk_spark.encode import decode_blocks_df
    row = decode_blocks_df(
        prune_block_groups(blocks, "k", lower=7, upper=7),
        "k bigint, url string").filter("k = 7").collect()
    assert len(row) == 1 and row[0]["url"] == "u7"
    blocks.unpersist()
