"""Predicate IR: Column compilation + stats-based block skipping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
from eel_sdk_spark.encode import encode_df
from eel_sdk_spark.predicate import (
    And,
    Equals,
    Gt,
    Gte,
    Lt,
    Lte,
    Not,
    NotEquals,
    Or,
    decode_with_predicate,
)


def test_to_column_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "c")], "x int, s string")
    assert df.filter(Equals("s", "a").to_column()).count() == 2
    assert df.filter(NotEquals("s", "a").to_column()).count() == 2
    assert df.filter(Lt("x", 3).to_column()).count() == 2
    assert df.filter(Lte("x", 3).to_column()).count() == 3
    assert df.filter(Gt("x", 3).to_column()).count() == 1
    assert df.filter(Gte("x", 3).to_column()).count() == 2
    assert df.filter((Gt("x", 1) & Lt("x", 4)).to_column()).count() == 2
    assert df.filter((Equals("x", 1) | Equals("x", 4)).to_column()).count() == 2
    assert df.filter((~Equals("s", "a")).to_column()).count() == 2


def test_block_ranges():
    p = And(Gte("ts", 100), Lt("ts", 200)) & Equals("k", 5)
    r = p.to_block_ranges()
    assert r["ts"] == (100, 200)
    assert r["k"] == (5, 5)
    # OR contributes nothing (conservative)
    assert Or(Gt("a", 1), Lt("b", 2)).to_block_ranges() == {}
    assert Not(Gt("a", 1)).to_block_ranges() == {}


def test_decode_with_predicate_matches_plain_filter(spark):
    df = webtext_df(spark, 3000, parts=4).cache()
    df.count()
    # encode with an int-friendly derived column for direct stat bounds
    with_us = df.withColumn("ts_us",
                            (F.unix_timestamp("warc_ts") * 1_000_000
                             + F.date_format("warc_ts", "SSSSSS").cast("long")))
    ddl = SCHEMA_DDL + ", ts_us bigint"
    blocks = encode_df(with_us, key="url", n_parts=8).cache()
    cut = with_us.agg(F.expr("percentile(ts_us, 0.3)")).first()[0]
    pred = Lte("ts_us", int(cut))
    out = decode_with_predicate(blocks, ddl, pred, int_cols={"ts_us"})
    expected = with_us.filter(F.col("ts_us") <= int(cut))
    assert out.count() == expected.count()
    assert out.select("url").exceptAll(expected.select("url")).count() == 0
    blocks.unpersist()
    df.unpersist()


def test_equality_predicate_consults_column_blooms(spark):
    """r6: encode_df(bloom_cols=[...]) records blooms for NON-key
    columns, and decode_with_predicate's equality path uses them —
    block groups whose bloom excludes the value are dropped even though
    min/max stats (hash-scattered values) cannot prune, and results
    stay exact."""
    from pyspark.sql import functions as F

    from eel_sdk_spark.encode import encode_df
    from eel_sdk_spark.predicate import Equals, decode_with_predicate

    # 'tag' is hash-scattered (min/max vacuous per block) but unique
    # per row — bloom skipping is the only lever
    df = spark.range(40_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.concat(F.lit("tag-"), F.md5(F.col("id").cast("string")))
        .alias("tag"),
        F.col("id").alias("v"))
    blocks = encode_df(df, key="url", n_parts=16,
                       bloom_cols=["tag"]).cache()
    assert blocks.filter((F.col("col") == "tag")
                         & F.col("key_bloom").isNotNull()).count() > 0

    target = df.filter("v = 12345").first()["tag"]
    n_groups = blocks.select("part_id", "block_seq", "writer_uid").distinct().count()
    pred = Equals("tag", target)
    out = decode_with_predicate(blocks, "url string, tag string, v bigint",
                                pred, int_cols=set())
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["v"] == 12345

    # the bloom actually pruned: decode a probe of the pruned frame
    from eel_sdk_spark.encode import prune_block_groups_bloom
    kept_groups = (prune_block_groups_bloom(blocks, "tag", target)
                   .select("part_id", "block_seq", "writer_uid")
                   .distinct().count())
    assert kept_groups < n_groups / 4, (kept_groups, n_groups)
    blocks.unpersist()
