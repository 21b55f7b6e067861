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
