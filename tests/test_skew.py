"""Hot-domain skew: salted partitioning levels the zipf head.

The corpus has zipf-skewed domains (FIXTURES.md §1); partitioning the
encode by domain without salting recreates the reference's
writer-per-partition hotspot (HiveSinkWriter.scala:138-148). ``salt_by``
spreads hot domains; ``recommend_salt`` derives the factor from data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.corpus import webtext_df
from eel_sdk_spark.encode import (
    PART_COL,
    encode_df,
    recommend_salt,
    with_part_id,
)

N = 20_000
PARTS = 16


@pytest.fixture(scope="module")
def docs(spark):
    df = (webtext_df(spark, N, parts=4)
          .withColumn("domain", F.split(F.col("url"), "/")[2])).cache()
    df.count()
    yield df
    df.unpersist()


def _part_sizes(df):
    return [r["c"] for r in
            df.groupBy(PART_COL).agg(F.count("*").alias("c")).collect()]


def test_unsalted_domain_partitioning_is_skewed(spark, docs):
    sizes = _part_sizes(with_part_id(docs, "domain", PARTS))
    mean = N / PARTS
    assert max(sizes) > mean * 2  # zipf head lands in one partition


def test_salting_levels_hot_domains(spark, docs):
    salt = recommend_salt(docs, "domain", PARTS)
    assert salt > 1
    salted = _part_sizes(with_part_id(docs, "domain", PARTS,
                                      salt=salt, salt_by="url"))
    unsalted = _part_sizes(with_part_id(docs, "domain", PARTS))
    assert max(salted) < max(unsalted)
    assert max(salted) < (N / PARTS) * 2


def test_recommend_salt_uniform_key_is_one(spark, docs):
    assert recommend_salt(docs, "url", PARTS) == 1


def test_salted_encode_roundtrips(spark, docs):
    """Salting must not affect correctness — only placement."""
    from eel_sdk_spark.encode import decode_blocks_df

    ddl = ("url string, warc_ts timestamp, html binary, text string, "
           "lang string, domain string")
    blocks = encode_df(docs, key="domain", n_parts=PARTS, salt=8,
                       salt_by="url")
    decoded = decode_blocks_df(blocks, ddl)
    assert decoded.count() == N
    bad = (decoded.alias("d").join(docs.alias("o"), "url")
           .filter(~F.col("d.text").eqNullSafe(F.col("o.text"))).count())
    assert bad == 0
