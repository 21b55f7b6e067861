"""JDBC surface end-to-end against embedded Derby (shipped in Spark's own
jars for the hive metastore — no network, one JVM, which is exactly
local-mode Spark).

Covers the reference's JdbcSink (JdbcSink.scala:28-50), JdbcSource
(JdbcSource.scala:17-55), Range/Bucket partition strategies
(RangePartitionStrategy.scala, BucketPartitionStrategy.scala:9-26) and
JdbcStoredProcSource (JdbcStoredProcSource.scala:15-79) as real reads and
writes, not API-construction checks.
"""

from __future__ import annotations

import pytest

from eel_sdk_spark.sources.readers import JdbcSource, JdbcStoredProcSource
from eel_sdk_spark.sources.writers import JdbcSink

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    # pid+uuid in the db path: pytest's numbered basetemp dirs can RACE
    # across two concurrent pytest processes (both compute the same
    # pytest-of-<user>/pytest-N), and two embedded Derby engines then
    # fight over one database lock — the r7 'Derby flake'. A path unique
    # per process can never collide.
    import os as _os
    import uuid as _uuid

    db = (tmp_path_factory.mktemp("derby")
          / f"db-{_os.getpid()}-{_uuid.uuid4().hex[:8]}")
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def people(spark, derby_url):
    df = spark.createDataFrame(
        [(i, f"name{i}", i % 3) for i in range(30)],
        "id int, name string, grp int")
    JdbcSink(derby_url, "people", properties=DRIVER,
             mode="overwrite").write(df)
    return df


def test_jdbc_roundtrip(spark, derby_url, people):
    out = JdbcSource(derby_url, "people", properties=DRIVER).load(spark)
    assert out.count() == 30
    assert sorted(out.columns) == ["grp", "id", "name"]
    assert out.filter("id = 7").first()["name"] == "name7"


def test_jdbc_range_partitioning(spark, derby_url, people):
    src = (JdbcSource(derby_url, "people", properties=DRIVER)
           .with_range_partitioning("id", 0, 30, 4))
    out = src.load(spark)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 30


def test_jdbc_bucket_partitioning(spark, derby_url, people):
    """One publisher per bucket value (BucketPartitionStrategy.scala:9-26)."""
    src = (JdbcSource(derby_url, "people", properties=DRIVER)
           .with_bucket_partitioning("grp", [0, 1, 2]))
    out = src.load(spark)
    assert out.rdd.getNumPartitions() == 3
    assert out.count() == 30


def test_jdbc_stored_proc_query(spark, derby_url, people):
    """Parameterized db-side execution, reference's setObject binding."""
    src = JdbcStoredProcSource(
        derby_url,
        'SELECT "grp", count(*) AS n FROM people WHERE "id" >= ? '
        'GROUP BY "grp"',
        params=(10,), properties=DRIVER)
    out = src.load(spark)
    got = {r["grp"]: r["N"] for r in out.collect()}
    assert sum(got.values()) == 20


def test_stored_proc_binding_tokenizer():
    """'?' inside string literals / quoted identifiers / comments must not
    be consumed as placeholders; bools bind as TRUE/FALSE (not 'True' —
    bool is an int subclass); arity mismatches raise instead of silently
    binding the wrong position."""
    bq = lambda q, p: JdbcStoredProcSource("u", q, params=p)._bound_query()  # noqa: E731

    assert bq("SELECT * FROM t WHERE u = '?' AND id = ?", (7,)) == \
        "SELECT * FROM t WHERE u = '?' AND id = 7"
    assert bq('SELECT "a?b" FROM t WHERE x = ?', ("it's",)) == \
        'SELECT "a?b" FROM t WHERE x = \'it\'\'s\''
    assert bq("SELECT 1 -- why?\n FROM t WHERE b = ?", (True,)) == \
        "SELECT 1 -- why?\n FROM t WHERE b = TRUE"
    assert bq("SELECT /* eh? */ ? FROM t", (False,)) == \
        "SELECT /* eh? */ FALSE FROM t"
    assert bq("SELECT 'it''s?' , ?", (None,)) == "SELECT 'it''s?' , NULL"
    # backslash handling is dialect-AUTO by default: ANSI backends
    # (Derby/Postgres) keep the literal backslash — doubling it would
    # corrupt 'a\b' into 'a\\b' database-side — while MySQL-style URLs
    # double it; an unrecognized URL + backslash param fails loudly
    # instead of emitting SQL whose meaning depends on a server setting
    ansi = JdbcStoredProcSource("jdbc:derby:memory:x", "x = ?",
                                params=("a\\b",))
    assert ansi._bound_query() == "x = 'a\\b'"
    mysql_auto = JdbcStoredProcSource("jdbc:mysql://h/db", "x = ?",
                                      params=("a\\b",))
    assert mysql_auto._bound_query() == "x = 'a\\\\b'"
    mysqlish = JdbcStoredProcSource(
        "u", "x = ?", params=("a\\b",), backslash_escapes=True)
    assert mysqlish._bound_query() == "x = 'a\\\\b'"
    import pytest
    with pytest.raises(ValueError, match="dialect"):
        bq("x = ?", ("a\\b",))  # url 'u': unknown dialect + backslash
    # backslash-free params never need the dialect resolved
    assert bq("x = ?", ("plain",)) == "x = 'plain'"
    with pytest.raises(ValueError, match="more '\\?' placeholders"):
        bq("a = ? AND b = ?", (1,))
    with pytest.raises(ValueError, match="unbound param"):
        bq("a = ?", (1, 2))


def test_jdbc_append_mode(spark, derby_url, people):
    extra = spark.createDataFrame([(100, "late", 9)],
                                  "id int, name string, grp int")
    JdbcSink(derby_url, "people", properties=DRIVER, mode="append") \
        .write(extra)
    out = JdbcSource(derby_url, "people", properties=DRIVER).load(spark)
    assert out.count() == 31
