"""Replicates the driver's correctness gate locally: every ``queries()``
entry that has an ``oracle_sql()`` twin must match DuckDB exactly at
sf0.01 (row count, schema names, order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(df):
    """pandas -> sorted-by-name columns, rows sorted, values normalized."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_pd = sdf.toPandas()
    duck_pd = ddb.sql(ORACLES[name]).df()
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: column mismatch {sorted(spark_pd.columns)} vs "
        f"{sorted(duck_pd.columns)}")
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count {len(spark_pd)} vs {len(duck_pd)}")
    a, b = _canon(spark_pd), _canon(duck_pd)
    neq = (a != b).any(axis=1)
    assert not neq.any(), (
        f"{name}: {int(neq.sum())} differing rows, first:\n"
        f"spark: {a[neq].head(3).to_dict('records')}\n"
        f"duck : {b[neq].head(3).to_dict('records')}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rows_joined"] == r["text_matches"] == r["html_matches"]
