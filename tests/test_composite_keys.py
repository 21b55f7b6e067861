"""Composite (multi-column) lineage keys end to end.

Real crawl tables key on ``(source, doc_id)`` / ``(url, crawl_ts)`` —
the reference's own row model is positional multi-field (eel-core
Row.scala:19-24). r8: ``key=["lang", "url"]``-style specs thread through
part assignment (``xxhash64(col1, col2)``), run records (per-component
``file_key_ranges_cols``), point lookups (per-component range + bloom
tier intersection), deletes/purges, and copy-on-write upserts — no
synthetic concat column, no rename/type-handling breakage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.checkpoint import (append_encode, encode_with_checkpoint,
                                      fsck, fsck_summary, point_lookup,
                                      range_lookup)
from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
from eel_sdk_spark.deletes import delete_rows, purge_deletes, upsert_rows
from eel_sdk_spark.table import ManifestTable

KEY = ["lang", "url"]


def _mk(spark, tmp_path, name, n=2000, parts=6, **kw):
    df = webtext_df(spark, n, parts=4).filter("lang is not null").cache()
    df.count()
    tbl = ManifestTable(str(tmp_path), name)
    encode_with_checkpoint(spark, df, tbl, key=KEY, n_parts=parts,
                           run_id="r1", **kw)
    return df, tbl


def _some(df, k=3):
    return [(r["lang"], r["url"])
            for r in df.select("lang", "url").limit(k).collect()]


def test_composite_encode_roundtrip_and_lineage(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path, "ck")
    run = tbl.current().properties["runs"][-1]
    assert run["key"] == KEY
    # per-component manifest ranges recorded alongside the legacy
    # primary-component map
    assert set(run["file_key_ranges_cols"]) <= set(KEY)
    assert run["file_key_ranges"] == run["file_key_ranges_cols"].get(
        "lang", {})
    back = tbl.read_decoded(spark)
    assert back.count() == df.count()
    assert back.exceptAll(df).count() == 0


def test_composite_point_lookup(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path, "cklkp", parts=8)
    lang, url = _some(df, 1)[0]
    hit = point_lookup(spark, tbl, (lang, url), key=KEY)
    rows = hit.collect()
    assert len(rows) == 1
    assert rows[0]["url"] == url and rows[0]["lang"] == lang
    # absent tuple: components exist separately but never together
    other_lang = next(
        r["lang"] for r in df.select("lang").distinct().collect()
        if r["lang"] != lang)
    assert point_lookup(spark, tbl, (other_lang, url), key=KEY).count() == 0


def test_composite_lookup_prunes_vs_single_probe_type_guard(spark,
                                                            tmp_path):
    df, tbl = _mk(spark, tmp_path, "ckguard")
    with pytest.raises(ValueError, match="probe values"):
        point_lookup(spark, tbl, ("only-one",), key=KEY)
    with pytest.raises(TypeError, match="key column"):
        point_lookup(spark, tbl, (7, "u"), key=KEY)


def test_composite_delete_and_purge(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path, "ckdel")
    n = df.count()
    victims = _some(df, 2)
    out = delete_rows(spark, tbl, victims, key=KEY)
    assert out["deleted_keys"] == 2
    read = tbl.read_decoded(spark)
    assert read.count() == n - 2
    (vl, vu) = victims[0]
    assert point_lookup(spark, tbl, (vl, vu), key=KEY).count() == 0
    # same-url-different-lang rows are NOT suppressed (tuple semantics):
    # deleting (lang, url) must not delete url under another lang — here
    # urls are unique so check via a direct filter on the survivor set
    assert read.filter(F.col("url").isin([u for _, u in victims])) \
        .count() == 0

    purged = purge_deletes(spark, tbl, SCHEMA_DDL)
    assert purged["purged_keys"] == 2
    raw = tbl.read_decoded(spark, with_deletes=False)
    assert raw.count() == n - 2
    assert fsck_summary(fsck(spark, tbl))["healthy"]


def test_composite_upsert_merges_on_tuple(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path, "ckups")
    n = df.count()
    victims = _some(df, 3)
    incoming = (df.filter(
        F.struct("lang", "url").isin([F.struct(F.lit(a), F.lit(b))
                                      for a, b in victims]))
        .withColumn("text", F.lit("refetched")))
    out = upsert_rows(spark, tbl, incoming, SCHEMA_DDL)
    assert out["upserted_keys"] == 3 and out["replaced_rows"] == 3
    read = tbl.read_decoded(spark).cache()
    assert read.count() == n
    assert read.filter("text = 'refetched'").count() == 3
    # pruned rewrite: some files survive untouched
    assert out["surviving_files"] > 0
    read.unpersist()


def test_composite_append_adopts_lineage(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path, "ckapp")
    extra = (webtext_df(spark, 200, parts=1)
             .filter("lang is not null")
             .withColumn("url", F.concat(F.lit("https://x.example/"),
                                         F.col("url")))).cache()
    n_extra = extra.count()
    append_encode(spark, extra, tbl, run_id="a1")
    assert tbl.current().properties["runs"][-1]["key"] == KEY
    assert tbl.read_decoded(spark).count() == df.count() + n_extra
    # appended rows are point-findable through the same composite hash
    lang, url = _some(extra, 1)[0]
    assert point_lookup(spark, tbl, (lang, url), key=KEY).count() == 1
    extra.unpersist()
    with pytest.raises(ValueError, match="lineage key"):
        append_encode(spark, extra, tbl, key="url", run_id="a2")


def test_range_lookup_on_primary_component(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path, "ckrange", **{"sort_by": ["lang"]})
    langs = sorted(r["lang"] for r in df.select("lang").distinct()
                   .collect())
    lo = langs[0]
    want = df.filter(F.col("lang") == lo).count()
    got = range_lookup(spark, tbl, lo, lo, key="lang")
    assert got.count() == want


def test_composite_key_rename_component(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path, "ckren")
    lang, url = _some(df, 1)[0]
    tbl.rename_column("url", "page_url")
    hit = point_lookup(spark, tbl, (lang, url), key=["lang", "page_url"])
    assert hit.count() == 1 and hit.first()["page_url"] == url
    # upsert keyed on the renamed composite still merges
    incoming = (df.filter((F.col("lang") == lang) & (F.col("url") == url))
                .withColumnRenamed("url", "page_url")
                .withColumn("text", F.lit("v2")))
    ddl = SCHEMA_DDL.replace("url ", "page_url ", 1)
    out = upsert_rows(spark, tbl, incoming, ddl)
    assert out["replaced_rows"] == 1
    assert (point_lookup(spark, tbl, (lang, url),
                         key=["lang", "page_url"])
            .first()["text"] == "v2")


def test_long_keyed_point_lookup_literal_typing(spark, tmp_path):
    """r8 regression (found by the composite gate leg): Py4J boxes small
    Python ints as java.lang.Integer, so F.lit(n) is an INT literal —
    and xxhash64 hashes int32/int64 differently, deriving the wrong
    part for bigint-keyed tables. point_lookup must cast probe literals
    to the key column's schema type; sweep enough ids that an
    accidental hash collision can't mask it."""
    docs = (webtext_df(spark, 400, parts=4)
            .withColumn("doc_id", F.xxhash64("url") % 100000)
            .select("doc_id", "text"))
    tbl = ManifestTable(str(tmp_path), "intkey")
    encode_with_checkpoint(spark, docs, tbl, key="doc_id", n_parts=8,
                           run_id="r1")
    targets = [r["doc_id"] for r in docs.limit(12).collect()]
    for t in targets:
        hit = point_lookup(spark, tbl, int(t), key="doc_id")
        assert hit.count() == 1, f"doc_id {t} not found"
