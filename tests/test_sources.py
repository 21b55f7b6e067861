"""Source/sink round-trips per format + pushdown visibility + schema tools.

Patterned on the reference's component tests (ParquetComponentTest,
CsvSinkTest, JsonSinkTest, ParquetProjectionTest.scala:39-48 projection,
ParquetPredicateTest.scala:13-48 predicate) and the uk-500/person fixtures
(FIXTURES.md §3-4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eel_sdk_spark.schema import align_df, coerce_df, ddl
from eel_sdk_spark.sources import (
    CsvSink,
    CsvSource,
    DataTypeRule,
    DevNullSink,
    FilePattern,
    JsonSink,
    JsonSource,
    OrcSink,
    OrcSource,
    ParquetSink,
    ParquetSource,
    SchemaInferrer,
)

# FIXTURES.md §4 person fixture (ParquetProjectionTest.scala:15-26)
PERSON = [("clint eastwood", "actor", "carmel"),
          ("elton john", "musician", "pinner")]
PERSON_DDL = "name string, job string, location string"


@pytest.fixture(scope="module")
def person(spark):
    return spark.createDataFrame(PERSON, PERSON_DDL)


@pytest.mark.parametrize("sink_cls,source_cls", [
    (ParquetSink, ParquetSource),
    (OrcSink, OrcSource),
    (JsonSink, JsonSource),
])
def test_format_roundtrip(spark, person, tmp_path, sink_cls, source_cls):
    path = str(tmp_path / sink_cls.__name__)
    sink_cls(path).write(person)
    out = source_cls(path).load(spark)
    assert sorted(r["name"] for r in out.collect()) == \
        ["clint eastwood", "elton john"]


def test_csv_roundtrip_with_inferrer(spark, person, tmp_path):
    path = str(tmp_path / "csv")
    CsvSink(path, options={"header": "true"}).write(person)
    inferrer = SchemaInferrer(T.StringType(),
                              DataTypeRule("name", T.StringType(), False))
    src = CsvSource(path, inferrer=inferrer)
    out = src.load(spark)
    assert out.count() == 2
    # the inferrer's rule semantics (first match wins, default otherwise);
    # Spark file scans relax nullability on read, so check the inferrer
    inferred = inferrer.infer(["name", "job"])
    assert inferred["name"].nullable is False
    assert inferred["job"].dataType == T.StringType()


def test_projection_pushdown_visible_in_plan(spark, person, tmp_path):
    """ParquetProjectionTest.scala:39-48: only requested columns read."""
    path = str(tmp_path / "proj")
    ParquetSink(path).write(person)
    src = ParquetSource(path).with_projection("name")
    df = src.load(spark)
    assert df.columns == ["name"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan and "job" not in plan.split("ReadSchema")[1]


def test_predicate_pushdown_visible_in_plan(spark, person, tmp_path):
    """ParquetPredicateTest.scala:13-48: job == 'actor' -> 1 row, and the
    filter reaches the scan (PushedFilters)."""
    path = str(tmp_path / "pred")
    ParquetSink(path).write(person)
    src = ParquetSource(path).with_predicate(F.col("job") == "actor")
    df = src.load(spark)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["name"] == "clint eastwood"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "actor" in plan


def test_parquet_statistics_without_data_read(spark, person, tmp_path):
    """ParquetSource.scala:58-75 footer stats."""
    path = str(tmp_path / "stats")
    ParquetSink(path).write(person)
    st = ParquetSource(path + "/*.parquet").statistics()
    assert st["count"] == 2
    assert st["compressed"] > 0 and st["uncompressed"] > 0


def test_parquet_writer_knobs(spark, person, tmp_path):
    path = str(tmp_path / "knobs")
    (ParquetSink(path).with_dictionary(True).with_compression("gzip")
     .with_row_group_size(1 << 20).with_parallelism(2).write(person))
    assert ParquetSource(path).load(spark).count() == 2


def test_partitioned_sink(spark, person, tmp_path):
    path = str(tmp_path / "bydir")
    ParquetSink(path).with_partitioning("job").write(person)
    out = ParquetSource(path).load(spark)
    assert out.filter(F.col("job") == "actor").count() == 1


def test_devnull_sink(spark, person):
    DevNullSink().write(person)  # must simply not raise


def test_filepattern(tmp_path):
    for name in ("a.parquet", "b.parquet", "c.txt"):
        (tmp_path / name).write_text("x")
    assert len(FilePattern(str(tmp_path)).to_paths()) == 3
    assert len(FilePattern(str(tmp_path / "*.parquet")).to_paths()) == 2
    flt = FilePattern(str(tmp_path)).with_filter(lambda p: p.endswith(".txt"))
    assert len(flt.to_paths()) == 1


def test_coerce_and_align(spark):
    df = spark.createDataFrame([("1", "2.5", "x")],
                               "a string, b string, extra string")
    target = T.StructType([
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.DoubleType(), True),
        T.StructField("missing", T.StringType(), True),
    ])
    out = align_df(df, target)
    row = out.collect()[0]
    assert row["a"] == 1 and row["b"] == 2.5 and row["missing"] is None
    assert out.columns == ["a", "b", "missing"]
    co = coerce_df(df, target)
    assert co.schema["a"].dataType.simpleString() == "int"
    with pytest.raises(ValueError):
        align_df(df, T.StructType(
            [T.StructField("required", T.StringType(), False)]))


def test_schema_algebra():
    from eel_sdk_spark import schema as S

    base = T.StructType([T.StructField("a", T.IntegerType()),
                         T.StructField("b", T.StringType())])
    assert S.projection(base, "b").fieldNames() == ["b"]
    assert S.rename_field(base, "a", "z").fieldNames() == ["z", "b"]
    assert S.remove_fields_regex(base, "a").fieldNames() == ["b"]
    assert S.replace_field_type(base, "a", T.LongType())["a"].dataType == \
        T.LongType()
    merged = S.concat_schemas(base, T.StructType(
        [T.StructField("c", T.DoubleType())]))
    assert merged.fieldNames() == ["a", "b", "c"]
    assert S.ddl(base) == "a int, b string"


def test_compactor(spark, tmp_path):
    from eel_sdk_spark.table import ManifestTable

    tbl = ManifestTable(str(tmp_path), "c")
    tbl.write_df(spark.range(1000).repartition(16), "id bigint")
    assert len(tbl.current().files) == 16
    tbl.compact(spark, 2)
    assert len(tbl.current().files) == 2
    assert tbl.read(spark).count() == 1000


def test_csv_header_first_comment(spark, tmp_path):
    """CsvSourceTest.scala:74-83 ('support first comment header'): names
    come from the first comment line, every non-comment row is data."""
    p = tmp_path / "comments.csv"
    p.write_text("#a,b,c\ne,f,g\n1,2,3\n4,5,6\n")
    src = CsvSource(str(p), header="first_comment")
    out = src.load(spark)
    assert out.columns == ["a", "b", "c"]
    got = {tuple(r) for r in out.collect()}
    assert got == {("e", "f", "g"), ("1", "2", "3"), ("4", "5", "6")}


def test_csv_header_none(spark, tmp_path):
    """CsvSourceTest: Header.None names columns by ordinal."""
    p = tmp_path / "nohdr.csv"
    p.write_text("e,f,g\n1,2,3\n")
    out = CsvSource(str(p), header=False).load(spark)
    assert out.columns == ["0", "1", "2"]
    assert out.count() == 2


def test_csv_skip_rows(spark, tmp_path):
    """CsvSource.scala:48 withSkipRows: preamble lines before the header."""
    p = tmp_path / "skip.csv"
    p.write_text("junk preamble\nmore junk\na,b\n1,2\n3,4\n")
    out = CsvSource(str(p)).with_skip_rows(2).load(spark)
    assert out.columns == ["a", "b"]
    assert sorted(tuple(r) for r in out.collect()) == [("1", "2"), ("3", "4")]
    # skip + headerless
    out2 = CsvSource(str(p), header=False).with_skip_rows(3).load(spark)
    assert out2.columns == ["0", "1"]
    assert out2.count() == 2


def test_merge_schema_across_files(spark, tmp_path):
    """AvroSchemaMerge.scala:10-32 / reference.conf:52
    (eel.parquet.mergeSchemas): one table view over files whose schemas
    evolved."""
    d = str(tmp_path / "merged")
    spark.createDataFrame([(1, "x")], "id int, a string") \
        .write.parquet(d + "/f1")
    spark.createDataFrame([(2, 7.5)], "id int, b double") \
        .write.parquet(d + "/f2")
    out = ParquetSource(d + "/*").with_merge_schema().load(spark)
    assert sorted(out.columns) == ["a", "b", "id"]
    assert out.count() == 2


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Co-bucketed tables equi-join with ZERO exchange: the shuffle was
    paid once at write time — the big-to-big join strategy at scale."""
    from eel_sdk_spark.sources import write_bucketed

    a = spark.range(0, 10_000).withColumn("va", F.col("id") % 97)
    b = spark.range(0, 10_000).withColumn("vb", F.col("id") % 31)
    write_bucketed(a, "bkt_a", ["id"], n_buckets=8,
                   path=str(tmp_path / "a"))
    write_bucketed(b, "bkt_b", ["id"], n_buckets=8,
                   path=str(tmp_path / "b"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the plan shows the big-to-big strategy
        # bucketing exists for (broadcast would hide the shuffle question)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
        j = ta.join(tb, "id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_sequence_source_sink_roundtrip(spark, tmp_path):
    """SequenceSource/Sink (r6 — flips the last file-format oos item,
    SequenceSource.scala:14-52): header + CSV-payload records in a
    Hadoop sequence container. Round-trips tricky values (embedded
    commas, quotes, NEWLINES — records are container-framed, not
    line-split), nulls, and a typed re-read."""
    from eel_sdk_spark.sources.sequence import read_sequence, write_sequence

    rows = [(1, "plain", 1.5),
            (2, "comma, inside", -2.25),
            (3, 'quote " inside', 0.0),
            (4, "line\nbreak", 3.5),
            (5, None, None)]
    df = spark.createDataFrame(rows, "id bigint, name string, score double")
    path = str(tmp_path / "seq")
    write_sequence(df, path)

    # untyped read: all strings, header names preserved
    back = read_sequence(spark, path)
    assert back.columns == ["id", "name", "score"]
    assert [f.dataType.simpleString() for f in back.schema.fields] == \
        ["string"] * 3
    assert back.count() == 5

    # typed read round-trips exactly (incl. newline value and nulls)
    typed = read_sequence(spark, path,
                          "id bigint, name string, score double")
    got = {r["id"]: (r["name"], r["score"]) for r in typed.collect()}
    assert got[4][0] == "line\nbreak"
    assert got[2][0] == "comma, inside" and got[2][1] == -2.25
    assert got[5] == (None, None)
    assert df.exceptAll(typed).count() == 0 and \
        typed.exceptAll(df).count() == 0


def test_parquet_sink_bloom_filters_written(spark, tmp_path):
    """ParquetSink.with_bloom_filters writes parquet-native column
    blooms (verified via the footer metadata) and the file round-trips."""
    import pyarrow.parquet as pq

    from eel_sdk_spark.sources.writers import ParquetSink

    from pyspark.sql import functions as F
    df = spark.range(5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.col("id").alias("v"))
    path = str(tmp_path / "bloomed")
    ParquetSink(path).with_bloom_filters(["key"], ndv=5000) \
        .with_compression("snappy").write(df)
    back = spark.read.parquet(path)
    assert back.count() == 5000
    # this pyarrow is too old to expose bloom_filter_offset in footers —
    # verify physically instead: the bloomed file must carry the filter
    # bytes (>= ~half of ndv bits) over an otherwise-identical write
    import glob
    path2 = path + "_nobloom"
    ParquetSink(path2).with_compression("snappy").write(df)
    size = lambda p: sum(  # noqa: E731
        __import__("os").path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))
    delta = size(path) - size(path2)
    assert delta > 2000, delta  # blooms really written
    assert spark.read.parquet(path2).count() == 5000
    assert pq is not None
