"""Operator-semantics tests against the reference's own fixtures.

The music table and its golden outputs come from the reference's core
suite (DataStreamTest.scala:18-35 fixture; GroupedDataStreamTest.scala:30-56
expected aggregates) — same inputs, same expected outputs, Spark execution.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.ops import DataStream

# eel-core/src/test/scala/io/eels/datastream/DataStreamTest.scala:25-34
MUSIC = [
    ("Elton John", 1969, "Empty Sky", 1433),
    ("Elton John", 1971, "Madman Across the Water", 7636),
    ("Elton John", 1972, "Honky Chateau", 2525),
    ("Elton John", 1973, "Goodbye Yellow Brick Road", 4352),
    ("Elton John", 1975, "Rock of the Westies", 5645),
    ("Kate Bush", 1978, "The Kick Inside", 2577),
    ("Kate Bush", 1978, "Lionheart", 745),
    ("Kate Bush", 1980, "Never for Ever", 7444),
    ("Kate Bush", 1982, "The Dreaming", 8253),
    ("Kate Bush", 1985, "Hounds of Love", 2495),
]


@pytest.fixture(scope="module")
def music(spark):
    return spark.createDataFrame(MUSIC, "artist string, year int, "
                                        "album string, sales long").cache()


def test_filter(spark, music):
    ds = DataStream(music).filter(F.col("artist") == "Elton John")
    assert ds.size() == 5


def test_projection_and_rename(spark, music):
    ds = (DataStream(music).projection("artist", "sales")
          .rename_field("sales", "copies"))
    assert ds.df.columns == ["artist", "copies"]
    assert ds.size() == 10


def test_add_field_and_map_field(spark, music):
    ds = (DataStream(music)
          .add_field("doubled", F.col("sales") * 2)
          .map_field("artist", lambda c: F.upper(c)))
    row = ds.filter(F.col("album") == "Empty Sky").head()
    assert row["doubled"] == 2866
    assert row["artist"] == "ELTON JOHN"


def test_add_field_error_if_exists(spark, music):
    with pytest.raises(ValueError):
        DataStream(music).add_field("sales", F.lit(0), error_if_exists=True)


def test_groupby_sum_golden(spark, music):
    """GroupedDataStreamTest.scala:30-34: sum(sales) by artist."""
    out = {r["artist"]: r["sum_sales"] for r in
           DataStream(music).group_by("artist").sum("sales")
           .to_datastream().collect()}
    assert out == {"Elton John": 21591, "Kate Bush": 21514}


def test_groupby_count_avg_min_max_golden(spark, music):
    """GroupedDataStreamTest.scala:36-56."""
    rows = {r["artist"]: r for r in
            DataStream(music).group_by("artist")
            .count().avg("year").min("sales").max("sales")
            .to_datastream().collect()}
    assert rows["Elton John"]["count"] == 5
    assert rows["Kate Bush"]["min_sales"] == 745
    assert rows["Kate Bush"]["max_sales"] == 8253
    assert abs(rows["Elton John"]["avg_year"] - 1972.0) < 1e-9


def test_aggregated_whole_dataset(spark, music):
    """GroupedDataStreamTest 'aggregated datastream': avg(year)=1976.3."""
    row = (DataStream(music).aggregated().avg("year")
           .to_datastream().head())
    assert abs(row["avg_year"] - 1976.3) < 1e-9


def test_join_broadcast(spark, music):
    """DataStreamTest join semantics (DataStreamTest.scala:118-132)."""
    labels = spark.createDataFrame(
        [("Elton John", "Mercury"), ("Kate Bush", "EMI")],
        "artist string, label string")
    ds = DataStream(music).join("artist", DataStream(labels))
    assert ds.size() == 10
    assert ds.filter(F.col("label") == "EMI").size() == 5


def test_cartesian(spark, music):
    """DataStreamTest.scala:550-561."""
    small = spark.createDataFrame([(1,), (2,)], "k int")
    assert DataStream(music).cartesian(DataStream(small)).size() == 20


def test_union_subtract_intersection(spark, music):
    elton = DataStream(music).filter(F.col("artist") == "Elton John")
    kate = DataStream(music).filter(F.col("artist") == "Kate Bush")
    assert elton.union(kate).size() == 10
    assert DataStream(music).subtract(elton).size() == 5
    assert DataStream(music).intersection(kate).size() == 5


def test_take_drop_sample(spark, music):
    assert DataStream(music).take(3, order_by="sales").size() == 3
    assert DataStream(music).drop_rows(4, order_by="sales").size() == 6
    # every 2nd of 10 ordered rows -> 5
    assert DataStream(music).sample_every_k(2, order_by="sales").size() == 5


def test_take_while_drop_while(spark, music):
    """Prefix semantics under explicit year order (DataStreamTest:137-163)."""
    ds = DataStream(music)
    pre = ds.take_while(F.col("artist") == "Elton John", order_by="year")
    assert pre.size() == 5  # all Elton rows precede Kate rows by year
    post = ds.drop_while(F.col("artist") == "Elton John", order_by="year")
    assert post.size() == 5


def test_minby_maxby(spark, music):
    assert DataStream(music).max_by("album", "sales").head()["album"] == \
        "The Dreaming"
    assert DataStream(music).min_by("album", "sales").head()["album"] == \
        "Lionheart"


def test_exists_find(spark, music):
    ds = DataStream(music)
    assert ds.exists(F.col("sales") > 8000)
    assert not ds.exists(F.col("sales") > 9000)
    assert ds.find(F.col("year") == 1980)["album"] == "Never for Ever"


def test_replace_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "x"), ("b", "y")], "c1 string, c2 string")
    filled = DataStream(df).replace_null_values("?").df.collect()
    assert all(r["c1"] is not None and r["c2"] is not None for r in filled)
    assert DataStream(df).drop_null_rows().size() == 1
    swapped = DataStream(df).replace_everywhere("b", "z").df.collect()
    assert any(r["c1"] == "z" for r in swapped)


def test_schema_ops(spark, music):
    ds = DataStream(music)
    assert ds.with_lower_case_schema().df.columns == \
        ["artist", "year", "album", "sales"]
    assert ds.strip_chars_from_field_names("aeiou").df.columns == \
        ["rtst", "yr", "lbm", "sls"]
    assert ds.remove_fields_regex("a.*").df.columns == ["year", "sales"]
    assert ds.replace_field_type("year", "string").df.schema["year"] \
        .dataType.simpleString() == "string"


def test_align(spark, music):
    ds = DataStream(music).align(["sales", "artist"])
    assert ds.df.columns == ["sales", "artist"]


def test_concat_zip(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "i int, s string")
    b = spark.createDataFrame([(10, "p"), (20, "q")], "j int, t string")
    rows = (DataStream(a).concat_zip(DataStream(b), "i", "j")
            .df.orderBy("i").collect())
    assert [(r["s"], r["t"]) for r in rows] == [("x", "p"), ("y", "q")]


def test_explode_field(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])],
                               "i int, xs array<string>")
    assert DataStream(df).explode_field("xs").size() == 3


def test_update_field(spark, music):
    ds = DataStream(music).update_field("artist", "Kate Bush", "KB")
    assert ds.filter(F.col("artist") == "KB").size() == 5


def test_sql_context(spark, music):
    from eel_sdk_spark.sql_context import SqlContext

    ctx = SqlContext(spark)
    ctx.register_frame("music", DataStream(music))
    out = ctx.sql("SELECT artist, sum(sales) AS s FROM music GROUP BY artist")
    assert {r["artist"]: r["s"] for r in out.collect()} == \
        {"Elton John": 21591, "Kate Bush": 21514}
    ctx.close()


def test_multiplex_and_tee(spark, music):
    a, b, c = DataStream(music).multiplex(3)
    assert a.size() == b.size() == c.size() == 10
    orig, derived = DataStream(music).tee(
        lambda df: df.groupBy("artist").count())
    assert orig.size() == 10 and derived.size() == 2


def test_listener(spark, music):
    calls = []
    ds = DataStream(music).listener(calls.append)
    assert ds.size() == 10
    assert calls == [10]


def test_pandas_udaf(spark, music):
    """eel's Aggregation trait (GroupedDataStream.scala:83-90) -> a custom
    vectorized UDAF via pandas_udf GROUPED_AGG (SURVEY §2.10)."""
    import numpy as np

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.astype(float)).mean()))

    out = {r["artist"]: r["g"] for r in
           DataStream(music).group_by("artist")
           .agg(geo_mean("sales").alias("g")).to_datastream().collect()}
    assert abs(out["Elton John"] - 3684.2175) < 0.01


def test_iterator_and_sinks(spark, music, tmp_path):
    assert sum(1 for _ in DataStream(music).iterator()) == 10
    DataStream(music).to_parquet(str(tmp_path / "p"), parallelism=2)
    assert spark.read.parquet(str(tmp_path / "p")).count() == 10


def test_join_goes_broadcast_in_plan(spark, music):
    """The reference's join contract is 'broadcast the small side'
    (DataStream.scala:417-448 materializes it into a hash map); assert the
    physical plan actually picks BroadcastHashJoin."""
    labels = spark.createDataFrame(
        [("Elton John", "Mercury"), ("Kate Bush", "EMI")],
        "artist string, label string")
    ds = DataStream(music).join("artist", DataStream(labels))
    plan = ds.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_order_dependent_ops_have_no_single_task_plan(spark):
    """drop/takeWhile/sample-every-k/concat-zip must not funnel the whole
    dataset through ONE task (Window.orderBy with no partitionBy compiles
    to Exchange SinglePartition): the global index is built from a range
    partitioning + per-partition offsets, so every exchange stays parallel."""
    from eel_sdk_spark.ops import with_global_index

    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    ds = DataStream(df)

    # tiny_exchanges: each global index carries ONE SinglePartition window
    # over n_partitions COUNT rows (constant bytes — the offsets cumsum);
    # take/drop_while add one scalar-min final agg. What must never appear
    # is the dataset itself on a single partition: every window over data
    # rows is partitioned by __pid.
    for tiny_exchanges, out in (
        (1, with_global_index(df, "id")),
        (1, ds.drop_rows(10, order_by="id").df),
        (1, ds.sample_every_k(100, order_by="id").df),
        (3, ds.take_while(F.col("id") < 5000, order_by="id").df),
        (3, ds.drop_while(F.col("id") < 5000, order_by="id").df),
        (2, ds.concat_zip(DataStream(df.select(F.col("id").alias("j"))),
                          order_left="id", order_right="j").df),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange SinglePartition") == tiny_exchanges, plan
        # the range partitioning is materialized ONCE behind a lazy
        # localCheckpoint (so both the counts branch and the window branch
        # read identical partitions even with exchange reuse disabled);
        # downstream plans read the checkpointed RDD
        assert "Scan ExistingRDD" in plan
        # every window over data rows runs partitioned (per __pid):
        # the only unpartitioned window spec is the offsets cumsum on __cnt
        import re

        for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
            assert spec.startswith("windowspecdefinition(__pid"), spec


def test_order_dependent_ops_values(spark):
    """Same results as the single-window implementation (golden checks)."""
    df = spark.range(1, 1001).withColumn("v", F.col("id") % 7)
    ds = DataStream(df)
    assert ds.drop_rows(990, order_by="id").df.agg(
        F.min("id"), F.count("*")).first() == (991, 10)
    sampled = [r["id"] for r in
               ds.sample_every_k(250, order_by="id").df.orderBy("id").collect()]
    assert sampled == [250, 500, 750, 1000]
    tw = ds.take_while(F.col("id") < 42, order_by="id").df
    assert tw.count() == 41 and tw.agg(F.max("id")).first()[0] == 41
    dw = ds.drop_while(F.col("id") < 42, order_by="id").df
    assert dw.count() == 959 and dw.agg(F.min("id")).first()[0] == 42
    # take_while with an always-true predicate keeps everything
    assert ds.take_while(F.lit(True), order_by="id").df.count() == 1000
    z = ds.concat_zip(DataStream(df.select((1001 - F.col("id")).alias("j"))),
                      order_left="id", order_right="j").df
    assert z.filter(F.col("id") != F.col("j")).count() == 0


def test_global_index_dense_without_exchange_reuse(spark):
    """Regression: the counts branch and the window branch of
    with_global_index must read the SAME range partitioning. Spark's
    static ReuseExchange never deduplicates this plan, and with AQE off
    the two exchanges used to sample boundaries independently — producing
    duplicate and missing indexes. The lazy localCheckpoint materializes
    the partitioning once, so the index must be a dense 1..n permutation
    under ANY reuse configuration."""
    from eel_sdk_spark.ops import with_global_index

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    old_reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.exchange.reuse", "false")
        df = spark.range(0, 50_000).withColumn(
            "k", F.xxhash64(F.col("id")))  # non-trivial sampled sort key
        got = with_global_index(df, "k", idx_col="rn")
        n, n_distinct, mn, mx = got.agg(
            F.count("*"), F.count_distinct("rn"),
            F.min("rn"), F.max("rn")).first()
        assert (n, n_distinct, mn, mx) == (50_000, 50_000, 1, 50_000)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.exchange.reuse", old_reuse)


def test_map_vectorized(spark, music):
    """DataStreamTest map cases (DataStreamTest.scala:40-47 usage sites):
    generic row transform, batch-vectorized."""
    def double_year(pdf):
        pdf["year"] = pdf["year"] * 2
        return pdf

    ds = DataStream(music).map(double_year)
    assert ds.df.schema == music.schema
    assert ds.df.agg(F.sum("year")).first()[0] == \
        music.agg(F.sum("year") * 2).first()[0]

    # reshaping map with an explicit output schema
    def project(pdf):
        import pandas as pd
        return pd.DataFrame({"artist_upper": pdf["artist"].str.upper()})

    got = DataStream(music).map(project, "artist_upper string").df
    assert got.columns == ["artist_upper"]
    assert got.count() == music.count()


def test_foreach_side_effect(spark, music):
    """DataStreamTest.scala:434-439: foreach visits every row, stream
    unchanged; counted via accumulator (fn runs on executors)."""
    acc = spark.sparkContext.accumulator(0)

    def visit(pdf):
        acc.add(len(pdf))

    ds = DataStream(music).foreach(visit)
    assert ds.size() == music.count()
    assert acc.value == music.count()


def test_replace_field(spark, music):
    """DataStream.scala:356-366 replaceField: in-place definition swap."""
    ds = DataStream(music).replace_field("year", "year_str", "string")
    assert [f.name for f in ds.df.schema.fields] == \
        [("year_str" if f.name == "year" else f.name)
         for f in music.schema.fields]
    assert ds.df.schema["year_str"].dataType.simpleString() == "string"
    assert ds.size() == music.count()


def test_small_operator_variants(spark, music):
    """mapFieldIfExists / case-insensitive drop / regex re-type /
    toVector-toSet-collectValues (DataStream.scala:49-65, 481-492,
    344-354, 890-924, 1018-1021)."""
    ds = DataStream(music)
    assert ds.map_field_if_exists("nope", lambda c: c * 2).df is music
    up = ds.map_field_if_exists("artist", F.upper)
    assert up.filter(F.col("artist") == "ELTON JOHN").size() == 5
    assert ds.remove_field("ARTIST", case_sensitive=False).df.columns == \
        ["year", "album", "sales"]
    assert ds.remove_field("no_such_col").df.columns == music.columns  # if-exists
    rt = ds.replace_field_type_regex("(year|sales)", "string")
    assert [f.dataType.simpleString() for f in rt.df.schema.fields] == \
        ["string", "string", "string", "string"]
    assert len(ds.to_vector()) == 10
    assert len(ds.to_set()) == 10
    assert sorted(ds.projection("artist").distinct()
                  .collect_values("artist")) == ["Elton John", "Kate Bush"]


def test_minhash_xxhash_family_agrees_on_exact_dups(spark, sf_dir):
    """The production xxhash64 minhash family finds the same exact-dup
    candidate pairs as the oracle-checkable md5 family (hash family
    changes bucketing noise, not exact-duplicate behavior)."""
    from eel_sdk_spark.functions import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    md5_pairs = dedup.minhash_candidate_pairs(
        d, "text", "doc_id", n_hashes=4, band_size=2)
    xx_pairs = dedup.minhash_candidate_pairs(
        d, "text", "doc_id", n_hashes=4, band_size=2, hash_family="xxhash")
    # exact duplicates (identical text) MUST appear under both families
    dups = dedup.exact_dup_groups(d, "text", "doc_id")
    n_dup_groups = dups.count()
    if n_dup_groups:
        fp = F.md5(F.encode(F.col("text"), "utf-8"))
        ids = d.select(fp.alias("fp"), "doc_id")
        same_text = (ids.alias("x").join(ids.alias("y"), "fp")
                     .filter(F.col("x.doc_id") < F.col("y.doc_id"))
                     .select(F.col("x.doc_id").alias("a"),
                             F.col("y.doc_id").alias("b")))
        for pairs in (md5_pairs, xx_pairs):
            missed = same_text.join(pairs, ["a", "b"], "left_anti").count()
            assert missed == 0


def test_clean_corpus_stages(spark, sf_dir):
    """Stage toggles compose: each enabled stage only ever removes rows;
    split covers every surviving row; dedup keeps min-id representatives."""
    from eel_sdk_spark.functions.pipeline import clean_corpus

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()

    only_exact = clean_corpus(d, near_dup_threshold=None, min_quality=None)
    n_exact = only_exact.count()
    assert n_exact <= n
    assert only_exact.select(
        F.md5(F.encode("text", "utf-8"))).distinct().count() == n_exact

    full = clean_corpus(d, near_dup_threshold=0.5, min_quality=0.3,
                        splits=[80, 10, 10],
                        split_labels=["train", "val", "test"])
    rows = full.count()
    assert 0 < rows <= n_exact
    splits = {r["split"]: r["n"] for r in
              full.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(splits.values()) == rows
    assert set(splits) <= {"train", "val", "test"}
    assert splits.get("train", 0) > splits.get("val", 0)


def test_as_of_join_semantics(spark):
    """Latest right row at-or-before each left row; exact ties match;
    no prior right -> nulls; tolerance nulls out stale matches."""
    from eel_sdk_spark.ops import as_of_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"),
         (1, "2024-01-01 12:00:00", "b"),
         (2, "2024-01-01 09:00:00", "c")],
        "k int, ts string, tag string").withColumn(
            "ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100.0),   # exact tie with 'a'
         (1, "2024-01-01 11:00:00", 200.0),
         (2, "2024-01-01 09:30:00", 300.0)],  # AFTER 'c': no match
        "k int, rts string, px double").withColumn(
            "rts", F.col("rts").cast("timestamp"))

    out = {r["tag"]: r for r in
           as_of_join(left, right, "k", "ts", "rts").collect()}
    assert out["a"]["px"] == 100.0       # tie included (>= semantics)
    assert out["b"]["px"] == 200.0       # latest, not first
    assert out["c"]["px"] is None        # nothing at-or-before

    # tolerance: 'b' is 1h after its match; a 30min tolerance voids it
    tol = {r["tag"]: r for r in
           as_of_join(left, right, "k", "ts", "rts",
                      tolerance_us=30 * 60 * 1_000_000).collect()}
    assert tol["a"]["px"] == 100.0
    assert tol["b"]["px"] is None


def test_range_join_is_equi_join(spark):
    """The bucketized interval join must plan as a HASH equi-join (on key
    + bucket) with a residual filter, never BroadcastNestedLoopJoin."""
    from eel_sdk_spark.ops import range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 1), (1, "2024-01-01 11:05:00", 2),
         (2, "2024-01-01 10:05:00", 3)],
        "k int, ts string, lid int").withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 9)],
        "k int, s string, e string, rid int") \
        .withColumn("s", F.col("s").cast("timestamp")) \
        .withColumn("e", F.col("e").cast("timestamp"))
    out = range_join(left, right, "k", "ts", "s", "e", bucket="20 minutes")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "Join" in plan
    rows = out.collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 9)]


def test_connected_components_chains(spark):
    """Chained duplicates (a~b, b~c, no a~c) collapse into ONE component
    labeled by the minimum id — the case pair-wise removal approximates."""
    from eel_sdk_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "a bigint, b bigint")
    out = {r["id"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_connected_components_deep_chain_flat_lineage(spark):
    """A 40-hop path graph needs ~40 label-propagation rounds: with the
    per-round localCheckpoint the logical plan must stay FLAT (constant
    size round over round) instead of replaying every previous round, and
    the labels must still fully converge."""
    from eel_sdk_spark.functions.dedup import connected_components

    n = 40
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                  "a bigint, b bigint")
    out = connected_components(pairs, max_iter=60)
    # flat lineage: the returned frame reads a checkpointed RDD, not a
    # 60-round join tower
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert len(plan) < 20_000, len(plan)
    rows = {r["id"]: r["component"] for r in out.collect()}
    assert rows == {i: 0 for i in range(n + 1)}


def test_connected_components_warns_when_unconverged(spark):
    """Diameter > max_iter: correct-but-coarser labels + RuntimeWarning,
    never a silent wrong answer."""
    import warnings

    from eel_sdk_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame([(i, i + 1) for i in range(30)],
                                  "a bigint, b bigint")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(pairs, max_iter=2).collect()
    assert any(issubclass(x.category, RuntimeWarning)
               and "not converged" in str(x.message) for x in w)


def test_lsh_bucket_cap_bounds_degenerate_bucket(spark):
    """5k docs sharing ONE minhash signature (identical shingle sets by
    construction) would make the band self-join quadratic (~12.5M pairs
    per band); the max_bucket guard must exclude the degenerate bucket so
    the candidate set stays bounded, while normal-size buckets pass."""
    from eel_sdk_spark.functions.dedup import minhash_candidate_pairs

    base = "alpha beta gamma delta epsilon zeta"  # one shared shingle set
    rows = [(i, f"{base}") for i in range(5000)]
    # plus a small genuine near-dup group that must SURVIVE the cap
    rows += [(10_000 + i, "unique zebra quokka wombat text " + "x " * i)
             for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    capped = minhash_candidate_pairs(df, "text", "doc_id",
                                     n_hashes=4, band_size=2,
                                     max_bucket=100)
    pairs = capped.collect()
    # the 5k-doc bucket (12,497,500 pairs uncapped) is gone; only pairs
    # among the small group (and none from the degenerate bucket) remain
    assert len(pairs) <= 100, len(pairs)
    assert all(r["a"] >= 10_000 for r in pairs)


def test_gate_folded_variants_stay_covered(spark, sf_dir):
    """Variants folded out of the 50-entry driver gate keep local
    evidence here: (a) xxhash64 SimHash is a pure function of the text —
    one distinct signature per exact-duplicate group (same property the
    md5 twin hash-compares in the gate); (b) minhash signatures are
    deterministic and identical texts share identical signatures; (c)
    hash_split is deterministic and ~[80/10/10]; (d) every LSH embedding
    near-dup pair is confirmed by the brute-force baseline."""
    from eel_sdk_spark.functions import dedup
    from eel_sdk_spark.functions import text as T

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # (a) xxhash simhash purity per exact-dup group
    sh = dedup.simhash(d, "text", "doc_id")
    j = d.select(F.md5(F.encode("text", "utf-8")).alias("fp"),
                 "doc_id").join(sh, "doc_id")
    bad = (j.groupBy("fp").agg(F.count_distinct("simhash").alias("nd"))
           .filter(F.col("nd") != 1).count())
    assert bad == 0

    # (b) minhash sigs: deterministic + equal text -> equal sigs
    s1 = dedup.minhash_signatures(d, "text", "doc_id", n_hashes=4)
    s2 = dedup.minhash_signatures(d, "text", "doc_id", n_hashes=4)
    assert s1.exceptAll(s2).count() == 0
    sig_cols = [c for c in s1.columns if c.startswith("sig_")]
    assert len(sig_cols) == 4
    per_text = (d.join(s1, "doc_id")
                .groupBy(F.md5(F.encode("text", "utf-8")))
                .agg(F.count_distinct(F.struct(*sig_cols)).alias("nd")))
    assert per_text.filter(F.col("nd") != 1).count() == 0

    # (c) hash_split: stable across physical layout, roughly 80/10/10
    split = T.hash_split(F.col("doc_id").cast("string"), [80, 10, 10],
                         ["train", "val", "test"])
    a = d.select("doc_id", split.alias("s"))
    b = d.repartition(7).select("doc_id", split.alias("s"))
    assert a.exceptAll(b).count() == 0
    fracs = {r["s"]: r["n"] for r in
             a.groupBy("s").agg(F.count("*").alias("n")).collect()}
    n = sum(fracs.values())
    assert 0.7 < fracs["train"] / n < 0.9

    # (d) LSH near-dups are a subset of the brute-force pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh = dedup.embedding_near_dups(emb, "vec_id", "embedding",
                                    threshold=0.3, n_planes=8)
    av = emb.select(F.col("vec_id").alias("a"),
                    F.col("embedding").alias("va"))
    bv = emb.select(F.col("vec_id").alias("b"),
                    F.col("embedding").alias("vb"))
    brute = (av.join(bv, F.col("a") < F.col("b"))
             .select("a", "b", F.round(dedup.cosine(F.col("va"),
                                                    F.col("vb")), 4)
                     .alias("cos"))
             .filter(F.col("cos") >= 0.3))
    assert lsh.select("a", "b").exceptAll(brute.select("a", "b")).count() == 0


def test_embedding_near_dups_degenerate_bucket_cap(spark):
    """Adversarial corpus-scale shape: thousands of all-zero embeddings
    (dot = 0 ⇒ every plane votes the same sign ⇒ ONE bucket) plus
    thousands of identical vectors. Uncapped, the bucket self-join goes
    k² (~12.5M pairs per 5k-bucket, a straggler at web scale); with
    ``max_bucket`` those buckets are excluded and the job completes with
    bounded output, while normal-sized buckets still produce their pairs."""
    from eel_sdk_spark.functions import dedup

    n = 5000
    zeros = spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.array_repeat(F.lit(0.0), 8).alias("embedding"))
    same = spark.range(n, 2 * n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i + 1)) for i in range(8)]).alias("embedding"))
    # two near-identical honest vectors that must STILL pair up
    honest = spark.createDataFrame(
        [(20_001, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
         (20_002, [1.0, 0.01, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>")
    emb = zeros.union(same).union(honest)
    out = dedup.embedding_near_dups(emb, "vec_id", "embedding",
                                    threshold=0.9, n_planes=8,
                                    max_bucket=100).collect()
    ids = {(r["a"], r["b"]) for r in out}
    assert (20_001, 20_002) in ids
    assert len(ids) < 200  # k² blow-up suppressed


def test_clean_corpus_cluster_exact(spark, sf_dir):
    """cluster_exact keeps exactly one representative per connected
    near-dup cluster; the pair-wise default can only drop MORE."""
    from eel_sdk_spark.functions.pipeline import clean_corpus

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact_mode = clean_corpus(d, near_dup_threshold=0.2,
                              cluster_exact=True, min_quality=None)
    pairwise = clean_corpus(d, near_dup_threshold=0.2, min_quality=None)
    assert pairwise.count() <= exact_mode.count()
    # no two survivors of exact mode are still a verified near-dup pair
    from eel_sdk_spark.functions import dedup
    leftover = dedup.jaccard_pairs(exact_mode, "text", "doc_id",
                                   threshold=0.2, n_hashes=4, band_size=2)
    assert leftover.count() == 0


def test_ngram_set_short_docs_safe(spark):
    """Docs shorter than n tokens yield an EMPTY gram set instead of an
    ANSI element_at crash (sequence(0, cnt-n) runs descending when
    cnt < n) — one empty doc must not kill a corpus-wide dedup job."""
    from eel_sdk_spark.functions.dedup import minhash_candidate_pairs, ngram_set

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "just two"), (4, "exactly three words"),
         (5, "a full five word document"), (6, "a full five word document")],
        "doc_id bigint, text string")
    sizes = {r["doc_id"]: r["s"] for r in docs.select(
        "doc_id", F.size(ngram_set(F.col("text"), 3)).alias("s")).collect()}
    assert sizes == {1: 0, 2: 0, 3: 0, 4: 1, 5: 3, 6: 3}
    pairs = minhash_candidate_pairs(docs, "text", "doc_id",
                                    n_hashes=4, band_size=2).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(5, 6)}


def test_as_of_join_matches_pandas_merge_asof(spark):
    """Property check against an independent implementation: for random
    keyed event streams, as_of_join must agree with pandas.merge_asof
    (allow_exact_matches=True) row for row — a second oracle besides the
    DuckDB ASOF JOIN the gate uses."""
    import numpy as np
    import pandas as pd

    from eel_sdk_spark.ops import as_of_join

    rng = np.random.default_rng(42)
    n_l, n_r = 400, 150
    left_pd = pd.DataFrame({
        "k": rng.integers(0, 8, n_l),
        "ts": rng.integers(0, 10_000, n_l).astype("int64"),
        "lv": np.arange(n_l, dtype="int64"),
    })
    right_pd = pd.DataFrame({
        "k": rng.integers(0, 8, n_r),
        "rts": rng.integers(0, 10_000, n_r).astype("int64"),
        "rv": np.arange(n_r, dtype="int64") * 10,
    })
    # merge_asof needs global sort by time; dedupe equal (k, rts) keeping
    # the LAST (our window semantics: latest right at equal ts wins)
    right_pd = (right_pd.sort_values(["rts", "rv"])
                .drop_duplicates(["k", "rts"], keep="last"))
    expect = pd.merge_asof(
        left_pd.sort_values("ts", kind="mergesort"),
        right_pd.sort_values("rts"),
        left_on="ts", right_on="rts", by="k",
        allow_exact_matches=True)

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = as_of_join(left, right, on="k", left_ts="ts",
                     right_ts="rts").toPandas()

    e = expect.sort_values("lv").reset_index(drop=True)
    g = got.sort_values("lv").reset_index(drop=True)
    assert len(e) == len(g) == n_l
    for col in ("k", "ts", "lv"):
        assert (e[col].values == g[col].values).all(), col
    # matched right values (NaN-safe compare)
    ev, gv = e["rv"].values, g["rv"].astype("float64").values
    both_nan = pd.isna(ev) & pd.isna(gv)
    assert (both_nan | (ev == gv)).all()


def test_range_join_malformed_interval_safe(spark):
    """An inverted interval (end < start — corrupt data) must yield no
    matches AND no descending-sequence bucket explosion (a corrupt epoch
    would otherwise explode millions of rows)."""
    from eel_sdk_spark.ops import range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 1)], "k int, ts string, lid int") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 9),
         (1, "2024-06-01 00:00:00", "1970-01-01 00:00:00", 666)],  # inverted
        "k int, s string, e string, rid int") \
        .withColumn("s", F.col("s").cast("timestamp")) \
        .withColumn("e", F.col("e").cast("timestamp"))
    out = range_join(left, right, "k", "ts", "s", "e", bucket="20 minutes")
    assert [(r["lid"], r["rid"]) for r in out.collect()] == [(1, 9)]


def test_substract_alias(spark, music):
    """The reference spells it 'substract' (DataStream.scala:735) — the
    drop-in alias must behave exactly like subtract."""
    elton = DataStream(music).filter(F.col("artist") == "Elton John")
    assert DataStream(music).substract(elton).size() == \
        DataStream(music).subtract(elton).size() == 5


def test_url_ops_and_domain_blocklist(spark):
    """url_host/registered_domain on real-world-messy inputs (ports,
    userinfo, bare hosts, empty/null), and the broadcast-anti deny-list
    pass — crawl text never shuffles, subdomains of a blocked registered
    domain are dropped too."""
    from eel_sdk_spark.functions import text as T

    d = spark.createDataFrame([
        (1, "https://News.BBC.co.uk:8080/path?q=1"),
        (2, "http://user:pw@spam.example.com/a"),
        (3, "example.com/bare"),
        (4, "ftp://files.archive.org/x"),
        (5, ""),
        (6, None),
        (7, "https://sub.spam.example.com/deep"),
    ], "id bigint, url string")
    got = {r["id"]: (r["h"], r["dom"]) for r in d.select(
        "id", T.url_host(F.col("url")).alias("h"),
        T.registered_domain(F.col("url")).alias("dom")).collect()}
    assert got[1] == ("news.bbc.co.uk", "co.uk")
    assert got[2] == ("spam.example.com", "example.com")
    assert got[3] == ("example.com", "example.com")
    assert got[4] == ("files.archive.org", "archive.org")
    assert got[5] == (None, None) and got[6] == (None, None)
    # ccTLD-aware depth
    d3 = d.filter("id = 1").select(
        T.registered_domain(F.col("url"), 3).alias("x")).first()["x"]
    assert d3 == "bbc.co.uk"

    kept = T.filter_blocked_domains(d, "url", ["Example.COM"])
    assert sorted(r["id"] for r in kept.collect()) == [1, 4, 5, 6]
    # plan: deny list broadcasts; the corpus side has no exchange
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # DataFrame-typed blocklist path
    bl = spark.createDataFrame([("archive.org",)], "domain string")
    kept2 = T.filter_blocked_domains(d, "url", bl)
    assert 4 not in {r["id"] for r in kept2.collect()}


def test_blocklist_matches_all_suffixes_cctld(spark):
    """The fixed-depth deny-list sharp edge is closed: at DEFAULT
    settings a ccTLD blocklist entry ('badsite.co.uk') blocks the site
    and its subdomains, while sibling ccTLD domains ('bbc.co.uk') — whose
    depth-2 extraction is the identical 'co.uk' — survive untouched."""
    from eel_sdk_spark.functions import text as T

    d = spark.createDataFrame([
        (1, "https://badsite.co.uk/x"),
        (2, "https://cdn.badsite.co.uk/y"),
        (3, "https://news.bbc.co.uk/z"),
        (4, "https://bbc.co.uk/"),
        (5, "https://badsite.com/us"),
        (6, "https://notbadsite.co.uk/near-miss"),  # no '.'-boundary match
    ], "id bigint, url string")
    kept = T.filter_blocked_domains(d, "url", ["badsite.co.uk"])
    assert sorted(r["id"] for r in kept.collect()) == [3, 4, 5, 6]

    # the Column-expression form agrees row for row
    flags = {r["id"]: r["b"] for r in d.select(
        "id", T.is_blocked_domain(F.col("url"),
                                  ["badsite.co.uk"]).alias("b")).collect()}
    assert flags == {1: True, 2: True, 3: False, 4: False,
                     5: False, 6: False}

    sufs = d.filter("id = 3").select(
        T.host_suffixes(F.col("url")).alias("s")).first()["s"]
    assert sufs == ["uk", "co.uk", "bbc.co.uk", "news.bbc.co.uk"]


def test_zorder_single_column_degenerates_to_rank_sort(spark):
    """zorder over ONE column is just a monotone rank of it — ordering by
    the key must order by the column."""
    from eel_sdk_spark.encode import zorder_key

    df = spark.range(0, 1000).withColumn(
        "v", F.xxhash64("id").cast("double"))
    z = df.withColumn("z", zorder_key(df, ["v"]))
    rows = z.orderBy("z", "v").select("v").collect()
    vs = [r["v"] for r in rows]
    assert vs == sorted(vs)


def test_zorder_many_columns_stays_nonnegative(spark):
    """bits*len(cols)-1 must never reach the long sign bit: with 4 columns
    the default 16 bits would shift into position 63 → negative z keys that
    break sort monotonicity. The cap (63 // n_cols) keeps every key >= 0
    even on max-range inputs."""
    from eel_sdk_spark.encode import zorder_key

    df = spark.range(0, 500).select(
        F.col("id").cast("double").alias("a"),
        (499 - F.col("id")).cast("double").alias("b"),
        F.xxhash64("id").cast("double").alias("c"),
        F.xxhash64("id", "id").cast("double").alias("d"))
    z = df.withColumn("z", zorder_key(df, ["a", "b", "c", "d"]))
    mn, mx = z.agg(F.min("z"), F.max("z")).first()
    assert mn >= 0
    # 4 cols -> 15 bits each -> top bit position 59, key < 2^60
    assert mx < 1 << 60


def test_zorder_precomputed_bounds_skip_the_scan(spark):
    """With bounds supplied for every column, zorder_key must not run its
    min/max aggregate (at 100 TB that is an extra full corpus pass) — and
    the key built from supplied bounds must equal the scanned one when the
    bounds agree."""
    from unittest import mock

    from eel_sdk_spark.encode import zorder_key

    df = spark.range(0, 200).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 3 % 7).cast("double").alias("y")).cache()
    scanned = df.withColumn("z", zorder_key(df, ["x", "y"])).collect()
    with mock.patch.object(type(df), "agg",
                           side_effect=AssertionError("scan ran")):
        k = zorder_key(df, ["x", "y"],
                       bounds={"x": (0.0, 199.0), "y": (0.0, 6.0)})
    given = df.withColumn("z", k).collect()
    assert sorted(r["z"] for r in scanned) == sorted(r["z"] for r in given)
    # partial bounds -> only the missing column is scanned (still runs)
    k2 = zorder_key(df, ["x", "y"], bounds={"x": (0.0, 199.0)})
    assert df.withColumn("z", k2).count() == 200


def test_incremental_dedup_against_signature_store(spark):
    """Append-batch dedup: the existing corpus contributes ONLY its
    persisted signature table (fp + minhash sigs) — new batches are
    checked against it without re-reading corpus text. Exact dups flag
    via fingerprint, near dups via LSH band collision with stored sigs,
    within-batch dups keep the min id, and short docs (no shingles)
    still exact-dedup through their null-sig store rows."""
    from eel_sdk_spark.functions.dedup import (
        incremental_dedup, incremental_dup_ids, signature_store)

    long_a = ("the quick brown fox jumps over the lazy dog again and "
              "again while the rain in spain stays mainly on the plain")
    long_b = ("completely different content about distributed columnar "
              "encoding engines and their manifest snapshot tables")
    v1 = spark.createDataFrame(
        [(1, long_a), (2, long_b), (3, "tiny")],
        "doc_id bigint, text string")
    store = signature_store(v1, "text", "doc_id")
    # short doc: fp present, sigs null (shorter than the shingle width)
    srow = {r["doc_id"]: r for r in store.collect()}
    assert srow[3]["fp"] is not None and srow[3]["sig_0"] is None
    assert srow[1]["sig_0"] is not None

    new = spark.createDataFrame(
        [(10, long_a),             # exact dup of stored doc 1
         (11, long_a + "  "),      # near dup: same token set, new fp
         (12, "fresh unique text never seen before in any batch here"),
         (13, "fresh unique text never seen before in any batch here"),
         (14, "tiny"),             # exact dup of stored SHORT doc
         (15, "brand new document full of original words entirely")],
        "doc_id bigint, text string")
    flagged = {r["doc_id"] for r in
               incremental_dup_ids(new, store, "text", "doc_id").collect()}
    # 10 exact, 11 near (identical shingle set -> every band collides),
    # 13 within-batch exact dup of 12 (min id 12 survives), 14 via fp
    assert flagged == {10, 11, 13, 14}
    kept = {r["doc_id"] for r in
            incremental_dedup(new, store, "text", "doc_id").collect()}
    assert kept == {12, 15}

    # survivors' signatures union into the store for the next increment
    nxt = store.unionByName(signature_store(
        new.filter(F.col("doc_id").isin(12, 15)), "text", "doc_id"))
    again = {r["doc_id"] for r in incremental_dup_ids(
        spark.createDataFrame([(20, long_a), (21, "brand new document "
                               "full of original words entirely")],
                              "doc_id bigint, text string"),
        nxt, "text", "doc_id").collect()}
    assert again == {20, 21}  # both now duplicate the grown store


def test_incremental_within_batch_jaccard_verify(spark):
    """verify_threshold upgrades within-batch near-dup flags from
    candidate-level (band collision) to exact Jaccard: a same-token-set
    doc is still dropped, while a partial-overlap doc that merely
    shares a band survives verification."""
    from eel_sdk_spark.functions.dedup import incremental_dup_ids

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    partial = ("alpha beta gamma delta epsilon zeta eta theta completely "
               "different tail of this document goes its own way here now")
    new = spark.createDataFrame(
        [(1, base), (2, base + "  "), (3, partial)],
        "doc_id bigint, text string")
    empty_store = spark.createDataFrame(
        [], "doc_id bigint, fp string, sig_0 string, sig_1 string, "
            "sig_2 string, sig_3 string, sig_4 string, sig_5 string, "
            "sig_6 string, sig_7 string")
    flagged = {r["doc_id"] for r in incremental_dup_ids(
        new, empty_store, "text", "doc_id",
        verify_threshold=0.9).collect()}
    assert flagged == {2}
    # candidate-level (unverified) flags the partial-overlap doc too if
    # it shares a band; at minimum the verified set is a subset
    cand = {r["doc_id"] for r in incremental_dup_ids(
        new, empty_store, "text", "doc_id").collect()}
    assert flagged <= cand


def test_store_params_contract(spark, tmp_path):
    """ADVICE r5: a signature store built under different minhash params
    silently matches no bands — the sidecar + schema checks fail fast
    instead."""
    import pytest

    from eel_sdk_spark.functions.dedup import (
        dedup_params, incremental_dup_ids, signature_store,
        validate_store_params, write_store_params)

    docs = spark.createDataFrame(
        [(i, f"some repeated tokens number {i} for shingles") for i in
         range(20)], "doc_id bigint, text string")
    store_path = str(tmp_path / "store")
    signature_store(docs, "text", "doc_id", n_hashes=4).write \
        .parquet(store_path)
    write_store_params(store_path, dedup_params(n_hashes=4))

    # sidecar mismatch -> ValueError before any Spark work
    with pytest.raises(ValueError, match="built with"):
        validate_store_params(store_path, dedup_params(n_hashes=8))
    # matching params pass; store without a sidecar passes too
    validate_store_params(store_path, dedup_params(n_hashes=4))
    validate_store_params(str(tmp_path / "nope"), dedup_params())

    # schema-level fail-fast inside the op itself (no sidecar needed):
    # an 8-hash run against the 4-hash store raises, never silently
    # degrades to exact-only
    store = spark.read.parquet(store_path)
    with pytest.raises(ValueError, match="sig_"):
        incremental_dup_ids(docs, store, "text", "doc_id", n_hashes=8)
    # and the matching width works
    assert incremental_dup_ids(docs, store, "text", "doc_id",
                               n_hashes=4).count() >= 0


def test_key_range_stats_groups_per_key_and_family():
    """ADVICE r5: analyze-table must not mix spans from runs keyed on
    different columns (str vs int tuples crash sorted()); stats are for
    the lineage key only."""
    from jobs.cli import _key_range_stats

    runs = [
        {"key": "doc_id",
         "file_key_ranges": {"a.parquet": {"i": [0, 10]}}},
        {"key": "url",  # lineage key (last run)
         "file_key_ranges": {"b.parquet": {"s": ["a", "m"]},
                             "c.parquet": {"s": ["n", "z"]}}},
    ]
    out = _key_range_stats(runs, {})
    assert out["key"] == "url"
    assert out["ranged_files"] == 2       # only url-keyed files counted
    assert out["disjoint_frac"] == 1.0    # and they are disjoint
    # extras for a DIFFERENT key are excluded
    out2 = _key_range_stats(runs, {"file_key_ranges_extra": {
        "key": "doc_id", "files": {"d.parquet": {"i": [5, 6]}}}})
    assert out2["ranged_files"] == 2
    # empty table
    assert _key_range_stats([], {})["ranged_files"] == 0


def test_duplicate_spans_and_removal(spark):
    """Exact-substring span dedup (r6, Lee et al. 2021 pass): a pasted
    passage is cut from every occurrence except the canonical (min id,
    min pos) one; within-doc self-repeats are cut; unique text is
    byte-untouched; DuckDB replays the md5-family cut positions."""
    import duckdb

    from eel_sdk_spark.functions.dedup import (duplicate_spans,
                                               remove_duplicate_spans)

    passage = "the boilerplate passage that keeps getting pasted " \
              "around every site verbatim again"          # 12 tokens
    rows = [
        (1, f"doc one intro words {passage} doc one outro words"),
        (2, f"completely different doc two {passage} trailing bits"),
        (3, f"third doc starts {passage} middle {passage} ends here"),
        (4, "totally unique text with no duplication at all present"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    spans = duplicate_spans(df, "text", "doc_id", window=8,
                            hash_family="md5")
    got = {(r["doc_id"], r["start"], r["end"])
           for r in spans.collect()}
    # doc 1 owns the passage (min id): no spans for doc 1 or 4
    assert not any(i == 1 for i, *_ in got)
    assert not any(i == 4 for i, *_ in got)
    assert any(i == 2 for i, *_ in got)
    assert any(i == 3 for i, *_ in got)

    out = remove_duplicate_spans(df, "text", "doc_id", window=8,
                                 hash_family="md5")
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert passage in texts[1]            # canonical occurrence kept
    assert passage not in texts[2]
    assert passage not in texts[3]        # both occurrences cut (owner
    assert texts[4] == rows[3][1]         # is doc 1); untouched verbatim
    assert "completely different doc two" in texts[2]
    assert "third doc starts" in texts[3] and "ends here" in texts[3]

    # DuckDB replica of the CUT (id, pos) set, md5 family, keep='first'
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    duck_cut = set(con.sql("""
        WITH wh AS (
            SELECT doc_id, i - 1 AS pos,
                   md5(array_to_string(w[i:i+7], ' ')) AS h
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '),
                                     x -> x <> '') AS w FROM docs),
                 UNNEST(generate_series(1, len(w) - 7)) AS t(i)),
        dup AS (SELECT h FROM wh GROUP BY h HAVING count(*) >= 2),
        flagged AS (SELECT wh.* FROM wh JOIN dup USING (h)),
        ranked AS (SELECT doc_id, pos,
                          row_number() OVER (PARTITION BY h
                              ORDER BY doc_id, pos) AS rn FROM flagged)
        SELECT doc_id, pos FROM ranked WHERE rn > 1""").fetchall())
    # spark's merged spans must cover exactly the duck cut windows
    spark_cut_tokens = set()
    for i, s, e in got:
        spark_cut_tokens |= {(i, t) for t in range(s, e)}
    duck_cut_tokens = set()
    for i, p in duck_cut:
        duck_cut_tokens |= {(i, t) for t in range(p, p + 8)}
    assert spark_cut_tokens == duck_cut_tokens

    # keep='none' cuts the canonical occurrence too
    none_out = remove_duplicate_spans(df, "text", "doc_id", window=8,
                                      hash_family="md5", keep="none")
    ntexts = {r["doc_id"]: r["text"] for r in none_out.collect()}
    assert passage not in ntexts[1]

    # determinism across layout + xxhash family agreement on doc sets
    again = duplicate_spans(df.repartition(7), "text", "doc_id",
                            window=8, hash_family="md5")
    assert spans.exceptAll(again).count() == 0
    xx = duplicate_spans(df, "text", "doc_id", window=8)
    assert ({r["doc_id"] for r in xx.collect()}
            == {i for i, *_ in got})

    # r7 (VERDICT r6 #1): canonical-occurrence selection must be a
    # combinable groupBy, never a per-hash sorted window — a universal
    # banner shared by k docs would otherwise pile k rows into ONE
    # window partition. Pin it in the physical plan.
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # and the min(struct) partial-aggregates map-side (two-phase agg)
    assert "partial_min" in plan.lower() or "HashAggregate" in plan
