"""End-to-end encode -> decode bit-identity on the webtext corpus.

The north-rule correctness gate (BASELINE.json input_hint): decoded columns
bit-identical, byte-identical extracted text per url. Patterned on the
reference's write->read-back component suites (ParquetComponentTest etc.).
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df, webtext_table
from eel_sdk_spark.encode import decode_blocks_df, encode_df

N_ROWS = 8000


def _mismatches(decoded, original, cols):
    cond = None
    for c in cols:
        eq = F.col(f"d.{c}").eqNullSafe(F.col(f"o.{c}"))
        cond = eq if cond is None else (cond & eq)
    j = decoded.alias("d").join(original.alias("o"), "url", "full")
    return j.filter(~cond).count()


@pytest.fixture(scope="module")
def corpus(spark):
    df = webtext_df(spark, N_ROWS, parts=4).cache()
    df.count()
    yield df
    df.unpersist()


def test_roundtrip_bit_identical(spark, corpus):
    blocks = encode_df(corpus, key="url", n_parts=8).cache()
    try:
        decoded = decode_blocks_df(blocks, SCHEMA_DDL)
        assert decoded.count() == N_ROWS
        assert _mismatches(decoded, corpus, ["warc_ts", "html", "text", "lang"]) == 0
    finally:
        blocks.unpersist()


def test_text_byte_identical_per_url(spark, corpus):
    """The per-row invariant: byte-identical extracted text per url."""
    blocks = encode_df(corpus, key="url", n_parts=8)
    decoded = decode_blocks_df(blocks, SCHEMA_DDL)
    bad = (
        decoded.select("url", F.encode(F.coalesce("text", F.lit("\x00NULL")),
                                       "utf-8").alias("tb"))
        .alias("d")
        .join(corpus.select(
            "url", F.encode(F.coalesce("text", F.lit("\x00NULL")),
                            "utf-8").alias("tb")).alias("o"), "url")
        .filter(~F.col("d.tb").eqNullSafe(F.col("o.tb")))
        .count()
    )
    assert bad == 0


def test_compression_beats_reference(spark, corpus, tmp_path):
    """Total encoded bytes <= reference encoder output (parquet snappy+dict,
    eel's ParquetSink defaults: RowParquetWriterFn.scala:42-50,
    reference.conf:55)."""
    import os

    ref_dir = str(tmp_path / "ref_parquet")
    (corpus.write.mode("overwrite")
     .option("compression", "snappy")
     .option("parquet.enable.dictionary", "true")
     .parquet(ref_dir))
    ref_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(ref_dir) for f in fs if f.endswith(".parquet"))

    blocks = encode_df(corpus, key="url", n_parts=8)
    enc_bytes = blocks.agg(F.sum("enc_bytes")).first()[0]
    assert enc_bytes <= ref_bytes, f"encoded {enc_bytes} > reference {ref_bytes}"


def test_adversarial_partitions(spark):
    """Empty / all-null / single-value / max-cardinality slices round-trip."""
    tbl = pa.table({
        "url": pa.array([f"u{i}" for i in range(1000)]),
        "warc_ts": pa.array([None] * 1000, type=pa.timestamp("us", tz="UTC")),
        "html": pa.array([b"x"] * 1000, type=pa.binary()),
        "text": pa.array([f"t{i}" for i in range(1000)]),  # max cardinality
        "lang": pa.array(["en"] * 1000),                    # single value
    })
    df = spark.createDataFrame(tbl.to_pandas())
    df = df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    blocks = encode_df(df, key="url", n_parts=4)
    decoded = decode_blocks_df(blocks, SCHEMA_DDL)
    assert decoded.count() == 1000
    assert _mismatches(decoded, df, ["warc_ts", "html", "text", "lang"]) == 0


def test_empty_input(spark):
    df = webtext_df(spark, 0, parts=2)
    blocks = encode_df(df, key="url", n_parts=2)
    assert blocks.count() == 0


def test_local_corpus_matches_distributed(spark):
    """Generation is id-deterministic: same rows on any partitioning."""
    local = webtext_table(500)
    dist = webtext_df(spark, 500, parts=7).orderBy("url").toPandas()
    lp = local.to_pandas().sort_values("url").reset_index(drop=True)
    dist = dist.sort_values("url").reset_index(drop=True)
    assert (lp["url"] == dist["url"]).all()
    assert (lp["text"].fillna("") == dist["text"].fillna("")).all()
    assert (lp["html"] == dist["html"]).all()


def test_noshuffle_fast_path_roundtrip(spark, corpus):
    """shuffle=False: zero-Exchange narrow plan, same bit-identical result."""
    blocks = encode_df(corpus, key="url", shuffle=False)
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    decoded = decode_blocks_df(blocks, SCHEMA_DDL)
    assert decoded.count() == N_ROWS
    assert _mismatches(decoded, corpus, ["warc_ts", "html", "text", "lang"]) == 0


def test_grouped_decode_no_shuffle(spark, corpus):
    """assume_grouped decode straight off encode output: zero Exchange in
    the decode stage, identical result (encode side explicitly requests
    the hash-exchange layout here; the default is 'local')."""
    blocks = encode_df(corpus, key="url", n_parts=8, shuffle=True)
    decoded = decode_blocks_df(blocks, SCHEMA_DDL, assume_grouped=True)
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the encode-side shuffle
    assert decoded.count() == N_ROWS
    assert _mismatches(decoded, corpus, ["warc_ts", "html", "text", "lang"]) == 0


def test_default_layout_is_scale_right(spark, corpus):
    """The DEFAULT encode layout must not push the corpus through shuffle
    storage: shuffle='auto' resolves to the content-lineage 'local' mode —
    a fully narrow plan (no Exchange anywhere), with part assignment
    identical to the shuffled mode and a bit-identical round-trip."""
    blocks = encode_df(corpus, key="url", n_parts=8)
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    decoded = decode_blocks_df(blocks, SCHEMA_DDL)
    assert decoded.count() == N_ROWS
    assert _mismatches(decoded, corpus, ["warc_ts", "html", "text", "lang"]) == 0


def test_decode_auto_detects_grouped_blocks(spark, corpus):
    """Blocks straight from encode_df (incl. cached, and pruned via
    prune_block_groups) take the zero-shuffle decode path WITHOUT the
    caller passing assume_grouped; blocks re-read from storage do not."""
    from eel_sdk_spark.encode import prune_block_groups

    # the decode-side regroup's signature is a repartition on the block
    # table's part_id column; the encode-side shuffle hashes __eel_part
    REGROUP = "hashpartitioning(part_id"

    blocks = encode_df(corpus, key="url", n_parts=8).cache()
    decoded = decode_blocks_df(blocks, SCHEMA_DDL)
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert REGROUP not in plan, plan
    assert decoded.count() == N_ROWS

    pruned = prune_block_groups(blocks, "url", lower_s="h")
    decoded2 = decode_blocks_df(pruned, SCHEMA_DDL)
    plan2 = decoded2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan2
    assert REGROUP not in plan2, plan2
    assert decoded2.count() == N_ROWS

    # storage round-trip loses the guarantee -> shuffled regroup path
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        blocks.write.mode("overwrite").parquet(d)
        reread = spark.read.parquet(d)
        dec3 = decode_blocks_df(reread, SCHEMA_DDL)
        plan3 = dec3._jdf.queryExecution().executedPlan().toString()
        assert REGROUP in plan3, plan3
        assert dec3.count() == N_ROWS
    blocks.unpersist()


def test_decode_from_storage_zero_shuffle(spark, corpus, tmp_path):
    """decode_files_df / ManifestTable.read_decoded: whole files per task,
    groups complete by construction, NO exchange of any kind — the
    storage-read twin of the auto-grouped in-memory decode."""
    from eel_sdk_spark.encode import decode_files_df
    from eel_sdk_spark.table import ManifestTable

    tbl = ManifestTable(str(tmp_path), "t")
    tbl.write_df(encode_df(corpus, key="url", n_parts=8),
                 "blocks")

    decoded = tbl.read_decoded(spark, SCHEMA_DDL)
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert decoded.count() == N_ROWS
    assert _mismatches(decoded, corpus, ["warc_ts", "html", "text", "lang"]) == 0

    # projection pushdown: only requested columns decoded
    proj = decode_files_df(spark, tbl.current().files, SCHEMA_DDL,
                           columns=["url", "lang"])
    assert proj.columns == ["url", "lang"]
    assert proj.count() == N_ROWS


def test_compact_preserves_block_grouping(spark, corpus, tmp_path):
    """Compaction of an encoded table must keep block groups whole per
    file (hash-repartition on part_id, auto-detected), or the zero-shuffle
    storage decode would see split groups."""
    from eel_sdk_spark.table import ManifestTable

    tbl = ManifestTable(str(tmp_path), "tc")
    tbl.write_df(encode_df(corpus, key="url", n_parts=8), "blocks")
    n_before = len(tbl.current().files)
    tbl.compact(spark, 2)
    assert len(tbl.current().files) <= 2 < n_before
    decoded = tbl.read_decoded(spark, SCHEMA_DDL)
    assert decoded.count() == N_ROWS
    assert _mismatches(decoded, corpus, ["warc_ts", "html", "text", "lang"]) == 0


def test_local_mode_content_lineage_no_exchange(spark, corpus):
    """shuffle='local': content-derived part_ids with a narrow plan (no
    Exchange), bit-identical decode, and part assignment identical to the
    shuffled mode — lineage is layout-independent."""
    blocks = encode_df(corpus, key="url", n_parts=8, shuffle="local")
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    decoded = decode_blocks_df(blocks, SCHEMA_DDL)
    assert decoded.count() == N_ROWS
    assert _mismatches(decoded, corpus, ["warc_ts", "html", "text", "lang"]) == 0

    # same (url -> part_id) mapping as the shuffled mode: banded blocks
    # span a sorted part run per task, so per-part row counts are not
    # readable off the blocks — but the EXACT union of the parts columns
    # must equal the content-derived part set, and every block's range
    # must be consistent (anchor = first, part_hi = last, sorted)
    from eel_sdk_spark.encode import with_part_id

    expect_parts = {r["__eel_part"] for r in
                    with_part_id(corpus, "url", 8)
                    .select("__eel_part").distinct().collect()}
    brows = (blocks.filter(F.col("col") == "url")
             .select("part_id", "part_hi", "parts").collect())
    got_parts = {p for r in brows for p in r["parts"]}
    assert got_parts == expect_parts
    for r in brows:
        assert r["parts"] == sorted(r["parts"])
        assert r["part_id"] == r["parts"][0]
        assert r["part_hi"] == r["parts"][-1]
    # full-size banded blocks: one block group per task slice, NOT one per
    # (task x part) — the fragmentation that banding exists to avoid
    n_tasks = blocks.select("writer_uid").distinct().count()
    assert len(brows) < n_tasks * 8  # strictly fewer than fragmented


def test_banded_storage_reread_decode_spreads_tasks(spark, corpus, tmp_path):
    """A banded table re-read from parquet loses the grouped tag and takes
    the regroup path: hashing on part_id alone would send every block to
    ONE task (all banded anchors are the task-minimum part, typically 0).
    The full-group-key regroup must spread decode across tasks while
    staying exact."""
    import tempfile

    blocks = encode_df(corpus, key="url", n_parts=8)
    with tempfile.TemporaryDirectory() as d:
        blocks.write.mode("overwrite").parquet(d)
        reread = spark.read.parquet(d)
        anchors = {r["part_id"] for r in
                   reread.select("part_id").distinct().collect()}
        decoded = decode_blocks_df(reread, SCHEMA_DDL)
        n_parts_used = (decoded
                        .select(F.spark_partition_id().alias("p"))
                        .distinct().count())
        # part_id-only hashing would cap tasks at |anchors| (typically 1)
        assert n_parts_used > min(len(anchors), 2), (n_parts_used, anchors)
        assert decoded.count() == N_ROWS
        assert _mismatches(decoded, corpus,
                           ["warc_ts", "html", "text", "lang"]) == 0


def test_decimal_columns_roundtrip_via_int_codecs(spark):
    """DecimalType end-to-end: precision <= 18 rides the int codec family
    (FOR here — quantized prices), wider decimals the plain fallback;
    nulls/negatives exact under null-safe compare."""
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") * 7 % 1000 / 100).cast("decimal(12,2)").alias("price"),
        F.when(F.col("id") % 11 == 0, None).otherwise(
            (F.col("id") - 2500) / 100).cast("decimal(10,2)").alias("bal"),
        F.lit("4500.12345678901234567").cast("decimal(38,18)").alias("wide"))
    blocks = encode_df(df, key="id", n_parts=4)
    codecs = {r["col"]: r["codec"] for r in
              blocks.select("col", "codec").distinct().collect()}
    assert codecs["price"] != "plain" and codecs["bal"] != "plain"
    assert codecs["wide"] == "plain"
    dec = decode_blocks_df(
        blocks, "id bigint, price decimal(12,2), bal decimal(10,2), "
                "wide decimal(38,18)")
    bad = dec.alias("d").join(df.alias("o"), "id").filter(
        "NOT (d.price <=> o.price) OR NOT (d.bal <=> o.bal) "
        "OR NOT (d.wide <=> o.wide)").count()
    assert dec.count() == 5000 and bad == 0


def test_compact_banded_table_spreads_writers(spark, corpus, tmp_path):
    """Compacting a BANDED table must not funnel everything through one
    writer: every banded block's anchor part is typically 0 (each task
    holds some part-0 rows), so the part_id-only repartition would hash
    the whole table to one partition. The group-key spread keeps decode
    groups whole AND produces multiple non-empty files.

    The corpus is spread to 12 input partitions first: each banded
    encode task draws ONE random writer_uid, and with only the
    fixture's 4 partitions the hash of 4 random uids lands all four
    groups in one of the 4 compact partitions with p = 4*(1/4)^4 =
    1/64 — a legitimate outcome of hashing 4 keys, not a compaction
    bug (it flaked exactly that way in a full-suite run, r9). Twelve
    uids push the all-in-one probability below 3e-7 while testing the
    same spread property."""
    from pyspark.sql import functions as F

    from eel_sdk_spark.table import ManifestTable

    tbl = ManifestTable(str(tmp_path), "tb")
    tbl.write_df(encode_df(corpus.repartition(12), key="url", n_parts=8),
                 "blocks")
    anchors = {r["part_id"] for r in
               tbl.read(spark).select("part_id").distinct().collect()}
    tbl.compact(spark, 4)
    nonempty = (spark.read.parquet(*tbl.current().files)
                .groupBy(F.input_file_name()).count().count())
    # with anchor collapse (|anchors| small) the old part_id hash would
    # leave exactly |anchors| non-empty files; the group key beats that
    assert nonempty > min(len(anchors), 3)
    decoded = ManifestTable(str(tmp_path), "tb").read_decoded(spark, SCHEMA_DDL)
    assert decoded.count() == N_ROWS
    assert _mismatches(decoded, corpus, ["warc_ts", "html", "text", "lang"]) == 0


def test_sort_by_improves_timestamp_ratio(spark, corpus):
    """Iceberg-style table sort order: sorting rows by warc_ts within each
    part makes the FOR/delta codec bite (sorted deltas << raw range) —
    measured ~25% smaller timestamp column even on uniform-random
    synthetic timestamps (real crawl fetch times cluster far harder).
    Round-trip must stay exact: row order inside a block is free."""
    from eel_sdk_spark.corpus import SCHEMA_DDL

    plain = encode_df(corpus, key="url", n_parts=8)
    sorted_ = encode_df(corpus, key="url", n_parts=8, sort_by=["warc_ts"])

    def ts_bytes(blocks):
        return (blocks.filter(F.col("col") == "warc_ts")
                .agg(F.sum("enc_bytes")).first()[0])

    assert ts_bytes(sorted_) < ts_bytes(plain) * 0.9
    dec = decode_blocks_df(sorted_, SCHEMA_DDL)
    j = dec.alias("d").join(corpus.alias("o"), "url")
    n_ok = j.filter(F.col("d.text").eqNullSafe(F.col("o.text"))
                    & F.col("d.warc_ts").eqNullSafe(F.col("o.warc_ts"))).count()
    assert n_ok == corpus.count()


def test_archive_profile_roundtrip_and_size_ordering(spark, corpus):
    """The 'archive' profile (exhaustive FSST merges, round 5) through
    the FULL pipeline: bit-exact round-trip, and encoded bytes <=
    the 'compression' profile's on the same corpus."""
    sizes = {}
    for profile in ("compression", "archive"):
        blocks = encode_df(corpus, key="url", n_parts=4, profile=profile)
        blocks = blocks.cache()
        sizes[profile] = blocks.agg(F.sum("enc_bytes")).first()[0]
        decoded = decode_blocks_df(blocks, SCHEMA_DDL)
        assert decoded.count() == corpus.count()
        bad = (decoded.alias("d").join(corpus.alias("o"), "url")
               .filter(~F.col("d.text").eqNullSafe(F.col("o.text"))
                       | ~F.col("d.html").eqNullSafe(F.col("o.html")))
               .count())
        assert bad == 0
        blocks.unpersist()
    assert sizes["archive"] <= sizes["compression"], sizes
