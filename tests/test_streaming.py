"""Structured Streaming surface: file watcher, publisher, windowed agg,
streaming encode with manifest commits per micro-batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
from eel_sdk_spark.encode import decode_blocks_df
from eel_sdk_spark.streaming import (
    file_watcher_stream,
    publisher_stream,
    streaming_encode,
    windowed_counts,
)
from eel_sdk_spark.table import ManifestTable

EVENTS_DDL = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")


def test_windowed_counts_memory_sink(spark, sf_dir, tmp_path):
    # streaming file source wants a directory to watch
    import shutil

    watch_dir = tmp_path / "events_in"
    watch_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", watch_dir / "events.parquet")
    stream = file_watcher_stream(spark, str(watch_dir), EVENTS_DDL)
    agg = windowed_counts(stream)
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("win_out").start())
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM win_out")
        batch = spark.read.parquet(f"{sf_dir}/events.parquet")
        # windowed total equals input total
        assert out.agg(F.sum("n")).first()[0] == batch.count()
    finally:
        q.stop()


def test_publisher_stream_and_streaming_encode(spark, tmp_path):
    pub = publisher_stream(spark, SCHEMA_DDL, str(tmp_path / "spool"))
    tbl = ManifestTable(str(tmp_path), "stream_blocks")

    batch1 = webtext_df(spark, 500, parts=2)
    pub.publish(batch1)

    q = streaming_encode(pub.stream(), tbl, key="url", n_parts=4,
                         checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        assert tbl.current() is not None
        decoded = decode_blocks_df(tbl.read(spark), SCHEMA_DDL)
        assert decoded.count() == 500

        # second micro-batch appends a second snapshot
        batch2 = webtext_df(spark, 300, parts=2).withColumn(
            "url", F.concat(F.lit("b2-"), F.col("url")))
        pub.publish(batch2)
        q.processAllAvailable()
        decoded = decode_blocks_df(tbl.read(spark), SCHEMA_DDL)
        assert decoded.count() == 800
    finally:
        q.stop()
        pub.close()

    with pytest.raises(RuntimeError):
        pub.publish(batch1)


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    from eel_sdk_spark.streaming import streaming_dedup

    pub = publisher_stream(spark, SCHEMA_DDL, str(tmp_path / "spool2"))
    pub.publish(webtext_df(spark, 400, parts=2))  # ids 0..399

    deduped = streaming_dedup(pub.stream(), key="url", n_buckets=8)
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName("dedup_out")
         .option("checkpointLocation", str(tmp_path / "ckpt2")).start())
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM dedup_out").first()[0] == 400

        # second batch overlaps ids 200..399, adds 400..599
        pub.publish(webtext_df(spark, 400, parts=2).withColumn(
            "url", F.regexp_replace("url", "/p/([0-9]+)$", "/p/$1"))
            .limit(0).unionByName(
                webtext_df(spark, 600, parts=2).filter(
                    F.split(F.col("url"), "/p/")[1].cast("long") >= 200)))
        q.processAllAvailable()
        out = spark.sql("SELECT count(*) n, count(DISTINCT url) d FROM dedup_out").first()
        assert out["n"] == out["d"] == 600  # every url exactly once
    finally:
        q.stop()
        pub.close()


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch may replay an epoch after failure: the per-stream
    epoch watermark in the manifest must make the second commit a no-op
    (without it every replayed batch duplicates its rows)."""
    from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
    from eel_sdk_spark.encode import decode_blocks_df
    from eel_sdk_spark.streaming.pipeline import encode_epoch
    from eel_sdk_spark.table import ManifestTable

    tbl = ManifestTable(str(tmp_path), "stream_blocks")
    batch = webtext_df(spark, 300, parts=2)
    assert encode_epoch(tbl, batch, 0, key="url", n_parts=4) is True
    assert decode_blocks_df(tbl.read(spark), SCHEMA_DDL).count() == 300

    # replay of epoch 0: skipped, no duplicate rows, no new snapshot
    snap_before = tbl.current().snapshot_id
    assert encode_epoch(tbl, batch, 0, key="url", n_parts=4) is False
    assert tbl.current().snapshot_id == snap_before
    assert decode_blocks_df(tbl.read(spark), SCHEMA_DDL).count() == 300

    # next epoch appends normally
    batch2 = webtext_df(spark, 200, parts=2).withColumn(
        "url", F.concat(F.lit("e1-"), F.col("url")))
    assert encode_epoch(tbl, batch2, 1, key="url", n_parts=4) is True
    assert decode_blocks_df(tbl.read(spark), SCHEMA_DDL).count() == 500


def test_two_streams_epoch_watermarks_are_independent(spark, tmp_path):
    """Two streams (distinct stream_id) committing to ONE table must not
    erase each other's epoch watermark: the watermark lives in one flat
    property key per stream, merged against the snapshot current AT COMMIT
    time. Interleaved commits followed by replays of each stream's old
    epochs must all be skipped."""
    from eel_sdk_spark.corpus import webtext_df
    from eel_sdk_spark.streaming.pipeline import encode_epoch
    from eel_sdk_spark.table import ManifestTable

    tbl = ManifestTable(str(tmp_path), "stream_blocks")
    mk = lambda tag, n: webtext_df(spark, n, parts=2).withColumn(  # noqa: E731
        "url", F.concat(F.lit(tag), F.col("url")))

    assert encode_epoch(tbl, mk("a0-", 50), 0, key="url", n_parts=2,
                        stream_id="A") is True
    assert encode_epoch(tbl, mk("b0-", 50), 0, key="url", n_parts=2,
                        stream_id="B") is True
    assert encode_epoch(tbl, mk("a1-", 50), 1, key="url", n_parts=2,
                        stream_id="A") is True
    # replays of already-committed epochs from BOTH streams: all no-ops
    snap = tbl.current().snapshot_id
    assert encode_epoch(tbl, mk("a0-", 50), 0, key="url", n_parts=2,
                        stream_id="A") is False
    assert encode_epoch(tbl, mk("b0-", 50), 0, key="url", n_parts=2,
                        stream_id="B") is False
    assert encode_epoch(tbl, mk("a1-", 50), 1, key="url", n_parts=2,
                        stream_id="A") is False
    assert tbl.current().snapshot_id == snap
    props = tbl.current().properties
    assert props["epoch.A"] == 1 and props["epoch.B"] == 0


def test_session_aggregate_streaming_matches_batch(spark, sf_dir, tmp_path):
    """Native session_window: the streaming run over the same files must
    produce exactly the batch result (the operator is mode-agnostic)."""
    import shutil

    from eel_sdk_spark.streaming.pipeline import session_aggregate

    watch_dir = tmp_path / "sess_in"
    watch_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", watch_dir / "events.parquet")

    batch = session_aggregate(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        gap="30 minutes")
    stream = file_watcher_stream(spark, str(watch_dir), EVENTS_DDL)
    q = (session_aggregate(stream, gap="30 minutes",
                           watermark="1 minute")
         .writeStream.outputMode("complete").format("memory")
         .queryName("sess_out").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM sess_out")
        assert got.count() == batch.count()
        assert got.exceptAll(batch).count() == 0
        # every event lands in exactly one session
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert got.agg(F.sum("n_events")).first()[0] == n_events
    finally:
        q.stop()


def test_streaming_encode_banded_layout_and_replay(spark, tmp_path):
    """streaming_encode predates the banded default (VERDICT r4 #8):
    a micro-batch epoch must now emit BANDED blocks (parts/part_hi
    columns, spans > 1 part on hash-scattered input) whose union of
    parts is exactly the batch's content-derived part set, and the
    epoch-replay watermark must still make a replayed commit a no-op on
    that layout."""
    from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
    from eel_sdk_spark.encode import PART_COL, decode_blocks_df, with_part_id
    from eel_sdk_spark.streaming.pipeline import encode_epoch
    from eel_sdk_spark.table import ManifestTable

    tbl = ManifestTable(str(tmp_path), "stream_banded")
    batch = webtext_df(spark, 800, parts=4)
    assert encode_epoch(tbl, batch, 0, key="url", n_parts=8) is True

    blocks = spark.read.parquet(*tbl.current().files)
    assert {"parts", "part_hi"} <= set(blocks.columns)
    assert blocks.filter("part_hi != part_id").count() > 0  # truly banded
    got = {r["p"] for r in
           blocks.select(F.explode("parts").alias("p")).distinct().collect()}
    want = {r[0] for r in with_part_id(batch, "url", 8)
            .select(PART_COL).distinct().collect()}
    assert got == want  # exact parts, never range-filled

    # replayed epoch on the banded layout: no-op, no duplicate rows
    snap_before = tbl.current().snapshot_id
    assert encode_epoch(tbl, batch, 0, key="url", n_parts=8) is False
    assert tbl.current().snapshot_id == snap_before
    decoded = decode_blocks_df(tbl.read(spark), SCHEMA_DDL)
    assert decoded.count() == 800
    assert decoded.select("url").distinct().count() == 800


def test_streaming_incremental_dedup_epochs(spark, tmp_path):
    """Continuous corpus dedup: each epoch's batch is deduped against
    everything accepted so far (signature store grows per epoch);
    replayed epochs are no-ops on BOTH tables; and a crash between the
    survivor commit and the store commit recovers deterministically
    (out skips, store catches up with the published rows' signatures)."""
    from eel_sdk_spark.streaming.pipeline import dedup_epoch
    from eel_sdk_spark.table import ManifestTable

    out = ManifestTable(str(tmp_path), "accepted")
    store = ManifestTable(str(tmp_path), "sigstore")
    t1 = "the quick brown fox jumps over the lazy dog again today"
    t2 = "an entirely different second document with its own words"
    t3 = "a third document that only epoch two will deliver fresh"

    e0 = spark.createDataFrame([(1, t1), (2, t2), (3, t1)],
                               "doc_id bigint, text string")
    assert dedup_epoch(out, store, e0, 0) == 2  # 3 is an in-batch dup
    assert {r["doc_id"] for r in out.read(spark).collect()} == {1, 2}

    # epoch 1: one dup of the ACCEPTED corpus, one near-dup, one fresh
    e1 = spark.createDataFrame(
        [(10, t1), (11, t2 + "  "), (12, t3)],
        "doc_id bigint, text string")
    assert dedup_epoch(out, store, e1, 1) == 1
    assert {r["doc_id"] for r in out.read(spark).collect()} == {1, 2, 12}

    # replay of epoch 1: no-op everywhere
    snap_out = out.current().snapshot_id
    snap_store = store.current().snapshot_id
    assert dedup_epoch(out, store, e1, 1) == 0
    assert out.current().snapshot_id == snap_out
    assert store.current().snapshot_id == snap_store

    # store now holds exactly the accepted docs' signatures
    assert {r["doc_id"] for r in store.read(spark).collect()} == {1, 2, 12}

    # crash-recovery shape: the survivor commit lands but the process
    # dies BEFORE the store commit. Simulate exactly that by snapshotting
    # the store directory pre-epoch and restoring it post-epoch (commit
    # is atomic: a lost commit means neither files nor watermark).
    import shutil

    e2 = spark.createDataFrame([(20, "fresh words for the final epoch "
                                     "of this test here")],
                               "doc_id bigint, text string")
    pre = str(tmp_path / "sigstore_pre_crash")
    shutil.copytree(store.dir, pre)
    assert dedup_epoch(out, store, e2, 2) == 1
    shutil.rmtree(store.dir)
    shutil.copytree(pre, store.dir)  # store lost epoch 2; out kept it
    n = dedup_epoch(out, store, e2, 2)
    assert n == 1  # recomputed deterministically
    assert (out.read(spark).filter("doc_id = 20").count() == 1)  # no dup
    assert {r["doc_id"] for r in store.read(spark).collect()} \
        == {1, 2, 12, 20}  # store caught up with the published rows
    # param mismatch is rejected
    import pytest
    with pytest.raises(ValueError, match="not comparable"):
        dedup_epoch(out, store, e2, 3, n_hashes=4)


def test_streaming_incremental_dedup_writestream(spark, tmp_path):
    """The writeStream wrapper end-to-end over a real micro-batch
    stream: the second batch's cross-batch duplicates are dropped
    against the store grown by the first."""
    from eel_sdk_spark.streaming.pipeline import streaming_incremental_dedup

    pub = publisher_stream(spark, "doc_id bigint, text string",
                           str(tmp_path / "spool"))
    out = ManifestTable(str(tmp_path), "s_accepted")
    store = ManifestTable(str(tmp_path), "s_sigs")
    t1 = "streaming one quick brown fox jumps over the lazy dog here"
    t2 = "streaming two wholly different content for the second doc"
    pub.publish(spark.createDataFrame([(1, t1), (2, t2)],
                                      "doc_id bigint, text string"))
    q = streaming_incremental_dedup(
        pub.stream(), out, store,
        checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        assert out.read(spark).count() == 2
        pub.publish(spark.createDataFrame(
            [(10, t1), (11, "streaming three genuinely fresh words now "
                            "arriving in the later batch")],
            "doc_id bigint, text string"))
        q.processAllAvailable()
        got = {r["doc_id"] for r in out.read(spark).collect()}
        assert got == {1, 2, 11}  # 10 deduped against the grown store
    finally:
        q.stop()
        pub.close()


def test_compact_store_preserves_detection_and_shrinks(spark, tmp_path):
    """r6 (VERDICT r5 #5): N epoch appends -> compact_store -> the SAME
    probe batch flags the SAME doc set, with fewer files and no
    fp-duplicate rows; expiry drops whole old epochs file-exact."""
    from eel_sdk_spark.functions.dedup import incremental_dup_ids
    from eel_sdk_spark.streaming.pipeline import compact_store, dedup_epoch
    from eel_sdk_spark.table import ManifestTable

    out = ManifestTable(str(tmp_path), "acc")
    store = ManifestTable(str(tmp_path), "sigs")
    # per-doc unique shingles: no cross-doc near-dups, every epoch's
    # batch survives in full (the store really grows 4 epochs deep)
    texts = [f"alpha{e}{i} beta{e}{i} gamma{e}{i} delta{e}{i} "
             f"epsilon{e}{i} zeta{e}{i}"
             for e in range(4) for i in range(3)]
    for e in range(4):
        batch = spark.createDataFrame(
            [(e * 10 + i, texts[e * 3 + i]) for i in range(3)],
            "doc_id bigint, text string")
        dedup_epoch(out, store, batch, e)
    snap0 = store.current()
    files_before = len(snap0.files)
    assert files_before >= 4  # one file set per epoch

    probe = spark.createDataFrame(
        [(100, texts[0]), (101, texts[11]), (102, "wholly novel words "
                                                  "nothing shared here")],
        "doc_id bigint, text string")

    def flagged():
        return {r["doc_id"] for r in incremental_dup_ids(
            probe, store.read(spark), "text", "doc_id",
            within_batch=False).collect()}

    before = flagged()
    assert {100, 101} <= before and 102 not in before

    res = compact_store(spark, store)
    assert res["files_after"] < files_before
    assert res["rows_after"] <= res["rows_before"]
    # params + watermarks survive the overwrite
    props = store.current().properties
    assert "dedup_cfg" in props and "epoch.dedup" in props
    assert flagged() == before  # detection identical

    # expiry: drop epochs 0-1; their docs become undetectable, epoch 3
    # stays detected
    res2 = compact_store(spark, store, expire_before_epoch=2)
    after = flagged()
    assert 100 not in after and 101 in after
    # and another epoch can still append (cfg guard intact)
    e4 = spark.createDataFrame([(40, "a brand new epoch four doc "
                                     "arrives after compaction")],
                               "doc_id bigint, text string")
    assert dedup_epoch(out, store, e4, 4) == 1


def test_compact_store_unknown_epoch_rows_never_expire(spark, tmp_path):
    """ADVICE r6 (medium): files from commits that carried NO
    epoch.<stream_id> watermark must get a NULL store_epoch — never -1 —
    so expire_before_epoch can NEVER silently delete them. The sharp
    edge this pins: compacting with a WRONG stream_id used to map every
    file to -1 and expire the entire store."""
    from eel_sdk_spark.functions.dedup import incremental_dup_ids
    from eel_sdk_spark.streaming.pipeline import compact_store, dedup_epoch
    from eel_sdk_spark.table import ManifestTable

    out = ManifestTable(str(tmp_path), "acc")
    store = ManifestTable(str(tmp_path), "sigs")
    batch = spark.createDataFrame(
        [(1, "solo unique doc one words here"),
         (2, "another unique doc two words here")],
        "doc_id bigint, text string")
    dedup_epoch(out, store, batch, 7)  # watermark epoch.dedup = 7

    probe = spark.createDataFrame(
        [(100, "solo unique doc one words here")],
        "doc_id bigint, text string")

    def detected():
        return {r["doc_id"] for r in incremental_dup_ids(
            probe, store.read(spark), "text", "doc_id",
            within_batch=False).collect()}

    assert detected() == {100}
    # compact under a DIFFERENT stream id: no epoch.other watermark
    # exists, so every file's epoch is unknown -> rows must survive an
    # aggressive expire_before_epoch instead of being wiped
    res = compact_store(spark, store, expire_before_epoch=10_000,
                        stream_id="other")
    assert res["rows_expired"] == 0
    assert res["rows_after"] == res["rows_before"]
    assert detected() == {100}
    # and the persisted store_epoch column is NULL (not -1) for them
    eps = {r["store_epoch"]
           for r in store.read(spark).select("store_epoch").collect()}
    assert eps == {None}
