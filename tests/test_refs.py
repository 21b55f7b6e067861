"""Named refs: tags + staged write-audit-publish lines (table.py).

`commit(stage=...)` writes a snapshot that main readers cannot see;
`publish` fast-forwards the main pointer onto it atomically (CAS'd
against rival main commits inside the lock); `tag` pins immutable
points; `expire_snapshots` keeps everything reachable from a ref.
Iceberg's WAP pattern (wap.id staged snapshots + cherry-pick
validation) re-expressed on the jar-free manifest layer; the reference
has no snapshot story at all (write-once HiveSink.scala).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.checkpoint import encode_with_checkpoint, fsck, \
    fsck_summary
from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
from eel_sdk_spark.encode import BLOCK_SCHEMA_DDL, encode_df
from eel_sdk_spark.table import CommitConflict, ManifestTable


def _mk(spark, tmp_path, n=1500, parts=3):
    df = webtext_df(spark, n, parts=parts).cache()
    df.count()
    tbl = ManifestTable(str(tmp_path), "t")
    encode_with_checkpoint(spark, df, tbl, n_parts=parts, run_id="r1")
    return df, tbl


def _stage(spark, tbl, df, ref, parts=3):
    blocks = encode_df(df, key="url", n_parts=parts)
    job_dir = tbl.new_data_path()
    blocks.write.mode("overwrite").parquet(job_dir)
    return tbl.commit(ManifestTable.list_written_files(job_dir),
                      BLOCK_SCHEMA_DDL, stage=ref)


def _fresh(spark, n, tag):
    return (webtext_df(spark, n, parts=1)
            .withColumn("url", F.concat(F.lit(f"https://{tag}.example/"),
                                        F.col("url"))))


def test_write_audit_publish_roundtrip(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path)
    head = tbl.current().snapshot_id

    staged = _stage(spark, tbl, _fresh(spark, 40, "wap"), "audit-1")
    # invisible to main readers, readable via the ref
    assert tbl.current().snapshot_id == head
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 1500
    assert staged.snapshot_id == tbl.resolve_ref("audit-1")
    assert tbl.read_decoded(spark, SCHEMA_DDL,
                            snapshot_id=staged.snapshot_id).count() == 1540

    # the audit half: fsck the staged snapshot before anyone sees it
    rep = fsck_summary(fsck(spark, tbl, snapshot_id=staged.snapshot_id))
    assert rep["healthy"]

    out = tbl.publish("audit-1")
    assert out.snapshot_id == staged.snapshot_id
    assert tbl.current().snapshot_id == staged.snapshot_id
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 1540
    assert "audit-1" not in tbl.refs()
    df.unpersist()


def test_publish_conflict_on_rival_main_commit(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path)
    _stage(spark, tbl, _fresh(spark, 10, "wap"), "audit-1")

    # a rival lands on main after the fork: publish must refuse
    blocks = encode_df(_fresh(spark, 5, "rival"), key="url", n_parts=3)
    job_dir = tbl.new_data_path()
    blocks.write.mode("overwrite").parquet(job_dir)
    tbl.commit(ManifestTable.list_written_files(job_dir), BLOCK_SCHEMA_DDL)

    with pytest.raises(CommitConflict):
        tbl.publish("audit-1")
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 1505

    # re-stage on the new main and publish cleanly
    tbl.drop_ref("audit-1")
    _stage(spark, tbl, _fresh(spark, 10, "wap"), "audit-2")
    tbl.publish("audit-2")
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 1515
    df.unpersist()


def test_multi_commit_staged_line_and_unique_ids(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path)
    s1 = _stage(spark, tbl, _fresh(spark, 7, "a"), "line")
    s2 = _stage(spark, tbl, _fresh(spark, 8, "b"), "line")  # chains on s1
    assert s2.parent_id == s1.snapshot_id
    # ids stay globally unique even when main commits interleave
    blocks = encode_df(_fresh(spark, 3, "m"), key="url", n_parts=3)
    job_dir = tbl.new_data_path()
    blocks.write.mode("overwrite").parquet(job_dir)
    m = tbl.commit(ManifestTable.list_written_files(job_dir),
                   BLOCK_SCHEMA_DDL)
    assert len({s1.snapshot_id, s2.snapshot_id, m.snapshot_id}) == 3
    df.unpersist()


def test_tag_pins_through_expiry_and_drop_releases(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path)
    v1 = tbl.current().snapshot_id
    tbl.tag("train-v1")
    with pytest.raises(ValueError):
        tbl.tag("train-v1")  # write-once

    # overwrite main twice, then expire keeping only the newest
    for i in range(2):
        blocks = encode_df(webtext_df(spark, 500, parts=2), key="url",
                           n_parts=2)
        job_dir = tbl.new_data_path()
        blocks.write.mode("overwrite").parquet(job_dir)
        tbl.commit(ManifestTable.list_written_files(job_dir),
                   BLOCK_SCHEMA_DDL, mode="overwrite")
    tbl.expire_snapshots(keep_last=1)
    # the tagged snapshot survived and reads row-exact
    assert tbl.read_decoded(spark, SCHEMA_DDL,
                            snapshot_id=v1).count() == 1500
    assert tbl.refs() == {"train-v1": v1}

    tbl.drop_ref("train-v1")
    out = tbl.expire_snapshots(keep_last=1)
    assert out["expired_snapshots"] >= 1
    with pytest.raises(FileNotFoundError):
        tbl.snapshot(v1)
    df.unpersist()


def test_abandoned_stage_is_garbage_collected(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path)
    staged = _stage(spark, tbl, _fresh(spark, 9, "junk"), "bad-audit")
    staged_only = [f for f in staged.files
                   if f not in set(tbl.current().files)]
    assert staged_only
    tbl.expire_snapshots(keep_last=1)  # ref still pins the line
    assert all(os.path.exists(f) for f in staged_only)

    tbl.drop_ref("bad-audit")
    tbl.expire_snapshots(keep_last=1)
    assert not any(os.path.exists(f) for f in staged_only)
    with pytest.raises(FileNotFoundError):
        tbl.snapshot(staged.snapshot_id)
    df.unpersist()


def test_follower_sees_published_rows_exactly_once(spark, tmp_path):
    from eel_sdk_spark.streaming.follow import follow_once

    df, tbl = _mk(spark, tmp_path)
    sink = ManifestTable(str(tmp_path), "sink")
    follow_once(spark, tbl, sink, SCHEMA_DDL)

    _stage(spark, tbl, _fresh(spark, 12, "wap"), "audit-1")
    out = follow_once(spark, tbl, sink, SCHEMA_DDL)
    assert out["rows"] == 0  # staged rows are NOT visible downstream

    tbl.publish("audit-1")
    out2 = follow_once(spark, tbl, sink, SCHEMA_DDL)
    assert out2["rows"] == 12  # exactly once, after the audit passed
    assert sink.read_decoded(spark, SCHEMA_DDL).count() == 1512
    df.unpersist()


def test_append_encode_lineage_and_cdc(spark, tmp_path):
    from eel_sdk_spark.checkpoint import append_encode

    df, tbl = _mk(spark, tmp_path)
    cursor = tbl.current().snapshot_id
    inc = _fresh(spark, 25, "daily")
    run = append_encode(spark, inc, tbl, run_id="daily-1")
    assert run["n_rows"] == 25
    assert run["n_parts"] == 3  # adopted from the table's lineage

    # lineage-recorded appends classify as NEW DATA, not unclassified
    ch = tbl.changes_between(cursor)
    assert ch["new_data_files"] and not ch["unclassified_files"]
    assert tbl.read_appended(spark, SCHEMA_DDL, cursor).count() == 25
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 1525

    with pytest.raises(ValueError):
        append_encode(spark, inc, tbl, n_parts=7)  # param mismatch
    with pytest.raises(ValueError):
        append_encode(spark, inc, tbl, key="text")
    df.unpersist()


def test_staged_encode_kill_and_resume_on_ref_line(spark, tmp_path):
    df, tbl = _mk(spark, tmp_path, n=1200, parts=6)
    main_head = tbl.current().snapshot_id

    inc = _fresh(spark, 300, "staged").cache()
    inc.count()
    r1 = encode_with_checkpoint(spark, inc, ManifestTable(
        str(tmp_path), "t2"), n_parts=6, run_id="s1",
        fail_after_commit_parts=2, stage="audit")
    t2 = ManifestTable(str(tmp_path), "t2")
    assert len(r1["part_ids"]) == 2
    assert t2.current() is None  # staged line never touched main

    # resume completes on the ref line, skipping the committed parts
    r2 = encode_with_checkpoint(spark, inc, t2, n_parts=6, run_id="s2",
                                stage="audit")
    assert set(r1["part_ids"]).isdisjoint(r2["part_ids"])
    assert len(r1["part_ids"]) + len(r2["part_ids"]) == 6
    t2.publish("audit")
    assert t2.read_decoded(spark, SCHEMA_DDL).count() == 300
    got = {r["url"] for r in
           t2.read_decoded(spark, SCHEMA_DDL).select("url").collect()}
    want = {r["url"] for r in inc.select("url").collect()}
    assert got == want  # no dupes, no gaps across the staged resume
    inc.unpersist()
    df.unpersist()
    assert tbl.current().snapshot_id == main_head


def test_staged_upsert_audits_then_publishes(spark, tmp_path):
    from eel_sdk_spark.deletes import upsert_rows

    df, tbl = _mk(spark, tmp_path)
    victims = [r["url"] for r in df.select("url").limit(3).collect()]
    incoming = (df.filter(F.col("url").isin(victims))
                .withColumn("text", F.lit("recrawl")))
    out = upsert_rows(spark, tbl, incoming, SCHEMA_DDL, stage="merge-1")
    assert out["replaced_rows"] == 3
    # main is untouched until publish
    assert (tbl.read_decoded(spark, SCHEMA_DDL)
            .filter(F.col("text") == "recrawl").count() == 0)
    rep = fsck_summary(fsck(spark, tbl,
                            snapshot_id=tbl.resolve_ref("merge-1")))
    assert rep["healthy"]
    tbl.publish("merge-1")
    read = tbl.read_decoded(spark, SCHEMA_DDL).cache()
    assert read.filter(F.col("text") == "recrawl").count() == 3
    assert read.count() == 1500
    assert read.groupBy("url").count().filter("count > 1").count() == 0
    read.unpersist()
    df.unpersist()


def test_staged_compact_and_staged_purge(spark, tmp_path):
    from eel_sdk_spark.deletes import delete_rows, purge_deletes

    df, tbl = _mk(spark, tmp_path)
    n_main = len(tbl.current().files)

    out = tbl.compact(spark, n_files=2, stage="maint")
    assert len(tbl.current().files) == n_main  # main untouched
    assert len(out.files) <= 2 * 2  # n_files per partition-write cap
    tbl.publish("maint")
    read = tbl.read_decoded(spark, SCHEMA_DDL)
    assert read.count() == 1500

    victims = [r["url"] for r in read.select("url").limit(2).collect()]
    delete_rows(spark, tbl, victims, key="url")
    p = purge_deletes(spark, tbl, SCHEMA_DDL, stage="erasure-1")
    assert p["purged_keys"] == 2
    # main still carries the tombstones (suppressed, not yet purged)
    assert tbl.current().properties.get("tombstones")
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 1498
    tbl.publish("erasure-1")
    assert not tbl.current().properties.get("tombstones")
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 1498
    df.unpersist()


def test_read_by_ref_and_age_based_expiry(spark, tmp_path):
    import time as _time

    df, tbl = _mk(spark, tmp_path, n=800, parts=2)
    v1 = tbl.current().snapshot_id
    tbl.tag("train-v1")

    blocks = encode_df(_fresh(spark, 20, "later"), key="url", n_parts=2)
    job_dir = tbl.new_data_path()
    blocks.write.mode("overwrite").parquet(job_dir)
    tbl.commit(ManifestTable.list_written_files(job_dir), BLOCK_SCHEMA_DDL)

    # read the pinned version by NAME (no snapshot id bookkeeping)
    got = tbl.read_decoded(spark, SCHEMA_DDL, ref="train-v1")
    assert got.count() == 800
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 820
    with pytest.raises(ValueError, match="ONE of"):
        tbl.read_decoded(spark, SCHEMA_DDL, ref="train-v1", snapshot_id=v1)

    # age-based retention: everything is younger than an hour, so an
    # older_than_s=3600 expiry keeps BOTH snapshots despite keep_last=1
    out = tbl.expire_snapshots(keep_last=1, older_than_s=3600)
    assert out["expired_snapshots"] == 0
    assert tbl.snapshot(v1).snapshot_id == v1
    # a zero-second horizon falls back to the keep_last floor (+ refs)
    tbl.drop_ref("train-v1")
    out2 = tbl.expire_snapshots(keep_last=1, older_than_s=0)
    assert out2["expired_snapshots"] == 1
    with pytest.raises(FileNotFoundError):
        tbl.snapshot(v1)
    df.unpersist()


def test_snapshot_as_of_timestamp(spark, tmp_path):
    """Iceberg-style as-of-timestamp reads: the newest snapshot at or
    before ts on MAIN's parent chain (staged commits never leak in)."""
    import time

    from eel_sdk_spark.checkpoint import append_encode, encode_with_checkpoint
    from eel_sdk_spark.corpus import webtext_df

    tbl = ManifestTable(str(tmp_path), "asof")
    encode_with_checkpoint(spark, webtext_df(spark, 300, parts=1), tbl,
                           n_parts=2, run_id="r1")
    t1 = time.time()
    time.sleep(0.05)
    inc = (webtext_df(spark, 400, parts=1)
           .exceptAll(webtext_df(spark, 300, parts=1)))
    append_encode(spark, inc, tbl, run_id="r2", stage="audit")  # staged
    append_encode(spark, inc, tbl, run_id="r3")                 # main
    assert tbl.read_decoded(spark, as_of=t1).count() == 300
    assert tbl.read_decoded(spark, as_of=time.time()).count() == 400
    # ISO form, and the mutually-exclusive guard
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(t1, tz=timezone.utc).isoformat()
    assert tbl.snapshot_as_of(iso).snapshot_id \
        == tbl.snapshot_as_of(t1).snapshot_id
    with pytest.raises(ValueError, match="ONE of"):
        tbl.read_decoded(spark, snapshot_id=1, as_of=t1)
    with pytest.raises(FileNotFoundError, match="younger"):
        tbl.snapshot_as_of(t1 - 1e6)
    # datasource option rides the same resolution
    from eel_sdk_spark.sources.eel_datasource import register

    register(spark)
    assert (spark.read.format("eel").option("table", "asof")
            .option("as_of_timestamp", str(t1)).load(str(tmp_path))
            .count() == 300)


def test_rollback_to_ancestor(spark, tmp_path):
    """rollback() reverts main to an ancestor's exact state as a NEW
    commit: files, schema, tombstones, lineage all revert; the bad
    commit stays time-travel-readable; non-ancestors refused."""
    from eel_sdk_spark.checkpoint import append_encode, encode_with_checkpoint
    from eel_sdk_spark.corpus import webtext_df
    from eel_sdk_spark.deletes import delete_rows

    tbl = ManifestTable(str(tmp_path), "rb")
    encode_with_checkpoint(spark, webtext_df(spark, 300, parts=1), tbl,
                           n_parts=2, run_id="r1")
    good = tbl.current().snapshot_id
    inc = (webtext_df(spark, 400, parts=1)
           .exceptAll(webtext_df(spark, 300, parts=1)))
    append_encode(spark, inc, tbl, run_id="bad-append")
    url = webtext_df(spark, 1, parts=1).first()["url"]
    delete_rows(spark, tbl, [url])
    bad = tbl.current().snapshot_id
    assert tbl.read_decoded(spark).count() == 399

    healed = tbl.rollback(good)
    assert healed.parent_id == bad  # append-only history
    assert tbl.read_decoded(spark).count() == 300  # delete reverted too
    assert not tbl.current().properties.get("tombstones")
    assert tbl.current().properties["rollback_of"] == bad
    # the bad line is still snapshot-readable (until expiry)
    assert tbl.read_decoded(spark, snapshot_id=bad).count() == 399
    # idempotent on the same target
    assert tbl.rollback(healed.snapshot_id).snapshot_id \
        == healed.snapshot_id
    # ...and rolling back the rollback restores the bad line (bad IS
    # an ancestor of the healed head)
    assert tbl.rollback(bad).properties["rollback_of"] \
        == healed.snapshot_id
    assert tbl.read_decoded(spark).count() == 399
    # a STAGED snapshot is off this line of history: refused
    inc2 = (webtext_df(spark, 450, parts=1)
            .exceptAll(webtext_df(spark, 400, parts=1)))
    append_encode(spark, inc2, tbl, run_id="st", stage="side")
    staged = tbl.resolve_ref("side")
    with pytest.raises(ValueError, match="not an ancestor"):
        tbl.rollback(staged)
