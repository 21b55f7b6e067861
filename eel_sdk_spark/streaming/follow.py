"""Exactly-once incremental follower over encoded ManifestTables.

``follow_once`` turns the CDC surface (``ManifestTable.changes_between``
/ ``read_appended``) into a resumable materialized pipeline: each call
decodes ONLY the rows appended to the source since the consumer's
cursor, applies an optional transform, encodes the result into the sink
table, and advances the cursor — all in ONE atomic sink commit. The
cursor lives IN the sink's snapshot properties (``cdc.<consumer_id>``),
Kafka-Connect's offsets-in-destination pattern: output rows and the
offset that produced them commit together, so a crash at ANY point
either replays a window that never landed (no rows lost) or no-ops on a
window that did (no rows duplicated). The reference's streaming story
stops at at-least-once file watching (eel-core/.../HdfsWatcher.scala);
this is the idempotent incremental consumer a 10^12-doc crawl pipeline
actually schedules.

Scale notes: the per-poll work is bounded by the INCREMENT, never the
table — ``read_appended`` decodes only in-window files, and maintenance
(purge/upsert/compact) between polls re-emits nothing because rewrite
files are excluded by lineage classification, not by re-reading data.
A rival follower sharing the consumer id is detected by the commit-time
``expect_properties`` CAS (the loser raises :class:`CommitConflict`
and publishes nothing; its staged files are orphans for gc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..table import ManifestTable

__all__ = ["follow_once"]


def follow_once(spark, src: ManifestTable, sink: ManifestTable,
                schema_ddl: str | None = None,
                consumer_id: str = "follow",
                transform=None, key: str | None = None,
                n_parts: int | None = None, profile: str = "speed",
                include_rewrites: bool = False,
                bootstrap: str = "full",
                propagate_deletes: bool = False) -> dict:
    """One poll of the follower: process rows appended to ``src`` since
    this consumer's cursor into ``sink``, exactly once.

    First call (no ``cdc.<consumer_id>`` property on the sink)
    bootstraps per ``bootstrap``: ``"full"`` processes the entire
    current source table; ``"from_now"`` just pins the cursor at the
    current snapshot with a properties-only commit and emits nothing —
    the right first call on a 100 TB table whose history the consumer
    doesn't need (a full bootstrap there is a table copy). Subsequent
    calls use ``src.read_appended`` from the stored cursor. An
    increment that transforms to zero rows still advances the cursor
    with a properties-only commit (so a filter-everything window is
    not re-decoded forever). ``key``/``n_parts`` default to the
    source's encode lineage, like ``deletes.upsert_rows``.

    ``propagate_deletes=True`` additionally forwards the source
    tombstones ADDED in the window to the sink (metadata-only
    ``delete_rows`` per key spec), so a takedown chains through the
    replica instead of surviving in rows the follower already emitted
    — turn it on for GDPR-chained replicas. Deletes apply BEFORE the
    cursor commit: a crash between them replays them on the next poll
    (tombstones are idempotent for reads), never loses one. Default
    off for compatibility with transform-sinks whose rows no longer
    carry the source key.
    """
    if bootstrap not in ("full", "from_now"):
        raise ValueError(f"bootstrap must be 'full' or 'from_now', "
                         f"got {bootstrap!r}")
    from ..encode import BLOCK_SCHEMA_DDL, encode_df

    cur_src = src.current()
    if cur_src is None:
        return {"rows": 0, "cursor_from": None, "cursor_to": None,
                "bootstrap": False}
    if schema_ddl is None:
        schema_ddl = src.row_schema(cur_src)
    target = cur_src.snapshot_id

    sink_snap = sink.current()
    sink_props = sink_snap.properties if sink_snap else {}
    prop = f"cdc.{consumer_id}"
    cursor = sink_props.get(prop)
    cursor = int(cursor) if cursor is not None else None
    if cursor is not None and target <= cursor:
        return {"rows": 0, "cursor_from": cursor, "cursor_to": cursor,
                "bootstrap": False}

    if key is None or n_parts is None:
        runs = cur_src.properties.get("runs", [])
        last_run = runs[-1] if runs else {}
        key = key or last_run.get("key", "url")
        n_parts = n_parts or int(last_run.get("n_parts", 8))

    is_bootstrap = cursor is None
    if is_bootstrap and bootstrap == "from_now":
        sink.commit([], "", {prop: target}, mode="append",
                    expect_properties={prop: sink_props.get(prop)})
        return {"rows": 0, "cursor_from": None, "cursor_to": target,
                "bootstrap": True}
    n_deletes = 0
    if is_bootstrap:
        df = src.read_decoded(spark, schema_ddl, snapshot_id=target)
    else:
        if propagate_deletes:
            # forward the window's takedowns FIRST: a crash after this
            # but before the cursor commit replays them (idempotent),
            # the reverse order could lose one. Bootstrap reads already
            # exclude deleted rows, so only increments forward.
            from ..deletes import _entry_key, delete_rows

            ch = src.changes_between(cursor, target)
            for e in ch["tombstones_added"]:
                kdf = spark.read.parquet(*e["files"])
                out = delete_rows(spark, sink, kdf, key=_entry_key(e))
                n_deletes += out["deleted_keys"]
        df = src.read_appended(spark, schema_ddl, cursor,
                               include_rewrites=include_rewrites)
    if transform is not None:
        df = transform(df)
        if not isinstance(df, DataFrame):
            raise TypeError("follow_once: transform must return a "
                            "DataFrame")

    guard = {prop: sink_props.get(prop)}  # None == "must still be absent"
    df = df.cache()
    try:
        n_rows = df.count()
        if n_rows == 0:
            sink.commit([], "", {prop: target}, mode="append",
                        expect_properties=guard)
            return {"rows": 0, "cursor_from": cursor, "cursor_to": target,
                    "bootstrap": is_bootstrap, "deleted_keys": n_deletes}
        blocks = encode_df(df, key=key, n_parts=n_parts, profile=profile)
        job_dir = sink.new_data_path()
        blocks.write.mode("overwrite").parquet(job_dir)
        files = ManifestTable.list_written_files(job_dir)
        # the sink is a first-class encoded table: commit a run record
        # (lineage for prune tiers, CDC classification, and chained
        # followers adopting key/n_parts) and the row schema (so
        # read_decoded(schema_ddl=None)/row_schema() work on the sink),
        # exactly as append_encode does
        from ..checkpoint import _run_record
        from ..table import ddl_of

        rec = _run_record(spark, job_dir, files,
                          run_id=f"follow-{consumer_id}-{target}",
                          fingerprint=None, n_parts=n_parts, salt=1,
                          salt_by=None, key=key,
                          bloom_bits=getattr(blocks, "_eel_bloom_bits",
                                             None))
        # the cursor guard already detects rival FOLLOWERS; guarding
        # the runs list too keeps a rival APPENDER's lineage record
        # from being erased by this read-modify-write (r8 audit). On a
        # runs conflict the cursor is still ours — re-read and re-commit
        # the already-written files.
        from ..table import CommitConflict

        for _ in range(5):
            head = sink.current()
            sink_runs = head.properties.get("runs") if head else None
            try:
                sink.commit(files, BLOCK_SCHEMA_DDL,
                            {prop: target,
                             "runs": (sink_runs or [])
                             + ([rec] if rec else []),
                             "row_schema_ddl": ddl_of(df)},
                            mode="append",
                            expect_properties={**guard,
                                               "runs": sink_runs})
                break
            except CommitConflict:
                # distinguish: cursor moved (rival follower — stand
                # down, propagate) vs runs moved (rival appender —
                # retry); re-read decides
                now = sink.current()
                got = (now.properties if now else {}).get(prop)
                if got != guard[prop]:
                    raise
                continue
        else:
            raise CommitConflict(
                f"follow_once: sink {sink.dir} runs lineage kept "
                f"changing under 5 retries")
    finally:
        df.unpersist()
    return {"rows": n_rows, "deleted_keys": n_deletes,
            "cursor_from": cursor, "cursor_to": target,
            "bootstrap": is_bootstrap}
