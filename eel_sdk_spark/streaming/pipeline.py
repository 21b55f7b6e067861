"""Streaming pipelines: windowed aggregation and streaming encode.

``streaming_encode`` runs the SAME codec stage as batch (encode.py's
``_encode_batches`` via mapInArrow works unmodified on a streaming
DataFrame) — a continuously-arriving crawl encodes block groups per
micro-batch with exactly-once file output via foreachBatch + manifest
commits. This is the ingestion mode a 10^12-doc pipeline actually runs in:
batch encode is just the bounded special case.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window), F.col(key_col))
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .select(F.col("window.start").alias("win_start"),
                    key_col, "n", "v"))


def streaming_dedup(stream_df: DataFrame, key: str = "url",
                    n_buckets: int = 64,
                    max_state_per_bucket: int = 1_000_000) -> DataFrame:
    """Custom stateful operator: exactly-once-per-key pass-through across
    micro-batches (drop documents whose key was already seen in the
    stream). The reference has no stateful streaming at all (SURVEY §2.9);
    this is the ``applyInPandasWithState`` pattern a crawl-ingest pipeline
    needs for online dedup.

    Scale shape: state is sharded by ``pmod(xxhash64(key), n_buckets)``
    (same content-derived sharding as the batch encoder), each shard holds
    a bounded set of seen 64-bit key hashes — memory is
    O(unique keys / buckets), not O(rows). ``max_state_per_bucket`` caps
    runaway state (oldest-hash eviction would go here; a real deployment
    sizes buckets from the checkpoint metrics instead)."""
    import pandas as pd

    schema = stream_df.schema
    out_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in schema.fields)

    def dedup_fn(bucket_key, pdf_iter, state):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            fresh = ~pdf["__kh"].isin(seen) & ~pdf["__kh"].duplicated()
            seen.update(pdf.loc[fresh, "__kh"].tolist())
            out = pdf.loc[fresh].drop(columns=["__kh", "__bucket"])
            if len(out):
                yield out
        kept = list(seen)
        if len(kept) > max_state_per_bucket:
            # evict an arbitrary subset down to the cap instead of skipping
            # the update (which would roll state back and forget the WHOLE
            # batch); dedup degrades gracefully for evicted keys only
            import sys

            print(f"streaming_dedup: bucket {bucket_key} state overflow "
                  f"({len(kept)} > {max_state_per_bucket}), evicting",
                  file=sys.stderr)
            kept = kept[:max_state_per_bucket]
        state.update((kept,))

    tagged = (stream_df
              .withColumn("__kh", F.xxhash64(F.col(key)))
              .withColumn("__bucket",
                          F.pmod(F.col("__kh"), F.lit(n_buckets))))
    return tagged.groupBy("__bucket").applyInPandasWithState(
        dedup_fn, out_ddl, "seen array<long>", "append",
        "NoTimeout")


def encode_epoch(table, batch_df: DataFrame, epoch_id: int, key: str,
                 n_parts: int, profile: str = "speed",
                 stream_id: str = "stream") -> bool:
    """One micro-batch encode+commit; returns False when the epoch was
    already committed (foreachBatch replay after failure) — the commit is
    skipped so replays cannot duplicate rows."""
    from ..encode import BLOCK_SCHEMA_DDL, encode_df
    from ..table import ManifestTable

    snap = table.current()
    props = snap.properties if snap else {}
    # one flat property key PER stream ("epoch.<stream_id>"): commit()
    # re-reads the current snapshot and shallow-merges top-level keys, so
    # two streams committing to one table can never erase each other's
    # watermark — a read-modify-write of a shared {"epochs": {...}} dict
    # built from a stale snapshot could (and re-enabled duplicate appends
    # on the other stream's next replay). Legacy "epochs" dicts from older
    # manifests are still honored on the read side.
    legacy = (props.get("epochs") or {}).get(stream_id, -1)
    last = max(int(props.get(f"epoch.{stream_id}", -1)), int(legacy))
    if epoch_id <= last:
        return False  # replayed epoch: its commit already landed
    if batch_df.isEmpty():
        return False
    from ..table import ddl_of

    blocks = encode_df(batch_df, key=key, n_parts=n_parts, profile=profile)
    job_dir = table.new_data_path()
    blocks.write.mode("overwrite").parquet(job_dir)
    table.commit(ManifestTable.list_written_files(job_dir),
                 BLOCK_SCHEMA_DDL, {f"epoch.{stream_id}": epoch_id,
                                    "row_schema_ddl": ddl_of(batch_df)},
                 mode="append")
    return True


def streaming_encode(stream_df: DataFrame, table, key: str = "url",
                     n_parts: int = 32,
                     checkpoint_dir: str | None = None,
                     profile: str = "speed",
                     stream_id: str = "stream"):
    """Encode a streaming webtext source into the blocks table.

    Each micro-batch runs the batch encode stage and lands one atomic
    manifest commit. Exactly-once: foreachBatch may REPLAY an epoch after
    a failure, so the sink keeps a per-stream epoch watermark in the
    manifest properties and skips any epoch already committed — without
    this, a replayed epoch would append its rows a second time."""
    from ..table import ManifestTable

    assert isinstance(table, ManifestTable)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        encode_epoch(table, batch_df, epoch_id, key=key, n_parts=n_parts,
                     profile=profile, stream_id=stream_id)

    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


#: signature-store row shape (see functions.dedup.signature_store)
def _sig_ddl(id_col: str, id_type: str, n_hashes: int) -> str:
    return (f"{id_col} {id_type}, fp string, "
            + ", ".join(f"sig_{i} string" for i in range(n_hashes)))


def dedup_epoch(out_table, store_table, batch_df: DataFrame,
                epoch_id: int, text_col: str = "text",
                id_col: str = "doc_id", stream_id: str = "dedup",
                n_hashes: int = 8, band_size: int = 2, shingle: int = 3,
                hash_family: str = "md5", max_bucket: int | None = 1000,
                verify_threshold: float | None = None) -> int:
    """One micro-batch of CONTINUOUS corpus dedup: drop batch docs that
    duplicate the already-accepted corpus (via its signature store),
    commit the survivors to ``out_table`` and their signatures to
    ``store_table`` — so the next epoch dedups against everything
    accepted so far. Returns the number of survivors committed (0 for a
    replayed or empty epoch).

    Exactly-once across foreachBatch replays: BOTH tables carry a
    per-stream epoch watermark and each commit is independently skipped
    when already landed. The commit ORDER is survivors-then-signatures:
    a crash between them replays into "output committed (skip), store
    behind (recompute + commit)" — and the recomputation is
    deterministic (md5/minhash content hashes, no RNG), so the store
    catches up with exactly the signatures of the rows already
    published. The store records its dedup parameters at first commit
    and rejects mismatched params later (signatures computed under
    different n_hashes/shingle are not comparable).

    Scale shape per epoch: the accepted corpus contributes ONLY its
    signature table (~100 B/doc); batch text never joins against stored
    text (see functions.dedup.incremental_dup_ids)."""
    from ..functions.dedup import incremental_dedup, signature_store
    from ..table import ManifestTable

    cfg = {"n_hashes": n_hashes, "band_size": band_size,
           "shingle": shingle, "hash_family": hash_family}
    ssnap = store_table.current()
    sprops = ssnap.properties if ssnap else {}
    prior = sprops.get("dedup_cfg")
    if prior is not None and prior != cfg:
        raise ValueError(
            f"dedup_epoch: store was built with {prior}, got {cfg} — "
            f"signatures under different parameters are not comparable")
    osnap = out_table.current()
    last_out = int((osnap.properties if osnap else {})
                   .get(f"epoch.{stream_id}", -1))
    last_store = int(sprops.get(f"epoch.{stream_id}", -1))
    if epoch_id <= min(last_out, last_store):
        return 0  # fully-committed epoch replayed
    if batch_df.isEmpty():
        return 0

    if ssnap and ssnap.files:
        store_df = store_table.read(batch_df.sparkSession)
    else:  # bootstrap: empty store with the right schema
        store_df = signature_store(batch_df.limit(0), text_col, id_col,
                                   n_hashes, shingle, hash_family)
    surv = incremental_dedup(
        batch_df, store_df, text_col, id_col, n_hashes=n_hashes,
        band_size=band_size, shingle=shingle, hash_family=hash_family,
        max_bucket=max_bucket, verify_threshold=verify_threshold)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in batch_df.schema.fields)
    n = surv.count()
    if epoch_id > last_out:
        job = out_table.new_data_path()
        surv.write.mode("overwrite").parquet(job)
        out_table.commit(ManifestTable.list_written_files(job), ddl,
                         {f"epoch.{stream_id}": epoch_id}, mode="append")
    if epoch_id > last_store:
        sigs = signature_store(surv, text_col, id_col, n_hashes,
                               shingle, hash_family)
        job = store_table.new_data_path()
        sigs.write.mode("overwrite").parquet(job)
        id_type = dict((f.name, f.dataType.simpleString())
                       for f in batch_df.schema.fields)[id_col]
        store_table.commit(
            ManifestTable.list_written_files(job),
            _sig_ddl(id_col, id_type, n_hashes),
            {"dedup_cfg": cfg, f"epoch.{stream_id}": epoch_id},
            mode="append")
    return n


def compact_store(spark, store_table, id_col: str = "doc_id",
                  expire_before_epoch: int | None = None,
                  stream_id: str = "dedup") -> dict:
    """Signature-store maintenance (r6, VERDICT r5 #5): N epoch commits
    leave one file set per epoch plus whatever fp-duplicate rows
    overlapping increments accumulated — at 10^12 docs the store would
    only ever grow. Rewrites the store as ONE deduped file set in a
    single atomic overwrite commit (same advisory-lock CAS every other
    committer uses, so a concurrent dedup_epoch serializes against it),
    carrying the dedup_cfg params record and every per-stream epoch
    watermark forward.

    ``expire_before_epoch`` drops rows committed at epochs strictly
    below it BEFORE the rewrite: files are epoch-aligned (each epoch
    commit contributed exactly one file set, recovered by walking the
    snapshot chain), so expiry is file-exact with zero row scans of the
    expired data. Expired content can be re-admitted by future batches
    — that is the point (aged-out content stops occupying store space);
    it is an explicit knob, never a default. Dup-detection against the
    surviving epochs is UNCHANGED: identical fp => identical signature
    row, so collapsing duplicates preserves every band key and every
    fingerprint (tested: N appends -> compact -> same flagged set)."""
    snap = store_table.current()
    if snap is None or not snap.files:
        return {"rows_before": 0, "rows_after": 0, "files_before": 0,
                "files_after": 0, "rows_expired": 0}
    # per-file epoch from the snapshot chain: each commit's NEW files
    # belong to the epoch watermark it carried. Compaction MERGES files
    # across epochs, which would lose this alignment — so the compacted
    # output persists a per-row ``store_epoch`` column (max sighting per
    # fp), making later expiry row-accurate on compacted stores too.
    chain = [snap]
    while chain[-1].parent_id is not None:
        chain.append(store_table.snapshot(chain[-1].parent_id))
    # Files from commits that carried NO epoch.<stream_id> watermark are
    # simply absent from the map, so their rows get a NULL store_epoch and
    # the never-expire guard below actually protects them (r6 wrote -1
    # here, which made the isNull branch dead code and let a mistyped
    # stream_id silently wipe the whole store — ADVICE r6 fix).
    epoch_of: dict[str, int] = {}
    prev: set = set()
    for s in reversed(chain):
        ep_raw = (s.properties or {}).get(f"epoch.{stream_id}")
        for f in set(s.files) - prev:
            if ep_raw is not None:
                epoch_of[os.path.basename(f)] = int(ep_raw)
        prev = set(s.files)
    from ..functions.dedup import dedupe_store_rows

    df = spark.read.option("mergeSchema", "true").parquet(*snap.files)
    if epoch_of:
        fmap = F.create_map(*[x for k, v in epoch_of.items()
                              for x in (F.lit(k), F.lit(int(v)))])
        file_ep = F.element_at(fmap, F.regexp_extract(
            F.input_file_name(), r"([^/]+?)(\?.*)?$", 1)).cast("long")
    else:
        file_ep = F.lit(None).cast("long")
    row_ep = (F.coalesce(F.col("store_epoch").cast("long"), file_ep)
              if "store_epoch" in df.columns else file_ep)
    df = df.withColumn("store_epoch", row_ep)
    rows_before = df.count()
    rows_expired = 0
    if expire_before_epoch is not None:
        # unknown-epoch rows (no chain record, no column) never expire;
        # -1 is grandfathered as "unknown" for stores compacted by the
        # r6 code, which persisted it in the store_epoch column
        df = df.filter(F.col("store_epoch").isNull()
                       | (F.col("store_epoch") == -1)
                       | (F.col("store_epoch") >= expire_before_epoch))
        rows_expired = rows_before - df.count()
    deduped = dedupe_store_rows(df, id_col)
    job = store_table.new_data_path()
    deduped.write.mode("overwrite").parquet(job)
    new_files = store_table.list_written_files(job)
    rows_after = (spark.read.parquet(*new_files).count()
                  if new_files else 0)
    props = snap.properties or {}
    carry = {k: v for k, v in props.items()
             if k == "dedup_cfg" or k.startswith("epoch.")}
    ddl = snap.schema_ddl
    if ddl and "store_epoch" not in ddl:
        ddl = ddl + ", store_epoch bigint"
    store_table.commit(new_files, ddl, carry, mode="overwrite")
    return {"rows_before": rows_before, "rows_after": rows_after,
            "files_before": len(snap.files), "files_after": len(new_files),
            "rows_expired": rows_expired}


def streaming_incremental_dedup(stream_df: DataFrame, out_table,
                                store_table, text_col: str = "text",
                                id_col: str = "doc_id",
                                checkpoint_dir: str | None = None,
                                stream_id: str = "dedup", **kwargs):
    """writeStream wrapper over :func:`dedup_epoch` — the continuous
    crawl-ingest dedup loop: every arriving micro-batch is deduped
    against everything accepted so far, survivors land in ``out_table``
    and the store grows by exactly their signatures."""
    from ..table import ManifestTable

    assert isinstance(out_table, ManifestTable)
    assert isinstance(store_table, ManifestTable)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_epoch(out_table, store_table, batch_df, epoch_id,
                    text_col=text_col, id_col=id_col,
                    stream_id=stream_id, **kwargs)

    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def session_aggregate(events: DataFrame, ts_col: str = "ts",
                      key_col: str = "user_id", gap: str = "30 minutes",
                      watermark: str | None = None,
                      value_col: str = "value") -> DataFrame:
    """Gap-based session windows via Spark's native session_window —
    the streaming-capable twin of the batch lag/cumsum sessionization:
    works identically on a bounded DataFrame and on readStream input
    (state merged incrementally; pass ``watermark`` for streaming so
    closed sessions can be emitted and state dropped)."""
    e = events
    if watermark:
        e = e.withWatermark(ts_col, watermark)
    return (e.groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                      F.col(key_col))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(value_col), 2).alias("sv"))
            .select(key_col,
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sv"))
