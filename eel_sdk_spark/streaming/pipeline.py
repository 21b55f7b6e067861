"""Streaming pipelines: windowed aggregation and streaming encode.

``streaming_encode`` runs the SAME codec stage as batch (encode.py's
``_encode_batches`` via mapInArrow works unmodified on a streaming
DataFrame) — a continuously-arriving crawl encodes block groups per
micro-batch with exactly-once file output via foreachBatch + manifest
commits. This is the ingestion mode a 10^12-doc pipeline actually runs in:
batch encode is just the bounded special case.
"""

from __future__ import annotations

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
    blocks = encode_df(batch_df, key=key, n_parts=n_parts, profile=profile)
    job_dir = table.new_data_path()
    blocks.write.mode("overwrite").parquet(job_dir)
    table.commit(ManifestTable.list_written_files(job_dir),
                 BLOCK_SCHEMA_DDL, {f"epoch.{stream_id}": epoch_id},
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
