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


def streaming_encode(stream_df: DataFrame, table, key: str = "url",
                     n_parts: int = 32,
                     checkpoint_dir: str | None = None,
                     profile: str = "speed"):
    """Encode a streaming webtext source into the blocks table.

    Each micro-batch runs the batch encode stage and lands one atomic
    manifest commit (foreachBatch = exactly-once against our snapshot
    pointer since commits are idempotent per epoch)."""
    from ..encode import BLOCK_SCHEMA_DDL, encode_df
    from ..table import ManifestTable

    assert isinstance(table, ManifestTable)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        blocks = encode_df(batch_df, key=key, n_parts=n_parts,
                           profile=profile)
        job_dir = table.new_data_path()
        blocks.write.mode("overwrite").parquet(job_dir)
        table.commit(ManifestTable.list_written_files(job_dir),
                     BLOCK_SCHEMA_DDL, {"epoch": epoch_id}, mode="append")

    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
