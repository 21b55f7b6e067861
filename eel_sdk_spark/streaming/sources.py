"""Streaming sources.

- ``file_watcher_stream``: the HdfsWatcher analogue (eel-core/.../hdfs/
  HdfsWatcher.scala polls a dir and fires callbacks per new file) —
  Structured Streaming's file source does the same with checkpointed
  exactly-once semantics.
- ``publisher_stream``: the DataStreamPublisher analogue
  (DataStreamPublisher.scala:17-50: publish/close/error by hand) — backed
  by a spool directory the caller drops parquet batches into.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def file_watcher_stream(spark: SparkSession, path: str,
                        schema: T.StructType | str,
                        fmt: str = "parquet",
                        max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (spark.readStream.format(fmt).schema(schema))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


class publisher_stream:
    """Manually-fed stream: ``publish(df)`` appends a batch, readers see it
    on the next micro-batch trigger. close() marks end of input (no more
    publishes; streaming query is stopped by the caller)."""

    def __init__(self, spark: SparkSession, schema: T.StructType | str,
                 spool_dir: str):
        self.spark = spark
        self.schema = schema
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.closed = False

    def stream(self, fmt: str = "parquet") -> DataFrame:
        return file_watcher_stream(self.spark, self.spool_dir, self.schema, fmt)

    def publish(self, df: DataFrame) -> None:
        if self.closed:
            raise RuntimeError("publisher closed")
        df.write.mode("append").parquet(
            os.path.join(self.spool_dir))

    def close(self) -> None:
        self.closed = True
