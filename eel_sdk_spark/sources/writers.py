"""Sink components -> ``df.write`` with the reference's writer knobs.

The reference opens N single-threaded writers draining a queue
(SinkAction.scala:12-101, ``to(sink, parallelism)``); here parallelism is
``repartition(n)`` so each task writes one file. Parquet dictionary/page/
codec knobs map to the same parquet-mr options eel sets
(RowParquetWriterFn.scala:34-52, ParquetWriterConfig.scala:18-31).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame


@dataclass
class _FileSink:
    path: str
    mode: str = "overwrite"
    parallelism: int | None = None
    partition_by: list[str] | None = None
    options: dict = field(default_factory=dict)

    FORMAT = ""

    def with_parallelism(self, n: int):
        """DataStream.to(sink, parallelism) — DataStream.scala:1011-1012."""
        return replace(self, parallelism=n)

    def with_partitioning(self, *cols: str):
        """HiveSink dynamic partitioning (HiveSinkWriter.scala:138-148) —
        beware hot partitions; pre-salt with encode.with_part_id if skewed."""
        return replace(self, partition_by=list(cols))

    def with_option(self, key: str, value):
        return replace(self, options={**self.options, key: str(value)})

    def write(self, df: DataFrame) -> None:
        if self.parallelism:
            df = df.repartition(self.parallelism)
        w = df.write.mode(self.mode).options(**self.options)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.format(self.FORMAT).save(self.path)


@dataclass
class ParquetSink(_FileSink):
    """ParquetSink.scala:13-73: dictionary toggle, codec, page/block size."""

    FORMAT = "parquet"

    def with_dictionary(self, enabled: bool):
        return self.with_option("parquet.enable.dictionary",
                                str(enabled).lower())

    def with_compression(self, codec: str):
        return self.with_option("compression", codec)

    def with_page_size(self, nbytes: int):
        return self.with_option("parquet.page.size", nbytes)

    def with_row_group_size(self, nbytes: int):
        return self.with_option("parquet.block.size", nbytes)

    def with_bloom_filters(self, cols: list[str],
                           ndv: int | None = None):
        """Parquet-native column bloom filters (the parquet twin of the
        reference ORC sink's bloomFilterColumns, OrcSink.scala:15-33;
        the ENGINE's own per-block key blooms in encode.py are the
        analogous skip for the encoded-block format). ``ndv`` sizes the
        filter to the expected distinct count."""
        s = self
        for c in cols:
            s = s.with_option(f"parquet.bloom.filter.enabled#{c}", "true")
            if ndv is not None:
                s = s.with_option(
                    f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
        return s


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32, path: str | None = None,
                   sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed table write: pre-shuffle once at WRITE time so every
    later equi-join/aggregation on ``bucket_cols`` between co-bucketed
    tables runs with ZERO exchange (plan-asserted in
    test_bucketed_join_no_shuffle). This is the big-fact-to-big-fact
    join answer at 100 TB — broadcast covers small dims, bucketing
    covers the joins where neither side fits in memory; the reference
    has no bucketing at all (its HivePartition layout is value-based
    only, HiveSinkWriter.scala:138-148). Spark requires the catalog for
    bucket metadata, hence ``saveAsTable`` (+ optional explicit
    ``path``)."""
    w = (df.write.mode(mode)
         .bucketBy(n_buckets, *bucket_cols)
         .sortBy(*(sort_cols or bucket_cols))
         .format("parquet"))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


@dataclass
class OrcSink(_FileSink):
    """OrcSink.scala:15-91: compression kind, bloom filters, stride."""

    FORMAT = "orc"

    def with_compression(self, kind: str):
        return self.with_option("compression", kind)

    def with_bloom_filters(self, *cols: str):
        return self.with_option("orc.bloom.filter.columns", ",".join(cols))

    def with_row_index_stride(self, stride: int):
        return self.with_option("orc.row.index.stride", stride)


class CsvSink(_FileSink):
    FORMAT = "csv"


class JsonSink(_FileSink):
    FORMAT = "json"


class AvroSink(_FileSink):
    FORMAT = "avro"


@dataclass
class JdbcSink:
    """JdbcSink.scala:28-50: batched inserts, N writer threads, optional
    create table. Spark's jdbc writer batches via ``batchsize`` and
    parallelizes one connection per partition (the reference's N
    single-threaded writers, JdbcSinkWriter.scala:11-32)."""

    url: str
    table: str
    properties: dict = field(default_factory=dict)
    batch_size: int = 1000
    parallelism: int | None = None
    mode: str = "append"

    def write(self, df: DataFrame) -> None:
        if self.parallelism:
            df = df.repartition(self.parallelism)
        df.write.mode(self.mode).jdbc(
            self.url, self.table,
            properties={"batchsize": str(self.batch_size), **self.properties})


class DevNullSink:
    """DevNullSink.scala — benchmark sink (noop datasource)."""

    def write(self, df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()
