"""Source components -> ``spark.read`` plans with explicit pushdown knobs.

Construction mirrors the reference's fluent ``withX`` style; ``.load(spark)``
returns a DataFrame whose scan carries the projection/predicate (visible as
``PushedFilters`` / ``ReadSchema`` in ``.explain``) — what the reference
implements by hand per format (PARQUET_READ_SCHEMA RowParquetReaderFn.scala:43-48,
ORC include array OrcBatchIterator.scala:28-36, SARG OrcSource.scala:22-71).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

from .filepattern import FilePattern
from .inferrer import SchemaInferrer


@dataclass
class _FileSource:
    """Shared projection/predicate plumbing for file-based sources."""

    pattern: str
    projection: list[str] | None = None
    predicate: Column | None = None
    schema: T.StructType | None = None
    options: dict = field(default_factory=dict)

    FORMAT = ""

    def with_projection(self, *cols: str):
        """Reference: ParquetSource.withProjection (ParquetSource.scala:44-48)."""
        return replace(self, projection=list(cols))

    def with_predicate(self, predicate: Column):
        """Reference: ParquetSource.withPredicate (ParquetSource.scala:39-42) —
        Catalyst pushes the filter into the scan; no per-format compiler
        needed (SURVEY.md §2.8)."""
        return replace(self, predicate=predicate)

    def with_schema(self, schema: T.StructType):
        return replace(self, schema=schema)

    def with_option(self, key: str, value):
        return replace(self, options={**self.options, key: value})

    def paths(self) -> list[str]:
        return FilePattern(self.pattern).to_paths()

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.FORMAT).options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.load(self.pattern)
        if self.predicate is not None:
            df = df.filter(self.predicate)
        if self.projection:
            df = df.select(*self.projection)
        return df


class ParquetSource(_FileSource):
    """ParquetSource.scala:27-91. Footer-level stats without a data read:
    ``statistics`` mirrors Statistics(count, compressed, uncompressed)
    (ParquetSource.scala:58-75) from parquet metadata via pyarrow."""

    FORMAT = "parquet"

    def statistics(self) -> dict:
        import pyarrow.parquet as pq

        count = compressed = uncompressed = 0
        for p in self.paths():
            meta = pq.ParquetFile(p).metadata
            count += meta.num_rows
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                compressed += sum(g.column(c).total_compressed_size
                                  for c in range(g.num_columns))
                uncompressed += g.total_byte_size
        return {"count": count, "compressed": compressed,
                "uncompressed": uncompressed}


class OrcSource(_FileSource):
    """OrcSource.scala:22-71 (SARG + include-array pushdown are automatic)."""

    FORMAT = "orc"


class AvroSource(_FileSource):
    """AvroSource.scala:14-52 (needs spark-avro, bundled in pyspark 4)."""

    FORMAT = "avro"


@dataclass
class CsvSource(_FileSource):
    """CsvSource.scala:13-105: header modes, null value, skip rows,
    schema inference via SchemaInferrer regex rules on the header row."""

    FORMAT = "csv"
    header: bool = True
    null_value: str = ""
    inferrer: SchemaInferrer | None = None

    def load(self, spark: SparkSession) -> DataFrame:
        opts = {"header": str(self.header).lower(),
                "nullValue": self.null_value, **self.options}
        reader = spark.read.format("csv").options(**opts)
        schema = self.schema
        if schema is None and self.inferrer is not None:
            first = spark.read.options(**opts).csv(self.pattern).columns
            schema = self.inferrer.infer(first)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.load(self.pattern)
        if self.predicate is not None:
            df = df.filter(self.predicate)
        if self.projection:
            df = df.select(*self.projection)
        return df


class JsonSource(_FileSource):
    """JsonSource.scala:18-115 (json-lines, nested obj/array come free)."""

    FORMAT = "json"


@dataclass
class JdbcSource:
    """JdbcSource.scala:17-55 + partition strategies (SURVEY §2.1):
    RangePartitionStrategy -> partitionColumn/lowerBound/upperBound/
    numPartitions; Bucket/Hash strategies -> explicit ``predicates`` list
    (each predicate becomes one parallel publisher, exactly the reference's
    one-Publisher-per-bucket model, BucketPartitionStrategy.scala:9-26)."""

    url: str
    table: str
    properties: dict = field(default_factory=dict)
    fetch_size: int = 1000
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    predicates: list[str] | None = None

    def with_range_partitioning(self, column: str, lower: int, upper: int,
                                n: int) -> "JdbcSource":
        return replace(self, partition_column=column, lower_bound=lower,
                       upper_bound=upper, num_partitions=n)

    def with_bucket_partitioning(self, column: str,
                                 values: list) -> "JdbcSource":
        preds = [f"{column} = {v!r}" for v in values]
        return replace(self, predicates=preds)

    def with_hash_partitioning(self, hash_expr: str, n: int) -> "JdbcSource":
        preds = [f"({hash_expr}) % {n} = {k}" for k in range(n)]
        return replace(self, predicates=preds)

    def load(self, spark: SparkSession) -> DataFrame:
        props = {"fetchsize": str(self.fetch_size), **self.properties}
        if self.predicates:
            return spark.read.jdbc(self.url, self.table,
                                   predicates=self.predicates,
                                   properties=props)
        if self.partition_column:
            return spark.read.jdbc(
                self.url, self.table, column=self.partition_column,
                lowerBound=self.lower_bound, upperBound=self.upper_bound,
                numPartitions=self.num_partitions, properties=props)
        return spark.read.jdbc(self.url, self.table, properties=props)
