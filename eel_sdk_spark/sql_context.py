"""SQL entry point.

The reference spills DataStreams into an embedded H2 database and delegates
SQL to it wholesale (SqlContext.scala:9-28, `eel.sqlContext.*` config).
Spark's own SQL engine is the strictly-superior replacement: register, run
Catalyst, get a DataFrame back — no spill, full pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .ops import DataStream


class SqlContext:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._registered: list[str] = []

    def register_frame(self, name: str, ds: DataStream | DataFrame) -> None:
        """SqlContext.registerFrame (SqlContext.scala:15-21)."""
        df = ds.df if isinstance(ds, DataStream) else ds
        df.createOrReplaceTempView(name)
        self._registered.append(name)

    def sql(self, query: str) -> DataStream:
        """SqlContext.sql (SqlContext.scala:23-27)."""
        return DataStream(self.spark.sql(query))

    def close(self) -> None:
        for name in self._registered:
            self.spark.catalog.dropTempView(name)
        self._registered.clear()
