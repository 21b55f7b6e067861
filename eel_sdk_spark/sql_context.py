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

    def register_warehouse(self, name: str, warehouse: str,
                           table: str = "blocks", **options) -> None:
        """Expose an encoded ManifestTable to Spark SQL by name, through
        the ``eel`` DataSource (r8) — so ``ctx.sql("SELECT ... FROM
        docs")`` scans the warehouse with tombstones/renames/widenings
        resolved. ``options`` pass through (snapshot_id, ref,
        as_of_timestamp, columns, ...); direct ``FROM eel.`/path```
        SQL-on-files is not supported for Python data sources, which is
        exactly what this view registration covers."""
        from .sources.eel_datasource import register as _register_ds

        _register_ds(self.spark)
        r = self.spark.read.format("eel").option("table", table)
        for k, v in options.items():
            r = r.option(k, str(v))
        r.load(warehouse).createOrReplaceTempView(name)
        self._registered.append(name)

    def sql(self, query: str) -> DataStream:
        """SqlContext.sql (SqlContext.scala:23-27)."""
        return DataStream(self.spark.sql(query))

    def close(self) -> None:
        for name in self._registered:
            self.spark.catalog.dropTempView(name)
        self._registered.clear()
