"""The eel DataStream operator surface, re-expressed on Spark DataFrames.

Every public method mirrors an operator of the reference's lazy stream
algebra (eel-core/src/main/scala/io/eels/datastream/DataStream.scala —
cites per method) but compiles to a declarative DataFrame op so Catalyst
gets pushdown/pruning/join-planning for free (SURVEY.md §4: the reference
hand-plumbs these). Operators the reference lacks (outer joins, sort,
distinct, window ranks, rollup/cube) are included as free upgrades —
`how=` parameters and thin passthroughs.

Order-dependent operators (drop/takeWhile/sample-every-k/concat-zip) need
an explicit ordering to be well-defined on a distributed engine; they take
an ``order_by`` argument and are implemented with window functions instead
of relying on stream arrival order (the reference's single-JVM semantics,
DataStream.scala:200-238, cannot scale and is under-defined under
parallel parts anyway).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by) -> list:
    if isinstance(order_by, (list, tuple)):
        return list(order_by)
    return [order_by]


def with_global_index(df: DataFrame, order_by, idx_col: str = "__rn",
                      n_partitions: int | None = None) -> DataFrame:
    """Global 1-based row number under ``order_by`` WITHOUT a single-task
    global sort (the zipWithIndex pattern, declaratively):

    1. range-partition on the sort key (parallel sampling exchange);
    2. per-range-partition row counts (a tiny aggregate);
    3. cumulative offsets (a window over n_partitions COUNT rows — constant
       bytes) broadcast-joined back; row_number runs per partition.

    Every data-sized stage is parallel — ``Window.orderBy`` with no
    partitionBy would move the entire dataset into ONE task, which is
    correct at test scale and a scale-killer at 100x. Range partitioning
    keeps equal keys in one partition, so tie behaviour matches the
    single-window plan.

    The range exchange feeds both the counts aggregate and the main
    branch, and range-boundary *sampling is not deterministic across
    executions* — if the two branches each ran their own exchange they
    could disagree on partition boundaries and the index would silently
    gain duplicates and gaps. Spark's static ReuseExchange rule does NOT
    deduplicate this plan (only AQE's runtime stage cache does), so we
    must not rely on it: the ranged frame is materialized ONCE with
    ``localCheckpoint(eager=False)`` and both branches read the same
    stored blocks. This is correct under any combination of
    ``spark.sql.adaptive.enabled`` / ``spark.sql.exchange.reuse``, at the
    cost of one materialization — the honest price of a global-order
    operator (the blocks are freed by the ContextCleaner when the frame
    is garbage collected).
    """
    cols = _order_cols(order_by)
    spark = df.sparkSession
    if n_partitions is None:
        try:
            n_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # "auto" under some AQE configs
            n_partitions = 32
    ranged = (df.repartitionByRange(n_partitions, *cols)
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=False))
    sizes = ranged.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    w_off = (Window.orderBy("__pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offs = sizes.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"))
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (ranged.join(F.broadcast(offs), "__pid")
            .withColumn(idx_col, F.row_number().over(w) + F.col("__off"))
            .drop("__pid", "__off"))


def as_of_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str,
               tolerance_us: int | None = None) -> DataFrame:
    """As-of join: for every left row, the LATEST right row with the same
    key and ``right_ts <= left_ts`` (left-outer: no match -> nulls). The
    reference has no such operator (SURVEY §2.4 'as-of joins: absent');
    Spark lacks it natively too.

    Scale shape: NOT a range join (no interval explosion, no O(n*m)
    per-key blowup) — both sides union into one frame tagged by side, one
    hash shuffle on the key, and a running ``last(ignorenulls)`` window
    carries the most recent right payload forward onto each left row. At
    equal timestamps the right row sorts first, so exact-tie matches are
    included (ASOF ``>=`` semantics, same as DuckDB's ASOF JOIN).

    ``tolerance_us``: matches older than this many microseconds are
    nulled out (the pandas ``merge_asof`` tolerance semantic).
    """
    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c != on]
    l2 = left.select(
        F.col(on), F.col(left_ts).alias("__ats"), F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in rcols])
    r2 = right.select(
        F.col(on), F.col(right_ts).alias("__ats"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in rcols])
    u = l2.unionByName(r2)
    w = (Window.partitionBy(on).orderBy("__ats", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        "*", *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
               for c in rcols])
    out = filled.filter(F.col("__side") == 1)
    if tolerance_us is not None:
        ts_col = next(c for c in rcols if c == right_ts)
        age = (F.unix_micros(F.col("__ats").cast("timestamp"))
               - F.unix_micros(F.col(f"__f_{ts_col}").cast("timestamp")))
        within = F.col(f"__f_{ts_col}").isNotNull() & (age <= tolerance_us)
        out = out.select(
            on, "__ats", "__side", *lcols,
            *[F.when(within, F.col(f"__f_{c}")).otherwise(F.lit(None))
              .alias(f"__f_{c}") for c in rcols])
    return out.select(
        F.col(on), F.col("__ats").alias(left_ts), *lcols,
        *[F.col(f"__f_{c}").alias(c) for c in rcols])


def range_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
               start_col: str, end_col: str,
               bucket: str = "20 minutes") -> DataFrame:
    """Interval containment join (left.ts BETWEEN right.start AND
    right.end, inclusive), equi-key on ``on`` — the second join the
    reference lacks (SURVEY §2.4 'range joins: absent') and Spark would
    otherwise plan as a per-key nested loop.

    Scale shape: time is bucketized at ``bucket`` width; each right
    interval explodes into the buckets it covers (intervals/bucket_width
    rows — bounded, not O(rows)); the join is then a plain equi-join on
    (key, bucket) plus the residual BETWEEN filter. Each left row lives in
    exactly ONE bucket, so a matching interval meets it exactly once — no
    dedup pass needed."""
    w_us = F.lit(_interval_us(bucket))
    l_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    l2 = left.withColumn("__b", F.floor(l_us / w_us))
    r2 = (right
          # malformed intervals (end < start) can never match, but
          # sequence(bs, be) would run DESCENDING over them — worst case
          # a corrupt epoch explodes millions of bucket rows and OOMs the
          # task. Drop them before the explode.
          .filter(s_us <= e_us)
          .withColumn("__bs", F.floor(s_us / w_us))
          .withColumn("__be", F.floor(e_us / w_us))
          .withColumn("__b", F.explode(F.sequence("__bs", "__be")))
          .drop("__bs", "__be"))
    joined = l2.join(r2, [on, "__b"])
    resid = ((F.unix_micros(F.col(ts_col).cast("timestamp"))
              >= F.unix_micros(F.col(start_col).cast("timestamp")))
             & (F.unix_micros(F.col(ts_col).cast("timestamp"))
                <= F.unix_micros(F.col(end_col).cast("timestamp"))))
    return joined.filter(resid).drop("__b")


def _interval_us(spec: str) -> int:
    n, unit = spec.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(n) * mult * 1_000_000


class DataStream:
    """Fluent wrapper; ``.df`` exposes the underlying DataFrame at any point."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- construction ------------------------------------------------------
    @staticmethod
    def from_df(df: DataFrame) -> "DataStream":
        return DataStream(df)

    # -- schema ops (DataStream.scala:450-513, 590-599, 95-106) -----------
    def projection(self, *cols: str) -> "DataStream":
        """DataStream.scala:705-733 (projection / projectionExpression)."""
        return DataStream(self.df.select(*cols))

    def remove_field(self, *names: str,
                     case_sensitive: bool = True) -> "DataStream":
        """DataStream.scala:464-513 (removeField/dropField variants, incl.
        the case-insensitive and if-exists forms: Spark's drop silently
        ignores missing columns, which IS dropFieldIfExists)."""
        if not case_sensitive:
            lowered = {n.lower() for n in names}
            names = tuple(c for c in self.df.columns if c.lower() in lowered)
        return DataStream(self.df.drop(*names))

    def remove_fields_regex(self, pattern: str) -> "DataStream":
        """StructType.removeFields(regex) — schema.scala:241-245."""
        import re

        keep = [c for c in self.df.columns if not re.fullmatch(pattern, c)]
        return DataStream(self.df.select(*keep))

    def rename_field(self, old: str, new: str) -> "DataStream":
        """DataStream.scala:450-459."""
        return DataStream(self.df.withColumnRenamed(old, new))

    def add_field(self, name: str, col: Column,
                  error_if_exists: bool = False) -> "DataStream":
        """DataStream.scala:774-854 (addField w/ constant, fn or expression)."""
        if error_if_exists and name in self.df.columns:
            raise ValueError(f"field {name!r} already exists")
        return DataStream(self.df.withColumn(name, col))

    def replace_field_type(self, name: str, new_type: str) -> "DataStream":
        """DataStream.scala:868-885 — here with a real cast of the values."""
        return DataStream(self.df.withColumn(name, F.col(name).cast(new_type)))

    def replace_field_type_regex(self, pattern: str,
                                 new_type: str) -> "DataStream":
        """DataStream.scala:344-354 (replaceFieldType(regex, dt)): re-type
        every column whose name matches."""
        import re

        df = self.df
        for c in df.columns:
            if re.fullmatch(pattern, c):
                df = df.withColumn(c, F.col(c).cast(new_type))
        return DataStream(df)

    def align(self, columns: Sequence[str]) -> "DataStream":
        """DataStream.scala:110-135: reorder to target schema, drop extras,
        error on missing (the analyzer raises for us)."""
        return DataStream(self.df.select(*columns))

    def with_lower_case_schema(self) -> "DataStream":
        """DataStream.scala:95-106."""
        return DataStream(self.df.toDF(*[c.lower() for c in self.df.columns]))

    def strip_chars_from_field_names(self, chars: str) -> "DataStream":
        """DataStream.scala:590-599."""
        table = str.maketrans("", "", chars)
        return DataStream(self.df.toDF(*[c.translate(table)
                                         for c in self.df.columns]))

    # -- row transforms ----------------------------------------------------
    def map(self, fn: Callable, schema=None) -> "DataStream":
        """DataStream.scala:40-47 (map Row=>Row) — the reference's
        most-used operator, here with the zero-per-row-Python contract:
        ``fn`` receives and returns whole pandas DataFrames (one per Arrow
        batch), never individual rows. ``schema`` (DDL string or
        StructType) defaults to the input schema, matching the reference's
        schema-preserving map; pass it when ``fn`` reshapes columns."""
        out_schema = schema if schema is not None else self.df.schema

        def apply(batches):
            for pdf in batches:
                yield fn(pdf)

        return DataStream(self.df.mapInPandas(apply, out_schema))

    def map_in_arrow(self, fn: Callable, schema=None) -> "DataStream":
        """Arrow-level variant of :meth:`map` for binary-heavy batches
        (fn: Iterator[pa.RecordBatch] -> Iterator[pa.RecordBatch]) — the
        same channel the codec engine uses (encode.py)."""
        out_schema = schema if schema is not None else self.df.schema
        return DataStream(self.df.mapInArrow(fn, out_schema))

    def foreach(self, fn: Callable) -> "DataStream":
        """DataStream.scala:371: side-effecting visit of every row with the
        stream passing through unchanged. Like the reference, this is LAZY —
        the effect fires when the returned stream is consumed. ``fn``
        receives pandas batches (zero per-row Python); use a Spark
        accumulator or external sink inside ``fn`` for counters, since it
        runs on executors."""
        def apply(batches):
            for pdf in batches:
                fn(pdf)
                yield pdf

        return DataStream(self.df.mapInPandas(apply, self.df.schema))

    def replace_field(self, name: str, new_name: str,
                      new_type: str | None = None) -> "DataStream":
        """DataStream.scala:356-366 (replaceField): swap one field's
        definition in place — same position, new name and/or type; values
        are reinterpreted via cast (the reference rewraps the untouched
        values under the updated schema)."""
        cols = []
        for f in self.df.schema.fields:
            if f.name == name:
                c = F.col(name)
                if new_type is not None:
                    c = c.cast(new_type)
                cols.append(c.alias(new_name))
            else:
                cols.append(F.col(f.name))
        return DataStream(self.df.select(*cols))

    def map_field(self, name: str, fn: Callable[[Column], Column]) -> "DataStream":
        """DataStream.scala:49-65 (mapField; NB the reference's version is
        a no-op bug — it reassigns the old value; we implement the intent)."""
        return DataStream(self.df.withColumn(name, fn(F.col(name))))

    def map_field_if_exists(self, name: str,
                            fn: Callable[[Column], Column]) -> "DataStream":
        """DataStream.scala:49-65 (mapFieldIfExists): no-op when absent."""
        if name not in self.df.columns:
            return self
        return self.map_field(name, fn)

    def update_field(self, name: str, from_value, target) -> "DataStream":
        """DataStream.scala:630-645: conditional substitution in one column."""
        return DataStream(self.df.withColumn(
            name, F.when(F.col(name) == F.lit(from_value),
                         F.lit(target)).otherwise(F.col(name))))

    def replace_everywhere(self, from_value, target) -> "DataStream":
        """DataStream.scala:651-657: substitution across all columns."""
        df = self.df
        for c, t in df.dtypes:
            df = df.withColumn(c, F.when(F.col(c) == F.lit(from_value),
                                         F.lit(target).cast(t))
                               .otherwise(F.col(c)))
        return DataStream(df)

    def replace_null_values(self, default) -> "DataStream":
        """DataStream.scala:755-772."""
        return DataStream(self.df.na.fill(default))

    def drop_null_rows(self) -> "DataStream":
        """DataStream.scala:462."""
        return DataStream(self.df.na.drop("any"))

    def explode_field(self, name: str, out: str | None = None) -> "DataStream":
        """DataStream.scala:856-865 (explode Row=>Seq[Row], array case)."""
        return DataStream(self.df.withColumn(out or name, F.explode(F.col(name))))

    # -- filters (DataStream.scala:67-108) --------------------------------
    def filter(self, predicate: Column) -> "DataStream":
        return DataStream(self.df.filter(predicate))

    def filter_not(self, predicate: Column) -> "DataStream":
        """DataStream.scala:108."""
        return DataStream(self.df.filter(~predicate))

    # -- joins (DataStream.scala:417-448, 258-283, 373-415) ---------------
    def join(self, key: str, other: "DataStream", how: str = "inner",
             broadcast: bool = True) -> "DataStream":
        """DataStream.scala:417-448: single-key broadcast hash join; the
        reference materializes the right side into a hash map ("always use
        the smallest datastream as the parameter") — here ``F.broadcast``
        declares the same intent and Catalyst builds the hash map per
        executor. ``how`` is a free upgrade (reference: inner only)."""
        right = F.broadcast(other.df) if broadcast else other.df
        return DataStream(self.df.join(right, on=key, how=how))

    def cartesian(self, other: "DataStream") -> "DataStream":
        """DataStream.scala:258-283."""
        return DataStream(self.df.crossJoin(other.df))

    def as_of_join(self, other: "DataStream", on: str, left_ts: str,
                   right_ts: str,
                   tolerance_us: int | None = None) -> "DataStream":
        """Module-level :func:`as_of_join` as a stream method."""
        return DataStream(as_of_join(self.df, other.df, on, left_ts,
                                     right_ts, tolerance_us))

    def concat_zip(self, other: "DataStream", order_left: str,
                   order_right: str) -> "DataStream":
        """DataStream.scala:373-415: positional zip of two streams. Needs an
        explicit order on a distributed engine: a parallel global index on
        each side (with_global_index — no single-task sort) + equi-join."""
        left = with_global_index(self.df, order_left, "__zip")
        right = with_global_index(other.df, order_right, "__zip")
        return DataStream(left.join(right, "__zip").drop("__zip"))

    # -- set ops (DataStream.scala:684-753) -------------------------------
    def union(self, other: "DataStream") -> "DataStream":
        """DataStream.scala:684-703 (++/union: sequential concatenation)."""
        return DataStream(self.df.unionByName(other.df))

    def substract(self, other: "DataStream") -> "DataStream":
        """Drop-in alias for the reference's typo'd method name
        (DataStream.scala:735-743 spells it 'substract') — a migrating
        user's code keeps working verbatim."""
        return self.subtract(other)

    def subtract(self, other: "DataStream") -> "DataStream":
        """DataStream.scala:735-743 ('substract' [sic]): lhs rows not in rhs."""
        return DataStream(self.df.exceptAll(other.df))

    def intersection(self, other: "DataStream") -> "DataStream":
        """DataStream.scala:745-753."""
        return DataStream(self.df.intersectAll(other.df))

    def distinct(self) -> "DataStream":
        """Absent in the reference (SURVEY §2.5) — free upgrade."""
        return DataStream(self.df.distinct())

    # -- ordering-dependent ops, made deterministic ------------------------
    def take(self, n: int, order_by: str | Column | None = None) -> "DataStream":
        """DataStream.scala:165-198: limit w/ upstream cancellation; Spark's
        limit short-circuits the scan the same way (CollectLimitExec)."""
        df = self.df.orderBy(order_by) if order_by is not None else self.df
        return DataStream(df.limit(n))

    def drop_rows(self, n: int, order_by: str | Column) -> "DataStream":
        """DataStream.scala:200-212 (drop first n in stream order)."""
        df = with_global_index(self.df, order_by)
        return DataStream(df.filter(F.col("__rn") > n).drop("__rn"))

    def take_while(self, predicate: Column, order_by: str | Column) -> "DataStream":
        """DataStream.scala:137-163: longest prefix satisfying predicate =
        rows before the first failing row. The first failing global index
        is a 1-row aggregate broadcast back — not an unbounded window over
        a single-task sort."""
        df = with_global_index(self.df, order_by)
        bad = df.agg(F.min(F.when(~predicate, F.col("__rn"))).alias("__bad"))
        return DataStream(
            df.join(F.broadcast(bad), how="cross")
            .filter(F.col("__bad").isNull() | (F.col("__rn") < F.col("__bad")))
            .drop("__rn", "__bad"))

    def drop_while(self, predicate: Column, order_by: str | Column) -> "DataStream":
        """DataStream.scala:214-238."""
        df = with_global_index(self.df, order_by)
        bad = df.agg(F.min(F.when(~predicate, F.col("__rn"))).alias("__bad"))
        return DataStream(
            df.join(F.broadcast(bad), how="cross")
            .filter(F.col("__bad").isNotNull()
                    & (F.col("__rn") >= F.col("__bad")))
            .drop("__rn", "__bad"))

    def sample_every_k(self, k: int, order_by: str | Column) -> "DataStream":
        """DataStream.scala:665-678: keep every k-th row (exact, counter
        based) — global_index % k == 0 under the explicit order."""
        df = with_global_index(self.df, order_by)
        return DataStream(df.filter(F.col("__rn") % k == 0).drop("__rn"))

    # -- arg-extrema (DataStream.scala:515-551) ---------------------------
    def min_by(self, of: str, by: str) -> "DataStream":
        return DataStream(self.df.agg(F.min_by(of, by).alias(of)))

    def max_by(self, of: str, by: str) -> "DataStream":
        return DataStream(self.df.agg(F.max_by(of, by).alias(of)))

    # -- grouping (DataStream.scala:240-256, GroupedDataStream.scala) -----
    def group_by(self, *cols: str) -> "GroupedDataStream":
        """DataStream.scala:247-249. The reference keys groups on the
        lower-cased string-concat of values (collision-prone); Spark groups
        on the typed values."""
        return GroupedDataStream(self.df, list(cols))

    def aggregated(self) -> "GroupedDataStream":
        """DataStream.scala:240-245: whole-dataset single group."""
        return GroupedDataStream(self.df, [])

    # -- actions (DataStream.scala:890-943, 1018-1021) --------------------
    def collect(self):
        return self.df.collect()

    def to_vector(self) -> list:
        """DataStream.scala:890-905 (toVector: rows as value tuples)."""
        return [tuple(r) for r in self.df.collect()]

    def to_set(self) -> set:
        """DataStream.scala:890-905 (toSet)."""
        return {tuple(r) for r in self.df.collect()}

    def collect_values(self, column: str) -> list:
        """DataStream.scala:1018-1021 (collectValues: one column's values)."""
        return [r[0] for r in self.df.select(column).collect()]

    def size(self) -> int:
        """DataStream.scala:910-922."""
        return self.df.count()

    def exists(self, predicate: Column) -> bool:
        """DataStream.scala:927-934 — early-terminating via limit(1)."""
        return len(self.df.filter(predicate).take(1)) > 0

    def find(self, predicate: Column):
        """DataStream.scala:936-943."""
        rows = self.df.filter(predicate).take(1)
        return rows[0] if rows else None

    def head(self):
        return self.df.head()

    def iterator(self):
        """DataStream.scala:285-300."""
        return self.df.toLocalIterator()

    # -- plumbing (DataStream.scala:945-1009, 561-584, 302-338) -----------
    def multiplex(self, count: int) -> list["DataStream"]:
        """DataStream.scala:945-1009: fan one stream out to N consumers.
        The reference pumps one pass through N bounded queues; on Spark the
        equivalent is persist() + N lazy readers of the same plan — each
        consumer triggers at most one materialization of the parent."""
        cached = self.df.persist()
        return [DataStream(cached) for _ in range(count)]

    def tee(self, fn: Callable[[DataFrame], DataFrame]) -> tuple["DataStream", "DataStream"]:
        """DataStream.scala:561-584: side-channel derived stream; returns
        (original, derived) over one cached parent."""
        cached = self.df.persist()
        return DataStream(cached), DataStream(fn(cached))

    def listener(self, on_progress: Callable[[int], None]) -> "DataStream":
        """DataStream.scala:302-338 / Listener.scala:3-8: progress
        callbacks. The reference calls back per row — which cannot scale
        and breaks the zero-per-row-Python rule — so granularity here is
        per action: callbacks fire with the row count whenever an action
        materializes this stream."""
        df = self.df

        class _ListenedStream(DataStream):
            def size(self) -> int:
                n = df.count()
                on_progress(n)
                return n

            def collect(self):
                rows = df.collect()
                on_progress(len(rows))
                return rows

        return _ListenedStream(df)

    # -- sinks (SinkAction.scala:12-101: N parallel writers) --------------
    def to_parquet(self, path: str, parallelism: int | None = None, **opts):
        df = self.df.repartition(parallelism) if parallelism else self.df
        df.write.mode("overwrite").options(**opts).parquet(path)

    def to_csv(self, path: str, parallelism: int | None = None, **opts):
        df = self.df.repartition(parallelism) if parallelism else self.df
        df.write.mode("overwrite").options(**opts).csv(path)

    def to_json(self, path: str, parallelism: int | None = None, **opts):
        df = self.df.repartition(parallelism) if parallelism else self.df
        df.write.mode("overwrite").options(**opts).json(path)

    def to_orc(self, path: str, parallelism: int | None = None, **opts):
        df = self.df.repartition(parallelism) if parallelism else self.df
        df.write.mode("overwrite").options(**opts).orc(path)


class GroupedDataStream:
    """GroupedDataStream (GroupedDataStream.scala:11-90): groupBy + a vector
    of aggregations. The reference's evaluator is unimplemented (`???`,
    :62) — its contract survives only in ignored tests; Spark's hash
    aggregate provides working semantics (map-side partial agg included)."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self.df = df
        self.keys = keys
        self._aggs: list[Column] = []

    def sum(self, field: str) -> "GroupedDataStream":
        self._aggs.append(F.sum(field).alias(f"sum_{field}"))
        return self

    def count(self, field: str | None = None) -> "GroupedDataStream":
        self._aggs.append(F.count(field or "*").alias("count"))
        return self

    def avg(self, field: str) -> "GroupedDataStream":
        self._aggs.append(F.avg(field).alias(f"avg_{field}"))
        return self

    def min(self, field: str) -> "GroupedDataStream":
        self._aggs.append(F.min(field).alias(f"min_{field}"))
        return self

    def max(self, field: str) -> "GroupedDataStream":
        self._aggs.append(F.max(field).alias(f"max_{field}"))
        return self

    def agg(self, *cols: Column) -> "GroupedDataStream":
        self._aggs.extend(cols)
        return self

    def to_datastream(self) -> DataStream:
        if self.keys:
            return DataStream(self.df.groupBy(*self.keys).agg(*self._aggs))
        return DataStream(self.df.agg(*self._aggs))
