"""Sketch-based corpus profiling: the one-pass ANALYZE a 10^12-doc table
can actually afford.

Everything here is mergeable state, so it computes map-side and shuffles
only sketch bytes — never values:

- distinct counts: Spark's built-in HLL++ (``approx_count_distinct``)
  and, for sketches that must be STORED and merged across runs (profile
  today's crawl, union with last week's), Apache DataSketches HLL via
  ``hll_sketch_agg``/``hll_union_agg`` (JVM-side, exposed since Spark
  3.5 — public API).
- quantiles: ``percentile_approx`` (Greenwald-Khanna).

The reference has no sketching at all (its stats are exact min/max from
parquet footers, ParquetSource.scala:58-75); these are the corpus-scale
upgrade of the same idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(col: str | Column, lg_k: int = 12) -> Column:
    """Mergeable HLL sketch aggregate (binary): store it per partition /
    per day and union later — ``merge_sketches`` — without rescanning."""
    return F.hll_sketch_agg(col, lg_k)


def merge_sketches(col: str | Column) -> Column:
    """Union previously stored HLL sketches (binary column)."""
    return F.hll_union_agg(col)


def sketch_estimate(col: str | Column) -> Column:
    return F.hll_sketch_estimate(col)


def column_profile(df: DataFrame, cols: list[str] | None = None,
                   quantiles: tuple = (0.5, 0.95, 0.99),
                   accuracy: int = 10_000, rsd: float = 0.01,
                   approx: bool = True) -> DataFrame:
    """One-pass per-column profile: rows, nulls, approx distinct (HLL++),
    and for numeric columns min/max/mean + approx quantiles. ONE
    aggregate job over the corpus — every statistic is map-side
    combinable, so only constant-size state shuffles.

    ``approx=False`` skips the sketch aggregates (HLL++ distinct and the
    percentile digests — the expensive per-row state) and nulls their
    output fields: callers that only consume the exact fields should not
    pay for sketches they discard (r9, guide §1.2).

    Output: one row per column (long format — the shape a profile store
    ingests): col, n, n_nulls, approx_distinct, min, max, mean, q50/...
    (numeric-only fields null for string/binary columns)."""
    cols = cols or df.columns
    numeric = {f.name for f in df.schema.fields
               if f.dataType.typeName() in
               ("integer", "long", "short", "byte", "float", "double",
                "decimal")}
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
        ]
        if approx:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"{c}__nd"))
        if c in numeric:
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                F.avg(c).alias(f"{c}__mean"),
            ]
            if approx:
                aggs.append(F.percentile_approx(
                    c, list(quantiles), accuracy).alias(f"{c}__q"))
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    out = []
    for c in cols:
        qs = row[f"{c}__q"] if approx and c in numeric else None
        out.append((
            c, int(row[f"{c}__n"]), int(row[f"{c}__nulls"]),
            int(row[f"{c}__nd"]) if approx else None,
            float(row[f"{c}__min"]) if c in numeric
            and row[f"{c}__min"] is not None else None,
            float(row[f"{c}__max"]) if c in numeric
            and row[f"{c}__max"] is not None else None,
            float(row[f"{c}__mean"]) if c in numeric
            and row[f"{c}__mean"] is not None else None,
            [float(q) for q in qs] if qs is not None else None,
        ))
    return spark.createDataFrame(
        out, "col string, n bigint, n_nulls bigint, approx_distinct bigint, "
             "min double, max double, mean double, quantiles array<double>")
