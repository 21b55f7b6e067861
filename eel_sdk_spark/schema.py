"""Schema utilities: the webtext schema, coercion, and sink-side alignment.

Mirrors the reference's three schema subsystems on Spark types:
- coercion (coercers.scala:15-185 + RowUtils.coerce, RowUtils.scala:25-44)
  -> ``coerce_df``: cast every column to the declared type (lossless widen
  or parse; Spark ``cast`` covers every coercer the reference ships);
- alignment (HiveSinkWriter's MetastoreSchemaHandler / AlignmentStrategy,
  HiveSinkWriter.scala:32-70) -> ``align_df``: reorder to the target
  schema, pad missing nullable fields with nulls, drop extras or error;
- schema algebra helpers mirroring StructType ops (schema.scala:151-285).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the north-rule input table (BASELINE.json input_hint)
WEBTEXT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

WEBTEXT_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def coerce_df(df: DataFrame, target: T.StructType) -> DataFrame:
    """Cast each present column to its declared type (RowUtils.coerce)."""
    cols = []
    for f in target.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def align_df(df: DataFrame, target: T.StructType,
             error_on_missing: bool = False) -> DataFrame:
    """Reorder/pad to the target schema (AlignmentStrategy semantics):
    missing nullable fields become null literals; missing non-nullable
    fields raise; extra columns are dropped."""
    cols = []
    for f in target.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif f.nullable and not error_on_missing:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(f"required field {f.name!r} missing from input")
    return df.select(*cols)


# -- StructType algebra (schema.scala references per function) -------------

def projection(schema: T.StructType, *names: str) -> T.StructType:
    """schema.scala:181-185."""
    by_name = {f.name: f for f in schema.fields}
    return T.StructType([by_name[n] for n in names])


def concat_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """schema.scala:253-259."""
    return T.StructType(list(a.fields) + list(b.fields))


def rename_field(schema: T.StructType, old: str, new: str) -> T.StructType:
    """schema.scala:268-270."""
    return T.StructType([
        T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
        for f in schema.fields])


def remove_fields_regex(schema: T.StructType, pattern: str) -> T.StructType:
    """schema.scala:241-245."""
    import re

    return T.StructType([f for f in schema.fields
                         if not re.fullmatch(pattern, f.name)])


def replace_field_type(schema: T.StructType, name: str,
                       dt: T.DataType) -> T.StructType:
    """schema.scala:187-199."""
    return T.StructType([
        T.StructField(f.name, dt if f.name == name else f.dataType, f.nullable)
        for f in schema.fields])


def add_field_if_not_exists(schema: T.StructType,
                            f: T.StructField) -> T.StructType:
    """schema.scala:233."""
    if any(x.name == f.name for x in schema.fields):
        return schema
    return T.StructType(list(schema.fields) + [f])


def ddl(schema: T.StructType) -> str:
    """schema.scala:280-284 (CREATE TABLE column list)."""
    return ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in schema.fields)
