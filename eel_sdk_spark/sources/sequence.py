"""Hadoop SequenceFile source/sink — the reference's legacy container
format (eel-core/src/main/scala/io/eels/component/sequence/
SequenceSource.scala:14-52, SequenceSupport.scala:15-41,
SequenceSink.scala:12-48): a sequence file of (IntWritable,
BytesWritable) records where each value is ONE CSV-encoded row and a
header record carries the field names (the reference skips the first
record per file on read; here the header record is keyed 0 and data
rows 1, which is robust to Spark's multi-part output where every part
file carries its own header).

This is the one place in the package that touches the RDD API — a
deliberate exception to the DataFrame-first rule: sequence files are a
Hadoop-container format whose PySpark access IS ``sc.sequenceFile`` /
``saveAsSequenceFile``; there is no DataFrame reader for them. The CSV
encode/decode of row payloads stays JVM-side (``to_csv``/``from_csv``
over a struct — codegen, quoting identical on both paths), so Python
only shuffles opaque (int, bytes) pairs. Values may contain embedded
newlines and commas: records are length-framed by the container, not
line-split (a property the reference relies on too).

Like the reference, an untyped read yields ALL-STRING columns (the
header carries names only); pass ``schema_ddl`` for a typed read.
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import DataFrame, SparkSession, functions as F


def _csv_line(values: list[str]) -> str:
    buf = io.StringIO()
    csv.writer(buf, lineterminator="").writerow(values)
    return buf.getvalue()


def write_sequence(df: DataFrame, path: str) -> None:
    """SequenceSink: every partition writes a header record (key 0,
    CSV field names) followed by CSV data rows (key 1)."""
    header = _csv_line(list(df.columns)).encode("utf-8")
    payload = df.select(
        F.encode(F.to_csv(F.struct(*[F.col(c).cast("string")
                                     for c in df.columns])),
                 "utf-8").alias("v"))

    def to_records(it):
        yield (0, bytearray(header))
        for r in it:
            yield (1, bytearray(r["v"]))

    payload.rdd.mapPartitions(to_records).saveAsSequenceFile(path)


def read_sequence(spark: SparkSession, path: str,
                  schema_ddl: str | None = None) -> DataFrame:
    """SequenceSource: schema from the header record(s), rows from the
    data records. All-string unless ``schema_ddl`` types them."""
    rdd = spark.sparkContext.sequenceFile(path)
    hdr = (rdd.filter(lambda kv: kv[0] == 0)
           .map(lambda kv: bytes(kv[1]).decode("utf-8")).first())
    names = next(csv.reader([hdr]))
    schema = schema_ddl or ", ".join(f"`{n}` string" for n in names)
    rows = (rdd.filter(lambda kv: kv[0] != 0)
            .map(lambda kv: (bytes(kv[1]).decode("utf-8"),)))
    return (spark.createDataFrame(rows, "v string")
            .select(F.from_csv("v", schema).alias("r"))
            .select("r.*"))
