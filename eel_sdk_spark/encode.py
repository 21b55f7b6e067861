"""The encode stage: DataFrame -> DataFrame of encoded blocks.

One ``mapInArrow`` pass; each incoming Arrow batch becomes one *block
group* — one encoded block per column — so the unit of parallelism is the
Spark partition and the unit of compression is the Arrow batch
(``spark.sql.execution.arrow.maxRecordsPerBatch``). Nothing here touches
rows in Python: kernels are whole-array numpy/Arrow ops.

Partitioning: rows are assigned a deterministic ``part_id =
pmod(xxhash64(key), n_parts)`` *column* (not the physical Spark partition
id), then hash-repartitioned and sorted by it so every emitted block covers
exactly one part_id even when AQE coalesces partitions. This makes encode
output — and therefore checkpoint lineage — independent of cluster size,
which is what lets a resume on 4N executors skip work committed by a run on
N executors. Salting for hot-domain skew: ``salted_key`` spreads any single
key value over ``salt`` shards (counter-measure to the reference's
writer-per-partition hotspot, eel-hive/.../HiveSinkWriter.scala:138-148).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from .codecs import decode_column, encode_column

PART_COL = "__eel_part"

BLOCK_SCHEMA_DDL = (
    "part_id int, block_seq int, col string, codec string, "
    "n_values bigint, n_nulls bigint, header binary, payload binary, "
    "raw_bytes bigint, enc_bytes bigint, encode_ms double"
)

BLOCK_FIELDS = ["part_id", "block_seq", "col", "codec", "n_values", "n_nulls",
                "header", "payload", "raw_bytes", "enc_bytes", "encode_ms"]


def with_part_id(df: DataFrame, key: str, n_parts: int,
                 salt: int = 1) -> DataFrame:
    """Deterministic part assignment; salt > 1 splits each hash bucket."""
    h = F.xxhash64(F.col(key))
    if salt > 1:
        h = F.xxhash64(F.col(key), F.pmod(F.xxhash64(F.col(key)), F.lit(salt)))
    return df.withColumn(PART_COL, F.pmod(h, F.lit(n_parts)).cast("int"))


def _split_by_part(batch: pa.RecordBatch) -> Iterator[tuple[int, pa.RecordBatch]]:
    """Split a batch at part_id boundaries (input sorted within partitions)."""
    part = np.asarray(batch.column(PART_COL))
    if part.size == 0:
        return
    cuts = np.flatnonzero(part[1:] != part[:-1]) + 1
    starts = np.concatenate([[0], cuts, [part.size]])
    for i in range(len(starts) - 1):
        lo, hi = int(starts[i]), int(starts[i + 1])
        yield int(part[lo]), batch.slice(lo, hi - lo)


def _encode_batches(batches: Iterator[pa.RecordBatch],
                    codec_overrides: dict[str, str | None],
                    profile: str = "speed") -> Iterator[pa.RecordBatch]:
    seq: dict[int, int] = {}
    ctx: dict = {}  # per-partition codec context (cached FSST tables etc.)
    for batch in batches:
        for part_id, sub in _split_by_part(batch):
            block_seq = seq.get(part_id, 0)
            seq[part_id] = block_seq + 1
            rows = {f: [] for f in BLOCK_FIELDS}
            for name in sub.schema.names:
                if name == PART_COL:
                    continue
                arr = sub.column(name)
                t0 = time.monotonic()
                header, payload, info = encode_column(
                    arr, codec=codec_overrides.get(name), profile=profile,
                    ctx=ctx, ctx_key=name)
                rows["encode_ms"].append((time.monotonic() - t0) * 1000.0)
                rows["part_id"].append(part_id)
                rows["block_seq"].append(block_seq)
                rows["col"].append(name)
                rows["codec"].append(info["codec"])
                rows["n_values"].append(info["n"])
                rows["n_nulls"].append(info["nn"])
                rows["header"].append(header)
                rows["payload"].append(payload)
                rows["raw_bytes"].append(arr.get_total_buffer_size())
                rows["enc_bytes"].append(len(header) + len(payload))
            yield pa.record_batch(
                [
                    pa.array(rows["part_id"], type=pa.int32()),
                    pa.array(rows["block_seq"], type=pa.int32()),
                    pa.array(rows["col"], type=pa.string()),
                    pa.array(rows["codec"], type=pa.string()),
                    pa.array(rows["n_values"], type=pa.int64()),
                    pa.array(rows["n_nulls"], type=pa.int64()),
                    pa.array(rows["header"], type=pa.binary()),
                    pa.array(rows["payload"], type=pa.binary()),
                    pa.array(rows["raw_bytes"], type=pa.int64()),
                    pa.array(rows["enc_bytes"], type=pa.int64()),
                    pa.array(rows["encode_ms"], type=pa.float64()),
                ],
                names=BLOCK_FIELDS,
            )


def encode_df(df: DataFrame, key: str, n_parts: int | None = None,
              salt: int = 1,
              codec_overrides: dict[str, str] | None = None,
              profile: str = "speed") -> DataFrame:
    """Encode every column of ``df`` into blocks, partitioned by ``key``.

    The physical plan is: project + hash (JVM) -> shuffle on part_id ->
    sort within partitions (JVM) -> one Python/Arrow stage. ``.explain``
    shows a single Exchange; the Python stage is the only non-codegen op.
    """
    sc = df.sparkSession.sparkContext
    n_parts = n_parts or sc.defaultParallelism * 2
    overrides = codec_overrides or {}
    prepared = (
        with_part_id(df, key, n_parts, salt)
        .repartition(n_parts, F.col(PART_COL))
        .sortWithinPartitions(PART_COL)
    )
    return prepared.mapInArrow(
        lambda it: _encode_batches(it, overrides, profile), BLOCK_SCHEMA_DDL)


def decode_blocks_df(blocks: DataFrame, schema_ddl: str) -> DataFrame:
    """Blocks -> original rows. Groups by (part_id, block_seq), decodes each
    column with its header, re-emits Arrow batches.

    Uses repartition + sortWithinPartitions + mapInArrow (not
    groupBy.applyInPandas) so payloads stay Arrow buffers end-to-end and
    blocks of one group are guaranteed co-located and adjacent.
    """
    from pyspark.sql.types import StructType

    out_schema = StructType.fromDDL(schema_ddl)
    col_order = [f.name for f in out_schema.fields]

    def _decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending: dict[tuple[int, int], dict[str, pa.Array]] = {}
        for batch in batches:
            part = batch.column("part_id").to_pylist()
            seqs = batch.column("block_seq").to_pylist()
            names = batch.column("col").to_pylist()
            headers = batch.column("header")
            payloads = batch.column("payload")
            for i in range(batch.num_rows):
                key = (part[i], seqs[i])
                group = pending.setdefault(key, {})
                group[names[i]] = decode_column(
                    headers[i].as_py(), payloads[i].as_py())
                if len(group) == len(col_order):
                    yield pa.record_batch([group[c] for c in col_order],
                                          names=col_order)
                    del pending[key]
        if pending:
            raise ValueError(
                f"{len(pending)} incomplete block groups at end of partition "
                f"(missing columns: "
                f"{ {k: sorted(set(col_order) - set(v)) for k, v in list(pending.items())[:3]} })")

    cols_per_group = blocks.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        blocks.repartition(int(cols_per_group), "part_id")
        .sortWithinPartitions("part_id", "block_seq")
        .mapInArrow(_decode, schema_ddl)
    )
