"""Block payload checksums + fsck: end-to-end bit-rot detection.

At 100 TB silent corruption between encode and decode (storage bit-rot,
partial uploads, buggy copy tools) is a when, not an if. Every encoded
block carries ``payload_crc`` = crc32(header) chained into
crc32(payload); the storage decode path verifies it by default and
``checkpoint.fsck`` audits a whole table (any snapshot) without
decoding values. The reference delegates this to ORC's file checksums
(eel-orc/src/main/scala/io/eels/component/orc/OrcSink.scala) — here it
covers every layout the engine writes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.checkpoint import encode_with_checkpoint, fsck, fsck_summary
from eel_sdk_spark.corpus import SCHEMA_DDL, webtext_df
from eel_sdk_spark.encode import decode_blocks_df, encode_df
from eel_sdk_spark.table import ManifestTable


def _encoded_table(spark, tmp_path, name: str, n: int = 3000,
                   parts: int = 8) -> ManifestTable:
    df = webtext_df(spark, n, parts=parts)
    tbl = ManifestTable(str(tmp_path), name)
    encode_with_checkpoint(spark, df, tbl, n_parts=parts, run_id="r1")
    return tbl


def _drop_hadoop_crc_sidecar(path: str) -> None:
    """Rewriting a file out-of-band invalidates Hadoop local-FS's own
    ``.name.crc`` sidecar (which exists only on LocalFileSystem — object
    stores have no such thing, which is exactly why the engine's CRC
    lives IN the block rows). Remove it so the Spark-side read path in
    these tests exercises OUR verification, not Hadoop's."""
    d, b = os.path.split(path)
    side = os.path.join(d, f".{b}.crc")
    if os.path.exists(side):
        os.remove(side)


def _tamper_payload(path: str) -> dict:
    """Flip one byte in the middle of the first block's payload and
    rewrite the file. Returns the victim block's coordinates. CRC32 is
    linear, so any single-byte flip is guaranteed detected."""
    t = pq.read_table(path)
    idx = t.schema.get_field_index("payload")
    payloads = t.column("payload").to_pylist()
    victim = bytearray(payloads[0])
    victim[len(victim) // 2] ^= 0xFF
    payloads[0] = bytes(victim)
    t = t.set_column(idx, "payload", pa.array(payloads, type=pa.binary()))
    pq.write_table(t, path)
    _drop_hadoop_crc_sidecar(path)
    return {k: t.column(k)[0].as_py()
            for k in ("part_id", "block_seq", "writer_uid", "col")}


def _strip_crc_column(path: str) -> None:
    """Rewrite a block file WITHOUT payload_crc — a file written by the
    engine before the column existed."""
    t = pq.read_table(path)
    t = t.drop_columns(["payload_crc"])
    pq.write_table(t, path)
    _drop_hadoop_crc_sidecar(path)


def test_crc_present_and_verified_roundtrip(spark):
    df = webtext_df(spark, 2000, parts=4)
    blocks = encode_df(df, key="url", n_parts=4).cache()
    assert blocks.filter(F.col("payload_crc").isNull()).count() == 0
    out = decode_blocks_df(blocks, SCHEMA_DDL, verify=True)
    assert out.count() == 2000
    blocks.unpersist()


def test_tampered_block_fails_decode_with_coordinates(spark, tmp_path):
    tbl = _encoded_table(spark, tmp_path, "tamper")
    victim_file = sorted(tbl.current().files)[0]
    coords = _tamper_payload(victim_file)

    with pytest.raises(Exception) as ei:
        tbl.read_decoded(spark, SCHEMA_DDL).count()
    msg = str(ei.value)
    assert "CRC mismatch" in msg
    assert f"col={coords['col']!r}" in msg
    assert os.path.basename(victim_file) in msg

    report = fsck(spark, tbl).cache()
    bad = report.filter("status = 'bad_crc'").collect()
    assert len(bad) == 1
    assert bad[0]["file"] == os.path.basename(victim_file)
    assert bad[0]["col"] == coords["col"]
    assert bad[0]["part_id"] == coords["part_id"]
    assert bad[0]["block_seq"] == coords["block_seq"]
    assert bad[0]["writer_uid"] == coords["writer_uid"]
    s = fsck_summary(report)
    assert s["blocks_bad_crc"] == 1 and not s["healthy"]
    assert s["blocks_ok"] > 0
    report.unpersist()


def test_legacy_files_without_crc_still_decode(spark, tmp_path):
    """Mixed-generation table: one file predates the crc column. Decode
    (both paths) must treat its blocks as uncovered, not fail; fsck
    counts them as no_crc and the table stays healthy."""
    tbl = _encoded_table(spark, tmp_path, "legacy")
    legacy_file = sorted(tbl.current().files)[0]
    _strip_crc_column(legacy_file)

    n = tbl.read_decoded(spark, SCHEMA_DDL).count()
    assert n == 3000
    # shuffle-regroup path over the mixed-schema union
    blocks = spark.read.option("mergeSchema", "true") \
        .parquet(*tbl.current().files)
    assert decode_blocks_df(blocks, SCHEMA_DDL, verify=True).count() == 3000

    report = fsck(spark, tbl).cache()
    s = fsck_summary(report)
    assert s["blocks_no_crc"] > 0 and s["blocks_bad_crc"] == 0
    assert s["healthy"]
    uncov = report.filter("status = 'no_crc'").collect()
    assert [r["file"] for r in uncov] == [os.path.basename(legacy_file)]
    report.unpersist()


def test_fsck_reports_missing_and_unreadable_files(spark, tmp_path):
    tbl = _encoded_table(spark, tmp_path, "drift", n=1000, parts=2)
    real = list(tbl.current().files)
    junk = str(tmp_path / "junk.parquet")
    with open(junk, "wb") as f:
        f.write(b"this is not parquet")
    report = fsck(spark, files=real + [str(tmp_path / "gone.parquet"),
                                       junk]).cache()
    s = fsck_summary(report)
    assert s["missing_files"] == 1
    assert s["unreadable_files"] == 1
    assert not s["healthy"]
    assert s["blocks_bad_crc"] == 0 and s["blocks_ok"] > 0
    report.unpersist()


def test_crc_survives_compaction(spark, tmp_path):
    """compact() rewrites block rows wholesale — stored crcs still match
    their (unchanged) header/payload bytes afterwards, and coverage
    stays total."""
    tbl = _encoded_table(spark, tmp_path, "comp")
    tbl.compact(spark, n_files=2)
    s = fsck_summary(fsck(spark, tbl))
    assert s["healthy"] and s["blocks_bad_crc"] == 0
    assert s["blocks_no_crc"] == 0 and s["blocks_ok"] > 0
    assert tbl.read_decoded(spark, SCHEMA_DDL).count() == 3000
