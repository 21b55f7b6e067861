"""Schema evolution on the encoded table: add-column reads.

A column added after earlier runs were committed decodes as nulls for the
old block groups (Iceberg add-column semantics; reference analogue:
sink-side row padding, HiveSinkWriter.scala:32-70).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_sdk_spark.corpus import webtext_df
from eel_sdk_spark.encode import decode_blocks_df, encode_df
from eel_sdk_spark.table import ManifestTable

V1_DDL = "url string, text string"
V2_DDL = "url string, text string, lang string"


def test_add_column_evolution(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path), "evo")
    v1 = webtext_df(spark, 800, parts=2).select("url", "text")
    tbl.write_df(encode_df(v1, key="url", n_parts=4), V1_DDL)

    v2 = (webtext_df(spark, 400, parts=2)
          .withColumn("url", F.concat(F.lit("v2-"), F.col("url")))
          .select("url", "text", "lang"))
    tbl.write_df(encode_df(v2, key="url", n_parts=4), V2_DDL)

    # read everything under the NEW schema: old rows get lang = null
    out = decode_blocks_df(tbl.read(spark), V2_DDL, fill_missing=True)
    assert out.count() == 1200
    assert out.filter(F.col("lang").isNull()
                      & ~F.col("url").startswith("v2-")).count() == 800
    n_v2_lang = v2.filter(F.col("lang").isNotNull()).count()
    assert out.filter(F.col("lang").isNotNull()).count() == n_v2_lang

    # without fill_missing the mixed read fails loudly
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        decode_blocks_df(tbl.read(spark), V2_DDL).count()


def test_projection_avoids_evolution_entirely(spark, tmp_path):
    """Projecting only v1 columns needs no fill even on mixed tables."""
    tbl = ManifestTable(str(tmp_path), "evo2")
    v1 = webtext_df(spark, 300, parts=2).select("url", "text")
    tbl.write_df(encode_df(v1, key="url", n_parts=4), V1_DDL)
    v2 = (webtext_df(spark, 300, parts=2)
          .withColumn("url", F.concat(F.lit("v2-"), F.col("url")))
          .select("url", "text", "lang"))
    tbl.write_df(encode_df(v2, key="url", n_parts=4), V2_DDL)

    out = decode_blocks_df(tbl.read(spark), V2_DDL, columns=["url", "text"])
    assert out.count() == 600
    assert out.columns == ["url", "text"]


def test_old_ddl_reads_evolved_table(spark, tmp_path):
    """Reading an EVOLVED table with an older DDL (blocks carry an extra
    column) must ignore the unknown column's blocks instead of spuriously
    failing on 'incomplete groups' or emitting phantom null batches."""
    tbl = ManifestTable(str(tmp_path), "evo3")
    v2 = webtext_df(spark, 400, parts=2).select("url", "text", "lang")
    tbl.write_df(encode_df(v2, key="url", n_parts=4), V2_DDL)

    out = decode_blocks_df(tbl.read(spark), V1_DDL)
    assert out.columns == ["url", "text"]
    assert out.count() == 400
    # fill_missing must not fabricate phantom rows from the orphan column
    out2 = decode_blocks_df(tbl.read(spark), V1_DDL, fill_missing=True)
    assert out2.count() == 400
