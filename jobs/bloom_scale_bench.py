"""Bloom-tier scale validation (round 7, VERDICT r6 #7).

The r6 measurement showed per-block key blooms prune a hash-scattered
banded table's point lookup to 1-3 of 64 files. This bench re-runs the
same shape at 8x the file count (512 files) — the regime where the
narrow bloom scan itself (footers + bloom chunks of EVERY candidate
file) starts to cost — and records files-opened plus wall time for the
bloom tier against the key-range-only tier (which keeps all files on
scattered input).

Usage: python -m jobs.bloom_scale_bench [--files 512] [--rows-per-file 800]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import tempfile
import time

from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--files", type=int, default=512)
    p.add_argument("--rows-per-file", type=int, default=800)
    p.add_argument("--probes", type=int, default=9)
    p.add_argument("--index", action="store_true",
                   help="build the bloom index sidecar first and measure "
                        "the index-backed lookup path")
    args = p.parse_args()

    from eel_sdk_spark import checkpoint
    from eel_sdk_spark.checkpoint import (build_bloom_index,
                                          encode_with_checkpoint,
                                          lookup_files, point_lookup,
                                          prune_files_by_part)
    from eel_sdk_spark.corpus import webtext_df
    from eel_sdk_spark.session import get_spark
    from eel_sdk_spark.table import ManifestTable

    spark = get_spark(app="bloom-scale", cpus=32)
    n_rows = args.files * args.rows_per_file
    df = (webtext_df(spark, n_rows, parts=64)
          .repartition(args.files).cache())
    df.count()

    tbl = ManifestTable(tempfile.mkdtemp(prefix="bloom_scale_"), "blocks")
    t0 = time.time()
    encode_with_checkpoint(spark, df, tbl, n_parts=64, run_id="r1")
    enc_sec = round(time.time() - t0, 2)
    idx_sec = None
    if args.index:
        t0 = time.time()
        build_bloom_index(spark, tbl, key="url")
        idx_sec = round(time.time() - t0, 2)
    snap = tbl.current()
    n_files = len(snap.files)

    ddl = ("url string, warc_ts timestamp, html binary, text string, "
           "lang string")
    targets = [r["url"] for r in
               df.select("url").distinct().limit(args.probes).collect()]

    def norange_files(key_value):
        """Tier 1+2 only (what r5 shipped): parts coverage + key ranges."""
        coverage, key_ranges = {}, {}
        for r in snap.properties.get("runs", []):
            coverage.update(r.get("file_parts", {}))
            if r.get("key", "url") == "url":
                key_ranges.update(r.get("file_key_ranges", {}))
        files = prune_files_by_part(snap.files, set(range(64)),
                                    coverage=coverage)
        in_range = []
        for f in files:
            rng = key_ranges.get(os.path.basename(f), {}).get("s")
            if rng is None or rng[0] <= key_value <= rng[1]:
                in_range.append(f)
        return in_range or files[:1]

    # warm the JVM + file listings once
    point_lookup(spark, tbl, targets[0], ddl).count()

    opened, bloom_walls, scan_secs = [], [], []
    for t in targets:
        ts = time.time()
        kept = lookup_files(spark, snap, t, "url", set(range(64)))
        scan_secs.append(time.time() - ts)
        opened.append(len(kept))
        ts = time.time()
        assert point_lookup(spark, tbl, t, ddl).count() == 1
        bloom_walls.append(time.time() - ts)

    survivors_norange = len(norange_files(targets[0]))
    # key-range-only wall: disable the bloom tier by patching the gate
    real = checkpoint.lookup_files
    checkpoint.lookup_files = \
        lambda sp, sn, kv, k, parts, **kw: norange_files(kv)
    try:
        ts = time.time()
        assert point_lookup(spark, tbl, targets[0], ddl).count() == 1
        norange_wall = time.time() - ts
    finally:
        checkpoint.lookup_files = real

    print(json.dumps({
        "n_files": n_files, "n_rows": n_rows, "encode_sec": enc_sec,
        "index": bool(args.index), "index_build_sec": idx_sec,
        "bloom_files_opened": {
            "min": min(opened), "median": statistics.median(opened),
            "max": max(opened)},
        "keyrange_files_opened": survivors_norange,
        "bloom_scan_sec_p50": round(statistics.median(scan_secs), 3),
        "bloom_lookup_wall_p50": round(statistics.median(bloom_walls), 3),
        "keyrange_lookup_wall": round(norange_wall, 3),
    }))


if __name__ == "__main__":
    main()
