"""Production training-data cleanup entry point.

    spark-submit --driver-memory 48g --py-files eel_sdk_spark.zip \
        jobs/clean_job.py \
        --input <parquet dir> --output /path/clean \
        [--text-col text] [--id-col doc_id] \
        [--near-dup 0.5] [--cluster-exact] [--min-quality 0.3] \
        [--dedup-lines] [--benchmark <parquet of eval texts>] \
        [--mix source=WEIGHT ...] [--splits 80,10,10]

Runs the corpus cleanup pipeline (line dedup -> exact dedup -> LSH
near-dup removal -> quality filter -> benchmark decontamination ->
mixture resampling -> split assignment) as ONE lazy plan and writes the
cleaned corpus partitioned by split. Every stage is the oracle-checked
library op (`eel_sdk_spark.functions.pipeline`); this is just the
spark-submit skin. Prints one JSON line of stage-by-stage row counts.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="parquet path of raw documents, or "
                        "'warehouse:<path>[:<table>]' to decode an "
                        "ENCODED ManifestTable (stored row schema; "
                        "tombstones applied; zero-shuffle read)")
    p.add_argument("--output", required=True)
    p.add_argument("--since-snapshot", type=int, default=None,
                   help="with a warehouse: input, clean ONLY the rows "
                        "appended after this snapshot id (read_appended "
                        "— pair with --against-store for incremental "
                        "dedup against the accepted corpus)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--near-dup", type=float, default=0.5,
                   help="jaccard threshold; negative disables the stage")
    p.add_argument("--cluster-exact", action="store_true",
                   help="connected-components keep-one-per-cluster dedup")
    p.add_argument("--min-quality", type=float, default=0.3,
                   help="quality_score threshold; negative disables")
    p.add_argument("--dedup-lines", action="store_true")
    p.add_argument("--boilerplate-min-docs", type=int, default=None,
                   help="strip lines repeated verbatim across >= N "
                        "distinct docs (cross-document boilerplate: "
                        "nav bars, cookie banners)")
    p.add_argument("--lm-reference", default=None,
                   help="parquet of reference-quality docs: trains a "
                        "bigram LM and drops docs above --max-ppl "
                        "(CCNet-style model-based quality)")
    p.add_argument("--max-ppl", type=float, default=None)
    p.add_argument("--substr-window", type=int, default=None,
                   help="exact-substring span dedup: cut passages of "
                        ">= N tokens that repeat anywhere in the corpus "
                        "(keeps the canonical min-id occurrence)")
    p.add_argument("--benchmark", default=None,
                   help="parquet of benchmark texts for 13-gram "
                        "decontamination")
    p.add_argument("--bench-text-col", default="text")
    p.add_argument("--embeddings", default=None,
                   help="parquet of (id_col, embedding) rows: enables the "
                        "SemDeDup semantic-dedup stage")
    p.add_argument("--emb-vec-col", default="embedding")
    p.add_argument("--emb-threshold", type=float, default=0.95)
    p.add_argument("--emb-n-list", type=int, default=64)
    p.add_argument("--quality-labels", default=None,
                   help="parquet of labeled docs (text + 0/1 label "
                        "column): trains the distributed logistic-"
                        "regression quality classifier and filters by "
                        "its probability instead of the fixed-formula "
                        "quality_score (which --min-quality gates)")
    p.add_argument("--quality-label-col", default="label")
    p.add_argument("--min-quality-prob", type=float, default=0.5)
    p.add_argument("--against-store", default=None,
                   help="parquet signature store of the EXISTING corpus: "
                        "drop new docs that exact- or near-duplicate it "
                        "before cleaning (incremental append mode — the "
                        "old corpus text is never read, only its ~100 "
                        "B/doc fp+minhash table)")
    p.add_argument("--write-store", default=None,
                   help="write the cleaned output's signature store here "
                        "(unioned with --against-store when given) for "
                        "the next increment")
    p.add_argument("--dedup-n-hashes", type=int, default=8,
                   help="minhash signature width for --against-store/"
                        "--write-store (must match the store's build "
                        "params — validated against its sidecar)")
    p.add_argument("--dedup-shingle", type=int, default=3)
    p.add_argument("--dedup-band-size", type=int, default=2)
    p.add_argument("--dedup-hash-family", default="md5")
    p.add_argument("--mix", action="append", default=[],
                   help="source=weight mixture targets (repeatable); "
                        "requires a 'source' column")
    p.add_argument("--splits", default="80,10,10")
    p.add_argument("--split-labels", default="train,val,test")
    args = p.parse_args(argv)

    from eel_sdk_spark.functions.pipeline import clean_corpus, mix_sources
    from eel_sdk_spark.session import get_spark

    spark = get_spark(app="clean-corpus")
    try:
        if args.input.startswith("warehouse:"):
            from eel_sdk_spark.table import ManifestTable

            _, wh, *rest = args.input.split(":")
            tbl = ManifestTable(wh, rest[0] if rest else "blocks")
            df = (tbl.read_appended(spark, None, args.since_snapshot)
                  if args.since_snapshot is not None
                  else tbl.read_decoded(spark))
        elif args.since_snapshot is not None:
            raise SystemExit("--since-snapshot requires a "
                             "'warehouse:' --input")
        else:
            df = spark.read.parquet(args.input)
        n_in = df.count()
        from eel_sdk_spark.functions.dedup import (dedup_params,
                                                   validate_store_params)

        dd_params = dedup_params(args.dedup_n_hashes, args.dedup_shingle,
                                 args.dedup_band_size,
                                 args.dedup_hash_family)
        n_after_store = None
        if args.against_store:
            from eel_sdk_spark.functions.dedup import incremental_dedup

            # fail fast on a store built under different minhash params
            # — mismatched bands silently match nothing (ADVICE r5)
            validate_store_params(args.against_store, dd_params)
            df = incremental_dedup(df, spark.read.parquet(args.against_store),
                                   args.text_col, args.id_col,
                                   n_hashes=args.dedup_n_hashes,
                                   shingle=args.dedup_shingle,
                                   band_size=args.dedup_band_size,
                                   hash_family=args.dedup_hash_family)
            n_after_store = df.count()
        if args.quality_labels:
            from pyspark.sql import functions as F

            from eel_sdk_spark.functions import classifier as C

            model = C.train_quality_classifier(
                spark.read.parquet(args.quality_labels),
                args.text_col, args.quality_label_col)
            df = df.filter(C.score_quality(model, F.col(args.text_col))
                           >= args.min_quality_prob)
        benchmark = (spark.read.parquet(args.benchmark)
                     if args.benchmark else None)
        out = clean_corpus(
            df, args.text_col, args.id_col,
            near_dup_threshold=(args.near_dup if args.near_dup >= 0
                                else None),
            cluster_exact=args.cluster_exact,
            min_quality=(args.min_quality if args.min_quality >= 0
                         else None),
            dedup_lines=args.dedup_lines,
            boilerplate_min_docs=args.boilerplate_min_docs,
            substr_window=args.substr_window,
            lm_reference=(spark.read.parquet(args.lm_reference)
                          if args.lm_reference else None),
            max_ppl=args.max_ppl,
            benchmark=benchmark,
            bench_text_col=args.bench_text_col,
            embeddings=(spark.read.parquet(args.embeddings)
                        if args.embeddings else None),
            emb_vec_col=args.emb_vec_col,
            emb_threshold=args.emb_threshold,
            emb_n_list=args.emb_n_list,
            splits=[int(s) for s in args.splits.split(",")],
            split_labels=args.split_labels.split(","))
        if args.mix:
            weights = {}
            for kv in args.mix:
                k, v = kv.split("=", 1)
                weights[k] = float(v)
            out = mix_sources(out, "source", weights, id_col=args.id_col)
        if args.output.startswith("warehouse:"):
            # encode the cleaned corpus straight into a ManifestTable
            # ('split' rides as a column): decode -> clean -> encode in
            # ONE job, no intermediate parquet export. First run
            # bootstraps; later runs append with run lineage, so the
            # cleaned table is itself CDC-followable.
            from eel_sdk_spark.checkpoint import (append_encode,
                                                  encode_with_checkpoint)
            from eel_sdk_spark.table import ManifestTable

            _, wh_out, *rest_o = args.output.split(":")
            out_tbl = ManifestTable(wh_out, rest_o[0] if rest_o
                                    else "blocks")
            out = out.cache()
            if out.isEmpty():
                kept = out.limit(0)
            else:
                if out_tbl.current() is None:
                    encode_with_checkpoint(spark, out, out_tbl,
                                           key=args.id_col, n_parts=8,
                                           run_id="clean")
                else:
                    append_encode(spark, out, out_tbl, run_id="clean")
                kept = out_tbl.read_decoded(spark) if args.since_snapshot                     is None else out
        else:
            out.write.mode("overwrite").partitionBy("split")                 .parquet(args.output)
            try:
                kept = spark.read.parquet(args.output)
            except Exception:
                # a fully-duplicate increment cleans down to ZERO rows:
                # the written dir has no part files to infer a schema
                # from — legitimate in incremental mode, not an error
                kept = out.limit(0)
        if args.write_store:
            from eel_sdk_spark.functions.dedup import (dedupe_store_rows,
                                                       signature_store,
                                                       write_store_params)

            st = signature_store(kept, args.text_col, args.id_col,
                                 n_hashes=args.dedup_n_hashes,
                                 shingle=args.dedup_shingle,
                                 hash_family=args.dedup_hash_family)
            if args.against_store:
                st = spark.read.parquet(args.against_store).unionByName(st)
            # compaction-on-write (r6): overlapping increments re-add
            # rows for already-stored fps — collapse to one row per
            # fingerprint so the store never grows with duplicates
            # (identical fp => identical sigs, detection unchanged)
            st = dedupe_store_rows(st, args.id_col)
            st.write.mode("overwrite").parquet(args.write_store)
            write_store_params(args.write_store, dd_params)
        per_split = {r["split"]: r["n"] for r in
                     kept.groupBy("split").count()
                     .withColumnRenamed("count", "n").collect()}
        sys.stdout.write(json.dumps({
            "rows_in": n_in,
            "rows_after_store_dedup": n_after_store,
            "rows_out": sum(per_split.values()),
            "per_split": per_split,
            "output": args.output,
            "store": args.write_store,
        }) + "\n")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
