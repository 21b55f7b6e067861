"""Gate-scale stress for the heavy dedup operators (r6, VERDICT r5 #7).

    python -m jobs.dedup_stress [--docs-mult 10] [--emb-mult 25]

The sf0.1 gate sweep proves correctness at 5k docs; this proves the
PLAN SHAPE holds an order of magnitude up — the nonlinear-blowup check
(degenerate LSH buckets, pair-join quadratics, SemDeDup cell blowups)
that small scale cannot provide. Builds a deterministic ~sf1-equivalent
corpus from the sf0.1 tables (no RNG, no external data):

- documents x ``docs_mult``: copy c of each base doc remixes the token
  order by family (original / sorted / reversed — three DISJOINT
  shingle sets) plus a per-copy tag token, so copies of the same base
  and family are planted NEAR-DUPS (not exact), giving ~60k verified
  pairs at x10 — a duplicate-laden web corpus, not a no-op input.
- embeddings x ``emb_mult``: copy c shifts every component by c*1e-3,
  planting dense cosine near-dup clusters that push SemDeDup's
  max_cell guard.

For each operator: wall seconds, output rows, and shuffle write bytes
(total + peak single stage, from the local Spark UI REST API — the
"would this shuffle drown a 1000-executor job" signal). One JSON line
per op + a summary line; paste into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request


def _stages(ui: str) -> dict[int, dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    out = {}
    for s in json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete")):
        out[(s["stageId"], s["attemptId"])] = s
    return out


def _shuffle_stats(ui: str, before: dict) -> dict:
    after = _stages(ui)
    new = [s for k, s in after.items() if k not in before]
    total_w = sum(s.get("shuffleWriteBytes", 0) for s in new)
    peak_w = max((s.get("shuffleWriteBytes", 0) for s in new), default=0)
    return {"stages": len(new),
            "shuffle_write_mb": round(total_w / 1e6, 1),
            "peak_stage_shuffle_mb": round(peak_w / 1e6, 1)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--docs-mult", type=int, default=10)
    p.add_argument("--emb-mult", type=int, default=25)
    p.add_argument("--cpus", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from eel_sdk_spark.functions import dedup
    from eel_sdk_spark.functions.text import tokens
    from eel_sdk_spark.session import get_spark

    import os

    # the UI REST API is the shuffle-bytes source; get_spark disables
    # the UI by default, so enable it for this one process
    os.environ.setdefault("EEL_SPARK_UI", "1")
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("dedup-stress")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_base = base.count()
    copies = spark.range(args.docs_mult).withColumnRenamed("id", "c")
    toks = tokens(F.col("text"))
    fam = F.pmod(F.col("c"), F.lit(3))
    remix = (F.when(fam == 0, F.col("text"))
             .when(fam == 1, F.concat_ws(" ", F.sort_array(toks)))
             .otherwise(F.concat_ws(" ", F.reverse(toks))))
    docs = (base.crossJoin(copies)
            .select((F.col("doc_id") + F.col("c") * n_base).alias("doc_id"),
                    F.concat(remix, F.lit(" tag"),
                             F.col("c").cast("string")).alias("text"))
            .repartition(args.cpus).cache())
    n_docs = docs.count()

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n_emb = emb.count()
    ecopies = spark.range(args.emb_mult).withColumnRenamed("id", "c")
    vecs = (emb.crossJoin(ecopies)
            .select((F.col("vec_id") + F.col("c") * n_emb).alias("vec_id"),
                    F.transform("embedding",
                                lambda v: (v + F.col("c").cast("double")
                                           * F.lit(1e-3)).cast("float"))
                    .alias("embedding"))
            .repartition(args.cpus).cache())
    n_vecs = vecs.count()
    sys.stdout.write(json.dumps(
        {"docs": n_docs, "vecs": n_vecs, "base_docs": n_base}) + "\n")

    def run(name, fn):
        snap = _stages(ui)
        t0 = time.monotonic()
        n = fn().count()
        rec = {"op": name, "wall_sec": round(time.monotonic() - t0, 2),
               "rows": n, **_shuffle_stats(ui, snap)}
        sys.stdout.write(json.dumps(rec) + "\n")
        sys.stdout.flush()
        return rec

    run("minhash_pairs", lambda: dedup.minhash_candidate_pairs(
        docs, "text", "doc_id", n_hashes=4, band_size=2))
    run("jaccard_pairs", lambda: dedup.jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.2,
        n_hashes=4, band_size=2))
    run("dup_clusters", lambda: dedup.connected_components(
        dedup.jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2,
                            n_hashes=4, band_size=2).select("a", "b")))
    store = dedup.signature_store(docs, "text", "doc_id", n_hashes=4) \
        .repartition(args.cpus).cache()
    store.count()
    batch = (base.select((F.col("doc_id") + args.docs_mult * n_base)
                         .alias("doc_id"),
                         F.concat("text", F.lit(" fresh batch")).alias("text")))
    run("incremental_dup_ids", lambda: dedup.incremental_dup_ids(
        batch, store, "text", "doc_id", n_hashes=4, band_size=2))
    run("semantic_dedup", lambda: dedup.semantic_dedup(
        vecs, "vec_id", "embedding", threshold=0.9, n_list=512))
    # r6 ops: exact-substring span dedup (every copy family shares its
    # base's full token stream -> long repeated windows by construction)
    # and the cross-document boilerplate census
    run("duplicate_spans_w20", lambda: dedup.duplicate_spans(
        docs, "text", "doc_id", window=20))
    from eel_sdk_spark.functions.pipeline import boilerplate_lines

    run("boilerplate_census", lambda: boilerplate_lines(
        docs.withColumn("text", F.regexp_replace("text", " tag", "\ntag")),
        min_docs=100, min_len=3))
    # model-based quality + tokenizer paths at the same scale
    from eel_sdk_spark.functions import bpe as B
    from eel_sdk_spark.functions import lm as L

    lm_model = L.train_ngram_lm(base)
    run("lm_score", lambda: L.lm_score(docs, lm_model))
    bpe_model = B.train_bpe(base, n_merges=200)
    run("bpe_token_counts", lambda: B.token_counts(docs, bpe_model))
    # r7: the three newly-gated ops at the same 50k scale
    from eel_sdk_spark.functions.graph import pagerank
    from eel_sdk_spark.functions.packing import pack_sequences
    from eel_sdk_spark.functions.pipeline import weighted_sample

    edges = (docs.select(
        F.concat(F.lit("h"), F.col("doc_id") % 503).alias("src_host"),
        F.concat(F.lit("h"), (F.col("doc_id") * F.col("doc_id")) % 503)
        .alias("dst_host"))
        .filter(F.col("src_host") != F.col("dst_host")).distinct())
    run("pagerank_5it", lambda: pagerank(edges, max_iter=5, tol=0.0))
    run("weighted_sample", lambda: weighted_sample(
        docs.withColumn("w", F.length("text").cast("double")), "w", 0.3))
    run("pack_sequences", lambda: pack_sequences(
        docs.select("doc_id", F.length("text").alias("n_tok")),
        "doc_id", "n_tok", max_len=4096))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
