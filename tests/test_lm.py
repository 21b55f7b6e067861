"""N-gram LM perplexity scoring (functions/lm.py): exact hand-checked
logprobs on a tiny corpus, junk-vs-natural separation on real docs,
and the CCNet head/middle/tail bucketing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from eel_sdk_spark.functions import lm


def test_stupid_backoff_exact_logprobs(spark):
    """Reference corpus 'a b' x3 + 'a c' x1: P(b|a)=3/4, P(c|a)=1/4.
    Scoring 'a b' must yield exactly log(3/4); an unseen continuation
    backs off to penalty + unigram; an OOV word to penalty + oov."""
    ref = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id bigint, text string")
    model = lm.train_ngram_lm(ref, top_unigrams=100, top_bigrams=100,
                              backoff=0.4)
    probe = spark.createDataFrame(
        [(10, "a b"),        # seen bigram: log(3/4)
         (11, "c a"),        # unseen bigram, seen unigram a (3/8)
         (12, "a zz"),       # OOV target
         (13, "solo")],      # < 2 tokens -> nulls
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in lm.lm_score(probe, model).collect()}
    assert abs(got[10]["avg_logp"] - round(math.log(3 / 4), 4)) < 1e-3
    # unigrams: total tokens = 8 ('a'x4,'b'x3,'c'x1); P(a)=4/8
    exp11 = math.log(0.4) + math.log(4 / 8)
    assert abs(got[11]["avg_logp"] - exp11) < 1e-3
    exp12 = math.log(0.4) + math.log(0.5 / 8)
    assert abs(got[12]["avg_logp"] - exp12) < 1e-3
    assert got[13]["ppl"] is None and got[13]["n_transitions"] == 0
    # ppl consistency
    assert abs(got[10]["ppl"] - math.exp(-got[10]["avg_logp"])) < 0.02


def test_lm_separates_junk_from_reference_like(spark, sf_dir):
    """Train on half the documents; natural docs must score lower ppl
    than shuffled-alphabet junk, and bucketing routes junk to 'tail'."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = d.filter("doc_id % 2 = 0")
    model = lm.train_ngram_lm(ref)
    junk = spark.range(40).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", *[F.concat(F.lit("qx"), F.lit(i),
                                    F.md5((F.col("id") * (i + 1))
                                          .cast("string")))
                           for i in range(25)]).alias("text"),
        F.lit("junk").alias("source"))
    probe = d.filter("doc_id % 2 = 1") \
        .select("doc_id", "text", F.lit("real").alias("source")) \
        .unionByName(junk)
    scored = lm.lm_score(probe, model).join(
        probe.select("doc_id", "source"), "doc_id")
    med = {r["source"]: r["m"] for r in scored.groupBy("source").agg(
        F.expr("percentile_approx(ppl, 0.5)").alias("m")).collect()}
    assert med["junk"] > 5 * med["real"], med

    b = lm.ppl_bucket(scored)
    junk_buckets = {r["ppl_bucket"] for r in
                    b.filter("source = 'junk'").collect()}
    assert junk_buckets == {"tail"}
    frac_head = b.filter("ppl_bucket = 'head'").count() / b.count()
    assert 0.2 < frac_head < 0.45

    # determinism across layout
    again = lm.lm_score(probe.repartition(13), model)
    assert scored.select("doc_id", "avg_logp").exceptAll(
        again.select("doc_id", "avg_logp")).count() == 0


def test_clean_corpus_lm_stage(spark, sf_dir):
    """max_ppl wired into clean_corpus: junk docs are dropped by the
    reference-trained LM while real docs survive."""
    from eel_sdk_spark.functions.pipeline import clean_corpus

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    junk = spark.range(30).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", *[F.md5((F.col("id") * (i + 1)).cast("string"))
                           for i in range(30)]).alias("text"),
        F.lit("junk").alias("source"), F.lit("xx").alias("lang"),
        F.lit(0).cast("long").alias("n_chars"))
    corpus = d.unionByName(junk.select(*d.columns))
    out = clean_corpus(corpus, near_dup_threshold=None, min_quality=None,
                       splits=None, lm_reference=d.limit(300),
                       max_ppl=2000.0)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not any(i >= 1_000_000 for i in ids)     # junk gone
    assert len(ids) > 400                            # real docs survive
