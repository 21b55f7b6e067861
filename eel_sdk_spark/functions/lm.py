"""N-gram language-model quality scoring (the CCNet recipe, public
technique: score web text by the perplexity of a language model trained
on a known-good reference corpus, then keep/bucket by score — the
model-based complement to the rule panel in text.py and the trained
logreg in classifier.py).

Spark-first shape: the MODEL IS A PAIR OF DATAFRAMES — (w, logp)
unigrams and (w1, w2, logp) bigrams, truncated to a bounded head
vocabulary. Training is two combinable aggregations over the reference
corpus (which is small by definition — a curated sample, not the 100 TB
target); scoring is explode-bigrams -> two BROADCAST left joins ->
one groupBy(id) average: pure codegen, no Python anywhere, and exactly
replayable in SQL (unlike a KenLM binary, which this container could
not ship anyway — stated honestly: this is an interpolation-free
stupid-backoff bigram model, the honest dependency-free tier, not
Kneser-Ney).

Backoff (Brants et al. 2007 "stupid backoff", public): a transition
scores its bigram log-probability when the bigram is in the head table,
else backoff_penalty + unigram logp of the target word, else
backoff_penalty + oov_logp. Deterministic end to end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def train_ngram_lm(ref: DataFrame, text_col: str = "text",
                   top_unigrams: int = 100_000,
                   top_bigrams: int = 200_000,
                   backoff: float = 0.4,
                   lowercase: bool = True) -> dict:
    """Model dict: {"unigrams": DF(w, logp), "bigrams": DF(w1, w2, logp),
    "oov_logp": float, "backoff_logp": float, "lowercase": bool}.

    Truncation to the head tables bounds broadcast size at any corpus
    scale; probabilities are maximum-likelihood over the FULL counts
    (truncation drops rare ROWS, it does not re-normalize — stupid
    backoff's scores are relative, not a proper distribution, which is
    exactly why it needs no discounting bookkeeping)."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = tokens(col)
    uni = (ref.select(F.explode(toks).alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))
    total = uni.agg(F.sum("c")).first()[0] or 1
    unigrams = (uni.orderBy(F.desc("c"), F.col("w")).limit(top_unigrams)
                .select("w", F.round(F.log(F.col("c") / F.lit(float(total))),
                                     6).alias("logp")))
    n = F.size(toks)
    pairs = ref.select(
        F.explode(F.when(n >= 2, F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2")))
            .otherwise(F.slice(F.array(
                F.struct(F.lit("").alias("w1"), F.lit("").alias("w2"))),
                1, 0))).alias("p")) \
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    w1tot = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    bigrams = (big.join(w1tot, "w1")
               .orderBy(F.desc("c12"), F.col("w1"), F.col("w2"))
               .limit(top_bigrams)
               .select("w1", "w2",
                       F.round(F.log(F.col("c12") / F.col("c1")), 6)
                       .alias("logp")))
    return {"unigrams": unigrams, "bigrams": bigrams,
            # an unseen word scores as a sub-singleton: half a count
            "oov_logp": round(math.log(0.5 / total), 6),
            "backoff_logp": round(math.log(backoff), 6),
            "lowercase": lowercase}


def lm_score(df: DataFrame, model: dict, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(id, n_transitions, avg_logp, ppl) per document: mean stupid-
    backoff log-probability over bigram transitions and its perplexity
    exp(-avg_logp). Docs with < 2 tokens get null scores (kept — policy
    belongs downstream). Plan: explode (w1, w2) transitions, broadcast
    join the two head tables, one groupBy(id) — document text shuffles
    only as its own transitions, the model never exceeds its caps."""
    col = (F.lower(F.col(text_col)) if model.get("lowercase", True)
           else F.col(text_col))
    toks = tokens(col)
    n = F.size(toks)
    pairs = df.select(
        F.col(id_col),
        F.explode(F.when(n >= 2, F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2")))
            .otherwise(F.slice(F.array(
                F.struct(F.lit("").alias("w1"), F.lit("").alias("w2"))),
                1, 0))).alias("p")) \
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bi = model["bigrams"].select("w1", "w2", F.col("logp").alias("__bi"))
    un = model["unigrams"].select(F.col("w").alias("w2"),
                                  F.col("logp").alias("__uni"))
    scored = (pairs
              .join(F.broadcast(bi), ["w1", "w2"], "left")
              .join(F.broadcast(un), ["w2"], "left")
              .select(id_col, F.coalesce(
                  F.col("__bi"),
                  F.lit(model["backoff_logp"]) + F.col("__uni"),
                  F.lit(model["backoff_logp"])
                  + F.lit(model["oov_logp"])).alias("__lp")))
    agg = (scored.groupBy(id_col)
           .agg(F.count("*").alias("n_transitions"),
                F.round(F.avg("__lp"), 4).alias("avg_logp")))
    out = agg.withColumn("ppl", F.round(F.exp(-F.col("avg_logp")), 2))
    # docs with < 2 tokens never produced a transition — restore them
    short = (df.join(out.select(id_col), id_col, "left_anti")
             .select(F.col(id_col),
                     F.lit(0).cast("long").alias("n_transitions"),
                     F.lit(None).cast("double").alias("avg_logp"),
                     F.lit(None).cast("double").alias("ppl")))
    return out.unionByName(short)


def ppl_bucket(scored: DataFrame, fracs: tuple = (1 / 3, 1 / 3),
               ppl_col: str = "ppl") -> DataFrame:
    """CCNet's head/middle/tail split by perplexity quantiles: lowest
    ``fracs[0]`` of ppl -> 'head' (most reference-like), next
    ``fracs[1]`` -> 'middle', rest -> 'tail'. Thresholds via
    approxQuantile on the score column only (two scalars to the
    driver); null-ppl docs land in 'tail'."""
    quantiles = scored.approxQuantile(
        ppl_col, [fracs[0], fracs[0] + fracs[1]], 0.001)
    if not quantiles:
        # every ppl is null (all docs < 2 tokens): approxQuantile returns
        # an empty list — everything buckets to 'tail' (ADVICE r6 fix)
        return scored.withColumn("ppl_bucket", F.lit("tail"))
    lo, hi = quantiles
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col(ppl_col).isNull(), "tail")
        .when(F.col(ppl_col) <= lo, "head")
        .when(F.col(ppl_col) <= hi, "middle")
        .otherwise("tail"))
