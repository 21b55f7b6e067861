"""Trainable BPE tokenizer (functions/bpe.py): deterministic merge
learning from one word-count pass, canonical greedy inference, and the
distributed token-count path agreeing with the pure-Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_sdk_spark.functions import bpe


def test_train_learns_expected_merges(spark):
    """Hand-checkable corpus: 'aaab' x9 + 'aab' x4. First merge must be
    ('a','a') (count 9*2+4=22 beats any EOW pair); subsequent merges
    deterministic under ties."""
    rows = [(i, "aaab " * 3) for i in range(3)] + \
           [(10 + i, "aab " * 2) for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    model = bpe.train_bpe(df, n_merges=3, min_pair_freq=1)
    assert model["merges"][0] == ["a", "a"]
    again = bpe.train_bpe(df, n_merges=3, min_pair_freq=1)
    assert model["merges"] == again["merges"]  # deterministic

    # inference: 'aaab' under ('a','a') then later merges segments
    # consistently with training's own vocabulary evolution
    toks = bpe.segment_word("aaab", model)
    assert "".join(toks).replace(model["eow"], "") == "aaab"
    assert len(toks) < 4  # merges actually compress

    # unseen word: falls back toward characters, EOW fused on last char
    ov = bpe.segment_word("zzq", model)
    assert "".join(ov).replace(model["eow"], "") == "zzq"
    assert len(ov) == 3


def test_token_counts_distributed_matches_reference(spark, sf_dir):
    """token_counts over real documents == the per-doc sum of
    segment_word lengths (pure-Python reference), and frequent-word
    compression beats the character count."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    model = bpe.train_bpe(d, n_merges=80, top_words=5_000)
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in
           bpe.token_counts(d, model).collect()}
    ref = {}
    for r in d.select("doc_id", "text").collect():
        ref[r["doc_id"]] = sum(
            len(bpe.segment_word(w, model)) for w in r["text"].split())
    assert got == ref
    # the learned merges compress the corpus below its character count
    chars = {r["doc_id"]: r["n"] for r in d.select(
        "doc_id", F.length(F.regexp_replace("text", r"\s+", ""))
        .alias("n")).collect()}
    assert sum(got.values()) < 0.8 * sum(chars.values())
    # and a doc_id-stable rerun is identical (layout independence)
    again = {r["doc_id"]: r["n_bpe_tokens"] for r in
             bpe.token_counts(d.repartition(7), model).collect()}
    assert again == got


def test_token_budget_pipeline_composes(spark, sf_dir):
    """The budget path: train -> token_counts -> mix_sources by token
    budget — the trained counts drive the mixture."""
    from eel_sdk_spark.functions.pipeline import mix_sources

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = bpe.train_bpe(d.limit(200), n_merges=40)
    counts = bpe.token_counts(d, model)
    dd = d.join(counts, "doc_id")
    srcs = sorted(r[0] for r in dd.select("source").distinct().collect())[:2]
    out = mix_sources(dd.filter(F.col("source").isin(*srcs)), "source",
                      {srcs[0]: 2.0, srcs[1]: 1.0},
                      budget_col="n_bpe_tokens")
    toks = {r["source"]: r["t"] for r in
            out.groupBy("source").agg(F.sum("n_bpe_tokens").alias("t"))
            .collect()}
    assert set(toks) <= set(srcs) and len(toks) >= 1
