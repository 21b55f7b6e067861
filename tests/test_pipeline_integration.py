"""End-to-end training-data pipeline: the composition showcase.

corpus -> quality filter -> exact dedup -> near-dup (minhash LSH) removal
-> checkpointed encode into a partitioned manifest table -> constraint-
pruned decode -> verification. Every stage is an engine component; the
whole chain is what a 100 TB crawl-to-training-set job runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_sdk_spark.checkpoint import encode_with_checkpoint
from eel_sdk_spark.corpus import webtext_df
from eel_sdk_spark.encode import decode_blocks_df
from eel_sdk_spark.functions import dedup, text as T
from eel_sdk_spark.table import ManifestTable

N = 3000


def test_dedup_lines_removes_boilerplate(spark):
    """Within-doc line dedup: repeated nav/footer lines collapse to their
    first occurrence, order preserved; the ratio flags the worst docs."""
    docs = spark.createDataFrame(
        [(1, "Accept cookies\nReal content A\nAccept cookies\n"
             "More content\nAccept cookies"),
         (2, "only\nunique\nlines"),
         (3, "x\nx\nx\nx")],
        "id bigint, text string")
    out = {r["id"]: (r["clean"], round(r["ratio"], 4)) for r in docs.select(
        "id",
        T.dedup_lines(F.col("text")).alias("clean"),
        T.line_dup_ratio(F.col("text")).alias("ratio")).collect()}
    assert out[1][0] == "Accept cookies\nReal content A\nMore content"
    assert out[1][1] == 0.4  # 2 of 5 lines were repeats
    assert out[2] == ("only\nunique\nlines", 0.0)
    assert out[3] == ("x", 0.75)


def test_full_pipeline(spark, tmp_path):
    raw = webtext_df(spark, N, parts=4)

    # 1. quality filter + doc stats (JVM expressions only)
    scored = raw.filter(F.col("text").isNotNull()).select(
        "*",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.quality_score(F.col("text")).alias("quality"))
    kept = scored.filter((F.col("n_tokens") >= 5) & (F.col("quality") > 0.2))

    # 2. exact dedup on text bytes
    exact = dedup.exact_dedup(kept, "text", "url")

    # 3. near-dup removal: minhash LSH candidates -> drop the larger url
    cands = dedup.minhash_candidate_pairs(exact, "text", "url",
                                          n_hashes=8, band_size=4)
    to_drop = cands.select(F.col("b").alias("url")).distinct()
    final = exact.join(to_drop, "url", "left_anti") \
        .select("url", "warc_ts", "html", "text", "lang")
    n_final = final.count()
    assert 0 < n_final <= N

    # 4. checkpointed encode into a manifest table
    tbl = ManifestTable(str(tmp_path), "training_blocks")
    run = encode_with_checkpoint(spark, final, tbl, key="url", n_parts=8,
                                 run_id="pipeline")
    assert run["n_rows"] == n_final
    assert run["enc_bytes"] < run["raw_bytes"]

    # 5. decode + verify bit-identity of the surviving corpus
    decoded = decode_blocks_df(
        tbl.read(spark),
        "url string, warc_ts timestamp, html binary, text string, lang string")
    assert decoded.count() == n_final
    bad = (decoded.alias("d").join(final.alias("o"), "url")
           .filter(~(F.col("d.text").eqNullSafe(F.col("o.text"))
                     & F.col("d.html").eqNullSafe(F.col("o.html"))))
           .count())
    assert bad == 0

    # 6. resume is a no-op
    rerun = encode_with_checkpoint(spark, final, tbl, key="url", n_parts=8,
                                   run_id="pipeline2")
    assert rerun["part_ids"] == []


def test_decontamination_flags_13gram_overlap(spark):
    """GPT-3-style decontamination: a doc containing a benchmark's 13-gram
    verbatim is dropped; a 12-word overlap survives; clean docs survive."""
    bench_sent = ("the quick brown fox jumps over the lazy dog while "
                  "seven wizards watch silently")  # 14 words
    words = bench_sent.split()
    assert len(words) == 14
    benchmark = spark.createDataFrame([(bench_sent,)], "text string")
    docs = spark.createDataFrame(
        [(1, "intro text " + bench_sent + " and more trailing words"),
         (2, "prefix " + " ".join(words[:12]) + " then it diverges "
             "completely from the benchmark continuation here"),
         (3, "a totally unrelated document about columnar encoding")],
        "doc_id bigint, text string")
    flagged = {r["doc_id"] for r in dedup.contaminated_ids(
        docs, "text", "doc_id", benchmark, "text", n=13).collect()}
    assert flagged == {1}
    kept = {r["doc_id"] for r in dedup.decontaminate(
        docs, "text", "doc_id", benchmark, "text", n=13).collect()}
    assert kept == {2, 3}
    # the benchmark side is the broadcast side in the plan
    plan = (dedup.contaminated_ids(docs, "text", "doc_id", benchmark,
                                   "text", n=13)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_redact_pii(spark):
    docs = spark.createDataFrame(
        [(1, "contact bob.smith+spam@mail-host.co.uk or +1 (555) 123-4567"),
         (2, "server at 192.168.1.254 went down"),
         (3, "no pii here, just 42 and v1.2 strings")],
        "id bigint, text string")
    out = {r["id"]: r["t"] for r in docs.select(
        "id", T.redact_pii(F.col("text")).alias("t")).collect()}
    assert out[1] == "contact <EMAIL> or <PHONE>"
    assert out[2] == "server at <IP> went down"
    assert out[3] == "no pii here, just 42 and v1.2 strings"


def test_clean_corpus_with_line_dedup_and_decontamination(spark):
    """The full modern pipeline in one plan: boilerplate line dedup ->
    exact dedup -> benchmark decontamination -> split. The boilerplate
    banner must not mask exact duplicates, and the contaminated doc must
    be gone from every split."""
    from eel_sdk_spark.functions.pipeline import clean_corpus

    bench = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi")  # 14 words
    banner = "Accept cookies to continue"
    body = "some genuinely unique training text with enough words here"
    docs = spark.createDataFrame(
        [(1, f"{banner}\n{body}\n{banner}"),     # banner repeats in-doc
         (2, f"{banner}\n{body}\n{banner}\n{banner}"),  # same after clean
         (3, f"fine document containing {bench} verbatim inside"),
         (4, "another clean document that simply survives the pipeline")],
        "doc_id bigint, text string")
    benchmark = spark.createDataFrame([(bench,)], "text string")
    out = clean_corpus(docs, "text", "doc_id",
                       dedup_lines=True, near_dup_threshold=None,
                       min_quality=None, benchmark=benchmark,
                       splits=[80, 10, 10],
                       split_labels=["train", "val", "test"])
    kept = {r["doc_id"] for r in out.collect()}
    # 1 and 2 become identical after line dedup -> exact dedup keeps 1;
    # 3 is contaminated; 4 survives
    assert kept == {1, 4}
    assert set(out.columns) >= {"doc_id", "text", "split"}


def test_resize_images_plumbing(spark):
    """Multimodal resize: fixed output geometry (width*height bytes per
    nonempty blob), deterministic (identical blobs -> identical output),
    empty blobs pass through empty — whole-batch numpy, no per-row
    Python in the fake path."""
    from eel_sdk_spark.functions import multimodal

    docs = spark.createDataFrame(
        [(1, b"abcdefghij" * 40), (2, b"abcdefghij" * 40),
         (3, b"xy"), (4, b"")],
        "doc_id bigint, blob binary")
    out = {r["doc_id"]: r for r in multimodal.resize_images(
        docs, "doc_id", "blob", width=8, height=4).collect()}
    assert len(out[1]["image"]) == 32 and out[1]["width"] == 8
    assert out[1]["image"] == out[2]["image"]  # purity
    assert len(out[3]["image"]) == 32  # tiny blob still fills the grid
    assert out[4]["image"] == b""


def test_sketches_profile_and_mergeable_hll(spark, sf_dir):
    """One-pass column profile (counts, HLL distinct, quantiles) and the
    STORED-sketch workflow: per-partition HLL sketches unioned later must
    estimate the same cardinality as a direct sketch over everything."""
    from eel_sdk_spark.functions import sketches as S

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prof = {r["col"]: r for r in S.column_profile(
        o, ["o_orderkey", "o_custkey", "o_orderpriority"]).collect()}
    n = o.count()
    exact_keys = o.select("o_orderkey").distinct().count()
    assert prof["o_orderkey"]["n"] == n and prof["o_orderkey"]["n_nulls"] == 0
    assert abs(prof["o_orderkey"]["approx_distinct"] - exact_keys) \
        <= exact_keys * 0.05
    assert prof["o_orderkey"]["quantiles"] is not None
    assert prof["o_orderpriority"]["quantiles"] is None  # non-numeric
    assert prof["o_orderpriority"]["approx_distinct"] == 5

    # mergeable sketches: shard -> store -> union == direct
    shards = (o.withColumn("shard", F.pmod(F.col("o_orderkey"), F.lit(8)))
              .groupBy("shard")
              .agg(S.distinct_sketch("o_custkey").alias("sk")))
    merged = shards.agg(
        S.sketch_estimate(S.merge_sketches("sk")).alias("est")).first()["est"]
    direct = o.agg(S.sketch_estimate(
        S.distinct_sketch("o_custkey")).alias("e")).first()["e"]
    assert merged == direct  # sketch union is exact w.r.t. the sketch


def test_pack_sequences(spark, sf_dir):
    """Sample packing: every doc lands in exactly one pack; no pack except
    oversized-singletons exceeds max_len; fill is high on real length
    distributions; metadata-only operator."""
    from eel_sdk_spark.functions import text as TT
    from eel_sdk_spark.functions.packing import pack_sequences, packing_stats

    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .select("doc_id", TT.token_count(F.col("text")).alias("n_tok")))
    L = 256
    packs = pack_sequences(d, "doc_id", "n_tok", max_len=L).cache()
    rows = packs.collect()
    # partition: every doc exactly once
    all_ids = [i for r in rows for i in r["doc_ids"]]
    assert sorted(all_ids) == sorted(r["doc_id"] for r in d.collect())
    assert len(set(r["pack_id"] for r in rows)) == len(rows)
    # budget respected except oversized singletons
    for r in rows:
        assert r["total_tokens"] <= L or r["n_docs"] == 1
    st = packing_stats(packs, max_len=L).first()
    assert st["n_packs"] == len(rows)
    assert st["mean_fill"] > 0.5  # real web lengths pack densely
    packs.unpersist()


def test_pack_sequences_oversized_and_boundaries(spark):
    """Edge semantics: a doc longer than max_len is alone in its own
    pack; exact-fit docs close packs; batch boundaries don't split or
    duplicate (single partition, deterministic order)."""
    from eel_sdk_spark.functions.packing import pack_sequences

    rows = [(1, 100), (2, 100), (3, 56), (4, 300), (5, 10), (6, 246)]
    df = (spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
          .coalesce(1))
    packs = {tuple(r["doc_ids"]): r for r in
             pack_sequences(df, "doc_id", "n_tok", max_len=256).collect()}
    assert (1, 2, 3) in packs and packs[(1, 2, 3)]["total_tokens"] == 256
    assert (4,) in packs and packs[(4,)]["total_tokens"] == 300  # oversize
    assert (5, 6) in packs and packs[(5, 6)]["total_tokens"] == 256


def test_materialize_packs_preserves_order(spark):
    from eel_sdk_spark.functions.packing import (materialize_packs,
                                                 pack_sequences)

    docs = spark.createDataFrame(
        [(1, "aaa", 3), (2, "bb", 2), (3, "cccc", 4), (4, "d", 1)],
        "doc_id bigint, text string, n_tok bigint").coalesce(1)
    packs = pack_sequences(docs, "doc_id", "n_tok", max_len=5)
    seqs = {r["pack_id"]: r["sequence"] for r in materialize_packs(
        packs, docs, "doc_id", "text", sep="|").collect()}
    # pack 1: docs 1+2 (3+2=5); pack 2: doc 3 (4) + doc 4 (1)
    assert sorted(seqs.values()) == ["aaa|bb", "cccc|d"]


def test_mix_sources(spark, sf_dir):
    """Mixture resampling: output proportions approach the target
    weights, selection is deterministic (same ids across physical
    layouts), and no source is ever upsampled."""
    from eel_sdk_spark.functions.pipeline import mix_sources

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srcs = [r[0] for r in d.select("source").distinct().collect()]
    assert len(srcs) >= 2
    a, b = sorted(srcs)[:2]
    out = mix_sources(d.filter(F.col("source").isin(a, b)),
                      "source", {a: 3.0, b: 1.0})
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    ratio = got[a] / got[b]
    assert 2.0 < ratio < 4.5, got  # ~3:1 at md5-bucket granularity
    # never upsample
    avail = {r["source"]: r["n"] for r in
             d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got[a] <= avail[a] and got[b] <= avail[b]
    # deterministic across layout changes
    out2 = mix_sources(d.filter(F.col("source").isin(a, b)).repartition(13),
                       "source", {a: 3.0, b: 1.0})
    assert out.select("doc_id").exceptAll(out2.select("doc_id")).count() == 0


def test_audio_windows(spark):
    """Overlapping window framing: exact byte slabs at hop strides,
    trailing partials dropped, short blobs yield nothing."""
    from eel_sdk_spark.functions import multimodal

    blob = bytes(range(10)) * 2  # 20 bytes: 0..9,0..9
    docs = spark.createDataFrame(
        [(1, blob), (2, b"tiny"), (3, b"")],
        "doc_id bigint, blob binary")
    rows = multimodal.audio_windows(docs, "doc_id", "blob",
                                    window=8, hop=4).collect()
    by_key = {(r["doc_id"], r["win_idx"]): r for r in rows}
    # (20-8)//4+1 = 4 windows for doc 1; none for 2 (4<8) and 3
    assert {k[0] for k in by_key} == {1} and len(by_key) == 4
    assert by_key[(1, 0)]["chunk"] == blob[0:8]
    assert by_key[(1, 1)]["chunk"] == blob[4:12]
    assert by_key[(1, 3)]["chunk"] == blob[12:20]
    assert by_key[(1, 2)]["win_off"] == 8


def test_mix_sources_edges(spark):
    """Zero-weight sources drop; sources missing from weights drop;
    a weight on an absent source doesn't divide by zero; single-source
    weights keep everything."""
    from eel_sdk_spark.functions.pipeline import mix_sources

    d = spark.createDataFrame(
        [(i, "web" if i % 3 else "code") for i in range(300)],
        "doc_id bigint, source string")
    only_web = mix_sources(d, "source", {"web": 1.0, "code": 0.0})
    assert only_web.filter(F.col("source") == "code").count() == 0
    assert only_web.count() == d.filter(F.col("source") == "web").count()

    dropped = mix_sources(d, "source", {"web": 1.0})
    assert dropped.filter(F.col("source") == "code").count() == 0

    keep_all = mix_sources(d, "source", {"web": 1.0, "code": 0.5})
    # code is the binding source (100 rows / 0.333 share): web keeps
    # 2x code's rows (within bucket granularity), nothing upsampled
    got = {r["source"]: r["n"] for r in
           keep_all.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["code"] <= 100 and got["web"] <= 200

    # a POSITIVE weight on an absent source makes the mixture infeasible
    # (feasible=0 would silently empty the corpus) — must raise, and with
    # missing='skip' must warn, drop it, and renormalize over the rest
    import warnings

    import pytest

    with pytest.raises(ValueError, match="zero available rows"):
        mix_sources(d, "source", {"web": 1.0, "books": 0.5})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        skipped = mix_sources(d, "source", {"web": 1.0, "books": 0.5},
                              missing="skip")
        assert skipped.count() == d.filter(F.col("source") == "web").count()
        assert any("books" in str(x.message) for x in w)
    # every positively-weighted source absent -> empty result, no raise
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        none_left = mix_sources(d, "source", {"books": 1.0}, missing="skip")
    assert none_left.count() == 0


def test_clean_corpus_semantic_stage(spark):
    """Optional SemDeDup stage: two paraphrases share no 3-gram (lexical
    near-dup misses them) but near-identical embeddings — the semantic
    stage drops the larger id; docs WITHOUT an embedding are never
    dropped by it; defaults-off leaves the oracle pipeline unchanged."""
    from eel_sdk_spark.functions.pipeline import clean_corpus

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog at dawn"),
         (2, "a speedy auburn fox leaps across one sleepy hound by sunrise"),
         (3, "completely unrelated text about parquet column encodings"),
         (4, "no embedding for this row but it must survive anyway")],
        "doc_id bigint, text string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (2, [1.0, 0.001, 0.0, 0.0]),     # paraphrase of 1
         (3, [0.0, 1.0, 0.0, 0.0])],
        "doc_id bigint, embedding array<double>")
    base = clean_corpus(docs, near_dup_threshold=0.5, min_quality=None)
    assert base.count() == 4  # lexically all distinct
    sem = clean_corpus(docs, near_dup_threshold=0.5, min_quality=None,
                       embeddings=emb, emb_threshold=0.99, emb_n_list=2)
    ids = {r["doc_id"] for r in sem.select("doc_id").collect()}
    assert ids == {1, 3, 4}  # 2 dominated by 1; 4 (no embedding) kept


def test_pack_and_decontam_empty_inputs(spark):
    """Empty corpora flow through the new operators without errors."""
    from eel_sdk_spark.functions import dedup
    from eel_sdk_spark.functions.packing import pack_sequences

    empty = spark.createDataFrame([], "doc_id bigint, text string, "
                                      "n_tok bigint")
    bench = spark.createDataFrame([("some benchmark text here",)],
                                  "text string")
    assert pack_sequences(empty, "doc_id", "n_tok").count() == 0
    assert dedup.contaminated_ids(empty, "text", "doc_id",
                                  bench, "text").count() == 0
    assert dedup.decontaminate(empty, "text", "doc_id",
                               bench, "text").count() == 0


def test_strip_control_and_dup_ngram(spark):
    docs = spark.createDataFrame(
        [(1, "hello\x00wor\x1fld\tkeep\nlines\x9c"),
         (2, "the cat sat on the mat the cat sat on the mat"),
         (3, "all words completely different here now")],
        "id bigint, text string")
    out = {r["id"]: (r["clean"], round(r["d3"], 3)) for r in docs.select(
        "id",
        T.strip_control_chars(F.col("text")).alias("clean"),
        T.dup_ngram_ratio(F.col("text"), 3).alias("d3")).collect()}
    assert out[1][0] == "helloworld\tkeep\nlines"
    # doc 2: 11 tokens -> 9 trigrams, 7 distinct ("the cat sat",
    # "cat sat on", "sat on the", "on the mat" repeat once each... )
    assert out[2][1] > 0.2
    assert out[3][1] == 0.0


def test_mix_sources_by_token_budget(spark):
    """budget_col mixes by TOKENS, which is what a pretraining recipe
    means: with source A's docs 10x longer than B's, a 50/50 token
    target keeps ~equal token mass from each (doc-count mixing would be
    off by the length ratio), membership stays deterministic."""
    from eel_sdk_spark.functions.pipeline import mix_sources
    from pyspark.sql import functions as F

    rows = [(i, "A", 1000) for i in range(2000)] + \
           [(2000 + i, "B", 100) for i in range(8000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, "
                                     "n_tokens int")
    out = mix_sources(df, "source", {"A": 1.0, "B": 1.0},
                      budget_col="n_tokens")
    tok = {r["source"]: r["t"] for r in
           out.groupBy("source").agg(F.sum("n_tokens").alias("t"))
           .collect()}
    total = sum(tok.values())
    assert abs(tok["A"] / total - 0.5) < 0.03, tok
    assert abs(tok["B"] / total - 0.5) < 0.03, tok
    # feasibility: B is the binding source by tokens (800k vs A's 2M) —
    # all of B's mass is kept, A is downsampled toward it
    assert tok["B"] == 800_000
    assert tok["A"] < 2_000_000
    # deterministic across layout
    again = mix_sources(df.repartition(11), "source",
                        {"A": 1.0, "B": 1.0}, budget_col="n_tokens")
    assert out.select("doc_id").exceptAll(
        again.select("doc_id")).count() == 0


def test_boilerplate_lines_census_and_removal(spark):
    """Cross-document boilerplate pass (r6): lines repeated across
    >= min_docs DISTINCT docs are stripped, order preserved, per-doc
    repeats count once, short lines are exempt, and a DuckDB replica
    confirms the census exactly."""
    import duckdb

    from eel_sdk_spark.functions.pipeline import (boilerplate_lines,
                                                  remove_boilerplate_lines)

    banner = "Accept our cookies to continue browsing this site"
    nav = "Home | About | Products | Contact | Careers"
    rows = []
    for i in range(20):
        body = f"unique article body number {i} with real words"
        # banner on every page (twice on page 0 — must count ONCE),
        # nav on half, a short common line everywhere (exempt: < 10)
        lines = [banner, body, "-----", nav if i % 2 == 0 else
                 f"only here {i} extra"]
        if i == 0:
            lines.append(banner)
        rows.append((i, "\n".join(lines), f"src{i%3}"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                                     "source string")

    census = boilerplate_lines(df, min_docs=10).collect()
    got = {r["line"]: r["n_docs"] for r in census}
    assert got == {banner: 20, nav: 10}  # per-doc distinct: 20 not 21

    # DuckDB replica of the census
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    duck = {r[0]: r[1] for r in con.sql("""
        SELECT line, count(*) AS n FROM (
            SELECT doc_id, unnest(list_distinct(string_split(text,
                chr(10)))) AS line FROM docs)
        WHERE length(trim(line)) >= 10
        GROUP BY line HAVING count(*) >= 10""").fetchall()}
    assert duck == got

    out = remove_boilerplate_lines(df, min_docs=10)
    assert out.count() == 20  # row count preserved
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    for i in range(20):
        assert banner not in texts[i] and nav not in texts[i]
        assert f"unique article body number {i}" in texts[i]
        assert "-----" in texts[i]  # short line exempt
    # order preserved: body before separator
    t5 = texts[5].split("\n")
    assert t5.index(f"unique article body number 5 with real words") \
        < t5.index("-----")
    # other columns pass through
    assert out.filter(F.col("source").isNull()).count() == 0

    # a doc that is ENTIRELY boilerplate survives as empty text
    allbp = spark.createDataFrame(
        [(100, banner, "x")] , "doc_id bigint, text string, source string")
    merged = df.unionByName(allbp)
    out2 = remove_boilerplate_lines(merged, min_docs=10)
    assert out2.count() == 21
    assert out2.filter("doc_id = 100").first()["text"] == ""

    # determinism across physical layout
    again = remove_boilerplate_lines(df.repartition(13), min_docs=10)
    assert out.exceptAll(again).count() == 0


def test_clean_corpus_boilerplate_stage(spark):
    """boilerplate_min_docs wired into clean_corpus: the banner is gone
    from every surviving doc and the rest of the pipeline still runs."""
    from eel_sdk_spark.functions.pipeline import clean_corpus

    banner = "Subscribe to our newsletter for the latest updates here"
    rows = [(i, f"genuine content piece {i} " + " ".join(
        f"w{i}x{j}" for j in range(8)) + "\n" + banner)
        for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = clean_corpus(df, near_dup_threshold=None, min_quality=None,
                       splits=None, boilerplate_min_docs=10)
    assert out.count() == 30
    assert out.filter(F.col("text").contains(banner)).count() == 0
    assert out.filter(F.col("text").contains("genuine content")).count() == 30
