"""The training-data cleanup pipeline: what a 10^12-doc corpus actually
runs before a token ever reaches a model — composed entirely from this
package's oracle-checked building blocks, so the WHOLE pipeline stays
DuckDB-replayable for the correctness gate.

Stages (each optional, all one lazy plan — Catalyst fuses the filters):
0. line dedup           — within-doc repeated-line removal (boilerplate:
                          nav bars / cookie banners, text.dedup_lines)
1. exact dedup          — md5-fingerprint groupBy, keep min-id (dedup.py)
2. near-dup removal     — MinHash/LSH candidates + exact Jaccard verify;
                          of each verified pair (a < b) the larger id is
                          dropped. Pair-wise removal, not connected
                          components: one shuffle instead of an iterative
                          algorithm, and for web near-dup clusters (dense:
                          every member collides with the min under LSH)
                          it keeps exactly the min-id representative.
3. quality filter       — text.quality_score threshold (text.py)
4. decontamination      — drop docs sharing a 13-gram with a benchmark
                          table (dedup.contaminated_ids)
5. split assignment     — deterministic md5-routed train/val/test
                          (text.hash_split): stable across runs, cluster
                          sizes, and row order.

Scale shape: nothing here shuffles document text except the n-gram
explode inside MinHash (inherent); every filter is a broadcast-able
left_anti on 8-byte ids or a Column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from . import text as T


def boilerplate_lines(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      min_docs: int = 10,
                      min_len: int = 10) -> DataFrame:
    """CROSS-document boilerplate census: lines repeated verbatim in
    >= ``min_docs`` DISTINCT documents (nav bars, cookie banners,
    footers, share buttons — the RefinedWeb/CCNet global line pass;
    ``text.dedup_lines`` removes only WITHIN-doc repeats and cannot
    see a banner that appears once per page across a whole host).
    Returns (line_hash, n_docs, line).

    Scale shape: per-doc DISTINCT lines (array_distinct — one page
    repeating its banner 50x still counts once), length-gated
    (short connectives like a bare '.' would dominate), then ONE
    combinable groupBy on the 16-byte md5 of the line —
    count(*) == distinct docs because the doc side is already
    deduped, so no count_distinct shuffle of ids is needed. Document
    text never shuffles; only (hash, line-once) pairs move, and the
    representative line rides as min() for reporting."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), "\n")))
        .alias("line"))
    lines = lines.filter(F.length(F.trim(F.col("line"))) >= min_len)
    return (lines
            .select(F.md5(F.encode(F.col("line"), "utf-8")).alias("line_hash"),
                    F.col("line"))
            .groupBy("line_hash")
            .agg(F.count("*").alias("n_docs"), F.min("line").alias("line"))
            .filter(F.col("n_docs") >= min_docs))


def remove_boilerplate_lines(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             min_docs: int = 10,
                             min_len: int = 10,
                             boilerplate: DataFrame | None = None) -> DataFrame:
    """Strip globally-repeated lines from every document, preserving
    the order of the surviving lines (other columns pass through).
    ``boilerplate`` lets a caller reuse a precomputed
    :func:`boilerplate_lines` census (e.g. computed once per crawl
    snapshot, applied to many slices).

    Scale shape: the census side is (hash) only and broadcast into a
    LEFT ANTI against the exploded (id, pos, line) frame; the rebuild
    groupBy(id) is the ONE unavoidable text shuffle (same honest note
    as materialize_packs), with order restored via array_sort over
    (pos, line) structs — deterministic, no window. Documents whose
    every line was boilerplate come back as '' (kept, not dropped —
    dropping is a policy decision for the quality filter downstream)."""
    if boilerplate is None:
        boilerplate = boilerplate_lines(df, text_col, id_col,
                                        min_docs, min_len)
    bp = boilerplate.select("line_hash")
    other_cols = [c for c in df.columns if c != text_col]
    exploded = df.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("__pos", "__line"))
    kept = exploded.join(
        F.broadcast(bp),
        F.md5(F.encode(F.col("__line"), "utf-8")) == F.col("line_hash"),
        "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(*[F.first(c).alias(c) for c in other_cols
                      if c != id_col],
                    F.concat_ws(
                        "\n",
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("__pos", "__line"))),
                            lambda s: s["__line"])).alias(text_col)))
    # docs that lost EVERY line vanish from the groupBy — restore them
    # with empty text so row count (and id lineage) is preserved
    empties = (df.join(rebuilt.select(id_col), id_col, "left_anti")
               .select(*other_cols)
               .withColumn(text_col, F.lit("")))
    return rebuilt.select(*df.columns).unionByName(
        empties.select(*df.columns))


def mix_sources(df: DataFrame, source_col: str, weights: dict[str, float],
                id_col: str = "doc_id", epsilon: float = 1e-9,
                missing: str = "raise",
                budget_col: str | None = None) -> DataFrame:
    """Data mixing: resample a multi-source corpus toward target mixture
    WEIGHTS (the "20% code, 40% web, ..." knob every pretraining recipe
    turns). Sources are downsampled only (never duplicated): the largest
    feasible total is computed from the per-source counts, each source
    gets fraction = target_rows / available_rows, and rows are kept by a
    DETERMINISTIC content hash of the id — stable across runs, cluster
    sizes, and row order (same md5-bucket trick as hash_split), unlike
    ``sampleBy``'s RNG-per-partition sampling which reshuffles membership
    whenever the partitioning changes.

    One tiny counts aggregate + one filter over the corpus; text never
    shuffles. Sources absent from ``weights`` are dropped. A positively
    weighted source with ZERO available rows would make feasible = 0 and
    silently empty the whole corpus — that raises instead (pass
    ``missing='skip'`` to warn, drop the absent source from the mixture,
    and renormalize the remaining weights).

    ``budget_col`` switches the mixture accounting from ROWS to a
    per-row budget (a token count — what "20% code" actually means in a
    pretraining recipe): per-source availability and the feasible total
    are computed over SUM(budget_col), and the kept-row bucket is
    independent of document length, so each source's expected kept
    budget hits its target share (the realized share concentrates at
    corpus scale; doc-count mixing can be off by the ratio of mean doc
    lengths between sources)."""
    measure = (F.count("*") if budget_col is None
               else F.sum(F.coalesce(F.col(budget_col).cast("double"),
                                     F.lit(0.0))))
    counts = {r[0]: r[1] for r in
              df.groupBy(source_col).agg(measure.alias("count"))
              .collect()}
    absent = sorted(s for s, w in weights.items()
                    if w > 0 and counts.get(s, 0) == 0)
    if absent:
        if missing == "skip":
            import warnings

            warnings.warn(
                f"mix_sources: positively-weighted source(s) {absent} have "
                f"zero rows — dropped from the mixture", stacklevel=2)
            weights = {s: w for s, w in weights.items() if s not in absent}
            if not any(w > 0 for w in weights.values()):
                return df.filter(F.lit(False))
        else:
            raise ValueError(
                f"mix_sources: positively-weighted source(s) {absent} have "
                f"zero available rows — the mixture is infeasible (every "
                f"source would be scaled to 0). Fix the weights or pass "
                f"missing='skip'.")
    total_w = sum(weights.values())
    # the binding source limits the total corpus size
    feasible = min(counts.get(s, 0) / (w / total_w)
                   for s, w in weights.items() if w > 0)
    frac = {s: min(1.0, (w / total_w) * feasible /
                   max(counts.get(s, 0), 1))
            for s, w in weights.items()}
    bucket = F.pmod(F.conv(F.substring(
        F.md5(F.encode(F.col(id_col).cast("string"), "utf-8")), 1, 8),
        16, 10).cast("long"), F.lit(1_000_000)) / 1_000_000.0
    cond = None
    for s, f in frac.items():
        keep = (F.col(source_col) == s) & (bucket < f + epsilon)
        cond = keep if cond is None else (cond | keep)
    return df.filter(cond if cond is not None else F.lit(False))


def weighted_sample(df: DataFrame, weight_col: str, target_frac: float,
                    id_col: str = "doc_id",
                    epsilon: float = 1e-9) -> DataFrame:
    """Quality-weighted deterministic downsampling: keep each row with
    probability proportional to ``weight_col`` (e.g. its host's
    PageRank from :func:`~eel_sdk_spark.functions.graph.
    host_rank_weights`, or a quality score), scaled so the EXPECTED
    kept fraction is ``target_frac``. Membership is the same md5 bucket
    of the id as :func:`mix_sources` / ``hash_split`` — stable across
    runs, cluster sizes, and row order, never RNG.

    High weights saturate (keep probability clamps at 1), which would
    leave the realized fraction under target; ONE rescale pass computes
    the clamped expectation on the weight column alone (two narrow
    aggregates total — the corpus body never shuffles) and re-scales
    the unclamped mass to compensate. If even keeping every positive-
    weight row cannot reach ``target_frac`` (mass too concentrated),
    the result honestly under-fills rather than duplicating rows.
    Null/negative weights are treated as 0 (never kept)."""
    if not 0.0 < target_frac <= 1.0:
        raise ValueError("target_frac must be in (0, 1]")
    w = F.greatest(F.coalesce(F.col(weight_col).cast("double"),
                              F.lit(0.0)), F.lit(0.0))
    mean_w = df.agg(F.avg(w)).first()[0] or 0.0
    if mean_w <= 0.0:
        return df.filter(F.lit(False))
    scale = target_frac / mean_w
    # expectation under the clamp, then one corrective rescale of the
    # unclamped (p < 1) mass
    row = df.agg(
        F.avg(F.least(w * scale, F.lit(1.0))).alias("e"),
        F.avg(F.when(w * scale < 1.0, w * scale)
              .otherwise(F.lit(0.0))).alias("e_unclamped"),
        F.avg(F.when(w * scale >= 1.0, F.lit(1.0))
              .otherwise(F.lit(0.0))).alias("e_clamped")).first()
    deficit = target_frac - row["e"]
    boost = 1.0
    if deficit > 0 and row["e_unclamped"] > 0:
        boost = 1.0 + deficit / row["e_unclamped"]
    p = F.least(w * scale * boost, F.lit(1.0))
    bucket = F.pmod(F.conv(F.substring(
        F.md5(F.encode(F.col(id_col).cast("string"), "utf-8")), 1, 8),
        16, 10).cast("long"), F.lit(1_000_000)) / 1_000_000.0
    # epsilon only applies to POSITIVE probabilities: a row whose md5
    # bucket is exactly 0 must still be dropped when its weight is
    # 0/null/negative (p == 0), honoring the "never kept" contract
    # (ADVICE r5)
    return df.filter((p > 0.0) & (bucket < p + epsilon))


def clean_corpus(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 exact: bool = True,
                 near_dup_threshold: float | None = 0.5,
                 cluster_exact: bool = False,
                 n_hashes: int = 4, band_size: int = 2,
                 min_quality: float | None = 0.3,
                 splits: list[int] | None = None,
                 split_labels: list[str] | None = None,
                 dedup_lines: bool = False,
                 boilerplate_min_docs: int | None = None,
                 substr_window: int | None = None,
                 lm_reference: DataFrame | None = None,
                 max_ppl: float | None = None,
                 benchmark: DataFrame | None = None,
                 bench_text_col: str = "text",
                 decontam_ngram: int = 13,
                 embeddings: DataFrame | None = None,
                 emb_vec_col: str = "embedding",
                 emb_threshold: float = 0.95,
                 emb_n_list: int = 64,
                 emb_centroids=None) -> DataFrame:
    """Returns the cleaned corpus with an added ``split`` column.

    ``near_dup_threshold=None`` / ``min_quality=None`` / ``splits=None``
    skip the respective stage; ``dedup_lines=True`` rewrites each doc's
    repeated lines away BEFORE dedup/quality (so boilerplate doesn't mask
    near-dups); ``boilerplate_min_docs`` additionally strips lines
    repeated across >= that many DISTINCT docs (the cross-document
    RefinedWeb-style global line pass, remove_boilerplate_lines);
    ``substr_window`` enables exact-substring span dedup (cut repeated
    >= window-token passages, dedup.remove_duplicate_spans);
    ``benchmark`` enables 13-gram decontamination;
    ``embeddings`` (a (id_col, emb_vec_col) table) enables SemDeDup-style
    semantic dedup AFTER the lexical near-dup stage — drops docs whose
    embedding is dominated by a smaller-id cell-mate at cosine >=
    ``emb_threshold`` (catches paraphrases lexical n-grams miss);
    ``emb_centroids`` forwards an explicit codebook to the semantic
    stage (e.g. ``kmeans``-trained, or an IvfIndex's centroids so dedup
    cells line up with the serving index — see the BENCH.md recall
    table for when training pays)."""
    out = df
    if dedup_lines:
        out = out.withColumn(text_col, T.dedup_lines(F.col(text_col)))
    if boilerplate_min_docs is not None:
        # cross-doc pass: a banner appearing ONCE per page on a whole
        # host is invisible to within-doc dedup_lines but poisons
        # near-dup signatures and token budgets corpus-wide
        out = remove_boilerplate_lines(out, text_col, id_col,
                                       min_docs=boilerplate_min_docs)
    if substr_window is not None:
        # exact-substring span dedup (Lee et al. 2021): cut repeated
        # >= window-token passages at token resolution — catches the
        # pasted paragraph inside otherwise-unique pages that doc-level
        # MinHash can never flag
        out = dedup.remove_duplicate_spans(out, text_col, id_col,
                                           window=substr_window)
    if exact:
        out = dedup.exact_dedup(out, text_col, id_col)
    if near_dup_threshold is not None:
        pairs = dedup.jaccard_pairs(out, text_col, id_col,
                                    threshold=near_dup_threshold,
                                    n_hashes=n_hashes, band_size=band_size)
        if cluster_exact:
            # exact keep-one-per-cluster: connected components over the
            # verified pairs (handles chained duplicates; O(diameter)
            # label-propagation rounds)
            comps = dedup.connected_components(pairs.select("a", "b"))
            losers = (comps.filter(F.col("id") != F.col("component"))
                      .select(F.col("id").alias(id_col)))
        else:
            losers = pairs.select(F.col("b").alias(id_col)).distinct()
        out = out.join(losers, id_col, "left_anti")
    if embeddings is not None:
        # only surviving docs' embeddings participate (cheaper cells, and
        # a doc already dropped lexically cannot dominate anyone)
        surv = dedup.semantic_dedup(
            embeddings.join(out.select(id_col), id_col, "left_semi"),
            id_col, emb_vec_col, threshold=emb_threshold,
            n_list=emb_n_list, centroids=emb_centroids)
        dropped = (embeddings.select(id_col)
                   .join(surv.select(id_col), id_col, "left_anti"))
        out = out.join(dropped, id_col, "left_anti")
    if min_quality is not None:
        # quality_score is 4dp-rounded; the text_metrics oracle proves both
        # engines agree on it bit-for-bit, so the threshold is deterministic
        out = out.filter(T.quality_score(F.col(text_col)) >= min_quality)
    if lm_reference is not None and max_ppl is not None:
        # CCNet-style model-based quality: drop docs whose stupid-backoff
        # bigram perplexity under a reference-corpus LM exceeds max_ppl
        # (functions/lm.py). Short docs (<2 tokens, null ppl) are KEPT —
        # length policy belongs to the rule-based quality stage above
        from . import lm as L

        model = L.train_ngram_lm(lm_reference, text_col)
        ok = (L.lm_score(out.select(id_col, text_col), model,
                         text_col, id_col)
              .filter(F.col("ppl").isNull() | (F.col("ppl") <= max_ppl))
              .select(id_col))
        out = out.join(ok, id_col, "left_semi")
    if benchmark is not None:
        bad = dedup.contaminated_ids(out, text_col, id_col,
                                     benchmark, bench_text_col,
                                     n=decontam_ngram)
        out = out.join(bad, id_col, "left_anti")
    if splits is not None:
        out = out.withColumn(
            "split", T.hash_split(F.col(id_col).cast("string"),
                                  splits, split_labels))
    return out
