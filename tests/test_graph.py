"""Host link graph + PageRank (functions/graph.py): edge building from
real HTML, and the distributed power iteration checked against an exact
driver-side replica with identical dangling-mass handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_sdk_spark.functions import graph as G


def _reference_pagerank(edges, damping=0.85, iters=20, weighted=False):
    """Exact replica of graph.pagerank's update rule in plain Python."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + (w if weighted else 1.0)
    n = len(nodes)
    r = {h: 1.0 / n for h in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        dangling = sum(r[h] for h in nodes if h not in out_w)
        inflow = {h: 0.0 for h in nodes}
        for s, d, w in edges:
            inflow[d] += r[s] * ((w if weighted else 1.0) / out_w[s])
        r = {h: base + damping * (inflow[h] + dangling / n) for h in nodes}
    return r


EDGES = [
    ("a.com", "b.com", 3), ("a.com", "c.com", 1),
    ("b.com", "c.com", 2), ("c.com", "a.com", 1),
    ("d.com", "a.com", 5),  # d has no inlinks
    ("b.com", "e.com", 1),  # e is DANGLING (no outlinks)
]


def test_pagerank_matches_exact_replica(spark):
    edges = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, n int")
    for weighted in (False, True):
        got = {r["host"]: r["rank"] for r in
               G.pagerank(edges, max_iter=20, tol=0.0,
                          weighted=weighted).collect()}
        want = _reference_pagerank(EDGES, iters=20, weighted=weighted)
        assert set(got) == set(want)
        for h in want:
            assert abs(got[h] - want[h]) < 1e-9, (weighted, h)
        assert abs(sum(got.values()) - 1.0) < 1e-9  # no rank leak


def test_pagerank_converges_early_and_orders_sensibly(spark):
    edges = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, n int")
    got = {r["host"]: r["rank"] for r in
           G.pagerank(edges, max_iter=50, tol=1e-12).collect()}
    # a.com receives from c and d; d.com receives nothing -> lowest
    assert got["d.com"] == min(got.values())
    assert got["a.com"] > got["d.com"]


def test_outlink_edges_from_html(spark):
    rows = [
        (1, "https://a.com/page1",
         '<a href="https://b.com/x">1</a><a href="https://b.com/y">2</a>'
         '<a href="/internal">self</a><a href="#frag">f</a>'),
        (2, "https://b.com/page",
         '<a href="https://a.com/z">back</a>'),
        (3, "not a url at all", '<a href="https://a.com/q">q</a>'),
        (4, "https://c.com/", "no links here"),
    ]
    df = spark.createDataFrame(rows, "id int, url string, html string") \
        .withColumn("html", F.encode("html", "utf-8"))
    got = {(r["src_host"], r["dst_host"]): r["n"] for r in
           G.outlink_edges(df, "url", "html").collect()}
    # self-links (a.com -> a.com via /internal) and fragments dropped;
    # the malformed-url page still yields an edge from its parsed host
    assert got[("a.com", "b.com")] == 2
    assert got[("b.com", "a.com")] == 1
    assert ("a.com", "a.com") not in got
    assert all(s is not None and d is not None for s, d in got)


def test_host_rank_weights_end_to_end(spark):
    """Corpus -> weights: hosts that are linked TO outrank isolated
    ones; the weights join back onto documents by host."""
    from eel_sdk_spark.functions.text import url_host

    pages = []
    for i in range(5):  # five hub pages all linking to popular.com
        pages.append((f"https://h{i}.com/p",
                      '<a href="https://popular.com/x">pop</a>'))
    pages.append(("https://popular.com/home",
                  '<a href="https://h0.com/p">one back</a>'))
    df = spark.createDataFrame(pages, "url string, html string") \
        .withColumn("html", F.encode("html", "utf-8"))
    w = G.host_rank_weights(df, "url", "html", max_iter=15)
    ranks = {r["host"]: r["rank"] for r in w.collect()}
    assert ranks["popular.com"] == max(ranks.values())
    joined = (df.withColumn("host", url_host(F.col("url")))
              .join(w, "host", "left"))
    assert joined.filter(F.col("rank").isNull()).count() == 0


def test_weighted_sample_hits_target_and_prefers_heavy(spark):
    """Deterministic rank-weighted downsampling: realized fraction lands
    near target even with saturating heavy weights (the rescale pass),
    heavy rows are kept at much higher rates than light ones, and
    membership is layout-independent."""
    from eel_sdk_spark.functions.pipeline import weighted_sample

    rows = [(i, 10.0 if i % 100 == 0 else 1.0) for i in range(20_000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    out = weighted_sample(df, "w", target_frac=0.3)
    n = out.count()
    assert 0.27 < n / 20_000 < 0.33, n
    kept_heavy = out.filter("w = 10.0").count() / 200
    kept_light = out.filter("w = 1.0").count() / 19_800
    assert kept_heavy == 1.0  # saturated: every heavy row kept
    assert kept_heavy > 2.5 * kept_light
    # deterministic across physical layout
    again = weighted_sample(df.repartition(13), "w", target_frac=0.3)
    assert out.select("doc_id").exceptAll(
        again.select("doc_id")).count() == 0

    # degenerate: all-zero weights keep nothing; target_frac=1 keeps all
    z = spark.createDataFrame([(1, 0.0), (2, None)],
                              "doc_id bigint, w double")
    assert weighted_sample(z, "w", 0.5).count() == 0
    assert weighted_sample(df, "w", 1.0).count() == 20_000


def test_rank_weighted_curation_composes(spark):
    """The full quality-weighting path: corpus -> host PageRank ->
    join weights -> weighted_sample. Documents on the popular host
    survive at a higher rate."""
    from eel_sdk_spark.functions import graph as G
    from eel_sdk_spark.functions.pipeline import weighted_sample
    from eel_sdk_spark.functions.text import url_host

    pages = []
    for i in range(400):
        host = "popular.com" if i % 4 == 0 else f"h{i % 40}.com"
        pages.append((i, f"https://{host}/p/{i}",
                      '<a href="https://popular.com/x">p</a>'
                      if host != "popular.com"
                      else '<a href="https://h0.com/y">y</a>'))
    df = spark.createDataFrame(pages, "doc_id bigint, url string, "
                                      "html string") \
        .withColumn("html", F.encode("html", "utf-8"))
    w = G.host_rank_weights(df, "url", "html", max_iter=10)
    docs = (df.withColumn("host", url_host(F.col("url")))
            .join(w, "host", "left")
            .withColumn("rank", F.coalesce("rank", F.lit(0.0))))
    kept = weighted_sample(docs, "rank", target_frac=0.4)
    pop_rate = kept.filter("host = 'popular.com'").count() / 100
    other_rate = kept.filter("host != 'popular.com'").count() / 300
    assert pop_rate > other_rate


def test_outlink_edges_plan_shuffles_hosts_only(spark):
    """Scale-shape assertion: the edge-list aggregation's Exchange
    carries only host strings — page html/url bodies are projected away
    before anything moves."""
    df = spark.createDataFrame(
        [(1, "https://a.com/x", b"<a href='https://b.com/y'>l</a>")],
        "id int, url string, html binary")
    edges = G.outlink_edges(df, "url", "html")
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # the groupBy's partial/final agg pair
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "html" not in line and "url#" not in line, line


def test_weighted_sample_zero_weight_bucket_zero_dropped(spark):
    """ADVICE r5: a row whose md5 bucket is exactly 0 (doc_id 498162)
    must still be dropped when its weight is 0/null — epsilon only
    widens POSITIVE probabilities."""
    from eel_sdk_spark.functions.pipeline import weighted_sample

    # 498162's md5 first-8-hex mod 1e6 == 0 (found by search)
    rows = [(498162, 0.0), (498163, None), (1, 1.0), (2, 1.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    kept = {r["doc_id"] for r in
            weighted_sample(df, "w", 1.0).collect()}
    assert 498162 not in kept and 498163 not in kept
    assert kept == {1, 2}
