"""Host-level link graph + PageRank for crawl quality weighting.

The classic web-scale quality signal (Page et al. 1998, public
technique): build a host→host edge list from each page's outlinks, then
power-iterate PageRank over it. Hosts with high rank seed quality
weighting / crawl prioritization; combined with the deny-list and
quality-score passes this completes the URL-side curation toolkit.

Scale shape:
- the edge list is built once from the corpus (explode outlinks →
  host-pair groupBy) and is host-cardinality sized — orders of magnitude
  smaller than the page corpus; page text/html never appears in it;
- each PageRank iteration is ONE join (ranks ⋈ edges on src) + ONE
  groupBy(dst) sum — both shuffle only (host, double) pairs;
- per-round ``localCheckpoint`` keeps lineage FLAT (same lesson as
  connected_components: round k must not replay rounds 1..k-1);
- dangling hosts (no outlinks) contribute their mass uniformly — the
  standard correction; their total is one scalar aggregate per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def outlink_edges(df: DataFrame, url_col: str, html_col: str,
                  weight: bool = True) -> DataFrame:
    """(src_host, dst_host[, n]) host-level edge list from page HTML.

    Self-loops (intra-host navigation — the overwhelming majority of
    links on real pages) are dropped: they carry no cross-host
    endorsement and would dominate the weight column. Pages with
    unparseable URLs or no links contribute nothing."""
    from .html import extract_links, html_to_string
    from .text import url_host

    src = url_host(F.col(url_col))
    links = extract_links(html_to_string(F.col(html_col)), base_host=src)
    pairs = (df.select(src.alias("src_host"),
                       F.explode(links).alias("__l"))
             .select("src_host", url_host(F.col("__l")).alias("dst_host"))
             .filter(F.col("src_host").isNotNull()
                     & F.col("dst_host").isNotNull()
                     & (F.col("src_host") != F.col("dst_host"))))
    if not weight:
        return pairs.distinct()
    return (pairs.groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n")))


def pagerank(edges: DataFrame, damping: float = 0.85,
             max_iter: int = 20, tol: float = 1e-6,
             weighted: bool = False) -> DataFrame:
    """(host, rank) over a (src_host, dst_host[, n]) edge list; ranks
    sum to 1. ``weighted=True`` splits each host's outgoing mass
    proportionally to edge weight ``n`` instead of uniformly.

    Stops early when the L1 rank delta falls under ``tol``. Dangling
    mass (hosts with inlinks but no outlinks) is redistributed uniformly
    each round — without it rank leaks and the vector no longer sums to
    1 (and comparisons against the closed-form are off by the leak)."""
    w = F.col("n").cast("double") if weighted and "n" in edges.columns \
        else F.lit(1.0)
    e = (edges.select(F.col("src_host").alias("src"),
                      F.col("dst_host").alias("dst"), w.alias("w"))
         .localCheckpoint(eager=False))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    nodes = (e.select(F.col("src").alias("host"))
             .unionByName(e.select(F.col("dst").alias("host")))
             .distinct().localCheckpoint(eager=True))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(max_iter):
        linked = ranks.join(out_w, ranks.host == out_w.src, "left")
        # dangling = rank mass sitting on hosts with no outgoing edges
        dangling = (linked.filter(F.col("out_w").isNull())
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .first()[0])
        contrib = (linked.filter(F.col("out_w").isNotNull())
                   .join(e, "src")
                   .select(F.col("dst").alias("host"),
                           (F.col("rank") * F.col("w") / F.col("out_w"))
                           .alias("c")))
        summed = contrib.groupBy("host").agg(F.sum("c").alias("inflow"))
        new_ranks = (nodes.join(summed, "host", "left")
                     .select("host",
                             (F.lit(base)
                              + F.lit(damping)
                              * (F.coalesce(F.col("inflow"), F.lit(0.0))
                                 + F.lit(dangling / n_nodes)))
                             .alias("rank"))
                     .localCheckpoint(eager=True))
        delta = (new_ranks.alias("a")
                 .join(ranks.alias("b"), "host")
                 .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                 .first()[0])
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks


def host_rank_weights(df: DataFrame, url_col: str, html_col: str,
                      damping: float = 0.85, max_iter: int = 20) -> DataFrame:
    """End-to-end convenience: corpus pages -> (host, rank) quality
    weights, ready to join back onto documents by their url host for
    rank-weighted sampling / mixing."""
    return pagerank(outlink_edges(df, url_col, html_col),
                    damping=damping, max_iter=max_iter, weighted=True)
