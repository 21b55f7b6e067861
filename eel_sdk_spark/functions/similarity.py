"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline;
  one broadcast of the query vector, one pass, one small top-k sort
  (Spark's TakeOrderedAndProject), no shuffle of the vectors themselves.
- ``ivf_topk``: the scale path — k-means-lite (deterministic seeded
  centroid pick + one Lloyd step computed distributedly), vectors assigned
  to nearest centroid once (write-time in a real deployment), queries
  probe only ``n_probe`` cells. At 10^12 vectors the probe prunes the
  scan to cells/n_list of the data; centroid assignment is a narrow map.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine


def brute_force_topk(emb: DataFrame, id_col: str, vec_col: str,
                     query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(F.col(id_col),
                        F.round(cosine(F.col(vec_col), q), 4).alias("cos"))
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def _lite_centroids(emb: DataFrame, vec_col: str, n_list: int) -> np.ndarray:
    """Deterministic centroids: hash-ordered sample (TakeOrderedAndProject —
    a parallel top-k over xxhash64 of the vector, NOT first-partition-biased
    limit()), one averaging refinement over the bounded sample. Returns at
    most n_list centroids — fewer when the table is smaller than n_list;
    empty array for an empty table (callers fall back to brute force)."""
    sample_rows = (emb.select(vec_col)
                   .orderBy(F.xxhash64(F.col(vec_col)))
                   .limit(n_list * 32).collect())
    if not sample_rows:
        return np.empty((0, 0))
    sample = np.array([list(r[0]) for r in sample_rows], dtype=np.float64)
    n_list = min(n_list, len(sample))
    seeds = sample[:n_list]
    # one Lloyd step on the sample
    sims = sample @ seeds.T
    assign = np.argmax(sims, axis=1)
    cents = np.stack([
        sample[assign == c].mean(axis=0) if np.any(assign == c) else seeds[c]
        for c in range(n_list)])
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    return cents / np.clip(norms, 1e-12, None)


def ivf_topk(emb: DataFrame, id_col: str, vec_col: str,
             query_vec: list[float], k: int = 10, n_list: int = 16,
             n_probe: int = 4) -> DataFrame:
    """IVF approximate top-k: probe the n_probe nearest centroid cells."""
    cents = _lite_centroids(emb, vec_col, n_list)
    if len(cents) == 0:
        return brute_force_topk(emb, id_col, vec_col, query_vec, k)
    n_list = len(cents)  # clamped for small tables
    n_probe = min(n_probe, n_list)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = np.argsort(-(cents @ qn))[:n_probe].tolist()

    cent_arrays = [F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    # cell assignment: argmax over centroid dots (JVM expression tree)
    dots = [F.aggregate(F.zip_with(F.col(vec_col), ca, lambda x, y: x * y),
                        F.lit(0.0), lambda acc, x: acc + x)
            for ca in cent_arrays]
    best = F.lit(0)
    best_dot = dots[0]
    for i in range(1, n_list):
        is_better = dots[i] > best_dot
        best = F.when(is_better, F.lit(i)).otherwise(best)
        best_dot = F.when(is_better, dots[i]).otherwise(best_dot)
    assigned = emb.withColumn("cell", best)
    pruned = assigned.filter(F.col("cell").isin(probe_cells))
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (pruned.select(F.col(id_col),
                          F.round(cosine(F.col(vec_col), qlit), 4).alias("cos"))
            .orderBy(F.desc("cos"), F.col(id_col)).limit(k))
