"""Similarity-search quality: IVF approximate top-k recall vs brute force.

Row counts alone don't validate ANN — recall does. IVF probing all cells
must equal brute force exactly; probing a subset must keep high recall on
clustered data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_sdk_spark.functions import similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


def _query(emb):
    return [float(x) for x in
            emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]


def test_ivf_full_probe_equals_brute_force(spark, emb):
    q = _query(emb)
    brute = [r["vec_id"] for r in
             similarity.brute_force_topk(emb, "vec_id", "embedding", q,
                                         k=10).collect()]
    ivf_all = [r["vec_id"] for r in
               similarity.ivf_topk(emb, "vec_id", "embedding", q, k=10,
                                   n_list=8, n_probe=8).collect()]
    assert ivf_all == brute


def test_ivf_partial_probe_recall(spark, emb):
    q = _query(emb)
    brute = {r["vec_id"] for r in
             similarity.brute_force_topk(emb, "vec_id", "embedding", q,
                                         k=10).collect()}
    approx = {r["vec_id"] for r in
              similarity.ivf_topk(emb, "vec_id", "embedding", q, k=10,
                                  n_list=8, n_probe=4).collect()}
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.5, f"recall {recall} too low for 4/8 probes"


def test_brute_force_self_is_top1(spark, emb):
    q = _query(emb)
    top = similarity.brute_force_topk(emb, "vec_id", "embedding", q,
                                      k=1).first()
    assert top["vec_id"] == 0 and top["cos"] == 1.0


def test_ivf_small_table_degrades_gracefully(spark):
    """Tables smaller than n_list must clamp, not crash (and an empty
    table falls back to brute force)."""
    from eel_sdk_spark.functions.similarity import ivf_topk

    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(3)],
        "vec_id bigint, embedding array<float>")
    out = ivf_topk(tiny, "vec_id", "embedding", [1.0, 1.0, 0.0],
                   k=2, n_list=16, n_probe=16)
    assert out.count() == 2

    empty = tiny.filter("vec_id < 0")
    assert ivf_topk(empty, "vec_id", "embedding", [1.0, 0.0, 0.0],
                    k=2, n_list=8).count() == 0


def test_ivf_index_probe_prunes_files(spark, emb, tmp_path):
    """Write-time cell assignment: a probe reads ONLY the probed cells'
    files (manifest-side pruning), and full-probe search == brute force."""
    from eel_sdk_spark.functions.similarity import IvfIndex, brute_force_topk

    idx = IvfIndex.build(emb, "vec_id", "embedding", str(tmp_path), "ivf",
                         n_list=8)
    snap = idx.table.current()
    n_cells = len({pv["cell"] for pv in snap.partitions})
    assert n_cells > 1

    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]

    # IO assertion: 2-probe file set is a strict, cell-aligned subset
    probe2 = idx.probe_files(q, n_probe=2)
    assert 0 < len(probe2) < len(snap.files)
    probed_cells = {pv["cell"] for f, pv in zip(snap.files, snap.partitions)
                    if f in set(probe2)}
    assert len(probed_cells) <= 2
    # and the probed fraction tracks n_probe/n_list at file granularity
    assert len(probe2) <= len(snap.files) * (2 / n_cells) + 1

    # full probe == exact brute force (same rows, same scores)
    got = idx.search(spark, q, k=5, n_probe=8).collect()
    want = brute_force_topk(emb, "vec_id", "embedding", q, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # partial probe returns k rows from probed cells only
    part = idx.search(spark, q, k=5, n_probe=2)
    assert part.count() == 5
    # load() round-trip sees the same index
    idx2 = IvfIndex.load(str(tmp_path), "ivf")
    got2 = idx2.search(spark, q, k=5, n_probe=8).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in want]


def test_normalize_and_norms(spark, emb):
    from eel_sdk_spark.functions.similarity import l2_norm, normalize

    from pyspark.sql import functions as F
    normed = emb.select(normalize(F.col("embedding")).alias("e"))
    bad = normed.select(
        (F.abs(l2_norm(F.col("e")) - 1.0) > 1e-9).alias("bad")) \
        .filter("bad").count()
    assert bad == 0


def test_cosine_zero_vector_safe(spark):
    """Zero-norm vectors (padding rows, failed embedders) must yield 0.0
    similarity, not a DIVIDE_BY_ZERO job abort — Spark 4's default ANSI
    mode throws even on double division by zero."""
    from eel_sdk_spark.functions import dedup
    from eel_sdk_spark.functions.similarity import brute_force_topk

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0]),
         (2, [0.5, 0.5, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>")
    got = {r["vec_id"]: r["c"] for r in emb.select(
        "vec_id",
        dedup.cosine(F.col("embedding"),
                     F.array(*[F.lit(x) for x in [1.0, 0.0, 0.0, 0.0]]))
        .alias("c")).collect()}
    assert got[0] == 0.0 and got[1] == 1.0
    # whole top-k pipeline survives a zero vector in the corpus
    top = brute_force_topk(emb, "vec_id", "embedding",
                           [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top][0] == 1


def test_ivf_index_append(spark, emb, tmp_path):
    """Index maintenance: appended vectors join the existing cells (no
    centroid recompute), probes see them, file pruning still holds, and
    the pre-append snapshot remains readable (time travel)."""
    from eel_sdk_spark.functions.similarity import IvfIndex, brute_force_topk

    half1 = emb.filter(F.col("vec_id") < 250)
    half2 = emb.filter(F.col("vec_id") >= 250)
    idx = IvfIndex.build(half1, "vec_id", "embedding",
                         str(tmp_path), "ivf_app", n_list=8)
    snap1 = idx.table.current().snapshot_id
    idx.append(half2)
    assert idx.table.current().snapshot_id == snap1 + 1
    assert idx.table.read(spark).count() == emb.count()
    # full probe == brute force over the WHOLE (appended) corpus
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 400).first()["embedding"]]
    got = [r["vec_id"] for r in idx.search(spark, q, k=5, n_probe=8).collect()]
    want = [r["vec_id"] for r in
            brute_force_topk(emb, "vec_id", "embedding", q, k=5).collect()]
    assert got == want and got[0] == 400
    # pruning still holds: a 1-cell probe reads a strict file subset
    assert len(idx.probe_files(q, 1)) < len(idx.table.current().files)
    # time travel to the pre-append snapshot
    assert idx.table.read(spark, snapshot_id=snap1).count() == half1.count()


def test_kmeans_recovers_separated_clusters(spark):
    """Full Lloyd iterations over 3 well-separated direction clusters:
    every point lands in the same cell as its true cluster-mates (purity
    1.0), and the returned codebook beats the one-step lite centroids as
    an IVF quantizer (or at least ties) on within-cluster cohesion."""
    import numpy as np

    from eel_sdk_spark.functions.similarity import assign_cells, kmeans

    rng = np.random.default_rng(9)
    centers = np.array([[10, 0, 0, 0, 0, 0, 0, 0.0],
                        [0, 10, 0, 0, 0, 0, 0, 0.0],
                        [0, 0, 10, 0, 0, 0, 0, 0.0]])
    rows = []
    for i in range(900):
        c = i % 3
        v = centers[c] + rng.standard_normal(8) * 0.5
        rows.append((i, c, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, truth int, embedding array<double>")
    cents = kmeans(emb, "embedding", k=3, max_iter=8)
    assert cents.shape == (3, 8)
    got = assign_cells(emb, cents, "embedding").select("truth", "cell")
    purity = (got.groupBy("truth")
              .agg(F.count_distinct("cell").alias("nc")).collect())
    assert all(r["nc"] == 1 for r in purity)  # each true cluster -> 1 cell
    cells = {r["cell"] for r in got.select("cell").distinct().collect()}
    assert len(cells) == 3  # and the three clusters get distinct cells


def test_ivf_index_with_trained_codebook(spark, tmp_path):
    """A kmeans codebook backs an IvfIndex: with pure clusters a 1-probe
    search already finds the exact neighbor set (the lite codebook needs
    more probes on the same data only by luck of its seeds)."""
    import numpy as np

    from eel_sdk_spark.functions.similarity import (IvfIndex,
                                                    brute_force_topk, kmeans)

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 8)) * 10
    rows = [(i, [float(x) for x in centers[i % 4]
                 + rng.standard_normal(8) * 0.4]) for i in range(800)]
    emb = spark.createDataFrame(rows,
                                "vec_id bigint, embedding array<double>")
    cb = kmeans(emb, "embedding", k=4, max_iter=6)
    idx = IvfIndex.build(emb, "vec_id", "embedding", str(tmp_path),
                         "ivf_km", centroids=cb)
    q = [float(x) for x in centers[1] + 0.1]
    got = [r["vec_id"] for r in idx.search(spark, q, k=5,
                                           n_probe=1).collect()]
    want = [r["vec_id"] for r in brute_force_topk(
        emb, "vec_id", "embedding", q, k=5).collect()]
    assert got == want  # 1 probe suffices on a trained codebook
    # probe pruning still holds
    assert len(idx.probe_files(q, 1)) < len(idx.table.current().files)


def test_semantic_dedup(spark, emb):
    """SemDeDup over IVF cells: exact-duplicate vectors collapse to the
    smallest id; survivors within a cell are pairwise below threshold;
    an all-distinct corpus survives untouched; degenerate-cell cap keeps
    mass-duplicated vectors from exploding the pair join (they survive
    conservatively)."""
    import numpy as np

    from eel_sdk_spark.functions.dedup import cosine, semantic_dedup
    from eel_sdk_spark.functions.similarity import (_lite_centroids,
                                                    assign_cells)

    # plant exact duplicates: ids 10_000..10_004 all duplicate vec_id 0
    base = emb.select("vec_id", "embedding")
    dup_src = [r["embedding"] for r in
               base.filter("vec_id = 0").collect()] * 5
    dups = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in v]) for i, v in enumerate(dup_src)],
        "vec_id bigint, embedding array<double>")
    corpus = base.select("vec_id",
                         F.transform("embedding",
                                     lambda x: x.cast("double"))
                         .alias("embedding")).union(dups)
    out = semantic_dedup(corpus, "vec_id", "embedding",
                         threshold=0.9999, n_list=8)
    ids = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert 0 in ids and not ids & set(range(10_000, 10_005))

    # survivor property: no same-cell pair at/above threshold
    cents = _lite_centroids(corpus, "embedding", 8)
    cells = assign_cells(out, cents, "embedding")
    sa = cells.select("cell", F.col("vec_id").alias("a"),
                      F.col("embedding").alias("va"))
    sb = cells.select("cell", F.col("vec_id").alias("b"),
                      F.col("embedding").alias("vb"))
    viol = (sa.join(sb, "cell").filter(F.col("a") < F.col("b"))
            .filter(cosine(F.col("va"), F.col("vb")) >= 0.9999).count())
    assert viol == 0

    # synthetic all-distinct corpus: nothing dropped
    rng = np.random.default_rng(3)
    distinct = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)])
         for i in range(200)],
        "vec_id bigint, embedding array<double>")
    assert semantic_dedup(distinct, "vec_id", "embedding",
                          threshold=0.999, n_list=8).count() == 200

    # degenerate cell cap: 3000 identical vectors above max_cell survive
    # (excluded from pair generation) instead of a k^2 join
    same = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(3000)],
        "vec_id bigint, embedding array<double>")
    kept = semantic_dedup(same, "vec_id", "embedding", threshold=0.9,
                          n_list=4, max_cell=100).count()
    assert kept == 3000


def test_assign_cells_matmul_matches_expr(spark, emb):
    """The broadcast-matmul assignment (the large-n_list path) must agree
    with the codegen expression tree vector-for-vector — same argmax, same
    first-max tie-break."""
    from eel_sdk_spark.functions.similarity import (_lite_centroids,
                                                    assign_cells)

    cents = _lite_centroids(emb, "embedding", 16)
    a = {r["vec_id"]: r["cell"] for r in
         assign_cells(emb, cents, "embedding", method="expr").collect()}
    b = {r["vec_id"]: r["cell"] for r in
         assign_cells(emb, cents, "embedding", method="matmul").collect()}
    assert a == b


def test_ivf_large_nlist_build_probe_append(spark, tmp_path):
    """n_list=1024 — the thousands-of-cells regime a 10^12-vector index
    needs. The literal expression tree stops being viable here, so the
    matmul path must carry build, probe (manifest file pruning intact),
    and append end to end."""
    import numpy as np

    from eel_sdk_spark.functions.similarity import (ASSIGN_EXPR_MAX,
                                                    IvfIndex,
                                                    brute_force_topk)

    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((2048, 16)).astype(np.float64)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    big = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    idx = IvfIndex.build(big.filter("vec_id < 1536"), "vec_id", "embedding",
                         str(tmp_path), "ivf_big", n_list=1024)
    n_cents = len(np.asarray(idx._props()["centroids"]))
    assert n_cents > ASSIGN_EXPR_MAX  # genuinely on the matmul path
    q = [float(x) for x in vecs[7]]
    # probe pruning: a 4-cell probe reads a small, cell-aligned file subset
    snap = idx.table.current()
    probe4 = idx.probe_files(q, n_probe=4)
    assert 0 < len(probe4) < len(snap.files)
    probed_cells = {pv["cell"] for f, pv in zip(snap.files, snap.partitions)
                    if f in set(probe4)}
    assert len(probed_cells) <= 4
    # append via the matmul path, then a generous probe finds the exact hit
    idx.append(big.filter("vec_id >= 1536"))
    assert idx.table.read(spark).count() == 2048
    q2 = [float(x) for x in vecs[2000]]
    got = idx.search(spark, q2, k=3, n_probe=64).collect()
    assert got[0]["vec_id"] == 2000 and got[0]["cos"] == 1.0
    # sanity: full-probe equals brute force
    got_all = [r["vec_id"] for r in
               idx.search(spark, q, k=5, n_probe=n_cents).collect()]
    want = [r["vec_id"] for r in
            brute_force_topk(big, "vec_id", "embedding", q, k=5).collect()]
    assert got_all == want


def test_kmeans_codebook_recall_beats_or_ties_lite(spark, tmp_path):
    """VERDICT r4 #4: the measured reason kmeans exists. On a CLUSTERED
    corpus (the regime where codebook quality matters), IVF recall@10 at
    a fixed partial probe with a kmeans-trained codebook must be >= the
    one-step lite codebook's recall. Lite seeds are a hash-ordered
    sample — on clustered data several seeds can land inside one true
    cluster, leaving other clusters split across cells; full Lloyd
    separates them (see BENCH.md 'kmeans vs lite codebook' for the
    measured sweep at larger scale)."""
    import numpy as np

    from eel_sdk_spark.functions.similarity import (
        IvfIndex, _lite_centroids, brute_force_topk, kmeans)

    rng = np.random.default_rng(17)
    n_clusters, dim = 16, 16
    centers = rng.standard_normal((n_clusters, dim)) * 6
    rows = [(i, [float(x) for x in centers[i % n_clusters]
                 + rng.standard_normal(dim) * 0.5]) for i in range(3200)]
    emb = spark.createDataFrame(rows,
                                "vec_id bigint, embedding array<double>")

    lite = _lite_centroids(emb, "embedding", n_clusters)
    trained = kmeans(emb, "embedding", k=n_clusters, max_iter=8)
    idx_lite = IvfIndex.build(emb, "vec_id", "embedding", str(tmp_path),
                              "lite", centroids=lite)
    idx_km = IvfIndex.build(emb, "vec_id", "embedding", str(tmp_path),
                            "km", centroids=trained)

    n_probe, k, queries = 2, 10, 12
    recalls = {}
    for name, idx in (("lite", idx_lite), ("km", idx_km)):
        hits = total = 0
        for qi in range(queries):
            q = [float(x) for x in centers[qi % n_clusters]
                 + rng.standard_normal(dim) * 0.5]
            want = {r["vec_id"] for r in brute_force_topk(
                emb, "vec_id", "embedding", q, k=k).collect()}
            got = {r["vec_id"] for r in idx.search(
                spark, q, k=k, n_probe=n_probe).collect()}
            hits += len(want & got)
            total += k
        recalls[name] = hits / total
    assert recalls["km"] >= recalls["lite"], recalls
    # and the trained codebook must be genuinely good, not just relatively
    assert recalls["km"] >= 0.9, recalls


def test_semantic_dedup_large_nlist_matmul(spark, monkeypatch):
    """semantic_dedup at realistic cell counts (VERDICT r4 #5): n_list=512
    with 32-dim vectors is 16k literals — past both assignment-dispatch
    bounds, so the cell assignment MUST take the broadcast-matmul path
    (asserted by poisoning the expression-tree builder), with the
    max_cell degenerate guard active in the same run. Planted exact
    duplicates still collapse; the 600-identical-vector degenerate cell
    survives conservatively instead of exploding the pair join."""
    import numpy as np

    from eel_sdk_spark.functions import similarity
    from eel_sdk_spark.functions.dedup import semantic_dedup

    def _boom(*a, **k):
        raise AssertionError(
            "expression-tree assignment used at n_list=512 — dispatch "
            "should have picked the broadcast matmul path")

    monkeypatch.setattr(similarity, "_cell_expr", _boom)

    rng = np.random.default_rng(41)
    dim = 32
    rows = [(i, [float(x) for x in rng.standard_normal(dim)])
            for i in range(3000)]
    # planted exact duplicates of vec_id 0
    rows += [(10_000 + i, list(rows[0][1])) for i in range(4)]
    # degenerate mass: 600 identical vectors -> one cell over max_cell
    rows += [(20_000 + i, [1.0] * dim) for i in range(600)]
    emb = spark.createDataFrame(rows,
                                "vec_id bigint, embedding array<double>")
    out = semantic_dedup(emb, "vec_id", "embedding", threshold=0.9999,
                         n_list=512, max_cell=500)
    ids = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert 0 in ids and not ids & set(range(10_000, 10_004))
    assert set(range(20_000, 20_600)) <= ids  # capped cell: all survive


def test_semantic_dedup_numpy_dominance_matches_fold(spark):
    """The r9 per-cell numpy dominance kernel must reproduce the JVM
    cosine-fold pair decisions exactly: planted zero vectors (the
    denom-guard path), exact duplicates, and pairs engineered to sit
    NEAR the threshold all decide identically to a sequential-left-fold
    Python reference."""
    import math

    import numpy as np

    from eel_sdk_spark.functions.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    dim = 16
    rows = [(i, [float(x) for x in rng.standard_normal(dim)])
            for i in range(400)]
    rows += [(1_000 + i, [0.0] * dim) for i in range(3)]   # zero-norm
    rows += [(2_000 + i, list(rows[5][1])) for i in range(3)]  # exact dups
    emb = spark.createDataFrame(rows,
                                "vec_id bigint, embedding array<double>")
    cents = np.stack([np.asarray(rows[i][1]) for i in range(4)])
    thr = 0.35
    out = semantic_dedup(emb, "vec_id", "embedding", threshold=thr,
                         max_cell=None, centroids=cents)
    got = {r["vec_id"] for r in out.select("vec_id").collect()}

    # reference: same assignment, sequential-fold cosine, i<j dominance
    def cos(u, v):
        d = na = nb = 0.0
        for x, y in zip(u, v):
            d += x * y
            na += x * x
            nb += y * y
        den = math.sqrt(na) * math.sqrt(nb)
        return d / den if den > 0 else 0.0

    by_cell: dict[int, list[tuple[int, list[float]]]] = {}
    for i, v in rows:
        c = int(np.argmax([sum(a * b for a, b in zip(v, cv))
                           for cv in cents]))
        by_cell.setdefault(c, []).append((i, v))
    keep = set()
    for members in by_cell.values():
        members.sort()
        for j, (jid, jv) in enumerate(members):
            if not any(cos(iv, jv) >= thr for _, iv in members[:j]):
                keep.add(jid)
    assert got == keep
    assert {1_000, 1_001, 1_002} <= got  # zero vectors: cos 0.0, survive
    assert not ({2_000, 2_001, 2_002} & got)  # dominated by row 5
