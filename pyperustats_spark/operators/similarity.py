"""Similarity search over the ``embeddings`` table.

* :func:`knn_bruteforce` — exact top-k cosine for a (small) query set:
  broadcast the queries, scan the corpus once, window top-k. The corpus
  side never shuffles its vectors; the only shuffle carries
  (query_id, vec_id, score) triples.
* :func:`ann_lsh` — random-hyperplane LSH: deterministic md5-derived
  hyperplanes → sign bits → bucket key; queries probe their bucket only.
  This is the 100 TB path: bucket count scales with corpus size, each
  probe touches a vanishing fraction of vectors. Recall is validated
  against brute force in tests (pytest), not a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyperustats_spark.functions.layout import ensure_parallelism
from pyperustats_spark.functions.vectors import (
    cosine, dot, lit_double_matrix, lit_doubles, lit_longs, norm, norm_nn)


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    sort: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` has (query_id, q_embedding) and is broadcast; candidates
    exclude self-matches by id. Norms are hoisted to one column per
    side before the join (corpus norm computed once per vector, not
    once per query) — same arithmetic as per-pair cosine(), so results
    and the oracle are bit-identical."""
    e = ensure_parallelism(embeddings).withColumn(
        "_nv", norm_nn(F.col("embedding")))
    qn = queries.withColumn("_nq", norm_nn(F.col("q_embedding")))
    scored = (
        e.crossJoin(F.broadcast(qn))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.try_divide(dot(F.col("embedding"), F.col("q_embedding")),
                         F.col("_nv") * F.col("_nq")).alias("cos"),
        )
    )
    # a corrupt (NaN/Inf) embedding yields a non-finite score, and Spark
    # orders NaN as LARGEST — without this bound one bad vector becomes
    # the top neighbor of every query. Valid cosines live in [-1, 1];
    # the predicate is false for NaN/±Inf, so they drop here.
    scored = scored.where(
        (F.col("cos") >= -1.0001) & (F.col("cos") <= 1.0001))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    return out.orderBy("query_id", "rank") if sort else out


def radius_search(
    embeddings: DataFrame,
    queries: DataFrame,
    threshold: float = 0.2,
    sort: bool = True,
) -> DataFrame:
    """Exact radius (threshold) similarity search: every corpus vector
    whose cosine with a query is ≥ *threshold* — the "find everything
    similar enough" counterpart of :func:`knn_bruteforce` (dedup
    candidate mining, safety/contamination sweeps, labeling by
    prototype), where top-k's fixed cut is the wrong contract.

    Scale: STRICTLY better than top-k — top-k needs a per-query window
    (one rank shuffle of all scored rows); radius search is
    embarrassingly parallel. Queries broadcast, each corpus partition
    emits its hits independently, and NOTHING data-sized ever
    shuffles — the only exchange is the presentation sort, removable
    via sort=False. The 100 TB plan is exactly one scan. Same hoisted
    norms + same fold order as knn_bruteforce, so the DuckDB oracle is
    bit-identical; the [-1.0001, 1.0001] band drops NaN/Inf scores
    from corrupt vectors (predicate false for non-finite)."""
    e = ensure_parallelism(embeddings).withColumn(
        "_nv", norm_nn(F.col("embedding")))
    qn = queries.withColumn("_nq", norm_nn(F.col("q_embedding")))
    out = (
        e.crossJoin(F.broadcast(qn))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.try_divide(dot(F.col("embedding"), F.col("q_embedding")),
                         F.col("_nv") * F.col("_nq")).alias("cos"),
        )
        .where((F.col("cos") >= F.lit(float(threshold)))
               & (F.col("cos") <= 1.0001))
    )
    return out.orderBy("query_id", "vec_id") if sort else out


def radius_search_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    threshold: float = 0.2,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 0,
    sort: bool = True,
) -> DataFrame:
    """Approximate radius search: :func:`radius_search` restricted to
    the query's *nprobe* nearest IVF cells — the scale path when even
    one full corpus scan per query batch is too much and the corpus is
    already cell-partitioned (``partitionBy(cell)`` at write time →
    probing prunes to nprobe/n_centroids of the files).

    Recall < 1 by construction (a hit living in an unprobed cell is
    missed — pinned vs the exact baseline in pytest); precision stays
    exact because every emitted cosine is exactly rescored. Same cell
    machinery as :func:`ann_ivf`: disjoint corpus assignment (no row
    duplication), query fan-out to nprobe cells, equi-join on cell id
    with the query side broadcast.

    NOT a local-wall win (measured 20.7s vs 2.1s exact at 100× bench
    scale with |Q| = 5): per-row assignment costs K = n_centroids
    fold-evals vs |Q| for the exact scan. The 100 TB shape amortizes
    assignment at WRITE time (partitionBy(cell) → probing prunes to
    nprobe/K of the files) and serves query batches ≫ K — same class
    as the approx-percentile twins; don't "optimize" it away on local
    numbers (BENCH_SCALING.md, seventh batch)."""
    cents = seed_centroids(embeddings, n_centroids)
    if kmeans_iters > 0:
        cents = kmeans_refine_centroids(embeddings, cents,
                                        iterations=kmeans_iters)
    e = ensure_parallelism(embeddings).select(
        "vec_id",
        "embedding",
        ivf_cell(F.col("embedding"), cents).alias("cell"),
    )
    q = queries.select(
        "query_id",
        "q_embedding",
        F.explode(ivf_assign(F.col("q_embedding"), cents,
                             nprobe=nprobe)).alias("cell"),
    )
    # hoist norms to one column per SIDE (same folds, same sqrt —
    # bit-identical to per-pair cosine()); norm_nn's coalesce makes
    # them non-nullable so the band's inferred IsNotNull doesn't
    # substitute the norm fold into a Filter under each scan
    out = (
        e.withColumn("_nv", norm_nn(F.col("embedding")))
        .join(F.broadcast(q.withColumn("_nq", norm_nn(F.col("q_embedding")))),
              "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.try_divide(dot(F.col("embedding"), F.col("q_embedding")),
                         F.col("_nv") * F.col("_nq")).alias("cos"),
        )
        .where((F.col("cos") >= F.lit(float(threshold)))
               & (F.col("cos") <= 1.0001))
    )
    return out.orderBy("query_id", "vec_id") if sort else out


def mips_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    sort: bool = True,
) -> DataFrame:
    """Exact top-k by RAW inner product (maximum inner product search)
    — the retrieval contract of recommender / dual-encoder scoring,
    where vector length carries signal (popularity, confidence) and
    cosine's normalization would erase it.

    Same broadcast-queries / one-corpus-scan shape as
    :func:`knn_bruteforce`, same left-fold ``dot`` — so the DuckDB
    oracle's ``list_sum`` reproduces every score bit-for-bit and raw
    ranking is deterministic cross-engine. There is no [-1, 1] band for
    an unnormalized score, so corrupt vectors are dropped with an
    explicit finiteness predicate instead (NaN would otherwise sort
    LARGEST and top every query)."""
    e = ensure_parallelism(embeddings)
    scored = (
        e.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            dot(F.col("embedding"), F.col("q_embedding")).alias("ip"),
        )
        .where(F.col("ip").isNotNull() & ~F.isnan("ip")
               & (F.abs("ip") < F.lit(float("inf"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ip"),
                                               F.col("vec_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    return out.orderBy("query_id", "rank") if sort else out


def mips_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    sort: bool = True,
) -> DataFrame:
    """Approximate MIPS via the norm-augmentation reduction to cosine
    ANN (Bachrach et al., RecSys 2014 "Speeding up the Xbox recommender";
    the asymmetric-transform family of Shrivastava & Li, NeurIPS 2014):
    corpus x → [x, sqrt(M² − ‖x‖²)] with M = max corpus norm puts every
    augmented vector on the radius-M sphere; query q → [q, 0] gives
    cos(x̂, q̂) = ⟨x, q⟩ / (M·‖q‖) — rank-equivalent to inner product per
    query — so the EXISTING IVF cell machinery chases the right
    geometry without any new index code.

    M is one scalar aggregate (O(1) driver transfer, like the centroid
    seeds). Candidates from the probed cells are re-scored with the
    exact inner product on the augmented arrays — the appended
    components contribute exactly s·0.0 = +0.0 to the left fold, so
    scores are bit-identical to :func:`mips_bruteforce` on the raw
    vectors (exhaustive probe == exact top-k, pinned in pytest;
    partial-probe recall pinned there too; precision always exact).

    Like :func:`radius_search_ivf`, NOT a local-wall win at small
    query counts (30.6s vs 1.7s exact at 100× bench scale, |Q| = 5:
    K-centroid assignment + the max-norm pass + seed collect dominate);
    it exists for the write-time-partitioned corpus serving query
    batches ≫ n_centroids (BENCH_SCALING.md, seventh batch)."""
    row = embeddings.agg(
        F.max(norm(F.col("embedding"))).alias("m")).collect()[0]
    m = float(row["m"] or 0.0)
    # squared norm via one fold (NOT norm()² — that would double-eval
    # the fold under CollapseProject and round through a sqrt)
    sq = F.aggregate(F.col("embedding"), F.lit(0.0),
                     lambda acc, v: acc + v * v)
    aug = ensure_parallelism(embeddings).select(
        "vec_id",
        F.concat(
            F.col("embedding").cast("array<double>"),
            F.array(F.sqrt(F.greatest(F.lit(0.0), F.lit(m * m) - sq))),
        ).alias("embedding"),
    )
    cents = seed_centroids(aug, n_centroids)
    e = aug.select(
        "vec_id",
        "embedding",
        ivf_cell(F.col("embedding"), cents).alias("cell"),
    )
    # two-step select: the one-select form made the cell expression a
    # LATERAL alias reference to the augmented q_embedding, which
    # Spark's alias resolution cannot push through a transform-with-
    # index lambda (INTERNAL_ERROR LateralColumnAliasReference on
    # Spark 4.1) — and the split also evaluates the concat once
    qa = queries.select(
        "query_id",
        F.concat(F.col("q_embedding"), F.array(F.lit(0.0)))
        .alias("q_embedding"))
    q = qa.select(
        "query_id", "q_embedding",
        F.explode(ivf_assign(F.col("q_embedding"), cents,
                             nprobe=nprobe)).alias("cell"),
    )
    scored = (
        e.join(F.broadcast(q), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            dot(F.col("embedding"), F.col("q_embedding")).alias("ip"),
        )
        .where(F.col("ip").isNotNull() & ~F.isnan("ip")
               & (F.abs("ip") < F.lit(float("inf"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ip"),
                                               F.col("vec_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    return out.orderBy("query_id", "rank") if sort else out


def _hyperplanes_seeded(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; reproducible
    without RNG state, so the same plan hashes identically every run)."""
    planes = []
    state = seed
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _hyperplanes(dim: int, num_planes: int) -> list[list[float]]:
    return _hyperplanes_seeded(dim, num_planes, 123456789)


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Bucket id = sign-bit string across hyperplanes, JVM-side. The
    planes ship as ONE 2-D literal scored by a runtime transform (one
    lambda tree, not one per plane — see _pq_scored rationale); the
    per-plane dot-product fold and the bit string are unchanged."""
    planes_lit = lit_double_matrix(planes)
    bits = F.transform(planes_lit, lambda pl: F.when(
        F.aggregate(F.zip_with(vec_col, pl, lambda x, y: x * y),
                    F.lit(0.0), lambda a, v: a + v) >= 0,
        F.lit("1")).otherwise(F.lit("0")))
    return F.array_join(bits, "")


def _bucket_array(vec_col, tables: list[list[list[float]]]):
    """Array of (table_idx, bucket_key) structs, one per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(vec_col, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )


def ann_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = 12,
    planes_per_table: int | None = None,
    target_bucket_size: int = 256,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    L independent hash tables of p sign-bit planes each: a vector lands
    in one bucket per table; candidates are the union of the query's
    buckets over all tables. Equi-join on (table, bucket) — hash
    partitioned, never a cross join; the corpus is exploded L× but
    candidates verified with exact cosine stay a vanishing fraction of
    n. Recall rises as 1-(1-c^p)^L where c is the angular similarity.

    Sizing: buckets per table = 2^p, so p should grow with the corpus
    (p ≈ log2(n / target_bucket_size)); the p=4/L=12 defaults are tuned
    for recall on the small near-uniform test corpus, where candidates
    stay a large fraction of n. Real embedding corpora cluster (c → 0.9
    for true neighbors), which is what lets larger p keep recall while
    the candidate set collapses.
    """
    if planes_per_table is None:
        # adapt buckets to the corpus: 2^p buckets per table sized for
        # ~target_bucket_size members (one cheap count; p floored at 4
        # so the small test corpus keeps its tuned recall)
        import math

        n = embeddings.count()
        planes_per_table = max(4, int(math.log2(max(2, n / target_bucket_size))))
    # distinct plane sets per table: offset the deterministic generator
    tables = [
        _hyperplanes_seeded(dim, planes_per_table, seed=987654321 + t * 7919)
        for t in range(num_tables)
    ]
    e = ensure_parallelism(embeddings).select(
        "vec_id", "embedding", norm_nn(F.col("embedding")).alias("_nv"),
        F.explode(_bucket_array(F.col("embedding"), tables)).alias("bk"),
    ).select("vec_id", "embedding", "_nv", F.col("bk.tbl").alias("tbl"), F.col("bk.bucket").alias("bucket"))
    q = queries.select(
        "query_id", "q_embedding", norm_nn(F.col("q_embedding")).alias("_nq"),
        F.explode(_bucket_array(F.col("q_embedding"), tables)).alias("bk"),
    ).select("query_id", "q_embedding", "_nq", F.col("bk.tbl").alias("tbl"), F.col("bk.bucket").alias("bucket"))
    # score INSIDE the bucket join and dedup on the (query, vec, cos)
    # triple — never shuffle the vectors themselves. (Deduping first and
    # re-joining embeddings would shuffle ~1 KB/candidate; a candidate
    # found by several tables re-scores identically, so max() collapses
    # duplicates at 24 bytes/row with map-side combine.)
    scored = (
        e.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.try_divide(dot(F.col("embedding"), F.col("q_embedding")),
                         F.col("_nv") * F.col("_nq")).alias("cos"),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.max("cos").alias("cos"))
    )
    # a corrupt (NaN/Inf) embedding yields a non-finite score, and Spark
    # orders NaN as LARGEST — without this bound one bad vector becomes
    # the top neighbor of every query. Valid cosines live in [-1, 1];
    # the predicate is false for NaN/±Inf, so they drop here.
    scored = scored.where(
        (F.col("cos") >= -1.0001) & (F.col("cos") <= 1.0001))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def make_queries(embeddings: DataFrame, ids: list[int]) -> DataFrame:
    """Query set = selected corpus vectors (stable, oracle-friendly)."""
    return (
        embeddings.where(F.col("vec_id").isin(ids))
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
        )
    )


def ivf_assign(vec_col, centroids: list[tuple[int, list[float]]], nprobe: int = 1):
    """Array of the *nprobe* nearest centroid ids for a vector —
    JVM-side: score every centroid from a literal array, sort by
    (-score, id), slice. Centroid count is small (√n-ish), so this is a
    per-row O(K·dim) expression, no shuffle, no UDF."""
    # one 2-D centroid literal + runtime transform — one cosine lambda
    # tree built in Python, not K of them (see _pq_scored rationale);
    # scoring arithmetic and the (-cos, cid) sort are unchanged
    cids = lit_longs([cid for cid, _ in centroids])
    mats = lit_double_matrix([c for _, c in centroids])
    scored = F.transform(mats, lambda cw, j: F.struct(
        (F.lit(-1.0) * cosine(vec_col, cw)).alias("neg"),
        F.element_at(cids, j + 1).alias("cid"),
    ))
    return F.transform(
        F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["cid"]
    )


def ivf_cell(vec_col, centroids: list[tuple[int, list[float]]]):
    """The vector's single (nprobe=1) cell id as a NON-NULLABLE column
    for use as a JOIN KEY. ivf_assign can never actually return a null
    cell (the centroid list is a literal, element_at(.., 1) of a
    non-empty slice always hits), but its element_at is *declared*
    nullable — so a join on the aliased column makes Catalyst infer
    ``IsNotNull(cell)`` and push it below the aliasing Project, where
    the ENTIRE K-centroid assignment expression is substituted into
    the Filter and evaluated a second time per corpus row (the
    filter-on-computed-column trap; observed in every IVF plan:
    Filter(isnotnull(<full assignment>)) under the scan). Coalescing
    with a never-taken -1 makes the column non-nullable, the inferred
    constraint trivially true, and the assignment evaluate ONCE."""
    return F.coalesce(
        F.element_at(ivf_assign(vec_col, centroids, nprobe=1), 1),
        F.lit(-1))


def ann_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-style ANN: coarse quantize the corpus into centroid cells,
    probe the query's nearest *nprobe* cells, exact-cosine rescore.

    Centroids seed from a deterministic stride sample of the corpus
    (reproducible, O(centroids) driver transfer); *kmeans_iters* > 0
    runs that many DataFrame-side Lloyd refinements
    (:func:`kmeans_refine_centroids`) — still fully deterministic.
    The corpus is assigned ONCE (nprobe=1 → disjoint cells, no row
    duplication); queries fan out to nprobe cells. Join is equi on
    cell id: hash-partitioned, broadcast query side, never a cross
    join. At 100 TB the cell assignment is a write-once partition
    column (partitionBy(cell)) and each probe prunes to nprobe/k of
    the corpus."""
    cents = seed_centroids(embeddings, n_centroids)
    if kmeans_iters > 0:
        cents = kmeans_refine_centroids(embeddings, cents, iterations=kmeans_iters)
    e = ensure_parallelism(embeddings).select(
        "vec_id",
        "embedding",
        ivf_cell(F.col("embedding"), cents).alias("cell"),
    )
    q = queries.select(
        "query_id",
        "q_embedding",
        F.explode(ivf_assign(F.col("q_embedding"), cents, nprobe=nprobe)).alias("cell"),
    )
    # a corrupt (NaN/Inf) embedding yields a non-finite score, and Spark
    # orders NaN as LARGEST — without this bound one bad vector becomes
    # the top neighbor of every query. Valid cosines live in [-1, 1];
    # out-of-band/NaN scores null out in the guard and drop below.
    # Norms hoisted per SIDE (same folds/sqrt as per-pair cosine() —
    # bit-identical) so the pair projection is one dot fold.
    scored = (
        e.withColumn("_nv", norm_nn(F.col("embedding")))
        .join(F.broadcast(q.withColumn("_nq", norm_nn(F.col("q_embedding")))),
              "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.try_divide(dot(F.col("embedding"), F.col("q_embedding")),
                         F.col("_nv") * F.col("_nq")).alias("cos"),
        )
        .where((F.col("cos") >= -1.0001) & (F.col("cos") <= 1.0001))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_recall_eval(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF nprobe calibration curve vs exact ground truth: one row per
    nprobe of (nprobe, recall_at_k, n_truth_pairs, avg_candidates) —
    the ANN analog of :func:`dedup.minhash_eval_vs_exact`. A pipeline
    runs this on a SAMPLE to pick the recall/cost point before
    committing a cell layout to the full 100 TB corpus.

    ONE corpus cell assignment and ONE brute-force truth pass serve
    every nprobe: IVF's rescoring is exact cosine over the probed
    cells, so a true top-k neighbor that lands in a probed cell always
    survives into IVF's top-k (its rank within a candidate SUBSET can
    only improve) — recall@k per nprobe is therefore a conditional
    count over the truth pairs' probe ranks, not |nprobes| reruns.
    Cells are disjoint (corpus assigned at nprobe=1), so each truth
    vector matches at most one probe row and candidate volume per
    nprobe is a prefix sum of probed-cell sizes. Only (id, cell,
    rank) triples and #cells-row size tables shuffle; vectors stay in
    the scan stage. Raw int/int quotients; rows-only (the sketch side
    has no SQL oracle by design)."""
    maxp = max(nprobes)
    cents = seed_centroids(embeddings, n_centroids)
    if kmeans_iters > 0:
        cents = kmeans_refine_centroids(embeddings, cents,
                                        iterations=kmeans_iters)
    # persisted: referenced by the truth join AND the cell-size rollup,
    # and each reference re-ran the embeddings scan + per-row centroid
    # assignment. Narrow (vec_id, cell) rows only — vectors never cache.
    e_cells = ensure_parallelism(embeddings).select(
        "vec_id",
        F.element_at(
            ivf_assign(F.col("embedding"), cents, nprobe=1), 1
        ).alias("cell"),
    ).persist()
    probes = queries.select(
        "query_id",
        F.posexplode(
            ivf_assign(F.col("q_embedding"), cents, nprobe=maxp)
        ).alias("_pos", "cell"),
    ).select("query_id", (F.col("_pos") + 1).alias("probe_rank"), "cell")
    truth = knn_bruteforce(embeddings, queries, k=k, sort=False).select(
        "query_id", "vec_id")
    hits = (
        truth.join(e_cells, "vec_id")
        .join(F.broadcast(probes), ["query_id", "cell"], "left")
    )
    rec = hits.agg(
        F.count(F.lit(1)).alias("n_truth_pairs"),
        *[
            F.sum((F.col("probe_rank") <= p).cast("bigint")).alias(f"_h{i}")
            for i, p in enumerate(nprobes)
        ],
    )
    cell_sizes = e_cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("cell_n"))
    cand = (
        probes.join(cell_sizes, "cell", "left")
        .agg(
            F.count_distinct(F.col("query_id")).alias("_nq"),
            *[
                F.sum(F.when(F.col("probe_rank") <= p,
                             F.coalesce(F.col("cell_n"), F.lit(0)))
                      .otherwise(0)).cast("bigint").alias(f"_c{i}")
                for i, p in enumerate(nprobes)
            ],
        )
    )
    row = rec.join(cand)
    stacked = row.selectExpr(
        "n_truth_pairs",
        "stack({}, {}) as (nprobe, n_hits, n_candidates)".format(
            len(nprobes),
            ", ".join(
                f"CAST({p} AS INT), _h{i}, _c{i}"
                for i, p in enumerate(nprobes)),
        ),
        "_nq",
    )
    return stacked.select(
        "nprobe",
        F.try_divide(F.col("n_hits"), F.col("n_truth_pairs"))
        .alias("recall_at_k"),
        "n_truth_pairs",
        F.try_divide(F.col("n_candidates"), F.col("_nq"))
        .alias("avg_candidates"),
    ).orderBy("nprobe")


def knn_label_vote(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """kNN classification: majority label among the top-k cosine
    neighbors of each query (ties break toward the smaller label —
    deterministic, oracle-friendly).

    Pipeline: exact top-k (broadcast queries, corpus never shuffled) →
    join neighbor labels → per-query label counts → argmax window.
    At scale, swap :func:`knn_bruteforce` for :func:`ann_lsh` /
    :func:`ann_ivf` — the vote logic is unchanged."""
    topk = knn_bruteforce(embeddings, queries, k=k, sort=False)
    labeled = topk.join(
        embeddings.select("vec_id", "label"), "vec_id"
    )
    votes = labeled.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.col("label").asc()
    )
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
        .orderBy("query_id")
    )


def embedding_centroids(embeddings: DataFrame, flat: bool = False) -> DataFrame:
    """Per-label centroid (elementwise mean vector) + member count.

    posexplode → groupBy (label, dim) avg → re-assemble sorted — two
    shuffles, both on small keys; the vectors themselves shuffle once as
    (label, dim, value) triples, which partial-aggregates map-side (the
    collect_list alternative would move every raw vector to one task
    per label).

    ``flat=True`` skips the re-assembly shuffle and returns the long
    form ``(label, dim, mean_v, n_members)`` — one shuffle total, and a
    scalar-only schema that cross-engine comparators can canonicalize
    (array output columns break pandas sort_values; the driver's
    round-6 comparator error on this query)."""
    dims = (
        embeddings.select("vec_id", "label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("mean_v"), F.count(F.lit(1)).alias("n"))
    )
    if flat:
        return dims.select(
            "label", "dim", F.round("mean_v", 6).alias("mean_v"),
            F.col("n").alias("n_members"),
        ).orderBy("label", "dim")
    return (
        dims.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_v"))
            ).alias("_dm"),
            F.max("n").alias("n_members"),
        )
        .select(
            "label",
            F.transform(F.col("_dm"), lambda s: F.round(s["mean_v"], 6)).alias("centroid"),
            "n_members",
        )
        .orderBy("label")
    )


def kmeans_refine_centroids(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iterations: int = 3,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means refinement of IVF centroids, fully DataFrame-side.

    Each iteration: assign every vector to its nearest centroid (per-row
    expression against the literal centroid array — no shuffle), then
    recompute centroid means via posexplode → (cell, dim) partial agg →
    regroup. Only the k·dim centroid matrix ever reaches the driver
    (deterministic: no RNG, fixed seed set, fixed iteration count).

    Spark-first equivalent of MLlib KMeans for this narrow use — the
    explicit form keeps the oracle/pytest story simple and the plan
    inspectable."""
    cents = centroids
    for _ in range(iterations):
        assigned = embeddings.select(
            "embedding",
            F.element_at(ivf_assign(F.col("embedding"), cents, nprobe=1), 1).alias("cell"),
        )
        dims = (
            assigned.select("cell", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.avg("v").alias("mean_v"))
        )
        new_rows = (
            dims.groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "mean_v"))).alias("dm")
            )
            .select(
                "cell",
                F.transform(F.col("dm"), lambda s: s["mean_v"]).alias("centroid"),
            )
            .collect()
        )
        moved = {int(r["cell"]): [float(x) for x in r["centroid"]] for r in new_rows}
        # empty cells keep their previous centroid
        cents = [(cid, moved.get(cid, vec)) for cid, vec in cents]
    return cents


def seed_centroids(embeddings: DataFrame, n_centroids: int = 16) -> list[tuple[int, list[float]]]:
    """Deterministic stride sample of the corpus as centroid seeds —
    O(centroids) driver transfer (count + modulo filter), never O(n)."""
    n = embeddings.count()
    step = max(1, n // n_centroids)
    return [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in (
            embeddings.where(F.col("vec_id") % step == 0)
            .orderBy("vec_id")
            .limit(n_centroids)
            .collect()
        )
    ]


def quantize_embeddings_int8(embeddings: DataFrame,
                             vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: the storage-scale path
    for an embedding corpus (4× smaller than float32, and int8 dot
    products SIMD-vectorize downstream).

    Per row: scale = absmax/127, q[i] = round(v[i]/scale) clamped to
    [-127, 127]. Pure array expressions in one narrow pass — no
    shuffle, no Python. A zero vector quantizes to zeros with scale 0
    (``try_divide`` keeps ANSI mode from killing the job — the same
    degenerate-input hardening as cosine). Reconstruction error is
    bounded by scale/2 per element (pytest asserts the bound)."""
    from pyperustats_spark.functions.text import let

    def body(v):
        # absmax over FINITE elements only: one NaN or ±Inf otherwise
        # poisons the scale, and under ANSI mode round(NaN).cast(int)
        # kills the whole job (CAST_OVERFLOW — found by probing, the
        # same failure class as the zero-vector cosine)
        inf = F.lit(float("inf"))
        finite = F.filter(v, lambda x: ~F.isnan(x) & (F.abs(x) != inf))

        # absmax is an O(dim) array scan referenced from EVERY element
        # of the quantize transform — without its own binding Catalyst
        # re-evaluates it per element (O(dim²) per row), so nest a
        # second let to pin it once per row
        def with_absmax(absmax):
            scale = (absmax / F.lit(127.0)).alias("scale")
            q = F.transform(
                v,
                # non-finite elements get deliberate codes (NaN→0, ±Inf
                # saturate); finite ones coalesce BEFORE clamping —
                # least/greatest skip NULLs, so a zero-vector division
                # (try_divide → NULL) would otherwise clamp to ±127
                lambda x: F.when(F.isnan(x), F.lit(0))
                .when(x == inf, F.lit(127))
                .when(x == -inf, F.lit(-127))
                .otherwise(
                    F.greatest(
                        F.lit(-127),
                        F.least(F.lit(127),
                                F.round(F.coalesce(
                                    F.try_divide(x, absmax / 127.0),
                                    F.lit(0.0))).try_cast("int")),
                    )
                ).cast("tinyint"),
            )
            return F.struct(q.alias("q"), scale)

        return let(F.array_max(F.transform(finite, lambda x: F.abs(x))),
                   with_absmax)

    out = embeddings.withColumn(
        "_qs", let(F.transform(F.col(vec_col), lambda x: x.cast("double")), body))
    return (
        out.withColumn("q_embedding", F.col("_qs.q"))
        .withColumn("q_scale", F.coalesce(F.col("_qs.scale"), F.lit(0.0)))
        .drop("_qs")
    )


def binary_signature(vec_col, dim: int = 64, word: int = 32):
    """Sign-bit binary quantization of an embedding to an array of
    *word*-bit integer words (bit i of word w = 1 iff
    vec[w·word + i] ≥ 0) — the 32×-smaller representation modern
    vector stores rerank from (1 bit/dim vs float32). Words are
    capped at 32 bits deliberately: DuckDB range-checks ``1 << 63``,
    so 32-bit words keep the signature EXACTLY reproducible by a SQL
    oracle in both engines (sign tests involve no arithmetic — the
    bits are deterministic for any float data). Pure array
    expressions, no shuffle, no Python."""
    if word > 62:
        raise ValueError("word must stay <= 62 bits (cross-engine "
                         f"shift range), got {word}")
    n_words = (dim + word - 1) // word
    zero = F.lit(0).cast("long")
    # shiftleft() takes a literal int, not the transform's index
    # column — ship the powers of two as ONE parsed literal array
    # (the lit_longs rule) and index it at runtime
    pow2 = lit_longs([1 << i for i in range(word)])
    words = [
        F.aggregate(
            F.transform(
                F.slice(vec_col, w * word + 1, min(word, dim - w * word)),
                lambda x, i: F.when(x >= 0,
                                    F.element_at(pow2, i + 1))
                .otherwise(zero)),
            zero, lambda acc, v: acc + v)
        for w in range(n_words)
    ]
    return F.array(*words)


def hamming_distance(sig_a, sig_b):
    """Bit-level Hamming distance between two signature word arrays:
    popcount of the per-word XOR, summed — integer-exact in Spark and
    DuckDB (bit_count + xor exist in both)."""
    return F.aggregate(
        F.zip_with(sig_a, sig_b,
                   lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def ann_hamming(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                dim: int = 64, word: int = 32,
                sort: bool = True) -> DataFrame:
    """Top-k nearest neighbors under binary-quantized HAMMING distance
    — the brute-force scan over 1-bit/dim signatures (query and corpus
    both sign-quantized; Hamming over sign bits is the standard proxy
    for angular distance). Returns (query_id, vec_id, hamming, rank),
    rank tie-broken by vec_id — every value integer, so the whole
    operator is DuckDB-oracle-backed exactly (unique among the ANN
    family, whose float distances are rows-only by necessity).

    Scale shape: signatures are computed in the scan projection
    (corpus bytes touched once, 1 bit/dim carried forward), the query
    side is an O(queries) broadcast, ranking is a per-query window —
    scan-proportional like knn_bruteforce but moving 32× less data;
    the LSH/IVF operators remain the sublinear path. Production note:
    a real deployment reranks the Hamming shortlist with exact
    distances (compose with knn_bruteforce on the shortlist); this
    operator is the quantized scan itself."""
    e = ensure_parallelism(embeddings).select(
        "vec_id",
        binary_signature(F.col("embedding"), dim=dim, word=word)
        .alias("sig"))
    q = queries.select(
        "query_id",
        binary_signature(F.col("q_embedding"), dim=dim, word=word)
        .alias("q_sig"))
    pairs = (
        e.join(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                hamming_distance(F.col("sig"), F.col("q_sig"))
                .alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("vec_id"))
    out = (pairs.withColumn("rank",
                            F.row_number().over(w).cast("bigint"))
           .where(F.col("rank") <= k))
    return out.orderBy("query_id", "rank") if sort else out


def ann_hamming_rerank(embeddings: DataFrame, queries: DataFrame,
                       k: int = 5, shortlist: int = 50,
                       dim: int = 64, word: int = 32,
                       sort: bool = True) -> DataFrame:
    """Two-stage quantized retrieval: Hamming-scan the 1-bit/dim
    signatures for a *shortlist*, then exact-cosine-rerank ONLY the
    shortlist against the float vectors — the deployment composition
    :func:`ann_hamming`'s docstring promises (same shape as the PQ
    ADC → exact rerank family). The float corpus is touched for
    |queries|·shortlist rows instead of the full scan; at 100 TB the
    first stage reads the 32×-smaller signature column and the rerank
    is a point-lookup join. Rows-only (cosine floats), with the
    exhaustive-shortlist == knn_bruteforce equality and a recall
    floor pinned in pytest.

    Honest recall note: sign-bit Hamming is a COARSE angular proxy —
    measured recall@5 vs exact knn on the synthetic corpus is
    0.47/0.73/0.93/1.0 at shortlists of 5%/10%/20%/30% of the corpus.
    It buys the 32× storage cut, not LSH-grade precision at tiny
    shortlists; size the shortlist accordingly (or use the multi-bit
    PQ family when shortlists must stay small)."""
    e = ensure_parallelism(embeddings)
    sigs = e.select(
        "vec_id",
        binary_signature(F.col("embedding"), dim=dim, word=word)
        .alias("sig"))
    q_sigs = queries.select(
        "query_id",
        binary_signature(F.col("q_embedding"), dim=dim, word=word)
        .alias("q_sig"))
    wh = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("vec_id"))
    cand = (
        sigs.join(F.broadcast(q_sigs))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                hamming_distance(F.col("sig"), F.col("q_sig"))
                .alias("hamming"))
        .withColumn("_hr", F.row_number().over(wh))
        .where(F.col("_hr") <= shortlist)
        .select("query_id", "vec_id")
    )
    qv = queries.select("query_id", "q_embedding")
    exact = (
        cand.join(e.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "vec_id",
                cosine(F.col("embedding"), F.col("q_embedding"))
                .alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id"))
    out = (exact.withColumn("rank",
                            F.row_number().over(w).cast("bigint"))
           .where(F.col("rank") <= k))
    return out.orderBy("query_id", "rank") if sort else out


def dequantize_embeddings_int8(df: DataFrame,
                               q_col: str = "q_embedding",
                               scale_col: str = "q_scale") -> DataFrame:
    """Inverse of :func:`quantize_embeddings_int8`: v̂[i] = q[i]·scale,
    as float (the working precision of the original column)."""
    return df.withColumn(
        "embedding_deq",
        F.transform(F.col(q_col),
                    lambda q: (q.cast("double") * F.col(scale_col)).cast("float")),
    )


def norm_profile(embeddings: DataFrame, eps: float = 1e-12,
                 sort: bool = True) -> DataFrame:
    """Per-vector norm diagnostics: L2 norm, dimension, and degenerate
    flags (zero/non-finite vectors) — the pre-flight scan before any
    cosine-based pipeline stage, since degenerate vectors are exactly
    what breaks similarity math downstream (see the knn finite-score
    bound).

    Narrow, zero-shuffle, whole-stage-codegen plan: one ordered
    fold per row (both engines fold the array sequentially, and
    IEEE sqrt is correctly rounded — identical bits; the norm ships
    RAW per the derived-doubles rule)."""
    from pyperustats_spark.functions.text import let

    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )

    # let-bind the O(dim) fold: the projection reads the norm four
    # times and CollapseProject would re-evaluate it per reference
    def profile(n):
        return F.struct(
            n.alias("norm"),
            (n < eps).alias("is_zero"),
            (~F.isnan(n) & (n != F.lit(float("inf")))).alias("is_finite"),
        )

    out = embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        let(F.sqrt(sq), profile).alias("p"),
    ).select("vec_id", "dim", "p.norm", "p.is_zero", "p.is_finite")
    return out.orderBy("vec_id") if sort else out


def ivf_cell_stats(embeddings: DataFrame, n_centroids: int = 16,
                   kmeans_iters: int = 0,
                   sort: bool = True) -> DataFrame:
    """IVF cell-occupancy diagnostic: vectors per cell plus the
    occupancy share — the vector-side companion of key_skew_profile.
    A lopsided histogram means probe cost concentrates in a few cells
    (the ANN latency tail) and says to refine centroids (Lloyd
    iterations) or re-seed before writing the cell partition layout
    at 100 TB.

    Same deterministic seeding (+ optional refinement) as
    :func:`ann_ivf`; the assignment scan is the only full pass, the
    rollup is n_centroids rows. Rows-only: shares are raw int/int and
    the centroid choice is engine-specific."""
    cents = seed_centroids(embeddings, n_centroids)
    if kmeans_iters > 0:
        cents = kmeans_refine_centroids(embeddings, cents,
                                        iterations=kmeans_iters)
    e = ensure_parallelism(embeddings).select(
        F.element_at(ivf_assign(F.col("embedding"), cents, nprobe=1), 1)
        .alias("cell"))
    n_total = embeddings.count()  # O(1) driver scalar, documented
    out = (
        e.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .withColumn("share", F.col("n_vectors") / F.lit(n_total))
    )
    return out.orderBy(F.desc("n_vectors"), F.asc("cell")) if sort else out


def pq_codebooks(embeddings: DataFrame, m: int = 8, k: int = 16,
                 dim: int = 64,
                 kmeans_iters: int = 0) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the *dim*-vector into *m*
    subspaces of dim/m and learn *k* codewords per subspace —
    deterministic stride-sample seeds (one corpus count, O(m·k·dim/m)
    driver transfer), optionally Lloyd-refined per subspace via
    :func:`kmeans_refine_centroids` on the sliced frame. Returns
    m × k × (dim/m) floats."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    if kmeans_iters > 0:
        # the m per-subspace Lloyd refinements each re-run the input
        # plan (scan + cell assign + residual projection) once per
        # collect — persist it for those m references (MEMORY_AND_DISK,
        # LRU-evicted; measured 14.9s -> ~8s on ann_ivf_pq_residual at
        # sf0.1). Released after the codebooks are learned.
        embeddings = embeddings.persist()
    n = embeddings.count()
    step = max(1, n // k)
    seeds = (
        embeddings.where(F.col("vec_id") % step == 0)
        .orderBy("vec_id").limit(k)
        .select("vec_id", "embedding").collect()
    )
    def one_book(s_idx: int) -> list[list[float]]:
        cents = [
            (int(r["vec_id"]),
             [float(x) for x in r["embedding"]][s_idx * d:(s_idx + 1) * d])
            for r in seeds
        ]
        if kmeans_iters > 0:
            sub = embeddings.select(
                "vec_id",
                F.slice("embedding", s_idx * d + 1, d).alias("embedding"))
            cents = kmeans_refine_centroids(sub, cents,
                                            iterations=kmeans_iters)
        return [c for _, c in cents]

    if kmeans_iters > 0:
        # the m per-subspace refinements are INDEPENDENT identical
        # plans whose cost is driver job latency, not cluster work —
        # sequentially they serialize m×iterations collect() round
        # trips (r11 VERDICT item 6: ~10 s of the sf0.1 wall was this
        # serial chain). Submitting them from a thread pool overlaps
        # the jobs in the scheduler; each job's plan, partitioning and
        # fold order are byte-identical to the sequential form, so the
        # learned codebooks are the same bits.
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=m) as pool:
            books = list(pool.map(one_book, range(m)))
        embeddings.unpersist()
    else:
        books = [one_book(s_idx) for s_idx in range(m)]
    return books


def _pq_scored(sub, book: list[list[float]]):
    """array<struct<dist,j>> of squared L2 distances from a bound
    subvector to every codeword. The codebook ships as ONE 2-D array
    literal and the per-codeword loop is a runtime ``transform`` with
    the index lambda — NOT a Python loop of per-codeword
    zip_with/aggregate constructions: building those k×m lambda trees
    through the Python column API measured 4 s of DRIVER time per
    operator at k=16, m=8 (zero Spark jobs; py4j round-trips), vs
    milliseconds for this form. Runtime arithmetic and fold order are
    identical, so codes and distances are bit-for-bit unchanged."""
    books_lit = lit_double_matrix(book)
    return F.transform(books_lit, lambda cw, j: F.struct(
        F.aggregate(
            F.zip_with(sub, cw, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v).alias("dist"),
        j.alias("j"),
    ))


def _pq_code(sub, book: list[list[float]]):
    """Argmin codeword index for one bound subvector (JVM array expr)."""
    return F.element_at(F.array_sort(_pq_scored(sub, book)), 1)["j"]


def pq_encode(embeddings: DataFrame,
              codebooks: list[list[list[float]]],
              keep: tuple = ()) -> DataFrame:
    """PQ-encode the corpus: (vec_id, codes array<int> of length m) —
    dim·4 bytes shrink to m codes (m bytes at k ≤ 256), the
    memory-bounded ANN storage layout (IVF-PQ's fine quantizer).

    Pure row-local array expressions: each subspace slice is let-bound
    once and compared against its k codewords JVM-side — no shuffle,
    no Python, scan-speed at any corpus size. Deterministic given the
    codebooks (which are themselves deterministic)."""
    from pyperustats_spark.functions.text import let

    m = len(codebooks)
    d = len(codebooks[0][0])

    def one(s_idx):
        return let(F.slice(F.col("embedding"), s_idx * d + 1, d),
                   lambda sub: _pq_code(sub, codebooks[s_idx]))

    return embeddings.select(
        "vec_id", *keep,
        F.array(*[one(s) for s in range(m)]).alias("codes"))


def pq_distortion_profile(embeddings: DataFrame, m: int = 8,
                          k: int = 16, dim: int = 64,
                          kmeans_iters: int = 0,
                          sort: bool = True) -> DataFrame:
    """Per-subspace PQ reconstruction distortion: (subspace, n_vectors,
    mean_sq_err) + the codebook size — the pre-flight a pipeline runs
    before committing a PQ layout to a 100 TB embedding corpus (the
    storage analog of :func:`ivf_cell_stats` / the recall analog of
    :func:`ivf_recall_eval`). Mean squared error per subspace =
    average squared L2 distance between each subvector and its chosen
    codeword.

    One encode pass (row-local) + one m-row partial aggregation;
    vectors never shuffle. Rows-only (distortion doubles; no SQL
    oracle by design — the property tests pin that distortion shrinks
    as k grows and is zero when the corpus fits the codebook
    exactly)."""
    from pyperustats_spark.functions.text import let

    books = pq_codebooks(embeddings, m=m, k=k, dim=dim,
                         kmeans_iters=kmeans_iters)
    d = dim // m

    def err(s_idx):
        book = books[s_idx]

        def body(sub):
            best = F.element_at(F.array_sort(_pq_scored(sub, book)), 1)
            return best["dist"]

        return let(F.slice(F.col("embedding"), s_idx * d + 1, d), body)

    errs = embeddings.select(
        *[err(s).alias(f"_e{s}") for s in range(m)])
    agg = errs.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        *[F.avg(f"_e{s}").alias(f"_m{s}") for s in range(m)])
    stacked = agg.selectExpr(
        "n_vectors",
        "stack({}, {}) as (subspace, mean_sq_err)".format(
            m, ", ".join(f"CAST({s} AS INT), _m{s}" for s in range(m))),
    ).select("subspace", "n_vectors",
             F.lit(k).alias("k_codewords"), "mean_sq_err")
    return stacked.orderBy("subspace") if sort else stacked


def _adc_flat_table(qv, books, m, d):
    """Flattened per-query ADC table: entry s·k + j = squared L2
    distance from the query's subvector s to codeword j — the SAME
    Python float computation as the literal-expression path, so the
    two forms are bit-identical."""
    flat = []
    for s in range(m):
        flat.extend(
            sum((qv[s * d + i] - c[i]) ** 2 for i in range(d))
            for c in books[s])
    return flat


def _adc_join_dist(cs, adc, m, k):
    """ADC distance as m lookups into a flattened table COLUMN
    (element_at index = s·k + code + 1), summed in the same
    left-to-right order as the literal path."""
    parts = [
        F.element_at(adc, F.lit(s * k + 1) + F.element_at(cs, s + 1))
        for s in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def ann_pq_adc(embeddings: DataFrame, queries: DataFrame, k: int = 5,
               m: int = 8, n_codewords: int = 16, dim: int = 64,
               kmeans_iters: int = 0,
               adc_join: bool = False) -> DataFrame:
    """PQ search via Asymmetric Distance Computation: the corpus is
    scanned as CODES ONLY (m small ints per vector — the float vectors
    never leave the encode pass), and each query carries a
    precomputed m × k table of squared L2 distances from its
    subvectors to every codeword; a vector's approximate distance is
    m table lookups summed. This is the query half of the IVF-PQ
    layout: at 100 TB the code table is ~dim·4/m× smaller than the
    corpus and the scan is memory-bandwidth-bound lookups, not FLOPs.
    Returns (query_id, vec_id, approx_dist, rank) — top-k ascending.

    Query vectors are collected driver-side to build the tables
    (O(queries·dim), same budget class as make_queries/IVF
    centroids); ranking reuses the per-query row_number window.
    Rows-only: approximate distances have no SQL oracle by design —
    pytest pins recall against exact L2 top-k.

    Two table shippings, bit-identical results (pytest-pinned):
    the default bakes each query's m×k table into the plan as literal
    array expressions — fine for the documented broadcast-query
    posture (tens-hundreds of queries) but plan size grows
    O(n_queries·m·k) and thousands of queries would blow up codegen
    before data size matters. ``adc_join=True`` ships the flattened
    tables as a BROADCAST DataFrame column instead and the distance
    becomes m element_at lookups — plan size flat in n_queries (the
    scale path; A/B in BENCH_SCALING.md)."""
    from pyperustats_spark.functions.text import let

    books = pq_codebooks(embeddings, m=m, k=n_codewords, dim=dim,
                         kmeans_iters=kmeans_iters)
    codes = pq_encode(ensure_parallelism(embeddings), books)
    d = dim // m
    qrows = queries.select("query_id", "q_embedding").collect()

    if adc_join:
        qadc = queries.sparkSession.createDataFrame(
            [(int(r["query_id"]),
              _adc_flat_table([float(x) for x in r["q_embedding"]],
                              books, m, d))
             for r in qrows],
            "query_id long, adc array<double>")
        scored = (
            codes.crossJoin(F.broadcast(qadc))
            .where(F.col("vec_id") != F.col("query_id"))
            .select("vec_id", "query_id",
                    _adc_join_dist(F.col("codes"), F.col("adc"),
                                   m, n_codewords).alias("approx_dist"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("approx_dist"), F.col("vec_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "approx_dist", "rank")
            .orderBy("query_id", "rank")
        )

    def dist_expr(qv):
        # m lookups into this query's literal distance tables
        def body(cs):
            parts = []
            for s in range(m):
                table = [
                    sum((float(qv[s * d + i]) - c[i]) ** 2
                        for i in range(d))
                    for c in books[s]
                ]
                parts.append(F.element_at(
                    lit_doubles(table),
                    F.element_at(cs, s + 1) + 1))
            out = parts[0]
            for p in parts[1:]:
                out = out + p
            return out

        return let(F.col("codes"), body)

    pairs = F.array(*[
        F.struct(F.lit(int(r["query_id"])).alias("query_id"),
                 dist_expr([float(x) for x in r["q_embedding"]])
                 .alias("approx_dist"))
        for r in qrows
    ])
    scored = (
        codes.select("vec_id", F.explode(pairs).alias("s"))
        .select("vec_id", F.col("s.query_id").alias("query_id"),
                F.col("s.approx_dist").alias("approx_dist"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ann_pq_rerank(embeddings: DataFrame, queries: DataFrame,
                  k: int = 5, shortlist: int = 50, m: int = 8,
                  n_codewords: int = 16, dim: int = 64,
                  kmeans_iters: int = 0,
                  adc_join: bool = False) -> DataFrame:
    """The production PQ search shape: ADC over codes produces a
    per-query *shortlist* (cheap, memory-bandwidth-bound —
    :func:`ann_pq_adc`), then ONLY the shortlist rows join their float
    vectors back for exact squared-L2 re-ranking. At 100 TB the
    exact-distance work drops from corpus-sized to
    O(queries · shortlist), and the vector join moves
    shortlist·dim·4 bytes — not the corpus. Returns (query_id,
    vec_id, dist, rank), exact distances, top-k ascending.

    Recall is the shortlist's hit rate (pytest pins it well above the
    raw ADC top-k); the re-rank itself is exact, so any true neighbor
    the shortlist contains lands in its exact position."""
    cand = ann_pq_adc(embeddings, queries, k=shortlist, m=m,
                      n_codewords=n_codewords, dim=dim,
                      kmeans_iters=kmeans_iters,
                      adc_join=adc_join).select(
        "query_id", "vec_id")
    qv = queries.select("query_id", "q_embedding")
    exact = (
        cand.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "vec_id",
            F.aggregate(
                F.zip_with(F.col("embedding"), F.col("q_embedding"),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, v: acc + v).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.col("vec_id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def py_probe_cells(qv, cents, nprobe: int):
    """Driver-side replica of :func:`ivf_assign`'s scoring for a query
    vector: left-to-right fold for dot and norm, sort by (−cos, cid) —
    bit-for-bit the JVM expression's choices, so driver-built
    (query, cell) fan-outs agree exactly with in-plan assignment."""
    import math

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for v in a:
            acc = acc + v * v
        return math.sqrt(acc)

    scored_c = []
    nq = fold_norm(qv)
    for cid, c in cents:
        denom = nq * fold_norm(c)
        neg = (-1.0 * (fold_dot(qv, c) / denom)
               if denom != 0.0 else float("inf"))
        scored_c.append((neg, int(cid)))
    scored_c.sort()
    return [cid for _, cid in scored_c[:nprobe]]


def ann_ivf_pq(embeddings: DataFrame, queries: DataFrame, k: int = 5,
               n_centroids: int = 16, nprobe: int = 4,
               shortlist: int = 50, m: int = 8, n_codewords: int = 16,
               dim: int = 64, kmeans_iters: int = 0,
               residual: bool = False,
               adc_join: bool = False,
               adc_matrix: bool = False) -> DataFrame:
    """The full IVF-PQ search pipeline — both halves of the
    memory-bounded ANN layout wired together: coarse quantizer (IVF
    cells, :func:`ivf_assign`) restricts the scan to the query's
    *nprobe* cells, ADC over PQ codes (:func:`ann_pq_adc`'s distance
    tables) ranks a per-query *shortlist* inside those cells, and ONLY
    the shortlist rows join their float vectors back for exact
    squared-L2 re-ranking. Returns (query_id, vec_id, dist, rank) —
    exact distances, top-k ascending.

    At 100 TB this is the plan that survives: the corpus persists
    once as (cell, codes) — m bytes/vector instead of dim·4, cell as
    a partition column — so a query reads nprobe/n_centroids of a
    codes-only table (partition-pruned, memory-bandwidth-bound
    lookups), and the float vectors are touched for
    O(queries · shortlist) rows, never scanned. Recall vs brute force
    at equal candidate budget is pinned in pytest
    (tests/test_operators.py, clustered + uniform corpora).

    ``residual=True`` adds the classic refinement (Jégou et al.'s
    IVF-ADC): codes quantize ``vector − cell_centroid`` instead of the
    raw vector — residuals inside a cell have far smaller spread, so
    the same m×k codebook resolves them more finely on clustered
    corpora — and each query then carries one ADC table per PROBED
    CELL (its residual w.r.t. that cell's centroid). Probed cells are
    computed driver-side with the same fold order as
    :func:`ivf_assign` so the CASE branches and the broadcast
    (query, cell) pairs agree exactly.

    Honest local measurement: on the 320-vector pytest corpora,
    residual codes cut PQ reconstruction MSE ~1.4× (pinned in
    tests/test_operators.py) but END-TO-END recall ties the raw-code
    path — a shortlist of 50 over 320 vectors plus exact re-rank
    absorbs the ADC error either way. The recall win appears when
    shortlist/corpus is small (the 100 TB regime: shortlist 100 over
    millions of rows per cell), which a local pin cannot exhibit —
    mirror of the approx-percentile twins note in CLAUDE.md.

    Plan shape: centroid seeding is the one O(n_centroids·dim) driver
    transfer; cell assignment and PQ encoding are row-local JVM array
    expressions in ONE projection (no self-join between the coarse
    and fine quantizer); the query→cell fan-out is a broadcast equi
    join (nprobe rows per query); ADC distance is a let-bound CASE
    over the broadcast query id (and cell, when residual) — each row
    evaluates only its matched branch's table lookups. Two shuffles
    total: the top-shortlist window and the top-k window after
    re-rank."""
    from pyperustats_spark.functions.text import let

    cents = seed_centroids(embeddings, n_centroids)
    if kmeans_iters > 0:
        cents = kmeans_refine_centroids(embeddings, cents,
                                        iterations=kmeans_iters)
    d = dim // m
    base = ensure_parallelism(embeddings).select(
        "vec_id", "embedding",
        ivf_cell(F.col("embedding"), cents).alias("cell"))
    center_of = {int(cid): c for cid, c in cents}
    if residual:
        # residual = vector − its cell's centroid, via a literal
        # map<cid, array> lookup — still one row-local projection
        cmap = F.create_map(*[
            x for cid, c in cents
            for x in (F.lit(int(cid)),
                      lit_doubles(c))])
        enc_in = base.select(
            "vec_id", "cell",
            F.zip_with("embedding", F.element_at(cmap, F.col("cell")),
                       lambda a, b: a - b).alias("embedding"))
    else:
        enc_in = base
    books = pq_codebooks(enc_in, m=m, k=n_codewords, dim=dim,
                         kmeans_iters=kmeans_iters)
    # (cell, codes) in one projection over one scan: the write-once
    # layout of an IVF-PQ index
    coded = pq_encode(enc_in, books, keep=("cell",))

    qrows = queries.select("query_id", "q_embedding").collect()

    probes = {int(r["query_id"]):
              py_probe_cells([float(x) for x in r["q_embedding"]],
                             cents, nprobe)
              for r in qrows}
    qcells = queries.sparkSession.createDataFrame(
        [(qid, cid) for qid, cids in sorted(probes.items())
         for cid in cids],
        "query_id long, cell long")

    def adc_tables(qv):
        return [
            [sum((qv[s * d + i] - c[i]) ** 2 for i in range(d))
             for c in books[s]]
            for s in range(m)
        ]

    def dist_for(cs, tables):
        parts = [
            F.element_at(lit_doubles(tables[s]),
                         F.element_at(cs, s + 1) + 1)
            for s in range(m)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out

    def dist_case(cs):
        expr = None
        for r in qrows:
            qid = int(r["query_id"])
            qv = [float(x) for x in r["q_embedding"]]
            if residual:
                # one table set per probed cell: the query's residual
                # w.r.t. that cell's centroid
                for cid in probes[qid]:
                    ctr = center_of[cid]
                    tables = adc_tables([qv[i] - ctr[i]
                                         for i in range(dim)])
                    branch = dist_for(cs, tables)
                    cond = ((F.col("query_id") == qid)
                            & (F.col("cell") == cid))
                    expr = (F.when(cond, branch) if expr is None
                            else expr.when(cond, branch))
            else:
                tables = adc_tables(qv)
                branch = dist_for(cs, tables)
                cond = F.col("query_id") == qid
                expr = (F.when(cond, branch) if expr is None
                        else expr.when(cond, branch))
        return expr

    if adc_matrix:
        # r9-verdict probe: ALL flattened ADC tables as ONE literal
        # matrix (functions/vectors.lit_double_matrix — a single
        # parsed expression string, the expression-construction
        # rule), with the broadcast (query, cell) join carrying only
        # a compact row index into it; distance = let-bound
        # element_at(MATRIX, idx) then m lookups. Plan size grows
        # O(n_queries·m·k) like the literal-CASE form but without
        # the per-row CASE chain, and the broadcast rows carry one
        # int instead of an m·k double array.
        tables, idx_rows = [], []
        for r in qrows:
            qid = int(r["query_id"])
            qv = [float(x) for x in r["q_embedding"]]
            if residual:
                for cid in probes[qid]:
                    src = [qv[i] - center_of[cid][i]
                           for i in range(dim)]
                    tables.append(_adc_flat_table(src, books, m, d))
                    idx_rows.append((qid, cid, len(tables)))
            else:
                tables.append(_adc_flat_table(qv, books, m, d))
                for cid in probes[qid]:
                    idx_rows.append((qid, cid, len(tables)))
        qidx = queries.sparkSession.createDataFrame(
            idx_rows, "query_id long, cell long, qi int")
        mat = lit_double_matrix(tables)
        scored = (
            coded.join(F.broadcast(qidx), "cell")
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", "cell",
                    let(F.element_at(mat, F.col("qi")),
                        lambda adc: _adc_join_dist(
                            F.col("codes"), adc, m, n_codewords))
                    .alias("approx_dist"))
        )
    elif adc_join:
        # scale form (see ann_pq_adc docstring): one flattened table
        # per (query, probed cell) rides a broadcast DataFrame — the
        # same (cell) broadcast equi-join qcells used, now carrying
        # the table column too, so plan size stays flat in n_queries.
        # Non-residual queries get nprobe copies of one table (tiny).
        rows = []
        for r in qrows:
            qid = int(r["query_id"])
            qv = [float(x) for x in r["q_embedding"]]
            for cid in probes[qid]:
                src = ([qv[i] - center_of[cid][i] for i in range(dim)]
                       if residual else qv)
                rows.append((qid, cid, _adc_flat_table(src, books, m,
                                                       d)))
        qadc = queries.sparkSession.createDataFrame(
            rows, "query_id long, cell long, adc array<double>")
        scored = (
            coded.join(F.broadcast(qadc), "cell")
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", "cell",
                    _adc_join_dist(F.col("codes"), F.col("adc"),
                                   m, n_codewords).alias("approx_dist"))
        )
    else:
        scored = (
            coded.join(F.broadcast(qcells), "cell")
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", "cell",
                    let(F.col("codes"), dist_case).alias("approx_dist"))
        )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.col("vec_id").asc())
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= shortlist)
        .select("query_id", "vec_id")
    )
    qv = queries.select("query_id", "q_embedding")
    exact = (
        cand.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "vec_id",
            F.aggregate(
                F.zip_with(F.col("embedding"), F.col("q_embedding"),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, v: acc + v).alias("dist"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.col("vec_id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def pca_model(embeddings: DataFrame, dim: int = 64,
              k: int = 16) -> tuple[list[float], list[float],
                                    list[list[float]]]:
    """Fit a PCA rotation on the embedding corpus — the
    preprocessing step that makes product quantization's independent-
    subspace assumption honest (the OPQ insight, Ge et al.: PQ codes
    anisotropic correlated dims poorly; decorrelate first). Returns
    ``(mean, eigenvalues, components)`` with *k* orthonormal
    components in descending-eigenvalue order.

    Scale shape: the moment statistics are computed DISTRIBUTED by
    Spark ML's JVM aggregators (``Summarizer`` mean/std +
    ``Correlation.corr`` — one pass each, vector-typed partial
    aggregation); only the dim×dim correlation matrix (O(dim²)
    floats, 32 KB at dim=64) ever reaches the driver, where numpy's
    symmetric eigensolver runs on a matrix this small in
    microseconds. Covariance is reconstructed as corr·σσᵀ;
    zero-variance dims yield NaN correlations which are zeroed (they
    carry no signal and must not poison the eigensolver). Component
    signs are canonicalized (largest-|entry| positive) so repeated
    fits are bit-stable."""
    import numpy as np
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Correlation, Summarizer

    v = embeddings.select(array_to_vector("embedding").alias("features"))
    row = v.select(Summarizer.mean(F.col("features")).alias("mu"),
                   Summarizer.std(F.col("features")).alias("sd")).collect()[0]
    mu = np.array(list(row["mu"]))
    sd = np.array(list(row["sd"]))
    C = Correlation.corr(v, "features").collect()[0][0].toArray()
    C = np.nan_to_num(C, nan=0.0)
    cov = C * np.outer(sd, sd)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        c = vecs[:, idx]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append([float(x) for x in c])
    return ([float(x) for x in mu],
            [float(vals[i]) for i in order], comps)


def pca_project(embeddings: DataFrame, dim: int = 64, k: int = 16,
                model: tuple | None = None) -> DataFrame:
    """Project embeddings onto their top-*k* principal components:
    (vec_id, pca array<double>). The rotation is a literal-matrix
    row-local expression (k dot products of dim terms per row — the
    ivf_assign pattern, whole-stage codegen, zero shuffles); pass a
    prefit *model* from :func:`pca_model` to reuse one fit across
    splits (fitting on train and projecting val through the SAME
    rotation is the leakage-correct workflow)."""
    from pyperustats_spark.functions.text import let

    mu, _, comps = model if model is not None else \
        pca_model(embeddings, dim=dim, k=k)
    mu_lit = lit_doubles(mu)

    def _proj(centered):
        # one 2-D component literal + runtime transform, not per-
        # component Python-built lambdas (see _pq_scored rationale)
        comps_lit = lit_double_matrix(comps)
        return F.transform(comps_lit, lambda cw: F.aggregate(
            F.zip_with(centered, cw, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x))

    centered = F.zip_with("embedding", mu_lit, lambda a, b: a - b)
    return ensure_parallelism(embeddings).select(
        "vec_id", let(centered, _proj).alias("pca"))


def pca_variance_profile(embeddings: DataFrame, dim: int = 64,
                         k: int = 16) -> DataFrame:
    """The analyst's view of :func:`pca_model`: one row per retained
    component with its eigenvalue, variance share, and cumulative
    share — how a pipeline picks k before committing the projection
    (rows-only: eigendecompositions aren't SQL)."""
    import numpy as np

    _, vals, _ = pca_model(embeddings, dim=dim, k=dim)
    total = float(np.sum(vals)) if vals else 0.0
    rows, cum = [], 0.0
    for i, v in enumerate(vals[:k]):
        share = v / total if total > 0 else None
        cum += share if share else 0.0
        rows.append((i, float(v), share, cum))
    return embeddings.sparkSession.createDataFrame(
        rows, "component int, eigenvalue double, var_share double, "
              "cum_share double")


def ann_opq_rerank(embeddings: DataFrame, queries: DataFrame,
                   k: int = 5, shortlist: int = 50, m: int = 8,
                   n_codewords: int = 16, dim: int = 64,
                   kmeans_iters: int = 0,
                   model: tuple | None = None) -> DataFrame:
    """OPQ-style PQ search: rotate corpus AND queries into the full
    PCA basis (*k = dim* — a distance-preserving orthonormal rotation,
    not a reduction), then run the PQ → ADC shortlist → exact re-rank
    pipeline of :func:`ann_pq_rerank` entirely in rotated space. The
    rotation decorrelates dimensions so PQ's independent-subspace
    codebooks fit the data better (Ge et al.'s OPQ with the PCA
    initialization — reconstruction-MSE advantage pinned 1.33× in
    tests/test_operators.py); because an orthonormal rotation
    preserves squared L2, the exact re-rank distances are the
    ORIGINAL-space distances up to fp rounding, so results are
    directly comparable with every other ANN path. Returns
    (query_id, vec_id, dist, rank), top-k ascending.

    Scale shape: the one extra cost over plain PQ is the rotation —
    a dim×dim literal-matrix row-local projection fused into the same
    scan that encodes codes (no extra shuffle, no Python); the PCA
    fit itself moves only O(dim²) floats to the driver
    (:func:`pca_model`). At 100 TB the rotated codes persist once and
    queries rotate driver-side — the index layout is unchanged.

    Pass a prefit *model* to reuse one rotation across corpus
    versions (re-fitting per increment would silently re-encode the
    whole index)."""
    mdl = model if model is not None else \
        pca_model(embeddings, dim=dim, k=dim)
    # persist the rotated corpus: the dim×dim matrix-multiply
    # projection is O(dim²) FLOPs per row and downstream it is
    # executed FOUR times otherwise (codebook count + seed collect,
    # the ADC encode scan, and the exact re-rank vector join — r11
    # measured 4.8 s → 2.9 s at sf0.1). At 100 TB this cache IS the
    # documented index layout ("the rotated codes persist once"):
    # rotation happens at write time, never per query.
    # Cache lifetime: the returned frame still references rot (the
    # exact re-rank join), so the operator cannot unpersist before
    # return. The block is corpus×dim-sized and lives until the
    # caller's session clears it — bench.py and tools/parity.py both
    # clearCache() between queries (r12), and a long-lived caller
    # should treat rot as the index it would otherwise write: rotate
    # once at ingest, not per query (then this persist never recurs).
    rot = (
        pca_project(embeddings, dim=dim, k=dim, model=mdl)
        .withColumnRenamed("pca", "embedding")
        .persist()
    )
    qrot = (
        pca_project(
            queries.select(F.col("query_id").alias("vec_id"),
                           F.col("q_embedding").alias("embedding")),
            dim=dim, k=dim, model=mdl)
        .select(F.col("vec_id").alias("query_id"),
                F.col("pca").alias("q_embedding"))
    )
    return ann_pq_rerank(rot, qrot, k=k, shortlist=shortlist, m=m,
                         n_codewords=n_codewords, dim=dim,
                         kmeans_iters=kmeans_iters)


def label_separation(embeddings: DataFrame,
                     sort: bool = True) -> DataFrame:
    """Embedding-space health card per label: how TIGHT each label's
    cluster is versus how FAR its nearest neighboring centroid sits —
    (label, n_members, mean_intra, nearest_label, nearest_dist,
    separation = nearest_dist / mean_intra). separation ≲ 1 means the
    label bleeds into a neighbor (a mislabeled shard, a collapsed
    embedding model); ≫ 1 means clean structure. The centroid-based
    simplification of silhouette — O(n·d + L²·d), never the O(n²)
    pairwise silhouette.

    Shapes: one flat (label, dim) aggregate builds centroids
    (round-6 grid like embedding_centroids, so both engines feed
    identical centroid bits downstream); per-vector own-centroid
    distances ride ONE broadcast join of the L-row centroid frame
    (persisted — referenced three times); centroid-pair distances are
    an L×L broadcast cross join, bounded by label cardinality. Means
    are plain avgs of ulp-stable doubles (the knn-family posture: the
    comparator's round-6 absorbs fold-order ulps); separation divides
    two such scalars and ships raw. Output is scalar-only
    (comparator-safe)."""
    flat = embeddings.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "_v0"),
    ).select("label", "dim", F.col("_v0").cast("double").alias("v"))
    cent = flat.groupBy("label", "dim").agg(
        F.round(F.avg("v"), 6).alias("c"))
    cvec = (cent.groupBy("label")
            .agg(F.transform(F.array_sort(F.collect_list(
                F.struct("dim", "c"))), lambda r: r["c"]).alias("carr"))
            .persist())
    nmem = embeddings.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"))

    def d2(a, b):
        return F.sqrt(F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x))

    own = (embeddings.join(F.broadcast(cvec), "label")
           .select("label",
                   d2(F.transform("embedding",
                                  lambda x: x.cast("double")),
                      F.col("carr")).alias("_d")))
    intra = own.groupBy("label").agg(F.avg("_d").alias("mean_intra"))
    a = cvec.select(F.col("label").alias("label"),
                    F.col("carr").alias("_ca"))
    b = cvec.select(F.col("label").alias("_other"),
                    F.col("carr").alias("_cb"))
    pairs = (a.crossJoin(F.broadcast(b))
             .where(F.col("label") != F.col("_other"))
             .select("label", "_other",
                     d2(F.col("_ca"), F.col("_cb")).alias("_cd")))
    near = (pairs.withColumn(
        "_rk", F.row_number().over(
            Window.partitionBy("label").orderBy("_cd", "_other")))
        .where(F.col("_rk") == 1)
        .select("label", F.col("_other").alias("nearest_label"),
                F.col("_cd").alias("nearest_dist")))
    out = (nmem.join(intra, "label").join(near, "label")
           .select("label", "n_members", "mean_intra",
                   "nearest_label", "nearest_dist",
                   F.try_divide(F.col("nearest_dist"),
                                F.col("mean_intra")).alias("separation")))
    return out.orderBy("label") if sort else out


def kcenter_sample(embeddings: DataFrame, k: int = 8,
                   sort: bool = True) -> DataFrame:
    """Diversity-aware coreset selection: greedy k-center (farthest-
    point traversal, Gonzalez 1985 — the classic 2-approximation to
    the k-center cover) over the embedding corpus, then every vector
    assigned to its nearest selected center. The training-data
    DIVERSITY tool that pairs with dedup: dedup removes redundancy
    pairwise, k-center picks a maximally-spread representative subset
    (coreset sampling / SemDeDup's diversity half). Returns one row
    per corpus vector (vec_id, center, center_vec_id, dist2) where
    ``center`` is the pick ORDER (1..k) of its nearest center —
    deterministic end to end (seed = smallest vec_id; argmax ties
    break to the smallest vec_id; squared-L2 arithmetic is a fixed
    left-fold, so the Spark doubles equal a Python model's bit for
    bit, pinned in pytest).

    Scale shape: k rounds, each ONE narrow pass updating the running
    min-distance column (row-local zip_with/aggregate against the
    round's center literal — whole-stage codegen, no shuffle) plus a
    1-row min-struct argmax (map-side partial agg). Only k·dim floats
    plus k (vec_id, dist) rows ever reach the driver (the documented
    O(small) collect class — same budget as IVF centroid seeding).
    The frame is persisted per round because each round's argmax is
    an ACTION on the chain (k cached generations, prior one evicted —
    pagerank's lazy-linear rule does not apply across actions)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def d2(vec, center_lit):
        return F.aggregate(
            F.zip_with(vec, center_lit,
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    base = embeddings.select("vec_id", "embedding")
    seed_rows = base.orderBy("vec_id").limit(1).collect()
    if not seed_rows:
        # empty corpus: empty result with the output schema (the
        # degenerate-input contract — a filtered-to-zero slice must
        # never abort the job)
        return base.select(
            "vec_id",
            F.lit(None).cast("bigint").alias("center"),
            F.lit(None).cast("bigint").alias("center_vec_id"),
            F.lit(None).cast("double").alias("dist2"))
    seed = seed_rows[0]
    centers = [(1, int(seed["vec_id"]),
                [float(x) for x in seed["embedding"]])]
    state = base.select(
        "vec_id", "embedding",
        d2(F.col("embedding"), lit_doubles(centers[0][2])).alias("_mind")
    ).persist()
    state.count()
    for rank in range(2, k + 1):
        far = state.agg(F.min(F.struct(
            (-F.col("_mind")).alias("nd"),
            F.col("vec_id").alias("vid"))).alias("m")).collect()[0]["m"]
        if -float(far["nd"]) <= 0.0:
            # every vector already sits ON a center (k exceeds the
            # number of distinct embeddings) — further rounds would
            # re-pick covered points as duplicate centers
            break
        picked = (state.where(F.col("vec_id") == int(far["vid"]))
                  .select("embedding").collect()[0]["embedding"])
        cvec = [float(x) for x in picked]
        centers.append((rank, int(far["vid"]), cvec))
        prev = state
        state = state.select(
            "vec_id", "embedding",
            F.least(F.col("_mind"),
                    d2(F.col("embedding"), lit_doubles(cvec)))
            .alias("_mind")).persist()
        state.count()
        prev.unpersist()
    # final assignment: nearest selected center by (dist2, pick order)
    ranks = lit_longs([r for r, _, _ in centers])
    vids = lit_longs([v for _, v, _ in centers])
    mats = lit_double_matrix([c for _, _, c in centers])
    scored = F.transform(mats, lambda cw, j: F.struct(
        d2(F.col("embedding"), cw).alias("d"),
        F.element_at(ranks, j + 1).alias("r"),
        F.element_at(vids, j + 1).alias("v")))
    best = F.element_at(F.array_sort(scored), 1)
    out = state.select(
        "vec_id",
        best["r"].alias("center"),
        best["v"].alias("center_vec_id"),
        best["d"].alias("dist2"))
    return out.orderBy("vec_id") if sort else out


def matryoshka_eval(embeddings: DataFrame, queries: DataFrame,
                    k: int = 5, dims: tuple[int, ...] = (4, 8, 16, 32, 64),
                    ) -> DataFrame:
    """Dimension-truncation calibration curve (Matryoshka-style
    retrieval, Kusupati et al. 2022, arXiv:2205.13147): recall@k of
    cosine top-k computed on each PREFIX of the embedding versus the
    full-dimension exact truth — one row (dim, recall_at_k,
    n_truth_pairs) per prefix. A pipeline runs this on a sample to
    pick the shortest prefix that holds recall before shrinking the
    ANN index / shuffle payloads by dim/D.

    ONE corpus×queries scoring pass serves every prefix: per pair,
    prefix dots and prefix norms come from a single transform over
    the dims literal (each slice re-aggregates — |dims| small terms,
    all row-local JVM expressions), then one explode and ONE rank
    shuffle partitioned by (dim, query_id). The full-dim truth is the
    dim = max(dims) slice of the same pass when max(dims) equals the
    true dimension — recall at that row pins 1.0 as a self-check.

    Rows-only by design (approximate-retrieval quality, no SQL
    oracle); recall monotonicity and the full-dim fixpoint are pinned
    in pytest."""
    dim_lits = lit_longs(sorted(dims))
    full = max(dims)

    def pair_scores(e_col, q_col):
        return F.transform(dim_lits, lambda d: F.struct(
            d.alias("dim"),
            F.try_divide(
                dot(F.slice(e_col, 1, d.cast("int")),
                    F.slice(q_col, 1, d.cast("int"))),
                norm(F.slice(e_col, 1, d.cast("int")))
                * norm(F.slice(q_col, 1, d.cast("int")))).alias("cos")))

    scored = (
        ensure_parallelism(embeddings)
        .crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.explode(pair_scores(
                F.col("embedding"), F.col("q_embedding"))).alias("s"))
        .select("query_id", "vec_id",
                F.col("s.dim").alias("dim"), F.col("s.cos").alias("cos"))
        .where((F.col("cos") >= -1.0001) & (F.col("cos") <= 1.0001))
    )
    w = Window.partitionBy("dim", "query_id").orderBy(
        F.desc("cos"), F.col("vec_id").asc())
    topk = (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("dim", "query_id", "vec_id")
    )
    # the heavy corpus×queries subtree is referenced ONCE (Catalyst
    # re-executes per reference — CLAUDE.md): fold each pair's dim
    # memberships into one row, keep truth pairs (in the top-k at the
    # full prefix), and count hits per dim in one aggregate. The truth
    # total is the dim = full row of the SAME |dims|-row result, read
    # back via a bounded partition-less window (temperature_mixture
    # class), never a second pass.
    pair_flags = (
        topk.groupBy("query_id", "vec_id")
        .agg(
            F.max(F.when(F.col("dim") == full, 1).otherwise(0)).alias("_t"),
            F.collect_set("dim").alias("_ds"),
        )
        .where(F.col("_t") == 1)
        .select(F.explode("_ds").alias("dim"))
    )
    rec = pair_flags.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    # a prefix with ZERO truth hits would simply vanish from the
    # aggregate — join a |dims|-row spine so it reports recall 0
    spine = embeddings.sparkSession.createDataFrame(
        [(int(d),) for d in sorted(dims)], "dim bigint")
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    out = spine.join(
        rec.select(F.col("dim").cast("bigint").alias("dim"), "n_hits"),
        "dim", "left",
    ).select(
        "dim",
        F.max(F.when(F.col("dim") == full, F.col("n_hits")))
        .over(wt).cast("bigint").alias("n_truth_pairs"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint")
        .alias("n_hits"),
    ).select(
        "dim", "n_truth_pairs",
        F.try_divide(F.col("n_hits"), F.col("n_truth_pairs"))
        .alias("recall_at_k"),
    )
    return out.orderBy("dim")


def centroid_drift(embeddings: DataFrame,
                   sort: bool = True) -> DataFrame:
    """Embedding-distribution drift card per label: split the corpus
    into two deterministic halves (vec_id parity — in production the
    two sides are two releases/batches) and report, per label, the
    COSINE between the two half-centroids plus the centroid-norm
    ratio — the embedding-side companion of the doc-length drift
    monitor (an embedding-model change, a source shift, or an
    ingestion bug moves a label's centroid long before recall evals
    notice).

    Exactness ladder: each float coordinate is snapped to integer
    micro-units (round(x·1e6) — float32 inputs are exact in double,
    the rounding is identical cross-engine), so the per-(label, half,
    dim) sums are exact integers; cosine needs only the SUM vectors
    (scale-invariance: cos(s0/n0, s1/n1) = cos(s0, s1)), and the
    dot/norm accumulations run in DECIMAL(38,0) (HUGEINT in the
    oracle) — exact and merge-order-proof — with one correctly-
    rounded sqrt/division pair at the end. The norm ratio
    (|c0|/|c1| = n1·√Σs0² / (n0·√Σs1²)) divides the same exact
    quantities.

    Scale: one posexplode shuffle to (label, half, dim) — a bounded
    key space (labels × 2 × dims) — then a |labels|-row rollup.
    Vectors never ride a join."""
    halves = embeddings.select(
        "label",
        (F.col("vec_id") % 2).alias("_h"),
        F.posexplode(F.col("embedding")).alias("_d", "_v"),
    ).withColumn("_vm", F.round(F.col("_v").cast("double") * 1e6)
                 .cast("bigint"))
    sums = halves.groupBy("label", "_h", "_d").agg(
        F.sum("_vm").cast("bigint").alias("_s"))
    wide = (
        sums.groupBy("label", "_d")
        .agg(
            F.sum(F.when(F.col("_h") == 0, F.col("_s"))).alias("_s0"),
            F.sum(F.when(F.col("_h") == 1, F.col("_s"))).alias("_s1"),
        )
        .where(F.col("_s0").isNotNull() & F.col("_s1").isNotNull())
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    counts = embeddings.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint").alias("n_b"),
    )
    acc = wide.groupBy("label").agg(
        F.sum(dec(F.col("_s0")) * F.col("_s1")).alias("_dot"),
        F.sum(dec(F.col("_s0")) * F.col("_s0")).alias("_q0"),
        F.sum(dec(F.col("_s1")) * F.col("_s1")).alias("_q1"),
    )
    out = (
        acc.join(counts, "label")
        .select(
            "label", "n_a", "n_b",
            F.try_divide(
                F.col("_dot").cast("double"),
                F.sqrt(F.col("_q0").cast("double"))
                * F.sqrt(F.col("_q1").cast("double")))
            .alias("centroid_cosine"),
            F.try_divide(
                F.col("n_b") * F.sqrt(F.col("_q0").cast("double")),
                F.col("n_a") * F.sqrt(F.col("_q1").cast("double")))
            .alias("norm_ratio"),
        )
    )
    return out.orderBy("label") if sort else out


def two_nn_anchor_threshold(n: int, max_anchors: int = 2048) -> str:
    """md5-hex prefix bounding the Two-NN anchor sample to ~max_anchors.

    Below 8·max_anchors corpus rows the classic 12.5 % slice ('2')
    stays — the declared query's results at every gate SF are
    bit-identical to the uncapped form. Past that, the slice narrows
    to a 4-hex-digit prefix so the expected anchor count is pinned at
    ~max_anchors and the anchors×corpus exact 2-NN scan is LINEAR in
    depth, not quadratic (r11 VERDICT item 1: the 12.5 % slice at 100×
    depth meant 25k × 200k × dim interpreted fold ops — killed at
    25 min). Integer arithmetic only, reproduced verbatim by the
    DuckDB oracle (printf('%04x', greatest(1, (cap·65536) // n)))."""
    if n <= 8 * max_anchors:
        return "2"
    return format(max(1, (max_anchors * 65536) // n), "04x")


def two_nn_intrinsic_dim(embeddings: DataFrame,
                         sample_hex_lt: str | None = None,
                         max_anchors: int = 2048) -> DataFrame:
    """Facco et al.'s Two-NN intrinsic-dimension estimator (Sci. Rep.
    7:12140, 2017) over the embedding corpus: for a sampled set of
    points, take the ratio mu = d2/d1 of the exact 2nd- to 1st-
    nearest-neighbor distances; under a locally uniform density the
    mu are Pareto(id) and the MLE is  id = n / SUM ln mu. A 768-dim
    embedding column with id ~ 15 lives on a low-dimensional
    manifold — the number that says how aggressively Matryoshka/PQ
    truncation (emb_matryoshka_eval, embedding_pq_profile) can
    compress before recall falls off. ONE row: (n_queries, n_valid,
    sum_ln_ratio_micro, id_mle).

    Sampling: the estimator needs a SAMPLE of anchor points, not all
    of them — queries are the md5('twonn:' || vec_id) <
    *sample_hex_lt* slice. When *sample_hex_lt* is None (the declared
    query), the threshold is DEPTH-ADAPTIVE via
    :func:`two_nn_anchor_threshold`: the classic 12.5 % slice ('2')
    up to 8·max_anchors corpus rows — bit-identical results at every
    gate SF — then a narrower 4-hex prefix pinning the expected
    anchor count at ~*max_anchors*, so the exact anchors×corpus scan
    is linear in depth (one cheap count-star action derives the
    threshold; the filter itself stays row-local and is reproduced
    verbatim by the oracle, count subquery included).

    Cross-engine determinism: squared L2 distances come from the
    same sequential fold both engines use for the cosine family
    (zip_with + ordered aggregate == list_sum of list_transform);
    the ratio d2sq/d1sq divides identical bits, and ln — ulp-loose
    cross-engine — is snapped to the 1e-6 grid AS AN INTEGER of
    micro-log-units, so the sum is an exact bigint
    (merge-order-proof). ln mu = ln(d2sq/d1sq)/2, so
    id_mle = 2e6·n_valid / sum_ln_ratio_micro — an exact-int
    division. Duplicate vectors (d1 = 0) are excluded from n_valid
    in both engines.

    Scale shape: the knn_bruteforce exact-baseline class — sampled
    queries broadcast against the distributed corpus, per-query rank
    window for the two smallest. At 100 TB swap the corpus side for
    the IVF-probed candidate set (ann_ivf_cosine) exactly as
    emb_radius_search_ivf does for radius search; the estimator only
    needs d1/d2, which IVF with enough probes preserves."""
    e = ensure_parallelism(embeddings)
    if sample_hex_lt is None:
        # count-star over the parquet scan (metadata-cheap, O(1)
        # driver transfer — the IVF seed-collect class of action)
        sample_hex_lt = two_nn_anchor_threshold(
            embeddings.count(), max_anchors)
    qn = e.where(
        F.md5(F.concat(F.lit("twonn:"),
                       F.col("vec_id").cast("string")))
        < F.lit(sample_hex_lt)) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_embedding"))
    dsq = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("q_embedding"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)
    scored = (
        e.crossJoin(F.broadcast(qn))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", dsq.alias("_dsq"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_dsq").asc(), F.col("vec_id").asc())
    top2 = scored.withColumn("_rn", F.row_number().over(w)) \
        .where(F.col("_rn") <= 2)
    per = top2.groupBy("query_id").agg(
        F.min(F.when(F.col("_rn") == 1, F.col("_dsq"))).alias("_d1"),
        F.min(F.when(F.col("_rn") == 2, F.col("_dsq"))).alias("_d2"))
    lnr = F.round(F.log(F.col("_d2") / F.col("_d1")) * 1e6) \
        .cast("bigint")
    valid = per.where((F.col("_d1") > 0) & F.col("_d2").isNotNull()) \
        .select(lnr.alias("_lnr"))
    nq = per.agg(F.count(F.lit(1)).cast("bigint").alias("n_queries"))
    out = (
        valid.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_valid"),
            F.sum("_lnr").cast("bigint").alias("sum_ln_ratio_micro"))
        .crossJoin(F.broadcast(nq))
        .select(
            "n_queries", "n_valid", "sum_ln_ratio_micro",
            F.when(
                F.col("sum_ln_ratio_micro") > 0,
                (F.col("n_valid") * F.lit(2000000)).cast("double")
                / F.col("sum_ln_ratio_micro").cast("double"))
            .alias("id_mle"),
        )
    )
    return out
