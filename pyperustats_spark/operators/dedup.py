"""Deduplication operators over the ``documents`` / ``embeddings``
tables: exact, normalized-exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine.

Reference analog: SHA-256 content dedup of documentation files
(``/root/reference/perustats/inei/organizer.py:199-248``) — generalized
here to the near-dup family a pretraining pipeline needs.

Scale design
------------
* Exact dedup: hash → groupBy min(id) → semi-join. One shuffle on the
  16-byte hash, never on the text.
* MinHash: signatures are computed **per-row with array higher-order
  functions** (zero shuffle), LSH banding groups by (band, band-slice
  hash) — candidate pairs only form inside buckets. Oversized buckets
  are capped (`max_bucket`) as a skew guard, so a degenerate key can't
  produce an O(n²) explosion on a 100 TB corpus.
* SimHash: 63-bit fingerprint per row, banded into 4×16-bit keys for
  candidate generation (hamming ≤ k pairs must share ≥1 band).
* Embedding cosine: same bucket-then-verify shape using LSH hyperplanes.
  The brute-force variant exists as the oracle-checkable baseline and
  deliberately self-joins on a blocking key prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyperustats_spark.functions.hashing import (
    hamming64,
    minhash_signature_from_hashes,
    simhash64,
    xx_hash31,
)
from pyperustats_spark.functions.layout import ensure_parallelism
from pyperustats_spark.operators.layout import histogram_rank
from pyperustats_spark.functions.text import char_ngrams, let, normalize, tokens, word_ngrams
from pyperustats_spark.functions.vectors import dot, norm


def dedup_exact(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Exact dedup on raw text: keep the lowest doc_id per identical
    text. Returns survivors (doc_id, text_hash). ``sort=False`` when
    composing — the presentation sort is wasted by any downstream
    shuffle."""
    hashed = documents.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
    keep = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
    out = keep.select("doc_id", "text_hash")
    return out.orderBy("doc_id") if sort else out


def dedup_exact_normalized(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Exact dedup after lowercase/whitespace normalization."""
    hashed = documents.select(
        "doc_id", F.md5(normalize(F.col("text"))).alias("text_hash")
    )
    keep = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
    out = keep.select("doc_id", "text_hash")
    return out.orderBy("doc_id") if sort else out


def _shingle_pair_counts(
    documents: DataFrame, n: int, max_df: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """Shared inverted-index core for the set-overlap dedup family:
    (pairs with |A∩B|, per-doc distinct-shingle sizes).

    ONE shuffle on the shingle, collect_list posting lists capped at
    df ≤ max_df (a stop-shingle list at corpus scale), pairs emitted by
    two chained explodes (codegen Generate beats an interpreted nested
    transform+slice by ~3×) — never a shingle self-join."""
    sh = ensure_parallelism(documents).select(
        "doc_id", F.explode(F.array_distinct(char_ngrams(F.col("text"), n))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    postings = (
        sh.groupBy("sh")
        .agg(F.collect_list("doc_id").alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= max_df))
        .select(F.array_sort("docs").alias("docs"))
    )
    pairs = (
        postings.select(F.explode("docs").alias("id_a"), F.col("docs"))
        .select("id_a", F.explode("docs").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return pairs, sizes


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.15,
    sort: bool = True,
) -> DataFrame:
    """Char-n-gram Jaccard similarity pairs ≥ threshold.

    Exact set-Jaccard via explode → pair counting: |A∩B| from co-occurring
    distinct shingles, |A∪B| = |A|+|B|−|A∩B|. The shingle join is the
    classic inverted-index self-join — shuffle keys are shingles, and
    hot shingles are capped by document frequency (df ≤ max_df) exactly
    like a stop-shingle list at corpus scale."""
    pairs, sizes = _shingle_pair_counts(documents, n, max_df=200)
    out = (
        pairs.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.orderBy("id_a", "id_b") if sort else out


def ngram_containment_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5,
    sort: bool = True,
) -> DataFrame:
    """ASYMMETRIC set containment pairs: C(A→B) = |A∩B| / |A|.

    Jaccard misses subset duplication — a paragraph quoted inside a
    10× longer page scores |A∩B|/|A∪B| ≈ 0.1 but C(small→big) ≈ 1.0.
    Containment is the standard contract for excerpt/quote detection
    and containment-style decontamination (a benchmark document fully
    inside a training page). Emits pairs where EITHER direction ≥
    *threshold*, with both direction fractions (``cont_a`` = how much
    of A is inside B, ``cont_b`` vice versa) so callers can tell
    subset-dup (one high, one low) from near-dup (both high).

    Same one-shuffle inverted-index core as :func:`ngram_jaccard_pairs`
    (shared :func:`_shingle_pair_counts`). Fractions ship as RAW int/int
    doubles — IEEE division of identical ints is bit-identical
    cross-engine (CLAUDE.md oracle rule)."""
    pairs, sizes = _shingle_pair_counts(documents, n, max_df=200)
    out = (
        pairs.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / F.col("sz_a")).alias("cont_a"),
            (F.col("inter") / F.col("sz_b")).alias("cont_b"),
        )
        .where((F.col("cont_a") >= threshold) | (F.col("cont_b") >= threshold))
    )
    return out.orderBy("id_a", "id_b") if sort else out


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 16,
    threshold: float = 0.4,
    max_bucket: int = 50,
    sort: bool = True,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs with estimated Jaccard.

    Stage 1 (zero shuffle): per-row shingle set → 32-perm MinHash
    signature via array transforms.
    Stage 2 (ONE shuffle on (band, band-hash)): split the signature into
    ``bands`` row-bands and gather each LSH bucket with collect_list;
    singleton buckets are skipped and oversized ones dropped
    (``max_bucket`` skew guard — a degenerate key can't go O(n²)).
    Stage 3 (narrow): emit intra-bucket pairs from the gathered array
    and score signature-estimated Jaccard in the same expression, filter
    ≥ threshold, then dedup pairs found by multiple bands.

    Signatures ride the explode through the bucket shuffle (bands ×
    32 ints per doc) — the price of computing them exactly once with no
    self-join, no persist, and no second scan of the corpus."""
    rows_per_band = num_perm // bands
    # word-2-gram shingles: char n-grams of natural-language text share
    # the global-minimum hashes across nearly all documents (stop-shingle
    # effect) and bias MinHash estimates high; word shingles discriminate
    sig_expr = minhash_signature_from_hashes(
        F.transform(
            F.array_distinct(word_ngrams(F.col("text"), 2)),
            lambda s: xx_hash31(s),
        ),
        k=num_perm,
    )

    # ``let``-bind the signature: the banding projection references it
    # 30+ times (output column + every band's element_at), and Catalyst's
    # CollapseProject would otherwise inline — i.e. RECOMPUTE — the full
    # 32-permutation MinHash per reference (~30× per row)
    def _band_structs(s):
        # band key = xxhash64 of the signature slice: one JVM hash call
        # per band instead of per-element element_at + concat_ws + md5
        # (an expression tree ~10× smaller — faster codegen compile AND
        # execution; allowed here because bucketing only needs equal
        # slices to collide, and this path has no SQL oracle)
        return F.array(
            *[
                F.struct(
                    s.alias("sig"),
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.slice(s, b * rows_per_band + 1, rows_per_band)
                    ).alias("bh"),
                )
                for b in range(bands)
            ]
        )

    banded = ensure_parallelism(documents).select(
        "doc_id", F.explode(let(sig_expr, _band_structs)).alias("bk")
    ).select(
        "doc_id",
        F.col("bk.sig").alias("sig"),
        F.col("bk.band").alias("band"),
        F.col("bk.bh").alias("bh"),
    )
    # ONE shuffle: gather each LSH bucket with collect_list, skip
    # singleton buckets, cap oversized ones (skew guard), and emit the
    # intra-bucket pairs from the array — no self-join, so signatures
    # are computed exactly once and never re-scanned
    bucketed = (
        banded.groupBy("band", "bh")
        .agg(F.collect_list(F.struct("doc_id", "sig")).alias("m"))
        .where((F.size("m") >= 2) & (F.size("m") <= max_bucket))
        .select(F.array_sort("m").alias("m"))
    )
    est = lambda sa, sb: F.size(  # noqa: E731 — estimated Jaccard from signature agreement
        F.filter(F.zip_with(sa, sb, lambda x, y: (x == y).cast("int")), lambda v: v == 1)
    ) / F.lit(float(num_perm))
    pairs_arr = F.flatten(
        F.transform(
            F.col("m"),
            lambda x, i: F.transform(
                F.slice(F.col("m"), i + F.lit(2), F.size(F.col("m"))),
                lambda y: F.struct(
                    x["doc_id"].alias("id_a"),
                    y["doc_id"].alias("id_b"),
                    est(x["sig"], y["sig"]).alias("est_jaccard"),
                ),
            ),
        )
    )
    out = (
        bucketed.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.est_jaccard")
        .where(F.col("est_jaccard") >= threshold)  # filter before the dedup shuffle
        .dropDuplicates(["id_a", "id_b"])
    )
    return out.orderBy("id_a", "id_b") if sort else out


def simhash_fingerprints(documents: DataFrame) -> DataFrame:
    """63-bit SimHash per document (token-level)."""
    return ensure_parallelism(documents).select(
        "doc_id", simhash64(tokens(F.col("text"))).alias("simhash")
    ).orderBy("doc_id")


def simhash_pairs(documents: DataFrame, max_hamming: int = 8,
                  sort: bool = True) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ max_hamming.

    Candidate generation by 16-bit band keys (pigeonhole: distance ≤ 3
    guarantees a shared band of 4; larger distances are best-effort, as
    in production SimHash dedup). Verification via bit_count(xor).

    Same one-shuffle collect_list shape as MinHash LSH: buckets gather
    on (band, key), pairs and hamming distances come out of the array —
    fingerprints are computed once, no self-join, no persist."""
    max_bucket = 200

    # let-bound: 5 references (output + 4 band keys) to the 63-bit vote
    # expression would otherwise be 5 full recomputes per row
    def _band_structs(h):
        return F.array(
            *[
                F.struct(
                    h.alias("simhash"),
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(h, 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
                )
                for b in range(4)
            ]
        )

    banded = ensure_parallelism(documents).select(
        "doc_id",
        F.explode(let(simhash64(tokens(F.col("text"))), _band_structs)).alias("bk"),
    ).select(
        "doc_id",
        F.col("bk.simhash").alias("simhash"),
        F.col("bk.band").alias("band"),
        F.col("bk.bh").alias("bh"),
    )
    bucketed = (
        banded.groupBy("band", "bh")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("m"))
        .where((F.size("m") >= 2) & (F.size("m") <= max_bucket))
        .select(F.array_sort("m").alias("m"))
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("m"),
            lambda x, i: F.transform(
                F.slice(F.col("m"), i + F.lit(2), F.size(F.col("m"))),
                lambda y: F.struct(
                    x["doc_id"].alias("id_a"),
                    y["doc_id"].alias("id_b"),
                    hamming64(x["simhash"], y["simhash"]).alias("hamming"),
                ),
            ),
        )
    )
    out = (
        bucketed.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return out.orderBy("id_a", "id_b") if sort else out


def embedding_cosine_pairs(
    embeddings: DataFrame, threshold: float = 0.95, block: int = 8
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold — the EXACT all-pairs
    baseline (the production-scale candidate generator is
    :func:`~pyperustats_spark.operators.similarity.ann_lsh`).

    Blocked self-join: every vector gets a block ``g = vec_id mod
    block``; the left side replicates to block-pair keys (g, j≥g), the
    right side to (i≤g, g), and the join is an EQUI-join on the
    (i, j) key — so the O(n²) pair work hash-partitions across
    block·(block+1)/2 tasks instead of a single
    BroadcastNestedLoopJoin. Each unordered pair surfaces exactly once:
    cross-block keys pair disjoint row sets, the diagonal filters
    a.vec_id < b.vec_id. Replication factor ≈ (block+2)/2 on each side
    — the inherent price of distributing an exact quadratic operator.

    Each vector's norm is computed ONCE before the join and carried as
    a column (8 bytes/row), so per-pair work is a single O(dim) dot —
    the naive per-pair ``cosine(a, b)`` re-derived both norms inside
    the quadratic loop (measured 3× slower at 20k vectors). The
    arithmetic is unchanged (same dot, same norm values, same
    try_divide), so results — and the DuckDB oracle — are
    bit-identical."""
    # coalesce makes _nrm NON-NULLABLE (never taken: the fold only
    # yields null for a null embedding, whose pairs are filtered by
    # the cos threshold either way) so the `cos >= threshold`
    # constraint cannot infer IsNotNull(_nrm) and push the whole norm
    # fold into a Filter under the scan — that substitution evaluated
    # the O(dim) fold TWICE per row (r11 plan audit; the ivf_cell
    # class)
    e = ensure_parallelism(embeddings).select(
        "vec_id", "embedding",
        F.coalesce(norm(F.col("embedding")), F.lit(0.0)).alias("_nrm"))
    e = e.withColumn("_g", F.pmod(F.col("vec_id"), F.lit(block)).cast("int"))
    left = e.withColumn(
        "_j", F.explode(F.sequence(F.col("_g"), F.lit(block - 1))))
    right = e.withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.col("_g"))))
    pairs = left.alias("a").join(
        right.alias("b"),
        (F.col("a._g") == F.col("b._i"))
        & (F.col("a._j") == F.col("b._g"))
        & ((F.col("a._g") < F.col("b._g"))
           | (F.col("a.vec_id") < F.col("b.vec_id"))),
    ).select(
        F.least(F.col("a.vec_id"), F.col("b.vec_id")).alias("id_a"),
        F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("id_b"),
        F.try_divide(
            dot(F.col("a.embedding"), F.col("b.embedding")),
            F.col("a._nrm") * F.col("b._nrm"),
        ).alias("cos"),
    )
    return pairs.where(F.col("cos") >= threshold).orderBy("id_a", "id_b")


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 10,
                         sort: bool = True) -> DataFrame:
    """Connected components over near-dup pairs: every node gets the
    MINIMUM id reachable from it (its cluster id) — the step that turns
    pairwise matches into dedup clusters with one canonical doc each.

    Each round combines ONE hop of min-label propagation (every node
    adopts the smallest label among itself and its neighbors) with ONE
    pointer-doubling jump (label ← label-of-label), so the reachable-min
    horizon roughly doubles per round: rounds ≈ log2(diameter), and
    ``max_iter=10`` covers diameter ≈ 1000 — the long boilerplate chains
    templated web text produces. Converged when no label changes
    (one count per round); if the loop exhausts WITHOUT converging the
    function raises rather than silently returning split clusters.

    Every round's label table has its lineage truncated: iterative
    self-joins double the logical plan per round, so without truncation
    the plan tree grows 2^rounds and the DRIVER dies compiling it long
    before any executor breaks a sweat. When the SparkContext has a
    checkpoint directory configured (a real cluster run), rounds use
    reliable ``DataFrame.checkpoint`` — blocks live in the fault-
    tolerant checkpoint store, so an executor loss mid-iteration
    recomputes nothing and kills nothing. Without one (local runs,
    tests) it falls back to executor-resident ``localCheckpoint``.
    Superseded rounds are explicitly unpersisted, so at most two label
    tables hold storage at any time; ``prop`` is persisted within the
    round so the propagation join+agg subtree feeds BOTH pointer-
    doubling branches without computing twice. Only edges and
    (node, label) pairs shuffle, never documents. Deterministic."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    sc = pairs.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _truncate(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable \
            else df.localCheckpoint(eager=True)

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = _truncate(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        ).persist()  # consumed twice below — materialize once
        # pointer doubling: follow the label's own label. Every label is
        # itself a node id, so the self-join always matches; the left
        # join + coalesce is belt-and-braces for a label outside the
        # node set.
        parent = prop.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = _truncate(
            prop.join(parent, prop.label == parent.p_node, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        prop.unpersist()
        labels.unpersist()  # superseded round: release its blocks now
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            f"rounds (last round changed {changed} labels). The pair graph "
            f"is deeper than 2^{max_iter}; raise max_iter."
        )
    out = labels.select(F.col("node").alias("doc_id"),
                        F.col("label").alias("cluster_id"))
    return out.orderBy("doc_id") if sort else out


def dedup_clusters(documents: DataFrame, n: int = 3,
                   threshold: float = 0.15, sort: bool = True) -> DataFrame:
    """End-to-end fuzzy dedup: n-gram Jaccard pairs → connected
    components → per-doc cluster id + canonical flag (cluster minimum
    survives — the multi-document generalization of the reference's
    first-file-wins content dedup, organizer.py:222-231). All interior
    stages run sort-free; only this tail sorts (and only when asked)."""
    pairs = ngram_jaccard_pairs(documents, n=n, threshold=threshold,
                                sort=False)
    cc = connected_components(pairs, sort=False)
    out = cc.withColumn(
        "is_canonical", (F.col("doc_id") == F.col("cluster_id")))
    return out.orderBy("doc_id") if sort else out


def dedup_filter(documents: DataFrame, n: int = 3,
                 threshold: float = 0.15, sort: bool = True) -> DataFrame:
    """APPLY fuzzy dedup: return the corpus with non-canonical near-dup
    cluster members dropped (each cluster's minimum doc_id survives) —
    the step that turns :func:`dedup_clusters`' diagnosis into the
    cleaned training corpus.

    The anti-join carries only 8-byte doc_ids on the loser side and is
    left to AQE to plan: at web scale near-dup losers run 30–50% of the
    corpus (billions of ids), so a forced broadcast would OOM the
    driver — a shuffled anti-join on doc_id is cheap, and AQE still
    broadcasts automatically whenever the loser set is genuinely small.
    Text/vectors never ride the loser side of the shuffle."""
    clusters = dedup_clusters(documents, n=n, threshold=threshold,
                              sort=False)
    losers = clusters.where(~F.col("is_canonical")).select("doc_id")
    out = documents.join(losers, "doc_id", "left_anti")
    return out.orderBy("doc_id") if sort else out


def dedup_filter_simhash(documents: DataFrame, max_hamming: int = 8,
                         sort: bool = True) -> DataFrame:
    """APPLY SimHash dedup: corpus minus non-canonical members of
    hamming-≤k clusters (pairs → pointer-doubling CC → AQE-decided
    anti-join on 8-byte doc_ids). Completes the apply family: exact
    (:func:`dedup_exact`), n-gram Jaccard (:func:`dedup_filter`),
    MinHash (:func:`dedup_filter_minhash`), SimHash (this) — one
    candidate generator per precision/cost point, one shared
    cluster+apply shape."""
    pairs = simhash_pairs(documents, max_hamming=max_hamming, sort=False)
    cc = connected_components(pairs, sort=False)
    losers = cc.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    out = documents.join(losers, "doc_id", "left_anti")
    return out.orderBy("doc_id") if sort else out


def dedup_clusters_minhash(documents: DataFrame, threshold: float = 0.5,
                           sort: bool = True, **lsh_kwargs) -> DataFrame:
    """:func:`dedup_clusters` with MinHash+LSH candidate pairs instead
    of exact n-gram Jaccard — the 100 TB path: exact Jaccard scores
    every candidate against full shingle sets, while the signature
    estimate costs O(num_perm) per pair and the banded shuffle carries
    only signatures. Same downstream shape: pairs → pointer-doubling
    connected components → canonical per cluster. Rows-only (the
    estimate is probabilistic; pytest bounds it against exact Jaccard).
    *threshold* applies to the SIGNATURE-estimated Jaccard."""
    pairs = minhash_lsh_pairs(documents, threshold=threshold, sort=False,
                              **lsh_kwargs)
    cc = connected_components(pairs, sort=False)
    out = cc.withColumn(
        "is_canonical", (F.col("doc_id") == F.col("cluster_id")))
    return out.orderBy("doc_id") if sort else out


def dedup_filter_minhash(documents: DataFrame, threshold: float = 0.5,
                         sort: bool = True, **lsh_kwargs) -> DataFrame:
    """APPLY MinHash dedup: corpus minus non-canonical near-dup cluster
    members, clusters found via LSH signatures (see
    :func:`dedup_clusters_minhash`). Anti-join on 8-byte doc_ids,
    AQE-decided — identical scale posture to :func:`dedup_filter`."""
    clusters = dedup_clusters_minhash(documents, threshold=threshold,
                                      sort=False, **lsh_kwargs)
    losers = clusters.where(~F.col("is_canonical")).select("doc_id")
    out = documents.join(losers, "doc_id", "left_anti")
    return out.orderBy("doc_id") if sort else out


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    kmeans_iters: int = 0,
    max_cell: int = 500,
    sort: bool = True,
) -> DataFrame:
    """SemDeDup-style near-dup candidate pairs over an embedding corpus:
    IVF-cell bucketing → exact cosine INSIDE the cell.

    The semantic counterpart of :func:`minhash_lsh_pairs`: instead of
    text shingles, candidates come from sharing a k-means (IVF) cell —
    the published SemDeDup recipe (cluster the corpus, prune within
    clusters). Exactly the repo's one-shuffle gather shape: each cell
    is collected with ``collect_list`` (vectors ride the shuffle ONCE,
    with their norms hoisted alongside), pairs and exact cosines come
    out of the gathered array, no self-join. Recall is bounded by the
    cell partition (cross-cell near-dups are missed — rows-only, the
    pytest property bounds it against :func:`embedding_cosine_pairs`);
    every emitted pair's score is EXACT, so precision is 1.

    Scale: size *n_centroids* ≈ corpus / target cell size so cells stay
    under *max_cell* (oversized cells are DROPPED — the same skew guard
    as the LSH buckets, so one degenerate mega-cluster can't go O(n²));
    the shuffle carries each vector exactly once, keyed by an int cell
    id. At 100 TB the cell id becomes a write-once partition column."""
    from pyperustats_spark.operators.similarity import (
        ivf_assign, kmeans_refine_centroids, seed_centroids)

    cents = seed_centroids(embeddings, n_centroids)
    if kmeans_iters > 0:
        cents = kmeans_refine_centroids(embeddings, cents,
                                        iterations=kmeans_iters)
    e = ensure_parallelism(embeddings).select(
        "vec_id",
        "embedding",
        norm(F.col("embedding")).alias("_nrm"),
        F.element_at(
            ivf_assign(F.col("embedding"), cents, nprobe=1), 1).alias("cell"),
    )
    celled = (
        e.groupBy("cell")
        .agg(F.collect_list(
            F.struct("vec_id", "embedding", "_nrm")).alias("m"))
        .where((F.size("m") >= 2) & (F.size("m") <= max_cell))
        .select(F.array_sort(F.col("m")).alias("m"))
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("m"),
            lambda x, i: F.transform(
                F.slice(F.col("m"), i + F.lit(2), F.size(F.col("m"))),
                lambda y: F.struct(
                    x["vec_id"].alias("id_a"),
                    y["vec_id"].alias("id_b"),
                    F.try_divide(
                        dot(x["embedding"], y["embedding"]),
                        x["_nrm"] * y["_nrm"],
                    ).alias("cos"),
                ),
            ),
        )
    )
    out = (
        celled.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.cos")
        .where(F.col("cos") >= threshold)
    )
    return out.orderBy("id_a", "id_b") if sort else out


def dedup_filter_semantic(
    embeddings: DataFrame,
    threshold: float = 0.95,
    sort: bool = True,
    **ivf_kwargs,
) -> DataFrame:
    """APPLY semantic dedup: the embedding corpus minus non-canonical
    members of cosine-≥τ clusters found within IVF cells (pairs →
    pointer-doubling CC → AQE-decided anti-join on 8-byte vec_ids).
    Completes the apply family across modalities: exact / n-gram /
    MinHash / SimHash over text, SemDeDup over embeddings — one shared
    cluster+apply shape."""
    pairs = semantic_dedup_pairs(embeddings, threshold=threshold,
                                 sort=False, **ivf_kwargs)
    cc = connected_components(pairs, sort=False)
    losers = cc.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("vec_id"))
    out = embeddings.join(losers, "vec_id", "left_anti")
    return out.orderBy("vec_id") if sort else out


# ---------------------------------------------------------------------------
# corpus-snapshot management: incremental dedup, source overlap, leakage-
# safe splitting. The reference re-processes public-portal snapshots
# incrementally (done-set anti-joins, inei/utils/db_utils.py progress
# tables; organizer.py content dedup) — these are the corpus-scale
# generalizations a recurring pretraining-data release needs.
# ---------------------------------------------------------------------------


def content_key(prefix_chars: int | None = None) -> Column:
    """md5 of the normalized text — optionally of only its first
    *prefix_chars* characters (a "head fingerprint" that groups
    documents sharing lead boilerplate, the common near-dup shape in
    scraped corpora). Pure row-local expression; md5 so a DuckDB
    oracle reproduces the key bit-for-bit."""
    txt = F.col("text")
    if prefix_chars is not None:
        txt = F.substring(txt, 1, prefix_chars)
    return F.md5(normalize(txt))


def dedup_incremental(batch: DataFrame, corpus: DataFrame,
                      prefix_chars: int | None = None,
                      sort: bool = True) -> DataFrame:
    """Incremental snapshot dedup: the rows of *batch* that are new
    relative to an already-released *corpus* (and unique within the
    batch — lowest doc_id wins a within-batch group).

    The canonical recurring-release shape: yesterday's 100 TB corpus
    never gets re-deduped; only the new crawl joins against it. Both
    sides shuffle ONLY 16-byte keys (never text) into one hash
    anti-join — big-big, so no broadcast; AQE picks the strategy. The
    within-batch keep is a groupBy min on the (much smaller) surviving
    batch."""
    key = content_key(prefix_chars)
    b = batch.select("doc_id", "source", key.alias("fp"))
    seen = corpus.select(key.alias("fp")).distinct()
    fresh = b.join(seen, "fp", "left_anti")
    keep = fresh.groupBy("fp").agg(
        F.min(F.struct("doc_id", "source")).alias("s"))
    out = keep.select(F.col("s.doc_id").alias("doc_id"),
                      F.col("s.source").alias("source"), "fp")
    return out.orderBy("doc_id") if sort else out


def dedup_incremental_bloom(batch: DataFrame, corpus: DataFrame,
                            prefix_chars: int | None = None,
                            m_bits: int = 1 << 16, k: int = 3,
                            sort: bool = True) -> DataFrame:
    """:func:`dedup_incremental` with the released corpus Bloom-pruned
    BEFORE its distinct+anti-join shuffle — same result, row for row.

    The plain form's one real cost at 100 TB is `seen`: the FULL
    released corpus shuffles its 16-byte keys into a distinct. But the
    anti-join only needs corpus keys that collide with a batch key —
    a corpus key matching no batch key can't kill anything. So: build
    a Bloom bitmap from the batch's keys (one agg over the SMALL side,
    O(m/32) driver collect — see :mod:`..functions.bloom`), and
    row-locally prefilter the corpus scan. The distinct then shuffles
    ~|batch|·(1+fp) keys instead of |corpus| keys — the shuffle shrinks
    from corpus-proportional to batch-proportional. No false negatives
    → every key that could suppress a batch row survives; false
    positives only let harmless extra keys through, and the anti-join
    ignores them. Hence the oracle is the PLAIN incremental dedup's SQL.

    bloom_build is an action: the batch side is scanned twice (once
    for the bitmap, once lazily into the join) — by construction the
    batch is the small side, so that is the cheap double-scan."""
    from pyperustats_spark.functions.bloom import bloom_build, bloom_member

    key = content_key(prefix_chars)
    b = batch.select("doc_id", "source", key.alias("fp"))
    bitmap = bloom_build(b.select("fp"), "fp", m_bits=m_bits, k=k)
    seen = (corpus.select(key.alias("fp"))
            .where(bloom_member(F.col("fp"), bitmap, m_bits=m_bits, k=k))
            .distinct())
    fresh = b.join(seen, "fp", "left_anti")
    keep = fresh.groupBy("fp").agg(
        F.min(F.struct("doc_id", "source")).alias("s"))
    out = keep.select(F.col("s.doc_id").alias("doc_id"),
                      F.col("s.source").alias("source"), "fp")
    return out.orderBy("doc_id") if sort else out


def dedup_stats_by_source(documents: DataFrame,
                          prefix_chars: int | None = None,
                          sort: bool = True) -> DataFrame:
    """Duplication data-card per source: docs, distinct content keys
    within the source, docs whose key occurs more than once in the
    WHOLE corpus (cross-source contamination included), and the raw
    duplicated share (IEEE int/int division — bit-identical in any
    engine, see working notes).

    Two key-hash shuffles (global key multiplicity, then the per-source
    rollup), both carrying 16-byte keys + counts only."""
    key = content_key(prefix_chars)
    keyed = documents.select("source", key.alias("fp"))
    mult = keyed.groupBy("fp").agg(F.count(F.lit(1)).alias("_m"))
    out = (
        keyed.join(mult, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fp").alias("n_unique"),
            F.sum((F.col("_m") > 1).cast("bigint")).alias("n_duped"),
        )
        .withColumn("dup_share", F.col("n_duped") / F.col("n_docs"))
    )
    return out.orderBy("source") if sort else out


def source_overlap(documents: DataFrame,
                   prefix_chars: int | None = None,
                   sort: bool = True) -> DataFrame:
    """Pairwise content overlap between sources: for every source pair
    sharing at least one content key, the distinct-key intersection,
    each side's distinct-key count, and the Jaccard overlap (raw
    int/int division).

    Candidate generation follows the repo's bucketed-gather rule: keys
    are grouped once (collect_set of the handful of source names per
    key — bounded by the source count, NOT by corpus size) and pairs
    are emitted in-array; there is no fingerprint self-join, so the
    corpus is scanned once and only (key → source-list) rows shuffle."""
    key = content_key(prefix_chars)
    f = documents.select("source", key.alias("fp")).distinct()
    sizes = f.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    gathered = (
        f.groupBy("fp")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") >= 2)
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + F.lit(2), F.size(F.col("ss"))),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    pairs = (
        gathered.select(F.explode(pairs_arr).alias("p"))
        .groupBy(F.col("p.source_a").alias("source_a"),
                 F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        pairs
        .join(sizes.select(F.col("source").alias("source_a"),
                           F.col("n").alias("n_a")), "source_a")
        .join(sizes.select(F.col("source").alias("source_b"),
                           F.col("n").alias("n_b")), "source_b")
        .select(
            "source_a", "source_b", "n_common", "n_a", "n_b",
            (F.col("n_common")
             / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
             ).alias("jaccard"),
        )
    )
    return out.orderBy("source_a", "source_b") if sort else out


def split_leakage_safe(documents: DataFrame, val_pct: int = 10,
                       prefix_chars: int | None = None,
                       salt: str = "split",
                       sort: bool = True) -> DataFrame:
    """Train/val split at content-group granularity: every member of a
    content-key group inherits the split of the group representative
    (min doc_id), so near-identical documents can never straddle the
    split and leak val text into train.

    Same salted-md5 hash cut as :func:`relational.train_val_split` —
    but keyed on the representative id, which costs exactly one shuffle
    (the window over the content key). New crawl data lands in stable
    splits: a group's representative never changes once its lowest id
    is in the corpus."""
    key = content_key(prefix_chars)
    rep = F.min("doc_id").over(Window.partitionBy("_fp"))
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                      F.col("rep_id").cast("string"))), 1, 4),
        16, 10).cast("int") % 100
    out = (
        documents.select("doc_id", "lang", key.alias("_fp"))
        .select("doc_id", "lang", rep.alias("rep_id"))
        .withColumn("split", F.when(bucket < val_pct,
                                    F.lit("val")).otherwise(F.lit("train")))
    )
    return out.orderBy("doc_id") if sort else out


def source_overlap_sketch(documents: DataFrame, k: int = 256,
                          prefix_chars: int | None = None,
                          salt_buckets: int = 64,
                          sort: bool = True) -> DataFrame:
    """Estimated pairwise source overlap from per-source bottom-k
    (KMV) sketches — the 100 TB companion to :func:`source_overlap`:
    instead of shuffling every distinct content key, each source is
    reduced to its k smallest 8-byte xxhash64 values and the Jaccard
    is estimated as |bottomk(A∪B) ∩ A_k ∩ B_k| / |bottomk(A∪B)|
    (standard error ≈ 1/√k).

    Shape: (1) per-(source, salt) partial bottom-k — the salt bounds
    each collect_set gather to ~1/salt_buckets of a source's keys, so
    no single task materializes a source's full key set; (2) per-source
    merge of salt_buckets k-arrays (tiny); (3) ONE bounded gather of
    all sketches (#sources × k longs — an audited single-partition
    step, same class as the IVF centroid collect) emitting pair
    estimates in-array. xxhash64, not md5: rows-only path, ~10×
    cheaper (working-notes rule)."""
    txt = F.col("text")
    if prefix_chars is not None:
        txt = F.substring(txt, 1, prefix_chars)
    h = F.xxhash64(normalize(txt))
    keyed = documents.select(
        "source", h.alias("h"),
        F.pmod(h, F.lit(salt_buckets)).alias("_salt"))
    partial = keyed.groupBy("source", "_salt").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("ks"))
    sketches = partial.groupBy("source").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("ks")))),
            1, k,
        ).alias("sketch"))
    gathered = sketches.agg(
        F.collect_list(F.struct("source", "sketch")).alias("m")
    ).select(F.array_sort("m").alias("m"))

    def _est(xs, ys):
        union_k = F.slice(F.array_sort(F.array_distinct(F.concat(xs, ys))),
                          1, k)
        inter = F.size(F.array_intersect(F.array_intersect(union_k, xs), ys))
        return F.try_divide(inter, F.size(union_k))

    pairs_arr = F.flatten(
        F.transform(
            F.col("m"),
            lambda x, i: F.transform(
                F.slice(F.col("m"), i + F.lit(2), F.size(F.col("m"))),
                lambda y: F.struct(
                    x["source"].alias("source_a"),
                    y["source"].alias("source_b"),
                    _est(x["sketch"], y["sketch"]).alias("est_jaccard"),
                ),
            ),
        )
    )
    out = (
        gathered.select(F.explode(pairs_arr).alias("p"))
        .select("p.source_a", "p.source_b", "p.est_jaccard")
    )
    return out.orderBy("source_a", "source_b") if sort else out


def dedup_impact_report(documents: DataFrame,
                        prefix_chars: int | None = None,
                        sort: bool = True) -> DataFrame:
    """Cleaning-impact data-card for exact dedup per source: documents
    and characters before vs after keep-min-id dedup on the content
    key, and the removed shares (raw int/int quotients) — the
    before/after table a release report prints next to the dup-rate
    card.

    Survivors are decided once (groupBy min over 16-byte keys + ids)
    and joined back as a left_semi on doc_id; both rollups are plain
    partial-aggregated count/sum shuffles."""
    key = content_key(prefix_chars)
    keyed = documents.select("doc_id", "source", "n_chars",
                             key.alias("fp"))
    keep = keyed.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    survivors = keyed.join(keep.select("doc_id"), "doc_id", "left_semi")
    before = keyed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_before"),
        F.sum("n_chars").alias("n_chars_before"))
    after = survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_after"),
        F.sum("n_chars").alias("n_chars_after"))
    out = (
        before.join(after, "source", "left")
        .select(
            "source", "n_docs_before",
            F.coalesce("n_docs_after", F.lit(0)).alias("n_docs_after"),
            "n_chars_before",
            F.coalesce("n_chars_after", F.lit(0)).alias("n_chars_after"),
        )
        .withColumn(
            "docs_removed_share",
            (F.col("n_docs_before") - F.col("n_docs_after"))
            / F.col("n_docs_before"))
    )
    return out.orderBy("source") if sort else out


def minhash_eval_vs_exact(documents: DataFrame, n: int = 3,
                          threshold: float = 0.4,
                          sort: bool = True) -> DataFrame:
    """In-engine quality evaluation of the MinHash+LSH candidate path
    against exact n-gram Jaccard at the same threshold: one row of
    (n_exact, n_candidates, n_hits, recall, precision) — the
    calibration check a pipeline runs on a SAMPLE before trusting LSH
    parameters on the full 100 TB corpus (both sides here are the
    bucketed implementations, so the eval itself scales with the
    sample, not quadratically).

    Raw int/int quotients; rows-only (the MinHash side has no SQL
    oracle by design)."""
    # both pair sets persisted: each is referenced twice (its own count
    # + the hit join) and Catalyst re-runs the ENTIRE bucketed pair
    # pipeline per reference — only (id_a, id_b) rows are cached.
    # Lifetime caveat as perplexity_buckets (bench clears per query).
    exact = ngram_jaccard_pairs(documents, n=n, threshold=threshold,
                                sort=False).select("id_a", "id_b") \
        .persist()
    cand = minhash_lsh_pairs(documents, n=n, threshold=threshold,
                             sort=False).select("id_a", "id_b") \
        .persist()
    hits = exact.join(cand, ["id_a", "id_b"], "left_semi")
    counts = (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .join(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .join(hits.agg(F.count(F.lit(1)).alias("n_hits")))
    )
    return counts.select(
        "n_exact", "n_candidates", "n_hits",
        F.try_divide(F.col("n_hits"), F.col("n_exact")).alias("recall"),
        F.try_divide(F.col("n_hits"), F.col("n_candidates"))
        .alias("precision"),
    )


def simhash_eval_vs_exact(documents: DataFrame, n: int = 3,
                          threshold: float = 0.4,
                          max_hamming: int = 8,
                          sort: bool = True) -> DataFrame:
    """In-engine quality evaluation of the SimHash candidate path
    against exact n-gram Jaccard — the SimHash twin of
    :func:`minhash_eval_vs_exact`, one row of (n_exact, n_candidates,
    n_hits, recall, precision). SimHash and MinHash trade recall for
    candidate volume differently (vote-fold vs signature bands); a
    pipeline runs BOTH evals on a sample before choosing which guards
    a 100 TB dedup pass (both sides here are the bucketed
    implementations, so the eval scales with the sample).

    Raw int/int quotients; rows-only (the SimHash side has no SQL
    oracle by design)."""
    # persisted for the same double-reference reason as
    # minhash_eval_vs_exact (full pair pipeline re-ran per reference)
    exact = ngram_jaccard_pairs(documents, n=n, threshold=threshold,
                                sort=False).select("id_a", "id_b") \
        .persist()
    cand = simhash_pairs(documents, max_hamming=max_hamming,
                         sort=False).select("id_a", "id_b") \
        .persist()
    hits = exact.join(cand, ["id_a", "id_b"], "left_semi")
    counts = (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .join(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .join(hits.agg(F.count(F.lit(1)).alias("n_hits")))
    )
    return counts.select(
        "n_exact", "n_candidates", "n_hits",
        F.try_divide(F.col("n_hits"), F.col("n_exact")).alias("recall"),
        F.try_divide(F.col("n_hits"), F.col("n_candidates"))
        .alias("precision"),
    )


def jaccard_threshold_sweep(documents: DataFrame, n: int = 3,
                            bands: tuple[float, ...] = (0.15, 0.3, 0.5,
                                                        0.7, 0.9),
                            sort: bool = True) -> DataFrame:
    """Threshold calibration curve for fuzzy dedup: how many exact
    n-gram Jaccard pairs fall at-or-above each candidate threshold —
    computed from ONE pass of the bucketed pair generator (the pairs
    are scored once; the sweep is a conditional-count rollup, not one
    pair job per threshold). This is how a pipeline picks τ on a
    sample before committing the full-corpus dedup run.

    Output: (threshold, n_pairs_at_or_above) — monotone non-increasing
    by construction."""
    pairs = ngram_jaccard_pairs(documents, n=n, threshold=min(bands),
                                sort=False)
    aggs = [
        F.sum((F.col("jaccard") >= b).cast("bigint")).alias(f"_b{i}")
        for i, b in enumerate(bands)
    ]
    row = pairs.agg(*aggs)
    stacked = row.selectExpr(
        "stack({}, {}) as (threshold, n_pairs)".format(
            len(bands),
            ", ".join(f"CAST({b} AS DOUBLE), _b{i}"
                      for i, b in enumerate(bands)))
    )
    return stacked.orderBy("threshold") if sort else stacked


def winnowed_fingerprints(documents: DataFrame, n_tokens: int = 20,
                          winnow: int = 5,
                          hash_fn: str = "md5") -> DataFrame:
    """The fingerprinting stage of :func:`exact_substring_pairs`,
    exposed for every consumer of literal-overlap detection: hash
    every *n_tokens*-token gram, winnow-select the minimum per
    *winnow*-gram window (content-defined, so shared runs of
    ≥ n_tokens + winnow − 1 tokens fingerprint identically at any
    alignment), distinct per doc. Returns exploded (doc_id, wh) —
    one row-local projection, zero shuffles. Streaming-safe: the
    parallelism guard needs the batch RDD layout, so streams (whose
    micro-batches inherit the source's file-split parallelism) pass
    through untouched.

    Sliding-min form (r12): the per-window ``array_min(slice(g, j, w))``
    scan evaluated an interpreted slice ALLOCATION + w string compares
    per gram position — O(grams·w) lambda dispatches dominated the 100×
    wall (the whole fingerprint stage, not the pair explosion; measured
    ~15 s of dedup_exact_substring's 20 s). The sparse-table identity
    min(g[j..j+w−1]) = min(m_P[j], m_P[j+w−P]) with m_P the let-bound
    power-of-two prefix mins (m_{2p} = zip_with(m_p, m_p shifted p,
    least)) computes every window in O(log w) whole-array passes —
    same mins, same fingerprints, bit-identical output (interleaved
    A/B at 100×: 15.2 → 10.0 s for the stage)."""
    toks = tokens(F.col("text"))
    if hash_fn == "md5":
        elem_t, _hash = "array<string>", F.md5
    elif hash_fn == "xxhash64":
        elem_t, _hash = "array<bigint>", F.xxhash64
    else:  # fail loud: a typo here would silently change fingerprints
        raise ValueError(f"hash_fn must be md5|xxhash64, got {hash_fn!r}")

    def _drop(a, k):
        # a[k:] (0-based), empty when k >= size — zip_with null-pads
        # the shorter side and least() skips nulls, so the padded tail
        # holds partial mins that the final valid-prefix slice drops
        return F.slice(a, k + 1, F.greatest(F.size(a) - k, F.lit(0)))

    def _mn(a, b):
        return F.zip_with(a, b, lambda x, y: F.least(x, y))

    def _fingerprints(t):
        def _sel(g):
            def step(mp, p):
                # invariant: mp[j] = min(g[j .. j+p-1]) for the valid
                # prefix; each doubling is ONE let-bound array pass
                if p * 2 <= winnow:
                    return let(_mn(mp, _drop(mp, p)),
                               lambda m2p: step(m2p, p * 2))
                win = mp if p == winnow else _mn(mp, _drop(mp, winnow - p))
                return F.when(
                    F.size(g) >= winnow,
                    F.array_distinct(
                        F.slice(win, 1, F.size(g) - (winnow - 1))),
                ).otherwise(F.array().cast(elem_t))

            return step(g, 1)

        grams = F.when(
            F.size(t) >= n_tokens,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n_tokens),
                lambda i: _hash(F.concat_ws(
                    " ", F.slice(t, i + 1, n_tokens)))),
        ).otherwise(F.array().cast(elem_t))
        return let(grams, _sel)

    base = documents if documents.isStreaming \
        else ensure_parallelism(documents)
    return base.select(
        "doc_id", F.explode(let(toks, _fingerprints)).alias("wh"))


def exact_substring_pairs(documents: DataFrame, n_tokens: int = 20,
                          winnow: int = 5, max_df: int = 200,
                          hash_fn: str = "md5",
                          sort: bool = True) -> DataFrame:
    """Exact repeated-substring detection between documents — the
    ExactSubstr dedup family ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022), whose suffix-array
    construction doesn't distribute — re-expressed as WINNOWED gram
    fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
    algorithm): hash every *n_tokens*-token gram, then in each window
    of *winnow* consecutive gram hashes select the minimum. Selection
    is content-defined, so two documents sharing any verbatim run of
    ≥ n_tokens + winnow − 1 tokens select at least one identical
    fingerprint WHEREVER the run sits in either document (every
    gram-hash window fully inside the run is the same in both) —
    the guarantee fixed-stride windows cannot give: strided starts
    inherit the run's phase mod stride, and misaligned phases never
    collide (measured: 1-of-5 planted phases detected pre-winnowing).
    This catches the license-boilerplate / syndicated-article /
    lifted-quotation class that near-dup signatures dilute away on
    long documents; precision is exact (md5 of the verbatim token
    run; collisions cryptographically negligible).

    Output: (id_a, id_b, shared_fingerprints) — distinct selected
    gram hashes the pair shares; expected fingerprint density is
    2/(winnow+1) of gram positions.

    Scale shape — per-row cost is the honest price of exactness:
    O(tokens · n_tokens) hashing + O(tokens · winnow) min-scans, all
    row-local JVM array expressions in ONE projection (the same order
    of work ExactSubstr's suffix array spends, but embarrassingly
    parallel). The shuffle is identical to
    :func:`ngram_jaccard_pairs`'s inverted index: 32-char md5
    fingerprints ride it (never token arrays), posting lists gather
    with collect_list (singletons skipped, df > *max_df* dropped —
    the hot-boilerplate cap that stops an O(n²) bucket at corpus
    scale), pairs emitted by two chained explodes. Per-doc
    fingerprints are distinct-ed so within-doc self-repetition can't
    inflate a pair's count.

    *hash_fn*: ``"md5"`` (default) when a DuckDB oracle must
    reproduce the fingerprints; ``"xxhash64"`` for production (8-byte
    bigints ride the shuffle instead of 32-char hex). Honest A/B at
    100× docs (sf10bd, 2.1M result pairs): 14.5s vs 16.6s — only ~13%
    because that corpus is boilerplate-heavy and the posting-list
    pair explosion dominates, not hashing; the gap widens on clean
    corpora where fingerprinting is the hot loop. The two variants
    select slightly different (equally valid) fingerprint samplings —
    winnowing picks the min BY HASH ORDER, so the guarantee holds for
    any consistent total order but the sampled positions differ."""
    wh = winnowed_fingerprints(documents, n_tokens=n_tokens,
                               winnow=winnow, hash_fn=hash_fn)
    postings = (
        wh.groupBy("wh")
        .agg(F.collect_list("doc_id").alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= max_df))
        .select(F.array_sort("docs").alias("docs"))
    )
    out = (
        postings.select(F.explode("docs").alias("id_a"), F.col("docs"))
        .select("id_a", F.explode("docs").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
    )
    return out.orderBy("id_a", "id_b") if sort else out


def substring_duplication_profile(documents: DataFrame,
                                  n_tokens: int = 20, winnow: int = 5,
                                  hash_fn: str = "md5",
                                  sort: bool = True) -> DataFrame:
    """Per-document literal-duplication profile: of each document's
    winnowed fingerprints, how many also occur in at least one OTHER
    document — the doc-level copy-paste contamination score a
    pretraining filter thresholds on (a doc that is 80% boilerplate/
    syndication survives pairwise dedup whenever no single partner
    crosses the pair threshold, but its shared_frac exposes it).

    Output: (doc_id, n_fingerprints, n_shared, shared_frac) for EVERY
    input doc — short docs fingerprint to nothing and report 0 with a
    NULL fraction (try_divide). shared_frac is an int/int IEEE
    division shipped raw (bit-identical cross-engine; CLAUDE.md).

    Plan: one fingerprint multiplicity groupBy (no df cap needed —
    this counts, it never expands pairs, so a hot boilerplate
    fingerprint costs one counter), one join back on the fingerprint,
    one per-doc rollup, one left join to re-attach zero-fingerprint
    docs. Fingerprints and ids shuffle; text never does."""
    wh = winnowed_fingerprints(documents, n_tokens=n_tokens,
                               winnow=winnow, hash_fn=hash_fn)
    mult = wh.groupBy("wh").agg(F.count(F.lit(1)).alias("_m"))
    per_doc = (
        wh.join(mult, "wh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fingerprints"),
             F.sum((F.col("_m") >= 2).cast("bigint")).alias("n_shared"))
    )
    out = (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_fingerprints", F.lit(0)).alias("n_fingerprints"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.try_divide(F.col("n_shared"), F.col("n_fingerprints"))
            .alias("shared_frac"),
        )
    )
    return out.orderBy("doc_id") if sort else out


def exact_substring_decontaminate(batch: DataFrame, corpus: DataFrame,
                                  n_tokens: int = 20, winnow: int = 5,
                                  min_shared: int = 1,
                                  hash_fn: str = "md5",
                                  sort: bool = True) -> DataFrame:
    """Incremental literal-overlap decontamination: the rows of
    *batch* that share fewer than *min_shared* winnowed fingerprints
    with an already-released *corpus* (or a benchmark eval set — the
    ExactSubstr counterpart of :func:`~pyperustats_spark.operators
    .textops` 13-gram decontamination, catching long verbatim lifts
    that token-level n-gram hits under-weigh). The recurring-release
    shape of :func:`dedup_incremental`: the corpus is never
    re-scanned against itself, only the new batch joins it.

    Plan: both sides fingerprint row-locally
    (:func:`winnowed_fingerprints`); the corpus ships its DISTINCT
    fingerprint set (bounded by content volume, never doc count ×
    df); one semi-join marks batch fingerprint hits, a groupBy counts
    hits per batch doc, and docs at-or-over the threshold anti-join
    OUT of the original batch — text never rides any shuffle, only
    fingerprints and ids. Returns the surviving batch rows
    (doc_id, source)."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    bw = winnowed_fingerprints(batch, n_tokens=n_tokens, winnow=winnow,
                               hash_fn=hash_fn)
    cw = winnowed_fingerprints(corpus, n_tokens=n_tokens, winnow=winnow,
                               hash_fn=hash_fn).select("wh").distinct()
    hits = (
        bw.join(cw, "wh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .where(F.col("n_hits") >= min_shared)
        .select("doc_id")
    )
    out = batch.join(hits, "doc_id", "left_anti").select("doc_id", "source")
    return out.orderBy("doc_id") if sort else out


def substring_novelty_profile(batch: DataFrame, corpus: DataFrame,
                              n_tokens: int = 20, winnow: int = 5,
                              hash_fn: str = "md5",
                              sort: bool = True) -> DataFrame:
    """Per-document NOVELTY card against an already-released corpus:
    of each batch doc's winnowed fingerprints, how many are already in
    the corpus — the graded sibling of the binary
    :func:`exact_substring_decontaminate` cut (curation wants the
    score, not just the verdict: a 0.95-novel doc extends the corpus,
    a 0.05-novel doc is a near-reprint even if no single overlap
    crosses a drop threshold; same motivation as
    :func:`substring_duplication_profile` but CROSS-corpus rather
    than within-corpus). Returns one row per batch doc
    (doc_id, n_fingerprints, n_seen, novelty_frac) — zero-fingerprint
    (short) docs report 0/0 with NULL fraction (try_divide);
    novelty_frac = (n_fingerprints − n_seen)/n_fingerprints ships as
    the raw int/int IEEE division (bit-identical cross-engine).

    Plan: both sides fingerprint row-locally; the corpus ships its
    DISTINCT fingerprint set into one hash join keyed on the 16-byte
    hash (a left join carrying a 1-flag — both counts come from ONE
    pass), then a per-doc rollup and the zero-doc reattach. Text never
    rides a shuffle. At 100 TB read the corpus side from a
    :class:`~pyperustats_spark.sources.ledger.CorpusLedger` (its
    fingerprint table is pre-distinct and bucket-join-free)."""
    bw = winnowed_fingerprints(batch, n_tokens=n_tokens, winnow=winnow,
                               hash_fn=hash_fn)
    cw = (winnowed_fingerprints(corpus, n_tokens=n_tokens,
                                winnow=winnow, hash_fn=hash_fn)
          .select("wh").distinct())
    return _novelty_from_fps(batch, bw, cw, sort)


def _novelty_from_fps(batch: DataFrame, bw: DataFrame, cw: DataFrame,
                      sort: bool) -> DataFrame:
    """Shared novelty tail over (doc_id, wh) batch fingerprints and a
    distinct corpus fingerprint set (raw-scan or ledger-backed)."""
    marked = bw.join(cw.withColumn("_hit", F.lit(1)), "wh", "left")
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint")
        .alias("n_seen"))
    out = (
        batch.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_fingerprints", F.lit(0)).alias("n_fingerprints"),
            F.coalesce("n_seen", F.lit(0)).alias("n_seen"),
            F.try_divide(F.col("n_fingerprints") - F.col("n_seen"),
                         F.col("n_fingerprints")).alias("novelty_frac"),
        )
    )
    return out.orderBy("doc_id") if sort else out


def jaccard_prefix_pairs(documents: DataFrame, n: int = 3,
                         tau_num: int = 9, tau_den: int = 10,
                         sort: bool = True) -> DataFrame:
    """EXACT all-pairs Jaccard join at threshold τ = tau_num/tau_den
    via prefix filtering (AllPairs / PPJoin family, Bayardo et al.
    2007) — the lossless alternative to the df-capped inverted index
    of :func:`ngram_jaccard_pairs` and the probabilistic
    :func:`minhash_lsh_pairs`: every pair with char-n-gram set
    Jaccard ≥ τ is returned, none is missed, no sampling and no
    stop-shingle cap. Returns (id_a, id_b, inter, union_sz, jaccard).

    Why it scales where the plain inverted index can't: each doc's
    grams are globally ordered RAREST-FIRST (document frequency asc,
    gram asc) and only the first p = s − ⌈τ·s⌉ + 1 grams (~(1−τ)·s,
    e.g. 10 % at τ = 0.9) post to the index — the prefix-filter
    theorem guarantees two sets with J ≥ τ share a prefix gram, so
    candidates only form in RARE-gram buckets (a boilerplate gram
    shared by half the corpus never generates pairs unless it is
    among a doc's rarest 10 %). A per-bucket length filter
    (den·min ≥ num·max) prunes before pair emission; exact
    verification then intersects the two gram arrays, which ride
    exactly ONE hash join each.

    Everything rank-determining is integer or lexicographic: prefix
    length and both threshold tests are pure integer arithmetic
    (⌈a/b⌉ as (a+b−1) DIV b), so the pair SET is bit-identical
    cross-engine; jaccard ships as raw int/int division. ``per_doc``
    is referenced three times (prefix posting + both verification
    sides) → repartitioned to default parallelism and persisted
    (CLAUDE.md: Catalyst re-runs common subtrees per reference;
    un-coalesced 200-partition cache stages are tiny-task overhead
    in a plain session)."""
    par = documents.sparkSession.sparkContext.defaultParallelism
    sh = ensure_parallelism(documents).select(
        "doc_id",
        F.explode(F.array_distinct(char_ngrams(F.col("text"), n))).alias("sh"),
    )
    dfc = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    # intern grams to dense int ids in rarest-first (df, gram) order:
    # ascending-id arrays ARE the prefix order, int intersects run ~3x
    # faster than string intersects, and the per-doc shuffle carries
    # ids instead of (bigint, string) structs. The rank is a
    # histogram rank (layout.histogram_rank), NOT a partition-less
    # row_number window: grams hash-shuffle on (df, first char) —
    # (df, c0, sh) sorts identically to (df, sh) because c0 is a
    # prefix of sh — so ranking parallelizes across df levels (and
    # across leading chars within the huge df=1 singleton level) at
    # ANY n; only the distinct-(df, c0) count table (zipf-small ×
    # |charset|) sees a single-task prefix window. Closes the one
    # single-task sort that grew with a parameter (VERDICT r8 item 3).
    gid = histogram_rank(
        dfc, F.struct(F.col("df"), F.substring("sh", 1, 1).alias("c0")),
        [F.col("sh")], out_col="g").select("sh", "g")
    per_doc = (
        sh.join(F.broadcast(gid), "sh")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("g")).alias("grams"),
             F.count(F.lit(1)).alias("sz"))
        .repartition(par, "doc_id")
        .persist()
    )
    p = (F.col("sz")
         - ((F.col("sz") * tau_num + (tau_den - 1)) / tau_den).cast("bigint")
         + 1)
    pre = per_doc.select(
        "doc_id", "sz",
        F.posexplode(F.slice("grams", 1, p.cast("int")))
        .alias("_p0", "g"),
    ).select("doc_id", "sz", (F.col("_p0") + 1).alias("pos"), "g")
    buckets = (
        pre.groupBy("g")
        .agg(F.collect_list(F.struct("doc_id", "sz", "pos")).alias("ds"))
        .where(F.size("ds") >= 2)
        .select("ds")
    )
    # PPJoin positional filter: the shared gram sits at 1-based
    # position pos in each doc's rarest-first order, so the overlap
    # can be at most o_max = 1 + min(sz_a − pos_a, sz_b − pos_b);
    # prune unless that best case still clears τ. A J ≥ τ pair always
    # survives via its FIRST shared prefix gram (the bound is valid
    # there), so the filter is lossless — it cut candidates 2.46M →
    # 1.07M at sf0.1 where the plain length filter alone let the
    # low-diversity gram space (377 grams) go quadratic in buckets.
    o_max = 1 + F.least(F.col("a.sz") - F.col("a.pos"),
                        F.col("b.sz") - F.col("b.pos"))
    cand = (
        buckets.select(F.explode("ds").alias("a"), F.col("ds"))
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(F.lit(tau_den) * F.least("a.sz", "b.sz")
               >= F.lit(tau_num) * F.greatest("a.sz", "b.sz"))
        .where(F.lit(tau_den) * o_max
               >= F.lit(tau_num) * (F.col("a.sz") + F.col("b.sz") - o_max))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # verification: |A∩B| must be evaluated ONCE per candidate — a
    # select+where on the computed column gets the intersect
    # SUBSTITUTED into the predicate (2× evaluation of the hot
    # expression — CLAUDE.md); the let-bound conditional-array explode
    # evaluates it once (GenerateExec is outside codegen, the right
    # trade mid-chain where the intersect dominates)
    hit = let(
        F.size(F.array_intersect("_ga", "_gb")).cast("bigint"),
        lambda i: F.when(
            F.lit(tau_den) * i
            >= F.lit(tau_num) * (F.col("_sa") + F.col("_sb") - i),
            F.array(i)).otherwise(F.array().cast("array<bigint>")),
    )
    # per_doc sides are SF-proportional (one array per document) —
    # explicitly SHUFFLE_HASH so a mis-estimated AQE broadcast can't
    # try to build the whole corpus' gram arrays on the driver
    # (observed OOM at the 100× depth set on an 8 GB heap)
    ver = (
        cand.join(per_doc.select(F.col("doc_id").alias("id_a"),
                                 F.col("grams").alias("_ga"),
                                 F.col("sz").alias("_sa"))
                  .hint("shuffle_hash"), "id_a")
        .join(per_doc.select(F.col("doc_id").alias("id_b"),
                             F.col("grams").alias("_gb"),
                             F.col("sz").alias("_sb"))
              .hint("shuffle_hash"), "id_b")
        .select("id_a", "id_b", "_sa", "_sb",
                F.explode(hit).alias("inter"))
        .select(
            "id_a", "id_b", "inter",
            (F.col("_sa") + F.col("_sb") - F.col("inter"))
            .alias("union_sz"),
            (F.col("inter")
             / (F.col("_sa") + F.col("_sb") - F.col("inter")))
            .alias("jaccard"),
        )
    )
    return ver.orderBy("id_a", "id_b") if sort else ver


def keep_best_per_cluster(documents: DataFrame,
                          sort: bool = True) -> DataFrame:
    """Quality-canonical exact dedup: within each normalized-content
    cluster keep the HIGHEST-quality copy (ties on quality → lowest
    doc_id) — the keep policy production dedup actually wants.
    Min-id/keep-latest (both ported) are arbitrary; near-identical
    copies that differ only in casing/whitespace can still differ in
    punctuation density, and a training corpus should retain the
    cleanest one. Returns kept rows (doc_id, lang, source, n_chars,
    quality_score, n_members).

    Row-local everything except ONE content-key shuffle: the cluster
    key is md5(normalized text) (:func:`content_key`), quality is the
    let-bound composite of
    :func:`~pyperustats_spark.operators.textops.quality_score_col`
    (quarter-grid values — exact doubles, so the (quality desc,
    doc_id) order is total and bit-identical cross-engine). The winner
    is an argmin aggregate — min over struct((-quality, doc_id),
    payload) plus count — NOT a row_number/count window partitioned by
    the cluster key: the aggregate partial-combines map-side (a
    boilerplate mega-cluster reduces to one struct per map task before
    the shuffle), while the window form held each cluster's full row
    set on one task — the GROUP_SIZE_WINDOW straggler class the plan
    sweep now rejects (VERDICT r8). Negated quality keeps the struct
    comparison a single ascending min; doc_id is unique, so payload
    fields after it never decide the order."""
    from pyperustats_spark.operators.textops import quality_score_col

    base = documents.select(
        "doc_id", "lang", "source", "n_chars",
        content_key().alias("_k"),
        quality_score_col(F.col("text")).alias("quality_score"),
    )
    agg = base.groupBy("_k").agg(
        F.min(F.struct(
            (-F.col("quality_score")).alias("nq"),
            F.col("doc_id").alias("doc_id"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
            F.col("quality_score").alias("quality_score"),
        )).alias("_m"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    )
    out = agg.select("_m.doc_id", "_m.lang", "_m.source", "_m.n_chars",
                     "_m.quality_score", "n_members")
    return out.orderBy("doc_id") if sort else out


def paragraph_dedup(documents: DataFrame, delim: str = r"\n\s*\n",
                    joiner: str = "\n\n",
                    sort: bool = True) -> DataFrame:
    """Paragraph-grain exact dedup (Gopher / CCNet clean at BOTH doc
    and paragraph level): split every document into paragraphs on the
    *delim* regex, and keep each distinct paragraph only at its
    corpus-FIRST occurrence — the (doc_id, pos)-minimal one — dropping
    every later repeat (including within-doc repeats). Rewrites the
    corpus: returns one row per input document,
    (doc_id, n_paragraphs, n_dropped, text_clean) where text_clean is
    the kept paragraphs re-joined with *joiner* in original order
    ('' when the doc was empty or everything was a repeat).

    This is the between-docs complement of
    :func:`~pyperustats_spark.operators.textops.boilerplate_apply`
    (which drops segments by document frequency): here the FIRST
    occurrence always survives, so corpus content is preserved exactly
    once — the Gopher paragraph-dedup contract.

    Reference analog: SHA-256 content dedup of files
    (``/root/reference/perustats/inei/organizer.py:199-248``),
    re-grained from whole files to paragraphs.

    Scale shape: paragraphs are trimmed and empties dropped row-local;
    the winner per paragraph is a partial-aggregated groupBy
    ``min(struct(doc_id, pos))`` over the md5 key — only (16-byte
    hash, 16-byte struct) ride that shuffle, never paragraph text, and
    a corpus-wide hot paragraph combines map-side instead of funneling
    its occurrences through one window task. The winner join back is
    unhinted AQE (the winner side is #distinct-paragraphs —
    SF-proportional). The occurrence stream references the scan twice
    (winner branch prunes to hashes only) — the same bounded 2×
    segment-compute trade boilerplate_segments documents, chosen over
    persisting a corpus-scale exploded intermediate. Reassembly is the
    ONE shuffle that carries paragraph text (groupBy doc_id,
    sort_array over (pos, para) structs) — the floor for any rewrite.
    """
    plist = F.filter(
        F.transform(F.split(F.col("text"), delim),
                    lambda p: F.trim(p)),
        lambda p: p != "")
    keyed = documents.select(
        "doc_id", F.posexplode(plist).alias("pos", "para")
    ).withColumn("_pk", F.md5("para"))
    winners = keyed.groupBy("_pk").agg(
        F.min(F.struct("doc_id", "pos")).alias("_w"))
    occ = keyed.join(winners, "_pk").select(
        "doc_id", "pos", "para",
        (F.struct("doc_id", "pos") == F.col("_w")).alias("_keep"))
    agg = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paragraphs"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
        .cast("bigint").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(
                    F.when(F.col("_keep"), F.struct("pos", "para")))),
                lambda s: s["para"]),
            joiner).alias("text_clean"),
    )
    out = (
        documents.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_paragraphs"), F.lit(0))
            .cast("bigint").alias("n_paragraphs"),
            F.coalesce(F.col("n_dropped"), F.lit(0))
            .cast("bigint").alias("n_dropped"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
    return out.orderBy("doc_id") if sort else out


def paragraph_dup_stats(documents: DataFrame, delim: str = r"\n\s*\n",
                        by: str = "source",
                        sort: bool = True) -> DataFrame:
    """Per-*by* paragraph-duplication data card — the reporting twin
    of :func:`paragraph_dedup` (same corpus-first-occurrence winner
    rule): for each source (or lang, …), how many paragraph
    occurrences it contributes and how many of those are REPEATS of
    an earlier (doc_id, pos) occurrence anywhere in the corpus — the
    per-source dup pressure a mixture designer reads before weighting
    sources. Returns (by, n_docs, n_paragraphs, n_dropped,
    drop_share), drop_share = raw int/int (bit-identical
    cross-engine; round-6 would split engines on exact midpoints).

    Unlike the apply twin, NO paragraph text rides any shuffle here:
    occurrences are (md5, doc_id, pos, group) tuples end-to-end, the
    winner is the same partial-aggregated min-struct groupBy, and the
    card is one more partial-aggregated groupBy on the group key."""
    plist = F.filter(
        F.transform(F.split(F.col("text"), delim),
                    lambda p: F.trim(p)),
        lambda p: p != "")
    keyed = documents.select(
        F.col(by).alias("_g"), "doc_id",
        F.posexplode(plist).alias("pos", "para")
    ).select("_g", "doc_id", "pos", F.md5("para").alias("_pk"))
    winners = keyed.groupBy("_pk").agg(
        F.min(F.struct("doc_id", "pos")).alias("_w"))
    occ = keyed.join(winners, "_pk").select(
        "_g", "doc_id",
        (F.struct("doc_id", "pos") == F.col("_w")).alias("_keep"))
    out = occ.groupBy(F.col("_g").alias(by)).agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_paragraphs"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
        .cast("bigint").alias("n_dropped"),
    ).select(
        by, "n_docs", "n_paragraphs", "n_dropped",
        F.try_divide(F.col("n_dropped"), F.col("n_paragraphs"))
        .alias("drop_share"),
    )
    return out.orderBy(by) if sort else out


def paragraph_dedup_incremental(batch: DataFrame, corpus: DataFrame,
                                delim: str = r"\n\s*\n",
                                joiner: str = "\n\n",
                                sort: bool = True) -> DataFrame:
    """Recurring-release form of :func:`paragraph_dedup` (the
    paragraph-grain sibling of ``dedup_incremental``): rewrite each
    NEW-batch document dropping every paragraph that already exists in
    the RELEASED corpus — the corpus always wins, yesterday's 100 TB
    is never rewritten — plus every repeat of a batch-internal
    paragraph after its first (doc_id, pos) occurrence. Returns one
    row per batch document (doc_id, n_paragraphs, n_dropped,
    text_clean).

    Scale shape: the corpus side reduces to DISTINCT md5 keys (16
    bytes/paragraph — its text never moves) for a big-big LEFT ANTI
    semantics implemented as a left join + null test so the kept/
    dropped COUNTS survive; the batch-internal winner is the same
    partial-aggregated min-struct groupBy as paragraph_dedup; the one
    text shuffle is the batch-sized reassembly. Batch paragraphs hit
    corpus keys via an AQE-decided hash join (both sides
    SF-proportional — no hint)."""
    corpus_keys = (
        corpus.select(F.explode(_paragraph_list(delim)).alias("para"))
        .select(F.md5("para").alias("_pk")).distinct()
    )
    return _paragraph_dedup_from_keys(batch, corpus_keys, delim=delim,
                                      joiner=joiner, sort=sort)


def _paragraph_list(delim: str):
    """Split-trim-drop-empties paragraph list expression (the shared
    grain definition of the paragraph family)."""
    return F.filter(
        F.transform(F.split(F.col("text"), delim),
                    lambda p: F.trim(p)),
        lambda p: p != "")


def _paragraph_dedup_from_keys(batch: DataFrame, corpus_keys: DataFrame,
                               delim: str = r"\n\s*\n",
                               joiner: str = "\n\n",
                               sort: bool = True) -> DataFrame:
    """:func:`paragraph_dedup_incremental` body with the corpus
    reduced to its distinct paragraph-md5 frame (column ``_pk``) —
    the seam the ledger-backed variant plugs into
    (:meth:`~pyperustats_spark.sources.ledger.CorpusLedger
    .dedup_paragraphs` passes its bucketed paragraph table here, so
    the corpus side contributes zero text scans and zero exchanges)."""
    plist = _paragraph_list(delim)
    keyed = batch.select(
        "doc_id", F.posexplode(plist).alias("pos", "para")
    ).withColumn("_pk", F.md5("para"))
    corpus_keys = corpus_keys.select("_pk") \
        .withColumn("_in_corpus", F.lit(1))
    winners = keyed.groupBy("_pk").agg(
        F.min(F.struct("doc_id", "pos")).alias("_w"))
    occ = (
        keyed.join(winners, "_pk")
        .join(corpus_keys, "_pk", "left")
        .select(
            "doc_id", "pos", "para",
            (F.col("_in_corpus").isNull()
             & (F.struct("doc_id", "pos") == F.col("_w")))
            .alias("_keep"))
    )
    agg = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paragraphs"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
        .cast("bigint").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(
                    F.when(F.col("_keep"), F.struct("pos", "para")))),
                lambda s: s["para"]),
            joiner).alias("text_clean"),
    )
    out = (
        batch.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_paragraphs"), F.lit(0))
            .cast("bigint").alias("n_paragraphs"),
            F.coalesce(F.col("n_dropped"), F.lit(0))
            .cast("bigint").alias("n_dropped"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
    return out.orderBy("doc_id") if sort else out


def _cdc_chunk_docs(documents: DataFrame, w: int = 8) -> DataFrame:
    """DOC-GRAIN content-defined chunks: (doc_id, source, _ch) where
    ``_ch`` is the per-document array<struct<ck, clen>> — the md5
    boundary scan + chunk hashing as ONE row-local projection, kept
    at document grain so a caller that must reference the chunk
    stream twice (corpus-wide count + per-doc rollup) can persist
    THIS compact frame (one row per doc, hashes only — text is never
    cached) and explode it per reference instead of re-running the
    O(n·w) md5 scan per reference. Measured (optimization r11,
    noop-sink A/B): cdc_chunk_stats 6.0 s → 2.0 s at sf0.1 and
    55.0 s → 16.2 s at the 100× sf10bd depth set vs the lazy
    double-scan form; persisting the EXPLODED grain instead was
    strictly worse at both scales (doc_id/source duplicated per
    chunk row).

    Every position ``i`` whose *w*-byte gram hashes into the marked
    1/16 slice (first md5 nibble ``'0'``) ends a chunk at ``i + w - 1``
    — the Rabin/LBFS content-defined cut rule, so two documents sharing
    a run longer than one expected chunk (~16 chars at w=8) produce
    IDENTICAL interior chunks regardless of where the run starts
    (no fixed-stride phase fragility — same guarantee class as the
    winnowed fingerprints in :func:`winnowed_fingerprints`). Production
    CDC (FastCDC) adds min/max chunk normalization; the pure cut rule
    is kept here so a DuckDB oracle reproduces every boundary exactly.

    Scale shape: the boundary scan and chunk hashing are ONE row-local
    projection (cut array let-bound so CollapseProject can't replay the
    O(n) md5 scan per reference).
    """
    cuts_expr = (
        "array_sort(array_distinct(concat("
        "  array(CAST(0 AS BIGINT)),"
        "  transform("
        "    filter("
        f"      CASE WHEN length(text) >= {w}"
        f"           THEN sequence(1, length(text) - {w - 1})"
        "           ELSE CAST(array() AS ARRAY<INT>) END,"
        f"      i -> substring(md5(substring(text, i, {w})), 1, 1) = '0'),"
        f"    i -> CAST(i + {w - 1} AS BIGINT)),"
        "  array(CAST(length(text) AS BIGINT)))))"
    )

    def _chunks(cuts: Column) -> Column:
        idx = F.when(
            F.size(cuts) >= 2, F.sequence(F.lit(1), F.size(cuts) - 1)
        ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
        return F.transform(
            idx,
            lambda j: F.struct(
                F.md5(
                    F.col("text").substr(
                        (F.element_at(cuts, j) + 1).cast("int"),
                        (F.element_at(cuts, j + 1)
                         - F.element_at(cuts, j)).cast("int"))
                ).alias("ck"),
                (F.element_at(cuts, j + 1)
                 - F.element_at(cuts, j)).alias("clen"),
            ),
        )

    # the boundary scan is n·w md5 work per row on a possibly
    # single-row-group parquet input — spread it first
    return ensure_parallelism(
        documents.where(F.col("text").isNotNull())
        .select("doc_id", "source", "text")
    ).select(
        "doc_id", "source",
        let(F.expr(cuts_expr), _chunks).alias("_ch"),
    )


def _cdc_explode(doc_grain: DataFrame) -> DataFrame:
    """Explode a :func:`_cdc_chunk_docs` frame to chunk occurrences
    (doc_id, source, ck, clen)."""
    return doc_grain.select(
        "doc_id", "source", F.explode("_ch").alias("c")
    ).select("doc_id", "source", F.col("c.ck").alias("ck"),
             F.col("c.clen").alias("clen"))


def _cdc_chunk_rows(documents: DataFrame, w: int = 8) -> DataFrame:
    """Content-defined chunk occurrences: (doc_id, source, ck, clen).

    See :func:`_cdc_chunk_docs` for the cut rule and exactness
    contract; this exploded view is for SINGLE-reference callers
    (dedup_incremental's batch/corpus sides, the ledger) — the
    exploded stream carries only (16-byte chunk hash, length), chunk
    text never rides a shuffle. Callers that reference the chunk
    stream more than once must persist the doc-grain frame instead
    (see cdc_chunk_stats)."""
    return _cdc_explode(_cdc_chunk_docs(documents, w))


def cdc_chunk_stats(documents: DataFrame, w: int = 8,
                    sort: bool = True) -> DataFrame:
    """Per-document content-defined-chunk duplication card:
    (doc_id, n_chunks, n_dup_chunks, dup_char_share) where a chunk is
    duplicated when its hash occurs in ≥ 2 DISTINCT documents — the
    chunk-grain storage-dedup view of corpus redundancy (what a CDC
    store would actually share), complementing paragraph_dedup's
    delimiter-grain and exact_substring_pairs' fingerprint-grain views.
    dup_char_share ships as raw bigint/bigint division (bit-identical
    cross-engine); NULL for docs with no chunks (null/empty text).

    Scale shape: occurrences are (hash, doc_id, length) end-to-end;
    the distinct-doc count per hash partial-aggregates map-side; the
    count join back is unhinted AQE (#distinct-chunks side is
    SF-proportional). The chunk stream is referenced twice (count
    branch + per-doc rollup), so the DOC-GRAIN chunk frame is
    persisted — one compact row per document, hashes only, text never
    cached — and exploded per reference; re-running the O(n·w) md5
    scan per reference instead measured 3× slower at sf0.1 AND at the
    100× depth set (numbers in :func:`_cdc_chunk_docs`). Lifetime:
    the handle lives until clearCache/LRU (the perplexity_buckets
    class — callers that score repeatedly should clear between
    calls; bench.py does per query)."""
    dg = _cdc_chunk_docs(documents, w).persist()
    keyed = _cdc_explode(dg)
    counts = keyed.groupBy("ck").agg(
        F.countDistinct("doc_id").alias("_nd"))
    occ = keyed.join(counts, "ck")
    card = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0))
        .cast("bigint").alias("n_dup_chunks"),
        F.try_divide(
            F.sum(F.when(F.col("_nd") >= 2, F.col("clen")).otherwise(0))
            .cast("bigint"),
            F.sum("clen").cast("bigint")).alias("dup_char_share"),
    )
    out = (
        documents.select("doc_id")
        .join(card, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_chunks"), F.lit(0))
            .cast("bigint").alias("n_chunks"),
            F.coalesce(F.col("n_dup_chunks"), F.lit(0))
            .cast("bigint").alias("n_dup_chunks"),
            F.col("dup_char_share"),
        )
    )
    return out.orderBy("doc_id") if sort else out


def cdc_chunk_profile(documents: DataFrame, by: str = "source",
                      w: int = 8, sort: bool = True) -> DataFrame:
    """Per-*by* CDC redundancy card — the mixture-designer twin of
    :func:`cdc_chunk_stats`: for each source, how many chunk
    occurrences it contributes, how many are corpus-duplicated
    (hash in ≥ 2 distinct docs anywhere), and the share of its BYTES
    a CDC store would dedupe away. (by, n_docs, n_chunks,
    n_dup_chunks, dup_char_share, avg_chunk_len); both ratios raw
    int/int doubles. Doc-grain chunk frame persisted for its two
    references (the cdc_chunk_stats rule — numbers in
    :func:`_cdc_chunk_docs`)."""
    dg = _cdc_chunk_docs(documents, w).persist()
    keyed = _cdc_explode(dg)
    counts = keyed.groupBy("ck").agg(
        F.countDistinct("doc_id").alias("_nd"))
    occ = keyed.join(counts, "ck")
    out = occ.groupBy(F.col(by).alias(by)).agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0))
        .cast("bigint").alias("n_dup_chunks"),
        F.try_divide(
            F.sum(F.when(F.col("_nd") >= 2, F.col("clen")).otherwise(0))
            .cast("bigint"),
            F.sum("clen").cast("bigint")).alias("dup_char_share"),
        F.try_divide(F.sum("clen").cast("bigint"),
                     F.count(F.lit(1)).cast("bigint"))
        .alias("avg_chunk_len"),
    )
    return out.orderBy(by) if sort else out


def tfidf_cosine_pairs(documents: DataFrame, tau: float = 0.5,
                       max_df_frac: float = 0.2, max_gather: int = 256,
                       sort: bool = True) -> DataFrame:
    """Lexical near-dup pairs by EXACT sparse TF-IDF cosine — the
    soft-dedup complement of :func:`ngram_jaccard_pairs` (set overlap)
    and :func:`semantic_dedup_pairs` (dense embeddings): weighted
    bag-of-words similarity, robust to reordering and length deltas.
    Returns (doc_id_a, doc_id_b, n_shared_terms, cosine) for pairs
    with cosine ≥ *tau* over the discriminative vocabulary
    (document frequency ≤ *max_df_frac* × N — idf-weighting AND
    stopword cut in one rule).

    Cross-engine-exact by integer arithmetic end-to-end: idf is
    grid-rounded to integer MICRO-units (the ln 1e-6 recipe), weights
    w = tf · idf_micro are bigint, dot products and norms² accumulate
    in DECIMAL(38,0) (DuckDB HUGEINT), and only the final
    sqrt/divide run in doubles — sqrt and single arithmetic ops are
    correctly rounded IEEE in both engines, so the cosine BITS match
    and the τ cut is deterministic (no merge-order float drift).

    Scale shape: candidate generation is the repo's bucketed gather —
    per-term collect_list of (doc_id, w, norm²) triples, in-array
    ordered pairs, NEVER a self-join. Terms with df > *max_gather*
    are excluded from pair generation only (they still count toward
    norms): a hot term's bucket is quadratic in df, while its idf —
    hence its cosine contribution — is already near zero; the oracle
    applies the identical rule, so parity is exact at every SF. Norms
    ride the gather as one decimal per occurrence, so the pair
    aggregation needs NO join back. The weights frame is persisted:
    norms + the gather would otherwise re-run the tokenize+tf chain
    per reference (Catalyst never dedupes common subplans); lifetime
    caveat as perplexity_buckets — callers timing repeatedly should
    clearCache between calls."""
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    nd = documents.agg(F.count(F.lit(1)).alias("_nd"))
    idf_micro = F.round(
        F.log(F.col("_nd") / F.col("_df")) * F.lit(1000000.0), 0
    ).cast("bigint")
    w = (
        tf.join(dfc, "token")
        .join(F.broadcast(nd))
        .where(F.col("_df") <= F.col("_nd") * F.lit(max_df_frac))
        .select("token", "doc_id", "_df",
                (F.col("tf") * idf_micro).alias("w"))
    ).persist()
    norms = w.groupBy("doc_id").agg(
        F.sum((F.col("w") * F.col("w")).cast("decimal(38,0)"))
        .alias("_n2"))
    wn = w.where(F.col("_df") <= max_gather).join(norms, "doc_id")
    gather = wn.groupBy("token").agg(
        F.collect_list(F.struct("doc_id", "w", "_n2")).alias("lst")
    ).where(F.size("lst") >= 2)

    def _pairs(ps: Column) -> Column:
        return F.flatten(F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.size(ps)),
                lambda y: F.struct(
                    x["doc_id"].alias("a"), y["doc_id"].alias("b"),
                    (x["w"] * y["w"]).alias("prod"),
                    x["_n2"].alias("na"), y["_n2"].alias("nb")))))

    pairs = gather.select(
        F.explode(let(F.sort_array(F.col("lst")), _pairs)).alias("p")
    ).select("p.a", "p.b", "p.prod", "p.na", "p.nb")
    agg = pairs.groupBy("a", "b").agg(
        F.sum(F.col("prod").cast("decimal(38,0)")).alias("_dot"),
        F.count(F.lit(1)).cast("bigint").alias("n_shared_terms"),
        F.min("na").alias("_na"), F.min("nb").alias("_nb"))
    out = agg.select(
        F.col("a").alias("doc_id_a"), F.col("b").alias("doc_id_b"),
        "n_shared_terms",
        (F.col("_dot").cast("double")
         / (F.sqrt(F.col("_na").cast("double"))
            * F.sqrt(F.col("_nb").cast("double")))).alias("cosine"),
    ).where(F.col("cosine") >= tau)
    return out.orderBy("doc_id_a", "doc_id_b") if sort else out


def cdc_dedup_incremental(batch: DataFrame, corpus: DataFrame,
                          w: int = 8, sort: bool = True) -> DataFrame:
    """Recurring-release form of :func:`cdc_chunk_stats` (the
    chunk-grain sibling of ``dedup_incremental``): score each
    NEW-batch document against the RELEASED corpus by content-defined
    chunks — the corpus is never re-chunked into pairs, it reduces to
    its DISTINCT chunk-hash set. Per batch doc: (doc_id, n_chunks,
    n_known_chunks, novel_char_share) where a known chunk already
    exists ANYWHERE in the corpus and novel_char_share is the byte
    share a CDC-grained release would actually add (raw bigint/bigint
    division; NULL when the doc has no chunks). Because the cut rule
    is content-defined, a batch doc embedding a corpus passage at ANY
    offset still hits the corpus keys on the passage's interior
    chunks — the same phase-proof guarantee the winnowed release
    chain relies on.

    Scale shape: corpus side is one projection + DISTINCT on 16-byte
    hashes (its text never rides a shuffle); the membership test is a
    left join + null flag (counts must survive, so not an anti-join);
    both sides SF-proportional → unhinted AQE."""
    corpus_keys = _cdc_chunk_rows(corpus, w).select("ck").distinct()
    return _cdc_novelty_from_keys(batch, corpus_keys, w=w, sort=sort)


def _cdc_novelty_from_keys(batch: DataFrame, corpus_keys: DataFrame,
                           w: int = 8, sort: bool = True) -> DataFrame:
    """Core of :func:`cdc_dedup_incremental` against an
    already-materialized corpus chunk-key set (column ``ck``) — the
    entry point :class:`~pyperustats_spark.sources.ledger.CorpusLedger`
    uses so the release path reads bucketed keys instead of
    re-chunking corpus text."""
    keyed = _cdc_chunk_rows(batch, w)
    occ = keyed.join(
        corpus_keys.withColumn("_known", F.lit(1)), "ck", "left")
    card = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.when(F.col("_known").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_known_chunks"),
        F.try_divide(
            F.sum(F.when(F.col("_known").isNull(), F.col("clen"))
                  .otherwise(0)).cast("bigint"),
            F.sum("clen").cast("bigint")).alias("novel_char_share"),
    )
    out = (
        batch.select("doc_id")
        .join(card, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_chunks"), F.lit(0))
            .cast("bigint").alias("n_chunks"),
            F.coalesce(F.col("n_known_chunks"), F.lit(0))
            .cast("bigint").alias("n_known_chunks"),
            F.col("novel_char_share"),
        )
    )
    return out.orderBy("doc_id") if sort else out
