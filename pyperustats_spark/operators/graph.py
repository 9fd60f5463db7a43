"""Graph analytics over relationship edges derived from the fact
tables: fixed-point PageRank (this module) and, for the dedup-cluster
graph, :func:`pyperustats_spark.operators.dedup.connected_components`.

Reference analog: the reference ranks catalogue entities by simple
observed counts (``/root/reference/perustats/BCRP/metadata.py``
frequency rollups); PageRank is the recursive generalization a
100 TB commerce graph needs — importance flows along weighted edges
instead of stopping at degree-1 counts.

Scale design
------------
* The weighted edge list is built ONCE and persisted for the
  iteration loop: each round references it, and Catalyst does not
  dedupe common subplans (CLAUDE.md: zero ReusedExchange even for
  identical subtrees), so an unpersisted edge subtree would re-run
  its join+groupBy every round.
* Rank tables carry (node, bigint) only; each round is one equi-join
  shuffle on the node id + one groupBy on the destination — the
  standard distributed PageRank step. The loop stays LAZY: unlike
  :func:`connected_components` (whose pointer-doubling references
  the previous label table TWICE, doubling the plan per round —
  hence its per-round checkpoint), each PageRank round references
  the previous ranks exactly once, so the plan grows linearly in
  iters and one deferred job lets AQE plan every stage. The persisted
  edge/node tables are computed once at first materialization and
  served from cache for the remaining references. Measured at sf0.01
  in the driver's plain-session posture: lazy 23.3s vs 30.5s with
  per-round localCheckpoint (materialization at 200 un-coalesced
  shuffle partitions per round is pure tiny-task overhead).
* Determinism is FIXED-POINT: ranks are bigint micro-units and every
  update is integer arithmetic (per-edge ``pr·w DIV w_out``, summed,
  then ``damping_pct·s DIV 100``), so partial-aggregate merge order
  cannot change a single bit and a DuckDB oracle unrolling the same
  K iterations reproduces every value exactly — doubles here would
  hit the nondeterministic-double-sum trap (CLAUDE.md) K times over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RANK_UNIT = 1_000_000  # 1.0 in micro-units


def pagerank_fixed_point(edges: DataFrame, iters: int = 6,
                         damping_pct: int = 85) -> DataFrame:
    """Weighted PageRank over a directed edge list ``(src, dst, w)``
    with bigint weights, in fixed-point micro-units.

    pr₀(v) = 1.0; prᵢ₊₁(v) = (1 − d) + d · Σ_{(u,v)} prᵢ(u)·w(u,v) /
    w_out(u), all in integer micro-units (see module docstring for
    why). Nodes are the union of sources and destinations; a node
    with no in-edges settles at the base rank, and dangling nodes
    (no out-edges) simply leak their mass — acceptable for ranking
    (relative order is what's consumed) and exactly reproducible by
    the oracle. Returns (node, rank_micro).

    The edge/node caches outlive the returned lazy frame (they can't
    be unpersisted before the caller's action); they're
    MEMORY_AND_DISK and LRU-evicted, so repeated calls in one session
    cost storage churn, not correctness.

    Raises on non-positive *iters* or a damping outside (0, 100)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    base = RANK_UNIT * (100 - damping_pct) // 100

    out_w = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    # persisted: referenced once PER ROUND, and Catalyst would re-run
    # the join+agg subtree per reference (see module docstring)
    e = (edges.join(out_w, "src")
         .select("src", "dst", "w", "w_out")
         .persist())
    # likewise: the no-in-edge left join references nodes every round.
    # Derived from the CACHED e, not the raw edges: the inner join on
    # src preserves every edge row (every src has an out-weight by
    # construction), so the node set is identical — and the raw edge
    # subtree is referenced 2x instead of 4x (optimization r11: the
    # supplier callers re-ran their lineitem⋈orders build per
    # reference; plan parquet scans 6 -> 2 per base table).
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .persist())
    ranks = nodes.select(
        "node", F.lit(RANK_UNIT).cast("bigint").alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select("dst",
                    F.expr("pr * w DIV w_out").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left") \
            .select(
                "node",
                (F.lit(base)
                 + F.expr(f"{damping_pct} * coalesce(s, 0L) DIV 100"))
                .cast("bigint").alias("pr"))
    return ranks.withColumnRenamed("pr", "rank_micro")


def salsa_fixed_point(edges: DataFrame, iters: int = 4) -> DataFrame:
    """SALSA (Lempel & Moran 2000) over a weighted bipartite edge
    list ``(hub, auth, w)``, in bigint micro-units — the
    hub/authority factorization HITS computes, but with DEGREE
    normalization instead of HITS' per-round global max:
    a(s) ← Σ_{c→s} h(c)·w ÷ w_out(c), h(c) ← Σ_{c→s} a(s)·w ÷ w_in(s).

    The normalization choice is the distributed-determinism point:
    HITS' max-normalization needs a global scalar computed FROM the
    frame being normalized mid-round — either a second reference to
    the aggregate (Catalyst re-executes unpersisted common subtrees,
    and the double reference compounds 2^rounds) or a per-round
    materialization. SALSA's divisors are STATIC degree sums
    (computed once, like PageRank's w_out), so every round is one
    linear pass, the loop stays lazy, and the column-stochastic
    updates keep total mass ≈ constant — no overflow, no global
    scalar, bit-exact against the unrolled-SQL oracle via integer
    DIV. Returns (node, side('hub'|'auth'), score_micro) for both
    partitions after *iters* full rounds."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    w_out = edges.groupBy("hub").agg(F.sum("w").alias("w_out"))
    w_in = edges.groupBy("auth").agg(F.sum("w").alias("w_in"))
    e = (edges.join(w_out, "hub").join(w_in, "auth")
         .select("hub", "auth", "w", "w_out", "w_in")
         .persist())
    h = (e.select(F.col("hub").alias("node")).distinct()
         .select("node", F.lit(RANK_UNIT).cast("bigint").alias("score")))
    a = None
    for _ in range(iters):
        a = (e.join(h, e.hub == F.col("node"))
             .select("auth", F.expr("score * w DIV w_out").alias("c"))
             .groupBy("auth")
             .agg(F.sum("c").cast("bigint").alias("score"))
             .withColumnRenamed("auth", "node"))
        h = (e.join(a, e.auth == F.col("node"))
             .select("hub", F.expr("score * w DIV w_in").alias("c"))
             .groupBy("hub")
             .agg(F.sum("c").cast("bigint").alias("score"))
             .withColumnRenamed("hub", "node"))
    return (
        h.select("node", F.lit("hub").alias("side"),
                 F.col("score").alias("score_micro"))
        .union(a.select("node", F.lit("auth").alias("side"),
                        F.col("score").alias("score_micro")))
    )


def markov_stationary_fixed_point(edges: DataFrame,
                                  iters: int = 6) -> DataFrame:
    """Stationary distribution of a first-order Markov chain by power
    iteration over a weighted edge list ``(src, dst, w)`` (bigint
    weights): πᵢ₊₁(j) = Σ_src πᵢ(src)·w(src,j) DIV w_out(src), in
    integer micro-units — PageRank's loop without the teleport term
    (same fixed-point determinism rationale, module docstring).

    π₀ = 1.0 per state. Mass is conserved up to DIV truncation (≤ 1
    micro leaked per (state, round)) when every state has out-edges;
    an absorbing state (no out-edges) accumulates and leaks mass
    exactly as the unrolled-SQL oracle reproduces. Returns
    (node, pi_micro, share) where share = pi_micro over the summed
    mass — an int/int double, bit-identical cross-engine. Each round
    is one equi-join + one groupBy on the state key; the edge/node
    tables are persisted (referenced every round)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    out_w = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    e = (edges.join(out_w, "src")
         .select("src", "dst", "w", "w_out")
         .persist())
    # nodes deliberately from the RAW edges, not the cached e (A/B'd
    # r11, the opposite of pagerank/ppr): this kernel's graphs are
    # TYPE-bounded (|states|² edges), so the re-executed edge build is
    # two cheap windows — while deriving nodes from the unmaterialized
    # InMemoryRelation hides its size statistics and the six per-round
    # joins flip broadcast -> sort-merge (8.7 s -> 13.1 s at the 100x
    # depth set). pagerank/ppr keep nodes-from-e: their node sets are
    # SF-proportional and never broadcast-planned anyway.
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct()
             .persist())
    pi = nodes.select(
        "node", F.lit(RANK_UNIT).cast("bigint").alias("pi"))
    for _ in range(iters):
        contrib = (
            e.join(pi, e.src == pi.node)
            .select("dst", F.expr("pi * w DIV w_out").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pi = nodes.join(contrib, nodes.node == contrib.dst, "left") \
            .select("node",
                    F.coalesce(F.col("s"), F.lit(0)).cast("bigint")
                    .alias("pi"))
    total = Window.partitionBy()
    return pi.select(
        "node",
        F.col("pi").alias("pi_micro"),
        # |states|-row frame: the partition-less window is audited tiny
        (F.col("pi") / F.sum("pi").over(total)).alias("share"),
    )


def supplier_authority(lineitem: DataFrame, orders: DataFrame,
                       supplier: DataFrame, iters: int = 4,
                       k: int = 50) -> DataFrame:
    """Supplier authority via SALSA on the customer→supplier
    interaction graph: a supplier scores high when bought by
    customers who concentrate on high-authority suppliers — the
    bipartite mutual-reinforcement :func:`supplier_importance`'s
    random-surfer model approximates through packed node ids, here
    computed natively on the two-sided graph. Returns top-*k*
    (s_name, authority_micro). No ``sort=False`` path: the ordering
    is load-bearing (it defines the top-k cut), not presentation."""
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(F.col("o_custkey").alias("hub"),
                F.col("l_suppkey").alias("auth"), "w")
        # persisted: the SALSA kernel references its input three times
        # (w_out, w_in, e build) and Catalyst re-runs the
        # lineitem⋈orders aggregate per reference
        .persist()
    )
    scores = salsa_fixed_point(edges, iters=iters)
    out = (
        scores.where(F.col("side") == "auth")
        .select(F.col("node").alias("s_suppkey"),
                F.col("score_micro").alias("authority_micro"))
        .join(supplier.select("s_suppkey", "s_name"), "s_suppkey")
        .select("s_name", "authority_micro")
        .orderBy(F.desc("authority_micro"), "s_name")
        .limit(k)
    )
    return out


def supplier_importance(lineitem: DataFrame, orders: DataFrame,
                        supplier: DataFrame, iters: int = 6,
                        k: int = 50) -> DataFrame:
    """Supplier importance by recursive customer flows: PageRank on
    the bipartite customer↔supplier interaction graph (edge weight =
    number of lineitem interactions, both directions), reported for
    the supplier side. A supplier ranks high when its customers are
    themselves important — i.e. buy from many important suppliers —
    which plain order counts (the reference's frequency rollups)
    cannot express. Returns top-*k* (s_name, rank_micro). No
    ``sort=False`` path: the ordering is load-bearing (it defines
    the top-k cut), not presentation.

    Node ids pack both partitions into one bigint space (customer →
    2·key, supplier → 2·key+1) so the generic kernel needs no type
    column. Edge build is one lineitem⋈orders equi-join aggregated to
    (custkey, suppkey, n) — interaction counts, integer-exact in both
    engines."""
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .select((F.col("o_custkey") * 2).alias("c_node"),
                (F.col("l_suppkey") * 2 + 1).alias("s_node"), "w")
    )
    # persisted: the union references pairs twice and the kernel's
    # e/out_w build references the union twice more — unpersisted, the
    # lineitem⋈orders aggregate executed 4x (plan: 6 lineitem + 6
    # orders parquet scans -> 1 each). Aggregated narrow rows;
    # lifetime caveat as perplexity_buckets (bench clears per query).
    pairs = pairs.persist()
    edges = pairs.select(F.col("c_node").alias("src"),
                         F.col("s_node").alias("dst"), "w") \
        .union(pairs.select(F.col("s_node").alias("src"),
                            F.col("c_node").alias("dst"), "w"))
    ranks = pagerank_fixed_point(edges, iters=iters)
    out = (
        ranks.where(F.col("node") % 2 == 1)
        .select(((F.col("node") - 1) / 2).cast("bigint").alias("s_suppkey"),
                "rank_micro")
        .join(supplier.select("s_suppkey", "s_name"), "s_suppkey")
        .select("s_name", "rank_micro")
        .orderBy(F.desc("rank_micro"), "s_name")
        .limit(k)
    )
    return out


def copurchase_edges(lineitem: DataFrame, max_basket: int = 50,
                     min_support: int = 1) -> DataFrame:
    """Undirected part co-purchase edge list (a < b, distinct): two
    parts are linked when they appear together in ≥ *min_support*
    orders. The basket gather idiom of
    :func:`~pyperustats_spark.operators.relational.part_affinity`:
    ONE shuffle builds the per-order part sets — collect_set
    deduplicates map-side in the partial aggregate, so the separate
    distinct-then-gather form's extra exchange of the item stream is
    gone (optimization r11 A/B at sf0.1: 1.8-3.8 s → 1.3-1.7 s,
    identical edge set) — then singleton skip + *max_basket* cap (a
    degenerate mega-order cannot go O(n²)), pairs from chained
    explodes — never a lineitem self-join. Shared edge builder for
    the graph kernels (triangles, k-core)."""
    baskets = (
        lineitem.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .where((F.size("parts") >= 2) & (F.size("parts") <= max_basket))
        .select(F.array_sort("parts").alias("parts"))
    )
    return (
        baskets.select(F.explode("parts").alias("a"), F.col("parts"))
        .select("a", F.explode("parts").alias("b"))
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_support)
        .select("a", "b")
    )


def copurchase_triangle_stats(lineitem: DataFrame, max_basket: int = 50,
                              min_support: int = 1) -> DataFrame:
    """Global triangle census of the part co-purchase graph: nodes =
    parts, an undirected edge joins two parts ordered together in at
    least *min_support* orders. Returns ONE row (n_nodes, n_edges,
    n_wedges, n_triangles, global_clustering) — the transitivity
    profile of the catalogue (how cliquish "bought together" is),
    the graph-analytics face of the reference's frequency rollups
    (perustats/BCRP/metadata.py) one recursion deeper than
    :func:`supplier_importance`.

    Scale shape — the degree-ordered node-iterator (Schank & Wagner):
    * Edge build reuses the basket idiom of
      :func:`~pyperustats_spark.operators.relational.part_affinity`:
      distinct (order, part) is the only wide payload, baskets gather
      once with singleton skip + *max_basket* cap (a degenerate
      mega-order cannot go O(n²)), pairs emit from chained explodes —
      never a lineitem self-join.
    * Every edge is then ORIENTED from its lower-(degree, id) endpoint
      to the higher one. The oriented out-degree is O(√m) regardless
      of how skewed the raw degrees are, so the wedge join below is
      O(m^{3/2}) total — the bound that keeps a hub part (in every
      basket) from exploding the plan at 100 TB. An unoriented
      wedge join would be Σ deg² — quadratic in the hub's degree.
    * Wedges come from the collect_list gather + in-array pair idiom
      (CLAUDE.md: bucketed candidate generation is never a self-join):
      out-neighbour lists gather per apex in ONE shuffle, ordered
      (v, w) pairs emit from chained explodes, and the closing edge is
      an equi join against the oriented edge set on (v, w). Each
      triangle has exactly one lowest-ranked apex and one orientation
      of its closing edge, so it is counted exactly once, no dedup.
    * ``edges`` and ``oriented`` are persisted: each is referenced
      2–3 times and Catalyst re-runs common subtrees per reference
      (CLAUDE.md rule) — unpersisted, the basket build would execute
      five times. Both are REPARTITIONED to the session's default
      parallelism before caching: a plain session leaves every
      downstream stage at spark.sql.shuffle.partitions (200) — and
      the union doubling inside the degree count at 400 — which is
      pure tiny-task overhead off a cached frame (measured 54s → 21s
      at sf0.01 in driver posture); on a real cluster
      defaultParallelism scales with executors, so the cap costs
      nothing at 100 TB. ``oriented`` hash-partitions on ``u``, the
      key of BOTH its consumers (the adjacency groupBy reuses the
      partitioning shuffle-free; the closing join re-shuffles on
      (u, v) regardless).

    All outputs are integer-exact (counts) except global_clustering =
    3·triangles / wedges, an int/int IEEE division shipped raw
    (bit-identical cross-engine). n_wedges = Σ deg·(deg−1)/2 over raw
    degrees. Empty edge set → one row of zeros with NULL clustering
    (try_divide)."""
    par = lineitem.sparkSession.sparkContext.defaultParallelism
    edges = (
        copurchase_edges(lineitem, max_basket=max_basket,
                         min_support=min_support)
        .repartition(par, "a", "b")
        .persist()
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    )
    # a < b always holds, so the equal-degree tiebreak (lower id
    # first) is just "keep (a, b)" — same CASE in the oracle
    oriented = (
        edges.join(deg.select(F.col("node").alias("a"),
                              F.col("d").alias("_da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("d").alias("_db")), "b")
        .select(
            F.when(F.col("_da") <= F.col("_db"), F.col("a"))
            .otherwise(F.col("b")).alias("u"),
            F.when(F.col("_da") <= F.col("_db"), F.col("b"))
            .otherwise(F.col("a")).alias("v"),
        )
        .repartition(par, "u")
        .persist()
    )
    adj = (
        oriented.groupBy("u")
        .agg(F.collect_list("v").alias("vs"))
        .where(F.size("vs") >= 2)
        .select("vs")
    )
    # each unordered out-neighbour pair emits ONCE, id-sorted (x < y):
    # the closing edge then matches against the id-normalized ``edges``
    # set (a < b by construction) instead of the degree-oriented one —
    # same triangle multiset, HALF the wedge rows through the closing
    # exchange (optimization r11; an ordered x != y stream shuffled 2×
    # the bytes for the same matches)
    wedges = (
        adj.select(F.explode("vs").alias("x"), F.col("vs"))
        .select("x", F.explode("vs").alias("y"))
        .where(F.col("x") < F.col("y"))
        .select(F.col("x").alias("u"), F.col("y").alias("v"))
    )
    # the closing join is explicitly SHUFFLE_HASH: the probe side is a
    # GenerateExec (explode) whose row estimate is its CHILD's, so the
    # planner can pick a broadcast of the 100×-larger wedge stream and
    # die building it (observed at sf0.01 on a 1 GB plain driver); both
    # sides are SF-proportional, so never broadcast either at scale
    n_tri = (
        wedges.join(
            edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .hint("shuffle_hash"), ["u", "v"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    summary = (
        deg.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.coalesce(
                (F.sum(F.col("d") * (F.col("d") - 1)) / 2)
                .cast("bigint"),
                F.lit(0).cast("bigint")).alias("n_wedges"),
        )
        .crossJoin(edges.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges")))
        .crossJoin(n_tri)
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles",
            F.try_divide(F.lit(3) * F.col("n_triangles"),
                         F.col("n_wedges")).alias("global_clustering"),
        )
    )
    return summary


def kcore_peel(edges: DataFrame, k: int | None = None,
               rounds: int = 8) -> DataFrame:
    """R-round k-core peeling of an undirected edge list (a < b,
    distinct): repeatedly drop every node with degree < k; the
    fixpoint is the k-core — the densest robust backbone of the graph
    (for the co-purchase graph: parts whose "bought together"
    relationships survive even after fringe parts are removed).
    Returns (node, core_deg, converged) for nodes with ≥ 1 surviving
    edge; ``converged`` = 1 iff the edge set was stable by round R,
    i.e. the output IS the exact k-core rather than an R-round
    truncation — R-round semantics keep the operator oracle-exact at
    ANY R (the oracle unrolls the same R rounds), with convergence
    reported instead of assumed.

    *k* defaults to ⌊⅔·⌈2m/n⌉⌋ — two thirds of the (ceiled) average
    degree, computed from the input (two O(1)-row driver actions), so
    the threshold adapts to the graph's own density at any SF instead
    of hard-coding a magic number. The ⅔ matters: near-regular random
    graphs COLLAPSE under peeling at k ≈ avg (measured: k = avg
    peels both test co-purchase graphs to empty; k = ⅔·avg retains
    197/200 and 1925/2000 nodes, converged), because each removal
    cascade only needs to shave a near-uniform degree a little before
    everything falls below the bar.

    Iteration discipline (the connected_components pattern): each
    round references the previous edge set THREE times (degree count
    + both endpoint filters), so the plan would grow 3^rounds —
    every round's edge table has its lineage truncated (reliable
    checkpoint when a checkpoint dir is configured, localCheckpoint
    otherwise) and superseded tables are unpersisted.

    Peeling filters by the DEAD set (degree < k, anti-join), not the
    alive set (optimization r11): the alive set is SF-proportional
    every round (a semi-join against it is two full shuffles of the
    edge set), while the peel front shrinks round over round — AQE
    turns the anti-join into a broadcast as soon as the dead set is
    small, and the edge set then never re-shuffles (guide §2.4/§3.1);
    when an early round peels massively the anti-join degrades to the
    same sort-merge the semi-join form always paid, so shuffle bytes
    are never worse. Convergence is the dead set counting ZERO —
    checked BEFORE the rebuild, so the stable round costs one tiny
    aggregate instead of a full checkpoint+count (the semi-join form
    rebuilt an identical edge table just to observe m unchanged).
    Dead-empty ⟺ m stable: every dead node carries ≥ 1 edge by
    construction, so a non-empty dead set strictly shrinks m.
    Local A/B at sf0.1 is a wash (~7 s both, broadcast build ≈ saved
    shuffle at 1M edges); the rewrite is for the 100-TB shape. Only
    (a, b) pairs ever shuffle."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    sc = edges.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _truncate(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable \
            else df.localCheckpoint(eager=True)

    e = _truncate(edges.select("a", "b"))
    m = e.count()
    if m == 0:
        return e.select(
            F.col("a").alias("node"),
            F.lit(0).cast("bigint").alias("core_deg"),
            F.lit(1).alias("converged"))
    if k is None:
        n0 = (e.select(F.col("a").alias("x"))
              .union(e.select(F.col("b").alias("x")))
              .distinct().count())
        k = 2 * ((2 * m + n0 - 1) // n0) // 3
    converged = False
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .union(e.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
        )
        dead = deg.where(F.col("d") < k).select("node").persist()
        if dead.count() == 0:
            dead.unpersist()
            converged = True
            break
        e_next = _truncate(
            e.join(dead.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(dead.withColumnRenamed("node", "b"), "b", "left_anti"))
        dead.unpersist()
        e.unpersist()
        e = e_next
    out = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
        .select("node", "core_deg",
                F.lit(1 if converged else 0).alias("converged"))
    )
    return out.orderBy("node")


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over an undirected edge list ``(a, b)`` (a < b,
    distinct): every node starts labeled with its own id, and each
    round adopts the most frequent label among its neighbours, ties
    broken by the SMALLEST label — the deterministic variant (classic
    LPA breaks ties randomly; random ties are irreproducible across
    engines AND runs, so the fixed tiebreak is the distributed-
    determinism choice, same reasoning as the fixed-point kernels in
    this module). Runs exactly *iters* synchronous rounds (synchronous
    LPA can 2-cycle on bipartite structure, so a fixed round count is
    the well-defined contract; label ids are integers throughout — no
    doubles anywhere). Returns (node, community, community_size).

    Reference analog: the reference groups catalogue entities by
    explicit keys (``perustats/inei/organizer.py`` module/year
    grouping); LPA is the structural generalization — groups emerge
    from the co-occurrence graph itself.

    Iteration discipline (CLAUDE.md): each round references the
    previous label table ONCE (join onto the static neighbour table),
    so the plan grows linearly and the loop stays LAZY for AQE, like
    pagerank (23.3s lazy vs 30.5s checkpointed at sf0.01) — NOT like
    connected_components' pointer doubling. The neighbour table is
    static and referenced every round, hence persisted. Per round:
    one equi-join shuffle on the neighbour id + two partial-aggregated
    groupBys ((node, lbl) count, then argmin by (-count, lbl) as a
    min-struct) — only (node, lbl, count) integers ride any shuffle.
    community_size comes from groupBy(lbl).count() joined back onto
    the final label table — NOT a count().over(partitionBy(lbl))
    window: LPA is exactly the algorithm that produces epidemic
    mega-communities, and a window partitioned by an unbounded-
    cardinality label makes the dominant community ONE straggler task
    holding all its rows at 100× (VERDICT r8 watch item; the plan
    sweep now rejects the window form class-wide). The groupBy is
    partial-aggregated map-side and the count table is tiny
    (|communities| rows), so AQE broadcasts the join back. The final
    label table is persisted because it is referenced twice (counts
    branch + join branch) and Catalyst would otherwise re-run the
    whole iterative chain per reference (CLAUDE.md)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # both directions via ONE explode, not a union of two selects: the
    # union's branches each re-run the (unpersisted) edge-building
    # subtree during nbr's materialization — explode scans it once
    nbr = (
        edges.select(F.explode(F.array(
            F.struct(F.col("a").alias("node"), F.col("b").alias("nb")),
            F.struct(F.col("b").alias("node"), F.col("a").alias("nb")),
        )).alias("_e"))
        .select("_e.node", "_e.nb")
        .persist()
    )
    labels = nbr.select("node").distinct().select(
        "node", F.col("node").alias("lbl"))
    for _ in range(iters):
        prev = labels.select(F.col("node").alias("_pn"), "lbl")
        cnt = (
            nbr.join(prev, nbr["nb"] == F.col("_pn"))
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                F.col("lbl").alias("l"))).alias("m"))
            .select("node", F.col("m.l").alias("lbl"))
        )
    labels = labels.persist()
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size"))
    return labels.join(sizes, "lbl").select(
        "node", F.col("lbl").alias("community"), "community_size")


def modularity_score(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity Q of a node partition over an undirected edge
    list ``(a, b)`` (a < b, distinct) — the quality score that makes
    :func:`label_propagation` auditable (did the rounds find real
    structure, or dissolve into one blob?):

        Q = Σ_c [ e_c/m − (d_c / 2m)² ]

    (e_c = within-community edges, d_c = total degree of community c,
    m = edges). Computed EXACTLY in integers: Q = q_num / q_den with
    q_num = 4·m·Σe_c − Σd_c² and q_den = 4m², both bigint; the shipped
    ``modularity`` double is the raw int/int quotient (bit-identical
    cross-engine, CLAUDE.md ratio rule). Returns ONE row
    (n_edges, n_communities, q_num, q_den, modularity).

    Plan: labels is referenced three times (two endpoint joins + the
    degree join) and edges three times (m, degrees, within-edges) —
    both persisted, per the module's static-table discipline, so the
    upstream chains (LPA's iterative rounds!) run once. Everything
    that shuffles is (node/community, bigint) pairs; the final
    combine is two 1-row aggregates cross-joined (audited
    q_market_share class). Empty edge set → NULL modularity
    (try_divide)."""
    e = edges.persist()
    lab = labels.select("node", "community").persist()
    within = (
        e.join(lab.select(F.col("node").alias("a"),
                          F.col("community").alias("_ca")), "a")
        .join(lab.select(F.col("node").alias("b"),
                         F.col("community").alias("_cb")), "b")
        .where(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    )
    per_c = (
        deg.join(lab, "node")
        .groupBy("community").agg(F.sum("d").alias("d_c"))
        .join(within, "community", "left")
        .select("community",
                F.coalesce(F.col("e_c"), F.lit(0)).alias("e_c"), "d_c")
    )
    agg = per_c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.sum("e_c").cast("bigint").alias("_se"),
        F.sum(F.col("d_c") * F.col("d_c")).cast("bigint").alias("_sd2"),
    )
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        agg.crossJoin(m)
        .select(
            "n_edges", "n_communities",
            (4 * F.col("n_edges") * F.col("_se") - F.col("_sd2"))
            .cast("bigint").alias("q_num"),
            (4 * F.col("n_edges") * F.col("n_edges"))
            .cast("bigint").alias("q_den"),
        )
        .select(
            "n_edges", "n_communities", "q_num", "q_den",
            F.try_divide(F.col("q_num"), F.col("q_den"))
            .alias("modularity"),
        )
    )


def ppr_fixed_point(edges: DataFrame, seeds: DataFrame,
                    iters: int = 6,
                    damping_pct: int = 85) -> DataFrame:
    """Personalized PageRank (teleport to a SEED SET instead of
    everywhere) over a weighted directed edge list ``(src, dst, w)``,
    in bigint micro-units — the recommendation kernel: scores measure
    proximity to the seeds through weighted flows, so "suppliers
    relevant to THIS customer segment" instead of global importance.

    π₀(v) = 1.0 for seeds else 0; πᵢ₊₁(v) = seed_base(v) +
    d · Σ πᵢ(u)·w/w_out(u), with seed_base = (1−d) only on seeds —
    the same fixed-point integer arithmetic as
    :func:`pagerank_fixed_point` (module docstring: doubles would hit
    the nondeterministic-sum trap K times), same lazy linear-growth
    loop (previous ranks referenced ONCE per round), same persisted
    static tables — here edges, nodes AND the seed-base column
    (referenced every round). *seeds* is a DataFrame with a ``node``
    column; unknown seed ids simply get no mass. Returns
    (node, rank_micro)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    base = RANK_UNIT * (100 - damping_pct) // 100

    out_w = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    e = (edges.join(out_w, "src")
         .select("src", "dst", "w", "w_out")
         .persist())
    sd = seeds.select("node").distinct().withColumn(
        "_seed", F.lit(1))
    # nodes from the CACHED e (row-preserving join — every src has an
    # out-weight), so the caller's edge build runs 2x, not 4x
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(sd, "node", "left")
        .select("node",
                F.when(F.col("_seed").isNotNull(), F.lit(base))
                .otherwise(F.lit(0)).cast("bigint").alias("_bv"))
        .persist()
    )
    ranks = nodes.select(
        "node",
        F.when(F.col("_bv") > 0, F.lit(RANK_UNIT))
        .otherwise(F.lit(0)).cast("bigint").alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select("dst", F.expr("pr * w DIV w_out").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left") \
            .select(
                "node",
                (F.col("_bv")
                 + F.expr(f"{damping_pct} * coalesce(s, 0L) DIV 100"))
                .cast("bigint").alias("pr"))
    return ranks.withColumnRenamed("pr", "rank_micro")


def supplier_ppr(lineitem: DataFrame, orders: DataFrame,
                 supplier: DataFrame, seed_nationkey: int = 0,
                 iters: int = 6, k: int = 50) -> DataFrame:
    """Suppliers relevant to ONE nation's supplier ecosystem:
    personalized PageRank seeded on nation *seed_nationkey*'s
    suppliers over the bipartite customer↔supplier interaction graph
    (same packed-node build as :func:`supplier_importance`) — the
    recommendation view ("which suppliers does this segment's demand
    flow reach?") that global PageRank cannot give. Returns top-*k*
    (s_name, rank_micro); zero-score nodes (unreachable from the
    seeds within *iters* hops) naturally sort last. No ``sort=False``
    path: the ordering is load-bearing (it defines the top-k cut),
    not presentation."""
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .select((F.col("o_custkey") * 2).alias("c_node"),
                (F.col("l_suppkey") * 2 + 1).alias("s_node"), "w")
    )
    # persisted: same rationale as supplier_importance (4x edge-build
    # re-execution otherwise)
    pairs = pairs.persist()
    edges = pairs.select(F.col("c_node").alias("src"),
                         F.col("s_node").alias("dst"), "w") \
        .union(pairs.select(F.col("s_node").alias("src"),
                            F.col("c_node").alias("dst"), "w"))
    seeds = (supplier.where(F.col("s_nationkey") == seed_nationkey)
             .select((F.col("s_suppkey") * 2 + 1).alias("node")))
    ranks = ppr_fixed_point(edges, seeds, iters=iters)
    out = (
        ranks.where(F.col("node") % 2 == 1)
        .select(((F.col("node") - 1) / 2).cast("bigint")
                .alias("s_suppkey"), "rank_micro")
        .join(supplier.select("s_suppkey", "s_name"), "s_suppkey")
        .select("s_name", "rank_micro")
        .orderBy(F.desc("rank_micro"), "s_name")
        .limit(k)
    )
    return out


def degree_distribution(edges: DataFrame, sort: bool = True) -> DataFrame:
    """Degree distribution of an undirected edge list (a < b,
    distinct): (degree, n_nodes, share) — the first diagnostic read on
    any graph (hub-dominated vs near-regular decides salting and
    max-bucket guards downstream; the graph-side sibling of
    ev_activity_powerlaw's per-key fit). Two partial-aggregated
    integer shuffles; share is a raw int/int quotient. The node count
    for the share is an ordered-window-free 1-row aggregate (integer
    sums are merge-order-safe)."""
    deg = (
        edges.select(F.explode(F.array(
            F.struct(F.col("a").alias("node")),
            F.struct(F.col("b").alias("node")),
        )).alias("_e"))
        .select("_e.node")
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    total = hist.agg(F.sum("n_nodes").cast("bigint").alias("_n"))
    out = (
        hist.crossJoin(F.broadcast(total))
        .select(F.col("degree").cast("bigint").alias("degree"),
                "n_nodes",
                F.try_divide(F.col("n_nodes"), F.col("_n"))
                .alias("share"))
    )
    return out.orderBy("degree") if sort else out


def adamic_adar_topk(edges: DataFrame, k: int = 100,
                     max_deg: int = 64) -> DataFrame:
    """Link prediction over an undirected edge list ``(a, b)`` (a < b,
    distinct): score every NON-adjacent pair that shares at least one
    neighbour by the classic triad-closure indices (Liben-Nowell &
    Kleinberg 2003) and return the top *k* — "parts that are not yet
    bought together but plausibly will be", the predictive face of
    :func:`copurchase_triangle_stats`' descriptive census. One row per
    predicted pair: (part_a, part_b, common_neighbors, ra_micro,
    aa_micro) — common-neighbour count, Resource Allocation Σ 1/deg(z)
    and Adamic–Adar Σ 1/ln(deg(z)), both in integer micro-units.

    Exactness contract (CLAUDE.md cross-engine rules): a plain double
    sum is merge-order-nondeterministic, so NO double is ever summed.
    RA terms are ``1000000 div deg`` (integer division, truncating,
    positive operands — Spark ``div`` == DuckDB ``//`` here); AA terms
    are ``floor(1e6 / round(ln(deg), 6))`` — ln snapped to the 1e-6
    grid per the ln recipe, the division of two bit-identical doubles
    is correctly rounded IEEE, and floor lands it in bigint. Both
    scores then accumulate as exact integer sums. deg(z) ≥ 2 for any
    common neighbour by construction, so ln is never 0.

    Scale shape:
    * Candidate generation is the bucketed collect_list gather +
      in-array pair idiom (never a self-join): one shuffle gathers
      each witness node's full neighbour list, ordered pairs emit
      from chained explodes, so a pair (x, y) is scored once per
      shared neighbour z and the groupBy below folds them map-side.
    * *max_deg* caps the witness fan-out: a hub node's O(deg²) pair
      emission is the one quadratic in this shape, and hubs carry the
      LEAST per-witness signal (1/ln deg, 1/deg → 0), so dropping
      witnesses above the cap is the standard df-cap semantics
      (documented, mirrored exactly in the oracle) — the same guard
      class as the LSH max-bucket and inverted-index df caps.
    * Only (x, y, deg) integer triples ride the pair shuffle; the
      anti-join back onto ``edges`` removes already-adjacent pairs
      (predicting the present is not prediction). ``edges`` is
      referenced twice (neighbour build + anti-join) and therefore
      persisted (Catalyst re-runs common subtrees per reference).
    * The final orderBy(desc aa, x, y).limit(k) is a
      TakeOrderedAndProject — no global sort materializes; the full
      (x, y) tiebreak makes the cut deterministic cross-engine.

    Reference analog: the reference's frequency rollups
    (perustats/BCRP/metadata.py) count what co-occurs; this scores
    what is MISSING from the co-occurrence structure."""
    edges = edges.persist()
    nbr = (
        edges.select(F.explode(F.array(
            F.struct(F.col("a").alias("node"), F.col("b").alias("nb")),
            F.struct(F.col("b").alias("node"), F.col("a").alias("nb")),
        )).alias("_e"))
        .select("_e.node", "_e.nb")
    )
    adj = (
        nbr.groupBy("node")
        .agg(F.array_sort(F.collect_list("nb")).alias("vs"))
        .where((F.size("vs") >= 2) & (F.size("vs") <= max_deg))
        .select("vs", F.size("vs").cast("bigint").alias("_d"))
    )
    pairs = (
        adj.select(F.explode("vs").alias("x"), F.col("vs"), F.col("_d"))
        .select("x", F.explode("vs").alias("y"), F.col("_d"))
        .where(F.col("x") < F.col("y"))
    )
    scored = (
        pairs.groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum(F.expr("1000000 div _d")).cast("bigint")
            .alias("ra_micro"),
            F.sum(F.floor(F.lit(1000000.0)
                          / F.round(F.log(F.col("_d")), 6))
                  .cast("bigint")).cast("bigint").alias("aa_micro"),
        )
    )
    out = (
        scored.join(
            edges.select(F.col("a").alias("x"), F.col("b").alias("y")),
            ["x", "y"], "left_anti")
        .select(F.col("x").alias("part_a"), F.col("y").alias("part_b"),
                "common_neighbors", "ra_micro", "aa_micro")
        .orderBy(F.desc("aa_micro"), "part_a", "part_b")
        .limit(k)
    )
    return out


def copurchase_node_clustering(lineitem: DataFrame, max_basket: int = 50,
                               min_support: int = 1,
                               sort: bool = True) -> DataFrame:
    """PER-NODE clustering coefficient of the part co-purchase graph —
    :func:`copurchase_triangle_stats` one level finer: for each part,
    its degree, its triangle count, and cc = 2·T/(d(d−1)) (Watts &
    Strogatz, Nature 393:440, 1998). The per-node view separates
    locally cliquish parts (accessory bundles, cc → 1) from hub parts
    that bridge unrelated baskets (cc → 0 at high degree) — the
    node-level signal the single global transitivity number averages
    away.

    Scale shape — same degree-ordered iterator as the census, with
    apex retention: edges via the basket gather (never a lineitem
    self-join), orientation from the lower-(degree, id) endpoint
    (O(√m) out-degree bound → O(m^{3/2}) wedge work regardless of hub
    skew), wedges from the collect_list + in-array pair idiom KEEPING
    the apex column, closing equi-join against the oriented edges
    (SHUFFLE_HASH — the probe is a GenerateExec whose row estimate is
    its child's, so the planner could otherwise broadcast the wedge
    stream). Each triangle then lands exactly once as (apex, x, y)
    and contributes one count to EACH of its three corners via a
    3-row explode — a fixed 3× fan-out into a partial-aggregated
    groupBy, no window. ``edges``/``oriented`` persisted + bounded-
    parallelism-repartitioned exactly as in the census (Catalyst
    re-runs common subtrees per reference).

    Exactness: degree and triangle counts are integers; cc is one
    int/int IEEE division shipped raw (bit-identical cross-engine);
    degree-1 nodes get NULL cc via try_divide, and nodes outside any
    qualifying basket simply don't appear (they have no edges)."""
    par = lineitem.sparkSession.sparkContext.defaultParallelism
    edges = (
        copurchase_edges(lineitem, max_basket=max_basket,
                         min_support=min_support)
        .repartition(par, "a", "b")
        .persist()
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = (
        edges.join(deg.select(F.col("node").alias("a"),
                              F.col("d").alias("_da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("d").alias("_db")), "b")
        .select(
            F.when(F.col("_da") <= F.col("_db"), F.col("a"))
            .otherwise(F.col("b")).alias("u"),
            F.when(F.col("_da") <= F.col("_db"), F.col("b"))
            .otherwise(F.col("a")).alias("v"),
        )
        .repartition(par, "u")
        .persist()
    )
    adj = (
        oriented.groupBy("u")
        .agg(F.collect_list("v").alias("vs"))
        .where(F.size("vs") >= 2)
        .select(F.col("u").alias("_apex"), "vs")
    )
    # unordered pairs, id-sorted (the census rewrite): half the wedge
    # rows through the closing exchange, matched against the
    # id-normalized ``edges`` (a < b) instead of the degree-oriented set
    wedges = (
        adj.select("_apex", F.explode("vs").alias("_x"), F.col("vs"))
        .select("_apex", "_x", F.explode("vs").alias("_y"))
        .where(F.col("_x") < F.col("_y"))
    )
    closing = edges.select(F.col("a").alias("_x"),
                           F.col("b").alias("_y"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["_x", "_y"])
    tcount = (
        tri.select(F.explode(F.array("_apex", "_x", "_y")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).cast("bigint")
                             .alias("_t"))
    )
    out = (
        deg.join(tcount, "node", "left")
        .select(
            F.col("node").alias("part"),
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("_t"), F.lit(0)).cast("bigint")
            .alias("n_triangles"),
            F.try_divide(
                2 * F.coalesce(F.col("_t"), F.lit(0)),
                (F.col("d") * (F.col("d") - 1)).cast("bigint"))
            .alias("clustering_coef"),
        )
    )
    return out.orderBy("part") if sort else out


def copurchase_assortativity(lineitem: DataFrame, max_basket: int = 50,
                             min_support: int = 1) -> DataFrame:
    """Degree assortativity of the part co-purchase graph — Newman's
    r (PRL 89:208701, 2002): the Pearson correlation of endpoint
    degrees over edges. r > 0 means hubs link to hubs (rich-club
    catalogue), r < 0 means hubs fan out to leaves (hub-and-spoke
    accessories) — the one-number structural summary that decides
    whether degree-targeted sampling or mitigation is worth it.
    ONE row: (n_nodes, n_edges, assortativity).

    Exactness: on the SYMMETRIZED edge list (each undirected edge
    contributes (du,dv) and (dv,du)), Σx = Σy and Σx² = Σy², so

        r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²),   M = 2·|E|

    an exact ratio of DECIMAL(38,0) integers — NO sqrt, no double
    sum anywhere; both sides cast to double once and divided
    (int→double correctly rounded past 2^53). A degree-regular graph
    makes the denominator exactly 0 → NULL via the same CASE.

    Scale shape: edges via the capped basket gather (never a
    lineitem self-join); the symmetrized list is built ONCE and
    persisted (degree count + the neighbour-degree join would
    otherwise re-execute the basket build — CLAUDE.md common-subtree
    rule); degrees persist too (two references). The moments come
    from ONE edge-sized join: M/Σx/Σx² are pure degree-table sums
    (node x is the left endpoint exactly d_x times) and Σxy folds as
    Σ d_x·s_x over the node-grain neighbour-degree sums — the
    original two-degree-join edge-sized aggregate re-associated the
    same exact integers (bit-identical r)."""
    par = lineitem.sparkSession.sparkContext.defaultParallelism
    edges = copurchase_edges(lineitem, max_basket=max_basket,
                             min_support=min_support)
    und = (
        edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(edges.select(F.col("b").alias("x"),
                            F.col("a").alias("y")))
        .repartition(par, "x")
        .persist()
    )
    deg = und.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")) \
        .withColumnRenamed("x", "node").persist()

    def dec(c):
        return c.cast("decimal(38,0)")

    # endpoint-degree moments WITHOUT per-edge degree pairs: on the
    # symmetrized list node x appears as left endpoint exactly d_x
    # times, so M = Σd, Σx = Σd², Σx² = Σd³ come from the degree
    # table alone, and Σxy = Σ_x d_x·s_x with s_x = Σ_{y∈N(x)} d_y —
    # ONE edge-sized join (y side) + a node-grain rollup instead of
    # TWO edge-sized degree joins feeding an edge-sized aggregate
    # (r11: 100× depth 44 s single-run → see OPTIMIZATION_r11.md).
    # Every summand is the same exact integer multiset re-associated,
    # so the DECIMAL sums — and the oracle — are bit-identical.
    nbr_sum = (
        und.join(deg.select(F.col("node").alias("y"),
                            F.col("d").alias("_dy")), "y")
        .groupBy("x")
        .agg(F.sum(dec(F.col("_dy"))).alias("_sy"))
    )
    agg = deg.join(nbr_sum, deg.node == nbr_sum.x).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        # coalesce: sum over ZERO edge rows (e.g. min_support filters
        # everything) is NULL where the pre-r11 edge-row count returned
        # 0 — n_edges must stay 0 on the degenerate input (the moment
        # sums stay bare: a NULL den and a zero den both yield NULL
        # assortativity through the when())
        F.coalesce(F.sum(dec(F.col("d"))),
                   F.lit(0).cast("decimal(38,0)"))
        .cast("bigint").alias("_m"),
        F.sum(dec(F.col("d")) * F.col("d")).alias("_sx"),
        F.sum(dec(F.col("d")) * F.col("_sy")).alias("_sxy"),
        F.sum(dec(F.col("d")) * F.col("d") * F.col("d")).alias("_sxx"),
    )
    num = dec(F.col("_m")) * F.col("_sxy") - F.col("_sx") * F.col("_sx")
    den = dec(F.col("_m")) * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    out = agg.select(
        "n_nodes",
        F.expr("_m div 2").cast("bigint").alias("n_edges"),
        F.when(den != 0,
               num.cast("double") / den.cast("double"))
        .alias("assortativity"),
    )
    return out
