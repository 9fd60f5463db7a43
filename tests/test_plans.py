"""Physical-plan assertions: the scale contract (pushdown, pruning,
broadcast, JVM-side hot paths) checked against explain output."""

import os

import pytest
from pyspark.sql import functions as F

import pyperustats_spark.plans as P
from pyperustats_spark.multimodal import binary_ops as MM
from pyperustats_spark.operators import relational as R
from pyperustats_spark.operators import similarity as S
from pyperustats_spark.operators import textops as TX
from pyperustats_spark.operators import timeseries as TS

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_filter_pushdown_reaches_scan(spark, tables):
    df = tables["lineitem"].where(F.col("l_shipdate") <= "1998-09-02").select(
        "l_returnflag", "l_quantity"
    )
    pushed = P.pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), pushed


def test_column_pruning_on_projection(spark, tables):
    df = tables["lineitem"].select("l_orderkey", "l_extendedprice")
    schemas = P.read_schema_columns(df)
    assert schemas and set(schemas[0]) == {"l_orderkey", "l_extendedprice"}


def test_q5_broadcasts_dims(spark, tables):
    df = R.local_supplier_volume(
        tables["region"], tables["nation"], tables["customer"],
        tables["supplier"], tables["orders"], tables["lineitem"])
    # at this SF the optimizer still CHOOSES broadcast joins...
    assert P.has_broadcast_join(df)
    assert not P.has_python_eval(df)
    # ...but only the two fixed-size dims (region, nation) are author-
    # hinted; customer/supplier grow with SF and must stay AQE-decided
    assert P.broadcast_hint_count(df) == 2


def test_q3_customer_join_not_hinted(spark, tables):
    df = R.shipping_priority(
        tables["customer"], tables["orders"], tables["lineitem"])
    # zero hints anywhere: the only dim-ish side (segment-filtered
    # customer) is SF-proportional — a forced broadcast there is the
    # r2 loser-set OOM pattern
    assert P.broadcast_hint_count(df) == 0
    # the join is still broadcast at this SF because the side is small
    assert P.has_broadcast_join(df)


def test_market_share_and_top_customers_hint_only_fixed_dims(spark, tables):
    ms = R.market_share(
        tables["region"], tables["nation"], tables["customer"],
        tables["orders"])
    # region + nation — never customer. The r11 rewrite replaced the
    # 1-row grand-total crossJoin (which duplicated the shared agg
    # subtree, so hints counted 2 + 2 + 1) with a full-frame window
    # over the <= 25-row nation aggregate: one branch, 2 hints.
    assert P.broadcast_hint_count(ms) == 2
    tc = R.top_customers(
        tables["customer"], tables["orders"], tables["nation"])
    # nation only — the per-customer agg has customer's own cardinality
    assert P.broadcast_hint_count(tc) == 1


# queries whose remaining broadcast hints are all on provably O(small)
# or SF-invariant sides (audited; justification in each operator's
# docstring). Anything NOT listed here must carry zero broadcast hints.
BROADCAST_HINT_WHITELIST = {
    "q5_local_supplier_volume",   # region (5 rows) + nation (25 rows)
    "q_market_share",             # region + nation (r11: window total)
    "q_top_customers",            # nation (25 rows)
    "catalog_validate_codes",     # user-requested code list (O(request))
    "knn_bruteforce_cosine",      # query vectors (O(queries))
    "ann_hamming_topk",           # query signatures (O(queries))
    "ann_hamming_rerank",         # query signatures + query vectors
    "knn_label_vote",             # query vectors
    "mef_find_row_by_text",       # 1-row distributed-min result
    "cache_missing_codes",        # requested code list
    "q_customer_quartiles",       # n_tiles boundary rows
    "stats_ks_two_sample",        # value-bounded bucket offsets +
                                  # 1-row totals
    "stats_mann_whitney",         # same bucket-offset side table
    "text_pack_sequences",        # per-partition offset rows (O(parts))
    "ann_lsh_cosine",             # hyperplanes + query signatures
    "ann_ivf_cosine",             # k centroid rows
    "text_pmi_collocations",      # two 1-row totals (N tokens, B pairs)
    "q_supplier_hhi",             # nation (25 rows)
    "q_supplier_skyline",         # nation (25 rows)
    "text_temperature_mixture",   # #sources-row rate table + 1-row denom
    "q_revenue_lorenz",           # cents bounds row + bucket prefix
                                  # table + 1-row total (gini class)
    "q_abc_pareto",               # cents bounds row + bucket prefix
                                  # table + 1-row total (lorenz class)
    "graph_part_degrees",         # 1-row node total
    "ann_ivf_recall_eval",        # query probe rows (O(queries x nprobe))
    "ann_pq_rerank_l2",           # query vectors (O(queries))
    "ann_ivf_pq_rerank",          # (query, probed-cell) pairs — a
                                  # driver-built O(queries × nprobe)
                                  # local relation
    "ann_ivf_pq_residual",        # same shape, residual codes
    "text_oov_rate",              # top-n vocab rows (n is a parameter,
                                  # bounded by construction via LIMIT)
    "text_drop_short_tail_approx",  # |langs|-row GK threshold table
    "corpus_summary",             # 1-row grand-total aggregate (same
                                  # audited pattern as q_market_share)
    "text_unigram_logprob",       # 1-row (N, V) corpus totals
    "text_tfidf_top_terms",       # 1-row doc-count aggregate
    "dedup_tfidf_cosine",         # 1-row doc-count aggregate (idf
                                  # denominator; same audited class)
    "text_bigram_logprob",        # 1-row vocab-size aggregate
    "q7_nation_volume",           # nation (25 rows), pre-filtered pair
    "q8_national_market_share",   # nation x2 + region (25/5 rows)
    "q21_sole_blame_supplier",    # nation (25 rows)
    "q10_returned_items",         # nation (25 rows)
    "ev_skew_profile",            # 1-row grand total
    "stats_kruskal_wallis",       # value-bounded bucket offsets +
                                  # 1-row tie-sum total (KS/MW class)
    "stats_brown_forsythe",       # k-row group-median table +
                                  # bucket-offset side (KS/MW class)
    "emb_two_nn_id",              # md5-sampled anchor vectors
                                  # (O(sample)) + 1-row query total
    "text_log_odds_terms",        # |langs|-row totals + 1-row (N, V)
                                  # corpus totals (logprob class)
    "ts_series_depth_profile",    # 1-row (total, deepest) aggregate
    "ev_power_users",             # P-row ntile offset table
    "q15_top_supplier",           # 1-row global max
    "q22_rich_inactive",          # 1-row global average
    "q2_min_cost_supplier",       # region (5) + region-filtered nation
    "dedup_jaccard_prefix",       # gram-id table — alphabet-bounded
                                  # (|charset|^n, never corpus-sized)
                                  # + histogram_rank count side table
    "text_source_jsd",            # vocab x global-total spine —
                                  # vocabulary-bounded
    "ev_decay_value",             # 1-row global max-timestamp
    "ev_kaplan_meier",            # 1-row horizon + 1-row session total
    "ev_conversion_survival",     # 1-row horizon + 1-row user total
    "ev_logrank_ab",              # 1-row horizon + 1-row arm totals
    "ev_hazard_cumulative",       # 1-row horizon + 1-row user total
    "q_benford_digits",           # 1-row chi-square scalar
    "ev_kll_quantiles",           # (type x quantile) estimate rows —
                                  # bounded by type cardinality
    "ev_cuped_ab",                # 1-row corpus day-span
    "ev_diff_in_diff",            # same 1-row corpus day-span
    "q_revenue_gini",             # 1-row cents bounds + <=2^12-row
                                  # histogram-rank offset table
    "embedding_separation",       # L-row centroid frame (label
                                  # cardinality, never corpus-sized)
    "q9_product_type_profit",     # nation (25 rows)
    "q11_important_stock",        # nation-filtered supplier keys +
                                  # 1-row threshold total
    "q20_dominant_supplier",      # region-filtered nation keys
    "ann_opq_rerank",             # query vectors (O(queries)), same
                                  # budget class as ann_pq_rerank_l2
    "layout_zorder_files",        # 1-row min/max bounds + the
                                  # bucket-histogram prefix table
                                  # (≤ 2^(bits·cols) rows)
    "layout_pruning_compare",     # same bounded sides × 3 layouts
    "emb_radius_search",          # query vectors (O(queries))
    "emb_radius_search_ivf",      # query-cell probe rows (O(q × nprobe))
    "ann_mips_dot",               # query vectors (O(queries))
    "ann_mips_ivf",               # query-cell probe rows (O(q × nprobe))
    "ev_rfm_scores",              # 1-row max-date + three histogram-
                                  # ntile prefix tables (bucket-space
                                  # bounded, never data-sized)
    "text_zipf_fit",              # distinct-frequency prefix table
                                  # (bounded by the frequency value
                                  # space, Heaps-sublinear in corpus)
    "ev_peak_concurrency",        # per-day carry table (date-range
                                  # bounded)
    "q_customer_migration",       # two histogram-ntile prefix tables
    "q_cohort_ltv",               # cohort-size table (month-range
                                  # bounded)
    "text_perplexity_buckets",    # 1-row (N, V) corpus totals + the
                                  # (lang x score-cell) prefix table
                                  # (score is a mean log-prob: the
                                  # cell alphabet spans a few hundred
                                  # values, never data-sized)
    "text_heaps_curve",           # 1-row doc_id (min,max) bounds +
                                  # histogram_ntile prefix table over
                                  # the min/max-scaled doc_id bucket
                                  # (<= 2^8 cells by construction)
    "text_dsir_sample",           # 1-row (Nr, Nt) totals + the
                                  # n_feat-row bucket-weight table
                                  # (fixed hash alphabet)
    "sample_stratified_exact_k",  # offset side table: |langs| ×
                                  # 16^nibbles rows, pruned to
                                  # offsets < k before broadcast
    "text_ccnet_filter",          # perplexity_buckets' audited sides
                                  # (1-row totals + lang × score-cell
                                  # prefix table)
    "doc_length_drift",           # bounded sides: distinct two-digit
                                  # cells (≤ ~700), global cum table,
                                  # 1-row corpus total
    "emb_matryoshka_eval",        # broadcast query set (knn class)
    "q_price_index",              # 1-row base-month aggregate; the
                                  # parts-sized basket join is
                                  # deliberately UNhinted (AQE)
    "q_basket_rules",             # 1-row basket-total aggregate (the
                                  # audited q_market_share class); the
                                  # part-count joins stay UNhinted
}


def test_plan_sweep_hints_and_scale_smells(spark):
    """ONE pass over every queries() plan checking both contracts:

    1. broadcast hints only on audited fixed-size sides — a hint on a
       growing table is the 100 TB driver-OOM pattern (r2 loser-set
       bug, r3 customer/supplier bug);
    2. no unaudited scale smells — CartesianProduct (never allowed),
       BroadcastNestedLoopJoin, Exchange SinglePartition outside the
       justified whitelist below.

    Combined so the 96 query constructions (some of which execute —
    CC rounds, IVF centroids, streaming replays) run once, not twice."""
    import __spark_entry__ as EN

    hint_offenders, unused_whitelist = [], set(BROADCAST_HINT_WHITELIST)
    smell_offenders = {}
    for key, fn in EN.queries().items():
        df = fn(spark, SF_DIR)
        if P.has_broadcast_hint(df):
            if key in BROADCAST_HINT_WHITELIST:
                unused_whitelist.discard(key)
            else:
                hint_offenders.append(key)
        txt = P.explain_str(df, mode="simple")
        smells = set()
        if "CartesianProduct" in txt:
            smells.add("CARTESIAN")  # never whitelisted
        if "BroadcastNestedLoopJoin" in txt:
            smells.add("BNLJ")
        if "Exchange SinglePartition" in txt:
            smells.add("SINGLE_PART")
        # frames with a MOVING start that end at unboundedfollowing hit
        # Spark's UnboundedFollowing frame processor, which re-scans the
        # partition remainder per row — O(n²) per partition
        # (ts_interpolate_linear measured 85× wall at 10× depth before
        # its reverse-ordered running-frame rewrite). Whole-partition
        # frames (unboundedpreceding → unboundedfollowing) evaluate
        # once per group and are fine.
        import re as _re
        low = txt.lower()
        for m in _re.finditer("unboundedfollowing", low):
            # the frame's start bound prints just before its end bound
            if "unboundedpreceding" not in low[max(0, m.start() - 80):
                                              m.start()]:
                smells.add("UNBOUNDED_FOLLOWING")
        # group-size-via-window: count() over a full-partition frame
        # (partitionBy, no orderBy) computes each group's size on ONE
        # task holding the whole group — partitioned by an unbounded-
        # cardinality key that is the LPA community_size straggler
        # (VERDICT r8 watch item; fixed to groupBy+join in graph.py).
        # Whitelisted only where the key is cardinality-bounded or the
        # op already sorts the same partition for its core semantics.
        for m in _re.finditer(r"count\([^()]*\) windowspecdefinition\(",
                              low):
            spec = low[m.end():m.end() + 400].split(
                "specifiedwindowframe", 1)
            if len(spec) != 2:
                continue
            part = spec[0].strip(" ,")
            has_order = " asc" in part or " desc" in part
            full = spec[1][:90].count("unboundedpreceding$()") == 1 and \
                "unboundedfollowing$()" in spec[1][:90]
            if part and not has_order and full:
                smells.add("GROUP_SIZE_WINDOW")
        extra = smells - PLAN_SMELL_WHITELIST.get(key, set())
        if extra:
            smell_offenders[key] = sorted(extra)
    assert not hint_offenders, f"unaudited forced broadcasts: {hint_offenders}"
    # keep the whitelist honest: every entry must still be exercised
    assert not unused_whitelist, f"stale whitelist rows: {unused_whitelist}"
    assert not smell_offenders, f"unaudited scale smells: {smell_offenders}"


def test_q1_stays_in_codegen(spark, tables):
    df = R.pricing_summary(tables["lineitem"])
    assert not P.has_python_eval(df)
    assert P.wholestage_codegen_count(df) >= 1
    # the scan should only read the q1 columns, not all 16
    schemas = P.read_schema_columns(df)
    assert schemas and len(schemas[0]) <= 7


def test_knn_broadcasts_queries_and_stays_jvm(spark, tables):
    emb = tables["embeddings"]
    q = S.make_queries(emb, [0, 1, 2])
    df = S.knn_bruteforce(emb, q, k=3)
    assert not P.has_python_eval(df), "vector math must stay in zip_with/aggregate"
    txt = P.explain_str(df)
    assert "BroadcastNestedLoopJoin" in txt or "BroadcastHashJoin" in txt


def test_text_ops_are_jvm_side(spark, tables):
    for df in (
        TX.token_counts(tables["documents"]),
        TX.quality_score(tables["documents"]),
        TX.lang_id(tables["documents"]),
    ):
        assert not P.has_python_eval(df)


def test_asof_join_single_shuffle_per_side(spark, tables):
    long_df = TS.series_long(tables["lineitem"])
    q = TS.resample(long_df, "Q").select(
        F.col("period").alias("date"), "code", "value_sum")
    df = TS.asof_join(long_df, q, on="date", key="code",
                      right_value_cols=["value_sum"])
    txt = P.explain_str(df)
    assert not P.has_python_eval(df)
    # union+window strategy: no cartesian/range cross join anywhere
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_customer_quartiles_has_no_window(spark, tables):
    # global_ntile replaces the partition-less ntile window (the
    # single-task scale killer) with range partitioning + id math:
    # the plan must contain NO window operator at all
    df = R.customer_value_quartiles(tables["customer"], tables["orders"])
    txt = P.explain_str(df)
    assert "Window" not in txt, txt
    assert not P.has_python_eval(df)


def test_global_ntile_reuses_exchange_at_runtime(spark, tables):
    rev = tables["orders"].groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    df = R.global_ntile(
        rev, [F.col("revenue").desc(), F.col("o_custkey").asc()])
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # AQE stage reuse must collapse the branch-duplicated
    # scan→agg→range-shuffle subtrees into one materialized stage
    assert "Reused" in executed, executed


def test_global_ntile_matches_window_ntile(spark, tables):
    from pyspark.sql import Window

    rev = tables["orders"].groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    order = [F.col("revenue").desc(), F.col("o_custkey").asc()]
    for n_tiles in (3, 4, 7):
        got = {
            (r["o_custkey"], r["_tile"])
            for r in R.global_ntile(rev, order, n_tiles=n_tiles).collect()
        }
        want = {
            (r["o_custkey"], r["t"])
            for r in rev.withColumn(
                "t", F.ntile(n_tiles).over(Window.orderBy(*order))).collect()
        }
        assert got == want


def test_embedding_cosine_pairs_is_equi_join(spark, tables):
    from pyperustats_spark.operators import dedup as D

    emb = tables["embeddings"].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    df = D.embedding_cosine_pairs(emb, threshold=0.2)
    txt = P.explain_str(df)
    # blocked on the (i, j) id-range key: the quadratic work must
    # hash-partition, never run as one nested-loop task
    assert "BroadcastNestedLoopJoin" not in txt, txt
    assert "CartesianProduct" not in txt, txt
    assert not P.has_python_eval(df)


def test_multimodal_uses_arrow_python_stage(spark):
    media = MM.synthesize_media(spark, n=6)
    df = MM.extract_features(media)
    # the ONE place Python eval is expected — and it must be the Arrow
    # mapInPandas operator, not row-at-a-time BatchEvalPython
    txt = P.explain_str(df)
    assert "MapInPandas" in txt
    assert "BatchEvalPython" not in txt


def test_global_running_sum_matches_window_cumsum(spark, tables):
    from pyspark.sql import Window

    rev = tables["orders"].groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    order = [F.col("o_custkey").asc()]
    for exclusive in (False, True):
        got = {
            r["o_custkey"]: r["cum_sum"]
            for r in R.global_running_sum(
                rev, order, "revenue", exclusive=exclusive).collect()
        }
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, -1 if exclusive else Window.currentRow)
        want = {
            r["o_custkey"]: r["c"]
            for r in rev.withColumn(
                "c", F.coalesce(F.sum("revenue").over(w), F.lit(0.0))).collect()
        }
        assert set(got) == set(want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6, (k, exclusive)


def test_chunk_and_pack_stay_jvm_side(spark, tables):
    docs = tables["documents"]
    for df in (TX.chunk_windows(docs), TX.pack_sequences(docs)):
        assert not P.has_python_eval(df)
    # packing must not contain a partition-less window (scale
    # contract): every Window operator in the plan is partitioned by
    # the range-partition id
    txt = P.explain_str(TX.pack_sequences(docs), mode="simple")
    win_lines = [ln for ln in txt.splitlines() if "Window" in ln]
    assert win_lines, txt
    assert all("_pid" in ln for ln in win_lines), win_lines


def test_dehinted_joins_degrade_to_shuffled_when_side_is_big(spark, tables):
    """The 100 TB posture for the formerly force-hinted queries: when
    the customer/supplier side no longer fits the broadcast threshold,
    the UNhinted join must re-plan as a shuffled join (SMJ/shuffled
    hash) — not fail, not force a broadcast — with identical results."""
    def run(q):
        if q == "q3":
            return R.shipping_priority(
                tables["customer"], tables["orders"], tables["lineitem"])
        if q == "q5":
            return R.local_supplier_volume(
                tables["region"], tables["nation"], tables["customer"],
                tables["supplier"], tables["orders"], tables["lineitem"])
        return R.top_customers(
            tables["customer"], tables["orders"], tables["nation"])

    want = {q: [tuple(r) for r in run(q).collect()] for q in ("q3", "q5", "tc")}

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for q in ("q3", "q5", "tc"):
            df = run(q)
            df.collect()
            executed = df._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in executed \
                or "ShuffledHashJoin" in executed, (q, executed)
            if q == "tc":
                # no hints at all in top_customers' fact join; its one
                # nation hint still broadcasts (hints override the
                # threshold) — the point is the BIG side didn't
                assert [tuple(r) for r in df.collect()] == want[q]
            else:
                assert [tuple(r) for r in df.collect()] == want[q]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_electoral_normalize_plans_have_no_exchange(spark):
    """Header/detail/processed are scan→parse→explode pipelines: any
    Exchange in the plan means a shuffle snuck into what must stay
    embarrassingly parallel at a billion responses."""
    from pyperustats_spark.sources.json_api import (
        normalize_electoral_response)

    raw = spark.createDataFrame(
        [(1, 1, 1, '{"Estado": "success", "Data": {"DatosGenerales": '
          '{"NuVotosEmi": "1"}, "Resultados": []}}')],
        "id_eleccion int, id_group_eleccion int, id_location_req int, "
        "payload string")
    out = normalize_electoral_response(raw)
    for name, df in (("header", out.header), ("detail", out.detail)):
        txt = P.explain_str(df)
        assert "Exchange" not in txt, (name, txt)
        assert not P.has_python_eval(df)
    # processed dedups keys — exactly ONE exchange (the distinct)
    assert P.explain_str(out.processed).count("Exchange hashpartitioning") <= 2


def test_participation_pushes_date_filter_to_scan(spark, tables):
    import __spark_entry__ as EN

    df = EN.queries()["infogob_participation"](spark, SF_DIR)
    pushed = P.pushed_filters(df)
    assert any("o_orderdate" in f for f in pushed), pushed
    assert not P.has_python_eval(df)
    # SF-proportional joins (customer, voters) unhinted
    assert P.broadcast_hint_count(df) == 0


# Scale-smell whitelist: every entry is an AUDITED, justified pattern.
#   BNLJ — a broadcast of a provably tiny side (query set, 1-row total,
#          P-row offset table) cross/nested-loop joined by design;
#   SINGLE_PART — a global aggregate/min whose OUTPUT is ~1 row.
# Anything new that cartesians, nested-loops, or funnels data through a
# single partition is a scale regression and fails here.
PLAN_SMELL_WHITELIST = {
    "q6_revenue_delta": {"SINGLE_PART"},        # global 1-row aggregate
    "stats_welch_ttest": {"SINGLE_PART"},       # 1-row two-arm aggregate
    "stats_kruskal_wallis": {"BNLJ", "SINGLE_PART"},  # 1-row tie total
                                  # cross-joined onto the 1-row stat
    "stats_brown_forsythe": {"SINGLE_PART"},    # k-row ordered ANOVA
                                  # window + 1-row final (anova class)
    "stats_friedman": {"GROUP_SIZE_WINDOW", "SINGLE_PART"},
                                  # block width counted over YEAR
                                  # blocks (bounded cardinality) and a
                                  # global max over the bounded
                                  # (year x priority) grid + 1-row stat
    "graph_part_assortativity": {"SINGLE_PART"},
                                  # 1-row moment aggregate (the r11
                                  # rewrite removed the node-count
                                  # crossJoin and its BNLJ/hint)
    "emb_two_nn_id": {"BNLJ", "SINGLE_PART"},   # 1-row anchor count
                                  # onto the 1-row MLE aggregate
    "text_log_odds_terms": {"BNLJ", "SINGLE_PART"},  # 1-row (N, V)
                                  # corpus totals (logprob class)
    "q_market_share": {"SINGLE_PART"},          # bounded full-frame
                                  # window over the ≤25-row nation agg
                                  # (the r11 window-total rewrite
                                  # removed the crossJoin and its BNLJ)
    "corpus_summary": {"BNLJ", "SINGLE_PART"},  # 1-row grand total
    "knn_bruteforce_cosine": {"BNLJ"},          # broadcast query set
    "ann_hamming_topk": {"BNLJ"},               # broadcast query sigs
    "ann_hamming_rerank": {"BNLJ"},             # broadcast query sigs
    "knn_label_vote": {"BNLJ"},                 # broadcast query set
    "mef_find_row_by_text": {"SINGLE_PART"},    # distributed-min, 1 row
    "profile_orders": {"SINGLE_PART"},          # whole-table profile row
    "ev_funnel_steps": {"SINGLE_PART"},         # k 1-row step totals
    "ev_funnel_within": {"SINGLE_PART"},        # k 1-row step totals
    "text_unigram_logprob": {"BNLJ", "SINGLE_PART"},  # 1-row (N, V)
    # (text_tfidf_top_terms merged into the GROUP_SIZE_WINDOW section
    # below — BNLJ/SINGLE_PART for the 1-row doc count stay allowed)
    "text_bigram_logprob": {"BNLJ", "SINGLE_PART"},   # 1-row vocab size
    "q_customer_quartiles": {"BNLJ"},           # P×P offset prefix table
    "text_pack_sequences": {"BNLJ"},            # P×P offset prefix table
    "q14_promo_share": {"SINGLE_PART"},         # global 1-row aggregate
    "dedup_source_overlap_sketch": {"SINGLE_PART"},  # bounded gather:
                                                # #sources × k longs
    "ev_skew_profile": {"BNLJ", "SINGLE_PART"},  # 1-row grand total
                                                # (q_market_share class)
    "ts_series_depth_profile": {"BNLJ", "SINGLE_PART"},  # 1-row
                                                # (total, deepest) agg
    "q19_disjunctive_revenue": {"SINGLE_PART"},  # global 1-row aggregate
    "ev_power_users": {"BNLJ", "SINGLE_PART"},  # P×P ntile offsets +
                                                # n_tiles-row share window
    "q15_top_supplier": {"BNLJ", "SINGLE_PART"},  # 1-row global max
    "dedup_minhash_eval": {"BNLJ", "SINGLE_PART"},  # three 1-row count
                                                # aggregates joined
    "dedup_simhash_eval": {"BNLJ", "SINGLE_PART"},  # same audited shape
    "ann_ivf_recall_eval": {"BNLJ", "SINGLE_PART"},  # two 1-row count
                                                # aggregates joined +
                                                # |nprobes|-row stack
    "embedding_pq_profile": {"SINGLE_PART"},    # 1-row m-column global
                                                # distortion aggregate
                                                # stacked to m rows
    "q17_small_qty_revenue": {"SINGLE_PART"},   # global 1-row aggregate
    "q22_rich_inactive": {"BNLJ", "SINGLE_PART"},  # 1-row global average
    "ts_xcorr": {"SINGLE_PART"},                # one pre-joined series
                                                # pair (documented)
    "dedup_threshold_sweep": {"SINGLE_PART"},   # 1-row sweep aggregate
    "q_orphan_check": {"BNLJ", "SINGLE_PART"},  # two 1-row counts joined
    "ev_conversion_lag": {"BNLJ", "SINGLE_PART"},  # two 1-row aggregates
                                                # joined (audited)
    "graph_part_triangles": {"BNLJ", "SINGLE_PART"},  # three 1-row
                                                # census aggregates
                                                # cross-joined (audited)
    "dedup_jaccard_prefix": {"SINGLE_PART"},    # histogram_rank prefix
                                                # window over the tiny
                                                # distinct-(df, c0)
                                                # count table only
    "graph_part_modularity": {"BNLJ", "SINGLE_PART"},  # two 1-row
                                                # aggregates (m + Σ)
                                                # cross-joined (audited)
    "text_pmi_collocations": {"BNLJ", "SINGLE_PART"},  # 1-row N/B
                                                # totals broadcast
                                                # (unigram_logprob class)
    "text_temperature_mixture": {"BNLJ", "SINGLE_PART"},  # #sources-
                                                # bounded rate window +
                                                # 1-row denominator
    "q_revenue_lorenz": {"BNLJ", "SINGLE_PART"},  # bucket-space prefix
    "stats_ks_two_sample": {"BNLJ", "SINGLE_PART"},  # value-bounded
                                                # bucket prefix + 1-row
                                                # totals cross join
    "stats_mann_whitney": {"BNLJ", "SINGLE_PART"},   # same shape
    "stats_chi2_independence": {"SINGLE_PART"},  # cell-bounded frame
                                                # (|R x C| rows) windows
                                                # table + n_tiles-row
                                                # cum frame (gini class)
    "graph_part_degrees": {"BNLJ", "SINGLE_PART"},  # 1-row node total
                                                # (q_market_share class)
    "ev_activity_powerlaw": {"SINGLE_PART"},    # global 1-row MLE agg
    "text_source_jsd": {"BNLJ", "SINGLE_PART"},  # 1-row global token
                                                # total; vocab spine
    "ev_decay_value": {"BNLJ", "SINGLE_PART"},  # 1-row horizon max
    "ev_kaplan_meier": {"BNLJ", "SINGLE_PART"},  # 1-row horizon +
                                                # 1-row session total;
                                                # curve windows ordered
                                                # over per-duration rows
    "ev_logrank_ab": {"BNLJ", "SINGLE_PART"},  # KM shape: 1-row
                                                # totals + bounded
                                                # hour windows
    "ev_conversion_survival": {"BNLJ", "SINGLE_PART"},  # same shape:
                                                # 1-row horizon/total,
                                                # per-hour curve frame
    "ev_hazard_cumulative": {"BNLJ", "SINGLE_PART"},    # same shape
                                                # (bounded by distinct
                                                # durations)
    "q_revenue_gini": {"BNLJ", "SINGLE_PART"},  # 1-row bounds cross
                                                # join; histogram-rank
                                                # side table (<=2^12
                                                # rows) + 1-row final
    "q_benford_digits": {"BNLJ", "SINGLE_PART"},  # 9-digit frame: chi2
                                                # scalar + digit windows
    "ev_cuped_ab": {"BNLJ", "SINGLE_PART"},     # 1-row span cross join;
                                                # pooled window over the
                                                # 2-row variant frame
    "ev_diff_in_diff": {"BNLJ", "SINGLE_PART"},  # same span cross join;
                                                # 2-row variant pivot
    "embedding_separation": {"BNLJ"},           # L x L centroid cross
                                                # join (label-bounded)
    "ev_conversion_lag_approx": {"BNLJ", "SINGLE_PART"},  # same shape,
                                                # sketch percentiles
    "ts_beta": {"SINGLE_PART"},                 # 1-row regression agg
    "q11_important_stock": {"BNLJ", "SINGLE_PART"},  # 1-row threshold
                                                # total broadcast back
                                                # (q_market_share class)
    "layout_zorder_files": {"BNLJ", "SINGLE_PART"},  # 1-row bounds
                                                # crossJoin + prefix
                                                # window over the
                                                # bucket-histogram side
                                                # table (≤ 2^(bits·cols)
                                                # rows — bounded by key
                                                # space, never data)
    "layout_pruning_compare": {"BNLJ", "SINGLE_PART"},  # same audited
                                                # shapes × 3 layouts
    "emb_radius_search": {"BNLJ"},              # broadcast query set
                                                # (knn_bruteforce class)
    "ann_mips_dot": {"BNLJ"},                   # broadcast query set
    "ev_rfm_scores": {"BNLJ", "SINGLE_PART"},   # 1-row max-date cross
                                                # join + histogram-ntile
                                                # prefix windows over the
                                                # bucket-space-bounded
                                                # side frames
    "ev_markov_stationary": {"SINGLE_PART"},    # share window over the
                                                # |event-types| state
                                                # frame (audited tiny)
    "ev_peak_concurrency": {"SINGLE_PART"},     # carry prefix window
                                                # over the date-range-
                                                # bounded day frame
    "q_customer_migration": {"SINGLE_PART"},    # histogram-ntile prefix
                                                # windows ($100-bucket
                                                # side frames)
    "inei_module_listing": {"SINGLE_PART"},     # 25-row nation dim
                                                # concatenated into ONE
                                                # synthetic page (the
                                                # round-trip input), by
                                                # construction 1 row
    "infogob_proceso_elections": {"SINGLE_PART"},  # |regions|-row (5)
                                                # options dropdown
                                                # concatenated into ONE
                                                # synthetic page (the
                                                # round-trip input), by
                                                # construction 1 row
    # GROUP_SIZE_WINDOW whitelist: full-partition count windows whose
    # partition key is cardinality-BOUNDED (lang) or whose op already
    # sorts the same per-series partition for its core semantics (the
    # count adds no new straggler; the depth-skew twin is the named
    # scale route for mega-series). dedup_keep_best was the one
    # data-sized-key case and is rewritten to a map-side argmin agg.
    "text_drop_short_tail": {"GROUP_SIZE_WINDOW"},   # lang (~4 values)
    "text_tfidf_top_terms": {"BNLJ", "SINGLE_PART",  # 1-row doc count
                             "GROUP_SIZE_WINDOW"},   # df count over the
                                                # tf grain by token: one
                                                # row per DISTINCT doc
                                                # containing the token
                                                # (breadth-bounded, not
                                                # occurrence-bounded);
                                                # the single-pass window
                                                # replaces a 2nd
                                                # tokenize of the corpus
                                                # (r12: 15-59s -> 9s at
                                                # 100x; persisting tf is
                                                # the rejected r11 A/B).
                                                # Docstring names the
                                                # two-pass form as the
                                                # 10^9-doc fallback.
    "ts_seasonal_strength": {"GROUP_SIZE_WINDOW"},   # per (code, month)
    "ts_decompose": {"GROUP_SIZE_WINDOW"},           # per (code, month)
    "text_perplexity_buckets": {"BNLJ", "SINGLE_PART"},  # 1-row (N, V)
                                                # totals (unigram class)
                                                # + prefix window over
                                                # the (lang × score-
                                                # cell) count table only
    "text_heaps_curve": {"BNLJ", "SINGLE_PART"},  # 1-row bounds cross
                                                # join + histogram_ntile
                                                # prefix window over the
                                                # <=2^8-cell scaled
                                                # doc_id bucket table +
                                                # the cumulative curve
                                                # window over exactly
                                                # `checkpoints` rows
    "text_dsir_sample": {"BNLJ", "SINGLE_PART"},  # 1-row (Nr, Nt)
                                                # totals cross-joined
                                                # into the n_feat-row
                                                # weight table
    "text_ccnet_filter": {"BNLJ", "SINGLE_PART"},  # perplexity_buckets'
                                                # audited 1-row totals
                                                # + prefix-table shapes
    "doc_length_drift": {"BNLJ", "SINGLE_PART"},  # source × cell dense
                                                # grid cross join
                                                # (bounded both sides)
                                                # + global-cum window
                                                # over the cell table
    "text_filter_funnel": {"SINGLE_PART"},      # one 1-row cascade
                                                # aggregate stacked to
                                                # 7 rows (q_market_share
                                                # class)
    "q_price_index": {"SINGLE_PART"},           # 1-row base-month min
                                                # aggregate broadcast
                                                # back (q15 class)
    "ts_seasonal_anomalies": {"GROUP_SIZE_WINDOW"},  # inherits
                                                # decompose's per
                                                # (code, month) count
                                                # window (ts_decompose
                                                # class)
    "emb_matryoshka_eval": {"BNLJ", "SINGLE_PART"},  # broadcast query
                                                # set + |dims|-row
                                                # spine/fixpoint window
    "dedup_tfidf_cosine": {"BNLJ", "SINGLE_PART"},  # 1-row doc-count
                                                # idf denominator
                                                # (tfidf_top_terms
                                                # class)
    "ts_spearman": {"GROUP_SIZE_WINDOW"},       # tie counts on the
                                                # SAME (pair, value)
                                                # partitioning the rank
                                                # window already sorts;
                                                # codes are a fixed
                                                # catalogue dimension
    "stats_anova_oneway": {"SINGLE_PART"},      # k-row ordered cum
                                                # window (bounded group
                                                # dimension) + 1-row
                                                # final aggregate
    "q_abc_pareto": {"BNLJ", "SINGLE_PART"},    # 1-row bounds + 1-row
                                                # grand total + bounded
                                                # bucket prefix window
                                                # (q_revenue_lorenz
                                                # class)
    "ts_pettitt": {"GROUP_SIZE_WINDOW"},        # tie counts share the
                                                # per-series rank
                                                # partition (ts_decompose
                                                # class); n via
                                                # groupBy+join, not a
                                                # count window
    "ts_ljung_box": {"GROUP_SIZE_WINDOW"},      # per-code (S, n) count
                                                # window shares the lag
                                                # window's partitioning
                                                # (ts_spearman class —
                                                # the series already
                                                # sits on one task for
                                                # the ordered lags)
    "ev_growth_accounting": {"SINGLE_PART"},    # week-bounded summary
                                                # lag: partition-less
                                                # window over |weeks|
                                                # rows only (audited
                                                # bounded-dimension
                                                # class)
    "q_basket_rules": {"BNLJ", "SINGLE_PART"},  # 1-row basket-total
                                                # broadcast cross join
                                                # (q_market_share class)
}


def test_no_midpipeline_global_sorts_in_composed_chains(spark, tables):
    """Composed operator chains must not carry interior global sorts:
    each one is a full-data range shuffle the next shuffle destroys.
    Operators built for composition take sort=False and every internal
    composition site passes it — these plans prove the discipline
    end-to-end (the optimizer removes SOME redundant sorts itself; the
    assertion is on what actually survives)."""
    from pyperustats_spark.api import DocumentPipeline
    from pyperustats_spark.operators import dedup as D
    from pyperustats_spark.operators import similarity as S
    from pyperustats_spark.operators import textops as T
    from pyperustats_spark.operators import timeseries as TS

    docs = tables["documents"]

    # full document chain: every stage sort-free (ZERO global sorts —
    # the pipeline never asks for presentation order)
    chain = (
        DocumentPipeline(spark, docs)
        .dedup_exact()
        .quality_filter(min_score=0.5)
        .lang_filter(["en", "es"])
        .with_fingerprint()
        .df
    )
    assert P.global_sort_count(chain) == 0, \
        spark._jvm and chain._jdf.queryExecution().optimizedPlan().toString()

    # apply-dedup: pairs → CC → anti-join, interior stages sort-free
    # even when the caller asks for a sorted result (≤1 = the tail)
    assert P.global_sort_count(D.dedup_filter(docs, sort=False)) == 0
    assert P.global_sort_count(D.dedup_filter_simhash(docs, sort=False)) == 0
    assert P.global_sort_count(D.dedup_clusters(docs, sort=True)) == 1

    # interpolate composes gap_fill sort-free; its own tail is the only
    # global sort in the plan
    long_df = TS.series_long(tables["lineitem"])
    assert P.global_sort_count(TS.interpolate_linear(long_df)) == 1

    # label vote composes knn_bruteforce sort-free
    emb = tables["embeddings"].select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, [0, 7])
    assert P.global_sort_count(S.knn_label_vote(emb, q, k=3)) == 1

    # lang_confusion composes lang_id sort-free
    assert P.global_sort_count(T.lang_confusion(docs)) == 1


def test_vocab_topn_uses_takeordered_not_global_sort(spark, tables):
    """vocab_top_terms' top-n must compile to TakeOrderedAndProject
    (per-partition heaps, driver merges n-row heads) — a global Sort +
    limit would range-shuffle the whole token-count table for n rows."""
    from pyperustats_spark.operators import textops as T
    df = T.vocab_top_terms(tables["documents"], n=100)
    plan = P.explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_lm_scoring_plans_are_jvm_side(spark, tables):
    """The LM / tf-idf model builds and scoring joins must stay in
    codegen — no Python eval anywhere in these hot paths."""
    from pyperustats_spark.operators import textops as T
    docs = tables["documents"]
    for df in (T.unigram_logprob(docs), T.bigram_logprob(docs),
               T.tfidf_top_terms(docs)):
        assert not P.has_python_eval(df)


def test_range_join_plans_as_equi_join_not_bnlj(spark):
    """The point of range_join's bucketing: a keyless point-in-
    interval join over a NON-broadcastable interval set must plan as
    a hash/sort-merge equi join on the bucket id with the range
    predicate as a residual — a plain inequality join would go
    BroadcastNestedLoopJoin (points × intervals). Asserted on 50k
    synthetic intervals with the broadcast threshold floored so size
    can't hide the shape."""
    from pyspark.sql import functions as F
    from pyperustats_spark.operators import relational as R

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        iv = spark.range(50_000).select(
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(hours=F.col("id"))).alias("start"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(hours=F.col("id") + 2)).alias("end"))
        pts = spark.range(10_000).select(
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(mins=F.col("id") * 7)).alias("ts"))
        out = R.range_join(pts, iv, bucket_seconds=3600)
        txt = P.explain_str(out, mode="simple")
        assert "BroadcastNestedLoopJoin" not in txt, txt
        assert "CartesianProduct" not in txt, txt
        assert "Join" in txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_graph_iteration_loops_serve_static_tables_from_cache(spark):
    """The graph kernels' re-execution protection, pinned at the
    DISTINCT parquet scan nodes in the formatted plan (node ids —
    the tree text reprints a shared node per reference, so raw string
    counts are nesting-inflated once caches nest inside caches).
    With every static table (edge build, node set, supplier pair
    aggregate) persisted, the base tables are scanned once each:
    pagerank 3 (lineitem, orders, supplier), salsa 3, ppr 4 (+ the
    seed filter's own pruned scan). If someone drops a persist, each
    per-round reference gets its own scan subtree and these counts
    jump back toward the unpersisted 13/7/14 — the 66-exchange bug
    class. Python must never appear in the executed plan, and the
    cache must actually serve reads (InMemoryTableScan present)."""
    import re

    import __spark_entry__ as EN

    expected = {"graph_supplier_pagerank": 3, "graph_supplier_salsa": 3,
                "graph_supplier_ppr": 4}
    for name, n_scans in expected.items():
        df = EN.queries()[name](spark, SF_DIR)
        txt = P.explain_str(df, mode="formatted")
        got = len(set(re.findall(r"Scan parquet[^\(]*\((\d+)\)", txt)))
        assert got == n_scans, (
            f"{name}: expected {n_scans} distinct parquet scan nodes, "
            f"saw {got} — a persist was dropped or a reference added")
        df.write.format("noop").mode("overwrite").save()
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in executed
        assert "Python" not in executed


def test_release_rehearsal_chain_plan(spark, tables):
    """The end-to-end recurring-release chain (dedup_incremental →
    quality_filter → decontaminate → split_leakage_safe) must stay ONE
    lazy plan with single-reference stages: zero interior global
    sorts, zero Python, and exactly 7 executed exchanges — the
    operator-at-a-time composition it replaced executed 66 (Catalyst
    does not dedupe common subplans, so every filter-set join-back
    re-ran the whole upstream)."""
    from pyperustats_spark.api import incremental_release

    docs = tables["documents"]
    ev = spark.createDataFrame(
        [(1, "batch batch batch stream spark window window dup")],
        "eid int, text string")
    out = incremental_release(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        ev, prefix_chars=40, sort=False)
    assert P.global_sort_count(out) == 0
    assert not P.has_python_eval(out)
    out.write.format("noop").mode("overwrite").save()
    executed = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = executed.count("Exchange")
    assert n_exchanges <= 7, (
        f"release chain grew to {n_exchanges} executed exchanges — a "
        "stage is re-referencing its upstream (the 66-exchange bug "
        "class this test exists to catch):\n" + executed)


def test_cdc_chunk_stats_runs_md5_scan_once(spark, tables):
    """cdc_chunk_stats references its chunk stream twice (corpus-wide
    count branch + per-doc rollup). The O(n·w) md5 boundary scan must
    appear ONCE in the plan — the doc-grain chunk frame is persisted
    and exploded per reference (optimization r11: 6.0→2.0 s at sf0.1,
    55→16.2 s at 100× depth vs the lazy double-scan form). A second
    md5 projection means someone dropped the persist and Catalyst is
    replaying the scan per reference."""
    from pyperustats_spark.operators import dedup as D

    # a WARM cache of the doc-grain frame (left by any earlier test that
    # materialized cdc_chunk_stats on the same tables) changes how the
    # plan prints: each InMemoryTableScan reference then echoes the
    # cached relation's output expression — md5 appears once PER
    # REFERENCE even though the scan runs zero times. Count from a cold
    # cache so the assertion measures plan shape, not suite order.
    spark.catalog.clearCache()
    docs = tables["documents"]
    out = D.cdc_chunk_stats(docs, sort=False)
    txt = P.explain_str(out, mode="formatted")
    md5_lines = sum(1 for ln in txt.splitlines() if "md5" in ln)
    assert md5_lines <= 1, (
        "cdc_chunk_stats plan evaluates the md5 boundary scan in "
        f"{md5_lines} projections — the doc-grain persist was lost:\n"
        + txt)
    spark.catalog.clearCache()  # drop the doc-grain persist handle


def test_rank_stats_tests_scan_orders_once(spark, tables):
    """ks_two_sample / mann_whitney_u / kruskal_wallis persist their
    value-bounded grids because histogram_cumsum references its input
    twice (bucket totals + window side) and the totals/rank branches
    add more references — unpersisted, the orders scan + partial
    aggregate executed 2-5x (optimization r11: KS 4.3→2.9 s,
    MW 3.6→2.1 s, KW 5.6→4.2 s at the 100x depth set; plan scans
    KW 5→1, KS 3→1, MW 2→1). One parquet scan each or the persist was
    lost. Cold cache first: a warm cache changes how the plan prints
    (see the cdc test above)."""
    spark.catalog.clearCache()
    orders = tables["orders"]
    for fn in (R.ks_two_sample, R.mann_whitney_u, R.kruskal_wallis):
        out = fn(orders)
        txt = P.explain_str(out, mode="formatted")
        scans = sum(1 for ln in txt.splitlines()
                    if ln.startswith("(") and ") Scan parquet" in ln)
        assert scans <= 1, (
            f"{fn.__name__} plan re-scans orders ({scans} parquet "
            "scans) — the grid persist was lost:\n" + txt)
        spark.catalog.clearCache()  # drop the grid persist handles
