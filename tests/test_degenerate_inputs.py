"""Degenerate-input guarantees: empty and single-row frames flow
through every operator family without crashing — at 100 TB a filter
can legitimately leave zero rows in a partition-, day-, or
group-slice, and that must never abort the job."""

import pytest
from pyspark.sql import functions as F

from pyperustats_spark.operators import dedup as D
from pyperustats_spark.operators import events as E
from pyperustats_spark.operators import relational as R
from pyperustats_spark.operators import textops as TX
from pyperustats_spark.operators import timeseries as TS


@pytest.fixture()
def frames(spark):
    return {
        "empty_long": spark.createDataFrame(
            [], "date timestamp, code string, value double"),
        "one_long": spark.createDataFrame(
            [("2020-01-01", "A", 1.0)],
            "date string, code string, value double"
        ).withColumn("date", F.col("date").cast("timestamp")),
        "empty_docs": spark.createDataFrame([], "doc_id long, text string"),
        "empty_ev": spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"),
    }


def test_timeseries_ops_survive_degenerate_inputs(spark, frames):
    el, ol = frames["empty_long"], frames["one_long"]
    assert TS.gap_fill(el).count() == 0
    assert TS.gap_fill(ol).count() == 1
    assert TS.resample(el, "M").count() == 0
    assert TS.pivot_wide(el, codes=("A", "B")).count() == 0
    assert TS.asof_join(
        ol, el.withColumnRenamed("value", "ref"),
        on="date", key="code", right_value_cols=["ref"]).count() == 1
    assert TS.interpolate_linear(ol).count() == 1


def test_dedup_and_text_ops_survive_empty_corpus(spark, frames):
    ed = frames["empty_docs"]
    assert D.dedup_exact(ed).count() == 0
    assert D.minhash_lsh_pairs(ed).count() == 0
    assert D.connected_components(
        spark.createDataFrame([], "id_a long, id_b long")).count() == 0
    assert TX.quality_score(ed).count() == 0
    assert TX.repetition_metrics(ed).count() == 0


def test_relational_and_events_survive_degenerates(spark, frames):
    assert E.sessionize(frames["empty_ev"], tiebreak="event_id").count() == 0
    one = frames["one_long"].select(
        F.col("value").alias("revenue"), F.lit(1).alias("o_custkey"))
    assert R.global_ntile(one, [F.col("revenue")]).count() == 1
    assert R.participation_metrics(
        spark.createDataFrame([], "g string, emitted long, electors long"),
        ["g"]).count() == 0


def test_round5_session_ops_survive_degenerates(spark, frames):
    ed, ev = frames["empty_docs"], frames["empty_ev"]
    ed_full = ed.withColumn("lang", F.lit("en")) \
                .withColumn("source", F.lit("crawl")).limit(0)
    # text family on an empty corpus
    assert TX.vocab_top_terms(ed).count() == 0
    assert TX.oov_rate(ed).count() == 0
    assert TX.boilerplate_segments(ed).count() == 0
    assert TX.boilerplate_apply(ed).count() == 0
    assert TX.corpus_summary(ed_full).count() == 0
    assert TX.quality_filter(ed_full).count() == 0
    assert TX.unigram_logprob(ed).count() == 0
    assert TX.tfidf_top_terms(ed).count() == 0
    # a corpus that is ONLY empty/null text rows: per-doc ops keep
    # every row, model-building ops see zero tokens
    nulls = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string")
    assert TX.vocab_top_terms(nulls).count() == 0
    assert TX.oov_rate(nulls).count() == 2
    assert TX.boilerplate_apply(nulls).count() == 2
    assert TX.unigram_logprob(nulls).count() == 2
    assert TX.tfidf_top_terms(nulls).count() == 0
    # events family
    assert E.approx_distinct_users(ev).count() == 0
    assert E.funnel_steps(ev).count() == 3      # step rows, all zero
    assert all(r["n_users"] == 0 for r in E.funnel_steps(ev).collect())
    assert E.retention_cohorts(ev).count() == 0
    # relational family
    assert R.epoch_shards(ed, "doc_id").count() == 0
    li_empty = spark.createDataFrame(
        [], "l_returnflag string, l_extendedprice double")
    assert R.mad_outliers(li_empty, "l_returnflag",
                          "l_extendedprice").count() == 0
    assert R.mad_outliers_approx(li_empty, "l_returnflag",
                                 "l_extendedprice").count() == 0
    assert R.winsorize_summary_approx(li_empty, "l_returnflag",
                                      "l_extendedprice").count() == 0
    assert E.inter_event_gap_stats_approx(ev).count() == 0


def test_round5_ops_survive_degenerates(spark, frames):
    """The round-5 families on empty/degenerate frames: corpus
    management, pre-flight diagnostics, transitions/attribution, and
    the series diagnostics must all yield empty results, not errors."""
    from pyperustats_spark.operators import skew as SK

    ed = frames["empty_docs"].withColumn("source", F.lit("s")) \
        .withColumn("lang", F.lit("en")) \
        .withColumn("n_chars", F.lit(0).cast("bigint"))
    ee, el = frames["empty_ev"], frames["empty_long"]
    assert D.dedup_incremental(ed, ed).count() == 0
    assert D.dedup_stats_by_source(ed).count() == 0
    assert D.source_overlap(ed).count() == 0
    assert D.split_leakage_safe(ed).count() == 0
    assert D.dedup_impact_report(ed).count() == 0
    assert E.event_transitions(ee).count() == 0
    assert E.burst_profile(ee).count() == 0
    assert E.session_stats(ee).count() == 0
    assert E.last_touch_attribution(ee).count() == 0
    assert E.active_users(ee).count() == 0
    assert E.power_user_concentration(ee).count() == 0
    assert SK.key_skew_profile(ee, "user_id").count() == 0
    assert TX.length_histogram(ed).count() == 0
    assert TX.drop_short_tail(ed).count() == 0
    assert TX.token_budget_sample(ed).count() == 0
    assert TX.quality_by_source(ed).count() == 0
    assert TX.char_entropy(ed).count() == 0
    assert TS.cusum_changepoint(el).count() == 0
    assert TS.trend_ma(el).count() == 0
    assert TS.acf(el).count() == 0
    # single-row series: changepoint degenerates gracefully
    one = frames["one_long"]
    r = TS.cusum_changepoint(one).collect()[0]
    assert r["n"] == 1 and r["cusum_stat"] == 0.0 and r["mean_after"] is None


def test_round6_ops_survive_degenerates(spark, frames):
    """Round-6 families on empty frames: the sketch twins, path mining,
    Q8/Q21 shapes, Holt smoothing, the manifest quarantine, and the
    full release chain must yield empty results, never errors."""
    from pyperustats_spark.api import incremental_release
    from pyperustats_spark.operators import organizer as ORG
    from pyperustats_spark.operators import similarity as S

    el, ev = frames["empty_long"], frames["empty_ev"]
    # percentile sketch twins + paths on an empty stream
    assert E.inter_event_gap_stats_approx(ev).count() == 0
    assert E.top_session_paths(ev).count() == 0
    assert TS.holt_winters(el).count() == 0
    # Q8/Q21 shapes with empty fact tables (dims present)
    empty_li = spark.createDataFrame(
        [], "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_extendedprice double, l_discount double, "
            "l_returnflag string")
    empty_ord = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_orderdate timestamp")
    nation = spark.createDataFrame(
        [(0, "N0", 0)], "n_nationkey long, n_name string, n_regionkey long")
    region = spark.createDataFrame([(0, "AMERICA")],
                                   "r_regionkey long, r_name string")
    cust = spark.createDataFrame([], "c_custkey long, c_nationkey long")
    supp = spark.createDataFrame(
        [], "s_suppkey long, s_name string, s_nationkey long")
    part = spark.createDataFrame([], "p_partkey long, p_type string")
    assert R.national_market_share(
        region, nation, cust, supp, empty_ord, empty_li, part).count() == 0
    assert R.sole_blame_supplier(supp, empty_li, empty_ord,
                                 nation).count() == 0
    # manifest quarantine with an empty batch and an empty manifest
    docs = spark.createDataFrame(
        [(1, "t", "s")], "doc_id long, text string, source string")
    empty_docs3 = spark.createDataFrame(
        [], "doc_id long, text string, source string")
    empty_manifest = spark.createDataFrame(
        [], "doc_id long, source string, expected_hash string")
    assert ORG.manifest_quarantine(empty_docs3, empty_manifest).count() == 0
    out = {r["doc_id"]: r["status"] for r in
           ORG.manifest_quarantine(docs, empty_manifest).collect()}
    assert out == {1: "unlisted"}
    card = ORG.ingest_integrity_card(docs, empty_manifest).collect()
    assert card[0]["n_unlisted"] == 1 and card[0]["n_missing"] == 0
    # full release chain with an empty batch AND an empty corpus
    full_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string")
    eval_df = spark.createDataFrame([(1, "a b c d e f")],
                                    "eid int, text string")
    assert incremental_release(full_docs, full_docs, eval_df).count() == 0
    # IVF recall eval with an empty query set
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    no_q = spark.createDataFrame(
        [], "query_id long, q_embedding array<double>")
    ev_out = S.ivf_recall_eval(emb, no_q, k=1, n_centroids=2,
                               nprobes=(1, 2)).collect()
    assert [r["nprobe"] for r in ev_out] == [1, 2]
    assert all(r["n_truth_pairs"] == 0 for r in ev_out)


def test_round7_ops_survive_degenerate_inputs(spark, frames):
    """Empty/degenerate frames through every round-7 family: the
    partsupp-bridge TPC-H ports, the winnowing trio, market-basket
    affinity, and both graph kernels."""
    from pyperustats_spark.operators import graph as G

    empty_li = spark.createDataFrame(
        [], "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_quantity double, l_extendedprice double, "
            "l_discount double, l_shipdate timestamp")
    part = spark.createDataFrame(
        [(1, "blue rod", "Brand#1", "STANDARD", 15, 900.0)],
        "p_partkey long, p_name string, p_brand string, "
        "p_type string, p_size int, p_retailprice double")
    supplier = spark.createDataFrame(
        [(1, "S1", 0, 10.0)],
        "s_suppkey long, s_name string, s_nationkey long, "
        "s_acctbal double")
    orders = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_orderdate timestamp")
    nation = spark.createDataFrame(
        [(0, "NATION_3", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
    region = spark.createDataFrame(
        [(0, "EUROPE")], "r_regionkey long, r_name string")

    assert R.min_cost_supplier(part, supplier, empty_li, nation,
                               region).count() == 0
    assert R.product_type_profit(empty_li, part, supplier, orders,
                                 nation).count() == 0
    assert R.important_stock(empty_li, supplier, nation).count() == 0
    assert R.dominant_supplier(empty_li, part, supplier, nation,
                               region).count() == 0
    assert R.part_affinity(empty_li).count() == 0

    ed = frames["empty_docs"]
    assert D.exact_substring_pairs(ed).count() == 0
    assert D.substring_duplication_profile(ed).count() == 0
    empty_src = spark.createDataFrame(
        [], "doc_id long, text string, source string")
    one_doc = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)), "s")],
        "doc_id long, text string, source string")
    # empty batch vs real corpus, and real batch vs empty corpus
    assert D.exact_substring_decontaminate(empty_src,
                                           one_doc).count() == 0
    assert D.exact_substring_decontaminate(
        one_doc, empty_src).count() == 1

    empty_edges = spark.createDataFrame([], "src long, dst long, w long")
    assert G.pagerank_fixed_point(empty_edges, iters=3).count() == 0
    empty_bip = spark.createDataFrame([], "hub long, auth long, w long")
    assert G.salsa_fixed_point(empty_bip, iters=2).count() == 0
    assert G.supplier_importance(empty_li, orders, supplier).count() == 0
    assert G.supplier_authority(empty_li, orders, supplier).count() == 0


def test_round7_batch2_ops_survive_degenerates(spark, frames):
    """Empty/one-row frames through the second-session operators."""
    el, ol = frames["empty_long"], frames["one_long"]
    eev = frames["empty_ev"]
    ed = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long")
    eli = spark.createDataFrame([], "l_orderkey long, l_partkey long")
    eor = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_totalprice double")
    from pyperustats_spark.operators import graph as G

    # graph kernels
    assert G.copurchase_triangle_stats(eli).collect()[0]["n_edges"] == 0
    assert G.kcore_peel(G.copurchase_edges(eli), k=2).count() == 0
    # similarity/ER/sampling
    assert D.jaccard_prefix_pairs(ed).count() == 0
    assert D.keep_best_per_cluster(ed).count() == 0
    assert R.fuzzy_name_pairs(spark.createDataFrame(
        [], "c_custkey long, c_nationkey int, c_name string")).count() == 0
    assert R.weighted_sample(eor, "o_orderkey", "o_totalprice").count() == 0
    assert R.revenue_gini(eor).collect()[0]["gini"] is None
    assert R.benford_first_digit(eor).count() == 0
    # robust ts stats
    assert TS.theil_sen_slope(el).count() == 0
    assert TS.theil_sen_slope(ol).collect()[0]["sen_slope"] is None
    assert TS.rolling_mad_anomalies(el).count() == 0
    one_mad = TS.rolling_mad_anomalies(ol).collect()
    assert len(one_mad) == 1 and one_mad[0]["roll_mad"] == 0.0
    assert TS.seasonal_strength(el).count() == 0
    # events cards
    assert E.activity_powerlaw_fit(eev).collect()[0]["n_keys"] == 0
    assert E.hll_distinct_rollup(eev).count() == 0
    assert E.kll_value_quantiles(eev).count() == 0
    assert E.weekday_profile(eev).count() == 0
    assert E.decay_weighted_value(eev).count() == 0
    assert E.kaplan_meier_sessions(eev).count() == 0
    assert E.markov_removal_attribution(eev).count() == 0
    assert TX.source_unigram_jsd(ed).count() == 0


def test_round8_ops_survive_degenerate_inputs(spark, frames):
    from pyperustats_spark.operators import graph as G

    ed = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string,"
            " n_chars long")
    eev = frames["empty_ev"]
    eedges = spark.createDataFrame([], "a long, b long")

    # paragraph family: empty corpus -> empty output (left join base)
    assert D.paragraph_dedup(ed).count() == 0
    assert D.paragraph_dup_stats(ed).count() == 0
    # doc with empty text still yields its row
    one = spark.createDataFrame(
        [(1, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    r = D.paragraph_dedup(one).collect()[0]
    assert r["n_paragraphs"] == 0 and r["text_clean"] == ""

    # LPA + modularity on an empty graph
    assert G.label_propagation(eedges).count() == 0
    mrow = G.modularity_score(eedges, G.label_propagation(eedges)
                              .select("node", "community")).collect()[0]
    assert mrow["n_edges"] == 0 and mrow["modularity"] is None

    # chunked sessionizer on empty events
    assert E.assign_sessions_chunked(eev).count() == 0
    assert E.sessionize(eev, chunked=True).count() == 0

    # PMI on empty corpus
    assert TX.pmi_collocations(ed).count() == 0


def test_round9_ops_survive_degenerate_inputs(spark, frames):
    from pyperustats_spark.operators import similarity as S

    ed = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string,"
            " n_chars long")
    eev = frames["empty_ev"]
    el, ol = frames["empty_long"], frames["one_long"]
    eemb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string")

    # depth-skew twins on empty / single-row inputs
    assert E.burst_profile_chunked(eev).count() == 0
    assert TS.cusum_changepoint_chunked(el).count() == 0
    assert TS.cusum_changepoint(el).count() == 0
    assert TS.cusum_changepoint_chunked(ol).count() == 1
    assert TS.cusum_changepoint(ol).count() == 1

    # novelty card: empty batch -> empty; empty corpus -> all novel
    assert D.substring_novelty_profile(ed, ed).count() == 0
    one = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(40)), "en", "s", 200)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    r = D.substring_novelty_profile(one, ed).collect()[0]
    assert r["n_seen"] == 0 and r["novelty_frac"] == 1.0

    # GK tail twin on empty docs
    assert TX.drop_short_tail_approx(ed).count() == 0

    # k-center on an empty corpus and a single vector
    assert S.kcenter_sample(eemb, k=4).count() == 0
    onev = spark.createDataFrame(
        [(7, [1.0, 2.0], "x")],
        "vec_id long, embedding array<double>, label string")
    row = S.kcenter_sample(onev, k=4).collect()[0]
    assert row["center"] == 1 and row["dist2"] == 0.0
