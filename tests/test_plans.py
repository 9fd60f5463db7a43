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
    assert P.has_broadcast_join(df)
    assert not P.has_python_eval(df)


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
