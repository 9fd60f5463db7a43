"""Bucketed warehouse: co-located joins must plan without a shuffle."""

import pytest
from pyspark.sql import functions as F

import pyperustats_spark.plans as P
from pyperustats_spark.sources import warehouse as W


@pytest.fixture(scope="module")
def bucketed_tables(spark, tables):
    # spark.sql.warehouse.dir is a STATIC config; the shared session's
    # default (./spark-warehouse, gitignored) hosts the test tables
    W.write_bucketed(
        tables["lineitem"].select("l_orderkey", "l_extendedprice", "l_quantity"),
        "li_bucketed", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    W.write_bucketed(
        tables["orders"].select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"),
        "ord_bucketed", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    yield ("li_bucketed", "ord_bucketed")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_exchange(spark, tables, bucketed_tables):
    li, ords = bucketed_tables
    # small test tables would broadcast (a BroadcastExchange is not a
    # shuffle); disable to surface the SortMergeJoin the 100 TB case uses
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = W.bucketed_join(spark, li, ords, on=["l_orderkey"])
        txt = P.explain_str(joined)
        assert "SortMergeJoin" in txt
        assert "Exchange hashpartitioning" not in txt, txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # same result as the plain (shuffling) join
    plain = tables["lineitem"].join(
        tables["orders"].withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey")
    assert joined.count() == plain.count()


def test_unbucketed_same_join_does_exchange(spark, tables):
    plain = tables["lineitem"].select("l_orderkey", "l_extendedprice").join(
        tables["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"),
        "l_orderkey")
    assert "Exchange" in P.explain_str(plain)


def test_bucketed_agg_skips_exchange(spark, bucketed_tables):
    li, _ = bucketed_tables
    agg = W.read_table(spark, li).groupBy("l_orderkey").agg(
        F.sum("l_extendedprice").alias("s"))
    # aggregation on the bucket key reuses the write-time partitioning
    assert "Exchange hashpartitioning" not in P.explain_str(agg)


def test_bucketed_corpus_dedup_apply_streams_corpus_side(spark, tables):
    """The 100 TB dedup-apply-on-a-lakehouse story: with the corpus
    bucketed on doc_id, the anti-join that APPLIES a dedup decision
    shuffles only the (8-byte) drop-id set — the corpus side reads its
    bucket files with NO exchange at any corpus size."""
    W.write_bucketed(
        tables["documents"], "docs_bucketed", ["doc_id"],
        num_buckets=8, sort_cols=["doc_id"])
    try:
        corpus = W.read_table(spark, "docs_bucketed")
        drop = tables["documents"].where(
            F.col("doc_id") % 7 == 0).select("doc_id")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            applied = corpus.join(drop, "doc_id", "left_anti")
            txt = P.explain_str(applied, mode="simple")
            # exactly ONE hash exchange: the drop set repartitioning to
            # the corpus's bucket layout; zero on the corpus side
            assert txt.count("Exchange hashpartitioning") == 1, txt
            assert "SortMergeJoin" in txt
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        n_drop = drop.count()
        assert applied.count() == tables["documents"].count() - n_drop
        assert n_drop > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_bucketed")
