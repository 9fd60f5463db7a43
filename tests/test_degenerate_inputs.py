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
