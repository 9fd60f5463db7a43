"""Structured Streaming variants: drive file-source micro-batches with
availableNow into a memory sink and compare against the batch operators
on the same rows."""

import os

import pytest
from pyspark.sql import functions as F

from pyperustats_spark.operators import events as EV
from pyperustats_spark.streaming import events as SEV


@pytest.fixture(scope="module")
def events_dir(spark, tables, tmp_path_factory):
    """Batch events re-written as clean µs-timestamp parquet (the raw
    testdata is TIMESTAMP(NANOS) which the streaming reader's fixed
    schema can't take directly)."""
    d = str(tmp_path_factory.mktemp("events_stream_src"))
    tables["events"].select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).coalesce(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_tumbling_window_matches_batch(spark, tables, events_dir, tmp_path):
    stream = SEV.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    agg = SEV.stream_tumbling_window(stream, window="24 hours", watermark="1 hour")
    # complete mode: finite replay finalizes every window regardless of
    # watermark progress at the last micro-batch
    out = SEV.run_to_memory(
        agg, "tumbling_out", str(tmp_path / "ckpt"), output_mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in out.collect()
    }
    batch = EV.tumbling_window(tables["events"], hours=24).collect()
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in batch
    }
    assert got == want
    assert len(got) > 0


def test_stream_sessionize_bounds(spark, tables, events_dir, tmp_path):
    stream = SEV.read_events_stream(spark, events_dir)
    sess = SEV.stream_sessionize(stream, gap="30 minutes", watermark="1 hour")
    out = SEV.run_to_memory(
        sess, "sessionize_out", str(tmp_path / "ckpt2"), output_mode="complete"
    )
    rows = out.collect()
    assert len(rows) > 0
    # session integrity: start <= end, positive event counts, and the
    # total event count across sessions equals the input count
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    assert sum(r["n_events"] for r in rows) == tables["events"].count()
    # per-user session count matches the batch lag+cumsum sessionizer
    batch_sessions = EV.sessionize(tables["events"], gap_minutes=30)
    want = {
        r["user_id"]: r["n"]
        for r in batch_sessions.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    got = {}
    for r in rows:
        got[r["user_id"]] = got.get(r["user_id"], 0) + 1
    assert got == want


def test_stream_into_incremental_cache(spark, tables, events_dir, tmp_path):
    from pyperustats_spark.sources.cache import IncrementalParquetCache
    cache = IncrementalParquetCache(
        spark, str(tmp_path / "evcache"), keys=["event_id"])
    stream = SEV.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    q = SEV.stream_into_cache(stream, cache, str(tmp_path / "ckpt3"))
    q.awaitTermination()
    cached = cache.load()
    assert cached.count() == tables["events"].count()
    # ids survive the trip exactly once
    a = sorted(r["event_id"] for r in cached.select("event_id").collect())
    b = sorted(r["event_id"] for r in tables["events"].select("event_id").collect())
    assert a == b


def test_stream_dedup_drops_replayed_events(spark, tables, tmp_path):
    # source with every file written TWICE (replayed feed)
    src = str(tmp_path / "dup_src")
    base = tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
    base.coalesce(2).write.mode("overwrite").parquet(src)
    base.coalesce(2).write.mode("append").parquet(src)
    stream = SEV.read_events_stream(spark, src)
    deduped = SEV.stream_dedup(stream, watermark="10 days")
    out = SEV.run_to_memory(
        deduped, "dedup_out", str(tmp_path / "ckpt4"), output_mode="append")
    n_unique = base.count()
    assert out.count() == n_unique
    ids = [r["event_id"] for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids))


def test_stateful_running_totals_accumulate_across_batches(
        spark, tables, events_dir, tmp_path):
    # 2 files per trigger forces multiple micro-batches over the 4-file
    # source -> per-user state must carry between batches
    stream = SEV.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    totals = SEV.stream_user_running_totals(stream)
    out = SEV.run_to_memory(
        totals, "running_totals_out", str(tmp_path / "ckpt5"),
        output_mode="append")
    rows = out.collect()
    # several emissions per user (one per batch they appeared in);
    # the row with the max n_events is the final cumulative state
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    want = {
        r["user_id"]: r for r in
        tables["events"].groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("s"),
            F.max("ts").alias("last_ts")).collect()
    }
    assert set(final) == set(want)
    for uid, w in want.items():
        got = final[uid]
        assert got["n_events"] == w["n"], uid
        assert got["sum_value"] == pytest.approx(w["s"], rel=1e-9)
        assert got["last_ts"] == w["last_ts"]


# Resolved at conftest import, BEFORE the session JVM starts (workers
# inherit the wiring from the JVM environment). r8/r9 this was a
# signature-pinned skip ("no google.protobuf in the container");
# protobuf_compat now finds the on-disk vendored pure-Python runtime
# and the test runs for real. The skip branch remains live for images
# without any copy — it records the probe signature as before.
from tests.conftest import PROTOBUF_MODE


@pytest.mark.skipif(
    PROTOBUF_MODE is None,
    reason="transformWithStateInPandas needs a working google.protobuf "
           "for its state-server worker; no system install and no "
           "on-disk vendor copy importable (see "
           "streaming/protobuf_compat.py)")
def test_tws_running_totals_match_apply_in_pandas_with_state(
        spark, tables, events_dir, tmp_path):
    from pyperustats_spark.streaming.protobuf_compat import (
        ROCKSDB_PROVIDER)

    # TWS state variables are column families — supported by the
    # RocksDB provider only (HDFS-backed raises
    # STATE_STORE_MULTIPLE_COLUMN_FAMILIES). Session conf is read at
    # query start; restore after so other streaming tests keep the
    # default provider.
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = SEV.read_events_stream(spark, events_dir,
                                        max_files_per_trigger=2)
        totals = SEV.stream_user_totals_tws(stream)
        out = SEV.run_to_memory(
            totals, "tws_totals_out", str(tmp_path / "ckpt_tws"),
            output_mode="update")
        rows = out.collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    want = {
        r["user_id"]: r for r in
        tables["events"].groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("s"),
            F.max("ts").alias("last_ts")).collect()
    }
    assert set(final) == set(want)
    for uid, w in want.items():
        got = final[uid]
        assert got["n_events"] == w["n"], uid
        assert got["sum_value"] == pytest.approx(w["s"], rel=1e-9)
        assert got["last_ts"] == w["last_ts"]


@pytest.mark.skipif(
    PROTOBUF_MODE is None,
    reason="transformWithStateInPandas needs a working google.protobuf")
def test_tws_type_profile_composes_map_and_value_state(
        spark, tables, events_dir, tmp_path):
    """Two state variables per key (MapState type→count + ValueState
    total) — the v2-only composition — must converge to the batch
    groupBy(user, type) truth across multiple micro-batches."""
    from pyperustats_spark.streaming.protobuf_compat import (
        ROCKSDB_PROVIDER)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = SEV.read_events_stream(spark, events_dir,
                                        max_files_per_trigger=2)
        prof = SEV.stream_user_type_profile_tws(stream)
        out = SEV.run_to_memory(
            prof, "tws_type_profile_out", str(tmp_path / "ckpt_tp"),
            output_mode="update")
        rows = out.collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    per_type = {}
    for r in tables["events"].groupBy("user_id", "event_type").agg(
            F.count("*").alias("n")).collect():
        per_type.setdefault(r["user_id"], {})[r["event_type"]] = r["n"]
    assert set(final) == set(per_type)
    for uid, dist in per_type.items():
        got = final[uid]
        assert got["n_events"] == sum(dist.values()), uid
        assert got["n_types"] == len(dist), uid
        top_n = max(dist.values())
        top_type = min(t for t, c in dist.items() if c == top_n)
        assert (got["top_type"], got["top_n"]) == (top_type, top_n), uid


@pytest.mark.skipif(
    PROTOBUF_MODE is None,
    reason="transformWithStateInPandas needs a working google.protobuf")
def test_tws_topk_list_state_converges(spark, tables, events_dir,
                                       tmp_path):
    """ListState (the third v2 state kind): incremental per-user
    top-k must converge to the batch top-k truth regardless of how
    events split across micro-batches (order-insensitive merge)."""
    from pyperustats_spark.streaming.protobuf_compat import (
        ROCKSDB_PROVIDER)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = SEV.read_events_stream(spark, events_dir,
                                        max_files_per_trigger=1)
        out = SEV.run_to_memory(
            SEV.stream_user_topk_tws(stream, k=5),
            "tws_topk_out", str(tmp_path / "ckpt_topk"),
            output_mode="update")
        rows = out.collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # last emission per user (largest topk_sum: sums only grow as
    # better values arrive; ties resolved by n_kept)
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or (r["n_kept"], r["topk_sum"]) >= \
                (cur["n_kept"], cur["topk_sum"]):
            final[r["user_id"]] = r
    import pytest as _pytest
    want = {}
    for r in tables["events"].select("user_id", "value").collect():
        want.setdefault(r["user_id"], []).append(r["value"])
    assert set(final) == set(want)
    for uid, vals in want.items():
        top = sorted(vals, reverse=True)[:5]
        got = final[uid]
        assert got["n_kept"] == len(top), uid
        assert got["topk_sum"] == _pytest.approx(sum(top), rel=1e-9)
        assert got["kth_value"] == _pytest.approx(top[-1], rel=1e-9)


@pytest.mark.skipif(
    PROTOBUF_MODE is None,
    reason="transformWithStateInPandas needs a working google.protobuf")
def test_tws_processing_time_mode_and_ttl_run_green(spark, tmp_path):
    """The v1 environment bug (applyInPandasWithState +
    ProcessingTimeTimeout + availableNow → planner NPE, pinned in
    CLAUDE.md) does NOT afflict the v2 API: a TTL-enabled ValueState
    under timeMode=ProcessingTime completes an availableNow run and
    produces correct output. Pins the recipe so TTL-based state
    expiry is known-usable here."""
    import json as _json

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql import types as T

    from pyperustats_spark.streaming.protobuf_compat import (
        ROCKSDB_PROVIDER)

    out_schema = T.StructType([
        T.StructField("user_id", T.StringType()),
        T.StructField("total", T.LongType())])
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    class Totals(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState(
                "n", state_schema, ttlDurationMs=3_600_000)

        def handleInputRows(self, key, rows, timer_values):
            n = self.state.get()[0] if self.state.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.state.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "total": [n]})

        def close(self):
            pass

    src = str(tmp_path / "ttl_src")
    os.makedirs(src)
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for rec in ({"user_id": "u1", "v": 1},
                    {"user_id": "u1", "v": 2},
                    {"user_id": "u2", "v": 3}):
            f.write(_json.dumps(rec) + "\n")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = spark.readStream.schema(
            "user_id string, v long").json(src)
        q = (stream.groupBy("user_id").transformWithStateInPandas(
                Totals(), outputStructType=out_schema,
                outputMode="Update", timeMode="ProcessingTime")
             .writeStream.format("memory").queryName("tws_ttl_out")
             .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()
        rows = {r["user_id"]: r["total"] for r in
                spark.sql("SELECT * FROM tws_ttl_out").collect()}
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert rows == {"u1": 2, "u2": 1}


def test_watermark_drops_late_events(spark, tmp_path):
    """The state-bounding contract itself: an event arriving AFTER the
    watermark passed its window must not change that window's result —
    this is what makes 100 TB streaming state finite."""
    import glob
    import time as _time

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write_batch(sub, rows):
        spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, "
                  "event_type string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")) \
         .coalesce(1).write.mode("overwrite").parquet(src + "/_tmp")
        part = glob.glob(src + "/_tmp/part-*.parquet")[0]
        dst = os.path.join(src, sub)
        os.replace(part, dst)
        return dst

    # batch 1: one event in the 00:00 window, one 3h later that
    # advances the watermark to 02:00 (3h - 1h watermark delay).
    # batch 2: an on-time filler — the watermark takes effect and the
    # 00:00 window is evicted+emitted at this batch's close (Spark
    # applies the late filter/eviction with the watermark committed by
    # the PREVIOUS batch, so the drop needs one batch of lag).
    # batch 3: the LATE event for the finalized 00:00 window plus a
    # fresh on-time event.
    f1 = write_batch("b1.parquet", [
        (1, "2020-01-01 00:10:00", 1, "view", 1.0),
        (2, "2020-01-01 03:00:00", 1, "view", 1.0)])
    _time.sleep(0.01)
    f2 = write_batch("b2.parquet", [
        (5, "2020-01-01 03:10:00", 3, "view", 1.0)])
    _time.sleep(0.01)
    f3 = write_batch("b3.parquet", [
        (3, "2020-01-01 00:20:00", 2, "view", 100.0),
        (4, "2020-01-01 03:30:00", 2, "view", 1.0)])
    os.utime(f1, (1577836800, 1577836800))
    os.utime(f2, (1577840000, 1577840000))
    os.utime(f3, (1577843000, 1577843000))

    stream = SEV.read_events_stream(spark, src, max_files_per_trigger=1)
    agg = SEV.stream_tumbling_window(stream, window="1 hour",
                                     watermark="1 hour")
    out = SEV.run_to_memory(agg, "late_out", str(tmp_path / "late_ckpt"),
                            output_mode="append")
    rows = {r["window_start"].isoformat(): (r["n_events"],
                                            r["sum_value"])
            for r in out.collect()}
    # append mode emits only finalized windows; the 00:00 window must
    # contain ONLY the on-time event — the late value=100 row was
    # dropped by the watermark, not merged
    assert "2020-01-01T00:00:00" in rows, rows
    assert rows["2020-01-01T00:00:00"] == (1, 1.0), rows


@pytest.fixture(scope="module")
def events_dir_ts_ordered(spark, tables, tmp_path_factory):
    """Events split into 4 files by TIME RANGE (not arbitrary coalesce):
    replaying file-by-file preserves per-user timestamp order across
    micro-batches, which is the streaming-funnel contract."""
    d = str(tmp_path_factory.mktemp("events_stream_ts"))
    ev = tables["events"].select(
        "event_id", "ts", "user_id", "event_type", "value")
    bounds = ev.selectExpr(
        "percentile(cast(ts as long), array(0.25, 0.5, 0.75)) as q"
    ).collect()[0]["q"]
    import os
    prev = None
    for i, b in enumerate(list(bounds) + [None]):
        part = ev
        if prev is not None:
            part = part.where(F.col("ts").cast("long") > prev)
        if b is not None:
            part = part.where(F.col("ts").cast("long") <= b)
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"chunk={i}"))
        prev = b
    return d


def test_stream_funnel_matches_batch_on_ordered_replay(
        spark, tables, events_dir_ts_ordered, tmp_path):
    from pyperustats_spark.operators import events as BEV
    # one file per trigger -> 4 micro-batches; per-user funnel state
    # must advance across them
    stream = SEV.read_events_stream(
        spark, events_dir_ts_ordered + "/chunk=*",
        max_files_per_trigger=1)
    prog = SEV.stream_funnel_progress(stream)
    out = SEV.run_to_memory(
        prog, "funnel_out", str(tmp_path / "ckpt_funnel"),
        output_mode="append")
    rows = out.collect()
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["step_idx"] > cur:
            final[r["user_id"]] = r["step_idx"]
    # batch funnel counts == streaming counts of users at/past each step
    batch = {r["step"]: r["n_users"]
             for r in BEV.funnel_steps(tables["events"]).collect()}
    steps = ("view", "click", "purchase")
    for i, s in enumerate(steps, start=1):
        streamed = sum(1 for v in final.values() if v >= i)
        assert streamed == batch[s], (s, streamed, batch[s])


def test_stream_funnel_late_event_cannot_retro_advance(spark, tmp_path):
    import os
    d = str(tmp_path / "src")
    # batch 1: user 1 clicks at 10:05 (no view yet -> no advance)
    # batch 2: a LATE view at 10:00 arrives -> advances view only; the
    # already-seen click is gone, so click never completes
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 1, "click", 1.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        [(2, "2024-01-01 10:00:00", 1, "view", 1.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1.coalesce(1).write.parquet(os.path.join(d, "f=0"))
    b2.coalesce(1).write.parquet(os.path.join(d, "f=1"))
    stream = SEV.read_events_stream(spark, d + "/f=*",
                                    max_files_per_trigger=1)
    out = SEV.run_to_memory(
        SEV.stream_funnel_progress(stream, steps=("view", "click")),
        "funnel_late_out", str(tmp_path / "ckpt_late"),
        output_mode="append")
    assert max(r["step_idx"] for r in out.collect()) == 1


def test_stream_attribution_matches_batch_on_ordered_replay(
        spark, tables, events_dir_ts_ordered, tmp_path):
    from pyperustats_spark.operators import events as BEV
    stream = SEV.read_events_stream(
        spark, events_dir_ts_ordered + "/chunk=*", max_files_per_trigger=1)
    out = SEV.run_to_memory(
        SEV.stream_attribution(stream),
        "attr_out", str(tmp_path / "ckpt_attr"), output_mode="append")
    streamed = {r["event_id"]: r for r in out.collect()}
    batch = {r["event_id"]: r for r in
             BEV.last_touch_attribution(tables["events"]).collect()}
    assert set(streamed) == set(batch)
    for eid, b in batch.items():
        s = streamed[eid]
        assert s["attributed"] == b["attributed"], eid
        assert s["touch_ts"] == b["touch_ts"], eid


def test_stream_attribution_late_touch_cannot_retro_claim(spark, tmp_path):
    import os
    d = str(tmp_path / "src")
    # batch 1: purchase with no prior view -> unattributed, emitted
    # batch 2: a LATE view arrives before the purchase in event time —
    # the already-emitted conversion is not re-claimed (documented)
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 1, "purchase", 1.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        [(2, "2024-01-01 10:00:00", 1, "view", 1.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1.coalesce(1).write.parquet(os.path.join(d, "f=0"))
    b2.coalesce(1).write.parquet(os.path.join(d, "f=1"))
    stream = SEV.read_events_stream(spark, d + "/f=*",
                                    max_files_per_trigger=1)
    out = SEV.run_to_memory(
        SEV.stream_attribution(stream),
        "attr_late_out", str(tmp_path / "ckpt_attr_late"),
        output_mode="append")
    rows = out.collect()
    assert len(rows) == 1
    assert not rows[0]["attributed"] and rows[0]["touch_ts"] is None


def test_stream_daily_users_tracks_exact_dau(spark, tables, events_dir, tmp_path):
    stream = SEV.read_events_stream(spark, events_dir,
                                    max_files_per_trigger=2)
    out = SEV.run_to_memory(
        SEV.stream_daily_users(stream),
        "dau_out", str(tmp_path / "ckpt_dau"), output_mode="append")
    streamed = {r["day_start"].date(): r["approx_users"]
                for r in out.collect()}
    exact = {r["day"]: r["n"] for r in
             tables["events"].select(F.to_date("ts").alias("day"), "user_id")
             .distinct().groupBy("day").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert streamed, "no windows emitted"
    for day, est in streamed.items():
        assert abs(est - exact[day]) <= max(3, 0.1 * exact[day]), (
            day, est, exact[day])


def test_stream_new_documents_matches_batch_incremental(
        spark, tables, tmp_path):
    import os
    from pyperustats_spark.operators import dedup as BD
    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    # replay the batch in doc_id order across 2 files so the stream's
    # first-arrival tiebreak equals the batch keep-min-id rule
    d = str(tmp_path / "docs_src")
    n = batch.count()
    ids = sorted(r[0] for r in batch.select("doc_id").collect())
    cut = ids[n // 2]
    batch.where(F.col("doc_id") <= cut).coalesce(1) \
        .write.parquet(os.path.join(d, "f=0"))
    batch.where(F.col("doc_id") > cut).coalesce(1) \
        .write.parquet(os.path.join(d, "f=1"))
    stream = SEV.read_documents_stream(spark, d + "/f=*",
                                       max_files_per_trigger=1)
    out = SEV.run_to_memory(
        SEV.stream_new_documents(stream, corpus, prefix_chars=40),
        "newdocs_out", str(tmp_path / "ckpt_newdocs"),
        output_mode="append")
    streamed = {(r["doc_id"], r["fp"]) for r in out.collect()}
    expect = {(r["doc_id"], r["fp"]) for r in
              BD.dedup_incremental(batch, corpus, prefix_chars=40).collect()}
    assert streamed == expect


def test_stream_contaminated_documents_matches_batch(
        spark, tables, tmp_path):
    """Streaming literal-lift ids == the complement of the batch
    decontaminate survivors on the same replayed batch/corpus split
    (min_shared=1), replayed across two files to cross micro-batch
    boundaries."""
    import os
    from pyperustats_spark.operators import dedup as BD

    docs = tables["documents"].where(F.col("doc_id") < 200)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    d = str(tmp_path / "contam_src")
    ids = sorted(r[0] for r in batch.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    batch.where(F.col("doc_id") <= cut).coalesce(1) \
        .write.parquet(os.path.join(d, "f=0"))
    batch.where(F.col("doc_id") > cut).coalesce(1) \
        .write.parquet(os.path.join(d, "f=1"))
    stream = SEV.read_documents_stream(spark, d + "/f=*",
                                       max_files_per_trigger=1)
    out = SEV.run_to_memory(
        SEV.stream_contaminated_documents(stream, corpus),
        "contam_out", str(tmp_path / "ckpt_contam"),
        output_mode="append")
    streamed = {r["doc_id"] for r in out.collect()}
    survivors = {r["doc_id"] for r in
                 BD.exact_substring_decontaminate(batch, corpus).collect()}
    all_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert streamed == all_ids - survivors
    assert streamed, "expected at least one contaminated doc in testdata"


def test_stream_manifest_quarantine_matches_batch(spark, tables, tmp_path):
    """Streaming verdicts == batch manifest_quarantine on the same
    data, including a deliberately rotted member and an unlisted one;
    the corrupt row is flagged, the stream never fails."""
    import os

    from pyperustats_spark.operators import organizer as ORG

    docs = tables["documents"].where(F.col("doc_id") < 40)
    # manifest: everything except one unlisted id; one rotted hash
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    unlisted_id, rotted_id = ids[0], ids[1]
    manifest = (
        docs.where(F.col("doc_id") != unlisted_id)
        .select(
            "doc_id", "source",
            F.when(F.col("doc_id") == rotted_id,
                   F.md5(F.concat(F.col("text"), F.lit("!"))))
            .otherwise(F.md5(F.col("text"))).alias("expected_hash"),
        )
    )
    d = str(tmp_path / "docs_q")
    docs.coalesce(1).write.parquet(os.path.join(d, "f=0"))
    stream = SEV.read_documents_stream(spark, d + "/f=*")
    out = SEV.run_to_memory(
        SEV.stream_manifest_quarantine(stream, manifest),
        "quarantine_out", str(tmp_path / "ckpt_q"),
        output_mode="append")
    streamed = {r["doc_id"]: r["status"] for r in out.collect()}
    batch = {r["doc_id"]: r["status"] for r in
             ORG.manifest_quarantine(docs, manifest).collect()}
    assert streamed == batch
    assert streamed[unlisted_id] == "unlisted"
    assert streamed[rotted_id] == "corrupt"
    assert sum(1 for s in streamed.values() if s == "ok") == 38


def test_stream_append_ledger_matches_batch_build(spark, tables, tmp_path):
    """Streaming ledger ingest == batch-built ledger on the same docs
    (replayed across two files to cross micro-batch boundaries), and a
    replayed batch appends nothing (idempotent at the artifact level)."""
    import os
    from pyperustats_spark.operators.dedup import (
        content_key, winnowed_fingerprints)
    from pyperustats_spark.sources.ledger import CorpusLedger

    docs = tables["documents"].where(F.col("doc_id") < 120)
    d = str(tmp_path / "led_src")
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    docs.where(F.col("doc_id") <= cut).coalesce(1) \
        .write.parquet(os.path.join(d, "f=0"))
    docs.where(F.col("doc_id") > cut).coalesce(1) \
        .write.parquet(os.path.join(d, "f=1"))

    led = CorpusLedger(spark, "test_stream_ledger", num_buckets=4)
    led.drop()
    try:
        stream = SEV.read_documents_stream(spark, d + "/f=*",
                                           max_files_per_trigger=1)
        q = SEV.stream_append_ledger(stream, led,
                                     str(tmp_path / "ckpt_led"))
        q.awaitTermination(120)
        keys = {r["fp"] for r in led.seen_keys().collect()}
        fps = {r["wh"] for r in led.seen_fingerprints().collect()}
        expect_keys = {r["fp"] for r in docs.select(
            content_key().alias("fp")).distinct().collect()}
        expect_fps = {r["wh"] for r in winnowed_fingerprints(docs)
                      .select("wh").distinct().collect()}
        assert keys == expect_keys
        assert fps == expect_fps
        # r11: the paragraph-key table rides the same streaming ingest
        from pyperustats_spark.operators.dedup import _paragraph_list
        paras = {r["_pk"] for r in led.seen_paragraphs().collect()}
        expect_paras = {r["_pk"] for r in docs.select(F.explode(
            _paragraph_list(r"\n\s*\n")).alias("p"))
            .select(F.md5("p").alias("_pk")).distinct().collect()}
        assert paras == expect_paras
        # r11: the CDC chunk-key table rides the same streaming ingest
        from pyperustats_spark.operators.dedup import _cdc_chunk_rows
        chunks = {r["ck"] for r in led.seen_chunks().collect()}
        expect_chunks = {r["ck"] for r in _cdc_chunk_rows(docs)
                         .select("ck").distinct().collect()}
        assert chunks == expect_chunks
        # replay: appending the same docs adds nothing
        led.append_release(docs)
        assert led.seen_keys().count() == len(expect_keys)
        assert led.seen_fingerprints().count() == len(expect_fps)
        assert led.seen_paragraphs().count() == len(expect_paras)
        assert led.seen_chunks().count() == len(expect_chunks)
    finally:
        led.drop()


@pytest.mark.skipif(
    PROTOBUF_MODE is None,
    reason="transformWithStateInPandas needs a working google.protobuf")
def test_tws_timer_sessionizer_converges_with_batch(spark, tmp_path):
    """The v2 timer-driven sessionizer (stream_sessionize_tws):
    registered EVENT-TIME timers close idle sessions on gap expiry,
    in-batch gaps close them via the successor-event path, and on
    ordered replay the union of both emission paths equals batch
    sessionize row-for-row. The watermark-flushing sentinel (a far-
    future event for a throwaway user) makes the final no-data
    micro-batch fire every pending timer; the sentinel's own session
    correctly stays open and unemitted (append semantics)."""
    import json as _json

    from pyperustats_spark.operators import events as EVB
    from pyperustats_spark.streaming.protobuf_compat import (
        ROCKSDB_PROVIDER)

    t0 = 1_700_000_000  # epoch seconds base
    MIN = 60

    def iso(sec):
        import datetime as _dt
        return _dt.datetime.fromtimestamp(
            sec, _dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.000Z")

    # file 1: u1 two sessions IN ONE BATCH (65-min gap → in-batch
    # close), u2 session opens
    f1 = [
        {"user_id": 1, "ts": iso(t0), "value": 1.0},
        {"user_id": 1, "ts": iso(t0 + 5 * MIN), "value": 2.0},
        {"user_id": 1, "ts": iso(t0 + 70 * MIN), "value": 3.0},
        {"user_id": 2, "ts": iso(t0 + 10 * MIN), "value": 10.0},
    ]
    # file 2: u2 extends across batches (within gap → timer re-armed),
    # u1 starts a THIRD session 2h later (cross-batch successor close
    # of session 2)
    f2 = [
        {"user_id": 2, "ts": iso(t0 + 30 * MIN), "value": 20.0},
        {"user_id": 1, "ts": iso(t0 + 190 * MIN), "value": 4.0},
    ]
    # file 3: the watermark-flushing sentinel only
    f3 = [{"user_id": 999, "ts": iso(t0 + 100_000 * MIN), "value": 0.0}]

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    for i, rows in enumerate((f1, f2, f3)):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
            for rec in rows:
                f.write(_json.dumps(rec) + "\n")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = (spark.readStream.schema(
                      "user_id long, ts timestamp, value double")
                  .option("maxFilesPerTrigger", 1).json(src))
        sess = SEV.stream_sessionize_tws(stream, gap_minutes=30,
                                         watermark="1 minute")
        out = SEV.run_to_memory(
            sess, "tws_sess_out", str(tmp_path / "ckpt_sess"),
            output_mode="append")
        got = sorted(
            ((r["user_id"], r["session_start"], r["session_end"],
              r["n_events"], round(r["sum_value"], 6))
             for r in out.collect()))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    batch = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["value"]) for r in f1 + f2],
        "user_id long, ts string, value double"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")
    want = sorted(
        ((r["user_id"], r["session_start"], r["session_end"],
          r["n_events"], round(r["sum_value"], 6))
         for r in EVB.sessionize(batch, gap_minutes=30,
                                 tiebreak=None).collect()))
    assert len(want) == 4          # u1 × 3 sessions + u2 × 1
    assert got == want             # sentinel session absent from got


@pytest.mark.skipif(
    PROTOBUF_MODE is None,
    reason="transformWithStateInPandas needs a working google.protobuf")
def test_tws_funnel_timeout_converges_with_python_model(spark, tmp_path):
    """Deadline funnel (stream_funnel_timeout_tws): conversions emit
    on the last step, abandonments emit via the successor-event path
    (the user's own later event proves the gap) or the event-time
    timer (only the watermark does), and re-opened attempts work.
    Pinned against a plain-Python replay of the same semantics."""
    import json as _json
    import datetime as _dt

    from pyperustats_spark.streaming.protobuf_compat import (
        ROCKSDB_PROVIDER)

    t0 = 1_700_000_000
    MIN = 60

    def iso(sec):
        return _dt.datetime.fromtimestamp(
            sec, _dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.000Z")

    # u1 converts cleanly; u2 abandons at step 2 via its own later
    # event (which re-opens and converts a second attempt); u3
    # abandons via TIMER only (no later events); u4's non-next-step
    # events never advance or reset; u5 converts twice.
    raw = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        (2, 0, "view"), (2, 10, "click"),
        (2, 200, "view"), (2, 210, "click"), (2, 220, "purchase"),
        (3, 5, "view"), (3, 15, "click"),
        (4, 0, "view"), (4, 10, "purchase"), (4, 30, "click"),
        (4, 40, "purchase"),
        (5, 0, "view"), (5, 5, "click"), (5, 10, "purchase"),
        (5, 30, "view"), (5, 35, "click"), (5, 40, "purchase"),
    ]
    events = [{"user_id": u, "ts": iso(t0 + m * MIN), "value": 1.0,
               "event_type": et} for u, m, et in raw]
    sentinel = {"user_id": 999, "ts": iso(t0 + 100_000 * MIN),
                "value": 0.0, "event_type": "view"}

    # python model: ordered replay, same semantics as the docstring
    def model(rows, steps=("view", "click", "purchase"), timeout=60):
        out = []
        by_user = {}
        for u, m, et in sorted(rows):
            by_user.setdefault(u, []).append((m, et))
        sidx = {s: i for i, s in enumerate(steps)}
        for u, evs in by_user.items():
            st = None
            for m, et in evs:
                if st is not None and m - st[1] > timeout:
                    out.append((u, "abandoned", st[0], st[1]))
                    st = None
                if st is None:
                    if sidx.get(et) == 0:
                        st = [1, m]
                elif sidx.get(et) == st[0]:
                    st = [st[0] + 1, m]
                if st is not None and st[0] == len(steps):
                    out.append((u, "converted", len(steps), m))
                    st = None
            if st is not None:          # sentinel watermark times it out
                out.append((u, "abandoned", st[0], st[1]))
        return sorted(out)

    src = str(tmp_path / "funnel_src")
    os.makedirs(src)
    # ordered replay: files chunk a GLOBALLY ts-sorted feed (a batch
    # with out-of-order cross-user timestamps would watermark-drop
    # mid-funnel events in later batches) — still splits u2/u5
    # attempts across micro-batches
    events = sorted(events, key=lambda r: r["ts"])
    chunks = [events[:8], events[8:16], events[16:] + [sentinel]]
    for i, rows in enumerate(chunks):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
            for rec in rows:
                f.write(_json.dumps(rec) + "\n")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = (spark.readStream.schema(
                      "user_id long, ts timestamp, value double, "
                      "event_type string")
                  .option("maxFilesPerTrigger", 1).json(src))
        out = SEV.run_to_memory(
            SEV.stream_funnel_timeout_tws(
                stream, timeout_minutes=60, watermark="1 minute"),
            "tws_funnel_out", str(tmp_path / "ckpt_funnel"),
            output_mode="append")
        got = sorted(
            (r["user_id"], r["outcome"], r["steps_completed"],
             int((r["attempt_end_ts"]
                  - _dt.datetime(1970, 1, 1)).total_seconds()
                 - t0) // MIN)
            for r in out.collect() if r["user_id"] != 999)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    assert got == model(raw)
    # the timer-only abandonment (u3) is present
    assert (3, "abandoned", 2, 15) in got
    # re-opened attempts: u2 abandoned then converted, u5 twice
    assert (2, "abandoned", 2, 10) in got and \
        (2, "converted", 3, 220) in got
    assert [r for r in got if r[0] == 5] == \
        [(5, "converted", 3, 10), (5, "converted", 3, 40)]
