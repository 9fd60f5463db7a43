"""Structured Streaming variants of the event operators.

The reference ingests portal feeds batch-wise with resumable progress
state (INEI fetcher flags downloaded/unzipped/organized per module —
``/root/reference/perustats/inei/fetcher.py``). The streaming engine is
the Spark-native generalization: a file/kafka source with checkpointed
offsets replaces the progress DB, and watermarked windows replace the
"re-run and upsert" cycle.

Everything here is transformation-only: callers bind a source with
:func:`read_events_stream` (or any ``readStream``) and a sink of their
choice; tests drive micro-batches with ``trigger(availableNow=True)``
into a memory sink.

Scale notes (100 TB/day feed):
- Watermark bounds state; tumbling-window aggregation state is
  O(active windows × event types), independent of event volume.
- ``approx_count_distinct`` (HLL sketch) replaces the exact distinct of
  the batch variant — exact distinct-per-window is unbounded state on a
  stream.
- Session windows use the built-in ``session_window`` (state-store
  backed, gap-merged at the engine level) rather than
  ``applyInPandasWithState`` — JVM-side, no Python worker in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    Checkpointed file offsets give exactly-once per file — the streaming
    analog of the reference's per-module progress flags."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def stream_tumbling_window(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation per event type.

    Mirrors ``operators.events.tumbling_window`` but with bounded state:
    late events beyond *watermark* are dropped and windows finalize, and
    user cardinality is an HLL sketch, not an exact distinct."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
            "n_users_approx",
        )
    )


def stream_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessionization on a stream via ``session_window``.

    The engine merges overlapping per-user windows in the state store;
    a session closes once the watermark passes its end + gap. Batch
    equivalent: ``operators.events.sessionize`` (lag + cumsum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            # last event ts: sess.end is last-event + gap (engine keeps
            # the window open one gap past the last event); max(ts) is
            # what the batch sessionizer calls session_end
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            "session_end",
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain all available input into a memory sink and return the
    result as a batch DataFrame (test/driver helper).

    ``availableNow`` processes everything present, then stops — the
    streaming equivalent of one reference fetch cycle."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def stream_into_cache(stream_df: DataFrame, cache, checkpoint_dir: str):
    """Sink a stream into an :class:`IncrementalParquetCache` via
    foreachBatch: each micro-batch becomes one cache increment, so the
    cache's latest-wins read resolves late updates exactly like the
    reference's re-fetch-and-upsert cycle — but with streaming
    exactly-once per batch (checkpointed offsets + idempotent-enough
    append: a replayed batch re-appends and latest-wins still resolves
    to the same values when increments carry the same keys).

    Returns the started StreamingQuery; callers await/stop it."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cache.append(batch_df)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event stream by id: state-store-backed streaming
    dedup. ``dropDuplicatesWithinWatermark`` keeps an id's state only
    until the watermark passes it — bounded state, unlike plain
    streaming dropDuplicates whose state grows forever. The batch
    analog is ``dedup_exact``; the reference analog is the progress DB
    preventing re-downloads (inei/fetcher.py)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


USER_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

USER_TOTALS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def stream_user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals that persist ACROSS micro-batches, emitting the
    updated cumulative row each time a user appears in a batch.

    This is the escape hatch for stateful logic the built-in windowed
    aggregations can't express (cross-batch accumulators, custom expiry
    policies): state is an explicit (n, sum, last_seen) record per key,
    Arrow-batched to Python, and EXPIRED after *idle_timeout_ms* of
    processing-time silence — state size is O(active users), not
    O(all users ever seen). Built-in ops stay preferable when they fit
    (see stream_tumbling_window / stream_sessionize)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, s, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
            batch_max_us = int(pdf["ts"].astype("int64").max() // 1000)
            last_us = max(last_us, batch_max_us)
        state.update((n, s, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_TOTALS_OUTPUT,
        stateStructType=USER_TOTALS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same cross-batch per-user running totals on the
    ``transformWithStateInPandas`` API (Spark 4 arbitrary-state v2):
    typed per-key ValueState managed by a ``StatefulProcessor`` instead
    of the applyInPandasWithState tuple-state record.

    Why both exist: v2 composes multiple state variables (value/list/
    map) per key, supports TTL natively, and sidesteps the 4.1.2
    ProcessingTimeTimeout+availableNow planner NPE documented on
    :func:`stream_user_running_totals`. Semantics here are identical —
    the pytest asserts both operators converge to the same final
    per-user totals (SKIPPED where ``google.protobuf`` is broken: the
    TWS state-server worker needs it at runtime; this container's
    protobuf install cannot import ``descriptor``)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class UserTotals(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState("totals", USER_TOTALS_STATE)

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            n, s, last_us = self.state.get() if self.state.exists() else (0, 0.0, 0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                batch_max_us = int(pdf["ts"].astype("int64").max() // 1000)
                last_us = max(last_us, batch_max_us)
            self.state.update((n, s, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [s],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType=USER_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


TYPE_PROFILE_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("top_type", T.StringType()),
        T.StructField("top_n", T.LongType()),
    ]
)


def stream_user_type_profile_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user event-type distribution on the arbitrary-
    state v2 API, COMPOSING two state variables per key — the shape
    ``applyInPandasWithState`` cannot express (its state is one tuple
    record): a ``MapState`` event_type → count (point-updatable: a
    batch touches only the types it contains, never rewriting the
    whole distribution — at 100 TB a user's type map updates
    O(types-in-batch), not O(types-ever)) plus a ``ValueState`` total.
    Emits, per user per batch they appear in, the updated cumulative
    (n_events, n_types, top_type, top_n) with ties broken by type
    ascending — a live per-user behavioural profile card.

    Requires the RocksDB state store provider (state variables are
    column families) and a working google.protobuf for the TWS
    state-server worker — see streaming/protobuf_compat.py; pytest
    asserts convergence with the batch groupBy(user, type) counts."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    key_schema = T.StructType([T.StructField("event_type", T.StringType())])
    count_schema = T.StructType([T.StructField("n", T.LongType())])
    total_schema = T.StructType([T.StructField("n", T.LongType())])

    class TypeProfile(StatefulProcessor):
        def init(self, handle):
            self.counts = handle.getMapState(
                "type_counts", key_schema, count_schema)
            self.total = handle.getValueState("total", total_schema)

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            delta: dict[str, int] = {}
            n_new = 0
            for pdf in rows:
                n_new += len(pdf)
                for t, c in pdf["event_type"].value_counts().items():
                    delta[t] = delta.get(t, 0) + int(c)
            for t, c in delta.items():
                cur = (self.counts.getValue((t,))[0]
                       if self.counts.containsKey((t,)) else 0)
                self.counts.updateValue((t,), (cur + c,))
            total = (self.total.get()[0]
                     if self.total.exists() else 0) + n_new
            self.total.update((total,))
            n_types, top_type, top_n = 0, None, -1
            for (t,), (c,) in self.counts.iterator():
                n_types += 1
                if c > top_n or (c == top_n and (top_type is None
                                                 or t < top_type)):
                    top_type, top_n = t, c
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [total],
                    "n_types": [n_types],
                    "top_type": [top_type],
                    "top_n": [top_n],
                }
            )

        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeProfile(),
        outputStructType=TYPE_PROFILE_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


TOPK_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_kept", T.LongType()),
        T.StructField("topk_sum", T.DoubleType()),
        T.StructField("kth_value", T.DoubleType()),
    ]
)


def stream_user_topk_tws(events: DataFrame, k: int = 5) -> DataFrame:
    """Per-user incremental top-*k* event values on the arbitrary-
    state v2 API, exercising ``ListState`` — the third state-variable
    kind (ValueState: totals twin; MapState: type-profile twin): the
    state is the current top-*k* values themselves, merged with each
    batch's candidates and truncated back to *k*. Order-insensitive
    by construction (a set of maxima), so cross-batch arrival order
    cannot change the converged result — what makes it honestly
    testable against the batch top-k truth. Emits, per user per
    batch, (n_kept, topk_sum, kth_value) — the "engagement ceiling"
    card a live leaderboard reads.

    State is O(k) per user regardless of history length — the
    bounded-state design that keeps a year of 100 TB stream
    replayable. ``ListState.put`` rewrites k rows per appearing user
    per batch; k is a small constant."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    value_schema = T.StructType([T.StructField("v", T.DoubleType())])

    class TopK(StatefulProcessor):
        def init(self, handle):
            self.best = handle.getListState("topk", value_schema)

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            cur = [t[0] for t in self.best.get()] \
                if self.best.exists() else []
            for pdf in rows:
                vals = pdf["value"].nlargest(k)
                cur.extend(float(v) for v in vals)
            cur = sorted(cur, reverse=True)[:k]
            # cur can be empty: a batch of only null/NaN values for a
            # key with no prior state (nlargest drops NaN) — emit a
            # null card instead of dying on cur[-1]
            self.best.put([(v,) for v in cur])
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_kept": [len(cur)],
                    "topk_sum": [sum(cur) if cur else None],
                    "kth_value": [cur[-1] if cur else None],
                }
            )

        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TopK(),
        outputStructType=TOPK_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


SESSION_TWS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

SESSION_TWS_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def stream_sessionize_tws(events: DataFrame, gap_minutes: int = 30,
                          watermark: str = "2 hours") -> DataFrame:
    """Timer-driven gap sessionization on the arbitrary-state v2 API —
    the transformWithStateInPandas twin of :func:`stream_sessionize`
    (which lets the engine's ``session_window`` operator manage state).
    Here the session lifecycle is EXPLICIT, the shape every custom
    stateful operator with a timeout follows:

    * ``handleInputRows`` folds the batch's events in timestamp order
      into a per-user ValueState (start, last, n, sum). An in-batch
      idle gap > *gap_minutes* closes the running session immediately
      (emitted now — a later event proved it closed; no timer needed).
    * the user's single EVENT-TIME timer is re-registered at
      ``last_event + gap`` after every batch (previous timers deleted
      — one live timer per key, state O(1)).
    * ``handleExpiredTimer`` fires once the WATERMARK passes that
      expiry: the session closed by silence, not by a successor event
      — emit it and clear state. The guard re-checks the state's own
      expiry so a stale timer racing a just-extended session is a
      no-op.

    Convergence contract (pinned in tests/test_streaming.py): on
    ordered replay the union of both emission paths equals batch
    ``operators.events.sessionize`` row-for-row. Sessions still open
    when the input drains (watermark never passes their expiry) are
    correctly NOT emitted — that is the append-mode streaming
    semantics, and the test plants a watermark-flushing sentinel to
    close them.

    State per user is one 4-field record + one timer regardless of
    history length — the bounded-state property that keeps a year of
    stream replayable; timers live in the state store (RocksDB
    provider required, see protobuf_compat.ROCKSDB_PROVIDER)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    gap_us = gap_minutes * 60 * 1_000_000

    class Sessionizer(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            self.sess = handle.getValueState("sess", SESSION_TWS_STATE)

        def _emit(self, user_id, st):
            start_us, last_us, n, s = st
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            batch = pd.concat(list(rows)).sort_values("ts")
            st = list(self.sess.get()) if self.sess.exists() \
                else None
            for ts, v in zip(batch["ts"].astype("int64") // 1000,
                             batch["value"]):
                ts = int(ts)
                v = float(v) if pd.notna(v) else 0.0
                if st is None:
                    st = [ts, ts, 1, v]
                elif ts - st[1] > gap_us:
                    yield self._emit(user_id, st)   # closed by successor
                    st = [ts, ts, 1, v]
                else:
                    st[1] = max(st[1], ts)
                    st[2] += 1
                    st[3] += v
            self.sess.update(tuple(st))
            # one live timer per key: re-arm at last_event + gap
            for t in list(self.handle.listTimers()):
                self.handle.deleteTimer(t)
            self.handle.registerTimer(st[1] // 1000 + gap_minutes * 60_000)

        # NOTE: the worker invokes this with KEYWORD arguments
        # (timerValues=, expiredTimerInfo=) — the parameter names must
        # match the StatefulProcessor base signature exactly
        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if not self.sess.exists():
                return
            st = self.sess.get()
            # stale-timer guard: only close if this user really idled
            if expiredTimerInfo.getExpiryTimeInMs() \
                    >= st[1] // 1000 + gap_minutes * 60_000:
                yield self._emit(user_id, st)
                self.sess.clear()

        def close(self):
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Sessionizer(),
            outputStructType=SESSION_TWS_OUTPUT,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


FUNNEL_TIMEOUT_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("outcome", T.StringType()),
        T.StructField("steps_completed", T.LongType()),
        T.StructField("attempt_end_ts", T.TimestampType()),
    ]
)

FUNNEL_TIMEOUT_STATE = T.StructType(
    [
        T.StructField("idx", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def stream_funnel_timeout_tws(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    timeout_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Deadline-driven funnel on the arbitrary-state v2 API — the
    abandonment analytics THE timer primitive exists for (cart
    abandonment: "emit when a user who clicked never purchased within
    the hour"). Completes the v2 family: ValueState totals, MapState
    profile, ListState top-k, session timers, and now per-key
    DEADLINES.

    Attempt semantics (mirrored exactly by the test's plain-Python
    model): an in-order *steps[0]* event opens an attempt; each next
    event advances it only if it is the next step AND arrives within
    *timeout_minutes* of the previous step. Reaching the last step
    emits ``converted`` and clears state; a gap > timeout emits
    ``abandoned`` — via the successor-event path when the user's own
    later event proves the gap, via the registered EVENT-TIME timer
    when only the watermark does. After either outcome the funnel
    re-arms: later events may open a fresh attempt (one user can
    convert twice, or abandon then convert). Non-next-step events
    never reset an attempt.

    State is one (idx, last_us) record + one live timer per user —
    bounded at any history length. The stale-timer guard (expiry
    re-checked against the state's own deadline) makes a timer racing
    a same-batch advance a no-op."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    timeout_us = timeout_minutes * 60 * 1_000_000
    timeout_ms = timeout_minutes * 60_000
    n_steps = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    class FunnelTimeout(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            self.st = handle.getValueState("funnel", FUNNEL_TIMEOUT_STATE)

        def _row(self, user_id, outcome, idx, end_us):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "outcome": [outcome],
                    "steps_completed": [idx],
                    "attempt_end_ts": [pd.Timestamp(end_us, unit="us")],
                }
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            batch = pd.concat(list(rows)).sort_values("ts")
            st = list(self.st.get()) if self.st.exists() else None
            for ts, et in zip(batch["ts"].astype("int64") // 1000,
                              batch["event_type"]):
                ts = int(ts)
                if st is not None and ts - st[1] > timeout_us:
                    yield self._row(user_id, "abandoned", st[0], st[1])
                    st = None                      # terminal; may re-open
                if st is None:
                    if step_idx.get(et) == 0:
                        st = [1, ts]
                elif step_idx.get(et) == st[0]:
                    st = [st[0] + 1, ts]
                if st is not None and st[0] == n_steps:
                    yield self._row(user_id, "converted", n_steps, ts)
                    st = None
            for t in list(self.handle.listTimers()):
                self.handle.deleteTimer(t)
            if st is None:
                self.st.clear()
            else:
                self.st.update(tuple(st))
                self.handle.registerTimer(st[1] // 1000 + timeout_ms)

        # keyword-named params: the worker calls with timerValues=/
        # expiredTimerInfo= (the stream_sessionize_tws rule)
        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if not self.st.exists():
                return
            idx, last_us = self.st.get()
            if expiredTimerInfo.getExpiryTimeInMs() \
                    >= last_us // 1000 + timeout_ms:
                yield self._row(user_id, "abandoned", idx, last_us)
                self.st.clear()

        def close(self):
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=FunnelTimeout(),
            outputStructType=FUNNEL_TIMEOUT_OUTPUT,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


FUNNEL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step_idx", T.LongType()),
        T.StructField("last_step_ts", T.TimestampType()),
    ]
)

FUNNEL_STATE = T.StructType(
    [
        T.StructField("idx", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def stream_funnel_progress(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming conversion funnel: a per-user state machine that
    advances one step when the NEXT step's event arrives strictly after
    the previous advance — the incremental analog of the batch
    ``funnel_steps`` chain, emitting each user's furthest step after
    every micro-batch they appear in.

    State is two longs per user (completed-step count + advance
    timestamp), so state size is O(users in the funnel window), and the
    greedy earliest-advance fold equals the batch min-timestamp
    chaining whenever each user's events arrive in timestamp order
    (in-batch order is restored by sorting the Arrow batch; ACROSS
    batches a late event cannot retro-advance — the documented
    streaming trade, same class as watermark-dropped late events)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    step_list = list(steps)

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        idx, last_us = state.get if state.exists else (0, -1)
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        types = pdf["event_type"].tolist()
        for t_us, typ in zip(ts_us, types):
            if idx < len(step_list) and typ == step_list[idx] \
                    and t_us > last_us:
                idx += 1
                last_us = t_us
        state.update((idx, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "step_idx": [idx],
                "last_step_ts": [
                    pd.Timestamp(last_us, unit="us") if last_us >= 0
                    else pd.NaT],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTRIBUTION_OUTPUT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("conv_ts", T.TimestampType()),
        T.StructField("touch_ts", T.TimestampType()),
        T.StructField("attributed", T.BooleanType()),
    ]
)

ATTRIBUTION_STATE = T.StructType(
    [T.StructField("last_touch_us", T.LongType())]
)


def stream_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    touch_type: str = "view",
    window_minutes: int = 1440,
) -> DataFrame:
    """Streaming last-touch attribution: per-user state carries the
    latest *touch_type* timestamp; every *conv_type* event emits an
    attribution row the moment its micro-batch is processed — the
    incremental analog of the batch
    :func:`~pyperustats_spark.operators.events.last_touch_attribution`
    window (equal on ordered replay, asserted in pytest).

    State is ONE long per user (microseconds of the last touch), so
    state size is O(users), independent of event volume. In-batch
    order is restored by sorting the Arrow batch on (ts, event_id);
    ACROSS batches a late-arriving touch cannot claim an
    already-emitted conversion — the same documented streaming trade
    as the funnel's no-retro-advance rule."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    window_us = window_minutes * 60_000_000

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        (last_us,) = state.get if state.exists else (-1,)
        out = {k: [] for k in
               ("event_id", "conv_ts_us", "touch_us", "attributed")}
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        for t_us, typ, eid in zip(ts_us, pdf["event_type"].tolist(),
                                  pdf["event_id"].tolist()):
            if typ == touch_type:
                last_us = max(last_us, t_us)
            elif typ == conv_type:
                out["event_id"].append(int(eid))
                out["conv_ts_us"].append(t_us)
                out["touch_us"].append(last_us)
                out["attributed"].append(
                    last_us >= 0 and t_us - last_us <= window_us)
        state.update((last_us,))
        if out["event_id"]:
            yield pd.DataFrame(
                {
                    "event_id": out["event_id"],
                    "user_id": [user_id] * len(out["event_id"]),
                    "conv_ts": [pd.Timestamp(u, unit="us")
                                for u in out["conv_ts_us"]],
                    "touch_ts": [pd.Timestamp(u, unit="us") if u >= 0
                                 else pd.NaT for u in out["touch_us"]],
                    "attributed": out["attributed"],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ATTRIBUTION_OUTPUT,
        stateStructType=ATTRIBUTION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_daily_users(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming daily active users: tumbling 1-day event-time windows
    with an HLL++ ``approx_count_distinct`` per window — the built-in
    streaming path for the DAU half of the batch
    :func:`~pyperustats_spark.operators.events.active_users` rollup.

    Built-in windowed aggregation on purpose (sketches merge in the
    state store — state per window is one ~KB sketch, not a user set);
    the watermark bounds state exactly as in stream_tumbling_window.
    Accuracy vs the exact batch DAU is property-tested within the
    sketch's rsd in pytest."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("day_start"), "approx_users",
                "n_events")
    )


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over document parquet files — the arriving
    crawl in the recurring-release flow."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def stream_new_documents(stream_docs: DataFrame, corpus: DataFrame,
                         prefix_chars: int | None = None) -> DataFrame:
    """Streaming incremental dedup: documents arriving on a stream are
    anti-joined against the RELEASED corpus's content keys (a
    stream-static left_anti join — Spark broadcasts or re-reads the
    static side per micro-batch, the stream side never buffers), then
    deduped within the stream itself by key via dropDuplicates — the
    streaming analog of
    :func:`~pyperustats_spark.operators.dedup.dedup_incremental`.

    Exactly-once per arriving file comes from the checkpointed file
    source; state is the dropDuplicates key set — 16-byte keys only.
    Unlike the batch form (keep-min-id), the stream keeps the FIRST
    arrival of each new key — the natural streaming tiebreak
    (documented; equal when replay order is id order)."""
    from pyperustats_spark.operators.dedup import content_key

    seen = corpus.select(content_key(prefix_chars).alias("fp")).distinct()
    keyed = stream_docs.withColumn("fp", content_key(prefix_chars))
    return (
        keyed.join(seen, "fp", "left_anti")
        .dropDuplicates(["fp"])
        .select("doc_id", "source", "fp")
    )


def stream_append_ledger(stream_docs: DataFrame, ledger,
                         checkpoint_dir: str):
    """Sink an arriving document stream into a
    :class:`~pyperustats_spark.sources.ledger.CorpusLedger` via
    foreachBatch: each micro-batch folds its distinct content keys and
    winnowed fingerprints into the bucketed ledger tables, so the
    release-chain dedup state stays current AS the crawl lands instead
    of being rebuilt at release time.

    Exactly-once at the ARTIFACT level, stronger than at-least-once
    delivery needs: the ledger's append path anti-joins new keys
    against the table before writing, so a replayed micro-batch
    re-derives keys that are already present and appends nothing —
    idempotent by construction (the streaming sibling of
    stream_into_cache, whose latest-wins read achieves the same end
    for value tables).

    Returns the started StreamingQuery; callers await/stop it."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ledger.append_release(batch_df)

    return (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_contaminated_documents(stream_docs: DataFrame,
                                  corpus: DataFrame,
                                  n_tokens: int = 20,
                                  winnow: int = 5) -> DataFrame:
    """Streaming literal-lift detection: documents arriving on a
    stream emit their doc_id the moment ANY of their winnowed
    fingerprints matches the RELEASED corpus' fingerprint set — the
    streaming form of :func:`~pyperustats_spark.operators.dedup
    .exact_substring_decontaminate` at ``min_shared=1`` (a quarantine
    feed: the contaminated ids are the join key for whatever sink
    holds the docs back from release).

    Plan: fingerprints are a row-local projection on the stream side
    (explode — stateless), the corpus' DISTINCT fingerprint set is
    the static side of a stream-static left_semi join (re-read or
    broadcast per micro-batch; the stream never buffers), and the
    only state is dropDuplicates on the contaminated doc_id — one id
    per contaminated doc, not per fingerprint hit. Counting to a
    min_shared>1 threshold needs a stateful per-doc aggregation;
    that variant belongs in the batch operator at release time."""
    from pyperustats_spark.operators.dedup import winnowed_fingerprints

    corpus_fp = winnowed_fingerprints(
        corpus, n_tokens=n_tokens, winnow=winnow).select("wh").distinct()
    fp = winnowed_fingerprints(stream_docs, n_tokens=n_tokens,
                               winnow=winnow)
    return (
        fp.join(corpus_fp, "wh", "left_semi")
        .dropDuplicates(["doc_id"])
        .select("doc_id")
    )


def stream_manifest_quarantine(stream_docs: DataFrame,
                               manifest: DataFrame) -> DataFrame:
    """Streaming ingest integrity: every ARRIVING document gets the
    tri-state manifest verdict (ok / corrupt / unlisted) as it lands —
    the streaming form of
    :func:`~pyperustats_spark.operators.organizer.manifest_quarantine`
    for the recurring INEI-style ingest (download batches arriving as
    files). A rotted member is flagged in the micro-batch it arrives
    in, never fails the stream, and the verdicts can sink into a
    quarantine cache via :func:`stream_into_cache`.

    Stateless per row after a stream-static left join on the doc id
    (the static manifest is re-read/broadcast per micro-batch; the
    stream side never buffers) — no watermark, no state store.
    ``n_missing`` (listed-but-never-arrived) is inherently a
    batch-close question; compute it with the batch integrity card at
    release time."""
    recomputed = stream_docs.withColumn(
        "content_hash", F.md5(F.col("text")))
    m = manifest.select("doc_id", "expected_hash")
    return (
        recomputed.join(m, "doc_id", "left")
        .withColumn(
            "status",
            F.when(F.col("expected_hash").isNull(), F.lit("unlisted"))
            .when(F.col("content_hash") == F.col("expected_hash"),
                  F.lit("ok"))
            .otherwise(F.lit("corrupt")),
        )
        .select("doc_id", "source", "content_hash", "status")
    )
