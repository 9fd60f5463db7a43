"""Event-stream operators (batch form; streaming variants live in
``pyperustats_spark.streaming``).

The reference processes observation feeds batch-wise with progress
state (INEI downloader/organizer, infogob result pulls). Here the
stream-shaped ``events`` table gets the canonical large-scale
treatments: tumbling-window aggregation, gap-based sessionization, and
per-group top-N — each a single shuffle on its natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window(events: DataFrame, hours: int = 24) -> DataFrame:
    """Tumbling time-window aggregation per event type.

    Batch expression uses date_trunc on the window start so the oracle
    SQL is identical; the streaming variant uses ``F.window`` with a
    watermark (streaming/events.py)."""
    if hours == 24:
        bucket = F.date_trunc("DAY", F.col("ts"))
    elif hours == 1:
        bucket = F.date_trunc("HOUR", F.col("ts"))
    else:
        raise ValueError("batch tumbling_window supports 1h/24h buckets")
    return (
        events.groupBy(bucket.alias("window_start"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            # round(sum,2)/count, never avg(): 2-decimal inputs put plain
            # avg() on round-half boundaries across engines
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias("avg_value"),
            # exact distinct keeps oracle parity; at 100 TB swap for
            # approx_count_distinct (HLL) to avoid the distinct shuffle
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


def assign_sessions(
    events: DataFrame, gap_minutes: int = 30, tiebreak: str = "event_id",
) -> DataFrame:
    """Events + a per-user ``session_seq`` column (the lag + conditional
    cumsum recipe :func:`sessionize` aggregates over, exposed so path
    mining and other per-event session consumers share ONE
    implementation). One shuffle on user_id; integer-microsecond gap
    arithmetic, exact and bit-identical in the DuckDB oracle."""
    if tiebreak is not None and tiebreak not in events.columns:
        raise ValueError(
            f"tiebreak column {tiebreak!r} not in {events.columns}; "
            "pass tiebreak=None to order by ts alone (nondeterministic "
            "on tied timestamps)")
    order = [F.col("ts"), F.col(tiebreak)] if tiebreak else [F.col("ts")]
    w = Window.partitionBy("user_id").orderBy(*order)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
           > gap_minutes * 60_000_000),
        1,
    ).otherwise(0)
    return events.withColumn("session_seq", F.sum(new_sess).over(w_cum))


def assign_sessions_chunked(
    events: DataFrame, gap_minutes: int = 30, tiebreak: str = "event_id",
) -> DataFrame:
    """Skew-split form of :func:`assign_sessions` — identical output
    (property-pinned row-for-row equal), different partitioning: the
    plain form puts EVERY event of a user in one window task, so a
    single mega-user (bot feed, load-test account) is one straggler
    task at any cluster size. Here the per-key linear scan runs in two
    phases, mirroring :func:`peak_concurrency`'s day-partitioned
    carry:

    1. within-(user_id, day) window — the local lag + conditional
       cumsum, so the biggest task holds one user-DAY, not one user;
    2. a per-(user, day) summary table (first_ts, last_ts, local new-
       session count — ONE row per user-day) gets the cross-chunk
       carry: whether each day's first event truly starts a session
       (gap from the PREVIOUS day's last_ts) and the cumulative
       session count of all preceding days, via a window over the
       summary rows only.

    An event's session_seq = local cumsum + (carry − 1 +
    first_is_new): when the day's first event continues yesterday's
    session its provisional local flag collapses, shifting the whole
    day down by one. All integer arithmetic — bit-identical to the
    plain form, tiebreak contract identical (raises on a missing
    column).

    Cost: one extra shuffle of the summary table (tiny) + the join
    back on (user_id, day) — the phase-1 partitioning, so AQE plans a
    co-partitioned join. The phase-1 frame is persisted for its two
    references (event stream + summaries), same discipline as
    peak_concurrency's deltas. Use when the depth axis is skewed (one
    key ≫ others); the plain form wins when keys are uniform."""
    if tiebreak is not None and tiebreak not in events.columns:
        raise ValueError(
            f"tiebreak column {tiebreak!r} not in {events.columns}; "
            "pass tiebreak=None to order by ts alone (nondeterministic "
            "on tied timestamps)")
    order = [F.col("ts"), F.col(tiebreak)] if tiebreak else [F.col("ts")]
    gap_us = gap_minutes * 60_000_000
    base = events.withColumn("_chunk", F.date_trunc("DAY", F.col("ts")))
    w = Window.partitionBy("user_id", "_chunk").orderBy(*order)
    prev_ts = F.lag("ts").over(w)
    new_local = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > gap_us),
        1).otherwise(0)
    loc = base.withColumn(
        "_s_local",
        F.sum(new_local).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).persist()
    summ = loc.groupBy("user_id", "_chunk").agg(
        F.min(F.col("ts")).alias("_first_ts"),
        F.max(F.col("ts")).alias("_last_ts"),
        F.max("_s_local").alias("_n_local"),
    )
    wu = Window.partitionBy("user_id").orderBy("_chunk")
    prev_last = F.lag("_last_ts").over(wu)
    first_new = F.when(
        prev_last.isNull()
        | (F.unix_micros(F.col("_first_ts")) - F.unix_micros(prev_last)
           > gap_us),
        1).otherwise(0)
    adj = summ.select(
        "user_id", "_chunk",
        (F.col("_n_local") - 1 + first_new).alias("_adj"),
        first_new.alias("_first_new"),
    )
    offsets = adj.select(
        "user_id", "_chunk",
        (F.coalesce(
            F.sum("_adj").over(
                wu.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)) - 1 + F.col("_first_new")).alias("_offset"),
    )
    return (
        loc.join(offsets, ["user_id", "_chunk"])
        .withColumn("session_seq", F.col("_s_local") + F.col("_offset"))
        .drop("_chunk", "_s_local", "_offset")
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30, tiebreak: str = "event_id",
    sort: bool = True, chunked: bool = False,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than *gap_minutes*. lag + conditional cumsum over a per-user
    window — one shuffle on user_id, linear within partition.

    *tiebreak* makes the ordering total when two events share a
    timestamp, and the cumsum uses an explicit ROWS frame: the default
    RANGE frame sums over timestamp PEERS, which diverges from the
    row-at-a-time oracle on the first tied (user_id, ts). A missing
    tiebreak column raises — silently degrading to ts-only ordering
    made session splits nondeterministic on tied timestamps; pass
    ``tiebreak=None`` explicitly to accept that.

    ``chunked=True`` swaps the per-user window for the two-phase
    skew-split assigner (:func:`assign_sessions_chunked`) — identical
    output, mega-user-proof partitioning."""
    assign = assign_sessions_chunked if chunked else assign_sessions
    out = (
        assign(events, gap_minutes=gap_minutes, tiebreak=tiebreak)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    return out.orderBy("user_id", "session_seq") if sort else out


def top_session_paths(events: DataFrame, gap_minutes: int = 30,
                      max_events: int = 8, k: int = 25) -> DataFrame:
    """Session path mining: the k most common in-session event-type
    sequences (first *max_events* events of each session, joined with
    '>') — the navigation-pattern rollup a product-analytics pipeline
    derives from the same sessionization as :func:`sessionize`.
    Returns (path, n_sessions, n_users).

    Shape: :func:`assign_sessions` (one user-key shuffle) → per-session
    ordered gather via array_sort over collect_list of (ts, event_id,
    type) structs — bounded by session length, which the gap definition
    bounds in practice; *max_events* truncation keeps path cardinality
    finite so the path rollup's second shuffle carries short strings →
    count + distinct-user per path → TakeOrderedAndProject top-k (no
    global sort). Deterministic: the (ts, event_id) total order makes
    the gathered sequence reproducible, and ties on count break on the
    path string."""
    sess = assign_sessions(events, gap_minutes=gap_minutes)
    paths = (
        sess.groupBy("user_id", "session_seq")
        .agg(F.array_sort(F.collect_list(F.struct(
            "ts", "event_id", "event_type"))).alias("_seq"))
        .select(
            "user_id",
            F.concat_ws(
                ">",
                F.transform(F.slice(F.col("_seq"), 1, max_events),
                            lambda s: s["event_type"]),
            ).alias("path"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"),
             F.count_distinct("user_id").alias("n_users"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(k)
    )


def conversion_lag_stats(events: DataFrame, from_type: str = "view",
                         to_type: str = "purchase") -> DataFrame:
    """Time-to-convert profile: for each user, the lag from their FIRST
    *from_type* event to their first *to_type* event at-or-after it —
    one audited row of (n_users_from, n_converted, conversion_rate,
    p50_lag_us, p90_lag_us). The funnel family's "how fast", next to
    funnel_steps' "how many".

    Two pre-filtered per-user min aggregations (partial, map-side
    combining) joined on the user key, lag in integer microseconds —
    exact percentile interpolation over integers is bit-identical
    cross-engine (the gap-stats class; same single-buffer funnel
    caveat, same approx_percentile swap at 100 TB). conversion_rate
    ships as the RAW int/int quotient. Output is ONE row (audited
    single-partition aggregate, q_orphan_check class)."""
    first_from = (
        events.where(F.col("event_type") == from_type)
        .groupBy("user_id").agg(F.min("ts").alias("_from_ts"))
    )
    tos = events.where(F.col("event_type") == to_type).select(
        "user_id", F.col("ts").alias("_to_ts"))
    lags = (
        first_from.join(tos, "user_id")
        .where(F.col("_to_ts") >= F.col("_from_ts"))
        .groupBy("user_id")
        .agg((F.unix_micros(F.min("_to_ts"))
              - F.unix_micros(F.min("_from_ts"))).alias("_lag_us"))
    )
    n_from = first_from.agg(
        F.count(F.lit(1)).alias("n_users_from"))
    # one percentile buffer for both cuts (array form) — two separate
    # percentile() aggregates each materialize the full lag multiset
    conv = lags.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("_lag_us", F.array(F.lit(0.5), F.lit(0.9)))
        .alias("_p"),
    ).select("n_converted",
             F.element_at("_p", 1).alias("p50_lag_us"),
             F.element_at("_p", 2).alias("p90_lag_us"))
    return n_from.join(conv).select(
        "n_users_from", "n_converted",
        F.try_divide(F.col("n_converted"), F.col("n_users_from"))
        .alias("conversion_rate"),
        "p50_lag_us", "p90_lag_us",
    )


def conversion_lag_stats_approx(events: DataFrame,
                                from_type: str = "view",
                                to_type: str = "purchase",
                                accuracy: int = 10000) -> DataFrame:
    """The 100 TB path for :func:`conversion_lag_stats`: identical
    profile with `approx_percentile` (Greenwald-Khanna quantile summary) — the exact form
    funnels EVERY converting user's lag into one aggregation buffer
    (the whole-population single-group case of the gap-stats funnel);
    sketches merge map-side so the final 1-row aggregate receives
    per-partition sketches, not raw lags. Same cluster-shape-not-
    local-wall trade as the other twins (see working notes). Rank
    error ≤ n/accuracy; engine-specific sketch, so rows-only."""
    first_from = (
        events.where(F.col("event_type") == from_type)
        .groupBy("user_id").agg(F.min("ts").alias("_from_ts"))
    )
    tos = events.where(F.col("event_type") == to_type).select(
        "user_id", F.col("ts").alias("_to_ts"))
    lags = (
        first_from.join(tos, "user_id")
        .where(F.col("_to_ts") >= F.col("_from_ts"))
        .groupBy("user_id")
        .agg((F.unix_micros(F.min("_to_ts"))
              - F.unix_micros(F.min("_from_ts"))).alias("_lag_us"))
    )
    n_from = first_from.agg(
        F.count(F.lit(1)).alias("n_users_from"))
    conv = lags.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.approx_percentile("_lag_us", F.lit(0.5), F.lit(accuracy))
        .cast("double").alias("p50_lag_us"),
        F.approx_percentile("_lag_us", F.lit(0.9), F.lit(accuracy))
        .cast("double").alias("p90_lag_us"),
    )
    return n_from.join(conv).select(
        "n_users_from", "n_converted",
        F.try_divide(F.col("n_converted"), F.col("n_users_from"))
        .alias("conversion_rate"),
        "p50_lag_us", "p90_lag_us",
    )


def top_users_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-K users by total value within each event type — groupBy then
    rank window on the (tiny) aggregate, never on raw events."""
    agg = events.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.col("user_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("event_type", "rank")
    )


def json_props_stats(events: DataFrame) -> DataFrame:
    """Parse the JSON ``props`` column and aggregate the extracted field
    per event type (schema-on-read: ``from_json`` with an explicit
    schema keeps the parse JVM-side and vectorized; at 100 TB prefer
    this over schema inference, which costs a full extra scan)."""
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def approx_distinct_users(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Approximate distinct users per event type via HyperLogLog++
    (``approx_count_distinct``) alongside the event count.

    This is the cardinality probe a 100 TB pipeline runs INSTEAD of
    ``count(distinct user_id)``: HLL sketches merge in the partial-agg
    combiner, so the shuffle carries one ~KB sketch per (type,
    partition) instead of every distinct user id — exact distinct on a
    high-cardinality key shuffles the whole key set. Accuracy is
    property-tested against the exact count (rows-only path: sketch
    estimates are engine-specific, so no cross-engine value oracle)."""
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def funnel_steps(events: DataFrame,
                 steps: tuple[str, ...] = ("view", "click", "purchase"),
                 within_minutes: int | None = None) -> DataFrame:
    """Strictly-ordered funnel: how many users reach each step, where a
    step only counts if it happens AFTER the user's (earliest) previous
    step — the product-analytics conversion funnel. With
    *within_minutes*, each step must also land within that window of
    the previous one (session-bounded conversion).

    Shape: per-step conditional min-timestamp aggregations chained by
    equi-joins on the 8-byte user id (len(steps)-1 joins, AQE-decided;
    each side shrinks monotonically — survivors only). The per-step
    totals are 1-row aggregates unioned at the end (audited
    SINGLE_PART, like q6's global aggregate). No windows, no
    cross-user state."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    # every non-final survivor frame is referenced twice (the next
    # step's join + its own count row) and Catalyst re-runs the whole
    # upstream chain per reference — unpersisted, step i's aggregate
    # executed (len(steps) - i) times (optimization r11: 6 -> 3
    # pruned events scans for the 3-step funnel). Narrow
    # (user_id, min ts) rows only; lifetime caveat as
    # perplexity_buckets (bench clears per query).
    cur = (
        events.where(F.col("event_type") == steps[0])
        .groupBy("user_id").agg(F.min("ts").alias("_t"))
        .persist()
    )
    reached = [cur]
    for i, step in enumerate(steps[1:], start=1):
        gate = F.col("ts") > F.col("_t")
        if within_minutes is not None:
            gate = gate & (
                F.col("ts") <= F.col("_t")
                + F.expr(f"INTERVAL {int(within_minutes)} MINUTES"))
        nxt = (
            events.where(F.col("event_type") == step)
            .join(cur, "user_id")
            .where(gate)
            .groupBy("user_id").agg(F.min("ts").alias("_t"))
        )
        if i < len(steps) - 1:
            nxt = nxt.persist()
        reached.append(nxt)
        cur = nxt
    counts = None
    for i, (step, df) in enumerate(zip(steps, reached), start=1):
        c = df.agg(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        counts = c if counts is None else counts.unionAll(c)
    return counts.orderBy("step_idx")


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Daily cohort retention: cohort = each user's first active day;
    for every (cohort_day, day_offset) count the users active again
    that day — the classic retention triangle.

    One distinct over (user, day) — the shuffle carries 12-byte pairs,
    never events — then the first-day aggregate and an AQE-decided
    join back on the user id; (user, day) is unique per (cohort,
    offset), so the final rollup is a plain count, no second
    distinct."""
    days = events.select(
        "user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def event_transitions(events: DataFrame, sort: bool = True) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every (prev_type → next_type) step count occurrences
    and the share of all transitions leaving prev_type (raw int/int
    division — bit-identical cross-engine).

    The lag window partitions by user — thousands of rows per user at
    most, never a global sort — and the rollup output is |event types|²
    rows, so the share window runs on an already-tiny frame. One
    user-key shuffle + one pair-key shuffle regardless of corpus
    size."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n"))
    share = F.col("n") / F.sum("n").over(Window.partitionBy("prev_type"))
    out = counts.withColumn("share", share)
    return out.orderBy("prev_type", "next_type") if sort else out


def burst_profile(events: DataFrame, window_seconds: int = 3600,
                  burst_threshold: int = 5,
                  sort: bool = True) -> DataFrame:
    """Bot/burst diagnostic per user: the maximum number of events the
    user fired inside any trailing *window_seconds* window, and a flag
    at *burst_threshold* — the standard rate-limit / automation signal
    on an event stream.

    The range-frame count is partitioned by user (per-user rows only,
    linear per partition after ONE user-key shuffle) and every value
    is an integer — deterministic cross-engine, no float rounding
    anywhere."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-window_seconds, 0)
    )
    per_event = events.select(
        "user_id", F.count(F.lit(1)).over(w).alias("_in_window"))
    out = (
        per_event.groupBy("user_id")
        .agg(F.max("_in_window").alias("max_burst"),
             F.count(F.lit(1)).alias("n_events"))
        .withColumn("is_burst", F.col("max_burst") >= burst_threshold)
    )
    return out.orderBy("user_id") if sort else out


def burst_profile_chunked(events: DataFrame, window_seconds: int = 3600,
                          burst_threshold: int = 5,
                          sort: bool = True) -> DataFrame:
    """Depth-skew twin of :func:`burst_profile` — identical output
    (property-pinned row-for-row equal), different partitioning: the
    plain form's trailing range-count puts a user's EVERY event in one
    window task, so a single mega-user (bot feed) is one straggler at
    any cluster size. Here the scan chunks on the time axis with
    GHOST rows instead of a carry (the trailing count needs the raw
    events in [t−W, t], not a summable prefix, so the sessionize
    summary-carry shape doesn't apply):

    1. events partition into (user, chunk) with chunk_seconds =
       max(W, 86400) — a frame [t−W, t] therefore spans at most ONE
       chunk boundary;
    2. each chunk's trailing W seconds of events are duplicated into
       the NEXT chunk as ghosts — frame fillers that are never emitted
       (the one boundary a frame can cross is now materialized
       locally);
    3. the same integer range-frame count runs within (user, chunk)
       on the augmented rows; ghosts are dropped after counting.

    Exactness: counting is order-insensitive integer work, and
    real ∪ ghost rows of a chunk are exactly the events a frame
    rooted in that chunk can see, so every per-event count is
    identical to the plain form's. Ghost volume is bounded by the
    per-(user, day) event count in the trailing W seconds — the same
    factor the biggest task shrinks by. Use when the depth axis is
    skewed; the plain form wins when keys are uniform."""
    chunk_s = max(window_seconds, 86_400)
    sec = F.col("ts").cast("long")
    base = events.select(
        "user_id", sec.alias("_sec"),
        F.floor(sec / chunk_s).alias("_chunk"))
    ghosts = (
        base.where(F.col("_sec")
                   >= (F.col("_chunk") + 1) * chunk_s - window_seconds)
        .select("user_id", "_sec",
                (F.col("_chunk") + 1).alias("_chunk"))
        .withColumn("_ghost", F.lit(1)))
    aug = base.withColumn("_ghost", F.lit(0)).unionByName(ghosts)
    w = (
        Window.partitionBy("user_id", "_chunk")
        .orderBy("_sec")
        .rangeBetween(-window_seconds, 0)
    )
    per_event = (
        aug.select("user_id", "_ghost",
                   F.count(F.lit(1)).over(w).alias("_in_window"))
        .where(F.col("_ghost") == 0)
    )
    out = (
        per_event.groupBy("user_id")
        .agg(F.max("_in_window").alias("max_burst"),
             F.count(F.lit(1)).alias("n_events"))
        .withColumn("is_burst", F.col("max_burst") >= burst_threshold)
    )
    return out.orderBy("user_id") if sort else out


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  sort: bool = True) -> DataFrame:
    """Session-size distribution over the whole stream: for every
    session size (events per session) the number of sessions and the
    mean session duration — the engagement histogram product analytics
    reads off a sessionized stream.

    Composes :func:`sessionize` with ``sort=False`` (the mid-pipeline
    presentation sort would be destroyed by the rollup shuffle
    anyway). Durations aggregate as exact integer microseconds; the
    mean divides the exact sum by the count and scales by a constant —
    identical IEEE steps in the oracle."""
    s = sessionize(events, gap_minutes=gap_minutes, sort=False)
    dur_us = (F.unix_micros(F.col("session_end"))
              - F.unix_micros(F.col("session_start")))
    out = (
        s.groupBy("n_events")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            (F.sum(dur_us) / F.count(F.lit(1)) / F.lit(1e6))
            .alias("mean_duration_s"),
        )
    )
    return out.orderBy("n_events") if sort else out


def last_touch_attribution(events: DataFrame,
                           conv_type: str = "purchase",
                           touch_type: str = "view",
                           window_minutes: int = 1440,
                           sort: bool = True) -> DataFrame:
    """Last-touch attribution: for every conversion event, the most
    recent *touch_type* event by the same user STRICTLY before it, and
    whether that touch falls inside the attribution window.

    The carry is a conditional running max over a per-user ordered
    window (frame ends at 1 PRECEDING, so a same-timestamp touch
    ordered after the conversion cannot claim it) — one user-key
    shuffle, linear per partition, integer microsecond comparisons
    only."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    last_touch = F.max(
        F.when(F.col("event_type") == touch_type, F.col("ts"))).over(w)
    out = (
        events.select("event_id", "user_id", "ts", "event_type",
                      last_touch.alias("touch_ts"))
        .where(F.col("event_type") == conv_type)
        .select(
            "event_id", "user_id", F.col("ts").alias("conv_ts"), "touch_ts",
            (
                F.col("touch_ts").isNotNull()
                & (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("touch_ts"))
                   <= window_minutes * 60_000_000)
            ).alias("attributed"),
        )
    )
    return out.orderBy("event_id") if sort else out


def active_users(events: DataFrame, window_days: int = 7,
                 sort: bool = True) -> DataFrame:
    """DAU / rolling-WAU / stickiness per day: daily active users, the
    distinct users active in the trailing *window_days* window, and
    DAU/WAU (raw int/int quotient).

    Distinct-in-a-sliding-window cannot be a window aggregate (no
    DISTINCT over frames) — the scalable shape is the replicate-
    forward trick: each distinct (user, day) pair fans out onto the
    *window_days* days it keeps the user active, then one distinct +
    count per day. The fan-out multiplies 12-byte pairs by a constant
    — bounded and shuffle-friendly at any event volume (events
    collapse to distinct pairs FIRST, so the multiplier never touches
    raw event rows)."""
    days = events.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    span = (
        days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"),
                           F.date_add(F.col("day"), window_days - 1))
            ).alias("day"),
        )
        .distinct()
        .groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    )
    out = (
        dau.join(span, "day")
        .select("day", "dau", "wau",
                (F.col("dau") / F.col("wau")).alias("stickiness"))
    )
    return out.orderBy("day") if sort else out


def power_user_concentration(events: DataFrame, n_tiles: int = 10,
                             sort: bool = True) -> DataFrame:
    """Activity concentration (Pareto/Lorenz view): users ranked by
    event count into *n_tiles* exact global tiles, with each tile's
    user count, event count, event share, and cumulative share from
    the heaviest tile down — "the top 10% of users produce X% of
    events".

    Events first collapse to per-user counts (the only full-volume
    shuffle); the tile assignment uses the scale-safe
    :func:`~pyperustats_spark.operators.relational.global_ntile`
    (range partition + id-derived offsets, NO partition-less window
    over users); the share windows then run on the n_tiles-row
    rollup — an audited tiny-frame single partition."""
    from pyperustats_spark.operators.relational import global_ntile

    # deliberately NOT persisted (A/B'd r11): caching the per-user
    # aggregate for global_ntile's two references measured SLOWER at
    # both sf0.1 (1.2 -> 1.8 s) and the 100x depth set (1.9 -> 2.7 s)
    # — the events scan prunes to user_id only and the partial
    # aggregate is map-side, so re-execution is cheaper than the
    # materialization barrier. global_ntile's identical-subtree
    # condition holds because every column is a sort key (the
    # q_customer_quartiles case).
    per_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"))
    tiled = global_ntile(per_user,
                         [F.desc("n_events"), F.asc("user_id")],
                         n_tiles=n_tiles)
    per_tile = tiled.groupBy(F.col("_tile").alias("tile")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("n_events"))
    w_all = Window.partitionBy()
    w_cum = Window.partitionBy().orderBy("tile") \
        .rowsBetween(Window.unboundedPreceding, 0)
    out = per_tile.select(
        "tile", "n_users", "n_events",
        (F.col("n_events") / F.sum("n_events").over(w_all)).alias("share"),
        (F.sum("n_events").over(w_cum) / F.sum("n_events").over(w_all))
        .alias("cum_share"),
    )
    return out.orderBy("tile") if sort else out


def bot_regularity(events: DataFrame, min_gaps: int = 20,
                   cv_pct: int = 10, sort: bool = True) -> DataFrame:
    """Automation/bot heuristic: flag users whose inter-event gaps are
    suspiciously REGULAR — coefficient of variation ≤ *cv_pct*% over at
    least *min_gaps* gaps (human traffic is bursty, cron-like traffic
    is metronomic) — a standard crawl-hygiene filter for training-data
    event feeds.

    The flag never touches a float: with c gaps (whole seconds),
    S = Σg, Q = Σg², cv ≤ τ ⇔ 10000·(c·Q − S²) ≤ cv_pct²·S², compared
    in DECIMAL(38,0) (HUGEINT in the oracle) — ≤ so the all-equal-gaps
    chain (σ = 0, including all-zero gaps) flags. The reported cv
    sqrt(cQ−S²)/S is a derived double from those exact integers and
    ships RAW (NULL when S = 0). One shuffle on user_id; the gap
    window shares the groupBy's partitioning."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = (
        events.select(
            "user_id",
            (us - F.lag(us).over(w)).alias("_dus"),
        )
        .where(F.col("_dus").isNotNull())
        .select("user_id", F.expr("_dus DIV 1000000").alias("g"))
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    s = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("g").alias("_s"),
        F.sum(dec(F.col("g")) * F.col("g")).alias("_q"),
    ).where(F.col("n_gaps") >= min_gaps)
    var_c2 = dec(F.col("n_gaps")) * F.col("_q") - dec(F.col("_s")) * F.col("_s")
    out = s.select(
        "user_id", "n_gaps",
        (F.col("_s") / F.col("n_gaps")).alias("mean_gap_s"),
        F.when(F.col("_s") != 0,
               F.sqrt(var_c2.cast("double"))
               / F.col("_s").cast("double")).alias("cv"),
        (F.lit(10000) * var_c2
         <= F.lit(cv_pct * cv_pct) * dec(F.col("_s")) * F.col("_s"))
        .cast("bigint").alias("is_bot"),
    )
    return out.orderBy("user_id") if sort else out


def peak_concurrency(events: DataFrame, gap_minutes: int = 30,
                     sort: bool = True) -> DataFrame:
    """Daily peak concurrent sessions (the capacity-planning number):
    sessionize, explode each session into ±1 boundary deltas, and run
    the classic sweep-line — but NOT as one global ordered window (a
    partition-less window executes on a single task at ANY data size).
    Instead day-partitioned with a bounded carry table: per-day running
    sum of deltas plus the cumulative net of all PRECEDING days (a side
    frame bounded by the date range — the same prefix-table idiom as
    ``layout.histogram_ntile``). All integer arithmetic, deterministic
    under ties (equal (ts, d) rows are interchangeable in a cumsum).

    Closed-interval semantics: a session ending at t overlaps one
    starting at t (+1 sorts before −1 on timestamp ties). Days with no
    session boundary are absent from the output — their concurrency is
    flat at the carry level."""
    s = sessionize(events, gap_minutes=gap_minutes, sort=False)
    deltas = (
        s.select(F.col("session_start").alias("ts"), F.lit(1).alias("d"))
        .unionAll(
            s.select(F.col("session_end").alias("ts"), F.lit(-1).alias("d")))
        .withColumn("day", F.date_trunc("DAY", F.col("ts")))
        # referenced by the carry table AND the running sweep —
        # persist so sessionization runs once (2 rows per session)
        .persist()
    )
    day_net = deltas.groupBy("day").agg(F.sum("d").alias("_net"))
    wd = Window.orderBy("day")
    carry = day_net.select(
        "day",
        F.coalesce(
            F.sum("_net").over(wd.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_carry"),
    )
    wr = (Window.partitionBy("day").orderBy(F.col("ts"), F.desc("d"))
          .rowsBetween(Window.unboundedPreceding, 0))
    running = (
        deltas.join(F.broadcast(carry), "day")
        .select("day", (F.sum("d").over(wr) + F.col("_carry")).alias("_run"))
    )
    out = running.groupBy(F.col("day").alias("date")).agg(
        F.max("_run").cast("bigint").alias("peak_concurrency"))
    return out.orderBy("date") if sort else out


def volume_anomalies(events: DataFrame, trailing: int = 7,
                     sigmas: int = 3, sort: bool = True) -> DataFrame:
    """Per-type daily-volume control chart: flag days whose event
    count deviates more than *sigmas* standard deviations from the
    trailing *trailing*-day window — the ops-monitoring primitive for
    ingest feeds (a collapsed crawler or a bot flood both trip it).

    The flag is computed WITHOUT ever materializing μ or σ: with
    integer daily counts, c = window size, S = Σx, Q = Σx²,
    (x−μ)² > s²σ²  ⇔  (c·x − S)² > s²·(c·Q − S²) — an EXACT integer
    comparison (DECIMAL(38,0) here, HUGEINT in the oracle), so the
    flag can never flake on a boundary the way a rounded z-score
    would. The reported z-score (cx−S)/sqrt(cQ−S²) is a derived
    double from those exact integers and ships RAW. Days with an
    incomplete trailing window (first *trailing* days of a type) emit
    NULL flag/z. One shuffle on event_type; the per-type day frame is
    bounded by the date range."""
    d = events.groupBy(
        F.col("event_type"),
        F.date_trunc("DAY", F.col("ts")).alias("date"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (Window.partitionBy("event_type").orderBy("date")
         .rowsBetween(-trailing, -1))

    def dec(c):
        return c.cast("decimal(38,0)")

    stats = d.select(
        "event_type", "date", "n",
        F.count(F.lit(1)).over(w).alias("_c"),
        F.sum("n").over(w).alias("_s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("_q"),
    )
    dev = dec(F.col("_c")) * F.col("n") - dec(F.col("_s"))
    var_c2 = (dec(F.col("_c")) * F.col("_q")
              - dec(F.col("_s")) * F.col("_s"))
    out = stats.select(
        "event_type", "date", "n",
        # explicit zero-variance guard in BOTH engines (DuckDB's
        # double-by-zero semantics differ from try_divide's NULL)
        F.when((F.col("_c") == trailing) & (var_c2 != F.lit(0)),
               dev.cast("double")
               / F.sqrt(var_c2.cast("double"))).alias("z"),
        F.when(F.col("_c") == trailing,
               (dev * dev > F.lit(sigmas * sigmas) * var_c2)
               .cast("bigint")).alias("is_anomaly"),
    )
    return out.orderBy("event_type", "date") if sort else out


def status_history_scd2(events: DataFrame, sort: bool = True) -> DataFrame:
    """Slowly-changing-dimension (type 2) history of each user's event
    status: consecutive same-type events collapse into one validity
    interval [valid_from, valid_to) with the next run's start as the
    exclusive end (NULL = current) — the gaps-and-islands build every
    warehouse needs to turn an event feed into a dimension table
    (cache_merge_upsert is the SCD1 counterpart).

    Run boundaries via lag ≠ current; run ids via an ordered
    cumulative sum of the 0/1 change flags (integer, deterministic);
    intervals via min(ts) per run + lead over runs. Everything rides
    the user-key partitioning: one shuffle, three windows and a
    groupBy all on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "ts", "event_id", F.col("event_type").alias("status"),
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")), 1
        ).otherwise(0).alias("_chg"),
    )
    wc = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0))
    runs = flagged.select(
        "user_id", "ts", "status",
        F.sum("_chg").over(wc).alias("run_seq"),
    )
    iv = runs.groupBy("user_id", "run_seq", "status").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("run_seq")
    out = iv.select(
        "user_id", "run_seq", "status", "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        "n_events",
    )
    return out.orderBy("user_id", "run_seq") if sort else out


def rfm_scores(events: DataFrame, event_type: str = "purchase",
               n_tiles: int = 4, sort: bool = True) -> DataFrame:
    """Classic RFM segmentation: per purchasing user, recency (days
    since last purchase, vs the corpus max purchase date), frequency
    (purchase count), monetary (total spend), each scored into exact
    global quartiles (1..n_tiles, 4 = best: most recent / most
    frequent / highest spend) plus the concatenated "444"-style
    segment label.

    Determinism: monetary accumulates as integer CENTS (bigint — the
    2-decimal grid recovery), recency/frequency are integers, and every
    tile order carries user_id as the total-order tiebreak, so both
    engines rank identical bits. Tile assignment uses
    :func:`~pyperustats_spark.operators.layout.histogram_ntile`
    (rank derived from VALUES) — NOT global_ntile, whose two exchange
    references mis-rank under AQE when the frame carries payload
    columns beyond the sort keys (the CLAUDE.md exchange-reuse trap;
    this frame carries all three metrics at once). Scale shape: one
    full-volume shuffle (events → per-user aggregate), then three
    histogram-ntile passes over the per-user frame, each one hash
    shuffle with a bucket-space-bounded broadcast side table."""
    from pyperustats_spark.operators.layout import histogram_ntile

    p = events.where(F.col("event_type") == event_type)
    ref = p.agg(F.max(F.to_date("ts")).alias("_ref"))
    per_user = (
        p.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("_mc"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.datediff(F.col("_ref"), F.col("_last")).cast("bigint")
            .alias("recency_days"),
            "frequency",
            "_mc",
        )
        .withColumn("_negr", -F.col("recency_days"))
        # persisted: histogram_ntile references its input TWICE (counts
        # side table + ranked join) and three chained passes would
        # otherwise re-execute the events aggregate up to 2^3 times —
        # Catalyst does not dedupe common subplans (CLAUDE.md)
        .persist()
    )
    # buckets are monotone coarsenings of each tile's leading sort key
    # (recency/frequency: the bounded integer itself; cents: $100 bins).
    # Each intermediate is persisted (optimization r11): histogram_
    # ntile references its input twice (counts side + ranked join),
    # so chaining three passes re-executed pass 1's window+join 4×
    # and pass 2's 2× off the cached per_user (7 window executions
    # for 3 passes); persisting the narrow per-user intermediates
    # makes it 3 (A/B at sf0.1: 8.9→5.2 s cold, 3.6→3.3 s warm,
    # rows identical). Same lifetime caveat as per_user above.
    t = histogram_ntile(per_user, F.col("_negr"),
                        [F.col("_negr"), F.col("user_id")],
                        n_tiles, out_col="r_score").persist()
    t = histogram_ntile(t, F.col("frequency"),
                        [F.col("frequency"), F.col("user_id")],
                        n_tiles, out_col="f_score").persist()
    t = histogram_ntile(t, F.floor(F.col("_mc") / 10000),
                        [F.col("_mc"), F.col("user_id")],
                        n_tiles, out_col="m_score")
    out = t.select(
        "user_id",
        "recency_days",
        "frequency",
        (F.col("_mc").cast("double") / F.lit(100.0)).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.concat(F.col("r_score").cast("string"),
                 F.col("f_score").cast("string"),
                 F.col("m_score").cast("string")).alias("rfm"),
    )
    return out.orderBy("user_id") if sort else out


def first_touch_attribution(events: DataFrame,
                            conv_type: str = "purchase",
                            touch_type: str = "view",
                            window_minutes: int = 1440,
                            sort: bool = True) -> DataFrame:
    """First-touch attribution: for every conversion, the EARLIEST
    *touch_type* event inside the attribution window before it —
    credit-to-origin, the complement of
    :func:`last_touch_attribution`'s credit-to-closer.

    The window-bounded earliest touch is a conditional min over a
    RANGE frame in integer microseconds ([-window, -1] relative to the
    conversion — a same-microsecond touch cannot claim it), so the
    window bound lives in the frame itself rather than a post-filter.
    One user-key shuffle, integer comparisons only."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-window_minutes * 60_000_000, -1)
    )
    first_touch = F.min(
        F.when(F.col("event_type") == touch_type, F.col("ts"))).over(w)
    out = (
        events.select("event_id", "user_id", "ts", "event_type",
                      first_touch.alias("touch_ts"))
        .where(F.col("event_type") == conv_type)
        .select("event_id", "user_id", F.col("ts").alias("conv_ts"),
                "touch_ts",
                F.col("touch_ts").isNotNull().alias("attributed"))
    )
    return out.orderBy("event_id") if sort else out


def inter_event_gap_stats(events: DataFrame,
                          sort: bool = True) -> DataFrame:
    """Inter-event gap profile per event type: median and p90 of the
    within-user gaps (integer microseconds), plus the gap count — the
    cadence fingerprint that separates organic usage from schedulers.

    Gaps come from one per-user lag window over the SAME (ts,
    event_id) total order as sessionize; the grouped exact percentiles
    interpolate INTEGER microsecond values — identical arithmetic in
    both engines (the stats_profile/mad class). Exact `percentile`
    funnels every gap of a type into one aggregation buffer — the
    100 TB path is :func:`inter_event_gap_stats_approx` (same profile,
    Greenwald-Khanna approx percentiles)."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gaps = events.select(
        "event_type",
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).alias("_gap"),
    ).where(F.col("_gap").isNotNull())
    # array-of-fractions percentile: one value buffer for both cuts
    out = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.percentile("_gap", F.array(F.lit(0.5), F.lit(0.9)))
        .alias("_p"),
    ).select("event_type", "n_gaps",
             F.element_at("_p", 1).alias("p50_gap_us"),
             F.element_at("_p", 2).alias("p90_gap_us"))
    return out.orderBy("event_type") if sort else out


def inter_event_gap_stats_approx(events: DataFrame,
                                 accuracy: int = 10000,
                                 sort: bool = True) -> DataFrame:
    """The 100 TB path for :func:`inter_event_gap_stats`: identical
    (event_type, n_gaps, p50_gap_us, p90_gap_us) profile with
    `approx_percentile` (Greenwald-Khanna quantile summary) in place of exact `percentile`.
    With ~5 event types the exact form funnels EVERY within-user gap of
    a type into one aggregation buffer — a per-group single-task funnel
    that dies long before 100 TB; sketches merge map-side, so the lag
    window's user-key shuffle stays the only data-sized exchange and
    the percentile pass is a real partial aggregation at any scale.
    Rank error ≤ n/accuracy over integer microseconds (property-tested
    against the exact profile); engine-specific sketch, so rows-only —
    no cross-engine oracle."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gaps = events.select(
        "event_type",
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).alias("_gap"),
    ).where(F.col("_gap").isNotNull())
    out = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.approx_percentile("_gap", F.lit(0.5), F.lit(accuracy))
        .cast("double").alias("p50_gap_us"),
        F.approx_percentile("_gap", F.lit(0.9), F.lit(accuracy))
        .cast("double").alias("p90_gap_us"),
    )
    return out.orderBy("event_type") if sort else out


def cms_build(events: DataFrame, key_col: str = "user_id",
              depth: int = 4, width: int = 256) -> DataFrame:
    """Count-min sketch of *key_col* frequencies: a depth×width
    counter table — the point-frequency member of the mergeable-
    sketch family (HLL for distinct counts, KMV for set overlap, GK
    for quantiles, CMS for per-key counts). Returns (row, bucket, c).

    Each input row increments one bucket per hash row
    (``xxhash64(key, row) mod width`` — row-local JVM expressions);
    the groupBy's map-side partial aggregation collapses every task's
    contribution to ≤ depth·width counters before the shuffle, so the
    ONLY thing that ever moves is the fixed-size counter table — no
    per-key state anywhere, which is the 100 TB point: frequency
    estimates over an unbounded key domain in O(depth·width) memory,
    and sketches of corpus shards union+groupBy-merge exactly.
    Estimates via :func:`cms_estimate` are biased UP only:
    true ≤ est ≤ true + εN with ε ≈ e/width at confidence
    1 − e^−depth (Cormode & Muthukrishnan)."""
    pairs = events.select(F.explode(F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            F.pmod(F.xxhash64(F.col(key_col), F.lit(r)),
                   F.lit(width)).alias("bucket"))
        for r in range(depth)
    ])).alias("p")).select("p.row", "p.bucket")
    return pairs.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("c"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point-frequency estimates for *keys* from a :func:`cms_build`
    sketch: est = min over hash rows of the key's counter. The sketch
    (≤ depth·width rows) broadcasts; only the key list shuffles for
    the final min-groupBy. Same (depth, width) as the build or the
    bucket addressing is garbage."""
    probes = keys.select(key_col, F.explode(F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            F.pmod(F.xxhash64(F.col(key_col), F.lit(r)),
                   F.lit(width)).alias("bucket"))
        for r in range(depth)
    ])).alias("p")).select(key_col, "p.row", "p.bucket")
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"],
                         "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))


def heavy_hitters_sketch_eval(events: DataFrame,
                              key_col: str = "user_id", k: int = 10,
                              depth: int = 4,
                              width: int = 256) -> DataFrame:
    """In-engine CMS calibration (the dedup_minhash_eval pattern):
    take the exact top-*k* keys, re-estimate their counts from the
    sketch, and report per-key (key, exact_count, est_count,
    overestimate) plus the ε·N error budget the CMS guarantee allows.
    At 100 TB the exact pass is the expensive baseline this eval
    exists to retire: candidate keys would come from a cheap coarse
    pass and ONLY the sketch would price them. Rows-only (sketch
    internals have no SQL oracle); the overestimate-within-budget and
    never-underestimates invariants are pinned in pytest."""
    exact = (
        events.groupBy(F.col(key_col)).agg(
            F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.col(key_col))
        .limit(k)
    )
    # the sketch is depth·width counters — an O(small) driver transfer
    # (the IVF-centroid budget class), turned into per-hash-row literal
    # maps so the estimate is a row-local expression and the exact
    # aggregate is referenced exactly ONCE (a DataFrame-join estimate
    # would re-execute it as its own probe source — the CLAUDE.md
    # common-subplan rule)
    sk = cms_build(events, key_col, depth=depth, width=width).collect()
    by_row: dict[int, dict[int, int]] = {}
    for r in sk:
        by_row.setdefault(int(r["row"]), {})[int(r["bucket"])] = int(r["c"])
    est = F.least(*[
        F.coalesce(
            F.element_at(
                F.map_from_arrays(
                    F.array(*[F.lit(b) for b in sorted(by_row.get(r, {0: 0}))]),
                    F.array(*[F.lit(by_row.get(r, {0: 0})[b])
                              for b in sorted(by_row.get(r, {0: 0}))])),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(r)),
                       F.lit(width)).cast("int")),
            F.lit(0))
        for r in range(depth)
    ]).cast("bigint")
    return (
        exact.select(
            key_col, "exact_count", est.alias("est_count"),
            (est - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), F.col(key_col))
    )


def hll_distinct_rollup(events: DataFrame, lg_k: int = 12,
                        sort: bool = True) -> DataFrame:
    """Monthly distinct users per event type via MERGED daily HLL
    sketches (Apache DataSketches, `hll_sketch_agg`/`hll_union_agg`),
    reported against the exact re-scan: (month, event_type, est_users,
    exact_users, rel_err).

    This is the re-aggregation contract that makes sketches the 100 TB
    distinct-count path: daily shards each keep an O(2^lg_k) register
    table, months (quarters, years, all-time) derive by UNIONING the
    stored sketches — no re-scan of raw events, and union is exact on
    the register level (element-wise max), so rolling up daily
    sketches yields the IDENTICAL estimate the month-level sketch
    would give (pinned in pytest — the mergeability invariant). Std
    error ≈ 1.04/√2^lg_k ≈ 1.6 % at the default lg_k = 12.

    The exact side re-groups the raw events (the expensive baseline
    this operator exists to retire); both sides are leaf-table scans,
    so the double reference re-reads the parquet, never a computed
    chain. rel_err = (est − exact)/exact, int/int IEEE division
    shipped raw. Rows-only (sketch registers have no SQL oracle)."""
    day = F.date_trunc("day", F.col("ts"))
    month = F.date_trunc("month", F.col("_day"))
    daily = (
        events.select("event_type", day.alias("_day"), "user_id")
        .groupBy("event_type", "_day")
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("_sk"))
    )
    merged = (
        daily.groupBy("event_type", month.alias("month"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("_sk"))
             .alias("est_users"))
    )
    exact = (
        events.groupBy("event_type",
                       F.date_trunc("month", F.col("ts")).alias("month"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    out = (
        merged.join(exact, ["event_type", "month"])
        .select(
            "month", "event_type", "est_users", "exact_users",
            ((F.col("est_users") - F.col("exact_users"))
             / F.col("exact_users")).alias("rel_err"),
        )
    )
    return out.orderBy("month", "event_type") if sort else out


def kll_value_quantiles(events: DataFrame, k: int = 200,
                        qs: tuple = (0.05, 0.5, 0.9, 0.99),
                        sort: bool = True) -> DataFrame:
    """Per-event-type value quantiles from MERGED daily KLL sketches
    (Apache DataSketches — the real KLL, unlike `approx_percentile`
    which is a Greenwald-Khanna summary), self-calibrated against the
    raw data: (event_type, quantile, est_value, rank_abs_err).

    Rollup shape: each (type, day) keeps one O(k) sketch;
    the per-type sketch derives by folding the stored daily sketches
    with `kll_sketch_merge_double` (pyspark exposes merge as a BINARY
    scalar, not an aggregate, so the fold is `F.aggregate` over a
    collected sketch array — TWO-LEVEL, day → month → total, bounding
    every array at ≤31 or months-of-history entries of a few KB each,
    never row-count- or days-sized). At 100 TB the daily sketches are the stored
    artifact and quantiles over any date range are a driver-side fold —
    no raw re-scan.

    Calibration is in-engine (the heavy_hitters_sketch_eval pattern):
    the tiny (type, q, est) frame broadcast-joins back to events and
    rank_abs_err = |count(value ≤ est)/count − q| — the exact rank
    error, whose ≤ ~1.65 %·(2-sided) bound at k = 200 is pinned in
    pytest. int/int division ships raw. Rows-only."""
    day = F.date_trunc("day", F.col("ts"))
    daily = (
        events.select("event_type", day.alias("_day"), "value")
        .groupBy("event_type", "_day")
        .agg(F.kll_sketch_agg_double("value", F.lit(k)).alias("_sk"))
    )

    def fold(df, keys):
        # binary merge via F.aggregate over the collected array — the
        # fold is TWO-LEVEL (day → month → total) so no collected
        # array ever exceeds 31 entries at level 1 or months-of-
        # history at level 2 (a single-level fold would gather one
        # array of ALL days per type: ~36k sketches × O(k) bytes per
        # century — a per-row memory hazard, not a shuffle one)
        g = df.groupBy(*keys).agg(F.collect_list("_sk").alias("_sks"))
        return g.select(
            *keys,
            F.aggregate(
                F.slice("_sks", 2, F.size("_sks")),
                F.element_at("_sks", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("_sk"),
        )

    monthly = fold(
        daily.select("event_type",
                     F.date_trunc("month", "_day").alias("_month"),
                     "_sk"),
        ["event_type", "_month"])
    merged = fold(monthly, ["event_type"])
    est = merged.select(
        "event_type",
        F.explode(F.array(*[
            F.struct(
                F.lit(float(q)).alias("quantile"),
                F.kll_sketch_get_quantile_double("_sk", F.lit(float(q)))
                .alias("est_value"))
            for q in qs
        ])).alias("_e"),
    ).select("event_type", "_e.quantile", "_e.est_value")
    ranked = (
        events.select("event_type", "value")
        .join(F.broadcast(est), "event_type")
        .groupBy("event_type", "quantile", "est_value")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("est_value"), 1)
                  .otherwise(0)).alias("_n_le"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "event_type", "quantile", "est_value",
            F.abs(F.col("_n_le") / F.col("_n") - F.col("quantile"))
            .alias("rank_abs_err"),
        )
    )
    return (ranked.orderBy("event_type", "quantile")
            if sort else ranked)


def activity_powerlaw_fit(events: DataFrame, key_col: str = "user_id",
                          dmin: int = 1) -> DataFrame:
    """Discrete power-law exponent of the per-key activity
    distribution via the Clauset–Shalizi–Newman continuous-MLE
    approximation on the tail d ≥ *dmin*:
    α = 1 + n_tail / Σᵢ ln(dᵢ / (d_min − ½)) — the one-row data card
    that says whether activity is heavy-tailed (α ≲ 2.5: a few whales
    dominate → plan for skew: salting, max-bucket guards) or
    light-tailed. Returns (n_keys, total_events, max_events,
    mean_events, alpha); n_keys/totals describe the TAIL that was fit.
    The continuous approximation carries a known positive bias of
    O(1/dmin) at small dmin (pytest pins recovery within ±0.15 at
    dmin = 10 on a planted α = 2.5 tail); dmin = 1 is still the useful
    whole-distribution skew summary, just not an unbiased exponent.

    Determinism: per-key counts are exact integers; each ln is
    snapped to the 1e-6 grid and the grid sum is itself re-rounded to
    the grid (fp error ~1e-12 ≪ 5e-7 recovers the grid point — the
    CLAUDE.md unigram-logprob recipe), so α divides identical bits
    and ships raw; mean_events is raw int/int. One groupBy shuffle on
    the key + a one-row global aggregate."""
    deg = events.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("d")).where(F.col("d") >= dmin)
    terms = deg.select(
        "d",
        F.round(F.log(F.col("d") / F.lit(dmin - 0.5)), 6).alias("_l"),
    )
    g = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("d").cast("bigint").alias("total_events"),
        F.max("d").cast("bigint").alias("max_events"),
        F.round(F.sum("_l"), 6).alias("_ls"),
    )
    return g.select(
        "n_keys", "total_events", "max_events",
        (F.col("total_events") / F.col("n_keys")).alias("mean_events"),
        (F.lit(1.0) + F.try_divide(F.col("n_keys"), F.col("_ls")))
        .alias("alpha"),
    )


def decay_weighted_value(events: DataFrame, half_life_days: int = 30,
                         event_type: str = "purchase",
                         k: int = 100) -> DataFrame:
    """Time-decay user value: score(u) = Σ value·2^(−age/half_life)
    over the user's *event_type* events, age in whole days behind the
    corpus' latest event — recency-weighted LTV, the ranking signal
    retention teams actually use (yesterday's purchase counts ~2×
    a month-old one at the default half-life). Returns the top-*k*
    (user_id, n_events, decayed_value), ties on user_id.

    Determinism: age is an exact integer day count against the global
    max timestamp (a one-row broadcast aggregate); each decay factor
    2^(−age/hl) is snapped to the 1e-6 grid (pow differs by ulps
    cross-engine — the CLAUDE.md ln recipe applied to exp2) and
    multiplies the 2-decimal-grid value raw; the per-user sum runs
    through an ORDERED cumulative window (ts, event_id) so
    partial-aggregate merge order can never wobble a bit. Top-k is a
    TakeOrdered, not a global sort."""
    ev = events.where(F.col("event_type") == event_type)
    mx = ev.agg(F.max(F.date_trunc("day", F.col("ts"))).alias("_mx"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        "user_id", "ts", "event_id",
        (F.round(F.col("value"), 2)
         * F.round(F.pow(F.lit(2.0),
                         -F.datediff(F.col("_mx"),
                                     F.date_trunc("day", F.col("ts")))
                         / F.lit(float(half_life_days))), 6))
        .alias("_dv"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                              F.desc("event_id")))
    per_user = (
        aged.select(
            "user_id",
            F.sum("_dv").over(w).alias("decayed_value"),
            F.count(F.lit(1)).over(w).alias("n_events"),
            rk.alias("_rk"))
        .where(F.col("_rk") == 1)
        .select("user_id", "n_events", "decayed_value")
    )
    return per_user.orderBy(F.desc("decayed_value"), "user_id").limit(k)


def weekday_profile(events: DataFrame, sort: bool = True) -> DataFrame:
    """Day-of-week activity profile per event type with a chi-square
    uniformity statistic: (event_type, dow, n, share, chi2) — the
    weekly-seasonality card (is traffic calendar-driven?), and the
    integer-exact sibling of the volume control chart. dow is
    1 = Sunday … 7 = Saturday (Spark dayofweek == DuckDB's
    dayofweek + 1, aligned in the oracle).

    chi2 = Σ_d (o_d − n/7)²/(n/7) is carried per row (same value for
    all 7 rows of a type) and computed from exact integer counts:
    Σ (7·o_d − n)² / (7·n) in pure integer arithmetic divided ONCE as
    int/int — bit-identical cross-engine, no double sums anywhere.
    share = o_d/n raw int/int.

    OBSERVED-DAYS-ONLY semantics: the sum runs over weekdays that
    have at least one event — the (0 − n/7)²/(n/7) terms for absent
    days are NOT added (a type concentrated on one day scores 36n/7,
    not the textbook 6n with all seven terms). This understates the
    statistic when days are missing entirely; it is deliberate — the
    output carries one row per OBSERVED (type, dow) and the statistic
    is a per-row annotation of exactly those rows, not a 7-row spine.
    Rank order across types is preserved for the common case where
    every type has all 7 days."""
    base = (
        events.groupBy("event_type",
                       F.dayofweek("ts").alias("dow"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type")
    w1 = base.select(
        "event_type", "dow", "n",
        F.sum("n").over(wt).cast("bigint").alias("_tn"),
    )
    w2 = w1.select(
        "event_type", "dow", "n", "_tn",
        F.sum((7 * F.col("n") - F.col("_tn"))
              * (7 * F.col("n") - F.col("_tn"))).over(wt)
        .cast("bigint").alias("_s2"),
    )
    out = w2.select(
        "event_type", "dow", "n",
        (F.col("n") / F.col("_tn")).alias("share"),
        (F.col("_s2") / (F.lit(7) * F.col("_tn"))).alias("chi2"),
    )
    return out.orderBy("event_type", "dow") if sort else out



def kaplan_meier_sessions(events: DataFrame, gap_minutes: int = 30,
                          sort: bool = True) -> DataFrame:
    """Kaplan–Meier survival curve of SESSION duration (whole minutes),
    right-censored: a session ending within *gap_minutes* of the
    corpus horizon may still be open, so its true duration is unknown
    — THE estimator for "how long do sessions last", because a naive
    mean silently treats every cut-off session as finished. (User-
    lifetime churn was the obvious unit, but on this corpus every
    user is active through the final day — zero uncensored
    observations; sessions genuinely end.) Returns one row per
    duration with ≥ 1 completed session: (t_minutes, n_at_risk,
    n_ended, log_survival).

    Survival ships in LOG space: S(t) = Π(1 − dᵢ/nᵢ) is a product of
    rationals whose float exp differs by ulps cross-engine, but
    log S(t) = Σ ln(1 − dᵢ/nᵢ) follows the CLAUDE.md ln recipe — each
    ln of a bit-identical int/int ratio snaps to the 1e-6 grid, the
    running sum is an ORDERED cumulative window (deterministic
    accumulation), shipped raw; consumers exp() locally. Durations
    and censor tests are integer-microsecond arithmetic. One
    user-key shuffle (sessionize) + tiny per-duration frames."""
    sess = sessionize(events, gap_minutes=gap_minutes, sort=False)
    hz = events.agg(F.max("ts").alias("_hz"))
    obs = sess.crossJoin(F.broadcast(hz)).select(
        ((F.unix_micros(F.col("session_end"))
          - F.unix_micros(F.col("session_start")))
         / F.lit(60_000_000)).cast("bigint").alias("t_minutes"),
        ((F.unix_micros(F.col("_hz"))
          - F.unix_micros(F.col("session_end")))
         >= gap_minutes * 60_000_000).cast("int").alias("_completed"),
    )
    per_t = (obs.groupBy("t_minutes")
             .agg(F.sum("_completed").alias("n_ended"),
                  F.count(F.lit(1)).alias("_left")))
    w = Window.orderBy("t_minutes").rowsBetween(
        Window.unboundedPreceding, -1)
    wc = Window.orderBy("t_minutes").rowsBetween(
        Window.unboundedPreceding, 0)
    # n_total as a FULL-FRAME window sum over the tiny per-duration
    # frame, not a second aggregate over obs: the separate count
    # branch re-ran the whole sessionize + observation build
    # (Catalyst re-executes common subplans per reference) for one
    # integer the window already has in hand (optimization r11:
    # events scans 8 -> 4). Same bigint, same n_at_risk bits.
    w_all = Window.orderBy("t_minutes").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    curve = per_t.select(
        "t_minutes", "n_ended", "_left",
        (F.sum("_left").over(w_all)
         - F.coalesce(F.sum("_left").over(w), F.lit(0)))
        .cast("bigint").alias("n_at_risk"))
    # the cumsum must see EVERY duration's term (censored-only rows
    # shrink the risk set), so filter to ended>0 only at the end
    term = F.when(
        (F.col("n_ended") > 0)
        & (F.col("n_ended") < F.col("n_at_risk")),
        F.round(F.log(F.lit(1.0) - F.col("n_ended")
                      / F.col("n_at_risk")), 6))
    out = (curve.select(
        "t_minutes", "n_at_risk", "n_ended",
        F.when(F.col("n_ended") < F.col("n_at_risk"),
               F.sum(term).over(wc)).alias("log_survival"))
        .where(F.col("n_ended") > 0))
    return out.orderBy("t_minutes") if sort else out


def markov_removal_attribution(events: DataFrame,
                               conv_type: str = "purchase",
                               gap_minutes: int = 30,
                               iters: int = 12) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al.): model
    session paths START → e₁ → … → CONV/NULL as a first-order chain,
    then credit each channel by how much the conversion probability
    DROPS when that channel's inbound edges are redirected to NULL —
    the principled successor of first/last-touch (already ported),
    because it credits assisting touchpoints a position rule can't
    see. Returns (channel, p_base_micro, p_removed_micro,
    removal_effect), one row per non-conversion event type.

    Path model: sessions (assign_sessions, 30-min gap) truncated at
    their FIRST *conv_type* event; consecutive events are edges,
    START precedes the first event, the conversion event absorbs to
    __CONV__, a session without one absorbs its last event to
    __NULL__. Absorption probabilities come from *iters* rounds of
    p ← T·p with p(CONV) = 1, p(NULL) = 0 — R-round semantics, exact
    at any R (the oracle unrolls the same rounds; conversion paths are
    session-bounded, so 12 rounds is far past convergence here).

    Distribution + determinism: ALL data-sized work is the one
    distributed pass that sessionizes and counts edges; the chain
    itself is |event types|² rows — an O(small) driver transfer (the
    IVF-centroid / CMS-sketch budget class) — and the absorption
    recurrence solves in exact Python integers with per-edge
    ``c·p // c_tot`` (bit-equal to the oracle's unrolled integer SQL;
    a first cut iterated the ~40-row grid as 12 distributed joins and
    spent 40.8s on pure tiny-task overhead in driver posture). The
    removal effect 1 − p_removed/p_base divides identical integers
    under IEEE and ships raw; a zero base yields NULL in both
    engines."""
    UNIT = 1_000_000
    sess = assign_sessions(events, gap_minutes=gap_minutes)
    wsess = Window.partitionBy("user_id", "session_seq") \
        .orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id", "session_seq")
    # ONE pass over the sessionized frame (optimization r11): the
    # first cut derived the conversion cutoff as a groupBy+join and
    # the inner/terminal edges as two branches — four references to
    # the sessionize+row_number subtree, each re-executed (Catalyst
    # never dedupes common subplans). The cutoff (_cp) and terminal
    # position (_mx) are whole-partition windows on the partitioning
    # the row_number already established (no extra exchange), the
    # truncated path is a PREFIX of the session so lag computed
    # pre-filter equals lag post-filter on kept rows, and each kept
    # row emits its inbound edge (+ the absorbing edge when it is
    # the terminal row) from a conditional-array explode — edge
    # multiset identical (A/B exceptAll = 0), 1.8 s → 0.8 s at sf0.1.
    rows = sess.select(
        "user_id", "session_seq", "event_type",
        F.row_number().over(wsess).alias("rn"),
        F.coalesce(F.lag("event_type").over(wsess), F.lit("__START__"))
        .alias("_prev"),
    ).select(
        "event_type", "rn", "_prev",
        F.min(F.when(F.col("event_type") == conv_type, F.col("rn")))
        .over(wp).alias("_cp"),
        F.max("rn").over(wp).alias("_mx"),
    )
    kept = rows.where(F.col("_cp").isNull() | (F.col("rn") <= F.col("_cp")))
    is_last = F.col("rn") == F.coalesce(F.col("_cp"), F.col("_mx"))
    e_in = F.struct(F.col("_prev").alias("s"),
                    F.col("event_type").alias("d"))
    e_abs = F.struct(
        F.col("event_type").alias("s"),
        F.when(F.col("event_type") == conv_type, F.lit("__CONV__"))
        .otherwise(F.lit("__NULL__")).alias("d"))
    edges = (
        kept.select(F.explode(
            F.when(is_last, F.array(e_in, e_abs))
            .otherwise(F.array(e_in))).alias("e"))
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c")))
    # the chain itself is O(|event types|2) rows — an O(small) driver
    # transfer (the IVF-centroid / CMS-sketch budget class); solving
    # the absorption recurrence in exact Python integers is bit-equal
    # to the oracle's unrolled integer SQL and replaces a 12-round
    # distributed join chain over a ~40-row grid (measured 40.8s of
    # pure tiny-task overhead in driver posture → sub-second)
    e_rows = edges.collect()
    out_edges: dict[str, list[tuple[str, int]]] = {}
    ct: dict[str, int] = {}
    states: set[str] = set()
    for r in e_rows:
        out_edges.setdefault(r["src"], []).append((r["dst"], int(r["c"])))
        ct[r["src"]] = ct.get(r["src"], 0) + int(r["c"])
        states.add(r["src"])
        states.add(r["dst"])
    channels = sorted(
        t for t in states
        if t not in ("__START__", "__CONV__", "__NULL__", conv_type))

    def absorb(removed: str | None) -> int:
        p = {s: (UNIT if s == "__CONV__" else 0) for s in states}
        for _ in range(iters):
            nxt = {}
            for s in states:
                if s == "__CONV__":
                    nxt[s] = UNIT
                elif s == "__NULL__" or s not in out_edges:
                    nxt[s] = 0
                else:
                    tot = ct[s]
                    acc = 0
                    for dst, c in out_edges[s]:
                        eff = "__NULL__" if dst == removed else dst
                        acc += c * p[eff] // tot
                    nxt[s] = acc
            p = nxt
        return p.get("__START__", 0)

    schema = ("channel string, p_base_micro long, "
              "p_removed_micro long, removal_effect double")
    if not e_rows:
        return events.sparkSession.createDataFrame([], schema)
    base = absorb(None)
    data = []
    for chn in channels:
        rem = absorb(chn)
        eff = (1.0 - rem / base) if base > 0 else None
        data.append((chn, base, rem, eff))
    return (events.sparkSession.createDataFrame(data, schema)
            .orderBy("channel"))


def _conversion_observations(events: DataFrame,
                             event_type: str = "purchase"):
    """Shared observation model for the survival estimators below:
    per user, T = whole hours from FIRST activity to FIRST
    *event_type* event; users who never emit one are right-censored
    at the corpus horizon. The hour index is integer-micros floor
    division in BOTH engines (CLAUDE.md: the cross-engine-safe time
    bucket — DuckDB's date_diff counts boundary crossings, not
    truncated spans, so neither side uses it). Returns
    (t_hours, _converted) rows — one per user."""
    span = events.agg(F.max("ts").alias("_hz"))
    users = (events.groupBy("user_id")
             .agg(F.min("ts").alias("_first"),
                  F.min(F.when(F.col("event_type") == event_type,
                               F.col("ts"))).alias("_conv")))
    return users.crossJoin(F.broadcast(span)).select(
        F.floor(
            (F.unix_micros(F.coalesce(F.col("_conv"), F.col("_hz")))
             - F.unix_micros(F.col("_first"))) / 3600000000
        ).cast("bigint").alias("t_hours"),
        F.col("_conv").isNotNull().cast("int").alias("_converted"),
    )


def kaplan_meier_conversion(events: DataFrame,
                            event_type: str = "purchase",
                            sort: bool = True) -> DataFrame:
    """Kaplan–Meier survival curve of time-to-first-*event_type*
    (hours from a user's first activity), with right-censoring: users
    who never convert are censored at the corpus horizon — THE
    estimator for "how long until users buy", because a naive mean
    silently treats never-converters as converting at the horizon.
    One row per observed conversion time:
    (t_hours, n_at_risk, n_converted, log_survival).

    Survival is shipped in LOG space: S(t) = Π(1 − dᵢ/nᵢ) is a product
    of rationals whose float exp differs by ulps cross-engine, but
    log S(t) = Σ ln(1 − dᵢ/nᵢ) follows the CLAUDE.md ln recipe exactly
    — each ln of a bit-identical int/int ratio snaps to the 1e-6 grid,
    and the running sum is an ORDERED cumulative window over event
    times (deterministic accumulation) shipped raw. Consumers exp()
    it locally. One per-user shuffle, then a tiny per-time frame
    (|distinct hours| rows) — the global window is bounded, not a
    straggler risk."""
    obs = _conversion_observations(events, event_type)
    per_t = (obs.groupBy("t_hours")
             .agg(F.sum("_converted").alias("n_converted"),
                  F.count(F.lit(1)).alias("_ended")))
    w = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, -1)
    wc = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, 0)
    # n_total from a full-frame window sum over the tiny per-time
    # frame (the kaplan_meier_sessions r11 rewrite): the separate
    # count branch re-ran the per-user observation build per
    # reference. Same bigint, same n_at_risk bits.
    w_all = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    curve = per_t.select(
        "t_hours",
        F.col("n_converted").cast("bigint").alias("n_converted"),
        "_ended",
        (F.sum("_ended").over(w_all)
         - F.coalesce(F.sum("_ended").over(w), F.lit(0)))
        .cast("bigint").alias("n_at_risk"))
    # d == n_at_risk means the curve hits S = 0 (ln 0): Spark's log
    # NULLs there while DuckDB returns -inf — both sides spell the
    # same CASE instead: the term is NULL and the row's log_survival
    # is NULL (curve terminated), never a silent engine divergence
    term = F.when(
        (F.col("n_converted") > 0)
        & (F.col("n_converted") < F.col("n_at_risk")),
        F.round(F.log(F.lit(1.0) - F.col("n_converted")
                      / F.col("n_at_risk")), 6))
    out = (curve.select(
               "t_hours", "n_at_risk", "n_converted",
               F.when(F.col("n_converted") < F.col("n_at_risk"),
                      F.sum(term).over(wc)).alias("log_survival"))
           .where(F.col("n_converted") > 0))
    return out.orderBy("t_hours") if sort else out


def nelson_aalen_conversion(events: DataFrame,
                            event_type: str = "purchase",
                            sort: bool = True) -> DataFrame:
    """Nelson–Aalen cumulative-hazard curve of time-to-first-
    *event_type* — the estimator sibling of
    :func:`kaplan_meier_conversion` (same observation model). Where
    KM multiplies survival factors, Nelson–Aalen SUMS hazard
    increments — H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ — which is both the better
    small-sample cumulative-hazard estimator (Aalen 1978) and the
    cross-engine-friendlier one: every increment is an int/int IEEE
    division (bit-identical by the CLAUDE.md ratio rule, NO ln
    involved), and the running sum is an ORDERED cumulative window,
    so both engines accumulate the same bits in the same order —
    shipped raw, no rounding anywhere. Also ships the Poisson-type
    variance Σ dᵢ/nᵢ² under the same contract. One row per observed
    conversion time:
    (t_hours, n_at_risk, n_converted, cum_hazard, cum_hazard_var).

    Scale shape = kaplan_meier_conversion's: one per-user shuffle,
    then a per-time frame that is tiny (|distinct hours| rows)."""
    obs = _conversion_observations(events, event_type)
    per_t = (obs.groupBy("t_hours")
             .agg(F.sum("_converted").alias("n_converted"),
                  F.count(F.lit(1)).alias("_ended")))
    w = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, -1)
    wc = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, 0)
    # n_total from a full-frame window sum over the tiny per-time
    # frame (the kaplan_meier_sessions r11 rewrite): the separate
    # count branch re-ran the per-user observation build per
    # reference. Same bigint, same n_at_risk bits.
    w_all = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    curve = (per_t.select(
                 "t_hours",
                 F.col("n_converted").cast("bigint")
                 .alias("n_converted"), "_ended",
                 (F.sum("_ended").over(w_all)
                  - F.coalesce(F.sum("_ended").over(w), F.lit(0)))
                 .cast("bigint").alias("n_at_risk"))
             .where(F.col("n_converted") > 0))
    out = curve.select(
        "t_hours", "n_at_risk", "n_converted",
        F.sum(F.col("n_converted") / F.col("n_at_risk")).over(wc)
        .alias("cum_hazard"),
        F.sum(F.col("n_converted")
              / (F.col("n_at_risk") * F.col("n_at_risk"))).over(wc)
        .alias("cum_hazard_var"),
    )
    return out.orderBy("t_hours") if sort else out


def _ab_per_user(events: DataFrame, event_type: str = "purchase",
                 salt: str = "exp1") -> DataFrame:
    """Shared experiment frame for the A/B readouts (CUPED, DiD):
    deterministic md5 50/50 user assignment, pre/post split at the
    midpoint of the corpus' day span, per-user *event_type* value
    sums in integer CENTS — one row per user: (_x = pre cents,
    _y = post cents, variant). Every downstream moment accumulates
    from these exact integers, so no per-user double ever enters a
    merge-order-dependent sum."""
    span = events.agg(
        F.date_trunc("day", F.min("ts")).alias("_d0"),
        F.date_trunc("day", F.max("ts")).alias("_d1"))
    ev = (events.where(F.col("event_type") == event_type)
          .crossJoin(F.broadcast(span))
          .select(
              "user_id",
              (F.datediff(F.date_trunc("day", F.col("ts")), F.col("_d0"))
               < F.floor(F.datediff(F.col("_d1"), F.col("_d0")) / 2) + 1)
              .alias("_pre"),
              F.round(F.col("value"), 2).alias("_v")))
    return ev.groupBy("user_id").agg(
        F.round(F.sum(F.when(F.col("_pre"), F.col("_v"))
                      .otherwise(F.lit(0.0))) * 100)
        .cast("bigint").alias("_x"),
        F.round(F.sum(F.when(~F.col("_pre"), F.col("_v"))
                      .otherwise(F.lit(0.0))) * 100)
        .cast("bigint").alias("_y"),
    ).select(
        "_x", "_y",
        F.when(F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.lit(salt), F.col("user_id").cast("string"))), 1, 4),
            16, 10).cast("int") % 2 == 0,
            F.lit("control")).otherwise(F.lit("treatment"))
        .alias("variant"),
    )


def cuped_ab_readout(events: DataFrame, event_type: str = "purchase",
                     salt: str = "exp1") -> DataFrame:
    """CUPED-adjusted A/B readout (Deng et al. 2013): deterministic
    50/50 hash assignment of users, pre-period spend as the covariate,
    and the variance-reduced post-period means an experimentation
    platform actually ships — Y_adj = Y − θ(X − X̄) with
    θ = cov(X,Y)/var(X) cuts readout variance by exactly ρ² without
    biasing the treatment effect. Returns one row per variant:
    (variant, n_users, mean_y, mean_y_adj, theta, var_reduction).

    Pre/post split at the midpoint of the corpus' day span; X and Y
    are per-user *event_type* value sums in integer cents. Everything
    is ONE distributed pass: per-variant Σx, Σx², Σy, Σxy, Σy²
    accumulate as DECIMAL(38,0) (exact, merge-order-free), pooled
    sums are window-sums over the 2-row variant frame (integer
    arithmetic — order can't matter), and θ / means / the adjusted
    means come from the normal-equation identities
    (mean Y_adj per variant = ȳ_v − θ(x̄_v − x̄)) — so no per-user
    double ever enters a nondeterministic sum. var_reduction = ρ²
    (pooled), the exact CUPED variance saving. All derived doubles
    ship raw from identical integer bits."""
    per_user = _ab_per_user(events, event_type, salt)

    def dec(c):
        return c.cast("decimal(38,0)")

    pv = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec(F.col("_x")) * F.col("_x")).alias("_sxx"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_x")) * F.col("_y")).alias("_sxy"),
        F.sum(dec(F.col("_y")) * F.col("_y")).alias("_syy"),
    )
    wall = Window.partitionBy()
    pooled = pv.select(
        "variant", "n_users", "_sx", "_sy",
        F.sum(dec(F.col("n_users"))).over(wall).alias("_n"),
        F.sum("_sx").over(wall).alias("_tsx"),
        F.sum("_sxx").over(wall).alias("_tsxx"),
        F.sum("_sy").over(wall).alias("_tsy"),
        F.sum("_sxy").over(wall).alias("_tsxy"),
        F.sum("_syy").over(wall).alias("_tsyy"),
    )
    num = (F.col("_n") * F.col("_tsxy")
           - F.col("_tsx") * F.col("_tsy")).cast("double")
    denx = (F.col("_n") * F.col("_tsxx")
            - F.col("_tsx") * F.col("_tsx")).cast("double")
    deny = (F.col("_n") * F.col("_tsyy")
            - F.col("_tsy") * F.col("_tsy")).cast("double")
    theta = F.when(denx != 0.0, num / denx)
    xbar_all = (F.col("_tsx").cast("double")
                / F.col("_n").cast("double"))
    mean_y = (F.col("_sy").cast("double")
              / (F.lit(100.0) * F.col("n_users").cast("double")))
    mean_x = (F.col("_sx").cast("double")
              / (F.lit(100.0) * F.col("n_users").cast("double")))
    out = pooled.select(
        "variant", "n_users",
        mean_y.alias("mean_y"),
        (mean_y - theta * (mean_x - xbar_all / F.lit(100.0)))
        .alias("mean_y_adj"),
        theta.alias("theta"),
        F.when((denx != 0.0) & (deny != 0.0),
               num * num / (denx * deny)).alias("var_reduction"),
    )
    return out.orderBy("variant")


def diff_in_diff_readout(events: DataFrame,
                         event_type: str = "purchase",
                         salt: str = "exp1") -> DataFrame:
    """Difference-in-differences readout over the shared experiment
    frame (:func:`_ab_per_user` — same md5 assignment and midpoint
    pre/post split as :func:`cuped_ab_readout`): the parallel-trends
    estimator DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), the
    standard causal readout when assignment correlates with baseline
    level (CUPED adjusts variance; DiD removes additive group bias).
    ONE row: (n_control, n_treatment, the four means, did).

    Exactness: per-variant Σpre / Σpost accumulate as DECIMAL(38,0)
    cents (merge-order-free), every mean is DOUBLE(Σcents) /
    (100 · DOUBLE(n)) — exact-integer→double conversion is correctly
    rounded in both engines, so the quotients and the final linear
    combination are bit-identical, shipped raw. Empty variants yield
    NULL means via the same CASE in both engines (never inf).

    Scale: one per-user shuffle + a 2-row pivot — nothing else."""
    per_user = _ab_per_user(events, event_type, salt)

    def dec(c):
        return c.cast("decimal(38,0)")

    pv = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
    )

    def pick(variant, col):
        return F.max(F.when(F.col("variant") == variant, F.col(col)))

    one = pv.agg(
        F.coalesce(pick("control", "n_users"), F.lit(0))
        .cast("bigint").alias("n_control"),
        F.coalesce(pick("treatment", "n_users"), F.lit(0))
        .cast("bigint").alias("n_treatment"),
        pick("control", "_sx").alias("_cx"),
        pick("control", "_sy").alias("_cy"),
        pick("treatment", "_sx").alias("_tx"),
        pick("treatment", "_sy").alias("_ty"),
    )

    def mean(s, n):
        return F.when(
            F.col(n) > 0,
            F.col(s).cast("double")
            / (F.lit(100.0) * F.col(n).cast("double")))

    out = one.select(
        "n_control", "n_treatment",
        mean("_cx", "n_control").alias("mean_pre_control"),
        mean("_cy", "n_control").alias("mean_post_control"),
        mean("_tx", "n_treatment").alias("mean_pre_treatment"),
        mean("_ty", "n_treatment").alias("mean_post_treatment"),
        ((mean("_ty", "n_treatment") - mean("_tx", "n_treatment"))
         - (mean("_cy", "n_control") - mean("_cx", "n_control")))
        .alias("did"),
    )
    return out


def bounce_rate_daily(events: DataFrame, gap_minutes: int = 30,
                      sort: bool = True) -> DataFrame:
    """Daily bounce rate: share of sessions (by session-START day)
    consisting of a single event — the engagement-quality card next
    to session_stats' duration percentiles. Returns (date,
    n_sessions, n_bounces, bounce_rate) with bounce_rate a raw
    int/int quotient (bit-identical cross-engine).

    One pass over :func:`sessionize`'s aggregate (already one shuffle
    on user_id) + one day-grain partial-aggregated rollup — counts
    only, nothing wide rides any shuffle."""
    s = sessionize(events, gap_minutes=gap_minutes, sort=False)
    out = (
        s.groupBy(F.to_date("session_start").alias("date"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_bounces"),
        )
        .select("date", "n_sessions", "n_bounces",
                F.try_divide(F.col("n_bounces"), F.col("n_sessions"))
                .alias("bounce_rate"))
    )
    return out.orderBy("date") if sort else out


def user_entropy(events: DataFrame, sort: bool = True) -> DataFrame:
    """Behavioral-diversity profile per user: Shannon entropy of the
    user's event-type distribution plus its evenness (entropy / ln of
    the type count). Bots and scrapers concentrate on one or two event
    types (evenness → 0 or exactly one type), engaged humans spread
    across the catalog — the frequency-domain complement of
    :func:`bot_regularity`'s time-domain metronome test.

    Cross-engine determinism: H = ln n − (Σ c·ln c)/n. Each ln(c) is
    snapped to the 1e-6 grid AS AN INTEGER of micro-nats, so
    Σ c·round_micro(ln c) is an exact bigint — merge-order-proof where
    a double Σ c·ln(c) would be run-to-run nondeterministic (the
    CLAUDE.md groupBy-sum rule). The division and subtraction then run
    on identical bits in both engines; the output ships raw.

    Scale: two partial-aggregated shuffles — (user, type) counts, then
    per-user rollup. No windows, no data-sized groups on one task."""
    tc = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"))
    lnc_micro = F.round(F.log("_c") * 1e6).cast("bigint")
    per = tc.groupBy("user_id").agg(
        F.sum("_c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("_c") * lnc_micro).cast("bigint").alias("_slc"),
    )
    # divide by n BEFORE the 1e6 de-scaling: for a single-type user
    # slc/n is the integer micro-ln exactly (c = n), so H lands on a
    # hard 0.0 instead of an ulp residue; order mirrored in the oracle
    h = (F.round(F.log("n_events"), 6)
         - (F.col("_slc") / F.col("n_events")) / F.lit(1e6))
    out = per.select(
        "user_id", "n_events", "n_types",
        h.alias("type_entropy"),
        F.try_divide(h, F.round(F.log("n_types"), 6)).alias("evenness"),
    )
    return out.orderBy("user_id") if sort else out


def stickiness(events: DataFrame, sort: bool = True) -> DataFrame:
    """DAU/WAU/MAU + stickiness (DAU/MAU) per observed day — the
    engagement card every event feed publishes. Windows are trailing:
    WAU(d) = distinct users active in [d-6, d], MAU(d) in [d-29, d].

    ONE pass serves all three: each (user, activity-day) row explodes
    into the 30 trailing cover-days it can contribute to with its
    offset; per (cover-day, user) the MIN offset says which windows
    the user falls in (0 → DAU, ≤6 → WAU, any → MAU), so one
    (day, user) aggregate + one per-day rollup produce all three
    counts — no three separate distinct-count passes, and the
    observed-day spine is recovered from the same frame (a day is
    observed iff some user has offset 0) instead of a second
    reference Catalyst would re-execute.

    Scale: the explode is a fixed 30× fan-out into a partial-
    aggregated (day, user) shuffle — exact counts; at 100 TB swap the
    explode for the mergeable HLL path (ev_hll_rollup) when ±2% is
    acceptable. Stickiness ships as a raw int/int double."""
    du = events.select(
        F.to_date("ts").alias("day"), "user_id").distinct()
    cov = du.select(
        "user_id",
        F.posexplode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 29)))
        .alias("off", "cday"))
    peru = cov.groupBy("cday", "user_id").agg(
        F.min("off").alias("_mo"))
    per_day = peru.groupBy("cday").agg(
        F.sum(F.when(F.col("_mo") == 0, 1).otherwise(0))
        .cast("bigint").alias("dau"),
        F.sum(F.when(F.col("_mo") <= 6, 1).otherwise(0))
        .cast("bigint").alias("wau"),
        F.count(F.lit(1)).cast("bigint").alias("mau"),
    )
    out = per_day.where(F.col("dau") > 0).select(
        F.col("cday").alias("day"), "dau", "wau", "mau",
        F.try_divide(F.col("dau"), F.col("mau")).alias("stickiness"),
    )
    return out.orderBy("day") if sort else out


def _hourly_count_spine(events: DataFrame) -> DataFrame:
    """(event_type, _h, _c): integer hourly event counts over each
    type's FULL hour span — empty hours materialize as zeros (the
    spine explode is |span| rows per type, a bounded dimension).
    Shared by :func:`dispersion_profile` and :func:`periodicity`."""
    hc = events.select("event_type",
                       F.expr("unix_micros(ts) div 3600000000")
                       .alias("_h")) \
        .groupBy("event_type", "_h") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    span = hc.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1"))
    spine = span.select(
        "event_type",
        F.explode(F.sequence(F.col("_h0"), F.col("_h1"))).alias("_h"))
    return spine.join(hc, ["event_type", "_h"], "left") \
        .select("event_type", "_h",
                F.coalesce(F.col("_c"), F.lit(0))
                .cast("bigint").alias("_c"))


def dispersion_profile(events: DataFrame, sort: bool = True) -> DataFrame:
    """Overdispersion card per event type: the two standard "is this
    stream Poisson-like or bursty?" statistics, both exact. Fano
    factor = var/mean of HOURLY event counts over the type's full
    hour span (empty hours count as zeros — dropping them would bias
    Fano toward 1), and Goh-Barabási burstiness
    B = (σ−μ)/(σ+μ) of the within-user inter-event gaps in integer
    SECONDS (both endpoints truncated first — the cross-engine-safe
    second grid; micro gaps would overflow bigint in the square sum
    anyway, and the DECIMAL(38,0)/HUGEINT accumulators cover the
    n·Σd² products). B ∈ (−1, 1): −1 ≈ perfectly periodic (a
    scheduler), 0 ≈ Poisson, → 1 ≈ extreme bursts.

    Cross-engine determinism: every sum is integer (counts, second
    gaps, their squares in DECIMAL), and the final mean/variance/
    sqrt/ratio compositions are fixed expression trees of correctly
    rounded IEEE ops on exact integers — identical bits, no
    merge-order drift. Degenerate spans (1 hour, <2 gaps) yield NULL
    via try_divide, mirrored by CASE in the oracle.

    Scale shape: hourly counts partial-aggregate map-side; the hour
    spine explodes |span| rows per TYPE (types are a bounded
    dimension); gaps ride the same (user, type) lag window as
    inter_event_gap_stats — no new shuffle class, no percentile
    funnel (this card is all algebraic aggregates, so unlike the
    exact gap percentiles it needs no approx twin at 100 TB)."""
    full = _hourly_count_spine(events).select("event_type", "_c")

    def dec(c):
        return c.cast("decimal(38,0)")

    fano = full.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("_c").cast("bigint").alias("_sc"),
        F.sum(dec(F.col("_c")) * F.col("_c")).alias("_sc2"),
    ).select(
        "event_type", "n_hours",
        F.try_divide(
            F.try_divide(
                (dec(F.col("n_hours")) * F.col("_sc2")
                 - dec(F.col("_sc")) * F.col("_sc")).cast("double"),
                (F.col("n_hours") * (F.col("n_hours") - 1))
                .cast("double")),
            F.try_divide(F.col("_sc").cast("double"),
                         F.col("n_hours").cast("double")))
        .alias("fano_hourly"),
    )

    w = Window.partitionBy("user_id", "event_type") \
        .orderBy("ts", "event_id")
    sec = F.expr("unix_micros(ts) div 1000000")
    prev = F.lag(F.col("_s")).over(w)
    gaps = events.select("user_id", "event_type", "ts", "event_id",
                         sec.alias("_s")) \
        .select("event_type", (F.col("_s") - prev).alias("_d")) \
        .where(F.col("_d").isNotNull())
    # compute sqrt(v) and m as named columns FIRST (one reference
    # each), then B — keeps the expression tree identical to the
    # oracle's and avoids CollapseProject double-evaluating the sqrt
    burst = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("_d").cast("bigint").alias("_sd"),
        F.sum(dec(F.col("_d")) * F.col("_d")).alias("_sd2"),
    )
    sig = burst.select(
        "event_type", "n_gaps",
        F.sqrt(F.try_divide(
            (dec(F.col("n_gaps")) * F.col("_sd2")
             - dec(F.col("_sd")) * F.col("_sd")).cast("double"),
            (F.col("n_gaps") * (F.col("n_gaps") - 1)).cast("double"))
        ).alias("_sig"),
        F.try_divide(F.col("_sd").cast("double"),
                     F.col("n_gaps").cast("double")).alias("_mu"),
    )
    bout = sig.select(
        "event_type", "n_gaps",
        F.try_divide(F.col("_sig") - F.col("_mu"),
                     F.col("_sig") + F.col("_mu")).alias("burstiness"),
    )
    out = fano.join(bout, "event_type", "left")
    return out.orderBy("event_type") if sort else out


def logrank_ab(events: DataFrame, event_type: str = "purchase",
               salt: str = "exp1") -> DataFrame:
    """Log-rank test between the experiment's two arms on
    time-to-first-*event_type* — the censoring-correct "did treatment
    change conversion SPEED?" companion to the KM/Nelson-Aalen curves
    (:func:`kaplan_meier_conversion`) and the value readouts
    (:func:`cuped_ab_readout`, :func:`diff_in_diff_readout`; same
    deterministic md5 user assignment). ONE row: (n_total,
    n_treatment, o1, e1, v, z_stat) where o1/e1 are the treatment
    arm's observed/expected conversions and z = (O1−E1)/√V; the
    normal p-value stays client-side (erf is ulp-loose cross-engine,
    the stats-suite policy).

    Determinism: the risk sets are exact integer cumulative counts
    (KM machinery); each time's E and V hypergeometric terms are
    fixed correctly-rounded double trees on those integers (the V
    products exceed bigint near n~3M users, so every factor casts to
    double FIRST), and both running sums accumulate through ORDERED
    windows over event times — the ANOVA/KM ordered-cumsum rule, no
    merge-order drift. Censored users leave the risk set at the
    corpus horizon exactly as in the curves.

    Scale: one per-user shuffle, then a |distinct hours|-row bounded
    frame for the windows (KM's audited SINGLE_PART class)."""
    span = events.agg(F.max("ts").alias("_hz"))
    users = (events.groupBy("user_id")
             .agg(F.min("ts").alias("_first"),
                  F.min(F.when(F.col("event_type") == event_type,
                               F.col("ts"))).alias("_conv")))
    treat = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(salt), F.col("user_id").cast("string"))), 1, 4),
        16, 10).cast("int") % 2 == 1).cast("int")
    obs = users.crossJoin(F.broadcast(span)).select(
        F.floor(
            (F.unix_micros(F.coalesce(F.col("_conv"), F.col("_hz")))
             - F.unix_micros(F.col("_first"))) / 3600000000
        ).cast("bigint").alias("_t"),
        F.col("_conv").isNotNull().cast("int").alias("_cv"),
        treat.alias("_tr"),
    )
    per_t = obs.groupBy("_t").agg(
        F.sum("_cv").cast("bigint").alias("_d"),
        F.count(F.lit(1)).cast("bigint").alias("_e"),
        F.sum(F.col("_cv") * F.col("_tr")).cast("bigint").alias("_d1"),
        F.sum("_tr").cast("bigint").alias("_e1"),
    )
    wp = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    # _n/_n1 as full-frame window sums over the tiny per-time frame
    # (the kaplan_meier_sessions r11 rewrite): the separate totals
    # branch re-ran the per-user observation build per reference.
    # Same bigints, same risk-set bits.
    w_all = Window.orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    risk = per_t.select(
        "_t", "_d", "_d1",
        (F.sum("_e").over(w_all)
         - F.coalesce(F.sum("_e").over(wp), F.lit(0)))
        .cast("bigint").alias("_nt"),
        (F.sum("_e1").over(w_all)
         - F.coalesce(F.sum("_e1").over(wp), F.lit(0)))
        .cast("bigint").alias("_n1t"),
        F.sum("_e").over(w_all).cast("bigint").alias("_n"),
        F.sum("_e1").over(w_all).cast("bigint").alias("_n1"),
    )
    ntd = F.col("_nt").cast("double")
    n1d = F.col("_n1t").cast("double")
    dd = F.col("_d").cast("double")
    e_term = F.when(F.col("_d") > 0, dd * n1d / ntd)
    v_term = F.when((F.col("_d") > 0) & (F.col("_nt") > 1),
                    dd * (ntd - dd) * n1d * (ntd - n1d)
                    / (ntd * ntd * (ntd - 1)))
    cum = risk.select(
        "_t", "_n", "_n1",
        F.sum("_d1").over(wc).cast("bigint").alias("_o1"),
        F.sum(e_term).over(wc).alias("_ecum"),
        F.sum(v_term).over(wc).alias("_vcum"),
    )
    last = cum.agg(F.max(F.struct(
        "_t", "_n", "_n1", "_o1", "_ecum", "_vcum")).alias("_w"))
    return last.select(
        F.col("_w._n").alias("n_total"),
        F.col("_w._n1").alias("n_treatment"),
        F.col("_w._o1").alias("o1"),
        F.col("_w._ecum").alias("e1"),
        F.col("_w._vcum").alias("v"),
        F.try_divide(
            F.col("_w._o1").cast("double") - F.col("_w._ecum"),
            F.sqrt(F.col("_w._vcum"))).alias("z_stat"),
    )


def periodicity(events: DataFrame, lags: tuple[int, ...] = (1, 24, 168),
                sort: bool = True) -> DataFrame:
    """Seasonality detector per event type: Pearson autocorrelation of
    the HOURLY count series at each candidate lag (1 h persistence,
    24 h daily cycle, 168 h weekly cycle) over the full zero-kept hour
    spine — high r at 24/168 is the standard "this stream has a
    clock" signal that picks the resample grain and window size for
    everything downstream. Returns (event_type, lag_hours, n_pairs,
    autocorr).

    Determinism: counts are integers, all six correlation sums
    accumulate in DECIMAL(38,0)/HUGEINT, and r is one fixed
    correctly-rounded tree (exact-int casts → multiply/subtract →
    sqrt → divide) — identical bits cross-engine; constant series
    yield NULL via try_divide, CASE in the oracle.

    Scale shape: one lag window pass per candidate on the
    (type)-partitioned spine (bounded by the hour span, not row
    count), stack-unpivot, then a partial-aggregated groupBy — the
    cross_correlation machinery generalized to hourly counts."""
    full = _hourly_count_spine(events)
    w = Window.partitionBy("event_type").orderBy("_h")
    shifted = full.select(
        "event_type", F.col("_c").alias("_a"),
        *[F.lag("_c", k).over(w).alias(f"_s{i}")
          for i, k in enumerate(lags)],
    )
    stack_expr = "stack({}, {}) as (lag_hours, _b)".format(
        len(lags), ", ".join(f"{k}, _s{i}" for i, k in enumerate(lags)))
    pairs = shifted.selectExpr("event_type", "_a", stack_expr) \
        .where(F.col("_b").isNotNull())

    def dec(c):
        return c.cast("decimal(38,0)")

    sums = pairs.groupBy("event_type", "lag_hours").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(dec(F.col("_a"))).alias("_sa"),
        F.sum(dec(F.col("_b"))).alias("_sb"),
        F.sum(dec(F.col("_a")) * F.col("_b")).alias("_sab"),
        F.sum(dec(F.col("_a")) * F.col("_a")).alias("_saa"),
        F.sum(dec(F.col("_b")) * F.col("_b")).alias("_sbb"),
    )
    n = dec(F.col("n_pairs"))
    num = (n * F.col("_sab") - F.col("_sa") * F.col("_sb"))
    da = (n * F.col("_saa") - F.col("_sa") * F.col("_sa"))
    db = (n * F.col("_sbb") - F.col("_sb") * F.col("_sb"))
    out = sums.select(
        "event_type",
        F.col("lag_hours").cast("bigint").alias("lag_hours"),
        "n_pairs",
        F.try_divide(
            num.cast("double"),
            F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))
        ).alias("autocorr"),
    )
    return out.orderBy("event_type", "lag_hours") if sort else out


def permutation_entropy(events: DataFrame, sort: bool = True) -> DataFrame:
    """Ordinal-pattern (permutation) entropy per event type — Bandt &
    Pompe's complexity measure (PRL 88:174102, 2002) on the zero-kept
    HOURLY count series: slide an order-3 window over the counts,
    encode each window's ORDINAL pattern, and take the Shannon
    entropy of the pattern distribution. A metronomic stream repeats
    one or two patterns (entropy → 0), white noise uses all of them
    (evenness → 1) — the complexity-domain complement of
    :func:`periodicity`'s autocorrelation clock test.

    Tie-aware encoding: integer counts tie often, and the classic
    rank-vector encoding is ambiguous under ties, so each window
    (x0, x1, x2) maps to the TRIT vector of its three pairwise
    comparisons — code = 9·T(x0,x1) + 3·T(x1,x2) + T(x0,x2) with
    T ∈ {0,1,2} for <,=,> — a deterministic pure-integer expression
    (13 achievable codes; transitivity kills the rest).

    Cross-engine determinism: the code is integer comparisons only;
    the entropy uses the ev_user_entropy micro-nat recipe — each
    ln(count) snapped to the 1e-6 grid AS AN INTEGER, Σ c·ln_micro(c)
    an exact bigint (merge-order-proof), division before de-scaling
    so a single-pattern type lands on a hard 0.0.

    Scale shape: the spine and the order-3 window partition by
    event_type and are bounded by the HOUR SPAN, not row count (the
    periodicity class); then two partial-aggregated shuffles to
    (type, code) counts and the per-type rollup. Types with fewer
    than 3 spanned hours emit no row (no window exists)."""
    full = _hourly_count_spine(events)
    w = Window.partitionBy("event_type").orderBy("_h")
    tri = full.select(
        "event_type", F.col("_c").alias("_x0"),
        F.lead("_c", 1).over(w).alias("_x1"),
        F.lead("_c", 2).over(w).alias("_x2"),
    ).where(F.col("_x2").isNotNull())

    def trit(a, b):
        return (F.when(F.col(a) < F.col(b), 0)
                .when(F.col(a) == F.col(b), 1)
                .otherwise(2))

    coded = tri.select(
        "event_type",
        (trit("_x0", "_x1") * 9 + trit("_x1", "_x2") * 3
         + trit("_x0", "_x2")).cast("bigint").alias("_code"))
    pc = coded.groupBy("event_type", "_code").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"))
    lnc_micro = F.round(F.log("_c") * 1e6).cast("bigint")
    per = pc.groupBy("event_type").agg(
        F.sum("_c").cast("bigint").alias("n_windows"),
        F.count(F.lit(1)).cast("bigint").alias("n_codes"),
        F.sum(F.col("_c") * lnc_micro).cast("bigint").alias("_slc"),
    )
    h = (F.round(F.log("n_windows"), 6)
         - (F.col("_slc") / F.col("n_windows")) / F.lit(1e6))
    out = per.select(
        "event_type", "n_windows", "n_codes",
        h.alias("perm_entropy"),
        F.try_divide(h, F.round(F.log("n_codes"), 6)).alias("evenness"),
    )
    return out.orderBy("event_type") if sort else out


def ols_trend_weekend(events: DataFrame, sort: bool = True) -> DataFrame:
    """Two-regressor OLS per event type: daily counts over the
    zero-kept calendar-day spine regressed on a linear trend AND a
    weekend dummy —  y_d = b0 + b1·t + b2·weekend(d).  Separating the
    two answers "is traffic growing, or does it just look like it
    because the window starts on a weekend?" — the multivariate step
    up from :func:`~pyperustats_spark.operators.timeseries.ols_trend`
    (single regressor), and the design-matrix pattern any further
    dummy (holiday, launch flag) follows.

    Exactness: every normal-equation sum (n, Σt, Σw, Σt², Σtw, Σw²,
    Σy, Σty, Σwy, Σy²) is an exact integer in DECIMAL(38,0) — t is
    the day index, w ∈ {0,1}, y an integer count. The 3×3 Cramer
    solve then runs on double-cast-first sums (the logrank rule:
    products would overflow DECIMAL at extreme scale, and int→double
    is correctly rounded in both engines), giving ONE fixed
    correctly-rounded tree per coefficient — bit-identical
    cross-engine. A singular design (no weekend in span, constant
    trend column, < 3 days) yields det = 0 exactly while the
    products stay under 2^53 and the same NULL CASE in both engines.
    SSE = Σy² − b0·Σy − b1·Σty − b2·Σwy (the standard normal-
    equation identity), r² = 1 − SSE/(Σy² − (Σy)²/n).

    Weekend = Saturday/Sunday — Spark ``dayofweek IN (1,7)``
    (1=Sunday) == DuckDB ``dayofweek IN (0,6)`` (0=Sunday); both
    pure integer calendar maps.

    Scale shape: one (type, day) partial aggregate, a bounded spine
    explode per type (day span, not row count), min-day via
    groupBy+join (never a count window), then a k_types-row
    aggregate. No ordered windows at all."""
    dc = events.select("event_type", F.to_date("ts").alias("_d")) \
        .groupBy("event_type", "_d") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("_y"))
    span = dc.groupBy("event_type").agg(
        F.min("_d").alias("_d0"), F.max("_d").alias("_d1"))
    spine = span.select(
        "event_type", "_d0",
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("_d"))
    full = spine.join(dc, ["event_type", "_d"], "left").select(
        "event_type",
        F.datediff(F.col("_d"), F.col("_d0")).cast("bigint").alias("_t"),
        F.dayofweek("_d").isin(1, 7).cast("bigint").alias("_w"),
        F.coalesce(F.col("_y"), F.lit(0)).cast("bigint").alias("_y"))

    def dec(c):
        return c.cast("decimal(38,0)")

    per = full.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(dec(F.col("_t"))).alias("_st"),
        F.sum(dec(F.col("_w"))).alias("_sw"),
        F.sum(dec(F.col("_t")) * F.col("_t")).alias("_stt"),
        F.sum(dec(F.col("_t")) * F.col("_w")).alias("_stw"),
        F.sum(dec(F.col("_w")) * F.col("_w")).alias("_sww"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_t")) * F.col("_y")).alias("_sty"),
        F.sum(dec(F.col("_w")) * F.col("_y")).alias("_swy"),
        F.sum(dec(F.col("_y")) * F.col("_y")).alias("_syy"),
    )
    n = F.col("n_days").cast("double")
    st = F.col("_st").cast("double")
    sw = F.col("_sw").cast("double")
    stt = F.col("_stt").cast("double")
    stw = F.col("_stw").cast("double")
    sww = F.col("_sww").cast("double")
    sy = F.col("_sy").cast("double")
    sty = F.col("_sty").cast("double")
    swy = F.col("_swy").cast("double")
    syy = F.col("_syy").cast("double")
    det = (n * (stt * sww - stw * stw)
           - st * (st * sww - stw * sw)
           + sw * (st * stw - stt * sw))
    # Cramer numerators: replace the matching column with X'y
    d0 = (sy * (stt * sww - stw * stw)
          - st * (sty * sww - stw * swy)
          + sw * (sty * stw - stt * swy))
    d1 = (n * (sty * sww - stw * swy)
          - sy * (st * sww - stw * sw)
          + sw * (st * swy - sty * sw))
    d2 = (n * (stt * swy - sty * stw)
          - st * (st * swy - sty * sw)
          + sy * (st * stw - stt * sw))
    b0 = d0 / det
    b1 = d1 / det
    b2 = d2 / det
    sse = syy - b0 * sy - b1 * sty - b2 * swy
    sst = syy - sy * sy / n
    ok = det != F.lit(0.0)
    out = per.select(
        "event_type", "n_days",
        F.when(ok, b0).alias("intercept"),
        F.when(ok, b1).alias("trend_per_day"),
        F.when(ok, b2).alias("weekend_lift"),
        F.when(ok & (sst > 0),
               F.lit(1.0) - sse / sst).alias("r2"),
    )
    return out.orderBy("event_type") if sort else out


def growth_accounting(events: DataFrame, sort: bool = True) -> DataFrame:
    """Weekly growth accounting — the standard user-base bridge
    (new + retained + resurrected = active; churned closes the
    ledger): for each ISO-agnostic epoch week, how many active users
    are brand NEW (first week ever), RETAINED (also active the
    previous week), RESURRECTED (active before, but not last week),
    and how many of last week's actives CHURNED (active(w−1) −
    retained(w)). The growth decomposition every DAU/MAU dashboard
    (ev_stickiness, ev_active_users) eventually needs to explain
    WHY the active line moved.

    Exactness: weeks are integer day-div-7 buckets on the
    cross-engine-safe second grid; every count is an exact integer;
    churn is integer subtraction via a lag over the bounded week
    spine. No doubles at all.

    Scale shape: one distinct (user, week) shuffle, ONE per-user
    ordered window pass (prev week + first week from the same
    partitioning — no second reference, no join), a per-week
    partial-aggregated rollup, then a lag over the WEEK-bounded
    summary frame (a partition-less window over |weeks| rows — the
    audited bounded-dimension class)."""
    uw = events.select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").cast("bigint")
        .alias("_wk")).distinct()
    w = Window.partitionBy("user_id").orderBy("_wk")
    wu = Window.partitionBy("user_id")
    flagged = uw.select(
        "_wk",
        F.lag("_wk").over(w).alias("_prev"),
        F.min("_wk").over(wu).alias("_first"))
    per = flagged.groupBy("_wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("active"),
        F.sum((F.col("_wk") == F.col("_first")).cast("int"))
        .cast("bigint").alias("new_users"),
        F.sum(F.when(F.col("_prev") == F.col("_wk") - 1, 1)
              .otherwise(0)).cast("bigint").alias("retained"),
        F.sum(((F.col("_wk") != F.col("_first"))
               & (F.coalesce(F.col("_prev"), F.lit(-10))
                  < F.col("_wk") - 1)).cast("int"))
        .cast("bigint").alias("resurrected"))
    # churn only closes against a CONTIGUOUS previous week: if week
    # w-1 had no actives at all (no row), nothing could churn into w
    ww = Window.orderBy("_wk")
    out = per.select(
        F.col("_wk").alias("week"),
        "active", "new_users", "retained", "resurrected",
        F.when(F.lag("_wk").over(ww) == F.col("_wk") - 1,
               F.lag("active").over(ww) - F.col("retained"))
        .otherwise(F.lit(0)).cast("bigint").alias("churned_from_prev"),
    )
    return out.orderBy("week") if sort else out


def funnel_timing(events: DataFrame,
                  steps: tuple[str, ...] = ("view", "click",
                                            "purchase"),
                  sort: bool = True) -> DataFrame:
    """Funnel TIMING table — :func:`conversion_lag_stats` generalized
    to every step pair of the funnel (consecutive pairs plus the
    end-to-end pair): for each (from, to), the users whose first
    FIRST-EVER *to* falls at-or-after their first *from* convert
    (strict funnel order — an out-of-order user is a
    non-conversion), with exact p50/p90 lags.
    funnel_steps says how many survive each step; this says how long
    each hop takes — together they are the complete funnel card.
    One row per pair: (step_from, step_to, n_from, n_converted,
    conversion_rate, p50_lag_us, p90_lag_us).

    Exactness: per-user first-timestamps come from ONE partial
    aggregate over the steps-filtered events (conditional mins — the
    funnel_steps idiom, no per-pair scans); lags are integer
    microseconds; exact percentile interpolation over integers is
    bit-identical cross-engine (the conversion_lag_stats class, with
    the same documented single-buffer caveat and approx_percentile
    swap at 100 TB); conversion_rate ships as the raw int/int
    quotient.

    Scale shape: one filtered scan → one per-user aggregate with a
    conditional min per step (k columns, not k passes), then a fixed
    |pairs|-row stack and a per-pair 1-row aggregate (audited
    bounded-dimension class)."""
    mins = events.where(F.col("event_type").isin(*steps)) \
        .groupBy("user_id").agg(*[
            F.min(F.when(F.col("event_type") == s, F.col("ts")))
            .alias(f"_t{i}") for i, s in enumerate(steps)])
    pair_idx = [(i, i + 1) for i in range(len(steps) - 1)]
    if len(steps) > 2:
        pair_idx.append((0, len(steps) - 1))
    stack_rows = ", ".join(
        f"'{steps[a]}', '{steps[b]}', _t{a}, _t{b}"
        for a, b in pair_idx)
    pairs = mins.selectExpr(
        "user_id",
        f"stack({len(pair_idx)}, {stack_rows}) as "
        "(step_from, step_to, _tf, _tt)")
    lags = pairs.select(
        "step_from", "step_to",
        F.col("_tf").isNotNull().alias("_has_from"),
        F.when(F.col("_tt") >= F.col("_tf"),
               F.unix_micros(F.col("_tt"))
               - F.unix_micros(F.col("_tf"))).alias("_lag_us"))
    # array-of-fractions percentile: one value buffer for both cuts
    out = lags.groupBy("step_from", "step_to").agg(
        F.sum(F.col("_has_from").cast("int")).cast("bigint")
        .alias("n_from"),
        F.count("_lag_us").cast("bigint").alias("n_converted"),
        F.try_divide(F.count("_lag_us"),
                     F.sum(F.col("_has_from").cast("int")))
        .alias("conversion_rate"),
        F.percentile("_lag_us", F.array(F.lit(0.5), F.lit(0.9)))
        .alias("_p"),
    ).select("step_from", "step_to", "n_from", "n_converted",
             "conversion_rate",
             F.element_at("_p", 1).alias("p50_lag_us"),
             F.element_at("_p", 2).alias("p90_lag_us"))
    return out.orderBy("step_from", "step_to") if sort else out
