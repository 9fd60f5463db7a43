"""Time-series operators re-expressing the BCRP fetcher/cache semantics
(``/root/reference/perustats/BCRP/fetcher.py``, ``cache.py``,
``utils.py``) Spark-first.

The reference's data model is a *long* stream of (date, code, value)
observations materialized as *wide* one-column-per-code frames. Here the
long form is first-class (it is the scalable layout: wide frames with
thousands of code columns don't partition), and wide is a pivot view
with explicit code values — no extra distinct() pass, no driver
collect.

Series stand-in on the test schema: ``lineitem`` →
(date=l_shipdate, code=concat(l_returnflag,l_linestatus),
value=l_extendedprice), daily-aggregated. See :func:`series_long`.

Scale notes
-----------
Window functions partition by series code — one shuffle per stage,
reused by every derived-series step chained after it. Gap-fill builds
per-series calendar spines with ``sequence()`` (distributed; no
driver-side calendar). The as-of join is union + last_value instead of a
range cross-join: one shuffle on the series key regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyperustats_spark.functions.dates import quarter_label

# returnflag+linestatus composites present in the testdata
SERIES_CODES = ("AF", "AO", "NF", "NO", "RF", "RO")


def series_long(lineitem: DataFrame) -> DataFrame:
    """Canonical long observation table: (date, code, value).

    Daily sum per composite code — mirrors the BCRP long layout before
    its wide pivot (fetcher.py:72-82)."""
    return (
        lineitem.select(
            F.date_trunc("DAY", F.col("l_shipdate")).alias("date"),
            F.concat(F.col("l_returnflag"), F.col("l_linestatus")).alias("code"),
            F.col("l_extendedprice").alias("value"),
        )
        .groupBy("date", "code")
        .agg(F.sum("value").alias("value"))
    )


def series_depth_profile(long_df: DataFrame,
                         sort: bool = True) -> DataFrame:
    """Series-depth pre-flight card for the per-series sequential
    folds (ewma/holt/hw_seasonal exact twins, holt_winters): those run
    ONE task per series and cannot chunk bit-exactly, so their wall
    clock is bounded by the DEEPEST series — this card is the measured
    answer to "is my corpus fold-safe?", the ev_skew_profile analog on
    the series axis. Per code: observation count, share of all
    observations (raw int/int — bit-identical cross-engine), and
    depth_vs_max = n_obs / deepest (1.0 marks the straggler series),
    plus the date span the fold will replay.

    One partial-aggregated count shuffle on the series key; the 1-row
    totals (sum + max) join back broadcast (the audited
    q_market_share pattern). A 100-TB user reads this BEFORE
    launching a fold: depth_vs_max ≈ 1 on a mega-series means split
    the workload by series KEYS (more codes), never by history."""
    counts = long_df.groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.min("date").alias("first_date"),
        F.max("date").alias("last_date"))
    totals = counts.agg(
        F.sum("n_obs").cast("bigint").alias("_total"),
        F.max("n_obs").cast("bigint").alias("_deepest"))
    out = counts.join(F.broadcast(totals)).select(
        "code", "n_obs", "first_date", "last_date",
        (F.col("n_obs") / F.col("_total")).alias("share"),
        (F.col("n_obs") / F.col("_deepest")).alias("depth_vs_max"))
    return out.orderBy(F.desc("n_obs"), F.asc("code")) if sort else out


def pivot_wide(long_df: DataFrame, codes: tuple[str, ...] = SERIES_CODES,
               sort: bool = True) -> DataFrame:
    """Long → wide, one column per code (reference wide cache tables,
    cache.py:8-12). Explicit `codes` list: Spark skips the extra
    distinct-values job and the pivot is a single shuffle.
    ``sort=False`` when composing (the global sort would be wasted by
    any downstream re-partitioning)."""
    out = (
        long_df.groupBy("date")
        .pivot("code", list(codes))
        .agg(F.sum("value"))
    )
    return out.orderBy("date") if sort else out


def unpivot_long(wide_df: DataFrame, codes: tuple[str, ...] = SERIES_CODES) -> DataFrame:
    """Wide → long via stack (reference json_to_df direction,
    utils.py:114-144). Pure narrow transform — zero shuffle."""
    return (
        wide_df.unpivot("date", list(codes), "code", "value")
        .where(F.col("value").isNotNull())
        .orderBy("date", "code")
    )


def resample(long_df: DataFrame, frequency: str = "M",
             sort: bool = True) -> DataFrame:
    """Roll daily observations up to M/Q/A periods (reference frequency
    handling, utils.py:147-200). Single partial-aggregated shuffle.

    ``sort=False`` for composition: the presentation orderBy is a
    GLOBAL range-shuffle + sort that any downstream re-partitioning
    (as-of union, yoy window) immediately throws away — at scale that
    is a full wasted pass over the resampled table."""
    unit = {"D": "DAY", "M": "MONTH", "Q": "QUARTER", "A": "YEAR"}[frequency.upper()]
    out = (
        long_df.groupBy(F.date_trunc(unit, F.col("date")).alias("period"), F.col("code"))
        .agg(
            F.sum("value").alias("value_sum"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        # avg derived from the 2-decimal-rounded sum: money sums sit next
        # to 2-decimal values, so the rounding (and hence the division)
        # is bit-identical across engines — plain avg() would land on
        # round-half boundaries and flip the last digit vs the oracle
        .withColumn("value_avg", F.round(F.col("value_sum"), 2) / F.col("n_obs"))
        .select("period", "code", "value_sum", "value_avg", "n_obs")
    )
    if frequency.upper() == "Q":
        # reference keeps a yq label for quarterly frames (utils.py:183)
        out = out.withColumn("yq", quarter_label(F.col("period")))
    return out.orderBy("period", "code") if sort else out


def gap_fill(long_df: DataFrame, sort: bool = True) -> DataFrame:
    """Fill missing calendar days per series with NULL rows.

    Per-series spine via sequence(min,max) + explode — distributed, no
    driver calendar; one groupBy shuffle on code, then a broadcast-able
    join back (AQE picks the strategy per series count). ``sort=False``
    when composing (interpolate_linear's windows repartition by code
    and would throw the global sort away)."""
    spine = (
        long_df.groupBy("code")
        .agg(F.min("date").alias("d0"), F.max("date").alias("d1"))
        .select(
            "code",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
            ).alias("date"),
        )
    )
    out = spine.join(long_df, ["code", "date"], "left").select(
        "date", "code", "value"
    )
    return out.orderBy("date", "code") if sort else out


def lag_pct_change(long_df: DataFrame) -> DataFrame:
    """Per-series lag and percent change (derived series — the reference
    consumer computes these off the wide frames)."""
    w = Window.partitionBy("code").orderBy("date")
    prev = F.lag("value").over(w)
    return long_df.select(
        "date",
        "code",
        "value",
        prev.alias("prev_value"),
        ((F.col("value") - prev) / prev).alias("pct_change"),
    ).orderBy("date", "code")


def moving_avg(long_df: DataFrame, window_days: int = 7) -> DataFrame:
    """Trailing N-row moving average per series."""
    w = (
        Window.partitionBy("code")
        .orderBy("date")
        .rowsBetween(-(window_days - 1), 0)
    )
    # round(sum,2)/count instead of avg(): see resample() parity note
    ma = F.round(F.sum("value").over(w), 2) / F.count(F.lit(1)).over(w)
    return long_df.select(
        "date", "code", "value", ma.alias(f"ma{window_days}")
    ).orderBy("date", "code")


def running_total(long_df: DataFrame) -> DataFrame:
    """Cumulative sum per series."""
    w = (
        Window.partitionBy("code")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return long_df.select(
        "date", "code", "value", F.sum("value").over(w).alias("cum_value")
    ).orderBy("date", "code")


def yoy_growth(monthly_df: DataFrame) -> DataFrame:
    """Year-over-year growth on a monthly (period, code, value_sum)
    frame: lag 12 within series."""
    w = Window.partitionBy("code").orderBy("period")
    prev_yr = F.lag("value_sum", 12).over(w)
    return monthly_df.select(
        "period",
        "code",
        "value_sum",
        prev_yr.alias("prev_year"),
        ((F.col("value_sum") - prev_yr) / prev_yr).alias("yoy"),
    ).orderBy("period", "code")


def asof_join(left: DataFrame, right: DataFrame, on: str, key: str,
              right_value_cols: list[str]) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    ``right.on <= left.on`` within the same ``key``.

    Spark-first shape: union both sides tagged, one shuffle on ``key``,
    then ``last(ignorenulls)`` over an ordered window — O(n log n) within
    partitions, never a range cross-join. (DuckDB expresses the same as
    ASOF JOIN — that is the oracle.)"""
    lt = left.withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(key), F.col(on), *[F.col(c) for c in right_value_cols]
        ).withColumn("_side", F.lit(0))
    )
    cols_l = [c for c in left.columns]
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in cols_l],
        F.col("_side"),
        *[F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_value_cols],
    )
    return filled.where(F.col("_side") == 1).drop("_side")


# ---------------------------------------------------------------------------
# Cache semantics (BCRPCache)
# ---------------------------------------------------------------------------


def cache_merge_upsert(cached: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """Upsert-by-key merge: incoming rows win on key collision, new keys
    append (reference ``BCRPCache.save`` INSERT-OR-REPLACE + outer merge,
    cache.py:143-169).

    Expressed as union + row_number-keep-first — one shuffle on the key,
    works for billions of rows (a MERGE INTO in lakehouse terms)."""
    w = Window.partitionBy(*keys).orderBy(F.col("_prio").asc())
    return (
        incoming.withColumn("_prio", F.lit(0))
        .unionByName(cached.withColumn("_prio", F.lit(1)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )


def cache_missing_codes(requested: DataFrame, cached: DataFrame, key: str = "code") -> DataFrame:
    """Which requested series are not in cache → fetch list (reference
    ``cached_codes`` set difference, fetcher.py:68-71). Broadcast
    anti-join: the requested list is tiny, the cache may be huge — semi
    join cache against broadcast(requested) first, then anti."""
    hits = cached.select(key).join(F.broadcast(requested), key, "left_semi").distinct()
    return requested.join(F.broadcast(hits), key, "left_anti").orderBy(key)


def catalog_series_summary(long_df: DataFrame) -> DataFrame:
    """Derive the per-series catalogue row the reference's metadata
    table stores (code, date range, observation count, last update,
    latest value — ``BCRP/metadata.py:252-357``): one partial-aggregated
    pass over the observations.

    ``max_by`` keeps the latest value without a second window pass."""
    return (
        long_df.groupBy("code")
        .agg(
            F.min("date").alias("first_date"),
            F.max("date").alias("last_update"),
            F.count(F.lit(1)).alias("n_obs"),
            F.max_by("value", "date").alias("latest_value"),
        )
        .orderBy("code")
    )


def rolling_zscore_anomalies(long_df: DataFrame, window_days: int = 30,
                             z_threshold: float = 3.0) -> DataFrame:
    """Rolling z-score anomaly flags per series: value vs the trailing
    *window_days* mean/stddev (exclusive of the current row, so a spike
    can't mask itself). One shuffle on the series key; the window is a
    range frame over the sorted partition — linear per series.

    ``stddev_samp`` of fewer than 2 points is NULL → z NULL → those
    leading rows never flag (matches SQL semantics on both engines)."""
    w = (
        Window.partitionBy("code")
        .orderBy(F.col("date").cast("long"))
        .rangeBetween(-window_days * 86400, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = F.try_divide(F.col("value") - mu, sd)
    return long_df.select(
        "date", "code", "value",
        z.alias("zscore"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    ).orderBy("date", "code")


def interpolate_linear(long_df: DataFrame) -> DataFrame:
    """Gap-fill then LINEARLY interpolate missing values between the
    nearest observed neighbors (continuous-series semantics the
    reference approximates by re-fetching complete ranges).

    Two window passes over one shuffle: last/next non-null value and
    their dates via running ``last(ignorenulls)`` frames, then the
    interpolation weight from day distances. Boundary rows (no earlier
    or no later observation) keep the one-sided value.

    The "next" side deliberately uses a REVERSE-ordered running frame
    (orderBy date DESC, unboundedPreceding→current) instead of the
    natural ``first() over (current→unboundedFollowing)``: Spark's
    UnboundedFollowing frame processor re-scans the remainder of the
    partition for EVERY row — O(n²) per series, measured 85× wall for
    10× series length on the depth stress set — while both running
    frames here are incremental O(n) (one extra in-partition sort,
    same single exchange)."""
    filled = gap_fill(long_df, sort=False)
    w_prev = (
        Window.partitionBy("code").orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # reverse order: "rows preceding" = dates AFTER the current row, so
    # a running last(ignorenulls) is the nearest at-or-after observation
    w_next = (
        Window.partitionBy("code").orderBy(F.desc("date"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_v = F.last("value", ignorenulls=True).over(w_prev)
    next_v = F.last("value", ignorenulls=True).over(w_next)
    prev_d = F.last(
        F.when(F.col("value").isNotNull(), F.col("date")), ignorenulls=True
    ).over(w_prev)
    next_d = F.last(
        F.when(F.col("value").isNotNull(), F.col("date")), ignorenulls=True
    ).over(w_next)
    span = F.unix_date(F.to_date(next_d)) - F.unix_date(F.to_date(prev_d))
    pos = F.unix_date(F.to_date(F.col("date"))) - F.unix_date(F.to_date(prev_d))
    interp = F.when(
        F.col("value").isNotNull(), F.col("value")
    ).when(
        prev_v.isNull(), next_v
    ).when(
        next_v.isNull(), prev_v
    ).otherwise(
        prev_v + (next_v - prev_v) * F.try_divide(pos, span)
    )
    return filled.select(
        "date", "code",
        F.col("value").alias("observed"),
        interp.alias("value_interp"),
    ).orderBy("date", "code")


def keep_latest(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep each key's latest row by *order_col* (the "current version"
    dedup every changelog/cache needs): row_number over a per-key
    descending window — one shuffle on the key, ties broken stably by
    the ordering column only if unique; callers add a tiebreaker column
    when needed."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def align_full_outer(left: DataFrame, right: DataFrame, on: list[str],
                     left_val: str, right_val: str) -> DataFrame:
    """Align two series on their keys with FULL OUTER semantics: rows
    from either side survive, the other side's value NULL — the
    reference's outer-merge of newly fetched columns into the wide
    cache (BCRP cache.py:140-169). Shuffles both sides once on the
    join key."""
    return (
        left.select(*on, F.col(left_val).alias("left_value"))
        .join(
            right.select(*on, F.col(right_val).alias("right_value")),
            on,
            "full_outer",
        )
        .orderBy(*on)
    )


def seasonal_index(long_df: DataFrame, sort: bool = True) -> DataFrame:
    """Classical multiplicative seasonal index per series: each
    calendar month's mean over the series' overall mean (>1 = that
    month runs hot) — the first step of a ratio-to-moving-average
    seasonal adjustment on economic series.

    Two partial-aggregated shuffles on the series key (monthly and
    overall means) joined back AQE-decided on ~#codes rows. Parity
    recipe: both means are round-2-restored money sums divided by
    counts (the resample rule — never avg()), so the index is a ratio
    of two bit-identical doubles and ships raw."""
    monthly = long_df.groupBy(
        F.col("code"), F.month("date").alias("month")
    ).agg(
        F.round(F.sum("value"), 2).alias("_sum_m"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    overall = long_df.groupBy("code").agg(
        F.round(F.sum("value"), 2).alias("_sum_o"),
        F.count(F.lit(1)).alias("_n_o"),
    )
    out = (
        monthly.join(overall, "code")
        .select(
            "code", "month", "n_obs",
            F.try_divide(
                F.col("_sum_m") / F.col("n_obs"),
                F.col("_sum_o") / F.col("_n_o"),
            ).alias("seasonal_index"),
        )
    )
    return out.orderBy("code", "month") if sort else out


def ewma(long_df: DataFrame, alpha: float = 0.3,
         sort: bool = True) -> DataFrame:
    """Exponentially weighted moving average per series
    (pandas ``ewm(adjust=False)`` recursion: s_t = α·x_t + (1−α)·s_{t−1})
    — the standard smoother on economic series.

    The recursion is inherently sequential PER SERIES, so this is the
    documented grouped-map escape hatch (``applyInPandas``, Arrow
    batches, same class as the multimodal stages): one shuffle on the
    series key, each task folds its series in order. Array-expression
    folds were rejected — ``aggregate`` copies its accumulator per
    element (O(n²) per series). Rows-only (no SQL oracle: the fold is
    orderless SQL's weak spot); property-tested against a plain-Python
    recursion.

    Straggler bound (100-TB posture): one series = ONE task. The
    float recursion is order-dependent, so unlike sessionize/cusum it
    cannot be chunked bit-exactly — wall clock is the DEEPEST series,
    not the series count. Pre-flight with ``ts_series_depth_profile``
    (the ev_skew_profile analog: rows-per-code card); a mega-series
    corpus must split by adding series KEYS, never by splitting one
    series' history."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    import pandas as pd

    out_schema = "date timestamp, code string, value double, ewma double"

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("date")
        s = None
        acc = []
        for x in pdf["value"]:
            if x is None or pd.isna(x):
                acc.append(s)  # gaps carry the last smoothed level
                continue
            s = x if s is None else alpha * x + (1.0 - alpha) * s
            acc.append(s)
        pdf = pdf.assign(ewma=acc)
        return pdf[["date", "code", "value", "ewma"]]

    out = long_df.select("date", "code", "value") \
        .groupBy("code").applyInPandas(fold, out_schema)
    return out.orderBy("code", "date") if sort else out


def holt_exact(long_df: DataFrame, k: int = 2, m: int = 3,
               sort: bool = True) -> DataFrame:
    """Oracle-backed exact-integer twin of :func:`holt_winters`
    (Holt's level+trend smoothing) for the α = 2^-k, β = 2^-m family
    — both coupled recurrences in integer CENTS:

        l_t = (x_t + (2^k − 1)·(l_{t−1} + b_{t−1})) DIV 2^k
        b_t = ((l_t − l_{t−1}) + (2^m − 1)·b_{t−1}) DIV 2^m

    with l_1 = x_1, b_1 = 0, where DIV TRUNCATES TOWARD ZERO. The
    trend is SIGNED, and the two engines' integer divisions disagree
    there: DuckDB ``//`` truncates (-7//2 = -3) while Python ``//``
    floors (-7//2 = -4) — measured on this exact operator (one-cent
    trend drift on the first negative delta). So the fold uses an
    explicit truncating division, the semantics DuckDB ``//`` and
    Spark SQL ``div`` share; see ewma_exact for the cents-grid
    recovery and the exact int→double shipping. Each row also
    carries the one-step forecast l_{t−1} + b_{t−1} (NULL on the
    first row), the backtest-ready column.

    Straggler bound (100-TB posture): one series = ONE task, and the
    truncating-DIV recurrence CANNOT be chunked bit-exactly (integer
    division does not re-associate across chunk boundaries — the
    sessionize/cusum ghost/carry tricks need a summable state), so
    wall clock is the DEEPEST series. Pre-flight with
    ``ts_series_depth_profile``; split by adding series keys, never
    by splitting one series' history."""
    import pandas as pd  # noqa: F401

    prep = long_df.select(
        "date", "code",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    out_schema = ("date timestamp, code string, cents bigint, "
                  "level_cents bigint, trend_cents bigint, "
                  "forecast_cents bigint")
    dk, dm = 1 << k, 1 << m

    def tdiv(a: int, b: int) -> int:
        # truncate toward zero (DuckDB // and Spark SQL div);
        # Python // floors and would drift one cent on negatives
        q = abs(a) // b
        return -q if a < 0 else q

    def fold(pdf):
        pdf = pdf.sort_values("date")
        lvl = trend = None
        levels, trends, fcs = [], [], []
        for c in pdf["cents"]:
            c = int(c)
            fc = None if lvl is None else lvl + trend
            if lvl is None:
                lvl, trend = c, 0
            else:
                prev = lvl
                lvl = tdiv(c + (dk - 1) * (lvl + trend), dk)
                trend = tdiv((lvl - prev) + (dm - 1) * trend, dm)
            levels.append(lvl)
            trends.append(trend)
            fcs.append(fc)
        return pdf.assign(level_cents=levels, trend_cents=trends,
                          forecast_cents=fcs)[
            ["date", "code", "cents", "level_cents", "trend_cents",
             "forecast_cents"]]

    folded = prep.groupBy("code").applyInPandas(fold, out_schema)
    out = folded.select(
        "date", "code",
        (F.col("cents").cast("double") / 100).alias("value"),
        "level_cents", "trend_cents", "forecast_cents",
        (F.col("level_cents").cast("double") / 100).alias("level"),
        (F.col("trend_cents").cast("double") / 100).alias("trend"),
        (F.col("forecast_cents").cast("double") / 100)
        .alias("forecast"))
    return out.orderBy("code", "date") if sort else out


def hw_seasonal_exact(long_df: DataFrame, k: int = 2, m: int = 3,
                      g: int = 2, period: int = 7,
                      sort: bool = True) -> DataFrame:
    """Oracle-backed exact-integer ADDITIVE Holt-Winters (level +
    trend + seasonality) for the α,β,γ = 2^-k,2^-m,2^-g family —
    three coupled recurrences in integer cents with a rotating
    *period*-slot seasonal state:

        l_t = (x_t − s_{t−p} + (2^k − 1)·(l_{t−1} + b_{t−1})) DIV 2^k
        b_t = ((l_t − l_{t−1}) + (2^m − 1)·b_{t−1})           DIV 2^m
        s_t = ((x_t − l_t) + (2^g − 1)·s_{t−p})               DIV 2^g

    (DIV truncating toward zero — the holt_exact rule: DuckDB ``//``
    truncates where Python ``//`` floors, and level deltas and
    seasonal indices are signed). Initial state: l_1 = x_1, b_1 = 0,
    all seasonal slots 0. Each row also carries the seasonal one-step
    forecast l + b + s_{t−p} (NULL on the first row).

    The oracle is a recursive CTE whose per-row state includes a
    BIGINT[] seasonal ring rotated with ``list_concat(seas[2:],
    [s_new])`` — list-valued recursion state, exercised and
    supported in DuckDB. Same grouped-map execution shape as the
    other exact twins; weekly period by default on the daily series.

    Straggler bound (100-TB posture): one series = ONE task; the
    truncating-DIV triple recurrence cannot chunk bit-exactly. Wall
    clock is the deepest series — pre-flight with
    ``ts_series_depth_profile`` and split by series keys only."""
    import pandas as pd  # noqa: F401

    prep = long_df.select(
        "date", "code",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    out_schema = ("date timestamp, code string, cents bigint, "
                  "level_cents bigint, trend_cents bigint, "
                  "seasonal_cents bigint, forecast_cents bigint")
    dk, dm, dg = 1 << k, 1 << m, 1 << g

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return -q if a < 0 else q

    def fold(pdf):
        pdf = pdf.sort_values("date")
        lvl = trend = None
        seas = [0] * period
        levels, trends, snews, fcs = [], [], [], []
        for c in pdf["cents"]:
            c = int(c)
            sl = seas[0]
            fc = None if lvl is None else lvl + trend + sl
            if lvl is None:
                lvl, trend, s_new = c, 0, 0
            else:
                prev = lvl
                lvl = tdiv(c - sl + (dk - 1) * (lvl + trend), dk)
                trend = tdiv((lvl - prev) + (dm - 1) * trend, dm)
                s_new = tdiv((c - lvl) + (dg - 1) * sl, dg)
            seas = seas[1:] + [s_new]
            levels.append(lvl)
            trends.append(trend)
            snews.append(s_new)
            fcs.append(fc)
        return pdf.assign(level_cents=levels, trend_cents=trends,
                          seasonal_cents=snews, forecast_cents=fcs)[
            ["date", "code", "cents", "level_cents", "trend_cents",
             "seasonal_cents", "forecast_cents"]]

    folded = prep.groupBy("code").applyInPandas(fold, out_schema)
    out = folded.select(
        "date", "code",
        (F.col("cents").cast("double") / 100).alias("value"),
        "level_cents", "trend_cents", "seasonal_cents",
        "forecast_cents",
        (F.col("level_cents").cast("double") / 100).alias("level"),
        (F.col("trend_cents").cast("double") / 100).alias("trend"),
        (F.col("seasonal_cents").cast("double") / 100)
        .alias("seasonal"),
        (F.col("forecast_cents").cast("double") / 100)
        .alias("forecast"))
    return out.orderBy("code", "date") if sort else out


def backtest_exact(long_df: DataFrame, k: int = 2, m: int = 3,
                   sort: bool = True) -> DataFrame:
    """Oracle-backed one-step-ahead forecast backtest over
    :func:`holt_exact`: per series, the error of forecasting each
    observation with the previous row's l + b — n_forecasts, total
    absolute error in integer cents, MAE and RMSE. The exact-integer
    recurrence makes the whole evaluation value-pinnable: errors are
    bigint cents, MAE ships as the raw int/int IEEE quotient and
    RMSE as sqrt of one (only sqrt and arithmetic are correctly
    rounded cross-engine — the CLAUDE.md rule — so both land on
    identical bits). This is :func:`forecast_backtest`'s rows-only
    evaluation made oracle-checkable for the α,β = 2^-k,2^-m family.

    Inherits :func:`holt_exact`'s straggler bound: the underlying
    fold runs one series per task and cannot chunk bit-exactly —
    pre-flight deep series with ``ts_series_depth_profile``."""
    h = holt_exact(long_df, k=k, m=m, sort=False) \
        .where(F.col("forecast_cents").isNotNull())
    err = F.abs(F.round(F.col("value") * 100, 0).cast("bigint")
                - F.col("forecast_cents"))
    out = (
        h.groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_forecasts"),
            F.sum(err).cast("bigint").alias("sum_abs_err_cents"),
            F.sum(err * err).cast("bigint").alias("_ss"),
        )
        .select(
            "code", "n_forecasts", "sum_abs_err_cents",
            (F.col("sum_abs_err_cents").cast("double")
             / F.col("n_forecasts").cast("double") / 100).alias("mae"),
            (F.sqrt(F.col("_ss").cast("double")
                    / F.col("n_forecasts").cast("double")) / 100)
            .alias("rmse"),
        )
    )
    return out.orderBy("code") if sort else out


def ewma_exact(long_df: DataFrame, k: int = 2,
               sort: bool = True) -> DataFrame:
    """Oracle-backed exact-integer twin of :func:`ewma`, for the
    α = 2^-k family: the recursion runs in integer CENTS —
    s_0 = x_0, s_t = (s_{t-1}·(2^k − 1) + x_t) DIV 2^k — so the
    sequential fold is bit-reproducible and a DuckDB recursive CTE
    replays it exactly (the fixed-point iterative-oracle rule from
    graph_supplier_pagerank, applied to a per-row recurrence; plain
    double EWMA can never be value-pinned cross-engine because fp
    rounding compounds per step). All operands are positive, so
    Python/Spark truncating division equals DuckDB's flooring `//`.

    The per-(date, code) cents come from round(sum·100): each input
    sits on the 2-decimal grid, so the double sum lands within 1e-9
    of a grid point and the round recovers it deterministically
    despite merge-order variance (the CLAUDE.md grid rule). Outputs
    ship the exact cents (bigint) plus value/ewma as cents→double/100
    — int→double conversion and division by 100 are correctly rounded
    IEEE in both engines, identical bits.

    Same execution shape as :func:`ewma`: one shuffle on the series
    key, each task folds its series in order (the documented
    grouped-map escape hatch); parallel across series, which is the
    real-world layout (millions of series, each of bounded length).

    Straggler bound (100-TB posture): one series = ONE task; the
    integer recurrence cannot chunk bit-exactly (DIV does not
    re-associate). Wall clock is the deepest series — pre-flight with
    ``ts_series_depth_profile`` and split by series keys only."""
    import pandas as pd  # noqa: F401

    prep = long_df.select(
        "date", "code",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    out_schema = "date timestamp, code string, cents bigint, " \
                 "ewma_cents bigint"
    denom = 1 << k
    mul = denom - 1

    def fold(pdf):
        pdf = pdf.sort_values("date")
        s = None
        acc = []
        for c in pdf["cents"]:
            c = int(c)
            s = c if s is None else (s * mul + c) // denom
            acc.append(s)
        return pdf.assign(ewma_cents=acc)[
            ["date", "code", "cents", "ewma_cents"]]

    folded = prep.groupBy("code").applyInPandas(fold, out_schema)
    out = folded.select(
        "date", "code",
        (F.col("cents").cast("double") / 100).alias("value"),
        "ewma_cents",
        (F.col("ewma_cents").cast("double") / 100).alias("ewma"))
    return out.orderBy("code", "date") if sort else out


def holt_winters(long_df: DataFrame, alpha: float = 0.3,
                 beta: float = 0.1, sort: bool = True) -> DataFrame:
    """Holt's double exponential smoothing per series (level + trend):

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    with l_1 = x_1, b_1 = 0, plus the one-step-ahead forecast
    (l_{t−1} + b_{t−1}) each row — the trending-series companion to
    :func:`ewma` on economic series (BCRP class). NULL gaps carry the
    last (level, trend) state and forecast from it.

    Same execution shape as ewma: the recursion is inherently
    sequential PER SERIES, so it is the documented grouped-map escape
    hatch (``applyInPandas``, Arrow batches) — ONE shuffle on the
    series key, linear fold per task, series count bounds parallelism
    exactly as any per-series statistic does. Rows-only (orderless SQL
    cannot express the fold); property-tested against a plain-Python
    recursion.

    Straggler bound (100-TB posture): one series = ONE task; the
    order-dependent float recursion cannot chunk bit-exactly. Wall
    clock is the deepest series — pre-flight with
    ``ts_series_depth_profile`` and split by series keys only."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    if not (0.0 <= beta <= 1.0):
        raise ValueError("beta must be in [0, 1]")
    import pandas as pd

    out_schema = ("date timestamp, code string, value double, "
                  "level double, trend double, forecast double")

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("date")
        lvl = trend = None
        levels, trends, fcs = [], [], []
        for x in pdf["value"]:
            fc = None if lvl is None else lvl + trend
            if x is None or pd.isna(x):
                levels.append(lvl)
                trends.append(trend)
                fcs.append(fc)
                continue
            if lvl is None:
                lvl, trend = x, 0.0
            else:
                prev = lvl
                lvl = alpha * x + (1.0 - alpha) * (lvl + trend)
                trend = beta * (lvl - prev) + (1.0 - beta) * trend
            levels.append(lvl)
            trends.append(trend)
            fcs.append(fc)
        pdf = pdf.assign(level=levels, trend=trends, forecast=fcs)
        return pdf[["date", "code", "value", "level", "trend", "forecast"]]

    out = long_df.select("date", "code", "value") \
        .groupBy("code").applyInPandas(fold, out_schema)
    return out.orderBy("code", "date") if sort else out


def forecast_backtest(long_df: DataFrame, alpha: float = 0.3,
                      beta: float = 0.1, sort: bool = True) -> DataFrame:
    """Rolling-origin backtest of :func:`holt_winters` against the
    naive lag-1 baseline: per series, the mean absolute error of each
    model's one-step-ahead forecast over every row that has both (the
    walk-forward evaluation a forecasting user runs BEFORE trusting a
    smoother's parameters — the model-selection companion to the
    nprobe/threshold calibration evals). Returns (code, n_evaluated,
    mae_holt, mae_naive, holt_wins).

    One pass over the smoother's output (which already carries the
    one-step forecast per row — no re-folding); the naive forecast is
    a lag window on the SAME series-key partitioning, so the rollup
    adds zero extra shuffles beyond the grouped-map's own. Rows-only
    (inherits the fold's orderless-SQL gap)."""
    hw = holt_winters(long_df, alpha=alpha, beta=beta, sort=False)
    w = Window.partitionBy("code").orderBy("date")
    naive = F.lag("value").over(w)
    scored = hw.select(
        "code", "value", "forecast", naive.alias("_naive")
    ).where(F.col("value").isNotNull()
            & F.col("forecast").isNotNull()
            & F.col("_naive").isNotNull())
    out = (
        scored.groupBy("code")
        .agg(
            F.count(F.lit(1)).alias("n_evaluated"),
            F.avg(F.abs(F.col("value") - F.col("forecast")))
            .alias("mae_holt"),
            F.avg(F.abs(F.col("value") - F.col("_naive")))
            .alias("mae_naive"),
        )
        .withColumn("holt_wins", F.col("mae_holt") < F.col("mae_naive"))
    )
    return out.orderBy("code") if sort else out


def cusum_changepoint(long_df: DataFrame, sort: bool = True) -> DataFrame:
    """Offline CUSUM mean-shift locator per series: cumulative sum of
    deviations from the series mean, changepoint = the date maximizing
    |S_t| (the classic single-split CUSUM estimator / first step of
    binary segmentation), with level means before/after the split.

    Cross-engine determinism is engineered, not assumed — EXACT
    fixed-point throughout: values snap to integer cents, and the
    CUSUM statistic is computed as the wide integer

        S_num(t) = n·cumsum_cents(t) − t·total_cents

    (DECIMAL(38,0) — ≡ (100·n)·S_t, since S_t = Σ_{τ≤t}(v_τ − mu) =
    cumsum(t) − t·total/n in cents) so the argmax comparison and the
    date tiebreak are pure integer arithmetic, identical in any
    engine at any scale; the shipped cusum_stat is
    CAST(S_num AS DOUBLE)/(100·n) — decimal→double is correctly
    rounded in both engines. Ties on |S| resolve to the earliest
    date. The per-series mean/count come from a groupBy+join (NOT a
    full-partition count window — the GROUP_SIZE_WINDOW smell), the
    cumsum is the one ordered per-code window (integer, so any
    chunked re-accumulation is bit-identical — see
    :func:`cusum_changepoint_chunked` for the depth-skew twin), and
    the winner is a map-side min-struct argmax, not a ranked window.

    All shuffles are keyed on code (the persisted cents frame feeds
    the window, the totals groupBy, and the level-mean split — three
    partial-aggregated code-key exchanges over 16-byte rows, the
    heavy window one); per-partition rows = series length, never
    corpus length — for mega-series use the chunked twin."""
    vals = long_df.select("date", "code", _cents().alias("_c")).persist()
    wc = (Window.partitionBy("code").orderBy("date")
          .rowsBetween(Window.unboundedPreceding, 0))
    wn = Window.partitionBy("code").orderBy("date")
    cum = vals.select(
        "date", "code",
        F.sum("_c").over(wc).alias("_cum"),
        F.row_number().over(wn).cast("bigint").alias("_t"))
    return _cusum_finish(vals, cum, sort)


def _cents():
    """Integer-cents snap of the 2-grid money column ``value``."""
    return F.round(F.round(F.col("value"), 2) * 100).cast("bigint")


def _cusum_finish(vals: DataFrame, cum: DataFrame,
                  sort: bool) -> DataFrame:
    """Shared CUSUM tail: wide-integer statistic off a (date, code,
    _cum, _t) running-prefix frame, map-side min-struct argmax, and
    the before/after level means. Both the plain and the chunked
    prefix builders feed this — their _cum/_t are identical bigints,
    so every downstream row is identical too. *vals* (date, code, _c)
    is referenced twice (series totals + the level-mean split) and
    must arrive persisted (CLAUDE.md: Catalyst re-runs common
    subtrees per reference — here the upstream is the series_long
    aggregate). Level means divide the grid double (cents/100.0 —
    bit-equal to round(sum(value), 2) in both engines) by the side
    count."""
    tot = vals.groupBy("code").agg(
        F.sum("_c").alias("_tc"),
        F.count(F.lit(1)).cast("bigint").alias("n"))
    c = (
        cum.join(tot, "code")
        .select(
            "date", "code", "n",
            F.abs(F.col("n").cast("decimal(19,0)") * F.col("_cum")
                  - F.col("_t").cast("decimal(19,0)") * F.col("_tc"))
            .cast("decimal(38,0)").alias("_abs_s"))
    )
    pick = (
        c.groupBy("code")
        .agg(F.min(F.struct(
            (-F.col("_abs_s")).alias("ns"),
            F.col("date").alias("change_date"),
            F.col("n").alias("n"))).alias("_m"))
        .select(
            "code", F.col("_m.change_date").alias("change_date"),
            F.try_divide((-F.col("_m.ns")).cast("double"),
                         F.lit(100.0) * F.col("_m.n"))
            .alias("cusum_stat"),
            F.col("_m.n").alias("n"))
    )
    split = vals.join(pick, "code").groupBy(
        "code", "change_date", "cusum_stat", "n"
    ).agg(
        ((F.sum(F.when(F.col("date") <= F.col("change_date"),
                       F.col("_c"))) / 100.0)
         / F.sum(F.when(F.col("date") <= F.col("change_date"), 1)))
        .alias("mean_before"),
        ((F.sum(F.when(F.col("date") > F.col("change_date"),
                       F.col("_c"))) / 100.0)
         / F.sum(F.when(F.col("date") > F.col("change_date"), 1)))
        .alias("mean_after"),
    )
    out = split.select("code", "n", "change_date", "cusum_stat",
                       "mean_before", "mean_after",
                       (F.col("mean_after") - F.col("mean_before"))
                       .alias("level_shift"))
    return out.orderBy("code") if sort else out


def cusum_changepoint_chunked(long_df: DataFrame,
                              sort: bool = True) -> DataFrame:
    """Depth-skew twin of :func:`cusum_changepoint` — identical output
    (property-pinned row-for-row equal), different partitioning: the
    plain form's running prefix puts a series' EVERY row in one
    ordered-window task, so a single mega-series (tick-level feed) is
    one straggler at any cluster size. Here the prefix runs in two
    phases, the :func:`~pyperustats_spark.operators.events.
    assign_sessions_chunked` recipe on the year axis:

    1. within-(code, year) ordered window — local cents cumsum and
       local row_number, so the biggest task holds one series-YEAR;
    2. a per-(code, year) summary (chunk cents sum, chunk row count —
       ONE row per chunk) carries the prior-chunk totals via a window
       over summary rows only; global cumsum/position = local +
       carried offsets.

    Everything is bigint, so re-associating the accumulation is EXACT
    — the chunked _cum/_t equal the plain ones bit-for-bit (this is
    why cusum_changepoint computes in integer cents rather than a
    double running sum: doubles would make any chunked re-association
    diverge in ulps and flip argmax ties). The phase-1 frame is
    persisted for its two references (rows + summaries). Use when the
    depth axis is skewed; the plain form wins when series are
    uniform."""
    vals = long_df.select("date", "code", _cents().alias("_c"))
    base = vals.withColumn("_chunk", F.year("date"))
    w = Window.partitionBy("code", "_chunk").orderBy("date")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    loc = base.select(
        "date", "code", "_chunk", "_c",
        F.sum("_c").over(wcum).alias("_lcum"),
        F.row_number().over(w).cast("bigint").alias("_lt"),
    ).persist()
    summ = loc.groupBy("code", "_chunk").agg(
        F.sum("_c").alias("_cs"),
        F.count(F.lit(1)).cast("bigint").alias("_cn"))
    wu = Window.partitionBy("code").orderBy("_chunk") \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = summ.select(
        "code", "_chunk",
        F.coalesce(F.sum("_cs").over(wu), F.lit(0)).alias("_ocum"),
        F.coalesce(F.sum("_cn").over(wu), F.lit(0)).alias("_ot"))
    cum = (
        loc.join(offsets, ["code", "_chunk"])
        .select("date", "code",
                (F.col("_lcum") + F.col("_ocum")).alias("_cum"),
                (F.col("_lt") + F.col("_ot")).alias("_t"))
    )
    # loc is the persisted frame — feed its (date, code, _c) columns
    # to the shared tail so totals/means reuse the phase-1 compute
    return _cusum_finish(loc.select("date", "code", "_c"), cum, sort)


def trend_ma(long_df: DataFrame, half_window: int = 6,
             sort: bool = True) -> DataFrame:
    """Centered moving-average trend per series + the additive
    detrended residual — the trend half of a classical decomposition
    (pair with :func:`seasonal_index` for the seasonal half).

    The trend uses the grid-recovery recipe (round(sum, 2)/count —
    the frame sum of 2-decimal-grid values is recovered exactly by
    the round in both engines regardless of accumulation order, see
    moving_avg), so the residual subtraction sees identical bits.
    One series-key shuffle; the centered ROWS frame is linear per
    partition."""
    w = (Window.partitionBy("code").orderBy("date")
         .rowsBetween(-half_window, half_window))
    trend = F.round(F.sum("value").over(w), 2) / F.count(F.lit(1)).over(w)
    out = (
        long_df.select("date", "code", "value")
        .withColumn("trend", trend)
        # detrend from the grid-RECOVERED value (round-2), not the raw
        # groupBy sum: the raw sum's accumulation-order ulps would land
        # the residual arbitrarily close to round-4 midpoints
        .withColumn("detrended", F.round(F.col("value"), 2) - F.col("trend"))
    )
    return out.orderBy("date", "code") if sort else out


def acf(long_df: DataFrame, lags: tuple[int, ...] = (1, 2, 3),
        sort: bool = True) -> DataFrame:
    """Autocorrelation per series at row-lags *lags*: Pearson corr of
    (x_t, x_{t-k}) over the date-ordered series — the standard
    persistence diagnostic before any forecasting step.

    ONE window pass computes every lag column (the series shuffles and
    sorts once, not once per lag), then stack() unpivots to long and a
    grouped corr aggregates each (series, lag). corr follows the
    stats_profile recipe: round-6 on both engines (the estimator's
    unordered sums differ in ulps; round-6 absorbs them — the same
    accepted class as stats_profile's corr, driver-green since r1)."""
    w = Window.partitionBy("code").orderBy("date")
    lagged = long_df.select(
        "code", "value",
        *[F.lag("value", k).over(w).alias(f"_lag{k}") for k in lags],
    )
    stack_expr = "stack({}, {}) as (lag_k, prev)".format(
        len(lags), ", ".join(f"{k}, _lag{k}" for k in lags))
    pairs = lagged.selectExpr("code", "value", stack_expr) \
        .where(F.col("prev").isNotNull())
    out = (
        pairs.groupBy("code", "lag_k")
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.round(F.corr("value", "prev"), 6).alias("acf"))
    )
    return out.orderBy("code", "lag_k") if sort else out


def cross_correlation(long_df: DataFrame, code_a: str, code_b: str,
                      lags: tuple[int, ...] = (-2, -1, 0, 1, 2),
                      sort: bool = True) -> DataFrame:
    """Lead/lag cross-correlation between two series: corr of
    (a_t, b_{t+k}) for each k in *lags* — positive-k peaks mean series
    A LEADS B by k observations (the standard lead-indicator probe on
    economic series).

    The two series align on date via one inner join (both sides
    pre-filtered to one code — tiny), then ONE window pass shifts B by
    every lag and stack() unpivots; corr uses the round-6
    stats_profile recipe. Row-lags on the joint date spine, so gaps
    are skipped, not zero-filled (align first with gap_fill if
    calendar lags are wanted)."""
    a = long_df.where(F.col("code") == code_a).select(
        "date", F.col("value").alias("_a"))
    b = long_df.where(F.col("code") == code_b).select(
        "date", F.col("value").alias("_b"))
    joint = a.join(b, "date")
    w = Window.orderBy("date")
    # a single global window over ONE pre-joined series pair is the
    # documented exception to the no-partition-less-window rule: the
    # frame is |one series| rows (the two-code filter ran first), not
    # corpus-scale — same audited class as the n_tiles share window
    shifted = joint.select(
        "_a",
        *[F.lag("_b", -k).over(w).alias(f"_s{i}")
          for i, k in enumerate(lags)],
    )
    stack_expr = "stack({}, {}) as (lag_k, b_shift)".format(
        len(lags), ", ".join(f"{k}, _s{i}" for i, k in enumerate(lags)))
    pairs = shifted.selectExpr("_a", stack_expr) \
        .where(F.col("b_shift").isNotNull())
    out = (
        pairs.groupBy("lag_k")
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.round(F.corr("_a", "b_shift"), 6).alias("xcorr"))
    )
    return out.orderBy("lag_k") if sort else out


def max_drawdown(long_df: DataFrame, sort: bool = True) -> DataFrame:
    """Maximum drawdown per series: the deepest peak-to-trough fall of
    the running maximum, with the trough date and the peak level — the
    standard risk/stress diagnostic on a level series.

    Every input value is grid-recovered FIRST (round-2: the values are
    money-grid groupBy sums whose raw bits differ by engine ulps), so
    the running max, the drawdown ratio, and the argmin tiebreak all
    see identical doubles cross-engine — same determinism recipe as
    the CUSUM locator. One series-key shuffle; ordered running max is
    linear per partition."""
    w = Window.partitionBy("code").orderBy("date") \
        .rowsBetween(Window.unboundedPreceding, 0)
    v = F.round(F.col("value"), 2)
    base = long_df.select("date", "code", v.alias("_v")) \
        .withColumn("_peak", F.max("_v").over(w)) \
        .withColumn("_dd", F.try_divide(F.col("_v"), F.col("_peak")) - 1)
    pick = base.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("code").orderBy(F.col("_dd").asc(),
                                               F.col("date").asc())),
    ).where(F.col("_rk") == 1)
    out = pick.select(
        "code",
        F.col("date").alias("trough_date"),
        F.col("_peak").alias("peak_value"),
        F.col("_v").alias("trough_value"),
        F.col("_dd").alias("max_drawdown"),
    )
    return out.orderBy("code") if sort else out


def series_beta(long_df: DataFrame, code_y: str, code_x: str,
                sort: bool = True) -> DataFrame:
    """Regression beta of series Y on series X (hedge-ratio /
    sensitivity): slope = covar_samp/var_samp on date-aligned
    observations, with the intercept and sample size — the scalar
    companion of :func:`cross_correlation`.

    One inner join on date (both sides pre-filtered to one code), one
    1-row aggregate. covar/var follow the stats_profile round-6 corr
    recipe (estimator sums differ by engine ulps; round-6 absorbs
    them); the intercept derives from the ROUNDED slope and
    grid-recovered means so both engines compute identical bits."""
    y = long_df.where(F.col("code") == code_y).select(
        "date", F.col("value").alias("_y"))
    x = long_df.where(F.col("code") == code_x).select(
        "date", F.col("value").alias("_x"))
    j = y.join(x, "date")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.try_divide(F.covar_samp("_y", "_x"),
                             F.var_samp("_x")), 6).alias("beta"),
        (F.round(F.sum("_y"), 2) / F.count(F.lit(1))).alias("_my"),
        (F.round(F.sum("_x"), 2) / F.count(F.lit(1))).alias("_mx"),
    )
    return agg.select(
        "n_obs", "beta",
        (F.col("_my") - F.col("beta") * F.col("_mx")).alias("intercept"),
    )


def rolling_median(long_df: DataFrame, half_window: int = 7,
                   sort: bool = True) -> DataFrame:
    """Exact centered rolling median per series — the robust smoother
    (spikes that drag a moving AVERAGE leave a rolling median
    untouched), companion to :func:`trend_ma`.

    Spark has no median window function, so the window's values ride a
    ``collect_list`` + ``array_sort`` (bounded by 2·half_window+1 per
    row — a constant, never data-sized) and the median is the explicit
    two-element formula ((s[(n+1) DIV 2] + s[n DIV 2 + 1]) / 2, exact
    for odd n) — spelled the SAME way in the oracle so even-n averages
    see identical bits. Values grid-recover to 4 decimals first (the
    ts_* convention); the median of grid values ships RAW. One shuffle
    on the series key."""
    w = (Window.partitionBy("code").orderBy("date")
         .rowsBetween(-half_window, half_window))
    vals = long_df.select(
        "date", "code",
        F.round(F.col("value"), 4).alias("value"),
    ).select(
        "date", "code", "value",
        F.array_sort(F.collect_list("value").over(w)).alias("_s"),
    ).select(
        "date", "code", "value", "_s",
        F.size("_s").cast("bigint").alias("_n"),
    )
    lo = F.element_at(F.col("_s"), ((F.col("_n") + 1) / 2)
                      .cast("int"))
    hi = F.element_at(F.col("_s"), (F.col("_n") / 2 + 1).cast("int"))
    out = vals.select(
        "date", "code", "value",
        ((lo + hi) / 2).alias("roll_median"),
    )
    return out.orderBy("code", "date") if sort else out


def ols_trend(long_df: DataFrame, sort: bool = True) -> DataFrame:
    """Per-series OLS time trend — slope, intercept, R² of value on the
    observation index — in EXACT fixed-point arithmetic so Spark and a
    SQL oracle agree bit-for-bit (the CLAUDE.md iterative/fixed-point
    rule applied to regression sums).

    Recipe: x = 1..n (row position by date within the series), y =
    value in integer cents (each daily value is a sum of 2-decimal
    prices, so round(value·100) recovers the exact grid integer).
    Sx/Sxx/Sy/Sxy accumulate as BIGINT (exact, merge-order-free);
    Syy as DECIMAL(38,0) (y² would overflow bigint at bench scale).
    The normal-equation terms num = n·Sxy−Sx·Sy, denx = n·Sxx−Sx²,
    deny = n·Syy−Sy² combine in DECIMAL (exact integers), convert to
    double ONCE (round-to-nearest of the same exact integer in both
    engines → identical bits), and slope/intercept/r2 ship RAW per the
    never-round-derived-doubles rule. Exact-integer headroom holds
    through ~sf100 (Sxy < 1e18); beyond that, widen Sxy to DECIMAL too.

    ONE shuffle on the series code — the groupBy reuses the
    row_number window's hash partitioning. Degenerate series (n = 1,
    or zero y-variance for r2) yield NULL via guarded division."""
    from pyperustats_spark.functions.stats import ols_exact

    w = Window.partitionBy("code").orderBy("date")
    y = long_df.select(
        "code",
        F.row_number().over(w).cast("bigint").alias("_x"),
        F.round(F.col("value") * 100).cast("bigint").alias("_yc"),
    )
    out = ols_exact(y, ["code"], x="_x", y="_yc",
                    x_scale=1.0, y_scale=100.0)
    return out.orderBy("code") if sort else out


def rebase_index(long_df: DataFrame, base_date: str,
                 sort: bool = True) -> DataFrame:
    """Rebase every series to index = 100 at *base_date* — how central-
    bank series are published and compared (reference frames carry
    '(índice 2007=100)'-style units); series lacking an observation on
    the base date get NULL indices rather than a silent drop.

    The per-series base is a one-row-per-code frame joined back
    (AQE-decided); both sides grid-recover their value (round-2) so
    the ratio divides identical doubles and ships RAW (never round
    derived output — working-notes rule)."""
    v = F.round(F.col("value"), 2)
    base = long_df.where(
        F.col("date") == F.lit(base_date).cast("timestamp")
    ).select("code", v.alias("_base"))
    out = (
        long_df.select("date", "code", "value", v.alias("_v"))
        .join(base, "code", "left")
        .select(
            "date", "code", "value",
            (F.lit(100.0) * F.try_divide(F.col("_v"), F.col("_base")))
            .alias("index_value"),
        )
    )
    return out.orderBy("date", "code") if sort else out


def decompose_additive(long_df: DataFrame, half_window: int = 6,
                       sort: bool = True) -> DataFrame:
    """Classical additive decomposition per series:
    value ≈ trend (centered MA) + seasonal (month-of-year mean of the
    detrended series) + residual — :func:`trend_ma` and a seasonal
    join composed into the one decomposition table analysts actually
    read.

    Determinism ladder: trend and detrended are bit-identical
    cross-engine (grid-recovery, see trend_ma); the seasonal mean sums
    those identical doubles with an ORDERED cumulative window — both
    engines accumulate in the same date order, so the sum (and the raw
    mean, and the residual) is bit-identical too. A plain groupBy sum
    here was measured FLAKY: Spark's partial-aggregate merge order
    varies run-to-run, and 3 of 72 seasonal means on the test data sit
    within 1e-8 of a round-6 midpoint — no output rounding can fix an
    input that wobbles. Shuffles: one series window + one (code,
    month) window + an AQE-decided join back of the 12-rows-per-code
    seasonal frame."""
    base = trend_ma(long_df, half_window=half_window, sort=False) \
        .withColumn("_m", F.month("date"))
    wcm = Window.partitionBy("code", "_m")
    csum = F.sum("detrended").over(
        wcm.orderBy("date").rowsBetween(Window.unboundedPreceding, 0))
    rk = F.row_number().over(wcm.orderBy(F.desc("date")))
    seasonal = (
        base.withColumn("_cs", csum)
        .withColumn("_n", F.count(F.lit(1)).over(wcm))
        .withColumn("_rk", rk)
        .where(F.col("_rk") == 1)
        .select("code", "_m",
                (F.col("_cs") / F.col("_n")).alias("seasonal"))
    )
    out = (
        base.join(seasonal, ["code", "_m"])
        .select(
            "date", "code", "value", "trend", "seasonal",
            (F.col("detrended") - F.col("seasonal")).alias("residual"),
        )
    )
    return out.orderBy("date", "code") if sort else out


def theil_sen_slope(long_df: DataFrame, frequency: str = "M",
                    sort: bool = True) -> DataFrame:
    """Per-series Theil–Sen robust trend: the MEDIAN of all pairwise
    slopes (y_j − y_i)/(x_j − x_i) — the estimator that tolerates up
    to ~29 % outliers where :func:`ols_trend`'s least squares breaks
    (one spike month drags an OLS slope arbitrarily; it moves a median
    of n²/2 slopes almost nowhere). Returns (code, n_months,
    sen_slope) — slope in value-units per period.

    Scale shape: Theil–Sen is inherently O(n²) in SERIES LENGTH, so
    the series is resampled to *frequency* first — n is then bounded
    by calendar history (a century of months is 1200 points → ≤ 0.72M
    slopes per series), never by row count, and the pair generation
    runs IN-ARRAY per series (one groupBy shuffle of (x, y_cents)
    pairs, nested transform over the collected array inside codegen)
    — data-sized input, calendar-bounded compute per task.

    Determinism ladder: monthly sums grid-recover to 2 decimals then
    integer cents (the ols_trend recipe); every pairwise slope is
    bigint/bigint IEEE division → bit-identical cross-engine; the
    median is the explicit two-element formula over the sorted slope
    array (the rolling_median recipe) and the final /100 rescale
    divides identical bits. Ships raw. Series with <2 points yield
    NULL slope."""
    m = resample(long_df, frequency, sort=False).select(
        "period", "code", F.round(F.col("value_sum"), 2).alias("_v"))
    w = Window.partitionBy("code").orderBy("period")
    xy = m.select(
        "code",
        F.row_number().over(w).cast("bigint").alias("x"),
        F.round(F.col("_v") * 100).cast("bigint").alias("yc"),
    )
    g = xy.groupBy("code").agg(
        F.array_sort(F.collect_list(F.struct("x", "yc"))).alias("_a"),
        F.count(F.lit(1)).alias("n_months"),
    )
    slopes = F.array_sort(F.flatten(F.transform(
        F.col("_a"),
        lambda a, i: F.transform(
            F.slice(F.col("_a"), i + F.lit(2), F.size(F.col("_a"))),
            lambda b: (b["yc"] - a["yc"]) / (b["x"] - a["x"])),
    )))
    out = g.select("code", "n_months", slopes.alias("_s")).select(
        "code", "n_months",
        (F.when(
            F.size("_s") >= 1,
            (F.element_at("_s", ((F.size("_s") + 1) / 2).cast("int"))
             + F.element_at("_s", (F.size("_s") / 2 + 1).cast("int"))) / 2)
         / 100).alias("sen_slope"),
    )
    return out.orderBy("code") if sort else out


def rolling_mad_anomalies(long_df: DataFrame, half_window: int = 7,
                          k: float = 3.5, sort: bool = True) -> DataFrame:
    """Robust rolling anomaly flags per series: a point is anomalous
    when it sits more than k·1.4826·MAD from the centered rolling
    median — the windowed version of
    :func:`~pyperustats_spark.operators.relational.mad_outliers`
    (a level shift moves the global median; the rolling window tracks
    it, so only LOCAL spikes flag). Returns (date, code, value,
    roll_med, roll_mad, is_anomaly).

    Same bounded-window mechanics as :func:`rolling_median`: the
    2·half_window+1 values ride a collect_list window (constant-size,
    never data-sized), median and MAD both use the explicit
    two-element formula over sorted arrays, and the deviation array
    is let-bound so CollapseProject cannot re-sort it per reference
    (CLAUDE.md). Values grid-recover to 4 decimals; roll_med /
    roll_mad / the flag threshold are all derived from identical bits
    and ship raw — the strict > comparison therefore cannot flake
    cross-engine. is_anomaly is int 0/1."""
    from pyperustats_spark.functions.text import let

    w = (Window.partitionBy("code").orderBy("date")
         .rowsBetween(-half_window, half_window))
    vals = long_df.select(
        "date", "code", F.round(F.col("value"), 4).alias("value"),
    ).select(
        "date", "code", "value",
        F.array_sort(F.collect_list("value").over(w)).alias("_s"),
    ).select(
        "date", "code", "value", "_s",
        F.size("_s").cast("bigint").alias("_n"),
    )

    def two_mid(arr, n):
        return (F.element_at(arr, ((n + 1) / 2).cast("int"))
                + F.element_at(arr, (n / 2 + 1).cast("int"))) / 2

    staged = vals.select(
        "date", "code", "value", "_s", "_n",
        two_mid(F.col("_s"), F.col("_n")).alias("roll_med"),
    )
    mad = let(
        F.array_sort(F.transform(
            "_s", lambda x: F.abs(x - F.col("roll_med")))),
        lambda d: two_mid(d, F.col("_n")),
    )
    out = staged.select(
        "date", "code", "value", "roll_med", mad.alias("roll_mad"),
    ).select(
        "date", "code", "value", "roll_med", "roll_mad",
        (F.abs(F.col("value") - F.col("roll_med"))
         > F.lit(k) * F.lit(1.4826) * F.col("roll_mad"))
        .cast("int").alias("is_anomaly"),
    )
    return out.orderBy("code", "date") if sort else out


def seasonal_strength(long_df: DataFrame, half_window: int = 6,
                      sort: bool = True) -> DataFrame:
    """Per-series seasonality / trend strength (the tsfeatures pair,
    Hyndman): F_seas = max(0, 1 − Var(resid)/Var(seasonal + resid)),
    F_trend = max(0, 1 − Var(resid)/Var(trend + resid)) — one number
    per series saying how much of the signal the decomposition
    actually explained, the triage statistic for WHICH of thousands
    of series deserve a seasonal model. Built directly on
    :func:`decompose_additive`. Returns (code, n_obs,
    seasonal_strength, trend_strength).

    Determinism ladder: trend/seasonal/residual are already
    bit-identical cross-engine (decompose's grid + ordered-cumsum
    recipe); every variance term here accumulates via an ORDERED
    cumulative window too (plain groupBy double sums are
    merge-order-nondeterministic run-to-run — CLAUDE.md), so
    Σx, Σx² are identical bits, and Var = Σx²/n − (Σx/n)² combines
    them raw. Strengths ship raw; zero-variance series yield NULL via
    try_divide. One extra window pass on the existing (code) → (code,
    date) partitioning — no new shuffle beyond decompose's own."""
    d = decompose_additive(long_df, half_window=half_window, sort=False)
    r = F.col("residual")
    sr = F.col("seasonal") + F.col("residual")
    tr = F.col("trend") + F.col("residual")
    wc = Window.partitionBy("code").orderBy("date") \
        .rowsBetween(Window.unboundedPreceding, 0)
    rk = F.row_number().over(
        Window.partitionBy("code").orderBy(F.desc("date")))
    c = d.select(
        "code",
        F.sum(r * r).over(wc).alias("_rr"),
        F.sum(r).over(wc).alias("_r1"),
        F.sum(sr * sr).over(wc).alias("_ss"),
        F.sum(sr).over(wc).alias("_s1"),
        F.sum(tr * tr).over(wc).alias("_tt"),
        F.sum(tr).over(wc).alias("_t1"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("_n"),
        rk.alias("_rk"),
    ).where(F.col("_rk") == 1)

    def var(sq, s1, n):
        return sq / n - (s1 / n) * (s1 / n)

    vr = var(F.col("_rr"), F.col("_r1"), F.col("_n"))

    def strength(sq, s1):
        # NULL (not 0) when the denominator variance is degenerate —
        # same CASE the oracle spells, so the guard cannot diverge
        vd = var(sq, s1, F.col("_n"))
        return F.when(vd > 0, F.greatest(F.lit(0.0),
                                         F.lit(1.0) - vr / vd))

    out = c.select(
        "code", F.col("_n").alias("n_obs"),
        strength(F.col("_ss"), F.col("_s1")).alias("seasonal_strength"),
        strength(F.col("_tt"), F.col("_t1")).alias("trend_strength"),
    )
    return out.orderBy("code") if sort else out


def bollinger_bands(long_df: DataFrame, window: int = 20,
                    n_sigmas: int = 2, sort: bool = True) -> DataFrame:
    """Bollinger bands over each series' daily values: trailing
    *window*-row moving average ± *n_sigmas* rolling standard
    deviations, plus an outside-band flag — the volatility envelope
    companion of ts_zscore_anomalies (global σ there, LOCAL rolling σ
    here, so regime changes move the band with the series). Emitted
    once a full window exists (row *window* onward). Returns
    (date, code, value, ma, lower, upper, outside).

    Cross-engine exactness: values snap to integer CENTS (2-grid
    money), window sums S and Q = Σx² are exact bigint window
    aggregates (ROWS frame, integer arithmetic — merge order cannot
    matter), ma = S/(100·w) raw, and the population σ uses
    σ·100·w = sqrt(w·Q − S²) where sqrt is CORRECTLY ROUNDED IEEE —
    every band value derives from identical bits in both engines, no
    rounding recipe needed anywhere. One shuffle on the series key;
    per-partition rows = series length (the depth-axis scaling study's
    window family)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    cents = F.round(F.round(F.col("value"), 2) * 100).cast("bigint")
    w = (Window.partitionBy("code").orderBy("date")
         .rowsBetween(-(window - 1), 0))
    wn = Window.partitionBy("code").orderBy("date")
    staged = long_df.select(
        "date", "code", "value",
        cents.alias("_c"),
    ).select(
        "date", "code", "value", "_c",
        F.sum("_c").over(w).cast("bigint").alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).over(w).cast("bigint")
        .alias("_q"),
        F.row_number().over(wn).alias("_rn"),
    ).where(F.col("_rn") >= window)
    ma = F.col("_s") / F.lit(100.0 * window)
    # w·Q − S² in DECIMAL(38,0): S² overflows bigint once a window's
    # cents sum passes ~3e9 (observed within reach at sf0.1 already);
    # the exact wide integer casts to the same double in both engines
    # (ols_exact precedent; oracle uses HUGEINT)
    s19 = F.col("_s").cast("decimal(19,0)")
    q19 = F.col("_q").cast("decimal(19,0)")
    sigma = (F.sqrt((F.lit(window) * q19 - s19 * s19).cast("double"))
             / F.lit(100.0 * window))
    out = staged.select(
        "date", "code", "value",
        ma.alias("ma"),
        (ma - n_sigmas * sigma).alias("lower"),
        (ma + n_sigmas * sigma).alias("upper"),
        # the flag compares the GRID-EXACT value (_c / 100.0) against
        # the bands — not the raw double sum, which is merge-order-
        # nondeterministic at the ulp level: in a zero-variance window
        # lower == ma == upper and an ulp flips the flag (ADVICE r8).
        # Both predicate sides now derive from identical bits in both
        # engines; no rounding anywhere (round-2 of a DERIVED band
        # would reopen the midpoint trap).
        ((F.col("_c") / 100.0 < ma - n_sigmas * sigma)
         | (F.col("_c") / 100.0 > ma + n_sigmas * sigma))
        .cast("int").alias("outside"),
    )
    return out.orderBy("code", "date") if sort else out


def seasonal_anomalies(long_df: DataFrame, half_window: int = 6,
                       k: float = 3.5, sort: bool = True) -> DataFrame:
    """Seasonal-adjusted anomaly detection: decompose each series
    (:func:`decompose_additive`), then flag dates whose RESIDUAL sits
    more than k robust sigmas (1.4826·MAD) from the per-series
    residual median — the anomaly test that ignores both trend drift
    and the seasonal shape, where a raw z-score
    (:func:`zscore_anomalies`) re-alarms every December.

    Determinism ladder: residuals are bit-identical cross-engine (the
    decompose recipe); the median/MAD are exact `percentile` over
    those identical doubles (quantile_cont in the oracle — the
    stats_mad_outliers pairing); the flag and the robust z divide and
    compare identical bits, ship raw. Zero-MAD series (constant
    residual) flag nothing by construction.

    Scale: decompose's windows + two per-code exact medians (medians
    cannot merge map-side — the mad_outliers three-pass contract; at
    100 TB swap percentile for approx_percentile as stats_profile
    does). The decomposed frame is persisted — the median pass and
    the flag join both read it, and Catalyst re-executes unpersisted
    subtrees per reference."""
    res = decompose_additive(long_df, half_window=half_window,
                             sort=False).persist()
    med = res.groupBy("code").agg(
        F.percentile("residual", F.lit(0.5)).alias("_med"))
    dev = res.join(med, "code").withColumn(
        "_adev", F.abs(F.col("residual") - F.col("_med"))).persist()
    mad = dev.groupBy("code").agg(
        F.percentile("_adev", F.lit(0.5)).alias("_mad"))
    out = (
        dev.join(mad, "code")
        .where((F.col("_mad") > 0)
               & (F.col("_adev") > k * 1.4826 * F.col("_mad")))
        .select(
            "code", "date", "value", "residual",
            F.try_divide(F.col("residual") - F.col("_med"),
                         1.4826 * F.col("_mad")).alias("robust_z"),
        )
    )
    return out.orderBy("code", "date") if sort else out


def hp_filter(long_df: DataFrame, lam: float = 1600.0,
              sort: bool = True) -> DataFrame:
    """Hodrick–Prescott trend/cycle decomposition per series — THE
    macroeconomic detrending filter (Hodrick & Prescott 1997; the
    BCRP-series analog of everything the reference's time-series
    consumers do with economic indicators): trend τ minimizes
    Σ(y_t − τ_t)² + λ·Σ(Δ²τ_t)², i.e. τ = (I + λKᵀK)⁻¹y with K the
    second-difference operator. Emits (date, code, value, trend,
    cycle = value − trend).

    The normal-equation matrix is symmetric positive-definite
    PENTADIAGONAL, so each series solves in O(n) with a banded LDLᵀ
    factorization (no scipy needed, no O(n³) dense solve) inside the
    documented grouped-map escape hatch (``applyInPandas``, Arrow
    batches) — same class as ewma/holt_winters. λ defaults to the
    canonical quarterly 1600; 129600 for monthly (Ravn–Uhlig).

    Rows-only (no SQL oracle: the solve is a float linear system —
    orderless SQL's weak spot); pytest pins the banded solve against
    a dense ``np.linalg.solve`` oracle, the λ=0 identity (trend == y)
    and the exact-reproduction property on linear series (Δ²y = 0 ⇒
    penalty-free perfect fit, cycle ≡ 0 at any λ).

    Straggler bound (100-TB posture): one series = ONE task (the
    solve couples every row of a series — it cannot be chunked), but
    the per-task cost is O(n) with tiny constants, so the bound is
    milder than the exact-integer folds'. Pre-flight with
    ``ts_series_depth_profile``; split by adding series keys, never
    by splitting one series' history. NULL/NaN values are dropped
    from the solve (the filter is defined on the observed points);
    series shorter than 3 points have no curvature to penalize —
    trend = value, cycle = 0."""
    if lam < 0:
        raise ValueError("lam must be >= 0")
    import numpy as np
    import pandas as pd

    out_schema = ("date timestamp, code string, value double, "
                  "trend double, cycle double")

    def _hp_solve(y: "np.ndarray", lam: float) -> "np.ndarray":
        n = len(y)
        if n < 3 or lam == 0.0:
            return y.copy()
        # bands of A = I + lam * K'K (pentadiagonal, SPD)
        a = np.full(n, 1.0 + 6.0 * lam)
        a[0] = a[-1] = 1.0 + lam
        a[1] = a[-2] = 1.0 + 5.0 * lam
        if n == 3:
            # the two edge-adjacent entries are the SAME cell: K is a
            # single row [1, -2, 1], so the middle diagonal is 1 + 4λ
            a[1] = 1.0 + 4.0 * lam
        b = np.full(n, -4.0 * lam)          # A[i, i-1], valid i >= 1
        b[1] = b[-1] = -2.0 * lam
        # LDL': unit-lower bands e (sub1), f (sub2), pivots d
        d = np.empty(n)
        e = np.zeros(n)
        f = np.zeros(n)
        d[0] = a[0]
        e[1] = b[1] / d[0]
        d[1] = a[1] - e[1] * e[1] * d[0]
        for i in range(2, n):
            f[i] = lam / d[i - 2]
            e[i] = (b[i] - f[i] * d[i - 2] * e[i - 1]) / d[i - 1]
            d[i] = (a[i] - f[i] * f[i] * d[i - 2]
                    - e[i] * e[i] * d[i - 1])
        # forward: L z = y
        z = np.empty(n)
        z[0] = y[0]
        z[1] = y[1] - e[1] * z[0]
        for i in range(2, n):
            z[i] = y[i] - e[i] * z[i - 1] - f[i] * z[i - 2]
        # diagonal + back-substitution: L' tau = z / d
        z /= d
        tau = np.empty(n)
        tau[-1] = z[-1]
        tau[-2] = z[-2] - e[-1] * tau[-1]
        for i in range(n - 3, -1, -1):
            tau[i] = z[i] - e[i + 1] * tau[i + 1] - f[i + 2] * tau[i + 2]
        return tau

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("date").reset_index(drop=True)
        mask = pdf["value"].notna().to_numpy()
        trend = np.full(len(pdf), np.nan)
        if mask.any():
            trend[mask] = _hp_solve(
                pdf["value"].to_numpy(dtype="float64")[mask], lam)
        pdf = pdf.assign(trend=trend,
                         cycle=pdf["value"].to_numpy() - trend)
        return pdf[["date", "code", "value", "trend", "cycle"]]

    out = long_df.select("date", "code", "value") \
        .groupBy("code").applyInPandas(fold, out_schema)
    return out.orderBy("code", "date") if sort else out


def spearman_matrix(long_df: DataFrame, sort: bool = True) -> DataFrame:
    """All-pairs Spearman rank correlation between series — the
    robust (monotone-invariant, outlier-insensitive) complement of
    the Pearson probes (:func:`cross_correlation`, :func:`series_beta`)
    for the "which indicators co-move" triage across a catalogue.
    Returns (code_a, code_b, n_obs, spearman) for every unordered code
    pair over their COMMON dates, code_a < code_b.

    Cross-engine-exact by construction: values are grid-recovered to
    cents first (round-2, the max_drawdown recipe) so ties agree
    bit-for-bit; ranks enter as integer DOUBLED average ranks
    (2·rank_min + ties − 1 — average fractional ranks with no .5
    floats); the Pearson form on those integers (tie-correct, unlike
    the 6Σd² shortcut) accumulates every sum in DECIMAL(38,0)
    (DuckDB HUGEINT), and only the final sqrt/divide run in doubles —
    correctly rounded IEEE ops, identical bits.

    Scale shape: the date-spine pairing join has per-date multiplicity
    ≤ |codes|² (codes are a fixed catalogue dimension, not a growing
    key — the audited |types|² class); rank windows partition by the
    PAIR, so depth is bounded by the joint series length, and the
    final reduction is one partial-aggregated groupBy per pair."""
    v = F.round(F.col("value"), 2)
    base = long_df.select("date", "code", v.alias("_v"))
    a = base.select("date", F.col("code").alias("code_a"),
                    F.col("_v").alias("_va"))
    b = base.select("date", F.col("code").alias("code_b"),
                    F.col("_v").alias("_vb"))
    joint = a.join(b, "date").where(F.col("code_a") < F.col("code_b"))
    pair = ["code_a", "code_b"]
    wa = Window.partitionBy(*pair).orderBy("_va")
    wb = Window.partitionBy(*pair).orderBy("_vb")
    ta = Window.partitionBy(*pair, "_va")
    tb = Window.partitionBy(*pair, "_vb")
    ranked = joint.select(
        *pair,
        (2 * F.rank().over(wa) + F.count(F.lit(1)).over(ta) - 1)
        .cast("bigint").alias("_ra"),
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(tb) - 1)
        .cast("bigint").alias("_rb"),
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    sums = ranked.groupBy(*pair).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(dec(F.col("_ra"))).alias("_sa"),
        F.sum(dec(F.col("_rb"))).alias("_sb"),
        F.sum(dec(F.col("_ra")) * F.col("_rb")).alias("_sab"),
        F.sum(dec(F.col("_ra")) * F.col("_ra")).alias("_saa"),
        F.sum(dec(F.col("_rb")) * F.col("_rb")).alias("_sbb"),
    )
    n = dec(F.col("n_obs"))
    num = (n * F.col("_sab") - F.col("_sa") * F.col("_sb"))
    da = (n * F.col("_saa") - F.col("_sa") * F.col("_sa"))
    db = (n * F.col("_sbb") - F.col("_sb") * F.col("_sb"))
    out = sums.select(
        *pair, "n_obs",
        F.try_divide(
            num.cast("double"),
            F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))
        ).alias("spearman"),
    )
    return out.orderBy(*pair) if sort else out


def pettitt_test(long_df: DataFrame, sort: bool = True) -> DataFrame:
    """Pettitt rank changepoint per series: the nonparametric
    single-changepoint locator — K = max_t |U_t|,
    U_t = Σ_{i≤t} R2_i − t(n+1) with R2 the DOUBLED average ranks of
    the full series — robust to outliers and any monotone transform,
    the rank-based complement of the mean-shift CUSUM locator
    (:func:`cusum_changepoint`). Returns (code, n_obs, change_date,
    k_stat, k_norm): change_date = last point of the first segment
    (earliest date on K ties), k_norm = K / (n(n+1)) ∈ [0, 1] shipped
    as a raw bigint/bigint divide (bit-identical cross-engine; the
    classic exp() p-value approximation is deliberately NOT computed
    here — exp differs by ulps across engines, and k_norm orders
    series for triage just as well).

    Cross-engine-exact: cents grid first, integer doubled ranks, U_t
    an ordered integer cumsum, |U| argmax tie-broken on date — every
    compared quantity is a bigint. Scale: two windows on the SAME
    series partitioning (rank, then date-ordered running sum), one
    groupBy for n, one min-struct argmax — no global sort, no
    count-over-window on an unbounded key."""
    v = F.round(F.col("value"), 2)
    base = long_df.select("date", "code", v.alias("_v"))
    wr = Window.partitionBy("code").orderBy("_v")
    wt = Window.partitionBy("code", "_v")
    wc = Window.partitionBy("code").orderBy("date") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wi = Window.partitionBy("code").orderBy("date")
    ranked = base.select(
        "code", "date",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1)
        .cast("bigint").alias("_r2"),
    ).select(
        "code", "date",
        F.sum("_r2").over(wc).alias("_w2"),
        F.row_number().over(wi).cast("bigint").alias("_t"),
    )
    ns = long_df.groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    u = ranked.join(ns, "code").where(F.col("_t") < F.col("n_obs")) \
        .select(
            "code", "date", "n_obs",
            (F.col("_w2") - F.col("_t") * (F.col("n_obs") + 1))
            .alias("_u"))
    best = u.groupBy("code").agg(
        F.min("n_obs").alias("n_obs"),
        F.min(F.struct(
            (-F.abs(F.col("_u"))).alias("_negk"),
            F.col("date").alias("date"))).alias("_w"))
    out = best.select(
        "code", "n_obs",
        F.col("_w.date").alias("change_date"),
        (-F.col("_w._negk")).alias("k_stat"),
        F.try_divide(-F.col("_w._negk"),
                     F.col("n_obs") * (F.col("n_obs") + 1))
        .alias("k_norm"),
    )
    return out.orderBy("code") if sort else out


def cusum_binary_segmentation(long_df: DataFrame, min_seg: int = 4,
                              sort: bool = True) -> DataFrame:
    """Two-level binary segmentation per series — the MULTIPLE-
    changepoint extension of :func:`cusum_changepoint`: split at the
    level-1 CUSUM argmax, then locate a second candidate INSIDE each
    side segment with the identical statistic. One row per (series,
    segment): (code, level, segment, n_seg, change_date, cusum_stat)
    — level 1 is the full-series split ('all'), level 2 the 'L'/'R'
    side candidates (segments shorter than *min_seg* are dropped —
    their statistic is noise). Consumers iterate: the level-2 stats
    ARE the next round's split decisions, so a fixed-depth plan keeps
    the whole recursion in two window passes instead of a
    driver-side loop.

    Exactness: the same fixed-point wide-integer statistic as the
    single-split locator (S_num = n·cumsum − t·total in
    DECIMAL(38,0), cents grid, earliest-date tiebreak), recomputed
    per segment — every argmax is pure integer arithmetic, so the
    SEGMENT BOUNDARIES are bit-deterministic cross-engine, which is
    what makes the level-2 recursion oracle-checkable at all.

    Scale shape: level 2 reuses the level-1 partitioning with a
    side-flag sub-key (no new shuffle class); the cents frame and the
    |codes|-row level-1 winners are persisted (each feeds two
    references — the CLAUDE.md re-execution rule); winners are
    map-side min-struct argmaxes, never ranked windows."""
    vals = long_df.select("date", "code",
                          _cents().alias("_c")).persist()

    def _pick(frame: DataFrame, keys: list) -> DataFrame:
        wc = (Window.partitionBy(*keys).orderBy("date")
              .rowsBetween(Window.unboundedPreceding, 0))
        wn = Window.partitionBy(*keys).orderBy("date")
        cum = frame.select(
            *keys, "date",
            F.sum("_c").over(wc).alias("_cum"),
            F.row_number().over(wn).cast("bigint").alias("_t"))
        tot = frame.groupBy(*keys).agg(
            F.sum("_c").alias("_tc"),
            F.count(F.lit(1)).cast("bigint").alias("_n"))
        c = cum.join(tot, keys).select(
            *keys, "date", "_n",
            F.abs(F.col("_n").cast("decimal(19,0)") * F.col("_cum")
                  - F.col("_t").cast("decimal(19,0)") * F.col("_tc"))
            .cast("decimal(38,0)").alias("_abs_s"))
        return (c.groupBy(*keys)
                .agg(F.min(F.struct(
                    (-F.col("_abs_s")).alias("ns"),
                    F.col("date").alias("change_date"),
                    F.col("_n").alias("n"))).alias("_m"))
                .select(*keys,
                        F.col("_m.change_date").alias("change_date"),
                        F.try_divide((-F.col("_m.ns")).cast("double"),
                                     F.lit(100.0) * F.col("_m.n"))
                        .alias("cusum_stat"),
                        F.col("_m.n").alias("n_seg")))

    l1 = _pick(vals, ["code"]).persist()
    sides = vals.join(
        l1.select("code", F.col("change_date").alias("_cp")), "code"
    ).select(
        "code",
        F.when(F.col("date") <= F.col("_cp"), "L").otherwise("R")
        .alias("_side"),
        "date", "_c")
    l2 = _pick(sides, ["code", "_side"]) \
        .where(F.col("n_seg") >= min_seg)
    out = (
        l1.select("code", F.lit(1).alias("level"),
                  F.lit("all").alias("segment"), "n_seg",
                  "change_date", "cusum_stat")
        .unionByName(
            l2.select("code", F.lit(2).alias("level"),
                      F.col("_side").alias("segment"), "n_seg",
                      "change_date", "cusum_stat"))
    )
    return out.orderBy("code", "level", "segment") if sort else out


def seasonal_naive_eval(long_df: DataFrame, season: int = 7,
                        sort: bool = True) -> DataFrame:
    """Forecast-benchmark card per series: how much better is the
    SEASONAL naive forecast (x̂_t = x_{t−m}, m = *season* observations
    back) than the one-step naive (x̂_t = x_{t−1})? Ships both MAEs
    and their ratio — Hyndman & Koehler's MASE denominator logic
    (IJF 22:679, 2006) turned into a per-series seasonality-value
    readout: ratio < 1 means the season carries real signal, ≈ 1
    means last-observation-carried-forward is just as good, and the
    downstream forecaster (ts_holt_winters, ts_backtest_exact) should
    beat BOTH maes to justify itself.

    Lags are INDEX lags over the observed per-code sequence (the
    standard in-sample MASE convention), not calendar offsets — gap
    days simply don't contribute pairs.

    Cross-engine determinism: values snap to integer cents (the
    series_long 2-decimal grid), absolute errors are exact bigints,
    each MAE is one int/int IEEE division, and the ratio divides two
    such doubles — identical bits everywhere; a constant series makes
    the denominator 0 → NULL via try_divide/CASE.

    Scale shape: one ordered window per code (bounded by series
    depth, the standard ts class) computing both lags in a single
    pass, then one partial-aggregated per-code rollup. Series with
    ≤ *season* observations emit n_seasonal_pairs = 0 and NULL maes."""
    cents = F.round(F.round(F.col("value"), 2) * 100).cast("bigint")
    w = Window.partitionBy("code").orderBy("date")
    lagged = long_df.select(
        "code", cents.alias("_c"),
        F.lag(cents, 1).over(w).alias("_l1"),
        F.lag(cents, season).over(w).alias("_lm"))
    per = lagged.groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(F.when(F.col("_l1").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_naive_pairs"),
        F.sum(F.when(F.col("_lm").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_seasonal_pairs"),
        F.sum(F.abs(F.col("_c") - F.col("_l1"))).cast("bigint")
        .alias("_ae1"),
        F.sum(F.abs(F.col("_c") - F.col("_lm"))).cast("bigint")
        .alias("_aem"),
    )
    mae1 = F.try_divide(F.col("_ae1"), F.col("n_naive_pairs"))
    maem = F.try_divide(F.col("_aem"), F.col("n_seasonal_pairs"))
    out = per.select(
        "code", "n_obs", "n_naive_pairs", "n_seasonal_pairs",
        mae1.alias("mae_naive_cents"),
        maem.alias("mae_seasonal_cents"),
        F.try_divide(maem, mae1).alias("mase_ratio"),
    )
    return out.orderBy("code") if sort else out


def hurst_rs(long_df: DataFrame, scales: tuple[int, ...] = (16, 32, 64, 128),
             sort: bool = True) -> DataFrame:
    """Hurst exponent per series by classic rescaled-range (R/S)
    analysis (Hurst 1951; Mandelbrot & Wallis 1969): chop the series
    into non-overlapping blocks of s observations for each scale s,
    compute each block's R/S = (range of cumulative mean deviations)
    / (population std), and read H as the log–log slope of the
    block-averaged R/S against s. H ≈ 0.5 is a random walk, > 0.5
    long-range persistence (trends compound), < 0.5 mean reversion —
    the memory diagnostic that says whether ts_holt-style level
    models or differencing is the right default for a series family.

    Exactness recipe: with integer cents c, block sums S = ΣC and
    positions j, the cumulative deviation is the INTEGER
    W_j = s·CC_j − j·S (×s-scaled; W_s = 0 lands the classic
    include-zero convention automatically), so R_scaled = max W −
    min W and the variance term s·Q − S² are exact integers and
    R/S = R_scaled / √(sQ − S²) is one correctly-rounded tree.
    ln(R/S) — ulp-loose — snaps to the 1e-6 integer grid (exact
    bigint per-scale sums); the log–log slope then runs on k ≤ 4
    scale rows through an ORDERED cumulative window (the anova
    idiom) with x = round(ln s·10⁶) — integer grid points whose
    fractional parts sit far from every rounding midpoint for the
    default scales, so both engines agree bit-for-bit. Zero-variance
    blocks drop in both engines; < 2 usable scales → NULL H.

    Scale shape: ONE per-code row_number window (standard ts class),
    a fixed |scales|× explode, ONE exchange per (code, scale, block)
    partition carrying a cumsum + three unbounded-frame sums over
    ≤ max(scales) rows (bounded groups — never row-count-sized),
    then value-bounded rollups. No joins anywhere."""
    cents = F.round(F.round(F.col("value"), 2) * 100).cast("bigint")
    wrn = Window.partitionBy("code").orderBy("date")
    base = long_df.select(
        "code", cents.alias("_c"),
        F.row_number().over(wrn).cast("bigint").alias("_rn"))
    stack_expr = "stack({}, {}) as (_s0)".format(
        len(scales), ", ".join(str(s) for s in scales))
    ex = base.selectExpr("code", "_c", "_rn", stack_expr) \
        .select("code", "_c", "_rn",
                F.col("_s0").cast("bigint").alias("_s"),
                F.expr("(_rn - 1) div cast(_s0 as bigint)").alias("_b"))
    wb = Window.partitionBy("code", "_s", "_b")
    wbo = wb.orderBy("_rn").rowsBetween(Window.unboundedPreceding, 0)

    def dec(c):
        return c.cast("decimal(38,0)")

    rowsw = ex.select(
        "code", "_s", "_b",
        F.row_number().over(wb.orderBy("_rn")).cast("bigint").alias("_j"),
        F.sum("_c").over(wbo).alias("_cc"),
        F.sum("_c").over(wb).cast("bigint").alias("_bsum"),
        F.sum(dec(F.col("_c")) * F.col("_c")).over(wb).alias("_bq0"),
    ).select(
        "code", "_s", "_b", "_j", "_bsum", "_bq0",
        (F.col("_s") * F.col("_cc")
         - F.col("_j") * F.col("_bsum")).alias("_w"))
    blocks = rowsw.groupBy("code", "_s", "_b").agg(
        F.max("_j").alias("_nb"),
        F.max("_w").alias("_wmax"),
        F.min("_w").alias("_wmin"),
        F.min("_bsum").alias("_bs"),
        F.min("_bq0").alias("_bq"),
    ).where(F.col("_nb") == F.col("_s"))
    varn = (dec(F.col("_s")) * F.col("_bq")
            - dec(F.col("_bs")) * F.col("_bs"))
    rs = blocks.select(
        "code", "_s",
        varn.alias("_v"),
        (F.col("_wmax") - F.col("_wmin")).alias("_r"),
    ).where(F.col("_v") > 0).select(
        "code", "_s",
        F.round(F.log(F.col("_r").cast("double")
                      / F.sqrt(F.col("_v").cast("double"))) * 1e6)
        .cast("bigint").alias("_lnrs"))
    per_scale = rs.groupBy("code", "_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nblk"),
        F.sum("_lnrs").cast("bigint").alias("_slnrs"))
    x = F.round(F.log(F.col("_s").cast("double")) * 1e6).cast("bigint")
    y = F.col("_slnrs").cast("double") / F.col("_nblk").cast("double")
    wsc = Window.partitionBy("code").orderBy("_s") \
        .rowsBetween(Window.unboundedPreceding, 0)
    cums = per_scale.select(
        "code", "_s", "_nblk", x.alias("_x"), y.alias("_y")
    ).select(
        "code", "_s", "_nblk", "_x",
        F.sum("_y").over(wsc).alias("_cy"),
        F.sum(F.col("_x").cast("double") * F.col("_y")).over(wsc)
        .alias("_cxy"))
    agg = cums.groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scales"),
        F.sum("_nblk").cast("bigint").alias("n_blocks"),
        F.sum("_x").cast("bigint").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).cast("bigint").alias("_sxx"),
        F.max(F.struct("_s", "_cy", "_cxy")).alias("_last"))
    kd = F.col("n_scales").cast("double")
    sxd = F.col("_sx").cast("double")
    num = kd * F.col("_last._cxy") - sxd * F.col("_last._cy")
    den = (kd * F.col("_sxx").cast("double") - sxd * sxd)
    out = agg.select(
        "code", "n_scales", "n_blocks",
        F.when((F.col("n_scales") >= 2) & (den != 0),
               num / den).alias("hurst"),
    )
    return out.orderBy("code") if sort else out


def variance_ratio(long_df: DataFrame, qs: tuple[int, ...] = (2, 4, 8),
                   sort: bool = True) -> DataFrame:
    """Lo–MacKinlay variance-ratio test per series (Rev. Financial
    Studies 1:41, 1988): VR(q) = Var(q-period change) / (q · Var(1-
    period change)). A random walk has VR = 1 at every horizon;
    VR > 1 means momentum (changes compound), VR < 1 mean reversion —
    the parametric cousin of :func:`hurst_rs` with a classical
    asymptotic z under homoskedastic iid increments,
    z = (VR−1)/√(2(2q−1)(q−1)/(3q·n)). Returns one row per
    (code, q): (code, q, n_diffs, variance_ratio, z_iid).

    Exactness: changes are exact integer cents (c_t − c_{t−q} via
    index lags over the observed sequence, the seasonal_naive_eval
    convention); each variance is the fixed tree
    (n·Q − S²)/n² on DECIMAL(38,0)-exact sums cast to double
    (correctly rounded past 2^53), VR divides two such trees, and z
    uses only arithmetic + sqrt — bit-identical cross-engine.
    Degenerate series (zero base variance, n ≤ q) yield NULL via the
    same guards.

    Scale shape: ONE ordered window pass per code computing all
    |qs|+1 lags, a stack unpivot, one partial-aggregated rollup per
    (code, q) — the periodicity shape on value diffs; base-lag
    moments ride every (code, q) row via the stack (no second pass,
    no join)."""
    cents = F.round(F.round(F.col("value"), 2) * 100).cast("bigint")
    w = Window.partitionBy("code").orderBy("date")
    lag_cols = [F.lag(cents, 1).over(w).alias("_l1")]
    lag_cols += [F.lag(cents, q).over(w).alias(f"_l{q}") for q in qs]
    lagged = long_df.select("code", cents.alias("_c"), *lag_cols)
    # every (code, q) row also carries the base 1-diff so ONE rollup
    # yields both numerator and denominator moments
    stack_expr = "stack({}, {}) as (_q, _lq)".format(
        len(qs), ", ".join(f"{q}, _l{q}" for q in qs))
    pairs = lagged.selectExpr("code", "_c", "_l1", stack_expr) \
        .select("code", F.col("_q").cast("bigint").alias("_q"),
                (F.col("_c") - F.col("_lq")).alias("_dq"),
                (F.col("_c") - F.col("_l1")).alias("_d1"))

    def dec(c):
        return c.cast("decimal(38,0)")

    per = pairs.groupBy("code", "_q").agg(
        F.count(F.when(F.col("_dq").isNotNull(), 1)).cast("bigint")
        .alias("_nq"),
        F.sum(dec(F.col("_dq"))).alias("_sq"),
        F.sum(dec(F.col("_dq")) * F.col("_dq")).alias("_qq"),
        F.count(F.when(F.col("_d1").isNotNull(), 1)).cast("bigint")
        .alias("_n1"),
        F.sum(dec(F.col("_d1"))).alias("_s1"),
        F.sum(dec(F.col("_d1")) * F.col("_d1")).alias("_q1"),
    )

    def var(n, s, q2):
        nd = n.cast("double")
        return ((dec(n) * q2 - s * s).cast("double")) / (nd * nd)

    vq = var(F.col("_nq"), F.col("_sq"), F.col("_qq"))
    v1 = var(F.col("_n1"), F.col("_s1"), F.col("_q1"))
    qd = F.col("_q").cast("double")
    nd = F.col("_nq").cast("double")
    vr = vq / (qd * v1)
    zden = F.sqrt(F.lit(2.0) * (F.lit(2.0) * qd - 1)
                  * (qd - 1) / (F.lit(3.0) * qd * nd))
    ok = (F.col("_nq") > 0) & (F.col("_n1") > 1)
    out = per.select(
        "code", F.col("_q").alias("q"),
        F.col("_nq").alias("n_diffs"),
        F.when(ok & (v1 > 0), vr).alias("variance_ratio"),
        F.when(ok & (v1 > 0),
               (vr - F.lit(1.0)) / zden).alias("z_iid"),
    )
    return out.orderBy("code", "q") if sort else out


def ljung_box(long_df: DataFrame, max_lag: int = 8,
              sort: bool = True) -> DataFrame:
    """Ljung–Box portmanteau test per series (Biometrika 65:297,
    1978): Q = n(n+2) Σ_{k≤K} r_k²/(n−k) against chi-square(K) — "is
    there ANY autocorrelation left?" — the standard residual
    whiteness check after de-trending/forecasting, complementing
    :func:`acf`'s per-lag view with one decision number. One row per
    series: (code, n_obs, lags_used, q_lb). P-value client-side,
    suite policy.

    Exactness: the classic estimator r_k = Σ(x_t−x̄)(x_{t−k}−x̄) /
    Σ(x_t−x̄)² multiplies through by n² into EXACT integers —
    N_k = Σ (n·x_t − S)(n·x_{t−k} − S) and D = Σ (n·x_t − S)² in
    DECIMAL(38,0) — so each r_k is one exact-int-cast double
    division; the K ≤ 8 per-lag terms r_k²/(n−k) then accumulate
    through an ORDERED window over k (the anova idiom — a plain
    groupBy sum of doubles would be merge-order-flaky), and
    Q = n(n+2)·Σ is a fixed tree. Constant series (D = 0) → NULL.

    Scale shape: ONE per-code window pass produces every lag column
    PLUS the per-series S and n (same-partitioning unbounded-frame
    sums — bounded by series depth, the standard ts class), a stack
    unpivot, one partial-aggregated (code, k) rollup, a K-row
    ordered window, and a per-code final aggregate. The series
    shuffles once."""
    cents = F.round(F.round(F.col("value"), 2) * 100).cast("bigint")
    w = Window.partitionBy("code").orderBy("date")
    wg = Window.partitionBy("code")
    lags = tuple(range(1, max_lag + 1))
    lagged = long_df.select(
        "code", cents.alias("_c"),
        F.sum(cents).over(wg).cast("bigint").alias("_stot"),
        F.count(F.lit(1)).over(wg).cast("bigint").alias("_n"),
        *[F.lag(cents, k).over(w).alias(f"_g{k}") for k in lags])

    def dec(c):
        return c.cast("decimal(38,0)")

    dev = dec(F.col("_n")) * F.col("_c") - F.col("_stot")
    stack_expr = "stack({}, {}) as (_k, _p)".format(
        len(lags), ", ".join(f"{k}, _g{k}" for k in lags))
    pairs = lagged.selectExpr("code", "_c", "_stot", "_n", stack_expr) \
        .select(
            "code", F.col("_k").cast("bigint").alias("_k"), "_n",
            dev.alias("_dv"),
            (dec(F.col("_n")) * F.col("_p") - F.col("_stot"))
            .alias("_dp"),
            F.col("_p").isNotNull().alias("_ok"))
    per_k = pairs.groupBy("code", "_k").agg(
        F.max("_n").alias("_n"),
        F.sum(F.when(F.col("_ok"), F.col("_dv") * F.col("_dp")))
        .alias("_num"),
        F.sum(F.col("_dv") * F.col("_dv")).alias("_den"))
    rk = F.col("_num").cast("double") / F.col("_den").cast("double")
    term = rk * rk / (F.col("_n") - F.col("_k")).cast("double")
    wk = Window.partitionBy("code").orderBy("_k") \
        .rowsBetween(Window.unboundedPreceding, 0)
    cums = per_k.where(F.col("_den") > 0) \
        .select("code", "_k", "_n", F.sum(term).over(wk).alias("_ct"))
    agg = cums.groupBy("code").agg(
        F.max("_n").cast("bigint").alias("n_obs"),
        F.count(F.lit(1)).cast("bigint").alias("lags_used"),
        F.max(F.struct("_k", "_ct")).alias("_last"))
    nd = F.col("n_obs").cast("double")
    out = agg.select(
        "code", "n_obs", "lags_used",
        (nd * (nd + F.lit(2.0)) * F.col("_last._ct")).alias("q_lb"),
    )
    return out.orderBy("code") if sort else out
