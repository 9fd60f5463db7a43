"""Core relational operators: star-schema aggregations, joins, and the
catalogue query semantics of the reference (search / validate / recency
filter / per-frequency counts — ``/root/reference/perustats/BCRP/
metadata.py:252-357`` and ``utils.py:92-102``).

Scale notes
-----------
Every query is a declarative DataFrame plan: filters sit next to the
scan (Catalyst pushes them into parquet), and all aggregates are
algebraic (map-side partial aggregation for free). Broadcast hints are
reserved for SF-INVARIANT dims (nation: 25 rows, region: 5 rows,
1-row totals); joins against SF-proportional tables (customer,
supplier, part) are left unhinted so AQE size-decides — broadcast at
test SFs, shuffled hash/sort-merge on the integer keys at 100 TB. A
sweep test (tests/test_plans.py) asserts no query hints a growing
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyperustats_spark.functions.text import clean_numeric


def pricing_summary(lineitem: DataFrame, ship_before: str = "2001-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary: one wide groupBy over the fact
    table — partial aggregation map-side, single shuffle on a tiny key
    space."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(ship_before).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            # charge products sit on a 1e-6 decimal grid, so a double sum
            # can land exactly on a round-4 midpoint (engines then split);
            # an exact decimal sum rounded AS DECIMAL is order-independent
            # and bit-identical cross-engine
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))
                     * (1 + F.col("l_tax"))).cast("decimal(18,6)")
                ),
                4,
            ).cast("double").alias("sum_charge"),
            F.sum("l_discount").alias("_sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # averages derived as round(sum,2)/count: bit-identical across
        # engines (2-decimal inputs put plain avg() on round-half
        # boundaries — see timeseries.resample parity note)
        .withColumn("avg_qty", F.round(F.col("sum_qty"), 2) / F.col("count_order"))
        .withColumn("avg_price", F.round(F.col("sum_base_price"), 2) / F.col("count_order"))
        .withColumn("avg_disc", F.round(F.col("_sum_disc"), 2) / F.col("count_order"))
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
            "avg_disc", "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
) -> DataFrame:
    """TPC-H Q3-style: filtered 3-way join + agg + top-N.

    ``customer`` grows with scale factor, so its join is deliberately
    UNhinted: AQE broadcasts it while its filtered projection fits under
    ``autoBroadcastJoinThreshold`` and falls back to a shuffled join on
    the 8-byte custkey when it doesn't (a forced broadcast of an
    SF-proportional side is a driver OOM at 100 TB).
    lineitem↔orders co-shuffle on orderkey once.
    """
    cut = F.lit(cutoff).cast("timestamp")
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = lineitem.where(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where customer and supplier share
    the nation.

    Only the FIXED-size dims (region: 5 rows, nation: 25 rows) carry a
    broadcast hint. ``customer``/``supplier`` are SF-proportional, so
    their joins stay unhinted — AQE size-decides (broadcast at small SF,
    shuffled hash/SMJ on the integer keys at cluster scale)."""
    r = region.where(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r), nation.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def revenue_delta(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    discount_lo: float = 0.05,
    discount_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-style tight filter + single aggregate — the whole plan is
    scan→filter→partial agg; every predicate pushes to parquet."""
    return lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_discount") >= discount_lo)
        & (F.col("l_discount") <= discount_hi)
        & (F.col("l_quantity") < max_qty)
    ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    region_name: str = "AMERICA",
) -> DataFrame:
    """Share of order revenue per nation within a region, vs the region
    total (reference analog: electoral result shares per location).

    nation/region (25/5 rows, SF-invariant) are hinted; the
    SF-proportional ``customer`` join is AQE-decided — forced broadcast
    of every customer's (custkey, nationkey) would OOM at 100 TB."""
    r = region.where(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r), nation.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = customer.select("c_custkey", "c_nationkey")
    joined = (
        orders.select("o_custkey", "o_totalprice")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("n_name").agg(F.sum("o_totalprice").alias("nation_revenue"))
    # region total as a FULL-FRAME window sum over the <= 25-row
    # nation aggregate (audited bounded SINGLE_PART class): the
    # separate 1-row aggregate + crossJoin referenced agg twice, and
    # Catalyst re-ran the orders x customer join per reference
    # (optimization r11: 8 -> 4 scans, both big joins once)
    w_all = Window.orderBy("n_name").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        agg.select(
            "n_name",
            "nation_revenue",
            (F.col("nation_revenue") / F.sum("nation_revenue").over(w_all))
            .alias("share"),
        )
        .orderBy(F.desc("nation_revenue"), "n_name")
    )


def top_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    n: int = 20,
) -> DataFrame:
    """TPC-H Q10-flavored: revenue per customer, nation attached, top-N.

    The per-customer aggregate has the SAME cardinality as ``customer``
    (both SF-proportional), so that join must never be hinted — AQE
    picks broadcast at test SFs and a co-partitioned shuffled join at
    scale. Only the 25-row ``nation`` dim carries a hint."""
    agg = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        agg.join(customer, agg.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(n)
    )


# ---------------------------------------------------------------------------
# Catalogue semantics (BCRPMetadata) over the `part` table as catalogue
# ---------------------------------------------------------------------------


def catalog_search(part: DataFrame, query: str) -> DataFrame:
    """Case-insensitive substring search over the catalogue description
    (reference `BCRPMetadata.search`, metadata.py:317-340)."""
    return (
        part.where(F.lower(F.col("p_name")).contains(query.lower()))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey")
    )


def catalog_validate_codes(
    part: DataFrame, requested: DataFrame,
    name_from: tuple[str, str] = ("p_brand", "p_name"),
) -> DataFrame:
    """Split requested codes into valid/invalid against the catalogue,
    carrying the reference's ``names_codes`` display-name mapping for
    the valid ones — ``group + " - " + description`` per code
    (reference `validate_codes`, metadata.py:252-306; the name map is
    built at metadata.py:285-296). Invalid codes get a NULL name.

    Scale shape: the catalogue may be huge, the requested list is tiny —
    so broadcast *requested*, semi-join the catalogue once (one scan, no
    shuffle) to get the hit set (tiny), then anti-join requested against
    the broadcast hit set. Never broadcasts or shuffles the catalogue.
    """
    cat = part.select(
        F.col("p_partkey").alias("code"),
        F.concat_ws(" - ", *[F.col(c) for c in name_from]).alias("display_name"),
    )
    hits = cat.join(F.broadcast(requested), "code", "left_semi").distinct()
    valid = hits.withColumn("valid", F.lit(True))
    invalid = (
        requested.join(F.broadcast(hits.select("code")), "code", "left_anti")
        .select("code", F.lit(None).cast("string").alias("display_name"))
        .withColumn("valid", F.lit(False))
    )
    return valid.unionByName(invalid).orderBy("code")


def catalog_active_filter(orders: DataFrame, cutoff: str = "2000-06-01") -> DataFrame:
    """Recency filter: keep keys whose latest activity ≥ cutoff
    (reference `active_codes`, utils.py:92-102, flags codes updated in
    the last N years). groupBy max then filter — partial agg map-side."""
    return (
        orders.groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("last_update"))
        .withColumn("active", (F.col("last_update") >= F.lit(cutoff).cast("timestamp")).cast("int"))
        .orderBy("o_custkey")
    )


def participation_metrics(
    df: DataFrame,
    group_cols: list[str],
    emitted: str = "emitted",
    electors: str = "electors",
) -> DataFrame:
    """Electoral participation metrics per group (reference
    ``resultados_generales``'s num_percent_part / num_percent_ausen
    pair, perustats/infogob/20_resultados.py:50-60 and utils.py:17-45).

    Ratio of SUMS, not average of ratios: emitted and electors
    aggregate algebraically (map-side partial agg, one shuffle on the
    group key), then one division per group row. ``try_divide`` keeps a
    zero-elector group NULL instead of killing the job under ANSI
    semantics. Both percentages derive from the same bigint sums with
    identical expression order (100.0 * e / n), so the doubles are
    bit-identical across engines — no output rounding (midpoint rule).
    """
    agg = df.groupBy(*group_cols).agg(
        F.sum(emitted).cast("bigint").alias("num_votos_emitidos"),
        F.sum(electors).cast("bigint").alias("num_electores"),
    )
    part = F.try_divide(
        F.lit(100.0) * F.col("num_votos_emitidos"), F.col("num_electores"))
    return agg.select(
        *group_cols,
        "num_votos_emitidos",
        "num_electores",
        part.alias("num_percent_part"),
        (F.lit(100.0) - part).alias("num_percent_ausen"),
    )


def location_hierarchy_flatten(
    regions: DataFrame, provinces: DataFrame, districts: DataFrame,
) -> DataFrame:
    """Flatten the infogob dept→prov→dist location tree into one
    dimension row per district (reference builds it level by level via
    ``listar_regiones``/``listar_sub_loc``,
    perustats/infogob/10_locations_ids.py:50-100, then joins results to
    it).

    Two chained equi-joins, smallest side first. Unhinted on purpose:
    real-world location dims are bounded (~2k districts) so AQE
    broadcasts them anyway, but the operator accepts arbitrary
    hierarchies and must not hard-code a broadcast of its largest
    input."""
    return (
        districts
        .join(provinces, "id_provincia")
        .join(regions, "id_region")
        .select("id_region", "region", "id_provincia", "provincia",
                "id_distrito", "distrito")
    )


def results_by_location_level(
    results: DataFrame, flat_dim: DataFrame, level: str = "region",
) -> DataFrame:
    """Aggregate district-grain electoral results at any hierarchy level
    (the reference stores per-district rows and rolls up when
    reporting). One dim join + one algebraic groupBy; votes sum as
    bigint (DuckDB HUGEINT trap)."""
    keys = {
        "region": ["id_region", "region"],
        "provincia": ["id_region", "region", "id_provincia", "provincia"],
        "distrito": ["id_region", "region", "id_provincia", "provincia",
                     "id_distrito", "distrito"],
    }[level]
    return (
        results.join(flat_dim, "id_distrito")
        .groupBy(*keys)
        .agg(
            F.sum("num_votos").cast("bigint").alias("total_votos"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def catalog_freq_counts(part: DataFrame) -> DataFrame:
    """Count catalogue entries per category (reference
    `codes_for_frequency`, metadata.py:342-357)."""
    return part.groupBy("p_type").agg(F.count(F.lit(1)).alias("n_codes")).orderBy("p_type")


def clean_numeric_cast(raw_df: DataFrame) -> DataFrame:
    """Thousands-comma numeric cleaning applied to a string column
    (reference MEF `html_table_to_dataframe`, tables.py:59-66):
    ``'3,400,841.50'`` → 3400841.50, non-numeric → NULL.

    *raw_df* has columns (id, raw)."""
    return raw_df.select(
        "id",
        "raw",
        clean_numeric(F.col("raw")).alias("value_clean"),
    ).orderBy("id")


# ---------------------------------------------------------------------------
# MEF table utils / infogob history / MTC paged-concat semantics
# ---------------------------------------------------------------------------


def filter_rows_regex(df: DataFrame, text_col: str, patterns: list[str]) -> DataFrame:
    """Multi-pattern case-insensitive row filter (reference MEF
    ``filter_content``, tables.py:9-17: escaped patterns or-joined into
    one regex against ``concepto_region``). A single regexp_like, pushed
    into the scan where the source supports it."""
    import re as _re

    pattern = "|".join(_re.escape(p) for p in patterns)
    return df.where(F.regexp_like(F.lower(F.col(text_col)), F.lit(pattern.lower())))


def find_row_by_text(df: DataFrame, text_col: str, order_col: str,
                     search_text: str) -> DataFrame:
    """First row (by *order_col*) whose *text_col* contains
    *search_text*, case-insensitive (reference ``find_row_by_text``,
    tables.py:98-117 — pandas ``idxmax`` over a contains mask).

    Distributed form: filter then global min — a partial-aggregated
    min, not a sort."""
    matches = df.where(
        F.contains(F.lower(F.col(text_col)), F.lit(search_text.lower()))
    )
    first_key = matches.agg(F.min(order_col).alias("k"))
    return matches.join(
        F.broadcast(first_key), F.col(order_col) == F.col("k")
    ).drop("k")


def get_grp_from_row(df: DataFrame, code_col: str, order_col: str,
                     row_index: int = 0) -> DataFrame:
    """The row at position *row_index* (0-based, ordered by *order_col*)
    projected to (*order_col*, *code_col*) — reference
    ``get_grp_from_row`` (MEF/utils/tables.py:76-96, pandas
    ``iloc[row_index]["codigo_grp"]``), the positional twin of
    :func:`find_row_by_text`.

    Error semantics match the reference: ``ValueError`` on an empty
    frame ("DataFrame vacío") and on an out-of-range index — checked
    with ONE count over ``df.limit(row_index + 1)`` (the limit pushes
    into the scan, so the probe short-circuits after row_index+1 rows
    regardless of table size; never a full count). Extraction is
    ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
    (per-partition top-k merge), not a global sort shuffle — then
    row_number inside the ≤ k+1 surviving rows. *order_col* must be a
    unique key (the usual keyed contract; ties would make the position
    nondeterministic)."""
    n_probe = df.limit(row_index + 1).count()
    if n_probe == 0:
        raise ValueError("DataFrame vacío")
    if row_index >= n_probe:
        raise ValueError(
            f"Índice {row_index} fuera de rango. DataFrame tiene "
            f"{n_probe} filas")
    topk = (df.select(order_col, code_col)
            .orderBy(order_col).limit(row_index + 1))
    w = Window.orderBy(order_col)
    return (topk.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == row_index + 1).drop("_rn"))


def candidate_history(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-entity ordered event history, serialized as one pipe-joined
    string (reference infogob candidate history: afiliaciones +
    participaciones accumulated per politician,
    41_candidatos_historial.py; resultados per location,
    20_resultados.py).

    collect_list is order-nondeterministic across partitions, so the
    entries embed their sort key and the ARRAY is sorted before joining
    — deterministic output, one shuffle on the entity key."""
    entries = orders.select(
        "o_custkey",
        F.concat_ws(
            ":",
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
        ).alias("entry"),
    )
    hist = entries.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(F.array_sort(F.collect_list("entry")), "|").alias("history"),
    )
    return (
        hist.join(customer.select(F.col("c_custkey").alias("o_custkey"), "c_name"), "o_custkey")
        .select(F.col("o_custkey").alias("custkey"), "c_name", "n_events", "history")
        .orderBy("custkey")
    )


def paged_concat_rename(orders: DataFrame, page_size: int = 1000,
                        n_pages: int = 3) -> DataFrame:
    """Paged-fetch concat + positional rename + numeric clean (reference
    MTC ``TelMTC``: POST per page, concat page tables, assign
    ``new_names``, homologacion.py:36-60).

    Pages are key-range slices; the union is by name after renaming —
    Catalyst collapses the union of filters over one scan into a single
    pass, so "N pages" costs one scan, not N."""
    pages = []
    for p in range(n_pages):
        lo, hi = p * page_size, (p + 1) * page_size
        page = (
            orders.where((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
            .select(
                F.col("o_orderkey").alias("n"),
                F.col("o_orderstatus").alias("type"),
                F.col("o_custkey").alias("cust"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
                F.col("o_totalprice").alias("amount"),
            )
            .withColumn("page", F.lit(p))
        )
        pages.append(page)
    out = pages[0]
    for page in pages[1:]:
        out = out.unionByName(page)
    return out.orderBy("n")


def stats_profile(lineitem: DataFrame) -> DataFrame:
    """Per-group statistical profile: exact percentiles (sort-based
    interpolating `percentile`, the quantile_cont semantics), sample
    stddev, and Pearson correlation — the reference consumers compute
    these off the fetched frames; here they are one partial-aggregated
    pass per group.

    At 100 TB swap `percentile` for `approx_percentile` (Greenwald-Khanna quantile summary
    sketch, mergeable map-side) — exact percentiles materialize each
    group's values; the profile below is the oracle-checkable form."""
    # ONE percentile aggregate with an array of fractions: three
    # separate percentile() calls each buffer the group's full value
    # multiset independently (3x the ObjectHashAggregate memory and
    # update CPU — r11 plan audit); the array form fills one buffer
    # and interpolates all three cuts from it, bit-identically
    pcts = F.percentile("l_extendedprice",
                        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            pcts.alias("_p"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        )
        .select(
            "l_returnflag", "n", "avg_qty", "sd_qty",
            F.round(F.element_at("_p", 1), 4).alias("p50_price"),
            F.round(F.element_at("_p", 2), 4).alias("p90_price"),
            F.round(F.element_at("_p", 3), 4).alias("p99_price"),
            "corr_qty_price",
        )
        .orderBy("l_returnflag")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame,
                             since: str = "2001-01-01") -> DataFrame:
    """Customers with NO orders since *since* (lapsed customers) — the
    NOT EXISTS anti-join pattern. Shuffles only keys; the date filter
    pushes into the orders scan, so at scale the anti side is the
    (small) set of recently active keys."""
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
    return (
        customer.join(
            recent.select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


def sales_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP over (status, year): per-cell, per-status subtotal, and
    grand total in ONE pass — grouping sets partial-aggregate map-side;
    no union of three scans. ``grouping_id`` disambiguates NULL-as-
    subtotal from NULL data (reference consumers build exactly these
    pivot-table margins off fetched frames)."""
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .rollup("o_orderstatus", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(F.col("gid"), F.col("o_orderstatus").asc_nulls_last(),
                 F.col("order_year").asc_nulls_last())
    )


def global_ntile(df: DataFrame, order, n_tiles: int = 4,
                 num_partitions: int | None = None) -> DataFrame:
    """Exact ``ntile`` over a GLOBAL ordering without the
    single-partition window (``Window.orderBy`` with no partition spec
    funnels every row through one task — the classic scale killer).

    Shape: range-repartition on the order keys + in-partition sort
    (Spark's normal distributed sort), then read each row's
    within-partition position straight out of
    ``monotonically_increasing_id`` (pid*2^33 + arrival seq — after the
    sort the arrival order IS the sort order). Global rank = position +
    cumulative count of earlier partitions; the only driver-scale
    structure is the P-row per-partition count table, whose prefix sums
    come from a P×P broadcast cross join so the plan stays lazy and
    window-free. Catalyst reuses the range exchange across the two
    branches (ReusedExchange), so the data shuffles once.

    Adds a ``_tile`` int column; order keys must be a total order or
    ranks are nondeterministic.

    The static plan shows the scan→agg→range-shuffle subtree once per
    branch, but AQE's runtime stage reuse collapses them: the executed
    plan carries ReusedExchange/ReusedQueryStage nodes, so the data is
    scanned and range-shuffled once (asserted in tests/test_plans.py)."""
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    mid = F.monotonically_increasing_id()
    part = (
        df.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.shiftright(mid, 33).cast("int"))
        .withColumn("_pos", (mid.bitwiseAND(F.lit((1 << 33) - 1)) + 1))
    )
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = (
        counts.alias("a")
        .join(counts.alias("b"), how="cross")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.sum(F.when(F.col("b._pid") < F.col("a._pid"),
                         F.col("b._cnt")).otherwise(F.lit(0))).alias("_off"),
            F.sum(F.col("b._cnt")).alias("_n"),
        )
    )
    ranked = part.join(F.broadcast(offsets), "_pid")
    rn = F.col("_off") + F.col("_pos")
    base = F.floor(F.col("_n") / n_tiles)
    rem = F.col("_n") % n_tiles
    cut = rem * (base + 1)
    tile = F.when(rn <= cut, F.ceil(rn / (base + 1))).otherwise(
        rem + F.ceil(F.try_divide(rn - cut, base)))
    return (
        ranked.withColumn("_tile", tile.cast("int"))
        .drop("_pid", "_pos", "_off", "_n")
    )


def global_running_sum(
    df: DataFrame, order, value_col: str, out_col: str = "cum_sum",
    exclusive: bool = False, num_partitions: int | None = None,
) -> DataFrame:
    """Running sum of *value_col* over a GLOBAL ordering without a
    partition-less window — same shape as :func:`global_ntile`:
    range-repartition + in-partition sort, per-partition cumsum, and
    the tiny per-partition totals prefix-summed via a P×P broadcast
    cross join. *exclusive* gives the sum of STRICTLY-preceding rows
    (the start offset), the natural form for packing/layout problems.

    The order keys must form a total order for deterministic output.
    Like :func:`global_ntile`, branch-duplicated subtrees collapse at
    runtime via AQE stage reuse.

    Cost note: the per-partition window adds one hash exchange + sort
    on ``_pid`` after the range shuffle — Catalyst cannot prove the
    range partitioning already clusters ``_pid`` (it is derived from
    the physical partition id post-shuffle), so it re-distributes to
    satisfy the window. That is a second full pass over the rows, NOT
    a scale cliff: ``_pid`` has exactly P balanced values, so no task
    ever sees more than one range partition's rows. Removing it would
    require a lower-level operator (mapPartitions cumsum) — rejected
    to keep the plan declarative and codegen'd."""
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        df.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid",
                    F.shiftright(F.monotonically_increasing_id(), 33).cast("int"))
    )
    totals = part.groupBy("_pid").agg(F.sum(value_col).alias("_tot"))
    prefix = (
        totals.alias("a")
        .join(totals.alias("b"), how="cross")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.sum(F.when(F.col("b._pid") < F.col("a._pid"),
                          F.col("b._tot")).otherwise(F.lit(0))).alias("_base"))
    )
    w = Window.partitionBy("_pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1 if exclusive else Window.currentRow)
    local = F.coalesce(F.sum(value_col).over(w), F.lit(0))
    return (
        part.join(F.broadcast(prefix), "_pid")
        .withColumn(out_col, F.col("_base") + local)
        .drop("_pid", "_base")
    )


def customer_value_quartiles(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Quartile assignment by customer revenue — exact ntile(4)
    semantics via :func:`global_ntile` (range-partitioned distributed
    sort + broadcast offsets), no partition-less window anywhere in the
    plan even at billions of customers."""
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    ranked = global_ntile(
        rev, [F.col("revenue").desc(), F.col("o_custkey").asc()], n_tiles=4)
    return (
        ranked.withColumnRenamed("_tile", "quartile")
        .join(customer.select(F.col("c_custkey").alias("o_custkey"), "c_name"),
              "o_custkey")
        .select(F.col("o_custkey").alias("custkey"), "c_name", "revenue", "quartile")
        .orderBy("custkey")
    )


def most_common_by_group(
    df: DataFrame, group_cols: list[str], value_col: str,
    out_col: str = "most_common",
) -> DataFrame:
    """Per-group mode with a deterministic tiebreak (highest count wins,
    ties broken by the lexicographically smallest value) — the reference
    picks each location's canonical name this way
    (perustats/infogob/11_locations_refs.py:66-79).

    Two algebraic aggregations — count per (group, value), then
    ``min_by(value, (-count, value))`` — both partial-aggregate
    map-side; no window, no per-group value materialization, so group
    count and value cardinality can both be huge."""
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_n"))
    pick = F.struct((-F.col("_n")).alias("nn"), F.col(value_col).alias("v"))
    return counts.groupBy(*group_cols).agg(
        F.min_by(F.col(value_col), pick).alias(out_col))


def repeat_customers(orders: DataFrame, year_a: int = 1995,
                     year_b: int = 2001) -> DataFrame:
    """Customers active in BOTH years — INTERSECT of the two key sets.
    Catalyst plans intersect as a semi-join of the two (small) distinct
    aggregates; at scale both sides partial-aggregate before the
    shuffle."""
    a = orders.where(F.year("o_orderdate") == year_a).select("o_custkey")
    b = orders.where(F.year("o_orderdate") == year_b).select("o_custkey")
    return a.intersect(b).withColumnRenamed("o_custkey", "custkey").orderBy("custkey")


def stats_profile_approx(lineitem: DataFrame) -> DataFrame:
    """The sketch-based form of :func:`stats_profile` — the actual
    100 TB path: approx_percentile (Greenwald-Khanna quantile summary) and HLL distinct are
    mergeable map-side, so no group ever materializes its raw values.
    Rows-only (sketch internals differ between engines); pytest bounds
    the error against the exact profile."""
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)), 4
            ).alias("p50_price_approx"),
            F.round(
                F.approx_percentile("l_extendedprice", F.lit(0.99), F.lit(10000)), 4
            ).alias("p99_price_approx"),
            F.approx_count_distinct("l_orderkey").alias("n_orders_approx"),
        )
        .orderBy("l_returnflag")
    )


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Data-quality profile: one row per column with null ratio,
    distinct count, and min/max (stringified for a uniform schema).

    All columns profile in ONE pass (a single aggregate projection, not
    one scan per column); the per-column rows come from unpivoting the
    aggregate with a literal struct array — profiling a 100 TB table
    costs exactly one partial-aggregated scan."""
    n = F.count(F.lit(1))
    aggs = [n.alias("_n")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in columns
        ]
    )
    return (
        wide.select(F.col("_n").alias("n_rows"), F.explode(per_col).alias("p"))
        .select(
            F.col("p.col_name").alias("col_name"),
            "n_rows",
            F.col("p.n_nulls").alias("n_nulls"),
            F.round(F.col("p.n_nulls") / F.col("n_rows"), 6).alias("null_ratio"),
            F.col("p.n_distinct").alias("n_distinct"),
            F.col("p.min_str").alias("min_str"),
            F.col("p.max_str").alias("max_str"),
        )
        .orderBy("col_name")
    )


def train_val_split(df: DataFrame, key: str, val_pct: int = 10,
                    salt: str = "split") -> DataFrame:
    """Deterministic train/val assignment: rows whose salted
    md5(key) bucket (mod 100) falls under *val_pct* go to 'val'.

    Hash-cut splitting is the only split that survives distribution:
    reproducible across runs, engines (md5 — oracle-checkable), and
    re-shards; membership is a pure row-local expression, so the split
    costs zero shuffles at any corpus size and new data lands in stable
    splits without re-assigning old rows."""
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                      F.col(key).cast("string"))), 1, 4),
        16, 10).cast("int") % 100
    return df.withColumn(
        "split", F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train")))


def sample_per_group(df: DataFrame, group_cols: list[str], key: str,
                     k: int = 5) -> DataFrame:
    """Deterministic k-row sample per group: rank rows inside each
    group by salted md5(key) and keep the first k — the stratified
    sample a balanced eval set needs (equal representation per
    stratum). The window is PARTITIONED by the group, so no
    single-task funnel; hash ordering makes the choice uniform and
    reproducible cross-engine."""
    h = F.md5(F.concat_ws(":", F.lit("strata"), F.col(key).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def sample_per_group_hist(df: DataFrame, group_cols: list[str], key: str,
                          k: int = 5, nibbles: int = 2) -> DataFrame:
    """Depth-clean twin of :func:`sample_per_group`: same deterministic
    k-row hash sample per group, but the per-group rank is the
    histogram-rank decomposition — row_number within (group, hash
    nibble-prefix) + the broadcast prefix count of smaller nibbles —
    instead of one window task holding the whole group. The nibble
    buckets are md5-uniform BY CONSTRUCTION (16^nibbles even slices,
    no skew guard needed), so a 10M-row language costs 16^nibbles
    parallel partial sorts instead of one straggler. Row-for-row equal
    to sample_per_group (pinned): (bucket, hash, key) refines the same
    (hash, key) total order because the bucket IS the hash prefix.

    The broadcast side table is O(|groups| · 16^nibbles) rows — use
    this twin for bounded-cardinality strata (lang, source, shard);
    for unbounded group keys whose per-group depth is small,
    sample_per_group's plain partitioned window is already right."""
    h = F.md5(F.concat_ws(":", F.lit("strata"), F.col(key).cast("string")))
    z = df.withColumn("_h", h).withColumn(
        "_hb", F.substring(F.col("_h"), 1, nibbles))
    counts = z.groupBy(*group_cols, "_hb").agg(
        F.count(F.lit(1)).alias("_cnt"))
    ws = Window.partitionBy(*group_cols).orderBy("_hb")
    side = counts.select(
        *group_cols, "_hb",
        F.coalesce(
            F.sum("_cnt").over(
                ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_off"),
    ).where(F.col("_off") < k)  # buckets fully past rank k never match
    wp = Window.partitionBy(*group_cols, "_hb").orderBy(
        F.col("_h").asc(), F.col(key).asc())
    return (
        z.join(F.broadcast(side), [*group_cols, "_hb"])
        .withColumn("_rk", F.col("_off") + F.row_number().over(wp))
        .where(F.col("_rk") <= k)
        .drop("_h", "_hb", "_off", "_rk")
    )


def systematic_sample(df: DataFrame, key: str, nibbles: int = 1) -> DataFrame:
    """Deterministic 16^-nibbles systematic sample: keep rows whose
    md5(key) ends in *nibbles* zero hex digits. Unlike rand() sampling
    this is reproducible across runs AND engines (md5 is bit-identical
    in DuckDB, so the sample is oracle-checkable), and re-computable —
    the reference re-processes deterministically chosen subsets."""
    tail = F.substring(F.md5(F.col(key).cast("string")), 33 - nibbles, nibbles)
    return df.where(tail == "0" * nibbles).orderBy(key)


def epoch_shards(df: DataFrame, key: str, num_shards: int = 8,
                 salt: str = "epoch0", sort: bool = True) -> DataFrame:
    """Deterministic training-epoch shard assignment + in-shard order:
    shard = salted md5(key) bucket mod *num_shards*, pos = the row's
    rank inside its shard under the hash ordering — i.e. a reproducible
    global shuffle of the corpus into shard files, re-derivable for any
    epoch by changing *salt* (epoch0, epoch1, ...). This is the layout
    step before writing training shards: hash order within a shard IS
    the desired de-correlated read order.

    Scale: the window is PARTITIONED by shard — num_shards concurrent
    in-shard sorts, exactly the per-file sort a shard writer performs
    anyway; pick num_shards >= cluster parallelism at scale (shards are
    hash-balanced, so no skew). md5 keeps assignment AND order
    bit-identical across engines, runs and reshards."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string")))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
             % num_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(),
                                            F.col(key).asc())
    out = (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("_h")
    )
    return out.orderBy("shard", "pos") if sort else out


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 k: float = 3.5) -> DataFrame:
    """Robust per-group outlier profile via Median Absolute Deviation:
    median, MAD, and the count of values beyond k x 1.4826 x MAD (the
    consistency-scaled MAD, ~k sigma for normal data). The robust
    companion to the z-score flags — a few wild points cannot drag the
    threshold the way they drag mean/stddev.

    Three passes by construction (median -> deviations -> MAD +
    threshold count): medians cannot merge map-side, so each pass is a
    grouped exact `percentile`; the joins carry only #groups rows (AQE
    broadcasts them). At 100 TB swap `percentile` for
    `approx_percentile` exactly as in :func:`stats_profile`.

    No rounding anywhere: every derived double (median interpolation,
    |x - med|, the k*1.4826*mad threshold) is computed from identical
    parquet doubles by identical IEEE ops in the DuckDB oracle, so the
    bits match without touching the midpoint rules."""
    g, v = group_col, value_col
    med = df.groupBy(g).agg(
        F.percentile(v, F.lit(0.5)).alias("med"))
    dev = df.join(med, g).select(
        g, "med", F.abs(F.col(v) - F.col("med")).alias("_adev"))
    mads = dev.groupBy(g).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("med").alias("med"),
        F.percentile("_adev", F.lit(0.5)).alias("mad"),
    )
    out = (
        dev.select(g, "_adev")
        .join(mads, g)
        .groupBy(g)
        .agg(
            F.min("n").alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(F.when(F.col("_adev") > k * 1.4826 * F.col("mad"), 1)
                  .otherwise(0)).cast("bigint").alias("n_outliers"),
        )
    )
    return out.orderBy(g)


def mad_outliers_approx(df: DataFrame, group_col: str, value_col: str,
                        k: float = 3.5, accuracy: int = 10000) -> DataFrame:
    """The 100 TB path for :func:`mad_outliers`: same median/MAD/
    threshold-count profile with `approx_percentile` (Greenwald-Khanna quantile summary) in
    place of exact `percentile`. Exact percentiles materialize every
    group value in ONE aggregation buffer — with few groups that is a
    per-group single-task funnel (measured 3.6-4.4x wall for 10x rows
    at sf1); sketches merge map-side, so each pass is a real
    partial-aggregated shuffle at any scale. Error is bounded by
    1/accuracy of rank (property-tested against the exact profile);
    engine-specific sketch, so rows-only — no cross-engine oracle."""
    g, v = group_col, value_col
    med = df.groupBy(g).agg(
        F.approx_percentile(v, F.lit(0.5), F.lit(accuracy)).alias("med"))
    dev = df.join(med, g).select(
        g, "med", F.abs(F.col(v) - F.col("med")).alias("_adev"))
    mads = dev.groupBy(g).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("med").alias("med"),
        F.approx_percentile("_adev", F.lit(0.5), F.lit(accuracy))
        .alias("mad"),
    )
    out = (
        dev.select(g, "_adev")
        .join(mads, g)
        .groupBy(g)
        .agg(
            F.min("n").alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(F.when(F.col("_adev") > k * 1.4826 * F.col("mad"), 1)
                  .otherwise(0)).cast("bigint").alias("n_outliers"),
        )
    )
    return out.orderBy(g)


def winsorize_summary(df: DataFrame, group_col: str, value_col: str,
                      lo: float = 0.01, hi: float = 0.99) -> DataFrame:
    """Winsorization profile per group: the clip bounds (exact
    percentiles) and how many values each tail would clamp — the
    outlier-capping companion to :func:`mad_outliers` (clip instead of
    drop). Returns (group, p_lo, p_hi, n, n_clipped_low,
    n_clipped_high).

    Outputs are percentile doubles (bit-identical cross-engine: same
    interpolation over the same parquet doubles) and integer counts —
    deliberately NOT clipped sums, whose mixed value/bound grid would
    re-open the round-k midpoint trap. One percentile pass + one
    #groups-row join + one counting pass. Exact `percentile` funnels
    every group value into one aggregation buffer — the 100 TB path is
    :func:`winsorize_summary_approx` (same profile, Greenwald-Khanna
    summary bounds)."""
    g, v = group_col, value_col
    # one percentile buffer for both cuts (array-of-fractions form) —
    # two separate percentile() aggregates would each materialize the
    # group's full value multiset (see stats_profile)
    bounds = df.groupBy(g).agg(
        F.percentile(v, F.array(F.lit(lo), F.lit(hi))).alias("_b"),
    ).select(g, F.element_at("_b", 1).alias("p_lo"),
             F.element_at("_b", 2).alias("p_hi"))
    out = (
        df.join(bounds, g)
        .groupBy(g)
        .agg(
            F.min("p_lo").alias("p_lo"),
            F.min("p_hi").alias("p_hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col(v) < F.col("p_lo"), 1).otherwise(0))
            .cast("bigint").alias("n_clipped_low"),
            F.sum(F.when(F.col(v) > F.col("p_hi"), 1).otherwise(0))
            .cast("bigint").alias("n_clipped_high"),
        )
    )
    return out.orderBy(g)


def winsorize_summary_approx(df: DataFrame, group_col: str,
                             value_col: str, lo: float = 0.01,
                             hi: float = 0.99,
                             accuracy: int = 10000) -> DataFrame:
    """The 100 TB path for :func:`winsorize_summary`: identical
    (group, p_lo, p_hi, n, n_clipped_low, n_clipped_high) profile with
    `approx_percentile` (Greenwald-Khanna quantile summary) computing the clip bounds. Exact
    percentiles materialize EVERY group value in one aggregation
    buffer — with the usual handful of flag/status groups that is a
    per-group single-task funnel that dies long before 100 TB; sketches
    merge map-side so the bounds pass is a real partial-aggregated
    shuffle at any scale. The counting pass is unchanged (conditional
    sums against the joined bounds). Bound error ≤ 1/accuracy of rank
    (property-tested against the exact profile); engine-specific
    sketch, so rows-only — no cross-engine oracle."""
    g, v = group_col, value_col
    bounds = df.groupBy(g).agg(
        F.approx_percentile(v, F.lit(lo), F.lit(accuracy)).alias("p_lo"),
        F.approx_percentile(v, F.lit(hi), F.lit(accuracy)).alias("p_hi"),
    )
    out = (
        df.join(bounds, g)
        .groupBy(g)
        .agg(
            F.min("p_lo").alias("p_lo"),
            F.min("p_hi").alias("p_hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col(v) < F.col("p_lo"), 1).otherwise(0))
            .cast("bigint").alias("n_clipped_low"),
            F.sum(F.when(F.col(v) > F.col("p_hi"), 1).otherwise(0))
            .cast("bigint").alias("n_clipped_high"),
        )
    )
    return out.orderBy(g)


def order_priority_counts(orders: DataFrame, lineitem: DataFrame,
                          min_discount: float = 0.09,
                          start: str = "1996-01-01",
                          end: str = "1997-01-01") -> DataFrame:
    """Orders per priority touched by a promotion — at least one line
    discounted at/above *min_discount* (the EXISTS-semi-join shape,
    TPC-H Q4 class; complements the NOT-EXISTS anti-join of
    customers_without_orders).

    left_semi join: the probe side never duplicates orders however many
    line items match, and only orderkeys cross the shuffle (AQE-decided
    — both sides are SF-proportional, no hint)."""
    promo = lineitem.where(
        F.col("l_discount") >= min_discount).select("l_orderkey")
    return (
        orders.where((F.col("o_orderdate") >= start)
                     & (F.col("o_orderdate") < end))
        .join(promo, orders.o_orderkey == promo.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def returnflag_priority_counts(orders: DataFrame, lineitem: DataFrame,
                               year: int = 1996) -> DataFrame:
    """Per return flag: line counts split urgent/high vs other order
    priority among lines shipped in *year* (conditional-count
    classification, TPC-H Q12 class re-keyed to this schema).

    One join on the orderkey (AQE-decided) + one partial-aggregated
    conditional count — the CASE sums combine map-side."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = lineitem.where(
        F.year("l_shipdate") == year
    ).select("l_orderkey", "l_returnflag")
    return (
        li.join(orders.select("o_orderkey", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def nation_volume(customer: DataFrame, supplier: DataFrame,
                  orders: DataFrame, lineitem: DataFrame,
                  nation: DataFrame,
                  nation_a: str = "NATION_18", nation_b: str = "NATION_19",
                  date_from: str = "1995-01-01",
                  date_to: str = "1998-01-01") -> DataFrame:
    """TPC-H Q7-style bilateral volume: shipping revenue between a
    nation pair, by (supplier nation, customer nation, ship year).

    Only ``nation`` (25 rows, fixed-size by spec) is broadcast-hinted —
    twice, once per side, each pre-filtered to the pair. The
    SF-proportional joins (lineitem→orders→customer, lineitem→supplier)
    stay unhinted for AQE, shuffling on integer keys only; the
    pair-direction predicate runs after both nation names are attached
    and prunes to the two directions before the aggregate."""
    na = nation.where(F.col("n_name").isin(nation_a, nation_b))
    o = orders.select("o_orderkey", "o_custkey")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    cust = (customer.select("c_custkey", "c_nationkey")
            .join(F.broadcast(na.select(F.col("n_nationkey").alias("c_nationkey"),
                                        F.col("n_name").alias("cust_nation"))),
                  "c_nationkey"))
    supp = (supplier.select("s_suppkey", "s_nationkey")
            .join(F.broadcast(na.select(F.col("n_nationkey").alias("s_nationkey"),
                                        F.col("n_name").alias("supp_nation"))),
                  "s_nationkey"))
    joined = (
        li.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
               | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a)))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").alias("l_year"))
        # 4-decimal grid: 2-dec price x 2-dec (1-discount) -> sums land
        # on grid points, round(.,4) is midpoint-safe (see q1 notes)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def returned_item_revenue(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, nation: DataFrame,
                          date_from: str = "1996-01-01",
                          date_to: str = "1996-04-01",
                          k: int = 20) -> DataFrame:
    """TPC-H Q10-style: top-k customers by revenue lost to returned
    items in a quarter. Returns (custkey, name, nation, revenue).

    lineitem is pre-filtered to returnflag='R' and orders to the
    quarter BEFORE the joins (predicate pushdown leaves only the
    problem rows in the shuffles); nation (fixed 25 rows) is hinted,
    customer/orders stay AQE-decided. Top-k via orderBy+limit compiles
    to TakeOrderedAndProject — no global sort materializes."""
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    joined = (
        li.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(customer.select("c_custkey", "c_name", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame,
                        promo_type: str = "PROMO",
                        date_from: str = "1996-01-01",
                        date_to: str = "1996-02-01") -> DataFrame:
    """TPC-H Q14-style: share of a month's revenue from promotional
    parts. One row: (promo_revenue, total_revenue, promo_share).

    part is SF-proportional, so the lineitem→part join is unhinted
    (AQE decides; at cluster scale both sides shuffle on l_partkey).
    Both revenue sums are rounded onto their 4-decimal grid FIRST and
    the share is their RAW quotient — dividing identical doubles is
    bit-identical cross-engine, while rounding the quotient would sit
    on engine-disagreeing midpoints (working-notes rule)."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(part.select("p_partkey", "p_type"),
                     F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = joined.agg(
        F.round(F.sum(F.when(F.col("p_type") == promo_type, rev)
                      .otherwise(F.lit(0.0))), 4).alias("promo_revenue"),
        F.round(F.sum(rev), 4).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue", "total_revenue",
        F.try_divide(F.col("promo_revenue"), F.col("total_revenue"))
        .alias("promo_share"),
    )


def disjunctive_promo_revenue(lineitem: DataFrame, part: DataFrame,
                              date_from: str = "1996-01-01",
                              date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: one row summing
    revenue over three (part type × quantity band) OR-branches — the
    canonical multi-branch predicate shape. Expressed as ONE join +
    one OR filter so Catalyst keeps a single scan of each side and
    pushes the common l_shipdate range down to the parquet reader
    (three separate filtered joins would scan lineitem three times).
    Audited 1-row global aggregate; grid-4 revenue recipe."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    j = li.join(part.select("p_partkey", "p_type"),
                F.col("l_partkey") == F.col("p_partkey"))
    branch = (
        ((F.col("p_type") == "PROMO")
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_type") == "ECONOMY")
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "SMALL")
           & F.col("l_quantity").between(20, 40))
    )
    return j.where(branch).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def catalog_fuzzy_search(part: DataFrame, query: str,
                         max_dist: int = 3, k: int = 15) -> DataFrame:
    """Typo-tolerant catalogue search: part names within *max_dist*
    edit distance of the query, nearest (then name) first, top-k.

    The reference's catalogue search is exact-substring
    (metadata.search); users hit it with typos constantly — this is
    the Levenshtein companion. DISTINCT names first (the distance
    runs once per distinct name, not per row — at catalogue scale
    names repeat heavily), then TakeOrderedAndProject for the top-k:
    integer distances, no float anywhere."""
    q = query.lower()
    names = part.select(F.lower(F.col("p_name")).alias("name")).distinct()
    out = (
        names.select("name", F.levenshtein(F.col("name"), F.lit(q))
                     .alias("distance"))
        .where(F.col("distance") <= max_dist)
        .orderBy("distance", "name")
        .limit(k)
    )
    return out


def top_supplier_by_revenue(supplier: DataFrame, lineitem: DataFrame,
                            date_from: str = "1996-01-01",
                            date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15-style: the supplier(s) with the maximum revenue in a
    quarter — ALL ties kept (max-equality join, not top-1-by-sort,
    matching Q15's view semantics).

    Revenue per supplier is one partial-aggregated shuffle on the
    integer suppkey; the 1-row global max joins back broadcast
    (audited q_market_share class). Grid-4 revenue recipe, so the
    equality join compares identical doubles."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
        .alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    out = (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(supplier.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey"), "s_name", "total_revenue")
    )
    return out.orderBy("s_suppkey")


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                           part_type: str = "PROMO",
                           frac: float = 0.5) -> DataFrame:
    """TPC-H Q17-style: revenue from lineitems of a part class whose
    quantity falls below *frac* × that part's average quantity — the
    correlated-aggregate shape (per-part threshold joined back).

    The per-part average uses round(sum,2)/count (l_quantity sits on
    an integer-ish grid; the rounded sum is recovered exactly in both
    engines, so the threshold comparison sees identical doubles). The
    threshold frame is one row per part — the join back is equi on the
    integer partkey, AQE-decided. Audited 1-row final aggregate."""
    pp = part.where(F.col("p_type") == part_type).select("p_partkey")
    li = lineitem.select("l_partkey", "l_quantity",
                         "l_extendedprice", "l_discount")
    li_p = li.join(pp, F.col("l_partkey") == F.col("p_partkey")) \
             .drop("p_partkey")
    avg_q = li_p.groupBy("l_partkey").agg(
        (F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)))
        .alias("_avg_qty"))
    out = (
        li_p.join(avg_q, "l_partkey")
        .where(F.col("l_quantity") < F.lit(frac) * F.col("_avg_qty"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return out


def large_orders(customer: DataFrame, orders: DataFrame,
                 lineitem: DataFrame, min_qty: float = 150.0,
                 k: int = 20) -> DataFrame:
    """TPC-H Q18-style: the *k* largest orders whose total line
    quantity exceeds *min_qty*, with the customer attached.

    The quantity rollup is one partial-aggregated shuffle on the
    integer orderkey (quantities are integer-valued doubles — sums are
    exact in any accumulation order, so the HAVING threshold and the
    ordering are deterministic); survivors join orders + customer
    AQE-decided, and the top-k compiles to TakeOrderedAndProject."""
    totals = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    out = (
        totals.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_name", "o_orderdate",
                "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(k)
    )
    return out


def above_avg_inactive_customers(customer: DataFrame, orders: DataFrame,
                                 since: str = "2001-01-01") -> DataFrame:
    """TPC-H Q22-style: per nation, the count and balance total of
    customers whose account balance exceeds the GLOBAL positive-balance
    average but who placed no orders since *since* — the
    scalar-subquery + NOT EXISTS shape.

    The global average is a 1-row aggregate joined back broadcast
    (audited class); its grid-recovered form (round(sum,2)/count of
    2-decimal balances) makes the threshold comparison bit-identical
    cross-engine. The inactivity check is a left_anti on the integer
    custkey against the date-pruned orders — only keys shuffle."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        (F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1)))
        .alias("_avg_bal"))
    active = orders.where(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    rich_idle = (
        customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(active, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich_idle.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_custs"),
             F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
        .orderBy("c_nationkey")
    )


def customer_order_distribution(customer: DataFrame,
                                orders: DataFrame) -> DataFrame:
    """TPC-H Q13-style: the distribution of customers by order count,
    INCLUDING zero-order customers (the left join is the point of the
    query — an inner join silently drops the inactive majority).

    Two partial-aggregated shuffles: orders roll up per custkey, the
    left join back is equi on the integer key (AQE-decided), and the
    histogram is a count-of-counts on at most |distinct order counts|
    rows. All integers — deterministic everywhere."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("c_count"))
    joined = (
        customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
    )
    return (
        joined.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def referential_orphans(child: DataFrame, parent: DataFrame,
                        fk: str, pk: str) -> DataFrame:
    """Referential-integrity data-card: child rows whose foreign key
    has no parent (orphans), as one row of (n_child, n_orphans,
    orphan_share) — at 100 TB a silently-dropped upstream partition
    shows up here before it shows up as wrong joins downstream.

    One anti-join on the integer key (only keys shuffle, AQE-decided)
    plus two count aggregates; the share is a raw int/int quotient.
    Audited 1-row output."""
    orphans = child.select(F.col(fk).alias("_fk")).join(
        parent.select(F.col(pk).alias("_fk")).distinct(),
        "_fk", "left_anti")
    return (
        child.agg(F.count(F.lit(1)).alias("n_child"))
        .join(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
        .select(
            "n_child", "n_orphans",
            F.try_divide(F.col("n_orphans"), F.col("n_child"))
            .alias("orphan_share"),
        )
    )


def catalog_coverage_report(part: DataFrame, orders: DataFrame,
                            lineitem: DataFrame) -> DataFrame:
    """Catalogue coverage data-card per frequency class: how many
    codes exist, how many actually have observations, and the span of
    those observations — the reference's metadata questions ("which
    codes are alive, over what range?", metadata.py date-range +
    active_codes) as one rollup.

    The part/lineitem bridge is an integer-key join carrying only
    (freq, date) pairs into the rollup; code liveness is a distinct
    count per class (exact here — the classes are few; at catalogue
    scale swap approx_count_distinct per the HLL rule)."""
    li = (
        lineitem.select("l_partkey", "l_shipdate")
        .join(part.select("p_partkey", "p_type"),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    per_type = part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_codes"))
    obs = li.groupBy("p_type").agg(
        F.count_distinct("l_partkey").alias("n_active"),
        F.min("l_shipdate").alias("first_obs"),
        F.max("l_shipdate").alias("last_obs"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return (
        per_type.join(obs, "p_type", "left")
        .select(
            "p_type", "n_codes",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            "first_obs", "last_obs",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        )
        .orderBy("p_type")
    )


def national_market_share(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame,
                          part: DataFrame,
                          market_region: str = "AMERICA",
                          target_nation: str = "NATION_1",
                          part_type: str = "ECONOMY",
                          year_from: int = 1996,
                          year_to: int = 1997) -> DataFrame:
    """TPC-H Q8 shape: the target supplier-nation's share of a market
    region's order volume per year, for one part class — the last
    TPC-H query expressible without a partsupp table. Returns
    (o_year, target_volume, total_volume, mkt_share).

    Join order pushes every selective filter below the joins: part is
    pre-filtered to the class, orders to the year range, and the
    customer→nation→region chain prunes to the market region before
    lineitem fans anything out. nation appears TWICE (customer side
    defines the market, supplier side labels the seller) — both copies
    plus region are fixed 25/5-row dims and hinted; customer/supplier/
    orders/lineitem are SF-proportional and stay AQE-decided. Share
    arithmetic follows the q14 recipe: volumes are 4-decimal-grid
    products (2-decimal price × 2-decimal discount), so round(sum, 4)
    recovers the exact grid point in both engines and the share ships
    as the RAW quotient of the two recovered sums."""
    r = region.where(F.col("r_name") == market_region)
    n_mkt = nation.join(
        F.broadcast(r), nation.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("_mkt_nk"))
    n_sup = nation.select(F.col("n_nationkey").alias("_sup_nk"),
                          F.col("n_name").alias("supp_nation"))
    p = part.where(F.col("p_type") == part_type).select("p_partkey")
    o = orders.where(
        (F.year("o_orderdate") >= year_from)
        & (F.year("o_orderdate") <= year_to)
    ).select("o_orderkey", "o_custkey",
             F.year("o_orderdate").alias("o_year"))
    c = customer.select("c_custkey", "c_nationkey")
    s = supplier.select("s_suppkey", "s_nationkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
                        vol.alias("_vol"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_mkt), c.c_nationkey == F.col("_mkt_nk"),
              "left_semi")
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n_sup), s.s_nationkey == F.col("_sup_nk"))
    )
    agg = joined.groupBy("o_year").agg(
        F.round(F.sum(F.when(F.col("supp_nation") == target_nation,
                             F.col("_vol")).otherwise(0.0)), 4)
        .alias("target_volume"),
        F.round(F.sum("_vol"), 4).alias("total_volume"),
    )
    return agg.select(
        "o_year", "target_volume", "total_volume",
        F.try_divide(F.col("target_volume"), F.col("total_volume"))
        .alias("mkt_share"),
    ).orderBy("o_year")


def sole_blame_supplier(supplier: DataFrame, lineitem: DataFrame,
                        orders: DataFrame, nation: DataFrame,
                        k: int = 25) -> DataFrame:
    """TPC-H Q21 shape re-keyed to this schema: suppliers who were the
    ONLY supplier with a returned line ('R', the failure proxy — this
    lineitem has no receipt/commit dates) on a finalized multi-supplier
    order. Returns top-k (s_name, n_name, numwait).

    The Q21 topology survives intact: one EXISTS semi-join (another
    supplier participated in the order) and one NOT-EXISTS anti-join
    (no OTHER supplier also failed) against second/third scans of
    lineitem, all equi on the integer orderkey with the suppkey
    inequality as a join residual — never a cross join. Only
    (orderkey, suppkey) pairs ride the shuffles. l1 is distinct-ed
    (one blame per order however many lines a supplier returned — the
    unit numwait counts); the l2/l3 EXISTS sides are deliberately NOT:
    semi/anti probes never duplicate, so a distinct there is a pure
    extra shuffle. nation (25 rows) is hinted; supplier/orders/
    lineitem stay AQE-decided."""
    l1 = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey").distinct()
    okeys = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    l2 = lineitem.select(F.col("l_orderkey").alias("_ok2"),
                         F.col("l_suppkey").alias("_sk2"))
    l3 = lineitem.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("_ok3"),
        F.col("l_suppkey").alias("_sk3"))
    blamed = (
        l1.join(okeys, l1.l_orderkey == okeys.o_orderkey, "left_semi")
        .join(l2, (F.col("l_orderkey") == F.col("_ok2"))
              & (F.col("l_suppkey") != F.col("_sk2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("_ok3"))
              & (F.col("l_suppkey") != F.col("_sk3")), "left_anti")
    )
    counts = blamed.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("numwait"))
    return (
        counts.join(supplier.select("s_suppkey", "s_name", "s_nationkey"),
                    counts.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def part_supplier_counts(part: DataFrame, lineitem: DataFrame,
                         supplier: DataFrame,
                         exclude_brand: str = "Brand#1",
                         exclude_type_prefix: str = "PROMO",
                         sizes: tuple[int, ...] = (1, 4, 9, 14, 19,
                                                   23, 36, 45),
                         complaint_pattern: str = "00000000[02468]$",
                         k: int = 40) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    (brand, type, size) part class, excluding one brand, one type
    prefix, and "complaint" suppliers — the supplier-diversity rollup.
    The canonical Q16 reads partsupp; the observed (l_partkey,
    l_suppkey) pairs in lineitem ARE that bridge here, so the shape
    needs no invented table. Returns top-k by (supplier_cnt desc,
    brand, type, size).

    The pair distinct runs FIRST on the two integer keys (16 bytes per
    row into one shuffle — never the full lineitem payload); part is
    pre-filtered by brand/type/size before its join; the complaint
    exclusion is a NOT-IN on a name-filtered supplier side expressed
    as left_anti (null-safe, unlike SQL NOT IN). count_distinct
    partial-aggregates map-side. TakeOrderedAndProject top-k."""
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    p = part.where(
        (F.col("p_brand") != exclude_brand)
        & (~F.col("p_type").startswith(exclude_type_prefix))
        & (F.col("p_size").isin(*sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complainers = supplier.where(
        F.col("s_name").rlike(complaint_pattern)).select(
        F.col("s_suppkey").alias("_bad_sk"))
    out = (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(complainers, ps.l_suppkey == F.col("_bad_sk"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(k)
    )
    return out


def min_cost_supplier(part: DataFrame, supplier: DataFrame,
                      lineitem: DataFrame, nation: DataFrame,
                      region: DataFrame, region_name: str = "EUROPE",
                      part_type: str = "STANDARD",
                      sizes: tuple[int, ...] = (5, 15, 25, 35, 45),
                      k: int = 100) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for each qualifying part,
    the region's suppliers whose observed unit cost equals the
    region-wide minimum for that part. The canonical Q2 reads
    partsupp.ps_supplycost; here the observed unit cost is
    ``min(l_extendedprice / l_quantity)`` over a supplier's shipped
    lines of that part — the same correlated-min topology
    (cost = (SELECT min(cost) ... WHERE same part, region suppliers))
    on the lineitem-derived bridge this schema actually has (the
    q16 partsupp stand-in, :func:`part_supplier_counts`).

    Plan: the bridge groupBy ships (partkey, suppkey, one double) —
    never lineitem payload; part is size/type-pruned at its scan;
    region→nation is the broadcast side of a semi-filter on supplier;
    the correlated min is a window on p_partkey over the already
    joined-down candidate set (thousands of rows per part class, not
    the raw fact table). Ties on the min keep every tied supplier,
    as canonical Q2 does. Cross-engine: unit_cost is an IEEE double
    division of bit-identical inputs → bit-identical min/equality in
    both engines; no rounding anywhere.

    Ref: TPC-H Q2; reference catalogue-min semantics
    perustats/BCRP/metadata.py:252-357 (cheapest-match search)."""
    bridge = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity"))
        .alias("unit_cost"))
    p = part.where(
        (F.col("p_type") == part_type) & (F.col("p_size").isin(*sizes))
    ).select("p_partkey", "p_type", "p_size")
    r = region.where(F.col("r_name") == region_name).select("r_regionkey")
    n = (nation.join(F.broadcast(r),
                     nation.n_regionkey == F.col("r_regionkey"))
         .select("n_nationkey", "n_name"))
    s = (supplier.join(F.broadcast(n),
                       supplier.s_nationkey == F.col("n_nationkey"))
         .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    cand = (bridge.join(p, bridge.l_partkey == p.p_partkey)
            .join(s, bridge.l_suppkey == F.col("s_suppkey")))
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_size",
                "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(k)
    )


def product_type_profit(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, orders: DataFrame,
                        nation: DataFrame, name_contains: str = "rod",
                        cost_factor: float = 0.5) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year):
    profit = revenue − cost for every line of a part whose name
    contains *name_contains*, grouped by the SUPPLIER's nation and
    the order year. The canonical Q9 costs a line at
    ps_supplycost·l_quantity; this schema has no partsupp, so cost is
    ``cost_factor · p_retailprice · l_quantity`` — deterministic,
    column-derived, and it preserves what Q9 exercises: a 5-table
    join where the fact row needs BOTH its part dim (cost basis) and
    its supplier dim (group key) plus the orders dim (year).

    Cross-engine: revenue sits on the 1e-4 grid (2-dec price × 2-dec
    discount) and cost on 5e-2 (0.5 × 1-dec retailprice × integer
    qty), so per-row profit is exact on 1e-4 — cast to DECIMAL(18,4)
    per row, summed as DECIMAL (order-independent), rounded to 2 as
    DECIMAL, then cast double: the q1 sum_charge recipe.

    Plan: name filter prunes part at its scan; nation broadcast;
    part/supplier/orders joins AQE-decided; one final groupBy on a
    (nation, year) key space of a few hundred."""
    p = part.where(F.col("p_name").contains(name_contains)).select(
        "p_partkey", "p_retailprice")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(cost_factor) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    joined = (
        lineitem.join(p, lineitem.l_partkey == p.p_partkey)
        .join(supplier.select("s_suppkey", "s_nationkey"),
              lineitem.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").alias("o_year"),
                profit.alias("_profit"))
    )
    return (
        joined.groupBy("nation", "o_year")
        .agg(F.round(F.sum("_profit"), 2).cast("double")
             .alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def important_stock(lineitem: DataFrame, supplier: DataFrame,
                    nation: DataFrame, nation_name: str = "NATION_3",
                    fraction: float = 0.001) -> DataFrame:
    """TPC-H Q11 shape (important stock): the parts whose observed
    traded value through one nation's suppliers exceeds *fraction* of
    that nation's total — the aggregate-vs-global-aggregate HAVING
    topology. Canonical Q11 values partsupp availability
    (supplycost·availqty); here a part's value is
    ``sum(l_extendedprice·(1−l_discount))`` over the nation's
    supplier lines — same filter, same two-level aggregation.

    Plan: ONE scan of lineitem semi-filtered to the nation's
    suppliers (supplier×broadcast-nation is the small side), one
    groupBy on partkey; the global total re-aggregates the per-part
    sums (tiny) and broadcasts back as a 1-row cross join — the
    scalar-subquery plan, no second fact scan. Cross-engine: values
    summed as DECIMAL(18,4) (1e-4 grid), the HAVING comparison runs
    in decimal on both engines (fraction is an exact decimal
    literal), output rounded to 2 as DECIMAL then cast double."""
    n = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    s = (supplier.join(F.broadcast(n),
                       supplier.s_nationkey == F.col("n_nationkey"))
         .select(F.col("s_suppkey").alias("_sk")))
    per_part = (
        lineitem.join(s, lineitem.l_suppkey == F.col("_sk"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast("decimal(18,4)")).alias("_value"))
    )
    total = per_part.agg(
        (F.sum("_value") * F.lit(fraction).cast("decimal(18,6)"))
        .alias("_threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("_value") > F.col("_threshold"))
        .select("l_partkey",
                F.round(F.col("_value"), 2).cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str = "ts", start_col: str = "start",
               end_col: str = "end",
               bucket_seconds: int = 3600) -> DataFrame:
    """Keyless point-in-interval range join, bucketed: each interval
    explodes to the time buckets it covers and each point hashes to
    its bucket, so the join is EQUI on the bucket id with the
    ``start ≤ p < end`` predicate as a residual — the blocking that
    turns what Spark would otherwise plan as a
    BroadcastNestedLoopJoin (every point × every interval) into a
    shuffle-partitionable hash join (plan-asserted in
    tests/test_plans.py). When an equi key EXISTS (e.g. user-session
    assignment), a plain equi join with a range residual is already
    fine — this operator is for the keyless case: global incident /
    maintenance / calendar windows against the full fact stream.

    Semantics: half-open ``[start, end)``; a point landing in
    overlapping intervals matches each of them. All input columns of
    both sides survive. Bucket sizing is the scale knob: intervals
    spanning b buckets replicate b times (choose *bucket_seconds*
    near the typical interval length; a pathological years-long
    interval against an hour bucket replicates 10⁴× — size the
    bucket, don't salt after the fact). Bucket ids derive from
    integer micros (cross-engine-safe per the working notes)."""
    b = bucket_seconds * 1_000_000
    p = points.withColumn(
        "_bk", F.floor(F.unix_micros(F.col(point_col)) / F.lit(b)))
    iv = (
        intervals
        .withColumn(
            "_bk",
            F.explode(F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / F.lit(b)),
                # end is exclusive: a boundary-aligned end owns no bucket
                F.floor((F.unix_micros(F.col(end_col)) - 1) / F.lit(b)),
            )))
    )
    return (
        p.join(iv, "_bk")
        .where((F.col(point_col) >= F.col(start_col))
               & (F.col(point_col) < F.col(end_col)))
        .drop("_bk")
    )


def part_affinity(lineitem: DataFrame, max_basket: int = 50,
                  k: int = 50) -> DataFrame:
    """Market-basket co-occurrence: pairs of parts appearing in the
    same order, with a Jaccard-style affinity — the
    frequently-bought-together rollup (the retail face of the
    reference's frequency counts, perustats/BCRP/metadata.py
    rollups). Returns top-*k* (part_a, part_b, n_both, affinity)
    where affinity = n_both / (n_a + n_b − n_both) over per-part
    basket counts.

    Scale shape — the inverted-index bucket idiom
    (:func:`~pyperustats_spark.operators.dedup.ngram_jaccard_pairs`):
    ONE shuffle builds the per-order part sets (collect_set
    deduplicates map-side — the separate distinct pass's exchange is
    gone, optimization r11); baskets gather per order, singletons skipped
    and oversized baskets dropped (*max_basket* — a degenerate
    mega-order cannot go O(n²)); pairs emit from two chained
    explodes, never a self-join. The affinity ratio is int/int IEEE
    division of identical counts — shipped raw, bit-identical
    cross-engine (CLAUDE.md). Per-part counts come from the SAME
    capped item set so the denominator matches what generated the
    pairs.

    NOT persisted (r12 A/B): baskets is referenced twice (pairs + per-
    part counts), but BOTH references prune the gather to the identical
    subtree, so AQE's runtime stage reuse already executes it once —
    a persist+repartition variant measured FLAT at 100× (28.4 vs
    28.7 s) while adding a 13.6M-array cache block. This is the
    exception to the reference-once rule, not a license: the rule's
    measured failures are all differently-pruned references (the
    static plan here shows two scans, the reuse is runtime-only)."""
    baskets = (
        lineitem.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .where((F.size("parts") >= 2) & (F.size("parts") <= max_basket))
        .select("l_orderkey", F.array_sort("parts").alias("parts"))
    )
    it = baskets.select("l_orderkey", F.explode("parts").alias("pk"))
    pairs = (
        baskets.select(F.explode("parts").alias("pa"), F.col("parts"))
        .select("pa", F.explode("parts").alias("pb"))
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    pc = it.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(pc.select(F.col("pk").alias("pa"),
                             F.col("n").alias("_na")), "pa")
        .join(pc.select(F.col("pk").alias("pb"),
                        F.col("n").alias("_nb")), "pb")
        .select(F.col("pa").alias("part_a"), F.col("pb").alias("part_b"),
                "n_both",
                (F.col("n_both")
                 / (F.col("_na") + F.col("_nb") - F.col("n_both")))
                .alias("affinity"))
        .orderBy(F.desc("n_both"), "part_a", "part_b")
        .limit(k)
    )


def dominant_supplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, nation: DataFrame,
                      region: DataFrame, name_prefix: str = "blue",
                      date_from: str = "1996-01-01",
                      date_to: str = "1997-01-01",
                      share: float = 0.35,
                      region_name: str = "EUROPE") -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the region's
    suppliers who shipped more than *share* of some qualifying
    part's total volume inside a date window. Canonical Q20 compares
    ps_availqty against half the shipped quantity; without partsupp
    the dominance test compares a supplier's own shipped quantity
    per part against share·(part total) — the same nested
    quantity-threshold semi-join, derived from the one table that
    records movement.

    Plan: lineitem is date-pruned at the scan and semi-joined to the
    name-pruned part keys BEFORE aggregating; per-(part, supplier)
    sums then a window over partkey give both sides of the dominance
    test in one shuffle; qualifying supplier keys are distinct-ed
    (a supplier dominating 3 parts appears once) and semi-join the
    region's suppliers. Quantities are integer-valued, so sums are
    exact and order-independent; the share comparison multiplies
    bit-identical doubles on both engines. Output (s_name,
    s_acctbal) ordered by name — s_acctbal rides for the analyst,
    on the 2-dec grid."""
    pk = part.where(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey")
    li = (lineitem
          .where((F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp")))
          .join(pk, lineitem.l_partkey == pk.p_partkey, "left_semi"))
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("_qty_ps"))
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("_qty_p", F.sum("_qty_ps").over(w))
        .where(F.col("_qty_ps") > F.lit(share) * F.col("_qty_p"))
        .select("l_suppkey").distinct()
    )
    r = region.where(F.col("r_name") == region_name).select("r_regionkey")
    n = (nation.join(F.broadcast(r),
                     nation.n_regionkey == F.col("r_regionkey"))
         .select("n_nationkey"))
    return (
        supplier.join(F.broadcast(n),
                      supplier.s_nationkey == F.col("n_nationkey"),
                      "left_semi")
        .join(dominant, supplier.s_suppkey == dominant.l_suppkey,
              "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def customer_tier_migration(orders: DataFrame, year_from: int = 1996,
                            year_to: int = 1997, n_tiles: int = 4,
                            sort: bool = True) -> DataFrame:
    """Year-over-year spend-quartile migration matrix: customers are
    tiered by total spend in *year_from* and again in *year_to*
    (4 = top quartile), and the matrix counts customers per
    (tier_from, tier_to) cell — NULL tier = not active that year
    (acquisition row / churn column). The classic cohort-health BI
    rollup.

    Determinism: spend accumulates as integer CENTS (the 2-decimal
    grid recovery) with custkey tiebreaks; tiers come from
    :func:`~pyperustats_spark.operators.layout.histogram_ntile`
    per year (value-derived ranks — the wide-frame-safe exact ntile;
    see CLAUDE.md on the global-ntile exchange-reuse trap). Scale: one
    shuffle to per-(customer, year) aggregates, one histogram-ntile
    pass per year ($100-bucket side tables), a full-outer join on
    custkey, and a |tiles|²-row rollup."""
    from pyperustats_spark.operators.layout import histogram_ntile

    def tiers(year: int, out_col: str) -> DataFrame:
        spend = (
            orders.where(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.sum(F.round(F.col("o_totalprice") * 100)
                       .cast("bigint")).alias("_cents"))
            # histogram_ntile references its input twice — persist the
            # per-customer aggregate so the orders scan runs once/year
            .persist()
        )
        t = histogram_ntile(spend, F.floor(F.col("_cents") / 10000),
                            [F.col("_cents"), F.col("o_custkey")],
                            n_tiles, out_col=out_col)
        return t.select("o_custkey", out_col)

    a = tiers(year_from, "tier_from")
    b = tiers(year_to, "tier_to")
    out = (
        a.join(b, "o_custkey", "full_outer")
        .groupBy("tier_from", "tier_to")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return out.orderBy(F.asc_nulls_first("tier_from"),
                       F.asc_nulls_first("tier_to")) if sort else out


def cohort_ltv(orders: DataFrame, sort: bool = True) -> DataFrame:
    """Acquisition-cohort LTV curves: customers are cohorted by their
    FIRST order month; each cohort's revenue is laid out by months
    since acquisition with a running cumulative and a per-customer
    LTV — the standard growth-accounting rollup (revenue retention /
    payback curves fall out of it).

    Determinism: revenue accumulates as integer CENTS; the month index
    is pure integer arithmetic ((Δyear)·12 + Δmonth — months_between
    would return engine-specific doubles); the cumulative is an
    ORDERED window cumsum of bigints over the bounded per-cohort month
    frame; ltv_per_customer is one deterministic double chain from
    exact integers, shipped RAW. Scale: one shuffle to per-customer
    first-order rows, one to (cohort, month) cells; windows run on the
    cohort×month rollup (bounded by the date range squared), never on
    raw orders."""
    # persisted: referenced by the enrichment join AND the cohort-size
    # aggregate — unpersisted, the orders scan+agg would run twice
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("MONTH", F.min("o_orderdate")).alias("cohort")).persist()
    enriched = (
        orders.join(first, "o_custkey")
        .select(
            "o_custkey",
            "cohort",
            ((F.year(F.date_trunc("MONTH", F.col("o_orderdate")))
              - F.year(F.col("cohort"))) * 12
             + (F.month(F.col("o_orderdate")) - F.month(F.col("cohort"))))
            .cast("bigint").alias("month_index"),
            F.round(F.col("o_totalprice") * 100).cast("bigint")
            .alias("_cents"),
        )
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers"))
    cells = enriched.groupBy("cohort", "month_index").agg(
        F.sum("_cents").alias("_rev_cents"))
    wc = (Window.partitionBy("cohort").orderBy("month_index")
          .rowsBetween(Window.unboundedPreceding, 0))
    out = (
        cells.withColumn("_cum_cents", F.sum("_rev_cents").over(wc))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort", "month_index", "n_customers",
            (F.col("_rev_cents").cast("double") / F.lit(100.0))
            .alias("revenue"),
            (F.col("_cum_cents").cast("double") / F.lit(100.0))
            .alias("cum_revenue"),
            ((F.col("_cum_cents").cast("double") / F.lit(100.0))
             / F.col("n_customers")).alias("ltv_per_customer"),
        )
    )
    return out.orderBy("cohort", "month_index") if sort else out


def sales_cube(lineitem: DataFrame, sort: bool = True) -> DataFrame:
    """Full OLAP CUBE over (returnflag, linestatus, ship year): item
    count and revenue at EVERY aggregation level, tagged with the SQL
    grouping id — the one-query answer to a BI tool's drill-up/-down
    matrix, and the GROUPING SETS surface of the engine (q_sales_rollup
    covers the hierarchical ROLLUP case).

    Spark expands the cube map-side into 2³ grouping sets feeding ONE
    partial-aggregated shuffle — not 8 scans. Revenue accumulates as
    integer cents (exact, merge-order-free) and converts to currency
    once; grouping_id bit order (left = most significant) matches
    DuckDB's GROUPING(a, b, c)."""
    base = lineitem.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("_cents"),
    )
    out = (
        base.cube("returnflag", "linestatus", "ship_year")
        .agg(
            F.grouping_id().cast("bigint").alias("grp_id"),
            F.count(F.lit(1)).alias("n_items"),
            (F.sum("_cents").cast("double") / F.lit(100.0)).alias("revenue"),
        )
    )
    return out.orderBy(
        "grp_id",
        F.asc_nulls_first("returnflag"),
        F.asc_nulls_first("linestatus"),
        F.asc_nulls_first("ship_year"),
    ) if sort else out


def fuzzy_name_pairs(df: DataFrame, block_col: str = "c_nationkey",
                     key: str = "c_custkey", name: str = "c_name",
                     max_dist: int = 1,
                     max_block: int = 10_000) -> DataFrame:
    """Blocked entity-resolution pairs: rows in the same *block_col*
    block whose *name* values sit within Levenshtein distance
    *max_dist* — the dedup-by-similarity step of record linkage (the
    reference's catalogue reconciliation, perustats/infogob location
    canonicalization, generalized from exact-match to edit-distance).
    Returns (key_a, key_b, name_a, name_b, dist), ordered, EXACT:
    every within-block pair at distance ≤ max_dist, none missed.

    Scale shape — deletion-neighbourhood blocking (FastSS, Bocek et
    al.): each name posts its ≤ max_dist single-character-deletion
    variants (L+1 variants at k=1, O(L^k) at k — max_dist ≤ 2
    enforced), and two names within Levenshtein distance k ALWAYS
    share a variant, so candidates form only in (block, variant)
    buckets that are near-singleton on real name data. The first cut
    gathered whole nation blocks and ran levenshtein on every in-block
    pair — O(block²) DP evals, measured 28 s at sf0.1 and headed for
    ~30 min at the 100× depth set; FastSS replaces that with
    |buckets| ≈ n·L postings and levenshtein only on bucket
    co-members. Buckets above *max_block* are dropped (skew guard);
    it can only bite when ≥ max_block rows share a variant — i.e.
    ≥ max_block near-copies of one string, where the TRUE answer is
    itself quadratic. The gather + in-array explode idiom as
    everywhere (never a self-join); candidate pairs are distinct-ed
    BEFORE the single levenshtein verification per pair, whose
    unit-cost semantics match DuckDB exactly — the oracle is the
    plain all-in-block-pairs SQL, which the lossless candidate
    generation must reproduce verbatim."""
    if not 1 <= max_dist <= 2:
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    nm = F.col(name)
    # all strings obtained by deleting exactly one char at position i
    # (1-based); dedup via array_distinct (repeated chars collide)
    del1 = F.transform(
        F.sequence(F.lit(1), F.length(nm)),
        lambda i: F.concat(F.substring(nm, 1, i - 1),
                           nm.substr(i + 1, F.length(nm))))
    variants = F.concat(F.array(nm), del1)
    if max_dist == 2:
        del2 = F.flatten(F.transform(del1, lambda v: F.transform(
            F.sequence(F.lit(1), F.length(v)),
            lambda i: F.concat(F.substring(v, 1, i - 1),
                               v.substr(i + 1, F.length(v))))))
        variants = F.concat(variants, del2)
    posts = df.select(
        F.col(block_col).alias("_blk"),
        F.struct(F.col(key).alias("k"), nm.alias("nm")).alias("_r"),
        F.explode(F.array_distinct(variants)).alias("_v"),
    )
    buckets = (
        posts.groupBy("_blk", "_v")
        .agg(F.collect_list("_r").alias("_rs"))
        .where((F.size("_rs") >= 2) & (F.size("_rs") <= max_block))
        .select("_rs")
    )
    cand = (
        buckets.select(F.explode("_rs").alias("a"), F.col("_rs"))
        .select("a", F.explode("_rs").alias("b"))
        .where(F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"),
            F.col("a.nm").alias("name_a"), F.col("b.nm").alias("name_b"),
        )
        .distinct()
    )
    pairs = (
        cand.select(
            "key_a", "key_b", "name_a", "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
    return pairs.orderBy("key_a", "key_b")


def weighted_sample(df: DataFrame, key: str, weight_col: str,
                    k: int = 100, salt: str = "wsample") -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement, size *k*:
    the Efraimidis–Spirakis A-ES scheme — each row draws uniform u
    from a salted md5 of its key and the k rows with the largest
    u^(1/w) win, which is exactly probability-proportional-to-weight
    sampling without replacement. The training-data use: sample a
    corpus proportional to per-document quality/importance weights,
    reproducibly (same salt → same sample across runs, engines and
    reshards — rand() gives none of that).

    Determinism ladder (CLAUDE.md ln-recipe): u derives from md5 hex
    → bigint, +0.5, /2³² — every step exact in both engines; ranking
    by u^(1/w) is equivalent to ranking by es_key = −ln(u)/w
    ascending, so ln(u) (engines differ by ulps) is snapped to the
    1e-6 grid and the division by the 2-decimal-grid weight ships
    raw — identical bits, identical ranks; ties (impossible in
    practice, astronomically unlikely by construction) break on the
    key. The scan is row-local + one global top-k (TakeOrdered — a
    per-partition heap then a k-row driver merge, never a full
    sort). Non-positive weights are excluded (u^(1/w) undefined)."""
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string")))
    u = ((F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") + 0.5)
         / F.lit(4294967296.0))
    w = F.round(F.col(weight_col), 2)
    es_key = -F.round(F.log(u), 6) / w
    return (
        df.where(F.col(weight_col) > 0)
        .select(F.col(key), w.alias("weight"), es_key.alias("es_key"))
        .orderBy(F.col("es_key").asc(), F.col(key).asc())
        .limit(k)
    )


def revenue_gini(orders: DataFrame) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    one-row inequality card ("do 1 % of customers carry half the
    revenue?") that decides whether per-customer partitions need skew
    handling. Returns (n_customers, total_cents, gini).

    Exact integer arithmetic end to end: per-customer revenue in
    cents (2-decimal grid recovery), customers ranked by
    (cents, custkey) — a total order, so the rank-weighted sum
    Σ i·xᵢ is well-defined and identical cross-engine — and
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) computed as one division
    of exact values (shipped raw). Ranks are NOT a partition-less
    window (a global sort of the per-customer frame — the plan-sweep
    single-partition smell, corpus-proportional at 1e9 customers):
    they come from the histogram-rank core the layout family uses —
    value-bucket offsets (a ≤2^bits side table) + in-bucket
    row_number, parallel across buckets, identical to the global
    (cents, custkey) order because the bucket is monotone in cents.
    Σ i·xᵢ accumulates in DECIMAL(38,0): at 1e9 customers × 1e13
    max-rank·cents products a bigint would overflow."""
    from pyperustats_spark.operators.layout import _bounds, _bucket

    # persisted: feeds the bounds row, the bucket-count side table and
    # the ranked pass — the CLAUDE.md histogram_ntile rule (Catalyst
    # re-runs the orders aggregate per reference otherwise)
    cents = (orders.groupBy("o_custkey")
             .agg(F.round(F.round(F.sum("o_totalprice"), 2) * 100)
                  .cast("bigint").alias("_c"))
             .persist())
    b = cents.crossJoin(F.broadcast(_bounds(cents, ["_c"])))
    z = b.select("o_custkey", "_c",
                 _bucket(F.col("_c"), F.col("_lo__c"), F.col("_hi__c"),
                         12).alias("_hb"))
    counts = z.groupBy("_hb").agg(F.count(F.lit(1)).alias("_cnt"))
    ws = Window.orderBy("_hb")
    side = counts.select(
        "_hb",
        F.coalesce(F.sum("_cnt").over(
            ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_off"))
    wp = Window.partitionBy("_hb").orderBy("_c", "o_custkey")
    ranked = (z.withColumn("_pos", F.row_number().over(wp))
              .join(F.broadcast(side), "_hb")
              .select("_c", (F.col("_off") + F.col("_pos"))
                      .cast("bigint").alias("_i")))
    g = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("_c").cast("bigint").alias("total_cents"),
        F.sum((F.col("_i") * F.col("_c")).cast("decimal(38,0)"))
        .alias("_iw"),
    )
    # every factor cast to double EXPLICITLY (and identically in the
    # oracle): n*total as bigint would overflow at ~1e9 customers, and
    # the decimal→double conversions round the same exact integer to
    # the same bits in both engines (ols_exact precedent)
    return g.select(
        "n_customers", "total_cents",
        ((F.lit(2.0) * F.col("_iw").cast("double")
          - (F.col("n_customers") + 1).cast("double")
          * F.col("total_cents").cast("double"))
         / (F.col("n_customers").cast("double")
            * F.col("total_cents").cast("double")))
        .alias("gini"),
    )


def benford_first_digit(orders: DataFrame,
                        value_col: str = "o_totalprice",
                        sort: bool = True) -> DataFrame:
    """Benford's-law first-digit profile of *value_col* — the
    data-forensics card (fabricated or unit-mangled amounts bend the
    first-digit curve long before totals look wrong). Returns
    (digit, n, share, benford_share, chi2) with the chi-square
    against the Benford expectation carried per row.

    Counts are exact integers; share is raw int/int; the Benford
    expectation log10(1+1/d) is a LITERAL (both engines constant-fold
    the same double); chi2 sums (o_d − n·p_d)²/(n·p_d) over the 9
    digits via an ordered cumulative window (deterministic double
    accumulation) — every input to it bit-identical cross-engine."""
    import math

    # first digit from INTEGER cents: integer→string formatting is
    # identical cross-engine, double→string is not (scientific
    # notation thresholds differ); shifting by 100 never changes the
    # leading digit
    d = orders.where(F.col(value_col) > 0).select(
        F.substring(F.round(F.col(value_col) * 100).cast("bigint")
                    .cast("string"), 1, 1)
        .cast("int").alias("digit"))
    base = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy()
    # expectations snapped to the 1e-6 grid in BOTH engines (all nine
    # constants sit >= 9.4e-9 from a round-6 midpoint — measured — so
    # libm ulp differences can't flip the grid point)
    probs = F.create_map(*[
        x for dd in range(1, 10)
        for x in (F.lit(dd), F.lit(round(math.log10(1 + 1 / dd), 6)))])
    w1 = base.select(
        "digit", "n",
        F.sum("n").over(tot).cast("bigint").alias("_tn"),
        probs[F.col("digit")].alias("_p"),
    )
    dev = ((F.col("n") - F.col("_tn") * F.col("_p"))
           * (F.col("n") - F.col("_tn") * F.col("_p"))
           / (F.col("_tn") * F.col("_p")))
    wc = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, 0)
    rk = F.row_number().over(Window.orderBy(F.desc("digit")))
    staged = w1.select(
        "digit", "n", "_tn", "_p",
        F.sum(dev).over(wc).alias("_c2"),
        rk.alias("_rk"),
    )
    chi2 = staged.where(F.col("_rk") == 1).select(
        F.col("_c2").alias("chi2"))
    out = (w1.crossJoin(F.broadcast(chi2))
           .select("digit", "n",
                   (F.col("n") / F.col("_tn")).alias("share"),
                   F.col("_p").alias("benford_share"),
                   "chi2"))
    return out.orderBy("digit") if sort else out


def supplier_hhi(lineitem: DataFrame, supplier: DataFrame,
                 nation: DataFrame, sort: bool = True) -> DataFrame:
    """Herfindahl–Hirschman concentration of shipped quantity across
    each nation's suppliers: HHI = Σᵢ sᵢ² / (Σᵢ sᵢ)² ∈ (0, 1] — the
    market-concentration card (1 = monopoly, 1/n = perfectly even),
    the recursive-free sibling of the share-of-total queries
    (reference analog: result-share aggregation,
    perustats/infogob/20_resultados.py).

    EXACT integers end-to-end: l_quantity is integer-valued, so the
    per-supplier sum is on the integer grid (double partial-agg merge
    order cannot move it) and rounds to bigint losslessly; Σs² and
    (Σs)² are squared via DECIMAL(19,0) — a bigint square silently
    WRAPS in Spark once a nation's total passes ~3.04e9 (reachable at
    large SF) while DuckDB raises, diverging the engines (ADVICE r8)
    — and both wide integers cast to double (correctly rounded in
    both engines) before the RAW quotient, which is then bit-identical
    cross-engine. Two partial-aggregated shuffles (supplier grain,
    nation grain); nation is a broadcast dim."""
    per = (
        lineitem.select("l_suppkey", "l_quantity")
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 0).cast("bigint").alias("s"))
    )
    agg = per.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("s").cast("bigint").alias("total_qty"),
        F.sum(F.col("s").cast("decimal(19,0)") * F.col("s"))
        .cast("decimal(38,0)").alias("_s2"),
    )
    out = (
        agg.join(F.broadcast(nation.select("n_nationkey", "n_name")),
                 F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"), "n_suppliers", "total_qty",
            F.try_divide(
                F.col("_s2").cast("double"),
                (F.col("total_qty").cast("decimal(19,0)")
                 * F.col("total_qty")).cast("double"))
            .alias("hhi"),
        )
    )
    return out.orderBy("nation") if sort else out


def supplier_skyline(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, sort: bool = True) -> DataFrame:
    """Per-nation supplier SKYLINE (Pareto front, Börzsönyi et al.
    2001): suppliers not DOMINATED on (revenue ↑ better, shipment
    line count ↓ better — the efficiency frontier: same revenue with
    fewer shipments wins) — another supplier dominates when its
    revenue is ≥ AND its line count is ≤ with at least one strict.
    The classic multi-criteria shortlist operator (pick suppliers
    where no alternative is better on both axes at once).

    Exact arithmetic: revenue is summed as DECIMAL(18,4) (the 4-grid
    extendedprice·(1−discount) products — the q1 sum_charge recipe;
    round-2 of a 4-grid sum CAN land on engine-splitting midpoints)
    and carried as integer ten-thousandths; line counts are ints. So
    dominance is pure integer comparison, bit-identical cross-engine.

    Scale shape — no O(n²) dominance join AND no O(n²) window frame:
    dominance collapses to a RUNNING PREFIX MIN. Group suppliers to
    one row per (nation, revenue) carrying the level's min line count,
    run min() over rev-descending ROWS(unbounded, −1) — the linear
    running-aggregate frame, one row per level so "preceding rows" IS
    "strictly higher revenue" — and join back on (nation, revenue).
    dominated ⇔ prefix-min over strictly-higher revenue ≤ own count,
    OR the level's peer-min < own count; equal (revenue, count) pairs
    dominate neither way and are all kept — reproduces the NOT-EXISTS
    oracle exactly. (A rangeBetween(1, unboundedFollowing) frame is
    the same semantics but hits Spark's per-row re-scanning
    UnboundedFollowing processor — the O(n²)-per-partition smell the
    plan sweep exists to catch, and it caught this one.) The level
    branch re-derives the supplier aggregate (Catalyst re-runs common
    subtrees) but prunes to 3 integer columns — the documented bounded
    2× trade."""
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)"))
    per = (
        lineitem.select("l_suppkey", "l_extendedprice", "l_discount")
        .join(supplier.select("s_suppkey", "s_nationkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey", "s_suppkey", "s_name")
        .agg((rev * 10_000).cast("bigint").alias("rev_dm"),
             F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )
    level = per.groupBy("s_nationkey", "rev_dm").agg(
        F.min("n_lines").alias("_ml_peer"))
    w_pref = (Window.partitionBy("s_nationkey")
              .orderBy(F.desc("rev_dm"))
              .rowsBetween(Window.unboundedPreceding, -1))
    lvl = level.select(
        "s_nationkey", "rev_dm", "_ml_peer",
        F.min("_ml_peer").over(w_pref).alias("_ml_strict"))
    flagged = per.join(lvl, ["s_nationkey", "rev_dm"])
    kept = flagged.where(
        (F.col("_ml_strict").isNull()
         | (F.col("_ml_strict") > F.col("n_lines")))
        & (F.col("_ml_peer") >= F.col("n_lines")))
    out = (
        kept.join(F.broadcast(nation.select("n_nationkey", "n_name")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"), "s_name",
            (F.col("rev_dm") / 10_000.0).alias("revenue"),
            "n_lines",
        )
    )
    return out.orderBy("nation", "s_name") if sort else out


def revenue_lorenz(orders: DataFrame, n_tiles: int = 10) -> DataFrame:
    """Lorenz curve of customer revenue concentration in *n_tiles*
    points — the curve behind :func:`revenue_gini`'s scalar ("the
    bottom 50 % of customers carry X % of revenue"): customers ranked
    by exact revenue cents, cut into SQL-ntile deciles, each decile's
    cumulative revenue share reported. Returns (decile, n_customers,
    tile_cents, cum_cents, cum_share) — integers plus one raw
    bigint/bigint share (bit-identical cross-engine).

    Same scale shape as revenue_gini: the global (cents, custkey)
    rank comes from the histogram-rank core
    (:func:`~pyperustats_spark.operators.layout.histogram_ntile` —
    value-bucket offsets + in-bucket row_number, parallel across
    buckets, NO partition-less data-sized window; the oracle's plain
    ntile window reproduces it exactly because the formula IS SQL
    ntile). The decile rollup is an n_tiles-row frame; its ordered
    cumsum is integer (deterministic by type, not by luck)."""
    from pyperustats_spark.operators.layout import (
        _bounds, _bucket, histogram_ntile)

    cents = (orders.groupBy("o_custkey")
             .agg(F.round(F.round(F.sum("o_totalprice"), 2) * 100)
                  .cast("bigint").alias("_c"))
             .persist())
    b = cents.crossJoin(F.broadcast(_bounds(cents, ["_c"])))
    tiled = histogram_ntile(
        b, _bucket(F.col("_c"), F.col("_lo__c"), F.col("_hi__c"), 12),
        order=[F.col("_c"), F.col("o_custkey")],
        n_tiles=n_tiles, out_col="decile")
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("_c").cast("bigint").alias("tile_cents"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = per.select(
        "decile", "n_customers", "tile_cents",
        F.sum("tile_cents").over(wc).cast("bigint").alias("cum_cents"),
    )
    # grand total as a full-frame window over the n_tiles-row frame
    # (audited bounded SINGLE_PART class): the separate 1-row
    # aggregate + crossJoin referenced cum twice and Catalyst re-ran
    # the entire histogram-ntile subtree for the total branch
    # (r11: 97-node plan -> ~half, one ntile execution)
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        cum.select("decile", "n_customers", "tile_cents", "cum_cents",
                   F.try_divide(F.col("cum_cents"),
                                F.max("cum_cents").over(w_all))
                   .alias("cum_share"))
        .orderBy("decile")
    )


def price_index_monthly(lineitem: DataFrame) -> DataFrame:
    """Laspeyres and Paasche monthly price indexes over the part
    catalogue — the INEI/BCRP-style CPI primitive this engine's
    reference domain publishes (index = how much the base-period
    basket costs at current prices). Base period = the first month;
    for each later month the basket is the parts traded in BOTH
    months (matched-sample index).

    Everything is fixed-point integer until the final division:
    per-(part, month) revenue in exact cents and integer quantities,
    unit price as micro-cents-per-unit via bigint floor-division,
    index numerators/denominators as Σ price·quantity in DECIMAL(38,0)
    — so the sums are merge-order-proof and both engines produce
    identical bits; the published index is one raw decimal/decimal
    division (comparator-rounded).

    Scale: one (part, month) partial-agg shuffle + a broadcast-sized
    base-month side (|parts| rows); the per-(part,month) frame is
    persisted because base extraction and the index join both read it
    (Catalyst re-executes unpersisted subtrees per reference — the
    rfm_scores lesson)."""
    pm = (
        lineitem.select(
            F.col("l_partkey").alias("part"),
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
            F.col("l_quantity").cast("bigint").alias("_q"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            .alias("_cents"),
        )
        .groupBy("part", "month")
        .agg(F.sum("_q").cast("bigint").alias("qty"),
             F.sum("_cents").cast("bigint").alias("cents"))
        .withColumn("p_micro", F.expr("(cents * 10000) div qty"))
        .persist()
    )
    base_month = pm.agg(F.min("month").alias("_bm"))
    base = (
        pm.join(F.broadcast(base_month), pm["month"] == F.col("_bm"))
        .select(F.col("part"), F.col("qty").alias("q0"),
                F.col("p_micro").alias("p0_micro"))
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    # the base basket is |parts-traded-in-base-month| rows — small at
    # gate SFs but part is a growing dimension, so the join is left
    # unhinted for AQE to pick broadcast vs shuffle by actual size
    out = (
        pm.join(base, "part")
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(dec(F.col("p_micro")) * F.col("q0")).alias("_lnum"),
            F.sum(dec(F.col("p0_micro")) * F.col("q0")).alias("_lden"),
            F.sum(dec(F.col("p_micro")) * F.col("qty")).alias("_pnum"),
            F.sum(dec(F.col("p0_micro")) * F.col("qty")).alias("_pden"),
        )
        .select(
            "month", "n_parts",
            # divide as DOUBLES, not decimals: Spark's decimal/decimal
            # quotient scale rules differ from DuckDB's, while exact-
            # integer → double conversion is correctly rounded in both
            # engines (identical bits even past 2^53)
            F.try_divide(F.col("_lnum").cast("double"),
                         F.col("_lden").cast("double")).alias("laspeyres"),
            F.try_divide(F.col("_pnum").cast("double"),
                         F.col("_pden").cast("double")).alias("paasche"),
        )
        .orderBy("month")
    )
    return out


def ks_two_sample(orders: DataFrame,
                  priority: str = "1-URGENT") -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between the order-value
    distributions of *priority* orders and all others — D = max over
    pooled values of |ECDF₁(v) − ECDF₂(v)|, the standard
    distribution-shift check (does urgency change what people spend?
    the same statistic a drift monitor runs between two corpus
    snapshots). ONE row: (n1, n2, d_stat, at_cents, n_eff) with
    at_cents the value where the gap peaks (smallest such value on
    ties) and n_eff = n1·n2/(n1+n2) the effective sample size
    consumers feed to the KS p-value formula (the asymptotic series
    needs exp(), which is ulp-loose cross-engine — CLAUDE.md — so the
    exact statistic ships and the p-value stays client-side).

    Exactness: values are integer CENTS; both ECDFs are integer
    cumulative counts divided by integer totals — int/int IEEE
    divisions of identical bits, so every gap, the max, and the
    argmax tiebreak are bit-deterministic cross-engine. No rounding
    anywhere.

    Scale shape: ONE partial-aggregated shuffle to (cents, n1_v,
    n2_v) — the curve is value-space-bounded, never row-count-sized —
    then the global cumulative counts come from
    :func:`~pyperustats_spark.operators.layout.histogram_cumsum`
    (per-bucket window + bounded bucket-offset side table), NOT a
    partition-less ordered window: the plan-sweep-rejected global
    sort never appears, and the bucket key ``cents >> 20`` bounds the
    side table by the value domain (~10 MUSD ceiling → < 2¹³
    buckets). The final argmax is a TakeOrdered over the bounded
    curve."""
    from pyperustats_spark.operators.layout import histogram_cumsum

    vals = orders.select(
        F.round(F.round(F.col("o_totalprice"), 2) * 100)
        .cast("bigint").alias("cents"),
        (F.col("o_orderpriority") == priority).cast("int").alias("_f"))
    # persist the value-bounded curve: it is referenced THREE times
    # (twice inside histogram_cumsum — bucket totals + window side —
    # plus the n1/n2 totals) and Catalyst re-runs the orders scan +
    # partial aggregate per reference (the histogram_ntile persist
    # rule). Narrow integer rows bounded by the cents domain; lifetime
    # caveat as perplexity_buckets — bench.py clears per query.
    per_v = vals.groupBy("cents").agg(
        F.sum("_f").cast("bigint").alias("n1_v"),
        F.sum(F.lit(1) - F.col("_f")).cast("bigint").alias("n2_v")) \
        .persist()
    cum = histogram_cumsum(per_v, F.shiftright(F.col("cents"), 20),
                           [F.col("cents")], ["n1_v", "n2_v"])
    tot = per_v.agg(F.sum("n1_v").cast("bigint").alias("n1"),
                    F.sum("n2_v").cast("bigint").alias("n2"))
    d = (cum.crossJoin(F.broadcast(tot))
         .select(
             "cents", "n1", "n2",
             F.when((F.col("n1") > 0) & (F.col("n2") > 0),
                    F.abs(F.col("_cum_n1_v") / F.col("n1")
                          - F.col("_cum_n2_v") / F.col("n2")))
             .alias("dv")))
    out = (d.orderBy(F.desc("dv"), "cents").limit(1)
           .select(
               "n1", "n2",
               F.col("dv").alias("d_stat"),
               F.col("cents").alias("at_cents"),
               F.when((F.col("n1") > 0) & (F.col("n2") > 0),
                      (F.col("n1") * F.col("n2"))
                      / (F.col("n1") + F.col("n2"))).alias("n_eff")))
    return out


def mann_whitney_u(orders: DataFrame,
                   priority: str = "1-URGENT") -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) between urgent
    and non-urgent order values — the rank-based location test that
    complements :func:`ks_two_sample`'s shape test (KS asks "same
    distribution?", U asks "is one stochastically larger?"). ONE row:
    (n1, n2, u_stat, z_score) with the tie-corrected normal
    approximation.

    Exactness — NO double is ever summed (CLAUDE.md): with per-value
    counts (n1_v, t_v) and C_before the exclusive cumulative count of
    smaller values, tied ranks average to C_before + (t_v+1)/2, so

        2·R1 = Σ_v n1_v · (2·C_before + t_v + 1)

    accumulates as DECIMAL(38,0) (exact at any scale; bigint would
    overflow near n ~ 3·10⁶ because the tie term needs n³), and
    2·U1 = 2·R1 − n1(n1+1). The tie-corrected variance is the exact
    rational  n1·n2·((n+1)n(n−1) − Σ(t³−t)) / (12·n(n−1)); numerator
    and denominator are exact DECIMAL integers cast to DOUBLE
    (correctly rounded in both engines even past 2^53 — the
    q_price_index rule), and z = (2U1 − n1·n2) / (2·√var) uses only
    arithmetic and sqrt — the two operations that ARE correctly
    rounded IEEE cross-engine. u_stat ships as DOUBLE(2U1)/2 (an
    exact half-integer grid point). All-tied input → var = 0 →
    z NULL via the same CASE in both engines.

    Scale shape: identical to ks_two_sample — one partial-aggregated
    shuffle to the value-bounded (cents, counts) curve, global
    cumulative counts via histogram_cumsum (no partition-less sort),
    then a one-row DECIMAL aggregate."""
    from pyperustats_spark.operators.layout import histogram_cumsum

    vals = orders.select(
        F.round(F.round(F.col("o_totalprice"), 2) * 100)
        .cast("bigint").alias("cents"),
        (F.col("o_orderpriority") == priority).cast("int").alias("_f"))
    # persisted: histogram_cumsum references the curve twice (bucket
    # totals + window side) — unpersisted, the orders scan + partial
    # aggregate run once per reference (the histogram_ntile persist
    # rule). Value-bounded narrow integers; bench clears per query.
    per_v = vals.groupBy("cents").agg(
        F.sum("_f").cast("bigint").alias("n1_v"),
        F.count(F.lit(1)).cast("bigint").alias("t_v")).persist()
    cum = histogram_cumsum(per_v, F.shiftright(F.col("cents"), 20),
                           [F.col("cents")], ["t_v"])

    def dec(c):
        return c.cast("decimal(38,0)")

    agg = cum.agg(
        F.sum(dec(F.col("n1_v"))).alias("_n1"),
        F.sum(dec(F.col("t_v"))).alias("_n"),
        F.sum(dec(F.col("n1_v"))
              * (2 * (F.col("_cum_t_v") - F.col("t_v"))
                 + F.col("t_v") + 1)).alias("_r1x2"),
        F.sum(dec(F.col("t_v")) * F.col("t_v") * F.col("t_v")
              - F.col("t_v")).alias("_sum_t3_t"),
    )
    n1 = F.col("_n1")
    n2 = F.col("_n") - n1
    u1x2 = F.col("_r1x2") - n1 * (n1 + 1)
    var_num = (n1 * n2
               * ((F.col("_n") + 1) * F.col("_n") * (F.col("_n") - 1)
                  - F.col("_sum_t3_t"))).cast("double")
    var_den = (F.lit(12) * F.col("_n")
               * (F.col("_n") - 1)).cast("double")
    var = var_num / var_den
    out = agg.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        (u1x2.cast("double") / F.lit(2.0)).alias("u_stat"),
        F.when((n1 > 0) & (n2 > 0) & (var_num > 0),
               (u1x2.cast("double") - (n1 * n2).cast("double"))
               / (F.lit(2.0) * F.sqrt(var))).alias("z_score"),
    )
    return out


def chi2_independence(orders: DataFrame) -> DataFrame:
    """Pearson chi-square test of independence between order PRIORITY
    and order STATUS — the contingency-table member of the stats-test
    trio (:func:`ks_two_sample` tests shape, :func:`mann_whitney_u`
    location, this tests association between two categoricals). ONE
    row: (n, n_rows, n_cols, dof, chi2).

    Exactness — the whole statistic is exact integer rationals: with
    observed O, row total r, column total c and grand total N, each
    cell's term is

        (O·N − r·c)² / (N·r·c)

    where numerator and denominator are exact DECIMAL(38,0)/HUGEINT
    integers ((O·N − r·c)² ≤ N⁴ overflows bigint near N ~ 55k, so
    decimals are load-bearing, not defensive). Each term is one
    DOUBLE(int)/DOUBLE(int) division — bit-identical cross-engine —
    and the sum over the CELL-BOUNDED frame (|priorities|×|statuses|
    rows, never data-sized) is an ORDERED cumulative window, so both
    engines accumulate identical bits in the same order. Shipped raw.

    Scale shape: one partial-aggregated shuffle to the contingency
    cells; row/column/grand totals are window sums over the bounded
    cell frame; the ordered final sum runs on ≤ |R×C| rows."""
    cells = (orders.groupBy("o_orderpriority", "o_orderstatus")
             .agg(F.count(F.lit(1)).cast("bigint").alias("o")))
    wr = Window.partitionBy("o_orderpriority")
    wc = Window.partitionBy("o_orderstatus")
    wn = Window.partitionBy()

    def dec(c):
        return c.cast("decimal(38,0)")

    t = cells.select(
        "o_orderpriority", "o_orderstatus", "o",
        F.sum("o").over(wr).cast("bigint").alias("r"),
        F.sum("o").over(wc).cast("bigint").alias("c"),
        F.sum("o").over(wn).cast("bigint").alias("n"),
        F.size(F.collect_set("o_orderpriority").over(wn))
        .cast("bigint").alias("n_rows"),
        F.size(F.collect_set("o_orderstatus").over(wn))
        .cast("bigint").alias("n_cols"),
    )
    diff = dec(F.col("o")) * F.col("n") - dec(F.col("r")) * F.col("c")
    term = ((diff * diff).cast("double")
            / (dec(F.col("n")) * F.col("r") * F.col("c"))
            .cast("double"))
    wcum = Window.orderBy("o_orderpriority", "o_orderstatus") \
        .rowsBetween(Window.unboundedPreceding, 0)
    out = (t.select(
               "o_orderpriority", "o_orderstatus", "n", "n_rows",
               "n_cols", F.sum(term).over(wcum).alias("_chi2"))
           .orderBy(F.desc("o_orderpriority"), F.desc("o_orderstatus"))
           .limit(1)
           .select(
               "n", "n_rows", "n_cols",
               ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
               .cast("bigint").alias("dof"),
               F.col("_chi2").alias("chi2")))
    return out


def abc_classification(lineitem: DataFrame, a_cut: float = 0.8,
                       b_cut: float = 0.95,
                       sort: bool = True) -> DataFrame:
    """ABC / Pareto inventory classification of parts by revenue:
    rank parts by exact revenue cents descending, take the global
    running revenue share, and label A (first *a_cut* of revenue),
    B (to *b_cut*), C (tail) — the classic "20 % of SKUs carry 80 %
    of revenue" cut that drives stocking policy. Returns
    (part, revenue_cents, cum_share, abc_class) in rank order;
    cum_share is a raw bigint/bigint divide (bit-identical
    cross-engine, so the class boundaries are deterministic).

    Scale shape: the global descending-revenue running sum comes from
    :func:`~pyperustats_spark.operators.layout.histogram_cumsum` on
    NEGATED cents (value buckets + per-bucket windows + a bounded
    offset table — no partition-less data-sized sort window, the
    revenue_lorenz/gini machinery); the per-part aggregate is
    persisted because the histogram core references it twice (the
    histogram_ntile persist rule); the 1-row grand total broadcasts
    (q_market_share class)."""
    from pyperustats_spark.operators.layout import (
        _bounds, _bucket, histogram_cumsum)

    cents = (
        lineitem.groupBy(F.col("l_partkey").alias("part"))
        .agg(F.round(F.round(F.sum("l_extendedprice"), 2) * 100)
             .cast("bigint").alias("_c"))
        .withColumn("_nc", -F.col("_c"))
        .persist()
    )
    b = cents.crossJoin(F.broadcast(_bounds(cents, ["_nc"])))
    cum = histogram_cumsum(
        b, _bucket(F.col("_nc"), F.col("_lo__nc"), F.col("_hi__nc"), 12),
        order=[F.col("_nc"), F.col("part")], cols=["_c"])
    total = cents.agg(F.sum("_c").cast("bigint").alias("_total"))
    share = F.try_divide(F.col("_cum__c"), F.col("_total"))
    out = (
        cum.crossJoin(F.broadcast(total))
        .select(
            "part", F.col("_c").alias("revenue_cents"),
            share.alias("cum_share"),
            F.when(share <= a_cut, "A")
            .when(share <= b_cut, "B")
            .otherwise("C").alias("abc_class"),
        )
    )
    return out.orderBy(F.desc("revenue_cents"), "part") if sort else out


def anova_oneway(orders: DataFrame,
                 group_col: str = "o_orderpriority") -> DataFrame:
    """One-way ANOVA F across *group_col* on order-value cents — the
    parametric member of the distribution-comparison suite
    (:func:`ks_two_sample` distribution shape, :func:`mann_whitney_u`
    rank shift, chi-square independence): does mean spend differ
    across groups? ONE row: (k_groups, n_total, df1, df2, ss_between,
    ss_within, f_stat, eta_sq). The p-value (incomplete beta) stays
    client-side, same policy as the rest of the suite.

    Determinism recipe: per-group n, Σx, Σx² are exact integers
    (cents in bigint, squares in DECIMAL(38,0)/HUGEINT); each
    between-group term S_g²/n_g is a fixed tree of correctly rounded
    double ops on exactly-converted integers, and the k terms sum
    through an ORDERED cumulative window over the group key (both
    engines accumulate in the same order → identical bits — the
    CLAUDE.md ordered-cumsum rule; a plain 5-row groupBy sum of
    doubles would be merge-order-flaky). The last cum row is read
    with a map-side max(struct(group, cum)) — no second pass.

    Scale shape: one partial-aggregated shuffle to k group rows; the
    partition-less cum window runs over k rows (a bounded priority
    dimension — audited SINGLE_PART class), then one 1-row final
    aggregate."""
    cents = F.round(F.round(F.col("o_totalprice"), 2) * 100) \
        .cast("bigint")
    per = orders.select(F.col(group_col).alias("_g"),
                        cents.alias("_c")) \
        .groupBy("_g").agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_c").cast("bigint").alias("_s"),
            F.sum(F.col("_c").cast("decimal(38,0)") * F.col("_c"))
            .alias("_q"))
    term = (F.col("_s").cast("double") * F.col("_s").cast("double")
            / F.col("_n").cast("double"))
    wc = Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select("_g", "_n", "_s", "_q",
                     F.sum(term).over(wc).alias("_cum"))
    agg = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("_n").cast("bigint").alias("n_total"),
        F.sum("_s").cast("bigint").alias("_stot"),
        F.sum("_q").alias("_qtot"),
        F.max(F.struct("_g", "_cum")).alias("_last"))
    ssb = (F.col("_last._cum")
           - F.col("_stot").cast("double") * F.col("_stot").cast("double")
           / F.col("n_total").cast("double"))
    ssw = F.col("_qtot").cast("double") - F.col("_last._cum")
    out = agg.select(
        "k_groups", "n_total",
        (F.col("k_groups") - 1).cast("bigint").alias("df1"),
        (F.col("n_total") - F.col("k_groups")).cast("bigint")
        .alias("df2"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.try_divide(
            F.try_divide(ssb, (F.col("k_groups") - 1).cast("double")),
            F.try_divide(ssw, (F.col("n_total") - F.col("k_groups"))
                         .cast("double"))).alias("f_stat"),
        F.try_divide(ssb, ssb + ssw).alias("eta_sq"),
    )
    return out


def welch_ttest(orders: DataFrame,
                priority: str = "1-URGENT") -> DataFrame:
    """Welch's unequal-variance t-test between urgent and non-urgent
    order values — the parametric two-sample member of the
    distribution-comparison suite (:func:`ks_two_sample` shape,
    :func:`mann_whitney_u` rank shift, :func:`anova_oneway` k-group
    means): does MEAN spend differ between the two arms when the
    variances are allowed to differ? ONE row: (n1, n2, mean1_cents,
    mean2_cents, t_stat, df_welch). The p-value (Student-t CDF needs
    the incomplete beta) stays client-side, same policy as the rest
    of the suite.

    Determinism recipe: per-arm n, Σx, Σx² are exact integers (cents
    in bigint, squares in DECIMAL(38,0)/HUGEINT); every downstream
    quantity is ONE fixed tree of correctly rounded double ops on
    exactly-converted integers — mean = S/n, s² = (Q − S·S/n)/(n−1),
    se = s₁²/n₁ + s₂²/n₂, t = (m₁−m₂)/√se, and the Welch–
    Satterthwaite df = se²/((s₁²/n₁)²/(n₁−1) + (s₂²/n₂)²/(n₂−1)).
    Only +,−,×,÷,√ appear — the operations that ARE correctly
    rounded IEEE cross-engine (CLAUDE.md) — so Spark and the DuckDB
    oracle agree bit-for-bit. The double form of s² (rather than the
    exact DECIMAL nQ−S²) is deliberate: nQ overflows DECIMAL(38,0)
    near n ~ 10¹², while the double tree has no scale ceiling, and
    cents have (σ/μ)² ≫ ulp so the Q − S²/n subtraction is far from
    catastrophic cancellation. Degenerate arms (n ≤ 1 or zero
    variance in both) yield NULL t/df via the same guards in both
    engines.

    Scale shape: ONE conditional-aggregate pass over orders →
    literally one row; no joins, no windows, no value-space blowup.
    The cheapest member of the suite at any scale."""
    cents = F.round(F.round(F.col("o_totalprice"), 2) * 100) \
        .cast("bigint")
    flag = (F.col("o_orderpriority") == priority).cast("int")
    src = orders.select(cents.alias("_c"), flag.alias("_f"))

    def dec(c):
        return c.cast("decimal(38,0)")

    agg = src.agg(
        F.sum("_f").cast("bigint").alias("n1"),
        F.sum(F.lit(1) - F.col("_f")).cast("bigint").alias("n2"),
        F.sum(F.col("_f") * F.col("_c")).cast("bigint").alias("_s1"),
        F.sum((F.lit(1) - F.col("_f")) * F.col("_c")).cast("bigint")
        .alias("_s2"),
        F.sum(dec(F.col("_f") * F.col("_c")) * F.col("_c"))
        .alias("_q1"),
        F.sum(dec((F.lit(1) - F.col("_f")) * F.col("_c"))
              * F.col("_c")).alias("_q2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("_s1").cast("double") / n1d
    m2 = F.col("_s2").cast("double") / n2d
    v1 = (F.col("_q1").cast("double")
          - F.col("_s1").cast("double") * F.col("_s1").cast("double")
          / n1d) / (F.col("n1") - 1).cast("double")
    v2 = (F.col("_q2").cast("double")
          - F.col("_s2").cast("double") * F.col("_s2").cast("double")
          / n2d) / (F.col("n2") - 1).cast("double")
    se1 = v1 / n1d
    se2 = v2 / n2d
    se = se1 + se2
    ok = (F.col("n1") > 1) & (F.col("n2") > 1)
    out = agg.select(
        "n1", "n2",
        F.when(F.col("n1") > 0, m1).alias("mean1_cents"),
        F.when(F.col("n2") > 0, m2).alias("mean2_cents"),
        F.when(ok & (se > 0),
               (m1 - m2) / F.sqrt(se)).alias("t_stat"),
        F.when(ok & (se > 0),
               se * se / (se1 * se1 / (F.col("n1") - 1).cast("double")
                          + se2 * se2
                          / (F.col("n2") - 1).cast("double")))
        .alias("df_welch"),
    )
    return out


def kruskal_wallis(orders: DataFrame,
                   group_col: str = "o_orderpriority") -> DataFrame:
    """Kruskal–Wallis H across *group_col* on order-value cents — the
    k-sample generalization of :func:`mann_whitney_u` and the
    rank-based (distribution-free) complement of
    :func:`anova_oneway`: do the k groups share a location, without
    assuming normality? ONE row: (k_groups, n_total, h_stat,
    h_tie_corrected, df). Chi-square p-value stays client-side, same
    policy as the whole stats suite.

    Exactness — NO double is ever summed across an unbounded key set
    (CLAUDE.md): with per-(group, value) counts n_gv, per-value
    totals t_v and C_before the exclusive global cumulative count,
    tied ranks average to C_before + (t_v+1)/2, so TWICE the group
    rank sum

        R2_g = Σ_v n_gv · (2·C_before(v) + t_v + 1)

    accumulates exactly in DECIMAL(38,0). Each group term
    R2_g²/n_g is then a fixed correctly-rounded double tree, and the
    k terms sum through an ORDERED cumulative window over the group
    key (bounded k, both engines accumulate in the same order — the
    anova_oneway idiom). Since R_g = R2_g/2,
    Σ R_g²/n_g = (Σ R2_g²/n_g)/4 and

        H = 3·T/(N(N+1)) − 3·(N+1),  T = Σ_g R2_g²/n_g,

    a pure arithmetic tree. The tie correction divides by
    1 − Σ(t³−t)/(N³−N) with both sides exact DECIMAL integers cast
    to double (correctly rounded past 2^53 — the q_price_index
    rule). All-tied input → correction 0 → NULL via the same CASE.

    Scale shape: one partial-aggregated shuffle to the value-bounded
    (group, cents) grid plus the (cents) curve; global cumulative
    counts via :func:`~pyperustats_spark.operators.layout.
    histogram_cumsum` (per-bucket window + bounded bucket-offset
    side table — no partition-less sort); then a k-row window and a
    1-row aggregate. Value-space-bounded throughout, never
    row-count-sized."""
    from pyperustats_spark.operators.layout import histogram_cumsum

    cents = F.round(F.round(F.col("o_totalprice"), 2) * 100) \
        .cast("bigint")
    src = orders.select(F.col(group_col).alias("_g"),
                        cents.alias("_c"))
    # both grids persisted (the histogram_ntile persist rule): per_gv
    # feeds per_v AND the rank join; per_v is referenced twice inside
    # histogram_cumsum (bucket totals + window side) and once by the
    # tie sum below. Unpersisted, the orders scan + (group, value)
    # aggregate executed FIVE times (measured 2.4 s → 1.0 s at sf0.1,
    # plan 10 parquet scans → 1). Value-bounded narrow integer rows;
    # lifetime caveat as perplexity_buckets — bench clears per query.
    per_gv = src.groupBy("_g", "_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_gv")).persist()
    per_v = per_gv.groupBy("_c").agg(
        F.sum("_n_gv").cast("bigint").alias("_t_v")).persist()
    cum = histogram_cumsum(per_v, F.shiftright(F.col("_c"), 20),
                           [F.col("_c")], ["_t_v"])

    def dec(c):
        return c.cast("decimal(38,0)")

    # rank2 = 2*C_before + t_v + 1  (twice the average tied rank)
    joined = per_gv.join(cum, "_c")
    per_g = joined.groupBy("_g").agg(
        F.sum("_n_gv").cast("bigint").alias("_n_g"),
        F.sum(dec(F.col("_n_gv"))
              * (2 * (F.col("_cum__t_v") - F.col("_t_v"))
                 + F.col("_t_v") + 1)).alias("_r2_g"))
    term = (F.col("_r2_g").cast("double")
            * F.col("_r2_g").cast("double")
            / F.col("_n_g").cast("double"))
    wc = Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, 0)
    cumg = per_g.select("_g", "_n_g", "_r2_g",
                        F.sum(term).over(wc).alias("_cum_t"))
    # tie sum needs only per-value totals — aggregate the cached grid
    # directly instead of referencing `cum` a second time (that
    # reference re-ran the whole cumsum window + offset join)
    ties = per_v.agg(
        F.sum(dec(F.col("_t_v")) * F.col("_t_v") * F.col("_t_v")
              - F.col("_t_v")).alias("_sum_t3_t"))
    agg = cumg.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("_n_g").cast("bigint").alias("n_total"),
        F.max(F.struct("_g", "_cum_t")).alias("_last"),
    ).crossJoin(F.broadcast(ties))
    nd = F.col("n_total").cast("double")
    t_sum = F.col("_last._cum_t")
    h = (F.lit(3.0) * t_sum
         / (nd * (F.col("n_total") + 1).cast("double"))
         - F.lit(3.0) * (F.col("n_total") + 1).cast("double"))
    corr = (F.lit(1.0)
            - F.col("_sum_t3_t").cast("double")
            / (dec(F.col("n_total")) * F.col("n_total")
               * F.col("n_total") - F.col("n_total")).cast("double"))
    ok = (F.col("k_groups") > 1) & (F.col("n_total") > 2)
    out = agg.select(
        "k_groups", "n_total",
        F.when(ok, h).alias("h_stat"),
        F.when(ok & (corr > 0), h / corr).alias("h_tie_corrected"),
        (F.col("k_groups") - 1).cast("bigint").alias("df"),
    )
    return out


def brown_forsythe(orders: DataFrame,
                   group_col: str = "o_orderpriority") -> DataFrame:
    """Brown–Forsythe variance-homogeneity test across *group_col* on
    order-value cents — the robust Levene variant: one-way ANOVA on
    z = |x − median(group)|. The missing assumption check for
    :func:`anova_oneway` (whose F presumes equal variances) and the
    spread-shift complement of :func:`kruskal_wallis`'s location
    test. ONE row: (k_groups, n_total, df1, df2, f_stat). F(df1,df2)
    p-value stays client-side, suite policy.

    Exactness: group medians come from the VALUE-BOUNDED cents curve
    — per-(group, cents) counts with a per-group cumulative window
    over the value domain (never row-count-sized), lo/hi = the
    values where the cumulative count crosses ⌈n/2⌉ and ⌊n/2⌋+1, so
    TWICE the median (lo+hi) is an exact integer and
    z₂ = |2x − 2·med| is exact integer HALF-cents. The ANOVA on z₂
    then reuses the anova_oneway recipe verbatim (integer (n, Σz₂,
    Σz₂²) per group, S²/n terms as fixed correctly-rounded double
    trees through an ORDERED k-row cum window) — and F is invariant
    under the ×2 scaling, so half-cents change nothing.

    Scale shape: one partial-aggregated shuffle to the (group,
    cents) curve, a value-bounded per-group window, a k-row
    median table BROADCAST back onto the rows, one more
    partial-aggregated pass to k group rows, a k-row window, one
    1-row aggregate."""
    cents = F.round(F.round(F.col("o_totalprice"), 2) * 100) \
        .cast("bigint")
    src = orders.select(F.col(group_col).alias("_g"),
                        cents.alias("_c"))
    curve = src.groupBy("_g", "_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("_t"))
    wv = Window.partitionBy("_g").orderBy("_c") \
        .rowsBetween(Window.unboundedPreceding, 0)
    # n per group rides the SAME value-bounded partitioning as the
    # cumsum window (no second reference to curve -> no re-executed
    # aggregate; the frame is the value curve, never row-sized)
    wg = Window.partitionBy("_g")
    cum = curve.select("_g", "_c", "_t",
                       F.sum("_t").over(wv).alias("_cum"),
                       F.sum("_t").over(wg).cast("bigint").alias("_n"))
    med = (
        cum
        .groupBy("_g")
        .agg(
            F.min(F.when(
                F.col("_cum") >= F.expr("(_n + 1) div 2"),
                F.col("_c"))).alias("_lo"),
            F.min(F.when(
                F.col("_cum") >= F.expr("_n div 2 + 1"),
                F.col("_c"))).alias("_hi"),
        )
        .select("_g", (F.col("_lo") + F.col("_hi")).alias("_m2"))
    )
    z = src.join(F.broadcast(med), "_g").select(
        "_g", F.abs(2 * F.col("_c") - F.col("_m2")).alias("_z"))

    def dec(c):
        return c.cast("decimal(38,0)")

    per = z.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_z").cast("bigint").alias("_s"),
        F.sum(dec(F.col("_z")) * F.col("_z")).alias("_q"))
    term = (F.col("_s").cast("double") * F.col("_s").cast("double")
            / F.col("_n").cast("double"))
    wc = Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, 0)
    cumg = per.select("_g", "_n", "_s", "_q",
                      F.sum(term).over(wc).alias("_cumt"))
    agg = cumg.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("_n").cast("bigint").alias("n_total"),
        F.sum("_s").cast("bigint").alias("_stot"),
        F.sum("_q").alias("_qtot"),
        F.max(F.struct("_g", "_cumt")).alias("_last"))
    ssb = (F.col("_last._cumt")
           - F.col("_stot").cast("double") * F.col("_stot").cast("double")
           / F.col("n_total").cast("double"))
    ssw = F.col("_qtot").cast("double") - F.col("_last._cumt")
    out = agg.select(
        "k_groups", "n_total",
        (F.col("k_groups") - 1).cast("bigint").alias("df1"),
        (F.col("n_total") - F.col("k_groups")).cast("bigint")
        .alias("df2"),
        F.try_divide(
            F.try_divide(ssb, (F.col("k_groups") - 1).cast("double")),
            F.try_divide(ssw, (F.col("n_total") - F.col("k_groups"))
                         .cast("double"))).alias("f_stat"),
    )
    return out


def friedman_test(orders: DataFrame,
                  group_col: str = "o_orderpriority") -> DataFrame:
    """Friedman rank test across *group_col* treatments BLOCKED by
    order year — the repeated-measures member of the nonparametric
    suite (:func:`mann_whitney_u` two-sample, :func:`kruskal_wallis`
    k-sample independent, Friedman k-sample blocked): do priorities
    keep the same revenue ORDER year after year, or does the ranking
    shuffle? Each (year, priority) cell is total order cents;
    treatments are ranked WITHIN each year and

        chi2_F = 3/(n·k(k+1)) · Σ_t R2_t² − 3·n·(k+1)

    with R2_t twice the rank sum (ties carry half-ranks, so doubling
    keeps every rank an exact integer: r2 = 2·rank() + cnt_eq − 1,
    the counting identity). ONE row: (n_blocks, k_treatments, df,
    chi2_f). Chi-square p-value client-side, suite policy.

    Exactness: cell sums are exact bigint cents; ranks come from
    rank() + a same-block equality count (two bounded windows over
    k-row blocks — value ties across ~10⁷-cent sums are possible in
    principle and handled exactly); R2 sums and Σ R2² accumulate in
    DECIMAL(38,0); the final statistic is one fixed
    correctly-rounded double tree. Blocks missing a treatment make
    the design unbalanced — those blocks are DROPPED (complete-block
    requirement, both engines; n_blocks reports the kept count).

    Scale shape: one partial-aggregated shuffle to the (year,
    priority) grid — a bounded dimension product — then k-row
    windows and a 1-row aggregate. Nothing row-count-sized."""
    cents = F.round(F.round(F.col("o_totalprice"), 2) * 100) \
        .cast("bigint")
    cells = orders.select(
        F.year("o_orderdate").cast("bigint").alias("_b"),
        F.col(group_col).alias("_t"), cents.alias("_c")) \
        .groupBy("_b", "_t") \
        .agg(F.sum("_c").cast("bigint").alias("_x"))
    wb = Window.partitionBy("_b")
    wrank = wb.orderBy("_x")
    weq = Window.partitionBy("_b", "_x")
    ranked = cells.select(
        "_b", "_t",
        (2 * F.rank().over(wrank)
         + F.count(F.lit(1)).over(weq) - 1).cast("bigint").alias("_r2"),
        F.count(F.lit(1)).over(wb).cast("bigint").alias("_kb"))
    # complete blocks only: every treatment present in the year.
    # k = the global max block width (a block can never exceed the
    # treatment count, and any complete block reaches it) — read via
    # a partition-less window over the BOUNDED (year x priority)
    # grid so `cells` is referenced exactly once (no re-executed
    # aggregate, the anova SINGLE_PART class).
    full = ranked.withColumn(
        "_k", F.max("_kb").over(Window.partitionBy())) \
        .where(F.col("_kb") == F.col("_k"))

    def dec(c):
        return c.cast("decimal(38,0)")

    per_t = full.groupBy("_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(dec(F.col("_r2"))).alias("_r2s"),
        F.max("_k").alias("_k"))
    agg = per_t.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_treatments"),
        F.max("_n").cast("bigint").alias("n_blocks"),
        F.sum(dec(F.col("_r2s")) * F.col("_r2s")).alias("_sr2sq"),
    )
    n = F.col("n_blocks").cast("double")
    k = F.col("k_treatments").cast("double")
    chi2 = (F.lit(3.0) * F.col("_sr2sq").cast("double")
            / (n * k * (k + F.lit(1.0)))
            - F.lit(3.0) * n * (k + F.lit(1.0)))
    ok = (F.col("k_treatments") > 1) & (F.col("n_blocks") > 1)
    out = agg.select(
        "n_blocks", "k_treatments",
        (F.col("k_treatments") - 1).cast("bigint").alias("df"),
        F.when(ok, chi2).alias("chi2_f"),
    )
    return out


def repeat_purchase_pairs(lineitem: DataFrame, orders: DataFrame,
                          max_gap_days: int = 365,
                          sort: bool = True) -> DataFrame:
    """Repeat-purchase audit: adjacent orders where the SAME customer
    re-orders the SAME part within *max_gap_days* — the repurchase-
    cycle screen feeding replenishment-lag models (and the
    double-submission flag when the gap is days, not months). One row
    per adjacent pair: (custkey, partkey, first_order, second_order,
    gap_days, first_date, second_date).

    Adjacency is per (customer, part) in (date, orderkey) order, so a
    chain of m repurchases emits m−1 pairs, never O(m²); the window
    groups are per-(customer, part) multiplicity — bounded by one
    customer's own appetite for one part, naturally tiny at any
    corpus scale. The lineitem→orders join is the q3-class keyed
    shuffle (AQE-decided); (custkey, partkey, date, orderkey) is
    DISTINCT first so multi-lineitem orders contribute one row.

    Exactness: keys, dates, datediff — all integers; no doubles."""
    items = lineitem.select(
        F.col("l_orderkey").alias("_ok"),
        F.col("l_partkey").cast("bigint").alias("partkey")).distinct()
    base = items.join(
        orders.select(F.col("o_orderkey").alias("_ok"),
                      F.col("o_custkey").cast("bigint").alias("custkey"),
                      F.col("o_orderdate").alias("_d")),
        "_ok") \
        .select("custkey", "partkey", "_d",
                F.col("_ok").cast("bigint").alias("_k"))
    w = Window.partitionBy("custkey", "partkey").orderBy("_d", "_k")
    lagged = base.select(
        "custkey", "partkey",
        F.lag("_k").over(w).alias("first_order"),
        F.col("_k").alias("second_order"),
        F.lag("_d").over(w).alias("first_date"),
        F.col("_d").alias("second_date"))
    out = lagged.where(
        F.col("first_order").isNotNull()
        & (F.datediff(F.col("second_date"), F.col("first_date"))
           <= max_gap_days)) \
        .select(
            "custkey", "partkey", "first_order", "second_order",
            F.datediff(F.col("second_date"), F.col("first_date"))
            .cast("bigint").alias("gap_days"),
            F.col("first_date").cast("date").alias("first_date"),
            F.col("second_date").cast("date").alias("second_date"))
    return out.orderBy("custkey", "partkey", "second_order") if sort \
        else out


def fulfillment_lag_profile(lineitem: DataFrame, orders: DataFrame,
                            slow_days: int = 90,
                            sort: bool = True) -> DataFrame:
    """Fulfillment-SLA card per order priority: how long after the
    order date do line items actually ship? lag = shipdate −
    orderdate in days. Per priority: item volume, slow share
    (> *slow_days*), mean lag, and the EXACT median lag — q4's
    one-flag counter generalized into the distribution summary an
    operations review reads.

    Exactness: lags are integer days; slow_share and mean are
    int/int IEEE divisions; the median comes from the value-bounded
    lag curve (lags span ~0–120 days) with the brown_forsythe lo/hi
    crossing rule — (lo+hi)/2.0 exact on the half-integer grid. No
    doubles are summed anywhere.

    Scale shape: the lineitem→orders join is the q3-class keyed
    shuffle (AQE-decided); then one partial-aggregated pass to the
    (priority, lag) curve (bounded by the lag domain), a per-priority
    cumsum + same-partitioning total window in a single pass, and a
    k-row rollup. The row-level stats aggregate shares the joined
    frame via a second reference to the SAME small curve — both
    aggregates derive from the curve, so the join runs once."""
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) \
        .cast("bigint")
    src = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select(F.col("o_orderkey").alias("l_orderkey"),
                      "o_orderdate", "o_orderpriority"),
        "l_orderkey") \
        .select(F.col("o_orderpriority").alias("priority"),
                lag.alias("_d"))
    curve = src.groupBy("priority", "_d").agg(
        F.count(F.lit(1)).cast("bigint").alias("_t"))
    wv = Window.partitionBy("priority").orderBy("_d") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wg = Window.partitionBy("priority")
    cum = curve.select(
        "priority", "_d", "_t",
        F.sum("_t").over(wv).alias("_cum"),
        F.sum("_t").over(wg).cast("bigint").alias("_n"))
    # stats AND median both come off the value-bounded curve — the
    # expensive join + aggregate runs exactly once upstream of it
    out = cum.groupBy("priority").agg(
        F.max("_n").alias("n_items"),
        F.sum(F.when(F.col("_d") > slow_days, F.col("_t"))
              .otherwise(F.lit(0))).cast("bigint").alias("slow_n"),
        F.sum(F.col("_t") * F.col("_d")).cast("bigint").alias("_sd"),
        F.min(F.when(F.col("_cum") >= F.expr("(_n + 1) div 2"),
                     F.col("_d"))).alias("_lo"),
        F.min(F.when(F.col("_cum") >= F.expr("_n div 2 + 1"),
                     F.col("_d"))).alias("_hi"),
    ).select(
        "priority", "n_items", "slow_n",
        (F.col("slow_n") / F.col("n_items")).alias("slow_share"),
        (F.col("_sd") / F.col("n_items")).alias("mean_lag_days"),
        ((F.col("_lo") + F.col("_hi")).cast("double") / F.lit(2.0))
        .alias("median_lag_days"),
    )
    return out.orderBy("priority") if sort else out


def price_elasticity(lineitem: DataFrame, part: DataFrame,
                     group_col: str = "p_brand",
                     sort: bool = True) -> DataFrame:
    """Log–log demand-curve card per *group_col*: regress
    ln(quantity) on ln(retail price) across line items — the OLS
    slope IS the price elasticity of demand for the group (−0.8:
    inelastic staple; −3: luxury), with r² saying whether a constant-
    elasticity model fits at all. The econometric reading of the q9
    join family. One row per group: (group, n_items, elasticity,
    r2).

    Cross-engine determinism: price cents and quantities are exact
    integers, so both regression inputs are ln-of-integer values
    snapped to the 1e-6 grid AS INTEGERS (x = micro-ln price,
    y = micro-ln qty); all five moment sums (Σx, Σy, Σxy, Σx², Σy²)
    accumulate exactly in DECIMAL(38,0), and the slope/r² trees run
    on DOUBLE-CAST-FIRST sums (the logrank rule: cross-products of
    sums would overflow 38 digits near n ~ 10¹²; int→double is
    correctly rounded). The micro-ln grid cancels in the slope's
    units: micro/micro = nats per nat. Degenerate groups (constant
    price) → NULL via the same zero-denominator CASE.

    Scale shape: one q9-class keyed join (part side is partkey-
    bounded — AQE broadcasts when it fits), one partial-aggregated
    pass to k group rows, no windows."""
    price_cents = F.round(F.round(F.col("p_retailprice"), 2) * 100) \
        .cast("bigint")
    joined = lineitem.select(
        F.col("l_partkey").alias("_pk"),
        F.col("l_quantity").cast("bigint").alias("_q")) \
        .join(part.select(F.col("p_partkey").alias("_pk"),
                          F.col(group_col).alias("_g"),
                          price_cents.alias("_pc")), "_pk")
    x = F.round(F.log(F.col("_pc").cast("double")) * 1e6) \
        .cast("bigint")
    y = F.round(F.log(F.col("_q").cast("double")) * 1e6) \
        .cast("bigint")
    base = joined.select("_g", x.alias("_x"), y.alias("_y"))

    def dec(c):
        return c.cast("decimal(38,0)")

    per = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_x")) * F.col("_y")).alias("_sxy"),
        F.sum(dec(F.col("_x")) * F.col("_x")).alias("_sxx"),
        F.sum(dec(F.col("_y")) * F.col("_y")).alias("_syy"),
    )
    nd = F.col("n_items").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    cov = nd * sxy - sx * sy
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    out = per.select(
        F.col("_g").alias(group_col), "n_items",
        F.when(vx != 0, cov / vx).alias("elasticity"),
        F.when((vx != 0) & (vy != 0),
               cov * cov / (vx * vy)).alias("r2"),
    )
    return out.orderBy(group_col) if sort else out


def basket_rules(lineitem: DataFrame, max_basket: int = 50,
                 min_both: int = 2, k: int = 50,
                 sort: bool = True) -> DataFrame:
    """Directional association rules over order baskets — the
    support / confidence / lift triple (Agrawal–Imieliński–Swami,
    SIGMOD '93) that :func:`part_affinity`'s symmetric Jaccard view
    deliberately isn't: confidence(A→B) = P(B|A) ranks what to
    RECOMMEND given A in the basket, lift > 1 says the pair beats
    independence. Top-*k* rules by lift (ties broken on the part
    ids), both directions emitted. Columns: (antecedent, consequent,
    n_both, support, confidence, lift).

    Exactness: all counts are integers off the SAME capped basket
    set (numerators match denominators by construction); support and
    confidence are int/int IEEE divisions; lift = (N·n_both)/(n_a·n_b)
    divides two exact DECIMAL products cast to double — every output
    and the lift ORDERING are bit-identical cross-engine (identical
    double bits order identically). *min_both* prunes noise pairs
    before ranking in both engines.

    Scale shape: the part_affinity inverted-index idiom verbatim
    (one-shuffle collect_set basket gather → chained-explode pairs,
    never a self-join), per-part counts from the same item set, a
    1-row basket total broadcast (audited q_market_share class), and
    one top-k window over the pruned pair set."""
    # bounded-parallelism repartition on the persisted frame: a plain
    # session leaves every downstream explode/groupBy at
    # spark.sql.shuffle.partitions (200) of tiny tasks off a cached
    # frame (the copurchase_triangle_stats rule; measured there
    # 54s -> 21s at sf0.01 driver posture)
    par = lineitem.sparkSession.sparkContext.defaultParallelism
    baskets = (
        lineitem.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .where((F.size("parts") >= 2) & (F.size("parts") <= max_basket))
        .select("l_orderkey", F.array_sort("parts").alias("parts"))
        .repartition(par)
    ).persist()
    nb = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("_nb"))
    it = baskets.select("l_orderkey", F.explode("parts").alias("pk"))
    pairs = (
        baskets.select(F.explode("parts").alias("pa"), F.col("parts"))
        .select("pa", F.explode("parts").alias("pb"))
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .where(F.col("n_both") >= min_both)
    )
    pc = it.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    both = (
        pairs.join(pc.select(F.col("pk").alias("pa"),
                             F.col("n").alias("_na")), "pa")
        .join(pc.select(F.col("pk").alias("pb"),
                        F.col("n").alias("_nb2")), "pb")
    )
    # emit both directions (A->B and B->A share n_both and lift) from
    # ONE pass: a union references `both` twice and Catalyst re-executes
    # the whole pair aggregation + joins per branch (measured at 100x:
    # the tail doubled from ~12 s to 24 s) — explode a 2-struct array
    # instead, same multiset of rows, upstream runs once
    directional = both.select(F.explode(F.array(
        F.struct(F.col("pa").alias("antecedent"),
                 F.col("pb").alias("consequent"),
                 F.col("n_both").alias("n_both"),
                 F.col("_na").alias("n_ant"),
                 F.col("_nb2").alias("n_con")),
        F.struct(F.col("pb").alias("antecedent"),
                 F.col("pa").alias("consequent"),
                 F.col("n_both").alias("n_both"),
                 F.col("_nb2").alias("n_ant"),
                 F.col("_na").alias("n_con")),
    )).alias("_r")).select("_r.*")

    def dec(c):
        return c.cast("decimal(38,0)")

    scored = directional.crossJoin(F.broadcast(nb)).select(
        F.col("antecedent").cast("bigint").alias("antecedent"),
        F.col("consequent").cast("bigint").alias("consequent"),
        "n_both",
        (F.col("n_both") / F.col("_nb")).alias("support"),
        (F.col("n_both") / F.col("n_ant")).alias("confidence"),
        ((dec(F.col("_nb")) * F.col("n_both")).cast("double")
         / (dec(F.col("n_ant")) * F.col("n_con")).cast("double"))
        .alias("lift"),
    )
    # top-k via TakeOrdered on the (lift, ids) TOTAL order — a
    # distributed heap, NOT a partition-less rank window over the
    # pair set (identical double bits order identically, so the cut
    # is cross-engine deterministic)
    out = scored.orderBy(F.desc("lift"), "antecedent", "consequent") \
        .limit(k)
    return out
