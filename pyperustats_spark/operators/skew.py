"""Skew-handling join/aggregation patterns.

AQE's skew-join splitter (on in ``session.py``) handles most cases at
runtime; this module implements the EXPLICIT salting pattern for the
cases AQE can't fix — a single hot key whose post-shuffle partition
still exceeds memory, or deterministic layout requirements.

Mechanics of :func:`salted_join`:
- big side: append a uniform salt in [0, salt_n) — the hot key's rows
  spread over salt_n partitions instead of one.
- small side: replicate each row salt_n times (explode over the salt
  range) so every (key, salt) bucket finds its match.
- join on (key, salt): same result set as the plain key join, but the
  max partition size divides by salt_n.

Cost: small side inflates salt_n×. Use when the small side is modest
and a specific key dominates (classic power-law user/event joins).

The salt must be DETERMINISTIC per row (hash of the row key, not
rand()): retried tasks must salt identically or shuffle retries
double-count rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyperustats_spark.functions.bloom import bloom_build, bloom_member


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on *key* with the big side salted over *salt_n* buckets
    and the small side replicated to match. Result equals
    ``big.join(small, key, how)`` row-for-row for inner/left joins ONLY:
    a right/full-outer join would emit each unmatched small row once per
    salt replica, so those modes are rejected."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            "salted_join supports inner/left joins only: the salt_n-"
            f"replicated small side duplicates unmatched rows under {how!r}")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key), F.lit(17)), F.lit(salt_n)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(salt_n)]))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame, group_col: str, distinct_col: str, salt_n: int = 8
) -> DataFrame:
    """Two-phase exact distinct count per group: partial distinct within
    (group, salt) buckets, then merge. Bounds the per-task state for a
    hot group to ~1/salt_n of its distinct values (plain
    countDistinct funnels the whole hot group through one task)."""
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(distinct_col), F.lit(23)), F.lit(salt_n)).cast("int"),
    )
    partial = salted.groupBy(group_col, "_salt").agg(
        F.countDistinct(distinct_col).alias("_part")
    )
    # salt partitions distinct values disjointly, so partials add up
    return (
        partial.groupBy(group_col)
        .agg(F.sum("_part").alias("n_distinct"))
        .orderBy(group_col)
    )


def key_skew_profile(df: DataFrame, key_col: str, k: int = 10,
                     sort: bool = True) -> DataFrame:
    """Heavy-hitter diagnostic: the k heaviest values of *key_col*
    with row count and share of the table — the pre-flight check that
    decides whether a join/aggregate on this key needs salting or can
    rely on AQE's skew splitter.

    One partial-aggregated count shuffle; top-k via orderBy+limit
    (TakeOrderedAndProject — never a global sort); the 1-row grand
    total joins back broadcast (audited q_market_share pattern). The
    share is a RAW int/int quotient — bit-identical cross-engine."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(k)
    out = top.join(F.broadcast(total)).select(
        "key", "n", (F.col("n") / F.col("_total")).alias("share"))
    return out.orderBy(F.desc("n"), F.asc("key")) if sort else out


def bloom_prefilter_join(big: DataFrame, small: DataFrame, key: str,
                         how: str = "inner", m_bits: int = 1 << 16,
                         k: int = 3) -> DataFrame:
    """Equi-join with the big side Bloom-prefiltered by the small
    side's key set BEFORE anything shuffles: rows whose key cannot be
    in *small* are dropped at the scan by a row-local bitmap test, so
    only (selectivity + fp_rate) of the big side pays the exchange.
    Result row-for-row equal to ``big.join(small, key, how)`` — Bloom
    filters have no false negatives and the join itself discards the
    false positives — which is why the demo query is oracle-backed by
    the PLAIN join's SQL.

    This is the explicit form of Spark's runtime bloom-filter join
    (spark.sql.optimizer.runtime.bloomFilter.*): build it yourself
    when the optimizer won't inject one (non-equi residuals, filter
    reuse across several joins, or a driver-known key set), or when
    the filter should be built once and applied to MANY scans. At
    100 TB the economics are: one aggregation over the SMALL side +
    16 KB broadcast vs shuffling the full big side. Inner/semi only:
    a left join must keep non-matching big rows, which the prefilter
    would drop."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            "bloom_prefilter_join supports inner/semi joins only: the "
            f"prefilter drops big-side rows that {how!r} must keep")
    bitmap = bloom_build(small.select(key), key, m_bits=m_bits, k=k)
    pre = big.where(bloom_member(F.col(key), bitmap, m_bits=m_bits, k=k))
    return pre.join(small, key, how)
