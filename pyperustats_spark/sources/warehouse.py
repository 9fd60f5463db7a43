"""Bucketed warehouse tables: pre-shuffle once at write time, join
shuffle-free forever after.

The classic 100 TB pattern for repeated fact⋈fact joins (lineitem ⋈
orders on orderkey every query): `bucketBy(k, key)` hash-partitions
rows into a fixed number of file buckets at WRITE time; a join of two
tables bucketed on the same key with the same bucket count needs no
exchange at all — each task zips matching buckets. The one-time write
shuffle is amortized over every subsequent query.

`spark.read.parquet` can't see bucket metadata (it lives in the
catalog), so this module round-trips through `saveAsTable` /
`spark.table` against the session's warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist *df* as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally removes the join's sort step
    (SortMergeJoin reads pre-sorted bucket files)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for bucket metadata; a raw parquet read
    of the same files would silently lose bucketing and re-shuffle."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables. With matching bucket counts and
    keys, the plan has NO Exchange on either side (assert via
    pyperustats_spark.plans.explain_str)."""
    return read_table(spark, left_table).join(read_table(spark, right_table), on, how)
