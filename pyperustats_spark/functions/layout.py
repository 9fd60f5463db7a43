"""Partition-layout helpers.

Expensive per-row expressions (MinHash signatures, SimHash votes,
feature extraction) are CPU-bound: their wall-clock is
``rows / parallelism``, so a scan that arrives in fewer partitions than
cores strands the rest of the machine. At 100 TB inputs arrive in
thousands of splits and this is a no-op; on a single small parquet file
(tests, or the tail of a partitioned table) it buys cores× speedup for
one cheap shuffle of the input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY if the current layout has fewer
    partitions than the target (default: cluster default parallelism).
    Never coalesces — wide inputs pass through untouched."""
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)
