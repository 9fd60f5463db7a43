"""Incremental parquet cache: the BCRP cache semantics as a Spark sink.

Reference: ``/root/reference/perustats/BCRP/cache.py:105-169`` — a
SQLite-backed cache keyed (freq, start, end) that detects already-cached
codes, fetches only the missing ones, and upserts rows by date.

Spark-native design is APPEND-ONLY + read-time latest-wins + explicit
compaction, because rewriting a 100 TB cache per increment is a
non-starter:

- :meth:`append` writes each increment as new parquet files stamped
  with a monotonically increasing ``_batch_id`` (no read-modify-write
  of existing data — an O(increment) operation at any cache size).
- :meth:`load` resolves upserts lazily: latest batch wins per key via
  one window over the key — the same shuffle an explicit merge would
  need, but paid only when reading.
- :meth:`compact` materializes the resolved view into the next
  generation directory and retires the old one — amortized rewrite,
  run on demand (the Delta/Iceberg pattern without the table format).
- :meth:`cached_codes` / :meth:`missing_codes` reproduce the
  reference's fetch-planning queries (``cached_codes``,
  cache.py:105-121).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BATCH_COL = "_batch_id"


class IncrementalParquetCache:
    """Append-only keyed parquet cache with latest-wins reads."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys
        os.makedirs(path, exist_ok=True)

    # -- write path ---------------------------------------------------------

    def _next_batch_id(self) -> int:
        raw = self._read_raw()
        if raw is None:
            return 0
        row = raw.agg(F.max(BATCH_COL).alias("m")).collect()[0]
        return (row["m"] if row["m"] is not None else -1) + 1

    def append(self, df: DataFrame) -> int:
        """Write an increment; rows with keys already cached supersede
        them on read (upsert-by-key, reference cache.py:140-169). Never
        touches existing files."""
        batch_id = self._next_batch_id()
        (
            df.withColumn(BATCH_COL, F.lit(batch_id))
            .write.mode("append")
            .parquet(self.path)
        )
        return batch_id

    # -- read path ----------------------------------------------------------

    def _read_raw(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return None  # empty cache: no files yet

    def load(self) -> DataFrame | None:
        """Latest-wins view: one shuffle on the key columns."""
        raw = self._read_raw()
        if raw is None:
            return None
        w = Window.partitionBy(*self.keys).orderBy(F.desc(BATCH_COL))
        return (
            raw.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", BATCH_COL)
        )

    # -- fetch planning (reference cached_codes / missing semantics) --------

    def cached_codes(self, code_col: str = "code") -> list:
        df = self.load()
        if df is None:
            return []
        return sorted(r[0] for r in df.select(code_col).distinct().collect())

    def missing_codes(self, requested: list, code_col: str = "code") -> list:
        have = set(self.cached_codes(code_col))
        return sorted(c for c in requested if c not in have)

    # -- maintenance --------------------------------------------------------

    def compact(self) -> None:
        """Materialize the resolved view into a fresh generation and
        swap it in (the increment log restarts at batch 0)."""
        resolved = self.load()
        if resolved is None:
            return
        tmp = self.path.rstrip("/") + ".compacting"
        (
            resolved.withColumn(BATCH_COL, F.lit(0))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = self.path.rstrip("/") + ".old"
        shutil.move(self.path, old)
        shutil.move(tmp, self.path)
        shutil.rmtree(old)
