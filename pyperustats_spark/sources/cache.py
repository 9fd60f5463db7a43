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
# underscore prefix: parquet readers skip it like _SUCCESS markers
MANIFEST_FILE = "_MANIFEST"


def window_namespace(freq: str, start_date: str | None = None,
                     end_date: str | None = None) -> str:
    """Per-(frequency, window) cache namespace — the reference keys one
    SQLite table per fetch window (``_table_name``, BCRP/cache.py:34-43)
    so daily and monthly series never collide. Here it is a relative
    directory under the cache root."""
    def safe(s: str) -> str:
        return s.replace("-", "_").replace("/", "_")

    parts = [f"freq={safe(freq)}"]
    if start_date or end_date:
        parts.append(f"window={safe(start_date or 'min')}_{safe(end_date or 'max')}")
    return os.path.join(*parts)


class IncrementalParquetCache:
    """Append-only keyed parquet cache with latest-wins reads.

    *namespace* (usually :func:`window_namespace`) isolates the cache
    under ``path/namespace`` so several (freq, window) caches share one
    root with independent batch logs and latest-wins views.
    """

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 namespace: str | None = None):
        self.spark = spark
        self.path = os.path.join(path, namespace) if namespace else path
        self.keys = keys
        os.makedirs(self.path, exist_ok=True)

    # -- write path ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST_FILE)

    def _next_batch_id(self) -> int:
        # O(1) sidecar manifest read — scanning max(_batch_id) over the
        # whole cache would cost O(cache) metadata per append at scale
        try:
            with open(self._manifest_path()) as f:
                return int(f.read().strip()) + 1
        except (OSError, ValueError):
            pass
        # no/corrupt manifest (e.g. pre-manifest cache): rebuild once
        raw = self._read_raw()
        if raw is None:
            return 0
        row = raw.agg(F.max(BATCH_COL).alias("m")).collect()[0]
        return (row["m"] if row["m"] is not None else -1) + 1

    def _write_manifest(self, batch_id: int) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._manifest_path())

    def append(self, df: DataFrame) -> int:
        """Write an increment; rows with keys already cached supersede
        them on read (upsert-by-key, reference cache.py:140-169). Never
        touches existing files.

        The manifest CLAIMS the batch id before any data lands: a crash
        mid-write then leaves a claimed-but-empty id (harmless — reads
        just don't see it), never data on disk under an id a later
        append could reuse, which would make two different increments
        ambiguous under latest-wins."""
        batch_id = self._next_batch_id()
        self._write_manifest(batch_id)
        (
            df.withColumn(BATCH_COL, F.lit(batch_id))
            .write.mode("append")
            .parquet(self.path)
        )
        # drop Spark's cached file listing for this path so plans built
        # after the append see the new batch (stale FileStatusCache
        # entries otherwise hide increments within a session)
        self.spark.catalog.refreshByPath(self.path)
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
        # distinct over RAW batches: superseding a key never removes its
        # code, so this equals distinct over the resolved view without
        # paying the latest-wins window shuffle
        raw = self._read_raw()
        if raw is None:
            return []
        return sorted(r[0] for r in raw.select(code_col).distinct().collect())

    def missing_codes(self, requested: list, code_col: str = "code") -> list:
        have = set(self.cached_codes(code_col))
        return sorted(c for c in requested if c not in have)

    def cached_codes_df(self, code_col: str = "code") -> DataFrame:
        """Distinct cached codes as a LAZY DataFrame — the scale form of
        :meth:`cached_codes` for unbounded code domains (billions of
        doc_ids), where collecting the list to the driver is the OOM.
        The list-returning variant stays for the SeriesClient path,
        whose code domain is catalogue-bounded."""
        raw = self._read_raw()
        if raw is None:
            return self.spark.createDataFrame([], f"{code_col} string")
        return raw.select(code_col).distinct()

    def missing_codes_df(self, requested: DataFrame,
                         code_col: str = "code") -> DataFrame:
        """Requested-minus-cached as a DataFrame anti-join (same shape
        as ``pending_requests``). Unhinted: the cached side grows with
        the cache, so AQE decides the join strategy."""
        raw = self._read_raw()
        if raw is None:  # empty cache: everything requested is missing
            return requested
        return requested.join(
            raw.select(code_col).distinct(), on=code_col, how="left_anti")

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
        self._write_manifest(0)
