"""Tri-state stage-progress tracking (INEI download→extract→organize).

Reference: ``/root/reference/perustats/inei/utils/db_utils.py:20-44``
keeps one SQLite row per module with ``downloaded / unzipped /
organized`` flags; ``INEIFetcher.download/organize``
(``inei/fetcher.py:170-252``) and the downloader's per-row pipeline
(``inei/downloader.py:122-163``) consult the flags so a re-run repeats
only the *missing* stage, and ``reset_download``
(``db_utils.py:136-146``) zeroes them to force a redo.

Spark-native design: the flag table is an APPEND-ONLY
:class:`~pyperustats_spark.sources.cache.IncrementalParquetCache`
keyed ``(item keys…, stage)`` — ``mark`` appends ``done=1`` rows,
``reset`` appends ``done=0`` rows, and the cache's latest-wins read
resolves the current flag per (item, stage) without ever rewriting
history (an O(increment) write at any log size). Planning is a pure
DataFrame function (:func:`stage_plan`) so the 100 TB "what's left to
do" query is one scan + one pivot aggregation, and the driver never
loops over items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyperustats_spark.sources.cache import IncrementalParquetCache

# pipeline order matters: a later flag is meaningless until every
# earlier one is set (the reference's chained fetch→download→organize)
STAGES = ("downloaded", "unzipped", "organized")

# the stage verb the planner emits for each first-unset flag
_NEXT_VERB = {"downloaded": "download", "unzipped": "extract",
              "organized": "organize"}


def status_from_events(events: DataFrame, keys: list[str]) -> DataFrame:
    """Current per-item flags from resolved (keys…, stage, done) rows.

    One pivot aggregation with the stage domain given explicitly (no
    value-discovery pass); items missing a stage row get 0 — the SQLite
    ``DEFAULT 0`` (db_utils.py:38-40)."""
    return (
        events.groupBy(*keys)
        .pivot("stage", list(STAGES))
        .agg(F.max("done"))
        .na.fill(0, list(STAGES))
    )


def stage_plan(items: DataFrame, status: DataFrame, keys: list[str]) -> DataFrame:
    """Per item: its three flags plus ``next_stage`` — the verb for the
    FIRST unset flag in pipeline order (``download`` → ``extract`` →
    ``organize``), or ``done`` when all are set.

    Mirrors the reference's per-stage filters (downloader.py:122-163
    skips existing zips; organize runs over unzipped modules): a flag
    set out of order (organized=1 while downloaded=0) does NOT skip
    ahead — the first missing stage still wins, exactly like re-running
    the chained pipeline. Items absent from *status* plan as fresh
    (all flags 0). The join is unhinted: both sides are item-cardinality
    and AQE size-decides.
    """
    flags = [F.coalesce(F.col(s), F.lit(0)).alias(s) for s in STAGES]
    j = items.join(status, on=keys, how="left").select(*[F.col(k) for k in keys], *flags)
    nxt = F.lit("done")
    for s in reversed(STAGES):
        nxt = F.when(F.col(s) == 0, F.lit(_NEXT_VERB[s])).otherwise(nxt)
    return j.withColumn("next_stage", nxt)


class StageProgressTracker:
    """Durable tri-state progress for a staged pipeline.

    ``mark``/``reset`` are O(increment) appends; ``status``/``pending``
    are lazy plans over the latest-wins view. Re-opening the same path
    resumes exactly where the last run stopped (the reference's
    restart-without-refetch behavior)."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 namespace: str = "progress"):
        self.spark = spark
        self.keys = keys
        self.cache = IncrementalParquetCache(
            spark, path, keys=[*keys, "stage"], namespace=namespace)

    def _events(self, items: DataFrame, stage: str, done: int) -> DataFrame:
        if stage not in STAGES:
            raise ValueError(f"unknown stage {stage!r}; expected one of {STAGES}")
        return (
            items.select(*self.keys).distinct()
            .withColumn("stage", F.lit(stage))
            .withColumn("done", F.lit(done))
        )

    def mark(self, stage: str, items: DataFrame) -> int:
        """Flip *stage* to done for *items* (reference ``mark_downloaded``
        / ``mark_unzipped`` / ``mark_organized``, db_utils.py:111-128)."""
        return self.cache.append(self._events(items, stage, 1))

    def reset(self, items: DataFrame) -> int:
        """Zero every flag for *items* so the whole chain re-runs
        (reference ``reset_download``, db_utils.py:136-146) — appended
        tombstones, nothing rewritten."""
        ev = None
        for s in STAGES:
            e = self._events(items, s, 0)
            ev = e if ev is None else ev.unionByName(e)
        return self.cache.append(ev)

    def status(self, like: DataFrame | None = None) -> DataFrame:
        """Current (keys…, downloaded, unzipped, organized) flags.

        *like* supplies the key column types for the empty-log frame
        (pass the items frame you will join against): hardcoding string
        keys would make an empty tracker's first ``plan()`` join an int
        ``year`` to a string column via implicit coercion, with a frame
        schema that differs between the empty and non-empty paths."""
        resolved = self.cache.load()
        if resolved is None:
            # empty log: an all-zero frame shaped like the flag table,
            # key types taken from the caller's frame when available
            if like is not None:
                key_part = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in like.select(*self.keys).schema.fields)
            else:
                key_part = ", ".join(f"{k} string" for k in self.keys)
            schema = ", ".join([key_part,
                                *(f"{s} int" for s in STAGES)])
            return self.spark.createDataFrame([], schema)
        return status_from_events(resolved, self.keys)

    def plan(self, items: DataFrame) -> DataFrame:
        """Every item with its flags and ``next_stage`` verb."""
        return stage_plan(items, self.status(like=items), self.keys)

    def pending(self, items: DataFrame, stage: str) -> DataFrame:
        """Items whose NEXT stage is *stage* — the work list one re-run
        of that step should process (nothing earlier pending, this flag
        unset)."""
        verb = _NEXT_VERB.get(stage, stage)
        return (
            self.plan(items)
            .where(F.col("next_stage") == verb)
            .select(*self.keys)
        )
