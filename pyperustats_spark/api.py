"""User-facing facade mirroring the reference's two primary APIs.

* :class:`SeriesClient` ≈ ``BCRPDataSeries.fetch_data`` (fetcher.py:47-107):
  validate codes against the catalogue → plan the fetch against the
  cache → pull only missing series from the source → resample to the
  requested frequency → persist increment → return the wide
  one-column-per-code frame sorted by date.
* :class:`DocumentPipeline` ≈ ``INEIFetcher.fetch_modules().download()
  .organize()`` (inei/fetcher.py:106-252): a chained pipeline whose
  steps are lazy DataFrame transforms; nothing executes until the
  caller materializes (the chain builds ONE logical plan Catalyst
  optimizes end-to-end — chaining never costs extra passes).

A user of the reference switches by swapping pandas frames for the
returned (lazy) Spark DataFrames; method names and flow match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyperustats_spark.operators import dedup as _dedup
from pyperustats_spark.operators import textops as _textops
from pyperustats_spark.operators import timeseries as _ts
from pyperustats_spark.sources.cache import IncrementalParquetCache


class SeriesClient:
    """Fetch-with-cache for observation series (BCRP semantics).

    *source_long* stands in for the HTTP API: a long (date, code, value)
    DataFrame the client "fetches" from. At 100 TB it is the raw
    observation lake; the cache holds the resampled/cleaned series."""

    def __init__(self, spark: SparkSession, source_long: DataFrame, cache_path: str):
        self.spark = spark
        self.source_long = source_long
        self.cache = IncrementalParquetCache(
            spark, cache_path, keys=["date", "code"])

    def validate_codes(self, codes: list[str]) -> tuple[list[str], list[str]]:
        """Split requested codes into known/unknown against the source
        catalogue (reference `validate_codes`, metadata.py:252-306)."""
        known_rows = (
            self.source_long.select("code").distinct()
            .where(F.col("code").isin(codes)).collect()
        )
        known = sorted(r["code"] for r in known_rows)
        unknown = sorted(set(codes) - set(known))
        return known, unknown

    def fetch(self, codes: list[str], freq: str = "M") -> DataFrame:
        """Wide one-column-per-code frame at *freq*, served from the
        cache; only codes missing from the cache touch the source
        (reference fetch_data flow, fetcher.py:47-107)."""
        known, _unknown = self.validate_codes(codes)
        missing = self.cache.missing_codes(known)
        if missing:
            fresh = (
                _ts.resample(
                    self.source_long.where(F.col("code").isin(missing)), freq)
                .select(F.col("period").alias("date"), "code",
                        F.col("value_sum").alias("value"))
            )
            self.cache.append(fresh)
        cached = self.cache.load()
        long_df = cached.where(F.col("code").isin(known))
        return _ts.pivot_wide(long_df, codes=tuple(known))


class DocumentPipeline:
    """Chained document-corpus pipeline (INEIFetcher chaining style).

    Every step returns ``self`` with a refined LAZY DataFrame — the full
    chain is one Catalyst plan. ``df`` exposes the current frame;
    ``write_cache`` lands it as a cache increment."""

    def __init__(self, spark: SparkSession, documents: DataFrame):
        self.spark = spark
        self._df = documents
        self._grain = "document"

    def _require_document_grain(self, op: str) -> None:
        # after chunk() the frame is keyed (doc_id, chunk_id): doc_id
        # is no longer unique, so a doc_id join would fan out rows and
        # the text column no longer exists — fail loudly, not weirdly
        if self._grain != "document":
            raise RuntimeError(
                f"{op}() operates on document grain but the pipeline is "
                f"at {self._grain} grain (chunk() was called); run "
                f"{op}() before chunk(), or start a new pipeline")

    @property
    def df(self) -> DataFrame:
        return self._df

    def dedup_exact(self) -> "DocumentPipeline":
        self._require_document_grain("dedup_exact")
        keep = _dedup.dedup_exact_normalized(self._df).select("doc_id")
        self._df = self._df.join(keep, "doc_id", "left_semi")
        return self

    def quality_filter(self, min_score: float = 0.5) -> "DocumentPipeline":
        self._require_document_grain("quality_filter")
        scored = _textops.quality_score(self._df).select(
            "doc_id", "quality_score")
        self._df = (
            self._df.join(scored, "doc_id")
            .where(F.col("quality_score") >= min_score)
            .drop("quality_score")
        )
        return self

    def lang_filter(self, langs: list[str]) -> "DocumentPipeline":
        self._require_document_grain("lang_filter")
        pred = _textops.lang_id(self._df).select("doc_id", "lang_pred")
        self._df = (
            self._df.join(pred, "doc_id")
            .where(F.col("lang_pred").isin(langs))
            .drop("lang_pred")
        )
        return self

    def dedup_fuzzy(self, threshold: float = 0.15) -> "DocumentPipeline":
        """Drop non-canonical near-dup cluster members (n-gram Jaccard
        pairs → connected components; each cluster's min doc_id
        survives)."""
        self._require_document_grain("dedup_fuzzy")
        self._df = _dedup.dedup_filter(self._df, threshold=threshold, sort=False)
        return self

    def pii_scrub(self) -> "DocumentPipeline":
        self._require_document_grain("pii_scrub")
        scrubbed = _textops.pii_scrub(self._df, sort=False).select(
            "doc_id", "text_scrubbed")
        self._df = (
            self._df.join(scrubbed, "doc_id")
            .drop("text")
            .withColumnRenamed("text_scrubbed", "text")
        )
        return self

    def chunk(self, chunk_tokens: int = 50, overlap: int = 10) -> "DocumentPipeline":
        """Re-shape the corpus into overlapping token-window chunks:
        the frame's grain changes to (doc_id, chunk_id), so it is a
        TERMINAL transform — document-grain steps afterwards raise
        (their doc_id joins would silently fan out across chunks)."""
        self._require_document_grain("chunk")
        self._df = _textops.chunk_windows(
            self._df, chunk_tokens=chunk_tokens, overlap=overlap, sort=False)
        self._grain = "chunk"
        return self

    def pack(self, budget: int = 256) -> "DocumentPipeline":
        """Assign each document its context-window span under
        concat-and-split packing (adds start_offset/bin columns)."""
        self._require_document_grain("pack")
        packed = _textops.pack_sequences(self._df, budget=budget,
                                         sort=False).select(
            "doc_id", "start_offset", "bin_start", "bin_end")
        self._df = self._df.join(packed, "doc_id")
        return self

    def with_fingerprint(self) -> "DocumentPipeline":
        self._require_document_grain("with_fingerprint")
        fp = _textops.fingerprint(self._df)
        self._df = self._df.join(fp, "doc_id")
        return self

    def run_stage(self, tracker, stage: str, transform=None) -> "DocumentPipeline":
        """Resume-aware stage execution (INEIFetcher tri-state chaining,
        ``inei/fetcher.py:170-252``): apply *transform* ONLY to the
        documents of items whose next pending stage is *stage*, leave
        already-processed items untouched, and flip their flag.

        *tracker* is a :class:`~pyperustats_spark.sources.progress.
        StageProgressTracker` whose keys are columns of this corpus
        (e.g. a module column). Re-running the same stage is a no-op —
        the pending set is empty, so nothing is re-transformed (the
        reference's restart-without-refetch behavior). The flag flips
        when this method runs, mirroring the reference's mark-as-you-go
        loop; callers needing mark-after-materialize call
        ``tracker.mark`` themselves after an action.

        The pending ITEM set is snapshotted to the driver before use:
        it is metadata-cardinality (survey modules — the reference holds
        the whole table in one SQLite file), and a lazy pending plan
        would silently re-evaluate against the post-``mark`` flag state
        when the returned frame finally materializes. Documents
        themselves never leave the cluster."""
        items = self._df.select(*tracker.keys).distinct()
        pend = tracker.pending(items, stage)
        rows = pend.collect()  # O(items) metadata snapshot, see docstring
        if rows:
            stable = self.spark.createDataFrame(rows, pend.schema)
            if transform is not None:
                todo = self._df.join(stable, tracker.keys, "left_semi")
                rest = self._df.join(stable, tracker.keys, "left_anti")
                self._df = transform(todo).unionByName(rest)
            tracker.mark(stage, stable)
        return self

    def write_cache(self, cache_path: str) -> IncrementalParquetCache:
        cache = IncrementalParquetCache(
            self.spark, cache_path, keys=["doc_id"])
        cache.append(self._df)
        return cache
