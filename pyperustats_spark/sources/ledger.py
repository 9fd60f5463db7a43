"""Persistent corpus ledger: the released corpus reduced to its
dedup-relevant artifacts — distinct content keys and distinct winnowed
fingerprints — written ONCE per release as bucketed tables, so every
later release run reads yesterday's ledger instead of re-scanning
yesterday's 100 TB of text.

Why this exists: :func:`~pyperustats_spark.operators.dedup
.dedup_incremental` and :func:`~pyperustats_spark.operators.dedup
.exact_substring_decontaminate` take the released corpus as a
DataFrame and re-derive ``distinct(content_key)`` / ``distinct(wh)``
from raw text on EVERY release (VERDICT r8 item 5). Those derived sets
are (a) tiny relative to the text (16-byte md5s), (b) append-only
across releases, and (c) exactly what the anti-join side of both
operators consumes — the textbook write-once artifact, the
dedup sibling of :mod:`pyperustats_spark.sources.ann_index`'s
persist-once-prune-on-read layout.

Layout: two managed tables (the :mod:`..sources.warehouse` catalog
round-trip — raw parquet reads would silently lose bucket metadata),
``<prefix>_keys`` bucketed on ``fp`` and ``<prefix>_fps`` bucketed on
``wh``. Bucketing makes the recurring join's ledger side exchange-FREE
(plan-pinned in tests/test_ledger.py): the batch side shuffles into
the bucket layout, the ledger side streams straight out of its files,
and the follow-up per-key groupBy reuses the join's partitioning — so
a release run's shuffle volume is batch-proportional, never
corpus-proportional (the same contract dedup_incremental_bloom buys
probabilistically, bought structurally here).

Append discipline: each release appends only the keys/fingerprints not
already present (ledger-side anti-join — batch-proportional by the
same bucket argument), so the tables stay globally distinct and the
operators' ``distinct()`` step disappears rather than moves.

Reference analog: the reference persists fetched series and re-reads
them by key instead of re-downloading
(``/root/reference/perustats/BCRP/cache.py``); this is that pattern
for release-over-release dedup state.

Equality contract (pinned): ledger-backed dedup/decontaminate return
row-for-row the rows of the raw-corpus operators with the same
parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyperustats_spark.operators.dedup import (
    content_key,
    winnowed_fingerprints,
)


class CorpusLedger:
    """Handle on one ledger (a table-name prefix + the fingerprinting
    parameters, which are part of the artifact's identity — a ledger
    built at n_tokens=20 answers only n_tokens=20 decontamination)."""

    def __init__(self, spark: SparkSession, prefix: str,
                 num_buckets: int = 16, prefix_chars: int | None = None,
                 n_tokens: int = 20, winnow: int = 5,
                 hash_fn: str = "md5",
                 paragraph_delim: str = r"\n\s*\n",
                 cdc_w: int = 8) -> None:
        self.spark = spark
        self.keys_table = f"{prefix}_keys"
        self.fps_table = f"{prefix}_fps"
        self.paras_table = f"{prefix}_paras"
        self.chunks_table = f"{prefix}_chunks"
        self.num_buckets = num_buckets
        self.prefix_chars = prefix_chars
        self.n_tokens = n_tokens
        self.winnow = winnow
        self.hash_fn = hash_fn
        self.paragraph_delim = paragraph_delim
        self.cdc_w = cdc_w

    # -- write path -----------------------------------------------------

    def append_release(self, documents: DataFrame) -> None:
        """Fold a released batch into the ledger: distinct new content
        keys and winnowed fingerprints append to their bucketed
        tables. Only md5s shuffle; the batch text is scanned once per
        artifact and never stored."""
        from pyperustats_spark.operators.dedup import (
            _cdc_chunk_rows, _paragraph_list)

        keys = documents.select(
            content_key(self.prefix_chars).alias("fp")).distinct()
        fps = winnowed_fingerprints(
            documents, n_tokens=self.n_tokens, winnow=self.winnow,
            hash_fn=self.hash_fn).select("wh").distinct()
        paras = (
            documents.select(F.explode(
                _paragraph_list(self.paragraph_delim)).alias("para"))
            .select(F.md5("para").alias("_pk")).distinct()
        )
        self._append(keys, self.keys_table, "fp")
        self._append(fps, self.fps_table, "wh")
        chunks = _cdc_chunk_rows(documents, self.cdc_w) \
            .select("ck").distinct()
        self._append(paras, self.paras_table, "_pk")
        self._append(chunks, self.chunks_table, "ck")

    def _append(self, new: DataFrame, table: str, col: str) -> None:
        if self.spark.catalog.tableExists(table):
            new = new.join(self.spark.table(table), col, "left_anti")
            mode = "append"
        else:
            mode = "overwrite"
        (new.write.mode(mode)
         .bucketBy(self.num_buckets, col)
         .saveAsTable(table))
        # the write may run on a CLONED session (streaming foreachBatch
        # hands micro-batch frames a session clone), whose append
        # invalidates the CLONE's relation cache only — this session's
        # cached file index would keep serving the pre-append listing
        # (observed: 61 of 120 keys visible until refresh). Refresh on
        # OUR session unconditionally; in plain batch use it is a
        # harmless metadata no-op.
        self.spark.catalog.refreshTable(table)

    # -- read path ------------------------------------------------------

    def seen_keys(self) -> DataFrame:
        """The released corpus' distinct content keys (bucketed scan)."""
        return self.spark.table(self.keys_table)

    def seen_fingerprints(self) -> DataFrame:
        """The released corpus' distinct winnowed fingerprints."""
        return self.spark.table(self.fps_table)

    def seen_paragraphs(self) -> DataFrame:
        """The released corpus' distinct paragraph md5 keys
        (bucketed scan, column ``_pk``)."""
        return self.spark.table(self.paras_table)

    def seen_chunks(self) -> DataFrame:
        """The released corpus' distinct content-defined chunk hashes
        (bucketed scan, column ``ck``)."""
        return self.spark.table(self.chunks_table)

    def cdc_novelty(self, batch: DataFrame,
                    sort: bool = True) -> DataFrame:
        """:func:`~pyperustats_spark.operators.dedup
        .cdc_dedup_incremental` with the corpus chunk-key set read
        from the ledger: the release-time novelty card pays zero
        corpus text scans — the bucketed ``_chunks`` table streams
        straight into the membership join, its distinct pre-paid at
        append time (row-for-row equality with the rescan form pinned
        in tests/test_ledger.py)."""
        from pyperustats_spark.operators.dedup import (
            _cdc_novelty_from_keys)

        return _cdc_novelty_from_keys(
            batch, self.seen_chunks(), w=self.cdc_w, sort=sort)

    def dedup_paragraphs(self, batch: DataFrame, joiner: str = "\n\n",
                         sort: bool = True) -> DataFrame:
        """:func:`~pyperustats_spark.operators.dedup
        .paragraph_dedup_incremental` with the corpus paragraph-key
        set read from the ledger: the release path pays zero corpus
        text scans and zero corpus-side exchanges — the bucketed
        ``_paras`` table streams straight into the paragraph-key
        join, its distinct pre-paid at append time (row-for-row
        equality with the rescan form pinned in tests/test_ledger.py,
        same contract as :meth:`dedup_incremental`)."""
        from pyperustats_spark.operators.dedup import (
            _paragraph_dedup_from_keys)

        return _paragraph_dedup_from_keys(
            batch, self.seen_paragraphs(), delim=self.paragraph_delim,
            joiner=joiner, sort=sort)

    def dedup_incremental(self, batch: DataFrame,
                          sort: bool = True) -> DataFrame:
        """:func:`~pyperustats_spark.operators.dedup.dedup_incremental`
        with ``seen`` read from the ledger: no corpus text scan, no
        corpus-side distinct, no corpus-side exchange (the anti-join
        zips ledger buckets; the within-batch keep reuses the join's
        fp partitioning — one batch-side shuffle total, plan-pinned)."""
        b = batch.select("doc_id", "source",
                         content_key(self.prefix_chars).alias("fp"))
        fresh = b.join(self.seen_keys(), "fp", "left_anti")
        keep = fresh.groupBy("fp").agg(
            F.min(F.struct("doc_id", "source")).alias("s"))
        out = keep.select(F.col("s.doc_id").alias("doc_id"),
                          F.col("s.source").alias("source"), "fp")
        return out.orderBy("doc_id") if sort else out

    def decontaminate(self, batch: DataFrame, min_shared: int = 1,
                      sort: bool = True) -> DataFrame:
        """:func:`~pyperustats_spark.operators.dedup
        .exact_substring_decontaminate` against the ledger's
        fingerprint table: the corpus side contributes zero scans of
        text and zero exchanges — its distinct-wh set streams from
        bucket files into the semi-join."""
        if min_shared < 1:
            raise ValueError(f"min_shared must be >= 1, got {min_shared}")
        bw = winnowed_fingerprints(
            batch, n_tokens=self.n_tokens, winnow=self.winnow,
            hash_fn=self.hash_fn)
        hits = (
            bw.join(self.seen_fingerprints(), "wh", "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .where(F.col("n_hits") >= min_shared)
            .select("doc_id")
        )
        out = batch.join(hits, "doc_id", "left_anti") \
            .select("doc_id", "source")
        return out.orderBy("doc_id") if sort else out

    def novelty_profile(self, batch: DataFrame,
                        sort: bool = True) -> DataFrame:
        """:func:`~pyperustats_spark.operators.dedup
        .substring_novelty_profile` against the ledger's fingerprint
        table — the graded curation card with zero corpus-side scan
        or exchange."""
        from pyperustats_spark.operators.dedup import _novelty_from_fps

        bw = winnowed_fingerprints(
            batch, n_tokens=self.n_tokens, winnow=self.winnow,
            hash_fn=self.hash_fn)
        return _novelty_from_fps(batch, bw, self.seen_fingerprints(),
                                 sort)

    def drop(self) -> None:
        """Remove all ledger tables (test teardown / rebuild)."""
        for t in (self.keys_table, self.fps_table, self.paras_table,
                  self.chunks_table):
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")
