"""File-organizer semantics (INEI organizer) as distributed table ops.

Reference: ``/root/reference/perustats/inei/organizer.py``
- slugify + collision-safe renaming (organizer.py:168-190, 236-245):
  lowercase-slug a name, then suffix ``_1, _2, ...`` for later
  collisions within a destination group.
- inventory walk grouped by module/year with per-group counts
  (organizer.py:104-147).
- content-hash dedup with canonical-file mapping
  (organizer.py:199-248): first file with a hash is canonical; later
  ones map to it.

All single-shuffle: the collision window and the group counts partition
by their natural keys; nothing touches a driver-side dict (the
reference's ``name_count``/``seen`` dictionaries become window
functions and groupBy-min joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyperustats_spark.functions.text import normalize, slugify


def slugify_collision_safe(df: DataFrame, name_col: str, group_cols: list[str],
                           order_col: str) -> DataFrame:
    """Slugify *name_col*; within each group, identical slugs get
    ``_1, _2, ...`` suffixes in *order_col* order (first keeps the bare
    slug — reference name_count semantics, organizer.py:176-190)."""
    slug = slugify(F.col(name_col))
    w = Window.partitionBy(*group_cols, "slug").orderBy(order_col)
    return (
        df.withColumn("slug", slug)
        .withColumn("collision_idx", F.row_number().over(w) - F.lit(1))
        .withColumn(
            "final_name",
            F.when(F.col("collision_idx") == 0, F.col("slug")).otherwise(
                F.concat_ws("_", "slug", F.col("collision_idx").cast("string"))
            ),
        )
    )


def inventory_by_group(df: DataFrame, group_cols: list[str],
                       size_col: str) -> DataFrame:
    """Per-group file inventory: count + total/max size (organizer walk
    grouped by module/year, organizer.py:104-147)."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(size_col).alias("total_size"),
            F.max(size_col).alias("max_size"),
        )
        .orderBy(*group_cols)
    )


def content_dedup_map(documents: DataFrame) -> DataFrame:
    """Hash-dedup with canonical mapping: every doc maps to the lowest
    doc_id sharing its normalized-content hash; ``is_canonical`` marks
    the kept copy (reference ``seen`` dict, organizer.py:222-231)."""
    hashed = documents.select(
        "doc_id", F.md5(normalize(F.col("text"))).alias("content_hash")
    )
    canon = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("canonical_id"))
    return (
        hashed.join(canon, "content_hash")
        .select(
            "doc_id",
            "content_hash",
            "canonical_id",
            (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


def manifest_quarantine(items: DataFrame, manifest: DataFrame,
                        id_col: str = "doc_id",
                        content_col: str = "text",
                        sort: bool = True) -> DataFrame:
    """Manifest-checked batch ingest: recompute each item's content
    hash and check it against the manifest's expected hash — the
    distributed form of the reference's download→unzip integrity guard
    (``file_hash`` + ``is_zip_valid``, inei/utils/file_utils.py:26-44),
    with the same policy as the PERMISSIVE CSV reader: a bad member is
    QUARANTINED, never a job failure (one rotted archive member must
    not abort a 1000-executor ingest).

    *manifest* carries (id_col, expected_hash). Output = items keyed
    by *id_col* with ``content_hash`` and a tri-state ``status``:
    ``ok`` (hashes match), ``corrupt`` (mismatch → quarantine),
    ``unlisted`` (no manifest row → provenance unknown, quarantine).
    Manifest rows with no arriving item are the integrity card's
    ``n_missing`` (:func:`ingest_integrity_card`) — absent items can't
    appear in a row-level verdict.

    One equi-join on the id (both sides SF-proportional, AQE-decided);
    the hash is md5 so a DuckDB oracle reproduces every verdict.

    The manifest is deduplicated on *id_col* first (min expected_hash
    wins — deterministic, unlike dropDuplicates): a manifest with two
    entries for one id would otherwise silently duplicate that item in
    the verdict frame and double-count it downstream in
    :func:`ingest_integrity_card`. The reference's per-file hash guard
    has no duplicate-key channel (one path = one hash), so collapsing
    is the faithful port of that invariant."""
    recomputed = items.withColumn("content_hash", F.md5(F.col(content_col)))
    m = (manifest.select(id_col, "expected_hash")
         .groupBy(id_col)
         .agg(F.min("expected_hash").alias("expected_hash")))
    out = (
        recomputed.join(m, id_col, "left")
        .withColumn(
            "status",
            F.when(F.col("expected_hash").isNull(), F.lit("unlisted"))
            .when(F.col("content_hash") == F.col("expected_hash"),
                  F.lit("ok"))
            .otherwise(F.lit("corrupt")),
        )
        .drop("expected_hash")
    )
    return out.orderBy(id_col) if sort else out


def ingest_integrity_card(items: DataFrame, manifest: DataFrame,
                          id_col: str = "doc_id",
                          content_col: str = "text",
                          source_col: str = "source",
                          sort: bool = True) -> DataFrame:
    """Per-source ingest integrity card over a manifest-checked batch
    (the q_orphan_check class): how many arriving items verified ok /
    corrupt / unlisted, and how many manifest entries never arrived
    (``n_missing``) — the report a recurring 100 TB ingest publishes
    before any downstream stage trusts the batch.

    Counts come from ONE full-outer join of the hashed items with the
    duplicate-collapsed manifest (the min-(expected_hash, source)
    entry wins, as in :func:`manifest_quarantine`) and ONE per-source
    aggregate: an arrived row counts under the ITEM's source, a
    never-arrived manifest entry under the MANIFEST's — exactly the
    arrived⟗missing card, but the verdict branch and the anti-join
    branch no longer each re-run the manifest build + full-text hash
    (optimization r11: 6 documents scans / 3 md5-over-text passes →
    3 scans / 2 passes; only keys, hashes and sources shuffle).
    corrupt_share is a RAW int/int quotient (bit-identical
    cross-engine; in-engine rounding would split exact p/2^k
    midpoints)."""
    hashed = items.select(
        id_col, F.col(source_col).alias("_i_src"),
        F.md5(F.col(content_col)).alias("_h"), F.lit(1).alias("_arr"))
    m = (
        manifest.groupBy(id_col)
        .agg(F.min(F.struct("expected_hash", source_col)).alias("_w"))
        .select(id_col, F.col("_w.expected_hash").alias("_exp"),
                F.col(f"_w.{source_col}").alias("_m_src"))
    )
    # the exact CASE ladder of manifest_quarantine (including the
    # null-hash ELSE-corrupt branch); null for never-arrived entries
    status = F.when(
        F.col("_arr") == 1,
        F.when(F.col("_exp").isNull(), F.lit("unlisted"))
        .when(F.col("_h") == F.col("_exp"), F.lit("ok"))
        .otherwise(F.lit("corrupt")))
    j = hashed.join(m, id_col, "full_outer").select(
        F.coalesce("_i_src", "_m_src").alias(source_col),
        F.col("_arr"), status.alias("_st"))
    out = (
        j.groupBy(source_col)
        .agg(
            F.coalesce(F.sum("_arr"), F.lit(0)).cast("bigint")
            .alias("n_items"),
            F.coalesce(F.sum((F.col("_st") == "ok").cast("bigint")),
                       F.lit(0)).alias("n_ok"),
            F.coalesce(F.sum((F.col("_st") == "corrupt").cast("bigint")),
                       F.lit(0)).alias("n_corrupt"),
            F.coalesce(F.sum((F.col("_st") == "unlisted").cast("bigint")),
                       F.lit(0)).alias("n_unlisted"),
            F.coalesce(F.sum(F.col("_arr").isNull().cast("bigint")),
                       F.lit(0)).alias("n_missing"),
        )
        .withColumn("corrupt_share",
                    F.try_divide(F.col("n_corrupt"), F.col("n_items")))
    )
    return out.orderBy(source_col) if sort else out
