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
