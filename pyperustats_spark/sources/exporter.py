"""Grouped release exporter — the reference's per-group parquet backup
as ONE partitioned write.

Reference: ``/root/reference/perustats/BCRP/backup/runner.py:15-27``
loops over ``grupo_file`` groups, fetches each group's series, and
writes ``RELEASES/{group}.parquet`` per group. A driver-side loop over
groups is exactly what doesn't scale, so here the whole release lands
in one ``write.partitionBy(group)`` pass: every executor writes its
groups' files concurrently, and a per-group manifest row records what
shipped. Readers get partition pruning for free — loading one group
reads only that group's directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# underscore prefix: parquet readers skip it, like _SUCCESS
MANIFEST_DIR = "_release_manifest"


def _read_pinned(spark: SparkSession, path: str,
                 fmt: str = "parquet") -> DataFrame:
    """Read a partitioned release WITHOUT partition-column type
    inference: a numeric-looking group value like ``'0100'`` must come
    back as the string ``'0100'``, never int 100 — inference loses both
    the written type and (for zero-padded values) the value itself."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        df = spark.read.format(fmt).load(path)
        df.schema  # force partition discovery while the conf is pinned
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    return df


def export_releases(
    df: DataFrame, group_col: str, path: str, fmt: str = "parquet",
) -> DataFrame:
    """Write one release directory per *group_col* value plus a manifest.

    Single distributed pass (``partitionBy`` — no driver loop, no
    per-group job like runner.py:15-27); the manifest is computed from
    the data ACTUALLY written back, not from the input plan, so a row
    in it certifies rows on disk. The read-back pins partition-column
    type inference off and re-applies the INPUT frame's group type, so
    the manifest records the written values faithfully. *fmt* picks
    the columnar container ("parquet" default, "orc" for ORC-consuming
    downstreams — both splittable, compressed, predicate-pushdown
    formats; the release layout and manifest contract are identical).
    Returns the manifest DataFrame (group, n_rows, n_cols)."""
    df.write.partitionBy(group_col).mode("overwrite") \
        .format(fmt).save(path)
    spark = df.sparkSession
    written = _read_pinned(spark, path, fmt).withColumn(
        group_col, F.col(group_col).cast(df.schema[group_col].dataType))
    manifest = (
        written.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("n_cols", F.lit(len(written.columns)))
    )
    manifest.coalesce(1).write.mode("overwrite").format(fmt).save(
        os.path.join(path, MANIFEST_DIR))
    return manifest


def load_release(
    spark: SparkSession, path: str, group_col: str | None = None,
    group: str | None = None, fmt: str = "parquet",
) -> DataFrame:
    """Read a release back; with *group* given, partition pruning means
    only that group's files are scanned (the reference reads one
    ``{group}.parquet`` — same I/O shape, no manual path math).

    The group filter compares the RAW partition string (inference
    pinned off) before any cast, so directory pruning survives; the
    written group type is then restored from the manifest when one is
    present (partition directories themselves only store strings)."""
    df = _read_pinned(spark, path, fmt)
    if group is not None:
        if group_col is None:
            raise ValueError("group_col is required when filtering by group")
        df = df.where(F.col(group_col) == F.lit(group).cast("string"))
    if group_col is not None:
        try:
            written_type = load_manifest(
                spark, path, fmt).schema[group_col].dataType
        except Exception:
            written_type = None  # foreign release without a manifest
        if written_type is not None:
            df = df.withColumn(
                group_col, F.col(group_col).cast(written_type))
    return df


def load_manifest(spark: SparkSession, path: str,
                  fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(os.path.join(path, MANIFEST_DIR))


# ---------------------------------------------------------------------------
# Artifact-name sanitization on save
# (reference ``sanitize_filename``/``filename_save``/``save_dataframe``,
# perustats/MEF/utils/parse_file.py:8-41)
# ---------------------------------------------------------------------------


def sanitize_filename(text: str) -> str:
    """Reference ``sanitize_filename`` (parse_file.py:8-21) verbatim
    semantics: alnum / space / dash / underscore survive, everything
    else becomes ``_``, then outer whitespace is stripped. Driver-side
    Python on purpose — it names artifacts (metadata), it never touches
    rows."""
    return "".join(
        c if c.isalnum() or c in (" ", "-", "_") else "_" for c in text
    ).strip()


def artifact_path(save_dir: str, name: str, value: str) -> str:
    """The reference's ``{name}_{sanitize(value)}`` save convention
    (``filename_save``, parse_file.py:24-38), with a parquet DIRECTORY
    instead of a csv file — same naming, Spark-native format."""
    return os.path.join(save_dir, f"{name}_{sanitize_filename(value)}.parquet")


def save_dataframe(df: DataFrame, save_dir: str, name: str,
                   value: str) -> str:
    """Persist *df* under the sanitized naming convention and return the
    path (``save_dataframe``, parse_file.py:41-56). One distributed
    parquet write; the frame reloads via ``spark.read.parquet(path)``."""
    path = artifact_path(save_dir, name, value)
    df.write.mode("overwrite").parquet(path)
    return path


def export_shards(
    documents: DataFrame, path: str, num_shards: int = 8,
    salt: str = "epoch0", fmt: str = "parquet",
) -> DataFrame:
    """The training-shard writer: deterministic epoch-shard layout
    (:func:`~pyperustats_spark.operators.relational.epoch_shards`)
    materialized as one ``partitionBy('shard')`` release — each shard
    directory is a self-contained training file set whose row order is
    the shard's hash order (``pos``).

    One pass: repartition on the shard id so every task owns whole
    shards, sort within partitions on (shard, pos) so the written file
    order IS the training read order, then the manifest certifies per-
    shard row counts from the data actually on disk. Re-running with
    the same salt reproduces byte-identical shard membership; a new
    epoch is just a new salt."""
    from pyperustats_spark.operators.relational import epoch_shards

    laid = epoch_shards(documents, "doc_id", num_shards=num_shards,
                        salt=salt, sort=False)
    laid = laid.repartition(num_shards, "shard") \
               .sortWithinPartitions("shard", "pos")
    return export_releases(laid, "shard", path, fmt=fmt)
