"""CSV / JSON-lines sources with EXPLICIT schemas.

The reference ingests CSV microdata (INEI module files) and JSON API
payloads (BCRP/infogob). Spark reads both natively; the one scale rule
this module enforces is **no schema inference**: an inference pass is a
full extra scan of the source (at 100 TB, an extra 100 TB read) and can
silently mis-type sparse columns. Every reader here takes a DDL schema
string and fails fast on malformed rows or schema drift instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# malformed rows land here instead of silently becoming NULLs
CORRUPT_COL = "_corrupt_record"


def read_csv_table(
    spark: SparkSession, path: str, schema: str,
    header: bool = True, delimiter: str = ",",
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV scan with a declared schema (INEI microdata shape).

    PERMISSIVE mode + an explicit corrupt-record column: a bad row
    never aborts a 1000-executor job, and callers choose to inspect
    (``keep_corrupt=True``) or drop the quarantined rows. The schema is
    required — inference would re-scan the file and guess types from a
    sample."""
    full_schema = schema + f", {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def read_jsonl_table(
    spark: SparkSession, path: str, schema: str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSON-lines scan with a declared schema (API payload dumps).

    Same contract as :func:`read_csv_table`: explicit schema, PERMISSIVE
    parse, corrupt rows quarantined not NULLed."""
    full_schema = schema + f", {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_rows(df: DataFrame) -> DataFrame:
    """The quarantined rows of a ``keep_corrupt=True`` read (raw line in
    ``_corrupt_record``, typed columns as far as they parsed) — the
    audit trail a production ingest keeps instead of dropping silently.

    Returns FULL rows, not just the raw line: Spark disallows CSV/JSON
    queries whose only referenced column is the internal corrupt-record
    column (they would need a second parse), and the parsed fragments
    are what makes triage possible anyway."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"frame has no {CORRUPT_COL}; read with keep_corrupt=True")
    return df.where(F.col(CORRUPT_COL).isNotNull())


def read_orc_table(spark: SparkSession, path: str,
                   schema: str | None = None) -> DataFrame:
    """ORC scan — the columnar warehouse format Hive-lineage pipelines
    feed us alongside parquet. ORC embeds its schema (no inference
    scan to forbid), but callers MAY pass a DDL string to fail fast on
    drift: the declared schema is applied to the scan, and Spark's ORC
    reader errors on incompatible types instead of silently casting.
    Predicate pushdown and column pruning work as with parquet —
    filters reach the ORC stripe/row-group indexes (PushedFilters in
    the scan node), so a filtered read never scans full stripes."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc_table(df: DataFrame, path: str,
                    partition_by: list[str] | None = None,
                    compression: str = "zstd") -> None:
    """ORC sink with zstd compression (the parquet writer's warehouse
    sibling; snappy and zlib also valid). Partitioning column list is
    passed straight through — the same layout rules as the parquet
    exporter apply (partition by LOW-cardinality columns only)."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_xml_table(spark: SparkSession, path: str, row_tag: str,
                   schema: str, keep_corrupt: bool = False) -> DataFrame:
    """XML scan with a declared schema (Spark 4's built-in ``xml``
    source — the spark-xml package merged upstream; the reference's
    scraped portals serve exactly this shape of row-tagged XML
    alongside HTML). Same contract as :func:`read_csv_table`: schema
    REQUIRED (inference = an extra full scan), PERMISSIVE mode with an
    explicit corrupt-record column so one malformed element never
    aborts a 1000-executor job, and callers either inspect or drop the
    quarantined rows. ``row_tag`` names the repeated element that
    becomes one row; attributes surface with the default ``_`` prefix."""
    full_schema = schema + f", {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .format("xml")
        .load(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_xml_table(df: DataFrame, path: str, row_tag: str = "row",
                    root_tag: str = "rows") -> None:
    """XML sink (round-trip partner of :func:`read_xml_table`) — used
    by tests and by export paths feeding XML-only consumers. One file
    per partition, standard distributed write."""
    (df.write.mode("overwrite")
     .option("rowTag", row_tag)
     .option("rootTag", root_tag)
     .format("xml")
     .save(path))
