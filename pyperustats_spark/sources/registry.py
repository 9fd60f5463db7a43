"""Table registry: lazy parquet loaders for the test star schema.

The reference keeps a per-source catalogue (BCRP metadata SQLite table,
INEI survey registry — see ``/root/reference/perustats/BCRP/metadata.py``
and ``perustats/inei/surveys/registry.py``). Here the registry is a thin
layer over ``spark.read.parquet`` so every downstream operator receives a
lazy DataFrame and Catalyst can push filters/projections into the scan.

At 100 TB the same entry points work: paths become directory trees of
partitioned parquet, and nothing in this module materializes data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough (relative to facts) to broadcast in star joins.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a lazy parquet scan.

    ``events.ts`` has shipped in two physical forms across testdata
    generations, both needing care:

    * parquet TIMESTAMP(NANOS), which Spark's vectorized reader
      rejects — read as int64 nanos (``nanosAsLong``) and truncate to
      microseconds with integer division (1.7e18 nanos exceeds double
      precision; float division would corrupt timestamps);
    * parquet TIMESTAMP(MICROS) without UTC adjustment, which Spark 4
      infers as TIMESTAMP_NTZ — a type half the timestamp builtins
      (``unix_micros``, ``window`` …) reject. Disable the NTZ
      inference so the column loads as a plain TIMESTAMP whose stored
      micros are UTC instants.

    DuckDB reads the same micros as naive timestamps, so oracles line
    up exactly (sessions run in UTC).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the whole star schema as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
