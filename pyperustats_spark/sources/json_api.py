"""Nested JSON API-response ingestion — the reference's core ingest
step re-expressed as a lazy DataFrame plan.

The reference pulls an API payload shaped as
``{"config": {"series": [{"name": ...}]}, "periods": [{"name":
"Ene.2023", "values": ["12.3", "n.d.", ...]}]}`` and widens it into a
pandas frame with one column per series (perustats/BCRP/utils.py:
114-144 ``json_to_df``). Here the same payload becomes LONG
``(period, date, code, value)`` observations: ``from_json`` with an
explicit schema (schema-on-read stays JVM-side and vectorized — no
inference scan), ``explode`` over periods, ``zip_with`` to pair series
names with period values, and ``try_cast`` numeric coercion (the
reference's ``pd.to_numeric(errors="coerce")`` — "n.d." → NULL).
``ts.pivot_wide`` composes on top when the wide form is wanted.

Scale: one payload row fans out to |periods| × |series| observation
rows entirely via generators inside whole-stage codegen — no shuffle
until the caller aggregates; a billion payloads ingest embarrassingly
parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyperustats_spark.functions.dates import parse_period

OBS_SCHEMA = (
    "struct<config: struct<series: array<struct<name: string>>>, "
    "periods: array<struct<name: string, values: array<string>>>>"
)


def json_observations(
    df: DataFrame, json_col: str = "payload", freq: str = "M",
    keep: list[str] | None = None,
) -> DataFrame:
    """Parse *json_col* API payloads into long observations.

    Returns ``keep + (period, date, code, value)``; *period* is the raw
    API period label, *date* its parsed timestamp for *freq* (Spanish
    month abbreviations handled by ``parse_period``). Series names and
    period values are paired positionally, exactly like the reference's
    ``dict(zip(series_names, period["values"]))``.
    """
    keep = keep or []
    base = df.withColumn("_j", F.from_json(F.col(json_col), OBS_SCHEMA))
    per = base.select(
        *keep,
        F.transform(F.col("_j.config.series"), lambda s: s["name"]).alias("_names"),
        F.explode(F.col("_j.periods")).alias("_p"),
    )
    zipped = F.zip_with(
        F.col("_names"), F.col("_p.values"),
        lambda n, v: F.struct(n.alias("code"), v.alias("raw")),
    )
    pairs = per.select(
        *keep, F.col("_p.name").alias("period"), F.explode(zipped).alias("_z")
    )
    return pairs.select(
        *keep,
        "period",
        parse_period(F.col("period"), freq).alias("date"),
        F.col("_z.code").alias("code"),
        F.col("_z.raw").try_cast("double").alias("value"),
    )
