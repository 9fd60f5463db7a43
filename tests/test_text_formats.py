"""Schema-explicit CSV/JSONL sources: typed reads, corrupt-row
quarantine, no inference scan."""

import os

import pytest
from pyspark.sql import functions as F

from pyperustats_spark.sources.text_formats import (
    CORRUPT_COL,
    corrupt_rows,
    read_csv_table,
    read_jsonl_table,
)

SCHEMA = "code string, year int, value double"


def _write(tmp_path, name, lines):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_csv_read_typed_and_clean(spark, tmp_path):
    p = _write(tmp_path, "m.csv", [
        "code,year,value", "AF,2020,1.5", "NO,2021,2.25"])
    df = read_csv_table(spark, p, SCHEMA)
    assert [f.simpleString() for f in df.schema.fields] == [
        "code:string", "year:int", "value:double"]
    rows = {r["code"]: (r["year"], r["value"]) for r in df.collect()}
    assert rows == {"AF": (2020, 1.5), "NO": (2021, 2.25)}


def test_csv_corrupt_rows_quarantined_not_nulled(spark, tmp_path):
    p = _write(tmp_path, "bad.csv", [
        "code,year,value",
        "AF,2020,1.5",
        "NO,notayear,2.0",      # bad int
        "XX,2021,alsobad"])     # bad double
    clean = read_csv_table(spark, p, SCHEMA)
    assert {r["code"] for r in clean.collect()} == {"AF"}
    kept = read_csv_table(spark, p, SCHEMA, keep_corrupt=True)
    bad = corrupt_rows(kept).collect()
    assert len(bad) == 2
    assert any("notayear" in r[CORRUPT_COL] for r in bad)


def test_jsonl_read_and_quarantine(spark, tmp_path):
    p = _write(tmp_path, "m.jsonl", [
        '{"code": "AF", "year": 2020, "value": 1.5}',
        'this is not json',
        '{"code": "NO", "year": 2021, "value": 2.25}'])
    clean = read_jsonl_table(spark, p, SCHEMA)
    assert {r["code"] for r in clean.collect()} == {"AF", "NO"}
    kept = read_jsonl_table(spark, p, SCHEMA, keep_corrupt=True)
    bad = corrupt_rows(kept).collect()
    assert [r[CORRUPT_COL] for r in bad] == ["this is not json"]


def test_corrupt_rows_requires_kept_column(spark, tmp_path):
    p = _write(tmp_path, "m2.csv", ["code,year,value", "AF,2020,1.0"])
    df = read_csv_table(spark, p, SCHEMA)
    with pytest.raises(ValueError, match=CORRUPT_COL):
        corrupt_rows(df)


def test_csv_source_composes_with_operators(spark, tmp_path):
    # the point of a source: operators run on it unchanged
    from pyperustats_spark.operators import timeseries as TS

    p = _write(tmp_path, "obs.csv", [
        "date,code,value",
        "2020-01-01,AF,1.0", "2020-02-01,AF,2.0", "2020-01-15,NO,5.0"])
    df = read_csv_table(
        spark, p, "date timestamp, code string, value double")
    wide = TS.pivot_wide(df, codes=("AF", "NO"))
    assert set(wide.columns) == {"date", "AF", "NO"}
    assert wide.count() == 3
