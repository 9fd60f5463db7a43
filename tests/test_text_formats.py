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


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    """ORC read/write round trip: values survive, a declared schema
    applies, and a filter on the scan shows up as a pushed predicate
    (stripe-level skipping at scale, same contract as parquet)."""
    from pyperustats_spark.sources.text_formats import (
        read_orc_table, write_orc_table)
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", -0.5), (4, "c", 9.0)],
        ["id", "grp", "v"])
    path = str(tmp_path / "t.orc")
    write_orc_table(src, path)
    back = read_orc_table(spark, path)
    assert sorted(back.collect()) == sorted(src.collect())
    # declared schema applies
    typed = read_orc_table(spark, path,
                           "id bigint, grp string, v double")
    assert dict(typed.dtypes)["id"] == "bigint"
    # filter is pushed into the ORC scan
    plan = typed.where(typed.id > 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(id,2" in plan


def test_orc_partitioned_layout(spark, tmp_path):
    import os
    from pyperustats_spark.sources.text_formats import (
        read_orc_table, write_orc_table)
    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], ["id", "grp"])
    path = str(tmp_path / "p.orc")
    write_orc_table(src, path, partition_by=["grp"])
    assert sorted(d for d in os.listdir(path)
                  if d.startswith("grp=")) == ["grp=a", "grp=b"]
    back = read_orc_table(spark, path)
    assert back.count() == 3
    # partition pruning: only one directory scanned for grp='a'
    pruned = back.where(back.grp == "a")
    assert pruned.count() == 2


def test_xml_round_trip_with_schema(spark, tmp_path):
    from pyperustats_spark.sources.text_formats import (
        read_xml_table, write_xml_table)

    src = spark.createDataFrame(
        [(1, "alpha", 3.5), (2, "beta <&> escaped", -1.25),
         (3, None, 0.0)],
        ["id", "name", "score"])
    path = str(tmp_path / "xmlset")
    write_xml_table(src, path, row_tag="doc", root_tag="docs")
    back = read_xml_table(
        spark, path, row_tag="doc",
        schema="id bigint, name string, score double")
    got = sorted([tuple(r) for r in back.collect()])
    assert got == [(1, "alpha", 3.5), (2, "beta <&> escaped", -1.25),
                   (3, None, 0.0)]


def test_xml_corrupt_rows_quarantined(spark, tmp_path):
    from pyperustats_spark.sources.text_formats import (
        CORRUPT_COL, read_xml_table)

    p = tmp_path / "bad.xml"
    p.write_text(
        "<rows>"
        "<doc><id>1</id><name>ok</name></doc>"
        "<doc><id>not_a_number</id><name>bad</name></doc>"
        "</rows>")
    clean = read_xml_table(spark, str(p), row_tag="doc",
                           schema="id bigint, name string")
    rows = sorted([tuple(r) for r in clean.collect()])
    # strict schema: the unparseable id lands in quarantine, not NULL
    assert (1, "ok") in rows
    kept = read_xml_table(spark, str(p), row_tag="doc",
                          schema="id bigint, name string",
                          keep_corrupt=True)
    bad = kept.where(F.col(CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1
