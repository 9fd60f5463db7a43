"""INEI module-listing normalizer: field-for-field parity with the
reference parser's semantics (html_utils.py html_to_dataframe /
extract_period_value) on handcrafted pages covering its branches."""

import pytest
from pyspark.sql import functions as F

import pyperustats_spark.plans as P
from pyperustats_spark.sources.html_listing import (
    module_listing, period_option_value)


def _page(rows_html: str) -> str:
    return ('<html><body><table class="outer"><tr><td>chrome</td></tr>'
            '<table><tr><th>No</th><th>Year</th></tr>'
            f'{rows_html}</table></table></body></html>')


FULL_ROW = (
    "<tr><td>1</td><td>2021</td><td>Anual</td><td>ENAHO</td>"
    "<td><b>Encuesta</b> Nacional</td><td>34</td><td>Vivienda</td>"
    '<td><a href="/doc/1">ficha</a></td>'
    '<td><a title="Descarga SPSS" href="/f/1.sav">d</a></td>'
    '<td><a href="/f/STATA/1.dta">d</a></td>'
    '<td><a title="CSV file" href="/f/1.csv">d</a></td></tr>')


def _parse(spark, html):
    df = spark.createDataFrame([(1, html)], "page_id long, html string")
    return module_listing(df).collect()


def test_full_row_all_fields(spark):
    [r] = _parse(spark, _page(FULL_ROW))
    assert r["number"] == "1"
    assert r["year_ref"] == 2021
    assert r["period_ref"] == "Anual"
    assert r["survey_code"] == "ENAHO"
    assert r["survey_name"] == "Encuesta Nacional"  # tags stripped
    assert r["module_code"] == 34
    assert r["module_name"] == "Vivienda"
    assert r["info_sheet"] == "/doc/1"
    assert r["spss"] == "/f/1.sav"       # by title substring
    assert r["stata"] == "/f/STATA/1.dta"  # by href path segment
    assert r["csv"] == "/f/1.csv"
    assert r["dbf"] is None


def test_reference_edge_cases(spark):
    rows = (
        # non-numeric year/module -> NULL (int() semantics, not a cast)
        "<tr><td>2</td><td>n/a</td><td>U</td><td>X</td><td>N</td>"
        "<td>3.5</td><td>M</td><td>no link here</td></tr>"
        # short row (7 cells) -> dropped
        "<tr><td>3</td><td>2020</td><td>U</td><td>X</td><td>N</td>"
        "<td>1</td><td>M</td></tr>"
        # two spss cells -> LAST wins; link without href -> skipped
        "<tr><td>4</td><td>2020</td><td>U</td><td>X</td><td>N</td>"
        "<td>1</td><td>M</td><td></td>"
        '<td><a title="spss" href="/a.sav">d</a></td>'
        '<td><a title="spss">no-href</a></td>'
        '<td><a title="spss" href="/b.sav">d</a></td></tr>')
    out = {r["number"]: r for r in _parse(spark, _page(rows))}
    assert set(out) == {"2", "4"}
    assert out["2"]["year_ref"] is None
    assert out["2"]["module_code"] is None
    assert out["2"]["info_sheet"] is None
    assert out["4"]["spss"] == "/b.sav"


@pytest.mark.parametrize("html", [
    "<html><p>no table</p></html>",
    "<html><table><tr><td>outer only</td></tr></table></html>",
    _page(""),  # header-only inner table
])
def test_degenerate_pages_yield_no_rows(spark, html):
    assert _parse(spark, html) == []


def test_parser_is_jvm_side_and_rowlocal(spark):
    df = spark.createDataFrame([(1, _page(FULL_ROW))],
                               "page_id long, html string")
    out = module_listing(df)
    assert not P.has_python_eval(out)
    assert P.count_exchanges(out) == 0  # embarrassingly parallel


def test_period_option_value_first_match_wins(spark):
    html = ('<select><option value="9">Mensual</option>'
            '<option value="1">Anual</option>'
            '<option value="2">Periodo anual viejo</option></select>')
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(
        period_option_value(F.col("html"), ["anual", "unico"])
        .alias("v")).collect()[0]["v"]
    assert got == "1"
    # substring match when no exact text
    got2 = df.select(
        period_option_value(F.col("html"), ["viejo"])
        .alias("v")).collect()[0]["v"]
    assert got2 == "2"
    # no match -> NULL
    got3 = df.select(
        period_option_value(F.col("html"), ["panel"])
        .alias("v")).collect()[0]["v"]
    assert got3 is None
