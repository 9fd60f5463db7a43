"""INEI module-listing normalizer over PRE-FETCHED HTML strings — the
last scraping-adjacent reference capability re-expressed as a
distributed source transform (VERDICT r8 item 7).

Reference analog: ``/root/reference/perustats/inei/utils/
html_utils.py:15-92`` (``html_to_dataframe``) parses one INEI portal
response with bs4 into a tidy pandas frame, and ``:95-116``
(``extract_period_value``) finds the period selector's option value.
The HTTP fetch itself cannot run here (and carries no distributable
semantics); the PARSE does: a crawl lands millions of fetched pages in
an (page_id, html) table, and normalizing them is a row-local
string-expression pipeline — whole-stage codegen end to end, zero
Python UDFs, zero shuffles until the caller aggregates.

Parity with the reference's semantics, field for field:

* the data table is the FIRST table nested INSIDE the first table
  (``soup.find('table').find('table')``); no table → no rows;
* the first ``<tr>`` is a header and is skipped; a page with ≤ 1 row
  yields nothing;
* rows with fewer than 8 ``<td>`` cells are dropped;
* ``year_ref``/``module_code`` parse as integers only when the
  stripped cell text is purely numeric (bs4 + ``int()`` behavior),
  else NULL;
* ``info_sheet`` is the href of the first link in cell 7 (NULL when
  the cell has no href);
* cells 8+ each classify their first link as spss/stata/csv/dbf by
  title substring (case-insensitive) or href path segment
  (case-sensitive, the reference's ``'/SPSS/' in href``), first
  matching format wins per cell, LAST matching cell wins per format
  (the reference's loop overwrites) — links without an href are
  skipped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TR = r"(?s)<tr[^>]*>(.*?)</tr>"
_TD = r"(?s)<td[^>]*>(.*?)</td>"
_INNER_TABLE = r"(?s)<table[^>]*>.*?<table[^>]*>(.*?)</table>"


def _text(cell: Column) -> Column:
    """bs4 ``get_text(strip=True)`` for flat cells: drop tags, trim."""
    return F.trim(F.regexp_replace(cell, r"<[^>]*>", ""))


def _href(cell: Column) -> Column:
    """First link target in the cell; NULL when absent/empty (the
    reference skips links whose href is missing or falsy)."""
    return F.nullif(
        F.regexp_extract(cell, r'href="([^"]*)"', 1), F.lit(""))


def _title(cell: Column) -> Column:
    return F.regexp_extract(cell, r'title="([^"]*)"', 1)


def _int_or_null(txt: Column) -> Column:
    """int(text) semantics: purely numeric or NULL (never a lossy
    cast of '2021a' / '3.5')."""
    return F.when(txt.rlike(r"^-?[0-9]+$"), txt.cast("bigint"))


def _classify(cell: Column) -> Column:
    """The reference's if/elif ladder: title substring (lowercased)
    OR href path segment, spss → stata → csv → dbf priority."""
    title = F.lower(_title(cell))
    href = _href(cell)
    return F.when(href.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(title.contains("spss") | href.contains("/SPSS/"), "spss")
        .when(title.contains("stata") | href.contains("/STATA/"), "stata")
        .when(title.contains("csv") | href.contains("/CSV/"), "csv")
        .when(title.contains("dbf") | href.contains("/DBF/"), "dbf"))


def module_listing(pages: DataFrame, html_col: str = "html",
                   id_cols: tuple = ("page_id",)) -> DataFrame:
    """Normalize a table of fetched INEI module-listing pages into one
    row per data row: *id_cols* + (number, year_ref, period_ref,
    survey_code, survey_name, module_code, module_name, info_sheet,
    spss, stata, csv, dbf).

    Pure row-local expressions (regex extraction + array transforms)
    — the page explodes into rows in place, so a million-page crawl
    normalizes embarrassingly parallel with text never shuffling."""
    inner = F.regexp_extract(F.col(html_col), _INNER_TABLE, 1)
    rows = F.regexp_extract_all(inner, F.lit(_TR), 1)
    # drop the header row; ≤ 1 row (or no table → zero rows) yields
    # nothing to explode
    data_rows = F.slice(rows, 2, F.greatest(F.size(rows) - 1, F.lit(0)))
    per_row = (
        pages.select(*id_cols, F.explode(data_rows).alias("_row"))
        .select(*id_cols,
                F.regexp_extract_all(F.col("_row"), F.lit(_TD), 1)
                .alias("_cells"))
        .where(F.size("_cells") >= 8)
    )

    def cell(i: int) -> Column:  # 1-based element_at over 0-based cols
        return F.element_at(F.col("_cells"), i + 1)

    links = F.transform(
        F.slice(F.col("_cells"), 9,
                F.greatest(F.size("_cells") - 8, F.lit(0))),
        lambda c: F.struct(_classify(c).alias("kind"),
                           _href(c).alias("href")))

    def fmt(kind: str) -> Column:
        # LAST matching cell wins (the reference's dict overwrite)
        return F.try_element_at(
            F.filter(links, lambda x: x["kind"] == kind), F.lit(-1)
        )["href"]

    return per_row.select(
        *id_cols,
        _text(cell(0)).alias("number"),
        _int_or_null(_text(cell(1))).alias("year_ref"),
        _text(cell(2)).alias("period_ref"),
        _text(cell(3)).alias("survey_code"),
        _text(cell(4)).alias("survey_name"),
        _int_or_null(_text(cell(5))).alias("module_code"),
        _text(cell(6)).alias("module_name"),
        _href(cell(7)).alias("info_sheet"),
        fmt("spss").alias("spss"),
        fmt("stata").alias("stata"),
        fmt("csv").alias("csv"),
        fmt("dbf").alias("dbf"),
    )


def period_option_value(html: Column, aliases: list[str]) -> Column:
    """The reference's ``extract_period_value`` as a column: the value
    of the FIRST ``<option>`` (document order) whose stripped text
    equals an alias or contains one as a substring (both lowercased).
    NULL when no option matches. Pair with
    :class:`~pyperustats_spark.sources.surveys.Survey`'s
    ``period_aliases``."""
    low = [a.lower() for a in aliases]
    opts = F.transform(
        F.regexp_extract_all(html, F.lit(r"(?s)<option[^>]*>.*?</option>"),
                             0),
        lambda tag: F.struct(
            F.regexp_extract(tag, r'value="([^"]*)"', 1).alias("value"),
            F.lower(_text(tag)).alias("text")))
    alias_arr = F.array(*[F.lit(a) for a in low])
    matched = F.filter(
        opts,
        lambda o: F.array_contains(alias_arr, o["text"])
        | F.exists(alias_arr, lambda a: o["text"].contains(a)))
    return F.try_element_at(matched, F.lit(1))["value"]
