"""BCRP series-catalogue page normalizer over PRE-FETCHED HTML — the
catalogue scrape re-expressed as a distributed source transform
(VERDICT r9 missing item 2; the INEI ``html_listing`` pattern).

Reference analog: ``/root/reference/perustats/BCRP/metadata.py:48-141``
— ``_clean_text`` (collapse whitespace, strip, drop a trailing
``- (N series)…`` suffix), ``_parse_series_table`` (row fields from the
``<table class="series">`` body) and ``_scrape_metadata`` (walk the
``tcg-elevator`` dropdown sections of one frequency page, attach group
name / source / frequency to every series row). The HTTP fetch carries
no distributable semantics; the PARSE does: a crawl lands the four
frequency pages (or a mirror of thousands) in a ``(freq_label, html)``
table and normalizing them is row-local string expressions — whole-stage
codegen end to end, zero Python UDFs, zero shuffles until the caller
aggregates.

Parity with the reference, field for field:

* sections are the ``<div class="tcg-elevator">`` blocks; a section
  with no ``<table class="series">`` (or an empty/headers-only table)
  yields nothing (``if df.empty: continue``);
* ``group`` is the cleaned ``<h2>`` text ('' when the section has no
  h2 — the reference's ``if h2 else ""``);
* ``source`` is the ``<p class="fuente">`` text with the
  ``Fuente: `` prefix removed and stripped, NULL when the section has
  no such element (the reference's ``AttributeError`` branch) — note
  the reference does NOT whitespace-collapse source, only strip;
* the first ``<tr>`` of the series table is a header and is skipped;
  rows with no ``<td>`` are dropped (``if not tds: continue``);
* ``code``/``description`` are the cleaned text of the FIRST ``<a>``
  inside cells 2/3, NULL when the cell has no link (``find('a')``
  returning None); ``url`` is the code link's href (the reference
  indexes ``codigo_td["href"]`` and would raise on a code link with
  no href; here that corner is NULL);
* ``fecha_inicio``/``fecha_fin``/``last_update`` are the cleaned full
  text of cells 4/5/6 (rows with fewer than 6 cells would raise
  IndexError in the reference; here they are dropped);
* ``freq`` is the D/M/Q/A indicator from the page's frequency label
  (``FREQ_WEB_MAP``, models.py:71-76), NULL for an unknown label.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyperustats_spark.sources.html_listing import _TD, _TR

_SECTION = r'(?s)<div class="tcg-elevator"[^>]*>(.*?)</div>'
_H2 = r"(?s)<h2[^>]*>(.*?)</h2>"
_FUENTE = r'(?s)<p class="fuente"[^>]*>(.*?)</p>'
_SERIES_TABLE = r'(?s)<table class="series"[^>]*>(.*?)</table>'
_A_INNER = r"(?s)<a[^>]*>(.*?)</a>"

FREQ_WEB_MAP = {
    "diarias": "D",
    "mensuales": "M",
    "trimestrales": "Q",
    "anuales": "A",
}


def _strip_tags(c: Column) -> Column:
    """bs4 ``.text`` / ``get_text()``: concatenate text, drop markup."""
    return F.regexp_replace(c, r"<[^>]*>", "")


def _clean_text(c: Column) -> Column:
    """metadata.py:48-52 ``_clean_text``: collapse runs of whitespace
    to one space, strip, then drop a trailing ``- (N series)…``
    annotation and strip again."""
    collapsed = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.trim(F.regexp_replace(
        collapsed, r"\s*-\s*\(\d+ series\).*$", ""))


def _first_link_text(cell: Column) -> Column:
    """Cleaned text of the first ``<a>`` in the cell; NULL when the
    cell has no link (``find('a')`` → None → field None)."""
    return F.when(
        cell.rlike("<a[^>]*>"),
        _clean_text(_strip_tags(F.regexp_extract(cell, _A_INNER, 1))))


def _first_link_href(cell: Column) -> Column:
    return F.when(
        cell.rlike("<a[^>]*>"),
        F.nullif(F.regexp_extract(cell, r'href="([^"]*)"', 1),
                 F.lit("")))


def catalog_listing(pages: DataFrame, html_col: str = "html",
                    freq_label_col: str = "freq_label") -> DataFrame:
    """Normalize fetched BCRP catalogue pages into one row per series:
    (freq_label, freq, group, source, code, description, fecha_inicio,
    fecha_fin, url, last_update).

    Pure row-local expressions — each page explodes into its dropdown
    sections and each section's series table into rows in place, so a
    mirror of any size normalizes embarrassingly parallel with HTML
    text never shuffling."""
    sections = (
        pages.select(
            F.col(freq_label_col).alias("freq_label"),
            F.explode(
                F.regexp_extract_all(F.col(html_col), F.lit(_SECTION), 1)
            ).alias("_sec"))
        .select(
            "freq_label",
            _clean_text(_strip_tags(
                F.regexp_extract(F.col("_sec"), _H2, 1))).alias("group"),
            F.when(
                F.col("_sec").rlike('<p class="fuente"'),
                F.trim(F.regexp_replace(
                    _strip_tags(
                        F.regexp_extract(F.col("_sec"), _FUENTE, 1)),
                    r"Fuente: ", ""))).alias("source"),
            F.regexp_extract(F.col("_sec"), _SERIES_TABLE, 1)
            .alias("_table"))
    )
    rows = F.regexp_extract_all(F.col("_table"), F.lit(_TR), 1)
    data_rows = F.slice(rows, 2, F.greatest(F.size(rows) - 1, F.lit(0)))
    per_row = (
        sections
        .select("freq_label", "group", "source",
                F.explode(data_rows).alias("_row"))
        .select("freq_label", "group", "source",
                F.regexp_extract_all(F.col("_row"), F.lit(_TD), 1)
                .alias("_cells"))
        .where(F.size("_cells") >= 6)
    )

    def cell(i: int) -> Column:  # 0-based like the reference's tds[i]
        return F.element_at(F.col("_cells"), i + 1)

    freq = F.element_at(
        F.create_map(*[F.lit(x) for kv in FREQ_WEB_MAP.items()
                       for x in kv]),
        F.col("freq_label"))
    return per_row.select(
        "freq_label",
        freq.alias("freq"),
        "group",
        "source",
        _first_link_text(cell(1)).alias("code"),
        _first_link_text(cell(2)).alias("description"),
        _clean_text(_strip_tags(cell(3))).alias("fecha_inicio"),
        _clean_text(_strip_tags(cell(4))).alias("fecha_fin"),
        _first_link_href(cell(1)).alias("url"),
        _clean_text(_strip_tags(cell(5))).alias("last_update"),
    )
