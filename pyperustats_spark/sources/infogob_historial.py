"""infogob politician affiliation-history normalizer over PRE-FETCHED
ficha responses — the last reference HTML-parse surface without a port
(VERDICT r10 missing item 1).

Reference analog: ``/root/reference/perustats/infogob/
41_candidatos_historial.py`` — ``parse_content_block`` (lines 20-52:
the ``span.linkOrgPol`` org link with its ``data-val`` id, and the
``span.etiqueta`` → next-sibling ``span.control`` label/value pairs
with colon-stripped, accent-folded snake_case keys) and
``join_afiliaciones`` (55-84: the ``div#HistorialPartidario`` ``h5``
section walk, each section's next-sibling ``div.content`` parsed, with
``activa`` = 0 for the "HISTORIAL DE AFILIACIONES" section and 1 for
every other section — the reference treats ANY non-historial header as
the live affiliation, per its commented-out "AFILIACION VIGENTE"
check). The pending-set anti-join driving which fichas to fetch is the
idiom already ported in ``json_api.pending_requests``; the
token/session HTTP choreography carries no distributable semantics.

A crawl lands one fetched ficha page per politician in a table; every
step here is a row-local regex expression (whole-stage codegen, no
Python UDFs) — explode sections, then per-section extracts. Narrow
except the one explode; scales with executor count at any corpus size.

Deliberate divergences from the reference, documented:

* bs4 walks the element tree; these regexes assume the ficha page
  shape — ``div.content`` blocks contain spans (no nested ``div``),
  and an ``etiqueta`` span's matching ``control`` span appears before
  the NEXT ``etiqueta`` (the reference's ``find_next_sibling`` skips
  arbitrary intervening siblings, which the tempered pattern here
  also allows, but only within the same content block);
* ``get_text(" ", strip=True)`` joins stripped text chunks with one
  space; the regex form replaces tags with a space and collapses
  whitespace runs — identical unless a single text chunk contains an
  internal run of spaces the reference would preserve;
* the reference accumulates rows with DYNAMIC dict keys (one sqlite
  column per label seen); the distributed form keeps a fixed schema by
  emitting one row per (section, campo, valor) pair from
  :func:`affiliation_fields` — a lossless long-form of the same data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyperustats_spark.functions.text import let

# everything from the HistorialPartidario container start; the ficha
# page keeps it as the trailing content block, so running to
# end-of-document is equivalent to bs4's subtree scoping there
_CONTAINER = r'(?s)<div[^>]*id="HistorialPartidario".*'
# one h5 header + its next-sibling content block (content blocks hold
# spans only — no nested div — so the non-greedy close is exact)
_SECTION = (r'(?s)<h5[^>]*>.*?</h5>'
            r'(?:(?!<h5).)*?<div[^>]*class="content"[^>]*>.*?</div>')
_H5_TEXT = r"(?s)<h5[^>]*>(.*?)</h5>"
_CONTENT = r'(?s)<div[^>]*class="content"[^>]*>(.*?)</div>'
_ORG_SPAN = r'(?s)<span[^>]*class="linkOrgPol"[^>]*>.*?</span>'
_ORG_OPEN_TAG = r'(?s)<span[^>]*class="linkOrgPol"[^>]*>'
_DATA_VAL = r'data-val="([^"]*)"'
_A_TEXT = r"(?s)<a[^>]*>(.*?)</a>"
_A_HREF = r'(?s)<a[^>]*href="([^"]*)"'
# an etiqueta span, then (skipping any non-etiqueta siblings, the
# find_next_sibling semantics) its control span
_PAIR = (r'(?s)<span[^>]*class="etiqueta"[^>]*>.*?</span>'
         r'(?:(?!<span[^>]*class="etiqueta").)*?'
         r'<span[^>]*class="control"[^>]*>.*?</span>')
_ETIQUETA_TEXT = r'(?s)<span[^>]*class="etiqueta"[^>]*>(.*?)</span>'
_CONTROL_TEXT = r'(?s)<span[^>]*class="control"[^>]*>(.*?)</span>'


def strip_tags_text(c: Column) -> Column:
    """bs4 ``get_text(" ", strip=True)`` for a markup fragment: tags
    become separators, whitespace runs collapse to one space, ends
    trimmed."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(c, r"<[^>]*>", " "), r"\s+", " "))


def fold_key(c: Column) -> Column:
    """The reference's key normalization, verbatim (:37-46): strip the
    colon, lowercase, spaces to underscores, and fold exactly the five
    accented vowels — ``ñ`` is deliberately NOT folded, matching the
    reference's replace chain."""
    out = F.lower(F.regexp_replace(c, ":", ""))
    out = F.regexp_replace(out, " ", "_")
    for src, dst in (("ó", "o"), ("í", "i"), ("é", "e"),
                     ("á", "a"), ("ú", "u")):
        out = F.regexp_replace(out, src, dst)
    return out


def affiliation_sections(pages: DataFrame,
                         html_col: str = "html") -> DataFrame:
    """``join_afiliaciones`` re-expressed: one row per ``h5`` section
    inside ``div#HistorialPartidario`` — (carry…, ``seccion`` =
    0-based section index, ``titulo`` = stripped header text,
    ``activa`` = 0 when the uppercased title contains "HISTORIAL DE
    AFILIACIONES" else 1, plus the org-link triple from the section's
    content block: ``organizacion_politica`` / ``url_organizacion``
    (NULL when the ``<a>`` is absent) / ``id_organizacion`` (NULL when
    ``data-val`` is absent). All metadata columns of *pages* carry
    through (the reference's ``{**metadata, **afiliacion}``).

    Keeps the raw ``_content`` fragment so :func:`affiliation_fields`
    can explode label/value pairs without re-parsing the page."""
    carry = [c for c in pages.columns if c != html_col]
    sections = F.regexp_extract_all(
        F.regexp_extract(F.col(html_col), _CONTAINER, 0),
        F.lit(_SECTION), 0)
    exploded = (
        pages.select(*carry, F.posexplode(sections)
                     .alias("seccion", "_sec"))
    )
    # stage the SHARED extractions once: pasting the same Column tree
    # into every output expression made one select evaluate the
    # content-div regexp 7× and the linkOrgPol span 6× per section
    # (r11 plan audit) — as intermediate aliases they are non-cheap
    # and multiply-referenced, so CollapseProject keeps the staged
    # Project and each regexp runs once per row
    staged = exploded.select(
        *carry, "seccion",
        strip_tags_text(F.regexp_extract(F.col("_sec"), _H5_TEXT, 1))
        .alias("_titulo"),
        F.regexp_extract(F.col("_sec"), _CONTENT, 1).alias("_content"),
    ).select(
        *carry, "seccion", "_titulo", "_content",
        F.regexp_extract(F.col("_content"), _ORG_SPAN, 0)
        .alias("_org_span"),
    )
    org_span = F.col("_org_span")
    return staged.select(
        *carry,
        F.col("seccion").cast("bigint").alias("seccion"),
        F.col("_titulo").alias("titulo"),
        F.when(F.upper(F.col("_titulo"))
               .contains("HISTORIAL DE AFILIACIONES"),
               F.lit(0)).otherwise(F.lit(1))
        .cast("bigint").alias("activa"),
        F.when(org_span != "",
               let(strip_tags_text(
                   F.regexp_extract(org_span, _A_TEXT, 1)),
                   lambda v: F.nullif(v, F.lit(""))))
        .alias("organizacion_politica"),
        F.when(org_span != "",
               let(F.regexp_extract(org_span, _A_HREF, 1),
                   lambda v: F.nullif(v, F.lit(""))))
        .alias("url_organizacion"),
        F.when(org_span != "",
               let(F.regexp_extract(
                   F.regexp_extract(org_span, _ORG_OPEN_TAG, 0),
                   _DATA_VAL, 1),
                   lambda v: F.nullif(v, F.lit(""))))
        .alias("id_organizacion"),
        F.col("_content"),
    )


def affiliation_fields(sections: DataFrame,
                       content_col: str = "_content") -> DataFrame:
    """``parse_content_block``'s etiqueta→control walk as long-form
    rows: one row per label/value pair — (carry…, ``campo`` = the
    colon-stripped accent-folded snake_case key, ``valor`` = the
    control span's space-joined stripped text). An etiqueta with no
    following control span in its block contributes nothing (the
    reference's ``continue``). Input is :func:`affiliation_sections`
    output (the ``_content`` fragment rides along); every non-content
    column carries through."""
    carry = [c for c in sections.columns if c != content_col]
    pairs = F.regexp_extract_all(F.col(content_col), F.lit(_PAIR), 0)
    return (
        sections.select(*carry, F.explode(pairs).alias("_pair"))
        .select(
            *carry,
            fold_key(strip_tags_text(
                F.regexp_extract(F.col("_pair"), _ETIQUETA_TEXT, 1)))
            .alias("campo"),
            strip_tags_text(
                F.regexp_extract(F.col("_pair"), _CONTROL_TEXT, 1))
            .alias("valor"),
        )
    )
