"""infogob electoral-process metadata normalizer over PRE-FETCHED
responses — the process → elections top-of-funnel table re-expressed
as distributed source transforms (VERDICT r9 missing item 3).

Reference analog: ``/root/reference/perustats/infogob/
00_procesos_electorales_metadata.py`` — ``_get_proc_electorales``
(lines 35-42: the ``#IdTipoProceso`` dropdown options minus the
placeholder), ``_listar_elecciones`` (44-58: the JSON ``Data`` list
minus its placeholder, names title-cased), ``_get_redirected_url``
(78-103: the normativa → candidatos-y-resultados URL rewrite and the
``IdGrupoEleccion`` hidden input), plus the ``__main__`` enrichment
(118-148: ``istr_value`` lookup, the ``istr`` request parameter
``{istr_value}{id_eleccion}@{id_group_eleccion}``, and ``n_level`` =
number of ``<select>`` cascades in ``div#CandidatosResultados``).

The HTTP session/token choreography carries no distributable
semantics; the PARSE + DERIVE steps do: a crawl lands the fetched
pages/responses in tables and every step here is a row-local string/
JSON expression (whole-stage codegen, no Python UDFs) plus one
equi-join per enrichment frame.

Deliberate divergences from the reference, documented:

* ``name_eleccion`` title-casing uppercases the first letter of each
  space-separated word (Python ``str.title()`` agrees for the
  alphabetic names that occur; ``title()``'s extra behavior after
  digits/apostrophes is not reproduced);
* when ``istr_value`` is NULL (a process missing from ``istr_map`` —
  the reference's ``dict.get`` returning None) the composed ``istr``
  is NULL rather than the literal ``"None…"`` Python f-string;
* a redirect/resultados row missing for an election yields NULL
  enrichment columns (the reference would raise on the missing HTTP
  response).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SELECT_PROC = r'(?s)<select[^>]*id="IdTipoProceso"[^>]*>(.*?)</select>'
_OPTION = r"(?s)<option[^>]*>(.*?)</option>"
_OPTION_VALUE = r'value="([^"]*)"'
_GRUPO_INPUT = r'<input[^>]*id="IdGrupoEleccion"[^>]*value="([^"]*)"'
_RESULTADOS_DIV = r'(?s)<div[^>]*id="CandidatosResultados"[^>]*>(.*?)</div>'

# 00_procesos_electorales_metadata.py:105-116 istr_ids / istr_map —
# the hardcoded process → istr request-prefix table.
ISTR_MAP = {
    "ELECCIONES PRESIDENCIALES": 1001,
    "ELECCIONES CONGRESALES": 5111,
    "ELECCIONES PARLAMENTO ANDINO": 1011,
    "ELECCIONES REGIONALES": 2001,
    "ELECCIONES MUNICIPALES PROVINCIALES": 3001,
    "ELECCIONES MUNICIPALES DISTRITALES": 4001,
    "ELECCIONES MUNICIPALES COMPLEMENTARIAS": 4001,
    "CONSULTA POPULAR DE REVOCATORIA DEL MANDATO DE AUTORIDADES"
    " MUNICIPALES": 4001,
    "REFERENDUM Y OTRAS CONSULTAS": 1001,
    "NUEVAS ELECCIONES MUNICIPALES": 4001,
}

_ELECCIONES_JSON_SCHEMA = (
    "STRUCT<Data: ARRAY<STRUCT<Text: STRING, Value: STRING>>>")


def title_words(c: Column) -> Column:
    """First letter of each space-separated word uppercased, rest
    lowercased — ``str.title()`` for alphabetic word lists, and
    expressible identically in DuckDB (list_transform + upper/substr
    on string_split)."""
    return F.array_join(
        F.transform(
            F.split(F.lower(c), " "),
            lambda w: F.concat(F.upper(w.substr(F.lit(1), F.lit(1))),
                               w.substr(F.lit(2), F.length(w)))),
        " ")


def proceso_options(pages: DataFrame,
                    html_col: str = "html") -> DataFrame:
    """One row per ``#IdTipoProceso`` dropdown option after the
    placeholder: (proceso_electoral = stripped option text,
    id_proceso = the value attribute, NULL when absent — the
    reference's ``option.get("value")``)."""
    options = F.regexp_extract_all(
        F.regexp_extract(F.col(html_col), _SELECT_PROC, 1),
        F.lit(r"(?s)<option[^>]*>.*?</option>"), 0)
    data = F.slice(options, 2,
                   F.greatest(F.size(options) - 1, F.lit(0)))
    return (
        pages.select(F.explode(data).alias("_opt"))
        .select(
            F.trim(F.regexp_replace(
                F.regexp_extract(F.col("_opt"), _OPTION, 1),
                r"<[^>]*>", "")).alias("proceso_electoral"),
            F.nullif(F.regexp_extract(F.col("_opt"), _OPTION_VALUE, 1),
                     F.lit("")).alias("id_proceso"))
    )


def elections_from_json(responses: DataFrame,
                        json_col: str = "json") -> DataFrame:
    """Explode one ``listar_elecciones`` JSON response per process
    into election rows: ``Data[1:]`` (the reference skips the
    placeholder entry), ``name_eleccion = Text.title()``,
    ``id_eleccion = Value``. Carries every non-JSON column of
    *responses* through (the reference's ``dict(**proc_electoral,…)``)."""
    carry = [c for c in responses.columns if c != json_col]
    parsed = responses.select(
        *carry,
        F.from_json(F.col(json_col), _ELECCIONES_JSON_SCHEMA)["Data"]
        .alias("_data"))
    data = F.slice(F.col("_data"), 2,
                   F.greatest(F.size("_data") - 1, F.lit(0)))
    return (
        parsed.select(*carry, F.explode(data).alias("_e"))
        .select(*carry,
                title_words(F.col("_e.Text")).alias("name_eleccion"),
                F.col("_e.Value").alias("id_eleccion"))
    )


def enrich_elections(elections: DataFrame, fichas: DataFrame,
                     base_url: str,
                     location_col: str = "location",
                     resultados_html_col: str = "resultados_html"
                     ) -> DataFrame:
    """Attach the per-election fetch derivations: *fichas* carries one
    row per election (id_eleccion, redirect Location header, fetched
    resultados page HTML) and contributes

    * ``url_redirect`` = base_url + Location with ``_normativa_``
      rewritten to ``_candidatos-y-resultados_`` (reference :91-94);
    * ``id_group_eleccion`` = the ``IdGrupoEleccion`` hidden input's
      value (reference :96-99);
    * ``n_level`` = number of ``<select>`` cascades inside
      ``div#CandidatosResultados`` (reference :144-146);
    * ``istr_value`` = ``ISTR_MAP.get(proceso_electoral)`` and
      ``istr`` = ``{istr_value}{id_eleccion}@{id_group_eleccion}``
      (reference :123, :139) — NULL istr when the lookup misses.

    One equi-join on id_eleccion; the istr map is a literal CASE —
    no shuffle beyond the join."""
    derived = fichas.select(
        "id_eleccion",
        F.concat(
            F.lit(base_url),
            F.regexp_replace(F.col(location_col), "_normativa_",
                             "_candidatos-y-resultados_"))
        .alias("url_redirect"),
        F.nullif(F.regexp_extract(F.col(resultados_html_col),
                                  _GRUPO_INPUT, 1),
                 F.lit("")).alias("id_group_eleccion"),
        (F.size(F.split(
            F.regexp_extract(F.col(resultados_html_col),
                             _RESULTADOS_DIV, 1),
            "<select")) - 1).cast("bigint").alias("n_level"),
    )
    istr_value = F.element_at(
        F.create_map(*[F.lit(x) for kv in ISTR_MAP.items()
                       for x in kv]),
        F.col("proceso_electoral")).cast("bigint")
    return (
        elections.join(derived, "id_eleccion", "left")
        .withColumn("istr_value", istr_value)
        .withColumn(
            "istr",
            F.concat(F.col("istr_value").cast("string"),
                     F.col("id_eleccion"), F.lit("@"),
                     F.col("id_group_eleccion")))
    )
