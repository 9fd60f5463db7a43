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

from typing import NamedTuple

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


# ---------------------------------------------------------------------------
# Multi-table normalization of one electoral-results response
# (reference ``procesar_respuesta``, perustats/infogob/utils.py:109-137)
# ---------------------------------------------------------------------------

# the response shape consumed by the reference's insert_* helpers
# (perustats/infogob/utils.py:17-91): one DatosGenerales header object
# plus an array of per-political-organization result rows
ELECTORAL_SCHEMA = (
    "struct<Estado: string, Data: struct<"
    "DatosGenerales: struct<NuVotosEmi: string, NuElectores: string, "
    "NuPorcPart: string, NuPorcAusen: string, TxPregunta: string>, "
    "Resultados: array<struct<IdExpediente: string, IdLocalidad: string, "
    "IdOrgPol: string, TxOrgPol: string, TxRutaOrgPol: string, "
    "TxRutaPlanGob: string, TxRutaSimbolo: string, NuOrgVotos: string, "
    "NuOrgPorc: string, TxArchivoPlanGob: string, TxMetodoHttp: string, "
    "TxTipoLink: string>>>>"
)

REQUEST_KEYS = ("id_eleccion", "id_group_eleccion", "id_location_req")


def _to_int(col: F.Column) -> F.Column:
    """Reference ``to_int`` (utils.py:1-6): strip thousands commas, trim,
    NULL on garbage (try_cast — ANSI-safe)."""
    return F.trim(F.regexp_replace(col, ",", "")).try_cast("bigint")


def _to_float(col: F.Column) -> F.Column:
    """Reference ``to_float`` (utils.py:9-14): strip a percent sign,
    trim, NULL on garbage."""
    return F.trim(F.regexp_replace(col, "%", "")).try_cast("double")


class NormalizedResponse(NamedTuple):
    """The three outputs of one normalization pass — all lazy plans over
    the SAME parsed scan, so Spark reads/parses each payload once per
    output it actually materializes."""

    header: DataFrame     # one row per successful response
    detail: DataFrame     # one row per (response, political org)
    processed: DataFrame  # request keys whose response succeeded


def normalize_electoral_response(
    df: DataFrame,
    json_col: str = "payload",
    keys: tuple[str, ...] = REQUEST_KEYS,
) -> NormalizedResponse:
    """Split nested electoral-result responses into the reference's two
    tables plus its processed flag, in one declarative pass.

    Mirrors ``procesar_respuesta`` (perustats/infogob/utils.py:109-137):
    the header row is ``insert_resultados_generales`` (utils.py:17-45),
    the exploded detail is ``insert_resultados_org_politica``
    (utils.py:48-91), and ``processed`` is the key set
    ``marcar_procesado_proc_electoral`` flips to 1 (utils.py:94-106).
    Where the reference RAISES on a non-success response mid-loop, a
    distributed pass can't abort per-row: non-success (or unparseable)
    responses simply never reach header/detail/processed, so
    ``pending_requests`` re-plans them — the same retry semantics the
    reference gets from its surrounding fetch loop.

    Scale: ``from_json`` with an explicit schema (no inference scan) +
    generator explode, all inside whole-stage codegen; no shuffle at
    all — a billion responses normalize embarrassingly parallel.
    """
    kc = [F.col(k) for k in keys]
    ok = (
        df.withColumn("_j", F.from_json(F.col(json_col), ELECTORAL_SCHEMA))
        .where(F.col("_j.Estado") == "success")
    )
    g = F.col("_j.Data.DatosGenerales")
    header = ok.select(
        *kc,
        _to_int(g["NuVotosEmi"]).alias("num_votos_emitidos"),
        _to_int(g["NuElectores"]).alias("num_electores"),
        _to_float(g["NuPorcPart"]).alias("num_percent_part"),
        _to_float(g["NuPorcAusen"]).alias("num_percent_ausen"),
        g["TxPregunta"].alias("txt_pregunta"),
    )
    r = F.explode(F.col("_j.Data.Resultados")).alias("_r")
    rc = F.col("_r")
    detail = ok.select(*kc, r).select(
        *kc,
        rc["IdExpediente"].alias("id_expediente"),
        rc["IdLocalidad"].alias("id_localidad"),
        rc["IdOrgPol"].alias("id_org_politica"),
        rc["TxOrgPol"].alias("name_org_politica"),
        rc["TxRutaOrgPol"].alias("url_org_politica"),
        rc["TxRutaPlanGob"].alias("url_ruta_plan_gobierno"),
        rc["TxRutaSimbolo"].alias("url_symbol"),
        _to_int(rc["NuOrgVotos"]).alias("num_votos"),
        _to_float(rc["NuOrgPorc"]).alias("num_porc"),
        rc["TxArchivoPlanGob"].alias("url_archivo_plan_gob"),
        rc["TxMetodoHttp"].alias("method_http"),
        rc["TxTipoLink"].alias("tipo_link_plan"),
    )
    processed = ok.select(*kc).distinct()
    return NormalizedResponse(header, detail, processed)


# ---------------------------------------------------------------------------
# Candidates-by-election normalization
# (reference ``post_result``, perustats/infogob/21_candidatos_by_eleccion.py)
# ---------------------------------------------------------------------------

# the reference requests candidates per expediente with a 4-part key
# pulled from resultados_by_org_politica (21_candidatos_by_eleccion.py:
# 50-71) and appends the response rows to ``eleccion_candidatos``
CANDIDATE_KEYS = (
    "id_eleccion", "id_location_req", "id_group_eleccion", "id_expediente",
)

# the candidates response shape: ``r.json().get("Data", [])`` — a bare
# array of candidate objects (21_candidatos_by_eleccion.py:43)
CANDIDATES_SCHEMA = (
    "struct<Data: array<struct<TxOrgPol: string, TxCandidato: string, "
    "TxRutaPolitico: string, TxRutaFoto: string, TxEstadoCand: string, "
    "TxCargo: string, TxCargoElecto: string, TxRutaSimbolo: string, "
    "TxRutaOrgPol: string, NuVotosCand: string>>>"
)


def normalize_candidates(
    df: DataFrame,
    json_col: str = "payload",
    keys: tuple[str, ...] = CANDIDATE_KEYS,
) -> DataFrame:
    """Explode candidates responses into ``eleccion_candidatos`` rows.

    Mirrors ``post_result`` (perustats/infogob/
    21_candidatos_by_eleccion.py:34-47): every candidate object in the
    response's ``Data`` array becomes one row carrying the full 4-part
    request key (the reference's ``{**row, **cand}`` context merge),
    with the reference's ``rename_map`` (:20-31) applied. ``NuVotosCand``
    gets the repo-wide ``to_int`` coercion for ``Nu*`` count columns
    (thousands commas → NULL-safe bigint). Empty ``Data`` arrays and
    malformed payloads yield no rows — exactly the responses the
    reference's append loop silently skips, so they stay pending.

    Scale: explicit-schema ``from_json`` + generator explode, fully
    inside whole-stage codegen, zero shuffles — a billion responses
    normalize embarrassingly parallel.
    """
    kc = [F.col(k) for k in keys]
    parsed = df.withColumn("_j", F.from_json(F.col(json_col), CANDIDATES_SCHEMA))
    c = F.col("_c")
    return parsed.select(*kc, F.explode("_j.Data").alias("_c")).select(
        *kc,
        c["TxOrgPol"].alias("name_org_politica"),
        c["TxCandidato"].alias("name_candidato"),
        c["TxRutaPolitico"].alias("url_politico"),
        c["TxRutaFoto"].alias("url_foto_candidato"),
        c["TxEstadoCand"].alias("estado_candidatura"),
        c["TxCargo"].alias("cargo_postula"),
        c["TxCargoElecto"].alias("cargo_electo"),
        c["TxRutaSimbolo"].alias("url_simbolo_org_politica"),
        c["TxRutaOrgPol"].alias("url_org_politica"),
        _to_int(c["NuVotosCand"]).alias("num_votos_candidato"),
    )


# ---------------------------------------------------------------------------
# Candidate-detail link rollup
# (reference ``get_info_politico``, perustats/infogob/
# 40_candidato_details.py:22-42)
# ---------------------------------------------------------------------------

# the parsed detail payload: the reference scrapes the politician page
# into hoja-de-vida / plan-de-gobierno link lists and keeps their counts
# (40_candidato_details.py:36-41); HTML parsing is out of scope, so the
# operator consumes the already-parsed link arrays
CANDIDATE_DETAIL_SCHEMA = (
    "struct<hojas_vida: array<struct<href: string, name_file: string>>, "
    "planes_gobierno: array<struct<href: string, nombre: string>>>"
)


def candidate_detail_counts(
    df: DataFrame,
    json_col: str = "payload",
    key: str = "url_politico",
) -> DataFrame:
    """Per-candidate hoja-vida / plan-gobierno link counts.

    Mirrors ``get_info_politico`` (perustats/infogob/
    40_candidato_details.py:34-41): ``num_hojas_vida`` /
    ``num_planes_gobierno`` are the lengths of the two link lists; a
    missing or NULL section counts 0, like ``len([])`` on a page with no
    list. Narrow no-shuffle plan — one parse per row."""
    j = F.from_json(F.col(json_col), CANDIDATE_DETAIL_SCHEMA)

    def _count(arr: F.Column) -> F.Column:
        # explicit NULL branch: size(NULL) is NULL under ANSI but -1
        # under legacy sizeOfNull — pin 0 under either session posture
        return F.when(arr.isNull(), F.lit(0)).otherwise(F.size(arr))

    return df.select(
        F.col(key),
        _count(j["hojas_vida"]).alias("num_hojas_vida"),
        _count(j["planes_gobierno"]).alias("num_planes_gobierno"),
    )


def pending_requests(
    requests: DataFrame,
    processed: DataFrame,
    keys: tuple[str, ...] = REQUEST_KEYS,
) -> DataFrame:
    """Requests whose response was never successfully processed — the
    anti-join the reference expresses as ``WHERE procesado = 0``
    (perustats/infogob/utils.py:94-106 flips the flag; the fetch loop
    selects the unflipped rows). Same shape as ``cache_missing_codes``.

    The processed key set is NOT hinted: it grows with the request log,
    so AQE decides (broadcast while small, shuffled anti-join at scale
    on the compact key columns)."""
    return requests.join(processed.select(*keys), on=list(keys), how="left_anti")
