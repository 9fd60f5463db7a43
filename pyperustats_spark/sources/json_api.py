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
