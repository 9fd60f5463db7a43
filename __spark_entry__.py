"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL. Double-typed outputs are rounded identically
on both sides (ROUND to a fixed number of decimals) so order-insensitive
value hashes match despite floating-point summation-order differences
between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyperustats_spark.operators import dedup as D
from pyperustats_spark.operators import events as E
from pyperustats_spark.operators import layout as LAY
from pyperustats_spark.operators import relational as R
from pyperustats_spark.operators import similarity as S
from pyperustats_spark.operators import textops as T
from pyperustats_spark.operators import timeseries as TS
from pyperustats_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _round(df: DataFrame, spec: dict[str, int]) -> DataFrame:
    for col, digits in spec.items():
        df = df.withColumn(col, F.round(F.col(col), digits))
    return df


def _lt(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


CLEAN_ROWS = [
    (1, "3,400,841.50"),
    (2, "1,200"),
    (3, "abc"),
    (4, "850,300.00"),
    (5, "12.5"),
    (6, ""),
    (7, "1,2,3"),
    (8, "2,500,100.75"),
    (9, "5.2%"),
    (10, "-3.4"),
    (11, "1,250.5%"),
    (12, "12%%"),
]

VALIDATE_CODES = [1, 2, 3, 150, 199, 100000, 999999]

# synthetic API payloads in the reference's response shape
# (config.series[].name + periods[].values) incl. "n.d." gaps and
# out-of-order periods
JSON_PAYLOADS = [
    (1, '{"config": {"series": [{"name": "PN01288PM"}, {"name": "PN01289PM"}]},'
        ' "periods": [{"name": "Ene.2023", "values": ["4.25", "102.3"]},'
        ' {"name": "Feb.2023", "values": ["n.d.", "103.1"]},'
        ' {"name": "Mar.2023", "values": ["4.75", "n.d."]}]}'),
    (2, '{"config": {"series": [{"name": "PN00015MM"}]},'
        ' "periods": [{"name": "Dic.2022", "values": ["-1.5"]},'
        ' {"name": "Set.2022", "values": ["0.82"]}]}'),
]

# accent/case/punctuation variants of canonical location-style names —
# the reference's infogob location canonicalization flow (strip accents,
# uppercase, alnum-only, per-key most-common)
ACCENT_ROWS = [
    (1, 101, "  Cañete—Sur  "),
    (2, 101, "CANETE SUR"),
    (3, 101, "cañete sur"),
    (4, 101, "Cañete Sur!"),
    (5, 101, "Canete/sur 2"),
    (6, 102, "San José de Río"),
    (7, 102, "SAN JOSE DE RIO"),
    (8, 102, "san jose de río"),
    (9, 103, "Máncora–Norte"),
    (10, 103, "mancora  norte"),
    (11, 103, "MÁNCORA NORTE?"),
    (12, 104, "Über-Längen äöü"),
    (13, 104, "çédille Ça-Va"),
    (14, None, "Sin región"),
]
MISSING_CODE_REQ = ["AF", "NO", "XX", "ZZ"]
KNN_QUERY_IDS = [0, 7, 42, 99, 123]

# electoral-result responses in the reference's procesar_respuesta shape
# (infogob/utils.py:109-137): Estado + Data.DatosGenerales header +
# Data.Resultados org array. Edge cases: thousands commas, % suffixes,
# missing fields, a non-success response, an empty org array, and a
# malformed payload — the last two must yield header-without-detail and
# nothing at all, respectively.
ELECTORAL_PAYLOADS = [
    (2021, 1, 101,
     '{"Estado": "success", "Data": {"DatosGenerales": {'
     '"NuVotosEmi": "18,234,456", "NuElectores": "25,287,954", '
     '"NuPorcPart": "72.11%", "NuPorcAusen": "27.89%", '
     '"TxPregunta": null}, "Resultados": ['
     '{"IdExpediente": "E-1", "IdLocalidad": "140100", "IdOrgPol": "2731", '
     '"TxOrgPol": "Partido A", "TxRutaOrgPol": "/org/2731", '
     '"TxRutaPlanGob": "/plan/2731", "TxRutaSimbolo": "/sym/2731.png", '
     '"NuOrgVotos": "8,835,579", "NuOrgPorc": "50.12", '
     '"TxArchivoPlanGob": "plan2731.pdf", "TxMetodoHttp": "GET", '
     '"TxTipoLink": "pdf"}, '
     '{"IdExpediente": "E-1", "IdLocalidad": "140100", "IdOrgPol": "2840", '
     '"TxOrgPol": "Partido B", "TxRutaOrgPol": "/org/2840", '
     '"TxRutaPlanGob": null, "TxRutaSimbolo": null, '
     '"NuOrgVotos": "8,792,117", "NuOrgPorc": "49.88%", '
     '"TxArchivoPlanGob": null, "TxMetodoHttp": "POST", '
     '"TxTipoLink": "web"}]}}'),
    (2021, 1, 102,
     '{"Estado": "success", "Data": {"DatosGenerales": {'
     '"NuVotosEmi": "543", "NuElectores": "1,021", '
     '"NuPorcPart": "53.18", "NuPorcAusen": "46.82", '
     '"TxPregunta": "¿Aprueba usted la reforma?"}, "Resultados": ['
     '{"IdExpediente": "E-2", "IdLocalidad": "150101", "IdOrgPol": "77", '
     '"TxOrgPol": "Movimiento C", "NuOrgVotos": "543", '
     '"NuOrgPorc": "100"}]}}'),
    (2021, 1, 103,
     '{"Estado": "error", "Data": {"DatosGenerales": {'
     '"NuVotosEmi": "1", "NuElectores": "2"}, "Resultados": []}}'),
    (2022, 2, 101,
     '{"Estado": "success", "Data": {"DatosGenerales": {'
     '"NuVotosEmi": "99", "NuElectores": "100", "NuPorcPart": "99", '
     '"NuPorcAusen": "1", "TxPregunta": "Sin candidatos"}, '
     '"Resultados": []}}'),
    (2022, 2, 102, '{"Estado": "succ'),  # truncated/malformed payload
]

# the request log the fetch loop plans from: every payload key above
# plus one request that never got a response at all
ELECTORAL_REQUESTS = sorted(
    {(e, g, l) for (e, g, l, _) in ELECTORAL_PAYLOADS} | {(2022, 2, 103)}
)

# candidates responses in the reference's ListarDatosCandidatos shape
# (infogob/21_candidatos_by_eleccion.py:43): {"Data": [candidate objs]},
# keyed by the 4-part request key pulled from resultados_by_org_politica.
# Edge cases: thousands commas and "n.d." votes, null fields, an empty
# Data array (the reference appends nothing → the key stays pending),
# and a malformed payload.
CANDIDATE_PAYLOADS = [
    (2021, 101, 1, "E-1",
     '{"Data": ['
     '{"TxOrgPol": "Partido A", "TxCandidato": "ANA LUCIA TORRES", '
     '"TxRutaPolitico": "/politico/partidario_11", '
     '"TxRutaFoto": "/foto/11.jpg", "TxEstadoCand": "INSCRITO", '
     '"TxCargo": "PRESIDENTE DE LA REPUBLICA", "TxCargoElecto": null, '
     '"TxRutaSimbolo": "/sym/2731.png", "TxRutaOrgPol": "/org/2731", '
     '"NuVotosCand": "8,835,579"}, '
     '{"TxOrgPol": "Partido B", "TxCandidato": "JOSE PEREZ ROJAS", '
     '"TxRutaPolitico": "/politico/partidario_22", '
     '"TxRutaFoto": null, "TxEstadoCand": "EXCLUIDO", '
     '"TxCargo": "PRESIDENTE DE LA REPUBLICA", '
     '"TxCargoElecto": "PRESIDENTE", "TxRutaSimbolo": null, '
     '"TxRutaOrgPol": "/org/2840", "NuVotosCand": "n.d."}]}'),
    (2021, 102, 1, "E-2", '{"Data": []}'),
    (2022, 101, 2, "E-9",
     '{"Data": [{"TxOrgPol": "Movimiento C", "TxCandidato": "ROSA QUISPE", '
     '"TxRutaPolitico": "/politico/partidario_33", '
     '"TxRutaFoto": "/foto/33.jpg", "TxEstadoCand": "INSCRITO", '
     '"TxCargo": "ALCALDE", "TxCargoElecto": "ALCALDE", '
     '"TxRutaSimbolo": "/sym/77.png", "TxRutaOrgPol": "/org/77", '
     '"NuVotosCand": "543"}]}'),
    (2022, 102, 2, "E-10", '{"Data": ['),  # truncated/malformed payload
]

# political orgs already scraped into org_politica — the done set the
# org fetch loop excludes (infogob/30_organizaciones_politicas.py:34-50)
ORG_DONE = ["/org/2731"]

# benchmark/eval snippets for decontamination: one phrase drawn from the
# synthetic corpus vocabulary (real 5-gram hits) and one from outside it
# (zero hits) — parity holds for any hit count, the fixture just makes
# both branches non-trivial
EVAL_SNIPPETS = [
    (1, "batch batch batch stream spark window window dup"),
    (2, "quick brown foxes jump over lazy benchmark sentences"),
]

# target mixture weights per source (sources absent keep 0)
SOURCE_MIX = {"src0": 1.0, "src1": 0.5, "src2": 0.1, "src3": 0.0}

# parsed politician detail pages (infogob/40_candidato_details.py:34-41):
# hoja-de-vida / plan-de-gobierno link lists, incl. an empty page, a page
# missing one section, and an unparseable page (all → count 0)
CANDIDATE_DETAIL_PAYLOADS = [
    ("/politico/partidario_11",
     '{"hojas_vida": [{"href": "/hv/1", "name_file": "HV 2021"}, '
     '{"href": "/hv/2", "name_file": "HV 2016"}], '
     '"planes_gobierno": [{"href": "/pg/1", "nombre": "Plan 2021"}]}'),
    ("/politico/partidario_22",
     '{"hojas_vida": [], "planes_gobierno": []}'),
    ("/politico/partidario_33",
     '{"hojas_vida": [{"href": "/hv/3", "name_file": "HV"}]}'),
    ("/politico/partidario_44", "not-json"),
]


# INEI module inventory + already-resolved tri-state flag events
# (inei/utils/db_utils.py:20-44): one all-done module, partial modules
# at each stage, a reset tombstone (done=0), and an out-of-order flag
# (organized without downloaded) that must NOT skip earlier stages
INEI_MODULES = [
    ("enaho", 2022, "0100"),
    ("enaho", 2022, "0200"),
    ("enaho", 2022, "0300"),
    ("enaho", 2023, "0100"),
    ("enaho", 2023, "0200"),
    ("endes", 2023, "0411"),
]
INEI_STAGE_EVENTS = [
    ("enaho", 2022, "0100", "downloaded", 1),
    ("enaho", 2022, "0100", "unzipped", 1),
    ("enaho", 2022, "0100", "organized", 1),
    ("enaho", 2022, "0200", "downloaded", 1),
    ("enaho", 2022, "0200", "unzipped", 1),
    ("enaho", 2022, "0300", "downloaded", 1),
    ("enaho", 2023, "0200", "downloaded", 0),
    ("endes", 2023, "0411", "organized", 1),
]
INEI_KEYS = ["survey", "year", "module_code"]

# 3-level location tree + district-grain results (infogob
# 10_locations_ids.py builds region->provincia->distrito level by level)
LOC_REGIONS = [(1, "LIMA"), (2, "CUSCO")]
LOC_PROVINCES = [(11, "LIMA", 1), (12, "HUARAL", 1), (21, "CUSCO", 2)]
LOC_DISTRICTS = [(111, "MIRAFLORES", 11), (112, "SAN ISIDRO", 11),
                 (121, "CHANCAY", 12), (211, "WANCHAQ", 21),
                 (212, "SAN JERONIMO", 21)]
LOC_RESULTS = [
    (111, "2731", 1500), (111, "2840", 900),
    (112, "2731", 700), (121, "2731", 300), (121, "2840", 450),
    (211, "77", 2000), (212, "77", 100), (212, "2731", 50),
]


def _electoral_frames(spark):
    from pyperustats_spark.sources.json_api import normalize_electoral_response

    raw = spark.createDataFrame(
        ELECTORAL_PAYLOADS,
        "id_eleccion int, id_group_eleccion int, id_location_req int, "
        "payload string")
    return normalize_electoral_response(raw)

# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark, sf_dir):
    df = R.pricing_summary(_lt(spark, sf_dir, "lineitem"))
    # sum_charge is already decimal-rounded inside the operator
    return _round(df, {"sum_qty": 4, "sum_base_price": 4, "sum_disc_price": 4,
                       "avg_qty": 6, "avg_price": 6, "avg_disc": 6})


def q3_shipping_priority(spark, sf_dir):
    df = R.shipping_priority(
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "orders"),
        _lt(spark, sf_dir, "lineitem"))
    return _round(df, {"revenue": 4})


def q5_local_supplier_volume(spark, sf_dir):
    df = R.local_supplier_volume(
        _lt(spark, sf_dir, "region"), _lt(spark, sf_dir, "nation"),
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "supplier"),
        _lt(spark, sf_dir, "orders"), _lt(spark, sf_dir, "lineitem"))
    return _round(df, {"revenue": 4})


def q6_revenue_delta(spark, sf_dir):
    return _round(R.revenue_delta(_lt(spark, sf_dir, "lineitem")), {"revenue": 4})


def q_market_share(spark, sf_dir):
    df = R.market_share(
        _lt(spark, sf_dir, "region"), _lt(spark, sf_dir, "nation"),
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "orders"))
    return _round(df, {"nation_revenue": 4, "share": 6})


def q_top_customers(spark, sf_dir):
    df = R.top_customers(
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "orders"),
        _lt(spark, sf_dir, "nation"))
    return _round(df, {"revenue": 4})


def catalog_search(spark, sf_dir):
    return R.catalog_search(_lt(spark, sf_dir, "part"), "red")


def catalog_validate_codes(spark, sf_dir):
    req = spark.createDataFrame([(c,) for c in VALIDATE_CODES], "code bigint")
    return R.catalog_validate_codes(_lt(spark, sf_dir, "part"), req)


def catalog_active_filter(spark, sf_dir):
    return R.catalog_active_filter(_lt(spark, sf_dir, "orders"))


def catalog_freq_counts(spark, sf_dir):
    return R.catalog_freq_counts(_lt(spark, sf_dir, "part"))


def clean_numeric_cast(spark, sf_dir):
    raw = spark.createDataFrame(CLEAN_ROWS, "id int, raw string")
    return R.clean_numeric_cast(raw)


def text_clean_accents(spark, sf_dir):
    from pyperustats_spark.functions.text import clean_text_es, strip_accents

    raw = spark.createDataFrame(
        ACCENT_ROWS, "id int, location_id int, raw string")
    return raw.select(
        "id", "location_id", "raw",
        strip_accents(F.col("raw")).alias("no_accents"),
        clean_text_es(F.col("raw")).alias("cleaned"),
    ).orderBy("id")


def infogob_location_canonical(spark, sf_dir):
    from pyperustats_spark.functions.text import clean_text_es

    raw = spark.createDataFrame(
        ACCENT_ROWS, "id int, location_id int, raw string")
    cleaned = raw.select(
        "location_id", clean_text_es(F.col("raw")).alias("name"))
    df = R.most_common_by_group(
        cleaned, ["location_id"], "name", out_col="canonical_name")
    return df.orderBy(F.col("location_id").asc_nulls_last())


def mode_status_by_customer(spark, sf_dir):
    df = R.most_common_by_group(
        _lt(spark, sf_dir, "orders"), ["o_custkey"], "o_orderstatus",
        out_col="mode_status")
    return df.orderBy("o_custkey")


FORMAT_ROWS = [
    (1, "2023-06-15", "D"), (2, "2023-06-15", "M"), (3, "2023-06-15", "Q"),
    (4, "2023-06-15", "A"), (5, "2021-12-31", "Q"), (6, "2020-01-01", "M"),
    (7, "1999-02-28", "D"), (8, "2024-10-07", "A"), (9, "2022-04-01", "Q"),
    (10, "2021-07-04", "M"),
]


def ts_format_period(spark, sf_dir):
    from pyperustats_spark.functions.dates import format_period

    raw = spark.createDataFrame(FORMAT_ROWS, "id int, d string, freq string")
    ts = F.col("d").cast("timestamp")
    out = raw.select(
        "id", "d", "freq",
        F.when(F.col("freq") == "D", format_period(ts, "D"))
         .when(F.col("freq") == "M", format_period(ts, "M"))
         .when(F.col("freq") == "Q", format_period(ts, "Q"))
         .otherwise(format_period(ts, "A")).alias("period"))
    return out.orderBy("id")


def json_api_observations(spark, sf_dir):
    from pyperustats_spark.sources.json_api import json_observations

    raw = spark.createDataFrame(JSON_PAYLOADS, "rid int, payload string")
    df = json_observations(raw, "payload", freq="M", keep=["rid"])
    return df.orderBy("rid", "date", "code")


def infogob_normalize_header(spark, sf_dir):
    return _electoral_frames(spark).header.orderBy(
        "id_eleccion", "id_group_eleccion", "id_location_req")


def infogob_normalize_detail(spark, sf_dir):
    return _electoral_frames(spark).detail.orderBy(
        "id_eleccion", "id_group_eleccion", "id_location_req",
        "id_org_politica")


def infogob_participation(spark, sf_dir):
    """Participation/absenteeism per nation: electors = customers,
    emitted = customers with ≥1 order in the window (a real
    ratio-of-sums over SF-proportional tables, not a toy frame)."""
    customer = _lt(spark, sf_dir, "customer")
    orders = _lt(spark, sf_dir, "orders")
    nation = _lt(spark, sf_dir, "nation")
    voters = (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
        .select("o_custkey").distinct()
    )
    base = (
        customer.select("c_custkey", "c_nationkey")
        .join(nation.select("n_nationkey", "n_name"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(voters.withColumn("_voted", F.lit(1)),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .select("n_name",
                F.coalesce(F.col("_voted"), F.lit(0)).alias("emitted"),
                F.lit(1).alias("electors"))
    )
    return R.participation_metrics(base, ["n_name"]).orderBy("n_name")


def _loc_frames(spark):
    regions = spark.createDataFrame(LOC_REGIONS, "id_region int, region string")
    provinces = spark.createDataFrame(
        LOC_PROVINCES, "id_provincia int, provincia string, id_region int")
    districts = spark.createDataFrame(
        LOC_DISTRICTS, "id_distrito int, distrito string, id_provincia int")
    return regions, provinces, districts


def infogob_location_hierarchy(spark, sf_dir):
    flat = R.location_hierarchy_flatten(*_loc_frames(spark))
    return flat.orderBy("id_distrito")


def infogob_results_by_region(spark, sf_dir):
    flat = R.location_hierarchy_flatten(*_loc_frames(spark))
    results = spark.createDataFrame(
        LOC_RESULTS, "id_distrito int, id_org_politica string, num_votos int")
    return R.results_by_location_level(results, flat, "region").orderBy(
        "id_region")


def inei_module_listing(spark, sf_dir):
    """Round-trip proof of the INEI module-listing normalizer
    (sources/html_listing.py, the reference html_to_dataframe port):
    synthesize a portal page row-locally from the nation dim — every
    reference branch exercised (markup inside text cells, non-numeric
    year -> NULL, missing info link, title- vs href-classified format
    links, non-matching links) — parse it back with the real regex
    pipeline, and let the oracle state the expected records DIRECTLY
    from nation. A parser bug anywhere breaks value parity."""
    from pyperustats_spark.sources.html_listing import module_listing

    k = F.col("n_nationkey")
    ks = k.cast("string")

    def td(c):
        return F.concat(F.lit("<td>"), c, F.lit("</td>"))

    year_txt = F.when(k % 5 == 0, F.lit("n/a")) \
        .otherwise((k + 2000).cast("string"))
    info = F.when(
        k % 3 != 0,
        F.concat(F.lit('<a href="/doc/'), ks, F.lit('">ficha</a>'))
    ).otherwise(F.lit("<span>-</span>"))
    c_spss = F.when(
        k % 2 == 0,
        F.concat(F.lit('<a title="Descarga SPSS" href="/files/'), ks,
                 F.lit('.sav">d</a>'))
    ).otherwise(F.lit('<a title="zip archive" href="/misc/x.zip">d</a>'))
    c_stata = F.when(
        k % 4 == 1,
        F.concat(F.lit('<a href="/files/STATA/'), ks,
                 F.lit('.dta">d</a>'))
    ).otherwise(F.lit(""))
    c_csv = F.concat(F.lit('<a href="/files/CSV/'), ks,
                     F.lit('.csv">d</a>'))
    row = F.concat(
        F.lit("<tr>"), td(ks), td(year_txt), td(F.lit("Anual")),
        td(F.lit("ENAHO")),
        td(F.concat(F.lit("<b>"), F.col("n_name"), F.lit("</b>"))),
        td((k + 100).cast("string")),
        td(F.concat(F.lit("Modulo "), F.col("n_name"))),
        td(info), td(c_spss), td(c_stata), td(c_csv), F.lit("</tr>"))
    page = (
        _lt(spark, sf_dir, "nation")
        .select(F.struct(k.alias("k"), row.alias("r")).alias("_s"))
        .agg(F.concat(
            F.lit('<html><table class="outer"><tr><td>chrome</td></tr>'
                  "<table><tr><th>No</th></tr>"),
            F.array_join(F.transform(
                F.array_sort(F.collect_list("_s")), lambda s: s["r"]),
                ""),
            F.lit("</table></table></html>")).alias("html"))
    )
    return module_listing(page, id_cols=()).orderBy("number")


def bcrp_catalog_listing(spark, sf_dir):
    """Round-trip proof of the BCRP catalogue-page normalizer
    (sources/bcrp_catalog.py — the reference _scrape_metadata/
    _parse_series_table port, perustats/BCRP/metadata.py:48-141):
    synthesize the four frequency pages row-locally from the nation
    dim — every reference branch exercised (messy whitespace + the
    '- (N series)' h2 suffix, sections without a fuente paragraph
    (source NULL), an empty dropdown section (skipped), rows without
    a code link (code/url NULL) or description link (NULL), markup
    inside description text) — parse them back with the real regex
    pipeline, and let the oracle state the expected catalogue rows
    DIRECTLY from nation. A parser bug anywhere breaks value parity."""
    from pyperustats_spark.sources.bcrp_catalog import (
        FREQ_WEB_MAP, catalog_listing)

    k = F.col("n_nationkey")
    ks = k.cast("string")
    r = F.col("n_regionkey")
    rs = r.cast("string")

    def td(c):
        return F.concat(F.lit("<td>"), c, F.lit("</td>"))

    code_txt = F.concat(F.lit("PN"), ks, F.col("_fc"))
    code_a = F.when(
        k % 7 != 3,
        F.concat(F.lit('<a href="/series/'), code_txt, F.lit('">'),
                 code_txt, F.lit("</a>"))
    ).otherwise(F.lit("<span>x</span>"))
    desc_a = F.when(
        k % 5 != 4,
        F.concat(F.lit('<a href="#"><b>'), F.col("n_name"),
                 F.lit("</b>  series</a>"))
    ).otherwise(F.lit("sin enlace"))
    fin = F.when(k % 2 == 0, F.lit("2024")).otherwise(F.lit("n/a"))
    row = F.concat(
        F.lit("<tr>"), td(ks), td(code_a), td(desc_a),
        td(F.lit(" 1990 ")), td(fin),
        td(F.lit("  12  - Ene -  2024 ")), F.lit("</tr>"))

    labeled = (
        _lt(spark, sf_dir, "nation")
        .select(
            "n_nationkey", "n_name", "n_regionkey",
            F.explode(F.array(*[
                F.struct(F.lit(lbl).alias("l"), F.lit(c).alias("c"))
                for lbl, c in FREQ_WEB_MAP.items()])).alias("_f"))
        .select("n_nationkey", "n_name", "n_regionkey",
                F.col("_f.l").alias("_fl"), F.col("_f.c").alias("_fc"))
    )
    fuente = F.when(
        r % 2 == 0,
        F.concat(F.lit('<p class="fuente">Fuente: BCRP area '), rs,
                 F.lit("</p>"))
    ).otherwise(F.lit(""))
    section_rows = (
        labeled
        .select("_fl", "n_regionkey",
                F.struct(k.alias("k"), row.alias("r")).alias("_s"))
        .groupBy("_fl", "n_regionkey")
        .agg(F.array_join(F.transform(
            F.array_sort(F.collect_list("_s")), lambda s: s["r"]), "")
            .alias("_rows"))
        .select(
            "_fl", "n_regionkey",
            F.struct(
                F.col("n_regionkey").alias("r"),
                F.concat(
                    F.lit('<div class="tcg-elevator"><h2>  Grupo   R'),
                    F.col("n_regionkey").cast("string"),
                    F.lit("  - (3 series) anexo </h2>"), fuente,
                    F.lit('<table class="series"><tr><th>Codigo</th>'
                          "</tr>"),
                    F.col("_rows"),
                    F.lit("</table></div>")).alias("h")).alias("_sec"))
    )
    pages = (
        section_rows.groupBy("_fl")
        .agg(F.concat(
            F.lit('<html><body><div class="tcg-elevator">'
                  "<h2>Seccion vacia</h2></div>"),
            F.array_join(F.transform(
                F.array_sort(F.collect_list("_sec")),
                lambda s: s["h"]), ""),
            F.lit("</body></html>")).alias("html"))
        .select(F.col("_fl").alias("freq_label"), "html")
    )
    return catalog_listing(pages).orderBy(
        "freq_label", "group", "fecha_fin", "code")


def infogob_proceso_elections(spark, sf_dir):
    """Round-trip proof of the electoral-process metadata normalizer
    (sources/infogob_procesos.py — the reference
    00_procesos_electorales_metadata.py port): synthesize the
    pre-fetched inputs from region/nation — the #IdTipoProceso
    options page (placeholder skipped, one process per region, one
    name missing from istr_map), the per-process listar_elecciones
    JSON (placeholder entry skipped, names lowercased to exercise
    title-casing), and the per-election ficha responses (redirect
    Location + resultados page with the IdGrupoEleccion input and a
    varying <select> cascade count) — run the real option-parse →
    JSON-explode → enrich pipeline, and let the oracle state the
    expected table DIRECTLY from nation arithmetic."""
    from pyperustats_spark.sources.infogob_procesos import (
        elections_from_json, enrich_elections, proceso_options)

    k = F.col("n_nationkey")
    r = F.col("n_regionkey")
    proc_name = (
        F.when(r == 0, F.lit("ELECCIONES PRESIDENCIALES"))
        .when(r == 1, F.lit("ELECCIONES CONGRESALES"))
        .when(r == 2, F.lit("ELECCIONES REGIONALES"))
        .when(r == 3, F.lit("ELECCIONES MUNICIPALES DISTRITALES"))
        .otherwise(F.lit("PROCESO DESCONOCIDO")))

    nation = _lt(spark, sf_dir, "nation")
    region_procs = (
        nation.select("n_regionkey").distinct()
        .select(
            "n_regionkey",
            F.struct(
                F.col("n_regionkey").alias("r"),
                F.concat(
                    F.lit('<option value="P'),
                    F.col("n_regionkey").cast("string"), F.lit('"> '),
                    proc_name,
                    F.lit(" </option>")).alias("h")).alias("_o"))
    )
    page = region_procs.agg(F.concat(
        F.lit('<html><select id="IdTipoProceso">'
              '<option value="">Seleccione</option>'),
        F.array_join(F.transform(
            F.array_sort(F.collect_list("_o")), lambda s: s["h"]), ""),
        F.lit("</select></html>")).alias("html"))
    procs = proceso_options(page)

    entry_ = F.struct(
        F.lower(F.col("n_name")).alias("Text"),
        (k + 100).cast("string").alias("Value"))
    json_by_region = (
        nation.select("n_regionkey",
                      F.struct(k.alias("k"), entry_.alias("e"))
                      .alias("_s"))
        .groupBy("n_regionkey")
        .agg(F.to_json(F.struct(
            F.concat(
                F.array(F.struct(F.lit("Seleccione").alias("Text"),
                                 F.lit("").alias("Value"))),
                F.transform(F.array_sort(F.collect_list("_s")),
                            lambda s: s["e"])).alias("Data")))
            .alias("json"))
        .select(F.concat(F.lit("P"),
                         F.col("n_regionkey").cast("string"))
                .alias("id_proceso"), "json")
    )
    responses = procs.join(json_by_region, "id_proceso")
    elections = elections_from_json(responses)

    fichas = nation.select(
        (k + 100).cast("string").alias("id_eleccion"),
        F.concat(F.lit("/Eleccion/_normativa_/ficha"),
                 (k + 100).cast("string")).alias("location"),
        F.concat(
            F.lit('<html><input type="hidden" id="IdGrupoEleccion" '
                  'value="G'),
            (k * 7).cast("string"), F.lit('"/>'),
            F.lit('<div id="CandidatosResultados">'),
            F.repeat(F.lit('<select class="c"></select>'),
                     (F.lit(1) + k % 3).cast("int")),
            F.lit("</div></html>")).alias("resultados_html"))
    out = enrich_elections(elections, fichas,
                           base_url="https://infogob.jne.pe")
    return out.select(
        "id_proceso", "proceso_electoral", "name_eleccion",
        "id_eleccion", "url_redirect", "id_group_eleccion", "n_level",
        "istr_value", "istr").orderBy("id_proceso", "id_eleccion")


def _affiliation_ficha_pages(cust):
    """Synthesize one pre-fetched HistorialPartidario ficha page per
    customer from pure key arithmetic — the contract the affiliation
    oracles restate directly. k%2==0 plants a leading 'Afiliación
    Vigente' section; k%3 'Historial de Afiliaciones' sections follow
    (so odd keys with k%3==0 yield an empty container — zero rows).
    Per section j the org block cycles absent → no-anchor →
    no-data-val → full on (k+j) mod classes, an 'Estado' etiqueta
    loses its control span on (k+j)%13==0 (the reference's continue),
    values carry nested tags (get_text-parity through
    strip_tags_text), and the label keeps its accents (folding
    exercise). All HTML is built by row-local concat/transform —
    whole-stage codegen, no Python."""
    k = F.col("c_custkey").cast("bigint")
    n_sections = (F.when(k % 2 == 0, F.lit(1)).otherwise(F.lit(0))
                  + k % 3).cast("int")

    def sec(j):
        vig = (k % 2 == 0) & (j == 0)
        m = ((k * 3 + j) % 20).cast("string")
        x = ((k * 5 + j) % 100).cast("string")
        org = (
            F.when((k + j) % 7 == 0, F.lit(""))
            .when((k + j) % 11 == 0, F.concat(
                F.lit('<span class="linkOrgPol" data-val="OP'), m,
                F.lit('">sin enlace</span>')))
            .when((k + j) % 5 == 0, F.concat(
                F.lit('<span class="linkOrgPol"><a href="/Org/ficha'),
                m, F.lit('">Partido '), m, F.lit("</a></span>")))
            .otherwise(F.concat(
                F.lit('<span class="linkOrgPol" data-val="OP'), m,
                F.lit('"><a href="/Org/ficha'), m,
                F.lit('">Partido '), m, F.lit("</a></span>"))))
        titulo = F.when(vig, F.lit(" Afiliación Vigente ")) \
            .otherwise(F.lit(" Historial de Afiliaciones "))
        estado = (
            F.when((k + j) % 13 == 0,
                   F.lit('<span class="etiqueta">Estado:</span>'))
            .otherwise(F.concat(
                F.lit('<span class="etiqueta">Estado:</span>'
                      "<em>al corte</em>"
                      '<span class="control">'),
                F.when(vig, F.lit("VIGENTE"))
                .otherwise(F.lit("CONCLUIDO")),
                F.lit("</span>"))))
        renuncia = F.when(vig, F.lit("")).otherwise(F.concat(
            F.lit('<span class="etiqueta">Fecha de Renuncia:</span>'
                  '<span class="control">R'), x,
            F.lit("<i>del</i>2020</span>")))
        return F.concat(
            F.lit("<h5>"), titulo, F.lit("</h5><p>nota</p>"),
            F.lit('<div class="content">'), org,
            F.lit('<span class="etiqueta"> Fecha de Afiliación: '
                  '</span> <span class="control"><b>F'), x,
            F.lit("</b></span>"), renuncia, estado, F.lit("</div>"))

    # guard: Spark sequence(0, -1) would COUNT DOWN ([0, -1]); an
    # empty container needs an explicit empty array
    idxs = F.when(n_sections > 0,
                  F.sequence(F.lit(0), n_sections - 1)) \
        .otherwise(F.array().cast("array<int>"))
    html = F.concat(
        F.lit('<html><h3>Ficha</h3>'
              '<div id="HistorialPartidario" class="box">'),
        F.array_join(F.transform(idxs, sec), ""),
        F.lit("</div></html>"))
    return cust.select(
        F.concat(F.lit("PER"), k.cast("string")).alias("id_persona"),
        F.concat(F.lit("/Politico/ficha"), k.cast("string"))
        .alias("url_politico"),
        html.alias("html"))


def infogob_candidate_affiliations(spark, sf_dir):
    """Round-trip proof of the affiliation-history normalizer's
    section walk (sources/infogob_historial.affiliation_sections —
    the reference 41_candidatos_historial.py join_afiliaciones port):
    synthesize the pre-fetched ficha pages from customer arithmetic,
    run the real h5-section explode + org-link extraction, and let
    the oracle state the expected table directly from the same
    arithmetic."""
    from pyperustats_spark.sources.infogob_historial import (
        affiliation_sections)

    pages = _affiliation_ficha_pages(_lt(spark, sf_dir, "customer"))
    return affiliation_sections(pages).select(
        "id_persona", "url_politico", "seccion", "titulo", "activa",
        "organizacion_politica", "url_organizacion",
        "id_organizacion").orderBy("id_persona", "seccion")


def infogob_affiliation_fields(spark, sf_dir):
    """Round-trip proof of the normalizer's etiqueta→control walk
    (sources/infogob_historial.affiliation_fields — the reference's
    parse_content_block dynamic-key half, long-form): accent-folded
    snake_case campo, space-joined stripped valor, control-less
    etiquetas skipped."""
    from pyperustats_spark.sources.infogob_historial import (
        affiliation_fields, affiliation_sections)

    pages = _affiliation_ficha_pages(_lt(spark, sf_dir, "customer"))
    return affiliation_fields(affiliation_sections(pages)).select(
        "id_persona", "seccion", "campo", "valor"
    ).orderBy("id_persona", "seccion", "campo")


def inei_stage_plan(spark, sf_dir):
    from pyperustats_spark.sources.progress import (
        stage_plan, status_from_events)

    modules = spark.createDataFrame(
        INEI_MODULES, "survey string, year int, module_code string")
    events = spark.createDataFrame(
        INEI_STAGE_EVENTS,
        "survey string, year int, module_code string, stage string, done int")
    plan = stage_plan(modules, status_from_events(events, INEI_KEYS),
                      INEI_KEYS)
    return plan.orderBy("survey", "year", "module_code")


def infogob_pending_requests(spark, sf_dir):
    from pyperustats_spark.sources.json_api import pending_requests

    requests = spark.createDataFrame(
        ELECTORAL_REQUESTS,
        "id_eleccion int, id_group_eleccion int, id_location_req int")
    return pending_requests(
        requests, _electoral_frames(spark).processed
    ).orderBy("id_eleccion", "id_group_eleccion", "id_location_req")


def _candidate_frame(spark):
    from pyperustats_spark.sources.json_api import normalize_candidates

    raw = spark.createDataFrame(
        CANDIDATE_PAYLOADS,
        "id_eleccion int, id_location_req int, id_group_eleccion int, "
        "id_expediente string, payload string")
    return normalize_candidates(raw)


def infogob_candidates_by_election(spark, sf_dir):
    return _candidate_frame(spark).orderBy(
        "id_eleccion", "id_location_req", "id_group_eleccion",
        "id_expediente", "name_candidato")


def infogob_candidates_pending(spark, sf_dir):
    """Composite-key pending planning (21_candidatos_by_eleccion.py:
    50-77): distinct 4-part keys seen in resultados_by_org_politica,
    minus keys whose candidates response produced rows."""
    from pyperustats_spark.sources.json_api import (
        CANDIDATE_KEYS, pending_requests)

    requests = (
        _electoral_frames(spark).detail.select(*CANDIDATE_KEYS).distinct())
    processed = _candidate_frame(spark).select(*CANDIDATE_KEYS).distinct()
    return pending_requests(
        requests, processed, keys=CANDIDATE_KEYS).orderBy(*CANDIDATE_KEYS)


def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination flags: exact 5-gram overlap between the
    corpus and a (broadcastable) eval set."""
    eval_df = spark.createDataFrame(EVAL_SNIPPETS, "eid int, text string")
    return T.contamination_flags(
        _lt(spark, sf_dir, "documents"), eval_df, n=5)


def text_decontaminate_bloom(spark, sf_dir):
    """Bloom-prefiltered decontamination flags: corpus grams row-locally
    pruned by the eval-gram bitmap before the semi-join (the
    non-broadcastable-eval-side posture). Result provably equals the
    plain contamination_flags, so the oracle IS its SQL."""
    eval_df = spark.createDataFrame(EVAL_SNIPPETS, "eid int, text string")
    return T.contamination_flags_bloom(
        _lt(spark, sf_dir, "documents"), eval_df, n=5)


def text_source_mix_sample(spark, sf_dir):
    """Deterministic per-source mixture downsampling (hash-cut)."""
    df = T.sample_source_mix(_lt(spark, sf_dir, "documents"), SOURCE_MIX)
    return df.select("doc_id", "source", "lang")


def infogob_org_pending(spark, sf_dir):
    """Political-org done-set ingestion (infogob/
    30_organizaciones_politicas.py:34-50): distinct org urls seen in
    resultados_by_org_politica, minus orgs already in org_politica —
    the same anti-join shape as pending_requests on a 1-part key.
    NULL urls (orgs whose response omitted TxRutaOrgPol) are not
    fetchable and are excluded up front."""
    from pyperustats_spark.sources.json_api import pending_requests

    requests = (
        _electoral_frames(spark).detail
        .select("url_org_politica")
        .where(F.col("url_org_politica").isNotNull())
        .distinct())
    done = spark.createDataFrame(
        [(u,) for u in ORG_DONE], "url_org_politica string")
    return pending_requests(
        requests, done, keys=("url_org_politica",)).orderBy(
        "url_org_politica")


def infogob_candidate_detail_counts(spark, sf_dir):
    from pyperustats_spark.sources.json_api import candidate_detail_counts

    raw = spark.createDataFrame(
        CANDIDATE_DETAIL_PAYLOADS, "url_politico string, payload string")
    df = candidate_detail_counts(raw)
    return df.select(
        "url_politico",
        F.col("num_hojas_vida").cast("bigint").alias("num_hojas_vida"),
        F.col("num_planes_gobierno").cast("bigint").alias(
            "num_planes_gobierno"),
    ).orderBy("url_politico")


def ts_pivot_wide(spark, sf_dir):
    df = TS.pivot_wide(TS.series_long(_lt(spark, sf_dir, "lineitem")))
    return _round(df, {c: 4 for c in TS.SERIES_CODES})


def ts_unpivot_long(spark, sf_dir):
    wide = TS.pivot_wide(TS.series_long(_lt(spark, sf_dir, "lineitem")),
                         sort=False)
    return _round(TS.unpivot_long(wide), {"value": 4})


def ts_resample_monthly(spark, sf_dir):
    df = TS.resample(TS.series_long(_lt(spark, sf_dir, "lineitem")), "M")
    return _round(df, {"value_sum": 4, "value_avg": 6})


def ts_resample_quarterly(spark, sf_dir):
    df = TS.resample(TS.series_long(_lt(spark, sf_dir, "lineitem")), "Q")
    return _round(df, {"value_sum": 4, "value_avg": 6})


def ts_gap_fill(spark, sf_dir):
    df = TS.gap_fill(TS.series_long(_lt(spark, sf_dir, "lineitem")))
    return _round(df, {"value": 4})


def ts_lag_pct_change(spark, sf_dir):
    df = TS.lag_pct_change(TS.series_long(_lt(spark, sf_dir, "lineitem")))
    return _round(df, {"value": 4, "prev_value": 4, "pct_change": 6})


def ts_moving_avg(spark, sf_dir):
    df = TS.moving_avg(TS.series_long(_lt(spark, sf_dir, "lineitem")))
    return _round(df, {"value": 4, "ma7": 4})


def ts_running_total(spark, sf_dir):
    df = TS.running_total(TS.series_long(_lt(spark, sf_dir, "lineitem")))
    return _round(df, {"value": 4, "cum_value": 4})


def ts_yoy_growth(spark, sf_dir):
    monthly = TS.resample(TS.series_long(_lt(spark, sf_dir, "lineitem")), "M",
                          sort=False).select("period", "code", "value_sum")
    return _round(TS.yoy_growth(monthly), {"value_sum": 4, "prev_year": 4, "yoy": 6})


def ts_asof_join(spark, sf_dir):
    long_df = TS.series_long(_lt(spark, sf_dir, "lineitem"))
    q = (TS.resample(long_df, "Q", sort=False)
         .select(F.col("period").alias("date"), "code", "value_sum"))
    df = TS.asof_join(long_df, q, on="date", key="code",
                      right_value_cols=["value_sum"])
    return _round(df.orderBy("date", "code"),
                  {"value": 4, "asof_value_sum": 4})


def ts_date_parse_multi(spark, sf_dir):
    from pyperustats_spark.functions.dates import parse_period
    rows = [(1, "15.Ene.23", "D"), (2, "03.Jun.24", "D"), (3, "Dic.2022", "M"),
            (4, "Set.2021", "M"), (5, "Q1.23", "Q"), (6, "Q4.21", "Q"),
            (7, "2020", "A"), (8, "28.Ago.19", "D"), (9, "Abr.2023", "M"),
            (10, "Q3.22", "Q")]
    raw = spark.createDataFrame(rows, "id int, raw string, freq string")
    out = raw.select(
        "id", "raw", "freq",
        F.when(F.col("freq") == "D", parse_period(F.col("raw"), "D"))
         .when(F.col("freq") == "M", parse_period(F.col("raw"), "M"))
         .when(F.col("freq") == "Q", parse_period(F.col("raw"), "Q"))
         .otherwise(parse_period(F.col("raw"), "A")).alias("parsed"))
    return out.orderBy("id")


def cache_merge_upsert(spark, sf_dir):
    long_df = TS.series_long(_lt(spark, sf_dir, "lineitem"))
    incoming = (long_df.where(F.col("date") >= F.lit("2001-01-01").cast("timestamp"))
                .withColumn("value", F.col("value") * 1.1))
    df = TS.cache_merge_upsert(long_df, incoming, keys=["date", "code"])
    return _round(df, {"value": 4}).orderBy("date", "code")


def cache_missing_codes(spark, sf_dir):
    long_df = TS.series_long(_lt(spark, sf_dir, "lineitem"))
    req = spark.createDataFrame([(c,) for c in MISSING_CODE_REQ], "code string")
    return TS.cache_missing_codes(req, long_df.select("code"))


def ev_tumbling_window(spark, sf_dir):
    df = E.tumbling_window(_lt(spark, sf_dir, "events"))
    return _round(df, {"sum_value": 4, "avg_value": 6})


def ev_incident_windows(spark, sf_dir):
    # keyless range join: the 20 busiest hours become [hour, hour+1h)
    # incident windows and EVERY event is range-joined into them via
    # the bucketed equi plan (R.range_join) — no BNLJ
    ev = _lt(spark, sf_dir, "events")
    hours = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("start"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), "start").limit(20)
        .select("start",
                (F.col("start") + F.expr("INTERVAL 1 HOUR")).alias("wend"))
    )
    joined = R.range_join(ev.select("ts", "user_id"), hours,
                          point_col="ts", start_col="start",
                          end_col="wend", bucket_seconds=3600)
    return (
        joined.groupBy("start")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.count_distinct("user_id").alias("n_users"))
        .orderBy("start")
    )


def ev_sessionize(spark, sf_dir):
    df = E.sessionize(_lt(spark, sf_dir, "events"))
    return _round(df, {"sum_value": 4})


def ev_sessionize_skew(spark, sf_dir):
    """sessionize on the two-phase skew-split assigner
    (assign_sessions_chunked): identical semantics to ev_sessionize —
    same oracle — but the biggest window task holds one user-DAY, not
    one user (the mega-user answer at 100 TB)."""
    df = E.sessionize(_lt(spark, sf_dir, "events"), chunked=True)
    return _round(df, {"sum_value": 4})


def ev_bounce_rate(spark, sf_dir):
    """Daily single-event-session share (raw int/int bounce rate)."""
    return E.bounce_rate_daily(_lt(spark, sf_dir, "events"))


def ev_top_users_per_type(spark, sf_dir):
    df = E.top_users_per_type(_lt(spark, sf_dir, "events"))
    return _round(df, {"total_value": 4})


def ev_top_paths(spark, sf_dir):
    return E.top_session_paths(_lt(spark, sf_dir, "events"),
                               gap_minutes=30, max_events=8, k=25)


def ev_conversion_lag(spark, sf_dir):
    return E.conversion_lag_stats(_lt(spark, sf_dir, "events"),
                                  from_type="view", to_type="purchase")


def ev_conversion_lag_approx(spark, sf_dir):
    return E.conversion_lag_stats_approx(_lt(spark, sf_dir, "events"),
                                         from_type="view",
                                         to_type="purchase")


def q8_national_market_share(spark, sf_dir):
    return R.national_market_share(
        _lt(spark, sf_dir, "region"), _lt(spark, sf_dir, "nation"),
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "supplier"),
        _lt(spark, sf_dir, "orders"), _lt(spark, sf_dir, "lineitem"),
        _lt(spark, sf_dir, "part"))


def q21_sole_blame_supplier(spark, sf_dir):
    return R.sole_blame_supplier(
        _lt(spark, sf_dir, "supplier"), _lt(spark, sf_dir, "lineitem"),
        _lt(spark, sf_dir, "orders"), _lt(spark, sf_dir, "nation"))


def q16_part_supplier_counts(spark, sf_dir):
    return R.part_supplier_counts(
        _lt(spark, sf_dir, "part"), _lt(spark, sf_dir, "lineitem"),
        _lt(spark, sf_dir, "supplier"))


def q2_min_cost_supplier(spark, sf_dir):
    return R.min_cost_supplier(
        _lt(spark, sf_dir, "part"), _lt(spark, sf_dir, "supplier"),
        _lt(spark, sf_dir, "lineitem"), _lt(spark, sf_dir, "nation"),
        _lt(spark, sf_dir, "region"))


def q9_product_type_profit(spark, sf_dir):
    return R.product_type_profit(
        _lt(spark, sf_dir, "lineitem"), _lt(spark, sf_dir, "part"),
        _lt(spark, sf_dir, "supplier"), _lt(spark, sf_dir, "orders"),
        _lt(spark, sf_dir, "nation"))


def q11_important_stock(spark, sf_dir):
    return R.important_stock(
        _lt(spark, sf_dir, "lineitem"), _lt(spark, sf_dir, "supplier"),
        _lt(spark, sf_dir, "nation"))


def q20_dominant_supplier(spark, sf_dir):
    return R.dominant_supplier(
        _lt(spark, sf_dir, "lineitem"), _lt(spark, sf_dir, "part"),
        _lt(spark, sf_dir, "supplier"), _lt(spark, sf_dir, "nation"),
        _lt(spark, sf_dir, "region"))


def graph_supplier_pagerank(spark, sf_dir):
    from pyperustats_spark.operators import graph as G
    return G.supplier_importance(
        _lt(spark, sf_dir, "lineitem"), _lt(spark, sf_dir, "orders"),
        _lt(spark, sf_dir, "supplier"), iters=6, k=50)


def graph_supplier_ppr(spark, sf_dir):
    """Personalized PageRank seeded on nation-0's suppliers (teleport
    to the seed set; fixed-point integers, unrolled-CTE oracle)."""
    from pyperustats_spark.operators import graph as G
    return G.supplier_ppr(
        _lt(spark, sf_dir, "lineitem"), _lt(spark, sf_dir, "orders"),
        _lt(spark, sf_dir, "supplier"), seed_nationkey=0, iters=6, k=50)


def q_part_affinity(spark, sf_dir):
    return R.part_affinity(_lt(spark, sf_dir, "lineitem"))


def q_sales_cube(spark, sf_dir):
    """Full CUBE over (returnflag, linestatus, ship year) with SQL
    grouping ids; cents-exact revenue."""
    return R.sales_cube(_lt(spark, sf_dir, "lineitem"))


def q_cohort_ltv(spark, sf_dir):
    """Acquisition-cohort LTV curves (integer-cents revenue, integer
    month index, ordered-window cumulative; derived doubles raw)."""
    return R.cohort_ltv(_lt(spark, sf_dir, "orders"))


def q_customer_migration(spark, sf_dir):
    """Year-over-year spend-quartile migration matrix (integer-cents
    spend, histogram_ntile tiers, NULL = inactive that year)."""
    return R.customer_tier_migration(_lt(spark, sf_dir, "orders"))


def graph_supplier_salsa(spark, sf_dir):
    from pyperustats_spark.operators import graph as G
    return G.supplier_authority(
        _lt(spark, sf_dir, "lineitem"), _lt(spark, sf_dir, "orders"),
        _lt(spark, sf_dir, "supplier"), iters=4, k=50)


def dedup_keep_best(spark, sf_dir):
    """Quality-canonical exact dedup: keep the highest-quality copy
    per normalized-content cluster (quarter-grid quality, total
    order)."""
    return D.keep_best_per_cluster(_lt(spark, sf_dir, "documents"))


def dedup_jaccard_prefix(spark, sf_dir):
    """Exact all-pairs Jaccard >= 0.9 via prefix filtering (AllPairs/
    PPJoin): lossless, integer-exact thresholds, rarest-first index."""
    return D.jaccard_prefix_pairs(_lt(spark, sf_dir, "documents"))


def graph_part_triangles(spark, sf_dir):
    """Triangle census of the part co-purchase graph (degree-ordered
    node-iterator; one summary row, clustering coefficient raw)."""
    from pyperustats_spark.operators import graph as G
    return G.copurchase_triangle_stats(_lt(spark, sf_dir, "lineitem"))


def graph_part_clustering(spark, sf_dir):
    """Per-node clustering coefficient (Watts-Strogatz) of the part
    co-purchase graph: apex-retaining degree-ordered triangle
    iterator, 3-row explode per triangle into a partial-aggregated
    count, cc = 2T/(d(d-1)) as a raw int/int division."""
    from pyperustats_spark.operators import graph as G
    return G.copurchase_node_clustering(_lt(spark, sf_dir, "lineitem"))


def graph_part_kcore(spark, sf_dir):
    """R-round k-core peeling of the co-purchase graph at k =
    ceil(avg degree); oracle unrolls the same R rounds, convergence
    reported as a column instead of assumed."""
    from pyperustats_spark.operators import graph as G
    return G.kcore_peel(G.copurchase_edges(_lt(spark, sf_dir, "lineitem")))


def graph_part_degrees(spark, sf_dir):
    """Degree distribution of the co-purchase graph (counts + raw
    shares)."""
    from pyperustats_spark.operators import graph as G
    return G.degree_distribution(
        G.copurchase_edges(_lt(spark, sf_dir, "lineitem")))


def graph_part_adamic_adar(spark, sf_dir):
    """Link prediction on the min_support=3 co-purchase graph: top-100
    non-adjacent part pairs by Adamic-Adar (with common-neighbour and
    Resource-Allocation scores), every score an exact integer sum —
    Σ 1000000 div deg and Σ floor(1e6/round(ln deg, 6)) — so the
    oracle reproduces the cut bit-for-bit (no double is ever summed)."""
    from pyperustats_spark.operators import graph as G
    return G.adamic_adar_topk(
        G.copurchase_edges(_lt(spark, sf_dir, "lineitem"),
                           min_support=3))


def graph_part_communities(spark, sf_dir):
    """Deterministic synchronous label propagation (4 rounds,
    smallest-label tiebreak) on the min_support=3 co-purchase graph;
    the oracle unrolls the identical rounds."""
    from pyperustats_spark.operators import graph as G
    return (G.label_propagation(
                G.copurchase_edges(_lt(spark, sf_dir, "lineitem"),
                                   min_support=3),
                iters=4)
            .withColumnRenamed("node", "part")
            .orderBy("part"))


def graph_part_modularity(spark, sf_dir):
    """Newman modularity of the 4-round LPA partition on the same
    min_support=3 co-purchase graph — exact integer q_num/q_den plus
    the raw int/int quotient; oracle unrolls the identical rounds."""
    from pyperustats_spark.operators import graph as G
    edges = G.copurchase_edges(_lt(spark, sf_dir, "lineitem"),
                               min_support=3)
    labels = G.label_propagation(edges, iters=4).select(
        "node", "community")
    return G.modularity_score(edges, labels)


def q_revenue_lorenz(spark, sf_dir):
    """Lorenz curve (10 deciles) of customer revenue — histogram-rank
    deciles == SQL ntile, integer cumsums, raw cum_share."""
    return R.revenue_lorenz(_lt(spark, sf_dir, "orders"))


def q_supplier_hhi(spark, sf_dir):
    """Per-nation HHI supplier concentration — exact integers, raw
    int/int quotient."""
    return R.supplier_hhi(_lt(spark, sf_dir, "lineitem"),
                          _lt(spark, sf_dir, "supplier"),
                          _lt(spark, sf_dir, "nation"))


def q_supplier_skyline(spark, sf_dir):
    """Per-nation supplier Pareto front on (revenue up, line count
    down) — integer dominance via two range-frame windows; oracle is
    the NOT-EXISTS dominance SQL."""
    return R.supplier_skyline(_lt(spark, sf_dir, "lineitem"),
                              _lt(spark, sf_dir, "supplier"),
                              _lt(spark, sf_dir, "nation"))


def er_customer_name_pairs(spark, sf_dir):
    """Blocked Levenshtein entity-resolution pairs (nation blocks,
    distance <= 1; edit distances oracle-exact)."""
    return R.fuzzy_name_pairs(_lt(spark, sf_dir, "customer"))


def sample_weighted_orders(spark, sf_dir):
    """Efraimidis-Spirakis weighted sample of orders by totalprice
    (md5-uniform, grid-snapped ln — deterministic cross-engine)."""
    return R.weighted_sample(_lt(spark, sf_dir, "orders"),
                             key="o_orderkey", weight_col="o_totalprice",
                             k=100)


def text_source_jsd(spark, sf_dir):
    """Per-source unigram Jensen-Shannon drift vs the whole corpus
    (grid-snapped ln, ordered cumsum — deterministic)."""
    return T.source_unigram_jsd(_lt(spark, sf_dir, "documents"))


def ev_decay_value(spark, sf_dir):
    """Top users by time-decay purchase value (2^(-age/half-life),
    grid-snapped pow, ordered per-user cumsum)."""
    return E.decay_weighted_value(_lt(spark, sf_dir, "events"))


def ev_weekday_profile(spark, sf_dir):
    """Day-of-week profile per type with an integer-exact chi-square
    uniformity statistic."""
    return E.weekday_profile(_lt(spark, sf_dir, "events"))


def ev_cuped_ab(spark, sf_dir):
    """CUPED-adjusted A/B readout: hash-assigned variants, pre-period
    covariate, all moments exact integer sums (one pass)."""
    return E.cuped_ab_readout(_lt(spark, sf_dir, "events"))


def ev_diff_in_diff(spark, sf_dir):
    """Difference-in-differences readout on the shared hash-assigned
    experiment frame (same md5 split + midpoint pre/post as
    ev_cuped_ab): DiD = (post-pre)_treatment - (post-pre)_control,
    all means DOUBLE(exact cents)/(100*DOUBLE(n)) — bit-identical
    quotients, shipped raw."""
    return E.diff_in_diff_readout(_lt(spark, sf_dir, "events"))


def ev_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier session-duration survival curve with
    right-censoring at the corpus horizon; survival shipped in LOG
    space (ln-grid + ordered cumsum)."""
    return E.kaplan_meier_sessions(_lt(spark, sf_dir, "events"))


def ev_conversion_survival(spark, sf_dir):
    """Kaplan-Meier time-to-first-purchase survival (hours from each
    user's first activity, never-converters right-censored at the
    corpus horizon); survival shipped in LOG space (ln-grid terms +
    ordered cumsum) — the conversion twin of ev_kaplan_meier's
    session-duration curve."""
    return E.kaplan_meier_conversion(_lt(spark, sf_dir, "events"))


def ev_hazard_cumulative(spark, sf_dir):
    """Nelson-Aalen cumulative hazard of time-to-first-purchase
    (+ Poisson-type variance): every increment an int/int IEEE
    division, accumulated by an ORDERED window — raw doubles,
    bit-deterministic, no ln anywhere."""
    return E.nelson_aalen_conversion(_lt(spark, sf_dir, "events"))


def stats_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov D between urgent and non-urgent
    order-value distributions: integer-cents ECDFs, exact global
    cumulative counts via histogram_cumsum (bucket windows + bounded
    offset table — no partition-less sort), int/int gaps, TakeOrdered
    argmax; the exact statistic ships, p-value stays client-side."""
    return R.ks_two_sample(_lt(spark, sf_dir, "orders"))


def stats_chi2_independence(spark, sf_dir):
    """Pearson chi-square independence of priority x status: every
    cell term the exact rational (O*N - r*c)^2/(N*r*c) in DECIMAL/
    HUGEINT (the square overflows bigint near N~55k) divided once as
    DOUBLE/DOUBLE; cell-bounded ordered cumsum — bit-deterministic."""
    return R.chi2_independence(_lt(spark, sf_dir, "orders"))


def stats_mann_whitney(spark, sf_dir):
    """Tie-corrected Mann-Whitney U between urgent/non-urgent order
    values: 2-R1 and the t^3 tie sums in exact DECIMAL(38,0), variance
    an exact rational cast to DOUBLE, z from arithmetic + sqrt only
    (the correctly-rounded-IEEE subset) — bit-deterministic."""
    return R.mann_whitney_u(_lt(spark, sf_dir, "orders"))


def q_revenue_gini(spark, sf_dir):
    """Gini coefficient of customer revenue (exact integer cents,
    rank-weighted sum in DECIMAL, one raw division)."""
    return R.revenue_gini(_lt(spark, sf_dir, "orders"))


def q_benford_digits(spark, sf_dir):
    """Benford first-digit profile of order totals with chi-square
    (digits from integer cents — engine-stable string formatting)."""
    return R.benford_first_digit(_lt(spark, sf_dir, "orders"))


def ev_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution over truncated session paths
    (fixed-point micro-units, 12 unrolled rounds in the oracle)."""
    return E.markov_removal_attribution(_lt(spark, sf_dir, "events"))


def ev_hll_rollup(spark, sf_dir):
    """Monthly distinct users via merged daily HLL sketches vs the
    exact re-scan (rows-only: sketch registers have no SQL oracle)."""
    return E.hll_distinct_rollup(_lt(spark, sf_dir, "events"))


def ev_kll_quantiles(spark, sf_dir):
    """Per-type value quantiles from folded daily KLL sketches, with
    exact in-engine rank-error calibration (rows-only)."""
    return E.kll_value_quantiles(_lt(spark, sf_dir, "events"))


def ev_peak_concurrency(spark, sf_dir):
    """Daily peak concurrent sessions via the day-partitioned sweep
    (bounded carry table, never a partition-less global window)."""
    return E.peak_concurrency(_lt(spark, sf_dir, "events"))


def ev_volume_anomalies(spark, sf_dir):
    """Per-type daily-volume control chart: the anomaly flag is an
    EXACT integer comparison ((cx−S)² vs s²(cQ−S²)) that cannot flake
    on a rounding boundary; z ships raw (derived from exact ints)."""
    return E.volume_anomalies(_lt(spark, sf_dir, "events"))


def ev_status_scd2(spark, sf_dir):
    """SCD type-2 status history (gaps-and-islands): consecutive
    same-type runs per user collapse to [valid_from, valid_to)."""
    return E.status_history_scd2(_lt(spark, sf_dir, "events"))


def ev_markov_stationary(spark, sf_dir):
    """Stationary distribution of the user-behavior event-type chain:
    per-user lag transitions → weighted edge list → power iteration in
    fixed-point micro-units (bit-exact vs the unrolled-CTE oracle);
    share is an int/int double and ships raw."""
    from pyspark.sql import Window
    from pyperustats_spark.operators import graph as G
    ev = _lt(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (ev.select(F.lag("event_type").over(w).alias("src"),
                       F.col("event_type").alias("dst"))
             .where(F.col("src").isNotNull()))
    # NOT persisted (A/B'd r11): caching the |types|² frame here hides
    # its size statistics behind an unmaterialized InMemoryRelation and
    # six downstream joins flip broadcast -> sort-merge (1.9 s -> 6.3 s
    # at sf0.1). The kernel's nodes-from-e rewrite already cut the
    # events-window re-executions from 4 to 2; the remaining second
    # pass is cheaper than losing broadcast planning.
    edges = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    return (G.markov_stationary_fixed_point(edges, iters=6)
            .withColumnRenamed("node", "event_type")
            .orderBy("event_type"))


def text_token_count(spark, sf_dir):
    return T.token_counts(_lt(spark, sf_dir, "documents"))


def text_quality_score(spark, sf_dir):
    df = T.quality_score(_lt(spark, sf_dir, "documents"))
    return _round(df, {"mean_word_len": 6, "punct_ratio": 6, "digit_ratio": 6,
                       "stopword_density": 6, "quality_score": 2})


def text_lang_id(spark, sf_dir):
    return T.lang_id(_lt(spark, sf_dir, "documents"))


def text_fingerprint(spark, sf_dir):
    return T.fingerprint(_lt(spark, sf_dir, "documents"))


def text_ngram_topk(spark, sf_dir):
    return T.ngram_topk(_lt(spark, sf_dir, "documents"))


def split_train_val(spark, sf_dir):
    df = R.train_val_split(
        _lt(spark, sf_dir, "documents").select("doc_id", "lang"), "doc_id")
    return df.orderBy("doc_id")


def sample_stratified_by_lang(spark, sf_dir):
    df = R.sample_per_group(
        _lt(spark, sf_dir, "documents").select("doc_id", "lang"),
        ["lang"], "doc_id", k=5)
    return df.orderBy("lang", "doc_id")


def text_chunk_windows(spark, sf_dir):
    return T.chunk_windows(_lt(spark, sf_dir, "documents"))


def text_pack_sequences(spark, sf_dir):
    return T.pack_sequences(_lt(spark, sf_dir, "documents"))


def dedup_filter_apply(spark, sf_dir):
    return D.dedup_filter(_lt(spark, sf_dir, "documents"))


def text_repetition_metrics(spark, sf_dir):
    return T.repetition_metrics(_lt(spark, sf_dir, "documents"))


def text_vocab_topn(spark, sf_dir):
    return T.vocab_top_terms(_lt(spark, sf_dir, "documents"), n=100)


def text_oov_rate(spark, sf_dir):
    return T.oov_rate(_lt(spark, sf_dir, "documents"), n=100)


def text_boilerplate(spark, sf_dir):
    return T.boilerplate_segments(_lt(spark, sf_dir, "documents"),
                                  seg_tokens=8, min_df=2)


def doc_epoch_shards(spark, sf_dir):
    return R.epoch_shards(
        _lt(spark, sf_dir, "documents").select("doc_id", "source"),
        "doc_id", num_shards=8)


def ev_approx_distinct(spark, sf_dir):
    return E.approx_distinct_users(_lt(spark, sf_dir, "events"))


def text_boilerplate_apply(spark, sf_dir):
    return T.boilerplate_apply(_lt(spark, sf_dir, "documents"),
                               seg_tokens=8, min_df=2)


def corpus_summary(spark, sf_dir):
    return T.corpus_summary(_lt(spark, sf_dir, "documents"))


def text_quality_filter(spark, sf_dir):
    return T.quality_filter(_lt(spark, sf_dir, "documents"), min_score=0.75)


def stats_mad_outliers(spark, sf_dir):
    return R.mad_outliers(_lt(spark, sf_dir, "lineitem"),
                          "l_returnflag", "l_extendedprice", k=3.5)


def text_unigram_logprob(spark, sf_dir):
    return T.unigram_logprob(_lt(spark, sf_dir, "documents"), k=0.5)


def text_tfidf_top_terms(spark, sf_dir):
    return T.tfidf_top_terms(_lt(spark, sf_dir, "documents"), top=3)


def text_bigram_logprob(spark, sf_dir):
    return T.bigram_logprob(_lt(spark, sf_dir, "documents"), k=0.5)


def text_temperature_mixture(spark, sf_dir):
    """alpha=1/2 temperature-smoothed source mixture sample (sqrt is
    correctly-rounded IEEE, so the weights are bit-identical
    cross-engine; all-integer output)."""
    return T.temperature_mixture_sample(_lt(spark, sf_dir, "documents"),
                                        token_budget=10_000)


def text_pmi_collocations(spark, sf_dir):
    """Top-20 adjacent-token collocations by PMI (grid-snapped ln
    five-term sum — bit-identical cross-engine)."""
    return T.pmi_collocations(_lt(spark, sf_dir, "documents"),
                              min_count=5, k=20)


def text_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-fertility card per (lang, source): chars/bytes per
    token — all-bigint sums, raw int/int ratios."""
    return T.tokenizer_fertility(_lt(spark, sf_dir, "documents"))


def text_perplexity_buckets(spark, sf_dir):
    """CCNet-style per-language head/middle/tail perplexity terciles
    over the corpus's own unigram LM (histogram-rank tiles, no
    per-lang global window)."""
    return T.perplexity_buckets(_lt(spark, sf_dir, "documents"),
                                k=0.5, n_buckets=3)


def text_quality_logit(spark, sf_dir):
    """Frozen linear quality classifier: integer basis-point features
    x micro-unit weights -> exact bigint margin, keep = margin >= 0."""
    return T.quality_logit(_lt(spark, sf_dir, "documents"))


def text_heaps_curve(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve over 10 equal-count
    ingestion-order checkpoints (histogram_ntile tiles)."""
    return T.heaps_curve(_lt(spark, sf_dir, "documents"), checkpoints=10)


def text_dsir_sample(spark, sf_dir):
    """DSIR importance sampling toward the lang='en' target slice:
    hashed-unigram log-ratio importance, top-200 docs."""
    return T.dsir_importance_sample(_lt(spark, sf_dir, "documents"),
                                    target_lang="en", n_feat=1024,
                                    top=200)


def ev_user_entropy(spark, sf_dir):
    """Per-user event-type Shannon entropy + evenness (integer
    micro-nat Σ c·ln c — merge-order-proof, bit-identical)."""
    return E.user_entropy(_lt(spark, sf_dir, "events"))


def sample_stratified_exact_k(spark, sf_dir):
    """Exact-k hash sample per language via the histogram-rank
    decomposition (no per-lang single-task window)."""
    df = R.sample_per_group_hist(
        _lt(spark, sf_dir, "documents").select("doc_id", "lang"),
        ["lang"], "doc_id", k=25, nibbles=2)
    return df.orderBy("lang", "doc_id")


def text_ccnet_filter(spark, sf_dir):
    """CCNet keep rule applied: head+middle perplexity tiles per
    language survive, tail dropped."""
    return T.ccnet_filter(_lt(spark, sf_dir, "documents"))


def doc_length_drift(spark, sf_dir):
    """Per-source KS-style L-inf drift of the doc-length distribution
    vs the rest of the corpus (two-significant-digit integer cells)."""
    return T.length_drift_by_source(_lt(spark, sf_dir, "documents"))


def ts_seasonal_anomalies(spark, sf_dir):
    """Seasonal-adjusted robust anomalies: decompose residual vs
    k·1.4826·MAD per series. value round-4 as in ts_decompose (the
    daily sum is a groupBy double sum; residual itself derives from
    the grid-recovered trend/seasonal chain)."""
    return _round(
        TS.seasonal_anomalies(
            TS.series_long(_lt(spark, sf_dir, "lineitem")), k=3.5),
        {"value": 4},
    )


def text_script_mix(spark, sf_dir):
    """Unicode script-class profile per doc (Latin/Cyrillic/CJK/
    Arabic/digit counts, dominant script, letter share)."""
    return T.script_mix(_lt(spark, sf_dir, "documents"))


def q_price_index(spark, sf_dir):
    """Laspeyres/Paasche monthly price indexes over the part
    catalogue (matched-sample basket, fixed-point integer sums)."""
    return R.price_index_monthly(_lt(spark, sf_dir, "lineitem"))


def text_filter_funnel(spark, sf_dir):
    """Per-rule quality-filter attribution funnel (marginal +
    cumulative drops per rule; all-integer)."""
    return T.filter_funnel(_lt(spark, sf_dir, "documents"))


def ev_stickiness(spark, sf_dir):
    """DAU/WAU/MAU + stickiness per observed day, all three counts
    from one exploded (day, user) pass."""
    return E.stickiness(_lt(spark, sf_dir, "events"))


def emb_centroid_drift(spark, sf_dir):
    """Per-label embedding centroid drift between two deterministic
    halves (exact micro-unit integer sums; cosine + norm ratio)."""
    return S.centroid_drift(_lt(spark, sf_dir, "embeddings"))


def emb_matryoshka_eval(spark, sf_dir):
    """Dimension-truncation recall curve (Matryoshka): recall@5 of
    each embedding prefix vs full-dim exact truth. Rows-only."""
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    df = S.matryoshka_eval(emb, q, k=5, dims=(4, 8, 16, 32, 64))
    return _round(df, {"recall_at_k": 6})


def ts_bollinger_bands(spark, sf_dir):
    """20-day Bollinger bands per series — integer-cents window sums,
    correctly-rounded sqrt sigma, raw band doubles."""
    return TS.bollinger_bands(
        TS.series_long(_lt(spark, sf_dir, "lineitem")), window=20)


def ts_seasonal_index(spark, sf_dir):
    return TS.seasonal_index(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def q4_order_priority(spark, sf_dir):
    return R.order_priority_counts(_lt(spark, sf_dir, "orders"),
                                   _lt(spark, sf_dir, "lineitem"))


def q12_flag_priority(spark, sf_dir):
    return R.returnflag_priority_counts(_lt(spark, sf_dir, "orders"),
                                        _lt(spark, sf_dir, "lineitem"))


def stats_winsorize(spark, sf_dir):
    return R.winsorize_summary(_lt(spark, sf_dir, "lineitem"),
                               "l_returnflag", "l_extendedprice")


def ts_ewma(spark, sf_dir):
    return TS.ewma(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_ewma_exact(spark, sf_dir):
    """Exact-integer EWMA (α = 1/4) in cents — the sequential fold
    made oracle-checkable: a DuckDB recursive CTE replays the same
    integer recurrence row by row per series."""
    return TS.ewma_exact(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_holt_winters(spark, sf_dir):
    return TS.holt_winters(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_hp_filter(spark, sf_dir):
    """Hodrick-Prescott trend/cycle decomposition per series (λ=1600):
    pentadiagonal normal equations solved in O(n) with a banded LDLT
    factorization inside applyInPandas — rows-only (float linear
    system), pytest-pinned against a dense np.linalg.solve oracle,
    the λ=0 identity and the linear-series exact-fit property."""
    return TS.hp_filter(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_series_depth_profile(spark, sf_dir):
    """Series-depth pre-flight card for the per-series folds (VERDICT
    r10 item 4): rows-per-code + share + depth_vs_max — one series =
    one task in the exact twins, so the deepest series bounds their
    wall clock; this is the measured check."""
    return TS.series_depth_profile(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_holt_exact(spark, sf_dir):
    """Exact-integer Holt level+trend (α = 1/4, β = 1/8) in cents —
    both coupled recurrences replayed by a DuckDB recursive CTE
    (explicit truncating division — DuckDB // truncates on the
    signed trend where Python // floors)."""
    return TS.holt_exact(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_hw_seasonal_exact(spark, sf_dir):
    """Exact-integer additive Holt-Winters (α=1/4, β=1/8, γ=1/4,
    weekly period) — three coupled recurrences incl. a rotating
    7-slot seasonal ring, replayed by a recursive CTE whose state
    carries a BIGINT[] list.

    The replay window is capped at the first 365 days per series
    (both engines, VERDICT r10 item 6): the recursive oracle's cost
    is superlinear in max series LENGTH (measured 6.6 s → 40 s →
    ~3.5 min at sf0.001/0.01/0.1 uncapped — series length, not data
    volume, drives it), and a 365-step triple recurrence cycling the
    weekly ring 52 times pins the arithmetic exactly as hard as a
    2,500-step one. The operator itself stays uncapped."""
    return TS.hw_seasonal_exact(
        TS.series_long(_lt(spark, sf_dir, "lineitem"))
        .where(F.col("date") < "1996-01-02"))


def ts_backtest_exact(spark, sf_dir):
    """One-step-ahead backtest of the exact-integer Holt forecasts:
    per-series n/MAE/RMSE with bigint-cents errors, MAE as a raw
    int/int quotient and RMSE via correctly-rounded sqrt — fully
    value-pinned by the same recursive-CTE oracle plus an aggregate."""
    return TS.backtest_exact(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_forecast_backtest(spark, sf_dir):
    return TS.forecast_backtest(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ev_funnel_steps(spark, sf_dir):
    return E.funnel_steps(_lt(spark, sf_dir, "events"))


def ev_funnel_within(spark, sf_dir):
    return E.funnel_steps(_lt(spark, sf_dir, "events"),
                          within_minutes=24 * 60)


def ev_retention_cohorts(spark, sf_dir):
    return E.retention_cohorts(_lt(spark, sf_dir, "events"))


def stats_mad_outliers_approx(spark, sf_dir):
    return R.mad_outliers_approx(_lt(spark, sf_dir, "lineitem"),
                                 "l_returnflag", "l_extendedprice", k=3.5)


def dedup_exact(spark, sf_dir):
    return D.dedup_exact(_lt(spark, sf_dir, "documents"))


def dedup_exact_normalized(spark, sf_dir):
    return D.dedup_exact_normalized(_lt(spark, sf_dir, "documents"))


def dedup_ngram_jaccard(spark, sf_dir):
    df = D.ngram_jaccard_pairs(_lt(spark, sf_dir, "documents"), n=3, threshold=0.15)
    return _round(df, {"jaccard": 6})


def dedup_ngram_containment(spark, sf_dir):
    """Asymmetric containment pairs (|A∩B|/|A| per direction) — catches
    subset duplication (quote/excerpt) that Jaccard's union denominator
    washes out; raw int/int fractions ship bit-identical cross-engine."""
    df = D.ngram_containment_pairs(_lt(spark, sf_dir, "documents"),
                                   n=3, threshold=0.25)
    return df


def dedup_exact_substring(spark, sf_dir):
    return D.exact_substring_pairs(_lt(spark, sf_dir, "documents"),
                                   n_tokens=20, winnow=5)


def dedup_substring_profile(spark, sf_dir):
    return D.substring_duplication_profile(_lt(spark, sf_dir, "documents"),
                                           n_tokens=20, winnow=5)


def dedup_paragraph(spark, sf_dir):
    # the synthetic corpus has no blank-line breaks, so split on the
    # ' a ' token separator to genuinely exercise multi-paragraph
    # splitting + corpus-first-occurrence dedup on this data
    return D.paragraph_dedup(_lt(spark, sf_dir, "documents"),
                             delim=" a ", joiner=" a ")


def dedup_paragraph_stats(spark, sf_dir):
    # same ' a ' paragraph split as dedup_paragraph (see that entry)
    return D.paragraph_dup_stats(_lt(spark, sf_dir, "documents"),
                                 delim=" a ", by="source")


def ev_logrank_ab(spark, sf_dir):
    return E.logrank_ab(_lt(spark, sf_dir, "events"))


def ev_periodicity(spark, sf_dir):
    return E.periodicity(_lt(spark, sf_dir, "events"))


def ev_ols_weekend(spark, sf_dir):
    """Two-regressor OLS per event type (trend + weekend dummy) on
    zero-kept daily counts: exact integer normal-equation sums in
    DECIMAL(38,0), 3x3 Cramer solve on double-cast-first sums (one
    fixed correctly-rounded tree per coefficient), singular design
    NULL via the same det=0 CASE."""
    return E.ols_trend_weekend(_lt(spark, sf_dir, "events"))


def ev_permutation_entropy(spark, sf_dir):
    """Bandt-Pompe ordinal-pattern entropy of hourly counts per event
    type: tie-aware trit encoding (pure integer comparisons), then
    the micro-nat ln-grid entropy recipe — bit-identical
    cross-engine; windows bounded by the hour span."""
    return E.permutation_entropy(_lt(spark, sf_dir, "events"))


def ts_hurst(spark, sf_dir):
    """Rescaled-range Hurst exponent per series: integer cumulative
    deviations W_j = s*CC_j - j*S per block (exact), R/S one
    correctly-rounded tree, ln on the 1e-6 integer grid, log-log
    slope through an ordered k-scale window."""
    return TS.hurst_rs(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_ljung_box(spark, sf_dir):
    """Ljung-Box whiteness Q per series (K=8): r_k from exact
    integer centered products (n-scaled, DECIMAL), per-lag terms
    through an ordered K-row window, Q one fixed tree."""
    return TS.ljung_box(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_variance_ratio(spark, sf_dir):
    """Lo-MacKinlay variance ratio per series at horizons 2/4/8:
    exact integer change moments (DECIMAL sums), VR and the iid z
    as fixed correctly-rounded trees; one window pass + stack."""
    return TS.variance_ratio(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_seasonal_naive_eval(spark, sf_dir):
    """Seasonal-naive vs one-step-naive MAE per series (the MASE
    denominator logic as a seasonality-value card): exact integer
    cents errors, int/int IEEE divisions, constant series NULL."""
    return TS.seasonal_naive_eval(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def stats_anova_oneway(spark, sf_dir):
    """One-way ANOVA F of order-value cents across priorities:
    exact integer group sums, each S_g^2/n_g term a fixed
    correctly-rounded double tree, terms accumulated through an
    ORDERED k-row cum window (merge-order-proof), p-value
    client-side like the rest of the stats suite."""
    return R.anova_oneway(_lt(spark, sf_dir, "orders"))


def stats_friedman(spark, sf_dir):
    """Friedman rank test (priorities blocked by order year): exact
    integer within-year ranks via rank() + equality count (half-rank
    ties stay integer when doubled), DECIMAL rank-sum squares, one
    correctly-rounded chi-square tree; complete blocks only."""
    return R.friedman_test(_lt(spark, sf_dir, "orders"))


def ev_funnel_timing(spark, sf_dir):
    """Funnel timing table (view->click->purchase + end-to-end):
    one conditional-min per-user aggregate, fixed pair stack, exact
    integer-microsecond lags with interpolated p50/p90 (the
    conversion_lag class)."""
    return E.funnel_timing(_lt(spark, sf_dir, "events"))


def ev_growth_accounting(spark, sf_dir):
    """Weekly growth accounting (new/retained/resurrected/churned):
    one per-user window pass over distinct (user, week), integer
    classification, churn closed only against contiguous weeks."""
    return E.growth_accounting(_lt(spark, sf_dir, "events"))


def q_basket_rules(spark, sf_dir):
    """Association rules (support/confidence/lift) over order
    baskets: part_affinity's capped inverted-index idiom, both
    directions, exact DECIMAL lift products, top-k via TakeOrdered
    on the total (lift, ids) order."""
    return R.basket_rules(_lt(spark, sf_dir, "lineitem"))


def q_price_elasticity(spark, sf_dir):
    """Log-log demand slope per brand: micro-ln-grid integer inputs,
    DECIMAL moment sums, slope/r2 on double-cast-first sums
    (logrank rule); constant-price groups NULL."""
    return R.price_elasticity(_lt(spark, sf_dir, "lineitem"),
                              _lt(spark, sf_dir, "part"))


def q_fulfillment_lag(spark, sf_dir):
    """Per-priority fulfillment-lag card: integer day lags off the
    q3-class join, int/int slow share and mean, exact median off the
    value-bounded lag curve (lo/hi crossing, half-integer grid) —
    stats and median in ONE aggregate over the curve."""
    return R.fulfillment_lag_profile(_lt(spark, sf_dir, "lineitem"),
                                     _lt(spark, sf_dir, "orders"))


def q_repeat_purchases(spark, sf_dir):
    """Repeat-purchase pairs: same customer re-ordering the same
    part within a year (chained lag adjacency per (customer, part),
    never O(m^2)); pure integer output."""
    return R.repeat_purchase_pairs(_lt(spark, sf_dir, "lineitem"),
                                   _lt(spark, sf_dir, "orders"))


def stats_brown_forsythe(spark, sf_dir):
    """Brown-Forsythe (median-based Levene) variance-homogeneity F
    across priorities: exact integer group medians from the
    value-bounded cents curve (2*median = lo+hi), ANOVA on integer
    half-cent |x - med| via the anova_oneway recipe."""
    return R.brown_forsythe(_lt(spark, sf_dir, "orders"))


def graph_part_assortativity(spark, sf_dir):
    """Newman degree assortativity of the part co-purchase graph:
    exact DECIMAL sums over the symmetrized edge list, r as one
    exact-int ratio (no sqrt); regular graph -> NULL."""
    from pyperustats_spark.operators import graph as G
    return G.copurchase_assortativity(_lt(spark, sf_dir, "lineitem"))


def text_log_odds_terms(spark, sf_dir):
    """Monroe et al. smoothed log-odds keywords per language vs the
    rest of the corpus: +1 prior keeps every odds ratio an exact
    integer ratio, ln on the 1e-6 grid, delta an exact integer
    difference (pure integer+string ranking), z a correctly-rounded
    tree."""
    return T.log_odds_terms(_lt(spark, sf_dir, "documents"))


def text_simpson_diversity(spark, sf_dir):
    """Simpson diversity / effective vocabulary per language: exact
    integer sum c(c-1) in DECIMAL(38,0), D and 1/D as exact-int-cast
    double divisions; no ln anywhere."""
    return T.simpson_diversity(_lt(spark, sf_dir, "documents"))


def stats_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t between urgent and other orders:
    one conditional-aggregate pass to exact integer (n, S, Q) per
    arm, then a single correctly-rounded double tree (mean, s^2,
    t, Welch-Satterthwaite df) — bit-identical cross-engine."""
    return R.welch_ttest(_lt(spark, sf_dir, "orders"))


def stats_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H across priorities: tied ranks from the
    value-bounded cents curve (histogram_cumsum, no global sort),
    2x rank sums exact in DECIMAL(38,0), k group terms through an
    ORDERED cum window, tie correction on exact integer ratios."""
    return R.kruskal_wallis(_lt(spark, sf_dir, "orders"))


def q_abc_pareto(spark, sf_dir):
    return R.abc_classification(_lt(spark, sf_dir, "lineitem"))


def ev_dispersion(spark, sf_dir):
    return E.dispersion_profile(_lt(spark, sf_dir, "events"))


def ts_cusum_binary_seg(spark, sf_dir):
    return TS.cusum_binary_segmentation(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_spearman(spark, sf_dir):
    return TS.spearman_matrix(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_pettitt(spark, sf_dir):
    return TS.pettitt_test(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def dedup_tfidf_cosine(spark, sf_dir):
    return D.tfidf_cosine_pairs(_lt(spark, sf_dir, "documents"))


def dedup_cdc_chunks(spark, sf_dir):
    return D.cdc_chunk_stats(_lt(spark, sf_dir, "documents"))


def dedup_cdc_profile(spark, sf_dir):
    return D.cdc_chunk_profile(_lt(spark, sf_dir, "documents"))


def dedup_cdc_incremental(spark, sf_dir):
    # recurring-release split shared with dedup_incremental /
    # dedup_paragraph_incremental: odd doc_ids = new batch, even =
    # released corpus
    docs = _lt(spark, sf_dir, "documents")
    return D.cdc_dedup_incremental(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0))


def dedup_paragraph_incremental(spark, sf_dir):
    # same recurring-release split as dedup_incremental: odd doc_ids =
    # new batch, even = released corpus; same ' a ' paragraph split as
    # dedup_paragraph
    docs = _lt(spark, sf_dir, "documents")
    return D.paragraph_dedup_incremental(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        delim=" a ", joiner=" a ")


def dedup_substring_decontaminate(spark, sf_dir):
    # recurring-release scenario (dedup_incremental's split): odd
    # doc_ids = the new batch, even = the released corpus it must not
    # literally overlap
    docs = _lt(spark, sf_dir, "documents")
    return D.exact_substring_decontaminate(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        n_tokens=20, winnow=5)


def dedup_minhash_lsh(spark, sf_dir):
    df = D.minhash_lsh_pairs(_lt(spark, sf_dir, "documents"))
    return _round(df, {"est_jaccard": 6})


def dedup_simhash_apply(spark, sf_dir):
    return D.dedup_filter_simhash(_lt(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", "n_chars")


def embedding_quantize_int8(spark, sf_dir):
    q = S.quantize_embeddings_int8(_lt(spark, sf_dir, "embeddings"))
    return _round(q.select("vec_id", "q_embedding", "q_scale"),
                  {"q_scale": 6}).orderBy("vec_id")


def dedup_minhash_apply(spark, sf_dir):
    return D.dedup_filter_minhash(_lt(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", "n_chars")


def dedup_simhash(spark, sf_dir):
    return D.simhash_fingerprints(_lt(spark, sf_dir, "documents"))


def dedup_semantic_apply(spark, sf_dir):
    """Rows-only: SemDeDup-style apply — IVF-cell cosine pairs → CC →
    anti-join (precision-exact in-cell scores; recall bounded in
    pytest vs the exact blocked baseline)."""
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    return D.dedup_filter_semantic(
        emb, threshold=0.97, n_centroids=16).select("vec_id", "label")


def dedup_embedding_cosine(spark, sf_dir):
    df = D.embedding_cosine_pairs(
        _lt(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")),
        threshold=0.2)
    return _round(df, {"cos": 6})


def knn_bruteforce_cosine(spark, sf_dir):
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.knn_bruteforce(emb, q, k=5), {"cos": 6})


def emb_radius_search(spark, sf_dir):
    """Exact threshold (radius) search: all corpus vectors with
    cosine ≥ 0.2 to each query — zero data-sized shuffles (queries
    broadcast, hits emitted per-partition)."""
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.radius_search(emb, q, threshold=0.2), {"cos": 6})


def emb_two_nn_id(spark, sf_dir):
    """Two-NN intrinsic-dimension MLE (Facco et al. 2017) on a
    md5-sampled anchor set: exact 2-NN squared-L2 via the brute-force
    baseline fold, ln(d2/d1) snapped to integer micro-log-units
    (exact bigint sum), id = 2e6*n/sum as an int/int division.
    Anchor slice is depth-adaptive (12.5% below 16384 corpus rows —
    bit-identical at every gate SF — then pinned at ~2048 anchors so
    the exact scan stays linear in depth); oracle reproduces the
    threshold formula verbatim."""
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    return S.two_nn_intrinsic_dim(emb)


def emb_radius_search_ivf(spark, sf_dir):
    """IVF-probed radius search (scale path): same contract, corpus
    restricted to the query's nprobe cells; recall pinned in pytest."""
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.radius_search_ivf(emb, q, threshold=0.2, nprobe=4),
                  {"cos": 6})


def ann_mips_dot(spark, sf_dir):
    """Exact top-k by raw inner product (MIPS) — recommendation-style
    retrieval where vector length carries signal; oracle-backed (same
    left-fold dot as knn, bit-identical to DuckDB list_sum)."""
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.mips_bruteforce(emb, q, k=5), {"ip": 6})


def ann_hamming_rerank(spark, sf_dir):
    """Rows-only: Hamming-shortlist -> exact-cosine rerank (the stored-
    signature deployment composition; exhaustive-shortlist == knn and
    a recall floor pinned in pytest)."""
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.ann_hamming_rerank(emb, q, k=5, shortlist=50),
                  {"cos": 6})


def ann_hamming_topk(spark, sf_dir):
    """Binary-quantized Hamming top-k (r11): sign-bit signatures in
    32-bit words, popcount-of-xor distance — every value integer, so
    unlike the float-distance ANN family this one carries a FULL
    DuckDB value oracle."""
    emb = _lt(spark, sf_dir, "embeddings")
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return S.ann_hamming(emb, q, k=5)


def ann_mips_ivf(spark, sf_dir):
    """Rows-only: norm-augmented IVF MIPS (reduction to cosine cells;
    exhaustive-probe==exact and partial-probe recall pinned in pytest)."""
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.mips_ivf(emb, q, k=5, nprobe=4), {"ip": 6})


def ann_lsh_cosine(spark, sf_dir):
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.ann_lsh(emb, q, k=5), {"cos": 6})


def multimodal_features(spark, sf_dir):
    """Rows-only: Arrow mapInPandas feature extraction over deterministic
    synthetic media (payload bytes are the pipeline input; codec decode
    itself is stubbed — see pyperustats_spark/multimodal/binary_ops.py)."""
    from pyperustats_spark.multimodal import binary_ops as MM

    media = MM.synthesize_media(spark, n=96).repartition(8)
    return MM.extract_features(media).select(
        "media_id", "kind", "n_bytes", "sha256",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.round("byte_entropy_proxy", 6).alias("byte_entropy_proxy"),
    ).orderBy("media_id")


def multimodal_image_dims(spark, sf_dir):
    """REAL stdlib image decode, oracle-backed: synthesize one
    spec-conformant PNG/JPEG/GIF/BMP header payload per document id
    (dimensions/bit depth are integer arithmetic on doc_id, with a
    planted truncated payload every 23rd id), then parse the binary
    column back with pyperustats_spark.multimodal.binary_ops.
    parse_image_header inside Arrow mapInPandas. The DuckDB oracle
    recomputes the expected (format, width, height, bit_depth)
    arithmetically — an encode→parse round trip where a bug in either
    half breaks value parity."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.image_dims(MM.synthesize_corpus_images(docs)) \
        .orderBy("doc_id")


def multimodal_wav_stats(spark, sf_dir):
    """REAL stdlib audio decode, oracle-backed: synthesize one PCM16
    WAV payload per document id (channels/rate/frames and the sample
    recurrence are integer arithmetic on doc_id; a truncated RIFF
    container planted every 19th id), then parse the binary column
    back END TO END — container walk, fmt fields, and the actual
    int16 samples (sum of |amplitude| + peak) — with
    pyperustats_spark.multimodal.binary_ops.parse_wav inside Arrow
    mapInPandas. The DuckDB oracle recomputes every field, including
    the per-sample stats via a lateral generate_series over the same
    recurrence — a bug in the encoder, the container walk, or the
    sample decode breaks value parity."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.wav_stats(MM.synthesize_corpus_wavs(docs)) \
        .orderBy("doc_id")


def multimodal_png_pixel_stats(spark, sf_dir):
    """FULL stdlib image decode, oracle-backed: synthesize one
    spec-conformant RGB PNG per document id (pixel recurrence on
    doc_id, ALL FIVE PNG filter types cycled across rows, a
    CRC-flipped payload planted every 29th id), then decode the
    binary column for real — chunk walk + CRC verify + zlib inflate
    + scanline unfiltering — and aggregate per-channel pixel sums and
    peak, all inside Arrow mapInPandas
    (pyperustats_spark.multimodal.binary_ops.decode_png_pixels). The
    DuckDB oracle recomputes the stats from the same recurrence via
    unnest(range(...)) — a bug anywhere in the encoder, the filters,
    the inflate plumbing, or the integrity check breaks parity."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.png_pixel_stats(MM.synthesize_corpus_pngs(docs)) \
        .orderBy("doc_id")


def multimodal_gif_pixel_stats(spark, sf_dir):
    """FULL stdlib GIF decode, oracle-backed (r11): synthesize one
    spec-conformant GIF89a per document id — genuine variable-width
    LZW stream with dictionary growth, palette/index recurrences on
    doc_id, a truncated payload planted every 31st id — then decode
    the binary column for real (descriptor walk + LZW decompress,
    binary_ops.decode_gif_pixels, whose code-width rule is pinned
    against a hand-computed spec vector) and aggregate palette-mapped
    RGB sums + peak index in Arrow mapInPandas. The oracle recomputes
    everything from the same arithmetic — a bug anywhere in the LZW
    encoder, the decoder's width counters, or the palette mapping
    breaks parity."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.gif_pixel_stats(MM.synthesize_corpus_gifs(docs)) \
        .orderBy("doc_id")


def multimodal_bmp_pixel_stats(spark, sf_dir):
    """FULL BMP decode, oracle-backed (r11): synthesize one REAL BMP
    per document id — 8-bit palettized and 24-bit BI_RGB alternating,
    BOTH row orders (odd ids top-down/negative height, even ids the
    bottom-up default), stride padding exercised by the width
    recurrence, a length-truncated payload planted every 27th id —
    then decode the binary column for real (header walk + palette
    load + row reorder, binary_ops.decode_bmp_pixels) and aggregate
    per-channel sums, the TOP-LEFT pixel's red (fails if row order is
    ignored: sums are orientation-invariant, first_r is not) and the
    peak byte in Arrow mapInPandas. The DuckDB oracle recomputes
    everything from the same integer recurrences."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.bmp_pixel_stats(MM.synthesize_corpus_bmps(docs)) \
        .orderBy("doc_id")


def multimodal_flac_meta(spark, sf_dir):
    """REAL FLAC metadata decode, oracle-backed: synthesize one FLAC
    metadata stream per document id (STREAMINFO's bit-packed 20/3/5/36
    field layout genuinely packed and unpacked, a PADDING block every
    5th id so the chain walk is exercised, a PADDING length overrun
    planted every 31st id), then parse the binary column back with
    binary_ops.parse_flac_meta inside Arrow mapInPandas. The stored
    raw-audio MD5 is md5(str(doc_id)), so the DuckDB oracle
    recomputes every field — including the hex digest — without
    touching the binary; duration is integer division (exact both
    engines on positive operands)."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.flac_meta(MM.synthesize_corpus_flacs(docs)) \
        .orderBy("doc_id")


def multimodal_mp3_meta(spark, sf_dir):
    """REAL MPEG-1 Layer III stream walk, oracle-backed: synthesize
    one CBR mp3 per document id (genuine frame headers, the real
    144000*kbps/rate frame-size formula, variable padding, ID3v2
    syncsafe tags every 4th id, a truncated final frame planted
    every 29th id) and walk it back with binary_ops.parse_mp3 inside
    Arrow mapInPandas. The DuckDB oracle recomputes every field
    arithmetically (bitrate/rate tables as list literals, padding
    count via list_filter over range)."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.mp3_meta(MM.synthesize_corpus_mp3s(docs)) \
        .orderBy("doc_id")


def multimodal_zip_meta(spark, sf_dir):
    """REAL ZIP central-directory walk, oracle-backed: synthesize one
    STORED-entry archive per document id (real CRC-32s, local +
    central headers + EOCD; EOCD signature zeroed every 41st id so
    the tail anchor scan must fail) and walk it back with
    binary_ops.parse_zip inside Arrow mapInPandas. The oracle
    recomputes entry/byte totals from the deterministic name/content
    grammar via list_transform sums."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.zip_meta(MM.synthesize_corpus_zips(docs)) \
        .orderBy("doc_id")


def multimodal_webp_meta(spark, sf_dir):
    """REAL WebP container decode, oracle-backed: synthesize one RIFF
    container per document id — VP8L lossless headers (bit-packed
    14-bit dims) for odd ids, VP8X extended (24-bit LE canvas) for
    even, dummy EXIF chunks exercising the RIFF pad rule, an
    inflated RIFF size planted every 43rd id — and decode it back
    with binary_ops.parse_webp inside Arrow mapInPandas."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.webp_meta(MM.synthesize_corpus_webps(docs)) \
        .orderBy("doc_id")


def multimodal_pdf_meta(spark, sf_dir):
    """REAL classic-xref PDF structural walk, oracle-backed:
    synthesize one spec-conformant document per doc id (catalog /
    pages tree / per-page MediaBox, a byte-exact cross-reference
    table, trailer + startxref; a +3-shifted startxref planted every
    47th id), then walk it back with binary_ops.parse_pdf — every
    xref entry's offset VERIFIED against the object it points at,
    page tree followed through the xref, never a text search. The
    DuckDB oracle recomputes all fields including the xref offset
    via string-length arithmetic over the same literal grammar."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.pdf_meta(MM.synthesize_corpus_pdfs(docs)) \
        .orderBy("doc_id")


def multimodal_tiff_meta(spark, sf_dir):
    """REAL TIFF metadata decode, oracle-backed (r11): synthesize one
    multi-page TIFF per document id — byte order FLIPS per id (II
    little-endian / MM big-endian are equally valid TIFF), page count
    1-3 via a genuine IFD linked-list chain, LONG and SHORT tag types
    both exercised, a first-IFD offset pointing past EOF planted every
    37th id — then walk the binary column back with
    binary_ops.parse_tiff inside Arrow mapInPandas (endian, page
    count, first-page dims + bit depth, total pixels across pages).
    The DuckDB oracle recomputes every field arithmetically, the
    cross-page pixel total via unnest(range(n_pages))."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.tiff_meta(MM.synthesize_corpus_tiffs(docs)) \
        .orderBy("doc_id")


def multimodal_mp4_meta(spark, sf_dir):
    """REAL stdlib video-container decode, oracle-backed: synthesize
    one minimal ISO BMFF (MP4) payload per document id — ftyp brand,
    mvhd timescale/duration, one tkhd per track with 16.16
    fixed-point dimensions, audio (0×0) tracks planted on odd ids,
    a mid-moov truncation every 31st id — then box-walk the binary
    column back with pyperustats_spark.multimodal.binary_ops.
    parse_mp4 inside Arrow mapInPandas. The DuckDB oracle recomputes
    (brand, duration_ms, n_tracks, width, height) arithmetically.
    Frame decode stays behind the codec gate (needs ffmpeg); this is
    the container-metadata half a routing/stats pipeline needs."""
    from pyperustats_spark.functions.layout import ensure_parallelism
    from pyperustats_spark.multimodal import binary_ops as MM

    docs = ensure_parallelism(
        _lt(spark, sf_dir, "documents").select("doc_id"))
    return MM.mp4_meta(MM.synthesize_corpus_mp4s(docs)) \
        .orderBy("doc_id")


def multimodal_frame_sample(spark, sf_dir):
    """Rows-only: 1→N video frame sampling through mapInPandas."""
    from pyperustats_spark.multimodal import binary_ops as MM

    media = MM.synthesize_media(spark, n=96).repartition(8)
    frames = MM.frame_sample(media, every_n_bytes=128, max_frames=4)
    return frames.select(
        "media_id", "frame_idx", F.length("frame_payload").alias("frame_bytes")
    ).orderBy("media_id", "frame_idx")


def ev_json_props_stats(spark, sf_dir):
    return E.json_props_stats(_lt(spark, sf_dir, "events"))


def catalog_series_summary(spark, sf_dir):
    df = TS.catalog_series_summary(TS.series_long(_lt(spark, sf_dir, "lineitem")))
    return _round(df, {"latest_value": 4})


def stats_profile(spark, sf_dir):
    return R.stats_profile(_lt(spark, sf_dir, "lineitem"))


def dedup_clusters(spark, sf_dir):
    """Fuzzy-dedup clusters: jaccard pairs -> iterative connected
    components -> canonical per cluster. Full oracle via DuckDB
    recursive CTE over the same pair SQL."""
    return D.dedup_clusters(_lt(spark, sf_dir, "documents"))


def dedup_cluster_sizes(spark, sf_dir):
    """Dedup-impact diagnostic: how many near-dup clusters exist at
    each size (the histogram a cleaning report publishes). Derived
    from the same pairs->CC labels; two tiny count shuffles on top."""
    cl = D.dedup_clusters(_lt(spark, sf_dir, "documents"), sort=False)
    sizes = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


def text_pii_scrub(spark, sf_dir):
    return T.pii_scrub(_lt(spark, sf_dir, "documents"))


def dedup_keep_latest(spark, sf_dir):
    """Latest order per customer (current-version dedup); o_orderkey as
    deterministic tiebreaker for same-date orders."""
    orders = _lt(spark, sf_dir, "orders").withColumn(
        "_ord", F.struct(F.col("o_orderdate"), F.col("o_orderkey")))
    df = TS.keep_latest(orders, ["o_custkey"], "_ord").drop("_ord")
    return _round(
        df.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey"),
        {"o_totalprice": 2},
    )


def ts_align_full_outer(spark, sf_dir):
    long_df = TS.series_long(_lt(spark, sf_dir, "lineitem"))
    a = long_df.where(F.col("code") == "AF")
    b = long_df.where(F.col("code") == "NO")
    df = TS.align_full_outer(
        a.select("date", "value"), b.select("date", "value"),
        on=["date"], left_val="value", right_val="value")
    return _round(df, {"left_value": 4, "right_value": 4})


def profile_orders(spark, sf_dir):
    return R.profile_table(
        _lt(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_totalprice", "o_orderdate", "o_custkey"])


def sample_systematic(spark, sf_dir):
    df = R.systematic_sample(_lt(spark, sf_dir, "orders"), "o_orderkey")
    return df.select("o_orderkey", "o_orderstatus",
                     F.round("o_totalprice", 2).alias("o_totalprice"))


def q_repeat_customers(spark, sf_dir):
    return R.repeat_customers(_lt(spark, sf_dir, "orders"))


def stats_profile_approx(spark, sf_dir):
    return R.stats_profile_approx(_lt(spark, sf_dir, "lineitem"))


def q_customers_no_orders(spark, sf_dir):
    return R.customers_without_orders(
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "orders"))


def q_sales_rollup(spark, sf_dir):
    return R.sales_rollup(_lt(spark, sf_dir, "orders"))


def q_customer_quartiles(spark, sf_dir):
    return R.customer_value_quartiles(
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "orders"))


def ts_zscore_anomalies(spark, sf_dir):
    df = TS.rolling_zscore_anomalies(TS.series_long(_lt(spark, sf_dir, "lineitem")))
    return _round(df, {"value": 4, "zscore": 6})


def ts_interpolate_linear(spark, sf_dir):
    # pre-round the series: both engines then interpolate IDENTICAL
    # doubles (raw sums differ in low bits by summation order, which
    # flips the final rounding at half boundaries)
    long_df = TS.series_long(_lt(spark, sf_dir, "lineitem")).withColumn(
        "value", F.round("value", 4))
    df = TS.interpolate_linear(long_df)
    # value_interp stays unrounded: both engines now compute the SAME
    # double (identical rounded inputs, identical op order), and any
    # engine-side round(x, 4) would split on exact .00005 midpoints
    return _round(df, {"observed": 4})


def embedding_centroids(spark, sf_dir):
    # flat long form (label, dim, mean_v, n_members): scalar-only
    # columns — the array<double> centroid of the assembled form cannot
    # be canonicalized by the driver's pandas-based comparator (r6
    # 'unhashable type: list'); tests/test_docs.py now guards every
    # oracle-backed entry against complex output types
    return S.embedding_centroids(_lt(spark, sf_dir, "embeddings"),
                                 flat=True)


def embedding_separation(spark, sf_dir):
    """Per-label cluster tightness vs nearest-centroid distance
    (centroid silhouette simplification; scalar-only output)."""
    return S.label_separation(_lt(spark, sf_dir, "embeddings"))


def emb_kcenter_sample(spark, sf_dir):
    """Greedy k-center coreset selection + nearest-center assignment
    (rows-only: the greedy pick sequence is defined by floating-point
    argmaxes with no SQL analog worth unrolling; bit-equality vs a
    Python greedy model and cover-radius properties pinned in
    pytest)."""
    return S.kcenter_sample(_lt(spark, sf_dir, "embeddings"), k=8)


def text_lang_confusion(spark, sf_dir):
    return T.lang_confusion(_lt(spark, sf_dir, "documents"))


def skew_salted_join(spark, sf_dir):
    from pyperustats_spark.operators import skew as SK

    df = SK.salted_join(
        _lt(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("k"), "l_extendedprice"),
        _lt(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"), "o_orderstatus"),
        key="k", salt_n=8,
    )
    out = df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_extendedprice").alias("sum_price"),
    )
    return _round(out, {"sum_price": 2}).orderBy("o_orderstatus")


def skew_salted_distinct(spark, sf_dir):
    from pyperustats_spark.operators import skew as SK

    return SK.salted_distinct_count(
        _lt(spark, sf_dir, "events"), "event_type", "user_id", salt_n=8)


def q_bloom_pruned_join(spark, sf_dir):
    # explicit Bloom-prefiltered join: the small side's key set becomes
    # a 16 KB bitmap (one agg over the SMALL side), the big side is
    # row-locally prefiltered before anything shuffles; result is
    # row-for-row the plain join (no false negatives; the join kills
    # the false positives) so the oracle is the plain join's SQL
    from pyperustats_spark.operators import skew as SK

    li = _lt(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    o = (
        _lt(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= "1995-01-01")
               & (F.col("o_orderdate") < "1995-04-01"))
        .select(F.col("o_orderkey").alias("l_orderkey"),
                "o_orderpriority")
    )
    j = SK.bloom_prefilter_join(li, o, "l_orderkey")
    return (
        j.groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("o_orderpriority")
    )


def knn_label_vote(spark, sf_dir):
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return S.knn_label_vote(emb, q, k=5)


def org_slugify_rename(spark, sf_dir):
    from pyperustats_spark.operators import organizer as ORG

    df = ORG.slugify_collision_safe(
        _lt(spark, sf_dir, "part"), "p_name", ["p_brand"], "p_partkey")
    return df.select("p_partkey", "p_brand", "slug", "collision_idx",
                     "final_name").orderBy("p_partkey")


def org_inventory_by_group(spark, sf_dir):
    from pyperustats_spark.operators import organizer as ORG

    orders = _lt(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate"))
    df = ORG.inventory_by_group(orders, ["o_orderstatus", "order_year"],
                                "o_totalprice")
    return _round(df, {"total_size": 4, "max_size": 4})


def org_content_dedup_map(spark, sf_dir):
    from pyperustats_spark.operators import organizer as ORG

    return ORG.content_dedup_map(_lt(spark, sf_dir, "documents"))


def _sim_manifest(docs):
    """Deterministic simulated ingest manifest over `documents` (the
    parquet-only stand-in for an INEI archive member list): entries for
    all docs except doc_id%53==0 (those arrive UNLISTED), a rotted
    expected hash for doc_id%37==0 (CORRUPT), plus ghost entries at
    doc_id+10M for doc_id%41==0 (MISSING — listed, never arrived).
    Every branch is modulo + md5, so the DuckDB oracle rebuilds the
    identical manifest."""
    listed = docs.where(F.col("doc_id") % 53 != 0).select(
        "doc_id", "source",
        F.when(F.col("doc_id") % 37 == 0,
               F.md5(F.concat(F.col("text"), F.lit("!"))))
        .otherwise(F.md5(F.col("text"))).alias("expected_hash"))
    ghosts = docs.where(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "source",
        F.md5(F.col("doc_id").cast("string")).alias("expected_hash"))
    return listed.unionByName(ghosts)


def ingest_manifest_quarantine(spark, sf_dir):
    from pyperustats_spark.operators import organizer as ORG

    docs = _lt(spark, sf_dir, "documents")
    df = ORG.manifest_quarantine(docs, _sim_manifest(docs))
    return df.select("doc_id", "source", "content_hash", "status")


def ingest_integrity_card(spark, sf_dir):
    from pyperustats_spark.operators import organizer as ORG

    docs = _lt(spark, sf_dir, "documents")
    return ORG.ingest_integrity_card(docs, _sim_manifest(docs))


def mef_filter_rows(spark, sf_dir):
    df = R.filter_rows_regex(_lt(spark, sf_dir, "part"), "p_type",
                             ["promo", "economy"])
    return df.select("p_partkey", "p_name", "p_type").orderBy("p_partkey")


def mef_find_row_by_text(spark, sf_dir):
    df = R.find_row_by_text(_lt(spark, sf_dir, "part"), "p_name",
                            "p_partkey", "widget")
    return df.select("p_partkey", "p_name").orderBy("p_partkey")


def mef_get_grp_from_row(spark, sf_dir):
    # positional code extraction (reference MEF get_grp_from_row):
    # the grp code on row 2 of the part table ordered by its key
    return R.get_grp_from_row(_lt(spark, sf_dir, "part"), "p_brand",
                              "p_partkey", row_index=2)


def infogob_candidate_history(spark, sf_dir):
    return R.candidate_history(_lt(spark, sf_dir, "orders"),
                               _lt(spark, sf_dir, "customer"))


def mtc_paged_concat(spark, sf_dir):
    df = R.paged_concat_rename(_lt(spark, sf_dir, "orders"))
    return _round(df, {"amount": 4})


def text_rolling_hash(spark, sf_dir):
    return T.rolling_hash_fingerprint(_lt(spark, sf_dir, "documents"))


def ann_ivf_cosine(spark, sf_dir):
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.ann_ivf(emb, q, k=5), {"cos": 6})


def stream_sessionize(spark, sf_dir):
    """Structured Streaming session_window sessionization; FULL oracle:
    gap-merge semantics equal the batch lag+cumsum sessionizer."""
    import tempfile

    from pyperustats_spark.streaming import events as SEV

    src = tempfile.mkdtemp(prefix="sg_sess_src_")
    ckpt = tempfile.mkdtemp(prefix="sg_sess_ckpt_")
    _lt(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).coalesce(4).write.mode("overwrite").parquet(src)
    stream = SEV.read_events_stream(spark, src)
    sess = SEV.stream_sessionize(stream, gap="30 minutes", watermark="1 hour")
    _STREAM_SEQ[0] += 1
    out = SEV.run_to_memory(
        sess, f"sg_sess_out_{_STREAM_SEQ[0]}", ckpt, output_mode="complete"
    )
    return _round(
        out.select("user_id", "session_start", "session_end", "n_events",
                   "sum_value").orderBy("user_id", "session_start"),
        {"sum_value": 4},
    )


def stream_dedup_replay(spark, sf_dir):
    """Full oracle: a twice-replayed feed deduped by event_id must equal
    the original events table exactly."""
    import tempfile

    from pyperustats_spark.streaming import events as SEV

    src = tempfile.mkdtemp(prefix="sg_dedup_src_")
    ckpt = tempfile.mkdtemp(prefix="sg_dedup_ckpt_")
    base = _lt(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    base.coalesce(2).write.mode("overwrite").parquet(src)
    base.coalesce(2).write.mode("append").parquet(src)
    stream = SEV.read_events_stream(spark, src)
    deduped = SEV.stream_dedup(stream, watermark="10 days")
    _STREAM_SEQ[0] += 1
    out = SEV.run_to_memory(
        deduped, f"sg_dedup_out_{_STREAM_SEQ[0]}", ckpt, output_mode="append")
    return _round(
        out.select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id"),
        {"value": 6},
    )


_STREAM_SEQ = [0]


def stream_tumbling_window(spark, sf_dir):
    """Rows-only: Structured Streaming tumbling window (availableNow file
    replay → memory sink), matched against the batch operator in pytest."""
    import tempfile

    from pyperustats_spark.streaming import events as SEV

    src = tempfile.mkdtemp(prefix="sg_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="sg_stream_ckpt_")
    _lt(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).coalesce(4).write.mode("overwrite").parquet(src)
    stream = SEV.read_events_stream(spark, src, max_files_per_trigger=2)
    agg = SEV.stream_tumbling_window(stream, window="24 hours", watermark="1 hour")
    _STREAM_SEQ[0] += 1
    out = SEV.run_to_memory(
        agg, f"sg_stream_out_{_STREAM_SEQ[0]}", ckpt, output_mode="complete"
    )
    return _round(
        out.select("window_start", "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type"),
        {"sum_value": 4},
    )


def dedup_incremental(spark, sf_dir):
    # recurring-release scenario: even doc_ids = the already-released
    # corpus snapshot, odd = the new crawl batch (both SF-proportional)
    docs = _lt(spark, sf_dir, "documents")
    return D.dedup_incremental(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        prefix_chars=40,
    )


def dedup_incremental_bloom(spark, sf_dir):
    """Incremental dedup with the released corpus Bloom-pruned before
    its distinct+anti-join (batch keys → 8 KB bitmap → row-local
    corpus prefilter): the corpus-proportional key shuffle becomes
    batch-proportional. The split is the bloom's actual sweet spot —
    a 1% "daily crawl" batch vs the 99% released history (the plain
    dedup_incremental entry keeps the 50/50 split where the bitmap
    would saturate). Result provably equals the plain anti-join, so
    the oracle is the plain incremental-dedup SQL on this split."""
    docs = _lt(spark, sf_dir, "documents")
    return D.dedup_incremental_bloom(
        docs.where(F.col("doc_id") % 100 == 1),
        docs.where(F.col("doc_id") % 100 != 1),
        prefix_chars=40,
    )


def dedup_stats_by_source(spark, sf_dir):
    return D.dedup_stats_by_source(_lt(spark, sf_dir, "documents"),
                                   prefix_chars=40)


def dedup_source_overlap(spark, sf_dir):
    return D.source_overlap(_lt(spark, sf_dir, "documents"),
                            prefix_chars=40)


def split_leakage_safe(spark, sf_dir):
    return D.split_leakage_safe(_lt(spark, sf_dir, "documents"),
                                val_pct=10, prefix_chars=40)


def release_rehearsal(spark, sf_dir):
    """End-to-end recurring-release dress rehearsal as ONE lazy plan:
    dedup_incremental (odd ids = new crawl vs even ids = released
    corpus) → quality_filter(0.75) → decontaminate(EVAL_SNIPPETS) →
    split_leakage_safe(10%). The export_shards landing step is
    exercised in pytest (tests/test_exporter.py) — queries() returns
    frames, not directories."""
    from pyperustats_spark.api import incremental_release

    docs = _lt(spark, sf_dir, "documents")
    eval_df = spark.createDataFrame(EVAL_SNIPPETS, "eid int, text string")
    return incremental_release(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        eval_df, val_pct=10, min_score=0.75, prefix_chars=40)


def ev_transitions(spark, sf_dir):
    return E.event_transitions(_lt(spark, sf_dir, "events"))


def text_length_histogram(spark, sf_dir):
    return T.length_histogram(_lt(spark, sf_dir, "documents"))


def text_drop_short_tail(spark, sf_dir):
    return T.drop_short_tail(_lt(spark, sf_dir, "documents"), p=0.10)


def text_drop_short_tail_approx(spark, sf_dir):
    """GK-threshold twin of text_drop_short_tail (rows-only: the
    per-language quantile threshold is a sketch estimate; keep-rate
    and threshold-ordering properties pinned in pytest)."""
    return T.drop_short_tail_approx(_lt(spark, sf_dir, "documents"),
                                    p=0.10)


def dedup_substring_novelty(spark, sf_dir):
    """Graded novelty card on the recurring-release split (odd ids =
    batch, even = released corpus) — the score whose binary cut is
    dedup_substring_decontaminate."""
    docs = _lt(spark, sf_dir, "documents")
    return D.substring_novelty_profile(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        n_tokens=20, winnow=5)


def ev_skew_profile(spark, sf_dir):
    from pyperustats_spark.operators import skew as SK
    return SK.key_skew_profile(_lt(spark, sf_dir, "events"),
                               "user_id", k=10)


def ev_burst_profile(spark, sf_dir):
    return E.burst_profile(_lt(spark, sf_dir, "events"),
                           window_seconds=3600, burst_threshold=5)


def ev_burst_skew(spark, sf_dir):
    """burst_profile on the ghost-row chunked counter
    (burst_profile_chunked): identical output to ev_burst_profile —
    same oracle — but the biggest window task holds one user-DAY of
    events (+ the boundary ghosts), not one user."""
    return E.burst_profile_chunked(_lt(spark, sf_dir, "events"),
                                   window_seconds=3600,
                                   burst_threshold=5)


def text_token_budget_sample(spark, sf_dir):
    return T.token_budget_sample(_lt(spark, sf_dir, "documents"),
                                 budget=700)


def text_quality_by_source(spark, sf_dir):
    return T.quality_by_source(_lt(spark, sf_dir, "documents"), cut=0.75)


def q19_disjunctive_revenue(spark, sf_dir):
    return R.disjunctive_promo_revenue(_lt(spark, sf_dir, "lineitem"),
                                       _lt(spark, sf_dir, "part"))


def catalog_fuzzy_search(spark, sf_dir):
    return R.catalog_fuzzy_search(_lt(spark, sf_dir, "part"),
                                  "smal widget", max_dist=4, k=15)


def embedding_norm_profile(spark, sf_dir):
    return S.norm_profile(_lt(spark, sf_dir, "embeddings"))


def q_orphan_check(spark, sf_dir):
    return R.referential_orphans(_lt(spark, sf_dir, "orders"),
                                 _lt(spark, sf_dir, "customer"),
                                 "o_custkey", "c_custkey")


def ts_decompose(spark, sf_dir):
    return _round(
        TS.decompose_additive(
            TS.series_long(_lt(spark, sf_dir, "lineitem"))),
        {"value": 4},
    )


def ts_rebase_index(spark, sf_dir):
    # value engine-rounds to 4 (grid recovery, as in every ts_* query);
    # index_value is a derived ratio of grid-recovered inputs -> RAW
    return _round(
        TS.rebase_index(
            TS.series_long(_lt(spark, sf_dir, "lineitem")), "1996-01-05"),
        {"value": 4},
    )


def catalog_coverage(spark, sf_dir):
    return R.catalog_coverage_report(_lt(spark, sf_dir, "part"),
                                     _lt(spark, sf_dir, "orders"),
                                     _lt(spark, sf_dir, "lineitem"))


def ts_beta(spark, sf_dir):
    return TS.series_beta(TS.series_long(_lt(spark, sf_dir, "lineitem")),
                          "AF", "NO")


def ts_rolling_median(spark, sf_dir):
    """Exact centered rolling median (robust smoother); explicit
    two-element median formula mirrored in the oracle."""
    return TS.rolling_median(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_seasonal_strength(spark, sf_dir):
    """Per-series seasonality/trend strength (tsfeatures): variances
    via ordered cumsums -> deterministic; strengths raw."""
    return TS.seasonal_strength(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ev_activity_powerlaw(spark, sf_dir):
    """Power-law exponent of per-user activity (CSN continuous MLE,
    grid-snapped ln sums) — the skew data card."""
    return E.activity_powerlaw_fit(_lt(spark, sf_dir, "events"))


def ts_theil_sen(spark, sf_dir):
    """Per-series Theil-Sen robust slope over monthly resamples
    (in-array pairwise slopes, two-middle median; cents-exact)."""
    return TS.theil_sen_slope(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_rolling_mad(spark, sf_dir):
    """Rolling-median/MAD anomaly flags per series (bounded window,
    exact two-middle formulas, bit-identical threshold compare)."""
    return TS.rolling_mad_anomalies(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_ols_trend(spark, sf_dir):
    """Per-series OLS time trend in exact fixed-point sums — slope/
    intercept/r2 are derived doubles from identical integer bits and
    ship RAW (never round derived)."""
    return TS.ols_trend(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ev_rfm_scores(spark, sf_dir):
    """RFM quartile segmentation over purchase events; integer-cents
    monetary + user_id tiebreaks make every tile deterministic;
    histogram_ntile (value-derived rank) avoids the global-ntile
    exchange-reuse trap on this wide frame."""
    return E.rfm_scores(_lt(spark, sf_dir, "events"))


def text_lang_purity(spark, sf_dir):
    return T.lang_purity_by_source(_lt(spark, sf_dir, "documents"))


def text_readability(spark, sf_dir):
    """Flesch / Flesch-Kincaid per doc from pure-regexp counts; the
    two ratios are int/int raw doubles, the formulas literal
    arithmetic on identical bits in oracle-mirrored order."""
    return T.readability(_lt(spark, sf_dir, "documents"))


def ev_bot_regularity(spark, sf_dir):
    """Metronomic-user flag: cv of inter-event gaps compared in exact
    integer arithmetic (10000·(cQ−S²) ≤ cv²·S²); cv ships raw."""
    return E.bot_regularity(_lt(spark, sf_dir, "events"))


def text_zipf_fit(spark, sf_dir):
    """Per-language Zipf exponent via the exact fixed-point OLS core
    (ln values on the 1e-6 micro grid); slope/intercept/r2 ship RAW."""
    return T.zipf_fit(_lt(spark, sf_dir, "documents"))


def ev_gap_stats(spark, sf_dir):
    return E.inter_event_gap_stats(_lt(spark, sf_dir, "events"))


def ev_gap_stats_approx(spark, sf_dir):
    return E.inter_event_gap_stats_approx(_lt(spark, sf_dir, "events"))


def stats_winsorize_approx(spark, sf_dir):
    return R.winsorize_summary_approx(_lt(spark, sf_dir, "lineitem"),
                                      "l_returnflag", "l_extendedprice")


def ts_max_drawdown(spark, sf_dir):
    return TS.max_drawdown(TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ev_attribution_first(spark, sf_dir):
    return E.first_touch_attribution(_lt(spark, sf_dir, "events"))


def ts_xcorr(spark, sf_dir):
    return TS.cross_correlation(
        TS.series_long(_lt(spark, sf_dir, "lineitem")), "AF", "NO")


def dedup_threshold_sweep(spark, sf_dir):
    return D.jaccard_threshold_sweep(_lt(spark, sf_dir, "documents"))


def q13_order_distribution(spark, sf_dir):
    return R.customer_order_distribution(_lt(spark, sf_dir, "customer"),
                                         _lt(spark, sf_dir, "orders"))


def q22_rich_inactive(spark, sf_dir):
    return R.above_avg_inactive_customers(_lt(spark, sf_dir, "customer"),
                                          _lt(spark, sf_dir, "orders"),
                                          since="1999-01-01")


def q17_small_qty_revenue(spark, sf_dir):
    return R.small_quantity_revenue(_lt(spark, sf_dir, "lineitem"),
                                    _lt(spark, sf_dir, "part"))


def q18_large_orders(spark, sf_dir):
    return R.large_orders(_lt(spark, sf_dir, "customer"),
                          _lt(spark, sf_dir, "orders"),
                          _lt(spark, sf_dir, "lineitem"))


def ann_ivf_cell_stats(spark, sf_dir):
    return S.ivf_cell_stats(_lt(spark, sf_dir, "embeddings"),
                            n_centroids=16)


def text_char_entropy(spark, sf_dir):
    return T.char_entropy(_lt(spark, sf_dir, "documents"))


def dedup_minhash_eval(spark, sf_dir):
    return D.minhash_eval_vs_exact(_lt(spark, sf_dir, "documents"),
                                   n=3, threshold=0.4)


def dedup_simhash_eval(spark, sf_dir):
    return D.simhash_eval_vs_exact(_lt(spark, sf_dir, "documents"),
                                   n=3, threshold=0.4, max_hamming=8)


def ann_pq_rerank_l2(spark, sf_dir):
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.ann_pq_rerank(emb, q, k=5, shortlist=50, m=8,
                                  n_codewords=16), {"dist": 6})


def ann_ivf_pq_rerank(spark, sf_dir):
    # the combined pipeline: IVF cell shortlist -> ADC within probed
    # cells -> exact re-rank (rows-only; recall pinned in pytest vs
    # brute force at equal candidate budget)
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    # adc_join=True: the scale form (tables as a broadcast relation,
    # plan flat in query count) — bit-identical to the literal form
    # (pytest-pinned) and measured >= as fast at sf0.1
    return _round(S.ann_ivf_pq(emb, q, k=5, n_centroids=16, nprobe=4,
                               shortlist=50, m=8, n_codewords=16,
                               adc_join=True),
                  {"dist": 6})


def embedding_pca_variance(spark, sf_dir):
    # rows-only: the PCA scree profile (eigendecomposition isn't SQL);
    # moment stats computed distributed, only the 64x64 matrix reaches
    # the driver; pinned against numpy PCA in pytest
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    return S.pca_variance_profile(emb, dim=64, k=16)


def ev_heavy_hitters_sketch(spark, sf_dir):
    # count-min sketch calibration eval: exact top-k user counts
    # re-priced from the depth x width counter table (the mergeable
    # point-frequency sketch beside HLL/KMV/GK); rows-only — sketch
    # internals have no SQL oracle; never-underestimates + epsilon-N
    # bound + shard-mergeability pinned in pytest
    return E.heavy_hitters_sketch_eval(
        _lt(spark, sf_dir, "events"), key_col="user_id", k=10,
        depth=4, width=256)


def ann_opq_rerank(spark, sf_dir):
    # OPQ-style PQ search: full-rank PCA rotation (distance-preserving
    # orthonormal basis, fit distributed — only the 64x64 matrix
    # reaches the driver) before PQ encode/ADC/exact re-rank; rows-only
    # (rotation-invariance + recall pinned in pytest vs exact L2)
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.ann_opq_rerank(emb, q, k=5, shortlist=50, m=8,
                                   n_codewords=16), {"dist": 6})


ZORDER_COLS = ["l_partkey", "l_suppkey"]
ZORDER_TIEBREAK = ("l_orderkey", "l_linenumber")


def layout_zorder_files(spark, sf_dir):
    # per-file footer stats (n_rows, min/max per clustered column) of
    # the 32-file equal-count Z-ordered layout of lineitem — the
    # statistics a min/max-pruning reader would skip files on
    return LAY.file_stats(
        LAY.zorder_fileplan(_lt(spark, sf_dir, "lineitem"),
                            ZORDER_COLS, n_files=32, bits=8,
                            tiebreak=ZORDER_TIEBREAK),
        ZORDER_COLS)


def layout_pruning_compare(spark, sf_dir):
    # natural vs linear vs zorder layouts scored against per-column
    # band predicates + their conjunction: files/rows a pruning
    # reader actually scans under each layout (integers end-to-end)
    return LAY.layout_pruning_compare(
        _lt(spark, sf_dir, "lineitem"), ZORDER_COLS, ZORDER_TIEBREAK,
        n_files=32, bits=8)


def ann_ivf_pq_residual(spark, sf_dir):
    # same pipeline with residual codes (IVF-ADC): codebooks quantize
    # vector - cell_centroid, one ADC table per probed cell (rows-only;
    # recall + reconstruction-MSE advantage pinned in pytest)
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    return _round(S.ann_ivf_pq(emb, q, k=5, n_centroids=16, nprobe=4,
                               shortlist=50, m=8, n_codewords=16,
                               kmeans_iters=1, residual=True,
                               adc_join=True),
                  {"dist": 6})


def embedding_pq_profile(spark, sf_dir):
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    return _round(S.pq_distortion_profile(emb, m=8, k=16, dim=64),
                  {"mean_sq_err": 6})


def ann_ivf_recall_eval(spark, sf_dir):
    emb = _lt(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    q = S.make_queries(emb, KNN_QUERY_IDS)
    df = S.ivf_recall_eval(emb, q, k=5, n_centroids=16,
                           nprobes=(1, 2, 4, 8))
    return _round(df, {"recall_at_k": 6, "avg_candidates": 2})


def ts_acf(spark, sf_dir):
    return TS.acf(TS.series_long(_lt(spark, sf_dir, "lineitem")),
                  lags=(1, 2, 3))


def ev_power_users(spark, sf_dir):
    return E.power_user_concentration(_lt(spark, sf_dir, "events"),
                                      n_tiles=10)


def q15_top_supplier(spark, sf_dir):
    return R.top_supplier_by_revenue(_lt(spark, sf_dir, "supplier"),
                                     _lt(spark, sf_dir, "lineitem"))


def dedup_impact_report(spark, sf_dir):
    return D.dedup_impact_report(_lt(spark, sf_dir, "documents"),
                                 prefix_chars=40)


def ev_active_users(spark, sf_dir):
    return E.active_users(_lt(spark, sf_dir, "events"), window_days=7)


def ev_session_stats(spark, sf_dir):
    # mean_duration_s is a derived double off exact integer micros —
    # identical bits cross-engine, ships RAW (never round derived)
    return E.session_stats(_lt(spark, sf_dir, "events"))


def ev_attribution(spark, sf_dir):
    return E.last_touch_attribution(_lt(spark, sf_dir, "events"))


def ts_trend_ma(spark, sf_dir):
    # only `value` is engine-rounded (its groupBy-sum bits differ and
    # round-4 recovers the grid); trend/detrended are derived from
    # grid-recovered inputs — identical bits — and ship RAW per the
    # never-round-derived-doubles rule
    return _round(
        TS.trend_ma(TS.series_long(_lt(spark, sf_dir, "lineitem"))),
        {"value": 4},
    )


def ts_cusum_changepoint(spark, sf_dir):
    return TS.cusum_changepoint(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def ts_cusum_skew(spark, sf_dir):
    """cusum_changepoint on the two-phase chunked prefix
    (cusum_changepoint_chunked): identical output — same oracle —
    but the biggest ordered-window task holds one series-YEAR, not
    one series (the mega-series answer; exactness comes from the
    integer-cents cumsum, which re-associates bit-identically)."""
    return TS.cusum_changepoint_chunked(
        TS.series_long(_lt(spark, sf_dir, "lineitem")))


def dedup_source_overlap_sketch(spark, sf_dir):
    return D.source_overlap_sketch(_lt(spark, sf_dir, "documents"),
                                   k=256, prefix_chars=40)


def q7_nation_volume(spark, sf_dir):
    return R.nation_volume(
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "supplier"),
        _lt(spark, sf_dir, "orders"), _lt(spark, sf_dir, "lineitem"),
        _lt(spark, sf_dir, "nation"))


def q10_returned_items(spark, sf_dir):
    return R.returned_item_revenue(
        _lt(spark, sf_dir, "customer"), _lt(spark, sf_dir, "orders"),
        _lt(spark, sf_dir, "lineitem"), _lt(spark, sf_dir, "nation"))


def q14_promo_share(spark, sf_dir):
    return R.promo_revenue_share(_lt(spark, sf_dir, "lineitem"),
                                 _lt(spark, sf_dir, "part"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Insertion order matters: the driver's correctness gate checks the
    # FIRST 50 entries, so every entry there must be oracle-backed and
    # the rows-only (no-oracle) entries go last. The dict below keeps
    # its grouped authoring order; _WINDOW (after it) names the 50
    # driver slots explicitly and the return reorders accordingly —
    # everything else stays behind the window, where the local parity
    # gate (tools/parity.py, tests/test_oracle_parity.py) still
    # value-checks it every run.
    q = {
        # grouped authoring order (slot order is decided by _WINDOW below)
        "q1_pricing_summary": q1_pricing_summary,
        "infogob_candidates_by_election": infogob_candidates_by_election,
        "infogob_candidates_pending": infogob_candidates_pending,
        "infogob_candidate_detail_counts": infogob_candidate_detail_counts,
        "inei_stage_plan": inei_stage_plan,
        "inei_module_listing": inei_module_listing,
        "infogob_location_hierarchy": infogob_location_hierarchy,
        "infogob_results_by_region": infogob_results_by_region,
        "mtc_paged_concat": mtc_paged_concat,
        "text_rolling_hash": text_rolling_hash,
        "ev_json_props_stats": ev_json_props_stats,
        "knn_label_vote": knn_label_vote,
        "catalog_series_summary": catalog_series_summary,
        "mef_find_row_by_text": mef_find_row_by_text,
        "mef_get_grp_from_row": mef_get_grp_from_row,
        "q_customers_no_orders": q_customers_no_orders,
        "q_repeat_customers": q_repeat_customers,
        "profile_orders": profile_orders,
        "sample_systematic": sample_systematic,
        "catalog_active_filter": catalog_active_filter,
        "dedup_keep_latest": dedup_keep_latest,
        "ts_resample_quarterly": ts_resample_quarterly,
        "ts_align_full_outer": ts_align_full_outer,
        "cache_missing_codes": cache_missing_codes,
        "q_customer_quartiles": q_customer_quartiles,
        "ts_zscore_anomalies": ts_zscore_anomalies,
        "ts_bollinger_bands": ts_bollinger_bands,
        "clean_numeric_cast": clean_numeric_cast,
        "embedding_centroids": embedding_centroids,
        "text_lang_confusion": text_lang_confusion,
        "skew_salted_join": skew_salted_join,
        "skew_salted_distinct": skew_salted_distinct,
        "q_bloom_pruned_join": q_bloom_pruned_join,
        "text_clean_accents": text_clean_accents,
        "infogob_location_canonical": infogob_location_canonical,
        "mode_status_by_customer": mode_status_by_customer,
        "json_api_observations": json_api_observations,
        "ts_format_period": ts_format_period,
        "text_chunk_windows": text_chunk_windows,
        "text_pack_sequences": text_pack_sequences,
        "dedup_filter_apply": dedup_filter_apply,
        "split_train_val": split_train_val,
        "sample_stratified_by_lang": sample_stratified_by_lang,
        "text_repetition_metrics": text_repetition_metrics,
        # round-5 session additions: new oracle-backed ops take the
        # remaining window slots; the r4-driver-green queries they
        # displace (ts_interpolate/gap_fill, knn/cosine pairs, the
        # streaming replays, sessionize, clusters, quality_score) move
        # to the locally-verified block below where tools/parity.py +
        # tests/test_oracle_parity.py still value-check them every run
        "text_vocab_topn": text_vocab_topn,
        "text_oov_rate": text_oov_rate,
        "text_boilerplate": text_boilerplate,
        "text_boilerplate_apply": text_boilerplate_apply,
        "doc_epoch_shards": doc_epoch_shards,
        "corpus_summary": corpus_summary,
        "text_quality_filter": text_quality_filter,
        "stats_mad_outliers": stats_mad_outliers,
        "ev_funnel_steps": ev_funnel_steps,
        "ev_retention_cohorts": ev_retention_cohorts,
        "text_unigram_logprob": text_unigram_logprob,
        "text_tfidf_top_terms": text_tfidf_top_terms,
        "text_bigram_logprob": text_bigram_logprob,
        "text_pmi_collocations": text_pmi_collocations,
        "text_temperature_mixture": text_temperature_mixture,
        "text_tokenizer_fertility": text_tokenizer_fertility,
        "text_perplexity_buckets": text_perplexity_buckets,
        "text_quality_logit": text_quality_logit,
        "text_heaps_curve": text_heaps_curve,
        "text_dsir_sample": text_dsir_sample,
        "ev_user_entropy": ev_user_entropy,
        "sample_stratified_exact_k": sample_stratified_exact_k,
        "text_ccnet_filter": text_ccnet_filter,
        "doc_length_drift": doc_length_drift,
        "emb_matryoshka_eval": emb_matryoshka_eval,
        "text_filter_funnel": text_filter_funnel,
        "ev_stickiness": ev_stickiness,
        "text_script_mix": text_script_mix,
        "q_price_index": q_price_index,
        "ts_seasonal_anomalies": ts_seasonal_anomalies,
        "emb_centroid_drift": emb_centroid_drift,
        "ts_seasonal_index": ts_seasonal_index,
        "ev_funnel_within": ev_funnel_within,
        "stats_winsorize": stats_winsorize,
        "dedup_cluster_sizes": dedup_cluster_sizes,
        "q4_order_priority": q4_order_priority,
        "q12_flag_priority": q12_flag_priority,
        "dedup_clusters": dedup_clusters,
        "ev_sessionize": ev_sessionize,
        "ev_sessionize_skew": ev_sessionize_skew,
        "ev_bounce_rate": ev_bounce_rate,
        "ev_top_paths": ev_top_paths,
        "ev_conversion_lag": ev_conversion_lag,
        "ev_conversion_lag_approx": ev_conversion_lag_approx,
        "q8_national_market_share": q8_national_market_share,
        "q21_sole_blame_supplier": q21_sole_blame_supplier,
        "q16_part_supplier_counts": q16_part_supplier_counts,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q9_product_type_profit": q9_product_type_profit,
        "q11_important_stock": q11_important_stock,
        "q20_dominant_supplier": q20_dominant_supplier,
        "graph_supplier_pagerank": graph_supplier_pagerank,
        "graph_supplier_salsa": graph_supplier_salsa,
        "graph_part_triangles": graph_part_triangles,
        "graph_part_clustering": graph_part_clustering,
        "dedup_jaccard_prefix": dedup_jaccard_prefix,
        "dedup_keep_best": dedup_keep_best,
        "graph_part_kcore": graph_part_kcore,
        "graph_part_communities": graph_part_communities,
        "graph_part_adamic_adar": graph_part_adamic_adar,
        "graph_part_degrees": graph_part_degrees,
        "graph_part_modularity": graph_part_modularity,
        "graph_supplier_ppr": graph_supplier_ppr,
        "q_revenue_lorenz": q_revenue_lorenz,
        "q_supplier_hhi": q_supplier_hhi,
        "q_supplier_skyline": q_supplier_skyline,
        "er_customer_name_pairs": er_customer_name_pairs,
        "sample_weighted_orders": sample_weighted_orders,
        "text_source_jsd": text_source_jsd,
        "ev_decay_value": ev_decay_value,
        "ev_weekday_profile": ev_weekday_profile,
        "ev_markov_attribution": ev_markov_attribution,
        "ev_kaplan_meier": ev_kaplan_meier,
        "ev_diff_in_diff": ev_diff_in_diff,
        "stats_ks_two_sample": stats_ks_two_sample,
        "stats_mann_whitney": stats_mann_whitney,
        "stats_chi2_independence": stats_chi2_independence,
        "ev_conversion_survival": ev_conversion_survival,
        "ev_hazard_cumulative": ev_hazard_cumulative,
        "ev_cuped_ab": ev_cuped_ab,
        "embedding_separation": embedding_separation,
        "emb_kcenter_sample": emb_kcenter_sample,
        "q_revenue_gini": q_revenue_gini,
        "q_benford_digits": q_benford_digits,
        "ev_hll_rollup": ev_hll_rollup,
        "ev_kll_quantiles": ev_kll_quantiles,
        "ev_markov_stationary": ev_markov_stationary,
        "ev_volume_anomalies": ev_volume_anomalies,
        "ev_peak_concurrency": ev_peak_concurrency,
        "ev_status_scd2": ev_status_scd2,
        "q_part_affinity": q_part_affinity,
        "stream_dedup_replay": stream_dedup_replay,
        "stream_tumbling_window": stream_tumbling_window,
        "stream_sessionize": stream_sessionize,
        "text_quality_score": text_quality_score,
        "ts_interpolate_linear": ts_interpolate_linear,
        "ts_gap_fill": ts_gap_fill,
        "knn_bruteforce_cosine": knn_bruteforce_cosine,
        "emb_radius_search": emb_radius_search,
        "emb_two_nn_id": emb_two_nn_id,
        "emb_radius_search_ivf": emb_radius_search_ivf,
        "ann_mips_dot": ann_mips_dot,
        "ann_hamming_topk": ann_hamming_topk,
        "ann_mips_ivf": ann_mips_ivf,
        "ann_hamming_rerank": ann_hamming_rerank,
        "dedup_embedding_cosine": dedup_embedding_cosine,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q6_revenue_delta": q6_revenue_delta,
        "q_market_share": q_market_share,
        "q_top_customers": q_top_customers,
        "catalog_search": catalog_search,
        "catalog_validate_codes": catalog_validate_codes,
        "text_pii_scrub": text_pii_scrub,
        "catalog_freq_counts": catalog_freq_counts,
        "ts_pivot_wide": ts_pivot_wide,
        "ts_unpivot_long": ts_unpivot_long,
        "ts_resample_monthly": ts_resample_monthly,
        "ts_lag_pct_change": ts_lag_pct_change,
        "ts_moving_avg": ts_moving_avg,
        "ts_running_total": ts_running_total,
        "ts_yoy_growth": ts_yoy_growth,
        "ts_asof_join": ts_asof_join,
        "ts_date_parse_multi": ts_date_parse_multi,
        "cache_merge_upsert": cache_merge_upsert,
        "q_sales_rollup": q_sales_rollup,
        "ev_tumbling_window": ev_tumbling_window,
        "ev_incident_windows": ev_incident_windows,
        "ev_top_users_per_type": ev_top_users_per_type,
        "text_token_count": text_token_count,
        "text_lang_id": text_lang_id,
        "text_fingerprint": text_fingerprint,
        "text_ngram_topk": text_ngram_topk,
        "dedup_exact": dedup_exact,
        "dedup_exact_normalized": dedup_exact_normalized,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_ngram_containment": dedup_ngram_containment,
        "dedup_exact_substring": dedup_exact_substring,
        "dedup_substring_decontaminate": dedup_substring_decontaminate,
        "dedup_substring_novelty": dedup_substring_novelty,
        "dedup_substring_profile": dedup_substring_profile,
        "dedup_paragraph": dedup_paragraph,
        "dedup_paragraph_stats": dedup_paragraph_stats,
        "dedup_paragraph_incremental": dedup_paragraph_incremental,
        "dedup_cdc_chunks": dedup_cdc_chunks,
        "dedup_cdc_profile": dedup_cdc_profile,
        "dedup_cdc_incremental": dedup_cdc_incremental,
        "dedup_tfidf_cosine": dedup_tfidf_cosine,
        "ts_spearman": ts_spearman,
        "ts_cusum_binary_seg": ts_cusum_binary_seg,
        "ts_pettitt": ts_pettitt,
        "q_abc_pareto": q_abc_pareto,
        "ev_dispersion": ev_dispersion,
        "stats_anova_oneway": stats_anova_oneway,
        "stats_welch_ttest": stats_welch_ttest,
        "stats_brown_forsythe": stats_brown_forsythe,
        "stats_friedman": stats_friedman,
        "q_repeat_purchases": q_repeat_purchases,
        "q_fulfillment_lag": q_fulfillment_lag,
        "q_price_elasticity": q_price_elasticity,
        "ev_growth_accounting": ev_growth_accounting,
        "ev_funnel_timing": ev_funnel_timing,
        "q_basket_rules": q_basket_rules,
        "graph_part_assortativity": graph_part_assortativity,
        "text_simpson_diversity": text_simpson_diversity,
        "text_log_odds_terms": text_log_odds_terms,
        "stats_kruskal_wallis": stats_kruskal_wallis,
        "ev_logrank_ab": ev_logrank_ab,
        "ev_periodicity": ev_periodicity,
        "ev_permutation_entropy": ev_permutation_entropy,
        "ev_ols_weekend": ev_ols_weekend,
        "ts_seasonal_naive_eval": ts_seasonal_naive_eval,
        "ts_hurst": ts_hurst,
        "ts_variance_ratio": ts_variance_ratio,
        "ts_ljung_box": ts_ljung_box,
        "org_slugify_rename": org_slugify_rename,
        "org_inventory_by_group": org_inventory_by_group,
        "org_content_dedup_map": org_content_dedup_map,
        "ingest_manifest_quarantine": ingest_manifest_quarantine,
        "ingest_integrity_card": ingest_integrity_card,
        "mef_filter_rows": mef_filter_rows,
        "stats_profile": stats_profile,
        "infogob_candidate_history": infogob_candidate_history,
        "infogob_normalize_header": infogob_normalize_header,
        "infogob_normalize_detail": infogob_normalize_detail,
        "infogob_pending_requests": infogob_pending_requests,
        "infogob_participation": infogob_participation,
        "infogob_org_pending": infogob_org_pending,
        "text_decontaminate": text_decontaminate,
        "text_decontaminate_bloom": text_decontaminate_bloom,
        "text_source_mix_sample": text_source_mix_sample,
        "layout_zorder_files": layout_zorder_files,
        "layout_pruning_compare": layout_pruning_compare,
        "multimodal_image_dims": multimodal_image_dims,
        "multimodal_wav_stats": multimodal_wav_stats,
        "multimodal_png_pixel_stats": multimodal_png_pixel_stats,
        "multimodal_gif_pixel_stats": multimodal_gif_pixel_stats,
        "multimodal_bmp_pixel_stats": multimodal_bmp_pixel_stats,
        "multimodal_tiff_meta": multimodal_tiff_meta,
        "multimodal_flac_meta": multimodal_flac_meta,
        "multimodal_mp3_meta": multimodal_mp3_meta,
        "multimodal_pdf_meta": multimodal_pdf_meta,
        "multimodal_zip_meta": multimodal_zip_meta,
        "multimodal_webp_meta": multimodal_webp_meta,
        "multimodal_mp4_meta": multimodal_mp4_meta,
        "bcrp_catalog_listing": bcrp_catalog_listing,
        "infogob_proceso_elections": infogob_proceso_elections,
        "infogob_candidate_affiliations": infogob_candidate_affiliations,
        "infogob_affiliation_fields": infogob_affiliation_fields,
        "ts_ewma_exact": ts_ewma_exact,
        "ts_holt_exact": ts_holt_exact,
        "ts_backtest_exact": ts_backtest_exact,
        "ts_hw_seasonal_exact": ts_hw_seasonal_exact,
        "ts_series_depth_profile": ts_series_depth_profile,
        # ---- rows-only entries (no SQL oracle by design) last ----
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_minhash_apply": dedup_minhash_apply,
        "dedup_simhash_apply": dedup_simhash_apply,
        "dedup_semantic_apply": dedup_semantic_apply,
        "embedding_quantize_int8": embedding_quantize_int8,
        "dedup_simhash": dedup_simhash,
        "ann_lsh_cosine": ann_lsh_cosine,
        "ann_ivf_cosine": ann_ivf_cosine,
        "stats_profile_approx": stats_profile_approx,
        "multimodal_features": multimodal_features,
        "multimodal_frame_sample": multimodal_frame_sample,
        "ev_approx_distinct": ev_approx_distinct,
        "ev_heavy_hitters_sketch": ev_heavy_hitters_sketch,
        "stats_mad_outliers_approx": stats_mad_outliers_approx,
        "stats_winsorize_approx": stats_winsorize_approx,
        "ev_gap_stats_approx": ev_gap_stats_approx,
        "ts_ewma": ts_ewma,
        "ts_holt_winters": ts_holt_winters,
        "ts_hp_filter": ts_hp_filter,
        "ts_forecast_backtest": ts_forecast_backtest,
        "dedup_incremental": dedup_incremental,
        "dedup_incremental_bloom": dedup_incremental_bloom,
        "dedup_stats_by_source": dedup_stats_by_source,
        "dedup_source_overlap": dedup_source_overlap,
        "split_leakage_safe": split_leakage_safe,
        "release_rehearsal": release_rehearsal,
        "ev_transitions": ev_transitions,
        "text_length_histogram": text_length_histogram,
        "text_drop_short_tail": text_drop_short_tail,
        "text_drop_short_tail_approx": text_drop_short_tail_approx,
        "q7_nation_volume": q7_nation_volume,
        "q10_returned_items": q10_returned_items,
        "q14_promo_share": q14_promo_share,
        "dedup_source_overlap_sketch": dedup_source_overlap_sketch,
        "ts_cusum_changepoint": ts_cusum_changepoint,
        "ts_cusum_skew": ts_cusum_skew,
        "ev_skew_profile": ev_skew_profile,
        "ev_burst_profile": ev_burst_profile,
        "ev_burst_skew": ev_burst_skew,
        "text_token_budget_sample": text_token_budget_sample,
        "text_quality_by_source": text_quality_by_source,
        "ev_session_stats": ev_session_stats,
        "ev_attribution": ev_attribution,
        "ts_trend_ma": ts_trend_ma,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "catalog_fuzzy_search": catalog_fuzzy_search,
        "embedding_norm_profile": embedding_norm_profile,
        "dedup_impact_report": dedup_impact_report,
        "ev_active_users": ev_active_users,
        "ts_acf": ts_acf,
        "ev_power_users": ev_power_users,
        "q15_top_supplier": q15_top_supplier,
        "text_char_entropy": text_char_entropy,
        "dedup_minhash_eval": dedup_minhash_eval,
        "dedup_simhash_eval": dedup_simhash_eval,
        "q17_small_qty_revenue": q17_small_qty_revenue,
        "q18_large_orders": q18_large_orders,
        "ann_ivf_cell_stats": ann_ivf_cell_stats,
        "ann_ivf_recall_eval": ann_ivf_recall_eval,
        "embedding_pq_profile": embedding_pq_profile,
        "ann_pq_rerank_l2": ann_pq_rerank_l2,
        "ann_ivf_pq_rerank": ann_ivf_pq_rerank,
        "ann_ivf_pq_residual": ann_ivf_pq_residual,
        "ann_opq_rerank": ann_opq_rerank,
        "embedding_pca_variance": embedding_pca_variance,
        "q22_rich_inactive": q22_rich_inactive,
        "q13_order_distribution": q13_order_distribution,
        "ts_xcorr": ts_xcorr,
        "dedup_threshold_sweep": dedup_threshold_sweep,
        "q_orphan_check": q_orphan_check,
        "ts_max_drawdown": ts_max_drawdown,
        "ev_attribution_first": ev_attribution_first,
        "ts_beta": ts_beta,
        "ts_ols_trend": ts_ols_trend,
        "ts_rolling_median": ts_rolling_median,
        "ts_theil_sen": ts_theil_sen,
        "ts_rolling_mad": ts_rolling_mad,
        "ts_seasonal_strength": ts_seasonal_strength,
        "ev_activity_powerlaw": ev_activity_powerlaw,
        "ev_rfm_scores": ev_rfm_scores,
        "q_customer_migration": q_customer_migration,
        "q_cohort_ltv": q_cohort_ltv,
        "q_sales_cube": q_sales_cube,
        "text_lang_purity": text_lang_purity,
        "text_zipf_fit": text_zipf_fit,
        "text_readability": text_readability,
        "ev_bot_regularity": ev_bot_regularity,
        "ev_gap_stats": ev_gap_stats,
        "ts_rebase_index": ts_rebase_index,
        "catalog_coverage": catalog_coverage,
        "ts_decompose": ts_decompose,
    }
    window = [k for k in _WINDOW if k in q]
    rest = [k for k in q if k not in _WINDOW]
    # rows-only entries stay last even within the remainder
    oracle_keys = set(oracle_sql())
    rest.sort(key=lambda k: k not in oracle_keys)
    return {k: q[k] for k in [*window, *rest]}


# lead: 24 changed + 27 never-signed; then oldest countersigns
_WINDOW = [
    "stats_welch_ttest", "stats_kruskal_wallis",
    "ev_permutation_entropy", "ts_seasonal_naive_eval",
    "graph_part_clustering", "emb_two_nn_id", "ev_ols_weekend",
    "multimodal_mp3_meta", "multimodal_zip_meta",
    "multimodal_webp_meta", "stats_brown_forsythe",
    "graph_part_assortativity", "text_simpson_diversity", "ts_hurst",
    "stats_friedman", "q_repeat_purchases", "text_log_odds_terms",
    "ts_variance_ratio", "q_fulfillment_lag", "multimodal_pdf_meta",
    "ts_ljung_box", "q_price_elasticity", "ev_growth_accounting",
    "q_basket_rules", "ann_hamming_topk", "dedup_cdc_chunks",
    "dedup_cdc_incremental", "dedup_cdc_profile", "dedup_tfidf_cosine",
    "ev_conversion_survival", "ev_diff_in_diff", "ev_dispersion",
    "ev_hazard_cumulative", "ev_logrank_ab", "ev_periodicity",
    "graph_part_adamic_adar", "infogob_affiliation_fields",
    "infogob_candidate_affiliations", "multimodal_bmp_pixel_stats",
    "multimodal_flac_meta", "multimodal_gif_pixel_stats",
    "multimodal_tiff_meta", "q_abc_pareto", "stats_anova_oneway",
    "stats_chi2_independence", "stats_ks_two_sample",
    "stats_mann_whitney", "ts_cusum_binary_seg", "ts_pettitt",
    "ts_series_depth_profile",
]


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_LONG = ("SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS date, "
         "l_returnflag || l_linestatus AS code, "
         "sum(l_extendedprice) AS value FROM lineitem GROUP BY 1, 2")

_TOKENS = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_'']+'), "
           "x -> x != '')")

_SW = {
    "en": "['the','and','of','to','in','is','that','for','with','was']",
    "es": "['el','la','de','que','y','en','los','del','las','por']",
    "de": "['der','die','und','das','ist','nicht','mit','ein','von','zu']",
    "fr": "['le','la','les','des','est','une','dans','pour','que','sur']",
}


def _sw_hits(lang: str) -> str:
    return (f"len(list_filter({_TOKENS}, x -> list_contains({_SW[lang]}, x)))")


def _values_sql(rows, cols: str) -> str:
    def fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)
    vals = ", ".join("(" + ", ".join(fmt(v) for v in r) + ")" for r in rows)
    return f"(VALUES {vals}) AS t({cols})"


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                   AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_charge,
               round(round(sum(l_quantity), 2) / count(*), 6) AS avg_qty,
               round(round(sum(l_extendedprice), 2) / count(*), 6) AS avg_price,
               round(round(sum(l_discount), 2) / count(*), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """

    sql["q3_shipping_priority"] = """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """

    sql["q5_local_supplier_volume"] = """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """

    sql["q6_revenue_delta"] = """
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24.0
    """

    sql["q_market_share"] = """
        WITH agg AS (
            SELECT n_name, sum(o_totalprice) AS nation_revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA'
            GROUP BY n_name
        )
        SELECT n_name, round(nation_revenue, 4) AS nation_revenue,
               round(nation_revenue / (SELECT sum(nation_revenue) FROM agg), 6) AS share
        FROM agg
        ORDER BY nation_revenue DESC, n_name
    """

    sql["q_top_customers"] = """
        SELECT c_custkey, c_name, n_name,
               round(sum(o_totalprice), 4) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """

    sql["catalog_search"] = """
        SELECT p_partkey, p_name, p_brand, p_type
        FROM part
        WHERE contains(lower(p_name), 'red')
        ORDER BY p_partkey
    """

    req = ", ".join(f"({c})" for c in VALIDATE_CODES)
    sql["catalog_validate_codes"] = f"""
        WITH requested(code) AS (VALUES {req})
        SELECT CAST(r.code AS BIGINT) AS code,
               p.p_brand || ' - ' || p.p_name AS display_name,
               TRUE AS valid
        FROM requested r JOIN part p ON r.code = p.p_partkey
        UNION ALL
        SELECT CAST(code AS BIGINT) AS code,
               CAST(NULL AS VARCHAR) AS display_name, FALSE AS valid
        FROM requested WHERE code NOT IN (SELECT p_partkey FROM part)
        ORDER BY code
    """

    sql["catalog_active_filter"] = """
        SELECT o_custkey, max(o_orderdate) AS last_update,
               CAST(max(o_orderdate) >= TIMESTAMP '2000-06-01' AS INT) AS active
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """

    sql["catalog_freq_counts"] = """
        SELECT p_type, count(*) AS n_codes FROM part GROUP BY p_type ORDER BY p_type
    """

    sql["clean_numeric_cast"] = f"""
        SELECT id, raw,
               CASE WHEN regexp_matches(trim(raw), '^-?[0-9,]+\\.?[0-9]*%?$')
                    THEN TRY_CAST(replace(replace(raw, ',', ''), '%', '')
                                  AS DOUBLE)
               END AS value_clean
        FROM {_values_sql(CLEAN_ROWS, "id, raw")}
        ORDER BY id
    """

    pivot_cols = ",\n               ".join(
        f"round(sum(CASE WHEN code = '{c}' THEN value END), 4) AS \"{c}\""
        for c in ("AF", "AO", "NF", "NO", "RF", "RO"))
    sql["ts_pivot_wide"] = f"""
        WITH long AS ({_LONG})
        SELECT date,
               {pivot_cols}
        FROM long GROUP BY date ORDER BY date
    """

    sql["ts_unpivot_long"] = f"""
        WITH long AS ({_LONG})
        SELECT date, code, round(value, 4) AS value FROM long ORDER BY date, code
    """

    sql["ts_resample_monthly"] = f"""
        WITH long AS ({_LONG})
        SELECT CAST(date_trunc('month', date) AS TIMESTAMP) AS period, code,
               round(sum(value), 4) AS value_sum,
               round(round(sum(value), 2) / count(*), 6) AS value_avg,
               count(*) AS n_obs
        FROM long GROUP BY 1, 2 ORDER BY period, code
    """

    sql["ts_resample_quarterly"] = f"""
        WITH long AS ({_LONG}),
        agg AS (
            SELECT CAST(date_trunc('quarter', date) AS TIMESTAMP) AS period, code,
                   round(sum(value), 4) AS value_sum,
                   round(round(sum(value), 2) / count(*), 6) AS value_avg,
                   count(*) AS n_obs
            FROM long GROUP BY 1, 2
        )
        SELECT period, code, value_sum, value_avg, n_obs,
               CAST(year(period) AS VARCHAR) || 'Q' ||
                   CAST(quarter(period) AS VARCHAR) AS yq
        FROM agg ORDER BY period, code
    """

    sql["ts_gap_fill"] = f"""
        WITH long AS ({_LONG}),
        bounds AS (SELECT code, min(date) AS d0, max(date) AS d1 FROM long GROUP BY code),
        spine AS (
            SELECT code, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS date
            FROM bounds
        )
        SELECT s.date, s.code, round(l.value, 4) AS value
        FROM spine s LEFT JOIN long l ON s.code = l.code AND s.date = l.date
        ORDER BY s.date, s.code
    """

    sql["stats_profile"] = """
        SELECT l_returnflag, count(*) AS n,
               round(avg(l_quantity), 6) AS avg_qty,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """

    from pyperustats_spark.operators.textops import PII_PATTERNS

    scrub_expr = "text"
    for pattern, token in PII_PATTERNS:
        esc = pattern.replace("'", "''")
        scrub_expr = f"regexp_replace({scrub_expr}, '{esc}', '{token}', 'g')"
    sql["text_pii_scrub"] = f"""
        SELECT doc_id, {scrub_expr} AS text_scrubbed,
               ({scrub_expr} != text) AS was_scrubbed
        FROM documents ORDER BY doc_id
    """

    sql["dedup_keep_latest"] = """
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1 ORDER BY o_custkey
    """

    sql["ts_align_full_outer"] = f"""
        WITH long AS ({_LONG}),
        a AS (SELECT date, round(value, 4) AS left_value FROM long WHERE code = 'AF'),
        b AS (SELECT date, round(value, 4) AS right_value FROM long WHERE code = 'NO')
        SELECT COALESCE(a.date, b.date) AS date, a.left_value, b.right_value
        FROM a FULL OUTER JOIN b ON a.date = b.date
        ORDER BY date
    """

    profile_cols = ["o_custkey", "o_orderdate", "o_orderstatus", "o_totalprice"]
    profile_selects = [
        f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
            CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            round(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS null_ratio,
            count(DISTINCT {c}) AS n_distinct,
            CAST(min({c}) AS VARCHAR) AS min_str,
            CAST(max({c}) AS VARCHAR) AS max_str
            FROM orders"""
        for c in profile_cols
    ]
    sql["profile_orders"] = " UNION ALL ".join(profile_selects) + " ORDER BY col_name"

    sql["sample_systematic"] = """
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 32, 1) = '0'
        ORDER BY o_orderkey
    """

    sql["q_repeat_customers"] = """
        SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 2001
        ORDER BY custkey
    """

    sql["q_customers_no_orders"] = """
        SELECT c_custkey, c_name, c_nationkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= '2001-01-01')
        ORDER BY c_custkey
    """

    sql["q_sales_rollup"] = """
        SELECT o_orderstatus,
               EXTRACT(year FROM o_orderdate) AS order_year,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue,
               GROUPING(o_orderstatus, order_year) AS gid
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, order_year)
        ORDER BY gid, o_orderstatus NULLS LAST, order_year NULLS LAST
    """

    sql["q_customer_quartiles"] = """
        WITH rev AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY o_custkey
        )
        SELECT r.o_custkey AS custkey, c.c_name, r.revenue,
               ntile(4) OVER (ORDER BY r.revenue DESC, r.o_custkey) AS quartile
        FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
        ORDER BY custkey
    """

    # seasonal_index: means are round-2-restored money sums / counts
    # (the resample rule), so the ratio ships raw — bit-identical
    sql["ts_seasonal_index"] = f"""
        WITH long AS ({_LONG}),
        monthly AS (
            SELECT code, CAST(month(date) AS INT) AS month,
                   round(sum(value), 2) AS sum_m,
                   CAST(count(*) AS BIGINT) AS n_obs
            FROM long GROUP BY 1, 2
        ),
        overall AS (
            SELECT code, round(sum(value), 2) AS sum_o,
                   CAST(count(*) AS BIGINT) AS n_o
            FROM long GROUP BY 1
        )
        SELECT m.code, m.month, m.n_obs,
               (m.sum_m / m.n_obs) / (o.sum_o / o.n_o) AS seasonal_index
        FROM monthly m JOIN overall o ON m.code = o.code
        ORDER BY m.code, m.month
    """

    sql["ts_zscore_anomalies"] = f"""
        WITH long AS ({_LONG})
        SELECT date, code, round(value, 4) AS value,
               round((value - avg(value) OVER w) / NULLIF(stddev_samp(value) OVER w, 0), 6) AS zscore,
               abs((value - avg(value) OVER w) / NULLIF(stddev_samp(value) OVER w, 0)) > 3.0 AS is_anomaly
        FROM long
        WINDOW w AS (PARTITION BY code ORDER BY date
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                               AND INTERVAL 1 SECOND PRECEDING)
        ORDER BY date, code
    """

    sql["ts_interpolate_linear"] = f"""
        WITH long AS ({_LONG}),
        bounds AS (SELECT code, min(date) AS d0, max(date) AS d1 FROM long GROUP BY code),
        spine AS (
            SELECT code, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS date
            FROM bounds
        ),
        filled AS (
            SELECT s.date, s.code, round(l.value, 4) AS value
            FROM spine s LEFT JOIN long l ON s.code = l.code AND s.date = l.date
        ),
        ctx AS (
            SELECT date, code, value,
                   last_value(value IGNORE NULLS) OVER wp AS prev_v,
                   first_value(value IGNORE NULLS) OVER wn AS next_v,
                   last_value(CASE WHEN value IS NOT NULL THEN date END IGNORE NULLS) OVER wp AS prev_d,
                   first_value(CASE WHEN value IS NOT NULL THEN date END IGNORE NULLS) OVER wn AS next_d
            FROM filled
            WINDOW wp AS (PARTITION BY code ORDER BY date
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wn AS (PARTITION BY code ORDER BY date
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT date, code, round(value, 4) AS observed,
               CASE
                   WHEN value IS NOT NULL THEN value
                   WHEN prev_v IS NULL THEN next_v
                   WHEN next_v IS NULL THEN prev_v
                   ELSE prev_v + (next_v - prev_v) *
                        (date_diff('day', prev_d, date) * 1.0 /
                         NULLIF(date_diff('day', prev_d, next_d), 0))
               END AS value_interp
        FROM ctx ORDER BY date, code
    """

    sql["ts_lag_pct_change"] = f"""
        WITH long AS ({_LONG})
        SELECT date, code, round(value, 4) AS value,
               round(lag(value) OVER w, 4) AS prev_value,
               round((value - lag(value) OVER w) / lag(value) OVER w, 6) AS pct_change
        FROM long
        WINDOW w AS (PARTITION BY code ORDER BY date)
        ORDER BY date, code
    """

    sql["ts_moving_avg"] = f"""
        WITH long AS ({_LONG})
        SELECT date, code, round(value, 4) AS value,
               round(round(sum(value) OVER (PARTITION BY code ORDER BY date
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
                     / count(*) OVER (PARTITION BY code ORDER BY date
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
        FROM long ORDER BY date, code
    """

    sql["ts_running_total"] = f"""
        WITH long AS ({_LONG})
        SELECT date, code, round(value, 4) AS value,
               round(sum(value) OVER (PARTITION BY code ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_value
        FROM long ORDER BY date, code
    """

    sql["ts_yoy_growth"] = f"""
        WITH long AS ({_LONG}),
        monthly AS (
            SELECT CAST(date_trunc('month', date) AS TIMESTAMP) AS period, code, sum(value) AS value_sum
            FROM long GROUP BY 1, 2
        )
        SELECT period, code, round(value_sum, 4) AS value_sum,
               round(lag(value_sum, 12) OVER w, 4) AS prev_year,
               round((value_sum - lag(value_sum, 12) OVER w)
                     / lag(value_sum, 12) OVER w, 6) AS yoy
        FROM monthly
        WINDOW w AS (PARTITION BY code ORDER BY period)
        ORDER BY period, code
    """

    sql["ts_asof_join"] = f"""
        WITH long AS ({_LONG}),
        q AS (
            SELECT CAST(date_trunc('quarter', date) AS TIMESTAMP) AS date, code, sum(value) AS value_sum
            FROM long GROUP BY 1, 2
        )
        SELECT l.date, l.code, round(l.value, 4) AS value,
               round(r.value_sum, 4) AS asof_value_sum
        FROM long l ASOF LEFT JOIN q r
          ON l.code = r.code AND l.date >= r.date
        ORDER BY l.date, l.code
    """

    date_rows = ", ".join(
        f"({i}, '{raw}', '{fr}')" for i, raw, fr in [
            (1, "15.Ene.23", "D"), (2, "03.Jun.24", "D"), (3, "Dic.2022", "M"),
            (4, "Set.2021", "M"), (5, "Q1.23", "Q"), (6, "Q4.21", "Q"),
            (7, "2020", "A"), (8, "28.Ago.19", "D"), (9, "Abr.2023", "M"),
            (10, "Q3.22", "Q")])
    sql["ts_date_parse_multi"] = f"""
        WITH raw(id, raw, freq) AS (VALUES {date_rows}),
        fixed AS (
            SELECT id, raw, freq,
                   replace(replace(replace(replace(replace(raw,
                       'Ene', 'Jan'), 'Abr', 'Apr'), 'Ago', 'Aug'),
                       'Set', 'Sep'), 'Dic', 'Dec') AS en
            FROM raw
        )
        SELECT id, raw, freq,
               CASE freq
                   WHEN 'D' THEN strptime(en, '%d.%b.%y')
                   WHEN 'M' THEN strptime(en, '%b.%Y')
                   WHEN 'Q' THEN CAST(
                       date_trunc('quarter', make_date(
                           2000 + CAST(substr(en, 4, 2) AS INT),
                           CAST(substr(en, 2, 1) AS INT) * 3, 1))
                       + INTERVAL 3 MONTH - INTERVAL 1 DAY AS TIMESTAMP)
                   ELSE strptime(en, '%Y')
               END AS parsed
        FROM fixed ORDER BY id
    """

    sql["cache_merge_upsert"] = f"""
        WITH long AS ({_LONG}),
        incoming AS (
            SELECT date, code, value * 1.1 AS value
            FROM long WHERE date >= TIMESTAMP '2001-01-01'
        )
        SELECT date, code, round(value, 4) AS value FROM incoming
        UNION ALL
        SELECT l.date, l.code, round(l.value, 4) AS value
        FROM long l
        WHERE NOT EXISTS (
            SELECT 1 FROM incoming i WHERE i.date = l.date AND i.code = l.code)
        ORDER BY date, code
    """

    missing_req = ", ".join(f"('{c}')" for c in MISSING_CODE_REQ)
    sql["cache_missing_codes"] = f"""
        WITH requested(code) AS (VALUES {missing_req})
        SELECT code FROM requested
        WHERE code NOT IN (SELECT DISTINCT code FROM ({_LONG}))
        ORDER BY code
    """

    sql["ev_incident_windows"] = """
        WITH hours AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS start,
                   count(*) AS n
            FROM events GROUP BY 1
            ORDER BY n DESC, start LIMIT 20
        ),
        iv AS (
            SELECT start, start + INTERVAL 1 HOUR AS wend FROM hours
        )
        SELECT i.start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e JOIN iv i
          ON e.ts >= i.start AND e.ts < i.wend
        GROUP BY 1 ORDER BY 1
    """

    sql["ev_tumbling_window"] = """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value,
               round(round(sum(value), 2) / count(*), 6) AS avg_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """

    sql["org_slugify_rename"] = """
        WITH slugged AS (
            SELECT p_partkey, p_brand,
                   regexp_replace(regexp_replace(lower(trim(p_name)),
                       '[^a-z0-9]+', '-', 'g'), '(^-+|-+$)', '', 'g') AS slug
            FROM part
        ),
        numbered AS (
            SELECT p_partkey, p_brand, slug,
                   row_number() OVER (PARTITION BY p_brand, slug
                                      ORDER BY p_partkey) - 1 AS collision_idx
            FROM slugged
        )
        SELECT p_partkey, p_brand, slug, collision_idx,
               CASE WHEN collision_idx = 0 THEN slug
                    ELSE slug || '_' || CAST(collision_idx AS VARCHAR)
               END AS final_name
        FROM numbered ORDER BY p_partkey
    """

    sql["org_inventory_by_group"] = """
        SELECT o_orderstatus, EXTRACT(year FROM o_orderdate) AS order_year,
               count(*) AS n_files,
               round(sum(o_totalprice), 4) AS total_size,
               round(max(o_totalprice), 4) AS max_size
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """

    sql["org_content_dedup_map"] = """
        WITH hashed AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
            FROM documents
        ),
        canon AS (
            SELECT content_hash, min(doc_id) AS canonical_id
            FROM hashed GROUP BY 1
        )
        SELECT h.doc_id, h.content_hash, c.canonical_id,
               h.doc_id = c.canonical_id AS is_canonical
        FROM hashed h JOIN canon c USING (content_hash)
        ORDER BY h.doc_id
    """

    _MANIFEST_CTE = """
        manifest AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 37 = 0 THEN md5(text || '!')
                        ELSE md5(text) END AS expected_hash
            FROM documents WHERE doc_id % 53 <> 0
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id, source,
                   md5(CAST(doc_id AS VARCHAR)) AS expected_hash
            FROM documents WHERE doc_id % 41 = 0
        )
    """

    sql["ingest_manifest_quarantine"] = f"""
        WITH {_MANIFEST_CTE}
        SELECT d.doc_id, d.source, md5(d.text) AS content_hash,
               CASE WHEN m.expected_hash IS NULL THEN 'unlisted'
                    WHEN md5(d.text) = m.expected_hash THEN 'ok'
                    ELSE 'corrupt' END AS status
        FROM documents d LEFT JOIN manifest m USING (doc_id)
        ORDER BY d.doc_id
    """

    sql["ingest_integrity_card"] = f"""
        WITH {_MANIFEST_CTE},
        verdicts AS (
            SELECT d.source,
                   CASE WHEN m.expected_hash IS NULL THEN 'unlisted'
                        WHEN md5(d.text) = m.expected_hash THEN 'ok'
                        ELSE 'corrupt' END AS status
            FROM documents d LEFT JOIN manifest m USING (doc_id)
        ),
        arrived AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok,
                   CAST(sum(CASE WHEN status = 'corrupt' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_corrupt,
                   CAST(sum(CASE WHEN status = 'unlisted' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unlisted
            FROM verdicts GROUP BY source
        ),
        missing AS (
            SELECT m.source, CAST(count(*) AS BIGINT) AS n_missing
            FROM manifest m
            WHERE NOT EXISTS (SELECT 1 FROM documents d
                              WHERE d.doc_id = m.doc_id)
            GROUP BY m.source
        )
        SELECT COALESCE(a.source, mi.source) AS source,
               CAST(COALESCE(a.n_items, 0) AS BIGINT) AS n_items,
               CAST(COALESCE(a.n_ok, 0) AS BIGINT) AS n_ok,
               CAST(COALESCE(a.n_corrupt, 0) AS BIGINT) AS n_corrupt,
               CAST(COALESCE(a.n_unlisted, 0) AS BIGINT) AS n_unlisted,
               CAST(COALESCE(mi.n_missing, 0) AS BIGINT) AS n_missing,
               CAST(COALESCE(a.n_corrupt, 0) AS BIGINT)
                   / CAST(COALESCE(a.n_items, 0) AS BIGINT)
                   AS corrupt_share
        FROM arrived a FULL OUTER JOIN missing mi ON a.source = mi.source
        ORDER BY 1
    """

    sql["mef_filter_rows"] = """
        SELECT p_partkey, p_name, p_type FROM part
        WHERE regexp_matches(lower(p_type), 'promo|economy')
        ORDER BY p_partkey
    """

    sql["mef_find_row_by_text"] = """
        SELECT p_partkey, p_name FROM part
        WHERE contains(lower(p_name), 'widget')
        ORDER BY p_partkey LIMIT 1
    """

    sql["mef_get_grp_from_row"] = """
        SELECT p_partkey, p_brand FROM part
        ORDER BY p_partkey LIMIT 1 OFFSET 2
    """

    sql["infogob_candidate_history"] = """
        WITH entries AS (
            SELECT o_custkey,
                   strftime(o_orderdate, '%Y-%m-%d') || ':' ||
                   CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus AS entry
            FROM orders
        ),
        hist AS (
            SELECT o_custkey, count(*) AS n_events,
                   string_agg(entry, '|' ORDER BY entry) AS history
            FROM entries GROUP BY o_custkey
        )
        SELECT h.o_custkey AS custkey, c.c_name, h.n_events, h.history
        FROM hist h JOIN customer c ON h.o_custkey = c.c_custkey
        ORDER BY custkey
    """

    sql["mtc_paged_concat"] = """
        SELECT o_orderkey AS n, o_orderstatus AS type, o_custkey AS cust,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               round(o_totalprice, 4) AS amount,
               CAST(floor(o_orderkey / 1000) AS INTEGER) AS page
        FROM orders WHERE o_orderkey >= 0 AND o_orderkey < 3000
        ORDER BY n
    """

    sql["text_rolling_hash"] = """
        SELECT doc_id, list_reduce(
            list_prepend(CAST(0 AS BIGINT),
                list_transform(
                    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ''),
                    c -> CAST(ascii(c) AS BIGINT))),
            (a, b) -> (a * 31 + b) % 2147483647) AS rhash
        FROM documents ORDER BY doc_id
    """

    # a twice-replayed feed deduped by id == the original events table
    sql["stream_dedup_replay"] = """
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
               round(value, 6) AS value
        FROM events ORDER BY event_id
    """

    # gap-merge session_window semantics == batch lag+cumsum sessionizer
    sql["stream_sessionize"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        )
        SELECT user_id,
               CAST(min(ts) AS TIMESTAMP) AS session_start,
               CAST(max(ts) AS TIMESTAMP) AS session_end,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM sess GROUP BY user_id, session_seq
        ORDER BY user_id, session_start
    """

    # streaming variant: 24h epoch-aligned windows == day truncation, so
    # the continuous query is oracle-checkable against plain SQL
    sql["stream_tumbling_window"] = """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """

    # session_seq CAST to BIGINT: DuckDB sum(int) yields HUGEINT, which an
    # Arrow-based comparator hashes differently from Spark's bigint even
    # when every value is equal (root cause of the round-1 driver FAIL)
    sql["ev_sessionize"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM sess GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """

    # identical semantics, skew-split execution
    sql["ev_sessionize_skew"] = sql["ev_sessionize"]

    sql["ev_bounce_rate"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts)
                           > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id,
                   sum(new_sess) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS session_seq,
                   ts
            FROM flagged
        ),
        per AS (
            SELECT user_id, session_seq,
                   CAST(min(ts) AS DATE) AS date,
                   count(*) AS n_events
            FROM sess GROUP BY user_id, session_seq
        )
        SELECT date, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bounces,
               CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) / CAST(count(*) AS BIGINT)
                   AS bounce_rate
        FROM per GROUP BY date ORDER BY date
    """

    sql["ev_top_users_per_type"] = """
        WITH agg AS (
            SELECT event_type, user_id, sum(value) AS total_value,
                   count(*) AS n_events
            FROM events GROUP BY event_type, user_id
        )
        SELECT event_type, user_id, round(total_value, 4) AS total_value,
               n_events, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY total_value DESC, user_id) AS rank
            FROM agg
        ) WHERE rank <= 3
        ORDER BY event_type, rank
    """

    sql["text_token_count"] = f"""
        SELECT doc_id, length(text) AS n_chars,
               len({_TOKENS}) AS n_tokens
        FROM documents ORDER BY doc_id
    """

    sql["text_quality_score"] = f"""
        WITH feat AS (
            SELECT doc_id,
                   len({_TOKENS}) AS n_tokens,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST(list_sum(list_transform({_TOKENS}, x -> length(x))) AS DOUBLE)
                             / len({_TOKENS})
                        ELSE 0.0 END AS mean_word_len,
                   CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS digit_ratio,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST({_sw_hits("en")} AS DOUBLE) / len({_TOKENS})
                        ELSE 0.0 END AS stopword_density
            FROM documents
        )
        SELECT doc_id, n_tokens, round(mean_word_len, 6) AS mean_word_len,
               round(punct_ratio, 6) AS punct_ratio,
               round(digit_ratio, 6) AS digit_ratio,
               round(stopword_density, 6) AS stopword_density,
               round(CAST(
                   (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN stopword_density >= 0.02 THEN 0.25 ELSE 0.0 END) AS DOUBLE), 2) AS quality_score
        FROM feat ORDER BY doc_id
    """

    hits_cols = ", ".join(f"{_sw_hits(lg)} AS hits_{lg}" for lg in ("en", "es", "de", "fr"))
    sql["text_lang_id"] = f"""
        WITH h AS (
            SELECT doc_id, text, {hits_cols},
                   length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk
            FROM documents
        )
        SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
               CASE
                   WHEN CAST(cjk AS DOUBLE) / greatest(length(text), 1) > 0.2 THEN 'zh'
                   WHEN greatest(hits_en, hits_es, hits_de, hits_fr) > 0
                        AND hits_en = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'en'
                   WHEN greatest(hits_en, hits_es, hits_de, hits_fr) > 0
                        AND hits_es = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'es'
                   WHEN greatest(hits_en, hits_es, hits_de, hits_fr) > 0
                        AND hits_de = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'de'
                   WHEN greatest(hits_en, hits_es, hits_de, hits_fr) > 0
                        AND hits_fr = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'fr'
                   ELSE 'und'
               END AS lang_pred
        FROM h ORDER BY doc_id
    """

    sql["text_fingerprint"] = """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents ORDER BY doc_id
    """

    sql["text_ngram_topk"] = f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        grams AS (
            SELECT unnest(list_transform(
                       range(1, greatest(len(t) - 1, 0) + 1),
                       i -> t[i] || ' ' || t[i + 1])) AS ngram
            FROM toks WHERE len(t) >= 2
        )
        SELECT ngram, count(*) AS freq FROM grams
        GROUP BY ngram ORDER BY freq DESC, ngram LIMIT 20
    """

    sql["split_train_val"] = """
        SELECT doc_id, lang,
               CASE WHEN CAST('0x' || substring(
                        md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                        AS INT) % 100 < 10
                    THEN 'val' ELSE 'train' END AS split
        FROM documents ORDER BY doc_id
    """

    _G5 = ("i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || "
           "t[i+3] || ' ' || t[i+4]")
    eval_vals = _values_sql(EVAL_SNIPPETS, "eid, text")
    sql["text_decontaminate"] = f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        dg AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(t) - 4, 0) + 1), {_G5})))
                       AS gram
            FROM toks WHERE len(t) >= 5
        ),
        et AS (SELECT {_TOKENS} AS t FROM {eval_vals}),
        eg AS (
            SELECT DISTINCT unnest(list_transform(
                       range(1, greatest(len(t) - 4, 0) + 1), {_G5}))
                       AS gram
            FROM et WHERE len(t) >= 5
        ),
        hits AS (
            SELECT DISTINCT doc_id FROM dg
            WHERE gram IN (SELECT gram FROM eg)
        )
        SELECT d.doc_id,
               EXISTS (SELECT 1 FROM hits WHERE hits.doc_id = d.doc_id)
                   AS is_contaminated
        FROM documents d ORDER BY doc_id
    """

    # same "prefilter is invisible" argument as dedup_incremental_bloom
    sql["text_decontaminate_bloom"] = sql["text_decontaminate"]

    _mix_cases = " ".join(
        f"WHEN '{s}' THEN {int(round(f * 10000))}"
        for s, f in SOURCE_MIX.items())
    sql["text_source_mix_sample"] = f"""
        SELECT doc_id, source, lang
        FROM documents
        WHERE CAST('0x' || substring(
                  md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
              % 10000 < CASE source {_mix_cases} ELSE 0 END
        ORDER BY doc_id
    """

    sql["sample_stratified_by_lang"] = """
        WITH h AS (
            SELECT doc_id, lang,
                   md5('strata:' || CAST(doc_id AS VARCHAR)) AS hh
            FROM documents
        )
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rk
            FROM h
        ) WHERE rk <= 5
        ORDER BY lang, doc_id
    """

    # chunk_windows defaults: chunk_tokens=50, overlap=10 -> stride 40
    sql["text_chunk_windows"] = f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        st AS (
            SELECT doc_id, t,
                   list_filter(range(0, greatest(len(t), 1), 40),
                               s -> s < len(t)) AS starts
            FROM toks
        ),
        ch AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(starts) + 1),
                       i -> {{'chunk_id': i - 1,
                             'chunk_len': least(50, len(t) - starts[i]),
                             'chunk_text': array_to_string(
                                 t[starts[i] + 1 : starts[i] + 50], ' ')}})) AS c
            FROM st
        )
        SELECT doc_id, CAST(c.chunk_id AS BIGINT) AS chunk_id,
               CAST(c.chunk_len AS BIGINT) AS chunk_len,
               c.chunk_text AS chunk_text
        FROM ch ORDER BY doc_id, chunk_id
    """

    sql["text_pack_sequences"] = f"""
        WITH c AS (SELECT doc_id, len({_TOKENS}) AS n_tokens FROM documents),
        o AS (
            SELECT doc_id, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start_offset
            FROM c
        )
        SELECT doc_id, n_tokens, start_offset,
               CAST(floor(start_offset / 256) AS BIGINT) AS bin_start,
               CAST(floor((start_offset + greatest(n_tokens - 1, 0)) / 256)
                    AS BIGINT) AS bin_end
        FROM o ORDER BY doc_id
    """

    sql["dedup_exact"] = """
        SELECT min(doc_id) AS doc_id, md5(text) AS text_hash
        FROM documents GROUP BY md5(text) ORDER BY doc_id
    """

    sql["dedup_keep_best"] = f"""
        WITH feat AS (
            SELECT doc_id, lang, source, n_chars,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS k,
                   len({_TOKENS}) AS n_tokens,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST(list_sum(list_transform({_TOKENS},
                                 x -> length(x))) AS DOUBLE)
                             / len({_TOKENS})
                        ELSE 0.0 END AS mwl,
                   CAST(length(text) - length(regexp_replace(text,
                            '[^\\w\\s]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS pr,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST({_sw_hits("en")} AS DOUBLE)
                             / len({_TOKENS})
                        ELSE 0.0 END AS swd
            FROM documents
        ),
        q AS (
            SELECT doc_id, lang, source, n_chars, k,
                   CAST((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
                              THEN 0.25 ELSE 0.0 END)
                      + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0
                              THEN 0.25 ELSE 0.0 END)
                      + (CASE WHEN pr <= 0.2 THEN 0.25 ELSE 0.0 END)
                      + (CASE WHEN swd >= 0.02 THEN 0.25 ELSE 0.0 END)
                     AS DOUBLE) AS quality_score
            FROM feat
        ),
        r AS (
            SELECT doc_id, lang, source, n_chars, quality_score,
                   row_number() OVER (PARTITION BY k
                       ORDER BY quality_score DESC, doc_id) AS rk,
                   CAST(count(*) OVER (PARTITION BY k) AS BIGINT)
                       AS n_members
            FROM q
        )
        SELECT doc_id, lang, source, n_chars, quality_score, n_members
        FROM r WHERE rk = 1 ORDER BY doc_id
    """

    sql["dedup_exact_normalized"] = """
        SELECT min(doc_id) AS doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_hash
        FROM documents GROUP BY 2 ORDER BY doc_id
    """

    sql["dedup_exact_substring"] = """
        WITH toks AS (
            SELECT doc_id, {tok} AS t FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   list_transform(range(0, len(t) - 20 + 1),
                       i -> md5(array_to_string(
                                list_slice(t, i + 1, i + 20), ' ')))
                       AS g
            FROM toks WHERE len(t) >= 20
        ),
        w AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(0, len(g) - 5 + 1),
                       j -> list_aggregate(list_slice(g, j + 1, j + 5),
                                           'min')))) AS wh
            FROM grams WHERE len(g) >= 5
        ),
        good AS (
            SELECT wh FROM w GROUP BY wh
            HAVING count(*) BETWEEN 2 AND 200
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS shared_fingerprints
        FROM w a JOIN good USING (wh) JOIN w b USING (wh)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        ORDER BY 1, 2
    """.format(tok=_TOKENS)

    sql["dedup_substring_decontaminate"] = """
        WITH fp AS (
            SELECT doc_id, wh FROM (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(0, len(g) - 5 + 1),
                           j -> list_aggregate(
                                    list_slice(g, j + 1, j + 5),
                                    'min')))) AS wh
                FROM (
                    SELECT doc_id,
                           list_transform(range(0, len(t) - 20 + 1),
                               i -> md5(array_to_string(
                                        list_slice(t, i + 1, i + 20),
                                        ' '))) AS g
                    FROM (SELECT doc_id, {tok} AS t FROM documents)
                    WHERE len(t) >= 20
                ) WHERE len(g) >= 5
            )
        ),
        corpus_fp AS (
            SELECT DISTINCT wh FROM fp WHERE doc_id % 2 = 0
        ),
        contaminated AS (
            SELECT f.doc_id FROM fp f
            WHERE f.doc_id % 2 = 1
              AND f.wh IN (SELECT wh FROM corpus_fp)
            GROUP BY f.doc_id
            HAVING count(*) >= 1
        )
        SELECT d.doc_id, d.source FROM documents d
        WHERE d.doc_id % 2 = 1
          AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ORDER BY d.doc_id
    """.format(tok=_TOKENS)

    # graded novelty card: same winnowing CTE as the decontaminate
    # oracle; novelty_frac is the raw int/int division (CLAUDE.md)
    sql["dedup_substring_novelty"] = """
        WITH fp AS (
            SELECT doc_id, wh FROM (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(0, len(g) - 5 + 1),
                           j -> list_aggregate(
                                    list_slice(g, j + 1, j + 5),
                                    'min')))) AS wh
                FROM (
                    SELECT doc_id,
                           list_transform(range(0, len(t) - 20 + 1),
                               i -> md5(array_to_string(
                                        list_slice(t, i + 1, i + 20),
                                        ' '))) AS g
                    FROM (SELECT doc_id, {tok} AS t FROM documents)
                    WHERE len(t) >= 20
                ) WHERE len(g) >= 5
            )
        ),
        corpus_fp AS (
            SELECT DISTINCT wh FROM fp WHERE doc_id % 2 = 0
        ),
        per_doc AS (
            SELECT f.doc_id,
                   CAST(count(*) AS BIGINT) AS n_fingerprints,
                   CAST(sum(CASE WHEN f.wh IN (SELECT wh FROM corpus_fp)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
            FROM fp f WHERE f.doc_id % 2 = 1
            GROUP BY f.doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_fingerprints, 0) AS n_fingerprints,
               COALESCE(p.n_seen, 0) AS n_seen,
               CASE WHEN COALESCE(p.n_fingerprints, 0) > 0
                    THEN CAST(p.n_fingerprints - p.n_seen AS DOUBLE)
                         / p.n_fingerprints END AS novelty_frac
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        WHERE d.doc_id % 2 = 1
        ORDER BY d.doc_id
    """.format(tok=_TOKENS)

    # keep = corpus-first occurrence by (doc_id, pos): row_number over
    # the paragraph partition reproduces Spark's min-struct winner
    sql["dedup_paragraph"] = """
        WITH base AS (
            SELECT doc_id,
                   list_filter(list_transform(
                       regexp_split_to_array(text, ' a '),
                       p -> trim(p)), p -> p != '') AS ps
            FROM documents
        ),
        paras AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(ps) + 1),
                       i -> struct_pack(pos := i, para := ps[i]))) AS s
            FROM base WHERE len(ps) > 0
        ),
        occ AS (
            SELECT doc_id, s.pos AS pos, s.para AS para,
                   row_number() OVER (PARTITION BY s.para
                                      ORDER BY doc_id, s.pos) AS rn
            FROM paras
        ),
        agg AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_paragraphs,
                   CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dropped,
                   coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
                                       ' a ' ORDER BY pos), '')
                       AS text_clean
            FROM occ GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,
               CAST(coalesce(a.n_dropped, 0) AS BIGINT) AS n_dropped,
               coalesce(a.text_clean, '') AS text_clean
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id
    """

    sql["dedup_paragraph_stats"] = """
        WITH base AS (
            SELECT doc_id, source,
                   list_filter(list_transform(
                       regexp_split_to_array(text, ' a '),
                       p -> trim(p)), p -> p != '') AS ps
            FROM documents
        ),
        paras AS (
            SELECT doc_id, source,
                   unnest(list_transform(
                       range(1, len(ps) + 1),
                       i -> struct_pack(pos := i, para := ps[i]))) AS s
            FROM base WHERE len(ps) > 0
        ),
        occ AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY s.para
                                      ORDER BY doc_id, s.pos) AS rn
            FROM paras
        )
        SELECT source,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_paragraphs,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   / CAST(count(*) AS BIGINT) AS drop_share
        FROM occ GROUP BY source ORDER BY source
    """

    # corpus paragraphs always win; batch-internal repeats keep only
    # the first (doc_id, pos) occurrence — same rn logic as
    # dedup_paragraph with an extra corpus-membership veto
    sql["dedup_paragraph_incremental"] = """
        WITH base AS (
            SELECT doc_id,
                   list_filter(list_transform(
                       regexp_split_to_array(text, ' a '),
                       p -> trim(p)), p -> p != '') AS ps
            FROM documents WHERE doc_id % 2 = 1
        ),
        paras AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(ps) + 1),
                       i -> struct_pack(pos := i, para := ps[i]))) AS s
            FROM base WHERE len(ps) > 0
        ),
        ckeys AS (
            SELECT DISTINCT unnest(list_filter(list_transform(
                       regexp_split_to_array(text, ' a '),
                       p -> trim(p)), p -> p != '')) AS para
            FROM documents WHERE doc_id % 2 = 0
        ),
        occ AS (
            SELECT doc_id, s.pos AS pos, s.para AS para,
                   row_number() OVER (PARTITION BY s.para
                                      ORDER BY doc_id, s.pos) AS rn,
                   s.para IN (SELECT para FROM ckeys) AS in_corpus
            FROM paras
        ),
        agg AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_paragraphs,
                   CAST(sum(CASE WHEN rn > 1 OR in_corpus
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dropped,
                   coalesce(string_agg(
                       CASE WHEN rn = 1 AND NOT in_corpus THEN para END,
                       ' a ' ORDER BY pos), '') AS text_clean
            FROM occ GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_paragraphs, 0) AS BIGINT)
                   AS n_paragraphs,
               CAST(coalesce(a.n_dropped, 0) AS BIGINT) AS n_dropped,
               coalesce(a.text_clean, '') AS text_clean
        FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id
    """

    # content-defined chunking: cut after position i+7 wherever the
    # 8-gram's first md5 nibble is '0' (p=1/16, ~16-char chunks); the
    # cut list reproduces the Spark operator's boundary-for-boundary
    _CDC_CHUNKS = """
        docs AS (
            SELECT doc_id, source, text, length(text) AS n
            FROM documents WHERE text IS NOT NULL
        ),
        cut AS (
            SELECT doc_id, source, text,
                list_sort(list_distinct(list_concat(list_concat(
                    [CAST(0 AS BIGINT)],
                    [CAST(i + 7 AS BIGINT) FOR i IN
                        (CASE WHEN n >= 8 THEN generate_series(1, n - 7)
                              ELSE [] END)
                     IF substr(md5(substr(text, i, 8)), 1, 1) = '0']),
                    [CAST(n AS BIGINT)]))) AS cuts
            FROM docs
        ),
        chunks AS (
            SELECT doc_id, source,
                   md5(substr(text, CAST(cuts[j] + 1 AS INT),
                              CAST(cuts[j + 1] - cuts[j] AS INT))) AS ck,
                   cuts[j + 1] - cuts[j] AS clen
            FROM cut,
                 unnest(CASE WHEN len(cuts) >= 2
                             THEN generate_series(1, len(cuts) - 1)
                             ELSE [] END) AS t(j)
        ),
        keys AS (
            SELECT ck, count(DISTINCT doc_id) AS nd
            FROM chunks GROUP BY ck
        )
    """

    # periodicity: integer hourly counts on the zero-kept spine,
    # six DECIMAL/HUGEINT correlation sums, r as one fixed
    # correctly-rounded tree; constant series NULL both sides
    sql["ev_periodicity"] = """
        WITH hc AS (
            SELECT event_type,
                   CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT event_type, min(h) AS h0, max(h) AS h1
            FROM hc GROUP BY 1
        ),
        spine AS (
            SELECT event_type, unnest(generate_series(h0, h1)) AS h
            FROM span
        ),
        fullh AS (
            SELECT s.event_type, s.h, coalesce(hc.c, 0) AS c
            FROM spine s LEFT JOIN hc
              ON s.event_type = hc.event_type AND s.h = hc.h
        ),
        lagged AS (
            SELECT event_type, c AS a,
                   lag(c, 1) OVER w AS s0,
                   lag(c, 24) OVER w AS s1,
                   lag(c, 168) OVER w AS s2
            FROM fullh
            WINDOW w AS (PARTITION BY event_type ORDER BY h)
        ),
        pairs AS (
            SELECT event_type, lag_hours, a, b FROM (
                SELECT event_type, 1 AS lag_hours, a, s0 AS b
                FROM lagged
                UNION ALL
                SELECT event_type, 24, a, s1 FROM lagged
                UNION ALL
                SELECT event_type, 168, a, s2 FROM lagged
            ) WHERE b IS NOT NULL
        ),
        s AS (
            SELECT event_type, CAST(lag_hours AS BIGINT) AS lag_hours,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   sum(CAST(a AS HUGEINT)) AS sa,
                   sum(CAST(b AS HUGEINT)) AS sb,
                   sum(CAST(a AS HUGEINT) * b) AS sab,
                   sum(CAST(a AS HUGEINT) * a) AS saa,
                   sum(CAST(b AS HUGEINT) * b) AS sbb
            FROM pairs GROUP BY 1, 2
        )
        SELECT event_type, lag_hours, n_pairs,
               CASE WHEN n_pairs * saa - sa * sa > 0
                     AND n_pairs * sbb - sb * sb > 0 THEN
                   CAST(n_pairs * sab - sa * sb AS DOUBLE)
                   / (sqrt(CAST(n_pairs * saa - sa * sa AS DOUBLE))
                      * sqrt(CAST(n_pairs * sbb - sb * sb AS DOUBLE)))
               END AS autocorr
        FROM s ORDER BY event_type, lag_hours
    """

    # log-rank: exact integer risk sets (KM machinery) split by the
    # md5 arm assignment; hypergeometric E/V terms as fixed
    # correctly-rounded double trees (factors cast to double FIRST —
    # the V product overflows bigint near n~3M), running sums through
    # ORDERED windows; last row via lexicographic max on unique t
    sql["ev_logrank_ab"] = """
        WITH hz AS (SELECT max(ts) AS h FROM events),
        users AS (
            SELECT user_id, min(ts) AS f,
                   min(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS conv
            FROM events GROUP BY user_id),
        obs AS (
            SELECT CAST((epoch_us(coalesce(conv, hz.h)) - epoch_us(f))
                        // 3600000000 AS BIGINT) AS t,
                   CAST(conv IS NOT NULL AS INT) AS cv,
                   CASE WHEN CAST('0x' || substring(
                           md5('exp1:' || CAST(user_id AS VARCHAR)),
                           1, 4) AS INT) % 2 = 1
                        THEN 1 ELSE 0 END AS tr
            FROM users, hz),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(tr) AS BIGINT) AS n1
            FROM obs),
        per_t AS (
            SELECT t, CAST(sum(cv) AS BIGINT) AS d,
                   CAST(count(*) AS BIGINT) AS e,
                   CAST(sum(cv * tr) AS BIGINT) AS d1,
                   CAST(sum(tr) AS BIGINT) AS e1
            FROM obs GROUP BY t),
        risk AS (
            SELECT t, d, d1,
                   tot.n - CAST(coalesce(sum(e) OVER wp, 0) AS BIGINT)
                       AS nt,
                   tot.n1 - CAST(coalesce(sum(e1) OVER wp, 0)
                                 AS BIGINT) AS n1t,
                   tot.n AS n, tot.n1 AS n1
            FROM per_t, tot
            WINDOW wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING)),
        cum AS (
            SELECT t, n, n1,
                   CAST(sum(d1) OVER wc AS BIGINT) AS o1,
                   sum(CASE WHEN d > 0 THEN
                       CAST(d AS DOUBLE) * CAST(n1t AS DOUBLE)
                       / CAST(nt AS DOUBLE) END) OVER wc AS ecum,
                   sum(CASE WHEN d > 0 AND nt > 1 THEN
                       CAST(d AS DOUBLE)
                       * (CAST(nt AS DOUBLE) - CAST(d AS DOUBLE))
                       * CAST(n1t AS DOUBLE)
                       * (CAST(nt AS DOUBLE) - CAST(n1t AS DOUBLE))
                       / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                          * (CAST(nt AS DOUBLE) - 1)) END) OVER wc
                       AS vcum
            FROM risk
            WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW))
        SELECT n AS n_total, n1 AS n_treatment, o1, ecum AS e1,
               vcum AS v,
               CASE WHEN vcum > 0 THEN
                   (CAST(o1 AS DOUBLE) - ecum) / sqrt(vcum)
               END AS z_stat
        FROM cum ORDER BY t DESC LIMIT 1
    """

    # ANOVA: integer (n, Σx, Σx²) per group, S²/n terms as fixed
    # correctly-rounded double trees, ORDERED cum over the k-row group
    # table (merge-order-proof), last cum via max_by
    sql["stats_anova_oneway"] = """
        WITH per AS (
            SELECT o_orderpriority AS g,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(round(o_totalprice, 2) * 100)
                                 AS BIGINT)) AS BIGINT) AS s,
                   sum(CAST(CAST(round(round(o_totalprice, 2) * 100)
                                 AS BIGINT) AS HUGEINT)
                       * CAST(round(round(o_totalprice, 2) * 100)
                              AS BIGINT)) AS q
            FROM orders GROUP BY 1
        ),
        c AS (
            SELECT g, n, s, q,
                   sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE))
                       OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cum
            FROM per
        ),
        a AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
                   CAST(sum(n) AS BIGINT) AS n_total,
                   CAST(sum(s) AS BIGINT) AS stot,
                   sum(q) AS qtot,
                   max_by(cum, g) AS lastcum
            FROM c
        )
        SELECT k_groups, n_total,
               k_groups - 1 AS df1,
               n_total - k_groups AS df2,
               lastcum - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
                         / CAST(n_total AS DOUBLE) AS ss_between,
               CAST(qtot AS DOUBLE) - lastcum AS ss_within,
               ((lastcum - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
                           / CAST(n_total AS DOUBLE))
                / CAST(k_groups - 1 AS DOUBLE))
               / ((CAST(qtot AS DOUBLE) - lastcum)
                  / CAST(n_total - k_groups AS DOUBLE)) AS f_stat,
               (lastcum - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
                          / CAST(n_total AS DOUBLE))
               / ((lastcum - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
                             / CAST(n_total AS DOUBLE))
                  + (CAST(qtot AS DOUBLE) - lastcum)) AS eta_sq
        FROM a
    """

    # two-regressor OLS: exact HUGEINT normal-equation sums over the
    # zero-kept day spine, double-cast-first Cramer trees (logrank
    # rule), weekend via the dayofweek integer map
    sql["ev_ols_weekend"] = """
        WITH dc AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT event_type, min(d) AS d0, max(d) AS d1
            FROM dc GROUP BY 1
        ),
        spine AS (
            SELECT event_type, d0,
                   CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                        CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY))
                        AS DATE) AS d
            FROM span
        ),
        fl AS (
            SELECT s.event_type,
                   CAST(date_diff('day', s.d0, s.d) AS BIGINT) AS t,
                   CASE WHEN dayofweek(s.d) IN (0, 6)
                        THEN 1 ELSE 0 END AS w,
                   coalesce(dc.y, 0) AS y
            FROM spine s LEFT JOIN dc
              ON s.event_type = dc.event_type AND s.d = dc.d
        ),
        per AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_days,
                   sum(CAST(t AS HUGEINT)) AS st,
                   sum(CAST(w AS HUGEINT)) AS sw,
                   sum(CAST(t AS HUGEINT) * t) AS stt,
                   sum(CAST(t AS HUGEINT) * w) AS stw,
                   sum(CAST(w AS HUGEINT) * w) AS sww,
                   sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(t AS HUGEINT) * y) AS sty,
                   sum(CAST(w AS HUGEINT) * y) AS swy,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM fl GROUP BY 1
        ),
        dbl AS (
            SELECT event_type, n_days,
                   CAST(n_days AS DOUBLE) AS n,
                   CAST(st AS DOUBLE) AS st, CAST(sw AS DOUBLE) AS sw,
                   CAST(stt AS DOUBLE) AS stt,
                   CAST(stw AS DOUBLE) AS stw,
                   CAST(sww AS DOUBLE) AS sww,
                   CAST(sy AS DOUBLE) AS sy,
                   CAST(sty AS DOUBLE) AS sty,
                   CAST(swy AS DOUBLE) AS swy,
                   CAST(syy AS DOUBLE) AS syy
            FROM per
        ),
        sol AS (
            SELECT event_type, n_days, n, sy, sty, swy, syy,
                   n * (stt * sww - stw * stw)
                   - st * (st * sww - stw * sw)
                   + sw * (st * stw - stt * sw) AS det,
                   sy * (stt * sww - stw * stw)
                   - st * (sty * sww - stw * swy)
                   + sw * (sty * stw - stt * swy) AS dd0,
                   n * (sty * sww - stw * swy)
                   - sy * (st * sww - stw * sw)
                   + sw * (st * swy - sty * sw) AS dd1,
                   n * (stt * swy - sty * stw)
                   - st * (st * swy - sty * sw)
                   + sy * (st * stw - stt * sw) AS dd2
            FROM dbl
        )
        SELECT event_type, n_days,
               CASE WHEN det <> 0 THEN dd0 / det END AS intercept,
               CASE WHEN det <> 0 THEN dd1 / det END AS trend_per_day,
               CASE WHEN det <> 0 THEN dd2 / det END AS weekend_lift,
               CASE WHEN det <> 0 AND syy - sy * sy / n > 0 THEN
                   1.0 - (syy - (dd0 / det) * sy - (dd1 / det) * sty
                          - (dd2 / det) * swy)
                         / (syy - sy * sy / n)
               END AS r2
        FROM sol ORDER BY event_type
    """

    # ordinal-pattern entropy: the periodicity hour spine + lead
    # pairs -> pure-integer trit codes; entropy via the
    # ev_user_entropy micro-nat grid (exact bigint sums)
    sql["ev_permutation_entropy"] = """
        WITH hc AS (
            SELECT event_type,
                   CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT event_type, min(h) AS h0, max(h) AS h1
            FROM hc GROUP BY 1
        ),
        spine AS (
            SELECT event_type, unnest(generate_series(h0, h1)) AS h
            FROM span
        ),
        fullh AS (
            SELECT s.event_type, s.h, coalesce(hc.c, 0) AS c
            FROM spine s LEFT JOIN hc
              ON s.event_type = hc.event_type AND s.h = hc.h
        ),
        tri AS (
            SELECT event_type, c AS x0,
                   lead(c, 1) OVER w AS x1,
                   lead(c, 2) OVER w AS x2
            FROM fullh
            WINDOW w AS (PARTITION BY event_type ORDER BY h)
        ),
        coded AS (
            SELECT event_type,
                   (CASE WHEN x0 < x1 THEN 0 WHEN x0 = x1 THEN 1
                         ELSE 2 END) * 9
                   + (CASE WHEN x1 < x2 THEN 0 WHEN x1 = x2 THEN 1
                           ELSE 2 END) * 3
                   + (CASE WHEN x0 < x2 THEN 0 WHEN x0 = x2 THEN 1
                           ELSE 2 END) AS code
            FROM tri WHERE x2 IS NOT NULL
        ),
        pc AS (
            SELECT event_type, code, CAST(count(*) AS BIGINT) AS c
            FROM coded GROUP BY 1, 2
        ),
        per AS (
            SELECT event_type,
                   CAST(sum(c) AS BIGINT) AS n_windows,
                   CAST(count(*) AS BIGINT) AS n_codes,
                   CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT))
                        AS BIGINT) AS slc
            FROM pc GROUP BY 1
        )
        SELECT event_type, n_windows, n_codes,
               round(ln(n_windows), 6) - (slc / n_windows) / 1000000.0
                   AS perm_entropy,
               CASE WHEN n_codes > 1 THEN
                   (round(ln(n_windows), 6)
                    - (slc / n_windows) / 1000000.0)
                   / round(ln(n_codes), 6) END AS evenness
        FROM per ORDER BY event_type
    """

    # Ljung-Box: n-scaled exact integer centered products, ordered
    # K-row cum window, Q one fixed tree; constant series drop
    sql["ts_ljung_box"] = """
        WITH long AS ({long}),
        base AS (
            SELECT code, date,
                   CAST(round(round(value, 2) * 100) AS BIGINT) AS c
            FROM long
        ),
        lagged AS (
            SELECT code, c,
                   CAST(sum(c) OVER wp AS BIGINT) AS stot,
                   CAST(count(*) OVER wp AS BIGINT) AS n,
                   lag(c, 1) OVER wo AS g1, lag(c, 2) OVER wo AS g2,
                   lag(c, 3) OVER wo AS g3, lag(c, 4) OVER wo AS g4,
                   lag(c, 5) OVER wo AS g5, lag(c, 6) OVER wo AS g6,
                   lag(c, 7) OVER wo AS g7, lag(c, 8) OVER wo AS g8
            FROM base
            WINDOW wo AS (PARTITION BY code ORDER BY date),
                   wp AS (PARTITION BY code)
        ),
        pairs AS (
            SELECT code, k, n,
                   CAST(n AS HUGEINT) * c - stot AS dv,
                   CASE WHEN p IS NOT NULL THEN
                       CAST(n AS HUGEINT) * p - stot END AS dp
            FROM (
                SELECT code, c, stot, n, 1 AS k, g1 AS p FROM lagged
                UNION ALL SELECT code, c, stot, n, 2, g2 FROM lagged
                UNION ALL SELECT code, c, stot, n, 3, g3 FROM lagged
                UNION ALL SELECT code, c, stot, n, 4, g4 FROM lagged
                UNION ALL SELECT code, c, stot, n, 5, g5 FROM lagged
                UNION ALL SELECT code, c, stot, n, 6, g6 FROM lagged
                UNION ALL SELECT code, c, stot, n, 7, g7 FROM lagged
                UNION ALL SELECT code, c, stot, n, 8, g8 FROM lagged
            )
        ),
        per_k AS (
            SELECT code, CAST(k AS BIGINT) AS k,
                   CAST(max(n) AS BIGINT) AS n,
                   sum(CASE WHEN dp IS NOT NULL THEN dv * dp END)
                       AS num,
                   sum(dv * dv) AS den
            FROM pairs GROUP BY 1, 2
        ),
        cums AS (
            SELECT code, k, n,
                   sum(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                       * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                       / CAST(n - k AS DOUBLE))
                       OVER (PARTITION BY code ORDER BY k
                             ROWS BETWEEN UNBOUNDED PRECEDING AND
                             CURRENT ROW) AS ct
            FROM per_k WHERE den > 0
        ),
        ag AS (
            SELECT code, CAST(max(n) AS BIGINT) AS n_obs,
                   CAST(count(*) AS BIGINT) AS lags_used,
                   max_by(ct, k) AS lct
            FROM cums GROUP BY 1
        )
        SELECT code, n_obs, lags_used,
               CAST(n_obs AS DOUBLE) * (CAST(n_obs AS DOUBLE) + 2.0)
               * lct AS q_lb
        FROM ag ORDER BY code
    """.format(long=_LONG)

    # variance ratio: exact integer change moments, VR and z as
    # fixed double trees; base-lag moments ride the stack rows
    sql["ts_variance_ratio"] = """
        WITH long AS ({long}),
        base AS (
            SELECT code, date,
                   CAST(round(round(value, 2) * 100) AS BIGINT) AS c
            FROM long
        ),
        lagged AS (
            SELECT code, c,
                   lag(c, 1) OVER w AS l1,
                   lag(c, 2) OVER w AS l2,
                   lag(c, 4) OVER w AS l4,
                   lag(c, 8) OVER w AS l8
            FROM base
            WINDOW w AS (PARTITION BY code ORDER BY date)
        ),
        pairs AS (
            SELECT code, q, c - lq AS dq, c - l1 AS d1 FROM (
                SELECT code, c, l1, 2 AS q, l2 AS lq FROM lagged
                UNION ALL
                SELECT code, c, l1, 4, l4 FROM lagged
                UNION ALL
                SELECT code, c, l1, 8, l8 FROM lagged
            )
        ),
        per AS (
            SELECT code, CAST(q AS BIGINT) AS q,
                   CAST(count(dq) AS BIGINT) AS nq,
                   sum(CAST(dq AS HUGEINT)) AS sq,
                   sum(CAST(dq AS HUGEINT) * dq) AS qq,
                   CAST(count(d1) AS BIGINT) AS n1,
                   sum(CAST(d1 AS HUGEINT)) AS s1,
                   sum(CAST(d1 AS HUGEINT) * d1) AS q1
            FROM pairs GROUP BY 1, 2
        ),
        v AS (
            SELECT code, q, nq, n1,
                   CAST(CAST(nq AS HUGEINT) * qq - sq * sq AS DOUBLE)
                   / (CAST(nq AS DOUBLE) * CAST(nq AS DOUBLE)) AS vq,
                   CAST(CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS DOUBLE)
                   / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS v1
            FROM per
        )
        SELECT code, q, nq AS n_diffs,
               CASE WHEN nq > 0 AND n1 > 1 AND v1 > 0 THEN
                   vq / (CAST(q AS DOUBLE) * v1) END
                   AS variance_ratio,
               CASE WHEN nq > 0 AND n1 > 1 AND v1 > 0 THEN
                   (vq / (CAST(q AS DOUBLE) * v1) - 1.0)
                   / sqrt(2.0 * (2.0 * CAST(q AS DOUBLE) - 1)
                          * (CAST(q AS DOUBLE) - 1)
                          / (3.0 * CAST(q AS DOUBLE)
                             * CAST(nq AS DOUBLE)))
               END AS z_iid
        FROM v ORDER BY code, q
    """.format(long=_LONG)

    # Hurst R/S: integer W_j = s*CC_j - j*S per block, R/S one
    # correctly-rounded tree, micro-ln grid, ordered k-scale slope
    sql["ts_hurst"] = """
        WITH long AS ({long}),
        base AS (
            SELECT code,
                   CAST(round(round(value, 2) * 100) AS BIGINT) AS c,
                   CAST(row_number() OVER (PARTITION BY code
                        ORDER BY date) AS BIGINT) AS rn
            FROM long
        ),
        ex AS (
            SELECT code, c, rn, CAST(sc.s AS BIGINT) AS s,
                   (rn - 1) // CAST(sc.s AS BIGINT) AS b
            FROM base, (SELECT unnest([16, 32, 64, 128]) AS s) sc
        ),
        roww AS (
            SELECT code, s, b,
                   CAST(row_number() OVER wo AS BIGINT) AS j,
                   CAST(sum(c) OVER (wo ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
                   CAST(sum(c) OVER wp AS BIGINT) AS bs,
                   sum(CAST(c AS HUGEINT) * c) OVER wp AS bq
            FROM ex
            WINDOW wo AS (PARTITION BY code, s, b ORDER BY rn),
                   wp AS (PARTITION BY code, s, b)
        ),
        ww AS (
            SELECT code, s, b, j, bs, bq,
                   s * cc - j * bs AS w
            FROM roww
        ),
        blocks AS (
            SELECT code, s, b, max(j) AS nb,
                   max(w) AS wmax, min(w) AS wmin,
                   min(bs) AS bs, min(bq) AS bq
            FROM ww GROUP BY 1, 2, 3
            HAVING max(j) = s
        ),
        rs AS (
            SELECT code, s,
                   CAST(round(ln(CAST(wmax - wmin AS DOUBLE)
                        / sqrt(CAST(CAST(s AS HUGEINT) * bq
                               - CAST(bs AS HUGEINT) * bs
                               AS DOUBLE))) * 1000000) AS BIGINT)
                       AS lnrs
            FROM blocks
            WHERE CAST(s AS HUGEINT) * bq
                  - CAST(bs AS HUGEINT) * bs > 0
        ),
        per AS (
            SELECT code, s, CAST(count(*) AS BIGINT) AS nblk,
                   CAST(sum(lnrs) AS BIGINT) AS slnrs
            FROM rs GROUP BY 1, 2
        ),
        cums AS (
            SELECT code, s, nblk,
                   CAST(round(ln(CAST(s AS DOUBLE)) * 1000000)
                        AS BIGINT) AS x,
                   sum(CAST(slnrs AS DOUBLE) / CAST(nblk AS DOUBLE))
                       OVER wsc AS cy,
                   sum(CAST(CAST(round(ln(CAST(s AS DOUBLE))
                            * 1000000) AS BIGINT) AS DOUBLE)
                       * (CAST(slnrs AS DOUBLE)
                          / CAST(nblk AS DOUBLE))) OVER wsc AS cxy
            FROM per
            WINDOW wsc AS (PARTITION BY code ORDER BY s
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
        ),
        ag AS (
            SELECT code, CAST(count(*) AS BIGINT) AS n_scales,
                   CAST(sum(nblk) AS BIGINT) AS n_blocks,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   max_by(cy, s) AS lcy, max_by(cxy, s) AS lcxy
            FROM cums GROUP BY 1
        )
        SELECT code, n_scales, n_blocks,
               CASE WHEN n_scales >= 2
                     AND CAST(n_scales AS DOUBLE)
                         * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         <> 0
               THEN (CAST(n_scales AS DOUBLE) * lcxy
                     - CAST(sx AS DOUBLE) * lcy)
                    / (CAST(n_scales AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               END AS hurst
        FROM ag ORDER BY code
    """.format(long=_LONG)

    # seasonal-naive benchmark: index lags over the observed per-code
    # sequence, exact bigint |e| sums, int/int MAEs, ratio of two
    # identical-bit doubles
    sql["ts_seasonal_naive_eval"] = """
        WITH long AS ({long}),
        lagged AS (
            SELECT code,
                   CAST(round(round(value, 2) * 100) AS BIGINT) AS c,
                   lag(CAST(round(round(value, 2) * 100) AS BIGINT),
                       1) OVER w AS l1,
                   lag(CAST(round(round(value, 2) * 100) AS BIGINT),
                       7) OVER w AS lm
            FROM long
            WINDOW w AS (PARTITION BY code ORDER BY date)
        ),
        per AS (
            SELECT code, CAST(count(*) AS BIGINT) AS n_obs,
                   CAST(sum(CASE WHEN l1 IS NOT NULL THEN 1 ELSE 0
                            END) AS BIGINT) AS n_naive_pairs,
                   CAST(sum(CASE WHEN lm IS NOT NULL THEN 1 ELSE 0
                            END) AS BIGINT) AS n_seasonal_pairs,
                   CAST(sum(abs(c - l1)) AS BIGINT) AS ae1,
                   CAST(sum(abs(c - lm)) AS BIGINT) AS aem
            FROM lagged GROUP BY 1
        )
        SELECT code, n_obs, n_naive_pairs, n_seasonal_pairs,
               CASE WHEN n_naive_pairs > 0
                    THEN ae1 / n_naive_pairs END AS mae_naive_cents,
               CASE WHEN n_seasonal_pairs > 0
                    THEN aem / n_seasonal_pairs
               END AS mae_seasonal_cents,
               CASE WHEN n_seasonal_pairs > 0 AND n_naive_pairs > 0
                         AND ae1 / n_naive_pairs <> 0
                    THEN (aem / n_seasonal_pairs)
                         / (ae1 / n_naive_pairs)
               END AS mase_ratio
        FROM per ORDER BY code
    """.format(long=_LONG)

    # Friedman: within-year ranks as exact doubled integers
    # (2*rank + eq - 1), completeness via the global max block
    # width over the bounded grid, one double tree at the end
    sql["stats_friedman"] = """
        WITH cells AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS b,
                   o_orderpriority AS t,
                   CAST(sum(CAST(round(round(o_totalprice, 2) * 100)
                                 AS BIGINT)) AS BIGINT) AS x
            FROM orders GROUP BY 1, 2
        ),
        ranked AS (
            SELECT b, t,
                   CAST(2 * rank() OVER (PARTITION BY b ORDER BY x)
                        + count(*) OVER (PARTITION BY b, x) - 1
                        AS BIGINT) AS r2,
                   CAST(count(*) OVER (PARTITION BY b) AS BIGINT)
                       AS kb
            FROM cells
        ),
        fl AS (
            SELECT b, t, r2, kb,
                   CAST(max(kb) OVER () AS BIGINT) AS k
            FROM ranked
        ),
        kept AS (SELECT * FROM fl WHERE kb = k),
        per_t AS (
            SELECT t, CAST(count(*) AS BIGINT) AS n,
                   sum(CAST(r2 AS HUGEINT)) AS r2s
            FROM kept GROUP BY 1
        ),
        a AS (
            SELECT CAST(count(*) AS BIGINT) AS k_treatments,
                   CAST(max(n) AS BIGINT) AS n_blocks,
                   sum(r2s * r2s) AS sr2sq
            FROM per_t
        )
        SELECT n_blocks, k_treatments,
               k_treatments - 1 AS df,
               CASE WHEN k_treatments > 1 AND n_blocks > 1 THEN
                   3.0 * CAST(sr2sq AS DOUBLE)
                   / (CAST(n_blocks AS DOUBLE)
                      * CAST(k_treatments AS DOUBLE)
                      * (CAST(k_treatments AS DOUBLE) + 1.0))
                   - 3.0 * CAST(n_blocks AS DOUBLE)
                     * (CAST(k_treatments AS DOUBLE) + 1.0)
               END AS chi2_f
        FROM a
    """

    # funnel timing: one conditional-min aggregate, pair stack,
    # integer-us lags, quantile_cont == Spark exact percentile
    sql["ev_funnel_timing"] = """
        WITH mins AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END)
                       AS t0,
                   min(CASE WHEN event_type = 'click' THEN ts END)
                       AS t1,
                   min(CASE WHEN event_type = 'purchase' THEN ts
                       END) AS t2
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
            GROUP BY user_id
        ),
        pairs AS (
            SELECT 'view' AS sf, 'click' AS st, t0 AS tf, t1 AS tt
            FROM mins
            UNION ALL
            SELECT 'click', 'purchase', t1, t2 FROM mins
            UNION ALL
            SELECT 'view', 'purchase', t0, t2 FROM mins
        ),
        lags AS (
            SELECT sf, st, tf IS NOT NULL AS hf,
                   CASE WHEN tt >= tf THEN
                       date_diff('microsecond', tf, tt) END AS lag_us
            FROM pairs
        )
        SELECT sf AS step_from, st AS step_to,
               CAST(sum(CASE WHEN hf THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_from,
               CAST(count(lag_us) AS BIGINT) AS n_converted,
               CASE WHEN sum(CASE WHEN hf THEN 1 ELSE 0 END) > 0
                    THEN count(lag_us)
                         / CAST(sum(CASE WHEN hf THEN 1 ELSE 0 END)
                                AS BIGINT)
               END AS conversion_rate,
               quantile_cont(lag_us, 0.5) AS p50_lag_us,
               quantile_cont(lag_us, 0.9) AS p90_lag_us
        FROM lags GROUP BY 1, 2 ORDER BY 1, 2
    """

    # growth accounting: integer week buckets, per-user lag/min in
    # one window pass, contiguous-week churn
    sql["ev_growth_accounting"] = """
        WITH uw AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) AS BIGINT) // 604800000000
                       AS wk
            FROM events
        ),
        flagged AS (
            SELECT wk,
                   lag(wk) OVER (PARTITION BY user_id ORDER BY wk)
                       AS prev,
                   min(wk) OVER (PARTITION BY user_id) AS fw
            FROM uw
        ),
        per AS (
            SELECT wk, CAST(count(*) AS BIGINT) AS active,
                   CAST(sum(CASE WHEN wk = fw THEN 1 ELSE 0 END)
                        AS BIGINT) AS new_users,
                   CAST(sum(CASE WHEN prev = wk - 1 THEN 1 ELSE 0
                            END) AS BIGINT) AS retained,
                   CAST(sum(CASE WHEN wk != fw
                                  AND coalesce(prev, -10) < wk - 1
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS resurrected
            FROM flagged GROUP BY 1
        )
        SELECT wk AS week, active, new_users, retained, resurrected,
               CAST(CASE WHEN lag(wk) OVER (ORDER BY wk) = wk - 1
                    THEN lag(active) OVER (ORDER BY wk) - retained
                    ELSE 0 END AS BIGINT) AS churned_from_prev
        FROM per ORDER BY week
    """

    # basket rules: capped inverted-index pairs, both directions,
    # exact HUGEINT lift products, TakeOrdered-equivalent LIMIT on
    # the total (lift, ids) order
    sql["q_basket_rules"] = """
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        ok AS (
            SELECT l_orderkey FROM items GROUP BY l_orderkey
            HAVING count(*) BETWEEN 2 AND 50
        ),
        it AS (
            SELECT i.l_orderkey, i.l_partkey
            FROM items i JOIN ok USING (l_orderkey)
        ),
        nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ok),
        pairs AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM it a JOIN it b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        pc AS (
            SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n
            FROM it GROUP BY 1
        ),
        bth AS (
            SELECT p.pa, p.pb, p.n_both, ca.n AS na, cb.n AS nbc
            FROM pairs p
            JOIN pc ca ON p.pa = ca.pk
            JOIN pc cb ON p.pb = cb.pk
        ),
        directional AS (
            SELECT pa AS antecedent, pb AS consequent, n_both,
                   na AS n_ant, nbc AS n_con FROM bth
            UNION ALL
            SELECT pb, pa, n_both, nbc, na FROM bth
        )
        SELECT CAST(antecedent AS BIGINT) AS antecedent,
               CAST(consequent AS BIGINT) AS consequent, n_both,
               n_both / nb.n AS support,
               n_both / n_ant AS confidence,
               CAST(CAST(nb.n AS HUGEINT) * n_both AS DOUBLE)
               / CAST(CAST(n_ant AS HUGEINT) * n_con AS DOUBLE)
                   AS lift
        FROM directional, nb
        ORDER BY lift DESC, antecedent, consequent
        LIMIT 50
    """

    # elasticity: micro-ln integer inputs, HUGEINT moments,
    # double-cast-first slope/r2 trees
    sql["q_price_elasticity"] = """
        WITH base AS (
            SELECT p.p_brand AS g,
                   CAST(round(ln(CAST(CAST(round(round(p.p_retailprice,
                        2) * 100) AS BIGINT) AS DOUBLE)) * 1000000)
                        AS BIGINT) AS x,
                   CAST(round(ln(CAST(CAST(l.l_quantity AS BIGINT)
                        AS DOUBLE)) * 1000000) AS BIGINT) AS y
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
        ),
        per AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n_items,
                   sum(CAST(x AS HUGEINT)) AS sx,
                   sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x AS HUGEINT) * y) AS sxy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM base GROUP BY 1
        ),
        d AS (
            SELECT g, n_items,
                   CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                   CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                   CAST(n_items AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
            FROM per
        )
        SELECT g AS p_brand, n_items,
               CASE WHEN vx <> 0 THEN cov / vx END AS elasticity,
               CASE WHEN vx <> 0 AND vy <> 0 THEN
                   cov * cov / (vx * vy) END AS r2
        FROM d ORDER BY p_brand
    """

    # fulfillment lag card: integer day lags, value-bounded curve
    # median (brown_forsythe lo/hi rule), int/int shares — stats and
    # median in one aggregate over the curve
    sql["q_fulfillment_lag"] = """
        WITH src AS (
            SELECT o.o_orderpriority AS priority,
                   CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                        AS BIGINT) AS d
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        curve AS (
            SELECT priority, d, CAST(count(*) AS BIGINT) AS t
            FROM src GROUP BY 1, 2
        ),
        cum AS (
            SELECT priority, d, t,
                   CAST(sum(t) OVER (PARTITION BY priority ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS BIGINT) AS cm,
                   CAST(sum(t) OVER (PARTITION BY priority)
                        AS BIGINT) AS n
            FROM curve
        ),
        agg AS (
            SELECT priority,
                   CAST(max(n) AS BIGINT) AS n_items,
                   CAST(sum(CASE WHEN d > 90 THEN t ELSE 0 END)
                        AS BIGINT) AS slow_n,
                   CAST(sum(t * d) AS BIGINT) AS sd,
                   min(CASE WHEN cm >= (n + 1) // 2 THEN d END)
                       AS lo,
                   min(CASE WHEN cm >= n // 2 + 1 THEN d END) AS hi
            FROM cum GROUP BY 1
        )
        SELECT priority, n_items, slow_n,
               slow_n / n_items AS slow_share,
               sd / n_items AS mean_lag_days,
               CAST(lo + hi AS DOUBLE) / 2.0 AS median_lag_days
        FROM agg ORDER BY priority
    """

    # repeat-purchase pairs: chained lag adjacency per
    # (customer, part), distinct-first, pure integer output
    sql["q_repeat_purchases"] = """
        WITH base AS (
            SELECT o.o_custkey AS custkey,
                   CAST(l.l_partkey AS BIGINT) AS partkey,
                   o.o_orderdate AS d,
                   CAST(o.o_orderkey AS BIGINT) AS k
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, 3, 4
        ),
        lagged AS (
            SELECT custkey, partkey,
                   lag(k) OVER w AS first_order,
                   k AS second_order,
                   lag(d) OVER w AS first_date,
                   d AS second_date
            FROM base
            WINDOW w AS (PARTITION BY custkey, partkey
                         ORDER BY d, k)
        )
        SELECT CAST(custkey AS BIGINT) AS custkey, partkey,
               first_order, second_order,
               CAST(date_diff('day', first_date, second_date)
                    AS BIGINT) AS gap_days,
               CAST(first_date AS DATE) AS first_date,
               CAST(second_date AS DATE) AS second_date
        FROM lagged
        WHERE first_order IS NOT NULL
          AND date_diff('day', first_date, second_date) <= 365
        ORDER BY custkey, partkey, second_order
    """

    # Brown-Forsythe: exact integer medians from the per-group
    # value-curve cumsum (2*med = lo+hi), then the anova_oneway
    # recipe verbatim on integer half-cent deviations
    sql["stats_brown_forsythe"] = """
        WITH src AS (
            SELECT o_orderpriority AS g,
                   CAST(round(round(o_totalprice, 2) * 100)
                        AS BIGINT) AS c
            FROM orders
        ),
        curve AS (
            SELECT g, c, CAST(count(*) AS BIGINT) AS t
            FROM src GROUP BY 1, 2
        ),
        cum AS (
            SELECT g, c, t,
                   CAST(sum(t) OVER (PARTITION BY g ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS BIGINT) AS cm,
                   CAST(sum(t) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM curve
        ),
        med AS (
            SELECT g,
                   min(CASE WHEN cm >= (n + 1) // 2 THEN c END)
                   + min(CASE WHEN cm >= n // 2 + 1 THEN c END)
                       AS m2
            FROM cum GROUP BY 1
        ),
        z AS (
            SELECT src.g, abs(2 * src.c - med.m2) AS zv
            FROM src JOIN med ON src.g = med.g
        ),
        per AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(zv) AS BIGINT) AS s,
                   sum(CAST(zv AS HUGEINT) * zv) AS q
            FROM z GROUP BY 1
        ),
        cg AS (
            SELECT g, n, s, q,
                   sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE))
                       OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cumt
            FROM per
        ),
        a AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
                   CAST(sum(n) AS BIGINT) AS n_total,
                   CAST(sum(s) AS BIGINT) AS stot,
                   sum(q) AS qtot,
                   max_by(cumt, g) AS lastcum
            FROM cg
        )
        SELECT k_groups, n_total,
               k_groups - 1 AS df1,
               n_total - k_groups AS df2,
               ((lastcum - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
                           / CAST(n_total AS DOUBLE))
                / CAST(k_groups - 1 AS DOUBLE))
               / ((CAST(qtot AS DOUBLE) - lastcum)
                  / CAST(n_total - k_groups AS DOUBLE)) AS f_stat
        FROM a
    """

    # assortativity: symmetrized edge list -> exact HUGEINT sums,
    # r = (M*Sxy - Sx^2)/(M*Sxx - Sx^2), no sqrt
    sql["graph_part_assortativity"] = """
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        ok AS (
            SELECT l_orderkey FROM items GROUP BY l_orderkey
            HAVING count(*) BETWEEN 2 AND 50
        ),
        it AS (
            SELECT i.l_orderkey, i.l_partkey
            FROM items i JOIN ok USING (l_orderkey)
        ),
        edges AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM it a JOIN it b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= 1
        ),
        und AS (
            SELECT a AS x, b AS y FROM edges
            UNION ALL SELECT b, a FROM edges
        ),
        deg AS (
            SELECT x AS node, CAST(count(*) AS BIGINT) AS d
            FROM und GROUP BY 1
        ),
        pr AS (
            SELECT dx.d AS ddx, dy.d AS ddy
            FROM und
            JOIN deg dx ON und.x = dx.node
            JOIN deg dy ON und.y = dy.node
        ),
        ag AS (
            SELECT CAST(count(*) AS BIGINT) AS m,
                   sum(CAST(ddx AS HUGEINT)) AS sx,
                   sum(CAST(ddx AS HUGEINT) * ddy) AS sxy,
                   sum(CAST(ddx AS HUGEINT) * ddx) AS sxx
            FROM pr
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               m // 2 AS n_edges,
               CASE WHEN CAST(m AS HUGEINT) * sxx - sx * sx <> 0 THEN
                   CAST(CAST(m AS HUGEINT) * sxy - sx * sx AS DOUBLE)
                   / CAST(CAST(m AS HUGEINT) * sxx - sx * sx
                          AS DOUBLE)
               END AS assortativity
        FROM ag
    """

    # log-odds keywords: +1 prior -> exact integer odds ratios,
    # micro-ln grid, integer delta ranking, z a double tree
    sql["text_log_odds_terms"] = f"""
        WITH toks AS (
            SELECT lang, unnest({_TOKENS}) AS t FROM documents
        ),
        cnt AS (
            SELECT lang, t, CAST(count(*) AS BIGINT) AS y
            FROM toks GROUP BY 1, 2
        ),
        tw AS (SELECT t, CAST(sum(y) AS BIGINT) AS tw
               FROM cnt GROUP BY 1),
        nl AS (SELECT lang, CAST(sum(y) AS BIGINT) AS nl
               FROM cnt GROUP BY 1),
        gl AS (SELECT CAST(sum(y) AS BIGINT) AS n,
                      CAST(count(DISTINCT t) AS BIGINT) AS v
               FROM cnt),
        cand AS (
            SELECT c.lang, c.t, c.y, tw.tw - c.y AS yr,
                   nl.nl AS nl, gl.n - nl.nl AS nr, gl.v AS v
            FROM cnt c
            JOIN tw ON c.t = tw.t
            JOIN nl ON c.lang = nl.lang
            CROSS JOIN gl
            WHERE c.y >= 3
        ),
        scored AS (
            SELECT lang, t AS term, y AS lang_count,
                   yr AS rest_count,
                   CAST(round(ln(CAST(y + 1 AS DOUBLE)
                        / CAST(nl + v - y - 1 AS DOUBLE)) * 1000000)
                        AS BIGINT)
                   - CAST(round(ln(CAST(yr + 1 AS DOUBLE)
                          / CAST(nr + v - yr - 1 AS DOUBLE))
                          * 1000000) AS BIGINT) AS dm,
                   1.0 / CAST(y + 1 AS DOUBLE)
                   + 1.0 / CAST(yr + 1 AS DOUBLE) AS vr
            FROM cand
        ),
        ranked AS (
            SELECT lang, term, lang_count, rest_count, dm, vr,
                   CAST(row_number() OVER (PARTITION BY lang
                        ORDER BY dm DESC, term) AS BIGINT) AS rank
            FROM scored
        )
        SELECT lang, rank, term, lang_count, rest_count,
               CAST(dm AS DOUBLE) / 1000000.0 AS log_odds,
               (CAST(dm AS DOUBLE) / 1000000.0) / sqrt(vr)
                   AS z_score
        FROM ranked WHERE rank <= 10
        ORDER BY lang, rank
    """

    # Simpson diversity: the shared token grammar, exact HUGEINT
    # sum c(c-1), one int-cast double division, no ln
    sql["text_simpson_diversity"] = f"""
        WITH toks AS (
            SELECT lang, unnest({_TOKENS}) AS t FROM documents
        ),
        tc AS (
            SELECT lang, t, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        ),
        per AS (
            SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS vocab_size,
                   sum(CAST(c AS HUGEINT) * (c - 1)) AS s2
            FROM tc GROUP BY 1
        )
        SELECT lang, n_tokens, vocab_size,
               CASE WHEN n_tokens > 1 THEN
                   CAST(s2 AS DOUBLE)
                   / CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1)
                          AS DOUBLE)
               END AS simpson,
               CASE WHEN n_tokens > 1 AND s2 > 0 THEN
                   1.0 / (CAST(s2 AS DOUBLE)
                          / CAST(CAST(n_tokens AS HUGEINT)
                                 * (n_tokens - 1) AS DOUBLE))
               END AS inv_simpson
        FROM per ORDER BY lang
    """

    # Welch t: exact integer (n, S, Q) per arm, then ONE fixed
    # correctly-rounded double tree (only +,-,*,/,sqrt — the
    # cross-engine-safe ops); HUGEINT sums cast to double directly
    # (int->double correctly rounded past 2^53, q_price_index rule)
    sql["stats_welch_ttest"] = """
        WITH src AS (
            SELECT CAST(round(round(o_totalprice, 2) * 100)
                        AS BIGINT) AS c,
                   CASE WHEN o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END AS f
            FROM orders
        ),
        a AS (
            SELECT CAST(sum(f) AS BIGINT) AS n1,
                   CAST(sum(1 - f) AS BIGINT) AS n2,
                   CAST(sum(f * c) AS BIGINT) AS s1,
                   CAST(sum((1 - f) * c) AS BIGINT) AS s2,
                   sum(CAST(f * c AS HUGEINT) * c) AS q1,
                   sum(CAST((1 - f) * c AS HUGEINT) * c) AS q2
            FROM src
        ),
        t AS (
            SELECT n1, n2,
                   CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                   CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                   (CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(n1 AS DOUBLE))
                   / CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       AS se1,
                   (CAST(q2 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                      / CAST(n2 AS DOUBLE))
                   / CAST(n2 - 1 AS DOUBLE) / CAST(n2 AS DOUBLE)
                       AS se2
            FROM a
        )
        SELECT n1, n2,
               CASE WHEN n1 > 0 THEN m1 END AS mean1_cents,
               CASE WHEN n2 > 0 THEN m2 END AS mean2_cents,
               CASE WHEN n1 > 1 AND n2 > 1 AND se1 + se2 > 0 THEN
                   (m1 - m2) / sqrt(se1 + se2) END AS t_stat,
               CASE WHEN n1 > 1 AND n2 > 1 AND se1 + se2 > 0 THEN
                   (se1 + se2) * (se1 + se2)
                   / (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
                      + se2 * se2 / CAST(n2 - 1 AS DOUBLE))
               END AS df_welch
        FROM t
    """

    # Kruskal-Wallis: 2x tied-rank sums exact in HUGEINT from the
    # value-bounded cents curve; k group terms through an ORDERED
    # cum window (anova idiom); tie correction exact-int ratio
    sql["stats_kruskal_wallis"] = """
        WITH src AS (
            SELECT o_orderpriority AS g,
                   CAST(round(round(o_totalprice, 2) * 100)
                        AS BIGINT) AS c
            FROM orders
        ),
        per_gv AS (
            SELECT g, c, CAST(count(*) AS BIGINT) AS n_gv
            FROM src GROUP BY 1, 2
        ),
        per_v AS (
            SELECT c, CAST(sum(n_gv) AS BIGINT) AS t_v
            FROM per_gv GROUP BY 1
        ),
        cum AS (
            SELECT c, t_v,
                   CAST(sum(t_v) OVER (ORDER BY c ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_t
            FROM per_v
        ),
        perg AS (
            SELECT g, CAST(sum(n_gv) AS BIGINT) AS n_g,
                   sum(CAST(n_gv AS HUGEINT)
                       * (2 * (cum_t - t_v) + t_v + 1)) AS r2_g
            FROM per_gv JOIN cum USING (c) GROUP BY 1
        ),
        cg AS (
            SELECT g, n_g, r2_g,
                   sum(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
                       / CAST(n_g AS DOUBLE))
                       OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cum_term
            FROM perg
        ),
        ties AS (
            SELECT sum(CAST(t_v AS HUGEINT) * t_v * t_v - t_v)
                       AS s33
            FROM per_v
        ),
        a AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
                   CAST(sum(n_g) AS BIGINT) AS n_total,
                   max_by(cum_term, g) AS lastc
            FROM cg
        )
        SELECT k_groups, n_total,
               CASE WHEN k_groups > 1 AND n_total > 2 THEN
                   3.0 * lastc / (CAST(n_total AS DOUBLE)
                                  * CAST(n_total + 1 AS DOUBLE))
                   - 3.0 * CAST(n_total + 1 AS DOUBLE)
               END AS h_stat,
               CASE WHEN k_groups > 1 AND n_total > 2
                     AND 1.0 - CAST(s33 AS DOUBLE)
                         / CAST(CAST(n_total AS HUGEINT) * n_total
                                * n_total - n_total AS DOUBLE) > 0
               THEN
                   (3.0 * lastc / (CAST(n_total AS DOUBLE)
                                   * CAST(n_total + 1 AS DOUBLE))
                    - 3.0 * CAST(n_total + 1 AS DOUBLE))
                   / (1.0 - CAST(s33 AS DOUBLE)
                      / CAST(CAST(n_total AS HUGEINT) * n_total
                             * n_total - n_total AS DOUBLE))
               END AS h_tie_corrected,
               k_groups - 1 AS df
        FROM a, ties
    """

    sql["q_abc_pareto"] = """
        WITH pc AS (
            SELECT l_partkey AS part,
                   CAST(round(round(sum(l_extendedprice), 2) * 100)
                        AS BIGINT) AS cents
            FROM lineitem GROUP BY 1
        ),
        c AS (
            SELECT part, cents,
                   CAST(sum(cents) OVER (ORDER BY cents DESC, part
                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS BIGINT) AS cum,
                   CAST(sum(cents) OVER () AS BIGINT) AS total
            FROM pc
        )
        SELECT part, cents AS revenue_cents,
               cum / total AS cum_share,
               CASE WHEN cum / total <= 0.8 THEN 'A'
                    WHEN cum / total <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM c ORDER BY revenue_cents DESC, part
    """

    # dispersion: hourly-count Fano over the full hour spine (zeros
    # included) + second-gap burstiness; every accumulator integer
    # (HUGEINT for the n·Σd² products), mean/var/sqrt compositions
    # are fixed correctly-rounded trees; degenerate spans NULL
    sql["ev_dispersion"] = """
        WITH hc AS (
            SELECT event_type,
                   CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT event_type, min(h) AS h0, max(h) AS h1
            FROM hc GROUP BY 1
        ),
        spine AS (
            SELECT event_type, unnest(generate_series(h0, h1)) AS h
            FROM span
        ),
        fullh AS (
            SELECT s.event_type, coalesce(hc.c, 0) AS c
            FROM spine s LEFT JOIN hc
              ON s.event_type = hc.event_type AND s.h = hc.h
        ),
        fano AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_hours,
                   CAST(sum(c) AS BIGINT) AS sc,
                   sum(CAST(c AS HUGEINT) * c) AS sc2
            FROM fullh GROUP BY 1
        ),
        g AS (
            SELECT event_type,
                   CAST(epoch_us(ts) AS BIGINT) // 1000000
                   - lag(CAST(epoch_us(ts) AS BIGINT) // 1000000)
                     OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS d
            FROM events
        ),
        burst AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(d) AS BIGINT) AS sd,
                   sum(CAST(d AS HUGEINT) * d) AS sd2
            FROM g WHERE d IS NOT NULL GROUP BY 1
        ),
        sig AS (
            SELECT event_type, n_gaps,
                   CASE WHEN n_gaps > 1 THEN
                       sqrt(CAST(n_gaps * sd2 - CAST(sd AS HUGEINT)
                                 * sd AS DOUBLE)
                            / CAST(n_gaps * (n_gaps - 1) AS DOUBLE))
                   END AS sigma,
                   CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu
            FROM burst
        )
        SELECT f.event_type, f.n_hours,
               CASE WHEN f.n_hours > 1 THEN
                   (CAST(f.n_hours * f.sc2 - CAST(f.sc AS HUGEINT)
                         * f.sc AS DOUBLE)
                    / CAST(f.n_hours * (f.n_hours - 1) AS DOUBLE))
                   / (CAST(f.sc AS DOUBLE) / CAST(f.n_hours AS DOUBLE))
               END AS fano_hourly,
               s.n_gaps,
               CASE WHEN s.sigma IS NOT NULL
                      AND s.sigma + s.mu != 0 THEN
                   (s.sigma - s.mu) / (s.sigma + s.mu)
               END AS burstiness
        FROM fano f LEFT JOIN sig s ON f.event_type = s.event_type
        ORDER BY f.event_type
    """

    # Spearman: cents grid → integer doubled average ranks → Pearson
    # form in HUGEINT (Spark DECIMAL(38,0)) → sqrt/divide as the only
    # double ops; zero-variance pairs NULL to match try_divide
    sql["ts_spearman"] = f"""
        WITH long AS ({_LONG}),
        g AS (SELECT date, code, round(value, 2) AS v FROM long),
        j AS (
            SELECT a.code AS code_a, b.code AS code_b,
                   a.v AS va, b.v AS vb
            FROM g a JOIN g b ON a.date = b.date AND a.code < b.code
        ),
        r AS (
            SELECT code_a, code_b,
                   CAST(2 * rank() OVER (PARTITION BY code_a, code_b
                                         ORDER BY va)
                        + count(*) OVER (PARTITION BY code_a, code_b,
                                         va) - 1 AS BIGINT) AS ra,
                   CAST(2 * rank() OVER (PARTITION BY code_a, code_b
                                         ORDER BY vb)
                        + count(*) OVER (PARTITION BY code_a, code_b,
                                         vb) - 1 AS BIGINT) AS rb
            FROM j
        ),
        s AS (
            SELECT code_a, code_b, CAST(count(*) AS BIGINT) AS n_obs,
                   sum(CAST(ra AS HUGEINT)) AS sa,
                   sum(CAST(rb AS HUGEINT)) AS sb,
                   sum(CAST(ra AS HUGEINT) * rb) AS sab,
                   sum(CAST(ra AS HUGEINT) * ra) AS saa,
                   sum(CAST(rb AS HUGEINT) * rb) AS sbb
            FROM r GROUP BY 1, 2
        )
        SELECT code_a, code_b, n_obs,
               CASE WHEN n_obs * saa - sa * sa = 0
                      OR n_obs * sbb - sb * sb = 0 THEN NULL
                    ELSE CAST(n_obs * sab - sa * sb AS DOUBLE)
                         / (sqrt(CAST(n_obs * saa - sa * sa AS DOUBLE))
                            * sqrt(CAST(n_obs * sbb - sb * sb
                                        AS DOUBLE)))
               END AS spearman
        FROM s ORDER BY code_a, code_b
    """

    # Pettitt: integer doubled ranks → ordered cumsum U_t → bigint
    # argmax (|U| desc, date asc); window sum CAST off HUGEINT early
    sql["ts_pettitt"] = f"""
        WITH long AS ({_LONG}),
        g AS (SELECT date, code, round(value, 2) AS v FROM long),
        r AS (
            SELECT code, date,
                   CAST(2 * rank() OVER (PARTITION BY code ORDER BY v)
                        + count(*) OVER (PARTITION BY code, v) - 1
                        AS BIGINT) AS r2
            FROM g
        ),
        c AS (
            SELECT code, date,
                   CAST(sum(r2) OVER (PARTITION BY code ORDER BY date
                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS BIGINT) AS w2,
                   CAST(row_number() OVER (PARTITION BY code
                                           ORDER BY date) AS BIGINT)
                       AS t,
                   CAST(count(*) OVER (PARTITION BY code) AS BIGINT)
                       AS n
            FROM r
        ),
        u AS (
            SELECT code, date, n, w2 - t * (n + 1) AS u
            FROM c WHERE t < n
        ),
        k AS (
            SELECT code, date, n, abs(u) AS au,
                   row_number() OVER (PARTITION BY code
                                      ORDER BY abs(u) DESC, date)
                       AS rk
            FROM u
        )
        SELECT code, n AS n_obs, date AS change_date,
               au AS k_stat,
               au / CAST(n * (n + 1) AS BIGINT) AS k_norm
        FROM k WHERE rk = 1 ORDER BY code
    """

    # exact-integer TF-IDF cosine: idf in micro-units (ln 1e-6 grid),
    # dot/norms as HUGEINT (Spark DECIMAL(38,0)), sqrt/divide as the
    # only double ops (correctly rounded → identical bits, safe τ cut)
    sql["dedup_tfidf_cosine"] = """
        WITH toks AS (
            SELECT doc_id, unnest({tok}) AS token FROM documents
        ),
        tf AS (
            SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, token
        ),
        dfc AS (
            SELECT token, CAST(count(*) AS BIGINT) AS dfreq
            FROM tf GROUP BY token
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        w AS (
            SELECT t.doc_id, t.token, d.dfreq,
                   t.tf * CAST(round(
                       ln(CAST(nd.nd AS DOUBLE) / d.dfreq) * 1000000,
                       0) AS BIGINT) AS w
            FROM tf t JOIN dfc d USING (token), nd
            WHERE d.dfreq <= nd.nd * 0.2
        ),
        norms AS (
            SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2
            FROM w GROUP BY doc_id
        ),
        dot AS (
            SELECT w1.doc_id AS a, w2.doc_id AS b,
                   sum(CAST(w1.w AS HUGEINT) * w2.w) AS d,
                   CAST(count(*) AS BIGINT) AS n_shared_terms
            FROM w w1 JOIN w w2
              ON w1.token = w2.token AND w1.doc_id < w2.doc_id
            WHERE w1.dfreq <= 256 AND w2.dfreq <= 256
            GROUP BY 1, 2
        )
        SELECT d.a AS doc_id_a, d.b AS doc_id_b, d.n_shared_terms,
               CAST(d.d AS DOUBLE)
                   / (sqrt(CAST(na.n2 AS DOUBLE))
                      * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        FROM dot d
        JOIN norms na ON d.a = na.doc_id
        JOIN norms nb ON d.b = nb.doc_id
        WHERE CAST(d.d AS DOUBLE)
                  / (sqrt(CAST(na.n2 AS DOUBLE))
                     * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.5
        ORDER BY doc_id_a, doc_id_b
    """.format(tok=_TOKENS)

    sql["dedup_cdc_chunks"] = f"""
        WITH {_CDC_CHUNKS},
        card AS (
            SELECT c.doc_id,
                   CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN k.nd >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_chunks,
                   CAST(sum(CASE WHEN k.nd >= 2 THEN c.clen ELSE 0 END)
                        AS BIGINT)
                       / CAST(sum(c.clen) AS BIGINT) AS dup_char_share
            FROM chunks c JOIN keys k USING (ck)
            GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_chunks, 0) AS n_chunks,
               coalesce(a.n_dup_chunks, 0) AS n_dup_chunks,
               a.dup_char_share
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN card a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id
    """

    # chunking is row-local, so chunk-all-then-split-by-parity equals
    # the operator's split-then-chunk; unused `keys` CTE is never run
    sql["dedup_cdc_incremental"] = f"""
        WITH {_CDC_CHUNKS},
        ckk AS (SELECT DISTINCT ck FROM chunks WHERE doc_id % 2 = 0),
        b AS (SELECT * FROM chunks WHERE doc_id % 2 = 1),
        card AS (
            SELECT b.doc_id,
                   CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN k.ck IS NOT NULL THEN 1 ELSE 0
                            END) AS BIGINT) AS n_known_chunks,
                   CAST(sum(CASE WHEN k.ck IS NULL THEN b.clen ELSE 0
                            END) AS BIGINT)
                       / CAST(sum(b.clen) AS BIGINT)
                       AS novel_char_share
            FROM b LEFT JOIN ckk k ON b.ck = k.ck
            GROUP BY b.doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_chunks, 0) AS n_chunks,
               coalesce(a.n_known_chunks, 0) AS n_known_chunks,
               a.novel_char_share
        FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        LEFT JOIN card a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id
    """

    sql["dedup_cdc_profile"] = f"""
        WITH {_CDC_CHUNKS}
        SELECT c.source,
               CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN k.nd >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_chunks,
               CAST(sum(CASE WHEN k.nd >= 2 THEN c.clen ELSE 0 END)
                    AS BIGINT)
                   / CAST(sum(c.clen) AS BIGINT) AS dup_char_share,
               CAST(sum(c.clen) AS BIGINT)
                   / CAST(count(*) AS BIGINT) AS avg_chunk_len
        FROM chunks c JOIN keys k USING (ck)
        GROUP BY c.source ORDER BY c.source
    """

    sql["dedup_substring_profile"] = """
        WITH fp AS (
            SELECT doc_id, wh FROM (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(0, len(g) - 5 + 1),
                           j -> list_aggregate(
                                    list_slice(g, j + 1, j + 5),
                                    'min')))) AS wh
                FROM (
                    SELECT doc_id,
                           list_transform(range(0, len(t) - 20 + 1),
                               i -> md5(array_to_string(
                                        list_slice(t, i + 1, i + 20),
                                        ' '))) AS g
                    FROM (SELECT doc_id, {tok} AS t FROM documents)
                    WHERE len(t) >= 20
                ) WHERE len(g) >= 5
            )
        ),
        mult AS (SELECT wh, count(*) AS m FROM fp GROUP BY wh),
        per_doc AS (
            SELECT f.doc_id,
                   CAST(count(*) AS BIGINT) AS n_fingerprints,
                   CAST(sum(CASE WHEN mult.m >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_shared
            FROM fp f JOIN mult USING (wh)
            GROUP BY 1
        )
        SELECT d.doc_id,
               coalesce(p.n_fingerprints, 0) AS n_fingerprints,
               coalesce(p.n_shared, 0) AS n_shared,
               CAST(p.n_shared AS DOUBLE) / p.n_fingerprints
                   AS shared_frac
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        ORDER BY d.doc_id
    """.format(tok=_TOKENS)

    sql["dedup_ngram_jaccard"] = """
        WITH norm AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
            FROM documents
        ),
        sh AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(length(s) - 2, 1) + 1),
                       i -> substr(s, CAST(i AS INT), 3)))) AS sh
            FROM norm
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        df_ok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 200),
        shf AS (SELECT sh.* FROM sh JOIN df_ok USING (sh)),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.15
        ORDER BY id_a, id_b
    """

    # same rarest-first prefix pipeline as the Spark side; prefix
    # length and both threshold tests in pure integer arithmetic
    sql["dedup_jaccard_prefix"] = """
        WITH norm AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
            FROM documents
        ),
        sh AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(length(s) - 2, 1) + 1),
                       i -> substr(s, CAST(i AS INT), 3)))) AS sh
            FROM norm
        ),
        dfc AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY sh),
        per_doc AS (
            SELECT s.doc_id,
                   list_transform(list_sort(list({'df': d.df, 'sh': s.sh})),
                                  r -> r.sh) AS grams,
                   CAST(count(*) AS BIGINT) AS sz
            FROM sh s JOIN dfc d USING (sh)
            GROUP BY s.doc_id
        ),
        pre AS (
            SELECT doc_id, sz,
                   unnest(grams[1 : CAST(sz - ((9 * sz + 9) // 10) + 1 AS INT)]) AS sh
            FROM per_doc
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM pre a JOIN pre b ON a.sh = b.sh AND a.doc_id < b.doc_id
            WHERE 10 * least(a.sz, b.sz) >= 9 * greatest(a.sz, b.sz)
        ),
        ver AS (
            SELECT id_a, id_b,
                   CAST(len(list_intersect(pa.grams, pb.grams)) AS BIGINT)
                       AS inter,
                   pa.sz AS sa, pb.sz AS sb
            FROM cand
            JOIN per_doc pa ON pa.doc_id = id_a
            JOIN per_doc pb ON pb.doc_id = id_b
        )
        SELECT id_a, id_b, inter,
               (sa + sb - inter) AS union_sz,
               inter / (sa + sb - inter) AS jaccard
        FROM ver
        WHERE 10 * inter >= 9 * (sa + sb - inter)
        ORDER BY id_a, id_b
    """

    sql["dedup_ngram_containment"] = """
        WITH norm AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
            FROM documents
        ),
        sh AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(length(s) - 2, 1) + 1),
                       i -> substr(s, CAST(i AS INT), 3)))) AS sh
            FROM norm
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        df_ok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 200),
        shf AS (SELECT sh.* FROM sh JOIN df_ok USING (sh)),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        -- raw int/int fractions: bit-identical IEEE division cross-engine
        SELECT id_a, id_b,
               CAST(inter AS DOUBLE) / sa.sz AS cont_a,
               CAST(inter AS DOUBLE) / sb.sz AS cont_b
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / sa.sz >= 0.25
           OR CAST(inter AS DOUBLE) / sb.sz >= 0.25
        ORDER BY id_a, id_b
    """

    # connected components as a recursive CTE: (node,label) state space
    # is bounded by nodes × labels, min(label) per node = cluster id;
    # the CTE chain is shared with dedup_filter_apply
    _cc_ctes = """norm AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
            FROM documents
        ),
        sh AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(length(s) - 2, 1) + 1),
                       i -> substr(s, CAST(i AS INT), 3)))) AS sh
            FROM norm
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        df_ok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 200),
        shf AS (SELECT sh.* FROM sh JOIN df_ok USING (sh)),
        prs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        edges0 AS (
            SELECT id_a, id_b FROM prs
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.15
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM edges0
            UNION SELECT id_b, id_a FROM edges0
        ),
        cc(node, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
        )"""

    sql["dedup_clusters"] = f"""
        WITH RECURSIVE {_cc_ctes}
        SELECT node AS doc_id, min(label) AS cluster_id,
               node = min(label) AS is_canonical
        FROM cc GROUP BY node ORDER BY doc_id
    """

    sql["dedup_cluster_sizes"] = f"""
        WITH RECURSIVE {_cc_ctes},
        labels AS (
            SELECT node, min(label) AS cluster_id FROM cc GROUP BY node
        ),
        csizes AS (
            SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
            FROM labels GROUP BY cluster_id
        )
        SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        FROM csizes GROUP BY cluster_size ORDER BY cluster_size
    """

    sql["dedup_filter_apply"] = f"""
        WITH RECURSIVE {_cc_ctes},
        losers AS (
            SELECT node AS doc_id FROM cc
            GROUP BY node HAVING node != min(label)
        )
        SELECT d.* FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
        ORDER BY d.doc_id
    """

    sql["dedup_embedding_cosine"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_sum(list_transform(range(1, len(a.v) + 1),
                         i -> a.v[i] * b.v[i]))
                     / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
              / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                 * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.2
        ORDER BY id_a, id_b
    """

    qids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    sql["emb_radius_search"] = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({qids}))
        SELECT q.query_id, e.vec_id,
               round(list_sum(list_transform(range(1, len(e.v) + 1),
                         i -> e.v[i] * q.qv[i]))
                     / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6)
                   AS cos
        FROM e CROSS JOIN q
        WHERE e.vec_id != q.query_id
          AND list_sum(list_transform(range(1, len(e.v) + 1),
                  i -> e.v[i] * q.qv[i]))
              / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                 * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) >= 0.2
        ORDER BY q.query_id, e.vec_id
    """

    # Two-NN intrinsic dimension: same DOUBLE[] fold as the cosine
    # family, md5 anchor sample, ln ratio on the 1e-6 integer grid
    sql["emb_two_nn_id"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              -- depth-adaptive anchor slice (two_nn_anchor_threshold):
              -- 12.5% ('2') up to 16384 corpus rows, then a 4-hex
              -- prefix pinning ~2048 anchors — same integer formula
              -- as the Spark side, bit-identical threshold string
              WHERE md5('twonn:' || CAST(vec_id AS VARCHAR)) <
                    (SELECT CASE WHEN count(*) <= 16384 THEN '2'
                            ELSE printf('%04x', greatest(1,
                                 (2048 * 65536) // count(*)))
                            END FROM e)),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_sum(list_transform(range(1, len(e.v) + 1),
                       i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i])))
                       AS dsq
            FROM e CROSS JOIN q
            WHERE e.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, dsq,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dsq, vec_id) AS rn
            FROM scored
        ),
        per AS (
            SELECT query_id,
                   min(CASE WHEN rn = 1 THEN dsq END) AS d1,
                   min(CASE WHEN rn = 2 THEN dsq END) AS d2
            FROM ranked WHERE rn <= 2 GROUP BY 1
        ),
        v AS (
            SELECT CAST(round(ln(d2 / d1) * 1000000) AS BIGINT)
                       AS lnr
            FROM per WHERE d1 > 0 AND d2 IS NOT NULL
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM per)
                   AS n_queries,
               CAST(count(*) AS BIGINT) AS n_valid,
               CAST(sum(lnr) AS BIGINT) AS sum_ln_ratio_micro,
               CASE WHEN sum(lnr) > 0 THEN
                   CAST(count(*) * 2000000 AS DOUBLE)
                   / CAST(sum(lnr) AS DOUBLE)
               END AS id_mle
        FROM v
    """

    sql["knn_bruteforce_cosine"] = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({qids})),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_sum(list_transform(range(1, len(e.v) + 1),
                       i -> e.v[i] * q.qv[i]))
                   / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
        )
        SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
            -- mirror the Spark-side finite-score bound (similarity.py):
            -- a degenerate vector's NULL/NaN/Inf cosine must rank in
            -- NEITHER engine (DuckDB sorts NaN largest, like Spark)
            FROM scored WHERE cos BETWEEN -1.0001 AND 1.0001
        ) WHERE rank <= 5
        ORDER BY query_id, rank
    """

    sql["ann_mips_dot"] = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({qids})),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_sum(list_transform(range(1, len(e.v) + 1),
                       i -> e.v[i] * q.qv[i])) AS ip
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
        )
        SELECT query_id, vec_id, round(ip, 6) AS ip, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY ip DESC, vec_id) AS rank
            -- mirror the Spark-side finiteness predicate: an unnormalized
            -- score has no [-1,1] band, so NaN/Inf are dropped explicitly
            FROM scored WHERE isfinite(ip)
        ) WHERE rank <= 5
        ORDER BY query_id, rank
    """

    sql["knn_label_vote"] = f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({qids})),
        scored AS (
            SELECT q.query_id, e.vec_id, e.label,
                   list_sum(list_transform(range(1, len(e.v) + 1),
                       i -> e.v[i] * q.qv[i]))
                   / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
        ),
        topk AS (
            SELECT query_id, vec_id, label FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
                -- same finite-score bound as the Spark side (similarity.py)
                FROM scored WHERE cos BETWEEN -1.0001 AND 1.0001
            ) WHERE rank <= 5
        ),
        votes AS (
            SELECT query_id, label, count(*) AS votes
            FROM topk GROUP BY query_id, label
        )
        SELECT query_id, label AS pred_label, votes FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY votes DESC, label) AS rk
            FROM votes
        ) WHERE rk = 1
        ORDER BY query_id
    """

    sql["ev_json_props_stats"] = """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               min(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
               max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """

    sql["catalog_series_summary"] = f"""
        SELECT code,
               CAST(min(date) AS TIMESTAMP) AS first_date,
               CAST(max(date) AS TIMESTAMP) AS last_update,
               count(*) AS n_obs,
               round(arg_max(value, date), 4) AS latest_value
        FROM ({_LONG}) GROUP BY code ORDER BY code
    """

    sql["embedding_separation"] = """
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        flat AS (
            SELECT label, unnest(list_transform(range(1, len(v) + 1),
                i -> {'dim': i - 1, 'x': v[i]})) AS u
            FROM e
        ),
        cent AS (
            SELECT label, u.dim AS dim, round(avg(u.x), 6) AS c
            FROM flat GROUP BY 1, 2
        ),
        cvec AS (
            SELECT label, list_transform(list_sort(
                       list({'dim': dim, 'c': c})), r -> r.c) AS carr
            FROM cent GROUP BY label
        ),
        nmem AS (SELECT label, CAST(count(*) AS BIGINT) AS n_members
                 FROM e GROUP BY label),
        own AS (
            SELECT e.label,
                   sqrt(list_sum(list_transform(range(1, len(e.v) + 1),
                       i -> (e.v[i] - cv.carr[i])
                            * (e.v[i] - cv.carr[i])))) AS d
            FROM e JOIN cvec cv ON e.label = cv.label
        ),
        intra AS (SELECT label, avg(d) AS mean_intra
                  FROM own GROUP BY label),
        pd AS (
            SELECT a.label AS label, b.label AS other,
                   sqrt(list_sum(list_transform(
                       range(1, len(a.carr) + 1),
                       i -> (a.carr[i] - b.carr[i])
                            * (a.carr[i] - b.carr[i])))) AS cd
            FROM cvec a JOIN cvec b ON a.label <> b.label
        ),
        near AS (
            SELECT label, other AS nearest_label, cd AS nearest_dist,
                   row_number() OVER (
                       PARTITION BY label ORDER BY cd, other) AS rk
            FROM pd
        )
        SELECT n.label, n.n_members, i.mean_intra,
               r.nearest_label, r.nearest_dist,
               r.nearest_dist / NULLIF(i.mean_intra, 0)
                   AS separation
        FROM nmem n
        JOIN intra i ON n.label = i.label
        JOIN near r ON n.label = r.label AND r.rk = 1
        ORDER BY n.label
    """

    sql["embedding_centroids"] = """
        WITH flat AS (
            SELECT label, unnest(list_transform(range(1, len(embedding) + 1),
                i -> {'dim': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS u
            FROM embeddings
        )
        SELECT label, CAST(u.dim AS INT) AS dim,
               round(avg(u.v), 6) AS mean_v,
               CAST(count(*) AS BIGINT) AS n_members
        FROM flat GROUP BY label, u.dim ORDER BY label, dim
    """

    sql["text_lang_confusion"] = f"""
        WITH h AS (
            SELECT doc_id, lang, text, {hits_cols},
                   length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk
            FROM documents
        ),
        pred AS (
            SELECT doc_id, lang,
                   CASE
                       WHEN CAST(cjk AS DOUBLE) / greatest(length(text), 1) > 0.2 THEN 'zh'
                       WHEN greatest(hits_en, hits_es, hits_de, hits_fr) > 0
                            AND hits_en = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'en'
                       WHEN greatest(hits_en, hits_es, hits_de, hits_fr) > 0
                            AND hits_es = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'es'
                       WHEN greatest(hits_en, hits_es, hits_de, hits_fr) > 0
                            AND hits_de = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'de'
                       WHEN greatest(hits_en, hits_es, hits_de, hits_fr) > 0
                            AND hits_fr = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'fr'
                       ELSE 'und'
                   END AS lang_pred
            FROM h
        )
        SELECT lang, lang_pred, count(*) AS n
        FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """

    accent_vals = _values_sql(ACCENT_ROWS, "id, location_id, raw")
    _CLEAN_ES = ("trim(regexp_replace(regexp_replace(upper(strip_accents({c})), "
                 "'[^A-Z0-9]+', ' ', 'g'), ' +', ' ', 'g'))")
    sql["text_clean_accents"] = f"""
        SELECT id, location_id, raw,
               strip_accents(raw) AS no_accents,
               {_CLEAN_ES.format(c='raw')} AS cleaned
        FROM {accent_vals}
        ORDER BY id
    """

    sql["infogob_location_canonical"] = f"""
        WITH cleaned AS (
            SELECT location_id, {_CLEAN_ES.format(c='raw')} AS name
            FROM {accent_vals}
        ),
        counts AS (
            SELECT location_id, name, count(*) AS n
            FROM cleaned GROUP BY location_id, name
        )
        SELECT location_id, name AS canonical_name FROM (
            SELECT *, row_number() OVER (
                PARTITION BY location_id ORDER BY n DESC, name) AS rk
            FROM counts
        ) WHERE rk = 1
        ORDER BY location_id NULLS LAST
    """

    sql["mode_status_by_customer"] = """
        WITH counts AS (
            SELECT o_custkey, o_orderstatus, count(*) AS n
            FROM orders GROUP BY o_custkey, o_orderstatus
        )
        SELECT o_custkey, o_orderstatus AS mode_status FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY n DESC, o_orderstatus) AS rk
            FROM counts
        ) WHERE rk = 1
        ORDER BY o_custkey
    """

    sql["ts_format_period"] = f"""
        WITH t AS (
            SELECT id, d, freq, CAST(d AS TIMESTAMP) AS ts
            FROM {_values_sql(FORMAT_ROWS, "id, d, freq")}
        )
        SELECT id, d, freq,
               CASE freq
                   WHEN 'D' THEN strftime(ts, '%Y-%m-%d')
                   WHEN 'M' THEN strftime(ts, '%Y-%m')
                   WHEN 'Q' THEN CAST(year(ts) AS VARCHAR) || '-' ||
                                 CAST(quarter(ts) AS VARCHAR)
                   ELSE strftime(ts, '%Y')
               END AS period
        FROM t ORDER BY id
    """

    payload_vals = _values_sql(JSON_PAYLOADS, "rid, payload")
    sql["json_api_observations"] = f"""
        WITH typed AS (
            SELECT rid, json_transform(payload,
                '{{"config": {{"series": [{{"name": "VARCHAR"}}]}},
                  "periods": [{{"name": "VARCHAR", "values": ["VARCHAR"]}}]}}') AS j
            FROM {payload_vals}
        ),
        per AS (
            SELECT rid, list_transform(j.config.series, s -> s.name) AS names,
                   unnest(j.periods) AS p
            FROM typed
        ),
        obs AS (
            SELECT rid, p.name AS period,
                   unnest(list_transform(range(1, len(names) + 1),
                       i -> {{'code': names[i], 'raw': p."values"[i]}})) AS z
            FROM per
        )
        SELECT rid, period,
               strptime(replace(replace(replace(replace(replace(period,
                   'Ene','Jan'),'Abr','Apr'),'Ago','Aug'),'Set','Sep'),
                   'Dic','Dec'), '%b.%Y') AS date,
               z.code AS code, TRY_CAST(z.raw AS DOUBLE) AS value
        FROM obs
        ORDER BY rid, date, code
    """

    # --- electoral multi-table normalization (procesar_respuesta) ---
    # DuckDB reproduces the split with json_transform over the same
    # typed shape; json_valid() mirrors from_json's NULL-on-malformed.
    electoral_vals = _values_sql(
        ELECTORAL_PAYLOADS,
        "id_eleccion, id_group_eleccion, id_location_req, payload")
    _ej_schema = (
        '{"Estado": "VARCHAR", "Data": {'
        '"DatosGenerales": {"NuVotosEmi": "VARCHAR", '
        '"NuElectores": "VARCHAR", "NuPorcPart": "VARCHAR", '
        '"NuPorcAusen": "VARCHAR", "TxPregunta": "VARCHAR"}, '
        '"Resultados": [{"IdExpediente": "VARCHAR", '
        '"IdLocalidad": "VARCHAR", "IdOrgPol": "VARCHAR", '
        '"TxOrgPol": "VARCHAR", "TxRutaOrgPol": "VARCHAR", '
        '"TxRutaPlanGob": "VARCHAR", "TxRutaSimbolo": "VARCHAR", '
        '"NuOrgVotos": "VARCHAR", "NuOrgPorc": "VARCHAR", '
        '"TxArchivoPlanGob": "VARCHAR", "TxMetodoHttp": "VARCHAR", '
        '"TxTipoLink": "VARCHAR"}]}}'
    )
    _electoral_ok = f"""
        SELECT id_eleccion, id_group_eleccion, id_location_req,
               json_transform(payload, '{_ej_schema}') AS j
        FROM {electoral_vals}
        WHERE json_valid(payload)
          AND json_extract_string(payload, '$.Estado') = 'success'
    """

    sql["infogob_normalize_header"] = f"""
        WITH ok AS ({_electoral_ok})
        SELECT id_eleccion, id_group_eleccion, id_location_req,
               TRY_CAST(trim(replace(j.Data.DatosGenerales.NuVotosEmi,
                   ',', '')) AS BIGINT) AS num_votos_emitidos,
               TRY_CAST(trim(replace(j.Data.DatosGenerales.NuElectores,
                   ',', '')) AS BIGINT) AS num_electores,
               TRY_CAST(trim(replace(j.Data.DatosGenerales.NuPorcPart,
                   '%', '')) AS DOUBLE) AS num_percent_part,
               TRY_CAST(trim(replace(j.Data.DatosGenerales.NuPorcAusen,
                   '%', '')) AS DOUBLE) AS num_percent_ausen,
               j.Data.DatosGenerales.TxPregunta AS txt_pregunta
        FROM ok
        ORDER BY id_eleccion, id_group_eleccion, id_location_req
    """

    sql["infogob_normalize_detail"] = f"""
        WITH ok AS ({_electoral_ok}),
        ex AS (
            SELECT id_eleccion, id_group_eleccion, id_location_req,
                   unnest(j.Data.Resultados) AS r
            FROM ok
        )
        SELECT id_eleccion, id_group_eleccion, id_location_req,
               r.IdExpediente AS id_expediente,
               r.IdLocalidad AS id_localidad,
               r.IdOrgPol AS id_org_politica,
               r.TxOrgPol AS name_org_politica,
               r.TxRutaOrgPol AS url_org_politica,
               r.TxRutaPlanGob AS url_ruta_plan_gobierno,
               r.TxRutaSimbolo AS url_symbol,
               TRY_CAST(trim(replace(r.NuOrgVotos, ',', ''))
                   AS BIGINT) AS num_votos,
               TRY_CAST(trim(replace(r.NuOrgPorc, '%', ''))
                   AS DOUBLE) AS num_porc,
               r.TxArchivoPlanGob AS url_archivo_plan_gob,
               r.TxMetodoHttp AS method_http,
               r.TxTipoLink AS tipo_link_plan
        FROM ex
        ORDER BY id_eleccion, id_group_eleccion, id_location_req,
                 id_org_politica
    """

    req_vals = _values_sql(
        ELECTORAL_REQUESTS,
        "id_eleccion, id_group_eleccion, id_location_req")
    sql["infogob_pending_requests"] = f"""
        WITH ok AS ({_electoral_ok})
        SELECT t.id_eleccion, t.id_group_eleccion, t.id_location_req
        FROM {req_vals}
        WHERE NOT EXISTS (
            SELECT 1 FROM ok
            WHERE ok.id_eleccion = t.id_eleccion
              AND ok.id_group_eleccion = t.id_group_eleccion
              AND ok.id_location_req = t.id_location_req)
        ORDER BY t.id_eleccion, t.id_group_eleccion, t.id_location_req
    """

    # --- candidates-by-election (post_result + rename_map) ---
    cand_vals = _values_sql(
        CANDIDATE_PAYLOADS,
        "id_eleccion, id_location_req, id_group_eleccion, id_expediente, "
        "payload")
    _cj_schema = (
        '{"Data": [{"TxOrgPol": "VARCHAR", "TxCandidato": "VARCHAR", '
        '"TxRutaPolitico": "VARCHAR", "TxRutaFoto": "VARCHAR", '
        '"TxEstadoCand": "VARCHAR", "TxCargo": "VARCHAR", '
        '"TxCargoElecto": "VARCHAR", "TxRutaSimbolo": "VARCHAR", '
        '"TxRutaOrgPol": "VARCHAR", "NuVotosCand": "VARCHAR"}]}'
    )
    _cand_ex = f"""
        SELECT id_eleccion, id_location_req, id_group_eleccion,
               id_expediente,
               unnest(json_transform(payload, '{_cj_schema}').Data) AS c
        FROM {cand_vals}
        WHERE json_valid(payload)
    """
    sql["infogob_candidates_by_election"] = f"""
        WITH ex AS ({_cand_ex})
        SELECT id_eleccion, id_location_req, id_group_eleccion,
               id_expediente,
               c.TxOrgPol AS name_org_politica,
               c.TxCandidato AS name_candidato,
               c.TxRutaPolitico AS url_politico,
               c.TxRutaFoto AS url_foto_candidato,
               c.TxEstadoCand AS estado_candidatura,
               c.TxCargo AS cargo_postula,
               c.TxCargoElecto AS cargo_electo,
               c.TxRutaSimbolo AS url_simbolo_org_politica,
               c.TxRutaOrgPol AS url_org_politica,
               TRY_CAST(trim(replace(c.NuVotosCand, ',', ''))
                   AS BIGINT) AS num_votos_candidato
        FROM ex
        ORDER BY id_eleccion, id_location_req, id_group_eleccion,
                 id_expediente, name_candidato
    """

    sql["infogob_candidates_pending"] = f"""
        WITH ok AS ({_electoral_ok}),
        req AS (
            SELECT DISTINCT id_eleccion, id_location_req,
                   id_group_eleccion, r.IdExpediente AS id_expediente
            FROM (SELECT id_eleccion, id_group_eleccion, id_location_req,
                         unnest(j.Data.Resultados) AS r
                  FROM ok)
        ),
        proc AS (
            SELECT DISTINCT id_eleccion, id_location_req,
                   id_group_eleccion, id_expediente
            FROM ({_cand_ex})
        )
        SELECT req.id_eleccion, req.id_location_req,
               req.id_group_eleccion, req.id_expediente
        FROM req
        WHERE NOT EXISTS (
            SELECT 1 FROM proc
            WHERE proc.id_eleccion = req.id_eleccion
              AND proc.id_location_req = req.id_location_req
              AND proc.id_group_eleccion = req.id_group_eleccion
              AND proc.id_expediente = req.id_expediente)
        ORDER BY id_eleccion, id_location_req, id_group_eleccion,
                 id_expediente
    """

    org_done_vals = _values_sql([(u,) for u in ORG_DONE], "url")
    sql["infogob_org_pending"] = f"""
        WITH ok AS ({_electoral_ok}),
        req AS (
            SELECT DISTINCT r.TxRutaOrgPol AS url_org_politica
            FROM (SELECT unnest(j.Data.Resultados) AS r FROM ok)
            WHERE r.TxRutaOrgPol IS NOT NULL
        )
        SELECT url_org_politica FROM req
        WHERE NOT EXISTS (
            SELECT 1 FROM {org_done_vals}
            WHERE t.url = req.url_org_politica)
        ORDER BY url_org_politica
    """

    detail_page_vals = _values_sql(
        CANDIDATE_DETAIL_PAYLOADS, "url_politico, payload")
    _cd_schema = (
        '{"hojas_vida": [{"href": "VARCHAR", "name_file": "VARCHAR"}], '
        '"planes_gobierno": [{"href": "VARCHAR", "nombre": "VARCHAR"}]}'
    )
    sql["infogob_candidate_detail_counts"] = f"""
        WITH typed AS (
            SELECT url_politico,
                   json_transform(CASE WHEN json_valid(payload)
                                       THEN payload ELSE NULL END,
                                  '{_cd_schema}') AS j
            FROM {detail_page_vals}
        )
        SELECT url_politico,
               CAST(coalesce(len(j.hojas_vida), 0) AS BIGINT)
                   AS num_hojas_vida,
               CAST(coalesce(len(j.planes_gobierno), 0) AS BIGINT)
                   AS num_planes_gobierno
        FROM typed
        ORDER BY url_politico
    """

    sql["infogob_participation"] = """
        WITH voters AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
        ),
        base AS (
            SELECT n.n_name,
                   CASE WHEN v.o_custkey IS NOT NULL THEN 1 ELSE 0 END
                       AS emitted,
                   1 AS electors
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            LEFT JOIN voters v ON c.c_custkey = v.o_custkey
        )
        SELECT n_name,
               CAST(sum(emitted) AS BIGINT) AS num_votos_emitidos,
               CAST(sum(electors) AS BIGINT) AS num_electores,
               100.0 * CAST(sum(emitted) AS BIGINT)
                   / NULLIF(CAST(sum(electors) AS BIGINT), 0)
                   AS num_percent_part,
               100.0 - 100.0 * CAST(sum(emitted) AS BIGINT)
                   / NULLIF(CAST(sum(electors) AS BIGINT), 0)
                   AS num_percent_ausen
        FROM base GROUP BY n_name ORDER BY n_name
    """

    sql["text_repetition_metrics"] = f"""
        WITH base AS (
            SELECT doc_id, {_TOKENS} AS toks FROM documents
        ),
        g AS (
            SELECT doc_id, toks,
                   CASE WHEN len(toks) >= 2 THEN list_transform(
                            range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1])
                        ELSE [] END AS grams
            FROM base
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               1.0 - CAST(len(list_distinct(toks)) AS BIGINT)
                   / NULLIF(CAST(len(toks) AS BIGINT), 0) AS dup_token_frac,
               CAST(list_max(list_transform(list_distinct(toks),
                        d -> len(list_filter(toks, t -> t = d)))) AS BIGINT)
                   / NULLIF(CAST(len(toks) AS BIGINT), 0) AS top_token_frac,
               1.0 - CAST(len(list_distinct(grams)) AS BIGINT)
                   / NULLIF(CAST(len(grams) AS BIGINT), 0) AS dup_2gram_frac
        FROM g ORDER BY doc_id
    """

    loc_flat = f"""
        SELECT reg.id_region, reg.region, prov.id_provincia, prov.provincia,
               dist.id_distrito, dist.distrito
        FROM (SELECT * FROM {_values_sql(LOC_DISTRICTS,
              "id_distrito, distrito, id_provincia")}) AS dist
        JOIN (SELECT * FROM {_values_sql(LOC_PROVINCES,
              "id_provincia, provincia, id_region")}) AS prov USING (id_provincia)
        JOIN (SELECT * FROM {_values_sql(LOC_REGIONS,
              "id_region, region")}) AS reg USING (id_region)
    """
    sql["infogob_location_hierarchy"] = (
        loc_flat + " ORDER BY id_distrito")

    sql["infogob_results_by_region"] = f"""
        WITH flat AS ({loc_flat}),
        res AS (SELECT * FROM {_values_sql(LOC_RESULTS,
                "id_distrito, id_org_politica, num_votos")})
        SELECT flat.id_region, flat.region,
               CAST(sum(res.num_votos) AS BIGINT) AS total_votos,
               count(*) AS n_rows
        FROM res JOIN flat USING (id_distrito)
        GROUP BY flat.id_region, flat.region
        ORDER BY flat.id_region
    """

    mod_vals = _values_sql(INEI_MODULES, "survey, year, module_code")
    ev_vals = _values_sql(INEI_STAGE_EVENTS,
                          "survey, year, module_code, stage, done")
    # round-trip oracle: the expected records stated DIRECTLY from
    # nation — the Spark side must recover exactly these through the
    # synthesized-HTML parse (a parser bug anywhere breaks parity)
    sql["inei_module_listing"] = """
        SELECT CAST(n_nationkey AS VARCHAR) AS number,
               CASE WHEN n_nationkey % 5 = 0 THEN NULL
                    ELSE CAST(n_nationkey + 2000 AS BIGINT) END
                   AS year_ref,
               'Anual' AS period_ref,
               'ENAHO' AS survey_code,
               n_name AS survey_name,
               CAST(n_nationkey + 100 AS BIGINT) AS module_code,
               'Modulo ' || n_name AS module_name,
               CASE WHEN n_nationkey % 3 <> 0
                    THEN '/doc/' || CAST(n_nationkey AS VARCHAR) END
                   AS info_sheet,
               CASE WHEN n_nationkey % 2 = 0
                    THEN '/files/' || CAST(n_nationkey AS VARCHAR)
                         || '.sav' END AS spss,
               CASE WHEN n_nationkey % 4 = 1
                    THEN '/files/STATA/' || CAST(n_nationkey AS VARCHAR)
                         || '.dta' END AS stata,
               '/files/CSV/' || CAST(n_nationkey AS VARCHAR) || '.csv'
                   AS csv,
               CAST(NULL AS VARCHAR) AS dbf
        FROM nation ORDER BY number
    """

    sql["inei_stage_plan"] = f"""
        WITH st AS (
            SELECT survey, year, module_code,
                   max(CASE WHEN stage = 'downloaded' THEN done END)
                       AS downloaded,
                   max(CASE WHEN stage = 'unzipped' THEN done END)
                       AS unzipped,
                   max(CASE WHEN stage = 'organized' THEN done END)
                       AS organized
            FROM {ev_vals} GROUP BY 1, 2, 3
        )
        SELECT t.survey, t.year, t.module_code,
               CAST(COALESCE(st.downloaded, 0) AS INT) AS downloaded,
               CAST(COALESCE(st.unzipped, 0) AS INT) AS unzipped,
               CAST(COALESCE(st.organized, 0) AS INT) AS organized,
               CASE WHEN COALESCE(st.downloaded, 0) = 0 THEN 'download'
                    WHEN COALESCE(st.unzipped, 0) = 0 THEN 'extract'
                    WHEN COALESCE(st.organized, 0) = 0 THEN 'organize'
                    ELSE 'done' END AS next_stage
        FROM {mod_vals}
        LEFT JOIN st ON st.survey = t.survey AND st.year = t.year
                    AND st.module_code = t.module_code
        ORDER BY t.survey, t.year, t.module_code
    """

    sql["skew_salted_join"] = """
        SELECT o.o_orderstatus, count(*) AS n,
               round(sum(l.l_extendedprice), 2) AS sum_price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """

    sql["skew_salted_distinct"] = """
        SELECT event_type, count(DISTINCT user_id) AS n_distinct
        FROM events GROUP BY event_type ORDER BY event_type
    """

    sql["text_vocab_topn"] = f"""
        SELECT token, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_TOKENS}) AS token FROM documents)
        GROUP BY token
        ORDER BY freq DESC, token
        LIMIT 100
    """

    sql["text_oov_rate"] = f"""
        WITH vocab AS (
            SELECT token
            FROM (SELECT unnest({_TOKENS}) AS token FROM documents)
            GROUP BY token
            ORDER BY count(*) DESC, token
            LIMIT 100
        ),
        vl AS (SELECT list(token) AS v FROM vocab),
        t AS (SELECT doc_id, {_TOKENS} AS t FROM documents)
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(t, x -> NOT list_contains(vl.v, x)))
                    AS BIGINT) AS n_oov,
               CAST(len(list_filter(t, x -> NOT list_contains(vl.v, x)))
                    AS DOUBLE) / nullif(len(t), 0) AS oov_rate
        FROM t, vl
        ORDER BY doc_id
    """

    # boilerplate_segments defaults: seg_tokens=8, min_df=2
    sql["text_boilerplate"] = f"""
        WITH t AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        segs AS (
            SELECT doc_id,
                   md5(array_to_string(
                       list_slice(t, i * 8 + 1, i * 8 + 8), ' ')) AS seg_key
            FROM (
                SELECT doc_id, t,
                       unnest(range(0, CAST(ceil(len(t) / 8.0) AS INT))) AS i
                FROM t WHERE len(t) > 0
            )
        ),
        dfreq AS (
            SELECT seg_key, count(DISTINCT doc_id) AS df
            FROM segs GROUP BY seg_key
        ),
        per AS (
            SELECT s.doc_id,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_boilerplate
            FROM segs s JOIN dfreq d USING (seg_key)
            GROUP BY s.doc_id
        )
        SELECT doc.doc_id,
               CAST(coalesce(per.n_segments, 0) AS BIGINT) AS n_segments,
               CAST(coalesce(per.n_boilerplate, 0) AS BIGINT)
                   AS n_boilerplate,
               CAST(per.n_boilerplate AS DOUBLE)
                   / nullif(per.n_segments, 0) AS boilerplate_share
        FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
        ORDER BY doc.doc_id
    """

    # boilerplate_apply defaults: seg_tokens=8, min_df=2
    sql["text_boilerplate_apply"] = f"""
        WITH t AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        segs AS (
            SELECT doc_id, i AS pos,
                   array_to_string(
                       list_slice(t, i * 8 + 1, i * 8 + 8), ' ') AS seg
            FROM (
                SELECT doc_id, t,
                       unnest(range(0, CAST(ceil(len(t) / 8.0) AS INT))) AS i
                FROM t WHERE len(t) > 0
            )
        ),
        dfreq AS (
            SELECT md5(seg) AS k, count(DISTINCT doc_id) AS df
            FROM segs GROUP BY 1
        ),
        kept AS (
            SELECT s.doc_id,
                   string_agg(s.seg, ' ' ORDER BY s.pos) AS text_clean
            FROM segs s JOIN dfreq d ON md5(s.seg) = d.k
            WHERE d.df < 2
            GROUP BY s.doc_id
        )
        SELECT doc.doc_id,
               coalesce(kept.text_clean, '') AS text_clean
        FROM documents doc LEFT JOIN kept ON doc.doc_id = kept.doc_id
        ORDER BY doc.doc_id
    """

    sql["corpus_summary"] = f"""
        WITH per AS (
            SELECT source, lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len({_TOKENS})) AS BIGINT) AS total_tokens
            FROM documents GROUP BY source, lang
        ),
        tot AS (
            SELECT CAST(sum(total_tokens) AS BIGINT) AS ct FROM per
        )
        SELECT source, lang, n_docs, total_tokens,
               CAST(total_tokens AS DOUBLE) / n_docs AS mean_tokens_per_doc,
               CAST(total_tokens AS DOUBLE) / ct AS token_share
        FROM per, tot ORDER BY source, lang
    """

    # quality_filter default: min_score=0.75 (score is on an exact 0.25
    # grid, so the threshold compare cannot straddle engines)
    sql["text_quality_filter"] = f"""
        WITH feat AS (
            SELECT doc_id,
                   len({_TOKENS}) AS n_tokens,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST(list_sum(list_transform({_TOKENS}, x -> length(x))) AS DOUBLE)
                             / len({_TOKENS})
                        ELSE 0.0 END AS mean_word_len,
                   CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST({_sw_hits("en")} AS DOUBLE) / len({_TOKENS})
                        ELSE 0.0 END AS stopword_density
            FROM documents
        ),
        scored AS (
            SELECT doc_id, CAST(
                   (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN stopword_density >= 0.02 THEN 0.25 ELSE 0.0 END)
                   AS DOUBLE) AS quality_score
            FROM feat
        )
        SELECT d.doc_id, d.lang, d.source, s.quality_score
        FROM documents d JOIN scored s ON d.doc_id = s.doc_id
        WHERE s.quality_score >= 0.75
        ORDER BY d.doc_id
    """

    # unigram_logprob k=0.5: per-token ln rounded to the 1e-6 grid,
    # per-doc sum rounded back onto the grid, mean left raw (grid/int)
    sql["text_unigram_logprob"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
        ),
        uni AS (
            SELECT token, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY token
        ),
        tot AS (
            SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS v
            FROM uni
        ),
        per AS (
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(sum(round(ln((u.c + 0.5) / (tot.n + 0.5 * tot.v)),
                                   6)), 6) AS sum_logprob
            FROM toks t JOIN uni u ON t.token = u.token, tot
            GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
               per.sum_logprob,
               per.sum_logprob / per.n_tokens AS avg_logprob
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        ORDER BY d.doc_id
    """

    # bigram_logprob k=0.5: same grid recipe over conditional bigrams
    sql["text_bigram_logprob"] = f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents
        ),
        pw AS (
            SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2 FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(t) - 1, 0) + 1),
                           i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS p
                FROM toks WHERE len(t) >= 2
            )
        ),
        c2 AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
            FROM pw GROUP BY w1, w2
        ),
        c1 AS (
            SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
                SELECT unnest(t) AS w1 FROM toks
            ) GROUP BY w1
        ),
        vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c1),
        model AS (
            SELECT c2.w1, c2.w2,
                   round(ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * vv.v)), 6) AS lp
            FROM c2 JOIN c1 ON c2.w1 = c1.w1, vv
        ),
        per AS (
            SELECT pw.doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   round(sum(m.lp), 6) AS sum_logprob
            FROM pw JOIN model m ON pw.w1 = m.w1 AND pw.w2 = m.w2
            GROUP BY pw.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               per.sum_logprob,
               per.sum_logprob / per.n_bigrams AS avg_logprob
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        ORDER BY d.doc_id
    """

    # sqrt is correctly-rounded IEEE (unlike pow/exp), the denominator
    # is an ordered running cumsum read back via max, the cut is
    # integer basis points vs md5 — every keep decision bit-identical
    sql["text_temperature_mixture"] = f"""
        WITH toks AS (
            SELECT doc_id, source,
                   CAST(len({_TOKENS}) AS BIGINT) AS doc_tokens
            FROM documents
        ),
        tot AS (SELECT source, CAST(sum(doc_tokens) AS BIGINT) AS ns
                FROM toks GROUP BY source),
        csum AS (
            SELECT source, ns,
                   sum(sqrt(CAST(ns AS DOUBLE)))
                       OVER (ORDER BY source ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cs
            FROM tot),
        den AS (SELECT max(cs) AS denom FROM csum),
        rates AS (
            SELECT source,
                   CAST(least(10000,
                              floor(10000 * 10000.0
                                    * sqrt(CAST(ns AS DOUBLE))
                                    / denom / ns)) AS BIGINT) AS keep_bp
            FROM csum, den)
        SELECT t.doc_id, t.source, t.doc_tokens
        FROM toks t JOIN rates r USING (source)
        WHERE CAST('0x' || substring(
                  md5('tmix:' || CAST(t.doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 10000 < r.keep_bp
        ORDER BY t.doc_id
    """

    # PMI: five grid-snapped ln(int) terms summed in the same order as
    # the Spark side -> bit-identical double, total (pmi desc, w1, w2)
    # rank stable for the LIMIT cut
    sql["text_pmi_collocations"] = f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        uni AS (SELECT unnest(t) AS w FROM toks),
        c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c
               FROM uni GROUP BY w),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
        pw AS (
            SELECT unnest(list_transform(
                       range(1, greatest(len(t) - 1, 0) + 1),
                       i -> struct_pack(w1 := t[i], w2 := t[i + 1])))
                       AS p
            FROM toks WHERE len(t) >= 2),
        c2 AS (SELECT p.w1 AS w1, p.w2 AS w2,
                      CAST(count(*) AS BIGINT) AS n_pair
               FROM pw GROUP BY 1, 2 HAVING count(*) >= 5),
        b AS (SELECT CAST(count(*) AS BIGINT) AS b FROM pw)
        SELECT c2.w1, c2.w2, n_pair,
               round(ln(n_pair), 6) + 2 * round(ln(n.n), 6)
               - round(ln(b.b), 6) - round(ln(ca.c), 6)
               - round(ln(cb.c), 6) AS pmi
        FROM c2 JOIN c1 ca ON c2.w1 = ca.w
                JOIN c1 cb ON c2.w2 = cb.w, n, b
        ORDER BY pmi DESC, w1, w2 LIMIT 20
    """

    # fertility card: all-bigint sums (strlen = UTF-8 bytes), raw
    # int/int ratios (bit-identical IEEE division, the oov_rate rule)
    sql["text_tokenizer_fertility"] = f"""
        WITH agg AS (
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len({_TOKENS})) AS BIGINT) AS n_tokens,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars,
                   CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
            FROM documents GROUP BY lang, source
        )
        SELECT lang, source, n_docs, n_tokens, n_chars, n_bytes,
               CASE WHEN n_tokens > 0
                    THEN CAST(n_chars AS DOUBLE) / n_tokens
               END AS chars_per_token,
               CASE WHEN n_tokens > 0
                    THEN CAST(n_bytes AS DOUBLE) / n_tokens
               END AS bytes_per_token,
               CASE WHEN n_chars > 0
                    THEN CAST(n_bytes AS DOUBLE) / n_chars
               END AS bytes_per_char,
               CAST(n_tokens AS DOUBLE) / n_docs AS tokens_per_doc
        FROM agg ORDER BY lang, source
    """

    # CCNet terciles: avg_logprob bits from the unigram grid recipe;
    # the plain per-lang row_number here equals the Spark side's
    # histogram-rank decomposition by construction (floor(score*16)
    # is monotone in score); tile math is integer division
    sql["text_perplexity_buckets"] = f"""
        WITH toks AS (
            SELECT doc_id, lang, unnest({_TOKENS}) AS token
            FROM documents
        ),
        uni AS (
            SELECT token, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY token
        ),
        tot AS (
            SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS v
            FROM uni
        ),
        per AS (
            SELECT t.doc_id, t.lang,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(sum(round(ln((u.c + 0.5) / (tot.n + 0.5 * tot.v)),
                                   6)), 6) AS slp
            FROM toks t JOIN uni u USING (token), tot
            GROUP BY t.doc_id, t.lang
        ),
        ranked AS (
            SELECT doc_id, lang, n_tokens, slp / n_tokens AS avg_logprob,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY slp / n_tokens DESC, doc_id) AS rnk,
                   CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
            FROM per
        )
        SELECT doc_id, lang, n_tokens, avg_logprob,
               CAST(1 + (3 * (rnk - 1)) // nl AS BIGINT) AS bucket,
               CASE 1 + (3 * (rnk - 1)) // nl
                    WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM ranked ORDER BY doc_id
    """

    # frozen linear scorer: every feature integer floor-division
    # fixed-point, margin exact bigint -> no double anywhere
    sql["text_quality_logit"] = f"""
        WITH feat AS (
            SELECT doc_id,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
                   CAST(list_sum(list_transform({_TOKENS},
                        x -> length(x))) AS BIGINT) AS char_sum,
                   CAST({_sw_hits("en")} AS BIGINT) AS sw_hits,
                   CAST(length(text) AS BIGINT) AS nc,
                   CAST(length(text) - length(regexp_replace(
                        text, '[^\\w\\s]', '', 'g')) AS BIGINT) AS pc,
                   CAST(length(text) - length(regexp_replace(
                        text, '[0-9]', '', 'g')) AS BIGINT) AS dc
            FROM documents
        ),
        fx AS (
            SELECT doc_id, n_tokens,
                   CASE WHEN n_tokens > 0
                        THEN (100 * char_sum) // n_tokens
                        ELSE 0 END AS mwl_c,
                   (10000 * pc) // greatest(nc, 1) AS punct_bp,
                   (10000 * dc) // greatest(nc, 1) AS digit_bp,
                   CASE WHEN n_tokens > 0
                        THEN (10000 * sw_hits) // n_tokens
                        ELSE 0 END AS sw_bp
            FROM feat
        )
        SELECT doc_id, n_tokens,
               CAST(mwl_c AS BIGINT) AS mwl_c,
               CAST(punct_bp AS BIGINT) AS punct_bp,
               CAST(digit_bp AS BIGINT) AS digit_bp,
               CAST(sw_bp AS BIGINT) AS sw_bp,
               CAST(-500000 + 150 * least(n_tokens, 2000)
                    + 800 * least(sw_bp, 3000)
                    - 900 * punct_bp - 700 * digit_bp
                    + CASE WHEN mwl_c BETWEEN 200 AND 1200
                           THEN 400000 ELSE 0 END AS BIGINT)
                   AS margin_micro,
               (-500000 + 150 * least(n_tokens, 2000)
                    + 800 * least(sw_bp, 3000)
                    - 900 * punct_bp - 700 * digit_bp
                    + CASE WHEN mwl_c BETWEEN 200 AND 1200
                           THEN 400000 ELSE 0 END) >= 0 AS keep
        FROM fx ORDER BY doc_id
    """

    # Heaps curve: SQL ntile == histogram_ntile's integer tile math;
    # window sums CAST from HUGEINT; ln on identical bigints -> grid
    sql["text_heaps_curve"] = f"""
        WITH tiled AS (
            SELECT doc_id, text,
                   ntile(10) OVER (ORDER BY doc_id) AS tile
            FROM documents
        ),
        toks AS (SELECT tile, unnest({_TOKENS}) AS token FROM tiled),
        docs_per AS (
            SELECT tile, CAST(count(*) AS BIGINT) AS docs
            FROM tiled GROUP BY tile
        ),
        occ_per AS (
            SELECT tile, CAST(count(*) AS BIGINT) AS occ
            FROM toks GROUP BY tile
        ),
        firstt AS (SELECT token, min(tile) AS tile FROM toks GROUP BY token),
        new_per AS (
            SELECT tile, CAST(count(*) AS BIGINT) AS newv
            FROM firstt GROUP BY tile
        ),
        cur AS (
            SELECT d.tile,
                   CAST(sum(d.docs) OVER w AS BIGINT) AS n_docs,
                   CAST(sum(coalesce(o.occ, 0)) OVER w AS BIGINT)
                       AS n_tokens,
                   CAST(sum(coalesce(nv.newv, 0)) OVER w AS BIGINT)
                       AS vocab
            FROM docs_per d
            LEFT JOIN occ_per o USING (tile)
            LEFT JOIN new_per nv USING (tile)
            WINDOW w AS (ORDER BY d.tile
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT CAST(tile AS BIGINT) AS checkpoint, n_docs, n_tokens,
               vocab,
               CASE WHEN n_tokens > 0
                    THEN round(ln(n_tokens), 6) END AS ln_tokens,
               CASE WHEN vocab > 0
                    THEN round(ln(vocab), 6) END AS ln_vocab
        FROM cur ORDER BY checkpoint
    """

    # DSIR: md5 bucket exact cross-engine; the two-ln difference
    # stays on the 1e-6 grid, per-doc sum rounded back, mean raw
    sql["text_dsir_sample"] = f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   CAST('0x' || substring(md5(token), 1, 8) AS BIGINT)
                       % 1024 AS b
            FROM (SELECT doc_id, lang, unnest({_TOKENS}) AS token
                  FROM documents)
        ),
        raw AS (
            SELECT b, CAST(count(*) AS BIGINT) AS cr,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS ct
            FROM toks GROUP BY b
        ),
        tot AS (
            SELECT CAST(sum(cr) AS BIGINT) AS nr,
                   CAST(sum(ct) AS BIGINT) AS nt
            FROM raw
        ),
        w AS (
            SELECT b,
                   round(ln((ct + 0.5) / (nt + 0.5 * 1024)), 6)
                   - round(ln((cr + 0.5) / (nr + 0.5 * 1024)), 6) AS w
            FROM raw, tot
        ),
        per AS (
            SELECT t.doc_id, t.lang,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(sum(w.w), 6) AS slr
            FROM toks t JOIN w USING (b)
            GROUP BY t.doc_id, t.lang
        )
        SELECT doc_id, lang, n_tokens, slr / n_tokens AS importance
        FROM per ORDER BY importance DESC, doc_id LIMIT 200
    """

    # user entropy: Σ c·ln(c) carried as an exact bigint of micro-nats
    # (merge-order-proof), the division/subtraction then deterministic
    sql["ev_user_entropy"] = """
        WITH tc AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY user_id, event_type
        ),
        per AS (
            SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT))
                        AS BIGINT) AS slc
            FROM tc GROUP BY user_id
        )
        SELECT user_id, n_events, n_types,
               round(ln(n_events), 6) - (slc / n_events) / 1000000.0
                   AS type_entropy,
               CASE WHEN n_types > 1 THEN
                   (round(ln(n_events), 6) - (slc / n_events) / 1000000.0)
                   / round(ln(n_types), 6) END AS evenness
        FROM per ORDER BY user_id
    """

    # exact-k per-lang hash sample: the plain per-lang row_number here
    # equals the Spark histogram-rank decomposition by construction
    # (the nibble bucket IS the hash prefix, so (bucket, hash, key)
    # refines the same total order)
    sql["sample_stratified_exact_k"] = """
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5('strata:' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rk
            FROM documents
        ) WHERE rk <= 25
        ORDER BY lang, doc_id
    """

    # CCNet keep rule: perplexity tercile CTEs + bucket <= 2 filter,
    # source joined back from the raw table
    sql["text_ccnet_filter"] = f"""
        WITH toks AS (
            SELECT doc_id, lang, unnest({_TOKENS}) AS token
            FROM documents
        ),
        uni AS (
            SELECT token, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY token
        ),
        tot AS (
            SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS v
            FROM uni
        ),
        per AS (
            SELECT t.doc_id, t.lang,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(sum(round(ln((u.c + 0.5) / (tot.n + 0.5 * tot.v)),
                                   6)), 6) AS slp
            FROM toks t JOIN uni u USING (token), tot
            GROUP BY t.doc_id, t.lang
        ),
        ranked AS (
            SELECT doc_id, lang, n_tokens, slp / n_tokens AS avg_logprob,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY slp / n_tokens DESC, doc_id) AS rnk,
                   CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
            FROM per
        )
        SELECT r.doc_id, r.lang, d.source, r.n_tokens, r.avg_logprob,
               CASE 1 + (3 * (rnk - 1)) // nl
                    WHEN 1 THEN 'head' ELSE 'middle' END AS ppl_bucket
        FROM ranked r JOIN documents d USING (doc_id)
        WHERE 1 + (3 * (rnk - 1)) // nl <= 2
        ORDER BY r.doc_id
    """

    # length drift: two-significant-digit integer cells (leading
    # digits from the decimal STRING — pow(10,k) is ulp-unsafe),
    # dense grid cumsums exact bigints, ECDFs raw int/int
    sql["doc_length_drift"] = """
        WITH base AS (
            SELECT source,
                   CASE WHEN length(CAST(n_chars AS VARCHAR)) >= 2
                        THEN CAST(length(CAST(n_chars AS VARCHAR))
                                  AS BIGINT) * 100
                             + CAST(substring(CAST(n_chars AS VARCHAR),
                                              1, 2) AS BIGINT)
                        ELSE 100 + n_chars END AS cell
            FROM documents
        ),
        counts AS (
            SELECT source, cell, CAST(count(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2
        ),
        src_tot AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS ns
            FROM counts GROUP BY 1
        ),
        cells AS (SELECT DISTINCT cell FROM counts),
        tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM src_tot),
        grid AS (
            SELECT s.source, s.ns, x.cell,
                   CAST(coalesce(c.c, 0) AS BIGINT) AS c
            FROM src_tot s CROSS JOIN cells x
            LEFT JOIN counts c ON c.source = s.source AND c.cell = x.cell
        ),
        cum AS (
            SELECT source, ns, cell,
                   CAST(sum(c) OVER (PARTITION BY source ORDER BY cell
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM grid
        ),
        gcum AS (
            SELECT cell,
                   CAST(sum(g) OVER (ORDER BY cell
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS gcum
            FROM (SELECT cell, CAST(sum(c) AS BIGINT) AS g
                  FROM counts GROUP BY cell)
        ),
        d AS (
            SELECT cum.source, cum.ns,
                   abs(cum.cum / cum.ns
                       - CASE WHEN tot.n - cum.ns > 0
                              THEN (gcum.gcum - cum.cum)
                                   / (tot.n - cum.ns) END) AS dd
            FROM cum JOIN gcum USING (cell), tot
        )
        SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
               max(dd) AS ks_stat
        FROM d GROUP BY source ORDER BY source
    """

    # filter funnel: every fail flag compares bit-identical int/int
    # doubles, counts exact bigints; cumulative = OR of flags 1..i,
    # stacked to 7 rows with an explicit UNION ALL over the 1-row agg
    sql["text_filter_funnel"] = f"""
        WITH feat AS (
            SELECT {_TOKENS} AS toks,
                   CAST(length(text) - length(regexp_replace(
                        text, '[^\\w\\s]', '', 'g')) AS BIGINT) AS pc,
                   greatest(length(text), 1) AS nc
            FROM documents
        ),
        fl AS (
            SELECT
                CASE WHEN len(toks) < 10 THEN 1 ELSE 0 END AS f1,
                CASE WHEN len(toks) > 100000 THEN 1 ELSE 0 END AS f2,
                CASE WHEN len(toks) > 0 AND (
                         CAST(list_sum(list_transform(toks,
                              x -> length(x))) AS BIGINT)
                         / CAST(len(toks) AS BIGINT) < 2.0
                      OR CAST(list_sum(list_transform(toks,
                              x -> length(x))) AS BIGINT)
                         / CAST(len(toks) AS BIGINT) > 12.0)
                     THEN 1 ELSE 0 END AS f3,
                CASE WHEN CAST(pc AS DOUBLE) / nc > 0.2
                     THEN 1 ELSE 0 END AS f4,
                CASE WHEN len(toks) > 0 AND
                          CAST(len(list_filter(toks,
                               x -> list_contains({_SW["en"]}, x)))
                               AS BIGINT)
                          / CAST(len(toks) AS BIGINT) < 0.02
                     THEN 1 ELSE 0 END AS f5,
                CASE WHEN 1.0 - CAST(len(list_distinct(toks)) AS BIGINT)
                          / CAST(len(toks) AS BIGINT) > 0.3
                     THEN 1 ELSE 0 END AS f6,
                CASE WHEN CAST(list_max(list_transform(list_distinct(toks),
                               d -> len(list_filter(toks, t -> t = d))))
                               AS BIGINT)
                          / CAST(len(toks) AS BIGINT) > 0.2
                     THEN 1 ELSE 0 END AS f7
            FROM feat
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(coalesce(sum(f1), 0) AS BIGINT) AS m1,
                   CAST(coalesce(sum(f2), 0) AS BIGINT) AS m2,
                   CAST(coalesce(sum(f3), 0) AS BIGINT) AS m3,
                   CAST(coalesce(sum(f4), 0) AS BIGINT) AS m4,
                   CAST(coalesce(sum(f5), 0) AS BIGINT) AS m5,
                   CAST(coalesce(sum(f6), 0) AS BIGINT) AS m6,
                   CAST(coalesce(sum(f7), 0) AS BIGINT) AS m7,
                   CAST(coalesce(sum(f1), 0) AS BIGINT) AS s1,
                   CAST(coalesce(sum(greatest(f1, f2)), 0) AS BIGINT) AS s2,
                   CAST(coalesce(sum(greatest(f1, f2, f3)), 0) AS BIGINT)
                       AS s3,
                   CAST(coalesce(sum(greatest(f1, f2, f3, f4)), 0)
                        AS BIGINT) AS s4,
                   CAST(coalesce(sum(greatest(f1, f2, f3, f4, f5)), 0)
                        AS BIGINT) AS s5,
                   CAST(coalesce(sum(greatest(f1, f2, f3, f4, f5, f6)), 0)
                        AS BIGINT) AS s6,
                   CAST(coalesce(sum(greatest(f1, f2, f3, f4, f5, f6, f7)),
                                 0) AS BIGINT) AS s7
            FROM fl
        )
        SELECT CAST(1 AS BIGINT) AS rule_no, 'min_tokens' AS rule,
               m1 AS n_fail, s1 AS n_dropped_cum,
               n_docs - s1 AS n_pass_cum FROM agg
        UNION ALL SELECT 2, 'max_tokens', m2, s2, n_docs - s2 FROM agg
        UNION ALL SELECT 3, 'mean_word_len', m3, s3, n_docs - s3 FROM agg
        UNION ALL SELECT 4, 'punct_ratio', m4, s4, n_docs - s4 FROM agg
        UNION ALL SELECT 5, 'stopword_density', m5, s5, n_docs - s5
            FROM agg
        UNION ALL SELECT 6, 'dup_token_frac', m6, s6, n_docs - s6
            FROM agg
        UNION ALL SELECT 7, 'top_token_frac', m7, s7, n_docs - s7
            FROM agg
        ORDER BY rule_no
    """

    # stickiness: one 30-offset explode serves DAU/WAU/MAU; day spine
    # recovered as offset-0 days; ratio raw int/int
    sql["ev_stickiness"] = """
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        cov AS (
            SELECT user_id, s['off'] AS off, s['cday'] AS cday FROM (
                SELECT user_id,
                       unnest(list_transform(range(0, 30),
                           i -> struct_pack(
                               off := i,
                               -- DATE + INTERVAL yields TIMESTAMP in
                               -- DuckDB; cast back to DATE
                               cday := CAST(day + to_days(CAST(i AS INT))
                                            AS DATE))))
                           AS s
                FROM du
            )
        ),
        peru AS (
            SELECT cday, user_id, min(off) AS mo
            FROM cov GROUP BY 1, 2
        ),
        per_day AS (
            SELECT cday AS day,
                   CAST(sum(CASE WHEN mo = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dau,
                   CAST(sum(CASE WHEN mo <= 6 THEN 1 ELSE 0 END)
                        AS BIGINT) AS wau,
                   CAST(count(*) AS BIGINT) AS mau
            FROM peru GROUP BY 1
        )
        SELECT day, dau, wau, mau, dau / mau AS stickiness
        FROM per_day WHERE dau > 0 ORDER BY day
    """

    # script mix: exact class counts (length-after-removal idiom),
    # shares raw int/int, dominant ties in fixed class order
    sql["text_script_mix"] = """
        WITH c AS (
            SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(text) - length(regexp_replace(
                        text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
                   CAST(length(text) - length(regexp_replace(
                        text, '[Ѐ-ӿ]', '', 'g')) AS BIGINT) AS n_cyrillic,
                   CAST(length(text) - length(regexp_replace(
                        text, '[一-鿿]', '', 'g')) AS BIGINT) AS n_cjk,
                   CAST(length(text) - length(regexp_replace(
                        text, '[؀-ۿ]', '', 'g')) AS BIGINT) AS n_arabic,
                   CAST(length(text) - length(regexp_replace(
                        text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit
            FROM documents
        )
        SELECT doc_id, n_chars, n_latin, n_cyrillic, n_cjk, n_arabic,
               n_digit,
               CASE
                   WHEN greatest(n_latin, n_cyrillic, n_cjk, n_arabic) = 0
                        THEN 'none'
                   WHEN n_latin = greatest(n_latin, n_cyrillic, n_cjk,
                                           n_arabic) THEN 'latin'
                   WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_cjk,
                                              n_arabic) THEN 'cyrillic'
                   WHEN n_cjk = greatest(n_latin, n_cyrillic, n_cjk,
                                         n_arabic) THEN 'cjk'
                   ELSE 'arabic' END AS dominant_script,
               CASE WHEN n_chars > 0 THEN
                   CAST(n_latin + n_cyrillic + n_cjk + n_arabic AS DOUBLE)
                   / n_chars END AS letter_share
        FROM c ORDER BY doc_id
    """

    # price index: everything integer/decimal until one double/double
    # division of exact sums (int->double conversion correctly
    # rounded in both engines)
    sql["q_price_index"] = """
        WITH pm AS (
            SELECT l_partkey AS part,
                   CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
                       AS month,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem GROUP BY 1, 2
        ),
        pmp AS (
            SELECT part, month, qty, (cents * 10000) // qty AS p_micro
            FROM pm
        ),
        bm AS (SELECT min(month) AS bmonth FROM pmp),
        base AS (
            SELECT part, qty AS q0, p_micro AS p0_micro
            FROM pmp, bm WHERE pmp.month = bm.bmonth
        ),
        idx AS (
            SELECT pmp.month,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   sum(CAST(pmp.p_micro AS HUGEINT) * base.q0) AS lnum,
                   sum(CAST(base.p0_micro AS HUGEINT) * base.q0) AS lden,
                   sum(CAST(pmp.p_micro AS HUGEINT) * pmp.qty) AS pnum,
                   sum(CAST(base.p0_micro AS HUGEINT) * pmp.qty) AS pden
            FROM pmp JOIN base USING (part)
            GROUP BY 1
        )
        SELECT month, n_parts,
               CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE) AS laspeyres,
               CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE) AS paasche
        FROM idx ORDER BY month
    """

    # seasonal anomalies: decompose CTEs verbatim, then the
    # stats_mad_outliers quantile_cont pairing over the residuals
    sql["ts_seasonal_anomalies"] = f"""
        WITH long AS ({_LONG}),
        t AS (
            SELECT date, code, value,
                   round(sum(value) OVER w13, 2)
                       / count(*) OVER w13 AS trend,
                   round(value, 2)
                   - round(sum(value) OVER w13, 2) / count(*) OVER w13
                       AS detrended
            FROM long
            WINDOW w13 AS (PARTITION BY code ORDER BY date
                           ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
        ),
        c AS (
            SELECT code, CAST(month(date) AS INT) AS m, date, detrended,
                   sum(detrended) OVER (
                       PARTITION BY code, month(date) ORDER BY date
                       ROWS UNBOUNDED PRECEDING) AS cs,
                   count(*) OVER (PARTITION BY code, month(date)) AS n,
                   row_number() OVER (
                       PARTITION BY code, month(date)
                       ORDER BY date DESC) AS rk
            FROM t
        ),
        s AS (SELECT code, m, cs / n AS seasonal FROM c WHERE rk = 1),
        res AS (
            SELECT t.date, t.code, round(t.value, 4) AS value,
                   t.detrended - s.seasonal AS residual
            FROM t JOIN s ON t.code = s.code
                   AND CAST(month(t.date) AS INT) = s.m
        ),
        med AS (
            SELECT code, quantile_cont(residual, 0.5) AS med
            FROM res GROUP BY code
        ),
        dev AS (
            SELECT res.code, res.date, res.value, res.residual, med.med,
                   abs(res.residual - med.med) AS adev
            FROM res JOIN med USING (code)
        ),
        mads AS (
            SELECT code, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY code
        )
        SELECT d.code, d.date, d.value, d.residual,
               (d.residual - d.med) / (1.4826 * m.mad) AS robust_z
        FROM dev d JOIN mads m USING (code)
        WHERE m.mad > 0 AND d.adev > 3.5 * 1.4826 * m.mad
        ORDER BY d.code, d.date
    """

    # centroid drift: micro-unit integer coordinate sums, HUGEINT
    # dot/norm accumulations (exact, merge-order-proof), one
    # correctly-rounded sqrt/division pair
    sql["emb_centroid_drift"] = """
        WITH halves AS (
            SELECT label, vec_id % 2 AS h, u.d AS d,
                   CAST(round(CAST(u.v AS DOUBLE) * 1000000) AS BIGINT)
                       AS vm
            FROM (
                SELECT label, vec_id,
                       unnest(list_transform(
                           range(1, len(embedding) + 1),
                           i -> struct_pack(d := i,
                                            v := embedding[i]))) AS u
                FROM embeddings
            )
        ),
        sums AS (
            SELECT label, h, d, CAST(sum(vm) AS BIGINT) AS s
            FROM halves GROUP BY 1, 2, 3
        ),
        wide AS (
            SELECT label, d,
                   CAST(sum(CASE WHEN h = 0 THEN s END) AS BIGINT) AS s0,
                   CAST(sum(CASE WHEN h = 1 THEN s END) AS BIGINT) AS s1
            FROM sums GROUP BY 1, 2
            HAVING sum(CASE WHEN h = 0 THEN s END) IS NOT NULL
               AND sum(CASE WHEN h = 1 THEN s END) IS NOT NULL
        ),
        counts AS (
            SELECT label,
                   CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b
            FROM embeddings GROUP BY 1
        ),
        acc AS (
            SELECT label,
                   sum(CAST(s0 AS HUGEINT) * s1) AS dot,
                   sum(CAST(s0 AS HUGEINT) * s0) AS q0,
                   sum(CAST(s1 AS HUGEINT) * s1) AS q1
            FROM wide GROUP BY 1
        )
        SELECT acc.label, counts.n_a, counts.n_b,
               CAST(dot AS DOUBLE)
               / (sqrt(CAST(q0 AS DOUBLE)) * sqrt(CAST(q1 AS DOUBLE)))
                   AS centroid_cosine,
               (counts.n_b * sqrt(CAST(q0 AS DOUBLE)))
               / (counts.n_a * sqrt(CAST(q1 AS DOUBLE))) AS norm_ratio
        FROM acc JOIN counts USING (label)
        ORDER BY acc.label
    """

    # tfidf_top_terms top=3: idf rounded to the 1e-6 grid so tf*idf is
    # a bit-identical int x grid-double product; ties break on token
    sql["text_tfidf_top_terms"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
        ),
        tf AS (
            SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, token
        ),
        dfreq AS (
            SELECT token, CAST(count(*) AS BIGINT) AS df
            FROM tf GROUP BY token
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token, tf.tf,
                   tf.tf * round(ln(CAST(nd.n AS DOUBLE) / dfreq.df), 6)
                       AS tfidf
            FROM tf JOIN dfreq ON tf.token = dfreq.token, nd
        )
        SELECT doc_id, token, tf, tfidf, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT)
                AS rank
            FROM scored
        ) WHERE rank <= 3
        ORDER BY doc_id, rank
    """

    sql["ev_funnel_steps"] = """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t
            GROUP BY e.user_id
        )
        SELECT 1 AS step_idx, 'view' AS step,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        ORDER BY step_idx
    """

    # funnel with a 24h conversion window per step
    sql["ev_funnel_within"] = """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t
                  AND e.ts <= s1.t + INTERVAL 1440 MINUTE
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t
                  AND e.ts <= s2.t + INTERVAL 1440 MINUTE
            GROUP BY e.user_id
        )
        SELECT 1 AS step_idx, 'view' AS step,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        ORDER BY step_idx
    """

    sql["ev_retention_cohorts"] = """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        first AS (
            SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
        )
        SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day, d.day) AS INT)
                   AS day_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM days d JOIN first f ON d.user_id = f.user_id
        GROUP BY f.cohort_day, day_offset
        ORDER BY f.cohort_day, day_offset
    """

    sql["q4_order_priority"] = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= '1996-01-01'
          AND o.o_orderdate < '1997-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09
          )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """

    sql["q12_flag_priority"] = """
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE year(l.l_shipdate) = 1996
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """

    # winsorize: percentile bounds + integer tail counts only (clipped
    # SUMS would mix value/bound grids and re-open the midpoint trap)
    sql["stats_winsorize"] = """
        WITH bounds AS (
            SELECT l_returnflag AS g,
                   quantile_cont(l_extendedprice, 0.01) AS p_lo,
                   quantile_cont(l_extendedprice, 0.99) AS p_hi
            FROM lineitem GROUP BY 1
        )
        SELECT l.l_returnflag, min(b.p_lo) AS p_lo, min(b.p_hi) AS p_hi,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l.l_extendedprice < b.p_lo
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_low,
               CAST(sum(CASE WHEN l.l_extendedprice > b.p_hi
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_high
        FROM lineitem l JOIN bounds b ON l.l_returnflag = b.g
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """

    # mad_outliers: no rounding — identical IEEE derivations both sides
    sql["stats_mad_outliers"] = """
        WITH med AS (
            SELECT l_returnflag AS g,
                   quantile_cont(l_extendedprice, 0.5) AS med
            FROM lineitem GROUP BY 1
        ),
        dev AS (
            SELECT l.l_returnflag AS g, m.med,
                   abs(l.l_extendedprice - m.med) AS adev
            FROM lineitem l JOIN med m ON l.l_returnflag = m.g
        ),
        mads AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n, min(med) AS med,
                   quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY g
        )
        SELECT d.g AS l_returnflag, min(m.n) AS n, min(m.med) AS med,
               min(m.mad) AS mad,
               CAST(sum(CASE WHEN d.adev > 3.5 * 1.4826 * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mads m ON d.g = m.g
        GROUP BY d.g ORDER BY d.g
    """

    # epoch_shards defaults: num_shards=8, salt='epoch0'
    sql["doc_epoch_shards"] = """
        WITH h AS (
            SELECT doc_id, source,
                   md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS hh
            FROM documents
        ),
        s AS (
            SELECT doc_id, source, hh,
                   CAST(CAST('0x' || substring(hh, 1, 8) AS BIGINT) % 8
                        AS INT) AS shard
            FROM h
        )
        SELECT doc_id, source, shard,
               CAST(row_number() OVER (
                   PARTITION BY shard ORDER BY hh, doc_id) AS INT) AS pos
        FROM s
        ORDER BY shard, pos
    """

    # head fingerprint: md5 of the normalized first-40-chars (substr
    # BEFORE normalize, matching operators.dedup.content_key)
    _HFP = ("md5(trim(regexp_replace(lower(substr(text, 1, 40)), "
            "'\\s+', ' ', 'g')))")

    sql["dedup_incremental"] = f"""
        WITH b AS (
            SELECT doc_id, source, {_HFP} AS fp
            FROM documents WHERE doc_id % 2 = 1
        ),
        seen AS (
            SELECT DISTINCT {_HFP} AS fp
            FROM documents WHERE doc_id % 2 = 0
        ),
        fresh AS (
            SELECT b.* FROM b LEFT JOIN seen s ON b.fp = s.fp
            WHERE s.fp IS NULL
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY fp ORDER BY doc_id) AS rn
            FROM fresh
        )
        SELECT doc_id, source, fp FROM r WHERE rn = 1 ORDER BY doc_id
    """

    # Bloom prefilter is semantically invisible (no false negatives;
    # the anti-join ignores the false positives it lets through), so
    # the bloomed variant's oracle is the PLAIN incremental dedup on
    # its split (1% crawl batch vs 99% released history) — the value
    # parity is exactly the "result unchanged" proof.
    sql["dedup_incremental_bloom"] = f"""
        WITH b AS (
            SELECT doc_id, source, {_HFP} AS fp
            FROM documents WHERE doc_id % 100 = 1
        ),
        seen AS (
            SELECT DISTINCT {_HFP} AS fp
            FROM documents WHERE doc_id % 100 != 1
        ),
        fresh AS (
            SELECT b.* FROM b LEFT JOIN seen s ON b.fp = s.fp
            WHERE s.fp IS NULL
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY fp ORDER BY doc_id) AS rn
            FROM fresh
        )
        SELECT doc_id, source, fp FROM r WHERE rn = 1 ORDER BY doc_id
    """

    sql["dedup_stats_by_source"] = f"""
        WITH keyed AS (SELECT source, {_HFP} AS fp FROM documents),
        mult AS (SELECT fp, count(*) AS m FROM keyed GROUP BY fp)
        SELECT k.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT k.fp) AS BIGINT) AS n_unique,
               CAST(sum(CASE WHEN m.m > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_duped,
               CAST(sum(CASE WHEN m.m > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   / CAST(count(*) AS BIGINT) AS dup_share
        FROM keyed k JOIN mult m ON k.fp = m.fp
        GROUP BY k.source ORDER BY k.source
    """

    sql["dedup_source_overlap"] = f"""
        WITH f AS (SELECT DISTINCT source, {_HFP} AS fp FROM documents),
        s AS (SELECT source, CAST(count(*) AS BIGINT) AS n
              FROM f GROUP BY source),
        p AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT p.source_a, p.source_b, p.n_common,
               sa.n AS n_a, sb.n AS n_b,
               p.n_common / (sa.n + sb.n - p.n_common) AS jaccard
        FROM p JOIN s sa ON p.source_a = sa.source
               JOIN s sb ON p.source_b = sb.source
        ORDER BY p.source_a, p.source_b
    """

    sql["split_leakage_safe"] = f"""
        WITH f AS (SELECT doc_id, lang, {_HFP} AS fp FROM documents),
        r AS (
            SELECT doc_id, lang,
                   min(doc_id) OVER (PARTITION BY fp) AS rep_id
            FROM f
        )
        SELECT doc_id, lang, rep_id,
               CASE WHEN CAST('0x' || substring(
                        md5('split:' || CAST(rep_id AS VARCHAR)), 1, 4)
                        AS INT) % 100 < 10
                    THEN 'val' ELSE 'train' END AS split
        FROM r ORDER BY doc_id
    """

    # release_rehearsal composes the four stage oracles verbatim, each
    # applied to the PREVIOUS stage's survivors (splits are computed
    # after filtering, matching api.incremental_release's order)
    sql["release_rehearsal"] = f"""
        WITH b AS (
            SELECT doc_id, text, lang, source, {_HFP} AS fp
            FROM documents WHERE doc_id % 2 = 1
        ),
        seen AS (
            SELECT DISTINCT {_HFP} AS fp
            FROM documents WHERE doc_id % 2 = 0
        ),
        fresh AS (
            SELECT b.* FROM b LEFT JOIN seen s ON b.fp = s.fp
            WHERE s.fp IS NULL
        ),
        survivors AS (
            SELECT doc_id, text, lang, source FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY fp ORDER BY doc_id) AS rn
                FROM fresh
            ) WHERE rn = 1
        ),
        feat AS (
            SELECT doc_id,
                   len({_TOKENS}) AS n_tokens,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST(list_sum(list_transform({_TOKENS}, x -> length(x))) AS DOUBLE)
                             / len({_TOKENS})
                        ELSE 0.0 END AS mean_word_len,
                   CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST({_sw_hits("en")} AS DOUBLE) / len({_TOKENS})
                        ELSE 0.0 END AS stopword_density
            FROM survivors
        ),
        scored AS (
            SELECT doc_id, CAST(
                   (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN stopword_density >= 0.02 THEN 0.25 ELSE 0.0 END)
                   AS DOUBLE) AS quality_score
            FROM feat
        ),
        q AS (
            SELECT sv.doc_id, sv.text, sv.lang, sv.source,
                   sc.quality_score
            FROM survivors sv JOIN scored sc ON sv.doc_id = sc.doc_id
            WHERE sc.quality_score >= 0.75
        ),
        toks AS (SELECT doc_id, {_TOKENS} AS t FROM q),
        dg AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(t) - 4, 0) + 1), {_G5})))
                       AS gram
            FROM toks WHERE len(t) >= 5
        ),
        et AS (SELECT {_TOKENS} AS t FROM {eval_vals}),
        eg AS (
            SELECT DISTINCT unnest(list_transform(
                       range(1, greatest(len(t) - 4, 0) + 1), {_G5}))
                       AS gram
            FROM et WHERE len(t) >= 5
        ),
        hits AS (
            SELECT DISTINCT doc_id FROM dg
            WHERE gram IN (SELECT gram FROM eg)
        ),
        clean AS (
            SELECT * FROM q
            WHERE NOT EXISTS (SELECT 1 FROM hits
                              WHERE hits.doc_id = q.doc_id)
        ),
        reps AS (
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY fp) AS rep_id
            FROM (SELECT doc_id, {_HFP} AS fp FROM clean)
        )
        SELECT c.doc_id, c.source, c.lang, c.quality_score,
               CASE WHEN CAST('0x' || substring(
                        md5('split:' || CAST(r.rep_id AS VARCHAR)), 1, 4)
                        AS INT) % 100 < 10
                    THEN 'val' ELSE 'train' END AS split
        FROM clean c JOIN reps r ON c.doc_id = r.doc_id
        ORDER BY c.doc_id
    """

    sql["ev_transitions"] = """
        WITH s AS (
            SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_type,
                   event_type AS next_type
            FROM events
        )
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT)
                   / CAST(sum(count(*)) OVER (PARTITION BY prev_type)
                          AS BIGINT) AS share
        FROM s WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type ORDER BY prev_type, next_type
    """

    sql["text_length_histogram"] = """
        SELECT CAST(length(CAST(n_chars AS VARCHAR)) AS INT)
                   AS len_digits,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars,
               CAST(sum(n_chars) AS BIGINT) / CAST(count(*) AS BIGINT)
                   AS mean_chars
        FROM documents GROUP BY 1 ORDER BY 1
    """

    sql["text_drop_short_tail"] = """
        WITH r AS (
            SELECT doc_id, lang, source, n_chars,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM documents
        )
        SELECT doc_id, lang, source, n_chars FROM r
        WHERE rk > CAST(floor(0.10 * n) AS BIGINT) ORDER BY doc_id
    """

    sql["q7_nation_volume"] = """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 4) AS revenue
        FROM (
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS INT) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            JOIN nation nc ON c.c_nationkey = nc.n_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
              AND ((ns.n_name = 'NATION_18' AND nc.n_name = 'NATION_19')
                   OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_18'))
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """

    sql["q10_returned_items"] = """
        SELECT c.c_custkey, c.c_name, n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """

    # fixed-point CUSUM: S_num = n*cumsum_cents - t*total_cents in
    # wide integers (HUGEINT here, DECIMAL(38,0) in Spark) so argmax +
    # tiebreak are exact; cusum_stat = S_num/(100n), means divide the
    # grid double (cents/100.0) by the side count
    sql["ts_cusum_changepoint"] = f"""
        WITH long AS ({_LONG}),
        v AS (
            SELECT date, code,
                   CAST(round(round(value, 2) * 100) AS BIGINT) AS c
            FROM long
        ),
        tot AS (
            SELECT code, CAST(sum(c) AS HUGEINT) AS tc,
                   CAST(count(*) AS BIGINT) AS n
            FROM v GROUP BY code
        ),
        cum AS (
            SELECT date, code,
                   CAST(sum(c) OVER (PARTITION BY code ORDER BY date
                        ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cumc,
                   CAST(row_number() OVER (PARTITION BY code
                        ORDER BY date) AS BIGINT) AS t
            FROM v
        ),
        s AS (
            SELECT cum.date, cum.code, tot.n,
                   abs(tot.n * cum.cumc - cum.t * tot.tc) AS abs_s
            FROM cum JOIN tot USING (code)
        ),
        pick AS (
            SELECT code, date AS change_date, abs_s, n,
                   row_number() OVER (
                       PARTITION BY code
                       ORDER BY abs_s DESC, date ASC) AS rk
            FROM s
        )
        SELECT p.code, p.n, p.change_date,
               CAST(p.abs_s AS DOUBLE) / (100.0 * p.n) AS cusum_stat,
               (CAST(sum(CASE WHEN v.date <= p.change_date
                              THEN v.c END) AS BIGINT) / 100.0)
                   / sum(CASE WHEN v.date <= p.change_date THEN 1 END)
                   AS mean_before,
               (CAST(sum(CASE WHEN v.date > p.change_date
                              THEN v.c END) AS BIGINT) / 100.0)
                   / sum(CASE WHEN v.date > p.change_date THEN 1 END)
                   AS mean_after,
               (CAST(sum(CASE WHEN v.date > p.change_date
                              THEN v.c END) AS BIGINT) / 100.0)
                   / sum(CASE WHEN v.date > p.change_date THEN 1 END)
               - (CAST(sum(CASE WHEN v.date <= p.change_date
                               THEN v.c END) AS BIGINT) / 100.0)
                   / sum(CASE WHEN v.date <= p.change_date THEN 1 END)
                   AS level_shift
        FROM v JOIN (SELECT * FROM pick WHERE rk = 1) p
             ON v.code = p.code
        GROUP BY p.code, p.n, p.change_date, p.abs_s
        ORDER BY p.code
    """
    # binary segmentation: the SAME wide-integer statistic, second
    # round re-keyed by the level-1 winner's side flag; integer
    # argmaxes make the recursion boundaries bit-deterministic
    sql["ts_cusum_binary_seg"] = f"""
        WITH long AS ({_LONG}),
        v AS (
            SELECT date, code,
                   CAST(round(round(value, 2) * 100) AS BIGINT) AS c
            FROM long
        ),
        tot1 AS (
            SELECT code, CAST(sum(c) AS HUGEINT) AS tc,
                   CAST(count(*) AS BIGINT) AS n
            FROM v GROUP BY code
        ),
        cum1 AS (
            SELECT date, code,
                   CAST(sum(c) OVER (PARTITION BY code ORDER BY date
                        ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cumc,
                   CAST(row_number() OVER (PARTITION BY code
                        ORDER BY date) AS BIGINT) AS t
            FROM v
        ),
        s1 AS (
            SELECT cum1.date, cum1.code, tot1.n,
                   abs(tot1.n * cum1.cumc - cum1.t * tot1.tc) AS abs_s
            FROM cum1 JOIN tot1 USING (code)
        ),
        p1 AS (
            SELECT code, date AS change_date, abs_s, n,
                   row_number() OVER (PARTITION BY code
                       ORDER BY abs_s DESC, date ASC) AS rk
            FROM s1
        ),
        w1 AS (SELECT * FROM p1 WHERE rk = 1),
        v2 AS (
            SELECT v.code,
                   CASE WHEN v.date <= w1.change_date THEN 'L'
                        ELSE 'R' END AS side,
                   v.date, v.c
            FROM v JOIN w1 ON v.code = w1.code
        ),
        tot2 AS (
            SELECT code, side, CAST(sum(c) AS HUGEINT) AS tc,
                   CAST(count(*) AS BIGINT) AS n
            FROM v2 GROUP BY code, side
        ),
        cum2 AS (
            SELECT date, code, side,
                   CAST(sum(c) OVER (PARTITION BY code, side
                        ORDER BY date
                        ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cumc,
                   CAST(row_number() OVER (PARTITION BY code, side
                        ORDER BY date) AS BIGINT) AS t
            FROM v2
        ),
        s2 AS (
            SELECT cum2.date, cum2.code, cum2.side, tot2.n,
                   abs(tot2.n * cum2.cumc - cum2.t * tot2.tc) AS abs_s
            FROM cum2 JOIN tot2 USING (code, side)
        ),
        p2 AS (
            SELECT code, side, date AS change_date, abs_s, n,
                   row_number() OVER (PARTITION BY code, side
                       ORDER BY abs_s DESC, date ASC) AS rk
            FROM s2
        ),
        w2 AS (SELECT * FROM p2 WHERE rk = 1 AND n >= 4)
        SELECT code, 1 AS level, 'all' AS segment, n AS n_seg,
               change_date,
               CAST(abs_s AS DOUBLE) / (100.0 * n) AS cusum_stat
        FROM w1
        UNION ALL
        SELECT code, 2, side, n, change_date,
               CAST(abs_s AS DOUBLE) / (100.0 * n)
        FROM w2
        ORDER BY code, level, segment
    """

    # the depth-skew twins reproduce their plain siblings bit-for-bit
    sql["ts_cusum_skew"] = sql["ts_cusum_changepoint"]

    sql["q_orphan_check"] = """
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_child,
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
                   AS n_orphans,
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT)
                   / CAST((SELECT count(*) FROM orders) AS BIGINT)
                   AS orphan_share
    """

    sql["ts_decompose"] = f"""
        WITH long AS ({_LONG}),
        t AS (
            SELECT date, code, value,
                   round(sum(value) OVER w13, 2)
                       / count(*) OVER w13 AS trend,
                   round(value, 2)
                   - round(sum(value) OVER w13, 2) / count(*) OVER w13
                       AS detrended
            FROM long
            WINDOW w13 AS (PARTITION BY code ORDER BY date
                           ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
        ),
        c AS (
            SELECT code, CAST(month(date) AS INT) AS m, date, detrended,
                   sum(detrended) OVER (
                       PARTITION BY code, month(date) ORDER BY date
                       ROWS UNBOUNDED PRECEDING) AS cs,
                   count(*) OVER (PARTITION BY code, month(date)) AS n,
                   row_number() OVER (
                       PARTITION BY code, month(date)
                       ORDER BY date DESC) AS rk
            FROM t
        ),
        s AS (SELECT code, m, cs / n AS seasonal FROM c WHERE rk = 1)
        SELECT t.date, t.code, round(t.value, 4) AS value, t.trend,
               s.seasonal, t.detrended - s.seasonal AS residual
        FROM t JOIN s ON t.code = s.code
               AND CAST(month(t.date) AS INT) = s.m
        ORDER BY t.date, t.code
    """

    # decompose CTEs verbatim, then variances via ordered cumsums;
    # sr/tr spelled as seasonal + (detrended - seasonal) etc. so the
    # float expression TREE (not just the algebra) matches Spark's
    sql["ts_seasonal_strength"] = f"""
        WITH long AS ({_LONG}),
        t AS (
            SELECT date, code, value,
                   round(sum(value) OVER w13, 2)
                       / count(*) OVER w13 AS trend,
                   round(value, 2)
                   - round(sum(value) OVER w13, 2) / count(*) OVER w13
                       AS detrended
            FROM long
            WINDOW w13 AS (PARTITION BY code ORDER BY date
                           ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
        ),
        c AS (
            SELECT code, CAST(month(date) AS INT) AS m, date, detrended,
                   sum(detrended) OVER (
                       PARTITION BY code, month(date) ORDER BY date
                       ROWS UNBOUNDED PRECEDING) AS cs,
                   count(*) OVER (PARTITION BY code, month(date)) AS n,
                   row_number() OVER (
                       PARTITION BY code, month(date)
                       ORDER BY date DESC) AS rk
            FROM t
        ),
        s AS (SELECT code, m, cs / n AS seasonal FROM c WHERE rk = 1),
        d AS (
            SELECT t.date, t.code,
                   t.detrended - s.seasonal AS r,
                   s.seasonal + (t.detrended - s.seasonal) AS sr,
                   t.trend + (t.detrended - s.seasonal) AS tr
            FROM t JOIN s ON t.code = s.code
                   AND CAST(month(t.date) AS INT) = s.m
        ),
        cs AS (
            SELECT code,
                   sum(r * r) OVER w AS rr, sum(r) OVER w AS r1,
                   sum(sr * sr) OVER w AS ss, sum(sr) OVER w AS s1,
                   sum(tr * tr) OVER w AS tt, sum(tr) OVER w AS t1,
                   CAST(count(*) OVER (PARTITION BY code) AS BIGINT) AS n,
                   row_number() OVER (
                       PARTITION BY code ORDER BY date DESC) AS rk
            FROM d
            WINDOW w AS (PARTITION BY code ORDER BY date
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT code, n AS n_obs,
               CASE WHEN ss / n - (s1 / n) * (s1 / n) > 0 THEN
                   greatest(0.0, 1.0 - (rr / n - (r1 / n) * (r1 / n))
                                     / (ss / n - (s1 / n) * (s1 / n)))
               END AS seasonal_strength,
               CASE WHEN tt / n - (t1 / n) * (t1 / n) > 0 THEN
                   greatest(0.0, 1.0 - (rr / n - (r1 / n) * (r1 / n))
                                     / (tt / n - (t1 / n) * (t1 / n)))
               END AS trend_strength
        FROM cs WHERE rk = 1 ORDER BY code
    """

    sql["ev_cuped_ab"] = """
        WITH span AS (
            SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
                   CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1
            FROM events
        ),
        ev AS (
            SELECT user_id,
                   datediff('day', span.d0,
                            CAST(date_trunc('day', ts) AS TIMESTAMP))
                       < floor(datediff('day', span.d0, span.d1) / 2) + 1
                       AS pre,
                   round(value, 2) AS v
            FROM events, span WHERE event_type = 'purchase'
        ),
        pu AS (
            SELECT user_id,
                   CAST(round(sum(CASE WHEN pre THEN v ELSE 0.0 END)
                              * 100) AS BIGINT) AS x,
                   CAST(round(sum(CASE WHEN NOT pre THEN v ELSE 0.0 END)
                              * 100) AS BIGINT) AS y
            FROM ev GROUP BY user_id
        ),
        pv0 AS (
            SELECT CASE WHEN CAST('0x' || substring(
                           md5('exp1:' || CAST(user_id AS VARCHAR)),
                           1, 4) AS INT) % 2 = 0
                        THEN 'control' ELSE 'treatment' END AS variant,
                   x, y
            FROM pu
        ),
        pv AS (
            SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
                   sum(CAST(x AS HUGEINT)) AS sx,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x AS HUGEINT) * y) AS sxy,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM pv0 GROUP BY variant
        ),
        pooled AS (
            SELECT variant, n_users, sx, sy,
                   sum(CAST(n_users AS HUGEINT)) OVER () AS n,
                   sum(sx) OVER () AS tsx, sum(sxx) OVER () AS tsxx,
                   sum(sy) OVER () AS tsy, sum(sxy) OVER () AS tsxy,
                   sum(syy) OVER () AS tsyy
            FROM pooled_src
        ),
        calc AS (
            SELECT variant, n_users,
                   CAST(sy AS DOUBLE)
                       / (100.0 * CAST(n_users AS DOUBLE)) AS mean_y,
                   CAST(sx AS DOUBLE)
                       / (100.0 * CAST(n_users AS DOUBLE)) AS mean_x,
                   (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0
                       AS xbar_all,
                   CAST(n * tsxy - tsx * tsy AS DOUBLE) AS num,
                   CAST(n * tsxx - tsx * tsx AS DOUBLE) AS denx,
                   CAST(n * tsyy - tsy * tsy AS DOUBLE) AS deny
            FROM pooled
        )
        SELECT variant, n_users, mean_y,
               mean_y - (CASE WHEN denx <> 0.0 THEN num / denx END)
                   * (mean_x - xbar_all) AS mean_y_adj,
               CASE WHEN denx <> 0.0 THEN num / denx END AS theta,
               CASE WHEN denx <> 0.0 AND deny <> 0.0
                    THEN num * num / (denx * deny) END AS var_reduction
        FROM calc ORDER BY variant
    """.replace("pooled_src", "pv")

    # DiD twin of the CUPED oracle: same span/assignment CTEs, only
    # first moments needed; means are DOUBLE(exact-int)/(100·DOUBLE(n))
    # guarded by the same CASE as Spark (empty variant -> NULL, not inf)
    sql["ev_diff_in_diff"] = """
        WITH span AS (
            SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
                   CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1
            FROM events
        ),
        ev AS (
            SELECT user_id,
                   datediff('day', span.d0,
                            CAST(date_trunc('day', ts) AS TIMESTAMP))
                       < floor(datediff('day', span.d0, span.d1) / 2) + 1
                       AS pre,
                   round(value, 2) AS v
            FROM events, span WHERE event_type = 'purchase'
        ),
        pu AS (
            SELECT user_id,
                   CAST(round(sum(CASE WHEN pre THEN v ELSE 0.0 END)
                              * 100) AS BIGINT) AS x,
                   CAST(round(sum(CASE WHEN NOT pre THEN v ELSE 0.0 END)
                              * 100) AS BIGINT) AS y
            FROM ev GROUP BY user_id
        ),
        pv0 AS (
            SELECT CASE WHEN CAST('0x' || substring(
                           md5('exp1:' || CAST(user_id AS VARCHAR)),
                           1, 4) AS INT) % 2 = 0
                        THEN 'control' ELSE 'treatment' END AS variant,
                   x, y
            FROM pu
        ),
        pv AS (
            SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
                   sum(CAST(x AS HUGEINT)) AS sx,
                   sum(CAST(y AS HUGEINT)) AS sy
            FROM pv0 GROUP BY variant
        ),
        one AS (
            SELECT
                CAST(coalesce(max(CASE WHEN variant = 'control'
                                  THEN n_users END), 0) AS BIGINT)
                    AS n_control,
                CAST(coalesce(max(CASE WHEN variant = 'treatment'
                                  THEN n_users END), 0) AS BIGINT)
                    AS n_treatment,
                max(CASE WHEN variant = 'control' THEN sx END) AS cx,
                max(CASE WHEN variant = 'control' THEN sy END) AS cy,
                max(CASE WHEN variant = 'treatment' THEN sx END) AS tx,
                max(CASE WHEN variant = 'treatment' THEN sy END) AS ty
            FROM pv
        ),
        means AS (
            SELECT n_control, n_treatment,
                   CASE WHEN n_control > 0 THEN CAST(cx AS DOUBLE)
                        / (100.0 * CAST(n_control AS DOUBLE)) END
                       AS mean_pre_control,
                   CASE WHEN n_control > 0 THEN CAST(cy AS DOUBLE)
                        / (100.0 * CAST(n_control AS DOUBLE)) END
                       AS mean_post_control,
                   CASE WHEN n_treatment > 0 THEN CAST(tx AS DOUBLE)
                        / (100.0 * CAST(n_treatment AS DOUBLE)) END
                       AS mean_pre_treatment,
                   CASE WHEN n_treatment > 0 THEN CAST(ty AS DOUBLE)
                        / (100.0 * CAST(n_treatment AS DOUBLE)) END
                       AS mean_post_treatment
            FROM one
        )
        SELECT n_control, n_treatment, mean_pre_control,
               mean_post_control, mean_pre_treatment,
               mean_post_treatment,
               (mean_post_treatment - mean_pre_treatment)
                   - (mean_post_control - mean_pre_control) AS did
        FROM means
    """

    sql["ev_kaplan_meier"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts)
                           > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sq,
                   ts
            FROM flagged
        ),
        spans AS (
            SELECT min(ts) AS s0, max(ts) AS s1
            FROM sess GROUP BY user_id, sq
        ),
        hz AS (SELECT max(ts) AS h FROM events),
        obs AS (
            SELECT CAST(date_diff('microsecond', s0, s1) // 60000000
                        AS BIGINT) AS t_minutes,
                   CAST(date_diff('microsecond', s1, hz.h)
                        >= 1800000000 AS INT) AS completed
            FROM spans, hz
        ),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM obs),
        per_t AS (
            SELECT t_minutes, CAST(sum(completed) AS BIGINT) AS n_ended,
                   CAST(count(*) AS BIGINT) AS leftc
            FROM obs GROUP BY t_minutes
        ),
        curve AS (
            SELECT t_minutes, n_ended,
                   nt.n - CAST(coalesce(sum(leftc) OVER (
                       ORDER BY t_minutes
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS n_at_risk
            FROM per_t, nt
        ),
        terms AS (
            SELECT t_minutes, n_at_risk, n_ended,
                   CASE WHEN n_ended > 0 AND n_ended < n_at_risk THEN
                       round(ln(1.0 - n_ended / n_at_risk), 6)
                   END AS term
            FROM curve
        )
        SELECT t_minutes, n_at_risk, n_ended,
               CASE WHEN n_ended < n_at_risk THEN
                   sum(term) OVER (ORDER BY t_minutes
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               END AS log_survival
        FROM terms
        WHERE n_ended > 0
        ORDER BY t_minutes
    """

    # Time-to-first-purchase KM twin: hour buckets via integer-micros
    # floor division (CLAUDE.md — DuckDB date_diff counts boundary
    # crossings, so neither engine uses it), ln terms snap to the
    # 1e-6 grid, the running sum is an ordered window (deterministic
    # accumulation), shipped raw. Never-converters are censored at
    # the corpus horizon.
    _KM_CONV_OBS = """
        hz AS (SELECT max(ts) AS h FROM events),
        users AS (
            SELECT user_id, min(ts) AS f,
                   min(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS conv
            FROM events GROUP BY user_id),
        obs AS (
            SELECT CAST((epoch_us(coalesce(conv, hz.h)) - epoch_us(f))
                        // 3600000000 AS BIGINT) AS t_hours,
                   CAST(conv IS NOT NULL AS INT) AS converted
            FROM users, hz),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM obs),
        per_t AS (
            SELECT t_hours,
                   CAST(sum(converted) AS BIGINT) AS n_converted,
                   CAST(count(*) AS BIGINT) AS ended
            FROM obs GROUP BY t_hours),
        curve AS (
            SELECT t_hours, n_converted,
                   nt.n - CAST(coalesce(sum(ended) OVER (
                       ORDER BY t_hours
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS n_at_risk
            FROM per_t, nt)
    """
    sql["ev_conversion_survival"] = ("""
        WITH """ + _KM_CONV_OBS + """,
        terms AS (
            SELECT t_hours, n_at_risk, n_converted,
                   CASE WHEN n_converted > 0
                        AND n_converted < n_at_risk THEN
                       round(ln(1.0 - n_converted / n_at_risk), 6)
                   END AS term
            FROM curve)
        SELECT t_hours, n_at_risk, n_converted,
               CASE WHEN n_converted < n_at_risk THEN
                   sum(term) OVER (ORDER BY t_hours
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               END AS log_survival
        FROM terms
        WHERE n_converted > 0
        ORDER BY t_hours
    """)

    # Nelson-Aalen: increments are int/int IEEE divisions (no ln at
    # all), ordered-window cumsum both engines accumulate identically;
    # zero-conversion rows contribute exact 0.0 so the WHERE (applied
    # before window functions in both engines) cannot shift the sums.
    sql["ev_hazard_cumulative"] = ("""
        WITH """ + _KM_CONV_OBS + """
        SELECT t_hours, n_at_risk, n_converted,
               sum(n_converted / n_at_risk) OVER cum AS cum_hazard,
               sum(n_converted / (n_at_risk * n_at_risk)) OVER cum
                   AS cum_hazard_var
        FROM curve
        WHERE n_converted > 0
        WINDOW cum AS (ORDER BY t_hours
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY t_hours
    """)

    # KS oracle: single-node DuckDB can afford the plain ordered
    # window the Spark side replaces with histogram_cumsum; window
    # sums of BIGINT return HUGEINT -> CAST before they reach the
    # divisions (comparator rule). Every emitted double is an int/int
    # quotient of identical bits.
    sql["stats_ks_two_sample"] = """
        WITH vals AS (
            SELECT CAST(round(round(o_totalprice, 2) * 100) AS BIGINT)
                       AS cents,
                   CASE WHEN o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END AS f
            FROM orders),
        per_v AS (
            SELECT cents, CAST(sum(f) AS BIGINT) AS n1_v,
                   CAST(sum(1 - f) AS BIGINT) AS n2_v
            FROM vals GROUP BY cents),
        tot AS (
            SELECT CAST(sum(n1_v) AS BIGINT) AS n1,
                   CAST(sum(n2_v) AS BIGINT) AS n2
            FROM per_v),
        cum AS (
            SELECT cents,
                   CAST(sum(n1_v) OVER w AS BIGINT) AS c1,
                   CAST(sum(n2_v) OVER w AS BIGINT) AS c2
            FROM per_v
            WINDOW w AS (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        d AS (
            SELECT cents, tot.n1, tot.n2,
                   CASE WHEN tot.n1 > 0 AND tot.n2 > 0 THEN
                       abs(c1 / tot.n1 - c2 / tot.n2) END AS dv
            FROM cum, tot)
        SELECT n1, n2, dv AS d_stat, cents AS at_cents,
               CASE WHEN n1 > 0 AND n2 > 0
                    THEN (n1 * n2) / (n1 + n2) END AS n_eff
        FROM d ORDER BY dv DESC, cents LIMIT 1
    """

    # Chi-square oracle: the cell terms are exact HUGEINT rationals
    # divided once as DOUBLE/DOUBLE, summed by an ordered window over
    # the bounded cell frame; the last ordered row carries the total.
    sql["stats_chi2_independence"] = """
        WITH cells AS (
            SELECT o_orderpriority AS p, o_orderstatus AS s,
                   CAST(count(*) AS BIGINT) AS o
            FROM orders GROUP BY 1, 2),
        t AS (
            SELECT p, s, o,
                   CAST(sum(o) OVER (PARTITION BY p) AS BIGINT) AS r,
                   CAST(sum(o) OVER (PARTITION BY s) AS BIGINT) AS c,
                   CAST(sum(o) OVER () AS BIGINT) AS n,
                   CAST(count(DISTINCT p) OVER () AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT s) OVER () AS BIGINT) AS n_cols
            FROM cells),
        terms AS (
            SELECT p, s, n, n_rows, n_cols,
                   CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
                        * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
                        AS DOUBLE)
                       / CAST(CAST(n AS HUGEINT) * r * c AS DOUBLE)
                       AS term
            FROM t),
        cum AS (
            SELECT p, s, n, n_rows, n_cols,
                   sum(term) OVER (ORDER BY p, s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                       ROW) AS chi2
            FROM terms)
        SELECT n, n_rows, n_cols,
               CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
               chi2
        FROM cum ORDER BY p DESC, s DESC LIMIT 1
    """

    # Mann-Whitney oracle: tie-averaged rank sums in HUGEINT (the
    # DuckDB twin of Spark's DECIMAL(38,0) — the t^3 term overflows
    # BIGINT near n ~ 3e6), variance as an exact rational cast to
    # DOUBLE, z via arithmetic + sqrt only.
    sql["stats_mann_whitney"] = """
        WITH vals AS (
            SELECT CAST(round(round(o_totalprice, 2) * 100) AS BIGINT)
                       AS cents,
                   CASE WHEN o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END AS f
            FROM orders),
        per_v AS (
            SELECT cents, CAST(sum(f) AS BIGINT) AS n1_v,
                   CAST(count(*) AS BIGINT) AS t_v
            FROM vals GROUP BY cents),
        cum AS (
            SELECT cents, n1_v, t_v,
                   CAST(sum(t_v) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                       ROW) AS HUGEINT) AS ct
            FROM per_v),
        agg AS (
            SELECT CAST(sum(n1_v) AS HUGEINT) AS n1,
                   CAST(sum(t_v) AS HUGEINT) AS n,
                   sum(CAST(n1_v AS HUGEINT)
                       * (2 * (ct - t_v) + t_v + 1)) AS r1x2,
                   sum(CAST(t_v AS HUGEINT) * t_v * t_v - t_v) AS st
            FROM cum),
        calc AS (
            SELECT n1, n - n1 AS n2,
                   r1x2 - n1 * (n1 + 1) AS u1x2,
                   CAST(n1 * (n - n1)
                        * ((n + 1) * n * (n - 1) - st) AS DOUBLE)
                       AS vnum,
                   CAST(12 * n * (n - 1) AS DOUBLE) AS vden
            FROM agg)
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CAST(u1x2 AS DOUBLE) / 2.0 AS u_stat,
               CASE WHEN n1 > 0 AND n2 > 0 AND vnum > 0 THEN
                   (CAST(u1x2 AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
                       / (2.0 * sqrt(vnum / vden)) END AS z_score
        FROM calc
    """

    sql["q_revenue_gini"] = """
        WITH cents AS (
            SELECT o_custkey,
                   CAST(round(round(sum(o_totalprice), 2) * 100)
                        AS BIGINT) AS c
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT c, CAST(row_number() OVER (ORDER BY c, o_custkey)
                           AS BIGINT) AS i
            FROM cents
        ),
        g AS (
            SELECT CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(c) AS BIGINT) AS total_cents,
                   sum(CAST(i * c AS HUGEINT)) AS iw
            FROM ranked
        )
        SELECT n_customers, total_cents,
               (2.0 * CAST(iw AS DOUBLE)
                - CAST(n_customers + 1 AS DOUBLE)
                  * CAST(total_cents AS DOUBLE))
               / (CAST(n_customers AS DOUBLE)
                  * CAST(total_cents AS DOUBLE)) AS gini
        FROM g
    """

    sql["q_benford_digits"] = """
        WITH d AS (
            SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
                       AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders WHERE o_totalprice > 0
        ),
        base AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
                 FROM d GROUP BY digit),
        w1 AS (
            SELECT digit, n,
                   CAST(sum(n) OVER () AS BIGINT) AS tn,
                   round(log10(1 + 1.0 / digit), 6) AS p
            FROM base
        ),
        staged AS (
            SELECT digit, n, tn, p,
                   sum((n - tn * p) * (n - tn * p) / (tn * p)) OVER (
                       ORDER BY digit
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS c2,
                   row_number() OVER (ORDER BY digit DESC) AS rk
            FROM w1
        ),
        chi AS (SELECT c2 AS chi2 FROM staged WHERE rk = 1)
        SELECT digit, n, n / tn AS share, p AS benford_share, chi.chi2
        FROM w1, chi ORDER BY digit
    """

    # Markov removal-effect attribution: truncated session paths →
    # edge counts, then 12 absorption rounds UNROLLED over a
    # (state × removed-channel) grid in bigint micro-units — the
    # pagerank/kcore oracle pattern, MATERIALIZED so CTEs expand once
    _ma = ["""
        flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts)
                           > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, event_id, event_type,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sq
            FROM flagged
        ),
        rn AS (
            SELECT user_id, sq, event_type,
                   row_number() OVER (
                       PARTITION BY user_id, sq ORDER BY ts, event_id)
                       AS rn
            FROM sess
        ),
        cp AS (SELECT user_id, sq, min(rn) AS cp FROM rn
               WHERE event_type = 'purchase' GROUP BY 1, 2),
        r2 AS MATERIALIZED (
            SELECT rn.user_id, rn.sq, rn.rn, rn.event_type
            FROM rn LEFT JOIN cp
              ON rn.user_id = cp.user_id AND rn.sq = cp.sq
            WHERE cp.cp IS NULL OR rn.rn <= cp.cp
        ),
        inner_e AS (
            SELECT coalesce(lag(event_type) OVER (
                       PARTITION BY user_id, sq ORDER BY rn),
                       '__START__') AS src,
                   event_type AS dst
            FROM r2
        ),
        last_e AS (
            SELECT event_type AS src,
                   CASE WHEN event_type = 'purchase' THEN '__CONV__'
                        ELSE '__NULL__' END AS dst
            FROM (SELECT user_id, sq, rn, event_type,
                         max(rn) OVER (PARTITION BY user_id, sq) AS mx
                  FROM r2)
            WHERE rn = mx
        ),
        edges AS MATERIALIZED (
            SELECT src, dst, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT * FROM inner_e UNION ALL SELECT * FROM last_e)
            GROUP BY 1, 2
        ),
        ch AS MATERIALIZED (
            SELECT DISTINCT event_type AS removed FROM r2
            WHERE event_type <> 'purchase'
            UNION ALL SELECT '__none__'
        ),
        etot AS (SELECT src, CAST(sum(c) AS BIGINT) AS ct
                 FROM edges GROUP BY src),
        ge AS MATERIALIZED (
            SELECT e.src,
                   CASE WHEN e.dst = ch.removed THEN '__NULL__'
                        ELSE e.dst END AS dst_eff,
                   e.c, t.ct, ch.removed
            FROM edges e JOIN etot t ON e.src = t.src CROSS JOIN ch
        ),
        sg AS MATERIALIZED (
            SELECT state, removed FROM
                (SELECT DISTINCT state FROM
                    (SELECT src AS state FROM edges
                     UNION ALL SELECT dst FROM edges))
            CROSS JOIN ch
        ),
        p0 AS MATERIALIZED (
            SELECT state, removed,
                   CAST(CASE WHEN state = '__CONV__' THEN 1000000
                             ELSE 0 END AS BIGINT) AS p
            FROM sg
        )"""]
    for _r in range(1, 13):
        _ma.append(f"""
        p{_r} AS MATERIALIZED (
            SELECT sg.state, sg.removed,
                   CAST(CASE WHEN sg.state = '__CONV__' THEN 1000000
                             WHEN sg.state = '__NULL__' THEN 0
                             ELSE coalesce(cb.pn, 0) END AS BIGINT) AS p
            FROM sg LEFT JOIN (
                SELECT ge.src AS state, ge.removed,
                       CAST(sum(ge.c * pv.p // ge.ct) AS BIGINT) AS pn
                FROM ge JOIN p{_r - 1} pv
                  ON pv.state = ge.dst_eff AND pv.removed = ge.removed
                GROUP BY 1, 2) cb
              ON cb.state = sg.state AND cb.removed = sg.removed
        )""")
    sql["ev_markov_attribution"] = ("WITH " + ",".join(_ma) + """
        SELECT r.removed AS channel,
               b.p AS p_base_micro, r.p AS p_removed_micro,
               CASE WHEN b.p > 0 THEN 1.0 - r.p / b.p END
                   AS removal_effect
        FROM p12 r, p12 b
        WHERE r.state = '__START__' AND r.removed <> '__none__'
          AND b.state = '__START__' AND b.removed = '__none__'
        ORDER BY channel
    """)

    sql["text_source_jsd"] = f"""
        WITH tok AS (SELECT source, unnest({_TOKENS}) AS t FROM documents),
        ps AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
               FROM tok GROUP BY 1, 2),
        st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens
               FROM ps GROUP BY source),
        vc AS (SELECT t, CAST(sum(c) AS BIGINT) AS gc FROM ps GROUP BY t),
        gtot AS (SELECT CAST(sum(gc) AS BIGINT) AS gt FROM vc),
        spine AS (
            SELECT st.source, vc.t, st.n_tokens,
                   CAST(coalesce(ps.c, 0) AS BIGINT) AS c, vc.gc, gtot.gt
            FROM st CROSS JOIN vc CROSS JOIN gtot
            LEFT JOIN ps ON ps.source = st.source AND ps.t = vc.t
        ),
        terms AS (
            SELECT source, t, n_tokens,
                   CASE WHEN c > 0 THEN
                       (c / n_tokens) * round(ln((c / n_tokens)
                           / (((c / n_tokens) + (gc / gt)) / 2)), 6)
                   ELSE 0.0 END AS pt,
                   (gc / gt) * round(ln((gc / gt)
                       / (((c / n_tokens) + (gc / gt)) / 2)), 6) AS gterm
            FROM spine
        ),
        cs AS (
            SELECT source, n_tokens,
                   sum(pt) OVER w AS sp, sum(gterm) OVER w AS sg,
                   row_number() OVER (
                       PARTITION BY source ORDER BY t DESC) AS rk
            FROM terms
            WINDOW w AS (PARTITION BY source ORDER BY t
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT source, n_tokens, 0.5 * sp + 0.5 * sg AS jsd
        FROM cs WHERE rk = 1 ORDER BY source
    """

    sql["ev_decay_value"] = """
        WITH ev AS (SELECT user_id, ts, event_id, round(value, 2) AS v
                    FROM events WHERE event_type = 'purchase'),
        mx AS (SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS m
               FROM ev),
        aged AS (
            SELECT user_id, ts, event_id,
                   v * round(pow(2.0, -CAST(datediff('day',
                           CAST(date_trunc('day', ts) AS TIMESTAMP), mx.m)
                           AS BIGINT) / 30.0), 6) AS dv
            FROM ev, mx
        ),
        cs AS (
            SELECT user_id,
                   sum(dv) OVER w AS decayed_value,
                   CAST(count(*) OVER w AS BIGINT) AS n_events,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rk
            FROM aged
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT user_id, n_events, decayed_value
        FROM cs WHERE rk = 1
        ORDER BY decayed_value DESC, user_id LIMIT 100
    """

    # DuckDB dayofweek is 0=Sunday..6; Spark is 1..7 — +1 aligns
    sql["ev_weekday_profile"] = """
        WITH base AS (
            SELECT event_type, CAST(dayofweek(ts) AS INT) + 1 AS dow,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        w1 AS (SELECT event_type, dow, n,
                      CAST(sum(n) OVER (PARTITION BY event_type)
                           AS BIGINT) AS tn
               FROM base),
        w2 AS (SELECT event_type, dow, n, tn,
                      CAST(sum((7 * n - tn) * (7 * n - tn))
                           OVER (PARTITION BY event_type) AS BIGINT) AS s2
               FROM w1)
        SELECT event_type, dow, n,
               n / tn AS share,
               s2 / (7 * tn) AS chi2
        FROM w2 ORDER BY event_type, dow
    """

    sql["ev_activity_powerlaw"] = """
        WITH deg AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS d
            FROM events GROUP BY user_id
        ),
        t AS (SELECT d, round(ln(d * 2.0), 6) AS l FROM deg),
        g AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(d) AS BIGINT) AS total_events,
                   CAST(max(d) AS BIGINT) AS max_events,
                   round(sum(l), 6) AS ls
            FROM t
        )
        SELECT n_keys, total_events, max_events,
               total_events / n_keys AS mean_events,
               1.0 + n_keys / NULLIF(ls, 0) AS alpha
        FROM g
    """

    sql["ts_rebase_index"] = f"""
        WITH long AS ({_LONG}),
        g AS (SELECT date, code, value, round(value, 2) AS v FROM long),
        b AS (
            SELECT code, v AS base FROM g
            WHERE date = TIMESTAMP '1996-01-05'
        )
        SELECT g.date, g.code, round(g.value, 4) AS value,
               100.0 * g.v / b.base AS index_value
        FROM g LEFT JOIN b ON g.code = b.code
        ORDER BY g.date, g.code
    """

    sql["catalog_coverage"] = """
        WITH pt AS (
            SELECT p_type, CAST(count(*) AS BIGINT) AS n_codes
            FROM part GROUP BY p_type
        ),
        li AS (
            SELECT p.p_type, l.l_partkey, l.l_shipdate
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        obs AS (
            SELECT p_type,
                   CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_active,
                   min(l_shipdate) AS first_obs,
                   max(l_shipdate) AS last_obs,
                   CAST(count(*) AS BIGINT) AS n_obs
            FROM li GROUP BY p_type
        )
        SELECT pt.p_type, pt.n_codes,
               COALESCE(obs.n_active, 0) AS n_active,
               obs.first_obs, obs.last_obs,
               COALESCE(obs.n_obs, 0) AS n_obs
        FROM pt LEFT JOIN obs ON pt.p_type = obs.p_type
        ORDER BY pt.p_type
    """

    sql["ts_beta"] = f"""
        WITH long AS ({_LONG}),
        y AS (SELECT date, value AS vy FROM long WHERE code = 'AF'),
        x AS (SELECT date, value AS vx FROM long WHERE code = 'NO'),
        j AS (SELECT y.vy, x.vx FROM y JOIN x ON y.date = x.date),
        a AS (
            SELECT CAST(count(*) AS BIGINT) AS n_obs,
                   round(covar_samp(vy, vx) / var_samp(vx), 6) AS beta,
                   round(sum(vy), 2) / count(*) AS my,
                   round(sum(vx), 2) / count(*) AS mx
            FROM j
        )
        SELECT n_obs, beta, my - beta * mx AS intercept FROM a
    """

    sql["ts_rolling_median"] = f"""
        WITH long AS ({_LONG}),
        v AS (SELECT date, code, round(value, 4) AS value FROM long),
        wv AS (
            SELECT date, code, value,
                   list_sort(list(value) OVER w) AS s,
                   CAST(count(*) OVER w AS BIGINT) AS n
            FROM v
            WINDOW w AS (PARTITION BY code ORDER BY date
                         ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)
        )
        SELECT date, code, value,
               (s[CAST((n + 1) // 2 AS INT)]
                + s[CAST(n // 2 + 1 AS INT)]) / 2 AS roll_median
        FROM wv ORDER BY code, date
    """

    sql["ts_theil_sen"] = f"""
        WITH long AS ({_LONG}),
        m AS (
            SELECT date_trunc('month', date) AS period, code,
                   CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS yc
            FROM long GROUP BY 1, 2
        ),
        xr AS (
            SELECT code,
                   CAST(row_number() OVER (PARTITION BY code ORDER BY period)
                        AS BIGINT) AS x, yc
            FROM m
        ),
        g AS (
            SELECT code, CAST(count(*) AS BIGINT) AS n_months,
                   list(x ORDER BY x) AS xs, list(yc ORDER BY x) AS ys
            FROM xr GROUP BY code
        ),
        s AS (
            -- bigint/bigint pairwise slopes, sorted; median below is
            -- the same two-element formula as the Spark side
            SELECT code, n_months,
                   list_sort(flatten(list_transform(range(1, len(xs) + 1),
                       i -> list_transform(range(i + 1, len(xs) + 1),
                           j -> (ys[j] - ys[i]) / (xs[j] - xs[i]))))) AS sl
            FROM g
        )
        SELECT code, n_months,
               CASE WHEN len(sl) >= 1 THEN
                   (sl[CAST((len(sl) + 1) // 2 AS INT)]
                    + sl[CAST(len(sl) // 2 + 1 AS INT)]) / 2 / 100
               END AS sen_slope
        FROM s ORDER BY code
    """

    sql["ts_rolling_mad"] = f"""
        WITH long AS ({_LONG}),
        v AS (SELECT date, code, round(value, 4) AS value FROM long),
        wv AS (
            SELECT date, code, value,
                   list_sort(list(value) OVER w) AS s,
                   CAST(count(*) OVER w AS BIGINT) AS n
            FROM v
            WINDOW w AS (PARTITION BY code ORDER BY date
                         ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)
        ),
        med AS (
            SELECT date, code, value, s, n,
                   (s[CAST((n + 1) // 2 AS INT)]
                    + s[CAST(n // 2 + 1 AS INT)]) / 2 AS roll_med
            FROM wv
        ),
        mad AS (
            SELECT date, code, value, roll_med, n,
                   list_sort(list_transform(s, x -> abs(x - roll_med))) AS d
            FROM med
        ),
        fin AS (
            SELECT date, code, value, roll_med,
                   (d[CAST((n + 1) // 2 AS INT)]
                    + d[CAST(n // 2 + 1 AS INT)]) / 2 AS roll_mad
            FROM mad
        )
        SELECT date, code, value, roll_med, roll_mad,
               CAST(abs(value - roll_med) > 3.5 * 1.4826 * roll_mad
                    AS INT) AS is_anomaly
        FROM fin ORDER BY code, date
    """

    sql["ts_ols_trend"] = f"""
        WITH long AS ({_LONG}),
        xr AS (
            SELECT code,
                   CAST(row_number() OVER (PARTITION BY code ORDER BY date)
                        AS BIGINT) AS x,
                   CAST(round(value * 100) AS BIGINT) AS yc
            FROM long
        ),
        s AS (
            SELECT code, CAST(count(*) AS HUGEINT) AS n,
                   sum(x) AS sx, sum(x * x) AS sxx,
                   sum(yc) AS sy, sum(x * yc) AS sxy,
                   sum(CAST(yc AS HUGEINT) * yc) AS syy
            FROM xr GROUP BY code
        ),
        c AS (
            -- each normal-equation term is an EXACT integer (HUGEINT),
            -- converted to double once — identical bits to Spark's
            -- DECIMAL(38,0) route; slope/intercept/r2 then ship raw
            SELECT code, CAST(n AS BIGINT) AS n_obs,
                   CAST(n * sxy - sx * sy AS DOUBLE) AS num,
                   CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
                   CAST(n * syy - sy * sy AS DOUBLE) AS deny,
                   CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                   CAST(n AS DOUBLE) AS nd
            FROM s
        )
        SELECT code, n_obs,
               CASE WHEN denx != 0 THEN num / denx / 100.0 END AS slope,
               syd / (100.0 * nd)
                   - (CASE WHEN denx != 0 THEN num / denx / 100.0 END)
                     * (sxd / nd) AS intercept,
               CASE WHEN denx != 0 AND deny != 0
                    THEN num * num / (denx * deny) END AS r2
        FROM c ORDER BY code
    """

    sql["text_zipf_fit"] = f"""
        WITH toks AS (
            SELECT lang, unnest({_TOKENS}) AS token FROM documents
        ),
        f AS (
            SELECT lang, token, CAST(count(*) AS BIGINT) AS freq
            FROM toks GROUP BY 1, 2
        ),
        r AS (
            SELECT lang, freq,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY freq DESC, token)
                        AS BIGINT) AS rnk
            FROM f
        ),
        -- ln rounded onto the 1e-6 micro grid -> exact integers; the
        -- whole regression then runs in HUGEINT, mirroring Spark's
        -- DECIMAL(38,0) fixed-point OLS core bit-for-bit
        m AS (
            SELECT lang,
                   CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000)
                        AS BIGINT) AS x,
                   CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000)
                        AS BIGINT) AS y
            FROM r
        ),
        s AS (
            SELECT lang, CAST(count(*) AS HUGEINT) AS n,
                   sum(x) AS sx, sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(y) AS sy, sum(CAST(x AS HUGEINT) * y) AS sxy,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM m GROUP BY lang
        ),
        c AS (
            SELECT lang, CAST(n AS BIGINT) AS n_types,
                   CAST(n * sxy - sx * sy AS DOUBLE) AS num,
                   CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
                   CAST(n * syy - sy * sy AS DOUBLE) AS deny,
                   CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                   CAST(n AS DOUBLE) AS nd
            FROM s
        )
        SELECT lang, n_types,
               CASE WHEN denx != 0 THEN num / denx / 1.0 END AS slope,
               syd / (1000000.0 * nd)
                   - (CASE WHEN denx != 0 THEN num / denx / 1.0 END)
                     * (sxd / (1000000.0 * nd)) AS intercept,
               CASE WHEN denx != 0 AND deny != 0
                    THEN num * num / (denx * deny) END AS r2
        FROM c ORDER BY lang
    """

    sql["q_sales_cube"] = """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(GROUPING(l_returnflag, l_linestatus, year(l_shipdate))
                    AS BIGINT) AS grp_id,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus, year(l_shipdate))
        ORDER BY grp_id, returnflag NULLS FIRST, linestatus NULLS FIRST,
                 ship_year NULLS FIRST
    """

    sql["q_cohort_ltv"] = """
        WITH first AS (
            SELECT o_custkey,
                   CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP)
                       AS cohort
            FROM orders GROUP BY 1
        ),
        enriched AS (
            SELECT o.o_custkey, f.cohort,
                   CAST((year(o.o_orderdate) - year(f.cohort)) * 12
                        + (month(o.o_orderdate) - month(f.cohort))
                        AS BIGINT) AS month_index,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders o JOIN first f USING (o_custkey)
        ),
        sizes AS (
            SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
            FROM first GROUP BY 1
        ),
        cells AS (
            SELECT cohort, month_index,
                   CAST(sum(cents) AS BIGINT) AS rev_cents
            FROM enriched GROUP BY 1, 2
        ),
        cum AS (
            SELECT cohort, month_index, rev_cents,
                   CAST(sum(rev_cents) OVER (PARTITION BY cohort
                       ORDER BY month_index
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_cents
            FROM cells
        )
        SELECT c.cohort, c.month_index, s.n_customers,
               CAST(c.rev_cents AS DOUBLE) / 100.0 AS revenue,
               CAST(c.cum_cents AS DOUBLE) / 100.0 AS cum_revenue,
               (CAST(c.cum_cents AS DOUBLE) / 100.0) / s.n_customers
                   AS ltv_per_customer
        FROM cum c JOIN sizes s USING (cohort)
        ORDER BY c.cohort, c.month_index
    """

    sql["q_customer_migration"] = """
        WITH sa AS (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
        ),
        ta AS (
            SELECT o_custkey,
                   CAST(ntile(4) OVER (ORDER BY cents, o_custkey)
                        AS BIGINT) AS tier_from
            FROM sa
        ),
        sb AS (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
        ),
        tb AS (
            SELECT o_custkey,
                   CAST(ntile(4) OVER (ORDER BY cents, o_custkey)
                        AS BIGINT) AS tier_to
            FROM sb
        )
        SELECT tier_from, tier_to, CAST(count(*) AS BIGINT) AS n_customers
        FROM ta FULL OUTER JOIN tb USING (o_custkey)
        GROUP BY 1, 2
        ORDER BY tier_from NULLS FIRST, tier_to NULLS FIRST
    """

    sql["text_readability"] = f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_words,
                   CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                        AS BIGINT) AS n_sentences,
                   CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS BIGINT) AS n_syllables
            FROM documents
        ),
        r AS (
            SELECT *,
                   CAST(n_words AS DOUBLE) / n_sentences AS wps,
                   CAST(n_syllables AS DOUBLE) / greatest(n_words, 1) AS spw
            FROM base
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               wps AS words_per_sentence, spw AS syllables_per_word,
               206.835 - 1.015 * wps - 84.6 * spw AS flesch,
               0.39 * wps + 11.8 * spw - 15.59 AS fk_grade
        FROM r ORDER BY doc_id
    """

    sql["ev_bot_regularity"] = """
        WITH g0 AS (
            SELECT user_id,
                   CAST(epoch_us(ts) AS BIGINT)
                   - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id)
                       AS dus
            FROM events
        ),
        g AS (SELECT user_id, dus // 1000000 AS gp
              FROM g0 WHERE dus IS NOT NULL),
        s AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(gp) AS BIGINT) AS sg,
                   sum(CAST(gp AS HUGEINT) * gp) AS q
            FROM g GROUP BY user_id HAVING count(*) >= 20
        )
        SELECT user_id, n_gaps,
               CAST(sg AS DOUBLE) / n_gaps AS mean_gap_s,
               CASE WHEN sg != 0
                    THEN sqrt(CAST(CAST(n_gaps AS HUGEINT) * q
                                   - CAST(sg AS HUGEINT) * sg AS DOUBLE))
                         / CAST(sg AS DOUBLE) END AS cv,
               CAST(10000 * (CAST(n_gaps AS HUGEINT) * q
                             - CAST(sg AS HUGEINT) * sg)
                    <= 100 * CAST(sg AS HUGEINT) * sg AS BIGINT) AS is_bot
        FROM s ORDER BY user_id
    """

    sql["ev_rfm_scores"] = """
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        u AS (
            SELECT user_id,
                   CAST(date_diff('day', max(CAST(ts AS DATE)),
                        (SELECT max(CAST(ts AS DATE)) FROM p))
                        AS BIGINT) AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS mc
            FROM p GROUP BY user_id
        ),
        t AS (
            SELECT user_id, recency_days, frequency, mc,
                   CAST(ntile(4) OVER (ORDER BY recency_days DESC, user_id)
                        AS BIGINT) AS r_score,
                   CAST(ntile(4) OVER (ORDER BY frequency, user_id)
                        AS BIGINT) AS f_score,
                   CAST(ntile(4) OVER (ORDER BY mc, user_id)
                        AS BIGINT) AS m_score
            FROM u
        )
        SELECT user_id, recency_days, frequency,
               CAST(mc AS DOUBLE) / 100.0 AS monetary,
               r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS rfm
        FROM t ORDER BY user_id
    """

    sql["text_lang_purity"] = f"""
        WITH toks AS (
            SELECT doc_id, source, lang, {_TOKENS} AS t,
                   CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g'))
                        AS DOUBLE)
                       / greatest(length(text), 1) AS cjk_ratio
            FROM documents
        ),
        hits AS (
            SELECT doc_id, source, lang, cjk_ratio,
                   {_sw_hits("en").replace(_TOKENS, "t")} AS h_en,
                   {_sw_hits("es").replace(_TOKENS, "t")} AS h_es,
                   {_sw_hits("de").replace(_TOKENS, "t")} AS h_de,
                   {_sw_hits("fr").replace(_TOKENS, "t")} AS h_fr
            FROM toks
        ),
        pred AS (
            SELECT source, lang,
                   CASE WHEN cjk_ratio > 0.2 THEN 'zh'
                        WHEN greatest(h_en, h_es, h_de, h_fr) > 0
                             AND h_en = greatest(h_en, h_es, h_de, h_fr)
                             THEN 'en'
                        WHEN greatest(h_en, h_es, h_de, h_fr) > 0
                             AND h_es = greatest(h_en, h_es, h_de, h_fr)
                             THEN 'es'
                        WHEN greatest(h_en, h_es, h_de, h_fr) > 0
                             AND h_de = greatest(h_en, h_es, h_de, h_fr)
                             THEN 'de'
                        WHEN greatest(h_en, h_es, h_de, h_fr) > 0
                             AND h_fr = greatest(h_en, h_es, h_de, h_fr)
                             THEN 'fr'
                        ELSE 'und' END AS lang_pred
            FROM hits
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match,
               CAST(sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END)
                    AS BIGINT) / CAST(count(*) AS BIGINT) AS purity
        FROM pred GROUP BY source ORDER BY source
    """

    sql["ev_gap_stats"] = """
        WITH g AS (
            SELECT event_type,
                   date_diff('microsecond',
                             lag(ts) OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts, event_id),
                             ts) AS gap
            FROM events
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
               quantile_cont(gap, 0.5) AS p50_gap_us,
               quantile_cont(gap, 0.9) AS p90_gap_us
        FROM g WHERE gap IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """

    sql["ts_max_drawdown"] = f"""
        WITH long AS ({_LONG}),
        g AS (SELECT date, code, round(value, 2) AS v FROM long),
        r AS (
            SELECT date, code, v,
                   max(v) OVER (PARTITION BY code ORDER BY date
                                ROWS UNBOUNDED PRECEDING) AS peak
            FROM g
        ),
        d AS (
            SELECT *, v / peak - 1 AS dd,
                   row_number() OVER (
                       PARTITION BY code ORDER BY v / peak - 1 ASC,
                       date ASC) AS rk
            FROM r
        )
        SELECT code, date AS trough_date, peak AS peak_value,
               v AS trough_value, dd AS max_drawdown
        FROM d WHERE rk = 1 ORDER BY code
    """

    sql["ev_attribution_first"] = """
        WITH t AS (
            SELECT event_id, user_id, ts, event_type,
                   min(CASE WHEN event_type = 'view' THEN ts END) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(epoch_us(ts) AS BIGINT)
                       RANGE BETWEEN 86400000000 PRECEDING
                             AND 1 PRECEDING) AS touch_ts
            FROM events
        )
        SELECT event_id, user_id, ts AS conv_ts, touch_ts,
               touch_ts IS NOT NULL AS attributed
        FROM t WHERE event_type = 'purchase' ORDER BY event_id
    """

    sql["ts_xcorr"] = f"""
        WITH long AS ({_LONG}),
        a AS (SELECT date, value AS va FROM long WHERE code = 'AF'),
        b AS (SELECT date, value AS vb FROM long WHERE code = 'NO'),
        j AS (SELECT a.date, a.va, b.vb FROM a JOIN b ON a.date = b.date),
        s AS (
            SELECT va,
                   lag(vb, 2) OVER w AS s0,
                   lag(vb, 1) OVER w AS s1,
                   vb AS s2,
                   lead(vb, 1) OVER w AS s3,
                   lead(vb, 2) OVER w AS s4
            FROM j WINDOW w AS (ORDER BY date)
        ),
        p AS (
            SELECT -2 AS lag_k, va, s0 AS b_shift FROM s
            UNION ALL SELECT -1, va, s1 FROM s
            UNION ALL SELECT 0, va, s2 FROM s
            UNION ALL SELECT 1, va, s3 FROM s
            UNION ALL SELECT 2, va, s4 FROM s
        )
        SELECT lag_k, CAST(count(*) AS BIGINT) AS n_pairs,
               round(corr(va, b_shift), 6) AS xcorr
        FROM p WHERE b_shift IS NOT NULL
        GROUP BY lag_k ORDER BY lag_k
    """

    sql["dedup_threshold_sweep"] = """
        WITH norm AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
            FROM documents
        ),
        sh AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(length(s) - 2, 1) + 1),
                       i -> substr(s, CAST(i AS INT), 3)))) AS sh
            FROM norm
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        df_ok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 200),
        shf AS (SELECT sh.* FROM sh JOIN df_ok USING (sh)),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        jac AS (
            SELECT CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS j
            FROM pairs
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.15
        ),
        c AS (
            SELECT
                CAST(sum(CASE WHEN j >= 0.15 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
                CAST(sum(CASE WHEN j >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
                CAST(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
                CAST(sum(CASE WHEN j >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
                CAST(sum(CASE WHEN j >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS b4
            FROM jac
        )
        SELECT CAST(0.15 AS DOUBLE) AS threshold, b0 AS n_pairs FROM c
        UNION ALL SELECT CAST(0.3 AS DOUBLE), b1 FROM c
        UNION ALL SELECT CAST(0.5 AS DOUBLE), b2 FROM c
        UNION ALL SELECT CAST(0.7 AS DOUBLE), b3 FROM c
        UNION ALL SELECT CAST(0.9 AS DOUBLE), b4 FROM c
        ORDER BY threshold
    """

    sql["q13_order_distribution"] = """
        WITH pc AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS c_count
            FROM orders GROUP BY o_custkey
        )
        SELECT COALESCE(pc.c_count, 0) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM customer c LEFT JOIN pc ON c.c_custkey = pc.o_custkey
        GROUP BY COALESCE(pc.c_count, 0)
        ORDER BY custdist DESC, c_count DESC
    """

    sql["q22_rich_inactive"] = """
        WITH avg_bal AS (
            SELECT round(sum(c_acctbal), 2) / count(*) AS a
            FROM customer WHERE c_acctbal > 0
        ),
        active AS (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        )
        SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_custs,
               round(sum(c.c_acctbal), 2) AS total_bal
        FROM customer c CROSS JOIN avg_bal
        WHERE c.c_acctbal > avg_bal.a
          AND NOT EXISTS (SELECT 1 FROM active a
                          WHERE a.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey ORDER BY c.c_nationkey
    """

    sql["q17_small_qty_revenue"] = """
        WITH pp AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
        lip AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice,
                   l.l_discount
            FROM lineitem l JOIN pp ON l.l_partkey = pp.p_partkey
        ),
        a AS (
            SELECT l_partkey,
                   round(sum(l_quantity), 2) / count(*) AS avg_qty
            FROM lip GROUP BY l_partkey
        )
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                   AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lip l JOIN a ON l.l_partkey = a.l_partkey
        WHERE l.l_quantity < 0.5 * a.avg_qty
    """

    sql["q18_large_orders"] = """
        WITH t AS (
            SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 150
        )
        SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_orderdate,
               t.total_qty
        FROM t JOIN orders o ON t.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY t.total_qty DESC, o.o_orderkey ASC LIMIT 20
    """

    sql["ts_acf"] = f"""
        WITH long AS ({_LONG}),
        l AS (
            SELECT code, value,
                   lag(value, 1) OVER w AS _lag1,
                   lag(value, 2) OVER w AS _lag2,
                   lag(value, 3) OVER w AS _lag3
            FROM long WINDOW w AS (PARTITION BY code ORDER BY date)
        ),
        p AS (
            SELECT code, 1 AS lag_k, value, _lag1 AS prev FROM l
            UNION ALL SELECT code, 2, value, _lag2 FROM l
            UNION ALL SELECT code, 3, value, _lag3 FROM l
        )
        SELECT code, lag_k, CAST(count(*) AS BIGINT) AS n_pairs,
               round(corr(value, prev), 6) AS acf
        FROM p WHERE prev IS NOT NULL
        GROUP BY code, lag_k ORDER BY code, lag_k
    """

    sql["ev_power_users"] = """
        WITH pu AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        ),
        t AS (
            SELECT n_events,
                   ntile(10) OVER (ORDER BY n_events DESC, user_id ASC)
                       AS tile
            FROM pu
        ),
        pt AS (
            SELECT tile, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(n_events) AS BIGINT) AS n_events
            FROM t GROUP BY tile
        )
        SELECT CAST(tile AS INT) AS tile, n_users, n_events,
               n_events / CAST(sum(n_events) OVER () AS BIGINT) AS share,
               CAST(sum(n_events) OVER (ORDER BY tile
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   / CAST(sum(n_events) OVER () AS BIGINT) AS cum_share
        FROM pt ORDER BY tile
    """

    sql["q15_top_supplier"] = """
        WITH rev AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        ),
        mx AS (SELECT max(total_revenue) AS m FROM rev)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM rev r CROSS JOIN mx
        JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_revenue = mx.m
        ORDER BY s.s_suppkey
    """

    sql["dedup_impact_report"] = f"""
        WITH keyed AS (
            SELECT doc_id, source, n_chars, {_HFP} AS fp FROM documents
        ),
        keep AS (SELECT min(doc_id) AS doc_id FROM keyed GROUP BY fp),
        surv AS (
            SELECT k.* FROM keyed k JOIN keep ON k.doc_id = keep.doc_id
        ),
        b AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs_before,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars_before
            FROM keyed GROUP BY source
        ),
        a AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs_after,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars_after
            FROM surv GROUP BY source
        )
        SELECT b.source, b.n_docs_before,
               COALESCE(a.n_docs_after, 0) AS n_docs_after,
               b.n_chars_before,
               COALESCE(a.n_chars_after, 0) AS n_chars_after,
               (b.n_docs_before - COALESCE(a.n_docs_after, 0))
                   / b.n_docs_before AS docs_removed_share
        FROM b LEFT JOIN a ON b.source = a.source
        ORDER BY b.source
    """

    sql["ev_active_users"] = """
        WITH days AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        dau AS (
            SELECT day, CAST(count(*) AS BIGINT) AS dau
            FROM days GROUP BY day
        ),
        span AS (
            SELECT DISTINCT user_id, day + to_days(CAST(x AS INT)) AS day
            FROM days, range(0, 7) r(x)
        ),
        wau AS (
            SELECT day, CAST(count(*) AS BIGINT) AS wau
            FROM span GROUP BY day
        )
        SELECT d.day, d.dau, w.wau, d.dau / w.wau AS stickiness
        FROM dau d JOIN wau w ON d.day = w.day ORDER BY d.day
    """

    sql["ev_top_paths"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, event_id, event_type,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        ),
        paths AS (
            SELECT user_id,
                   array_to_string(list_slice(
                       list(event_type ORDER BY ts, event_id), 1, 8),
                       '>') AS path
            FROM sess GROUP BY user_id, session_seq
        )
        SELECT path, count(*) AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 25
    """

    sql["q8_national_market_share"] = """
        WITH mkt AS (
            SELECT n_nationkey FROM nation JOIN region
                ON n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA'
        ),
        j AS (
            SELECT year(o.o_orderdate) AS o_year,
                   n2.n_name AS supp_nation,
                   l.l_extendedprice * (1 - l.l_discount) AS vol
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE p.p_type = 'ECONOMY'
              AND year(o.o_orderdate) BETWEEN 1996 AND 1997
              AND c.c_nationkey IN (SELECT n_nationkey FROM mkt)
        ),
        agg AS (
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_1'
                                  THEN vol ELSE 0 END), 4) AS target_volume,
                   round(sum(vol), 4) AS total_volume
            FROM j GROUP BY o_year
        )
        SELECT o_year, target_volume, total_volume,
               target_volume / total_volume AS mkt_share
        FROM agg ORDER BY o_year
    """

    sql["q21_sole_blame_supplier"] = """
        WITH l1 AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_returnflag = 'R'
        ),
        blamed AS (
            SELECT l1.l_suppkey FROM l1
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l1.l_orderkey
                            AND o.o_orderstatus = 'F')
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
        )
        SELECT s.s_name, n.n_name,
               CAST(count(*) AS BIGINT) AS numwait
        FROM blamed b
        JOIN supplier s ON b.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY s.s_name, n.n_name
        ORDER BY numwait DESC, s.s_name LIMIT 25
    """

    sql["ev_conversion_lag"] = """
        WITH f AS (
            SELECT user_id, min(ts) AS from_ts FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        l AS (
            SELECT f.user_id,
                   date_diff('microsecond', min(f.from_ts), min(e.ts))
                       AS lag_us
            FROM f JOIN events e ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= f.from_ts
            GROUP BY f.user_id
        ),
        c AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_users_from,
                   (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_converted
        )
        -- scalar subqueries (not GROUP BY over a cross join) so the
        -- zero-conversion degenerate still emits ONE row with
        -- n_converted=0 + NULL percentiles, matching Spark's 1x1 agg join
        SELECT n_users_from, n_converted,
               CASE WHEN n_users_from = 0 THEN NULL
                    ELSE n_converted / n_users_from END AS conversion_rate,
               (SELECT quantile_cont(lag_us, 0.5) FROM l) AS p50_lag_us,
               (SELECT quantile_cont(lag_us, 0.9) FROM l) AS p90_lag_us
        FROM c
    """

    sql["q16_part_supplier_counts"] = """
        WITH ps AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT ps.l_suppkey) AS BIGINT)
                   AS supplier_cnt
        FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type NOT LIKE 'PROMO%'
          AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND ps.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier
              WHERE regexp_matches(s_name, '00000000[02468]$'))
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        LIMIT 40
    """

    # Fixed-point PageRank unrolled to K iterations of plain SQL — no
    # recursion needed for a fixed K, and the integer micro-unit
    # arithmetic (DIV everywhere) makes every value bit-identical to
    # the Spark loop regardless of aggregation order
    _pr_iter = """
        pr{i} AS (
            SELECT n.node,
                   CAST(150000 + 85 * coalesce(c.s, 0) // 100 AS BIGINT)
                       AS pr
            FROM nodes n LEFT JOIN (
                SELECT e.dst, sum(p.pr * e.w // e.w_out) AS s
                FROM pr{j} p JOIN edges e ON e.src = p.node
                GROUP BY e.dst
            ) c ON c.dst = n.node
        )"""
    # label propagation: most-frequent neighbour label, smallest-label
    # tiebreak — row_number ORDER BY count DESC, lbl reproduces Spark's
    # min-struct((-count), lbl) argmin exactly (all-integer rounds)
    _lp_iter = """
        l{i} AS MATERIALIZED (
            SELECT node, lbl FROM (
                SELECT n.node, p.lbl,
                       row_number() OVER (PARTITION BY n.node
                                          ORDER BY count(*) DESC, p.lbl)
                           AS rn
                FROM nbr n JOIN l{j} p ON n.nb = p.node
                GROUP BY n.node, p.lbl
            ) WHERE rn = 1
        )"""
    sql["graph_part_degrees"] = """
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ok AS (SELECT l_orderkey FROM items GROUP BY l_orderkey
               HAVING count(*) BETWEEN 2 AND 50),
        it AS (SELECT i.l_orderkey, i.l_partkey
               FROM items i JOIN ok USING (l_orderkey)),
        e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
              FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 1),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
                (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
                GROUP BY node),
        hist AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
                 FROM deg GROUP BY degree),
        tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n FROM hist)
        SELECT degree, n_nodes, n_nodes / n AS share
        FROM hist, tot ORDER BY degree
    """

    sql["graph_part_communities"] = ("""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ok AS (SELECT l_orderkey FROM items GROUP BY l_orderkey
               HAVING count(*) BETWEEN 2 AND 50),
        it AS (SELECT i.l_orderkey, i.l_partkey
               FROM items i JOIN ok USING (l_orderkey)),
        e AS MATERIALIZED (SELECT a.l_partkey AS a, b.l_partkey AS b
               FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 3),
        nbr AS MATERIALIZED (
            SELECT a AS node, b AS nb FROM e
            UNION ALL SELECT b AS node, a AS nb FROM e),
        l0 AS (SELECT DISTINCT node, node AS lbl FROM nbr),
        """ + ",".join(_lp_iter.format(i=i, j=i - 1)
                       for i in range(1, 5)) + """
        SELECT node AS part, CAST(lbl AS BIGINT) AS community,
               CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT)
                   AS community_size
        FROM l4 ORDER BY part
    """)

    # Link prediction twin of the communities CTE chain: witness-node
    # degree capped at 64 (same df-cap semantics as the Spark side),
    # RA = integer division (DuckDB // truncates, operands positive ==
    # Spark div), AA = floor(1e6/round(ln d, 6)) per the ln grid
    # recipe — every summed term is an integer, so the top-k cut is
    # bit-deterministic. Sums CAST to BIGINT (HUGEINT comparator rule).
    sql["graph_part_adamic_adar"] = """
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ok AS (SELECT l_orderkey FROM items GROUP BY l_orderkey
               HAVING count(*) BETWEEN 2 AND 50),
        it AS (SELECT i.l_orderkey, i.l_partkey
               FROM items i JOIN ok USING (l_orderkey)),
        e AS MATERIALIZED (SELECT a.l_partkey AS a, b.l_partkey AS b
               FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 3),
        nbr AS MATERIALIZED (
            SELECT a AS node, b AS nb FROM e
            UNION ALL SELECT b AS node, a AS nb FROM e),
        dg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
               FROM nbr GROUP BY node
               HAVING count(*) BETWEEN 2 AND 64),
        pairs AS (
            SELECT n1.nbr_v AS x, n2.nbr_v AS y, k.d
            FROM (SELECT node, nb AS nbr_v FROM nbr) n1
            JOIN (SELECT node, nb AS nbr_v FROM nbr) n2
              ON n1.node = n2.node AND n1.nbr_v < n2.nbr_v
            JOIN dg k ON k.node = n1.node),
        scored AS (
            SELECT x, y,
                   CAST(count(*) AS BIGINT) AS common_neighbors,
                   CAST(sum(1000000 // d) AS BIGINT) AS ra_micro,
                   CAST(sum(CAST(floor(1000000.0 / round(ln(d), 6))
                                 AS BIGINT)) AS BIGINT) AS aa_micro
            FROM pairs GROUP BY x, y)
        SELECT s.x AS part_a, s.y AS part_b,
               s.common_neighbors, s.ra_micro, s.aa_micro
        FROM scored s LEFT JOIN e ON s.x = e.a AND s.y = e.b
        WHERE e.a IS NULL
        ORDER BY s.aa_micro DESC, part_a, part_b LIMIT 100
    """

    # the histogram-rank decile formula IS SQL ntile, so the oracle
    # can use the plain window; everything else integer + raw share
    sql["q_revenue_lorenz"] = """
        WITH cents AS (
            SELECT o_custkey,
                   CAST(round(round(sum(o_totalprice), 2) * 100)
                        AS BIGINT) AS c
            FROM orders GROUP BY o_custkey
        ),
        tiled AS (
            SELECT c, CAST(ntile(10) OVER (ORDER BY c, o_custkey)
                           AS BIGINT) AS decile
            FROM cents
        ),
        per AS (
            SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(c) AS BIGINT) AS tile_cents
            FROM tiled GROUP BY decile
        ),
        cum AS (
            SELECT decile, n_customers, tile_cents,
                   CAST(sum(tile_cents) OVER (ORDER BY decile
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                        ROW) AS BIGINT) AS cum_cents
            FROM per
        ),
        tot AS (SELECT max(cum_cents) AS total FROM cum)
        SELECT decile, n_customers, tile_cents, cum_cents,
               cum_cents / total AS cum_share
        FROM cum, tot ORDER BY decile
    """

    # integer-cents window sums, CR sqrt sigma, raw band doubles —
    # every emitted value derives from identical bits in both engines
    sql["ts_bollinger_bands"] = """
        WITH longd AS (
            SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP)
                       AS date,
                   l_returnflag || l_linestatus AS code,
                   sum(l_extendedprice) AS value
            FROM lineitem GROUP BY 1, 2
        ),
        staged AS (
            SELECT date, code, value,
                   CAST(round(round(value, 2) * 100) AS BIGINT) AS c,
                   CAST(sum(CAST(round(round(value, 2) * 100)
                                 AS BIGINT))
                        OVER w AS BIGINT) AS s,
                   CAST(sum(CAST(round(round(value, 2) * 100)
                                 AS BIGINT)
                            * CAST(round(round(value, 2) * 100)
                                   AS BIGINT))
                        OVER w AS BIGINT) AS q,
                   row_number() OVER (PARTITION BY code
                                      ORDER BY date) AS rn
            FROM longd
            WINDOW w AS (PARTITION BY code ORDER BY date
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT date, code, value,
               s / 2000.0 AS ma,
               s / 2000.0 - 2 * (sqrt(CAST(20 * CAST(q AS HUGEINT)
                                           - CAST(s AS HUGEINT) * s
                                           AS DOUBLE))
                                 / 2000.0) AS lower,
               s / 2000.0 + 2 * (sqrt(CAST(20 * CAST(q AS HUGEINT)
                                           - CAST(s AS HUGEINT) * s
                                           AS DOUBLE))
                                 / 2000.0) AS upper,
               CAST(c / 100.0 < s / 2000.0
                        - 2 * (sqrt(CAST(20 * CAST(q AS HUGEINT)
                                         - CAST(s AS HUGEINT) * s
                                         AS DOUBLE))
                               / 2000.0)
                    OR c / 100.0 > s / 2000.0
                        + 2 * (sqrt(CAST(20 * CAST(q AS HUGEINT)
                                         - CAST(s AS HUGEINT) * s
                                         AS DOUBLE))
                               / 2000.0) AS INT) AS outside
        FROM staged WHERE rn >= 20
        ORDER BY code, date
    """

    # exact-integer HHI: per-supplier quantity sums are integer-grid,
    # hhi = bigint/bigint raw (both engines divide via double)
    sql["q_supplier_hhi"] = """
        WITH per AS (
            SELECT s.s_nationkey, l.l_suppkey,
                   CAST(round(sum(l_quantity), 0) AS BIGINT) AS s
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT s_nationkey,
                   CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(s) AS BIGINT) AS total_qty,
                   sum(CAST(s AS DECIMAL(19,0)) * s) AS s2
            FROM per GROUP BY 1
        )
        SELECT n.n_name AS nation, n_suppliers, total_qty,
               CAST(s2 AS DOUBLE)
                   / CAST(CAST(total_qty AS DECIMAL(19,0))
                          * total_qty AS DOUBLE) AS hhi
        FROM agg JOIN nation n ON agg.s_nationkey = n.n_nationkey
        ORDER BY nation
    """

    # skyline: the window form must reproduce this NOT-EXISTS dominance
    # predicate exactly (all-integer metrics; DECIMAL revenue sums)
    sql["q_supplier_skyline"] = """
        WITH per AS (
            SELECT s.s_nationkey, s.s_suppkey, s.s_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,4))) * 10000 AS BIGINT)
                       AS rev_dm,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2, 3
        ),
        sky AS (
            SELECT a.* FROM per a
            WHERE NOT EXISTS (
                SELECT 1 FROM per b
                WHERE b.s_nationkey = a.s_nationkey
                  AND b.rev_dm >= a.rev_dm AND b.n_lines <= a.n_lines
                  AND (b.rev_dm > a.rev_dm OR b.n_lines < a.n_lines))
        )
        SELECT n.n_name AS nation, sky.s_name,
               sky.rev_dm / 10000.0 AS revenue, sky.n_lines
        FROM sky JOIN nation n ON sky.s_nationkey = n.n_nationkey
        ORDER BY nation, s_name
    """

    # modularity of the same unrolled LPA partition: all-integer
    # (q_num = 4*m*Σe_c − Σd_c², q_den = 4m²), quotient raw int/int
    sql["graph_part_modularity"] = ("""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ok AS (SELECT l_orderkey FROM items GROUP BY l_orderkey
               HAVING count(*) BETWEEN 2 AND 50),
        it AS (SELECT i.l_orderkey, i.l_partkey
               FROM items i JOIN ok USING (l_orderkey)),
        e AS MATERIALIZED (SELECT a.l_partkey AS a, b.l_partkey AS b
               FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 3),
        nbr AS MATERIALIZED (
            SELECT a AS node, b AS nb FROM e
            UNION ALL SELECT b AS node, a AS nb FROM e),
        l0 AS (SELECT DISTINCT node, node AS lbl FROM nbr),
        """ + ",".join(_lp_iter.format(i=i, j=i - 1)
                       for i in range(1, 5)) + """,
        within AS (
            SELECT la.lbl AS c, CAST(count(*) AS BIGINT) AS e_c
            FROM e JOIN l4 la ON e.a = la.node
                   JOIN l4 lb ON e.b = lb.node
            WHERE la.lbl = lb.lbl GROUP BY 1),
        deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d FROM
            (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node),
        dc AS (
            SELECT l.lbl AS c, CAST(sum(d) AS BIGINT) AS d_c
            FROM deg JOIN l4 l USING (node) GROUP BY 1),
        per_c AS (
            SELECT dc.c, coalesce(w.e_c, 0) AS e_c, dc.d_c
            FROM dc LEFT JOIN within w USING (c)),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_communities,
                   CAST(sum(e_c) AS BIGINT) AS se,
                   CAST(sum(d_c * d_c) AS BIGINT) AS sd2
            FROM per_c),
        fin AS (
            SELECT n_edges, n_communities,
                   CAST(4 * n_edges * se - sd2 AS BIGINT) AS q_num,
                   CAST(4 * n_edges * n_edges AS BIGINT) AS q_den
            FROM agg, m)
        SELECT n_edges, n_communities, q_num, q_den,
               q_num / q_den AS modularity
        FROM fin
    """)

    # personalized pagerank: base term and pr0 live only on the seed
    # nodes — otherwise pagerank's exact unrolled-integer recipe
    _ppr_iter = """
        pr{i} AS (
            SELECT n.node,
                   CAST(n.bv + 85 * coalesce(c.s, 0) // 100 AS BIGINT)
                       AS pr
            FROM nodes_b n LEFT JOIN (
                SELECT e.dst, sum(p.pr * e.w // e.w_out) AS s
                FROM pr{j} p JOIN edges e ON e.src = p.node
                GROUP BY e.dst
            ) c ON c.dst = n.node
        )"""
    sql["graph_supplier_ppr"] = ("""
        WITH pairs AS (
            SELECT o.o_custkey * 2 AS c_node,
                   l.l_suppkey * 2 + 1 AS s_node,
                   CAST(count(*) AS BIGINT) AS w
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        ),
        edges0 AS (
            SELECT c_node AS src, s_node AS dst, w FROM pairs
            UNION ALL
            SELECT s_node AS src, c_node AS dst, w FROM pairs
        ),
        edges AS (
            SELECT src, dst, w,
                   sum(w) OVER (PARTITION BY src) AS w_out
            FROM edges0
        ),
        seeds AS (
            SELECT s_suppkey * 2 + 1 AS node FROM supplier
            WHERE s_nationkey = 0
        ),
        nodes_b AS (
            SELECT node,
                   CASE WHEN node IN (SELECT node FROM seeds)
                        THEN 150000 ELSE 0 END AS bv
            FROM (SELECT DISTINCT src AS node FROM edges0
                  UNION SELECT DISTINCT dst AS node FROM edges0)
        ),
        pr0 AS (
            SELECT node,
                   CAST(CASE WHEN bv > 0 THEN 1000000 ELSE 0 END
                        AS BIGINT) AS pr
            FROM nodes_b),
        """ + ",\n".join(_ppr_iter.format(i=i, j=i - 1)
                         for i in range(1, 7)) + """
        SELECT s.s_name, p.pr AS rank_micro
        FROM pr6 p JOIN supplier s ON s.s_suppkey = (p.node - 1) // 2
        WHERE p.node % 2 = 1
        ORDER BY rank_micro DESC, s.s_name
        LIMIT 50
    """)

    sql["graph_supplier_pagerank"] = ("""
        WITH pairs AS (
            SELECT o.o_custkey * 2 AS c_node,
                   l.l_suppkey * 2 + 1 AS s_node,
                   CAST(count(*) AS BIGINT) AS w
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        ),
        edges0 AS (
            SELECT c_node AS src, s_node AS dst, w FROM pairs
            UNION ALL
            SELECT s_node AS src, c_node AS dst, w FROM pairs
        ),
        edges AS (
            SELECT src, dst, w,
                   sum(w) OVER (PARTITION BY src) AS w_out
            FROM edges0
        ),
        nodes AS (
            SELECT DISTINCT src AS node FROM edges0
            UNION
            SELECT DISTINCT dst AS node FROM edges0
        ),
        pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
        """ + ",\n".join(_pr_iter.format(i=i, j=i - 1)
                         for i in range(1, 7)) + """
        SELECT s.s_name, p.pr AS rank_micro
        FROM pr6 p JOIN supplier s ON s.s_suppkey = (p.node - 1) // 2
        WHERE p.node % 2 = 1
        ORDER BY rank_micro DESC, s.s_name
        LIMIT 50
    """)

    # SALSA unrolled to 4 full rounds; degree sums CAST to BIGINT at
    # the source (DuckDB group sums of BIGINT go HUGEINT) so the DIV
    # chain stays in bigint like Spark's
    _salsa_round = """
        a{i} AS (
            SELECT e.auth AS node,
                   CAST(sum(h.score * e.w // e.w_out) AS BIGINT) AS score
            FROM deg e JOIN h{j} h ON e.hub = h.node
            GROUP BY 1
        ),
        h{i} AS (
            SELECT e.hub AS node,
                   CAST(sum(a.score * e.w // e.w_in) AS BIGINT) AS score
            FROM deg e JOIN a{i} a ON e.auth = a.node
            GROUP BY 1
        )"""
    sql["ev_peak_concurrency"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        ),
        iv AS (
            SELECT min(ts) AS session_start, max(ts) AS session_end
            FROM sess GROUP BY user_id, session_seq
        ),
        d1 AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, ts, d
            FROM (
                SELECT session_start AS ts, 1 AS d FROM iv
                UNION ALL
                SELECT session_end AS ts, -1 AS d FROM iv
            )
        ),
        net AS (SELECT day, CAST(sum(d) AS BIGINT) AS net FROM d1 GROUP BY day),
        carry AS (
            SELECT day,
                   CAST(coalesce(sum(net) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS c
            FROM net
        ),
        run AS (
            SELECT d1.day,
                   CAST(sum(d) OVER (PARTITION BY d1.day ORDER BY ts, d DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) + c.c AS r
            FROM d1 JOIN carry c ON c.day = d1.day
        )
        SELECT day AS date, CAST(max(r) AS BIGINT) AS peak_concurrency
        FROM run GROUP BY day ORDER BY date
    """

    sql["ev_volume_anomalies"] = """
        WITH d AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS date,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT event_type, date, n,
                   CAST(count(*) OVER w AS HUGEINT) AS c,
                   CAST(sum(n) OVER w AS HUGEINT) AS sw,
                   CAST(sum(n * n) OVER w AS HUGEINT) AS q
            FROM d
            WINDOW w AS (PARTITION BY event_type ORDER BY date
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        -- flag = exact integer comparison; z = derived double from the
        -- same exact integers (HUGEINT here, DECIMAL(38,0) in Spark)
        SELECT event_type, date, n,
               CASE WHEN c = 7 AND c * q - sw * sw != 0
                    THEN CAST(c * n - sw AS DOUBLE)
                         / sqrt(CAST(c * q - sw * sw AS DOUBLE)) END AS z,
               CASE WHEN c = 7
                    THEN CAST((c * n - sw) * (c * n - sw)
                              > 9 * (c * q - sw * sw) AS BIGINT) END
                   AS is_anomaly
        FROM s ORDER BY event_type, date
    """

    sql["ev_status_scd2"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type AS status,
                   CASE WHEN lag(event_type) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
        ),
        runs AS (
            SELECT user_id, ts, status,
                   CAST(sum(chg) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS run_seq
            FROM flagged
        ),
        iv AS (
            SELECT user_id, run_seq, status, min(ts) AS valid_from,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM runs GROUP BY 1, 2, 3
        )
        SELECT user_id, run_seq, status, valid_from,
               lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY run_seq) AS valid_to,
               n_events
        FROM iv ORDER BY user_id, run_seq
    """

    # Markov power iteration unrolled to 6 rounds: same fixed-point DIV
    # discipline as PageRank, no teleport term
    _mk_iter = """
        p{i} AS (
            SELECT n.node,
                   CAST(coalesce(c.s, 0) AS BIGINT) AS pi
            FROM nodes n LEFT JOIN (
                SELECT e.dst, sum(p.pi * e.w // e.w_out) AS s
                FROM p{j} p JOIN edges e ON e.src = p.node
                GROUP BY e.dst
            ) c ON c.dst = n.node
        )"""
    sql["ev_markov_stationary"] = ("""
        WITH steps AS (
            SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS src,
                   event_type AS dst
            FROM events
        ),
        edges0 AS (
            SELECT src, dst, CAST(count(*) AS BIGINT) AS w
            FROM steps WHERE src IS NOT NULL GROUP BY 1, 2
        ),
        edges AS (
            SELECT src, dst, w,
                   CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS w_out
            FROM edges0
        ),
        nodes AS (
            SELECT DISTINCT src AS node FROM edges0
            UNION
            SELECT DISTINCT dst AS node FROM edges0
        ),
        p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pi FROM nodes),
        """ + ",\n".join(_mk_iter.format(i=i, j=i - 1)
                         for i in range(1, 7)) + """
        SELECT node AS event_type, pi AS pi_micro,
               pi / (SELECT CAST(sum(pi) AS BIGINT) FROM p6) AS share
        FROM p6 ORDER BY event_type
    """)

    sql["graph_supplier_salsa"] = ("""
        WITH edges AS (
            SELECT o.o_custkey AS hub, l.l_suppkey AS auth,
                   CAST(count(*) AS BIGINT) AS w
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        ),
        wout AS (SELECT hub, CAST(sum(w) AS BIGINT) AS w_out
                 FROM edges GROUP BY 1),
        winn AS (SELECT auth, CAST(sum(w) AS BIGINT) AS w_in
                 FROM edges GROUP BY 1),
        deg AS (
            SELECT e.hub, e.auth, e.w, wout.w_out, winn.w_in
            FROM edges e JOIN wout USING (hub) JOIN winn USING (auth)
        ),
        h0 AS (SELECT DISTINCT hub AS node,
                      CAST(1000000 AS BIGINT) AS score FROM edges),
        """ + ",\n".join(_salsa_round.format(i=i, j=i - 1)
                         for i in range(1, 5)) + """
        SELECT s.s_name, a.score AS authority_micro
        FROM a4 a JOIN supplier s ON s.s_suppkey = a.node
        ORDER BY authority_micro DESC, s.s_name
        LIMIT 50
    """)

    sql["q_part_affinity"] = """
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        ok AS (
            SELECT l_orderkey FROM items GROUP BY l_orderkey
            HAVING count(*) BETWEEN 2 AND 50
        ),
        it AS (
            SELECT i.l_orderkey, i.l_partkey
            FROM items i JOIN ok USING (l_orderkey)
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM it a JOIN it b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        pc AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
            FROM it GROUP BY 1
        )
        SELECT p.part_a, p.part_b, p.n_both,
               CAST(p.n_both AS DOUBLE)
                   / (na.n + nb.n - p.n_both) AS affinity
        FROM pairs p
        JOIN pc na ON p.part_a = na.l_partkey
        JOIN pc nb ON p.part_b = nb.l_partkey
        ORDER BY n_both DESC, part_a, part_b
        LIMIT 50
    """

    # k-core: the same edge CTEs as graph_part_triangles, k = ceil of
    # the average degree, then R peel rounds UNROLLED (the pagerank
    # oracle pattern) — R-round semantics keep this exact at any R,
    # with convergence reported by comparing the last two edge counts
    _kc = ["""
        items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ok AS (SELECT l_orderkey FROM items GROUP BY l_orderkey
               HAVING count(*) BETWEEN 2 AND 50),
        it AS (SELECT i.l_orderkey, i.l_partkey
               FROM items i JOIN ok USING (l_orderkey)),
        e0 AS MATERIALIZED (SELECT a.l_partkey AS a, b.l_partkey AS b
               FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 1),
        n0 AS MATERIALIZED (SELECT DISTINCT node FROM
               (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)),
        kk AS MATERIALIZED (SELECT 2 * ((2 * (SELECT count(*) FROM e0)
                       + (SELECT count(*) FROM n0) - 1)
                      // NULLIF((SELECT count(*) FROM n0), 0)) // 3 AS k)"""]
    for _r in range(1, 9):
        _kc.append(f"""
        d{_r} AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS d FROM
                  (SELECT a AS node FROM e{_r - 1}
                   UNION ALL SELECT b FROM e{_r - 1}) GROUP BY node),
        a{_r} AS MATERIALIZED (SELECT node FROM d{_r}
                  WHERE d >= (SELECT k FROM kk)),
        e{_r} AS MATERIALIZED (SELECT a, b FROM e{_r - 1}
                  WHERE a IN (SELECT node FROM a{_r})
                    AND b IN (SELECT node FROM a{_r}))""")
    sql["graph_part_kcore"] = ("WITH " + ",".join(_kc) + """,
        fin AS (SELECT node, CAST(count(*) AS BIGINT) AS core_deg FROM
                (SELECT a AS node FROM e8 UNION ALL SELECT b FROM e8)
                GROUP BY node)
        SELECT node, core_deg,
               CAST((SELECT count(*) FROM e8)
                    = (SELECT count(*) FROM e7) AS INT) AS converged
        FROM fin ORDER BY node
    """)

    # same basket -> edge -> degree-orientation -> wedge-close pipeline
    # as the Spark side; every count integer-exact, clustering int/int raw
    sql["graph_part_triangles"] = """
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        ok AS (
            SELECT l_orderkey FROM items GROUP BY l_orderkey
            HAVING count(*) BETWEEN 2 AND 50
        ),
        it AS (
            SELECT i.l_orderkey, i.l_partkey
            FROM items i JOIN ok USING (l_orderkey)
        ),
        edges AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM it a JOIN it b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= 1
        ),
        deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT a AS node FROM edges
                  UNION ALL SELECT b AS node FROM edges)
            GROUP BY node
        ),
        ori AS (
            SELECT CASE WHEN da.d <= db.d THEN e.a ELSE e.b END AS u,
                   CASE WHEN da.d <= db.d THEN e.b ELSE e.a END AS v
            FROM edges e
            JOIN deg da ON e.a = da.node
            JOIN deg db ON e.b = db.node
        ),
        tri AS (
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM ori e1
            JOIN ori e2 ON e1.u = e2.u AND e1.v <> e2.v
            JOIN ori e3 ON e3.u = e1.v AND e3.v = e2.v
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
               (SELECT CAST(coalesce(sum(d * (d - 1)) / 2, 0) AS BIGINT)
                    FROM deg)
                   AS n_wedges,
               n_triangles,
               3 * n_triangles
                   / (SELECT CAST(sum(d * (d - 1)) / 2 AS BIGINT) FROM deg)
                   AS global_clustering
        FROM tri
    """

    # per-node clustering: same edge/orientation CTEs as the census;
    # triangles kept as 3-corner rows, unioned into per-node counts
    sql["graph_part_clustering"] = """
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        ok AS (
            SELECT l_orderkey FROM items GROUP BY l_orderkey
            HAVING count(*) BETWEEN 2 AND 50
        ),
        it AS (
            SELECT i.l_orderkey, i.l_partkey
            FROM items i JOIN ok USING (l_orderkey)
        ),
        edges AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM it a JOIN it b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= 1
        ),
        deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT a AS node FROM edges
                  UNION ALL SELECT b AS node FROM edges)
            GROUP BY node
        ),
        ori AS (
            SELECT CASE WHEN da.d <= db.d THEN e.a ELSE e.b END AS u,
                   CASE WHEN da.d <= db.d THEN e.b ELSE e.a END AS v
            FROM edges e
            JOIN deg da ON e.a = da.node
            JOIN deg db ON e.b = db.node
        ),
        tri AS (
            SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
            FROM ori e1
            JOIN ori e2 ON e1.u = e2.u AND e1.v <> e2.v
            JOIN ori e3 ON e3.u = e1.v AND e3.v = e2.v
        ),
        tn AS (
            SELECT node, CAST(count(*) AS BIGINT) AS t
            FROM (SELECT n1 AS node FROM tri
                  UNION ALL SELECT n2 FROM tri
                  UNION ALL SELECT n3 FROM tri)
            GROUP BY node
        )
        SELECT deg.node AS part, deg.d AS degree,
               CAST(coalesce(tn.t, 0) AS BIGINT) AS n_triangles,
               CASE WHEN deg.d >= 2 THEN
                   2 * coalesce(tn.t, 0) / (deg.d * (deg.d - 1))
               END AS clustering_coef
        FROM deg LEFT JOIN tn ON deg.node = tn.node
        ORDER BY part
    """

    sql["er_customer_name_pairs"] = """
        WITH blk AS (
            -- >= 2 only: the Spark side's max_block caps the
            -- per-(block, deletion-variant) BUCKET, not the whole
            -- nation block, and FastSS is lossless until a single
            -- variant bucket exceeds it — so the oracle must not
            -- drop large nation blocks wholesale (ADVICE r7)
            SELECT c_nationkey FROM customer GROUP BY c_nationkey
            HAVING count(*) >= 2
        )
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               a.c_name AS name_a, b.c_name AS name_b,
               levenshtein(a.c_name, b.c_name) AS dist
        FROM customer a
        JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        JOIN blk ON a.c_nationkey = blk.c_nationkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        ORDER BY key_a, key_b
    """

    # md5-uniform + grid-snapped ln: every rank-determining bit
    # identical cross-engine (CLAUDE.md ln-recipe)
    sql["sample_weighted_orders"] = """
        SELECT o_orderkey, round(o_totalprice, 2) AS weight,
               -round(ln((CAST('0x' || substring(
                              md5('wsample:' || CAST(o_orderkey AS VARCHAR)),
                              1, 8) AS BIGINT) + 0.5) / 4294967296), 6)
                   / round(o_totalprice, 2) AS es_key
        FROM orders
        WHERE o_totalprice > 0
        ORDER BY es_key ASC, o_orderkey ASC
        LIMIT 100
    """

    sql["q2_min_cost_supplier"] = """
        WITH bridge AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ),
        cand AS (
            SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
                   p.p_size, b.unit_cost,
                   min(b.unit_cost) OVER (PARTITION BY p.p_partkey)
                       AS min_cost
            FROM bridge b
            JOIN part p ON b.l_partkey = p.p_partkey
            JOIN supplier s ON b.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
              AND p.p_size IN (5, 15, 25, 35, 45)
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_size, unit_cost
        FROM cand WHERE unit_cost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """

    sql["q9_product_type_profit"] = """
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(round(sum(CAST(
                   l.l_extendedprice * (1 - l.l_discount)
                   - 0.5 * p.p_retailprice * l.l_quantity
                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%rod%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """

    sql["q11_important_stock"] = """
        WITH per_part AS (
            SELECT l.l_partkey,
                   sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(18,4))) AS value_d
            FROM lineitem l
            WHERE l.l_suppkey IN (
                SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_3')
            GROUP BY 1
        )
        SELECT l_partkey,
               CAST(round(value_d, 2) AS DOUBLE) AS value
        FROM per_part
        WHERE value_d > (SELECT sum(value_d) * CAST(0.001 AS DECIMAL(18,6))
                         FROM per_part)
        ORDER BY value DESC, l_partkey
    """

    sql["q20_dominant_supplier"] = """
        WITH per_ps AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_ps,
                   sum(sum(l_quantity)) OVER (PARTITION BY l_partkey)
                       AS qty_p
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'blue%')
            GROUP BY 1, 2
        )
        SELECT s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
          AND s.s_suppkey IN (SELECT DISTINCT l_suppkey FROM per_ps
                              WHERE qty_ps > 0.35 * qty_p)
        ORDER BY s.s_name
    """

    sql["q19_disjunctive_revenue"] = """
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                   AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
          AND ((p.p_type = 'PROMO' AND l.l_quantity BETWEEN 1 AND 20)
               OR (p.p_type = 'ECONOMY' AND l.l_quantity BETWEEN 10 AND 30)
               OR (p.p_type = 'SMALL' AND l.l_quantity BETWEEN 20 AND 40))
    """

    sql["catalog_fuzzy_search"] = """
        WITH names AS (SELECT DISTINCT lower(p_name) AS name FROM part)
        SELECT name,
               CAST(levenshtein(name, 'smal widget') AS INT) AS distance
        FROM names
        WHERE levenshtein(name, 'smal widget') <= 4
        ORDER BY distance, name LIMIT 15
    """

    sql["embedding_norm_profile"] = """
        WITH n AS (
            SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
                   sqrt(list_reduce(
                       list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (a, b) -> a + b)) AS norm
            FROM embeddings
        )
        SELECT vec_id, dim, norm,
               norm < 1e-12 AS is_zero,
               NOT isnan(norm) AND norm != CAST('inf' AS DOUBLE)
                   AS is_finite
        FROM n ORDER BY vec_id
    """

    sql["ev_session_stats"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        ),
        per AS (
            SELECT user_id, session_seq,
                   CAST(count(*) AS BIGINT) AS n_events,
                   date_diff('microsecond', min(ts), max(ts)) AS dur_us
            FROM sess GROUP BY user_id, session_seq
        )
        SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(dur_us) AS BIGINT) / CAST(count(*) AS BIGINT)
                   / 1000000.0 AS mean_duration_s
        FROM per GROUP BY n_events ORDER BY n_events
    """

    sql["ev_attribution"] = """
        WITH t AS (
            SELECT event_id, user_id, ts, event_type,
                   max(CASE WHEN event_type = 'view' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS touch_ts
            FROM events
        )
        SELECT event_id, user_id, ts AS conv_ts, touch_ts,
               touch_ts IS NOT NULL
               AND date_diff('microsecond', touch_ts, ts) <= 86400000000
                   AS attributed
        FROM t WHERE event_type = 'purchase' ORDER BY event_id
    """

    sql["ts_trend_ma"] = f"""
        WITH long AS ({_LONG})
        SELECT date, code, round(value, 4) AS value,
               round(sum(value) OVER w13, 2)
                   / count(*) OVER w13 AS trend,
               round(value, 2)
               - round(sum(value) OVER w13, 2) / count(*) OVER w13
                   AS detrended
        FROM long
        WINDOW w13 AS (PARTITION BY code ORDER BY date
                       ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
        ORDER BY date, code
    """

    sql["ev_skew_profile"] = """
        WITH c AS (
            SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
        ),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT c.key, c.n, c.n / t.total AS share
        FROM c, t ORDER BY c.n DESC, c.key ASC LIMIT 10
    """

    sql["ev_burst_profile"] = """
        WITH w AS (
            SELECT user_id, count(*) OVER (
                PARTITION BY user_id
                ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS in_w
            FROM events
        )
        SELECT user_id, CAST(max(in_w) AS BIGINT) AS max_burst,
               CAST(count(*) AS BIGINT) AS n_events,
               max(in_w) >= 5 AS is_burst
        FROM w GROUP BY user_id ORDER BY user_id
    """
    # ghost-row chunked twin: identical output, same oracle
    sql["ev_burst_skew"] = sql["ev_burst_profile"]

    sql["text_token_budget_sample"] = f"""
        WITH b AS (
            SELECT doc_id, source,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
                   md5('budget:' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY h, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM b
        )
        SELECT doc_id, source, n_tokens, cum_tokens FROM c
        WHERE cum_tokens <= 700 ORDER BY doc_id
    """

    sql["text_quality_by_source"] = f"""
        WITH feat AS (
            SELECT doc_id,
                   len({_TOKENS}) AS n_tokens,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST(list_sum(list_transform({_TOKENS}, x -> length(x))) AS DOUBLE)
                             / len({_TOKENS})
                        ELSE 0.0 END AS mean_word_len,
                   CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST({_sw_hits("en")} AS DOUBLE) / len({_TOKENS})
                        ELSE 0.0 END AS stopword_density
            FROM documents
        ),
        s AS (
            SELECT d.source,
                   (CASE WHEN f.n_tokens >= 10 AND f.n_tokens <= 100000 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN f.mean_word_len >= 2.0 AND f.mean_word_len <= 12.0 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN f.punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN f.stopword_density >= 0.02 THEN 0.25 ELSE 0.0 END) AS score
            FROM feat f JOIN documents d ON f.doc_id = d.doc_id
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               sum(score) / count(*) AS mean_score,
               CAST(sum(CASE WHEN score < 0.75 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_below,
               CAST(sum(CASE WHEN score < 0.75 THEN 1 ELSE 0 END)
                    AS BIGINT) / CAST(count(*) AS BIGINT) AS low_share
        FROM s GROUP BY source ORDER BY source
    """

    sql["q14_promo_share"] = """
        SELECT promo_revenue, total_revenue,
               promo_revenue / total_revenue AS promo_share
        FROM (
            SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END), 4) AS promo_revenue,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                       AS total_revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1996-02-01'
        )
    """

    # Bloom-prefiltered join: the prefilter is semantically invisible
    # (no false negatives; join discards false positives), so the
    # oracle is simply the PLAIN join — value parity proves exactly
    # the "result unchanged" contract the operator makes.
    sql["q_bloom_pruned_join"] = """
        SELECT o.o_orderpriority,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1995-04-01'
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """

    # -- Z-order layout audits: pure integer arithmetic end-to-end, so
    # the Morton key, the min/max buckets, and the equal-count ntile
    # file split reproduce bit-for-bit in DuckDB (buckets via `//`,
    # the same shift/mask interleave terms, standard ntile over the
    # same total order). All sums CAST to BIGINT (DuckDB sum(BIGINT)
    # is HUGEINT, which the driver comparator hashes differently).
    _zc = ZORDER_COLS
    _zbits = 8

    def _zkey_terms(bcols):
        n = len(bcols)
        return " + ".join(
            f"((({b} >> {i}) & 1) * {1 << (i * n + j)})"
            for i in range(_zbits) for j, b in enumerate(bcols))

    _zb = ", ".join(
        f"min({c}) AS lo_{c}, max({c}) AS hi_{c}" for c in _zc)
    _zbuckets = ", ".join(
        f"CAST(((({c} - lo_{c}) * {1 << _zbits}) "
        f"// (hi_{c} - lo_{c} + 1)) AS BIGINT) AS b_{c}" for c in _zc)
    _zstats = ", ".join(
        f"min({c}) AS min_{c}, max({c}) AS max_{c}" for c in _zc)
    _zfiles = f"""
        bounds AS (SELECT {_zb} FROM lineitem),
        bkt AS (
            SELECT l_orderkey, l_linenumber, {', '.join(_zc)},
                   {_zbuckets}
            FROM lineitem, bounds
        ),
        zk AS (
            SELECT *, CAST({_zkey_terms([f'b_{c}' for c in _zc])}
                           AS BIGINT) AS zkey
            FROM bkt
        ),
        zfile AS (
            SELECT {', '.join(_zc)},
                   ntile(32) OVER (ORDER BY zkey, l_orderkey,
                                   l_linenumber) AS file_id
            FROM zk
        ),
        zstats AS (
            SELECT CAST(file_id AS BIGINT) AS file_id,
                   count(*) AS n_rows, {_zstats}
            FROM zfile GROUP BY file_id
        )"""

    sql["layout_zorder_files"] = f"""
        WITH {_zfiles}
        SELECT * FROM zstats ORDER BY file_id
    """

    _layout_orders = {
        "natural": "l_orderkey, l_linenumber",
        "linear": f"{_zc[0]}, l_orderkey, l_linenumber",
    }
    _lstats = []
    for _lname, _lorder in _layout_orders.items():
        _lstats.append(f"""
        {_lname}_stats AS (
            SELECT count(*) AS n_rows, {_zstats}
            FROM (SELECT {', '.join(_zc)},
                         ntile(32) OVER (ORDER BY {_lorder}) AS file_id
                  FROM lineitem)
            GROUP BY file_id
        )""")
    _preds = [(c, [c]) for c in _zc] + [("all", _zc)]
    _scans = []
    for _lname in ("natural", "linear", "zorder"):
        _src = "zstats" if _lname == "zorder" else f"{_lname}_stats"
        for _pname, _pcols in _preds:
            _hit = " AND ".join(
                f"min_{c} <= lo_{c} + ((hi_{c} - lo_{c} + 1) // 10)"
                for c in _pcols)
            _scans.append(f"""
        SELECT '{_lname}' AS layout, '{_pname}' AS predicate,
               count(*) AS n_files,
               CAST(sum(CASE WHEN {_hit} THEN 1 ELSE 0 END)
                    AS BIGINT) AS files_scanned,
               CAST(sum(CASE WHEN {_hit} THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_scanned
        FROM {_src}, bounds""")

    sql["layout_pruning_compare"] = (
        "WITH " + _zfiles + "," + ",".join(_lstats)
        + "\nSELECT * FROM ("
        + "\nUNION ALL".join(_scans)
        + "\n) ORDER BY layout, predicate"
    )

    # Exact-integer EWMA: the sequential per-series fold replayed by
    # a recursive CTE — identical integer recurrence in both engines
    # (positive operands, so truncating and flooring division agree);
    # cents recovered from the double sum by the 2-decimal grid rule.
    sql["ts_ewma_exact"] = """
        WITH RECURSIVE base AS MATERIALIZED (
            SELECT date, code, cents,
                   row_number() OVER (PARTITION BY code
                                      ORDER BY date) AS rn
            FROM (
                SELECT CAST(date_trunc('day', l_shipdate)
                            AS TIMESTAMP) AS date,
                       l_returnflag || l_linestatus AS code,
                       CAST(round(sum(l_extendedprice) * 100, 0)
                            AS BIGINT) AS cents
                FROM lineitem GROUP BY 1, 2
            )
        ), rec AS (
            SELECT code, rn, date, cents, cents AS s
            FROM base WHERE rn = 1
            UNION ALL
            SELECT b.code, b.rn, b.date, b.cents,
                   (r.s * 3 + b.cents) // 4
            FROM rec r JOIN base b
              ON b.code = r.code AND b.rn = r.rn + 1
        )
        SELECT date, code,
               CAST(cents AS DOUBLE) / 100 AS value,
               s AS ewma_cents,
               CAST(s AS DOUBLE) / 100 AS ewma
        FROM rec
        ORDER BY code, date
    """

    # Exact-integer Holt level+trend: both coupled recurrences in the
    # recursive CTE. DuckDB // TRUNCATES toward zero on signed
    # operands; the Spark-side Python fold uses an explicit truncating
    # division (plain Python // would FLOOR and drift one cent on a
    # negative trend — see CLAUDE.md and the holt_exact regression
    # test), so both engines truncate and the signed trend reconciles
    # bit-for-bit.
    sql["ts_holt_exact"] = """
        WITH RECURSIVE base AS MATERIALIZED (
            SELECT date, code, cents,
                   row_number() OVER (PARTITION BY code
                                      ORDER BY date) AS rn
            FROM (
                SELECT CAST(date_trunc('day', l_shipdate)
                            AS TIMESTAMP) AS date,
                       l_returnflag || l_linestatus AS code,
                       CAST(round(sum(l_extendedprice) * 100, 0)
                            AS BIGINT) AS cents
                FROM lineitem GROUP BY 1, 2
            )
        ), rec AS (
            SELECT code, rn, date, cents,
                   cents AS l, CAST(0 AS BIGINT) AS b,
                   CAST(NULL AS BIGINT) AS fc
            FROM base WHERE rn = 1
            UNION ALL
            SELECT b2.code, b2.rn, b2.date, b2.cents,
                   (b2.cents + 3 * (r.l + r.b)) // 4 AS l,
                   (((b2.cents + 3 * (r.l + r.b)) // 4 - r.l)
                    + 7 * r.b) // 8 AS b,
                   r.l + r.b AS fc
            FROM rec r JOIN base b2
              ON b2.code = r.code AND b2.rn = r.rn + 1
        )
        SELECT date, code,
               CAST(cents AS DOUBLE) / 100 AS value,
               l AS level_cents, b AS trend_cents, fc AS forecast_cents,
               CAST(l AS DOUBLE) / 100 AS level,
               CAST(b AS DOUBLE) / 100 AS trend,
               CAST(fc AS DOUBLE) / 100 AS forecast
        FROM rec
        ORDER BY code, date
    """

    # Exact-integer additive Holt-Winters: the seasonal ring rides
    # the recursion as a BIGINT[] rotated per step; lateral aliases
    # (fresh names) thread l_new/s_new through the coupled updates;
    # // truncation matches the fold's explicit tdiv.
    # replay capped at the first 365 days per series (both engines —
    # see the entry docstring: recursion cost is superlinear in max
    # series length, and 365 steps pin the ring arithmetic just as
    # hard)
    sql["ts_hw_seasonal_exact"] = """
        WITH RECURSIVE base AS MATERIALIZED (
            SELECT date, code, cents,
                   row_number() OVER (PARTITION BY code
                                      ORDER BY date) AS rn
            FROM (
                SELECT CAST(date_trunc('day', l_shipdate)
                            AS TIMESTAMP) AS date,
                       l_returnflag || l_linestatus AS code,
                       CAST(round(sum(l_extendedprice) * 100, 0)
                            AS BIGINT) AS cents
                FROM lineitem
                WHERE l_shipdate < DATE '1996-01-02'
                GROUP BY 1, 2
            )
        ), rec AS (
            SELECT code, rn, date, cents,
                   cents AS l, CAST(0 AS BIGINT) AS b,
                   CAST(0 AS BIGINT) AS s_new,
                   [0,0,0,0,0,0,0]::BIGINT[] AS seas,
                   CAST(NULL AS BIGINT) AS fc
            FROM base WHERE rn = 1
            UNION ALL
            SELECT b2.code, b2.rn, b2.date, b2.cents,
                   (b2.cents - r.seas[1] + 3 * (r.l + r.b)) // 4
                       AS lnew,
                   ((lnew - r.l) + 7 * r.b) // 8,
                   ((b2.cents - lnew) + 3 * r.seas[1]) // 4 AS snew,
                   list_concat(r.seas[2:], [snew]),
                   r.l + r.b + r.seas[1]
            FROM rec r JOIN base b2
              ON b2.code = r.code AND b2.rn = r.rn + 1
        )
        SELECT date, code,
               CAST(cents AS DOUBLE) / 100 AS value,
               l AS level_cents, b AS trend_cents,
               s_new AS seasonal_cents, fc AS forecast_cents,
               CAST(l AS DOUBLE) / 100 AS level,
               CAST(b AS DOUBLE) / 100 AS trend,
               CAST(s_new AS DOUBLE) / 100 AS seasonal,
               CAST(fc AS DOUBLE) / 100 AS forecast
        FROM rec
        ORDER BY code, date
    """

    # Backtest over the exact Holt recursion: same CTE + an error
    # aggregate; MAE = raw int/int quotient then /100, RMSE = sqrt of
    # one — correctly rounded ops only, identical bits.
    sql["ts_backtest_exact"] = """
        WITH RECURSIVE base AS MATERIALIZED (
            SELECT date, code, cents,
                   row_number() OVER (PARTITION BY code
                                      ORDER BY date) AS rn
            FROM (
                SELECT CAST(date_trunc('day', l_shipdate)
                            AS TIMESTAMP) AS date,
                       l_returnflag || l_linestatus AS code,
                       CAST(round(sum(l_extendedprice) * 100, 0)
                            AS BIGINT) AS cents
                FROM lineitem GROUP BY 1, 2
            )
        ), rec AS (
            SELECT code, rn, date, cents,
                   cents AS l, CAST(0 AS BIGINT) AS b,
                   CAST(NULL AS BIGINT) AS fc
            FROM base WHERE rn = 1
            UNION ALL
            SELECT b2.code, b2.rn, b2.date, b2.cents,
                   (b2.cents + 3 * (r.l + r.b)) // 4 AS l,
                   (((b2.cents + 3 * (r.l + r.b)) // 4 - r.l)
                    + 7 * r.b) // 8 AS b,
                   r.l + r.b AS fc
            FROM rec r JOIN base b2
              ON b2.code = r.code AND b2.rn = r.rn + 1
        )
        SELECT code,
               CAST(count(*) AS BIGINT) AS n_forecasts,
               CAST(sum(abs(cents - fc)) AS BIGINT)
                   AS sum_abs_err_cents,
               CAST(sum(abs(cents - fc)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) / 100 AS mae,
               sqrt(CAST(sum((cents - fc) * (cents - fc)) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE)) / 100 AS rmse
        FROM rec WHERE fc IS NOT NULL
        GROUP BY code
        ORDER BY code
    """

    # Round-trip oracle for the MP4 container decode: the Spark side
    # builds minimal ISO BMFF files per doc_id and box-walks them
    # back (ftyp brand, mvhd duration math, tkhd fixed-point dims);
    # the oracle restates the fields arithmetically.
    sql["multimodal_mp4_meta"] = """
        SELECT doc_id,
               CASE WHEN doc_id % 31 = 0 THEN NULL
                    ELSE ['isom','mp42','avc1']
                         [CAST(doc_id % 3 AS INT) + 1]
               END AS brand,
               CASE WHEN doc_id % 31 = 0 THEN NULL
                    ELSE CAST(((1000 + doc_id * 37) * 1000)
                              // ([600,1000,90000]
                                  [CAST(doc_id % 3 AS INT) + 1])
                         AS BIGINT)
               END AS duration_ms,
               CASE WHEN doc_id % 31 = 0 THEN NULL
                    ELSE CAST(1 + doc_id % 2 AS BIGINT)
               END AS n_tracks,
               CASE WHEN doc_id % 31 = 0 THEN NULL
                    ELSE CAST(160 + (doc_id * 3) % 1761 AS BIGINT)
               END AS width,
               CASE WHEN doc_id % 31 = 0 THEN NULL
                    ELSE CAST(90 + (doc_id * 5) % 991 AS BIGINT)
               END AS height
        FROM documents
        ORDER BY doc_id
    """

    # Round-trip oracle for the FULL PNG pixel decode: the Spark side
    # ENCODES a conformant RGB PNG per doc_id (filters cycled) and
    # DECODES it back — CRC verify, inflate, unfilter — aggregating
    # actual pixel bytes; the oracle recomputes the stats from the
    # shared recurrence. CRC-flipped payloads must come back NULL.
    sql["multimodal_png_pixel_stats"] = """
        WITH base AS (
            SELECT doc_id,
                   CAST(4 + doc_id % 13 AS BIGINT) AS width,
                   CAST(5 + doc_id % 11 AS BIGINT) AS height
            FROM documents WHERE doc_id % 29 != 0
        ), exploded AS (
            SELECT doc_id, width, height,
                   unnest(range(0, width * height * 3)) AS p
            FROM base
        ), stats AS (
            SELECT doc_id, width, height,
                   CAST(sum(CASE WHEN p % 3 = 0
                            THEN (doc_id*7 + p*11 + 13) % 256 END)
                        AS BIGINT) AS sum_r,
                   CAST(sum(CASE WHEN p % 3 = 1
                            THEN (doc_id*7 + p*11 + 13) % 256 END)
                        AS BIGINT) AS sum_g,
                   CAST(sum(CASE WHEN p % 3 = 2
                            THEN (doc_id*7 + p*11 + 13) % 256 END)
                        AS BIGINT) AS sum_b,
                   CAST(max((doc_id*7 + p*11 + 13) % 256)
                        AS BIGINT) AS peak
            FROM exploded
            GROUP BY doc_id, width, height
        )
        SELECT doc_id, width, height,
               CAST(width * height AS BIGINT) AS n_pixels,
               sum_r, sum_g, sum_b, peak
        FROM stats
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 29 = 0
        ORDER BY doc_id
    """

    # Round-trip oracle for the FULL GIF (LZW) pixel decode: widths,
    # palette and index recurrences restated arithmetically; the
    # palette lookup folds into pure mod arithmetic (palette entry i
    # = ((i*41+7)%256, ...) with i = (doc_id*5 + p*7 + 3) % ps), so
    # no palette table is needed. Truncated payloads (every 31st id)
    # must decode to NULLs.
    sql["multimodal_gif_pixel_stats"] = """
        WITH base AS (
            SELECT doc_id,
                   CAST(3 + doc_id % 9 AS BIGINT) AS width,
                   CAST(2 + doc_id % 7 AS BIGINT) AS height,
                   CAST(CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 8
                        ELSE 16 END AS BIGINT) AS ps
            FROM documents WHERE doc_id % 31 != 0
        ), exploded AS (
            SELECT doc_id, width, height, ps,
                   (doc_id*5 + unnest(range(0, width*height))*7 + 3)
                       % ps AS ix
            FROM base
        ), stats AS (
            SELECT doc_id, width, height, ps,
                   CAST(sum((ix*41 + 7) % 256) AS BIGINT) AS sum_r,
                   CAST(sum((ix*59 + 3) % 256) AS BIGINT) AS sum_g,
                   CAST(sum((ix*83 + 11) % 256) AS BIGINT) AS sum_b,
                   CAST(max(ix) AS BIGINT) AS max_index
            FROM exploded
            GROUP BY doc_id, width, height, ps
        )
        SELECT doc_id, width, height,
               CAST(width * height AS BIGINT) AS n_pixels,
               ps AS palette_size, sum_r, sum_g, sum_b, max_index
        FROM stats
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 31 = 0
        ORDER BY doc_id
    """

    # Round-trip oracle for the REAL BMP pixel decode: recomputes the
    # per-pixel recurrence (8-bit via the palette map, 24-bit direct)
    # arithmetically — positive-operand integer mod, identical bits.
    # first_r is p = 0 in TOP-DOWN image order: the encoder stores
    # even ids bottom-up, so a decoder that ignores biHeight's sign
    # passes the sums and fails exactly this column.
    sql["multimodal_bmp_pixel_stats"] = """
        WITH base AS (
            SELECT doc_id,
                   CAST(2 + doc_id % 9 AS BIGINT) AS width,
                   CAST(1 + doc_id % 6 AS BIGINT) AS height,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 24 END
                        AS BIGINT) AS bpp
            FROM documents WHERE doc_id % 27 != 0
        ), exploded AS (
            SELECT doc_id, width, height, bpp,
                   unnest(range(0, width*height)) AS p
            FROM base
        ), px AS (
            SELECT doc_id, width, height, bpp,
                   CASE WHEN bpp = 8
                        THEN (((doc_id + p*3) % 16)*19 + 5) % 256
                        ELSE (doc_id*3 + p*7 + 1) % 256 END AS r,
                   CASE WHEN bpp = 8
                        THEN (((doc_id + p*3) % 16)*37 + 9) % 256
                        ELSE (doc_id*5 + p*11 + 2) % 256 END AS g,
                   CASE WHEN bpp = 8
                        THEN (((doc_id + p*3) % 16)*53 + 13) % 256
                        ELSE (doc_id*7 + p*13 + 3) % 256 END AS b
            FROM exploded
        ), stats AS (
            SELECT doc_id, width, height, bpp,
                   CAST(sum(r) AS BIGINT) AS sum_r,
                   CAST(sum(g) AS BIGINT) AS sum_g,
                   CAST(sum(b) AS BIGINT) AS sum_b,
                   CAST(max(greatest(r, g, b)) AS BIGINT) AS peak
            FROM px GROUP BY doc_id, width, height, bpp
        )
        SELECT doc_id, width, height,
               CAST(width * height AS BIGINT) AS n_pixels, bpp,
               sum_r, sum_g, sum_b,
               CAST(CASE WHEN bpp = 8
                    THEN ((doc_id % 16)*19 + 5) % 256
                    ELSE (doc_id*3 + 1) % 256 END AS BIGINT) AS first_r,
               peak
        FROM stats
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
               NULL, NULL
        FROM documents WHERE doc_id % 27 = 0
        ORDER BY doc_id
    """

    # Round-trip oracle for the REAL TIFF metadata decode: endian /
    # page count / dims / bit depth all pure integer arithmetic on
    # doc_id; total_pixels sums page products via unnest(range()).
    # FLAC: every STREAMINFO bit field recomputed from the doc_id
    # recurrence; the hex digest via md5(doc_id string) in BOTH
    # engines; duration = integer division (positive operands)
    sql["multimodal_flac_meta"] = """
        WITH base AS (
            SELECT doc_id,
                   CAST([8000,16000,44100,48000]
                        [CAST(doc_id % 4 AS INT) + 1] AS BIGINT)
                       AS sample_rate,
                   CAST(1 + doc_id % 2 AS BIGINT) AS channels,
                   CAST([8,16,24][CAST(doc_id % 3 AS INT) + 1]
                        AS BIGINT) AS bits_per_sample,
                   CAST(1000 + (doc_id * 77) % 100000 AS BIGINT)
                       AS total_samples,
                   CAST(CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END
                        AS BIGINT) AS n_blocks
            FROM documents WHERE doc_id % 31 != 0
        )
        SELECT doc_id, sample_rate, channels, bits_per_sample,
               total_samples, n_blocks,
               total_samples * 1000 // sample_rate AS duration_ms,
               md5(CAST(doc_id AS VARCHAR)) AS audio_md5
        FROM base
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 31 = 0
        ORDER BY doc_id
    """

    # mp3: bitrate/rate tables as list literals; padding count via
    # list_filter over range; all byte math integer
    sql["multimodal_mp3_meta"] = """
        WITH base AS (
            SELECT doc_id,
                   CAST([32,40,48,56,64,80,96,112,128,160,192,224,
                         256,320][CAST(doc_id % 14 AS INT) + 1]
                        AS BIGINT) AS kbps,
                   CAST([44100,48000,32000]
                        [CAST(doc_id % 3 AS INT) + 1] AS BIGINT)
                       AS rate,
                   CAST(3 + doc_id % 5 AS BIGINT) AS nf,
                   CASE WHEN doc_id % 4 = 0 THEN 74 ELSE 0 END
                       AS id3_bytes
            FROM documents WHERE doc_id % 29 != 0
        ),
        ext AS (
            SELECT doc_id, kbps, rate, nf, id3_bytes,
                   CAST(len(list_filter(range(nf),
                        i -> (doc_id + i) % 3 = 0)) AS BIGINT)
                       AS n_padded
            FROM base
        )
        SELECT doc_id, rate AS sample_rate, kbps AS bitrate_kbps,
               nf AS n_frames, n_padded,
               CAST(CASE WHEN id3_bytes > 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS has_id3,
               nf * (144000 * kbps // rate) + n_padded + id3_bytes
                   AS total_bytes,
               nf * 1152 * 1000 // rate AS duration_ms
        FROM ext
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 29 = 0
        ORDER BY doc_id
    """

    # pdf: all fields arithmetic; the xref offset via string-length
    # arithmetic over the same literal grammar the encoder uses
    sql["multimodal_pdf_meta"] = """
        WITH base AS (
            SELECT doc_id,
                   '1.' || CAST(4 + doc_id % 4 AS VARCHAR)
                       AS version,
                   CAST(1 + doc_id % 4 AS BIGINT) AS n_pages,
                   CAST(200 + (doc_id * 3) % 400 AS BIGINT) AS w,
                   CAST(200 + (doc_id * 5) % 600 AS BIGINT) AS h
            FROM documents WHERE doc_id % 47 != 0
        ),
        lens AS (
            SELECT doc_id, version, n_pages, w, h,
                   CAST(length('%PDF-' || version) + 1
                   + length('1 0 obj') + 1
                   + length('<< /Type /Catalog /Pages 2 0 R >>') + 1
                   + length('endobj') + 1
                   + length('2 0 obj') + 1
                   + length('<< /Type /Pages /Kids ['
                     || array_to_string(list_transform(range(n_pages),
                            i -> CAST(3 + i AS VARCHAR) || ' 0 R'),
                            ' ')
                     || '] /Count ' || CAST(n_pages AS VARCHAR)
                     || ' >>') + 1
                   + length('endobj') + 1
                   + n_pages * (length('3 0 obj') + 1
                     + length('<< /Type /Page /Parent 2 0 R '
                              || '/MediaBox [0 0 '
                              || CAST(w AS VARCHAR) || ' '
                              || CAST(h AS VARCHAR) || '] >>') + 1
                     + length('endobj') + 1)
                   AS BIGINT) AS xref_offset
            FROM base
        )
        SELECT doc_id, version,
               n_pages + 3 AS n_objects,
               n_pages, w AS page_width, h AS page_height,
               xref_offset
        FROM lens
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 47 = 0
        ORDER BY doc_id
    """

    # zip: entry/byte totals from the deterministic name/content
    # grammar, list_transform sums over range(n)
    sql["multimodal_zip_meta"] = """
        WITH base AS (
            SELECT doc_id, CAST(1 + doc_id % 4 AS BIGINT) AS n
            FROM documents WHERE doc_id % 41 != 0
        ),
        sums AS (
            SELECT doc_id, n,
                   CAST(list_sum(list_transform(range(n),
                        i -> (1 + (doc_id + i) % 3)
                             * length('doc' || CAST(doc_id AS VARCHAR)
                                      || 'entry'
                                      || CAST(i AS VARCHAR))))
                        AS BIGINT) AS tot_u,
                   CAST(list_sum(list_transform(range(n),
                        i -> length('f' || CAST(i AS VARCHAR)
                                    || '.txt')))
                        AS BIGINT) AS names_len
            FROM base
        )
        SELECT doc_id, n AS n_entries,
               tot_u AS total_uncompressed,
               tot_u AS total_compressed,
               names_len AS names_len_sum,
               46 * n + names_len AS cd_size,
               30 * n + names_len + tot_u
                   + (46 * n + names_len) + 22 AS total_bytes
        FROM sums
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 41 = 0
        ORDER BY doc_id
    """

    # webp: variant by parity, dims/alpha/exif arithmetic, riff size
    # from the exact chunk byte layout (incl. the odd-size pad rule)
    sql["multimodal_webp_meta"] = """
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 1 THEN 'VP8L'
                        ELSE 'VP8X' END AS format,
                   CAST(16 + (doc_id * 7) % 300 AS BIGINT) AS width,
                   CAST(16 + (doc_id * 13) % 200 AS BIGINT) AS height,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS has_alpha,
                   CASE WHEN doc_id % 5 = 0
                        THEN 8 + doc_id % 5 ELSE 0 END AS exif
            FROM documents WHERE doc_id % 43 != 0
        )
        SELECT doc_id, format, width, height, has_alpha,
               CAST(CASE WHEN exif > 0 THEN 2 ELSE 1 END AS BIGINT)
                   AS n_chunks,
               4 + CASE WHEN format = 'VP8L' THEN 14 ELSE 18 END
                 + CASE WHEN exif > 0
                        THEN 8 + exif + exif % 2 ELSE 0 END
                   AS riff_size
        FROM base
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 43 = 0
        ORDER BY doc_id
    """

    sql["multimodal_tiff_meta"] = """
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
                       AS endian,
                   CAST(1 + doc_id % 3 AS BIGINT) AS n_pages,
                   CAST([8, 16, 32][CAST(doc_id % 3 AS INT) + 1]
                        AS BIGINT) AS bits
            FROM documents WHERE doc_id % 37 != 0
        ), exploded AS (
            SELECT doc_id, unnest(range(0, n_pages)) AS k
            FROM base
        ), totals AS (
            SELECT doc_id,
                   CAST(sum((8 + (doc_id*5 + k*7) % 120)
                            * (4 + (doc_id*3 + k*11) % 80))
                        AS BIGINT) AS total_pixels
            FROM exploded GROUP BY doc_id
        )
        SELECT b.doc_id, b.endian, b.n_pages,
               CAST(8 + (b.doc_id*5) % 120 AS BIGINT) AS width,
               CAST(4 + (b.doc_id*3) % 80 AS BIGINT) AS height,
               b.bits, t.total_pixels
        FROM base b JOIN totals t USING (doc_id)
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 37 = 0
        ORDER BY doc_id
    """

    # Round-trip oracle for the REAL WAV audio decode: the Spark side
    # ENCODES a PCM16 WAV per doc_id (samples from an integer
    # recurrence) and PARSES it back including the sample data; the
    # oracle recomputes container fields arithmetically and the
    # sample stats via a lateral generate_series over the SAME
    # recurrence — positive-operand integer mod, identical bits.
    sql["multimodal_wav_stats"] = """
        WITH base AS (
            SELECT doc_id,
                   CAST(1 + doc_id % 2 AS BIGINT) AS channels,
                   CAST([8000,16000,22050,44100]
                        [CAST(doc_id % 4 AS INT) + 1] AS BIGINT)
                       AS sample_rate,
                   CAST(32 + doc_id % 33 AS BIGINT) AS n_frames
            FROM documents WHERE doc_id % 19 != 0
        ), exploded AS (
            -- lateral generate_series doesn't take column args in
            -- DuckDB; the scalar list range() + unnest does
            SELECT doc_id, channels, sample_rate, n_frames,
                   unnest(range(0, n_frames * channels)) AS j
            FROM base
        ), stats AS (
            SELECT doc_id, channels, sample_rate, n_frames,
                   CAST(sum(abs(((doc_id*31 + j*17 + 7) % 65536)
                                - 32768)) AS BIGINT) AS sum_abs,
                   CAST(max(abs(((doc_id*31 + j*17 + 7) % 65536)
                                - 32768)) AS BIGINT) AS peak
            FROM exploded
            GROUP BY doc_id, channels, sample_rate, n_frames
        )
        SELECT doc_id, channels, sample_rate,
               CAST(16 AS BIGINT) AS bits, n_frames,
               CAST((n_frames * 1000) // sample_rate AS BIGINT)
                   AS duration_ms,
               sum_abs, peak
        FROM stats
        UNION ALL
        SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE doc_id % 19 = 0
        ORDER BY doc_id
    """

    # Round-trip oracle for the BCRP catalogue normalizer: the Spark
    # side SYNTHESIZES the four frequency pages from nation (messy
    # whitespace, '- (N series)' suffixes, missing fuente/links, an
    # empty section) and PARSES them back with sources/bcrp_catalog;
    # the oracle states the expected catalogue rows directly from
    # nation — same branch arithmetic, no HTML.
    sql["bcrp_catalog_listing"] = """
        SELECT f.freq_label,
               f.freq,
               'Grupo R' || CAST(n_regionkey AS VARCHAR) AS "group",
               CASE WHEN n_regionkey % 2 = 0
                    THEN 'BCRP area ' || CAST(n_regionkey AS VARCHAR)
               END AS source,
               CASE WHEN n_nationkey % 7 != 3
                    THEN 'PN' || CAST(n_nationkey AS VARCHAR) || f.freq
               END AS code,
               CASE WHEN n_nationkey % 5 != 4
                    THEN n_name || ' series' END AS description,
               '1990' AS fecha_inicio,
               CASE WHEN n_nationkey % 2 = 0 THEN '2024'
                    ELSE 'n/a' END AS fecha_fin,
               CASE WHEN n_nationkey % 7 != 3
                    THEN '/series/PN' || CAST(n_nationkey AS VARCHAR)
                         || f.freq
               END AS url,
               '12 - Ene - 2024' AS last_update
        FROM nation
        CROSS JOIN (VALUES ('diarias','D'), ('mensuales','M'),
                    ('trimestrales','Q'), ('anuales','A'))
             AS f(freq_label, freq)
        ORDER BY freq_label, "group", fecha_fin, code
    """

    # Round-trip oracle for the electoral-process metadata pipeline:
    # the Spark side SYNTHESIZES the options page / per-process JSON /
    # per-election ficha responses from region+nation and runs the
    # real parse→explode→enrich chain; the oracle states the expected
    # process → elections table directly from nation arithmetic.
    sql["infogob_proceso_elections"] = """
        SELECT 'P' || CAST(n_regionkey AS VARCHAR) AS id_proceso,
               CASE n_regionkey
                    WHEN 0 THEN 'ELECCIONES PRESIDENCIALES'
                    WHEN 1 THEN 'ELECCIONES CONGRESALES'
                    WHEN 2 THEN 'ELECCIONES REGIONALES'
                    WHEN 3 THEN 'ELECCIONES MUNICIPALES DISTRITALES'
                    ELSE 'PROCESO DESCONOCIDO'
               END AS proceso_electoral,
               array_to_string(list_transform(
                   string_split(lower(n_name), ' '),
                   w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ')
                   AS name_eleccion,
               CAST(n_nationkey + 100 AS VARCHAR) AS id_eleccion,
               'https://infogob.jne.pe/Eleccion/'
                   || '_candidatos-y-resultados_/ficha'
                   || CAST(n_nationkey + 100 AS VARCHAR)
                   AS url_redirect,
               'G' || CAST(n_nationkey * 7 AS VARCHAR)
                   AS id_group_eleccion,
               CAST(1 + n_nationkey % 3 AS BIGINT) AS n_level,
               CAST(CASE n_regionkey
                    WHEN 0 THEN 1001 WHEN 1 THEN 5111
                    WHEN 2 THEN 2001 WHEN 3 THEN 4001
               END AS BIGINT) AS istr_value,
               CASE WHEN n_regionkey <= 3 THEN
                    CAST(CASE n_regionkey
                         WHEN 0 THEN 1001 WHEN 1 THEN 5111
                         WHEN 2 THEN 2001 WHEN 3 THEN 4001
                    END AS VARCHAR)
                    || CAST(n_nationkey + 100 AS VARCHAR)
                    || '@G' || CAST(n_nationkey * 7 AS VARCHAR)
               END AS istr
        FROM nation
        ORDER BY id_proceso, id_eleccion
    """

    # Binary-quantized Hamming top-k: sign-bit signatures in 32-bit
    # words (1 << 63 is a range error in DuckDB — the word size is
    # part of the cross-engine contract), popcount-of-xor distance.
    # Sign tests involve no arithmetic, so the bits — and therefore
    # every output value — are integer-exact in both engines.
    sql["ann_hamming_topk"] = """
        WITH sig AS (
            SELECT vec_id,
                   list_transform(range(2), w ->
                       CAST(list_sum(list_transform(range(32), i ->
                           CASE WHEN embedding[CAST(w*32 + i + 1 AS INT)]
                                     >= 0
                                THEN (1::BIGINT << CAST(i AS INT))
                                ELSE 0::BIGINT END)) AS BIGINT)) AS sg
            FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, sg AS qsg FROM sig
            WHERE vec_id IN (0, 7, 42, 99, 123)
        ), p AS (
            SELECT q.query_id, s.vec_id,
                   CAST(list_sum(list_transform(range(2), w ->
                       CAST(bit_count(xor(s.sg[CAST(w+1 AS INT)],
                                          q.qsg[CAST(w+1 AS INT)]))
                            AS BIGINT))) AS BIGINT) AS hamming
            FROM sig s, q WHERE s.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, hamming,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY hamming, vec_id) AS BIGINT) AS rank
        FROM p
        QUALIFY rank <= 5
        ORDER BY query_id, rank
    """

    # Round-trip oracles for the affiliation-history normalizer
    # (sources/infogob_historial.py, reference
    # 41_candidatos_historial.py): the Spark side synthesizes ficha
    # HTML from customer-key arithmetic and PARSES it back; the
    # oracle restates the expected rows from the same arithmetic.
    # Section count = (k even) + k%3; org block cycles absent (%7) →
    # no-anchor (%11) → no-data-val (%5) → full, evaluated in that
    # ELIF order.
    # Series-depth pre-flight card: counts per code over the daily
    # series frame; share/depth ship as RAW int/int doubles (the
    # CLAUDE.md rule — bit-identical cross-engine). The sums are
    # CAST to BIGINT before the division (DuckDB sum → HUGEINT).
    sql["ts_series_depth_profile"] = """
        WITH s AS (
            SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP)
                       AS date,
                   l_returnflag || l_linestatus AS code
            FROM lineitem GROUP BY 1, 2
        ), c AS (
            SELECT code, CAST(count(*) AS BIGINT) AS n_obs,
                   min(date) AS first_date, max(date) AS last_date
            FROM s GROUP BY code
        ), t AS (
            SELECT CAST(sum(n_obs) AS BIGINT) AS total,
                   CAST(max(n_obs) AS BIGINT) AS deepest
            FROM c
        )
        SELECT code, n_obs, first_date, last_date,
               n_obs / total AS share,
               n_obs / deepest AS depth_vs_max
        FROM c, t
        ORDER BY n_obs DESC, code ASC
    """

    sql["infogob_candidate_affiliations"] = """
        WITH c AS (
            SELECT c_custkey AS k,
                   (CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END
                    + c_custkey % 3) AS ns
            FROM customer
        ), s AS (
            SELECT k, UNNEST(range(ns)) AS j FROM c
        )
        SELECT 'PER' || CAST(k AS VARCHAR) AS id_persona,
               '/Politico/ficha' || CAST(k AS VARCHAR)
                   AS url_politico,
               CAST(j AS BIGINT) AS seccion,
               CASE WHEN k % 2 = 0 AND j = 0
                    THEN 'Afiliación Vigente'
                    ELSE 'Historial de Afiliaciones' END AS titulo,
               CAST(CASE WHEN k % 2 = 0 AND j = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS activa,
               CASE WHEN (k + j) % 7 = 0 THEN NULL
                    WHEN (k + j) % 11 = 0 THEN NULL
                    ELSE 'Partido ' || CAST((k*3 + j) % 20 AS VARCHAR)
               END AS organizacion_politica,
               CASE WHEN (k + j) % 7 = 0 THEN NULL
                    WHEN (k + j) % 11 = 0 THEN NULL
                    ELSE '/Org/ficha' || CAST((k*3 + j) % 20 AS VARCHAR)
               END AS url_organizacion,
               CASE WHEN (k + j) % 7 = 0 THEN NULL
                    WHEN (k + j) % 11 = 0
                         THEN 'OP' || CAST((k*3 + j) % 20 AS VARCHAR)
                    WHEN (k + j) % 5 = 0 THEN NULL
                    ELSE 'OP' || CAST((k*3 + j) % 20 AS VARCHAR)
               END AS id_organizacion
        FROM s
        ORDER BY id_persona, seccion
    """

    sql["infogob_affiliation_fields"] = """
        WITH c AS (
            SELECT c_custkey AS k,
                   (CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END
                    + c_custkey % 3) AS ns
            FROM customer
        ), s AS (
            SELECT k, UNNEST(range(ns)) AS j FROM c
        ), b AS (
            SELECT k, j, CAST((k*5 + j) % 100 AS VARCHAR) AS x,
                   (k % 2 = 0 AND j = 0) AS vig
            FROM s
        )
        SELECT 'PER' || CAST(k AS VARCHAR) AS id_persona,
               CAST(j AS BIGINT) AS seccion, campo, valor
        FROM (
            SELECT k, j, 'fecha_de_afiliacion' AS campo,
                   'F' || x AS valor
            FROM b
            UNION ALL
            SELECT k, j, 'fecha_de_renuncia', 'R' || x || ' del 2020'
            FROM b WHERE NOT vig
            UNION ALL
            SELECT k, j, 'estado',
                   CASE WHEN vig THEN 'VIGENTE' ELSE 'CONCLUIDO' END
            FROM b WHERE (k + j) % 13 <> 0
        )
        ORDER BY id_persona, seccion, campo
    """

    # Round-trip oracle for the REAL stdlib image decode: the Spark
    # side ENCODES spec-conformant PNG/JPEG/GIF/BMP header bytes from
    # doc_id arithmetic and PARSES them back (binary_ops.
    # parse_image_header); the oracle recomputes the same
    # (format, width, height, bit_depth) arithmetically — identical
    # integer mod/index math to _corpus_image_spec, NULLs for the
    # planted truncated payloads.
    sql["multimodal_image_dims"] = """
        SELECT doc_id,
               CASE WHEN doc_id % 23 = 0 THEN NULL
                    ELSE ['png','jpeg','gif','bmp'][(doc_id % 4) + 1]
               END AS format,
               CASE WHEN doc_id % 23 = 0 THEN NULL
                    ELSE 16 + (doc_id * 7) % 2033 END AS width,
               CASE WHEN doc_id % 23 = 0 THEN NULL
                    ELSE 16 + (doc_id * 13) % 1525 END AS height,
               CASE WHEN doc_id % 23 = 0 THEN NULL
                    WHEN doc_id % 4 = 0 THEN
                         CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END
                    WHEN doc_id % 4 = 1 THEN 8
                    WHEN doc_id % 4 = 2 THEN (doc_id % 8) + 1
                    ELSE [1,4,8,24,32][CAST(doc_id % 5 AS INT) + 1]
               END AS bit_depth
        FROM documents
        ORDER BY doc_id
    """

    return sql
