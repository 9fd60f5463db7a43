"""BCRP catalogue + infogob procesos normalizers: field-for-field
parity with the reference parsers' semantics (BCRP/metadata.py
_clean_text/_parse_series_table/_scrape_metadata and
00_procesos_electorales_metadata.py) on handcrafted inputs covering
the branches the round-trip oracle queries don't plant."""

import json

from pyspark.sql import functions as F

from pyperustats_spark.sources.bcrp_catalog import catalog_listing
from pyperustats_spark.sources.infogob_procesos import (
    ISTR_MAP, elections_from_json, enrich_elections, proceso_options)


def _catalog(spark, html, freq_label="mensuales"):
    df = spark.createDataFrame([(freq_label, html)],
                               "freq_label string, html string")
    return catalog_listing(df).collect()


def _section(body, h2="<h2>Grupo A</h2>",
             fuente='<p class="fuente">Fuente: BCRP</p>'):
    return (f'<div class="tcg-elevator">{h2}{fuente}'
            f'<table class="series"><tr><th>h</th></tr>{body}</table>'
            "</div>")


FULL_ROW = ('<tr><td>1</td>'
            '<td><a href="/series/PN1">  PN1  </a></td>'
            '<td><a href="#"><b>PBI</b>   real </a></td>'
            "<td> 1990 </td><td>2024</td><td> 12  - Ene - 2024 </td></tr>")


def test_catalog_full_row(spark):
    [r] = _catalog(spark, "<html>" + _section(FULL_ROW) + "</html>")
    assert r["freq_label"] == "mensuales"
    assert r["freq"] == "M"
    assert r["group"] == "Grupo A"
    assert r["source"] == "BCRP"
    assert r["code"] == "PN1"
    assert r["description"] == "PBI real"      # tags stripped, ws collapsed
    assert r["fecha_inicio"] == "1990"
    assert r["fecha_fin"] == "2024"
    assert r["url"] == "/series/PN1"
    assert r["last_update"] == "12 - Ene - 2024"


def test_catalog_clean_text_series_suffix_and_missing_bits(spark):
    html = ("<html>"
            + _section(FULL_ROW,
                       h2="<h2>  Tipo   de cambio - (15 series) y mas </h2>",
                       fuente="")
            + "</html>")
    [r] = _catalog(spark, html)
    assert r["group"] == "Tipo de cambio"       # suffix dropped
    assert r["source"] is None                  # no p.fuente → None


def test_catalog_row_without_links(spark):
    row = ("<tr><td>1</td><td><span>x</span></td><td>no link</td>"
           "<td>1990</td><td>n/a</td><td>hoy</td></tr>")
    [r] = _catalog(spark, "<html>" + _section(row) + "</html>")
    assert r["code"] is None and r["url"] is None
    assert r["description"] is None


def test_catalog_skips_headers_empty_sections_and_short_rows(spark):
    html = ("<html>"
            # section with no series table → no rows
            + '<div class="tcg-elevator"><h2>Vacio</h2></div>'
            # headers-only table → no rows
            + _section("")
            # a 3-cell row (reference would IndexError; dropped here)
            + _section("<tr><td>a</td><td>b</td><td>c</td></tr>")
            + "</html>")
    assert _catalog(spark, html) == []


def test_catalog_unknown_freq_label_is_null(spark):
    [r] = _catalog(spark, "<html>" + _section(FULL_ROW) + "</html>",
                   freq_label="semanales")
    assert r["freq"] is None


def test_proceso_options_skips_placeholder_and_null_value(spark):
    html = ('<html><select id="IdTipoProceso">'
            '<option value="">Seleccione</option>'
            '<option value="1"> ELECCIONES  PRESIDENCIALES </option>'
            "<option>SIN VALOR</option>"
            '</select><select id="Otro"><option value="9">x</option>'
            "</select></html>")
    df = spark.createDataFrame([(html,)], "html string")
    rows = {r["proceso_electoral"]: r["id_proceso"]
            for r in proceso_options(df).collect()}
    # only the target select, placeholder skipped, text stripped,
    # missing value attribute → NULL (option.get("value"))
    assert rows == {"ELECCIONES  PRESIDENCIALES": "1", "SIN VALOR": None}


def test_elections_from_json_skips_placeholder_and_titles(spark):
    payload = json.dumps({"Data": [
        {"Text": "seleccione", "Value": ""},
        {"Text": "elecciones generales 2021", "Value": "14"},
        {"Text": "SEGUNDA VUELTA", "Value": "15"},
    ]})
    df = spark.createDataFrame(
        [("EP", "1", payload)],
        "proceso_electoral string, id_proceso string, json string")
    rows = {r["id_eleccion"]: r for r in
            elections_from_json(df).collect()}
    assert set(rows) == {"14", "15"}
    assert rows["14"]["name_eleccion"] == "Elecciones Generales 2021"
    assert rows["15"]["name_eleccion"] == "Segunda Vuelta"
    assert rows["14"]["proceso_electoral"] == "EP"   # carry columns


def test_enrich_elections_derivations(spark):
    elections = spark.createDataFrame(
        [("ELECCIONES CONGRESALES", "1", "Ep 2021", "14"),
         ("PROCESO RARO", "2", "Otro", "15")],
        "proceso_electoral string, id_proceso string, "
        "name_eleccion string, id_eleccion string")
    resultados = ('<input id="IdGrupoEleccion" value="G7"/>'
                  '<div id="CandidatosResultados">'
                  "<select></select><select></select></div>")
    fichas = spark.createDataFrame(
        [("14", "/Eleccion/_normativa_/ficha14", resultados)],
        "id_eleccion string, location string, resultados_html string")
    out = {r["id_eleccion"]: r for r in enrich_elections(
        elections, fichas, base_url="https://x").collect()}
    r14 = out["14"]
    assert r14["url_redirect"] == \
        "https://x/Eleccion/_candidatos-y-resultados_/ficha14"
    assert r14["id_group_eleccion"] == "G7"
    assert r14["n_level"] == 2
    assert r14["istr_value"] == ISTR_MAP["ELECCIONES CONGRESALES"]
    assert r14["istr"] == "511114@G7"
    # unknown process + missing ficha → NULL enrichments, NULL istr
    r15 = out["15"]
    assert r15["istr_value"] is None and r15["istr"] is None
    assert r15["url_redirect"] is None and r15["n_level"] is None
