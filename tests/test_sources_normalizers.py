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


# ---------------------------------------------------------------------------
# infogob affiliation history (41_candidatos_historial.py semantics)
# ---------------------------------------------------------------------------

from pyperustats_spark.sources.infogob_historial import (  # noqa: E402
    affiliation_fields, affiliation_sections)


def _pages(spark, html):
    df = spark.createDataFrame([("PER9", "/Politico/ficha9", html)],
                               "id_persona string, url_politico string, "
                               "html string")
    return affiliation_sections(df)


def _wrap(sections_html):
    return ('<html><h3>Ficha</h3><div id="HistorialPartidario">'
            + sections_html + "</div><footer>x</footer></html>")


def test_affiliation_sections_walk_and_activa(spark):
    html = _wrap(
        '<h5> Afiliación Vigente </h5><div class="content">'
        '<span class="linkOrgPol" data-val="OP1">'
        '<a href="/Org/1"><b>Partido</b>  Uno </a></span></div>'
        "<h5>historial de afiliaciones 2010</h5>"
        '<p>nota intermedia</p><div class="content"></div>'
        "<h5>OTRA SECCION</h5>"
        '<div class="content"><span class="etiqueta">E:</span></div>')
    rows = _pages(spark, html).orderBy("seccion").collect()
    assert [r["seccion"] for r in rows] == [0, 1, 2]
    # metadata carries through (the reference's {**metadata, ...})
    assert rows[0]["id_persona"] == "PER9"
    assert rows[0]["url_politico"] == "/Politico/ficha9"
    assert rows[0]["titulo"] == "Afiliación Vigente"
    assert rows[0]["activa"] == 1
    # title match is on the UPPERCASED text (reference .upper())
    assert rows[1]["activa"] == 0
    # any non-historial header is the live affiliation (the
    # reference's else branch, not an explicit VIGENTE check)
    assert rows[2]["activa"] == 1
    # org link: text tags stripped + ws collapsed, href, data-val
    assert rows[0]["organizacion_politica"] == "Partido Uno"
    assert rows[0]["url_organizacion"] == "/Org/1"
    assert rows[0]["id_organizacion"] == "OP1"
    # section without any org span → all three NULL
    assert rows[1]["organizacion_politica"] is None
    assert rows[1]["id_organizacion"] is None


def test_affiliation_sections_org_variants_and_skips(spark):
    html = _wrap(
        # h5 with NO content sibling before the next h5 → no row
        "<h5>Sin contenido</h5>"
        # org span missing the <a> → name/url NULL, id kept
        '<h5>Historial de Afiliaciones</h5><div class="content">'
        '<span class="linkOrgPol" data-val="OP7">sin enlace</span>'
        "</div>"
        # org span with <a> but no data-val → id NULL
        '<h5>Historial de Afiliaciones</h5><div class="content">'
        '<span class="linkOrgPol"><a href="/Org/3">P3</a></span>'
        "</div>")
    rows = _pages(spark, html).orderBy("seccion").collect()
    assert len(rows) == 2                      # content-less h5 skipped
    assert rows[0]["organizacion_politica"] is None
    assert rows[0]["url_organizacion"] is None
    assert rows[0]["id_organizacion"] == "OP7"
    assert rows[1]["organizacion_politica"] == "P3"
    assert rows[1]["id_organizacion"] is None


def test_affiliation_sections_no_container_no_rows(spark):
    out = _pages(spark, "<html><h5>t</h5><div class='content'></div>"
                        "</html>")
    assert out.count() == 0


def test_affiliation_fields_folding_pairing_and_skips(spark):
    html = _wrap(
        '<h5>Historial de Afiliaciones</h5><div class="content">'
        # all five folded vowels + colon stripped + spaces → _
        '<span class="etiqueta"> Ubicación Geográfica Vé Í Ú: </span>'
        '<span class="control"> Lima <i>/</i> Perú </span>'
        # control after an intervening sibling (find_next_sibling)
        '<span class="etiqueta">Estado:</span><em>al corte</em>'
        '<span class="control">VIGENTE</span>'
        # etiqueta with NO control before end of block → skipped
        '<span class="etiqueta">Huérfana:</span>'
        "</div>"
        # ñ is NOT folded (the reference folds only óíéáú)
        '<h5>Historial de Afiliaciones</h5><div class="content">'
        '<span class="etiqueta">Año De Inscripción:</span>'
        '<span class="control">1995</span></div>')
    rows = affiliation_fields(_pages(spark, html)) \
        .orderBy("seccion", "campo").collect()
    got = {(r["seccion"], r["campo"]): r["valor"] for r in rows}
    assert got == {
        (0, "ubicacion_geografica_ve_i_u"): "Lima / Perú",
        (0, "estado"): "VIGENTE",
        (1, "año_de_inscripcion"): "1995",
    }
    # carry columns ride through the explode
    assert all(r["id_persona"] == "PER9" for r in rows)
