"""Multi-table electoral-response normalization (reference
``procesar_respuesta``, perustats/infogob/utils.py:109-137): one nested
payload column → header + detail + processed-flag frames."""

from pyspark.sql import functions as F

from pyperustats_spark.sources.json_api import (
    CANDIDATE_KEYS,
    candidate_detail_counts,
    normalize_candidates,
    normalize_electoral_response,
    pending_requests,
)

PAYLOAD_OK = (
    '{"Estado": "success", "Data": {"DatosGenerales": {'
    '"NuVotosEmi": "1,234", "NuElectores": "2,000", '
    '"NuPorcPart": "61.7%", "NuPorcAusen": "38.3", "TxPregunta": "Q?"}, '
    '"Resultados": ['
    '{"IdOrgPol": "7", "TxOrgPol": "A", "NuOrgVotos": "1,000", '
    '"NuOrgPorc": "81.04%"}, '
    '{"IdOrgPol": "9", "TxOrgPol": "B", "NuOrgVotos": "234", '
    '"NuOrgPorc": "18.96"}]}}'
)
PAYLOAD_EMPTY = (
    '{"Estado": "success", "Data": {"DatosGenerales": {'
    '"NuVotosEmi": "9"}, "Resultados": []}}'
)
PAYLOAD_ERR = '{"Estado": "error", "Data": {"Resultados": []}}'
PAYLOAD_BAD = '{"Estado": "succ'


def _raw(spark):
    rows = [
        (1, 10, 100, PAYLOAD_OK),
        (1, 10, 101, PAYLOAD_EMPTY),
        (1, 10, 102, PAYLOAD_ERR),
        (1, 10, 103, PAYLOAD_BAD),
    ]
    return spark.createDataFrame(
        rows,
        "id_eleccion int, id_group_eleccion int, id_location_req int, "
        "payload string")


def test_header_detail_processed_split(spark):
    out = normalize_electoral_response(_raw(spark))

    header = {r["id_location_req"]: r for r in out.header.collect()}
    # error + malformed responses never produce rows
    assert set(header) == {100, 101}
    h = header[100]
    assert h["num_votos_emitidos"] == 1234       # comma stripped
    assert h["num_electores"] == 2000
    assert h["num_percent_part"] == 61.7          # % stripped
    assert h["num_percent_ausen"] == 38.3
    assert h["txt_pregunta"] == "Q?"
    # missing fields coerce to NULL, not a crash (ANSI-safe try_cast)
    assert header[101]["num_percent_part"] is None

    detail = out.detail.orderBy("id_org_politica").collect()
    # empty Resultados → header row WITHOUT detail rows
    assert [r["id_location_req"] for r in detail] == [100, 100]
    assert [r["num_votos"] for r in detail] == [1000, 234]
    assert [r["num_porc"] for r in detail] == [81.04, 18.96]
    assert [r["name_org_politica"] for r in detail] == ["A", "B"]

    processed = {r["id_location_req"] for r in out.processed.collect()}
    assert processed == {100, 101}


def test_pending_requests_anti_join(spark):
    out = normalize_electoral_response(_raw(spark))
    requests = _raw(spark).select(
        "id_eleccion", "id_group_eleccion", "id_location_req"
    ).unionByName(
        _raw(spark).sparkSession.createDataFrame(
            [(2, 20, 200)],
            "id_eleccion int, id_group_eleccion int, id_location_req int"))
    pend = pending_requests(requests, out.processed)
    got = {r["id_location_req"] for r in pend.collect()}
    # error + malformed + never-answered stay pending; successes drop out
    assert got == {102, 103, 200}
    # re-running the plan after "reprocessing" is idempotent: anti-join
    # against the same processed set yields the same pending rows
    assert pend.count() == 3


CAND_OK = (
    '{"Data": [{"TxOrgPol": "A", "TxCandidato": "X Y", '
    '"TxRutaPolitico": "/p/1", "TxEstadoCand": "INSCRITO", '
    '"TxCargo": "ALCALDE", "NuVotosCand": "1,234"}, '
    '{"TxOrgPol": "B", "TxCandidato": "Z W", "TxRutaPolitico": "/p/2", '
    '"NuVotosCand": "n.d."}]}'
)


def _cand_raw(spark):
    rows = [
        (1, 10, 100, "E-1", CAND_OK),
        (1, 10, 101, "E-2", '{"Data": []}'),   # fetched but empty
        (1, 10, 102, "E-3", '{"Data": ['),     # malformed
    ]
    return spark.createDataFrame(
        rows,
        "id_eleccion int, id_location_req int, id_group_eleccion int, "
        "id_expediente string, payload string")


def test_normalize_candidates_explode_and_rename(spark):
    out = normalize_candidates(_cand_raw(spark)).orderBy("name_candidato")
    rows = out.collect()
    # empty Data and malformed payloads yield NO rows (they stay pending)
    assert [r["name_candidato"] for r in rows] == ["X Y", "Z W"]
    # the 4-part request key rides on every exploded candidate
    for r in rows:
        assert (r["id_eleccion"], r["id_location_req"],
                r["id_group_eleccion"], r["id_expediente"]) == (1, 10, 100, "E-1")
    assert rows[0]["name_org_politica"] == "A"
    assert rows[0]["url_politico"] == "/p/1"
    assert rows[0]["estado_candidatura"] == "INSCRITO"
    assert rows[0]["cargo_postula"] == "ALCALDE"
    assert rows[0]["num_votos_candidato"] == 1234   # comma stripped
    # missing / non-numeric fields coerce to NULL, never crash
    assert rows[1]["num_votos_candidato"] is None
    assert rows[1]["cargo_electo"] is None


def test_candidates_composite_key_pending(spark):
    raw = _cand_raw(spark)
    processed = normalize_candidates(raw).select(*CANDIDATE_KEYS).distinct()
    requests = raw.select(*CANDIDATE_KEYS)
    pend = pending_requests(requests, processed, keys=CANDIDATE_KEYS)
    got = {r["id_expediente"] for r in pend.collect()}
    # only the expediente whose response produced candidate rows drops out
    assert got == {"E-2", "E-3"}


def test_candidate_detail_counts(spark):
    raw = spark.createDataFrame(
        [("u1", '{"hojas_vida": [{"href": "/h/1"}, {"href": "/h/2"}], '
                '"planes_gobierno": [{"href": "/g/1"}]}'),
         ("u2", '{"hojas_vida": [], "planes_gobierno": []}'),
         ("u3", '{"planes_gobierno": [{"href": "/g/2"}]}'),  # missing section
         ("u4", "not-json")],
        "url_politico string, payload string")
    rows = {r["url_politico"]: r
            for r in candidate_detail_counts(raw).collect()}
    assert (rows["u1"]["num_hojas_vida"],
            rows["u1"]["num_planes_gobierno"]) == (2, 1)
    assert (rows["u2"]["num_hojas_vida"],
            rows["u2"]["num_planes_gobierno"]) == (0, 0)
    # a missing section and an unparseable page both count 0, like len([])
    assert (rows["u3"]["num_hojas_vida"],
            rows["u3"]["num_planes_gobierno"]) == (0, 1)
    assert (rows["u4"]["num_hojas_vida"],
            rows["u4"]["num_planes_gobierno"]) == (0, 0)


def test_no_python_eval_and_no_forced_broadcast(spark):
    import pyperustats_spark.plans as P

    out = normalize_electoral_response(_raw(spark))
    for df in (out.header, out.detail, out.processed):
        assert not P.has_python_eval(df)
    pend = pending_requests(
        _raw(spark).select(
            "id_eleccion", "id_group_eleccion", "id_location_req"),
        out.processed)
    # the processed side grows with the request log — must stay unhinted
    assert not P.has_broadcast_hint(pend)
