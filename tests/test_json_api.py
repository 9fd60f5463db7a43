"""Multi-table electoral-response normalization (reference
``procesar_respuesta``, perustats/infogob/utils.py:109-137): one nested
payload column → header + detail + processed-flag frames."""

from pyspark.sql import functions as F

from pyperustats_spark.sources.json_api import (
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
