"""Facade parity: SeriesClient fetch-with-cache flow and the chained
DocumentPipeline."""

from pyspark.sql import functions as F

from pyperustats_spark.api import DocumentPipeline, SeriesClient
from pyperustats_spark.operators import timeseries as TS


def test_series_client_fetch_and_cache_reuse(spark, tables, tmp_path):
    long_df = TS.series_long(tables["lineitem"])
    client = SeriesClient(spark, long_df, str(tmp_path / "series_cache"))

    known, unknown = client.validate_codes(["AF", "NO", "BOGUS"])
    assert known == ["AF", "NO"] and unknown == ["BOGUS"]

    wide = client.fetch(["AF", "NO", "BOGUS"], freq="M")
    assert set(wide.columns) == {"date", "AF", "NO"}
    n = wide.count()
    assert n > 0
    # dates ascending (reference sorts wide frames by date)
    dates = [r["date"] for r in wide.select("date").collect()]
    assert dates == sorted(dates)

    # second fetch: everything cached, no new increment
    before = client.cache._next_batch_id()
    wide2 = client.fetch(["AF", "NO"], freq="M")
    assert client.cache._next_batch_id() == before
    assert wide2.count() == n

    # a new code triggers exactly one increment for the missing series
    client.fetch(["AF", "NO", "RF"], freq="M")
    assert client.cache._next_batch_id() == before + 1
    assert "RF" in client.cache.cached_codes()


def test_document_pipeline_chain(spark, tables, tmp_path):
    docs = tables["documents"]
    pipe = (
        DocumentPipeline(spark, docs)
        .dedup_exact()
        .quality_filter(min_score=0.5)
        .lang_filter(["en", "es", "de", "fr"])
        .with_fingerprint()
    )
    out = pipe.df
    assert "fingerprint" in out.columns
    n = out.count()
    assert 0 < n <= docs.count()

    # chain is pure filtering/enrichment: surviving ids are a subset
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids <= all_ids

    cache = pipe.write_cache(str(tmp_path / "doc_cache"))
    assert cache.load().count() == n


def test_document_pipeline_training_prep_chain(spark, tables, tmp_path):
    docs = tables["documents"]
    pipe = (
        DocumentPipeline(spark, docs)
        .dedup_exact()
        .dedup_fuzzy(threshold=0.15)
        .pii_scrub()
        .pack(budget=256)
    )
    out = pipe.df
    for col in ("text", "start_offset", "bin_start", "bin_end"):
        assert col in out.columns
    rows = out.orderBy("doc_id").collect()
    assert 0 < len(rows) <= docs.count()
    # packing invariants: offsets strictly increase in doc_id order and
    # every bin span is well-formed
    last = -1
    for r in rows:
        assert r["start_offset"] > last or r["start_offset"] == 0
        last = r["start_offset"]
        assert r["bin_end"] >= r["bin_start"] >= 0

    # chunk grain change: (doc_id, chunk_id) keyed frame
    chunks = DocumentPipeline(spark, docs).chunk(
        chunk_tokens=30, overlap=5).df
    assert {"doc_id", "chunk_id", "chunk_len", "chunk_text"} <= set(chunks.columns)
    assert chunks.count() >= docs.where(F.length("text") > 0).count()
