"""Incremental parquet cache: append-only upserts, latest-wins reads,
fetch planning, compaction."""

from pyperustats_spark.sources.cache import IncrementalParquetCache


def _rows(df):
    return sorted((r["code"], r["date"], r["value"]) for r in df.collect())


def test_cache_append_and_latest_wins(spark, tmp_path):
    cache = IncrementalParquetCache(spark, str(tmp_path / "c1"), keys=["code", "date"])
    assert cache.load() is None
    assert cache.cached_codes() == []

    b0 = cache.append(spark.createDataFrame(
        [("A", "2020-01-01", 1.0), ("A", "2020-01-02", 2.0), ("B", "2020-01-01", 9.0)],
        "code string, date string, value double"))
    assert b0 == 0
    # upsert: A/01-02 overwritten, C added, A/01-01 untouched
    b1 = cache.append(spark.createDataFrame(
        [("A", "2020-01-02", 20.0), ("C", "2020-01-01", 7.0)],
        "code string, date string, value double"))
    assert b1 == 1

    assert _rows(cache.load()) == [
        ("A", "2020-01-01", 1.0), ("A", "2020-01-02", 20.0),
        ("B", "2020-01-01", 9.0), ("C", "2020-01-01", 7.0)]


def test_cache_fetch_planning(spark, tmp_path):
    cache = IncrementalParquetCache(spark, str(tmp_path / "c2"), keys=["code", "date"])
    cache.append(spark.createDataFrame(
        [("A", "2020-01-01", 1.0), ("B", "2020-01-01", 2.0)],
        "code string, date string, value double"))
    assert cache.cached_codes() == ["A", "B"]
    assert cache.missing_codes(["A", "B", "C", "D"]) == ["C", "D"]


def test_cache_compact_preserves_view_and_resets_log(spark, tmp_path):
    cache = IncrementalParquetCache(spark, str(tmp_path / "c3"), keys=["code", "date"])
    for i in range(3):
        cache.append(spark.createDataFrame(
            [("A", "2020-01-01", float(i))], "code string, date string, value double"))
    before = _rows(cache.load())
    assert before == [("A", "2020-01-01", 2.0)]
    cache.compact()
    assert _rows(cache.load()) == before
    # log restarted: next increment is batch 1 on top of compacted 0
    assert cache.append(spark.createDataFrame(
        [("A", "2020-01-01", 99.0)], "code string, date string, value double")) == 1
    assert _rows(cache.load()) == [("A", "2020-01-01", 99.0)]


def test_cache_namespaces_isolate_frequencies(spark, tmp_path):
    from pyperustats_spark.sources.cache import window_namespace

    root = str(tmp_path / "c4")
    monthly = IncrementalParquetCache(
        spark, root, keys=["code", "date"],
        namespace=window_namespace("M", "2020-01-01", "2020-12-31"))
    daily = IncrementalParquetCache(
        spark, root, keys=["code", "date"],
        namespace=window_namespace("D", "2020-01-01", "2020-12-31"))

    monthly.append(spark.createDataFrame(
        [("AF", "2020-01", 1.0)], "code string, date string, value double"))
    daily.append(spark.createDataFrame(
        [("AF", "2020-01-15", 9.0), ("NO", "2020-01-16", 2.0)],
        "code string, date string, value double"))
    # upsert in ONE namespace must not disturb the other
    monthly.append(spark.createDataFrame(
        [("AF", "2020-01", 5.0)], "code string, date string, value double"))

    m = {(r["code"], r["date"]): r["value"] for r in monthly.load().collect()}
    d = {(r["code"], r["date"]): r["value"] for r in daily.load().collect()}
    assert m == {("AF", "2020-01"): 5.0}
    assert d == {("AF", "2020-01-15"): 9.0, ("NO", "2020-01-16"): 2.0}
    assert monthly.cached_codes() == ["AF"]
    assert daily.cached_codes() == ["AF", "NO"]


def test_cache_manifest_tracks_batches_and_survives_loss(spark, tmp_path):
    import os

    cache = IncrementalParquetCache(spark, str(tmp_path / "c5"),
                                    keys=["code", "date"])
    df = spark.createDataFrame(
        [("AF", "2020-01", 1.0)], "code string, date string, value double")
    assert cache.append(df) == 0
    assert cache.append(df) == 1
    # manifest is the O(1) source of truth
    with open(cache._manifest_path()) as f:
        assert f.read() == "1"
    # deleted manifest: next id rebuilt from the data, then rewritten
    os.remove(cache._manifest_path())
    assert cache.append(df) == 2
    with open(cache._manifest_path()) as f:
        assert f.read() == "2"
