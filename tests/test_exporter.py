"""Grouped release exporter (reference BCRP/backup/runner.py:15-27):
one partitionBy pass per release, per-group manifest, pruned reloads."""

from pyspark.sql import functions as F

import pyperustats_spark.plans as P
from pyperustats_spark.sources.exporter import (
    export_releases,
    load_manifest,
    load_release,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_export_reload_identical_at_any_parallelism(spark, tables, tmp_path):
    base = tables["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice")

    p1, p16 = str(tmp_path / "r1"), str(tmp_path / "r16")
    export_releases(base.repartition(1), "o_orderstatus", p1)
    export_releases(base.repartition(16), "o_orderstatus", p16)

    want = _rows(base)
    got1 = _rows(load_release(spark, p1).select(*base.columns))
    got16 = _rows(load_release(spark, p16).select(*base.columns))
    # per-group files reload identically regardless of write parallelism
    assert got1 == want
    assert got16 == want


def test_manifest_certifies_written_rows(spark, tables, tmp_path):
    base = tables["orders"].select("o_orderkey", "o_orderstatus")
    path = str(tmp_path / "rel")
    export_releases(base, "o_orderstatus", path)

    m = {r["o_orderstatus"]: r["n_rows"]
         for r in load_manifest(spark, path).collect()}
    want = {r["o_orderstatus"]: r["cnt"]
            for r in base.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert m == want

    # the manifest dir is underscore-prefixed: a plain read of the
    # release path must NOT pick the manifest rows up as data
    assert load_release(spark, path).count() == base.count()


def test_single_group_load_prunes_partitions(spark, tables, tmp_path):
    base = tables["orders"].select("o_orderkey", "o_orderstatus")
    path = str(tmp_path / "pruned")
    export_releases(base, "o_orderstatus", path)

    one = load_release(spark, path, group_col="o_orderstatus", group="F")
    txt = P.explain_str(one)
    # the group predicate must land in PartitionFilters (directory
    # pruning), not as a post-scan row filter
    assert "PartitionFilters" in txt
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", txt)
    assert m and "o_orderstatus" in m.group(1), txt
    assert one.count() == base.where(F.col("o_orderstatus") == "F").count()


def test_sanitize_filename_reference_semantics():
    from pyperustats_spark.sources.exporter import sanitize_filename

    # alnum/space/dash/underscore survive; everything else -> '_';
    # outer whitespace stripped (parse_file.py:8-21)
    assert sanitize_filename("Gasto: 2023/Q4 (PIM)") == "Gasto_ 2023_Q4 _PIM_"
    assert sanitize_filename("  ok-name_1  ") == "ok-name_1"
    # unicode letters are alnum in Python — reference behavior kept
    assert sanitize_filename("Año Fiscal") == "Año Fiscal"


def test_save_dataframe_convention_roundtrip(spark, tables, tmp_path):
    from pyperustats_spark.sources.exporter import (
        artifact_path, save_dataframe)

    df = tables["nation"]
    path = save_dataframe(df, str(tmp_path), "mef", "Gasto: Q4/2023")
    assert path == artifact_path(str(tmp_path), "mef", "Gasto: Q4/2023")
    assert path.endswith("mef_Gasto_ Q4_2023.parquet")
    back = spark.read.parquet(path)
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in df.collect()}


def test_group_value_and_type_fidelity(spark, tmp_path):
    # a numeric-LOOKING string group ('0100') must survive the
    # write→manifest→reload round trip verbatim: partition-column type
    # inference would turn it into int 100, losing the leading zero
    base = spark.createDataFrame(
        [(1, "0100"), (2, "0100"), (3, "0411")], "id int, module string")
    path = str(tmp_path / "zero_padded")
    manifest = export_releases(base, "module", path)

    m = {r["module"]: r["n_rows"] for r in manifest.collect()}
    assert m == {"0100": 2, "0411": 1}
    assert dict(load_manifest(spark, path).dtypes)["module"] == "string"

    back = load_release(spark, path, group_col="module")
    assert dict(back.dtypes)["module"] == "string"
    assert _rows(back.select("id", "module")) == _rows(base)

    one = load_release(spark, path, group_col="module", group="0100")
    assert {r["id"] for r in one.collect()} == {1, 2}


def test_int_group_type_restored_from_manifest(spark, tmp_path):
    # an int group column round-trips as int (the manifest records the
    # written type; partition dirs themselves only store strings)
    base = spark.createDataFrame([(1, 2022), (2, 2023)], "id int, year int")
    path = str(tmp_path / "int_group")
    manifest = export_releases(base, "year", path)
    assert dict(manifest.dtypes)["year"] == "int"

    back = load_release(spark, path, group_col="year")
    assert dict(back.dtypes)["year"] == "int"
    assert _rows(back.select("id", "year")) == _rows(base)
    assert {r["id"] for r in load_release(
        spark, path, group_col="year", group=2023).collect()} == {2}


def test_export_shards_round_trip_and_order(spark, tables, tmp_path):
    from pyperustats_spark.sources import exporter as X
    docs = tables["documents"].select("doc_id", "source")
    path = str(tmp_path / "shards")
    manifest = X.export_shards(docs, path, num_shards=4)
    m = {r["shard"]: r["n_rows"] for r in manifest.collect()}
    assert set(m) == set(range(4))
    assert sum(m.values()) == docs.count()
    # one shard loads alone (partition pruning) with dense hash order
    s0 = X.load_release(spark, path, "shard", "0") \
        .orderBy("pos").collect()
    assert len(s0) == m[0]
    assert [r["pos"] for r in s0] == list(range(1, len(s0) + 1))
    # same salt -> identical membership on a re-export
    path2 = str(tmp_path / "shards2")
    X.export_shards(docs, path2, num_shards=4)
    a = sorted((r["doc_id"], r["shard"], r["pos"]) for r in
               X.load_release(spark, path, "shard").collect())
    b = sorted((r["doc_id"], r["shard"], r["pos"]) for r in
               X.load_release(spark, path2, "shard").collect())
    assert a == b


def test_release_chain_lands_training_shards(spark, tables, tmp_path):
    """The full dress rehearsal END: api.incremental_release's output
    feeds export_shards directly — the release lands as self-contained
    per-shard training files whose manifest certifies on-disk counts,
    and every landed row is a chain survivor with its split intact."""
    from pyperustats_spark.api import incremental_release
    from pyperustats_spark.sources import exporter as X
    from pyspark.sql import functions as F

    docs = tables["documents"]
    ev = spark.createDataFrame(
        [(1, "batch batch batch stream spark window window dup")],
        "eid int, text string")
    release = incremental_release(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        ev, prefix_chars=40, sort=False)
    path = str(tmp_path / "release_shards")
    manifest = X.export_shards(release, path, num_shards=4)
    m = {r["shard"]: r["n_rows"] for r in manifest.collect()}
    n_release = release.count()
    assert sum(m.values()) == n_release > 0
    back = X.load_release(spark, path, "shard")
    assert back.count() == n_release
    assert set(back.select("split").distinct().toPandas()["split"]) \
        <= {"train", "val"}
    # landed ids == chain survivor ids (no dup, no loss through export)
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in release.select("doc_id").collect())


def test_orc_release_round_trip(spark, tables, tmp_path):
    """Format coverage: the release/shard layout works identically on
    ORC (Spark-native columnar alternative) — same manifest contract,
    same partition pruning, same zero-padded-group fidelity."""
    from pyperustats_spark.sources import exporter as X

    docs = tables["documents"].select("doc_id", "source")
    path = str(tmp_path / "orc_shards")
    manifest = X.export_shards(docs, path, num_shards=4, fmt="orc")
    m = {r["shard"]: r["n_rows"] for r in manifest.collect()}
    assert set(m) == set(range(4))
    assert sum(m.values()) == docs.count()
    back = X.load_release(spark, path, "shard", fmt="orc")
    assert back.count() == docs.count()
    one = X.load_release(spark, path, "shard", "0", fmt="orc")
    assert one.count() == m[0]
    # zero-padded string group values survive ORC releases too
    base = spark.createDataFrame(
        [(1, "0100"), (2, "0200")], "id long, grp string")
    p2 = str(tmp_path / "orc_groups")
    X.export_releases(base, "grp", p2, fmt="orc")
    vals = {r["grp"] for r in
            X.load_release(spark, p2, "grp", fmt="orc").collect()}
    assert vals == {"0100", "0200"}
