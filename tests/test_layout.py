"""Z-order layout planning: Morton key correctness, exact equal-count
file splits (histogram ntile), and the pruning story the operator
exists to demonstrate."""

import pyspark.sql.functions as F
import pytest

from pyperustats_spark.operators import layout as L
from pyperustats_spark.plans import has_python_eval


def _py_morton(vals, bits):
    """Independent python reference: bit i of column j at i*ncols+j."""
    n = len(vals)
    out = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            out += ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 37, 255) for b in (0, 2, 9, 254)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = df.select(
        "x", "y",
        L.zorder_key([F.col("x"), F.col("y")], bits=8).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == _py_morton((r["x"], r["y"]), 8), (r["x"], r["y"])
    # stays JVM-side
    assert not has_python_eval(df.select(
        L.zorder_key([F.col("x"), F.col("y")], bits=8)))


def test_zorder_fileplan_exact_ntile_split(spark, tables):
    """File sizes must be the exact SQL ntile split (first n%k files
    one row larger) — this is the regression pin for the
    histogram-rank design: the physical-partition offset-table shape
    produced uneven/phantom tiles when its two exchange references
    pruned to different subtrees and AQE stopped reusing the stage."""
    li = tables["lineitem"]
    n = li.count()
    for n_files in (7, 32):
        sizes = (
            L.zorder_fileplan(li, ["l_partkey", "l_suppkey"], n_files,
                              8, ("l_orderkey", "l_linenumber"))
            .groupBy("_file").count().orderBy("_file").collect()
        )
        assert [r["_file"] for r in sizes] == list(range(1, n_files + 1))
        base, rem = divmod(n, n_files)
        expect = [base + 1] * rem + [base] * (n_files - rem)
        assert [r["count"] for r in sizes] == expect


def test_zorder_fileplan_is_deterministic(spark, tables):
    li = tables["lineitem"]
    a = L.zorder_fileplan(li, ["l_partkey", "l_suppkey"], 16, 8,
                          ("l_orderkey", "l_linenumber"))
    rows = lambda d: sorted(
        (r["l_orderkey"], r["l_linenumber"], r["_file"])
        for r in d.select("l_orderkey", "l_linenumber", "_file").collect())
    assert rows(a) == rows(
        L.zorder_fileplan(li, ["l_partkey", "l_suppkey"], 16, 8,
                          ("l_orderkey", "l_linenumber")))


def test_file_stats_cover_all_rows(spark, tables):
    li = tables["lineitem"]
    st = L.file_stats(
        L.zorder_fileplan(li, ["l_partkey", "l_suppkey"], 16, 8,
                          ("l_orderkey", "l_linenumber")),
        ["l_partkey", "l_suppkey"]).collect()
    assert sum(r["n_rows"] for r in st) == li.count()
    lo = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    assert min(r["min_l_partkey"] for r in st) == lo[0]
    assert max(r["max_l_partkey"] for r in st) == lo[1]


def test_pruning_compare_tells_the_layout_story(spark, tables):
    """The 100 TB claim, verified in miniature: the linear layout
    prunes its own sort column hard but scans EVERY file for the other
    column's predicate; Z-order prunes strictly better than natural on
    every single-column predicate and hardest on the conjunction."""
    li = tables["lineitem"]
    out = L.layout_pruning_compare(
        li, ["l_partkey", "l_suppkey"], ("l_orderkey", "l_linenumber"),
        n_files=16, bits=8).collect()
    g = {(r["layout"], r["predicate"]): r for r in out}
    assert len(g) == 9
    total = li.count()
    n_files = 16
    # natural (hash-ish insertion order): every column striped across
    # every file — no pruning at all
    for p in ("l_partkey", "l_suppkey", "all"):
        assert g[("natural", p)]["files_scanned"] == n_files
        assert g[("natural", p)]["rows_scanned"] == total
    # linear: its own column prunes to a few files...
    assert g[("linear", "l_partkey")]["files_scanned"] <= 3
    # ...but the OTHER column scans everything — the single-column
    # layout's blind spot
    assert g[("linear", "l_suppkey")]["files_scanned"] == n_files
    # zorder: strictly better than natural on BOTH single-column
    # predicates, and the conjunction prunes hardest
    for p in ("l_partkey", "l_suppkey"):
        assert g[("zorder", p)]["files_scanned"] < n_files
    assert (g[("zorder", "all")]["files_scanned"]
            <= min(g[("zorder", "l_partkey")]["files_scanned"],
                   g[("zorder", "l_suppkey")]["files_scanned"]))
    # rows_scanned consistent with files_scanned (equal-count files)
    for key, r in g.items():
        assert r["rows_scanned"] <= total
        assert (r["files_scanned"] == 0) == (r["rows_scanned"] == 0)


def test_histogram_ntile_degenerate_inputs(spark):
    # constant bucket column: one window partition, still the exact
    # ntile split
    df = spark.createDataFrame(
        [(i, 7) for i in range(10)], "id bigint, v bigint")
    out = L.histogram_ntile(df, F.lit(0).cast("bigint"), [F.col("id")],
                            4).groupBy("_file").count().collect()
    assert {r["_file"]: r["count"] for r in out} == {1: 3, 2: 3, 3: 2, 4: 2}
    # n_tiles > n rows: tiles 1..n, one row each
    small = spark.createDataFrame([(1,), (2,)], "id bigint")
    out2 = L.histogram_ntile(small, F.col("id"), [F.col("id")], 5).collect()
    assert sorted(r["_file"] for r in out2) == [1, 2]
    # empty frame: empty result, no crash
    empty = spark.createDataFrame([], "id bigint")
    assert L.histogram_ntile(empty, F.col("id"), [F.col("id")], 4) \
        .count() == 0


def test_zorder_write_tightens_real_file_ranges(spark, tables, tmp_path):
    """Close the audit→reality loop: write lineitem twice through the
    PRODUCTION path (repartitionByRange on the Morton key vs natural
    insertion order), read the ACTUAL files back, and check the
    written files' per-column ranges — the stats a parquet reader
    prunes on — are materially tighter under Z-order on BOTH
    clustered columns."""
    li = tables["lineitem"]
    cols = ["l_partkey", "l_suppkey"]
    zp, np_ = str(tmp_path / "z"), str(tmp_path / "n")
    L.zorder_write(li, zp, cols, n_files=8, bits=8,
                   tiebreak=("l_orderkey", "l_linenumber"))
    (li.repartitionByRange(8, "l_orderkey", "l_linenumber")
     .write.parquet(np_))

    def mean_width(path, col):
        df = spark.read.parquet(path).withColumn(
            "_f", F.input_file_name())
        st = df.groupBy("_f").agg(
            (F.max(col) - F.min(col)).alias("w")).collect()
        assert len(st) >= 4, f"expected several files at {path}"
        return sum(r["w"] for r in st) / len(st)

    for c in cols:
        zw, nw = mean_width(zp, c), mean_width(np_, c)
        # natural order stripes each column across the full range per
        # file; z-ordered files must cover well under 3/4 of it
        assert zw < 0.75 * nw, (c, zw, nw)
    # round-trip integrity: same rows, nothing dropped or duplicated
    assert spark.read.parquet(zp).count() == li.count()


def test_zorder_constant_column_degenerate(spark):
    # zero-range column: bucket collapses to 0, plan still assigns
    # every row a file deterministically
    df = spark.createDataFrame(
        [(i, 5, i) for i in range(20)], "a bigint, b bigint, id bigint")
    out = L.zorder_fileplan(df, ["a", "b"], n_files=4, bits=8,
                            tiebreak=("id",))
    sizes = sorted(r["count"] for r in out.groupBy("_file").count().collect())
    assert sizes == [5, 5, 5, 5]
