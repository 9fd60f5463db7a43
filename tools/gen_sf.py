"""Generate a larger scale factor from an existing driver-generated SF
along one of TWO axes (default: sf0.1 × 10 → .testdata/sf1).

**breadth** (default): key-shifted replication — every entity key is
shifted by copy_index × stride (stride = max key + 1), so each copy is
a disjoint key universe. Preserves value distributions, per-key
cardinalities, join fan-outs, and skew shape exactly; rows-per-key
NEVER grows. Document text is perturbed per copy (every 2nd token
replaced with a copy-unique synthetic token) so replicas are neither
exact dups nor MinHash/SimHash near-dups of their source — without
this, every doc gains copies−1 artificial near-duplicates and the
dedup benchmarks measure a different workload (round-4 advice).
Low-threshold char-n-gram Jaccard (τ=0.15) still sees replica pairs
as candidates; BENCH_SCALING.md notes it.

**depth**: same entity/key universe, copies× rows PER KEY — the axis
breadth cannot stress. Orders/lineitem replicate onto the SAME
customers/parts/suppliers with dates shifted by copy × span (every
series gets copies× longer); events replicate onto the SAME users with
shifted timestamps (copies× sessions per user, copies× window-partition
rows); documents/embeddings replicate as DELIBERATE near-duplicates
("rep{i}" suffix / tiny vector perturbation) so LSH/ANN bucket
occupancy — and the max_bucket skew guards — get a real copies× load.

Deterministic: no randomness anywhere.

PINNED canonical 100x set (the cohort-3 gate in BASELINE.md/bench.py
depends on these EXACT two commands — determinism makes any rebuild
bit-identical to the round-9 set the pins were measured on):

    python tools/gen_sf.py /root/testdata/sf0.1 .testdata/sf1    10 breadth
    python tools/gen_sf.py .testdata/sf1        .testdata/sf10bd 10 depth

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [copies] [breadth|depth]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pyperustats_spark.session import get_spark
from pyperustats_spark.sources.registry import load_table


def _replicate(df: DataFrame, copies: int, shifts: dict[str, int]) -> DataFrame:
    out = df.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(copies)])).alias("_copy"))
    for col, stride in shifts.items():
        out = out.withColumn(col, F.col(col) + F.col("_copy") * F.lit(stride))
    return out


def _stride(df: DataFrame, col: str) -> int:
    return int(df.agg(F.max(col)).collect()[0][0]) + 1


def _span_days(df: DataFrame, col: str) -> int:
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    return (row["hi"] - row["lo"]).days + 1


def _shift_days(df: DataFrame, col: str, days: int) -> DataFrame:
    return df.withColumn(
        col, F.timestamp_add("DAY", (F.col("_copy") * F.lit(days)).cast("int"),
                             F.col(col)))


def _perturb_tokens(col: F.Column) -> F.Column:
    """Replace every 2nd token with a copy-unique synthetic token
    (deterministic, JVM-side): replicas keep the source's length/shape
    but drop to ~0.33 token-Jaccard vs it — no longer MinHash (τ=0.4)
    or SimHash near-dups, so breadth-replication doesn't fabricate
    near-dup clusters."""
    toks = F.split(col, " ")
    swapped = F.transform(
        toks,
        lambda t, i: F.when(
            i % 2 == 1,
            F.concat(F.lit("w"), F.col("_copy").cast("string"),
                     F.lit("q"), (i % 97).cast("string")),
        ).otherwise(t),
    )
    return F.array_join(swapped, " ")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".testdata", "sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "breadth"
    if mode not in ("breadth", "depth"):
        raise SystemExit(f"unknown mode {mode!r}: breadth|depth")

    spark = get_spark(app_name="gen-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    t = {n: load_table(spark, src, n) for n in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")}
    s_ord = _stride(t["orders"], "o_orderkey")
    s_ev = _stride(t["events"], "event_id")
    s_doc = _stride(t["documents"], "doc_id")
    s_vec = _stride(t["embeddings"], "vec_id")

    if mode == "breadth":
        s_cust = _stride(t["customer"], "c_custkey")
        s_supp = _stride(t["supplier"], "s_suppkey")
        s_part = _stride(t["part"], "p_partkey")
        s_user = _stride(t["events"], "user_id")
        plans: dict[str, DataFrame] = {
            "region": t["region"],
            "nation": t["nation"],
            "customer": _replicate(t["customer"], copies, {"c_custkey": s_cust}),
            "supplier": _replicate(t["supplier"], copies, {"s_suppkey": s_supp}),
            "part": _replicate(t["part"], copies, {"p_partkey": s_part}),
            "orders": _replicate(t["orders"], copies,
                                 {"o_orderkey": s_ord, "o_custkey": s_cust}),
            "lineitem": _replicate(t["lineitem"], copies,
                                   {"l_orderkey": s_ord, "l_partkey": s_part,
                                    "l_suppkey": s_supp}),
            "events": _replicate(t["events"], copies,
                                 {"event_id": s_ev, "user_id": s_user}),
            "documents": (
                _replicate(t["documents"], copies, {"doc_id": s_doc})
                .withColumn("text", F.when(F.col("_copy") == 0, F.col("text"))
                            .otherwise(_perturb_tokens(F.col("text"))))
                .withColumn("n_chars", F.length("text").cast("long"))
            ),
            "embeddings": (
                _replicate(t["embeddings"], copies, {"vec_id": s_vec})
                .withColumn("embedding", F.transform(
                    "embedding",
                    lambda x: (x + F.col("_copy") * F.lit(1e-3)).cast("float")))
            ),
        }
    else:  # depth: same keys, copies× rows per key
        d_ord = _span_days(t["orders"], "o_orderdate")
        d_li = _span_days(t["lineitem"], "l_shipdate")
        d_both = max(d_ord, d_li)  # orders+lineitem shift together
        ev_span = _span_days(t["events"], "ts")
        plans = {
            "region": t["region"],
            "nation": t["nation"],
            "customer": t["customer"],   # SAME entity universe
            "supplier": t["supplier"],
            "part": t["part"],
            # copies× orders per customer, history extended span-by-span
            "orders": _shift_days(
                _replicate(t["orders"], copies, {"o_orderkey": s_ord}),
                "o_orderdate", d_both),
            # copies× lineitems per part/supplier; every series_long code
            # gets a copies×-longer date range
            "lineitem": _shift_days(
                _replicate(t["lineitem"], copies, {"l_orderkey": s_ord}),
                "l_shipdate", d_both),
            # copies× events (and sessions) per user
            "events": _shift_days(
                _replicate(t["events"], copies, {"event_id": s_ev}),
                "ts", ev_span),
            # DELIBERATE near-dups: LSH buckets fill copies× (rep suffix
            # keeps them non-exact) — this is the bucket/skew-guard load
            "documents": (
                _replicate(t["documents"], copies, {"doc_id": s_doc})
                .withColumn("text", F.when(F.col("_copy") == 0, F.col("text"))
                            .otherwise(F.concat(F.col("text"), F.lit(" rep"),
                                                F.col("_copy"))))
                .withColumn("n_chars", F.length("text").cast("long"))
            ),
            "embeddings": (
                _replicate(t["embeddings"], copies, {"vec_id": s_vec})
                .withColumn("embedding", F.transform(
                    "embedding",
                    lambda x: (x + F.col("_copy") * F.lit(1e-3)).cast("float")))
            ),
        }

    for name, df in plans.items():
        # file count sets the scan's parallelism floor for small-file
        # tables (maxPartitionBytes never splits a 4 MB file): the
        # per-row-heavy tables (documents/embeddings) need real fan-out
        parts = {"lineitem": 8, "orders": 8, "events": 8,
                 "documents": 8, "embeddings": 4,
                 "region": 1, "nation": 1}.get(name, 2)
        (df.drop("_copy") if "_copy" in df.columns else df) \
            .repartition(parts) \
            .write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
        print(f"wrote {name}")
    print(f"done: {dst} ({copies}x {src}, mode={mode})")


if __name__ == "__main__":
    main()
