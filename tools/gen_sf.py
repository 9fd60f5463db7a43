"""Generate a larger scale factor by key-shifted replication of an
existing driver-generated SF (default: sf0.1 × 10 → sf1).

The driver's generator isn't available in-repo, so larger SFs are
produced by replicating an existing SF with every entity key shifted by
copy_index × stride (stride = max key + 1). This preserves the value
distributions, per-key cardinalities, join fan-outs, and skew shape of
the source exactly — each copy is a disjoint key universe — so bench
numbers measure scaling, not a different workload. Fixed dims
(region/nation) are copied unshifted. Document text gets a per-copy
suffix token (otherwise every doc would gain 9 exact duplicates and the
dedup workload would change character); embeddings get a tiny per-copy
perturbation for the same reason. Deterministic: no randomness anywhere.

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [copies]
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


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".testdata", "sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="gen-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    t = {n: load_table(spark, src, n) for n in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")}
    s_cust = _stride(t["customer"], "c_custkey")
    s_supp = _stride(t["supplier"], "s_suppkey")
    s_part = _stride(t["part"], "p_partkey")
    s_ord = _stride(t["orders"], "o_orderkey")
    s_ev = _stride(t["events"], "event_id")
    s_user = _stride(t["events"], "user_id")
    s_doc = _stride(t["documents"], "doc_id")
    s_vec = _stride(t["embeddings"], "vec_id")

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
    print(f"done: {dst} ({copies}x {src})")


if __name__ == "__main__":
    main()
