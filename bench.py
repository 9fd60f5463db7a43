"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed exactly once per run through the ``noop`` sink:
the full physical plan runs JVM-side with every output column
materialized (count() would let Catalyst prune projections; collect()
would add Python-deserialization cost and, combined with count(), used
to double-execute every query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyperustats_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_delta",
    "q_market_share",
    "q_top_customers",
    "ts_pivot_wide",
    "ts_resample_monthly",
    "ts_gap_fill",
    "ts_asof_join",
    "ts_moving_avg",
    "cache_merge_upsert",
    "ev_sessionize",
    "ev_tumbling_window",
    "text_quality_score",
    "text_ngram_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_bruteforce_cosine",
]

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="pyperustats-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warm up JVM/codegen/parquet-reader machinery at the smallest SF so
    # the first measured query reflects engine throughput, not cold start
    queries["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    # best-of-N: the first execution of a plan pays one-off janino/codegen
    # compilation that a running engine amortizes; the min reflects
    # steady-state throughput and halves run-to-run noise
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = None
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
