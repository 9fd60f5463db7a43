"""Time an arbitrary subset of `queries()` at a given SF dir — the
scaling-study companion to bench.py (same noop-sink, best-of-N
methodology; bench.py keeps the driver's fixed headline set, this one
takes the list on the command line).

Usage:
    python tools/bench_subset.py <sf_dir> <query> [<query> ...]
    SPARK_GRAFT_BENCH_RUNS=N  best-of-N (default 2)

Prints one JSON line: {"sf_dir": ..., "total": s, "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyperustats_spark.session import get_spark


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir, names = sys.argv[1], sys.argv[2:]
    spark = get_spark(app_name="pyperustats-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    # warm up codegen/parquet machinery at the smallest SF (bench.py's
    # rationale: first plan pays one-off janino compilation)
    queries["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name in names:
        # bench.py parity: leftover persisted frames from a previous
        # query otherwise contaminate this one's timing (measured:
        # q_supplier_hhi 2.5x its isolated time in a shared session)
        spark.catalog.clearCache()
        best = None
        for _ in range(runs):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
    print(json.dumps({
        "sf_dir": sf_dir,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
