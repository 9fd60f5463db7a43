"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare rowcount, schema
(column names), and order-insensitive values (sorted rows, doubles
rounded). Usage: python tools/parity.py [sf_dir] [query ...]

Set SPARK_GRAFT_PLAIN=1 to use a vanilla SparkSession (no engine
configs) like the driver does — catches config-dependence bugs that
get_spark()'s tuned session would mask."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from pyperustats_spark.session import get_spark


def normalize_rows(cols, rows):
    def norm(v):
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(repr(tuple(norm(r[i]) for i in idx)) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_PLAIN"):
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local[8]")
                 .config("spark.ui.enabled", "false").getOrCreate())
    else:
        spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        # Spark-written scaled sets (tools/gen_sf.py) are DIRECTORIES
        # of part files; the driver's /root/testdata tables are single
        # files — glob the former so oracle parity runs on both
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # operators persist internal frames and (by design) rarely
            # unpersist — across 349 queries the leftovers accumulate
            # until LRU eviction churn perturbs later queries (bench.py
            # clears per query for the same reason; VERDICT r11 item 5)
            spark.catalog.clearCache()
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(srows)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        # HUGEINT/DECIMAL oracle outputs hash differently from Spark's
        # bigint/double under an Arrow-based comparator even when every
        # value matches (fetchall() hides this by coercing to Python int)
        try:
            tdesc = con.execute("DESCRIBE " + oracles[name]).fetchall()
        except Exception:
            tdesc = []
        bad_types = [(c, ty) for c, ty, *_ in tdesc
                     if "HUGEINT" in ty or "DECIMAL" in ty]
        if bad_types:
            ok = False
            msgs.append(f"oracle emits non-portable types {bad_types}")
        # ARRAY/MAP/STRUCT output columns break the driver's pandas
        # sort_values canonicalization ('unhashable type: list' — the
        # round-6 embedding_centroids failure). normalize_rows here
        # tuples lists, which the driver comparator cannot do — so gate
        # BOTH sides on scalar-only output schemas.
        complex_spark = [f.name for f in sdf.schema.fields
                         if f.dataType.typeName() in
                         ("array", "map", "struct")]
        complex_duck = [(c, ty) for c, ty, *_ in tdesc
                        if "[]" in ty or "STRUCT(" in ty or "MAP(" in ty]
        if complex_spark or complex_duck:
            ok = False
            msgs.append("complex output columns not comparator-safe: "
                        f"spark={complex_spark} duck={complex_duck}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            sn = normalize_rows(scols, srows)
            dn = normalize_rows(dcols, drows)
            if sn != dn:
                ok = False
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                msgs.append(f"values differ; first diffs: {diffs}")
        if ok:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
