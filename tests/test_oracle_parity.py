"""Local replica of the driver's correctness gate as a pytest: every
queries() entry runs on Spark, its oracle_sql() on DuckDB, and rowcount /
column names / sorted-rounded values must match (rows-only keys just
need a clean run)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.parity import normalize_rows

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only: clean execution is the gate
        return
    # oracle-backed output must be scalar-only: ARRAY/MAP/STRUCT columns
    # break the driver's pandas sort_values canonicalization (round-6
    # embedding_centroids: 'unhashable type: list'), and HUGEINT/DECIMAL
    # oracle types hash differently under an Arrow comparator (round-1
    # ev_sessionize). normalize_rows below masks both locally.
    complex_cols = [f.name for f in sdf.schema.fields
                    if f.dataType.typeName() in ("array", "map", "struct")]
    assert not complex_cols, (
        f"{name}: complex output columns {complex_cols} are not "
        "driver-comparator-safe; emit long form or array_join")
    tdesc = duck.execute("DESCRIBE " + ORACLES[name]).fetchall()
    bad = [(c, ty) for c, ty, *_ in tdesc
           if "HUGEINT" in ty or "DECIMAL" in ty
           or "[]" in ty or "STRUCT(" in ty or "MAP(" in ty]
    assert not bad, f"{name}: oracle emits non-portable types {bad}"
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount spark={len(srows)} duck={len(drows)}"
    assert sorted(scols) == sorted(dcols)
    sn = normalize_rows(scols, srows)
    dn = normalize_rows(dcols, drows)
    assert sn == dn, f"first diffs: {[(a, b) for a, b in zip(sn, dn) if a != b][:3]}"
