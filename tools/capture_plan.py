"""Write `.explain("formatted")` for queries() entries to files.

Usage:
    python tools/capture_plan.py <out_dir> <suffix> <query> [<query>...]
    SPARK_GRAFT_SF_DIR picks the data dir (default /root/testdata/sf0.1).

Writes <out_dir>/<query>_<suffix>.txt per query. Used for the
plans/r11/ before/after evidence in OPTIMIZATION_r11.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyperustats_spark.session import get_spark


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
