"""Tri-state stage-progress tracker (INEI downloaded/unzipped/organized
flags, reference inei/utils/db_utils.py:20-146): append-only event log,
latest-wins flags, plan-only-the-missing-stage semantics."""

from pyspark.sql import functions as F

from pyperustats_spark.sources.progress import (
    STAGES,
    StageProgressTracker,
    stage_plan,
    status_from_events,
)

KEYS = ["survey", "year", "module_code"]


def _modules(spark, rows=None):
    rows = rows or [("enaho", 2022, "0100"), ("enaho", 2022, "0200"),
                    ("enaho", 2022, "0300")]
    return spark.createDataFrame(
        rows, "survey string, year int, module_code string")


def _tracker(spark, tmp_path, name="p"):
    return StageProgressTracker(spark, str(tmp_path / name), keys=KEYS)


def test_fresh_items_plan_as_download(spark, tmp_path):
    tr = _tracker(spark, tmp_path)
    mods = _modules(spark)
    plan = {r["module_code"]: r for r in tr.plan(mods).collect()}
    assert all(r["next_stage"] == "download" for r in plan.values())
    assert all(r[s] == 0 for r in plan.values() for s in STAGES)


def test_stage_order_and_pending_sets(spark, tmp_path):
    tr = _tracker(spark, tmp_path)
    mods = _modules(spark)

    tr.mark("downloaded", mods.where(F.col("module_code") != "0300"))
    tr.mark("unzipped", mods.where(F.col("module_code") == "0100"))

    nxt = {r["module_code"]: r["next_stage"] for r in tr.plan(mods).collect()}
    assert nxt == {"0100": "organize", "0200": "extract", "0300": "download"}

    assert {r["module_code"] for r in
            tr.pending(mods, "downloaded").collect()} == {"0300"}
    assert {r["module_code"] for r in
            tr.pending(mods, "unzipped").collect()} == {"0200"}
    assert {r["module_code"] for r in
            tr.pending(mods, "organized").collect()} == {"0100"}


def test_reopen_resumes_and_reset_forces_redo(spark, tmp_path):
    mods = _modules(spark)
    tr = _tracker(spark, tmp_path)
    for s in STAGES:
        tr.mark(s, mods)

    # a new tracker over the same path sees the completed state
    tr2 = _tracker(spark, tmp_path)
    assert all(r["next_stage"] == "done" for r in tr2.plan(mods).collect())

    # reset appends done=0 tombstones (latest-wins) — full redo planned
    tr2.reset(mods.where(F.col("module_code") == "0200"))
    nxt = {r["module_code"]: r["next_stage"]
           for r in tr2.plan(mods).collect()}
    assert nxt == {"0100": "done", "0200": "download", "0300": "done"}


def test_out_of_order_flag_does_not_skip_stages(spark):
    # organized=1 while downloaded=0: first missing stage still wins
    events = spark.createDataFrame(
        [("enaho", 2022, "0100", "organized", 1)],
        "survey string, year int, module_code string, stage string, done int")
    plan = stage_plan(_modules(spark, [("enaho", 2022, "0100")]),
                      status_from_events(events, KEYS), KEYS).collect()
    assert plan[0]["next_stage"] == "download"


def test_plan_is_lazy_and_unhinted(spark, tmp_path):
    import pyperustats_spark.plans as P

    tr = _tracker(spark, tmp_path)
    mods = _modules(spark)
    tr.mark("downloaded", mods)
    plan = tr.plan(mods)
    # flags join is item-cardinality on both sides — never author-hinted
    assert not P.has_broadcast_hint(plan)
    assert not P.has_python_eval(plan)


def test_empty_log_derives_key_schema_from_items(spark, tmp_path):
    # an EMPTY tracker must plan with the caller's key types: year is
    # int in the items frame, so the empty status frame's year column
    # must be int too (a hardcoded string schema would force an implicit
    # int↔string coercion join and a schema that flips once the log has
    # rows)
    tr = _tracker(spark, tmp_path, "empty")
    mods = _modules(spark)
    st = tr.status(like=mods)
    assert dict(st.dtypes)["year"] == "int"

    plan = tr.plan(mods)
    assert dict(plan.dtypes)["year"] == "int"
    assert all(r["next_stage"] == "download" for r in plan.collect())

    # after the first mark, the non-empty path must produce the SAME
    # schema the empty path did
    tr.mark("downloaded", mods)
    assert tr.plan(mods).schema == plan.schema
