"""Plan introspection helpers: make optimizer behavior testable.

The scale contract of this engine ("filters reach the parquet scan",
"dim joins broadcast", "no Python eval in hot paths") is asserted in
tests via these helpers instead of being hoped for. They parse
``explain("formatted")`` output — the same text a human reads — so a
regression in pushdown or join strategy fails CI, not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (PySpark only prints it)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        inner = m.group(1).strip()
        if inner:
            out.extend(s.strip() for s in inner.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_broadcast_hint(df: DataFrame) -> bool:
    """True if the ANALYZED logical plan carries an explicit broadcast
    hint (``F.broadcast``/``/*+ BROADCAST */``). Distinguishes a plan
    the optimizer *chose* to broadcast (fine — size-based) from one the
    author *forced* (a driver-OOM risk when the hinted side isn't
    actually small). Matches only broadcast-strategy hints — merge /
    shuffle_hash / repartition hints are not broadcasts and must not
    trip this check."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return re.search(
        r"(?:Un)?[Rr]esolvedHint .*broadcast", analyzed, re.IGNORECASE
    ) is not None


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of author-forced broadcast hints in the analyzed plan.

    Tighter than :func:`has_broadcast_hint` for queries that
    legitimately hint fixed-size dims: asserting an exact count catches
    an accidental extra hint on a growing table even when other hints
    are expected."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(
        r"(?:Un)?[Rr]esolvedHint .*broadcast", analyzed, re.IGNORECASE))


def has_python_eval(df: DataFrame) -> bool:
    """True if the plan row-evaluates Python (BatchEvalPython) or runs an
    Arrow-batched Python stage (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas). Hot-path operators should return False;
    multimodal stages legitimately return True."""
    text = explain_str(df)
    return any(
        tag in text
        for tag in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",
        )
    )


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the FINAL (post-AQE) plan.

    Under AQE the pre-execution plan is just ``AdaptiveSparkPlan
    isFinalPlan=false`` with no codegen markers, so this runs the query
    (cheap on test data) and reads the executed plan's ``*(n)`` spans."""
    df.collect()  # count() would execute a different (re-planned) query
    executed = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", executed)))


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges (hash / range / single-partition) in
    the pre-execution physical plan. BroadcastExchange is deliberately
    excluded — broadcasting an O(small) side moves no data-sized rows,
    so "zero exchanges" here means "nothing proportional to the input
    ever crosses the network". The embarrassingly-parallel operators
    (radius_search with sort=False) pin this at 0."""
    txt = explain_str(df, "simple")
    return len(re.findall(
        r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
        txt))


def global_sort_count(df: DataFrame) -> int:
    """Number of GLOBAL sorts surviving in the OPTIMIZED logical plan.

    A composed operator chain should carry at most one — the caller's
    final presentation sort. Every extra one is a full-data range
    shuffle + sort the next shuffle immediately destroys; operators
    meant for composition take ``sort=False`` so their presentation
    tails never reach a mid-pipeline plan (Catalyst's EliminateSorts
    catches some of these, but not e.g. sorts feeding unions or
    Python stages — this counts what actually SURVIVED)."""
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    return len(re.findall(r"Sort \[[^\]]*\], true", opt))
