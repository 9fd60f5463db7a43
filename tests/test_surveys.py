"""Survey registry + module-frame enrichment (reference
inei/surveys/registry.py:20-108, inei/module_fetcher.py:37-52)."""

import pytest
from pyspark.sql import functions as F

from pyperustats_spark.sources.surveys import (
    PROGRESS_COLS,
    Survey,
    SurveyRegistry,
    module_frame,
    registry,
)


def test_builtin_registry_matches_reference():
    assert registry.list_codes() == [
        "enaho", "enaho_panel", "enapres", "endes", "renamu"]
    assert registry.list_codes(period="panel") == ["enaho_panel"]
    assert "enaho" in registry and "nope" not in registry
    s = registry.get("enaho")
    assert s.period_aliases == ["anual", "unico"]
    assert str(s) == (
        "enaho (anual): Condiciones de Vida y Pobreza - ENAHO")


def test_registry_guards():
    r = SurveyRegistry()
    r.register(Survey("a", "A"))
    with pytest.raises(ValueError, match="already registered"):
        r.register(Survey("a", "A again"))
    with pytest.raises(KeyError, match="Available codes: a"):
        r.get("missing")
    # chaining (reference returns self)
    assert r.register(Survey("b", "B", "panel")).list_codes() == ["a", "b"]


def test_registry_to_df_is_tiny_joinable(spark):
    df = registry.to_df(spark)
    assert df.count() == 5
    assert set(df.columns) == {"survey", "name", "period"}


def test_module_frame_enrichment_feeds_tracker(spark, tmp_path):
    from pyperustats_spark.sources.progress import StageProgressTracker
    mods = spark.createDataFrame(
        [("0100", "Caracteristicas del hogar"),
         ("0200", "Vivienda")],
        "module_code string, module_name string")
    mf = module_frame(mods, registry.get("enaho"), 2022)
    rows = mf.collect()
    assert all(r["survey"] == "enaho" and r["year"] == 2022
               and r["periodo"] == "anual" for r in rows)
    for col in PROGRESS_COLS:
        assert all(r[col] is None for r in rows)
    # the enriched frame is exactly what the tracker plans over
    tr = StageProgressTracker(
        spark, str(tmp_path / "prog"),
        keys=["survey", "year", "module_code"])
    plan = tr.plan(mf.select("survey", "year", "module_code"))
    assert plan.count() == 2
    assert {r["next_stage"] for r in plan.collect()} == {"download"}
