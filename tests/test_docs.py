"""Doc-consistency: the operator counts published in README/SURVEY/
CLAUDE.md must match the actual driver contract (the README drifted
three rounds running before this test)."""

import os
import re

import __spark_entry__ as EN

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(ROOT, name)) as f:
        return f.read()


def test_readme_counts_match_contract():
    n_queries = len(EN.queries())
    n_oracles = len(EN.oracle_sql())
    readme = _read("README.md")
    assert f"exposes {n_queries} operators" in readme, (
        f"README operator count is stale: queries() has {n_queries}")
    assert f"{n_oracles} are paired with an ANSI SQL oracle" in readme, (
        f"README oracle count is stale: oracle_sql() has {n_oracles}")
    rows_only = n_queries - n_oracles
    assert f"The {rows_only} rows-only" in readme, (
        f"README rows-only count is stale: {rows_only}")


def test_claude_md_counts_match_contract():
    text = _read("CLAUDE.md")
    assert f"`queries()` ({len(EN.queries())} entries)" in text
    assert f"({len(EN.oracle_sql())} DuckDB oracles" in text


def test_survey_trailing_counts_match_contract():
    text = _read("SURVEY.md")
    # the LAST "<N> queries, <M> oracles" statement in §7 is the current one
    pairs = re.findall(r"(\d+) queries, (\d+) oracles", text)
    assert pairs, "SURVEY.md lost its count line"
    assert pairs[-1] == (str(len(EN.queries())), str(len(EN.oracle_sql())))


def test_every_oracle_key_is_a_query_and_window_is_oracle_backed():
    qs = list(EN.queries())
    oracles = EN.oracle_sql()
    # every oracle belongs to a real query
    assert set(oracles) <= set(qs)
    # the driver's 50-slot correctness window must be fully oracle-backed
    assert all(k in oracles for k in qs[:50]), [
        k for k in qs[:50] if k not in oracles]


def test_survey_section2_lists_every_query():
    """SURVEY §2 is the judge's coverage checklist: every queries() key
    must appear there (rows were hand-added per operator and can drift
    when a new query ships without its inventory row)."""
    text = _read("SURVEY.md")
    missing = [k for k in EN.queries() if k not in text]
    assert not missing, f"queries missing from SURVEY.md: {missing}"


def test_bench_headline_keys_exist():
    """bench.py's fixed headline set must stay resolvable — a queries()
    rename/rotation that drops a headline key would break the driver's
    per-round BENCH run."""
    import bench
    missing = [k for k in bench.HEADLINE if k not in EN.queries()]
    assert not missing, missing
