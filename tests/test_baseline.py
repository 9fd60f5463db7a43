"""The frozen-performance gate: BASELINE.md (round-5 sf0.1 numbers) is
the standing numeric baseline the BASELINE.json 2× criterion grades
against. Two contracts:

1. doc consistency — the BASELINE.md table and bench.py's pinned dict
   must agree (either drifting silently would un-freeze the gate);
2. regression gate — the most recent sf0.1 bench run (BENCH_LATEST.json,
   written by bench.py) must not exceed 2× any pinned per-query time.
   Skipped when no local bench has run; the driver's per-round bench
   refreshes the artifact, so a regressed round fails here.
"""

import json
import os
import re

import pytest

import bench

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _baseline_md_rows():
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        text = f.read()
    return {m.group(1): float(m.group(2))
            for m in re.finditer(r"^\| (\w+) \| ([0-9.]+) \|$", text,
                                 re.MULTILINE)}


def test_baseline_md_matches_bench_pins():
    md = _baseline_md_rows()
    pinned = {**bench.BASELINE, **bench.COHORT2_BASELINE,
              **bench.COHORT3_BASELINE}
    assert md == pytest.approx(pinned), (
        "BASELINE.md tables and bench pins drifted")
    assert set(md) == (set(bench.HEADLINE) | set(bench.COHORT2)
                       | set(bench.COHORT3))
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        text = f.read()
    assert f"**Total: {bench.BASELINE_TOTAL} s.**" in text
    assert round(sum(bench.BASELINE.values()), 3) == bench.BASELINE_TOTAL
    assert f"**Cohort-2 total: {bench.COHORT2_TOTAL} s.**" in text
    assert (round(sum(bench.COHORT2_BASELINE.values()), 3)
            == bench.COHORT2_TOTAL)
    assert f"**Cohort-3 total: {bench.COHORT3_TOTAL} s.**" in text
    assert (round(sum(bench.COHORT3_BASELINE.values()), 3)
            == bench.COHORT3_TOTAL)


def test_latest_bench_within_2x_of_baseline():
    path = os.path.join(ROOT, "BENCH_LATEST.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_LATEST.json — run `python bench.py` "
                    "(sf0.1) to produce the artifact this gate checks")
    with open(path) as f:
        latest = json.load(f)
    if latest.get("sf") != bench.BASELINE_SF:
        pytest.skip(f"latest bench ran at sf={latest.get('sf')}, "
                    f"gate is pinned at sf={bench.BASELINE_SF}")
    # every pin is a 32-core quantity; the driver also runs bench.py at
    # a lower core count for its scaling probe, and that pass rewrites
    # BENCH_LATEST.json too (r11 handoff: the 8-core artifact read as
    # cohort-3 "regressions"). Artifacts predating the cpus stamp gate
    # as before.
    cpus = latest.get("cpus")
    if cpus is not None and cpus != 32:
        pytest.skip(f"latest bench ran at {cpus} cores, pins are "
                    "32-core quantities — not comparable")
    over = {q: (latest["queries"].get(q), bench.BASELINE[q])
            for q in bench.BASELINE
            if latest["queries"].get(q) is not None
            and latest["queries"][q] > 2.0 * bench.BASELINE[q]}
    assert not over, (
        f"queries exceeding 2x their frozen BASELINE.md time "
        f"(got, pinned): {over}")
    assert latest["value"] <= 2.0 * bench.BASELINE_TOTAL
    # cohort-2 gate (absent from pre-round-8 artifacts)
    c2 = latest.get("cohort2", {})
    over2 = {q: (c2.get(q), bench.COHORT2_BASELINE[q])
             for q in bench.COHORT2_BASELINE
             if c2.get(q) is not None
             and c2[q] > 2.0 * bench.COHORT2_BASELINE[q]}
    assert not over2, (
        f"cohort-2 queries exceeding 2x their pinned time "
        f"(got, pinned): {over2}")
    # cohort-3 gate (present only when the pinned 100× dir existed at
    # bench time — a fresh checkout skips it until the set rebuilds)
    c3 = latest.get("cohort3", {})
    over3 = {q: (c3.get(q), bench.COHORT3_BASELINE[q])
             for q in bench.COHORT3_BASELINE
             if c3.get(q) is not None
             and c3[q] > 2.0 * bench.COHORT3_BASELINE[q]}
    assert not over3, (
        f"cohort-3 queries exceeding 2x their pinned 100x time "
        f"(got, pinned): {over3}")


def test_regate_retries_only_breaches_and_keeps_min():
    """The re-measure-on-breach contract: non-breaching queries are
    never re-timed; a breaching query is re-timed up to `retries`
    times, keeps the min of every measurement, and stops retrying as
    soon as it comes back under gate."""
    calls = []

    def time_one(name):
        calls.append(name)
        # the retry comes back quiet: under 2x the 1.0 pin
        return 1.5

    timings = {"ok": 1.9, "noisy": 2.5, "unpinned": 99.0}
    out = bench.regate(timings, {"ok": 1.0, "noisy": 1.0},
                       time_one, retries=2)
    assert calls == ["noisy"]          # one retry cleared it; ok/unpinned untouched
    assert out["ok"] == 1.9
    assert out["noisy"] == 1.5         # min(2.5, 1.5)
    assert out["unpinned"] == 99.0     # no pin -> never gated


def test_regate_real_regression_survives_retries():
    """A reproducible regression is NOT papered over: retries exhaust,
    the breaching number stays, and the regression computation that
    follows in main() would still book it."""
    calls = []

    def time_one(name):
        calls.append(name)
        return 2.6                     # reproduces every retry

    out = bench.regate({"slow": 2.5}, {"slow": 1.0}, time_one, retries=2)
    assert calls == ["slow", "slow"]   # both retries spent
    assert out["slow"] == 2.5          # min kept, still > 2x pin


def test_regate_keeps_minimum_across_noisy_retries():
    vals = iter([3.0, 0.9])

    def time_one(name):
        return next(vals)

    out = bench.regate({"q": 2.5}, {"q": 1.0}, time_one, retries=5)
    # first retry worse (3.0), second clears the gate (0.9) and stops
    assert out["q"] == 0.9
