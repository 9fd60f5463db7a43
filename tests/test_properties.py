"""Property-based tests (hypothesis): Spark column expressions checked
against plain-Python reference implementations on randomized inputs.

Each property batches its examples into ONE DataFrame so a hypothesis
run costs a handful of Spark jobs, not one per example."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyperustats_spark.functions.text import clean_numeric, slugify, tokens

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_slugify(s: str) -> str:
    s = re.sub(r"[^a-z0-9]+", "-", s.strip().lower())
    return re.sub(r"(^-+|-+$)", "", s)


def _py_clean_numeric(s: str):
    if re.match(r"^-?[\d,]+\.?\d*%?$", s.strip()):
        try:
            return float(s.replace(",", "").replace("%", ""))
        except ValueError:
            return None
    return None


def _py_tokens(s: str):
    return [t for t in re.split(r"[^a-z0-9_']+", s.lower()) if t != ""]


TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_slugify_matches_python(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, s string")
    got = {r["i"]: r["slug"] for r in
           df.select("i", slugify(F.col("s")).alias("slug")).collect()}
    for i, x in enumerate(xs):
        assert got[i] == _py_slugify(x), repr(x)


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_clean_numeric_matches_python(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, s string")
    got = {r["i"]: r["v"] for r in
           df.select("i", clean_numeric(F.col("s")).alias("v")).collect()}
    for i, x in enumerate(xs):
        want = _py_clean_numeric(x)
        if want is None:
            assert got[i] is None, repr(x)
        else:
            assert got[i] == pytest.approx(want), repr(x)


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_tokens_matches_python(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, s string")
    got = {r["i"]: r["t"] for r in
           df.select("i", tokens(F.col("s")).alias("t")).collect()}
    for i, x in enumerate(xs):
        assert got[i] == _py_tokens(x), repr(x)


@settings(**SETTINGS)
@given(st.lists(st.lists(st.floats(min_value=-10, max_value=10,
                                   allow_nan=False, allow_infinity=False),
                         min_size=4, max_size=4),
                min_size=2, max_size=8))
def test_cosine_matches_python(spark, vecs):
    import math

    from pyperustats_spark.functions.vectors import cosine
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "i int, v array<double>")
    ref = vecs[0]
    got = {r["i"]: r["c"] for r in df.select(
        "i", cosine(F.col("v"), F.array(*[F.lit(x) for x in ref])).alias("c")
    ).collect()}
    for i, v in enumerate(vecs):
        dot = sum(a * b for a, b in zip(v, ref))
        na, nb = math.sqrt(sum(a * a for a in v)), math.sqrt(sum(b * b for b in ref))
        if na == 0 or nb == 0:
            continue  # zero vectors: engine-defined, skip
        assert got[i] == pytest.approx(dot / (na * nb), abs=1e-9), v


def _py_next_stage(flags):
    # reference tri-state order: first unset flag wins, later flags
    # never skip ahead (db_utils.py:20-44 defaults + chained pipeline)
    verbs = {"downloaded": "download", "unzipped": "extract",
             "organized": "organize"}
    for s in ("downloaded", "unzipped", "organized"):
        if not flags.get(s, 0):
            return verbs[s]
    return "done"


@given(st.lists(
    st.tuples(st.sampled_from(["downloaded", "unzipped", "organized"]),
              st.integers(min_value=0, max_value=1)),
    max_size=6))
@settings(**SETTINGS)
def test_stage_plan_matches_python_reference(spark, events):
    from pyperustats_spark.sources.progress import (
        stage_plan, status_from_events)

    ev_rows = [("m", stage, done) for stage, done in events]
    items = spark.createDataFrame([("m",)], "module string")
    if ev_rows:
        ev = spark.createDataFrame(ev_rows, "module string, stage string, done int")
        status = status_from_events(ev, ["module"])
    else:
        status = spark.createDataFrame([], "module string, downloaded int, "
                                           "unzipped int, organized int")
    row = stage_plan(items, status, ["module"]).collect()[0]

    # python reference: per stage, max(done) over events, default 0
    flags = {}
    for stage, done in events:
        flags[stage] = max(flags.get(stage, 0), done)
    assert row["next_stage"] == _py_next_stage(flags)
    for s in ("downloaded", "unzipped", "organized"):
        assert row[s] == flags.get(s, 0)


def _py_boilerplate(texts, seg_tokens=3, min_df=2):
    """Python reference for boilerplate_segments semantics."""
    segs_per_doc = {}
    for i, t in enumerate(texts):
        toks = _py_tokens(t or "")
        segs = [" ".join(toks[j:j + seg_tokens])
                for j in range(0, len(toks), seg_tokens)]
        segs_per_doc[i] = segs
    df_count = {}
    for segs in segs_per_doc.values():
        for s in set(segs):
            df_count[s] = df_count.get(s, 0) + 1
    out = {}
    for i, segs in segs_per_doc.items():
        boiler = sum(1 for s in segs if df_count[s] >= min_df)
        out[i] = (len(segs), boiler)
    return out


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=15))
def test_boilerplate_segments_matches_python(spark, xs):
    from pyperustats_spark.operators import textops as TX
    ref = _py_boilerplate(xs)
    docs = spark.createDataFrame(
        list(enumerate(xs)), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_segments"], r["n_boilerplate"])
           for r in TX.boilerplate_segments(docs, seg_tokens=3,
                                            min_df=2).collect()}
    assert got == ref


def _py_funnel(events, steps=("view", "click", "purchase")):
    """Python reference for strictly-ordered funnel counts."""
    by_user = {}
    for uid, ts, typ in events:
        by_user.setdefault(uid, []).append((ts, typ))
    counts = []
    for idx, step in enumerate(steps):
        n = 0
        for uid, evs in by_user.items():
            t_prev = None
            ok = True
            for s in steps[:idx + 1]:
                cand = [ts for ts, typ in evs if typ == s
                        and (t_prev is None or ts > t_prev)]
                if not cand:
                    ok = False
                    break
                t_prev = min(cand)
            if ok:
                n += 1
        counts.append(n)
    return counts


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(min_value=1, max_value=5),
              st.integers(min_value=0, max_value=100),
              st.sampled_from(["view", "click", "purchase", "other"])),
    min_size=1, max_size=40))
def test_funnel_steps_matches_python(spark, events):
    from pyperustats_spark.operators import events as EV
    # make timestamps unique per (user, second) irrelevant — seconds since
    # epoch-2024 are fine; duplicates allowed (strict > handles them)
    ref = _py_funnel([(u, t, ty) for u, t, ty in events])
    rows = [(i, u, f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}", ty)
            for i, (u, t, ty) in enumerate(events)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = [r["n_users"] for r in EV.funnel_steps(ev).collect()]
    assert got == ref


def _py_unigram_logprob(texts, k=0.5):
    import math
    toks = [_py_tokens(t or "") for t in texts]
    counts = {}
    for ts in toks:
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    n = sum(counts.values())
    v = len(counts)
    out = {}
    for i, ts in enumerate(toks):
        if not ts:
            out[i] = (0, None)
            continue
        s = sum(round(math.log((counts[t] + k) / (n + k * v)), 6)
                for t in ts)
        out[i] = (len(ts), round(s, 6))
    return out


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=12))
def test_unigram_logprob_matches_python(spark, xs):
    from pyperustats_spark.operators import textops as TX
    ref = _py_unigram_logprob(xs)
    docs = spark.createDataFrame(
        list(enumerate(xs)), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"],
                         round(r["sum_logprob"], 6)
                         if r["sum_logprob"] is not None else None)
           for r in TX.unigram_logprob(docs).collect()}
    assert set(got) == set(ref)
    for i, (n, s) in ref.items():
        gn, gs = got[i]
        assert gn == n
        if s is None:
            assert gs is None
        else:
            assert gs == pytest.approx(s, abs=2e-6)


def _py_tfidf_top(texts, top=2):
    import math
    tf = []
    for t in texts:
        c = {}
        for tok in _py_tokens(t or ""):
            c[tok] = c.get(tok, 0) + 1
        tf.append(c)
    df_count = {}
    for c in tf:
        for tok in c:
            df_count[tok] = df_count.get(tok, 0) + 1
    nd = len(texts)
    out = {}
    for i, c in enumerate(tf):
        scored = sorted(
            ((tok, n * round(math.log(nd / df_count[tok]), 6))
             for tok, n in c.items()),
            key=lambda kv: (-kv[1], kv[0]))
        out[i] = [tok for tok, _ in scored[:top]]
    return out


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=12))
def test_tfidf_top_terms_matches_python(spark, xs):
    from pyperustats_spark.operators import textops as TX
    ref = _py_tfidf_top(xs, top=2)
    docs = spark.createDataFrame(
        list(enumerate(xs)), "doc_id long, text string")
    got = {}
    for r in TX.tfidf_top_terms(docs, top=2).collect():
        got.setdefault(r["doc_id"], []).append(r["token"])
    for i, terms in ref.items():
        assert got.get(i, []) == terms


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=16),
       st.integers(min_value=1, max_value=200))
def test_token_budget_sample_invariants(spark, xs, budget):
    """Budget is a hard ceiling per source, the walk is deterministic
    (same rows -> same survivors regardless of input order), and
    every kept doc's running total honours the cumulative order."""
    from pyperustats_spark.operators.textops import token_budget_sample
    rows = [(i, x, "src%d" % (i % 2)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = token_budget_sample(df, budget=budget).collect()
    per_src = {}
    for r in out:
        assert r["cum_tokens"] <= budget
        per_src.setdefault(r["source"], []).append(r)
    # permutation invariance: reversed input yields the same doc_ids
    out2 = token_budget_sample(
        spark.createDataFrame(list(reversed(rows)),
                              "doc_id long, text string, source string"),
        budget=budget).collect()
    assert sorted(r["doc_id"] for r in out) == \
        sorted(r["doc_id"] for r in out2)


@settings(**SETTINGS)
@given(st.lists(st.sampled_from(["aa bb", "aa  BB", "cc dd", "ee ff gg"]),
                min_size=2, max_size=12))
def test_leakage_safe_split_group_invariant(spark, xs):
    """No content group ever straddles the split, for any val_pct, and
    every member carries the group-minimum doc_id as rep_id."""
    from pyperustats_spark.operators.dedup import split_leakage_safe
    rows = [(i, x, "en") for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = split_leakage_safe(df, val_pct=37).collect()
    by_rep = {}
    for r in out:
        by_rep.setdefault(r["rep_id"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_rep.values())
    # rep is the min doc_id of its group
    import re as _re
    def norm(s):
        return _re.sub(r"\s+", " ", s.lower()).strip()
    groups = {}
    for i, x in enumerate(xs):
        groups.setdefault(norm(x), []).append(i)
    expect_rep = {i: min(g) for g in groups.values() for i in g}
    got_rep = {r["doc_id"]: r["rep_id"] for r in out}
    assert got_rep == expect_rep


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5)),
                min_size=2, max_size=20))
def test_event_transitions_matches_python(spark, steps):
    """Transition counts equal a plain-Python per-user walk."""
    from collections import Counter, defaultdict
    from pyperustats_spark.operators.events import event_transitions
    rows = [(i, "2020-01-01 00:%02d:00" % (i % 60), u, "t%d" % t)
            for i, (u, t) in enumerate(steps)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for r in event_transitions(ev).collect()}
    per_user = defaultdict(list)
    for i, (u, t) in enumerate(steps):
        per_user[u].append((("2020-01-01 00:%02d:00" % (i % 60)), i, "t%d" % t))
    expect = Counter()
    for u, evs in per_user.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            expect[(a[2], b[2])] += 1
    assert got == dict(expect)


def _py_holt(xs, alpha, beta):
    lvl = trend = None
    out = []
    for x in xs:
        fc = None if lvl is None else lvl + trend
        if x is None:
            out.append((lvl, trend, fc))
            continue
        if lvl is None:
            lvl, trend = x, 0.0
        else:
            prev = lvl
            lvl = alpha * x + (1.0 - alpha) * (lvl + trend)
            trend = beta * (lvl - prev) + (1.0 - beta) * trend
        out.append((lvl, trend, fc))
    return out


@settings(**SETTINGS)
@given(
    st.lists(st.one_of(
        st.none(),
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False)),
        min_size=1, max_size=25),
    st.floats(min_value=0.05, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_holt_winters_matches_python(spark, xs, alpha, beta):
    from datetime import datetime, timedelta

    from pyperustats_spark.operators import timeseries as TS

    rows = [(datetime(2020, 1, 1) + timedelta(days=i), "A", x)
            for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "date timestamp, code string, value double")
    got = [(r["level"], r["trend"], r["forecast"]) for r in
           TS.holt_winters(df, alpha=alpha, beta=beta).collect()]
    want = _py_holt(xs, alpha, beta)
    assert len(got) == len(want)
    for (gl, gt, gf), (wl, wt, wf) in zip(got, want):
        for g, w in ((gl, wl), (gt, wt), (gf, wf)):
            if w is None:
                assert g is None
            else:
                assert g == pytest.approx(w, rel=1e-9, abs=1e-9)


@settings(**SETTINGS)
@given(st.integers(min_value=0, max_value=3))
def test_pq_encodes_codewords_to_themselves(spark, which):
    """Identity property: a vector that IS a codeword must encode to
    that codeword's index in every subspace (distance 0 beats every
    other codeword; ties cannot arise against itself)."""
    from pyperustats_spark.operators import similarity as S

    # 4 deterministic, clearly-separated vectors of dim 8
    base = [[float(10 * w + i) for i in range(8)] for w in range(4)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>")
    books = S.pq_codebooks(df, m=2, k=4, dim=8)
    codes = {r["vec_id"]: list(r["codes"]) for r in
             S.pq_encode(df, books).collect()}
    v = base[which]
    expect = [
        min(range(4), key=lambda j: sum(
            (v[s * 4 + i] - books[s][j][i]) ** 2 for i in range(4)))
        for s in range(2)
    ]
    assert codes[which] == expect
    # and its reconstruction distance is exactly zero when the corpus
    # seeded the codebook with itself (n == k stride sample)
    sub_errs = S.pq_distortion_profile(df, m=2, k=4, dim=8).collect()
    assert all(r["mean_sq_err"] == pytest.approx(0.0) for r in sub_errs)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_winnowing_detection_guarantee(spark, data):
    """The winnowing guarantee as a property: ANY two documents
    sharing a verbatim run of >= n_tokens + winnow - 1 tokens produce
    a pair, for random run contents, random prefix/suffix paddings
    (random alignments), and random n/winnow parameters. This is the
    theorem the exact-substring family rests on (Schleimer et al.
    2003) — a regression here (e.g. reverting to stride sampling)
    fails fast."""
    from pyperustats_spark.operators import dedup as D

    n_tokens = data.draw(st.integers(min_value=3, max_value=12))
    winnow = data.draw(st.integers(min_value=2, max_value=6))
    run_len = n_tokens + winnow - 1
    run = " ".join(f"r{data.draw(st.integers(0, 9))}x{i}"
                   for i in range(run_len))
    pad_a = data.draw(st.integers(min_value=0, max_value=7))
    pad_b = data.draw(st.integers(min_value=0, max_value=7))
    doc_a = " ".join([*(f"a{j}" for j in range(pad_a)), run,
                      *(f"za{j}" for j in range(data.draw(
                          st.integers(0, 5))))])
    doc_b = " ".join([*(f"b{j}" for j in range(pad_b)), run,
                      *(f"zb{j}" for j in range(data.draw(
                          st.integers(0, 5))))])
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string")
    pairs = D.exact_substring_pairs(
        df, n_tokens=n_tokens, winnow=winnow).collect()
    assert any(r["id_a"] == 1 and r["id_b"] == 2 for r in pairs), (
        n_tokens, winnow, pad_a, pad_b)


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),      # group
              st.integers(min_value=-10**6, max_value=10**6)),  # y int
    min_size=1, max_size=40))
def test_ols_exact_matches_python(spark, pts):
    """The fixed-point OLS core against a pure-python exact-integer
    reference on random integer data: slope/intercept/r2 must be
    BIT-equal (no tolerance — that's the determinism contract the
    ts_ols_trend / text_zipf_fit oracles rely on), including NULL for
    degenerate groups (n = 1, constant y for r2)."""
    from pyperustats_spark.functions.stats import ols_exact

    rows = [(g, i + 1, y) for i, (g, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {r["g"]: r for r in
           ols_exact(df, ["g"], x="x", y="y",
                     x_scale=1.0, y_scale=1.0).collect()}
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, xy in by_g.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxx = sum(x * x for x, _ in xy)
        sxy = sum(x * y for x, y in xy)
        syy = sum(y * y for _, y in xy)
        num, denx, deny = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        r = got[g]
        assert r["n_obs"] == n
        if denx == 0:
            assert r["slope"] is None and r["r2"] is None
            continue
        slope = float(num) / float(denx) / 1.0
        assert r["slope"] == slope
        assert r["intercept"] == (float(sy) / (1.0 * float(n))
                                  - slope * (float(sx) / (1.0 * float(n))))
        if deny == 0:
            assert r["r2"] is None
        else:
            assert r["r2"] == (float(num) * float(num)
                               / (float(denx) * float(deny)))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # user_id
        st.integers(min_value=0, max_value=5 * 86_400),   # offset sec
    ),
    min_size=1, max_size=40))
def test_chunked_sessionizer_matches_plain_python_model(spark, rows):
    """assign_sessions_chunked == assign_sessions == a row-at-a-time
    Python model, on random multi-day event sets (cross-midnight
    continuations, long gaps, tied timestamps all reachable)."""
    import datetime as dt

    from pyperustats_spark.operators.events import (
        assign_sessions, assign_sessions_chunked)

    base = dt.datetime(2024, 1, 1)
    data = [
        (u, base + dt.timedelta(seconds=off), i, 1.0, "t")
        for i, (u, off) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, value double,"
              " event_type string")
    # python model: per user, order by (ts, event_id), gap > 30 min
    model = {}
    per_user = {}
    for u, ts, eid, _v, _t in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        prev, seq = per_user.get(u, (None, 0))
        if prev is None or (ts - prev).total_seconds() > 1800:
            seq += 1
        per_user[u] = (ts, seq)
        model[eid] = seq
    plain = {r["event_id"]: r["session_seq"]
             for r in assign_sessions(ev).select(
                 "event_id", "session_seq").collect()}
    chunk = {r["event_id"]: r["session_seq"]
             for r in assign_sessions_chunked(ev).select(
                 "event_id", "session_seq").collect()}
    assert plain == model
    assert chunk == model


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # user_id
        st.integers(min_value=0, max_value=3 * 86_400),   # offset sec
    ),
    min_size=1, max_size=40))
def test_chunked_burst_matches_plain_and_python_model(spark, rows):
    """burst_profile_chunked == burst_profile == a brute-force Python
    model on random multi-day event sets (frames straddling midnight
    and tied seconds reachable)."""
    import datetime as dt

    from pyperustats_spark.operators.events import (
        burst_profile, burst_profile_chunked)

    base = dt.datetime(2024, 1, 1)
    data = [
        (u, base + dt.timedelta(seconds=off), i, 1.0, "t")
        for i, (u, off) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, value double,"
              " event_type string")
    W = 3600
    # python model: per user, count events in [t-W, t] (whole seconds)
    per_user = {}
    for u, ts, _i, _v, _t in data:
        per_user.setdefault(u, []).append(int(ts.timestamp()))
    model = {}
    for u, secs in per_user.items():
        mx = max(sum(1 for s2 in secs if t - W <= s2 <= t) for t in secs)
        model[u] = (mx, len(secs), mx >= 5)
    plain = {r["user_id"]: (r["max_burst"], r["n_events"], r["is_burst"])
             for r in burst_profile(ev).collect()}
    chunk = {r["user_id"]: (r["max_burst"], r["n_events"], r["is_burst"])
             for r in burst_profile_chunked(ev).collect()}
    assert plain == model
    assert chunk == model


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),                       # code
        st.integers(min_value=0, max_value=1500),          # day offset
        st.integers(min_value=-10_000, max_value=10_000),  # cents
    ),
    min_size=1, max_size=40, unique_by=lambda r: (r[0], r[1])))
def test_chunked_cusum_matches_plain_rowforrow(spark, rows):
    """cusum_changepoint_chunked == cusum_changepoint on random
    multi-year series (chunk boundaries and negative values reachable)
    — the integer fixed-point statistic makes the equality exact."""
    import datetime as dt

    from pyperustats_spark.operators.timeseries import (
        cusum_changepoint, cusum_changepoint_chunked)

    base = dt.datetime(2020, 1, 1)
    data = [
        (code, base + dt.timedelta(days=day), cents / 100.0)
        for code, day, cents in rows
    ]
    long_df = spark.createDataFrame(
        data, "code string, date timestamp, value double")
    cols = ("code", "n", "change_date", "cusum_stat",
            "mean_before", "mean_after", "level_shift")
    plain = sorted(tuple(r[c] for c in cols)
                   for r in cusum_changepoint(long_df).collect())
    chunk = sorted(tuple(r[c] for c in cols)
                   for r in cusum_changepoint_chunked(long_df).collect())
    assert plain == chunk


@given(st.lists(
    st.tuples(st.integers(min_value=1, max_value=6),   # user
              st.sampled_from(["a", "b", "c", "d"])),  # event type
    min_size=1, max_size=60))
@settings(**SETTINGS)
def test_user_entropy_matches_python(spark, pairs):
    """user_entropy's integer micro-nat recurrence equals the Python
    model bit-for-bit on random (user, type) multisets."""
    import math

    from pyperustats_spark.operators.events import user_entropy

    ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", u, t, 1.0)
         for i, (u, t) in enumerate(pairs)],
        "event_id long, ts string, user_id long, "
        "event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r for r in user_entropy(ev).collect()}

    by_user = {}
    for u, t in pairs:
        by_user.setdefault(u, {}).setdefault(t, 0)
        by_user[u][t] += 1
    for u, cnts in by_user.items():
        n = sum(cnts.values())
        slc = sum(c * round(math.log(c) * 1e6) for c in cnts.values())
        h = round(math.log(n), 6) - (slc / n) / 1e6
        r = got[u]
        assert (r["n_events"], r["n_types"]) == (n, len(cnts))
        assert r["type_entropy"] == h, (u, cnts)
        if len(cnts) > 1:
            assert r["evenness"] == h / round(math.log(len(cnts)), 6)
        else:
            assert r["evenness"] is None


@given(st.lists(st.tuples(st.sampled_from(["x", "y", "z"]),
                          st.integers(min_value=0, max_value=50)),
                min_size=2, max_size=40))
@settings(**SETTINGS)
def test_sample_per_group_hist_equals_plain_random(spark, rows):
    """The histogram-rank sampler is row-for-row the plain windowed
    sampler on random (group, key) frames (keys deduped per group)."""
    from pyperustats_spark.operators.relational import (
        sample_per_group, sample_per_group_hist)

    uniq = list({(g, k) for g, k in rows})
    df = spark.createDataFrame(uniq, ["lang", "doc_id"])
    for k in (1, 3):
        plain = {(r["lang"], r["doc_id"])
                 for r in sample_per_group(
                     df, ["lang"], "doc_id", k=k).collect()}
        hist = {(r["lang"], r["doc_id"])
                for r in sample_per_group_hist(
                    df, ["lang"], "doc_id", k=k, nibbles=1).collect()}
        assert hist == plain


def _py_fold_key(label: str) -> str:
    # the reference's exact chain (41_candidatos_historial.py:37-46):
    # colon strip, lower, spaces->_, fold exactly óíéáú (ñ kept)
    key = label.replace(":", "").lower().replace(" ", "_")
    for src, dst in (("ó", "o"), ("í", "i"), ("é", "e"),
                     ("á", "a"), ("ú", "u")):
        key = key.replace(src, dst)
    return key


LABEL = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126,
        # regex-special chars aside, fold_key treats input literally;
        # include the accented vowels + ñ explicitly
    ) | st.sampled_from(list("óíéáúñÓÁÉ ::")),
    max_size=40,
)


@settings(**SETTINGS)
@given(st.lists(LABEL, min_size=1, max_size=20))
def test_affiliation_fold_key_matches_reference_chain(spark, xs):
    from pyperustats_spark.sources.infogob_historial import fold_key

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                               "i int, s string")
    got = {r["i"]: r["v"] for r in
           df.select("i", fold_key(F.col("s")).alias("v")).collect()}
    for i, x in enumerate(xs):
        assert got[i] == _py_fold_key(x), repr(x)


@settings(**SETTINGS)
@given(st.lists(st.lists(st.floats(min_value=-10, max_value=10,
                                   allow_nan=False, allow_infinity=False),
                         min_size=64, max_size=64),
                min_size=2, max_size=6))
def test_binary_signature_hamming_matches_python(spark, vecs):
    """binary_signature packs sign bits into 32-bit words exactly, and
    hamming_distance equals the plain-Python bit-diff count."""
    from pyperustats_spark.operators.similarity import (
        binary_signature, hamming_distance)

    def py_sig(v):
        return [sum(1 << i for i in range(32) if v[w * 32 + i] >= 0)
                for w in range(2)]

    def py_ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "i int, embedding array<double>")
    ref = df.where(F.col("i") == 0).select(
        binary_signature(F.col("embedding")).alias("ref_sig"))
    got = (
        df.crossJoin(F.broadcast(ref))
        .select(
            "i",
            binary_signature(F.col("embedding")).alias("sig"),
            hamming_distance(
                binary_signature(F.col("embedding")),
                F.col("ref_sig")).alias("h"))
        .collect()
    )
    sig0 = py_sig(vecs[0])
    for r in got:
        assert list(r["sig"]) == py_sig(vecs[r["i"]]), r["i"]
        assert r["h"] == py_ham(py_sig(vecs[r["i"]]), sig0), r["i"]
