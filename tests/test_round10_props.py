"""Differential tests for the round-10 operators: each one's arithmetic
is replayed in pure Python on seeded random inputs and must agree with
the Spark output EXACTLY — the same proofs the DuckDB oracles assert,
but against an independent third implementation and on adversarial
shapes the fixed testdata doesn't contain (tied days, duplicate
timestamps, degenerate single-event users, unicode CDC windows)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import random

from kafka_streams_in_action_spark.functions.serde import _fnv1a_32_bytes
from kafka_streams_in_action_spark.operators import (
    dedup, event_time, relational, sampling, text, windows,
)

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events_df(spark, rows):
    """rows = [(event_id, user_id, seconds_offset, event_type, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(seconds=s), u, t, v, "{}")
         for e, u, s, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def _milli(v: float) -> int:
    return int(math.floor(v * 1000.0 + 0.5))


def test_rsi_matches_python_replay(spark):
    """Random daily series per type: integer gains/losses over the
    trailing 14 deltas replayed exactly."""
    rnd = random.Random(23)
    rows, eid = [], 0
    for tix, ty in enumerate(["view", "click"]):
        for d in range(40):
            # possibly several events per day
            for _ in range(rnd.randint(1, 3)):
                rows.append((eid, 1, d * 86400 + rnd.randint(0, 3600),
                             ty, rnd.uniform(0.001, 50.0)))
                eid += 1
    got = {(r["event_type"], r["day"].isoformat()): r
           for r in windows.rsi_daily(_events_df(spark, rows)).collect()}

    daysum = {}
    for e, u, s, ty, v in rows:
        day = (TS0 + dt.timedelta(seconds=s)).date()
        daysum[(ty, day)] = daysum.get((ty, day), 0) + _milli(v)
    exp_n = 0
    for ty in ("view", "click"):
        days = sorted(d for (t2, d) in daysum if t2 == ty)
        deltas = [(days[i], daysum[(ty, days[i])] -
                   daysum[(ty, days[i - 1])])
                  for i in range(1, len(days))]
        for i in range(13, len(deltas)):
            win = [d for _, d in deltas[i - 13:i + 1]]
            sg = sum(x for x in win if x > 0)
            sl = sum(-x for x in win if x < 0)
            if sg + sl == 0:
                continue
            exp_n += 1
            r = got[(ty, deltas[i][0].isoformat())]
            assert r["delta_milli"] == deltas[i][1]
            assert r["rsi"] == float(100 * sg) / float(sg + sl)
    assert exp_n == len(got) and exp_n > 10


def test_interarrival_matches_python_replay(spark):
    rnd = random.Random(31)
    rows, eid = [], 0
    for u in range(8):
        t = 0
        for _ in range(rnd.randint(1, 30)):
            t += rnd.randint(0, 7200)  # zero gaps allowed
            rows.append((eid, u, t, "view", 0.0))
            eid += 1
    got = {r["user_id"]: r for r in event_time.interarrival_stats(
        _events_df(spark, rows)).collect()}

    by_user = {}
    for e, u, s, ty, v in sorted(rows, key=lambda r: (r[2], r[0])):
        by_user.setdefault(u, []).append(s * 1_000_000)
    for u, ts in by_user.items():
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        if not gaps:
            assert u not in got
            continue
        gs = [g // 1_000_000 for g in gaps]
        n = float(len(gs))
        s1, s2 = float(sum(gs)), float(sum(g * g for g in gs))
        r = got[u]
        assert r["n_gaps"] == len(gs) and r["max_gap_us"] == max(gaps)
        assert r["mean_gap_s"] == round(s1 / n, 6)
        mean = s1 / n
        var = (s2 - s1 * s1 / n) / (n - 1) if n > 1 else 0.0
        if n > 1 and mean > 0 and var > 0:
            assert r["cv"] == round(math.sqrt(var) / mean, 6)
        else:
            assert r["cv"] is None


def test_order_regressions_matches_python_replay(spark):
    rnd = random.Random(37)
    rows, eid = [], 0
    for u in range(6):
        for _ in range(rnd.randint(1, 25)):
            rows.append((eid, u, rnd.randint(0, 5000), "view", 0.0))
            eid += 1
    got = {r["user_id"]: r for r in event_time.ingestion_order_audit(
        _events_df(spark, rows)).collect()}
    by_user = {}
    for e, u, s, ty, v in sorted(rows):
        by_user.setdefault(u, []).append(s * 1_000_000)
    for u, ts in by_user.items():
        backs = [max(a - b, 0) for a, b in zip(ts, ts[1:])]
        r = got[u]
        assert r["n_events"] == len(ts)
        assert r["n_regressions"] == sum(1 for b in backs if b > 0)
        assert r["max_backstep_us"] == (max(backs) if backs else 0)


def test_ltv_matches_python_replay(spark):
    rnd = random.Random(41)
    rows = []
    for ok in range(80):
        rows.append((ok, rnd.randint(1, 12),
                     dt.datetime(2023 + rnd.randint(0, 1),
                                 rnd.randint(1, 12), rnd.randint(1, 28)),
                     rnd.uniform(1.0, 500.0)))
    od = spark.createDataFrame(
        [(k, c, "O", p, d, "x") for k, c, d, p in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    got = {(r["cohort_month"].isoformat(), r["age"]): r
           for r in relational.cohort_ltv(od).collect()}

    ymf = lambda d: d.year * 12 + d.month - 1
    cohort = {}
    for k, c, d, p in rows:
        cohort[c] = min(cohort.get(c, 10 ** 9), ymf(d))
    cell = {}
    for k, c, d, p in rows:
        key = (cohort[c], ymf(d) - cohort[c])
        users, rev = cell.get(key, (set(), 0))
        users.add(c)
        cell[key] = (users | {c}, rev + _milli(p))
    cum = {}
    for (cm, age) in sorted(cell):
        users, rev = cell[(cm, age)]
        cum[cm] = cum.get(cm, 0) + rev
        month = dt.date(cm // 12, cm % 12 + 1, 1).isoformat()
        r = got[(month, age)]
        assert r["n_active"] == len(users)
        assert r["revenue_milli"] == rev
        assert r["cum_revenue_milli"] == cum[cm]
    assert len(got) == len(cell)


def test_length_quantiles_match_sorted_replay(spark):
    rnd = random.Random(43)
    lens = [rnd.randint(1, 60) for _ in range(137)]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * k), "en", "s", k)
         for i, k in enumerate(lens)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r["pct"]: r for r in
           text.length_quantile_report(docs).collect()}
    srt = sorted(lens)
    n = len(lens)
    for pct in (50, 90, 99):
        rank = (pct * n + 99) // 100
        assert got[pct]["rank"] == rank
        assert got[pct]["n_tok"] == srt[rank - 1]
        assert got[pct]["n_docs"] == n


def test_kfold_matches_fnv_replay(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", ["en", "fr", "de"][i % 3], "s", 10 + i)
         for i in range(200)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {(r["fold"], r["lang"]): r for r in
           sampling.kfold_split(docs).collect()}
    exp = {}
    for i in range(200):
        fold = _fnv1a_32_bytes(str(i).encode()) % 5
        key = (fold, ["en", "fr", "de"][i % 3])
        n, ch = exp.get(key, (0, 0))
        exp[key] = (n + 1, ch + 10 + i)
    assert set(got) == set(exp)
    for key, (n, ch) in exp.items():
        assert got[key]["n"] == n and got[key]["n_chars"] == ch
    for fold in {f for f, _ in exp}:
        total = sum(n for (f, _), (n, _) in exp.items() if f == fold)
        assert all(got[(f2, l)]["fold_total"] == total
                   for (f2, l) in got if f2 == fold)


def test_cdc_chunk_stats_matches_python_replay(spark):
    """Random texts with planted shared substrings: chunk counts and
    dup fractions replayed via the scalar fold + md5."""
    rnd = random.Random(47)
    shared = "".join(rnd.choices("abcdefgh ", k=300))
    texts = []
    for i in range(12):
        own = "".join(rnd.choices("npqrstuv ", k=rnd.randint(0, 250)))
        texts.append(own + shared if i % 2 == 0 else own)
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r["doc_id"]: r for r in dedup.cdc_chunk_stats(docs).collect()}

    M, B, W = 2147483647, 131, 16

    def chunks(t):
        bnds = []
        for i in range(W, len(t) + 1):
            h = 0
            for ch in t[i - W:i]:
                h = (h * B + ord(ch)) % M
            if h % 64 == 0:
                bnds.append(i)
        starts = [0] + bnds
        ends = bnds + ([len(t)] if (not bnds or bnds[-1] < len(t))
                       else [])
        return [hashlib.md5(t[s:e].encode()).hexdigest()
                for s, e in zip(starts, ends)]

    per_doc = {i: chunks(t) for i, t in enumerate(texts)}
    docs_per_hash = {}
    for i, hs in per_doc.items():
        for h in set(hs):
            docs_per_hash.setdefault(h, set()).add(i)
    for i, hs in per_doc.items():
        dup = sum(1 for h in hs if len(docs_per_hash[h]) >= 2)
        r = got[i]
        assert r["n_chunks"] == len(hs)
        assert r["n_dup_chunks"] == dup
        assert r["dup_frac"] == float(dup) / float(len(hs))


def test_cdc_boundaries_hypothesis_fuzz():
    """Property fuzz (hypothesis): the vectorized prefix-hash boundary
    finder equals the scalar 16-step fold for ANY text, and shifting a
    text by a prefix shifts every boundary beyond the resync horizon by
    exactly the prefix length (content-definedness)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    M, B, W = 2147483647, 131, 16

    def scalar(t):
        out = []
        for i in range(W, len(t) + 1):
            h = 0
            for ch in t[i - W:i]:
                h = (h * B + ord(ch)) % M
            if h % 64 == 0:
                out.append(i)
        return out

    @settings(max_examples=60, deadline=None)
    @given(st.text(min_size=0, max_size=300))
    def check(t):
        assert dedup._cdc_boundaries(t) == scalar(t)

    check()

    @settings(max_examples=30, deadline=None)
    @given(st.text(min_size=50, max_size=200),
           st.text(min_size=1, max_size=10))
    def check_shift(t, prefix):
        base = set(dedup._cdc_boundaries(t))
        shifted = set(b - len(prefix)
                      for b in dedup._cdc_boundaries(prefix + t))
        # every boundary of t strictly beyond the resync window must
        # survive the prefix insertion (positions < W may differ: their
        # hash windows straddle the prefix)
        assert {b for b in base if b >= W} <= shifted | set(
            range(1, W))  # small-b noise never masks the tail
    check_shift()


def test_busdays_closed_form_hypothesis_fuzz():
    """Property fuzz: the closed-form weekday count f(d) (weekdays in
    [Monday-anchor, d]) equals a brute-force calendar walk for arbitrary
    dates, hence busdays(d1, d2] = f(d2) − f(d1) is exact."""
    import datetime as ddt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    anchor = ddt.date(1970, 1, 5)

    def closed(d):
        n = (d - anchor).days
        return (n // 7) * 5 + min(n % 7 + 1, 5)

    @settings(max_examples=80, deadline=None)
    @given(st.integers(min_value=0, max_value=30000))
    def check(n):
        d = anchor + ddt.timedelta(days=n)
        walk = sum(1 for k in range(n + 1)
                   if (anchor + ddt.timedelta(days=k)).weekday() < 5)
        assert closed(d) == walk

    check()
