"""Differential tests for the round-11 operators: the arithmetic is
replayed in pure Python on seeded random inputs and must agree with the
Spark output EXACTLY (float comparisons replicate the engines' exact
two-step: correctly-rounded int→double conversions, then IEEE ops) —
the same proofs the DuckDB oracles assert, but against an independent
third implementation and on adversarial shapes the fixed testdata
doesn't contain (tied days, zero-variance series, sign-boundary
embedding components, single-day users)."""

from __future__ import annotations

import datetime as dt
import math
import random

from kafka_streams_in_action_spark.operators import (
    event_time, relational, sampling, scalars, similarity, windows,
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


def _day_series(rows):
    """Replay the per-(type, day) milli rollup in python."""
    acc: dict = {}
    for _, _, s, ty, v in rows:
        day = (TS0 + dt.timedelta(seconds=s)).date()
        acc.setdefault(ty, {}).setdefault(day, 0)
        acc[ty][day] += _milli(v)
    return {ty: [vm for _, vm in sorted(d.items())]
            for ty, d in acc.items()}


def test_acf_matches_python_replay(spark):
    rnd = random.Random(41)
    rows, eid = [], 0
    for ty, n_days in [("view", 35), ("click", 9), ("buy", 2)]:
        for d in range(n_days):
            for _ in range(rnd.randint(1, 2)):
                rows.append((eid, 1, d * 86400 + rnd.randint(0, 2000),
                             ty, rnd.uniform(-5.0, 5.0)))
                eid += 1
    got = {(r.event_type, r.lag): r
           for r in windows.acf_daily(_events_df(spark, rows)).collect()}
    series = _day_series(rows)
    expected_keys = set()
    for ty, xs in series.items():
        n, s = len(xs), sum(xs)
        c = [n * x - s for x in xs]
        den = sum(v * v for v in c)
        for k in (1, 2, 7):
            pairs = [(c[i], c[i + k]) for i in range(n - k)]
            if den == 0 or not pairs:
                continue
            num = sum(a * b for a, b in pairs)
            expected_keys.add((ty, k))
            r = got[(ty, k)]
            assert r.n_days == n and r.n_pairs == len(pairs)
            assert r.acf == float(num) / float(den), (ty, k)
    assert set(got) == expected_keys


def test_corr_matches_python_replay(spark):
    rnd = random.Random(7)
    rows = [(1, i, 2, 1, rnd.uniform(1, 50),
             rnd.uniform(900, 100_000), rnd.uniform(0, 0.1),
             rnd.uniform(0, 0.08), "N", "O", dt.datetime(2024, 1, 1))
            for i in range(300)]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    got = {(r.col_x, r.col_y): r.corr
           for r in relational.corr_matrix(li).collect()}
    cols = {"qty": [_milli(r[4]) for r in rows],
            "price": [_milli(r[5]) for r in rows],
            "disc": [_milli(r[6]) for r in rows],
            "tax": [_milli(r[7]) for r in rows]}
    names = list(cols)
    n = len(rows)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            xs, ys = cols[a], cols[b]
            num = n * sum(x * y for x, y in zip(xs, ys)) \
                - sum(xs) * sum(ys)
            dx = n * sum(x * x for x in xs) - sum(xs) ** 2
            dy = n * sum(y * y for y in ys) - sum(ys) ** 2
            expect = float(num) / (math.sqrt(float(dx))
                                   * math.sqrt(float(dy)))
            assert got[(a, b)] == expect, (a, b)


def test_hamming_matches_python_replay(spark):
    rnd = random.Random(99)
    vecs = {}
    for vid in range(40):
        # exact zeros hit the strict `> 0` sign boundary
        vecs[vid] = [rnd.choice([0.0, rnd.uniform(-1, 1)])
                     for _ in range(64)]
    emb = spark.createDataFrame(
        [(vid, v, 0) for vid, v in vecs.items()],
        "vec_id long, embedding array<float>, label int")
    got = {}
    for r in similarity.hamming_topk(emb).collect():
        got.setdefault(r.query_id, []).append(
            (r.rn, r.neighbor_id, r.hamming))

    def sig(v):
        hi = lo = 0
        for i in range(32):
            hi = hi * 2 + (1 if v[i] > 0 else 0)
            lo = lo * 2 + (1 if v[i + 32] > 0 else 0)
        return hi, lo

    sigs = {vid: sig(v) for vid, v in vecs.items()}
    for q in range(10):
        dists = sorted(
            ((bin(sigs[q][0] ^ s[0]).count("1")
              + bin(sigs[q][1] ^ s[1]).count("1"), vid)
             for vid, s in sigs.items() if vid != q))
        expect = [(rn + 1, vid, d)
                  for rn, (d, vid) in enumerate(dists[:5])]
        assert sorted(got[q]) == expect, q


def test_m4_matches_python_replay(spark):
    rnd = random.Random(5)
    rows, eid = [], 0
    for ty, n_days in [("view", 41), ("click", 8)]:
        for d in range(n_days):
            if rnd.random() < 0.2:
                continue  # calendar gaps
            rows.append((eid, 1, d * 86400, ty, rnd.uniform(-9, 9)))
            eid += 1
    got = {(r.event_type, r.bucket): r
           for r in scalars.m4_downsample(
               _events_df(spark, rows)).collect()}
    acc: dict = {}
    for _, _, s, ty, v in rows:
        day = (TS0 + dt.timedelta(seconds=s)).date()
        acc.setdefault(ty, {}).setdefault(day, 0)
        acc[ty][day] += _milli(v)
    expected_keys = set()
    for ty, dd in acc.items():
        days = sorted(dd)
        d0, d1 = days[0], days[-1]
        span = (d1 - d0).days
        buckets: dict = {}
        for day in days:
            b = ((day - d0).days * 8) // (span + 1)
            buckets.setdefault(b, []).append((day, dd[day]))
        for b, items in buckets.items():
            expected_keys.add((ty, b))
            r = got[(ty, b)]
            vals = [v for _, v in items]
            assert r.n_days == len(items)
            assert (r.d_start, r.d_end) == (items[0][0], items[-1][0])
            assert (r.v_first, r.v_last) == (items[0][1], items[-1][1])
            assert (r.v_min, r.v_max) == (min(vals), max(vals))
    assert set(got) == expected_keys


def test_l28_matches_python_replay(spark):
    rnd = random.Random(17)
    rows, eid = [], 0
    for uid in range(30):
        for _ in range(rnd.randint(1, 40)):
            d = rnd.randint(0, 45)
            rows.append((eid, uid, d * 86400 + rnd.randint(0, 80000),
                         "view", 1.0))
            eid += 1
    got = {r.bucket: r.n_users
           for r in event_time.l28_histogram(
               _events_df(spark, rows)).collect()}
    days = {}
    d_end = max((TS0 + dt.timedelta(seconds=s)).date()
                for _, _, s, _, _ in rows)
    for _, uid, s, _, _ in rows:
        day = (TS0 + dt.timedelta(seconds=s)).date()
        if (d_end - day).days < 28:
            days.setdefault(uid, set()).add(day)
    expect: dict = {}
    for uid, ds in days.items():
        b = (len(ds) - 1) // 7
        expect[b] = expect.get(b, 0) + 1
    assert got == expect


def test_temperature_invariants_random_strata(spark):
    """Hamilton invariants on random strata: the allocation always sums
    to the budget, respects weight order, and never deviates from the
    exact quota by ≥1 seat (the largest-remainder guarantee)."""
    docs = spark.createDataFrame(
        [(i, "t", lang, "s", 1) for i, lang in enumerate(
            ["a"] * 977 + ["b"] * 13 + ["c"] * 313)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    budget = 10_007
    out = sampling.temperature_mix(docs, budget=budget).collect()
    assert sum(r.alloc for r in out) == budget
    by = {r.lang: r for r in out}
    assert by["a"].weight_micro > by["c"].weight_micro > \
        by["b"].weight_micro
    w_total = sum(r.weight_micro for r in out)
    for r in out:
        quota = budget * r.weight_micro / w_total
        assert quota - 1 < r.alloc < quota + 1
