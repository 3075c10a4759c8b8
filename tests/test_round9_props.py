"""Differential tests for the round-9 operators: each one's arithmetic
is replayed in pure Python on seeded random inputs and must agree with
the Spark output EXACTLY — the same proofs the DuckDB oracles assert,
but against an independent third implementation and on adversarial
shapes the fixed testdata doesn't contain (ties, cascade chains,
degenerate strata)."""

from __future__ import annotations

import datetime as dt
import random

from kafka_streams_in_action_spark.operators import (
    event_time, graph, sampling, windows,
)

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)

_TYPES = ["purchase", "signup", "view", "click", "error"]
_INFLOW = {"purchase", "signup", "view"}


def _events_df(spark, rows):
    """rows = [(event_id, user_id, seconds_offset, event_type, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(seconds=s), u, t, v, "{}")
         for e, u, s, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def test_drawdown_matches_python_replay(spark):
    """Random signed-flow series per user: cumulative, running peak,
    and max drawdown replayed exactly in pure integers."""
    rnd = random.Random(11)
    rows = []
    eid = 0
    for u in range(6):
        t = 0
        for _ in range(rnd.randint(1, 40)):
            t += rnd.randint(0, 4)  # duplicate timestamps allowed
            rows.append((eid, u, t, rnd.choice(_TYPES),
                         rnd.uniform(0.001, 99.0)))
            eid += 1
    got = {r["user_id"]: r for r in windows.equity_drawdown(
        _events_df(spark, rows)).collect()}

    series = {}
    for e, u, s, ty, v in sorted(rows, key=lambda r: (r[2], r[0])):
        m = int((v * 1000.0 + 0.5) // 1)
        series.setdefault(u, []).append(m if ty in _INFLOW else -m)
    for u, flows in series.items():
        cum = peak = None
        maxdd = 0
        total = 0
        for f in flows:
            cum = f if cum is None else cum + f
            peak = cum if peak is None else max(peak, cum)
            maxdd = max(maxdd, peak - cum)
            total += f
        r = got[u]
        assert (r["n_events"], r["final_milli"], r["peak_milli"],
                r["max_dd_milli"]) == (len(flows), total, peak, maxdd)


def test_kcore_matches_python_peel(spark):
    """Random co-purchase baskets: the fixed-round Spark peel equals an
    until-stable pure-Python peel (12 rounds always suffice at this
    size, and the early exit must not change the fixed point)."""
    rnd = random.Random(23)
    rows = []
    o = 0
    for _ in range(60):
        basket = rnd.sample(range(1, 25), rnd.randint(2, 4))
        for rep in range(rnd.randint(1, 3)):
            for p in basket:
                rows.append((o, p))
            o += 1
    li = spark.createDataFrame(
        [(ok, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", TS0)
         for ok, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    got = {r["partkey"]: r["core_degree"]
           for r in graph.copurchase_kcore(li).collect()}

    per_order = {}
    for ok, p in rows:
        per_order.setdefault(ok, set()).add(p)
    support = {}
    for parts in per_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] = support.get(
                    (ps[i], ps[j]), 0) + 1
    edges = {e for e, w in support.items() if w >= 2}
    nodes = {n for e in edges for n in e}
    while True:
        deg = {n: 0 for n in nodes}
        for a, b in edges:
            if a in nodes and b in nodes:
                deg[a] += 1
                deg[b] += 1
        drop = {n for n in nodes if deg[n] < 2}
        if not drop:
            break
        nodes -= drop
    want = {}
    for a, b in edges:
        if a in nodes and b in nodes:
            want[a] = want.get(a, 0) + 1
            want[b] = want.get(b, 0) + 1
    assert got == want


def test_quota_matches_python_apportionment(spark):
    """Random strata sizes and budgets: base + largest-remainder seats
    replayed exactly, including the degenerate single-stratum and
    all-equal-remainder shapes."""
    rnd = random.Random(5)
    for budget in (1, 7, 100):
        sizes = {f"s{i}": rnd.randint(1, 40)
                 for i in range(rnd.randint(1, 6))}
        rows = []
        did = 0
        for s, n in sizes.items():
            for _ in range(n):
                rows.append((did, f"text {did}", "en", s, 5))
                did += 1
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
        got = {r["source"]: r for r in sampling.quota_sample(
            docs, budget=budget).collect()}

        total = sum(sizes.values())
        base = {s: budget * n // total for s, n in sizes.items()}
        rem = {s: budget * n % total for s, n in sizes.items()}
        left = budget - sum(base.values())
        extras = sorted(sizes, key=lambda s: (-rem[s], s))[:left]
        for s, n in sizes.items():
            alloc = base[s] + (1 if s in extras else 0)
            r = got[s]
            assert (r["n_docs"], r["base_alloc"], r["alloc"]) \
                == (n, base[s], alloc)
            assert r["n_selected"] == min(alloc, n)
        assert sum(r["alloc"] for r in got.values()) == budget


def test_growth_accounting_matches_python_replay(spark):
    """Random sparse weekly activity: the four flows replayed from
    first principles, including corpus-end capping of dormancy."""
    rnd = random.Random(17)
    rows = []
    eid = 0
    active = {}
    for u in range(8):
        weeks = sorted(rnd.sample(range(0, 8), rnd.randint(1, 5)))
        for w in weeks:
            rows.append((eid, u, w * 7 * 86400 + rnd.randint(0, 86399),
                         "view", 1.0))
            eid += 1
            active.setdefault(u, set()).add(w)
    got = {}
    base_week = (dt.date(2024, 1, 1) - dt.date(1995, 1, 1)).days // 7
    for r in event_time.growth_accounting(
            _events_df(spark, rows)).collect():
        got[r["week"] - base_week] = (
            r["n_new"], r["n_retained"], r["n_resurrected"],
            r["n_dormant"])

    max_week = max(w for ws in active.values() for w in ws)
    want = {}
    for u, ws in active.items():
        first = min(ws)
        for w in ws:
            key = want.setdefault(w, [0, 0, 0, 0])
            if w == first:
                key[0] += 1
            elif w - 1 in ws:
                key[1] += 1
            else:
                key[2] += 1
            if w < max_week and (w + 1) not in ws:
                want.setdefault(w + 1, [0, 0, 0, 0])
                want[w + 1][3] += 1
    # only weeks with active users are reported
    want = {w: tuple(v) for w, v in want.items()
            if v[0] + v[1] + v[2] > 0}
    assert got == want


def test_lttb_matches_python_replay(spark):
    """Random 30-point series per type: the Spark kernel's selections
    equal a pure-Python LTTB replay exactly (integer areas, smaller-x
    tie-break, even-rank bucketing)."""
    rnd = random.Random(31)
    rows = []
    eid = 0
    series = {}
    for t in ("a", "b"):
        ys = []
        for d in range(30):
            v = rnd.uniform(0.001, 400.0)
            rows.append((eid, 1, d * 86400, t, v))
            ys.append(int((v * 1000.0 + 0.5) // 1))
            eid += 1
        series[t] = ys
    got = {}
    for r in event_time.lttb_downsample(_events_df_typed(spark, rows)) \
            .collect():
        got.setdefault(r["event_type"], []).append(
            (r["sel_order"], r["x_day"], r["y_milli"]))

    base = (dt.date(2024, 1, 1) - dt.date(1995, 1, 1)).days
    k, nb = 10, 8
    for t, ys in series.items():
        xs = [base + d for d in range(30)]
        n = 30
        buckets = [[] for _ in range(nb)]
        for j in range(1, n - 1):
            buckets[(j - 1) * nb // (n - 2)].append(j)
        sel = [0]
        for b in range(nb):
            if b < nb - 1:
                nxt = buckets[b + 1]
                mm, sx, sy = (len(nxt), sum(xs[j] for j in nxt),
                              sum(ys[j] for j in nxt))
            else:
                mm, sx, sy = 1, xs[-1], ys[-1]
            xa, ya = xs[sel[-1]], ys[sel[-1]]
            best, best_area = None, -1
            for j in buckets[b]:
                area = abs((xa * mm - sx) * (ys[j] - ya)
                           - (xa - xs[j]) * (sy - mm * ya))
                if area > best_area:
                    best, best_area = j, area
            sel.append(best)
        sel.append(n - 1)
        want = [(i + 1, xs[j], ys[j]) for i, j in enumerate(sel)]
        assert sorted(got[t]) == sorted(want), t


def _events_df_typed(spark, rows):
    """rows = [(event_id, user_id, seconds_offset, event_type, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(seconds=s), u, t, v, "{}")
         for e, u, s, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
