"""Differential tests for the round-12 operators: the arithmetic is
replayed in pure Python on seeded random inputs and must agree with the
Spark output EXACTLY (int→double conversions are correctly rounded in
python and both engines, so float comparisons are equality, not
tolerance) — independent third implementations on adversarial shapes
the fixed testdata doesn't contain (tied gains, dangling Markov states,
single-op CDC keys, cyclic+tail digraphs)."""

from __future__ import annotations

import datetime as dt
import math
import random

from kafka_streams_in_action_spark.operators import (
    event_time, graph, relational, sampling, similarity, windows,
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
    acc: dict = {}
    for _, _, s, ty, v in rows:
        day = (TS0 + dt.timedelta(seconds=s)).date()
        acc.setdefault(ty, {}).setdefault(day, 0)
        acc[ty][day] += _milli(v)
    return {ty: sorted(d.items()) for ty, d in acc.items()}


def test_changepoint_matches_python_replay(spark):
    """Random multi-type series incl. a 2-day stub (one candidate k) and
    a constant series (all gains 0 → tie broken to k=1)."""
    rnd = random.Random(17)
    rows, eid = [], 0
    for ty, n_days in [("view", 40), ("click", 2), ("flat", 12)]:
        for d in range(n_days):
            v = 7.25 if ty == "flat" else rnd.uniform(-50.0, 50.0)
            rows.append((eid, 1, d * 86400 + rnd.randint(0, 3600), ty, v))
            eid += 1
    got = {r.event_type: r for r in windows.change_point(
        _events_df(spark, rows)).collect()}
    for ty, series in _day_series(rows).items():
        days = [d for d, _ in series]
        xs = [vm for _, vm in series]
        n, s_n = len(xs), sum(xs)
        best = None
        pref = 0
        for k in range(1, n):
            pref += xs[k - 1]
            num = n * pref - k * s_n
            gain = float(num * num) / float(k * (n - k))
            if best is None or gain > best[0]:
                best = (gain, k, pref)
        gain, k, s_k = best
        r = got[ty]
        assert r.split_k == k and r.gain == gain
        assert r.split_day == days[k]
        assert r.mean_left_milli == float(s_k) / float(k)
        assert r.mean_right_milli == float(s_n - s_k) / float(n - k)
        assert r.n_days == n
    assert got["flat"].split_k == 1 and got["flat"].gain == 0.0


def test_markov_matches_python_replay(spark):
    """Random chain over 4 states with one absorbing-ish rare state; a
    dangling state (appears only as a final event) exercises the
    uniform redistribution arm."""
    rnd = random.Random(23)
    rows, eid = [], 0
    for u in range(6):
        seq = [rnd.choice("ABC") for _ in range(rnd.randint(2, 30))]
        if u == 0:
            seq.append("D")          # D has no outgoing edge: dangling
        for i, ty in enumerate(seq):
            rows.append((eid, u, u * 10_000_000 + i * 60, ty, 1.0))
            eid += 1
    got = {r.event_type: r for r in event_time.markov_stationary(
        _events_df(spark, rows)).collect()}

    # python replay of the integer recurrence
    counts: dict = {}
    per_user: dict = {}
    for e, u, s, ty, _ in rows:
        per_user.setdefault(u, []).append((s, e, ty))
    for u, seq in per_user.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    out_n: dict = {}
    for (a, _), c in counts.items():
        out_n[a] = out_n.get(a, 0) + c
    ratio = {k: int(math.floor(c / out_n[k[0]] * 1e9 + 0.5))
             for k, c in counts.items()}
    states = sorted({ty for _, _, _, ty, _ in rows})
    ns = len(states)
    p = {st: 1_000_000 // ns for st in states}
    for _ in range(12):
        contrib = {st: 0 for st in states}
        for (a, b), r9 in ratio.items():
            contrib[b] += (p[a] * r9) // 1_000_000_000
        dang = sum(p[st] for st in states if st not in out_n)
        praw = {st: contrib[st] + dang // ns for st in states}
        tot = sum(praw.values())
        p = {st: (praw[st] * 1_000_000) // tot for st in states}
    for st in states:
        assert got[st].p_ppm == p[st], st
        assert got[st].out_n == out_n.get(st, 0)


def test_diversity_matches_python_replay(spark):
    """Random float32 embeddings incl. negative components and exact-tie
    quantization boundaries."""
    import numpy as np

    rnd = random.Random(5)
    vecs = [[rnd.uniform(-1, 1) for _ in range(8)] for _ in range(25)]
    vecs = [list(np.asarray(v, dtype=np.float32)) for v in vecs]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int")
    [r] = similarity.corpus_diversity(emb).collect()
    q = [[int(math.floor(float(np.float64(np.float32(x))) * 1e6 + 0.5))
          for x in v] for v in vecs]
    n, dim = len(q), len(q[0])
    sd = [sum(row[d] for row in q) for d in range(dim)]
    ssq = sum(x * x for row in q for x in row)
    sum_sd2 = sum(x * x for x in sd)
    assert r.n == n
    assert r.sum_sq_norm_micro2 == float(ssq)
    assert r.mean_sq_norm_micro2 == float(ssq) / float(n)
    assert r.mean_pair_dot_micro2 == \
        float(sum_sd2 - ssq) / float(n * (n - 1))


def test_coverage_matches_python_replay(spark):
    """Random interval sets per supplier: overlaps, duplicates, gaps."""
    rnd = random.Random(11)
    rows = []
    for sk in range(1, 8):
        for _ in range(rnd.randint(1, 20)):
            rows.append((sk, dt.date(2024, 1, 1)
                         + dt.timedelta(days=rnd.randint(0, 40))))
    li = spark.createDataFrame(rows, "l_suppkey long, l_shipdate date")
    got = {r.suppkey: r
           for r in event_time.interval_coverage(li).collect()}
    per: dict = {}
    for sk, d in rows:
        per.setdefault(sk, []).append(d)
    for sk, ds in per.items():
        days = set()
        for d in ds:
            for off in range(7):
                days.add(d + dt.timedelta(days=off))
        covered = len(days)
        span = ((max(ds) + dt.timedelta(days=7)) - min(ds)).days
        r = got[sk]
        assert r.covered_days == covered and r.span_days == span
        assert r.n_shipments == len(ds)
        assert r.utilization == float(covered) / float(span)


def test_cdc_matches_python_replay(spark):
    """Random op logs: delete-last keys vanish, single-op keys, multiple
    resurrections."""
    rnd = random.Random(31)
    rows, eid = [], 0
    for u in range(20):
        for i in range(rnd.randint(1, 15)):
            ty = rnd.choice(["signup", "view", "click", "error",
                             "purchase"])
            rows.append((eid, u, u * 1_000_000 + i * 60, ty,
                         rnd.uniform(0, 100)))
            eid += 1
    got = {r.user_id: r for r in relational.cdc_materialize(
        _events_df(spark, rows)).collect()}
    per: dict = {}
    for e, u, s, ty, v in rows:
        per.setdefault(u, []).append((s, e, ty, v))
    for u, ops in per.items():
        ops.sort()
        kinds = ["I" if t == "signup" else "D" if t == "error" else "U"
                 for _, _, t, _ in ops]
        if kinds[-1] == "D":
            assert u not in got
            continue
        r = got[u]
        assert r.last_op == kinds[-1]
        assert r.last_value_milli == _milli(ops[-1][3])
        assert r.n_ops == len(ops)
        assert r.n_deletes == kinds.count("D")
        assert r.resurrected == (kinds.count("D") > 0)
        ts_us = int((TS0 + dt.timedelta(seconds=ops[-1][0])
                     - dt.datetime(1970, 1, 1)).total_seconds()
                    * 1_000_000)
        assert r.last_ts_us == ts_us


def test_blur_matches_formula_replay(spark):
    """The kernel decodes REAL BMP bytes; this replay computes the same
    Laplacian sums straight from the fixture pixel formula (the oracle's
    argument, in python)."""
    from kafka_streams_in_action_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(d, "x" * (20 + d), "en", "s", 20 + d) for d in range(12)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r.doc_id: r for r in multimodal.blur_scores(
        multimodal.to_bmp_media(docs)).collect()}
    for d in range(12):
        nb = 20 + d
        w, h = (nb % 29) + 4, (d % 13) + 3
        g = [[sum((d * 31 + ((r * w + c) * 3 + k) * 7) % 256
                  for k in range(3))
              for c in range(w)] for r in range(h)]
        lap, n = [], 0
        for r in range(1, h - 1):
            for c in range(1, w - 1):
                lap.append(4 * g[r][c] - g[r - 1][c] - g[r + 1][c]
                           - g[r][c - 1] - g[r][c + 1])
        s, ss, n = sum(lap), sum(x * x for x in lap), len(lap)
        row = got[d]
        assert (row.width, row.height, row.n_interior) == (w, h, n)
        assert (row.lap_sum, row.lap_sq_sum) == (s, ss)
        assert row.blur_var == float(n * ss - s * s) / float(n * n)


def test_scc_matches_python_replay(spark):
    """Random sparsified digraph: cycles, tails, disconnected nodes —
    labels must equal the python closure's."""
    rnd = random.Random(47)
    n = 18
    nation = spark.createDataFrame(
        [(i, f"N{i}", 0, "") for i in range(n)],
        "n_nationkey long, n_name string, n_regionkey long, "
        "n_comment string")
    raw = {}
    for _ in range(60):
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            raw[(a, b)] = rnd.randint(1, 9)
    edges = spark.createDataFrame(
        [(a, b, w) for (a, b), w in raw.items()],
        "src long, dst long, w long")
    got = {r.nationkey: (r.scc_label, r.scc_size)
           for r in graph.scc_trade(None, None, None, None, nation,
                                    edges=edges).collect()}
    # python: top-3 sparsify (w desc, dst asc), closure, mutual, min
    out: dict = {}
    for (a, b), w in raw.items():
        out.setdefault(a, []).append((-w, b))
    adj = {a: [b for _, b in sorted(nbrs)[:3]]
           for a, nbrs in out.items()}
    reach = {u: {u} for u in range(n)}
    for u in range(n):
        frontier = {u}
        while frontier:
            nxt = {v for f in frontier for v in adj.get(f, [])} \
                - reach[u]
            reach[u] |= nxt
            frontier = nxt
    label = {u: min(v for v in reach[u] if u in reach[v])
             for u in range(n)}
    size: dict = {}
    for u in range(n):
        size[label[u]] = size.get(label[u], 0) + 1
    assert got == {u: (label[u], size[label[u]]) for u in range(n)}


def test_seasonal_strength_matches_python_replay(spark):
    """Random daily series per type — the replay reproduces the exact
    quantize-before-sum variance ratio, including the NULL arm for a
    zero-variance detrended series."""
    rnd = random.Random(29)
    rows, eid = [], 0
    series = {"view": [rnd.uniform(0, 200) for _ in range(30)],
              "flat": [5.0] * 20,
              "short": [1.0, 2.0, 3.0]}  # < 7 days: no interior rows
    for ty, vals in series.items():
        for d, v in enumerate(vals):
            rows.append((eid, 1, d * 86400, ty, v))
            eid += 1
    got = {r.event_type: r for r in windows.seasonal_strength(
        _events_df(spark, rows)).collect()}
    assert "short" not in got  # no full 7-day frame exists
    for ty in ("view", "flat"):
        xs = [_milli(v) for v in series[ty]]
        n_days = len(xs)
        interior = []
        for i in range(3, n_days - 3):
            sum7 = sum(xs[i - 3:i + 4])
            interior.append((i % 7, 7 * xs[i] - sum7))
        by_dow: dict = {}
        for dow, d7 in interior:
            by_dow.setdefault(dow, []).append(d7)
        qr, qd = [], []
        for dow, d7 in interior:
            sdetr7 = sum(by_dow[dow])
            n_dow = len(by_dow[dow])
            res = float(n_dow * d7 - sdetr7) / (7.0 * float(n_dow))
            qr.append(int(math.floor(res * 1e6 + 0.5)))
            qd.append(int(math.floor(float(d7) / 7.0 * 1e6 + 0.5)))
        n = len(qr)
        num_r = n * sum(x * x for x in qr) - sum(qr) ** 2
        num_d = n * sum(x * x for x in qd) - sum(qd) ** 2
        r = got[ty]
        assert r.n == n
        assert r.var_resid_num == float(num_r)
        assert r.var_detr_num == float(num_d)
        if num_d > 0:
            assert r.strength == max(0.0,
                                     1.0 - float(num_r) / float(num_d))
        else:
            assert r.strength is None
    assert got["flat"].strength is None  # constant series: no variance


def test_padwaste_matches_python_replay(spark):
    """Random token lengths spanning all buckets incl. the 512 cap."""
    rnd = random.Random(37)
    lens = [rnd.randint(1, 700) for _ in range(300)]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * ln), "en", "s", ln)
         for i, ln in enumerate(lens)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r.bucket_len: r for r in sampling.pad_waste_audit(
        docs).collect()}
    per: dict = {}
    for ln in lens:
        t = min(ln, 512)
        trunc = max(ln - 512, 0)
        b = max(((t + 63) // 64) * 64, 64)
        n, st, tr = per.get(b, (0, 0, 0))
        per[b] = (n + 1, st + t, tr + trunc)
    assert set(got) == set(per)
    for b, (n, st, tr) in per.items():
        r = got[b]
        assert (r.n_docs, r.sum_tokens, r.truncated_tokens) == (n, st, tr)
        assert r.padded_tokens == b * n
        assert r.waste_frac == float(b * n - st) / float(b * n)
