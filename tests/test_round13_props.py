"""Differential tests for the round-13 operators: the arithmetic is
replayed in pure Python on seeded random inputs and must agree with the
Spark output EXACTLY (python ints are exact, int→double divisions are
correctly rounded in python and both engines, so float comparisons are
equality, not tolerance) — independent third implementations on
adversarial shapes the fixed testdata doesn't contain (gap days in the
burst window, tied interval starts, zero day-over-day deltas, lossy
float32 embeddings, multi-component digraphs)."""

from __future__ import annotations

import datetime as dt
import math
import random

from kafka_streams_in_action_spark.operators import (
    event_time, features, graph, joins, multimodal, similarity, windows,
)

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)
EPOCH = dt.date(1970, 1, 1)


def _events_df(spark, rows):
    """rows = [(event_id, user_id, seconds_offset, event_type, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(seconds=s), u, t, v, "{}")
         for e, u, s, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def test_bursts_match_python_replay(spark):
    """Random per-day activity WITH missing calendar days — a day is
    eligible only when all 7 trailing calendar days are OBSERVED (any
    missing trailing day makes it ineligible; the replay's
    len(trail) != 7 skip is exactly the operator's gate)."""
    rnd = random.Random(13)
    rows, eid = [], 0
    daily: dict = {}
    for ty in ("view", "click"):
        d = 0
        while d < 45:
            if rnd.random() < 0.8:  # ~20% of days fully missing
                n = rnd.randint(1, 40)
                daily.setdefault(ty, {})[d] = n
                for j in range(n):
                    rows.append((eid, 1, d * 86400 + j, ty, 1.0))
                    eid += 1
            d += 1
    got = {r.event_type: r for r in
           event_time.burst_detect(_events_df(spark, rows)).collect()}
    for ty, cnts in daily.items():
        n_days = len(cnts)
        n_elig = n_burst = 0
        max_ratio, first_b, last_b = None, None, None
        for d, c in sorted(cnts.items()):
            trail = [cnts[d - i] for i in range(1, 8) if d - i in cnts]
            if len(trail) != 7:
                continue
            n_elig += 1
            ts_ = sum(trail)
            ratio = c * 7 * 1000 // ts_
            max_ratio = ratio if max_ratio is None else max(max_ratio,
                                                            ratio)
            if c * 7 * 1000 > 1100 * ts_:
                n_burst += 1
                day = (TS0 + dt.timedelta(days=d)).date()
                first_b = day if first_b is None else first_b
                last_b = day
        r = got[ty]
        assert (r.n_days, r.n_eligible_days, r.n_burst_days) == \
            (n_days, n_elig, n_burst)
        assert r.max_ratio_milli == max_ratio
        assert r.first_burst_day == first_b and r.last_burst_day == last_b


def test_runs_test_matches_python_replay(spark):
    """Random daily values with deliberate repeats (zero deltas must
    drop, not count as a sign)."""
    rnd = random.Random(29)
    rows, eid = [], 0
    vals: dict = {}
    for ty in ("a", "b"):
        for d in range(30):
            v = rnd.choice([1.25, 2.5, 2.5, 3.75, 0.5])
            vals.setdefault(ty, []).append(v)
            rows.append((eid, 1, d * 86400, ty, v))
            eid += 1
    got = {r.event_type: r for r in
           windows.runs_test(_events_df(spark, rows)).collect()}
    for ty, vs in vals.items():
        micro = [int(math.floor(v * 1000000.0 + 0.5)) for v in vs]
        signs = []
        for i in range(1, len(micro)):
            d = micro[i] - micro[i - 1]
            if d:
                signs.append(1 if d > 0 else -1)
        n1 = signs.count(1)
        n2 = signs.count(-1)
        runs = 1 + sum(1 for i in range(1, len(signs))
                       if signs[i] != signs[i - 1]) if signs else 0
        r = got[ty]
        assert (r.n_up, r.n_down, r.runs) == (n1, n2, runs)
        n = n1 + n2
        exp = 1.0 + (2 * n1 * n2) / n
        assert r.expected_runs == exp
        var_num = 2 * n1 * n2 * (2 * n1 * n2 - n)
        if n1 > 0 and n2 > 0 and n > 1 and var_num > 0:
            var = var_num / (n * n * (n - 1))
            assert r.runs_z == (runs - exp) / math.sqrt(var)
        else:
            assert r.runs_z is None


def test_sla_matches_python_replay(spark):
    rnd = random.Random(41)
    rows, eid = [], 0
    times: dict = {}
    for ty in ("x", "y"):
        t = 0
        for _ in range(60):
            t += rnd.randint(1, 9000)  # gaps up to 2.5h
            times.setdefault(ty, []).append(t)
            rows.append((eid, 1, t, ty, 1.0))
            eid += 1
    got = {r.event_type: r for r in
           event_time.sla_report(_events_df(spark, rows)).collect()}
    thr = 3600 * 1_000_000
    for ty, ts_ in times.items():
        us = sorted(t * 1_000_000 for t in ts_)
        gaps = [b - a for a, b in zip(us, us[1:])]
        down = sum(g - thr for g in gaps if g > thr)
        span = us[-1] - us[0]
        r = got[ty]
        assert r.n_gaps == len(gaps)
        assert r.n_gaps_over == sum(1 for g in gaps if g > thr)
        assert r.max_gap_us == max(gaps)
        assert r.downtime_us == down
        assert r.span_us == span
        assert r.availability_ppm == (span - down) * 1_000_000 // span


def test_allen_census_matches_python_replay(spark):
    """Random intervals incl. forced shared-start pairs (the
    starts/started_by/equals arms)."""
    rnd = random.Random(7)
    orders = []
    ivs: dict = {}
    ok = 0
    for cust in range(1, 25):
        n = rnd.randint(2, 6)
        days = sorted(rnd.randint(0, 120) for _ in range(n))
        if rnd.random() < 0.5:  # force a tied start
            days[1] = days[0]
        for d in days:
            ok += 1
            orders.append((ok, cust, "O", 1.0,
                           dt.datetime(2020, 1, 1) + dt.timedelta(days=d),
                           "p"))
            dur = ok % 400 + 30
            ivs.setdefault(cust, []).append((d, d + dur, ok))
    df = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, "
                "o_orderpriority string")
    got = {r.relation: r for r in joins.allen_census(df).collect()}

    def classify(a, b):
        (a_s, a_e, _), (b_s, b_e, _) = a, b
        if a_s == b_s and a_e == b_e:
            return "equals"
        if a_s == b_s and a_e < b_e:
            return "starts"
        if a_s == b_s:
            return "started_by"
        if a_e < b_s:
            return "precedes"
        if a_e == b_s:
            return "meets"
        if b_s < a_e < b_e:
            return "overlaps"
        if a_e == b_e:
            return "finished_by"
        return "contains"

    census: dict = {}
    for cust, lst in ivs.items():
        lst = sorted(lst, key=lambda t: (t[0], t[2]))
        for a, b in zip(lst, lst[1:]):
            rel = classify(a, b)
            gap = b[0] - a[1]
            cnt, lo, hi = census.get(rel, (0, None, None))
            census[rel] = (cnt + 1,
                           gap if lo is None else min(lo, gap),
                           gap if hi is None else max(hi, gap))
    total = sum(c for c, _, _ in census.values())
    assert set(got) == set(census)
    for rel, (cnt, lo, hi) in census.items():
        r = got[rel]
        assert (r.n_pairs, r.min_gap_days, r.max_gap_days) == (cnt, lo, hi)
        assert r.share_ppm == cnt * 1_000_000 // total


def test_target_encode_matches_python_replay(spark):
    rnd = random.Random(3)
    cust = spark.createDataFrame(
        [(i, f"c{i}", 1, 0.0, ["A", "B", "C"][i % 3]) for i in range(30)],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    orows = [(i, rnd.randint(0, 29), "O", rnd.uniform(1.0, 99999.99),
              TS0, "p") for i in range(400)]
    orders = spark.createDataFrame(
        orows, "o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp, "
               "o_orderpriority string")
    got = {r.segment: r for r in
           features.target_encode(orders, cust, m=100).collect()}
    sums: dict = {}
    for _, ck, _, p, _, _ in orows:
        seg = ["A", "B", "C"][ck % 3]
        c = int(math.floor(p * 100 + 0.5))
        n, s = sums.get(seg, (0, 0))
        sums[seg] = (n + 1, s + c)
    gn = sum(n for n, _ in sums.values())
    gs = sum(s for _, s in sums.values())
    for seg, (n, s) in sums.items():
        r = got[seg]
        assert r.n_orders == n
        assert r.sum_cents == float(s)
        assert r.raw_mean_cents == s / n
        assert r.encoded_mean_cents == (s * gn + 100 * gs) / (gn * (n + 100))
        assert r.shrinkage_ppm == 100 * 1_000_000 // (n + 100)


def test_feature_hash_matches_python_replay(spark):
    rnd = random.Random(11)
    vocab = ["tok%03d" % i for i in range(120)]
    texts = [" ".join(rnd.choice(vocab)
                      for _ in range(rnd.randint(3, 40)))
             for _ in range(50)]
    docs = spark.createDataFrame(
        [(i, t, "en", "w", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r.bucket: r for r in
           features.feature_hash_census(docs).collect()}

    def fnv(s: str) -> int:
        h = 2166136261
        for b in s.encode():
            h = ((h ^ b) * 16777619) % 2**32
        return h

    buckets: dict = {}
    for t in texts:
        for w in t.split():
            b = fnv(w) % 64
            cnt, words = buckets.get(b, (0, set()))
            words.add(w)
            buckets[b] = (cnt + 1, words)
    total = sum(c for c, _ in buckets.values())
    assert set(got) == set(buckets)
    for b, (cnt, words) in buckets.items():
        assert got[b].n_tokens == cnt
        assert got[b].n_distinct_words == len(words)
        assert got[b].load_ppm == cnt * 1_000_000 // total


def test_centroid_shift_matches_python_replay(spark):
    """float32 ingestion is lossy — the replay must quantize the
    float32-rounded value, exactly like both engines do."""
    import numpy as np

    rnd = random.Random(23)
    dims, labels = 4, ["p", "q", "r"]
    vecs = [(i, [rnd.uniform(-1, 1) for _ in range(dims)],
             labels[i % 3]) for i in range(30)]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label string")
    got = {r.label: r for r in similarity.centroid_shift(emb).collect()}
    q: dict = {}
    for _, v, lab in vecs:
        qs = [int(math.floor(float(np.float32(x)) * 1000000.0 + 0.5))
              for x in v]
        n, s = q.get(lab, (0, [0] * dims))
        q[lab] = (n + 1, [a + b for a, b in zip(s, qs)])
    n_g = sum(n for n, _ in q.values())
    s_g = [sum(q[lab][1][d] for lab in q) for d in range(dims)]
    for lab, (n_l, s_l) in q.items():
        num = sum((s_l[d] * n_g - s_g[d] * n_l) ** 2 for d in range(dims))
        den = (n_l * n_g) ** 2
        r = got[lab]
        assert r.n_vecs == n_l
        assert r.share_ppm == n_l * 1_000_000 // n_g
        assert r.shift_micro2 == num / den


def test_eccentricity_matches_python_replay(spark):
    """Random multi-component digraph — unreachable pairs excluded,
    top-3-by-weight sparsification applied first."""
    rnd = random.Random(5)
    n = 9
    nation = spark.createDataFrame(
        [(i, f"N{i}", 0) for i in range(n)],
        "n_nationkey long, n_name string, n_regionkey long")
    raw = {}
    for s in range(n):
        for d in rnd.sample([x for x in range(n) if x != s],
                            rnd.randint(0, 5)):
            raw[(s, d)] = rnd.randint(1, 50)
    edges = spark.createDataFrame(
        [(s, d, w) for (s, d), w in raw.items()],
        "src long, dst long, w long")
    got = {r.nationkey: r for r in graph.eccentricity_trade(
        None, None, None, None, nation, edges=edges).collect()}

    adj: dict = {}
    for s in range(n):
        outs = sorted(((w, d) for (ss, d), w in raw.items() if ss == s),
                      key=lambda t: (-t[0], t[1]))[:3]
        adj[s] = [d for _, d in outs]
    eccs, reach_n = {}, {}
    for s in range(n):
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        eccs[s] = max(dist.values())
        reach_n[s] = len(dist)
    dia, rad = max(eccs.values()), min(eccs.values())
    for s in range(n):
        r = got[s]
        assert (r.ecc, r.n_reachable) == (eccs[s], reach_n[s])
        assert (r.diameter, r.radius) == (dia, rad)
        assert r.is_peripheral == (eccs[s] == dia)
        assert r.is_central == (eccs[s] == rad)


def test_dominant_color_matches_formula_replay(spark):
    """The kernel decodes REAL BMP bytes; the replay recomputes the
    histogram from the fixture pixel formula alone."""
    docs = spark.createDataFrame(
        [(i, "x" * (7 + 13 * i), "en", "w", 0) for i in range(12)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r.doc_id: r for r in multimodal.dominant_colors(
        multimodal.to_bmp_media(docs)).collect()}
    for i in range(12):
        nb = 7 + 13 * i
        w, h = (nb % 29) + 4, (i % 13) + 3
        hist = [0] * 64
        for p in range(w * h):
            b = (i * 31 + (3 * p + 0) * 7) % 256
            g = (i * 31 + (3 * p + 1) * 7) % 256
            rr = (i * 31 + (3 * p + 2) * 7) % 256
            hist[(b // 64) * 16 + (g // 64) * 4 + (rr // 64)] += 1
        dom = hist.index(max(hist))
        r = got[i]
        assert (r.width, r.height) == (w, h)
        assert (r.dom_code, r.dom_count, r.n_pixels) == \
            (dom, hist[dom], w * h)
        assert r.dom_share == hist[dom] / (w * h)


def test_jsd_matches_python_replay(spark):
    """Random two-type series with different value mixes per half —
    replay the banded JSD term-by-term with the same IEEE tree."""
    from kafka_streams_in_action_spark.operators import relational

    rnd = random.Random(19)
    rows, eid = [], 0
    for ty in ("m", "n"):
        for d in range(20):
            for _ in range(rnd.randint(1, 6)):
                hi = 300.0 if (ty == "m" and d >= 10) else 150.0
                rows.append((eid, 1, d * 86400 + rnd.randint(0, 3600),
                             ty, rnd.uniform(0.0, hi)))
                eid += 1
    got = {r.event_type: r for r in
           relational.jsd_drift(_events_df(spark, rows)).collect()}
    by_ty: dict = {}
    for e, u, s, ty, v in rows:
        by_ty.setdefault(ty, []).append((s, v))
    for ty, evs in by_ty.items():
        us = [s * 1_000_000 for s, _ in evs]
        mid = math.floor((min(us) + max(us)) / 2)
        bands: dict = {}
        for (s, v) in evs:
            first = s * 1_000_000 < mid
            band = math.floor(v / 50)
            a, b = bands.get(band, (0, 0))
            bands[band] = (a + (1 if first else 0), b + (0 if first else 1))
        ta = sum(a for a, _ in bands.values())
        tb = sum(b for _, b in bands.values())
        sm = 0
        for a, b in bands.values():
            p, q = a / ta, b / tb
            m = (p + q) / 2
            if a > 0:
                sm += math.floor(p * math.log2(p / m) * 1000000.0 + 0.5)
            if b > 0:
                sm += math.floor(q * math.log2(q / m) * 1000000.0 + 0.5)
        r = got[ty]
        assert (r.n_first, r.n_second, r.n_bands) == (ta, tb, len(bands))
        assert r.jsd_bits == sm / 2000000.0
        assert 0.0 <= r.jsd_bits <= 1.0


def test_woe_matches_python_replay(spark):
    rnd = random.Random(31)
    segs = ["S0", "S1", "S2", "S3"]
    cust = spark.createDataFrame(
        [(i, f"c{i}", 1, 0.0, segs[i % 4]) for i in range(40)],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orows = [(i, rnd.randint(0, 39), "O", 1.0, TS0, rnd.choice(prios))
             for i in range(300)]
    orders = spark.createDataFrame(
        orows, "o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp, "
               "o_orderpriority string")
    got = {r.segment: r for r in
           features.woe_iv(orders, cust).collect()}
    bins: dict = {}
    for _, ck, _, _, _, pr in orows:
        seg = segs[ck % 4]
        g, b = bins.get(seg, (0, 0))
        good = pr in ("1-URGENT", "2-HIGH")
        bins[seg] = (g + (1 if good else 0), b + (0 if good else 1))
    G = sum(g for g, _ in bins.values())
    B = sum(b for _, b in bins.values())
    iv_sum = 0
    woes = {}
    for seg, (g, b) in bins.items():
        if g > 0 and b > 0:
            pg, pb = g / G, b / B
            wm = math.floor(math.log(pg / pb) * 1000000.0 + 0.5)
            iv_sum += math.floor((pg - pb) * math.log(pg / pb)
                                 * 1000000.0 + 0.5)
            woes[seg] = wm / 1000000.0
        else:
            woes[seg] = None
    for seg, (g, b) in bins.items():
        r = got[seg]
        assert (r.n_good, r.n_bad) == (g, b)
        assert r.woe == woes[seg]
        assert r.iv_total == iv_sum / 1000000.0


def test_absence_matches_python_replay(spark):
    rnd = random.Random(37)
    rows, eid = [], 0
    last: dict = {}
    for u in range(1, 40):
        for _ in range(rnd.randint(1, 5)):
            d = rnd.randint(0, 30)
            last[u] = max(last.get(u, -1), d)
            rows.append((eid, u, d * 86400 + rnd.randint(0, 80000),
                         "view", 1.0))
            eid += 1
    from kafka_streams_in_action_spark.operators import event_time
    got = {r.bucket: r for r in
           event_time.absence_histogram(_events_df(spark, rows))
           .collect()}
    anchor = max(last.values())
    hist: dict = {}
    for u, d in last.items():
        a = anchor - d
        bk = ("active" if a <= 3 else "cooling" if a <= 7
              else "at_risk" if a <= 14 else "churned")
        cnt, lo, hi = hist.get(bk, (0, None, None))
        hist[bk] = (cnt + 1,
                    a if lo is None else min(lo, a),
                    a if hi is None else max(hi, a))
    total = sum(c for c, _, _ in hist.values())
    assert set(got) == set(hist)
    for bk, (cnt, lo, hi) in hist.items():
        r = got[bk]
        assert (r.n_users, r.min_absent_days, r.max_absent_days) == \
            (cnt, lo, hi)
        assert r.share_ppm == cnt * 1_000_000 // total


def test_vratio_matches_python_replay(spark):
    """Random daily series with missing days — lag pairs must match on
    the day INDEX (a gap yields no pair, never a misaligned one)."""
    rnd = random.Random(43)
    rows, eid = [], 0
    series: dict = {}
    for ty in ("u", "w"):
        for d in range(40):
            if rnd.random() < 0.85:  # ~15% missing days
                v = rnd.uniform(1.0, 9.0)
                series.setdefault(ty, {})[d] = \
                    series.setdefault(ty, {}).get(d, 0) + \
                    int(math.floor(v * 1000000.0 + 0.5))
                rows.append((eid, 1, d * 86400, ty, v))
                eid += 1
    got = {r.event_type: r for r in
           windows.variance_ratio(_events_df(spark, rows)).collect()}
    for ty, days in series.items():
        idxs = sorted(days)
        d1, dk = [], []
        for pos, d in enumerate(idxs):
            if pos >= 1 and idxs[pos - 1] == d - 1:
                d1.append(days[d] - days[idxs[pos - 1]])
            if pos >= 7 and idxs[pos - 7] == d - 7:
                dk.append(days[d] - days[idxs[pos - 7]])

        def var(xs):
            n = len(xs)
            if n <= 1:
                return None
            return (n * sum(x * x for x in xs) - sum(xs) ** 2) \
                / (n * (n - 1))

        r = got[ty]
        assert (r.n1, r.nk) == (len(d1), len(dk))
        assert r.var_1 == var(d1)
        assert r.var_k == var(dk)
        if var(d1) and var(d1) > 0:
            assert r.vr == var(dk) / (7 * var(d1))


def test_vratio_separates_momentum_from_oscillation(spark):
    """Persistent same-sign increments accumulate over 7 days (VR ≫ 1);
    a period-2 oscillation cancels (VR ≪ 1). A perfectly LINEAR trend
    has zero 1-day variance and must read NULL, not a crash."""
    rows, eid = [], 0
    for d in range(42):
        # triangle wave, period 14: increments are +1 for 7 days then
        # -1 for 7 — strong positive increment autocorrelation
        rows.append((eid, 1, d * 86400, "momentum",
                     float(abs((d % 14) - 7)))); eid += 1
        rows.append((eid, 1, d * 86400, "osc",
                     5.0 if d % 2 == 0 else 1.0)); eid += 1
        rows.append((eid, 1, d * 86400, "linear", float(d))); eid += 1
    got = {r.event_type: r for r in
           windows.variance_ratio(_events_df(spark, rows)).collect()}
    assert got["momentum"].vr > 1.0 > got["osc"].vr
    assert got["linear"].vr is None and got["linear"].var_1 == 0.0
