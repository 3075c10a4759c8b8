"""Differential tests for the round-14 operators: the arithmetic is
replayed in pure Python on seeded random inputs and must agree with the
Spark output EXACTLY (python ints are exact; int→double divisions are
correctly rounded in python and both engines) — independent third
implementations on adversarial shapes the fixed testdata doesn't
contain (duplicate version keys, tied interval starts, all-tie value
columns, random batch splits through the stream kernels, adversarial
skew against the EMD rational arithmetic)."""

from __future__ import annotations

import datetime as dt
import random
from fractions import Fraction

from kafka_streams_in_action_spark.operators import (
    event_time, features, privacy, relational,
)

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events_df(spark, rows):
    """rows = [(event_id, user_id, seconds_offset, event_type, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(seconds=s), u, t, v, "{}")
         for e, u, s, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


# ------------------------------------------------------------ t-digest

def test_tdigest_compress_rank_error_bounded_random():
    """k0 compression: for random weighted inputs, every centroid's
    weight stays ≤ cap + max_w, total weight is conserved exactly, and
    interpolated quantile estimates stay within ~1.5/delta rank error
    of truth — the bound the registered 2% gate relies on."""
    import numpy as np
    rnd = random.Random(41)
    for trial in range(10):
        n = rnd.randint(200, 5000)
        x = np.sort(np.array([rnd.uniform(0, 1000) for _ in range(n)]))
        w = np.ones(n, dtype=np.int64)
        delta = rnd.choice([50, 100, 200])
        m, cw = relational._tdigest_compress(x, w, delta)
        assert int(cw.sum()) == n
        cap = -(-n // delta)
        assert int(cw.max()) <= cap + 1
        # rank audit at three quantiles
        cum = np.cumsum(cw)
        mid = cum - cw / 2.0
        for q in (0.25, 0.5, 0.9):
            t = q * n
            j = int(np.searchsorted(mid, t))
            if j <= 0:
                e = m[0]
            elif j >= len(m):
                e = m[-1]
            else:
                f = (t - mid[j - 1]) / (mid[j] - mid[j - 1])
                e = m[j - 1] + f * (m[j] - m[j - 1])
            rank = float((x <= e).sum()) / n
            assert abs(rank - q) <= 1.5 / delta + 2.0 / n, (trial, q)


def test_tdigest_merge_of_random_partitions_conserves_weight():
    import numpy as np
    rnd = random.Random(43)
    vals = [rnd.uniform(0, 100) for _ in range(3000)]
    parts = [[] for _ in range(7)]
    for v in vals:
        parts[rnd.randrange(7)].append(v)
    cents_m, cents_w = [], []
    for p in parts:
        if not p:
            continue
        m, w = relational._tdigest_compress(
            np.sort(np.array(p)), np.ones(len(p), np.int64), 100)
        cents_m.append(m)
        cents_w.append(w)
    m = np.concatenate(cents_m)
    w = np.concatenate(cents_w)
    o = np.argsort(m, kind="stable")
    mm, ww = relational._tdigest_compress(m[o], w[o], 100)
    assert int(ww.sum()) == 3000
    assert len(mm) <= 102
    # merged digest median within 2% rank of the true median
    x = np.sort(np.array(vals))
    cum = np.cumsum(ww)
    mid = cum - ww / 2.0
    t = 0.5 * 3000
    j = int(np.searchsorted(mid, t))
    f = (t - mid[j - 1]) / (mid[j] - mid[j - 1])
    e = mm[j - 1] + f * (mm[j] - mm[j - 1])
    assert abs(float((x <= e).sum()) / 3000 - 0.5) <= 0.02


# ------------------------------------------------------- decayed top-k

def test_decay_topk_matches_python_replay(spark):
    rnd = random.Random(47)
    rows, eid = [], 0
    per_user_day: dict = {}
    for u in range(1, 13):
        for d in range(0, 40):
            if rnd.random() < 0.3:
                n = rnd.randint(1, 5)
                per_user_day[(u, d)] = n
                for j in range(n):
                    rows.append((eid, u, d * 86400 + j, "view", 1.0))
                    eid += 1
    got = event_time.decayed_topk(_events_df(spark, rows)).collect()
    anchor = max(d for (_u, d) in per_user_day)
    scores: dict = {}
    events: dict = {}
    for (u, d), n in per_user_day.items():
        age = anchor - d
        w = 1_000_000 >> min(age // 7, 62)
        scores[u] = scores.get(u, 0) + n * w
        events[u] = events.get(u, 0) + n
    order = sorted(scores, key=lambda u: (-scores[u], u))[:10]
    assert [r["user_id"] for r in sorted(got, key=lambda r: r["rank"])] \
        == order
    for r in got:
        assert r["score_micro"] == scores[r["user_id"]]
        assert r["n_events"] == events[r["user_id"]]


# --------------------------------------------------- peak sweep kernel

def test_peak_sweep_kernel_matches_brute_force_any_split():
    """Random intervals (with tied starts, zero lengths, and touching
    ends) through the stream kernel under random batch splits must
    equal a brute-force concurrency evaluation at every start point."""
    from kafka_streams_in_action_spark.streaming.stateful import (
        _sweep_batch,
    )
    rnd = random.Random(53)
    for trial in range(20):
        n = rnd.randint(1, 60)
        items = []
        t = 0
        for _i in range(n):
            t += rnd.randint(0, 5)
            items.append((t, rnd.randint(0, 8)))
        items.sort()
        # brute force: concurrency at each start under half-open [s, e)
        # semantics — c(s) = #{(s2, d2): s2 <= s < s2 + d2}; a
        # zero-length interval is active nowhere, including its own s
        best, best_t = 0, -1
        for s, _d in items:
            c = sum(1 for (s2, d2) in items if s2 <= s < s2 + d2)
            if c > best:
                best, best_t = c, s
        # kernel under a random split
        k = rnd.randint(1, 4)
        cuts = sorted(rnd.sample(range(len(items) + 1), k - 1)) \
            if k > 1 else []
        state = ([], 0, -1, 0, 0)
        lo = 0
        for hi in cuts + [len(items)]:
            state = _sweep_batch(*state, items[lo:hi])
            lo = hi
        _ends, peak, peak_t, n_out, busy = state
        assert n_out == len(items)
        assert busy == sum(d for (_s, d) in items)
        assert peak == best, (trial, items)
        if best:
            assert peak_t == best_t


# ------------------------------------------------------------ SLA fold

def test_sla_gap_fold_matches_direct_any_split():
    """The seven-BIGINT running gap stats folded over random batch
    splits must equal the direct all-at-once gap computation."""
    import numpy as np
    rnd = random.Random(59)
    thr = 3600 * 1_000_000
    for _trial in range(20):
        n = rnd.randint(1, 80)
        us = []
        t = 0
        for _i in range(n):
            t += rnd.randint(0, 3 * thr // 2)
            us.append(t)
        gaps = [b - a for a, b in zip(us, us[1:])]
        exp = {
            "n": n, "first": us[0], "last": us[-1],
            "n_gaps": len(gaps),
            "n_over": sum(1 for g in gaps if g > thr),
            "down": sum(g - thr for g in gaps if g > thr),
            "max_gap": max(gaps) if gaps else 0,
        }
        # fold mirror of the handler body over a random split
        k = rnd.randint(1, 5)
        cuts = sorted(rnd.sample(range(1, n), min(k - 1, n - 1))) \
            if n > 1 and k > 1 else []
        first_us, last_us, cnt = -1, -1, 0
        n_gaps, n_over, max_gap, down = 0, 0, 0, 0
        lo = 0
        for hi in cuts + [n]:
            chunk = np.array(us[lo:hi], dtype=np.int64)
            lo = hi
            if not len(chunk):
                continue
            g = np.diff(chunk)
            if cnt:
                g = np.concatenate(([chunk[0] - last_us], g))
            else:
                first_us = int(chunk[0])
            cnt += len(chunk)
            last_us = int(chunk[-1])
            if len(g):
                n_gaps += len(g)
                over = g - thr
                pos = over > 0
                n_over += int(pos.sum())
                down += int(over[pos].sum())
                max_gap = max(max_gap, int(g.max()))
        assert (cnt, first_us, last_us, n_gaps, n_over, down, max_gap) \
            == (exp["n"], exp["first"], exp["last"], exp["n_gaps"],
                exp["n_over"], exp["down"], exp["max_gap"])


# ----------------------------------------------------------- t-closeness

def test_tcloseness_matches_fraction_reference(spark):
    """Random class/band layouts vs an exact Fraction EMD reference —
    the integer common-denominator arithmetic must floor-match the
    rational value at ppm resolution."""
    rnd = random.Random(61)
    rows, ck = [], 0
    layout: dict = {}
    for nat in range(1, 6):
        for _ in range(rnd.randint(2, 12)):
            band = rnd.choice([0, 1, 2, 5, 9])
            layout.setdefault(nat, []).append(band)
            rows.append((ck, f"c{ck}", nat, band * 1000.0 + 1.0, "AUTO"))
            ck += 1
    cust = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, "
              "c_acctbal double, c_mktsegment string")
    got = privacy.t_closeness_audit(cust).collect()[0]
    bands = sorted({b for bs in layout.values() for b in bs})
    m = len(bands)
    n_total = sum(len(bs) for bs in layout.values())
    glob = {b: sum(bs.count(b) for bs in layout.values()) for b in bands}
    worst = Fraction(0)
    breach_classes = breach_rows = 0
    for nat, bs in layout.items():
        n_c = len(bs)
        cum_c = cum_g = 0
        s = Fraction(0)
        for b in bands:
            cum_c += bs.count(b)
            cum_g += glob[b]
            s += abs(Fraction(cum_c, n_c) - Fraction(cum_g, n_total))
        emd = s / (m - 1) if m > 1 else Fraction(0)
        emd_ppm = int(emd * 1_000_000)  # floor of an exact rational
        if emd_ppm > 200_000:
            breach_classes += 1
            breach_rows += n_c
        worst = max(worst, Fraction(emd_ppm))
    assert got["t_max_ppm"] == int(worst)
    assert got["n_breach_classes"] == breach_classes
    assert got["rows_in_breach"] == breach_rows


# --------------------------------------------------------------- binning

def test_binning_matches_python_replay(spark):
    rnd = random.Random(67)
    vals = [round(rnd.uniform(-50, 50), 2) for _ in range(300)]
    vals += [7.77] * 40   # heavy tie block
    cust = spark.createDataFrame(
        [(i, f"c{i}", 1, v, "AUTO") for i, v in enumerate(vals)],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    got = {r["bin"]: r for r in features.quantile_binning(cust).collect()}
    from collections import Counter
    cents = Counter(int(round(v * 100)) for v in vals)
    n = sum(cents.values())
    cum = 0
    bins: dict = {}
    for c in sorted(cents):
        b = min(9, cum * 10 // n)
        e = bins.setdefault(b, {"n": 0, "lo": c, "hi": c, "s": 0})
        e["n"] += cents[c]
        e["hi"] = c
        e["s"] += c * cents[c]
        cum += cents[c]
    assert set(got) == set(bins)
    for b, e in bins.items():
        r = got[b]
        assert (r["n_rows"], r["lo_cents"], r["hi_cents"]) \
            == (e["n"], e["lo"], e["hi"])
        assert r["mean_cents"] == e["s"] / e["n"]
        assert r["share_ppm"] == e["n"] * 1_000_000 // n


# ------------------------------------------------------------ SCD1 merge

def test_scd1_matches_python_replay(spark):
    rnd = random.Random(71)
    orders = [(k, 100 + k, float(rnd.randint(100, 999)))
              for k in range(1, 40)]
    lines = []
    for k, _c, _p in orders:
        for ln in range(1, rnd.randint(1, 5) + 1):
            year = rnd.choice([1993, 1994, 1996, 1997])
            lines.append((k, ln, dt.datetime(year, 1 + rnd.randint(0, 11),
                                             1 + rnd.randint(0, 27)),
                          float(rnd.randint(1000, 9999))))
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double")
    ldf = spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber int, l_shipdate timestamp, "
               "l_extendedprice double")
    got = {r["o_orderkey"]: r for r in
           relational.scd1_latest_merge(odf, ldf).collect()}
    cutoff = dt.datetime(1995, 6, 1)
    feed: dict = {}
    nv: dict = {}
    for (k, ln, sd, px) in lines:
        if sd < cutoff:
            continue
        nv[k] = nv.get(k, 0) + 1
        cur = feed.get(k)
        if cur is None or (sd, ln, px) > (cur[0], cur[1], cur[2]):
            feed[k] = (sd, ln, px)
    assert len(got) == len(orders) + sum(1 for k in feed if k % 997 == 1)
    for (k, c, p) in orders:
        r = got[k]
        if k in feed:
            sd, ln, px = feed[k]
            assert r["op"] == "U"
            assert r["price_cents"] == int(round(px * 100))
            assert r["version_line"] == ln and r["n_versions"] == nv[k]
        else:
            assert r["op"] == "K"
            assert r["price_cents"] == int(round(p * 100))
    # derived insert offset: every order key appears in orders, so the
    # base max dominates the feed max
    off = max(k for k, _c, _p in orders) + 1
    for k in feed:
        if k % 997 == 1:
            r = got[k + off]
            assert r["op"] == "I" and r["o_custkey"] is None


# ----------------------------------------------------------- nDCG spec

def test_ndcg_weights_are_floor_half_up_of_log_discount():
    import math
    from kafka_streams_in_action_spark.operators.similarity import (
        _ndcg_weights_micro,
    )
    ws = _ndcg_weights_micro(10)
    assert ws[0] == 1_000_000                  # rank 1: log2(2) = 1
    assert ws[1] == int(1e6 / math.log2(3) + 0.5)
    assert all(a > b for a, b in zip(ws, ws[1:]))
