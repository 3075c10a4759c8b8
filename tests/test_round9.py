"""Round-9 operator behavior tests: max drawdown, SMA crossover, OLS
trend, interval-overlap concurrency, RFM scoring, time-travel reads,
cascade purge, link prediction, k-core peeling.

Oracle parity for every registered row is covered by tests/test_oracle.py
(bit-exact on floats); these pin the BEHAVIORAL contracts the oracles
can't express (tie-breaks, sign conventions, degenerate inputs).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import windows


TS0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _events(spark, rows):
    """rows = [(event_id, user_id, minutes_offset, event_type, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(minutes=m), u, t, v, "{}")
         for e, u, m, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


# ------------------------------------------------------------- drawdown

def test_drawdown_tracks_running_peak_not_global_max(spark):
    """Flows +10, -4, +2, -7: peak after row1 is 10; the deepest decline
    is 10 → 1 (dd 9000 milli), NOT measured against the later local
    peak. Final balance is the plain flow sum (+1)."""
    ev = _events(spark, [
        (1, 1, 0, "purchase", 10.0),   # cum 10000, peak 10000
        (2, 1, 1, "click", 4.0),       # cum  6000
        (3, 1, 2, "view", 2.0),        # cum  8000
        (4, 1, 3, "error", 7.0),       # cum  1000, dd 9000
    ])
    row = windows.equity_drawdown(ev).collect()[0]
    assert row["n_events"] == 4
    assert row["final_milli"] == 1000
    assert row["peak_milli"] == 10000
    assert row["max_dd_milli"] == 9000


def test_drawdown_monotone_series_has_zero_drawdown(spark):
    """All-inflow series: cum is nondecreasing, so dd stays 0 and the
    peak equals the final balance."""
    ev = _events(spark, [(i, 1, i, "purchase", 1.0) for i in range(5)])
    row = windows.equity_drawdown(ev).collect()[0]
    assert row["max_dd_milli"] == 0
    assert row["peak_milli"] == row["final_milli"] == 5000


def test_drawdown_all_outflow_peak_is_first_value(spark):
    """All-outflow series: the running peak is the FIRST cumulative
    value (−1000), not zero — the peak is defined over the observed cum
    series, with no implicit 0 start."""
    ev = _events(spark, [(i, 1, i, "error", 1.0) for i in range(1, 4)])
    row = windows.equity_drawdown(ev).collect()[0]
    assert row["peak_milli"] == -1000
    assert row["final_milli"] == -3000
    assert row["max_dd_milli"] == 2000


# ------------------------------------------------------------ crossover

def test_crossover_emits_golden_on_upward_sign_flip(spark):
    """Fast SMA crossing the slow SMA from below emits exactly one
    'golden' row at the flip day; comparison is the exact integer
    cross-multiplication s3·7 − s7·3."""
    # 10 days of flat 1.0/day, then a surge: day index = minutes/1440
    rows = []
    eid = 0
    for d in range(14):
        v = 1.0 if d < 10 else 50.0
        rows.append((eid, 1, d * 1440, "t", v))
        eid += 1
    out = windows.sma_crossover(_events(spark, rows)).collect()
    golden = [r for r in out if r["direction"] == "golden"]
    assert len(golden) == 1
    assert golden[0]["sign"] == 1 and golden[0]["prev_sign"] in (-1, 0)


def test_crossover_flat_series_emits_nothing(spark):
    """A constant series keeps s3·7 == s7·3 (sign 0 throughout) — no
    sign change, no rows."""
    rows = [(d, 1, d * 1440, "t", 2.0) for d in range(12)]
    assert windows.sma_crossover(_events(spark, rows)).count() == 0


def test_crossover_requires_full_slow_frame(spark):
    """With fewer than 7 observed days nothing is scored (no partial
    frames), so a 6-day series emits nothing."""
    rows = [(d, 1, d * 1440, "t", float(1 + d % 3)) for d in range(6)]
    assert windows.sma_crossover(_events(spark, rows)).count() == 0


# ---------------------------------------------------------------- trend

def test_ols_trend_recovers_exact_line(spark):
    """y = 3x + 2 exactly: slope and intercept come out exact (the
    sufficient statistics are exact integers; one division each)."""
    orders = spark.createDataFrame(
        [(i * 100 + j, 1, "O", 1.0,
          dt.datetime(1995 + (i // 12), (i % 12) + 1, 1), "1-URGENT")
         for i in range(6) for j in range(3 * i + 2)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    cust = spark.createDataFrame(
        [(1, "c", 0, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    nation = spark.createDataFrame(
        [(0, "ALGERIA", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    row = windows.ols_trend(orders, cust, nation).collect()[0]
    assert row["n_months"] == 6
    assert row["slope"] == 3.0 and row["intercept"] == 2.0


def test_ols_trend_single_month_excluded(spark):
    """One observed month ⇒ zero x-variance ⇒ the nation is excluded
    rather than emitted with a NaN/∞ slope."""
    orders = spark.createDataFrame(
        [(k, 1, "O", 1.0, dt.datetime(1995, 3, 1), "1-URGENT")
         for k in range(5)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    cust = spark.createDataFrame(
        [(1, "c", 0, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    nation = spark.createDataFrame(
        [(0, "ALGERIA", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    assert windows.ols_trend(orders, cust, nation).count() == 0


# ---------------------------------------------------------- concurrency

def _lineitems(spark, rows):
    """rows = [(orderkey, suppkey, shipdate)]"""
    return spark.createDataFrame(
        [(o, 1, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
         for o, s, d in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")


def test_concurrency_end_day_is_exclusive(spark):
    """[day0, day7) and [day7, day14): the first shipment's −1 lands on
    day 7 before the day is scored, so the peak is 1, not 2 — the
    half-open interval contract."""
    from kafka_streams_in_action_spark.operators import event_time
    d0 = dt.datetime(2024, 1, 1)
    li = _lineitems(spark, [(1, 1, d0), (2, 1, d0 + dt.timedelta(days=7))])
    row = event_time.interval_concurrency(li).collect()[0]
    assert row["peak_concurrency"] == 1
    assert row["n_shipments"] == 2


def test_concurrency_reports_earliest_peak_day(spark):
    """Overlapping [0,7) and [3,10): concurrency hits 2 on day 3 and
    stays there through day 6 — the reported peak day is day 3."""
    from kafka_streams_in_action_spark.operators import event_time
    d0 = dt.datetime(2024, 1, 1)
    li = _lineitems(spark, [(1, 1, d0), (2, 1, d0 + dt.timedelta(days=3))])
    row = event_time.interval_concurrency(li).collect()[0]
    assert row["peak_concurrency"] == 2
    assert row["peak_day"] == dt.date(2024, 1, 4)


# ------------------------------------------------------------------ rfm

def _orders(spark, rows):
    """rows = [(orderkey, custkey, orderdate, totalprice)]"""
    return spark.createDataFrame(
        [(o, c, "O", p, d, "1-URGENT") for o, c, d, p in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")


def test_rfm_tiebreak_is_custkey(spark):
    """Five customers with IDENTICAL r/f/m raw values: ntile(5) must
    split them 1..5 strictly by custkey — the deterministic-bucket
    contract the oracle hash depends on."""
    from kafka_streams_in_action_spark.operators import relational
    d = dt.datetime(2001, 6, 1)
    out = relational.rfm_scores(_orders(
        spark, [(k, k, d, 100.0) for k in range(1, 6)])).collect()
    by_key = {r["custkey"]: r for r in sorted(out, key=lambda r: r["custkey"])}
    assert [by_key[k]["r_score"] for k in range(1, 6)] == [1, 2, 3, 4, 5]
    assert [by_key[k]["f_score"] for k in range(1, 6)] == [1, 2, 3, 4, 5]


def test_rfm_segment_rules(spark):
    """A recent+frequent customer is 'champion'; a stale one-order
    customer is 'lost' (with 5 customers each quintile is one row, so
    raw ordering maps straight onto scores)."""
    from kafka_streams_in_action_spark.operators import relational
    rows = []
    # custkey 1..5: increasing recency AND frequency together
    oid = 0
    for k in range(1, 6):
        for j in range(k):  # frequency = custkey
            rows.append((oid, k, dt.datetime(2001, k, 1), 100.0 * k))
            oid += 1
    out = {r["custkey"]: r for r in
           relational.rfm_scores(_orders(spark, rows)).collect()}
    assert out[5]["segment"] == "champion"
    assert out[1]["segment"] == "lost"


# ----------------------------------------------------------- timetravel

def test_timetravel_delete_then_reupsert_across_cuts(spark):
    """Key deleted before cut 1 but re-upserted before cut 2: dead at
    the first cut, live with the NEW value at the second — last-op-wins
    per cut, not a global tombstone."""
    from kafka_streams_in_action_spark.operators import relational
    ev = _events(spark, [
        (1, 1, 0, "purchase", 5.0),                 # Jan 1: upsert 5000
        (2, 1, 24 * 60 * 2, "error", 1.0),          # Jan 3: delete
        (3, 1, 24 * 60 * 9, "purchase", 7.0),       # Jan 10: upsert 7000
    ])
    out = {str(r["as_of"]): r for r in
           relational.timetravel_read(ev).collect()}
    jan8, jan15 = out["2024-01-08"], out["2024-01-15"]
    assert jan8["n_live"] == 0 and jan8["n_deleted"] == 1
    assert jan8["live_value_milli"] == 0
    assert jan15["n_live"] == 1 and jan15["live_value_milli"] == 7000


def test_timetravel_key_unseen_before_cut_not_counted(spark):
    """A key whose first op lands after a cut is absent from that cut's
    state entirely (n_keys excludes it) — no null-padded rows."""
    from kafka_streams_in_action_spark.operators import relational
    ev = _events(spark, [
        (1, 1, 0, "view", 2.0),                     # Jan 1
        (2, 2, 24 * 60 * 10, "view", 3.0),          # Jan 11
    ])
    out = {str(r["as_of"]): r for r in
           relational.timetravel_read(ev).collect()}
    assert out["2024-01-08"]["n_keys"] == 1
    assert out["2024-01-15"]["n_keys"] == 2


# --------------------------------------------------------------- forget

def test_cascade_purge_counts_and_zero_orphans(spark):
    """Customers 97 and 194 are purged; their orders and line items go
    with them; the independently recounted orphan columns are 0."""
    from kafka_streams_in_action_spark.operators import relational
    cust = spark.createDataFrame(
        [(k, f"c{k}", 0, 0.0, "AUTO") for k in (1, 97, 194, 200)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    orders = _orders(spark, [
        (10, 1, dt.datetime(2000, 1, 1), 1.0),
        (11, 97, dt.datetime(2000, 1, 2), 1.0),
        (12, 194, dt.datetime(2000, 1, 3), 1.0),
    ])
    li = _lineitems(spark, [(10, 1, dt.datetime(2000, 1, 5)),
                            (11, 1, dt.datetime(2000, 1, 6)),
                            (11, 2, dt.datetime(2000, 1, 7))])
    out = {r["table_name"]: r for r in
           relational.cascade_purge(cust, orders, li).collect()}
    assert (out["customer"]["rows_purged"], out["customer"]["rows_after"]) \
        == (2, 2)
    assert (out["orders"]["rows_purged"], out["orders"]["rows_after"]) \
        == (2, 1)
    assert (out["lineitem"]["rows_purged"], out["lineitem"]["rows_after"]) \
        == (2, 1)
    assert all(out[t]["orphans_after"] == 0 for t in out)


# ---------------------------------------------------------------- graph

def _copurchase_li(spark, baskets):
    """baskets = [(orderkey, [partkeys])]; every basket repeated twice
    (distinct orderkeys) so each pair meets the >=2-orders support."""
    rows = []
    for o, parts in baskets:
        for p in parts:
            rows.append((o, p, dt.datetime(2000, 1, 1)))
    return spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
         for o, p, d in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")


def test_kcore_peel_cascades_down_a_path(spark):
    """Path 1-2-3-4 (each edge supported by 2 orders): endpoints have
    degree 1, and peeling CASCADES — after the endpoints go, 2 and 3
    become degree-1 and go too. The 2-core is empty, which a one-shot
    degree filter would get wrong."""
    from kafka_streams_in_action_spark.operators import graph
    baskets = []
    o = 0
    for a, b in [(1, 2), (2, 3), (3, 4)]:
        for _ in range(2):  # support 2
            baskets.append((o, [a, b])); o += 1
    li = _copurchase_li(spark, baskets)
    assert graph.copurchase_kcore(li).count() == 0


def test_kcore_triangle_survives(spark):
    """A triangle (every node degree 2) is exactly the 2-core and must
    survive all 12 rounds unchanged; a pendant attached to it is
    peeled in round 1."""
    from kafka_streams_in_action_spark.operators import graph
    baskets = []
    o = 0
    for a, b in [(1, 2), (2, 3), (1, 3), (3, 9)]:
        for _ in range(2):
            baskets.append((o, [a, b])); o += 1
    li = _copurchase_li(spark, baskets)
    out = {r["partkey"]: r["core_degree"]
           for r in graph.copurchase_kcore(li).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_support_filter_drops_single_order_pairs(spark):
    """A pair co-purchased in only ONE order never becomes an edge:
    a triangle whose edges each appear once yields an empty graph."""
    from kafka_streams_in_action_spark.operators import graph
    li = _copurchase_li(
        spark, [(1, [1, 2]), (2, [2, 3]), (3, [1, 3])])
    assert graph.copurchase_kcore(li).count() == 0


def test_linkpred_tiebreak_prefers_smaller_union(spark):
    """Suppliers B and C share the same 2 parts with A, but C carries
    fewer extra parts (smaller union → higher Jaccard) — C must rank
    above B for equal common counts."""
    from kafka_streams_in_action_spark.operators import graph
    rows = []
    # A(=1) has parts 10,11,12; C(=3) has 10,11; B(=2) has 10,11,90,91
    for s, parts in [(1, [10, 11, 12]), (2, [10, 11, 90, 91]),
                     (3, [10, 11])]:
        for p in parts:
            rows.append((s, p, dt.datetime(2000, 1, 1)))
    li = spark.createDataFrame(
        [(100 + i, p, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
         for i, (s, p, d) in enumerate(rows)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    out = [r for r in graph.link_prediction(li).collect()
           if r["suppkey"] == 1]
    out.sort(key=lambda r: r["rank"])
    assert [r["neighbor"] for r in out] == [3, 2]
    assert out[0]["common_parts"] == out[1]["common_parts"] == 2
    assert out[0]["union_parts"] < out[1]["union_parts"]


# ------------------------------------------------------------------- ks

def test_ks_identical_distributions_never_reject(spark):
    """Types drawing the exact same values: every cumulative count
    matches, d_num = 0, no rejection."""
    from kafka_streams_in_action_spark.operators import relational
    rows = []
    for i in range(40):
        rows.append((2 * i, 1, i, "a", float(i % 5)))
        rows.append((2 * i + 1, 1, i, "b", float(i % 5)))
    row = relational.ks_test(_events(spark, rows)).collect()[0]
    assert row["d_num"] == 0 and row["d"] == 0.0
    assert row["reject"] is False


def test_ks_disjoint_distributions_reject(spark):
    """Fully separated supports: at the boundary F_a = 1, F_b = 0, so
    d = 1 and the test rejects at any reasonable n."""
    from kafka_streams_in_action_spark.operators import relational
    rows = []
    for i in range(30):
        rows.append((2 * i, 1, i, "a", 1.0 + (i % 3) * 0.1))
        rows.append((2 * i + 1, 1, i, "b", 100.0 + (i % 3) * 0.1))
    row = relational.ks_test(_events(spark, rows)).collect()[0]
    assert row["d"] == 1.0 and row["reject"] is True
    assert row["d_num"] == row["n_a"] * row["n_b"]


# ---------------------------------------------------------- seasonality

def test_seasonality_uniform_week_index_is_exactly_one(spark):
    """Same total every day across two full weeks: every dow index is
    exactly 1.0 (the cross-products are equal integers)."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(d, 1, d * 1440, "t", 3.0) for d in range(14)]
    out = event_time.dow_seasonality(_events(spark, rows)).collect()
    assert len(out) == 7
    assert all(r["seasonal_index"] == 1.0 and r["n_days"] == 2
               for r in out)


def test_seasonality_dow_is_calendar_stable(spark):
    """2024-01-01 TS0 is a Monday; days-since-1995-01-01 (a Sunday)
    mod 7 must give dow=1 for it in every engine."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(1, 1, 0, "t", 1.0)]  # single Monday event
    row = event_time.dow_seasonality(_events(spark, rows)).collect()[0]
    assert row["dow"] == 1


# --------------------------------------------------------------- vacuum

def test_vacuum_keeps_newest_versions_and_serving(spark, tmp_path):
    """5 versions, keep 2: v0-v2 are deleted, v3/v4 stay on disk, and
    the serving (newest) read returns identical rows before and after."""
    import os
    from kafka_streams_in_action_spark.operators import layout
    ev = _events(spark, [(i, 1, i, "t", 1.0) for i in range(20)])
    base = str(tmp_path / "vac")
    row = layout.vacuum_versions(spark, ev, base).collect()[0]
    assert (row["n_versions_before"], row["n_removed"], row["n_kept"]) \
        == (5, 3, 2)
    assert row["serving_unchanged"] is True
    assert row["serving_complete"] is True
    assert sorted(os.listdir(base)) == ["v3", "v4"]


def test_vacuum_fewer_versions_than_keep_removes_nothing(spark, tmp_path):
    """Retention never deletes below the keep floor: with 2 versions
    and keep=2 the vacuum is a no-op."""
    from kafka_streams_in_action_spark.operators import layout
    ev = _events(spark, [(i, 1, i, "t", 1.0) for i in range(10)])
    row = layout.vacuum_versions(
        spark, ev, str(tmp_path / "vac2"), n_versions=2, keep=2) \
        .collect()[0]
    assert row["n_removed"] == 0 and row["n_kept"] == 2
    assert row["serving_unchanged"] is True


# ---------------------------------------------------------- blocking-eval

def test_blocking_eval_counts_on_tiny_corpus(spark):
    """6 customers (2 divisible by 3 → 2 dirty twins), all same
    nation/segment, balances far apart: each dirty record's band
    window reaches only its own twin, so candidates = 2, pair
    completeness = 1.0, and the reduction ratio is 1 − 2/(2·6)."""
    from kafka_streams_in_action_spark.operators import linkage
    cust = spark.createDataFrame(
        [(k, f"Customer#{k:09d}", 1, 100.0 * k, "AUTO")
         for k in range(1, 7)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    row = linkage.blocking_eval(cust).collect()[0]
    assert (row["n_dirty"], row["n_clean"]) == (2, 6)
    assert row["n_candidates"] == 2 and row["n_true_covered"] == 2
    assert row["pair_completeness"] == 1.0
    assert row["reduction_ratio"] == 1.0 - 2.0 / 12.0


# ------------------------------------------------------------------ gaps

def test_activity_gaps_span_identity(spark):
    """Observed days 1,2,5,9: two gaps (len 2 and 3), and
    observed + missing = last − first + 1."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(i, 1, (d - 1) * 1440, "t", 1.0)
            for i, d in enumerate([1, 2, 5, 9])]
    row = event_time.activity_gaps(_events(spark, rows)).collect()[0]
    assert row["n_days_observed"] == 4
    assert row["n_gaps"] == 2
    assert row["max_gap_days"] == 3
    assert row["total_missing_days"] == 5
    span = (row["last_day"] - row["first_day"]).days + 1
    assert row["n_days_observed"] + row["total_missing_days"] == span


def test_activity_gaps_dense_series_has_none(spark):
    """Consecutive days: zero gaps, zero missing."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(d, 1, d * 1440, "t", 1.0) for d in range(5)]
    row = event_time.activity_gaps(_events(spark, rows)).collect()[0]
    assert row["n_gaps"] == 0 and row["total_missing_days"] == 0


# ------------------------------------------------------------- closeness

def test_closeness_chain_graph_distances(spark):
    """Trade chain 0→1→2: nation 0 reaches 1 at hop 1 and 2 at hop 2 —
    n_reached 3 (incl. self), Σd = 3, harmonic = 5040 + 2520; nation 2
    reaches nothing (closeness null, harmonic 0)."""
    from kafka_streams_in_action_spark.operators import graph
    nation = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0), (2, "C", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    cust = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "AUTO"), (2, "c2", 1, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    supp = spark.createDataFrame(
        [(10, 1), (20, 2)], "s_suppkey long, s_nationkey int")
    orders = _orders(spark, [(100, 1, dt.datetime(2000, 1, 1), 1.0),
                             (200, 2, dt.datetime(2000, 1, 2), 1.0)])
    li = spark.createDataFrame(
        [(100, 1, 10, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          dt.datetime(2000, 1, 3)),
         (200, 1, 20, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          dt.datetime(2000, 1, 4))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    out = {r["nationkey"]: r for r in graph.closeness_centrality(
        cust, orders, li, supp, nation).collect()}
    assert out[0]["n_reached"] == 3 and out[0]["sum_hops"] == 3
    assert out[0]["harmonic_x5040"] == 5040 + 2520
    assert out[0]["closeness"] == 2.0 / 3.0
    assert out[2]["n_reached"] == 1 and out[2]["closeness"] is None


# ------------------------------------------------------------ stickiness

def test_stickiness_mau_counts_trailing_window_users(spark):
    """User A active day 0 only, user B active day 20: at day 20,
    DAU = 1 (B) but MAU = 2 (A is inside the trailing 30) —
    stickiness 0.5. A day-35 event drops A out of the window."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(1, 1, 0, "t", 1.0),
            (2, 2, 20 * 1440, "t", 1.0),
            (3, 2, 35 * 1440, "t", 1.0)]
    out = {str(r["day"]): r for r in
           event_time.dau_mau_stickiness(_events(spark, rows)).collect()}
    d20 = out["2024-01-21"]
    assert (d20["dau"], d20["mau"]) == (1, 2)
    assert d20["stickiness"] == 0.5
    d35 = out["2024-02-05"]
    assert (d35["dau"], d35["mau"]) == (1, 1)


def test_stickiness_same_day_duplicates_count_once(spark):
    """Five events by one user on one day: DAU = MAU = 1 (the
    (user, day) dedup precedes everything)."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(i, 7, i, "t", 1.0) for i in range(5)]
    row = event_time.dau_mau_stickiness(_events(spark, rows)).collect()[0]
    assert (row["dau"], row["mau"], row["stickiness"]) == (1, 1, 1.0)


# ------------------------------------------------------------- reconcile

def test_reconcile_exact_and_drifted_orders(spark):
    """Order 1's header equals its line total exactly; order 2's header
    is 50 cents off (within a dollar); order 3 drifts 500 cents."""
    from kafka_streams_in_action_spark.operators import relational
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 100.0, 0.1, 0.05, "N", "O",
          dt.datetime(2000, 1, 1)),
         (2, 1, 1, 1, 1.0, 200.0, 0.0, 0.0, "N", "O",
          dt.datetime(2000, 1, 1)),
         (3, 1, 1, 1, 1.0, 300.0, 0.0, 0.0, "N", "O",
          dt.datetime(2000, 1, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    # order 1 charge = 100*0.9*1.05 = 94.50
    orders = _orders(spark, [
        (1, 1, dt.datetime(2000, 1, 1), 94.50),
        (2, 1, dt.datetime(2000, 1, 1), 200.50),
        (3, 1, dt.datetime(2000, 1, 1), 305.00),
    ])
    row = relational.order_reconciliation(orders, li).collect()[0]
    assert row["n_orders"] == 3
    assert row["n_exact"] == 1
    assert row["n_within_dollar"] == 2
    assert row["max_abs_delta_cents"] == 500
    assert row["sum_abs_delta_cents"] == 550


# ----------------------------------------------------------------- quota

def _docs(spark, rows):
    """rows = [(doc_id, source, text)]"""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, s, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def test_quota_allocation_sums_exactly_to_budget(spark):
    """Skewed strata (70/20/10 docs, budget 500 > corpus): quotas are
    capped implicitly by the draw, but the ALLOCATION always sums to
    the budget and every stratum draw returns min(alloc, n_docs)."""
    from kafka_streams_in_action_spark.operators import sampling
    rows = ([(i, "a", f"t {i}") for i in range(70)]
            + [(100 + i, "b", f"t {i}") for i in range(20)]
            + [(200 + i, "c", f"t {i}") for i in range(10)])
    out = sampling.quota_sample(_docs(spark, rows), budget=50).collect()
    assert sum(r["alloc"] for r in out) == 50
    by = {r["source"]: r for r in out}
    assert by["a"]["alloc"] == 35 and by["b"]["alloc"] == 10 \
        and by["c"]["alloc"] == 5
    assert all(r["n_selected"] == r["alloc"] for r in out)


def test_quota_largest_remainder_tiebreak(spark):
    """Budget 10 over three equal strata (10/3 each): base 3 ×3 = 9,
    one leftover seat; remainders tie, so the lexicographically first
    source wins it."""
    from kafka_streams_in_action_spark.operators import sampling
    rows = [(100 * k + i, s, f"t {i}")
            for k, s in enumerate(["x", "y", "z"]) for i in range(9)]
    out = {r["source"]: r for r in sampling.quota_sample(
        _docs(spark, rows), budget=10).collect()}
    assert [out[s]["alloc"] for s in ("x", "y", "z")] == [4, 3, 3]


# ---------------------------------------------------------- recall curve

def test_recall_curve_identical_twins_fully_recalled(spark):
    """Pairs of identical documents (jaccard exactly 1.0) collide in
    EVERY band — recall is deterministic-complete at every threshold
    and precision holds bitwise."""
    from kafka_streams_in_action_spark.operators import dedup
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(2 * i + b, f"s{i}", text + f" tail{i} tail{i}")
            for i in range(6) for b in (0, 1)]
    out = dedup.lsh_recall_curve(_docs(spark, rows)).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_exact_pairs"] >= 6
        assert r["precision_ok"] is True and r["recall_ok"] is True


# ------------------------------------------------------ growth accounting

def test_growth_accounting_classifies_flows(spark):
    """User 1 active weeks 0,1,3; user 2 active week 1 only.
    Week 0: 1 new. Week 1: 1 retained (u1) + 1 new (u2).
    Week 2: 2 dormant (both skipped), nobody active → week 2 absent.
    Week 3: u1 resurrected, u2 contributes no further flow (corpus-end
    cap keeps week 4 out)."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(1, 1, 0, "t", 1.0),
            (2, 1, 7 * 1440, "t", 1.0),
            (3, 2, 7 * 1440 + 10, "t", 1.0),
            (4, 1, 21 * 1440, "t", 1.0)]
    out = {r["week"] - min(x["week"] for x in y): r
           for y in [event_time.growth_accounting(_events(spark, rows))
                     .collect()]
           for r in y}
    assert out[0]["n_new"] == 1
    assert (out[1]["n_new"], out[1]["n_retained"]) == (1, 1)
    assert out[3]["n_resurrected"] == 1
    assert out[3]["n_retained"] == 0
    # dormant flows land on week 2 (absent from active) and week 4
    # (past corpus end) — neither fabricates an active row
    assert 2 not in out and 4 not in out


# ---------------------------------------------------------- token budget

def test_token_budget_global_dedup_attribution(spark):
    """The same text in sources a (doc 1) and b (doc 2): the b copy is
    the duplicate (higher id), so b's survival drops while a keeps its
    tokens — dedup is global, attribution per source."""
    from kafka_streams_in_action_spark.operators import text as t
    docs = _docs(spark, [(1, "a", "x y z"), (2, "b", "x y z"),
                         (3, "b", "p q")])
    out = {r["source"]: r for r in
           t.token_budget_report(docs).collect()}
    assert out["a"]["docs_after"] == 1 and out["a"]["tokens_after"] == 3
    assert out["b"]["docs_before"] == 2 and out["b"]["docs_after"] == 1
    assert out["b"]["tokens_after"] == 2
    assert out["b"]["doc_survival"] == 0.5


# ----------------------------------------------------------- filtered ann

def test_filtered_ann_post_subset_of_pre(spark):
    """Post-filter counts can never exceed pre-filter counts, and for
    every query n_pre is min(k, same-label candidates)."""
    from kafka_streams_in_action_spark.operators import similarity
    import math
    vecs = [(i, [math.cos(i * 0.7), math.sin(i * 0.7), 0.1 * (i % 4)],
             i % 2) for i in range(30)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in vecs],
        "vec_id long, embedding array<float>, label int")
    out = similarity.filtered_ann_eval(emb).collect()
    assert len(out) == 10
    for r in out:
        assert r["n_post"] <= r["n_pre"] <= 5
        assert r["post_recall"] == r["n_post"] / 5.0


# -------------------------------------------------------------- exposure

def test_exposure_matches_pixel_formula(spark):
    """The kernel's under/over counts equal a direct replay of the
    fixture pixel formula through the integer BT.601 luma."""
    from kafka_streams_in_action_spark.operators import multimodal
    docs = _docs(spark, [(7, "s", "hello world"), (12, "s", "abc")])
    media = multimodal.to_bmp_media(docs)
    out = {r["doc_id"]: r for r in
           multimodal.exposure_stats(media).collect()}
    for doc_id, text in [(7, "hello world"), (12, "abc")]:
        w, h = multimodal._bmp_dims(doc_id, len(text.encode()))
        under = over = 0
        for p in range(w * h):
            b = (doc_id * 31 + (3 * p + 0) * 7) % 256
            g = (doc_id * 31 + (3 * p + 1) * 7) % 256
            r_ = (doc_id * 31 + (3 * p + 2) * 7) % 256
            y = (77 * r_ + 150 * g + 29 * b) // 256
            under += y < 64
            over += y >= 192
        row = out[doc_id]
        assert (row["n_px"], row["n_under"], row["n_over"]) \
            == (w * h, under, over)
        assert row["under_frac"] == under / (w * h)


# ---------------------------------------------------------------- pareto

def test_pareto_counts_crossing_customer(spark):
    """Revenues 80, 10, 10: the first customer alone crosses 80% of
    the 100 total, but membership is prev_cum < mark, so exactly the
    crossing customer is counted — n_top80 = 1."""
    from kafka_streams_in_action_spark.operators import relational
    cust = spark.createDataFrame(
        [(k, f"c{k}", 0, 0.0, "AUTO") for k in (1, 2, 3)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    orders = _orders(spark, [
        (10, 1, dt.datetime(2000, 1, 1), 80.0),
        (11, 2, dt.datetime(2000, 1, 2), 10.0),
        (12, 3, dt.datetime(2000, 1, 3), 10.0)])
    row = relational.pareto_concentration(orders, cust).collect()[0]
    assert (row["n_customers"], row["n_top80"]) == (3, 1)


def test_pareto_uniform_revenue_needs_eighty_percent(spark):
    """10 equal customers: covering 80% of revenue takes exactly 8 of
    them (the integer cross-multiply has no rounding slack)."""
    from kafka_streams_in_action_spark.operators import relational
    cust = spark.createDataFrame(
        [(k, f"c{k}", 0, 0.0, "AUTO") for k in range(1, 11)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    orders = _orders(spark, [(100 + k, k, dt.datetime(2000, 1, 1), 10.0)
                             for k in range(1, 11)])
    row = relational.pareto_concentration(orders, cust).collect()[0]
    assert row["n_top80"] == 8 and row["top80_share"] == 0.8


# -------------------------------------------------------------- theilsen

def test_theilsen_ignores_single_outlier_month(spark):
    """y = 2x with one wild outlier month: OLS moves, the Theil-Sen
    median slope stays exactly 2.0."""
    from kafka_streams_in_action_spark.operators import windows as wops
    rows = []
    oid = 0
    for i in range(8):
        y = 2 * (i + 1) if i != 4 else 500   # outlier at month 4
        for j in range(y):
            rows.append((oid, 1, dt.datetime(1995, i + 1, 1), 1.0))
            oid += 1
    orders = _orders(spark, rows)
    cust = spark.createDataFrame(
        [(1, "c", 0, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    nation = spark.createDataFrame(
        [(0, "ALGERIA", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    ts_row = wops.theilsen_trend(orders, cust, nation).collect()[0]
    assert ts_row["median_slope"] == 2.0
    ols_row = wops.ols_trend(orders, cust, nation).collect()[0]
    assert abs(ols_row["slope"] - 2.0) > 1.0  # OLS got dragged


# --------------------------------------------------------------- formats

def test_format_roundtrip_preserves_micros_and_doubles(spark, tmp_path):
    """A micro-precision timestamp and an awkward double must survive
    all three formats byte-exactly — the pinned timestampFormat is
    what makes the text formats pass."""
    from kafka_streams_in_action_spark.operators import layout
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0, 0, 123456), 1, "t",
          0.1 + 0.2, "{}"),
         (2, dt.datetime(2024, 1, 1, 10, 0, 1, 999999), 2, "t",
          1e-17, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = layout.format_roundtrip_audit(spark, ev, str(tmp_path / "f"))
    assert all(r["roundtrip_exact"] for r in out.collect())


# ---------------------------------------------------------- dup coverage

def test_dup_coverage_instance_weighted(spark):
    """Doc A and doc B share their full 8-gram; doc C is unique. The
    shared gram's TWO instances both count as duplicated — 2/3 of all
    instances, not 1/2 of distinct grams."""
    from kafka_streams_in_action_spark.operators import text as t
    shared = "a b c d e f g h"
    docs = _docs(spark, [(1, "s", shared), (2, "s", shared),
                         (3, "s", "p q r s t u v w")])
    row = t.dup_ngram_coverage(docs).collect()[0]
    assert (row["n_instances"], row["n_duplicated"]) == (3, 2)
    assert row["dup_frac"] == 2.0 / 3.0


def test_dup_coverage_short_docs_contribute_nothing(spark):
    """A 3-token doc has no 8-gram and must not crash or emit
    phantom instances (the descending-sequence edge)."""
    from kafka_streams_in_action_spark.operators import text as t
    docs = _docs(spark, [(1, "s", "x y z"),
                         (2, "s", "a b c d e f g h i")])
    row = t.dup_ngram_coverage(docs).collect()[0]
    assert row["n_instances"] == 2 and row["n_duplicated"] == 0


# -------------------------------------------------------------- flatline

def test_flatline_counts_runs_and_longest(spark):
    """Values 5,5,5,7,5: runs are [5×3][7][5] — longest 3, one
    flatline at min_run=3, three runs total."""
    from kafka_streams_in_action_spark.operators import relational
    vals = [5.0, 5.0, 5.0, 7.0, 5.0]
    rows = [(i, 1, i, "t", v) for i, v in enumerate(vals)]
    row = relational.flatline_runs(_events(spark, rows)).collect()[0]
    assert (row["n_runs"], row["longest_run"], row["n_flatlines"]) \
        == (3, 3, 1)


# ----------------------------------------------------------------- paths

def test_top_paths_counts_overlapping_windows(spark):
    """Sequence a,b,a,b,a for one user: 3-step windows are a>b>a,
    b>a>b, a>b>a — overlapping walks count individually."""
    from kafka_streams_in_action_spark.operators import event_time
    seq = ["a", "b", "a", "b", "a"]
    rows = [(i, 1, i, t, 1.0) for i, t in enumerate(seq)]
    out = {r["path"]: r["n_walks"] for r in
           event_time.top_paths(_events(spark, rows)).collect()}
    assert out == {"a>b>a": 2, "b>a>b": 1}


# ---------------------------------------------------------------- leakage

def test_split_leakage_detects_cross_boundary_twin(spark):
    """Doc 5 (test: 5%5==0) is an exact twin of doc 1 (train): one
    exact cross pair, one near-dup cross pair, one contaminated test
    doc. A same-side twin (docs 2 and 3) never counts."""
    from kafka_streams_in_action_spark.operators import sampling
    body = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = _docs(spark, [
        (1, "s", body), (5, "s", body),           # cross-boundary twin
        (2, "s", "p q r s t u v w x y z a b"),
        (3, "s", "p q r s t u v w x y z a b"),    # same-side twin
        (10, "s", "unrelated words only here now indeed")])
    row = sampling.split_leakage_audit(docs).collect()[0]
    assert (row["n_train"], row["n_test"]) == (3, 2)
    assert row["n_exact_cross"] == 1
    assert row["n_neardup_cross"] >= 1
    assert row["n_test_contaminated"] == 1
    assert row["contamination_frac"] == 0.5


# -------------------------------------------------------------------- rrf

def test_rrf_union_semantics_and_integer_scores(spark):
    """A doc ranked #1 in both lists outscores a doc ranked #1 in only
    one; contributions are the exact integers floor(1e9/(60+r))."""
    from kafka_streams_in_action_spark.operators import text as t
    docs = _docs(spark, [
        (0, "s", "q1 q2 q3 q4"),                # the query doc
        (10, "s", "q1 q2 q3 q4 extra"),         # shares unigrams+bigrams
        (11, "s", "q4 q3 q2 q1"),               # unigrams only (reversed)
        (12, "s", "zz yy xx ww")])              # shares nothing
    out = {r["doc_id"]: r for r in t.rrf_fusion(docs, n_queries=1)
           .collect()}
    assert 12 not in out
    assert out[10]["rrf_scaled"] == 10 ** 9 // 61 + 10 ** 9 // 61
    assert out[11]["rrf_scaled"] == 10 ** 9 // 62  # rank 2 uni, no bigram
    assert out[10]["rank"] == 1 and out[11]["rank"] == 2


# ------------------------------------------------------------ event study

def test_event_study_windows_exclude_anchor_day(spark):
    """Purchase on day 10: value ON day 10 counts in neither window;
    days 3-9 are pre, days 11-17 are post."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [
        (1, 1, 5 * 1440, "view", 2.0),        # day 5  → pre
        (2, 1, 10 * 1440, "purchase", 99.0),  # day 10 → anchor, excluded
        (3, 1, 12 * 1440, "view", 6.0),       # day 12 → post
        (4, 1, 20 * 1440, "view", 50.0),      # day 20 → outside
    ]
    row = event_time.event_study(_events(spark, rows)).collect()[0]
    assert row["pre_milli"] == 2000
    assert row["post_milli"] == 6000
    assert row["lift"] == 3.0


def test_event_study_excludes_empty_pre_window(spark):
    """A user who converts with NO prior-week activity is excluded —
    no divide-by-zero row, no fabricated infinite lift."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(1, 1, 0, "purchase", 1.0), (2, 1, 1440, "view", 5.0)]
    assert event_time.event_study(_events(spark, rows)).count() == 0


# ------------------------------------------------------------- bitemporal

def test_bitemporal_retroactive_fix_changes_past_valid_day(spark):
    """event_id 3 (ts Jan 12) has eff_day Jan 12 (3%3=0); event_id 4
    (ts Jan 13) corrects eff_day Jan 12 retroactively? No — 4%3=1 → eff
    Jan 12. At (tx Jan 15, valid Jan 14) the winner per key is the one
    with the latest effective day, tx breaking ties — so the later
    transaction wins the shared effective day."""
    from kafka_streams_in_action_spark.operators import relational
    rows = [
        (3, 1, 11 * 1440, "view", 1.0),   # tx Jan 12, eff Jan 12
        (4, 1, 12 * 1440, "view", 2.0),   # tx Jan 13, eff Jan 12
    ]
    out = {(str(r["tx_cut"]), str(r["valid_day"])): r
           for r in relational.bitemporal_read(
               _events(spark, rows)).collect()}
    r = out[("2024-01-15", "2024-01-14")]
    assert r["state_value_milli"] == 2000  # the later tx won the tie


def test_bitemporal_tx_cut_hides_future_knowledge(spark):
    """A correction transacted AFTER the tx cut must not affect the
    read even though its effective day qualifies."""
    from kafka_streams_in_action_spark.operators import relational
    rows = [
        (3, 1, 5 * 1440, "view", 1.0),    # tx Jan 6, eff Jan 6
        (6, 1, 19 * 1440, "view", 9.0),   # tx Jan 20, eff Jan 20 → only
                                          # visible at the Jan 25 cut
    ]
    out = {(str(r["tx_cut"]), str(r["valid_day"])): r
           for r in relational.bitemporal_read(
               _events(spark, rows)).collect()}
    assert out[("2024-01-15", "2024-01-10")]["state_value_milli"] == 1000
    assert out[("2024-01-25", "2024-01-10")]["state_value_milli"] == 1000


# ------------------------------------------------------------------ lttb

def test_lttb_short_series_returns_all_points(spark):
    """n <= k: no downsampling, every point kept in order."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(d, 1, d * 1440, "t", float(d + 1)) for d in range(6)]
    out = event_time.lttb_downsample(_events(spark, rows)).collect()
    assert len(out) == 6
    assert [r["sel_order"] for r in sorted(out, key=lambda r:
            r["sel_order"])] == list(range(1, 7))


def test_lttb_keeps_the_spike(spark):
    """A lone spike in a flat 30-day series must be among the selected
    points — the property decimation loses and LTTB exists for."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = []
    for d in range(30):
        v = 500.0 if d == 17 else 1.0
        rows.append((d, 1, d * 1440, "t", v))
    out = event_time.lttb_downsample(_events(spark, rows)).collect()
    spike_day = (dt.date(2024, 1, 18) - dt.date(1995, 1, 1)).days
    assert any(r["x_day"] == spike_day for r in out)
    assert len(out) == 10
    orders = sorted(r["sel_order"] for r in out)
    assert orders == list(range(1, 11))


# -------------------------------------------------------------- clipping

def test_clipping_matches_sample_formula(spark):
    """Kernel counts equal a direct replay of the synth sample formula
    through |s| >= 900."""
    from kafka_streams_in_action_spark.operators import multimodal
    docs = _docs(spark, [(3, "s", "hello there world")])
    media = multimodal.to_audio_media(docs)
    row = multimodal.clipping_stats(media).collect()[0]
    n = multimodal._wav_n_samples(3, len("hello there world".encode()))
    hot = sum(1 for i in range(n)
              if abs((3 * 13 + i * 29) % 2048 - 1024) >= 900)
    peak = max(abs((3 * 13 + i * 29) % 2048 - 1024) for i in range(n))
    assert (row["n_samples"], row["n_hot"], row["peak_abs"]) \
        == (n, hot, peak)
    assert row["hot_frac"] == hot / n


# ---------------------------------------------------------------- merkle

def test_merkle_clean_snapshots_flag_nothing(spark):
    """No id divisible by 101 or 103: the snapshots are identical, no
    bucket is flagged, and the drill touches ZERO rows — the whole
    point of fingerprint-first reconciliation."""
    from kafka_streams_in_action_spark.operators import relational
    ev = _events(spark, [(i, 1, i, "t", 1.0) for i in range(1, 100)])
    row = relational.merkle_diff(ev).collect()[0]
    assert row["n_buckets_differing"] == 0
    assert row["n_rows_checked"] == 0
    assert row["n_true_diff"] == 0 and row["drill_complete"] is True


def test_merkle_single_mutation_drills_one_bucket(spark):
    """One dropped id (202 = 2·101): exactly its bucket (202 % 64) is
    flagged and only that bucket's rows are row-diffed."""
    from kafka_streams_in_action_spark.operators import relational
    ids = [i for i in range(1, 100) if i % 101 and i % 103] + [202]
    ev = _events(spark, [(i, 1, i % 500, "t", 1.0) for i in ids])
    row = relational.merkle_diff(ev).collect()[0]
    assert row["n_buckets_differing"] == 1
    expected_bucket_rows = sum(1 for i in ids if i % 64 == 202 % 64)
    # the dropped row exists only in snapshot 1, so checked = rows of
    # that bucket in snap1 (202 included) joined with snap2's
    assert row["n_rows_checked"] == expected_bucket_rows
    assert row["n_rows_differing"] == 1 == row["n_true_diff"]
    assert row["drill_complete"] is True


# --------------------------------------------------------------- streaks

def test_streaks_splits_on_gap_and_tracks_last(spark):
    """Active days 1,2,3, 7,8: longest streak 3, the LAST streak is the
    2-day run, and the user is alive at corpus end (their last day IS
    the corpus's last day)."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(i, 1, d * 1440, "t", 1.0)
            for i, d in enumerate([1, 2, 3, 7, 8])]
    row = event_time.activity_streaks(_events(spark, rows)).collect()[0]
    assert (row["n_active_days"], row["longest_streak"],
            row["last_streak"]) == (5, 3, 2)
    assert row["alive_at_end"] is True


def test_streaks_dead_user_not_alive_at_end(spark):
    """User 2 stops a week before user 1's last day: alive_at_end is
    False for 2, True for 1."""
    from kafka_streams_in_action_spark.operators import event_time
    rows = [(1, 1, 20 * 1440, "t", 1.0),
            (2, 2, 10 * 1440, "t", 1.0)]
    out = {r["user_id"]: r for r in
           event_time.activity_streaks(_events(spark, rows)).collect()}
    assert out[1]["alive_at_end"] is True
    assert out[2]["alive_at_end"] is False
