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
