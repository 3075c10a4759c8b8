"""Testdata physical-layout contract (the r3 regression class).

The driver regenerates /root/testdata between rounds and has already shipped
events.ts under two different parquet physical types (TIMESTAMP(NANOS) in
rounds 1-2, TIMESTAMP(MICROS) in round 3).  The loader probes the footer
(sources/parquet.py:_events_ts_is_nanos) instead of assuming a unit; these
tests pin the probe's observable contract so a future layout change fails
loudly here rather than as a silent 1000x timestamp compression in every
ts-dependent query.
"""

from __future__ import annotations

import datetime

from kafka_streams_in_action_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_events_ts_matches_duckdb(spark, duck):
    """min/max/count of ts must agree byte-for-byte with DuckDB's read of the
    same parquet — whichever physical unit the driver generated."""
    ev = load_table(spark, "events", SF_DIR)
    s_min, s_max, s_n = ev.selectExpr(
        "min(ts)", "max(ts)", "count(*)").first()
    d_min, d_max, d_n = duck.execute(
        "SELECT min(ts), max(ts), count(*) FROM events").fetchone()
    assert (s_min, s_max, s_n) == (d_min, d_max, d_n)


def test_events_ts_spans_days(spark):
    """A unit mix-up divides or multiplies every timestamp by 1000, collapsing
    the generated ~30-day range to minutes (or exploding it to decades); a
    plausible event-stream span is the cheap invariant that catches both."""
    ev = load_table(spark, "events", SF_DIR)
    s_min, s_max = ev.selectExpr("min(ts)", "max(ts)").first()
    span = s_max - s_min
    assert datetime.timedelta(days=1) < span < datetime.timedelta(days=3650), span
