"""Differential tests for the round-8 recurrences and selections: each
operator's arithmetic is replayed in pure Python on seeded random
inputs and must agree with the Spark output EXACTLY — the same proofs
the DuckDB oracles assert, but against an independent third
implementation and on adversarial shapes the fixed testdata doesn't
contain (ties, all-duplicate corpora, giant single weights, hour
boundaries)."""

from __future__ import annotations

import datetime as dt
import random

from kafka_streams_in_action_spark.operators import (
    dedup, event_time, sampling, windows,
)

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events_df(spark, rows):
    """rows = [(event_id, user_id, seconds_offset, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(seconds=s), u, "t", v, "{}")
         for e, u, s, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def test_holt_matches_python_replay(spark):
    """Random per-user series incl. negatives and repeated timestamps:
    the Spark kernel's doubles equal a pure-Python replay bit-for-bit."""
    rnd = random.Random(7)
    rows = []
    eid = 0
    for u in range(4):
        t = 0
        for _ in range(rnd.randint(1, 25)):
            t += rnd.randint(0, 5)  # allows duplicate timestamps
            rows.append((eid, u, t,
                         rnd.uniform(-50, 50)))
            eid += 1
    got = {(r["user_id"], r["event_id"]):
           (r["level"], r["trend"], r["forecast"])
           for r in windows.holt_smoothing(
               _events_df(spark, rows)).collect()}

    series = {}
    for e, u, s, v in sorted(rows, key=lambda r: (r[2], r[0])):
        series.setdefault(u, []).append((e, v))
    want = {}
    for u, obs in series.items():
        lev, trd = None, 0.0
        for i, (e, x) in enumerate(obs):
            if i == 0:
                lev, trd = x, 0.0
            else:
                l_new = 0.5 * x + 0.5 * (lev + trd)
                trd = 0.5 * (l_new - lev) + 0.5 * trd
                lev = l_new
            want[(u, e)] = (lev, trd, lev + trd)
    assert got == want


def test_holt_carries_state_across_arrow_batch_boundaries(spark):
    """Optimization r14 pin: the MapInPandas kernel walks each partition
    in (user, ts, event_id) order and must CARRY (level, trend) across
    Arrow batch boundaries — with maxRecordsPerBatch forced tiny, every
    user's series straddles several batches, and the doubles must still
    equal the pure-Python replay bit-for-bit."""
    rnd = random.Random(13)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(50):  # 50-row series vs 3-row Arrow batches
            t += rnd.randint(0, 5)
            rows.append((eid, u, t, rnd.uniform(-50, 50)))
            eid += 1
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        got = {(r["user_id"], r["event_id"]):
               (r["level"], r["trend"], r["forecast"])
               for r in windows.holt_smoothing(
                   _events_df(spark, rows)).collect()}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)

    series = {}
    for e, u, s, v in sorted(rows, key=lambda r: (r[2], r[0])):
        series.setdefault(u, []).append((e, v))
    want = {}
    for u, obs in series.items():
        lev, trd = None, 0.0
        for i, (e, x) in enumerate(obs):
            if i == 0:
                lev, trd = x, 0.0
            else:
                l_new = 0.5 * x + 0.5 * (lev + trd)
                trd = 0.5 * (l_new - lev) + 0.5 * trd
                lev = l_new
            want[(u, e)] = (lev, trd, lev + trd)
    assert got == want


def test_throttle_matches_python_replay_across_hour_edges(spark):
    """Events placed AT hour boundaries: seq resets exactly on the
    boundary and the admitted set equals the replay."""
    rnd = random.Random(11)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(40):
            # jumps that frequently land exactly on the hour
            t += rnd.choice([1, 60, 3599, 3600, 7200])
            rows.append((eid, u, t, 1.0))
            eid += 1
    got = {r["event_id"]: (r["hour_us"], r["seq"], r["admitted"])
           for r in event_time.rate_throttle(
               _events_df(spark, rows), limit=5).collect()}

    want = {}
    per_user = {}
    for e, u, s, v in sorted(rows, key=lambda r: (r[2], r[0])):
        us = (int(TS0.replace(tzinfo=dt.timezone.utc).timestamp())
              + s) * 1_000_000
        hour = us - us % 3_600_000_000
        h0, c = per_user.get(u, (None, 0))
        c = c + 1 if hour == h0 else 1
        per_user[u] = (hour, c)
        want[e] = (hour, c, c <= 5)
    assert got == want


def test_systematic_sample_matches_python_replay(spark):
    """Random weights incl. one giant doc: picks equal the pure-Python
    grid walk, and the giant doc receives a proportional share."""
    rnd = random.Random(13)
    weights = [rnd.randint(1, 40) for _ in range(60)]
    weights[17] = 2000  # dominates the axis
    docs = spark.createDataFrame(
        [(i, "t", "en", "s", w) for i, w in enumerate(weights)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r["pick_idx"]: r["doc_id"]
           for r in sampling.systematic_sample(docs, k=50).collect()}

    total = sum(weights)
    stride = max(1, total // 50)
    off = stride // 2
    want, start = {}, 0
    for i, w in enumerate(weights):
        for j in range(50):
            g = off + j * stride
            if start <= g < start + w:
                want[j] = i
        start += w
    assert got == want
    assert sum(1 for d in got.values() if d == 17) >= 1


def test_paragraph_dedup_is_idempotent(spark):
    """Running paragraph dedup on its own cleaned output changes nothing:
    every kept segment is globally unique by construction."""
    rnd = random.Random(17)
    segs = ["alpha beta", "gamma", "delta eps", "zeta", "eta theta"]
    docs = []
    for i in range(12):
        parts = [rnd.choice(segs) for _ in range(rnd.randint(1, 4))]
        text = " the ".join(parts)
        docs.append((i, text, "en", "s", len(text)))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    once = dedup.paragraph_dedup(df)
    cleaned = once.selectExpr(
        "doc_id", "clean_text AS text", "'en' AS lang", "'s' AS source",
        "length(clean_text) AS n_chars").filter("text <> ''")
    twice = dedup.paragraph_dedup(cleaned)
    a = {r["doc_id"]: r["clean_text"] for r in once.collect()
         if r["clean_text"] != ""}
    b = {r["doc_id"]: r["clean_text"] for r in twice.collect()}
    assert a == b
