"""Round-8 operator behavior tests: record linkage, paragraph dedup,
k-hop reachability, Holt smoothing (batch + streaming state carry),
rate limiting (batch + streaming hour rollover), systematic sampling,
basket affinity, VAD segmentation, Gini, chi-square, interpolation.

Oracle parity for every registered row is covered by tests/test_oracle.py
(now bit-exact on floats); these pin the BEHAVIORAL contracts the
oracles can't express (tie-breaks, state durability across micro-batch
boundaries, degenerate inputs).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import (
    dedup, event_time, graph, joins, linkage, relational, sampling,
    windows,
)


TS0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _events(spark, rows):
    """rows = [(event_id, user_id, minutes_offset, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(minutes=m), u, "t", v, "{}")
         for e, u, m, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


# -------------------------------------------------------------- linkage

def test_linkage_tie_breaks_on_lowest_custkey(spark):
    """Two clean candidates with identical edit distance and cent delta:
    the assignment must pick the lower custkey, deterministically."""
    cust = spark.createDataFrame(
        [(3, "Customer#000000003", 1, 10.00, "AUTO"),
         (7, "Customer#000000003", 1, 10.00, "AUTO")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    out = linkage.link_records(cust).collect()
    # dirty twin exists only for custkey 3 (3 % 3 == 0); both cleans are
    # equally good matches (same name, same cents → same edit/delta)
    assert len(out) == 1
    assert out[0]["dirty_id"] == 3 and out[0]["matched_custkey"] == 3
    assert out[0]["correct"] is True


def test_linkage_blocking_respects_segment(spark):
    """A byte-identical record in a different segment is NOT a candidate
    (blocking is semantic, not just physical)."""
    cust = spark.createDataFrame(
        [(3, "Customer#000000003", 1, 10.00, "AUTO"),
         (4, "Customer#000000003", 1, 10.00, "HOUSE")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    out = linkage.link_records(cust).collect()
    assert len(out) == 1 and out[0]["matched_custkey"] == 3


# -------------------------------------------------------- paragraph dedup

def test_paragraph_dedup_keeps_first_and_empties_consumed_docs(spark):
    docs = spark.createDataFrame(
        [(1, "aaa the bbb", "en", "s", 11),
         (2, "aaa the ccc", "en", "s", 11),
         (3, "aaa the bbb", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r["doc_id"]: r for r in dedup.paragraph_dedup(docs).collect()}
    assert out[1]["clean_text"] == "aaa the bbb" and out[1]["n_kept"] == 2
    assert out[2]["clean_text"] == "ccc" and out[2]["n_kept"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[3]["n_segs"] == 2


def test_paragraph_dedup_within_doc_duplicates(spark):
    """The same segment twice in ONE doc keeps only the first position."""
    docs = spark.createDataFrame(
        [(1, "xxx the xxx the yyy", "en", "s", 19)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = dedup.paragraph_dedup(docs).collect()[0]
    assert out["clean_text"] == "xxx the yyy"
    assert out["n_segs"] == 3 and out["n_kept"] == 2


# ------------------------------------------------------------- k-hop BFS

def test_khop_reachability_chain_hops(spark):
    """Chain r0 → a → b → c: hops climb 0,1,2,3 and the off-chain node
    never appears."""
    nation = spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 1), (2, "N2", 1), (3, "N3", 1),
         (9, "N9", 1)],
        "n_nationkey long, n_name string, n_regionkey long")
    cust = spark.createDataFrame(
        [(i, f"c{i}", n, 0.0, "A") for i, n in
         [(10, 0), (11, 1), (12, 2)]],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    supp = spark.createDataFrame(
        [(20, 1), (21, 2), (22, 3)],
        "s_suppkey long, s_nationkey long")
    orders = spark.createDataFrame(
        [(100, 10), (101, 11), (102, 12)],
        "o_orderkey long, o_custkey long")
    li = spark.createDataFrame(
        [(100, 20), (101, 21), (102, 22)],
        "l_orderkey long, l_suppkey long")
    out = {r["nationkey"]: r["hops"]
           for r in graph.khop_reachability(
               cust, orders, li, supp, nation).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


# ----------------------------------------------------------------- Holt

def test_holt_single_observation_is_its_own_level(spark):
    ev = _events(spark, [(1, 7, 0, 42.0)])
    row = windows.holt_smoothing(ev).collect()[0]
    assert row["level"] == 42.0 and row["trend"] == 0.0
    assert row["forecast"] == 42.0


def test_holt_linear_ramp_learns_the_slope(spark):
    """On a long exact ramp the trend converges to the step size."""
    ev = _events(spark, [(i, 1, i, float(i)) for i in range(40)])
    last = (windows.holt_smoothing(ev)
            .orderBy(F.desc("event_id")).limit(1).collect()[0])
    assert abs(last["trend"] - 1.0) < 1e-5
    assert abs(last["forecast"] - 40.0) < 1e-4


# ------------------------------------------------------------- throttle

def test_throttle_caps_within_hour_and_resets_on_rollover(spark):
    rows = [(i, 1, i, 1.0) for i in range(8)]          # 8 in hour one
    rows += [(100 + i, 1, 61 + i, 1.0) for i in range(3)]  # next hour
    ev = _events(spark, rows)
    out = event_time.rate_throttle(ev, limit=5).collect()
    admitted = sorted(r["event_id"] for r in out if r["admitted"])
    assert admitted == [0, 1, 2, 3, 4, 100, 101, 102]
    seqs = {r["event_id"]: r["seq"] for r in out}
    assert seqs[100] == 1  # rollover reset the counter


def test_throttle_stream_state_survives_batch_boundaries(spark, tmp_path):
    """Split one hour's events across 3 micro-batches: the streaming
    counter must continue (not reset) at each boundary to match batch."""
    from kafka_streams_in_action_spark.streaming.stateful import (
        rate_throttle_stream,
    )

    ev = _events(spark, [(i, 1, i, 1.0) for i in range(9)])
    src = str(tmp_path / "src")
    for lo, hi in [(0, 3), (3, 6), (6, 9)]:
        (ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
         .coalesce(1).write.mode("append").parquet(src))
    q = (rate_throttle_stream(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1).parquet(src))
         .writeStream.format("memory").queryName("thr8")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = {r["event_id"]: r["seq"]
           for r in spark.table("thr8").collect()}
    assert got == {i: i + 1 for i in range(9)}


# -------------------------------------------------------------- sampling

def test_systematic_sample_is_weight_proportional(spark):
    """One doc holding half the total weight takes ~half the k picks."""
    docs = spark.createDataFrame(
        [(0, "t", "en", "s", 1000)] + [
            (i, "t", "en", "s", 20) for i in range(1, 51)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = sampling.systematic_sample(docs, k=50).collect()
    assert len(out) == 50
    assert len({r["pick_idx"] for r in out}) == 50
    big = sum(1 for r in out if r["doc_id"] == 0)
    assert big == 25  # 1000 / 2000 of the axis at stride 40


# ---------------------------------------------------------------- basket

def test_basket_affinity_lift_by_hand(spark):
    """3 orders: {1,2}, {1,2}, {1,3} → pair (1,2): n_co=2, n_1=3, n_2=2,
    N=3 → support 2/3, confidence 2/3, lift (2/3)·(3/2) = 1.0."""
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)],
        "l_orderkey long, l_partkey long")
    out = joins.basket_affinity(li, min_co=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"], r["n_co"]) == (1, 2, 2)
    assert abs(r["confidence"] - 2.0 / 3.0) < 1e-15
    assert abs(r["lift"] - 1.0) < 1e-15


# -------------------------------------------------------------- chi-square

def test_chisq_uniform_contingency_has_zero_terms(spark):
    """A perfectly balanced type × weekday table is exactly independent:
    every term must be 0 nano-units."""
    rows, eid = [], 0
    for d in range(7):
        for t in ("a", "b"):
            for _ in range(3):
                rows.append((eid, dt.datetime(2024, 1, 1 + d, 12, 0),
                             1, t, 1.0, "{}"))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = relational.chisq_independence(ev).collect()
    assert len(out) == 14
    assert all(r["term_nano"] == 0 for r in out)
    assert all(r["expected"] == 3.0 for r in out)


# ------------------------------------------------------------------ Gini

def test_gini_equal_balances_is_zero_and_concentrated_matches_hand(spark):
    """Equal balances → G = 0 exactly. For the concentrated segment the
    operator's documented +$1000 nonnegativity shift applies (TPC-H
    acctbal lower bound is -999.99), so the hand-computed expectation is
    over shifted cents: 9 × 100000 and 1 × 1000000 →
    G = 2·14.5e6/(10·1.9e6) − 11/10."""
    cust = spark.createDataFrame(
        [(i, f"c{i}", 1, 100.0, "EQ") for i in range(10)]
        + [(100 + i, f"d{i}", 1, 0.0, "CONC") for i in range(9)]
        + [(199, "rich", 1, 9000.0, "CONC")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    out = {r["segment"]: r["gini"]
           for r in relational.gini_by_segment(cust).collect()}
    assert abs(out["EQ"]) < 1e-12
    expected = 2.0 * 14_500_000 / (10 * 1_900_000) - 11 / 10
    assert abs(out["CONC"] - expected) < 1e-12


# ------------------------------------------------------------------ VAD

def test_vad_no_active_frames_emits_nothing(spark):
    """All-zero PCM never clears the energy threshold."""
    import struct as st

    silent = (b"RIFF" + st.pack("<I", 36 + 256) + b"WAVE"
              + b"fmt " + st.pack("<I", 16)
              + st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
              + b"data" + st.pack("<I", 256) + b"\x00" * 256)
    from kafka_streams_in_action_spark.operators.multimodal import (
        vad_segments,
    )
    media = spark.createDataFrame([(1, bytearray(silent))],
                                  "doc_id long, payload binary")
    assert vad_segments(media).count() == 0


# ---------------------------------------------------------- interpolation

def test_interp_fills_the_gap_linearly(spark):
    """Observed closes 10.0 (day 0) and 16.0 (day 3): gap days must read
    12.0 and 14.0, flagged unobserved."""
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12), 1, "t", 10.0, "{}"),
         (2, dt.datetime(2024, 1, 4, 12), 1, "t", 16.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = {str(r["day"]): (r["value"], r["observed"])
           for r in event_time.resample_daily_interp(ev).collect()}
    assert out["2024-01-01"] == (10.0, True)
    assert out["2024-01-02"] == (12.0, False)
    assert out["2024-01-03"] == (14.0, False)
    assert out["2024-01-04"] == (16.0, True)


# ------------------------------------------------------------------- MMR

def test_mmr_first_pick_is_top_relevance_and_diversity_demotes(spark):
    """pick 1 = highest-relevance candidate; a near-clone of pick 1 is
    demoted below a less-relevant but diverse candidate."""
    import math

    def vec(theta):
        return [math.cos(theta), math.sin(theta)] + [0.0] * 6

    rows = [(0, vec(0.0), 0)]            # the query
    rows += [(10, vec(-0.1), 1),         # most relevant
             (11, vec(-0.2), 1),         # same side: redundant with 10
             (12, vec(0.5), 1)]          # other side: diverse
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int")
    from kafka_streams_in_action_spark.operators.similarity import (
        mmr_rerank,
    )
    out = {r["pick"]: r["neighbor_id"]
           for r in mmr_rerank(emb, n_queries=1, n_cand=3, k=3).collect()}
    assert out[1] == 10          # top relevance first
    assert out[2] == 12          # diversity beats the clone
    assert out[3] == 11


# ----------------------------------------------------------------- merge

def test_merge_delete_wins_and_insert_lands(spark):
    base = spark.createDataFrame(
        [(3, 1, "O", 100.0, TS0, "1-URGENT"),      # %11==3 → delete
         (21, 1, "O", 100.0, TS0, "1-URGENT"),     # %7==0 → update
         (1, 2, "O", 50.0, TS0, "1-URGENT"),       # %1000==1 → insert src
         (5, 2, "O", 10.0, TS0, "1-URGENT")],      # untouched
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    out = {r["o_orderkey"]: r
           for r in relational.merge_changes(base).collect()}
    assert 3 not in out                      # deleted
    assert out[21]["op"] == "U" and out[21]["o_totalprice"] == 110.0
    assert out[20000001]["op"] == "I"
    assert out[20000001]["o_orderstatus"] == "N"
    assert out[5]["op"] == "K" and out[1]["op"] == "K"


def test_merge_delete_beats_update_on_overlap(spark):
    # orderkey 14 is %7==0; 36 is %7==0 and... pick 77: %7==0, %11==0 →
    # update; 14: %7==0, %11==3 → DELETE must win
    base = spark.createDataFrame(
        [(14, 1, "O", 100.0, TS0, "p"),
         (77, 1, "O", 100.0, TS0, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    out = {r["o_orderkey"]: r
           for r in relational.merge_changes(base).collect()}
    assert 14 not in out
    assert out[77]["op"] == "U"


# ----------------------------------------------------------------- dwell

def test_dwell_gaps_by_hand(spark):
    """Gaps 1m, 3m, 5m → median 3m, mean 3m, min 1m, max 5m."""
    ev = _events(spark, [(1, 1, 0, 1.0), (2, 1, 1, 1.0),
                         (3, 1, 4, 1.0), (4, 1, 9, 1.0)])
    row = event_time.dwell_stats(ev).collect()[0]
    assert row["n_gaps"] == 3
    assert row["min_gap_us"] == 60_000_000
    assert row["max_gap_us"] == 300_000_000
    assert row["median_gap_us"] == 180_000_000
    assert row["mean_gap_us"] == 180_000_000.0


# -------------------------------------------------------- temporal split

def test_temporal_split_cuts_at_day_and_guards_leakage(spark):
    """10 events over 10 days → the 80% cut keeps days 1-8 in train."""
    ev = _events(spark, [(i, 1, i * 24 * 60, 1.0) for i in range(10)])
    row = sampling.temporal_split(ev).collect()[0]
    assert row["n_train"] == 8 and row["n_test"] == 2
    assert row["no_leakage"] is True


# ------------------------------------------------------------------- WAP

def test_wap_failing_audit_never_publishes(spark, tmp_path):
    """A duplicate key in the batch must fail the audit: nothing lands
    in the serving location and the staged files survive for
    inspection."""
    import os

    from kafka_streams_in_action_spark.operators.layout import wap_publish

    ev = _events(spark, [(1, 1, 0, 1.0), (2, 1, 1, 2.0)])
    dup = ev.unionAll(ev.filter(F.col("event_id") == 1))
    base = str(tmp_path / "wap")
    row = wap_publish(spark, dup, base).collect()[0]
    assert row["audit_pass"] is False and row["published"] is False
    assert row["readback_complete"] is False and row["n_rows"] == 0
    assert os.path.exists(f"{base}/staged")
    assert not os.path.exists(f"{base}/published")


def test_wap_clean_batch_publishes_atomically(spark, tmp_path):
    import os

    from kafka_streams_in_action_spark.operators.layout import wap_publish

    ev = _events(spark, [(1, 1, 0, 1.0), (2, 1, 1, 2.0)])
    base = str(tmp_path / "wap_ok")
    row = wap_publish(spark, ev, base).collect()[0]
    assert row["audit_pass"] and row["published"]
    assert row["readback_complete"] and row["n_rows"] == 2
    assert not os.path.exists(f"{base}/staged")   # renamed away
    assert os.path.exists(f"{base}/published")


# -------------------------------------------------------------- survival

def test_km_survival_is_monotone_and_hand_checked(spark):
    """3 users churned at durations 0,0,1; 1 censored at 1 (active at
    corpus end): S after t=0 is (1 - 2/4) = 0.5; at t=1 the at-risk set
    is 2 with 1 event → S = 0.5 * 0.5 = 0.25."""
    rows = [(1, 1, 0, 1.0),                       # user 1: dur 0, churned
            (2, 2, 0, 1.0),                       # user 2: dur 0, churned
            (3, 3, 0, 1.0), (4, 3, 24 * 60, 1.0),  # user 3: dur 1, churned
            (5, 4, 30 * 24 * 60, 1.0),            # user 4: dur 1, active
            (6, 4, 31 * 24 * 60, 1.0)]
    ev = _events(spark, rows)
    out = {r["dur_days"]: r
           for r in event_time.km_survival(ev).collect()}
    assert out[0]["n_risk"] == 4 and out[0]["n_events"] == 2
    assert abs(out[0]["survival"] - 0.5) < 1e-15
    assert out[1]["n_risk"] == 2 and out[1]["n_events"] == 1
    assert out[1]["n_censored"] == 1
    assert abs(out[1]["survival"] - 0.25) < 1e-15


# ------------------------------------------------------------------ OHLC

def test_ohlc_bar_by_hand(spark):
    ev = _events(spark, [(1, 1, 0, 5.0), (2, 1, 10, 9.0),
                         (3, 1, 20, 2.0), (4, 1, 30, 7.0)])
    row = event_time.ohlc_bars(ev).collect()[0]
    assert (row["open"], row["high"], row["low"], row["close"]) == \
        (5.0, 9.0, 2.0, 7.0)
    assert row["volume"] == 4 and row["turnover"] == 23.0


# ------------------------------------------------------------------- MAD

def test_mad_flags_the_obvious_outlier(spark):
    vals = [10.0] * 5 + [10.5] * 5 + [9.5] * 5 + [1000.0]
    ev = _events(spark, [(i, 1, i, v) for i, v in enumerate(vals)])
    row = relational.mad_outlier_stats(ev).collect()[0]
    assert row["med_milli"] == 10000
    assert row["mad_milli"] == 500
    assert row["n_outliers"] == 1


# ----------------------------------------------------------------- xcorr

def test_xcorr_proportional_series_is_perfectly_correlated(spark):
    """Type b's daily totals are exactly 2x type a's → r = 1 at lag 0."""
    rows = []
    eid = 0
    for day in range(6):
        v = float(10 + day * 3)
        rows.append((eid, dt.datetime(2024, 1, 1 + day, 12), 1,
                     "a", v, "{}")); eid += 1
        rows.append((eid, dt.datetime(2024, 1, 1 + day, 13), 1,
                     "b", 2 * v, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["lag"]: r["r"]
           for r in event_time.daily_xcorr(ev).collect()}
    assert abs(out[0] - 1.0) < 1e-12
