"""Round-13 operator behavior tests — the prove-it-detects contracts of
the privacy audits (C40), feature encoders (C42), and the six family
addenda registered this round.

Oracle parity for every registered row is covered by tests/test_oracle.py;
these pin the behavioral contracts the oracles can't express."""

from __future__ import annotations

import datetime as dt
import struct

import pytest
from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import (
    event_time, features, graph, joins, multimodal, privacy, similarity,
    text, windows,
)

TS0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _customers(spark, rows):
    """rows: (custkey, name, nationkey, acctbal, segment)"""
    return spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, "
              "c_acctbal double, c_mktsegment string")


def _orders(spark, rows):
    """rows: (orderkey, custkey, status, totalprice, orderdate, prio)"""
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")


def _daily_events(spark, counts_by_day, etype="view"):
    """counts_by_day: list of per-day event counts starting at TS0."""
    rows, eid = [], 0
    for d, n in enumerate(counts_by_day):
        for j in range(n):
            rows.append((eid, TS0 + dt.timedelta(days=d, minutes=j),
                         1, etype, 1.0, "{}"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


# ------------------------------------------------------------- privacy

def test_kanon_flags_small_classes(spark):
    """One QI class of size 2 (< k=5) must surface as weak with its rows
    at risk; a size-6 class must not."""
    cust = _customers(spark, [
        # six twins in (nation 1, AUTO, band 0)
        *[(i, f"c{i}", 1, 100.0, "AUTO") for i in range(6)],
        # two in (nation 2, AUTO, band 0) — below k
        (10, "x", 2, 100.0, "AUTO"), (11, "y", 2, 100.0, "AUTO"),
    ])
    row = privacy.k_anonymity_audit(cust, k=5).collect()[0]
    assert row.segment == "AUTO"
    assert row.n_classes == 2
    assert row.k_min == 2
    assert row.n_weak_classes == 1
    assert row.rows_at_risk == 2
    assert not row.k_anonymous


def test_kanon_bands_negative_balances_downward(spark):
    """-10.00 must band to -1 (floor), not 0 (truncation) — else two
    distinct balances straddling zero merge into one class."""
    cust = _customers(spark, [
        (1, "a", 1, -10.0, "AUTO"), (2, "b", 1, 10.0, "AUTO")])
    row = privacy.k_anonymity_audit(cust, k=1).collect()[0]
    assert row.n_classes == 2  # the two balances are different bands


def test_ldiversity_homogeneous_class_fires(spark):
    """A class whose orders all share one priority leaks the sensitive
    value: l_min = 1 and the class is counted weak."""
    cust = _customers(spark, [
        (1, "a", 1, 0.0, "AUTO"), (2, "b", 2, 0.0, "AUTO")])
    orders = _orders(spark, [
        # nation-1 class: one priority only
        (1, 1, "O", 10.0, TS0, "1-URGENT"),
        (2, 1, "O", 10.0, TS0, "1-URGENT"),
        (3, 1, "O", 10.0, TS0, "1-URGENT"),
        # nation-2 class: three distinct priorities
        (4, 2, "O", 10.0, TS0, "1-URGENT"),
        (5, 2, "O", 10.0, TS0, "2-HIGH"),
        (6, 2, "O", 10.0, TS0, "3-MEDIUM"),
    ])
    row = privacy.l_diversity_audit(cust, orders, l_floor=3).collect()[0]
    assert row.l_min == 1
    assert row.n_weak_classes == 1
    assert row.rows_in_weak == 3
    assert not row.l_diverse


def test_generalization_ladder_is_monotone(spark):
    nation = spark.createDataFrame(
        [(i, f"N{i}", i % 2) for i in range(4)],
        "n_nationkey long, n_name string, n_regionkey long")
    cust = _customers(spark, [
        (i, f"c{i}", i % 4, float((i % 7) * 900), "AUTO")
        for i in range(40)])
    rows = {r.level: r for r in
            privacy.generalization_ladder(cust, nation, k=5).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].k_min <= rows[1].k_min <= rows[2].k_min
    assert rows[0].rows_at_risk >= rows[2].rows_at_risk
    assert all(r.monotone for r in rows.values())


# ------------------------------------------------------------ pii scan

def test_pii_scan_counts_planted_contacts(spark):
    docs = spark.createDataFrame(
        [(35, "plain text here", "en", "web", 15),
         (36, "no pii at all", "en", "web", 13)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r.doc_id: r for r in text.pii_scan(docs).collect()}
    # doc 35 ≡ 0 mod 5 AND mod 7 → email + phone planted
    assert out[35].n_emails == 1 and out[35].n_phones == 1
    assert out[36].n_emails == 0 and out[36].n_phones == 0
    # scrub replaced, never dropped: [EMAIL]/[PHONE] appear in length
    assert out[36].scrubbed_len == len("no pii at all")


def test_pii_scan_detects_preexisting_email(spark):
    addr = "alice.b@corp.example.org"
    body = f"mail me at {addr} today"
    docs = spark.createDataFrame(
        [(1, body, "en", "w", len(body))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    row = text.pii_scan(docs).collect()[0]
    assert row.n_emails == 1
    # "[EMAIL]" replaces the whole address, nothing else moves
    assert row.scrubbed_len == len(body) - len(addr) + len("[EMAIL]")


# ---------------------------------------------------- feature encoders

def test_target_encode_shrinks_rare_segment_toward_global(spark):
    cust = _customers(spark, [
        (1, "a", 1, 0.0, "BIG"), (2, "b", 1, 0.0, "RARE")])
    orders = _orders(spark, [
        *[(i, 1, "O", 100.0, TS0, "p") for i in range(200)],
        (900, 2, "O", 10000.0, TS0, "p"),
    ])
    out = {r.segment: r for r in
           features.target_encode(orders, cust, m=100).collect()}
    raw_rare, enc_rare = (out["RARE"].raw_mean_cents,
                          out["RARE"].encoded_mean_cents)
    g_mean = (200 * 10000 + 1000000) / 201  # cents
    # the 1-order segment shrinks hard toward the global mean
    assert abs(enc_rare - g_mean) < abs(raw_rare - g_mean) * 0.05
    assert out["RARE"].shrinkage_ppm == 100 * 1_000_000 // 101
    # the 200-order segment barely moves
    assert abs(out["BIG"].encoded_mean_cents
               - out["BIG"].raw_mean_cents) < 0.4 * abs(
                   out["BIG"].raw_mean_cents - g_mean) + 1e-9


def test_feature_hash_matches_reference_fnv(spark):
    """The bucket of a known word must equal the byte-level FNV-1a-32
    reference mod 64 — the census can't silently swap hash functions."""
    def fnv(s: str) -> int:
        h = 2166136261
        for b in s.encode():
            h = ((h ^ b) * 16777619) % 2**32
        return h

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha", "en", "w", 16)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r.bucket: r for r in
           features.feature_hash_census(docs).collect()}
    ba, bb = fnv("alpha") % 64, fnv("beta") % 64
    assert out[ba].n_tokens == (3 if ba == bb else 2)
    assert sum(r.n_tokens for r in out.values()) == 3
    assert sum(r.load_ppm for r in out.values()) <= 1_000_000


# --------------------------------------------------------------- bursts

def test_burst_detect_fires_on_planted_spike(spark):
    ev = _daily_events(spark, [10] * 9 + [30] + [10] * 3)
    row = event_time.burst_detect(ev).collect()[0]
    # day 9 spikes 3× the trailing mean (ratio 3000 > 1100)
    assert row.n_burst_days == 1
    assert row.first_burst_day == (TS0 + dt.timedelta(days=9)).date()
    assert row.max_ratio_milli == 30 * 7 * 1000 // 70
    # the 7 days before the spike and the 3 after it are eligible too
    assert row.n_eligible_days == 6


def test_burst_short_series_is_ineligible(spark):
    ev = _daily_events(spark, [10] * 5)
    row = event_time.burst_detect(ev).collect()[0]
    assert row.n_eligible_days == 0
    assert row.n_burst_days == 0
    assert row.first_burst_day is None


# ---------------------------------------------------------- allen census

def test_allen_census_classifies_crafted_pairs(spark):
    """Durations are orderkey%400+30 days, so orderkeys pick exact
    interval shapes: meets, overlaps, precedes, contains, equals."""
    d0 = dt.datetime(2020, 1, 1)

    def o(orderkey, custkey, day):
        return (orderkey, custkey, "O", 1.0,
                d0 + dt.timedelta(days=day), "p")

    orders = _orders(spark, [
        # cust 1: a=[0,30], b=[30,60] → meets  (orderkey 0 → dur 30)
        o(0, 1, 0), o(400, 1, 30),
        # cust 2: a=[0,30], b=[10,40] → overlaps
        o(800, 2, 0), o(1200, 2, 10),
        # cust 3: a=[0,30], b=[40,70] → precedes
        o(1600, 3, 0), o(2000, 3, 40),
        # cust 4: a=[0,130] (orderkey%400=100), b=[10,40] → contains
        (100, 4, "O", 1.0, d0, "p"), o(2400, 4, 10),
        # cust 5: equal intervals → equals
        o(2800, 5, 0), o(3200, 5, 0),
    ])
    cen = {r.relation: r for r in joins.allen_census(orders).collect()}
    assert cen["meets"].n_pairs == 1 and cen["meets"].min_gap_days == 0
    assert cen["overlaps"].n_pairs == 1
    assert cen["overlaps"].min_gap_days == -20
    assert cen["precedes"].n_pairs == 1
    assert cen["precedes"].min_gap_days == 10
    assert cen["contains"].n_pairs == 1
    assert cen["equals"].n_pairs == 1
    assert sum(r.n_pairs for r in cen.values()) == 5
    assert sum(r.share_ppm for r in cen.values()) == 1_000_000


# -------------------------------------------------------- eccentricity

def test_eccentricity_on_a_path_graph(spark):
    nation = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0), (2, "C", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 5)], "src long, dst long, w long")
    out = {r.nationkey: r for r in graph.eccentricity_trade(
        None, None, None, None, nation, edges=edges).collect()}
    assert out[0].ecc == 2 and out[0].n_reachable == 3
    assert out[1].ecc == 1 and out[2].ecc == 0
    assert out[0].diameter == 2 and out[0].radius == 0
    assert out[0].is_peripheral and out[2].is_central


# ------------------------------------------------------------ runs test

def test_runs_test_alternating_series_maximizes_runs(spark):
    # daily sums alternate up/down → every delta flips sign
    ev = _daily_events_values(spark, [1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0])
    row = windows.runs_test(ev).collect()[0]
    assert row.n_up == 3 and row.n_down == 3
    assert row.runs == 6  # 6 deltas, all sign changes
    assert row.expected_runs == 1.0 + 2 * 3 * 3 / 6
    assert row.runs_z is not None and row.runs_z > 0


def test_runs_test_monotone_series_is_one_run(spark):
    ev = _daily_events_values(spark, [1.0, 2.0, 3.0, 4.0, 5.0])
    row = windows.runs_test(ev).collect()[0]
    assert row.n_up == 4 and row.n_down == 0
    assert row.runs == 1
    assert row.runs_z is None  # degenerate variance → NULL, not a crash


def _daily_events_values(spark, values, etype="view"):
    return spark.createDataFrame(
        [(i, TS0 + dt.timedelta(days=i), 1, etype, float(v), "{}")
         for i, v in enumerate(values)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


# ------------------------------------------------------------------ sla

def test_sla_charges_only_excess_over_threshold(spark):
    rows = [(0, TS0, 1, "view", 1.0, "{}"),
            (1, TS0 + dt.timedelta(hours=2), 1, "view", 1.0, "{}"),
            (2, TS0 + dt.timedelta(hours=2, minutes=30), 1, "view",
             1.0, "{}")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    row = event_time.sla_report(ev, threshold_s=3600).collect()[0]
    assert row.n_gaps == 2 and row.n_gaps_over == 1
    assert row.downtime_us == 3600 * 1_000_000  # 2h gap − 1h threshold
    span = 9000 * 1_000_000
    assert row.span_us == span
    assert row.availability_ppm == (span - 3600 * 10**6) * 10**6 // span


# -------------------------------------------------------- dominant color

def _solid_bmp(w: int, h: int, bgr: tuple[int, int, int]) -> bytes:
    stride = (w * 3 + 3) // 4 * 4
    row = bytes(list(bgr) * w) + b"\0" * (stride - w * 3)
    pixel_data = row * h
    offset = 14 + 40
    fh = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0,
                     offset)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                     len(pixel_data), 2835, 2835, 0, 0)
    return fh + ih + pixel_data


def test_dominant_color_solid_image_share_is_one(spark):
    media = spark.createDataFrame(
        [(1, bytearray(_solid_bmp(5, 4, (200, 10, 10))))],
        "doc_id long, payload binary")
    row = multimodal.dominant_colors(media).collect()[0]
    assert (row.width, row.height) == (5, 4)
    # code = (200//64)*16 + (10//64)*4 + (10//64) = 48
    assert row.dom_code == 48
    assert row.dom_count == 20 and row.n_pixels == 20
    assert row.dom_share == 1.0


# -------------------------------------------------------- centroid shift

def test_centroid_shift_zero_when_labels_identical(spark):
    emb = spark.createDataFrame(
        [(i, [0.5, -0.25], "a" if i % 2 else "b") for i in range(8)],
        "vec_id long, embedding array<float>, label string")
    for r in similarity.centroid_shift(emb).collect():
        assert r.shift_micro2 == 0.0
        assert r.n_vecs == 4
        assert r.share_ppm == 500_000


def test_centroid_shift_detects_displaced_label(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], "far"), (2, [0.0, 0.0], "near"),
         (3, [0.0, 0.0], "near"), (4, [0.0, 0.0], "near")],
        "vec_id long, embedding array<float>, label string")
    out = {r.label: r for r in similarity.centroid_shift(emb).collect()}
    assert out["far"].shift_micro2 > out["near"].shift_micro2 > 0


def test_centroid_shift_rejects_ragged_embeddings(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [1.0], "a")],
        "vec_id long, embedding array<float>, label string")
    with pytest.raises(Exception, match="ragged"):
        similarity.centroid_shift(emb).collect()


# ------------------------------------------------------------- jsd drift

def test_jsd_zero_for_identical_halves(spark):
    """Same distribution in both halves → JSD exactly 0 (every band has
    p == q == m, log2(1) = 0)."""
    from kafka_streams_in_action_spark.operators import relational
    rows = []
    for d in range(10):  # day 0-4 = first half, 5-9 = second
        for j, v in enumerate([10.0, 60.0, 110.0]):
            rows.append((d * 10 + j, TS0 + dt.timedelta(days=d),
                         1, "view", v, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    row = relational.jsd_drift(ev).collect()[0]
    assert row.jsd_bits == 0.0
    assert row.n_first == 15 and row.n_second == 15
    assert row.n_bands == 3


def test_jsd_one_for_disjoint_halves(spark):
    """Disjoint supports → JSD = 1 bit exactly (every term is
    p·log2(2))."""
    from kafka_streams_in_action_spark.operators import relational
    rows = []
    for d in range(4):
        v = 10.0 if d < 2 else 210.0  # bands 0 vs 4, no overlap
        for j in range(5):
            rows.append((d * 10 + j, TS0 + dt.timedelta(days=d),
                         1, "view", v, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    row = relational.jsd_drift(ev).collect()[0]
    assert row.jsd_bits == 1.0
    assert row.n_bands == 2


# ----------------------------------------------------------------- woe

def test_woe_signs_and_iv(spark):
    """A segment with a higher urgent share than the corpus gets
    positive WoE; zero-bad bins emit NULL and don't poison IV."""
    from kafka_streams_in_action_spark.operators import features
    cust = _customers(spark, [
        (1, "a", 1, 0.0, "HOT"), (2, "b", 1, 0.0, "COLD"),
        (3, "c", 1, 0.0, "PURE")])
    orders = _orders(spark, [
        # HOT: 3 good, 1 bad; COLD: 1 good, 3 bad; PURE: 2 good, 0 bad
        (1, 1, "O", 1.0, TS0, "1-URGENT"),
        (2, 1, "O", 1.0, TS0, "2-HIGH"),
        (3, 1, "O", 1.0, TS0, "1-URGENT"),
        (4, 1, "O", 1.0, TS0, "5-LOW"),
        (5, 2, "O", 1.0, TS0, "1-URGENT"),
        (6, 2, "O", 1.0, TS0, "5-LOW"),
        (7, 2, "O", 1.0, TS0, "4-NOT SPECIFIED"),
        (8, 2, "O", 1.0, TS0, "3-MEDIUM"),
        (9, 3, "O", 1.0, TS0, "1-URGENT"),
        (10, 3, "O", 1.0, TS0, "2-HIGH"),
    ])
    out = {r.segment: r for r in features.woe_iv(orders, cust).collect()}
    assert out["HOT"].woe > 0 > out["COLD"].woe
    assert out["PURE"].woe is None  # zero bads → NULL, not +inf
    ivs = {r.iv_total for r in out.values()}
    assert len(ivs) == 1 and ivs.pop() > 0


# -------------------------------------------------------------- absence

def test_absence_buckets_users_by_staleness(spark):
    from kafka_streams_in_action_spark.operators import event_time
    rows = []
    # anchor day = day 20; user 1 active at 20, user 2 last at day 15
    # (5 absent → cooling), user 3 last at day 10 (10 → at_risk),
    # user 4 last at day 1 (19 → churned)
    for u, d in [(1, 20), (2, 15), (3, 10), (4, 1), (1, 0)]:
        rows.append((len(rows), TS0 + dt.timedelta(days=d), u,
                     "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r.bucket: r for r in
           event_time.absence_histogram(ev).collect()}
    assert out["active"].n_users == 1
    assert out["cooling"].n_users == 1
    assert out["cooling"].min_absent_days == 5
    assert out["at_risk"].n_users == 1
    assert out["churned"].n_users == 1
    assert out["churned"].max_absent_days == 19
    assert sum(r.n_users for r in out.values()) == 4


def test_jsd_single_timestamp_type_does_not_crash(spark):
    """A type whose events share ONE timestamp puts every row in the
    second half (us < mid is false at mid == us): the empty first half
    must read as a clean jsd with zero first-half mass, never a
    NaN→long ANSI cast error."""
    from kafka_streams_in_action_spark.operators import relational
    rows = [(i, TS0, 1, "mono", 10.0, "{}") for i in range(5)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    row = relational.jsd_drift(ev).collect()[0]
    assert row.n_first == 0 and row.n_second == 5
    assert row.jsd_bits == 0.5  # all mass one-sided: ½·1·log2(2)


def test_bursts_zero_count_rows_do_not_divide_by_zero(spark):
    """The shared census core must tolerate cnt = 0 rows (a future
    caller materializing a dense day grid) — ineligible arithmetic can
    still evaluate the ratio's denominator."""
    from kafka_streams_in_action_spark.operators import event_time
    daily = spark.createDataFrame(
        [("t", dt.date(2024, 1, 1 + d), 0) for d in range(9)],
        "event_type string, day date, cnt long")
    row = event_time.bursts_from_daily(daily).collect()[0]
    assert row.n_burst_days == 0
    assert row.max_ratio_milli is None
