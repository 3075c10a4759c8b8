"""Round-14 operator behavior tests — the t-digest sketch (C4t), the
decayed leaderboard (C13d + stream twin), the SCD1 latest-wins MERGE
(C35p), the t-closeness audit (C40d), the feature discretizers (C42d/e),
the peak-concurrency sweep (C34x + heap-state stream twin), and the
second tranche: the SLA gap-stats twin (C16k-s), the digest-as-state
twin (C4t-s), the event-time TTL eviction store (C27t), and the
retrieval-eval family (C43a).

Oracle parity for every registered row is covered by tests/test_oracle.py;
these pin the behavioral contracts the oracles can't express."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import (
    event_time, features, privacy, relational,
)

TS0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _customers(spark, rows):
    """rows: (custkey, name, nationkey, acctbal, segment)"""
    return spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, "
              "c_acctbal double, c_mktsegment string")


def _events(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    return spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for (i, ts, u, t, v) in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")


# ------------------------------------------------------------ t-digest

def test_tdigest_compress_preserves_weight_and_mean(spark):
    import numpy as np
    x = np.arange(1000, dtype=np.float64)
    w = np.ones(1000, dtype=np.int64)
    m, cw = relational._tdigest_compress(x, w, 50)
    assert cw.sum() == 1000
    assert len(m) <= 52                       # cap + straddle slack
    # weighted mean is preserved exactly up to float association
    assert abs((m * cw).sum() / cw.sum() - x.mean()) < 1e-9
    assert (np.diff(m) > 0).all()             # sorted input → sorted means


def test_tdigest_rank_audit_passes_on_uniform_data(spark):
    li = spark.createDataFrame(
        [(i, 1, float(100 + i % 997), ) for i in range(5000)],
        "l_orderkey long, l_linenumber int, l_extendedprice double")
    out = relational.tdigest_price_quantiles(li).collect()
    assert len(out) == 5
    assert all(r["rank_ok"] for r in out)
    assert all(r["n_rows"] == 5000 for r in out)
    # exact type-1 median of 100..1096 repeating: integer-selected cents
    med = next(r for r in out if r["q_ppm"] == 500_000)
    assert med["exact_cents"] % 100 == 0       # a real input value


def test_tdigest_exact_quantiles_are_type1_ranks(spark):
    # 10 known values → q=0.5 must select the 5th smallest (rank ceil)
    li = spark.createDataFrame(
        [(i, 1, float(v)) for i, v in
         enumerate([5, 1, 9, 3, 7, 2, 8, 4, 6, 10])],
        "l_orderkey long, l_linenumber int, l_extendedprice double")
    out = {r["q_ppm"]: r["exact_cents"]
           for r in relational.tdigest_price_quantiles(li).collect()}
    assert out[500_000] == 500                 # 5.00
    assert out[990_000] == 1000                # ceil(.99·10)=10th → 10.00
    assert out[10_000] == 100                  # ceil(.01·10)=1st → 1.00


# ---------------------------------------------------------- decay topk

def test_decay_topk_recent_user_outranks_heavier_old_user(spark):
    # user 1: 3 events today; user 2: 10 events 70 days ago (decayed
    # by 2^10 → 10·976 < 3·1e6); user 3: 1 event today.
    rows = [(i, TS0, 1, "view", 1.0) for i in range(3)]
    rows += [(10 + i, TS0 - dt.timedelta(days=70), 2, "view", 1.0)
             for i in range(10)]
    rows += [(30, TS0, 3, "view", 1.0)]
    out = event_time.decayed_topk(_events(spark, rows)).collect()
    ranks = {r["user_id"]: r["rank"] for r in out}
    assert ranks[1] == 1 and ranks[3] == 2 and ranks[2] == 3
    scores = {r["user_id"]: r["score_micro"] for r in out}
    assert scores[1] == 3_000_000
    assert scores[2] == 10 * (1_000_000 // 2 ** 10)


def test_decay_topk_ties_break_by_user_id(spark):
    rows = [(1, TS0, 7, "view", 1.0), (2, TS0, 3, "view", 1.0)]
    out = event_time.decayed_topk(_events(spark, rows)).collect()
    assert [r["user_id"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [3, 7]


# ----------------------------------------------------------- SCD1 merge

def test_scd1_latest_version_wins_and_arms_route(spark):
    orders = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0), (997 * 3 + 1, 30, 300.0)],
        "o_orderkey long, o_custkey long, o_totalprice double")
    li = spark.createDataFrame(
        [  # order 1: two versions, the later ship date must win
            (1, 1, dt.datetime(1996, 1, 1), 11.0),
            (1, 2, dt.datetime(1997, 1, 1), 22.0),
            # order 2: all lines predate the CDC window → kept
            (2, 1, dt.datetime(1994, 1, 1), 33.0),
            # feed key %997==1 → also re-keyed as an insert
            (997 * 3 + 1, 1, dt.datetime(1998, 1, 1), 44.0),
        ],
        "l_orderkey long, l_linenumber int, l_shipdate timestamp, "
        "l_extendedprice double")
    out = {r["o_orderkey"]: r for r in
           relational.scd1_latest_merge(orders, li).collect()}
    assert out[1]["op"] == "U" and out[1]["price_cents"] == 2200
    assert out[1]["version_line"] == 2 and out[1]["n_versions"] == 2
    assert out[2]["op"] == "K" and out[2]["price_cents"] == 20000
    assert out[2]["version_date"] is None
    # insert offset = greatest key across base and feed, +1 (derived,
    # not a constant — r12 ADVICE); here both maxima are 997*3+1
    ins = out[(997 * 3 + 1) + (997 * 3 + 1 + 1)]
    assert ins["op"] == "I" and ins["price_cents"] == 4400
    assert ins["o_custkey"] is None


def test_scd1_duplicate_line_numbers_break_ties_by_price(spark):
    # the synthetic corpus carries duplicate (order, line) pairs — the
    # higher price must win deterministically
    orders = spark.createDataFrame([(5, 1, 1.0)],
                                   "o_orderkey long, o_custkey long, "
                                   "o_totalprice double")
    li = spark.createDataFrame(
        [(5, 5, dt.datetime(2000, 11, 11), 73972.40),
         (5, 5, dt.datetime(2000, 11, 11), 91072.38)],
        "l_orderkey long, l_linenumber int, l_shipdate timestamp, "
        "l_extendedprice double")
    row = relational.scd1_latest_merge(orders, li).collect()[0]
    assert row["price_cents"] == 9107238


# ---------------------------------------------------------- t-closeness

def test_tcloseness_skewed_class_breaches(spark):
    # nation 1 is all-band-0 (maximally skewed vs the corpus); nations
    # 2 and 3 carry identical 50/50 band mixes, mild vs the global
    # 20/10 split — only the skewed class may breach t=0.2.
    cust = _customers(spark, (
        [(i, f"a{i}", 1, 100.0, "AUTO") for i in range(10)]
        + [(100 + i, f"b{i}", 2, 100.0, "AUTO") for i in range(5)]
        + [(200 + i, f"c{i}", 2, 5100.0, "AUTO") for i in range(5)]
        + [(300 + i, f"d{i}", 3, 100.0, "AUTO") for i in range(5)]
        + [(400 + i, f"e{i}", 3, 5100.0, "AUTO") for i in range(5)]))
    out = privacy.t_closeness_audit(cust).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_classes"] == 3
    # nation-1 EMD: cum diff at band 0 = |10·30 − 20·10| = 100
    #   → 100·1e6 / (1·10·30) = 333333 ppm > 200000;
    # nations 2/3: |5·30 − 20·10| = 50 → 166666 ppm ≤ 200000
    assert r["t_max_ppm"] == 333_333
    assert r["n_breach_classes"] == 1 and r["rows_in_breach"] == 10
    assert not r["t_close"]


def test_tcloseness_identical_distributions_have_zero_emd(spark):
    cust = _customers(spark, (
        [(i, f"a{i}", 1, 100.0, "AUTO") for i in range(4)]
        + [(100 + i, f"b{i}", 2, 100.0, "AUTO") for i in range(4)]))
    r = privacy.t_closeness_audit(cust).collect()[0]
    assert r["t_max_ppm"] == 0 and r["t_close"]


# -------------------------------------------------------------- binning

def test_binning_equal_frequency_with_ties_kept_together(spark):
    # 20 rows, 10 bins → 2 per bin; five identical values must land in
    # ONE bin (the tie rule), shifting later boundaries
    vals = [1.0] * 5 + [float(v) for v in range(2, 17)]
    cust = _customers(spark, [(i, f"c{i}", 1, v, "AUTO")
                              for i, v in enumerate(vals)])
    out = {r["bin"]: r for r in features.quantile_binning(cust).collect()}
    assert out[0]["n_rows"] == 5                    # all ties together
    assert out[0]["lo_cents"] == out[0]["hi_cents"] == 100
    assert sum(r["n_rows"] for r in out.values()) == 20
    # bins are ordered and non-overlapping
    bins = sorted(out)
    for a, b in zip(bins, bins[1:]):
        assert out[a]["hi_cents"] < out[b]["lo_cents"]


def test_binning_mean_is_exact(spark):
    cust = _customers(spark, [(1, "a", 1, 1.0, "AUTO"),
                              (2, "b", 1, 2.0, "AUTO")])
    out = features.quantile_binning(cust, n_bins=1).collect()
    assert len(out) == 1
    assert out[0]["mean_cents"] == 150.0


# --------------------------------------------------------------- onehot

def test_onehot_ranks_by_frequency_then_value(spark):
    part = spark.createDataFrame(
        [(i, "B1") for i in range(5)] + [(10 + i, "B2") for i in range(5)]
        + [(20 + i, "B3") for i in range(3)] + [(30, "B4")],
        "p_partkey long, p_brand string")
    out = {r["value"]: r for r in
           features.onehot_vocab(part, top_n=2).collect()}
    assert out["B1"]["col_index"] == 0          # tie with B2 → value asc
    assert out["B2"]["col_index"] == 1
    assert out["__OOV__"]["col_index"] == 2
    assert out["__OOV__"]["n_rows"] == 4
    assert not out["__OOV__"]["in_vocab"]
    assert out["B1"]["coverage_ppm"] == 5 * 1_000_000 // 14


def test_onehot_empty_tail_emits_zero_oov(spark):
    part = spark.createDataFrame([(1, "B1")],
                                 "p_partkey long, p_brand string")
    out = {r["value"]: r for r in
           features.onehot_vocab(part, top_n=5).collect()}
    assert out["__OOV__"]["n_rows"] == 0


# ------------------------------------------------------ peak concurrency

def _interval_events(spark, rows, etype="req"):
    """rows: (event_id, start_offset_s, dur_s)"""
    return _events(spark, [
        (eid, TS0 + dt.timedelta(seconds=off), 1, etype, dur / 100.0)
        for (eid, off, dur) in rows])


def test_peak_counts_overlaps_half_open(spark):
    # [0,10) [5,15) [20,30): peak 2 at t=5; [10,20) would touch, not add
    ev = _interval_events(spark, [(1, 0, 10), (2, 5, 10), (3, 20, 10)])
    r = event_time.peak_concurrency(ev).collect()[0]
    assert r["peak"] == 2 and r["n_intervals"] == 3
    assert r["first_peak_us"] == int(
        (TS0 + dt.timedelta(seconds=5)).timestamp() * 1_000_000)
    assert r["busy_seconds"] == 30


def test_peak_touching_intervals_do_not_stack(spark):
    # [0,10) then [10,20): close-before-open at t=10 → peak stays 1
    ev = _interval_events(spark, [(1, 0, 10), (2, 10, 10)])
    r = event_time.peak_concurrency(ev).collect()[0]
    assert r["peak"] == 1


def test_peak_stream_kernel_matches_batch_across_boundary(spark):
    """The heap-sweep kernel folded over two ts-ordered micro-batches
    must reproduce the batch sweep — including an interval that spans
    the batch boundary (it stays open in the carried heap)."""
    from kafka_streams_in_action_spark.streaming.stateful import (
        _sweep_batch,
    )

    rows = [(1, 0, 100), (2, 30, 10),          # batch 1: peak 2 @30s
            (3, 60, 10), (4, 65, 10)]          # batch 2: ends at 70/75,
    #                                            interval 1 open to 100
    #                                            → peak 3 @65s
    ev = _interval_events(spark, rows)
    batch = event_time.peak_concurrency(ev).collect()[0]
    assert batch["peak"] == 3 and batch["n_intervals"] == 4

    base = int(TS0.timestamp() * 1_000_000)
    items = [(base + off * 1_000_000, dur * 1_000_000)
             for (_e, off, dur) in rows]
    state = ([], 0, -1, 0, 0)
    for sl in (items[:2], items[2:]):          # two micro-batches
        state = _sweep_batch(*state, sl)
    ends, peak, peak_t, n, busy = state
    assert peak == batch["peak"]
    assert peak_t == batch["first_peak_us"]
    assert n == batch["n_intervals"]
    assert busy // 1_000_000 == batch["busy_seconds"]
    # pops are lazy (fire at the NEXT start): all three ends ≥ the last
    # start remain in the carried heap, sorted
    assert ends == [base + s * 1_000_000 for s in (70, 75, 100)]


def test_peak_stream_kernel_half_open_pop_at_equal_instant(spark):
    from kafka_streams_in_action_spark.streaming.stateful import (
        _sweep_batch,
    )

    # [0,10) in batch 1; [10,20) in batch 2 — the carried end AT 10
    # must pop BEFORE the new open counts (peak stays 1)
    s = _sweep_batch([], 0, -1, 0, 0, [(0, 10_000_000)])
    s = _sweep_batch(*s, [(10_000_000, 10_000_000)])
    assert s[1] == 1


def test_peak_stream_kernel_rejects_negative_duration():
    """r12 ADVICE: a negative duration would place the batch sweep's −1
    boundary before its own start — a shape the lazy-pop heap cannot
    replay, so the kernel must fail loudly, not diverge silently."""
    import pytest

    from kafka_streams_in_action_spark.streaming.stateful import (
        _sweep_batch,
    )

    with pytest.raises(ValueError, match="negative interval duration"):
        _sweep_batch([], 0, -1, 0, 0, [(5, -1)])


# ------------------------------------------------------------ TTL state

def test_ttl_stream_evicts_and_resurrects(spark, tmp_path):
    """Crafted 16-row log (4 rows per time slice) driving all three
    arms of the TTL state machine: user 1 goes silent after slice 1 and
    must be EVICTED when the watermark passes last+2d (during slice 3);
    user 3 is evicted the same way but RESURRECTS in slice 4 with its
    count reset; user 2 stays active throughout and is never evicted."""
    import datetime as dt

    from kafka_streams_in_action_spark.plans import queries as Q

    d0 = dt.datetime(2024, 1, 1)

    def at(days):
        return d0 + dt.timedelta(days=days)

    rows = [
        # slice 1 (days 0-1)
        (1, at(0.0), 1, "view", 1.0, "{}"),
        (2, at(0.1), 3, "view", 1.0, "{}"),
        (3, at(0.2), 2, "view", 1.0, "{}"),
        (4, at(1.0), 1, "view", 1.0, "{}"),
        # slice 2 (days 5-6): wm=d1 — nobody expired yet
        (5, at(5.0), 2, "view", 1.0, "{}"),
        (6, at(5.1), 2, "view", 1.0, "{}"),
        (7, at(5.2), 2, "view", 1.0, "{}"),
        (8, at(6.0), 2, "view", 1.0, "{}"),
        # slice 3 (days 10-11): wm=d6 > d1+2d and > d0+2d — u1, u3 fire
        (9, at(10.0), 2, "view", 1.0, "{}"),
        (10, at(10.1), 2, "view", 1.0, "{}"),
        (11, at(10.2), 2, "view", 1.0, "{}"),
        (12, at(11.0), 2, "view", 1.0, "{}"),
        # slice 4 (days 20-21): u3 resurrects with a fresh count
        (13, at(20.0), 3, "view", 1.0, "{}"),
        (14, at(20.5), 2, "view", 1.0, "{}"),
        (15, at(20.6), 2, "view", 1.0, "{}"),
        (16, at(21.0), 2, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    ev.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    out = {r["user_id"]: r
           for r in Q._ttl_stream(spark, str(tmp_path)).collect()}
    assert out[1]["evicted"] and out[1]["n_events"] == 2
    assert not out[2]["evicted"] and out[2]["n_events"] == 12
    # resurrection: count reset to the post-eviction life
    assert not out[3]["evicted"] and out[3]["n_events"] == 1
    assert out[3]["last_ms"] == int(at(20.0).timestamp() * 1000)


# ----------------------------------------------------------------- kappa

def _emb(spark, rows):
    """rows: (vec_id, label, embedding list)"""
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>")


def test_kappa_perfect_agreement_when_quantization_is_lossless(spark):
    # components are exact multiples of amax/127 → dequantization is
    # the identity → both raters assign identically → kappa = 1
    rows = []
    for i in range(6):
        lab = i % 2
        v = [127.0, 0.0] if lab == 0 else [0.0, 127.0]
        rows.append((i, lab, v))
    out = similarity_mod().kappa_quantization_eval(_emb(spark, rows)) \
        .collect()
    assert all(r["kappa"] == 1.0 for r in out)
    assert all(r["n_agree"] == 6 and r["n_vecs"] == 6 for r in out)
    assert {(r["label"], r["n_diag"]) for r in out} == {(0, 3), (1, 3)}


def test_kappa_undefined_when_both_raters_single_label(spark):
    # one label only → pe = 1 → kappa_den = 0 → NULL kappa, not a crash
    rows = [(i, 0, [127.0, 0.0]) for i in range(4)]
    out = similarity_mod().kappa_quantization_eval(_emb(spark, rows)) \
        .collect()
    assert len(out) == 1
    assert out[0]["kappa"] is None and out[0]["kappa_den"] == 0


def similarity_mod():
    from kafka_streams_in_action_spark.operators import similarity
    return similarity
