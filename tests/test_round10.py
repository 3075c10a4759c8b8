"""Round-10 operator behavior tests: RSI, VWAP, ingestion-order audit,
inter-arrival burstiness, candidate-key audit, cohort LTV, k-fold
split, exact length percentiles, shard overlap, content-defined
chunking, schema evolution, and format sniffing.

Oracle parity for every registered row is covered by tests/test_oracle.py
(bit-exact on floats); these pin the BEHAVIORAL contracts the oracles
can't express (boundary conditions, tie-breaks, degenerate inputs, the
CDC kernel's congruence with the scalar fold)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import (
    dedup, event_time, multimodal, relational, sampling, similarity,
    text, windows,
)

TS0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _docs(spark):
    from kafka_streams_in_action_spark.sources.parquet import load_table

    from .conftest import SF_DIR
    return load_table(spark, "documents", SF_DIR)


def _ev_table(spark):
    from kafka_streams_in_action_spark.sources.parquet import load_table

    from .conftest import SF_DIR
    return load_table(spark, "events", SF_DIR)


def _events(spark, rows):
    """rows = [(event_id, user_id, minutes_offset, event_type, value)]"""
    return spark.createDataFrame(
        [(e, TS0 + dt.timedelta(minutes=m), u, t, v, "{}")
         for e, u, m, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


def _daily_events(spark, values, etype="view"):
    """One event per day with the given values (ids sequential)."""
    return spark.createDataFrame(
        [(i, TS0 + dt.timedelta(days=i), 1, etype, float(v), "{}")
         for i, v in enumerate(values)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


# ------------------------------------------------------------------ rsi

def test_rsi_all_gains_is_100(spark):
    """Strictly rising series: Σloss = 0 → RSI exactly 100 for every
    full window."""
    ev = _daily_events(spark, range(1, 20))
    out = windows.rsi_daily(ev).collect()
    assert out and all(r["rsi"] == 100.0 for r in out)


def test_rsi_balanced_alternation_is_50(spark):
    """Alternating ±1 days: over any 14 deltas, gains == losses → 50."""
    ev = _daily_events(spark, [10 + (i % 2) for i in range(20)])
    out = windows.rsi_daily(ev).collect()
    assert out and all(r["rsi"] == 50.0 for r in out)


def test_rsi_needs_full_window(spark):
    """14 deltas need 15 days; a 14-day series emits nothing."""
    ev = _daily_events(spark, range(14))
    assert windows.rsi_daily(ev).count() == 0


# ----------------------------------------------------------------- vwap

def test_vwap_weights_by_quantity(spark):
    """Two trades same day: 10 units @ 1.0 + 30 units @ 3.0 → VWAP 2.5,
    not the unweighted 2.0."""
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", TS0),
         (2, 1, 1, 1, 30.0, 3.0, 0.0, 0.0, "N", "O", TS0)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    row = event_time.vwap_daily(li).collect()[0]
    assert row["sq"] == 40 and row["spq"] == 10 * 1000 + 30 * 3000
    assert row["vwap"] == 2.5 and row["cum_vwap"] == 2.5


def test_vwap_cumulative_spans_days(spark):
    """Day 1: 10 @ 1.0; day 2: 10 @ 3.0 → day-2 daily VWAP 3.0 but
    cumulative 2.0."""
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", TS0),
         (2, 1, 1, 1, 10.0, 3.0, 0.0, 0.0, "N", "O",
          TS0 + dt.timedelta(days=1))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    rows = {r["day"].day: r for r in event_time.vwap_daily(li).collect()}
    assert rows[2]["vwap"] == 3.0 and rows[2]["cum_vwap"] == 2.0


# -------------------------------------------------- ingestion order audit

def test_order_audit_counts_backsteps(spark):
    """Append order 1,2,3 but event times 0, 10, 5 minutes: one
    regression of 5 minutes."""
    ev = _events(spark, [(1, 1, 0, "view", 0.0), (2, 1, 10, "view", 0.0),
                         (3, 1, 5, "view", 0.0)])
    row = event_time.ingestion_order_audit(ev).collect()[0]
    assert row["n_regressions"] == 1
    assert row["max_backstep_us"] == 5 * 60 * 1_000_000


def test_order_audit_in_order_stream_is_clean(spark):
    ev = _events(spark, [(i, 1, i, "view", 0.0) for i in range(5)])
    row = event_time.ingestion_order_audit(ev).collect()[0]
    assert row["n_regressions"] == 0 and row["max_backstep_us"] == 0


# -------------------------------------------------------- inter-arrival

def test_interarrival_steady_heartbeat_cv_zero(spark):
    """Equal 60s gaps: mean 60, variance 0 → cv is NULL (var>0 gate),
    max gap exactly 60s."""
    ev = _events(spark, [(i, 1, i, "view", 0.0) for i in range(5)])
    row = event_time.interarrival_stats(ev).collect()[0]
    assert row["n_gaps"] == 4
    assert row["max_gap_us"] == 60_000_000
    assert row["mean_gap_s"] == 60.0
    assert row["cv"] is None


def test_interarrival_bursty_user_cv_positive(spark):
    """Gaps 1min, 1min, 58min: bursty — cv well above 1."""
    ev = _events(spark, [(1, 1, 0, "view", 0.0), (2, 1, 1, "view", 0.0),
                         (3, 1, 2, "view", 0.0), (4, 1, 60, "view", 0.0)])
    row = event_time.interarrival_stats(ev).collect()[0]
    assert row["n_gaps"] == 3 and row["cv"] > 1.0


def test_interarrival_single_event_user_absent(spark):
    """One event → no gaps → no output row for that user."""
    ev = _events(spark, [(1, 1, 0, "view", 0.0), (2, 2, 0, "view", 0.0),
                         (3, 2, 5, "view", 0.0)])
    out = {r["user_id"] for r in
           event_time.interarrival_stats(ev).collect()}
    assert out == {2}


# --------------------------------------------------- candidate-key audit

def test_candidate_key_audit_flags_duplicates(spark):
    od = spark.createDataFrame(
        [(1, 7, "O", 1.0, TS0, "1-URGENT"),
         (2, 7, "O", 1.0, TS0, "1-URGENT"),
         (3, 8, "O", 1.0, TS0 + dt.timedelta(days=1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    rows = {r["key_cols"]: r for r in
            relational.candidate_key_audit(od).collect()}
    assert rows["o_orderkey"]["is_unique"]
    assert not rows["o_custkey"]["is_unique"]
    assert rows["o_custkey"]["n_dup_rows"] == 1
    # custkey 7 places both orders on the same date → composite not unique
    assert not rows["o_custkey,o_orderdate"]["is_unique"]


# -------------------------------------------------------------- cohort ltv

def test_ltv_cohort_is_first_order_month_and_cum_accumulates(spark):
    od = spark.createDataFrame(
        [(1, 7, "O", 10.0, dt.datetime(2024, 1, 5), "x"),
         (2, 7, "O", 20.0, dt.datetime(2024, 3, 5), "x"),
         (3, 8, "O", 5.0, dt.datetime(2024, 3, 1), "x")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    rows = {(r["cohort_month"].isoformat(), r["age"]): r
            for r in relational.cohort_ltv(od).collect()}
    jan = rows[("2024-01-01", 0)]
    assert jan["n_active"] == 1 and jan["revenue_milli"] == 10_000
    jan2 = rows[("2024-01-01", 2)]
    assert jan2["revenue_milli"] == 20_000
    assert jan2["cum_revenue_milli"] == 30_000
    mar = rows[("2024-03-01", 0)]
    assert mar["n_active"] == 1 and mar["cum_revenue_milli"] == 5_000


# ----------------------------------------------------------------- kfold

def test_kfold_assignment_is_stable_and_complete(spark):
    docs_df = _docs(spark)
    out = sampling.kfold_split(docs_df).collect()
    total = sum(r["n"] for r in out)
    assert total == docs_df.count()
    folds = {r["fold"] for r in out}
    assert folds <= set(range(5))
    # per-fold totals agree with the per-(fold, lang) rows
    by_fold = {}
    for r in out:
        by_fold.setdefault(r["fold"], [0, r["fold_total"]])
        by_fold[r["fold"]][0] += r["n"]
    for n, tot in by_fold.values():
        assert n == tot


# ------------------------------------------------------ length quantiles

def test_length_quantiles_match_sorted_ranks(spark):
    """10 docs of 1..10 words: p50 = rank ceil(5) → 5 words, p90 → 9,
    p99 → ceil(9.9)=10."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i), "en", "s", i) for i in range(1, 11)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    rows = {r["pct"]: r for r in
            text.length_quantile_report(docs).collect()}
    assert rows[50]["n_tok"] == 5 and rows[50]["rank"] == 5
    assert rows[90]["n_tok"] == 9
    assert rows[99]["n_tok"] == 10
    assert rows[50]["n_docs"] == 10


# -------------------------------------------------------- shard overlap

def test_shard_overlap_counts_cross_shard_contents(spark):
    """Duplicate text placed in different shards shows up in the matrix;
    unique texts do not."""
    import pandas as pd

    from kafka_streams_in_action_spark.functions.serde import fnv1a_32

    docs = spark.createDataFrame(
        [(i, "dup" if i < 40 else f"u{i}", "en", "s", 3)
         for i in range(60)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = dedup.shard_overlap_matrix(docs).collect()
    # 'dup' lands in several of the 8 shards → every such pair shares 1
    assert out and all(r["n_shared"] == 1 for r in out)
    assert all(r["shard_a"] < r["shard_b"] for r in out)


# ------------------------------------------------------------ cdc chunks

def test_cdc_kernel_congruent_with_scalar_fold():
    """The vectorized prefix-hash boundary finder must equal the 16-step
    scalar fold the oracle runs, character for character."""
    import random
    import string

    M, B, W = 2147483647, 131, 16

    def scalar(t):
        out = []
        for i in range(W, len(t) + 1):
            h = 0
            for ch in t[i - W:i]:
                h = (h * B + ord(ch)) % M
            if h % 64 == 0:
                out.append(i)
        return out

    rng = random.Random(42)
    for _ in range(50):
        s = "".join(rng.choices(string.ascii_lowercase + " .éü",
                                k=rng.randint(0, 400)))
        assert dedup._cdc_boundaries(s) == scalar(s)


def test_cdc_insertion_resynchronizes_chunks(spark):
    """CDC's point: insert one char at the front of a long NON-periodic
    text and every chunk fingerprint except the first survives, because
    the content-defined boundaries all shift by exactly one position
    (fixed-width chunking would lose all of them)."""
    import hashlib
    import random
    import string

    rng = random.Random(9)
    rng_text = "".join(rng.choices(string.ascii_lowercase + " ", k=4000))

    def chunk_hashes(t):
        bnds = dedup._cdc_boundaries(t)
        starts = [0] + bnds
        ends = bnds + ([len(t)] if (not bnds or bnds[-1] < len(t))
                       else [])
        return [hashlib.md5(t[s:e].encode()).hexdigest()
                for s, e in zip(starts, ends)]

    a, b = chunk_hashes(rng_text), chunk_hashes("X" + rng_text)
    assert len(a) > 10
    shared = len(set(a) & set(b))
    assert shared >= len(set(a)) - 1  # only the first chunk may differ


def test_cdc_chunk_stats_flags_duplicated_docs(spark):
    docs = spark.createDataFrame(
        [(1, "shared paragraph of text that chunks " * 10, "en", "s", 1),
         (2, "shared paragraph of text that chunks " * 10, "en", "s", 1),
         (3, "completely different content here entirely " * 10,
          "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    rows = {r["doc_id"]: r for r in
            dedup.cdc_chunk_stats(docs).collect()}
    assert rows[1]["dup_frac"] == 1.0 and rows[2]["dup_frac"] == 1.0
    assert rows[3]["n_dup_chunks"] == 0


# --------------------------------------------------------- schema evo

def test_schema_evolution_backfills_nulls(spark, tmp_path):
    from kafka_streams_in_action_spark.operators import layout

    events_df = _ev_table(spark)
    row = layout.schema_evolution_audit(
        spark, events_df, str(tmp_path / "evo")).collect()[0]
    n = events_df.count()
    n_odd = events_df.filter(F.col("event_id") % 2 == 1).count()
    assert row["n_total"] == n
    assert row["n_v2"] == n_odd
    assert row["n_v1_nulls"] == n - n_odd == row["n_type_nulls"]


# -------------------------------------------------------------- sniff

def test_sniff_grid_matches_modular_spec(spark):
    docs_df = _docs(spark)
    out = multimodal.format_sniff_audit(docs_df).collect()
    got = {(r["declared"], r["sniffed"]): r["n"] for r in out}
    exp = {}
    fmts = ["bmp", "wav", "video"]
    for (did,) in docs_df.select("doc_id").collect():
        real = fmts[did % 3]
        declared = fmts[(did + 1) % 3] if did % 11 == 0 else real
        sniffed = "unknown" if did % 7 == 0 else real
        exp[(declared, sniffed)] = exp.get((declared, sniffed), 0) + 1
    assert got == exp
    mismatch_flags = {(r["declared"], r["sniffed"]): r["is_mismatch"]
                      for r in out}
    for (d, s), flag in mismatch_flags.items():
        assert flag == (d != s)


# --------------------------------------------------------- daily peaks

def test_peaks_strict_and_endpoints_excluded(spark):
    """Series 1,3,2,2,5 (days): only day 2 is a peak (strict both
    sides); the plateau day 4 and the endpoint day 5 are not."""
    ev = _daily_events(spark, [1, 3, 2, 2, 5])
    out = windows.daily_peaks(ev).collect()
    assert len(out) == 1
    assert out[0]["day"].day == 2 and out[0]["value_milli"] == 3000
    assert out[0]["prominence_milli"] == 1000  # over the higher neighbor


# ----------------------------------------------------------- freshness

def test_freshness_buckets_by_age(spark):
    ev = _events(spark, [(1, 1, 0, "view", 0.0)])
    # single type, last event at TS0 (2024-01-01 10:00) vs 2024-02-01
    row = relational.freshness_audit(ev).collect()[0]
    assert row["age_hours"] == 30 * 24 + 14
    assert row["sla"] == "dead"
    row2 = relational.freshness_audit(ev, as_of="2024-01-02").collect()[0]
    assert row2["sla"] == "fresh" and row2["age_hours"] == 14


# ------------------------------------------------------- embedding QA

def test_embedding_profile_exact_moments(spark):
    emb = spark.createDataFrame(
        [(1, [0.5, -1.25], 0), (2, [1.5, 0.75], 1)],
        "vec_id long, embedding array<float>, label int")
    rows = {r["dim"]: r for r in
            similarity.embedding_profile(emb).collect()}
    assert rows[0]["sum_micro"] == 2_000_000
    assert rows[0]["mean_micro"] == 1_000_000.0
    assert rows[1]["min_micro"] == -1_250_000
    assert rows[1]["max_micro"] == 750_000


# ------------------------------------------------- partition evolution

def test_partition_evolution_merges_days_into_weeks(spark, tmp_path):
    from kafka_streams_in_action_spark.operators import layout

    # 10 daily events spanning two ISO weeks (Mon 2024-01-01 .. )
    ev = _events(spark, [(i, 1, i * 24 * 60, "view", 1.0)
                         for i in range(10)])
    out = {r["week"].isoformat(): r for r in
           layout.partition_evolution_audit(
               spark, ev, str(tmp_path / "pe")).collect()}
    assert out["2024-01-01"]["n_rows"] == 7
    assert out["2024-01-01"]["n_day_parts"] == 7
    assert out["2024-01-08"]["n_rows"] == 3
    assert out["2024-01-08"]["value_milli"] == 3000


# ---------------------------------------------------------- busdays

def test_busdays_closed_form_matches_calendar_walk(spark):
    """Random date pairs: the closed-form weekday count equals a
    brute-force walk over the calendar (weekday() < 5)."""
    import random

    rnd = random.Random(53)
    rows = []
    for k in range(60):
        o = dt.date(1995, 1, 1) + dt.timedelta(days=rnd.randint(0, 900))
        s = o + dt.timedelta(days=rnd.randint(0, 40))
        rows.append((k, o, s))
    od = spark.createDataFrame(
        [(k, 1, "O", 1.0, dt.datetime(o.year, o.month, o.day), "P")
         for k, o, s in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    li = spark.createDataFrame(
        [(k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          dt.datetime(s.year, s.month, s.day)) for k, o, s in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    got = event_time.business_day_latency(od, li).collect()[0]

    def walk(o, s):
        n, d = 0, o
        while d < s:
            d += dt.timedelta(days=1)
            if d.weekday() < 5:
                n += 1
        return n

    exp = [walk(o, s) for _, o, s in rows]
    assert got["n_lines"] == 60
    assert got["sum_busdays"] == sum(exp)
    assert got["max_busdays"] == max(exp)


# ------------------------------------------------------------- mase

def test_mase_flat_weekly_pattern_favors_seasonal(spark):
    """A strict weekly pattern: seasonal-naive error is 0, naive error
    is positive → ratio 0."""
    ev = _daily_events(spark, [(i % 7) * 10 + 1 for i in range(28)])
    row = windows.forecast_error_daily(ev).collect()[0]
    assert row["seasonal_err_milli"] == 0
    assert row["naive_err_milli"] > 0
    assert row["seasonal_ratio"] == 0.0


# ---------------------------------------------------------- bollinger

def test_bollinger_flags_only_band_crossings(spark):
    """Flat series with one spike: only the spike day crosses ±2σ of
    its trailing 10-day band; flat days never do (zero variance)."""
    vals = [10.0] * 15 + [100.0] + [10.0] * 5
    ev = _daily_events(spark, vals)
    out = windows.bollinger_breakouts(ev).collect()
    assert [r["day"].day for r in out] == [16]
    assert out[0]["side"] == "above"
    assert out[0]["value_milli"] == 100_000


def test_bollinger_decimal_path_survives_large_values(spark):
    """Daily sums around 4e9 milli would overflow BIGINT in dev²·9 —
    the DECIMAL(38,0) cross-multiplication must not wrap or null."""
    vals = [4_000_000.0 + (i % 3) for i in range(12)] + [9_000_000.0]
    ev = _daily_events(spark, vals)
    out = windows.bollinger_breakouts(ev).collect()
    assert any(r["day"].day == 13 and r["side"] == "above" for r in out)


# ------------------------------------------------------ commutativity

def test_lww_orders_agree_and_tombstones_stick(spark):
    """Interleaved upserts and a final delete: both application orders
    agree and the deleted key counts as a tombstone, not live."""
    ev = _events(spark, [
        (1, 1, 0, "view", 5.0),        # base (pre-cut is empty here;
        (2, 1, 10, "click", 7.0),      # everything lands in A/B arms)
        (4, 1, 20, "purchase", 9.0),
        (3, 2, 5, "view", 1.0),
        (6, 2, 30, "error", 0.0),      # tombstone wins for user 2
    ])
    row = relational.lww_commutativity_audit(ev).collect()[0]
    assert row["orders_agree"]
    assert row["n_keys"] == 2
    assert row["n_live"] == 1 and row["n_deleted"] == 1
    assert row["live_value_milli"] == 9000
