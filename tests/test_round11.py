"""Round-11 operator behavior tests: BM25 retrieval, tokenizer
fertility, temperature-scaled mixing, column entropy, exact Pearson
matrix, autocorrelation, HITS, and the schema-registry driver row.

Oracle parity for every registered row is covered by tests/test_oracle.py
(bit-exact on floats); these pin the BEHAVIORAL contracts the oracles
can't express (known-value checks on hand-built inputs, tie-breaks,
degenerate inputs, invariants like symmetry and normalization)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import (
    graph, relational, sampling, text, windows,
)

TS0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _docs(spark, rows):
    """rows = [(doc_id, text, lang, source)]"""
    return spark.createDataFrame(
        [(d, t, la, s, len(t)) for d, t, la, s in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _daily_events(spark, values, etype="view"):
    return spark.createDataFrame(
        [(i, TS0 + dt.timedelta(days=i), 1, etype, float(v), "{}")
         for i, v in enumerate(values)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


# ----------------------------------------------------------------- bm25

def test_bm25_known_corpus(spark):
    """Hand-checkable corpus: the doc that contains a query term more
    often, at the same length, must rank above the one with fewer; a
    doc with no query terms never appears."""
    docs = _docs(spark, [
        (1, "the the cat sat", "en", "a"),
        (2, "the dog sat here", "en", "a"),
        (3, "zebra quark flux blob", "en", "a"),
    ])
    out = text.bm25_topk(docs).filter(F.col("query_id") == 1).collect()
    by_doc = {r.doc_id: r for r in out}
    assert 3 not in by_doc
    assert by_doc[1].rank < by_doc[2].rank  # tf 2 beats tf 1
    assert all(r.score_micro > 0 for r in out)


def test_bm25_score_formula(spark):
    """One doc, one term: the micro score must equal the closed-form
    BM25 value quantized the same way."""
    docs = _docs(spark, [(1, "the cat", "en", "a"),
                         (2, "dog food", "en", "a")])
    row = text.bm25_topk(docs).filter(
        (F.col("query_id") == 1) & (F.col("doc_id") == 1)).collect()[0]
    n_docs, total = 2, 4
    df_, tf_, dl = 1, 1, 2
    idf = math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
    denom = tf_ + 1.2 * (0.25 + 0.75 * dl * n_docs / total)
    expect = math.floor(idf * tf_ * 2.2 / denom * 1e6 + 0.5)
    # query 1 = ('the', 'of'); 'of' is absent so the sum is one term
    assert row.score_micro == expect
    assert row.n_terms_hit == 1


def test_bm25_rank_ties_break_on_doc_id(spark):
    """Identical docs score identically; the lower doc_id wins the
    lower rank."""
    docs = _docs(spark, [(7, "the cat", "en", "a"),
                         (3, "the cat", "en", "a")])
    out = (text.bm25_topk(docs).filter(F.col("query_id") == 1)
           .orderBy("rank").collect())
    assert [r.doc_id for r in out] == [3, 7]
    assert out[0].score_micro == out[1].score_micro


# ------------------------------------------------------------ fertility

def test_fertility_exact_counts(spark):
    docs = _docs(spark, [
        (1, "ab cd", "en", "a"),       # 2 tokens, 5 chars
        (2, "abcdef", "en", "a"),      # 1 token, 6 chars
        (3, "x y z", "fr", "a"),       # 3 tokens, 5 chars
    ])
    out = {r.lang: r for r in text.tokenizer_fertility(docs).collect()}
    en = out["en"]
    assert (en.n_docs, en.total_tokens, en.total_chars) == (2, 3, 11)
    assert en.chars_per_token == 11.0 / 3.0
    assert en.tokens_per_doc == 1.5
    assert out["fr"].chars_per_token == 5.0 / 3.0


# ---------------------------------------------------------- temperature

def test_temperature_alloc_sums_to_budget(spark):
    docs = _docs(spark, [(i, "t", lang, "a")
                         for i, lang in enumerate(
                             ["en"] * 80 + ["fr"] * 15 + ["zh"] * 5)])
    out = sampling.temperature_mix(docs, budget=1000).collect()
    assert sum(r.alloc for r in out) == 1000
    assert all(r.alloc == r.base_alloc + r.extra for r in out)


def test_temperature_flattens_toward_uniform(spark):
    """alpha < 1 must upweight the low-resource language relative to
    PROPORTIONAL mixing (boost above the uniform budget/N rate) and
    downweight the dominant one — the whole point of the sampling
    law."""
    docs = _docs(spark, [(i, "t", lang, "a")
                         for i, lang in enumerate(
                             ["en"] * 90 + ["zh"] * 10)])
    out = {r.lang: r for r in
           sampling.temperature_mix(docs, budget=10_000).collect()}
    proportional_ppm = 10_000 * 1_000_000 // 100  # uniform per-doc rate
    assert out["zh"].boost_ppm > proportional_ppm
    assert out["en"].boost_ppm < proportional_ppm
    # proportional share of en would be 9000; the temperature cut it
    assert out["en"].alloc < 9000


def test_temperature_alpha_one_is_proportional(spark):
    """alpha = 1 degenerates to plain proportional apportionment."""
    docs = _docs(spark, [(i, "t", lang, "a")
                         for i, lang in enumerate(
                             ["en"] * 75 + ["fr"] * 25)])
    out = {r.lang: r for r in
           sampling.temperature_mix(docs, alpha=1.0, budget=100).collect()}
    assert out["en"].alloc == 75
    assert out["fr"].alloc == 25


# -------------------------------------------------------------- entropy

def test_entropy_uniform_and_degenerate(spark):
    """Uniform 2-value column → H = 1 bit, norm = 1; constant column →
    H = 0, norm = 0 (k = 1 guard)."""
    ev = _daily_events(spark, [1.0, 2.0, 3.0, 4.0])
    ev = ev.withColumn(
        "event_type",
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b"))
    docs = _docs(spark, [(1, "t", "en", "s"), (2, "t", "en", "s")])
    out = {r.entity: r for r in
           relational.column_entropy(ev, docs).collect()}
    et = out["events.event_type"]
    assert et.k == 2 and abs(et.entropy_bits - 1.0) < 1e-6
    assert abs(et.norm_entropy - 1.0) < 1e-6
    lang = out["documents.lang"]
    assert lang.k == 1
    assert lang.entropy_bits == 0.0 and lang.norm_entropy == 0.0


# ----------------------------------------------------------------- corr

def test_corr_matrix_known_values(spark):
    """y = 2x gives corr exactly 1; an anti-correlated pair gives −1;
    the matrix emits all 6 pairs once."""
    rows = [(1, i, 2, 1, float(q), float(2 * q), float(50 - q) / 100,
             0.01 * (1 + (q % 3)), "N", "O",
             dt.datetime(2024, 1, 1))
            for i, q in enumerate(range(1, 21))]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    out = {(r.col_x, r.col_y): r.corr
           for r in relational.corr_matrix(li).collect()}
    assert len(out) == 6
    assert abs(out[("qty", "price")] - 1.0) < 1e-12
    assert abs(out[("qty", "disc")] + 1.0) < 1e-12


def test_corr_matrix_zero_variance_is_null_not_error(spark):
    """A constant column has zero variance — correlation is undefined
    and must come back NULL, not raise (ANSI mode traps /0 even for
    doubles)."""
    rows = [(1, i, 2, 1, 5.0, float(i), 0.05, 0.01, "N", "O",
             dt.datetime(2024, 1, 1)) for i in range(4)]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    out = {(r.col_x, r.col_y): r.corr
           for r in relational.corr_matrix(li).collect()}
    assert out[("qty", "price")] is None


# ------------------------------------------------------------------ acf

def test_acf_constant_series_excluded(spark):
    """Zero variance → den = 0 → the series emits no rows."""
    ev = _daily_events(spark, [5.0] * 20)
    assert windows.acf_daily(ev).count() == 0


def test_acf_alternating_series(spark):
    """x = +1/−1 alternating: lag-1 ACF → −1 side, lag-2 → +1 side
    (exact values shrink by the truncated-pair boundary terms)."""
    ev = _daily_events(spark, [1.0, -1.0] * 10)
    out = {r.lag: r for r in windows.acf_daily(ev).collect()}
    assert out[1].acf < -0.8
    assert out[2].acf > 0.8
    assert out[1].n_pairs == 19 and out[2].n_pairs == 18
    assert out[1].n_days == 20


def test_acf_linear_trend_is_positive_and_lag_ordered(spark):
    """A rising line has strong positive short-lag autocorrelation,
    decaying with lag (the Box-Jenkins identification signature)."""
    ev = _daily_events(spark, [float(i) for i in range(30)])
    out = {r.lag: r.acf for r in windows.acf_daily(ev).collect()}
    assert out[1] > out[2] > out[7] > 0


# ----------------------------------------------------------------- hits

def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d, 1) for s, d in pairs], "src long, dst long, w long")


def test_hits_star_graph(spark):
    """All hubs point at one node: that node is the unique max
    authority (ppm exactly 1e6), the pointers are the max hubs, and a
    disconnected node scores 0/0."""
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    scores = {r.node: r for r in graph.hits(
        nodes, _edges(spark, [(1, 0), (2, 0), (3, 0)])).collect()}
    assert scores[0].auth_ppm == 1_000_000
    assert scores[1].hub_ppm == 1_000_000
    assert scores[1].hub_ppm == scores[2].hub_ppm == scores[3].hub_ppm
    assert scores[4].auth_ppm == 0 and scores[4].hub_ppm == 0
    assert scores[0].hub_ppm == 0  # the center points at nobody


def test_hits_scores_bounded_and_normalized(spark):
    """Every score sits in [0, 1e6] and each side attains its max
    (the renormalization invariant that keeps the integer recurrence
    from decaying to zero)."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    out = graph.hits(nodes, _edges(
        spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])).collect()
    assert all(0 <= r.auth_ppm <= 1_000_000 for r in out)
    assert max(r.auth_ppm for r in out) == 1_000_000
    assert max(r.hub_ppm for r in out) == 1_000_000


# ------------------------------------------------------------- registry

def test_registry_row_asserts_catch_drift(spark, tmp_path):
    """The a14 row's booleans are earned: a registry whose dedup is
    broken must make the build raise, not emit FALSE-as-TRUE."""
    from kafka_streams_in_action_spark.registry import SchemaRegistry

    reg = SchemaRegistry(str(tmp_path / "r.json"))
    sid = reg.get_or_create("t-value", '{"a": 1}')
    assert reg.get_or_create("t-value", '{"a": 1}') == sid
    # key-order-insensitive canonicalization (assertSchema semantics)
    assert reg.get_or_create("t-value", '{ "a" : 1 }') == sid
    reloaded = SchemaRegistry(str(tmp_path / "r.json"))
    assert reloaded.latest("t-value")[0] == sid


# -------------------------------------------------------------- hamming

def test_hamming_identical_vector_is_nearest(spark):
    """A duplicated vector has Hamming distance 0 to its twin and must
    rank first; an all-flipped vector is farthest (64)."""
    from kafka_streams_in_action_spark.operators import similarity

    base = [1.0 if i % 3 else -1.0 for i in range(64)]
    emb = spark.createDataFrame(
        [(0, base, 0), (50, list(base), 0),
         (51, [-v for v in base], 1)],
        "vec_id long, embedding array<float>, label int")
    out = (similarity.hamming_topk(emb)
           .filter(F.col("query_id") == 0).orderBy("rn").collect())
    assert out[0].neighbor_id == 50 and out[0].hamming == 0
    assert out[-1].neighbor_id == 51 and out[-1].hamming == 64


def test_hamming_signature_packs_msb_first(spark):
    """Spot-check the bit packing: only dim 1 positive → hi = 2^31;
    only dim 64 positive → lo = 1 (distance pins both words)."""
    from kafka_streams_in_action_spark.operators import similarity

    v_hi = [1.0] + [-1.0] * 63
    v_lo = [-1.0] * 63 + [1.0]
    zeros = [-1.0] * 64
    emb = spark.createDataFrame(
        [(0, zeros, 0), (50, v_hi, 0), (51, v_lo, 0)],
        "vec_id long, embedding array<float>, label int")
    out = {r.neighbor_id: r.hamming
           for r in similarity.hamming_topk(emb)
           .filter(F.col("query_id") == 0).collect()}
    assert out[50] == 1 and out[51] == 1


# ------------------------------------------------------------------ l28

def test_l28_buckets_and_window(spark):
    """Users: 3 active days, 10 active days, and one only active 40
    days ago (outside the 28-day window → excluded entirely)."""
    from kafka_streams_in_action_spark.operators import event_time

    rows = []
    eid = 0
    for d in range(3):
        rows.append((eid, 1, d, "view", 1.0)); eid += 1
    for d in range(10):
        rows.append((eid, 2, d, "view", 1.0)); eid += 1
    rows.append((eid, 3, -40 + 0, "view", 1.0)); eid += 1  # stale user
    ev = spark.createDataFrame(
        [(e, TS0 + dt.timedelta(days=d), u, t, v, "{}")
         for e, u, d, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = {r.bucket: r for r in event_time.l28_histogram(ev).collect()}
    assert out[0].n_users == 1 and (out[0].days_lo, out[0].days_hi) == (1, 7)
    assert out[1].n_users == 1
    assert sum(r.n_users for r in out.values()) == 2
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-12


# ----------------------------------------------------------------- zipf

def test_zipf_exact_power_law_recovers_slope(spark):
    """A synthetic corpus with freq(w_r) = round(1000·r^(-0.8)) must fit
    slope ≈ −0.8 (quantization noise only)."""
    from kafka_streams_in_action_spark.operators import text as t

    words = []
    for r in range(1, 41):
        f = max(1, round(1000 * r ** -0.8))
        words += [f"w{r:03d}"] * f
    docs = _docs(spark, [(1, " ".join(words), "en", "a")])
    row = t.zipf_fit(docs, top_n=40).collect()[0]
    assert row.n_terms == 40
    assert -0.85 < row.slope < -0.75
    # intercept in ln-space: ln(1000) ≈ 6.9
    assert 6.0 < row.intercept < 7.5


def test_zipf_uniform_corpus_slope_zero(spark):
    """All words equally frequent → slope exactly 0 (every y is
    identical, so the covariance numerator is 0)."""
    from kafka_streams_in_action_spark.operators import text as t

    docs = _docs(spark, [(1, " ".join(
        f"w{i}" for i in range(30)) + " " + " ".join(
        f"w{i}" for i in range(30)), "en", "a")])
    row = t.zipf_fit(docs, top_n=30).collect()[0]
    assert row.slope == 0.0


# ------------------------------------------------------------ letterbox

def test_letterbox_detects_exact_bars(spark):
    """The detector must recover the modular bar rule from pixels:
    doc 3 → top 1 / bottom 1; doc 4 → none; doc 1 → top only."""
    from kafka_streams_in_action_spark.operators import multimodal

    docs = _docs(spark, [(1, "abc", "en", "a"), (3, "abcd", "en", "a"),
                         (4, "ab", "en", "a")])
    out = {r.doc_id: r for r in multimodal.letterbox_detect(
        multimodal.letterbox_media(docs)).collect()}
    assert (out[1].top_bars, out[1].bottom_bars) == (1, 0)
    assert (out[3].top_bars, out[3].bottom_bars) == (1, 1)
    assert (out[4].top_bars, out[4].bottom_bars) == (0, 0)
    assert out[4].letterboxed is False and out[3].letterboxed is True
    assert out[3].content_height == out[3].height - 2


def test_letterbox_payload_never_shuffles(spark):
    """Kernel discipline: the full plan must contain no Exchange —
    encode, mutate, and detect all happen inside Arrow kernels."""
    from kafka_streams_in_action_spark.operators import multimodal
    from kafka_streams_in_action_spark.plans.queries import QUERIES

    from .conftest import SF_DIR
    df = QUERIES["c31_letterbox"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------------------- m4

def test_m4_single_bucket_semantics(spark):
    """A 3-day series in one bucket: first/last follow the day axis,
    min/max the values."""
    from kafka_streams_in_action_spark.operators import scalars

    ev = _daily_events(spark, [5.0, 1.0, 3.0])
    out = scalars.m4_downsample(ev, n_buckets=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.v_first, r.v_min, r.v_max, r.v_last) == (5000, 1000,
                                                       5000, 3000)
    assert r.n_days == 3 and r.bucket == 0


def test_m4_preserves_global_extremes(spark):
    """M4's defining guarantee: the global min and max of the series
    survive the reduction (they are some bucket's v_min/v_max)."""
    from kafka_streams_in_action_spark.operators import scalars

    vals = [float(((i * 37) % 100) - 50) for i in range(60)]
    ev = _daily_events(spark, vals)
    out = scalars.m4_downsample(ev).collect()
    assert min(r.v_min for r in out) == round(min(vals) * 1000)
    assert max(r.v_max for r in out) == round(max(vals) * 1000)
    assert len({r.bucket for r in out}) == 8
    # buckets tile the axis: every day lands in exactly one bucket
    assert sum(r.n_days for r in out) == 60


def test_l28_stream_checkpoint_restart_carries_bitmask(spark, tmp_path):
    """A17 durability for SET state: stop the bitmask stream mid-log,
    restart from the same checkpoint with new files — set bits must
    round-trip the state store, so the bit_or-folded masks popcount to
    the exact batch distinct-day counts."""
    from kafka_streams_in_action_spark.operators import event_time
    from kafka_streams_in_action_spark.sources.parquet import load_table
    from kafka_streams_in_action_spark.streaming import stateful

    from .conftest import SF_DIR
    ev = load_table(spark, "events", SF_DIR)
    d_end = ev.agg(F.max(F.to_date("ts"))).collect()[0][0]
    d = str(tmp_path / "l28_src")
    cp = str(tmp_path / "l28_cp")
    from pyspark.sql import Window
    sliced = ev.withColumn(
        "slice", F.ntile(4).over(Window.orderBy("ts", "event_id")))

    def write_slices(lo, hi):
        for s in range(lo, hi + 1):
            (sliced.filter(F.col("slice") == s).drop("slice")
             .coalesce(1).write.mode("append").parquet(d))

    sink = str(tmp_path / "l28_sink")

    def run():
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", 1).parquet(d)
                  .withColumn("day_off",
                              F.datediff(F.lit(d_end), F.to_date("ts")))
                  .filter((F.col("day_off") >= 0)
                          & (F.col("day_off") < 28))
                  .select("user_id", "day_off"))
        q = (stateful.l28_bitmask_stream(stream)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", cp)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    write_slices(1, 2)
    run()
    write_slices(3, 4)
    run()

    got = {r.user_id: r.n for r in
           (spark.read.parquet(sink).groupBy("user_id")
            .agg(F.bit_or("mask").alias("mask"))
            .select("user_id",
                    F.bit_count("mask").cast("long").alias("n"))
            .collect())}
    ud = (ev.filter(F.datediff(F.lit(d_end), F.to_date("ts")) < 28)
          .select("user_id", F.to_date("ts").alias("day")).distinct()
          .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
    expect = {r.user_id: r.n for r in ud.collect()}
    assert got == expect


# ------------------------------------------------------------------ stl

def test_stl_decomposition_reconstructs_exactly(spark):
    """Additive identity: trend + seasonal + residual == vm/1000 (in
    milli: the three doubles reconstruct the observation) for every
    interior day, and a pure weekly pattern lands entirely in the
    seasonal component (residual ≈ 0)."""
    from kafka_streams_in_action_spark.operators import windows as wops

    weekly = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    ev = _daily_events(spark, weekly * 6)
    out = wops.stl_decompose(ev).collect()
    assert len(out) == 42 - 6  # interior days only
    for r in out:
        recon = r.trend + r.seasonal + r.residual
        assert abs(recon - r.vm) < 1e-6  # components are in milli units
        assert abs(r.residual) < 1e-9  # pure seasonality, no noise


def test_stl_linear_trend_has_zero_seasonal(spark):
    """A straight line decomposes to trend = the line, seasonal ≈ 0:
    the centered 7-day MA of a line is the line, so detrended ≡ 0."""
    from kafka_streams_in_action_spark.operators import windows as wops

    ev = _daily_events(spark, [float(i) for i in range(30)])
    out = wops.stl_decompose(ev).collect()
    for r in out:
        assert abs(r.trend - r.vm) < 1e-9
        assert r.seasonal == 0.0 and r.residual == 0.0


# -------------------------------------------------------------- heatmap

def test_heatmap_counts_and_shares(spark):
    """Hand-built events at known dow/hour cells; shares sum to 1 per
    type; 2024-01-01 is a Monday → dow 0."""
    from kafka_streams_in_action_spark.operators import event_time

    rows = [
        (0, TS0.replace(hour=10), 1, "view", 1.0, "{}"),   # Mon 10
        (1, TS0.replace(hour=10), 2, "view", 1.0, "{}"),   # Mon 10
        (2, (TS0 + dt.timedelta(days=1)).replace(hour=3),
         1, "view", 1.0, "{}"),                            # Tue 03
        (3, TS0.replace(hour=5), 1, "click", 1.0, "{}"),   # Mon 05
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {(r.event_type, r.dow, r.hour): r
           for r in event_time.hour_of_week_heatmap(ev).collect()}
    assert out[("view", 0, 10)].n == 2
    assert out[("view", 1, 3)].n == 1
    assert out[("click", 0, 5)].share == 1.0
    view_shares = [r.share for k, r in out.items() if k[0] == "view"]
    assert abs(sum(view_shares) - 1.0) < 1e-12


# ------------------------------------------------------- pruning / dpp

def test_pruning_audit_layout_and_counts(spark, tmp_path):
    """The day-partitioned layout holds one directory per distinct day;
    the audit's counts reflect the real filesystem and the rank-window
    selection, and the per-day aggregates equal a direct filter."""
    import os

    from kafka_streams_in_action_spark.operators import layout as lops

    ev = _daily_events(spark, [float(i % 7) for i in range(12)])
    out = lops.partition_pruning_audit(
        spark, ev, str(tmp_path / "pr"), n_days=5).collect()
    dirs = [d for d in os.listdir(str(tmp_path / "pr" / "by_day"))
            if d.startswith("day=")]
    assert len(dirs) == 12
    assert len(out) == 5
    assert all(r.n_partitions_total == 12 for r in out)
    assert all(r.n_partitions_selected == 5 for r in out)
    # selected window = ranked days 3..7 (0-indexed 2..6)
    sel_days = sorted(r.day.isoformat() for r in out)
    all_days = sorted(d.split("=", 1)[1] for d in dirs)
    assert sel_days == all_days[2:7]


def test_dpp_audit_matches_direct_filter(spark, tmp_path):
    """The DPP join (no literal fact filter) must agree with the direct
    filtered aggregate — and the operator raises if Catalyst failed to
    plan a dynamicpruningexpression (verdict earned in-build)."""
    from kafka_streams_in_action_spark.operators import layout as lops

    ev = _daily_events(spark, [float(i) for i in range(10)], "view")
    out = {r.day.isoformat(): r for r in lops.dpp_join_audit(
        spark, ev, str(tmp_path / "dpp")).collect()}
    days = sorted({(TS0 + dt.timedelta(days=i)).date().isoformat()
                   for i in range(10)})
    assert sorted(out) == days[2:5]
    for i, d in enumerate(days[2:5], start=2):
        assert out[d].n_rows == 1
        assert out[d].value_milli == i * 1000
        assert out[d].dpp_planned is True


# ---------------------------------------------------------- asof + tol

def test_asof_tolerance_drops_stale_state(spark):
    """An order 40 days old is the latest at/before the event but
    outside the 30-day bound → NULL payload; a 10-day-old order
    serves; and among two in-window orders the newer wins."""
    from kafka_streams_in_action_spark.operators import joins

    ev = spark.createDataFrame(
        [(1, TS0 + dt.timedelta(days=100), 7, "view", 1.0, "{}"),
         (2, TS0 + dt.timedelta(days=100), 8, "view", 1.0, "{}"),
         (3, TS0 + dt.timedelta(days=100), 9, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    orders = spark.createDataFrame(
        [(100, 7, TS0 + dt.timedelta(days=60), 10.0),   # 40d: stale
         (200, 8, TS0 + dt.timedelta(days=90), 20.0),   # 10d: fresh
         (201, 8, TS0 + dt.timedelta(days=85), 30.0),   # older in-window
         ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double")
    out = {r.event_id: r for r in
           joins.asof_join_tolerance(ev, orders).collect()}
    assert out[1].o_orderkey is None          # stale state suppressed
    assert out[2].o_orderkey == 200           # newest in-window wins
    assert out[3].o_orderkey is None          # no candidate at all


# ----------------------------------------------------- seasonal anomaly

def test_seasonal_anomaly_ignores_pure_weekly_pattern(spark):
    """A pure weekly pattern has zero residual everywhere → zero
    variance → no alarms and NULL z (the raw z-score row would flag the
    peaks; the decomposition removes them)."""
    from kafka_streams_in_action_spark.operators import windows as wops

    weekly = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    out = wops.seasonal_anomalies(
        _daily_events(spark, weekly * 6)).collect()
    assert len(out) == 36
    assert all(r.res_int == 0 for r in out)
    assert all(r.z is None for r in out)
    assert not any(r.is_anomaly for r in out)


def test_seasonal_anomaly_flags_injected_outage(spark):
    """The same weekly pattern with ONE quiet-peak-day outage: only
    days near the injection alarm, and the outage day's z is the most
    negative."""
    from kafka_streams_in_action_spark.operators import windows as wops

    weekly = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    vals = weekly * 8
    vals[24] = 0.5  # a Thursday peak collapses (index 24 = dow 3)
    out = wops.seasonal_anomalies(_daily_events(spark, vals)).collect()
    flagged = [r for r in out if r.is_anomaly]
    assert flagged, "the injected outage must alarm"
    day24 = TS0 + dt.timedelta(days=24)
    worst = min(out, key=lambda r: r.z if r.z is not None else 0.0)
    assert worst.day == day24.date()
    assert worst.is_anomaly and worst.z < -3.0
