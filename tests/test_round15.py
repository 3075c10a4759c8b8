"""Round-15 operator behavior tests — the session-window streaming twin
(C24-s), the persisted bloom index (C6b+), incremental Z-order
maintenance (C37+), version restore (C35+), the retrieval-eval
extensions AP@k and ROC-AUC (C43c/C43d), scaler fit stats (C42f),
exact higher moments (C33+), weighted SSSP (C38+), the code detector
(C30+), and the patch-grid tiler (C31+).

Oracle parity for every registered row is covered by tests/test_oracle.py
and the driver sim; these pin the behavioral contracts the oracles can't
express (sentinel flush, index roundtrip on disk, incrementality,
regression detection, metric edge cases)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import (
    features, graph, joins, layout, multimodal, relational, similarity,
    text,
)

TS0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _events(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    return spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for (i, ts, u, t, v) in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")


def _emb(spark, rows):
    """rows: (vec_id, label, [floats])"""
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>")


# ----------------------------------------------------- session twin


def test_session_stream_matches_batch_in_append_mode(spark):
    """The driver wrapper's append-mode + sentinel flush must equal the
    batch sessionization exactly — including a session that ends close
    to the corpus end (the row append mode would lose without the
    sentinel)."""
    from kafka_streams_in_action_spark.operators.event_time import (
        session_counts,
    )
    from kafka_streams_in_action_spark.plans.queries import QUERIES
    from kafka_streams_in_action_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    batch = {(r["user_id"], r["session_start"], r["n"]):
             round(r["sum_value"], 6)
             for r in session_counts(
                 load_table(spark, "events", sf)).collect()}
    stream = {(r["user_id"], r["session_start"], r["n"]):
              round(r["sum_value"], 6)
              for r in QUERIES["c24_session_stream"].fn(spark, sf)
              .collect()}
    assert stream == batch
    assert len(stream) > 0


# ----------------------------------------------------- bloom index


def test_bloom_index_roundtrip_and_counts(spark, tmp_path):
    orders = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 10)],
        "o_orderkey long, o_custkey long")
    cust = spark.createDataFrame(
        [(10, "BUILDING"), (20, "AUTO"), (30, "BUILDING")],
        "c_custkey long, c_mktsegment string")
    row = joins.bloom_index_persist(
        spark, orders, cust, str(tmp_path / "idx")).collect()[0]
    assert row["n_orders"] == 4 and row["n_matched"] == 3
    assert row["roundtrip_exact"] and row["no_false_negatives"]
    assert row["index_bounded"]


# ----------------------------------------------- zorder maintenance


def test_zorder_maintain_repairs_fragmentation(spark, tmp_path):
    rows = [(i, TS0 + dt.timedelta(minutes=i), i % 7, "view", 1.0)
            for i in range(400)]
    out = layout.zorder_maintain_verdict(
        spark, _events(spark, rows), str(tmp_path)).collect()[0]
    assert out["n_rows"] == 400
    assert out["pre_fragmented"] is True
    assert out["post_disjoint"] is True
    assert out["readback_complete"] is True
    assert out["incremental"] is True


# ------------------------------------------------------- restore


def test_restore_detects_regression_and_serves_last_good(spark, tmp_path):
    rows = [(i, TS0 + dt.timedelta(minutes=i), i % 3, "view", 1.0)
            for i in range(50)]
    out = layout.restore_version(
        spark, _events(spark, rows), str(tmp_path)).collect()[0]
    assert out["regression_detected"] and out["restored"]
    assert out["serving_rows"] == 50 and out["serving_complete"]


# ----------------------------------------------------------- AP@k


def test_map_eval_perfect_agreement_scores_one(spark):
    # 12 one-hot-ish vectors exactly representable after int8
    # dequantization (values 0 and 127/127) — both rankings identical,
    # so AP = 1.0 for every query
    rows = [(i, "a", [1.0 if j == i % 4 else 0.0 for j in range(4)])
            for i in range(12)]
    out = similarity.map_eval(_emb(spark, rows)).collect()
    assert len(out) == 10
    for r in out:
        assert r["n_hits"] == 10
        assert r["ap_num"] == r["ap_den"] == 25200
        assert r["ap"] == 1.0 and r["p_at_k_ppm"] == 1_000_000


def test_ap_lcm_terms_are_exact():
    assert all(2520 % i == 0 for i in range(1, 11))


# --------------------------------------------------------- ROC-AUC


def test_auc_perfectly_separable_labels_score_one(spark):
    # two orthogonal clusters: cosine to own centroid 1.0, to the
    # other 0.0 — AUC must be exactly 1.0 for both label detectors
    rows = ([(i, "a", [1.0, 0.0]) for i in range(5)]
            + [(100 + i, "b", [0.0, 1.0]) for i in range(5)])
    out = {r["label"]: r for r in
           similarity.auc_eval(_emb(spark, rows)).collect()}
    for lbl in ("a", "b"):
        r = out[lbl]
        assert r["n_pos"] == 5 and r["n_neg"] == 5
        assert r["auc_num"] == r["auc_den"] == 50
        assert r["auc"] == 1.0


def test_auc_all_tied_scores_half(spark):
    # identical vectors with different labels: every score ties, so
    # AUC = 0.5 exactly (the half-tie credit)
    rows = [(1, "a", [1.0, 1.0]), (2, "b", [1.0, 1.0]),
            (3, "a", [1.0, 1.0]), (4, "b", [1.0, 1.0])]
    out = {r["label"]: r for r in
           similarity.auc_eval(_emb(spark, rows)).collect()}
    assert out["a"]["auc"] == 0.5 and out["b"]["auc"] == 0.5


# ------------------------------------------------------ scaler fit


def test_scaler_stats_known_values(spark):
    li = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0)],
        "l_returnflag string, l_extendedprice double")
    r = features.scaler_stats(li).collect()[0]
    assert r["n_rows"] == 4
    assert r["min_cents"] == 100 and r["max_cents"] == 400
    assert r["mean_cents"] == 250.0
    assert r["var_cents2"] == 12500.0   # population var of 100..400
    # z of min = (100-250)/sqrt(12500) = -1.34164…; floor(x·1000 + .5)
    # is half-up toward +∞, so -1341.64 → -1342 and +1341.64 → +1342
    assert r["zmin_milli"] == -1342
    assert r["zmax_milli"] == 1342
    assert r["range_cents"] == 300


def test_scaler_stats_constant_segment_guards_z(spark):
    li = spark.createDataFrame(
        [("C", 5.0), ("C", 5.0)],
        "l_returnflag string, l_extendedprice double")
    r = features.scaler_stats(li).collect()[0]
    assert r["var_cents2"] == 0.0
    assert r["zmin_milli"] is None and r["zmax_milli"] is None


# --------------------------------------------------------- moments


def test_moments_symmetric_data_has_zero_skew(spark):
    li = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 3.0)],
        "l_returnflag string, l_extendedprice double")
    r = relational.group_moments(li).collect()[0]
    assert r["mean_cents"] == 200.0
    assert abs(r["skewness"]) < 1e-12
    # uniform 3-point distribution: kurtosis = 1.5, excess = -1.5
    assert abs(r["ex_kurtosis"] + 1.5) < 1e-12
    assert r["s1_cents"] == "600"


def test_moments_constant_group_guards_shape(spark):
    li = spark.createDataFrame(
        [("C", 7.0), ("C", 7.0)],
        "l_returnflag string, l_extendedprice double")
    r = relational.group_moments(li).collect()[0]
    assert r["skewness"] is None and r["ex_kurtosis"] is None


# ------------------------------------------------------------ SSSP


def test_sssp_relaxes_through_cheaper_two_hop_path(spark):
    # nations 0,1,2; direct edge 0→2 cost 4 (w=7: 1+7%4=4), two-hop
    # 0→1→2 costs 1+1=2 (w=4 each: 1+0) — relaxation must prefer it.
    # Edge weights come from lineitem counts, so build exact counts.
    nation = spark.createDataFrame(
        [(0, "N0"), (1, "N1"), (2, "N2")],
        "n_nationkey long, n_name string")
    cust = spark.createDataFrame(
        [(10, 0), (11, 1)], "c_custkey long, c_nationkey long")
    supp = spark.createDataFrame(
        [(20, 1), (21, 2)], "s_suppkey long, s_nationkey long")
    # orders per customer; lineitems pick supplier → edge (c_nat→s_nat)
    orders = spark.createDataFrame(
        [(100, 10), (101, 11)], "o_orderkey long, o_custkey long")
    li_rows = ([(100, 20)] * 4        # 0→1 w=4 → cost 1
               + [(100, 21)] * 7      # 0→2 w=7 → cost 4
               + [(101, 21)] * 4)     # 1→2 w=4 → cost 1
    li = spark.createDataFrame(
        [(o, s) for (o, s) in li_rows], "l_orderkey long, l_suppkey long")
    out = {r["nationkey"]: r for r in
           graph.sssp_trade(cust, orders, li, supp, nation,
                            source=0).collect()}
    assert out[0]["dist_cost"] == 0
    assert out[1]["dist_cost"] == 1
    assert out[2]["dist_cost"] == 2          # via 1, not the direct 4
    assert out[2]["is_farthest"] and out[2]["n_reached"] == 3


# ------------------------------------------------------ code detect


def test_code_detect_fires_on_planted_rows_only(spark):
    docs = spark.createDataFrame(
        [(11, "s", "the quick brown fox jumps over the lazy dog"),
         (12, "s", "the quick brown fox jumps over the lazy dog")],
        "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in text.code_detect(docs).collect()}
    assert out[11]["is_code"] is True       # 11 % 11 == 0 → planted
    assert out[12]["is_code"] is False
    assert out[11]["n_semi"] == 2 and out[12]["n_semi"] == 0
    assert out[12]["n_sym"] == 0


# ------------------------------------------------------------ tiles


def test_tile_stats_match_pixel_formula(spark):
    docs = spark.createDataFrame(
        [(3, "s", "x" * 20)], "doc_id long, source string, text string")
    media = multimodal.to_bmp_media(docs)
    out = {(r["tile_x"], r["tile_y"]): r
           for r in multimodal.tile_stats(media).collect()}
    w, h = multimodal._bmp_dims(3, 20)
    # recompute every tile from the fixture pixel formula + the same
    # integer tile-index arithmetic the oracle uses
    exp = {}
    for i in range(w * h * 3):
        y, x = i // (3 * w), (i % (3 * w)) // 3
        key = ((x * 4) // w, (y * 3) // h)
        n, s = exp.get(key, (0, 0))
        exp[key] = (n + 1, s + (3 * 31 + i * 7) % 256)
    assert set(out) == set(exp) and len(out) == 12
    for key, (n, s) in exp.items():
        assert out[key]["n_bytes"] == n
        assert out[key]["sum_val"] == s
        assert out[key]["mean_milli"] == s * 1000 // n


def test_tumbling_and_sliding_streams_match_batch_in_append_mode(spark):
    """C22-s/C23-s: the shared sentinel harness must flush every real
    window in append mode — equality with the batch forms, including
    the windows near the corpus end."""
    from kafka_streams_in_action_spark.operators.event_time import (
        sliding_counts, tumbling_counts,
    )
    from kafka_streams_in_action_spark.plans.queries import QUERIES
    from kafka_streams_in_action_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, "events", sf)
    b_t = {(r["hour_start"], r["event_type"], r["n"]):
           round(r["sum_value"], 6) for r in tumbling_counts(ev).collect()}
    s_t = {(r["hour_start"], r["event_type"], r["n"]):
           round(r["sum_value"], 6)
           for r in QUERIES["c22_tumbling_stream"].fn(spark, sf).collect()}
    assert s_t == b_t and len(s_t) > 0
    b_s = {(r["win_start"], r["n"]): round(r["sum_value"], 6)
           for r in sliding_counts(ev).collect()}
    s_s = {(r["win_start"], r["n"]): round(r["sum_value"], 6)
           for r in QUERIES["c23_sliding_stream"].fn(spark, sf).collect()}
    assert s_s == b_s and len(s_s) > 0


# ----------------------------------------------------- slicer ranks


def test_write_time_slices_exact_ntile_without_global_sort(spark, tmp_path):
    """The distributed-rank slicer must reproduce EXACT ntile(4) over
    (ts, event_id): 17 rows → slice sizes 5,4,4,4, every slice a
    contiguous time range, file mtimes strictly increasing."""
    import os

    from kafka_streams_in_action_spark.plans.queries import (
        _write_time_slices,
    )

    rows = [(i, TS0 + dt.timedelta(minutes=i), 1, "view", 1.0)
            for i in range(17)]
    src = str(tmp_path / "slices")
    os.makedirs(src)
    _write_time_slices(_events(spark, rows), src)
    files = sorted(
        (os.path.getmtime(os.path.join(src, f)), f)
        for f in os.listdir(src)
        if f.endswith(".parquet") and not f.startswith(("_", ".")))
    mtimes = [m for m, _ in files]
    assert mtimes == sorted(set(mtimes)), "mtimes must strictly increase"
    seen = []
    sizes = []
    for _m, f in files:
        ids = sorted(r["event_id"] for r in
                     spark.read.parquet(os.path.join(src, f)).collect())
        if ids:
            seen.append(ids)
            sizes.append(len(ids))
    assert sizes == [5, 4, 4, 4]
    flat = [i for ids in seen for i in ids]
    assert flat == list(range(17)), "slices must partition the time order"
