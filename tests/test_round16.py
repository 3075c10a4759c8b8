"""Round-14-session additions: r13 judge/ADVICE fixes (scoped
shuffle-partition override, derived bloom sizing, earned restore
verdict) and the r16 slate operators registered this session."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import graph, joins, layout

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


# ---------------------------------------------- scoped conf override


def test_few_shuffle_partitions_restores_on_success(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with graph._few_shuffle_partitions(spark, 4):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_few_shuffle_partitions_restores_on_raise(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(ValueError):
        with graph._few_shuffle_partitions(spark, 4):
            raise ValueError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


# ---------------------------------------------- derived bloom sizing


def test_bloom_index_derives_m_bits_and_stays_pruned(spark, tmp_path):
    """r13 ADVICE (medium): with fixed m_bits the filter saturates once
    keys >> m_bits/16 and 'pruned' flips false. Derived sizing must
    keep the pinned booleans TRUE with a build side much larger than
    the old fixed 2^14/16 = 1024-key saturation point."""
    n_cust = 6000  # >> 1024; every 3rd customer is BUILDING
    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.when(F.col("id") % 3 == 0, "BUILDING")
        .otherwise("AUTO").alias("c_mktsegment"))
    orders = spark.range(20000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") * 7919 % (n_cust * 4)).alias("o_custkey"))
    row = joins.bloom_index_persist(
        spark, orders, cust, str(tmp_path / "idx")).collect()[0]
    assert row["index_bounded"]
    assert row["roundtrip_exact"]
    assert row["no_false_negatives"]
    assert row["pruned"], "derived m_bits must keep the filter sub-saturated"


# ---------------------------------------------- earned restore verdict


def test_restore_verdict_earned_from_post_restore_read(spark, tmp_path):
    """r13 ADVICE (low): 'restored' must come from the post-restore
    serving read (path is v4 AND count equals the last good snapshot),
    not duplicate the regression flag."""
    rows = [(i, TS0 + dt.timedelta(minutes=i), i % 3, "view", 1.0)
            for i in range(60)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = layout.restore_version(spark, ev, str(tmp_path / "a")).collect()[0]
    assert out["regression_detected"] and out["restored"]
    assert out["serving_rows"] == 60 and out["serving_complete"]

    # sabotage: a re-publish that silently loses files must NOT report
    # restored=True (the exact failure the r13 ADVICE described — the
    # old code emitted restored as a copy of the regression flag).
    # Patch copytree to drop one parquet part from the copy.
    import os
    import shutil

    real_copytree = shutil.copytree

    def partial_copytree(src, dst, **kw):
        real_copytree(src, dst, **kw)
        parts = sorted(f for f in os.listdir(dst)
                       if f.endswith(".parquet"))
        os.remove(os.path.join(dst, parts[0]))
        crc = os.path.join(dst, f".{parts[0]}.crc")
        if os.path.exists(crc):
            os.remove(crc)

    shutil.copytree = partial_copytree
    try:
        out2 = layout.restore_version(
            spark, ev.repartition(4), str(tmp_path / "b")).collect()[0]
    finally:
        shutil.copytree = real_copytree
    assert out2["regression_detected"]
    assert not out2["restored"], "partial v4 must not report restored=True"
    assert not out2["serving_complete"]


# ------------------------------------------- r16 slate behavior tests


def _run_available_now(spark, stream_df, name):
    import uuid

    sink = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (stream_df.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish"
    return spark.table(sink)


def test_window_join_pairs_across_batches(spark, tmp_path):
    """A click arriving in batch 1 must still pair with a same-hour view
    arriving in batch 2 — the buffered-state contract of the windowed
    stream-stream join."""
    from kafka_streams_in_action_spark.streaming.joins import (
        windowed_click_view_join)

    schema = "event_id long, user_id long, event_type string, ts timestamp"
    b1 = spark.createDataFrame(
        [(1, 7, "click", TS0), (2, 7, "view", TS0.replace(minute=50)),
         (3, 8, "view", TS0)], schema)
    b2 = spark.createDataFrame(
        [(4, 7, "view", TS0.replace(minute=20)),
         (5, 8, "click", TS0.replace(hour=2))], schema)
    src = str(tmp_path / "src")
    b1.coalesce(1).write.mode("append").parquet(src)
    import time
    time.sleep(0.05)
    b2.coalesce(1).write.mode("append").parquet(src)

    out = _run_available_now(
        spark,
        windowed_click_view_join(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)),
        "winjoin_t")
    pairs = {(r["user_id"], r["click_id"], r["view_id"])
             for r in out.collect()}
    # click 1 pairs with views 2 (same batch) and 4 (later batch);
    # user 8's click is in hour 2, its view in hour 0 — no pair
    assert pairs == {(7, 1, 2), (7, 1, 4)}


def test_dedup_stream_suppresses_cross_batch_duplicate(spark, tmp_path):
    from kafka_streams_in_action_spark.streaming.stateful import (
        dedup_ids_stream)

    schema = ("event_id long, user_id long, event_type string, "
              "ts timestamp, value double")
    b1 = spark.createDataFrame(
        [(1, 7, "view", TS0, 1.0), (2, 7, "click", TS0, 2.0)], schema)
    b2 = spark.createDataFrame(
        [(1, 7, "view", TS0, 1.0),                       # retry of id 1
         (3, 8, "view", TS0.replace(minute=30), 3.0)], schema)
    src = str(tmp_path / "src")
    b1.coalesce(1).write.mode("append").parquet(src)
    import time
    time.sleep(0.05)
    b2.coalesce(1).write.mode("append").parquet(src)

    out = _run_available_now(
        spark,
        dedup_ids_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)),
        "dedup_t")
    rows = sorted((r["event_id"], r["value"]) for r in out.collect())
    assert rows == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_codec_advisor_verdicts(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, TS0, i % 5, "view", 1.5, '{"k":"abcdefabcdef"}')
         for i in range(2000)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = {r["codec"]: r for r in layout.codec_advisor(
        spark, ev, str(tmp_path)).collect()}
    assert set(out) == {"snappy", "gzip", "zstd", "lz4"}
    for c, r in out.items():
        assert r["n_rows"] == 2000 and r["readback_exact"], c
        assert r["beats_uncompressed"], c


def test_shallow_clone_isolated_from_append(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, TS0, i % 3, "view", 1.0, "{}") for i in range(100)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = layout.shallow_clone_verdict(
        spark, ev, str(tmp_path)).collect()[0]
    assert out["n_rows"] == 100
    assert out["zero_copy"] and out["snapshot_isolated"]
    assert out["clone_complete"]


def test_grouped_ols_fit_exact_slope(spark):
    from kafka_streams_in_action_spark.operators import udx

    # y = 200 + 300x cents on days 0,1,2 -> slope 300 cents/day
    rows = [(1, "1992-01-01", 2.00), (1, "1992-01-02", 5.00),
            (1, "1992-01-03", 8.00),
            # degenerate: single day
            (2, "1992-01-05", 4.00), (2, "1992-01-05", 9.00)]
    orders = spark.createDataFrame(
        [(c, F"{d} 00:00:00", p) for (c, d, p) in rows],
        "o_custkey long, o_orderdate string, o_totalprice double") \
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    out = {r["custkey"]: r for r in udx.grouped_ols_fit(orders).collect()}
    assert out[1]["slope_ppm"] == 300 * 1_000_000
    assert out[2]["slope_ppm"] is None
    assert out[1]["n_orders"] == 3 and out[2]["n_orders"] == 2


def test_dp_hist_noise_bounded_and_clamped(spark):
    from kafka_streams_in_action_spark.operators import privacy

    ev = spark.createDataFrame(
        [(i, TS0, i % 4, "view" if i % 2 else "click", 1.0, "{}")
         for i in range(40)]
        + [(100 + j, TS0, 1, f"rare{j}", 1.0, "{}") for j in range(8)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    true = {(r["event_type"], r["day"]): r["n"] for r in
            ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    out = privacy.dp_noisy_counts(ev).collect()
    assert {"event_type", "day", "released_n", "noise_bound"} == set(
        out[0].asDict())
    for r in out:
        n = true[(r["event_type"], r["day"])]
        assert max(0, n - 3) <= r["released_n"] <= n + 3
        assert r["released_n"] >= 0


def test_augment_crop_matches_brute_force(spark):
    import hashlib

    from kafka_streams_in_action_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(i, "x" * (20 + i), "en", "src0", 20 + i) for i in range(30)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r["doc_id"]: r for r in multimodal.augment_crops(
        multimodal.to_bmp_media(docs)).collect()}
    flips = set()
    for i in range(30):
        r = out[i]
        nb = 20 + i
        w, h = (nb % 29) + 4, (i % 13) + 3
        hx = hashlib.md5(str(i).encode()).hexdigest()
        h1, h2 = int(hx[:8], 16), int(hx[8:16], 16)
        cw, ch = max(1, w // 2), max(1, h // 2)
        x0, y0 = h1 % (w - cw + 1), h2 % (h - ch + 1)
        flip = h1 % 2 == 1
        flips.add(flip)
        assert (r["crop_x"], r["crop_y"], r["crop_w"], r["crop_h"],
                r["flipped"]) == (x0, y0, cw, ch, flip)
        s = sum((i * 31 + ((y0 + j // (cw * 3)) * w * 3
                           + x0 * 3 + (j % (cw * 3))) * 7) % 256
                for j in range(cw * ch * 3))
        assert r["crop_sum"] == s
        cx = x0 + cw - 1 if flip else x0
        assert r["corner_px"] == (i * 31 + (y0 * w * 3 + 3 * cx) * 7) % 256
    assert flips == {True, False}, "fixture must exercise both flip arms"


def test_calibration_bins_consistent(spark):
    from kafka_streams_in_action_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float((i * 7) % 5), 1.0], i % 3)
         for i in range(60)],
        "vec_id long, embedding array<double>, label int")
    out = similarity.calibration_eval(emb).collect()
    assert all(0 <= r["bin"] <= 9 for r in out)
    # total support per label = corpus size (every vector scores
    # against every label centroid)
    per_label = {}
    for r in out:
        per_label[r["label"]] = per_label.get(r["label"], 0) + r["n"]
        assert 0 <= r["n_pos"] <= r["n"]
        assert r["pos_rate_ppm"] == (1_000_000 * r["n_pos"]) // r["n"]
    assert set(per_label.values()) == {60}


def test_constraint_enforce_quarantines_exactly_planted(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, TS0, i % 3, "view", 0.0 if i == 13 else 2.5, "{}")
         for i in range(40)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    out = layout.constraint_enforce(spark, ev, str(tmp_path)).collect()[0]
    planted = len([i for i in range(40) if i % 13 == 0])
    assert out["n_quarantined"] == planted      # incl. the 0.0 row at 13
    assert out["n_published"] == 40 - planted
    assert out["split_complete"] and out["clean_verified"]
    assert out["quarantine_exact"]


def test_pseudonymize_preserves_join_and_injectivity(spark):
    from kafka_streams_in_action_spark.operators import privacy

    cust = spark.createDataFrame(
        [(i, "SEG" + str(i % 2)) for i in range(50)],
        "c_custkey long, c_mktsegment string")
    orders = spark.createDataFrame(
        [(i, i % 60) for i in range(300)],   # custkeys 50-59 dangle
        "o_orderkey long, o_custkey long")
    out = {r["segment"]: r for r in
           privacy.pseudonymize_join(cust, orders).collect()}
    raw = {r["c_mktsegment"]: (r["n"], r["d"]) for r in
           orders.join(cust, orders.o_custkey == cust.c_custkey)
           .groupBy("c_mktsegment")
           .agg(F.count(F.lit(1)).alias("n"),
                F.countDistinct("c_custkey").alias("d")).collect()}
    for seg, (n, d) in raw.items():
        assert out[seg]["n_orders"] == n
        assert out[seg]["n_active_tokens"] == d
        assert out[seg]["token_injective"]


def test_regression_eval_exact_metrics(spark):
    from kafka_streams_in_action_spark.operators import features

    # one priority, cents 100/200/600 -> pred = 300, r = -200,-100,300
    # mae_milli = 1000*600//3 = 200000; mse = (40000+10000+90000)//3
    orders = spark.createDataFrame(
        [("P1", 1.00), ("P1", 2.00), ("P1", 6.00)],
        "o_orderpriority string, o_totalprice double")
    out = features.regression_eval(orders).collect()[0]
    assert out["pred_cents"] == 300
    assert out["mae_milli"] == 200_000
    assert out["mse_cents2"] == (40000 + 10000 + 90000) // 3
    assert out["n"] == 3


# --------------------------------------------- plan-shape pins (r16)


def _n_exchanges(df) -> int:
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def test_augment_plan_is_scan_local(spark):
    """c31_augment is a 1→1 Arrow kernel over the scan — ZERO Exchange
    nodes; the payload bytes never shuffle."""
    from kafka_streams_in_action_spark.plans.queries import QUERIES
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = QUERIES["c31_augment"].fn(spark, sf)
    assert _n_exchanges(df) == 0


def test_dp_hist_plan_is_single_exchange(spark):
    """c40_dp_hist is ONE map-side-combinable keyed agg; the noise is
    post-agg column algebra — exactly one Exchange."""
    from kafka_streams_in_action_spark.plans.queries import QUERIES
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = QUERIES["c40_dp_hist"].fn(spark, sf)
    assert _n_exchanges(df) == 1


def test_ols_fit_plan_is_single_exchange_grouped_map(spark):
    """c21_ols_fit shuffles ONCE on the shard key into the grouped-map;
    no second shuffle may appear (the fit emits final rows)."""
    from kafka_streams_in_action_spark.plans.queries import QUERIES
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = QUERIES["c21_ols_fit"].fn(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert _n_exchanges(df) == 1


# ------------------------- round-14 continuation: third r16 tranche


def test_left_outer_window_join_column_algebra(spark):
    """C36d: batch-apply the streaming operator (withWatermark is a
    no-op on batch frames) — matched pairs + null-extension per
    unmatched click, keyed on (user, hour window)."""
    from kafka_streams_in_action_spark.streaming.joins import (
        windowed_click_view_left_join)
    rows = [
        # user 1: click+view same hour -> matched pair
        (1, 1, "click", dt.datetime(2024, 1, 1, 10, 5), 0.0),
        (2, 1, "view", dt.datetime(2024, 1, 1, 10, 50), 0.0),
        # user 1: click in the NEXT hour, no view there -> null row
        (3, 1, "click", dt.datetime(2024, 1, 1, 11, 5), 0.0),
        # user 2: view only -> contributes nothing (left side empty)
        (4, 2, "view", dt.datetime(2024, 1, 1, 10, 10), 0.0),
        # user 3: one click, two same-hour views -> two pairs
        (5, 3, "click", dt.datetime(2024, 1, 1, 9, 0), 0.0),
        (6, 3, "view", dt.datetime(2024, 1, 1, 9, 30), 0.0),
        (7, 3, "view", dt.datetime(2024, 1, 1, 9, 59), 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")
    got = sorted(
        (r.user_id, r.click_id, r.view_id)
        for r in windowed_click_view_left_join(ev).collect())
    assert got == [(1, 1, 2), (1, 3, None), (3, 5, 6), (3, 5, 7)]


def test_mv_refresh_verdicts_earned_and_exact(spark, tmp_path):
    """C35t: the refreshed MV must equal the full recompute with both
    verdicts earned; totals reconcile against the source."""
    base = dt.datetime(2024, 3, 1)
    rows = [(i, base + dt.timedelta(days=i % 5, hours=i % 7),
             i % 3, "t%d" % (i % 2), float(i) / 8) for i in range(400)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = layout.mv_incremental_refresh(
        spark, ev, str(tmp_path / "mv")).collect()
    assert all(r["refresh_exact"] for r in out)
    assert all(r["untouched_identical"] for r in out)
    # 2 types x 5 days, counts cover the source exactly
    assert len(out) == 10
    assert sum(r["n_events"] for r in out) == 400
    exp_vm = sum(int(i / 8 * 1000 + 0.5) for i in range(400))
    assert sum(r["value_milli"] for r in out) == exp_vm


def test_median_imputer_matches_python_reference(spark):
    """C42g: planted mask + low median + post-impute sum against a
    pure-Python replay of the same md5 mask."""
    import hashlib

    from kafka_streams_in_action_spark.operators.features import (
        median_impute)
    rows = [(i, "a" if i % 2 == 0 else "b", (i * 37) % 100 / 10.0)
            for i in range(300)]
    ev = spark.createDataFrame(
        [(i, t, dt.datetime(2024, 1, 1), v) for i, t, v in rows],
        "event_id long, event_type string, ts timestamp, value double")
    got = {r.event_type: r for r in median_impute(ev).collect()}

    def masked(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) % 7 == 0

    for t in ("a", "b"):
        vals = {i: int(v * 1000 + 0.5) for i, tt, v in rows if tt == t}
        present = sorted(v for i, v in vals.items() if not masked(i))
        med = present[(len(present) + 1) // 2 - 1]
        imputed = sum(med if masked(i) else v for i, v in vals.items())
        assert got[t].n_present == len(present)
        assert got[t].n_missing == len(vals) - len(present)
        assert got[t].median_milli == med
        assert got[t].imputed_sum_milli == imputed


def test_join_advisor_confirms_both_branches_and_restores_conf(spark):
    """C37n: force both branches with a tiny threshold split; the
    recommended plan must be confirmed and the broadcast conf must
    survive the scoped override."""
    li = spark.range(2000).selectExpr("id AS l_orderkey")
    orders = spark.range(500).selectExpr(
        "id AS o_orderkey", "id % 50 AS o_custkey",
        "'F' AS o_orderstatus", "'1-URGENT' AS o_orderpriority")
    cust = spark.range(50).selectExpr(
        # a varying key — a constant would be folded into a filter and
        # degrade the equi-join to a BNLJ (fixture artifact, not a plan)
        "id AS c_custkey", "CAST(id % 5 AS INT) AS c_nationkey",
        "concat('name-', id) AS c_name", "'BUILDING' AS c_mktsegment")
    nat = spark.range(5).selectExpr(
        "CAST(id AS INT) AS n_nationkey", "concat('N', id) AS n_name")
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    out = {r.join_name: r for r in joins.join_strategy_advisor(
        spark, li, orders, cust, nat,
        threshold_bytes=5000).collect()}
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    assert out["customer_nation"].strategy == "broadcast"   # ~100s of B
    assert out["lineitem_orders"].strategy == "shuffle"     # 500*32+B > 5k
    assert all(r.plan_confirmed for r in out.values())
    assert out["lineitem_orders"].build_rows == 500


def test_imputer_plan_shape_histogram_reduced(spark):
    """C42g plan pin: the corpus shuffles only as the (event_type,
    value_milli) histogram + final partial aggs — 3 hash exchanges, a
    broadcast model join-back, and no sort-merge join / corpus sort."""
    import os

    from kafka_streams_in_action_spark.operators.features import (
        median_impute)
    from kafka_streams_in_action_spark.sources.parquet import load_table
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")
    plan = (median_impute(load_table(spark, "events", sf))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mv_refresh_delta_filter_pushes_to_scan(spark):
    """C35t contract pin: the day-cast delta predicate must reach the
    parquet scan as a ts pushdown (Spark's cast-unwrapping) — the
    file-prune posture the docstring claims. A Spark upgrade that
    stops unwrapping the cast would fail here, loudly."""
    import datetime as _dt
    import os

    from pyspark.sql import functions as F

    from kafka_streams_in_action_spark.sources.parquet import load_table
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")
    ev = load_table(spark, "events", sf)
    flt = ev.filter(F.col("ts").cast("date") >= F.lit(_dt.date(2024, 1, 30)))
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in plan, plan


# ------------------- review fixes: version-sort and re-publish bugs


def test_vacuum_many_versions_serves_numeric_newest(spark, tmp_path):
    """Latent bug fix: with n_versions >= 11 a lexicographic sort ranks
    v9 above v10/v11, vacuums the TRUE newest snapshot and serves a
    stale partial one. Numeric ordering must keep the full v11 snapshot
    serving and complete."""
    ev = spark.createDataFrame(
        [(i, TS0, i % 3, "view", 1.0) for i in range(120)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")
    out = layout.vacuum_versions(
        spark, ev, str(tmp_path / "t"), n_versions=12, keep=2).collect()[0]
    # v11 holds event_id % 12 <= 11 == ALL rows; lexicographic order
    # would have served v9 (id % 12 <= 9) and failed completeness
    assert out["serving_rows"] == 120
    assert out["serving_unchanged"] and out["serving_complete"]
    assert out["n_removed"] == 10 and out["n_kept"] == 2


def test_wap_republish_same_base_dir(spark, tmp_path):
    """Latent bug fix: a second publish into the same base_dir used to
    crash on rename-onto-existing (ENOTEMPTY); re-publishing must swap
    the serving snapshot like a table-pointer update."""
    ev1 = spark.createDataFrame(
        [(i, TS0, 0, "view", 1.0) for i in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")
    ev2 = spark.createDataFrame(
        [(i, TS0, 0, "view", 2.0) for i in range(25)],
        ev1.schema)
    d = str(tmp_path / "wap")
    r1 = layout.wap_publish(spark, ev1, d).collect()[0]
    assert r1["published"] and r1["n_rows"] == 10
    r2 = layout.wap_publish(spark, ev2, d).collect()[0]
    assert r2["published"] and r2["n_rows"] == 25 and r2["readback_complete"]


def test_interleave_width_overflow_raises(spark):
    """Review fix: the 63-bit Morton-width guard must survive python -O
    (raise, not assert) — a wrapped shift silently corrupts Z-values."""
    with pytest.raises(ValueError, match="overflows"):
        layout.interleave_sql_n(["a", "b", "c", "d"], bits=16)


def test_scratch_dir_reaps_stale_orphans_only(tmp_path, monkeypatch):
    """SIGKILLed processes strand their scratch dirs (atexit never
    runs); _scratch_dir must reap same-prefix orphans older than the
    age cutoff and leave fresh (possibly live) ones alone."""
    import os
    import tempfile
    import time

    from kafka_streams_in_action_spark.plans import queries as Q
    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    stale = tempfile.mkdtemp(prefix="reaptest_")
    os.utime(stale, (time.time() - 3 * 3600, time.time() - 3 * 3600))
    fresh = tempfile.mkdtemp(prefix="reaptest_")
    new = Q._scratch_dir("reaptest_")
    assert not os.path.exists(stale), "3h-old orphan must be reaped"
    assert os.path.exists(fresh), "fresh dir must be preserved"
    assert os.path.exists(new)
