"""Round-16 third-tranche property tests: the new operators recomputed
by independent brute-force references on seeded random small inputs.
These catch the class of error the fixed-example tests in
test_round16.py cannot (median tie/parity handling across random
group sizes, MV merge vs recompute under random day mixes, outer-join
null extension under random match densities, byte-estimate drift)."""

from __future__ import annotations

import datetime as dt
import hashlib
import random

from kafka_streams_in_action_spark.operators import features, layout
from kafka_streams_in_action_spark.streaming.joins import (
    windowed_click_view_left_join,
)

TS0 = dt.datetime(2024, 5, 1)


def _masked(i: int) -> bool:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 7 == 0


def test_median_imputer_random_groups_match_reference(spark):
    """Low median + impute sum == the sort-based reference for random
    group sizes and value distributions (odd/even parity, heavy ties,
    all-masked groups dropped on both sides)."""
    rnd = random.Random(41)
    rows = []
    for i in range(500):
        rows.append((i, rnd.choice("pqrs"), TS0,
                     float(rnd.randint(0, 40)) / 4))
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, "
              "value double")
    got = {r.event_type: r for r in
           features.median_impute(ev).collect()}

    by_type: dict = {}
    for i, t, _, v in rows:
        by_type.setdefault(t, []).append((i, int(v * 1000 + 0.5)))
    for t, vals in by_type.items():
        present = sorted(vm for i, vm in vals if not _masked(i))
        if not present:
            assert t not in got
            continue
        med = present[(len(present) + 1) // 2 - 1]
        assert got[t].median_milli == med, t
        assert got[t].n_present == len(present)
        assert got[t].n_missing == len(vals) - len(present)
        assert got[t].imputed_sum_milli == sum(
            med if _masked(i) else vm for i, vm in vals)


def test_mv_refresh_random_day_mix_equals_recompute(spark, tmp_path):
    """Incremental v2 == full recompute for a random day/type mix
    (including types that exist ONLY in the delta days and types that
    vanish before the split — the insert-new-key and keep-old-key
    merge paths)."""
    rnd = random.Random(97)
    rows = []
    for i in range(600):
        day = rnd.randint(0, 9)
        # 'new' appears only in the last 2 days; 'old' only before
        t = ("new" if day >= 8 else
             "old" if day <= 5 and rnd.random() < 0.3 else
             rnd.choice("xy"))
        rows.append((i, TS0 + dt.timedelta(days=day, hours=i % 5),
                     i % 3, t, float(rnd.randint(0, 100)) / 8))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = layout.mv_incremental_refresh(
        spark, ev, str(tmp_path / "mv")).collect()
    assert all(r.refresh_exact and r.untouched_identical for r in out)
    ref: dict = {}
    for i, ts, u, t, v in rows:
        k = (t, ts.date())
        n, vm = ref.get(k, (0, 0))
        ref[k] = (n + 1, vm + int(v * 1000 + 0.5))
    got = {(r.event_type, r.day): (r.n_events, r.value_milli)
           for r in out}
    assert got == ref


def test_left_outer_window_join_random_density(spark):
    """Batch-applied left-outer windowed join == the brute-force
    reference under random click/view densities (multi-match fan-out,
    empty-hour nulls)."""
    rnd = random.Random(7)
    rows = []
    for i in range(300):
        rows.append((i, rnd.randint(0, 5),
                     "click" if rnd.random() < 0.3 else "view",
                     TS0 + dt.timedelta(hours=rnd.randint(0, 5),
                                        minutes=rnd.randint(0, 59)),
                     0.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")
    got = sorted((r.user_id, r.click_id, r.view_id)
                 for r in windowed_click_view_left_join(ev).collect())
    clicks = [(i, u, ts.replace(minute=0)) for i, u, t, ts, _ in rows
              if t == "click"]
    views = [(i, u, ts.replace(minute=0)) for i, u, t, ts, _ in rows
             if t == "view"]
    ref = []
    for ci, cu, cw in clicks:
        matches = [vi for vi, vu, vw in views if vu == cu and vw == cw]
        if matches:
            ref.extend((cu, ci, vi) for vi in matches)
        else:
            ref.append((cu, ci, None))
    assert got == sorted(ref)


def test_join_advisor_byte_estimate_matches_reference(spark):
    """The advisor's build_bytes_est == rows*8*fixed + exact UTF-8
    octet sums, recomputed in Python over the same frames."""
    from kafka_streams_in_action_spark.operators.joins import (
        join_strategy_advisor)
    rnd = random.Random(3)
    orders = spark.createDataFrame(
        [(i, i % 37, rnd.choice(["O", "F"]),
          rnd.choice(["1-URGENT", "5-LOW", "3-MEDIUM"]))
         for i in range(400)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderpriority string")
    cust = spark.createDataFrame(
        [(i, i % 7, "name-%04d" % i, rnd.choice(["AUTO", "BUILDING"]))
         for i in range(37)],
        "c_custkey long, c_nationkey int, c_name string, "
        "c_mktsegment string")
    nat = spark.createDataFrame(
        [(i, "NATION%d" % i) for i in range(7)],
        "n_nationkey int, n_name string")
    li = spark.range(1000).selectExpr("id AS l_orderkey")
    out = {r.join_name: r for r in join_strategy_advisor(
        spark, li, orders, cust, nat, threshold_bytes=4000).collect()}

    o_rows = orders.collect()
    exp_orders = 32 * len(o_rows) + sum(
        len(r.o_orderstatus.encode()) + len(r.o_orderpriority.encode())
        for r in o_rows)
    c_rows = cust.collect()
    exp_cust = 24 * len(c_rows) + sum(
        len(r.c_name.encode()) + len(r.c_mktsegment.encode())
        for r in c_rows)
    assert out["lineitem_orders"].build_bytes_est == exp_orders
    assert out["orders_customer"].build_bytes_est == exp_cust
    assert out["lineitem_orders"].strategy == (
        "broadcast" if exp_orders < 4000 else "shuffle")
    assert all(r.plan_confirmed for r in out.values())


def test_mv_refresh_single_day_table_empty_v1(spark, tmp_path):
    """Edge: every row within the delta horizon (max day − 2 < min day)
    — v1 is an EMPTY MV and the refresh must still equal the full
    recompute (the bootstrap case of incremental maintenance)."""
    rows = [(i, TS0 + dt.timedelta(hours=i % 24), i % 3, "t", 1.0)
            for i in range(50)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = layout.mv_incremental_refresh(
        spark, ev, str(tmp_path / "mv")).collect()
    assert len(out) == 1
    r = out[0]
    assert r.refresh_exact and r.untouched_identical
    assert r.n_events == 50 and r.value_milli == 50000


def test_median_imputer_all_masked_group_dropped(spark):
    """Edge: a group whose every row is planted missing has no fittable
    statistic — it must be absent from the output on BOTH engines (the
    oracle's inner join drops it too)."""
    all_masked = [3, 7, 14, 18, 19, 26, 37, 48]  # md5 % 7 == 0
    rows = [(i, "gone", TS0, 1.0) for i in all_masked]
    rows += [(1, "kept", TS0, 2.0), (2, "kept", TS0, 4.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, "
              "value double")
    got = {r.event_type: r for r in
           features.median_impute(ev).collect()}
    assert "gone" not in got
    assert got["kept"].median_milli == 2000  # low median of {2000,4000}
