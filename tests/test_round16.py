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
