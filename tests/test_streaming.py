"""Streaming-vs-batch equivalence (SURVEY §5.3): each streaming operator run in
availableNow mode over a bounded source must equal its declared batch oracle
form — the reference's run-once pattern (A21) elevated to a harness."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import event_time
from kafka_streams_in_action_spark.sources.parquet import _EVENTS_RAW, load_table
from kafka_streams_in_action_spark.streaming import pipelines, stateful

from .conftest import SF_DIR, canonical


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Bounded streaming source: the events table as a parquet directory."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, "events", SF_DIR).write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, events_dir):
    return (
        spark.readStream.schema(
            load_table(spark, "events", SF_DIR).schema)
        .parquet(events_dir)
    )


def _run_to_memory(spark, sdf, name, output_mode="append"):
    q = (
        sdf.writeStream.format("memory").queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _assert_same(batch_df, stream_df):
    b_cols = batch_df.columns
    s_cols = stream_df.columns
    assert sorted(b_cols) == sorted(s_cols)
    b = canonical([tuple(r) for r in batch_df.collect()], b_cols)
    s = canonical([tuple(r) for r in stream_df.collect()], s_cols)
    assert b == s


@pytest.mark.parametrize("op_name,batch_fn,stream_fn,mode", [
    ("tumbling", event_time.tumbling_counts, stateful.tumbling_counts_stream,
     "complete"),
    ("sliding", event_time.sliding_counts, stateful.sliding_counts_stream,
     "complete"),
    ("session", event_time.session_counts, stateful.session_counts_stream,
     "complete"),
])
def test_windowed_agg_stream_equals_batch(spark, events_dir, op_name,
                                          batch_fn, stream_fn, mode):
    batch = batch_fn(load_table(spark, "events", SF_DIR))
    stream = stream_fn(_read_stream(spark, events_dir))
    out = _run_to_memory(spark, stream, f"stream_{op_name}", mode)
    _assert_same(batch, out)


def test_dedup_stream_keeps_one_per_key(spark, events_dir):
    """dropDuplicatesWithinWatermark keeps the *first-arriving* record per key
    (arrival order ≠ event time), so equivalence is on the key set, not rows."""
    stream = stateful.dedup_stream(_read_stream(spark, events_dir))
    out = _run_to_memory(spark, stream, "stream_dedup")
    batch = event_time.dedup_first_event(load_table(spark, "events", SF_DIR))
    b_keys = {(r["user_id"], r["event_type"]) for r in batch.collect()}
    s_rows = out.collect()
    s_keys = {(r["user_id"], r["event_type"]) for r in s_rows}
    assert s_keys == b_keys
    assert len(s_rows) == len(s_keys)  # exactly one survivor per key


def test_running_state_stream_final_state_matches_batch(spark, events_dir):
    """C27: applyInPandasWithState running totals — final per-user state equals
    the last row of the batch running aggregation."""
    stream = stateful.running_user_state_stream(_read_stream(spark, events_dir))
    out = _run_to_memory(spark, stream, "stream_state", "update")
    # final state per user = max batch-id row; with availableNow single batch,
    # just take the last emitted row per user
    final = {r["user_id"]: (r["running_n"], r["running_sum"])
             for r in out.collect()}
    batch = event_time.running_user_state(load_table(spark, "events", SF_DIR))
    last = (
        batch.groupBy("user_id")
        .agg(F.max("running_n").alias("n"))
        .collect()
    )
    batch_n = {r["user_id"]: r["n"] for r in last}
    assert {u: v[0] for u, v in final.items()} == batch_n


def test_running_state_tws_matches_batch(spark, events_dir):
    """C27 via the Spark 4 transformWithStateInPandas API — same contract as
    the applyInPandasWithState twin. The TWS state protocol needs the
    `protobuf` python package (not shipped in this container), so this runs
    wherever that dependency exists and documents the forward path here."""
    pytest.importorskip("google.protobuf")
    stream = stateful.running_user_state_tws(_read_stream(spark, events_dir))
    out = _run_to_memory(spark, stream, "stream_state_tws", "update")
    final = {r["user_id"]: r["running_n"] for r in out.collect()}
    batch = event_time.running_user_state(load_table(spark, "events", SF_DIR))
    batch_n = {r["user_id"]: r["n"] for r in
               batch.groupBy("user_id").agg(F.max("running_n").alias("n")).collect()}
    assert final == batch_n


def test_sales_pipeline_end_to_end(spark, tmp_path):
    """§3.1 smoke (t1): produce (rate → JSON → FNV partition → parquet topic)
    then consume (decode → total) — the reference's hello-world lifecycle."""
    out = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    q = pipelines.sales_produce(spark, out, ckpt, rows_per_batch=10)
    q.awaitTermination(120)
    result = pipelines.sales_consume(spark, out)
    rows = result.collect()
    assert len(rows) == 10
    for r in rows:
        assert r["total"] is not None and r["total"] > 0
        assert 0 <= r["partition"] < 8
        assert r["record_key"]


def test_pipelining_lifecycle_commits_offsets(spark, tmp_path, events_dir):
    """§3.2 smoke: micro-batched processing emits per-key commit offsets =
    max(offset)+1 (A16), exactly once per key across batches."""
    out = str(tmp_path / "commits")
    ckpt = str(tmp_path / "ckpt2")
    q = pipelines.pipelining_run(spark, events_dir, out, ckpt)
    q.awaitTermination(120)
    commits = spark.read.parquet(out)
    batch = load_table(spark, "events", SF_DIR).groupBy("user_id").agg(
        (F.max("event_id") + 1).alias("commit_offset"))
    expect = {r["user_id"]: r["commit_offset"] for r in batch.collect()}
    # last commit per user must equal the batch answer
    got = {r["user_id"]: r["commit_offset"]
           for r in commits.orderBy("commit_offset").collect()}
    assert got == expect


def test_multi_event_fanout(spark, tmp_path, events_dir):
    """A19 smoke: mixed-type stream fans out to per-type partitions."""
    out = str(tmp_path / "fanout")
    ckpt = str(tmp_path / "ckpt3")
    q = pipelines.multi_event_run(spark, events_dir, out, ckpt)
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    batch = load_table(spark, "events", SF_DIR)
    assert written.count() == batch.count()
    types_on_disk = {d for d in os.listdir(out) if d.startswith("event_type=")}
    expect_types = {f"event_type={r['event_type']}"
                    for r in batch.select("event_type").distinct().collect()}
    assert types_on_disk == expect_types
