"""A2-A4, A19, A23 — Kafka source/sink wrappers.

Maps the reference's client configuration surface onto the Spark Kafka
connector options:

- consumer group subscribe w/ earliest reset (sales_consumer_client.go:21-39)
  → subscribe + startingOffsets=earliest; the checkpoint dir replaces group
  offset storage (A17: offsets commit only after processing — Spark's WAL
  commit log gives the same at-least-once-upgraded-to-effectively-once).
- multi-topic subscribe via comma list (sales_consumer_client.go:33).
- assign-specific-partition (commands.sh:14-15) → `assign` json option.
- keyed sync/async produce with acks/retries (sales_producer_client.go:20-26,
  pure_go_client/main_sarama.go:33-59) → kafka.acks / kafka.retries options.
- consumer-group scaling (round-robin assignor, A23) → minPartitions hint;
  Spark schedules ≥1 task per Kafka partition.

No broker ships in this container; integration tests gate on
SPARK_GRAFT_KAFKA_BOOTSTRAP being set (docker-compose.yml in the reference
provides one for a real run).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def source_options(bootstrap: str, topics: str | list[str],
                   starting_offsets: str = "earliest",
                   assign: dict[str, list[int]] | None = None,
                   max_offsets_per_trigger: int | None = None,
                   min_partitions: int | None = None) -> dict[str, str]:
    """A4/A23: the exact connector option map a consumer configuration
    resolves to — the testable surface of the reference's consumer
    client config (sales_consumer_client.go:21-39: group subscribe,
    earliest reset, multi-topic comma list; commands.sh:14-15: assigned
    partitions; A18 backpressure cap; A23 minPartitions scaling hint).
    read_topic_stream applies this map verbatim, so asserting on it IS
    asserting on the reader a broker run would use."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if assign is not None:
        opts["assign"] = json.dumps(assign)
    else:
        if isinstance(topics, list):
            topics = ",".join(topics)
        opts["subscribe"] = topics
    if max_offsets_per_trigger is not None:
        # A18 backpressure: the bounded-queue analog (queue cap 25 batches,
        # produce_pipelining_consume_application.go:18-19)
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def sink_options(bootstrap: str, topic: str, checkpoint_dir: str,
                 acks: str = "1", retries: int = 10) -> dict[str, str]:
    """A2/A3: the producer-side option map — acks='1' ≈ WaitForLocal +
    retries (sales_producer_client.go:22-23), acks='all' ≈ WaitForAll
    (main_sarama.go:34). write_topic_stream applies this map verbatim."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "kafka.acks": acks,
        "kafka.retries": str(retries),
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def read_topic_stream(spark: SparkSession, bootstrap: str, topics: str | list[str],
                      starting_offsets: str = "earliest",
                      assign: dict[str, list[int]] | None = None,
                      max_offsets_per_trigger: int | None = None,
                      min_partitions: int | None = None) -> DataFrame:
    """A4: consumer-group-style streaming source. `topics` may be a comma list
    (multi-topic union, A4) or `assign` may pin specific partitions (A23)."""
    reader = spark.readStream.format("kafka")
    for k, v in source_options(
            bootstrap, topics, starting_offsets=starting_offsets,
            assign=assign, max_offsets_per_trigger=max_offsets_per_trigger,
            min_partitions=min_partitions).items():
        reader = reader.option(k, v)
    return reader.load()


def read_topic_batch(spark: SparkSession, bootstrap: str, topics: str) -> DataFrame:
    """A21 run-once consumption as a batch read."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )


def write_topic_stream(df: DataFrame, bootstrap: str, topic: str,
                       checkpoint_dir: str, acks: str = "1",
                       retries: int = 10, available_now: bool = False):
    """A2/A3: keyed Kafka sink. acks='1' ≈ WaitForLocal + retries=10
    (sales_producer_client.go:22-23); acks='all' ≈ WaitForAll
    (main_sarama.go:34). Expects `key`/`value` binary columns (partitioning by
    key is the broker-side default partitioner, matching A5's consistency
    contract when fnv1a_partition pre-assigns `partition`)."""
    writer = df.writeStream.format("kafka")
    for k, v in sink_options(bootstrap, topic, checkpoint_dir,
                             acks=acks, retries=retries).items():
        writer = writer.option(k, v)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def fan_out_by_type(df: DataFrame, type_col: str, out_dir: str,
                    checkpoint_dir: str, available_now: bool = True):
    """A19: multi-event routing — one stream carrying several event kinds,
    split to per-type outputs. Spark-side: a single partitionBy write (each
    micro-batch appends to per-type directories) instead of N filtered sinks —
    one pass, no per-type job."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(type_col)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def delivery_report(query) -> dict:
    """A3's delivery callbacks: per-micro-batch sink metrics from the streaming
    query progress (rows written, batch id, durations)."""
    p = query.lastProgress
    if p is None:
        return {}
    return {
        "batchId": p.get("batchId"),
        "numInputRows": p.get("numInputRows"),
        "sink": p.get("sink", {}),
        "durationMs": p.get("durationMs", {}),
    }


def end_offsets(query) -> dict:
    """A17: expose committed progress (the checkpoint WAL's endOffset), the
    analog of MarkOffset bookkeeping (pipelining_consumer_client.go:98-108)."""
    p = query.lastProgress
    if not p:
        return {}
    return {s.get("description", f"src{i}"): s.get("endOffset")
            for i, s in enumerate(p.get("sources", []))}
