"""Kafka wrapper gating (A2-A4, A23): no broker or connector jar ships in
this container, so the contract here is fail-fast-with-guidance — building a
Kafka reader/writer raises Spark's own DATA_SOURCE_NOT_FOUND/deployment
error immediately, never a hang or a cryptic executor failure. With
spark-sql-kafka on the classpath and SPARK_GRAFT_KAFKA_BOOTSTRAP set, the
same calls run against a real broker (reference: docker-compose.yml)."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import AnalysisException

from kafka_streams_in_action_spark.sources.kafka import (
    read_topic_batch, read_topic_stream)


def test_kafka_source_fails_fast_without_connector(spark):
    with pytest.raises(AnalysisException, match="kafka"):
        read_topic_stream(spark, "localhost:9092", "topic-a,topic-b")


def test_kafka_batch_read_fails_fast_without_connector(spark):
    with pytest.raises(AnalysisException, match="kafka"):
        read_topic_batch(spark, "localhost:9092", "topic-a")
