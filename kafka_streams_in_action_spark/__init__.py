"""kafka_streams_in_action_spark — a PySpark-native engine with the query and
data-processing capabilities of the reference repo (viggin543/kafka-streams-in-action),
re-expressed Spark-first.

The reference is a Go Kafka client substrate (producers, consumer groups, serde,
pipelined at-least-once processing — see SURVEY.md §0). This package maps that
surface onto Spark DataFrame / SQL / Structured Streaming and extends it with the
declared relational + LLM-data-pipeline operator inventory of SURVEY.md §2.

Layout:
    session     SparkSession builder (AQE on, UTC, tuned shuffle partitions)
    schemas     StructType constants for every table / record shape
    registry    Schema-registry shim (reference A14)
    functions/  scalar fns F1-F4 (fnv1a_32, Confluent wire format) + serde wrappers
    operators/  relational, joins, windows, setops, scalars, dedup, text,
                similarity, multimodal  (SURVEY §2 C1-C31)
    sources/    parquet/rate/kafka readers and sinks (A1-A4)
    plans/      the query registry consumed by __spark_entry__ and bench.py
    streaming/  Structured Streaming pipelines (A15-A23, C22-C27)
"""

__version__ = "0.1.0"
