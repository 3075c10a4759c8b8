"""The three reference lifecycles (SURVEY §3) re-expressed as Spark pipelines.

Each runs against Kafka when SPARK_GRAFT_KAFKA_BOOTSTRAP is set; otherwise the
produce side lands in a parquet "topic" directory and the consume side streams
from it — same topology, file transport (the smoke-test posture, SURVEY §5.4).

Lifecycle → Spark mapping (SURVEY §3.1-3.3):
- thread boundary (producer/consumer goroutines)  → two streaming queries
- process/network boundary (client↔broker)        → executor↔sink/source I/O
- auto-commit / MarkOffset                        → checkpoint WAL + commit log
- SIGINT graceful shutdown                        → query.stop() / awaitTermination
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.serde import fnv1a_partition, json_decode, json_encode
from ..schemas import PRODUCT_TRANSACTION
from ..sources.rate import product_transaction_stream


def sales_produce(spark: SparkSession, out_dir: str, checkpoint_dir: str,
                  rows_per_batch: int = 10, num_partitions: int = 8,
                  available_now: bool = True):
    """§3.1 produce half: generator → JSON serialize → custom-partition → sink.

    Key = customer_name (sales_producer_client.go:57-61); partition assigned by
    the FNV-1a partitioner with the CUSTOM override (A5).
    """
    tx = product_transaction_stream(spark, rows_per_batch)
    records = tx.select(
        F.encode("customer_name", "UTF-8").alias("key"),
        F.encode(json_encode("customer_name", "product_name", "quantity", "price"),
                 "UTF-8").alias("value"),
        fnv1a_partition(F.col("customer_name"), num_partitions).alias("partition"),
        F.col("event_time").alias("timestamp"),
    )
    writer = (
        records.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sales_consume(spark: SparkSession, in_dir: str) -> DataFrame:
    """§3.1 consume half: decode JSON → derive total → project (A6/A7).
    Batch form (run-once, A21); wrap in readStream for continuous."""
    records = spark.read.parquet(in_dir)
    tx = records.select(
        F.decode("key", "UTF-8").alias("record_key"),
        json_decode(F.col("value"), PRODUCT_TRANSACTION).alias("tx"),
        "partition",
    )
    return tx.select(
        "record_key",
        F.col("tx.product_name").alias("product_name"),
        F.round(F.col("tx.quantity") * F.col("tx.price"), 2).alias("total"),
        "partition",
    )


def pipelining_run(spark: SparkSession, in_dir: str, out_dir: str,
                   checkpoint_dir: str, max_files_per_trigger: int = 25):
    """§3.2: decoupled consume∥process with manual commits → micro-batch
    engine with bounded triggers. The reference's bounded queues (cap 25) map
    to maxFilesPerTrigger; process-then-commit ordering is the checkpoint's
    offset WAL + commit log (at-least-once → effectively-once on an
    idempotent sink).

    The "work" is the per-(topic,partition) offset-ordered apply (A15) plus
    the commit computation max(offset)+1 (A16), expressed per micro-batch.
    """
    from ..schemas import EVENTS

    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # A15: bucket by partition key, apply in offset order; A16: commit map
        commits = (
            batch_df.groupBy("user_id")
            .agg((F.max("event_id") + 1).alias("commit_offset"),
                 F.count(F.lit(1)).alias("n_records"))
        )
        commits.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def curation_ingest(spark: SparkSession, in_dir: str, out_dir: str,
                    checkpoint_dir: str, min_quality: float = 0.38,
                    max_files_per_trigger: int = 25):
    """Streaming training-data ingest — the C28/C30 curation operators composed
    onto the §3.2 micro-batch lifecycle: file-stream source → in-batch exact
    dedup → cross-batch dedup → quality floor → token stats → partitioned sink.

    Cross-batch dedup is an anti-join against the sink's own hash index
    (`<out>/hashes`), not unbounded `dropDuplicates` state: the index is the
    16-byte md5 + doc_id only, so at 100 TB it is ~0.1% of the corpus.

    Exactly-once on top of the at-least-once WAL (the same upgrade the
    reference gets from process-then-MarkOffset ordering,
    pipelining_consumer_client.go:98-108): both sink writes are keyed by
    `ingest_batch` = the micro-batch id and use DYNAMIC PARTITION OVERWRITE,
    so a replayed batch — whatever it managed to write before crashing —
    overwrites its own partitions instead of appending duplicates. Two
    non-atomic writes + deterministic batch content + per-batch overwrite =
    idempotent replay with no cross-write ordering hazard.
    """
    from ..schemas import DOCUMENTS

    stream = (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )
    hash_dir = f"{out_dir}/hashes"
    data_dir = f"{out_dir}/data"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.withColumn("text_hash", F.md5("text"))
        # in-batch exact dedup: keep the lowest doc_id per hash (C28 contract)
        w_min = batch_df.groupBy("text_hash").agg(
            F.min("doc_id").alias("doc_id"))
        fresh = batch_df.join(w_min, ["text_hash", "doc_id"], "left_semi")
        # cross-batch dedup: anti-join the sink's hash index. The index's
        # absence is probed EXPLICITLY (first batch only) — a transient read
        # failure must fail the batch so the WAL retries it, not silently
        # skip dedup and ingest duplicates.
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(hash_dir)
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jvm_path):
            seen = spark.read.parquet(hash_dir).select("text_hash")
            fresh = fresh.join(seen, "text_hash", "left_anti")
        # C30 quality floor + token stats on the survivors
        words = F.split(F.trim("text"), " ")
        n_tokens = F.size(words)
        diversity = F.size(F.array_distinct(words)).cast("double") / n_tokens
        length_score = F.least(n_tokens.cast("double") / F.lit(200.0),
                               F.lit(1.0))
        curated = (
            fresh.select(
                "doc_id", "source", "text_hash",
                F.round((diversity + length_score) / 2, 6).alias("quality"),
                n_tokens.alias("ws_tokens"),
                F.ceil(F.length("text") / F.lit(4.0)).cast("long")
                .alias("bpe_est"))
            .filter(F.col("quality") >= min_quality)
            .withColumn("ingest_batch", F.lit(batch_id))
        ).localCheckpoint(eager=True)  # score once; two writes below
        (curated.drop("text_hash").write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch", "source").parquet(data_dir))
        (curated.select("text_hash", "doc_id", "ingest_batch")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(hash_dir))

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def multi_event_run(spark: SparkSession, in_dir: str, out_dir: str,
                    checkpoint_dir: str):
    """§3.3 / A19: one stream carrying mixed event types, fanned out to
    per-type outputs in a single partitionBy write."""
    from ..schemas import EVENTS

    stream = spark.readStream.schema(EVENTS).parquet(in_dir)
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("event_type")
        .trigger(availableNow=True)
        .start()
    )


def user_activity_mv(spark: SparkSession, src_dir: str, schema,
                     out_dir: str, checkpoint_dir: str,
                     files_per_trigger: int = 1) -> DataFrame:
    """C35 streaming twin: incremental MATERIALIZED-VIEW maintenance — a
    per-user activity aggregate kept current by an update-mode streaming
    aggregation feeding a keyed upsert sink, the streaming analog of
    upsert_orders' MERGE (operators/relational.py).

    Each micro-batch, update mode emits the CUMULATIVE aggregate for every
    key the batch touched (the agg state store holds the running value, so
    the result is independent of how the log is split into batches).
    foreachBatch lands those rows under partition batch_id=N with dynamic
    partition overwrite — the curation_ingest idempotency posture: a
    replayed batch overwrites its own partition, never appends duplicates.
    The view read resolves last-writer-wins per key with a keyed window on
    batch_id (no global sort).

    The sum is dsum's exact fixed-point micro-units, so incremental
    maintenance is order-insensitive: any batch split yields bit-identical
    totals to a batch groupBy — which is exactly what the driver oracle
    asserts.
    """
    from ..operators.exact import dsum
    from pyspark.sql import Window

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    agg = (
        stream.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value").alias("total_value"))
    )

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(out_dir))

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "user_activity_mv availableNow stream did not finish in 300s; "
            "parquet sink is partial")

    mv = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    return (
        mv.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


def cms_stream_mv(spark: SparkSession, src_dir: str, schema,
                  out_dir: str, checkpoint_dir: str,
                  depth: int = 4, width: int = 512,
                  files_per_trigger: int = 1) -> DataFrame:
    """C4c streaming twin: the Count-Min sketch as an incrementally
    maintained MATERIALIZED VIEW — the sketch-maintenance job a 100 TB
    ingest actually runs. Each micro-batch builds the batch's own DELTA
    grid (operators/relational.py:cms_grid over just that batch's words)
    and APPENDS it under its batch_id partition; because CMS cells are
    plain sums, the current sketch is one cell-wise SUM over all stored
    deltas — no raw-data rescan, no read-modify-write race, and a
    replayed batch overwrites its own partition (dynamic partition
    overwrite = the curation_ingest idempotency posture, A17/A21).

    Mergeability is the load-bearing property: sum-of-delta-grids is
    BIT-identical to the grid a batch build computes over the whole log
    (pytest pins grid equality; the driver row's oracle is literally
    c4_cms_topk's batch SQL). Returns the merged (row, cell, n) grid."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    from ..operators.relational import cms_grid, doc_words

    def append_delta(batch_df: DataFrame, batch_id: int) -> None:
        (cms_grid(doc_words(batch_df), depth, width)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(out_dir))

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(append_delta)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "cms_stream_mv availableNow stream did not finish in 300s; "
            "delta grids are partial")
    return (spark.read.parquet(out_dir)
            .groupBy("row", "cell").agg(F.sum("n").alias("n")))
