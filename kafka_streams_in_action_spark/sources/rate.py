"""A1 — the synthetic rate-limited source.

Reference: sales_data_source.go:14-33 emits a constant batch of
ProductTransaction rows per 3-second tick (10 rows for sales, 25 for
pipelining). Spark-side this is the `rate-micro-batch` source (fixed rows per
batch, deterministic timestamps) mapped onto the transaction schema with pure
column algebra — a seeded modular generator, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CUSTOMERS = ["Martin", "Chandler", "Joey", "Monica", "Rachel", "Phoebe"]
PRODUCTS = ["quarter pounder", "fries", "shake", "coffee", "apple pie"]


def product_transaction_stream(spark: SparkSession, rows_per_batch: int = 10,
                               interval_ms: int = 3000) -> DataFrame:
    """Streaming ProductTransaction source: `rows_per_batch` rows per tick,
    mirroring the 10-rows/3s sales generator (sales_producer_client.go:69)."""
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("advanceMillisPerBatch", interval_ms)
        .load()
    )
    return _to_transactions(rate)


def product_transaction_batch(spark: SparkSession, n_rows: int = 10) -> DataFrame:
    """Batch twin (run-once mode, A21): same generator over spark.range."""
    base = spark.range(n_rows).select(
        F.col("id").alias("value"), F.current_timestamp().alias("timestamp"))
    return _to_transactions(base)


def _to_transactions(df: DataFrame) -> DataFrame:
    idx = F.col("value")
    return df.select(
        F.element_at(F.array(*[F.lit(c) for c in CUSTOMERS]),
                     (F.pmod(idx, F.lit(len(CUSTOMERS))) + 1).cast("int"))
            .alias("customer_name"),
        F.element_at(F.array(*[F.lit(p) for p in PRODUCTS]),
                     (F.pmod(idx, F.lit(len(PRODUCTS))) + 1).cast("int"))
            .alias("product_name"),
        (F.pmod(idx, F.lit(10)) + 1).cast("int").alias("quantity"),
        F.round(F.pmod(idx * F.lit(7.37), F.lit(100.0)) + 1.0, 2).alias("price"),
        F.col("timestamp").alias("event_time"),
    )
