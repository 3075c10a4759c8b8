"""Window functions, sort/limit/top-k (SURVEY §2C C11-C13; reference A15).

Window partitioning keys here (customer, user) are high-cardinality, so state
per task stays small at any scale; no global windows without PARTITION BY appear
anywhere (an ORDER BY over everything would single-task at 100 TB).

Global top-k (C13) relies on Spark's TakeOrderedAndProject: per-partition heap
of k, then a k-sized merge on the driver — never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_orders_per_customer(orders: DataFrame) -> DataFrame:
    """C11: row_number/rank/dense_rank per customer by order date."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey"))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def distribution_ranks(orders: DataFrame) -> DataFrame:
    """C11b: the distribution ranking family — percent_rank, cume_dist,
    ntile(4). Same partitioning discipline as C11 (keyed by customer, no
    global window). percent_rank/cume_dist are pure functions of (rank,
    partition size); ntile's remainder rule (first `size % n` tiles get the
    extra row) is identical in Spark and DuckDB."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey"))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


def analytic_frames(orders: DataFrame) -> DataFrame:
    """C12: lag/lead + running sum (unboundedPreceding) + sliding 4-row avg."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
    dec = F.col("o_totalprice").cast("decimal(27,6)")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frame4 = w.rowsBetween(-3, 0)
    return orders.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        # decimal window sums: exact regardless of the engine's frame
        # evaluation order (DuckDB uses a segment tree; Spark streams)
        F.sum(dec).over(run).cast("double").alias("running_total"),
        (F.sum(dec).over(frame4).cast("double")
         / F.count(F.lit(1)).over(frame4)).alias("sliding_avg"),
    )


def top_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """C13a: global ORDER BY ... LIMIT k → TakeOrderedAndProject (no full sort).
    Tie-break on o_orderkey makes the result set deterministic."""
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.col("o_totalprice"))
        .limit(k)
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """C13b: per-group top-k via ranking — one shuffle on the group key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def partition_ordered_records(events: DataFrame) -> DataFrame:
    """A15 (concurrent_record_processor.go:71-90): group records by partition key
    and process in offset order — batchified as row_number over (user) ordered by
    (ts, event_id), i.e. each record's in-partition sequence number."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return events.select(
        "user_id", "event_id",
        F.row_number().over(w).alias("seq"),
    )
