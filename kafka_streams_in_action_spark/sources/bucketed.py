"""Bucketed (co-located) tables — the 100 TB fact-fact join path.

At scale the expensive join is fact ⋈ fact on a shared key (lineitem ⋈
orders on orderkey): both sides shuffle on every query. Bucketing both
tables by the join key at write time pays that shuffle once, at ingest —
every later equi-join or groupBy on the key reads bucket i of A against
bucket i of B with **no Exchange in the plan at all**. On a 1000-executor
cluster that converts the dominant per-query network cost into a one-time
layout decision, exactly like the reference keeps same-key records on one
Kafka partition so consumers never re-shuffle them
(golang/chapter_4/sales/custom_order_partitioner.go:26-36 — partitioning
as a *storage* contract, not a per-query action).

Mechanics that make the plan exchange-free (all asserted in
tests/test_plans.py):
- both sides bucketed by the join key with the SAME bucket count
  (mismatched counts need spark.sql.bucketing.coalesceBucketsInJoin);
- `repartition(n, key)` before the write gives ONE file per bucket, so a
  `sortBy(key)` table also skips the per-side Sort in the merge join;
- bucket count sized like shuffle partitions: ≥ cluster cores, small
  enough that one bucket (table_size / n) fits an executor's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Persist `df` as a managed parquet table bucketed (and bucket-sorted)
    by `key`. The pre-repartition yields one file per bucket — required for
    Spark to trust per-bucket sort order and elide the merge-join Sort."""
    writer = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.mode("overwrite").saveAsTable(table)


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Directory-partitioned parquet layout: equality/range predicates on
    `partition_col` prune whole directories before any file is opened
    (PartitionFilters in the scan; plan-pinned in tests). The layout that
    turns a 100 TB history into a per-day read."""
    df.write.partitionBy(partition_col).mode("overwrite").parquet(path)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Equi-join two co-bucketed tables on their bucket key. Plain df.join —
    the exchange-free plan comes from the storage layout, not hints."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    return lt.join(rt, on=key, how=how)


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_rows_per_file: int,
                    order_col: str | None = None) -> dict:
    """Small-file compaction — the OPTIMIZE half of the layout toolkit
    (write_zordered in operators/layout.py is the CLUSTER half). A
    streaming ingest or an over-parallel writer leaves thousands of tiny
    files; at 100 TB that means a task (plus an open/footer-read) per
    file, and the NameNode/listing cost dominates the scan. Compaction
    rewrites the directory into ~n_rows/target files — paid once, like
    every other layout decision in this module.

    `order_col` preserves (or imposes) an ordering during the rewrite via
    repartitionByRange + in-file sort, so compaction COMPOSES with the
    Z-order/bucket layouts instead of destroying their min/max stats;
    without it the rewrite is a pure coalesce-shaped repartition (one
    round-robin exchange, no sort). Returns a before/after report dict —
    the numbers an operator dashboard would alert on."""
    df = spark.read.parquet(src)
    n_rows = df.count()
    # inputFiles() goes through the Hadoop FileSystem abstraction, so the
    # counts are correct for hdfs://, s3a://, file:// alike (a local glob
    # would silently report 0 off-box), and no RDD conversion is forced.
    files_before = len(df.inputFiles())
    n_files = max(1, -(-n_rows // target_rows_per_file))
    if order_col is not None:
        out = (df.repartitionByRange(n_files, order_col)
               .sortWithinPartitions(order_col))
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    files_after = len(spark.read.parquet(dst).inputFiles())
    return {"n_rows": n_rows, "files_before": files_before,
            "files_after": files_after}
