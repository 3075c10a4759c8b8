"""Deterministic sampling & dataset splitting (training-pipeline extras).

The reproducibility problem with `df.sample()` at 100 TB: Spark's sampler is
seeded per-partition, so the sample CHANGES whenever partitioning, file
layout, or cluster size changes — a training/eval split defined that way is
not stable across reruns or engines. The standard fix (used by every large
corpus pipeline) is HASH-MOD sampling: a row is in the sample iff
hash(key ‖ salt) mod M < threshold. Properties:

- deterministic across runs, engines, partitionings, and cluster sizes;
- sampling is a pure per-row filter → predicate-pushdown-friendly, no
  shuffle, no state;
- disjoint splits fall out of disjoint hash ranges (train/val/test);
- changing the salt draws an independent sample.

The hash is the same FNV-1a 32-bit fold the reference's custom partitioner
uses (custom_order_partitioner.go:15-32, = functions.serde.fnv1a_32), here
expressed as pure column algebra over the key's chars — codegen-side, no
UDF in the filter path, and byte-identical to the DuckDB oracle's
list_reduce fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FNV_OFFSET = 2166136261
FNV_PRIME = 16777619
FNV_MOD = 4294967296  # 2^32


def fnv32_column(col: Column) -> Column:
    """FNV-1a 32-bit over a string column's chars as a column-algebra fold
    (exact for ASCII keys — ids, hex digests; vector-tested against the
    byte-level reference implementation)."""
    codes = F.transform(F.split(col, ""), lambda c: F.ascii(c))
    return F.aggregate(
        codes, F.lit(FNV_OFFSET).cast("long"),
        lambda acc, c: F.pmod(acc.bitwiseXOR(c) * F.lit(FNV_PRIME),
                              F.lit(FNV_MOD)))


def _bucket(key: Column, salt: str, mod: int = 100) -> Column:
    return F.pmod(
        fnv32_column(F.concat(key.cast("string"), F.lit(":" + salt))),
        F.lit(mod)).cast("int")


def deterministic_sample(df: DataFrame, key: str, rate_pct: int,
                         salt: str = "sample") -> DataFrame:
    """Keep ~rate_pct% of rows, stably: hash(key‖salt) mod 100 < rate_pct.
    A pure filter — pushes down, shuffles nothing, reproduces anywhere."""
    return df.filter(_bucket(F.col(key), salt) < rate_pct)


def train_val_test_split(documents: DataFrame, train_pct: int = 90,
                         val_pct: int = 5,
                         salt: str = "split") -> DataFrame:
    """Assign every document to train/val/test by hash range — disjoint,
    exhaustive, and stable under any re-run or re-partitioning. Emits the
    bucket so the assignment is auditable."""
    b = _bucket(F.col("doc_id"), salt)
    return documents.select(
        "doc_id", b.alias("bucket"),
        F.when(b < train_pct, F.lit("train"))
         .when(b < train_pct + val_pct, F.lit("val"))
         .otherwise(F.lit("test")).alias("split"),
    )


def split_summary(documents: DataFrame, train_pct: int = 90,
                  val_pct: int = 5) -> DataFrame:
    """Per-split counts + share — the sanity check a pipeline runs after
    splitting (shares should approximate the configured percentages). The
    total comes from an unpartitioned window over the 3-row grouped result,
    not a driver-side count — construction launches no jobs."""
    from pyspark.sql import Window

    assigned = train_val_test_split(documents, train_pct, val_pct)
    w = Window.partitionBy()
    return (
        assigned.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select("split", "n_docs",
                (F.col("n_docs").cast("double")
                 / F.sum("n_docs").over(w).cast("double")).alias("share"))
        .orderBy("split")
    )
