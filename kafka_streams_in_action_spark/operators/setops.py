"""Set operations (SURVEY §2C C14).

The reference's only set-shaped op is the implicit union of a multi-topic
subscribe (sales_consumer_client.go:33); the engine declares the full lattice.
UNION ALL is shuffle-free (plan concatenation); UNION/INTERSECT/EXCEPT hash on
the full row — at scale prefer keyed variants (semi/anti joins) where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _split(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two overlapping projections of orders: urgent-ish vs high-value."""
    a = orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")) \
        .select("o_orderkey", "o_custkey")
    b = orders.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_custkey")
    return a, b


def union_all_counts(orders: DataFrame) -> DataFrame:
    a, b = _split(orders)
    return a.unionAll(b).agg(F.count(F.lit(1)).alias("n_rows"))


def union_distinct(orders: DataFrame) -> DataFrame:
    a, b = _split(orders)
    return a.union(b).distinct().agg(F.count(F.lit(1)).alias("n_rows"))


def intersect_rows(orders: DataFrame) -> DataFrame:
    a, b = _split(orders)
    return a.intersect(b)


def except_rows(orders: DataFrame) -> DataFrame:
    a, b = _split(orders)
    return a.exceptAll(b)
