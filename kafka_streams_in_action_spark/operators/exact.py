"""Exact float aggregation: sums routed through DECIMAL(27,6).

Float64 partial sums are order-dependent, and Spark's round(double) (BigDecimal
shortest-repr, HALF_UP) disagrees with DuckDB's (scaled nearbyint) near half
boundaries — so the engine's contract is: aggregate in exact decimal, return
the double of the exact result, and never round computed doubles. Two engines
computing the same exact decimal produce bit-identical doubles, which any
downstream canonicalization then treats identically.

At scale this costs one widening cast per row; decimal sum partials merge
associatively, so map-side combine and AQE behave exactly as with doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str) -> Column:
    """Order-insensitive exact sum of a double column, as double."""
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast("decimal(27,6)")).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum average: dsum / count, both deterministic."""
    col = F.col(col) if isinstance(col, str) else col
    return dsum(col) / F.count(F.lit(1))
