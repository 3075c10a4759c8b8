"""Exact float aggregation: order-insensitive sums via fixed-point longs.

Float64 partial sums are order-dependent (AQE / map-side combine reorder
them run to run), and Spark's round(double) (BigDecimal shortest-repr,
HALF_UP) disagrees with DuckDB's (scaled nearbyint) near half boundaries —
so per-row quantization goes through a DECIMAL(18,6) cast, which both
engines evaluate identically (proven by the oracle suite).

The aggregation itself then runs on exact integer micro-units:

    sum( (CAST(x AS DECIMAL(18,6)) * 1e6) :: LONG )  /  1e6

Long addition is exact and associative, so any partial-aggregation order
gives the same integer; the final double conversion of the same integer is
bit-identical across engines. This is semantically the same contract as
summing DECIMAL(27,6) (each value rounded to 6 decimals, exact sum), but the
hot loop is a codegen'd long add instead of BigDecimal accumulation —
~2.5× faster on a scan-agg like TPC-H Q1.

Scale bound: long micro-units overflow at |sum| > 9.2e12 in value units.
TPC-H revenue-style sums reach ~2e11 per group at SF100, so the fast path
holds through SF100-class runs per group; for global sums beyond that, pass
wide=True to aggregate in DECIMAL(38,6) (exact, unbounded for practical
purposes, costs the BigDecimal path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000


def dsum(col: Column | str, wide: bool = False) -> Column:
    """Order-insensitive exact sum of a double column, as double."""
    col = F.col(col) if isinstance(col, str) else col
    q = col.cast("decimal(18,6)")
    if wide:
        return F.sum(q.cast("decimal(38,6)")).cast("double")
    micros = (q * _SCALE).cast("long")
    return (F.sum(micros).cast("double") / _SCALE)


def davg(col: Column | str) -> Column:
    """Exact-sum average: dsum / count, both deterministic."""
    col = F.col(col) if isinstance(col, str) else col
    return dsum(col) / F.count(F.lit(1))
