"""Batch parquet sources for the driver testdata tables.

Schemas are declared (schemas.TABLES), never inferred — the reference's
registry-governed schema-by-contract rule (SURVEY §1.3). Passing the schema to
the reader also lets Catalyst prune columns and push filters into the parquet
scan without a schema-discovery pass over footers — at 100 TB, footer listing
alone is a real cost.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Nanos layout: Spark has no nanosecond timestamp type, so TIMESTAMP(NANOS)
# must be read as the raw int64 (nanosAsLong, set in session.py) and truncated
# to microseconds — exactly what DuckDB's TIMESTAMP does on read.
_EVENTS_RAW = T.StructType(
    [f if f.name != "ts" else T.StructField("ts", T.LongType(), True)
     for f in TABLES["events"].fields])


@lru_cache(maxsize=None)
def _events_ts_is_nanos(path: str) -> bool:
    """The testdata has shipped events.ts both as parquet TIMESTAMP(NANOS)
    and TIMESTAMP(MICROS) across driver rounds, so the physical unit must be
    probed from a footer, never assumed: decoding micros through the nanos
    path divides every timestamp by 1000, silently compressing a 30-day range
    into ~43 minutes (the r3 c9/c10 correctness regression). One footer read
    per (path, process) — cached, negligible even on object stores.

    The probe reads the parquet PHYSICAL type, not pyarrow's arrow mapping:
    pyarrow surfaces legacy INT96 timestamps as timestamp[ns] too, but
    INT96 is natively readable by Spark and must NOT take the raw-int64
    path. Only INT64 + LogicalType Timestamp(nanoseconds) needs it.

    A probe failure RAISES instead of defaulting: silently returning False
    on a TIMESTAMP(NANOS) file would hand Spark a LongType `ts` (via
    nanosAsLong) and break every ts-dependent query with a schema error far
    from the cause. pyarrow is a hard dependency of the pandas-UDF
    operators, so the import cannot legitimately fail here; a missing file
    surfaces at the subsequent spark.read anyway."""
    p = path
    if os.path.isdir(p):
        inner = sorted(glob.glob(os.path.join(p, "*.parquet")))
        if not inner:
            return False
        p = inner[0]
    if not os.path.exists(p):
        return False  # let spark.read report the missing path itself
    import pyarrow.parquet as pq
    sch = pq.ParquetFile(p).schema
    col = sch.column(sch.names.index("ts"))
    return (col.physical_type == "INT64"
            and "nanoseconds" in str(col.logical_type))


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _events_ts_is_nanos(path):
        raw = spark.read.schema(_EVENTS_RAW).parquet(path)
        # integer div — double division loses precision on int64 nanos
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(TABLES[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view so spark.sql() queries run
    against the same inputs as the DuckDB oracle."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
