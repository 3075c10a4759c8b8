"""Batch parquet sources for the driver testdata tables.

Schemas are declared (schemas.TABLES), never inferred — the reference's
registry-governed schema-by-contract rule (SURVEY §1.3). Passing the schema to
the reader also lets Catalyst prune columns and push filters into the parquet
scan without a schema-discovery pass over footers — at 100 TB, footer listing
alone is a real cost.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# events.ts is parquet TIMESTAMP(NANOS,false) — Spark has no nanosecond
# timestamp type, so we read the raw int64 (nanosAsLong, set in session.py) and
# truncate to microseconds, exactly what DuckDB's TIMESTAMP does on read.
_EVENTS_RAW = T.StructType(
    [f if f.name != "ts" else T.StructField("ts", T.LongType(), True)
     for f in TABLES["events"].fields])


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
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
