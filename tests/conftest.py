"""Shared fixtures: one SparkSession per test run, a DuckDB connection with the
testdata views registered, and the canonical compare used by the oracle tests
(mirrors the driver's: sort by all columns, round doubles to 6 decimals)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from kafka_streams_in_action_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def canonical(rows, colnames):
    """Order-insensitive canonical form: round floats to 6 decimals, stringify,
    sort rows; columns sorted by name (the driver's comparison contract)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return "\0NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{round(v, 6):.6f}"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def assert_frames_match(spark_df, duck_rel, context=""):
    s_cols = spark_df.columns
    d_cols = [d[0] for d in duck_rel.description]
    assert sorted(s_cols) == sorted(d_cols), \
        f"{context}: column names differ: spark={s_cols} duckdb={d_cols}"
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = duck_rel.fetchall()
    assert len(s_rows) == len(d_rows), \
        f"{context}: row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs = canonical(s_rows, s_cols)
    cd = canonical(d_rows, d_cols)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(f"{context}: value mismatch, first diffs: {diffs}")
