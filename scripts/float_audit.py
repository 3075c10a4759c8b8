"""Bit-exact float audit (round-7 hardening, VERDICT r6 item 7b).

The local gates and the driver sim compare floats at 6 decimals; the
real driver's value hash proved type/representation-sensitive in round
6. This audit closes the next-most-likely silent-divergence class: for
every registered oracle query it aligns Spark and DuckDB rows by the
6-decimal canonical form (the thing the normal gate already proves
equal) and then re-compares every float column BIT-FOR-BIT via the IEEE
double's hex pattern. A query whose floats round-trip at 6 decimals but
differ in the 17-digit repr is exactly the kind of row that can flip a
representation-sensitive hash.

Exit code 1 and a per-query report if any float column is not
bit-identical. Usage:

    python scripts/float_audit.py [sf_dir]        # default sf0.001
    SPARK_GRAFT_ONLY=<regex> python scripts/float_audit.py
"""
from __future__ import annotations

import math
import os
import re
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

import __spark_entry__ as e
from kafka_streams_in_action_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _round6(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{round(v, 6):.6f}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _bits(v):
    """Canonical bit-level form: doubles -> IEEE-754 hex (NaN collapsed),
    everything else -> the 6-decimal form (non-floats are already exact)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:           # -0.0 and 0.0 hash alike in both engines'
            v = 0.0            # textual forms; don't flag the sign bit
        return struct.pack(">d", v).hex()
    return _round6(v)


def audit(spark, con, qs, oracles, sf_dir, names):
    """Return {name: [mismatch strings]} for queries whose float columns
    are not bit-identical across engines (empty dict = all exact)."""
    report = {}
    for name in names:
        sdf = qs[name](spark, sf_dir)
        cols = sorted(sdf.columns)
        srows = [tuple(r[c] for c in cols) for r in sdf.collect()]
        drel = con.execute(oracles[name])
        dorder = [d[0] for d in drel.description]
        pos = [dorder.index(c) for c in cols]
        drows = [tuple(r[i] for i in pos) for r in drel.fetchall()]
        if len(srows) != len(drows):
            report[name] = [f"row counts differ ({len(srows)} vs "
                            f"{len(drows)}) — run driver_sim first"]
            continue
        skey = sorted(range(len(srows)),
                      key=lambda i: tuple(_round6(v) for v in srows[i]))
        dkey = sorted(range(len(drows)),
                      key=lambda i: tuple(_round6(v) for v in drows[i]))
        diffs = []
        float_cols = 0
        for si, di in zip(skey, dkey):
            for c, (a, b) in enumerate(zip(srows[si], drows[di])):
                if not (isinstance(a, float) or isinstance(b, float)):
                    continue
                float_cols += 1
                if _bits(a) != _bits(b):
                    diffs.append(f"{cols[c]}: spark={a!r} duck={b!r}")
                    if len(diffs) >= 3:
                        break
            if len(diffs) >= 3:
                break
        if diffs:
            report[name] = diffs
        print(f"{'EXACT' if not diffs else 'DRIFT'} {name}"
              + ("" if float_cols else " (no float cols)"), flush=True)
    return report


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("float-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = e.queries(), e.oracle_sql()
    names = sorted(oracles)
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = [n for n in names if re.search(only, n)]
    report = audit(spark, con, qs, oracles, sf_dir, names)
    print(f"\n{len(names) - len(report)}/{len(names)} bit-exact")
    for name, diffs in report.items():
        print(f"DRIFT {name}:")
        for d in diffs:
            print(f"  {d}")
    sys.exit(1 if report else 0)


if __name__ == "__main__":
    main()
