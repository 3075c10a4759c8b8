"""Targeted oracle check: `python scripts/check_queries.py q1 q2 ...` runs only
the named queries() entries against their oracle_sql() twins (driver replica
semantics — sorted columns, normalized values). No args = all with oracles.
Queries without an oracle are executed rows-only (count printed)."""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import __spark_entry__ as e
from kafka_streams_in_action_spark.session import get_spark

spark = get_spark("check-queries")
qs = e.queries()
oracles = e.oracle_sql()

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def norm(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{round(v, 6):.6f}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


names = sys.argv[1:] or sorted(oracles)
fails = []
for name in names:
    try:
        sdf = qs[name](spark, SF)
        if name not in oracles:
            n = sdf.count()
            print(f"rows {name}: {n} (no oracle)")
            continue
        scols = sorted(sdf.columns)
        srows = sorted(tuple(norm(r[c]) for c in scols) for r in sdf.collect())
        rel = con.execute(oracles[name])
        dcols_raw = [d[0] for d in rel.description]
        drows_raw = rel.fetchall()
        dcols = sorted(dcols_raw)
        idx = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
        drows = sorted(tuple(norm(r[i]) for i in idx) for r in drows_raw)
        ok = scols == dcols and srows == drows
        if not ok:
            fails.append(name)
            print(f"FAIL {name}: cols {scols == dcols} ({scols} vs {dcols}) "
                  f"rows {len(srows)}/{len(drows)}")
            if scols == dcols:
                d = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
                print("  first diffs:", d)
        else:
            print(f"ok   {name} ({len(srows)} rows)")
    except Exception as ex:
        fails.append(name)
        print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:300]}")

print(f"\n{len(names) - len(fails)}/{len(names)} ok; FAILS: {fails}")
sys.exit(1 if fails else 0)
