"""Round-14 optimization profiler: for each named query, capture the
formatted physical plan and time the noop-sink execution (same methodology
as bench.py: warm once, min of 2), labeling jobs for attribution.

Usage:
    python scripts/profile_r14.py [--tag before|after] [--plans-dir plans/r14]
        [--sf /root/testdata/sf0.1] name [name ...]

Prints one JSON line {"name": sec, ...} and writes
plans/r14/<name>_<tag>.txt with the explain("formatted") output.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_in_action_spark.plans.queries import QUERIES
from kafka_streams_in_action_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plans-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14"))
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    os.makedirs(args.plans_dir, exist_ok=True)
    spark = get_spark("profile_r14")
    out: dict[str, float] = {}
    for name in args.names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"{name}: warm")
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(args.plans_dir,
                               f"{name}_{args.tag}.txt"), "w") as f:
            f.write(plan)
        df.write.format("noop").mode("overwrite").save()
        best = None
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
