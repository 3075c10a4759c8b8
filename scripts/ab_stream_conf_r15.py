"""Round-15 interleaved A/B: RocksDB commit posture for the bounded
availableNow replay fleet.

r14 established: (a) snapshot-per-commit costs ~150 ms per store-commit
(zip + fsync dominate: 5.9 s + 7.6 s of c36_window_join's 18 s total
commit time), (b) changelog checkpointing alone is pathological across
~90 replays in one JVM because deferred snapshot maintenance accumulates
on the ever-growing set of loaded providers. Spark 4.1 adds
spark.sql.streaming.stateStore.unloadOnCommit (run maintenance
synchronously and close each store on task completion) — the missing
piece that bounds the deferred work. This script interleaves the four
postures A/B/A/B per twin so instance drift can't masquerade as a win.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_in_action_spark.session import get_spark
from kafka_streams_in_action_spark.plans.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("ab_stream_conf_r15")

CL = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
UN = "spark.sql.streaming.stateStore.unloadOnCommit"

CONFIGS = {
    "baseline": {},
    "cl+unload": {CL: "true", UN: "true"},
    "unload": {UN: "true"},
    "changelog": {CL: "true"},
}

TWINS = sys.argv[1:] or ["c22_tumbling_stream", "c27_ttl_stream",
                         "c36_window_join"]


def timed(name: str) -> float:
    fn = QUERIES[name].fn
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.time() - t0


for name in TWINS:
    timed(name)  # warm + stage
    results: dict[str, list] = {k: [] for k in CONFIGS}
    for rep in range(3):
        for label, confs in CONFIGS.items():
            old = {k: spark.conf.get(k, None) for k in confs}
            for k, v in confs.items():
                spark.conf.set(k, v)
            try:
                results[label].append(timed(name))
            finally:
                for k, v in old.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
    print(f"== {name} ==")
    for label, ts in results.items():
        print(f"  {label:12s} min {min(ts):.3f}  all "
              + " ".join(f"{t:.2f}" for t in ts))
