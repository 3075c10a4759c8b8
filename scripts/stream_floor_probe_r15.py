"""Round-15 measurement: per-batch decomposition of a twin's replay cost.

The r14 probe attributed twin seconds to staging vs harness vs handler;
this probe goes one level down — for each micro-batch of a named twin's
availableNow replay it records the StreamingQueryProgress durationMs
breakdown (triggerExecution = addBatch + getBatch + latestOffset +
queryPlanning + walCommit + commitOffsets) and the state operators'
customMetrics (RocksDB commit/load/checkpoint times), so the "cut the
found term" decision in verdict r14 item 1 is grounded in the engine's
own accounting instead of wall-clock subtraction.

Usage: python scripts/stream_floor_probe_r15.py [twin ...]
Default twins: c22_tumbling_stream c27_ttl_stream c36_window_join
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_in_action_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("stream_floor_probe_r15")

# Collect every progress event instead of polling lastProgress (bounded
# replays finish fast enough to drop intermediate progress objects).
from pyspark.sql.streaming import StreamingQueryListener


class _Capture(StreamingQueryListener):
    def __init__(self):
        self.progress = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        self.progress.append(event.progress)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


cap = _Capture()
spark.streams.addListener(cap)

from kafka_streams_in_action_spark.plans.queries import QUERIES

DUR_KEYS = ("triggerExecution", "addBatch", "getBatch", "latestOffset",
            "queryPlanning", "walCommit", "commitOffsets")


def probe(name: str) -> None:
    fn = QUERIES[name].fn
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm+stage
    cap.progress.clear()
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(f"\n== {name}: wall {wall:.2f}s, {len(cap.progress)} progress events ==")
    tot = {k: 0 for k in DUR_KEYS}
    state_tot: dict = {}
    for p in cap.progress:
        d = json.loads(p.json)
        dur = d.get("durationMs", {})
        row = " ".join(f"{k}={dur.get(k, 0)}" for k in DUR_KEYS)
        print(f"  batch {d.get('batchId')}: {row}")
        for k in DUR_KEYS:
            tot[k] += dur.get(k, 0)
        for op in d.get("stateOperators", []):
            for mk, mv in (op.get("customMetrics") or {}).items():
                if isinstance(mv, (int, float)) and mv:
                    state_tot[mk] = state_tot.get(mk, 0) + mv
            for mk in ("commitTimeMs", "timeTakenMs"):
                if mk in op:
                    state_tot[mk] = state_tot.get(mk, 0) + op[mk]
    print("  TOTALS:", " ".join(f"{k}={v}" for k, v in tot.items()))
    big = sorted(state_tot.items(), key=lambda kv: -kv[1])[:24]
    print("  state:", " ".join(f"{k}={v}" for k, v in big))
    print(f"  unattributed wall - triggerExecution: "
          f"{wall - tot['triggerExecution'] / 1000:.2f}s")


for name in (sys.argv[1:] or ["c22_tumbling_stream", "c27_ttl_stream",
                              "c36_window_join"]):
    probe(name)
