"""Round-15: does changelog checkpointing still blow up LATE in a fleet
of bounded replays (the r14 pathology), and does unloadOnCommit fix it?

Runs the full 24-twin stream section once under a posture, then re-times
the store-heaviest twin (c36_window_join) and a light twin — the r14
failure mode was 5.6 s isolated -> 44 s after ~90 replays. Run this
script once per posture (conf via argv) in a FRESH process so postures
don't share provider state.

Usage: python scripts/ab_fleet_r15.py [baseline|changelog|cl+unload]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_in_action_spark.session import get_spark
from kafka_streams_in_action_spark.plans.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CL = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
UN = "spark.sql.streaming.stateStore.unloadOnCommit"
POSTURES = {"baseline": {}, "changelog": {CL: "true"},
            "cl+unload": {CL: "true", UN: "true"},
            "unload": {UN: "true"}}

label = sys.argv[1] if len(sys.argv) > 1 else "baseline"
spark = get_spark("ab_fleet_r15")
for k, v in POSTURES[label].items():
    spark.conf.set(k, v)

TWINS = ["c36_interval_join", "c35_upsert_stream", "c35_scd2_stream",
         "c12_holt_stream", "c34_throttle_stream", "c12_drawdown_stream",
         "c33_flatline_stream", "c10_asof_stream", "c34_interarrival_stream",
         "c34_l28_stream", "c35_cdc_stream", "c34_bursts_stream",
         "c34_absence_stream", "c13_decay_topk_stream", "c34_peak_stream",
         "c16_sla_stream", "c4_tdigest_stream", "c27_ttl_stream",
         "c24_session_stream", "c22_tumbling_stream", "c23_sliding_stream",
         "c36_window_join", "c26_dedup_stream", "c36_left_join_stream"]


def timed(name: str) -> float:
    t0 = time.time()
    QUERIES[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.time() - t0


# warm c36 + stage all the shared slice caches once
t_iso = min(timed("c36_window_join") for _ in range(2))
print(f"[{label}] c36_window_join isolated: {t_iso:.2f}s", flush=True)

t0 = time.time()
total = 0.0
for name in TWINS:
    dt = timed(name)
    total += dt
    print(f"[{label}] {name}: {dt:.2f}s", flush=True)
print(f"[{label}] fleet total: {total:.2f}s (wall {time.time()-t0:.1f}s)")
t_late = min(timed("c36_window_join") for _ in range(2))
t_light = min(timed("c22_tumbling_stream") for _ in range(2))
print(f"[{label}] c36_window_join after fleet: {t_late:.2f}s "
      f"(isolated {t_iso:.2f}s); c22 after fleet: {t_light:.2f}s")
