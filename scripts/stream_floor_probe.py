"""Round-14 measurement: decompose the streaming twins' fixed replay floor.

Times (a) the null availableNow micro-batch under candidate state-store
configs, (b) the per-twin slice-staging pass (_write_time_slices), and
(c) one representative twin end-to-end — so the optimization round can
attribute the twins' bench seconds to staging vs per-batch harness vs
handler work before changing anything.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.session import get_spark
from kafka_streams_in_action_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("stream_floor_probe")

src = tempfile.mkdtemp(prefix="floor_probe_src_")
(spark.range(1)
 .select("id", F.current_timestamp().alias("ts"))
 .write.mode("overwrite").parquet(src))


def null_stream_once() -> None:
    from kafka_streams_in_action_spark.plans.queries import _stream_partitions
    with _stream_partitions(spark):
        sink = f"floor_{uuid.uuid4().hex[:8]}"
        sdf = (spark.readStream.schema("id long, ts timestamp")
               .parquet(src)
               .withWatermark("ts", "1 hour")
               .groupBy(F.window("ts", "1 hour"))
               .count())
        q = (sdf.writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True).start())
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError("null stream hung")


CONFIG_SETS = {
    "baseline": {},
    "changelog": {
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            "true"},
    "no_row_tracking": {
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows":
            "false"},
    "both": {
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            "true",
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows":
            "false"},
    "hdfs_provider": {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"},
}

print("== null availableNow micro-batch (state init + plan + commit) ==")
for label, confs in CONFIG_SETS.items():
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        null_stream_once()  # warm
        best = None
        for _ in range(3):
            t0 = time.time()
            null_stream_once()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:16s} {best:.3f}s")
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

print("== slice staging cost (_write_time_slices, full events, n=4) ==")
from kafka_streams_in_action_spark.plans.queries import _write_time_slices

ev = load_table(spark, "events", SF_DIR)
best = None
for _ in range(3):
    d = tempfile.mkdtemp(prefix="floor_probe_slices_")
    t0 = time.time()
    _write_time_slices(ev, d)
    dt = time.time() - t0
    shutil.rmtree(d, ignore_errors=True)
    best = dt if best is None else min(best, dt)
print(f"staging          {best:.3f}s")

print("== ev.count() cost (the _parts_for sizing action) ==")
best = None
for _ in range(3):
    t0 = time.time()
    ev.count()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(f"count            {best:.3f}s")

print("== representative twin end-to-end (c12_drawdown_stream) ==")
from kafka_streams_in_action_spark.plans.queries import QUERIES

fn = QUERIES["c12_drawdown_stream"].fn
fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
for label, confs in CONFIG_SETS.items():
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:16s} {best:.3f}s")
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

shutil.rmtree(src, ignore_errors=True)
