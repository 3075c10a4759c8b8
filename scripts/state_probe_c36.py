"""c36_outer_join state-metrics probe (verdict r12 item 4): run the
left-outer stream-stream interval join at base (sf0.1) and at N× event
volume and record the stateOperators readings per batch — state rows,
state memory, watermark-dropped rows, input rows — plus wall time, so
the 100× ledger carries an OBSERVED state posture for the largest
absolute 100× cost instead of an asserted one.

The join buffers BOTH sides in the state store and evicts by the
watermark + interval bound, so the expected posture at k× volume over
the same time range (the scale corpus keeps the time span and multiplies
arrival density) is: state rows ≈ rows within the 1h horizon of the
stream tail ≈ k× base (linear in arrival rate — watermark-bounded
relative to stream LENGTH, which grows unboundedly while the horizon
share stays constant), with eviction visible as state rows << input
rows.

Usage: SPARK_DRIVER_MEM=24g python scripts/state_probe_c36.py \
           [x_dir (default /tmp/spark_graft_scale_x100)]
Prints one JSON object; merge into SCALE100_r{N}.json by hand with the
adjudication note.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_in_action_spark.session import get_spark
from kafka_streams_in_action_spark.sources.parquet import load_table
from kafka_streams_in_action_spark.streaming.joins import (
    click_attribution_outer_stream,
)
from kafka_streams_in_action_spark.plans.queries import (
    _parts_for, _stream_partitions,
)


def run(spark, sf_dir: str) -> dict:
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "ts")
    src = tempfile.mkdtemp(prefix="c36_state_probe_src_")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    sink = f"c36_state_probe_{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    with _stream_partitions(spark, _parts_for(ev.count()),
                            observe_state=True):
        q = (click_attribution_outer_stream(
                spark.readStream.schema(ev.schema).parquet(src))
             .writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True)
             .start())
        if not q.awaitTermination(1800):
            q.stop()
            raise TimeoutError("c36 probe stream did not finish")
        progress = list(q.recentProgress)
    wall = round(time.time() - t0, 2)
    batches = []
    for p in progress:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        batches.append({
            "batch": p["batchId"],
            "input_rows": p.get("numInputRows"),
            "state_rows": sum(op.get("numRowsTotal", 0) for op in ops),
            "state_mem_bytes": sum(op.get("memoryUsedBytes", 0)
                                   for op in ops),
            "rows_dropped_by_wm": sum(
                op.get("numRowsDroppedByWatermark", 0) for op in ops),
        })
    out_rows = spark.table(sink).count()
    return {"sf_dir": sf_dir, "wall_sec": wall, "out_rows": out_rows,
            "batches": batches}


def main() -> None:
    x_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_x100"
    spark = get_spark("c36-state-probe")
    base = run(spark, "/root/testdata/sf0.1")
    print(f"# base: {json.dumps(base)}", file=sys.stderr, flush=True)
    scaled = run(spark, x_dir)
    print(json.dumps({"metric": "c36_outer_join_state_probe",
                      "base": base, "scaled": scaled}))


if __name__ == "__main__":
    main()
