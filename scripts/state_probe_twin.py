"""Generic stateOperators probe for the windowed-agg streaming twins:
run one of the sentinel-harness twins (C22-s/C23-s/C24-s) at base and
at N× event volume and record per-batch state rows / memory / input
rows, so the 100× ledger carries OBSERVED window-state posture (open
windows in the store, eviction at each watermark advance) instead of an
asserted one — the c35_cdc_stream treatment extended to the built-in
window operators.

Expected posture: tumbling state ≈ windows not yet passed by the
watermark (bounded by the slice span, NOT stream length); sliding ≈ 4×
that (the overlap factor); session ≈ open sessions (per-user, merge
state). At k× arrival density over the same time span, per-batch window
COUNTS stay constant for tumble/slide (windows are time-grid cells;
only their aggregates grow) — the strongest bounded-state shape there
is — while session state tracks open sessions ≤ |users|.

Usage: SPARK_DRIVER_MEM=24g python scripts/state_probe_twin.py \
           <query name> [x_dir (default /tmp/spark_graft_scale_x100)]
Prints one JSON object to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_in_action_spark.session import get_spark


def run(spark, name: str, sf_dir: str) -> dict:
    # re-enter the twin through its registered wrapper, but capture the
    # StreamingQuery progress via the listener the wrapper can't expose:
    # availableNow queries deregister on finish, so snapshot progress
    # through a QueryListener registered for the run.
    from pyspark.sql.streaming import StreamingQueryListener

    progresses: list = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            progresses.append(json.loads(p.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    from kafka_streams_in_action_spark.plans.queries import QUERIES

    listener = L()
    spark.streams.addListener(listener)
    try:
        t0 = time.time()
        out_rows = QUERIES[name].fn(spark, sf_dir).count()
        wall = round(time.time() - t0, 2)
    finally:
        spark.streams.removeListener(listener)
    batches = []
    for p in progresses:
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
    return {"sf_dir": sf_dir, "wall_sec": wall, "out_rows": out_rows,
            "batches": batches}


def main() -> None:
    name = sys.argv[1]
    x_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale_x100"
    # keep numRowsTotal flowing despite the replay harness's production
    # posture (trackTotalNumberOfRows=false) — this probe exists to read it
    os.environ["SPARK_GRAFT_OBSERVE_STATE"] = "1"
    spark = get_spark("twin-state-probe")
    base = run(spark, name, "/root/testdata/sf0.1")
    print(f"# base: {json.dumps(base)}", file=sys.stderr, flush=True)
    scaled = run(spark, name, x_dir)
    print(json.dumps({"metric": f"{name}_state_probe",
                      "base": base, "scaled": scaled}))


if __name__ == "__main__":
    main()
