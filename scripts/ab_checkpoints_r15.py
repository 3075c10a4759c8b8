"""Round-15 (verdict r14 item 4): interleaved A/B of the five r14
checkpoint optimizations on one session — checkpoints ON (committed
code) vs OFF (DataFrame.localCheckpoint monkeypatched to identity).

For these five queries the only localCheckpoint calls on their paths
are exactly the r14 additions (verified by reading the operators), so
the identity patch isolates precisely that change. min-of-3, A/B/A/B
interleaved per query.

Note: the bench's c29_minhash_lsh row times the RAW minhash_lsh_pairs
path (no checkpoint); the A/B here times the REGISTERED verdict form,
which is what the r14 change touched.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from kafka_streams_in_action_spark.session import get_spark
from kafka_streams_in_action_spark.plans.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab_checkpoints_r15")

REAL_CKPT = DataFrame.localCheckpoint


def run(name: str, ckpt_on: bool) -> float:
    DataFrame.localCheckpoint = (
        REAL_CKPT if ckpt_on else (lambda self, eager=True: self))
    try:
        t0 = time.time()
        QUERIES[name].fn(spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()
        return time.time() - t0
    finally:
        DataFrame.localCheckpoint = REAL_CKPT


NAMES = sys.argv[1:] or ["c29_recall_curve", "c28_edit_verify",
                         "c43_kappa", "c38_linkpred", "c29_minhash_lsh"]

for name in NAMES:
    run(name, True)  # warm
    on, off = [], []
    for _ in range(3):
        on.append(run(name, True))
        off.append(run(name, False))
    verdict = "KEEP" if min(on) <= min(off) else "REVERT?"
    print(f"{name:18s} ckpt-ON min {min(on):.3f} {['%.2f'%t for t in on]}  "
          f"OFF min {min(off):.3f} {['%.2f'%t for t in off]}  -> {verdict}",
          flush=True)
