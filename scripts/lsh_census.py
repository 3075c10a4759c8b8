"""LSH candidate-pair census at 1x/10x/100x (verdict r11 item 3).

Round 11 adjudicated `c29_minhash_lsh`'s superlinear 10x->100x decade
(x13.5 per x10) as candidate-pair growth from the copy-synth corpus's
near-dup density — plausible but asserted, because the scale ledger
recorded only wall time. This script converts the adjudication into a
measurement: for each scale (sf0.1 base, the x10 and x100 shifted-copy
builds) it records

- n_docs                — corpus size,
- n_candidates          — DISTINCT banded candidate pairs (the only
                          super-linear structure the plan contains),
- n_pairs               — verified output pairs (jaccard >= threshold;
                          candidates are verified-true pairs when
                          precision is high, so candidates ~ n_pairs
                          pins the growth on TRUE near-dup density, not
                          on banding false positives),
- sec                   — warm best-of-2 wall time of the raw scale
                          path (`minhash_lsh_pairs`, same as bench),

and repeats the census at the documented band-width dial (bands=4, i.e.
8 rows/band instead of 4 — a wider band AND-s more hashes, cutting the
collision probability of low-similarity pairs) so the dial's effect on
candidate count and wall time is a number, not a claim.

The banding census below mirrors the expressions inside
`dedup.minhash_lsh_pairs` (operators/dedup.py:323) VERBATIM — kept in
this measurement script so the registered operator (last driver-checked
r6, not in the r12 window) stays byte-identical.

Usage: python scripts/lsh_census.py > SCALE_LSH_r12.json
Env: SPARK_DRIVER_MEM=24g recommended (the x100 build shares one JVM).
"""
from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import dedup
from kafka_streams_in_action_spark.session import get_spark
from kafka_streams_in_action_spark.sources.parquet import load_table
import scale_probe

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = 0.1
NUM_HASHES = 32
NGRAM = 3


def candidate_pairs(documents, num_hashes: int, bands: int):
    """The banding stage of minhash_lsh_pairs, verbatim, stopping at the
    distinct candidate set (before Jaccard verification)."""
    rows_per_band = num_hashes // bands
    sig = dedup.minhash_signatures(documents, num_hashes, NGRAM)
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.xxhash64(*[F.col(f"h{bi * rows_per_band + r}")
                              for r in range(rows_per_band)]).alias("bucket"))
        for bi in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _time_path(spark, sf_dir: str, bands: int) -> float:
    def run():
        dedup.minhash_lsh_pairs(
            load_table(spark, "documents", sf_dir),
            num_hashes=NUM_HASHES, bands=bands,
            threshold=THRESHOLD, n=NGRAM,
        ).write.format("noop").mode("overwrite").save()

    run()  # warm
    best = None
    for _ in range(2):
        t0 = time.time()
        run()
        best = min(best or 1e9, time.time() - t0)
    return round(best, 3)


def census(spark, sf_dir: str, bands: int) -> dict:
    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    n_cand = candidate_pairs(docs, NUM_HASHES, bands).count()
    n_pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=NUM_HASHES, bands=bands,
        threshold=THRESHOLD, n=NGRAM).count()
    sec = _time_path(spark, sf_dir, bands)
    out = {"n_docs": n_docs, "n_candidates": n_cand,
           "n_pairs": n_pairs, "sec": sec}
    print(f"# {sf_dir} bands={bands}: {out}", file=sys.stderr, flush=True)
    return out


def main() -> None:
    spark = get_spark("lsh-census")
    scales = {"x1": BASE}
    for factor in (10, 100):
        out = f"/tmp/spark_graft_scale_x{factor}"
        if not os.path.exists(f"{out}/documents.parquet"):
            t0 = time.time()
            scale_probe.build(spark, BASE, out, factor)
            print(f"# built {out} in {time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
        scales[f"x{factor}"] = out

    report = {"metric": "lsh_candidate_census", "threshold": THRESHOLD,
              "num_hashes": NUM_HASHES, "base": BASE, "scales": {}}
    for label, d in scales.items():
        report["scales"][label] = {
            "bands8": census(spark, d, bands=8),
            "bands4_dial": census(spark, d, bands=4),
        }
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
