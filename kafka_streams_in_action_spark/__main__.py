"""Runnable lifecycles — the engine twin of the reference's cmd/ binaries.

    python -m kafka_streams_in_action_spark sales        (§3.1, cmd/sales)
    python -m kafka_streams_in_action_spark pipelining   (§3.2, cmd/pipelining)
    python -m kafka_streams_in_action_spark multi_event  (§3.3, cmd/multi_event)
    python -m kafka_streams_in_action_spark query <name> [sf_dir]   # any declared query

Without SPARK_GRAFT_KAFKA_BOOTSTRAP the pipelines use the file transport
(parquet "topics" under a temp dir) — same topology, no broker needed; with
it, the Kafka source/sink wrappers in sources/kafka.py take over.

Reference entry points: golang/cmd/sales/main.go:5-7,
golang/cmd/pipelining/main.go:5-7, golang/cmd/multi_event/main.go:36-61.
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

from .session import get_spark
from .sources.parquet import DEFAULT_SF_DIR, load_table


def _sales(spark, workdir: str) -> int:
    from .streaming import pipelines
    out, ckpt = f"{workdir}/topic", f"{workdir}/ckpt"
    q = pipelines.sales_produce(spark, out, ckpt, rows_per_batch=10)
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("demo stream did not finish within 120s")
    result = pipelines.sales_consume(spark, out)
    rows = result.collect()
    for r in rows:
        # the consumer's log line (sales_consumer_client.go:91-95)
        print(f"consumed key={r['record_key']} product={r['product_name']} "
              f"total={r['total']} partition={r['partition']}")
    return 0 if rows else 1


def _pipelining(spark, workdir: str) -> int:
    from .streaming import pipelines
    events_dir = f"{workdir}/events"
    load_table(spark, "events", "/root/testdata/sf0.001") \
        .write.mode("overwrite").parquet(events_dir)
    out, ckpt = f"{workdir}/commits", f"{workdir}/ckpt"
    q = pipelines.pipelining_run(spark, events_dir, out, ckpt)
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("demo stream did not finish within 120s")
    commits = spark.read.parquet(out).orderBy("user_id")
    for r in commits.limit(10).collect():
        print(f"commit user={r['user_id']} offset={r['commit_offset']} "
              f"n={r['n_records']}")
    n = commits.count()
    print(f"... {n} commit entries")
    return 0 if n else 1


def _multi_event(spark, workdir: str) -> int:
    from .streaming import pipelines
    events_dir = f"{workdir}/events"
    load_table(spark, "events", "/root/testdata/sf0.001") \
        .write.mode("overwrite").parquet(events_dir)
    out, ckpt = f"{workdir}/fanout", f"{workdir}/ckpt"
    q = pipelines.multi_event_run(spark, events_dir, out, ckpt)
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("demo stream did not finish within 120s")
    written = spark.read.parquet(out)
    for r in written.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")).orderBy("event_type").collect():
        print(f"routed type={r['event_type']} n={r['n']}")
    return 0


def _query(spark, name: str, sf_dir: str) -> int:
    from .plans.queries import QUERIES
    if name not in QUERIES:
        print(f"unknown query {name!r}; known: {', '.join(sorted(QUERIES))}",
              file=sys.stderr)
        return 2
    df = QUERIES[name].fn(spark, sf_dir)
    df.show(20, truncate=False)
    return 0


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    spark = get_spark(f"ksia-{cmd}")
    with tempfile.TemporaryDirectory(prefix="ksia_") as workdir:
        if cmd == "sales":
            return _sales(spark, workdir)
        if cmd == "pipelining":
            return _pipelining(spark, workdir)
        if cmd == "multi_event":
            return _multi_event(spark, workdir)
        if cmd == "query":
            if not rest:
                print("usage: query <name> [sf_dir]", file=sys.stderr)
                return 2
            return _query(spark, rest[0],
                          rest[1] if len(rest) > 1 else
                          os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    print(f"unknown command {cmd!r}; try --help", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
