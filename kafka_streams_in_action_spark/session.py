"""SparkSession factory.

Tuned for the driver harness (local[N], single JVM) but configured the way a
1000-executor cluster job would be: AQE on (runtime join re-planning + skew
handling), UTC session timezone, Arrow enabled for the Pandas-UDF slow path,
shuffle partitions sized to the parallelism actually available rather than the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "kafka_streams_in_action_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) the session.

    At 100 TB the same settings apply, with shuffle_partitions scaled to
    cluster cores (AQE coalesces the excess at runtime, so oversizing is safe;
    undersizing is not).
    """
    # Python workers unpickle our pandas UDFs by module reference, so the repo
    # root must be importable in the worker processes regardless of the
    # driver's cwd. Must happen before the JVM (and its worker daemons) start.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + pp if pp else ""))

    n = cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.ts has shipped as parquet TIMESTAMP(NANOS), which
        # Spark can't read natively; sources/parquet.py probes the footer and
        # reads that layout as raw int64 via this flag (micros/INT96 layouts
        # read natively)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write timestamps as INT64 micros, not deprecated INT96 — keeps
        # everything we write round-trippable through the same footer probe
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # transformWithState requires RocksDB; it's also the state store that
        # scales (incremental checkpoints, off-heap, changelog) — engine-wide.
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
