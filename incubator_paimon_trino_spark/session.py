"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` but every setting is chosen to also hold on
a 1000-executor cluster reading ~100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting, join
  strategy switch) — replaces the reference's hand-rolled split weighting
  (``TrinoSplitManagerBase.java:50-63``) with runtime re-planning.
- ``spark.sql.session.timeZone=UTC`` — the reference forces UTC packing for
  timestamptz values (``TrinoPageSourceBase.java:216-219``); we match.
- Arrow enabled — all Python-side operators use vectorized Pandas UDFs, never
  row-at-a-time UDFs.
- shuffle partitions default to cores locally; on a real cluster AQE coalesces
  from a deliberately-high initial number, so we leave
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` unset locally
  and document it as the scale knob.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "incubator_paimon_trino_spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark 4.1 native TIME type (functions/types.py maps Paimon TIME(p))
        .config("spark.sql.timeType.enabled", "true")
        # INT96 (legacy default) parquet timestamps carry no min/max column
        # statistics; micros do — required for manifest-level file skipping
        # on event-time predicates (catalog/scan.py)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # r13 optimization: 32g, not 90g. In local mode this one JVM is
        # driver + all executors; at 90g, G1 accumulated multi-second GC
        # pauses that landed on whichever query ran late in a session
        # (measured: 0.6s queries spiking to 2.6s, once 14s, on the idle
        # box; at 16–32g the spikes vanish and bench totals tighten by
        # 1–3s). 32g is ~6x the largest soak's working set (sf1). On a real
        # cluster driver/executor memory are deployment-sized; this is the
        # local default, still overridable via SPARK_GRAFT_DRIVER_MEM.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
