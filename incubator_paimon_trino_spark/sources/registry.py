"""Flat-parquet table registry for the driver's test tables.

The reference resolves ``schema.table`` names through the Paimon catalog and
plans splits by hand (``TrinoMetadataBase.getTableHandle``,
``TrinoSplitManagerBase.getSplits`` — see SURVEY §2.A1/A3). On Spark, split
planning, filter/projection pushdown and partition pruning are Catalyst's job:
a plain ``spark.read.parquet`` scan gets all of it for free, so this registry
is deliberately thin.

Versioned lake tables (snapshots, merge-on-read, DDL) live in
``incubator_paimon_trino_spark.catalog`` — this module only maps the driver's
pre-generated flat parquet tables (TESTDATA.md) to DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Return the driver table ``name`` under ``sf_dir`` as a DataFrame.

    Scans stay fully declarative so Catalyst pushes filters/projections into
    the parquet reader (`PushedFilters` / `ReadSchema` in the physical plan).

    ``events.ts`` has shipped in two physical encodings depending on the
    driver's generator version: parquet TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects — read as raw INT64 via ``nanosAsLong`` and
    truncate to micros) or plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ).
    Normalize both to session-TZ TimestampType so every downstream query and
    oracle sees one stable type.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ts becomes TimestampType (session-tz rendered). Pin the session to
        # UTC so values are identical under ANY host session — the reference
        # likewise forces UTC packing (TrinoPageSourceBase.java:216-219).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):  # nanos read as INT64
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # TIMESTAMP_NTZ (or already LTZ): wall-clock is UTC → identity cast.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
