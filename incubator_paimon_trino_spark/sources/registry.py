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
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return normalize_events_ts(df, events_ts_is_nanos(spark, sf_dir))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_ts_is_nanos(spark: SparkSession, sf_dir: str) -> bool:
    """True when ``events.ts`` ships as parquet TIMESTAMP(NANOS).

    Also pins the confs the events encodings require: ``nanosAsLong`` (the
    vectorized reader rejects NANOS otherwise) and a UTC session timezone so
    values are identical under ANY host session — the reference likewise
    forces UTC packing (TrinoPageSourceBase.java:216-219). Single source of
    the encoding contract for BOTH the batch loader and the streaming source
    (operators/events.py) — a third driver encoding gets added here once.
    """
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    return isinstance(raw["ts"].dataType, T.LongType)


def normalize_events_ts(df: DataFrame, nanos: bool) -> DataFrame:
    """Normalize ``ts`` to session-TZ TimestampType from either encoding:
    raw INT64 nanos → truncate to micros; TIMESTAMP_NTZ/LTZ → identity cast
    (wall-clock is UTC under the pinned session timezone)."""
    from pyspark.sql import functions as F

    if nanos:
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))
