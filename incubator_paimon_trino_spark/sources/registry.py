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
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
