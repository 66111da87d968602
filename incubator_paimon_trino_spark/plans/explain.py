"""Physical-plan inspection helpers.

The reference proves its pushdowns via connector-API hooks; in Spark the
equivalent proof is the physical plan text: ``PushedFilters`` on the parquet
scan, ``PartitionFilters`` for pruned partitions, ``ReadSchema`` for column
pruning, broadcast vs shuffle exchanges for join strategy. These helpers make
those assertions one-liners in tests and in the perf-iteration loop
("explain, then iterate until it's the plan you'd want").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed-plan text with metadata truncation lifted.

    ``spark.sql.maxMetadataStringLength`` defaults to 100, which silently cuts
    scan metadata mid-line — ``PushedFilters: [...]`` can vanish from the
    string even though pushdown happened. Bump it around the render.
    """
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "10000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is not None:
            spark.conf.set(key, old)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet reader."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        out += [s.strip() for s in m.group(1).split(",") if s.strip()]
    return out

def partition_filters(df: DataFrame) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", physical_plan(df)):
        out += [s.strip() for s in m.group(1).split(",") if s.strip()]
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (projection pushdown proof)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols += [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
    return sorted(set(cols))


def count_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges in the plan — the scale currency to minimize."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(df).count(
        "Exchange rangepartitioning"
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans — wider is better (expressions stay JVM-side)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", physical_plan(df))))
