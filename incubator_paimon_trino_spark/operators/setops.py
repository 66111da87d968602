"""Set operations — SURVEY §2.B set-op rows (Trino suite ``testUnion*``,
``testIntersect``, ``testExcept``, ``testChainedUnionsWithOrder``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import register
from incubator_paimon_trino_spark.sources import table


def _buyers(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_custkey").alias("custkey"))
    )


def _rich(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .select(F.col("c_custkey").alias("custkey"))
    )


_BUYERS_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000"
_RICH_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000"


@register("setop_union_all", oracle=f"{_BUYERS_SQL} UNION ALL {_RICH_SQL}")
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag semantics, no shuffle (just concatenated partitions)."""
    return _buyers(spark, sf_dir).unionAll(_rich(spark, sf_dir))


@register("setop_union_distinct", oracle=f"{_BUYERS_SQL} UNION {_RICH_SQL}")
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — one hash-dedup shuffle after the concat."""
    return _buyers(spark, sf_dir).union(_rich(spark, sf_dir)).distinct()


@register("setop_intersect", oracle=f"{_BUYERS_SQL} INTERSECT {_RICH_SQL}")
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) → left-semi join under the hood."""
    return _buyers(spark, sf_dir).intersect(_rich(spark, sf_dir))


@register("setop_except", oracle=f"{_BUYERS_SQL} EXCEPT {_RICH_SQL}")
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) → left-anti join under the hood."""
    return _buyers(spark, sf_dir).subtract(_rich(spark, sf_dir))


@register(
    "setop_intersect_all",
    oracle=f"{_BUYERS_SQL} INTERSECT ALL {_RICH_SQL}",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection (min multiplicity per value)."""
    return _buyers(spark, sf_dir).intersectAll(_rich(spark, sf_dir))


@register(
    "setop_except_all",
    oracle=f"{_BUYERS_SQL} EXCEPT ALL {_RICH_SQL}",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (multiplicity-aware)."""
    return _buyers(spark, sf_dir).exceptAll(_rich(spark, sf_dir))


@register(
    "setop_chained_union_order_limit",
    oracle=f"""
    SELECT custkey FROM ({_BUYERS_SQL} UNION ALL {_RICH_SQL} UNION ALL
                         SELECT s_suppkey AS custkey FROM supplier)
    ORDER BY custkey DESC LIMIT 50
    """,
)
def setop_chained_union_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained unions + global ORDER BY + LIMIT (``testChainedUnionsWithOrder``)."""
    s = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("custkey"))
    return (
        _buyers(spark, sf_dir)
        .unionAll(_rich(spark, sf_dir))
        .unionAll(s)
        .orderBy(F.desc("custkey"))
        .limit(50)
    )
