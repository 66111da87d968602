"""Sequential-pattern operators — the MATCH_RECOGNIZE-shaped surface.

The reference's inherited suite names row-pattern matching
(``testAggregationInPatternMatching``, ``testJoinedPatternMatch`` — skipped),
and SURVEY §2.B marks it "no Spark equivalent". The *capability* — detect
ordered event patterns per key — is expressible with window functions for
fixed patterns; these operators cover the common cases (funnel, A-then-B
within time bound, consecutive-streak) as oracle-checkable plans. A general
regex-over-rows engine would layer an ``applyInPandas`` NFA on the same
partition-sort shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import register
from incubator_paimon_trino_spark.sources import table


@register(
    "pattern_funnel_view_click_purchase",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER w AS next1,
             LEAD(event_type, 2) OVER w AS next2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_funnels
    FROM seq
    WHERE event_type = 'view' AND next1 = 'click' AND next2 = 'purchase'
    GROUP BY user_id
    """,
)
def pattern_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE analogue: strictly-consecutive view→click→purchase
    per user (PATTERN (V C P)) counted per user."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("next1"),
        F.lead("event_type", 2).over(w).alias("next2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view") & (F.col("next1") == "click") & (F.col("next2") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_funnels"))
    )


@register(
    "pattern_error_within_5min_of_purchase",
    oracle="""
    WITH nxt AS (
      SELECT user_id, event_id, event_type, ts,
             LEAD(event_type) OVER w AS next_type,
             LEAD(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS purchase_event
    FROM nxt
    WHERE event_type = 'purchase' AND next_type = 'error'
      AND epoch_us(next_ts) - epoch_us(ts) <= 300000000
    """,
)
def pattern_error_within_5min_of_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-then-B-within-Δt: purchase immediately followed by an error inside
    5 minutes (PATTERN (P E) with a duration predicate)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return nxt.filter(
        (F.col("event_type") == "purchase")
        & (F.col("next_type") == "error")
        & (F.unix_micros("next_ts") - F.unix_micros("ts") <= 300_000_000)
    ).select("user_id", F.col("event_id").alias("purchase_event"))


@register(
    "pattern_longest_click_streak",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
             CASE WHEN event_type = 'click'
                   AND COALESCE(LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id), '') = 'click'
                  THEN 0 ELSE 1 END AS boundary
      FROM events
    ),
    runs AS (
      SELECT user_id, is_click,
             SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM marked
    )
    SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_click_streak
    FROM (SELECT user_id, run_id, COUNT(*) AS run_len
          FROM runs WHERE is_click = 1 GROUP BY user_id, run_id)
    GROUP BY user_id
    """,
)
def pattern_longest_click_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATTERN (C+) greedy-run equivalent: longest consecutive click run per
    user via gaps-and-islands (boundary cumsum)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
        F.when(
            (F.col("event_type") == "click")
            & (F.coalesce(F.lag("event_type").over(w), F.lit("")) == "click"),
            0,
        )
        .otherwise(1)
        .alias("boundary"),
    )
    runs = marked.withColumn(
        "run_id", F.sum("boundary").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return (
        runs.filter(F.col("is_click") == 1)
        .groupBy("user_id", "run_id")
        .agg(F.count("*").alias("run_len"))
        .groupBy("user_id")
        .agg(F.max("run_len").alias("longest_click_streak"))
    )
