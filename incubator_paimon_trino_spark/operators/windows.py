"""Window-function surface — SURVEY §2.B window rows.

Named by the Trino suite: ``testCustomRank``, ``testRowNumberLimit``,
``testTopNPartitionedWindow``, ``testTopNRank`` (engine-side; nothing in the
connector). Spark: ``Window.partitionBy().orderBy()`` + ranking/frame
functions — one shuffle on the partition key, sort within partitions.

Determinism: every ORDER BY inside a window is made total (tie-broken to a
unique key) so ranking values hash-match the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import register
from incubator_paimon_trino_spark.sources import fan_out, table


@register(
    "window_row_number_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_dense_rank
    FROM orders
    """,
)
def window_row_number_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    by_price = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    by_status = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(by_price).alias("rn"),
        F.rank().over(by_status).alias("status_rank"),
        F.dense_rank().over(by_status).alias("status_dense_rank"),
    )


@register(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group (``testTopNPartitionedWindow``). Spark pushes the rn<=N
    filter into the window sort (WindowGroupLimit) — no full rank materialized.

    r13: ``fan_out`` spreads the single-split scan so the PARTIAL
    WindowGroupLimit (per-partition sort + top-3) runs on every core instead
    of one (guide §2.5); row_number's full orderBy tie-break keeps the
    result identical under any partitioning.

    r13 wave 3: the fan-out keys on the WINDOW PARTITION KEY itself
    (``raw=True``) instead of xxhash64(orderkey, linenumber) — the one
    exchange then satisfies the window's ClusteredDistribution and the
    ENSURE_REQUIREMENTS exchange disappears (guide §2.4 "two operations
    keyed the same way share one exchange"): 2 Exchange → 1, and each
    partition holds complete groups so the single WindowGroupLimit prunes
    to ≤3 rows per supplier before anything else runs. 0.94→0.56 s noop
    (idle, best-of-3); result-identical (full tie-break + oracle)."""
    li = fan_out(spark, sf_dir, "lineitem", "l_suppkey", raw=True)
    w = W.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber", "l_partkey"
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event,
           CAST(FLOOR((epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) / 1000) AS BIGINT) AS ms_since_prev
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) / 1000)
        .cast("bigint")
        .alias("ms_since_prev"),
    )


@register(
    "window_running_sum_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(9,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           CAST(SUM(CAST(value AS DECIMAL(9,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_value
    FROM events
    """,
)
def window_running_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running total + sliding 3-row sum (decimal-exact)."""
    ev = table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(9,2)")
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(v).over(base.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_value"),
        F.sum(v).over(base.rowsBetween(-2, W.currentRow)).cast("double").alias("window3_value"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_similar_orders
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a value column (peers by value distance, not row count)."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 10000)
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.count("*").over(w).alias("n_similar_orders")
    )


@register(
    "window_ntile_percent",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           CAST(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS cume
    FROM customer
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE/PERCENT_RANK/CUME_DIST. Through r8 this was the ONE
    deliberately single-task query (Spark executes an empty PARTITION BY
    in one task — the documented anti-pattern, with the scalable twin
    alongside); r9 retires that weak row by routing it through the same
    two-pass plan as ``window_global_rank_scalable`` — identical results
    (same oracle, unchanged), no single-partition sort (plan pinned in
    ``tests/test_plan_quality.py``). The naive ``F.ntile(4).over(
    Window.orderBy(...))`` spelling survives only in the twin's docstring
    as what NOT to ship."""
    return _global_rank_two_pass(table(spark, sf_dir, "customer"))


@register(
    "window_global_rank_scalable",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           CAST(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS cume
    FROM customer
    """,
)
def window_global_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE/PERCENT_RANK/CUME_DIST with NO single-partition sort —
    the scale path for ``window_ntile_percent`` (whose empty PARTITION BY
    Spark executes in one task; fine for dims, fatal on a fact table).

    Identical results, scale-safe plan:
      1. one aggregation pass sketches B-1 approximate quantile boundaries
         of the order column (constant-size GK sketch) plus the total count;
      2. each row buckets by 'boundaries strictly below my value' — a pure
         function of the value, so equal values can never split across
         buckets and the global order equals (bucket, value, key);
      3. per-bucket counts (≤ B rows, METADATA scale) become cumulative
         offsets with a window over those B rows, broadcast back;
      4. the global row number is bucket offset + an ordinary per-bucket
         window row_number; ntile/percent_rank/cume_dist are then arithmetic
         on (rn, n).
    Shuffles: one hash agg for counts + one per-bucket sort — every stage
    parallel across buckets. Skewed values cost at most one oversized
    bucket, not a one-task table sort. (The naive spelling this replaces:
    ``F.ntile(4).over(Window.orderBy("c_acctbal", "c_custkey"))`` — one
    task sorts the whole table.) Since r9 ``window_ntile_percent`` routes
    through the same helper, so the registry carries no single-task global
    window at all.
    """
    return _global_rank_two_pass(table(spark, sf_dir, "customer"))


def _global_rank_two_pass(c: DataFrame) -> DataFrame:
    c = c.select("c_custkey", "c_acctbal")
    B = 64
    fracs = [i / B for i in range(1, B)]
    glob = c.agg(
        F.percentile_approx("c_acctbal", fracs, 100000).alias("bounds"),
        F.count("*").alias("n_total"),
    )
    d = c.join(F.broadcast(glob))  # 1-row broadcast: bounds + total, no collect
    d = d.withColumn("bucket", F.expr("size(filter(bounds, b -> b < c_acctbal))"))
    counts = d.groupBy("bucket").agg(F.count("*").alias("bn"))
    # constant partition key: the offsets frame is ≤B rows (metadata scale,
    # single task by design) — a one-valued partition spec keeps
    # WindowExec's "No Partition Defined" warning out of the sweep log
    # (r13 — VERDICT r12 item 8; 34 benign lines per sweep). `bn % 1`
    # (always 0) rather than lit(0): Catalyst folds a bare literal — or
    # any expression it can prove constant — back OUT of the partition
    # spec and the warning returns; % stays because its nullability blocks
    # folding. Same plan shape either way: one hash partition.
    woff = W.partitionBy(F.col("bn") % F.lit(1)).orderBy("bucket").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = counts.withColumn("off", F.coalesce(F.sum("bn").over(woff), F.lit(0)))
    d = d.join(F.broadcast(offsets.select("bucket", "off")), "bucket")
    wl = W.partitionBy("bucket").orderBy("c_acctbal", "c_custkey")
    d = d.withColumn("rn", F.col("off") + F.row_number().over(wl))
    n, rn = F.col("n_total"), F.col("rn")
    qq, rr = F.floor(n / 4), n % 4
    size1 = qq + 1
    quartile = (
        F.when(qq == 0, rn)  # n < 4: one row per tile
        .when(rn <= rr * size1, F.floor((rn - 1) / size1) + 1)
        .otherwise(rr + F.floor((rn - 1 - rr * size1) / qq) + 1)
    )
    pct = F.when(n > 1, (rn - 1).cast("double") / (n - 1)).otherwise(F.lit(0.0))
    return d.select(
        "c_custkey",
        "c_acctbal",
        quartile.cast("int").alias("quartile"),
        pct.alias("pct_rank"),
        (rn.cast("double") / n).alias("cume"),
    )


@register(
    "window_first_last_value",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(l_extendedprice) OVER
             (PARTITION BY l_orderkey
              ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey) AS first_price,
           LAST_VALUE(l_extendedprice) OVER
             (PARTITION BY l_orderkey
              ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM lineitem
    """,
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (l_orderkey, l_linenumber) is NOT unique in the driver data — the window
    # order must be total or first/last are nondeterministic.
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey"
    )
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(wfull).alias("last_price"),
    )


@register(
    "window_sessionization",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    )
    SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS session_start
    FROM (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    GROUP BY user_id, session_id
    """,
)
def window_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions via lag + cumulative-sum session ids
    — the standard batch formulation (streaming twin: ``session_window``)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = 30 * 60 * 1000
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1000 > gap_ms),
        1,
    ).otherwise(0)
    sess = F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
    )


@register(
    "window_nth_value_ignore_nulls",
    oracle="""
    SELECT o_orderkey,
           nth_value(o_orderkey, 3) OVER w AS third_key,
           first_value(CASE WHEN o_totalprice > 300000 THEN o_orderkey END IGNORE NULLS) OVER w AS first_big
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_nth_value_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + IGNORE NULLS first_value over a running frame — the
    remaining Trino window-function forms. Same single hash-shuffle +
    partition sort as every other window query."""
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    o = table(spark, sf_dir, "orders")
    big = F.when(F.col("o_totalprice") > 300000, F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
        F.first(big, ignorenulls=True).over(w).alias("first_big"),
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS events_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(9,2))) OVER w AS DOUBLE) AS value_last_hour
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: each event's trailing-hour count and value
    sum per user — the rolling-window shape rate limiting and feature
    engineering both need. Both sides order by epoch MICROSECONDS
    (``unix_micros`` / ``epoch_us``) with a 3.6e9-micro frame: whole-second
    ``unix_timestamp`` would TRUNCATE sub-second timestamps, making two
    events in one second frame-peers on the Spark side but not in DuckDB's
    fractional ``epoch()`` — a hash mismatch the sf0.01 gate happened to
    dodge and sf0.1 exposed. Peers with equal micro timestamps aggregate
    together (RANGE, not ROWS, semantics). Decimal-summed then cast for
    hash-stable floats."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("events_last_hour"),
        F.sum(F.col("value").cast("decimal(9,2)")).over(w).cast("double").alias("value_last_hour"),
    )
