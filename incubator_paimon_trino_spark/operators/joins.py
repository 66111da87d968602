"""Join surface — SURVEY §2.B join rows.

Joins are engine-side in the reference (Trino's optimizer chooses the
distribution; the connector only feeds splits — `testExplainJoinDistribution`,
`testUnionWithJoin`, `testCorrelatedJoin` in the inherited suite). Spark
equivalents with scale strategy per shape:

- dim joins → broadcast hash join, zero fact shuffle; the hint is reserved
  for FIXED-size dims — SF-scaled tables are left to the optimizer's size
  estimate/AQE, which broadcasts while they fit and shuffles beyond
- fact-fact equi joins → sort-merge/shuffled-hash on the key (AQE picks)
- semi/anti → ``left_semi`` / ``left_anti`` (no payload duplication)
- non-equi/range → broadcast nested loop ONLY when one side is tiny;
  a banded equi-join rewrite otherwise (see ``join_range_banded``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import register
from incubator_paimon_trino_spark.sources import table


@register(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    # customer is SF-scaled: no forced broadcast — optimizer/AQE decide
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN with a join-side filter in the ON clause (not WHERE) —
    preserves unmatched customers with NULL order columns."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_right_outer",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM nation RIGHT JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, s = table(spark, sf_dir, "nation"), table(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "right").select(
        "s_suppkey", "s_name", "n_name"
    )


@register(
    "join_full_outer",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000),
         rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    SELECT buyers.o_custkey AS buyer_key, rich.c_custkey AS rich_key
    FROM buyers FULL OUTER JOIN rich ON buyers.o_custkey = rich.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER over two derived sets with partial overlap."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
        .distinct()
    )
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return o.join(c, o.o_custkey == c.c_custkey, "full").select(
        F.col("o_custkey").alias("buyer_key"), F.col("c_custkey").alias("rich_key")
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI = IN/EXISTS; emits each customer at most once, no payload."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI = NOT IN (null-free key side). The anti side is customers
    with no URGENT order — a NON-EMPTY result at every SF: the previous
    customers-without-any-orders form returned zero rows at the driver's
    grading SF, so a broken anti-join translation would still have graded
    green against the trivially-empty oracle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey <> r2.r_regionkey
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (tiny×tiny only — a cartesian of big tables is a design bug)."""
    r1 = table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return r1.crossJoin(r2).filter(F.col("k1") != F.col("k2")).select("from_region", "to_region")


@register(
    "join_theta_inequality",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    """,
)
def join_theta_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi component (hashable) + inequality residual. Catalyst
    hashes on s_nationkey=c_nationkey and filters the residual — NOT a
    cartesian, so it scales like an equi join."""
    s, c = table(spark, sf_dir, "supplier"), table(spark, sf_dir, "customer")
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
    ).select("s_suppkey", "c_custkey")


@register(
    "join_range_banded",
    oracle="""
    SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks_prev_hour
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.event_id
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via banding: clicks within the hour before each purchase.

    A naive interval join is O(n·m) per user (nested-loop). Banding makes it
    an equi join: clicks bucket to their hour; each purchase *explodes to the
    only two hour-buckets its 1-hour lookback can touch*; join on
    (user_id, bucket) then filter the exact interval. Shuffle-hash plan,
    2× row amplification on the smaller side — the 100 TB-safe shape for
    time-range joins.
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.date_trunc("hour", "ts").alias("bucket")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.date_trunc("hour", "p_ts"),
                    F.date_trunc("hour", F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
                )
            ),
        )
        # no dedup needed: the two exploded buckets are exactly one hour
        # apart and can never collide — a dropDuplicates here would add a
        # full extra hash exchange over 2x the purchase stream for nothing
    )
    return (
        purchases.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n_clicks_prev_hour"))
    )


@register(
    "join_asof",
    oracle="""
    SELECT l.user_id, l.o_orderkey, r.event_id AS asof_event
    FROM (SELECT o_custkey % 500 AS user_id, o_orderdate AS t, o_orderkey
          FROM orders) l
    ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events) r
      ON l.user_id = r.user_id AND r.ts < l.t
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest event strictly before each order date per customer-user.

    Implemented as union + window (`last_value` ignoring nulls over time order)
    — pure shuffle-sort, no per-row Python, scales with the data. The common
    alternative (`applyInPandas` + `pd.merge_asof` per key) is kept in
    tests for parity checking.

    Tie semantics: at equal timestamps the order row sorts before events
    (nulls-first on ev_id), so an event at exactly the order date is NOT
    matched — strict "before", mirrored by ``r.ts < l.t`` in DuckDB's native
    ASOF JOIN oracle.
    """
    o = table(spark, sf_dir, "orders").withColumn("user_id", F.col("o_custkey") % 500)
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts"), F.col("event_id").alias("ev_id")
    )
    from pyspark.sql import Window as W

    left = o.select(
        "user_id",
        F.col("o_orderdate").alias("t"),
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast("long").alias("ev_id"),
    )
    right = ev.select(
        "user_id", F.col("ts").alias("t"), F.lit(None).cast("long").alias("okey"), "ev_id"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "ev_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "asof_event", F.last("ev_id", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("okey").isNotNull())
        .select("user_id", F.col("okey").alias("o_orderkey"), "asof_event")
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi join: fact keys get a salt of ``_SALTS`` shards, the
    build side is replicated across all salts, and the join key becomes
    (key, salt) — a hot key's rows now spread over ``_SALTS`` reducers
    instead of one straggler task.

    The oracle is the PLAIN join: salting must be a pure physical rewrite
    with identical results. (AQE's skewJoin handles moderate skew
    automatically; explicit salting is the pattern for the pathological
    hot-key case — e.g. a null-ish default key holding 10% of a 100 TB
    fact table — where one reducer would otherwise spill forever.)
    """
    _SALTS = 8
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted_fact = li.withColumn("_salt", F.pmod(F.xxhash64("l_extendedprice"), F.lit(_SALTS)))
    replicated_build = o.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(_SALTS)]))
    )
    joined = salted_fact.join(
        replicated_build,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (salted_fact["_salt"] == replicated_build["_salt"]),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(9,2)")).cast("double").alias("revenue"),
    )
