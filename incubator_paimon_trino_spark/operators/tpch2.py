"""TPC-H Q2/Q7/Q8/Q9/Q11/Q15/Q16/Q17/Q20/Q21/Q22 shapes, completing the suite.

The reference's engine-conformance suite installs the Trino TPC-H catalog
(``paimon-trino-common/src/test/java/org/apache/paimon/trino/TrinoQueryRunner.java:49-60``)
— the full 22-query surface is the declared capability. The driver's star
schema omits ``partsupp`` and several columns (``l_commitdate``,
``l_receiptdate``, ``p_container``, ``c_phone``, ``ps_supplycost``), so each
query here keeps its defining operator shape (the reason the query exists in
the suite) on the available columns:

- Q2  min-cost supplier   → correlated scalar MIN subquery (lineitem as the
  part↔supplier bridge standing in for partsupp)
- Q7  volume shipping     → nation self-join pair + disjunctive cross filter
- Q8  market share        → 8-way join + conditional share-of-total per year
- Q9  product-type profit → LIKE filter + profit expression (retailprice cost
  model replaces ps_supplycost)
- Q11 important stock     → HAVING-style filter vs a scalar fraction-of-total
- Q15 top supplier        → CTE reused twice + scalar MAX equality
- Q16 supplier-part cnt   → COUNT(DISTINCT) + NOT IN anti-join
- Q17 small-qty revenue   → per-part correlated AVG threshold
- Q20 potential promotion → IN over grouped/HAVING subquery
- Q21 kept-waiting        → EXISTS + NOT EXISTS double correlation
  (multi-supplier order with only this supplier's lines returned, replacing
  the receipt>commit lateness predicate)
- Q22 sales opportunity   → substring bucketing + anti-join + scalar AVG

Scale notes (100 TB design): only FIXED-size dims (nation 25 rows, region 5)
carry an explicit broadcast hint. supplier/part/customer scale with SF, so
their joins are left to the optimizer: file-size statistics and AQE broadcast
them while they fit and switch to shuffle joins beyond — a forced hint would
OOM executors at 100 TB. Fact↔fact joins co-shuffle on the join key only.
Correlated subqueries are left to Catalyst's decorrelation
(RewriteCorrelatedScalarSubquery / RewritePredicateSubquery) which plans them
as broadcast or shuffled aggregate joins — the same plan a hand decorrelation
would produce. Determinism of double aggregates follows registry.dec2 (exact
decimal partial aggregation, final cast to double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import dec2, register, views
from incubator_paimon_trino_spark.sources import table

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(9,2))"
    " * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))"
)


def _one():
    return F.lit(1).cast("decimal(9,2)")


_Q2_SQL = """
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
           l_extendedprice AS supply_cost
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=_Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery, decorrelated by Catalyst.

    ``l_extendedprice`` stands in for ``ps_supplycost`` (no partsupp table in
    the driver schema). MIN over raw doubles is exact and order-independent,
    so the double equality is deterministic across engines.
    """
    views(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q2_SQL)


_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             {disc_price} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
""".format(disc_price=_DISC_PRICE_SQL)


@register("q7_volume_shipping", oracle=_Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: two roles of the nation dim + disjunctive nation-pair filter.

    Both nation joins broadcast; the pair disjunction is a residual filter
    after the joins, exactly as Trino plans it.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01 00:00:00", "1997-12-31 00:00:00")
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum(dec2("l_extendedprice") * (_one() - dec2("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q8_SQL = """
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                              ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             {disc_price} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
""".format(disc_price=_DISC_PRICE_SQL)


@register("q8_market_share", oracle=_Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: 8-way star join + share-of-total; nation/region broadcast by
    hint, the SF-scaled dims by optimizer size estimate while they fit.

    The division is double/double of two exact decimal sums — bit-identical
    in both engines.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01 00:00:00", "1997-12-31 00:00:00")
    )
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = dec2("l_extendedprice") * (_one() - dec2("l_discount"))
    zero = F.lit(0).cast("decimal(9,2)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q9_SQL = """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             {disc_price}
               - CAST(p_retailprice AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
""".format(disc_price=_DISC_PRICE_SQL)


@register("q9_product_type_profit", oracle=_Q9_SQL)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: LIKE-filtered part dim + profit expression, grouped by nation/year.

    ``p_retailprice * l_quantity`` is the cost model standing in for
    ``ps_supplycost`` (no partsupp table). Decimal subtraction stays exact.

    r13: measured fan_out here and REVERTED it (A/B: 0.55 s plain vs 0.86 s
    fanned — probe chain cheaper serially than an extra exchange at this
    scale; see OPTIMIZATION_r13.md).
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    amount = dec2("l_extendedprice") * (_one() - dec2("l_discount")) - dec2(
        "p_retailprice"
    ) * dec2("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q11_SQL = """
    SELECT l_partkey, part_value FROM (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    ) pv
    WHERE part_value > (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)
             * CAST(0.001 AS DOUBLE)
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3')
    ORDER BY part_value DESC, l_partkey
"""


@register("q11_important_part_values", oracle=_Q11_SQL)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a scalar fraction-of-total threshold.

    Lineitem value per part stands in for partsupp stock value. The scalar
    subquery re-aggregates the same filtered scan; Catalyst plans it as a
    broadcast of the 1-row total — no driver-side collect.
    """
    views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


_Q15_SQL = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({disc_price}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
""".format(disc_price=_DISC_PRICE_SQL)


@register("q15_top_supplier", oracle=_Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: CTE (revenue view) used twice + scalar MAX equality.

    The double equality is safe because both sides derive from the same exact
    decimal sum. Catalyst reuses the aggregated subplan (ReusedExchange) rather
    than scanning lineitem twice.
    """
    views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


_Q16_SQL = """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_part_counts", oracle=_Q16_SQL)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: COUNT(DISTINCT) + NOT IN anti-join.

    ``s_acctbal < 0`` replaces the 'customer complaints' comment filter.
    ``l_suppkey`` is non-null so NOT IN is a plain left-anti join; the
    excluded-supplier list is a filtered fraction of supplier, so the
    optimizer broadcasts it while it fits.
    """
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49)
    )
    li = table(spark, sf_dir, "lineitem")
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q17_SQL = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)
                / CAST(7 AS DOUBLE) AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND l_quantity < (
        SELECT CAST(0.2 AS DOUBLE)
               * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@register("q17_small_quantity_revenue", oracle=_Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: per-part correlated AVG threshold (decorrelated to an agg join).

    Catalyst rewrites the correlated scalar subquery into a groupBy(l_partkey)
    aggregate joined back on the key — the same two-pass plan Trino produces.
    AVG is expressed as exact-sum/count for cross-engine determinism.
    """
    views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


_Q20_SQL = """
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(9,2))) > CAST(40 AS DECIMAL(9,2)))
    ORDER BY s_name
"""


@register("q20_potential_promotion", oracle=_Q20_SQL)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a grouped+HAVING subquery (semi-join).

    Shipped-quantity-over-threshold replaces the availqty comparison (no
    partsupp). The HAVING threshold compares exact decimals — no float
    boundary flakiness.
    """
    views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_1'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@register("q21_suppliers_kept_waiting", oracle=_Q21_SQL)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: EXISTS + NOT EXISTS double correlation on the same fact table.

    'Only supplier whose lines were returned in a multi-supplier finished
    order' replaces the receipt>commit lateness predicate (those date columns
    are absent). Catalyst plans the two correlations as left-semi and
    left-anti joins on l_orderkey.

    r13: measured a fanned lineitem view (``views(..., fan=...)``) and
    REVERTED it (A/B: 0.55 s plain vs 0.75 s fanned — the semi/anti joins
    re-exchange on l_orderkey anyway, so the fan exchange was a pure extra
    hop; see OPTIMIZATION_r13.md).

    r13 wave 3: prototyped the single-scan aggregation rewrite (group by
    (orderkey, suppkey) with per-order window counts replacing the
    EXISTS/NOT-EXISTS self-joins — 3 lineitem scans → 1) and REJECTED it on
    measurement: 0.65 s current vs 0.97 s rewritten (idle, noop best-of-3)
    — at sf0.1 three pushed-filter single-task scans + broadcast probes
    beat one full-width shuffle agg + window sort. Result-identical
    (verified sf0.01/sf0.1); see OPTIMIZATION_r13.md for the scale
    trade-off discussion.
    """
    views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(9,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > CAST(0 AS DOUBLE))
    ) custsale
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


@register("q22_global_sales_opportunity", oracle=_Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: substring bucketing + scalar AVG threshold + anti-join.

    ``SUBSTRING(c_name, 17, 2)`` buckets on the last customer-number digits
    (no c_phone column); 'no recent orders' replaces 'no orders ever' so the
    anti-join keeps a non-trivial survivor set on this data distribution.
    """
    views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)
