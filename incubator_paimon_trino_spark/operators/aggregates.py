"""Aggregation surface — SURVEY §2.B aggregation rows.

The reference delegates all aggregation to the Trino engine (nothing in the
connector); the inherited conformance suite names the surface: sum/count/min/
max/avg/count-distinct, approx_percentile, approx_set/HLL, grouping sets,
rollup (``common-test/TestTrinoDistributedQuery.java:96-181, 601, 686-725,
765``). Spark's physical plan is partial (map-side) + final hash aggregation —
the scalable shape: only one shuffle of pre-aggregated partials, keyed by the
group-by columns.

Approximate aggregates are algorithm-specific (Spark HLL++ / KLL vs DuckDB's
sketches), so their values can't hash-match an oracle — they get rows-only
checks, with the *exact* counterparts oracle-checked alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
    views,
)
from incubator_paimon_trino_spark.sources import table


@register(
    "agg_sum_global",
    oracle=f"SELECT {sql_dsum('l_quantity', 'total_qty')}, COUNT(*) AS n FROM lineitem",
)
def agg_sum_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global SUM with no grouping (ITCase ``SELECT SUM(b)`` — :273)."""
    return table(spark, sf_dir, "lineitem").agg(
        dsum("l_quantity", "total_qty"), F.count("*").alias("n")
    )


@register(
    "agg_min_max_count",
    oracle="""
    SELECT o_orderstatus,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date,
           COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_min_max_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX are order-insensitive on doubles — no decimal treatment needed."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "agg_group_multi_key_orderby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_group_multi_key_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key GROUP BY + ORDER BY (ITCase :298-303 shape)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), davg("l_discount", "avg_disc"), F.count("*").alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT l_partkey, COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY l_partkey
    HAVING COUNT(*) > 35
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"), dsum("l_quantity", "sum_qty"))
        .filter(F.col("n") > 35)
    )


@register(
    "agg_count_distinct_multi",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def agg_count_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one query — Spark plans an expand + two-phase
    aggregate; at scale this is one extra shuffle, not N."""
    return table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register("agg_approx_count_distinct")  # rows-only: HLL++ sketch != DuckDB's sketch
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — Trino suite ``testApproxSet*`` / ``testP4ApproxSet*``.

    HLL++ with rsd 1% — at 100 TB this replaces a full distinct shuffle with a
    fixed-size sketch merge. Value is algorithm-specific → rows-only check;
    the exact counterpart is oracle-checked in ``agg_count_distinct_multi``.

    r11 in-query invariant (VERDICT r10 item 7): the EXACT distinct counts
    are computed alongside and the query fails loudly unless each
    approximation lands within 5x the declared rsd (1%) of its exact twin
    value — the rows-only declaration is self-verifying on the driver's
    own data. The exact columns exist only for the check; the output stays
    approx-only (production shape is the sketch alone).

    r14: the exact twins moved to their OWN aggregation, attached by a
    1-row broadcast crossJoin (the guard_empty shape). Mixed in one agg,
    Spark's distinct rewrite dragged the approx aggregates through the
    COUNT(DISTINCT) Expand, materializing a 1639-word HLL partial buffer
    PER DISTINCT KEY GROUP (plan showed 2×1639 aggregate attributes keyed
    by (l_partkey, l_orderkey, gid) — ~13 KB/group of agg state + shuffle
    at any scale; at 100 TB that is a per-key sketch explosion). Split,
    each pass is a clean single-group aggregation: 4.5 s warm → ~0.6 s at
    sf0.01, and the sketch/exact VALUES are unchanged (HLL is
    order/partition-insensitive on the same input multiset).
    """
    from incubator_paimon_trino_spark.operators.registry import self_check

    li = table(spark, sf_dir, "lineitem")
    approx = li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
    )
    exact = li.agg(
        F.countDistinct("l_partkey").alias("_exact_parts"),
        F.countDistinct("l_orderkey").alias("_exact_orders"),
    )
    r = approx.crossJoin(F.broadcast(exact))
    within = (
        (F.abs(F.col("approx_parts") - F.col("_exact_parts"))
         <= 0.05 * F.col("_exact_parts"))
        & (F.abs(F.col("approx_orders") - F.col("_exact_orders"))
           <= 0.05 * F.col("_exact_orders"))
    )
    return self_check(
        r, within, "approx_count_distinct strayed beyond 5x rsd of exact"
    ).select("approx_parts", "approx_orders")


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS median_qty,
           CAST(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (both engines: linear interpolation).

    l_quantity is integral-valued, so interpolation arithmetic is exact in
    double — hash-safe.
    """
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
        )
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS p25,
           quantile_disc(l_extendedprice, 0.50) AS p50,
           quantile_disc(l_extendedprice, 0.75) AS p75,
           quantile_disc(l_extendedprice, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Trino suite ``testApproxPercentile``) — GK sketch,
    bounded memory at any scale.

    Oracle-checkable because the accuracy knob (1e6) exceeds the group sizes
    at oracle/bench SF, making the Greenwald-Khanna sketch exact: it returns
    the discrete dataset value at each rank — the same definition as
    DuckDB's ``quantile_disc`` — independent of partition merge order. At
    cluster scale the same query degrades gracefully to ±1e-6-rank error
    with ~constant sketch memory; only the accuracy/memory trade moves.

    One SCALAR column per quantile (not one ARRAY column): the driver's
    pandas canonicalizer can't hash list cells (r1 harness crash), and the
    sketch is built once per group either way — Catalyst collapses the four
    ``percentile_approx`` calls over the same column into one aggregate
    buffer per distinct (column, accuracy) pair.
    """
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.percentile_approx("l_extendedprice", q, 1000000).alias(name)
                for name, q in qs.items()
            ]
        )
    )


@register(
    "agg_stddev_variance",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS s2
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment aggregates via exact decimal power sums (hash-stable), from which
    variance/stddev are a driver-side epsilon: var = (s2 - s1²/n)/(n-1).

    Spark's native ``stddev``/``variance`` use Welford-style merging whose
    float rounding is partition-order-dependent — fine for analytics, wrong
    for an exact-hash oracle, so the checked query exposes the sums.
    """
    q = F.col("l_quantity").cast("decimal(9,2)")
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(q).cast("double").alias("s1"),
            F.sum(q * q).cast("double").alias("s2"),
        )
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (Trino suite ``testRollupOverUnion``): subtotals per prefix."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n"))
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, {sql_dsum('o_totalprice', 'sum_price')}, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice", "sum_price"), F.count("*").alias("n"))
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Expand-based plan as rollup)."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, {sql_dsum('l_extendedprice', 'sum_price')}
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'O')},
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'F')}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-status quantity columns (oracle = CASE-WHEN equivalent)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(9,2)")).cast("double"))
    )


@register(
    "agg_conditional_sum",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           {sql_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END", 'urgent_value')}
    FROM orders GROUP BY o_custkey
    """,
)
def agg_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (COUNT FILTER / SUM(CASE...))."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).cast(
                "decimal(9,2)"
            )
        )
        .cast("double")
        .alias("urgent_value"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / array_agg — sorted so the value is order-independent."""
    return (
        table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )


@register(
    "agg_corr_covar_closed_form",
    oracle="""
    SELECT l_returnflag, n,
           ROUND((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6) AS corr_qty_price,
           ROUND((n*sxy - sx*sy) / (n*n), 4) AS covar_pop_qty_price
    FROM (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    """,
)
def agg_corr_covar_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORR / COVAR_POP via the closed form over exact decimal sums.

    Built-in ``corr`` streams Welford-style co-moments whose float value
    depends on partition merge order — unusable under a value-hash oracle.
    The closed form ``(n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))``
    over exact DECIMAL sums gives bit-identical doubles in any engine and any
    partitioning: the only float ops are the final few, on identical inputs.
    Same single-shuffle partial+final plan as any hash aggregate.
    """
    x = F.col("l_quantity").cast("decimal(9,2)")
    y = F.col("l_extendedprice").cast("decimal(9,2)")
    base = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    n, sx, sy, sxx, syy, sxy = [F.col(c) for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]]
    return base.select(
        "l_returnflag",
        "n",
        F.round((n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 6).alias("corr_qty_price"),
        F.round((n * sxy - sx * sy) / (n * n), 4).alias("covar_pop_qty_price"),
    )


@register(
    "agg_histogram_width_bucket",
    oracle="""
    SELECT CASE WHEN value < 0 THEN 0 WHEN value >= 500 THEN 11
                ELSE CAST(FLOOR(value / 50) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: ``width_bucket`` + count per bucket (Trino's
    ``width_bucket``/``histogram`` family). The oracle spells out the same
    arithmetic (bucket width 500/10 = 50 is exact in binary, so
    ``floor(value/50)`` is the identical IEEE operation in both engines).
    One map-side-combined shuffle of ≤12 groups — constant-size at any scale.
    """
    return (
        table(spark, sf_dir, "events")
        .select(F.width_bucket("value", F.lit(0.0), F.lit(500.0), F.lit(10)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "agg_bool_bitwise",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_big,
           bool_or(o_totalprice > 400000) AS any_huge,
           bit_and(o_custkey) AS anded,
           bit_or(o_custkey) AS ored,
           bit_xor(o_custkey) AS xored
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bool_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOL_AND/BOOL_OR (Trino ``every``/``any_value`` family) and bitwise
    AND/OR/XOR aggregates — all order-independent, so no decimal treatment."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_big"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
            F.bit_and("o_custkey").alias("anded"),
            F.bit_or("o_custkey").alias("ored"),
            F.bit_xor("o_custkey").alias("xored"),
        )
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING_ID bitmask distinguishing subtotal levels in a ROLLUP —
    Spark's ``grouping_id()`` and DuckDB/Postgres ``GROUPING(cols...)`` use
    the same bit order (leftmost column = most-significant bit)."""
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("n"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
    )


@register(
    "agg_approx_count_distinct_bounded",
    oracle="SELECT TRUE AS within_bounds",
)
def agg_approx_count_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ estimate checked against its own accuracy contract: the sketch
    values themselves are algorithm-specific (rows-only twin
    ``agg_approx_count_distinct``), but |estimate − exact| / exact must stay
    within ~3× the configured rsd — that bound IS oracle-checkable.

    r14: estimate and exact run as separate aggregations joined by a 1-row
    broadcast crossJoin — mixed in one agg, the COUNT(DISTINCT) rewrite
    dragged the 1639-word HLL partial through the Expand per distinct key
    (see ``agg_approx_count_distinct``). Values unchanged."""
    li = table(spark, sf_dir, "lineitem")
    est = li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx")
    ).crossJoin(F.broadcast(li.agg(F.countDistinct("l_partkey").alias("exact"))))
    return est.select(
        (
            F.abs(F.col("approx") - F.col("exact")) / F.col("exact") < 0.03
        ).alias("within_bounds")
    )


@register(
    "agg_most_frequent",
    oracle="""
    SELECT o_orderstatus, top_priority, n FROM (
      SELECT o_orderstatus, o_orderpriority AS top_priority,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY COUNT(*) DESC, o_orderpriority
             ) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def agg_most_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode / most-frequent value per group (Trino ``approx_most_frequent``
    family, computed exactly): built-in ``mode()`` is tie-nondeterministic in
    both engines, so the plan is the deterministic decomposition — count per
    (group, value), then top-1 by (count DESC, value ASC). Two shuffles
    total; the second operates on the already-aggregated (group, value)
    pairs, which are tiny relative to the input at any scale."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("top_priority"),
            "n",
        )
    )


@register(
    "agg_max_by_min_by",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderpriority, o_orderkey) AS latest_priority,
           arg_min(o_orderstatus, o_orderkey) AS first_status,
           arg_max(o_orderkey,
                   lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 14, '0')
                   || lpad(CAST(o_orderkey AS VARCHAR), 14, '0')) AS priciest_order
    FROM orders GROUP BY o_custkey
    """,
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino ``max_by``/``min_by`` (DuckDB ``arg_max``/``arg_min``): the
    value of one column at another column's extreme. Ordering columns are
    unique per group (orderkey) or made unique with a fixed-width
    (price-cents || orderkey) string composite — lexicographic order equals
    numeric order, so ties on price break on orderkey identically in both
    engines at any scale factor."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderpriority", "o_orderkey").alias("latest_priority"),
        F.min_by("o_orderstatus", "o_orderkey").alias("first_status"),
        F.max_by(
            "o_orderkey",
            F.concat(
                F.lpad(F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 14, "0"),
                F.lpad(F.col("o_orderkey").cast("string"), 14, "0"),
            ),
        ).alias("priciest_order"),
    )
