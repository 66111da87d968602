"""Array higher-order functions, positional UNNEST, and quantified
subqueries — the remaining Trino-engine SQL surface over arrays.

Trino ships array lambdas (``transform``, ``filter``, ``reduce``,
``zip_with``) and ``UNNEST ... WITH ORDINALITY``; the connector exposes them
over Paimon tables untouched (engine-side, SURVEY §2.B "scalar functions" /
"nested access" rows). Spark's equivalents are ``F.transform`` /
``F.filter`` / ``F.aggregate`` / ``F.zip_with`` and ``F.posexplode``.

Performance note (measured, see README): Spark's array-lambda HOFs run
interpreted per element — fine for short arrays in a projection, but for hot
100 TB paths prefer explode + groupBy (whole-stage codegen) as the minhash
implementation does (``dedup.py::minhash_signatures``). These queries keep
the HOF form deliberately: they cover the *semantics* surface, and the
arrays involved (words of a part name/type) are tiny, so the per-row
interpretation cost is bounded by data width, not data volume — the shape
survives scale-up because the lambda cost is O(array_len) per row with no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import register
from incubator_paimon_trino_spark.sources import table


@register(
    "hof_transform_filter",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '), x -> upper(x)), ',') AS upper_words,
           COALESCE(array_to_string(list_filter(string_split(p_name, ' '), x -> length(x) > 5), ','), '') AS long_words
    FROM part
    """,
)
# COALESCE: DuckDB's array_to_string yields NULL for an empty filtered list
# where Spark's array_join yields '' — align on ''.
def hof_transform_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino ``transform``/``filter`` array lambdas == Spark ``F.transform``/``F.filter``."""
    words = F.split("p_name", " ")
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.array_join(F.transform(words, lambda x: F.upper(x)), ",").alias("upper_words"),
        F.array_join(F.filter(words, lambda x: F.length(x) > 5), ",").alias("long_words"),
    )


@register(
    "hof_reduce_aggregate",
    oracle="""
    SELECT p_partkey,
           CAST(list_sum(list_transform(string_split(p_name, ' '), x -> length(x))) AS BIGINT) AS total_chars
    FROM part
    """,
)
def hof_reduce_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino ``reduce(array, 0, (s,x) -> s+x, s -> s)`` == Spark ``F.aggregate``.

    Integer accumulator — exact arithmetic, so the fold order (left-to-right
    in both engines) can't produce float drift.
    """
    words = F.split("p_name", " ")
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.aggregate(
            F.transform(words, lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@register(
    "hof_zip_with_weighted",
    oracle="""
    SELECT p_partkey, CAST(SUM(length(words[i]) * i) AS BIGINT) AS weighted
    FROM (SELECT p_partkey, string_split(p_type, ' ') AS words FROM part),
         UNNEST(range(1, len(words) + 1)) AS t(i)
    GROUP BY p_partkey
    """,
)
def hof_zip_with_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``zip_with`` (element-wise combine) + ``aggregate`` fold: position-
    weighted word-length sum. The same shape computes embedding dot products
    (``similarity.py`` uses the explode equivalent for the hot path)."""
    words = F.split("p_type", " ")
    lens = F.transform(words, lambda x: F.length(x).cast("bigint"))
    idx = F.sequence(F.lit(1).cast("bigint"), F.size(words).cast("bigint"))
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.aggregate(
            F.zip_with(lens, idx, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("weighted"),
    )


@register(
    "nested_posexplode_ordinality",
    oracle="""
    SELECT p_partkey, words[i] AS word, CAST(i AS BIGINT) AS pos
    FROM (SELECT p_partkey, string_split(p_type, ' ') AS words FROM part),
         UNNEST(range(1, len(words) + 1)) AS t(i)
    """,
)
def nested_posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UNNEST ... WITH ORDINALITY`` == ``posexplode`` (1-based to match SQL)."""
    return (
        table(spark, sf_dir, "part")
        .select("p_partkey", F.posexplode(F.split("p_type", " ")).alias("pos0", "word"))
        .select("p_partkey", "word", (F.col("pos0") + 1).cast("bigint").alias("pos"))
    )


@register(
    "subquery_all_quantified",
    oracle="""
    SELECT p_partkey, p_retailprice FROM part
    WHERE p_retailprice > ALL (SELECT p_retailprice FROM part WHERE p_brand = 'Brand#13')
    """,
)
def subquery_all_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``> ALL (subquery)`` decorrelated to a broadcast of the subquery MAX.

    Spark SQL has no quantified comparisons; the standard rewrite
    (``> ALL S`` ⇔ ``> max(S)`` for non-empty S without NULLs — Brand#13 is
    non-empty and p_retailprice is non-null) turns it into a single-row
    broadcast join: the fact scan streams once, no shuffle.
    """
    part = table(spark, sf_dir, "part")
    mx = part.filter(F.col("p_brand") == "Brand#13").agg(F.max("p_retailprice").alias("mx"))
    return (
        part.crossJoin(F.broadcast(mx))
        .filter(F.col("p_retailprice") > F.col("mx"))
        .select("p_partkey", "p_retailprice")
    )
