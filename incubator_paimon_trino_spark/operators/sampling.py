"""Deterministic sampling for training-data pipelines (beyond reference
parity — north star in BASELINE.json).

Random sampling (``df.sample``, ``TABLESAMPLE``) is nondeterministic across
engines and re-runs; a 100 TB pipeline needs REPRODUCIBLE sampling so a
rerun (or a different engine) selects the same rows. Both queries key the
decision on an md5-derived bucket of the row's stable id — pure JVM-side
expressions (whole-stage codegen, no shuffle beyond the final agg), and the
exact same arithmetic is expressible in DuckDB for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import register
from incubator_paimon_trino_spark.sources import table


def _bucket(col, mod: int):
    """md5-derived uniform bucket in [0, mod) — delegates to the ONE shared
    md5-prefix-to-60-bit-integer construction (``dedup._md5_int``) so the
    engine-portability-critical idiom has a single Spark-side definition
    (the DuckDB twin is ``_bucket_sql`` below)."""
    from incubator_paimon_trino_spark.operators.dedup import _md5_int

    return _md5_int(col.cast("string")) % mod


def _bucket_sql(expr: str, mod: int) -> str:
    return (
        f"CAST(CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 15)) "
        f"AS UBIGINT) % {mod} AS BIGINT)"
    )


@register(
    "sample_deterministic_hash",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_bucket_sql('doc_id', 10)} = 0
    """,
)
def sample_deterministic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample, reproducible: keep rows whose md5-bucket(doc_id)
    mod 10 is 0. Fully pushdown-friendly (the predicate is a scalar
    expression over one column) and independent of partitioning, task order,
    or engine."""
    d = table(spark, sf_dir, "documents")
    return d.filter(_bucket(F.col("doc_id"), 10) == 0).select("doc_id", "lang", "source")


@register(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS sampled
    FROM documents
    WHERE {_bucket_sql('doc_id', 100)} <
          (CASE WHEN lang = 'en' THEN 50 ELSE 10 END)
    GROUP BY lang
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (upsample English to 50%,
    everything else 10%) — the standard data-mixing move when balancing a
    training corpus. One scan, no shuffle until the audit count; the
    stratum rate is a CASE expression, so adding strata is config, not
    code."""
    d = table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 50).otherwise(10)
    return (
        d.filter(_bucket(F.col("doc_id"), 100) < rate)
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("sampled"))
    )


@register(
    "sample_reservoir_per_group",
    oracle=f"""
    SELECT lang, doc_id, source FROM (
      SELECT lang, doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_bucket_sql('doc_id', 1000000007)}, doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sample (reservoir-sampling semantics,
    reproducible): keep the 5 docs with the smallest md5-derived hash per
    language. Equivalent in distribution to a uniform without-replacement
    sample, but stable across reruns, partitionings, and engines — the
    property an audit trail needs. One shuffle (the per-stratum top-k);
    Spark turns the rn<=k filter into a partial top-k before the exchange."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(_bucket(F.col("doc_id"), 1000000007), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id", "source")
    )


@register(
    "sample_train_val_test",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_bucket_sql('doc_id', 100)} < 80 THEN 'train'
                WHEN {_bucket_sql('doc_id', 100)} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: the split is a pure
    function of md5-bucket(doc_id), so it is reproducible across runs,
    engines, partitionings, and INCREMENTAL ingests — a re-run after
    appending data never moves an existing document between splits (the
    property random splits lack). Zero shuffles: one scalar expression per
    row, pushdown-friendly."""
    d = table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"), 100)
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return d.select("doc_id", "lang", split.alias("split"))


@register(
    "mix_domain_weights",
    oracle=f"""
    WITH by_lang AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
         tot AS (SELECT SUM(cnt) AS total FROM by_lang),
         rates AS (
           SELECT lang,
                  LEAST(CAST(1 AS DOUBLE),
                        (CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                                   WHEN 'de' THEN CAST(0.2 AS DOUBLE)
                                   WHEN 'fr' THEN CAST(0.15 AS DOUBLE)
                                   WHEN 'es' THEN CAST(0.1 AS DOUBLE)
                                   ELSE CAST(0.05 AS DOUBLE) END)
                        * CAST(total AS DOUBLE) * CAST(0.5 AS DOUBLE)
                        / CAST(cnt AS DOUBLE)) AS rate
           FROM by_lang, tot
         )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_bucket_sql('d.doc_id', 1000000)} < r.rate * CAST(1000000 AS DOUBLE)
    """,
)
def mix_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix resampling: downsample each language stratum toward a
    target mixture (en .5 / de .2 / fr .15 / es .1 / zh .05) at half the
    corpus budget — THE knob a pretraining pipeline turns to rebalance
    domains. Per-stratum acceptance rate = min(1, weight x budget / count),
    computed IN the plan (tiny agg -> broadcast back; no driver collect),
    and each row's accept decision is a deterministic md5 fraction — rerun-
    and engine-stable, unlike ``TABLESAMPLE``. At 100 TB: the rates table is
    K rows (one per domain) and the corpus never shuffles — two column-
    pruned scans (the counting pass reads ONLY the domain column; the probe
    pass reads the output columns), one broadcast-join, a scalar filter.
    The count pass is inherent: acceptance rates need the full per-domain
    counts before any row can be decided, and a window over the domain key
    would shuffle the whole corpus instead."""
    d = table(spark, sf_dir, "documents")
    by_lang = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    tot = by_lang.agg(F.sum("cnt").alias("total"))
    w = (
        F.when(F.col("lang") == "en", F.lit(0.5))
        .when(F.col("lang") == "de", F.lit(0.2))
        .when(F.col("lang") == "fr", F.lit(0.15))
        .when(F.col("lang") == "es", F.lit(0.1))
        .otherwise(F.lit(0.05))
    )
    rates = (
        by_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.least(
                F.lit(1.0),
                w * F.col("total").cast("double") * F.lit(0.5) / F.col("cnt").cast("double"),
            ).alias("rate"),
        )
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(_bucket(F.col("doc_id"), 1000000) < F.col("rate") * F.lit(1000000.0))
        .select("doc_id", "lang", "source")
    )
