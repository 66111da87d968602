"""Merge-on-read for primary-key tables — the one reference capability with no
Spark built-in (SURVEY §2.A9, §4 conclusion).

The reference delegates to Paimon's LSM reader: per PK, merge levels by
sequence number, apply RowKind (+I/-D), configured by ``merge_engine``
(enum surfaced at ``common/TrinoTableOptionUtils.java:98,113-118``; DELETE
semantics fixed by ``common-test/TestTrinoITCase.java:89-94 → :270-271``).

Spark formulation: the changelog is a DataFrame with hidden ``(_seq,
_row_kind)`` columns; merging is a single hash-shuffle by PK:

- ``deduplicate``   — latest row per PK wins (max ``_seq``), deletes drop.
- ``first-row``     — earliest insert per PK wins, later rows ignored.
- ``partial-update``— non-null field values overwrite in sequence order.
- ``aggregation``   — numeric fields sum across rows per PK.

All four are one ``groupBy(pk)`` with ``max_by``/``min_by``/aggregate
expressions — partial aggregation applies map-side, so at 100 TB the shuffle
carries one pre-merged row per PK per map partition, not the raw changelog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_paimon_trino_spark.catalog.metadata import KIND_COL, SEQ_COL

MERGE_ENGINES = ("deduplicate", "first-row", "partial-update", "aggregation")


def merge_on_read(df: DataFrame, primary_key: list[str], merge_engine: str = "deduplicate") -> DataFrame:
    """Collapse a changelog DataFrame to its merged table view.

    ``df`` must carry ``_seq`` (bigint, commit order) and ``_row_kind``
    ('I'|'D'). Ties on ``_seq`` (same commit) resolve deletes last — matching
    the reference fixture where +I and -D of the same key in one commit
    leaves the key deleted (FIXTURES.md F1).
    """
    if merge_engine not in MERGE_ENGINES:
        raise ValueError(f"unknown merge_engine {merge_engine!r}; have {MERGE_ENGINES}")
    value_cols = [c for c in df.columns if c not in (*primary_key, SEQ_COL, KIND_COL)]
    # order key: sequence, then D after I within the same sequence
    order = (F.col(SEQ_COL) * 2 + F.when(F.col(KIND_COL) == "D", 1).otherwise(0)).alias("_ord")
    df = df.withColumn("_ord", order)

    if merge_engine == "deduplicate":
        picked = df.groupBy(*primary_key).agg(
            F.max_by(F.struct(KIND_COL, *value_cols), F.col("_ord")).alias("_row")
        )
        return (
            picked.filter(F.col(f"_row.{KIND_COL}") != "D")
            .select(*primary_key, *[F.col(f"_row.{c}").alias(c) for c in value_cols])
        )

    if merge_engine == "first-row":
        inserts = df.filter(F.col(KIND_COL) != "D")
        picked = inserts.groupBy(*primary_key).agg(
            F.min_by(F.struct(*value_cols), F.col("_ord")).alias("_row")
        )
        return picked.select(*primary_key, *[F.col(f"_row.{c}").alias(c) for c in value_cols])

    if merge_engine == "partial-update":
        # last non-null per field, in sequence order; deletes reset the row
        # (simplified: deletes drop the key if they are the latest row)
        last_kind = F.max_by(F.col(KIND_COL), F.col("_ord"))
        aggs = [
            F.max_by(F.struct(F.col("_ord"), F.col(c)), F.when(F.col(c).isNotNull(), F.col("_ord")))[
                c
            ].alias(c)
            for c in value_cols
        ]
        merged = df.groupBy(*primary_key).agg(last_kind.alias("_k"), *aggs)
        return merged.filter(F.col("_k") != "D").select(*primary_key, *value_cols)

    # aggregation: sum numeric fields, last non-null for the rest
    num_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in value_cols:
        if isinstance(by_name[c], num_types):
            aggs.append(F.sum(c).alias(c))
        else:
            aggs.append(F.max_by(F.col(c), F.col("_ord")).alias(c))
    inserts = df.filter(F.col(KIND_COL) != "D")
    return inserts.groupBy(*primary_key).agg(*aggs)
