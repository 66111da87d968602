"""incubator_paimon_trino_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the ``shidayang/incubator-paimon-trino``
Trino connector for Apache Paimon.

The reference is a Trino connector plugin: catalog/DDL, pushdowns, merge-on-read
scans, time travel, system tables (see SURVEY.md). This package re-expresses that
surface Spark-first:

- ``catalog``   — warehouse catalog with versioned lake tables (DDL, snapshots,
                  time travel, schema evolution) — reference §2.A11-A19.
- ``sources``   — table readers/writers returning DataFrames; merge-on-read for
                  primary-key tables — reference ``TrinoPageSourceProvider``.
- ``operators`` — the query library: every operator family the Trino engine
                  exposes over Paimon tables (SURVEY §2.B), plus large-scale
                  training-data-pipeline operators (dedup, similarity search,
                  text analysis, multimodal).
- ``functions`` — predicate conversion (mirror of ``TrinoFilterConverter``) and
                  type mapping (mirror of ``TrinoTypeUtils``).
- ``plans``     — explain-plan inspection helpers (pushdown / broadcast asserts).
- ``streaming`` — Structured Streaming changelog reads (reference exposes
                  streaming table options only; we implement actual reads).

Everything here is plain PySpark DataFrame/SQL code — no custom Catalyst rules
are needed (SURVEY §4): Catalyst already provides predicate/projection/limit
pushdown, partition pruning, and join planning that the reference implements by
hand.
"""

from incubator_paimon_trino_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
