"""Operator/query library.

Every module registers named queries into ``registry.QUERIES`` /
``registry.ORACLES`` (the DuckDB oracle SQL). ``__spark_entry__.py`` re-exports
them to the driver harness.
"""

from incubator_paimon_trino_spark.operators import registry  # noqa: F401


def load_all() -> None:
    """Import every operator module so its queries register."""
    from incubator_paimon_trino_spark.operators import (  # noqa: F401
        aggregates,
        clustering,
        dedup,
        events,
        joins,
        lake,
        match_recognize,
        multimodal,
        packing,
        patterns,
        hof,
        relational,
        sampling,
        setops,
        similarity,
        text,
        tpch,
        tpch2,
        udfs,
        windows,
    )
