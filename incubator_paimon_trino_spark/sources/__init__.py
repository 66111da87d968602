from incubator_paimon_trino_spark.sources.registry import TABLE_NAMES, table

__all__ = ["table", "TABLE_NAMES"]
