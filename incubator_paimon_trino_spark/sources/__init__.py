from incubator_paimon_trino_spark.sources.registry import TABLE_NAMES, fan_out, table

__all__ = ["table", "fan_out", "TABLE_NAMES"]
