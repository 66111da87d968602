from incubator_paimon_trino_spark.catalog.warehouse import WarehouseCatalog

__all__ = ["WarehouseCatalog"]
