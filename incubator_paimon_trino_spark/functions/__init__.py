from incubator_paimon_trino_spark.functions.predicates import (
    ColumnDomain,
    Range,
    apply_tuple_domain,
    tuple_domain_to_column,
)
from incubator_paimon_trino_spark.functions.types import paimon_to_spark, spark_to_paimon

__all__ = [
    "ColumnDomain",
    "Range",
    "apply_tuple_domain",
    "tuple_domain_to_column",
    "paimon_to_spark",
    "spark_to_paimon",
]
