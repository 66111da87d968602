"""UDF surface pins (r13 — VERDICT r12 item 5).

``udf_grouped_map_normalize`` now runs partition-batched (mapInPandas +
open-key-span carry) instead of per-group applyInPandas; these tests pin

1. result identity with the built-in window twin (same oracle the driver
   hash-checks) including under tiny Arrow batches, where customer spans
   straddle chunk boundaries, and
2. the grouped-map (applyInPandas) API itself on a small frame — the API
   surface stays exercised even though no registry query pays its
   per-group price any more.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from conftest import SF_SMOKE


def test_partition_batched_normalize_matches_builtin_twin(spark):
    from incubator_paimon_trino_spark.operators.udfs import (
        udf_grouped_map_normalize,
        udf_grouped_map_normalize_builtin_twin,
    )

    want = sorted(
        map(tuple, udf_grouped_map_normalize_builtin_twin(spark, SF_SMOKE).collect())
    )
    got = sorted(map(tuple, udf_grouped_map_normalize(spark, SF_SMOKE).collect()))
    assert got == want and got
    # chunk-boundary stress: spans straddle Arrow batches
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
        tiny = sorted(map(tuple, udf_grouped_map_normalize(spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert tiny == want


def test_grouped_map_api_surface(spark):
    """applyInPandas itself (the API the reference's engine-side UDF row
    maps to): one pandas frame per group, custom per-group logic."""
    import pandas as pd

    df = spark.createDataFrame(
        [(1, 10.0), (1, 30.0), (2, 5.0), (2, 7.0), (2, 9.0)], "g int, x double"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": pdf["g"], "dx": pdf["x"] - pdf["x"].mean()})

    out = sorted(
        (r.g, r.dx)
        for r in df.groupBy("g").applyInPandas(center, "g int, dx double").collect()
    )
    assert out == [(1, -10.0), (1, 10.0), (2, -2.0), (2, 0.0), (2, 2.0)]
