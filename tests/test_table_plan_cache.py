"""Flat-table read-plan cache (r13 optimization round): `sources.table()`
memoizes the assembled DataFrame per (session, file identity). Pure PLAN
reuse — every action still scans parquet; pins: reuse, file-change
invalidation, and that a reused plan still computes fresh results.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMOKE


def test_table_plan_reused_and_invalidated_on_file_change(spark, tmp_path):
    from incubator_paimon_trino_spark.sources import table

    a = table(spark, SF_SMOKE, "lineitem")
    b = table(spark, SF_SMOKE, "lineitem")
    assert a is b, "second read of an unchanged file must reuse the plan"

    # a changed file (different mtime/size) must MISS — copy to a tmp sf_dir,
    # read, then overwrite with different content and read again
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(Path(SF_SMOKE) / "region.parquet", sf / "region.parquet")
    r1 = table(spark, str(sf), "region")
    n1 = r1.count()
    shutil.copy(Path(SF_SMOKE) / "nation.parquet", sf / "region.parquet")
    r2 = table(spark, str(sf), "region")
    assert r2 is not r1, "rewritten file must invalidate the cached plan"
    assert r2.count() != n1  # nation has 25 rows, region 5


def test_cached_plan_recomputes_from_parquet(spark, tmp_path):
    """No result caching: a reused plan re-reads the file on every action."""
    from incubator_paimon_trino_spark.sources import table

    sf = tmp_path / "sf"
    sf.mkdir()
    dst = sf / "region.parquet"
    shutil.copy(Path(SF_SMOKE) / "region.parquet", dst)
    df = table(spark, str(sf), "region")
    assert df.count() == 5
    assert table(spark, str(sf), "region") is df
    dst.unlink()  # same plan object, source gone -> action must fail
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    with pytest.raises((Py4JJavaError, AnalysisException, Exception)):
        df.count()


def test_events_encoding_normalization_survives_cache(spark):
    from pyspark.sql import types as T

    from incubator_paimon_trino_spark.sources import table

    e1 = table(spark, SF_SMOKE, "events")
    e2 = table(spark, SF_SMOKE, "events")
    assert e1 is e2
    assert isinstance(e1.schema["ts"].dataType, T.TimestampType)
