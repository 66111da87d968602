"""Pins for ``sources.fan_out`` (r13 optimization round): the gated
scan-spreading exchange for locally-unsplittable single-row-group files
(guide §2.5 "input skew: one huge unsplittable file").

Three contracts:
1. result identity — fan_out changes partitioning, never rows;
2. pushdown survives — filters/pruning still reach the scan BELOW the
   added exchange (Catalyst pushes predicates through
   RepartitionByExpression);
3. the gate — when the file can split to ``defaultParallelism`` on its
   own (enough row groups AND size/maxPartitionBytes splits), fan_out
   returns the plain scan with NO exchange, so at cluster scale the
   repartition vanishes and the bench's lower-core runs stay comparable.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.plans import physical_plan, pushed_filters, read_schema_columns
from tests.conftest import SF_SMOKE


def test_fan_out_rows_identical(spark):
    from incubator_paimon_trino_spark.sources import fan_out, table

    base = table(spark, SF_SMOKE, "documents").collect()
    fanned = fan_out(spark, SF_SMOKE, "documents", "doc_id").collect()
    assert sorted(map(tuple, fanned)) == sorted(map(tuple, base))


def test_fan_out_pushdown_below_exchange(spark):
    """A filter composed ABOVE fan_out must still reach the parquet scan
    BELOW the fan-out exchange (Catalyst pushes predicates through
    RepartitionByExpression), and pruning must keep only the used columns
    plus the repartition keys."""
    from pyspark.sql import functions as F

    from incubator_paimon_trino_spark.sources import fan_out

    df = (
        fan_out(spark, SF_SMOKE, "lineitem", "l_orderkey", "l_linenumber")
        .filter(F.col("l_quantity") < 24)
        .select("l_orderkey", "l_quantity")
    )
    assert "Exchange hashpartitioning(xxhash64" in physical_plan(df)
    assert any("l_quantity" in f for f in pushed_filters(df))
    assert set(read_schema_columns(df)) == {"l_orderkey", "l_linenumber", "l_quantity"}


def test_fan_out_gate_noop_when_scan_splits(spark, tmp_path):
    """A file with >= defaultParallelism row groups and a maxPartitionBytes
    small enough to split it that far must NOT be repartitioned."""
    import pyarrow.parquet as pq

    from incubator_paimon_trino_spark.sources import fan_out, table

    sf = tmp_path / "sf"
    sf.mkdir()
    src = pq.read_table(str(Path(SF_SMOKE) / "documents.parquet"))
    # many tiny row groups: one per ~8 rows
    pq.write_table(src, str(sf / "documents.parquet"), row_group_size=8)
    groups = pq.ParquetFile(str(sf / "documents.parquet")).metadata.num_row_groups
    assert groups >= spark.sparkContext.defaultParallelism, "fixture too small"

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024b")
        fanned = fan_out(spark, str(sf), "documents", "doc_id")
        assert "Exchange" not in physical_plan(fanned)
        # and the gated branch still returns the same rows as table()
        assert fanned.count() == table(spark, str(sf), "documents").count()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_fan_out_fires_on_single_row_group_file(spark):
    """The driver tables are single-row-group files: the exchange must be
    present (hashpartitioning on xxhash64 of the key columns)."""
    from incubator_paimon_trino_spark.sources import fan_out

    plan = physical_plan(fan_out(spark, SF_SMOKE, "documents", "doc_id"))
    assert "Exchange hashpartitioning(xxhash64(doc_id" in plan
