"""Append-table DELETE by partition predicate — metadata-only drop-partition
overwrite (the one DELETE form Paimon append tables support; PK tables keep
the -D row path)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog


def _cat(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("v", "int"), ("y", "int"), ("m", "int")],
        partitioned_by=["y", "m"],
    )
    rows = [(i, i * 10, 2020 + i % 2, 1 + i % 3) for i in range(12)]
    cat.insert_into("d", "t", spark.createDataFrame(rows, "k int, v int, y int, m int"))
    return cat, rows


def test_engine_semantics_multi_column_predicate(spark, tmp_path):
    cat, rows = _cat(spark, tmp_path)
    stats = cat.drop_partitions("d", "t", "y = 2020 AND m IN (1, 2)")
    assert stats["deleted_partitions"] == 2
    survivors = {(r.k) for r in cat.read_table("d.t").collect()}
    expect = {k for (k, v, y, m) in rows if not (y == 2020 and m in (1, 2))}
    assert survivors == expect
    # metadata-only: the old snapshot still serves everything
    assert cat.read_table("d.t", version_as_of=1).count() == 12


def test_non_partition_column_raises(spark, tmp_path):
    cat, _ = _cat(spark, tmp_path)
    with pytest.raises(ValueError, match="partition columns"):
        cat.drop_partitions("d", "t", "v > 50")
    with pytest.raises(ValueError, match="partition columns"):
        cat.delete_where("d", "t", "k = 3")


def test_delete_where_routes_append_tables(spark, tmp_path):
    cat, rows = _cat(spark, tmp_path)
    ver = cat.delete_where("d", "t", "y = 2021")
    assert ver == 2
    assert all(r.y == 2020 for r in cat.read_table("d.t").collect())
    # no-op delete commits nothing, returns the current tip
    assert cat.delete_where("d", "t", "y = 1999") == 2


def test_unpartitioned_append_table_still_refuses(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table("d", "flat", [("k", "int")])
    cat.insert_into("d", "flat", spark.createDataFrame([(1,)], "k int"))
    with pytest.raises(ValueError, match="primary key"):
        cat.delete_where("d", "flat", "k = 1")
