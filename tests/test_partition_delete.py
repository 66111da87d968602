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


def test_pk_table_partition_drop_fast_path(spark, tmp_path):
    """Partition keys ⊆ primary key: a partition-scoped DELETE drops whole
    partitions metadata-only — no -D rows are written, and it works even on
    engines that reject retraction (first-row)."""
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("y", "int"), ("v", "string")],
        primary_key=["k", "y"], partitioned_by=["y"],
        options={"merge_engine": "first-row"},
    )
    ddl = "k int, y int, v string"
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, 2020, "a"), (2, 2021, "b")], ddl))
    cat.delete_where("d", "t", "y = 2020")
    assert [(r.k, r.y) for r in cat.read_table("d.t").collect()] == [(2, 2021)]
    # metadata-only: the raw changelog view holds NO -D rows
    raw = cat.read_table("d.t", with_system_columns=True)
    assert raw.filter(raw._row_kind == "D").count() == 0
    tdir = cat._table_dir("d", "t")
    assert cat._latest_snapshot(tdir).commit_kind == "OVERWRITE"
    # row-level DELETE still refuses on first-row
    with pytest.raises(ValueError, match="first-row"):
        cat.delete_where("d", "t", "k = 2")


def test_pk_table_partition_not_in_key_uses_row_path(spark, tmp_path):
    """Partition key NOT in the primary key: a key can move partitions, so
    the fast path must not apply — the delete goes through -D rows."""
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("y", "int"), ("v", "string")],
        primary_key=["k"], partitioned_by=["y"],
    )
    ddl = "k int, y int, v string"
    cat.insert_into("d", "t", spark.createDataFrame([(1, 2020, "a"), (2, 2021, "b")], ddl))
    cat.delete_where("d", "t", "y = 2020")
    assert [(r.k,) for r in cat.read_table("d.t").select("k").collect()] == [(2,)]
    raw = cat.read_table("d.t", with_system_columns=True)
    assert raw.filter(raw._row_kind == "D").count() == 1  # -D path, not metadata
