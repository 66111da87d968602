"""``ignore-delete`` CoreOption — delete records discarded at write time
(Paimon's recipe for CDC feeds into retraction-rejecting merge engines;
CoreOptions are DDL-surfaced in the reference via
``common/TrinoTableOptionUtils.java:51-135``)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog


def _cdc(spark):
    return spark.createDataFrame(
        [(1, 10, "I"), (2, 20, "D"), (1, 11, "D")],
        "k int, v int, _row_kind string",
    )


def test_deletes_never_stored(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table("d", "t", [("k", "int"), ("v", "int")], primary_key=["k"],
                     options={"ignore_delete": "true"})
    cat.insert_into("d", "t", _cdc(spark))
    assert [(r.k, r.v) for r in cat.read_table("d.t").collect()] == [(1, 10)]
    # never stored, not merge-filtered: the raw changelog view has no D rows
    raw = cat.read_table("d.t", with_system_columns=True)
    assert raw.filter(raw._row_kind == "D").count() == 0


def test_first_row_accepts_cdc_feed_with_option_raises_without(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table("d", "with_opt", [("k", "int"), ("v", "int")], primary_key=["k"],
                     options={"merge_engine": "first-row", "ignore_delete": "true"})
    cat.insert_into("d", "with_opt", _cdc(spark))
    assert [(r.k, r.v) for r in cat.read_table("d.with_opt").collect()] == [(1, 10)]

    cat.create_table("d", "without", [("k", "int"), ("v", "int")], primary_key=["k"],
                     options={"merge_engine": "first-row"})
    cat.insert_into("d", "without", _cdc(spark))
    with pytest.raises(Exception, match="retraction"):
        cat.read_table("d.without").collect()


def test_delete_where_refuses_loudly(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table("d", "t", [("k", "int"), ("v", "int")], primary_key=["k"],
                     options={"ignore_delete": "true"})
    cat.insert_into("d", "t", spark.createDataFrame([(1, 10)], "k int, v int"))
    with pytest.raises(ValueError, match="ignore-delete"):
        cat.delete_where("d", "t", "k = 1")


def test_validation(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    with pytest.raises(ValueError, match="true/false"):
        cat.create_table("d", "a", [("k", "int")], primary_key=["k"],
                         options={"ignore_delete": "maybe"})
    with pytest.raises(ValueError, match="primary-key"):
        cat.create_table("d", "b", [("k", "int")],
                         options={"ignore_delete": "true"})
