"""``fields.<col>.ignore-retract`` — per-field retract-ignore switch (Paimon
CoreOption): the column's -D rows contribute nothing and never raise,
whatever the function's native retraction class."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog
from incubator_paimon_trino_spark.operators.merge_on_read import merge_on_read


def test_strict_function_stops_raising_and_ignores_deletes(spark):
    rows = [
        (1, 5, [1, 2], 1, "I"),
        (1, 3, [2, 9], 2, "D"),  # ignored entirely: no raise, no removal, no sum effect
        (1, 2, [3], 3, "I"),
    ]
    df = spark.createDataFrame(rows, "k int, m int, vs array<int>, _seq bigint, _row_kind string")
    out = merge_on_read(
        df, ["k"], "aggregation",
        field_aggregates={"m": "min", "vs": "collect"},
        ignore_retract={"m", "vs"},
    )
    r = out.collect()[0]
    assert r.m == 2  # min over inserts only; the delete's 3 did not count
    assert r.vs == [1, 2, 3]  # no removal — delete contributed nothing
    # without the switch the same history raises (min is strict)
    strict = merge_on_read(df, ["k"], "aggregation", field_aggregates={"m": "min"})
    with pytest.raises(Exception, match="retraction"):
        strict.collect()


def test_retractable_function_ignores_instead_of_subtracting(spark):
    rows = [(1, 10, 1, "I"), (1, 4, 2, "D"), (2, 7, 1, "D")]
    df = spark.createDataFrame(rows, "k int, v int, _seq bigint, _row_kind string")
    out = merge_on_read(
        df, ["k"], "aggregation", field_aggregates={"v": "sum"}, ignore_retract={"v"}
    )
    got = {r.k: r.v for r in out.collect()}
    assert got[1] == 10  # delete ignored, NOT subtracted
    assert 2 not in got  # all-delete keys still absent


def test_catalog_option_and_validation(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("m", "int")], primary_key=["k"],
        options={"merge_engine": "aggregation",
                 "fields.m.aggregate-function": "max",
                 "fields.m.ignore-retract": "true"},
    )
    cat.insert_into("d", "t", spark.createDataFrame([(1, 5)], "k int, m int"))
    cat.insert_into("d", "t", spark.createDataFrame([(1, 9)], "k int, m int"), row_kind="D")
    cat.insert_into("d", "t", spark.createDataFrame([(1, 7)], "k int, m int"))
    assert cat.read_table("d.t").collect()[0].m == 7

    with pytest.raises(ValueError, match="aggregation"):
        cat.create_table("d", "b1", [("k", "int"), ("m", "int")], primary_key=["k"],
                         options={"fields.m.ignore-retract": "true"})
    with pytest.raises(ValueError, match="unknown column"):
        cat.create_table("d", "b2", [("k", "int"), ("m", "int")], primary_key=["k"],
                         options={"merge_engine": "aggregation",
                                  "fields.x.ignore-retract": "true"})
    with pytest.raises(ValueError, match="true/false"):
        cat.create_table("d", "b3", [("k", "int"), ("m", "int")], primary_key=["k"],
                         options={"merge_engine": "aggregation",
                                  "fields.m.ignore-retract": "yes"})
