"""Soundness conditions of the manifest-answered MIN/MAX/COUNT(col)
(``WarehouseCatalog.metadata_min_max`` / ``column_extremes``) — the
completion of the r6 metadata aggregation. Every condition that can make
footer stats inexact must return None (scan fallback), never a wrong value.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.catalog.warehouse import WarehouseCatalog
from incubator_paimon_trino_spark.functions.predicates import ColumnDomain


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _mk(cat, spark, options=None, pk=None):
    cat.create_database("d")
    cat.create_table(
        "d", "t",
        [("k", "bigint"), ("x", "double"), ("s", "string"), ("y", "int")],
        partitioned_by=["y"], primary_key=pk, options=options or {},
    )
    rows = [(i, None if i % 4 == 0 else i * 1.5, f"s{i}", 2000 + i % 3) for i in range(60)]
    cat.insert_into(
        "d", "t", spark.createDataFrame(rows, "k bigint, x double, s string, y int")
    )


def test_metadata_answers_match_scan(cat, spark):
    _mk(cat, spark)
    mm = cat.metadata_min_max("d.t", ["k", "x", "y"])
    assert mm == {
        "k": {"min": 0, "max": 59, "count": 60},
        "x": {"min": 1.5, "max": 88.5, "count": 45},
        "y": {"min": 2000, "max": 2002, "count": 60},
    }
    row = cat.column_extremes("d.t", ["k", "x"]).collect()[0]
    assert (row.min_k, row.max_k, row.count_k) == (0, 59, 60)
    assert (row.min_x, row.max_x, row.count_x) == (1.5, 88.5, 45)


def test_partition_predicate_prunes_and_answers(cat, spark):
    _mk(cat, spark)
    pred = [ColumnDomain("y", op="=", value=2001)]
    mm = cat.metadata_min_max("d.t", ["k", "y"], predicate=pred)
    truth = cat.read_table("d.t", predicate=pred).agg(
        F.min("k"), F.max("k"), F.count("k")
    ).collect()[0]
    assert (mm["k"]["min"], mm["k"]["max"], mm["k"]["count"]) == tuple(truth)
    assert mm["y"] == {"min": 2001, "max": 2001, "count": truth[2]}


def test_unsound_conditions_fall_back(cat, spark):
    _mk(cat, spark)
    # string column: footer stats may be writer-truncated — never answer
    assert cat.metadata_min_max("d.t", ["s"]) is None
    # non-partition predicate: surviving files are not exactly decided
    assert cat.metadata_min_max("d.t", ["k"], [ColumnDomain("k", op="<", value=10)]) is None
    # the facade still answers via the scan, correctly
    row = cat.column_extremes("d.t", ["s"]).collect()[0]
    assert (row.min_s, row.count_s) == ("s0", 60)


def test_pk_and_statless_formats_fall_back(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "p", [("k", "bigint"), ("v", "double")], primary_key=["k"])
    cat.insert_into("d", "p", spark.createDataFrame([(1, 2.0), (2, 3.0)], "k bigint, v double"))
    assert cat.metadata_min_max("d.p", ["v"]) is None  # merge changes live values
    cat.create_table(
        "d", "o", [("k", "bigint")], options={"file_format": "orc"}
    )
    cat.insert_into("d", "o", spark.createDataFrame([(5,), (7,)], "k bigint"))
    assert cat.metadata_min_max("d.o", ["k"]) is None  # ORC entries carry no stats
    assert cat.column_extremes("d.o", ["k"]).collect()[0].min_k == 5  # scan path


def test_all_null_column_and_empty_table(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "n", [("k", "bigint"), ("x", "double")])
    assert cat.metadata_min_max("d.n", ["x"]) == {"x": {"min": None, "max": None, "count": 0}}
    cat.insert_into(
        "d", "n",
        spark.createDataFrame([(1, None), (2, None)], "k bigint, x double"),
    )
    mm = cat.metadata_min_max("d.n", ["x"])
    assert mm == {"x": {"min": None, "max": None, "count": 0}}
    row = cat.column_extremes("d.n", ["x", "k"]).collect()[0]
    assert (row.min_x, row.max_x, row.count_x, row.min_k, row.count_k) == (
        None, None, 0, 1, 2,
    )


def test_nan_poisoned_float_stats_fall_back(cat, spark):
    """Spark's parquet writer propagates NaN into the footer max; NaN makes
    the metadata fold order-dependent and engines disagree on its MIN/MAX
    rank — a NaN stat must force the scan path, never an answer."""
    cat.create_database("d")
    cat.create_table("d", "f", [("k", "bigint"), ("x", "double")])
    cat.insert_into(
        "d", "f",
        spark.createDataFrame(
            [(1, 1.0), (2, float("nan")), (3, 5.0)], "k bigint, x double"
        ).coalesce(1),
    )
    assert cat.metadata_min_max("d.f", ["x"]) is None
    row = cat.column_extremes("d.f", ["x"]).collect()[0]  # scan path
    assert row.min_x == 1.0 and row.max_x != row.max_x  # Spark: NaN is MAX


def test_nan_partition_value_falls_back(cat, spark):
    """A float/double PARTITION column whose hive path value is 'NaN' must
    hit the same guard as NaN footer stats: the path-value branch normalizes
    'NaN' to float('nan'), which would poison the _key fold order-dependently
    (NaN compares False against everything) while Spark's scan ranks NaN as
    MAX — so the metadata path must refuse, never answer."""
    cat.create_database("d")
    cat.create_table(
        "d", "np", [("k", "bigint"), ("p", "double")], partitioned_by=["p"]
    )
    cat.insert_into(
        "d", "np",
        spark.createDataFrame(
            [(1, 1.0), (2, float("nan")), (3, 5.0)], "k bigint, p double"
        ),
    )
    assert cat.metadata_min_max("d.np", ["p"]) is None
    row = cat.column_extremes("d.np", ["p"]).collect()[0]  # scan path
    assert row.min_p == 1.0 and row.max_p != row.max_p  # Spark: NaN is MAX
    # non-NaN float partitions still answer from the path
    cat.create_table(
        "d", "fp", [("k", "bigint"), ("p", "double")], partitioned_by=["p"]
    )
    cat.insert_into(
        "d", "fp",
        spark.createDataFrame([(1, 1.0), (3, 5.0)], "k bigint, p double"),
    )
    assert cat.metadata_min_max("d.fp", ["p"]) == {
        "p": {"min": 1.0, "max": 5.0, "count": 2}
    }


def test_string_partition_column_answers_from_path(cat, spark):
    """Partition columns bypass the footer-type gate: their values live
    exactly in the path, so even string extremes are answerable — while a
    non-partition string still falls back (truncation distrust)."""
    _mk(cat, spark)  # partitioned by y; s is a data column
    cat.create_table(
        "d", "sp", [("k", "bigint"), ("region", "string")], partitioned_by=["region"]
    )
    cat.insert_into(
        "d", "sp",
        spark.createDataFrame(
            [(1, "asia"), (2, "europe"), (3, "africa")], "k bigint, region string"
        ),
    )
    mm = cat.metadata_min_max("d.sp", ["region"])
    assert mm == {"region": {"min": "africa", "max": "europe", "count": 3}}
    row = cat.column_extremes("d.sp", ["region"]).collect()[0]
    assert (row.min_region, row.max_region, row.count_region) == ("africa", "europe", 3)


def test_case_insensitive_column_names(cat, spark):
    _mk(cat, spark)
    row = cat.column_extremes("d.t", ["K"]).collect()[0]  # declared as 'k'
    assert (row.min_k, row.max_k) == (0, 59)


def test_rename_keeps_metadata_answers(cat, spark):
    """Stats are keyed by FIELD ID, so a column rename never orphans them:
    files written before the rename still answer under the new name."""
    cat.create_database("d")
    cat.create_table("d", "r", [("k", "bigint"), ("amount", "double")])
    cat.insert_into(
        "d", "r", spark.createDataFrame([(1, 2.5), (2, 7.5)], "k bigint, amount double")
    )
    cat.rename_column("d", "r", "amount", "price")
    mm = cat.metadata_min_max("d.r", ["price"])
    assert mm == {"price": {"min": 2.5, "max": 7.5, "count": 2}}
    row = cat.column_extremes("d.r", ["price"]).collect()[0]
    assert (row.min_price, row.max_price) == (2.5, 7.5)


def test_date_extremes_revive_typed(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "dd", [("k", "bigint"), ("day", "date")])
    cat.insert_into(
        "d", "dd",
        spark.createDataFrame(
            [(1, dt.date(2024, 3, 1)), (2, dt.date(2023, 1, 15))], "k bigint, day date"
        ),
    )
    row = cat.column_extremes("d.dd", ["day"]).collect()[0]
    assert (row.min_day, row.max_day) == (dt.date(2023, 1, 15), dt.date(2024, 3, 1))
    assert cat.metadata_min_max("d.dd", ["day"])["day"]["min"] == "2023-01-15"
