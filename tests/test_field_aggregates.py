"""Per-field aggregate functions for the aggregation merge engine —
Paimon's ``fields.<name>.aggregate-function`` table option (CoreOptions
surfaced through the reference's DDL property reflection,
``TrinoTableOptionUtils.java:51-135``).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog
from incubator_paimon_trino_spark.operators.merge_on_read import merge_on_read


def _changelog(spark):
    # key 1: three inserts across commits; key 2: one insert.
    rows = [
        # (k, v, s, flag, _seq, _row_kind)
        (1, 10, "a", True, 1, "I"),
        (1, None, "b", False, 2, "I"),
        (1, 5, None, None, 3, "I"),
        (2, 7, "z", False, 1, "I"),
    ]
    return spark.createDataFrame(
        rows, "k int, v int, s string, flag boolean, _seq bigint, _row_kind string"
    )


def _merged(spark, specs):
    out = merge_on_read(
        _changelog(spark), ["k"], "aggregation", field_aggregates=specs
    )
    return {r.k: r for r in out.collect()}


def test_sum_product_max_min_count(spark):
    got = _merged(spark, {"v": "sum"})
    assert got[1].v == 15 and got[2].v == 7
    got = _merged(spark, {"v": "product"})
    assert got[1].v == 50 and got[2].v == 7
    got = _merged(spark, {"v": "max"})
    assert got[1].v == 10
    got = _merged(spark, {"v": "min"})
    assert got[1].v == 5
    # count consumes PARTIAL counts: the write path stores each raw row's
    # contribution as 0/1 (warehouse.insert_into) and merge SUMS them, so a
    # compacted total stays additive instead of collapsing back to 1.
    partials = spark.createDataFrame(
        [
            (1, 1, None, None, 1, "I"),
            (1, 0, None, None, 2, "I"),  # null input → 0 contribution
            (1, 1, None, None, 3, "I"),
            (2, 1, None, None, 1, "I"),
        ],
        "k int, v int, s string, flag boolean, _seq bigint, _row_kind string",
    )
    out = merge_on_read(partials, ["k"], "aggregation", field_aggregates={"v": "count"})
    got = {r.k: r for r in out.collect()}
    assert got[1].v == 2  # nulls not counted
    assert got[2].v == 1


def test_first_last_value_variants(spark):
    got = _merged(spark, {"v": "last_value", "s": "last_value"})
    assert got[1].v == 5 and got[1].s is None
    got = _merged(spark, {"v": "last_non_null_value", "s": "last_non_null_value"})
    assert got[1].v == 5 and got[1].s == "b"
    got = _merged(spark, {"v": "first_value", "s": "first_value"})
    assert got[1].v == 10 and got[1].s == "a"
    got = _merged(spark, {"v": "first_non_null_value"})
    assert got[1].v == 10


def test_listagg_and_bools(spark):
    got = _merged(spark, {"s": "listagg"})
    assert got[1].s == "a,b"  # changelog order, nulls skipped
    assert got[2].s == "z"
    got = _merged(spark, {"flag": "bool_or"})
    assert got[1].flag is True
    got = _merged(spark, {"flag": "bool_and"})
    assert got[1].flag is False
    assert got[2].flag is False


def test_unknown_function_and_column_rejected(spark):
    with pytest.raises(ValueError):
        _merged(spark, {"v": "median"})
    with pytest.raises(ValueError):
        _merged(spark, {"nope": "sum"})


def test_end_to_end_through_catalog_options(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("v", "int"), ("s", "string")],
        primary_key=["k"],
        options={
            "merge_engine": "aggregation",
            "fields.v.aggregate-function": "sum",
            "fields.s.aggregate-function": "listagg",
        },
    )
    cat.insert_into("d", "t", spark.createDataFrame([(1, 3, "x")], "k int, v int, s string"))
    cat.insert_into("d", "t", spark.createDataFrame([(1, 4, "y")], "k int, v int, s string"))
    rows = cat.read_table("d.t").collect()
    assert [(r.k, r.v, r.s) for r in rows] == [(1, 7, "x,y")]


def test_count_survives_compaction(spark, tmp_path):
    """Compaction materializes the accumulated count; later merges must ADD
    to it (sum-of-partials), not reset the compacted row's weight to 1."""
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("v", "bigint")],
        primary_key=["k"],
        options={"merge_engine": "aggregation", "fields.v.aggregate-function": "count"},
    )
    cat.insert_into("d", "t", spark.createDataFrame([(1, 99), (1, 98)], "k int, v bigint"))
    cat.insert_into("d", "t", spark.createDataFrame([(1, None)], "k int, v bigint"))
    cat.compact("d", "t")
    cat.insert_into("d", "t", spark.createDataFrame([(1, 5), (1, 6)], "k int, v bigint"))
    rows = cat.read_table("d.t").collect()
    assert [(r.k, r.v) for r in rows] == [(1, 4)]  # 2 pre-compaction + 2 after


def test_create_table_validates_specs(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    with pytest.raises(ValueError):  # unknown column
        cat.create_table(
            "d", "bad1", [("k", "int"), ("v", "int")], primary_key=["k"],
            options={"fields.zz.aggregate-function": "sum"},
        )
    with pytest.raises(ValueError):  # PK column
        cat.create_table(
            "d", "bad2", [("k", "int"), ("v", "int")], primary_key=["k"],
            options={"fields.k.aggregate-function": "sum"},
        )
    with pytest.raises(ValueError):  # unknown function
        cat.create_table(
            "d", "bad3", [("k", "int"), ("v", "int")], primary_key=["k"],
            options={"fields.v.aggregate-function": "median"},
        )


def test_mangled_field_aggregate_spelling(spark, tmp_path):
    """The reference's mangled DDL spelling fields_<col>_aggregate_function
    (TrinoTableOptionUtils.convertOptionKey) must configure the aggregate,
    not be silently stored-and-ignored (which would make reads merge with
    the default function — silently wrong data)."""
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("m")
    cat.create_table(
        "m", "fm",
        [("k", "int"), ("v", "bigint")],
        primary_key=["k"],
        options={"merge_engine": "aggregation", "fields_v_aggregate_function": "max"},
    )
    mk = lambda rows: spark.createDataFrame(rows, "k int, v bigint")  # noqa: E731
    cat.insert_into("m", "fm", mk([(1, 10)]))
    cat.insert_into("m", "fm", mk([(1, 3)]))
    got = {r.k: r.v for r in cat.read_table("m.fm").collect()}
    assert got == {1: 10}, f"max aggregate ignored: {got}"


def _clg(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_collect_concatenates_in_changelog_order(spark):
    rows = [
        (1, [3, 1], 1, "I"),
        (1, None, 2, "I"),  # null array contributes nothing
        (1, [1, 2], 3, "I"),
        (2, [], 1, "I"),
    ]
    df = _clg(spark, rows, "k int, v array<int>, _seq bigint, _row_kind string")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "collect"})
    got = {r.k: r.v for r in out.collect()}
    assert got[1] == [3, 1, 1, 2]
    assert got[2] == []


def test_collect_distinct_keeps_first_occurrences(spark):
    rows = [(1, [2, 1, 2], 1, "I"), (1, [1, 3], 2, "I")]
    df = _clg(spark, rows, "k int, v array<int>, _seq bigint, _row_kind string")
    out = merge_on_read(
        df, ["k"], "aggregation", field_aggregates={"v": "collect_distinct"}
    )
    assert out.collect()[0].v == [2, 1, 3]


def test_collect_retraction_removes_one_occurrence_each(spark):
    rows = [
        (1, [1, 2, 2, 3], 1, "I"),
        (1, [2, 9], 2, "D"),  # retract ONE 2; 9 was never present → no-op
        (1, [4], 3, "I"),
    ]
    df = _clg(spark, rows, "k int, v array<int>, _seq bigint, _row_kind string")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "collect"})
    assert out.collect()[0].v == [1, 2, 3, 4]


def test_merge_map_last_wins_per_key(spark):
    rows = [
        (1, {"a": 1, "b": 2}, 1, "I"),
        (1, None, 2, "I"),  # null map contributes nothing
        (1, {"b": 20, "c": 30}, 3, "I"),
    ]
    df = _clg(spark, rows, "k int, v map<string,int>, _seq bigint, _row_kind string")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "merge_map"})
    got = out.collect()[0].v
    assert got == {"a": 1, "b": 20, "c": 30}


def test_merge_map_null_value_overwrites_and_all_null_is_null(spark):
    rows = [
        (1, {"a": 1}, 1, "I"),
        (1, {"a": None}, 2, "I"),  # entry with null VALUE still overwrites
        (2, None, 1, "I"),  # key with no map at all → null, not empty map
    ]
    df = _clg(spark, rows, "k int, v map<string,int>, _seq bigint, _row_kind string")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "merge_map"})
    got = {r.k: r.v for r in out.collect()}
    assert got[1] == {"a": None}
    assert got[2] is None


def test_merge_map_rejects_retraction(spark):
    rows = [(1, {"a": 1}, 1, "I"), (1, {"a": 1}, 2, "D")]
    df = _clg(spark, rows, "k int, v map<string,int>, _seq bigint, _row_kind string")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "merge_map"})
    with pytest.raises(Exception, match="retraction"):
        out.collect()


def test_nested_update_append_without_key(spark):
    rows = [
        (1, [(10, "a")], 1, "I"),
        (1, [(20, "b"), (10, "c")], 2, "I"),
    ]
    df = _clg(spark, rows, "k int, v array<struct<id:int,s:string>>, _seq bigint, _row_kind string")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "nested_update"})
    got = [tuple(r) for r in out.collect()[0].v]
    assert got == [(10, "a"), (20, "b"), (10, "c")]  # pure append, changelog order


def test_nested_update_with_nested_key_upserts(spark):
    rows = [
        (1, [(10, "old"), (20, "keep")], 1, "I"),
        (1, None, 2, "I"),
        (1, [(10, "new"), (30, "add")], 3, "I"),
    ]
    df = _clg(spark, rows, "k int, v array<struct<id:int,s:string>>, _seq bigint, _row_kind string")
    out = merge_on_read(
        df, ["k"], "aggregation",
        field_aggregates={"v": "nested_update"}, nested_keys={"v": ["id"]},
    )
    got = [tuple(r) for r in out.collect()[0].v]
    # id=10 replaced in place (first-appearance order), 30 appended
    assert got == [(10, "new"), (20, "keep"), (30, "add")]


def test_nested_update_rejects_retraction(spark):
    rows = [(1, [(10, "a")], 1, "I"), (1, [(10, "a")], 2, "D")]
    df = _clg(spark, rows, "k int, v array<struct<id:int,s:string>>, _seq bigint, _row_kind string")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "nested_update"})
    with pytest.raises(Exception, match="retraction"):
        out.collect()


def test_default_aggregate_function(spark):
    # default max: v would sum without it; explicit spec still outranks
    got = _merged_with(spark, {"s": "listagg"}, default="max")
    assert got[1].v == 10 and got[1].s == "a,b"


def _merged_with(spark, specs, default=None):
    out = merge_on_read(
        _changelog(spark), ["k"], "aggregation",
        field_aggregates=specs, default_aggregate=default,
    )
    return {r.k: r for r in out.collect()}


def test_nested_update_through_catalog_with_validation(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t",
        [("k", "int"), ("v", "array<struct<id:int,s:string>>")],
        primary_key=["k"],
        options={"merge_engine": "aggregation",
                 "fields.v.aggregate-function": "nested_update",
                 "fields.v.nested-key": "id"},
    )
    ddl = "k int, v array<struct<id:int,s:string>>"
    cat.insert_into("d", "t", spark.createDataFrame([(1, [(10, "old")])], ddl))
    cat.insert_into("d", "t", spark.createDataFrame([(1, [(10, "new"), (20, "b")])], ddl))
    got = [tuple(r) for r in cat.read_table("d.t").collect()[0].v]
    assert got == [(10, "new"), (20, "b")]

    with pytest.raises(ValueError, match="not in 'v''s row type|not in"):
        cat.create_table(
            "d", "bad", [("k", "int"), ("v", "array<struct<id:int>>")],
            primary_key=["k"],
            options={"merge_engine": "aggregation",
                     "fields.v.aggregate-function": "nested_update",
                     "fields.v.nested-key": "nope"})
    with pytest.raises(ValueError, match="ARRAY<STRUCT"):
        cat.create_table(
            "d", "bad2", [("k", "int"), ("v", "array<int>")],
            primary_key=["k"],
            options={"merge_engine": "aggregation",
                     "fields.v.aggregate-function": "nested_update"})
    with pytest.raises(ValueError, match="nested-key requires"):
        cat.create_table(
            "d", "bad3", [("k", "int"), ("v", "array<struct<id:int>>")],
            primary_key=["k"],
            options={"merge_engine": "aggregation",
                     "fields.v.nested-key": "id"})


def test_default_aggregate_through_catalog(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("a", "int"), ("b", "int")], primary_key=["k"],
        options={"merge_engine": "aggregation",
                 "fields.default-aggregate-function": "max",
                 "fields.a.aggregate-function": "sum"},
    )
    cat.insert_into("d", "t", spark.createDataFrame([(1, 3, 7)], "k int, a int, b int"))
    cat.insert_into("d", "t", spark.createDataFrame([(1, 4, 5)], "k int, a int, b int"))
    r = cat.read_table("d.t").collect()[0]
    assert (r.a, r.b) == (7, 7)  # a summed (explicit), b maxed (default)

    with pytest.raises(ValueError, match="default aggregate-function cannot"):
        cat.create_table(
            "d", "bad", [("k", "int"), ("v", "int")], primary_key=["k"],
            options={"merge_engine": "aggregation",
                     "fields.default-aggregate-function": "count"})
