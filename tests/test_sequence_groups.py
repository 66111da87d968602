"""partial-update SEQUENCE GROUPS — Paimon's ``fields.<seq>.sequence-group``
CoreOption (multi-stream partial update; the reference inherits the behavior
through core's PartialUpdateMergeFunction, surfaced via the same DDL property
reflection as the other CoreOptions, ``TrinoTableOptionUtils.java:51-135``).

Contract pinned here (see ``_partial_update_sequence_groups``):
- per group, the row with the highest (group-seq, changelog-order) among
  non-null-seq INSERTS supplies ALL the group's columns — nulls included
  (true partial update), while null-seq rows leave the group untouched;
- a -D with non-null group seq >= the winner's retracts the group to nulls
  but the KEY survives;
- ungrouped columns keep the default last-non-null rule over inserts.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.operators.merge_on_read import merge_on_read

SCHEMA = (
    "k int, g1 bigint, a int, b int, g2 bigint, c int, u string, _seq bigint, _row_kind string"
)
GROUPS = {"g1": ["a", "b"], "g2": ["c"]}


def _merge(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = merge_on_read(df, ["k"], "partial-update", sequence_groups=GROUPS)
    return {r.k: r for r in out.collect()}


def test_out_of_order_streams_merge_by_group_seq(spark):
    rows = [
        # stream 1 (group g1) arrives NEWER data first: g1=20 then g1=10
        (1, 20, 7, 8, None, None, "x", 1, "I"),
        (1, 10, 1, 2, None, None, None, 2, "I"),
        # stream 2 (group g2) in order; latest u comes from here
        (1, None, None, None, 5, 30, "y", 3, "I"),
    ]
    got = _merge(spark, rows)[1]
    # g1 group: seq 20 wins though it arrived first (out-of-order protection)
    assert (got.g1, got.a, got.b) == (20, 7, 8)
    # g2 group from its own stream; ungrouped u = last non-null
    assert (got.g2, got.c) == (5, 30)
    assert got.u == "y"


def test_winning_row_nulls_overwrite_within_group(spark):
    rows = [
        (1, 10, 1, 2, None, None, None, 1, "I"),
        # higher group seq with a NULL member: true partial update — b goes null
        (1, 20, 3, None, None, None, None, 2, "I"),
    ]
    got = _merge(spark, rows)[1]
    assert (got.g1, got.a, got.b) == (20, 3, None)


def test_null_group_seq_leaves_group_untouched(spark):
    rows = [
        (1, 10, 1, 2, None, None, None, 1, "I"),
        # later row, but g1 is null: group g1 must not move; u still updates
        (1, None, 9, 9, None, None, "later", 2, "I"),
    ]
    got = _merge(spark, rows)[1]
    assert (got.g1, got.a, got.b) == (10, 1, 2)
    assert got.u == "later"


def test_equal_seq_later_row_wins(spark):
    rows = [
        (1, 10, 1, None, None, None, None, 1, "I"),
        (1, 10, 2, None, None, None, None, 2, "I"),
    ]
    got = _merge(spark, rows)[1]
    assert got.a == 2


def test_delete_retracts_only_outranked_groups_key_survives(spark):
    rows = [
        (1, 10, 1, 2, 50, 3, "keep", 1, "I"),
        # -D with g1=15 (>= 10: retracts g1) and g2=40 (< 50: g2 survives)
        (1, 15, None, None, 40, None, None, 2, "D"),
    ]
    got = _merge(spark, rows)[1]
    assert (got.g1, got.a, got.b) == (None, None, None)
    assert (got.g2, got.c) == (50, 3)
    assert got.u == "keep"  # key survives; ungrouped untouched by delete


def test_delete_equal_seq_retracts(spark):
    rows = [
        (1, 10, 1, None, None, None, None, 1, "I"),
        (1, 10, None, None, None, None, None, 2, "D"),
    ]
    got = _merge(spark, rows)[1]
    assert (got.g1, got.a) == (None, None)


def test_delete_with_null_seq_is_noop_and_all_delete_key_absent(spark):
    rows = [
        (1, 10, 1, None, None, None, None, 1, "I"),
        (1, None, None, None, None, None, None, 2, "D"),  # null seq: no-op
        (2, 10, 1, None, None, None, None, 1, "D"),  # key 2: deletes only
    ]
    got = _merge(spark, rows)
    assert got[1].g1 == 10 and got[1].a == 1
    assert 2 not in got


def test_insert_after_retraction_wins_again(spark):
    rows = [
        (1, 10, 1, None, None, None, None, 1, "I"),
        (1, 15, None, None, None, None, None, 2, "D"),
        # re-insert with seq above the retraction: group comes back
        (1, 20, 4, 5, None, None, None, 3, "I"),
    ]
    got = _merge(spark, rows)[1]
    assert (got.g1, got.a, got.b) == (20, 4, 5)


def test_groups_require_partial_update_engine(spark):
    df = spark.createDataFrame([(1, 1, 1, 1, 1, 1, "x", 1, "I")], SCHEMA)
    with pytest.raises(ValueError, match="partial-update"):
        merge_on_read(df, ["k"], "deduplicate", sequence_groups=GROUPS)


def test_group_columns_must_be_value_columns(spark):
    df = spark.createDataFrame([(1, 1, 1, 1, 1, 1, "x", 1, "I")], SCHEMA)
    with pytest.raises(ValueError, match="not among value columns"):
        merge_on_read(
            df, ["k"], "partial-update", sequence_groups={"g1": ["a", "missing"]}
        )


def test_end_to_end_through_catalog_options(spark, tmp_path):
    from incubator_paimon_trino_spark.catalog import WarehouseCatalog

    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("k", "int"), ("g1", "bigint"), ("a", "int"), ("g2", "bigint"), ("b", "int")],
        primary_key=["k"],
        options={
            "merge_engine": "partial-update",
            "fields.g1.sequence-group": "a",
            "fields.g2.sequence-group": "b",
        },
    )
    ddl = "k int, g1 bigint, a int, g2 bigint, b int"
    # stream 1 commits NEWER g1 data first, then stale g1 data
    cat.insert_into("d", "t", spark.createDataFrame([(1, 20, 7, None, None)], ddl))
    cat.insert_into("d", "t", spark.createDataFrame([(1, 10, 1, None, None)], ddl))
    # stream 2 touches only its own group
    cat.insert_into("d", "t", spark.createDataFrame([(1, None, None, 5, 30)], ddl))
    rows = cat.read_table("d.t").collect()
    assert [(r.k, r.g1, r.a, r.g2, r.b) for r in rows] == [(1, 20, 7, 5, 30)]


def test_no_retraction_fast_path_plan_and_equivalence(spark, tmp_path):
    """With every live file footer-proven all-inserts, the catalog routes
    sequence groups through the one-max_by-per-group fast path (no
    collect_list replay in the plan); a -D commit flips the table to replay;
    compact() — which rewrites everything as 'I' — restores the fast path.
    Results agree with the replay engine throughout."""
    from incubator_paimon_trino_spark.catalog import WarehouseCatalog

    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t",
        [("k", "int"), ("g1", "bigint"), ("a", "int"), ("b", "int")],
        primary_key=["k"],
        options={"merge_engine": "partial-update", "fields.g1.sequence-group": "a,b"},
    )
    ddl = "k int, g1 bigint, a int, b int"
    cat.insert_into("d", "t", spark.createDataFrame([(1, 20, 7, None), (2, 5, 1, 2)], ddl))
    cat.insert_into("d", "t", spark.createDataFrame([(1, 10, 9, 9), (2, 6, None, 4)], ddl))

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    df = cat.read_table("d.t")
    assert "collect_list" not in plan(df)  # fast path: max_by only
    got = sorted((r.k, r.g1, r.a, r.b) for r in df.collect())
    assert got == [(1, 20, 7, None), (2, 6, None, 4)]

    # a retraction forces the ordered replay (collect_list appears)
    cat.insert_into(
        "d", "t", spark.createDataFrame([(2, 7, None, None)], ddl), row_kind="D"
    )
    df = cat.read_table("d.t")
    assert "collect_list" in plan(df)
    got = sorted((r.k, r.g1, r.a, r.b) for r in df.collect())
    assert got == [(1, 20, 7, None), (2, None, None, None)]  # group retracted

    # compaction materializes the merged state as 'I' rows → fast path again
    cat.compact("d", "t")
    df = cat.read_table("d.t")
    assert "collect_list" not in plan(df)
    assert sorted((r.k, r.g1, r.a, r.b) for r in df.collect()) == got


def test_fast_path_matches_replay_on_insert_only_histories(spark):
    """Direct-API equivalence: on retraction-free changelogs the max_by fast
    path and the ordered replay must be value-identical (the optimization
    claim no_retractions makes)."""
    rows = [
        (1, 20, 7, None, None, None, "u1", 1, "I"),
        (1, 10, 1, 2, 5, 30, None, 2, "I"),
        (1, None, None, None, 5, 40, "u2", 3, "I"),
        (2, None, None, None, None, None, "x", 1, "I"),
        (2, 3, 1, None, 3, 1, None, 1, "I"),  # same-commit tie
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    slow = merge_on_read(df, ["k"], "partial-update", sequence_groups=GROUPS)
    fast = merge_on_read(
        df, ["k"], "partial-update", sequence_groups=GROUPS, no_retractions=True
    )
    key = lambda r: r.k  # noqa: E731
    assert sorted(slow.collect(), key=key) == sorted(fast.collect(), key=key)


def test_ddl_validation(spark, tmp_path):
    from incubator_paimon_trino_spark.catalog import WarehouseCatalog

    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cols = [("k", "int"), ("g1", "bigint"), ("a", "int"), ("b", "int")]

    with pytest.raises(ValueError, match="partial-update"):
        cat.create_table("d", "t1", cols, primary_key=["k"],
                         options={"fields.g1.sequence-group": "a"})
    with pytest.raises(ValueError, match="primary-key table"):
        cat.create_table("d", "t2", cols,
                         options={"merge_engine": "partial-update",
                                  "fields.g1.sequence-group": "a"})
    with pytest.raises(ValueError, match="not in columns"):
        cat.create_table("d", "t3", cols, primary_key=["k"],
                         options={"merge_engine": "partial-update",
                                  "fields.g1.sequence-group": "nope"})
    with pytest.raises(ValueError, match="two sequence groups"):
        cat.create_table(
            "d", "t4", [*cols, ("g2", "bigint")], primary_key=["k"],
            options={"merge_engine": "partial-update",
                     "fields.g1.sequence-group": "a",
                     "fields.g2.sequence-group": "a"})
    with pytest.raises(ValueError, match="integral or timestamp"):
        cat.create_table(
            "d", "t5", [("k", "int"), ("g1", "string"), ("a", "int")],
            primary_key=["k"],
            options={"merge_engine": "partial-update",
                     "fields.g1.sequence-group": "a"})
    with pytest.raises(ValueError, match="remove-record-on-delete"):
        # Paimon rejects the combination — the sequence-group engine would
        # silently ignore remove-record-on-delete
        cat.create_table(
            "d", "t5b", cols, primary_key=["k"],
            options={"merge_engine": "partial-update",
                     "partial-update.remove-record-on-delete": "true",
                     "fields.g1.sequence-group": "a"})
    # mangled spelling resolves to the same option (reference DDL reflection)
    cat.create_table(
        "d", "t6", cols, primary_key=["k"],
        options={"merge_engine": "partial-update",
                 "fields_g1_sequence_group": "a , b"})
    assert cat.schema_of("d", "t6").options.get("fields_g1_sequence_group") == "a , b"


def test_collect_distinct_through_catalog(spark, tmp_path):
    from incubator_paimon_trino_spark.catalog import WarehouseCatalog

    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("v", "array<int>")], primary_key=["k"],
        options={"merge_engine": "aggregation",
                 "fields.v.aggregate-function": "collect",
                 "fields.v.distinct": "true"},
    )
    ddl = "k int, v array<int>"
    cat.insert_into("d", "t", spark.createDataFrame([(1, [2, 1, 2])], ddl))
    cat.insert_into("d", "t", spark.createDataFrame([(1, [1, 3])], ddl))
    assert cat.read_table("d.t").collect()[0].v == [2, 1, 3]

    with pytest.raises(ValueError, match="distinct requires"):
        cat.create_table(
            "d", "t2", [("k", "int"), ("v", "int")], primary_key=["k"],
            options={"merge_engine": "aggregation",
                     "fields.v.aggregate-function": "sum",
                     "fields.v.distinct": "true"})
    with pytest.raises(ValueError, match="ARRAY"):
        cat.create_table(
            "d", "t3", [("k", "int"), ("v", "int")], primary_key=["k"],
            options={"merge_engine": "aggregation",
                     "fields.v.aggregate-function": "collect"})
    with pytest.raises(ValueError, match="MAP"):
        cat.create_table(
            "d", "t4", [("k", "int"), ("v", "int")], primary_key=["k"],
            options={"merge_engine": "aggregation",
                     "fields.v.aggregate-function": "merge_map"})
