"""``scan.fallback-branch`` (Paimon CoreOption): partitions absent from the
current branch are served from the fallback branch — the batch/stream
dual-write pattern. Composition: main read ∪ (branch read ⋉ missing
partitions); metadata-only diff, broadcast semi join."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _mk(cat, spark, pk=None):
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("v", "string"), ("p", "int")],
        primary_key=pk, partitioned_by=["p"],
    )
    cat.create_branch("d", "t", "stream")
    cat.set_options("d", "t", {"scan.fallback-branch": "stream"})
    ddl = "k int, v string, p int"
    # main: p=1, p=2; branch: p=2 (shadowed) and p=3 (fallback-served)
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, "m1", 1), (2, "m2", 2)], ddl))
    cat.insert_into("d", "t$branch_stream", spark.createDataFrame(
        [(20, "SHADOWED", 2), (3, "b3", 3)], ddl))
    return cat


def test_missing_partitions_served_from_fallback(cat, spark):
    _mk(cat, spark)
    got = sorted((r.k, r.v, r.p) for r in cat.read_table("d.t").collect())
    # p=2 comes from MAIN (present there: fallback must not double-serve)
    assert got == [(1, "m1", 1), (2, "m2", 2), (3, "b3", 3)]


def test_predicate_and_direct_branch_read_unaffected(cat, spark):
    from incubator_paimon_trino_spark.functions.predicates import ColumnDomain

    _mk(cat, spark)
    got = cat.read_table("d.t", predicate=[ColumnDomain("p", op="=", value=3)]).collect()
    assert [(r.k, r.p) for r in got] == [(3, 3)]
    # the branch address itself reads only the branch (no re-fallback)
    br = sorted(r.k for r in cat.read_table("d.t$branch_stream").collect())
    assert br == [3, 20]


def test_time_travel_bypasses_fallback(cat, spark):
    _mk(cat, spark)
    got = sorted(r.p for r in cat.read_table("d.t", version_as_of=1).collect())
    assert got == [1, 2]  # snapshot 1 of MAIN only


def test_pk_tables_merge_each_side(cat, spark):
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("v", "string"), ("p", "int")],
        primary_key=["k", "p"], partitioned_by=["p"],
    )
    cat.create_branch("d", "t", "stream")
    cat.set_options("d", "t", {"scan.fallback-branch": "stream"})
    ddl = "k int, v string, p int"
    cat.insert_into("d", "t", spark.createDataFrame([(1, "old", 1)], ddl))
    cat.insert_into("d", "t", spark.createDataFrame([(1, "new", 1)], ddl))
    cat.insert_into("d", "t$branch_stream", spark.createDataFrame(
        [(5, "b-old", 9)], ddl))
    cat.insert_into("d", "t$branch_stream", spark.createDataFrame(
        [(5, "b-new", 9)], ddl))
    got = sorted((r.k, r.v, r.p) for r in cat.read_table("d.t").collect())
    # each side merged independently: latest wins on both
    assert got == [(1, "new", 1), (5, "b-new", 9)]


def test_compact_does_not_absorb_fallback_rows(cat, spark):
    """Maintenance/write paths operate on the branch's own files only —
    fallback-branch is a SCAN-TIME option. A compact() that read main ∪
    fallback would commit p=3 (fallback-served) as MAIN data, permanently
    shadowing later fallback updates. Regression for the use_fallback=True
    default leaking into compact/analyze/DML."""
    _mk(cat, spark)
    cat.compact("d", "t")
    # main-branch-only address must still hold exactly main's own rows
    main_only = sorted(
        (r.k, r.p) for r in cat.read_table("d.t", use_fallback=False).collect()
    )
    assert main_only == [(1, 1), (2, 2)]
    # a later fallback update to p=3 must still reach the scan
    cat.insert_into(
        "d", "t$branch_stream",
        spark.createDataFrame([(30, "b3-v2", 3)], "k int, v string, p int"),
    )
    got = sorted((r.k, r.v, r.p) for r in cat.read_table("d.t").collect())
    assert got == [(1, "m1", 1), (2, "m2", 2), (3, "b3", 3), (30, "b3-v2", 3)]


def test_dml_does_not_absorb_fallback_rows(cat, spark):
    """delete_where on a fallback-configured PK table must evaluate its
    condition against MAIN's own files only — a fallback-inclusive read
    would emit -D rows for (and thereby materialize) branch-served keys."""
    from pyspark.sql import functions as F

    _mk(cat, spark, pk=["k", "p"])
    # row-level -D path (condition touches non-partition column k): removes
    # main's k=2 only; k=3/k=20 live in the fallback branch, untouched
    cat.delete_where("d", "t", F.col("k") >= 2)
    got = sorted((r.k, r.p) for r in cat.read_table("d.t").collect())
    assert got == [(1, 1), (3, 3)]
    br = sorted(r.k for r in cat.read_table("d.t$branch_stream").collect())
    assert br == [3, 20]


def test_unknown_fallback_branch_raises(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "t", [("k", "int"), ("p", "int")], partitioned_by=["p"])
    cat.set_options("d", "t", {"scan.fallback-branch": "nope"})
    cat.insert_into("d", "t", spark.createDataFrame([(1, 1)], "k int, p int"))
    with pytest.raises(ValueError, match="no such branch"):
        cat.read_table("d.t").collect()
