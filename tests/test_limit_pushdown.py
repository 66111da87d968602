"""A8 limit pushdown (``TrinoMetadataBase.java:418-445`` + early-stop read
``TrinoPageSourceBase.java:142-146``): the manifest file list is truncated to
a prefix covering the limit — but ONLY under the reference's guard (filters
all partition keys, append-only table), and the row limit is always
re-applied (the pushdown is never "guaranteed").
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog
from incubator_paimon_trino_spark.catalog.warehouse import (
    _limit_file_prefix,
    _limit_pushable,
)
from incubator_paimon_trino_spark.functions.predicates import ColumnDomain


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _mk(cat, spark, *, pk=None, partitioned=True, commits=4):
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table(
        "d", "t", [("k", "int"), ("pt", "string"), ("v", "string")],
        primary_key=list(pk or []),
        partitioned_by=(["pt"] if partitioned else []),
    )
    for c in range(commits):
        rows = [(c * 100 + i, "even" if c % 2 == 0 else "odd", f"v{c}-{i}") for i in range(10)]
        df = spark.createDataFrame(rows, "k int, pt string, v string").coalesce(1)
        cat.insert_into("d", "t", df)


def test_prefix_stops_at_known_counts():
    files = [{"path": f"f{i}", "record_count": 10} for i in range(5)]
    assert len(_limit_file_prefix(files, 1)) == 1
    assert len(_limit_file_prefix(files, 10)) == 1
    assert len(_limit_file_prefix(files, 11)) == 2
    assert len(_limit_file_prefix(files, 999)) == 5


def test_prefix_unknown_counts_never_satisfy():
    # unknown record_count contributes rows but must not count toward the
    # stop test — otherwise a short file could starve the limit.
    files = [
        {"path": "f0", "record_count": None},
        {"path": "f1", "record_count": 10},
        {"path": "f2", "record_count": 10},
    ]
    assert len(_limit_file_prefix(files, 15)) == 3


def test_scan_plan_truncates_append_no_filter(cat, spark):
    _mk(cat, spark)
    assert len(cat.scan_plan("d.t")) == 4
    assert len(cat.scan_plan("d.t", limit=5)) == 1
    assert len(cat.scan_plan("d.t", limit=25)) == 3


def test_scan_plan_truncates_partition_scoped(cat, spark):
    _mk(cat, spark)
    pred = [ColumnDomain("pt", op="=", value="even")]
    assert len(cat.scan_plan("d.t", predicate=pred)) == 2
    assert len(cat.scan_plan("d.t", predicate=pred, limit=5)) == 1


def test_guard_rejects_value_column_filter(cat, spark):
    _mk(cat, spark)
    pred = [ColumnDomain("k", op=">=", value=0)]
    # k is not a partition key → limit must NOT shrink the plan further than
    # the stats-pruned list (all 4 files match k >= 0).
    assert len(cat.scan_plan("d.t", predicate=pred, limit=1)) == 4


def test_guard_rejects_pk_table(cat, spark):
    _mk(cat, spark, pk=["k"], partitioned=False)
    # merge-on-read could collapse rows → no manifest truncation.
    assert len(cat.scan_plan("d.t", limit=1)) == 4


def test_read_table_relimits_rows(cat, spark):
    _mk(cat, spark)
    got = cat.read_table("d.t", limit=7)
    assert got.count() == 7
    scoped = cat.read_table(
        "d.t", predicate=[ColumnDomain("pt", op="=", value="odd")], limit=12
    )
    rows = scoped.collect()
    assert len(rows) == 12
    assert {r.pt for r in rows} == {"odd"}


def test_limit_larger_than_table(cat, spark):
    _mk(cat, spark)
    assert cat.read_table("d.t", limit=10_000).count() == 40


def test_pushable_guard_unit():
    class _F:
        type = "string"

    class S:  # minimal stand-in for TableSchema
        primary_key = []
        partition_keys = ["pt"]

        @staticmethod
        def field_by_name(name):
            return _F()

    files = [{"path": "pt=a/x.parquet", "record_count": 1}]
    assert _limit_pushable(S, None, files)
    assert _limit_pushable(S, [ColumnDomain("pt", op="=", value="a")], files)
    assert not _limit_pushable(S, [ColumnDomain("v", op="=", value="a")], files)
    # partition column missing from the file path (rename drift) → not exact
    bad = [{"path": "x.parquet", "record_count": 1}]
    assert not _limit_pushable(S, [ColumnDomain("pt", op="=", value="a")], bad)

    class P(S):
        primary_key = ["k"]

    assert not _limit_pushable(P, None, files)


def test_undecidable_partition_value_blocks_pushdown(cat, spark):
    """Review fix: a partition value the pruner cannot normalize exactly
    (>=64-char string truncated in stats handling) must disable limit
    pushdown — counting maybe-matching files could starve the limit."""
    from incubator_paimon_trino_spark.catalog.warehouse import _limit_pushable

    long_val = "x" * 70
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "lp", [("k", "int"), ("pt", "string")], partitioned_by=["pt"])
    for pv in (long_val, "short"):
        cat.insert_into("d", "lp",
                        spark.createDataFrame([(1, pv), (2, pv)], "k int, pt string"))
    schema = cat.schema_of("d", "lp")
    files = cat.scan_plan("d.lp")
    ok_pred = [ColumnDomain("pt", op="=", value="short")]
    bad_pred = [ColumnDomain("pt", op="=", value=long_val)]
    # file set contains an undecidable (70-char) partition value → not exact
    assert not _limit_pushable(schema, ok_pred, files)
    assert not _limit_pushable(schema, bad_pred, files)
    # correctness regardless: re-applied filter + row limit
    got = cat.read_table("d.lp", predicate=bad_pred, limit=1).collect()
    assert len(got) == 1 and got[0].pt == long_val
