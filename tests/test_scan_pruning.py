"""Manifest-level file skipping (catalog/scan.py) — the ``newScan().plan()``
layer Paimon runs before any reader opens a file (predicate wired at
``common/TrinoSplitManagerBase.java:44-48``).

Invariants under test:
- stats are collected at commit time from parquet footers only, keyed by
  field id (schema-evolution safe);
- pruning NEVER changes results — only the number of files planned;
- PK tables prune only on PK/partition columns (a value-column predicate
  must see the merged row, not per-file versions);
- every unknown (ORC, truncated string stats, unparseable literal) keeps
  the file.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog
from incubator_paimon_trino_spark.functions.predicates import ColumnDomain, Range


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _mk_append(cat, spark, *, fmt=None, partitioned=False):
    """3 commits with disjoint k-ranges → ≥3 files with distinct stats."""
    cat.create_database("d", ignore_if_exists=True)
    opts = {"file_format": fmt} if fmt else {}
    cat.create_table(
        "d", "t", [("k", "int"), ("pt", "string"), ("v", "string")],
        partitioned_by=(["pt"] if partitioned else []), options=opts,
    )
    for lo, pt in ((0, "a"), (100, "b"), (200, "c")):
        rows = [(lo + i, pt, f"val{lo + i}") for i in range(10)]
        df = spark.createDataFrame(rows, "k int, pt string, v string").coalesce(1)
        cat.insert_into("d", "t", df)


def test_commit_collects_footer_stats(cat, spark):
    _mk_append(cat, spark)
    files = cat.scan_plan("d.t")
    assert len(files) == 3
    for e in files:
        assert e["record_count"] == 10
        assert e["size_bytes"] > 0
        # k is field id 0, v is field id 2
        assert e["stats"]["0"]["max"] - e["stats"]["0"]["min"] == 9
        assert e["stats"]["0"]["nulls"] == 0
        assert e["stats"]["2"]["min"].startswith("val")


def test_minmax_skip_and_identical_results(cat, spark):
    _mk_append(cat, spark)
    dom = [ColumnDomain("k", op="=", value=105)]
    assert len(cat.scan_plan("d.t", predicate=dom)) == 1
    got = cat.read_table("d.t", predicate=dom).collect()
    assert [tuple(r) for r in got] == [(105, "b", "val105")]
    # range + IN forms
    assert len(cat.scan_plan("d.t", predicate=[ColumnDomain("k", in_values=[5, 205])])) == 2
    r = [ColumnDomain("k", ranges=[Range(low=150, high=220)])]
    assert len(cat.scan_plan("d.t", predicate=r)) == 1
    assert cat.read_table("d.t", predicate=r).count() == 10
    # contradiction → zero files, empty result with intact schema
    none = [ColumnDomain("k", op="<", value=0)]
    assert cat.scan_plan("d.t", predicate=none) == []
    empty = cat.read_table("d.t", predicate=none)
    assert empty.count() == 0 and empty.columns == ["k", "pt", "v"]


def test_partition_path_pruning_survives_rename(cat, spark):
    _mk_append(cat, spark, partitioned=True)
    dom = [ColumnDomain("pt", op="=", value="b")]
    assert len(cat.scan_plan("d.t", predicate=dom)) == 1
    # rename the partition column: old files keep pt=... paths, but the
    # field id resolves the old name through each file's writing schema
    cat.rename_column("d", "t", "pt", "bucket")
    dom2 = [ColumnDomain("bucket", op="=", value="b")]
    assert len(cat.scan_plan("d.t", predicate=dom2)) == 1
    got = cat.read_table("d.t", predicate=dom2)
    assert got.count() == 10 and got.columns == ["k", "bucket", "v"]


def test_pk_table_never_prunes_on_value_columns(cat, spark):
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "pk", [("id", "int"), ("v", "int")], primary_key=["id"])
    one = lambda rows: spark.createDataFrame(rows, "id int, v int").coalesce(1)  # noqa: E731
    cat.insert_into("d", "pk", one([(1, 100)]))   # commit 1: v=100
    cat.insert_into("d", "pk", one([(1, 5)]))     # commit 2: upsert v=5
    # merged truth: (1, 5). Pruning on v would drop commit-2's file for
    # v=100 and wrongly resurrect the stale row — so no file may be dropped.
    assert len(cat.scan_plan("d.pk", predicate=[ColumnDomain("v", op="=", value=100)])) == 2
    assert cat.read_table("d.pk", predicate=[ColumnDomain("v", op="=", value=100)]).count() == 0
    got = cat.read_table("d.pk", predicate=[ColumnDomain("v", op="=", value=5)]).collect()
    assert [tuple(r) for r in got] == [(1, 5)]
    # PK-column predicates ARE safe: every version carries the key value
    cat.insert_into("d", "pk", one([(99, 7)]))
    assert len(cat.scan_plan("d.pk", predicate=[ColumnDomain("id", op="=", value=99)])) == 1


def test_orc_and_unknowns_keep_files(cat, spark):
    _mk_append(cat, spark, fmt="ORC")
    files = cat.scan_plan("d.t")
    assert all(e["stats"] == {} and e["record_count"] == 10 for e in files)
    # no stats → nothing prunable, results still correct via residual filter
    dom = [ColumnDomain("k", op="=", value=105)]
    assert len(cat.scan_plan("d.t", predicate=dom)) == 3
    assert cat.read_table("d.t", predicate=dom).count() == 1


def test_long_string_stats_distrusted(cat, spark):
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "s", [("k", "int"), ("txt", "string")])
    df = spark.createDataFrame([(1, "z" * 200)], "k int, txt string").coalesce(1)
    cat.insert_into("d", "s", df)
    (entry,) = cat.scan_plan("d.s")
    assert "1" not in entry["stats"]  # txt ≥ 64 chars → truncation guard
    assert entry["stats"]["0"]["min"] == 1


def test_null_count_pruning(cat, spark):
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "n", [("k", "int"), ("v", "string")])
    cat.insert_into("d", "n", spark.createDataFrame([(1, None)], "k int, v string").coalesce(1))
    cat.insert_into("d", "n", spark.createDataFrame([(2, "x")], "k int, v string").coalesce(1))
    assert len(cat.scan_plan("d.n", predicate=[ColumnDomain("v", is_null=True)])) == 1
    assert len(cat.scan_plan("d.n", predicate=[ColumnDomain("v", is_null=False)])) == 1
    # all-null file fails any value comparison, null_allowed keeps it
    assert len(cat.scan_plan("d.n", predicate=[ColumnDomain("v", op="=", value="x")])) == 1
    assert len(
        cat.scan_plan("d.n", predicate=[ColumnDomain("v", op="=", value="x", null_allowed=True)])
    ) == 2


def test_timestamp_stats_prune(cat, spark):
    import datetime as dt

    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "ts", [("k", "int"), ("at", "timestamp")])
    mk = lambda h: dt.datetime(2026, 1, 1, h, 0, 0)  # noqa: E731
    cat.insert_into(
        "d", "ts", spark.createDataFrame([(1, mk(1)), (2, mk(2))], "k int, at timestamp").coalesce(1)
    )
    cat.insert_into(
        "d", "ts", spark.createDataFrame([(3, mk(20)), (4, mk(21))], "k int, at timestamp").coalesce(1)
    )
    dom = [ColumnDomain("at", op=">=", value=mk(12))]
    assert len(cat.scan_plan("d.ts", predicate=dom)) == 1
    assert cat.read_table("d.ts", predicate=dom).count() == 2


def test_clustering_columns_tighten_minmax_pruning(cat, spark):
    """clustering.columns: a range-partitioned+sorted commit gives each file
    a narrow key range, so a point predicate prunes to ~1 file; the same
    data unclustered leaves every file overlapping the domain."""
    import random

    rows = [(k, f"v{k}") for k in random.Random(7).sample(range(10_000), 2_000)]
    df = spark.createDataFrame(rows, "k int, v string").repartition(8)

    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "clustered", [("k", "int"), ("v", "string")],
                     options={"clustering_columns": "k", "clustering_partitions": "8"})
    cat.create_table("d", "plain", [("k", "int"), ("v", "string")])
    cat.insert_into("d", "clustered", df)
    cat.insert_into("d", "plain", df)

    assert len(cat.scan_plan("d.clustered")) == 8  # pinned range buckets
    pred = [ColumnDomain("k", op="=", value=rows[0][0])]
    n_clustered = len(cat.scan_plan("d.clustered", predicate=pred))
    n_plain_all = len(cat.scan_plan("d.plain"))
    n_plain = len(cat.scan_plan("d.plain", predicate=pred))
    assert n_clustered == 1
    # unclustered: every file spans ~the whole domain → no pruning wins
    assert n_plain == n_plain_all > 1
    # correctness unchanged
    got = cat.read_table("d.clustered", predicate=pred).collect()
    assert [(r.k, r.v) for r in got] == [rows[0]]

    with pytest.raises(ValueError):
        cat.create_table("d", "bad_cluster", [("k", "int")],
                         options={"clustering_columns": "zz"})
        cat.insert_into("d", "bad_cluster", spark.createDataFrame([(1,)], "k int"))
