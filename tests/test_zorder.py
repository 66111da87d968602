"""Z-order (Morton) sort compaction: multi-dimensional file clustering.

Contract: ``compact(strategy='zorder', order_by=[x, y, ...])`` rewrites the
live set ordered by the interleaved-bit key, so per-file min/max become tight
boxes in EVERY order_by dimension — predicates on any subset of the columns
prune files, where lexicographic sort compaction only serves the leading
column. Results are always set-identical to the pre-compaction table.
"""

from __future__ import annotations

import pytest

from incubator_paimon_trino_spark.catalog import WarehouseCatalog
from incubator_paimon_trino_spark.functions.predicates import ColumnDomain, Range


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _grid_table(cat, spark, side=60, parts=9):
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("x", "bigint"), ("y", "bigint"), ("v", "double")],
        options={"clustering_partitions": str(parts)},
    )
    pts = [(x, y, float(x * 1000 + y)) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(pts, "x bigint, y bigint, v double")
    for r in range(3):
        cat.insert_into("d", "t", df.filter((df.x + df.y) % 3 == r))
    return side * side


def test_zorder_prunes_both_dimensions(cat, spark):
    n = _grid_table(cat, spark)
    predx = [ColumnDomain("x", ranges=[Range(low=5, high=12)])]
    predy = [ColumnDomain("y", ranges=[Range(low=5, high=12)])]
    # before: every commit file spans the whole grid → nothing prunes
    assert len(cat.scan_plan("d.t", predicate=predy)) == len(cat.scan_plan("d.t"))
    cat.sql("CALL sys.compact(table => 'd.t', order_strategy => 'zorder', order_by => 'x,y')")
    n_files = len(cat.scan_plan("d.t"))
    assert n_files > 1
    # after: BOTH single-dimension predicates prune (the lexicographic
    # impossibility — see test_lexicographic_order_serves_leading_only)
    assert len(cat.scan_plan("d.t", predicate=predx)) < n_files
    assert len(cat.scan_plan("d.t", predicate=predy)) < n_files
    # row set preserved, box query exact
    assert cat.read_table("d.t").count() == n
    box = predx + predy
    assert cat.read_table("d.t", predicate=box).count() == 8 * 8


def test_lexicographic_order_serves_leading_only(cat, spark):
    _grid_table(cat, spark)
    cat.compact("d", "t", order_by=["x", "y"])  # strategy='order'
    n_files = len(cat.scan_plan("d.t"))
    predx = [ColumnDomain("x", ranges=[Range(low=5, high=12)])]
    predy = [ColumnDomain("y", ranges=[Range(low=5, high=12)])]
    assert len(cat.scan_plan("d.t", predicate=predx)) < n_files  # leading prunes
    # trailing column spans the full range in every file → keeps everything
    assert len(cat.scan_plan("d.t", predicate=predy)) == n_files


def test_zorder_nulls_and_mixed_types(cat, spark):
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("ts", "timestamp_ntz"), ("amt", "double"), ("id", "bigint")],
        options={"clustering_partitions": "4"},
    )
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1 + i % 28, i % 24), float(i % 97) if i % 11 else None, i)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, amt double, id bigint")
    cat.insert_into("d", "t", df)
    cat.compact("d", "t", order_by=["ts", "amt"], strategy="zorder")
    assert cat.read_table("d.t").count() == 2000  # null amt rows survive
    pred = [ColumnDomain("amt", ranges=[Range(low=1.0, high=5.0)])]
    assert cat.read_table("d.t", predicate=pred).count() == sum(
        1 for _, a, _ in rows if a is not None and 1.0 <= a <= 5.0
    )


def test_zorder_validation(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "t", [("x", "bigint"), ("s", "string")])
    df = spark.createDataFrame([(1, "a")], "x bigint, s string")
    cat.insert_into("d", "t", df)
    with pytest.raises(ValueError, match=">= 2 order_by"):
        cat.compact("d", "t", order_by=["x"], strategy="zorder")
    with pytest.raises(ValueError, match="grid embedding"):
        cat.compact("d", "t", order_by=["x", "s"], strategy="zorder")
    with pytest.raises(ValueError, match="unknown compaction strategy"):
        cat.compact("d", "t", order_by=["x", "x"], strategy="peano")
    with pytest.raises(ValueError, match="grid embedding"):
        cat.compact("d", "t", order_by=["x", "s"], strategy="hilbert")
    with pytest.raises(ValueError, match="not supported"):
        cat.sql("CALL sys.compact(table => 'd.t', order_strategy => 'bogus', order_by => 'x')")


def test_clustering_columns_follow_rename_and_block_drop(cat, spark):
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("x", "bigint"), ("y", "bigint")],
        options={"clustering.columns": "x,y", "clustering.strategy": "zorder"},
    )
    cat.insert_into("d", "t", spark.createDataFrame([(1, 2)], "x bigint, y bigint"))
    cat.rename_column("d", "t", "x", "x2")
    assert cat.schema_of("d", "t").options["clustering_columns"] == "x2,y"
    # a stale list would make this insert raise "clustering column not a table column"
    cat.insert_into("d", "t", spark.createDataFrame([(3, 4)], "x2 bigint, y bigint"))
    assert cat.read_table("d.t").count() == 2
    with pytest.raises(ValueError, match="clustering_columns"):
        cat.drop_column("d", "t", "y")


def test_zorder_constant_column_degrades_gracefully(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "t", [("x", "bigint"), ("c", "bigint")])
    df = spark.createDataFrame([(i, 7) for i in range(500)], "x bigint, c bigint")
    cat.insert_into("d", "t", df)
    # constant column contributes no bits; the rewrite must still succeed
    cat.compact("d", "t", order_by=["x", "c"], strategy="zorder")
    assert cat.read_table("d.t").count() == 500


def test_write_clustering_zorder(cat, spark):
    """clustering.strategy='zorder': every COMMIT's files are Morton-ordered
    at write time — both dimensions prune without any compaction."""
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("x", "bigint"), ("y", "bigint")],
        options={
            "clustering.columns": "x,y",
            "clustering.strategy": "zorder",
            "clustering.partitions": "9",
        },
    )
    pts = [(x, y) for x in range(60) for y in range(60)]
    cat.insert_into("d", "t", spark.createDataFrame(pts, "x bigint, y bigint"))
    n_files = len(cat.scan_plan("d.t"))
    assert n_files > 1
    for col in ("x", "y"):
        pred = [ColumnDomain(col, ranges=[Range(low=5, high=12)])]
        assert len(cat.scan_plan("d.t", predicate=pred)) < n_files, col
    assert cat.read_table("d.t").count() == 3600


def test_write_clustering_zorder_validation(cat, spark):
    cat.create_database("d")
    with pytest.raises(ValueError, match=">= 2 clustering"):
        cat.create_table(
            "d",
            "t1",
            [("x", "bigint")],
            options={"clustering.columns": "x", "clustering.strategy": "zorder"},
        )
    with pytest.raises(ValueError, match="grid embedding"):
        cat.create_table(
            "d",
            "t2",
            [("x", "bigint"), ("s", "string")],
            options={"clustering.columns": "x,s", "clustering.strategy": "zorder"},
        )


def test_hilbert_curve_invariants():
    """The transform must BE a Hilbert curve: a bijection onto the grid whose
    consecutive positions are grid neighbors (one step, one dimension) — the
    locality property that makes the sort worth more than Morton."""
    import numpy as np

    from incubator_paimon_trino_spark.functions.hilbert import hilbert_index

    for k, bits in [(2, 1), (2, 3), (3, 2), (4, 2)]:
        side = 1 << bits
        pts = np.stack(np.meshgrid(*[np.arange(side)] * k, indexing="ij"), -1).reshape(-1, k)
        h = hilbert_index(pts, bits)
        assert sorted(h) == list(range(side**k)), (k, bits)
        order = np.argsort(h)
        steps = np.abs(np.diff(pts[order], axis=0)).sum(axis=1)
        assert (steps == 1).all(), (k, bits)
    # pinned 2x2 base case (Skilling orientation)
    base = {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}
    for xy, d in base.items():
        assert hilbert_index(np.array([xy]), 1)[0] == d
    with pytest.raises(ValueError):
        hilbert_index(np.array([[4, 0]]), 2)  # out of grid
    with pytest.raises(ValueError):
        hilbert_index(np.array([[0, 0]]), 40)  # 80 bits > 62


def test_hilbert_compaction_prunes_both_dimensions(cat, spark):
    n = _grid_table(cat, spark)
    cat.sql(
        "CALL sys.compact(table => 'd.t', order_strategy => 'hilbert', order_by => 'x,y')"
    )
    n_files = len(cat.scan_plan("d.t"))
    assert n_files > 1
    for col in ("x", "y"):
        pred = [ColumnDomain(col, ranges=[Range(low=5, high=12)])]
        assert len(cat.scan_plan("d.t", predicate=pred)) < n_files, col
    assert cat.read_table("d.t").count() == n
    box = [
        ColumnDomain("x", ranges=[Range(low=5, high=12)]),
        ColumnDomain("y", ranges=[Range(low=5, high=12)]),
    ]
    assert cat.read_table("d.t", predicate=box).count() == 8 * 8


def test_write_clustering_hilbert(cat, spark):
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("x", "bigint"), ("y", "bigint")],
        options={
            "clustering.columns": "x,y",
            "clustering.strategy": "hilbert",
            "clustering.partitions": "9",
        },
    )
    pts = [(x, y) for x in range(60) for y in range(60)]
    cat.insert_into("d", "t", spark.createDataFrame(pts, "x bigint, y bigint"))
    n_files = len(cat.scan_plan("d.t"))
    for col in ("x", "y"):
        pred = [ColumnDomain(col, ranges=[Range(low=5, high=12)])]
        assert len(cat.scan_plan("d.t", predicate=pred)) < n_files, col
    assert cat.read_table("d.t").count() == 3600


def test_zorder_pk_table_roundtrip(cat, spark):
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("k", "bigint"), ("x", "bigint"), ("y", "bigint")],
        primary_key=["k"],
    )
    df = spark.createDataFrame(
        [(i, i % 50, (i * 7) % 50) for i in range(1000)], "k bigint, x bigint, y bigint"
    )
    cat.insert_into("d", "t", df)
    upd = spark.createDataFrame([(5, 999, 999)], "k bigint, x bigint, y bigint")
    cat.insert_into("d", "t", upd)
    cat.compact("d", "t", order_by=["x", "y"], strategy="zorder")
    rows = cat.read_table("d.t").collect()
    assert len(rows) == 1000  # merged (latest k=5 wins), not duplicated
    assert next(r for r in rows if r.k == 5).x == 999
