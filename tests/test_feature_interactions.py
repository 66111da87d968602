"""Cross-feature composition pins for the r9 surfaces.

Each test wires two or more independently-tested features together and pins
the composed behavior — the failure mode these exist for is an interaction
regression that every single-feature suite stays green through (e.g. a DV
table whose bloom pruning drops a file the anti-join still needs, or a
stream that picks up index sidecars as data files).
"""

from __future__ import annotations

import glob
import os

import pytest

from incubator_paimon_trino_spark.catalog import WarehouseCatalog
from incubator_paimon_trino_spark.catalog import file_index as fi
from incubator_paimon_trino_spark.functions.predicates import ColumnDomain, Range


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def test_bloom_index_on_dv_table(cat, spark):
    """Bloom pruning on a deletion-vectors table's PK: the pruned scan and
    the DV anti-join compose — a point lookup opens one file AND still
    hides vector-deleted rows."""
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("k", "bigint"), ("v", "string")],
        primary_key=["k"],
        options={
            "deletion-vectors.enabled": "true",
            "file-index.bloom-filter.columns": "k",
        },
    )
    import random

    rng = random.Random(5)
    keys = list(range(600))
    rng.shuffle(keys)  # every file's k-range spans the domain → stats can't prune
    for c in range(3):
        chunk = keys[c * 200 : (c + 1) * 200]
        df = spark.createDataFrame([(k, f"v{k}") for k in chunk], "k bigint, v string")
        cat.insert_into("d", "t", df.coalesce(1))
    target_live, target_dead = keys[0], keys[1]
    from pyspark.sql import functions as F

    cat.delete_where("d", "t", F.col("k") == target_dead)
    tdir = cat._table_dir("d", "t")
    schema = cat._latest_schema(tdir)
    snap = cat._pin_snapshot(tdir, None, None, None)
    pred = [ColumnDomain("k", op="=", value=target_live)]
    pruned = cat._pruned_files(tdir, schema, snap, pred)
    assert len(pruned) < len(snap.files)  # bloom pruned under DV mode
    assert cat.read_table("d.t", predicate=pred).count() == 1
    # the vector-deleted key: its file survives pruning (the key IS in the
    # file) but the DV anti-join hides the row
    pred_dead = [ColumnDomain("k", op="=", value=target_dead)]
    assert cat.read_table("d.t", predicate=pred_dead).count() == 0


def test_zorder_compact_rebuilds_bloom_sidecars(cat, spark):
    """Curve compaction rewrites the live set; the rewritten files must get
    fresh sidecars so BOTH pruning rungs (tight min/max boxes + bloom) work
    on the new layout."""
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("x", "bigint"), ("y", "bigint"), ("uid", "string")],
        options={
            "file-index.bloom-filter.columns": "uid",
            "file-index.bloom-filter.items": "20000",
            "clustering_partitions": "6",
        },
    )
    import hashlib

    pts = [
        (x, y, hashlib.md5(f"{x},{y}".encode()).hexdigest()) for x in range(40) for y in range(40)
    ]
    df = spark.createDataFrame(pts, "x bigint, y bigint, uid string")
    for r in range(3):
        cat.insert_into("d", "t", df.filter((df.x + df.y) % 3 == r))
    cat.compact("d", "t", order_by=["x", "y"], strategy="zorder")
    cat.expire_snapshots("d", "t", keep_last=1)
    tdir = cat._table_dir("d", "t")
    snap = cat._pin_snapshot(tdir, None, None, None)
    # every live (compacted) file has a sidecar
    for e in snap.files:
        assert os.path.exists(os.path.join(tdir, e["path"]) + fi.SUFFIX), e["path"]
    n_files = len(snap.files)
    # rung 1: zorder boxes prune a single-dimension range
    predy = [ColumnDomain("y", ranges=[Range(low=3, high=8)])]
    assert len(cat.scan_plan("d.t", predicate=predy)) < n_files
    # rung 2: bloom prunes a point lookup on the md5 column
    target = pts[17][2]
    pred_uid = [ColumnDomain("uid", op="=", value=target)]
    assert len(cat.scan_plan("d.t", predicate=pred_uid)) < n_files
    rows = cat.read_table("d.t", predicate=pred_uid).collect()
    assert [(r.x, r.y) for r in rows] == [(pts[17][0], pts[17][1])]


def test_file_tail_stream_ignores_sidecars(cat, spark, tmp_path):
    """The changelog file tail globs *.parquet under data/ — colocated
    .fidx sidecars must never be picked up as data files."""
    import tempfile

    from incubator_paimon_trino_spark.streaming.changelog import read_changelog_stream

    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("k", "bigint"), ("v", "string")],
        primary_key=["k"],
        options={"file-index.bloom-filter.columns": "k"},
    )
    cat.insert_into("d", "t", spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"))
    tdir = cat._table_dir("d", "t")
    assert glob.glob(os.path.join(tdir, "data", "**", "*" + fi.SUFFIX), recursive=True)
    seen = []
    stream = read_changelog_stream(cat, "d.t")
    q = (
        stream.writeStream.foreachBatch(lambda df, _id: seen.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert {(r.k, r.v) for r in seen} == {(1, "a"), (2, "b")}


def test_time_travel_prunes_with_old_sidecars(cat, spark):
    """FOR VERSION AS OF composes with index pruning: an old snapshot's
    files keep their sidecars until expired, so historical point lookups
    skip files too — and a version pinned BEFORE a value existed returns
    nothing."""
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("id", "bigint"), ("uid", "string")],
        options={"file-index.bloom-filter.columns": "uid"},
    )
    import random

    rng = random.Random(3)
    vals = [f"u{i:04d}" for i in range(300)]
    rng.shuffle(vals)
    for c in range(3):
        df = spark.createDataFrame(
            list(enumerate(vals[c * 100 : (c + 1) * 100])), "id bigint, uid string"
        )
        cat.insert_into("d", "t", df.coalesce(1))
    late_val = vals[250]  # lives only in commit 3
    pred = [ColumnDomain("uid", op="=", value=late_val)]
    assert cat.read_table("d.t", predicate=pred, version_as_of=2).count() == 0
    assert cat.read_table("d.t", predicate=pred, version_as_of=3).count() == 1
    early_val = vals[50]  # commit 1: present at every version
    pred_e = [ColumnDomain("uid", op="=", value=early_val)]
    tdir = cat._table_dir("d", "t")
    schema = cat._latest_schema(tdir)
    snap_v2 = cat._pin_snapshot(tdir, 2, None, None)
    pruned = cat._pruned_files(tdir, schema, snap_v2, pred_e)
    assert len(pruned) == 1 and len(snap_v2.files) == 2  # pruning at v2 too
    assert cat.read_table("d.t", predicate=pred_e, version_as_of=2).count() == 1


def test_branch_probes_parent_sidecars(cat, spark):
    """A branch inherits the parent's data files by relative path — the
    colocated sidecars resolve through the same paths, so index pruning
    works on branch reads without copying anything."""
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("id", "bigint"), ("uid", "string")],
        options={"file-index.bloom-filter.columns": "uid"},
    )
    import random

    rng = random.Random(9)
    vals = [f"u{i:04d}" for i in range(200)]
    rng.shuffle(vals)
    for c in range(2):
        df = spark.createDataFrame(
            list(enumerate(vals[c * 100 : (c + 1) * 100])), "id bigint, uid string"
        )
        cat.insert_into("d", "t", df.coalesce(1))
    cat.create_tag("d", "t", "seed", 2)
    cat.create_branch("d", "t", "dev", from_tag="seed")
    target = vals[10]
    pred = [ColumnDomain("uid", op="=", value=target)]
    tdir = cat._table_dir("d", "t$branch_dev")
    schema = cat._latest_schema(tdir)
    snap = cat._pin_snapshot(tdir, None, None, None)
    pruned = cat._pruned_files(tdir, schema, snap, pred)
    assert len(snap.files) == 2 and len(pruned) == 1  # parent sidecar probed
    assert cat.read_table("d.t$branch_dev", predicate=pred).count() == 1


def test_rowkind_cdc_through_changelog_stream(cat, spark, tmp_path):
    """rowkind.field writes produce a changelog the streaming reader
    replays: inserts as +I rows, the -D commit as a delete row."""
    from incubator_paimon_trino_spark.streaming.changelog import read_changelog_stream

    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("k", "bigint"), ("op", "string")],
        primary_key=["k"],
        options={"rowkind.field": "op"},
    )
    cat.insert_into(
        "d", "t", spark.createDataFrame([(1, "+I"), (2, "+I")], "k bigint, op string")
    )
    cat.insert_into("d", "t", spark.createDataFrame([(1, "-D")], "k bigint, op string"))
    seen = []
    stream = read_changelog_stream(cat, "d.t")
    q = (
        stream.writeStream.foreachBatch(lambda df, _id: seen.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kinds = {(r.k, r._row_kind) for r in seen}
    assert (1, "I") in kinds and (2, "I") in kinds and (1, "D") in kinds
    assert cat.read_table("d.t").count() == 1  # merged: key 1 deleted
