"""Dynamic bucket mode — Paimon's ``bucket = -1`` for primary-key tables
(``'bucket' = '-1'`` with ``dynamic-bucket.target-row-num``; the bucket enum
the reference surfaces through DDL properties,
``common/TrinoTableOptionUtils.java:51-135``).

Contract pinned here: each key gets a STABLE bucket from the maintained
``index/dynamic-bucket`` parquet index; new keys fill buckets sequentially to
at most target-row-num keys per bucket (bucket count grows with the table);
files land under Paimon's plain ``bucket-N`` directory layer which readers
never surface as a column; compaction preserves the layout.
"""

from __future__ import annotations

import glob
import os
import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog


def _cat(spark, tmp_path, **opts):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    options = {"bucket": "-1", "dynamic_bucket_target_row_num": "3", **opts}
    cat.create_table(
        "d", "t", [("k", "int"), ("v", "string")], primary_key=["k"], options=options
    )
    return cat


def _index(spark, cat):
    idx_dir = os.path.join(cat._table_dir("d", "t"), "index", "dynamic-bucket")
    files = glob.glob(os.path.join(idx_dir, "*", "*.parquet"))
    return {r.k: r._bucket for r in spark.read.parquet(*files).collect()}


def _file_buckets(cat):
    tdir = cat._table_dir("d", "t")
    snap = cat._latest_snapshot(tdir)
    out = {}
    for e in snap.files:
        m = re.search(r"(?:^|/)bucket-(\d+)/", e["path"].replace("\\", "/"))
        assert m, f"file outside a bucket dir: {e['path']}"
        out.setdefault(int(m.group(1)), []).append(e["path"])
        assert e.get("bucket") == int(m.group(1)) and e.get("bucket_n") == -1
    return out


def test_new_keys_fill_buckets_to_target(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    rows = [(i, f"v{i}") for i in range(7)]
    cat.insert_into("d", "t", spark.createDataFrame(rows, "k int, v string"))
    idx = _index(spark, cat)
    assert len(idx) == 7
    per_bucket: dict[int, int] = {}
    for b in idx.values():
        per_bucket[b] = per_bucket.get(b, 0) + 1
    assert set(per_bucket) == {0, 1, 2}  # ceil(7/3) buckets, filled in order
    assert all(n <= 3 for n in per_bucket.values())
    assert sorted(_file_buckets(cat)) == [0, 1, 2]
    got = {(r.k, r.v) for r in cat.read_table("d.t").collect()}
    assert got == set(rows)
    assert "_bucket" not in cat.read_table("d.t").columns


def test_existing_keys_keep_their_bucket(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.insert_into("d", "t", spark.createDataFrame(
        [(i, "old") for i in range(5)], "k int, v string"))
    before = _index(spark, cat)
    # update 3 existing keys, add 4 new ones
    cat.insert_into("d", "t", spark.createDataFrame(
        [(0, "new"), (2, "new"), (4, "new"), (10, "n"), (11, "n"), (12, "n"), (13, "n")],
        "k int, v string"))
    after = _index(spark, cat)
    for k, b in before.items():
        assert after[k] == b, f"key {k} moved bucket {b} -> {after[k]}"
    assert len(after) == 9
    per_bucket: dict[int, int] = {}
    for b in after.values():
        per_bucket[b] = per_bucket.get(b, 0) + 1
    assert all(n <= 3 for n in per_bucket.values())
    got = {r.k: r.v for r in cat.read_table("d.t").collect()}
    assert got[0] == "new" and got[1] == "old" and got[13] == "n"


def test_compaction_preserves_bucket_layout(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for c in range(3):
        cat.insert_into("d", "t", spark.createDataFrame(
            [(i, f"c{c}") for i in range(6)], "k int, v string"))
    idx_before = _index(spark, cat)
    cat.compact("d", "t")
    assert _index(spark, cat) == idx_before  # compaction assigns nothing new
    fb = _file_buckets(cat)
    assert sorted(fb) == [0, 1]  # 6 keys, target 3
    got = {r.k: r.v for r in cat.read_table("d.t").collect()}
    assert got == {i: "c2" for i in range(6)}


def test_point_lookup_still_correct_no_hash_pruning(spark, tmp_path):
    from incubator_paimon_trino_spark.functions.predicates import ColumnDomain

    cat = _cat(spark, tmp_path)
    cat.insert_into("d", "t", spark.createDataFrame(
        [(i, f"v{i}") for i in range(9)], "k int, v string"))
    pred = [ColumnDomain("k", op="=", value=4)]
    got = cat.read_table("d.t", predicate=pred).collect()
    assert [(r.k, r.v) for r in got] == [(4, "v4")]
    # dynamic buckets are index-assigned, NOT hash-derivable: the hash
    # pruner must keep every file rather than guess (min/max stats still
    # prune; scan_plan result only drops files via stats here)
    plan = cat.scan_plan("d.t", predicate=pred)
    for e in plan:
        assert e.get("bucket_n", 0) <= 0


def test_validation(spark, tmp_path):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cols = [("k", "int"), ("v", "string")]
    with pytest.raises(ValueError, match="primary-key"):
        cat.create_table("d", "a", cols, options={"bucket": "-1"})
    with pytest.raises(ValueError, match="bucket-key must not be set"):
        cat.create_table("d", "b", cols, primary_key=["k"],
                         options={"bucket": "-1", "bucket_key": "v"})
    with pytest.raises(ValueError, match="PARQUET or ORC"):
        cat.create_table("d", "c", cols, primary_key=["k"],
                         options={"bucket": "-1", "file_format": "AVRO"})
    with pytest.raises(ValueError, match="positive integer"):
        cat.create_table("d", "e", cols, primary_key=["k"],
                         options={"bucket": "-1", "dynamic_bucket_target_row_num": "0"})
    with pytest.raises(ValueError, match="invalid bucket"):
        cat.create_table("d", "f", cols, primary_key=["k"], options={"bucket": "-5"})
