"""Cross-feature interaction pins for the r9-continuation surfaces: the new
write-layout and retention features must compose with the streaming and
format paths that list files by path shape.

- dynamic bucket (bucket-N dirs) × manifest streaming source
- partition expiration × manifest streaming source (no-changelog contract)
- container aggregates × the module-less AVRO fallback writer
- sequence groups × $audit raw view (merge stays read-side)
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: F401

from incubator_paimon_trino_spark.catalog import WarehouseCatalog
from incubator_paimon_trino_spark.streaming.changelog import (
    read_changelog_stream,
    run_to_completion,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _stream_rows(cat, name, cols=("_row_kind", "k", "v"), **kw):
    out = run_to_completion(
        read_changelog_stream(cat, name, source_mode="manifest", **kw),
        "ixq", output_mode="append",
    )
    return sorted(tuple(r[c] for c in cols) for r in out.collect())


def test_manifest_stream_over_dynamic_bucket_table(cat, spark):
    """bucket-N path layers are plain dirs: the manifest source's partition
    parsing (k=v only) must ignore them and stream the upsert history."""
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "bigint"), ("v", "string")], primary_key=["k"],
        options={"bucket": "-1", "dynamic_bucket_target_row_num": "2"},
    )
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"))
    cat.insert_into("d", "t", spark.createDataFrame([(2, "B")], "k bigint, v string"))
    rows = _stream_rows(cat, "d.t")
    assert ("I", 1, "a") in rows and ("I", 2, "b") in rows
    assert ("I", 2, "B") in rows  # the upsert commit streamed too


def test_manifest_stream_emits_nothing_for_partition_expiration(cat, spark):
    """Partition expiration adds no files — the stream must emit zero rows
    for that commit and keep running past it (Paimon's no-changelog
    contract for expiration)."""
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "bigint"), ("v", "string"), ("p", "int")],
        partitioned_by=["p"],
    )
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, "a", 1990), (2, "b", 2020)], "k bigint, v string, p int"))
    cat.expire_partitions("d", "t", older_than="2000")
    cat.insert_into("d", "t", spark.createDataFrame(
        [(3, "c", 2021)], "k bigint, v string, p int"))
    rows = _stream_rows(cat, "d.t", cols=("k", "p"))  # append tables stream raw rows
    # both original rows (pre-expiration commit) + the post-expiration one;
    # the expiration commit itself contributed nothing
    assert rows == [(1, 1990), (2, 2020), (3, 2021)]


def test_collect_aggregate_on_avro_fallback_table(cat, spark):
    """Container-typed aggregation columns survive the module-less avro OCF
    writer (arrays/maps encode per spark-avro's mapping)."""
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("vs", "array<int>"), ("m", "map<string,int>")],
        primary_key=["k"],
        options={"merge_engine": "aggregation", "file_format": "AVRO",
                 "fields.vs.aggregate-function": "collect",
                 "fields.m.aggregate-function": "merge_map"},
    )
    ddl = "k int, vs array<int>, m map<string,int>"
    cat.insert_into("d", "t", spark.createDataFrame([(1, [1, 2], {"a": 1})], ddl))
    cat.insert_into("d", "t", spark.createDataFrame([(1, [3], {"a": 9, "b": 2})], ddl))
    r = cat.read_table("d.t").collect()[0]
    assert r.vs == [1, 2, 3]
    assert r.m == {"a": 9, "b": 2}


def test_sequence_group_audit_view_keeps_raw_rows(cat, spark):
    """Sequence-group merging is read-side only: the raw system-column view
    still shows every changelog row, including the -D the merge retracts."""
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "int"), ("g", "bigint"), ("a", "int")],
        primary_key=["k"],
        options={"merge_engine": "partial-update", "fields.g.sequence-group": "a"},
    )
    ddl = "k int, g bigint, a int"
    cat.insert_into("d", "t", spark.createDataFrame([(1, 10, 5)], ddl))
    cat.insert_into("d", "t", spark.createDataFrame([(1, 11, None)], ddl), row_kind="D")
    raw = cat.read_table("d.t", with_system_columns=True)
    kinds = sorted(r._row_kind for r in raw.collect())
    assert kinds == ["D", "I"]
    merged = cat.read_table("d.t").collect()
    assert [(r.k, r.g, r.a) for r in merged] == [(1, None, None)]  # retracted, key kept


def test_cross_partition_upsert_merges_globally(cat, spark):
    """A key that MOVES partition between commits (cross-partition upsert):
    merge-on-read groups by PK across partitions, so the newer partition's
    row wins and the old partition's version never resurrects — with
    dynamic buckets, the key's bucket assignment also stays put."""
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "bigint"), ("v", "string"), ("p", "int")],
        primary_key=["k"], partitioned_by=["p"],
        options={"bucket": "-1", "dynamic_bucket_target_row_num": "4"},
    )
    ddl = "k bigint, v string, p int"
    cat.insert_into("d", "t", spark.createDataFrame([(1, "old", 10), (2, "b", 10)], ddl))
    cat.insert_into("d", "t", spark.createDataFrame([(1, "new", 20)], ddl))  # k=1 moves
    got = {r.k: (r.v, r.p) for r in cat.read_table("d.t").collect()}
    assert got == {1: ("new", 20), 2: ("b", 10)}
    import glob as _glob
    import os as _os

    idx = spark.read.parquet(
        *_glob.glob(_os.path.join(cat._table_dir("d", "t"), "index", "dynamic-bucket", "*", "*.parquet"))
    )
    assert idx.count() == 2  # the moved key re-used its assignment, no dup
