"""Partition expiration — Paimon's ``partition.expiration-time`` CoreOption
and ``CALL sys.expire_partitions`` (retention for date-partitioned tables;
CoreOptions are DDL-surfaced in the reference via
``common/TrinoTableOptionUtils.java:51-135``).

Contract pinned here: expiration is a METADATA-ONLY OVERWRITE-kind commit —
expired partitions' entries leave the live file list, no data file is read
or rewritten, bytes stay on disk (time travel works) until snapshot
expiration deletes them. Values strictly below the cutoff expire; nulls and
unparseable values never expire.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog


def _table(spark, tmp_path, options=None, part_type="int"):
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d",
        "t",
        [("k", "int"), ("v", "int"), ("p", part_type)],
        partitioned_by=["p"],
        options=options or {},
    )
    return cat


def test_explicit_older_than_drops_partitions_metadata_only(spark, tmp_path):
    cat = _table(spark, tmp_path)
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, 10, 1993), (2, 20, 1994), (3, 30, 1995), (4, 40, 1996)], "k int, v int, p int"))
    tdir = cat._table_dir("d", "t")
    files_before = {os.path.relpath(os.path.join(r, f), tdir)
                    for r, _, fs in os.walk(os.path.join(tdir, "data")) for f in fs
                    if not f.startswith(".")}
    stats = cat.expire_partitions("d", "t", older_than="1995")
    assert stats["expired_partitions"] == 2 and stats["expired_files"] == 2
    got = sorted((r.k, r.p) for r in cat.read_table("d.t").collect())
    assert got == [(3, 1995), (4, 1996)]
    # metadata-only: every data file byte is still on disk (time travel)
    files_after = {os.path.relpath(os.path.join(r, f), tdir)
                   for r, _, fs in os.walk(os.path.join(tdir, "data")) for f in fs
                   if not f.startswith(".")}
    assert files_after == files_before
    trav = sorted(r.p for r in cat.read_table("d.t", version_as_of=1).collect())
    assert trav == [1993, 1994, 1995, 1996]


def test_dry_run_and_noop_commit_nothing(spark, tmp_path):
    cat = _table(spark, tmp_path)
    cat.insert_into("d", "t", spark.createDataFrame([(1, 10, 1995)], "k int, v int, p int"))
    tip = cat._latest_snapshot(cat._table_dir("d", "t")).snapshot_id
    stats = cat.expire_partitions("d", "t", older_than="1999", dry_run=True)
    assert stats["expired_files"] == 1 and stats["snapshot"] is None
    stats = cat.expire_partitions("d", "t", older_than="1990")  # nothing older
    assert stats["expired_files"] == 0 and stats["snapshot"] is None
    assert cat._latest_snapshot(cat._table_dir("d", "t")).snapshot_id == tip


def test_string_partitions_compare_lexicographically(spark, tmp_path):
    cat = _table(spark, tmp_path, part_type="string")
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, 1, "2024-01-03"), (2, 2, "2024-02-01"), (3, 3, None)],
        "k int, v int, p string"))
    stats = cat.expire_partitions("d", "t", older_than="2024-02-01")
    assert stats["expired_partitions"] == 1
    # null partition value survives (conservative keep)
    got = sorted(((r.k, r.p) for r in cat.read_table("d.t").collect()), key=str)
    assert got == [(2, "2024-02-01"), (3, None)]


def test_auto_expiration_option_at_commit_time(spark, tmp_path):
    cat = _table(spark, tmp_path, options={"partition.expiration-time": "1 d"},
                 part_type="date")
    import datetime as dt

    old = dt.date(2000, 1, 1)
    today = dt.date.today()
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, 1, old), (2, 2, today)], "k int, v int, p date"))
    # the commit itself triggered expiration: the stale partition is gone
    got = [r.p for r in cat.read_table("d.t").collect()]
    assert got == [today]


def test_procedure_and_validation(spark, tmp_path):
    cat = _table(spark, tmp_path)
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, 1, 1990), (2, 2, 2020)], "k int, v int, p int"))
    res = cat.sql(
        "CALL sys.expire_partitions(table => 'd.t', older_than => '2000')"
    ).collect()
    assert "expired 1 partitions" in res[0][0]
    assert [r.p for r in cat.read_table("d.t").collect()] == [2020]

    with pytest.raises(ValueError, match="not a partition key"):
        cat.expire_partitions("d", "t", older_than="2000", partition_column="v")
    with pytest.raises(ValueError, match="older_than or expiration_time"):
        cat.expire_partitions("d", "t")
    cat.create_table("d", "flat", [("k", "int")])
    with pytest.raises(ValueError, match="partitioned table"):
        cat.expire_partitions("d", "flat", older_than="1")
    with pytest.raises(ValueError, match="partitioned table"):
        cat.create_table("d", "bad", [("k", "int")],
                         options={"partition.expiration-time": "1 d"})
    with pytest.raises(ValueError, match="unparseable duration"):
        cat.create_table("d", "bad2", [("k", "int"), ("p", "int")],
                         partitioned_by=["p"],
                         options={"partition.expiration-time": "soon"})


def test_snapshot_expiration_reclaims_expired_partition_bytes(spark, tmp_path):
    cat = _table(spark, tmp_path)
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, 1, 1990), (2, 2, 2020)], "k int, v int, p int"))
    cat.expire_partitions("d", "t", older_than="2000")
    tdir = cat._table_dir("d", "t")
    stats = cat.expire_snapshots("d", "t", keep_last=1)
    assert stats["deleted_files"] >= 1
    live = {f for _, _, fs in os.walk(os.path.join(tdir, "data")) for f in fs}
    # only the surviving partition's file remains on disk
    assert len(live) == 1
    assert [r.p for r in cat.read_table("d.t").collect()] == [2020]


def test_relative_expiration_on_integral_partition_column(spark, tmp_path):
    """expiration_time on an INT partition column: the cutoff follows the
    yyyyMMdd formatter convention (numeric order == date order) — a string
    cutoff would crash the int-vs-str compare."""
    cat = _table(spark, tmp_path)
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, 1, 19990101), (2, 2, 99990101)], "k int, v int, p int"))
    stats = cat.expire_partitions("d", "t", expiration_time="1 d")
    assert stats["expired_partitions"] == 1
    assert [r.p for r in cat.read_table("d.t").collect()] == [99990101]


def test_relative_expiration_skips_non_date_like_values(spark, tmp_path):
    """Relative expiration must NEVER compare raw non-date values against the
    wall-clock cutoff: int region ids 1..25 all sit numerically below
    yyyyMMdd-today, so the buggy raw compare expired the ENTIRE live set
    through the commit hook. Paimon skips values its timestamp-formatter
    cannot parse — conservative keep."""
    cat = _table(spark, tmp_path)
    cat.insert_into("d", "t", spark.createDataFrame(
        [(1, 1, 1), (2, 2, 25), (3, 3, 19990101)], "k int, v int, p int"))
    stats = cat.expire_partitions("d", "t", expiration_time="1 d")
    # only the genuinely date-like yyyyMMdd value expires
    assert stats["expired_partitions"] == 1
    assert sorted(r.p for r in cat.read_table("d.t").collect()) == [1, 25]
    # string columns: non-date text is kept too
    cat.create_table("d", "s", [("k", "int"), ("p", "string")], partitioned_by=["p"])
    cat.insert_into("d", "s", spark.createDataFrame(
        [(1, "EUROPE"), (2, "1999-01-01"), (3, "asia")], "k int, p string"))
    stats = cat.expire_partitions("d", "s", expiration_time="1 d")
    assert stats["expired_partitions"] == 1
    assert sorted(r.p for r in cat.read_table("d.s").collect()) == ["EUROPE", "asia"]


def test_expiration_option_rejects_undateable_partition_type(spark, tmp_path):
    """partition.expiration-time on a leading partition column that can never
    hold a date (double/boolean/binary) would be a silent no-op under the
    skip rule — reject at DDL instead."""
    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    with pytest.raises(ValueError, match="date-like"):
        cat.create_table("d", "bad", [("k", "int"), ("p", "double")],
                         partitioned_by=["p"],
                         options={"partition.expiration-time": "1 d"})
