"""Paimon branches: independent snapshot chains over one table —
``CALL sys.create_branch / delete_branch / fast_forward``, the
``t$branch_<name>`` address, and the ``$branches`` system table. The
reference has no branch surface at all; parity target is Paimon's own
branch semantics (create-from-tag, branch read/write, fast-forward).
Branch creation is metadata-only: one rewritten manifest pointing at the
parent's immutable files — no data copies at any scale.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _mk(cat, spark):
    """Main table: snapshots 1..2, tag 'v1' at snapshot 1."""
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "t", [("k", "int"), ("v", "string")], primary_key=["k"])
    mk = lambda rows: spark.createDataFrame(rows, "k int, v string")  # noqa: E731
    cat.insert_into("d", "t", mk([(1, "a"), (2, "b")]))
    cat.create_tag("d", "t", "v1")
    cat.insert_into("d", "t", mk([(3, "c")]))
    return mk


def test_branch_create_read_write_isolated(cat, spark):
    mk = _mk(cat, spark)
    cat.create_branch("d", "t", "dev", from_tag="v1")
    # branch starts at the tagged snapshot (keys 1,2), main is at 1,2,3
    assert {r.k for r in cat.read_table("d.t$branch_dev").collect()} == {1, 2}
    assert {r.k for r in cat.read_table("d.t").collect()} == {1, 2, 3}
    # writes to the branch do not touch main, and vice versa
    cat.insert_into("d", "t$branch_dev", mk([(10, "x"), (1, "a2")]))
    assert {(r.k, r.v) for r in cat.read_table("d.t$branch_dev").collect()} == {
        (1, "a2"), (2, "b"), (10, "x"),
    }
    assert {r.k for r in cat.read_table("d.t").collect()} == {1, 2, 3}
    cat.insert_into("d", "t", mk([(4, "m")]))
    assert {r.k for r in cat.read_table("d.t$branch_dev").collect()} == {1, 2, 10}
    # composed system address: branch's own snapshot chain (seed=1, commit=2)
    ids = [r.snapshot_id for r in cat.read_table("d.t$branch_dev$snapshots").collect()]
    assert ids == [1, 2]
    # $branches + list_branches + SQL addressing
    rows = cat.read_table("d.t$branches").collect()
    assert [(r.branch_name, r.from_tag, r.from_snapshot) for r in rows] == [("dev", "v1", 1)]
    assert cat.list_branches("d", "t") == ["dev"]
    got = cat.sql("SELECT k FROM d.t$branch_dev WHERE k > 1 ORDER BY k").collect()
    assert [r.k for r in got] == [2, 10]


def test_branch_procedures_and_guards(cat, spark):
    _mk(cat, spark)
    out = cat.sql(
        "CALL sys.create_branch(table => 'd.t', branch => 'fix', tag => 'v1')"
    ).collect()
    assert "created" in out[0].result
    # seed tag is pinned while the branch lives
    with pytest.raises(ValueError, match="seeds branch"):
        cat.delete_tag("d", "t", "v1")
    # rolling back TO the tagged snapshot keeps the tag (guard fires only
    # when the tag itself would be discarded — next test)
    cat.rollback_to("d", "t", 1)
    assert {r.k for r in cat.read_table("d.t$branch_fix").collect()} == {1, 2}


def test_rollback_guard_fires_only_when_tag_discarded(cat, spark):
    mk = _mk(cat, spark)
    cat.insert_into("d", "t", mk([(9, "z")]))  # snapshot 3
    cat.create_tag("d", "t", "v3", snapshot_id=3)
    cat.create_branch("d", "t", "late", from_tag="v3")
    with pytest.raises(ValueError, match="late"):
        cat.rollback_to("d", "t", 2)  # discards v3 -> seed of 'late'
    cat.delete_branch("d", "t", "late")
    cat.rollback_to("d", "t", 2)  # now fine
    assert {r.k for r in cat.read_table("d.t").collect()} == {1, 2, 3}


def test_branch_expire_never_deletes_parent_files(cat, spark):
    mk = _mk(cat, spark)
    cat.create_branch("d", "t", "dev", from_tag="v1")
    cat.insert_into("d", "t$branch_dev", mk([(10, "x")]))
    cat.insert_into("d", "t$branch_dev", mk([(11, "y")]))
    # expire the branch down to its tip: inherited ../../data files survive
    cat.expire_snapshots("d", "t$branch_dev", keep_last=1)
    assert {r.k for r in cat.read_table("d.t$branch_dev").collect()} == {1, 2, 10, 11}
    assert {r.k for r in cat.read_table("d.t").collect()} == {1, 2, 3}


def test_fast_forward_replaces_diverged_main(cat, spark):
    mk = _mk(cat, spark)  # main: 1..2 (tag v1 at 1); main has diverged commit 2
    cat.create_branch("d", "t", "fix", from_tag="v1")
    cat.insert_into("d", "t$branch_fix", mk([(7, "ff"), (2, "b2")]))  # branch snap 2
    tip = cat.fast_forward("d", "t", "fix")
    assert tip == 2
    # main now shows the branch's history: key 3 (diverged commit) is gone,
    # branch's upsert of 2 and insert of 7 are in
    assert {(r.k, r.v) for r in cat.read_table("d.t").collect()} == {
        (1, "a"), (2, "b2"), (7, "ff"),
    }
    # time travel across the graft point works
    assert {r.k for r in cat.read_table("d.t", version_as_of=1).collect()} == {1, 2}
    # the branch's files are now part of main history: deletion is refused
    with pytest.raises(ValueError, match="fast-forwarded"):
        cat.delete_branch("d", "t", "fix")
    # main can continue committing past the graft
    cat.insert_into("d", "t", mk([(8, "post")]))
    assert {r.k for r in cat.read_table("d.t").collect()} == {1, 2, 7, 8}


def test_fast_forward_empty_branch_grows_from_scratch(cat, spark):
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "e", [("k", "int")])
    cat.create_branch("d", "e", "init")  # empty branch on empty main
    cat.insert_into("d", "e$branch_init", spark.createDataFrame([(1,), (2,)], "k int"))
    tip = cat.fast_forward("d", "e", "init")
    assert tip == 1
    assert {r.k for r in cat.read_table("d.e").collect()} == {1, 2}
    # empty-seeded branch cannot fast-forward over a now-nonempty main again
    cat.create_branch("d", "e", "init2")
    cat.insert_into("d", "e$branch_init2", spark.createDataFrame([(9,)], "k int"))
    with pytest.raises(ValueError, match="empty-seeded"):
        cat.fast_forward("d", "e", "init2")


def test_branch_on_partitioned_table(cat, spark):
    """Inherited (../../data) and branch-local files have different data
    roots — partition-directory inference must group per root."""
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table(
        "d", "p", [("k", "int"), ("pt", "string")], partitioned_by=["pt"]
    )
    mk = lambda rows: spark.createDataFrame(rows, "k int, pt string")  # noqa: E731
    cat.insert_into("d", "p", mk([(1, "a"), (2, "b")]))
    cat.create_tag("d", "p", "t1")
    cat.create_branch("d", "p", "dev", from_tag="t1")
    cat.insert_into("d", "p$branch_dev", mk([(3, "a"), (4, "c")]))
    got = {(r.k, r.pt) for r in cat.read_table("d.p$branch_dev").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "a"), (4, "c")}
    # partition predicate prunes across both roots
    a_only = cat.sql("SELECT k FROM d.p$branch_dev WHERE pt = 'a'").collect()
    assert {r.k for r in a_only} == {1, 3}


def test_sql_dml_on_branch_address(cat, spark):
    """INSERT/UPDATE/DELETE through cat.sql target a branch directly via the
    t$branch_<name> address (Paimon's SQL branch addressing); main never
    moves."""
    _mk(cat, spark)
    cat.create_branch("d", "t", "dev", from_tag="v1")
    cat.sql("INSERT INTO d.t$branch_dev VALUES (20, 'sqlrow')")
    cat.sql("UPDATE d.t$branch_dev SET v = 'patched' WHERE k = 1")
    cat.sql("DELETE FROM d.t$branch_dev WHERE k = 2")
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM d.t$branch_dev").collect()}
    assert got == {(1, "patched"), (20, "sqlrow")}
    assert {(r.k, r.v) for r in cat.read_table("d.t").collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }


def test_branch_name_and_table_name_validation(cat, spark):
    _mk(cat, spark)
    with pytest.raises(ValueError, match="invalid branch"):
        cat.create_branch("d", "t", "../evil")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_branch("d", "t", "b1") or cat.create_branch("d", "t", "b1")
    with pytest.raises(ValueError, match="reserved"):
        cat.create_table("d", "x$branch_y", [("k", "int")])
    with pytest.raises(ValueError, match="no tag"):
        cat.create_branch("d", "t", "b2", from_tag="ghost")
    with pytest.raises(ValueError, match="no branch"):
        cat.delete_branch("d", "t", "ghost")
    with pytest.raises(ValueError, match="no branch"):
        cat.fast_forward("d", "t", "ghost")


def test_branch_maintenance_after_fast_forward_keeps_main_files(cat, spark):
    """After fast_forward grafts branch data files into main's manifests,
    branch-side compact + expire / rollback must not delete them — main's
    live reads and time travel still reference those files (mirror of the
    delete_branch guard; the pin derives from main's actual manifests)."""
    mk = _mk(cat, spark)
    cat.create_branch("d", "t", "fix", from_tag="v1")
    cat.insert_into("d", "t$branch_fix", mk([(7, "ff")]))   # branch snap 2
    cat.insert_into("d", "t$branch_fix", mk([(9, "gg")]))   # branch snap 3
    cat.fast_forward("d", "t", "fix")
    main_before = {(r.k, r.v) for r in cat.read_table("d.t").collect()}
    assert main_before == {(1, "a"), (2, "b"), (7, "ff"), (9, "gg")}
    # compact the branch (rewrites its live set), then expire its history:
    # the pre-compaction branch files are exactly the ones main grafted
    cat.compact("d", "t$branch_fix")
    cat.expire_snapshots("d", "t$branch_fix", keep_last=1)
    assert {(r.k, r.v) for r in cat.read_table("d.t").collect()} == main_before
    # main time travel to the grafted snapshots still reads
    assert {r.k for r in cat.read_table("d.t", version_as_of=2).collect()} == {1, 2, 7}
    # rollback on the branch is equally guarded
    cat.insert_into("d", "t$branch_fix", mk([(11, "post")]))
    cat.rollback_to("d", "t$branch_fix", 4)  # drop the post-compact commit
    assert {(r.k, r.v) for r in cat.read_table("d.t").collect()} == main_before
    tdir = cat._table_dir("d", "t$branch_fix")
    assert cat._externally_pinned(tdir)  # grafted files pinned while referenced
    # the pin SELF-RELEASES once main's own history past the graft is gone
    # (the reason it derives from main's live manifests, not a sticky flag):
    # compact main into its own files, expire the grafted snapshots, and the
    # branch may then reclaim its data without touching main
    cat.compact("d", "t")
    cat.expire_snapshots("d", "t", keep_last=1)
    assert cat._externally_pinned(tdir) == set()
    cat.expire_snapshots("d", "t$branch_fix", keep_last=1)
    assert {(r.k, r.v) for r in cat.read_table("d.t").collect()} == main_before
