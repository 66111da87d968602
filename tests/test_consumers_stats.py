"""Consumer progress tracking ($consumers, retention pinning, resumable
changelog reads) and ANALYZE-backed statistics ($statistics, CBO broadcast
decision) — executable parity beyond the reference, which stores streaming
options without executing them (``TrinoTableOptionUtils.java:94-107``) and
provides no statistics to its engine (``TrinoMetadataBase.java:132-136``).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _mk(cat, spark, n_commits=4):
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "t", [("k", "int"), ("v", "string")], primary_key=["k"])
    for i in range(1, n_commits + 1):
        cat.insert_into("d", "t", spark.createDataFrame([(i, f"v{i}")], "k int, v string"))


def test_consumer_progress_roundtrip(cat, spark):
    _mk(cat, spark)
    assert cat.consumer_progress("d", "t", "job1") is None
    cat.advance_consumer("d", "t", "job1", 3)
    assert cat.consumer_progress("d", "t", "job1") == 3
    # forward is fine, backward needs reset_consumer
    cat.advance_consumer("d", "t", "job1", 4)
    with pytest.raises(ValueError, match="backward"):
        cat.advance_consumer("d", "t", "job1", 2)
    cat.reset_consumer("d", "t", "job1", 2)
    assert cat.consumer_progress("d", "t", "job1") == 2
    # bad ids / positions are rejected
    with pytest.raises(ValueError, match="consumer_id"):
        cat.advance_consumer("d", "t", "../escape", 1)
    with pytest.raises(ValueError, match=">= 1"):
        cat.advance_consumer("d", "t", "job1", 0)
    # deleting an unknown consumer is loud
    with pytest.raises(ValueError, match="no consumer"):
        cat.reset_consumer("d", "t", "ghost")


def test_consumers_system_table_and_procedure(cat, spark):
    _mk(cat, spark)
    cat.advance_consumer("d", "t", "a", 2)
    cat.advance_consumer("d", "t", "b", 4)
    rows = {
        (r.consumer_id, r.next_snapshot_id)
        for r in cat.read_table("d.t$consumers").collect()
    }
    assert rows == {("a", 2), ("b", 4)}
    # CALL sys.reset_consumer: reset, then delete
    out = cat.sql(
        "CALL sys.reset_consumer(table => 'd.t', consumer_id => 'a', next_snapshot_id => 3)"
    ).collect()
    assert "reset" in out[0].result
    assert cat.consumer_progress("d", "t", "a") == 3
    cat.sql("CALL sys.reset_consumer(table => 'd.t', consumer_id => 'a')")
    assert cat.consumer_progress("d", "t", "a") is None
    assert {r.consumer_id for r in cat.read_table("d.t$consumers").collect()} == {"b"}


def test_consumer_pins_snapshot_retention(cat, spark):
    """expire_snapshots must keep every snapshot at or above the smallest
    consumer position AND its diff baseline (next-1) — the Paimon consumer
    contract that makes resumable reads safe against expiry."""
    _mk(cat, spark)  # snapshots 1..4
    cat.advance_consumer("d", "t", "slow", 3)
    stats = cat.expire_snapshots("d", "t", keep_last=1)
    surviving = {r.snapshot_id for r in cat.snapshots("d", "t").collect()}
    # 2 survives as the diff baseline for 3; only 1 expires
    assert surviving == {2, 3, 4} and stats["expired_snapshots"] == 1
    # the consumer can still read its pending range
    pending = cat.table_changelog("d.t", consumer_id="slow", producer="lookup")
    assert {r._snapshot for r in pending.collect()} == {3, 4}
    # releasing the consumer releases retention
    cat.reset_consumer("d", "t", "slow")
    cat.expire_snapshots("d", "t", keep_last=1)
    assert {r.snapshot_id for r in cat.snapshots("d", "t").collect()} == {4}


def test_changelog_resumes_from_consumer(cat, spark):
    _mk(cat, spark)  # snapshots 1..4
    first = cat.table_changelog("d.t", consumer_id="c", producer="lookup")
    assert {r._snapshot for r in first.collect()} == {1, 2, 3, 4}  # bootstrap
    cat.advance_consumer("d", "t", "c", 3)  # consumed 1,2
    rest = cat.table_changelog("d.t", consumer_id="c", producer="lookup")
    assert {r._snapshot for r in rest.collect()} == {3, 4}
    # an explicit from_snapshot wins over the recorded position (manual replay)
    replay = cat.table_changelog("d.t", from_snapshot=3, consumer_id="c", producer="lookup")
    assert {r._snapshot for r in replay.collect()} == {4}


def test_streaming_consumer_position(cat, spark, tmp_path):
    """read_changelog_stream(consumer_id=...) resumes from the recorded next
    snapshot; explicit positions alongside a consumer are rejected."""
    from incubator_paimon_trino_spark.streaming.changelog import read_changelog_stream

    _mk(cat, spark)  # snapshots 1..4
    cat.advance_consumer("d", "t", "s1", 3)
    stream = read_changelog_stream(cat, "d.t", consumer_id="s1")
    q = (
        stream.writeStream.format("memory")
        .queryName("consumer_resume")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.k for r in spark.sql("SELECT k FROM consumer_resume").collect()}
    assert got == {3, 4}  # snapshots 1,2 already consumed
    with pytest.raises(ValueError, match="consumer"):
        read_changelog_stream(
            cat, "d.t", startup_mode="from-snapshot", scan_snapshot_id=1, consumer_id="s1"
        )


def test_consumer_concurrent_advance_max_wins(cat, spark):
    """Positions are monotone max-wins markers: a slower writer landing a
    lower position after a faster one cannot rewind the recorded progress
    (the r5 review's read-modify-write race), and superseded markers prune."""
    import os

    _mk(cat, spark)
    cat.advance_consumer("d", "t", "j", 2)
    cdir = os.path.join(cat._table_dir("d", "t"), "consumer", "j")
    # simulate the race: B's advance(3) lands while A (who read cur=2) still
    # intends 4 — A's later call must settle on max, and a stale direct
    # marker write of a LOWER position never rewinds the reported progress
    cat.advance_consumer("d", "t", "j", 3)
    cat.advance_consumer("d", "t", "j", 4)
    assert cat.consumer_progress("d", "t", "j") == 4
    with open(os.path.join(cdir, "pos-2.json"), "w") as fh:  # stale straggler
        fh.write("{}")
    assert cat.consumer_progress("d", "t", "j") == 4  # max wins, no rewind
    cat.advance_consumer("d", "t", "j", 5)  # prunes stragglers
    assert sorted(os.listdir(cdir)) == ["pos-5.json"]


def test_sink_advances_source_consumer(cat, spark, tmp_path):
    """write_stream_to_table(source=..., consumer_id=...) records the source
    position AFTER each durable sink commit (Paimon's checkpoint-advance),
    so a restarted pipeline resumes exactly past what it already shipped."""
    from incubator_paimon_trino_spark.streaming.changelog import (
        read_changelog_stream,
        write_stream_to_table,
    )

    _mk(cat, spark)  # d.t snapshots 1..4
    cat.create_table("d", "sink", [("k", "int"), ("v", "string")], primary_key=["k"])
    stream = read_changelog_stream(cat, "d.t", consumer_id="pipe")
    write_stream_to_table(
        stream, cat, "d", "sink", str(tmp_path / "ck1"),
        source=("d", "t"), consumer_id="pipe",
    )
    assert cat.consumer_progress("d", "t", "pipe") == 5  # consumed 1..4
    assert {r.k for r in cat.read_table("d.sink").collect()} == {1, 2, 3, 4}
    # new source commit; the restarted pipeline ships ONLY the new rows
    cat.insert_into("d", "t", spark.createDataFrame([(9, "v9")], "k int, v string"))
    stream2 = read_changelog_stream(cat, "d.t", consumer_id="pipe")
    write_stream_to_table(
        stream2, cat, "d", "sink", str(tmp_path / "ck2"),
        source=("d", "t"), consumer_id="pipe",
    )
    assert cat.consumer_progress("d", "t", "pipe") == 6
    assert {r.k for r in cat.read_table("d.sink").collect()} == {1, 2, 3, 4, 9}
    # a sequence_field source is rejected (its _seq is business time)
    cat.create_table(
        "d", "seqsrc", [("k", "int"), ("s", "bigint"), ("v", "string")],
        primary_key=["k"], options={"sequence_field": "s"},
    )
    with pytest.raises(ValueError, match="sequence_field"):
        write_stream_to_table(
            read_changelog_stream(cat, "d.seqsrc"), cat, "d", "sink",
            str(tmp_path / "ck3"), source=("d", "seqsrc"), consumer_id="p2",
        )


def test_analyze_complex_typed_columns(cat, spark):
    """ANALYZE on a table with map/array columns records null_count for the
    complex columns instead of crashing (maps are unorderable — min/NDV
    would throw DATATYPE_MISMATCH), keeping the table analyzable."""
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table(
        "d", "cx",
        [("k", "int"), ("tags", "map<string,int>"), ("xs", "array<int>")],
        primary_key=["k"],
    )
    cat.insert_into(
        "d", "cx",
        spark.createDataFrame(
            [(1, {"a": 1}, [1, 2]), (2, None, None)],
            "k int, tags map<string,int>, xs array<int>",
        ),
    )
    st = cat.sql("CALL sys.analyze(table => 'd.cx')").collect()
    assert "analyzed 2 rows" in st[0].result
    stored = cat.stats_of("d", "cx")
    assert stored["columns"]["tags"] == {"min": None, "max": None, "null_count": 1, "ndv": 0}
    assert stored["columns"]["k"]["ndv"] == 2
    rows = {r.column_name: r for r in cat.read_table("d.cx$statistics").collect()}
    assert rows["xs"].null_count == 1 and rows["xs"].min is None


def test_analyze_stats_and_statistics_table(cat, spark):
    _mk(cat, spark)
    st = cat.sql("ANALYZE TABLE d.t COMPUTE STATISTICS").collect()[0]
    assert st.row_count == 4 and st.snapshot_id == 4 and st.columns_analyzed == 2
    stored = cat.stats_of("d", "t")
    assert stored["total_size_bytes"] > 0
    assert stored["columns"]["k"]["ndv"] == 4
    rows = {r.column_name: r for r in cat.read_table("d.t$statistics").collect()}
    assert set(rows) == {"k", "v"}
    assert rows["k"].row_count == 4 and rows["k"].snapshot_id == 4
    assert rows["k"].min == "1" and rows["k"].max == "4"
    # CALL form works too
    out = cat.sql("CALL sys.analyze(table => 'd.t')").collect()
    assert "analyzed 4 rows" in out[0].result
    # un-analyzed table: empty statistics, never an error
    cat.create_table("d", "bare", [("x", "int")])
    assert cat.read_table("d.bare$statistics").count() == 0


def test_stats_drive_broadcast_decision(cat, spark):
    """The ANALYZE size feeds a compile-time broadcast hint: a small analyzed
    PK table (whose merge-on-read plan Spark cannot size-estimate) joins as
    BroadcastHashJoin through cat.sql; without stats the hint is absent."""
    _mk(cat, spark)
    cat.create_table("d", "facts", [("k", "int"), ("amt", "double")])
    cat.insert_into(
        "d", "facts",
        spark.createDataFrame([(i % 4 + 1, float(i)) for i in range(100)], "k int, amt double"),
    )
    q = "SELECT f.k, sum(f.amt) AS s FROM d.facts f JOIN d.t dim ON f.k = dim.k GROUP BY f.k"
    # no stats yet → no hint node in the analyzed plan
    plan_before = cat.sql(q)._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in plan_before.lower()
    cat.analyze("d", "t")
    after = cat.sql(q)
    plan_after = after._jdf.queryExecution().analyzed().toString()
    assert "broadcast" in plan_after.lower()
    phys = after._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys
    # and the result is unchanged
    assert {(r.k, r.s) for r in after.collect()} == {
        (k, float(sum(i for i in range(100) if i % 4 + 1 == k)))
        for k in (1, 2, 3, 4)
    }


def test_stale_stats_withhold_broadcast(cat, spark):
    """A table that has grown well past its analyzed size must NOT keep its
    broadcast hint (the staleness guard)."""
    cat.create_database("d", ignore_if_exists=True)
    cat.create_table("d", "g", [("k", "int"), ("v", "string")])
    cat.insert_into("d", "g", spark.createDataFrame([(1, "a")], "k int, v string"))
    cat.analyze("d", "g")
    small = cat.stats_of("d", "g")["total_size_bytes"]
    # grow the table far past 4x the analyzed size
    big = spark.createDataFrame(
        [(i, "x" * 2000) for i in range(2000)], "k int, v string"
    )
    for _ in range(2):
        cat.insert_into("d", "g", big)
    live = cat._latest_snapshot(cat._table_dir("d", "g"))
    assert sum(f["size_bytes"] for f in live.files) > 4 * small
    df = cat.sql("SELECT * FROM d.g")
    assert "broadcast" not in df._jdf.queryExecution().analyzed().toString().lower()


def test_consumers_tolerates_pruned_marker_race(cat, spark, monkeypatch):
    """A position marker deleted between listdir and read (concurrent
    prune/reset) still yields its position from the NAME — $consumers and
    expire_snapshots must not crash on FileNotFoundError."""
    _mk(cat, spark)
    cat.advance_consumer("d", "t", "job1", 3)
    from incubator_paimon_trino_spark.catalog import warehouse as wh

    def _gone(path):
        raise FileNotFoundError(path)

    monkeypatch.setattr(wh, "read_json", _gone)
    out = cat._consumers(cat._table_dir("d", "t"))
    assert out["job1"]["next_snapshot"] == 3  # the NAME carries the position
    # liveness falls back to the marker's mtime (r9: same-position advances
    # can only TOUCH the exclusive-create marker), so a fresh marker whose
    # metadata read raced reports as recently active — never as epoch-0
    # stale, which consumer.expiration-time would wrongly reap
    assert out["job1"]["updated_ms"] > 0


def test_consumer_progress_rejects_traversal_ids(cat, spark):
    """Read path validates consumer_id like the write path — an id such as
    '../snapshot' must not be joined into the filesystem path."""
    _mk(cat, spark)
    for bad in ("../snapshot", "a/b", "", ".hidden"):
        with pytest.raises(ValueError, match="invalid consumer_id"):
            cat.consumer_progress("d", "t", bad)


def test_consumer_expiration_releases_retention(cat, spark):
    """consumer.expiration-time (Paimon's consumer expiration): a consumer
    that has not advanced within the window is deleted at expire time and
    stops pinning retention — an abandoned checkpoint must not hold a
    table's history forever. Unparseable durations fail at DDL."""
    import time

    _mk(cat, spark)  # snapshots 1..4
    cat.advance_consumer("d", "t", "abandoned", 2)
    with pytest.raises(ValueError, match="duration"):
        cat.set_options("d", "t", {"consumer.expiration-time": "fortnight"})
    cat.set_options("d", "t", {"consumer.expiration-time": "50 ms"})
    # fresh consumer still pins (not yet stale)
    stats = cat.expire_snapshots("d", "t", keep_last=1)
    assert stats["expired_consumers"] == 0
    assert {r.snapshot_id for r in cat.snapshots("d", "t").collect()} >= {2, 3, 4}
    time.sleep(0.2)  # now stale
    stats = cat.expire_snapshots("d", "t", keep_last=1)
    assert stats["expired_consumers"] == 1
    surviving = {r.snapshot_id for r in cat.snapshots("d", "t").collect()}
    # set_options bumped the schema, not snapshots: latest data snapshot wins
    assert max(surviving) == 4 and len(surviving) == 1
    assert cat.read_table("d.t$consumers").count() == 0


def test_incremental_between_tags(cat, spark):
    """incremental-between-tags: tag names resolve to their pinned snapshot
    ids, and the tag-to-tag delta stays readable after the raw snapshots
    between the tags expire (tags pin their snapshot files)."""
    _mk(cat, spark)  # snapshots 1..4
    cat.create_tag("d", "t", "v1", 1)
    cat.create_tag("d", "t", "v3", 3)
    by_ids = {(r.k, r.v) for r in cat.read_incremental("d.t", 1, 3).collect()}
    by_tags = {(r.k, r.v) for r in cat.read_incremental("d.t", "v1", "v3").collect()}
    assert by_tags == by_ids == {(2, "v2"), (3, "v3")}
    with pytest.raises(ValueError, match="no tag"):
        cat.read_incremental("d.t", "v1", "nope")
    # expire everything untagged below the tip: the tag delta still reads
    cat.expire_snapshots("d", "t", keep_last=1)
    assert {(r.k, r.v) for r in cat.read_incremental("d.t", "v1", "v3").collect()} == by_ids
