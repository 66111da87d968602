"""Streaming MATCH_RECOGNIZE (r11): CEP over Structured Streaming with a
WITHIN bound (operators/match_recognize.py::match_recognize_stream).

The property that makes this operator drivable by a SQL oracle — and safe
to run at all — is DETERMINISM UNDER MICRO-BATCH CHOPPING: rows buffer per
key until the watermark proves a match window complete, so the emitted
match set is identical whether the input arrives in one batch or many.
These tests pin exactly that, plus the WITHIN truncation semantics, the
event-time-timeout flush (matches emit with no new per-key data), and the
stream-side refusals. The registered streaming_pattern_within_funnel query
is value-hash-checked against its closed-form DuckDB oracle separately.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.operators.match_recognize import (
    match_recognize_stream,
)


def _mk_events(spark, tmp_path, files: list[list[tuple]]):
    """Write each row-list as its own parquet file (one file per
    micro-batch under maxFilesPerTrigger=1)."""
    d = tmp_path / "ev"
    d.mkdir(parents=True)
    for i, rows in enumerate(files):
        spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, event_type string, ts timestamp"
        ).coalesce(1).write.parquet(str(d / f"f{i}.parquet"))
    return str(d)


def _run_cep(spark, path, within="1 hour", max_files=None, name="cep_t"):
    reader = spark.readStream.schema(
        "user_id bigint, event_id bigint, event_type string, ts timestamp"
    )
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.option("recursiveFileLookup", "true").parquet(path)
    mr = match_recognize_stream(
        stream,
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        pattern="V C+ P",
        define={
            "V": "event_type = 'view'",
            "C": "event_type = 'click'",
            "P": "event_type = 'purchase'",
        },
        within=within,
    )
    q = (
        mr.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.user_id, r.start_event_id, r.event_id, r.classifier, r.match_row)
        for r in spark.table(name).collect()
    )


def _ts(minute):
    import datetime

    return datetime.datetime(2026, 1, 1, 12, 0) + datetime.timedelta(minutes=minute)


def test_multi_batch_equals_single_batch(spark, tmp_path):
    """The same events chopped into 3 files (interleaved across users, not
    time-ordered between files) produce the SAME matches under
    maxFilesPerTrigger=1 as in one batch — buffering + watermark
    finalization + the event-time-timeout flush all exercised."""
    rows = [
        # user 1: V C C P inside the hour → match
        (1, 10, "view", _ts(0)), (1, 11, "click", _ts(5)),
        (1, 12, "click", _ts(10)), (1, 13, "purchase", _ts(15)),
        # user 2: V C P with the purchase beyond 1h of the view → no match
        (2, 20, "view", _ts(0)), (2, 21, "click", _ts(30)),
        (2, 22, "purchase", _ts(70)),
        # user 1 again, later: another funnel → second match
        (1, 14, "view", _ts(120)), (1, 15, "click", _ts(125)),
        (1, 16, "purchase", _ts(130)),
        # sentinel far in the future so the watermark passes every window
        (9, 99, "signup", _ts(100000)),
    ]
    expected = [
        (1, 10, 10, "V", 1), (1, 10, 11, "C", 2), (1, 10, 12, "C", 3),
        (1, 10, 13, "P", 4),
        (1, 14, 14, "V", 1), (1, 14, 15, "C", 2), (1, 14, 16, "P", 3),
    ]
    single = _mk_events(spark, tmp_path / "s", [rows])
    got1 = _run_cep(spark, single, name="cep_single")
    assert got1 == expected
    chopped = _mk_events(
        spark, tmp_path / "m", [rows[0:3] + [rows[7]], rows[3:7], rows[8:]]
    )
    got2 = _run_cep(spark, chopped, max_files=1, name="cep_multi")
    assert got2 == expected  # identical under any chopping


def test_within_bound_slices_greedy_quantifier(spark, tmp_path):
    """A click run crossing the WITHIN boundary cannot be given back into a
    match (the purchase is outside the window): no partial/overlong match
    is emitted — Flink-CEP WITHIN semantics."""
    rows = [
        (1, 1, "view", _ts(0)),
        (1, 2, "click", _ts(20)),
        (1, 3, "click", _ts(40)),
        (1, 4, "click", _ts(55)),
        (1, 5, "purchase", _ts(65)),  # > 1h after the view
        (9, 99, "signup", _ts(100000)),
    ]
    path = _mk_events(spark, tmp_path, [rows])
    assert _run_cep(spark, path, name="cep_within") == []


def test_unfinalized_tail_is_held_back(spark, tmp_path):
    """A match whose window the watermark has not passed is NOT emitted —
    the determinism rule (it could still be contradicted by late data)."""
    rows = [
        (1, 1, "view", _ts(0)), (1, 2, "click", _ts(5)), (1, 3, "purchase", _ts(10)),
        # watermark (max ts, zero delay) lands INSIDE the view's 1h window
        (9, 99, "signup", _ts(30)),
    ]
    path = _mk_events(spark, tmp_path, [rows])
    assert _run_cep(spark, path, name="cep_tail") == []


def test_stream_refuses_navigation_and_validates(spark, tmp_path):
    path = _mk_events(spark, tmp_path, [[(1, 1, "view", _ts(0))]])
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, event_type string, ts timestamp"
    ).option("recursiveFileLookup", "true").parquet(path)
    with pytest.raises(ValueError, match="batch-only"):
        match_recognize_stream(
            stream, "user_id", "ts", "event_id", "A B",
            {"A": "true", "B": "value < PREV(value)"}, within="1 hour",
        )
    with pytest.raises(ValueError, match="positive duration"):
        match_recognize_stream(
            stream, "user_id", "ts", "event_id", "A",
            {"A": "true"}, within="0 seconds",
        )


def test_cep_over_lake_changelog_stream(spark, tmp_path):
    """Cross-feature composition (r11): streaming MATCH_RECOGNIZE over a
    LAKE TABLE's changelog stream — CDC in, CEP out. Events committed to an
    append lake table across two commits stream through
    read_changelog_stream into match_recognize_stream; the funnel emerges
    once the watermark (driven by a later-committed sentinel) passes its
    window."""
    from incubator_paimon_trino_spark.catalog import WarehouseCatalog
    from incubator_paimon_trino_spark.streaming.changelog import (
        read_changelog_stream,
    )

    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("s")
    cat.create_table(
        "s", "ev",
        [("user_id", "bigint"), ("event_id", "bigint"),
         ("event_type", "string"), ("ts", "timestamp(6)")],
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id bigint, event_id bigint, event_type string, ts timestamp"
    )
    cat.insert_into("s", "ev", mk([
        (1, 10, "view", _ts(0)), (1, 11, "click", _ts(5)),
    ]))
    cat.insert_into("s", "ev", mk([
        (1, 12, "purchase", _ts(12)),
        (9, 99, "signup", _ts(100000)),  # watermark driver
    ]))
    stream = read_changelog_stream(cat, "s.ev").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    mr = match_recognize_stream(
        stream,
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        pattern="V C+ P",
        define={
            "V": "event_type = 'view'",
            "C": "event_type = 'click'",
            "P": "event_type = 'purchase'",
        },
        within="1 hour",
    )
    q = (
        mr.writeStream.format("memory")
        .queryName("cep_lake")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.start_event_id, r.event_id, r.classifier)
        for r in spark.table("cep_lake").collect()
    )
    assert got == [
        (1, 10, 10, "V"), (1, 10, 11, "C"), (1, 10, 12, "P"),
    ]
