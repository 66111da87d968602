"""Event-time window + Structured Streaming registry queries (operators/events.py)."""

import pytest

import incubator_paimon_trino_spark.operators as ops
from incubator_paimon_trino_spark.operators.registry import ORACLES, QUERIES

ops.load_all()

SF_DIR = "/root/testdata/sf0.001"

NAMES = [
    "events_tumbling_window",
    "events_sliding_window",
    "streaming_tumbling_counts",
    "streaming_session_windows",
    "streaming_stateful_running_counts",
]


def test_registered_with_oracles():
    for n in NAMES:
        assert n in QUERIES, n
        assert n in ORACLES, n  # all five are deterministic → full oracle


def test_sliding_doubles_tumbling_mass(spark):
    tumb = QUERIES["events_tumbling_window"](spark, SF_DIR)
    slide = QUERIES["events_sliding_window"](spark, SF_DIR)
    n_tumb = tumb.agg({"n": "sum"}).collect()[0][0]
    n_slide = slide.agg({"n": "sum"}).collect()[0][0]
    assert n_tumb > 0
    # 1h window / 30min slide → every event counted exactly twice.
    assert n_slide == 2 * n_tumb


@pytest.mark.parametrize("name", ["streaming_stateful_running_counts"])
def test_streaming_stateful_matches_batch(spark, name):
    from incubator_paimon_trino_spark.sources import table

    got = {r.user_id: r.n_events for r in QUERIES[name](spark, SF_DIR).collect()}
    want = {
        r.user_id: r.n
        for r in table(spark, SF_DIR, "events").groupBy("user_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got == want
