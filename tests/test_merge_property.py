"""Property-based validation of merge-on-read: every merge engine must match
an independent in-Python reference model on randomized changelogs.

The reference pins merge semantics with a single golden scenario
(``TestTrinoITCase.java:89-94 → :270-271``); hypothesis turns that into a
family of scenarios — multiple commits, interleaved deletes, null fields —
beyond the reference's own test strategy (SURVEY §5 notes it has no
property-based tests).

Keys are unique within a commit (matching the writer contract: within-commit
ordering among equal keys is writer-defined in Paimon too), so the model is
fully deterministic.
"""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.operators.merge_on_read import merge_on_read

KEYS = st.integers(min_value=0, max_value=4)
VAL = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
TAG = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
KIND = st.sampled_from(["I", "I", "I", "D"])  # deletes rarer


@st.composite
def changelogs(draw):
    n_commits = draw(st.integers(min_value=1, max_value=4))
    commits = []
    for _ in range(n_commits):
        keys = draw(st.lists(KEYS, min_size=1, max_size=4, unique=True))
        commits.append([(k, draw(KIND), draw(VAL), draw(TAG)) for k in keys])
    return commits


def _df(spark, commits):
    rows = [
        (k, kind, v, tag, seq)
        for seq, commit in enumerate(commits, start=1)
        for (k, kind, v, tag) in commit
    ]
    return spark.createDataFrame(
        rows, "k int, _row_kind string, v int, tag string, _seq bigint"
    ).select("k", "v", "tag", "_seq", "_row_kind")


def _flat(commits):
    for seq, commit in enumerate(commits, start=1):
        for (k, kind, v, tag) in commit:
            yield k, kind, v, tag, seq


HYP = settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(commits=changelogs())
@HYP
def test_deduplicate_matches_model(spark, commits):
    got = {r.k: (r.v, r.tag) for r in merge_on_read(_df(spark, commits), ["k"]).collect()}
    latest = {}
    for k, kind, v, tag, seq in _flat(commits):
        latest[k] = (kind, v, tag)
    want = {k: (v, tag) for k, (kind, v, tag) in latest.items() if kind != "D"}
    assert got == want


@given(commits=changelogs())
@HYP
def test_first_row_matches_model(spark, commits):
    df = _df(spark, commits)
    got = {r.k: (r.v, r.tag) for r in merge_on_read(df, ["k"], "first-row").collect()}
    want = {}
    for k, kind, v, tag, seq in _flat(commits):
        if kind != "D" and k not in want:
            want[k] = (v, tag)
    assert got == want


@given(commits=changelogs())
@HYP
def test_partial_update_matches_model(spark, commits):
    df = _df(spark, commits)
    got = {r.k: (r.v, r.tag) for r in merge_on_read(df, ["k"], "partial-update").collect()}
    last_kind, last_v, last_tag = {}, {}, {}
    for k, kind, v, tag, seq in _flat(commits):
        last_kind[k] = kind
        if v is not None:
            last_v[k] = v
        if tag is not None:
            last_tag[k] = tag
    want = {
        k: (last_v.get(k), last_tag.get(k))
        for k, kind in last_kind.items()
        if kind != "D"
    }
    assert got == want


@given(commits=changelogs())
@HYP
def test_aggregation_matches_model(spark, commits):
    df = _df(spark, commits)
    got = {r.k: (r.v, r.tag) for r in merge_on_read(df, ["k"], "aggregation").collect()}
    sums, tags = {}, {}
    for k, kind, v, tag, seq in _flat(commits):
        if kind == "D":
            continue
        if k not in sums:
            sums[k] = None
            tags[k] = None
        if v is not None:
            sums[k] = (sums[k] or 0) + v
        tags[k] = tag  # value at the latest insert, null included
    want = {k: (sums[k], tags[k]) for k in sums}
    assert got == want


@given(commits=changelogs())
@HYP
def test_field_aggregates_match_model(spark, commits):
    """Per-field aggregate functions vs an independent model: v→min,
    tag→listagg (non-null, changelog order)."""
    df = _df(spark, commits)
    got = {
        r.k: (r.v, r.tag)
        for r in merge_on_read(
            df, ["k"], "aggregation",
            field_aggregates={"v": "min", "tag": "listagg"},
        ).collect()
    }
    mins, lists = {}, {}
    for k, kind, v, tag, seq in _flat(commits):
        if kind == "D":
            continue
        mins.setdefault(k, None)
        lists.setdefault(k, [])
        if v is not None:
            mins[k] = v if mins[k] is None else min(mins[k], v)
        if tag is not None:
            lists[k].append(tag)
    want = {k: (mins[k], ",".join(lists[k])) for k in mins}
    assert got == want


@given(commits=changelogs())
@HYP
def test_sequence_field_equivalence(spark, commits):
    """Merging with _seq REASSIGNED from a value column must equal the model
    ordered by that column — i.e. the sequence_field contract: business
    order, not commit order. Ties on the sequence value keep deletes-last
    then writer order; we avoid ties by making the sequence unique per key."""
    from pyspark.sql import functions as F

    # a collision-free sequence that is NOT monotone with commit order
    # across keys (ties would make max_by writer-defined, like Paimon)
    df = _df(spark, commits).withColumn(
        "_seq", (F.lit(9) - F.col("_seq")) * F.lit(31) + F.col("k")
    )
    got = {r.k: (r.v, r.tag) for r in merge_on_read(df, ["k"]).collect()}
    best = {}
    for k, kind, v, tag, seq in _flat(commits):
        new_seq = (9 - seq) * 31 + k
        # model: max (new_seq, delete-last) wins — mirrors merge's
        # (_seq, D-after-I) order key; new_seq is unique per (k, commit)
        key = (new_seq, 1 if kind == "D" else 0)
        if k not in best or key > best[k][0]:
            best[k] = (key, kind, v, tag)
    want = {k: (v, tag) for k, (key, kind, v, tag) in best.items() if kind != "D"}
    assert got == want
