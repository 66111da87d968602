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

import pytest
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
    """Delete-free changelogs match the earliest-insert model; any -D row
    raises at read time (Paimon throws on retraction for first-row — a
    silent drop would break the never-a-silent-no-op contract)."""
    df = _df(spark, commits)
    has_delete = any(kind == "D" for _, kind, _, _, _ in _flat(commits))
    if has_delete:
        with pytest.raises(Exception, match="first-row.*retraction"):
            merge_on_read(df, ["k"], "first-row").collect()
        return
    got = {r.k: (r.v, r.tag) for r in merge_on_read(df, ["k"], "first-row").collect()}
    want = {}
    for k, kind, v, tag, seq in _flat(commits):
        if k not in want:
            want[k] = (v, tag)
    assert got == want


@given(commits=changelogs())
@HYP
def test_partial_update_matches_model(spark, commits):
    """remove-record-on-delete semantics (Paimon's delete-accepting option
    for partial-update; the default engine REJECTS deletes — pinned below
    in test_partial_update_default_rejects_deletes)."""
    df = _df(spark, commits)
    got = {
        r.k: (r.v, r.tag)
        for r in merge_on_read(
            df, ["k"], "partial-update", remove_record_on_delete=True
        ).collect()
    }
    # replay model: a delete RESETS the key's accumulated row at its
    # position (Paimon's remove-record-on-delete) — later inserts rebuild
    # from scratch, pre-delete values never resurrect, delete rows
    # contribute no values
    state: dict = {}
    for k, kind, v, tag, seq in _flat(commits):
        if kind == "D":
            state.pop(k, None)
        else:
            cur = state.setdefault(k, [None, None])
            if v is not None:
                cur[0] = v
            if tag is not None:
                cur[1] = tag
    want = {k: (cur[0], cur[1]) for k, cur in state.items()}
    assert got == want


def test_partial_update_default_rejects_deletes(spark):
    """Paimon's partial-update delete contract: without ignore-delete /
    remove-record-on-delete / sequence groups, a -D row RAISES at merge
    time — never a silent drop (the engine has no rule for what a bare
    delete outranks)."""
    import pytest as _pytest

    df = _df(spark, [[(1, "I", 1, "a")], [(1, "D", None, None)]])
    with _pytest.raises(Exception, match="retraction"):
        merge_on_read(df, ["k"], "partial-update").collect()
    # delete-free histories keep merging fine without any option
    clean = _df(spark, [[(1, "I", 1, "a")], [(1, "I", None, "b")]])
    got = {r.k: (r.v, r.tag) for r in merge_on_read(clean, ["k"], "partial-update").collect()}
    assert got == {1: (1, "b")}


@given(commits=changelogs())
@HYP
def test_aggregation_matches_model(spark, commits):
    """Default functions with Paimon retraction semantics: numeric v → sum
    (a -D row SUBTRACTS its stored contribution), string tag → last_value
    (accepts retraction by ignoring the delete). Keys with only deletes
    drop."""
    df = _df(spark, commits)
    got = {r.k: (r.v, r.tag) for r in merge_on_read(df, ["k"], "aggregation").collect()}
    sums, tags, has_insert = {}, {}, set()
    for k, kind, v, tag, seq in _flat(commits):
        sums.setdefault(k, None)
        tags.setdefault(k, None)
        if v is not None:  # sum retracts: delete subtracts
            sums[k] = (sums[k] or 0) + (-v if kind == "D" else v)
        if kind != "D":
            tags[k] = tag  # last_value ignores deletes, null included
            has_insert.add(k)
    want = {k: (sums[k], tags[k]) for k in sums if k in has_insert}
    assert got == want


@given(commits=changelogs())
@HYP
def test_field_aggregates_match_model(spark, commits):
    """Per-field aggregate functions vs an independent model: v→min,
    tag→listagg (non-null, changelog order). min/listagg do not support
    retraction, so the property runs on the insert-only projection of the
    changelog (a delete reaching them raises — pinned separately in
    ``test_aggregation_retraction_semantics``)."""
    commits = [[r for r in commit if r[1] != "D"] for commit in commits]
    commits = [c for c in commits if c]
    if not commits:
        return
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
        mins.setdefault(k, None)
        lists.setdefault(k, [])
        if v is not None:
            mins[k] = v if mins[k] is None else min(mins[k], v)
        if tag is not None:
            lists[k].append(tag)
    want = {k: (mins[k], ",".join(lists[k])) for k in mins}
    assert got == want


def test_aggregation_retraction_semantics(spark):
    """Paimon's retraction contract, pinned deterministically: sum subtracts
    a delete's contribution; last_value ignores the delete; min RAISES
    ("does not support retraction"); an all-delete key drops; and an
    all-key-column PK table reads without crashing."""
    import pytest

    commits = [
        [(1, "I", 10, "a"), (2, "I", 5, "x"), (3, "I", 1, "z")],
        [(1, "I", 7, "b"), (2, "D", 2, "y"), (3, "D", 1, "z")],
        [(3, "D", 1, "z")],
    ]
    df = _df(spark, commits)
    got = {r.k: (r.v, r.tag) for r in merge_on_read(df, ["k"], "aggregation").collect()}
    # k=1: 10+7 / last tag b; k=2: 5-2 retracted, tag keeps x (delete ignored)
    # k=3: inserted once then double-deleted -> sum went negative but the key
    # still has an insert, so it stays with the retracted sum
    assert got == {1: (17, "b"), 2: (3, "x"), 3: (-1, "z")}

    only_deletes = [[(9, "I", 1, "a")], [(9, "D", 1, "a")], [(8, "D", 4, "q")]]
    got2 = {r.k for r in merge_on_read(_df(spark, only_deletes), ["k"], "aggregation").collect()}
    assert got2 == {9}  # key 8 never had an insert -> drops

    with pytest.raises(Exception, match="does not support retraction"):
        merge_on_read(
            df, ["k"], "aggregation", field_aggregates={"v": "min"}
        ).collect()

    # all-key-column table: no value columns to aggregate
    keys_only = _df(spark, commits).select("k", "_seq", "_row_kind")
    got3 = {r.k for r in merge_on_read(keys_only, ["k"], "aggregation").collect()}
    assert got3 == {1, 2, 3}
    # first-row refuses retraction even on an all-key table (Paimon throws)
    with pytest.raises(Exception, match="first-row.*retraction"):
        merge_on_read(keys_only, ["k"], "first-row").collect()
    # ...and the guard must survive column pruning: COUNT(*) and a
    # projection that drops the guarded columns still raise (a projection-
    # wrapped guard is eliminated by Catalyst — the r5 review finding)
    fr = merge_on_read(_df(spark, commits), ["k"], "first-row")
    with pytest.raises(Exception, match="first-row.*retraction"):
        fr.count()
    with pytest.raises(Exception, match="first-row.*retraction"):
        fr.select("v").collect()
    # same pruning-proofness for the strict-aggregate retraction raise
    strict = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "min"})
    with pytest.raises(Exception, match="does not support retraction"):
        strict.count()
    with pytest.raises(Exception, match="does not support retraction"):
        strict.select("k").collect()
    clean_keys = _df(spark, [[(1, "I", 1, "a"), (2, "I", 2, "b")]]).select(
        "k", "_seq", "_row_kind"
    )
    got4 = {r.k for r in merge_on_read(clean_keys, ["k"], "first-row").collect()}
    assert got4 == {1, 2}


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
