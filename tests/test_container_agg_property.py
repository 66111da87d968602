"""Property tests: the container aggregates (collect / merge_map) and
partial-update sequence groups against pure-Python replay models — the same
model-based discipline as test_merge_property.py, over randomized commit
histories with deletes."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.operators.merge_on_read import merge_on_read

HYP = settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])

KEYS = st.integers(min_value=0, max_value=3)
ARR = st.one_of(st.none(), st.lists(st.integers(min_value=0, max_value=5), max_size=3))
MAP = st.one_of(
    st.none(),
    st.dictionaries(st.sampled_from(["a", "b", "c"]), st.integers(0, 9), max_size=3),
)


@st.composite
def histories(draw, val, kinds=("I", "I", "I", "D")):
    commits = []
    for _ in range(draw(st.integers(1, 4))):
        keys = draw(st.lists(KEYS, min_size=1, max_size=3, unique=True))
        commits.append([(k, draw(st.sampled_from(kinds)), draw(val)) for k in keys])
    return commits


def _df(spark, commits, vddl):
    rows = [
        (k, kind, v, seq)
        for seq, commit in enumerate(commits, start=1)
        for (k, kind, v) in commit
    ]
    return spark.createDataFrame(
        rows, f"k int, _row_kind string, v {vddl}, _seq bigint"
    ).select("k", "v", "_seq", "_row_kind")


@given(commits=histories(ARR))
@HYP
def test_collect_matches_multiset_replay(spark, commits):
    """collect with retraction: order-replay — inserts append, a delete
    removes the FIRST occurrence of each of its elements from the state so
    far; keys with zero insert rows absent."""
    df = _df(spark, commits, "array<int>")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "collect"})
    got = {r.k: r.v for r in out.collect()}
    state: dict[int, list] = {}
    has_i: set[int] = set()
    for commit in commits:
        for k, kind, v in commit:
            if kind == "I":
                has_i.add(k)
                if v is not None:
                    state.setdefault(k, []).extend(v)
            elif v is not None:
                cur = state.get(k, [])
                for x in v:
                    if x in cur:
                        cur.remove(x)  # removes the first occurrence
    want = {k: state.get(k, []) for k in has_i}
    # the engine replays (ord, kind, values) events in changelog order —
    # exactly the model — so element ORDER must match too, not just multiset
    assert got == want


def test_collect_retract_before_insert_is_noop(spark):
    """Out-of-order CDC: a -D for an element that arrives BEFORE its +I must
    be a no-op (retract of an absent element), so the later insert survives —
    Paimon folds add/retract in sequence order. Regression for the
    remove-from-final-concatenation formulation, which deleted the later
    insert."""
    df = _df(spark, [[(0, "D", [2])], [(0, "I", [2])]], "array<int>")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "collect"})
    assert {r.k: r.v for r in out.collect()} == {0: [2]}


@given(commits=histories(MAP, kinds=("I",)))
@HYP
def test_merge_map_matches_dict_replay(spark, commits):
    df = _df(spark, commits, "map<string,int>")
    out = merge_on_read(df, ["k"], "aggregation", field_aggregates={"v": "merge_map"})
    got = {r.k: r.v for r in out.collect()}
    state: dict[int, dict] = {}
    seen: dict[int, bool] = {}
    for commit in commits:
        for k, kind, v in commit:
            seen[k] = True
            if v is not None:
                state.setdefault(k, {}).update(v)
    want = {k: state.get(k) for k in seen}  # all-null history → null map
    assert got == want


SG_VAL = st.one_of(st.none(), st.integers(0, 9))
SEQ = st.one_of(st.none(), st.integers(0, 5))


@st.composite
def sg_histories(draw):
    commits = []
    for _ in range(draw(st.integers(1, 4))):
        keys = draw(st.lists(KEYS, min_size=1, max_size=3, unique=True))
        commits.append(
            [
                (k, draw(st.sampled_from(["I", "I", "I", "D"])), draw(SEQ), draw(SG_VAL), draw(SG_VAL))
                for k in keys
            ]
        )
    return commits


@given(commits=sg_histories())
@HYP
def test_sequence_groups_match_replay_model(spark, commits):
    """One group (g → a) + one ungrouped column (u): replay in changelog
    order with Paimon's rules — non-null-seq inserts win the group on
    (seq, order) >=; deletes with (seq, order) >= current retract it; the
    key survives while any insert exists; u is last-non-null over inserts."""
    rows = [
        (k, kind, g, a, u, seq)
        for seq, commit in enumerate(commits, start=1)
        for (k, kind, g, a, u) in commit
    ]
    df = spark.createDataFrame(
        rows, "k int, _row_kind string, g bigint, a int, u int, _seq bigint"
    ).select("k", "g", "a", "u", "_seq", "_row_kind")
    out = merge_on_read(df, ["k"], "partial-update", sequence_groups={"g": ["a"]})
    got = {r.k: (r.g, r.a, r.u) for r in out.collect()}

    state: dict[int, dict] = {}
    for order, (k, kind, g, a, u) in enumerate(
        ((k, kind, g, a, u) for commit in commits for (k, kind, g, a, u) in commit), 1
    ):
        s = state.setdefault(k, {"win": None, "g": None, "a": None, "u": None, "has_i": False})
        key = None if g is None else (g, order)
        if kind == "I":
            s["has_i"] = True
            if key is not None and (s["win"] is None or key >= s["win"]):
                s["win"], s["g"], s["a"] = key, g, a
            if u is not None:
                s["u"] = u
        else:
            if key is not None and (s["win"] is None or key >= s["win"]):
                s["win"], s["g"], s["a"] = None, None, None
    want = {
        k: (s["g"], s["a"], s["u"]) for k, s in state.items() if s["has_i"]
    }
    assert got == want
