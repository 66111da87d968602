"""General MATCH_RECOGNIZE engine (operators/match_recognize.py).

Matcher semantics are tested pure-Python on bit-matrices (no Spark); one
E2E test runs the full applyInPandas plan; the registered funnel query is
value-hash-checked against DuckDB by tools/check.py separately.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.operators.match_recognize import (
    find_matches,
    match_recognize,
    parse_pattern,
    pattern_symbols,
)


def _m(pattern: str, seq: str, after_match: str = "skip_past_last"):
    """'AABC' row sequence: the letter at each row is its only true symbol."""
    ast = parse_pattern(pattern)
    flags = {s: [c == s for c in seq] for s in pattern_symbols(ast)}
    return find_matches(ast, flags, len(seq), after_match)


def test_parser_and_symbols():
    ast = parse_pattern("A B+ (C | D)? E*")
    assert pattern_symbols(ast) == ["A", "B", "C", "D", "E"]
    with pytest.raises(ValueError):
        parse_pattern("A (B")
    with pytest.raises(ValueError):
        parse_pattern("A $ B")
    with pytest.raises(ValueError):
        parse_pattern("")


def test_concatenation_and_plus_greedy():
    # V C+ P on VCCCP: one match consuming the full click run
    assert _m("A B+ C", "ABBBC") == [(0, ["A", "B", "B", "B", "C"])]
    # B+ alone is greedy: takes the whole run, then the next run
    assert _m("B+", "BBABB") == [(0, ["B", "B"]), (3, ["B", "B"])]


def test_alternation_preference_order():
    # first alternative preferred when both match
    got = _m("A (B | C)", "AB")
    assert got == [(0, ["A", "B"])]
    # B row fails first alt, matches second
    assert _m("A (C | B)", "AB") == [(0, ["A", "B"])]


def test_optional_and_star():
    assert _m("A B? C", "AC") == [(0, ["A", "C"])]
    assert _m("A B? C", "ABC") == [(0, ["A", "B", "C"])]
    assert _m("A B* C", "AC") == [(0, ["A", "C"])]
    assert _m("A B* C", "ABBBBC") == [(0, ["A", "B", "B", "B", "B", "C"])]


def test_backtracking_required():
    # greedy B+ must give back a row so the trailing B can match:
    # pattern A B+ B on ABB -> B+ takes one B, final B takes the last
    assert _m("A B+ B", "ABB") == [(0, ["A", "B", "B"])]


def test_leftmost_and_skip_modes():
    # overlapping candidates: AA with pattern A A
    assert _m("A A", "AAA") == [(0, ["A", "A"])]  # skip_past_last: 3rd A unpaired
    assert _m("A A", "AAA", "skip_to_next_row") == [(0, ["A", "A"]), (1, ["A", "A"])]


def test_no_empty_matches():
    # pattern that can match empty must not loop or emit empty matches
    assert _m("A*", "BBB") == []
    assert _m("A?", "BB") == []


def test_e2e_spark_plan(spark):
    rows = [
        # user 1: V C C P (one match), then lone V
        (1, 1, "view"), (1, 2, "click"), (1, 3, "click"), (1, 4, "purchase"), (1, 5, "view"),
        # user 2: V P (no click -> no match)
        (2, 1, "view"), (2, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id int, seq int, event_type string")
    out = match_recognize(
        df,
        partition_by=["user_id"],
        order_by=["seq"],
        pattern="V C+ P",
        define={
            "V": "event_type = 'view'",
            "C": "event_type = 'click'",
            "P": "event_type = 'purchase'",
        },
    ).collect()
    got = sorted((r.user_id, r.seq, r.match_no, r.classifier, r.match_row) for r in out)
    assert got == [
        (1, 1, 1, "V", 1),
        (1, 2, 1, "C", 2),
        (1, 3, 1, "C", 3),
        (1, 4, 1, "P", 4),
    ]
