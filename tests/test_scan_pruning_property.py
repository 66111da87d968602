"""Property-based soundness of manifest pruning (catalog/scan.py).

The invariant pruning must never break: **a file containing at least one row
that satisfies the pushed domain is never dropped** (dropping one would lose
result rows — the residual filter can't resurrect data it never reads).
Completeness (dropping every impossible file) is an optimization, not a
contract, so it is not asserted here.

Pure Python — file contents are lists, stats are computed the way
``collect_file_stats`` stores them, and a brute-force row evaluator plays
the role of the engine's residual filter. Hypothesis drives values,
null patterns, and every predicate form of the converter surface
(``TrinoFilterConverter.java:85-213``): =, <, <=, >, >=, <>, IN, IS [NOT]
NULL, OR-of-ranges with open/closed bounds, null_allowed.
"""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog.metadata import Field, TableSchema
from incubator_paimon_trino_spark.catalog.scan import prune_files
from incubator_paimon_trino_spark.functions.predicates import ColumnDomain, Range

_INTS = st.integers(min_value=-50, max_value=50)
_STRS = st.text(alphabet="abcxyz", min_size=0, max_size=6)
_DBLS = st.floats(min_value=-50, max_value=50, allow_nan=False, allow_infinity=False)


def _schema(ddl: str) -> TableSchema:
    return TableSchema(
        schema_id=0,
        fields=[Field(0, "k", ddl)],
        primary_key=[],
        partition_keys=[],
        options={},
        highest_field_id=0,
    )


def _entry(i: int, values: list) -> dict:
    """Manifest entry with the stats ``collect_file_stats`` would record."""
    present = [v for v in values if v is not None]
    nulls = len(values) - len(present)
    stats = {}
    if present:
        stats["0"] = {"min": min(present), "max": max(present), "nulls": nulls}
    elif values:  # provably all-null file
        stats["0"] = {"min": None, "max": None, "nulls": nulls}
    return {
        "path": f"data/c{i}/part-{i}.parquet",
        "schema_id": 0,
        "record_count": len(values),
        "stats": stats,
    }


def _row_matches(v, d: ColumnDomain) -> bool:
    """Brute-force evaluation of one domain on one value — SQL 3VL collapsed
    to 'does the row pass the filter' (UNKNOWN → False), mirroring
    ``ColumnDomain.to_column``'s conjunction + trailing OR IS NULL."""
    if v is None:
        core = d.is_null is True and d.op is None and d.in_values is None and not d.ranges
        return core or d.null_allowed
    ok = True
    if d.op is not None:
        ok &= {
            "=": v == d.value,
            "<": v < d.value,
            "<=": v <= d.value,
            ">": v > d.value,
            ">=": v >= d.value,
            "<>": v != d.value,
        }[d.op]
    if ok and d.in_values is not None:
        ok &= v in d.in_values
    if ok and d.ranges:

        def in_range(r: Range) -> bool:
            if r.low is not None and (v < r.low or (v == r.low and not r.low_inclusive)):
                return False
            if r.high is not None and (v > r.high or (v == r.high and not r.high_inclusive)):
                return False
            return True

        ok &= any(in_range(r) for r in d.ranges)
    if d.is_null is True:
        ok = False
    return ok


def _domains(values: st.SearchStrategy) -> st.SearchStrategy:
    ranges = st.builds(
        lambda lo, hi, li, hi_inc: Range(
            low=min(lo, hi), high=max(lo, hi), low_inclusive=li, high_inclusive=hi_inc
        ),
        values,
        values,
        st.booleans(),
        st.booleans(),
    )
    return st.builds(
        ColumnDomain,
        column=st.just("k"),
        op=st.sampled_from(["=", "<", "<=", ">", ">=", "<>", None]),
        value=values,
        in_values=st.one_of(st.none(), st.lists(values, min_size=1, max_size=4)),
        ranges=st.lists(ranges, max_size=3),
        is_null=st.sampled_from([None, True, False]),
        null_allowed=st.booleans(),
    ).filter(
        lambda d: d.op is not None or d.in_values is not None or d.ranges or d.is_null is not None
    )


def _files(values: st.SearchStrategy) -> st.SearchStrategy:
    one = st.lists(st.one_of(st.none(), values), min_size=0, max_size=8)
    return st.lists(one, min_size=1, max_size=5)


def _check_soundness(file_values: list[list], domain: ColumnDomain, ddl: str) -> None:
    entries = [_entry(i, vs) for i, vs in enumerate(file_values)]
    schema = _schema(ddl)
    kept = {e["path"] for e in prune_files(entries, [domain], schema, lambda sid: schema)}
    for e, vs in zip(entries, file_values):
        if any(_row_matches(v, domain) for v in vs):
            assert e["path"] in kept, (
                f"pruned a file with matching rows: values={vs} domain={domain} "
                f"stats={e['stats']}"
            )


@settings(max_examples=300, deadline=None)
@given(_files(_INTS), _domains(_INTS))
def test_prune_never_drops_matching_int_files(file_values, domain):
    _check_soundness(file_values, domain, "int")


@settings(max_examples=300, deadline=None)
@given(_files(_STRS), _domains(_STRS))
def test_prune_never_drops_matching_string_files(file_values, domain):
    _check_soundness(file_values, domain, "string")


@settings(max_examples=300, deadline=None)
@given(_files(_DBLS), _domains(_DBLS))
def test_prune_never_drops_matching_double_files(file_values, domain):
    _check_soundness(file_values, domain, "double")
