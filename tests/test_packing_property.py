"""Property-based validation of the packing arithmetic and the option/
procedure parsing — pure-Python models, no Spark session needed.

The packing queries compute sequence assignments with integer prefix-sum
arithmetic; these properties pin the invariants the window expressions must
satisfy for ANY document-length distribution (the Spark/oracle pair is then
checked value-exactly by tools/check.py on the fixture corpus).
"""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog.warehouse import _canonical_options

BUDGET = 512


def _assignments(token_counts: list[int]) -> list[tuple[int, int, int, int]]:
    """Python model of pack_concat_offsets: (start, first_seq, last_seq, n_seqs)."""
    out, start = [], 0
    for n in token_counts:
        first = start // BUDGET
        last = (start + n - 1) // BUDGET
        out.append((start, first, last, last - first + 1))
        start += n
    return out


@given(st.lists(st.integers(min_value=1, max_value=3 * BUDGET), min_size=1, max_size=60))
def test_pack_offsets_tile_and_span(tokens):
    """Intervals tile the stream; every budget-sized sequence that intersects
    a doc's interval is counted, and sequence indexes never go backwards."""
    asg = _assignments(tokens)
    total = sum(tokens)
    # tiling: starts are the exclusive prefix sums
    run = 0
    for n, (start, first, last, n_seqs) in zip(tokens, asg):
        assert start == run
        run += n
        # span: the doc touches exactly the sequences covering [start, start+n)
        assert first == start // BUDGET
        assert last == (start + n - 1) // BUDGET
        assert n_seqs >= 1
        # a doc of n tokens can touch at most ceil(n/BUDGET)+1 sequences
        assert n_seqs <= (n + BUDGET - 1) // BUDGET + 1
    # monotone: first_seq is nondecreasing in stream order
    firsts = [a[1] for a in asg]
    assert firsts == sorted(firsts)
    # total sequences = ceil(total/BUDGET) — last doc's last_seq + 1
    assert asg[-1][2] + 1 == (total + BUDGET - 1) // BUDGET


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["snapshot.num-retained.max", "snapshot_num_retained_max",
                             "merge-engine", "merge_engine", "bucket", "Bucket-Key"]),
            st.sampled_from(["2", "4", "deduplicate", "k"]),
        ),
        max_size=6,
    )
)
def test_canonical_options_idempotent_and_casefolds_keys(pairs):
    """Canonicalization is idempotent, and dotted/dashed/underscore spellings
    of the same plain option land on one key (or raise on conflicting values —
    never silently keep both spellings)."""
    try:
        once = _canonical_options(dict(pairs))
    except ValueError:
        return  # conflicting spellings: the accepted outcome for clashes
    twice = _canonical_options(once)
    assert twice == once
    for k in once:
        if not k.startswith("fields"):
            assert k == k.lower() and "." not in k and "-" not in k


@given(st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")), min_size=1, max_size=12))
def test_canonical_options_preserves_field_aggregate_case(col):
    """Every separator spelling of the structured key keeps the column name's
    exact case; hybrid spellings normalize onto the mangled key."""
    dotted = _canonical_options({f"fields.{col}.aggregate-function": "sum"})
    assert f"fields.{col}.aggregate-function" in dotted
    mangled = _canonical_options({f"fields_{col}_aggregate_function": "sum"})
    assert f"fields_{col}_aggregate_function" in mangled
    for hybrid in (
        f"fields.{col}.aggregate_function",
        f"fields_{col}_aggregate-function",
        f"fields_{col}.aggregate-function",
    ):
        out = _canonical_options({hybrid: "sum"})
        assert f"fields_{col}_aggregate_function" in out, hybrid


def _bfd_reference(items: list[tuple[int, int]], budget: int) -> dict[int, int]:
    """Independent sequential BFD replay: (doc_id, size) sorted by
    (size DESC, doc_id), each item into the open bin with the smallest
    remaining capacity that fits (tie → lowest bin id), else a new bin."""
    rem: list[int] = []
    out: dict[int, int] = {}
    for d, s in sorted(items, key=lambda t: (-t[1], t[0])):
        fits = [(r, idx) for idx, r in enumerate(rem) if r >= s]
        if fits:
            _, idx = min(fits)
            rem[idx] -= s
            out[d] = idx + 1
        else:
            rem.append(budget - s)
            out[d] = len(rem)
    return out


def test_bfd_matches_sequential_reference_and_respects_budget(spark):
    """Every bin stays within the token budget, bin ids are 1..n dense per
    group, and every assignment equals an independent sequential BFD replay
    of the same (size, id) items — engine-independent of the DuckDB oracle.
    (No 11/9·OPT bound is asserted: that guarantee is relative to OPT, and
    cheap lower bounds on OPT would make the assertion unsound.)"""
    from incubator_paimon_trino_spark.operators.packing import (
        SEQ_BUDGET,
        pack_best_fit_decreasing,
    )
    from tests.conftest import SF_SMOKE

    out = pack_best_fit_decreasing(spark, SF_SMOKE).collect()
    by_group = {}
    for r in out:
        by_group.setdefault((r.lang, r.pack_shard), []).append(r)
    assert by_group
    for (lang, shard), rows in by_group.items():
        fill = {}
        for r in rows:
            assert 1 <= r.n_tokens <= SEQ_BUDGET
            fill[r.bin_id] = fill.get(r.bin_id, 0) + r.n_tokens
        assert all(v <= SEQ_BUDGET for v in fill.values()), (lang, shard)
        assert sorted(fill) == list(range(1, len(fill) + 1))  # dense bin ids
        expected = _bfd_reference([(r.doc_id, r.n_tokens) for r in rows], SEQ_BUDGET)
        assert {r.doc_id: r.bin_id for r in rows} == expected, (lang, shard)
