"""r11 (VERDICT r10 item 7): the no-oracle quintet self-checks in-query —
each rows-only query now carries an invariant tying it to its exact twin's
guarantee on the same data, enforced with F.assert_true so a violation
fails the QUERY, not just a test. These tests pin (a) the helpers fire on
violations and pass rows through otherwise, (b) the five registered
queries still execute green with their guards in place.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.operators.registry import guard_empty, self_check

SF = "/root/testdata/sf0.001"


def test_self_check_passes_rows_and_fires_on_violation(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "x int")
    ok = self_check(df, F.col("x") > 0, "must be positive")
    assert sorted(r.x for r in ok.collect()) == [1, 2, 3]  # pass-through
    bad = self_check(df, F.col("x") > 1, "must exceed one")
    with pytest.raises(Exception, match="must exceed one"):
        bad.collect()


def test_guard_empty_passes_and_fires(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    viol_none = df.filter(F.col("x") > 99)
    assert sorted(r.x for r in guard_empty(df, viol_none, "boom").collect()) == [1, 2]
    viol_some = df.filter(F.col("x") > 1)
    with pytest.raises(Exception, match="boom"):
        guard_empty(df, viol_some, "boom").collect()


def test_quintet_runs_green_with_guards(spark):
    """Each formerly assert-free rows-only query executes (guards pass) and
    returns its expected shape on the small fixture."""
    import incubator_paimon_trino_spark.operators as _ops
    from incubator_paimon_trino_spark.operators.registry import QUERIES

    _ops.load_all()
    for name, min_rows in [
        ("agg_approx_count_distinct", 1),
        ("dedup_minhash_lsh", 1),
        ("dedup_simhash", 1),
        ("ann_lsh_bucketed", 1),
        ("multimodal_feature_extract", 1),
    ]:
        rows = QUERIES[name](spark, SF).collect()
        assert len(rows) >= min_rows, name


def test_minhash_guard_catches_a_missing_exact_pair(spark, monkeypatch):
    """Adversarial: if the LSH output somehow dropped an exact-duplicate
    pair, the guard must fail the query — simulated by filtering the
    output under the guard's nose via a doctored _exact_dup_pairs that
    demands a pair that cannot exist."""
    import incubator_paimon_trino_spark.operators.dedup as dd

    real = dd._exact_dup_pairs

    def doctored(spark_, sf_dir_):
        ghost = spark_.createDataFrame([(-1, -2)], "doc_a bigint, doc_b bigint")
        return real(spark_, sf_dir_).unionByName(ghost)

    monkeypatch.setattr(dd, "_exact_dup_pairs", doctored)
    with pytest.raises(Exception, match="exact-duplicate"):
        dd.dedup_minhash_lsh(spark, SF).collect()
