"""Smoke: driver contract + flagship query + oracle agreement for the core set."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_ORACLE, SF_SMOKE
from tools.check import digest


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 5


def test_flagship_matches_oracle(spark, duck):
    import __spark_entry__ as e

    fn = e.queries()["q1_pricing_summary"]
    sdf = fn(spark, SF_ORACLE)
    res = duck.execute(e.oracle_sql()["q1_pricing_summary"])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert digest(sdf.columns, srows) == digest(ocols, orows)


def test_q6_pushdown_reaches_scan(spark):
    """The Q6 physical plan must show parquet PushedFilters + pruned schema."""
    import __spark_entry__ as e

    df = e.queries()["q6_forecast_revenue"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
