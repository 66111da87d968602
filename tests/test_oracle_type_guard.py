"""The tools/check.py DESCRIBE guard must catch every driver-incompatible
DuckDB result type — the pandas-bridge representation bug class that produced
one red per round for three rounds (r2 DECIMAL, r3 list cells, r4 HUGEINT).
``fetchall()`` hides these (HUGEINT→int, DECIMAL→Decimal compare equal
locally), so the guard reads the declared result schema instead.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check import oracle_bad_type_columns


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.mark.parametrize(
    "sql, expect_bad",
    [
        # the exact r4 red shapes: uncast SUM of an integer → HUGEINT
        ("SELECT SUM(x) AS n FROM (VALUES (1), (2)) t(x)", True),
        ("SELECT SUM(x) OVER () AS n FROM (VALUES (1), (2)) t(x)", True),
        # the r2 red shape: raw DECIMAL output
        ("SELECT CAST(1.5 AS DECIMAL(9,2)) AS d", True),
        # unsigned ints render as uint64/uint32 in pandas
        ("SELECT CAST(1 AS UBIGINT) AS u", True),
        ("SELECT CAST(1 AS UINTEGER) AS u", True),
        # the sanctioned fixes are clean
        ("SELECT CAST(SUM(x) AS BIGINT) AS n FROM (VALUES (1), (2)) t(x)", False),
        ("SELECT CAST(SUM(x) OVER () AS BIGINT) AS n FROM (VALUES (1), (2)) t(x)", False),
        ("SELECT CAST(CAST(1.5 AS DECIMAL(9,2)) AS DOUBLE) AS d", False),
        # COUNT(*) is already BIGINT — must not false-positive
        ("SELECT COUNT(*) AS n FROM (VALUES (1)) t(x)", False),
        # AVG of ints is DOUBLE — clean
        ("SELECT AVG(x) AS a FROM (VALUES (1), (2)) t(x)", False),
    ],
)
def test_describe_guard(con, sql, expect_bad):
    bad = oracle_bad_type_columns(con, sql)
    assert bool(bad) == expect_bad, f"{sql!r} -> {bad}"


def test_whole_registry_oracle_schemas_clean(con):
    """Every registered oracle must DESCRIBE clean — the static closure of the
    representation bug class over the full registry (sub-second; no Spark)."""
    import __spark_entry__ as e

    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW IF NOT EXISTS {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    bad = {}
    for name, sql in e.oracle_sql().items():
        cols = oracle_bad_type_columns(con, sql)
        if cols:
            bad[name] = cols
    assert not bad, f"driver-incompatible oracle result types: {bad}"
