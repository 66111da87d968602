"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs every registered query at a given SF, runs its oracle SQL in DuckDB on
the same parquet tables, and compares row-count + column names + an
order-insensitive value digest. Exact value equality is required (the driver
hashes values), so this is a strict superset of whatever normalization the
driver applies.

Usage:  python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import sys
import time
from decimal import Decimal
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        # Distinct tag (see _decimal_columns): raw DECIMAL outputs are
        # driver-incompatible even when both engines agree locally.
        return f"D:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{_norm(k)}={_norm(v[k])}" for k in sorted(v, key=str)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    return f"s:{v}"


def _typed_columns(colnames, rows, types: tuple) -> list[str]:
    """Columns whose values hit ``types`` — the driver-incompatible kinds."""
    bad: set[str] = set()
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, types):
                bad.add(colnames[i])
        if len(bad) == len(colnames):
            break
    return sorted(bad)


def _decimal_columns(colnames, rows) -> list[str]:
    """Columns carrying raw Decimal values. These must HARD-FAIL locally even
    though both collect() and fetchall() return equal Decimal objects here:
    the driver's pandas bridge keeps Spark decimals as Decimal objects but
    renders DuckDB decimals as float64, so a raw DECIMAL output column
    hash-mismatches there even when every value agrees (r2 ``cast_roundtrip``
    red). Queries must render decimals as DOUBLE or VARCHAR."""
    return _typed_columns(colnames, rows, (Decimal,))


def _container_columns(colnames, rows) -> list[str]:
    """Columns carrying list/tuple/dict/Row values. The driver's pandas-based
    canonicalizer sorts output columns before hashing, and pandas
    ``sort_values``/``factorize`` on an object column of Python lists throws
    ``TypeError: unhashable type: 'list'`` — so ANY array/map/struct-typed
    output column crashes the driver harness before it even counts rows,
    including on rows-only (no-oracle) queries (r3 ``multimodal_feature_
    extract`` red). Queries must flatten containers: scalar columns per
    element, ``array_join``, ``to_json``, or CAST AS VARCHAR — on BOTH
    sides."""
    try:
        from pyspark.sql import Row  # noqa: PLC0415
        container_types: tuple = (list, tuple, dict, Row)
    except ImportError:  # pragma: no cover
        container_types = (list, tuple, dict)
    return _typed_columns(colnames, rows, container_types)


# DuckDB result types whose pandas-bridge rendering diverges from Spark's:
# DECIMAL → float64 (Spark keeps Decimal objects, r2), HUGEINT/UHUGEINT →
# float64 (Spark emits int64, r4), UBIGINT/UINTEGER → uint64/uint32 (hash
# representation differs from int64). fetchall() hides all of these (it
# converts to plain Python int/Decimal), so they must be caught statically
# from the declared result schema, not from values.
_BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT", "UINTEGER")


def oracle_bad_type_columns(con, sql: str) -> list[str]:
    """DESCRIBE the oracle SQL and return ``col:TYPE`` for every result column
    whose DuckDB type the driver's pandas bridge renders differently from
    Spark (see _BAD_ORACLE_TYPES). Closes the representation bug class that
    produced the r2 (DECIMAL), r3 (list) and r4 (HUGEINT) driver reds —
    values compare equal locally, so only the declared schema can reveal it."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = []
    for r in rows:
        col, typ = r[0], str(r[1]).upper()
        # strip list/struct wrappers so DECIMAL(38,9)[] etc. still match
        if any(t in typ for t in _BAD_ORACLE_TYPES):
            bad.append(f"{col}:{typ}")
    return bad


def digest(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def describe_sweep(con, oracles, names) -> int:
    """Static oracle-schema sweep (no Spark, <5s for the whole registry)."""
    n_bad = 0
    for name in names:
        if name not in oracles:
            continue
        try:
            bad = oracle_bad_type_columns(con, oracles[name])
        except Exception as e:
            print(f"FAIL  {name}: duckdb DESCRIBE error: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if bad:
            print(
                f"FAIL  {name}: oracle result type(s) {bad} render differently "
                "through the driver's pandas bridge — CAST to BIGINT/DOUBLE/VARCHAR"
            )
            n_bad += 1
    return n_bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a and not a.startswith("--")]
    describe_only = "--describe" in sys.argv

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = only or list(qs)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if describe_only:
        n_bad = describe_sweep(con, oracles, names)
        print(f"\ndescribe sweep: {n_bad} bad of {sum(1 for n in names if n in oracles)} oracles")
        sys.exit(1 if n_bad else 0)

    from incubator_paimon_trino_spark import get_spark

    spark = get_spark("check")

    n_pass = n_fail = n_noracle = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            # rows-only queries still flow through the driver's pandas
            # canonicalizer — decimal/container outputs crash it there too
            bad = _decimal_columns(scols, [tuple(r) for r in srows]) + _container_columns(
                scols, [tuple(r) for r in srows]
            )
            if bad:
                print(
                    f"FAIL  {name}: rows-only query has driver-incompatible "
                    f"DECIMAL/array/map/struct output column(s) {sorted(set(bad))}"
                )
                n_fail += 1
                continue
            print(f"NOORC {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_noracle += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        try:
            bad_types = oracle_bad_type_columns(con, oracles[name])
        except Exception:  # pragma: no cover - DESCRIBE failed but execute worked
            bad_types = []
        if bad_types:
            problems.append(
                f"oracle result type(s) {bad_types} render differently through "
                "the driver's pandas bridge — CAST to BIGINT/DOUBLE/VARCHAR"
            )
        dec_cols = _decimal_columns(scols, [tuple(r) for r in srows]) + _decimal_columns(
            ocols, orows
        )
        if dec_cols:
            problems.append(
                f"raw DECIMAL output column(s) {sorted(set(dec_cols))} — "
                "driver-incompatible (pandas Decimal vs float64); cast to DOUBLE or VARCHAR"
            )
        cont_cols = _container_columns(scols, [tuple(r) for r in srows]) + _container_columns(
            ocols, orows
        )
        if cont_cols:
            problems.append(
                f"array/map/struct output column(s) {sorted(set(cont_cols))} — "
                "driver canonicalizer crashes on unhashable cells; flatten to "
                "scalar columns, array_join, or CAST AS VARCHAR on both sides"
            )
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            ds = digest(scols, [tuple(r) for r in srows])
            do = digest(ocols, orows)
            if ds != do:
                problems.append("value-hash mismatch")
                # show first differing row for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("|".join(_norm(r[i]) for i in so) for r in srows)
                oset = sorted("|".join(_norm(r[i]) for i in oo) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        problems.append(f"  spark : {a[:240]}")
                        problems.append(f"  oracle: {b[:240]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle, of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
