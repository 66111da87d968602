"""Pure-Python Avro OCF codec (formats/avro_ocf.py) — the module-less
fallback behind avro tables' write, batch read, and manifest-stream read.

Roundtrip is pinned over the full DDL type surface plus randomized rows;
block-header record counting never decodes rows (monkeypatch tripwire).
"""

from __future__ import annotations

import datetime
import decimal
import os
import random
import tempfile

from incubator_paimon_trino_spark.formats.avro_ocf import (
    count_records,
    read_ocf,
    read_ocf_arrow,
    record_schema,
    write_ocf,
)

FIELDS = [
    ("b", "boolean"), ("i8", "tinyint"), ("i16", "smallint"), ("i32", "int"),
    ("i64", "bigint"), ("f", "float"), ("d", "double"), ("s", "string"),
    ("bin", "binary"), ("dt", "date"), ("ts", "timestamp_ntz"),
    ("t", "time(6)"), ("dec", "decimal(10,2)"),
    ("arr", "array<bigint>"), ("m", "map<string,bigint>"),
    ("st", "struct<x:bigint,y:string>"),
]


def _row(rng: random.Random) -> dict:
    if rng.random() < 0.1:
        return {k: None for k, _ in FIELDS}
    return {
        "b": rng.random() < 0.5,
        "i8": rng.randint(-128, 127),
        "i16": rng.randint(-(2**15), 2**15 - 1),
        "i32": rng.randint(-(2**31), 2**31 - 1),
        "i64": rng.randint(-(2**62), 2**62),
        "f": 0.5 * rng.randint(-8, 8),  # exact in float32
        "d": rng.random(),
        "s": "".join(rng.choice("abĉ∂e ") for _ in range(rng.randrange(8))),
        "bin": bytes(rng.randrange(256) for _ in range(rng.randrange(6))),
        "dt": datetime.date(2020, 1, 1) + datetime.timedelta(days=rng.randrange(2000)),
        "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(
            microseconds=rng.randrange(10**12)
        ),
        "t": datetime.time(rng.randrange(24), rng.randrange(60), rng.randrange(60),
                           rng.randrange(10**6)),
        "dec": decimal.Decimal(rng.randint(-10**7, 10**7)).scaleb(-2),
        "arr": [rng.randint(-5, 5) if rng.random() < 0.8 else None
                for _ in range(rng.randrange(4))],
        "m": {f"k{i}": (i if rng.random() < 0.8 else None) for i in range(rng.randrange(3))},
        "st": {"x": rng.randint(0, 9), "y": None if rng.random() < 0.3 else "yy"},
    }


def test_roundtrip_full_type_surface_randomized():
    rng = random.Random(11)
    rows = [_row(rng) for _ in range(500)]
    schema = record_schema(FIELDS)
    path = tempfile.mktemp(suffix=".avro")
    try:
        assert write_ocf(path, schema, rows) == 500
        got_schema, it = read_ocf(path)
        got = list(it)
        assert got_schema["fields"][0]["name"] == "b"
        assert len(got) == 500
        for orig, back in zip(rows, got):
            for k, ddl in FIELDS:
                v, w = orig[k], back[k]
                if v is None:
                    assert w is None, (k, w)
                elif ddl == "date":
                    assert w == (v - datetime.date(1970, 1, 1)).days
                elif ddl.startswith("timestamp"):
                    assert w == (v - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
                        microseconds=1
                    )
                elif ddl.startswith("time"):
                    assert w == ((v.hour * 60 + v.minute) * 60 + v.second) * 10**6 + v.microsecond
                elif ddl.startswith("map"):
                    assert dict(w) == v, k
                else:
                    assert w == v, (k, v, w)
        # arrow decode agrees on typed values
        tab = read_ocf_arrow(path, FIELDS)
        assert tab.num_rows == 500
        sample = tab.slice(0, 50).to_pylist()
        for orig, back in zip(rows[:50], sample):
            assert back["ts"] == orig["ts"]
            assert back["dt"] == orig["dt"]
            assert back["dec"] == orig["dec"]
            assert back["st"] == orig["st"]
        # multi-block files (the 64 KiB flush) count without decoding
        assert count_records(path) == 500
    finally:
        os.unlink(path)


def test_count_records_never_decodes(monkeypatch):
    import incubator_paimon_trino_spark.formats.avro_ocf as ocf

    rows = [{"k": i, "v": "x" * 100} for i in range(3000)]  # forces >1 block
    schema = record_schema([("k", "bigint"), ("v", "string")])
    path = tempfile.mktemp(suffix=".avro")
    try:
        write_ocf(path, schema, rows)
        monkeypatch.setattr(
            ocf, "_decoder",
            lambda *_: (_ for _ in ()).throw(AssertionError("decoded rows")),
        )
        assert ocf.count_records(path) == 3000
    finally:
        os.unlink(path)


def test_missing_fields_read_as_null():
    """Field-id evolution shape: a file written under an OLD schema decodes
    with a requested column absent from the file → nulls (the manifest
    source's 'missing' columns path)."""
    schema = record_schema([("k", "bigint")])
    path = tempfile.mktemp(suffix=".avro")
    try:
        write_ocf(path, schema, [{"k": 1}, {"k": 2}])
        tab = read_ocf_arrow(path, [("k", "bigint"), ("extra", "string")])
        assert tab.column("extra").null_count == 2
        assert tab.column("k").to_pylist() == [1, 2]
    finally:
        os.unlink(path)
