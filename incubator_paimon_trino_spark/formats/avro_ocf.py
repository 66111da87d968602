"""Pure-Python Avro Object Container File codec (null codec, spec subset).

The reference admits ``file_format = 'AVRO'`` tables through its reflected
``FileFormatType`` option (``common/TrinoTableOptionUtils.java:96,
111-112``); Spark reads/writes Avro through the external ``spark-avro``
module. When that module is absent from the classpath (this runtime), avro
tables would be dead weight — this codec implements the public Avro 1.x
container format (https://avro.apache.org/docs/current/specification/) for
exactly the type surface the catalog's DDL layer admits, so:

- ``insert_into`` can still WRITE avro tables (executor-side, one OCF per
  task — ``warehouse._write_avro_fallback``),
- the batch read path can still READ them (``sources of warehouse`` via the
  ``paimon_avro`` Python DataSource below),
- the manifest streaming source can stream them (``manifest_source``'s
  executor read — the r8 'What's missing #2' closure).

Files written here are standard Avro: any stock reader (spark-avro,
fastavro, avro-tools) consumes them, and this reader consumes spark-avro's
output (same schema mapping spark-avro uses: nullable fields as
``["null", T]`` unions, logical date / timestamp-micros /
local-timestamp-micros / time-micros / decimal-bytes; maps with non-string
keys as arrays of key/value records). Production note: when the JVM module
IS present it is preferred automatically — this path exists for
correctness, not speed (per-row Python encode/decode).

Deletion vectors stay parquet-only (create-time validation): positional
reads ride Spark's parquet-native ``_metadata.row_index``, which no avro
reader supplies.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Iterator

MAGIC = b"Obj\x01"
_BLOCK_TARGET = 1 << 16  # flush encoded blocks at ~64 KiB


# --------------------------------------------------------------- primitives
def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def long(self) -> int:
        z, shift = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def fixed(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out


# ------------------------------------------------------------ DDL → schema
def _split_commas(s: str) -> list[str]:
    # the one shared depth-tracking DDL splitter (functions/types.py — a
    # neutral home: this format module must not depend on the streaming
    # DataSource module)
    from incubator_paimon_trino_spark.functions.types import split_top_commas

    return split_top_commas(s)


def _avro_type(ddl: str, name_hint: str) -> object:
    """Spark simpleString DDL → Avro schema (spark-avro's mapping)."""
    s = ddl.strip().lower()
    prim = {
        "boolean": "boolean",
        "tinyint": "int", "byte": "int", "smallint": "int", "short": "int",
        "int": "int", "integer": "int",
        "bigint": "long", "long": "long",
        "float": "float", "real": "float",
        "double": "double",
        "string": "string",
        "binary": "bytes",
    }
    if s in prim:
        return prim[s]
    if s.startswith(("char", "varchar")):
        return "string"
    if s == "date":
        return {"type": "int", "logicalType": "date"}
    if s in ("timestamp", "timestamp_ltz"):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if s.startswith("timestamp"):  # timestamp_ntz / declared TIMESTAMP(p)
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if s.startswith("time"):
        return {"type": "long", "logicalType": "time-micros"}
    if s.startswith("decimal"):
        inner = s[s.index("(") + 1 : s.rindex(")")] if "(" in s else "10,0"
        p, _, sc = inner.partition(",")
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": int(p),
            "scale": int(sc or 0),
        }
    if s.startswith("array<") and s.endswith(">"):
        return {
            "type": "array",
            "items": ["null", _avro_type(ddl.strip()[6:-1], name_hint + "_item")],
        }
    if s.startswith("map<") and s.endswith(">"):
        k, v = _split_commas(ddl.strip()[4:-1])
        vt = ["null", _avro_type(v, name_hint + "_value")]
        if k.strip().lower() in ("string",) or k.strip().lower().startswith(
            ("char", "varchar")
        ):
            return {"type": "map", "values": vt}
        # non-string keys: spark-avro's array-of-key/value-records form
        return {
            "type": "array",
            "items": {
                "type": "record",
                "name": name_hint + "_entry",
                "fields": [
                    {"name": "key", "type": _avro_type(k, name_hint + "_key")},
                    {"name": "value", "type": vt},
                ],
            },
        }
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_commas(ddl.strip()[7:-1]):
            fname, _, ft = part.partition(":")
            fname = fname.strip().strip("`")
            fields.append(
                {
                    "name": fname,
                    "type": ["null", _avro_type(ft, name_hint + "_" + fname)],
                    "default": None,
                }
            )
        return {"type": "record", "name": name_hint, "fields": fields}
    raise ValueError(f"unsupported type for avro: {ddl!r}")


def record_schema(fields: list[tuple[str, str]], name: str = "spark_schema") -> dict:
    """Top-level record schema for (column name, DDL) pairs — every column
    nullable, like spark-avro's default."""
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": n, "type": ["null", _avro_type(t, n)], "default": None}
            for n, t in fields
        ],
    }


# ----------------------------------------------------------------- encoding
def _encoder(schema: object):
    """Compile an Avro schema into value -> bytes-writer closure. Values are
    plain Python (datetime/date/Decimal/bytes/list/dict; maps as dicts OR
    lists of (k, v) pairs — what ``pyarrow.Table.to_pylist`` yields)."""
    import datetime as _dt
    import decimal as _decimal

    if isinstance(schema, list):  # union (always [null, T] here)
        assert schema[0] == "null" and len(schema) == 2, schema
        inner = _encoder(schema[1])
        zero, one = _zigzag_encode(0), _zigzag_encode(1)

        def enc_union(v, w):
            if v is None:
                w(zero)
            else:
                w(one)
                inner(v, w)

        return enc_union
    t = schema["type"] if isinstance(schema, dict) else schema
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t in ("int", "long"):
        if logical == "date":
            epoch = _dt.date(1970, 1, 1)

            def enc(v, w):
                w(_zigzag_encode(v if isinstance(v, int) else (v - epoch).days))

        elif logical in ("timestamp-micros", "local-timestamp-micros"):
            epoch_dt = _dt.datetime(1970, 1, 1)
            utc = _dt.timezone.utc

            def enc(v, w):
                if isinstance(v, int):
                    us = v
                else:
                    if v.tzinfo is not None:  # exact, no float timestamp()
                        v = v.astimezone(utc).replace(tzinfo=None)
                    us = (v - epoch_dt) // _dt.timedelta(microseconds=1)
                w(_zigzag_encode(us))

        elif logical == "time-micros":

            def enc(v, w):
                us = (
                    v
                    if isinstance(v, int)
                    else ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000
                    + v.microsecond
                )
                w(_zigzag_encode(us))

        else:

            def enc(v, w):
                w(_zigzag_encode(int(v)))

        return enc
    if t == "boolean":
        return lambda v, w: w(b"\x01" if v else b"\x00")
    if t == "float":
        return lambda v, w: w(struct.pack("<f", float(v)))
    if t == "double":
        return lambda v, w: w(struct.pack("<d", float(v)))
    if t == "string":

        def enc_s(v, w):
            b = v.encode("utf-8")
            w(_zigzag_encode(len(b)))
            w(b)

        return enc_s
    if t == "bytes":
        if logical == "decimal":
            scale = schema["scale"]
            q = _decimal.Decimal(1).scaleb(-scale)

            def enc_d(v, w):
                unscaled = int(
                    v.quantize(q, rounding=_decimal.ROUND_HALF_UP).scaleb(scale)
                )
                n = max(1, (unscaled.bit_length() + 8) // 8)
                b = unscaled.to_bytes(n, "big", signed=True)
                w(_zigzag_encode(len(b)))
                w(b)

            return enc_d

        def enc_b(v, w):
            b = bytes(v)
            w(_zigzag_encode(len(b)))
            w(b)

        return enc_b
    if t == "array":
        item = _encoder(schema["items"])

        def enc_a(v, w):
            if len(v):
                w(_zigzag_encode(len(v)))
                for x in v:
                    item(x, w)
            w(_zigzag_encode(0))

        return enc_a
    if t == "map":
        val = _encoder(schema["values"])

        def enc_m(v, w):
            items = list(v.items()) if isinstance(v, dict) else list(v)
            if items:
                w(_zigzag_encode(len(items)))
                for k, x in items:
                    kb = k.encode("utf-8")
                    w(_zigzag_encode(len(kb)))
                    w(kb)
                    val(x, w)
            w(_zigzag_encode(0))

        return enc_m
    if t == "record":
        fields = [(f["name"], _encoder(f["type"])) for f in schema["fields"]]
        is_entry = schema["name"].endswith("_entry") if isinstance(schema, dict) else False

        def enc_r(v, w):
            if is_entry and isinstance(v, tuple):  # map-as-array entry
                v = {"key": v[0], "value": v[1]}
            for fname, fe in fields:
                fe(v.get(fname) if isinstance(v, dict) else getattr(v, fname), w)

        return enc_r
    raise ValueError(f"cannot encode avro type {schema!r}")


# ----------------------------------------------------------------- decoding
def _decoder(schema: object):
    """Compile an Avro schema into _Reader -> value closure. Logical values
    decode to their RAW representation (days / micros / unscaled+scale
    handled by the caller via the schema — ``_arrow_type`` consumes ints
    directly)."""
    if isinstance(schema, str):
        t, logical = schema, None
    elif isinstance(schema, list):
        subs = [_decoder(s) for s in schema]

        def dec_union(r):
            i = r.long()
            return subs[i](r)

        return dec_union
    else:
        t, logical = schema["type"], schema.get("logicalType")
    if t == "null":
        return lambda r: None
    if t == "boolean":
        return lambda r: r.fixed(1) == b"\x01"
    if t in ("int", "long"):
        return lambda r: r.long()
    if t == "float":
        return lambda r: struct.unpack("<f", r.fixed(4))[0]
    if t == "double":
        return lambda r: struct.unpack("<d", r.fixed(8))[0]
    if t == "string":
        return lambda r: r.bytes_().decode("utf-8")
    if t == "bytes":
        if logical == "decimal":
            import decimal as _decimal

            scale = schema["scale"]

            def dec_d(r):
                b = r.bytes_()
                return _decimal.Decimal(
                    int.from_bytes(b, "big", signed=True)
                ).scaleb(-scale)

            return dec_d
        return lambda r: bytes(r.bytes_())
    if t == "fixed":
        n = schema["size"]
        return lambda r: bytes(r.fixed(n))
    if t == "array":
        item = _decoder(schema["items"])

        def dec_a(r):
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    r.long()  # block byte size — unused, we decode anyway
                    n = -n
                for _ in range(n):
                    out.append(item(r))

        return dec_a
    if t == "map":
        val = _decoder(schema["values"])

        def dec_m(r):
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out  # list of pairs — pyarrow's map_ input shape
                if n < 0:
                    r.long()
                    n = -n
                for _ in range(n):
                    out.append((r.bytes_().decode("utf-8"), val(r)))

        return dec_m
    if t == "record":
        fields = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]

        def dec_r(r):
            return {fname: fd(r) for fname, fd in fields}

        return dec_r
    raise ValueError(f"cannot decode avro type {schema!r}")


# ---------------------------------------------------------------- container
class OcfWriter:
    """Streaming OCF writer (null codec)."""

    def __init__(self, fh, schema: dict) -> None:
        self.fh = fh
        self.schema = schema
        self.enc = _encoder(schema)
        self.sync = os.urandom(16)
        self.buf = bytearray()
        self.count = 0
        self.count_written = 0  # running total across blocks
        meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
        fh.write(MAGIC)
        fh.write(_zigzag_encode(len(meta)))
        for k, v in meta.items():
            kb = k.encode()
            fh.write(_zigzag_encode(len(kb)))
            fh.write(kb)
            fh.write(_zigzag_encode(len(v)))
            fh.write(v)
        fh.write(_zigzag_encode(0))
        fh.write(self.sync)

    def write(self, row) -> None:
        self.enc(row, self.buf.extend)
        self.count += 1
        self.count_written += 1
        if len(self.buf) >= _BLOCK_TARGET:
            self.flush_block()

    def flush_block(self) -> None:
        if not self.count:
            return
        self.fh.write(_zigzag_encode(self.count))
        self.fh.write(_zigzag_encode(len(self.buf)))
        self.fh.write(bytes(self.buf))
        self.fh.write(self.sync)
        self.buf.clear()
        self.count = 0

    def close(self) -> None:
        self.flush_block()


def write_ocf(path: str, schema: dict, rows) -> int:
    """Write rows (dicts) to ``path``; returns the record count."""
    n = 0
    with open(path, "wb") as fh:
        w = OcfWriter(fh, schema)
        for row in rows:
            w.write(row)
            n += 1
        w.close()
    return n


def _parse_header(buf: bytes) -> tuple[dict, bytes, int, bytes]:
    """(schema, sync marker, header end offset, codec) from the container's
    leading bytes. Raises IndexError if ``buf`` is too short (callers with
    partial buffers extend and retry)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    r = _Reader(buf, 4)
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.bytes_().decode()
            meta[k] = bytes(r.bytes_())
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    sync = r.fixed(16)
    if len(sync) != 16:
        raise IndexError("short header")
    return schema, sync, r.pos, codec


def read_ocf(path: str) -> tuple[dict, Iterator[dict]]:
    """(schema, row iterator) — decodes the whole container lazily per
    block; deflate-codec files (spark-avro's default) inflate per block.
    Slurps the file (executor-side, per delta/data file — decode touches
    every byte anyway); ``count_records`` is the seek-based path."""
    with open(path, "rb") as fh:
        buf = fh.read()
    schema, sync, pos, codec = _parse_header(buf)
    r = _Reader(buf, pos)
    dec = _decoder(schema)

    def rows():
        rr = r
        while rr.pos < len(rr.buf):
            n = rr.long()
            size = rr.long()
            payload = rr.fixed(size)
            if codec == b"deflate":
                payload = zlib.decompress(payload, -15)
            pr = _Reader(payload)
            for _ in range(n):
                yield dec(pr)
            if rr.fixed(16) != sync:
                raise ValueError(f"sync marker mismatch in {path}")

    return schema, rows()


def count_records(path: str) -> int:
    """Record count from BLOCK HEADERS only — no row decoding AND no full
    read: each block fronts (count, byte size), so the scan SEEKS over the
    payloads. O(blocks) small reads, O(1) memory, any file size."""
    with open(path, "rb") as fh:
        buf = fh.read(1 << 16)
        while True:
            try:
                _, _sync, pos, _codec = _parse_header(buf)
                break
            except IndexError:  # oversized metadata map: extend and retry
                more = fh.read(1 << 16)
                if not more:
                    raise ValueError(f"truncated avro header in {path}") from None
                buf += more
        fh.seek(pos)
        total = 0
        while True:
            head = fh.read(20)  # two varints (≤ 10 bytes each)
            if not head:
                return total
            hr = _Reader(head)
            n = hr.long()
            size = hr.long()
            if n < 0 or size < 0:
                raise ValueError(f"corrupt avro block header in {path}")
            fh.seek(size - (len(head) - hr.pos), 1)  # skip payload only
            marker = fh.read(16)
            if marker != _sync:
                # truncated mid-block or corrupt: the old full-read path
                # raised here too — over-counting a partial block would
                # record rows the file does not hold
                raise ValueError(f"sync marker mismatch in {path}")
            total += n


def read_ocf_arrow(path: str, out_fields: list[tuple[str, str]]):
    """Decode a container into a pyarrow Table with the given (name, DDL)
    columns (the file's own schema drives the decode; requested fields
    missing from the file come back null). Raw logical values (days /
    micros ints) feed the arrow arrays directly."""
    import pyarrow as pa

    from incubator_paimon_trino_spark.streaming.manifest_source import _arrow_type

    _, rows = read_ocf(path)
    data = list(rows)
    cols = {}
    for name, ddl in out_fields:
        at = _arrow_type(ddl)
        vals = [row.get(name) for row in data]
        if pa.types.is_timestamp(at) or pa.types.is_time64(at):
            # ints are micros already; pa.array with int input handles it
            cols[name] = pa.array(vals, type=at)
        else:
            cols[name] = pa.array(vals, type=at)
    return pa.table(cols) if cols else pa.table({"_": pa.nulls(len(data))}).drop("_")
