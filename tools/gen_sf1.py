"""Generate a local sf1 ``lineitem`` (~6M rows) for the lake read-path
scale soak (r12 — VERDICT r11 item 6).

Same generator CONTRACT as the driver's TESTDATA.md tables (seed=42,
numpy), with every distribution matched to the profiled sf0.1 data so
sf0.1 → sf1 is a pure 10× row scale-up:

- rows = 6,000,000 · sf; ``l_orderkey`` uniform over [0, 1.5M·sf) (≈4
  lines/order, Poisson-like multiplicity), ``l_partkey`` over
  [0, 200k·sf), ``l_suppkey`` over [0, 10k·sf);
- ``l_linenumber`` uniform 1..7 INDEPENDENT of orderkey (so duplicate
  (orderkey, linenumber) pairs exist, exactly like the driver data —
  bench_lake dedups once, same as at sf0.1);
- quantity integer 1..50, extendedprice 2-decimal in [900, 105000),
  discount 0..0.10 step 0.01, tax 0..0.08, returnflag A/N/R,
  linestatus O/F, shipdate 1995..2001.

Output: ``<out_dir>/lineitem.parquet`` (default ``.bench/sf1/`` — local
only, gitignored; NEVER writes to /root/testdata).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate(out_dir: str, sf: float = 1.0) -> str:
    n = int(6_000_000 * sf)
    rng = np.random.default_rng(42)
    days = rng.integers(0, 2500, n)
    tbl = pa.table(
        {
            "l_orderkey": rng.integers(0, int(1_500_000 * sf), n, dtype=np.int64),
            "l_partkey": rng.integers(0, int(200_000 * sf), n, dtype=np.int64),
            "l_suppkey": rng.integers(0, int(10_000 * sf), n, dtype=np.int64),
            "l_linenumber": rng.integers(1, 8, n, dtype=np.int32),
            "l_quantity": rng.integers(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n), 2),
            "l_discount": rng.integers(0, 11, n) / 100.0,
            "l_tax": rng.integers(0, 9, n) / 100.0,
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n)]),
            "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n)]),
            "l_shipdate": pa.array(
                np.datetime64("1995-01-01", "us") + days * np.timedelta64(86_400_000_000, "us")
            ),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "lineitem.parquet")
    pq.write_table(tbl, path, row_group_size=1 << 20)
    return path


def generate_events(out_dir: str, sf: float = 1.0) -> str:
    """sf1 ``events`` for the PATTERN-family scale soak (r13 — VERDICT r12
    item 6). Distribution-matched to the driver data so sf0.1 → sf1 is a
    pure 10× row scale-up: rows = 1M·sf; 15k·sf users (≈67 events/user at
    every sf — per-key span length is CONSTANT, only key count scales,
    the shape the partition-batched matcher shuffles on); 5 uniform event
    types; ts uniform over Jan 2024; value 2-decimal in [0.01, 490];
    ``event_id`` = row ordinal (the driver's tie-break key)."""
    n = int(1_000_000 * sf)
    rng = np.random.default_rng(42)
    types = np.array(["view", "click", "purchase", "signup", "error"])
    us = rng.integers(0, 30 * 86_400_000_000, n)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.datetime64("2024-01-01", "us") + us * np.timedelta64(1, "us")),
            "user_id": rng.integers(0, int(15_000 * sf), n, dtype=np.int64),
            "event_type": pa.array(types[rng.integers(0, 5, n)]),
            "value": np.round(rng.uniform(0.01, 490.02, n), 2),
            "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "events.parquet")
    pq.write_table(tbl, path, row_group_size=1 << 20)
    return path


def generate_orders(out_dir: str, sf: float = 1.0) -> str:
    """sf1 ``orders`` for the q18 restructure soak (r14 — VERDICT r13
    item 7). Distribution-matched to the driver's sf0.1 data: rows =
    1.5M·sf, o_orderkey = row ordinal (PK, joins lineitem's uniform
    l_orderkey), o_custkey over [0, 150k·sf), status O/F/P, totalprice
    2-decimal in [1000, 500000), orderdate 1995..2001, 5 priorities."""
    n = int(1_500_000 * sf)
    rng = np.random.default_rng(43)
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    days = rng.integers(0, 2405, n)
    tbl = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": rng.integers(0, int(150_000 * sf), n, dtype=np.int64),
            "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, n)]),
            "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n), 2),
            "o_orderdate": pa.array(
                np.datetime64("1995-01-01", "us") + days * np.timedelta64(86_400_000_000, "us")
            ),
            "o_orderpriority": pa.array(prios[rng.integers(0, 5, n)]),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "orders.parquet")
    pq.write_table(tbl, path, row_group_size=1 << 20)
    return path


def generate_customer(out_dir: str, sf: float = 1.0) -> str:
    """sf1 ``customer``: rows = 150k·sf, c_custkey = row ordinal (PK),
    25 nations, acctbal 2-decimal in [-1000, 10000), 5 market segments."""
    n = int(150_000 * sf)
    rng = np.random.default_rng(44)
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    tbl = pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": rng.integers(0, 25, n, dtype=np.int64),
            "c_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, n), 2),
            "c_mktsegment": pa.array(segs[rng.integers(0, 5, n)]),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "customer.parquet")
    pq.write_table(tbl, path, row_group_size=1 << 20)
    return path


def generate_documents(out_dir: str, sf: float = 1.0) -> str:
    """sf1 ``documents`` for the dedup-family soak: rows = 50k·sf docs of
    10..100 words drawn uniformly from the driver's exact 31-word vocab
    (same small vocab → real cross-doc chunk/shingle repeats, like the
    driver data), 5 langs, 20 sources, n_chars = len(text)."""
    n = int(50_000 * sf)
    rng = np.random.default_rng(45)
    vocab = np.array(
        "a agg batch big column customer data dup fast filter group hash join key "
        "line merge order part query row scan slow small sort spark stream table "
        "the value vector window".split()
    )
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lens = rng.integers(10, 101, n)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in lens]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs[rng.integers(0, 5, n)]),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(tbl, path, row_group_size=1 << 20)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(generate(out, sf))
    print(generate_events(out, sf))
    print(generate_orders(out, sf))
    print(generate_customer(out, sf))
    print(generate_documents(out, sf))
