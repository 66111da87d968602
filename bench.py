"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is warmed once (JVM JIT + whole-stage-codegen compilation + parquet
footer cache) and then timed on a second execution — steady-state throughput,
which is what matters on a long-running cluster; one-time codegen compilation
is not a per-query cost at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# Headline set: scan/filter/agg (q1, q6), joins (q3, q5, q10), the heaviest
# fact-fact join shapes (q9 5-way star with part×supplier, q18 groupBy-HAVING
# over lineitem then fact join, q21 double-correlated EXISTS/NOT EXISTS) so
# regressions on multi-shuffle plans show round-over-round, plus wide
# coverage ops (windows, dedup, similarity).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q10_returned_items",
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    "window_topn_per_group",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "embedding_kmeans_assign",
    "dedup_chunk_repetition",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entrymod
    from incubator_paimon_trino_spark import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    def run(name: str) -> int:
        df = qs[name](spark, sf_dir)
        # count() for large-output ops so the bench measures compute, not
        # result transfer to the Python driver.
        if name.startswith(("dedup", "ann", "embedding")):
            return df.count()
        return len(df.collect())

    timings: dict[str, float] = {}
    for name in names:
        run(name)  # warm: codegen + JIT, not counted
        best, n = None, 0
        for _ in range(2):  # best-of-2 to damp JIT/GC noise
            t0 = time.time()
            n = run(name)
            el = time.time() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
