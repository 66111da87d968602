"""Pattern-family scale soak (r13 — VERDICT r12 item 6): absolute
sf0.1 → sf1 scaling for the batch matcher and the streaming CEP scan.

Usage: python tools/soak_patterns.py [sf1_dir]
  - generates events at sf1 into sf1_dir (default .bench/sf1, gitignored)
    unless already present;
  - runs each query at /root/testdata/sf0.1 and at sf1 (best-of-2 warm,
    count() to drain the plan);
  - prints a table of absolute seconds and the sf1/sf0.1 ratio (10× rows;
    sub-linear target <10, see SCALE.md).

Same local[32] + 32 shuffle partitions the bench uses. Streaming queries
run availableNow to completion each time (their cost is the whole scan +
state pass, so the ratio is end-to-end).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "pattern_match_recognize_funnel",
    "pattern_prev_navigation_runs",
    "pattern_running_measures_all_rows",
    "pattern_show_empty_matches",
    "pattern_sql_match_recognize",
    "streaming_pattern_within_funnel",
    "streaming_pattern_skip_next",
    "streaming_pattern_value_measures",
]


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf1"
    if not os.path.exists(os.path.join(sf1_dir, "events.parquet")):
        from tools.gen_sf1 import generate_events

        print("generating sf1 events ...", file=sys.stderr)
        generate_events(sf1_dir, 1.0)

    from incubator_paimon_trino_spark import get_spark
    import __spark_entry__ as entry

    spark = get_spark("pattern_soak", shuffle_partitions=32)
    qs = entry.queries()
    rows = []
    for name in QUERIES:
        fn = qs[name]
        times = {}
        for label, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
            best, n = float("inf"), -1
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, d).count()
                best = min(best, time.time() - t0)
            times[label] = (best, n)
        r01, r1 = times["sf0.1"][0], times["sf1"][0]
        rows.append((name, r01, times["sf0.1"][1], r1, times["sf1"][1], r1 / r01))
        print(
            f"{name:42s} sf0.1={r01:7.2f}s ({times['sf0.1'][1]:>8} rows)  "
            f"sf1={r1:7.2f}s ({times['sf1'][1]:>9} rows)  ratio={r1 / r01:5.2f}x",
            flush=True,
        )
    worst = max(r[5] for r in rows)
    print(f"\nworst ratio {worst:.2f}x at 10x rows ({'SUB' if worst < 10 else 'SUPER'}-linear)")


if __name__ == "__main__":
    main()
