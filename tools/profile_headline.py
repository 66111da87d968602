"""Dump .explain("formatted") for every headline bench query and (optionally)
time them with the noop sink (guide §1.4) so we time compute, not the sink.

Usage:
    python tools/profile_headline.py plans/r13 _before          # explains only
    python tools/profile_headline.py plans/r13 _before --time   # + noop timings
    python tools/profile_headline.py plans/r13 _after --time q1_pricing_summary ...

Writes <outdir>/<query><suffix>.txt per query. Timing output goes to stderr
and a JSON line to stdout: {"queries": {name: sec}} (noop-sink best-of-2,
warm run first — same methodology as bench.py minus the collect()).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "plans" / "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "_before"
    do_time = "--time" in sys.argv[3:]
    only = [a for a in sys.argv[3:] if not a.startswith("--")]
    outdir.mkdir(parents=True, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from incubator_paimon_trino_spark import get_spark

    spark = get_spark("profile_headline")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs and (not only or n in only)]

    timings: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        (outdir / f"{name}{suffix}.txt").write_text(plan)
        print(f"# wrote {name}{suffix}.txt ({len(plan.splitlines())} lines)", file=sys.stderr)
        if not do_time:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")

        def run() -> None:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm: codegen + JIT
        best = None
        for _ in range(2):
            t0 = time.time()
            run()
            el = time.time() - t0
            best = el if best is None or el < best else best
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s (noop)", file=sys.stderr)

    if do_time:
        print(json.dumps({"queries": timings, "sink": "noop"}))


if __name__ == "__main__":
    main()
