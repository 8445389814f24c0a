#!/usr/bin/env python
"""Per-key optimization probe: wall (best-of-N noop, after a warm-up),
job count, and optionally the formatted plan, for a list of keys.

    python scripts/key_probe.py KEY [KEY ...] [--sf DIR] [--runs N]
                                [--plan OUTDIR]

One JSON line per key. This is the A/B instrument for the r17
optimization round — same timing methodology as bench.py (noop sink,
warm-up excluded, best-of-N) so numbers are comparable, without the
45-minute full-basket cost.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark_spark import registry  # noqa: E402
from data_pipeline_spark_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir for <key>.txt formatted plans")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("key-probe")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # session warm-up
    noop(spark.range(1))

    for name in args.keys:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        noop(fn(spark, args.sf))  # warm the plan (codegen/JIT)
        j0 = len(st.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        noop(fn(spark, args.sf))
        first = time.perf_counter() - t0
        jobs = len(st.getJobIdsForGroup(None)) - j0
        best = first
        for _ in range(args.runs - 1):
            t0 = time.perf_counter()
            noop(fn(spark, args.sf))
            best = min(best, time.perf_counter() - t0)
        # release any lazily-pinned checkpoint blocks between keys
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass
        rec = {"key": name, "best": round(best, 3), "jobs": jobs}
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(args.plan, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            rec["plan"] = path
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
