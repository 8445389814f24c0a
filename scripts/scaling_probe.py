#!/usr/bin/env python
"""Measure how headline queries scale across the fixture SFs.

Times each probe query at sf0.001 / sf0.01 / sf0.1 (untimed warm-up,
best of 3) and prints per-query wall times plus the 0.01→0.1 ratio —
the observable that separates Spark's fixed scheduling floor from the
data-proportional part. A query whose time grows far slower than the
10× data factor is floor-dominated (the floor amortizes away at
cluster scale); one growing ≥10× has a super-linear stage that will
NOT survive a 100× scale-up and must be fixed.

    python scripts/scaling_probe.py [key ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark_spark import registry  # noqa: E402
from data_pipeline_spark_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

#: data-proportional representatives (floor-dominated lookups like
#: join_broadcast are pointless to probe — they measure the scheduler)
DEFAULT_PROBES = [
    "filter_pred",
    "agg_basic",
    "join_inner_equi",
    "window_analytic",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_span_exact",
    "keyword_search_bm25",
    "quality_unigram_logprob",
    "basket_pair_affinity",
    "sim_search_pq",
    "repetition_stats",
    "tpch_q18_large_orders",
]


def best_of(fn, runs: int = 3) -> float:
    fn()  # warm-up: Janino compile + C2 JIT
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    probes = sys.argv[1:] or DEFAULT_PROBES
    registry.load_all()
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name, sf):
        df = registry.QUERIES[name](spark, f"/root/testdata/sf{sf}")
        df.write.format("noop").mode("overwrite").save()

    header = f"{'query':28s} " + " ".join(f"sf{sf:>6s}" for sf in SFS)
    print(header + "   x(0.01→0.1)")
    for name in probes:
        times = [best_of(lambda: run(name, sf)) for sf in SFS]
        ratio = times[2] / times[1] if times[1] > 0 else float("inf")
        cells = " ".join(f"{t:7.3f}" for t in times)
        print(f"{name:28s} {cells}   {ratio:5.2f}x")


if __name__ == "__main__":
    main()
