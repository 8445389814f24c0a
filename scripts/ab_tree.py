#!/usr/bin/env python
"""One arm of the interleaved A/B bench (r15 VERDICT ask #1).

Runs the drifted common-basket keys in a FRESH session against the
tree given as argv[1] (the live repo or a scratch checkout of the
r14 driver commit), prints one JSON line per invocation. The
orchestrator alternates invocations of this script between the two
trees in the same minute on the same host, so any host/session drift
hits both arms equally — the only protocol under which a spark-side
delta is attributable to code (SCALE.md, r14 triage lesson).

Method per key: one warm run of the exact plan (JIT, broadcasts),
then best-of-3 timed runs with a noop sink; pinned localCheckpoint
blocks released between keys exactly as bench.py does.

    python scripts/ab_tree.py /root/repo          # current tree
    python scripts/ab_tree.py /root/repo/.ab_r14  # r14 scratch tree
"""

from __future__ import annotations

import json
import sys
import time

TREE = sys.argv[1]
sys.path.insert(0, TREE)

# The 8 keys the r15 verdict names as uniformly drifted (+31% class)
# on code-identical paths; all exist in both trees. AB_KEYS
# (comma-separated env var) overrides the list — the r17 optimization
# round A/Bs its changed keys against the pre-round commit this way.
import os  # noqa: E402

KEYS = [
    "sim_search_pq",
    "corpus_duplication_profile_hashed",
    "dedup_semantic",
    "quality_unigram_logprob",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "join_inner_equi",
    "tpch_q21_suppliers_who_kept_waiting",
]
if os.environ.get("AB_KEYS"):
    KEYS = os.environ["AB_KEYS"].split(",")

SF = "/root/testdata/sf0.1"


def main() -> None:
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.session import get_spark

    registry.load_all()
    spark = get_spark("ab-" + ("cur" if TREE.rstrip("/").endswith("repo") else "r14"))
    spark.sparkContext.setLogLevel("ERROR")

    def release() -> None:
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass

    out: dict[str, float] = {}
    for key in KEYS:
        fn = registry.QUERIES[key]
        fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[key] = round(best, 3)
        release()
    print(json.dumps({"tree": TREE, "t": round(time.time()), "keys": out}))
    spark.stop()


if __name__ == "__main__":
    main()
