"""Floor decomposition sweep over every bench HEADLINE key: wall at
sf0.001 (zero-data ≈ pure scheduling floor), wall at sf0.1, job count
per execution (statusTracker), and the implied data-proportional
remainder. Extends r10's per-key floor analyses (which covered keys
>1 s) to the whole headline set in one reproducible artifact.

Usage: python scripts/floor_sweep.py [key_prefix]
Prints one JSON line per key plus a closing table sorted by
remainder — the keys worth optimizing are the ones whose sf0.1 wall
is NOT mostly floor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import HEADLINE, release_pinned_rdds

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.session import get_spark

    prefix = sys.argv[1] if len(sys.argv) > 1 else ""
    registry.load_all()
    spark = get_spark("floor-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    def run(name, sf):
        registry.QUERIES[name](spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    rows = []
    for name in HEADLINE:
        if not name.startswith(prefix):
            continue
        rec = {"key": name}
        for label, sf_dir in (
            ("floor", "/root/testdata/sf0.001"),
            ("sf01", "/root/testdata/sf0.1"),
        ):
            run(name, sf_dir)  # warm the exact plan
            j0 = len(st.getJobIdsForGroup(None))
            times = []
            for _ in range(3):
                t0 = time.time()
                run(name, sf_dir)
                times.append(time.time() - t0)
            rec[label] = round(min(times), 3)
            rec[f"{label}_jobs"] = (
                len(st.getJobIdsForGroup(None)) - j0
            ) / 3
            release_pinned_rdds(spark)
        rec["remainder"] = round(rec["sf01"] - rec["floor"], 3)
        rec["floor_pct"] = (
            round(100 * rec["floor"] / rec["sf01"]) if rec["sf01"] else 0
        )
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    rows.sort(key=lambda r: -r["remainder"])
    print("\nkey                                      floor  sf0.1  rem   floor%  jobs")
    for r in rows:
        print(
            f"{r['key']:40s} {r['floor']:6.3f} {r['sf01']:6.3f} "
            f"{r['remainder']:5.2f}  {r['floor_pct']:4d}%  "
            f"{r['sf01_jobs']:.0f}"
        )


if __name__ == "__main__":
    main()
