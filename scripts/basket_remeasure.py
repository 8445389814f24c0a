"""Fresh solo re-measure of the basket pair (r10 VERDICT ask #3).

The r10 driver bench drifted non-uniformly (spark 0.87→1.05 s /
1.10→1.29 s while the DuckDB twins got FASTER 0.218→0.134 s), which
is not the uniform-both-engines host-noise signature — so: a clean
uncontended measurement of both rungs at sf0.1 (steady state,
best-of-3 after a warm run of the exact plan) plus the sf0.001
zero-data floor run with a statusTracker job count, same method as
the sim_search_ivfpq floor closure.

Usage: python scripts/basket_remeasure.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ["basket_pair_affinity", "basket_pair_affinity_apriori"]


def main() -> None:
    import duckdb

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.session import get_spark

    registry.load_all()
    spark = get_spark("basket-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    def run(name, sf):
        registry.QUERIES[name](spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    for sf_dir in ("/root/testdata/sf0.1", "/root/testdata/sf0.001"):
        for name in KEYS:
            run(name, sf_dir)  # warm the exact plan (JIT, broadcasts)
            jobs0 = len(st.getJobIdsForGroup(None))
            times = []
            for _ in range(3):
                t0 = time.time()
                run(name, sf_dir)
                times.append(round(time.time() - t0, 3))
            jobs = (len(st.getJobIdsForGroup(None)) - jobs0) / 3
            out = {
                "key": name,
                "sf": sf_dir.rsplit("sf", 1)[1],
                "best": min(times),
                "all": times,
                "jobs_per_exec": jobs,
            }
            if sf_dir.endswith("0.1"):
                con = duckdb.connect()
                for t in (
                    "region nation customer supplier part orders "
                    "lineitem events documents embeddings"
                ).split():
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf_dir}/{t}.parquet'"
                    )
                sql = registry.ORACLE_SQL[name]
                con.execute(sql).fetchall()  # warm
                dt = []
                for _ in range(2):
                    t0 = time.time()
                    con.execute(sql).fetchall()
                    dt.append(round(time.time() - t0, 3))
                out["duck_best"] = min(dt)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
