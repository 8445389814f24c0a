"""Zipf skew-stress of the pair rungs and the basket cap
(r11 VERDICT ask #6).

The measured stress corpora to date were density-uniform; this
script builds the adversarial shapes the caps exist for and measures
each rung WITH and WITHOUT its cap:

- **documents skew**: the sf0.1 corpus with a fixed 12-token phrase
  prepended to 50 % of docs — ten identical interior 3-grams each
  land in 2,500 docs, 2.5× over `_SHINGLE_DF_CAP`, and with ~10 hot
  shingles among ~30 per doc most prefixes contain one, so uncapped
  candidate generation owes millions of pairs through the hot runs
  while the capped run anti-joins them out of the prefix explosion.
  Probes `jaccard_pairs` and `containment_pairs` (df_cap None vs
  default), and prints the analytic candidate bound Σ C(df,2) per
  leg so wall moves can be read against the work they bound.
- **basket skew**: sf0.1 lineitem plus (a) one hot part injected
  into 50 % of orders (Zipf head: an item in half the baskets) and
  (b) one mega-basket of 12,000 distinct parts (k²/2 = 72 M pair
  fan-out from a single row). Probes `_basket_affinity_from` with
  item_cap None vs 1,000 (the default 10,000 deliberately does not
  bind at fixture scale — the 1,000 A/B shows what binding does,
  the None leg what unboundedness costs). NB the mega-basket also
  PROMOTES pairs of its items that co-occur once elsewhere to the
  support floor, so the uncapped output is the larger one — the
  documented lower-bound accounting, pinned exactly in
  tests/test_round12_ops.py::test_basket_item_cap_accounting.

Semantics under the caps (what is dropped) are pinned by
tests/test_dedup_recall.py::test_df_cap_bounds_hot_shingle_blowup and
tests/test_round12_ops.py::test_basket_item_cap_accounting /
test_containment_df_cap_accounting; THIS script records the wall
numbers for docs/SCALE.md.

Usage: python scripts/skew_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "dps_skew_docs")


def _skew_docs(spark) -> str:
    import shutil

    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load

    target = os.path.join(DOCS_DIR, "documents.parquet")
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return DOCS_DIR
    shutil.rmtree(DOCS_DIR, ignore_errors=True)
    docs = load(spark, "/root/testdata/sf0.1", "documents")
    phrase = " ".join(f"zipf{i}" for i in range(12)) + " "
    skewed = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(phrase), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text").cast("long"))
    skewed.write.mode("overwrite").parquet(target)
    return DOCS_DIR


def main() -> None:
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _basket_affinity_from,
    )
    from data_pipeline_spark_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )
    from data_pipeline_spark_spark.session import (
        adaptive_shuffle_width,
        get_spark,
    )

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(tag, fn):
        n = fn()  # warm: Janino + C2 + broadcast machinery
        sec = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            sec = min(sec, round(time.perf_counter() - t0, 2))
        print(json.dumps({"probe": tag, "sec": sec, "rows": n}), flush=True)
        return sec, n

    # ---- documents skew --------------------------------------------
    from data_pipeline_spark_spark.operators.dedup import _shingle_sets

    d = load(spark, _skew_docs(spark), "documents")
    hot_df = d.filter(F.col("text").startswith("zipf0 zipf1")).count()
    # analytic candidate bound Σ C(df,2) over full-shingle dfs, with
    # and without dropping the >cap shingles — the work the df-cap
    # actually removes, independent of timing noise
    dfs = (
        _shingle_sets(d)
        .select(F.explode("sh").alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("df"))
    )
    bound = dfs.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("all"),
        F.sum(
            F.when(
                F.col("df") <= 1000, F.col("df") * (F.col("df") - 1) / 2
            ).otherwise(F.lit(0))
        ).alias("capped"),
        F.max("df").alias("max_df"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "probe": "setup_docs",
                "hot_docs": hot_df,
                "cand_bound_uncapped": int(bound["all"]),
                "cand_bound_capped": int(bound["capped"]),
                "max_df": bound["max_df"],
            }
        ),
        flush=True,
    )
    timed("jaccard_capped", lambda: jaccard_pairs(d).count())
    timed(
        "jaccard_uncapped",
        lambda: jaccard_pairs(d, df_cap=None).count(),
    )
    timed("containment_capped", lambda: containment_pairs(d).count())
    timed(
        "containment_uncapped",
        lambda: containment_pairs(d, df_cap=None).count(),
    )

    # ---- basket skew ------------------------------------------------
    li = load(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    hot = (
        li.select("l_orderkey")
        .distinct()
        .filter(F.col("l_orderkey") % 2 == 0)
        .select("l_orderkey", F.lit(999_999).cast("long").alias("l_partkey"))
    )
    mega = spark.range(12000).select(
        F.lit(99_999_999).cast("long").alias("l_orderkey"),
        F.col("id").alias("l_partkey"),
    )
    fact = li.unionByName(hot).unionByName(mega).localCheckpoint()
    width = adaptive_shuffle_width(fact)
    timed(
        "basket_cap1000",
        lambda: _basket_affinity_from(fact, width, item_cap=1000).count(),
    )
    timed(
        "basket_cap_default10000",
        lambda: _basket_affinity_from(fact, width).count(),
    )
    timed(
        "basket_uncapped",
        lambda: _basket_affinity_from(fact, width, item_cap=None).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
