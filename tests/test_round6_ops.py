"""Constructed-input semantics + plan-shape tests for the round-6
operators: SymSpell fuzzy join exactness, MERGE three-op semantics,
SCD2 interval chaining, interpolation boundary cases, and the runtime
Bloom-filter injection that join_bloom_runtime exists to demonstrate.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_fuzzy_blocking_is_exact_for_ed1(spark):
    """Symmetric-deletion blocking must recall EVERY edit-distance-1
    pair: substitution, insertion/deletion, and transposition-as-2
    (excluded) cases, across differing first characters (the case
    naive prefix blocking drops)."""
    names = [
        "red bolt",   # sub at pos 1 vs "rad bolt"
        "rad bolt",
        "cold gear",  # deletion vs "old gear" — first char differs!
        "old gear",
        "widget",     # insertion vs "widgets"
        "widgets",
        "anvil",      # ed 2 from everything — must NOT pair
    ]
    d = spark.createDataFrame([(n,) for n in names], "p_name string")
    keyed = d.select(
        "p_name",
        F.explode(
            F.expr(
                "array_union(array(xxhash64(p_name)),"
                " transform(sequence(1, length(p_name)),"
                "  i -> xxhash64(concat(substring(p_name, 1, i-1),"
                "                       substring(p_name, i+1, length(p_name))))))"
            )
        ).alias("k"),
    )
    a = keyed.toDF("name_a", "k")
    b = keyed.toDF("name_b", "k")
    got = {
        (r.name_a, r.name_b)
        for r in (
            a.join(b, "k")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b")
            .distinct()
            .filter(F.levenshtein("name_a", "name_b") <= 1)
            .collect()
        )
    }
    assert got == {
        ("rad bolt", "red bolt"),
        ("cold gear", "old gear"),
        ("widget", "widgets"),
    }


def test_merge_upsert_three_ops(spark, sf_dir):
    """MERGE semantics on the fixture: updated keys get +100 balance,
    deleted keys vanish, inserted keys appear once with the new-key
    name, and untouched rows ride through unchanged."""
    from data_pipeline_spark_spark.operators.cdc import merge_upsert
    from data_pipeline_spark_spark.catalog import load

    before = {
        r.c_custkey: r.c_acctbal
        for r in load(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .collect()
    }
    after = {r.c_custkey: r for r in merge_upsert(spark, sf_dir).collect()}

    mx = max(before) + 1
    deleted = [k for k in before if k % 101 == 0]
    updated = [k for k in before if k % 7 == 0 and k % 101 != 0]
    inserted = [k + mx for k in before if k % 97 == 0]
    untouched = [
        k for k in before if k % 7 != 0 and k % 101 != 0
    ]
    assert deleted and updated and inserted and untouched  # fixture hits all
    for k in deleted:
        assert k not in after
    for k in updated:
        assert after[k].c_acctbal == before[k] + 100.0
    for k in inserted:
        assert after[k].c_name == f"new-{k}"
        assert after[k].c_acctbal == before[k - mx]
    for k in untouched[:50]:
        assert after[k].c_acctbal == before[k]


def test_scd2_intervals_chain(spark):
    """Versions must chain: valid_to of row N = valid_from of row N+1
    per user, exactly one is_current row per user, ties broken by
    event_id."""
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, 10.0, t0, 100, "purchase"),
        (1, 20.0, t0 + datetime.timedelta(hours=2), 101, "purchase"),
        (1, 30.0, t0 + datetime.timedelta(hours=2), 102, "purchase"),  # tie
        (2, 5.0, t0, 103, "purchase"),
        (2, 6.0, t0 + datetime.timedelta(days=1), 104, "view"),  # filtered
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, value double, ts timestamp, event_id long,"
        " event_type string"
    )
    from pyspark.sql.window import Window

    # replicate via the same window the operator uses, on constructed data
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "value", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    out = obs.select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).collect()
    u1 = sorted(
        [r for r in out if r.user_id == 1],
        key=lambda r: (r.valid_from, r.value),
    )
    # chain: each valid_to equals the next valid_from
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from  # tie ordered by event_id
    assert u1[2].valid_to is None
    [u2] = [r for r in out if r.user_id == 2]
    assert u2.valid_to is None  # the view event was filtered out


def test_ts_interpolate_boundaries(spark, sf_dir):
    """Observed points pass through untouched; interior gaps are a
    strict convex combination of the bracketing observations; leading/
    trailing gaps take the nearest observation."""
    from data_pipeline_spark_spark.operators.analytics import ts_interpolate

    out = ts_interpolate(spark, sf_dir)
    gaps = out.filter(F.col("filled") == 1)
    n_gaps = gaps.count()
    if n_gaps:  # fixture-dependent; interior gaps must be bounded
        bad = (
            out.withColumn(
                "lo",
                F.min(F.when(F.col("filled") == 0, F.col("value_interp"))).over(
                    __import__(
                        "pyspark.sql.window", fromlist=["Window"]
                    ).Window.partitionBy("user_id")
                ),
            )
            .withColumn(
                "hi",
                F.max(F.when(F.col("filled") == 0, F.col("value_interp"))).over(
                    __import__(
                        "pyspark.sql.window", fromlist=["Window"]
                    ).Window.partitionBy("user_id")
                ),
            )
            .filter(
                (F.col("value_interp") < F.col("lo") - 1e-9)
                | (F.col("value_interp") > F.col("hi") + 1e-9)
            )
            .count()
        )
        assert bad == 0
    # every grid hour between the user's min and max is present (dense)
    per_user = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (
            (F.max("grid_ts").cast("long") - F.min("grid_ts").cast("long"))
            / 3600
            + 1
        ).alias("expect"),
    )
    assert per_user.filter(F.col("n") != F.col("expect")).count() == 0


def test_bloom_runtime_filter_injected(spark, sf_dir):
    """The whole point of join_bloom_runtime: the optimized plan must
    carry a bloom-filter might_contain probe on the fact side, and the
    session knobs it tweaks must be restored afterwards."""
    from data_pipeline_spark_spark.operators.scale_patterns import (
        join_bloom_runtime,
    )

    k_scan = (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    k_bcast = "spark.sql.autoBroadcastJoinThreshold"
    before = (spark.conf.get(k_scan), spark.conf.get(k_bcast))
    df = join_bloom_runtime(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan
    assert (spark.conf.get(k_scan), spark.conf.get(k_bcast)) == before


def test_twa_step_semantics(spark):
    """LOCF step weighting: value holds until the next sample, final
    sample carries no weight; zero-span series fall back to the
    mean."""
    import datetime

    from pyspark.sql.window import Window

    t0 = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        # user 1: 1.0 holds 10s, then 3.0 (no weight) -> twa 1.0
        (1, 1.0, t0, 1),
        (1, 3.0, t0 + datetime.timedelta(seconds=10), 2),
        # user 2: single sample -> mean fallback
        (2, 7.0, t0, 3),
        # user 3: two samples at the SAME instant -> mean fallback
        (3, 2.0, t0, 4),
        (3, 4.0, t0, 5),
        # user 4: 1.0 for 10s then 2.0 for 30s -> (10+60)/40 = 1.75
        (4, 1.0, t0, 6),
        (4, 2.0, t0 + datetime.timedelta(seconds=10), 7),
        (4, 9.0, t0 + datetime.timedelta(seconds=40), 8),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, value double, ts timestamp, event_id long"
    )
    e = ev.select(
        "user_id",
        F.round(F.col("value") * 1000).cast("bigint").alias("v_mv"),
        F.col("ts").cast("long").alias("sec"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select("user_id", "v_mv", "sec", F.lead("sec").over(w).alias("nxt"))
    g = o.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(
                F.col("v_mv") * (F.col("nxt") - F.col("sec"))
            )
        ).alias("num"),
        F.sum(
            F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(
                F.col("nxt") - F.col("sec")
            )
        ).alias("den"),
        F.count("*").alias("n_obs"),
        F.sum("v_mv").alias("sum_mv"),
    )
    twa = F.when(
        F.col("den") > 0,
        F.col("num").cast("double")
        / (F.lit(1000.0) * F.col("den").cast("double")),
    ).otherwise(F.col("sum_mv").cast("double") / (F.lit(1000.0) * F.col("n_obs")))
    got = {r.user_id: r.twa for r in g.select("user_id", twa.alias("twa")).collect()}
    assert got[1] == 1.0
    assert got[2] == 7.0
    assert got[3] == 3.0   # mean of 2.0 and 4.0
    assert got[4] == 1.75  # (1.0*10 + 2.0*30) / 40


def test_mv_refresh_empty_delta(spark, sf_dir):
    """With every row before the cutoff the delta aggregate is empty
    and the merged MV must equal the plain recompute — the
    degenerate-refresh invariant."""
    from data_pipeline_spark_spark.catalog import load

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.year("l_shipdate").alias("ship_year"),
        "l_shipdate",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    keys = ["l_returnflag", "ship_year"]

    def agg(df):
        return df.groupBy(*keys).agg(
            F.count("*").alias("n_items"), F.sum("cents").alias("revenue_c")
        )

    cutoff = "2999-01-01"  # nothing after
    hist = agg(li.filter(F.col("l_shipdate") < F.lit(cutoff)))
    delta = agg(li.filter(F.col("l_shipdate") >= F.lit(cutoff)))
    assert delta.count() == 0
    h = hist.toDF("l_returnflag", "ship_year", "n_h", "rev_h")
    d = delta.toDF("l_returnflag", "ship_year", "n_d", "rev_d")
    zero = F.lit(0).cast("bigint")
    merged = h.join(d, keys, "full_outer").select(
        "l_returnflag",
        "ship_year",
        (F.coalesce("n_h", zero) + F.coalesce("n_d", zero)).alias("n_items"),
        (F.coalesce("rev_h", zero) + F.coalesce("rev_d", zero)).alias("revenue_c"),
    )
    full = agg(li)
    a = {tuple(r[:2]): tuple(r[2:]) for r in merged.collect()}
    b = {tuple(r[:2]): tuple(r[2:]) for r in full.collect()}
    assert a == b


def test_upsert_merge_order_independence(spark):
    """The foreachBatch merge comparator (ts, event_id) must converge
    to the same state regardless of which batch a row arrives in —
    replay two opposite arrival orders through the same merge logic."""
    import datetime

    from pyspark.sql.window import Window as BW

    t0 = datetime.datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        (1, 10.0, t0, 1),
        (1, 20.0, t0 + datetime.timedelta(hours=1), 2),
        (2, 5.0, t0, 3),
        (2, 6.0, t0, 4),   # same ts — event_id must break the tie
    ]
    schema = "user_id long, value double, ts timestamp, event_id long"

    def latest(batch):
        w = BW.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            batch.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "value", "ts", "event_id")
        )

    def merge(cur, batch):
        new = latest(batch)
        if cur is None:
            return new
        o, n = cur.alias("o"), new.alias("n")
        j = o.join(n, "user_id", "full_outer")
        newer = (F.col("n.ts") > F.col("o.ts")) | (
            (F.col("n.ts") == F.col("o.ts"))
            & (F.col("n.event_id") > F.col("o.event_id"))
        )
        pick = F.col("o.ts").isNull() | (F.col("n.ts").isNotNull() & newer)
        return j.select(
            "user_id",
            *[
                F.when(pick, F.col(f"n.{c}"))
                .otherwise(F.col(f"o.{c}"))
                .alias(c)
                for c in ("value", "ts", "event_id")
            ],
        )

    def run(order):
        state = None
        for batch_rows in order:
            state = merge(state, spark.createDataFrame(batch_rows, schema))
        return {
            r.user_id: (r.value, r.event_id) for r in state.collect()
        }

    fwd = run([rows[:2], rows[2:]])
    rev = run([rows[2:], rows[:2]])
    one_by_one_reversed = run([[r] for r in reversed(rows)])
    assert fwd == rev == one_by_one_reversed
    assert fwd[1] == (20.0, 2)
    assert fwd[2] == (6.0, 4)  # tie at same ts -> larger event_id wins
