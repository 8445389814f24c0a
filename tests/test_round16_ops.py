"""Round-16 additions: phash band-width auto-resolution (the r15
verdict's unwired scale knob) with a probe straddling the switch
threshold, and the dst-partitioned LPA loop."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_resolve_phash_bands_threshold():
    """Pure-arithmetic pin of the resolver: 8 bands up to exactly
    n = _PH_DENSITY·2^8/8 = 1600 items, 4 bands beyond, floor at 4
    forever (the 128-bit-hash note covers the far end)."""
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_DENSITY,
        resolve_phash_bands,
    )

    switch = _PH_DENSITY * (1 << 8) // 8
    assert switch == 1600
    assert resolve_phash_bands(1) == 8
    assert resolve_phash_bands(505) == 8  # the sf0.01 grading shape
    assert resolve_phash_bands(switch) == 8
    assert resolve_phash_bands(switch + 1) == 4
    assert resolve_phash_bands(50_000) == 4  # the sf1 cliff shape
    assert resolve_phash_bands(1_000_000) == 4


def test_phash_auto_band_switch_straddle(spark):
    """Straddling probe for the auto threshold (the r15 graph-cap
    lesson: a size-resolved plan switch gets evidence just below AND
    just above the switch point). Two populations bracketing the
    1600-item switch, drawn from the same fixture rows; on each
    side, the auto-resolved band join filtered to the COMMON
    certified radius (hamming ≤ 3) must equal the 8-band reference
    at that radius — the switch changes the plan and the certificate
    width, never which ≤3 pairs exist."""
    from data_pipeline_spark_spark.catalog import fan_out, load
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_CELLS,
        phash64,
        phash_near_dup_pairs,
        resolve_phash_bands,
    )

    # sf0.1 has ~5071 eligible items; slice two bracketing subsets.
    # Near-dups must exist INSIDE each subset, so plant companions
    # for the retained rows rather than relying on fixture ids.
    d = load(spark, "/root/testdata/sf0.1", "documents")
    base = (
        d.filter(F.expr(f"octet_length(encode(text, 'UTF-8')) >= {_PH_CELLS}"))
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    # totals: 1000 base → 1502 items (below 1600), 1100 → 1652
    # (above) — measured on the fixture, asserted below
    for n_base, want_bands in ((1000, 8), (1100, 4)):
        sub = base.limit(n_base)
        planted = sub.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.expr(
                "concat(substr(text, 1, length(text) div 4 - 1), 'Z',"
                " substr(text, length(text) div 4 + 1,"
                "        length(text) div 2 - length(text) div 4 - 1),"
                " 'Z', substr(text, length(text) div 2 + 1))"
            ).alias("text"),
        )
        pop = fan_out(sub.unionByName(planted)).withColumn(
            "payload", F.encode("text", "UTF-8")
        )
        bits = phash64(pop).localCheckpoint()
        n = bits.count()
        bands = resolve_phash_bands(n)
        assert bands == want_bands, (n, bands)
        auto = sorted(
            tuple(r)
            for r in phash_near_dup_pairs(bits, bands=bands)
            .filter("hamming <= 3")
            .collect()
        )
        ref = sorted(
            tuple(r)
            for r in phash_near_dup_pairs(bits, bands=8)
            .filter("hamming <= 3")
            .collect()
        )
        assert auto == ref and auto, (n, bands, len(auto), len(ref))


def test_phash_registered_keys_use_resolver(spark):
    """The REGISTERED keys route through the resolver (the r15 gap
    was exactly that the knob existed but nothing selected it): at
    the sf0.01 grading fixture the population is 505 items → 8
    bands → the fixed maxh-7 oracle stays exact, and the pair set
    matches the explicit 8-band call bit-for-bit."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.multimodal import (
        _ph_population,
        phash64,
        phash_near_dup_pairs,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.01"
    got = sorted(
        tuple(r)
        for r in registry.QUERIES["multimodal_phash_near_dup"](
            spark, sf
        ).collect()
    )
    bits = phash64(_ph_population(spark, sf)).localCheckpoint()
    assert bits.count() == 505  # the documented grading shape
    want = sorted(
        tuple(r) for r in phash_near_dup_pairs(bits, bands=8).collect()
    )
    assert got == want and got
