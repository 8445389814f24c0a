#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE full JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "contended_queries": [name, ...], "contended": bool,
     "duckdb": {name: sec, ...}, "ratio": {name: x, ...}}
followed by ONE summary line (metric
"headline_queries_total_runtime_summary" with the scalar totals AND,
since r18, the compact per-key {name: sec} map — the round driver's
per-query comparison parses only this final line, so the map must
ride it; r17 VERDICT ask #1), so an artifact that captures only the
head or tail of the output still carries the headline numbers.

Contention is metered PER QUERY, around exactly its timed runs
(never warm-ups), through three independent signals: external-tree
CPU >15% of the machine, hypervisor steal >8%, and a spin-loop
canary that detects host time-slicing the guest can't see in /proc
at all (effective single-thread CPU speed degraded >1.8× vs
start-of-bench calibration — r8 caught 3-4× inflated queries with
every /proc signal clean). A dirty window is discarded and re-run
(BENCH_RETRIES, default 2); queries listed in `contended_queries`
stayed dirty through every retry — their numbers are inflated and
must not be read as regressions (this class of phantom cost two
judge rounds of chasing).

Each query executes fully (noop sink — no driver collect, no display
cost), so the measured time is scan+compute+shuffle, the thing that
scales. Reports the best of BENCH_RUNS (default 3) executions per
query — steady-state runtime, not first-run JVM JIT warm-up. The
DuckDB oracle for each query runs alongside (best-of-2) and lands in
the JSON as `duckdb`/`ratio` — the practical 2× bar from BASELINE.md,
carried in the artifact itself; BENCH_NO_DUCK=1 skips it,
BENCH_BASELINE=1 additionally prints per-query ratios to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_spark_spark import registry
from data_pipeline_spark_spark.session import get_spark

#: One representative per operator family — the graded surface.
# Best scheduling floor ever observed on THIS host (r14 artifact,
# 1-row noop write). floor_vs_best is only meaningful relative to the
# host the reference was measured on — on a different machine the
# first clean run's floor should replace it (the artifact carries
# both numbers so a reader can re-derive the ratio).
FLOOR_REFERENCE_SEC = 0.066

HEADLINE = [
    "filter_pred",
    "agg_basic",
    "agg_distinct",
    "agg_grouping_sets",
    "join_inner_equi",
    "join_broadcast",
    "join_outer",
    "join_range_asof",
    "window_rank",
    "window_analytic",
    "sort_limit",
    "scalar_json",
    "stream_window_agg",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_span_exact",
    "dedup_semantic",
    "dedup_containment",
    "quality_unigram_logprob",
    "keyword_search_bm25",
    "vocab_oov_report",
    "sim_search",
    "sim_search_pq",
    "sim_search_ivfpq",
    "sim_search_ivfpq_trained",
    "retrieval_hybrid_rrf",
    "corpus_duplication_profile",
    "corpus_duplication_profile_hashed",
    "text_stats",
    "repetition_stats",
    "ts_resample_ohlc",
    "agg_hll_mergeable",
    "udf_surface",
    "merge_upsert",
    "join_fuzzy_string",
    "join_bloom_runtime",
    "window_twa",
    "basket_pair_affinity",
    "basket_pair_affinity_apriori",
    "tidy_supercat_hourly",
    "mv_incremental_refresh",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q21_suppliers_who_kept_waiting",
    "agg_weighted_median",
    "doc_fingerprint_winnow",
    "tokenizer_unigram_segment",
    "quality_bigram_perplexity",
    "corpus_pack_apply",
    # r13 promotions (r12 VERDICT ask 5) — graded green in the r13
    # rotation front, so the r11 "no ungraded headline keys" policy
    # holds for the artifact this list ships in
    "tpch_q9_product_type_profit",
    "retrieval_prf_expand",
    "ts_cusum_changepoint",
    "agg_countmin_sketch",
    # r14 promotions (r13 VERDICT ask 2) — the four cheap keys graded
    # green in the r13 rotation (skyline 0.346 s, ddsketch 0.294 s,
    # welch 0.291 s, bloom 0.572 s at sf0.1); the graph trio stays
    # out (7-24 s absolute cost, SCALE.md round-14)
    "skyline_pareto",
    "agg_ddsketch_quantile",
    "abtest_welch_ttest",
    "dedup_bloom_incremental",
    # r15 promotions (r14 VERDICT ask 3): privacy_dp_count graded
    # green in r14; the other four are the r14 stragglers graded
    # FIRST in the r15 rotation front (operators/__init__.py).
    # Floor sweep at promotion time: dp_count 143% / dp_sum 129% /
    # gopher 96% / skew_kurtosis 117% floor (pure scheduling);
    # ts_acf is 60% floor with a 0.55 s data term — promoted anyway
    # on its sub-linear decades (0.82/1.39/7.61 s) as the headline's
    # honest data-bound TS representative (SCALE.md round-15)
    "privacy_dp_count",
    "privacy_dp_sum",
    "corpus_filter_gopher",
    "agg_skew_kurtosis",
    "ts_acf",
    # r16 promotions (r15 VERDICT ask #6): six r15 keys graded green
    # in the r15 rotation, all floor-flat on their decade probes
    # (abtest_ratio_delta 0.53 s, agg_anova_oneway 0.44,
    # ts_seasonal_strength 0.64, cohort_rfm_segments 0.67,
    # agg_chi_square_indep 0.90, abtest_cuped 0.97 at sf0.1 —
    # SCALE.md round-15); promoted after the clean-window 65-key
    # re-run landed (docs/BENCH_clean_r16.jsonl), so the 65→71 key
    # growth never mixes with the drift triage
    "abtest_ratio_delta",
    "agg_anova_oneway",
    "ts_seasonal_strength",
    "cohort_rfm_segments",
    "agg_chi_square_indep",
    "abtest_cuped",
    # r17 promotions (r16 VERDICT ask #5): seven r16 keys graded
    # green on their first driver row (CORRECTNESS_r16), all
    # floor-flat on their landing probes (agg_entropy_profile
    # 0.63 s, cohort_survival_km 0.70, label_fleiss_kappa 0.72,
    # label_cohens_kappa 0.66, text_readability 0.56, geo_cell_stats
    # 0.66 post-fix, abtest_two_proportion_z 0.48 at sf0.1 —
    # SCALE.md round-16); 71 → 78 keys
    "agg_entropy_profile",
    "cohort_survival_km",
    "label_fleiss_kappa",
    "label_cohens_kappa",
    "text_readability",
    "geo_cell_stats",
    "abtest_two_proportion_z",
]


def execute_fully(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def release_pinned_rdds(spark) -> None:
    """Drop blocks pinned by lazy localCheckpoints from finished
    queries. Several operators checkpoint a reused intermediate
    (basket arrays, sorted shingle sets, …); those blocks live for
    the session, and 31 queries × BENCH_RUNS of them squeeze
    execution memory until late queries spill — measured up to 4×
    inflation on whichever keys happen to run last. A real pipeline
    runs one job per session and never sees this; the bench must
    clean up to keep per-query numbers independent."""
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
    except Exception:
        pass  # cleanup is best-effort; never fail the bench over it


# ---------------------------------------------------------------------------
# contention detection: the round driver sometimes runs bench alongside
# other work, which has produced phantom per-query "regressions" up to
# 2× (r5/r6 postmortems). Measure how much CPU processes OUTSIDE our
# own tree (python + JVM children) burned during the bench window and
# flag the run if they took a meaningful slice of the machine.
# ---------------------------------------------------------------------------


def _busy_jiffies() -> tuple[int, int]:
    """(non-idle, steal) jiffies since boot (/proc/stat cpu line).
    Steal is time the hypervisor ran OTHER tenants while this VM had
    runnable work — invisible to any per-process accounting, and the
    source of the r7 phantom regressions (2-3× inflated queries with
    `contended:false`): a burst of steal inside one query's timed
    window dilutes to nothing when the meter spans the whole run."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals) - idle, steal


def _tree_jiffies() -> int:
    """utime+stime of this process and every live descendant (the
    local-mode JVM is a child, so its executor threads count)."""
    me = os.getpid()
    ppid_of: dict[int, int] = {}
    cpu_of: dict[int, int] = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as fh:
                st = fh.read()
        except OSError:
            continue
        # field 2 (comm) may contain spaces/parens — split after it
        after = st.rsplit(")", 1)[-1].split()
        ppid_of[int(pid_s)] = int(after[1])
        cpu_of[int(pid_s)] = int(after[11]) + int(after[12])  # utime+stime
    total = 0
    for pid, cpu in cpu_of.items():
        p = pid
        for _ in range(64):  # walk up; bounded against ppid cycles
            if p == me:
                total += cpu
                break
            p = ppid_of.get(p, 0)
            if p <= 1:
                break
    return total


def _mem_signals(me: int) -> tuple[float, float] | None:
    """(external_rss_frac, mem_available_frac) of MemTotal — the
    signals the r15 drift slipped past the CPU-only meter: a
    co-resident idle JVM holding a multi-GB heap (the round driver's
    48 GB sf1 probe sessions) burns no CPU during the timed window
    but evicts page cache and squeezes allocation headroom, inflating
    every query a little — a uniform +31% spark-side drift with
    DuckDB flat and `contended:[]` (BENCH_r15 postmortem; the
    interleaved A/B against the r14 tree measured the code delta at
    ~3%, so the rest was host/session state)."""
    try:
        memtotal = memavail = None
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    memtotal = int(line.split()[1]) * 1024
                elif line.startswith("MemAvailable:"):
                    memavail = int(line.split()[1]) * 1024
                if memtotal and memavail:
                    break
        if not memtotal:
            return None
        page = os.sysconf("SC_PAGE_SIZE")
        ppid_of: dict[int, int] = {}
        rss_of: dict[int, int] = {}
        for pid_s in os.listdir("/proc"):
            if not pid_s.isdigit():
                continue
            try:
                with open(f"/proc/{pid_s}/stat") as fh:
                    st = fh.read()
                with open(f"/proc/{pid_s}/statm") as fh:
                    rss_pages = int(fh.read().split()[1])
            except OSError:
                continue
            after = st.rsplit(")", 1)[-1].split()
            pid = int(pid_s)
            ppid_of[pid] = int(after[1])
            rss_of[pid] = rss_pages * page
        external = 0
        for pid, rss in rss_of.items():
            p = pid
            ours = False
            for _ in range(64):
                if p == me:
                    ours = True
                    break
                p = ppid_of.get(p, 0)
                if p <= 1:
                    break
            if not ours:
                external += rss
        # MemAvailable is absent on some kernels/containers — report
        # None rather than 0.0, which would read as "no memory left"
        # and flag every window pressured on a healthy host
        return (
            external / memtotal,
            None if memavail is None else memavail / memtotal,
        )
    except Exception:
        return None


def _spin() -> float:
    """Seconds for a fixed ~15 ms single-thread arithmetic loop — a
    userspace canary for host-level CPU degradation the guest can't
    otherwise see. This VM's hypervisor time-slices WITHOUT reporting
    steal (r8 observation: three queries inflated 3-4× in one bench
    run with zero /proc/stat steal and zero external CPU, clean when
    re-run minutes later), so the only reliable detector is measuring
    effective CPU speed directly."""
    t0 = time.perf_counter()
    x = 0
    for i in range(300_000):
        x += i * i
    return time.perf_counter() - t0


def _calibrate_spin() -> float:
    return min(_spin() for _ in range(7))


class SpinCal:
    """Healthy-machine spin time, tracked as the running minimum of
    every spin sample seen during the bench (min is monotonically
    robust). A one-shot start-of-bench calibration goes blind when
    the host is already degraded at calibration time: the inflated
    baseline makes every later genuinely-contended window look
    clean. Any single clean sample anywhere in the run repairs the
    baseline for the whole run."""

    def __init__(self) -> None:
        self.value = _calibrate_spin()

    def update(self, samples: list[float]) -> None:
        self.value = min(self.value, min(samples))


class ContentionMeter:
    """Samples machine vs own-tree CPU around the timed region; a run
    is `contended` when either (a) processes outside our own tree
    burned > 15% of machine capacity, or (b) the hypervisor stole
    > 8% of the window (other tenants on the host — the signal the
    r7 whole-run meter diluted away). Meter ONE query's timed runs,
    never warm-ups or the whole bench: contention is bursty, and a
    burst must be attributable to the numbers it inflated."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.mem = _mem_signals(os.getpid())
        try:
            (self.busy0, self.steal0) = _busy_jiffies()
            self.tree0 = _tree_jiffies()
            self.ok = True
        except Exception:
            self.ok = False
        return self

    def __exit__(self, *exc):
        self.wall = time.perf_counter() - self.t0
        self.external_frac = None
        self.steal_frac = None
        if self.ok:
            try:
                busy1, steal1 = _busy_jiffies()
                busy = busy1 - self.busy0
                tree = _tree_jiffies() - self.tree0
                hz = os.sysconf("SC_CLK_TCK")
                capacity = self.wall * hz * (os.cpu_count() or 1)
                self.external_frac = max(0.0, (busy - tree) / capacity)
                self.steal_frac = max(0.0, (steal1 - self.steal0) / capacity)
            except Exception:
                pass

    @property
    def memory_pressured(self):
        """External (non-tree) RSS > 20% of RAM, or < 15% of RAM
        available at window open — the co-resident-heap signature
        that is invisible to CPU/steal metering. On a healthy bench
        host external RSS is a few percent (this python + system
        daemons; the JVM is INSIDE the tree), so 20% ≈ a co-resident
        multi-GB process; 15% MemAvailable means the page cache the
        parquet scans rely on is already squeezed.

        TODO (r16 verdict ask #8): all of these meters are
        WINDOW-level — a single-key transient (a co-resident burst
        that lands inside one key's timing and is gone by the
        window close, like corpus_pack_apply's one-off 3.9 s spike
        in r16) is invisible to every one of them. Closing it needs
        per-key sampling (read /proc/stat + MemAvailable around
        each timed run, flag keys whose run straddled a spike); not
        built yet — until then, any single-key cross-round delta
        still requires the solo/A-B protocol before being believed."""
        if self.mem is None:
            return None
        ext_rss, avail = self.mem
        return ext_rss > 0.20 or (avail is not None and avail < 0.15)

    @property
    def contended(self):
        if self.external_frac is None:
            return None
        return (
            self.external_frac > 0.15
            or (self.steal_frac is not None and self.steal_frac > 0.08)
            or self.memory_pressured is True
        )


def _noop_floor(spark) -> float:
    """Min-of-3 1-row noop writes — the multi-core scheduling-floor
    probe. The spin canary is single-threaded and stays clean through
    this host's wave degradation (r17 postmortem: floor_vs_best swung
    1.13→2.88 with every spin/steal/CPU signal green — the hypervisor
    only time-slices multi-core work), so the only per-key detector
    that sees the waves is the same probe the window-level
    floor_vs_best uses, sampled around each key's timed runs. Min of
    3 because a single noop right after a heavy key rides that key's
    GC/AQE-cleanup tail (~1.5-2× self-noise, measured); three
    back-to-back samples always include one past the tail."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        execute_fully(spark.range(1))
        best = min(best, time.perf_counter() - t0)
    return best


def time_query(
    spark,
    name: str,
    sf_dir: str,
    runs: int,
    warmup: int,
    retries: int,
    spin_cal: SpinCal,
) -> tuple[float, bool]:
    """Best-of-``runs`` steady-state seconds for one query, with the
    contention meter scoped to EXACTLY the timed executions (warm-ups
    run before the meter opens — ADVICE r7: metering them dilutes the
    burst signal). A window is dirty when the meter flags external
    CPU/steal OR the spin canary — sampled before, between, and after
    the timed runs — shows effective CPU speed degraded >1.8× vs the
    start-of-bench calibration (hypervisor time-slicing this VM does
    NOT report as steal; r8 saw 3-4× inflated queries with every
    /proc-visible signal clean). Dirty windows are discarded and
    re-run up to ``retries`` times; returns (best_sec,
    still_contended) — True means every attempt was dirty and the
    number must not be read as a regression."""
    # per-query untimed warm-up: the first execution of a plan pays
    # Janino codegen-compile + C2 JIT of the generated classes
    # (measured up to 5× on the heavier plans); timed runs then
    # report steady-state, which is what scales
    for _ in range(warmup):
        execute_fully(registry.QUERIES[name](spark, sf_dir))
    best = float("inf")
    for attempt in range(retries + 1):
        # min-of-3 per sample: the JVM's post-query tail (GC, AQE
        # cleanup) inflates a single spin ~1.2-1.6× for a few ms even
        # on a healthy machine; the 1.8× threshold sits between that
        # self-noise band and the 3-4× host bursts being detected
        spins = [min(_spin() for _ in range(3))]
        with ContentionMeter() as meter:
            attempt_best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                execute_fully(registry.QUERIES[name](spark, sf_dir))
                attempt_best = min(attempt_best, time.perf_counter() - t0)
                spins.append(min(_spin() for _ in range(3)))
        # a contended attempt's floor is still an upper bound — keep
        # the min across attempts so a retry can only improve it
        best = min(best, attempt_best)
        spin_cal.update(spins)  # running min — see SpinCal
        slow_cpu = max(spins) > 1.8 * spin_cal.value
        if meter.contended is not True and not slow_cpu:
            return best, False
    return best, True


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry.load_all()
    spark = get_spark("dps-bench")

    # JIT/session warm-up (not timed): one tiny query end to end
    execute_fully(registry.QUERIES["sort_limit"](spark, sf_dir))

    # measure a LOWER bound on Spark's fixed per-query cost: a 1-row
    # noop write pays planning + one stage + sink commit with zero
    # data work (~0.05 s). Real queries pay that per STAGE plus AQE
    # replan jobs — empirically ~0.2-0.4 s of every sub-second sf0.1
    # number is fixed cost that amortizes to noise at cluster scale;
    # the cross-SF scaling table in docs/SCALE.md (near-flat growth
    # under 10× data) is the direct evidence.
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        execute_fully(spark.range(1))
        floor = min(floor, time.perf_counter() - t0)

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    warmup = int(os.environ.get("BENCH_WARMUP", "1"))
    retries = int(os.environ.get("BENCH_RETRIES", "2"))
    timings: dict[str, float] = {}
    contended_queries: list[str] = []
    spin_cal = SpinCal()
    # Per-key scheduling-floor samples (r16 verdict ask #8 / r17 ask
    # #5): one 1-row-noop floor probe BETWEEN consecutive keys, shared
    # by both neighbours (key i's local floor = min(sample before it,
    # sample after it)), so a host degradation wave that straddles one
    # key's timed runs is attributable to THAT key even when the
    # window-level floor_vs_best stays clean. ~0.07 s × 79 samples of
    # untimed overhead; the timed runs themselves are untouched.
    floor_samples: list[float] = [floor]  # sample 0 = pre-first-key
    for name in HEADLINE:
        best, dirty = time_query(
            spark, name, sf_dir, runs, warmup, retries, spin_cal
        )
        timings[name] = round(best, 3)
        if dirty:
            contended_queries.append(name)
        release_pinned_rdds(spark)
        floor_samples.append(_noop_floor(spark))
    # a key is floor-flagged when even the BETTER of its two
    # neighbouring floor probes ran ≥2× the MEDIAN floor of this run.
    # Median, not min: the probe's clean-window self-noise spans
    # ~1.5× around its own minimum (the first samples additionally
    # ride session warm-up), so a min-referenced 1.4× threshold flags
    # half a healthy run; the r17 wave degradation this flag exists
    # to catch multiplied floors ≥2× (floor_vs_best 1.13→2.88), which
    # clears the 2×-median bar while clean-window jitter does not.
    # A run MOSTLY degraded raises the median and mutes the per-key
    # flag — that case is the window-level floor_vs_best's job.
    srt = sorted(floor_samples)
    median_floor = srt[len(srt) // 2]
    best_local_floor = srt[0]
    key_floor = {
        name: min(floor_samples[i], floor_samples[i + 1])
        for i, name in enumerate(HEADLINE)
    }
    floor_flagged = [
        n for n in HEADLINE if key_floor[n] >= 2.0 * median_floor
    ]

    # DuckDB single-node baseline on the same parquet + SQL oracles —
    # embedded in the JSON so the per-round artifact carries the
    # ratio-vs-baseline directly (no separate solo run needed to judge
    # the 2× bar). BENCH_NO_DUCK=1 skips it (pure Spark timing run).
    duck: dict[str, float] = {}
    if not os.environ.get("BENCH_NO_DUCK"):
        # best-effort baseline: a missing duckdb package, an absent
        # parquet file, or one failing oracle must never cost the
        # Spark timings collected above — the single JSON line is the
        # output contract and still prints with whatever baseline
        # subset succeeded
        try:
            import duckdb

            from data_pipeline_spark_spark.catalog import TABLES

            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            for name in HEADLINE:
                sql = registry.ORACLE_SQL.get(name)
                if not sql:
                    continue
                best_d = float("inf")
                for _ in range(2):  # best-of-2: duckdb has no JIT warm-up
                    t0 = time.perf_counter()
                    con.execute(sql).fetchall()
                    best_d = min(best_d, time.perf_counter() - t0)
                duck[name] = round(best_d, 3)
                if os.environ.get("BENCH_BASELINE"):
                    ratio = (
                        timings[name] / best_d if best_d > 0 else float("inf")
                    )
                    print(
                        f"  baseline {name}: duckdb={best_d:.3f}s "
                        f"spark={timings[name]:.3f}s ratio={ratio:.1f}x",
                        file=sys.stderr,
                    )
        except Exception as exc:  # noqa: BLE001
            print(f"  baseline skipped: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # methodology: per-query untimed warm-ups then best-of-N
        # timed runs (steady-state), per-query contention meter with
        # retry — see time_query
        "runs": runs,
        "warmup": warmup,
        # LOWER bound on the fixed per-query cost (1-row single-stage
        # noop write); multi-stage queries pay ~this per stage + AQE
        # replans. Fixed cost vanishes at cluster scale — see the
        # cross-SF scaling table in docs/SCALE.md
        "spark_floor_sec": round(floor, 3),
        # floor-first triage (r16 window-variance lesson): the floor
        # is pure scheduling, code-independent — its ratio to the
        # best floor ever observed on this host (FLOOR_REFERENCE_SEC)
        # is a direct window-quality multiplier. Read totals only
        # after dividing by this; >1.3 means the window is degraded
        # and cross-round comparisons of absolute walls are invalid.
        # Host-specific by nature: the artifact carries the reference
        # so the ratio is re-derivable anywhere.
        "floor_reference_sec": FLOOR_REFERENCE_SEC,
        "floor_vs_best": round(floor / FLOOR_REFERENCE_SEC, 2),
        # queries whose every timed window saw >15% external CPU or
        # >8% hypervisor steal — their numbers are inflated and must
        # not be read as regressions; [] means every number is clean
        "contended_queries": contended_queries,
        "contended": bool(contended_queries),
        # keys whose surrounding 1-row-noop floor probes BOTH ran
        # ≥2× the MEDIAN floor of this run — the per-key wave-
        # degradation flag (see the floor_samples comment); numbers
        # for these keys were timed inside a degraded slice of the
        # window and must not be read as regressions
        "floor_flagged_queries": floor_flagged,
        "floor_per_key_best": round(best_local_floor, 3),
        "floor_per_key_median": round(median_floor, 3),
        # the raw between-key floor probes (sample i sits between key
        # i-1 and key i), so a reader can re-derive the flags or apply
        # a different threshold post-hoc
        "floor_samples": [round(s, 3) for s in floor_samples],
    }
    mem = _mem_signals(os.getpid())
    if mem is not None:
        # start-vs-end-of-bench host memory state, for the artifact
        # to carry WHY a window was (or should have been) suspect
        out["mem_external_rss_frac"] = round(mem[0], 3)
        if mem[1] is not None:
            out["mem_available_frac"] = round(mem[1], 3)
    if duck:
        out["duckdb"] = duck
        out["duckdb_total"] = round(sum(duck.values()), 3)
        out["ratio"] = {
            k: round(timings[k] / d, 2) for k, d in duck.items() if d > 0
        }
    print(json.dumps(out))
    # BENCH_r08 postmortem: the line above grew long enough (three
    # embedded per-query maps) that the driver's artifact kept only
    # its TAIL and parsed nothing. Follow with a second, short line
    # carrying just the headline scalars so any head- or tail-capture
    # of the output still contains a parseable summary.
    # Truncation-proof per-key detail (BENCH_r09 postmortem: the
    # driver's 2 kB tail capture amputated the embedded per-query
    # maps, so per-key comparison had to be reconstructed). Emit the
    # per-key numbers again as SHORT independent lines, most
    # important LAST so a tail capture keeps them: chunked
    # {key: [spark, duck]} maps, then the 10 slowest keys, then the
    # scalar summary as the final line.
    items = sorted(timings.items(), key=lambda kv: kv[1])
    for i in range(0, len(items), 10):
        chunk = {
            k: [v, duck.get(k)] for k, v in items[i : i + 10]
        }
        print(
            json.dumps(
                {"metric": "per_key_chunk", "spark_duck": chunk},
                separators=(",", ":"),
            )
        )
    slowest = {k: [v, duck.get(k)] for k, v in items[-10:]}
    print(
        json.dumps(
            {"metric": "per_key_slowest10", "spark_duck": slowest},
            separators=(",", ":"),
        )
    )
    summary = {
        "metric": "headline_queries_total_runtime_summary",
        "value": total,
        "unit": "sec",
        "sf": out["sf"],
        "n_queries": len(timings),
        "spark_floor_sec": out["spark_floor_sec"],
        "floor_vs_best": out["floor_vs_best"],
        "contended_queries": contended_queries,
        # r17 VERDICT ask #1: the driver's per-query comparison parses
        # only this final line, so it also carries the full per-key
        # map (additions-only — every pre-existing field above is
        # unchanged, so cross-round scalar comparison stays valid).
        # Compact separators keep the 78-key line ~2.5 kB, inside the
        # driver's tail capture (the r8/r9 truncation postmortems).
        "queries": timings,
        # count of keys whose local floor probes ran ≥2× the run's
        # median floor (per-key wave flag; names in the full line)
        "floor_flagged_n": len(floor_flagged),
    }
    if duck:
        summary["duckdb_total"] = out["duckdb_total"]
        summary["duckdb_n"] = len(duck)
        # ratio over the INTERSECTION only: if an oracle failed
        # mid-loop, duck holds a prefix subset of HEADLINE and a
        # full-total ratio would silently compare mismatched sets;
        # spark_matched is published so ratio_total is reproducible
        # from the summary scalars even when it differs from "value"
        spark_matched = sum(timings[k] for k in duck)
        summary["spark_matched"] = round(spark_matched, 3)
        summary["ratio_total"] = (
            round(spark_matched / out["duckdb_total"], 2)
            if out["duckdb_total"]
            else None
        )
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
