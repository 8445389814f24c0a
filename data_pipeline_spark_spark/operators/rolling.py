"""Size-resolved trailing ROWS-frame machinery shared by the
per-event rolling annotators ([[ts_bollinger_bands]],
[[window_rolling_median]]) — the generalization of the ACF family's
bucketed escape (analytics.py `_acf_moment_frame`, r16) to per-ROW
rolling outputs (r16 verdict ask #2: the two keys carried the
audited-but-unwired low-cardinality-series sort hazard).

The hazard: a rolling frame `Window.partitionBy(series).orderBy(...)
.rowsBetween(-(N-1), 0)` funnels each series through ONE sort task.
With a handful of series (events has 5 event_type values) one task
sorts ~a fifth of the table — an executor's worth of spill at 100×
fixture scale. The escape partitions the sort by (series, time
bucket) instead — thousands of bounded sorts — and repairs the rows
whose frame crosses a bucket boundary EXACTLY:

1. In-bucket frame over (series, b = floor(sec/width)) ordered by
   (sec, event_id). b is monotone in sec, so in-bucket order ==
   global order; a row with in-bucket rank rn ≥ N already sees its
   whole N-row frame.
2. Global position g = (exclusive running sum of bucket sizes over
   the per-series bucket DIM frame — the only sequential-per-series
   fold, and it is dim-sized) + rn.
3. A HEAD (rn ≤ N−1) is missing exactly the predecessors at global
   positions [g−(N−1), g−rn]; every such predecessor lies within
   N−2 of its OWN bucket's end (its position is ≥ g−N+1 and its
   bucket ends at ≤ g−rn ≤ g−1), so the K-deep TAIL fringe
   (bsz − rn < K, K = N−1) contains them all — the ACF pigeonhole,
   verbatim.
4. The head↔tail range join is blocked on g div K: the wanted
   interval [g−K, g−rn] has width ≤ K, so it meets at most two
   K-blocks — each head probes 2 buckets and the broadcast hash
   join yields O(K) candidates per head instead of scanning every
   same-series tail (the r16 session-4 fringe-join fix, 1-D
   geo-grid pigeonhole).

Both consumers fold EXACT integers (milli-unit moments, sorted
integer frames), and addition/multiset-union is associative, so the
split can never change an output bit — pinned per key by
bit-equality and straddling tests (tests/test_round17_ops.py),
mirroring the ACF suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

#: Row count above which the rolling keys switch from the
#: single-window form to the bucketed form. Same MEASURED rationale
#: as analytics._ACF_SERIES_FORM_MAX_ROWS (interleaved A/B, r16):
#: the single-window form wins every fixture decade (parallel
#: in-memory sorts, no repair machinery), and the hazard it guards
#: against — one task sorting and spilling a whole series — needs a
#: series beyond single-task sort capacity, ~1e8 rows as a
#: conservative floor. Resolution uses the TOTAL row count (one
#: metadata-cheap count(), the pagerank node-count precedent).
SERIES_FORM_MAX_ROWS = 100_000_000

#: Default bucket width (seconds). Correctness is width-INDEPENDENT
#: (the global-position repair handles buckets smaller than the
#: frame, and empty buckets simply never appear in the DIM frame),
#: so this is pure plan shape — tested at 60 s and 86 400 s.
ROLLING_BUCKET_SEC = 3600

#: Density target for [[resolve_bucket_sec]]: aim for ~this many
#: rows per (series, bucket). Sparse buckets are the bucketed form's
#: one cost cliff — when typical occupancy drops below the frame
#: width K, EVERY row is fringe (bsz − rn < K), the head/tail frames
#: approach the whole table, and the repair join dominates (measured
#: r17: a 300k-row sample spread over the full sf1 time span ran the
#: hourly-bucket form at ~6× its dense-bucket cost). ~4k rows per
#: bucket keeps the fringe ≤ ~1% of rows for K ≤ 40 while leaving
#: thousands of parallel sorts at engagement scale.
ROLLING_TARGET_BUCKET_ROWS = 4096


def resolve_bucket_sec(
    m: DataFrame,
    n_rows: int,
    series_col: str = "event_type",
    default: int = ROLLING_BUCKET_SEC,
) -> int:
    """Resolve the bucket width from the stream's measured time
    density so a typical (series, bucket) holds
    ~[[ROLLING_TARGET_BUCKET_ROWS]] rows — never narrower than
    ``default``. A pure PLAN knob: the repair is width-independent
    by construction and bit-equality-tested at 60 s and 86 400 s, so
    this resolver can only change cost, never an answer (the phash
    lesson, r16). One tiny aggregate over ``m`` — only ever run on
    the bucketed arm, i.e. above the row-count cutoff where one
    more metadata pass is noise."""
    stats = m.agg(
        F.min("sec").alias("lo"),
        F.max("sec").alias("hi"),
        F.countDistinct(series_col).alias("k"),
    ).first()
    if stats["lo"] is None:
        return default
    span = max(1, int(stats["hi"]) - int(stats["lo"]) + 1)
    k = max(1, int(stats["k"]))
    width = (
        span * k * ROLLING_TARGET_BUCKET_ROWS // max(1, n_rows)
    ) + 1
    return max(default, width)


def bucketed_positions(
    m: DataFrame, bucket_sec: int = ROLLING_BUCKET_SEC
) -> tuple[DataFrame, DataFrame]:
    """Bucket the series stream and attach in-bucket ranks.

    ``m`` must carry ``(event_type, sec, event_id, x)`` with
    (sec, event_id) a strict total order per event_type. Returns
    ``(lagged, offs)``:

    - ``lagged``: m + ``b`` (time bucket), ``rn`` (in-bucket rank,
      BIGINT — row_number() is int32 and feeds position arithmetic,
      parity hazard #7), ``bsz`` (bucket size), localCheckpointed —
      the frame feeds both the in-bucket window pass and the fringe
      extraction, and column pruning would otherwise re-run the
      (type, b) sort per consumer (the ACF/LPA checkpoint
      precedent).
    - ``offs``: per (event_type, b) EXCLUSIVE running bucket-size
      sum — the dim-sized global-position offset frame.
    """
    mb = m.withColumn("b", F.floor(F.col("sec") / F.lit(bucket_sec)))
    wb = Window.partitionBy("event_type", "b").orderBy("sec", "event_id")
    # whole-partition frame is safe HERE: the partition is one time
    # bucket, bounded by bucket width × arrival rate, never a series
    wsz = Window.partitionBy("event_type", "b")
    lagged = mb.select(
        "*",
        F.row_number().over(wb).cast("bigint").alias("rn"),
        F.count("*").over(wsz).alias("bsz"),
    ).localCheckpoint(eager=False)
    sizes = lagged.groupBy("event_type", "b").agg(
        F.count("*").alias("n_b")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "event_type",
        "b",
        F.coalesce(F.sum("n_b").over(wcum), F.lit(0)).alias("off"),
    )
    return lagged, offs


def carried_predecessors(
    lagged: DataFrame, offs: DataFrame, n_frame: int
) -> DataFrame:
    """One row per (head row, carried predecessor): the exact set of
    frame members that live in EARLIER buckets than their head.
    Keyed ``(event_type, b, rn)`` — unique per head row — plus the
    predecessor's global position ``gt`` and value ``xt``. A head at
    global g with in-bucket rank rn wants positions [g−K, g−rn]
    (K = n_frame−1): ranks 1..rn are its in-bucket frame already.
    Both fringe frames are K-deep per (type, bucket) — bucket-DIM-
    proportional, never data-proportional — so the broadcast is
    bounded by the time span, not the table size."""
    K = n_frame - 1
    fringe = lagged.filter(
        (F.col("rn") <= K) | (F.col("bsz") - F.col("rn") < K)
    ).join(F.broadcast(offs), ["event_type", "b"])
    heads = fringe.filter(F.col("rn") <= K).select(
        "event_type",
        "b",
        "rn",
        (F.col("off") + F.col("rn")).alias("g"),
    )
    tails = fringe.filter(F.col("bsz") - F.col("rn") < K).select(
        "event_type",
        (F.col("off") + F.col("rn")).alias("g"),
        F.col("x").alias("xt"),
    )
    # Block on g div K (1-D grid pigeonhole): the wanted interval
    # [g−K, g−rn] has width ≤ K, so it meets ≤ 2 K-blocks; each head
    # probes exactly those two and the hash join delivers O(K)
    # candidates per head instead of every same-type tail.
    h = (
        heads.select(
            "*", F.explode(F.array(F.lit(0), F.lit(1))).alias("dx")
        )
        .select(
            "event_type",
            "b",
            "rn",
            "g",
            (F.floor((F.col("g") - K) / F.lit(K)) + F.col("dx")).alias(
                "blk"
            ),
        )
        .alias("h")
    )
    t = tails.withColumn(
        "blk", F.floor(F.col("g") / F.lit(K))
    ).alias("t")
    return h.join(
        F.broadcast(t),
        (F.col("h.event_type") == F.col("t.event_type"))
        & (F.col("h.blk") == F.col("t.blk"))
        & (F.col("t.g") >= F.col("h.g") - K)
        & (F.col("t.g") <= F.col("h.g") - F.col("h.rn")),
    ).select(
        F.col("h.event_type").alias("event_type"),
        F.col("h.b").alias("b"),
        F.col("h.rn").alias("rn"),
        F.col("t.g").alias("gt"),
        F.col("xt"),
    )
