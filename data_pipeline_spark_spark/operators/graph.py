"""Graph analytics over relationship structure latent in the fact
tables — the iterative-algorithm family (fixed-point computations
whose output feeds back as next-round input) that complements the
engine's one-shot relational and window surface.

The engine already runs one iterative graph job — `dedup_cluster`'s
min-label connected components (dedup.py) — because transitive
closure is what turns near-dup PAIRS into keep/drop decisions.
PageRank is the other canonical member of that family: importance
scoring over a co-occurrence graph, the shape behind crawl
prioritization, seed-document selection, and catalog curation in a
training-data pipeline. The reference platform's query layer is
one-shot SQL (reference README.md:16 — predefined queries behind an
API); iterative jobs are exactly the class a Spark-native engine adds
on top, since Catalyst has no WITH RECURSIVE and the idiomatic form
is a driver-side loop over cached DataFrames (each round a narrow
join + agg, state never accumulating).

Exactness discipline (the repo-wide integer pattern): ranks live in
integer MICRO-units (SCALE = 1e12) and every division is integer
``div`` with identical nesting in the Spark plan and the DuckDB
oracle's unrolled-iteration CTEs, so five rounds of feedback stay
bit-identical across engines — no float drifts compounding per
iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: Rank mass is carried in integer micro-units: 1.0 == 1e12. Five
#: decimal-digit headroom above the ~1e5-node fixture graphs keeps
#: per-node ranks ≥ 1e6 units, so the floor divisions lose < 1e-6 of
#: relative mass per round.
_PR_SCALE = 1_000_000_000_000

#: Damping factor as an integer percentage (classic 0.85), applied as
#: ``85 * x div 100`` in both engines.
_PR_DAMP_PCT = 85

#: Fixed iteration count. Power iteration converges geometrically at
#: rate d (0.85^5 ≈ 0.44 of the residual left) — enough to produce a
#: stable top-k on the dense co-order graph; production runs would
#: iterate to an L1 tolerance with the same loop body.
_PR_ITERS = 5

#: Top-k rows returned (rank desc, part key asc — a total order).
_PR_TOPK = 20

# ---------------------------------------------------------------------------
# Broadcast-vs-shuffle state resolution (shared by the whole family)
# ---------------------------------------------------------------------------

#: Session conf pinning the family's state-side physical path when a
#: caller leaves the flag at None (the registered keys do): "true" /
#: "false" force the broadcast / co-partitioned-shuffle path; "auto"
#: (the default when unset) broadcasts only while the
#: node-proportional state frame provably fits the byte budget below
#: — so at shapes past driver size the registered keys degrade to the
#: shuffle path instead of dying in a broadcast OOM.
_BCAST_MODE_CONF = "spark.data_pipeline_spark.graph.broadcastState"

#: Byte budget for an explicit ``F.broadcast`` of loop state under
#: "auto". Deliberately NOT spark.sql.autoBroadcastJoinThreshold: that
#: 10 MB default tunes Catalyst's *implicit* plan choices, while an
#: explicit loop-state broadcast is comfortable far beyond it (the
#: triangle closure's ~20 MB edge list is a measured 2.2× win over
#: the shuffle form) and only truly bounded by driver/executor heap
#: and Spark's 8 GB broadcast hard cap. 1 GB keeps an order of
#: headroom under both on any plausible cluster; ≤ 0 disables
#: broadcasting outright.
#:
#: Why 1 GB and not the original 256 MB: the sf1 co-order edge list
#: (11.96M oriented edges ≈ 287 MB at the 24 B/row estimate) sat
#: just past the old cap, so "auto" silently dropped the whole
#: triangle family onto the wedge-SHUFFLING closure for the first
#: time in r15 — measured 240 s vs 117 s solo for
#: graph_triangle_count at sf1, with GCLocker stalls, and a
#: heap-death under the probe session's extra memory pressure
#: (docs/SCALE.md r15). The cliff cost is ~2× wall BEFORE the OOM
#: risk, so the auto cap must sit where broadcast genuinely stops
#: being the better plan, not at a round number under it.
_BCAST_BYTES_CONF = "spark.data_pipeline_spark.graph.maxBroadcastStateBytes"
_BCAST_BYTES_DEFAULT = 1024 * 1024 * 1024

#: Conservative on-wire estimate per state row — the family's state
#: frames are two packed longs plus row overhead.
_STATE_ROW_BYTES = 24


def _bcast_pinned(spark: SparkSession, explicit) -> bool | None:
    """Resolve an explicit flag or a conf pin; None means "auto" —
    the caller must then size-check with [[_fits_broadcast]] using a
    row count it can obtain cheaply (every loop in this module has
    one lying around: pagerank counts nodes anyway, LPA's round-1
    output is its state, BFS/triangle checkpoint the frame the
    decision is about)."""
    if explicit is not None:
        return bool(explicit)
    mode = str(spark.conf.get(_BCAST_MODE_CONF, "auto")).lower()
    if mode in ("true", "false"):
        return mode == "true"
    return None


def _fits_broadcast(spark: SparkSession, n_rows: int) -> bool:
    cap = int(spark.conf.get(_BCAST_BYTES_CONF, str(_BCAST_BYTES_DEFAULT)))
    return cap > 0 and n_rows * _STATE_ROW_BYTES <= cap


def _pr_iteration_ctes() -> str:
    """The oracle's unrolled power-iteration CTEs r1..r{n}: each one
    joins the previous round's ranks onto the edge list and folds
    edge contributions with the SAME integer expression the Spark
    loop uses — ``base + (85 * Σ (r·w div ow)) div 100``."""
    ctes = []
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT e.dst AS id,
             (15 * ({_PR_SCALE} // n.c)) // 100
               + ({_PR_DAMP_PCT} * SUM((p.r * e.w) // e.ow)) // 100 AS r
      FROM edges e
      JOIN r{i - 1} p ON p.id = e.src
      CROSS JOIN n
      GROUP BY e.dst, n.c
    )"""
        )
    return ",\n    ".join(ctes)


@query(
    "graph_pagerank",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    sym AS (
      SELECT pa AS src, pb AS dst, w FROM pair
      UNION ALL
      SELECT pb AS src, pa AS dst, w FROM pair
    ),
    outw AS (
      SELECT src, SUM(w) AS ow FROM sym GROUP BY src
    ),
    edges AS (
      SELECT s.src, s.dst, s.w, o.ow FROM sym s JOIN outw o USING (src)
    ),
    n AS (
      SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS c FROM sym
    ),
    r0 AS (
      SELECT src AS id, ({_PR_SCALE} // n.c) AS r
      FROM (SELECT DISTINCT src FROM sym) CROSS JOIN n
    ),
    {{iters}}
    SELECT id AS part_key, CAST(r AS BIGINT) AS rank_micro
    FROM r{_PR_ITERS}
    ORDER BY r DESC, id ASC
    LIMIT {_PR_TOPK}
    """.replace("{iters}", _pr_iteration_ctes()),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the part co-order graph: nodes are
    parts, an edge (a, b) with weight w means a and b appeared
    together in w distinct orders — the co-occurrence structure
    `basket_pair_affinity` mines for pairs, here closed over the
    whole graph so a part's score reflects its neighbors' importance
    recursively, not just its own co-order counts.

    Plan shape, per the Pregel decomposition:

    - **Edge build** (once): the per-order self-join fans out at most
      C(k, 2) pairs for a k-item order — k is bounded by order size
      (≤ a dozen in TPC-H-shaped data), so the join is one shuffle on
      l_orderkey with bounded per-row amplification, never an
      all-pairs product over parts. Out-degree weights are folded in
      (`ow`), and the finished edge list is localCheckpoint-ed: the
      five iterations reuse the materialized partitions instead of
      re-running pair generation per round.
    - **Power iteration** (×{iters}): each round is ONE
      broadcast-hash join (the |V|-row rank state onto checkpointed
      edges by src — edges never move; only the ~16-byte (id, rank)
      rows broadcast) plus ONE map-side-combined groupBy(dst) fold —
      a single shuffle exchange per round (the r13 exchange-cut ask;
      measured 5.43 s → 2.62 s loop cost at sf0.1). Each round's
      broadcast build materializes the previous round, so lineage
      stays one round deep — checkpoint cadence handled
      structurally. State per round is exactly |V| rows; previous
      rounds are unreferenced and GC-able. At 100 TB, where |V|
      outgrows a broadcast, `pagerank_of(broadcast_state=False)`
      shuffle-hash-joins a co-partitioned state over src-bucketed
      edges — the same co-location argument as `dedup_cluster`'s
      component loop (dedup.py), which this module extends from
      min-fold to weighted-sum-fold.
    - **Integer exactness**: rank mass is BIGINT micro-units; each
      edge contribution is `(r * w) div ow` and each round's fold is
      `base + (85 * Σ) div 100`, with the division nesting IDENTICAL
      in the DuckDB oracle's unrolled r1..r{iters} CTEs — the
      fixed-point feedback stays bit-identical across engines, which
      float ranks cannot do (per-round rounding would compound).
    - Teleport base uses the co-order node count (isolated parts that
      never share an order have no edges and are excluded — a rank
      over them is the uniform base, noise for the top-k this query
      serves). The symmetric edge build means no dangling nodes: every
      node has out-edges, so no separate dangling-mass redistribution
      term is needed (the classic PageRank complication, dodged
      structurally).

    Returns the top {topk} parts by rank (rank desc, part key asc — a
    total order for stable grading).
    """
    sym = _sym_co_order_edges(load(spark, sf_dir, "lineitem"))
    return (
        pagerank_of(sym)
        .select(
            F.col("id").alias("part_key"),
            F.col("r").cast("bigint").alias("rank_micro"),
        )
        .orderBy(F.col("rank_micro").desc(), F.col("part_key").asc())
        .limit(_PR_TOPK)
    )


def _co_order_edges(li: DataFrame) -> DataFrame:
    """The undirected co-order part graph as HALF edges (src < dst,
    one row per unordered pair, w = co-order count) — shared by
    `graph_pagerank` and `graph_triangle_count` so both keys rank
    the same structure. ONE shuffle on l_orderkey serves both the
    distinct and the self-join (the explicit repartition makes
    HashPartitioning(l_orderkey) satisfy the dedup's wider
    clustering AND the join's requirement — r14: −14% on the build,
    which dominates every graph key end-to-end); per-order fan-out
    bounded by C(order size, 2)."""
    # r16: basket-style build (the analytics.py pair machinery) —
    # collect each order's distinct sorted part set in ONE fact
    # shuffle, then expand successor pairs IN-ROW with chained
    # generators (posexplode + explode of the successor slice; HOF
    # lambdas are interpreted and 2-4× slower here). NB this is a
    # DELIBERATE twin of analytics._basket_affinity_from's expansion,
    # not a shared helper: the basket rung carries knobs this graph
    # build must not inherit (item_cap mega-basket bound, min-support
    # prune) — a fix to the expansion itself (slice off-by-one,
    # codegen regression) must be applied in BOTH places (r16
    # self-review note; same cross-pin at the analytics site).
    # Replaces the
    # r14 items self-join: same (src < dst, w) frame bit-for-bit,
    # one fewer corpus-proportional pass (no second join-side read
    # of items) — measured 4.04 s → 2.6 s solo for the build at
    # sf0.1, inherited by every graph key. The explicit width pins
    # the post-shuffle task count: AQE would coalesce the few-MB
    # basket arrays to ~1 task and serialize the k²/2 expansion
    # (the same advisory-size cliff as the LPA dst-repartition).
    width = li.sparkSession.sparkContext.defaultParallelism
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .repartition(width, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint(eager=False)
    )
    return (
        baskets.select(F.posexplode("ps").alias("i", "src"), "ps")
        .select(
            "src",
            F.explode(
                F.slice("ps", F.col("i") + F.lit(2), F.size("ps"))
            ).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("w"))
        # consumers reference the pair frame 2-4× (degrees +
        # orientation + wedge sides; sym's two directions); pin the
        # 2m-row result so the k²/2 expansion runs once per query
        # instead of once per reference
        .localCheckpoint(eager=False)
    )


def _sym_co_order_edges(li: DataFrame) -> DataFrame:
    """Both directions of the co-order graph — the single
    symmetrization point shared by `graph_pagerank` and
    `graph_label_propagation`, so an edge-construction change can
    never leave the two keys ranking different graphs."""
    half = _co_order_edges(li)
    return half.unionByName(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )


def pagerank_of(
    sym: DataFrame, broadcast_state: bool | None = None
) -> DataFrame:
    """The power-iteration fold over any symmetric weighted edge
    frame ``(src, dst, w)`` — module-level so the hypothesis
    differential drives the SAME loop the registered query runs.
    Returns the full ``(id, r)`` rank frame (callers top-k it).

    Per-round plan (r13 verdict ask — measured sf0.1 loop cost
    5.43 s → 2.62 s, bit-identical output): the |V|-row rank state
    BROADCASTS onto the checkpointed edges (rank state is node-
    proportional, edges are the data-proportional side and never
    move), leaving ONE shuffle exchange per round — the
    groupBy(dst) contribution fold, map-side combined. Building
    each round's broadcast also forces the previous round's plan to
    materialize, so lineage depth stays one round regardless of
    iteration count — the checkpoint-cadence question answered
    structurally. ``broadcast_state=False`` switches to the
    billion-node-graph shape (shuffle-hash join of a co-partitioned
    state — the bucketed-edges cluster argument); both paths run
    the identical integer arithmetic and the tests pin them
    equal. ``None`` (the registered key's setting) resolves through
    [[_bcast_pinned]]: conf pin, else size-check the |V|-row state
    against [[_fits_broadcast]] — free here, the loop counts nodes
    anyway."""
    outw = sym.groupBy("src").agg(F.sum("w").alias("ow"))
    edges = sym.join(outw, "src").localCheckpoint(eager=False)

    # One node-set materialization serves both the count action and
    # the r0 init frame (was: two full distinct shuffles).
    nodes = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # r16 self-review: _PR_SCALE // 0 would raise a bare
        # ZeroDivisionError on the driver; empty inputs are
        # in-contract for this module-level entry point
        raise ValueError("pagerank_of: empty edge frame (no nodes)")
    broadcast_state = _bcast_pinned(sym.sparkSession, broadcast_state)
    if broadcast_state is None:
        broadcast_state = _fits_broadcast(sym.sparkSession, n_nodes)
    base = (15 * (_PR_SCALE // n_nodes)) // 100
    ranks = nodes.withColumn(
        "r", F.lit(_PR_SCALE // n_nodes).cast("bigint")
    )
    for _ in range(_PR_ITERS):
        st = (
            F.broadcast(ranks)
            if broadcast_state
            else ranks.hint("shuffle_hash")
        )
        ranks = (
            edges.join(st, edges.src == st.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"{_PR_DAMP_PCT} * sum((r * w) div ow) div 100"
                    )
                ).alias("r")
            )
        )
    return ranks


graph_pagerank.__doc__ = graph_pagerank.__doc__.replace(
    "{iters}", str(_PR_ITERS)
).replace("{topk}", str(_PR_TOPK))


#: Total-order packing for the degree orientation: ord = deg * _TRI_C
#: + id. Part keys are far below 1e9, so the pack is collision-free
#: and (deg, id) lexicographic order becomes ONE bigint comparison.
_TRI_C = 1_000_000_000

#: Top-k rows returned by graph_triangle_count.
_TRI_TOPK = 20

_TRI_SQL = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    half AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT src AS id FROM half
        UNION ALL
        SELECT dst AS id FROM half
      ) GROUP BY id
    ),
    dir AS (
      SELECT CASE WHEN ds.d * {_TRI_C} + h.src < dd.d * {_TRI_C} + h.dst
                  THEN ds.d * {_TRI_C} + h.src
                  ELSE dd.d * {_TRI_C} + h.dst END AS ou,
             CASE WHEN ds.d * {_TRI_C} + h.src < dd.d * {_TRI_C} + h.dst
                  THEN dd.d * {_TRI_C} + h.dst
                  ELSE ds.d * {_TRI_C} + h.src END AS ov
      FROM half h
      JOIN deg ds ON ds.id = h.src
      JOIN deg dd ON dd.id = h.dst
    ),
    tri AS (
      SELECT e1.ou AS o1, e1.ov AS o2, e2.ov AS o3
      FROM dir e1
      JOIN dir e2 ON e2.ou = e1.ou AND e1.ov < e2.ov
      JOIN dir e3 ON e3.ou = e1.ov AND e3.ov = e2.ov
    ),
    pernode AS (
      SELECT o % {_TRI_C} AS part_key,
             CAST(COUNT(*) AS BIGINT) AS triangles
      FROM (
        SELECT o1 AS o FROM tri
        UNION ALL SELECT o2 FROM tri
        UNION ALL SELECT o3 FROM tri
      )
      GROUP BY o % {_TRI_C}
    )
    SELECT part_key, triangles FROM pernode
    ORDER BY triangles DESC, part_key ASC
    LIMIT {_TRI_TOPK}
"""


@query("graph_triangle_count", oracle=_TRI_SQL)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the part co-order graph — the
    clustering-structure primitive (local density, community
    seeding, spam/anomaly signals) next to `graph_pagerank`'s
    importance and `dedup_cluster`'s connectivity; all three read
    the SAME `_co_order_edges` structure.

    The scale-defining trick is DEGREE ORIENTATION (the classic
    O(m^3/2) triangle bound): every undirected edge is directed from
    its lower-(degree, id) endpoint to the higher, packed into ONE
    bigint comparison via ord = deg·C + id. Under that orientation
    the graph is acyclic, every triangle is counted EXACTLY once
    (apexed at its min-ord vertex), and — the load-bearing part —
    out-degree is bounded by O(√m) even for hub nodes, so the wedge
    self-join's fan-out is Σ C(outdeg(v), 2) minimized over all
    orientations: a mega-hub that would explode an id-ordered wedge
    join into C(hub, 2) candidates instead contributes only wedges
    apexed at its (low-degree) neighbors. This is the same
    in-row-fan-out discipline as `basket_pair_affinity`'s item_cap,
    achieved structurally instead of by truncation.

    Plan: three joins — wedge (dir ⋈ dir on the apex, shuffled) and
    closure (wedge ⋈ dir on the oriented far pair, a BROADCAST-hash
    probe by default: the O(m^1.5)-bounded wedge stream is the big
    side and never shuffles when the edge list is broadcast-sized —
    21.3 → 9.6 s at sf0.1, r14; `triangle_counts_of(
    broadcast_closure=False)` is the bucketed-shuffle path for edge
    lists past driver size); then a 3-way explode and a count. No
    iteration, no Python, cardinalities bounded by the orientation
    argument. Top {topk} parts by (triangles desc, part key asc).
    """
    half = _co_order_edges(
        load(spark, sf_dir, "lineitem")
    ).select("src", "dst")
    pernode = triangle_counts_of(half)
    return pernode.orderBy(
        F.col("triangles").desc(), F.col("part_key").asc()
    ).limit(_TRI_TOPK)


def triangle_counts_of(
    half: DataFrame, broadcast_closure: bool | None = None
) -> DataFrame:
    """Degree-oriented triangle counting over any half-edge frame
    ``(src, dst)`` with src < dst, one row per undirected edge —
    module-level so the hypothesis differential and the synthetic
    K4/pendant contracts drive the SAME joins the registered query
    runs. Returns the full per-node ``(part_key, triangles)`` frame
    (callers top-k it).

    The closure probe BROADCASTS the oriented edge list by default
    (r13 verdict ask #4 — measured 21.3 → 9.6 s at sf0.1, identical
    output): the wedge stream is the O(m^{3/2})-bounded BIG side and
    must never be shuffled on its (far-pair) key when the edge list
    itself is broadcast-sized; wedges then stream through one
    broadcast-hash probe and collapse straight into the partial
    count. (Broadcasting the WEDGE join too was measured slower —
    14.1 s — the sorted wedge generator keeps better locality.)
    ``broadcast_closure=False`` is the path for edge lists past
    driver size: the original shuffled join, co-partitionable by
    bucketing the oriented edges on ou — the same dual-state
    contract as the loop siblings. ``None`` (the registered key's
    setting) resolves through [[_bcast_pinned]]: conf pin, else
    size-check the oriented edge list against [[_fits_broadcast]] —
    the count action materializes the checkpoint the closure join
    reads anyway."""
    tri = _oriented_triangles(half, broadcast_closure)
    return (
        tri.select(F.explode(F.array("o1", "o2", "o3")).alias("o"))
        .groupBy((F.col("o") % _TRI_C).alias("part_key"))
        .agg(F.count("*").cast("bigint").alias("triangles"))
    )


def _half_degrees(half: DataFrame) -> DataFrame:
    """Undirected degrees ``(id, d)`` of a half-edge frame — the one
    degree definition [[triangle_counts_of]],
    [[graph_clustering_coeff]] and [[graph_edge_jaccard]] share, so
    the orientation and the coefficient denominators can never rank
    different degree tables."""
    return (
        half.select(F.col("src").alias("id"))
        .unionAll(half.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("bigint").alias("d"))
    )


def _oriented_triangles(
    half: DataFrame,
    broadcast_closure: bool | None = None,
    deg: DataFrame | None = None,
) -> DataFrame:
    """The degree-oriented triangle STREAM ``(o1, o2, o3)`` (packed
    ords, o1 < o2 < o3, one row per triangle) — factored out of
    [[triangle_counts_of]] so [[graph_clustering_coeff]] (per-node
    fold) and [[graph_edge_jaccard]] (per-edge fold) consume the
    same wedge/closure joins instead of re-deriving them. ``deg``
    lets a caller that already built the degree frame avoid a second
    degree aggregation."""
    if deg is None:
        deg = _half_degrees(half)
    j = (
        half.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("d", "ds")
        .join(deg.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("d", "dd")
        .select(
            (F.col("ds") * _TRI_C + F.col("src")).alias("os"),
            (F.col("dd") * _TRI_C + F.col("dst")).alias("od"),
        )
    )
    direct = j.select(
        F.least("os", "od").alias("ou"),
        F.greatest("os", "od").alias("ov"),
    ).localCheckpoint(eager=False)
    broadcast_closure = _bcast_pinned(half.sparkSession, broadcast_closure)
    if broadcast_closure is None:
        broadcast_closure = _fits_broadcast(
            half.sparkSession, direct.count()
        )
    e1, e2 = direct.alias("e1"), direct.alias("e2")
    e3 = (
        F.broadcast(direct) if broadcast_closure else direct
    ).alias("e3")
    return (
        e1.join(
            e2,
            (F.col("e1.ou") == F.col("e2.ou"))
            & (F.col("e1.ov") < F.col("e2.ov")),
        )
        .join(
            e3,
            (F.col("e3.ou") == F.col("e1.ov"))
            & (F.col("e3.ov") == F.col("e2.ov")),
        )
        .select(
            F.col("e1.ou").alias("o1"),
            F.col("e1.ov").alias("o2"),
            F.col("e2.ov").alias("o3"),
        )
    )


graph_triangle_count.__doc__ = graph_triangle_count.__doc__.replace(
    "{topk}", str(_TRI_TOPK)
)


# ---------------------------------------------------------------------------
# graph_clustering_coeff / graph_edge_jaccard — local-density ratios
# over the shared triangle stream
# ---------------------------------------------------------------------------

#: Micro-unit scale for the two density ratios (coefficient 1.0 ==
#: 1e6), divided with integer ``div`` in both engines.
_DENS_SCALE = 1_000_000

#: Top-k rows returned by the two density keys.
_DENS_TOPK = 20

#: The shared CTE stack through the oriented triangle stream —
#: verbatim the [[_TRI_SQL]] pipeline up to ``tri`` plus the degree
#: table both density keys join back onto.
_DENS_BASE_SQL = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    half AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT src AS id FROM half
        UNION ALL
        SELECT dst AS id FROM half
      ) GROUP BY id
    ),
    dir AS (
      SELECT CASE WHEN ds.d * {_TRI_C} + h.src < dd.d * {_TRI_C} + h.dst
                  THEN ds.d * {_TRI_C} + h.src
                  ELSE dd.d * {_TRI_C} + h.dst END AS ou,
             CASE WHEN ds.d * {_TRI_C} + h.src < dd.d * {_TRI_C} + h.dst
                  THEN dd.d * {_TRI_C} + h.dst
                  ELSE ds.d * {_TRI_C} + h.src END AS ov
      FROM half h
      JOIN deg ds ON ds.id = h.src
      JOIN deg dd ON dd.id = h.dst
    ),
    tri AS (
      SELECT e1.ou AS o1, e1.ov AS o2, e2.ov AS o3
      FROM dir e1
      JOIN dir e2 ON e2.ou = e1.ou AND e1.ov < e2.ov
      JOIN dir e3 ON e3.ou = e1.ov AND e3.ov = e2.ov
    )"""

_CLUST_SQL = f"""{_DENS_BASE_SQL},
    pernode AS (
      SELECT o % {_TRI_C} AS id, CAST(COUNT(*) AS BIGINT) AS triangles
      FROM (
        SELECT o1 AS o FROM tri
        UNION ALL SELECT o2 FROM tri
        UNION ALL SELECT o3 FROM tri
      )
      GROUP BY o % {_TRI_C}
    )
    SELECT deg.id AS part_key, deg.d AS degree,
           COALESCE(p.triangles, 0) AS triangles,
           (2 * COALESCE(p.triangles, 0) * {_DENS_SCALE})
             // (deg.d * (deg.d - 1)) AS coeff_micro
    FROM deg
    LEFT JOIN pernode p ON p.id = deg.id
    WHERE deg.d >= 2
    ORDER BY coeff_micro DESC, degree DESC, part_key ASC
    LIMIT {_DENS_TOPK}
"""


@query("graph_clustering_coeff", oracle=_CLUST_SQL)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — tri(v) / C(deg(v), 2),
    how close each node's neighborhood is to a clique. The RATIO
    member of the density family: [[graph_triangle_count]] reports
    raw closure counts (hub-dominated), this normalizes by the
    neighborhood's pair capacity, surfacing tight small communities
    a raw count buries — the standard spam/bot/bridge-node signal
    and the per-node half of the Watts–Strogatz statistic.

    Exactness: triangles and degrees are exact integers off the
    shared [[_oriented_triangles]] stream and [[_half_degrees]]
    table; the coefficient is ONE integer division into micro-units
    (``2·tri·1e6 div d(d−1)``), identical ``div``/``//`` trees both
    engines, no float anywhere. Degree-1 nodes (undefined C(d,2))
    are filtered; triangle-free nodes enter via LEFT join with an
    exact 0.

    Plan: the O(m^{3/2})-bounded wedge/closure joins (broadcast
    closure probe via the family's [[_bcast_pinned]] resolver), one
    explode-fold to per-node counts, one join back onto the degree
    table, TakeOrderedAndProject top-{_DENS_TOPK} — per-node output,
    so the result side is |V|-proportional and the top-k never
    materializes a global sort."""
    half = (
        _co_order_edges(load(spark, sf_dir, "lineitem"))
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    return clustering_coeff_of(half).orderBy(
        F.col("coeff_micro").desc(),
        F.col("degree").desc(),
        F.col("part_key").asc(),
    ).limit(_DENS_TOPK)


def clustering_coeff_of(half: DataFrame) -> DataFrame:
    """Full per-node ``(part_key, degree, triangles, coeff_micro)``
    frame over any half-edge input — module-level so the synthetic
    K4/pendant contract drives the same joins the registered query
    runs (callers top-k it)."""
    deg = _half_degrees(half)
    tri = _oriented_triangles(half, deg=deg)
    pernode = (
        tri.select(F.explode(F.array("o1", "o2", "o3")).alias("o"))
        .groupBy((F.col("o") % _TRI_C).alias("id"))
        .agg(F.count("*").cast("bigint").alias("triangles"))
    )
    return (
        deg.filter(F.col("d") >= 2)
        .join(pernode, "id", "left")
        .select(
            F.col("id").alias("part_key"),
            F.col("d").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("bigint").alias(
                "triangles"
            ),
        )
        .withColumn(
            "coeff_micro",
            F.expr(
                f"(2 * triangles * {_DENS_SCALE})"
                " div (degree * (degree - 1))"
            ),
        )
    )


_EJACC_SQL = f"""{_DENS_BASE_SQL},
    esup AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common FROM (
        SELECT LEAST(o1 % {_TRI_C}, o2 % {_TRI_C}) AS a,
               GREATEST(o1 % {_TRI_C}, o2 % {_TRI_C}) AS b FROM tri
        UNION ALL
        SELECT LEAST(o1 % {_TRI_C}, o3 % {_TRI_C}),
               GREATEST(o1 % {_TRI_C}, o3 % {_TRI_C}) FROM tri
        UNION ALL
        SELECT LEAST(o2 % {_TRI_C}, o3 % {_TRI_C}),
               GREATEST(o2 % {_TRI_C}, o3 % {_TRI_C}) FROM tri
      ) GROUP BY a, b
    )
    SELECT h.src, h.dst, ds.d AS deg_src, dd.d AS deg_dst,
           COALESCE(e.common, 0) AS common,
           CASE WHEN ds.d + dd.d - 2 - COALESCE(e.common, 0) = 0 THEN 0
                ELSE (COALESCE(e.common, 0) * {_DENS_SCALE})
                       // (ds.d + dd.d - 2 - COALESCE(e.common, 0))
           END AS jaccard_micro
    FROM half h
    JOIN deg ds ON ds.id = h.src
    JOIN deg dd ON dd.id = h.dst
    LEFT JOIN esup e ON e.a = h.src AND e.b = h.dst
    ORDER BY jaccard_micro DESC, common DESC, src ASC, dst ASC
    LIMIT {_DENS_TOPK}
"""


@query("graph_edge_jaccard", oracle=_EJACC_SQL)
def graph_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard per EDGE — |N(u)∩N(v)| / |N(u)∪N(v)
    minus u,v themselves| for every existing edge (u,v): the
    embeddedness /
    link-strength score behind tie-strength ranking, weak-link
    pruning before community detection, and graph-based near-dup
    confirmation (two products whose co-order neighborhoods overlap
    almost entirely are substitutes). The per-EDGE restriction is
    the scale decision: all-pairs neighborhood Jaccard is the
    id-ordered wedge explosion [[graph_triangle_count]]'s docstring
    rejects, while for edges the intersection |N(u)∩N(v)| is exactly
    the edge's triangle support — so the O(m^{3/2}) oriented stream
    computes it with NO new join shape (this is also k-truss
    support, the edge sibling of [[graph_kcore]]'s node peeling).

    Exactness: support counts from [[_oriented_triangles]] unpacked
    to id space (LEAST/GREATEST restore the src < dst invariant the
    orientation scrambled), union size du + dv − 2 − common, one
    integer division into micro-units, CASE-guarded for the
    isolated-edge 0/0 (defined as 0). All integers both engines.

    Plan: wedge/closure joins, a 3-edge explode folded map-side to
    per-edge support, LEFT join back onto the half-edge frame
    (support-less edges score an exact 0) with the degree table
    joined on both endpoints, TakeOrderedAndProject
    top-{_DENS_TOPK}. Output is |E|-proportional — the same scale
    class as the edge list itself."""
    half = (
        _co_order_edges(load(spark, sf_dir, "lineitem"))
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    return edge_jaccard_of(half).orderBy(
        F.col("jaccard_micro").desc(),
        F.col("common").desc(),
        F.col("src").asc(),
        F.col("dst").asc(),
    ).limit(_DENS_TOPK)


def edge_jaccard_of(half: DataFrame) -> DataFrame:
    """Full per-edge ``(src, dst, deg_src, deg_dst, common,
    jaccard_micro)`` frame over any half-edge input — module-level
    for the synthetic contracts (callers top-k it)."""
    deg = _half_degrees(half)
    tri = _oriented_triangles(half, deg=deg)
    pair = lambda x, y: F.struct(  # noqa: E731
        F.least(F.col(x) % _TRI_C, F.col(y) % _TRI_C).alias("a"),
        F.greatest(F.col(x) % _TRI_C, F.col(y) % _TRI_C).alias("b"),
    )
    esup = (
        tri.select(
            F.explode(
                F.array(
                    pair("o1", "o2"), pair("o1", "o3"), pair("o2", "o3")
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    out = (
        half.join(
            deg.select(
                F.col("id").alias("src"), F.col("d").alias("deg_src")
            ),
            "src",
        )
        .join(
            deg.select(
                F.col("id").alias("dst"), F.col("d").alias("deg_dst")
            ),
            "dst",
        )
        .join(
            esup,
            (F.col("src") == F.col("a")) & (F.col("dst") == F.col("b")),
            "left",
        )
        .select(
            "src",
            "dst",
            "deg_src",
            "deg_dst",
            F.coalesce("common", F.lit(0)).cast("bigint").alias("common"),
        )
        .withColumn(
            "jaccard_micro",
            F.expr(
                "CASE WHEN deg_src + deg_dst - 2 - common = 0 THEN 0"
                f" ELSE (common * {_DENS_SCALE})"
                " div (deg_src + deg_dst - 2 - common) END"
            ),
        )
    )
    return out


graph_clustering_coeff.__doc__ = graph_clustering_coeff.__doc__.replace(
    "{_DENS_TOPK}", str(_DENS_TOPK)
)
graph_edge_jaccard.__doc__ = graph_edge_jaccard.__doc__.replace(
    "{_DENS_TOPK}", str(_DENS_TOPK)
)


# ---------------------------------------------------------------------------
# graph_label_propagation — deterministic synchronous weighted LPA
# ---------------------------------------------------------------------------

#: Fixed synchronous rounds. LPA reaches near-final communities in a
#: handful of sweeps (Raghavan 2007 report ~95% after 5 on social
#: graphs); three keeps the oracle's unrolled CTE stack readable while
#: already merging the fixture graph into stable cores. Production
#: would loop to a label-change tolerance with the same round body.
_LPA_ITERS = 3

#: Top-k communities returned (members desc, community label asc).
_LPA_TOPK = 20


def _lpa_round_ctes() -> str:
    """Unrolled synchronous rounds l1..l{n}: every node adopts the
    neighbor label with the largest incident edge-weight total,
    smallest label winning ties — the same vote the Spark loop
    computes, deterministic by construction."""
    ctes = []
    for i in range(1, _LPA_ITERS + 1):
        ctes.append(
            f"""l{i} AS (
      SELECT id, label FROM (
        SELECT e.dst AS id, p.label,
               row_number() OVER (
                 PARTITION BY e.dst
                 ORDER BY SUM(e.w) DESC, p.label ASC) AS rn
        FROM sym e JOIN l{i - 1} p ON p.id = e.src
        GROUP BY e.dst, p.label
      ) WHERE rn = 1
    )"""
        )
    return ",\n    ".join(ctes)


def lpa_of(
    sym: DataFrame,
    iters: int = _LPA_ITERS,
    broadcast_state: bool | None = None,
    checkpoint_edges: bool = True,
) -> DataFrame:
    """The synchronous weighted label-propagation loop over any
    symmetric edge frame ``(src, dst, w)`` — module-level so the
    hypothesis differential drives the SAME loop the registered
    query runs. Returns the final ``(id, label)`` assignment.

    Precondition (as every caller in the repo satisfies, including
    `_sym_co_order_edges`): parallel edges are pre-collapsed, i.e.
    ``(src, dst)`` pairs are unique — the standard weighted
    simple-graph adjacency. The round-1 shortcut below folds the
    edge list directly and would take a max instead of a sum over
    parallel edges.

    Per-round plan (r13 verdict ask — measured sf0.1 loop cost
    13.5 s → 8.5 s, identical output): the |V|-row label state
    broadcasts onto the checkpointed edges (same state-vs-data
    argument as [[pagerank_of]]), and the rn=1 WINDOW is replaced
    by a second aggregation — ``max(struct(v, −label))`` is exactly
    ``row_number() OVER (ORDER BY v DESC, label ASC) = 1`` for a
    total order, computed as a map-side-combined hash fold instead
    of a per-partition sort. Round cost: one broadcast-hash join +
    TWO shuffle exchanges (vote fold on (dst, label), argmax fold
    on dst), down from the 3-exchange join/fold/window chain.

    ROUND 1 is algebraically special (r14 verdict ask #2): labels
    still equal node ids, so the (dst, label) vote rows ARE the
    edge rows one-for-one — the vote fold is a no-op sum over
    singleton groups with ZERO map-side combining (the full ~2m
    unique pairs cross the wire), and the state join joins each
    node to itself. The first round therefore collapses to ONE
    map-side-combined argmax straight over the checkpointed edges:
    no state join, and the exchange carries |V| partial maxima
    instead of ~2m vote rows. Rounds 2..k run the general body on
    the coalesced label space, where the (dst, label) fold DOES
    combine. ``broadcast_state=False`` is the billion-node path
    (shuffle-hash join, co-partitioned state); tests pin both paths
    equal; ``None`` (the registered key's setting) resolves through
    [[_bcast_pinned]]: conf pin, else size-check the round-1 label
    state against [[_fits_broadcast]] — the count rides the eager
    checkpoint of round-1 output that round 2's state build would
    materialize anyway.

    ``checkpoint_edges=False`` is for callers handing in an
    already-materialized edge table — in particular a
    ``bucketBy(src)`` saved table, the real cluster shape for the
    shuffle-state path: the default localCheckpoint would wrap the
    scan in a LogicalRDD and DROP its HashPartitioning(src) bucket
    metadata, reintroducing the per-round edge-side exchange the
    bucketing exists to avoid (measured at sf0.1, shuffle-state
    path: bucketed scan 5 exchanges / 4.86 s vs checkpointed frame
    7 exchanges / 6.73 s — docs/SCALE.md)."""
    # r16 (verdict ask #4): hash-partition the edge list by dst ONCE
    # before the checkpoint. LogicalRDD preserves the physical
    # outputPartitioning across localCheckpoint, and
    # HashPartitioning(dst) satisfies ClusteredDistribution for BOTH
    # per-round folds — groupBy(dst, label) (subset rule) and the
    # groupBy(dst) argmax — and for the round-1 shortcut. On the
    # broadcast-state path (the registered key's local resolution)
    # the join preserves the streamed side's partitioning, so every
    # per-round exchange disappears: the decomposed 2 × ~2.4 s
    # coalesced-label exchanges of the r15 verdict are paid once as
    # this single upfront 2m-row repartition (measured: 8.45 s →
    # ~3.4 s solo at sf0.1, plan audited 1 data exchange total).
    # The shuffle-state path is a wash (it saves the round-1 argmax
    # exchange, pays the repartition; its per-round src-side join
    # exchange is the bucketed-table territory the
    # checkpoint_edges=False escape exists for).
    # NOTE the order: checkpoint FIRST (materialize the edge build
    # once, truncate its lineage), repartition AFTER — localCheckpoint
    # wraps its input in a LogicalRDD that reports UnknownPartitioning
    # (measured: the checkpointed side of a repartition loses the
    # layout and every round re-exchanges — same mechanism as the r15
    # bucketed-scan note), so the repartition node must stay in the
    # downstream lineage where EnsureRequirements can see it. Each
    # reference to `edges` compiles its own copy of this exchange,
    # but they canonicalize identically over the shared checkpoint
    # RDD and AQE's stage cache reuses the shuffle at runtime.
    edges = (
        sym.localCheckpoint(eager=False).repartition(
            sym.sparkSession.sparkContext.defaultParallelism, F.col("dst")
        )
        if checkpoint_edges
        else sym
    )
    if iters < 1:
        return (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
        )
    # Round-1 shortcut: every src is its own label, so the vote
    # needs no join with a labels frame — but the vote weight is the
    # SUMMED weight per (dst, src), so collapse parallel edges first
    # (r16 self-review: the earlier direct max(struct(w, -src)) over
    # raw edge rows was silently wrong for multigraph inputs, which
    # rounds 2+ handle correctly via groupBy(dst, label).sum). Both
    # folds hash on dst(,src) and run exchange-free under the
    # upfront HashPartitioning(dst); the registered key's edge build
    # already emits collapsed edges, so the first fold is a cheap
    # pass-through there.
    labels = (
        edges.groupBy(F.col("dst").alias("id"), F.col("src"))
        .agg(F.sum("w").alias("v"))
        .groupBy("id")
        .agg(
            F.max(
                F.struct(F.col("v"), (-F.col("src")).alias("nl"))
            ).alias("m")
        )
        .select("id", (-F.col("m.nl")).alias("label"))
    )
    broadcast_state = _bcast_pinned(sym.sparkSession, broadcast_state)
    if broadcast_state is None and iters >= 2:
        labels = labels.localCheckpoint()
        broadcast_state = _fits_broadcast(sym.sparkSession, labels.count())
    for _ in range(max(0, iters - 1)):
        p = (
            F.broadcast(labels)
            if broadcast_state
            else labels.hint("shuffle_hash")
        ).alias("p")
        votes = (
            edges.alias("e")
            .join(p, F.col("e.src") == F.col("p.id"))
            .groupBy(
                F.col("e.dst").alias("id"), F.col("p.label").alias("label")
            )
            .agg(F.sum("e.w").alias("v"))
        )
        labels = (
            votes.groupBy("id")
            .agg(
                F.max(
                    F.struct(F.col("v"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select("id", (-F.col("m.nl")).alias("label"))
        )
    return labels


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    sym AS (
      SELECT pa AS src, pb AS dst, w FROM pair
      UNION ALL
      SELECT pb AS src, pa AS dst, w FROM pair
    ),
    l0 AS (
      SELECT DISTINCT src AS id, src AS label FROM sym
    ),
    {{iters}}
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(id) AS BIGINT) AS min_member
    FROM l{_LPA_ITERS}
    GROUP BY label
    ORDER BY n_members DESC, community ASC
    LIMIT {_LPA_TOPK}
    """.replace("{iters}", _lpa_round_ctes()),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the part co-order graph by synchronous
    weighted label propagation (Raghavan 2007) — the third member of
    the iterative family: [[dedup_cluster]] finds CONNECTIVITY,
    [[graph_pagerank]] finds IMPORTANCE, LPA finds COMMUNITIES
    (densely co-ordered product groups: assortment planning, corpus
    domain discovery when the nodes are documents). Same
    `_co_order_edges` structure as its two siblings.

    Classic LPA breaks ties randomly and updates asynchronously —
    useless for a graded oracle. This is the DETERMINISTIC variant:
    synchronous rounds (every node votes from the PREVIOUS round's
    labels), vote strength = incident co-order weight, ties to the
    smallest label. Both engines replay it exactly: the oracle
    unrolls l1..l{_LPA_ITERS} CTEs with the identical
    row_number(ORDER BY SUM(w) DESC, label ASC) pick.

    Plan, per round: ONE broadcast-hash join (the ≤16-byte
    (id, label) state onto checkpointed edges by src — edges stay
    put) + ONE map-side-combined groupBy(dst, label) vote fold +
    ONE argmax fold (max(struct(v, −label)) ≡ the deterministic
    rn=1 pick, as a hash aggregate instead of a window sort — the
    r13 exchange-cut ask: 2 shuffles/round, was 3, measured
    13.5 s → 8.5 s at sf0.1). ROUND 1 collapses further (the r14
    ask): labels == node ids make the vote rows the edges
    themselves, so the first round is ONE map-side-combined argmax
    straight over the edge list — no state join, |V| partial maxima
    through the exchange instead of ~2m combine-free vote rows
    (`lpa_of` documents the algebra). Vote rows are bounded by the DISTINCT
    (dst, neighbor-label) pairs ≤ 2m edges, shrinking every round as
    labels coalesce; state between rounds is exactly |V| rows. At
    100 TB: `lpa_of(broadcast_state=False)` shuffle-hash-joins a
    co-partitioned state over src-bucketed edges — identical
    co-location argument to pagerank's loop.

    Returns the top {_LPA_TOPK} communities (members desc, label
    asc) with their canonical min member — community labels are
    node ids, so the output is integer-exact by construction."""
    sym = _sym_co_order_edges(load(spark, sf_dir, "lineitem"))
    final = lpa_of(sym)
    return (
        final.groupBy(F.col("label").alias("community"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.min("id").cast("bigint").alias("min_member"),
        )
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
        .limit(_LPA_TOPK)
    )


graph_label_propagation.__doc__ = graph_label_propagation.__doc__.replace(
    "{_LPA_ITERS}", str(_LPA_ITERS)
).replace("{_LPA_TOPK}", str(_LPA_TOPK))


# ---------------------------------------------------------------------------
# graph_bfs_reach — k-hop reachability from a seed set (min-hop fold)
# ---------------------------------------------------------------------------

#: BFS horizon. Three hops already saturates most of the dense
#: co-order fixture graph (the per-hop counts are the interesting
#: output); production iterates until the frontier empties with the
#: same round body.
_BFS_HOPS = 3

#: Seed predicate: one part brand — the "seed documents" of a crawl
#: prioritization or a contamination blast-radius query.
_BFS_SEED_BRAND = "Brand#11"


def _bfs_round_ctes() -> str:
    """Unrolled min-hop rounds h1..h{k}: each round unions the
    previous reach set with its one-step expansion (hop + 1) and
    keeps MIN(hop) per node — the textbook BFS-as-semiring fold.
    The Spark loop computes the same fixed point but only ever
    expands the FRONTIER (nodes first reached last round); under the
    min fold the two are identical, since re-expanding an older node
    can only produce hops that lose the min."""
    ctes = []
    for i in range(1, _BFS_HOPS + 1):
        ctes.append(
            f"""h{i} AS (
      SELECT id, MIN(hop) AS hop FROM (
        SELECT id, hop FROM h{i - 1}
        UNION ALL
        SELECT e.dst AS id, p.hop + 1 AS hop
        FROM sym e JOIN h{i - 1} p ON p.id = e.src
      ) GROUP BY id
    )"""
        )
    return ",\n    ".join(ctes)


def bfs_reach_of(
    sym: DataFrame,
    seeds: DataFrame,
    hops: int = _BFS_HOPS,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """The frontier BFS loop over any symmetric edge frame
    ``(src, dst)`` and seed frame ``(id,)`` — module-level so the
    hypothesis differential drives the SAME loop the registered
    query runs. Returns the ``(id, hop)`` min-hop assignment of
    every node within ``hops`` of a seed.

    Frontier-size bound (the scale argument): round i joins ONLY the
    nodes first reached at hop i−1 onto the edges — Σ frontier sizes
    over all rounds ≤ |V| regardless of hop count, so total join
    input is O(|E|) across the whole traversal, not O(k·|E|). The
    naive min-fold the oracle unrolls re-expands the full reach set
    every round (fine for an unrolled CTE oracle, wrong as a
    distributed plan); the min fold makes both produce the same
    fixed point.

    ``broadcast_state=None`` (the registered key's setting) resolves
    through [[_bcast_pinned]]: conf pin, else a PER-ROUND size check
    of the reach frame against [[_fits_broadcast]] (the frontier is
    a subset of reach, so the bound is conservative) — the count
    rides the per-round lineage-cut checkpoint, made eager in auto
    mode so each round's materialized reach prices the next round's
    decision."""
    edges = sym.select("src", "dst").localCheckpoint(eager=False)
    spark = sym.sparkSession
    pinned = _bcast_pinned(spark, broadcast_state)
    reach = seeds.select("id").distinct().withColumn(
        "hop", F.lit(0).cast("bigint")
    )
    n_reach = reach.count() if pinned is None else 0
    for i in range(1, hops + 1):
        bs = pinned if pinned is not None else _fits_broadcast(
            spark, n_reach
        )
        frontier = reach.filter(F.col("hop") == i - 1)
        # the frontier is node-proportional and shrinks as the BFS
        # saturates — broadcast it onto the stationary edges (the
        # family's shared state-vs-data argument; broadcast_state=
        # False is the billion-node shuffle-hash path)
        fr = (
            F.broadcast(frontier) if bs else frontier.hint("shuffle_hash")
        )
        expanded = (
            edges.join(fr, edges.src == fr.id)
            .select(
                F.col("dst").alias("id"),
                F.lit(i).cast("bigint").alias("hop"),
            )
        )
        # lineage cut per round: reach feeds BOTH next-round branches
        # (frontier filter + union), so an uncut plan tree DOUBLES
        # per hop (measured: 3/7/15 exchanges at hops 1/2/3); the
        # checkpoint pins it at one join + one fold per round however
        # deep the traversal goes — |V| rows of (id, hop) longs.
        reach = (
            reach.unionByName(expanded)
            .groupBy("id")
            .agg(F.min("hop").alias("hop"))
            .localCheckpoint(eager=pinned is None)
        )
        if pinned is None:
            n_reach = reach.count()
    return reach


@query(
    "graph_bfs_reach",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    sym AS (
      SELECT pa AS src, pb AS dst FROM pair
      UNION ALL
      SELECT pb AS src, pa AS dst FROM pair
    ),
    h0 AS (
      SELECT p_partkey AS id, CAST(0 AS BIGINT) AS hop
      FROM part WHERE p_brand = '{_BFS_SEED_BRAND}'
    ),
    {{iters}}
    SELECT hop,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id,
           CAST(SUM(id) AS BIGINT) AS id_checksum
    FROM h{_BFS_HOPS}
    GROUP BY hop
    ORDER BY hop
    """.replace("{iters}", _bfs_round_ctes()),
)
def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop reachability from a seed part set over the co-order
    graph — the TRAVERSAL member completing the iterative graph
    family: [[dedup_cluster]] = connectivity, [[graph_pagerank]] =
    importance, [[graph_label_propagation]] = communities, BFS =
    blast radius. The pipeline shapes behind it: "which documents
    are within k co-citation hops of a contaminated seed set",
    crawl-frontier expansion from seed URLs, recall sets for
    graph-local reprocessing. Seeds are one part brand
    ('{_BFS_SEED_BRAND}'); the same `_sym_co_order_edges` structure
    as the three siblings, so all four keys traverse one graph.

    Semantics: min-hop per node (BFS distance, capped at
    {_BFS_HOPS}); nodes outside the horizon are absent. Isolated
    seeds (parts never co-ordered) stay at hop 0 — the seed set is
    part of the reach by definition. The per-hop report
    (count + min/max/Σ id checksums) grades every node's exact hop
    without emitting thousands of node rows.

    Plan, per round: ONE hash join (frontier onto checkpointed
    edges by src — edges stay put) + ONE map-side-combined
    groupBy(id) min fold. The FRONTIER discipline is the scale
    argument: each node is expanded exactly once, in the round after
    it is first reached, so Σ join inputs over the whole traversal
    is O(|E|) — a k-hop traversal costs one edge-list pass however
    large k grows, while the oracle's naive unrolled min-fold
    (re-expanding the full reach set each round) would be O(k·|E|).
    At 100 TB: edges bucketed by src make each round's join
    exchange-free on the big side (the family's shared co-location
    argument), and the reach state between rounds is ≤ |V| rows of
    (id, hop) longs."""
    sym = _sym_co_order_edges(load(spark, sf_dir, "lineitem"))
    seeds = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _BFS_SEED_BRAND)
        .select(F.col("p_partkey").alias("id"))
    )
    reach = bfs_reach_of(sym, seeds)
    return (
        reach.groupBy("hop")
        .agg(
            F.count("*").cast("bigint").alias("n_reached"),
            F.min("id").cast("bigint").alias("min_id"),
            F.max("id").cast("bigint").alias("max_id"),
            F.sum("id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("hop")
    )


graph_bfs_reach.__doc__ = graph_bfs_reach.__doc__.replace(
    "{_BFS_HOPS}", str(_BFS_HOPS)
).replace("{_BFS_SEED_BRAND}", _BFS_SEED_BRAND)


# ---------------------------------------------------------------------------
# graph_kcore — iterative core peeling at a data-derived threshold
# ---------------------------------------------------------------------------

#: Fixed peeling rounds (the family's unrolled-oracle discipline;
#: production loops the same round body to the fixpoint, which IS
#: the k-core).
_KCORE_ROUNDS = 3

#: Degree threshold as a fraction of the mean degree: k = (4·|rows|)
#: div (5·|V|) — 0.8× mean. Data-derived so the peel bites at every
#: SF (the co-order graph's density grows with SF: min degree 42 at
#: sf0.01 already defeats any fixed small k, while k = mean empties
#: the graph by round 2 — both measured; 0.8× peels 9-55%/round
#: across the fixture decades).
_KCORE_NUM, _KCORE_DEN = 4, 5


def _kcore_round_ctes() -> str:
    ctes = []
    for i in range(1, _KCORE_ROUNDS + 1):
        prev = "sym" if i == 1 else f"e{i - 1}"
        ctes.append(
            f"""s{i} AS (
      SELECT src AS id FROM {prev}, kv
      GROUP BY src, kv.k HAVING COUNT(*) >= kv.k
    ),
    e{i} AS (
      SELECT e.src, e.dst FROM {prev} e
      JOIN s{i} a ON e.src = a.id
      JOIN s{i} b ON e.dst = b.id
    )"""
        )
    return ",\n    ".join(ctes)


def kcore_rounds_of(
    sym: DataFrame,
    rounds: int = _KCORE_ROUNDS,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """The peeling loop over any symmetric edge frame ``(src, dst)``
    — module-level so the hypothesis differential drives the SAME
    loop the registered query runs. Returns one summary row per
    round: ``(round, k, n_nodes, n_edges, id_checksum)`` where
    n_edges counts symmetric (directed) rows of the surviving
    subgraph.

    Threshold k = ({_KCORE_NUM}·|rows|) div ({_KCORE_DEN}·|V|) is
    computed from the input once (one fold — the same kind of
    driver-side scalar as pagerank's node count). Per round: ONE
    map-side-combined degree fold over the surviving edges + TWO
    semi-joins of the survivor set onto the edges (src AND dst
    membership — the state is node-proportional and broadcasts by
    the family rule; ``broadcast_state=False`` / the session conf is
    the co-partitioned path, [[_bcast_pinned]]). Surviving edges
    checkpoint per round (the family's lineage-cut discipline), so
    Σ per-round cost ≤ rounds·|E| with the edge set SHRINKING every
    round — peeling only ever deletes."""
    spark = sym.sparkSession
    edges = sym.select("src", "dst").localCheckpoint(eager=False)
    tot = edges.agg(
        F.count("*").alias("e"),
        F.countDistinct("src").alias("n"),
    ).collect()[0]
    if tot.n == 0:
        # r16 self-review: same empty-input guard as pagerank_of
        raise ValueError("kcore_rounds_of: empty edge frame (no nodes)")
    k = (_KCORE_NUM * tot.e) // (_KCORE_DEN * tot.n)
    pinned = _bcast_pinned(spark, broadcast_state)
    alive = edges
    rows = []
    for i in range(1, rounds + 1):
        keep = (
            alive.groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select("id")
            .localCheckpoint()
        )
        # count only when auto-resolving (the bfs_reach_of pattern,
        # r16 self-review): on a pinned path the count is a wasted
        # driver-blocking job per round
        n_keep = keep.count() if pinned is None else 0
        bs = pinned if pinned is not None else _fits_broadcast(
            spark, n_keep
        )
        ka = (F.broadcast(keep) if bs else keep).alias("ka")
        kb = (F.broadcast(keep) if bs else keep).alias("kb")
        alive = (
            alive.join(ka, alive.src == F.col("ka.id"), "left_semi")
            .join(kb, alive.dst == F.col("kb.id"), "left_semi")
            .localCheckpoint(eager=False)
        )
        rows.append(
            keep.agg(
                F.count("*").cast("bigint").alias("n_nodes"),
                F.sum("id").cast("bigint").alias("id_checksum"),
            )
            .crossJoin(
                alive.agg(F.count("*").cast("bigint").alias("n_edges"))
            )
            .select(
                F.lit(i).cast("bigint").alias("round"),
                F.lit(k).cast("bigint").alias("k"),
                "n_nodes",
                "n_edges",
                "id_checksum",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "graph_kcore",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    sym AS (
      SELECT pa AS src, pb AS dst FROM pair
      UNION ALL
      SELECT pb AS src, pa AS dst FROM pair
    ),
    kv AS (
      SELECT CAST({_KCORE_NUM} * COUNT(*)
                  // ({_KCORE_DEN} * COUNT(DISTINCT src)) AS BIGINT) AS k
      FROM sym
    ),
    {{iters}}
    SELECT * FROM (
      {" UNION ALL ".join(
          f'''SELECT CAST({i} AS BIGINT) AS round,
                 (SELECT k FROM kv) AS k,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM s{i}) AS n_nodes,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM e{i}) AS n_edges,
                 (SELECT CAST(SUM(id) AS BIGINT) FROM s{i}) AS id_checksum'''
          for i in range(1, _KCORE_ROUNDS + 1)
      )}
    )
    ORDER BY round
    """.replace("{iters}", _kcore_round_ctes()),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative core peeling of the part co-order graph — the
    DENSITY member of the iterative graph family ([[dedup_cluster]]
    connectivity, [[graph_pagerank]] importance,
    [[graph_label_propagation]] communities, [[graph_bfs_reach]]
    blast radius, this: which nodes survive in the densely-connected
    core). Pipeline shapes: trimming a citation/co-occurrence graph
    to its stable core before expensive community detection, and the
    classic "dense subgraph of near-dup clusters" pre-filter.

    Semantics: synchronous peeling — round i keeps nodes whose
    degree WITHIN the round-(i−1) survivor subgraph is ≥ k, with k
    = 0.8× mean degree derived from the input (fixed k is vacuous on
    a graph whose min degree already exceeds it — measured min 42 at
    sf0.01). {_KCORE_ROUNDS} rounds unrolled in the oracle verbatim;
    the fixpoint of the same body is the true k-core. Per-round
    survivor counts at sf0.01: 2000 → 1705 → 1420 → 901 — every
    round does real work.

    Exactness: degrees, thresholds, counts, id checksums — all
    integer; nothing floats. Plan: see [[kcore_rounds_of]]."""
    sym = _sym_co_order_edges(load(spark, sf_dir, "lineitem")).select(
        "src", "dst"
    )
    return kcore_rounds_of(sym).orderBy("round")


graph_kcore.__doc__ = graph_kcore.__doc__.replace(
    "{_KCORE_ROUNDS}", str(_KCORE_ROUNDS)
)
kcore_rounds_of.__doc__ = kcore_rounds_of.__doc__.replace(
    "{_KCORE_NUM}", str(_KCORE_NUM)
).replace("{_KCORE_DEN}", str(_KCORE_DEN))


# ---------------------------------------------------------------------------
# graph_degree_stats — degree summary + Hill power-law tail estimate
# ---------------------------------------------------------------------------


@query(
    "graph_degree_stats",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    half AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT src AS id FROM half
        UNION ALL SELECT dst AS id FROM half
      ) GROUP BY id
    ),
    km AS (
      SELECT d AS kmin FROM (
        SELECT d,
               row_number() OVER (ORDER BY d) AS rn,
               COUNT(*) OVER () AS n
        FROM deg
      ) WHERE rn = (n + 1) // 2
    ),
    tail AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
             CAST(SUM(CAST(round(ln(deg.d) * 1000000) AS BIGINT)
                      - CAST(round(ln(km.kmin) * 1000000) AS BIGINT))
                  AS BIGINT) AS sum_micro
      FROM deg CROSS JOIN km
      WHERE deg.d >= km.kmin
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM half) AS n_edges,
           (SELECT CAST(MIN(d) AS BIGINT) FROM deg) AS d_min,
           (SELECT CAST(MAX(d) AS BIGINT) FROM deg) AS d_max,
           CAST((SELECT 2 * COUNT(*) FROM half) AS DOUBLE)
             / (SELECT COUNT(*) FROM deg) AS mean_degree,
           (SELECT CAST(kmin AS BIGINT) FROM km) AS kmin_median,
           tail.n_tail,
           1.0 + CAST(tail.n_tail AS DOUBLE) * 1000000.0
             / NULLIF(tail.sum_micro, 0) AS alpha_hill
    FROM tail
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution diagnostics for the co-order graph: node
    and edge counts, degree extremes, mean degree, and the Hill
    maximum-likelihood power-law tail exponent α̂ = 1 + n/Σ
    ln(d_i/k_min) over the upper-median tail — the one-row report
    that decides which graph algorithms are even safe to run
    (α < 2.5 hub-heavy graphs are where the degree-orientation and
    salting disciplines earn their keep; the mean/max gap is the
    skew alarm [[profile_join_skew]] raises for join keys, here for
    the graph family).

    Exactness: degrees and counts are exact; k_min is the MEDIAN
    degree by rank SELECTION; each ln(d) is quantized ONCE per
    distinct integer through the shared [[micro_ln]] contract, so
    the tail sum is an exact integer in micro-nats and α̂ is one
    shared final division. Mean degree is 2|E|/|V|, one division.

    Plan: the shared [[_co_order_edges]] build (the dominant, and
    amortizable, cost), one degree fold, one |V|-row rank window
    for the median, one tail fold. Everything after the edge build
    is |V|-proportional."""
    half = (
        _co_order_edges(load(spark, sf_dir, "lineitem"))
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    deg = _half_degrees(half).localCheckpoint(eager=False)
    from pyspark.sql.window import Window

    km = (
        deg.withColumn(
            "rn", F.row_number().over(Window.orderBy("d"))
        )
        .withColumn("n", F.count("*").over(Window.partitionBy()))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("d").alias("kmin"))
    )
    from ..functions.exact import micro_ln

    tail = (
        deg.crossJoin(F.broadcast(km))
        .filter(F.col("d") >= F.col("kmin"))
        .agg(
            F.count("*").cast("bigint").alias("n_tail"),
            F.sum(micro_ln(F.col("d")) - micro_ln(F.col("kmin")))
            .cast("bigint")
            .alias("sum_micro"),
            F.max("kmin").cast("bigint").alias("kmin_median"),
        )
    )
    summary = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.min("d").cast("bigint").alias("d_min"),
        F.max("d").cast("bigint").alias("d_max"),
    ).crossJoin(half.agg(F.count("*").cast("bigint").alias("n_edges")))
    return (
        summary.crossJoin(F.broadcast(tail))
        .select(
            "n_nodes",
            "n_edges",
            "d_min",
            "d_max",
            (
                (F.lit(2) * F.col("n_edges")).cast("double")
                / F.col("n_nodes")
            ).alias("mean_degree"),
            "kmin_median",
            "n_tail",
            (
                F.lit(1.0)
                + F.col("n_tail").cast("double")
                * 1000000.0
                / F.nullif(F.col("sum_micro").cast("double"), F.lit(0.0))
            ).alias("alpha_hill"),
        )
    )


# ---------------------------------------------------------------------------
# graph_assortativity — Newman degree-correlation coefficient
# ---------------------------------------------------------------------------

#: r = (4·A·M − B²) / (2·C·M − B²) over half edges with endpoint
#: degrees (j, k): A = Σjk, B = Σ(j+k), C = Σ(j²+k²) — the Newman
#: (2002) edge-degree Pearson correlation cross-multiplied to clear
#: the ½ and 1/M fractions, so BOTH engines divide exact 128-bit
#: integers exactly once.
_ASSORT_EXPR = (
    "CAST(4 * a * m - b * b AS DOUBLE)"
    " / NULLIF(CAST(2 * c * m - b * b AS DOUBLE), 0.0)"
)


@query(
    "graph_assortativity",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    half AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT src AS id FROM half
        UNION ALL SELECT dst AS id FROM half
      ) GROUP BY id
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CAST(ds.d AS HUGEINT) * dd.d) AS a,
             SUM(CAST(ds.d AS HUGEINT) + dd.d) AS b,
             SUM(CAST(ds.d AS HUGEINT) * ds.d
                 + CAST(dd.d AS HUGEINT) * dd.d) AS c
      FROM half h
      JOIN deg ds ON ds.id = h.src
      JOIN deg dd ON dd.id = h.dst
    )
    SELECT m AS n_edges, {_ASSORT_EXPR} AS assortativity
    FROM g
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-order graph (Newman 2002) —
    do hubs link to hubs (r > 0, social-network-like) or to leaves
    (r < 0, technological/dependency-like)? The one-number
    complement to [[graph_degree_stats]]'s marginal distribution:
    the JOINT degree structure, which decides epidemic/cascade
    behavior and whether hub-removal fragments the graph — in
    pipeline terms, whether popular items co-occur with popular
    items (recommendation echo) or with the long tail.

    Exactness: the edge-degree Pearson correlation is
    cross-multiplied to r = (4AM − B²)/(2CM − B²) over exact
    128-bit edge-degree moments (jk products peak ~deg²·|E| ≈ 6e20
    at sf1 once multiplied by M — wide the whole way), so the ONLY
    float operation is the single shared final division.

    Plan: the shared [[_co_order_edges]] build + [[_half_degrees]]
    fold, two degree joins onto the half-edge frame (the
    triangle-orientation join shape without the wedge explosion),
    one 4-moment single-row fold. |E|-proportional, no windows, no
    iteration."""
    half = (
        _co_order_edges(load(spark, sf_dir, "lineitem"))
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    deg = _half_degrees(half)
    j = (
        half.join(
            deg.select(F.col("id").alias("src"), F.col("d").alias("ds")),
            "src",
        )
        .join(
            deg.select(F.col("id").alias("dst"), F.col("d").alias("dd")),
            "dst",
        )
    )
    wide = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = j.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum(wide(F.col("ds")) * F.col("dd")).alias("a"),
        F.sum(wide(F.col("ds")) + F.col("dd")).alias("b"),
        F.sum(
            wide(F.col("ds")) * F.col("ds")
            + wide(F.col("dd")) * F.col("dd")
        ).alias("c"),
    )
    return g.select(
        F.col("m").alias("n_edges"),
        F.expr(_ASSORT_EXPR).alias("assortativity"),
    )
