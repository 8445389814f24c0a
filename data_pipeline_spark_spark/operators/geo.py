"""Geospatial operators over synthetic integer coordinates.

The fixture has no lat/lon, so coordinates derive IN-QUERY from
event_id by salted md5_u32 hashes into a 1 000 000 × 1 000 000
micro-unit plane — the same stub discipline as the multimodal
codecs: the derivation is part of the query (both engines replay it
identically), and a real table swaps its own projected-integer
coordinates into the same columns without touching the plan. Integer
micro-units rather than float degrees keep every distance compare
EXACT (squared euclidean in BIGINT) — no haversine transcendentals
to diverge across engines; a production deployment projects to
metres the same way (web-mercator micro-metres).

Reference parity note: the reference pipeline (emmhh/
data-pipeline-spark, ~2 020 LoC EEG ETL) has no geospatial surface;
this extends the engine's analytics tier the way a telemetry /
fleet / POI workload would need at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..functions.exact import md5_u32_col, md5_u32_duck
from ..registry import query

#: Plane size in micro-units. Coordinates come from the repo's
#: cross-engine md5_u32 machinery on two independent salts — a
#: LINEAR congruential mix was measured degenerate here (pair
#: distances depend only on id DIFFERENCES, so the lattice has no
#: close pairs at all; the brute-force differential caught it):
#: synthetic geometry needs a real hash, not an affine map.
_GEO_M = 1_000_000
_GEO_SALT_X = "/geo-x-v1"
_GEO_SALT_Y = "/geo-y-v1"

#: Radius for the self-join in micro-units; cell size = radius makes
#: the 3×3 neighbourhood EXACT by construction (|dx| ≤ R ⇒ the cell
#: coordinates differ by ≤ 1 — the phash-band pigeonhole argument in
#: planar form).
_GEO_R = 500

_GEO_PTS_SQL = f"""
      SELECT event_id AS id,
             {md5_u32_duck(
                 f"CAST(event_id AS VARCHAR) || '{_GEO_SALT_X}'"
             )} % {_GEO_M} AS x,
             {md5_u32_duck(
                 f"CAST(event_id AS VARCHAR) || '{_GEO_SALT_Y}'"
             )} % {_GEO_M} AS y
      FROM events
"""


def _with_xy(df: DataFrame) -> DataFrame:
    """Append the derived ``x, y`` coordinates to any frame carrying
    an ``id`` column — ONE definition of the salted-hash projection
    so every geo key (and any carried measure columns) derives
    coordinates in the same single scan."""
    return df.select(
        "*",
        (
            md5_u32_col(
                F.concat(F.col("id").cast("string"), F.lit(_GEO_SALT_X))
            )
            % _GEO_M
        ).alias("x"),
        (
            md5_u32_col(
                F.concat(F.col("id").cast("string"), F.lit(_GEO_SALT_Y))
            )
            % _GEO_M
        ).alias("y"),
    )


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived point set ``(id, x, y)`` — twin of the oracle's
    ``pts`` CTE."""
    ev = load(spark, sf_dir, "events")
    return _with_xy(ev.select(F.col("event_id").alias("id")))


_RADIUS_SQL = f"""
    WITH pts AS ({_GEO_PTS_SQL}),
    cells AS (
      SELECT id, x, y, x // {_GEO_R} AS cx, y // {_GEO_R} AS cy
      FROM pts
    ),
    probe AS (
      SELECT c.id, c.x, c.y, c.cx + d.dx AS cx, c.cy + d.dy AS cy
      FROM cells c
      CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)) AS d(dx, dy)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
    FROM probe a
    JOIN cells b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x)
          + (a.y - b.y) * (a.y - b.y) <= {_GEO_R * _GEO_R}
    ORDER BY id_a, id_b
"""


@query("geo_grid_radius_join", oracle=_RADIUS_SQL)
def geo_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within {R} micro-units: the radius self-join
    every telemetry/POI workload needs (co-location, contact
    tracing, densification), grid-bucketed so it NEVER goes
    all-pairs. Each point lands in ONE home cell of side {R}; the
    probe side fans each point to its 3×3 cell neighbourhood; the
    join matches probe cell = home cell; the exact integer
    squared-distance verify lands BEFORE any downstream shuffle
    (the phash verify-then-dedup discipline). Exactness is
    structural: |Δx|,|Δy| ≤ {R} forces cell deltas ≤ 1, so every
    qualifying pair meets in exactly one (probe-a, home-b) cell —
    no dedup pass needed, no recall loss (the planar pigeonhole).

    Scale: candidates are Σ_cell 9·n_cell·n̄_cell — density-bounded,
    never n² (expected pairs at the fixture density: ~40 at sf0.01,
    ~4k at sf0.1, ~400k at sf1); the shuffle key is the cell id,
    9n probe rows of 4 longs each; skewed cells degrade one bucket,
    not the plan (the salting escape would subdivide cells, i.e.
    shrink {R}'s grid — same knob family as resolve_phash_bands).
    Coordinates derive in-row (zero extra scans)."""
    return grid_radius_pairs(_points(spark, sf_dir), _GEO_R)


def grid_radius_pairs(pts: DataFrame, r: int) -> DataFrame:
    """The grid-bucketed radius self-join over any ``(id, x, y)``
    integer point frame — module-level so the brute-force
    differential and the cell-boundary contracts drive the SAME
    join the registered query runs (the lpa_of/phash_near_dup_pairs
    convention)."""
    cells = pts.select(
        "id",
        "x",
        "y",
        F.expr(f"x div {r}").alias("cx"),
        F.expr(f"y div {r}").alias("cy"),
    ).localCheckpoint(eager=False)  # home side + probe side read it
    # 3×3 fan-out via chained generators (the basket/phash rule:
    # generators stay inside whole-stage codegen, HOF lambdas don't)
    three = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probe = (
        cells.select(
            "id", "x", "y", "cx", "cy", F.explode(three).alias("dx")
        )
        .select(
            "id",
            "x",
            "y",
            (F.col("cx") + F.col("dx")).alias("cx"),
            "cy",
            F.explode(three).alias("dy"),
        )
        .select("id", "x", "y", "cx", (F.col("cy") + F.col("dy")).alias("cy"))
    )
    a, b = probe.alias("a"), cells.alias("b")
    dist2 = (F.col("a.x") - F.col("b.x")) * (
        F.col("a.x") - F.col("b.x")
    ) + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(dist2 <= r * r)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist2.cast("bigint").alias("dist2"),
        )
        .orderBy("id_a", "id_b")
    )


geo_grid_radius_join.__doc__ = geo_grid_radius_join.__doc__.replace(
    "{R}", str(_GEO_R)
)


@query("geo_cell_stats", oracle=f"""
    WITH pts AS ({_GEO_PTS_SQL}),
    ev AS (
      SELECT p.id, p.x, p.y,
             CAST(round(e.value * 100) AS BIGINT) AS v_centi
      FROM pts p JOIN events e ON e.event_id = p.id
    )
    SELECT x // 100000 AS cell_x, y // 100000 AS cell_y,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(v_centi) AS BIGINT) AS sum_value_centi,
           CAST(MIN(id) AS BIGINT) AS min_id
    FROM ev
    GROUP BY cell_x, cell_y
    ORDER BY n_points DESC, cell_x ASC, cell_y ASC
    LIMIT 25
""")
def geo_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density/aggregate per coarse grid cell (10×10 grid over the
    plane): the map-reduce shape of every heatmap / coverage /
    hot-spot readout. One map-side-combined groupBy on the derived
    cell id — the aggregation key is computed in-row, so the only
    shuffle carries ≤ 100 partial rows per map task regardless of
    corpus size. Exact: integer cell ids, centi-unit value sums
    (the fixture's 2-decimal measures), min id as the per-cell
    canonical witness.

    r16 self-review fix: x, y, and v_centi are all per-row
    derivations of the SAME events row, so they project in one scan
    — the earlier form joined [[_points]] back to events on id,
    paying a second full scan plus a join for data one select
    produces identically (and contradicting the module's own
    'coordinates derive in-row, zero extra scans' discipline)."""
    ev = _with_xy(
        load(spark, sf_dir, "events").select(
            F.col("event_id").alias("id"),
            F.round(F.col("value") * 100).cast("bigint").alias("v_centi"),
        )
    )
    return (
        ev.groupBy(
            F.expr("x div 100000").alias("cell_x"),
            F.expr("y div 100000").alias("cell_y"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.sum("v_centi").cast("bigint").alias("sum_value_centi"),
            F.min("id").cast("bigint").alias("min_id"),
        )
        .orderBy(
            F.col("n_points").desc(),
            F.col("cell_x").asc(),
            F.col("cell_y").asc(),
        )
        .limit(25)
    )
