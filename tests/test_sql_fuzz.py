"""Differential SQL fuzzing: generate random-but-reproducible ANSI
queries from a dialect-portable grammar and run the IDENTICAL text on
Spark and DuckDB — the property that the engine's ad-hoc SQL surface
(the reference's Athena console role, reference README.md:14-15)
agrees with an independent engine on arbitrary filter/aggregate/join
compositions, not just the hand-picked registry queries.

Determinism rules baked into the grammar (the same ones the registry
oracles follow): measures are summed as exact integer centi-units
(float summation order is engine-dependent), every ORDER BY is total,
and only dialect-shared syntax is emitted (EXTRACT, DATE literals,
BETWEEN, IN, CASE WHEN).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_spark_spark.catalog import register_views

from .oracle import assert_matches_oracle

GROUP_COLS = [
    "l_returnflag",
    "l_linestatus",
    "CAST(EXTRACT(year FROM l_shipdate) AS INT)",
]
JOIN_GROUP_COLS = GROUP_COLS + ["o_orderpriority", "o_orderstatus"]

AGGS = [
    "COUNT(*)",
    "SUM(CAST(round(l_quantity * 100) AS BIGINT))",
    "SUM(CAST(round(l_extendedprice * 100) AS BIGINT))",
    "COUNT(DISTINCT l_partkey)",
    "MIN(l_shipdate)",
    "MAX(l_shipdate)",
]

PREDS = [
    "l_shipdate >= DATE '1996-01-01'",
    "l_shipdate < DATE '1999-06-15'",
    "l_quantity BETWEEN 5 AND 45",
    "l_discount <= 0.05",
    "l_returnflag IN ('A', 'R')",
    "l_linestatus = 'F'",
    "l_partkey % 7 <> 0",
    "(l_quantity > 30 OR l_discount > 0.03)",
]
JOIN_PREDS = PREDS + [
    "o_orderpriority IN ('1-URGENT', '2-HIGH')",
    "o_totalprice > 50000",
    "o_orderdate < DATE '2000-01-01'",
]


@st.composite
def sql_query(draw):
    use_join = draw(st.booleans())
    gcols_pool = JOIN_GROUP_COLS if use_join else GROUP_COLS
    preds_pool = JOIN_PREDS if use_join else PREDS
    gcols = draw(
        st.lists(st.sampled_from(gcols_pool), min_size=0, max_size=2, unique=True)
    )
    aggs = draw(
        st.lists(st.sampled_from(AGGS), min_size=1, max_size=3, unique=True)
    )
    preds = draw(
        st.lists(st.sampled_from(preds_pool), min_size=0, max_size=3, unique=True)
    )
    sel = [f"{c} AS g{i}" for i, c in enumerate(gcols)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = "SELECT " + ", ".join(sel) + " FROM lineitem"
    if use_join:
        sql += " JOIN orders ON l_orderkey = o_orderkey"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if gcols:
        sql += " GROUP BY " + ", ".join(f"g{i}" for i in range(len(gcols)))
        if draw(st.booleans()):
            sql += " HAVING COUNT(*) > 10"
        if draw(st.booleans()):
            # total order: every group column then the first aggregate
            keys = ", ".join(f"g{i}" for i in range(len(gcols)))
            sql += f" ORDER BY a0 DESC, {keys} LIMIT 20"
    return sql


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql_query())
def test_fuzzed_sql_agrees_with_duckdb(spark, sf_dir, sql):
    register_views(spark, sf_dir)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir, f"fuzz[{sql[:60]}...]")


WIN_PARTS = ["l_returnflag", "l_linestatus", "l_suppkey % 10"]
# total order inside every partition: shipdate, then the unique line id
WIN_ORDER = "l_shipdate, l_orderkey, l_linenumber"
WIN_FNS = [
    "ROW_NUMBER()",
    "RANK()",
    "DENSE_RANK()",
    "NTILE(4)",
    "SUM(CAST(round(l_quantity * 100) AS BIGINT))",
    "LAG(l_orderkey, 1) ",
    "COUNT(*)",
]


@st.composite
def window_query(draw):
    part = draw(st.sampled_from(WIN_PARTS))
    fns = draw(st.lists(st.sampled_from(WIN_FNS), min_size=1, max_size=3, unique=True))
    preds = draw(st.lists(st.sampled_from(PREDS), min_size=0, max_size=2, unique=True))
    over = f"OVER (PARTITION BY {part} ORDER BY {WIN_ORDER}"
    cols = []
    for i, fn in enumerate(fns):
        frame = (
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            if fn.startswith(("SUM", "COUNT"))
            else ""
        )
        cols.append(f"{fn} {over}{frame}) AS w{i}")
    sql = (
        "SELECT l_orderkey, l_linenumber, "
        + ", ".join(cols)
        + " FROM lineitem"
    )
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    return sql


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(window_query())
def test_fuzzed_window_sql_agrees_with_duckdb(spark, sf_dir, sql):
    """Window-function arm: ranking/analytic/running-frame functions
    over a totally-ordered window run as identical SQL text on both
    engines. The running SUM carries exact integer centi-units and
    every ordering ends in the unique (orderkey, linenumber) pair, so
    rank ties and frame contents are engine-independent."""
    register_views(spark, sf_dir)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir, f"wfuzz[{sql[:60]}...]")


@st.composite
def rollup_query(draw):
    gcols = draw(
        st.lists(st.sampled_from(GROUP_COLS), min_size=1, max_size=2, unique=True)
    )
    aggs = draw(st.lists(st.sampled_from(AGGS), min_size=1, max_size=2, unique=True))
    preds = draw(st.lists(st.sampled_from(PREDS), min_size=0, max_size=2, unique=True))
    sel = [f"{c} AS g{i}" for i, c in enumerate(gcols)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = "SELECT " + ", ".join(sel) + " FROM lineitem"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    sql += " GROUP BY ROLLUP (" + ", ".join(gcols) + ")"
    return sql


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rollup_query())
def test_fuzzed_rollup_sql_agrees_with_duckdb(spark, sf_dir, sql):
    """ROLLUP arm: hierarchical subtotal rows (including the NULL
    grand-total markers) must agree between engines for arbitrary
    grouping/aggregate/predicate combinations."""
    register_views(spark, sf_dir)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir, f"rfuzz[{sql[:60]}...]")


ORDERS_PREDS = [
    "o_orderpriority IN ('1-URGENT', '2-HIGH')",
    "o_totalprice > 100000",
    "o_orderdate >= DATE '1997-01-01'",
    "o_custkey % 5 = 0",
]
SET_OPS = ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]


@st.composite
def setop_query(draw):
    op = draw(st.sampled_from(SET_OPS))
    lp = draw(st.lists(st.sampled_from(PREDS), min_size=1, max_size=2, unique=True))
    rp = draw(
        st.lists(st.sampled_from(ORDERS_PREDS), min_size=1, max_size=2, unique=True)
    )
    left = "SELECT l_orderkey AS k FROM lineitem WHERE " + " AND ".join(lp)
    right = "SELECT o_orderkey AS k FROM orders WHERE " + " AND ".join(rp)
    return f"SELECT k FROM (({left}) {op} ({right})) t"


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(setop_query())
def test_fuzzed_setop_sql_agrees_with_duckdb(spark, sf_dir, sql):
    """Set-operation arm: UNION [ALL] / INTERSECT / EXCEPT between
    filtered key sets — distinct semantics and duplicate counting must
    agree between engines."""
    register_views(spark, sf_dir)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir, f"sfuzz[{sql[:60]}...]")


SCALAR_EXPRS = [
    # strings — dialect-shared semantics (1-based substr, plain concat)
    "upper(c_name)",
    "lower(c_mktsegment)",
    "substr(c_name, 10, 8)",
    "CAST(length(c_name) AS BIGINT)",
    "replace(c_name, '0', '#')",
    "lpad(CAST(c_custkey AS STRING), 8, '0')",
    "c_mktsegment || '_' || CAST(c_nationkey AS STRING)",
    # math — floor/ceil return double in DuckDB, bigint in Spark → CAST
    "CAST(floor(c_acctbal) AS BIGINT)",
    "CAST(ceil(c_acctbal / 100) AS BIGINT)",
    "abs(c_nationkey - 12)",
    "c_custkey % 7",
    "least(c_nationkey, 10)",
    "greatest(c_nationkey, 10)",
    # conditional
    "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END",
    "COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'n/a')",
]


@st.composite
def scalar_query(draw):
    exprs = draw(
        st.lists(st.sampled_from(SCALAR_EXPRS), min_size=1, max_size=4, unique=True)
    )
    sel = ["c_custkey"] + [f"{e} AS s{i}" for i, e in enumerate(exprs)]
    return "SELECT " + ", ".join(sel) + " FROM customer"


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scalar_query())
def test_fuzzed_scalar_sql_agrees_with_duckdb(spark, sf_dir, sql):
    """Scalar-function arm: random compositions of the dialect-shared
    string/math/conditional function subset, per-row over customer.
    Every expression is pinned to identical cross-engine semantics
    (explicit CASTs where return types diverge, e.g. floor/ceil)."""
    register_views(spark, sf_dir)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir, f"scfuzz[{sql[:60]}...]")


SUBQ_INNER_PREDS = [
    "o_totalprice > 100000",
    "o_orderpriority = '1-URGENT'",
    "o_orderdate >= DATE '1997-01-01'",
    "o_orderstatus = 'F'",
]
SUBQ_OUTER_PREDS = [
    "c_acctbal > 0",
    "c_nationkey < 15",
    "c_mktsegment IN ('BUILDING', 'AUTOMOBILE')",
]


@st.composite
def subquery_query(draw):
    form = draw(
        st.sampled_from(["EXISTS", "NOT EXISTS", "IN", "NOT IN", "SCALAR"])
    )
    ip = draw(
        st.lists(st.sampled_from(SUBQ_INNER_PREDS), min_size=1, max_size=2, unique=True)
    )
    op = draw(
        st.lists(st.sampled_from(SUBQ_OUTER_PREDS), min_size=0, max_size=2, unique=True)
    )
    inner_where = " AND ".join(ip)
    if form in ("EXISTS", "NOT EXISTS"):
        cond = (
            f"{form} (SELECT 1 FROM orders"
            f" WHERE o_custkey = c_custkey AND {inner_where})"
        )
    elif form in ("IN", "NOT IN"):
        # o_custkey is non-null, so NOT IN is safe (no null-poisoning;
        # the poisoned case is pinned by not_in_null_semantics)
        cond = (
            f"c_custkey {form} (SELECT o_custkey FROM orders"
            f" WHERE {inner_where})"
        )
    else:
        cond = (
            f"c_custkey <= (SELECT MAX(o_custkey) FROM orders"
            f" WHERE {inner_where})"
        )
    where = " AND ".join([cond] + op)
    return f"SELECT c_custkey, c_nationkey FROM customer WHERE {where}"


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(subquery_query())
def test_fuzzed_subquery_sql_agrees_with_duckdb(spark, sf_dir, sql):
    """Subquery arm: correlated EXISTS / NOT EXISTS, uncorrelated
    [NOT] IN over a non-null key, and scalar-aggregate subqueries —
    the decorrelation/rewrite paths (semi/anti join, scalar subquery
    broadcast) must agree with DuckDB's independent planning."""
    register_views(spark, sf_dir)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir, f"qfuzz[{sql[:60]}...]")


@st.composite
def grouping_sets_query(draw):
    gcols = draw(
        st.lists(st.sampled_from(GROUP_COLS), min_size=2, max_size=2, unique=True)
    )
    aggs = draw(st.lists(st.sampled_from(AGGS), min_size=1, max_size=2, unique=True))
    preds = draw(st.lists(st.sampled_from(PREDS), min_size=0, max_size=2, unique=True))
    form = draw(st.sampled_from(["CUBE", "SETS"]))
    sel = [f"{c} AS g{i}" for i, c in enumerate(gcols)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = "SELECT " + ", ".join(sel) + " FROM lineitem"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if form == "CUBE":
        sql += " GROUP BY CUBE (" + ", ".join(gcols) + ")"
    else:
        a, b = gcols
        sql += f" GROUP BY GROUPING SETS (({a}, {b}), ({a}), ())"
    return sql


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(grouping_sets_query())
def test_fuzzed_grouping_sets_sql_agrees_with_duckdb(spark, sf_dir, sql):
    """CUBE / GROUPING SETS arm: the full lattice (CUBE) and explicit
    sparse lattices must produce identical subtotal rows, including
    NULL grouping markers, on both engines."""
    register_views(spark, sf_dir)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir, f"gfuzz[{sql[:60]}...]")


SUBQ_SHAPES = ["EXISTS", "NOT EXISTS", "IN", "NOT IN"]


@st.composite
def subquery_query(draw):
    shape = draw(st.sampled_from(SUBQ_SHAPES))
    inner = draw(st.lists(st.sampled_from(PREDS), min_size=1, max_size=2, unique=True))
    outer = draw(
        st.lists(st.sampled_from(ORDERS_PREDS), min_size=0, max_size=1, unique=True)
    )
    ip = " AND ".join(inner)
    if shape.endswith("EXISTS"):
        cond = (
            f"{shape} (SELECT 1 FROM lineitem"
            f" WHERE l_orderkey = o_orderkey AND {ip})"
        )
    else:
        # the IN-list keys are NOT NULL in the fixture, so NOT IN's
        # three-valued trap can't empty the result; the arm checks the
        # engines agree on the ordinary path (the null path is pinned
        # by the hand-written not_in_null_semantics key)
        cond = f"o_orderkey {shape} (SELECT l_orderkey FROM lineitem WHERE {ip})"
    sql = f"SELECT o_orderkey FROM orders WHERE {cond}"
    if outer:
        sql += " AND " + " AND ".join(outer)
    return sql


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(subquery_query())
def test_fuzzed_subquery_sql_agrees_with_duckdb(spark, sf_dir, sql):
    """Correlated/uncorrelated subquery arm: EXISTS / NOT EXISTS /
    IN / NOT IN membership predicates (the semi/anti-join rewrites)
    over arbitrary inner and outer filters must agree between
    engines."""
    register_views(spark, sf_dir)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir, f"qfuzz[{sql[:60]}...]")
