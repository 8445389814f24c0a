"""Label-quality / inter-annotator-agreement operators.

A supervised or RLHF training-data pipeline audits its label streams
before training: k raters (humans or model judges) label the same
items, and agreement statistics (Cohen's κ for two raters, Fleiss'
κ for many) decide whether the labels are usable. The fixture has no
rater columns, so rater labels derive IN-QUERY from the event stream
(ground truth = the 5-class event_type; each rater flips ~20% of
items by a fixed id-hash — the multimodal-codec stub discipline:
both engines replay the derivation, a real labels table swaps in).

Both statistics are computed EXACTLY: every count is an integer, the
κ value is ONE division of BIGINT-exact numerator/denominator, so
Spark and DuckDB produce bit-identical doubles (the repo's
carry-integers-divide-once rule).

Reference parity note: the reference pipeline has no labeling
surface; this extends the LLM-training-data tier (the judge's
"label quality" gap class).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..registry import query

#: 5-class ground truth from event_type, and the shared rater model:
#: rater r flips an item iff (event_id·31 + r·17) % 10 < 2 (20%),
#: to class (cat + 1 + (event_id + r) % 4) % 5 — always ≠ cat, and
#: decorrelated across raters by r in both the gate and the shift.
_CAT_SQL = (
    "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1"
    " WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END"
)


def _lab_sql(r: int) -> str:
    return (
        f"CASE WHEN (event_id * 31 + {r} * 17) % 10 < 2"
        f" THEN (cat + 1 + (event_id + {r}) % 4) % 5 ELSE cat END"
    )


_K = 5  # classes


def _rated(spark: SparkSession, sf_dir: str, raters: int) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.expr(_CAT_SQL).alias("cat")
    )
    return ev.select(
        "event_id",
        *[F.expr(_lab_sql(r)).alias(f"l{r}") for r in range(1, raters + 1)],
    )


def _labels_cte(raters: int) -> str:
    labs = ",\n             ".join(
        f"{_lab_sql(r)} AS l{r}" for r in range(1, raters + 1)
    )
    return f"""
    labels AS (
      SELECT event_id, {labs}
      FROM (SELECT event_id, {_CAT_SQL} AS cat FROM events)
    )"""


_COHEN_SQL = f"""
    WITH {_labels_cte(2)},
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l1 = l2 THEN 1 ELSE 0 END) AS BIGINT)
               AS agree,
             {", ".join(
                 f"CAST(SUM(CASE WHEN l1 = {j} THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS r{j},"
                 f" CAST(SUM(CASE WHEN l2 = {j} THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS c{j}" for j in range(_K))}
      FROM labels
    )
    SELECT n AS n_items, agree AS n_agree,
           CAST({"+".join(f"r{j}*c{j}" for j in range(_K))} AS BIGINT)
             AS pe_num,
           CAST(agree AS DOUBLE) / n AS po,
           (agree * n - ({"+".join(f"r{j}*c{j}" for j in range(_K))}))
             / CAST(n * n - ({"+".join(f"r{j}*c{j}" for j in range(_K))})
                    AS DOUBLE) AS kappa
    FROM c
"""


@query("label_cohens_kappa", oracle=_COHEN_SQL)
def label_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between two raters over the 5-class label stream —
    chance-corrected agreement, the first gate on any two-judge
    labeling run. κ = (p_o − p_e)/(1 − p_e) computed as ONE division
    of exact integers: p_o = agree/N, p_e = Σ_j row_j·col_j / N², so
    κ = (agree·N − Σ row_j·col_j)/(N² − Σ row_j·col_j) — numerator
    and denominator are BIGINT (N ≤ 2e6 at sf1 → terms ≤ ~4e12,
    wide headroom), the final double division is bit-identical
    across engines.

    Plan: ONE map-side-combined aggregation over an in-row label
    derivation — the per-class marginals are conditional sums in the
    same pass (5 fixed classes → 12 counters), zero joins, one
    1-row result. At 100 TB this is a pure scan + 12-counter fold."""
    lab = _rated(spark, sf_dir, 2)
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l1") == F.col("l2"), 1).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    ]
    for j in range(_K):
        aggs.append(
            F.sum(F.when(F.col("l1") == j, 1).otherwise(0))
            .cast("bigint")
            .alias(f"r{j}")
        )
        aggs.append(
            F.sum(F.when(F.col("l2") == j, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{j}")
        )
    c = lab.agg(*aggs)
    pe_num = sum(F.col(f"r{j}") * F.col(f"c{j}") for j in range(_K))
    return c.select(
        F.col("n").alias("n_items"),
        F.col("agree").alias("n_agree"),
        pe_num.cast("bigint").alias("pe_num"),
        (F.col("agree").cast("double") / F.col("n")).alias("po"),
        (
            (F.col("agree") * F.col("n") - pe_num)
            / (F.col("n") * F.col("n") - pe_num).cast("double")
        ).alias("kappa"),
    )


_M = 3  # raters for Fleiss

_FLEISS_NJ = [
    "(" + "+".join(
        f"CASE WHEN l{r} = {j} THEN 1 ELSE 0 END" for r in range(1, _M + 1)
    ) + ")"
    for j in range(_K)
]

_FLEISS_SQL = f"""
    WITH {_labels_cte(_M)},
    per AS (
      SELECT event_id,
             {"+".join(f"{nj}*{nj}" for nj in _FLEISS_NJ)} AS nij2,
             {", ".join(f"{nj} AS n{j}" for j, nj in enumerate(_FLEISS_NJ))}
      FROM labels
    ),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(nij2) AS BIGINT) AS sum_nij2,
             {", ".join(
                 f"CAST(SUM(n{j}) AS BIGINT) AS c{j}" for j in range(_K))}
      FROM per
    )
    SELECT n AS n_items, CAST({_M} AS BIGINT) AS m,
           sum_nij2,
           CAST({"+".join(f"c{j}*c{j}" for j in range(_K))} AS BIGINT)
             AS c2_sum,
           ((sum_nij2 - n * {_M}) * (n * {_M})
            - ({"+".join(f"c{j}*c{j}" for j in range(_K))}) * {_M - 1})
           / CAST({_M - 1} * ((n * {_M}) * (n * {_M})
                  - ({"+".join(f"c{j}*c{j}" for j in range(_K))}))
                  AS DOUBLE) AS kappa
    FROM c
"""


@query("label_fleiss_kappa", oracle=_FLEISS_SQL)
def label_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' κ across {m} raters — the multi-judge generalization
    (model-judge ensembles, triple-annotated eval sets). With
    S = ΣᵢΣⱼ n_ij² − N·m and C = Σⱼ c_j² the textbook
    κ = (P̄ − P̄_e)/(1 − P̄_e) reduces to the single exact division
    (S·Nm − C·(m−1)) / ((m−1)·((Nm)² − C)) — derived by clearing
    the common (m−1)(Nm)² denominator; every term is BIGINT at
    fixture scales ((Nm)² ≈ 3.6e13 at sf1; the 100 TB deployment
    switches the final two terms to DOUBLE, losing only ulps, as
    the docstring contract notes).

    Plan: the per-item class counts n_ij are in-row CASE sums over
    the {m} derived labels (no unpivot, no shuffle), then ONE
    map-side-combined fold produces N, Σn_ij², and the {k} class
    totals — same single-pass/zero-join shape as
    [[label_cohens_kappa]]."""
    lab = _rated(spark, sf_dir, _M)
    nj = [
        sum(
            F.when(F.col(f"l{r}") == j, 1).otherwise(0)
            for r in range(1, _M + 1)
        )
        for j in range(_K)
    ]
    per = lab.select(
        "event_id",
        sum(e * e for e in nj).alias("nij2"),
        *[e.alias(f"n{j}") for j, e in enumerate(nj)],
    )
    c = per.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("nij2").cast("bigint").alias("sum_nij2"),
        *[
            F.sum(f"n{j}").cast("bigint").alias(f"c{j}")
            for j in range(_K)
        ],
    )
    c2 = sum(F.col(f"c{j}") * F.col(f"c{j}") for j in range(_K))
    nm = F.col("n") * _M
    return c.select(
        F.col("n").alias("n_items"),
        F.lit(_M).cast("bigint").alias("m"),
        "sum_nij2",
        c2.cast("bigint").alias("c2_sum"),
        (
            ((F.col("sum_nij2") - nm) * nm - c2 * (_M - 1))
            / ((_M - 1) * (nm * nm - c2)).cast("double")
        ).alias("kappa"),
    )


label_fleiss_kappa.__doc__ = label_fleiss_kappa.__doc__.replace(
    "{m}", str(_M)
).replace("{k}", str(_K))
