"""Cross-engine-exact building blocks shared by every operator whose
DuckDB oracle must match Spark bit-for-bit.

Two load-bearing contracts live here so they exist in ONE place each
(an edit that desynchronizes an operator from its oracle should be
impossible to make in only one copy):

- ``micro_ln`` — the micro-nat quantization of ``ln`` over integer
  arguments: round(ln(k)·1e6) as BIGINT, rounded ONCE per distinct
  integer so a 1-ulp libm divergence only matters if some value sits
  within an ulp of a .5 boundary (a few thousand exposures, not
  billions). Used by the unigram LM, BM25 idf, the NB classifier,
  and DSIR. The DuckDB twin is the literal SQL
  ``CAST(round(ln(k) * 1000000) AS BIGINT)``.
- ``md5_u32_sql`` / ``md5_u32_duck`` — the one 32-bit hash both
  engines compute bit-identically: the first 8 hex chars of md5
  parsed as an integer (Spark ``conv``, DuckDB ``CAST('0x…')``).
  xxhash64 is Spark-only, so any operator that wants a FULL value
  oracle over hashed features (DSIR buckets, winnowing fingerprints)
  must hash through this pair. The two fragments MUST stay the same
  function — change them together or not at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micro_ln(col) -> Column:
    """``round(ln(col)·1e6)`` as BIGINT — exact micro-nats. ``col``
    must be an integer-valued column (the single-rounding exposure
    argument depends on it)."""
    return F.round(F.log(col) * 1000000).cast("bigint")


def pd_round_half_away(s, scale: int):
    """HALF-AWAY-FROM-ZERO rounding of ``s * 10**scale`` for a pandas
    Series — the pandas twin of Spark ``F.round`` and DuckDB
    ``round()``. pandas/numpy ``.round()`` is half-to-EVEN, so a
    pandas-side state fold that quantizes with it diverges from both
    engines for any value whose scaled form lands exactly on .5 (r17
    advisor finding on the applyInPandasWithState milli-unit fold;
    masked at fixture scale only because measures carry ≤3 decimals).
    Returns a float Series of integral values — caller casts."""
    import numpy as np

    scaled = s * (10**scale)
    return np.copysign(np.floor(np.abs(scaled) + 0.5), scaled)


def wide_sum(*factors) -> Column:
    """Exact 128-bit-class product-sum: Σ(f1·f2·…) with the FIRST
    factor cast to decimal(38,0) BEFORE the multiply, so neither the
    per-element product nor the accumulator can wrap int64 — the
    Spark twin of DuckDB's ``SUM(CAST(f1 AS HUGEINT) * f2 * …)``.
    The moment discipline's single shared widening point
    ([[abtest_welch_ttest]], [[ts_acf]], [[agg_skew_kurtosis]]):
    casting only the SUM (``sum(x*y).cast``) widens too late — the
    bigint element product overflows first."""
    first, *rest = factors
    acc = first.cast("decimal(38,0)")
    for f in rest:
        acc = acc * f
    return F.sum(acc)


def md5_u32_sql(operand: str) -> str:
    """Spark SQL fragment for the cross-engine 32-bit md5 hash of
    ``operand`` (an expression string), usable inside higher-order
    lambdas. Twin of [[md5_u32_duck]]."""
    return (
        f"CAST(conv(substring(md5({operand}), 1, 8), 16, 10) AS BIGINT)"
    )


def md5_u32_duck(operand: str) -> str:
    """DuckDB SQL fragment computing the SAME integer as
    [[md5_u32_sql]] for the same input."""
    return f"CAST(concat('0x', substr(md5({operand}), 1, 8)) AS BIGINT)"


def md5_u32_col(operand: Column) -> Column:
    """Column twin of [[md5_u32_sql]] — the identical
    conv(substring(md5(·), 1, 8), 16, 10) integer, built from a
    Column instead of an expression STRING. For callers whose hash
    input embeds caller-supplied DATA (e.g. [[dp_noise]]'s secret
    seed): composing with F.lit keeps the data out of any SQL text,
    where a quote character would break parsing or splice
    expressions. The three md5_u32_* forms MUST stay the same
    function — change them together or not at all."""
    return F.conv(F.substring(F.md5(operand), 1, 8), 16, 10).cast(
        "bigint"
    )


def md5_u60_sql(operand: str) -> str:
    """Spark SQL fragment for the cross-engine 60-bit md5 hash of
    ``operand`` — the wide twin of [[md5_u32_sql]] for FULL value
    oracles over hashed features where 32 bits would collide at
    corpus scale (birthday bound ~2^16 keys): 15 hex chars = 60 bits
    fits BIGINT on both engines. Same contract: change the three
    md5_u60_* forms together or not at all."""
    return (
        f"CAST(conv(substring(md5({operand}), 1, 15), 16, 10) AS BIGINT)"
    )


def md5_u60_duck(operand: str) -> str:
    """DuckDB SQL fragment computing the SAME integer as
    [[md5_u60_sql]] for the same input."""
    return f"CAST(concat('0x', substr(md5({operand}), 1, 15)) AS BIGINT)"


def md5_u60_col(operand: Column) -> Column:
    """Column twin of [[md5_u60_sql]]."""
    return F.conv(F.substring(F.md5(operand), 1, 15), 16, 10).cast(
        "bigint"
    )
