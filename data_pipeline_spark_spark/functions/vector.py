"""Vector math over array<float|double> columns — built-in
higher-order functions only (JVM-side, codegen'd), no UDF in the hot
path. Used by the similarity-search and embedding-dedup operators.

At 100 TB the dot product per candidate pair is the inner loop; doing
it with F.zip_with + F.aggregate keeps it inside Tungsten instead of
round-tripping to Python. (A SIMD-friendlier alternative is a Pandas
UDF over float32 numpy blocks — measured locally the built-in path
wins below ~1k dims because it avoids Arrow transfer entirely.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential fold — ordering is
    deterministic, which matters for oracle comparison)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def norm_f32sq(a: Column) -> Column:
    """L2 norm over an ``array<float>`` with each square computed in
    float32 and only then widened to double for the fold. This is the
    parity-exact twin of a DuckDB oracle written as
    ``CAST(x_i * x_i AS DOUBLE)`` over FLOAT columns: DuckDB's
    FLOAT*FLOAT narrows the product to f32 (verified, r17), so the
    oracle's addends are f32-rounded squares — folding f64 squares
    instead (``norm(as_double_array(a))``) differs by up to half an
    f32 ulp per element and flips a ROUND(·, 4) output for ~7e-5 of
    random 8-dim vectors (measured; zero flips on current fixtures,
    but latent). Use THIS form whenever the oracle squares f32
    values; use plain :func:`norm` when both sides fold doubles."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def unit_normalize(a: Column) -> Column:
    """``a / ‖a‖`` with the norm STRUCTURALLY let-bound via a
    1-element transform (the FFD binder): the norm is itself a fold,
    and referencing it from the per-element division lambda re-folds
    the whole vector per element — O(d²)/row. A plain projection
    let-bind is NOT safe here: CollapseProject re-inlines an alias
    referenced exactly once back into the lambda (verified on the
    optimized plan, r14 review), whereas this binder is a single
    expression the optimizer cannot split. Callers must zero-norm
    guard (ANSI division raises on ‖a‖ = 0)."""
    return F.try_element_at(
        F.transform(
            F.array(norm(a)),
            lambda nr: F.transform(a, lambda x: x / nr),
        ),
        F.lit(1),
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs should be cast to array<double> first
    so both engines accumulate in double precision. The denominator is
    null-guarded: Spark 4 runs ANSI mode by default, where a zero-norm
    vector (all-zeros padding, missing embedding) would raise
    DIVIDE_BY_ZERO and kill the whole job — verified live (r8 review);
    NULL instead ranks last under the descending orderings every
    consumer uses."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def as_double_array(c: Column) -> Column:
    return c.cast("array<double>")
