"""Fuzzy string matching: edit-distance self-join with symmetric-
deletion blocking (the SymSpell scheme, Garbe 2012 — public).

The reference's catalog/API layer matches user-supplied names against
catalog entries only exactly (reference README.md:16, the predefined-
query parameter path); entity resolution over dirty text needs the
approximate form. All-pairs levenshtein is O(n²) and unshippable at
corpus scale, so the join blocks on deletion neighborhoods:

    keys(s) = {s} ∪ { s with one character deleted }

For edit distance ≤ 1 this blocking is EXACT (no recall loss), by
case analysis: a substitution at position j means deleting j from
both strings yields the same key; an insertion/deletion means the
shorter string itself is a deletion key of the longer. So every
matching pair shares ≥ 1 key, and the verify step (true levenshtein
on the candidate pairs) removes the false positives the blocking
admits. Candidates ∝ Σ per-key bucket², never n² — the same shape as
the MinHash-LSH rung in [[dedup_fuzzy]].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

_FUZZY_SQL = """
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM n a JOIN n b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 1
"""


@query("join_fuzzy_string", oracle=_FUZZY_SQL)
def join_fuzzy_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate name pairs (edit distance ≤ 1) over the distinct
    part names, via symmetric-deletion blocking + exact levenshtein
    verify. The oracle is the brute-force all-pairs form — feasible for
    DuckDB at fixture scale, which is exactly the quadratic plan this
    operator exists to avoid.

    Scale shape: keys per string = len+1 (cap the neighborhood at a
    fixed prefix length for long strings, as published SymSpell does —
    fixture names are ≤ ~20 chars so uncapped here); the join key is
    xxhash64 of the deletion variant so every shuffle carries 8-byte
    longs; hash collisions only ADD candidates, never drop them, and
    the levenshtein verify discards them — correctness does not depend
    on the hash. The candidate `distinct` and the verify both ride the
    same shuffle; no driver-side work at any size."""
    names = load(spark, sf_dir, "part").select("p_name").distinct()
    # deletion neighborhood: the string itself + every single-char
    # deletion, hashed to long
    keyed = names.select(
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
    cand = (
        a.join(b, "k")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.filter(dist <= 1).select(
        "name_a", "name_b", dist.alias("dist")
    )
