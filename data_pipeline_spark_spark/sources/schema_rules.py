"""Name-based column typing + super-category taxonomy.

Re-expresses two driver-side schema utilities of the reference:

- `type_for_column` — the name-based type rules of reference
  gen_schema.py:5-14: "comment" → string, names ending in "time" →
  string, "clockdatetime" → timestamp, everything else double. Used
  when registering the CURATED table schema (the raw read is
  all-double, the v9 approach, reference sparkle-v9.py:100-102).
- `fold_supercategories` — reference crawler.py:27-32 folds the
  two-row header (row 7 = super-category labels spanning column
  ranges, row 8 = column names) into a {super_category: [columns]}
  taxonomy (reference mapping.json, 270 groups). We keep the same
  fold and additionally expose it as a (column → super_category)
  mapping DataFrame to broadcast-join at query time — the tidy-format
  path for 6k-wide data (SURVEY.md §7 step 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def type_for_column(name: str) -> str:
    """Spark SQL type name for a curated column, by column name."""
    low = name.lower()
    if "comment" in low:
        return "string"
    if low == "clockdatetime":
        return "timestamp"
    if low.endswith("time"):
        return "string"
    return "double"


def fold_supercategories(
    supercat_row: list[str], header_row: list[str]
) -> dict[str, list[str]]:
    """Fold the two header rows into {super_category: [column, ...]}.

    The super-category row labels only the FIRST column of each span;
    subsequent empty cells inherit the label to its left (how the
    reference's crawler interprets the raw layout). Unlabeled leading
    columns group under ''.
    """
    mapping: dict[str, list[str]] = {}
    current = ""
    for label, col in zip(supercat_row, header_row):
        if label:
            current = label
        mapping.setdefault(current, []).append(col)
    return mapping


def cast_by_prefix(df: DataFrame, prefix: str, type_name: str = "double") -> DataFrame:
    """Cast every column whose name starts with ``prefix`` (reference
    sparkle-v7.py:151-154 cast all I* columns to double). One SELECT,
    not a withColumn loop — n chained withColumns build n projection
    nodes and blow up analysis time on 6k-wide schemas."""
    from pyspark.sql import functions as F

    return df.select(
        *[
            F.col(c).cast(type_name).alias(c) if c.startswith(prefix) else F.col(c)
            for c in df.columns
        ]
    )


def supercat_mapping_df(
    spark: SparkSession, mapping: dict[str, list[str]]
) -> DataFrame:
    """(column, super_category) mapping table — small enough to
    broadcast at any scale (270 groups × ~6k columns)."""
    rows = [
        (col, sc) for sc, cols in mapping.items() for col in cols
    ]
    return spark.createDataFrame(rows, "column string, super_category string")
