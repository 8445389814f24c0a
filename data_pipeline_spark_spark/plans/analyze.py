"""Physical-plan introspection: the audit tooling behind "would this
plan survive 100×?".

Used by tests to assert plan PROPERTIES, not just results:
- filters reached the parquet scan (PushedFilters),
- the scan reads only the projected columns (ReadSchema),
- small-dimension joins are broadcast, not shuffled.

The reference relied on Athena to get this right invisibly
(reference README.md:29-31); we make it checkable.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The .explain('formatted') text, captured."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """PushedFilters lines from the formatted plan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def scan_columns(df: DataFrame) -> list[str]:
    """Column names in the first parquet ReadSchema of the plan.
    The field split is BRACKET-AWARE (r16 self-review): a nested
    column like ``a:struct<x:int,y:int>`` contains commas and
    closing brackets, so the earlier naive comma split produced
    phantom names ('y>') the moment any audited scan projected a
    nested column."""
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols, depth, start = [], 0, 0
            for i, ch in enumerate(inner):
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                elif ch == "," and depth == 0:
                    cols.append(inner[start:i])
                    start = i + 1
            cols.append(inner[start:])
            return [f.split(":")[0] for f in cols if f]
    return []


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Hash-partitioning exchanges in the plan (broadcast exchanges
    excluded — those are the cheap kind)."""
    import re

    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))
