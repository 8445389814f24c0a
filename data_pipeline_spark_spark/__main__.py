"""Command-line entry point: run any registered query by name.

    python -m data_pipeline_spark_spark <key> [--sf DIR] [--show N]
                                              [--explain] [--out PATH]
    python -m data_pipeline_spark_spark --list [PREFIX]

Replaces the reference's operational surface (Athena console +
predefined API queries, reference README.md:14-16) with a direct
driver: every SURVEY §2 operator and EXT rung is a named key backed
by the same registry the benchmark and the correctness harness use.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m data_pipeline_spark_spark",
        description="Run a registered analytics query by name.",
    )
    ap.add_argument("key", nargs="?", help="query key (see --list)")
    ap.add_argument(
        "--sf",
        default="/root/testdata/sf0.01",
        help="fixture dir with the parquet tables (default sf0.01)",
    )
    ap.add_argument("--show", type=int, default=20, help="rows to print")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )
    ap.add_argument(
        "--out", help="write the full result as parquet to this path"
    )
    ap.add_argument(
        "--list",
        nargs="?",
        const="",
        default=None,
        metavar="PREFIX",
        help="list registered keys (optionally filtered by prefix)",
    )
    args = ap.parse_args(argv)

    from . import registry

    registry.load_all()

    if args.list is not None:
        for name in sorted(registry.names()):
            if name.startswith(args.list):
                print(f"{name:32s} {registry.describe(name)}")
        return 0

    if not args.key:
        ap.error("a query key is required (or use --list)")
    if args.key not in registry.QUERIES:
        near = [n for n in registry.names() if args.key in n]
        hint = f"; close matches: {near[:5]}" if near else ""
        print(f"unknown key {args.key!r}{hint}", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(f"dps-{args.key}")
    df = registry.run(args.key, spark, args.sf)
    if args.explain:
        df.explain("formatted")
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
