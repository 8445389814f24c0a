#!/usr/bin/env python
"""Report each registered key's freshest driver CORRECTNESS row.

Unions every CORRECTNESS_r*.json in the repo root and prints, per
round-of-last-check: the keys whose latest graded row dates to that
round, split oracle vs rows-only, plus keys with NO row from any
round (new this round — they should be front-loaded in the
_ROUNDN_PRIORITY rotation in operators/__init__.py, which decides
which ~50 keys earn fresh rows under the driver's budget).

    python scripts/staleness_report.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from data_pipeline_spark_spark import registry

    registry.load_all()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, str | None, bool]] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        for key, row in json.load(open(f)).items():
            if row.get("err") == "no_oracle":
                # rows-only row: match fields are all None by design;
                # green = the query ran and returned ≥0 rows
                green = row.get("spark_rows") is not None
            else:
                green = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                )
            latest[key] = (rnd, row.get("err"), green)

    by_round: dict[tuple[int, str], list[str]] = defaultdict(list)
    red = []
    for key, (rnd, err, green) in latest.items():
        kind = "rows-only" if err == "no_oracle" else "oracle"
        by_round[(rnd, kind)].append(key)
        if not green:
            red.append((key, rnd, err))

    for (rnd, kind) in sorted(by_round):
        keys = sorted(by_round[(rnd, kind)])
        print(f"r{rnd:02d} {kind:9s} {len(keys):3d}: {', '.join(keys)}")
    never = sorted(k for k in registry.QUERIES if k not in latest)
    print(f"\nno row yet ({len(never)}): {', '.join(never) or '-'}")
    if red:
        print("\nNON-GREEN latest rows (fix before anything else):")
        for key, rnd, err in red:
            print(f"  {key} (r{rnd}): err={err}")
    else:
        print("\nall latest rows green")


if __name__ == "__main__":
    main()
