#!/usr/bin/env python
"""Full driver dry-run: execute EVERY registered query in ONE Spark
session at sf0.01 and, where an oracle exists, compare against DuckDB
exactly as the round driver does. Catches cross-query interactions a
per-key test can't: temp-view collisions, session-config leakage,
cached-state bleed, temp-dir races.

    python scripts/dry_run.py          # all keys
    python scripts/dry_run.py PREFIX   # only keys starting with PREFIX
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark_spark import registry  # noqa: E402
from data_pipeline_spark_spark.session import get_spark  # noqa: E402


def main() -> int:
    registry.load_all()
    prefix = sys.argv[1] if len(sys.argv) > 1 else ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("dry-run")
    spark.sparkContext.setLogLevel("ERROR")

    from tests.oracle import assert_matches_oracle  # noqa: E402

    keys = sorted(k for k in registry.QUERIES if k.startswith(prefix))
    t_all = time.time()
    failed: list[str] = []
    for i, name in enumerate(keys, 1):
        t0 = time.time()
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            if name in registry.ORACLE_SQL:
                assert_matches_oracle(df, registry.ORACLE_SQL[name], sf_dir, name)
                status = "oracle-ok"
            else:
                n = df.count()
                assert n >= 0
                status = f"rows-only({n})"
            print(f"[{i}/{len(keys)}] {name}: {status} {time.time()-t0:.1f}s",
                  flush=True)
        except Exception:
            failed.append(name)
            print(f"[{i}/{len(keys)}] {name}: FAILED", flush=True)
            traceback.print_exc()
    print(f"== {len(keys) - len(failed)}/{len(keys)} ok "
          f"in {time.time()-t_all:.0f}s; failed: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
