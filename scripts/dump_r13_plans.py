#!/usr/bin/env python
"""Dump .explain('formatted') for the round-13 optimization targets to
plans/r12/<query>_<tag>.txt. Usage:

    python scripts/dump_r13_plans.py before query1 query2 ...
    python scripts/dump_r13_plans.py after  query1 query2 ...
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.session import get_spark

    spark = get_spark(app_name="dump_r13_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    out_dir = Path(_REPO) / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        release_caches()
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
