#!/usr/bin/env python
"""Quick per-query profiler mirroring bench.py methodology (warm run,
then timed run, release_caches between). Usage:

    python scripts/prof.py [-n REPS] query1 query2 ...
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    args = sys.argv[1:]
    reps = 1
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from csv_to_parquet_spark.session import get_spark
    import __spark_entry__ as entry_mod
    from csv_to_parquet_spark.operators.cache import release_caches

    spark = get_spark(app_name="prof")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_caches()
        for i in range(reps):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            release_caches()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_caches()
            print(f"{name}: {dt:.3f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
