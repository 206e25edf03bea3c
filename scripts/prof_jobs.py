#!/usr/bin/env python
"""Per-query job/stage/task profiler — bench.py methodology (warm run,
then timed run) plus sc.statusTracker() deltas, so each entry's time
can be attributed to job count × stage shape, not guessed. Usage:

    python scripts/prof_jobs.py query1 query2 ...

Prints, per entry: timed seconds, #jobs, #stages, #tasks submitted
during the timed pass, and per-job durations (from the status
tracker's job/stage info).
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
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.session import get_spark

    spark = get_spark(app_name="prof_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    queries = entry_mod.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    st = sc.statusTracker()

    for name in names:
        fn = queries[name]
        for _ in range(2):  # two warm passes
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            release_caches()
        ids_before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_caches()
        ids_after = set(st.getJobIdsForGroup(None) or [])
        new_jobs = sorted(ids_after - ids_before)
        n_stages = 0
        n_tasks = 0
        details = []
        for j in new_jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            stages = list(ji.stageIds)
            n_stages += len(stages)
            jt = 0
            for s in stages:
                si = st.getStageInfo(s)
                if si is not None:
                    n_tasks += si.numTasks
                    jt += si.numTasks
            details.append(f"j{j}:{len(stages)}st/{jt}tk")
        print(
            f"{name}: {dt:.3f}s jobs={len(new_jobs)} stages={n_stages} "
            f"tasks={n_tasks}  [{' '.join(details)}]",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
