"""Time named registry queries under the frozen bench discipline.

Usage:
    python tools/time_queries.py [--reps N] <query> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).  One warm-up + median of `--reps`
(default 3) noop-sink executions per query — exactly bench.time_query,
reused, so A/B numbers here are directly comparable to BENCH artifacts.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import time_query, warm  # noqa: E402
from encodesrv_spark.plans.registry import all_queries  # noqa: E402
from encodesrv_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    qs = all_queries()
    out = {}
    for name in args:
        warm(spark, qs, name, sf_dir)
        out[name] = time_query(spark, qs, name, sf_dir, reps=reps)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
