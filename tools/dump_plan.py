"""Dump `.explain("formatted")` for named registry queries to files.

Usage:
    python tools/dump_plan.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt per query — the optimization-round
evidence format (plans/r10/<query>_before.txt / _after.txt).  Explain
only: no execution, so safe to run while other jobs own the box.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encodesrv_spark.plans.registry import all_queries  # noqa: E402
from encodesrv_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plan", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"skip unknown query {name!r}")
            continue
        df = qs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
