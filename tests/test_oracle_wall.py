"""Oracle-side sweep-cost guard (VERDICT r07 #6).

`ORACLE_WALL.json` (written by every FULL `tools/check_oracle.py`
sweep) records each query's DuckDB-side wall.  The oracle is harness
cost, not engine cost — but it regresses silently and multiplies
across 210-query sweeps (the r07 CTE-inlining pathology cost ~380 s
per sweep before it was found by hand).  This test pins the committed
artifact's shape and budget: at sf0.1 no oracle may exceed 10 s except
the documented allowlist.  A new slow oracle therefore fails the suite
as soon as its sweep artifact is committed — time it, materialize its
CTEs (see tests/test_oracle_cte_guard.py), or allowlist it with a
reason here.
"""

from __future__ import annotations

import json
import os

from encodesrv_spark.plans.registry import all_queries

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# query -> why its oracle is legitimately slow at sf0.1
ALLOWED_SLOW = {
    "fuzzy_pairs_levenshtein": (
        "the cost IS the blocked Levenshtein join itself (length-band "
        "+ first-char blocking already applied); materialization A/B "
        "was neutral in the r07 audit"
    ),
}


def test_oracle_wall_budget_sf01():
    with open(os.path.join(ROOT, "ORACLE_WALL.json")) as fh:
        record = json.load(fh)
    assert "sf0.1" in record, "no committed full sf0.1 sweep artifact"
    wall = record["sf0.1"]["oracle_sec"]
    qs = all_queries()
    # the artifact must be a FULL sweep of the current registry (a
    # renamed/added query invalidates it until the next full sweep)
    missing = set(qs) - set(wall)
    assert not missing, f"sweep artifact predates registry entries: {sorted(missing)}"
    slow = {n: s for n, s in wall.items() if s > 10 and n not in ALLOWED_SLOW}
    assert not slow, f"oracle-side >10s at sf0.1 without an allowlist reason: {slow}"
    stale_allow = set(ALLOWED_SLOW) - {n for n, s in wall.items() if s > 10}
    assert not stale_allow, f"allowlist entries no longer slow: {sorted(stale_allow)}"
