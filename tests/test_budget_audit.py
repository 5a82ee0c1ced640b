"""Automated overflow-budget audit for every exact_sum / exact_units_sum
call site (VERDICT r06 #5).

The exact-arithmetic kernel (functions/exact.py) is only exact while
each call site's numbers stay inside its accumulator's bounds:

* per-row: the unit product is computed in LONG arithmetic for every
  accumulator mode, so it must stay < 2^63;
* ``acc="limb"``: the lo/mid 20-bit limb sums absorb at most 2^43 rows
  per GROUP, and the hi-limb sum (units >> 40 per row) must also fit a
  LONG;
* ``acc="long"``: Σ|units| per group must stay well inside 2^63 (the
  sum wraps silently — this mode is reserved for documented-tiny
  units);
* ``acc="decimal"``: per-row products cast to DECIMAL(20,0) (< 1e20,
  subsumed by the LONG bound) and the mode's contract is time-bounded
  input (hourly series / per-type summaries), pinned here at ≤ 2e6
  rows per group;
* engine identity: DuckDB's CAST(HUGEINT AS DOUBLE) is correctly
  rounded only to 2^64 (probed r05), so a units-sum whose 100 TB total
  exceeds 2^64 is exact-but-not-bit-identical past that point — a
  DOCUMENTED boundary, not a defect; the manifest must declare it
  explicitly so the boundary can't rot into a surprise.

These budgets previously lived in comments; this test makes them
un-rottable: the AST walk enumerates every call site in the package,
so adding a NEW exact_sum call without declaring its budget here fails
the suite, and every declared budget is re-checked against the
accumulator bounds on every run.

SF-1e5 (100 TB) sizing used below: lineitem ≈ 6e11 rows (R_FACT = 1e12
is the conservative per-group cap for global fact aggregates), events
of the same order, time-bounded series ≤ 1e6 hours (~114 years).
Unit bounds come from the data model (probed at sf0.1, ≥ ~2x margin):
l_extendedprice ≤ $105k → ≤ 2e7 cents; o_totalprice ≤ $500k → ≤ 1e8
cents; acctbal ≤ $10k → ≤ 2e6 cents; events.value ≤ ~560 → ≤ 1e5
cents; rate factors (1 ± disc/tax ≤ 1.10) → ≤ 110 scale-2 units.
"""

from __future__ import annotations

import ast
import glob
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "encodesrv_spark")

# ---------------------------------------------------------------------------
# discovery: every exact_sum / exact_units_sum call site in the package
# ---------------------------------------------------------------------------


def discover_sites() -> dict[tuple[str, str], list[str]]:
    """(relpath, enclosing function) -> [acc mode per call, source order].

    functions/exact.py itself is excluded (exact_sum's internal
    delegation to exact_units_sum is the library, not a call site)."""
    sites: dict[tuple[str, str], list[str]] = {}
    for path in sorted(glob.glob(f"{PKG}/**/*.py", recursive=True)):
        rel = os.path.relpath(path, os.path.dirname(PKG))
        if rel == os.path.join("encodesrv_spark", "functions", "exact.py"):
            continue
        tree = ast.parse(open(path).read())

        class V(ast.NodeVisitor):
            def __init__(self) -> None:
                self.stack = ["<module>"]

            def visit_FunctionDef(self, node):
                self.stack.append(node.name)
                self.generic_visit(node)
                self.stack.pop()

            visit_AsyncFunctionDef = visit_FunctionDef

            def visit_Call(self, node):
                fn = node.func
                name = fn.id if isinstance(fn, ast.Name) else (
                    fn.attr if isinstance(fn, ast.Attribute) else None
                )
                if name in ("exact_sum", "exact_units_sum"):
                    acc = "limb"
                    for kw in node.keywords:
                        if kw.arg == "acc" and isinstance(kw.value, ast.Constant):
                            acc = kw.value.value
                    sites.setdefault((rel, self.stack[-1]), []).append(acc)
                self.generic_visit(node)

        V().visit(tree)
    return sites


# ---------------------------------------------------------------------------
# the manifest: one budget declaration per call site
# ---------------------------------------------------------------------------

# Unit bounds (max |units| of the per-row product), from the data model:
U_LI = 2e7          # l_extendedprice cents
U_RATE = 110        # scale-2 units of 1 ± discount/tax
U_QTY = 50          # l_quantity (integer-valued)
U_ORD = 1e8         # o_totalprice cents
U_BAL = 2e6         # c_acctbal / s_acctbal cents
U_EV = 1e5          # events.value cents
U_RP = 2e5          # p_retailprice cents (probed ≤ 1e5 + the SCD bump; 2x)
U_EV4 = 1e7         # events.value at scale 4 (winsorize's clipped col)
U_DISC = 10         # l_discount scale-2 units (≤ 0.10)
U_MEAN6 = 1e9       # 6-dp units of an hourly mean of events.value
U_DELTA6 = 2e9      # 6-dp units of hour-over-hour mean deltas
U_USEC = 1e13       # funnel view→purchase latency in micros (~115 days)
U_HOUR_N = 1e9      # events per (type, hour) at 100 TB
U_DEG = 1e7         # co-purchase node degree (df-capped graph)

# Row bounds (max rows per aggregation GROUP at SF 1e5):
R_FACT = 1e12       # global / coarse-group fact aggregates
R_TIME = 1e6        # time-bounded series (hours × horizon)


def site(acc: str, units: float, rows: float, why: str,
         beyond_hugeint_double: bool = False) -> dict:
    return {"acc": acc, "units": units, "rows": rows, "why": why,
            "beyond_hugeint_double": beyond_hugeint_double}


MANIFEST: dict[tuple[str, str], list[dict]] = {
    # -- shared revenue helpers: Σ cents·(1−disc)[·(1+tax)] over lineitem
    ("encodesrv_spark/plans/extended.py", "_rev_sum"): [
        site("limb", U_LI * U_RATE, R_FACT, "revenue product, global agg",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/tpch.py", "_rev_sum"): [
        site("limb", U_LI * U_RATE, R_FACT, "revenue product, global agg",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/tpch_deep.py", "_rev_sum"): [
        site("limb", U_LI * U_RATE, R_FACT, "revenue product, global agg",
             beyond_hugeint_double=True),
    ],
    # -- TPC-H shapes
    ("encodesrv_spark/plans/tpch.py", "q1_pricing_summary"): [
        site("limb", U_LI, R_FACT, "Σ extendedprice cents",
             beyond_hugeint_double=True),
        site("limb", U_LI * U_RATE, R_FACT, "Σ disc_price",
             beyond_hugeint_double=True),
        site("limb", U_LI * U_RATE * U_RATE, R_FACT, "Σ charge",
             beyond_hugeint_double=True),
        site("limb", U_LI, R_FACT, "avg_price numerator",
             beyond_hugeint_double=True),
        site("long", U_DISC, R_FACT,
             "avg_disc: ≤10 units/row → Σ ≤ 1e13, six orders inside 2^63"),
    ],
    ("encodesrv_spark/plans/tpch.py", "q6_forecast_revenue"): [
        site("limb", U_LI * U_DISC, R_FACT, "Σ price·discount",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/tpch.py", "q17_small_quantity_revenue"): [
        site("limb", U_LI, R_FACT, "Σ extendedprice cents",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/tpch.py", "top_customers_per_nation"): [
        site("limb", U_ORD, 1e5, "Σ o_totalprice per customer (≤1e5 orders)"),
    ],
    ("encodesrv_spark/plans/tpch_deep.py", "q11_important_stock"): [
        site("limb", U_LI * U_QTY, R_FACT, "Σ price·qty per part",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/tpch_deep.py", "q22_idle_customers"): [
        site("limb", U_BAL, R_FACT, "avg acctbal numerator"),
        site("limb", U_BAL, R_FACT, "Σ acctbal per segment"),
    ],
    # -- parity / extended money aggregates
    ("encodesrv_spark/plans/parity.py", "coalesce_defaults"): [
        site("limb", U_ORD, 1e5, "Σ o_totalprice per customer"),
    ],
    ("encodesrv_spark/plans/extended.py", "rollup_lineitem"): [
        site("limb", U_LI, R_FACT, "Σ extendedprice cents, rollup groups",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/extended.py", "pivot_linestatus"): [
        site("limb", U_LI, R_FACT, "Σ extendedprice cents, pivot cells",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/extended.py", "price_band_range_join"): [
        site("limb", U_ORD, R_FACT, "Σ o_totalprice per band",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/extended.py", "skew_salted_join"): [
        site("limb", U_BAL, R_FACT, "Σ acctbal over salted join"),
    ],
    ("encodesrv_spark/plans/extended.py", "hourly_profile"): [
        site("limb", U_EV, U_HOUR_N * 1e3, "Σ value cents per (dow,hour) cell"),
    ],
    ("encodesrv_spark/plans/extended.py", "value_anomaly_zscore"): [
        site("limb", U_EV, R_FACT, "Σ value cents per type"),
        site("limb", U_EV * U_EV, R_FACT, "Σ value² (scale-4 units)",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/extended.py", "regression_stats"): [
        site("limb", U_LI, R_FACT, "Σ cents per flag",
             beyond_hugeint_double=True),
        site("limb", U_LI * U_LI, R_FACT, "Σ cents² per flag",
             beyond_hugeint_double=True),
        site("limb", U_QTY * U_LI, R_FACT, "Σ qty·cents per flag",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/extended.py", "funnel_latency"): [
        site("limb", U_USEC, R_FACT, "Σ conversion latency micros",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/extended.py", "events_zorder_box_scan"): [
        # the box is absolute-sized (7 users × a value band), so the
        # group totals do NOT grow with SF; R_FACT is still the
        # conservative cap and fits limbs with 2^20 to spare
        site("limb", U_EV, R_FACT, "Σ value cents in the 2-D box, per type"),
    ],
    ("encodesrv_spark/plans/extended.py", "events_zorder_append_maintain"): [
        # same absolute-sized-box posture as events_zorder_box_scan
        site("limb", U_EV, R_FACT, "Σ value cents in the 2-D box, per type"),
    ],
    ("encodesrv_spark/plans/extended.py", "part_scd2_asof_join"): [
        # Σ routed p_retailprice over lineitem, grouped by
        # (brand, before/after, version): ≤ 2.4e10 rows/group at SF 1e5
        # (lineitem/25 brands); R_FACT is the conservative cap and
        # 2e5 · 1e12 = 2e17 stays inside both the limbs and 2^64
        site("limb", U_RP, R_FACT, "Σ as-of-routed retailprice cents"),
    ],
    # -- llm / streaming event rollups
    ("encodesrv_spark/plans/llm.py", "events_hourly"): [
        site("limb", U_EV, U_HOUR_N, "Σ value cents per (type, hour)"),
    ],
    ("encodesrv_spark/plans/llm.py", "events_hypertable_rollup"): [
        site("limb", U_EV, R_FACT, "Σ value cents, rollup top = global"),
    ],
    ("encodesrv_spark/streaming/events.py", "hourly_counts"): [
        site("limb", U_EV, U_HOUR_N, "Σ value cents per hourly window"),
    ],
    ("encodesrv_spark/streaming/events.py", "sliding_rates"): [
        site("limb", U_EV, U_HOUR_N, "Σ value cents per sliding window"),
    ],
    # -- mining: money + moment families
    ("encodesrv_spark/plans/mining.py", "winsorize_values"): [
        site("limb", U_EV, R_FACT, "Σ raw value cents per type"),
        site("limb", U_EV4, R_FACT, "Σ clipped value (scale-4 units)"),
    ],
    ("encodesrv_spark/plans/mining.py", "user_rfm_segments"): [
        site("limb", U_EV, 1e6, "Σ purchase value cents per user"),
    ],
    ("encodesrv_spark/plans/mining.py", "revenue_trend_mann_kendall"): [
        site("limb", U_ORD, R_FACT, "Σ o_totalprice per month",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/mining.py", "events_weekend_effect"): [
        site("limb", U_EV, R_FACT, "Σ value cents per day class"),
    ],
    ("encodesrv_spark/plans/mining.py", "events_change_points"): [
        site("limb", U_EV, U_HOUR_N, "hourly mean numerator"),
        site("decimal", U_DELTA6, R_TIME, "Σ delta (6-dp units)"),
        site("decimal", U_DELTA6 * U_DELTA6, R_TIME, "Σ delta²",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/mining.py", "events_cusum"): [
        site("limb", U_EV, U_HOUR_N, "hourly mean numerator"),
        site("decimal", U_MEAN6, R_TIME, "Σ m (6-dp units)"),
        site("decimal", U_MEAN6 * U_MEAN6, R_TIME, "Σ m²",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/mining.py", "events_dispersion_index"): [
        site("decimal", U_HOUR_N * U_HOUR_N, R_TIME, "Σ n² of hourly counts",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/mining.py", "events_autocorrelation"): [
        site("limb", U_EV, U_HOUR_N, "hourly mean numerator"),
        site("decimal", U_MEAN6, R_TIME, "Σ x (6-dp mean units)"),
        site("decimal", U_MEAN6 * U_MEAN6, R_TIME, "Σ x²",
             beyond_hugeint_double=True),
        site("decimal", U_MEAN6, R_TIME, "Σ y (lagged)"),
        site("decimal", U_MEAN6 * U_MEAN6, R_TIME, "Σ y²",
             beyond_hugeint_double=True),
        site("decimal", U_MEAN6 * U_MEAN6, R_TIME, "Σ xy",
             beyond_hugeint_double=True),
    ],
    ("encodesrv_spark/plans/mining.py", "copurchase_assortativity"): [
        site("limb", U_DEG * U_DEG, R_FACT, "Σ du·dv over edges",
             beyond_hugeint_double=True),
        site("limb", U_DEG * U_DEG, R_FACT, "Σ du² + dv² halves",
             beyond_hugeint_double=True),
        site("limb", U_DEG * U_DEG, R_FACT, "Σ cross moment",
             beyond_hugeint_double=True),
    ],
}

LONG_MAX = 2**63
LIMB_ROWS = 2**43


def test_manifest_covers_every_call_site():
    """A new exact_sum/exact_units_sum call site without a declared
    budget fails here — the audit can't rot silently."""
    discovered = discover_sites()
    extra = sorted(set(discovered) - set(MANIFEST))
    missing = sorted(set(MANIFEST) - set(discovered))
    assert not extra, f"undeclared exact-sum call sites (add budgets): {extra}"
    assert not missing, f"stale manifest entries (call site removed): {missing}"
    for key, accs in discovered.items():
        declared = [s["acc"] for s in MANIFEST[key]]
        assert sorted(accs) == sorted(declared), (
            f"{key}: declared acc modes {declared} != discovered {accs}"
        )


def test_budgets_inside_accumulator_bounds():
    for key, specs in MANIFEST.items():
        for s in specs:
            units, rows, acc = s["units"], s["rows"], s["acc"]
            ctx = f"{key} [{s['why']}]"
            # per-row product is LONG arithmetic in EVERY mode
            assert units < LONG_MAX, f"{ctx}: per-row units overflow LONG"
            if acc == "limb":
                assert rows <= LIMB_ROWS, (
                    f"{ctx}: {rows:.1e} rows/group exceeds the lo/mid limb "
                    f"capacity 2^43 ≈ {LIMB_ROWS:.1e}"
                )
                hi_per_row = units / 2**40 + 1
                assert rows * hi_per_row < LONG_MAX, (
                    f"{ctx}: hi-limb sum overflows LONG"
                )
            elif acc == "long":
                # one bit of declared headroom: the plain sum wraps silently
                assert rows * units < 2**62, (
                    f"{ctx}: acc='long' budget too close to 2^63 — "
                    f"use the limb accumulator"
                )
            elif acc == "decimal":
                assert rows <= 2e6, (
                    f"{ctx}: acc='decimal' is reserved for time-bounded "
                    f"inputs (≤ 2e6 rows/group); use limbs for fact-scale"
                )
                assert rows * units < 1e28, (
                    f"{ctx}: Σ overflows the DECIMAL(28,0) recombination"
                )
            else:  # pragma: no cover - guarded by manifest construction
                raise AssertionError(f"{ctx}: unknown acc {acc!r}")


def test_hugeint_double_boundary_is_declared():
    """DuckDB CAST(HUGEINT AS DOUBLE) is correctly rounded only to 2^64
    (probed r05): any site whose 100 TB total can exceed that is exact
    but not guaranteed bit-identical cross-engine past the boundary.
    The flag must MATCH the arithmetic — an undeclared crossing (or a
    stale declaration) fails."""
    for key, specs in MANIFEST.items():
        for s in specs:
            crosses = s["units"] * s["rows"] > 2**64
            assert crosses == s["beyond_hugeint_double"], (
                f"{key} [{s['why']}]: total {s['units'] * s['rows']:.2e} "
                f"{'crosses' if crosses else 'stays inside'} 2^64 but "
                f"beyond_hugeint_double={s['beyond_hugeint_double']}"
            )
