"""Exact (order-independent) money arithmetic for cross-engine determinism.

Why this exists: summing doubles across rows is NOT associative — the
result depends on partial-sum order, which depends on partitioning, so
two runs (or Spark vs the DuckDB oracle) can land on opposite sides of a
rounding boundary.  That drift cost `order_seasonality_index` its r04
driver row.  Money columns in every table are exact 2-decimal values, so
casting them to DECIMAL *before* aggregating makes every sum exact,
associative, and partitioning-independent; rounding then happens on an
exact decimal (ties-away-from-zero on both engines — probed identical),
and only the final cast produces a double.

Verified cross-engine invariants (Spark 4.1 / DuckDB, probed in round 5):
  * ``round(DECIMAL, k)`` ties away from zero on both engines (±2.675→±2.68);
  * ``CAST(DOUBLE AS DECIMAL)`` rounds identically (repr-aware on both);
  * doubles derived from exact decimals via identical IEEE ops are
    bit-identical across engines, so ratios of exact sums round safely.

Precision budget: DECIMAL(12,2) holds row-level money (< 1e10); a
product with a DECIMAL(4,2) rate factor is DECIMAL(17,4) / (22,6), and
Spark's sum widens precision by 10 → ≤ DECIMAL(32,6).  No precision-loss
truncation, and the 100 TB grand total (~1e13 dollars) fits with ≥13
integer digits to spare — unlike cents-as-BIGINT, which overflows int64
around SF 100 for scale-6 charge sums.

DuckDB oracle twins use the literal forms::

    sum(CAST(x AS DECIMAL(12,2)))
    sum(CAST(x AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)))
    CAST(round(<exact sum>, 2) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def money_round(col: Column, scale: int = 2) -> Column:
    """Round an exact decimal aggregate and emit the output double."""
    return F.round(col, scale).cast("double")


def half_up_idx_sql(
    num: str,
    den: str,
    k: int,
    *,
    dialect: str,
    signed: bool = False,
    wide: bool = False,
    zero: str | None = "nullif",
) -> str:
    """Emit the exact half-up k-dp quantization of ``num/den`` as a SQL
    expression string, in either engine's dialect — THE building block
    for tie-prone rational outputs (r06).

    The algebra: for integer ``num``/``den`` with ``den > 0``,
    ``idx = (2·num·10^k + den) DIV (2·den)`` floors the +½-shifted
    numerator, which IS round-half-up, with no ``round(double, k)``
    anywhere — the Spark/DuckDB rounding asymmetry (Spark rounds the
    shortest-repr decimal HALF_UP, DuckDB rounds the binary value;
    probed ``round(1.005, 2)`` → 1.01 vs 1.0) cannot participate.  The
    output is ONE correctly-rounded int→double cast and one division
    by ``10^k`` — bit-identical by IEEE 754 on any engine.  Small-
    denominator rationals (score formulas, frame means, percent_rank)
    land ON k-dp ties with high probability, so they must use this
    form rather than ``round(double, k)`` (the sf0.1 sweep caught
    three such splits; ``order_seasonality_index`` is the original
    worked inline example of the same template).

    ``signed=True`` quantizes ``|num|`` and re-applies the sign —
    half-AWAY-FROM-ZERO, matching Spark/Java ``round`` — and is
    REQUIRED whenever ``num`` can be negative: Spark's ``div``
    truncates toward zero while DuckDB's ``//`` floors, so the
    unsigned template diverges on negatives.  ``wide=True`` routes the
    Spark numerator through DECIMAL(38,0) for budgets past 2^63
    (DuckDB integer sums widen to HUGEINT natively).  ``zero`` picks
    the zero-denominator behavior: ``"nullif"`` → NULL on both
    engines, ``"case0"`` → 0.0 on both engines (percent_rank's n=1
    convention), ``None`` → caller guarantees ``den > 0``.
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"dialect must be 'spark' or 'duckdb', got {dialect!r}")
    if zero not in ("nullif", "case0", None):
        raise ValueError(f"zero must be 'nullif', 'case0' or None, got {zero!r}")
    intdiv = "div" if dialect == "spark" else "//"
    pow10 = 10**k
    mag = f"abs({num})" if signed else f"({num})"
    if wide:
        # budgets past 2^63: Spark needs an explicit DECIMAL(38,0)
        # route; DuckDB integer sums are already HUGEINT (casting one
        # to BIGINT would overflow), so it stays uncast.
        if dialect == "spark":
            mag = f"cast({mag} as decimal(38,0))"
        den_t = f"({den})"
    else:
        # INT-typed operands would overflow 2·num·10^k under Spark's
        # ANSI arithmetic (and DuckDB errors the same way) — pin BIGINT.
        # A no-op for the LONG columns every production site feeds.
        mag = f"cast({mag} as bigint)"
        den_t = f"cast(({den}) as bigint)"
    divisor = f"(2 * {den_t})"
    if zero == "nullif":
        divisor = f"nullif({divisor}, 0)"
    quot = f"(2 * {mag} * {pow10} + {den_t}) {intdiv} {divisor}"
    if signed:
        quot = f"(case when ({num}) < 0 then -1 else 1 end) * ({quot})"
    out = f"cast({quot} as double) / 1e{k}"
    if zero == "case0":
        out = f"case when ({den}) = 0 then cast(0 as double) else {out} end"
    return out


def _units(col: Column | str, scale: int = 2) -> Column:
    """Exact scaled-integer view of a ``scale``-dp double, as LONG.

    ``floor(x·10^s + 0.5)`` recovers the exact integer: an s-dp value
    k/10^s stored as its nearest double satisfies |x·10^s − k| ≲
    |x|·10^s·2ε, which stays ≪ 0.5 while |x|·10^s < ~1e15 (all scales
    used here: money at s=2, 6-dp-rounded intermediates at s=6 with
    |x| ≤ 1e6), so adding 0.5 and flooring lands on k for positives
    AND negatives —
    and costs a double multiply + floor instead of Spark's
    double→decimal cast, which routes through BigDecimal per row (the
    measured 3-4× tax on decimal aggregation).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**scale) + F.lit(0.5))


def exact_sum(
    col: Column | str | tuple,
    *factors: Column | str | tuple,
    where: Column | None = None,
    acc: str = "limb",
) -> Column:
    """Exact, order-independent Σ col·Πfactors as DECIMAL — the fast path.

    All arguments are exact 2-decimal doubles (money columns, ±1±rate
    factors); the leading column or any factor may also be a
    ``(col, ndp)`` tuple for other fixed-decimal widths (``ndp=0`` for
    integer-valued DOUBLE columns, ``ndp=6`` for already-6-dp-rounded
    intermediates, ``ndp=None`` for INTEGER-TYPED columns only — used
    verbatim with no double round-trip; a double column must use
    ``ndp=0``, since the None path truncates rather than rounds).  Each row becomes an exact integer product of LONGs
    (cheap codegen'd arithmetic — no per-row decimal object), and is
    accumulated CARRY-SAVE: the product splits into three 20-bit limbs
    via arithmetic shift + mask (exact for negatives too — `u >> k` is
    floor division and `u & (2^20-1)` its non-negative remainder, so
    `u = (u>>40)·2^40 + ((u>>20)&m)·2^20 + (u&m)` holds identically in
    two's complement), each limb is summed as a plain LONG (primitive
    codegen — no per-row Decimal allocation, no BigDecimal branch for
    the JIT to mix in), and the three limb sums recombine into ONE
    DECIMAL(28,0) post-aggregation, scaled back once.  Value- AND
    type-identical to summing per-row DECIMAL(12,2)×DECIMAL(4,2)
    products — the DuckDB oracles' literal form (pinned against a
    rational reference in tests/test_exact.py) — at ~2× less wall
    than the decimal accumulator in interleaved A/B.

    Precision budget — the REAL invariant is the per-row unit product
    staying < 1e18 < 2^63, budgeted per call site: the common case is
    money (12,2) → units < 1e12 with |factor| ≤ ~9 (units ≤ 999 — the
    1±discount/tax class is ≤ 1.08), but e.g. a ≤50-unit leading
    column may carry a ~1e7-unit money factor (regression_stats'
    Σqty·cents) — what matters is the product, not either operand.  Limb sums: lo/mid < 2^20 per
    row → a LONG limb accumulator absorbs 2^43 ≈ 8.8e12 rows per
    GROUP; hi < 1.2e4 → ~7.7e14 rows.  The 100 TB global aggregate is
    ~6e11 rows — 15× headroom on the tightest limb.  The recombined
    DECIMAL(28,0) and the (7,0)-cast divisor keep the quotient type at
    (36,8), uncapped, exact for these ≤6-dp values — the same output
    type as the decimal-accumulator form it replaces.
    """
    total, scale = exact_units_sum(col, *factors, where=where, acc=acc)
    return total / F.lit(10**scale).cast("decimal(7,0)")


def exact_units_sum(
    col: Column | str | tuple,
    *factors: Column | str | tuple,
    where: Column | None = None,
    acc: str = "limb",
) -> tuple[Column, int]:
    """The carry-save core of :func:`exact_sum`, without the rescale:
    returns ``(Σ units as DECIMAL(28,0), scale)`` where ``units`` is the
    exact integer product scaled by ``10^scale``.  Use directly when the
    combined scale exceeds 6 (e.g. Σd² of 6-dp values, scale 12): the
    decimal-division rescale would blow Spark's division typing there,
    but moment formulas don't need it — cast the exact integer to
    double (correctly rounded, deterministic on both engines: DuckDB's
    ``sum(BIGINT)`` widens to HUGEINT, this recombination to
    DECIMAL(28,0) — both exact) and rescale inside the identical IEEE
    double expression both engines evaluate.

    ``acc`` picks the accumulator, value- and type-identical either way:

    * ``"limb"`` (default) — three carry-save 20-bit LONG limb sums,
      recombined post-aggregation.  The fact-scale hot path: zero
      per-row object allocation, pure primitive codegen.  Cost: 3
      aggregate expressions per sum, each embedding the full product —
      a moment FAMILY (Σx/Σx²/Σxy × several lags) multiplies that
      forest and stalls codegen even on tiny inputs.
    * ``"decimal"`` — one ``sum(product::DECIMAL(20,0))``, cast to the
      same DECIMAL(28,0).  Per-row BigDecimal (the tax limbs avoid),
      so ONLY for aggregates over already-reduced inputs (hourly
      series, top-k token sets, per-group summaries — ≤ ~1e5 rows),
      where one shallow expression beats three deep ones: the
      events_autocorrelation 15-sum family measured 1.27 s limb vs
      0.77 s decimal at sf0.1, values bit-identical.
    * ``"long"`` — ONE plain LONG sum of the unit products, cast to
      the same DECIMAL(28,0).  The cheapest accumulator (one primitive
      column sum — no limb split, no per-row object), but a LONG sum
      wraps silently on overflow, so it is reserved for products whose
      DOCUMENTED budget keeps Σ|units| far inside 2^63 at the 100 TB
      envelope — e.g. q1's ``l_discount`` units are ≤ 10/row, so even
      the ~6e11-row global aggregate sums to ~6e12, six orders of
      headroom.  Each call site must state its budget.
    """
    if acc not in ("limb", "decimal", "long"):
        raise ValueError(f"acc must be 'limb', 'decimal' or 'long', got {acc!r}")

    def units_of(c, ndp):
        # ndp=None marks an already-exact INTEGER-TYPED column (counts,
        # ranks, degrees, micros): skip the floor(x·10^s + 0.5) double
        # round-trip (and its implicit |x| < 2^53 exactness budget) and
        # use the value as units.  INTEGER-TYPED is a hard requirement,
        # not a hint — cast("long") on a DOUBLE truncates toward zero,
        # so an integer-valued double stored as k−ε would land on k−1;
        # that class must use ndp=0, which rounds to nearest.
        # The LONG cast is load-bearing, not cosmetic: the limb split
        # shifts by 40, and Java shift amounts wrap mod the operand
        # width — shiftright(INT, 40) silently becomes shiftright(x, 8).
        if ndp is None:
            return (F.col(c) if isinstance(c, str) else c).cast("long"), 0
        return _units(c, ndp), ndp

    c0, s0 = col if isinstance(col, tuple) else (col, 2)
    prod, scale = units_of(c0, s0)
    for f in factors:
        c, ndp = f if isinstance(f, tuple) else (f, 2)
        u, ndp = units_of(c, ndp)
        prod = prod * u
        scale += ndp
    if acc in ("decimal", "long"):
        if where is not None:
            # .otherwise(0), not bare when(): the DuckDB oracles spell
            # this as CASE WHEN ... ELSE 0 END, which yields 0 (not
            # NULL) when no row matches — keep engines identical on
            # empty match sets.
            prod = F.when(where, prod).otherwise(F.lit(0))
        if acc == "long":
            # exact while the call site's budget holds (see docstring);
            # cast to the shared (28,0) output type post-aggregation
            return F.sum(prod).cast("decimal(28,0)"), scale
        # sum(DECIMAL(20,0)) widens to (30,0); cast back to the limb
        # path's (28,0) so callers see one output type.  Products are
        # < 1e18 (the documented budget), so (20,0) holds every row.
        total = F.sum(prod.cast("decimal(20,0)")).cast("decimal(28,0)")
        return total, scale
    mask = (1 << 20) - 1
    limbs = [
        prod.bitwiseAND(F.lit(mask)),
        F.shiftright(prod, 20).bitwiseAND(F.lit(mask)),
        F.shiftright(prod, 40),
    ]
    if where is not None:
        # see the acc="decimal" note: ELSE 0, matching the oracles.
        limbs = [F.when(where, c).otherwise(F.lit(0)) for c in limbs]
    s_lo, s_mid, s_hi = (F.sum(c) for c in limbs)
    total = (
        s_hi.cast("decimal(28,0)") * F.lit(1 << 40)
        + s_mid.cast("decimal(28,0)") * F.lit(1 << 20)
        + s_lo.cast("decimal(28,0)")
    ).cast("decimal(28,0)")
    return total, scale
