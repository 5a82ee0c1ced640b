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

#: Row-level money: exact 2-decimal values below 1e10.
MONEY = "decimal(12,2)"
#: Rate factors (discount/tax ± 1): exact 2-decimal values below 100.
RATE = "decimal(4,2)"


def money(col: Column | str) -> Column:
    """Exact decimal view of a 2-decimal money double (sum-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: Column | str) -> Column:
    """Exact decimal view of a 2-decimal rate factor (e.g. ``1 - l_discount``).

    Compute the ±1 arithmetic in double first (the result stays within
    1 ulp of the true 2-decimal value, so the cast recovers it exactly
    on both engines), then cast once — casting factors *before* the
    subtraction would widen Spark's decimal precision past 38 in the
    three-factor charge product and trigger silent scale truncation.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def money_round(col: Column, scale: int = 2) -> Column:
    """Round an exact decimal aggregate and emit the output double."""
    return F.round(col, scale).cast("double")
