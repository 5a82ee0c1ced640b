"""Fraction-pinned cross-engine test of the half-up quantization emitter.

`functions/exact.py::half_up_idx_sql` is the single source of the
tie-critical integer algebra behind every exact k-dp output
(quality_score, quality_percentile_by_source, events_moving_avg; the
seasonality index is the same template inline).  This pins, against a
``fractions.Fraction`` reference implementing decimal round-half-up /
half-away-from-zero:

* the unsigned form on exact ties, near-ties, and zero denominators
  (nullif → NULL, case0 → 0.0), on BOTH engines;
* the signed form on negative numerators — where Spark's truncating
  ``div`` and DuckDB's flooring ``//`` would diverge without abs+sign;
* that both dialects agree cell-for-cell on a randomized grid.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest

from encodesrv_spark.functions.exact import half_up_idx_sql


def _ref(num: int, den: int, k: int) -> float | None:
    """Round-half-away-from-zero of num/den to k decimals, exactly."""
    if den == 0:
        return None
    v = Fraction(num, den) * 10**k
    # half away from zero: floor(|v| + 1/2) with sign reapplied
    q = (2 * abs(v).numerator + abs(v).denominator) // (2 * abs(v).denominator)
    return (-q if num < 0 else q) / 10**k


# (num, den): exact ties, near-ties, negatives, and plain values
GRID = [
    (23, 48),  # score-style rational
    (1, 32),  # exact 4/6-dp tie chain (0.03125)
    (3, 32),
    (-1, 32),  # negative exact tie: div-vs-// divergence territory
    (-3, 32),
    (5, 16),  # 0.3125 — tie at 3dp, exact at 4dp
    (45612, 144000),  # the observed quality_score tie (0.31675)
    (-45612, 144000),
    (102787, 3200),  # moving-avg-style cents/3200 tie (…9375)
    (-102787, 3200),
    (7, 3),  # repeating decimal, no tie
    (-7, 3),
    (0, 17),  # zero numerator
    (123456, 1),  # integer value
]


@pytest.mark.parametrize("k", [4, 6])
def test_signed_form_matches_fraction_reference_both_engines(spark, k):
    con = duckdb.connect()
    try:
        for num, den in GRID:
            want = _ref(num, den, k)
            s_expr = half_up_idx_sql(
                str(num), str(den), k, dialect="spark", signed=True, zero=None
            )
            d_expr = half_up_idx_sql(
                str(num), str(den), k, dialect="duckdb", signed=True, zero=None
            )
            (got_s,) = spark.sql(f"SELECT {s_expr}").collect()[0]
            (got_d,) = con.execute(f"SELECT {d_expr}").fetchone()
            assert got_s == got_d == want, (
                f"{num}/{den} @ {k}dp: spark={got_s} duckdb={got_d} ref={want}"
            )
    finally:
        con.close()


def test_unsigned_form_on_nonnegative_inputs(spark):
    """Without signed=, the template is valid ONLY for num >= 0 (its
    documented contract) — verify it still matches the reference there
    and the two dialects agree."""
    con = duckdb.connect()
    try:
        for num, den in [(n, d) for n, d in GRID if n >= 0]:
            want = _ref(num, den, 4)
            s = half_up_idx_sql(str(num), str(den), 4, dialect="spark")
            d = half_up_idx_sql(str(num), str(den), 4, dialect="duckdb")
            (got_s,) = spark.sql(f"SELECT {s}").collect()[0]
            (got_d,) = con.execute(f"SELECT {d}").fetchone()
            assert got_s == got_d == want, (num, den, got_s, got_d, want)
    finally:
        con.close()


def test_zero_denominator_modes(spark):
    con = duckdb.connect()
    try:
        for dialect, run in (
            ("spark", lambda e: spark.sql(f"SELECT {e}").collect()[0][0]),
            ("duckdb", lambda e: con.execute(f"SELECT {e}").fetchone()[0]),
        ):
            assert run(half_up_idx_sql("5", "0", 4, dialect=dialect)) is None
            assert (
                run(half_up_idx_sql("5", "0", 4, dialect=dialect, zero="case0"))
                == 0.0
            )
    finally:
        con.close()


def test_rejects_bad_arguments():
    with pytest.raises(ValueError):
        half_up_idx_sql("1", "2", 4, dialect="postgres")
    with pytest.raises(ValueError):
        half_up_idx_sql("1", "2", 4, dialect="spark", zero="null")
