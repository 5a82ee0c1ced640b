"""Unit pins for functions/exact.py — the money-determinism kernel.

Every money aggregate in the registry routes through `exact_sum`, whose
exactness rests on two claims:

  * `_units(x, s)` recovers the exact scaled integer of a fixed
    s-decimal double via `floor(x*10^s + 0.5)` — including negatives,
    ties (x.xx5 is not a tie for fixed-decimal data: the stored double
    is within 50 ulp of k/10^s), and full 12-digit money magnitudes;
  * `exact_sum` equals the exact rational sum (Python `Fraction`
    reference) for any mix of money columns and rate factors, and its
    `where=` path yields 0 (not NULL) on empty match sets, matching the
    oracles' `CASE ... ELSE 0` form.

Both are evaluated in ONE Spark job per test over a seeded adversarial
batch (same style as test_curation_properties)."""

from __future__ import annotations

import random
from decimal import Decimal
from fractions import Fraction

import pyspark.sql.functions as F

from encodesrv_spark.functions.exact import _units, exact_sum


def _unit_cases() -> list[tuple[int, int]]:
    """(k, scale) pairs: value = k / 10**scale, exact at `scale` dp."""
    rng = random.Random(41)
    cases = []
    # boundary ks at scale 2: zero, tiny, rate-sized, money max (12,2)
    for k in (0, 1, -1, 5, -5, 99, -99, 100, 108, 999, 10**12 - 1, -(10**12 - 1)):
        cases.append((k, 2))
    # trailing-5 cents (the half-up trap class): x.05, x.25, x.75, ...
    for tail in (5, 25, 50, 75, 95):
        for sign in (1, -1):
            cases.append((sign * (37 * 100 + tail), 2))
    # random magnitudes across the money range, scales 0/2/4
    for _ in range(400):
        s = rng.choice((0, 2, 4))
        k = rng.randint(-(10**12), 10**12)
        cases.append((k, s))
    return cases


def test_units_recovers_exact_scaled_integer(spark):
    cases = _unit_cases()
    df = spark.createDataFrame(
        [(float(k) / 10**s, s, k) for k, s in cases], "x double, s int, k long"
    )
    # one job: evaluate _units at each distinct scale and pick the row's
    got = df.select(
        "k",
        "s",
        *[_units(F.col("x"), s).alias(f"u{s}") for s in (0, 2, 4)],
    ).collect()
    for r in got:
        assert r[f"u{r['s']}"] == r["k"], (r["k"], r["s"], r[f"u{r['s']}"])


def _sum_frame(rng: random.Random, n: int) -> list[tuple[float, float, float, int]]:
    rows = []
    for _ in range(n):
        price = rng.randint(-(10**8), 10**12) / 100  # money, incl. negatives
        disc = rng.randint(0, 10) / 100
        tax = rng.randint(0, 8) / 100
        qty = rng.randint(1, 50)
        rows.append((price, disc, tax, qty))
    return rows


def test_exact_sum_matches_rational_reference(spark):
    rng = random.Random(42)
    rows = _sum_frame(rng, 500)
    df = spark.createDataFrame(
        rows, "price double, disc double, tax double, qty int"
    )
    one_m_disc = F.lit(1) - F.col("disc")
    one_p_tax = F.lit(1) + F.col("tax")
    got = df.agg(
        exact_sum("price").alias("s1"),
        exact_sum("price", one_m_disc).alias("s2"),
        exact_sum("price", one_m_disc, one_p_tax).alias("s3"),
        exact_sum("price", (F.col("qty"), 0)).alias("s4"),
        exact_sum("price", where=F.col("disc") > F.lit(0.05)).alias("sw"),
        exact_sum("price", where=F.col("disc") > F.lit(2)).alias("s0"),
        # leading-tuple form: a 4-dp view of a 2-dp column (exact), and
        # the Σv² square shape used by the exact-moment variance sites
        exact_sum((F.col("tax"), 4)).alias("t4"),
        exact_sum("tax", "tax").alias("sq"),
        # ndp=None: already-LONG integers used as units verbatim
        exact_sum((F.col("qty"), None), (F.col("qty"), None)).alias("qq"),
        exact_sum("price", (F.col("qty"), None)).alias("pq"),
    ).collect()[0]

    def cents(x: float) -> Fraction:
        return Fraction(round(x * 100), 100)

    e1 = sum(cents(p) for p, d, t, q in rows)
    e2 = sum(cents(p) * (1 - cents(d)) for p, d, t, q in rows)
    e3 = sum(cents(p) * (1 - cents(d)) * (1 + cents(t)) for p, d, t, q in rows)
    e4 = sum(cents(p) * q for p, d, t, q in rows)
    ew = sum(cents(p) for p, d, t, q in rows if cents(d) > Fraction(5, 100))
    et4 = sum(cents(t) for p, d, t, q in rows)
    esq = sum(cents(t) * cents(t) for p, d, t, q in rows)
    eqq = sum(Fraction(q * q) for p, d, t, q in rows)
    epq = sum(cents(p) * q for p, d, t, q in rows)

    for name, got_v, exp in (
        ("s1", got["s1"], e1),
        ("s2", got["s2"], e2),
        ("s3", got["s3"], e3),
        ("s4", got["s4"], e4),
        ("sw", got["sw"], ew),
        ("t4", got["t4"], et4),
        ("sq", got["sq"], esq),
        ("qq", got["qq"], eqq),
        ("pq", got["pq"], epq),
    ):
        assert isinstance(got_v, Decimal)
        assert Fraction(got_v) == exp, (name, got_v, exp)
    # empty match set -> exact 0, never NULL (oracle CASE ... ELSE 0)
    assert got["s0"] is not None and Fraction(got["s0"]) == 0


def test_decimal_acc_identical_to_limb(spark):
    """acc="decimal" must be value- AND type-identical to the limb
    accumulator on every form the small-input moment sites use —
    including `where=` empty-match 0-not-NULL semantics."""
    rng = random.Random(44)
    rows = _sum_frame(rng, 400)
    df = spark.createDataFrame(rows, "price double, disc double, tax double, qty int")
    forms = {
        "plain": lambda a: exact_sum("price", acc=a),
        "factor": lambda a: exact_sum("price", F.lit(1) - F.col("disc"), acc=a),
        # squares only for magnitude-bounded columns (product < 1e18
        # budget) — same shape the moment sites use on rates/series
        "square": lambda a: exact_sum("tax", "tax", acc=a),
        "intsq": lambda a: exact_sum(
            (F.col("qty"), 0), (F.col("qty"), 0), acc=a
        ),
        "where": lambda a: exact_sum("price", where=F.col("disc") > 0.05, acc=a),
        "empty": lambda a: exact_sum("price", where=F.col("disc") > 2, acc=a),
        # the ndp=None (raw integer units) forms production pairs with
        # acc="decimal": events_dispersion_index's plain square and
        # events_autocorrelation's where-conditioned cross product
        "nonesq": lambda a: exact_sum(
            (F.col("qty"), None), (F.col("qty"), None), acc=a
        ),
        "nonewhere": lambda a: exact_sum(
            (F.col("qty"), None),
            (F.col("qty"), None),
            where=F.col("disc") > 0.05,
            acc=a,
        ),
        "noneempty": lambda a: exact_sum(
            (F.col("qty"), None), where=F.col("disc") > 2, acc=a
        ),
    }
    row = df.agg(
        *[
            f(a).alias(f"{n}_{a}")
            for n, f in forms.items()
            for a in ("limb", "decimal", "long")
        ]
    ).collect()[0]
    for n in forms:
        limb = row[f"{n}_limb"]
        for a in ("decimal", "long"):
            got = row[f"{n}_{a}"]
            assert isinstance(got, Decimal) and got == limb, (n, a, limb, got)


def test_exact_sum_partitioning_invariant(spark):
    rng = random.Random(43)
    rows = _sum_frame(rng, 300)
    df = spark.createDataFrame(rows, "price double, disc double, tax double, qty int")
    agg = lambda d: d.agg(  # noqa: E731
        exact_sum("price", F.lit(1) - F.col("disc"), F.lit(1) + F.col("tax"))
    ).collect()[0][0]
    assert agg(df.repartition(1)) == agg(df.repartition(7))
