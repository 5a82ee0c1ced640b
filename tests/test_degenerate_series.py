"""Degenerate (zero-variance) series must not kill an oracle run.

VERDICT r05 #2: the correlation-shaped queries compute two-factor
Pearson denominators ``sqrt((n·sxx − sx²)·(n·syy − sy²))``.  A constant
series makes each variance factor 0 — or −ε once double cancellation
past 2^53 enters — and DuckDB ERRORS on ``sqrt(−ε)`` (killing the whole
oracle run) while Spark yields NaN.  Every variance factor is now
clamped ``greatest(0, ·)`` on BOTH engines and mapped to NULL via the
existing ``nullif`` (the value_anomaly_zscore / cusum clamp template).

This module pins that behavior two ways:

* a direct DuckDB probe that raw ``sqrt(−ε)`` raises while the clamped
  template returns 0 — the motivating engine asymmetry, and
* constant-series parquet fixtures driven through all four
  correlation-shaped queries on BOTH engines: the Spark result and the
  DuckDB oracle must both run without error and hash-match (NULL
  correlations), under the same comparator as the oracle gate.
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from encodesrv_spark.plans.registry import all_queries
from tools.check_oracle import _hash_rows

QUERIES = all_queries()

# The four queries VERDICT r05 #2 names, each fed a fixture whose
# relevant series is CONSTANT so its variance factor is exactly zero:
# the clamp + nullif path must yield NULL on both engines, not an error.
DEGENERATE = [
    # ranks collapse to a single row (one distinct token): n=1 → both
    # variance factors 0 AND the closed-form d² denominator n(n²−1)=0
    "token_rank_stability",
    # 1-regular co-purchase graph: every endpoint degree equal → 0 variance
    "copurchase_assortativity",
    # constant event value → every hourly mean identical → 0 variance
    "events_autocorrelation",
    # constant quantity AND price → vx = vy = 0
    "regression_stats",
]


def _write(dirpath, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{dirpath}/{name}.parquet")


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("degenerate_sf")
    # documents: one distinct token, counts ≥ _RANK_MIN_CF in BOTH
    # doc_id-parity halves → the ranked frame is a single row.
    _write(
        d,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(1, 13), pa.int64()),
                "text": pa.array(["alpha alpha"] * 12),
                "lang": pa.array(["en"] * 12),
                "source": pa.array(["s0"] * 12),
                "n_chars": pa.array([11] * 12, pa.int64()),
            }
        ),
    )
    # lineitem: 3 orders × the same 2 parts → one co-purchase edge with
    # support 3; both endpoints have degree 1 (regular graph).  Constant
    # quantity and price → zero variance for regression_stats.
    n = 6
    ship = datetime.datetime(1997, 1, 1)
    _write(
        d,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
                "l_partkey": pa.array([101, 102] * 3, pa.int64()),
                "l_suppkey": pa.array([7] * n, pa.int64()),
                "l_linenumber": pa.array([1, 2] * 3, pa.int32()),
                "l_quantity": pa.array([5.0] * n),
                "l_extendedprice": pa.array([1000.0] * n),
                "l_discount": pa.array([0.0] * n),
                "l_tax": pa.array([0.0] * n),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array([ship] * n, pa.timestamp("us")),
            }
        ),
    )
    # events: one event type, four distinct hours, constant value.
    base = datetime.datetime(2024, 3, 1, 0, 30)
    ts = [base + datetime.timedelta(hours=h) for h in range(4) for _ in (0, 1)]
    _write(
        d,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(1, 9), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * 8, pa.int64()),
                "event_type": pa.array(["click"] * 8),
                "value": pa.array([2.5] * 8),
                "props": pa.array(["{}"] * 8),
            }
        ),
    )
    return str(d)


@pytest.fixture(scope="module")
def degenerate_duck(degenerate_dir):
    con = duckdb.connect()
    for t in ("documents", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_duckdb_sqrt_negative_epsilon_is_the_hazard():
    """The engine asymmetry the clamps exist for: DuckDB errors on
    sqrt of a negative cancellation residue (Spark would NaN), while
    the greatest(0, ·) template is safe on both."""
    con = duckdb.connect()
    try:
        with pytest.raises(Exception):
            con.execute("SELECT sqrt(CAST(-1e-9 AS DOUBLE))").fetchone()
        (clamped,) = con.execute(
            "SELECT sqrt(greatest(CAST(0 AS DOUBLE), CAST(-1e-9 AS DOUBLE)))"
        ).fetchone()
        assert clamped == 0.0
    finally:
        con.close()


@pytest.mark.parametrize("name", DEGENERATE)
def test_constant_series_yields_null_not_error(
    spark, degenerate_dir, degenerate_duck, name
):
    q = QUERIES[name]
    sdf = q.fn(spark, degenerate_dir)
    srows = [tuple(r) for r in sdf.collect()]

    res = degenerate_duck.execute(q.oracle)  # must not raise
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert len(srows) == len(orows), f"{name}: rowcount mismatch"
    assert sorted(sdf.columns) == sorted(ocols)
    assert _hash_rows(sdf.columns, srows) == _hash_rows(ocols, orows), (
        f"{name}: degenerate-series results diverge across engines"
    )
    # and the degenerate statistic really is NULL (not 0, NaN, or a
    # garbage ratio): every correlation-shaped output column is None
    corr_cols = {
        "token_rank_stability": ["spearman_rho", "spearman_exact"],
        "copurchase_assortativity": ["assortativity"],
        "events_autocorrelation": ["acf_1", "acf_2", "acf_3"],
        "regression_stats": ["corr_qty_price", "slope", "intercept", "r2"],
    }[name]
    for row in sdf.collect():
        for c in corr_cols:
            assert row[c] is None, f"{name}.{c}: expected NULL, got {row[c]!r}"
