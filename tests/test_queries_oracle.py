"""Registry-wide differential test: every query with an oracle must
hash-match DuckDB at sf0.001 (the fast gate; the driver runs sf0.01).

This is the same comparison tools/check_oracle.py runs, as pytest
parametrization so a single operator regression fails one named test.

Each query also runs twice on Spark under different
spark.sql.shuffle.partitions (the session default vs 7) and must
produce the IDENTICAL exact-repr hash: partial-aggregation order is a
function of partitioning, so any order-dependent float accumulation
(the r04 `order_seasonality_index` failure class) surfaces here as a
deterministic test failure instead of a probabilistic driver red row.
"""

from __future__ import annotations

import pytest

import duckdb

from encodesrv_spark.catalog import TABLES
from encodesrv_spark.plans.registry import all_queries
from tools.check_oracle import _hash_rows

QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]

    # Partitioning-invariance harness: identical exact hash under a
    # different shuffle fan-out, or the query's float handling is
    # order-dependent and will eventually flake in the driver gate.
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        alt = [tuple(r) for r in q.fn(spark, sf_dir).collect()]
    finally:
        spark.conf.set(key, prev)
    assert _hash_rows(sdf.columns, srows) == _hash_rows(sdf.columns, alt), (
        f"{name}: result depends on shuffle partitioning "
        f"(order-dependent accumulation)"
    )

    if q.oracle is None:
        assert sdf.columns, f"{name}: no schema"
        return
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), f"{name}: rowcount mismatch"
    assert _hash_rows(sdf.columns, srows) == _hash_rows(ocols, orows), (
        f"{name}: value hash mismatch"
    )


def test_every_query_has_doc():
    for name, q in QUERIES.items():
        assert q.doc, f"{name} missing docstring"
