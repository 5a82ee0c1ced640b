"""NULL-text documents must not split engines in the quality family.

The r06 tie-quantization rework made ttr/score NULLABLE (nullif on the
token denominator), which exposes a second engine asymmetry: window
ORDER BY defaults differ — Spark ASC is NULLS FIRST, DuckDB ASC is
NULLS LAST — so an unpinned NULL score would shift EVERY rank in its
source partition in `quality_percentile_by_source`.  The window now
pins NULLS LAST explicitly on both engines (`asc_nulls_last` /
``ORDER BY score NULLS LAST``).

This module drives a fixture containing a NULL-text document (the only
input that produces a NULL score: both engines tokenize the empty
string to one empty token, so n_tokens=0 is unreachable — probed)
through `quality_score` and `quality_percentile_by_source` on BOTH
engines under the oracle gate's comparator.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from encodesrv_spark.plans.registry import all_queries
from tools.check_oracle import _hash_rows

QUERIES = all_queries()


@pytest.fixture(scope="module")
def nulldoc_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("nulldoc_sf")
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine and a penny saved is a penny earned",
        None,  # NULL text -> NULL n_* -> NULL ttr/score on both engines
        "",  # empty string: ONE empty token on both engines, not zero
        "to be or not to be that is the question",
        "all work and no play makes jack a dull boy",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s0", "s0", "s0", "s0", "s1", "s1"]),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    return str(d)


@pytest.fixture(scope="module")
def nulldoc_duck(nulldoc_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{nulldoc_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["quality_score", "quality_percentile_by_source"]
)
def test_null_text_doc_matches_cross_engine(
    spark, nulldoc_dir, nulldoc_duck, name
):
    q = QUERIES[name]
    sdf = q.fn(spark, nulldoc_dir)
    srows = [tuple(r) for r in sdf.collect()]

    res = nulldoc_duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert len(srows) == len(orows) == 6, f"{name}: rowcount mismatch"
    assert sorted(sdf.columns) == sorted(ocols)
    assert _hash_rows(sdf.columns, srows) == _hash_rows(ocols, orows), (
        f"{name}: NULL-text results diverge across engines"
    )


def test_null_doc_score_is_null_and_ranks_unshifted(spark, nulldoc_dir):
    """The NULL-text doc scores NULL, sorts last in its source window
    (src_pr = 1.0 for a unique max rank), and does NOT displace the
    real documents' percentiles."""
    out = {
        r["doc_id"]: r
        for r in QUERIES["quality_percentile_by_source"]
        .fn(spark, nulldoc_dir)
        .collect()
    }
    assert out[3]["score"] is None
    assert out[3]["src_pr"] == 1.0  # NULLS LAST: unique last rank in s0
    # the three real s0 docs occupy ranks 0..2 of d=3 -> src_pr thirds
    real_prs = sorted(out[i]["src_pr"] for i in (1, 2, 4))
    assert all(pr < 1.0 for pr in real_prs)


def test_empty_string_tokenizes_to_one_token_both_engines(spark, nulldoc_dir):
    """The guard premise: '' splits to [''] (1 token) on BOTH engines,
    so the nullif(2*n_tokens, 0) branch is unreachable from empty text
    and NULL scores come only from NULL text."""
    row = (
        QUERIES["quality_score"]
        .fn(spark, nulldoc_dir)
        .filter("doc_id = 4")
        .collect()[0]
    )
    assert row["n_tokens"] == 1
    con = duckdb.connect()
    try:
        (n,) = con.execute(
            r"SELECT len(string_split_regex('', '\s+'))"
        ).fetchone()
        assert n == 1
    finally:
        con.close()
