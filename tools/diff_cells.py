"""Cell-level cross-engine diff for one registry query.

Runs the Spark query and its DuckDB oracle on the same parquet dir and
prints every differing cell (row keyed by its full sorted-tuple repr,
using the same normalization as check_oracle) — the drill-down you
reach for when check_oracle reports a value-hash mismatch.

Usage: python tools/diff_cells.py <sf_dir> <query> [max_rows_shown]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from encodesrv_spark.catalog import TABLES
from encodesrv_spark.plans.registry import all_queries
from encodesrv_spark.session import get_spark
from tools.check_oracle import _norm_cell


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    q = all_queries()[name]
    spark = get_spark("diff_cells")
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    srows = sdf.collect()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(q.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    order = sorted(range(len(scols)), key=lambda i: scols[i])
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])

    def key(row, idx):
        return tuple(_norm_cell(row[i]) for i in idx)

    smap = sorted(key(r, order) for r in srows)
    omap = sorted(key(r, oorder) for r in orows)
    cols_sorted = [scols[i] for i in order]

    shown = 0
    sset, oset = set(smap), set(omap)
    only_s = [r for r in smap if r not in oset]
    only_o = [r for r in omap if r not in sset]
    print(f"{name}: spark={len(smap)} oracle={len(omap)} "
          f"spark-only={len(only_s)} oracle-only={len(only_o)}")
    for s, o in zip(only_s, only_o):
        # align by the first columns that match; print differing cells
        diffs = [
            (c, a, b) for c, a, b in zip(cols_sorted, s, o) if a != b
        ]
        same = [(c, a) for c, a in zip(cols_sorted, s) if (c, a) not in [(c2, b) for c2, _, b in diffs]]
        print("  row:", dict(same[:4]))
        for c, a, b in diffs:
            print(f"    {c}: spark={a}  oracle={b}")
        shown += 1
        if shown >= limit:
            break
    spark.stop()


if __name__ == "__main__":
    main()
