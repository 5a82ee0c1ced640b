"""Cell-level cross-engine diff for one registry query.

Runs the Spark query and its DuckDB oracle on the same parquet dir and
prints the differing rows — the drill-down you reach for when
check_oracle reports a value-hash mismatch.  Uses the same cell
normalization as check_oracle, and the same MULTISET semantics as its
hash (duplicate-row multiplicity counts: [A, A, B] vs [A, B, B] is a
two-row diff, not zero).

Each surplus Spark row is greedily paired with the surplus oracle row
sharing the most equal cells, so the per-column diff lines compare
related rows; rows with no plausible partner print whole.

Usage: python tools/diff_cells.py <sf_dir> <query> [max_rows_shown]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from encodesrv_spark.catalog import TABLES
from encodesrv_spark.plans.registry import all_queries
from encodesrv_spark.session import get_spark
from tools.check_oracle import _norm_cell


def _multiset_surplus(
    a: list[tuple], b: list[tuple]
) -> tuple[list[tuple], list[tuple]]:
    """Rows of `a` not matched in `b` and vice versa, with multiplicity
    (mirrors check_oracle's duplicate-preserving sorted-rows hash)."""
    ca, cb = Counter(a), Counter(b)
    only_a = list(((ca - cb)).elements())
    only_b = list(((cb - ca)).elements())
    return sorted(only_a), sorted(only_b)


def _pair_greedy(
    only_s: list[tuple], only_o: list[tuple]
) -> list[tuple[tuple | None, tuple | None]]:
    """Greedily pair each spark-surplus row with the oracle-surplus row
    sharing the most equal cells; leftovers pair with None."""
    pairs: list[tuple[tuple | None, tuple | None]] = []
    remaining = list(only_o)
    for s in only_s:
        if not remaining:
            pairs.append((s, None))
            continue
        best = max(remaining, key=lambda o: sum(x == y for x, y in zip(s, o)))
        remaining.remove(best)
        pairs.append((s, best))
    pairs.extend((None, o) for o in remaining)
    return pairs


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
    cols_sorted = [scols[i] for i in order]

    def key(row, idx):
        return tuple(_norm_cell(row[i]) for i in idx)

    smap = [key(r, order) for r in srows]
    omap = [key(r, oorder) for r in orows]
    only_s, only_o = _multiset_surplus(smap, omap)

    print(
        f"{name}: spark={len(smap)} oracle={len(omap)} "
        f"spark-only={len(only_s)} oracle-only={len(only_o)}"
    )
    for shown, (s, o) in enumerate(_pair_greedy(only_s, only_o)):
        if shown >= limit:
            print(f"  ... ({len(only_s) + len(only_o)} surplus rows total)")
            break
        if s is None or o is None:
            side = "spark-only" if o is None else "oracle-only"
            print(f"  {side} row:", dict(zip(cols_sorted, s or o)))
            continue
        diff_cols = {c for c, a, b in zip(cols_sorted, s, o) if a != b}
        ctx = {c: a for c, a in zip(cols_sorted, s) if c not in diff_cols}
        print("  row:", dict(list(ctx.items())[:4]))
        for c, a, b in zip(cols_sorted, s, o):
            if c in diff_cols:
                print(f"    {c}: spark={a}  oracle={b}")
    spark.stop()


if __name__ == "__main__":
    main()
