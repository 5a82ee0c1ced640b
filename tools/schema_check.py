"""Round-start testdata guard: diff the driver-generated parquet
schemas against the catalog's expectations.

The driver REGENERATES /root/testdata every round, and physical types
can drift silently (round 2: events.ts changed TIMESTAMP(NANOS) →
TIMESTAMP(MICROS), which broke 13 event-time queries until the catalog
learned to sniff the footer).  Run this before anything else each
round; exit code 1 on any unexpected shape.

Usage:  python tools/schema_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encodesrv_spark.catalog import TABLES  # noqa: E402

# Column -> acceptable pyarrow type strings (None = any). Only columns
# the engine depends on are pinned; extra columns are reported, not
# fatal.
EXPECTED: dict[str, dict[str, tuple[str, ...] | None]] = {
    "region": {"r_regionkey": ("int32", "int64"), "r_name": ("string", "large_string")},
    "nation": {"n_nationkey": ("int32", "int64"), "n_regionkey": ("int32", "int64")},
    "customer": {"c_custkey": ("int64",), "c_nationkey": ("int32", "int64")},
    "supplier": {"s_suppkey": ("int64",), "s_nationkey": ("int32", "int64")},
    "part": {"p_partkey": ("int64",)},
    "orders": {
        "o_orderkey": ("int64",),
        "o_custkey": ("int64",),
        "o_totalprice": ("double",),
        "o_orderdate": ("date32[day]", "timestamp[us]", "timestamp[ns]"),
    },
    "lineitem": {
        "l_orderkey": ("int64",),
        "l_partkey": ("int64",),
        "l_extendedprice": ("double",),
        "l_discount": ("double",),
        "l_quantity": ("double", "int64"),
        "l_shipdate": ("date32[day]", "timestamp[us]", "timestamp[ns]"),
    },
    "events": {
        "event_id": ("int64",),
        # both have shipped; catalog.load_table handles either
        "ts": ("timestamp[us]", "timestamp[ns]"),
        "user_id": ("int64",),
        "event_type": ("string", "large_string"),
        "value": ("double",),
        "props": ("string", "large_string"),
    },
    "documents": {
        "doc_id": ("int64",),
        "text": ("string", "large_string"),
        "lang": ("string", "large_string"),
    },
    "embeddings": {
        "vec_id": ("int64",),
        "embedding": ("list<item: float>", "list<element: float>"),
        "label": ("int32", "int64"),
    },
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = 0
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            print(f"MISSING {t}: {path}")
            bad += 1
            continue
        schema = pq.read_schema(path)
        have = {f.name: str(f.type) for f in schema}
        for col, accept in EXPECTED.get(t, {}).items():
            if col not in have:
                print(f"FAIL {t}.{col}: column absent (have: {sorted(have)})")
                bad += 1
            elif accept is not None and have[col] not in accept:
                print(f"FAIL {t}.{col}: type {have[col]!r} not in {accept}")
                bad += 1
        extras = [c for c in have if c not in EXPECTED.get(t, {})]
        print(f"ok   {t}: {len(have)} cols" + (f" (unpinned: {extras})" if extras else ""))
    if bad:
        print(f"{bad} schema problem(s) — update encodesrv_spark/catalog.py before running queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
