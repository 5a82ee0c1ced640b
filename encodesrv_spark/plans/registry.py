"""Query registry — the single source of truth for the engine's query
surface.

Every operator in SURVEY.md §2 (plus the LLM-pipeline extensions) is
declared here as a named pair:

* a Spark callable ``fn(spark, sf_dir) -> DataFrame`` (the engine), and
* an optional ANSI-SQL oracle string DuckDB runs on the same parquet
  tables (the correctness gate).  ``oracle=None`` marks genuinely
  non-SQL-expressible ops (the driver records a weaker rows-only check).

Column names must match exactly between the two — the driver sorts
columns by name before value-hashing.  Floating-point outputs are
rounded identically on both sides; timestamps are rendered as strings
so both engines agree byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all plan modules (side-effect registration) and return the map."""
    # Imports deferred so `import encodesrv_spark` stays cheap.
    from encodesrv_spark.plans import (  # noqa: F401
        corpus,
        extended,
        llm,
        parity,
        tpch,
        tpch_deep,
    )

    return dict(_REGISTRY)
