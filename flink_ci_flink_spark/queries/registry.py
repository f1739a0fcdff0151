"""Query registry — the driver-facing contract.

Every operator family from SURVEY.md §2 registers at least one named query
here; `__spark_entry__.queries()` / `oracle_sql()` are views over this dict.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string for the DuckDB oracle. Column names are aliased
identically on both sides (the driver sorts columns by name before hashing).
Non-SQL-expressible operators register with ``oracle=None`` (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    group: str
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, group: str = "misc"):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, group, (fn.__doc__ or "").strip())
        return fn

    return deco
