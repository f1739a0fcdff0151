"""Catalog layer: load the test-corpus tables and register SQL views.

Reference analog: Flink's catalog + DDL surface (`flink-table/flink-sql-parser`
`SqlCreateTable`/`SqlCreateView`, in-memory `GenericInMemoryCatalog`). Spark's
session catalog plus temp views covers the same need; this module is the thin
convenience layer that makes every query entrypoint one call.

Scale note: tables are plain parquet reads — Catalyst handles predicate
pushdown, column pruning and partition pruning on its own. Nothing here
materializes or collects.
"""

from __future__ import annotations

import os
import weakref
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from flink_ci_flink_spark.session import apply_runtime_confs

#: All driver-generated tables (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass
class Tables:
    """Lazy handle on one scale-factor directory of parquet tables."""

    spark: SparkSession
    sf_dir: str
    _cache: dict = field(default_factory=dict)

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self.table(name)

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in TABLE_NAMES:
                raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
            df = self.spark.read.parquet(os.path.join(self.sf_dir, f"{name}.parquet"))
            if name == "events" and dict(df.dtypes).get("ts") == "bigint":
                # TIMESTAMP(NANOS) read as long (see session.RUNTIME_CONFS);
                # truncate to micros exactly like DuckDB's TIMESTAMP does.
                from pyspark.sql import functions as F

                # integer division — float division would lose precision on
                # int64 epoch-nanos (> 2^53)
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            self._cache[name] = df
        return self._cache[name]

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql() queries."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)


#: Per-session catalog cache: (session → {sf_dir → Tables}). A fresh
#: Tables re-reads every parquet footer (schema inference + file listing,
#: 10 tables) on register_views — a pure-metadata cost each query
#: entrypoint used to pay on every invocation. Caching the Tables (hence
#: its analyzed DataFrames) amortizes that to once per (session, sf_dir):
#: DataFrames are *plans*, so execution still reads the parquet inputs —
#: nothing here persists data or results. Keyed weakly; note the cached
#: Tables hold a strong ref back to their session, so an entry lives
#: until the process exits — bounded by sessions-per-process (1–3 in
#: every caller: driver, bench, pytest), each entry a handful of plans.
_TABLES_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, Tables]]" = (
    weakref.WeakKeyDictionary()
)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> Tables:
    """Entry point used by every query: tune session, expose tables.

    Also registers all tables as temp views so query bodies can be a
    single ``spark.sql(...)`` — the declarative form Catalyst optimizes
    best. Registration is skipped when this same Tables instance was the
    session's most recent registrant (10 catalog round-trips per call
    otherwise — measured ~65 ms); interleaving two sf_dirs in one session
    still re-points the views on every switch (last-caller-wins, as
    before).
    """
    apply_runtime_confs(spark)
    sf = sf_dir or DEFAULT_SF_DIR
    per_session: dict | None
    try:
        per_session = _TABLES_CACHE.setdefault(spark, {})
        tables = per_session.get(sf)
        if tables is None:
            tables = per_session[sf] = Tables(spark, sf)
    except TypeError:  # pragma: no cover - session not weakref-able
        per_session, tables = None, Tables(spark, sf)
    if per_session is None or per_session.get("__last_registered__") is not tables:
        tables.register_views()
        if per_session is not None:
            per_session["__last_registered__"] = tables
    return tables
