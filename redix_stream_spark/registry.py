"""Query registry — the (queries, oracle_sql) contract for __spark_entry__.

Every engine operator from SURVEY.md §2.2 lands here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB-dialect oracle SQL string computing the same result. The driver runs
both sides at sf0.01 and compares row count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically in Spark and SQL;
- float aggregates go through the exact-decimal discipline in ``numeric``;
- integer outputs are normalized to BIGINT on both sides (Spark ranking
  fns return int, DuckDB's return bigint; DuckDB SUM(int) returns hugeint).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}
_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering an engine query (and its oracle SQL, if any)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    # Imports are for their registration side effects.
    from .operators import analytics, extra, relational, stats, streamsem, windows  # noqa: F401
    from .llm import dedup, multimodal, similarity, text  # noqa: F401
    from .functions import udfs  # noqa: F401

    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLE)
