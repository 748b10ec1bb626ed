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
    from .operators import analytics, extra, graph, relational, stats, streamsem, tpch, windows  # noqa: F401
    from .llm import bpe, dedup, kmeans, multimodal, packing, pq, sampling, search, semdedup, similarity, text  # noqa: F401
    from .functions import udfs  # noqa: F401
    from .plans import advisor, skew, zorder  # noqa: F401
    from .sources import ingest, manifest_table  # noqa: F401
    from .streaming import gate, manifest_log, matview, quantile  # noqa: F401

    _loaded = True


# The round driver sweeps ``queries()`` in dict order and correctness-checks
# the first 50 entries only. This list pins that window explicitly: queries
# that have never received a driver correctness row, were changed this round,
# or are new, come first; long-green redundant-coverage queries rotate to the
# back (they stay regression-guarded by tests/test_oracle.py, which sweeps
# ALL oracle-backed queries locally). Names not listed here keep their
# registration order after the listed ones.
# Window policy: a query needs ONE green driver row, ever — but stale
# evidence rots as shared helpers evolve, so the window ROTATES: after
# new/changed faces take their slots, remaining slots go to the names
# whose latest driver row is OLDEST. The ROUND-10 window leads with the
# two new faces (q107b — containment's checkpointed hashed+budgeted
# production face — and q205, the Avro round trip through the engine's
# own OCF codec), then the two faces whose plan/oracle changed this
# round (q203 restructured to one wide aggregate + stack unpivot with
# CASE-sum violation counters; q201's intersect hoisted in both Spark
# and oracle). Rotation fills the remaining 46 slots with the names
# whose latest driver row is oldest — all thirty r4-latest names, then
# sixteen r5-latest names ordered by name (deterministic; computed from
# test_registry_order's R1–R9 evidence sets). Rotated out: the r9
# window (now the R9_CHECKED permanent-evidence set).
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- new in round 10 --
    "q107b_containment_budgeted",
    "q205_avro_roundtrip",
    "q206_pii_scrub",
    "q207_dup_source_matrix",
    # -- changed in round 10 (fresh rows re-prove the new plans) --
    "q203_expectations",
    "q201_cluster_audit",
    # -- rotation: latest driver row is r4 --
    "q122_scd2_history",
    "q124_exact_group_median",
    "q127_interval_overlap",
    "q127b_interval_overlap_agg",
    "q12_grouping_sets",
    "q131_token_bigrams",
    "q132_csv_orc_roundtrip",
    "q134_semantic_decontaminate",
    "q135_udtf_passages",
    "q137_schema_evolution",
    "q138_sq8_ann_topk",
    "q13_window_topk_per_group",
    "q141_kmeans_clusters",
    "q142_bpe_merges",
    "q143_weighted_median",
    "q14_window_analytic",
    "q15_top_global",
    "q16_set_ops",
    "q17_scalar_string_math",
    "q44_window_frames",
    "q45_string_null_fns",
    "q46_array_ops",
    "q47_correlation",
    "q48_string_agg",
    "q49_bitwise_misc",
    "q60_funnel",
    "q61_retention",
    "q65_unpivot",
    "q66_multiset_ops",
    "q80b_neardup_clusters_star",
    # -- rotation: latest driver row is r5 --
    "q09_distinct_users",
    "q109_sliding_distinct",
    "q10_rollup_orders",
    "q120_heavy_hitters",
    "q136_streaming_quantiles",
    "q139_manifest_log",
    "q140_bm25_search",
    "q144_pagerank",
    "q148_triangle_count",
    "q151_pareto_frontier",
    "q152_mad_outliers",
    "q153_equidepth_bins",
    "q154_scd2_asof_join",
    "q155_audio_windows",
)


def _ordered(d: dict) -> dict:
    prio = {n: i for i, n in enumerate(DRIVER_WINDOW_PRIORITY)}
    reg = list(d)
    return {
        n: d[n]
        for n in sorted(reg, key=lambda n: (prio.get(n, len(prio)), reg.index(n)))
    }


def all_queries() -> dict[str, QueryFn]:
    _load()
    return _ordered(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    _load()
    return _ordered(_ORACLE)
