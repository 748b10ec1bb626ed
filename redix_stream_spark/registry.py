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
# whose latest driver row is OLDEST. The ROUND-11 window leads with the
# three new faces (q162b — the DC-decode image near-dup production
# face; q205b — the Avro nested-array embeddings round trip; q208 —
# the quarantine triage matrix) plus q207, whose plan changed this
# round (it now consumes the shared production-pairs artifact — the
# fresh row re-proves hash-invisibility). Rotation fills the remaining
# 45 slots with the names whose latest driver row is oldest: all
# twenty-nine r5-latest names, then the first sixteen r6-latest
# names ordered by name (deterministic; computed from
# test_registry_order's R1-R10 evidence sets). Rotated out: the r10
# window (now the R10_CHECKED permanent-evidence set).
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- new in round 11 --
    "q162b_image_neardup_fast",
    "q205b_avro_embeddings_roundtrip",
    "q208_quarantine_triage",
    "q209_hybrid_retrieval_rrf",
    # -- changed in round 11 (fresh row re-proves the new plan) --
    "q207_dup_source_matrix",
    # -- rotation: latest driver row is r5 --
    "q156_kcore_decomposition",
    "q157_bfs_levels",
    "q158_salted_join_revenue",
    "q159_ref_integrity_audit",
    "q160_funnel",
    "q161_attribution",
    "q164_trend_ols",
    "q165_sessionize",
    "q18_scalar_datetime",
    "q19_json_props",
    "q20_tumbling_window",
    "q21_sliding_window",
    "q22_session_window",
    "q23_stream_replay",
    "q24_dedup_first",
    "q25_pending_antijoin",
    "q26_percentiles",
    "q30_text_stats",
    "q31_top_tokens",
    "q36_minhash_lsh_neardup",
    "q36b_minhash_production",
    "q40_cosine_topk",
    "q41_embedding_neardup",
    "q42_ann_lsh_topk",
    "q43_image_features",
    "q54_pandas_udf_tokens",
    "q55_rowwise_udf_tokens",
    "q85_hash_split",
    "q88_quota_sample",
    # -- rotation: latest driver row is r6 (first 16 by name) --
    "q107_containment_dup",
    "q118_leakage_safe_split",
    "q147_binary_ann_topk",
    "q162_image_neardup",
    "q163_bpe_encode",
    "q167_sssp_bounded",
    "q169_knn_graph",
    "q170_column_profile",
    "q171_cluster_histogram",
    "q173_incremental_clusters",
    "q174_density_clusters",
    "q23b_replay_scaled",
    "q27_moment_stats",
    "q28_pivot_events",
    "q29_map_ops",
    "q32_doc_quality",
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
