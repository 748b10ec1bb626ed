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
# whose latest driver row is OLDEST. The ROUND-13 window leads with the
# union of (a) the 14 faces whose plans the round-12 OPTIMIZATION
# session changed after the r12 window was already set (VERDICT r12
# item 1b — they are oracle-green locally but have no driver row for
# the new plans) and (b) every face whose plan round 13 changes: the
# Arrow fold scorer (q169/q169b/q174/q174b), the packed co-occurrence
# and wedge keys (q148/q156/q176/q176b/q180), and the shingle-set
# parquet materialization (q36/q36b/q80/q80b/q173). Rotation fills the
# remaining 28 slots with the oldest-evidence names: the two remaining
# r7-latest names, then r8-latest names by name (computed from
# CORRECTNESS_r01–r12 as in test_registry_order).
# Rotated out: the r12 window (now the R12_CHECKED permanent-evidence
# set — all 50 rows hash-green).
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- changed in round 12 (opt session) and/or round 13 --
    "q169b_knn_graph_production",
    "q174b_density_clusters_production",
    "q169_knn_graph",
    "q174_density_clusters",
    "q176_link_prediction",
    "q176b_link_prediction_capped",
    "q148_triangle_count",
    "q156_kcore_decomposition",
    "q180_lpa_communities",
    "q36_minhash_lsh_neardup",
    "q36b_minhash_production",
    "q80_neardup_clusters",
    "q80b_neardup_clusters_star",
    "q173_incremental_clusters",
    "q157_bfs_levels",
    "q167_sssp_bounded",
    "q190_layout_advisor",
    "q200_robust_trend",
    "q134_semantic_decontaminate",
    "q121b_pq_ann_production",
    "q107b_containment_budgeted",
    "q163_bpe_encode",
    # -- rotation: latest driver row is r7 --
    "q128_cooccurrence_lift",
    "q129_cohort_matrix",
    # -- rotation: latest driver row is r8 (by name) --
    "q100_dup_ngram_fraction",
    "q101_mixture_sample",
    "q102_semantic_dedup",
    "q103_gapfill",
    "q104_decayed_avg",
    "q105_matview_rollup",
    "q106_latest_state",
    "q108_source_drift",
    "q110_rate_anomaly",
    "q112_quality_report",
    "q113_fuzzy_join",
    "q114_ohlc_bars",
    "q115_event_transitions",
    "q166_corpus_pipeline",
    "q172_top_paths",
    "q175_epoch_shuffle",
    "q177_rolling_corr",
    "q181_winsorized_stats",
    "q183_pps_sample",
    "q184_pmi_collocations",
    "q185_cusum_changepoint",
    "q186_hll_distinct",
    "q187_key_skew_report",
    "q188_curriculum_manifest",
    "q189_bigram_surprisal",
    "q190b_layout_advisor_sampled",
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
