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
    from .llm import bpe, dedup, kmeans, multimodal, packing, pq, search, semdedup, similarity, text  # noqa: F401
    from .functions import udfs  # noqa: F401
    from .plans import zorder  # noqa: F401
    from .sources import ingest  # noqa: F401
    from .streaming import manifest_log, matview, quantile  # noqa: F401

    _loaded = True


# The round driver sweeps ``queries()`` in dict order and correctness-checks
# the first 50 entries only. This list pins that window explicitly: queries
# that have never received a driver correctness row, were changed this round,
# or are new, come first; long-green redundant-coverage queries rotate to the
# back (they stay regression-guarded by tests/test_oracle.py, which sweeps
# ALL oracle-backed queries locally). Names not listed here keep their
# registration order after the listed ones.
# Window policy: a query needs ONE green driver row, ever. After r1–r3
# every registered query has a row (union = 140/140). The round-4 window
# leads with: q42/q43, whose UPGRADED oracles (float-LSH, Arrow-decode)
# landed after the r3 sweep and have only judge-side verification
# (VERDICT r03 item 1); the seven NEW round-4 faces (q06b window-aggregate
# range join, q121b production-width PQ, q80b star contraction, q134
# semantic decontamination, q135 UDTF passages, q136 streaming exact
# quantiles, q137 schema evolution); and the seven queries whose oracle
# SQL or Spark face changed with the round-4 ADVICE fixes (odd-median
# weighting, bigram guard, (ts, event_id) tie-breaks, scratch-dir
# ingest). The remaining slots re-verify the r1 relational core
# (q01–q19 family, last checked in round 1) as rotating regression
# faces. Rotated out this round: the 39 r3-green names q92–q133 etc.
# plus r1-green q20–q28/q63 spillover, all with permanent rows
# (tests/test_registry_order.py R1_GREEN/R2_CHECKED/R3_CHECKED).
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- oracle upgraded post-r3-sweep; judge-verified, needs a driver row --
    "q42_ann_lsh_topk",
    "q43_image_features",
    # -- new in round 4 --
    "q06b_range_join_agg",
    "q121b_pq_ann_production",
    "q80b_neardup_clusters_star",
    "q134_semantic_decontaminate",
    "q135_udtf_passages",
    "q136_streaming_quantiles",
    "q137_schema_evolution",
    "q138_sq8_ann_topk",
    "q139_manifest_log",
    # -- new late in round 4 (session 3) --
    "q140_bm25_search",
    "q141_kmeans_clusters",
    "q142_bpe_merges",
    "q143_weighted_median",
    "q144_pagerank",
    # -- oracle/face changed by the round-4 ADVICE fixes --
    "q122_scd2_history",
    "q124_exact_group_median",
    "q127_interval_overlap",
    "q127b_interval_overlap_agg",
    "q131_token_bigrams",
    "q111_jsonl_roundtrip",
    "q132_csv_orc_roundtrip",
    # -- r1-green relational core, re-verified as regression faces --
    "q60_funnel",
    "q61_retention",
    "q44_window_frames",
    "q45_string_null_fns",
    "q46_array_ops",
    "q47_correlation",
    "q48_string_agg",
    "q49_bitwise_misc",
    "q65_unpivot",
    "q66_multiset_ops",
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_star_join_revenue",
    "q04_semi_join",
    "q05_anti_join",
    "q06_range_join",
    "q07_asof_join",
    "q08_agg_orders",
    "q09_distinct_users",
    "q10_rollup_orders",
    "q11_cube_events",
    "q12_grouping_sets",
    "q13_window_topk_per_group",
    "q14_window_analytic",
    "q15_top_global",
    "q16_set_ops",
    "q17_scalar_string_math",
    # q68_right_outer_join rotated out for q139 (r1-green permanent row;
    # right-outer is the least marginal of the three outer-join faces).
    # q19_json_props / q29_map_ops / q50_full_outer_join /
    # q67_left_outer_join / q18_scalar_datetime rotated out for the five
    # session-3 additions (q140–q144) — all r1-green with permanent
    # CORRECTNESS_r01 rows.
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
