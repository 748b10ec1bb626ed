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
# whose latest driver row is OLDEST. The ROUND-12 window leads with the
# three new faces (q169b/q174b — the corpus-adaptive production LSH
# twins of the two r11 `weak` marks; q210 — filtered vector search)
# plus the nine changed-plan faces needing fresh rows: q208 (its oracle
# now computes the corpus-proportional min_words limit), the graph
# family q144/q204/q180 (edge checkpoint + long-key iteration), the LSH
# family q169/q174 (shared pipelines + per-vector norm precompute) and
# q42 (bucket bits cast long), and the Avro round trips q205/q205b (the
# decode path grew the nested-logical lift). The round-12 extension
# session adds q211/q211b (exact-substring dedup + winnowed twin) at the
# head. Rotation fills the remaining 36 slots with the oldest-evidence
# names: the thirty remaining r6-latest names, then the first six
# r7-latest names by name (computed from CORRECTNESS_r01–r11 as in
# test_registry_order).
# Rotated out: the r11 window (now the R11_CHECKED permanent-evidence
# set).
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- new in round 12 --
    "q169b_knn_graph_production",
    "q174b_density_clusters_production",
    "q210_filtered_ann_search",
    "q211_exact_substring_dedup",
    "q211b_exact_substring_winnowed",
    # -- changed in round 12 (fresh row re-proves the new plan) --
    "q208_quarantine_triage",
    "q144_pagerank",
    "q204_personalized_pagerank",
    "q180_lpa_communities",
    "q169_knn_graph",
    "q174_density_clusters",
    "q42_ann_lsh_topk",
    "q205_avro_roundtrip",
    "q205b_avro_embeddings_roundtrip",
    # -- rotation: latest driver row is r6 --
    "q33_lang_id",
    "q34_fingerprint",
    "q43c_ann_ivf_exact",
    "q50_full_outer_join",
    "q58_pii_scrub",
    "q59_token_counting",
    "q62_forecast_revenue",
    "q63_promo_ratio",
    "q64_returned_items",
    "q67_left_outer_join",
    "q68_right_outer_join",
    "q70_shipping_priority",
    "q71_local_supplier_volume",
    "q72_volume_shipping",
    "q73_market_share",
    "q74_order_distribution",
    "q75_small_qty_revenue",
    "q76_large_orders",
    "q77_bracket_revenue",
    "q78_dormant_customers",
    "q79_top_supplier",
    "q80_neardup_clusters",
    "q81_clean_corpus",
    "q82_token_rarity",
    "q83_repetition_quality",
    "q84_decontamination",
    "q86_tfidf_keywords",
    "q87_sequence_packing",
    "q89_priority_late_orders",
    "q90_late_lines_by_status",
    # -- rotation: latest driver row is r7 (first 8 by name) --
    "q116_bloom_decontaminate",
    "q117_boilerplate_passages",
    "q119_zorder_key",
    "q119b_hilbert_key",
    "q123_phrase_search",
    "q126_histogram",
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
