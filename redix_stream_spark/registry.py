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
    from .streaming import manifest_log, matview, quantile  # noqa: F401

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
# whose latest driver row is OLDEST. The ROUND-7 window leads with the
# nine new faces (storage lifecycle q178/q179/q182, graph q176/q180,
# analytics q177/q181, sampling q175/q183); q172, whose implementation
# changed (state-capped in-session numbering — same results, fresh row
# proves it); and q166, the shared-artifact composed face, whose cache
# keying/build order changed this round (hash-invisible by contract —
# the fresh row re-proves it for all artifact consumers). Then every
# name whose latest row is r2 (6) or r3 (31), and two r4-only headline
# representatives (q01, q06). Rotated out: the r6-window names — all
# with permanent rows (tests/test_registry_order.py R1–R6 sets).
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- new in round 8: the coded hub-degree guard face (r7 verdict's
    # one open `weak`), merge-on-read deletes, and the mixed WAV/FLAC
    # audio face (rows-only — numpy-side DSP) --
    "q176b_link_prediction_capped",
    "q196_mor_delete",
    "q155b_audio_windows_mixed",
    "q197_rollup_trend",
    "q198_metadata_agg",
    "q190b_layout_advisor_sampled",
    "q199_vocab_growth",
    "q200_robust_trend",
    # -- new in round 7, session 2 (PMI, CUSUM, HLL, skew report,
    # curriculum, surprisal, layout advisor) --
    "q184_pmi_collocations",
    "q185_cusum_changepoint",
    "q186_hll_distinct",
    "q187_key_skew_report",
    "q188_curriculum_manifest",
    "q189_bigram_surprisal",
    "q190_layout_advisor",
    "q191_funnel_edges",
    "q192_funnel_timing",
    "q193_cluster_representatives",
    "q194_cdc_apply",
    "q195_audience_overlap",
    # -- new in round 7 --
    "q175_epoch_shuffle",
    "q176_link_prediction",
    "q177_rolling_corr",
    "q178_table_delete",
    "q179_compact_reclaim",
    "q180_lpa_communities",
    "q181_winsorized_stats",
    "q182_bloom_point_lookup",
    "q183_pps_sample",
    # -- changed in round 7 --
    "q172_top_paths",
    "q166_corpus_pipeline",
    # -- latest driver row is r2 --
    "q91_waiting_suppliers",
    "q94_product_profit",
    "q95_min_cost_supplier",
    "q96_important_parts",
    "q97_supplier_variety",
    "q98_promo_part_suppliers",
    # -- latest driver row is r3 --
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
    # (q116/q117/q119/q119b/q123, q126/q128/q129, q130/q133, q35/q37/q38,
    # q38b/q39/q92/q93/q99 and the r4 representatives q01/q06 rotated
    # out to make room for the round-8 and session-2 faces — all have
    # permanent r1-r4 rows; test_registry_order's R*_CHECKED sets keep
    # them covered.)
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
