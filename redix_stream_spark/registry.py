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
# whose latest driver row is OLDEST. The ROUND-9 window leads with the
# three new faces (q195b — whose oracle is deliberately q195's SQL so
# the driver hash-checks the prefilter's soundness — q201, q202); then
# the storage faces whose shared read path changed this round (MOR
# sidecars now scope to their referencing files — the ADVICE r8 high
# fix — so every ManifestTable-reading face re-proves on the new code)
# and q155b, whose mixed corpus gained LPC-coded FLAC; then rotation by
# oldest-row: q51 (r1), the r2 five, all fourteen r3-latest names, and
# fourteen r4 representatives. Rotated out: the round-7/8 faces — all
# with permanent rows (tests/test_registry_order.py R1–R8 sets).
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- new in round 9: the prefiltered audience overlap (oracle = the
    # exact face's SQL — the driver hash-checks the prune's soundness),
    # the cluster quality audit, and the seasonal profile --
    "q195b_audience_overlap_prefiltered",
    "q201_cluster_audit",
    "q202_seasonal_profile",
    "q203_expectations",
    "q204_personalized_pagerank",
    # -- changed in round 9: every ManifestTable read now applies MOR
    # sidecars SCOPED to their referencing files (the ADVICE r8 fix) —
    # fresh rows re-prove the whole storage read surface; q155b's mixed
    # corpus gained LPC-coded FLAC (rows-only) --
    "q196_mor_delete",
    "q150_table_changes",
    "q146_merge_upsert",
    "q146b_merge_schema_evolution",
    "q178_table_delete",
    "q179_compact_reclaim",
    "q194_cdc_apply",
    "q198_metadata_agg",
    "q168_table_restore",
    "q149_zorder_table_scan",
    "q182_bloom_point_lookup",
    "q145_skipping_scan",
    "q155b_audio_windows_mixed",
    # -- rotation: latest driver row is r1/r2 --
    "q51_approx_distinct",
    "q43b_ann_ivf_topk",
    "q52_approx_percentiles",
    "q53_hll_mergeable_rollup",
    "q56_grouped_map_zscore",
    "q57_stratified_sample",
    # -- latest driver row is r3 --
    "q109b_sliding_distinct_hll",
    "q121_pq_ann_topk",
    "q125_compression_ratio",
    "q130_corpus_report",
    "q133_interevent_gaps",
    "q35_shingle_fingerprint",
    "q37_ngram_jaccard_dup",
    "q38_simhash",
    "q38b_simhash_weighted",
    "q39_multimodal_meta",
    "q41b_embedding_neardup_fast",
    "q92_forecast_revenue",
    "q93_promo_revenue",
    "q99_passage_dedup",
    # -- latest driver row is r4 (oldest remaining) --
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_star_join_revenue",
    "q04_semi_join",
    "q05_anti_join",
    "q06_range_join",
    "q06b_range_join_agg",
    "q07_asof_join",
    "q08_agg_orders",
    "q111_jsonl_roundtrip",
    "q11_cube_events",
    "q121b_pq_ann_production",
    # (The round-7/8 faces — q175–q200 — rotated out this round: all
    # carry permanent r7/r8 rows (test_registry_order's R7/R8_CHECKED
    # sets). Remaining slots went to the names whose latest driver row
    # is oldest: r1 q51, the r2 five, every r3-latest name, then r4
    # representatives.)
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
