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
    from .operators import analytics, extra, relational, stats, streamsem, tpch, windows  # noqa: F401
    from .llm import dedup, multimodal, packing, similarity, text  # noqa: F401
    from .functions import udfs  # noqa: F401

    _loaded = True


# The round driver sweeps ``queries()`` in dict order and correctness-checks
# the first 50 entries only. This list pins that window explicitly: queries
# that have never received a driver correctness row, were changed this round,
# or are new, come first; long-green redundant-coverage queries rotate to the
# back (they stay regression-guarded by tests/test_oracle.py, which sweeps
# ALL oracle-backed queries locally). Names not listed here keep their
# registration order after the listed ones.
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked in round 1 (E23/E24/E26 surface) --
    "q35_shingle_fingerprint",
    "q36_minhash_lsh_neardup",
    "q37_ngram_jaccard_dup",
    "q38_simhash",
    "q39_multimodal_meta",
    "q40_cosine_topk",
    "q41_embedding_neardup",
    "q42_ann_lsh_topk",
    "q43_image_features",
    "q43b_ann_ivf_topk",
    "q54_pandas_udf_tokens",
    "q55_rowwise_udf_tokens",
    "q56_grouped_map_zscore",
    "q57_stratified_sample",
    "q58_pii_scrub",
    "q59_token_counting",
    # -- fixed or re-implemented this round (need fresh driver rows) --
    "q52_approx_percentiles",
    "q64_returned_items",
    "q31_top_tokens",
    # -- new in round 2 --
    "q23b_replay_scaled",
    "q67_left_outer_join",
    # q68_right_outer_join rotates out: VERDICT r01 item 6 asked for one
    # explicit outer-join row and q67 provides it; the right-outer mirror
    # stays locally oracle-swept.
    "q80_neardup_clusters",
    "q81_clean_corpus",
    "q82_token_rarity",
    "q84_decontamination",
    "q83_repetition_quality",
    "q85_hash_split",
    "q86_tfidf_keywords",
    "q87_sequence_packing",
    "q88_quota_sample",
    # -- core operator coverage: exactly ONE driver face per SURVEY §2.2 op.
    # Rotated-out second faces (q08 E9→q01, q11 E11→q10/q12, q18 E16→q17,
    # q21 E18→q20, q26/q27 stats→q52, q28 E11-family, q29 E17→q19,
    # q30 E25→q31/q83/q86, q60–q63 analytics) stay green under
    # tests/test_oracle.py, which sweeps ALL oracle-backed queries locally.
    "q01_pricing_summary",  # E1 scan + E9 hash agg (TPC-H Q1)
    "q02_filter_project",  # E4 + E5
    "q03_star_join_revenue",  # E6 inner star
    "q04_semi_join",  # E7
    "q05_anti_join",  # E7
    "q06_range_join",  # E8
    "q07_asof_join",  # E8
    "q09_distinct_users",  # E10
    # q10_rollup_orders rotates out: E11 keeps q12 (grouping sets is the
    # general form; rollup/cube are its special cases).
    "q12_grouping_sets",  # E11
    "q13_window_topk_per_group",  # E12
    "q14_window_analytic",  # E13
    "q15_top_global",  # E14
    "q16_set_ops",  # E15
    "q17_scalar_string_math",  # E16
    "q19_json_props",  # E17
    "q20_tumbling_window",  # E18
    "q22_session_window",  # E19
    "q23_stream_replay",  # E2 stream source face
    "q24_dedup_first",  # E21
    "q25_pending_antijoin",  # E22 (only face)
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
