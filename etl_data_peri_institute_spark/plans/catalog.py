"""Query catalog: the driver-facing registry of implemented operators.

Every operator claimed as done in SURVEY.md §2 (and every north-star
extension) registers here with:

- a Spark implementation ``(spark, sf_dir) -> DataFrame`` (DataFrame API
  or Spark SQL — Catalyst produces the same plan either way), and
- usually a DuckDB-runnable ANSI-SQL oracle string over the same parquet
  tables (``oracle=None`` for genuinely non-SQL-expressible operators —
  the driver then records a weaker rows-only check).

Output discipline (so the driver's order-insensitive value-hash compare
is stable across engines):

- every computed column is aliased identically in Spark and SQL;
- double-valued aggregates are ``round(...)``-ed the same way on both
  sides (sum order differs between engines by ~1 ulp; rounding absorbs it);
- integer-valued sums are cast to BIGINT on both sides (DuckDB's
  ``sum(int)`` is HUGEINT otherwise);
- top-k queries always carry a deterministic tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QueryDef] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query implementation (decorator)."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


# Driver-verification scheduling: the per-round CORRECTNESS artifact
# records the first ~50 entries of ``queries()`` in registration order.
# Queries that do not yet have a driver-verified green row — or whose
# OUTPUT changed since their last green row (prior evidence no longer
# covers the new code) — are listed here FIRST; everything else keeps
# its evidence from a prior round's artifact. Re-derive each round from
# the latest CORRECTNESS_r{N}.json.
# ROUND-4 STATE: CORRECTNESS_r03 was 50/50 green, so all 50 r03 names
# drop out. Positions 1-32 are the complete never-driver-verified list
# (union of r01/r02/r03 greens vs the 165-query registry); positions
# 33-50 are 18 of this round's 21 additions (riskier patterns inside
# the window); the 3 lowest-risk additions overflow to 51-53.
_VERIFY_FIRST: list[str] = [
    # ---- the 32 names with NO driver row in r01/r02/r03 (computed from
    # the artifacts; this is the round-3 verdict's "never verified" list,
    # complete). Riskiest cross-engine determinism patterns first:
    "g_pagerank_suppliers",     # rounded-double rank ordering
    "t_doc_perplexity",         # float cross-entropy accumulation
    "f_winsorized_stats",       # percentile clamp + float means
    "ts_interpolate_linear",    # fractional blend between spine points
    "d_simhash_hamming_pairs",  # nibble-band LSH + xor-popcount verify
    "e_ivf_sq_topk",            # float centroid scores pick probed lists (ADVICE)
    "e_sq_int8_topk",           # int8 quantization boundary rounding
    "j_asof_nearest",           # CHANGED r4: deterministic dup-ts tiebreak added
    "w_activity_streaks",
    "f_equidepth_histogram",
    "a_robust_outliers",
    "f_max_by_min_by",
    "d_containment_pairs",
    "d_cluster_representative", # plan changed r4 (CC checkpoint); output same
    "t_shingle_novelty",
    "b_dedup_rate_by_source",
    "b_shard_manifest",
    "t_inverted_index",
    "t_gopher_quality_rules",
    "b_weighted_sample",
    "b_conversion_funnel",
    "j_fuzzy_join_blocked",
    "j_fuzzy_resolve_rows",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "b_grouped_split",
    "d_incremental_dedup",
    "b_temperature_mixture",
    "f_try_arithmetic",
    "u_arrow_batch_stats",
    "m_multimodal_features",    # rows-only by design (media features)
    "a_approx_sketches",        # rows-only by design (sketch estimates)
    # ---- round-4 additions (driver row needed for each new operator)
    "p_pipeline_e2e",
    "t_contamination_check",
    "d_decontaminate_apply",
    "t_pii_detect",
    "ts_time_bucket_rollup",
    "ts_ewma",
    "ts_rolling_zscore_anomaly",
    "j_band_join",
    "g_triangle_count",
    "b_bootstrap_ci",
    "e_range_search",
    "p_pseudonymize_kanon",
    "d_semdedup_prune",
    "t_importance_weights",
    "t_url_canonical_dedup",
    "ts_period_over_period",
    "a_ks_drift",
    "a_psi_drift",
    # ---- position 51+ (overflow past the ~50-row driver window, lowest
    # risk first): pure parse_url/regex and integer-only plans — next
    # round's window leads with whatever misses this one
    "f_url_parse",
    "b_last_touch_attribution",
    "p_fd_violation_check",
    "t_duplicated_ngram_report",
    "g_kcore_decomposition",
    "d_lsh_recall_report",
    "e_ivf_recall_report",
    "st_streaming_drift_psi",
    "b_negative_sampling",
    "p_referential_integrity_report",
    "a_benford_first_digit",
    "ts_downsample_lttb",
    "t_code_detect",
    "ts_autocorr",
]
# NEXT-WINDOW QUEUE (rebuild _VERIFY_FIRST from CORRECTNESS_r04 when it
# lands): every name above that received a green row drops out; promote
# FIRST the round-4 overflow (positions 51+: f_url_parse,
# b_last_touch_attribution, p_fd_violation_check,
# t_duplicated_ngram_report, g_kcore_decomposition, d_lsh_recall_report,
# e_ivf_recall_report, st_streaming_drift_psi, b_negative_sampling),
# THEN the continuation-session names (plans/round4b_ext.py; 40 by
# session end —
# riskiest float patterns first: e_mmr_rerank, e_pq_adc_topk,
# a_ols_trend, e_nearest_centroid_eval, e_centroid_report,
# a_skewness_kurtosis, a_mannwhitney_u, a_welch_ttest,
# a_chi2_independence, t_cooccurrence_pmi, g_supplier_similarity,
# g_association_rules, ts_rolling_corr, a_gini_concentration,
# t_top_keywords_per_doc, then the integer-exact rest: p_cdc_apply,
# ts_cusum_changepoint, p_l_diversity, g_bipartite_projection,
# g_degree_distribution, ts_seasonal_baseline, a_pareto_abc,
# a_skew_report, a_partial_agg_merge, b_frequency_capping,
# b_new_vs_returning, p_table_checksum, b_reservoir_per_group,
# b_ab_lift_report, b_time_to_convert, b_rolling_active_users,
# j_salted_skew_join, j_interval_union, b_token_budget_selection,
# p_volume_anomaly, j_asof_tolerance, a_skewness_kurtosis, t_zipf_fit,
# e_pq_recall_report, b_abandonment_rate, a_bitmap_active_days —
# all replayed green at sf0.001/sf0.01/sf0.1 and
# the float patterns bit-identical across back-to-back runs) and
# any name still without a driver row, then any query whose OUTPUT
# changed since its last green row, then continue backfilling the
# remaining r01-only-evidence names (d_dedup_components, d_dedup_apply,
# d_minhash_lsh_pairs, d_ngram_jaccard_pairs, d_exact_dedup,
# e_knn_bruteforce, e_ivf_assign, e_lsh_buckets, t_quality_score,
# t_langid, t_fingerprint, b_hash_sample, u_grouped_zscore_pandas,
# a_salted_skew_agg, a_exact_percentile, f_* function surface, the p_*
# parity family, and the w_* window family).


def load_all() -> None:
    """Import every plan module so their @query registrations run, then
    order the registry so driver-unverified queries come first (the
    driver's correctness artifact truncates; see _VERIFY_FIRST)."""
    from . import (  # noqa: F401
        advanced,
        behavioral,
        entity,
        functions_surface,
        graphs,
        llmdata,
        llmdata_ext,
        parity,
        quality_ext,
        relational,
        round4_ext,
        round4b_ext,
        streaming_batch,
        textops,
        timeseries,
        tpch,
    )

    ordered = [n for n in _VERIFY_FIRST if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in ordered if n in snapshot})
