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
        prior = QUERIES.get(name)
        if prior is not None and prior.fn.__module__ != fn.__module__:
            # A silent overwrite once shadowed round-4b's e_pq_adc_topk
            # behind a later module's same-named query and broke its
            # tests — make name collisions loud at import time.
            raise ValueError(
                f"gate query name {name!r} already registered by "
                f"{prior.fn.__module__}; pick a distinct name"
            )
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
# ROUND-7 STATE: CORRECTNESS_r06 landed 50/50 oracled greens (exactly
# r6's window). Union of driver greens r01-r06: 283 of 295 prior
# registrations. This round's window, per the round-6 verdict:
#   1-12  the 12 names never driver-verified (batches 10-13; all
#         judge-replayed green in round 6 and re-replayed locally),
#   13-14 the 2 formerly rows-only queries whose OUTPUT changed this
#         round (m_multimodal_features / a_approx_sketches now carry
#         property-style hash oracles — fresh rows required),
#   15+   NET-NEW round-7 gate queries (inserted as built), then the
#         48-name r01-evidence backfill (dedup/ANN/text risk-ranked,
#         then the f_*/w_* function-window surface and p_* parity
#         rows; whatever overflows the 50-row window leads round 8).
_VERIFY_FIRST: list[str] = [
    # ---- never driver-verified (r6 batches 10-13; judge-green r6)
    "a_bh_fdr",
    "a_survival_km",
    "a_theil_sen_trend",
    "b_curriculum_schedule",
    "b_preference_pairs",
    "d_dup_cluster_size_dist",
    "e_embedding_qa_report",
    "p_partition_skew_planner",
    "t_normalization_dedup_report",
    "t_tokenizer_fertility",
    "t_vocab_coverage_curve",
    "ts_autocorrelation_report",
    # ---- output changed round 7: property-style hash oracles added
    "m_multimodal_features",
    "a_approx_sketches",
    # ---- NET-NEW round-7 gate queries
    "t_vocab_coverage_curve_production",  # distributed-rank crossover twin
    # round-7 batch 1 (plans/round7_ext.py): privacy + split hygiene
    "t_pii_scrub_report",         # per-source PII/blocklist exposure audit
    "t_pii_scrub_apply",          # redaction apply, scrubbed-bytes hash
    "t_repetition_ratio",         # duplicate-bigram quality statistic
    "b_kfold_assign",             # deterministic hash k-fold + balance
    # round-7 batch 2 (plans/round7b_ext.py): weighting/mixing/causal/robust
    "d_soft_dedup_weights",       # 1/cluster-size duplicate-aware weights
    "b_token_waterline",          # budget-exact water-filling allocation
    "b_did_estimator",            # difference-in-differences + pooled SE
    "a_winsorized_stats",         # p05/p95-clamped robust moments
    # round-7 batch 3 (plans/round7c_ext.py): PQ compression + STL-lite
    "e_pq_codebook",              # 4x16 PQ fit, assignment census
    "e_pq_fitted_adc_topk",              # asymmetric-distance top-k + exact d2
    "ts_seasonal_decompose",      # MA trend + DOW indices + strength
    # round-7 batch 4 (plans/round7d_ext.py): semantic dedup + guardrails
    "d_semdedup_report",          # cluster-scoped cosine near-dup census
    "t_doc_entropy_filter",       # per-doc unigram entropy filter
    "b_dedup_aware_mixture",      # effective-token temperature weights
    "b_ab_srm_check",             # sample-ratio-mismatch chi-square
    # round-7 batch 5 (plans/round7e_ext.py): IVF-PQ + ratio CI + modularity
    "e_ivf_pq_topk",              # pruned-lists ADC search (FAISS IVF,PQ)
    "a_ratio_metric_delta_ci",    # user-clustered ratio metric CI
    "g_community_modularity",     # Newman Q of the LPA partition
    # round-7 batch 6 (plans/round7f_ext.py): sequential/featurize/bars
    "b_sequential_mean_monitor",  # always-valid z path + first crossing
    "t_feature_hashing",          # signed hashing-trick featurization
    # round-7 batch 7 (plans/round7g_ext.py): multimodal hash-exact gates
    "m_audio_stats",              # PCM int16 stats via Arrow decode path
    "m_frame_sample_census",      # 1-to-many frame-sampling arithmetic
    # round-7 batch 8 (plans/round7h_ext.py): distributional + stratified
    "a_quantile_treatment_effect",  # per-quantile treat-control deltas
    "b_stratified_ate",           # activity-decile post-stratified ATE
    # round-7 batch 9 (plans/round7i_ext.py): binary quantization
    "e_binary_hamming_topk",      # sign-bit packing + Hamming top-k
    # round-7 batch 10 (plans/round7j_ext.py): capstone eval + balance
    "e_compression_recall_matrix",  # recall@10 per compression tier
    "a_covariate_balance",        # SMD across arms, |SMD|>0.1 flags
    # ---- r01-only evidence backfill (risk-ranked: dedup/ANN/text code
    # paths that moved most since round 1, then functions/windows/parity)
    "d_dedup_components",
    "d_dedup_apply",
    "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs",
    "d_exact_dedup",
    "d_simhash",
    "e_knn_bruteforce",
    "e_ivf_assign",
    "e_lsh_buckets",
    "t_quality_score",
    "t_langid",
    "t_fingerprint",
    "t_token_count",
    "b_hash_sample",
    "b_cohort_retention",
    "b_funnel_click_to_purchase",
    "u_grouped_zscore_pandas",
    "a_salted_skew_agg",
    "a_exact_percentile",
    "m_binary_metadata",
    "f_array_functions",
    "f_date_parts",
    "f_json_struct",
    "f_like_matrix",
    "f_map_functions",
    "f_null_handling",
    "f_regexp_extract",
    "f_unpivot_stack",
    "w_first_last_value",
    "w_lag_lead_user_events",
    "w_rank_dense_ntile",
    "w_running_revenue_per_supplier",
    "w_topk_orders_per_customer",
    "p_union_consolidation",
    "p_flexible_date_parse",
    "p_phone_country",
    "p_string_functions",
    "p_anti_join_fk_violations",
    "p_conditional_derivation",
    "p_distinct_keys",
    "p_duplicate_key_detection",
    "p_incremental_date_filter",
    "p_keep_last_dedup",
    "p_map_lookup_fallback",
    "p_null_count_per_column",
    "p_prefix_filter",
    "p_required_not_null_audit",
    "p_semi_join_valid_keys",
]
# NEXT-WINDOW QUEUE (rebuild from CORRECTNESS_r07 when it lands).
# This round's 50-row window = the 12 never-verified + the 2
# changed-output + the 24 round-7 net-new + the first 11 backfill
# names (d_dedup_components .. t_langid). Round 8 leads with:
#   1. any round-7 name that did NOT land green (expect none — all 50
#      replay green locally at sf0.01, the 27 round-7-touched also at
#      sf0.1),
#   2. any query whose OUTPUT changes in round 8 (new oracles/columns),
#   3. round-8 net-new registrations,
#   4. the 37 remaining r01-evidence backfill names (t_fingerprint,
#      t_token_count, b_hash_sample, b_cohort_retention,
#      b_funnel_click_to_purchase, u_grouped_zscore_pandas,
#      a_salted_skew_agg, a_exact_percentile, m_binary_metadata, the
#      f_*/w_* function-window surface, the p_* parity rows),
#   5. then the r02 cohort (TPC-H q* family, j_* join surface, st_*
#      streaming batch, ts_ewma / ts_time_bucket_rollup, f_sql_macro)
# so every row's evidence stays fresh against current code.


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
        round6_ext,
        round6b_ext,
        round6c_ext,
        round6d_ext,
        round6e_ext,
        round6f_ext,
        round6g_ext,
        round6h_ext,
        round6i_ext,
        round6j_ext,
        round6k_ext,
        round6l_ext,
        round6m_ext,
        round6n_ext,
        round7_ext,
        round7b_ext,
        round7c_ext,
        round7d_ext,
        round7e_ext,
        round7f_ext,
        round7g_ext,
        round7h_ext,
        round7i_ext,
        round7j_ext,
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
