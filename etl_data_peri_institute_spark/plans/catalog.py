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
# ROUND-6 STATE: CORRECTNESS_r05 landed 50/50 oracled greens (its rows
# were exactly r5's window), so the union of driver greens r01-r05
# covers 231 of 241 prior registrations + the 2 rows-only-by-design
# rows (m_multimodal_features, a_approx_sketches, evidence r02/r04).
# This round's window, per the round-5 verdict item 1:
#   1-8   the 8 names never driver-verified (r5 overflow; all pass the
#         local full-precision replay),
#   9-50  the 42 NET-NEW gate queries (span-dedup pair, the three
#         distributed-cumsum production variants, the per-source
#         budget pair, and the round-6 continuation batches 1-6:
#         segment dedup pair / boilerplate prefix / quantile
#         normalization / length bucketing / source-overlap matrix /
#         epoch-shuffle pin+production pair / k-means fit / CDC
#         chunking pair / corpus card / Bloom membership dedup /
#         Markov transitions / BPE pair scan / A/B readout / LPA
#         communities / RAG chunk manifest / session paths / column
#         entropy / Matryoshka report / PCA power iteration /
#         freshness / power analysis / LSH band sweep / holdout
#         leakage / CUPED / EMD drift / langid confusion / snaive
#         backtest+anomaly / dedup funnel / bootstrap CI / jackknife /
#         IVF nprobe sweep -- the driver, not just pytest, certifies
#         each; exactly fills the 50-row window with the 8 backlog
#         names),
#   51+   all backfill overflows to next round (every overflow name
#         carries r01 driver evidence + this round's both-SF strict
#         local replay).
_VERIFY_FIRST: list[str] = [
    # ---- never driver-verified (r5 positions 51-58)
    "b_new_vs_returning",
    "b_rolling_active_users",
    "b_last_touch_attribution",
    "a_partial_agg_merge",
    "a_bitmap_active_days",
    "t_code_detect",
    "t_duplicated_ngram_report",
    "f_url_parse",
    # ---- NET-NEW gate queries this round
    "d_span_dedup_ranges",        # merged duplicated-span coordinates
    "d_span_dedup_apply",         # higher-order-function span cut
    "b_token_budget_production",  # cumsum.py vs global-window oracle
    "a_pareto_abc_production",    # cumsum.py vs global-window oracle
    "b_rfm_production",           # fused rank passes vs ntile oracle
    "b_source_token_budget",      # per-group budget, window pin
    "b_source_token_budget_production",  # grouped cumsum vs same oracle
    # ---- NET-NEW continuation operators (plans/round6b_ext.py)
    "d_segment_dedup_report",     # C4-style segment dedup, per-source rates
    "d_segment_dedup_apply",      # keep-first reassembly
    "t_boilerplate_prefix_report",  # per-source dominant prefix + share
    "t_quality_quantile_normalize",  # cross-source score calibration
    "b_length_bucketing",         # padding-waste report
    # ---- NET-NEW continuation operators, batch 2 (plans/round6c_ext.py)
    "d_source_overlap_matrix",    # cross-source segment Jaccard/containment
    "b_epoch_shuffle",            # deterministic epoch order, window pin
    "b_epoch_shuffle_production",  # grouped cumsum row-number twin
    "e_kmeans_fit",               # 2-iteration Lloyd, centroid FIT side
    # ---- NET-NEW continuation operators, batch 3 (plans/round6d_ext.py)
    "d_cdc_chunking",             # content-defined chunk report (FastCDC)
    "d_cdc_dedup_apply",          # insertion-robust keep-first apply
    "p_corpus_card",              # one-scan dataset card
    # ---- NET-NEW continuation operators, batch 4 (plans/round6e_ext.py)
    "d_bloom_dedup_report",       # distributed Bloom probe + FP accounting
    "b_markov_transitions",       # next-event transition matrix
    "t_bpe_pair_stats",           # first BPE merge-candidate scan
    "b_ab_experiment_report",     # hash-assigned A/B + pooled z
    # ---- NET-NEW continuation operators, batch 5 (plans/round6f_ext.py)
    "g_label_propagation",        # 2-round deterministic LPA communities
    "t_rag_chunk_manifest",       # overlapping sliding-window chunks
    "b_session_path_topk",        # ordered session path mining
    "a_column_entropy_report",    # per-column Shannon entropy profile
    # ---- NET-NEW continuation operators, batch 6 (plans/round6g_ext.py)
    "e_matryoshka_truncation_report",  # prefix-dim cosine/energy retention
    "e_pca_power_iteration",      # covariance build + 2 power iterations
    "p_freshness_report",         # per-feed arrival lag + staleness
    "b_power_analysis",           # two-proportion sample-size planning
    # ---- NET-NEW continuation operators, batch 7 (plans/round6h_ext.py)
    "d_minhash_band_sweep",       # recall/precision per LSH band config
    "b_holdout_leakage_check",    # cross-split near-dup leakage audit
    "b_cuped_adjusted_ab",        # CUPED variance-reduced readout
    "a_emd_drift",                # Wasserstein-1 drift per event type
    # ---- NET-NEW continuation operators, batch 8 (plans/round6i_ext.py)
    "t_langid_confusion",         # classifier eval vs labeled lang
    "ts_snaive_forecast_eval",    # seasonal-naive MAE/MAPE backtest
    "d_dedup_pipeline_funnel",    # raw -> exact -> near-dup survival
    "a_bootstrap_ci",             # deterministic Poisson bootstrap CI
    # ---- NET-NEW continuation operators, batch 9 (plans/round6j_ext.py)
    "e_ivf_nprobe_sweep",         # recall/cost curve over probe counts
    "a_jackknife_se",             # delete-a-group jackknife + influence
    "ts_snaive_anomaly",          # 2-sigma residual day flags
    # ---- NET-NEW continuation operators, batch 10 (plans/round6k_ext.py)
    # (positions 51+: outside this round's 50-row driver window — they
    # carry both-SF local-replay evidence and lead next round's window)
    "a_theil_sen_trend",          # median-of-slopes robust trend vs OLS
    "ts_autocorrelation_report",  # ACF at lags 1/2/7 per type
    "t_normalization_dedup_report",  # dup rates per canonical form
    # ---- NET-NEW continuation operators, batch 11 (plans/round6l_ext.py)
    # (positions 51+, same note as batch 10)
    "a_survival_km",              # right-censored Kaplan-Meier curve
    "p_partition_skew_planner",   # measured skew profile -> scale knobs
    # ---- NET-NEW continuation operators, batch 12 (plans/round6m_ext.py)
    # (positions 51+, same note as batch 10)
    "b_preference_pairs",         # per-source best-vs-worst DPO pairs
    "t_tokenizer_fertility",      # tokens/word + bytes/token per lang
    "b_curriculum_schedule",      # quality-tier stages + cum token frac
    # ---- NET-NEW continuation operators, batch 13 (plans/round6n_ext.py)
    # (positions 51+, same note as batch 10)
    "d_dup_cluster_size_dist",    # dup-cluster size histogram + shares
    "t_vocab_coverage_curve",     # token-mass coverage at vocab cutoffs
    "a_bh_fdr",                   # Benjamini-Hochberg step-up control
    "e_embedding_qa_report",      # norms/dims/zero-vector pre-flight
    # ---- r01-only evidence backfill, riskiest first: dedup/ANN/text
    # operators whose code paths moved most since round 1
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
    # ---- r01-only function/window surface
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
    # ---- r01-only parity rows (risk-ranked: consolidation union,
    # date-format fan-in)
    "p_union_consolidation",
    "p_flexible_date_parse",
    # ---- position 51+ (overflow; the 31 net-new round-6 slots above
    # push everything from t_fingerprint down here: the remaining
    # dedup/behavioral backfill, the f_*/w_* function-window surface
    # and the p_* parity projections — all carry r01 driver evidence +
    # this round's both-SF local replay; next round's window leads
    # with these)
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
# NEXT-WINDOW QUEUE (rebuild _VERIFY_FIRST from CORRECTNESS_r06 when it
# lands): every name above that received a green row drops out; promote
# FIRST the 25 overflow names (positions 51+ above, f_like_matrix
# through p_semi_join_valid_keys), THEN any
# query whose OUTPUT changed since its last green row, then continue
# backfilling the oldest evidence (after this round the floor is the
# r02 cohort: the TPC-H q* family, j_* join surface, st_* streaming
# batch queries, ts_ewma/ts_time_bucket_rollup, f_sql_macro etc.) so
# every row's evidence stays fresh against current code.


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
