"""Regenerate SHUFFLES.md: per-headline-query counts of exchange
operators extracted from the INITIAL physical plans (no action is run,
so these are the pre-AQE plans Catalyst emits; AQE may coalesce or
convert exchanges at runtime) — the measured backing for SCALING.md's
shuffle-inventory claims. A hash exchange is a full shuffle of its
input; a broadcast exchange ships one (small) side to every executor; a
range exchange exists only under a global sort (ORDER BY on gate
output — absent in a production pipeline sink).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "p_keep_last_dedup",
    "d_exact_dedup",
    "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs",
    "d_embedding_neardup",
    "e_knn_bruteforce",
    "e_ivf_topk",
    "b_sessionize",
    "t_tfidf",
    "ts_gap_fill_ffill",
    "p_snapshot_diff",
    "a_heavy_hitters",
    "j_interval_overlap",
    "j_asof_backward",
    "q21_waiting_supplier_shape",
    "b_temperature_mixture",
    "t_quality_percentile_filter",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "b_grouped_split",
    "d_incremental_dedup",
    # round-4 additions
    "j_fuzzy_join_blocked",
    "t_inverted_index",
    "g_pagerank_suppliers",
    "b_conversion_funnel",
    "b_weighted_sample",
    "f_winsorized_stats",
    "t_doc_perplexity",
    # round-5 additions
    "e_sq_int8_topk",
    "ts_interpolate_linear",
    "d_cluster_representative",
    "d_containment_pairs",
    "w_activity_streaks",
    "b_shard_manifest",
    "f_max_by_min_by",
    "d_simhash_hamming_pairs",
    "e_ivf_sq_topk",
    "j_asof_nearest",
    # round-4 (this round) additions
    "t_contamination_check",
    "j_band_join",
    "ts_time_bucket_rollup",
    "ts_ewma",
    "ts_rolling_zscore_anomaly",
    "g_triangle_count",
    "e_range_search",
    "p_pseudonymize_kanon",
    "t_pii_detect",
    "b_bootstrap_ci",
    "d_semdedup_prune",
    "t_importance_weights",
    "t_url_canonical_dedup",
    "ts_period_over_period",
    "a_ks_drift",
    "a_psi_drift",
    "b_last_touch_attribution",
    "p_fd_violation_check",
    "t_duplicated_ngram_report",
    "g_kcore_decomposition",
    "d_lsh_recall_report",
    "e_ivf_recall_report",
    "st_streaming_drift_psi",
    "b_negative_sampling",
    # second-wave additions (round-4 continuation): stat tests reduce to
    # sketch-sized moment frames; graph projections bound pairs by the
    # basket/degree side; CDC + CUSUM are single-key window plans
    "a_mannwhitney_u",
    "p_cdc_apply",
    "ts_cusum_changepoint",
    "g_bipartite_projection",
    "g_supplier_similarity",
    "g_association_rules",
    "t_cooccurrence_pmi",
    "t_top_keywords_per_doc",
    "e_nearest_centroid_eval",
    "b_time_to_convert",
    "p_volume_anomaly",
    "e_pq_fitted_adc_topk",
    "b_rolling_active_users",
    "j_salted_skew_join",
    "a_pareto_abc",
    "b_reservoir_per_group",
    "e_mmr_rerank",
    "a_skewness_kurtosis",
    "b_token_budget_selection",
    "j_interval_union",
    "j_asof_tolerance",
    "t_zipf_fit",
    "e_pq_recall_report",
    "b_abandonment_rate",
    "a_bitmap_active_days",
    "b_cohort_ltv",
    "t_burstiness_report",
    "a_seasonality_strength",
    "a_mutual_information",
    # round-6 additions: span dedup + distributed-cumsum production
    "d_span_dedup_ranges",
    "d_span_dedup_apply",
    "b_token_budget_production",
    "a_pareto_abc_production",
    "b_rfm_production",
    # round-6 continuation: segment dedup, overlap matrix, epoch
    # schedule pair, Lloyd fit, quantile normalization
    "d_segment_dedup_report",
    "d_segment_dedup_apply",
    "d_source_overlap_matrix",
    "b_epoch_shuffle_production",
    "e_kmeans_fit",
    "t_quality_quantile_normalize",
    "d_cdc_chunking",
    "d_cdc_dedup_apply",
    "p_corpus_card",
    # round-6 continuation batches 4-10
    "d_bloom_dedup_report",
    "b_markov_transitions",
    "t_bpe_pair_stats",
    "b_ab_experiment_report",
    "g_label_propagation",
    "t_rag_chunk_manifest",
    "b_session_path_topk",
    "a_column_entropy_report",
    "e_matryoshka_truncation_report",
    "e_pca_power_iteration",
    "p_freshness_report",
    "b_power_analysis",
    "d_minhash_band_sweep",
    "b_holdout_leakage_check",
    "b_cuped_adjusted_ab",
    "a_emd_drift",
    "t_langid_confusion",
    "ts_snaive_forecast_eval",
    "d_dedup_pipeline_funnel",
    "a_bootstrap_ci",
    "e_ivf_nprobe_sweep",
    "a_jackknife_se",
    "ts_snaive_anomaly",
    "a_theil_sen_trend",
    "ts_autocorrelation_report",
    "t_normalization_dedup_report",
    # round-7 additions
    "t_pii_scrub_report",
    "t_pii_scrub_apply",
    "t_repetition_ratio",
    "b_kfold_assign",
    "d_soft_dedup_weights",
    "b_token_waterline",
    "b_did_estimator",
    "a_winsorized_stats",
    "e_pq_codebook",
    "ts_seasonal_decompose",
    "d_semdedup_report",
    "t_doc_entropy_filter",
    "b_dedup_aware_mixture",
    "b_ab_srm_check",
    "e_ivf_pq_topk",
    "a_ratio_metric_delta_ci",
    "g_community_modularity",
    "t_vocab_coverage_curve_production",
    "b_sequential_mean_monitor",
    "t_feature_hashing",
    "m_audio_stats",
    "m_frame_sample_census",
    "a_quantile_treatment_effect",
    "b_stratified_ate",
    "e_binary_hamming_topk",
    "e_compression_recall_matrix",
    "a_covariate_balance",
    # round-8 additions
    "e_ivf_balanced_assign",
    "e_ivf_balanced_recall",
    "d_incremental_lsh_dedup",
    "j_planned_skew_join",
    "d_embedding_neardup_incremental",
    "d_embedding_neardup_incremental_pin",
    # round-8 continuation additions
    "e_recall_cost_frontier",
    "e_ivf_incremental_assign",
    "e_ivf_staleness_recall",
    # round-9 lifecycle gates (two-day maintained-state replays)
    "d_lsh_band_lifecycle",
    "d_lsh_band_retraction",
    "e_ivf_quantizer_lifecycle",
    "e_ivf_quantizer_retraction",
    "d_embedding_band_lifecycle",
    "d_embedding_band_retraction",
    "d_exact_dedup_retraction",
    "e_ivf_quantizer_churn",
]


def main() -> None:
    import os

    from etl_data_peri_institute_spark.plans import catalog
    from etl_data_peri_institute_spark.session import get_spark

    catalog.load_all()
    spark = get_spark("shuffle-report")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rows = []
    for name in QUERIES:
        df = catalog.QUERIES[name].fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hash_ex = len(re.findall(r"Exchange hashpartitioning", plan))
        range_ex = len(re.findall(r"Exchange rangepartitioning", plan))
        bcast = len(re.findall(r"BroadcastExchange", plan))
        # r12 audit column: single-partition exchanges — a global
        # (unpartitioned) window or similar serial point in the plan.
        # Bounded-input ones are fine (see the audit table below the
        # inventory); a NEW nonzero on a data-sized frame is a
        # regression to catch in review.
        single = len(re.findall(r"Exchange SinglePartition", plan))
        cartesian = "yes" if "CartesianProduct" in plan else "no"
        # iterative operators end in an eager localCheckpoint: their
        # returned plan is a checkpoint scan, so the per-iteration
        # exchanges ran during plan construction and are invisible here
        truncated = "Scan ExistingRDD" in plan and hash_ex + range_ex + bcast == 0
        rows.append((name, hash_ex, range_ex, bcast, single, cartesian, truncated))

    out = [
        "# SHUFFLES — exchange inventory of the executed plans",
        "",
        "Generated by `python tools/shuffle_report.py` (initial physical",
        "plans at sf0.001; AQE may further coalesce or convert at runtime).",
        "Hash exchanges are the real data movers at 100 TB; range exchanges",
        "come from the gate's deterministic ORDER BY (a production sink",
        "drops them); broadcast exchanges ship small sides only.",
        "",
        "| query | hash exchanges | range (sort) | broadcasts | 1-part exch | cartesian |",
        "|---|---|---|---|---|---|",
    ]
    for name, h, r, b, s, c, trunc in rows:
        if trunc:
            out.append(f"| {name} | (checkpoint-truncated)* | | | | {c} |")
        else:
            out.append(f"| {name} | {h} | {r} | {b} | {s} | {c} |")
    out += [
        "",
        "Notes:",
        "- *checkpoint-truncated: iterative operators (PageRank,",
        "  connected components) materialize through an eager",
        "  localCheckpoint, so the returned plan is a checkpoint scan and",
        "  the per-iteration exchanges are not in this static count. Their",
        "  shuffle inventory is documented at the operator: two edge-keyed",
        "  hash exchanges per iteration with map-side combine",
        "  (operators/graph.py, operators/components.py).",
        "- Counts are STATIC subtree counts; Spark's ReuseExchange + AQE",
        "  dedupe identical exchanges at runtime, so repeated subtrees",
        "  move data once, not once per count; e_ivf_topk's centroid",
        "  subtree is additionally computed once per action via a lazy",
        "  localCheckpoint.",
        "- The `*_recall_report` evaluation queries run BOTH the",
        "  production path and its exact-truth twin and compare — their",
        "  static counts are the sum of two whole pipelines by design;",
        "  at scale the truth side runs on a sample.",
        "- `jaccard_pairs` (round-3 rework) carries per-doc set sizes as",
        "  a window count, so the shingle frame feeds only the two",
        "  identical self-join sides — ReuseExchange serves both from one",
        "  shuffle write; no persist/cache needed to be single-scan.",
        "- `e_mmr_rerank`'s large static count is the 5 unrolled greedy",
        "  steps referencing the eagerly-checkpointed candidate/pair",
        "  frames (<= 20 / 380 rows): every one of those exchanges moves",
        "  a bounded handful of rows — the corpus-scale relevance scan",
        "  happens ONCE, before the checkpoint (see the operator",
        "  docstring; 177 s -> 15 s measured when the truncation landed).",
        "- the sweep queries (`d_minhash_band_sweep`,",
        "  `e_ivf_nprobe_sweep`) have sum-of-configs static counts by",
        "  design: one shared signature/assignment frame (eagerly",
        "  checkpointed) feeds 3 per-config pipelines whose extra",
        "  exchanges move candidate- or count-sized frames; the",
        "  corpus-scale pass happens once. Same reading for the",
        "  1-row-aggregate crossJoin attachments on the stats queries",
        "  (`a_bootstrap_ci`, `a_jackknife_se`, `b_cuped_adjusted_ab`):",
        "  broadcast exchanges of single rows.",
        "",
        "## Single-partition window audit (r12 verdict item 5)",
        "",
        "Every `W.orderBy(...)` without `partitionBy` in gate paths,",
        "classified by what the window's INPUT frame scales with. A",
        "global window moves its whole input to one task, so only",
        "bounded or twinned ones are acceptable. `1-part exch` above",
        "counts these per plan (a WindowGroupLimit'd top-k still shows",
        "one, but only ~tasks x k rows reach it).",
        "",
        "| site | query | window input | class |",
        "|---|---|---|---|",
        "| stats.py a_pareto_abc | a_pareto_abc | part dimension | SPEC-VARIANT; distributed twin a_pareto_abc_production (cumsum) |",
        "| behavioral.py ntile x3 | b_rfm_segmentation | customer dimension | SPEC-VARIANT; distributed twin b_rfm_production (cumsum) |",
        "| curation.py quality order | b_token_budget_selection | documents | SPEC-VARIANT; distributed twin b_token_budget_production (cumsum) |",
        "| textops.py _vocab_curve | t_vocab_coverage_curve | vocabulary | SPEC-VARIANT; same function's distributed=True path (cumsum) is t_vocab_coverage_curve_production |",
        "| llmdata_ext.py ntile(8) | b_shard_manifest | documents | SPEC-VARIANT; production write is repartitionByRange (sinks.write_sharded_corpus), docstring documents the pairing |",
        "| quality_ext.py ntile(8) | f_equidepth_histogram | lineitem rows | DATA-SIZED, exactness baseline BY DESIGN; scale path documented in docstring: approx_percentile cuts + broadcast compare |",
        "| stats.py gini rank | a_gini_concentration | customer dimension | DATA-SIZED (dimension); no twin — Σ(i·xi) needs the global rank; the cumsum operator is the drop-in at 1e9+ customers (documented here) |",
        "| causal.py ntile strata | b_stratified_ate | user dimension | DATA-SIZED (dimension); no twin — ntile_from_rank + global_row_number (operators/cumsum.py) is the drop-in at scale (documented here) |",
        "| stats.py mann-whitney | a_mannwhitney_u | distinct rounded cents | VALUE-DOMAIN-SIZED (collapses duplicates first); bounded by the value grid, not rows |",
        "| stats.py skew top-N | p_partition_skew_planner | key-frequency frame | bounded: WindowGroupLimit top-N over key counts |",
        "| quality_ext.py profile rank | a_column_entropy_report etc. | key-count frame | key-dimension; docstring names the cumsum row-number as the 1e9-key fallback |",
        "| textops.py zipf rank | t_zipf_fit | freq-filtered vocab | bounded: min-freq floor + rk<=top (WindowGroupLimit) |",
        "| ann.py ADC rank | e_pq_fitted_adc_topk | corpus ADC frame | was DATA-SIZED (.limit after window blocked WindowGroupLimit); FIXED r12 — rank<=k filter re-enables the partial limit |",
        "| graphs.py edge budgets x3 | g_triangle_count / g_kcore / LPA | pair-weight frame | bounded: literal budgets keep WindowGroupLimit (round-5/6 discipline) |",
        "| timeseries.py lttb lag/lead | ts_lttb_downsample | bucket stats | bounded: <= _LTTB_BUCKETS rows |",
        "| stats.py bootstrap rank | a_bootstrap_ci | B resample means | bounded: _BOOT_B rows |",
        "| stats.py survival cum | a_kaplan_meier family | duration buckets | bounded: hour-bucket domain |",
        "| stats.py BH rank | multiple-testing report | per-event-type p-values | bounded: event-type domain |",
        "| curation.py tier/waterline/source | t_gopher stages, b_token_waterline, mixtures | tier/source totals | bounded: tier and source domains |",
        "| graphs.py modularity fold | g_community_modularity | community frame | bounded: communities of a 500-edge graph |",
        "| similarity.py kmeans seed | e_kmeans_fit etc. | k seed rows | bounded: k rows |",
        "",
        "Rule the audit enforces: a data-sized global window is only",
        "acceptable as the ORACLE-PINNED spec variant of a gate whose",
        "production twin ranks via operators/cumsum.py (or an",
        "equivalent distributed mechanism named in its docstring).",
    ]
    Path(__file__).resolve().parent.parent.joinpath("SHUFFLES.md").write_text(
        "\n".join(out) + "\n"
    )
    print(f"wrote SHUFFLES.md ({len(rows)} queries)")


if __name__ == "__main__":
    main()
