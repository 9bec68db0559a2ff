"""Regenerate EXPLAINS.md: formatted physical plans for key queries —
the evidence that pushdown/broadcast/top-k/partial-agg properties hold
(same properties tests/test_plan_quality.py asserts)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHOW = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "p_semi_join_valid_keys",
    "p_keep_last_dedup",
    "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs",
    "e_knn_bruteforce",
    "st_tumbling_window",
    # round-2 additions
    "e_ivf_topk",
    "b_sessionize",
    "t_tfidf",
    "p_snapshot_diff",
    "ts_gap_fill_ffill",
    # round-3 additions
    "q2_min_cost_supplier",
    "q11_important_stock",
    "d_incremental_dedup",
    # round-4 additions
    "j_fuzzy_join_blocked",
    "g_pagerank_suppliers",
    "t_inverted_index",
    # round-5 additions
    "e_sq_int8_topk",
    "ts_interpolate_linear",
    "e_ivf_sq_topk",
    "j_asof_nearest",
    # this round's additions
    "t_contamination_check",
    "j_band_join",
    "ts_time_bucket_rollup",
    "ts_ewma",
    "g_triangle_count",
    "e_range_search",
    "a_ks_drift",
    "g_kcore_decomposition",
    "t_duplicated_ngram_report",
    "b_conversion_funnel",
    # second-wave additions (round-4 continuation)
    "a_mannwhitney_u",
    "p_cdc_apply",
    "ts_cusum_changepoint",
    "g_supplier_similarity",
    "g_association_rules",
    "t_cooccurrence_pmi",
    "e_nearest_centroid_eval",
    "e_pq_adc_topk",
    "b_rolling_active_users",
    "j_salted_skew_join",
    "a_pareto_abc",
    "e_mmr_rerank",
    "a_skewness_kurtosis",
    "b_token_budget_selection",
    "j_interval_union",
    "j_asof_tolerance",
    "t_zipf_fit",
    "e_pq_recall_report",
    "b_abandonment_rate",
    "a_bitmap_active_days",
    "t_burstiness_report",
    "a_seasonality_strength",
    "a_mutual_information",
    # round-6 additions: span dedup + distributed-cumsum production
    "d_span_dedup_ranges",
    "d_span_dedup_apply",
    "b_token_budget_production",
    "b_rfm_production",
    # round-6 continuation: segment dedup, overlap matrix, epoch
    # schedule (grouped-cumsum), Lloyd fit
    "d_segment_dedup_apply",
    "t_quality_quantile_normalize",
    "d_source_overlap_matrix",
    "b_epoch_shuffle_production",
    "e_kmeans_fit",
    "d_cdc_dedup_apply",
    "p_corpus_card",
    # round-6 continuation batches 4-10: bounded-bitmap membership,
    # edge-bounded LPA, covariance power iteration, shared-signature
    # sweep, stage-shrinking funnel, B-row bootstrap, days^2 trend
    "d_bloom_dedup_report",
    "g_label_propagation",
    "e_pca_power_iteration",
    "d_minhash_band_sweep",
    "b_holdout_leakage_check",
    "d_dedup_pipeline_funnel",
    "a_bootstrap_ci",
    "e_ivf_nprobe_sweep",
    "a_theil_sen_trend",
    # round-7 additions
    "e_ivf_pq_topk",
    "e_pq_fitted_adc_topk",
    "d_semdedup_report",
    "d_soft_dedup_weights",
    "t_repetition_ratio",
    "b_sequential_mean_monitor",
    "m_audio_stats",
    # round-8 additions
    "e_ivf_balanced_assign",
    "e_ivf_balanced_recall",
    "e_compression_recall_matrix",
    "d_incremental_lsh_dedup",
    "j_planned_skew_join",
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


def _normalize(plan: str) -> str:
    """Renumber the SESSION-GLOBAL counters in a formatted plan —
    attribute exprIds (``#123``) and exchange ``plan_id=456`` — to
    per-plan sequence numbers (first appearance order). Without this,
    adding ONE query to SHOW shifts every later query's ids, and a
    regeneration diffs ~24k lines of pure renumbering that buries any
    real plan flip (round-9 verdict item 8). The renumbering is a
    bijection within one plan, so structural identity and structural
    change are both preserved exactly."""
    import re

    ids: dict[str, str] = {}

    def sub_expr(m: re.Match) -> str:
        return ids.setdefault(m.group(0), f"#{len(ids) + 1}")

    plan = re.sub(r"#\d+", sub_expr, plan)
    pids: dict[str, str] = {}

    def sub_plan(m: re.Match) -> str:
        return pids.setdefault(m.group(1), f"plan_id={len(pids) + 1}")

    return re.sub(r"plan_id=(\d+)", sub_plan, plan)


def main() -> None:
    from etl_data_peri_institute_spark.plans import catalog
    from etl_data_peri_institute_spark.session import get_spark

    catalog.load_all()
    spark = get_spark("explain-report")
    sf = "/root/testdata/sf0.1"
    out = [
        "# EXPLAINS — physical plans of key queries (sf0.1, local[32])",
        "",
        "Generated by `python tools/explain_report.py`. What to look for:",
        "`PushedFilters`/`ReadSchema` (scan pushdown + pruning),",
        "`BroadcastHashJoin` (no dim shuffles), `TakeOrderedAndProject`",
        "(top-k without global sort), `partial_*` aggregates (map-side",
        "combine), `AdaptiveSparkPlan` (AQE re-planning). Attribute ids",
        "(`#N`) and `plan_id`s are renumbered per plan so regenerating",
        "the dossier diffs only the plans that actually changed. Known",
        "benign residual: p_corpus_card's multi-distinct Expand orders",
        "its distinct groups by JVM attribute hash (fresh JVM per regen",
        "→ occasional ~10-line flip in that one plan; Catalyst-internal,",
        "same structure).",
        "",
    ]
    import contextlib
    import io

    for name in SHOW:
        df = catalog.QUERIES[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", "```", _normalize(buf.getvalue().strip()), "```", ""]
    Path("EXPLAINS.md").write_text("\n".join(out))
    print(f"wrote EXPLAINS.md ({len(SHOW)} plans)")


if __name__ == "__main__":
    main()
