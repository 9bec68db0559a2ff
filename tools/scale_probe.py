"""Measured scale validation: do the headline plans actually scale
near-linearly, or is there a hidden super-linearity the sf0.1 bench
can't see?

Builds FK-consistent synthetic N× copies of the sf0.1 tables (entity
keys offset per copy so joins stay 1:1 and groups multiply instead of
deepening; document words and embedding vectors are perturbed per copy
so the dedup/similarity operators don't see an artificial wall of
cross-copy duplicates), times a representative query slice at 1×/3×/10×,
and writes SCALE_PROBE.md with time-ratio vs data-ratio per query.

Writes only under /tmp (never /root/testdata). Usage:
    python tools/scale_probe.py           # build + probe + write report
    python tools/scale_probe.py --probe   # reuse existing /tmp copies
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/scale_probe"
FACTORS = [1, 3, 10]

# entity-key columns offset per copy (FK pairs share the same offset so
# referential integrity holds copy-locally); nation/region FK columns
# (c_nationkey, s_nationkey, n_regionkey) are left untouched — the
# bounded dims stay single-copy, exactly as a real 100 TB warehouse
# keeps 25 nations no matter how many facts it has.
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["nation", "region"]

QUERIES = [
    # scan + agg / join / window families
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q2_min_cost_supplier",
    "q21_waiting_supplier_shape",
    "w_topk_orders_per_customer",
    "b_sessionize",
    "j_asof_backward",
    # LLM-data families
    "d_exact_dedup",
    "d_incremental_dedup",
    "d_minhash_lsh_pairs",
    "d_ngram_jaccard_pairs",
    "t_quality_score",
    "e_lsh_buckets",
    # round-4 additions: iterative graph, blocked fuzzy join, index build
    "g_pagerank_suppliers",
    "j_fuzzy_join_blocked",
    "t_inverted_index",
    "b_conversion_funnel",
    # round-5 additions: SQ codes+search, spine interpolation, cluster pick
    "e_sq_int8_topk",
    "ts_interpolate_linear",
    "d_cluster_representative",
    # d_simhash_hamming_pairs is EXCLUDED deliberately: at 10x (500k
    # docs) the 16-bit fingerprint space is ~7.6 docs dense per exact
    # code, so the hamming-<=3 pair SET itself grows quadratically —
    # the probe measured the wall, not a plan defect. Fingerprint width
    # must grow with corpus size (64-bit xxhash64 in production, which
    # restores sparsity); the gate query pins 16-bit parity semantics.
    "e_ivf_sq_topk",
    "t_shingle_novelty",
    "b_dedup_rate_by_source",
    "j_asof_nearest",
    # driver-round-4 additions
    "j_band_join",
    "ts_ewma",
    "g_triangle_count",
    "t_contamination_check",
    "d_semdedup_prune",
    "t_url_canonical_dedup",
    "a_ks_drift",
    "a_psi_drift",
    "g_kcore_decomposition",
    "t_duplicated_ngram_report",
    "t_importance_weights",
    "b_last_touch_attribution",
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
    "e_pq_adc_topk",
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
    # round-6 additions: the distributed-cumsum production variants
    # (probe BOTH sides of each pair — the window form is the semantics
    # pin, the production form is the scale path; the gap between them
    # is the whole point of operators/cumsum.py) and the span-dedup pair
    "b_token_budget_production",
    "a_pareto_abc_production",
    "b_rfm_segmentation",
    "b_rfm_production",
    "d_span_dedup_ranges",
    "d_span_dedup_apply",
    "b_source_token_budget",
    "b_source_token_budget_production",
    # round-6 continuation: segment dedup pair, overlap matrix, epoch
    # schedule pair (window pin vs grouped cumsum), Lloyd fit,
    # quantile normalization
    "d_segment_dedup_report",
    "d_segment_dedup_apply",
    "d_source_overlap_matrix",
    "b_epoch_shuffle",
    "b_epoch_shuffle_production",
    "e_kmeans_fit",
    "t_quality_quantile_normalize",
    "b_length_bucketing",
    "t_boilerplate_prefix_report",
    "d_cdc_chunking",
    "d_cdc_dedup_apply",
    "p_corpus_card",
    # round-6 continuation batch 4: bounded-bitmap membership, bounded
    # matrix/vocabulary aggregates, one-row experiment readout
    "d_bloom_dedup_report",
    "b_markov_transitions",
    "t_bpe_pair_stats",
    "b_ab_experiment_report",
    # round-6 continuation batch 5: iterative LPA (edge-bounded),
    # map-only chunk manifest, single-shuffle path mining, 4-row
    # entropy profile
    "g_label_propagation",
    "t_rag_chunk_manifest",
    "b_session_path_topk",
    "a_column_entropy_report",
    # round-6 continuation batch 6-7: per-vector/covariance embedding
    # passes, the shared-signature LSH sweep, the cross-split leakage
    # audit (shingle-join bounded), 1-row experiment readouts
    "e_matryoshka_truncation_report",
    "e_pca_power_iteration",
    "d_minhash_band_sweep",
    "b_holdout_leakage_check",
    "b_cuped_adjusted_ab",
    "a_emd_drift",
    # round-6 continuation batch 8: cascade funnel (stage-shrinking),
    # B-row bootstrap shuffle, bounded-matrix/series evals
    "d_dedup_pipeline_funnel",
    "a_bootstrap_ci",
    "ts_snaive_forecast_eval",
    "t_langid_confusion",
    # round-6 continuation batch 9: shared-assignment probe sweep,
    # g-row jackknife arithmetic, bounded-series anomaly flags
    "e_ivf_nprobe_sweep",
    "a_jackknife_se",
    "ts_snaive_anomaly",
    # round-6 continuation batch 10: days^2 pairwise frame, bounded
    # series windows, pure-column-form distinct counts
    "a_theil_sen_trend",
    "ts_autocorrelation_report",
    "t_normalization_dedup_report",
    # round-6 continuation batch 11: bounded-support survival windows,
    # key-sized skew profile
    "a_survival_km",
    "p_partition_skew_planner",
    # round-6 continuation batch 12: co-partitioned rank pair join,
    # map-side-only fertility, 5-row curriculum frame
    "b_preference_pairs",
    "t_tokenizer_fertility",
    "b_curriculum_schedule",
    # round-6 continuation batch 13: hash-cluster histogram, vocab rank
    # fold, hypotheses-sized BH frame, per-row norm fold
    "d_dup_cluster_size_dist",
    "t_vocab_coverage_curve",
    "a_bh_fdr",
    "e_embedding_qa_report",
    # round-8: capacity-balanced IVF assignment (top-2 centroid pass +
    # per-list capacity window + contribution explode — the window
    # partitions by list, so 10x deepens lists, never a global sort)
    # and its recall twin (bounded query sample x corpus d2 frame)
    "e_ivf_balanced_assign",
    "e_ivf_balanced_recall",
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    from etl_data_peri_institute_spark.sources.tables import load_table

    for n in FACTORS:
        dest = f"{OUT}/x{n}"
        os.makedirs(dest, exist_ok=True)
        for t in SINGLE_COPY:
            load_table(spark, BASE, t).write.mode("overwrite").parquet(
                f"{dest}/{t}.parquet"
            )
        for t, keys in OFFSET_KEYS.items():
            # load_table normalizes the TIMESTAMP(NANOS) events column;
            # the written copies are then plain MICROS timestamps
            df = load_table(spark, BASE, t)
            offsets = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
            copies = []
            for i in range(n):
                c = df
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * offsets[k]))
                if t == "documents" and i > 0:
                    # disjoint word space per copy: near-dup structure is
                    # preserved WITHIN a copy, absent ACROSS copies — the
                    # realistic shape for a larger crawl
                    pfx = f"c{i}_"
                    c = c.withColumn(
                        "text",
                        F.concat(
                            F.lit(pfx),
                            F.regexp_replace(F.col("text"), " ", f" {pfx}"),
                        ),
                    )
                if t == "embeddings" and i > 0:
                    # small deterministic per-copy rotation-ish shift keeps
                    # vectors valid but not identical across copies
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            "embedding", lambda x: (x + F.lit(i * 1e-3)).cast("float")
                        ),
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
            out.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
        print(f"built {dest}")


def probe(spark, only: list[str] | None = None) -> list[tuple[str, dict[int, float]]]:
    from etl_data_peri_institute_spark.plans import catalog

    catalog.load_all()
    rows = []
    for name in only if only is not None else QUERIES:
        fn = catalog.QUERIES[name].fn
        times: dict[int, float] = {}
        for n in FACTORS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, f"{OUT}/x{n}").collect()
                best = min(best, time.perf_counter() - t0)
            times[n] = round(best, 3)
        rows.append((name, times))
        print(name, times)
    return rows


# round-5: the then-worst 10x ratios (j_salted_skew_join 4.5,
# g_kcore_decomposition 4.4, ts_interpolate_linear 4.4, b_sessionize
# 4.3). Round 6 fixed g_kcore's 6.2 GB pair-build spill (adaptive
# pair-stage parallelism; 10x now ~10 s, zero spill) — kept on the
# watchlist to pin the fix.
SPILL_QUERIES = [
    "j_salted_skew_join",
    "g_kcore_decomposition",
    "ts_interpolate_linear",
    "b_sessionize",
    # round-6 continuation: the new pair-enumeration / explode-heavy
    # entries join the watchlist
    "g_supplier_similarity",
    "g_label_propagation",
    "d_minhash_band_sweep",
    "b_holdout_leakage_check",
    "a_bootstrap_ci",
    # round-7: the new pair/explode-heavy entries
    "d_semdedup_report",
    "t_repetition_ratio",
    "e_ivf_pq_topk",
    "g_community_modularity",
    "t_doc_entropy_filter",
    # round-8 continuation: the incremental probes (band/bucket joins +
    # shingle/signature explodes) and the adaptive salted join
    "d_incremental_lsh_dedup",
    "j_planned_skew_join",
    "d_embedding_neardup_incremental",
    "d_embedding_neardup_incremental_pin",
    # round-8 second continuation: the PQ-position explodes of the
    # cost frontier's shared construction, and the incremental IVF pass
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


def spill_probe() -> None:
    """Shuffle-spill telemetry for the worst scale-ratio entries: is the
    super-linear 10x step sort-spill (expected once per-partition sorts
    exceed execution memory — AQE/partition-count absorbs it on a real
    cluster) or a plan defect? Runs each query at 1x/10x in a UI-enabled
    session and sums the executed stages' memory/disk spill from the
    status REST API. Appends a section to SCALE_PROBE.md."""
    import json as _json
    import urllib.request

    from etl_data_peri_institute_spark.plans import catalog
    from etl_data_peri_institute_spark.session import get_spark

    spark = get_spark("spill-probe", extra_conf={"spark.ui.enabled": "true"})
    catalog.load_all()
    ui = spark.sparkContext.uiWebUrl

    def _stages():
        apps = _json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
        app = apps[0]["id"]
        return _json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )

    lines = [
        "",
        "## Spill telemetry (worst 10x ratios)",
        "",
        "Per-query sums over the stages each run executed (status REST",
        "API, `memoryBytesSpilled` / `diskBytesSpilled`), for the",
        "worst time ratios above. Interpretation: spill onset at 10x =",
        "memory sizing (more partitions/executor memory absorbs it);",
        "zero spill = the growth is in-partition sort/window CPU cost",
        "(n log n) plus fixed overhead no longer amortizing — a plan",
        "property, benign while the ratio stays under the linear bound.",
        "",
        "Round-5 finding: g_kcore_decomposition's 10x run spilled 6.2 GB",
        "and took 60.7 s because its SF-adaptive edge budget (5x supplier",
        "count) was a COLUMN bound (crossJoin'd count), so the rank-limit",
        "pushdown could not fire and the full 5M-row pair frame",
        "single-partition-sorted. Fixed twice over: the budget is now a",
        "literal (plans/round4_ext.py) and session.py raises",
        "spark.sql.optimizer.windowGroupLimitThreshold (default 1000) to",
        "1M so SF-adaptive budgets keep the bounded rewrite — the plan",
        "now shows TakeOrderedAndProject and NO single-partition",
        "exchange; 10x time fell 60.7 -> ~23 s. The residual ~6.2 GB",
        "memory spill is the map-side partial-agg hash map over the 5M",
        "distinct supplier pairs vs the 8g local driver heap — exactly",
        "the 'memory sizing' case above (identical bytes across runs; an",
        "executor-sized heap absorbs it, and the alternative — skipping",
        "partial agg — would shuffle 12M pre-agg rows instead).",
        "",
        "| query | factor | time s | spill mem MB | spill disk MB |",
        "|---|---|---|---|---|",
    ]
    for name in SPILL_QUERIES:
        fn = catalog.QUERIES[name].fn
        for n in (1, 10):
            seen = {s["stageId"] for s in _stages()}
            t0 = time.perf_counter()
            fn(spark, f"{OUT}/x{n}").collect()
            dt = time.perf_counter() - t0
            new = [s for s in _stages() if s["stageId"] not in seen]
            mem = sum(s.get("memoryBytesSpilled", 0) for s in new) / 1e6
            disk = sum(s.get("diskBytesSpilled", 0) for s in new) / 1e6
            lines.append(
                f"| {name} | {n}x | {round(dt, 3)} | {round(mem, 1)} | {round(disk, 1)} |"
            )
            print(name, n, round(dt, 3), round(mem, 1), round(disk, 1))
    md = Path("SCALE_PROBE.md")
    text = md.read_text()
    # replace ONLY the spill section, preserving anything after it
    # (targeted-probe addenda live below; round 7 lost them once to
    # the old to-EOF cut)
    cut = text.find("\n## Spill telemetry")
    tail = ""
    if cut != -1:
        rest = text[cut + 1:]
        nxt = rest.find("\n## ", rest.find("\n"))
        if nxt != -1:
            tail = rest[nxt + 1:]
        text = text[:cut] + "\n"
    out = text.rstrip("\n") + "\n" + "\n".join(lines) + "\n"
    if tail:
        out += "\n" + tail.rstrip("\n") + "\n"
    md.write_text(out)
    print("appended spill section to SCALE_PROBE.md")


def main() -> None:
    from etl_data_peri_institute_spark.session import get_spark

    if "--spill" in sys.argv:
        spill_probe()
        return
    spark = get_spark("scale-probe")
    only = None
    if "--only" in sys.argv:  # append-mode: probe a few names, reuse copies
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    if "--probe" not in sys.argv and only is None:
        build(spark)
    rows = probe(spark, only)
    if only is not None:
        lines = ["", "## Addendum (targeted probe, same copies)", ""]
        lines += ["| query | t(1x) s | t(3x) s | t(10x) s | ratio 10x |",
                  "|---|---|---|---|---|"]
        for name, t in rows:
            ratio = round(t[10] / t[1], 1) if t[1] else float("nan")
            lines.append(f"| {name} | {t[1]} | {t[3]} | {t[10]} | {ratio} |")
        with Path("SCALE_PROBE.md").open("a") as f:
            f.write("\n".join(lines) + "\n")
        print("appended addendum to SCALE_PROBE.md")
        return
    lines = [
        "# SCALE_PROBE — measured scaling, synthetic 3x / 10x of sf0.1",
        "",
        "`python tools/scale_probe.py` builds FK-consistent key-offset",
        "copies of the sf0.1 tables under /tmp/scale_probe (documents get",
        "disjoint per-copy word spaces, embeddings a per-copy shift, the",
        "bounded dims nation/region stay single-copy) and times each",
        "query end-to-end, best of 2, local[32]. `ratio` = t(10x)/t(1x);",
        "near-linear plans should show ratio <= ~10 (sub-linear is",
        "common while fixed per-query overhead still dominates at 1x).",
        "",
        "| query | t(1x) s | t(3x) s | t(10x) s | ratio 10x |",
        "|---|---|---|---|---|",
    ]
    for name, t in rows:
        ratio = round(t[10] / t[1], 1) if t[1] else float("nan")
        lines.append(f"| {name} | {t[1]} | {t[3]} | {t[10]} | {ratio} |")
    Path("SCALE_PROBE.md").write_text("\n".join(lines) + "\n")
    print("wrote SCALE_PROBE.md")


if __name__ == "__main__":
    main()
