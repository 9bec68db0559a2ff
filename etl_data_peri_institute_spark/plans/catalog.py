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
# ROUND-3 STATE: positions 1-13 are the TPC-H queries whose money
# outputs were rewritten to exact scaled integers this round (q10 was
# round 2's driver hash FAIL; the other 12 changed schema, so their
# r01/r02 green rows are stale). Positions 14-45 are the 32 names with
# no driver row in CORRECTNESS_r01 or _r02 (computed from the artifacts,
# not by hand). Positions 46-50 are the 5 round-3 additions with the
# riskiest determinism patterns; the rest of the round-3 additions and
# the plan-only changes sit past the window (see the inline comments).
_VERIFY_FIRST: list[str] = [
    # TPC-H money-output rewrite (13 — results re-keyed to exact integers)
    "q10_returned_items",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q14_promo_share",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q22_global_sales_opportunity",
    "q7_nation_volume",
    "q8_market_share",
    "q15_top_supplier",
    # never driver-verified (32 — r01 window overflow + round-2 additions)
    "a_bool_aggs",
    "j_cross_join",
    "u_scalar_pandas_softsign",
    "b_sessionize",
    "b_rfm_segmentation",
    "f_histogram_width_bucket",
    "f_datetime_math",
    "f_variant_json",
    "d_embedding_neardup",
    "d_pack_sequences",
    "b_stratified_sample",
    "a_heavy_hitters",
    "e_ivf_topk",
    "p_scd2_fold",
    "t_tfidf",
    "a_corr_matrix",
    "p_snapshot_diff",
    "a_profile_columns",
    "d_chunk_dedup",
    "t_bigram_lm",
    "t_filter_funnel",
    "p_data_contract_report",
    "d_embedding_dedup_apply",
    "j_recursive_cte",
    "j_null_safe_join",
    "j_interval_overlap",
    "j_asof_forward",
    "j_lateral_topk",
    "st_stream_dedup",
    "st_stream_stream_join",
    "ts_gap_fill_ffill",
    "ts_ohlc_hourly",
    # new this round — the driver window is EXACTLY 50 rows and the 45
    # entries above are non-negotiable (13 re-keyed outputs + the 32 the
    # round-2 verdict requires rows for), so only 5 of the 10 round-3
    # additions fit. These 5 carry the riskiest cross-engine determinism
    # patterns (percentile_cont interpolation, percent_rank windows, the
    # Arrow UDTF surface, the EXISTS-as-window-counts collapse, the
    # 1-row-broadcast integer-threshold compare) — verify them first:
    "a_median_percentiles",
    "t_quality_percentile_filter",
    "u_udtf_chunk_documents",
    "q21_waiting_supplier_shape",
    "q11_important_stock",
    # --- driver window ends here (position 50) ---
    # Deferred to the round-4 window (local-strict-pass only this round;
    # their determinism patterns all have driver-green precedents:
    # q2/q9 use the same exact-integer money discipline as the 13 above,
    # b_grouped_split/d_incremental_dedup use b_hash_sample's md5-hex
    # pattern (driver-green r01), b_temperature_mixture uses
    # b_stratified_sample's rate pattern (in the 32 above)):
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "b_grouped_split",
    "d_incremental_dedup",
    "b_temperature_mixture",
    "f_try_arithmetic",
    "u_arrow_batch_stats",
    # plan-only changes round 3 (hint removal / filter reorder — outputs
    # identical to their driver-green r01/r02 rows):
    "w_topk_orders_per_customer",
    "st_stream_static_join",
    "q16_supplier_part_counts",
    "q20_excess_inventory_suppliers",
    "q13_order_count_distribution",
]
# NEXT-WINDOW QUEUE (rebuild _VERIFY_FIRST from the next CORRECTNESS
# artifact when it lands): every name above that received a green row
# drops out; the round-4 additions (j_fuzzy_join_blocked,
# j_fuzzy_resolve_rows, t_inverted_index, t_gopher_quality_rules,
# b_weighted_sample, f_winsorized_stats, t_doc_perplexity,
# g_pagerank_suppliers, b_conversion_funnel, a_robust_outliers,
# f_equidepth_histogram) and round-5 additions (e_sq_int8_topk,
# ts_interpolate_linear, d_cluster_representative, f_max_by_min_by,
# d_containment_pairs, w_activity_streaks, b_shard_manifest,
# d_simhash_hamming_pairs, e_ivf_sq_topk) — all local-strict-pass only
# — take the freed slots, riskiest determinism patterns first
# (g_pagerank's rounded-double ordering, t_doc_perplexity's float
# cross-entropy, f_winsorized_stats, ts_interpolate_linear's blend).


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
