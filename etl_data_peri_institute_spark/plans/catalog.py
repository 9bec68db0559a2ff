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
# Queries that do not yet have a driver-verified green row are listed
# here FIRST (most-urgent first); everything else keeps its evidence
# from a prior round's artifact. Re-derive each round from the latest
# CORRECTNESS_r{N}.json.
# ROUND-3 NOTE: after CORRECTNESS_r02 lands, everything in this list up
# to position 50 has a driver row (r02) and positions 1-50 of round 1
# retain theirs (r01). Rebuild this list for round 3 from the names
# still without any driver-green row: the two overflow entries below
# (a_bool_aggs, j_cross_join) plus every round-2 addition —
# d_embedding_neardup, d_pack_sequences, b_stratified_sample,
# a_heavy_hitters, p_scd2_fold, e_ivf_topk, st_stream_dedup,
# b_sessionize, t_tfidf, a_corr_matrix, p_snapshot_diff,
# st_stream_stream_join, ts_gap_fill_ffill, ts_ohlc_hourly,
# j_recursive_cte, a_profile_columns, f_histogram_width_bucket,
# d_chunk_dedup, j_null_safe_join, j_interval_overlap, j_asof_forward,
# u_scalar_pandas_softsign, t_bigram_lm, b_rfm_segmentation,
# t_filter_funnel, p_data_contract_report, f_datetime_math,
# f_variant_json, j_lateral_topk.
_VERIFY_FIRST: list[str] = [
    # round-1 `err` rows (array-output fix) — must flip green this round
    "m_multimodal_features",
    "a_approx_sketches",
    # TPC-H suite (18)
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q4_order_priority",
    "q12_shipmode_buckets",
    "q14_promo_share",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q7_nation_volume",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    "q13_order_count_distribution",
    "q8_market_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_excess_inventory_suppliers",
    # streaming surface (6)
    "st_tumbling_window",
    "st_sliding_window",
    "st_session_window",
    "st_streaming_tumbling",
    "st_stateful_user_totals",
    "st_stream_static_join",
    # textops part 2 (5)
    "t_normalize",
    "d_decontaminate",
    "t_repetition",
    "t_redact_pii",
    "d_levenshtein_candidates",
    # join / set / agg / window surface not covered by round 1 (19)
    "j_exists_correlated",
    "j_not_in_anti",
    "j_scalar_subquery",
    "j_full_outer",
    "j_range_join_band",
    "j_asof_backward",
    "s_union_all_priorities",
    "s_intersect_customers",
    "s_except_customers_no_orders",
    "s_intersect_except_all",
    "a_rollup_region_nation",
    "a_cube_status_priority",
    "a_grouping_sets",
    "a_pivot_returnflag_linestatus",
    "a_stats_aggregates",
    "a_having_filter",
    "w_moving_avg_range_frame",
    "w_cume_dist_nth",
    "w_bounded_sliding_frame",
    # positions 51-52 (overflow — next round's window; test-pinned meanwhile)
    "a_bool_aggs",
    "j_cross_join",
]


def load_all() -> None:
    """Import every plan module so their @query registrations run, then
    order the registry so driver-unverified queries come first (the
    driver's correctness artifact truncates; see _VERIFY_FIRST)."""
    from . import (  # noqa: F401
        advanced,
        behavioral,
        functions_surface,
        llmdata,
        llmdata_ext,
        parity,
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
