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
# ROUND-8 STATE: CORRECTNESS_r07 landed 50/50 oracled greens; union of
# driver greens r01-r07 now covers ALL 323 prior registrations (total
# certification, confirmed by the round-7 verdict). The goal from here
# is FRESHNESS: no query's newest driver row older than ~3 rounds.
# Staleness census against CORRECTNESS_r01..r07 (tools in round-8
# notes): 40 names' newest green is r01, 35 names' is r02 — 75 stale.
# This round's ~50-row window:
#   1. round-8 net-new registrations and any query whose OUTPUT
#      changes in round 8 (inserted at the top as built),
#   2. the 40 r01-evidence names (risk-ranked: text/ANN/behavioral
#      paths first, then the f_*/w_* function-window surface, then the
#      p_* parity rows),
#   3. the first of the 35 r02-evidence names (TPC-H q* family, j_*
#      join surface, st_* streaming batch, set ops, a_* olap-agg
#      family); the overflow leads round 9.
_VERIFY_FIRST: list[str] = [
    # ---- NET-NEW round-8 gate queries (inserted as built)
    "e_compression_recall_matrix",  # OUTPUT CHANGED r8: +ivf_pq tier row
    "e_ivf_balanced_assign",        # skew-capped IVF assignment (round-8)
    "e_ivf_balanced_recall",        # recall cost of balancing (round-8)
    "d_incremental_lsh_dedup",      # batch-vs-corpus LSH probe (round-8)
    "j_planned_skew_join",          # per-key adaptive salting (round-8)
    "d_embedding_neardup_incremental",  # embedding tier of the probe (r8)
    "d_embedding_neardup_incremental_prod",  # selective-band twin (r8)
    "a_survival_km",  # OUTPUT CHANGED r8: exact centihour durations
    #   (sf0.1 replay caught a .xx5 cross-engine rounding boundary)
    "e_recall_cost_frontier",       # cost axis of the recall matrix (r8 cont.)
    "e_ivf_incremental_assign",     # ANN tier of the daily-ingest probe (r8 cont.)
    "e_ivf_staleness_recall",       # recall side of the refit dial (r8 cont.)
    # ---- r01-evidence refresh (newest driver row is round 1)
    "t_quality_score",
    "t_langid",
    "t_fingerprint",
    "t_token_count",
    "e_lsh_buckets",
    "m_binary_metadata",
    "b_hash_sample",
    "b_cohort_retention",
    "b_funnel_click_to_purchase",
    "u_grouped_zscore_pandas",
    "a_salted_skew_agg",
    "a_exact_percentile",
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
    # ---- r02-evidence refresh (overflow of the ~50 window leads r9)
    "q4_order_priority",
    "q12_shipmode_buckets",
    "q13_order_count_distribution",
    "q16_supplier_part_counts",
    "q20_excess_inventory_suppliers",
    "j_asof_backward",
    "j_exists_correlated",
    "j_full_outer",
    "j_not_in_anti",
    "j_range_join_band",
    "j_scalar_subquery",
    "a_cube_status_priority",
    "a_grouping_sets",
    "a_having_filter",
    "a_pivot_returnflag_linestatus",
    "a_rollup_region_nation",
    "a_stats_aggregates",
    "s_except_customers_no_orders",
    "s_intersect_customers",
    "s_intersect_except_all",
    "s_union_all_priorities",
    "st_session_window",
    "st_sliding_window",
    "st_stateful_user_totals",
    "st_stream_static_join",
    "st_streaming_tumbling",
    "st_tumbling_window",
    "t_normalize",
    "t_redact_pii",
    "t_repetition",
    "d_decontaminate",
    "d_levenshtein_candidates",
    "w_bounded_sliding_frame",
    "w_cume_dist_nth",
    "w_moving_avg_range_frame",
]
# NEXT-WINDOW QUEUE (rebuild from CORRECTNESS_r08 when it lands).
# Round 8's 50-row window = 12 net-new/changed (recall-matrix +ivf_pq
# tier, balanced assign + recall twin, survival-km centihour fix, the
# continuation's incremental near-dup probes ×3 + planned skew join,
# and the second continuation's recall/cost frontier + incremental
# IVF assign + staleness recall) + the first 38 of the 40 r01 names
# (the last two r01 names and all r02 names overflow). Round 9 leads
# with:
#   1. any round-8 name that did NOT land green,
#   2. any query whose OUTPUT changes in round 9,
#   3. round-9 net-new registrations,
#   4. the remaining ~28 r02-evidence names listed above (j_full_outer
#      onward), then the r03 cohort,
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
        round8_ext,
        round8b_ext,
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
