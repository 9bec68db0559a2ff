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
# Goal since round 7: FRESHNESS — no query's newest driver row older
# than ~3 rounds (union of r01..r08 greens already certifies all 332).
# ROUND-9 STATE: CORRECTNESS_r08 landed 50/50 oracled greens (the 12
# round-8 net-new/changed names plus the first 38 r01-evidence names).
# Staleness census against CORRECTNESS_r01..r08: exactly 36 names'
# newest driver green is r01/r02 (1 at r01: p_semi_join_valid_keys;
# 35 at r02). 36 + round-9 net-new < 50, so this window FINISHES the
# freshness program — after it lands, no registered query's newest
# driver row is older than ~3 rounds and the rotation becomes pure
# maintenance. This round's window:
#   1. round-9 net-new registrations and any query whose OUTPUT
#      changes in round 9 (inserted at the top as built),
#   2. the 1 r01-evidence name, then the 35 r02-evidence names
#      (TPC-H q* family, j_* join surface, st_* streaming batch,
#      set ops, a_* olap-agg family, t_*/d_* text-dedup, w_* frames).
_VERIFY_FIRST: list[str] = [
    # ---- NET-NEW / OUTPUT-CHANGED round-9 gate queries (as built)
    "d_lsh_band_lifecycle",         # two-day maintained band-table replay (r9)
    "e_ivf_quantizer_lifecycle",    # two-day persisted-quantizer replay (r9)
    "d_lsh_band_retraction",        # takedown/DELETE side of the band table (r9)
    "d_embedding_neardup_incremental",      # OUTPUT UNCHANGED, name now
    "d_embedding_neardup_incremental_pin",  # carries prod config (r9 swap)
    # ---- r01-evidence refresh (the one remaining r01 name)
    "p_semi_join_valid_keys",
    # ---- r02-evidence refresh (closes the freshness program)
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
    # ---- rotation top-up: the backlog above fills only 40 of the ~50
    # driver slots, so the 10 alphabetically-first r03-evidence names
    # (the next-oldest cohort, 50 names total) start their refresh a
    # round early instead of idling the slots
    "a_bool_aggs",
    "a_corr_matrix",
    "a_heavy_hitters",
    "a_median_percentiles",
    "a_profile_columns",
    "b_rfm_segmentation",
    "b_sessionize",
    "b_stratified_sample",
    "d_chunk_dedup",
    "d_embedding_dedup_apply",
]
# (The round-8 window list was retired when CORRECTNESS_r08 landed
# 50/50 greens; re-derive each round's window from the latest
# CORRECTNESS_r{N}.json staleness census — see COVERAGE.md.)


def load_all() -> None:
    """Import every plan module so their @query registrations run, then
    order the registry so driver-unverified queries come first (the
    driver's correctness artifact truncates; see _VERIFY_FIRST)."""
    from . import (  # noqa: F401
        advanced,
        ann,
        causal,
        curation,
        dedup,
        stats,
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
