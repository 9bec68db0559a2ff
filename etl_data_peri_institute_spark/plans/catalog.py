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
# than ~3 rounds. The program COMPLETED in round 9 (union of r01..r09
# greens covers all 335 then-registered names, none older than r03);
# the rotation is now pure maintenance.
# ROUND-10 STATE: CORRECTNESS_r09 landed 50/50 oracled greens (the 5
# round-9 net-new/changed names, the 36 r01/r02-evidence names, and 9
# of the 10 r03 top-ups — d_embedding_dedup_apply was slot 51 and
# missed the truncation window). Staleness census over r01..r09:
# newest-green histogram r03:41 r04:48 r05:50 r06:50 r07:48 r08:48
# r09:50; only the 4 round-10 net-new names have no driver row. This
# round's window:
#   1. the 4 round-10 net-new gates (as built),
#   2. the full 41-name r03 cohort (oldest evidence),
#   3. top-up: the 5 alphabetically-first r04-cohort names
#      (window kept at exactly 50 — slot 51 missed the r09 window).
_VERIFY_FIRST: list[str] = [
    # ---- NET-NEW round-10 gate queries (as built)
    "e_ivf_quantizer_retraction",   # DELETE side of the quantizer (r10)
    "d_embedding_band_lifecycle",   # embedding band-table two-day replay (r10)
    "d_embedding_band_retraction",  # takedown side of the embedding bands (r10)
    "d_exact_dedup_retraction",     # takedown side of the exact-hash set (r10)
    # ---- r03-evidence refresh (41 names, oldest cohort)
    "d_embedding_dedup_apply",
    "d_embedding_neardup",
    "d_pack_sequences",
    "e_ivf_topk",
    "f_datetime_math",
    "f_histogram_width_bucket",
    "f_variant_json",
    "j_asof_forward",
    "j_cross_join",
    "j_interval_overlap",
    "j_lateral_topk",
    "j_null_safe_join",
    "j_recursive_cte",
    "p_data_contract_report",
    "p_scd2_fold",
    "p_snapshot_diff",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q1_pricing_summary",
    "q21_waiting_supplier_shape",
    "q22_global_sales_opportunity",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "st_stream_dedup",
    "st_stream_stream_join",
    "t_bigram_lm",
    "t_filter_funnel",
    "t_quality_percentile_filter",
    "t_tfidf",
    "ts_gap_fill_ffill",
    "ts_ohlc_hourly",
    "u_scalar_pandas_softsign",
    "u_udtf_chunk_documents",
    # ---- rotation top-up: the 5 alphabetically-first r04-evidence
    # names start their refresh a round early instead of idling slots
    "a_ks_drift",
    "a_psi_drift",
    "a_robust_outliers",
    "b_bootstrap_ci",
    "b_conversion_funnel",
]
# (Re-derive each round's window from the CORRECTNESS_r01..r{N-1}
# staleness census — see COVERAGE.md.)


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
