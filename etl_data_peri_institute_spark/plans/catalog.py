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
# ROUND-11 STATE: CORRECTNESS_r10 landed 50/50 oracled greens (the 4
# round-10 net-new names, the full 41-name r03 cohort, and the 5
# alphabetically-first r04 top-ups). Staleness census over r01..r10:
# newest-green histogram r04:43 r05:50 r06:50 r07:48 r08:49 r09:50
# r10:50; zero never-verified names. This round's window:
#   1. the round-11 net-new gate(s) (as built),
#   2. the full 43-name r04 cohort (oldest evidence),
#   3. top-up: the alphabetically-first r05-cohort names (window
#      kept at exactly 50 — slot 51 missed the r09 window).
_VERIFY_FIRST: list[str] = [
    # ---- NET-NEW round-11 gate queries (as built)
    "e_ivf_quantizer_churn",  # 4-epoch interleaved quantizer churn (r11)
    # ---- r04-evidence refresh (43 names, oldest cohort)
    "b_dedup_rate_by_source",
    "b_grouped_split",
    "b_shard_manifest",
    "b_temperature_mixture",
    "b_weighted_sample",
    "d_cluster_representative",
    "d_containment_pairs",
    "d_decontaminate_apply",
    "d_incremental_dedup",
    "d_semdedup_prune",
    "d_simhash_hamming_pairs",
    "e_ivf_sq_topk",
    "e_range_search",
    "e_sq_int8_topk",
    "f_equidepth_histogram",
    "f_max_by_min_by",
    "f_try_arithmetic",
    "f_winsorized_stats",
    "g_pagerank_suppliers",
    "g_triangle_count",
    "j_asof_nearest",
    "j_band_join",
    "j_fuzzy_join_blocked",
    "j_fuzzy_resolve_rows",
    "p_pipeline_e2e",
    "p_pseudonymize_kanon",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "t_contamination_check",
    "t_doc_perplexity",
    "t_gopher_quality_rules",
    "t_importance_weights",
    "t_inverted_index",
    "t_pii_detect",
    "t_shingle_novelty",
    "t_url_canonical_dedup",
    "ts_ewma",
    "ts_interpolate_linear",
    "ts_period_over_period",
    "ts_rolling_zscore_anomaly",
    "ts_time_bucket_rollup",
    "u_arrow_batch_stats",
    "w_activity_streaks",
    # ---- rotation top-up: the alphabetically-first r05-evidence
    # names start their refresh a round early instead of idling slots
    "a_benford_first_digit",
    "a_chi2_independence",
    "a_gini_concentration",
    "a_mannwhitney_u",
    "a_mutual_information",
    "a_ols_trend",
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
