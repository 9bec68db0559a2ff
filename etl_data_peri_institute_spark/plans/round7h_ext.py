"""Round-7 continuation operators, batch 8: distributional and
stratified treatment effects.

- a_quantile_treatment_effect — per-quantile treat−control differences
  (the distributional readout mean-based estimators hide)
- b_stratified_ate            — activity-decile post-stratified average
  treatment effect (the confounding-control workhorse)

Both ride the deterministic md5-nibble assignment the rest of the
experiment family uses (b_ab_experiment_report / b_did_estimator /
b_ab_srm_check / b_sequential_mean_monitor), closing out the
experimentation toolkit: means, ratios, variance reduction, sequential
boundaries, SRM — and now distributional + stratified effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

_QTE_LEVELS = (0.25, 0.5, 0.75, 0.9)


def _treat_sql(col: str) -> str:
    return (
        f"(instr('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), 1, 1))"
        " - 1) % 2"
    )


@query(
    "a_quantile_treatment_effect",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value, {_treat_sql("user_id")} AS treat
      FROM events
    ),
    q AS (
      SELECT event_type, treat,
             quantile_cont(value, 0.25) AS q25,
             quantile_cont(value, 0.50) AS q50,
             quantile_cont(value, 0.75) AS q75,
             quantile_cont(value, 0.90) AS q90,
             count(*) AS n
      FROM tagged GROUP BY 1, 2
    )
    SELECT t.event_type,
           CAST(t.n + c.n AS BIGINT) AS n,
           round(t.q25 - c.q25, 6) AS qte_p25,
           round(t.q50 - c.q50, 6) AS qte_p50,
           round(t.q75 - c.q75, 6) AS qte_p75,
           round(t.q90 - c.q90, 6) AS qte_p90
    FROM q t JOIN q c
      ON t.event_type = c.event_type AND t.treat = 1 AND c.treat = 0
    ORDER BY t.event_type
    """,
)
def a_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: treat−control differences at p25 /
    p50 / p75 / p90 per event type — the distributional readout that
    catches effects the mean hides (a treatment that helps the median
    user while hurting the tail nets to zero in b_ab_experiment_report
    but shows opposite signs at p50 and p90 here).

    Scale shape: one groupBy(event_type, arm) computing all four exact
    interpolated quantiles in a single aggregate (the percentile
    machinery a_exact_percentile pinned cross-engine), then a 2-row-
    per-type self-join. At 100 TB the exact quantile swaps for
    percentile_approx exactly as a_winsorized_stats documents.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    pcts = F.expr(
        "percentile(value, array(0.25, 0.5, 0.75, 0.9))"
    )
    q = (
        ev.select("event_type", treat.alias("treat"), "value")
        .groupBy("event_type", "treat")
        .agg(pcts.alias("q"), F.count("*").alias("n"))
    )
    t = q.where(F.col("treat") == 1).alias("t")
    c = q.where(F.col("treat") == 0).alias("c")
    out = t.join(c, F.col("t.event_type") == F.col("c.event_type")).select(
        F.col("t.event_type").alias("event_type"),
        (F.col("t.n") + F.col("c.n")).cast("long").alias("n"),
        *[
            F.round(F.col("t.q")[i] - F.col("c.q")[i], 6).alias(
                f"qte_p{int(lv * 100)}"
            )
            for i, lv in enumerate(_QTE_LEVELS)
        ],
    )
    return out.orderBy("event_type")


_N_STRATA = 5


@query(
    "b_stratified_ate",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             {_treat_sql("user_id")} AS treat,
             count(*) AS activity,
             avg(value) AS y
      FROM events GROUP BY user_id
    ),
    strat AS (
      SELECT *,
             ntile({_N_STRATA}) OVER (ORDER BY activity, user_id) AS stratum
      FROM per_user
    ),
    cells AS (
      SELECT stratum, treat, count(*) AS n, avg(y) AS m, var_samp(y) AS v
      FROM strat GROUP BY 1, 2
    ),
    wide AS (
      SELECT stratum,
             sum(n) AS n_stratum,
             max(CASE WHEN treat = 1 THEN m END)
               - max(CASE WHEN treat = 0 THEN m END) AS effect,
             max(CASE WHEN treat = 1 THEN v / n END)
               + max(CASE WHEN treat = 0 THEN v / n END) AS var_eff
      FROM cells GROUP BY stratum
    )
    SELECT stratum,
           CAST(n_stratum AS BIGINT) AS n_stratum,
           round(effect, 6) AS stratum_effect,
           round(sqrt(var_eff), 6) AS stratum_se,
           round(sum(CASE WHEN effect IS NOT NULL
                          THEN effect * n_stratum END) OVER ()
                 / sum(CASE WHEN effect IS NOT NULL
                            THEN n_stratum END) OVER (), 6) AS ate_weighted
    FROM wide ORDER BY stratum
    """,
)
def b_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified average treatment effect: users are cut into
    {_N_STRATA} activity strata (exact ntile over per-user event
    counts, user_id tiebreak — fully deterministic), the treat−control
    mean difference of per-user outcomes is estimated INSIDE each
    stratum, and the overall ATE is the stratum-size-weighted
    combination. Stratification removes the variance (and, with
    observational assignment, the confounding) that activity
    differences inject into the pooled difference — the
    post-stratification workhorse between the raw readout
    (b_ab_experiment_report) and CUPED (b_cuped_adjusted_ab).

    Scale shape: one groupBy(user_id) with map-side combine; the ntile
    runs on the per-user frame (user-count-sized; the documented
    escape at extreme scale is grouped_ntile_from_rank over
    operators/cumsum.py — the same crossover every global rank in this
    repo documents); cells and the weighted fold are strata-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.max(treat).alias("treat"),
        F.count("*").alias("activity"),
        F.avg("value").alias("y"),
    )
    strat = per_user.withColumn(
        "stratum",
        F.ntile(_N_STRATA).over(W.orderBy("activity", "user_id")),
    )
    cells = strat.groupBy("stratum", "treat").agg(
        F.count("*").alias("n"),
        F.avg("y").alias("m"),
        F.var_samp("y").alias("v"),
    )
    arm = lambda t, col: F.max(  # noqa: E731
        F.when(F.col("treat") == t, F.col(col))
    )
    wide = cells.groupBy("stratum").agg(
        F.sum("n").alias("n_stratum"),
        (arm(1, "m") - arm(0, "m")).alias("effect"),
        (
            F.max(F.when(F.col("treat") == 1, F.col("v") / F.col("n")))
            + F.max(F.when(F.col("treat") == 0, F.col("v") / F.col("n")))
        ).alias("var_eff"),
    )
    everything = W.orderBy("stratum").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    # a stratum missing one arm entirely carries a NULL effect (honest:
    # no within-stratum contrast exists); the weighted ATE combines the
    # NON-degenerate strata only — identical CASE logic in the oracle
    ok = F.col("effect").isNotNull()
    return wide.select(
        "stratum",
        F.col("n_stratum").cast("long").alias("n_stratum"),
        F.round("effect", 6).alias("stratum_effect"),
        F.round(F.sqrt("var_eff"), 6).alias("stratum_se"),
        F.round(
            F.sum(F.when(ok, F.col("effect") * F.col("n_stratum"))).over(
                everything
            )
            / F.sum(F.when(ok, F.col("n_stratum"))).over(everything),
            6,
        ).alias("ate_weighted"),
    ).orderBy("stratum")
