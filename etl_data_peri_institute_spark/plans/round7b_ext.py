"""Round-7 continuation operators, batch 2: duplicate-aware weighting,
budgeted mixing, causal readout, robust statistics.

- d_soft_dedup_weights — duplicate-aware sampling weights (keep every
  copy, weight 1/cluster-size) with per-source effective sizes
- b_token_waterline    — uniform water-filling token allocation under a
  corpus budget (the per-source cap solver of data-mixing recipes)
- b_did_estimator      — difference-in-differences readout with pooled SE
- a_winsorized_stats   — p05/p95-winsorized mean/stddev vs raw

All DataFrame-API compositions with DuckDB oracles; the waterline's
solver runs entirely in window functions over the SOURCES frame (20
rows here, thousands at worst in production — never data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


@query(
    "d_soft_dedup_weights",
    oracle="""
    WITH c AS (
      SELECT source,
             count(*) OVER (PARTITION BY md5(text)) AS csz
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(1.0 / csz), 4) AS effective_docs,
           round(count(*) / sum(1.0 / csz), 4) AS dup_inflation,
           CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicated_docs
    FROM c GROUP BY source ORDER BY source
    """,
)
def d_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-AWARE sampling weights (the SoftDedup alternative to
    hard removal): every copy of an exact-duplicate cluster stays in
    the corpus with weight 1/cluster_size, so the training distribution
    matches the deduplicated one without losing any copy's provenance
    or context. Output: per-source raw count, effective (weighted)
    size, the inflation ratio a mixing recipe must divide out, and how
    many docs sit in multi-copy clusters.

    Scale shape: cluster size via ONE shuffle on the content hash (a
    window over md5(text) partitions — equivalent to groupBy+join but
    half the shuffles since the row keeps its payload), then a
    map-side-combined groupBy(source). Clusters are content-hash
    partitions: uniformly spread by construction, no skew cap needed
    (a pathological 10^9-copy cluster is exactly what AQE skew-split
    handles; weights stay correct because the window count is exact).
    """
    docs = load_table(spark, sf_dir, "documents")
    csz = F.count("*").over(W.partitionBy(F.md5(F.encode(F.col("text"), "UTF-8"))))
    per_doc = docs.select("source", csz.alias("csz"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum(1.0 / F.col("csz")), 4).alias("effective_docs"),
            F.round(F.count("*") / F.sum(1.0 / F.col("csz")), 4).alias(
                "dup_inflation"
            ),
            F.sum((F.col("csz") > 1).cast("int")).cast("long").alias(
                "n_duplicated_docs"
            ),
        )
        .orderBy("source")
    )


# Budget as a fraction of the corpus total: the waterline solver is
# exercised mid-curve (some sources capped, some taken whole).
_WATERLINE_BUDGET_FRAC = 0.5


@query(
    "b_token_waterline",
    oracle=f"""
    WITH tot AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY source
    ),
    s AS (
      SELECT source, t,
             row_number() OVER (ORDER BY t, source) AS rn,
             sum(t) OVER (ORDER BY t, source) AS prefix,
             count(*) OVER () AS n,
             sum(t) OVER () AS grand
      FROM tot
    ),
    b AS (
      SELECT *, CAST(floor(grand * {_WATERLINE_BUDGET_FRAC}) AS BIGINT) AS budget
      FROM s
    ),
    j AS (
      SELECT *,
             coalesce(max(CASE WHEN prefix + (n - rn) * t <= budget
                               THEN rn END) OVER (), 0) AS jstar
      FROM b
    ),
    cap AS (
      SELECT *,
             (budget - coalesce(max(CASE WHEN rn = jstar THEN prefix END)
                                  OVER (), 0))
               * 1.0 / (n - jstar) AS c
      FROM j
    )
    SELECT source, t AS tokens,
           round(CASE WHEN t < c THEN t ELSE c END, 2) AS allocated,
           round((CASE WHEN t < c THEN t ELSE c END) / t, 4) AS kept_frac,
           round(c, 2) AS waterline,
           budget
    FROM cap ORDER BY source
    """,
)
def b_token_waterline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform water-filling token allocation: given a corpus token
    budget B (here 50 % of the total), find the per-source cap c — the
    WATERLINE — such that Σ_s min(tokens_s, c) = B, and report each
    source's allocation. This is the cap solver behind 'take small
    sources whole, cap the giants' mixing recipes (the uniform-fill
    special case of temperature mixing; b_temperature_mixture is the
    exponent family, this is the budget-exact one).

    Closed form, no iteration: sort sources by size ascending; j* = the
    largest rank whose full take still fits (prefix_j + (n−j)·t_j ≤ B);
    c = (B − prefix_{j*}) / (n − j*). Every step is a window function
    over the SOURCES frame — the corpus is touched exactly once (the
    token-count groupBy); the solver itself runs on a frame whose size
    is the number of sources (thousands at most), where a global window
    is the correct plan, not a bottleneck.
    """
    docs = load_table(spark, sf_dir, "documents")
    tot = (
        docs.select("source", F.size(F.split("text", " ")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("t"))
    )
    return waterline_allocate(tot, _WATERLINE_BUDGET_FRAC)


def waterline_allocate(tot: DataFrame, budget_frac: float) -> DataFrame:
    """The water-filling solver over a (source, t) totals frame —
    extracted so the closed form is property-testable on arbitrary
    distributions (tests/test_properties.py pits it against a python
    bisection reference under hypothesis)."""
    order = W.orderBy("t", "source")
    everything = W.orderBy("t", "source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    s = tot.select(
        "source",
        "t",
        F.row_number().over(order).alias("rn"),
        F.sum("t").over(order).alias("prefix"),
        F.count("*").over(everything).alias("n"),
        F.sum("t").over(everything).alias("grand"),
    ).withColumn(
        "budget",
        F.floor(F.col("grand") * budget_frac).cast("long"),
    )
    jstar = F.coalesce(
        F.max(
            F.when(
                F.col("prefix") + (F.col("n") - F.col("rn")) * F.col("t")
                <= F.col("budget"),
                F.col("rn"),
            )
        ).over(everything),
        F.lit(0),
    )
    s = s.withColumn("jstar", jstar)
    prefix_at_j = F.coalesce(
        F.max(F.when(F.col("rn") == F.col("jstar"), F.col("prefix"))).over(
            everything
        ),
        F.lit(0),
    )
    s = s.withColumn(
        "c", (F.col("budget") - prefix_at_j) * 1.0 / (F.col("n") - F.col("jstar"))
    )
    alloc = F.least(F.col("t").cast("double"), F.col("c"))
    return s.select(
        "source",
        F.col("t").alias("tokens"),
        F.round(alloc, 2).alias("allocated"),
        F.round(alloc / F.col("t"), 4).alias("kept_frac"),
        F.round(F.col("c"), 2).alias("waterline"),
        "budget",
    ).orderBy("source")


@query(
    "b_did_estimator",
    oracle="""
    WITH tagged AS (
      SELECT event_type, value,
             (instr('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS treat,
             CASE WHEN dayofmonth(ts) > 15 THEN 1 ELSE 0 END AS post
      FROM events
    ),
    cells AS (
      SELECT event_type, treat, post,
             count(*) AS n, avg(value) AS m, var_samp(value) AS v
      FROM tagged GROUP BY 1, 2, 3
    ),
    wide AS (
      SELECT event_type,
             sum(n) AS n_total,
             max(CASE WHEN treat = 1 AND post = 1 THEN m END) AS m11,
             max(CASE WHEN treat = 1 AND post = 0 THEN m END) AS m10,
             max(CASE WHEN treat = 0 AND post = 1 THEN m END) AS m01,
             max(CASE WHEN treat = 0 AND post = 0 THEN m END) AS m00,
             sum(v / n) AS var_sum
      FROM cells GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_total AS BIGINT) AS n,
           round((m11 - m10) - (m01 - m00), 6) AS did,
           round(sqrt(var_sum), 6) AS se,
           round(((m11 - m10) - (m01 - m00)) / sqrt(var_sum), 4) AS t_stat
    FROM wide ORDER BY event_type
    """,
)
def b_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout per event type: treatment by
    the portable md5-nibble user hash (the same deterministic
    assignment b_ab_experiment_report uses), pre/post by day-of-month.
    DiD = (ȳ₁post − ȳ₁pre) − (ȳ₀post − ȳ₀pre); SE pools the four cell
    variances (Welch-style, independent cells); t = DiD/SE. The
    parallel-trends counterfactual this estimates is the standard
    launch-impact readout when randomization is infeasible.

    Scale shape: ONE pass — groupBy(event_type, treat, post) with
    map-side combine to ≤ 4 cells per type, then a 4-row-per-type
    conditional pivot. Nothing joins, nothing is data-sized after the
    first aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    tagged = ev.select(
        "event_type",
        "value",
        treat.alias("treat"),
        (F.dayofmonth("ts") > 15).cast("int").alias("post"),
    )
    cells = tagged.groupBy("event_type", "treat", "post").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )

    def cell(t: int, p: int):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col("m"))
        )

    wide = cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n"),
        cell(1, 1).alias("m11"),
        cell(1, 0).alias("m10"),
        cell(0, 1).alias("m01"),
        cell(0, 0).alias("m00"),
        F.sum(F.col("v") / F.col("n")).alias("var_sum"),
    )
    did = (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
    se = F.sqrt(F.col("var_sum"))
    return wide.select(
        "event_type",
        "n",
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 4).alias("t_stat"),
    ).orderBy("event_type")


@query(
    "a_winsorized_stats",
    oracle="""
    WITH pct AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    ),
    clamped AS (
      SELECT e.event_type,
             e.value,
             greatest(p.p05, least(p.p95, e.value)) AS w
      FROM events e JOIN pct p USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS raw_mean,
           round(avg(w), 6) AS wins_mean,
           round(stddev_samp(value), 6) AS raw_std,
           round(stddev_samp(w), 6) AS wins_std,
           CAST(sum(CASE WHEN w <> value THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped
    FROM clamped GROUP BY event_type ORDER BY event_type
    """,
)
def a_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clamped) mean and standard deviation per
    event type next to the raw moments — the outlier-robust summary a
    metrics pipeline reports when heavy tails make the plain mean
    unstable (the trimmed-family cousin of a_mannwhitney_u's rank
    tests; f_winsorized_stats in plans/quality_ext.py is the
    rank-cutoff SUM variant over n_chars — this one clamps at
    interpolated quantiles and reports MOMENTS, the A/B-metrics
    shape).

    Scale shape: exact percentiles in one groupBy pass, broadcast back
    onto the events (the percentile frame is event-type-sized), clamp
    in codegen, one final map-side-combined groupBy. Two scans of
    events — at 100 TB swap the exact percentile for percentile_approx
    (a_approx_sketches' path) and the first scan collapses into the
    second's partial aggregate; exact is kept here because the oracle
    compares exact interpolated quantiles.
    """
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = ev.join(F.broadcast(pct), "event_type").select(
        "event_type",
        "value",
        F.greatest("p05", F.least("p95", F.col("value"))).alias("w"),
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
            F.round(F.avg("w"), 6).alias("wins_mean"),
            F.round(F.stddev_samp("value"), 6).alias("raw_std"),
            F.round(F.stddev_samp("w"), 6).alias("wins_std"),
            F.sum((F.col("w") != F.col("value")).cast("int"))
            .cast("long")
            .alias("n_clamped"),
        )
        .orderBy("event_type")
    )
