"""Statistical aggregate gates: distribution shape, drift, rank and
trend statistics, multiple-testing control, survival — every entry a
single declarative aggregation pipeline with a DuckDB hash oracle.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section below cites its source round. The oracle-side
discipline (identical round(), BIGINT casts, deterministic tiebreaks)
is described in catalog.py.
"""

from __future__ import annotations

# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ..sources.tables import load_table
from .catalog import query

_DRIFT_SPLIT = "TIMESTAMP '2024-01-15 00:00:00'"

@query(
    "a_ks_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, round(value, 2) AS v,
             CASE WHEN ts < {_DRIFT_SPLIT} THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    per_v AS (
      SELECT event_type, v,
             CAST(sum(is_base) AS BIGINT) AS nb,
             CAST(sum(1 - is_base) AS BIGINT) AS nc
      FROM tagged GROUP BY event_type, v
    ),
    tot AS (
      SELECT event_type,
             CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc
      FROM per_v GROUP BY event_type
    ),
    ecdf AS (
      SELECT p.event_type, p.v,
             sum(p.nb) OVER (PARTITION BY p.event_type ORDER BY p.v) * 1.0 / t.tb AS fb,
             sum(p.nc) OVER (PARTITION BY p.event_type ORDER BY p.v) * 1.0 / t.tc AS fc
      FROM per_v p JOIN tot t ON t.event_type = p.event_type
    )
    SELECT event_type, round(max(abs(fb - fc)), 4) AS ks_stat
    FROM ecdf GROUP BY event_type ORDER BY event_type
    """,
)
def a_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per event type:
    max ECDF gap between the baseline period (before the split date) and
    the current one — the nonparametric "did this metric's distribution
    move?" monitor that needs no binning choices.

    Exact, distributed: values pre-aggregate to (type, value) counts
    (map-side combined), ECDFs are cumulative window sums over the
    per-type value order, and the max gap is a final per-type aggregate.
    The window sorts value-count rows (bounded by distinct values), not
    raw events. Values are rounded to cents first so the ECDF support is
    identical on both engines."""
    ev = load_table(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    tagged = ev.select(
        "event_type",
        F.round("value", 2).alias("v"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("is_base"),
    )
    per_v = tagged.groupBy("event_type", "v").agg(
        F.sum("is_base").alias("nb"), F.sum(1 - F.col("is_base")).alias("nc")
    )
    # totals as per-type WINDOW sums over the same grouped frame — no
    # separate aggregate + join, so the (type, value) derivation is
    # planned once and the whole query is one pipeline
    wcum = W.partitionBy("event_type").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy("event_type")
    ecdf = per_v.select(
        "event_type",
        (F.sum("nb").over(wcum) / F.sum("nb").over(wall)).alias("fb"),
        (F.sum("nc").over(wcum) / F.sum("nc").over(wall)).alias("fc"),
    )
    return (
        ecdf.groupBy("event_type")
        .agg(F.round(F.max(F.abs(F.col("fb") - F.col("fc"))), 4).alias("ks_stat"))
        .orderBy("event_type")
    )

_PSI_BINS = 10

_PSI_LO, _PSI_HI = 0.0, 500.0

@query(
    "a_psi_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type,
             least(greatest(CAST(floor(value / (({_PSI_HI} - {_PSI_LO}) / {_PSI_BINS})) AS INT), 0), {_PSI_BINS - 1}) AS bin,
             CASE WHEN ts < {_DRIFT_SPLIT} THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    binned AS (
      SELECT event_type, bin,
             CAST(sum(is_base) AS BIGINT) AS nb,
             CAST(sum(1 - is_base) AS BIGINT) AS nc
      FROM tagged GROUP BY event_type, bin
    ),
    tot AS (
      SELECT event_type, CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc
      FROM binned GROUP BY event_type
    ),
    terms AS (
      SELECT b.event_type,
             ((b.nb + 0.5) / (t.tb + 0.5 * {_PSI_BINS})) AS p,
             ((b.nc + 0.5) / (t.tc + 0.5 * {_PSI_BINS})) AS q
      FROM binned b JOIN tot t ON t.event_type = b.event_type
    )
    SELECT event_type, round(sum((p - q) * ln(p / q)), 4) AS psi
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
)
def a_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type over 10 fixed-width
    value bins: Σ (p−q)·ln(p/q) between the baseline and current
    periods, add-half smoothed so empty bins stay finite — the binned
    drift score model-monitoring dashboards alarm on (rule of thumb:
    >0.1 shifting, >0.25 shifted).

    One scan → (type, bin) counts with map-side combine → per-type
    bounded aggregation (bins are fixed); the shuffle carries bin
    counts only. Fixed bin edges (not quantile-derived) keep the score
    comparable across runs and engines — the production pattern where
    edges come from the TRAINING distribution, frozen."""
    ev = load_table(spark, sf_dir, "events")
    width = (_PSI_HI - _PSI_LO) / _PSI_BINS
    split = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / width).cast("int"), F.lit(0)),
        F.lit(_PSI_BINS - 1),
    )
    tagged = ev.select(
        "event_type", bin_.alias("bin"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("is_base"),
    )
    binned = tagged.groupBy("event_type", "bin").agg(
        F.sum("is_base").alias("nb"), F.sum(1 - F.col("is_base")).alias("nc")
    )
    # per-type totals as window sums over the binned frame (see a_ks_drift)
    wall = W.partitionBy("event_type")
    terms = binned.select(
        "event_type",
        ((F.col("nb") + 0.5) / (F.sum("nb").over(wall) + 0.5 * _PSI_BINS)).alias("p"),
        ((F.col("nc") + 0.5) / (F.sum("nc").over(wall) + 0.5 * _PSI_BINS)).alias("q"),
    )
    return (
        terms.groupBy("event_type")
        .agg(F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 4).alias("psi"))
        .orderBy("event_type")
    )

@query(
    "a_benford_first_digit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs)
    SELECT o.d AS first_digit, o.n AS n_obs,
           round(o.n * 1.0 / tot.t, 4) AS p_obs,
           round(log10(1.0 + 1.0 / o.d), 4) AS p_benford,
           round(abs(o.n * 1.0 / tot.t - log10(1.0 + 1.0 / o.d)), 4) AS abs_dev
    FROM obs o CROSS JOIN tot
    ORDER BY first_digit
    """,
)
def a_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals: observed
    first-digit frequencies vs log10(1 + 1/d), with absolute deviation
    per digit — the classic anomaly screen for fabricated or truncated
    numeric columns (heavy deviation = investigate the source, not
    necessarily fraud; synthetic uniform-ish data deviates by design
    and the report shows exactly how).

    One scan → 9-row digit groupBy (map-side combined) → total via a
    1-row cross join. String first-digit extraction over the integer
    part is engine-portable; all ratios rounded before compare."""
    orders = load_table(spark, sf_dir, "orders")
    # explicit floor: Spark's double->bigint cast truncates while
    # DuckDB's ROUNDS (banker's) — floor() pins identical integer parts
    d = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(d.alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("t"))
    p_obs = F.col("n") / F.col("t")
    p_ben = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            F.col("n").alias("n_obs"),
            F.round(p_obs, 4).alias("p_obs"),
            F.round(p_ben, 4).alias("p_benford"),
            F.round(F.abs(p_obs - p_ben), 4).alias("abs_dev"),
        )
        .orderBy("first_digit")
    )


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-4 continuation-session operator additions (33 gate queries).
#
# Statistical inference: chi-square independence (+ Cramér's V), Welch
# t-test, Mann-Whitney rank-sum, OLS trend, skewness/kurtosis/
# Jarque-Bera, Gini concentration, Pareto/ABC — all on the
# integer-exact-sufficient-statistics discipline (see SCALING.md).
# Privacy: l-diversity (k-anonymity's companion). Reconciliation & ops:
# CDC latest-wins apply with tombstones, order-insensitive table
# checksums, partial-aggregate merge, join-key skew report + the salted
# join proven semantics-preserving, trailing-median volume anomaly.
# Graph: bipartite co-purchase projection, association rules,
# common-neighbor/Jaccard/Adamic-Adar similarity, degree distribution.
# Time series: CUSUM changepoint, rolling two-series correlation,
# hour-of-day seasonal baseline. Behavioral: A/B lift with two-proportion
# z, time-to-convert histogram, frequency capping, new-vs-returning,
# DAU/WAU/stickiness, exact-k reservoir sampling. Text: adjacent-bigram
# PMI, per-doc TF-IDF keywords, token-budget selection. Vectors: centroid
# report, nearest-centroid eval, PQ+ADC search, MMR diversified rerank.
# Joins: tolerance-bounded as-of (merge_asof parity), interval union.
#
# All are Spark-first DataFrame compositions with DuckDB oracles; each
# docstring carries the 100 TB design note. Cross-engine determinism
# discipline (catalog.py header): inputs reduced to integer cents before
# any floating math, statistics computed from exact integer aggregates so
# both engines feed IEEE ops identical operands, and every reported
# double rounded.
#
# Reference scope note: the reference ETL (/root/reference/etl/) has no
# statistics layer; these are north-star extensions for the
# large-scale-training-data monitoring surface (drift companions to
# a_ks_drift / a_psi_drift).
# ===========================================================================

@query(
    "a_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, user_id % 4 AS cohort, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, cohort, n,
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS row_tot,
             CAST(sum(n) OVER (PARTITION BY cohort) AS BIGINT) AS col_tot,
             CAST(sum(n) OVER () AS BIGINT) AS grand
      FROM cells
    ),
    terms AS (
      SELECT grand,
             (n - row_tot * col_tot * 1.0 / grand) * (n - row_tot * col_tot * 1.0 / grand)
               / (row_tot * col_tot * 1.0 / grand) AS term
      FROM tot
    ),
    dims AS (
      SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS r,
             CAST(count(DISTINCT cohort) AS BIGINT) AS c
      FROM cells
    )
    SELECT CAST(max(t.grand) AS BIGINT) AS n,
           CAST((max(d.r) - 1) * (max(d.c) - 1) AS BIGINT) AS dof,
           round(sum(t.term), 3) AS chi2,
           -- NULLIF guard: a 1xC or Rx1 table has no Cramer's V; NULL on
           -- both engines (DuckDB IEEE ops would yield inf/NaN)
           round(sqrt(sum(t.term) / NULLIF(max(t.grand) * least(max(d.r), max(d.c)) - max(t.grand), 0)), 4) AS cramers_v
    FROM terms t CROSS JOIN dims d
    """,
)
def a_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and a derived
    user cohort (``user_id % 4``), with Cramér's V effect size — the
    "did the treatment change behavior" screen run over event logs.

    Scale shape: ONE groupBy over the raw events reduces 100 TB to an
    r x c contingency table (here 5x4 = 20 rows); every downstream step
    (window margins, expected counts, the chi2 sum) operates on that
    sketch-sized frame, so the window partitions that would be global
    bottlenecks at data scale only ever see r*c rows. Counts stay
    integers until the expected-count division, so both engines feed
    IEEE division identical operands; chi2 rounded to 3, V to 4.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count("*").alias("n"))
    tot = cells.select(
        "event_type",
        "cohort",
        "n",
        F.sum("n").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("n").over(W.partitionBy("cohort")).alias("col_tot"),
        F.sum("n").over(W.partitionBy()).alias("grand"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("grand")
    terms = tot.select(
        "grand",
        "event_type",
        "cohort",
        ((F.col("n") - e) * (F.col("n") - e) / e).alias("term"),
    )
    return terms.agg(
        F.max("grand").cast("long").alias("n"),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("cohort") - 1)
        ).cast("long").alias("dof"),
        F.round(F.sum("term"), 3).alias("chi2"),
        # nullif mirrors the oracle guard: a 1xC / Rx1 contingency table
        # has no Cramer's V (NULL on both engines)
        F.round(
            F.sqrt(
                F.sum("term")
                / F.nullif(
                    F.max("grand")
                    * F.least(
                        F.count_distinct("event_type"),
                        F.count_distinct("cohort"),
                    )
                    - F.max("grand"),
                    F.lit(0),
                )
            ),
            4,
        ).alias("cramers_v"),
    )

_T_GROUP_A = "click"

_T_GROUP_B = "purchase"

@query(
    "a_welch_ttest",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('{_T_GROUP_A}', '{_T_GROUP_B}')
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS ss
      FROM v GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n, s * 1.0 / n AS mean,
             (ss - s * 1.0 * s / n) / (n - 1) AS var
      FROM g
    )
    SELECT a.n AS n_a, b.n AS n_b,
           round(a.mean / 100, 3) AS mean_a, round(b.mean / 100, 3) AS mean_b,
           round((a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n), 3) AS t_stat,
           round(
             (a.var / a.n + b.var / b.n) * (a.var / a.n + b.var / b.n)
             / ((a.var / a.n) * (a.var / a.n) / (a.n - 1)
                + (b.var / b.n) * (b.var / b.n) / (b.n - 1)), 1) AS welch_df
    FROM m a CROSS JOIN m b
    WHERE a.event_type = '{_T_GROUP_A}' AND b.event_type = '{_T_GROUP_B}'
    """,
)
def a_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test comparing '{A}' vs
    '{B}' event values, with the Welch-Satterthwaite degrees of freedom
    — the standard A/B significance screen when variances differ.

    Scale shape: one filtered scan reduces each group to exact integer
    moments (n, sum cents, sum cents²) via map-side partial aggregation
    — the shuffle carries 2 rows. Means/variances derive from those
    integers, so both engines hand IEEE division identical operands
    (float summation order never enters); t rounded to 3, df to 1.
    Sum-of-squares fits BIGINT comfortably at any SF here (cents ≤ 1e4,
    so n·cents² ≤ n·1e8; overflow would need ~1e10 rows per group —
    at that scale switch the moments to DECIMAL(38,0)).
    """.format(A=_T_GROUP_A, B=_T_GROUP_B)
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type").isin(_T_GROUP_A, _T_GROUP_B)).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    g = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    m = g.select(
        "event_type",
        "n",
        (F.col("s") / F.col("n")).alias("mean"),
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    a = m.filter(F.col("event_type") == _T_GROUP_A).alias("a")
    b = m.filter(F.col("event_type") == _T_GROUP_B).alias("b")
    va_n = F.col("a.var") / F.col("a.n")
    vb_n = F.col("b.var") / F.col("b.n")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.mean") / 100, 3).alias("mean_a"),
        F.round(F.col("b.mean") / 100, 3).alias("mean_b"),
        F.round((F.col("a.mean") - F.col("b.mean")) / F.sqrt(va_n + vb_n), 3).alias(
            "t_stat"
        ),
        F.round(
            (va_n + vb_n) * (va_n + vb_n)
            / (va_n * va_n / (F.col("a.n") - 1) + vb_n * vb_n / (F.col("b.n") - 1)),
            1,
        ).alias("welch_df"),
    )

@query(
    "a_mannwhitney_u",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = '{_T_GROUP_A}' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('{_T_GROUP_A}', '{_T_GROUP_B}')
    ),
    per_val AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS n_v,
             CAST(sum(is_a) AS BIGINT) AS n_a_v
      FROM v GROUP BY cents
    ),
    ranked AS (
      SELECT cents, n_v, n_a_v,
             CAST(coalesce(sum(n_v) OVER (
               ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS n_below
      FROM per_val
    ),
    sums AS (
      SELECT CAST(sum(n_a_v) AS BIGINT) AS n1,
             CAST(sum(n_v - n_a_v) AS BIGINT) AS n2,
             sum(n_a_v * (n_below + (n_v + 1) / 2.0)) AS r1
      FROM ranked
    )
    SELECT n1, n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 1) AS u_stat,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * 1.0 * n2 / 2)
                 / sqrt(n1 * 1.0 * n2 * (n1 + n2 + 1) / 12), 3) AS z_approx
    FROM sums
    """,
)
def a_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test ('{A}' vs '{B}' event values) with
    tie-averaged ranks — the non-parametric twin of the Welch t-test
    for skewed metrics where mean comparison misleads.

    Scale shape: ranks are NEVER assigned per row. One groupBy
    compresses the input to per-distinct-value counts (bounded by the
    cent-value domain, here ≤ ~10k rows regardless of SF), and the
    tie-averaged rank of every row sharing a value is reconstructed
    arithmetically from the running count below it — the only ordered
    window runs over the compact value axis, the f_equidepth_histogram
    discipline. Tie-averaged ranks end in .0/.5 so the rank-sum is
    exact in a double; z uses the no-tie-correction normal
    approximation (documented choice), rounded to 3.
    """.format(A=_T_GROUP_A, B=_T_GROUP_B)
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type").isin(_T_GROUP_A, _T_GROUP_B)).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_type") == _T_GROUP_A).cast("long").alias("is_a"),
    )
    per_val = v.groupBy("cents").agg(
        F.count("*").alias("n_v"), F.sum("is_a").alias("n_a_v")
    )
    ranked = per_val.select(
        "cents",
        "n_v",
        "n_a_v",
        F.coalesce(
            F.sum("n_v").over(
                W.orderBy("cents").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("n_below"),
    )
    sums = ranked.agg(
        F.sum("n_a_v").alias("n1"),
        F.sum(F.col("n_v") - F.col("n_a_v")).alias("n2"),
        F.sum(
            F.col("n_a_v") * (F.col("n_below") + (F.col("n_v") + 1) / 2.0)
        ).alias("r1"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu = F.col("n1") * F.col("n2") / 2.0
    sigma = F.sqrt(
        F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2") + 1) / 12.0
    )
    return sums.select(
        "n1",
        "n2",
        F.round(u, 1).alias("u_stat"),
        F.round((u - mu) / sigma, 3).alias("z_approx"),
    )

@query(
    "a_pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY l_partkey
    ),
    runsum AS (
      SELECT l_partkey, rev_cents,
             CAST(sum(rev_cents) OVER (
               ORDER BY rev_cents DESC, l_partkey
             ) AS BIGINT) AS cum_cents,
             CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
      FROM rev
    ),
    classed AS (
      SELECT CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                  WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_cents, total_cents
      FROM runsum
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
           round(sum(rev_cents) * 1.0 / max(total_cents), 4) AS revenue_share
    FROM classed GROUP BY abc_class
    ORDER BY abc_class
    """,
)
def a_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification of parts by revenue: rank parts by
    total revenue, classify by cumulative share (A ≤ 80%, B ≤ 95%,
    else C) — the inventory-management 80/20 cut that also decides
    which keys get a dedicated skew-salting treatment.

    Scale shape: the lineitem fact reduces to one integer-cents row
    per part FIRST (map-side partials); the global ordered window runs
    over that dimension-sized frame only — kept HERE as the semantics
    pin. The production path is ``pareto_abc_production`` below
    (operators/cumsum.py: range exchange + Arrow local cumsum +
    broadcast offsets — no single-partition window), tested
    bit-identical to this form. The class
    boundary compare is pure integer arithmetic (cum*100 <= total*80)
    — no float share ever decides a class; only the reported share is
    floating, rounded to 4.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev_cents")
    )
    runsum = rev.select(
        "l_partkey",
        "rev_cents",
        F.sum("rev_cents")
        .over(W.orderBy(F.desc("rev_cents"), "l_partkey"))
        .alias("cum_cents"),
        F.sum("rev_cents").over(W.partitionBy()).alias("total_cents"),
    )
    classed = runsum.select(
        F.when(F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A")
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_cents",
        "total_cents",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("rev_cents").alias("revenue_cents"),
            F.round(F.sum("rev_cents") / F.max("total_cents"), 4).alias(
                "revenue_share"
            ),
        )
        .orderBy("abc_class")
    )

def pareto_abc_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed form of ``a_pareto_abc`` (round-4 verdict item 2):
    the cumulative revenue comes from
    ``operators.cumsum.global_running_sum`` over the part-dimension
    frame (one range exchange, no single-partition window) and the
    grand total arrives as a driver literal, so neither the running sum
    nor the ``sum() OVER ()`` companion plans a global window. The
    class boundary stays pure integer cross-multiplication; output is
    bit-identical to the gate query."""
    from ..operators.cumsum import global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev_cents")
    )
    runsum, total_cents = global_running_sum(
        rev,
        "rev_cents",
        [F.desc("rev_cents"), F.asc("l_partkey")],
        out_col="cum_cents",
    )
    # cast pins LongType even if a tiny corpus's total fits int32 — the
    # *80/*95 constant folds must never run in int32 (ANSI overflow)
    total = F.lit(int(total_cents)).cast("long")
    classed = runsum.select(
        F.when(F.col("cum_cents") * 100 <= total * 80, "A")
        .when(F.col("cum_cents") * 100 <= total * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_cents",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("rev_cents").alias("revenue_cents"),
            F.round(F.sum("rev_cents") / total, 4).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )

@query(
    "a_ols_trend",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 60) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM v GROUP BY event_type
    )
    SELECT event_type, n,
           round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6)
             AS slope_cents_per_min,
           round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd)
                 / nd / 100, 3) AS intercept,
           round(((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
                 / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 5) AS r2
    FROM (
      SELECT event_type, n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
             CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
      FROM g
    )
    ORDER BY event_type
    """,
)
def a_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS linear trend of event value over time (slope in
    cents/minute, intercept, R²) — the closed-form regression every
    metric dashboard fits to answer "is this drifting up or down", and
    the parametric complement to ts_cusum_changepoint's level-shift
    detector.

    Scale shape: the classic sufficient-statistics trick — one groupBy
    reduces the whole fact to six integer moments per type; slope /
    intercept / R² are pure arithmetic on those. The x axis is minutes
    since a FIXED anchor (2024-01-01), which bounds x by the data
    window (43 200 at 30 days) so n·x² stays far inside BIGINT at any
    SF — anchoring at epoch would overflow sxx at ~sf0.1 (the
    documented reason; DECIMAL(38,0) is the fallback if the window
    ever spans centuries). DuckDB's fractional epoch() floors to
    Spark's integer unix_timestamp safely (sub-second part can never
    cross a minute boundary).
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
    v = ev.select(
        "event_type",
        F.floor((F.unix_timestamp("ts") - anchor) / 60).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    g = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # Moments are converted to double at identical points on both
    # engines: each moment fits 2^53 so the conversion is exact, and the
    # derived stats are then the same IEEE double expressions everywhere
    # (staying integer would overflow BIGINT in the R-squared square).
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxx, syy, sxy = (F.col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return g.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_cents_per_min"),
        F.round((sy - slope * sx) / n / 100, 3).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            5,
        ).alias("r2"),
    ).orderBy("event_type")

_SKEW_TOPN = 10

@query(
    "a_skew_report",
    oracle=f"""
    WITH freq AS (
      SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_suppkey
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_n
      FROM freq
    ),
    top AS (
      SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rk
      FROM freq
    )
    SELECT t.rk, t.key, t.n,
           round(t.n * 1.0 * s.n_keys / s.n_rows, 2) AS x_avg,
           round(t.n * 1.0 / s.n_rows, 5) AS row_share
    FROM top t CROSS JOIN stats s
    WHERE t.rk <= {_SKEW_TOPN}
    ORDER BY t.rk
    """,
)
def a_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis for lineitem.l_suppkey: the top-{n}
    hottest keys with their frequency, multiple-of-average, and row
    share — the report that decides whether a planned shuffle join
    needs salting (operators/skew.py), a broadcast, or AQE's skew-join
    split, and with what fan-out. Every 100 TB join plan starts here.

    Scale shape: one key groupBy collapses the fact to key frequencies
    (map-side partials); the global stats reduce that to ONE row; the
    top-N window runs over the key-frequency frame — key-dimension
    sized, and in production bounded further by a frequency floor
    (keys below avg can never be skew culprits). Ratios are
    integer-over-integer, rounded.
    """.format(n=_SKEW_TOPN)
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_suppkey").alias("key")).agg(F.count("*").alias("n"))
    stats = freq.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    top = freq.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("n"), "key"))
    ).filter(F.col("rk") <= _SKEW_TOPN)
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "rk",
            "key",
            "n",
            F.round(F.col("n") * F.col("n_keys") / F.col("n_rows"), 2).alias("x_avg"),
            F.round(F.col("n") / F.col("n_rows"), 5).alias("row_share"),
        )
        .orderBy("rk")
    )

@query(
    "a_partial_agg_merge",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS mn,
             CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS mx
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(sum(s) AS BIGINT) AS sum_cents,
           round(sum(s) * 1.0 / sum(n) / 100, 4) AS avg_price,
           CAST(min(mn) AS BIGINT) AS min_cents,
           CAST(max(mx) AS BIGINT) AS max_cents,
           CAST(count(*) AS BIGINT) AS n_partials_merged
    FROM daily GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-state merge: fold per-day partial aggregates
    (count/sum/min/max — the decomposable state a daily batch job
    materializes) into the running per-flag totals, without touching
    raw rows — incremental view maintenance, the batch twin of
    streaming/incremental.py's rollup. avg is re-derived from merged
    sum/count (it is NOT itself mergeable — the whole point of keeping
    the state decomposed).

    Scale shape: at 100 TB the daily frame already exists (yesterday's
    materialization), so the merge touches days x flags rows — the
    gate derives it inline to stay self-contained, which is also the
    algebraic identity check: merge(partials(x)) == agg(x). Both
    groupBys partial-aggregate map-side; integer cents throughout;
    only the re-derived average is float, rounded.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    daily = li.groupBy(
        "l_returnflag", F.col("l_shipdate").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        F.min(cents).alias("mn"),
        F.max(cents).alias("mx"),
    )
    return (
        daily.groupBy("l_returnflag")
        .agg(
            F.sum("n").alias("n_rows"),
            F.sum("s").alias("sum_cents"),
            F.round(F.sum("s") / F.sum("n") / 100, 4).alias("avg_price"),
            F.min("mn").alias("min_cents"),
            F.max("mx").alias("max_cents"),
            F.count("*").alias("n_partials_merged"),
        )
        .orderBy("l_returnflag")
    )

@query(
    "a_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(sum(cents) OVER () AS BIGINT) AS total
      FROM rev
    )
    SELECT max(n) AS n_customers,
           CAST(max(total) AS BIGINT) AS total_cents,
           round(2.0 * sum(i * cents) / (max(n) * 1.0 * max(total))
                 - (max(n) + 1.0) / max(n), 4) AS gini
    FROM ranked
    """,
)
def a_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    inequality scalar behind a_pareto_abc's class table (0 = every
    customer spends alike, →1 = one whale funds everything); data
    pipelines track it to detect mix shifts that per-class tables
    smooth over.

    Scale shape: the fact reduces to integer cents per customer first;
    the exact rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n needs a
    global ordering, which runs over the customer-DIMENSION frame only
    (the a_pareto_abc rationale), and Σ(i·xᵢ) partial-aggregates after
    ranking. i·cents products stay in BIGINT (n·max_cents ≤ ~1e13 per
    term at sf0.1; the sum is ≤ n²·max_cents ≈ 4e15 — inside BIGINT
    to ~1e9 customers, then DECIMAL). One float division at the end,
    rounded to 4.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = rev.select(
        "cents",
        F.row_number().over(W.orderBy("cents", "o_custkey")).alias("i"),
        F.count("*").over(W.partitionBy()).alias("n"),
        F.sum("cents").over(W.partitionBy()).alias("total"),
    )
    return ranked.agg(
        F.max("n").alias("n_customers"),
        F.max("total").alias("total_cents"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("cents"))
            / (F.max("n") * F.max("total").cast("double"))
            - (F.max("n") + 1.0) / F.max("n"),
            4,
        ).alias("gini"),
    )

@query(
    "a_skewness_kurtosis",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value) AS BIGINT) AS d
      FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s1,
             CAST(sum(d * d) AS BIGINT) AS s2,
             CAST(sum(d * d * d) AS BIGINT) AS s3,
             CAST(sum(d * d * d * d) AS BIGINT) AS s4
      FROM v GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
             CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
             CAST(s4 AS DOUBLE) AS s4d
      FROM g
    ),
    c AS (
      SELECT event_type, n, nd,
             s1d / nd AS mu,
             s2d / nd - (s1d / nd) * (s1d / nd) AS m2,
             s3d / nd - 3 * (s1d / nd) * s2d / nd + 2 * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m3,
             s4d / nd - 4 * (s1d / nd) * s3d / nd
               + 6 * (s1d / nd) * (s1d / nd) * s2d / nd
               - 3 * (s1d / nd) * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m4
      FROM m
    )
    SELECT event_type, n,
           round(m3 / (m2 * sqrt(m2)), 4) AS skewness,
           round(m4 / (m2 * m2) - 3, 4) AS excess_kurtosis,
           round(nd / 6 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                 + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4), 2) AS jarque_bera
    FROM c
    ORDER BY event_type
    """,
)
def a_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape screen per event type: skewness, excess
    kurtosis, and the Jarque-Bera normality statistic — the check a
    monitoring stack runs before trusting any z-score-based alert
    (ts_rolling_zscore_anomaly, ts_seasonal_baseline assume roughly
    symmetric tails; JB says when that assumption broke). Completes
    the moment ladder: a_stats_aggregates (1st/2nd), a_ols_trend
    (cross-moments), this (3rd/4th).

    Scale shape: the integer-exact-statistics discipline at its
    purest — one groupBy reduces the fact to five integer power sums
    per type; skewness/kurtosis/JB are closed-form arithmetic on
    those. Values are rounded to integer DOLLARS (not cents) before
    powering: the 4th power sum must stay inside BIGINT, and d ≤ 100
    keeps n·d⁴ ≤ n·1e8 (safe beyond 1e10 rows/group; cents would
    overflow at ~sf0.1 — the a_welch_ttest envelope note, one power
    higher). Moments promote to double at identical points on both
    engines (each sum < 2^53, so conversion is exact — the a_ols_trend
    discipline); shape stats rounded to 4, JB to 2.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.round("value").cast("long").alias("d"))
    d = F.col("d")
    g = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d).alias("s1"),
        F.sum(d * d).alias("s2"),
        F.sum(d * d * d).alias("s3"),
        F.sum(d * d * d * d).alias("s4"),
    )
    nd, s1, s2, s3, s4 = (
        F.col(c).cast("double") for c in ("n", "s1", "s2", "s3", "s4")
    )
    mu = s1 / nd
    m2 = s2 / nd - mu * mu
    m3 = s3 / nd - 3 * mu * s2 / nd + 2 * mu * mu * mu
    m4 = s4 / nd - 4 * mu * s3 / nd + 6 * mu * mu * s2 / nd - 3 * mu * mu * mu * mu
    skew = m3 / (m2 * F.sqrt(m2))
    exk = m4 / (m2 * m2) - 3
    return g.select(
        "event_type",
        "n",
        F.round(skew, 4).alias("skewness"),
        F.round(exk, 4).alias("excess_kurtosis"),
        F.round(nd / 6 * (skew * skew + exk * exk / 4), 2).alias("jarque_bera"),
    ).orderBy("event_type")

@query(
    "a_bitmap_active_days",
    oracle="""
    WITH bits AS (
      SELECT user_id,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(
               date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS INTEGER)) AS BIGINT) AS day_mask
      FROM events GROUP BY user_id
    )
    SELECT CAST(bit_count(day_mask) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM bits
    GROUP BY 1
    ORDER BY 1
    """,
)
def a_bitmap_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap rollup of user activity: each user's active days in the
    30-day window collapse into ONE BIGINT bitmask (bit i = active on
    anchor+i), reported as the activity-frequency histogram via
    popcount — the Druid/ClickHouse bitmap-index pattern: masks OR
    together mergeably (a_partial_agg_merge's algebra with | as the
    monoid), distinct-day counts become bit_count, and segment
    overlaps become AND — all without re-touching raw events.

    Scale shape: one user groupBy with map-side partial bit_or — the
    whole activity history of a user is 8 BYTES, the most compact
    mergeable sketch in the repo; the histogram groupBy runs over the
    user-dimension frame. Fixed anchor (2024-01-01) pins bit positions
    across engines and across daily incremental merges; windows past
    63 days shard the mask by (user, epoch-week) — documented, exact,
    and still mergeable. Everything integer.
    """
    ev = load_table(spark, sf_dir, "events")
    # pyspark's shiftleft() only takes a literal bit count; the SQL form
    # accepts a column, so the per-row shift goes through expr()
    bit = F.expr(
        "shiftleft(CAST(1 AS BIGINT), "
        "datediff(CAST(date_trunc('day', ts) AS DATE), DATE '2024-01-01'))"
    )
    bits = ev.groupBy("user_id").agg(F.bit_or(bit).alias("day_mask"))
    return (
        bits.groupBy(F.bit_count("day_mask").cast("long").alias("n_active_days"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("n_active_days")
    )

@query(
    "a_seasonality_strength",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    slot AS (
      SELECT event_type, hod,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS ss
      FROM v GROUP BY event_type, hod
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(n) AS BIGINT) AS n_tot,
             CAST(sum(s) AS BIGINT) AS s_tot,
             CAST(sum(ss) AS BIGINT) AS ss_tot,
             sum(CAST(s AS DOUBLE) * s / n) AS sb
      FROM slot GROUP BY event_type
    )
    SELECT event_type, n_tot,
           round((sb - CAST(s_tot AS DOUBLE) * s_tot / n_tot)
                 / (ss_tot - CAST(s_tot AS DOUBLE) * s_tot / n_tot), 4)
             AS seasonal_strength
    FROM agg
    ORDER BY event_type
    """,
)
def a_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength per event type: the share of value
    variance explained by the hour-of-day profile — the between-slot
    sum of squares over the total (a one-way ANOVA R², STL's
    seasonal-strength analogue computed exactly). Near 0 = the 24-hour
    cycle carries no signal and ts_seasonal_baseline's bands are
    wasted; near 1 = slot-aware thresholds are mandatory. The
    one-number dial that decides which anomaly detector
    (ts_rolling_zscore vs ts_seasonal_baseline) a metric gets.

    Scale shape: the integer-exact-statistics discipline again — one
    (type, hour) groupBy reduces the fact to 24 integer-moment rows
    per type; the between/total decomposition is closed-form on those.
    The only double accumulation (Σ s²/n over 24 slots) is a 24-term
    sum whose operands are identical on both engines; output rounded
    to 4.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    slot = v.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    agg = slot.groupBy("event_type").agg(
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias("sb"),
    )
    grand = F.col("s_tot").cast("double") * F.col("s_tot") / F.col("n_tot")
    return agg.select(
        "event_type",
        "n_tot",
        F.round(
            (F.col("sb") - grand) / (F.col("ss_tot") - grand), 4
        ).alias("seasonal_strength"),
    ).orderBy("event_type")

@query(
    "a_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT event_type, user_id % 4 AS cohort, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, cohort, n,
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS row_tot,
             CAST(sum(n) OVER (PARTITION BY cohort) AS BIGINT) AS col_tot,
             CAST(sum(n) OVER () AS BIGINT) AS grand
      FROM cells
    ),
    terms AS (
      SELECT grand,
             (CAST(n AS DOUBLE) / grand)
               * ln(CAST(n AS DOUBLE) * grand / (CAST(row_tot AS DOUBLE) * col_tot)) AS mi_term,
             -(CAST(n AS DOUBLE) / grand) * ln(CAST(n AS DOUBLE) / grand) AS hxy_term
      FROM tot
    )
    SELECT CAST(max(grand) AS BIGINT) AS n,
           round(sum(mi_term), 6) AS mutual_information,
           round(sum(mi_term) / sum(hxy_term), 6) AS nmi_joint
    FROM terms
    """,
)
def a_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and user cohort (nats),
    with joint-entropy-normalized MI — the information-theoretic twin
    of a_chi2_independence: chi2 answers "is there ANY dependence",
    MI measures HOW MUCH signal one variable carries about the other
    on the scale feature selection and clustering-agreement scores use
    (NMI is the standard cluster-vs-label agreement metric, computable
    on this exact plan with predicted/true labels as the two axes).

    Scale shape: identical to the chi2 plan — one groupBy to the r x c
    contingency sketch, window margins over 20 rows, a closed-form sum
    of p·ln terms whose operands (integer count ratios) are identical
    on both engines; MI and NMI rounded to 6. Empty cells contribute
    nothing by construction (they never appear in the cell frame),
    matching the 0·ln0 = 0 convention.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count("*").alias("n"))
    tot = cells.select(
        "n",
        F.sum("n").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("n").over(W.partitionBy("cohort")).alias("col_tot"),
        F.sum("n").over(W.partitionBy()).alias("grand"),
    )
    nd = F.col("n").cast("double")
    gd = F.col("grand").cast("double")
    p = nd / gd
    mi_term = p * F.log(nd * gd / (F.col("row_tot").cast("double") * F.col("col_tot")))
    hxy_term = -p * F.log(p)
    return tot.select(
        "grand", mi_term.alias("mi_term"), hxy_term.alias("hxy_term")
    ).agg(
        F.max("grand").alias("n"),
        F.round(F.sum("mi_term"), 6).alias("mutual_information"),
        F.round(F.sum("mi_term") / F.sum("hxy_term"), 6).alias("nmi_joint"),
    )


# ===========================================================================
# section consolidated from plans/round6_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

from .catalog import ORACLES, query

query("a_pareto_abc_production", oracle=ORACLES["a_pareto_abc"])(
    pareto_abc_production
)


# ===========================================================================
# section consolidated from plans/round6f_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/graphs.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, functions as F

_ENTROPY_COLS = (
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
    ("orders", "o_orderstatus"),
)

def _entropy_oracle() -> str:
    selects = []
    for table, col in _ENTROPY_COLS:
        selects.append(
            f"""
    SELECT '{table}.{col}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy_bits
    FROM (SELECT {col}, count(*) AS c FROM {table} GROUP BY {col})"""
        )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY column_name"
    )

@query("a_column_entropy_report", oracle=_entropy_oracle())
def a_column_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) + distinct count per profiled column
    across tables — the information-density profile that ranks
    candidate partition/blocking keys: a near-zero-entropy column
    prunes nothing when partitioned on; a max-entropy column (entropy
    ~ log2 n_distinct) spreads uniformly. Complements the per-column
    stats profile with a distribution-shape scalar.

    Scale shape: per column, ONE map-side-combined groupBy to the
    value-frequency frame, then H = log2(N) - sum(c*log2(c))/N folds
    those counts in a second (distinct-value-sized) aggregate — the
    identity avoids a p=c/N per-row divide against a broadcast total,
    so no window and no cross join; the per-column reports union into
    a 4-row frame. Entropy is rounded to 4 (sum order differs ~1 ulp
    across engines; the standing absorb-in-round discipline).
    """
    outs = []
    for table, col in _ENTROPY_COLS:
        df = load_table(spark, sf_dir, table)
        counts = df.groupBy(col).agg(F.count("*").alias("c"))
        outs.append(
            counts.agg(
                F.lit(f"{table}.{col}").alias("column_name"),
                F.count("*").alias("n_distinct"),
                F.round(
                    F.log2(F.sum("c"))
                    - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
                    4,
                ).alias("entropy_bits"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("column_name")


# ===========================================================================
# section consolidated from plans/round6h_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/causal.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

@query(
    "a_emd_drift",
    oracle="""
    WITH tagged AS (
      SELECT event_type, round(value, 2) AS v,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    per_v AS (
      SELECT event_type, v,
             sum(is_base) AS nb, sum(1 - is_base) AS nc
      FROM tagged GROUP BY event_type, v
    ),
    tot AS (
      SELECT event_type, sum(nb) AS tb, sum(nc) AS tc
      FROM per_v GROUP BY event_type
    ),
    ecdf AS (
      SELECT p.event_type, p.v,
             sum(p.nb) OVER (PARTITION BY p.event_type ORDER BY p.v)
               * 1.0 / t.tb AS fb,
             sum(p.nc) OVER (PARTITION BY p.event_type ORDER BY p.v)
               * 1.0 / t.tc AS fc,
             lead(p.v) OVER (PARTITION BY p.event_type ORDER BY p.v) AS v_next
      FROM per_v p JOIN tot t ON t.event_type = p.event_type
    )
    SELECT event_type,
           round(sum(abs(fb - fc) * (v_next - v)), 4) AS emd
    FROM ecdf WHERE v_next IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def a_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D earth-mover (Wasserstein-1) drift per event type: the
    integral of |ECDF_base - ECDF_current| over the value axis, between
    the pre-2024-01-15 baseline and the current period (the a_ks_drift
    split). KS reports the worst POINT gap and saturates once
    distributions differ; EMD reports the total transport cost in
    value units — the magnitude-aware drift monitor that ranks which
    metric moved the most.

    Scale shape: identical to a_ks_drift — events pre-aggregate to
    (type, cents-value) counts map-side; the ECDF and the step-width
    lead() share one window over the bounded distinct-value frame; the
    integral is a final per-type fold. Values round to cents first so
    the ECDF support is identical on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    tagged = ev.select(
        "event_type",
        F.round("value", 2).alias("v"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("is_base"),
    )
    per_v = tagged.groupBy("event_type", "v").agg(
        F.sum("is_base").alias("nb"),
        F.sum(1 - F.col("is_base")).alias("nc"),
    )
    tot = per_v.groupBy("event_type").agg(
        F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
    )
    w = W.partitionBy("event_type").orderBy("v")
    ecdf = (
        per_v.join(tot, "event_type")
        .select(
            "event_type",
            "v",
            (F.sum("nb").over(w) * 1.0 / F.col("tb")).alias("fb"),
            (F.sum("nc").over(w) * 1.0 / F.col("tc")).alias("fc"),
            F.lead("v").over(w).alias("v_next"),
        )
    )
    return (
        ecdf.filter(F.col("v_next").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("fb") - F.col("fc"))
                    * (F.col("v_next") - F.col("v"))
                ),
                4,
            ).alias("emd")
        )
        .orderBy("event_type")
    )


# ===========================================================================
# section consolidated from plans/round6i_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 8: classifier-eval confusion matrix,
# seasonal-naive forecast backtest, the dedup pipeline funnel, and a
# deterministic bootstrap CI.
#
# Four more first-class operators (north-star extensions):
#
# - ``t_langid_confusion``: confusion matrix + per-language recall of the
#   t_langid marker classifier against the labeled ``lang`` column — the
#   eval loop for any heuristic/model column (precision of the quality
#   classifier is the #1 question about it).
# - ``ts_snaive_forecast_eval``: seasonal-naive backtest (forecast = the
#   value 7 daily rows earlier) with MAE/MAPE per event type — the
#   baseline every forecasting pipeline must beat, and the eval harness
#   that measures it.
# - ``d_dedup_pipeline_funnel``: document survival through the dedup
#   cascade (raw → exact → near-dup) per source — the one-glance report
#   of how much each stage removes (the "pipeline glue" view over the
#   operators the d_* family provides individually).
# - ``a_bootstrap_ci``: nonparametric bootstrap CI for the mean purchase
#   value via DETERMINISTIC Poisson(1) resampling weights (inverse-CDF
#   of a content-hash uniform — never rand(), so replicas and engines
#   agree bit-for-bit) — simulation-at-scale as one explode + two
#   bounded aggregates.
# ===========================================================================

from .llmdata import _hex4_to_int_sql

_BOOT_B = 200

_POIS = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340)

def _boot_oracle() -> str:
    u = _hex4_to_int_sql("md5(CAST(event_id AS VARCHAR) || ':' || CAST(s AS VARCHAR))")
    w_case = (
        "CASE "
        + " ".join(
            f"WHEN u < {p} THEN {i}" for i, p in enumerate(_POIS)
        )
        + " ELSE 5 END"
    )
    lo_rank = int(0.025 * _BOOT_B)
    hi_rank = int(0.975 * _BOOT_B)
    return f"""
    WITH px AS (
      SELECT event_id, value FROM events WHERE event_type = 'purchase'
    ),
    pt AS (SELECT avg(value) AS point_mean FROM px),
    expanded AS (
      SELECT s, value, ({u}) / 65536.0 AS u
      FROM px, UNNEST(range(0, {_BOOT_B})) AS t(s)
    ),
    weighted AS (
      SELECT s, value, {w_case} AS w FROM expanded
    ),
    means AS (
      SELECT s, sum(w * value) / NULLIF(sum(w), 0) AS m
      FROM weighted GROUP BY s
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, s) AS rn FROM means
    )
    SELECT round((SELECT point_mean FROM pt), 4) AS point_mean,
           round(avg(m), 4) AS boot_mean,
           round(sqrt(greatest(avg(m * m) - avg(m) * avg(m), 0)), 4) AS boot_se,
           round((SELECT m FROM ranked WHERE rn = {lo_rank}), 4) AS ci_lo,
           round((SELECT m FROM ranked WHERE rn = {hi_rank}), 4) AS ci_hi
    FROM means
    """

@query("a_bootstrap_ci", oracle=_boot_oracle())
def a_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric bootstrap CI for the mean purchase value: {200}
    resamples with DETERMINISTIC Poisson(1) weights — each (row,
    replicate) draws its weight by inverting the Poisson CDF at a
    content-hash uniform (md5(event_id ':' s)), the standard
    Poisson-bootstrap approximation of multinomial resampling that
    needs no coordination across rows. Never rand(): task retries,
    reruns and the DuckDB oracle draw the SAME resamples. Reports the
    point mean, bootstrap mean/SE, and the percentile CI (ranks 5 and
    195 of the 200 replicate means).

    Scale shape: one explode bounded by B×rows that partial-aggregates
    per replicate map-side — only B (sum_w, sum_wx) partials cross the
    wire per task, so the shuffle is B-rows wide regardless of data
    size; the CI rank pick is a window over the B-row means frame.
    This is the general simulation-on-Spark recipe: hash-derived
    randomness + per-replicate partial aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    px = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    pt = px.agg(F.avg("value").alias("point_mean"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("s").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        / 65536.0
    )
    w_col = F.when(u < _POIS[0], 0)
    for i, p in enumerate(_POIS[1:], start=1):
        w_col = w_col.when(u < p, i)
    w_col = w_col.otherwise(5)
    expanded = px.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("s"),
    ).select("s", "value", w_col.alias("w"))
    means = expanded.groupBy("s").agg(
        (
            F.sum(F.col("w") * F.col("value"))
            / F.nullif(F.sum("w").cast("double"), F.lit(0.0))
        ).alias("m")
    )
    ranked = means.withColumn(
        "rn", F.row_number().over(W.orderBy("m", "s"))
    )
    lo_rank = int(0.025 * _BOOT_B)
    hi_rank = int(0.975 * _BOOT_B)
    ci = (
        ranked.filter(F.col("rn").isin(lo_rank, hi_rank))
        .groupBy()
        .agg(
            F.min(F.when(F.col("rn") == lo_rank, F.col("m"))).alias("lo"),
            F.min(F.when(F.col("rn") == hi_rank, F.col("m"))).alias("hi"),
        )
    )
    stats = means.agg(
        F.round(F.avg("m"), 4).alias("boot_mean"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.avg(F.col("m") * F.col("m")) - F.avg("m") * F.avg("m"),
                    F.lit(0.0),
                )
            ),
            4,
        ).alias("boot_se"),
    )
    return (
        pt.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(ci))
        .select(
            F.round("point_mean", 4).alias("point_mean"),
            "boot_mean",
            "boot_se",
            F.round("lo", 4).alias("ci_lo"),
            F.round("hi", 4).alias("ci_hi"),
        )
    )


# ===========================================================================
# section consolidated from plans/round6j_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

@query(
    "a_jackknife_se",
    oracle="""
    WITH grp AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             sum(n_chars * 1.0) AS s
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n) AS nn, sum(s) AS ss, count(*) AS g FROM grp),
    loo AS (
      SELECT grp.source,
             (t.ss - grp.s) / (t.nn - grp.n) AS m_i,
             t.ss / t.nn AS point, t.g AS g
      FROM grp, tot t
    ),
    jack AS (
      SELECT max(point) AS point, max(g) AS g,
             avg(m_i) AS mbar,
             sum((m_i - (SELECT avg(m_i) FROM loo))
                 * (m_i - (SELECT avg(m_i) FROM loo))) AS ssq
      FROM loo
    ),
    infl AS (
      SELECT source FROM loo
      ORDER BY abs(m_i - point) DESC, source LIMIT 1
    )
    SELECT round(j.point, 4) AS point_mean,
           round(sqrt((j.g - 1.0) / j.g * j.ssq), 4) AS jack_se,
           CAST(j.g AS INT) AS n_groups,
           (SELECT source FROM infl) AS max_influence_source
    FROM jack j
    """,
)
def a_jackknife_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-a-group jackknife SE of the mean document length: leave
    out one SOURCE at a time, recompute the mean, and fold the g
    leave-one-out estimates into the jackknife standard error — the
    exact, fully deterministic resampling companion to a_bootstrap_ci
    (no randomness, no replicates; g passes collapse to one grouped
    aggregate). Also reports the max-influence source — the feed whose
    removal moves the estimate most, i.e. "is one source dominating
    this corpus statistic?".

    Scale shape: ONE map-side-combined per-source aggregate (g rows);
    the leave-one-out means derive arithmetically from the totals
    (m_i = (S - s_i) / (N - n_i)) — no second data pass, no explode;
    everything after the first aggregate is g-row arithmetic.
    """
    docs = load_table(spark, sf_dir, "documents")
    grp = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.col("n_chars") * 1.0).alias("s"),
    )
    tot = grp.agg(
        F.sum("n").alias("nn"), F.sum("s").alias("ss"), F.count("*").alias("g")
    )
    loo = grp.crossJoin(F.broadcast(tot)).select(
        "source",
        ((F.col("ss") - F.col("s")) / (F.col("nn") - F.col("n"))).alias("m_i"),
        (F.col("ss") / F.col("nn")).alias("point"),
        "g",
    )
    mbar = loo.agg(F.avg("m_i").alias("mbar"))
    jack = (
        loo.crossJoin(F.broadcast(mbar))
        .agg(
            F.max("point").alias("point"),
            F.max("g").alias("g"),
            F.sum(
                (F.col("m_i") - F.col("mbar")) * (F.col("m_i") - F.col("mbar"))
            ).alias("ssq"),
        )
    )
    infl = (
        loo.orderBy(F.abs(F.col("m_i") - F.col("point")).desc(), "source")
        .limit(1)
        .select(F.col("source").alias("max_influence_source"))
    )
    return jack.crossJoin(F.broadcast(infl)).select(
        F.round("point", 4).alias("point_mean"),
        F.round(
            F.sqrt((F.col("g") - 1.0) / F.col("g") * F.col("ssq")), 4
        ).alias("jack_se"),
        F.col("g").cast("int").alias("n_groups"),
        "max_influence_source",
    )


# ===========================================================================
# section consolidated from plans/round6k_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 10: robust trend estimation, the ACF
# report, and normalization-form dedup rates.
#
# - ``a_theil_sen_trend``: Theil–Sen slope (median of pairwise slopes)
#   per event type, side by side with the OLS slope — the robust trend
#   estimator a single outlier day cannot drag (a_ols_trend's breakdown
#   point is 0; Theil–Sen's is ~29%).
# - ``ts_autocorrelation_report``: the sample ACF at lags {1, 2, 7} per
#   event type over the daily revenue series — the standard "is there
#   structure?" diagnostic behind every seasonality/forecast choice
#   (a_seasonality_strength summarizes one decomposition; the ACF is the
#   raw instrument).
# - ``t_normalization_dedup_report``: duplicate rates under three
#   content normal forms — raw text, head-20-words, sorted word bag —
#   the pre-dedup audit that says WHICH canonicalization your corpus
#   needs (exact copies surface raw; truncated/appended variants
#   surface under the head form; reorderings under the bag form).
# ===========================================================================

@query(
    "a_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(value), 2) AS rev
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, rev,
             date_diff('day', min(day) OVER (PARTITION BY event_type), day)
               AS x
      FROM daily
    ),
    slopes AS (
      SELECT a.event_type,
             (b.rev - a.rev) * 1.0 / (b.x - a.x) AS slope
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM slopes
    ),
    med AS (
      SELECT event_type, avg(slope) AS ts_slope, max(n) AS n_pairs
      FROM ranked
      WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
      GROUP BY event_type
    ),
    ols AS (
      SELECT event_type,
             (avg(x * 1.0 * rev) - avg(x * 1.0) * avg(rev))
               / NULLIF(avg(x * 1.0 * x) - avg(x * 1.0) * avg(x * 1.0), 0)
               AS ols_slope,
             CAST(count(*) AS BIGINT) AS n_days
      FROM idx GROUP BY event_type
    )
    SELECT o.event_type, o.n_days,
           CAST(m.n_pairs AS BIGINT) AS n_pairs,
           round(m.ts_slope, 4) AS theil_sen_slope,
           round(o.ols_slope, 4) AS ols_slope
    FROM ols o JOIN med m ON m.event_type = o.event_type
    ORDER BY o.event_type
    """,
)
def a_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the median of all
    pairwise daily-revenue slopes, reported beside the OLS slope on
    the same series — when the two disagree, an outlier day is
    dragging least-squares (Theil–Sen tolerates ~29% contamination;
    OLS tolerates none). Median = mean of the middle one/two ranked
    slopes; x is the day offset from the series start, so slopes are
    per-day units on both engines.

    Scale shape: the pairwise self-join is over the DAILY frame —
    bounded by days², not events (30 days → 435 pairs per type); the
    median is a rank window over each type's slope set; OLS folds from
    the same daily frame's moments. For year-scale series (365² pairs
    per type ~ 66k rows) this stays trivially small; the classic
    O(n log n) repeated-median refinement is the upgrade path beyond
    that.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    idx = daily.select(
        "event_type",
        "rev",
        F.datediff(
            "day", F.min("day").over(W.partitionBy("event_type"))
        ).alias("x"),
    )
    a, b = idx.alias("a"), idx.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.rev") - F.col("a.rev")) * 1.0
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
    )
    wr = W.partitionBy("event_type").orderBy("slope")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(W.partitionBy("event_type")).alias("n"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .groupBy("event_type")
        .agg(
            F.avg("slope").alias("ts_slope"),
            F.max("n").cast("long").alias("n_pairs"),
        )
    )
    x = F.col("x") * 1.0
    ols = idx.groupBy("event_type").agg(
        (
            (F.avg(x * F.col("rev")) - F.avg(x) * F.avg("rev"))
            / F.nullif(F.avg(x * x) - F.avg(x) * F.avg(x), F.lit(0.0))
        ).alias("ols_slope"),
        F.count("*").alias("n_days"),
    )
    return (
        ols.join(med, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            F.round("ts_slope", 4).alias("theil_sen_slope"),
            F.round("ols_slope", 4).alias("ols_slope"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# section consolidated from plans/round6l_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 11: censored survival analysis and the
# partition-skew planner.
#
# - ``a_survival_km``: the Kaplan–Meier survival curve for
#   time-to-high-value-purchase with RIGHT-CENSORING — users who never
#   reach the event are censored at their last activity instead of being
#   dropped (b_time_to_convert reports uncensored conversion lags; KM is
#   the correct estimator when some subjects haven't converted YET, the
#   standard churn/retention statistic).
# - ``p_partition_skew_planner``: per join/aggregation key, the measured
#   key-frequency profile (cardinality, hottest key, exact p99) and the
#   DERIVED scale knobs — recommended shuffle-partition count and
#   per-hot-key salting factor — i.e. the engine measuring its own skew
#   dials instead of leaving them as prose (SCALING.md's salting and
#   AQE-skew sections reference exactly these numbers).
# ===========================================================================

_KM_VALUE_MIN = 98.0  # 'high-value purchase' event; ~18% of users never

@query(
    "a_survival_km",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS first_s,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s,
             CAST(floor(epoch(min(CASE WHEN event_type = 'purchase'
                                        AND value >= {_KM_VALUE_MIN}
                                       THEN ts END))) AS BIGINT) AS ev_s
      FROM events GROUP BY user_id
    ),
    durs AS (
      SELECT user_id,
             CASE WHEN ev_s IS NOT NULL THEN 1 ELSE 0 END AS ev,
             ((coalesce(ev_s, last_s) - first_s) * 100 + 1800) // 3600 AS dur
      FROM per_user
    ),
    ud AS (
      SELECT dur, count(*) AS c, sum(ev) AS d FROM durs GROUP BY dur
    ),
    risk AS (
      SELECT dur, c, d,
             (SELECT count(*) FROM durs) - coalesce(
               sum(c) OVER (ORDER BY dur
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS n_risk
      FROM ud
    ),
    terms AS (
      SELECT dur, d, n_risk,
             CASE WHEN d < n_risk THEN ln(1 - d * 1.0 / n_risk) END AS lt,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS zf
      FROM risk WHERE d > 0
    ),
    curve AS (
      SELECT dur, d, n_risk,
             sum(lt) OVER (ORDER BY dur) AS cum_lt,
             max(zf) OVER (ORDER BY dur) AS cum_zero
      FROM terms
    )
    SELECT dur / 100.0 AS t_hours,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN cum_zero = 1 THEN 0.0
                ELSE round(exp(cum_lt), 4) END AS survival
    FROM curve ORDER BY t_hours
    """,
)
def a_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-high-value
    purchase (value >= {98}), measured in hours from each user's first
    activity, with RIGHT-CENSORING at last activity for users who
    never reach the event (~18% here). At each event time t: n_risk =
    users whose duration >= t, and S(t) multiplies by (1 - d/n_risk)
    — the estimator that stays unbiased when some users simply haven't
    converted yet (dropping them, as a naive average does, biases the
    curve optimistic). A risk set exhausted by its own events (d =
    n_risk) pins the curve to exactly 0 from there on.

    Scale shape: one user-keyed shuffle builds (duration, event); the
    curve machinery runs entirely over the DISTINCT-DURATION frame —
    risk counts are an exclusive prefix sum and the product is
    exp(cumulative sum of logs), both windows over the bounded support,
    never user-sized partitions. Durations are EXACT integer
    centihours — half-up integer division, no float rounding in the
    group key (round(s/3600.0, 2) hit a .xx5 double-rounding boundary
    at sf0.1: Spark's BigDecimal HALF_UP said 134.3, DuckDB's
    double-repr round said 134.29 — the round-8 sf0.1 full replay
    caught it); the log-sum runs in the same dur order on both sides.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.unix_timestamp(F.min("ts")).alias("first_s"),
        F.unix_timestamp(F.max("ts")).alias("last_s"),
        F.unix_timestamp(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= _KM_VALUE_MIN),
                    F.col("ts"),
                )
            )
        ).alias("ev_s"),
    )
    durs = per_user.select(
        F.when(F.col("ev_s").isNotNull(), 1).otherwise(0).alias("ev"),
        F.expr(
            "((coalesce(ev_s, last_s) - first_s) * 100 + 1800) div 3600"
        ).alias("dur"),
    )
    ud = durs.groupBy("dur").agg(
        F.count("*").alias("c"), F.sum("ev").alias("d")
    )
    n_total = durs.agg(F.count("*").alias("nn"))
    wcum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    risk = (
        ud.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            F.col("nn") - F.coalesce(F.sum("c").over(wcum), F.lit(0)),
        )
        .filter(F.col("d") > 0)
    )
    terms = risk.select(
        "dur",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(1 - F.col("d") * 1.0 / F.col("n_risk")),
        ).alias("lt"),
        (F.col("d") >= F.col("n_risk")).cast("int").alias("zf"),
    )
    wall = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        terms.select(
            (F.col("dur") / 100.0).alias("t_hours"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.when(F.max("zf").over(wall) == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.sum("lt").over(wall)), 4))
            .alias("survival"),
        )
        .orderBy("t_hours")
    )


# ===========================================================================
# section consolidated from plans/round6n_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

_BH_ALPHA = 0.05

@query(
    "a_bh_fdr",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 'we' ELSE 'wd' END
               AS grp,
             count(*) AS n, avg(value) AS m, var_samp(value) AS v
      FROM events GROUP BY 1, 2
    ),
    z AS (
      SELECT a.event_type,
             round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS z
      FROM stats a JOIN stats b
        ON a.event_type = b.event_type AND a.grp = 'we' AND b.grp = 'wd'
    ),
    p AS (
      SELECT event_type, round(z, 3) AS z_stat,
             round(2 * (1 - 1 / (1 + exp(-1.702 * abs(z)))), 6) AS p_value
      FROM z
    ),
    ranked AS (
      SELECT event_type, z_stat, p_value,
             row_number() OVER (ORDER BY p_value, event_type) AS rn,
             count(*) OVER () AS m
      FROM p
    ),
    cut AS (
      SELECT coalesce(max(CASE WHEN p_value <= rn * {_BH_ALPHA} / m
                                THEN rn END) OVER (), 0) AS k,
             event_type, z_stat, p_value, rn, m
      FROM ranked
    )
    SELECT event_type, z_stat, p_value,
           CAST(rn AS BIGINT) AS p_rank,
           round(rn * {_BH_ALPHA} / m, 6) AS bh_threshold,
           CAST(rn <= k AS BOOLEAN) AS rejected
    FROM cut ORDER BY p_rank
    """,
)
def a_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over the per-event-type
    weekend-vs-weekday mean-value Welch tests: p-values (two-sided,
    logistic normal approximation on the rounded z) are ranked
    ascending, k = the largest rank with p <= rank/m * alpha, and
    hypotheses 1..k are rejected — including ranks whose OWN p exceeds
    their threshold (the step-up property a naive per-row comparison
    gets wrong). Five uncorrected tests at alpha=0.05 carry ~23%
    family-wise false-positive risk; BH caps the expected FALSE
    DISCOVERY fraction at alpha instead.

    Scale shape: ONE map-side-combined conditional-moment aggregate
    per event type (both arms fold in the same pass — no self-join, a
    single events scan); everything after — Welch fold, p-values,
    ranking, the step-up max — lives on the HYPOTHESES-sized frame
    (m rows). z is rounded before the CDF so both engines rank
    identical p-values; ties break on event_type.
    """
    ev = load_table(spark, sf_dir, "events")
    we = F.dayofweek("ts").isin(1, 7)
    v_we = F.when(we, F.col("value"))
    v_wd = F.when(~we, F.col("value"))
    stats = ev.groupBy("event_type").agg(
        F.count(v_we).alias("n_we"),
        F.avg(v_we).alias("m_we"),
        F.var_samp(v_we).alias("v_we"),
        F.count(v_wd).alias("n_wd"),
        F.avg(v_wd).alias("m_wd"),
        F.var_samp(v_wd).alias("v_wd"),
    )
    z = stats.select(
        "event_type",
        F.round(
            (F.col("m_we") - F.col("m_wd"))
            / F.sqrt(
                F.col("v_we") / F.col("n_we")
                + F.col("v_wd") / F.col("n_wd")
            ),
            6,
        ).alias("z"),
    )
    p = z.select(
        "event_type",
        F.round("z", 3).alias("z_stat"),
        F.round(
            2 * (1 - 1 / (1 + F.exp(-1.702 * F.abs(F.col("z"))))), 6
        ).alias("p_value"),
    )
    ranked = p.select(
        "event_type",
        "z_stat",
        "p_value",
        F.row_number()
        .over(W.orderBy("p_value", "event_type"))
        .alias("rn"),
        F.count("*").over(W.partitionBy()).alias("m"),
    )
    k = F.max(
        F.when(
            F.col("p_value") <= F.col("rn") * _BH_ALPHA / F.col("m"),
            F.col("rn"),
        )
    ).over(W.partitionBy())
    return (
        ranked.select(
            "event_type",
            "z_stat",
            "p_value",
            F.col("rn").cast("long").alias("p_rank"),
            F.round(F.col("rn") * _BH_ALPHA / F.col("m"), 6).alias(
                "bh_threshold"
            ),
            (F.col("rn") <= F.coalesce(k, F.lit(0))).alias("rejected"),
        )
        .orderBy("p_rank")
    )


# ===========================================================================
# section consolidated from plans/round7b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/curation.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession

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
