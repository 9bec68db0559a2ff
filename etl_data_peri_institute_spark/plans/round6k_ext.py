"""Round-6 continuation, batch 10: robust trend estimation, the ACF
report, and normalization-form dedup rates.

- ``a_theil_sen_trend``: Theil–Sen slope (median of pairwise slopes)
  per event type, side by side with the OLS slope — the robust trend
  estimator a single outlier day cannot drag (a_ols_trend's breakdown
  point is 0; Theil–Sen's is ~29%).
- ``ts_autocorrelation_report``: the sample ACF at lags {1, 2, 7} per
  event type over the daily revenue series — the standard "is there
  structure?" diagnostic behind every seasonality/forecast choice
  (a_seasonality_strength summarizes one decomposition; the ACF is the
  raw instrument).
- ``t_normalization_dedup_report``: duplicate rates under three
  content normal forms — raw text, head-20-words, sorted word bag —
  the pre-dedup audit that says WHICH canonicalization your corpus
  needs (exact copies surface raw; truncated/appended variants
  surface under the head form; reorderings under the bag form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.tables import load_table
from .catalog import query
from .round6h_ext import _AUG_SQL, _augmented_corpus

# --------------------------------------------------------------------------
# a_theil_sen_trend
# --------------------------------------------------------------------------


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


# --------------------------------------------------------------------------
# ts_autocorrelation_report
# --------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 7)


def _acf_oracle() -> str:
    selects = []
    for k in _ACF_LAGS:
        selects.append(
            f"""
    SELECT event_type, CAST({k} AS INT) AS lag,
           CAST(count(cl) AS BIGINT) AS n_pairs,
           round(sum(c * cl) / NULLIF(max(ssq), 0), 4) AS acf
    FROM (
      SELECT event_type, c, ssq,
             lag(c, {k}) OVER (PARTITION BY event_type ORDER BY day) AS cl
      FROM dev
    )
    WHERE cl IS NOT NULL
    GROUP BY event_type"""
        )
    union = " UNION ALL ".join(selects)
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(value), 2) AS rev
      FROM events GROUP BY 1, 2
    ),
    means AS (SELECT event_type, avg(rev) AS m FROM daily GROUP BY 1),
    cen AS (
      SELECT d.event_type, d.day, d.rev - mn.m AS c
      FROM daily d JOIN means mn ON mn.event_type = d.event_type
    ),
    ssqs AS (SELECT event_type, sum(c * c) AS ssq FROM cen GROUP BY 1),
    dev AS (
      SELECT c.event_type, c.day, c.c, s.ssq
      FROM cen c JOIN ssqs s ON s.event_type = c.event_type
    )
    SELECT event_type, lag, n_pairs, acf
    FROM ({union})
    ORDER BY event_type, lag
    """


@query("ts_autocorrelation_report", oracle=_acf_oracle())
def ts_autocorrelation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of daily revenue per event type at lags
    {1, 2, 7}: r_k = sum((x_t - xbar)(x_{{t-k}} - xbar)) / sum((x_t -
    xbar)^2), the standard ACF normalization (overall mean and total
    sum of squares, so r_k across lags are comparable). Lag 7 reads
    weekly seasonality directly; lags 1-2 read short-term persistence
    — the raw diagnostic behind every seasonality/forecast choice.

    Scale shape: one map-side daily aggregate, then per-type mean /
    total-SS / lagged values all share ONE window partitioning over
    the bounded day series; each lag is a filter + fold over that
    frame. Cents rounding pins the support across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    means = daily.groupBy("event_type").agg(F.avg("rev").alias("m"))
    cen = daily.join(F.broadcast(means), "event_type").select(
        "event_type", "day", (F.col("rev") - F.col("m")).alias("c")
    )
    ssqs = cen.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).alias("ssq")
    )
    wo = W.partitionBy("event_type").orderBy("day")
    dev = cen.join(F.broadcast(ssqs), "event_type").select(
        "event_type",
        "day",
        "c",
        "ssq",
        *[F.lag("c", k).over(wo).alias(f"cl{k}") for k in _ACF_LAGS],
    )
    outs = []
    for k in _ACF_LAGS:
        cl = F.col(f"cl{k}")
        outs.append(
            dev.filter(cl.isNotNull())
            .groupBy("event_type")
            .agg(
                F.lit(k).cast("int").alias("lag"),
                F.count(cl).cast("long").alias("n_pairs"),
                F.round(
                    F.sum(F.col("c") * cl)
                    / F.nullif(F.max("ssq"), F.lit(0.0)),
                    4,
                ).alias("acf"),
            )
            .select("event_type", "lag", "n_pairs", "acf")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("event_type", "lag")


# --------------------------------------------------------------------------
# t_normalization_dedup_report
# --------------------------------------------------------------------------

_HEAD_WORDS = 20


@query(
    "t_normalization_dedup_report",
    oracle=f"""
    WITH {_AUG_SQL.strip()},
    forms AS (
      SELECT 'raw' AS form, md5(text) AS h FROM aug
      UNION ALL
      SELECT 'head{_HEAD_WORDS}',
             md5(array_to_string(
               list_slice(string_split(text, ' '), 1, {_HEAD_WORDS}), ' '))
      FROM aug
      UNION ALL
      SELECT 'word_bag',
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' '))
      FROM aug
    )
    SELECT form,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
           round(1 - count(DISTINCT h) * 1.0 / count(*), 4) AS dup_rate
    FROM forms
    GROUP BY form
    ORDER BY form
    """,
)
def t_normalization_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate rates under three content normal forms over the
    near-dup-augmented corpus: raw text (exact copies only),
    head-{20}-words (catches truncated/appended variants — the
    injected 70%-truncations share their head with the original), and
    the sorted word bag (catches reorderings). The pre-dedup audit
    that says WHICH canonicalization this corpus needs before the d_*
    operators run — each form's dup_rate is the yield that
    canonicalization would add.

    Scale shape: each form is a pure column expression (split / slice
    / sort / hash — no UDF) feeding one distinct-count aggregate;
    Spark rewrites the three count-distincts as expand + partial
    aggregation, so hot hashes combine map-side. Forms union into a
    3-row report.
    """
    corpus = _augmented_corpus(spark, sf_dir)
    w = F.split("text", " ")
    forms = (
        corpus.select(F.lit("raw").alias("form"), F.md5("text").alias("h"))
        .unionAll(
            corpus.select(
                F.lit(f"head{_HEAD_WORDS}").alias("form"),
                F.md5(
                    F.concat_ws(" ", F.slice(w, 1, _HEAD_WORDS))
                ).alias("h"),
            )
        )
        .unionAll(
            corpus.select(
                F.lit("word_bag").alias("form"),
                F.md5(
                    F.concat_ws(" ", F.array_sort(F.array_distinct(w)))
                ).alias("h"),
            )
        )
    )
    return (
        forms.groupBy("form")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_distinct"),
        )
        .select(
            "form",
            "n_docs",
            "n_distinct",
            F.round(
                1 - F.col("n_distinct") * 1.0 / F.col("n_docs"), 4
            ).alias("dup_rate"),
        )
        .orderBy("form")
    )
