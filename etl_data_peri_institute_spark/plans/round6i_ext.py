"""Round-6 continuation, batch 8: classifier-eval confusion matrix,
seasonal-naive forecast backtest, the dedup pipeline funnel, and a
deterministic bootstrap CI.

Four more first-class operators (north-star extensions):

- ``t_langid_confusion``: confusion matrix + per-language recall of the
  t_langid marker classifier against the labeled ``lang`` column — the
  eval loop for any heuristic/model column (precision of the quality
  classifier is the #1 question about it).
- ``ts_snaive_forecast_eval``: seasonal-naive backtest (forecast = the
  value 7 daily rows earlier) with MAE/MAPE per event type — the
  baseline every forecasting pipeline must beat, and the eval harness
  that measures it.
- ``d_dedup_pipeline_funnel``: document survival through the dedup
  cascade (raw → exact → near-dup) per source — the one-glance report
  of how much each stage removes (the "pipeline glue" view over the
  operators the d_* family provides individually).
- ``a_bootstrap_ci``: nonparametric bootstrap CI for the mean purchase
  value via DETERMINISTIC Poisson(1) resampling weights (inverse-CDF
  of a content-hash uniform — never rand(), so replicas and engines
  agree bit-for-bit) — simulation-at-scale as one explode + two
  bounded aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.tables import load_table
from .catalog import query
from .llmdata import _LANG_MARKERS, _hex4_to_int_sql
from .round6h_ext import _AUG_SQL, _augmented_corpus

# --------------------------------------------------------------------------
# t_langid_confusion
# --------------------------------------------------------------------------

_LANGID_SCORES_SQL = ", ".join(
    "CAST(sum(CASE WHEN word IN {m} THEN 1 ELSE 0 END) AS BIGINT) AS s_{k}".format(
        m=m, k=k
    )
    for k, m in _LANG_MARKERS.items()
)


@query(
    "t_langid_confusion",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    scores AS (
      SELECT doc_id, {_LANGID_SCORES_SQL}
      FROM tokens GROUP BY doc_id
    ),
    pred AS (
      SELECT doc_id,
             CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                  WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                  ELSE 'fr' END AS predicted_lang
      FROM scores
    ),
    cm AS (
      SELECT d.lang AS actual_lang, p.predicted_lang,
             CAST(count(*) AS BIGINT) AS n
      FROM documents d JOIN pred p ON p.doc_id = d.doc_id
      GROUP BY 1, 2
    )
    SELECT actual_lang, predicted_lang, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY actual_lang), 4)
             AS share_of_actual
    FROM cm
    ORDER BY actual_lang, predicted_lang
    """,
)
def t_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the t_langid marker classifier against the
    labeled ``lang`` column: per (actual, predicted) cell, the count
    and the share of that actual language (the diagonal shares ARE
    per-language recall; 'zh' has no marker set, so its row shows
    exactly where an out-of-vocabulary language lands — 'und' if no
    markers fire). This is the eval harness any derived label column
    needs before it gates a pipeline.

    Scale shape: re-runs the t_langid aggregation (one token explode
    collapsing map-side to per-doc marker counts), joins the doc-sized
    prediction frame to the label column, and reduces to a
    |langs|x|langs+1| matrix; the share window runs over that bounded
    matrix, never data-sized frames.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    aggs = [
        F.sum(F.col("word").isin(*m).cast("int")).cast("long").alias(f"s_{k}")
        for k, m in _LANG_MARKERS.items()
    ]
    scores = tokens.groupBy("doc_id").agg(*aggs)
    best = F.greatest(*[F.col(f"s_{k}") for k in _LANG_MARKERS])
    pred = F.when(best == 0, "und")
    for k in _LANG_MARKERS:
        pred = pred.when(F.col(f"s_{k}") == best, k)
    pred_df = scores.select("doc_id", pred.alias("predicted_lang"))
    cm = (
        docs.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(pred_df, "doc_id")
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )
    return cm.select(
        "actual_lang",
        "predicted_lang",
        "n",
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(W.partitionBy("actual_lang")),
            4,
        ).alias("share_of_actual"),
    ).orderBy("actual_lang", "predicted_lang")


# --------------------------------------------------------------------------
# ts_snaive_forecast_eval
# --------------------------------------------------------------------------

_SNAIVE_LAG = 7


@query(
    "ts_snaive_forecast_eval",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(value), 2) AS rev
      FROM events GROUP BY 1, 2
    ),
    fc AS (
      SELECT event_type, day, rev,
             lag(rev, {_SNAIVE_LAG}) OVER (
               PARTITION BY event_type ORDER BY day
             ) AS forecast
      FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_scored,
           round(avg(abs(rev - forecast)), 2) AS mae,
           round(avg(abs(rev - forecast) / NULLIF(rev, 0)), 4) AS mape
    FROM fc WHERE forecast IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def ts_snaive_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: tomorrow's daily revenue per
    event type is forecast as the value {7} daily rows earlier (the
    weekly-seasonality baseline), scored with MAE and MAPE over every
    day that has a lag — the baseline any forecasting model must beat,
    and the harness that proves it. Lag is ROW-based over the observed
    daily series (a gap day shifts the reference; ts_gap_fill is the
    upstream densifier when calendar alignment is required).

    Scale shape: one map-side-combined daily aggregate (entity×days
    frame), one per-type lag window over that bounded series, and a
    per-type error fold. Revenue rounds to cents before the lag so
    both engines difference identical numbers; zero-revenue days drop
    out of MAPE via NULLIF (avg ignores NULL).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    w = W.partitionBy("event_type").orderBy("day")
    fc = daily.withColumn("forecast", F.lag("rev", _SNAIVE_LAG).over(w))
    err = F.abs(F.col("rev") - F.col("forecast"))
    return (
        fc.filter(F.col("forecast").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_days_scored"),
            F.round(F.avg(err), 2).alias("mae"),
            F.round(
                F.avg(err / F.nullif(F.col("rev"), F.lit(0.0))), 4
            ).alias("mape"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# d_dedup_pipeline_funnel
# --------------------------------------------------------------------------


@query(
    "d_dedup_pipeline_funnel",
    oracle=f"""
    WITH {_AUG_SQL.strip()},
    keyed AS (SELECT doc_id, source, md5(text) AS h FROM aug),
    exact_keep AS (
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM keyed
      ) WHERE rn = 1
    ),
    words AS (
      SELECT a.doc_id, string_split(a.text, ' ') AS w
      FROM aug a JOIN exact_keep k ON k.doc_id = a.doc_id
    ),
    shingles AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    nd_drop AS (
      SELECT DISTINCT i.id_b AS doc_id FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM shingles a JOIN shingles b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) i
      JOIN counts ca ON ca.doc_id = i.id_a
      JOIN counts cb ON cb.doc_id = i.id_b
      WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) > 0.5
    )
    SELECT k.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_exact,
           CAST(sum(CASE WHEN e.doc_id IS NOT NULL AND d.doc_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after_neardup,
           round(1 - sum(CASE WHEN e.doc_id IS NOT NULL AND d.doc_id IS NULL
                              THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS total_removal_rate
    FROM keyed k
    LEFT JOIN exact_keep e ON e.doc_id = k.doc_id
    LEFT JOIN nd_drop d ON d.doc_id = k.doc_id
    GROUP BY k.source
    ORDER BY k.source
    """,
)
def d_dedup_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup pipeline funnel over the near-dup-augmented corpus: per
    source, the document counts surviving each cascade stage — raw →
    exact content dedup (keep-min-id per md5) → near-dup prune (drop
    the LARGER id of any surviving pair with shingle-Jaccard > 0.5;
    the single-pass greedy rule — d_dedup_components/d_dedup_apply is
    the transitive-closure upgrade) — plus the end-to-end removal
    rate. This is the one-glance report a dataset owner reads before
    shipping: which stage removes how much, per source.

    Scale shape: stage 1 is the exact-dedup keep-min shuffle on the
    content hash; stage 2 runs the bounded shingle-join ONLY over
    stage-1 survivors (the cascade's whole point: each stage shrinks
    the next stage's input); the funnel itself is two doc-sized
    left-join flags folded per source. Doc-frequency caps stay on in
    production exactly as in the d_* family.
    """
    corpus = _augmented_corpus(spark, sf_dir)
    keyed = corpus.select("doc_id", "source", F.md5("text").alias("h"))
    keep_rn = F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
    exact_keep = (
        keyed.withColumn("rn", keep_rn)
        .filter(F.col("rn") == 1)
        .select("doc_id")
        .withColumn("kept_exact", F.lit(1))
    )
    from ..operators.dedup import jaccard_pairs, word_shingles

    survivors = corpus.join(
        exact_keep.select("doc_id"), "doc_id", "left_semi"
    )
    nd_drop = (
        jaccard_pairs(
            word_shingles(survivors, distinct=True),
            min_jaccard=0.5,
            max_doc_freq=None,
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("nd_dropped", F.lit(1))
    )
    flagged = (
        keyed.select("doc_id", "source")
        .join(exact_keep, "doc_id", "left")
        .join(nd_drop, "doc_id", "left")
    )
    kept_final = (
        (F.col("kept_exact") == 1) & F.col("nd_dropped").isNull()
    ).cast("int")
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("kept_exact", F.lit(0)))
            .cast("long")
            .alias("n_after_exact"),
            F.sum(kept_final).cast("long").alias("n_after_neardup"),
        )
        .select(
            "source",
            "n_docs",
            "n_after_exact",
            "n_after_neardup",
            F.round(
                1 - F.col("n_after_neardup") * 1.0 / F.col("n_docs"), 4
            ).alias("total_removal_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# a_bootstrap_ci
# --------------------------------------------------------------------------

_BOOT_B = 200
# Poisson(1) inverse-CDF thresholds (cumulative probabilities for
# w = 0, 1, 2, 3, 4; anything above the last gets w = 5). Literals on
# both engines so the deterministic hash-uniform maps identically.
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
