"""Round-6 continuation, batch 9: IVF probe-count sweep, grouped
jackknife SE, and seasonal-naive anomaly flags.

- ``e_ivf_nprobe_sweep``: recall@3 and candidate volume for n_probe in
  {{1, 2, 4}} in one report — the ANN twin of d_minhash_band_sweep
  (e_ivf_recall_report measures ONE point on the recall/cost curve;
  production tuning needs the curve).
- ``a_jackknife_se``: delete-a-group jackknife standard error of the
  mean document length, leaving out one SOURCE at a time — the exact,
  deterministic resampling companion to a_bootstrap_ci (no randomness
  at all), plus the max-influence source (whose removal moves the
  estimate most — the "is one feed dominating this metric?" readout).
- ``ts_snaive_anomaly``: days whose seasonal-naive forecast residual
  exceeds 2 sigma, per event type — the alerting layer on top of
  ts_snaive_forecast_eval's backtest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.tables import load_table
from .catalog import query
from .round6i_ext import _SNAIVE_LAG

# --------------------------------------------------------------------------
# e_ivf_nprobe_sweep
# --------------------------------------------------------------------------

_SWEEP_PROBES = (1, 2, 4)
_SWEEP_K = 3
_SWEEP_NQ = 5  # queries: vec_id < 5


def _nprobe_sweep_oracle() -> str:
    from .llmdata_ext import _COSINE_SQL

    cos_qe = _COSINE_SQL.format(a="q.embedding", b="e.embedding")
    cfg_parts = []
    for p in _SWEEP_PROBES:
        cfg_parts.append(
            f"""
    cand_{p} AS (
      SELECT DISTINCT r.vec_id AS query_id, l.neighbor_id
      FROM ranked r JOIN lists l ON r.c_label = l.c_label
      WHERE r.rn <= {p} AND r.vec_id < {_SWEEP_NQ}
        AND l.neighbor_id <> r.vec_id
    ),
    top_{p} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY s.cos_sim DESC, s.neighbor_id) AS rn
        FROM (
          SELECT c.query_id, c.neighbor_id, {cos_qe} AS cos_sim
          FROM cand_{p} c
          JOIN embeddings q ON q.vec_id = c.query_id
          JOIN embeddings e ON e.vec_id = c.neighbor_id
        ) s
      ) WHERE rn <= {_SWEEP_K}
    )"""
        )
    selects = []
    for p in _SWEEP_PROBES:
        selects.append(
            f"""
    SELECT CAST({p} AS INT) AS n_probe,
           (SELECT count(*) FROM cand_{p}) AS n_candidates,
           (SELECT count(*) FROM exact_top) AS n_truth_pairs,
           (SELECT count(*) FROM exact_top t
            WHERE EXISTS (SELECT 1 FROM top_{p} i
                          WHERE i.query_id = t.query_id
                            AND i.neighbor_id = t.neighbor_id)) AS n_caught"""
        )
    cfg_sql = ",".join(cfg_parts)
    sel_sql = " UNION ALL ".join(selects)
    return f"""
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    centroids AS (
      SELECT label AS c_label, pos, avg(val) AS cval FROM pos GROUP BY label, pos
    ),
    dots AS (
      SELECT p.vec_id, c.c_label,
             sum(p.val * c.cval) AS dot,
             sqrt(sum(p.val * p.val)) AS vn,
             sqrt(sum(c.cval * c.cval)) AS cn
      FROM pos p JOIN centroids c ON p.pos = c.pos
      GROUP BY p.vec_id, c.c_label
    ),
    ranked AS (
      SELECT vec_id, c_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dot / (vn * cn) DESC, c_label) AS rn
      FROM dots
    ),
    lists AS (SELECT vec_id AS neighbor_id, c_label FROM ranked WHERE rn = 1),
    exact_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY s.cos_sim DESC, s.neighbor_id) AS rn
        FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 {cos_qe} AS cos_sim
          FROM embeddings q, embeddings e
          WHERE q.vec_id < {_SWEEP_NQ} AND e.vec_id <> q.vec_id
        ) s
      ) WHERE rn <= {_SWEEP_K}
    ),
    {cfg_sql}
    SELECT n_probe,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_truth_pairs AS BIGINT) AS n_truth_pairs,
           CAST(n_caught AS BIGINT) AS n_caught,
           round(n_caught * 1.0 / NULLIF(n_truth_pairs, 0), 4)
             AS recall_at_3
    FROM ({sel_sql})
    ORDER BY n_probe
    """


@query("e_ivf_nprobe_sweep", oracle=_nprobe_sweep_oracle())
def e_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe-count sweep: recall@{3} AND candidate volume for
    n_probe in {{1, 2, 4}} against the exact cosine top-{3} — the
    recall/cost CURVE (e_ivf_recall_report measures the n_probe=2
    point; this measures the dial, the ANN twin of
    d_minhash_band_sweep). More probed lists = more candidates scanned
    = higher recall; the report shows exactly what each extra probe
    buys.

    Scale shape: ONE centroid-assignment pass (ranked lists) feeds all
    three configs — each config is a filter rn <= p over the SAME
    ranked frame, a probed-list join bounded by its own candidate
    volume, and a per-query top-k window; the exact-truth side runs
    once (on a query sample at production scale — the standard recall
    protocol). Report is 3 rows of counts; rounded-cosine ranking with
    id tiebreaks keeps both engines deriving identical sets.
    """
    from ..operators.similarity import (
        centroids_by,
        cosine,
        knn_bruteforce,
        top_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _SWEEP_NQ)
    exact = knn_bruteforce(emb, queries, k=_SWEEP_K).select(
        "query_id", "neighbor_id"
    )
    exact = exact.localCheckpoint(eager=True)
    cents = centroids_by(emb, "label").localCheckpoint(eager=False)
    # ONE assignment pass for the corpus lists and the max-probe query
    # ranking; each config filters the same frames (the ivf_topk body,
    # opened up so the sweep can also count candidates per config)
    lists = top_centroids(emb, cents, 1).select(
        F.col("id").alias("neighbor_id"), "c_label"
    )
    probes_all = top_centroids(queries, cents, max(_SWEEP_PROBES)).select(
        F.col("id").alias("query_id"), "c_label", "rn"
    )
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__q"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__c"))
    t = exact.agg(F.count("*").alias("n_truth_pairs"))
    outs = []
    for p in _SWEEP_PROBES:
        cand = (
            probes_all.filter(F.col("rn") <= p)
            .drop("rn")
            .join(lists, "c_label")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
        )
        cand_n = cand.agg(F.count("*").alias("n_candidates"))
        sims = (
            cand.join(q, "query_id")
            .join(c, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                cosine(F.col("__q"), F.col("__c")).alias("cos_sim"),
            )
        )
        wk = W.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        topk = (
            sims.withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") <= _SWEEP_K)
            .select("query_id", "neighbor_id")
        )
        caught = exact.join(
            topk, ["query_id", "neighbor_id"], "left_semi"
        ).agg(F.count("*").alias("n_caught"))
        outs.append(
            t.crossJoin(F.broadcast(cand_n))
            .crossJoin(F.broadcast(caught))
            .select(
                F.lit(p).cast("int").alias("n_probe"),
                F.col("n_candidates").cast("long"),
                F.col("n_truth_pairs").cast("long"),
                F.col("n_caught").cast("long"),
                F.round(
                    F.col("n_caught")
                    * 1.0
                    / F.nullif(
                        F.col("n_truth_pairs").cast("long"),
                        F.lit(0).cast("long"),
                    ),
                    4,
                ).alias("recall_at_3"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("n_probe")


# --------------------------------------------------------------------------
# a_jackknife_se
# --------------------------------------------------------------------------


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


# --------------------------------------------------------------------------
# ts_snaive_anomaly
# --------------------------------------------------------------------------

_ANOM_SIGMA = 2.0


@query(
    "ts_snaive_anomaly",
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
    ),
    resid AS (
      SELECT event_type, day, rev, forecast, rev - forecast AS r
      FROM fc WHERE forecast IS NOT NULL
    ),
    sig AS (
      SELECT event_type,
             sqrt(greatest(avg(r * r) - avg(r) * avg(r), 0)) AS sigma,
             avg(r) AS rbar
      FROM resid GROUP BY event_type
    )
    SELECT r.event_type, r.day, r.rev, r.forecast,
           round((r.r - s.rbar) / NULLIF(s.sigma, 0), 2) AS z
    FROM resid r JOIN sig s ON s.event_type = r.event_type
    WHERE abs(r.r - s.rbar) > {_ANOM_SIGMA} * s.sigma
    ORDER BY r.event_type, r.day
    """,
)
def ts_snaive_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly flags: days whose forecast residual
    (actual - snaive forecast) deviates more than {2.0} sigma from the
    per-type mean residual — the alerting layer over
    ts_snaive_forecast_eval's backtest (a volume spike that the weekly
    pattern does not explain). Residual moments are population
    statistics over the scored days; z is reported per flagged day.

    Scale shape: the snaive frame (map-side daily aggregate + one lag
    window over the bounded day series) plus one per-type moment
    aggregate joined back onto the residuals — the flag filter and z
    are row-local. Cents rounding before the lag keeps both engines
    differencing identical numbers; the 2-sigma threshold compares the
    same doubles on both sides.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    w = W.partitionBy("event_type").orderBy("day")
    resid = (
        daily.withColumn("forecast", F.lag("rev", _SNAIVE_LAG).over(w))
        .filter(F.col("forecast").isNotNull())
        .withColumn("r", F.col("rev") - F.col("forecast"))
    )
    sig = resid.groupBy("event_type").agg(
        F.sqrt(
            F.greatest(
                F.avg(F.col("r") * F.col("r")) - F.avg("r") * F.avg("r"),
                F.lit(0.0),
            )
        ).alias("sigma"),
        F.avg("r").alias("rbar"),
    )
    return (
        resid.join(F.broadcast(sig), "event_type")
        .filter(
            F.abs(F.col("r") - F.col("rbar")) > _ANOM_SIGMA * F.col("sigma")
        )
        .select(
            "event_type",
            "day",
            "rev",
            "forecast",
            F.round(
                (F.col("r") - F.col("rbar"))
                / F.nullif("sigma", F.lit(0.0)),
                2,
            ).alias("z"),
        )
        .orderBy("event_type", "day")
    )
