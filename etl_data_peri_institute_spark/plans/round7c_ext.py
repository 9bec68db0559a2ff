"""Round-7 continuation operators, batch 3: product quantization and
seasonal decomposition.

- e_pq_codebook   — PQ codebook fit (m=4 subspaces × k=8 sub-centroids,
  one Lloyd iteration from deterministic seeds) + assignment census
- e_pq_fitted_adc_topk   — PQ asymmetric-distance top-k search (the
  distance-table lookup path real billion-vector ANN serves from)
- ts_seasonal_decompose — 7-day moving-average trend + day-of-week
  seasonal indices + seasonal-strength per event type

These complete the PQ story's TRAINING side: e_pq_recall_report
(plans/round4b_ext.py) measures ADC recall against a label-derived
codebook; here the codebook is actually FIT (Lloyd from data seeds —
what a production PQ index builds) and the ADC search ships the exact
d² beside each hit so quantization error is certified per row. At
100 TB the corpus is stored as m small codes per vector and a query
touches only an m×k distance table plus the code column — memory
traffic per candidate drops from d floats to m bytes.

Determinism discipline (same as e_kmeans_fit): seeds are the first k
vec_ids, every centroid component and distance is rounded to 6 decimals
on BOTH engines before comparisons, ties break on cid — the oracle and
Spark walk identical Lloyd steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

_PQ_M = 4          # subspaces
_PQ_SUBDIM = 16    # dims per subspace (4 × 16 = 64)
_PQ_K = 8          # sub-centroids per subspace (seeded from first 8 vecs)
_PQ_TOPK = 10


def _pq_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, ss, sp, val): embedding exploded to subspace-local
    coordinates. One posexplode; everything downstream groups on the
    (bounded) subspace keys."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "v")
    ).select(
        "vec_id",
        (F.col("p") / _PQ_SUBDIM).cast("int").alias("ss"),
        (F.col("p") % _PQ_SUBDIM).alias("sp"),
        F.col("v").cast("double").alias("val"),
    )


def _pq_fit(spark: SparkSession, sf_dir: str):
    """Shared fit: returns (sub, c1, a2) — exploded coords, the
    post-Lloyd codebook (ss, cid, sp, c), and the final assignment
    (vec_id, ss, cid)."""
    sub = _pq_positions(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.select("vec_id").orderBy("vec_id").limit(_PQ_K)
    c0 = (
        sub.join(F.broadcast(seeds), "vec_id")
        .select(
            F.col("vec_id").alias("cid"), "ss", "sp",
            F.round("val", 6).alias("c"),
        )
    )

    def assign(centroids: DataFrame) -> DataFrame:
        d2 = (
            sub.alias("p")
            .join(F.broadcast(centroids).alias("c"),
                  (F.col("p.ss") == F.col("c.ss")) & (F.col("p.sp") == F.col("c.sp")))
            .groupBy("p.vec_id", "p.ss", "c.cid")
            .agg(
                F.round(
                    F.sum((F.col("p.val") - F.col("c.c")) ** 2), 6
                ).alias("d2")
            )
        )
        rn = F.row_number().over(
            W.partitionBy("vec_id", "ss").orderBy("d2", "cid")
        )
        return d2.withColumn("rn", rn).where(F.col("rn") == 1).select(
            "vec_id", "ss", "cid"
        )

    a1 = assign(c0)
    c1 = (
        sub.join(a1, ["vec_id", "ss"])
        .groupBy("ss", "cid", "sp")
        .agg(F.round(F.avg("val"), 6).alias("c"))
    )
    a2 = assign(c1)
    return sub, c1, a2


# Shared SQL CTE prefix: the identical Lloyd walk in the oracle dialect.
_PQ_SQL_PREFIX = f"""
    WITH pos AS (
      SELECT vec_id,
             (i - 1) // {_PQ_SUBDIM} AS ss,
             (i - 1) % {_PQ_SUBDIM} AS sp,
             CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, ss, sp, round(val, 6) AS c
      FROM pos
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_PQ_K})
    ),
    d1 AS (
      SELECT p.vec_id, p.ss, c.cid,
             round(sum((p.val - c.c) * (p.val - c.c)), 6) AS d2
      FROM pos p JOIN c0 c ON c.ss = p.ss AND c.sp = p.sp
      GROUP BY 1, 2, 3
    ),
    a1 AS (
      SELECT vec_id, ss, cid FROM (
        SELECT vec_id, ss, cid,
               row_number() OVER (PARTITION BY vec_id, ss ORDER BY d2, cid) AS rn
        FROM d1
      ) WHERE rn = 1
    ),
    c1 AS (
      SELECT a.ss, a.cid, p.sp, round(avg(p.val), 6) AS c
      FROM a1 a JOIN pos p ON p.vec_id = a.vec_id AND p.ss = a.ss
      GROUP BY 1, 2, 3
    ),
    d2t AS (
      SELECT p.vec_id, p.ss, c.cid,
             round(sum((p.val - c.c) * (p.val - c.c)), 6) AS d2
      FROM pos p JOIN c1 c ON c.ss = p.ss AND c.sp = p.sp
      GROUP BY 1, 2, 3
    ),
    a2 AS (
      SELECT vec_id, ss, cid, d2 FROM (
        SELECT vec_id, ss, cid, d2,
               row_number() OVER (PARTITION BY vec_id, ss ORDER BY d2, cid) AS rn
        FROM d2t
      ) WHERE rn = 1
    )
"""


@query(
    "e_pq_codebook",
    oracle=_PQ_SQL_PREFIX
    + """
    SELECT ss, cid,
           CAST(count(*) AS BIGINT) AS n_assigned,
           round(avg(d2), 4) AS avg_d2
    FROM a2 GROUP BY ss, cid ORDER BY ss, cid
    """,
)
def e_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook FIT: split each 64-dim vector into
    m=4 independent 16-dim subspaces; per subspace run one Lloyd
    iteration (seeds = the first k=8 vec_ids' subvectors) and report
    the assignment census — vectors per (subspace, sub-centroid) and
    the mean residual d². The census is the training-side health check
    (dead centroids, unbalanced cells) before codes ship.

    Scale shape: one posexplode to subspace coordinates; centroids are
    an (m·k·subdim)-row frame — BROADCAST to every distance join, so
    fitting never shuffles the corpus; assignments are one groupBy per
    Lloyd step on (vec, subspace) keys. Corpus scans: 2 per iteration,
    independent of k. More Lloyd rounds = looping the same two joins
    (e_kmeans_fit's pattern, per subspace).
    """
    _sub, c1, _a2 = _pq_fit(spark, sf_dir)
    # recompute a2 WITH its d2 for the census (assign() drops d2)
    sub = _pq_positions(spark, sf_dir)
    d2 = (
        sub.alias("p")
        .join(F.broadcast(c1).alias("c"),
              (F.col("p.ss") == F.col("c.ss")) & (F.col("p.sp") == F.col("c.sp")))
        .groupBy("p.vec_id", "p.ss", "c.cid")
        .agg(F.round(F.sum((F.col("p.val") - F.col("c.c")) ** 2), 6).alias("d2"))
    )
    rn = F.row_number().over(W.partitionBy("vec_id", "ss").orderBy("d2", "cid"))
    a2 = d2.withColumn("rn", rn).where(F.col("rn") == 1)
    return (
        a2.groupBy("ss", "cid")
        .agg(
            F.count("*").cast("long").alias("n_assigned"),
            F.round(F.avg("d2"), 4).alias("avg_d2"),
        )
        .orderBy("ss", "cid")
    )


@query(
    "e_pq_fitted_adc_topk",
    oracle=_PQ_SQL_PREFIX
    + f"""
    , q AS (SELECT min(vec_id) AS qid FROM embeddings),
    lut AS (
      SELECT c.ss, c.cid,
             round(sum((p.val - c.c) * (p.val - c.c)), 6) AS ld
      FROM pos p JOIN c1 c ON c.ss = p.ss AND c.sp = p.sp
      WHERE p.vec_id = (SELECT qid FROM q)
      GROUP BY c.ss, c.cid
    ),
    adc AS (
      SELECT a.vec_id, round(sum(l.ld), 4) AS adc_d2
      FROM a2 a JOIN lut l ON l.ss = a.ss AND l.cid = a.cid
      WHERE a.vec_id <> (SELECT qid FROM q)
      GROUP BY a.vec_id
    ),
    exact AS (
      SELECT p.vec_id, round(sum((p.val - qp.val) * (p.val - qp.val)), 4) AS exact_d2
      FROM pos p
      JOIN pos qp ON qp.vec_id = (SELECT qid FROM q)
                 AND qp.ss = p.ss AND qp.sp = p.sp
      WHERE p.vec_id <> (SELECT qid FROM q)
      GROUP BY p.vec_id
    )
    SELECT a.vec_id, a.adc_d2, e.exact_d2,
           CAST(row_number() OVER (ORDER BY a.adc_d2, a.vec_id) AS BIGINT) AS rank
    FROM adc a JOIN exact e USING (vec_id)
    ORDER BY a.adc_d2, a.vec_id LIMIT {_PQ_TOPK}
    """,
)
def e_pq_fitted_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: the query stays FULL
    precision; every corpus vector is represented only by its m=4
    sub-centroid codes; distance = Σ_subspaces LUT[ss, code] where the
    LUT holds the query↔sub-centroid distances (m·k = 32 numbers
    computed once per query). The exact d² ships alongside so the gate
    also certifies the quantization error column-for-column.

    Scale shape: the LUT is query-sized (m·k rows) and broadcast; the
    corpus side touches ONLY the code table (vec_id, ss, cid — m small
    ints per vector, no floats), so the scan is a fraction of the raw
    embedding bytes and the top-k is one aggregate + ordered limit. At
    1000 executors the code table is the only thing that scales with
    the corpus — this is why PQ is the serving format for
    billion-vector indexes (combine with e_ivf_* list pruning for
    IVF-PQ). Exact-d² re-ranking of the ADC top-k (the standard
    refinement step) is e_knn_bruteforce's plan over {_PQ_TOPK} rows.
    """
    sub, c1, a2 = _pq_fit(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qid = emb.agg(F.min("vec_id")).collect()[0][0]  # 1 scalar, metadata-cheap
    qpos = sub.where(F.col("vec_id") == qid).select("ss", "sp", "val")
    lut = (
        qpos.alias("p")
        .join(F.broadcast(c1).alias("c"),
              (F.col("p.ss") == F.col("c.ss")) & (F.col("p.sp") == F.col("c.sp")))
        .groupBy("c.ss", "c.cid")
        .agg(F.round(F.sum((F.col("p.val") - F.col("c.c")) ** 2), 6).alias("ld"))
    )
    adc = (
        a2.where(F.col("vec_id") != qid)
        .join(F.broadcast(lut), ["ss", "cid"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("ld"), 4).alias("adc_d2"))
    )
    exact = (
        sub.where(F.col("vec_id") != qid)
        .alias("p")
        .join(F.broadcast(qpos).alias("q"),
              (F.col("p.ss") == F.col("q.ss")) & (F.col("p.sp") == F.col("q.sp")))
        .groupBy("p.vec_id")
        .agg(F.round(F.sum((F.col("p.val") - F.col("q.val")) ** 2), 4).alias("exact_d2"))
    )
    ranked = (
        adc.join(exact, "vec_id")
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy("adc_d2", "vec_id")).cast("long"),
        )
        .orderBy("adc_d2", "vec_id")
        .limit(_PQ_TOPK)
    )
    return ranked.select("vec_id", "adc_d2", "exact_d2", "rank")


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    trended AS (
      SELECT event_type, d, n,
             avg(n) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      FROM daily
    ),
    det AS (
      SELECT event_type, dayofweek(d) AS dow, d, n - trend AS detr
      FROM trended
    ),
    seas AS (
      SELECT event_type, dow, avg(detr) AS s, count(*) AS n_days
      FROM det GROUP BY 1, 2
    ),
    rem AS (
      SELECT det.event_type, det.dow,
             det.detr, det.detr - seas.s AS r
      FROM det JOIN seas USING (event_type, dow)
    ),
    strength AS (
      SELECT event_type,
             round(greatest(0, 1 - var_samp(r) / var_samp(detr)), 4) AS seasonal_strength
      FROM rem GROUP BY event_type
    )
    SELECT s.event_type, s.dow,
           round(s.s, 4) AS seasonal_idx,
           CAST(s.n_days AS BIGINT) AS n_days,
           st.seasonal_strength
    FROM seas s JOIN strength st USING (event_type)
    ORDER BY s.event_type, s.dow
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the per-type daily count
    series: trend = centered 7-day moving average (rows frame — the
    series is dense daily), seasonal index = mean detrended value per
    day-of-week, remainder = detrended − seasonal, and the
    seasonal-strength statistic 1 − Var(remainder)/Var(detrended)
    (Hyndman's Fₛ, clamped at 0) that says whether the weekly cycle is
    signal or noise. The STL-lite every capacity/anomaly pipeline runs
    before picking ts_snaive vs flat baselines.

    Scale shape: the daily aggregate is the only corpus-sized groupBy
    (map-side combined); everything after runs on the days×types frame
    (bounded by calendar length), where per-type windows partition on
    event_type — no global window, no data-sized shuffle. dayofweek is
    engine-aligned (both 1=Sunday..7=Saturday on DuckDB vs Spark:
    DuckDB dayofweek is 0-6 Sunday-start — offset +1 NOT applied;
    values only need to AGREE per day, and both engines derive them
    from the same dates deterministically).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("n"))
    trend_w = (
        W.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    )
    det = daily.select(
        "event_type",
        F.dayofweek("d").alias("dow_spark"),
        "d",
        (F.col("n") - F.avg("n").over(trend_w)).alias("detr"),
    )
    # Align day-of-week numbering to the oracle: DuckDB dayofweek is
    # 0=Sunday..6=Saturday; Spark dayofweek is 1=Sunday..7=Saturday.
    det = det.withColumn("dow", F.col("dow_spark") - 1).drop("dow_spark")
    seas = det.groupBy("event_type", "dow").agg(
        F.avg("detr").alias("s"), F.count("*").alias("n_days")
    )
    rem = det.join(seas.select("event_type", "dow", "s"), ["event_type", "dow"]).select(
        "event_type", "detr", (F.col("detr") - F.col("s")).alias("r")
    )
    strength = rem.groupBy("event_type").agg(
        F.round(
            F.greatest(F.lit(0.0), 1 - F.var_samp("r") / F.var_samp("detr")), 4
        ).alias("seasonal_strength")
    )
    return (
        seas.join(strength, "event_type")
        .select(
            "event_type",
            "dow",
            F.round("s", 4).alias("seasonal_idx"),
            F.col("n_days").cast("long").alias("n_days"),
            "seasonal_strength",
        )
        .orderBy("event_type", "dow")
    )
