"""Round-8 operators: depth items closing measured gaps only (round-7
verdict item 6 — no breadth registrations).

- e_ivf_balanced_assign — capacity-constrained IVF list assignment
  (FAISS balanced-k-means shape: cap = ceil(N/K), overflow spills to
  the vector's second-nearest centroid). Closes the measured gap
  between p_partition_skew_planner (which MEASURES hot-key skew and
  derives salt factors for shuffle keys) and e_ivf_assign (whose lists
  are unbounded): an IVF list is exactly such a key — at 100 TB the
  hottest list dominates every probe that touches it, and the planner's
  own remedy (bound the per-key row count) applied to ANN assignment is
  capacity-balanced lists. The census this query emits (per-list load
  factor before/after) is the measured dial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

# Balance target: cap = ceil(N / K) — exact balance, every list bounded
# by the mean. Overflow (the |list| - cap FARTHEST members, so the
# closest vectors keep their best list) moves to its second-nearest
# centroid; one spill round, the standard balanced-assignment
# compromise (a second round changes assignments for <cap^2/N vectors
# on real distributions and is not worth a second shuffle).
_BAL_ORACLE = """
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cents AS (
      SELECT label AS c_label, pos, avg(val) AS cval FROM pos GROUP BY 1, 2
    ),
    dots AS (
      SELECT p.vec_id AS id, c.c_label,
             sum(p.val * c.cval)
               / (sqrt(sum(p.val * p.val)) * sqrt(sum(c.cval * c.cval)))
               AS cos_sim
      FROM pos p JOIN cents c ON p.pos = c.pos
      GROUP BY 1, 2
    ),
    t2 AS (
      SELECT id, c_label, cos_sim,
             row_number() OVER (PARTITION BY id
                                ORDER BY cos_sim DESC, c_label) AS rn
      FROM dots
    ),
    stats AS (
      SELECT count(*) AS n_tot, count(DISTINCT label) AS k_lists
      FROM embeddings
    ),
    prim AS (
      SELECT id, c_label,
             row_number() OVER (PARTITION BY c_label
                                ORDER BY round(cos_sim, 6) DESC, id) AS caprank
      FROM t2 WHERE rn = 1
    ),
    capped AS (
      SELECT p.*, CAST(ceil(s.n_tot * 1.0 / s.k_lists) AS BIGINT) AS cap
      FROM prim p CROSS JOIN stats s
    ),
    spill AS (
      SELECT c.id, t.c_label AS spill_label
      FROM capped c JOIN t2 t ON t.id = c.id AND t.rn = 2
      WHERE c.caprank > c.cap
    ),
    p_agg AS (SELECT c_label, count(*) AS n_primary FROM prim GROUP BY 1),
    k_agg AS (
      SELECT c_label, count(*) AS n_kept FROM capped
      WHERE caprank <= cap GROUP BY 1
    ),
    s_agg AS (
      SELECT spill_label AS c_label, count(*) AS n_spill_in
      FROM spill GROUP BY 1
    )
    SELECT b.c_label,
           CAST(coalesce(p.n_primary, 0) AS BIGINT) AS n_primary,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(p.n_primary, 0) - coalesce(k.n_kept, 0) AS BIGINT)
             AS n_spill_out,
           CAST(coalesce(s.n_spill_in, 0) AS BIGINT) AS n_spill_in,
           CAST(coalesce(k.n_kept, 0) + coalesce(s.n_spill_in, 0) AS BIGINT)
             AS n_final,
           round(coalesce(p.n_primary, 0) * st.k_lists * 1.0 / st.n_tot, 4)
             AS load_before,
           round((coalesce(k.n_kept, 0) + coalesce(s.n_spill_in, 0))
                 * st.k_lists * 1.0 / st.n_tot, 4) AS load_after
    FROM (SELECT DISTINCT c_label FROM cents) b
    LEFT JOIN p_agg p USING (c_label)
    LEFT JOIN k_agg k USING (c_label)
    LEFT JOIN s_agg s USING (c_label)
    CROSS JOIN stats st
    ORDER BY b.c_label
"""


@query("e_ivf_balanced_assign", oracle=_BAL_ORACLE)
def e_ivf_balanced_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-balanced IVF assignment census: every list is capped at
    ceil(N/K); within a list, members rank by cosine (closest keep the
    list) and the overflow spills to its second-nearest centroid.
    Output per list: primary/kept/spill-out/spill-in/final counts and
    the load factor (list size × K / N — 1.0 is perfect balance)
    before and after balancing.

    Measured gap this closes (round-7 verdict item 6):
    p_partition_skew_planner derives salt factors from measured hot-KEY
    row counts, but e_ivf_assign's lists — the hot keys of every ANN
    probe — had no bounding mechanism: the probe that hits the hottest
    list pays its full size, and at 100 TB the p99 probe latency IS the
    hot list. Capacity-constrained assignment (the FAISS balanced
    k-means shape) bounds every list by construction; this census
    measures the dial (load_before vs load_after).

    Scale shape: ONE top-2-centroid pass over the corpus (broadcast
    K-row centroid table, posexplode + map-side-combined dot products);
    the spill target rides along as lead(c_label) over the SAME
    id-partitioned window top_centroids already shuffled for (no
    second corpus pass, no spill join); one capacity window per list
    (partitioned by c_label — never global); then a single
    contribution explode (1 row kept / 2 rows spilled) folds primary,
    kept, and spill-in counts in ONE label-keyed groupBy. The 1-row
    (N, K) stats frame is a broadcast crossJoin attachment (the
    audited q11 global-threshold pattern).
    """
    from ..operators.similarity import centroids_by, top_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroids_by(emb, "label").localCheckpoint(eager=False)
    t2 = top_centroids(emb, cents, n=2, keep_sim=True)
    stats = emb.agg(
        F.count("*").alias("n_tot"),
        F.countDistinct("label").alias("k_lists"),
    )
    caprank = F.row_number().over(
        W.partitionBy("c_label").orderBy(F.round("cos_sim", 6).desc(), F.asc("id"))
    )
    prim = (
        t2.withColumn(
            "spill_label",
            F.lead("c_label").over(W.partitionBy("id").orderBy("rn")),
        )
        .where(F.col("rn") == 1)
        .withColumn("caprank", caprank)
        .crossJoin(F.broadcast(stats))
        .withColumn("cap", F.ceil(F.col("n_tot") / F.col("k_lists")))
    )

    def entry(lbl, p, k, i):
        return F.struct(
            lbl.alias("lbl"),
            F.lit(p).alias("p"),
            F.lit(k).alias("k"),
            F.lit(i).alias("i"),
        )

    contrib = prim.select(
        F.explode(
            F.when(
                F.col("caprank") <= F.col("cap"),
                F.array(entry(F.col("c_label"), 1, 1, 0)),
            ).otherwise(
                F.array(
                    entry(F.col("c_label"), 1, 0, 0),
                    entry(F.col("spill_label"), 0, 0, 1),
                )
            )
        ).alias("e")
    )
    census = contrib.groupBy(F.col("e.lbl").alias("c_label")).agg(
        F.sum("e.p").alias("n_primary"),
        F.sum("e.k").alias("n_kept"),
        F.sum("e.i").alias("n_spill_in"),
    )
    n_primary = F.coalesce("n_primary", F.lit(0))
    n_kept = F.coalesce("n_kept", F.lit(0))
    n_in = F.coalesce("n_spill_in", F.lit(0))
    return (
        cents.select("c_label")
        .distinct()
        .join(census, "c_label", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "c_label",
            n_primary.cast("long").alias("n_primary"),
            n_kept.cast("long").alias("n_kept"),
            (n_primary - n_kept).cast("long").alias("n_spill_out"),
            n_in.cast("long").alias("n_spill_in"),
            (n_kept + n_in).cast("long").alias("n_final"),
            F.round(n_primary * F.col("k_lists") / F.col("n_tot"), 4).alias(
                "load_before"
            ),
            F.round((n_kept + n_in) * F.col("k_lists") / F.col("n_tot"), 4).alias(
                "load_after"
            ),
        )
        .orderBy("c_label")
    )
