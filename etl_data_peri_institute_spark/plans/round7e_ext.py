"""Round-7 continuation operators, batch 5: IVF-PQ composition, ratio
metrics, community quality.

- e_ivf_pq_topk          — the full production ANN stack: IVF coarse
  probing bounds candidates to the probed lists, PQ asymmetric-distance
  ranks them from codes alone (FAISS ``IVFx,PQy`` shape)
- a_ratio_metric_delta_ci — delta-method CI for a user-clustered ratio
  metric (value per event with user-level variance)
- g_community_modularity  — Newman modularity of the deterministic LPA
  partition (composes round6f's lpa_state)

e_ivf_pq_topk completes the compression×pruning matrix: e_ivf_topk
(floats, pruned), e_sq_int8_topk (int8, unpruned), e_ivf_sq_topk
(int8, pruned), e_pq_fitted_adc_topk (codes, unpruned) — this is (codes,
pruned), the shape billion-vector serving actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query
from .round7c_ext import _PQ_K, _PQ_SQL_PREFIX, _PQ_SUBDIM, _pq_fit

_IVFPQ_NPROBE = 2
_IVFPQ_NQUERIES = 5  # vec_id < 5, matching e_ivf_sq_topk's query set
_IVFPQ_TOPK = 5


@query(
    "e_ivf_pq_topk",
    oracle=f"""
    WITH pos AS (
      SELECT vec_id,
             (i - 1) // {_PQ_SUBDIM} AS ss,
             (i - 1) % {_PQ_SUBDIM} AS sp,
             i AS pos,
             label,
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
      SELECT vec_id, ss, cid FROM (
        SELECT vec_id, ss, cid,
               row_number() OVER (PARTITION BY vec_id, ss ORDER BY d2, cid) AS rn
        FROM d2t
      ) WHERE rn = 1
    ),
    centroids AS (
      SELECT label AS c_label, pos, avg(val) AS cval FROM pos GROUP BY 1, 2
    ),
    cdots AS (
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
      FROM cdots
    ),
    lists AS (SELECT vec_id AS neighbor_id, c_label FROM ranked WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, c_label
      FROM ranked WHERE rn <= {_IVFPQ_NPROBE} AND vec_id < {_IVFPQ_NQUERIES}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, l.neighbor_id
      FROM probes p JOIN lists l ON p.c_label = l.c_label
      WHERE l.neighbor_id <> p.query_id
    ),
    lut AS (
      SELECT q.vec_id AS query_id, c.ss, c.cid,
             round(sum((q.val - c.c) * (q.val - c.c)), 6) AS ld
      FROM pos q JOIN c1 c ON c.ss = q.ss AND c.sp = q.sp
      WHERE q.vec_id < {_IVFPQ_NQUERIES}
      GROUP BY 1, 2, 3
    ),
    adc AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(sum(l.ld), 4) AS adc_d2
      FROM cand
      JOIN a2 ON a2.vec_id = cand.neighbor_id
      JOIN lut l ON l.query_id = cand.query_id
                AND l.ss = a2.ss AND l.cid = a2.cid
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_d2,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT query_id, neighbor_id, adc_d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_d2, neighbor_id) AS rn
      FROM adc
    ) WHERE rn <= {_IVFPQ_TOPK}
    ORDER BY query_id, rank
    """,
)
def e_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k — the production billion-vector serving shape: IVF
    coarse quantizer prunes each query to its {_IVFPQ_NPROBE} nearest
    lists, and candidates inside those lists are ranked by PQ
    asymmetric distance computed ENTIRELY from the m-byte code table +
    a per-query m×k lookup table. Neither the raw floats nor the
    unprobed lists are touched after indexing.

    Scale shape: candidate count = probed-list sizes (not N); per
    candidate the scan reads m small ints; the LUT is query-count ×
    m×k and broadcast. The two index artifacts (list assignment, PQ
    codes) are one-time corpus passes that persist as columns — exactly
    the layout a 100 TB vector store materializes. Recall tuning knobs
    are nprobe (e_ivf_nprobe_sweep measures that dial) and PQ m/k
    (e_pq_recall_report measures that one); exact re-rank of survivors
    is e_knn_bruteforce's plan over k rows.
    """
    from ..operators.similarity import centroids_by, top_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    _sub, c1, a2 = _pq_fit(spark, sf_dir)
    cents = centroids_by(emb, "label").localCheckpoint(eager=False)
    lists = top_centroids(emb, cents, n=1).select(
        F.col("id").alias("neighbor_id"), "c_label"
    )
    queries = emb.filter(F.col("vec_id") < _IVFPQ_NQUERIES)
    probes = top_centroids(queries, cents, n=_IVFPQ_NPROBE).select(
        F.col("id").alias("query_id"), "c_label"
    )
    cand = (
        probes.join(lists, "c_label")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qpos = (
        queries.select("vec_id", F.posexplode("embedding").alias("p", "v"))
        .select(
            F.col("vec_id").alias("query_id"),
            (F.col("p") / _PQ_SUBDIM).cast("int").alias("ss"),
            (F.col("p") % _PQ_SUBDIM).alias("sp"),
            F.col("v").cast("double").alias("val"),
        )
    )
    lut = (
        qpos.alias("q")
        .join(F.broadcast(c1).alias("c"),
              (F.col("q.ss") == F.col("c.ss")) & (F.col("q.sp") == F.col("c.sp")))
        .groupBy("q.query_id", "c.ss", "c.cid")
        .agg(F.round(F.sum((F.col("q.val") - F.col("c.c")) ** 2), 6).alias("ld"))
    )
    adc = (
        cand.join(a2, a2["vec_id"] == cand["neighbor_id"])
        .join(F.broadcast(lut), ["query_id", "ss", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("ld"), 4).alias("adc_d2"))
    )
    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    )
    return (
        adc.withColumn("rank", rn.cast("long"))
        .where(F.col("rank") <= _IVFPQ_TOPK)
        .orderBy("query_id", "rank")
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


@query(
    "a_ratio_metric_delta_ci",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             sum(value) AS x, count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT event_type,
             count(*) AS n,
             avg(x) AS mx, avg(y) AS my,
             var_samp(x) AS vx, var_samp(y) AS vy,
             covar_samp(x, y) AS cxy
      FROM per_user GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_users,
           round(mx / my, 6) AS ratio,
           round(sqrt((vx - 2 * (mx / my) * cxy
                       + (mx / my) * (mx / my) * vy) / n) / my, 6) AS se,
           round(mx / my - 1.96 * sqrt((vx - 2 * (mx / my) * cxy
                       + (mx / my) * (mx / my) * vy) / n) / my, 6) AS ci_lo,
           round(mx / my + 1.96 * sqrt((vx - 2 * (mx / my) * cxy
                       + (mx / my) * (mx / my) * vy) / n) / my, 6) AS ci_hi
    FROM mom ORDER BY event_type
    """,
)
def a_ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric with
    user-level clustering: value-per-event R = Σx_u / Σy_u where x_u /
    y_u are each user's value total and event count. Naively treating
    events as i.i.d. understates the variance whenever users contribute
    multiple events; the delta method (first-order Taylor) gives
    Var(R) ≈ (σ²_x − 2R·σ_xy + R²·σ²_y) / (n·ȳ²) over USERS — the
    standard correction every experimentation platform applies to
    per-user ratio metrics.

    Scale shape: one groupBy(event_type, user_id) with map-side
    combine, then an event-type-sized moment aggregate (var/covar are
    single-pass). Nothing is data-sized after the first aggregate; no
    resampling needed (contrast a_bootstrap_ci — the delta method is
    the closed-form fast path, the bootstrap the assumption-free one).
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("x"), F.count("*").alias("y")
    )
    mom = per_user.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    r = F.col("mx") / F.col("my")
    se = (
        F.sqrt(
            (F.col("vx") - 2 * r * F.col("cxy") + r * r * F.col("vy"))
            / F.col("n")
        )
        / F.col("my")
    )
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(r - 1.96 * se, 6).alias("ci_lo"),
        F.round(r + 1.96 * se, 6).alias("ci_hi"),
    ).orderBy("event_type")


# Modularity oracle: the LPA walk (identical to g_label_propagation's
# oracle) extended with degree/internal-edge accounting.
_MODULARITY_SQL = """
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    w AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS c
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    e AS (
      SELECT s1, s2 FROM (
        SELECT s1, s2, row_number() OVER (ORDER BY c DESC, s1, s2) AS rn FROM w
      ) WHERE rn <= 500
    ),
    sym AS (
      SELECT s1 AS a, s2 AS b FROM e UNION ALL SELECT s2, s1 FROM e
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
    nc1 AS (
      SELECT s.a AS node, l.label, count(*) AS c
      FROM sym s JOIN l0 l ON l.node = s.b
      GROUP BY s.a, l.label
    ),
    l1 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label
               ) AS rn
        FROM nc1
      ) WHERE rn = 1
    ),
    nc2 AS (
      SELECT s.a AS node, l.label, count(*) AS c
      FROM sym s JOIN l1 l ON l.node = s.b
      GROUP BY s.a, l.label
    ),
    l2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label
               ) AS rn
        FROM nc2
      ) WHERE rn = 1
    ),
    m AS (SELECT count(*) * 1.0 AS m FROM e),
    deg AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY a),
    comm AS (
      SELECT l2.label, count(*) AS n_members, sum(deg.d) AS degree_sum
      FROM l2 JOIN deg USING (node) GROUP BY l2.label
    ),
    internal AS (
      SELECT la.label, count(*) AS internal_edges
      FROM e
      JOIN l2 la ON la.node = e.s1
      JOIN l2 lb ON lb.node = e.s2
      WHERE la.label = lb.label
      GROUP BY la.label
    ),
    contrib AS (
      SELECT c.label, c.n_members,
             coalesce(i.internal_edges, 0) AS internal_edges,
             c.degree_sum,
             coalesce(i.internal_edges, 0) / m.m
               - pow(c.degree_sum / (2 * m.m), 2) AS q
      FROM comm c LEFT JOIN internal i USING (label) CROSS JOIN m
    ),
    total AS (SELECT sum(q) AS modularity FROM contrib)
    SELECT c.label,
           CAST(c.n_members AS BIGINT) AS n_members,
           CAST(c.internal_edges AS BIGINT) AS internal_edges,
           CAST(c.degree_sum AS BIGINT) AS degree_sum,
           round(c.q, 6) AS q_contribution,
           round(t.modularity, 4) AS modularity
    FROM contrib c CROSS JOIN total t
    ORDER BY c.n_members DESC, c.label
    LIMIT 20
"""


@query("g_community_modularity", oracle=_MODULARITY_SQL)
def g_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the deterministic-LPA partition over the
    strongest-500-edges co-supply graph: Q = Σ_c [ m_c/m −
    (d_c/2m)² ] with m_c = within-community edges, d_c = community
    degree sum. Per-community contributions (top 20 by size) ship next
    to the global Q — the quality readout that says whether
    g_label_propagation's communities beat a random partition (Q≈0) and
    when to stop adding LPA rounds.

    Scale shape: reuses round6f's lpa_state (edge build + label rounds,
    one edge-sized shuffle each); modularity itself adds one degree
    aggregate, one label-equality edge join, and arithmetic on the
    community-count-sized frame. The global Q is a window over that
    bounded frame, not over data.
    """
    from .round6f_ext import lpa_state

    edges, sym, labels = lpa_state(spark, sf_dir)
    m = edges.count() * 1.0  # bounded at _LPA_TOP_EDGES by construction
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    comm = (
        labels.join(deg, "node")
        .groupBy("label")
        .agg(F.count("*").alias("n_members"), F.sum("d").alias("degree_sum"))
    )
    la = labels.select(F.col("node").alias("s1"), F.col("label").alias("lab1"))
    lb = labels.select(F.col("node").alias("s2"), F.col("label").alias("lab2"))
    internal = (
        edges.join(la, "s1")
        .join(lb, "s2")
        .where(F.col("lab1") == F.col("lab2"))
        .groupBy(F.col("lab1").alias("label"))
        .agg(F.count("*").alias("internal_edges"))
    )
    contrib = (
        comm.join(internal, "label", "left")
        .select(
            "label",
            "n_members",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            "degree_sum",
            (
                F.coalesce("internal_edges", F.lit(0)) / F.lit(m)
                - F.pow(F.col("degree_sum") / F.lit(2 * m), 2)
            ).alias("q"),
        )
    )
    everything = W.orderBy("label").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        contrib.select(
            "label",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("internal_edges").cast("long").alias("internal_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.round("q", 6).alias("q_contribution"),
            F.round(F.sum("q").over(everything), 4).alias("modularity"),
        )
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(20)
    )
