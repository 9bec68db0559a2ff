"""Round-7 continuation operators, batch 10: the compression-ladder
capstone and covariate balance.

- e_compression_recall_matrix — recall@10 vs exact-L2 truth for every
  compressed ANN representation in the repo (int8 SQ, fitted PQ/ADC,
  1-bit Hamming) on the same query set: the single report that MEASURES
  the accuracy/compression dial instead of asserting it. (e_pq_recall_
  report and e_ivf_recall_report measure single rungs; this is the
  side-by-side.)
- a_covariate_balance — standardized mean differences of pre-exposure
  covariates across the hash-assigned arms (the balance gate that
  complements b_ab_srm_check: SRM checks COUNTS, SMD checks that the
  arms look alike on covariates before any readout is trusted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query
from .round7c_ext import _PQ_K, _PQ_SUBDIM, _pq_fit

_CM_NQ = 5      # queries: vec_id < 5
_CM_TOPK = 10


# The oracle reuses the proven CTE blocks verbatim: the PQ Lloyd walk
# (round7c), the int8 symmetric codes (llmdata_ext's e_ivf_sq oracle),
# the sign-bit Hamming distances (round7i), and the rounded exact-L2
# truth (round4b's e_pq_recall_report).
_CM_NPROBE = 2  # matches e_ivf_pq_topk's pruning dial

_CM_ORACLE = f"""
    WITH pos AS (
      SELECT vec_id,
             (i - 1) // {_PQ_SUBDIM} AS ss,
             (i - 1) % {_PQ_SUBDIM} AS sp,
             i AS pos,
             label,
             CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round(sum((p.val - q.val) * (p.val - q.val)), 6),
                                           p.vec_id) AS rn
        FROM pos p JOIN pos q ON q.pos = p.pos
        WHERE p.vec_id >= {_CM_NQ} AND q.vec_id < {_CM_NQ}
        GROUP BY q.vec_id, p.vec_id
      ) WHERE rn <= {_CM_TOPK}
    ),
    stats AS (SELECT max(abs(val)) AS gmax FROM pos),
    codes AS (
      SELECT vec_id, pos,
             CASE WHEN s.gmax = 0 THEN 0
                  ELSE CAST(round(val * 127.0 / s.gmax) AS BIGINT)
             END AS code
      FROM pos CROSS JOIN stats s
    ),
    sq8_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY sum((q.code - c.code) * (q.code - c.code)),
                                           c.vec_id) AS rn
        FROM codes c JOIN codes q ON q.pos = c.pos
        WHERE c.vec_id >= {_CM_NQ} AND q.vec_id < {_CM_NQ}
        GROUP BY q.vec_id, c.vec_id
      ) WHERE rn <= {_CM_TOPK}
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
    lut AS (
      SELECT q.vec_id AS query_id, c.ss, c.cid,
             round(sum((q.val - c.c) * (q.val - c.c)), 6) AS ld
      FROM pos q JOIN c1 c ON c.ss = q.ss AND c.sp = q.sp
      WHERE q.vec_id < {_CM_NQ}
      GROUP BY 1, 2, 3
    ),
    pq_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT l.query_id, a2.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY l.query_id
                                  ORDER BY round(sum(l.ld), 4), a2.vec_id) AS rn
        FROM a2 JOIN lut l ON l.ss = a2.ss AND l.cid = a2.cid
        WHERE a2.vec_id >= {_CM_NQ}
        GROUP BY l.query_id, a2.vec_id
      ) WHERE rn <= {_CM_TOPK}
    ),
    bits AS (
      SELECT vec_id, pos, CASE WHEN val >= 0 THEN 1 ELSE 0 END AS b
      FROM pos
    ),
    bin_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY sum(CASE WHEN q.b <> c.b THEN 1 ELSE 0 END),
                                           c.vec_id) AS rn
        FROM bits c JOIN bits q ON q.pos = c.pos
        WHERE c.vec_id >= {_CM_NQ} AND q.vec_id < {_CM_NQ}
        GROUP BY q.vec_id, c.vec_id
      ) WHERE rn <= {_CM_TOPK}
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
    cranked AS (
      SELECT vec_id, c_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dot / (vn * cn) DESC, c_label) AS rn
      FROM cdots
    ),
    ivf_lists AS (SELECT vec_id AS neighbor_id, c_label FROM cranked WHERE rn = 1),
    ivf_probes AS (
      SELECT vec_id AS query_id, c_label
      FROM cranked WHERE rn <= {_CM_NPROBE} AND vec_id < {_CM_NQ}
    ),
    ivf_cand AS (
      SELECT DISTINCT p.query_id, l.neighbor_id
      FROM ivf_probes p JOIN ivf_lists l ON p.c_label = l.c_label
      WHERE l.neighbor_id >= {_CM_NQ}
    ),
    ivfpq_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY c.query_id
                                  ORDER BY round(sum(l.ld), 4), c.neighbor_id) AS rn
        FROM ivf_cand c
        JOIN a2 ON a2.vec_id = c.neighbor_id
        JOIN lut l ON l.query_id = c.query_id
                  AND l.ss = a2.ss AND l.cid = a2.cid
        GROUP BY c.query_id, c.neighbor_id
      ) WHERE rn <= {_CM_TOPK}
    ),
    all_tops AS (
      SELECT 'sq8' AS method, * FROM sq8_top
      UNION ALL SELECT 'pq_fitted', * FROM pq_top
      UNION ALL SELECT 'binary', * FROM bin_top
      UNION ALL SELECT 'ivf_pq', * FROM ivfpq_top
    )
    SELECT m.method, m.query_id,
           CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           round(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / {_CM_TOPK}, 2) AS recall_at_{_CM_TOPK}
    FROM all_tops m
    LEFT JOIN truth t
      ON t.query_id = m.query_id AND t.neighbor_id = m.neighbor_id
    GROUP BY m.method, m.query_id
    ORDER BY m.method, m.query_id
"""


def _matrix_parts(spark: SparkSession, sf_dir: str):
    """Shared construction for the compression-ladder evaluations: the
    rounded exact-L2 truth on the query sample, every tier's top-k
    frame unioned into ``all_tops`` (method, query_id, neighbor_id),
    the IVF-PQ candidate set (the one tier whose per-query scan cost
    is data-dependent), and the embeddings frame.
    e_compression_recall_matrix aggregates recall from these;
    e_recall_cost_frontier (plans/round8b_ext.py) joins the same hits
    against measured candidate counts and code bytes — both reports
    MUST rank from this one construction or a precision tweak in one
    desynchronizes them (same rule as operators/similarity.py's
    shared eval-truth frame)."""
    from ..operators.similarity import exact_l2_pairs, sq_int8_codes
    from .round7i_ext import packed_sign_code

    emb = load_table(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") < _CM_NQ

    def topk(pairs: DataFrame, dist_col: str) -> DataFrame:
        rn = F.row_number().over(
            W.partitionBy("query_id").orderBy(dist_col, "neighbor_id")
        )
        return (
            pairs.withColumn("rn", rn)
            .where(F.col("rn") <= _CM_TOPK)
            .select("query_id", "neighbor_id")
        )

    # exact-L2 truth on the query sample: the SHARED eval-truth frame
    # (operators/similarity.py — rounded so tie order can't diverge
    # cross-engine; every recall report ranks from the same helper)
    truth = topk(exact_l2_pairs(emb, _CM_NQ), "d")

    # int8 SQ: exact integer L2 over the code arrays
    codes = sq_int8_codes(emb)
    qc = codes.where(F.col("id") < _CM_NQ).select(
        F.col("id").alias("query_id"), F.col("codes").alias("qcodes")
    )
    cc = codes.where(F.col("id") >= _CM_NQ).select(
        F.col("id").alias("neighbor_id"), F.col("codes").alias("ccodes")
    )
    sq_d = F.aggregate(
        F.zip_with("qcodes", "ccodes", lambda x, y: (x - y).cast("long") * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sq8_top = topk(
        cc.join(F.broadcast(qc)).select("query_id", "neighbor_id", sq_d.alias("d")),
        "d",
    )

    # fitted PQ / ADC (unpruned — the pruning dial is e_ivf_pq_topk's)
    sub, c1, a2 = _pq_fit(spark, sf_dir)
    qpos = sub.where(F.col("vec_id") < _CM_NQ).select(
        F.col("vec_id").alias("query_id"), "ss", "sp", "val"
    )
    lut = (
        qpos.alias("q")
        .join(F.broadcast(c1).alias("c"),
              (F.col("q.ss") == F.col("c.ss")) & (F.col("q.sp") == F.col("c.sp")))
        .groupBy("q.query_id", "c.ss", "c.cid")
        .agg(F.round(F.sum((F.col("q.val") - F.col("c.c")) ** 2), 6).alias("ld"))
    )
    adc = (
        a2.where(F.col("vec_id") >= _CM_NQ)
        .join(F.broadcast(lut), ["ss", "cid"])
        .groupBy(F.col("query_id"), F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("ld"), 4).alias("d"))
    )
    pq_top = topk(adc, "d")

    # 1-bit Hamming over packed sign codes
    bits = emb.select("vec_id", packed_sign_code().alias("code"))
    qb = bits.where(F.col("vec_id") < _CM_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("qcode")
    )
    cb = bits.where(F.col("vec_id") >= _CM_NQ).select(
        F.col("vec_id").alias("neighbor_id"), F.col("code").alias("ccode")
    )
    ham = F.bit_count(F.col("qcode").bitwiseXOR(F.col("ccode"))).cast("long")
    bin_top = topk(
        cb.join(F.broadcast(qb)).select("query_id", "neighbor_id", ham.alias("d")),
        "d",
    )

    # IVF-pruned PQ/ADC (the (codes, pruned) cell of the
    # compression×pruning matrix — e_ivf_pq_topk's production shape,
    # recall-scored here so the recall COST of pruning is measured
    # against the unpruned pq_fitted row, not asserted). Same coarse
    # quantizer (label centroids, nprobe=2) as e_ivf_pq_topk; the
    # candidate set is bounded by the probed lists, so this tier adds
    # no corpus-sized work beyond the one-time list assignment.
    from ..operators.similarity import centroids_by, top_centroids

    cents = centroids_by(emb, "label").localCheckpoint(eager=False)
    ivf_lists = top_centroids(emb, cents, n=1).select(
        F.col("id").alias("neighbor_id"), "c_label"
    ).where(F.col("neighbor_id") >= _CM_NQ)
    ivf_probes = top_centroids(emb.where(is_q), cents, n=_CM_NPROBE).select(
        F.col("id").alias("query_id"), "c_label"
    )
    ivf_cand = (
        ivf_probes.join(ivf_lists, "c_label")
        .select("query_id", "neighbor_id")
        .distinct()
    )
    ivf_adc = (
        ivf_cand.join(a2, a2["vec_id"] == ivf_cand["neighbor_id"])
        .join(F.broadcast(lut), ["query_id", "ss", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("ld"), 4).alias("d"))
    )
    ivfpq_top = topk(ivf_adc, "d")

    all_tops = (
        sq8_top.select(F.lit("sq8").alias("method"), "query_id", "neighbor_id")
        .unionAll(pq_top.select(F.lit("pq_fitted").alias("method"), "query_id", "neighbor_id"))
        .unionAll(bin_top.select(F.lit("binary").alias("method"), "query_id", "neighbor_id"))
        .unionAll(ivfpq_top.select(F.lit("ivf_pq").alias("method"), "query_id", "neighbor_id"))
    )
    return emb, truth, all_tops, ivf_cand


@query("e_compression_recall_matrix", oracle=_CM_ORACLE)
def e_compression_recall_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compression-ladder capstone: recall@10 against exact-L2
    truth for all three compressed representations the engine serves —
    int8 symmetric scalar quantization (4×), the Lloyd-fitted PQ codes
    ranked by asymmetric distance (16×), and 1-bit sign quantization
    ranked by Hamming (64×) — on the SAME query set. This is the
    accuracy/compression dial a vector-store operator reads before
    choosing a tier; the single-rung evaluations (e_pq_recall_report,
    e_ivf_recall_report) calibrate parameters inside a tier.

    Scale shape: truth on the query sample only (queries × corpus —
    the standard eval protocol; at 100 TB the sample is what makes the
    exact side affordable); each method reuses its production
    machinery (sq_int8_codes, _pq_fit, the packed-sign fold) and
    scores candidates from codes alone; the recall join is
    (methods × queries × k)-sized. One embeddings scan feeds
    everything the methods share.
    """
    _emb, truth, all_tops, _ivf_cand = _matrix_parts(spark, sf_dir)
    hit = truth.withColumn("hit", F.lit(1))
    return (
        all_tops.join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("method", "query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) * 1.0 / _CM_TOPK, 2
            ).alias(f"recall_at_{_CM_TOPK}"),
        )
        .orderBy("method", "query_id")
    )


_SMD_FLAG = 0.1  # the conventional |SMD| imbalance threshold


@query(
    "a_covariate_balance",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             (instr('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS treat,
             count(*) AS activity,
             avg(value) AS mean_value,
             count(DISTINCT event_type) AS type_breadth
      FROM events GROUP BY user_id
    ),
    long AS (
      SELECT treat, 'activity' AS covariate, activity * 1.0 AS x FROM per_user
      UNION ALL
      SELECT treat, 'mean_value', mean_value FROM per_user
      UNION ALL
      SELECT treat, 'type_breadth', type_breadth * 1.0 FROM per_user
    ),
    mom AS (
      SELECT covariate, treat, count(*) AS n, avg(x) AS m, var_samp(x) AS v
      FROM long GROUP BY 1, 2
    ),
    wide AS (
      SELECT covariate,
             max(CASE WHEN treat = 1 THEN n END) AS nt,
             max(CASE WHEN treat = 0 THEN n END) AS nc,
             max(CASE WHEN treat = 1 THEN m END) AS mt,
             max(CASE WHEN treat = 0 THEN m END) AS mc,
             max(CASE WHEN treat = 1 THEN v END) AS vt,
             max(CASE WHEN treat = 0 THEN v END) AS vc
      FROM mom GROUP BY covariate
    )
    SELECT covariate,
           CAST(nt AS BIGINT) AS n_treat,
           CAST(nc AS BIGINT) AS n_control,
           round((mt - mc) / nullif(sqrt((vt + vc) / 2), 0), 4) AS smd,
           CAST(abs((mt - mc) / nullif(sqrt((vt + vc) / 2), 0)) > {_SMD_FLAG}
                AS BOOLEAN) AS imbalanced
    FROM wide ORDER BY covariate
    """,
)
def a_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance check for the hash-assigned experiment:
    standardized mean difference SMD = (m̄_t − m̄_c)/√((s²_t+s²_c)/2)
    for each per-user covariate (activity, mean value, event-type
    breadth), flagged at the conventional |SMD| > 0.1. Completes the
    pre-readout gate pair: b_ab_srm_check certifies the COUNTS match
    the design; this certifies the ARMS LOOK ALIKE on covariates —
    with true hash randomization both pass, and a failure here on
    observational data is the signal to reach for b_stratified_ate /
    b_cuped_adjusted_ab instead of the raw readout.

    Scale shape: one groupBy(user) with map-side combine, a 3-way
    unpivot of the covariates (rows = 2·covariates after the moment
    aggregate), then arithmetic on the covariate-count frame.
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
        F.count("*").cast("double").alias("activity"),
        F.avg("value").alias("mean_value"),
        F.countDistinct("event_type").cast("double").alias("type_breadth"),
    )
    long = per_user.select(
        "treat",
        F.expr(
            "stack(3, 'activity', activity, 'mean_value', mean_value,"
            " 'type_breadth', type_breadth) AS (covariate, x)"
        ),
    )
    mom = long.groupBy("covariate", "treat").agg(
        F.count("*").alias("n"), F.avg("x").alias("m"), F.var_samp("x").alias("v")
    )
    arm = lambda t, col: F.max(  # noqa: E731
        F.when(F.col("treat") == t, F.col(col))
    )
    wide = mom.groupBy("covariate").agg(
        arm(1, "n").alias("nt"),
        arm(0, "n").alias("nc"),
        arm(1, "m").alias("mt"),
        arm(0, "m").alias("mc"),
        arm(1, "v").alias("vt"),
        arm(0, "v").alias("vc"),
    )
    # NULLIF guard: a zero-variance covariate (constant in both arms)
    # yields NULL smd on both engines instead of an ANSI divide error
    smd = (F.col("mt") - F.col("mc")) / F.nullif(
        F.sqrt((F.col("vt") + F.col("vc")) / 2), F.lit(0.0)
    )
    return wide.select(
        "covariate",
        F.col("nt").cast("long").alias("n_treat"),
        F.col("nc").cast("long").alias("n_control"),
        F.round(smd, 4).alias("smd"),
        (F.abs(smd) > _SMD_FLAG).alias("imbalanced"),
    ).orderBy("covariate")
