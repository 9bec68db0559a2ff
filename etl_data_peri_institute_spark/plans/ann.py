"""ANN / embedding-index gates: IVF (fit, assign, balance, staleness,
nprobe sweeps), PQ/SQ/binary compression ladders and their recall
matrices, centroid and quality reports, MMR rerank, range search — the
vector-index layer over the embeddings table, all JVM-side
zip_with/aggregate math.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section cites its source round.
"""

from __future__ import annotations

# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..sources.tables import load_table
from .catalog import query

@query(
    "e_range_search",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 50),
    sims AS (
      SELECT q.query_id, e.vec_id AS match_id,
             round(
               list_sum(list_transform(range(1, len(q.qe) + 1),
                 i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(q.qe) + 1),
                    i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
               4) AS cos_r4
      FROM q, embeddings e
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, match_id, cos_r4
    FROM sims WHERE cos_r4 >= 0.42
    ORDER BY query_id, match_id
    """,
)
def e_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE search: every corpus vector within a similarity
    radius of each query (threshold 0.42 — sized to this synthetic
    corpus, whose max off-diagonal cosine is ~0.51) — the retrieval mode dedup and
    recall evaluation need where top-k is wrong (you want ALL matches
    above the bar, however many).

    Exact baseline shape: broadcast the bounded query set, one corpus
    scan, JVM-side higher-order dot products, filter on the ROUNDED
    cosine so the radius boundary cannot flip between engines. The ANN
    scale path swaps the scan for the LSH/IVF candidate generators
    (e_lsh_buckets / e_ivf_topk) with this same exact verify as the
    re-rank stage."""
    from ..operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = F.broadcast(q).crossJoin(emb.select(F.col("vec_id").alias("match_id"), "embedding"))
    sims = pairs.filter(F.col("match_id") != F.col("query_id")).select(
        "query_id",
        "match_id",
        F.round(cosine(F.col("qe"), F.col("embedding")), 4).alias("cos_r4"),
    )
    return sims.filter(F.col("cos_r4") >= 0.42).orderBy("query_id", "match_id")

def _ivf_recall_oracle() -> str:
    from .llmdata_ext import _COSINE_SQL

    cos_qe = _COSINE_SQL.format(a="q.embedding", b="e.embedding")
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
    probes AS (
      SELECT vec_id AS query_id, c_label FROM ranked WHERE rn <= 2 AND vec_id < 5
    ),
    cand AS (
      SELECT DISTINCT p.query_id, l.neighbor_id
      FROM probes p JOIN lists l ON p.c_label = l.c_label
      WHERE l.neighbor_id <> p.query_id
    ),
    ivf_sims AS (
      SELECT c.query_id, c.neighbor_id, {cos_qe} AS cos_sim
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings e ON e.vec_id = c.neighbor_id
    ),
    ivf_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM ivf_sims
      ) WHERE rn <= 3
    ),
    exact_sims AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, {cos_qe} AS cos_sim
      FROM embeddings q, embeddings e
      WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
    ),
    exact_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM exact_sims
      ) WHERE rn <= 3
    )
    SELECT CAST((SELECT count(*) FROM exact_top) AS BIGINT) AS n_truth_pairs,
           CAST((SELECT count(*) FROM exact_top t
                 WHERE EXISTS (SELECT 1 FROM ivf_top i
                               WHERE i.query_id = t.query_id
                                 AND i.neighbor_id = t.neighbor_id))
                AS BIGINT) AS n_caught,
           round((SELECT count(*) FROM exact_top t
                  WHERE EXISTS (SELECT 1 FROM ivf_top i
                                WHERE i.query_id = t.query_id
                                  AND i.neighbor_id = t.neighbor_id))
                 * 1.0 / (SELECT count(*) FROM exact_top), 4) AS recall_at_3
    """

@query("e_ivf_recall_report", oracle=_ivf_recall_oracle())
def e_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall@3: what fraction of the EXACT cosine top-3 neighbors
    does the IVF multi-probe path (n_probe=2) return for the query set?
    One row (n_truth_pairs, n_caught, recall_at_3) — the standard ANN
    quality metric; n_probe trades this recall against probed-list
    volume, and this query measures the trade instead of assuming it.

    The truth side is the brute-force scan (run on a query SAMPLE at
    production scale — the standard recall-estimation protocol); the
    IVF side is the production search path itself. Both reduce to
    pair-keyed top-3 frames before a semi-join and three 1-row
    aggregates — no driver-side counting."""
    from ..operators.similarity import centroids_by, ivf_topk, knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = knn_bruteforce(emb, queries, k=3).select("query_id", "neighbor_id")
    cents = centroids_by(emb, "label").localCheckpoint(eager=False)
    ivf = ivf_topk(emb, queries, cents, k=3, n_probe=2).select(
        "query_id", "neighbor_id"
    )
    caught = exact.join(ivf, ["query_id", "neighbor_id"], "left_semi")
    t = exact.agg(F.count("*").alias("n_truth_pairs"))
    g = caught.agg(F.count("*").alias("n_caught"))
    return t.crossJoin(g).select(
        "n_truth_pairs", "n_caught",
        F.round(F.col("n_caught") / F.col("n_truth_pairs"), 4).alias("recall_at_3"),
    )


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W

@query(
    "e_centroid_report",
    oracle="""
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
      SELECT label, pos, round(avg(val), 6) AS c FROM pos GROUP BY label, pos
    ),
    dist AS (
      SELECT p.vec_id, p.label,
             round(sqrt(sum((p.val - c.c) * (p.val - c.c))), 6) AS d
      FROM pos p JOIN cent c ON c.label = p.label AND c.pos = p.pos
      GROUP BY p.vec_id, p.label
    ),
    nrm AS (
      SELECT label, round(sqrt(sum(c * c)), 4) AS centroid_norm
      FROM cent GROUP BY label
    )
    SELECT d.label, CAST(count(*) AS BIGINT) AS n_vecs,
           max(n.centroid_norm) AS centroid_norm,
           round(avg(d.d), 4) AS avg_dist,
           round(max(d.d), 4) AS max_dist
    FROM dist d JOIN nrm n ON n.label = d.label
    GROUP BY d.label
    ORDER BY d.label
    """,
)
def e_centroid_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cluster health report over the embedding table:
    member count, centroid norm, mean and max member-to-centroid
    distance — the dispersion diagnostics that decide whether an IVF
    list needs splitting and whether a label's embeddings are
    coherent enough to trust (the evaluation companion to
    e_ivf_assign / d_semdedup_prune, which CONSUME centroids).

    Scale shape: centroids are a (labels x dims) groupBy — map-side
    partial sums reduce 100 TB of vectors to a sketch-sized frame that
    broadcasts back onto the long-format vector scan; distances then
    partial-aggregate per (vec, label). Centroid components are
    rounded to 6 BEFORE distances (both engines subtract identical
    operands — cross-engine partial-sum order cannot leak into the
    distance), per-vector distances rounded to 6 before the final
    avg/max, report values to 4.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "valf"),
    ).select(
        "vec_id", "label", (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    cent = pos.groupBy("label", "pos").agg(F.round(F.avg("val"), 6).alias("c"))
    dist = (
        pos.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("val") - F.col("c")) * (F.col("val") - F.col("c")))),
                6,
            ).alias("d")
        )
    )
    nrm = cent.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 4).alias("centroid_norm")
    )
    return (
        dist.join(F.broadcast(nrm), "label")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.max("centroid_norm").alias("centroid_norm"),
            F.round(F.avg("d"), 4).alias("avg_dist"),
            F.round(F.max("d"), 4).alias("max_dist"),
        )
        .orderBy("label")
    )

@query(
    "e_nearest_centroid_eval",
    oracle="""
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
      SELECT label AS clabel, pos, round(avg(val), 6) AS c
      FROM pos GROUP BY label, pos
    ),
    dist AS (
      SELECT p.vec_id, p.label, c.clabel,
             round(sum((p.val - c.c) * (p.val - c.c)), 6) AS d2
      FROM pos p JOIN cent c ON c.pos = p.pos
      GROUP BY p.vec_id, p.label, c.clabel
    ),
    pred AS (
      SELECT vec_id, label, clabel AS pred_label,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY d2, clabel
             ) AS rn
      FROM dist
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS accuracy
    FROM pred WHERE rn = 1
    GROUP BY label
    ORDER BY label
    """,
)
def e_nearest_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classifier evaluation: assign every
    vector to its closest label centroid, report per-label accuracy —
    the quick label-coherence score an embedding pipeline computes
    before investing in a learned classifier, and the exact quality
    check behind IVF list assignment (e_ivf_assign IS this argmin).

    Scale shape: the centroid frame (labels x dims) broadcasts; each
    vector meets ALL centroids through the position join, so per-vector
    cost is O(dims x labels) with no vector-vector pairs anywhere. The
    argmin is a vec-keyed window over a labels-sized partition.
    Distances use centroids pre-rounded to 6 and are themselves rounded
    to 6 before the argmin with the label tiebreak — both engines rank
    identical numbers. Self-classification accuracy (no held-out split)
    by design: the question is label coherence, not generalization;
    b_grouped_split provides the leakage-safe split when needed.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "valf"),
    ).select(
        "vec_id", "label", (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    cent = pos.groupBy(F.col("label").alias("clabel"), F.col("pos")).agg(
        F.round(F.avg("val"), 6).alias("c")
    )
    dist = (
        pos.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.round(
                F.sum((F.col("val") - F.col("c")) * (F.col("val") - F.col("c"))), 6
            ).alias("d2")
        )
    )
    pred = dist.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "clabel")),
    )
    correct = (F.col("clabel") == F.col("label")).cast("long")
    return (
        pred.filter(F.col("rn") == 1)
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum(correct).alias("n_correct"),
            F.round(F.sum(correct) / F.count("*"), 4).alias("accuracy"),
        )
        .orderBy("label")
    )

_MMR_QUERY_ID = 0

_MMR_CAND = 20

_MMR_K = 5

_MMR_LAMBDA = 0.7

def _mmr_oracle() -> str:
    """Unrolled greedy MMR as a CTE chain (the g_pagerank_suppliers
    discipline: fixed iteration count, bit-identical arithmetic to the
    Spark loop — rounded-6 relevance and pair similarities are the only
    inputs, so both engines pick the same argmax at every step)."""
    lam = _MMR_LAMBDA
    steps = [
        """
    sel1 AS (
      SELECT id, rel, rel AS mmr, 1 AS rank FROM cand
      ORDER BY rel DESC, id LIMIT 1
    ),
    picked1 AS MATERIALIZED (SELECT id FROM sel1)"""
    ]
    for k in range(2, _MMR_K + 1):
        steps.append(f"""
    step{k} AS (
      SELECT c.id, c.rel, max(p.sim) AS ms
      FROM cand c JOIN pairs p
        ON p.a = c.id AND p.b IN (SELECT id FROM picked{k - 1})
      WHERE c.id NOT IN (SELECT id FROM picked{k - 1})
      GROUP BY c.id, c.rel
    ),
    sel{k} AS (
      SELECT id, rel, round({lam} * rel - {1 - lam} * ms, 6) AS mmr, {k} AS rank
      FROM step{k} ORDER BY mmr DESC, id LIMIT 1
    ),
    picked{k} AS MATERIALIZED (SELECT id FROM picked{k - 1} UNION ALL SELECT id FROM sel{k})""")
    sel_union = "\n      UNION ALL ".join(
        f"SELECT rank, id AS vec_id, rel AS relevance, mmr AS mmr_score FROM sel{k}"
        for k in range(1, _MMR_K + 1)
    )
    return f"""
    WITH pos AS MATERIALIZED (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    nrm AS MATERIALIZED (SELECT vec_id, sqrt(sum(val * val)) AS n FROM pos GROUP BY vec_id),
    qpos AS (SELECT pos, val FROM pos WHERE vec_id = {_MMR_QUERY_ID}),
    rel_all AS (
      SELECT p.vec_id,
             round(sum(p.val * q.val)
                   / (max(np.n) * (SELECT n FROM nrm WHERE vec_id = {_MMR_QUERY_ID})),
                   6) AS rel
      FROM pos p JOIN qpos q ON q.pos = p.pos
      JOIN nrm np ON np.vec_id = p.vec_id
      WHERE p.vec_id <> {_MMR_QUERY_ID}
      GROUP BY p.vec_id
    ),
    cand AS MATERIALIZED (
      SELECT vec_id AS id, rel FROM rel_all
      ORDER BY rel DESC, vec_id LIMIT {_MMR_CAND}
    ),
    cpos AS (
      SELECT p.vec_id, p.pos, p.val FROM pos p
      WHERE p.vec_id IN (SELECT id FROM cand)
    ),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b,
             round(sum(a.val * b.val) / (max(na.n) * max(nb.n)), 6) AS sim
      FROM cpos a JOIN cpos b ON b.pos = a.pos AND b.vec_id <> a.vec_id
      JOIN nrm na ON na.vec_id = a.vec_id
      JOIN nrm nb ON nb.vec_id = b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),{",".join(steps)}
    SELECT rank, vec_id, relevance, mmr_score FROM (
      {sel_union}
    )
    ORDER BY rank
    """

@query("e_mmr_rerank", oracle=_mmr_oracle())
def e_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: from the top-{c}
    cosine candidates for a query vector, greedily select {k} results
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-selected
    (λ = {lam}) — the diversification stage a retrieval pipeline runs
    after ANN search so the context window isn't five near-copies of
    one passage (the retrieval-side complement of d_semdedup_prune,
    which prunes the INDEX; MMR diversifies the RESULT).

    Scale shape: the greedy loop is inherently sequential, but each
    step's frame is bounded by the CANDIDATE set (top-{c} from the ANN
    stage — e_ivf_topk at 100 TB), so the unrolled {k}-step plan
    (pagerank's fixed-iteration discipline; the oracle unrolls the
    identical CTE chain) manipulates 20-row frames whatever the corpus
    size; the only corpus-scale work is the relevance scan, which IS
    the ANN search. Relevance and pair similarities are rounded to 6
    before any argmax, with id tiebreaks — both engines select
    identical sets step for step.
    """.format(c=_MMR_CAND, k=_MMR_K, lam=_MMR_LAMBDA)
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    nrm = pos.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("n"))
    qpos = pos.filter(F.col("vec_id") == _MMR_QUERY_ID).select("pos", F.col("val").alias("qval"))
    qn = nrm.filter(F.col("vec_id") == _MMR_QUERY_ID).select(F.col("n").alias("qn"))
    rel_all = (
        pos.filter(F.col("vec_id") != _MMR_QUERY_ID)
        .join(F.broadcast(qpos), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("val") * F.col("qval")).alias("dot"))
        .join(nrm, "vec_id")
        .crossJoin(F.broadcast(qn))
        .select(
            F.col("vec_id").alias("id"),
            F.round(F.col("dot") / (F.col("n") * F.col("qn")), 6).alias("rel"),
        )
    )
    cand = rel_all.orderBy(F.desc("rel"), "id").limit(_MMR_CAND)
    cpos = pos.join(
        F.broadcast(cand.select(F.col("id").alias("vec_id"))), "vec_id"
    )
    # Norms restricted to the candidate scope BEFORE any broadcast hint —
    # nrm itself is corpus-sized (one row per vector) and must never be
    # pinned broadcast; the candidate-filtered frame is <= 20 rows.
    cnrm = nrm.join(
        F.broadcast(cand.select(F.col("id").alias("vec_id"))), "vec_id"
    )
    na = cnrm.withColumnRenamed("vec_id", "a").withColumnRenamed("n", "na")
    nb = cnrm.withColumnRenamed("vec_id", "b").withColumnRenamed("n", "nb")
    a, b = cpos.alias("pa"), cpos.alias("pb")
    pairs = (
        a.join(
            b,
            (F.col("pb.pos") == F.col("pa.pos"))
            & (F.col("pb.vec_id") != F.col("pa.vec_id")),
        )
        .groupBy(
            F.col("pa.vec_id").alias("a"), F.col("pb.vec_id").alias("b")
        )
        .agg(F.sum(F.col("pa.val") * F.col("pb.val")).alias("dot"))
        .join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .select("a", "b", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("sim"))
    )
    lam = _MMR_LAMBDA
    # The candidate and pair frames are bounded (<= 20 / 380 rows) but
    # their lineage is the corpus-scale relevance scan; every unrolled
    # step references both, so WITHOUT truncation the static plan
    # re-derives that scan a compounding number of times (measured:
    # ~60 s vs ~4 s at sf0.001). Eagerly checkpointing the two tiny
    # frames — the connected-components discipline — makes each greedy
    # step a join over literal 20-row inputs; the oracle mirrors this
    # with MATERIALIZED CTEs.
    cand = cand.localCheckpoint(eager=True)
    pairs = pairs.localCheckpoint(eager=True)
    # Unrolled greedy over bounded frames (candidates <= _MMR_CAND):
    # selected_k and the per-step argmax are 1-to-k-row frames; Spark
    # builds one static plan, exactly like the oracle's CTE chain.
    sel = cand.orderBy(F.desc("rel"), "id").limit(1).select(
        "id", "rel", F.col("rel").alias("mmr"), F.lit(1).alias("rank")
    )
    picked = sel.select("id")
    out = sel
    for k in range(2, _MMR_K + 1):
        rem = cand.join(picked, "id", "left_anti")
        step = (
            rem.join(pairs, rem.id == pairs.a)
            .join(picked.withColumnRenamed("id", "b"), "b")
            .groupBy(rem.id, rem.rel)
            .agg(F.max("sim").alias("ms"))
        )
        sel_k = (
            step.select(
                "id",
                "rel",
                F.round(lam * F.col("rel") - (1 - lam) * F.col("ms"), 6).alias("mmr"),
                F.lit(k).alias("rank"),
            )
            .orderBy(F.desc("mmr"), "id")
            .limit(1)
        )
        picked = picked.unionAll(sel_k.select("id"))
        out = out.unionAll(sel_k)
    return out.select(
        "rank",
        F.col("id").alias("vec_id"),
        F.col("rel").alias("relevance"),
        F.col("mmr").alias("mmr_score"),
    ).orderBy("rank")

_PQ_SUBS = 4        # subspaces (64 dims -> 4 x 16)

_PQ_SUBDIM = 16

_PQ_QUERIES = 3     # vec_id < 3 play the query set

_PQ_ADC_TOPK = 5

@query(
    "e_pq_adc_topk",
    oracle=f"""
    WITH pos AS MATERIALIZED (
      SELECT vec_id, label, i AS pos,
             CAST((i - 1) // {_PQ_SUBDIM} AS BIGINT) AS sub,
             CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    codebook AS MATERIALIZED (
      SELECT sub, label AS code, pos, round(avg(val), 6) AS cval
      FROM pos GROUP BY sub, label, pos
    ),
    enc_d2 AS (
      SELECT p.vec_id, p.sub, c.code,
             round(sum((p.val - c.cval) * (p.val - c.cval)), 6) AS d2
      FROM pos p JOIN codebook c ON c.sub = p.sub AND c.pos = p.pos
      WHERE p.vec_id >= {_PQ_QUERIES}
      GROUP BY p.vec_id, p.sub, c.code
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, code) AS rn
        FROM enc_d2
      ) WHERE rn = 1
    ),
    lut AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.sub, c.code,
             round(sum((q.val - c.cval) * (q.val - c.cval)), 6) AS qd2
      FROM pos q JOIN codebook c ON c.sub = q.sub AND c.pos = q.pos
      WHERE q.vec_id < {_PQ_QUERIES}
      GROUP BY q.vec_id, c.sub, c.code
    ),
    adc AS (
      SELECT l.query_id, v.vec_id AS neighbor_id,
             round(sum(l.qd2), 4) AS approx_d2
      FROM codes v JOIN lut l ON l.sub = v.sub AND l.code = v.code
      GROUP BY l.query_id, v.vec_id
    )
    SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, approx_d2
    FROM (
      SELECT query_id, neighbor_id, approx_d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_d2, neighbor_id) AS rn
      FROM adc
    )
    WHERE rn <= {_PQ_ADC_TOPK}
    ORDER BY query_id, rank
    """,
)
def e_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization ANN search (Jégou et al.'s PQ, the
    memory-bound workhorse between SQ8 and IVF): split 64-dim vectors
    into {m} x {d}-dim subspaces, quantize each sub-vector to its
    nearest sub-codeword, and answer queries by ADC — per query, a
    {m} x codes lookup table of exact query-to-codeword distances, so
    a database vector's approximate distance is {m} table lookups
    summed, never a full float dot product. Completes the
    quantization family (e_sq_int8_topk compresses VALUES, IVF prunes
    LISTS, PQ compresses GEOMETRY; production composes IVF+PQ exactly
    like e_ivf_sq_topk composes IVF+SQ).

    Codebooks derive from label-group sub-means — the e_ivf_assign
    discipline: deterministic, oracle-expressible training standing in
    for k-means-per-subspace (kmeans_lloyd is the benched production
    trainer). Scale shape: the codebook ({m} x 10 codes x {d} dims)
    broadcasts; encoding is one corpus pass (vector x codeword
    distances bounded by codes-per-subspace); the search touches codes
    + LUT only — the corpus' float vectors are never read at query
    time, which is the entire point of PQ at 100 TB. Codebook values
    rounded to 6 before distances, per-sub d2 to 6 before the argmin
    (code tiebreak), ADC sums to 4 before the top-{k} (neighbor
    tiebreak) — both engines pick identical codes and ranks.
    """.format(m=_PQ_SUBS, d=_PQ_SUBDIM, k=_PQ_ADC_TOPK)
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        (F.col("pos0") / _PQ_SUBDIM).cast("long").alias("sub"),
        F.col("valf").cast("double").alias("val"),
    )
    codebook = pos.groupBy(
        "sub", F.col("label").alias("code"), "pos"
    ).agg(F.round(F.avg("val"), 6).alias("cval"))
    codebook = codebook.localCheckpoint(eager=True)  # k x m x d — tiny, broadcast below

    def sub_d2(side: DataFrame, id_filter, out_id: str) -> DataFrame:
        return (
            side.filter(id_filter)
            .join(F.broadcast(codebook), ["sub", "pos"])
            .groupBy(F.col("vec_id").alias(out_id), "sub", "code")
            .agg(
                F.round(
                    F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))),
                    6,
                ).alias("d2")
            )
        )

    enc_d2 = sub_d2(pos, F.col("vec_id") >= _PQ_QUERIES, "vec_id")
    codes = (
        enc_d2.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("vec_id", "sub").orderBy("d2", "code")),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )
    lut = sub_d2(pos, F.col("vec_id") < _PQ_QUERIES, "query_id").withColumnRenamed(
        "d2", "qd2"
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("qd2"), 4).alias("approx_d2"))
    )
    return (
        adc.withColumn(
            "rank",
            F.row_number()
            .over(W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id"))
            .cast("int"),
        )
        .filter(F.col("rank") <= _PQ_ADC_TOPK)
        .select("query_id", "rank", "neighbor_id", "approx_d2")
        .orderBy("query_id", "rank")
    )

@query(
    "e_pq_recall_report",
    oracle=f"""
    WITH pos AS MATERIALIZED (
      SELECT vec_id, label, i AS pos,
             CAST((i - 1) // {_PQ_SUBDIM} AS BIGINT) AS sub,
             CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    codebook AS MATERIALIZED (
      SELECT sub, label AS code, pos, round(avg(val), 6) AS cval
      FROM pos GROUP BY sub, label, pos
    ),
    enc_d2 AS (
      SELECT p.vec_id, p.sub, c.code,
             round(sum((p.val - c.cval) * (p.val - c.cval)), 6) AS d2
      FROM pos p JOIN codebook c ON c.sub = p.sub AND c.pos = p.pos
      WHERE p.vec_id >= {_PQ_QUERIES}
      GROUP BY p.vec_id, p.sub, c.code
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, code) AS rn
        FROM enc_d2
      ) WHERE rn = 1
    ),
    lut AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.sub, c.code,
             round(sum((q.val - c.cval) * (q.val - c.cval)), 6) AS qd2
      FROM pos q JOIN codebook c ON c.sub = q.sub AND c.pos = q.pos
      WHERE q.vec_id < {_PQ_QUERIES}
      GROUP BY q.vec_id, c.sub, c.code
    ),
    adc_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT l.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY l.query_id
                                  ORDER BY round(sum(l.qd2), 4), v.vec_id) AS rn
        FROM codes v JOIN lut l ON l.sub = v.sub AND l.code = v.code
        GROUP BY l.query_id, v.vec_id
      ) WHERE rn <= {_PQ_ADC_TOPK}
    ),
    exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round(sum((p.val - q.val) * (p.val - q.val)), 6),
                                           p.vec_id) AS rn
        FROM pos p JOIN pos q ON q.pos = p.pos
        WHERE p.vec_id >= {_PQ_QUERIES} AND q.vec_id < {_PQ_QUERIES}
        GROUP BY q.vec_id, p.vec_id
      ) WHERE rn <= {_PQ_ADC_TOPK}
    )
    SELECT e.query_id,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           round(count(a.neighbor_id) * 1.0 / {_PQ_ADC_TOPK}, 2) AS recall_at_{_PQ_ADC_TOPK}
    FROM exact_top e
    LEFT JOIN adc_top a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    ORDER BY e.query_id
    """,
)
def e_pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the PQ/ADC search against exact-L2 truth, per
    query — the evaluation twin that closes the PQ story the way
    e_ivf_recall_report closes IVF's: the compression/recall dial is
    MEASURED on the production path, not assumed (the standard
    protocol: at 100 TB the exact-truth side runs on a query sample).

    Scale shape: the ADC side is the e_pq_adc_topk plan verbatim; the
    truth side is one position-join L2 pass over the corpus for the
    bounded query set; the comparison joins two {k}-row-per-query rank
    lists. Rounded-distance ranking with id tiebreaks on BOTH sides so
    each engine derives identical sets before intersecting.
    """.format(k=_PQ_ADC_TOPK)
    pq = e_pq_adc_topk(spark, sf_dir).select("query_id", "neighbor_id")
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    qpos = pos.filter(F.col("vec_id") < _PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("val").alias("qval")
    )
    exact = (
        pos.filter(F.col("vec_id") >= _PQ_QUERIES)
        .join(F.broadcast(qpos), "pos")
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.round(
                F.sum((F.col("val") - F.col("qval")) * (F.col("val") - F.col("qval"))),
                6,
            ).alias("d2")
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("d2", "neighbor_id")
            ),
        )
        .filter(F.col("rn") <= _PQ_ADC_TOPK)
        .select("query_id", "neighbor_id")
    )
    hit = pq.withColumnRenamed("neighbor_id", "hit_id")
    return (
        exact.join(
            hit,
            (hit.query_id == exact.query_id)
            & (F.col("hit_id") == F.col("neighbor_id")),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(
            F.count("hit_id").alias("n_hits"),
            F.round(F.count("hit_id") / _PQ_ADC_TOPK, 2).alias(f"recall_at_{_PQ_ADC_TOPK}"),
        )
        .orderBy("query_id")
    )


# ===========================================================================
# section consolidated from plans/round6c_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 2: cross-source corpus overlap, the
# deterministic epoch-shuffle pair, and an iterative k-means (Lloyd) fit.
#
# Three more first-class training-data-pipeline operators (north-star
# extensions per the build brief — the reference repo,
# /root/reference/etl/transform.py, has no corpus analytics at all):
#
# - ``d_source_overlap_matrix``: segment-level Jaccard/containment
#   between every source pair — the dataset-mixing audit ("how much of
#   src7 is already inside src3?") run before weighting sources into a
#   training mixture. Reuses the C4-style fixed-window segment primitive
#   (operators/dedup.py::segment_occurrences).
# - ``b_epoch_shuffle`` / ``b_epoch_shuffle_production``: deterministic
#   per-epoch global shuffle order — every epoch must visit each example
#   once in a pseudo-random order that is REPRODUCIBLE across reruns
#   (never ``rand()``; the order key is ``md5(doc_id ':' epoch)``, the
#   same content-hash determinism as b_hash_sample). The pin uses the
#   per-epoch window; the production twin is the grouped distributed
#   row-number (operators/cumsum.py) — same oracle certifies both.
# - ``e_kmeans_fit``: two deterministic Lloyd iterations over the
#   embeddings table (init = the 8 smallest vec_ids) — the FIT side of
#   the centroid stack (e_ivf_assign / e_nearest_centroid_eval CONSUME
#   centroids; this produces them). Per-iteration cost is one broadcast
#   join + one groupBy — the canonical iterative-algorithm shape on
#   Spark.
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

_KM_K = 8

_KM_ITERS = 2

_KM_ASSIGN = """
    d{i} AS (
      SELECT p.vec_id, c.cid,
             round(sum((p.val - c.c) * (p.val - c.c)), 6) AS d2
      FROM pos p JOIN c{j} c ON c.pos = p.pos
      GROUP BY p.vec_id, c.cid
    ),
    a{i} AS (
      SELECT vec_id, cid, d2,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY d2, cid
             ) AS rn
      FROM d{i}
    )"""

_KM_UPDATE = """
    c{i} AS (
      SELECT a.cid, p.pos, round(avg(p.val), 6) AS c
      FROM a{i} a JOIN pos p ON p.vec_id = a.vec_id
      WHERE a.rn = 1
      GROUP BY a.cid, p.pos
    )"""

def _kmeans_oracle() -> str:
    parts = [
        f"""
    WITH pos AS (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, pos, round(val, 6) AS c
      FROM pos
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_KM_K})
    )"""
    ]
    for it in range(1, _KM_ITERS + 1):
        parts.append("," + _KM_ASSIGN.format(i=it, j=it - 1))
        parts.append("," + _KM_UPDATE.format(i=it))
    last = _KM_ITERS
    parts.append(
        f"""
    , norms AS (
      SELECT cid, round(sqrt(sum(c * c)), 4) AS centroid_norm
      FROM c{last} GROUP BY cid
    )
    SELECT a.cid, CAST(count(*) AS BIGINT) AS n_members,
           round(avg(a.d2), 4) AS avg_d2,
           round(max(a.d2), 4) AS max_d2,
           n.centroid_norm
    FROM a{last} a JOIN norms n ON n.cid = a.cid
    WHERE a.rn = 1
    GROUP BY a.cid, n.centroid_norm
    ORDER BY a.cid
    """
    )
    return "".join(parts)

@query("e_kmeans_fit", oracle=_kmeans_oracle())
def e_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-means (Lloyd) FIT over the embeddings table: k=8
    centroids initialized from the 8 smallest vec_ids, 2 assignment +
    update rounds, reporting per-cluster membership, within-cluster
    distance stats (to the centroids the final assignment used), and
    the updated centroid norms. This is the fit side of the centroid
    stack — e_ivf_assign, e_nearest_centroid_eval and d_semdedup_prune
    all CONSUME a centroid table; this operator PRODUCES one, and its
    loop is the canonical iterative-algorithm shape on Spark.

    Scale shape per iteration: the centroid frame (k x dims = 512
    rows) broadcasts onto the long-format vector scan; distances
    partial-aggregate per (vec, cid) — per-vector cost O(dims x k),
    no vector-vector pairs; the argmin is a vec-keyed window over a
    k-sized partition; the update is one map-side-combined groupBy
    back to a k x dims frame. Iteration count is a literal, so the
    lineage is a fixed-depth DAG (no checkpoint needed at 2; a deep
    fit would localCheckpoint between rounds like g_pagerank).
    Determinism: centroids rounded to 6 AFTER each update, distances
    rounded to 6 BEFORE each argmin with cid tiebreak — both engines
    rank identical numbers (the e_nearest_centroid_eval discipline).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    seeds = emb.select("vec_id").orderBy("vec_id").limit(_KM_K)
    cent = (
        pos.join(F.broadcast(seeds), "vec_id")
        .select(
            F.col("vec_id").alias("cid"),
            "pos",
            F.round("val", 6).alias("c"),
        )
    )
    assign = None
    for _ in range(_KM_ITERS):
        dist = (
            pos.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(
                F.round(
                    F.sum((F.col("val") - F.col("c")) * (F.col("val") - F.col("c"))),
                    6,
                ).alias("d2")
            )
        )
        assign = dist.withColumn(
            "rn", F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "cid"))
        ).filter(F.col("rn") == 1)
        cent = (
            assign.select("vec_id", "cid")
            .join(pos, "vec_id")
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("val"), 6).alias("c"))
        )
    norms = cent.groupBy("cid").agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 4).alias("centroid_norm")
    )
    return (
        assign.groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("d2"), 4).alias("avg_d2"),
            F.round(F.max("d2"), 4).alias("max_d2"),
        )
        .join(F.broadcast(norms), "cid")
        .select("cid", "n_members", "avg_d2", "max_d2", "centroid_norm")
        .orderBy("cid")
    )


# ===========================================================================
# section consolidated from plans/round6g_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 6: embedding truncation (Matryoshka)
# quality, distributed PCA power iteration, feed freshness, and A/B power
# analysis.
#
# Four more first-class operators (north-star extensions — the reference
# repo has no embedding/experiment analytics):
#
# - ``e_matryoshka_truncation_report``: how much cosine geometry survives
#   truncating embeddings to a prefix of their dimensions (the
#   Matryoshka-representation question "can we serve 16 of the 64
#   dims?"). For prefix-vs-full cosine the closed form is the norm ratio
#   ||v[:d]|| / ||v||, so the whole report is one conditional-sum
#   aggregate — no pairs, no joins.
# - ``e_pca_power_iteration``: dominant principal component of the
#   embedding table by explicit covariance build + 2 deterministic power
#   iterations — the iterative-linear-algebra shape on Spark (matvec =
#   broadcast join + groupBy; normalization = 1-row aggregate broadcast).
# - ``p_freshness_report``: per-feed last-arrival lag vs the newest data
#   anywhere + staleness flag — the operational freshness twin of
#   p_volume_anomaly.
# - ``b_power_analysis``: two-proportion sample-size planning from the
#   OBSERVED control rate of the hash-assigned experiment
#   (b_ab_experiment_report's assignment), for a +10% relative lift at
#   alpha=0.05 / power=0.8 — answers "can this experiment ever conclude
#   at current traffic?".
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, functions as F

_MRL_PREFIXES = (8, 16, 32)

def _mrl_oracle() -> str:
    selects = []
    for d in _MRL_PREFIXES:
        selects.append(
            f"""
    SELECT CAST({d} AS INT) AS dim_prefix,
           round(avg(cos), 4) AS avg_cos,
           round(min(cos), 4) AS min_cos,
           round(avg(energy), 4) AS avg_energy_ratio
    FROM (
      SELECT sqrt(sum(CASE WHEN i <= {d} THEN val * val ELSE 0 END)
                  / sum(val * val)) AS cos,
             sum(CASE WHEN i <= {d} THEN val * val ELSE 0 END)
               / sum(val * val) AS energy
      FROM (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
      )
      GROUP BY vec_id
    )"""
        )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY dim_prefix"
    )

@query("e_matryoshka_truncation_report", oracle=_mrl_oracle())
def e_matryoshka_truncation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation quality: for each candidate prefix length
    d in {8, 16, 32}, the cosine similarity between every vector and
    its d-dim truncation (zero-padded) and the retained-energy share.
    Prefix-vs-full cosine has the closed form ||v[:d]|| / ||v|| — no
    pair enumeration — so this is the cheap pre-flight for "serve a
    16-dim index, re-rank with the full vectors" (the IVF/PQ coarse
    stage sizing question).

    Scale shape: one position explode, one per-vector conditional-sum
    aggregate (map-side combinable on vec_id since vectors arrive
    whole), then a 3-row prefix report — per-vector cost O(dims),
    corpus cost one scan, no joins. Doubles round to 4 after the final
    fold (the standing absorb-in-round discipline).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("i"),
        F.col("valf").cast("double").alias("val"),
    )
    sq = F.col("val") * F.col("val")
    per_vec = pos.groupBy("vec_id").agg(
        F.sum(sq).alias("tot"),
        *[
            F.sum(F.when(F.col("i") <= d, sq).otherwise(0.0)).alias(f"p{d}")
            for d in _MRL_PREFIXES
        ],
    )
    outs = []
    for d in _MRL_PREFIXES:
        cos = F.sqrt(F.col(f"p{d}") / F.col("tot"))
        energy = F.col(f"p{d}") / F.col("tot")
        outs.append(
            per_vec.agg(
                F.lit(d).cast("int").alias("dim_prefix"),
                F.round(F.avg(cos), 4).alias("avg_cos"),
                F.round(F.min(cos), 4).alias("min_cos"),
                F.round(F.avg(energy), 4).alias("avg_energy_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("dim_prefix")

_PCA_ITERS = 2

_PCA_MATVEC = """
    mv{i} AS (
      SELECT c.i, round(sum(c.cv * v.v), 6) AS mv
      FROM cov c JOIN v{j} v ON v.i = c.j
      GROUP BY c.i
    ),
    n{i} AS (SELECT sqrt(sum(mv * mv)) AS nrm FROM mv{i}),
    v{i} AS (
      SELECT mv{i}.i, round(mv / NULLIF(nrm, 0), 6) AS v
      FROM mv{i}, n{i}
    )"""

def _pca_oracle() -> str:
    parts = [
        """
    WITH pos AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    mu AS (SELECT i, round(avg(val), 6) AS mu FROM pos GROUP BY i),
    cen AS (
      SELECT p.vec_id, p.i, p.val - m.mu AS c
      FROM pos p JOIN mu m ON m.i = p.i
    ),
    cov AS (
      SELECT a.i, b.i AS j,
             round(sum(a.c * b.c)
                   / (SELECT count(*) FROM embeddings), 6) AS cv
      FROM cen a JOIN cen b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ),
    v0 AS (SELECT i, 1.0 AS v FROM mu)"""
    ]
    for it in range(1, _PCA_ITERS + 1):
        parts.append("," + _PCA_MATVEC.format(i=it, j=it - 1))
    last = _PCA_ITERS
    parts.append(
        f"""
    SELECT v.i AS dim, round(v.v, 4) AS loading,
           (SELECT round(nrm, 4) FROM n{last}) AS eigenvalue_est
    FROM v{last} v
    ORDER BY dim
    """
    )
    return "".join(parts)

@query("e_pca_power_iteration", oracle=_pca_oracle())
def e_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding table: explicit
    covariance build (position self-join keyed on vec_id, population
    normalization) followed by {2} deterministic power iterations from
    the all-ones vector (normalized after each matvec) — reporting
    per-dimension loadings and the
    eigenvalue estimate ||A v|| after the final matvec (for a
    unit-normalized v, the power-iteration eigenvalue proxy). The
    iterative-linear-algebra shape on Spark: matvec = broadcast join +
    map-side-combined groupBy; normalization = a 1-row aggregate
    broadcast (the q11 global-threshold pattern).

    Scale shape: the covariance build is the only data-sized work —
    n x d^2 products partial-aggregate into a d^2-row frame (4096
    groups for d=64) before the exchange; every later frame is d- or
    d^2-sized. Per-entry rounding to 6 after each reduction keeps both
    engines iterating identical matrices (the e_kmeans_fit
    discipline); loadings round to 4 at the end. A d too large for a
    materialized d^2 covariance (d >~ 4k) would switch to
    Gram-accumulated matvecs without building A, same join shape.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("i"),
        F.col("valf").cast("double").alias("val"),
    )
    d = len(emb.select("embedding").first()[0])
    n = emb.count()
    mu = pos.groupBy("i").agg(F.round(F.avg("val"), 6).alias("mu"))
    cen = (
        pos.join(F.broadcast(mu), "i")
        .select("vec_id", "i", (F.col("val") - F.col("mu")).alias("c"))
    )
    a, b = cen.alias("a"), cen.alias("b")
    cov = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.round(F.sum(F.col("a.c") * F.col("b.c")) / n, 6).alias("cv"))
    )
    # d^2-row frame feeding every iteration: truncate lineage once.
    cov = cov.localCheckpoint(eager=True)
    # UNNORMALIZED all-ones init (not 1/sqrt(d)): for d a power of two,
    # 1/sqrt(d) is exactly dyadic, so matvec sums land on quarter-grid
    # points of the round-6 lattice — 1/8 of them EXACTLY on rounding
    # half-boundaries, where cross-engine summation order decides the
    # flip. With ones, the first matvec sums 1e-6-grid multiples
    # (boundary distance 5e-7 >> fp drift) and the first normalization
    # produces generic grid values; later products live on the 1e-12
    # grid. The first round's direction is identical either way.
    v = mu.select("i", F.lit(1.0).alias("v"))
    nrm_val = None
    for _ in range(_PCA_ITERS):
        mv = (
            cov.join(F.broadcast(v), cov["j"] == v["i"])
            .groupBy(cov["i"].alias("mi"))
            .agg(F.round(F.sum(F.col("cv") * F.col("v")), 6).alias("mv"))
            .withColumnRenamed("mi", "i")
        )
        nrm = mv.agg(F.sqrt(F.sum(F.col("mv") * F.col("mv"))).alias("nrm"))
        v = (
            mv.crossJoin(F.broadcast(nrm))
            .select(
                "i",
                F.round(
                    F.col("mv") / F.nullif("nrm", F.lit(0.0)), 6
                ).alias("v"),
            )
        )
        nrm_val = nrm
    return (
        v.crossJoin(F.broadcast(nrm_val))
        .select(
            F.col("i").alias("dim"),
            F.round("v", 4).alias("loading"),
            F.round("nrm", 4).alias("eigenvalue_est"),
        )
        .orderBy("dim")
    )


# ===========================================================================
# section consolidated from plans/round6j_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 9: IVF probe-count sweep, grouped
# jackknife SE, and seasonal-naive anomaly flags.
#
# - ``e_ivf_nprobe_sweep``: recall@3 and candidate volume for n_probe in
#   {{1, 2, 4}} in one report — the ANN twin of d_minhash_band_sweep
#   (e_ivf_recall_report measures ONE point on the recall/cost curve;
#   production tuning needs the curve).
# - ``a_jackknife_se``: delete-a-group jackknife standard error of the
#   mean document length, leaving out one SOURCE at a time — the exact,
#   deterministic resampling companion to a_bootstrap_ci (no randomness
#   at all), plus the max-influence source (whose removal moves the
#   estimate most — the "is one feed dominating this metric?" readout).
# - ``ts_snaive_anomaly``: days whose seasonal-naive forecast residual
#   exceeds 2 sigma, per event type — the alerting layer on top of
#   ts_snaive_forecast_eval's backtest.
# ===========================================================================

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
    three configs, and (r11) ONE probed-list join + cosine rerank
    scores the max-probe candidate superset carrying each pair's best
    probe rank — candidate sets are monotone in n_probe, so each
    config is a ``min_rn <= p`` filter plus a per-query top-k window
    over the same scored sample-sized frame; the exact-truth side runs
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
    # Candidate sets are MONOTONE in n_probe (cand_1 ⊆ cand_2 ⊆
    # cand_4: probing more lists only adds candidates), so — r11 — the
    # probed-list join and the cosine rerank run ONCE on the max-probe
    # superset, carrying each pair's best probe rank (min rn); every
    # config is then a ``min_rn <= p`` filter over the same scored
    # frame. The previous shape ran the list join, the distinct and
    # the (query × candidate) cosine once PER config. The scored frame
    # is probed-list-bounded (query sample × probed lists), so the
    # checkpoint that makes it single-derivation is sample-sized.
    scored = (
        probes_all.join(lists, "c_label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("rn").alias("__min_rn"))
        .join(q, "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "__min_rn",
            cosine(F.col("__q"), F.col("__c")).alias("cos_sim"),
        )
        .localCheckpoint(eager=False)
    )
    outs = []
    for p in _SWEEP_PROBES:
        sub = scored.filter(F.col("__min_rn") <= p)
        cand_n = sub.agg(F.count("*").alias("n_candidates"))
        wk = W.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        topk = (
            sub.withColumn("rn", F.row_number().over(wk))
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


# ===========================================================================
# section consolidated from plans/round6n_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

@query(
    "e_embedding_qa_report",
    oracle="""
    WITH norms AS (
      SELECT label, len(embedding) AS dim,
             sqrt(list_sum(list_transform(embedding,
                                          x -> CAST(x AS DOUBLE) * x)))
               AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(count(DISTINCT dim) AS BIGINT) AS n_dims_seen,
           CAST(max(dim) AS INT) AS dim,
           round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm,
           CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vecs
    FROM norms GROUP BY label ORDER BY label
    """,
)
def e_embedding_qa_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA per label: vector count, dimension consistency
    (n_dims_seen must be 1 per label or every dot product downstream
    is comparing apples to oranges), the L2-norm profile, and
    zero-vector count (cosine against a zero vector is NaN — the
    classic silent ANN poison). The pre-flight before any index build
    or e_* similarity query trusts this table.

    Scale shape: the norm is a per-row JVM higher-order fold over the
    array column (no explode — the row count never multiplies by
    dimension) feeding one map-side-combined per-label aggregate;
    nothing shuffles but label partial rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label",
        F.size("embedding").alias("dim"),
        F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("nrm"),
    )
    return (
        norms.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.countDistinct("dim").cast("long").alias("n_dims_seen"),
            F.max("dim").cast("int").alias("dim"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
            F.sum((F.col("nrm") == 0).cast("int"))
            .cast("long")
            .alias("n_zero_vecs"),
        )
        .orderBy("label")
    )


# ===========================================================================
# section consolidated from plans/round7c_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 3: product quantization and
# seasonal decomposition.
#
# - e_pq_codebook   — PQ codebook fit (m=4 subspaces × k=8 sub-centroids,
#   one Lloyd iteration from deterministic seeds) + assignment census
# - e_pq_fitted_adc_topk   — PQ asymmetric-distance top-k search (the
#   distance-table lookup path real billion-vector ANN serves from)
# - ts_seasonal_decompose — 7-day moving-average trend + day-of-week
#   seasonal indices + seasonal-strength per event type
#
# These complete the PQ story's TRAINING side: e_pq_recall_report
# (above in this module) measures ADC recall against a label-derived
# codebook; here the codebook is actually FIT (Lloyd from data seeds —
# what a production PQ index builds) and the ADC search ships the exact
# d² beside each hit so quantization error is certified per row. At
# 100 TB the corpus is stored as m small codes per vector and a query
# touches only an m×k distance table plus the code column — memory
# traffic per candidate drops from d floats to m bytes.
#
# Determinism discipline (same as e_kmeans_fit): seeds are the first k
# vec_ids, every centroid component and distance is rounded to 6 decimals
# on BOTH engines before comparisons, ties break on cid — the oracle and
# Spark walk identical Lloyd steps.
# ===========================================================================

_PQ_M = 4          # subspaces

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
    # top-k via a FILTER on the rank column, not .limit() (r12, guide
    # §2.2): with the filter, InferWindowGroupLimit applies a partial
    # per-partition limit BEFORE the global window's single-partition
    # exchange (only ~tasks × k rows move); the old .limit() after the
    # window left the rewrite unable to fire, so the whole corpus-sized
    # ADC frame moved to one partition. rank ≤ k over the same
    # (adc_d2, vec_id) total order selects exactly the rows the sorted
    # limit did.
    ranked = (
        adc.join(exact, "vec_id")
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy("adc_d2", "vec_id")).cast("long"),
        )
        .where(F.col("rank") <= _PQ_TOPK)
        .orderBy("adc_d2", "vec_id")
    )
    return ranked.select("vec_id", "adc_d2", "exact_d2", "rank")


# ===========================================================================
# section consolidated from plans/round7e_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 5: IVF-PQ composition, ratio
# metrics, community quality.
#
# - e_ivf_pq_topk          — the full production ANN stack: IVF coarse
#   probing bounds candidates to the probed lists, PQ asymmetric-distance
#   ranks them from codes alone (FAISS ``IVFx,PQy`` shape)
# - a_ratio_metric_delta_ci — delta-method CI for a user-clustered ratio
#   metric (value per event with user-level variance)
# - g_community_modularity  — Newman modularity of the deterministic LPA
#   partition (composes round6f's lpa_state)
#
# e_ivf_pq_topk completes the compression×pruning matrix: e_ivf_topk
# (floats, pruned), e_sq_int8_topk (int8, unpruned), e_ivf_sq_topk
# (int8, pruned), e_pq_fitted_adc_topk (codes, unpruned) — this is (codes,
# pruned), the shape billion-vector serving actually runs.
# ===========================================================================

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


# ===========================================================================
# section consolidated from plans/round7i_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 9: binary quantization.
#
# - e_binary_hamming_topk — 1-bit (sign) quantization + Hamming-distance
#   top-k: the most aggressive rung of the compression ladder
#   (float e_knn_bruteforce → int8 e_sq_int8_topk → PQ codes
#   e_pq_fitted_adc_topk / e_ivf_pq_topk → 1 bit per dimension here).
#   Binary embeddings are the current high-recall/64x-compression
#   serving trend; Hamming distance is XOR+popcount over packed words,
#   which a columnar engine evaluates at memory bandwidth.
# ===========================================================================

_BQ_NQUERIES = 5

_BQ_TOPK = 10

def packed_sign_code():
    """Column expr packing a 64-dim embedding's sign bits into ONE
    BIGINT — a JVM aggregate fold in codegen, no UDF (SQL form because
    shiftleft takes a column shift amount there). Shared with
    e_compression_recall_matrix (this module)."""
    return F.expr(
        "aggregate(transform(embedding,"
        " (v, i) -> IF(v >= 0, shiftleft(1L, i), 0L)),"
        " 0L, (acc, x) -> acc | x)"
    )

@query(
    "e_binary_hamming_topk",
    oracle=f"""
    WITH pos AS (
      SELECT vec_id, i AS pos,
             CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0
                  THEN 1 ELSE 0 END AS b
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(sum(CASE WHEN q.b <> c.b THEN 1 ELSE 0 END) AS BIGINT)
               AS hamming
      FROM pos q JOIN pos c ON c.pos = q.pos
      WHERE q.vec_id < {_BQ_NQUERIES} AND c.vec_id >= {_BQ_NQUERIES}
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, hamming,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming, neighbor_id) AS rn
      FROM pairs
    ) WHERE rn <= {_BQ_TOPK}
    ORDER BY query_id, rank
    """,
)
def e_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized top-k: each dimension collapses to its sign bit
    and similarity is the Hamming distance between the bit vectors —
    64× compression of a float32 embedding with recall high enough
    that modern serving stacks use it as the first-pass filter before
    an exact re-rank (the re-rank is e_knn_bruteforce's plan over the
    survivors). The gate ranks deterministically on (hamming,
    neighbor_id).

    Scale shape: corpus side packs to ONE long per 64 dims
    (``aggregate`` over the sign bits with shift-or — pure JVM bit
    arithmetic in codegen); queries broadcast; distance =
    bit_count(xor) per packed word, evaluated at memory bandwidth with
    zero shuffle before the per-query top-k. The oracle computes the
    same distances positionally (bit-packing is engine-internal; the
    DISTANCES are the contract).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    bits = emb.select("vec_id", packed_sign_code().alias("code"))
    q = bits.where(F.col("vec_id") < _BQ_NQUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("qcode")
    )
    c = bits.where(F.col("vec_id") >= _BQ_NQUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("code").alias("ccode")
    )
    pairs = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.bit_count(F.col("qcode").bitwiseXOR(F.col("ccode")))
        .cast("long")
        .alias("hamming"),
    )
    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    )
    return (
        pairs.withColumn("rank", rn.cast("long"))
        .where(F.col("rank") <= _BQ_TOPK)
        .orderBy("query_id", "rank")
        .select("query_id", "neighbor_id", "hamming", "rank")
    )


# ===========================================================================
# section consolidated from plans/round7j_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 10: the compression-ladder
# capstone and covariate balance.
#
# - e_compression_recall_matrix — recall@10 vs exact-L2 truth for every
#   compressed ANN representation in the repo (int8 SQ, fitted PQ/ADC,
#   1-bit Hamming) on the same query set: the single report that MEASURES
#   the accuracy/compression dial instead of asserting it. (e_pq_recall_
#   report and e_ivf_recall_report measure single rungs; this is the
#   side-by-side.)
# - a_covariate_balance — standardized mean differences of pre-exposure
#   covariates across the hash-assigned arms (the balance gate that
#   complements b_ab_srm_check: SRM checks COUNTS, SMD checks that the
#   arms look alike on covariates before any readout is trusted).
# ===========================================================================

_CM_NQ = 5      # queries: vec_id < 5

_CM_TOPK = 10

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
    e_recall_cost_frontier (this module) joins the same hits
    against measured candidate counts and code bytes — both reports
    MUST rank from this one construction or a precision tweak in one
    desynchronizes them (same rule as operators/similarity.py's
    shared eval-truth frame)."""
    from ..operators.similarity import exact_l2_pairs, sq_int8_codes
    from .ann import packed_sign_code

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


# ===========================================================================
# section consolidated from plans/round8_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-8 operators: depth items closing measured gaps only (round-7
# verdict item 6 — no breadth registrations).
#
# - d_incremental_lsh_dedup — near-dup tier of the daily-ingest workflow:
#   the batch probes the corpus's precomputed LSH band table instead of
#   recomputing the full-corpus self-join. Closes the measured gap that
#   d_incremental_dedup's exact tier scales as O(batch) per day while the
#   near-dup tier (d_minhash_lsh_pairs) re-pays the whole corpus every run.
# - j_planned_skew_join — the skew planner's per-key salt factors APPLIED:
#   adaptive salting where only measured-hot keys replicate. Closes the
#   gap that p_partition_skew_planner derives factors nothing consumes
#   per-key, and j_salted_skew_join's uniform replication is the measured
#   driver of its 3.8× 10×-probe ratio.
# - d_embedding_neardup_incremental(_prod) — the embedding tier of the
#   same daily probe: batch hyperplane-LSH bands probe the corpus band
#   table, exact cosine verifies. The coarse 4×4/τ=0.4 gate is the
#   semantic pin (real collisions); the 4×16/τ=0.9 twin is the cost pin
#   (selective bands, flat 10× probe, verified set empty on the
#   near-orthogonal synthetic corpus by design).
# - e_ivf_balanced_assign — capacity-constrained IVF list assignment
#   (FAISS balanced-k-means shape: cap = ceil(N/K), overflow spills to
#   the vector's second-nearest centroid). Closes the measured gap
#   between p_partition_skew_planner (which MEASURES hot-key skew and
#   derives salt factors for shuffle keys) and e_ivf_assign (whose lists
#   are unbounded): an IVF list is exactly such a key — at 100 TB the
#   hottest list dominates every probe that touches it, and the planner's
#   own remedy (bound the per-key row count) applied to ANN assignment is
#   capacity-balanced lists. The census this query emits (per-list load
#   factor before/after) is the measured dial.
# ===========================================================================

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
    from ..operators.similarity import capacity_balanced_labels, centroids_by

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroids_by(emb, "label").localCheckpoint(eager=False)
    bal = capacity_balanced_labels(emb, cents)
    stats = emb.agg(
        F.count("*").alias("n_tot"),
        F.countDistinct("label").alias("k_lists"),
    )

    def entry(lbl, p, k, i):
        return F.struct(
            lbl.alias("lbl"),
            F.lit(p).alias("p"),
            F.lit(k).alias("k"),
            F.lit(i).alias("i"),
        )

    contrib = bal.select(
        F.explode(
            F.when(
                ~F.col("over"),
                F.array(entry(F.col("primary_label"), 1, 1, 0)),
            ).otherwise(
                F.array(
                    entry(F.col("primary_label"), 1, 0, 0),
                    entry(F.col("balanced_label"), 0, 0, 1),
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

_BR_NQ = 5      # queries: vec_id < 5; corpus: vec_id >= 5

_BR_TOPK = 10

_BR_NPROBE = 2

_BR_ORACLE = f"""
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
      -- n_c: corpus rows (what the cap divides); k_lists: distinct
      -- labels over ALL embeddings — the centroid source the Spark
      -- side builds lists from (a label occurring only among query
      -- vectors is still a list; corpus-only counting would shrink
      -- the cap and silently diverge)
      SELECT (SELECT count(*) FROM embeddings WHERE vec_id >= {_BR_NQ}) AS n_c,
             (SELECT count(DISTINCT label) FROM embeddings) AS k_lists
    ),
    prim AS (
      SELECT id, c_label,
             row_number() OVER (PARTITION BY c_label
                                ORDER BY round(cos_sim, 6) DESC, id) AS caprank
      FROM t2 WHERE rn = 1 AND id >= {_BR_NQ}
    ),
    capped AS (
      SELECT p.*, CAST(ceil(s.n_c * 1.0 / s.k_lists) AS BIGINT) AS cap
      FROM prim p CROSS JOIN stats s
    ),
    final AS (
      SELECT c.id,
             c.c_label AS primary_label,
             CASE WHEN c.caprank > c.cap THEN t.c_label
                  ELSE c.c_label END AS balanced_label
      FROM capped c JOIN t2 t ON t.id = c.id AND t.rn = 2
    ),
    probes AS (
      SELECT id AS query_id, c_label
      FROM t2 WHERE rn <= {_BR_NPROBE} AND id < {_BR_NQ}
    ),
    d2 AS (
      SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
             round(sum((p.val - q.val) * (p.val - q.val)), 6) AS d
      FROM pos p JOIN pos q ON q.pos = p.pos
      WHERE p.vec_id >= {_BR_NQ} AND q.vec_id < {_BR_NQ}
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d, neighbor_id) AS rn
        FROM d2
      ) WHERE rn <= {_BR_TOPK}
    ),
    cand AS (
      SELECT 'balanced' AS variant, pr.query_id, f.id AS neighbor_id
      FROM probes pr JOIN final f ON f.balanced_label = pr.c_label
      UNION ALL
      SELECT 'primary', pr.query_id, f.id
      FROM probes pr JOIN final f ON f.primary_label = pr.c_label
    ),
    ranked AS (
      SELECT c.variant, c.query_id, c.neighbor_id,
             count(*) OVER (PARTITION BY c.variant, c.query_id) AS n_cand,
             row_number() OVER (PARTITION BY c.variant, c.query_id
                                ORDER BY d.d, c.neighbor_id) AS rn
      FROM cand c JOIN d2 d
        ON d.query_id = c.query_id AND d.neighbor_id = c.neighbor_id
    )
    SELECT r.variant, r.query_id,
           CAST(max(r.n_cand) AS BIGINT) AS n_cand,
           CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           round(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / {_BR_TOPK}, 2) AS recall_at_{_BR_TOPK}
    FROM ranked r
    LEFT JOIN truth t
      ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
    WHERE r.rn <= {_BR_TOPK}
    GROUP BY r.variant, r.query_id
    ORDER BY r.variant, r.query_id
"""

@query("e_ivf_balanced_recall", oracle=_BR_ORACLE)
def e_ivf_balanced_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall cost of capacity balancing — the OTHER half of the dial
    e_ivf_balanced_assign measures: balancing bounds every list (probe
    cost becomes uniform), but a spilled vector no longer lives in its
    nearest list, so a probe that would have found it under primary
    assignment can miss it. This query probes the SAME {_BR_NPROBE}
    nearest lists per query against both assignments and reports, per
    query and variant, the candidate count (the probe's COST) and
    recall@{_BR_TOPK} vs exact-L2 truth (its ACCURACY). Read the pair
    of rows per query as the measured trade: balanced costs
    max-bounded n_cand; primary costs whatever the hottest probed list
    holds.

    Measured gap this closes: the compression ladder
    (e_compression_recall_matrix) scores representation tiers and
    e_ivf_nprobe_sweep scores probe counts, but the balance dial added
    this round had a load census only — its recall side was asserted,
    not measured.

    Scale shape: truth and candidate ranking share ONE rounded
    exact-d2 frame over (bounded query sample × corpus) — the standard
    eval protocol; the balanced assignment is the production
    one-corpus-pass operator (capacity_balanced_labels); candidate
    sets are probed-list-bounded; every window partitions by
    (variant, query) — never global.
    """
    from ..operators.similarity import (
        capacity_balanced_labels,
        centroids_by,
        exact_l2_pairs,
        top_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") < _BR_NQ
    cents = centroids_by(emb, "label").localCheckpoint(eager=False)
    corpus = emb.where(~is_q)
    # one corpus pass feeds BOTH variant joins — truncate the plan so
    # the top-2-centroid walk is not replayed per consumer
    final = capacity_balanced_labels(corpus, cents).localCheckpoint(eager=False)
    probes = top_centroids(emb.where(is_q), cents, n=_BR_NPROBE).select(
        F.col("id").alias("query_id"), "c_label"
    )

    # shared by the truth top-k and both variants' candidate ranking
    # (sample-bounded: 5 queries x corpus)
    d2 = exact_l2_pairs(emb, _BR_NQ).localCheckpoint(eager=False)

    def topk(pairs: DataFrame, *part) -> DataFrame:
        rn = F.row_number().over(
            W.partitionBy(*part).orderBy("d", "neighbor_id")
        )
        return pairs.withColumn("rn", rn).where(F.col("rn") <= _BR_TOPK)

    truth = topk(d2, "query_id").select("query_id", "neighbor_id")

    cand = (
        probes.join(final, probes["c_label"] == final["balanced_label"])
        .select(F.lit("balanced").alias("variant"), "query_id", F.col("id").alias("neighbor_id"))
        .unionAll(
            probes.join(final, probes["c_label"] == final["primary_label"])
            .select(F.lit("primary").alias("variant"), "query_id", F.col("id").alias("neighbor_id"))
        )
    )
    ranked = (
        cand.join(d2, ["query_id", "neighbor_id"])
        .withColumn(
            "n_cand", F.count("*").over(W.partitionBy("variant", "query_id"))
        )
    )
    hit = truth.withColumn("hit", F.lit(1))
    return (
        topk(ranked, "variant", "query_id")
        .join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("variant", "query_id")
        .agg(
            F.max("n_cand").cast("long").alias("n_cand"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) * 1.0 / _BR_TOPK, 2
            ).alias(f"recall_at_{_BR_TOPK}"),
        )
        .orderBy("variant", "query_id")
    )


# ===========================================================================
# section consolidated from plans/round8b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-8 continuation operators: depth items closing measured gaps
# only (round-7 verdict item 6 — no breadth registrations).
#
# - e_recall_cost_frontier — the COST axis of the compression-ladder
#   capstone. Closes the measured gap that e_compression_recall_matrix
#   measures each tier's recall@10 while the tiers' serving costs are
#   asserted in docstrings ("4×", "16×", "64×", "probed lists only"),
#   never measured on the same query set: this report joins the SAME
#   per-(method, query) hits against measured candidate counts and code
#   bytes, so the recall/cost frontier an operator actually navigates
#   (scan_bytes vs recall) is one table instead of a docstring claim.
#   The IVF-PQ row is the point of the exercise — its candidate count is
#   data-dependent (probed-list sizes), and at sf0.01 the measurement
#   shows the pruning that the unpruned tiers pay for in full scans.
# - e_ivf_incremental_assign — the ANN tier of the daily-ingest
#   workflow. Closes the measured gap that the incremental family covers
#   every DEDUP tier (d_incremental_dedup exact hashes,
#   d_incremental_lsh_dedup minhash bands, d_embedding_neardup_
#   incremental hyperplane bands) while every ANN index entry
#   (e_ivf_assign, e_ivf_balanced_assign, e_kmeans_fit) refits its
#   quantizer from the full corpus each run: here today's batch
#   (vec_id % 10 = 7, the family's shared batch convention) is assigned
#   against the PERSISTED coarse quantizer — centroids fitted on the
#   corpus EXCLUDING the batch — and the report is the refit dial
#   (per-list adds, growth, assigned-similarity drift).
# - e_ivf_staleness_recall — the RECALL side of that refit dial.
#   e_ivf_incremental_assign's drift report asserts that shift surfaces
#   "before recall degrades"; this measures the degradation directly:
#   the same probe protocol (nprobe=2, exact-d² rerank, recall@10 vs
#   the shared truth frame — e_ivf_balanced_recall's shape) run against
#   both quantizers — STALE (fitted excluding the batch, the index a
#   no-refit service keeps serving) and FRESH (refit on everything) —
#   with per-query candidate counts and the batch share of candidates
#   (whether stale probes still REACH the incrementally-added vectors
#   is the actual failure mode of skipping refits).
#
# Both queries reuse the production machinery they evaluate
# (_matrix_parts above, operators/similarity.centroids_by /
# top_centroids) — a private reimplementation here would let the report
# and the serving path drift apart.
# ===========================================================================

_CM_PREFIX = _CM_ORACLE[: _CM_ORACLE.rindex("SELECT m.method")].rstrip()

assert _CM_PREFIX.endswith(")"), "recall-matrix oracle shape changed"

_FRONTIER_ORACLE = (
    _CM_PREFIX
    + f""",
    dim AS (SELECT max(len(embedding)) AS d FROM embeddings),
    corpus AS (SELECT count(*) AS n FROM embeddings WHERE vec_id >= {_CM_NQ}),
    cand_counts AS (
      SELECT 'sq8' AS method, q.vec_id AS query_id,
             c.n AS n_candidates, d.d AS code_bytes
      FROM embeddings q CROSS JOIN corpus c CROSS JOIN dim d
      WHERE q.vec_id < {_CM_NQ}
      UNION ALL
      SELECT 'pq_fitted', q.vec_id, c.n, d.d // {_PQ_SUBDIM}
      FROM embeddings q CROSS JOIN corpus c CROSS JOIN dim d
      WHERE q.vec_id < {_CM_NQ}
      UNION ALL
      SELECT 'binary', q.vec_id, c.n, ((d.d + 63) // 64) * 8
      FROM embeddings q CROSS JOIN corpus c CROSS JOIN dim d
      WHERE q.vec_id < {_CM_NQ}
      UNION ALL
      SELECT 'ivf_pq', ic.query_id, count(*), max(d.d) // {_PQ_SUBDIM}
      FROM ivf_cand ic CROSS JOIN dim d
      GROUP BY 1, 2
    ),
    hits AS (
      SELECT m.method, m.query_id,
             sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS nh
      FROM all_tops m
      LEFT JOIN truth t
        ON t.query_id = m.query_id AND t.neighbor_id = m.neighbor_id
      GROUP BY 1, 2
    )
    SELECT c.method, c.query_id,
           CAST(c.n_candidates AS BIGINT) AS n_candidates,
           CAST(c.code_bytes AS BIGINT) AS code_bytes,
           CAST(c.n_candidates * c.code_bytes AS BIGINT) AS scan_bytes,
           CAST(h.nh AS BIGINT) AS n_hits,
           round(h.nh * 1.0 / {_CM_TOPK}, 2) AS recall_at_{_CM_TOPK}
    FROM cand_counts c JOIN hits h
      ON h.method = c.method AND h.query_id = c.query_id
    ORDER BY c.method, c.query_id
"""
)

@query("e_recall_cost_frontier", oracle=_FRONTIER_ORACLE)
def e_recall_cost_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/cost frontier of the compression ladder: for every
    (tier, query) the recall matrix scores, also MEASURE what the tier
    scanned to earn it — candidate rows (full corpus for the unpruned
    tiers, the probed lists' union for IVF-PQ) and code bytes per
    candidate — so scan_bytes vs recall@10 is one measured table.
    e_compression_recall_matrix answers "how accurate is each tier";
    this answers the operator's follow-up, "per byte scanned, which
    tier is on the frontier" — the docstrings' 4×/16×/64× claims and
    e_ivf_pq_topk's "candidates = probed-list sizes not N" become
    measured numbers on the same query set.

    Scale shape: identical to the matrix (one shared construction,
    this module’s _matrix_parts — the hits frames are the same
    DataFrames, not a re-derivation); the cost side adds only 1-row
    corpus-count/dim aggregates broadcast onto the query-sample frame
    and a groupBy over the IVF candidate set, all bounded by the
    query sample.
    """
    emb, truth, all_tops, ivf_cand = _matrix_parts(spark, sf_dir)
    is_q = F.col("vec_id") < _CM_NQ

    dim_df = emb.agg(F.max(F.size("embedding")).cast("long").alias("d"))
    corpus_n = emb.where(~is_q).agg(F.count("*").alias("n"))
    base = (
        emb.where(is_q)
        .select(F.col("vec_id").alias("query_id"))
        .crossJoin(F.broadcast(corpus_n))
        .crossJoin(F.broadcast(dim_df))
    )

    def tier(name: str, bytes_col) -> DataFrame:
        return base.select(
            F.lit(name).alias("method"),
            "query_id",
            F.col("n").cast("long").alias("n_candidates"),
            bytes_col.cast("long").alias("code_bytes"),
        )

    pq_bytes = F.floor(F.col("d") / _PQ_SUBDIM)
    cand = (
        tier("sq8", F.col("d"))
        .unionAll(tier("pq_fitted", pq_bytes))
        .unionAll(tier("binary", F.floor((F.col("d") + 63) / 64) * 8))
        .unionAll(
            ivf_cand.groupBy("query_id")
            .agg(F.count("*").alias("nc"))
            .crossJoin(F.broadcast(dim_df))
            .select(
                F.lit("ivf_pq").alias("method"),
                "query_id",
                F.col("nc").cast("long").alias("n_candidates"),
                pq_bytes.cast("long").alias("code_bytes"),
            )
        )
    )
    hit = truth.withColumn("hit", F.lit(1))
    hits = (
        all_tops.join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("method", "query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"))
    )
    return (
        cand.join(hits, ["method", "query_id"])
        .select(
            "method",
            "query_id",
            "n_candidates",
            "code_bytes",
            (F.col("n_candidates") * F.col("code_bytes"))
            .cast("long")
            .alias("scan_bytes"),
            "n_hits",
            F.round(F.col("n_hits") * 1.0 / _CM_TOPK, 2).alias(
                f"recall_at_{_CM_TOPK}"
            ),
        )
        .orderBy("method", "query_id")
    )

_INC_ORACLE = """
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cents AS (
      SELECT label AS c_label, pos, avg(val) AS cval
      FROM pos WHERE vec_id % 10 <> 7
      GROUP BY 1, 2
    ),
    sims AS (
      SELECT p.vec_id, c.c_label,
             sum(p.val * c.cval)
               / (sqrt(sum(p.val * p.val)) * sqrt(sum(c.cval * c.cval)))
               AS cos_sim
      FROM pos p JOIN cents c ON p.pos = c.pos
      GROUP BY 1, 2
    ),
    assigned AS (
      SELECT vec_id, c_label,
             round(cos_sim, 6) AS sim,
             vec_id % 10 = 7 AS is_batch
      FROM (
        SELECT vec_id, c_label, cos_sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, c_label) AS rn
        FROM sims
      ) WHERE rn = 1
    )
    SELECT c_label,
           CAST(count(*) FILTER (NOT is_batch) AS BIGINT) AS n_corpus,
           CAST(count(*) FILTER (is_batch) AS BIGINT) AS n_batch,
           CAST(count(*) AS BIGINT) AS n_after,
           round(count(*) FILTER (is_batch) * 100.0
                 / nullif(count(*) FILTER (NOT is_batch), 0), 2) AS growth_pct,
           round(avg(sim) FILTER (NOT is_batch), 4) AS corpus_mean_sim,
           round(avg(sim) FILTER (is_batch), 4) AS batch_mean_sim,
           round(avg(sim) FILTER (NOT is_batch)
                 - avg(sim) FILTER (is_batch), 4) AS sim_drift
    FROM assigned
    GROUP BY 1 ORDER BY 1
"""

@query("e_ivf_incremental_assign", oracle=_INC_ORACLE)
def e_ivf_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF maintenance: today's batch (vec_id % 10 = 7 —
    the daily-ingest family's shared convention) is assigned against
    the PERSISTED coarse quantizer (centroids fitted on the corpus
    EXCLUDING the batch — the quantizer does NOT see today's data, the
    defining property of incremental assignment), and the report is
    the refit dial: per-list corpus size, batch adds, growth, and
    assigned-similarity drift (corpus_mean_sim − batch_mean_sim; a
    batch that matches the quantizer scores like the corpus, and
    distribution shift surfaces as positive drift / concentrated
    growth before recall degrades).

    Closes the measured gap named in the module docstring: the dedup
    tiers all have an incremental daily path; the ANN index did not —
    every e_ivf_* entry refits from the full corpus each run, which at
    100 TB is a full rescan per day. Here the daily cost is ONE
    batch-sized assignment pass (top-1 centroid against the broadcast
    quantizer, exactly e_ivf_assign's production machinery); the
    corpus-side census is the maintained list table an index service
    already stores — recomputed in this self-contained gate only so
    the oracle can certify both sides from raw data.

    Scale shape: centroids are a labels × dim frame fitted once and
    broadcast (operators/similarity.centroids_by / top_centroids);
    the assignment never shuffles the corpus — per-vector work is one
    broadcast join + argmax; the census is one map-side-combined
    groupBy(c_label). Per-row cosine is rounded to 6 before the means
    (the shared cross-engine-determinism rule from
    operators/similarity.exact_l2_pairs); list-count columns are
    exact integers.
    """
    from ..operators.similarity import centroids_by, top_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % 10 == 7
    cents = centroids_by(emb.where(~is_batch), "label").localCheckpoint(
        eager=False
    )
    assigned = top_centroids(emb, cents, n=1, keep_sim=True).select(
        "c_label",
        (F.col("id") % 10 == 7).alias("is_batch"),
        F.round(F.col("cos_sim"), 6).alias("sim"),
    )
    agg = assigned.groupBy("c_label").agg(
        F.count(F.when(~F.col("is_batch"), F.lit(1))).alias("n_corpus"),
        F.count(F.when(F.col("is_batch"), F.lit(1))).alias("n_batch"),
        F.count(F.lit(1)).alias("n_after"),
        F.avg(F.when(~F.col("is_batch"), F.col("sim"))).alias("cms"),
        F.avg(F.when(F.col("is_batch"), F.col("sim"))).alias("bms"),
    )
    return agg.select(
        "c_label",
        F.col("n_corpus").cast("long").alias("n_corpus"),
        F.col("n_batch").cast("long").alias("n_batch"),
        F.col("n_after").cast("long").alias("n_after"),
        F.round(
            F.col("n_batch") * 100.0 / F.nullif(F.col("n_corpus"), F.lit(0)), 2
        ).alias("growth_pct"),
        F.round(F.col("cms"), 4).alias("corpus_mean_sim"),
        F.round(F.col("bms"), 4).alias("batch_mean_sim"),
        F.round(F.col("cms") - F.col("bms"), 4).alias("sim_drift"),
    ).orderBy("c_label")

_ST_NQ = 5      # queries: vec_id < 5 (the shared sample convention)

_ST_TOPK = 10

_ST_NPROBE = 2

_ST_ORACLE = f"""
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cents_stale AS (
      SELECT label AS c_label, pos, avg(val) AS cval
      FROM pos WHERE vec_id % 10 <> 7
      GROUP BY 1, 2
    ),
    cents_fresh AS (
      SELECT label AS c_label, pos, avg(val) AS cval
      FROM pos GROUP BY 1, 2
    ),
    cents AS (
      SELECT 'stale' AS variant, * FROM cents_stale
      UNION ALL SELECT 'fresh', * FROM cents_fresh
    ),
    dots AS (
      SELECT c.variant, p.vec_id AS id, c.c_label,
             sum(p.val * c.cval)
               / (sqrt(sum(p.val * p.val)) * sqrt(sum(c.cval * c.cval)))
               AS cos_sim
      FROM pos p JOIN cents c ON p.pos = c.pos
      GROUP BY 1, 2, 3
    ),
    t2 AS (
      SELECT variant, id, c_label,
             row_number() OVER (PARTITION BY variant, id
                                ORDER BY cos_sim DESC, c_label) AS rn
      FROM dots
    ),
    lists AS (
      SELECT variant, id AS neighbor_id, c_label
      FROM t2 WHERE rn = 1 AND id >= {_ST_NQ}
    ),
    probes AS (
      SELECT variant, id AS query_id, c_label
      FROM t2 WHERE rn <= {_ST_NPROBE} AND id < {_ST_NQ}
    ),
    d2 AS (
      SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
             round(sum((p.val - q.val) * (p.val - q.val)), 6) AS d
      FROM pos p JOIN pos q ON q.pos = p.pos
      WHERE p.vec_id >= {_ST_NQ} AND q.vec_id < {_ST_NQ}
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d, neighbor_id) AS rn
        FROM d2
      ) WHERE rn <= {_ST_TOPK}
    ),
    cand AS (
      SELECT p.variant, p.query_id, l.neighbor_id
      FROM probes p JOIN lists l
        ON l.variant = p.variant AND l.c_label = p.c_label
    ),
    ranked AS (
      SELECT c.variant, c.query_id, c.neighbor_id,
             count(*) OVER (PARTITION BY c.variant, c.query_id) AS n_cand,
             sum(CASE WHEN c.neighbor_id % 10 = 7 THEN 1 ELSE 0 END)
               OVER (PARTITION BY c.variant, c.query_id) AS n_batch_cand,
             row_number() OVER (PARTITION BY c.variant, c.query_id
                                ORDER BY d.d, c.neighbor_id) AS rn
      FROM cand c JOIN d2 d
        ON d.query_id = c.query_id AND d.neighbor_id = c.neighbor_id
    )
    SELECT r.variant, r.query_id,
           CAST(max(r.n_cand) AS BIGINT) AS n_cand,
           CAST(max(r.n_batch_cand) AS BIGINT) AS n_batch_cand,
           CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           round(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / {_ST_TOPK}, 2) AS recall_at_{_ST_TOPK}
    FROM ranked r
    LEFT JOIN truth t
      ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
    WHERE r.rn <= {_ST_TOPK}
    GROUP BY r.variant, r.query_id
    ORDER BY r.variant, r.query_id
"""

@query("e_ivf_staleness_recall", oracle=_ST_ORACLE)
def e_ivf_staleness_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall cost of quantizer staleness — the measurement behind
    e_ivf_incremental_assign's refit dial. An index service that
    absorbs daily batches by incremental assignment keeps serving from
    the STALE quantizer (centroids fitted before the batch); this
    query runs the same probe protocol (nprobe={_ST_NPROBE}, exact-d²
    rerank, recall@{_ST_TOPK} vs the rounded exact-L2 truth) against
    both quantizers — stale (fitted on vec_id % 10 <> 7) and FRESH
    (refit on everything) — and reports, per (variant, query), the
    candidate count, the BATCH share of candidates (whether stale
    probes still reach the incrementally-added vectors — the actual
    failure mode of deferring refits), and recall. On a stationary
    corpus the two variants should read alike — that null result is
    the certificate that deferring the refit was free; under drift the
    stale rows degrade first.

    Scale shape: both quantizers are labels × dim frames fitted in one
    corpus pass each and broadcast (centroids_by / top_centroids);
    candidates are probed-list-bounded; the exact-d² side is bounded
    by the {_ST_NQ}-query sample (the standard eval protocol); every
    window partitions by (variant, query) — never global.
    """
    from ..operators.similarity import (
        centroids_by,
        exact_l2_pairs,
        top_centroids_tagged,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") < _ST_NQ
    corpus = emb.where(~is_q)
    queries = emb.where(is_q)
    d2 = exact_l2_pairs(emb, _ST_NQ).localCheckpoint(eager=False)

    def topk(pairs: DataFrame, *part) -> DataFrame:
        rn = F.row_number().over(
            W.partitionBy(*part).orderBy("d", "neighbor_id")
        )
        return pairs.withColumn("rn", rn).where(F.col("rn") <= _ST_TOPK)

    truth = topk(d2, "query_id").select("query_id", "neighbor_id")

    # ONE corpus list pass + ONE query probe pass for BOTH quantizer
    # variants (r12, guide §2.4): the stale and fresh centroid frames
    # are tagged and unioned into one broadcast, and
    # top_centroids_tagged assigns under both in a single
    # posexplode/aggregation/window — equivalent to the per-variant
    # top_centroids loop it replaces (see the operator docstring),
    # halving the corpus-sized scans. The candidate join keys on
    # (variant, c_label) so each variant's probes only meet its own
    # lists, exactly as the old per-variant joins did.
    variants = [
        ("stale", centroids_by(emb.where(F.col("vec_id") % 10 != 7), "label")
         .localCheckpoint(eager=False)),
        ("fresh", centroids_by(emb, "label").localCheckpoint(eager=False)),
    ]
    lists = top_centroids_tagged(corpus, variants, n=1).select(
        "variant", F.col("id").alias("neighbor_id"), "c_label"
    )
    probes = top_centroids_tagged(queries, variants, n=_ST_NPROBE).select(
        "variant", F.col("id").alias("query_id"), "c_label"
    )
    cand = probes.join(lists, ["variant", "c_label"]).select(
        "variant", "query_id", "neighbor_id"
    )

    w = W.partitionBy("variant", "query_id")
    ranked = (
        cand.join(d2, ["query_id", "neighbor_id"])
        .withColumn("n_cand", F.count("*").over(w))
        .withColumn(
            "n_batch_cand",
            F.sum(
                F.when(F.col("neighbor_id") % 10 == 7, 1).otherwise(0)
            ).over(w),
        )
    )
    hit = truth.withColumn("hit", F.lit(1))
    return (
        topk(ranked, "variant", "query_id")
        .join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("variant", "query_id")
        .agg(
            F.max("n_cand").cast("long").alias("n_cand"),
            F.max("n_batch_cand").cast("long").alias("n_batch_cand"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) * 1.0 / _ST_TOPK, 2
            ).alias(f"recall_at_{_ST_TOPK}"),
        )
        .orderBy("variant", "query_id")
    )


# ===========================================================================
# Round-9 addition: the persisted-quantizer LIFECYCLE, measured
# end-to-end. e_ivf_incremental_assign assigns one batch against a
# stale quantizer and e_ivf_staleness_recall prices skipping the refit
# — but both probe state BUILT IN-QUERY for a single day; the round-8
# verdict (item 5a) called out the maintenance TRANSITION (build
# quantizer day 1, assign + fold-in day 2, serve day 3 from the UPDATED
# quantizer) as asserted, not measured. This gate replays the two-day
# loop and pins, hash-exactly, that day-3 assignments differ between
# the stale and the updated quantizer exactly where the day-2 fold-in
# moved a centroid — i.e. the update is live in the serving path.
# ===========================================================================

_QLC_ORACLE = """
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cstats AS (
      SELECT label AS c_label, pos, sum(val) AS csum, count(*) AS cnt
      FROM pos WHERE vec_id % 10 NOT IN (7, 8)
      GROUP BY 1, 2
    ),
    cents1 AS (SELECT c_label, pos, csum / cnt AS cval FROM cstats),
    a2 AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents1 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 7
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    bstats AS (
      SELECT a.c_label, p.pos, sum(p.val) AS bsum, count(*) AS bcnt
      FROM pos p JOIN a2 a ON a.id = p.vec_id
      GROUP BY 1, 2
    ),
    cents2 AS (
      SELECT c.c_label, c.pos,
             (c.csum + coalesce(b.bsum, 0))
               / (c.cnt + coalesce(b.bcnt, 0)) AS cval
      FROM cstats c LEFT JOIN bstats b
        ON b.c_label = c.c_label AND b.pos = c.pos
    ),
    a3s AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents1 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 8
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    a3f AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents2 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 8
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    adds AS (SELECT c_label, count(*) AS n FROM a2 GROUP BY 1)
    SELECT s.id AS vec_id,
           s.c_label AS list_stale,
           f.c_label AS list_updated,
           CAST(CASE WHEN s.c_label <> f.c_label THEN 1 ELSE 0 END AS BIGINT)
             AS moved,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_day2_in_list
    FROM a3s s
    JOIN a3f f ON f.id = s.id
    LEFT JOIN adds a ON a.c_label = f.c_label
    ORDER BY s.id
"""


@query("e_ivf_quantizer_lifecycle", oracle=_QLC_ORACLE)
def e_ivf_quantizer_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-day replay of the MAINTAINED coarse quantizer: day 1's
    quantizer is the per-label centroid sufficient statistics of the
    corpus (vec_id % 10 not in (7, 8)); day 2's batch (% 10 = 7) is
    assigned against it and FOLDED IN (mini-batch k-means append:
    new mean = (corpus sums + batch sums) / (corpus count + batch
    count), operators/similarity.py:centroid_running_update); day 3's
    batch (% 10 = 8) is assigned against BOTH the stale day-1 quantizer
    and the updated one. Output per day-3 vector: both assignments, a
    ``moved`` flag (1 where the day-2 fold-in changed the serving
    decision), and the day-2 member count of its updated list (the
    integer evidence that the fold-in is live in the path that served
    the assignment).

    Measured gap this closes (round-8 verdict item 5a): the quantizer
    maintenance TRANSITION. e_ivf_incremental_assign pins one stale
    assign; e_ivf_staleness_recall prices the refit dial; neither
    executes update-then-serve. A zero ``moved`` column would make the
    update unobservable — tests/test_round8.py pins moved > 0 at
    sf0.001 (and the full replays pin it at sf0.01/sf0.1 through the
    hash).

    Scale shape: the quantizer is a k×dim-row artifact (sufficient
    statistics, operators/similarity.py:centroid_pos_stats) that
    broadcasts everywhere; the update is one posexplode + groupBy over
    the BATCH only (O(batch·dim), corpus-free); the three assignment
    passes are broadcast-join + per-id windows over bounded frames —
    the exact serving plan (top_centroids) the other IVF gates use, so
    the lifecycle pins the real path, not a replica.
    """
    from ..operators.similarity import (
        centroid_pos_stats,
        centroid_running_update,
        nearest_centroid_multi,
        top_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    mod = F.col("vec_id") % 10
    corpus, b2, b3 = (
        emb.filter(~mod.isin(7, 8)),
        emb.filter(mod == 7),
        emb.filter(mod == 8),
    )

    # persisted-artifact stand-ins checkpointed lazily (the churn
    # gate's discipline, r12): cstats feeds cents1 AND cents2, a2 feeds
    # cents2 AND the adds census — without truncation each consumer
    # re-derives the corpus posexplode + groupBy.
    cstats = centroid_pos_stats(corpus).localCheckpoint(eager=False)
    cents1 = cstats.select(
        "c_label", "pos", (F.col("csum") / F.col("cnt")).alias("cval")
    )
    a2 = (
        top_centroids(b2, cents1, n=1)
        .select("id", "c_label")
        .localCheckpoint(eager=False)
    )
    cents2 = centroid_running_update(cstats, b2, a2)

    # ONE day-3 probe pass for both quantizer variants (r12, guide
    # §2.4): stale day-1 and post-fold-in centroids tagged + unioned
    # into one broadcast; equivalent to two top_centroids(n=1) passes
    # joined on id (operators/similarity.nearest_centroid_multi).
    both = nearest_centroid_multi(
        b3, [("list_stale", cents1), ("list_updated", cents2)]
    )
    adds = a2.groupBy("c_label").agg(F.count("*").alias("n"))
    return (
        both.join(adds, both["list_updated"] == adds["c_label"], "left")
        .select(
            F.col("id").alias("vec_id"),
            "list_stale",
            "list_updated",
            F.when(F.col("list_stale") != F.col("list_updated"), 1)
            .otherwise(0)
            .cast("long")
            .alias("moved"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_day2_in_list"),
        )
        .orderBy("vec_id")
    )

# ===========================================================================
# Round-10 addition: the DELETE side of the maintained quantizer.
# e_ivf_quantizer_lifecycle proved the append transition (fold a day's
# batch into the persisted sufficient statistics, serve from the
# updated centroids); real index maintenance also SHRINKS — takedowns,
# license expiry, poisoned-crawl rollbacks — and a quantizer whose
# statistics keep counting retracted vectors drifts toward content the
# corpus no longer contains. The round-9 verdict (item 3) named this
# the remaining lifecycle asymmetry: operators/similarity.py had
# fold-in only; nothing subtracted.
# ===========================================================================

_QRT_ORACLE = """
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cstats AS (
      SELECT label AS c_label, pos, sum(val) AS csum, count(*) AS cnt
      FROM pos WHERE vec_id % 10 NOT IN (7, 8)
      GROUP BY 1, 2
    ),
    cents1 AS (SELECT c_label, pos, csum / cnt AS cval FROM cstats),
    a2 AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents1 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 7
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    bstats AS (
      SELECT a.c_label, p.pos, sum(p.val) AS bsum, count(*) AS bcnt
      FROM pos p JOIN a2 a ON a.id = p.vec_id
      GROUP BY 1, 2
    ),
    cents2 AS (
      SELECT c.c_label, c.pos,
             (c.csum + coalesce(b.bsum, 0))
               / (c.cnt + coalesce(b.bcnt, 0)) AS cval
      FROM cstats c LEFT JOIN bstats b
        ON b.c_label = c.c_label AND b.pos = c.pos
    ),
    ra AS (SELECT id, c_label FROM a2 WHERE id % 20 = 7),
    rstats AS (
      SELECT a.c_label, p.pos, sum(p.val) AS rsum, count(*) AS rcnt
      FROM pos p JOIN ra a ON a.id = p.vec_id
      GROUP BY 1, 2
    ),
    cents3 AS (
      SELECT c_label, pos, csum3 / cnt3 AS cval FROM (
        SELECT c.c_label, c.pos,
               (c.csum + coalesce(b.bsum, 0)) - coalesce(r.rsum, 0) AS csum3,
               (c.cnt + coalesce(b.bcnt, 0)) - coalesce(r.rcnt, 0) AS cnt3
        FROM cstats c
        LEFT JOIN bstats b ON b.c_label = c.c_label AND b.pos = c.pos
        LEFT JOIN rstats r ON r.c_label = c.c_label AND r.pos = c.pos
      ) WHERE cnt3 > 0
    ),
    a3f AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents2 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 8
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    a3p AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents3 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 8
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    rems AS (SELECT c_label, count(*) AS n FROM ra GROUP BY 1)
    SELECT f.id AS vec_id,
           f.c_label AS list_full,
           p.c_label AS list_post,
           CAST(CASE WHEN f.c_label <> p.c_label THEN 1 ELSE 0 END AS BIGINT)
             AS moved,
           CAST(coalesce(rm.n, 0) AS BIGINT) AS n_retracted_from_full
    FROM a3f f
    JOIN a3p p ON p.id = f.id
    LEFT JOIN rems rm ON rm.c_label = f.c_label
    ORDER BY f.id
"""


@query("e_ivf_quantizer_retraction", oracle=_QRT_ORACLE)
def e_ivf_quantizer_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction (takedown) maintenance of the persisted quantizer —
    the DELETE mirror of e_ivf_quantizer_lifecycle: day 2's batch
    (vec_id % 10 = 7) is assigned against the day-1 quantizer and
    FOLDED IN (centroid_stats_update); a takedown then RETRACTS half
    of it (vec_id % 20 = 7 — a contaminated source inside the crawl)
    by SUBTRACTING its sufficient statistics
    (operators/similarity.py:centroid_stats_retract) — counts subtract
    exactly, sums subtract the same per-(label, pos) partials the
    slice folded in, and the retracted rows' assignments are READ BACK
    from the day-2 assignment output, never recomputed, so the
    subtraction targets exactly what the addition touched. Day 3's
    batch (% 10 = 8) is assigned against BOTH the post-fold-in and the
    post-retraction centroids. Output per day-3 vector: both
    assignments, a ``moved`` flag (1 where honoring the takedown
    changed the serving decision — 9 at sf0.001 / 6 at sf0.01, pinned
    non-vacuous by tests/test_round10.py), and the retracted-member
    count of its pre-retraction list (the integer evidence of what the
    takedown removed from the path that was serving it).

    Measured gap this closes (round-9 verdict item 3): every quantizer
    gate grows state monotonically — the LSH band table has append AND
    delete maintenance, the quantizer had fold-in only
    (centroid_stats_update adds; nothing subtracted).

    Scale shape: identical to the append side — the quantizer is a
    k×dim-row broadcast artifact; the retraction is one posexplode +
    (c_label, pos) groupBy over the RETRACTED SLICE (O(slice·dim),
    corpus-free); both day-3 assignment passes are the real serving
    plan (top_centroids: broadcast centroid join + bounded per-id
    windows). An emptied list (cnt hits 0) drops out of the quantizer
    exactly as a fresh rebuild would drop it (pinned by the unit test;
    not reachable on this corpus at gate SFs).
    """
    from ..operators.similarity import (
        centroid_pos_stats,
        centroid_stats_retract,
        centroid_stats_update,
        nearest_centroid_multi,
        top_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    mod = F.col("vec_id") % 10
    corpus, b2, b3 = (
        emb.filter(~mod.isin(7, 8)),
        emb.filter(mod == 7),
        emb.filter(mod == 8),
    )

    # stats and assignment frames are the artifacts production PERSISTS
    # between daily jobs (k×dim rows / batch-sized); lazy localCheckpoint
    # is the in-plan stand-in — the churn gate's discipline (r12, guide
    # §2.4/§5): without it the lazy chain re-derives the corpus
    # posexplode + groupBy once per consumer (cstats feeds cents1, s2
    # AND s3; a2 feeds s2, ra and rems).
    cstats = centroid_pos_stats(corpus).localCheckpoint(eager=False)
    cents1 = cstats.select(
        "c_label", "pos", (F.col("csum") / F.col("cnt")).alias("cval")
    )
    a2 = (
        top_centroids(b2, cents1, n=1)
        .select("id", "c_label")
        .localCheckpoint(eager=False)
    )
    s2 = centroid_stats_update(cstats, b2, a2).localCheckpoint(eager=False)
    cents2 = s2.select(
        "c_label", "pos", (F.col("csum") / F.col("cnt")).alias("cval")
    )

    retracted = b2.filter(F.col("vec_id") % 20 == 7)
    # the assignment the slice carried into the stats, read back — the
    # production path reads the assignment table, so drift between
    # addition and subtraction is impossible by construction
    ra = a2.join(
        retracted.select(F.col("vec_id").alias("id")), "id"
    ).select("id", "c_label")
    s3 = centroid_stats_retract(s2, retracted, ra)
    cents3 = s3.select(
        "c_label", "pos", (F.col("csum") / F.col("cnt")).alias("cval")
    )

    # ONE day-3 probe pass for both quantizer variants (r12, guide
    # §2.4): post-fold-in and post-retraction centroids are tagged and
    # unioned into one broadcast; equivalent to two top_centroids(n=1)
    # passes joined on id (operators/similarity.nearest_centroid_multi).
    both = nearest_centroid_multi(
        b3, [("list_full", cents2), ("list_post", cents3)]
    )
    rems = ra.groupBy("c_label").agg(F.count("*").alias("n"))
    return (
        both.join(rems, both["list_full"] == rems["c_label"], "left")
        .select(
            F.col("id").alias("vec_id"),
            "list_full",
            "list_post",
            F.when(F.col("list_full") != F.col("list_post"), 1)
            .otherwise(0)
            .cast("long")
            .alias("moved"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_retracted_from_full"),
        )
        .orderBy("vec_id")
    )


# ===========================================================================
# ROUND 11 — multi-epoch churn on the maintained quantizer
# Every lifecycle/retraction gate so far is a TWO-day replay: one
# append (e_ivf_quantizer_lifecycle) or one append + one takedown
# (e_ivf_quantizer_retraction). Production maintenance is N interleaved
# epochs on the SAME persisted state — and the quantizer is the one
# family where that matters numerically: its sufficient statistics are
# float sums that accumulate re-association error across every
# subtract/add cycle (the r10 verdict named this the last untested
# dimension of the "MAINTAINED artifact" claim, item 3).
# ===========================================================================

_QCH_ORACLE = """
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cstats AS (
      SELECT label AS c_label, pos, sum(val) AS csum, count(*) AS cnt
      FROM pos WHERE vec_id % 10 NOT IN (6, 7, 9)
      GROUP BY 1, 2
    ),
    cents0 AS (SELECT c_label, pos, csum / cnt AS cval FROM cstats),
    aA AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents0 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 6
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    sA AS (
      SELECT a.c_label, p.pos, sum(p.val) AS bsum, count(*) AS bcnt
      FROM pos p JOIN aA a ON a.id = p.vec_id
      GROUP BY 1, 2
    ),
    s1 AS (
      SELECT c.c_label, c.pos,
             c.csum + coalesce(b.bsum, 0) AS csum,
             c.cnt + coalesce(b.bcnt, 0) AS cnt
      FROM cstats c LEFT JOIN sA b
        ON b.c_label = c.c_label AND b.pos = c.pos
    ),
    cents1 AS (SELECT c_label, pos, csum / cnt AS cval FROM s1 WHERE cnt > 0),
    ra1 AS (SELECT id, c_label FROM aA WHERE id % 20 = 6),
    r1 AS (
      SELECT a.c_label, p.pos, sum(p.val) AS rsum, count(*) AS rcnt
      FROM pos p JOIN ra1 a ON a.id = p.vec_id
      GROUP BY 1, 2
    ),
    s2 AS (
      SELECT c.c_label, c.pos,
             c.csum - coalesce(r.rsum, 0) AS csum,
             c.cnt - coalesce(r.rcnt, 0) AS cnt
      FROM s1 c LEFT JOIN r1 r
        ON r.c_label = c.c_label AND r.pos = c.pos
    ),
    cents2 AS (SELECT c_label, pos, csum / cnt AS cval FROM s2 WHERE cnt > 0),
    aB AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents2 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 7
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    sB AS (
      SELECT a.c_label, p.pos, sum(p.val) AS bsum, count(*) AS bcnt
      FROM pos p JOIN aB a ON a.id = p.vec_id
      GROUP BY 1, 2
    ),
    s3 AS (
      SELECT c.c_label, c.pos,
             c.csum + coalesce(b.bsum, 0) AS csum,
             c.cnt + coalesce(b.bcnt, 0) AS cnt
      FROM s2 c LEFT JOIN sB b
        ON b.c_label = c.c_label AND b.pos = c.pos
    ),
    cents3 AS (SELECT c_label, pos, csum / cnt AS cval FROM s3 WHERE cnt > 0),
    ra2 AS (SELECT id, c_label FROM aA WHERE id % 20 = 16),
    r2 AS (
      SELECT a.c_label, p.pos, sum(p.val) AS rsum, count(*) AS rcnt
      FROM pos p JOIN ra2 a ON a.id = p.vec_id
      GROUP BY 1, 2
    ),
    s4 AS (
      SELECT c.c_label, c.pos,
             c.csum - coalesce(r.rsum, 0) AS csum,
             c.cnt - coalesce(r.rcnt, 0) AS cnt
      FROM s3 c LEFT JOIN r2 r
        ON r.c_label = c.c_label AND r.pos = c.pos
    ),
    cents4 AS (SELECT c_label, pos, csum / cnt AS cval FROM s4 WHERE cnt > 0),
    p1 AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents1 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 9
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    p2 AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents2 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 9
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    p3 AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents3 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 9
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    ),
    p4 AS (
      SELECT vec_id AS id, c_label FROM (
        SELECT p.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY sum(p.val * c.cval)
                          / (sqrt(sum(p.val * p.val))
                             * sqrt(sum(c.cval * c.cval))) DESC, c.c_label
               ) AS rn
        FROM pos p JOIN cents4 c ON p.pos = c.pos
        WHERE p.vec_id % 10 = 9
        GROUP BY p.vec_id, c.c_label
      ) WHERE rn = 1
    )
    SELECT p1.id AS vec_id,
           p1.c_label AS list_e1, p2.c_label AS list_e2,
           p3.c_label AS list_e3, p4.c_label AS list_e4,
           CAST((CASE WHEN p1.c_label <> p2.c_label THEN 1 ELSE 0 END)
              + (CASE WHEN p2.c_label <> p3.c_label THEN 1 ELSE 0 END)
              + (CASE WHEN p3.c_label <> p4.c_label THEN 1 ELSE 0 END)
              AS BIGINT) AS n_flips
    FROM p1 JOIN p2 ON p2.id = p1.id
    JOIN p3 ON p3.id = p1.id
    JOIN p4 ON p4.id = p1.id
    ORDER BY p1.id
"""


def _churn_cents(stats: DataFrame) -> DataFrame:
    return stats.select(
        "c_label", "pos", (F.col("csum") / F.col("cnt")).alias("cval")
    )


def churn_epoch_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The four-epoch churn construction, shared by the
    e_ivf_quantizer_churn gate and its algebra invariant test
    (tests/test_round11.py) so the recipe the test pins is BY
    CONSTRUCTION the recipe the gate runs. Returns every frame a
    caller might probe: per-epoch stats s0..s4, the read-back
    assignment tables a_a/a_b, and the input slices.

    Each epoch's stats frame is the artifact production PERSISTS
    between daily jobs (k×dim rows, trivially small); localCheckpoint
    is the in-plan stand-in — without it the lazy chain re-derives
    every earlier epoch once per later epoch AND once per probe pass
    (measured 46.6 s → ~7 s at sf0.001). The epoch-1 assignment table
    is checkpointed too: it is read back by BOTH retractions."""
    from ..operators.similarity import (
        centroid_pos_stats,
        centroid_stats_retract,
        centroid_stats_update,
        top_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    mod = F.col("vec_id") % 10
    corpus = emb.filter(~mod.isin(6, 7, 9))
    batch_a = emb.filter(mod == 6)
    batch_b = emb.filter(mod == 7)
    probe = emb.filter(mod == 9)

    s0 = centroid_pos_stats(corpus).localCheckpoint(eager=False)
    a_a = (
        top_centroids(batch_a, _churn_cents(s0), n=1)
        .select("id", "c_label")
        .localCheckpoint(eager=False)
    )
    s1 = centroid_stats_update(s0, batch_a, a_a).localCheckpoint(eager=False)

    a_half1 = batch_a.filter(F.col("vec_id") % 20 == 6)
    ra1 = a_a.join(
        a_half1.select(F.col("vec_id").alias("id")), "id"
    ).select("id", "c_label")
    s2 = centroid_stats_retract(s1, a_half1, ra1).localCheckpoint(eager=False)

    a_b = (
        top_centroids(batch_b, _churn_cents(s2), n=1)
        .select("id", "c_label")
        .localCheckpoint(eager=False)
    )
    s3 = centroid_stats_update(s2, batch_b, a_b).localCheckpoint(eager=False)

    a_half2 = batch_a.filter(F.col("vec_id") % 20 == 16)
    ra2 = a_a.join(
        a_half2.select(F.col("vec_id").alias("id")), "id"
    ).select("id", "c_label")
    s4 = centroid_stats_retract(s3, a_half2, ra2).localCheckpoint(eager=False)
    return {
        "s0": s0, "s1": s1, "s2": s2, "s3": s3, "s4": s4,
        "a_a": a_a, "a_b": a_b,
        "batch_a": batch_a, "batch_b": batch_b, "probe": probe,
    }


@query("e_ivf_quantizer_churn", oracle=_QCH_ORACLE)
def e_ivf_quantizer_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch CHURN on the persisted quantizer — four interleaved
    maintenance epochs chained through the sufficient-statistics
    algebra (operators/similarity.py:centroid_stats_update /
    centroid_stats_retract), with the serving decision re-probed after
    EVERY epoch:

      e1  fold in batch A  (vec_id % 10 = 6, assigned vs the day-0
          quantizer)
      e2  retract half of A (% 20 = 6; read-back assignments)
      e3  fold in batch B  (% 10 = 7, assigned vs the POST-CHURN e2
          centroids — later appends see earlier takedowns)
      e4  retract the OTHER half of A (% 20 = 16) — a takedown of rows
          folded in THREE epochs earlier, subtracted under the e1
          assignments read back from the assignment table even though
          the centroids have drifted twice since (the read-back
          contract is exactly what makes cross-epoch retraction exact:
          recomputing the slice's assignments against drifted centroids
          would subtract partials that were never added)

    A fixed probe slice (% 10 = 9) is assigned against the centroids
    after each epoch; output per probe vector: the four per-epoch
    serving lists and ``n_flips`` (adjacent-epoch changes). Every
    transition is observable at gate SFs (measured: flips e1→e2/e2→e3/
    e3→e4 = 10/12/13 at sf0.001, 9/13/6 at sf0.01; pinned non-vacuous
    per-transition by tests/test_round11.py).

    Measured gap this closes (round-10 verdict item 3): every
    lifecycle/retraction gate was a two-day replay with a single append
    and a single takedown; nothing exercised N interleaved epochs on
    the same state, and nothing pinned the float drift a csum
    accumulates over subtract/add cycles. The companion invariant test
    pins chained-4-epochs == one-shot fold-in of the surviving batch
    (A fully retracted ⇒ net state = corpus + B): counts EXACTLY,
    csum within 1e-9 relative — and that tolerance IS the
    re-derivation policy: each epoch adds O(ulp · Σ|slice|) absolute
    error, so after ~1e6 epochs (far beyond any daily cadence between
    quarterly rebuilds) drift could reach ~1e-3 relative and the
    operator's contract says re-derive the stats from live docs
    (centroid_pos_stats over the surviving corpus) rather than keep
    chaining.

    Scale shape: the quantizer stays a k×dim-row broadcast artifact
    through all four epochs; each epoch's cost is one posexplode +
    (c_label, pos) groupBy over THAT epoch's slice (O(slice·dim),
    corpus-free), and each probe pass is the real serving plan
    (top_centroids: broadcast centroid join + bounded per-id windows).
    At 100 TB the four epochs are four daily jobs over a persisted
    stats table; this gate chains them lazily in one plan only so the
    oracle can replay the whole history.

    Reference parity: the reference has no vector maintenance at all
    (`etl/load.py:283` upserts rows); this is north-star surface for
    the LLM-data pipeline mandate.
    """
    from ..operators.similarity import nearest_centroid_multi

    fr = churn_epoch_frames(spark, sf_dir)
    # ONE probe pass for all four epochs (r12, guide §2.4 — the same
    # shared-superset discipline as the band/nprobe sweeps): the four
    # per-epoch centroid frames are tagged and unioned into one
    # broadcast artifact (4·k×dim rows), the probe slice is exploded,
    # joined, aggregated and arg-maxed ONCE, and the per-epoch serving
    # lists pivot back as columns. Exactly equivalent to four
    # top_centroids(n=1) passes joined on id — see
    # operators/similarity.nearest_centroid_multi for the argument —
    # and replaces 4 probe-slice scans + 4 aggregations + 4 windows +
    # 3 id-joins with one of each.
    out = nearest_centroid_multi(
        fr["probe"],
        [
            (f"list_e{i}", _churn_cents(s))
            for i, s in enumerate((fr["s1"], fr["s2"], fr["s3"], fr["s4"]), start=1)
        ],
    )
    flips = sum(
        F.when(F.col(f"list_e{i}") != F.col(f"list_e{i + 1}"), 1).otherwise(0)
        for i in (1, 2, 3)
    )
    return out.select(
        F.col("id").alias("vec_id"),
        "list_e1",
        "list_e2",
        "list_e3",
        "list_e4",
        flips.cast("long").alias("n_flips"),
    ).orderBy("vec_id")
