"""Round-8 continuation operators: depth items closing measured gaps
only (round-7 verdict item 6 — no breadth registrations).

- e_recall_cost_frontier — the COST axis of the compression-ladder
  capstone. Closes the measured gap that e_compression_recall_matrix
  measures each tier's recall@10 while the tiers' serving costs are
  asserted in docstrings ("4×", "16×", "64×", "probed lists only"),
  never measured on the same query set: this report joins the SAME
  per-(method, query) hits against measured candidate counts and code
  bytes, so the recall/cost frontier an operator actually navigates
  (scan_bytes vs recall) is one table instead of a docstring claim.
  The IVF-PQ row is the point of the exercise — its candidate count is
  data-dependent (probed-list sizes), and at sf0.01 the measurement
  shows the pruning that the unpruned tiers pay for in full scans.
- e_ivf_incremental_assign — the ANN tier of the daily-ingest
  workflow. Closes the measured gap that the incremental family covers
  every DEDUP tier (d_incremental_dedup exact hashes,
  d_incremental_lsh_dedup minhash bands, d_embedding_neardup_
  incremental hyperplane bands) while every ANN index entry
  (e_ivf_assign, e_ivf_balanced_assign, e_kmeans_fit) refits its
  quantizer from the full corpus each run: here today's batch
  (vec_id % 10 = 7, the family's shared batch convention) is assigned
  against the PERSISTED coarse quantizer — centroids fitted on the
  corpus EXCLUDING the batch — and the report is the refit dial
  (per-list adds, growth, assigned-similarity drift).
- e_ivf_staleness_recall — the RECALL side of that refit dial.
  e_ivf_incremental_assign's drift report asserts that shift surfaces
  "before recall degrades"; this measures the degradation directly:
  the same probe protocol (nprobe=2, exact-d² rerank, recall@10 vs
  the shared truth frame — e_ivf_balanced_recall's shape) run against
  both quantizers — STALE (fitted excluding the batch, the index a
  no-refit service keeps serving) and FRESH (refit on everything) —
  with per-query candidate counts and the batch share of candidates
  (whether stale probes still REACH the incrementally-added vectors
  is the actual failure mode of skipping refits).

Both queries reuse the production machinery they evaluate
(plans/round7j_ext._matrix_parts, operators/similarity.centroids_by /
top_centroids) — a private reimplementation here would let the report
and the serving path drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query
from .round7c_ext import _PQ_SUBDIM
from .round7j_ext import _CM_NQ, _CM_ORACLE, _CM_TOPK, _matrix_parts

# ---------------------------------------------------------------------------
# e_recall_cost_frontier
# ---------------------------------------------------------------------------
# The oracle reuses the recall matrix's CTE chain verbatim (truth, the
# four per-tier top-k frames, all_tops, ivf_cand) and swaps the final
# SELECT for the cost join — byte-identical shared CTEs guarantee the
# two reports can never disagree on the hits they score.
_CM_PREFIX = _CM_ORACLE[: _CM_ORACLE.rindex("SELECT m.method")].rstrip()
assert _CM_PREFIX.endswith(")"), "recall-matrix oracle shape changed"

# Code bytes per vector, per representation (byte-aligned storage, the
# standard layout): int8 SQ = dim bytes; fitted PQ = one byte per
# subspace code (dim / _PQ_SUBDIM subspaces; k=8 needs 3 bits but
# byte-aligned is how code tables are stored and scanned); 1-bit sign =
# the packed-long words × 8 bytes; IVF-PQ scans the same PQ code table,
# only fewer rows of it.
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
    plans/round7j_ext._matrix_parts — the hits frames are the same
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


# ---------------------------------------------------------------------------
# e_ivf_incremental_assign
# ---------------------------------------------------------------------------
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


# ---------------------------------------------------------------------------
# e_ivf_staleness_recall
# ---------------------------------------------------------------------------
_ST_NQ = 5      # queries: vec_id < 5 (the shared sample convention)
_ST_TOPK = 10
_ST_NPROBE = 2

# The oracle reuses the proven blocks: the cosine top-n walk (e_ivf_*
# family), the rounded exact-L2 truth (operators/similarity.
# exact_l2_pairs' formulation), and e_ivf_balanced_recall's two-variant
# candidate/rank/recall skeleton — with the variants being the two
# quantizers instead of the two assignments.
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
        top_centroids,
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

    variants = (
        ("stale", centroids_by(emb.where(F.col("vec_id") % 10 != 7), "label")),
        ("fresh", centroids_by(emb, "label")),
    )
    cand = None
    for name, cents in variants:
        cents = cents.localCheckpoint(eager=False)
        lists = top_centroids(corpus, cents, n=1).select(
            F.col("id").alias("neighbor_id"), "c_label"
        )
        probes = top_centroids(queries, cents, n=_ST_NPROBE).select(
            F.col("id").alias("query_id"), "c_label"
        )
        v = probes.join(lists, "c_label").select(
            F.lit(name).alias("variant"), "query_id", "neighbor_id"
        )
        cand = v if cand is None else cand.unionAll(v)

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
