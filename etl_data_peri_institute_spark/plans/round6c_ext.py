"""Round-6 continuation, batch 2: cross-source corpus overlap, the
deterministic epoch-shuffle pair, and an iterative k-means (Lloyd) fit.

Three more first-class training-data-pipeline operators (north-star
extensions per the build brief — the reference repo,
/root/reference/etl/transform.py, has no corpus analytics at all):

- ``d_source_overlap_matrix``: segment-level Jaccard/containment
  between every source pair — the dataset-mixing audit ("how much of
  src7 is already inside src3?") run before weighting sources into a
  training mixture. Reuses the C4-style fixed-window segment primitive
  (operators/dedup.py::segment_occurrences).
- ``b_epoch_shuffle`` / ``b_epoch_shuffle_production``: deterministic
  per-epoch global shuffle order — every epoch must visit each example
  once in a pseudo-random order that is REPRODUCIBLE across reruns
  (never ``rand()``; the order key is ``md5(doc_id ':' epoch)``, the
  same content-hash determinism as b_hash_sample). The pin uses the
  per-epoch window; the production twin is the grouped distributed
  row-number (operators/cumsum.py) — same oracle certifies both.
- ``e_kmeans_fit``: two deterministic Lloyd iterations over the
  embeddings table (init = the 8 smallest vec_ids) — the FIT side of
  the centroid stack (e_ivf_assign / e_nearest_centroid_eval CONSUME
  centroids; this produces them). Per-iteration cost is one broadcast
  join + one groupBy — the canonical iterative-algorithm shape on
  Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators.cumsum import grouped_global_row_number
from ..operators.dedup import segment_explode
from ..sources.tables import load_table
from .catalog import query
from .round6b_ext import _SEG_CTES, _SEG_N


@query(
    "d_source_overlap_matrix",
    oracle=_SEG_CTES
    + """
    , segs AS (SELECT DISTINCT source, segment FROM occ),
    sizes AS (SELECT source, count(*) AS n FROM segs GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_shared
      FROM segs a JOIN segs b
        ON a.segment = b.segment AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           round(s.n_shared * 1.0 / (sa.n + sb.n - s.n_shared), 4) AS jaccard,
           round(s.n_shared * 1.0 / least(sa.n, sb.n), 4) AS containment
    FROM shared s
    JOIN sizes sa ON sa.source = s.source_a
    JOIN sizes sb ON sb.source = s.source_b
    ORDER BY source_a, source_b
    """,
)
def d_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap matrix at segment granularity: for every
    source pair (a < b) sharing at least one distinct 8-token segment,
    the Jaccard and containment of their distinct-segment sets — the
    dataset-mixing audit that answers "is src_b mostly a re-crawl of
    src_a?" before sources are weighted into a training mixture
    (b_temperature_mixture consumes the answer). Pairs with zero
    overlap are omitted (inner-join semantics on both engines).

    Scale shape: ONE data-sized shuffle total. Instead of distinct +
    self-join on segment (two segment-keyed exchanges and a join whose
    hot keys need AQE splitting), each segment's SOURCE SET is built
    directly by a map-side-combined collect_set groupBy — the set is
    capped at #sources (~20), so a segment exploded 10^9 times
    collapses to one <=20-element set per map task. Source pairs are
    then enumerated JVM-side from the sorted set (a higher-order
    nested transform, at most C(20, 2) structs per distinct segment —
    bounded by source-count squared, never by data) and counted into
    a <=190-row frame; per-source sizes re-derive from the same
    grouped exchange (ReusedExchange), and the two size joins
    broadcast a 20-row table.
    """
    docs = load_table(spark, sf_dir, "documents")
    occ = segment_explode(docs, n=_SEG_N, extra_cols=("source",))
    per_seg = occ.groupBy("segment").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    sizes = (
        per_seg.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    k = F.size("ss")
    pair_arr = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + F.lit(2), k),
                lambda y: F.struct(
                    x.alias("source_a"), y.alias("source_b")
                ),
            ),
        )
    )
    shared = (
        per_seg.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
            F.round(
                F.col("n_shared") * 1.0 / F.least("n_a", "n_b"), 4
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


_N_EPOCHS = 2

_EPOCH_SHUFFLE_ORACLE = f"""
    WITH ex AS (
      SELECT doc_id, e AS epoch,
             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(e AS VARCHAR)) AS h
      FROM documents, UNNEST(range(0, {_N_EPOCHS})) AS t(e)
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
           CAST(row_number() OVER (
                  PARTITION BY epoch ORDER BY h, doc_id
                ) AS BIGINT) AS pos
    FROM ex ORDER BY epoch, pos
"""


def _epoch_hash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    epochs = F.array(*[F.lit(e).cast("long") for e in range(_N_EPOCHS)])
    ex = docs.select("doc_id", F.explode(epochs).alias("epoch"))
    h = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("epoch").cast("string"),
        )
    )
    return ex.withColumn("h", h)


@query("b_epoch_shuffle", oracle=_EPOCH_SHUFFLE_ORACLE)
def b_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch shuffle order, WINDOW PIN: every epoch
    visits each document exactly once, in a pseudo-random order that is
    reproducible across reruns and uncorrelated between epochs — the
    order key is md5(doc_id ':' epoch), the same content-hash
    determinism b_hash_sample uses (never rand(): a task retry must not
    change the schedule). This form is the oracle-semantics pin; its
    per-epoch window sends each epoch's full corpus to one task, so
    production runs b_epoch_shuffle_production (same oracle, grouped
    distributed row-number)."""
    ex = _epoch_hash_frame(spark, sf_dir)
    pos = F.row_number().over(W.partitionBy("epoch").orderBy("h", "doc_id"))
    return (
        ex.select("epoch", "doc_id", pos.cast("long").alias("pos"))
        .orderBy("epoch", "pos")
    )


@query("b_epoch_shuffle_production", oracle=_EPOCH_SHUFFLE_ORACLE)
def b_epoch_shuffle_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch shuffle order, PRODUCTION path: the same
    schedule as b_epoch_shuffle via the grouped distributed row-number
    (operators/cumsum.py::grouped_global_row_number) — a group-aware
    range exchange on (epoch, h, doc_id), Arrow local cumsum with a
    group-reset carry, per-(partition, epoch) offsets broadcast back.
    An epoch spans MANY partitions instead of one task sorting the
    whole corpus; the driver-side state is partitions + epochs rows.
    The driver certifies bit-identity by running both twins against the
    one oracle."""
    ex = _epoch_hash_frame(spark, sf_dir)
    out, _totals = grouped_global_row_number(
        ex, ["epoch"], [F.asc("h"), F.asc("doc_id")], out_col="pos"
    )
    return (
        out.select("epoch", "doc_id", F.col("pos").cast("long").alias("pos"))
        .orderBy("epoch", "pos")
    )


_KM_K = 8
_KM_ITERS = 2

# One Lloyd iteration as a SQL CTE pair: assignment (argmin over the
# current centroids, distances rounded to 6 with cid tiebreak — the
# e_nearest_centroid_eval rounding discipline, so both engines rank
# identical numbers) then update (per-(cid, pos) mean rounded to 6).
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
