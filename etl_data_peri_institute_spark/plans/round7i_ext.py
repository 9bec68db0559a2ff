"""Round-7 continuation operators, batch 9: binary quantization.

- e_binary_hamming_topk — 1-bit (sign) quantization + Hamming-distance
  top-k: the most aggressive rung of the compression ladder
  (float e_knn_bruteforce → int8 e_sq_int8_topk → PQ codes
  e_pq_fitted_adc_topk / e_ivf_pq_topk → 1 bit per dimension here).
  Binary embeddings are the current high-recall/64x-compression
  serving trend; Hamming distance is XOR+popcount over packed words,
  which a columnar engine evaluates at memory bandwidth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

_BQ_NQUERIES = 5
_BQ_TOPK = 10


def packed_sign_code():
    """Column expr packing a 64-dim embedding's sign bits into ONE
    BIGINT — a JVM aggregate fold in codegen, no UDF (SQL form because
    shiftleft takes a column shift amount there). Shared with
    e_compression_recall_matrix (plans/round7j_ext.py)."""
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
