"""Round-6 continuation registrations: segment-level corpus dedup,
boilerplate-prefix detection, cross-source quality-score quantile
normalization, and sequence-length bucketing.

Four more first-class training-data-pipeline operators (north-star
extensions per the build brief — the reference repo's only dedup is
keep-last row dedup, /root/reference/etl/transform.py, and it has no
corpus analytics at all):

- ``d_segment_dedup_report`` / ``d_segment_dedup_apply``: C4-style
  segment-granularity dedup (Raffel et al. 2020 removed repeated
  three-sentence spans corpus-wide, keep-first). The corpus here has no
  sentence boundaries, so the segmenter is fixed non-overlapping
  8-token windows — the operator shape (segment -> corpus-wide
  keep-first -> reassemble) is identical.
- ``t_boilerplate_prefix_report``: per-source most-common leading
  prefix + its share — the diagnostic behind crawl boilerplate
  stripping (RefinedWeb/trafilatura remove per-site header/footer
  lines; the detector is exactly "which prefix dominates this
  source").
- ``t_quality_quantile_normalize``: cross-source score calibration —
  map each document's within-source rank onto the POOLED score
  distribution (quantile normalization). Quality classifiers drift
  across domains; rank-based remapping makes a single global
  threshold meaningful (used before any corpus-wide
  quality-percentile cut).
- ``b_length_bucketing``: padding-waste report over power-of-two
  length buckets — the standard pre-packing diagnostic (pad-to-bucket
  wastes `bucket - len` tokens per doc; compare against
  ``d_pack_sequences``' first-fit packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators.dedup import segment_occurrences
from ..sources.tables import load_table
from .catalog import query

_SEG_N = 8

# Shared oracle CTE prefix: fixed non-overlapping 8-token segments with
# keep-first row numbers. DuckDB list slicing (1-based, end-inclusive,
# clamped) mirrors F.slice exactly; row_number over (doc_id, chunk) is
# the min(struct(id, chunk)) the Spark operator computes.
_SEG_CTES = f"""
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    occ AS (
      SELECT doc_id, source, c AS chunk,
             array_to_string(w[(c * {_SEG_N} + 1):(c * {_SEG_N} + {_SEG_N})], ' ') AS segment
      FROM words,
           UNNEST(range(0, CAST(ceil(len(w) / {_SEG_N}.0) AS BIGINT))) AS t(c)
    ),
    k AS (
      SELECT doc_id, source, chunk, segment,
             row_number() OVER (PARTITION BY segment ORDER BY doc_id, chunk) AS rn
      FROM occ
    )"""


@query(
    "d_segment_dedup_report",
    oracle=_SEG_CTES
    + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped,
           round(count(*) FILTER (WHERE rn > 1) * 1.0 / count(*), 4) AS dup_rate
    FROM k GROUP BY source ORDER BY source
    """,
)
def d_segment_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level dedup, REPORT half: per-source segment-occurrence
    counts and the share that are corpus-wide repeats (would be dropped
    by keep-first). The per-source view localizes WHERE duplication
    concentrates — the first question before spending a full dedup pass
    (operators/dedup.py::segment_occurrences)."""
    docs = load_table(spark, sf_dir, "documents")
    occ = segment_occurrences(docs, n=_SEG_N, extra_cols=("source",))
    dropped = (~F.col("kept")).cast("long")
    return (
        occ.groupBy("source")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.sum(dropped).alias("n_dropped"),
            F.round(F.sum(dropped) * 1.0 / F.count("*"), 4).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "d_segment_dedup_apply",
    oracle=_SEG_CTES
    + """
    SELECT doc_id,
           coalesce(string_agg(segment, ' ' ORDER BY chunk)
                    FILTER (WHERE rn = 1), '') AS text_clean,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_segments_dropped
    FROM k GROUP BY doc_id ORDER BY doc_id
    """,
)
def d_segment_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level dedup, APPLY half: rebuild each document from only
    its KEPT segments (first corpus-wide occurrence in (doc_id, chunk)
    order). Because segments partition the text, no word is ever cut
    twice — the complement of span-dedup's overlapping-run semantics.
    Reassembly is one per-doc groupBy: collect kept (chunk, segment)
    structs, array_sort, concat — bounded by segments-per-doc, never
    corpus-sized state."""
    docs = load_table(spark, sf_dir, "documents")
    occ = segment_occurrences(docs, n=_SEG_N)
    kept_struct = F.when(F.col("kept"), F.struct("chunk", "segment"))
    return (
        occ.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("text_clean"),
            F.count("*").alias("n_segments"),
            F.sum((~F.col("kept")).cast("long")).alias("n_segments_dropped"),
        )
        .orderBy("doc_id")
    )


@query(
    "t_boilerplate_prefix_report",
    oracle="""
    WITH pref AS (
      SELECT source,
             array_to_string((string_split(text, ' '))[1:3], ' ') AS prefix
      FROM documents
    ),
    cnt AS (SELECT source, prefix, count(*) AS n FROM pref GROUP BY 1, 2),
    ranked AS (
      SELECT source, prefix, n,
             row_number() OVER (PARTITION BY source ORDER BY n DESC, prefix DESC) AS rn,
             sum(n) OVER (PARTITION BY source) AS n_docs
      FROM cnt
    )
    SELECT source, prefix AS top_prefix,
           CAST(n AS BIGINT) AS n_docs_with_prefix,
           round(n * 1.0 / n_docs, 4) AS prefix_share
    FROM ranked WHERE rn = 1 ORDER BY source
    """,
)
def t_boilerplate_prefix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detector: the most common leading 3-token
    prefix and the share of the source's documents that start with it
    (ties break to the lexicographically LARGEST prefix — pinned on
    both engines). A prefix_share near 1.0 marks a site-wide header to
    strip (RefinedWeb-style boilerplate removal); near 1/n_docs means
    no shared prefix.

    Scale shape: groupBy (source, prefix) partial-aggregates map-side;
    the winner is max(struct(n, prefix)) in a SECOND bounded agg — per-
    source state is one struct, so no per-source window ever sorts the
    distinct-prefix frame."""
    docs = load_table(spark, sf_dir, "documents")
    pref = docs.select(
        "source",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 3)).alias("prefix"),
    )
    cnt = pref.groupBy("source", "prefix").agg(F.count("*").alias("n"))
    top = cnt.groupBy("source").agg(
        F.max(F.struct(F.col("n"), F.col("prefix"))).alias("t"),
        F.sum("n").alias("n_docs"),
    )
    return top.select(
        "source",
        F.col("t.prefix").alias("top_prefix"),
        F.col("t.n").alias("n_docs_with_prefix"),
        F.round(F.col("t.n") * 1.0 / F.col("n_docs"), 4).alias("prefix_share"),
    ).orderBy("source")


_QN_PROBS = [i / 10 for i in range(11)]


@query(
    "t_quality_quantile_normalize",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS score FROM documents
    ),
    pooled AS (
      SELECT quantile_cont(score,
               [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) AS qs
      FROM scored
    ),
    per AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n_src
      FROM scored
    ),
    calc AS (
      SELECT doc_id, source, score,
             (rn - 0.5) / n_src AS p,
             least(floor(((rn - 0.5) / n_src) * 10), 9) AS k
      FROM per
    )
    SELECT c.doc_id, c.source, c.score,
           round(c.p, 6) AS src_quantile,
           round(p.qs[CAST(c.k AS INT) + 1]
                 + (c.p * 10 - c.k)
                   * (p.qs[CAST(c.k AS INT) + 2] - p.qs[CAST(c.k AS INT) + 1]),
                 6) AS calibrated
    FROM calc c, pooled p
    ORDER BY c.doc_id
    """,
)
def t_quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quality-score calibration by quantile normalization:
    each document's within-source rank quantile p = (rank - 0.5) / n is
    linearly interpolated into the POOLED score distribution's 11-point
    exact-percentile table. Quality classifiers drift across domains
    (the same "0.7" means different things on src3 vs src9); after
    remapping, one global threshold cuts every source at the same
    distributional depth. Ties in score break by doc_id (rank-based —
    pinned identically on both engines).

    Scale shape: the pooled quantile table is ELEVEN numbers — computed
    once by exact percentile and broadcast (1-row crossJoin); the
    per-source rank is the only data-sized window (per-group, never
    single-partition; a hot source would move to
    operators/cumsum.py::grouped_global_running_sum exactly like
    b_source_token_budget_production). Interpolation is pure column
    arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("score")
    )
    pooled = scored.agg(F.percentile("score", F.lit(_QN_PROBS)).alias("qs"))
    per = scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number()
        .over(W.partitionBy("source").orderBy("score", "doc_id"))
        .alias("rn"),
        F.count("*").over(W.partitionBy("source")).alias("n_src"),
    ).crossJoin(F.broadcast(pooled))
    p = (F.col("rn") - 0.5) / F.col("n_src")
    k = F.least(F.floor(p * 10), F.lit(9).cast("long"))
    qk = F.get("qs", k.cast("int"))
    qk1 = F.get("qs", k.cast("int") + 1)
    return per.select(
        "doc_id",
        "source",
        "score",
        F.round(p, 6).alias("src_quantile"),
        F.round(qk + (p * 10 - k) * (qk1 - qk), 6).alias("calibrated"),
    ).orderBy("doc_id")


_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048]


def _bucket_case_sql() -> str:
    arms = " ".join(
        f"WHEN n_tokens <= {b} THEN {b}" for b in _BUCKETS
    )
    return f"CASE {arms} ELSE 4096 END"


@query(
    "b_length_bucketing",
    oracle=f"""
    WITH lens AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    bucketed AS (
      SELECT n_tokens, CAST({_bucket_case_sql()} AS BIGINT) AS bucket FROM lens
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(bucket - n_tokens) AS BIGINT) AS padding_tokens,
           round(sum(bucket - n_tokens) * 1.0 / (count(*) * bucket), 4) AS waste_pct
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def b_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing report: assign each document to the
    smallest power-of-two token bucket that holds it and measure the
    padding waste of pad-to-bucket batching (the standard pre-packing
    diagnostic — compare waste_pct here against d_pack_sequences'
    first-fit packing utilization to justify the packing pass).
    Buckets are a FIXED boundary CASE chain (identical on both
    engines), not float log2 — exact at the boundaries.

    Scale shape: pure map + bounded agg (one row per bucket); partial
    aggregation makes the shuffle bucket-count-sized."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    bucket = F.lit(4096).cast("long")
    for b in reversed(_BUCKETS):
        bucket = F.when(n_tokens <= b, F.lit(b).cast("long")).otherwise(bucket)
    lens = docs.select(n_tokens.alias("n_tokens"), bucket.alias("bucket"))
    return (
        lens.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(F.col("bucket") - F.col("n_tokens")).alias("padding_tokens"),
            F.round(
                F.sum(F.col("bucket") - F.col("n_tokens"))
                * 1.0
                / (F.count("*") * F.col("bucket")),
                4,
            ).alias("waste_pct"),
        )
        .orderBy("bucket")
    )
