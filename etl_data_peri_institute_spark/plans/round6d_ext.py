"""Round-6 continuation, batch 3: content-defined chunking (FastCDC
shape) and the corpus dataset card.

- ``d_cdc_chunking`` / ``d_cdc_dedup_apply``: content-defined chunk
  boundaries (md5 of the w preceding words opens a chunk with p=1/16)
  make chunk-level dedup INSERTION-ROBUST: editing one word re-chunks
  only the edit's neighborhood and every later boundary re-syncs,
  where fixed-width segmentation (d_segment_dedup_*) shifts every
  downstream segment and finds nothing. This is the rsync/FastCDC/
  LBFS idea applied to crawl dedup — the right granularity when
  near-identical pages differ by an injected banner or timestamp.
- ``p_corpus_card``: the one-scan dataset card (doc/source/lang
  counts, token totals and distribution, exact-dup share) — the
  summary sheet a dataset release ships with; every number reduces in
  ONE aggregate pass and unpivots to (metric, value) rows.

The reference repo has no corpus analytics (its only dedup is
keep-last row dedup, /root/reference/etl/transform.py); these are
north-star extensions per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import content_defined_chunks
from ..sources.tables import load_table
from .catalog import query

_CDC_W = 4

# Shared oracle CTE prefix: word explode -> rolling-hash boundary flags
# -> running chunk ids -> reassembled chunks. DuckDB's lag() windows
# replay Spark's identically; `pos > w AND ...` keeps the NULL lags of
# the first w positions out of play on both engines.
_CDC_CTES = f"""
    WITH wt AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ),
    words AS (
      SELECT doc_id, source, i AS pos, ws[i] AS word
      FROM wt, UNNEST(range(1, len(ws) + 1)) AS t(i)
    ),
    flags AS (
      SELECT doc_id, source, pos, word,
             CASE WHEN pos = 1 OR (pos > {_CDC_W} AND substring(md5(
                    lag(word, 4) OVER win || ' ' || lag(word, 3) OVER win
                    || ' ' || lag(word, 2) OVER win || ' '
                    || lag(word, 1) OVER win), 1, 1) = '0')
                  THEN 1 ELSE 0 END AS is_start
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    tagged AS (
      SELECT doc_id, source, pos, word,
             sum(is_start) OVER (
               PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING
             ) AS chunk_id
      FROM flags
    ),
    chunks AS (
      SELECT doc_id, source, chunk_id,
             string_agg(word, ' ' ORDER BY pos) AS chunk_text,
             count(*) AS n_words
      FROM tagged GROUP BY 1, 2, 3
    )"""


@query(
    "d_cdc_chunking",
    oracle=_CDC_CTES
    + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT chunk_text) AS BIGINT) AS n_distinct_chunks,
           round(1.0 - count(DISTINCT chunk_text) * 1.0 / count(*), 4)
             AS dup_rate,
           round(avg(n_words), 2) AS avg_words_per_chunk,
           CAST(max(n_words) AS BIGINT) AS max_words_per_chunk
    FROM chunks GROUP BY source ORDER BY source
    """,
)
def d_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking REPORT: per-source chunk counts, the
    within-source duplicate-chunk share, and the chunk-length profile
    (operators/dedup.py::content_defined_chunks; boundary = md5 of the
    4 preceding words starting with hex '0', so chunks average ~20
    words). dup_rate here is the insertion-robust counterpart of
    d_segment_dedup_report's fixed-width rate: a one-word edit shifts
    every fixed segment but leaves all but ~1 CDC chunk intact.

    Scale shape: one posexplode pass; the rolling hash and the running
    chunk id share a single per-doc window exchange (doc-bounded
    partitions); reassembly is one per-doc groupBy; the exact distinct
    count is a second bounded shuffle on the chunk text."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = content_defined_chunks(docs, w=_CDC_W, extra_cols=("source",))
    return (
        chunks.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_distinct("chunk_text").alias("n_distinct_chunks"),
            F.round(
                1.0 - F.count_distinct("chunk_text") * 1.0 / F.count("*"), 4
            ).alias("dup_rate"),
            F.round(F.avg("n_words"), 2).alias("avg_words_per_chunk"),
            F.max("n_words").alias("max_words_per_chunk"),
        )
        .orderBy("source")
    )


@query(
    "d_cdc_dedup_apply",
    oracle=_CDC_CTES
    + """
    , k AS (
      SELECT doc_id, chunk_id, chunk_text,
             row_number() OVER (
               PARTITION BY chunk_text ORDER BY doc_id, chunk_id
             ) AS rn
      FROM chunks
    )
    SELECT doc_id,
           coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_id)
                    FILTER (WHERE rn = 1), '') AS text_clean,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT)
             AS n_chunks_dropped
    FROM k GROUP BY doc_id ORDER BY doc_id
    """,
)
def d_cdc_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup APPLY: rebuild each document from
    only the chunks whose text is a corpus-wide FIRST occurrence (in
    (doc_id, chunk_id) order) — boilerplate that repeats across
    near-identical pages is cut even when the pages differ by inserted
    words, because CDC boundaries re-sync after every edit.

    Scale shape: keep-first is the same map-side-combined
    min(struct(id, chunk_id)) groupBy as segment dedup (a
    10^9-occurrence boilerplate chunk collapses per map task), then one
    hash join of chunks vs the winners and one per-doc reassembly
    groupBy (state bounded by chunks-per-doc)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = content_defined_chunks(docs, w=_CDC_W)
    first = chunks.groupBy("chunk_text").agg(
        F.min(F.struct(F.col("id"), F.col("chunk_id"))).alias("__first")
    )
    kept = (
        (F.col("id") == F.col("__first.id"))
        & (F.col("chunk_id") == F.col("__first.chunk_id"))
    )
    flagged = chunks.join(first, "chunk_text").select(
        "id", "chunk_id", "chunk_text", kept.alias("kept")
    )
    kept_struct = F.when(F.col("kept"), F.struct("chunk_id", "chunk_text"))
    return (
        flagged.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("text_clean"),
            F.count("*").alias("n_chunks"),
            F.sum((~F.col("kept")).cast("long")).alias("n_chunks_dropped"),
        )
        .orderBy("doc_id")
    )


@query(
    "p_corpus_card",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, lang, text, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT 'avg_doc_tokens' AS metric, round(avg(n_tokens), 4) AS value FROM d
    UNION ALL SELECT 'exact_dup_doc_rate',
      round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 6) FROM d
    UNION ALL SELECT 'max_doc_tokens', CAST(max(n_tokens) AS DOUBLE) FROM d
    UNION ALL SELECT 'n_docs', CAST(count(*) AS DOUBLE) FROM d
    UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM d
    UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM d
    UNION ALL SELECT 'p50_doc_tokens',
      round(quantile_cont(n_tokens, 0.5), 4) FROM d
    UNION ALL SELECT 'total_chars', CAST(sum(n_chars) AS DOUBLE) FROM d
    UNION ALL SELECT 'total_tokens', CAST(sum(n_tokens) AS DOUBLE) FROM d
    ORDER BY metric
    """,
)
def p_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the release-sheet summary of the corpus (doc /
    source / language counts, token totals and distribution, exact
    duplicate share) as tidy (metric, value) rows.

    Scale shape: ONE corpus scan — every metric is an aggregate of the
    same single-pass Aggregate node (the three exact distinct counts
    expand to Spark's standard expand-rewrite inside the same plan),
    and the 9x2 result unpivots driver-free via stack(). The oracle
    re-states it as 9 UNION ALL scans, which DuckDB is free to do at
    500 rows — the Spark plan is the 100 TB shape."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    agg = docs.agg(
        F.round(F.avg(n_tokens), 4).alias("avg_doc_tokens"),
        F.round(
            1.0 - F.count_distinct(F.md5("text")) * 1.0 / F.count("*"), 6
        ).alias("exact_dup_doc_rate"),
        F.max(n_tokens).cast("double").alias("max_doc_tokens"),
        F.count("*").cast("double").alias("n_docs"),
        F.count_distinct("lang").cast("double").alias("n_langs"),
        F.count_distinct("source").cast("double").alias("n_sources"),
        F.round(F.percentile(n_tokens, F.lit(0.5)), 4).alias("p50_doc_tokens"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.sum(n_tokens).cast("double").alias("total_tokens"),
    )
    metrics = [
        "avg_doc_tokens",
        "exact_dup_doc_rate",
        "max_doc_tokens",
        "n_docs",
        "n_langs",
        "n_sources",
        "p50_doc_tokens",
        "total_chars",
        "total_tokens",
    ]
    stack_expr = "stack({n}, {args}) as (metric, value)".format(
        n=len(metrics),
        args=", ".join(f"'{m}', `{m}`" for m in metrics),
    )
    return agg.selectExpr(stack_expr).orderBy("metric")
