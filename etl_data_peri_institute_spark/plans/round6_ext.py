"""Round-6 gate registrations: span-level exact-substring dedup (Lee
et al. 2022) and the distributed-cumsum production variants.

The span-dedup pair promotes ``operators/dedup.py``'s
``duplicated_span_ranges`` / ``remove_duplicated_spans`` (built round 5,
pytest-verified) to driver-oracled gate queries; the three production
registrations give the round-5 distributed-cumsum paths
(``token_budget_select_production``, ``pareto_abc_production``,
``rfm_segmentation_production``) their own driver rows under the SAME
oracles as their global-window semantics pins — the driver, not just
pytest, certifies bit-identity.

Reference parity note: the reference repo has no span-level dedup
(its only dedup is keep-last row dedup,
/root/reference/etl/transform.py); these are north-star training-data
operators per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators.dedup import duplicated_span_ranges, remove_duplicated_spans
from ..sources.tables import load_table
from .behavioral import rfm_segmentation_production
from .catalog import ORACLES, query
from .round4b_ext import (
    _BUDGET_PCT,
    pareto_abc_production,
    token_budget_select_production,
)

_SPAN_N = 8
_SPAN_MIN_DOCS = 2

# Shared CTE prefix: positioned 8-grams -> hot grams (2+ distinct docs)
# -> flagged [pos, pos+7] word ranges -> gaps-and-islands merge with
# adjacency 1 (contiguous runs coalesce). Mirrors merge_intervals'
# running-max island flag exactly (same (lo, hi) ordering tiebreak).
_SPAN_CTES = f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i AS pos,
             concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]) AS g
      FROM words, UNNEST(range(1, len(w) - {_SPAN_N - 2})) AS t(i)
      WHERE len(w) >= {_SPAN_N}
    ),
    hot AS (
      SELECT g FROM grams GROUP BY g
      HAVING count(DISTINCT doc_id) >= {_SPAN_MIN_DOCS}
    ),
    flagged AS (
      SELECT doc_id, pos AS lo, pos + {_SPAN_N - 1} AS hi
      FROM grams WHERE g IN (SELECT g FROM hot)
    ),
    isl AS (
      SELECT doc_id, lo, hi,
             CASE WHEN lo > coalesce(max(hi) OVER (
               PARTITION BY doc_id ORDER BY lo, hi
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2147483648) + 1
             THEN 1 ELSE 0 END AS ni
      FROM flagged
    ),
    islands AS (
      SELECT doc_id, lo, hi,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY lo, hi) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, min(lo) AS lo, max(hi) AS hi
      FROM islands GROUP BY doc_id, island
    )"""


@query(
    "d_span_dedup_ranges",
    oracle=_SPAN_CTES
    + """
    SELECT doc_id AS id, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi
    FROM spans ORDER BY id, lo
    """,
)
def d_span_dedup_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup, DIAGNOSTIC half: merged word-
    coordinate ranges of every 8-gram run shared by 2+ documents
    (operators/dedup.py::duplicated_span_ranges — one posexplode pass,
    map-side-combined hot-gram groupBy, semi-join vs the boilerplate-
    sized hot set, one per-doc island window). The oracle unrolls the
    identical positioned-gram / hot-gram / gaps-and-islands pipeline in
    SQL. t_duplicated_ngram_report is the corpus-level report over the
    same grams; this is the per-document coordinate form the APPLY
    consumes."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_ranges(
        docs, n=_SPAN_N, min_docs=_SPAN_MIN_DOCS
    ).orderBy("id", "lo")


@query(
    "d_span_dedup_apply",
    oracle=_SPAN_CTES
    + """,
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS INT) AS n_spans FROM spans GROUP BY doc_id
    ),
    wpos AS (
      SELECT doc_id, i, w[i] AS word
      FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
    ),
    kept AS (
      SELECT wp.doc_id, wp.i, wp.word FROM wpos wp
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = wp.doc_id AND wp.i BETWEEN s.lo AND s.hi
      )
    ),
    clean AS (
      SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text_clean,
             CAST(count(*) AS INT) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    nw AS (SELECT doc_id, CAST(len(w) AS INT) AS n_words FROM words)
    SELECT d.doc_id,
           CASE WHEN pd.doc_id IS NULL THEN d.text
                ELSE coalesce(c.text_clean, '') END AS text_clean,
           CAST(CASE WHEN pd.doc_id IS NULL THEN 0
                     ELSE nw.n_words - coalesce(c.n_kept, 0) END AS INT) AS n_words_removed,
           coalesce(pd.n_spans, 0) AS n_spans_removed
    FROM documents d
    JOIN nw USING (doc_id)
    LEFT JOIN per_doc pd USING (doc_id)
    LEFT JOIN clean c USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def d_span_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup, APPLY half: cut every
    duplicated span out of each document
    (operators/dedup.py::remove_duplicated_spans — per-doc span arrays
    joined back once, the cut a JVM higher-order F.filter lambda; no
    UDF, no second corpus explode). Docs with no duplicated span pass
    through verbatim with zero counters. The oracle rebuilds the cut
    relationally (word positions anti-joined against span coverage)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_duplicated_spans(docs, n=_SPAN_N, min_docs=_SPAN_MIN_DOCS)
    return out.select(
        "doc_id",
        "text_clean",
        "n_words_removed",
        "n_spans_removed",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Distributed-cumsum production variants: register under the SAME oracle
# as their global-window gate pins, so the driver itself certifies that
# the range-exchange + Arrow-local-cumsum + broadcast-offsets path is
# value-identical to the single-partition window semantics. (pytest
# already pins bit-identity; this makes it driver evidence.)
# ---------------------------------------------------------------------------

query("b_token_budget_production", oracle=ORACLES["b_token_budget_selection"])(
    token_budget_select_production
)
query("a_pareto_abc_production", oracle=ORACLES["a_pareto_abc"])(
    pareto_abc_production
)
query("b_rfm_production", oracle=ORACLES["b_rfm_segmentation"])(
    rfm_segmentation_production
)


# ---------------------------------------------------------------------------
# Per-GROUP token budget: the grouped-cumsum operator's gate pair.
# b_token_budget_selection spends ONE global budget; real training-data
# assembly budgets PER SOURCE/LANGUAGE (each source keeps its own best
# docs until that source's budget is spent). The window form partitions
# by source — scale-broken for a hot group (English ~60% of a web corpus
# lands on ONE window task); the production twin runs
# operators/cumsum.py::grouped_global_running_sum (group-aware range
# exchange — a hot group spans MANY partitions — Arrow local cumsum
# with group-reset carry, per-(partition, group) offsets broadcast
# back, groups-sized totals joined in place of the companion window).
# ---------------------------------------------------------------------------

_SRC_BUDGET_ORACLE = f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(n_chars AS BIGINT) AS quality
      FROM documents
    ),
    ranked AS (
      SELECT source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
             ) AS BIGINT) AS cum_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS total_tokens
      FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                    THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
           round(sum(CASE WHEN cum_tokens * 100 <= total_tokens * {_BUDGET_PCT}
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS keep_rate
    FROM ranked
    GROUP BY source
    ORDER BY source
    """


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.col("n_chars").alias("quality"),
    )


def _src_budget_report(ranked: DataFrame, kept) -> DataFrame:
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
            F.round(F.sum(kept.cast("long")) / F.count("*"), 4).alias("keep_rate"),
        )
        .orderBy("source")
    )


@query("b_source_token_budget", oracle=_SRC_BUDGET_ORACLE)
def b_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget selection, WINDOW form (the semantics
    pin): within each source, keep the best-quality docs until that
    source's {p}% token budget is spent. Kept as the oracle-shaped
    per-group ordered cumsum; the scale path is
    ``b_source_token_budget_production`` below, tested
    bit-identical.""".format(p=_BUDGET_PCT)
    scored = _scored_docs(spark, sf_dir)
    w = W.partitionBy("source").orderBy(F.desc("quality"), "doc_id")
    ranked = scored.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("n_tokens").over(W.partitionBy("source")).alias("total_tokens"),
    )
    kept = F.col("cum_tokens") * 100 <= F.col("total_tokens") * _BUDGET_PCT
    return _src_budget_report(ranked, kept)


@query("b_source_token_budget_production", oracle=_SRC_BUDGET_ORACLE)
def b_source_token_budget_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budget, PRODUCTION form: grouped distributed
    running sum (``operators/cumsum.py``) — no per-group window, so a
    hot source spans many partitions instead of one task; the
    groups-sized per-source totals broadcast-join in place of the
    ``sum() OVER (PARTITION BY source)`` companion window. Long
    arithmetic end-to-end (the per-source total times {p} never folds
    in int32). Bit-identical to the window pin.""".format(p=_BUDGET_PCT)
    from ..operators.cumsum import grouped_global_running_sum

    scored = _scored_docs(spark, sf_dir)
    ranked, totals = grouped_global_running_sum(
        scored,
        "n_tokens",
        ["source"],
        [F.desc("quality"), F.asc("doc_id")],
        out_col="cum_tokens",
    )
    tot_df = spark.createDataFrame(
        [(k[0], int(v)) for k, v in sorted(totals.items())],
        "source string, total_tokens long",
    )
    ranked = ranked.join(F.broadcast(tot_df), "source")
    kept = F.col("cum_tokens") * 100 <= F.col("total_tokens") * _BUDGET_PCT
    return _src_budget_report(ranked, kept)
