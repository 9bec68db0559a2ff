"""Round-6 continuation, batch 12: preference-pair construction,
tokenizer fertility, and the curriculum schedule.

- ``b_preference_pairs``: deterministic RLHF-style preference pairs —
  within each source, the i-th best document (by lexical-diversity
  score) is paired with the i-th worst, yielding (chosen, rejected)
  rows with a positive score gap; the standard way to mine contrastive
  training pairs from a scored corpus without human labels.
- ``t_tokenizer_fertility``: tokens-per-word and bytes-per-token per
  language — the tokenizer-efficiency report every multilingual
  training pipeline runs before fixing a vocab (high fertility on a
  language means its share of the token budget silently inflates).
- ``b_curriculum_schedule``: quality-tier curriculum stages (highest
  tier trains first) with per-stage document/token counts and the
  cumulative token fraction — the schedule table a curriculum-training
  loop consumes directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.tables import load_table
from .catalog import query

# --------------------------------------------------------------------------
# b_preference_pairs
# --------------------------------------------------------------------------


@query(
    "b_preference_pairs",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             round(count(DISTINCT word) * 1.0 / count(*), 4) AS score
      FROM tokens GROUP BY doc_id, source
    ),
    ranked AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rn_top,
             row_number() OVER (PARTITION BY source
                                ORDER BY score, doc_id DESC) AS rn_bot,
             count(*) OVER (PARTITION BY source) AS n
      FROM scored
    )
    SELECT t.source,
           CAST(t.rn_top AS BIGINT) AS pair_rank,
           t.doc_id AS chosen_doc,
           b.doc_id AS rejected_doc,
           t.score AS chosen_score,
           b.score AS rejected_score,
           round(t.score - b.score, 4) AS score_gap
    FROM ranked t
    JOIN ranked b ON b.source = t.source AND b.rn_bot = t.rn_top
    WHERE t.rn_top <= t.n // 2
    ORDER BY t.source, pair_rank
    """,
)
def b_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic preference-pair construction: per source, rank
    documents by lexical-diversity score (distinct-word ratio, the
    same feature t_quality_score uses) and pair the i-th best with the
    i-th worst for i <= floor(n/2) — (chosen, rejected) rows whose
    score gap is non-negative by construction and widest at pair_rank
    1. Mining contrastive pairs from heuristic scores is the standard
    bootstrap for reward-model / DPO data when no human labels exist;
    both rankings tiebreak on doc_id (descending on the bottom rank so
    an odd middle element pairs with itself and is excluded by the
    floor(n/2) cut, never double-counted).

    Scale shape: one exploded-token aggregation scores every document
    map-side-combined; ONE per-source rank window orders it (the
    bottom ranking is the exact reverse of the top ranking because
    (score, doc_id) is a strict total order, so rn_bot = n+1-rn_top is
    arithmetic, not a second sort); each ranked row then explodes into
    its <=2 pair roles and one (source, pair_rank) groupBy assembles
    the pairs — a single corpus scan and no self-join (the join form
    would duplicate the whole scoring subtree). Per-source frames
    bound the window; for a source too large to sort in one partition,
    the grouped distributed row-number (operators/cumsum.py) is the
    drop-in production twin, as pinned for b_epoch_shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    )
    scored = tokens.groupBy("doc_id", "source").agg(
        F.round(F.countDistinct("word") / F.count("*"), 4).alias("score")
    )
    wtop = W.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    ranked = scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(wtop).alias("rn_top"),
        F.count("*").over(W.partitionBy("source")).alias("n"),
    )
    roles = ranked.select(
        "source",
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("c").alias("role"),
                    F.col("rn_top").alias("k"),
                    F.col("doc_id").alias("d"),
                    F.col("score").alias("s"),
                ),
                F.struct(
                    F.lit("r").alias("role"),
                    (F.col("n") + 1 - F.col("rn_top")).alias("k"),
                    F.col("doc_id").alias("d"),
                    F.col("score").alias("s"),
                ),
            )
        ).alias("p"),
    ).filter(F.col("p.k") <= F.floor(F.col("n") / 2))
    c = F.col("p.role") == "c"
    return (
        roles.groupBy("source", F.col("p.k").alias("pair_rank"))
        .agg(
            F.max(F.when(c, F.col("p.d"))).alias("chosen_doc"),
            F.max(F.when(~c, F.col("p.d"))).alias("rejected_doc"),
            F.max(F.when(c, F.col("p.s"))).alias("chosen_score"),
            F.max(F.when(~c, F.col("p.s"))).alias("rejected_score"),
        )
        .select(
            "source",
            F.col("pair_rank").cast("long").alias("pair_rank"),
            "chosen_doc",
            "rejected_doc",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 4
            ).alias("score_gap"),
        )
        .orderBy("source", "pair_rank")
    )


# --------------------------------------------------------------------------
# t_tokenizer_fertility
# --------------------------------------------------------------------------


@query(
    "t_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
           CAST(sum(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT)
             AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_bytes,
           round(sum(len(regexp_extract_all(text, '[a-z0-9]+'))) * 1.0
                 / sum(len(string_split(text, ' '))), 4) AS fertility,
           round(sum(n_chars) * 1.0
                 / sum(len(regexp_extract_all(text, '[a-z0-9]+'))), 4)
             AS bytes_per_token
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def t_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: tokens-per-word (how many
    subword tokens the BPE-ish regex tokenizer emits per whitespace
    word) and bytes-per-token, over the same two tokenizations
    t_token_count reports per document. Fertility is THE
    multilingual-vocab diagnostic: a language at fertility 2.0 burns
    twice the context window per word of a language at 1.0, so its
    effective share of any token budget doubles silently —
    bytes-per-token reads compression efficiency the same way
    (published tokenizer papers report exactly these two ratios).

    Scale shape: both token counts are per-row column expressions
    (size-of-split — no explode, no UDF), so the whole report is one
    map-side-combined aggregation to a languages-sized frame; nothing
    shuffles more than partial sums.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("w"),
        F.size(
            F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")
        ).alias("t"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w").cast("long").alias("n_words"),
            F.sum("t").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
            F.round(F.sum("t") * 1.0 / F.sum("w"), 4).alias("fertility"),
            F.round(F.sum("n_chars") * 1.0 / F.sum("t"), 4).alias(
                "bytes_per_token"
            ),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# b_curriculum_schedule
# --------------------------------------------------------------------------

_CURR_STOPWORDS = ("the", "a", "of", "and", "to", "in")


@query(
    "b_curriculum_schedule",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             round(avg(length(word)), 4) AS awl,
             round(sum(CASE WHEN word IN {_CURR_STOPWORDS} THEN 1 ELSE 0
                       END) * 1.0 / count(*), 4) AS sw,
             round(count(DISTINCT word) * 1.0 / count(*), 4) AS dr
      FROM tokens GROUP BY doc_id
    ),
    tiers AS (
      SELECT n_words,
             (CASE WHEN n_words >= 50 THEN 1 ELSE 0 END)
           + (CASE WHEN sw >= 0.02 THEN 1 ELSE 0 END)
           + (CASE WHEN dr >= 0.1 THEN 1 ELSE 0 END)
           + (CASE WHEN awl >= 3.0 AND awl <= 10.0 THEN 1 ELSE 0 END)
             AS tier
      FROM stats
    ),
    stages AS (
      SELECT tier, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS stage_tokens
      FROM tiers GROUP BY tier
    )
    SELECT CAST(row_number() OVER (ORDER BY tier DESC) AS BIGINT)
             AS stage_rank,
           CAST(tier AS INT) AS quality_tier,
           n_docs, stage_tokens,
           CAST(sum(stage_tokens) OVER (ORDER BY tier DESC) AS BIGINT)
             AS cum_tokens,
           round(sum(stage_tokens) OVER (ORDER BY tier DESC) * 1.0
                 / sum(stage_tokens) OVER (), 4) AS cum_token_frac
    FROM stages
    ORDER BY stage_rank
    """,
)
def b_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule over quality tiers: documents are scored
    with the exact t_quality_score rule count (0-4 thresholds passed),
    each tier becomes a training stage — HIGHEST tier first, the
    clean-data-early curriculum — and the report carries per-stage
    document/token counts plus cumulative tokens and the cumulative
    token fraction. A training loop consumes this table directly: stage
    boundaries in tokens, and cum_token_frac says where (e.g.) the
    50%-budget point lands in quality space.

    Scale shape: one exploded-token aggregation to per-doc stats
    (map-side combined), one groupBy to the 5-row tier frame; every
    window (ranking, running sum, grand total) runs over that 5-row
    frame — the data-sized work is exactly two shuffles and nothing
    window-shaped ever sees a document row.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    stats = tokens.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.round(F.avg(F.length("word")), 4).alias("awl"),
        F.round(
            F.sum(F.col("word").isin(*_CURR_STOPWORDS).cast("int"))
            / F.count("*"),
            4,
        ).alias("sw"),
        F.round(F.countDistinct("word") / F.count("*"), 4).alias("dr"),
    )
    tier = (
        (F.col("n_words") >= 50).cast("int")
        + (F.col("sw") >= 0.02).cast("int")
        + (F.col("dr") >= 0.1).cast("int")
        + ((F.col("awl") >= 3.0) & (F.col("awl") <= 10.0)).cast("int")
    )
    stages = (
        stats.select(tier.alias("tier"), "n_words")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("long").alias("stage_tokens"),
        )
    )
    word = W.orderBy(F.col("tier").desc())
    wcum = word.rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    return (
        stages.select(
            F.row_number().over(word).cast("long").alias("stage_rank"),
            F.col("tier").cast("int").alias("quality_tier"),
            "n_docs",
            "stage_tokens",
            F.sum("stage_tokens").over(wcum).cast("long").alias(
                "cum_tokens"
            ),
            F.round(
                F.sum("stage_tokens").over(wcum)
                * 1.0
                / F.sum("stage_tokens").over(wall),
                4,
            ).alias("cum_token_frac"),
        )
        .orderBy("stage_rank")
    )
