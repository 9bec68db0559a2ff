"""Round-6 continuation, batch 13: duplicate-cluster size distribution,
vocabulary coverage curve, Benjamini-Hochberg FDR, embedding QA.

- ``d_dup_cluster_size_dist``: the size distribution of exact-duplicate
  clusters over the near-dup-augmented corpus — dedup reports so far
  give RATES (d_dedup_pipeline_funnel); this gives the SHAPE (is
  redundancy a few mega-clusters or a long tail of pairs?), which
  decides whether keep-one dedup or cluster-cap sampling is the right
  removal policy.
- ``t_vocab_coverage_curve``: token-mass coverage and OOV rate at vocab
  cutoffs {100, 1k, 10k} — the vocabulary-size planning curve (how big
  must the vocab be before OOV is negligible?).
- ``a_bh_fdr``: Benjamini-Hochberg step-up over the per-event-type
  weekend-vs-weekday Welch tests — the multiple-testing control layer
  a_welch_ttest lacks (test 5 hypotheses at alpha=0.05 uncorrected and
  the family-wise false-positive rate is ~23%).
- ``e_embedding_qa_report``: per-label embedding sanity — vector
  counts, L2-norm profile, zero vectors, dimension consistency — the
  pre-flight every ANN/index build should run before trusting cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.tables import load_table
from .catalog import query
from .round6h_ext import _AUG_SQL, _augmented_corpus

# --------------------------------------------------------------------------
# d_dup_cluster_size_dist
# --------------------------------------------------------------------------


@query(
    "d_dup_cluster_size_dist",
    oracle=f"""
    WITH {_AUG_SQL.strip()},
    clusters AS (
      SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS sz
      FROM aug GROUP BY md5(text)
    ),
    dist AS (
      SELECT sz AS cluster_size,
             CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sz * count(*) AS BIGINT) AS n_docs,
             CAST((sz - 1) * count(*) AS BIGINT) AS n_redundant
      FROM clusters GROUP BY sz
    )
    SELECT cluster_size, n_clusters, n_docs, n_redundant,
           round(n_docs * 1.0 / sum(n_docs) OVER (), 4) AS doc_share
    FROM dist ORDER BY cluster_size
    """,
)
def d_dup_cluster_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster size distribution over the augmented
    corpus: one row per observed cluster size with how many clusters,
    documents, and REDUNDANT documents (size - 1 per cluster — what
    keep-one dedup would delete) that size accounts for, plus its
    share of the corpus. The shape decides removal policy: a long tail
    of pairs favors plain keep-one; a few mega-clusters favor
    cluster-cap sampling so one boilerplate page can't dominate the
    surviving corpus either way.

    Scale shape: one content-hash groupBy (map-side combined — the
    only data-sized shuffle), then a second groupBy to the
    cluster-SIZE frame, bounded by the largest cluster; the share
    window runs over that tiny frame.
    """
    corpus = _augmented_corpus(spark, sf_dir)
    clusters = corpus.groupBy(F.md5("text").alias("h")).agg(
        F.count("*").alias("sz")
    )
    dist = clusters.groupBy("sz").agg(
        F.count("*").alias("n_clusters"),
    )
    return (
        dist.select(
            F.col("sz").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("sz") * F.col("n_clusters")).cast("long").alias("n_docs"),
            ((F.col("sz") - 1) * F.col("n_clusters"))
            .cast("long")
            .alias("n_redundant"),
        )
        .withColumn(
            "doc_share",
            F.round(
                F.col("n_docs") * 1.0
                / F.sum("n_docs").over(W.partitionBy()),
                4,
            ),
        )
        .orderBy("cluster_size")
    )


# --------------------------------------------------------------------------
# t_vocab_coverage_curve
# --------------------------------------------------------------------------

_VOCAB_CUTOFFS = (100, 1000, 10000)


def _vocab_oracle() -> str:
    cols = ", ".join(
        f"""CAST(sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) AS BIGINT)
              AS v{k},
            sum(CASE WHEN rn <= {k} THEN c ELSE 0 END) AS m{k}"""
        for k in _VOCAB_CUTOFFS
    )
    selects = " UNION ALL ".join(
        f"""
    SELECT CAST({k} AS INT) AS vocab_cutoff,
           v{k} AS vocab_used,
           round(m{k} * 1.0 / total, 4) AS coverage,
           round(1 - m{k} * 1.0 / total, 4) AS oov_rate
    FROM folded"""
        for k in _VOCAB_CUTOFFS
    )
    return f"""
    WITH vocab AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rn FROM vocab
    ),
    folded AS (SELECT {cols}, sum(c) AS total FROM ranked)
    SELECT * FROM ({selects}) ORDER BY vocab_cutoff
    """


# Above this many DOCUMENTS the vocab frame's type count is assumed to
# outgrow a single-partition rank window (types grow ~ corpus^0.5-0.7,
# Heaps' law; 5M docs ≈ tens of millions of types) and the curve
# switches to the distributed row-number. Doc count is a parquet
# metadata read — the switch costs no data scan.
_VOCAB_DISTRIBUTED_MIN_DOCS = 5_000_000


def _vocab_curve(docs: DataFrame, distributed: bool) -> DataFrame:
    """Shared body of the coverage curve; ``distributed`` selects the
    rank machinery (global window vs operators/cumsum.py row-number).
    Both paths produce identical output — pinned by
    tests/test_round6n.py and the 10x scale probe."""
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    order = [F.col("c").desc(), F.col("word").asc()]
    if distributed:
        from ..operators.cumsum import global_row_number

        with_rn, _n = global_row_number(vocab, order, out_col="rn")
        ranked = with_rn.select("c", "rn")
    else:
        ranked = vocab.select(
            "c",
            F.row_number().over(W.orderBy(*order)).alias("rn"),
        )
    folded = ranked.agg(
        F.sum("c").alias("total"),
        *[
            a
            for k in _VOCAB_CUTOFFS
            for a in (
                F.sum((F.col("rn") <= k).cast("int"))
                .cast("long")
                .alias(f"v{k}"),
                F.sum(F.when(F.col("rn") <= k, F.col("c"))).alias(f"m{k}"),
            )
        ],
    )
    stack = ", ".join(
        f"{k}, v{k}, m{k}" for k in _VOCAB_CUTOFFS
    )
    return (
        folded.select(
            F.expr(
                f"stack({len(_VOCAB_CUTOFFS)}, {stack}) "
                "AS (vocab_cutoff, vocab_used, mass)"
            ),
            "total",
        )
        .select(
            F.col("vocab_cutoff").cast("int").alias("vocab_cutoff"),
            F.col("vocab_used").cast("long").alias("vocab_used"),
            F.round(F.col("mass") * 1.0 / F.col("total"), 4).alias(
                "coverage"
            ),
            F.round(1 - F.col("mass") * 1.0 / F.col("total"), 4).alias(
                "oov_rate"
            ),
        )
        .orderBy("vocab_cutoff")
    )


@query("t_vocab_coverage_curve", oracle=_vocab_oracle())
def t_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: at each candidate vocab size k in
    {100, 1k, 10k}, how much of the corpus token mass the top-k words
    (by frequency, ties broken lexically) cover, and the complementary
    OOV rate — the curve that sizes a word-level vocab or sanity-checks
    a BPE budget (Zipf's law says coverage grows ~log k; t_zipf_fit
    measures the exponent, this measures the planner's actual
    question). vocab_used < k when the corpus has fewer types.

    Scale shape: one exploded-token count groupBy (map-side combined)
    to the VOCAB frame; one rank pass over that frame feeds a single
    fold computing every cutoff at once (conditional sums), unpivoted
    to 3 rows — the corpus is scanned once and nothing joins. The rank
    machinery SWITCHES on corpus size (round-7, the wired crossover):
    below _VOCAB_DISTRIBUTED_MIN_DOCS documents (a parquet metadata
    count, no scan) the single-partition global window wins (one tiny
    exchange); above it the distributed row-number
    (operators/cumsum.py) removes the one-reducer bottleneck. Both
    paths emit identical rows (test + 10x probe); the gate form
    resolves to the window at driver SFs, and the _production twin
    pins the distributed path under the same oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    distributed = docs.count() >= _VOCAB_DISTRIBUTED_MIN_DOCS
    return _vocab_curve(docs, distributed=distributed)


@query("t_vocab_coverage_curve_production", oracle=_vocab_oracle())
def t_vocab_coverage_curve_production(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forced-distributed twin of t_vocab_coverage_curve: the rank runs
    through operators/cumsum.py's range-partitioned row-number — the
    path a web-scale type count takes — verified against the SAME
    DuckDB oracle as the window form (the b_*_production pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    return _vocab_curve(docs, distributed=True)


# --------------------------------------------------------------------------
# a_bh_fdr
# --------------------------------------------------------------------------

_BH_ALPHA = 0.05
# Logistic approximation of the standard normal CDF, Phi(x) ~
# 1/(1+exp(-1.702x)) (Haley's constant; max abs error < 0.0095).
# Both engines evaluate the SAME closed form on the SAME rounded z, so
# the report is engine-stable; the approximation error only shifts
# p-values, never the cross-engine match, and is irrelevant at the
# z-magnitudes where accept/reject decisions flip.


@query(
    "a_bh_fdr",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 'we' ELSE 'wd' END
               AS grp,
             count(*) AS n, avg(value) AS m, var_samp(value) AS v
      FROM events GROUP BY 1, 2
    ),
    z AS (
      SELECT a.event_type,
             round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS z
      FROM stats a JOIN stats b
        ON a.event_type = b.event_type AND a.grp = 'we' AND b.grp = 'wd'
    ),
    p AS (
      SELECT event_type, round(z, 3) AS z_stat,
             round(2 * (1 - 1 / (1 + exp(-1.702 * abs(z)))), 6) AS p_value
      FROM z
    ),
    ranked AS (
      SELECT event_type, z_stat, p_value,
             row_number() OVER (ORDER BY p_value, event_type) AS rn,
             count(*) OVER () AS m
      FROM p
    ),
    cut AS (
      SELECT coalesce(max(CASE WHEN p_value <= rn * {_BH_ALPHA} / m
                                THEN rn END) OVER (), 0) AS k,
             event_type, z_stat, p_value, rn, m
      FROM ranked
    )
    SELECT event_type, z_stat, p_value,
           CAST(rn AS BIGINT) AS p_rank,
           round(rn * {_BH_ALPHA} / m, 6) AS bh_threshold,
           CAST(rn <= k AS BOOLEAN) AS rejected
    FROM cut ORDER BY p_rank
    """,
)
def a_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over the per-event-type
    weekend-vs-weekday mean-value Welch tests: p-values (two-sided,
    logistic normal approximation on the rounded z) are ranked
    ascending, k = the largest rank with p <= rank/m * alpha, and
    hypotheses 1..k are rejected — including ranks whose OWN p exceeds
    their threshold (the step-up property a naive per-row comparison
    gets wrong). Five uncorrected tests at alpha=0.05 carry ~23%
    family-wise false-positive risk; BH caps the expected FALSE
    DISCOVERY fraction at alpha instead.

    Scale shape: ONE map-side-combined conditional-moment aggregate
    per event type (both arms fold in the same pass — no self-join, a
    single events scan); everything after — Welch fold, p-values,
    ranking, the step-up max — lives on the HYPOTHESES-sized frame
    (m rows). z is rounded before the CDF so both engines rank
    identical p-values; ties break on event_type.
    """
    ev = load_table(spark, sf_dir, "events")
    we = F.dayofweek("ts").isin(1, 7)
    v_we = F.when(we, F.col("value"))
    v_wd = F.when(~we, F.col("value"))
    stats = ev.groupBy("event_type").agg(
        F.count(v_we).alias("n_we"),
        F.avg(v_we).alias("m_we"),
        F.var_samp(v_we).alias("v_we"),
        F.count(v_wd).alias("n_wd"),
        F.avg(v_wd).alias("m_wd"),
        F.var_samp(v_wd).alias("v_wd"),
    )
    z = stats.select(
        "event_type",
        F.round(
            (F.col("m_we") - F.col("m_wd"))
            / F.sqrt(
                F.col("v_we") / F.col("n_we")
                + F.col("v_wd") / F.col("n_wd")
            ),
            6,
        ).alias("z"),
    )
    p = z.select(
        "event_type",
        F.round("z", 3).alias("z_stat"),
        F.round(
            2 * (1 - 1 / (1 + F.exp(-1.702 * F.abs(F.col("z"))))), 6
        ).alias("p_value"),
    )
    ranked = p.select(
        "event_type",
        "z_stat",
        "p_value",
        F.row_number()
        .over(W.orderBy("p_value", "event_type"))
        .alias("rn"),
        F.count("*").over(W.partitionBy()).alias("m"),
    )
    k = F.max(
        F.when(
            F.col("p_value") <= F.col("rn") * _BH_ALPHA / F.col("m"),
            F.col("rn"),
        )
    ).over(W.partitionBy())
    return (
        ranked.select(
            "event_type",
            "z_stat",
            "p_value",
            F.col("rn").cast("long").alias("p_rank"),
            F.round(F.col("rn") * _BH_ALPHA / F.col("m"), 6).alias(
                "bh_threshold"
            ),
            (F.col("rn") <= F.coalesce(k, F.lit(0))).alias("rejected"),
        )
        .orderBy("p_rank")
    )


# --------------------------------------------------------------------------
# e_embedding_qa_report
# --------------------------------------------------------------------------


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
