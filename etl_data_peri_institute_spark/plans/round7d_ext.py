"""Round-7 continuation operators, batch 4: semantic dedup, entropy
filtering, dedup-aware mixing, experiment guardrails.

- d_semdedup_report     — cluster-scoped embedding near-dup removal
  census (the SemDeDup recipe: pairwise cosine INSIDE clusters only)
- t_doc_entropy_filter  — per-document unigram entropy quality filter
- b_dedup_aware_mixture — temperature mixture computed on EFFECTIVE
  (duplicate-discounted) token counts, composing d_soft_dedup_weights
  with b_temperature_mixture's exponent family
- b_ab_srm_check        — sample-ratio-mismatch guardrail (χ² vs the
  designed 50/50 split) for the hash-assigned experiment

Each with a DuckDB oracle; the SemDeDup pair join is bounded by the
cluster partition — never an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

# Deliberately LOW gate threshold: the synthetic embeddings' within-
# cluster cosines top out near 0.47, so 0.3 exercises every branch
# (pairs found, some vectors removed, most kept). Production near-dup
# runs 0.9+ — the threshold is the caller's parameter, not a constant
# baked into the plan shape.
_SEMDEDUP_REPORT_TAU = 0.3
# Per-cluster sample cap (deterministic: first N members by vec_id,
# applied IDENTICALLY in the oracle). Within-cluster pairs grow as
# |c|²; when the clusterer's k is fixed while the corpus grows, |c|
# grows linearly and the census goes quadratic (the 10x probe measured
# 13.8x before this cap landed). Real SemDeDup keeps k ∝ N so |c| stays
# bounded; the cap enforces the same bound when it isn't — the census
# then reads a fixed-size per-cluster sample, which is exactly how the
# exact-pairwise calibration is run at scale anyway.
_SEMDEDUP_MAX_CLUSTER = 200


@query(
    "d_semdedup_report",
    oracle=f"""
    WITH sampled AS (
      SELECT vec_id, label, embedding FROM (
        SELECT vec_id, label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings
      ) WHERE rn <= {_SEMDEDUP_MAX_CLUSTER}
    ),
    pos AS (
      SELECT vec_id AS id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM sampled, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    norms AS (
      SELECT id, label, sqrt(sum(val * val)) AS nrm FROM pos GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.label, a.id AS ia, b.id AS ib,
             sum(a.val * b.val) AS dot
      FROM pos a JOIN pos b
        ON a.pos = b.pos AND a.label = b.label AND a.id < b.id
      GROUP BY 1, 2, 3
    ),
    dup AS (
      SELECT p.label, p.ia, p.ib
      FROM pairs p
      JOIN norms x ON x.id = p.ia
      JOIN norms y ON y.id = p.ib
      WHERE p.dot / (x.nrm * y.nrm) > {_SEMDEDUP_REPORT_TAU}
    ),
    removed AS (SELECT DISTINCT label, ib AS id FROM dup)
    SELECT n.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(coalesce(max(d.n_pairs), 0) AS BIGINT) AS n_dup_pairs,
           CAST(coalesce(max(r.n_removed), 0) AS BIGINT) AS n_removed,
           CAST(count(*) - coalesce(max(r.n_removed), 0) AS BIGINT) AS n_kept
    FROM norms n
    LEFT JOIN (SELECT label, count(*) AS n_pairs FROM dup GROUP BY 1) d
      USING (label)
    LEFT JOIN (SELECT label, count(*) AS n_removed FROM removed GROUP BY 1) r
      USING (label)
    GROUP BY n.label ORDER BY n.label
    """,
)
def d_semdedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup census, EXACT within-cluster pairwise form: every
    cosine pair inside each semantic cluster (cluster = the stored
    kmeans label; e_kmeans_fit produces it). A vector is removed when a
    LOWER-id vector in its cluster exceeds tau — the deterministic
    keep-first rule replacing the paper's greedy order. Reports per
    cluster: size, dup pairs, removed, kept. Complements
    d_semdedup_prune (plans/round4_ext.py), the O(n) keeper-only
    approximation — this is the exact census you run on a sample to
    CALIBRATE how much the keeper approximation under-counts.

    Scale shape: THE point of SemDeDup — the pair join is scoped to the
    cluster key, so candidate count is Σ_c |c|² instead of N², and each
    cluster's pairs co-locate in one partition (join key = label). |c|
    itself is bounded by the deterministic per-cluster sample cap
    (_SEMDEDUP_MAX_CLUSTER, applied identically in the oracle) — with a
    FIXED clusterer k, |c| grows with the corpus and the census would
    go quadratic (the 10× probe measured 13.8× before the cap); real
    SemDeDup keeps k ∝ N, and the cap enforces the same bound when the
    assignment doesn't. Cosines run through JVM higher-order
    functions — no explode on the Spark side, no Python.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cap = F.row_number().over(W.partitionBy("label").orderBy("vec_id"))
    emb = (
        emb.withColumn("__rn", cap)
        .where(F.col("__rn") <= _SEMDEDUP_MAX_CLUSTER)
        .drop("__rn")
    )
    nrm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    vecs = emb.select("vec_id", "label", "embedding", nrm.alias("nrm"))
    a = vecs.alias("a")
    b = vecs.alias("b")
    dot = F.aggregate(
        F.zip_with("a.embedding", "b.embedding", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dup = (
        a.join(b, (F.col("a.label") == F.col("b.label"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .where(dot / (F.col("a.nrm") * F.col("b.nrm")) > _SEMDEDUP_REPORT_TAU)
        .select(F.col("a.label").alias("label"),
                F.col("a.vec_id").alias("ia"),
                F.col("b.vec_id").alias("ib"))
    )
    pairs_per = dup.groupBy("label").agg(F.count("*").alias("n_pairs"))
    removed_per = (
        dup.select("label", "ib").distinct()
        .groupBy("label").agg(F.count("*").alias("n_removed"))
    )
    base = vecs.groupBy("label").agg(F.count("*").alias("n_vecs"))
    return (
        base.join(pairs_per, "label", "left")
        .join(removed_per, "label", "left")
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            (F.col("n_vecs") - F.coalesce("n_removed", F.lit(0)))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("label")
    )


_ENTROPY_LOW = 3.0  # bits; degenerate-text flag threshold


@query(
    "t_doc_entropy_filter",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    wc AS (
      SELECT doc_id, source, w, count(*) AS c FROM words GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT doc_id, source, sum(c) AS n FROM wc GROUP BY 1, 2
    ),
    ent AS (
      SELECT wc.doc_id, wc.source,
             -sum((wc.c * 1.0 / tot.n) * log2(wc.c * 1.0 / tot.n)) AS h
      FROM wc JOIN tot USING (doc_id, source)
      GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(h), 4) AS avg_entropy,
           round(min(h), 4) AS min_entropy,
           CAST(sum(CASE WHEN h < {_ENTROPY_LOW} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_entropy
    FROM ent GROUP BY source ORDER BY source
    """,
)
def t_doc_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (bits) as a quality filter:
    keyword-stuffed / repeated-token / single-phrase documents have low
    entropy regardless of length, which catches degenerate text the
    length and stopword heuristics (t_quality_score) miss. Reports
    per-source average, minimum, and the count under the filter
    threshold. (a_column_entropy_report profiles COLUMNS; this scores
    each DOCUMENT's internal distribution.)

    Scale shape: one explode → (doc, word) count groupBy (map-side
    combined), per-doc totals by a second small groupBy joined back on
    doc_id (co-partitioned — AQE plans it shuffle-free after the first
    aggregate), entropy folded per doc, then the per-source aggregate.
    Everything partitions on doc_id; bounded doc lengths mean no skew.
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select("doc_id", "source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "source", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = wc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    ent = (
        wc.join(tot, "doc_id")
        .groupBy("doc_id", "source")
        .agg((-F.sum(p * F.log2(p))).alias("h"))
    )
    return (
        ent.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("h"), 4).alias("avg_entropy"),
            F.round(F.min("h"), 4).alias("min_entropy"),
            F.sum((F.col("h") < _ENTROPY_LOW).cast("int"))
            .cast("long")
            .alias("n_low_entropy"),
        )
        .orderBy("source")
    )


_MIX_TAU = 0.7


@query(
    "b_dedup_aware_mixture",
    oracle=f"""
    WITH c AS (
      SELECT source,
             len(string_split(text, ' ')) AS nt,
             count(*) OVER (PARTITION BY md5(text)) AS csz
      FROM documents
    ),
    eff AS (
      SELECT source,
             CAST(sum(nt) AS BIGINT) AS raw_tokens,
             sum(nt * 1.0 / csz) AS eff_tokens
      FROM c GROUP BY source
    )
    SELECT source, raw_tokens,
           round(eff_tokens, 2) AS eff_tokens,
           round(pow(eff_tokens, {_MIX_TAU})
                 / sum(pow(eff_tokens, {_MIX_TAU})) OVER (), 6) AS weight
    FROM eff ORDER BY source
    """,
)
def b_dedup_aware_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture weights computed on EFFECTIVE token counts —
    tokens discounted by 1/duplicate-cluster-size — so a source whose
    bulk is copies doesn't buy sampling weight with them (the
    composition of d_soft_dedup_weights into b_temperature_mixture's
    τ-exponent family; τ=0.7 here, the flattening regime). Without the
    discount, crawl sources with high duplication are systematically
    oversampled relative to their unique content.

    Scale shape: one corpus pass — the content-hash window attaches
    cluster size, tokens counted in the same projection, one
    groupBy(source); the weight normalization is a window over the
    SOURCES frame (bounded). Nothing here grows super-linearly: the
    md5 window is the same single shuffle d_soft_dedup_weights costs.
    """
    docs = load_table(spark, sf_dir, "documents")
    csz = F.count("*").over(
        W.partitionBy(F.md5(F.encode(F.col("text"), "UTF-8")))
    )
    c = docs.select(
        "source",
        F.size(F.split("text", " ")).alias("nt"),
        csz.alias("csz"),
    )
    eff = c.groupBy("source").agg(
        F.sum("nt").cast("long").alias("raw_tokens"),
        F.sum(F.col("nt") * 1.0 / F.col("csz")).alias("eff_tokens"),
    )
    everything = W.orderBy("source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    powed = F.pow(F.col("eff_tokens"), _MIX_TAU)
    return eff.select(
        "source",
        "raw_tokens",
        F.round("eff_tokens", 2).alias("eff_tokens"),
        F.round(powed / F.sum(powed).over(everything), 6).alias("weight"),
    ).orderBy("source")


@query(
    "b_ab_srm_check",
    oracle="""
    WITH assigned AS (
      SELECT event_type,
             (instr('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS treat
      FROM events
    ),
    counts AS (
      SELECT event_type,
             count(*) AS n,
             sum(treat) AS n_treat
      FROM assigned GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n_treat AS BIGINT) AS n_treat,
           CAST(n - n_treat AS BIGINT) AS n_control,
           round(pow(n_treat - n * 0.5, 2) / (n * 0.5)
                 + pow((n - n_treat) - n * 0.5, 2) / (n * 0.5), 4) AS chi2,
           CAST(pow(n_treat - n * 0.5, 2) / (n * 0.5)
                + pow((n - n_treat) - n * 0.5, 2) / (n * 0.5)
                > 3.841 AS BOOLEAN) AS srm_flag
    FROM counts ORDER BY event_type
    """,
)
def b_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the hash-assigned experiment
    (b_ab_experiment_report / b_did_estimator's assignment): χ²
    goodness-of-fit of the observed treat/control split against the
    designed 50/50, flagged at the 0.05 critical value (3.841, 1 dof).
    An SRM flag means the assignment or logging is broken and every
    downstream readout is invalid — the first gate any experiment
    pipeline runs.

    Scale shape: one scan, assignment in codegen, one map-side-combined
    groupBy(event_type); the χ² is arithmetic on the aggregate row.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    counts = (
        ev.select("event_type", treat.alias("treat"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("treat").alias("n_treat"))
    )
    exp = F.col("n") * 0.5
    chi2 = (
        F.pow(F.col("n_treat") - exp, 2) / exp
        + F.pow((F.col("n") - F.col("n_treat")) - exp, 2) / exp
    )
    return counts.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("n_treat").cast("long").alias("n_treat"),
        (F.col("n") - F.col("n_treat")).cast("long").alias("n_control"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    ).orderBy("event_type")
