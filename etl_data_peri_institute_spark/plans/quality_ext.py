"""Corpus-quality and sampling operators, round 4: inverted index,
rule-based quality report, weighted sampling, winsorized statistics,
per-document LM perplexity, median/MAD outliers, equi-depth histogram.

All follow the repo's determinism discipline: integer predicates
where possible (the quality rules are pure integer comparisons — no
doubles at all), content-hash-driven sampling (never rand()), and
rounded-then-tiebroken ordering wherever a float feeds a top-k boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query
from .llmdata import _hex4_to_int_sql


# --------------------------------------------------------------------------
# t_inverted_index — term → doc_freq / total_tf / posting-list head
# --------------------------------------------------------------------------


@query(
    "t_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY term, doc_id
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS doc_freq,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings_head
    FROM tf
    GROUP BY term
    ORDER BY term
    """,
)
def t_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: per term, document frequency, total term
    frequency, and the head of the sorted posting list — the retrieval /
    BM25 backbone over a tokenized corpus.

    Scale shape: explode → two map-side-combined groupBys, both shuffles
    keyed on the term (vocabulary-bounded output). Posting lists are the
    one unbounded per-group value; real indexes shard them — here the
    gate output carries only the first 10 ids (``slice`` AFTER
    ``array_sort``, so the head is deterministic, not arrival-ordered).
    A stop-word df cap (same hot-key discipline as the shingle and
    fuzzy-block caps) is where a 100 TB build bounds the worst lists."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 10), ","
            ).alias("postings_head"),
        )
        .orderBy("term")
    )


# --------------------------------------------------------------------------
# t_gopher_quality_rules — integer-only rule report
# --------------------------------------------------------------------------


@query(
    "t_gopher_quality_rules",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS nw,
             len(list_distinct(string_split(text, ' '))) AS nd,
             n_chars,
             list_contains(string_split(text, ' '), 'the')
               OR list_contains(string_split(text, ' '), 'a') AS has_stop
      FROM documents
    ),
    flags AS (
      SELECT doc_id,
             (nw BETWEEN 20 AND 80) AS r1,
             (100 * (n_chars - nw + 1) BETWEEN 400 * nw AND 500 * nw) AS r2,
             has_stop AS r3,
             (5 * nd >= 2 * nw) AS r4
      FROM s
    )
    SELECT rule,
           CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN pass THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
    FROM (
      SELECT 'r1_word_count' AS rule, r1 AS pass FROM flags
      UNION ALL SELECT 'r2_mean_word_len', r2 FROM flags
      UNION ALL SELECT 'r3_stopword_presence', r3 FROM flags
      UNION ALL SELECT 'r4_distinct_ratio', r4 FROM flags
      UNION ALL SELECT 'r5_all_rules', r1 AND r2 AND r3 AND r4 FROM flags
    )
    GROUP BY rule
    ORDER BY rule
    """,
)
def t_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality report: per rule, how many docs
    pass/fail (word-count band, mean-word-length band, stop-word
    presence, distinct-token ratio, and the conjunction).

    Determinism discipline: every rule is a PURE INTEGER predicate —
    mean word length ∈ [4.0, 5.0] is written ``100*(letters) BETWEEN
    400*nw AND 500*nw`` and the distinct-ratio ≥ 0.4 as ``5*nd >= 2*nw``
    — so there is not a single double anywhere in the query.

    Scale shape: one scan, per-row array ops (no explode — ``size``/
    ``array_distinct``/``array_contains`` are in-row codegen), then a
    5-way stack to a rule-keyed 5-row aggregate. The unpivot multiplies
    rows 5× AFTER the per-doc flags are computed (booleans, not text)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    s = docs.select(
        F.size(ws).alias("nw"),
        F.size(F.array_distinct(ws)).alias("nd"),
        "n_chars",
        (F.array_contains(ws, "the") | F.array_contains(ws, "a")).alias("has_stop"),
    )
    flags = s.select(
        F.col("nw").between(20, 80).alias("r1"),
        (100 * (F.col("n_chars") - F.col("nw") + 1)).between(
            400 * F.col("nw"), 500 * F.col("nw")
        ).alias("r2"),
        F.col("has_stop").alias("r3"),
        (5 * F.col("nd") >= 2 * F.col("nw")).alias("r4"),
    ).withColumn("r5", F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4"))
    unpivoted = flags.select(
        F.expr(
            "stack(5, 'r1_word_count', r1, 'r2_mean_word_len', r2,"
            " 'r3_stopword_presence', r3, 'r4_distinct_ratio', r4,"
            " 'r5_all_rules', r5) AS (rule, pass)"
        )
    )
    return (
        unpivoted.groupBy("rule")
        .agg(
            F.sum(F.col("pass").cast("long")).alias("n_pass"),
            F.sum((~F.col("pass")).cast("long")).alias("n_fail"),
        )
        .orderBy("rule")
    )


# --------------------------------------------------------------------------
# b_weighted_sample — Efraimidis–Spirakis weighted sampling, hash-keyed
# --------------------------------------------------------------------------


def _weighted_sample_oracle() -> str:
    h = _hex4_to_int_sql("md5(CAST(doc_id AS VARCHAR))")
    return f"""
    WITH k AS (
      SELECT doc_id, lang, n_chars,
             pow(({h} + 0.5) / 65536.0, 1.0 / n_chars) AS key
      FROM documents
    )
    SELECT doc_id, lang, n_chars
    FROM k
    ORDER BY key DESC, doc_id
    LIMIT 200
    """


@query("b_weighted_sample", oracle=_weighted_sample_oracle())
def b_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis): each
    doc draws key = u^(1/w) with w = n_chars; the global top-k by key is
    an exact weighted sample — here length-weighted, the token-budget
    spend rule when sampling a pre-training mix.

    Determinism discipline: u comes from the 16-bit content hash (never
    rand()), so the sample is reproducible across engines, runs, and
    partitionings. ``pow`` is the one transcendental — cross-engine
    1-ulp drift cannot flip the top-k boundary unless two keys coincide
    to ~2^-52 relative, and EXACT key ties (duplicate content → same
    hash and weight) are broken by doc_id in the ordering.

    Scale shape: one scan computing the key, then a top-k — Spark
    executes orderBy+limit as per-partition partial top-k + a k-row
    final (TakeOrderedAndProject), so a 100 TB corpus never sorts
    globally; only k rows cross the wire."""
    docs = load_table(spark, sf_dir, "documents")
    h16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    key = F.pow((h16 + F.lit(0.5)) / 65536.0, F.lit(1.0) / F.col("n_chars"))
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("key"))
        .orderBy(F.desc("key"), "doc_id")
        .limit(200)
        .select("doc_id", "lang", "n_chars")
    )


# --------------------------------------------------------------------------
# f_winsorized_stats — rank-based winsorization, integer-exact
# --------------------------------------------------------------------------


@query(
    "f_winsorized_stats",
    oracle="""
    WITH r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    c AS (
      SELECT lang, n_chars,
             max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN n_chars END)
               OVER (PARTITION BY lang) AS lo,
             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN n_chars END)
               OVER (PARTITION BY lang) AS hi
      FROM r
    )
    SELECT lang,
           CAST(lo AS BIGINT) AS lo_cut,
           CAST(hi AS BIGINT) AS hi_cut,
           CAST(sum(least(greatest(n_chars, lo), hi)) AS BIGINT) AS winsorized_sum,
           CAST(sum(n_chars) AS BIGINT) AS raw_sum,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM c
    GROUP BY lang, lo, hi
    ORDER BY lang
    """,
)
def f_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization at the 5th/95th rank: clip each group's
    values to order-statistic cut points, report clipped vs raw sums —
    the outlier-robust aggregate for skewed length distributions.

    Determinism discipline: the cuts are RANK-based order statistics
    (value at row ceil(0.05·n)), not interpolated percentiles — cut
    points and clipped values stay integers, sums stay exact BIGINTs; the
    only double is the ceil(0.05·n) product, identical IEEE arithmetic
    on both engines.

    Scale shape: one shuffle on the group key; both cut points come from
    window aggregates over the SAME partitioning as the row_number — one
    sort per group partition, no self-join back onto the data. At
    unbounded group sizes the approx-percentile sketch replaces the
    exact rank (the a_median_percentiles / a_approx_sketches pairing)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wp = Window.partitionBy("lang")
    r = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    lo = F.max(
        F.when(F.col("rn") == F.ceil(0.05 * F.col("n")), F.col("n_chars"))
    ).over(wp)
    hi = F.max(
        F.when(F.col("rn") == F.ceil(0.95 * F.col("n")), F.col("n_chars"))
    ).over(wp)
    c = r.select("lang", "n_chars", lo.alias("lo"), hi.alias("hi"))
    clipped = F.least(F.greatest(F.col("n_chars"), F.col("lo")), F.col("hi"))
    return (
        c.groupBy("lang", "lo", "hi")
        .agg(
            F.sum(clipped).alias("winsorized_sum"),
            F.sum("n_chars").alias("raw_sum"),
            F.count("*").alias("n_docs"),
        )
        .select(
            "lang",
            F.col("lo").cast("long").alias("lo_cut"),
            F.col("hi").cast("long").alias("hi_cut"),
            "winsorized_sum",
            "raw_sum",
            "n_docs",
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# t_doc_perplexity — per-document cross-entropy under the corpus bigram LM
# --------------------------------------------------------------------------


@query(
    "t_doc_perplexity",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    bg AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM d, UNNEST(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2
    ),
    c2 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    nll AS (
      SELECT bg.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(-log2(CAST(c12 AS DOUBLE) / c1)), 4) AS avg_nll_bits
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      GROUP BY bg.doc_id
    )
    SELECT doc_id, n_bigrams, avg_nll_bits
    FROM nll
    ORDER BY avg_nll_bits DESC, doc_id
    LIMIT 20
    """,
)
def t_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy (bits/bigram) under the corpus's own
    bigram LM — the classic perplexity-filter signal: surprising docs
    score high, boilerplate scores low. Top-20 most-surprising docs.

    Determinism discipline: P(w2|w1)=c12/c1 is an exact-integer
    division; log2/avg drift (~1e-13, libm + sum order) is absorbed by
    round(·,4), and — critically — the top-k ORDERS BY THE ROUNDED value
    with a doc_id tiebreak, so duplicate documents (mathematically tied
    scores, possibly differing in the last ulp between engines) cannot
    flip the rank-20 boundary.

    Scale shape: the LM tables are vocabulary-bounded aggregates of one
    bigram pass (in-row higher-order transform, no self-join); scoring
    re-joins bigrams to the model on w1/w2 — both sides shuffle-keyed on
    the bigram, model side vocabulary²-bounded (AQE broadcasts it when
    small). One corpus scan feeds both the model and the scorer."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    bg = (
        docs.filter(F.size(ws) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - 1),
                    lambda i: F.struct(
                        F.element_at(ws, i).alias("w1"),
                        F.element_at(ws, i + 1).alias("w2"),
                    ),
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    nll = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(-F.log2(F.col("c12").cast("double") / F.col("c1"))), 4
            ).alias("avg_nll_bits"),
        )
    )
    return nll.orderBy(F.desc("avg_nll_bits"), "doc_id").limit(20)


# --------------------------------------------------------------------------
# a_robust_outliers — median/MAD outlier detection, exact in cents-space
# --------------------------------------------------------------------------


@query(
    "a_robust_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    m AS (SELECT event_type, median(cents) AS med FROM c GROUP BY event_type),
    d AS (
      SELECT c.event_type, c.cents, m.med, abs(c.cents - m.med) AS adev
      FROM c JOIN m USING (event_type)
    ),
    mad AS (SELECT event_type, median(adev) AS mad FROM d GROUP BY event_type)
    SELECT d.event_type,
           CAST(2 * max(d.med) AS BIGINT) AS med_cents_x2,
           CAST(4 * max(mad.mad) AS BIGINT) AS mad_cents_x4,
           CAST(sum(CASE WHEN d.adev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def a_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: |x − median| > 3·MAD — the
    median/MAD rule that, unlike mean/stddev z-scores, isn't dragged by
    the outliers it's hunting.

    Determinism discipline: all statistics run in INTEGER CENTS
    (round(value·100) — the repo's money rule). Median of integers
    interpolates at most to .5, MAD of those to .25 — every intermediate
    is an exactly-representable double with NO order-dependent sums, so
    both engines agree bit-for-bit and the ×2/×4 outputs are exact
    BIGINTs.

    Scale shape: two group-keyed exact medians (per-group value buffers —
    the approx_percentile sketch replaces them at unbounded group sizes,
    same pairing as a_median_percentiles) plus one broadcast-sized
    per-group stats join back onto the rows; a 100 TB fact pays two
    scans, no global sort."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    m = c.groupBy("event_type").agg(F.median("cents").alias("med"))
    d = c.join(m, "event_type").withColumn("adev", F.abs(F.col("cents") - F.col("med")))
    mad = d.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        d.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            (2 * F.max("med")).cast("long").alias("med_cents_x2"),
            (4 * F.max("mad")).cast("long").alias("mad_cents_x4"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# f_equidepth_histogram — exact equal-count buckets (ntile)
# --------------------------------------------------------------------------


@query(
    "f_equidepth_histogram",
    oracle="""
    WITH r AS (
      SELECT l_extendedprice AS v,
             ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bucket
      FROM lineitem
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n, min(v) AS lo, max(v) AS hi
    FROM r GROUP BY bucket ORDER BY bucket
    """,
)
def f_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equal-depth histogram (8 buckets) over line-item prices —
    the equi-DEPTH twin of f_histogram_width_bucket's fixed-width bins.

    Determinism discipline: the ntile ordering carries a full tiebreak
    (value, orderkey, linenumber), so bucket membership is a total-order
    function of the data; lo/hi are raw stored doubles (no arithmetic —
    identical bits on both engines).

    Scale shape: an unpartitioned ntile is a GLOBAL sort into one window
    partition — correct-but-serial, the exact-semantics member of its
    pair. At 100 TB the bucket CUTS come from approx_percentile (one
    pass, t-digest sketch) and rows bucket by comparison against the
    broadcast cuts; this query is the exactness baseline the sketch is
    judged against (same exact/approx pairing as a_median_percentiles
    vs a_approx_sketches)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    r = li.select(
        F.col("l_extendedprice").alias("v"), F.ntile(8).over(w).alias("bucket")
    )
    return (
        r.groupBy("bucket")
        .agg(F.count("*").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .orderBy("bucket")
    )
