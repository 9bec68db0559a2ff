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


# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession

_KANON_K = 45

_PSEUDO_SALT = "release-salt-2024"

@query(
    "p_pseudonymize_kanon",
    oracle=f"""
    WITH p AS (
      SELECT sha256('{_PSEUDO_SALT}:' || user_id) AS pseudo_id,
             event_type, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    g AS (
      SELECT event_type, day,
             CAST(count(DISTINCT pseudo_id) AS BIGINT) AS n_users,
             min(pseudo_id) AS sample_pseudo
      FROM p GROUP BY event_type, day
    )
    SELECT event_type, day, n_users, sample_pseudo
    FROM g WHERE n_users < {_KANON_K}
    ORDER BY event_type, day
    """,
)
def p_pseudonymize_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-hash pseudonymization + k-anonymity audit: replace user
    ids with sha256(salt:id) (stable joins remain possible, raw ids do
    not leave the pipeline), then report the (event_type, day) cells
    whose distinct-pseudonym count is below k=45 (_KANON_K) — the cells a
    release policy must suppress or generalize before publication.

    One narrow hash projection + one groupBy on the quasi-identifier
    pair; count(DISTINCT) carries partial sets map-side. The audit
    output is violation-sized (small by definition) and NATURALLY
    shrinks as data densifies — at sf0.1 every cell clears k=45 and the
    report is empty, which is the correct "safe to release" answer,
    not a missing result (the sf0.01 gate shows 6 violating cells).
    Salt rotation = full re-pseudonymization — a deliberate property."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        F.sha2(F.concat(F.lit(f"{_PSEUDO_SALT}:"), F.col("user_id").cast("string")), 256).alias("pseudo_id"),
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    )
    g = p.groupBy("event_type", "day").agg(
        F.count_distinct("pseudo_id").alias("n_users"),
        F.min("pseudo_id").alias("sample_pseudo"),
    )
    return g.filter(F.col("n_users") < _KANON_K).orderBy("event_type", "day")

@query(
    "p_fd_violation_check",
    oracle="""
    WITH fd AS (
      SELECT o_custkey, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_rhs,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lhs_keys,
           CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT) AS n_violating_keys,
           CAST(sum(n_rows) FILTER (WHERE n_rhs > 1) AS BIGINT) AS n_rows_in_violation,
           round(count(*) FILTER (WHERE n_rhs > 1) * 1.0 / count(*), 4) AS violation_rate
    FROM fd
    """,
)
def p_fd_violation_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: does ``o_custkey → o_orderpriority``
    hold? (It should NOT — customers place orders at many priorities;
    the non-zero violation summary is the point.) The data-quality
    primitive behind key discovery, denormalization safety checks, and
    'is this column derivable from that one' questions: group by the
    LHS, count distinct RHS, summarize keys where the count exceeds 1.

    One groupBy on the LHS with a partial-aggregated distinct count;
    the violation summary is a single-row reduce. At 100 TB the
    distinct-count per key is the memory knob — swap count_distinct for
    approx_count_distinct when the RHS cardinality per key can be huge
    (the audit needs 'more than one', not the exact number)."""
    orders = load_table(spark, sf_dir, "orders")
    fd = orders.groupBy("o_custkey").agg(
        F.count_distinct("o_orderpriority").alias("n_rhs"),
        F.count("*").alias("n_rows"),
    )
    viol = F.col("n_rhs") > 1
    return fd.agg(
        F.count("*").alias("n_lhs_keys"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias("n_violating_keys"),
        F.sum(F.when(viol, F.col("n_rows")).otherwise(0)).cast("long").alias("n_rows_in_violation"),
        F.round(F.sum(F.when(viol, 1).otherwise(0)) / F.count("*"), 4).alias("violation_rate"),
    )

@query(
    "p_referential_integrity_report",
    oracle="""
    SELECT 'orders.custkey->customer' AS relation,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child_rows,
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.orderkey->orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.partkey->part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_partkey NOT IN (SELECT p_partkey FROM part))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.suppkey->supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
                AS BIGINT)
    ORDER BY relation
    """,
)
def p_referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide referential-integrity sweep: every FK relation's
    child-row and orphan counts in ONE report — the generalization of
    the pipeline's per-table fk_split to a whole-catalog health check
    (expected all-zero orphans on this testdata; the REPORT shape is
    the operator).

    Each relation is an anti-join of the child table against the
    parent's distinct key projection — parent key sets broadcast when
    small, shuffle-semi otherwise (AQE's call, same as fk_split); the
    four relations share the lineitem scan via AQE stage reuse where
    pruning allows. Orphan counts reduce map-side; the report is
    4 rows."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")

    def rel(name, child, child_key, parent, parent_key):
        orphans = child.join(
            parent.withColumnRenamed(parent_key, child_key), child_key, "left_anti"
        )
        n = child.agg(F.count("*").alias("n_child_rows"))
        o = orphans.agg(F.count("*").alias("n_orphans"))
        return n.crossJoin(o).select(
            F.lit(name).alias("relation"), "n_child_rows", "n_orphans"
        )

    out = (
        rel("orders.custkey->customer", orders.select("o_custkey"), "o_custkey", cust, "c_custkey")
        .unionByName(rel("lineitem.orderkey->orders", li.select("l_orderkey"), "l_orderkey", orders.select("o_orderkey"), "o_orderkey"))
        .unionByName(rel("lineitem.partkey->part", li.select("l_partkey"), "l_partkey", part, "p_partkey"))
        .unionByName(rel("lineitem.suppkey->supplier", li.select("l_suppkey"), "l_suppkey", supp, "s_suppkey"))
    )
    return out.orderBy("relation")


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W

_LDIV_L = 4

@query(
    "p_l_diversity",
    oracle=f"""
    WITH t AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(least(floor(c_acctbal / 1000) + 6, 11) AS BIGINT) AS bal_band
      FROM customer
    ),
    g AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(count(*) AS BIGINT) AS group_size,
             CAST(count(DISTINCT bal_band) AS BIGINT) AS distinct_l
      FROM t GROUP BY c_mktsegment, c_nationkey
    ),
    ent AS (
      SELECT c_mktsegment, c_nationkey,
             round(-sum(p * ln(p)) + 0.0, 3) AS entropy_l
      FROM (
        SELECT c_mktsegment, c_nationkey,
               count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY c_mktsegment, c_nationkey) AS p
        FROM t GROUP BY c_mktsegment, c_nationkey, bal_band
      ) GROUP BY c_mktsegment, c_nationkey
    )
    SELECT g.c_mktsegment, g.c_nationkey, g.group_size, g.distinct_l,
           ent.entropy_l,
           CAST(g.distinct_l < {_LDIV_L} AS BIGINT) AS below_l
    FROM g JOIN ent USING (c_mktsegment, c_nationkey)
    ORDER BY g.c_mktsegment, g.c_nationkey
    """,
)
def p_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over customer quasi-identifier groups
    (market segment x nation): per group, the number of DISTINCT
    sensitive values (account-balance band) and the entropy
    l-diversity, plus a below-threshold flag (l = {L}). k-anonymity
    (the existing gate) bounds group SIZE; l-diversity additionally
    requires the sensitive attribute to be varied WITHIN each group —
    a k-anonymous group whose members all share one balance band still
    leaks. The full per-group report (not violations-only) stays
    non-empty and comparable at every SF — denser data raises l toward
    the band count, which the report shows rather than hides.

    Scale shape: one (QI, sensitive) groupBy carries partial counts
    map-side; distinct-l and the entropy both derive from that
    QI-group-bounded frame (groups x bands rows, tiny). The window in
    the entropy step partitions by QI over that compact frame only.
    Balance bands are integer floors — no float boundary ambiguity
    cross-engine; entropy rounded to 3.
    """.format(L=_LDIV_L)
    cust = load_table(spark, sf_dir, "customer")
    t = cust.select(
        "c_mktsegment",
        "c_nationkey",
        F.least(
            F.floor(F.col("c_acctbal") / 1000) + 6, F.lit(11)
        ).cast("long").alias("bal_band"),
    )
    per_band = t.groupBy("c_mktsegment", "c_nationkey", "bal_band").agg(
        F.count("*").alias("n")
    )
    grp_w = W.partitionBy("c_mktsegment", "c_nationkey")
    with_p = per_band.withColumn("p", F.col("n") / F.sum("n").over(grp_w))
    return (
        with_p.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.sum("n").alias("group_size"),
            F.count("*").alias("distinct_l"),
            # + 0.0 folds IEEE -0.0 (single-band groups) to +0.0 on both engines
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))) + 0.0, 3).alias("entropy_l"),
        )
        .select(
            "c_mktsegment",
            "c_nationkey",
            "group_size",
            "distinct_l",
            "entropy_l",
            (F.col("distinct_l") < _LDIV_L).cast("long").alias("below_l"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )

@query(
    "p_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT o_custkey AS key,
             o_orderdate AS chg_ts, o_orderkey AS chg_seq,
             CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
             CAST(round(o_totalprice * 100) AS BIGINT) AS val_cents
      FROM orders
    ),
    latest AS (
      SELECT key, op, val_cents, chg_ts,
             CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n_versions,
             row_number() OVER (
               PARTITION BY key ORDER BY chg_ts DESC, chg_seq DESC
             ) AS rn
      FROM log
    )
    SELECT key, val_cents, chg_ts AS last_ts, n_versions
    FROM latest WHERE rn = 1 AND op <> 'D'
    ORDER BY key
    """,
)
def p_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: collapse an out-of-order change log
    (upserts + delete tombstones) to current state — latest change per
    key wins by (timestamp, sequence); a trailing 'D' removes the key
    entirely. The orders table plays the change log: each order is a
    change to its customer's record, finalized ('F') status plays the
    tombstone. This is the Debezium/stream-compaction pattern; the
    keep-LAST dedup gate (p_keep_last_dedup, reference parity
    etl/transform.py) is the op-code-free special case.

    Scale shape: ONE shuffle on the key partitions the log; the
    row_number and the per-key version count share that single window
    sort (same partition key, compatible ordering). Tombstoned keys
    drop before any downstream join. At 100 TB the log is
    date-partitioned so the scan prunes to the compaction horizon, and
    the same plan runs incrementally under Structured Streaming with
    applyInPandasWithState (st_stateful_user_totals shows the
    runtime). Money kept in integer cents; (chg_ts, chg_seq) is a
    total order per key so survivor choice is engine-independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("chg_ts"),
        F.col("o_orderkey").alias("chg_seq"),
        F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("val_cents"),
    )
    w = W.partitionBy("key").orderBy(F.desc("chg_ts"), F.desc("chg_seq"))
    latest = log.select(
        "key",
        "op",
        "val_cents",
        "chg_ts",
        F.count("*").over(W.partitionBy("key")).alias("n_versions"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        latest.filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("key", "val_cents", F.col("chg_ts").alias("last_ts"), "n_versions")
        .orderBy("key")
    )

@query(
    "p_table_checksum",
    oracle="""
    WITH mh0 AS (
      SELECT o_orderstatus,
             md5(o_orderkey || '|' || o_custkey || '|' ||
               CAST(round(o_totalprice * 100) AS BIGINT) || '|' || o_orderpriority) AS mh
      FROM orders
    ),
    h AS (
      SELECT o_orderstatus,
             CAST(instr('0123456789abcdef', substring(mh, 1, 1)) - 1 AS BIGINT) * 68719476736
             + CAST(instr('0123456789abcdef', substring(mh, 2, 1)) - 1 AS BIGINT) * 4294967296
             + CAST(instr('0123456789abcdef', substring(mh, 3, 1)) - 1 AS BIGINT) * 268435456
             + CAST(instr('0123456789abcdef', substring(mh, 4, 1)) - 1 AS BIGINT) * 16777216
             + CAST(instr('0123456789abcdef', substring(mh, 5, 1)) - 1 AS BIGINT) * 1048576
             + CAST(instr('0123456789abcdef', substring(mh, 6, 1)) - 1 AS BIGINT) * 65536
             + CAST(instr('0123456789abcdef', substring(mh, 7, 1)) - 1 AS BIGINT) * 4096
             + CAST(instr('0123456789abcdef', substring(mh, 8, 1)) - 1 AS BIGINT) * 256
             + CAST(instr('0123456789abcdef', substring(mh, 9, 1)) - 1 AS BIGINT) * 16
             + CAST(instr('0123456789abcdef', substring(mh, 10, 1)) - 1 AS BIGINT) * 1 AS rh
      FROM mh0
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(rh) AS BIGINT) AS checksum
    FROM h GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def p_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum per partition group (status):
    each row hashes its business columns to a 40-bit integer (md5
    prefix) and the checksum is the group SUM — two systems holding
    the same rows produce the same checksum regardless of row order or
    physical layout. This is the cross-system reconciliation primitive
    behind "did the migration/replica drop or mutate rows" (the
    reference's load-parity concern, etl/load.py, generalized from
    row counts to content).

    Scale shape: embarrassingly parallel — one narrow hash projection,
    one group aggregation with map-side partials; no joins, no
    windows. 40-bit row hashes keep the BIGINT sum exact to ~8e12 rows
    per group (collision-vs-overflow tradeoff documented; production
    widens to two parallel 40-bit lanes for 80 bits). Money enters the
    hash as integer cents — the q10 lesson: floats never feed a
    cross-engine hash.
    """
    orders = load_table(spark, sf_dir, "orders")
    payload = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.col("o_orderpriority"),
    )
    rh = F.conv(F.substring(F.md5(payload), 1, 10), 16, 10).cast("long")
    return (
        orders.select("o_orderstatus", rh.alias("rh"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_rows"), F.sum("rh").alias("checksum"))
        .orderBy("o_orderstatus")
    )

@query(
    "p_volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, day, n,
             CAST(median(n) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
             ) AS DOUBLE) AS med7,
             count(*) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
             ) AS n_hist
      FROM daily
    )
    SELECT event_type, day, n,
           CAST(round(med7) AS BIGINT) AS median7,
           round(n / med7 - 1, 3) AS deviation
    FROM med
    WHERE n_hist >= 7 AND (n * 10 > med7 * 13 OR n * 10 < med7 * 7)
    ORDER BY event_type, day
    """,
)
def p_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ingest-volume anomaly report: each (event type, day)'s
    row count against the trailing-7-day median; days deviating more
    than ±30% are flagged — the completeness monitor that catches a
    dropped upstream partition or a double-delivery before any
    consumer does (the operational twin of a_ks_drift: this watches
    VOLUME, that watches distribution).

    Scale shape: the fact collapses to (type, day) integer counts
    first; the trailing-median window runs over that days-sized frame.
    The ±30% gate is evaluated as pure integer cross-multiplication
    (n·10 vs med·13) — the 7-point median is the sorted frame's middle
    element — integer-exact on both engines — so the compare never
    touches float rounding; only
    the reported deviation is float, rounded. Warm-up days (fewer than
    7 trailing points) are excluded rather than compared to a
    half-formed baseline. Like p_pseudonymize_kanon, the report
    NATURALLY empties as data densifies (sf0.1's daily counts are
    stable within ±30% — the correct "volume healthy" answer; sf0.01
    shows 3 flagged days, sf0.001 shows 55).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    # Spark disallows median() over a frame; an exact equivalent for the
    # bounded 7-row window is the sorted frame's middle element (odd
    # count -> integer-exact, same value DuckDB's median returns).
    med = daily.select(
        "event_type",
        "day",
        "n",
        F.sort_array(F.collect_list("n").over(w))[3].cast("double").alias("med7"),
        F.count("*").over(w).alias("n_hist"),
    )
    return (
        med.filter(
            (F.col("n_hist") >= 7)
            & (
                (F.col("n") * 10 > F.col("med7") * 13)
                | (F.col("n") * 10 < F.col("med7") * 7)
            )
        )
        .select(
            "event_type",
            "day",
            "n",
            F.round("med7").cast("long").alias("median7"),
            F.round(F.col("n") / F.col("med7") - 1, 3).alias("deviation"),
        )
        .orderBy("event_type", "day")
    )


# ===========================================================================
# section consolidated from plans/round6d_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, functions as F

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


# ===========================================================================
# section consolidated from plans/round6g_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

_STALE_HOURS = 24.0

@query(
    "p_freshness_report",
    oracle=f"""
    WITH feeds AS (
      SELECT event_type AS feed, max(ts) AS last_ts FROM events GROUP BY 1
    ),
    mx AS (SELECT max(last_ts) AS global_max FROM feeds)
    SELECT feed, last_ts,
           round(CAST(date_diff('second', last_ts, global_max) AS DOUBLE)
                 / 3600.0, 2) AS lag_hours,
           CAST(CASE WHEN date_diff('second', last_ts, global_max)
                          > {_STALE_HOURS} * 3600 THEN 1 ELSE 0 END AS INT)
             AS is_stale
    FROM feeds, mx
    ORDER BY feed
    """,
)
def p_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed freshness: per feed (event_type here; a source/table name in
    production), the last arrival timestamp, its lag behind the newest
    data anywhere, and a >24 h staleness flag — the operational
    monitoring twin of p_volume_anomaly ("did feed X silently stop?").

    Scale shape: one map-side-combined max() per feed (a feeds-sized
    frame), the global max as a 1-row aggregate broadcast into the
    compare — no data-sized shuffle at all beyond the partial-agg
    exchange. Lag math is whole-second precision on both engines
    (Spark unix_timestamp truncates to seconds; the oracle's
    date_diff('second') counts the same boundaries) before the one
    rounded divide.
    """
    ev = load_table(spark, sf_dir, "events")
    feeds = ev.groupBy(F.col("event_type").alias("feed")).agg(
        F.max("ts").alias("last_ts")
    )
    mx = feeds.agg(F.max("last_ts").alias("global_max"))
    lag_s = F.unix_timestamp("global_max") - F.unix_timestamp("last_ts")
    return (
        feeds.crossJoin(F.broadcast(mx))
        .select(
            "feed",
            "last_ts",
            F.round(lag_s.cast("double") / 3600.0, 2).alias("lag_hours"),
            (lag_s > _STALE_HOURS * 3600).cast("int").alias("is_stale"),
        )
        .orderBy("feed")
    )


# ===========================================================================
# section consolidated from plans/round6l_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

_TARGET_ROWS_PER_TASK = 2_000_000

_MIN_PARTITIONS = 32

_SKEW_KEYS = (
    ("events", "user_id"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_suppkey"),
)

def _skew_oracle() -> str:
    selects = []
    for table, col in _SKEW_KEYS:
        selects.append(
            f"""
    SELECT '{table}.{col}' AS key_col,
           CAST(max(nn) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_key_rows,
           CAST(max(CASE WHEN rn = CAST(ceil(0.99 * nk) AS BIGINT)
                         THEN c END) AS BIGINT) AS p99_key_rows,
           CAST(greatest(ceil(max(nn) * 1.0 / {_TARGET_ROWS_PER_TASK}),
                         {_MIN_PARTITIONS}) AS BIGINT)
             AS recommended_partitions,
           CAST(greatest(ceil(max(c) * 1.0 / {_TARGET_ROWS_PER_TASK}), 1)
                AS BIGINT) AS hot_key_salt_factor
    FROM (
      SELECT c, sum(c) OVER () AS nn, count(*) OVER () AS nk,
             row_number() OVER (ORDER BY c, k) AS rn
      FROM (SELECT {col} AS k, count(*) AS c FROM {table} GROUP BY {col})
    )"""
        )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY key_col"
    )

@query("p_partition_skew_planner", oracle=_skew_oracle())
def p_partition_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew planner: for each candidate shuffle key, the
    measured key-frequency profile — row count, key cardinality,
    hottest-key row count, exact p99 key size — and the DERIVED scale
    knobs: recommended shuffle-partition count
    (ceil(rows / {2_000_000}), floored at {32}) and the salting factor
    the hottest key needs (ceil(max_key_rows / target)) — 1 means "no
    salting required". This turns SCALING.md's skew prose into a
    measured report: run it on the real corpus and the dials fall out
    (j_salted_skew_join and AQE skew-join consume exactly these
    numbers).

    Scale shape: per key, ONE map-side-combined count groupBy to the
    key-frequency frame; the profile (totals, max, exact p99 by rank
    pick) runs in windows over that key-sized frame — the window
    orders key COUNTS, never rows; the knob arithmetic is row-local.
    At 10^9-key cardinality the rank window would switch to the
    distributed row-number (operators/cumsum.py) — same report.
    """
    outs = []
    for table, col in _SKEW_KEYS:
        df = load_table(spark, sf_dir, table)
        kc = df.groupBy(F.col(col).alias("k")).agg(F.count("*").alias("c"))
        wtot = W.partitionBy()
        prof = kc.select(
            "c",
            F.sum("c").over(wtot).alias("nn"),
            F.count("*").over(wtot).alias("nk"),
            F.row_number().over(W.orderBy("c", "k")).alias("rn"),
        )
        outs.append(
            prof.agg(
                F.lit(f"{table}.{col}").alias("key_col"),
                F.max("nn").cast("long").alias("n_rows"),
                F.count("*").cast("long").alias("n_keys"),
                F.max("c").cast("long").alias("max_key_rows"),
                F.max(
                    F.when(
                        F.col("rn")
                        == F.ceil(0.99 * F.col("nk")).cast("long"),
                        F.col("c"),
                    )
                ).cast("long").alias("p99_key_rows"),
                F.greatest(
                    F.ceil(F.max("nn") * 1.0 / _TARGET_ROWS_PER_TASK),
                    F.lit(_MIN_PARTITIONS).cast("long"),
                ).cast("long").alias("recommended_partitions"),
                F.greatest(
                    F.ceil(F.max("c") * 1.0 / _TARGET_ROWS_PER_TASK),
                    F.lit(1).cast("long"),
                ).cast("long").alias("hot_key_salt_factor"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("key_col")
