"""Round-4 operator additions.

Corpus curation: benchmark decontamination (check + apply), PII
detection/redaction, URL parse + canonicalization dedup, SemDeDup-style
centroid pruning, DSIR-style importance weights, exact
repeated-substring report. Monitoring: KS and PSI distribution drift,
rolling-window z-score anomalies, period-over-period comparison,
functional-dependency audit, bootstrap confidence intervals,
k-anonymity reporting. Time series: multi-resolution time-bucket
rollup, EWMA smoothing. Joins/graph: time-band join, triangle counting,
k-core decomposition, last-touch attribution. Retrieval: cosine range
search. Evaluation: LSH recall vs exact-Jaccard truth, ANN recall@k of
IVF vs exact KNN — the production paths measured against their exact
twins.

All are Spark-first DataFrame/SQL compositions with DuckDB oracles;
each docstring carries the 100 TB design note (shuffle keys, candidate
bounding, broadcast sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

# ---------------------------------------------------------------------------
# Benchmark decontamination (the train/eval overlap scrub every LLM data
# pipeline runs before training: any train document sharing enough
# n-grams with an eval/benchmark document is flagged and dropped).
# ---------------------------------------------------------------------------

_EVAL_MOD = 13  # doc_id % 13 == 0 plays the held-out benchmark set
_CONTAM_MIN_RATIO = 0.15

_DUCK_CONTAM = f"""
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shingles AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    ),
    eval_sh AS (
      SELECT DISTINCT sh FROM shingles WHERE doc_id % {_EVAL_MOD} = 0
    ),
    train AS (SELECT * FROM shingles WHERE doc_id % {_EVAL_MOD} <> 0),
    sized AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM train GROUP BY doc_id
    ),
    contam AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_contam
      FROM train t WHERE t.sh IN (SELECT sh FROM eval_sh)
      GROUP BY t.doc_id
    ),
    scored AS (
      SELECT s.doc_id, s.n_shingles, coalesce(c.n_contam, 0) AS n_contam,
             round(coalesce(c.n_contam, 0) * 1.0 / s.n_shingles, 4) AS contam_ratio
      FROM sized s LEFT JOIN contam c ON c.doc_id = s.doc_id
    )
"""


@query(
    "t_contamination_check",
    oracle=f"""
    WITH {_DUCK_CONTAM}
    SELECT doc_id, n_shingles, n_contam, contam_ratio
    FROM scored
    WHERE contam_ratio >= {_CONTAM_MIN_RATIO}
    ORDER BY doc_id
    """,
)
def t_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: per train document, the fraction of
    its distinct 3-gram shingles that also occur in ANY benchmark
    document (here: ``doc_id % 13 == 0`` plays the eval split); rows at
    or above the flag threshold.

    Single-pipeline scale shape (the jaccard-rework discipline): ONE
    shingle derivation, a per-shingle "appears in any benchmark doc"
    flag as a window max over the shingle key, then one per-doc groupBy
    that counts total and flagged shingles together — two shuffles
    total (shingle window + doc groupBy), one corpus scan, no
    semi-join and no separate benchmark-side derivation. The same
    hot-shingle doc-frequency cap as jaccard_pairs applies in
    production (a stop-shingle would mark everything contaminated);
    the gate runs uncapped to stay exactly SQL-expressible.
    """
    from ..operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs)  # (id, sh) distinct
    is_eval = F.col("id") % _EVAL_MOD == 0
    marked = sh.withColumn(
        "has_eval",
        F.max(is_eval.cast("int")).over(W.partitionBy("sh")),
    )
    scored = (
        marked.filter(~is_eval)
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("has_eval").alias("n_contam"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "n_shingles",
            "n_contam",
            F.round(F.col("n_contam") / F.col("n_shingles"), 4).alias("contam_ratio"),
        )
    )
    return scored.filter(F.col("contam_ratio") >= _CONTAM_MIN_RATIO).orderBy("doc_id")


@query(
    "d_decontaminate_apply",
    oracle=f"""
    WITH {_DUCK_CONTAM},
    flagged AS (
      SELECT doc_id FROM scored WHERE contam_ratio >= {_CONTAM_MIN_RATIO}
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(count(*) FILTER (WHERE d.doc_id IN (SELECT doc_id FROM flagged))
                AS BIGINT) AS n_dropped
    FROM documents d
    WHERE d.doc_id % {_EVAL_MOD} <> 0
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def d_decontaminate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination applied: per source, how many train documents
    exist and how many the contamination flag removes — the accounting
    report a data pipeline emits alongside the scrubbed corpus.

    The flagged set is contamination-sized (small); joining it back to
    the corpus is a broadcast-able semi/anti pattern, so the apply adds
    no data-sized shuffle beyond the check itself (which uses the same
    single-pipeline window shape as t_contamination_check)."""
    from ..operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs)
    is_eval = F.col("id") % _EVAL_MOD == 0
    marked = sh.withColumn(
        "has_eval", F.max(is_eval.cast("int")).over(W.partitionBy("sh"))
    )
    flagged = (
        marked.filter(~is_eval)
        .groupBy("id")
        .agg(F.count("*").alias("n_shingles"), F.sum("has_eval").alias("n_contam"))
        .filter(F.col("n_contam") / F.col("n_shingles") >= _CONTAM_MIN_RATIO)
        .select(F.col("id").alias("doc_id"))
    )
    train_docs = docs.filter(~(F.col("doc_id") % _EVAL_MOD == 0))
    dropped = train_docs.join(flagged, "doc_id", "left_semi")
    return (
        train_docs.groupBy("source")
        .agg(F.count("*").alias("n_train"))
        .join(
            dropped.groupBy("source").agg(F.count("*").alias("n_dropped")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_train",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (regex surface; synthetic PII is injected
# deterministically because the testdata corpus contains none).
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

_DUCK_PII_TEXT = """
    pii AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || doc_id || '@mail.example.com now'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' from 10.0.' || (doc_id % 256) || '.7'
                     ELSE '' END AS t
      FROM documents
    )
"""


@query(
    "t_pii_detect",
    oracle=f"""
    WITH {_DUCK_PII_TEXT}
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_IP_RE}', '<IP>', 'g')) AS redacted_md5
    FROM pii
    WHERE len(regexp_extract_all(t, '{_EMAIL_RE}')) > 0
       OR len(regexp_extract_all(t, '{_IP_RE}')) > 0
    ORDER BY doc_id
    """,
)
def t_pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus: per-document counts of
    email / IPv4 matches and the md5 of the redacted text (placeholders
    substituted). The corpus is synthetic, so deterministic fake PII is
    appended first — the REGEX/REDACTION machinery is the operator under
    test, and both engines see identical input bytes.

    Scale shape: embarrassingly parallel narrow transform — one scan, no
    shuffle (the ORDER BY is the gate's determinism sort). Regexes stay
    in the portable subset (char classes, bounded repeats) so Java and
    RE2 agree; production pattern packs (SSNs, IBANs, phone formats)
    drop into the same two-regexp pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
    )
    with_t = docs.select("doc_id", t.alias("t"))
    n_emails = F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all("t", F.lit(_IP_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return (
        with_t.select(
            "doc_id",
            n_emails.cast("long").alias("n_emails"),
            n_ips.cast("long").alias("n_ips"),
            F.md5(redacted).alias("redacted_md5"),
        )
        .filter((F.col("n_emails") > 0) | (F.col("n_ips") > 0))
        .orderBy("doc_id")
    )


@query(
    "f_url_parse",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || doc_id
             || '?lang=' || lang || '&v=2' AS url
      FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]*)', 1) AS lang_param
    FROM urls ORDER BY doc_id
    """,
)
def f_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction: build a deterministic URL per document,
    then recover host / path / one query parameter with Spark's native
    ``parse_url`` (JVM, codegen'd — the crawl-processing staple for
    domain-level grouping and robots/quality policies). The oracle
    re-derives the same components with portable regexes.

    Narrow one-scan transform; at crawl scale the host column feeds a
    domain groupBy whose skew (a few mega-domains) is the usual salting
    candidate."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Time-series: multi-resolution rollup, EWMA smoothing, rolling anomaly
# ---------------------------------------------------------------------------


@query(
    "ts_time_bucket_rollup",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY event_type, ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
    HAVING date_trunc('day', ts) IS NOT NULL
    ORDER BY event_type, day, hour NULLS FIRST
    """,
)
def ts_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution time-bucket rollup: per event
    type, hourly AND daily aggregates from ONE pass using a partial
    ROLLUP over (day, hour) — the continuous-aggregate maintenance shape
    (TimescaleDB's time_bucket rollups, Druid's granularity trees)
    expressed as a single grouping-sets aggregate instead of two jobs.

    Scale shape: grouping-sets expand each input row once per grouping
    (2x here) BEFORE the shuffle, and partial aggregation compacts them
    map-side, so the shuffle carries bucket-count rows, not data rows.
    The per-type day/hour key space is bounded (time is); no skew
    hazard. Money-style exact integer cents keep the sum cross-engine
    deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    hour = F.date_trunc("hour", "ts")
    with_b = ev.select(
        "event_type", day.alias("day"), hour.alias("hour"),
        F.round(F.col("value") * 100).alias("v_cents"),
    )
    rolled = (
        with_b.rollup("event_type", "day", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("v_cents").cast("long").alias("value_cents"),
        )
        # partial rollup: keep (type, day, hour) and (type, day) levels;
        # drop (type) and () which the oracle's GROUP BY event_type,
        # ROLLUP(day, hour) never produces
        .filter(F.col("event_type").isNotNull() & F.col("day").isNotNull())
    )
    return rolled.select(
        "event_type", "day", "hour", "n_events", "value_cents"
    ).orderBy("event_type", "day", F.col("hour").asc_nulls_first())


_EWMA_ALPHA = 0.5
_EWMA_SPAN = 8  # rows of history (current + 7 preceding)


@query(
    "ts_ewma",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 40
    )
    SELECT a.user_id, a.event_id,
           round(sum(b.value * power({_EWMA_ALPHA}, a.rn - b.rn))
                 / sum(power({_EWMA_ALPHA}, a.rn - b.rn)), 4) AS ewma
    FROM r a JOIN r b
      ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - {_EWMA_SPAN - 1} AND a.rn
    GROUP BY a.user_id, a.event_id
    ORDER BY a.user_id, a.event_id
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (alpha=0.5 over
    the trailing 8 observations) — the smoothing baseline for metric
    dashboards and drift monitors.

    Expressed as a bounded band self-join on the per-user row number
    (|rn_a - rn_b| < span) + a weighted aggregate: each row joins at
    most ``span`` partners, so the join output is O(n * span) — linear,
    co-partitioned on user_id, no window-frame float recursion and no
    pow() overflow (weights are always in [alpha^7, 1]). The same rows
    could come from a collect_list window + higher-order functions;
    the band join keeps every term a flat column expression, which both
    engines sum in the same per-group order after rounding."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    r = ev.select(
        "user_id", "event_id", "value",
        F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id")).alias("rn"),
    )
    a, b = r.alias("a"), r.alias("b")
    w = F.pow(F.lit(_EWMA_ALPHA), F.col("a.rn") - F.col("b.rn"))
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & F.col("b.rn").between(F.col("a.rn") - (_EWMA_SPAN - 1), F.col("a.rn")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"), F.col("a.event_id").alias("event_id"))
        .agg(F.round(F.sum(F.col("b.value") * w) / F.sum(w), 4).alias("ewma"))
        .orderBy("user_id", "event_id")
    )


@query(
    "ts_rolling_zscore_anomaly",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sd,
             count(*) OVER w AS n_hist
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, round(value, 2) AS value,
           round((value - mu) / sd, 3) AS zscore
    FROM s
    WHERE n_hist >= 10 AND sd > 0.001 AND abs(round((value - mu) / sd, 3)) > 3.0
    ORDER BY user_id, event_id
    """,
)
def ts_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: flag events whose value is more
    than 3 sigma from the TRAILING 20-observation mean/stddev of the
    same user (frame excludes the current row, so the anomaly does not
    contaminate its own baseline; warm-up rows with <10 history are
    skipped).

    One shuffle on user_id + an in-partition sort — the same cost shape
    as any per-key window; at 100 TB the time axis is the partition-
    internal sort, never a global one. The sd floor avoids near-constant
    windows where a zero-variance division would amplify float noise
    into flag flips; thresholding on the ROUNDED z pins the cross-engine
    boundary."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    s = ev.select(
        "user_id", "event_id", "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n_hist"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 3)
    return (
        s.filter((F.col("n_hist") >= 10) & (F.col("sd") > 0.001) & (F.abs(z) > 3.0))
        .select("user_id", "event_id", F.round("value", 2).alias("value"), z.alias("zscore"))
        .orderBy("user_id", "event_id")
    )


@query(
    "j_band_join",
    oracle="""
    SELECT e.event_id, CAST(count(c.event_id) AS BIGINT) AS n_nearby_clicks
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND c.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    ORDER BY e.event_id
    """,
)
def j_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-band join: for every error event, how many clicks the same
    user made within +/-5 minutes — the incident-context join (what was
    the user doing around the failure?).

    Scale shape: a naive theta-join on the time inequality explodes; the
    engine form buckets both sides into 5-minute epochs and joins on
    (user_id, bucket) for the bucket and its two neighbors — every true
    +/-5 min pair falls in one of those three bucket alignments, so the
    equi-join bounds candidates to per-bucket volumes and the exact
    BETWEEN predicate filters the few false candidates. One shuffle
    on the composite key, no range explosion; skewed users salt like
    any hot key."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / F.lit(300)).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"), bucket.alias("b")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"), bucket.alias("cb"),
    )
    # candidate generation: click bucket must be error bucket +/- 1
    shifted = errors.withColumn("nb", F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)))
    joined = shifted.join(
        clicks,
        (F.col("e_user") == F.col("c_user")) & (F.col("nb") == F.col("cb")),
        "left",
    ).filter(
        F.col("c_ts").isNull()
        | F.col("c_ts").between(
            F.col("e_ts") - F.expr("INTERVAL 5 MINUTES"),
            F.col("e_ts") + F.expr("INTERVAL 5 MINUTES"),
        )
    )
    return (
        joined.groupBy("event_id")
        .agg(F.count("c_id").alias("n_nearby_clicks"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Graph: triangle counting on the strongest co-supply edges
# ---------------------------------------------------------------------------

_TRI_TOP_EDGES = 500


@query(
    "g_triangle_count",
    oracle=f"""
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    w AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS c
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    e AS (
      SELECT s1, s2 FROM (
        SELECT s1, s2, row_number() OVER (ORDER BY c DESC, s1, s2) AS rn FROM w
      ) WHERE rn <= {_TRI_TOP_EDGES}
    ),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM e e1
      JOIN e e2 ON e2.s1 = e1.s2
      JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    ),
    pern AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT node, n_triangles FROM pern
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
)
def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the supplier co-supply graph
    (strongest top-500-by-shared-part-count edges, oriented s1<s2) — the
    clustering/community-density primitive (triangle-dense nodes sit in
    tight supplier clusters; the same join shape backs clustering
    coefficients and truss decomposition).

    Scale shape: the standard compact-forward algorithm — edges oriented
    by id so each triangle is generated EXACTLY once by a two-hop join
    plus a closing-edge equi-join (no permutation blowup, no cartesian).
    Cost is sum over nodes of deg^2 on the ORIENTED graph; orienting
    low-id-first caps the quadratic term at the max oriented out-degree,
    and the top-N edge selection is the density guard (in production:
    a weight threshold; top-N here keeps the gate SF-independent). Three
    shuffles total (edge build, two-hop, close).

    Pair-generation strategy is MEASURED, not assumed: the per-part
    supplier self-join (2.44 s at sf0.1) beats the
    collect_set + nested-higher-order pair-explosion alternative
    (4.23 s, identical 499,500-pair output) — wide per-key arrays
    serialize/explode worse than the co-partitioned join, so the join
    stays.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    # Same pair-build widening as g_kcore_decomposition (they share
    # this exact stage): ~25k (p,s) rows per task keeps each task's
    # map-side partial-agg hash over distinct (s1,s2) pairs in memory
    # (measured at 10x: 6.2 GB spill -> 0); the self-join reuses the
    # co-partitioning, so the only added cost is one shuffle of the
    # small distinct projection. Sized off the CHEAP parquet row count
    # (metadata-only; upper-bounds the distinct row count — an
    # overestimate only adds cheap tasks, never spill).
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_pair_tasks = min(4096, max(shuffle_parts, li.count() // 25_000))
    ps = ps.repartition(n_pair_tasks, "p")
    a, b = ps.alias("a"), ps.alias("b")
    w = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").alias("c"))
    )
    e = (
        w.withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("c").desc(), "s1", "s2")),
        )
        .filter(F.col("rn") <= _TRI_TOP_EDGES)
        .select("s1", "s2")
    )
    # the edge list feeds THREE join sides; without truncation the
    # part-pair derivation (the expensive part) is planned 3x. The frame
    # is bounded at _TRI_TOP_EDGES rows — eager checkpoint is ~free and
    # collapses the triangle plan to the three closing joins (same
    # discipline as connected_components / pagerank final frames).
    e = e.localCheckpoint(eager=True)
    from ..operators.graph import triangle_counts

    return (
        triangle_counts(e.select(F.col("s1").alias("src"), F.col("s2").alias("dst")))
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Deterministic bootstrap confidence interval
# ---------------------------------------------------------------------------

_BOOT_B = 16


@query(
    "b_bootstrap_ci",
    oracle=f"""
    WITH reps AS (SELECT UNNEST(range(0, {_BOOT_B})) AS b),
    members AS (
      SELECT r.b, o.o_totalprice
      FROM orders o CROSS JOIN reps r
      WHERE substr(md5(o.o_orderkey || ':' || r.b), 1, 1)
            IN ('0','1','2','3','4','5','6','7')
    ),
    means AS (
      SELECT b, round(avg(o_totalprice), 2) AS m FROM members GROUP BY b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_resamples,
           round(min(m), 2) AS ci_low,
           round(median(m), 2) AS ci_median,
           round(max(m), 2) AS ci_high
    FROM means
    """,
)
def b_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order value — the
    uncertainty companion every pipeline metric report should carry.
    Half-sampling (m-out-of-n without replacement) bootstrap: B=16
    deterministic resamples, membership decided by a content hash of
    (order key, resample index) — NEVER rand(), so the report is
    reproducible across runs, engines, and retries. The resample-mean
    spread (min/median/max over B) is the interval.

    Scale shape: the cross join with the B-row resample table multiplies
    the scan B-fold BEFORE partial aggregation, but each output row
    reduces map-side to B running sums — the shuffle carries B rows. At
    100 TB the multiplier is the knob: compute all B sums in ONE pass
    via B conditional aggregates if the B-fold scan cost bites; the
    per-resample means are order-insensitive after round(2) because the
    summand magnitudes keep the float ulp far below the rounding grain.
    """
    orders = load_table(spark, sf_dir, "orders")
    reps = spark.range(_BOOT_B).select(F.col("id").alias("b"))
    members = orders.crossJoin(reps).filter(
        F.substring(
            F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":"), F.col("b").cast("string"))),
            1, 1,
        ).isin(*"01234567")
    )
    means = members.groupBy("b").agg(F.round(F.avg("o_totalprice"), 2).alias("m"))
    return means.agg(
        F.count("*").alias("n_resamples"),
        F.round(F.min("m"), 2).alias("ci_low"),
        F.round(F.median("m"), 2).alias("ci_median"),
        F.round(F.max("m"), 2).alias("ci_high"),
    )


# ---------------------------------------------------------------------------
# Embedding range search (cosine threshold against a query set)
# ---------------------------------------------------------------------------


@query(
    "e_range_search",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 50),
    sims AS (
      SELECT q.query_id, e.vec_id AS match_id,
             round(
               list_sum(list_transform(range(1, len(q.qe) + 1),
                 i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(q.qe) + 1),
                    i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
               4) AS cos_r4
      FROM q, embeddings e
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, match_id, cos_r4
    FROM sims WHERE cos_r4 >= 0.42
    ORDER BY query_id, match_id
    """,
)
def e_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE search: every corpus vector within a similarity
    radius of each query (threshold 0.42 — sized to this synthetic
    corpus, whose max off-diagonal cosine is ~0.51) — the retrieval mode dedup and
    recall evaluation need where top-k is wrong (you want ALL matches
    above the bar, however many).

    Exact baseline shape: broadcast the bounded query set, one corpus
    scan, JVM-side higher-order dot products, filter on the ROUNDED
    cosine so the radius boundary cannot flip between engines. The ANN
    scale path swaps the scan for the LSH/IVF candidate generators
    (e_lsh_buckets / e_ivf_topk) with this same exact verify as the
    re-rank stage."""
    from ..operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = F.broadcast(q).crossJoin(emb.select(F.col("vec_id").alias("match_id"), "embedding"))
    sims = pairs.filter(F.col("match_id") != F.col("query_id")).select(
        "query_id",
        "match_id",
        F.round(cosine(F.col("qe"), F.col("embedding")), 4).alias("cos_r4"),
    )
    return sims.filter(F.col("cos_r4") >= 0.42).orderBy("query_id", "match_id")


# ---------------------------------------------------------------------------
# Pseudonymization + k-anonymity report
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style centroid pruning) and DSIR-style
# importance weighting — the two embedding/statistics-driven corpus
# curation steps between raw dedup and training-mixture sampling.
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.25


@query(
    "d_semdedup_prune",
    oracle=f"""
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    centroids AS (
      SELECT label AS c_label, pos, avg(val) AS cval FROM pos GROUP BY label, pos
    ),
    selfcos AS (
      SELECT p.vec_id, p.label,
             sum(p.val * c.cval)
             / (sqrt(sum(p.val * p.val)) * sqrt(sum(c.cval * c.cval))) AS cos_c
      FROM pos p JOIN centroids c ON c.c_label = p.label AND c.pos = p.pos
      GROUP BY p.vec_id, p.label
    ),
    keeper AS (
      SELECT label, vec_id AS keeper_id FROM (
        SELECT label, vec_id,
               row_number() OVER (PARTITION BY label ORDER BY cos_c DESC, vec_id) AS rn
        FROM selfcos
      ) WHERE rn = 1
    ),
    paircos AS (
      SELECT e.label, e.vec_id,
             round(
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(ke.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, len(ke.embedding) + 1),
                    i -> CAST(ke.embedding[i] AS DOUBLE) * CAST(ke.embedding[i] AS DOUBLE))))),
               4) AS cos_k
      FROM embeddings e
      JOIN keeper k ON k.label = e.label AND e.vec_id <> k.keeper_id
      JOIN embeddings ke ON ke.vec_id = k.keeper_id
    )
    SELECT k.label, k.keeper_id,
           CAST((SELECT count(*) FROM embeddings e2 WHERE e2.label = k.label) AS BIGINT) AS n_members,
           CAST(count(*) FILTER (WHERE p.cos_k >= {_SEMDEDUP_TAU}) AS BIGINT) AS n_pruned
    FROM keeper k LEFT JOIN paircos p ON p.label = k.label
    GROUP BY k.label, k.keeper_id
    ORDER BY k.label
    """,
)
def d_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning: within each embedding cluster,
    keep the member closest to the cluster centroid and count how many
    other members are semantically redundant with it (cosine to the
    keeper >= tau) — the curation step that removes paraphrase-level
    duplicates exact and MinHash dedup cannot see. The ``label`` column
    plays the cluster assignment (any clusterer's output; e_ivf_assign
    produces exactly this shape).

    Scale shape: centroids and keepers are cluster-count-sized
    (broadcast); the member-to-keeper cosine is ONE corpus pass joined
    against the keeper table — O(n) pairs, never O(n^2), because
    redundancy is only tested against the keeper, not all pairs (the
    SemDeDup approximation). Long-format position explode keeps all
    math in plain aggregations; thresholding on the rounded cosine pins
    the cross-engine boundary."""
    emb = load_table(spark, sf_dir, "embeddings")
    from ..operators.similarity import cosine

    pos = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = pos.groupBy("label", "pos").agg(F.avg("v").alias("cval"))
    selfcos = (
        pos.join(cent, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            (
                F.sum(F.col("v") * F.col("cval"))
                / (F.sqrt(F.sum(F.col("v") * F.col("v"))) * F.sqrt(F.sum(F.col("cval") * F.col("cval"))))
            ).alias("cos_c")
        )
    )
    keeper = (
        selfcos.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("label").orderBy(F.col("cos_c").desc(), "vec_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("label", F.col("vec_id").alias("keeper_id"))
    )
    # cluster-count-sized frame feeding three consumers (keeper_emb, the
    # final join, and indirectly paircos) — checkpoint so the centroid/
    # self-cosine derivation is planned once, not per consumer
    keeper = keeper.localCheckpoint(eager=True)
    keeper_emb = keeper.join(
        emb.select(F.col("vec_id").alias("keeper_id"), F.col("embedding").alias("kemb")),
        "keeper_id",
    )
    paircos = (
        emb.join(keeper_emb, "label")
        .filter(F.col("vec_id") != F.col("keeper_id"))
        .select(
            "label",
            F.round(cosine(F.col("embedding"), F.col("kemb")), 4).alias("cos_k"),
        )
    )
    sizes = emb.groupBy("label").agg(F.count("*").alias("n_members"))
    pruned = paircos.groupBy("label").agg(
        F.sum(F.when(F.col("cos_k") >= _SEMDEDUP_TAU, 1).otherwise(0)).alias("n_pruned")
    )
    return (
        keeper.join(sizes, "label")
        .join(pruned, "label", "left")
        .select(
            "label", "keeper_id", "n_members",
            F.coalesce("n_pruned", F.lit(0)).cast("long").alias("n_pruned"),
        )
        .orderBy("label")
    )


@query(
    "t_importance_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    tgt AS (SELECT w, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY w),
    raw AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    tot AS (
      SELECT (SELECT sum(c) FROM tgt) AS t_total,
             (SELECT sum(c) FROM raw) AS r_total,
             (SELECT count(*) FROM raw) AS v
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             round(avg(ln(((coalesce(g.c, 0) + 1.0) / (tot.t_total + tot.v))
                        / ((r.c + 1.0) / (tot.r_total + tot.v)))), 4) AS iw
      FROM toks t
      JOIN raw r ON r.w = t.w
      LEFT JOIN tgt g ON g.w = t.w
      CROSS JOIN tot
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, iw FROM scored
    ORDER BY iw DESC, doc_id LIMIT 50
    """,
)
def t_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: per-document average token
    log-likelihood ratio between a TARGET distribution (here: the 'en'
    slice plays the high-quality target) and the RAW corpus distribution
    — add-one-smoothed unigram LMs over the shared vocabulary. High
    weight = looks like the target; the standard data-selection score
    for matching a pretraining mixture to a quality domain. Top-50.

    Scale shape: two vocabulary-sized count tables (target + raw) built
    by one exploded-token aggregation each (map-side combined), joined
    back to the token stream on the word — the same bounded-vocab
    re-join shape as t_bigram_lm. The three grand totals ride along as a
    1-row cross join. Per-doc averages round(4) before the top-k so the
    float summation order cannot reorder the board."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    tgt = toks.filter(F.col("lang") == "en").groupBy("w").agg(F.count("*").alias("tc"))
    raw = toks.groupBy("w").agg(F.count("*").alias("rc"))
    tot = raw.agg(
        F.sum("rc").alias("r_total"), F.count("*").alias("v")
    ).crossJoin(tgt.agg(F.sum("tc").alias("t_total")))
    scored = (
        toks.join(raw, "w")
        .join(tgt, "w", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(
                    F.log(
                        ((F.coalesce("tc", F.lit(0)) + 1.0) / (F.col("t_total") + F.col("v")))
                        / ((F.col("rc") + 1.0) / (F.col("r_total") + F.col("v")))
                    )
                ),
                4,
            ).alias("iw"),
        )
    )
    return scored.orderBy(F.col("iw").desc(), "doc_id").limit(50)


# ---------------------------------------------------------------------------
# URL canonicalization dedup and period-over-period comparison
# ---------------------------------------------------------------------------

_DUCK_MESSY_URLS = """
    messy AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://CDN' || (doc_id // 4) % 5 || '.Example.org/docs/'
                           || (doc_id // 4) || '?utm_source=feed&utm_medium=rss'
               WHEN 1 THEN 'https://cdn' || (doc_id // 4) % 5 || '.example.org:443/docs/' || (doc_id // 4)
               WHEN 2 THEN 'https://cdn' || (doc_id // 4) % 5 || '.example.org/docs/' || (doc_id // 4) || '/'
               ELSE 'https://cdn' || (doc_id // 4) % 5 || '.example.org/docs/' || (doc_id // 4)
                    || '?utm_campaign=x&fbclid=abc123'
             END AS url
      FROM documents
    )
"""


@query(
    "t_url_canonical_dedup",
    oracle=f"""
    WITH {_DUCK_MESSY_URLS},
    canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(url), ':443/', '/'),
                   '[?&](utm_[a-z]+|fbclid)=[^&]*', '', 'g'),
                 '\\?$', ''),
               '/$', '') AS curl
      FROM messy
    )
    SELECT curl AS canonical_url, CAST(count(*) AS BIGINT) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc
    FROM canon
    GROUP BY curl HAVING count(*) > 1
    ORDER BY curl
    """,
)
def t_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup: crawl URLs arrive in many equivalent
    spellings (case-folded hosts, explicit default ports, trailing
    slashes, utm_/fbclid tracking params); canonicalize, then group — the
    crawl-frontier dedup that runs BEFORE any content is fetched, saving
    the fetch itself. Deterministic messy variants are synthesized per
    document (4 spellings of each logical URL) since the corpus has no
    URL column; the canonicalizer (lowercase → strip default port →
    strip tracking params → strip dangling ?/ trailing /) is the
    operator under test, byte-identical on both engines.

    Narrow per-row transform + one groupBy on the canonical string; the
    keeper (min doc id) makes the survivor pick deterministic. At crawl
    scale the canonical-URL groupBy is the frontier's primary shuffle
    and its key distribution is domain-skewed — the usual salting
    candidate (same note as f_url_parse's host groupBy)."""
    docs = load_table(spark, sf_dir, "documents")
    lid = (F.col("doc_id") / 4).cast("long")
    logical = lid.cast("string")
    host_n = (lid % 5).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://CDN"), host_n, F.lit(".Example.org/docs/"), logical, F.lit("?utm_source=feed&utm_medium=rss")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("https://cdn"), host_n, F.lit(".example.org:443/docs/"), logical),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://cdn"), host_n, F.lit(".example.org/docs/"), logical, F.lit("/")),
        )
        .otherwise(
            F.concat(F.lit("https://cdn"), host_n, F.lit(".example.org/docs/"), logical, F.lit("?utm_campaign=x&fbclid=abc123")),
        )
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(url), ":443/", "/"),
                "[?&](utm_[a-z]+|fbclid)=[^&]*", ""),
            "\\?$", ""),
        "/$", "")
    return (
        docs.select("doc_id", curl.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_variants"), F.min("doc_id").alias("keeper_doc"))
        .filter(F.col("n_variants") > 1)
        .orderBy("canonical_url")
    )


@query(
    "ts_period_over_period",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT cur.event_type, cur.h AS hour, cur.n AS n_events,
           prev.n AS n_prev_day,
           CAST(cur.n - prev.n AS BIGINT) AS delta
    FROM hourly cur
    JOIN hourly prev
      ON prev.event_type = cur.event_type
     AND prev.h = cur.h - INTERVAL 24 HOUR
    ORDER BY cur.event_type, cur.h
    """,
)
def ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period comparison: each hour's event count vs the
    SAME hour 24 h earlier, per event type — the dashboard/alerting
    staple ("is this hour unusual for this hour-of-day?"). An equi
    self-join on the shifted bucket rather than a window lag: lag-N over
    a sparse hour axis silently compares against whatever row happens to
    be N positions back, while the shifted-key join compares against the
    true prior period or nothing.

    Both sides reduce to bucket-count rows BEFORE the join (map-side
    partial agg), so the join moves bounded aggregate rows, never
    events. All-integer output."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    cur, prev = hourly.alias("cur"), hourly.alias("prev")
    return (
        cur.join(
            prev,
            (F.col("prev.event_type") == F.col("cur.event_type"))
            & (F.col("prev.h") == F.col("cur.h") - F.expr("INTERVAL 24 HOURS")),
        )
        .select(
            F.col("cur.event_type").alias("event_type"),
            F.col("cur.h").alias("hour"),
            F.col("cur.n").alias("n_events"),
            F.col("prev.n").alias("n_prev_day"),
            (F.col("cur.n") - F.col("prev.n")).alias("delta"),
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# Distribution drift: KS statistic and PSI — the monitoring pair every
# ML data pipeline runs between a baseline window and the current one.
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "TIMESTAMP '2024-01-15 00:00:00'"


@query(
    "a_ks_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, round(value, 2) AS v,
             CASE WHEN ts < {_DRIFT_SPLIT} THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    per_v AS (
      SELECT event_type, v,
             CAST(sum(is_base) AS BIGINT) AS nb,
             CAST(sum(1 - is_base) AS BIGINT) AS nc
      FROM tagged GROUP BY event_type, v
    ),
    tot AS (
      SELECT event_type,
             CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc
      FROM per_v GROUP BY event_type
    ),
    ecdf AS (
      SELECT p.event_type, p.v,
             sum(p.nb) OVER (PARTITION BY p.event_type ORDER BY p.v) * 1.0 / t.tb AS fb,
             sum(p.nc) OVER (PARTITION BY p.event_type ORDER BY p.v) * 1.0 / t.tc AS fc
      FROM per_v p JOIN tot t ON t.event_type = p.event_type
    )
    SELECT event_type, round(max(abs(fb - fc)), 4) AS ks_stat
    FROM ecdf GROUP BY event_type ORDER BY event_type
    """,
)
def a_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per event type:
    max ECDF gap between the baseline period (before the split date) and
    the current one — the nonparametric "did this metric's distribution
    move?" monitor that needs no binning choices.

    Exact, distributed: values pre-aggregate to (type, value) counts
    (map-side combined), ECDFs are cumulative window sums over the
    per-type value order, and the max gap is a final per-type aggregate.
    The window sorts value-count rows (bounded by distinct values), not
    raw events. Values are rounded to cents first so the ECDF support is
    identical on both engines."""
    ev = load_table(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    tagged = ev.select(
        "event_type",
        F.round("value", 2).alias("v"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("is_base"),
    )
    per_v = tagged.groupBy("event_type", "v").agg(
        F.sum("is_base").alias("nb"), F.sum(1 - F.col("is_base")).alias("nc")
    )
    # totals as per-type WINDOW sums over the same grouped frame — no
    # separate aggregate + join, so the (type, value) derivation is
    # planned once and the whole query is one pipeline
    wcum = W.partitionBy("event_type").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy("event_type")
    ecdf = per_v.select(
        "event_type",
        (F.sum("nb").over(wcum) / F.sum("nb").over(wall)).alias("fb"),
        (F.sum("nc").over(wcum) / F.sum("nc").over(wall)).alias("fc"),
    )
    return (
        ecdf.groupBy("event_type")
        .agg(F.round(F.max(F.abs(F.col("fb") - F.col("fc"))), 4).alias("ks_stat"))
        .orderBy("event_type")
    )


_PSI_BINS = 10
_PSI_LO, _PSI_HI = 0.0, 500.0


@query(
    "a_psi_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type,
             least(greatest(CAST(floor(value / (({_PSI_HI} - {_PSI_LO}) / {_PSI_BINS})) AS INT), 0), {_PSI_BINS - 1}) AS bin,
             CASE WHEN ts < {_DRIFT_SPLIT} THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    binned AS (
      SELECT event_type, bin,
             CAST(sum(is_base) AS BIGINT) AS nb,
             CAST(sum(1 - is_base) AS BIGINT) AS nc
      FROM tagged GROUP BY event_type, bin
    ),
    tot AS (
      SELECT event_type, CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc
      FROM binned GROUP BY event_type
    ),
    terms AS (
      SELECT b.event_type,
             ((b.nb + 0.5) / (t.tb + 0.5 * {_PSI_BINS})) AS p,
             ((b.nc + 0.5) / (t.tc + 0.5 * {_PSI_BINS})) AS q
      FROM binned b JOIN tot t ON t.event_type = b.event_type
    )
    SELECT event_type, round(sum((p - q) * ln(p / q)), 4) AS psi
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
)
def a_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type over 10 fixed-width
    value bins: Σ (p−q)·ln(p/q) between the baseline and current
    periods, add-half smoothed so empty bins stay finite — the binned
    drift score model-monitoring dashboards alarm on (rule of thumb:
    >0.1 shifting, >0.25 shifted).

    One scan → (type, bin) counts with map-side combine → per-type
    bounded aggregation (bins are fixed); the shuffle carries bin
    counts only. Fixed bin edges (not quantile-derived) keep the score
    comparable across runs and engines — the production pattern where
    edges come from the TRAINING distribution, frozen."""
    ev = load_table(spark, sf_dir, "events")
    width = (_PSI_HI - _PSI_LO) / _PSI_BINS
    split = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / width).cast("int"), F.lit(0)),
        F.lit(_PSI_BINS - 1),
    )
    tagged = ev.select(
        "event_type", bin_.alias("bin"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("is_base"),
    )
    binned = tagged.groupBy("event_type", "bin").agg(
        F.sum("is_base").alias("nb"), F.sum(1 - F.col("is_base")).alias("nc")
    )
    # per-type totals as window sums over the binned frame (see a_ks_drift)
    wall = W.partitionBy("event_type")
    terms = binned.select(
        "event_type",
        ((F.col("nb") + 0.5) / (F.sum("nb").over(wall) + 0.5 * _PSI_BINS)).alias("p"),
        ((F.col("nc") + 0.5) / (F.sum("nc").over(wall) + 0.5 * _PSI_BINS)).alias("q"),
    )
    return (
        terms.groupBy("event_type")
        .agg(F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 4).alias("psi"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Attribution and functional-dependency data-quality check
# ---------------------------------------------------------------------------


@query(
    "b_last_touch_attribution",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      FROM events
    )
    SELECT user_id, event_id AS purchase_event, last_touch
    FROM ordered WHERE event_type = 'purchase'
    ORDER BY user_id, purchase_event
    """,
)
def b_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the most recent
    PRECEDING non-purchase event type of the same user (NULL when the
    purchase is the user's first event) — the marketing-attribution
    primitive; first-touch and position-based models are the same carry
    with a different frame/aggregate.

    Same cost shape as the as-of join it generalizes (operators/asof.py
    uses the identical last-ignorenulls carry over a tagged union): ONE
    shuffle on user_id + an in-partition (ts, event_id) sort; the
    conditional inside the carry replaces a self-join entirely. The
    frame ends at 1 PRECEDING so a purchase can never attribute to
    itself or a same-timestamp later event."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = ev.select(
        "user_id", "event_id", "event_type",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w).alias("last_touch"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_event"), "last_touch")
        .orderBy("user_id", "purchase_event")
    )


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
    "t_duplicated_ngram_report",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id,
             concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]) AS g,
             i AS pos
      FROM words, UNNEST(range(1, len(w) - 6)) AS t(i)
      WHERE len(w) >= 8
    ),
    stats AS (
      SELECT g,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(min(doc_id) AS BIGINT) AS example_doc,
             CAST(min(pos) FILTER (WHERE doc_id = (SELECT min(doc_id) FROM grams g2 WHERE g2.g = grams.g)) AS BIGINT) AS example_pos
      FROM grams GROUP BY g
    )
    SELECT g AS ngram, n_occurrences, n_docs, example_doc, example_pos
    FROM stats WHERE n_docs >= 3
    ORDER BY n_occurrences DESC, ngram LIMIT 30
    """,
)
def t_duplicated_ngram_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring report: 8-gram word sequences appearing
    in 3+ distinct documents, with occurrence counts and one example
    (doc, position) — the diagnostic behind exact-substring training-data
    dedup (memorization-prone boilerplate shows up here long before
    document-level dedup sees it). Top-30 by occurrence count.

    One posexplode pass → gram groupBy with map-side partial aggs; the
    per-gram example position is min-over-the-min-doc (deterministic).
    The gram key space is the skew axis at crawl scale: the hot-gram cap
    (same discipline as the shingle doc-frequency cap) bounds any
    group, and the report's HAVING n_docs >= k is itself the
    production filter — singleton grams (the overwhelming majority)
    combine away map-side and never cross the wire."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    idx = F.sequence(F.lit(1), F.size("w") - 7)
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at("w", i + k) for k in range(8)])
    )
    grams = (
        words.filter(F.size("w") >= 8)
        .select("doc_id", F.posexplode(gram).alias("pos0", "g"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    )
    # example = position of the min occurrence in the min doc: encode
    # (doc, pos) as one orderable struct-min so both come from ONE row
    ex = F.min(F.struct("doc_id", "pos"))
    stats = grams.groupBy("g").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
        ex.alias("ex"),
    )
    return (
        stats.filter(F.col("n_docs") >= 3)
        .select(
            F.col("g").alias("ngram"), "n_occurrences", "n_docs",
            F.col("ex.doc_id").alias("example_doc"),
            F.col("ex.pos").alias("example_pos"),
        )
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-round peel) on the co-supply graph
# ---------------------------------------------------------------------------

_KCORE_K = 6
_KCORE_ROUNDS = 8  # converges in <= 6 at the tested SFs; 2 rounds margin
_KCORE_EDGE_FACTOR = 5  # edge budget = 5x the supplier count (SF-adaptive)


def _kcore_oracle() -> str:
    """Unrolled fixed-round peel as a CTE chain — the same rounds the
    Spark loop executes (converged well within the budget at the tested
    SFs, asserted by the pytest fixpoint check)."""
    prev = "e0"
    stages = []
    for r in range(1, _KCORE_ROUNDS + 1):
        stages.append(f"""
    d{r} AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT s1 AS node FROM {prev} UNION ALL SELECT s2 FROM {prev}
      ) GROUP BY node
    ),
    k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE degree >= {_KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT s1, s2 FROM {prev}
      WHERE s1 IN (SELECT node FROM k{r}) AND s2 IN (SELECT node FROM k{r})
    )""")
        prev = f"e{r}"
    chain = ",".join(stages)
    return f"""
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    ns AS (SELECT count(DISTINCT s) AS n FROM ps),
    w AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS c
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    e0 AS MATERIALIZED (
      SELECT s1, s2 FROM (
        SELECT s1, s2, row_number() OVER (ORDER BY c DESC, s1, s2) AS rn FROM w
      ), ns WHERE rn <= {_KCORE_EDGE_FACTOR} * ns.n
    ),{chain}
    SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
      SELECT s1 AS node FROM {prev} UNION ALL SELECT s2 FROM {prev}
    ) GROUP BY node
    ORDER BY node
    """


@query("g_kcore_decomposition", oracle=_kcore_oracle())
def g_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core (k=6) of the strongest co-supply edges: the maximal subgraph
    where every surviving supplier still has >= k strong partners —
    the graph-density community detector that complements triangle
    counts (a node can sit in many triangles yet fall out of the core).
    Fixed 8-round peel over an SF-adaptive edge budget (5x the supplier
    count — a FIXED budget left the sf0.1 graph too sparse for any core;
    converged within 6 rounds at every tested SF; the pytest
    check asserts a further round removes nothing), unrolled identically
    in the oracle.

    Each peel round's frames SHRINK monotonically and per-round lineage
    is checkpoint-truncated, so the cost is bounded by the first
    round's two small shuffles; the expensive part (edge-weight build)
    is shared with g_triangle_count and runs once.

    NOTE for plan-audit/bench callers: building this DataFrame RUNS
    Spark jobs (the 1-row supplier-count collect that makes the edge
    budget a literal, plus the eager localCheckpoint of the bounded
    edge list) — plan construction is not lazy here, by design."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    # The edge budget must be a LITERAL: with the old crossJoin'd column
    # bound (rn <= 5 * col(n)) InferWindowGroupLimit could not fire and
    # the row_number window single-partition-sorted the ENTIRE pair
    # frame — measured 6.2 GB memory spill at the 10x probe. The
    # supplier count is a 1-row aggregate; collecting it is
    # cluster-safe, and the literal bound re-enables the partial
    # WindowGroupLimit (only ~partitions x budget rows move).
    n_supp, ps_rows = ps.agg(
        F.count_distinct("s"), F.count("*")
    ).collect()[0]
    # Widen the pair-build stage (round-5 telemetry: the map-side
    # partial-agg hash over ~5M distinct (s1,s2) pairs spilled 6.2 GB
    # at 10x under 32 fat tasks). Re-hashing ps on p into more, smaller
    # partitions shrinks every task's partial-agg hash proportionally;
    # the self-join then reuses the co-partitioning (both sides are the
    # same frame), so the ONLY added cost is one shuffle of the small
    # distinct (p,s) projection — far cheaper than spilling the pair
    # hash. Sized off the pair-input row count (~25k (p,s) rows per
    # task keeps each task's pair hash well under execution memory;
    # measured: 10x spill 6.2 GB -> 0, time 23 -> ~10 s) and floored at
    # the session's shuffle parallelism so small SFs pay no extra tasks.
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_pair_tasks = min(4096, max(shuffle_parts, int(ps_rows) // 25_000))
    ps = ps.repartition(n_pair_tasks, "p")
    a, b = ps.alias("a"), ps.alias("b")
    w = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").alias("c"))
    )
    e = (
        w.withColumn("rn", F.row_number().over(W.orderBy(F.col("c").desc(), "s1", "s2")))
        .filter(F.col("rn") <= F.lit(int(_KCORE_EDGE_FACTOR * n_supp)))
        .select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .localCheckpoint(eager=True)
    )
    from ..operators.graph import kcore_peel

    return kcore_peel(e, k=_KCORE_K, rounds=_KCORE_ROUNDS).orderBy("node")


# ---------------------------------------------------------------------------
# LSH quality evaluation: recall of the banded MinHash candidates
# against exact Jaccard truth — the measurement that justifies a band
# configuration before trusting it on 100 TB.
# ---------------------------------------------------------------------------

_RECALL_TAU = 0.3


def _lsh_recall_oracle() -> str:
    from .llmdata import _DUCK_SHINGLES, N_MINHASH

    sig_cols = ", ".join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(N_MINHASH))
    return f"""
    WITH {_DUCK_SHINGLES},
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN counts ca ON ca.doc_id = i.doc_a
      JOIN counts cb ON cb.doc_id = i.doc_b
      WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) >= {_RECALL_TAU}
    ),
    sigs AS (
      SELECT doc_id, {sig_cols} FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth t
                 WHERE EXISTS (SELECT 1 FROM cand c
                               WHERE c.doc_a = t.doc_a AND c.doc_b = t.doc_b))
                AS BIGINT) AS n_caught,
           round((SELECT count(*) FROM truth t
                  WHERE EXISTS (SELECT 1 FROM cand c
                                WHERE c.doc_a = t.doc_a AND c.doc_b = t.doc_b))
                 * 1.0 / greatest((SELECT count(*) FROM truth), 1), 4) AS recall
    """


@query("d_lsh_recall_report", oracle=_lsh_recall_oracle())
def d_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding quality report: of the TRUE near-dup pairs (exact
    Jaccard >= 0.3), what fraction do the banded MinHash candidates
    catch? One row: (n_true, n_candidates, n_caught, recall). This is
    the evaluation every banding config needs before running on 100 TB —
    the band/row counts trade recall against candidate volume, and this
    query measures the trade on a sample instead of assuming the
    S-curve.

    Scale shape: the truth side is the exact Jaccard verifier (run on a
    SAMPLE at production scale — that is the standard recall-estimation
    protocol, and the sample is the knob); the candidate side is the
    production LSH path itself. The final intersection joins two
    pair-keyed frames, both already deduplicated and pair-count-sized.
    """
    from ..operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    # jaccard_pairs filters STRICTLY above its threshold; nudge down by
    # an epsilon so truth is the at-or-above-tau set
    truth = jaccard_pairs(
        word_shingles(docs), min_jaccard=_RECALL_TAU - 1e-12, max_doc_freq=None
    ).select("id_a", "id_b")
    cand = lsh_candidate_pairs(
        minhash_signatures(word_shingles(docs, distinct=False), hash_fn="md5"),
        bands=4,
        rows_per_band=2,
    ).select("id_a", "id_b")
    caught = truth.join(cand, ["id_a", "id_b"], "left_semi")
    # one lazy plan, no driver-side counts: three 1-row aggregates
    # cross-joined (each is a full partial-agg reduce; the cross join
    # moves 3 rows)
    t = truth.agg(F.count("*").alias("n_true"))
    c = cand.agg(F.count("*").alias("n_candidates"))
    g = caught.agg(F.count("*").alias("n_caught"))
    return t.crossJoin(c).crossJoin(g).select(
        "n_true", "n_candidates", "n_caught",
        F.round(F.col("n_caught") / F.greatest(F.col("n_true"), F.lit(1)), 4).alias("recall"),
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@k of IVF multi-probe vs exact KNN
# ---------------------------------------------------------------------------


def _ivf_recall_oracle() -> str:
    from .llmdata_ext import _COSINE_SQL

    cos_qe = _COSINE_SQL.format(a="q.embedding", b="e.embedding")
    return f"""
    WITH pos AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    centroids AS (
      SELECT label AS c_label, pos, avg(val) AS cval FROM pos GROUP BY label, pos
    ),
    dots AS (
      SELECT p.vec_id, c.c_label,
             sum(p.val * c.cval) AS dot,
             sqrt(sum(p.val * p.val)) AS vn,
             sqrt(sum(c.cval * c.cval)) AS cn
      FROM pos p JOIN centroids c ON p.pos = c.pos
      GROUP BY p.vec_id, c.c_label
    ),
    ranked AS (
      SELECT vec_id, c_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dot / (vn * cn) DESC, c_label) AS rn
      FROM dots
    ),
    lists AS (SELECT vec_id AS neighbor_id, c_label FROM ranked WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, c_label FROM ranked WHERE rn <= 2 AND vec_id < 5
    ),
    cand AS (
      SELECT DISTINCT p.query_id, l.neighbor_id
      FROM probes p JOIN lists l ON p.c_label = l.c_label
      WHERE l.neighbor_id <> p.query_id
    ),
    ivf_sims AS (
      SELECT c.query_id, c.neighbor_id, {cos_qe} AS cos_sim
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings e ON e.vec_id = c.neighbor_id
    ),
    ivf_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM ivf_sims
      ) WHERE rn <= 3
    ),
    exact_sims AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, {cos_qe} AS cos_sim
      FROM embeddings q, embeddings e
      WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
    ),
    exact_top AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM exact_sims
      ) WHERE rn <= 3
    )
    SELECT CAST((SELECT count(*) FROM exact_top) AS BIGINT) AS n_truth_pairs,
           CAST((SELECT count(*) FROM exact_top t
                 WHERE EXISTS (SELECT 1 FROM ivf_top i
                               WHERE i.query_id = t.query_id
                                 AND i.neighbor_id = t.neighbor_id))
                AS BIGINT) AS n_caught,
           round((SELECT count(*) FROM exact_top t
                  WHERE EXISTS (SELECT 1 FROM ivf_top i
                                WHERE i.query_id = t.query_id
                                  AND i.neighbor_id = t.neighbor_id))
                 * 1.0 / (SELECT count(*) FROM exact_top), 4) AS recall_at_3
    """


@query("e_ivf_recall_report", oracle=_ivf_recall_oracle())
def e_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall@3: what fraction of the EXACT cosine top-3 neighbors
    does the IVF multi-probe path (n_probe=2) return for the query set?
    One row (n_truth_pairs, n_caught, recall_at_3) — the standard ANN
    quality metric; n_probe trades this recall against probed-list
    volume, and this query measures the trade instead of assuming it.

    The truth side is the brute-force scan (run on a query SAMPLE at
    production scale — the standard recall-estimation protocol); the
    IVF side is the production search path itself. Both reduce to
    pair-keyed top-3 frames before a semi-join and three 1-row
    aggregates — no driver-side counting."""
    from ..operators.similarity import centroids_by, ivf_topk, knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = knn_bruteforce(emb, queries, k=3).select("query_id", "neighbor_id")
    cents = centroids_by(emb, "label").localCheckpoint(eager=False)
    ivf = ivf_topk(emb, queries, cents, k=3, n_probe=2).select(
        "query_id", "neighbor_id"
    )
    caught = exact.join(ivf, ["query_id", "neighbor_id"], "left_semi")
    t = exact.agg(F.count("*").alias("n_truth_pairs"))
    g = caught.agg(F.count("*").alias("n_caught"))
    return t.crossJoin(g).select(
        "n_truth_pairs", "n_caught",
        F.round(F.col("n_caught") / F.col("n_truth_pairs"), 4).alias("recall_at_3"),
    )


# ---------------------------------------------------------------------------
# Negative sampling for contrastive/recommender training
# ---------------------------------------------------------------------------

_NEG_PER_USER = 2
_NEG_CAND_PARTS = 100


@query(
    "b_negative_sampling",
    oracle=f"""
    WITH inter AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    cand AS (
      SELECT p FROM (
        SELECT l_partkey AS p, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, l_partkey) AS rn
        FROM lineitem GROUP BY l_partkey
      ) WHERE rn <= {_NEG_CAND_PARTS}
    ),
    users AS (SELECT DISTINCT c FROM inter),
    negs AS (
      SELECT u.c, cd.p,
             row_number() OVER (
               PARTITION BY u.c ORDER BY md5(u.c || ':' || cd.p)
             ) AS rn
      FROM users u CROSS JOIN cand cd
      WHERE NOT EXISTS (SELECT 1 FROM inter i WHERE i.c = u.c AND i.p = cd.p)
    )
    SELECT c AS custkey, p AS neg_partkey, CAST(rn AS INT) AS neg_rank
    FROM negs WHERE rn <= {_NEG_PER_USER}
    ORDER BY custkey, neg_rank
    """,
)
def b_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling: for every customer, 2 popular
    parts they have NEVER purchased, picked by content-hash order — the
    contrastive/recommender training companion to positive interaction
    pairs. Hash-ordered (never rand()) so resampling a shard regenerates
    identical negatives, and restricted to a bounded popular-candidate
    set so negatives are hard (popularity-matched), not trivial.

    Scale shape: the candidate set is top-N (bounded, broadcast); the
    cross join is users x N BEFORE the anti-filter, i.e. linear in
    users with constant factor N — never users x all-items. The
    interaction anti-check is a co-partitioned NOT EXISTS on the
    (user, item) key; the per-user hash-order pick is a bounded window
    over <= N rows per user."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    inter = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cand = (
        li.groupBy(F.col("l_partkey").alias("p"))
        .agg(F.count("*").alias("n"))
        .withColumn("rn", F.row_number().over(W.orderBy(F.col("n").desc(), "p")))
        .filter(F.col("rn") <= _NEG_CAND_PARTS)
        .select("p")
    )
    users = inter.select("c").distinct()
    pairs = users.crossJoin(F.broadcast(cand))
    negs = (
        pairs.join(inter, ["c", "p"], "left_anti")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("c").orderBy(
                    F.md5(F.concat(F.col("c").cast("string"), F.lit(":"), F.col("p").cast("string")))
                )
            ),
        )
        .filter(F.col("rn") <= _NEG_PER_USER)
    )
    return negs.select(
        F.col("c").alias("custkey"),
        F.col("p").alias("neg_partkey"),
        F.col("rn").cast("int").alias("neg_rank"),
    ).orderBy("custkey", "neg_rank")


# ---------------------------------------------------------------------------
# Warehouse-wide referential integrity sweep and Benford screening
# ---------------------------------------------------------------------------


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


@query(
    "a_benford_first_digit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs)
    SELECT o.d AS first_digit, o.n AS n_obs,
           round(o.n * 1.0 / tot.t, 4) AS p_obs,
           round(log10(1.0 + 1.0 / o.d), 4) AS p_benford,
           round(abs(o.n * 1.0 / tot.t - log10(1.0 + 1.0 / o.d)), 4) AS abs_dev
    FROM obs o CROSS JOIN tot
    ORDER BY first_digit
    """,
)
def a_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals: observed
    first-digit frequencies vs log10(1 + 1/d), with absolute deviation
    per digit — the classic anomaly screen for fabricated or truncated
    numeric columns (heavy deviation = investigate the source, not
    necessarily fraud; synthetic uniform-ish data deviates by design
    and the report shows exactly how).

    One scan → 9-row digit groupBy (map-side combined) → total via a
    1-row cross join. String first-digit extraction over the integer
    part is engine-portable; all ratios rounded before compare."""
    orders = load_table(spark, sf_dir, "orders")
    # explicit floor: Spark's double->bigint cast truncates while
    # DuckDB's ROUNDS (banker's) — floor() pins identical integer parts
    d = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(d.alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("t"))
    p_obs = F.col("n") / F.col("t")
    p_ben = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            F.col("n").alias("n_obs"),
            F.round(p_obs, 4).alias("p_obs"),
            F.round(p_ben, 4).alias("p_benford"),
            F.round(F.abs(p_obs - p_ben), 4).alias("abs_dev"),
        )
        .orderBy("first_digit")
    )


# ---------------------------------------------------------------------------
# Visualization-ready downsampling (LTTB-style, parallel variant)
# ---------------------------------------------------------------------------

_LTTB_BUCKETS = 60


@query(
    "ts_downsample_lttb",
    oracle=f"""
    WITH pts AS (
      SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS x, round(value, 2) AS y
      FROM events WHERE event_type = 'click'
    ),
    bounds AS (
      SELECT min(x) AS x0,
             CAST(ceil((max(x) - min(x) + 1) * 1.0 / {_LTTB_BUCKETS}) AS BIGINT) AS w
      FROM pts
    ),
    bucketed AS (
      SELECT p.event_id, p.x, p.y, CAST((p.x - b.x0) // b.w AS BIGINT) AS bk
      FROM pts p CROSS JOIN bounds b
    ),
    bstats AS (
      SELECT bk, avg(x) AS bx, avg(y) AS by FROM bucketed GROUP BY bk
    ),
    ctx AS (
      SELECT bk, bx, by,
             lag(bx) OVER (ORDER BY bk) AS px, lag(by) OVER (ORDER BY bk) AS py,
             lead(bx) OVER (ORDER BY bk) AS nx, lead(by) OVER (ORDER BY bk) AS ny
      FROM bstats
    ),
    scored AS (
      SELECT b.bk, b.event_id,
             round(abs((c.px - c.nx) * (b.y - c.py) - (c.px - b.x) * (c.ny - c.py)), 4) AS area
      FROM bucketed b JOIN ctx c ON c.bk = b.bk
      WHERE c.px IS NOT NULL AND c.nx IS NOT NULL
    ),
    picked AS (
      SELECT bk, event_id FROM (
        SELECT bk, event_id,
               row_number() OVER (PARTITION BY bk ORDER BY area DESC, event_id) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT CAST(bk AS BIGINT) AS bucket, event_id FROM picked ORDER BY bucket
    """,
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard downsampling, LTTB-style (parallel variant): bucket the
    series into 60 fixed-width time bins and keep, per interior bucket,
    the point forming the largest triangle with the NEIGHBOR BUCKET
    AVERAGES — the shape-preserving alternative to naive every-Nth
    sampling (peaks and dips survive because extreme points make big
    triangles). The classic sequential LTTB anchors on the previously
    SELECTED point; this variant anchors on bucket averages, which
    removes the sequential dependency so every bucket picks in parallel
    — the standard distributed adaptation.

    All-integer bucketing (epoch arithmetic, ceil'd width) so bucket
    boundaries cannot drift between engines; areas rounded before the
    per-bucket argmax with an id tiebreak. Cost: one scan, one bucket
    groupBy (60 rows), a 60-row window, and a broadcast join back —
    output is bucket-count-sized."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    pts = ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("x"),
        F.round("value", 2).alias("y"),
    )
    bounds = pts.agg(
        F.min("x").alias("x0"),
        F.ceil((F.max("x") - F.min("x") + 1) / _LTTB_BUCKETS).cast("bigint").alias("w"),
    )
    bucketed = pts.crossJoin(F.broadcast(bounds)).withColumn(
        "bk", ((F.col("x") - F.col("x0")) / F.col("w")).cast("bigint")
    )
    bstats = bucketed.groupBy("bk").agg(F.avg("x").alias("bx"), F.avg("y").alias("by"))
    wov = W.orderBy("bk")
    ctx = bstats.select(
        "bk",
        F.lag("bx").over(wov).alias("px"), F.lag("by").over(wov).alias("py"),
        F.lead("bx").over(wov).alias("nx"), F.lead("by").over(wov).alias("ny"),
    )
    scored = (
        bucketed.join(F.broadcast(ctx), "bk")
        .filter(F.col("px").isNotNull() & F.col("nx").isNotNull())
        .select(
            "bk", "event_id",
            F.round(
                F.abs(
                    (F.col("px") - F.col("nx")) * (F.col("y") - F.col("py"))
                    - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
                ),
                4,
            ).alias("area"),
        )
    )
    picked = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("bk").orderBy(F.col("area").desc(), "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return picked.select(F.col("bk").alias("bucket"), "event_id").orderBy("bucket")


@query(
    "t_code_detect",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 9 = 0
                          THEN ' def f(x): return g[x] = (x < 1); import os'
                          ELSE '' END AS text
      FROM documents WHERE n_chars > 0
    ),
    feats AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[{{}}()\\[\\];=<>]')) AS n_sym,
             len(regexp_extract_all(text, '\\b(def|return|import|class|void|int|function|var|const)\\b')) AS n_kw,
             len(string_split(text, ' ')) AS n_tok
      FROM src
    )
    SELECT doc_id,
           CAST(n_sym AS BIGINT) AS n_symbols,
           CAST(n_kw AS BIGINT) AS n_keywords,
           round((n_sym + 3.0 * n_kw) / n_tok, 4) AS code_score,
           CAST(CASE WHEN (n_sym + 3.0 * n_kw) / n_tok > 0.05 THEN 1 ELSE 0 END AS INT) AS looks_like_code
    FROM feats
    WHERE n_sym + n_kw > 0
    ORDER BY doc_id
    """,
)
def t_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic code-vs-prose detector: per document, code-symbol
    density ({}()[];=<>) and programming-keyword hits, combined into a
    score with a flag threshold — the cheap first-stage router every
    code/text mixture pipeline runs before an expensive classifier
    (symbol-free prose short-circuits map-side; only symbol-bearing docs
    reach the output at all).

    Narrow one-scan regex transform in the portable subset (char class +
    alternation + word boundaries agree between Java regex and RE2);
    thresholding on the exact rational (n_sym + 3*n_kw)/n_tok with the
    flag recomputed identically on both engines."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    # the synthetic corpus is symbol-free prose; deterministically append
    # a code fragment to every 9th doc so the detector has real positives
    # (same injected-fixture discipline as t_pii_detect)
    docs = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 9 == 0,
                F.lit(" def f(x): return g[x] = (x < 1); import os"),
            ).otherwise(F.lit("")),
        ),
    )
    n_sym = F.size(F.regexp_extract_all("text", F.lit(r"[{}()\[\];=<>]"), F.lit(0)))
    n_kw = F.size(
        F.regexp_extract_all(
            "text",
            F.lit(r"\b(def|return|import|class|void|int|function|var|const)\b"),
            F.lit(0),
        )
    )
    n_tok = F.size(F.split("text", " "))
    score = (n_sym + 3.0 * n_kw) / n_tok
    return (
        docs.select(
            "doc_id",
            n_sym.cast("long").alias("n_symbols"),
            n_kw.cast("long").alias("n_keywords"),
            F.round(score, 4).alias("code_score"),
            F.when(score > 0.05, 1).otherwise(0).cast("int").alias("looks_like_code"),
        )
        .filter((F.col("n_symbols") + F.col("n_keywords")) > 0)
        .orderBy("doc_id")
    )


@query(
    "ts_autocorr",
    oracle="""
    WITH r AS (
      SELECT event_type, round(value, 2) AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      FROM events
    ),
    pairs AS (
      SELECT a.event_type, a.v AS x, b.v AS y
      FROM r a JOIN r b ON b.event_type = a.event_type AND b.rn = a.rn - 24
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           round(
             (avg(x * y) - avg(x) * avg(y))
             / (sqrt(avg(x * x) - avg(x) * avg(x)) * sqrt(avg(y * y) - avg(y) * avg(y))),
             3) AS acf_lag24
    FROM pairs GROUP BY event_type ORDER BY event_type
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-24 autocorrelation per event type (Pearson between the series
    and itself 24 observations back) — the seasonality/periodicity
    diagnostic that decides whether the period-over-period monitor
    (ts_period_over_period) is even the right comparison for a metric.

    The lagged pairing is an equi self-join on the per-type row number
    (exactly one partner per row — O(n) pairs), and the correlation is
    the moment formula over plain aggregates, so everything partial-
    aggregates map-side after the one type-keyed window sort.
    Rounded to 3 so the cross-engine float summation order cannot move
    the statistic; inputs cent-rounded first so both engines correlate
    identical series."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.select(
        "event_type",
        F.round("value", 2).alias("v"),
        F.row_number().over(
            W.partitionBy("event_type").orderBy("ts", "event_id")
        ).alias("rn"),
    )
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.rn") == F.col("a.rn") - 24),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.v").alias("x"),
        F.col("b.v").alias("y"),
    )
    num = F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")
    den = F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")) * F.sqrt(
        F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")
    )
    return (
        pairs.groupBy("event_type")
        .agg(F.count("*").alias("n_pairs"), F.round(num / den, 3).alias("acf_lag24"))
        .orderBy("event_type")
    )
