"""Round-4 operator additions: benchmark decontamination, PII
detection/redaction, URL parsing, multi-resolution time-bucket rollups,
EWMA smoothing, rolling-window anomaly detection, time-band joins,
triangle counting, deterministic bootstrap CIs, embedding range search,
and pseudonymization with k-anonymity reporting.

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

    Scale shape: one shuffle of train shingles against the distinct
    benchmark shingle set via LEFT SEMI on the shingle value — the
    benchmark side is eval-corpus-sized (bounded: benchmarks are MBs,
    not TBs), so AQE broadcasts it; the train side streams. The same
    hot-shingle doc-frequency cap as jaccard_pairs applies in production
    (a stop-shingle would mark everything contaminated); the gate runs
    uncapped to stay exactly SQL-expressible.
    """
    from ..operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs)  # (id, sh) distinct
    is_eval = F.col("id") % _EVAL_MOD == 0
    eval_sh = sh.filter(is_eval).select("sh").distinct()
    train = sh.filter(~is_eval)
    sized = train.groupBy("id").agg(F.count("*").alias("n_shingles"))
    contam = (
        train.join(eval_sh, "sh", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_contam"))
    )
    scored = (
        sized.join(contam, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "n_shingles",
            F.coalesce("n_contam", F.lit(0)).alias("n_contam"),
            F.round(
                F.coalesce("n_contam", F.lit(0)) / F.col("n_shingles"), 4
            ).alias("contam_ratio"),
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
    no data-sized shuffle beyond the check itself."""
    from ..operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs)
    is_eval = F.col("id") % _EVAL_MOD == 0
    eval_sh = sh.filter(is_eval).select("sh").distinct()
    train_sh = sh.filter(~is_eval)
    sized = train_sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    contam = (
        train_sh.join(eval_sh, "sh", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_contam"))
    )
    flagged = (
        sized.join(contam, "id")
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
