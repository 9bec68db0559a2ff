"""Text-pipeline operators, part 2: normalization, decontamination,
repetition detection, PII redaction.

The remaining standard stages of a pre-training text pipeline (C4/
Gopher/RefinedWeb-style), each as pure column-expression plans with
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query
from .llmdata import _DUCK_SHINGLES


@query(
    "t_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                           ' +', ' ', 'g'))) AS INT) AS norm_len
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def t_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase → strip non-alnum →
    collapse whitespace → trim. The pre-hash step for fuzzy dedup so
    punctuation/case variants collide."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    ).orderBy("doc_id")


@query(
    "d_decontaminate",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shingles AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    ),
    bench AS (SELECT DISTINCT sh FROM shingles WHERE doc_id < 10),
    corpus AS (SELECT doc_id, sh FROM shingles WHERE doc_id >= 10),
    hits AS (
      SELECT c.doc_id,
             CAST(count(*) AS BIGINT) AS n_shared,
             CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM shingles s2
                                         WHERE s2.doc_id = c.doc_id) AS frac
      FROM corpus c JOIN bench b ON c.sh = b.sh
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_shared, round(frac, 4) AS contaminated_frac
    FROM hits
    WHERE frac > 0.05
    ORDER BY doc_id
    """,
)
def d_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing > 5% of their
    3-gram shingles with a held-out set (docs 0-9 stand in for the eval
    benchmark). The shingle set of the benchmark is tiny → broadcast;
    one pass over corpus shingles."""
    from ..operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs)  # (id, sh) distinct
    bench = sh.filter(F.col("id") < 10).select("sh").distinct()
    corpus = sh.filter(F.col("id") >= 10)
    counts = corpus.groupBy("id").agg(F.count("*").alias("n_total"))
    hits = (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
    )
    frac = F.col("n_shared") / F.col("n_total")
    return (
        hits.join(counts, "id")
        .filter(frac > 0.05)
        .select(
            F.col("id").alias("doc_id"),
            "n_shared",
            F.round(frac, 4).alias("contaminated_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "t_repetition",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bigrams AS (
      SELECT doc_id, concat_ws(' ', w[i], w[i+1]) AS bg
      FROM words, UNNEST(range(1, len(w))) AS t(i)
      WHERE len(w) >= 2
    ),
    freq AS (
      SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS n
      FROM bigrams GROUP BY doc_id, bg
    ),
    tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS total FROM freq GROUP BY doc_id)
    SELECT doc_id, bg AS top_bigram, n AS top_count,
           round(n * 1.0 / total, 4) AS top_frac
    FROM (
      SELECT f.doc_id, f.bg, f.n, t.total,
             row_number() OVER (PARTITION BY f.doc_id
                                ORDER BY f.n DESC, length(f.bg), f.bg) AS rn
      FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    ) ranked
    WHERE rn = 1
    ORDER BY doc_id
    """,
)
def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (Gopher-style): the most frequent word bigram
    per doc and its frequency share. High top_frac = boilerplate/spam.

    Tie-break for equal counts: shortest bigram, then lexicographic —
    encoded identically in both engines (max_by tuple vs window)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    idx = F.sequence(F.lit(1), F.size("w") - 1)
    gram = F.transform(idx, lambda i: F.concat_ws(" ", F.element_at("w", i), F.element_at("w", i + 1)))
    bigrams = words.filter(F.size("w") >= 2).select("doc_id", F.explode(gram).alias("bg"))
    from pyspark.sql import Window as W

    freq = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("n"))
    tot = freq.groupBy("doc_id").agg(F.sum("n").alias("total"))
    w = W.partitionBy("doc_id").orderBy(F.desc("n"), F.length("bg"), F.asc("bg"))
    return (
        freq.join(tot, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bg").alias("top_bigram"),
            F.col("n").alias("top_count"),
            F.round(F.col("n") / F.col("total"), 4).alias("top_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "t_redact_pii",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                              '@example.com or +1-555-010', CAST(doc_id % 10 AS VARCHAR), ' now')
                  ELSE text END AS text
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9() .-]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
           CAST(CASE WHEN text LIKE '%@%' THEN 1 ELSE 0 END AS INT) AS had_email
    FROM aug
    ORDER BY doc_id
    """,
)
def t_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex redaction of emails and phone numbers
    (synthetic PII is injected into every 5th doc so the operator has
    real work; same injection in the oracle)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-010"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit(" now"),
            ),
        ).otherwise(F.col("text")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.col("text"), r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
        ),
        r"\+?[0-9][0-9() .-]{7,}[0-9]",
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        redacted.alias("redacted"),
        F.col("text").contains("@").cast("int").alias("had_email"),
    ).orderBy("doc_id")


@query(
    "d_levenshtein_candidates",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    sigs AS (
      SELECT doc_id,
             {', '.join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(8))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM sigs
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(substr(da.text, 1, 80), substr(db.text, 1, 80)) AS INT) AS lev_prefix
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    ORDER BY doc_a, doc_b
    """,
)
def d_levenshtein_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification on LSH candidate pairs: levenshtein over
    80-char prefixes. The cheap-verifier tier between banding and full
    Jaccard — only candidate pairs pay the quadratic string cost."""
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        minhash_signatures(word_shingles(docs, distinct=False), hash_fn="md5")  # oracle pins md5
    )
    da = docs.select(F.col("doc_id").alias("doc_a"), F.substring("text", 1, 80).alias("ta"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.substring("text", 1, 80).alias("tb"))
    return (
        pairs.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        # prefix tables are corpus-sized — plain shuffle joins (AQE may
        # still broadcast at small SF)
        .join(da, "doc_a")
        .join(db, "doc_b")
        .select("doc_a", "doc_b", F.levenshtein("ta", "tb").alias("lev_prefix"))
        .orderBy("doc_a", "doc_b")
    )


# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-4 operator additions.
#
# Corpus curation: benchmark decontamination (check + apply), PII
# detection/redaction, URL parse + canonicalization dedup, SemDeDup-style
# centroid pruning, DSIR-style importance weights, exact
# repeated-substring report. Monitoring: KS and PSI distribution drift,
# rolling-window z-score anomalies, period-over-period comparison,
# functional-dependency audit, bootstrap confidence intervals,
# k-anonymity reporting. Time series: multi-resolution time-bucket
# rollup, EWMA smoothing. Joins/graph: time-band join, triangle counting,
# k-core decomposition, last-touch attribution. Retrieval: cosine range
# search. Evaluation: LSH recall vs exact-Jaccard truth, ANN recall@k of
# IVF vs exact KNN — the production paths measured against their exact
# twins.
#
# All are Spark-first DataFrame/SQL compositions with DuckDB oracles;
# each docstring carries the 100 TB design note (shuffle keys, candidate
# bounding, broadcast sides).
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W
from .dedup import _CONTAM_MIN_RATIO, _DUCK_CONTAM, _EVAL_MOD

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


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

_PMI_MIN_PAIR = 5

@query(
    "t_cooccurrence_pmi",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bigrams AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM words, UNNEST(range(1, len(w))) AS t(i)
      WHERE len(w) >= 2
    ),
    uni AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n_w FROM (
        SELECT w1 AS word FROM bigrams
        UNION ALL SELECT w2 AS word FROM bigrams
      ) GROUP BY word
    ),
    bi AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
      FROM bigrams GROUP BY w1, w2
    ),
    tot AS (
      SELECT CAST(sum(n_xy) AS BIGINT) AS nb,
             (SELECT CAST(sum(n_w) AS BIGINT) FROM uni) AS nu
      FROM bi
    )
    SELECT b.w1, b.w2, b.n_xy,
           round(ln((b.n_xy * 1.0 / t.nb)
                    / ((u1.n_w * 1.0 / t.nu) * (u2.n_w * 1.0 / t.nu))), 3) AS pmi
    FROM bi b
    JOIN uni u1 ON u1.word = b.w1
    JOIN uni u2 ON u2.word = b.w2
    CROSS JOIN tot t
    WHERE b.n_xy >= {_PMI_MIN_PAIR}
    ORDER BY pmi DESC, b.w1, b.w2
    LIMIT 30
    """,
)
def t_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs — the
    collocation detector ("new york" vs chance co-occurrence) that
    seeds phrase vocabularies for tokenizers and feeds association
    mining. PMI = ln(p(xy) / (p(x)·p(y))) with the pair distribution
    from adjacent bigrams and the word distribution from the bigram
    slots (so both marginals sum to 1 over the same universe).

    Scale shape: one token-pair explode (the word_shingles n=2 shape),
    one bigram groupBy, one unigram groupBy over the two slots — all
    partial-aggregating map-side; the unigram side joins back onto the
    VOCABULARY-sized bigram frame, never the corpus (the t_bigram_lm
    discipline). The min-count floor ({m}) is also the hot-key guard:
    stop-word pairs dominate counts but their PMI is strongly negative,
    and rare pairs below the floor are PMI noise. Counts integer; one
    ln per output row over identical rational operands; rounded to 3
    before the top-30 sort with (w1, w2) tiebreak.
    """.format(m=_PMI_MIN_PAIR)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    bigrams = (
        words.filter(F.size("w") >= 2)
        .select(
            F.posexplode(F.slice("w", 1, F.size("w") - 1)).alias("i", "w1"),
            F.col("w").alias("w_full"),
        )
        .select("w1", F.col("w_full")[F.col("i") + 1].alias("w2"))
    )
    bi = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n_xy"))
    uni = (
        bigrams.select(F.col("w1").alias("word"))
        .unionAll(bigrams.select(F.col("w2").alias("word")))
        .groupBy("word")
        .agg(F.count("*").alias("n_w"))
    )
    tot = bi.agg(F.sum("n_xy").alias("nb")).crossJoin(
        uni.agg(F.sum("n_w").alias("nu"))
    )
    u1, u2 = uni.alias("u1"), uni.alias("u2")
    out = (
        bi.filter(F.col("n_xy") >= _PMI_MIN_PAIR)
        .join(u1, F.col("u1.word") == F.col("w1"))
        .join(u2, F.col("u2.word") == F.col("w2"))
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_xy",
            F.round(
                F.log(
                    (F.col("n_xy") / F.col("nb"))
                    / ((F.col("u1.n_w") / F.col("nu")) * (F.col("u2.n_w") / F.col("nu")))
                ),
                3,
            ).alias("pmi"),
        )
    )
    return out.orderBy(F.desc("pmi"), "w1", "w2").limit(30)

_KW_TOPK = 3

_KW_DOC_LIMIT = 40

@query(
    "t_top_keywords_per_doc",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
      FROM tokens GROUP BY doc_id, word
    ),
    df AS (
      SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
    ),
    d AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tokens),
    scored AS (
      SELECT tf.doc_id, tf.word,
             round(tf.tf * ln(d.n_docs * 1.0 / df.df), 4) AS tfidf
      FROM tf JOIN df ON df.word = tf.word CROSS JOIN d
    ),
    ranked AS (
      SELECT doc_id, word, tfidf,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, word
             ) AS rk
      FROM scored
    )
    SELECT doc_id, rk, word, tfidf
    FROM ranked
    WHERE rk <= {_KW_TOPK} AND doc_id < {_KW_DOC_LIMIT}
    ORDER BY doc_id, rk
    """,
)
def t_top_keywords_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} TF-IDF keywords per document — the per-document keyword
    extraction that labels corpus clusters and powers "about"
    summaries (t_tfidf ranks globally; this ranks WITHIN each doc via
    a bounded per-key top-k).

    Scale shape: tf and df are the standard two groupBys
    (vocabulary-bounded df side joins back onto the tf frame); the
    per-doc ranking is a doc-keyed window — the w_topk_orders pattern,
    no global sort. Scores are tf·ln(D/df) over integer operands,
    rounded to 4 BEFORE ranking so the rank and the reported value use
    the same number on both engines, with the word tiebreak pinning
    equal scores. The doc_id < {dl} output gate keeps the row count
    driver-friendly; the plan is identical without it.
    """.format(k=_KW_TOPK, dl=_KW_DOC_LIMIT)
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = tokens.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    d = tokens.agg(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(d))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
        ),
    )
    return (
        ranked.filter((F.col("rk") <= _KW_TOPK) & (F.col("doc_id") < _KW_DOC_LIMIT))
        .select("doc_id", "rk", "word", "tfidf")
        .orderBy("doc_id", "rk")
    )

_ZIPF_MIN_FREQ = 5

_ZIPF_TOP = 200

@query(
    "t_zipf_fit",
    oracle=f"""
    WITH freq AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word HAVING count(*) >= {_ZIPF_MIN_FREQ}
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rk
      FROM freq
    ),
    lg AS (
      SELECT round(ln(rk), 6) AS x, round(ln(n), 6) AS y
      FROM ranked WHERE rk <= {_ZIPF_TOP}
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS nd,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy,
             sum(y * y) AS syy
      FROM lg
    )
    SELECT CAST(nd AS BIGINT) AS n_words,
           round(-(nd * sxy - sx * sy) / (nd * sxx - sx * sx), 4) AS zipf_exponent,
           round(((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
                 / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 4) AS r2
    FROM m
    """,
)
def t_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus word-frequency distribution:
    log-log OLS of frequency against rank for the top {t} words
    (freq ≥ {f}), reporting the Zipf exponent and R² — natural text
    sits near exponent 1 with high R²; boilerplate floods, template
    spam, and synthetic filler bend the curve, making this a
    corpus-level quality screen beside the per-doc Gopher rules. The
    synthetic testdata corpus DEMONSTRATES the screen: its vocabulary
    is near-uniform, and the fit correctly reports exponent ~0.2 with
    R² ~0.06 — the "this is not natural text" signature (pinned by
    test_round4c).

    Scale shape: one vocabulary groupBy (map-side partials over 100 TB
    of tokens), rank via a window over the FREQUENCY-FILTERED
    vocabulary (the min-freq floor is what bounds the ranked frame —
    rare words are noise for the fit anyway), closed-form OLS on the
    ≤{t}-row log-log frame. x/y are ln() of integers rounded to 6
    BEFORE the moment sums, so both engines sum identical operands and
    the ≤1-ulp association-order residue is absorbed by the round-4
    outputs (the g_pagerank float-accumulation precedent).
    """.format(t=_ZIPF_TOP, f=_ZIPF_MIN_FREQ)
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= _ZIPF_MIN_FREQ)
    )
    ranked = freq.select(
        "n", F.row_number().over(W.orderBy(F.desc("n"), "word")).alias("rk")
    ).filter(F.col("rk") <= _ZIPF_TOP)
    lg = ranked.select(
        F.round(F.log("rk"), 6).alias("x"), F.round(F.log("n"), 6).alias("y")
    )
    m = lg.agg(
        F.count("*").cast("double").alias("nd"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd, sx, sy = F.col("nd"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    return m.select(
        nd.cast("long").alias("n_words"),
        F.round(-(nd * sxy - sx * sy) / (nd * sxx - sx * sx), 4).alias(
            "zipf_exponent"
        ),
        F.round(
            ((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
            / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
            4,
        ).alias("r2"),
    )

_BURST_MIN_FREQ = 10

_BURST_TOP = 30

@query(
    "t_burstiness_report",
    oracle=f"""
    WITH per_doc AS (
      SELECT word, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word, doc_id
    ),
    docs_n AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents),
    stats AS (
      SELECT word,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(sum(c * c) AS BIGINT) AS ss,
             CAST(count(*) AS BIGINT) AS n_docs_with
      FROM per_doc GROUP BY word
    )
    SELECT word, total, n_docs_with,
           round((CAST(ss AS DOUBLE) / d - (CAST(total AS DOUBLE) / d) * (CAST(total AS DOUBLE) / d))
                 / (CAST(total AS DOUBLE) / d), 4) AS vmr
    FROM stats CROSS JOIN docs_n
    WHERE total >= {_BURST_MIN_FREQ}
    ORDER BY vmr DESC, word
    LIMIT {_BURST_TOP}
    """,
)
def t_burstiness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness: variance-to-mean ratio of each word's per-doc
    count over ALL docs (absent = 0) — Katz's burstiness diagnostic:
    Poisson-scattered function words sit near VMR 1, topical words
    burst (a doc that mentions them mentions them often, VMR ≫ 1).
    With Zipf (t_zipf_fit) this is the second corpus-level linguistic
    fingerprint: template spam is low-burst AND non-Zipfian; topic
    diversity shows as a healthy high-VMR tail.

    Scale shape: one (word, doc) groupBy then one word groupBy — both
    partial-aggregating; the zero-count docs are handled
    ARITHMETICALLY (moments over all D docs derive from the nonzero
    sums + the doc count — no explode of the word x doc zero matrix,
    which at 100 TB would dwarf the corpus). Integer sums; the VMR
    division promotes to double identically on both engines; min-freq
    floor bounds the report, (vmr, word) tiebreak pins the top-{t}.
    """.format(t=_BURST_TOP)
    docs = load_table(spark, sf_dir, "documents")
    per_doc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word", "doc_id")
        .agg(F.count("*").alias("c"))
    )
    d_n = docs.agg(F.count("*").alias("d"))
    stats = per_doc.groupBy("word").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count("*").alias("n_docs_with"),
    )
    d = F.col("d").cast("double")
    mean = F.col("total").cast("double") / d
    return (
        stats.crossJoin(F.broadcast(d_n))
        .filter(F.col("total") >= _BURST_MIN_FREQ)
        .select(
            "word",
            "total",
            "n_docs_with",
            F.round((F.col("ss").cast("double") / d - mean * mean) / mean, 4).alias(
                "vmr"
            ),
        )
        .orderBy(F.desc("vmr"), "word")
        .limit(_BURST_TOP)
    )


# ===========================================================================
# section consolidated from plans/round6b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation registrations: segment-level corpus dedup,
# boilerplate-prefix detection, cross-source quality-score quantile
# normalization, and sequence-length bucketing.
#
# Four more first-class training-data-pipeline operators (north-star
# extensions per the build brief — the reference repo's only dedup is
# keep-last row dedup, /root/reference/etl/transform.py, and it has no
# corpus analytics at all):
#
# - ``d_segment_dedup_report`` / ``d_segment_dedup_apply``: C4-style
#   segment-granularity dedup (Raffel et al. 2020 removed repeated
#   three-sentence spans corpus-wide, keep-first). The corpus here has no
#   sentence boundaries, so the segmenter is fixed non-overlapping
#   8-token windows — the operator shape (segment -> corpus-wide
#   keep-first -> reassemble) is identical.
# - ``t_boilerplate_prefix_report``: per-source most-common leading
#   prefix + its share — the diagnostic behind crawl boilerplate
#   stripping (RefinedWeb/trafilatura remove per-site header/footer
#   lines; the detector is exactly "which prefix dominates this
#   source").
# - ``t_quality_quantile_normalize``: cross-source score calibration —
#   map each document's within-source rank onto the POOLED score
#   distribution (quantile normalization). Quality classifiers drift
#   across domains; rank-based remapping makes a single global
#   threshold meaningful (used before any corpus-wide
#   quality-percentile cut).
# - ``b_length_bucketing``: padding-waste report over power-of-two
#   length buckets — the standard pre-packing diagnostic (pad-to-bucket
#   wastes `bucket - len` tokens per doc; compare against
#   ``d_pack_sequences``' first-fit packing).
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

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


# ===========================================================================
# section consolidated from plans/round6e_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, functions as F

_BPE_TOP = 20

@query(
    "t_bpe_pair_stats",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
      SELECT word, count(*) AS cnt FROM w WHERE len(word) >= 2 GROUP BY word
    ),
    pr AS (
      SELECT substr(word, i, 1) || ' ' || substr(word, i + 1, 1) AS pair, cnt
      FROM wc, UNNEST(range(1, len(word))) AS t(i)
    )
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
    FROM pr GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {_BPE_TOP}
    """,
)
def t_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration (Sennrich et al.): corpus-weighted
    adjacent character-pair frequencies within words, top {20} merge
    candidates — the scan a byte-pair-encoding tokenizer trainer runs
    every merge round (here at character granularity; subsequent rounds
    would re-run it over the merged symbol sequences).

    Scale shape: the corpus-sized explode collapses FIRST to the
    vocabulary (word, count) frame via a map-side-combined groupBy —
    pair enumeration then runs over the vocabulary, weighted by count,
    never over raw corpus positions; the pair aggregate is bounded by
    alphabet^2 and the top-k is a TakeOrderedAndProject (no global
    sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.concat(
            F.col("word").substr(i, F.lit(1)),
            F.lit(" "),
            F.col("word").substr(i + 1, F.lit(1)),
        ),
    )
    return (
        wc.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


# ===========================================================================
# section consolidated from plans/round6f_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/graphs.py)
# ===========================================================================

_RAG_W = 32

_RAG_STRIDE = 24

@query(
    "t_rag_chunk_manifest",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    k AS (
      SELECT doc_id, words,
             1 + CAST(ceil(greatest(len(words) - {_RAG_W}, 0)
                           / {_RAG_STRIDE}.0) AS BIGINT) AS n_chunks
      FROM w
    ),
    ch AS (
      SELECT doc_id,
             i AS chunk_idx,
             1 + (i - 1) * {_RAG_STRIDE} AS start_word,
             list_slice(words, 1 + (i - 1) * {_RAG_STRIDE},
                        (i - 1) * {_RAG_STRIDE} + {_RAG_W}) AS cw
      FROM k, UNNEST(range(1, n_chunks + 1)) AS t(i)
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(start_word AS BIGINT) AS start_word,
           CAST(len(cw) AS BIGINT) AS n_words,
           md5(array_to_string(cw, ' ')) AS chunk_hash
    FROM ch
    WHERE len(cw) > 0
    ORDER BY doc_id, chunk_idx
    """,
)
def t_rag_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunk manifest (window {32} words,
    stride {24} — 8 words of overlap): the RAG-serving cut, where
    stride < window guarantees every boundary neighborhood lands wholly
    inside at least one chunk. Emits (doc_id, chunk_idx, start_word,
    n_words, chunk_hash) — exactly what a vector-index loader ingests
    (embed chunk_hash-keyed text, store doc_id/start_word for
    provenance). The trailing chunk may be shorter; a document shorter
    than one window yields exactly one chunk.

    Scale shape: pure narrow column work — chunk enumeration is a
    higher-order sequence/slice expression inside the row (no shuffle,
    no UDF); the manifest inherits the scan's partitioning and the only
    ordering is the output presentation sort. At 100 TB this is a
    map-only pass that pipelines straight into the embedding UDF batch
    (m_multimodal_features' mapInPandas shape).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    base = docs.select("doc_id", words.alias("words"))
    n_chunks = (
        1
        + F.ceil(
            F.greatest(F.size("words") - _RAG_W, F.lit(0)) / float(_RAG_STRIDE)
        )
    ).cast("int")
    ch = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_chunks)).alias("chunk_idx"),
        "words",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (1 + (F.col("chunk_idx") - 1) * _RAG_STRIDE).cast("long").alias(
            "start_word"
        ),
        F.slice(
            "words", (F.col("chunk_idx") - 1) * _RAG_STRIDE + 1, _RAG_W
        ).alias("cw"),
    )
    return (
        ch.filter(F.size("cw") > 0)
        .select(
            "doc_id",
            "chunk_idx",
            "start_word",
            F.size("cw").cast("long").alias("n_words"),
            F.md5(F.concat_ws(" ", "cw")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ===========================================================================
# section consolidated from plans/round6i_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

from .llmdata import _LANG_MARKERS

_LANGID_SCORES_SQL = ", ".join(
    "CAST(sum(CASE WHEN word IN {m} THEN 1 ELSE 0 END) AS BIGINT) AS s_{k}".format(
        m=m, k=k
    )
    for k, m in _LANG_MARKERS.items()
)

@query(
    "t_langid_confusion",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    scores AS (
      SELECT doc_id, {_LANGID_SCORES_SQL}
      FROM tokens GROUP BY doc_id
    ),
    pred AS (
      SELECT doc_id,
             CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                  WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                  ELSE 'fr' END AS predicted_lang
      FROM scores
    ),
    cm AS (
      SELECT d.lang AS actual_lang, p.predicted_lang,
             CAST(count(*) AS BIGINT) AS n
      FROM documents d JOIN pred p ON p.doc_id = d.doc_id
      GROUP BY 1, 2
    )
    SELECT actual_lang, predicted_lang, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY actual_lang), 4)
             AS share_of_actual
    FROM cm
    ORDER BY actual_lang, predicted_lang
    """,
)
def t_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the t_langid marker classifier against the
    labeled ``lang`` column: per (actual, predicted) cell, the count
    and the share of that actual language (the diagonal shares ARE
    per-language recall; 'zh' has no marker set, so its row shows
    exactly where an out-of-vocabulary language lands — 'und' if no
    markers fire). This is the eval harness any derived label column
    needs before it gates a pipeline.

    Scale shape: re-runs the t_langid aggregation (one token explode
    collapsing map-side to per-doc marker counts), joins the doc-sized
    prediction frame to the label column, and reduces to a
    |langs|x|langs+1| matrix; the share window runs over that bounded
    matrix, never data-sized frames.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    aggs = [
        F.sum(F.col("word").isin(*m).cast("int")).cast("long").alias(f"s_{k}")
        for k, m in _LANG_MARKERS.items()
    ]
    scores = tokens.groupBy("doc_id").agg(*aggs)
    best = F.greatest(*[F.col(f"s_{k}") for k in _LANG_MARKERS])
    pred = F.when(best == 0, "und")
    for k in _LANG_MARKERS:
        pred = pred.when(F.col(f"s_{k}") == best, k)
    pred_df = scores.select("doc_id", pred.alias("predicted_lang"))
    cm = (
        docs.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(pred_df, "doc_id")
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )
    return cm.select(
        "actual_lang",
        "predicted_lang",
        "n",
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(W.partitionBy("actual_lang")),
            4,
        ).alias("share_of_actual"),
    ).orderBy("actual_lang", "predicted_lang")


# ===========================================================================
# section consolidated from plans/round6k_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

from .dedup import _AUG_SQL, _augmented_corpus

_HEAD_WORDS = 20

@query(
    "t_normalization_dedup_report",
    oracle=f"""
    WITH {_AUG_SQL.strip()},
    forms AS (
      SELECT 'raw' AS form, md5(text) AS h FROM aug
      UNION ALL
      SELECT 'head{_HEAD_WORDS}',
             md5(array_to_string(
               list_slice(string_split(text, ' '), 1, {_HEAD_WORDS}), ' '))
      FROM aug
      UNION ALL
      SELECT 'word_bag',
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' '))
      FROM aug
    )
    SELECT form,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
           round(1 - count(DISTINCT h) * 1.0 / count(*), 4) AS dup_rate
    FROM forms
    GROUP BY form
    ORDER BY form
    """,
)
def t_normalization_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate rates under three content normal forms over the
    near-dup-augmented corpus: raw text (exact copies only),
    head-{20}-words (catches truncated/appended variants — the
    injected 70%-truncations share their head with the original), and
    the sorted word bag (catches reorderings). The pre-dedup audit
    that says WHICH canonicalization this corpus needs before the d_*
    operators run — each form's dup_rate is the yield that
    canonicalization would add.

    Scale shape: each form is a pure column expression (split / slice
    / sort / hash — no UDF) feeding one distinct-count aggregate;
    Spark rewrites the three count-distincts as expand + partial
    aggregation, so hot hashes combine map-side. Forms union into a
    3-row report.
    """
    corpus = _augmented_corpus(spark, sf_dir)
    w = F.split("text", " ")
    forms = (
        corpus.select(F.lit("raw").alias("form"), F.md5("text").alias("h"))
        .unionAll(
            corpus.select(
                F.lit(f"head{_HEAD_WORDS}").alias("form"),
                F.md5(
                    F.concat_ws(" ", F.slice(w, 1, _HEAD_WORDS))
                ).alias("h"),
            )
        )
        .unionAll(
            corpus.select(
                F.lit("word_bag").alias("form"),
                F.md5(
                    F.concat_ws(" ", F.array_sort(F.array_distinct(w)))
                ).alias("h"),
            )
        )
    )
    return (
        forms.groupBy("form")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_distinct"),
        )
        .select(
            "form",
            "n_docs",
            "n_distinct",
            F.round(
                1 - F.col("n_distinct") * 1.0 / F.col("n_docs"), 4
            ).alias("dup_rate"),
        )
        .orderBy("form")
    )


# ===========================================================================
# section consolidated from plans/round6m_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/curation.py)
# ===========================================================================

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


# ===========================================================================
# section consolidated from plans/round6n_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 13: duplicate-cluster size distribution,
# vocabulary coverage curve, Benjamini-Hochberg FDR, embedding QA.
#
# - ``d_dup_cluster_size_dist``: the size distribution of exact-duplicate
#   clusters over the near-dup-augmented corpus — dedup reports so far
#   give RATES (d_dedup_pipeline_funnel); this gives the SHAPE (is
#   redundancy a few mega-clusters or a long tail of pairs?), which
#   decides whether keep-one dedup or cluster-cap sampling is the right
#   removal policy.
# - ``t_vocab_coverage_curve``: token-mass coverage and OOV rate at vocab
#   cutoffs {100, 1k, 10k} — the vocabulary-size planning curve (how big
#   must the vocab be before OOV is negligible?).
# - ``a_bh_fdr``: Benjamini-Hochberg step-up over the per-event-type
#   weekend-vs-weekday Welch tests — the multiple-testing control layer
#   a_welch_ttest lacks (test 5 hypotheses at alpha=0.05 uncorrected and
#   the family-wise false-positive rate is ~23%).
# - ``e_embedding_qa_report``: per-label embedding sanity — vector
#   counts, L2-norm profile, zero vectors, dimension consistency — the
#   pre-flight every ANN/index build should run before trusting cosine.
# ===========================================================================

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


# ===========================================================================
# section consolidated from plans/round7_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 1: privacy scrubbing and
# split hygiene for LLM training corpora.
#
# - t_pii_scrub_report — per-source PII / blocklist exposure audit
# - t_pii_scrub_apply  — deterministic redaction (regex + term blocklist)
# - t_repetition_ratio — within-document duplicate-bigram fraction
# - b_kfold_assign     — deterministic hash k-fold with per-fold stats
#
# All JVM-side (built-in regex / higher-order functions / hash
# arithmetic — zero Python in any hot path), each with a DuckDB oracle.
# Regex patterns are written in the Java∩RE2 common dialect so both
# engines compile them identically; redaction uses DuckDB's 'g' flag to
# match Spark's replace-all semantics.
# ===========================================================================

_SCRUB_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_LONGNUM_RE = r"\b\d{6,}\b"

_BLOCKLIST = ("customer", "spark")

_BLOCK_RE = r"\b(" + "|".join(_BLOCKLIST) + r")\b"

_BLOCK_SQL_LIST = ", ".join(f"'{t}'" for t in _BLOCKLIST)

@query(
    "t_pii_scrub_report",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '{_SCRUB_EMAIL_RE}'))) AS BIGINT)
             AS email_hits,
           CAST(sum(len(regexp_extract_all(text, '{_IPV4_RE}'))) AS BIGINT)
             AS ipv4_hits,
           CAST(sum(len(regexp_extract_all(text, '{_LONGNUM_RE}'))) AS BIGINT)
             AS longnum_hits,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    w -> w IN ({_BLOCK_SQL_LIST})))) AS BIGINT)
             AS blocklist_hits,
           CAST(sum(CASE WHEN len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_BLOCK_SQL_LIST}))) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_blockterm,
           round(avg(CASE WHEN len(list_filter(string_split(text, ' '),
                                    w -> w IN ({_BLOCK_SQL_LIST}))) > 0
                          THEN 1.0 ELSE 0.0 END), 4) AS blockterm_doc_rate
    FROM documents GROUP BY source ORDER BY source
    """,
)
def t_pii_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII / blocklist exposure audit — the pre-redaction
    report every training-data release runs: occurrence counts for
    email / IPv4 / long-number regex detectors plus a term blocklist,
    and the fraction of documents carrying at least one blocked term.
    (On this synthetic corpus the regex detectors legitimately report
    zero — the report proves the NEGATIVE too; the blocklist terms
    occur and give the oracle non-trivial values. t_pii_detect
    (plans/textops.py, above) is the per-DOCUMENT twin that injects fake
    PII to exercise the regex hits; this is the corpus-level audit a
    release manager reads, plus the term-blocklist category that
    detector lacks.)

    Scale shape: one corpus scan, all detectors evaluated per-row
    inside whole-stage codegen (regexp_count + a higher-order filter on
    the token array), one map-side-combined groupBy(source) — no
    shuffle wider than the per-source partial rows, no UDFs. Detector
    count grows the projection, never the shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    block_hits = F.size(
        F.filter(toks, lambda w: w.isin(*_BLOCKLIST))
    )
    per_doc = docs.select(
        "source",
        F.regexp_count("text", F.lit(_SCRUB_EMAIL_RE)).alias("e"),
        F.regexp_count("text", F.lit(_IPV4_RE)).alias("i"),
        F.regexp_count("text", F.lit(_LONGNUM_RE)).alias("n"),
        block_hits.alias("b"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("e").cast("long").alias("email_hits"),
            F.sum("i").cast("long").alias("ipv4_hits"),
            F.sum("n").cast("long").alias("longnum_hits"),
            F.sum("b").cast("long").alias("blocklist_hits"),
            F.sum((F.col("b") > 0).cast("int")).cast("long").alias(
                "docs_with_blockterm"
            ),
            F.round(F.avg((F.col("b") > 0).cast("double")), 4).alias(
                "blockterm_doc_rate"
            ),
        )
        .orderBy("source")
    )

@query(
    "t_pii_scrub_apply",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_SCRUB_EMAIL_RE}'))
                + len(regexp_extract_all(text, '{_IPV4_RE}'))
                + len(regexp_extract_all(text, '{_BLOCK_RE}')) AS BIGINT)
             AS n_redactions,
           md5(regexp_replace(regexp_replace(regexp_replace(
                 text, '{_SCRUB_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_IPV4_RE}', '<IP>', 'g'),
                 '{_BLOCK_RE}', '<TERM>', 'g')) AS scrub_hash,
           CAST(strlen(regexp_replace(regexp_replace(regexp_replace(
                 text, '{_SCRUB_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_IPV4_RE}', '<IP>', 'g'),
                 '{_BLOCK_RE}', '<TERM>', 'g')) AS BIGINT) AS scrub_len
    FROM documents ORDER BY doc_id
    """,
)
def t_pii_scrub_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction APPLY: emails → <EMAIL>, IPv4 → <IP>, blocklist terms
    → <TERM> (replace-all on both engines; DuckDB needs the explicit
    'g' flag to match Spark's regexp_replace semantics). The gate
    output hashes the scrubbed text (md5 over identical utf-8 bytes on
    both engines) so the driver compare certifies the REDACTED BYTES,
    not just the counts.

    Scale shape: pure per-row JVM regex inside codegen — embarrassingly
    parallel, no shuffle at all before the gate's presentation orderBy.
    On a 100 TB corpus this is a map-only rewrite whose cost is one
    read + one write.
    """
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _SCRUB_EMAIL_RE, "<EMAIL>"),
            _IPV4_RE,
            "<IP>",
        ),
        _BLOCK_RE,
        "<TERM>",
    )
    n_red = (
        F.regexp_count("text", F.lit(_SCRUB_EMAIL_RE))
        + F.regexp_count("text", F.lit(_IPV4_RE))
        + F.regexp_count("text", F.lit(_BLOCK_RE))
    )
    return docs.select(
        "doc_id",
        n_red.cast("long").alias("n_redactions"),
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrub_hash"),
        F.octet_length(F.encode(scrubbed, "UTF-8")).cast("long").alias(
            "scrub_len"
        ),
    ).orderBy("doc_id")

@query(
    "t_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS s FROM documents
    ),
    bigrams AS (
      SELECT doc_id, source, s[i] || ' ' || s[i + 1] AS bg
      FROM toks, UNNEST(range(1, len(s))) AS t(i)
    ),
    per_doc AS (
      SELECT doc_id, source,
             count(*) AS n_bg,
             count(DISTINCT bg) AS n_distinct
      FROM bigrams GROUP BY doc_id, source
    ),
    frac AS (
      SELECT source,
             1.0 - n_distinct * 1.0 / n_bg AS dup_frac
      FROM per_doc WHERE n_bg > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(dup_frac), 4) AS avg_dup_frac,
           round(max(dup_frac), 4) AS max_dup_frac,
           CAST(sum(CASE WHEN dup_frac > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_over_half
    FROM frac GROUP BY source ORDER BY source
    """,
)
def t_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter statistic (the duplicate-n-gram
    family of quality filters, e.g. the Gopher/MassiveText rules):
    duplicate-bigram fraction = 1 − distinct/total bigrams per doc,
    aggregated per source with the heavy-tail markers a filter
    threshold needs (max, #docs over 0.5). High repetition flags
    boilerplate, keyword stuffing, and degenerate generations.

    Scale shape: bigrams via one posexplode + a per-doc window-free
    self-pairing (slide the token array with higher-order transform —
    no join, no window); the per-doc distinct count is a (doc_id, bg)
    groupBy that AQE coalesces, then one map-side-combined
    groupBy(source). Everything partitions on doc_id — no skew (docs
    are bounded length; a 100 TB corpus is many docs, not long ones).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # bigram list per doc via array slide: zip tokens with their tails —
    # transform over indices avoids any explode-join or window
    bigrams = F.expr(
        "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
        " (w, i) -> concat(w, ' ', element_at(split(text, ' '), i + 2)))"
    )
    per_doc = (
        docs.select("doc_id", "source", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_bg"),
            F.countDistinct("bg").alias("n_distinct"),
        )
        .where(F.col("n_bg") > 0)
        .select(
            "source",
            (1.0 - F.col("n_distinct") / F.col("n_bg")).alias("dup_frac"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("dup_frac"), 4).alias("avg_dup_frac"),
            F.round(F.max("dup_frac"), 4).alias("max_dup_frac"),
            F.sum((F.col("dup_frac") > 0.5).cast("int")).cast("long").alias(
                "n_docs_over_half"
            ),
        )
        .orderBy("source")
    )


# ===========================================================================
# section consolidated from plans/round7d_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

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


# ===========================================================================
# section consolidated from plans/round7f_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/causal.py)
# ===========================================================================

_FH_BUCKETS = 64

@query(
    "t_feature_hashing",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, source,
             (instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
               + (instr('0123456789abcdef', substr(md5(w), 2, 1)) - 1)
               AS bucket_raw,
             CASE WHEN (instr('0123456789abcdef', substr(md5(w), 3, 1)) - 1)
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM words
    ),
    feats AS (
      SELECT doc_id, source, bucket_raw % {_FH_BUCKETS} AS bucket,
             CAST(sum(sgn) AS BIGINT) AS v
      FROM hashed GROUP BY 1, 2, 3
    ),
    per_doc AS (
      SELECT doc_id, source,
             sqrt(sum(v * v * 1.0)) AS l2,
             sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS nnz
      FROM feats GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(l2), 4) AS avg_l2,
           round(avg(nnz), 4) AS avg_nnz,
           CAST(max(nnz) AS BIGINT) AS max_nnz
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def t_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words featurization census: every token
    hashes to one of {_FH_BUCKETS} signed buckets (bucket = first two
    md5 nibbles mod buckets, sign = third-nibble parity — the
    Weinberger et al. signed hashing that keeps E[collision noise]=0),
    per-document features are the signed counts, and the report carries
    per-source L2-norm and sparsity profiles — the sanity check before
    shipping fixed-width features to a streaming model. No vocabulary
    is materialized anywhere: that vocabulary-freeness is the entire
    point of the hashing trick at 100 TB.

    Scale shape: explode → hash in codegen → (doc, bucket) map-side-
    combined groupBy → per-doc fold → per-source aggregate. Bucket
    count is a literal; nothing holds a dictionary, so the plan is
    identical at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    nib = lambda i: (  # noqa: E731
        F.expr(
            f"locate(substr(md5(w), {i}, 1), '0123456789abcdef') - 1"
        )
    )
    hashed = words.select(
        "doc_id",
        "source",
        ((nib(1) * 16 + nib(2)) % _FH_BUCKETS).alias("bucket"),
        F.when(nib(3) % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    )
    feats = hashed.groupBy("doc_id", "source", "bucket").agg(
        F.sum("sgn").cast("long").alias("v")
    )
    per_doc = feats.groupBy("doc_id", "source").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v") * 1.0)).alias("l2"),
        F.sum((F.col("v") != 0).cast("int")).alias("nnz"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("l2"), 4).alias("avg_l2"),
            F.round(F.avg("nnz"), 4).alias("avg_nnz"),
            F.max("nnz").cast("long").alias("max_nnz"),
        )
        .orderBy("source")
    )
