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
