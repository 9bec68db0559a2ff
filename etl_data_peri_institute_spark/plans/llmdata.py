"""LLM-training-data pipeline operators (north star, BASELINE.json).

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search over embeddings (brute-force KNN, centroid/IVF assignment), and
text analysis (token counting, quality scoring, language ID, document
fingerprinting) — each as a declarative Spark plan over the synthetic
``documents`` / ``embeddings`` tables with a DuckDB oracle twin.

Cross-engine determinism notes:

- All hashing is md5 (identical hex output in Spark and DuckDB); MinHash
  "hash functions" are lexicographic mins of seeded md5 hex strings.
- Shingling uses 1-indexed element access (Spark ``element_at`` == DuckDB
  ``list[i]``) over a single-space ``split``.
- Similarity queries output integer ranks/ids only — float cosine values
  never enter the hash compare, so summation-order ulp noise can't flip
  a result (only a near-exact tie could, and random vectors don't tie).

Scale design: everything is shuffle-on-key. MinHash LSH is the linear-
cost path (band signature groupBy — no O(n²) pair join ever materializes
beyond colliding buckets); brute-force KNN is the small-query-set
baseline (broadcast the queries, one pass over the corpus); the pairwise
Jaccard verifier only runs on LSH candidates at scale (here it doubles
as its own oracle-checked operator on a bounded doc range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

N_MINHASH = 8  # 4 bands x 2 rows: P(candidate) = 1-(1-j^2)^4


def _words(df: DataFrame) -> DataFrame:
    """documents -> (doc_id, w: array<string>) split on single spaces."""
    return df.select("doc_id", F.split("text", " ").alias("w"))


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """documents -> distinct (doc_id, sh) word n-gram shingles.

    Pure column expressions: sequence + transform + explode (no UDF).
    """
    idx = F.sequence(F.lit(1), F.size("w") - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at("w", i + k) for k in range(n)]),
    )
    return (
        _words(df)
        .filter(F.size("w") >= n)
        .select("doc_id", F.explode(gram).alias("sh"))
        .distinct()
    )


_DUCK_SHINGLES = """
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shingles AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    )
"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "d_exact_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 50
    )
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM corpus
    GROUP BY md5(text)
    ORDER BY keep_doc_id
    """,
)
def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep lowest doc_id.

    The corpus is augmented with a duplicated slice so the dedup actually
    collapses rows. At 100 TB this is one shuffle on the 128-bit content
    hash (never on the text itself) with map-side partial aggregation.
    """
    from ..operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    dupes = docs.filter(F.col("doc_id") < 50).withColumn("doc_id", F.col("doc_id") + 1000000)
    corpus = docs.select("doc_id", "text").unionByName(dupes.select("doc_id", "text"))
    return (
        exact_dedup(corpus)
        .select("content_hash", F.col("keep_id").alias("keep_doc_id"), "n_copies")
        .orderBy("keep_doc_id")
    )


@query(
    "d_minhash_lsh_pairs",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    sigs AS (
      SELECT doc_id,
             {', '.join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM sigs
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
)
def d_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates: shingle → MinHash → band → bucket self-join.

    The LSH scale path: cost is linear in corpus size plus the size of
    colliding buckets — the O(n²) pair space is never enumerated. Bands
    are unpivoted with stack() and the self-join key is (band, signature),
    so Spark shuffles both sides on the bucket key.
    """
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures as mh_sigs, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        mh_sigs(word_shingles(docs, distinct=False), hash_fn="md5"),  # oracle pins md5
        bands=4,
        rows_per_band=2,
    )
    return (
        pairs.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        .orderBy("doc_a", "doc_b")
    )


@query(
    "d_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_common
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(i.n_common * 1.0 / (ca.n + cb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN counts ca ON ca.doc_id = i.doc_a
    JOIN counts cb ON cb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) > 0.1
    ORDER BY doc_a, doc_b
    """,
)
def d_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.1).

    The verification stage behind LSH: intersections come from a shuffle
    join on the shingle itself, so only docs sharing a shingle ever pair
    up (common-shingle skew is the known hazard at scale — salt or drop
    ultra-frequent shingles; here the synthetic vocab keeps it bounded).

    ``max_doc_freq=None`` is passed EXPLICITLY: the pinned DuckDB oracle
    states uncapped Jaccard, and the engine's capped default would make
    parity depend on the data's shingle-frequency distribution (the cap
    silently changes both the pair set and the denominator once any
    shingle clears the floor). Production dedup callers keep the capped
    default — the cap is the scale guard, this query is the parity pin.
    """
    from ..operators.dedup import jaccard_pairs, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(word_shingles(docs), min_jaccard=0.1, max_doc_freq=None)
    return (
        pairs.select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.round("jaccard", 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _hex4_to_int_sql(expr: str) -> str:
    """Engine-portable int value of a 4-hex-char expression (both Spark SQL
    and DuckDB have 1-based ``instr`` and ``substr``)."""
    digit = "(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
    return " + ".join(
        f"{digit.format(h=expr, i=i + 1)} * {16 ** (3 - i)}" for i in range(4)
    )


_SIMHASH_BITS = 16


def _simhash_sql() -> str:
    """Shared SQL body for the 16-bit SimHash (dialect-common subset).

    Per word occurrence: v = int(md5(word)[:4]); per bit k the weighted
    vote is +1/-1; the fingerprint sets bit k iff the vote sum is > 0.
    """
    v = _hex4_to_int_sql("md5(word)")
    # floor() before the modulo: DuckDB CAST(double AS BIGINT) rounds while
    # Spark truncates — floor is the dialect-portable integer division.
    bit_votes = ", ".join(
        f"sum(CASE WHEN CAST(floor(({v}) / {1 << k}) AS BIGINT) % 2 = 1"
        f" THEN 1 ELSE -1 END) AS b{k}"
        for k in range(_SIMHASH_BITS)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN b{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(_SIMHASH_BITS)
    )
    return bit_votes, fingerprint


@query(
    "d_simhash",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    votes AS (
      SELECT doc_id, {votes} FROM tokens GROUP BY doc_id
    )
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash
    FROM votes
    ORDER BY doc_id
    """.format(votes=_simhash_sql()[0], fp=_simhash_sql()[1]),
)
def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit) document fingerprints.

    Near-dup docs differ in few bits (pairing = group by fingerprint or
    hamming-ball probing over bit-rotated keys). Integer bit arithmetic
    only — expressible in both engines; production widens to 64 bits via
    xxhash64.
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    # Spark side uses conv() + shiftright (one md5 per token, JVM-native
    # bit ops); the oracle's instr-digit expansion computes the same value.
    votes = ", ".join(
        f"sum(CASE WHEN (shiftright(v, {k}) & 1) = 1 THEN 1 ELSE -1 END) AS b{k}"
        for k in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(_SIMHASH_BITS)
    )
    return spark.sql(
        f"""
        WITH tokens AS (
          SELECT doc_id,
                 CAST(conv(substr(md5(word), 1, 4), 16, 10) AS BIGINT) AS v
          FROM (SELECT doc_id, explode(split(text, ' ')) AS word FROM documents)
        ),
        votes AS (
          SELECT doc_id, {votes} FROM tokens GROUP BY doc_id
        )
        SELECT doc_id, CAST({fp} AS BIGINT) AS simhash
        FROM votes
        ORDER BY doc_id
        """
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "t_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS re_tokens,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def t_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split + BPE-ish regex token runs."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("ws_tokens"),
            F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias("re_tokens"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


_STOPWORDS = ("the", "a", "of", "and", "to", "in")


@query(
    "t_quality_score",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             round(avg(length(word)), 4) AS avg_word_len,
             round(sum(CASE WHEN word IN {_STOPWORDS} THEN 1 ELSE 0 END) * 1.0
                   / count(*), 4) AS stopword_ratio,
             round(count(DISTINCT word) * 1.0 / count(*), 4) AS distinct_ratio
      FROM tokens GROUP BY doc_id
    )
    SELECT doc_id, n_words, avg_word_len, stopword_ratio, distinct_ratio,
           CAST((CASE WHEN n_words >= 50 THEN 1 ELSE 0 END)
              + (CASE WHEN stopword_ratio >= 0.02 THEN 1 ELSE 0 END)
              + (CASE WHEN distinct_ratio >= 0.1 THEN 1 ELSE 0 END)
              + (CASE WHEN avg_word_len >= 3.0 AND avg_word_len <= 10.0
                      THEN 1 ELSE 0 END) AS INT) AS quality_tier
    FROM stats
    ORDER BY doc_id
    """,
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, stopword ratio, lexical diversity.

    The standard pre-training filter features (Gopher/C4-style rules) as
    one aggregation pass over exploded tokens; the composite is a count
    of passed rule thresholds (an integer tier — threshold comparisons on
    identical doubles are engine-stable, unlike rounding a weighted sum
    whose decimal expansion lands on round-half boundaries).
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    stats = tokens.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.round(F.avg(F.length("word")), 4).alias("avg_word_len"),
        F.round(
            F.sum(F.col("word").isin(*_STOPWORDS).cast("int")) / F.count("*"), 4
        ).alias("stopword_ratio"),
        F.round(F.countDistinct("word") / F.count("*"), 4).alias("distinct_ratio"),
    )
    tier = (
        (F.col("n_words") >= 50).cast("int")
        + (F.col("stopword_ratio") >= 0.02).cast("int")
        + (F.col("distinct_ratio") >= 0.1).cast("int")
        + ((F.col("avg_word_len") >= 3.0) & (F.col("avg_word_len") <= 10.0)).cast("int")
    )
    return stats.withColumn("quality_tier", tier.cast("int")).orderBy("doc_id")


_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
}


@query(
    "t_langid",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    scores AS (
      SELECT doc_id,
             {scores}
      FROM tokens GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM scores
    ORDER BY doc_id
    """.format(
        scores=", ".join(
            "CAST(sum(CASE WHEN word IN {m} THEN 1 ELSE 0 END) AS BIGINT) AS s_{k}".format(
                m=m, k=k
            )
            for k, m in _LANG_MARKERS.items()
        )
    ),
)
def t_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: stopword-marker voting with deterministic tie order.

    An n-gram/marker heuristic (fastText-style features degenerated to
    unigram markers); ties resolve en > es > de > fr, no markers → 'und'.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    aggs = [
        F.sum(F.col("word").isin(*m).cast("int")).cast("long").alias(f"s_{k}")
        for k, m in _LANG_MARKERS.items()
    ]
    scores = tokens.groupBy("doc_id").agg(*aggs)
    best = F.greatest(*[F.col(f"s_{k}") for k in _LANG_MARKERS])
    pred = F.when(best == 0, "und")
    for k in _LANG_MARKERS:
        pred = pred.when(F.col(f"s_{k}") == best, k)
    return scores.select("doc_id", pred.alias("predicted_lang")).orderBy("doc_id")


@query(
    "t_fingerprint",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shingles AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    )
    SELECT d.doc_id,
           md5(lower(trim(d.text))) AS content_md5,
           s.min_shingle_hash
    FROM documents d
    JOIN (SELECT doc_id, min(md5(sh)) AS min_shingle_hash FROM shingles GROUP BY doc_id) s
      ON d.doc_id = s.doc_id
    ORDER BY d.doc_id
    """,
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content hash + min-shingle (winnowing
    degenerate case) — the building blocks for both exact and fuzzy dedup."""
    docs = load_table(spark, sf_dir, "documents")
    mins = _shingles(docs).groupBy("doc_id").agg(F.min(F.md5("sh")).alias("min_shingle_hash"))
    return (
        docs.join(mins, "doc_id")
        .select("doc_id", F.md5(F.lower(F.trim("text"))).alias("content_md5"), "min_shingle_hash")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@query(
    "e_knn_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
    sims AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(q.qe) + 1),
               i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(q.qe) + 1),
                  i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
             AS cos_sim
      FROM q, embeddings e
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id
    FROM (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM sims) t
    WHERE rn <= 5
    ORDER BY query_id, rank
    """,
)
def e_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for a small query set.

    The exact baseline: broadcast the queries, one scan of the corpus,
    per-query top-k via window. At 100 TB the corpus side stays
    partitioned; only ranks/ids are output (floats never reach the
    compare). The ANN scale path is e_ivf_assign-style bucketing.
    """
    from ..operators.similarity import knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=5)
    return out.select("query_id", "rank", "neighbor_id").orderBy("query_id", "rank")


@query(
    "e_ivf_assign",
    oracle="""
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
    )
    SELECT vec_id, assigned_label, CAST(n_probe AS INT) AS n_probe
    FROM (
      SELECT vec_id, c_label AS assigned_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dot / (vn * cn) DESC, c_label) AS rn,
             count(*) OVER (PARTITION BY vec_id) AS n_probe
      FROM dots
    ) t
    WHERE rn = 1
    ORDER BY vec_id
    """,
)
def e_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse quantization: assign each vector to the nearest
    label-centroid by cosine.

    The index-build step of IVF ANN: centroids are tiny (k x dim) and
    broadcast; assignment is one pass over the corpus. Implemented by
    position-exploding vectors so centroid averaging and dot products are
    plain aggregations — no UDF, scales to any dimension.
    """
    from ..operators.similarity import assign_nearest_centroid, centroids_by

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroids_by(emb, "label")
    n_probe = cents.select("c_label").distinct().count()
    out = assign_nearest_centroid(emb, cents)
    return (
        out.select(
            F.col("id").alias("vec_id"),
            "assigned_label",
            F.lit(n_probe).cast("int").alias("n_probe"),
        )
        .orderBy("vec_id")
    )


@query(
    "d_dedup_components",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    sigs AS (
      SELECT doc_id,
             {', '.join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM sigs
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    reach AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    )
    SELECT src AS doc_id, CAST(least(min(dst), src) AS BIGINT) AS component
    FROM reach
    GROUP BY src
    ORDER BY doc_id
    """,
)
def d_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: connected components over the MinHash-LSH
    candidate graph (operators/components.py — iterative min-label
    propagation; each component keeps min doc_id as canonical).

    The oracle computes the same components with a recursive transitive-
    closure CTE (fine at oracle scale; the iterative label propagation is
    the distributed-scale algorithm).
    """
    from ..operators.components import connected_components
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures as mh_sigs, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    edges = lsh_candidate_pairs(
        mh_sigs(word_shingles(docs, distinct=False), hash_fn="md5"),  # oracle pins md5
        bands=4,
        rows_per_band=2,
    )
    return (
        connected_components(edges)
        .select(F.col("id").alias("doc_id"), F.col("component"))
        .orderBy("doc_id")
    )


def _duck_hyperplane(b: int) -> str:
    digit = "(instr('0123456789abcdef', substr(md5(concat('hp{b}_', CAST(pos AS VARCHAR))), {i}, 1)) - 1)"
    val = " + ".join(
        digit.format(b=b, i=i + 1) + f" * {16 ** (3 - i)}" for i in range(4)
    )
    return f"(({val}) / 65536.0 - 0.5)"


@query(
    "e_lsh_buckets",
    oracle="""
    WITH pos AS (
      SELECT vec_id AS id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    dots AS (
      SELECT id, {dot_exprs}
      FROM pos GROUP BY id
    )
    SELECT id AS vec_id, CAST({bucket_expr} AS BIGINT) AS bucket
    FROM dots
    ORDER BY vec_id
    """.format(
        dot_exprs=", ".join(
            f"sum(val * {_duck_hyperplane(b)}) AS dot{b}" for b in range(8)
        ),
        bucket_expr=" + ".join(
            f"(CASE WHEN dot{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(8)
        ),
    ),
)
def e_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH bucketing
    (operators/similarity.py:hyperplane_lsh_signatures). Same-bucket
    vectors are near-neighbor candidates — search cost drops from O(n)
    per query to O(bucket). Hyperplanes are md5-derived so both engines
    compute identical sign patterns."""
    from ..operators.similarity import hyperplane_lsh_signatures

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        # dim passed explicitly: no job at plan-build time
        hyperplane_lsh_signatures(emb, n_bits=8, dim=64)
        .select(F.col("id").alias("vec_id"), "bucket")
        .orderBy("vec_id")
    )


@query(
    "d_dedup_apply",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES.strip()},
    sigs AS (
      SELECT doc_id,
             {', '.join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM sigs
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    reach AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ),
    comp AS (
      SELECT src AS doc_id, least(min(dst), src) AS component
      FROM reach GROUP BY src
    )
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d
    LEFT JOIN comp ON d.doc_id = comp.doc_id
    WHERE comp.doc_id IS NULL OR comp.component = d.doc_id
    ORDER BY d.doc_id
    """,
)
def d_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup REMOVAL: LSH candidates → connected components
    → keep only the canonical (min doc_id) member of each component plus
    all untouched docs. The full pre-training dedup pass, composed from
    the engine operators; the component map joins back against the
    corpus (AQE broadcasts it only when it is actually small)."""
    from ..operators.components import connected_components
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures as mh_sigs, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    edges = lsh_candidate_pairs(
        mh_sigs(word_shingles(docs, distinct=False), hash_fn="md5"),  # oracle pins md5
        bands=4,
        rows_per_band=2,
    )
    comp = connected_components(edges).select(
        F.col("id").alias("doc_id"), "component"
    )
    # comp is duplicate-cluster-sized (can be a large corpus fraction) —
    # no forced broadcast; AQE promotes it when actually small
    keep = docs.join(comp, "doc_id", "left").filter(
        F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
    )
    return keep.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")).orderBy(
        "doc_id"
    )


@query(
    "e_sq_int8_topk",
    oracle="""
    WITH pos AS (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    stats AS (SELECT max(abs(val)) AS gmax FROM pos),
    codes AS (
      SELECT vec_id, p.pos,
             CASE WHEN s.gmax = 0 THEN 0
                  ELSE CAST(round(p.val * 127.0 / s.gmax) AS INT)
             END AS code
      FROM pos p CROSS JOIN stats s
    ),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(sum(CAST(q.code AS BIGINT) * c.code) AS BIGINT) AS dot
      FROM codes q JOIN codes c ON q.pos = c.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
      GROUP BY q.vec_id, c.vec_id
    )
    SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, dot
    FROM (SELECT query_id, neighbor_id, dot,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, neighbor_id) AS rn
          FROM dots) t
    WHERE rn <= 5
    ORDER BY query_id, rank
    """,
)
def e_sq_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN memory path: int8 symmetric scalar quantization (global
    max-abs scale — the form that preserves inner-product order; see
    the operator docstring for why per-dim affine would not) +
    integer-dot top-k (operators/similarity.py:
    sq_int8_codes/sq_int8_topk). Completes the ANN family: brute-force
    (exact baseline), IVF (compute path), LSH (bucketing path), SQ
    (memory path — 4× compression, and the ranking sum is exact
    integer arithmetic, so Spark and DuckDB agree bit-for-bit with no
    rounding discipline needed).

    The quantization arithmetic is the same parse tree on both engines
    (float selections, one multiply/divide chain, round-half-away on
    non-negative operands); everything after it is integers."""
    from ..operators.similarity import sq_int8_codes, sq_int8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    codes = sq_int8_codes(emb)
    out = sq_int8_topk(codes, codes.filter(F.col("id") < 5), k=5)
    return out.orderBy("query_id", "rank")


@query(
    "d_cluster_representative",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES.strip()},
    sigs AS (
      SELECT doc_id,
             {', '.join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM sigs
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    reach AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ),
    comp AS (
      SELECT src AS doc_id, least(min(dst), src) AS component
      FROM reach GROUP BY src
    ),
    ranked AS (
      SELECT c.component, d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.component) AS cluster_size,
             sum(d.n_chars) OVER (PARTITION BY c.component) AS total_chars
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT CAST(component AS BIGINT) AS component,
           doc_id AS survivor_id,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(total_chars AS BIGINT) AS total_chars
    FROM ranked WHERE rn = 1
    ORDER BY component
    """,
)
def d_cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based survivor selection: within each near-dup cluster
    (LSH candidates → connected components) keep the BEST member — here
    the longest document with doc_id tiebreak — instead of
    d_dedup_apply's min-id canonical. The production pattern for "which
    duplicate do we keep": any quality key (classifier score, source
    priority, recency) slots into the same ordering; the ranking is a
    window over cluster members only (cluster-sized frames, not
    corpus-sized).

    Scale shape: identical to d_dedup_apply up to the component map;
    the survivor pick adds one cluster-keyed window over the members
    join — the frame is bounded by documents that HAVE a near-duplicate
    (a small corpus fraction after upstream exact dedup)."""
    from ..operators.components import connected_components
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures as mh_sigs, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    edges = lsh_candidate_pairs(
        mh_sigs(word_shingles(docs, distinct=False), hash_fn="md5"),  # oracle pins md5
        bands=4,
        rows_per_band=2,
    )
    comp = connected_components(edges).select(F.col("id").alias("doc_id"), "component")
    members = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = W.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wc = W.partitionBy("component")
    return (
        members.select(
            "component",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("cluster_size"),
            F.sum("n_chars").over(wc).alias("total_chars"),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("doc_id").alias("survivor_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("total_chars").cast("long").alias("total_chars"),
        )
        .orderBy("component")
    )


@query(
    "d_containment_pairs",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_common
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CASE WHEN ca.n <= cb.n THEN i.doc_a ELSE i.doc_b END AS subset_id,
           CASE WHEN ca.n <= cb.n THEN i.doc_b ELSE i.doc_a END AS superset_id,
           i.n_common,
           round(i.n_common * 1.0 / least(ca.n, cb.n), 4) AS containment
    FROM inter i
    JOIN counts ca ON ca.doc_id = i.doc_a
    JOIN counts cb ON cb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / least(ca.n, cb.n) >= 0.8
    ORDER BY subset_id, superset_id
    """,
)
def d_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-subset pairs by shingle containment ≥ 0.8
    (operators/dedup.py:containment_pairs) — catches boilerplate and
    quoted-document embedding that Jaccard misses because the union is
    dominated by the long side. ``max_doc_freq=None`` for oracle parity,
    same as d_ngram_jaccard_pairs (production keeps the capped default).

    Determinism: containment is a ratio of exact integers computed with
    the same expression on both engines, rounded to 4; the subset side
    is chosen by integer size compare with a deterministic tie rule
    (a-side = lower id)."""
    from ..operators.dedup import containment_pairs, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    pairs = containment_pairs(
        word_shingles(docs), min_containment=0.8, max_doc_freq=None
    )
    return pairs.select(
        "subset_id",
        "superset_id",
        "n_common",
        F.round("containment", 4).alias("containment"),
    ).orderBy("subset_id", "superset_id")


@query(
    "d_simhash_hamming_pairs",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    votes AS (
      SELECT doc_id, {votes} FROM tokens GROUP BY doc_id
    ),
    fps AS (SELECT doc_id, CAST({fp} AS BIGINT) AS fp FROM votes),
    bands AS (
      SELECT doc_id, fp, b AS band,
             CAST(floor(fp / power(16, b)) AS BIGINT) % 16 AS nib
      FROM fps, UNNEST([0, 1, 2, 3]) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.fp AS fp_a, b.doc_id AS doc_b, b.fp AS fp_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(fp_a, fp_b)) <= 3
    ORDER BY doc_a, doc_b
    """.format(votes=_simhash_sql()[0], fp=_simhash_sql()[1]),
)
def d_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT hamming-≤3 SimHash pairs without the O(n²) compare: split
    the 16-bit fingerprint into 4 nibble bands — by pigeonhole, any two
    fingerprints within hamming distance 3 share at least one untouched
    band, so the (band, nibble) self-join proposes a candidate superset
    and bit_count(xor) verifies exactly. The standard scale recipe for
    SimHash pairing (Manku et al.'s rotated-table scheme, banded);
    production MUST widen to 64 bits / 8 bands (xxhash64 fingerprints):
    the scale probe measured that at 500k docs the 16-bit space is ~8
    docs dense per exact code, so the hamming-≤3 PAIR SET itself grows
    quadratically — resolution has to grow with corpus size for the
    output (not the plan) to stay near-linear. 16 bits here is the
    cross-engine parity pin (DuckDB-portable integer arithmetic).

    Integer arithmetic end-to-end — fingerprints, nibbles, xor popcount
    — so cross-engine parity needs no rounding discipline. Scale shape:
    one fingerprint aggregate (token-keyed, map-side combined), one
    narrow 4×-exploded band shuffle, candidate buckets bounded by band
    selectivity (16 values × band count), one integer verify per
    candidate."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    votes = ", ".join(
        f"sum(CASE WHEN (shiftright(v, {k}) & 1) = 1 THEN 1 ELSE -1 END) AS b{k}"
        for k in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(_SIMHASH_BITS)
    )
    return spark.sql(
        f"""
        WITH tokens AS (
          SELECT doc_id,
                 CAST(conv(substr(md5(word), 1, 4), 16, 10) AS BIGINT) AS v
          FROM (SELECT doc_id, explode(split(text, ' ')) AS word FROM documents)
        ),
        votes AS (
          SELECT doc_id, {votes} FROM tokens GROUP BY doc_id
        ),
        fps AS (SELECT doc_id, CAST({fp} AS BIGINT) AS fp FROM votes),
        bands AS (
          SELECT doc_id, fp, b AS band,
                 CAST(shiftright(fp, 4 * b) AS BIGINT) % 16 AS nib
          FROM fps LATERAL VIEW explode(array(0, 1, 2, 3)) t AS b
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, a.fp AS fp_a,
                          b.doc_id AS doc_b, b.fp AS fp_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(bit_count(fp_a ^ fp_b) AS INT) AS hamming
        FROM cand
        WHERE bit_count(fp_a ^ fp_b) <= 3
        ORDER BY doc_a, doc_b
        """
    )


@query(
    "t_shingle_novelty",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    firsts AS (SELECT sh, min(doc_id) AS first_doc FROM shingles GROUP BY sh)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS novelty
    FROM shingles s JOIN firsts f ON f.sh = s.sh
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """,
)
def t_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty scoring: per document, the fraction of its 3-gram
    shingles whose FIRST appearance (lowest doc_id — ingestion order)
    is this document. The diversity/redundancy metric a training-data
    pipeline tracks alongside dedup: a crawl whose novelty curve decays
    is re-crawling itself. Novelty 1.0 = entirely new content;
    0.0 = everything seen before.

    Scale shape: one shingle-keyed groupBy for first-appearance (map-
    side combined min), one join back on the shingle, one doc-keyed
    reduction — all narrow frames; the ratio is exact-integer / exact-
    integer, rounded identically on both engines."""
    from ..operators.dedup import word_shingles

    sh = word_shingles(load_table(spark, sf_dir, "documents")).withColumnRenamed(
        "id", "doc_id"
    )
    firsts = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
    return (
        sh.join(firsts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            novel.cast("long").alias("n_novel"),
            F.round(novel / F.count("*"), 4).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@query(
    "b_dedup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dupes,
           round((count(*) - count(DISTINCT md5(text))) * 1.0 / count(*), 4)
             AS dup_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def b_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the partition-level health
    report a crawl pipeline emits before spending near-dup compute:
    a source whose dup_rate jumps is re-serving cached pages. One
    groupBy on source with a distinct-hash count (hash first — the
    128-bit md5 shuffles instead of the full text)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5("text")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(h).alias("n_distinct"),
            (F.count("*") - F.countDistinct(h)).alias("n_dupes"),
            F.round((F.count("*") - F.countDistinct(h)) / F.count("*"), 4).alias(
                "dup_rate"
            ),
        )
        .orderBy("source")
    )
