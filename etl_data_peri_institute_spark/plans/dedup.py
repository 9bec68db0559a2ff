"""Deduplication gates beyond the catalog's foundational exact/MinHash
entries: decontamination, SemDeDup, span/segment/CDC dedup, bloom
pre-filters, band sweeps, soft weights, incremental (batch-vs-corpus)
near-dup for both text and embeddings — plus the shared augmented-corpus
builders their oracles use.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section cites its source round.
"""

from __future__ import annotations

# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ..sources.tables import load_table
from .catalog import query

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


# ===========================================================================
# section consolidated from plans/round6_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 gate registrations: span-level exact-substring dedup (Lee
# et al. 2022) and the distributed-cumsum production variants.
#
# The span-dedup pair promotes ``operators/dedup.py``'s
# ``duplicated_span_ranges`` / ``remove_duplicated_spans`` (built round 5,
# pytest-verified) to driver-oracled gate queries; the three production
# registrations give the round-5 distributed-cumsum paths
# (``token_budget_select_production``, ``pareto_abc_production``,
# ``rfm_segmentation_production``) their own driver rows under the SAME
# oracles as their global-window semantics pins — the driver, not just
# pytest, certifies bit-identity.
#
# Reference parity note: the reference repo has no span-level dedup
# (its only dedup is keep-last row dedup,
# /root/reference/etl/transform.py); these are north-star training-data
# operators per the build brief.
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession
from ..operators.dedup import duplicated_span_ranges, remove_duplicated_spans

_SPAN_N = 8

_SPAN_MIN_DOCS = 2

_SPAN_CTES = f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i AS pos,
             concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]) AS g
      FROM words, UNNEST(range(1, len(w) - {_SPAN_N - 2})) AS t(i)
      WHERE len(w) >= {_SPAN_N}
    ),
    hot AS (
      SELECT g FROM grams GROUP BY g
      HAVING count(DISTINCT doc_id) >= {_SPAN_MIN_DOCS}
    ),
    flagged AS (
      SELECT doc_id, pos AS lo, pos + {_SPAN_N - 1} AS hi
      FROM grams WHERE g IN (SELECT g FROM hot)
    ),
    isl AS (
      SELECT doc_id, lo, hi,
             CASE WHEN lo > coalesce(max(hi) OVER (
               PARTITION BY doc_id ORDER BY lo, hi
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2147483648) + 1
             THEN 1 ELSE 0 END AS ni
      FROM flagged
    ),
    islands AS (
      SELECT doc_id, lo, hi,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY lo, hi) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, min(lo) AS lo, max(hi) AS hi
      FROM islands GROUP BY doc_id, island
    )"""

@query(
    "d_span_dedup_ranges",
    oracle=_SPAN_CTES
    + """
    SELECT doc_id AS id, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi
    FROM spans ORDER BY id, lo
    """,
)
def d_span_dedup_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup, DIAGNOSTIC half: merged word-
    coordinate ranges of every 8-gram run shared by 2+ documents
    (operators/dedup.py::duplicated_span_ranges — one posexplode pass,
    map-side-combined hot-gram groupBy, semi-join vs the boilerplate-
    sized hot set, one per-doc island window). The oracle unrolls the
    identical positioned-gram / hot-gram / gaps-and-islands pipeline in
    SQL. t_duplicated_ngram_report is the corpus-level report over the
    same grams; this is the per-document coordinate form the APPLY
    consumes."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_ranges(
        docs, n=_SPAN_N, min_docs=_SPAN_MIN_DOCS
    ).orderBy("id", "lo")

@query(
    "d_span_dedup_apply",
    oracle=_SPAN_CTES
    + """,
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS INT) AS n_spans FROM spans GROUP BY doc_id
    ),
    wpos AS (
      SELECT doc_id, i, w[i] AS word
      FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
    ),
    kept AS (
      SELECT wp.doc_id, wp.i, wp.word FROM wpos wp
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = wp.doc_id AND wp.i BETWEEN s.lo AND s.hi
      )
    ),
    clean AS (
      SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text_clean,
             CAST(count(*) AS INT) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    nw AS (SELECT doc_id, CAST(len(w) AS INT) AS n_words FROM words)
    SELECT d.doc_id,
           CASE WHEN pd.doc_id IS NULL THEN d.text
                ELSE coalesce(c.text_clean, '') END AS text_clean,
           CAST(CASE WHEN pd.doc_id IS NULL THEN 0
                     ELSE nw.n_words - coalesce(c.n_kept, 0) END AS INT) AS n_words_removed,
           coalesce(pd.n_spans, 0) AS n_spans_removed
    FROM documents d
    JOIN nw USING (doc_id)
    LEFT JOIN per_doc pd USING (doc_id)
    LEFT JOIN clean c USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def d_span_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup, APPLY half: cut every
    duplicated span out of each document
    (operators/dedup.py::remove_duplicated_spans — per-doc span arrays
    joined back once, the cut a JVM higher-order F.filter lambda; no
    UDF, no second corpus explode). Docs with no duplicated span pass
    through verbatim with zero counters. The oracle rebuilds the cut
    relationally (word positions anti-joined against span coverage)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_duplicated_spans(docs, n=_SPAN_N, min_docs=_SPAN_MIN_DOCS)
    return out.select(
        "doc_id",
        "text_clean",
        "n_words_removed",
        "n_spans_removed",
    ).orderBy("doc_id")


# ===========================================================================
# section consolidated from plans/round6b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..operators.dedup import segment_occurrences

_SEG_N = 8

_SEG_CTES = f"""
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    occ AS (
      SELECT doc_id, source, c AS chunk,
             array_to_string(w[(c * {_SEG_N} + 1):(c * {_SEG_N} + {_SEG_N})], ' ') AS segment
      FROM words,
           UNNEST(range(0, CAST(ceil(len(w) / {_SEG_N}.0) AS BIGINT))) AS t(c)
    ),
    k AS (
      SELECT doc_id, source, chunk, segment,
             row_number() OVER (PARTITION BY segment ORDER BY doc_id, chunk) AS rn
      FROM occ
    )"""

@query(
    "d_segment_dedup_report",
    oracle=_SEG_CTES
    + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped,
           round(count(*) FILTER (WHERE rn > 1) * 1.0 / count(*), 4) AS dup_rate
    FROM k GROUP BY source ORDER BY source
    """,
)
def d_segment_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level dedup, REPORT half: per-source segment-occurrence
    counts and the share that are corpus-wide repeats (would be dropped
    by keep-first). The per-source view localizes WHERE duplication
    concentrates — the first question before spending a full dedup pass
    (operators/dedup.py::segment_occurrences)."""
    docs = load_table(spark, sf_dir, "documents")
    occ = segment_occurrences(docs, n=_SEG_N, extra_cols=("source",))
    dropped = (~F.col("kept")).cast("long")
    return (
        occ.groupBy("source")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.sum(dropped).alias("n_dropped"),
            F.round(F.sum(dropped) * 1.0 / F.count("*"), 4).alias("dup_rate"),
        )
        .orderBy("source")
    )

@query(
    "d_segment_dedup_apply",
    oracle=_SEG_CTES
    + """
    SELECT doc_id,
           coalesce(string_agg(segment, ' ' ORDER BY chunk)
                    FILTER (WHERE rn = 1), '') AS text_clean,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_segments_dropped
    FROM k GROUP BY doc_id ORDER BY doc_id
    """,
)
def d_segment_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level dedup, APPLY half: rebuild each document from only
    its KEPT segments (first corpus-wide occurrence in (doc_id, chunk)
    order). Because segments partition the text, no word is ever cut
    twice — the complement of span-dedup's overlapping-run semantics.
    Reassembly is one per-doc groupBy: collect kept (chunk, segment)
    structs, array_sort, concat — bounded by segments-per-doc, never
    corpus-sized state."""
    docs = load_table(spark, sf_dir, "documents")
    occ = segment_occurrences(docs, n=_SEG_N)
    kept_struct = F.when(F.col("kept"), F.struct("chunk", "segment"))
    return (
        occ.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("text_clean"),
            F.count("*").alias("n_segments"),
            F.sum((~F.col("kept")).cast("long")).alias("n_segments_dropped"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# section consolidated from plans/round6c_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

from ..operators.dedup import segment_explode

@query(
    "d_source_overlap_matrix",
    oracle=_SEG_CTES
    + """
    , segs AS (SELECT DISTINCT source, segment FROM occ),
    sizes AS (SELECT source, count(*) AS n FROM segs GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_shared
      FROM segs a JOIN segs b
        ON a.segment = b.segment AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           round(s.n_shared * 1.0 / (sa.n + sb.n - s.n_shared), 4) AS jaccard,
           round(s.n_shared * 1.0 / least(sa.n, sb.n), 4) AS containment
    FROM shared s
    JOIN sizes sa ON sa.source = s.source_a
    JOIN sizes sb ON sb.source = s.source_b
    ORDER BY source_a, source_b
    """,
)
def d_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap matrix at segment granularity: for every
    source pair (a < b) sharing at least one distinct 8-token segment,
    the Jaccard and containment of their distinct-segment sets — the
    dataset-mixing audit that answers "is src_b mostly a re-crawl of
    src_a?" before sources are weighted into a training mixture
    (b_temperature_mixture consumes the answer). Pairs with zero
    overlap are omitted (inner-join semantics on both engines).

    Scale shape: ONE data-sized shuffle total. Instead of distinct +
    self-join on segment (two segment-keyed exchanges and a join whose
    hot keys need AQE splitting), each segment's SOURCE SET is built
    directly by a map-side-combined collect_set groupBy — the set is
    capped at #sources (~20), so a segment exploded 10^9 times
    collapses to one <=20-element set per map task. Source pairs are
    then enumerated JVM-side from the sorted set (a higher-order
    nested transform, at most C(20, 2) structs per distinct segment —
    bounded by source-count squared, never by data) and counted into
    a <=190-row frame; per-source sizes re-derive from the same
    grouped exchange (ReusedExchange), and the two size joins
    broadcast a 20-row table.
    """
    docs = load_table(spark, sf_dir, "documents")
    occ = segment_explode(docs, n=_SEG_N, extra_cols=("source",))
    per_seg = occ.groupBy("segment").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    sizes = (
        per_seg.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    k = F.size("ss")
    pair_arr = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + F.lit(2), k),
                lambda y: F.struct(
                    x.alias("source_a"), y.alias("source_b")
                ),
            ),
        )
    )
    shared = (
        per_seg.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
            F.round(
                F.col("n_shared") * 1.0 / F.least("n_a", "n_b"), 4
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


# ===========================================================================
# section consolidated from plans/round6d_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 3: content-defined chunking (FastCDC
# shape) and the corpus dataset card.
#
# - ``d_cdc_chunking`` / ``d_cdc_dedup_apply``: content-defined chunk
#   boundaries (md5 of the w preceding words opens a chunk with p=1/16)
#   make chunk-level dedup INSERTION-ROBUST: editing one word re-chunks
#   only the edit's neighborhood and every later boundary re-syncs,
#   where fixed-width segmentation (d_segment_dedup_*) shifts every
#   downstream segment and finds nothing. This is the rsync/FastCDC/
#   LBFS idea applied to crawl dedup — the right granularity when
#   near-identical pages differ by an injected banner or timestamp.
# - ``p_corpus_card``: the one-scan dataset card (doc/source/lang
#   counts, token totals and distribution, exact-dup share) — the
#   summary sheet a dataset release ships with; every number reduces in
#   ONE aggregate pass and unpivots to (metric, value) rows.
#
# The reference repo has no corpus analytics (its only dedup is
# keep-last row dedup, /root/reference/etl/transform.py); these are
# north-star extensions per the build brief.
# ===========================================================================

from ..operators.dedup import content_defined_chunks

_CDC_W = 4

_CDC_CTES = f"""
    WITH wt AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ),
    words AS (
      SELECT doc_id, source, i AS pos, ws[i] AS word
      FROM wt, UNNEST(range(1, len(ws) + 1)) AS t(i)
    ),
    flags AS (
      SELECT doc_id, source, pos, word,
             CASE WHEN pos = 1 OR (pos > {_CDC_W} AND substring(md5(
                    lag(word, 4) OVER win || ' ' || lag(word, 3) OVER win
                    || ' ' || lag(word, 2) OVER win || ' '
                    || lag(word, 1) OVER win), 1, 1) = '0')
                  THEN 1 ELSE 0 END AS is_start
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    tagged AS (
      SELECT doc_id, source, pos, word,
             sum(is_start) OVER (
               PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING
             ) AS chunk_id
      FROM flags
    ),
    chunks AS (
      SELECT doc_id, source, chunk_id,
             string_agg(word, ' ' ORDER BY pos) AS chunk_text,
             count(*) AS n_words
      FROM tagged GROUP BY 1, 2, 3
    )"""

@query(
    "d_cdc_chunking",
    oracle=_CDC_CTES
    + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT chunk_text) AS BIGINT) AS n_distinct_chunks,
           round(1.0 - count(DISTINCT chunk_text) * 1.0 / count(*), 4)
             AS dup_rate,
           round(avg(n_words), 2) AS avg_words_per_chunk,
           CAST(max(n_words) AS BIGINT) AS max_words_per_chunk
    FROM chunks GROUP BY source ORDER BY source
    """,
)
def d_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking REPORT: per-source chunk counts, the
    within-source duplicate-chunk share, and the chunk-length profile
    (operators/dedup.py::content_defined_chunks; boundary = md5 of the
    4 preceding words starting with hex '0', so chunks average ~20
    words). dup_rate here is the insertion-robust counterpart of
    d_segment_dedup_report's fixed-width rate: a one-word edit shifts
    every fixed segment but leaves all but ~1 CDC chunk intact.

    Scale shape: one posexplode pass; the rolling hash and the running
    chunk id share a single per-doc window exchange (doc-bounded
    partitions); reassembly is one per-doc groupBy; the exact distinct
    count is a second bounded shuffle on the chunk text."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = content_defined_chunks(docs, w=_CDC_W, extra_cols=("source",))
    return (
        chunks.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_distinct("chunk_text").alias("n_distinct_chunks"),
            F.round(
                1.0 - F.count_distinct("chunk_text") * 1.0 / F.count("*"), 4
            ).alias("dup_rate"),
            F.round(F.avg("n_words"), 2).alias("avg_words_per_chunk"),
            F.max("n_words").alias("max_words_per_chunk"),
        )
        .orderBy("source")
    )

@query(
    "d_cdc_dedup_apply",
    oracle=_CDC_CTES
    + """
    , k AS (
      SELECT doc_id, chunk_id, chunk_text,
             row_number() OVER (
               PARTITION BY chunk_text ORDER BY doc_id, chunk_id
             ) AS rn
      FROM chunks
    )
    SELECT doc_id,
           coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_id)
                    FILTER (WHERE rn = 1), '') AS text_clean,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT)
             AS n_chunks_dropped
    FROM k GROUP BY doc_id ORDER BY doc_id
    """,
)
def d_cdc_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup APPLY: rebuild each document from
    only the chunks whose text is a corpus-wide FIRST occurrence (in
    (doc_id, chunk_id) order) — boilerplate that repeats across
    near-identical pages is cut even when the pages differ by inserted
    words, because CDC boundaries re-sync after every edit.

    Scale shape: keep-first is the same map-side-combined
    min(struct(id, chunk_id)) groupBy as segment dedup (a
    10^9-occurrence boilerplate chunk collapses per map task), then one
    hash join of chunks vs the winners and one per-doc reassembly
    groupBy (state bounded by chunks-per-doc)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = content_defined_chunks(docs, w=_CDC_W)
    first = chunks.groupBy("chunk_text").agg(
        F.min(F.struct(F.col("id"), F.col("chunk_id"))).alias("__first")
    )
    kept = (
        (F.col("id") == F.col("__first.id"))
        & (F.col("chunk_id") == F.col("__first.chunk_id"))
    )
    flagged = chunks.join(first, "chunk_text").select(
        "id", "chunk_id", "chunk_text", kept.alias("kept")
    )
    kept_struct = F.when(F.col("kept"), F.struct("chunk_id", "chunk_text"))
    return (
        flagged.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("text_clean"),
            F.count("*").alias("n_chunks"),
            F.sum((~F.col("kept")).cast("long")).alias("n_chunks_dropped"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# section consolidated from plans/round6e_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 4: approximate-membership dedup (Bloom),
# behavioral Markov transitions, tokenizer-induction pair stats, and the
# A/B experiment readout.
#
# Four more first-class operators a training-data / analytics engine
# needs (north-star extensions per the build brief — the reference repo,
# /root/reference/etl/transform.py, has keep-last row dedup and column
# shaping only):
#
# - ``d_bloom_dedup_report``: a DISTRIBUTED Bloom filter built over the
#   corpus fingerprint set with a map-side-combined ``bit_or`` (the
#   filter — not the key set — crosses the wire), probed by the daily
#   batch, with exact false-positive accounting. This is the streaming /
#   incremental dedup shape when the corpus distinct-key set no longer
#   fits a broadcast: membership becomes a bounded bitmap instead of a
#   100 TB anti-join side.
# - ``b_markov_transitions``: per-user next-event transition matrix with
#   row-normalized probabilities — the behavioral summary backing "what
#   happens after a click?".
# - ``t_bpe_pair_stats``: the first BPE merge iteration — corpus-weighted
#   adjacent character-pair frequencies within words (Sennrich et al.'s
#   merge-candidate scan), the tokenizer-induction primitive.
# - ``b_ab_experiment_report``: deterministic hash-based variant
#   assignment (never rand()) + conversion readout with pooled
#   two-proportion z-score — the experimentation twin of a_welch_ttest
#   for binary outcomes.
# ===========================================================================

_BLOOM_M = 4096

_BLOOM_WORD = 32

def _hex2_digit_sql(h: str, i: int) -> str:
    return f"(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"

def _hex3_to_int_sql(h: str, start: int) -> str:
    """Engine-portable int value of the 3-hex-char slice at ``start``."""
    return (
        f"({_hex2_digit_sql(h, start)} * 256"
        f" + {_hex2_digit_sql(h, start + 1)} * 16"
        f" + {_hex2_digit_sql(h, start + 2)})"
    )

_BLOOM_CTES = f"""
    WITH keyed AS (
      SELECT source, doc_id, md5(text) AS h FROM documents
    ),
    corpus_pos AS (
      SELECT {_hex3_to_int_sql('h', 1)} AS pos FROM keyed WHERE doc_id % 3 <> 0
      UNION ALL
      SELECT {_hex3_to_int_sql('h', 4)} AS pos FROM keyed WHERE doc_id % 3 <> 0
    ),
    filt AS (
      SELECT pos // {_BLOOM_WORD} AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % {_BLOOM_WORD})) AS bits
      FROM corpus_pos GROUP BY 1
    ),
    corpus_keys AS (
      SELECT DISTINCT h FROM keyed WHERE doc_id % 3 <> 0
    ),
    batch_keys AS (
      SELECT DISTINCT source, h,
             {_hex3_to_int_sql('h', 1)} AS p1,
             {_hex3_to_int_sql('h', 4)} AS p2
      FROM keyed WHERE doc_id % 3 = 0
    ),
    probe AS (
      SELECT b.source, b.h,
             min(coalesce((f.bits >> (t.pos % {_BLOOM_WORD})) & 1, 0)) AS all_set
      FROM batch_keys b,
           UNNEST([b.p1, b.p2]) AS t(pos)
      LEFT JOIN filt f ON f.word = t.pos // {_BLOOM_WORD}
      GROUP BY b.source, b.h
    ),
    flags AS (
      SELECT p.source,
             CAST(p.all_set AS INT) AS bloom_pos,
             CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS exact_dup
      FROM probe p LEFT JOIN corpus_keys c ON c.h = p.h
    )
"""

@query(
    "d_bloom_dedup_report",
    oracle=_BLOOM_CTES
    + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(bloom_pos) AS BIGINT) AS bloom_positive,
           CAST(sum(exact_dup) AS BIGINT) AS exact_dups,
           CAST(sum(CASE WHEN bloom_pos = 1 AND exact_dup = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
           round(sum(CASE WHEN bloom_pos = 1 AND exact_dup = 0
                          THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(count(*) - sum(exact_dup), 0), 4) AS fp_rate
    FROM flags
    GROUP BY source
    ORDER BY source
    """,
)
def d_bloom_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership dedup with exact false-positive
    accounting: the corpus slice (doc_id % 3 != 0) builds a 4096-bit /
    k=2 Bloom filter over md5 content hashes; the batch slice probes
    it, and each batch key's Bloom verdict is reconciled against exact
    membership — per source: key count, Bloom positives, exact dups,
    false positives (Bloom has no false negatives by construction; the
    driver's value-hash would catch one), and the FP rate among true
    negatives.

    Scale shape: the filter build never shuffles corpus-sized data —
    positions partial-aggregate with a map-side ``bit_or`` into at most
    m/32 = 128 (word, bits) rows per task before the exchange, and the
    probe broadcasts that bounded bitmap onto the batch. Only the DAY'S
    batch shuffles (its own distinct + the probe groupBy). The exact
    corpus-side distinct here exists purely to MEASURE the FP rate; a
    production pipeline runs the filter as the cheap first pass and
    anti-joins only Bloom-positive keys (a filter-sized fraction)
    against the corpus. When m outgrows a broadcast (10^11 keys x 10
    bits), the filter shards by key-hash prefix and the probe
    co-partitions on the same prefix — each shard stays a bitmap join.
    m=4096 is the demo dial: small enough that the sf0.01 gate run
    exercises the false-positive path (~2% FP) while staying far from
    saturation (production sizes m ~ 10 bits/key, k=7 for ~1%).
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("source", "doc_id", F.md5("text").alias("h"))
    p1 = F.conv(F.substring("h", 1, 3), 16, 10).cast("int")
    p2 = F.conv(F.substring("h", 4, 3), 16, 10).cast("int")

    corpus = keyed.filter(F.col("doc_id") % 3 != 0)
    batch = keyed.filter(F.col("doc_id") % 3 == 0)

    corpus_pos = corpus.select(F.explode(F.array(p1, p2)).alias("pos"))
    filt = (
        corpus_pos.groupBy(
            F.floor(F.col("pos") / _BLOOM_WORD).cast("int").alias("word")
        )
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), pos % {_BLOOM_WORD})")
            ).alias("bits")
        )
    )

    batch_keys = (
        batch.select("source", "h", p1.alias("p1"), p2.alias("p2")).distinct()
    )
    probe = (
        batch_keys.select(
            "source", "h", F.explode(F.array("p1", "p2")).alias("pos")
        )
        .join(
            F.broadcast(filt),
            F.floor(F.col("pos") / _BLOOM_WORD).cast("int") == F.col("word"),
            "left",
        )
        .select(
            "source",
            "h",
            F.coalesce(
                F.expr(f"shiftright(bits, pos % {_BLOOM_WORD}) & 1"),
                F.lit(0).cast("long"),
            ).alias("bit_set"),
        )
        .groupBy("source", "h")
        .agg(F.min("bit_set").alias("all_set"))
    )

    corpus_keys = corpus.select("h").distinct().withColumn("in_corpus", F.lit(1))
    flags = probe.join(corpus_keys, "h", "left").select(
        "source",
        F.col("all_set").cast("int").alias("bloom_pos"),
        F.coalesce("in_corpus", F.lit(0)).alias("exact_dup"),
    )
    fp = (F.col("bloom_pos") == 1).cast("int") * (
        F.col("exact_dup") == 0
    ).cast("int")
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("bloom_pos").cast("long").alias("bloom_positive"),
            F.sum("exact_dup").cast("long").alias("exact_dups"),
            F.sum(fp).cast("long").alias("false_positives"),
        )
        .select(
            "source",
            "n_keys",
            "bloom_positive",
            "exact_dups",
            "false_positives",
            F.round(
                F.col("false_positives")
                * 1.0
                / F.nullif(
                    (F.col("n_keys") - F.col("exact_dups")).cast("long"),
                    F.lit(0).cast("long"),
                ),
                4,
            ).alias("fp_rate"),
        )
        .orderBy("source")
    )


# ===========================================================================
# section consolidated from plans/round6h_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/causal.py)
# ===========================================================================

from ..operators.dedup import (
    jaccard_pairs,
    lsh_band_table,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from .llmdata import N_MINHASH

_AUG_SQL = """
    aug AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, source, text FROM documents WHERE doc_id < 50
      UNION ALL
      SELECT doc_id + 2000000, source,
             array_to_string(
               list_slice(string_split(text, ' '), 1,
                          CAST(ceil(len(string_split(text, ' ')) * 0.7)
                               AS BIGINT)),
               ' ')
      FROM documents WHERE doc_id < 50
    )
"""

_AUG_SHINGLES = """
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM aug),
    shingles AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    )
"""

def _augmented_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    trunc = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        "source",
        F.concat_ws(
            " ",
            F.slice(w, 1, F.ceil(F.size(w) * 0.7).cast("int")),
        ).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "source", "text"
    )
    return (
        docs.select("doc_id", "source", "text")
        .unionByName(exact)
        .unionByName(trunc)
    )

_SWEEP_CONFIGS = ((2, 4), (4, 2), (8, 1))

_SWEEP_TAU = 0.5

def _sweep_oracle() -> str:
    sig_mins = ", ".join(
        f"min(md5('{i}' || sh)) AS m{i}" for i in range(N_MINHASH)
    )
    band_ctes = []
    per_cfg = []
    for bands, rows in _SWEEP_CONFIGS:
        unions = []
        for b in range(bands):
            sig = " || ".join(f"m{b * rows + r}" for r in range(rows))
            unions.append(
                f"SELECT doc_id, {b} AS band, {sig} AS sig FROM sigs"
            )
        band_ctes.append(
            f"bands_{bands}_{rows} AS ({' UNION ALL '.join(unions)}),\n"
            f"    cand_{bands}_{rows} AS (\n"
            f"      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b\n"
            f"      FROM bands_{bands}_{rows} a JOIN bands_{bands}_{rows} b\n"
            f"        ON a.band = b.band AND a.sig = b.sig"
            f" AND a.doc_id < b.doc_id)"
        )
        per_cfg.append(
            f"""
    SELECT CAST({bands} AS INT) AS bands, CAST({rows} AS INT) AS rows_per_band,
           (SELECT count(*) FROM cand_{bands}_{rows}) AS n_candidates,
           (SELECT count(*) FROM truth) AS n_true_pairs,
           (SELECT count(*) FROM cand_{bands}_{rows} c
            JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b) AS n_hits"""
        )
    bands_joined = ",\n    ".join(band_ctes)
    cfg_union = " UNION ALL ".join(per_cfg)
    return f"""
    WITH {_AUG_SQL.strip()},
    {_AUG_SHINGLES.strip()},
    sigs AS (SELECT doc_id, {sig_mins} FROM shingles GROUP BY doc_id),
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN counts ca ON ca.doc_id = i.id_a
      JOIN counts cb ON cb.doc_id = i.id_b
      WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) > {_SWEEP_TAU}
    ),
    {bands_joined}
    SELECT bands, rows_per_band,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
           CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits * 1.0 / NULLIF(n_true_pairs, 0), 4) AS recall,
           round(n_hits * 1.0 / NULLIF(n_candidates, 0), 4) AS lsh_precision
    FROM ({cfg_union})
    ORDER BY bands
    """

@query("d_minhash_band_sweep", oracle=_sweep_oracle())
def d_minhash_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-configuration sweep: for every way to band the 8
    MinHash signatures (2x4, 4x2, 8x1), the candidate-pair count,
    recall and precision against exact-Jaccard ground truth
    (tau > {0.5}) over the near-dup-augmented corpus. More bands of
    fewer rows = higher recall, lower precision (P(candidate) =
    1-(1-j^r)^b) — this measures the dial d_minhash_lsh_pairs fixes at
    4x2, which is exactly the number a dedup operator owner needs
    before spending a corpus-sized verify pass.

    Scale shape: ONE shingle explode and ONE signature groupBy feed
    all three configs (the banding is a stack() over the same 8
    columns), and — r11 — ONE bucket self-join serves all three:
    banding is monotone here (a coarse-band collision implies every
    finer config's collision), so the finest (8x1) join enumerates the
    superset once, a per-pair bitmask of matching components is folded
    with bit_or, and each config is a bitmask predicate inside one
    conditional aggregation. Ground truth reuses the
    d_ngram_jaccard_pairs shingle-join (doc-frequency cap disabled to
    match the oracle — production keeps it); the report is 3 rows of
    counts. The truth join keys hit the SAME (id_a, id_b) space so AQE
    handles any hot bucket.
    """
    corpus = _augmented_corpus(spark, sf_dir)
    sh_set = word_shingles(corpus, distinct=True)
    sigs = minhash_signatures(
        word_shingles(corpus, distinct=False), hash_fn="md5"
    )
    truth = jaccard_pairs(
        sh_set, min_jaccard=_SWEEP_TAU, max_doc_freq=None
    ).select("id_a", "id_b")
    truth = truth.localCheckpoint(eager=True)
    sigs = sigs.localCheckpoint(eager=True)
    n_true = truth.count()
    # ONE bucket self-join serves all three configs (r11). Banding is
    # monotone in this sweep: a pair colliding on a coarse band (e.g.
    # concat(m0..m3)) necessarily matches every component, so it also
    # collides in every finer config — cand(2x4) ⊆ cand(4x2) ⊆
    # cand(8x1). Self-join ONCE on the finest (8x1) banding, fold each
    # pair's matching components into a bitmask (bit i = signatures
    # agree on m_i), and each config's candidate set is a bitmask
    # predicate: 8x1 = any bit, 4x2 = both bits of some aligned pair,
    # 2x4 = all four bits of some aligned nibble. The previous shape
    # ran one self-join + distinct + truth-join PER config; the 8x1
    # collision volume strictly contains the others, so this computes
    # the same three candidate sets for the price of the largest one.
    banded = lsh_band_table(sigs, bands=8, rows_per_band=1)
    a, b = banded.alias("a"), banded.alias("b")
    masks = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.band").cast("int").alias("__band"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.bit_or(F.expr("shiftleft(1, __band)")).alias("__mask"))
    )
    m = F.col("__mask")

    def in_cfg(bands: int, rows: int):
        full = [(((1 << rows) - 1) << (b0 * rows)) for b0 in range(bands)]
        cond = F.lit(False)
        for bm in full:
            cond = cond | (m.bitwiseAND(F.lit(bm)) == F.lit(bm))
        return cond

    # No forced broadcast of the truth side (ADVICE r11): the near-dup
    # pair frame grows with the augmented corpus, so the hint risked a
    # driver/broadcast OOM at scale. truth is eagerly checkpointed, so
    # its exact size is known to the planner — AQE picks the broadcast
    # itself whenever the frame actually fits.
    hit = truth.withColumn("__hit", F.lit(1))
    scored = masks.join(hit, ["id_a", "id_b"], "left")
    aggs = []
    for bands, rows in _SWEEP_CONFIGS:
        flag = in_cfg(bands, rows)
        aggs.append(
            F.sum(flag.cast("long")).alias(f"nc_{bands}_{rows}")
        )
        aggs.append(
            F.sum((flag & F.col("__hit").isNotNull()).cast("long")).alias(
                f"nh_{bands}_{rows}"
            )
        )
    counts = scored.agg(*aggs)
    outs = []
    for bands, rows in _SWEEP_CONFIGS:
        nc = F.col(f"nc_{bands}_{rows}")
        nh = F.col(f"nh_{bands}_{rows}")
        outs.append(
            counts.select(
                F.lit(bands).cast("int").alias("bands"),
                F.lit(rows).cast("int").alias("rows_per_band"),
                nc.cast("long").alias("n_candidates"),
                F.lit(n_true).cast("long").alias("n_true_pairs"),
                nh.cast("long").alias("n_hits"),
                F.round(
                    nh * 1.0
                    / F.nullif(F.lit(n_true).cast("long"), F.lit(0).cast("long")),
                    4,
                ).alias("recall"),
                F.round(
                    nh * 1.0
                    / F.nullif(nc.cast("long"), F.lit(0).cast("long")),
                    4,
                ).alias("lsh_precision"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("bands")


# ===========================================================================
# section consolidated from plans/round6i_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

@query(
    "d_dedup_pipeline_funnel",
    oracle=f"""
    WITH {_AUG_SQL.strip()},
    keyed AS (SELECT doc_id, source, md5(text) AS h FROM aug),
    exact_keep AS (
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM keyed
      ) WHERE rn = 1
    ),
    words AS (
      SELECT a.doc_id, string_split(a.text, ' ') AS w
      FROM aug a JOIN exact_keep k ON k.doc_id = a.doc_id
    ),
    shingles AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    nd_drop AS (
      SELECT DISTINCT i.id_b AS doc_id FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM shingles a JOIN shingles b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) i
      JOIN counts ca ON ca.doc_id = i.id_a
      JOIN counts cb ON cb.doc_id = i.id_b
      WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) > 0.5
    )
    SELECT k.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_exact,
           CAST(sum(CASE WHEN e.doc_id IS NOT NULL AND d.doc_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after_neardup,
           round(1 - sum(CASE WHEN e.doc_id IS NOT NULL AND d.doc_id IS NULL
                              THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS total_removal_rate
    FROM keyed k
    LEFT JOIN exact_keep e ON e.doc_id = k.doc_id
    LEFT JOIN nd_drop d ON d.doc_id = k.doc_id
    GROUP BY k.source
    ORDER BY k.source
    """,
)
def d_dedup_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup pipeline funnel over the near-dup-augmented corpus: per
    source, the document counts surviving each cascade stage — raw →
    exact content dedup (keep-min-id per md5) → near-dup prune (drop
    the LARGER id of any surviving pair with shingle-Jaccard > 0.5;
    the single-pass greedy rule — d_dedup_components/d_dedup_apply is
    the transitive-closure upgrade) — plus the end-to-end removal
    rate. This is the one-glance report a dataset owner reads before
    shipping: which stage removes how much, per source.

    Scale shape: stage 1 is the exact-dedup keep-min shuffle on the
    content hash; stage 2 runs the bounded shingle-join ONLY over
    stage-1 survivors (the cascade's whole point: each stage shrinks
    the next stage's input); the funnel itself is two doc-sized
    left-join flags folded per source. Doc-frequency caps stay on in
    production exactly as in the d_* family.
    """
    corpus = _augmented_corpus(spark, sf_dir)
    keyed = corpus.select("doc_id", "source", F.md5("text").alias("h"))
    keep_rn = F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
    exact_keep = (
        keyed.withColumn("rn", keep_rn)
        .filter(F.col("rn") == 1)
        .select("doc_id")
        .withColumn("kept_exact", F.lit(1))
    )
    from ..operators.dedup import jaccard_pairs, word_shingles

    survivors = corpus.join(
        exact_keep.select("doc_id"), "doc_id", "left_semi"
    )
    nd_drop = (
        jaccard_pairs(
            word_shingles(survivors, distinct=True),
            min_jaccard=0.5,
            max_doc_freq=None,
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("nd_dropped", F.lit(1))
    )
    flagged = (
        keyed.select("doc_id", "source")
        .join(exact_keep, "doc_id", "left")
        .join(nd_drop, "doc_id", "left")
    )
    kept_final = (
        (F.col("kept_exact") == 1) & F.col("nd_dropped").isNull()
    ).cast("int")
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("kept_exact", F.lit(0)))
            .cast("long")
            .alias("n_after_exact"),
            F.sum(kept_final).cast("long").alias("n_after_neardup"),
        )
        .select(
            "source",
            "n_docs",
            "n_after_exact",
            "n_after_neardup",
            F.round(
                1 - F.col("n_after_neardup") * 1.0 / F.col("n_docs"), 4
            ).alias("total_removal_rate"),
        )
        .orderBy("source")
    )


# ===========================================================================
# section consolidated from plans/round6n_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

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


# ===========================================================================
# section consolidated from plans/round7b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/curation.py)
# ===========================================================================

@query(
    "d_soft_dedup_weights",
    oracle="""
    WITH c AS (
      SELECT source,
             count(*) OVER (PARTITION BY md5(text)) AS csz
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(1.0 / csz), 4) AS effective_docs,
           round(count(*) / sum(1.0 / csz), 4) AS dup_inflation,
           CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicated_docs
    FROM c GROUP BY source ORDER BY source
    """,
)
def d_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-AWARE sampling weights (the SoftDedup alternative to
    hard removal): every copy of an exact-duplicate cluster stays in
    the corpus with weight 1/cluster_size, so the training distribution
    matches the deduplicated one without losing any copy's provenance
    or context. Output: per-source raw count, effective (weighted)
    size, the inflation ratio a mixing recipe must divide out, and how
    many docs sit in multi-copy clusters.

    Scale shape: cluster size via ONE shuffle on the content hash (a
    window over md5(text) partitions — equivalent to groupBy+join but
    half the shuffles since the row keeps its payload), then a
    map-side-combined groupBy(source). Clusters are content-hash
    partitions: uniformly spread by construction, no skew cap needed
    (a pathological 10^9-copy cluster is exactly what AQE skew-split
    handles; weights stay correct because the window count is exact).
    """
    docs = load_table(spark, sf_dir, "documents")
    csz = F.count("*").over(W.partitionBy(F.md5(F.encode(F.col("text"), "UTF-8"))))
    per_doc = docs.select("source", csz.alias("csz"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum(1.0 / F.col("csz")), 4).alias("effective_docs"),
            F.round(F.count("*") / F.sum(1.0 / F.col("csz")), 4).alias(
                "dup_inflation"
            ),
            F.sum((F.col("csz") > 1).cast("int")).cast("long").alias(
                "n_duplicated_docs"
            ),
        )
        .orderBy("source")
    )


# ===========================================================================
# section consolidated from plans/round7d_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 4: semantic dedup, entropy
# filtering, dedup-aware mixing, experiment guardrails.
#
# - d_semdedup_report     — cluster-scoped embedding near-dup removal
#   census (the SemDeDup recipe: pairwise cosine INSIDE clusters only)
# - t_doc_entropy_filter  — per-document unigram entropy quality filter
# - b_dedup_aware_mixture — temperature mixture computed on EFFECTIVE
#   (duplicate-discounted) token counts, composing d_soft_dedup_weights
#   with b_temperature_mixture's exponent family
# - b_ab_srm_check        — sample-ratio-mismatch guardrail (χ² vs the
#   designed 50/50 split) for the hash-assigned experiment
#
# Each with a DuckDB oracle; the SemDeDup pair join is bounded by the
# cluster partition — never an all-pairs product.
# ===========================================================================

_SEMDEDUP_REPORT_TAU = 0.3

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
    d_semdedup_prune (this module), the O(n) keeper-only
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


# ===========================================================================
# section consolidated from plans/round8_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

_ILSH_N_MINHASH = 8  # 4 bands x 2 rows, the d_minhash_lsh_pairs config

_ILSH_ORACLE = f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shingles AS (
      SELECT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    ),
    sigs AS (
      SELECT doc_id,
             {', '.join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(_ILSH_N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m2 || m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4 || m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6 || m7 FROM sigs
    ),
    partners AS (
      SELECT b.doc_id, count(DISTINCT c.doc_id) AS n_corpus_partners
      FROM bands b JOIN bands c ON b.band = c.band AND b.sig = c.sig
      WHERE b.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
      GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_corpus_partners, 0) AS BIGINT) AS n_corpus_partners,
           CASE WHEN coalesce(p.n_corpus_partners, 0) > 0
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
    LEFT JOIN partners p USING (doc_id)
    ORDER BY d.doc_id
"""

@query("d_incremental_lsh_dedup", oracle=_ILSH_ORACLE)
def d_incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup: today's batch (the doc_id % 10 = 7
    slice) is shingled, MinHashed, and banded, then probes the CORPUS's
    LSH band table on (band, signature); a batch doc colliding with any
    corpus doc is a near-dup candidate and verdicts 'drop'. Output per
    batch doc: distinct corpus-partner count and the keep/drop verdict
    — the near-dup analogue of d_incremental_dedup's exact-hash
    decision.

    Measured gap this closes (round-7 verdict item 6, depth only): the
    exact tier of the daily-crawl workflow is incremental
    (d_incremental_dedup anti-joins the batch against a maintained hash
    set — only the day's batch shuffles), but the near-dup tier's only
    gate (d_minhash_lsh_pairs) is a full-corpus SELF-join: every daily
    run re-pays shingling + signatures + the bucket join for the whole
    100 TB corpus. This gate pins the incremental shape: signatures are
    computed for the batch ONLY, and the corpus side is its band table
    — in production a MAINTAINED artifact (written once, bucketed on
    ``sig`` via sources/formats.py:write_bucketed — a subset of the
    (band, sig) join keys, sufficient for shuffle-free co-location —
    appended per batch), so the probe pays only the batch side's work.
    Daily cost: O(batch + collisions), independent of corpus size.
    The lifecycle is executed, not just documented:
    tests/test_formats.py:test_maintained_lsh_band_table_probe.

    Scale shape: one map-side-combined signature groupBy over the
    batch; the (band, sig) probe join is collision-bounded exactly like
    the self-join family (never all-pairs); the partner count groups by
    batch doc only. AQE broadcasts the batch band table when a day's
    crawl is small relative to the corpus. The md5 MinHash variant is
    the oracle pin (engine default is xxhash64 — same plan shape,
    operators/dedup.py:minhash_signatures).
    """
    from ..operators.dedup import (
        lsh_band_table,
        minhash_signatures,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 10 == 7

    def bands_of(df: DataFrame) -> DataFrame:
        sigs = minhash_signatures(
            word_shingles(df, distinct=False),
            n_hashes=_ILSH_N_MINHASH,
            hash_fn="md5",  # oracle pins md5
        )
        return lsh_band_table(sigs, bands=4, rows_per_band=2)

    batch_bands = bands_of(docs.filter(is_batch))
    corpus_bands = bands_of(docs.filter(~is_batch))

    partners = (
        batch_bands.select(F.col("id").alias("doc_id"), "band", "sig")
        .join(
            corpus_bands.select(F.col("id").alias("corpus_id"), "band", "sig"),
            ["band", "sig"],
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("corpus_id").alias("n_corpus_partners"))
    )
    n = F.coalesce("n_corpus_partners", F.lit(0))
    return (
        docs.filter(is_batch)
        .select("doc_id")
        .join(partners, "doc_id", "left")
        .select(
            "doc_id",
            n.cast("long").alias("n_corpus_partners"),
            F.when(n > 0, F.lit("drop")).otherwise(F.lit("keep")).alias("verdict"),
        )
        .orderBy("doc_id")
    )

_ENI_BANDS, _ENI_BITS = 4, 4  # the d_embedding_neardup oracle config

_ENI_TAU = 0.4               # measured sf0.01 margin ≥ 1e-4 (llmdata_ext)

def _eni_oracle(bands: int = _ENI_BANDS, bits: int = _ENI_BITS,
                tau: float = _ENI_TAU) -> str:
    from .llmdata import _duck_hyperplane

    n_bits = bands * bits
    dot_exprs = ", ".join(
        f"sum(val * {_duck_hyperplane(b)}) AS dot{b}" for b in range(n_bits)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT id, {band} AS band, {bucket} AS bucket FROM dots".format(
            band=b,
            bucket=" + ".join(
                f"(CASE WHEN dot{b * bits + k} > 0 THEN {1 << k} ELSE 0 END)"
                for k in range(bits)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH pos AS (
      SELECT vec_id AS id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    dots AS (SELECT id, {dot_exprs} FROM pos GROUP BY id),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT b.id AS id_b, c.id AS id_c
      FROM bands b
      JOIN bands c ON b.band = c.band AND b.bucket = c.bucket
      WHERE b.id % 10 = 7 AND c.id % 10 <> 7
    ),
    nrm AS (SELECT id, sqrt(sum(val * val)) AS n FROM pos GROUP BY id),
    verified AS (
      SELECT d.id_b, count(*) AS n_partners
      FROM (
        SELECT c.id_b, c.id_c, sum(pb.val * pc.val) AS dp
        FROM cand c
        JOIN pos pb ON pb.id = c.id_b
        JOIN pos pc ON pc.id = c.id_c AND pc.pos = pb.pos
        GROUP BY c.id_b, c.id_c
      ) d
      JOIN nrm nb ON nb.id = d.id_b
      JOIN nrm nc ON nc.id = d.id_c
      WHERE d.dp / (nb.n * nc.n) >= {tau}
      GROUP BY d.id_b
    )
    SELECT e.vec_id,
           CAST(coalesce(v.n_partners, 0) AS BIGINT) AS n_corpus_partners,
           CASE WHEN coalesce(v.n_partners, 0) > 0
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM embeddings e
    LEFT JOIN verified v ON v.id_b = e.vec_id
    WHERE e.vec_id % 10 = 7
    ORDER BY e.vec_id
    """

def _eni_plan(
    spark: SparkSession, sf_dir: str, bands: int, bits: int, tau: float
) -> DataFrame:
    """Shared plan body of the embedding-probe twins (the oracle side is
    shared the same way via _eni_oracle(bands, bits, tau))."""
    from ..operators.similarity import embedding_neardup_incremental

    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % 10 == 7
    verified = embedding_neardup_incremental(
        emb.filter(is_batch),
        emb.filter(~is_batch),
        tau=tau,
        bands=bands,
        bits_per_band=bits,
        dim=64,
    )
    partners = verified.groupBy("id").agg(
        F.count("*").alias("n_corpus_partners")
    )
    n = F.coalesce("n_corpus_partners", F.lit(0))
    return (
        emb.filter(is_batch)
        .select("vec_id")
        .join(partners, F.col("vec_id") == F.col("id"), "left")
        .select(
            "vec_id",
            n.cast("long").alias("n_corpus_partners"),
            F.when(n > 0, F.lit("drop")).otherwise(F.lit("keep")).alias("verdict"),
        )
        .orderBy("vec_id")
    )

_ENIP_BANDS, _ENIP_BITS, _ENIP_TAU = 4, 16, 0.9

@query(
    "d_embedding_neardup_incremental",
    oracle=_eni_oracle(_ENIP_BANDS, _ENIP_BITS, _ENIP_TAU),
)
def d_embedding_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding near-dup, PRODUCTION config (the one to
    use): the day's batch (vec_id % 10 = 7) probes the corpus's
    hyperplane-LSH band table on (band, bucket) with selective 4×16
    bands and exact cosine verifies candidates at τ=0.9; per batch
    vector, the count of VERIFIED corpus partners and the keep/drop
    verdict.

    Measured gap this closes: the text tier of the daily near-dup probe
    landed as d_incremental_lsh_dedup (10× probe ratio 0.9 vs the
    self-join's 1.4), but the EMBEDDING tier's only gate
    (d_embedding_neardup) was the full-corpus self-join — a daily
    semantic-dedup run re-paying the corpus LSH pass AND its
    intra-corpus bucket collisions every day. The incremental operator
    (operators/similarity.py:embedding_neardup_incremental) pays one
    LSH pass over the batch, batch-vs-corpus bucket joins only, and
    one embedding re-join per surviving candidate — against a
    MAINTAINED corpus band table at scale. 10× probe ratio 0.9
    (SCALE_PROBE.md); the round-8 verdict flagged that the coarse
    eval-only config must not own this primary name, so round 9 swapped
    the suffixes (the coarse semantic pin now lives under `_pin`)."""
    return _eni_plan(spark, sf_dir, _ENIP_BANDS, _ENIP_BITS, _ENIP_TAU)

@query("d_embedding_neardup_incremental_pin", oracle=_eni_oracle())
def d_embedding_neardup_incremental_pin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EVAL-ONLY semantic pin of d_embedding_neardup_incremental — do
    NOT use this config for production runs: coarse 4×4 bands / τ=0.4
    (the d_embedding_neardup oracle pin) produce REAL collisions and
    verified drops on the synthetic corpus, so the verify path is
    hash-pinned end-to-end — but coarse bands make collision volume
    quadratic-ish in corpus size (measured 10× probe ratio 8.0,
    SCALE_PROBE.md). The unsuffixed name carries the scale-safe 4×16 /
    τ=0.9 production config through the identical operator and plan
    body; this twin exists only so the drop branch of the verdict logic
    stays oracle-covered (the production config's verified set is empty
    on this corpus by design)."""
    return _eni_plan(spark, sf_dir, _ENI_BANDS, _ENI_BITS, _ENI_TAU)


# ===========================================================================
# Round-9 addition: the maintained-state LIFECYCLE, measured end-to-end.
# The incremental near-dup gates (d_incremental_lsh_dedup and the
# embedding twins) probe against corpus state BUILT IN-QUERY — the
# round-8 verdict (item 5a) called out that the maintenance path itself
# (build state day 1, probe AND append day 2, serve day 3 from the
# UPDATED state) was asserted, not measured. This gate replays two
# ingest days against one maintained band table and pins, hash-exactly,
# that day 3's verdicts see day-2 documents as partners — i.e. the
# append is live, not just documented. tests/test_formats.py runs the
# same three days through a PERSISTED bucketed parquet band table
# (write day 1, append day 2, re-read for day 3) and asserts verdict
# equality with this in-query pin, so the artifact path and the
# semantics cannot drift apart.
# ===========================================================================

_LBL_ORACLE = f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shingles AS (
      SELECT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    ),
    sigs AS (
      SELECT doc_id,
             {', '.join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(_ILSH_N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m1 FROM sigs
      UNION ALL SELECT doc_id, 2, m2 FROM sigs
      UNION ALL SELECT doc_id, 3, m3 FROM sigs
      UNION ALL SELECT doc_id, 4, m4 FROM sigs
      UNION ALL SELECT doc_id, 5, m5 FROM sigs
      UNION ALL SELECT doc_id, 6, m6 FROM sigs
      UNION ALL SELECT doc_id, 7, m7 FROM sigs
    ),
    p2 AS (
      SELECT b.doc_id, count(DISTINCT c.doc_id) AS n_corpus_partners
      FROM bands b JOIN bands c ON b.band = c.band AND b.sig = c.sig
      WHERE b.doc_id % 10 = 7 AND c.doc_id % 10 NOT IN (7, 8)
      GROUP BY 1
    ),
    p3 AS (
      SELECT b.doc_id,
             count(DISTINCT CASE WHEN c.doc_id % 10 NOT IN (7, 8)
                            THEN c.doc_id END) AS n_corpus_partners,
             count(DISTINCT CASE WHEN c.doc_id % 10 = 7
                            THEN c.doc_id END) AS n_day2_partners
      FROM bands b JOIN bands c ON b.band = c.band AND b.sig = c.sig
      WHERE b.doc_id % 10 = 8 AND c.doc_id % 10 <> 8
      GROUP BY 1
    )
    SELECT 'd2' AS day, d.doc_id,
           CAST(coalesce(p.n_corpus_partners, 0) AS BIGINT) AS n_corpus_partners,
           CAST(0 AS BIGINT) AS n_day2_partners,
           CASE WHEN coalesce(p.n_corpus_partners, 0) > 0
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
    LEFT JOIN p2 p USING (doc_id)
    UNION ALL
    SELECT 'd3', d.doc_id,
           CAST(coalesce(p.n_corpus_partners, 0) AS BIGINT),
           CAST(coalesce(p.n_day2_partners, 0) AS BIGINT),
           CASE WHEN coalesce(p.n_corpus_partners, 0)
                     + coalesce(p.n_day2_partners, 0) > 0
                THEN 'drop' ELSE 'keep' END
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 8) d
    LEFT JOIN p3 p USING (doc_id)
    ORDER BY day, doc_id
"""


def _lbl_bands(df: DataFrame) -> DataFrame:
    """8 bands x 1 row — the RECALL-heavy daily tier (P(candidate) =
    1-(1-j)^8, far left on the S-curve vs the 4x2 pair gate): a
    maintained dedup table errs toward catching near-dups and lets the
    exact-verify stage (the funnel's next hop) discard false bucket
    friends. It also makes the day-2 -> day-3 state transition
    OBSERVABLE on the synthetic corpus at every test SF (4x2 produces
    ~26 collision pairs corpus-wide at sf0.01 — none straddling the two
    batch days; 8x1 produces ~19 straddling pairs at sf0.001 AND
    sf0.01, so the lifecycle invariant below is pinned, not vacuous)."""
    from ..operators.dedup import lsh_band_table, minhash_signatures, word_shingles

    sigs = minhash_signatures(
        word_shingles(df, distinct=False), n_hashes=_ILSH_N_MINHASH, hash_fn="md5"
    )
    return lsh_band_table(sigs, bands=8, rows_per_band=1)


def _lbl_probe(batch_bands: DataFrame, state_bands: DataFrame) -> DataFrame:
    """(doc_id, n_corpus_partners, n_day2_partners): one collision-
    bounded (band, sig) join against the maintained state; the partner
    split by origin (day-2 appends carry doc_id % 10 = 7) is what makes
    the append OBSERVABLE in the output."""
    is_d2 = F.col("partner_id") % 10 == 7
    return (
        batch_bands.select(F.col("id").alias("doc_id"), "band", "sig")
        .join(
            state_bands.select(F.col("id").alias("partner_id"), "band", "sig"),
            ["band", "sig"],
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct(F.when(~is_d2, F.col("partner_id"))).alias(
                "n_corpus_partners"
            ),
            F.countDistinct(F.when(is_d2, F.col("partner_id"))).alias(
                "n_day2_partners"
            ),
        )
    )


@query("d_lsh_band_lifecycle", oracle=_LBL_ORACLE)
def d_lsh_band_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-day replay of the MAINTAINED LSH band table: day 1 builds the
    corpus band table (doc_id % 10 not in (7, 8)); day 2's batch
    (% 10 = 7) probes it for verdicts and is then APPENDED to the
    table; day 3's batch (% 10 = 8) probes the UPDATED table. Output:
    per batch doc and day, the partner count split by origin (original
    corpus vs day-2 appends) and the keep/drop verdict — a day-3 doc
    with n_day2_partners > 0 is caught ONLY because the day-2 append is
    live, which is the lifecycle property the incremental gates assumed
    (d_incremental_lsh_dedup probes one static state; this pins the
    state TRANSITION).

    Measured gap this closes (round-8 verdict item 5a): the maintenance
    path — probe, append, serve the next day — was executed only for a
    single day (tests/test_formats.py:test_maintained_lsh_band_table_
    probe) and otherwise asserted in docstrings.
    tests/test_formats.py:test_lsh_band_table_two_day_lifecycle runs
    these exact three days through a PERSISTED bucketed parquet table
    (write, append, re-read) and asserts verdict equality with this
    hash-oracled pin.

    Scale shape: signatures are computed once per slice (day-2 bands
    feed both its probe and the day-3 state union — one logical
    subtree); both probes are collision-bounded (band, sig) joins, never
    all-pairs; verdict assembly is a left join back to the slice's id
    list. The union-as-state is the semantic pin of the appended table;
    production serves the same rows from one bucketed artifact
    (sources/formats.py:write_bucketed), so the day-3 probe stays
    shuffle-free on the corpus side at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    mod = F.col("doc_id") % 10

    # ONE shingle + minhash + banding pass over ALL docs (r12, guide
    # §2.3/§2.4). Bands are a per-doc function (the minhash groupBy is
    # keyed on doc_id), so bands(docs).filter(pred-on-id) ≡
    # bands(docs.filter(pred)) — the old shape ran the pipeline once
    # per day slice (3 full text scans whose slices union to the whole
    # table, with the day-2 subtree re-derived for the day-3 state
    # union). The lazy checkpoint materializes the band table once;
    # without it the optimizer pushes each slice filter back below the
    # aggregation and the three pipelines re-separate.
    bands = _lbl_bands(docs).localCheckpoint(eager=False)

    # BOTH probes as ONE collision-bounded (band, sig) join + one
    # conditional aggregation (the band-sweep/nprobe discipline): the
    # day-2 probe pairs {b%10=7 × state %10∉{7,8}} and the day-3 probe
    # pairs {b%10=8 × state %10≠8} are disjoint by the probe doc's day,
    # so their union — the join below, filtered to (day-3) ∨ (partner
    # ∉ day-2) — aggregates per doc_id to exactly the per-day partner
    # counts (each doc belongs to one day).
    bmod = F.col("id") % 10
    b = bands.filter(bmod.isin(7, 8)).select(
        F.col("id").alias("doc_id"), "band", "sig"
    )
    c = bands.filter(bmod != 8).select(
        F.col("id").alias("partner_id"), "band", "sig"
    )
    dm = F.col("doc_id") % 10
    pm = F.col("partner_id") % 10
    probed = (
        b.join(c, ["band", "sig"])
        .filter((dm == 8) | (pm != 7))
        .groupBy("doc_id")
        .agg(
            F.countDistinct(F.when(pm != 7, F.col("partner_id"))).alias(
                "n_corpus_partners"
            ),
            F.countDistinct(F.when(pm == 7, F.col("partner_id"))).alias(
                "n_day2_partners"
            ),
        )
    )
    nc = F.coalesce("n_corpus_partners", F.lit(0)).cast("long")
    nd = F.coalesce("n_day2_partners", F.lit(0)).cast("long")
    return (
        docs.filter(mod.isin(7, 8))
        .select(
            "doc_id",
            F.when(mod == 7, F.lit("d2")).otherwise(F.lit("d3")).alias("day"),
        )
        .join(probed, "doc_id", "left")
        .select(
            "day",
            "doc_id",
            nc.alias("n_corpus_partners"),
            nd.alias("n_day2_partners"),
            F.when(nc + nd > 0, F.lit("drop"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
        .orderBy("day", "doc_id")
    )


# ===========================================================================
# d_lsh_band_retraction — the DELETE side of the maintained band table.
# The incremental family (probe gates, the two-day lifecycle above)
# covers APPEND-only maintenance; real corpus state also shrinks —
# takedowns, license expiry, quality retractions — and a band table
# that keeps serving retracted docs as dedup partners silently blocks
# NEW documents on content the corpus no longer contains. Measured gap:
# no gate exercised state shrinkage anywhere in the dedup family.
# ===========================================================================

_LBR_ORACLE = f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    shingles AS (
      SELECT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh
      FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 3
    ),
    sigs AS (
      SELECT doc_id,
             {', '.join(f"min(md5('{i}' || sh)) AS m{i}" for i in range(_ILSH_N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, m0 AS sig FROM sigs
      UNION ALL SELECT doc_id, 1, m1 FROM sigs
      UNION ALL SELECT doc_id, 2, m2 FROM sigs
      UNION ALL SELECT doc_id, 3, m3 FROM sigs
      UNION ALL SELECT doc_id, 4, m4 FROM sigs
      UNION ALL SELECT doc_id, 5, m5 FROM sigs
      UNION ALL SELECT doc_id, 6, m6 FROM sigs
      UNION ALL SELECT doc_id, 7, m7 FROM sigs
    ),
    p AS (
      SELECT b.doc_id,
             count(DISTINCT CASE WHEN c.doc_id % 10 NOT IN (5, 7, 8)
                            THEN c.doc_id END) AS n_retained_partners,
             count(DISTINCT CASE WHEN c.doc_id % 10 = 7
                            THEN c.doc_id END) AS n_day2_partners,
             count(DISTINCT CASE WHEN c.doc_id % 10 = 5
                            THEN c.doc_id END) AS n_retracted_partners
      FROM bands b JOIN bands c ON b.band = c.band AND b.sig = c.sig
      WHERE b.doc_id % 10 = 8 AND c.doc_id % 10 <> 8
      GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_retained_partners, 0) AS BIGINT)
             AS n_retained_partners,
           CAST(coalesce(p.n_day2_partners, 0) AS BIGINT) AS n_day2_partners,
           CAST(coalesce(p.n_retracted_partners, 0) AS BIGINT)
             AS n_retracted_partners,
           CASE WHEN coalesce(p.n_retained_partners, 0)
                     + coalesce(p.n_day2_partners, 0) > 0
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 8) d
    LEFT JOIN p USING (doc_id)
    ORDER BY d.doc_id
"""


@query("d_lsh_band_retraction", oracle=_LBR_ORACLE)
def d_lsh_band_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction (takedown) maintenance of the LSH band table: between
    the day-2 append and the day-3 probe, the doc_id % 10 = 5 slice is
    RETRACTED from the corpus (takedown / license expiry). Day 3's
    batch (% 10 = 8) probes the post-retraction state — retained
    corpus + day-2 appends, minus the retracted docs — and the output
    carries, per batch doc, the partner count per class: retained,
    day-2-appended, and RETRACTED (what the probe would have matched
    had the takedown not been honored). Verdicts count retained + day-2
    partners ONLY: a doc whose sole near-dups were retracted is now a
    'keep' — blocking new content on deleted corpus is the compliance
    failure this gate exists to catch (one flip pinned at sf0.001 by
    tests/test_round9.py; the n_retracted_partners column keeps the
    retraction observable in the hash at every SF — 19 nonzero rows at
    sf0.01).

    Measured gap this closes: every maintained-state gate (the probe
    family, d_lsh_band_lifecycle, e_ivf_quantizer_lifecycle) grows
    state monotonically; deletion — the other half of real index
    maintenance — was unexercised.

    Scale shape: the retraction is an anti-join of the maintained band
    table against the (small) retracted-id list — at 100 TB, a
    broadcast anti-join rewrite of only the buckets holding retracted
    rows, or a tombstone column filtered at probe time; the in-query
    subtraction here pins the SEMANTICS either implementation must
    produce. The probe itself is the same collision-bounded (band, sig)
    join as the whole family; the retracted-partner census costs one
    extra conditional count in the same aggregation, not a second join.
    """
    docs = load_table(spark, sf_dir, "documents")
    mod = F.col("doc_id") % 10
    # ONE shingle + minhash + banding pass over ALL docs (r12 — the
    # d_lsh_band_lifecycle restructure; bands are a per-doc function,
    # so post-aggregation id filters reproduce the per-slice band
    # tables exactly; the lazy checkpoint stops the optimizer pushing
    # the slice filters back below the aggregation, which would
    # re-separate the three pipelines into three full text scans).
    bands = _lbl_bands(docs).localCheckpoint(eager=False)
    # maintained state after append (day 2) and retraction: retained
    # corpus + day-2 batch; the retracted slice's bands probe SEPARATELY
    # only to report what the takedown suppressed
    state = bands.filter(F.col("id") % 10 != 8)
    d3_bands = bands.filter(F.col("id") % 10 == 8)
    pm = F.col("partner_id") % 10
    probed = (
        d3_bands.select(F.col("id").alias("doc_id"), "band", "sig")
        .join(
            state.select(F.col("id").alias("partner_id"), "band", "sig"),
            ["band", "sig"],
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct(
                F.when(~pm.isin(5, 7), F.col("partner_id"))
            ).alias("n_retained_partners"),
            F.countDistinct(F.when(pm == 7, F.col("partner_id"))).alias(
                "n_day2_partners"
            ),
            F.countDistinct(F.when(pm == 5, F.col("partner_id"))).alias(
                "n_retracted_partners"
            ),
        )
    )
    nr = F.coalesce("n_retained_partners", F.lit(0)).cast("long")
    nd = F.coalesce("n_day2_partners", F.lit(0)).cast("long")
    nx = F.coalesce("n_retracted_partners", F.lit(0)).cast("long")
    return (
        docs.filter(mod == 8)
        .select("doc_id")
        .join(probed, "doc_id", "left")
        .select(
            "doc_id",
            nr.alias("n_retained_partners"),
            nd.alias("n_day2_partners"),
            nx.alias("n_retracted_partners"),
            F.when(nr + nd > 0, F.lit("drop"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
        .orderBy("doc_id")
    )

# ===========================================================================
# Round-10 addition: the EMBEDDING band table's two-day lifecycle.
# The text LSH family has build/append/serve (d_lsh_band_lifecycle) and
# retraction (d_lsh_band_retraction) gates; the embedding hyperplane
# band table (operators/similarity.py:hyperplane_lsh_bands) had only
# static probes (d_embedding_neardup_incremental and its _pin twin) —
# the round-9 verdict (What's missing #3) named the asymmetry: no gate
# executed the embedding band table's own maintenance transition.
# ===========================================================================

_EBL_BANDS, _EBL_BITS = 4, 12
# 4 bands x 12 bits: measured on the synthetic corpus as the config
# where the day-2 append is OBSERVABLE — 2 day-3 verdict flips (day-2
# partners, zero corpus partners) at BOTH sf0.001 and sf0.01, while
# staying selective (24 of 50 day-3 vectors probe any partner at all;
# the 4x8/8x8 coarse configs collide everyone with the corpus and flip
# nothing, 4x16 matches nothing on this corpus).


def _eb_band_cte() -> str:
    """Shared oracle prefix of the embedding band gates: the
    ``pos``/``dots``/``bands`` CTE chain computing every vector's
    (band, bucket) rows at the 4×12 config. ONE implementation feeds
    both the lifecycle and the retraction oracle — a hyperplane or
    banding tweak applied to one but not the other would make the two
    gates silently disagree on what the 'same' band table is (their
    cross-gate consistency test pins retained+retracted == corpus)."""
    from .llmdata import _duck_hyperplane

    n_bits = _EBL_BANDS * _EBL_BITS
    dot_exprs = ", ".join(
        f"sum(val * {_duck_hyperplane(b)}) AS dot{b}" for b in range(n_bits)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT id, {band} AS band, {bucket} AS bucket FROM dots".format(
            band=b,
            bucket=" + ".join(
                f"(CASE WHEN dot{b * _EBL_BITS + k} > 0 THEN {1 << k} ELSE 0 END)"
                for k in range(_EBL_BITS)
            ),
        )
        for b in range(_EBL_BANDS)
    )
    return f"""
    WITH pos AS (
      SELECT vec_id AS id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    dots AS (SELECT id, {dot_exprs} FROM pos GROUP BY id),
    bands AS ({band_selects})"""


def _ebl_oracle() -> str:
    return f"""{_eb_band_cte()},
    p2 AS (
      SELECT b.id, count(DISTINCT c.id) AS n_corpus_partners
      FROM bands b JOIN bands c ON b.band = c.band AND b.bucket = c.bucket
      WHERE b.id % 10 = 7 AND c.id % 10 NOT IN (7, 8)
      GROUP BY 1
    ),
    p3 AS (
      SELECT b.id,
             count(DISTINCT CASE WHEN c.id % 10 NOT IN (7, 8)
                            THEN c.id END) AS n_corpus_partners,
             count(DISTINCT CASE WHEN c.id % 10 = 7
                            THEN c.id END) AS n_day2_partners
      FROM bands b JOIN bands c ON b.band = c.band AND b.bucket = c.bucket
      WHERE b.id % 10 = 8 AND c.id % 10 <> 8
      GROUP BY 1
    )
    SELECT 'd2' AS day, e.vec_id,
           CAST(coalesce(p.n_corpus_partners, 0) AS BIGINT) AS n_corpus_partners,
           CAST(0 AS BIGINT) AS n_day2_partners,
           CASE WHEN coalesce(p.n_corpus_partners, 0) > 0
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 7) e
    LEFT JOIN p2 p ON p.id = e.vec_id
    UNION ALL
    SELECT 'd3', e.vec_id,
           CAST(coalesce(p.n_corpus_partners, 0) AS BIGINT),
           CAST(coalesce(p.n_day2_partners, 0) AS BIGINT),
           CASE WHEN coalesce(p.n_corpus_partners, 0)
                     + coalesce(p.n_day2_partners, 0) > 0
                THEN 'drop' ELSE 'keep' END
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 8) e
    LEFT JOIN p3 p ON p.id = e.vec_id
    ORDER BY day, vec_id
"""


def _ebl_bands_of(df: DataFrame) -> DataFrame:
    from ..operators.similarity import hyperplane_lsh_bands

    return hyperplane_lsh_bands(
        df, bands=_EBL_BANDS, bits_per_band=_EBL_BITS, dim=64
    )


def _ebl_probe(batch_bands: DataFrame, state_bands: DataFrame) -> DataFrame:
    """(vec_id, n_corpus_partners, n_day2_partners): one collision-
    bounded (band, bucket) join against the maintained state, partner
    counts split by origin (day-2 appends carry vec_id % 10 = 7) —
    the embedding mirror of _lbl_probe."""
    is_d2 = F.col("partner_id") % 10 == 7
    return (
        batch_bands.select(F.col("id").alias("vec_id"), "band", "bucket")
        .join(
            state_bands.select(
                F.col("id").alias("partner_id"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .groupBy("vec_id")
        .agg(
            F.countDistinct(F.when(~is_d2, F.col("partner_id"))).alias(
                "n_corpus_partners"
            ),
            F.countDistinct(F.when(is_d2, F.col("partner_id"))).alias(
                "n_day2_partners"
            ),
        )
    )


@query("d_embedding_band_lifecycle", oracle=_ebl_oracle())
def d_embedding_band_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-day replay of the MAINTAINED embedding hyperplane band table
    — the embedding mirror of d_lsh_band_lifecycle: day 1 builds the
    corpus band table (vec_id % 10 not in (7, 8)); day 2's batch
    (% 10 = 7) probes it for verdicts and is APPENDED; day 3's batch
    (% 10 = 8) probes the UPDATED table. Output per batch vector and
    day: the candidate-partner count split by origin (original corpus
    vs day-2 appends) and the keep/drop verdict — a day-3 vector with
    n_day2_partners > 0 and no corpus partners is dropped ONLY because
    the day-2 append is live (2 such flips at sf0.001 AND sf0.01,
    pinned by tests/test_round10.py).

    Measured gap this closes (round-9 verdict item 4): the text band
    table's full lifecycle is gated; the embedding band table behind
    d_embedding_neardup_incremental probes state built in-query for one
    day only — its append-then-serve transition was asserted, never
    executed. tests/test_round10.py additionally runs the same three
    days through a PERSISTED bucketed parquet band table (write day 1,
    append day 2, re-read for day 3) and asserts verdict equality with
    this hash-oracled pin, so the artifact path and the semantics
    cannot drift apart.

    Scale shape: identical to the text twin — band signatures computed
    once per slice (day-2 bands feed both its probe and the day-3
    state union), both probes collision-bounded (band, bucket) joins
    (never all-pairs), verdict assembly a left join back to the
    slice's id list. The hyperplane matrix is a broadcast O(dim·bits)
    artifact. Candidate counts here are band-level (the funnel's next
    hop — exact-cosine verify — is gated separately by the
    d_embedding_neardup family); the 4x12 banding is the measured
    observability point on this corpus, see _EBL_BANDS.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    mod = F.col("vec_id") % 10

    # ONE hyperplane banding pass over ALL vectors + BOTH probes as ONE
    # collision-bounded (band, bucket) join with conditional
    # aggregation — the embedding mirror of the d_lsh_band_lifecycle
    # restructure (r12, guide §2.3/§2.4); see that gate for the
    # equivalence argument (bands are a per-vector function; the two
    # probes' pair sets are disjoint by the probe vector's day).
    bands = _ebl_bands_of(emb).localCheckpoint(eager=False)
    bmod = F.col("id") % 10
    b = bands.filter(bmod.isin(7, 8)).select(
        F.col("id").alias("vec_id"), "band", "bucket"
    )
    c = bands.filter(bmod != 8).select(
        F.col("id").alias("partner_id"), "band", "bucket"
    )
    dm = F.col("vec_id") % 10
    pm = F.col("partner_id") % 10
    probed = (
        b.join(c, ["band", "bucket"])
        .filter((dm == 8) | (pm != 7))
        .groupBy("vec_id")
        .agg(
            F.countDistinct(F.when(pm != 7, F.col("partner_id"))).alias(
                "n_corpus_partners"
            ),
            F.countDistinct(F.when(pm == 7, F.col("partner_id"))).alias(
                "n_day2_partners"
            ),
        )
    )
    nc = F.coalesce("n_corpus_partners", F.lit(0)).cast("long")
    nd = F.coalesce("n_day2_partners", F.lit(0)).cast("long")
    return (
        emb.filter(mod.isin(7, 8))
        .select(
            "vec_id",
            F.when(mod == 7, F.lit("d2")).otherwise(F.lit("d3")).alias("day"),
        )
        .join(probed, "vec_id", "left")
        .select(
            "day",
            "vec_id",
            nc.alias("n_corpus_partners"),
            nd.alias("n_day2_partners"),
            F.when(nc + nd > 0, F.lit("drop"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
        .orderBy("day", "vec_id")
    )

# ===========================================================================
# d_embedding_band_retraction — the DELETE side of the embedding band
# table, completing the maintenance matrix: {text LSH, embedding LSH} ×
# {lifecycle (build/append/serve), retraction (takedown)} now all have
# hash-oracled gates. Same measured gap as d_lsh_band_retraction, one
# modality over: an embedding band table still serving retracted
# vectors as near-dup candidates blocks new content on corpus the
# store no longer contains.
# ===========================================================================


def _ebr_oracle() -> str:
    return f"""{_eb_band_cte()},
    p AS (
      SELECT b.id,
             count(DISTINCT CASE WHEN c.id % 10 NOT IN (5, 7, 8)
                            THEN c.id END) AS n_retained_partners,
             count(DISTINCT CASE WHEN c.id % 10 = 7
                            THEN c.id END) AS n_day2_partners,
             count(DISTINCT CASE WHEN c.id % 10 = 5
                            THEN c.id END) AS n_retracted_partners
      FROM bands b JOIN bands c ON b.band = c.band AND b.bucket = c.bucket
      WHERE b.id % 10 = 8 AND c.id % 10 <> 8
      GROUP BY 1
    )
    SELECT e.vec_id,
           CAST(coalesce(p.n_retained_partners, 0) AS BIGINT)
             AS n_retained_partners,
           CAST(coalesce(p.n_day2_partners, 0) AS BIGINT) AS n_day2_partners,
           CAST(coalesce(p.n_retracted_partners, 0) AS BIGINT)
             AS n_retracted_partners,
           CASE WHEN coalesce(p.n_retained_partners, 0)
                     + coalesce(p.n_day2_partners, 0) > 0
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 8) e
    LEFT JOIN p ON p.id = e.vec_id
    ORDER BY e.vec_id
"""


@query("d_embedding_band_retraction", oracle=_ebr_oracle())
def d_embedding_band_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction (takedown) maintenance of the embedding hyperplane
    band table — the embedding mirror of d_lsh_band_retraction:
    between the day-2 append and the day-3 probe, the vec_id % 10 = 5
    slice is RETRACTED (takedown / license expiry). Day 3's batch
    (% 10 = 8) probes the post-retraction state — retained corpus +
    day-2 appends, minus the retracted vectors — and the output
    carries, per batch vector, the candidate-partner count per class:
    retained, day-2-appended, and RETRACTED (what the probe would have
    matched had the takedown not been honored). Verdicts count
    retained + day-2 partners ONLY; the n_retracted_partners column
    keeps the retraction observable in the hash (non-vacuity pinned at
    sf0.001 by tests/test_round10.py).

    Closes the last cell of the maintenance matrix ({text, embedding}
    band tables × {append lifecycle, takedown}): the round-9 verdict
    (What's missing #3) named the embedding family's missing
    retraction coverage.

    Scale shape: identical to the text twin — the retraction is an
    anti-join of the maintained band table against the (small)
    retracted-id list (at 100 TB: a broadcast anti-join rewrite of
    only the buckets holding retracted rows, or a tombstone column
    filtered at probe time; tests/test_round10.py's physical twin for
    the text table exercises the ParquetStore.delete_rows rewrite the
    docstring family promises). The probe is the same collision-
    bounded (band, bucket) join as the whole family; the
    retracted-partner census costs one conditional count in the same
    aggregation, not a second join. 4×12 banding: see _EBL_BANDS.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    mod = F.col("vec_id") % 10
    # ONE hyperplane banding pass over ALL vectors (r12 — the
    # d_lsh_band_retraction restructure; bands are a per-vector
    # function, so post-hoc id filters reproduce the slice band tables
    # exactly).
    bands = _ebl_bands_of(emb).localCheckpoint(eager=False)
    # maintained state after append (day 2) and retraction: retained
    # corpus + day-2 batch; the retracted slice's bands stay in the
    # probe ONLY to report what the takedown suppressed
    state = bands.filter(F.col("id") % 10 != 8)
    d3_bands = bands.filter(F.col("id") % 10 == 8)
    pm = F.col("partner_id") % 10
    probed = (
        d3_bands.select(F.col("id").alias("vec_id"), "band", "bucket")
        .join(
            state.select(F.col("id").alias("partner_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .groupBy("vec_id")
        .agg(
            F.countDistinct(
                F.when(~pm.isin(5, 7), F.col("partner_id"))
            ).alias("n_retained_partners"),
            F.countDistinct(F.when(pm == 7, F.col("partner_id"))).alias(
                "n_day2_partners"
            ),
            F.countDistinct(F.when(pm == 5, F.col("partner_id"))).alias(
                "n_retracted_partners"
            ),
        )
    )
    nr = F.coalesce("n_retained_partners", F.lit(0)).cast("long")
    nd = F.coalesce("n_day2_partners", F.lit(0)).cast("long")
    nx = F.coalesce("n_retracted_partners", F.lit(0)).cast("long")
    return (
        emb.filter(mod == 8)
        .select("vec_id")
        .join(probed, "vec_id", "left")
        .select(
            "vec_id",
            nr.alias("n_retained_partners"),
            nd.alias("n_day2_partners"),
            nx.alias("n_retracted_partners"),
            F.when(nr + nd > 0, F.lit("drop"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
        .orderBy("vec_id")
    )

# ===========================================================================
# d_exact_dedup_retraction — takedown maintenance of the EXACT-hash
# dedup set, the first stage of the dedup funnel. The maintenance
# matrix covered the near-dup tiers ({text, embedding} band tables ×
# {lifecycle, retraction}) and the quantizer; the exact tier
# (d_incremental_dedup's maintained fingerprint set — plans/
# llmdata_ext.py) still grew monotonically: a takedown that leaves the
# retracted doc's fingerprint in the set keeps blocking every future
# mirror of content the corpus no longer contains — at the EXACT tier
# this is a hard block (identical head → unconditional drop), so the
# compliance stakes are highest of the whole family.
# ===========================================================================

_XDR_ORACLE = """
    WITH heads AS (
      SELECT doc_id, md5(array_to_string(split(text, ' ')[1:8], ' ')) AS h
      FROM documents
    ),
    p AS (
      SELECT b.doc_id,
             count(DISTINCT CASE WHEN c.doc_id % 10 NOT IN (5, 7, 8)
                            THEN c.doc_id END) AS n_retained_matches,
             count(DISTINCT CASE WHEN c.doc_id % 10 = 7
                            THEN c.doc_id END) AS n_day2_matches,
             count(DISTINCT CASE WHEN c.doc_id % 10 = 5
                            THEN c.doc_id END) AS n_retracted_matches
      FROM heads b JOIN heads c ON b.h = c.h
      WHERE b.doc_id % 10 = 8 AND c.doc_id % 10 <> 8
      GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_retained_matches, 0) AS BIGINT)
             AS n_retained_matches,
           CAST(coalesce(p.n_day2_matches, 0) AS BIGINT) AS n_day2_matches,
           CAST(coalesce(p.n_retracted_matches, 0) AS BIGINT)
             AS n_retracted_matches,
           CASE WHEN coalesce(p.n_retained_matches, 0)
                     + coalesce(p.n_day2_matches, 0) > 0
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 8) d
    LEFT JOIN p USING (doc_id)
    ORDER BY d.doc_id
"""


@query("d_exact_dedup_retraction", oracle=_XDR_ORACLE)
def d_exact_dedup_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction (takedown) maintenance of the exact-hash dedup set —
    the EXACT-tier member of the retraction family
    (d_lsh_band_retraction, d_embedding_band_retraction,
    e_ivf_quantizer_retraction): between the day-2 append and the
    day-3 probe, the doc_id % 10 = 5 slice is RETRACTED from the
    maintained head-fingerprint set (the same md5-of-first-8-words key
    d_incremental_dedup maintains, plans/llmdata_ext.py). Day 3's
    batch (% 10 = 8) probes the post-retraction set; per batch doc the
    output counts matching docs per class — retained, day-2-appended,
    RETRACTED (what the probe would have hard-blocked on had the
    takedown not been honored) — and verdicts count live matches ONLY.
    A day-3 doc whose head exists solely among retracted docs is a
    'keep': at the exact tier an identical fingerprint is an
    unconditional drop, so a stale set doesn't just bias a similarity
    score — it permanently embargoes exact mirrors of deleted content
    (1 such compliance flip at sf0.01, pinned non-vacuous by
    tests/test_round10.py AT sf0.01 — head collisions are too sparse
    at sf0.001 for the flip to exist there; the hash oracle pins the
    counts at every SF regardless).

    Scale shape: the maintained set is DISTINCT fingerprints (bucketed
    on the hash at 100 TB, per d_incremental_dedup's docstring); the
    retraction is an anti-join of the set against the retracted docs'
    fingerprints — with the nuance the per-class census here makes
    hash-visible: a fingerprint shared by a retracted AND a retained
    doc must STAY in the set (delete-by-refcount / re-derive from live
    docs, not blind key delete). The probe is one hash equi-join +
    conditional distinct counts in a single aggregation; only the
    day's batch shuffles against the bucketed set.
    """
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.dedup import head_fingerprint

    head_fp = head_fingerprint()
    mod = F.col("doc_id") % 10
    d3 = docs.filter(mod == 8).select("doc_id", head_fp.alias("h"))
    state = docs.filter(mod != 8).select(
        F.col("doc_id").alias("partner_id"), head_fp.alias("h")
    )
    pm = F.col("partner_id") % 10
    probed = (
        d3.join(state, "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct(
                F.when(~pm.isin(5, 7), F.col("partner_id"))
            ).alias("n_retained_matches"),
            F.countDistinct(F.when(pm == 7, F.col("partner_id"))).alias(
                "n_day2_matches"
            ),
            F.countDistinct(F.when(pm == 5, F.col("partner_id"))).alias(
                "n_retracted_matches"
            ),
        )
    )
    nr = F.coalesce("n_retained_matches", F.lit(0)).cast("long")
    nd = F.coalesce("n_day2_matches", F.lit(0)).cast("long")
    nx = F.coalesce("n_retracted_matches", F.lit(0)).cast("long")
    return (
        docs.filter(mod == 8)
        .select("doc_id")
        .join(probed, "doc_id", "left")
        .select(
            "doc_id",
            nr.alias("n_retained_matches"),
            nd.alias("n_day2_matches"),
            nx.alias("n_retracted_matches"),
            F.when(nr + nd > 0, F.lit("drop"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
        .orderBy("doc_id")
    )
