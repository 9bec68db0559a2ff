"""Round-6 continuation, batch 7: LSH band-config sweep, train/test
leakage audit, CUPED-adjusted experiment readout, and earth-mover
drift.

Four more first-class operators (north-star extensions — the reference
repo has no dedup-tuning/experimentation analytics):

- ``d_minhash_band_sweep``: recall AND precision of every (bands x
  rows-per-band) LSH configuration against exact-Jaccard ground truth
  in one query — band width is THE LSH scale dial (SCALING.md), and
  this measures the dial instead of guessing it.
- ``b_holdout_leakage_check``: near-duplicate leakage across a
  deterministic train/test split — test documents with a >=0.5-Jaccard
  twin in train score as leaked (the split-decontamination audit every
  eval pipeline needs; Lee et al.'s dedup papers report exactly this
  failure).
- ``b_cuped_adjusted_ab``: CUPED variance reduction for the
  hash-assigned experiment — pre-period activity as the covariate,
  theta = cov(X,Y)/var(X), and the variance-reduction readout that
  tells you how much faster the experiment concludes.
- ``a_emd_drift``: 1-D earth-mover (Wasserstein-1) distance per event
  type between the baseline and current value distributions — the
  magnitude-aware companion to a_ks_drift (KS saturates at "they
  differ"; EMD says by HOW MUCH, in value units).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from ..sources.tables import load_table
from .catalog import query
from .llmdata import N_MINHASH, _DUCK_SHINGLES

# --------------------------------------------------------------------------
# shared corpus augmentation: exact + truncated near-dup copies
# --------------------------------------------------------------------------

# Injected near-dups make the dedup-quality reports non-trivial at every
# SF (the d_exact_dedup convention): docs < 50 get an EXACT copy at
# id+1_000_000 and a TRUNCATED copy (first ~70% of words, Jaccard in
# the 0.5-0.8 band against the original) at id+2_000_000 — so the sweep
# sees both easy and marginal pairs, and the split audit always has
# leakage to find.

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


# --------------------------------------------------------------------------
# d_minhash_band_sweep
# --------------------------------------------------------------------------

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
    columns); each config adds one bucket self-join bounded by its own
    collision rate; ground truth reuses the d_ngram_jaccard_pairs
    shingle-join (doc-frequency cap disabled to match the oracle —
    production keeps it); the report is 3 rows of counts. The truth
    join keys hit the SAME (id_a, id_b) space so AQE handles any hot
    bucket.
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
    outs = []
    for bands, rows in _SWEEP_CONFIGS:
        cand = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows)
        stats = cand.join(truth, ["id_a", "id_b"], "left_semi").agg(
            F.count("*").alias("n_hits")
        )
        outs.append(
            cand.agg(F.count("*").alias("n_candidates"))
            .crossJoin(F.broadcast(stats))
            .select(
                F.lit(bands).cast("int").alias("bands"),
                F.lit(rows).cast("int").alias("rows_per_band"),
                F.col("n_candidates").cast("long"),
                F.lit(n_true).cast("long").alias("n_true_pairs"),
                F.col("n_hits").cast("long"),
                F.round(
                    F.col("n_hits")
                    * 1.0
                    / F.nullif(F.lit(n_true).cast("long"), F.lit(0).cast("long")),
                    4,
                ).alias("recall"),
                F.round(
                    F.col("n_hits")
                    * 1.0
                    / F.nullif(
                        F.col("n_candidates").cast("long"),
                        F.lit(0).cast("long"),
                    ),
                    4,
                ).alias("lsh_precision"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("bands")


# --------------------------------------------------------------------------
# b_holdout_leakage_check
# --------------------------------------------------------------------------

_LEAK_TRAIN_NIBBLES = 12  # nibble < 12 -> train (75%), else test


@query(
    "b_holdout_leakage_check",
    oracle=f"""
    WITH {_AUG_SQL.strip()},
    {_AUG_SHINGLES.strip()},
    split AS (
      SELECT doc_id, source,
             CASE WHEN instr('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                       < {_LEAK_TRAIN_NIBBLES}
                  THEN 'train' ELSE 'test' END AS part
      FROM aug
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    nd AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN counts ca ON ca.doc_id = i.id_a
      JOIN counts cb ON cb.doc_id = i.id_b
      WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) > 0.5
    ),
    leaked AS (
      SELECT DISTINCT t.doc_id
      FROM nd
      JOIN split a ON a.doc_id = nd.id_a
      JOIN split b ON b.doc_id = nd.id_b
      JOIN split t ON t.doc_id = CASE WHEN a.part = 'test'
                                      THEN nd.id_a ELSE nd.id_b END
      WHERE a.part <> b.part
    )
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_test_docs,
           CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked,
           round(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS leak_rate
    FROM split s LEFT JOIN leaked l ON l.doc_id = s.doc_id
    WHERE s.part = 'test'
    GROUP BY s.source
    ORDER BY s.source
    """,
)
def b_holdout_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test near-duplicate leakage audit: documents split
    deterministically by md5(doc_id) nibble (75/25 — the b_hash_sample
    discipline, so the split survives reruns and engine swaps), then
    every test document with a >0.5-Jaccard twin in train counts as
    LEAKED, reported per source. This is the split-decontamination
    check an eval pipeline runs before trusting held-out metrics — the
    same shape as t_contamination_check but against one's own split
    instead of an external benchmark.

    Scale shape: the near-dup pair frame comes from the SAME bounded
    shingle-join machinery as d_ngram_jaccard_pairs (doc-frequency cap
    disabled only for oracle parity; production keeps it, or feeds LSH
    candidates instead of all shingle-sharing pairs). Split membership
    is a pure hash-column expression — no shuffle to assign; the
    cross-split filter drops same-side pairs before the per-source
    aggregate, and the leaked-doc set is distinct doc-ids (node-sized,
    never pair-sized).
    """
    corpus = _augmented_corpus(spark, sf_dir)
    nib = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    split = corpus.select(
        "doc_id",
        "source",
        F.when(nib < _LEAK_TRAIN_NIBBLES, "train").otherwise("test").alias(
            "part"
        ),
    )
    nd = jaccard_pairs(
        word_shingles(corpus, distinct=True), min_jaccard=0.5, max_doc_freq=None
    ).select("id_a", "id_b")
    pa = split.select(
        F.col("doc_id").alias("id_a"), F.col("part").alias("part_a")
    )
    pb = split.select(
        F.col("doc_id").alias("id_b"), F.col("part").alias("part_b")
    )
    cross = (
        nd.join(pa, "id_a")
        .join(pb, "id_b")
        .filter(F.col("part_a") != F.col("part_b"))
    )
    leaked = (
        cross.select(
            F.when(F.col("part_a") == "test", F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("doc_id")
        )
        .distinct()
        .withColumn("leak", F.lit(1))
    )
    test = split.filter(F.col("part") == "test")
    return (
        test.join(leaked, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_test_docs"),
            F.sum(F.coalesce("leak", F.lit(0))).cast("long").alias("n_leaked"),
        )
        .select(
            "source",
            "n_test_docs",
            "n_leaked",
            F.round(
                F.col("n_leaked") * 1.0 / F.col("n_test_docs"), 4
            ).alias("leak_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# b_cuped_adjusted_ab
# --------------------------------------------------------------------------


@query(
    "b_cuped_adjusted_ab",
    oracle="""
    WITH bounds AS (
      SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
              + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS mid
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             CASE WHEN instr('0123456789abcdef',
                             substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 < 8
                  THEN 'A' ELSE 'B' END AS variant,
             sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) <= b.mid
                      THEN 1 ELSE 0 END) AS x,
             sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) > b.mid
                           AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS y
      FROM events, bounds b GROUP BY user_id
    ),
    mom AS (
      SELECT count(*) AS n,
             avg(x * 1.0) AS mx, avg(y * 1.0) AS my,
             avg(x * 1.0 * x) AS mxx, avg(x * 1.0 * y) AS mxy,
             avg(y * 1.0 * y) AS myy
      FROM per_user
    ),
    th AS (
      SELECT n, mx, my, myy,
             (mxy - mx * my) / NULLIF(mxx - mx * mx, 0) AS theta,
             (mxy - mx * my) AS cxy,
             (mxx - mx * mx) AS vx,
             (myy - my * my) AS vy
      FROM mom
    ),
    adj AS (
      SELECT p.variant,
             count(*) AS n_arm,
             avg(p.y * 1.0) AS mean_y,
             avg(p.y - t.theta * (p.x - t.mx)) AS mean_y_adj
      FROM per_user p, th t GROUP BY p.variant, t.theta, t.mx
    )
    SELECT round(t.theta, 4) AS theta,
           round(1 - (t.vy - t.cxy * t.cxy / NULLIF(t.vx, 0))
                     / NULLIF(t.vy, 0), 4) AS var_reduction,
           CAST(a.n_arm AS BIGINT) AS n_a, round(a.mean_y, 4) AS mean_y_a,
           round(a.mean_y_adj, 4) AS mean_y_adj_a,
           CAST(b.n_arm AS BIGINT) AS n_b, round(b.mean_y, 4) AS mean_y_b,
           round(b.mean_y_adj, 4) AS mean_y_adj_b
    FROM th t,
         (SELECT * FROM adj WHERE variant = 'A') a,
         (SELECT * FROM adj WHERE variant = 'B') b
    """,
)
def b_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout: pre-period activity (event
    count up to the stream's midpoint second) is the covariate X for
    the post-period purchase count Y; theta = cov(X,Y)/var(X) over ALL
    users (arm-agnostic, as CUPED requires), each user's Y is adjusted
    to Y - theta (X - mean X), and the one-row report carries per-arm
    raw vs adjusted means plus the variance-reduction factor rho^2 =
    1 - var(Y_adj)/var(Y) — the number that says how much sooner the
    experiment concludes. Arms are the md5-nibble assignment of
    b_ab_experiment_report.

    Scale shape: one user-keyed shuffle builds (X, Y) per user; the
    moment frame (n, means, cross-moments) is ONE map-side-combined
    aggregate; theta and the adjustment broadcast back as 1-row
    scalars; the per-arm fold is a 2-row aggregate. The midpoint is a
    1-row min/max aggregate broadcast — whole-second math on both
    engines (unix_timestamp truncation = floor(epoch)). Population
    moments throughout; NULLIF guards a constant covariate.
    """
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.floor(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        )
        .cast("long")
        .alias("mid")
    )
    nib = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    sec = F.unix_timestamp("ts")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(sec <= F.col("mid"), 1).otherwise(0)).alias("x"),
            F.sum(
                F.when(
                    (sec > F.col("mid"))
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
        .withColumn("variant", F.when(nib < 8, "A").otherwise("B"))
    )
    mom = per_user.agg(
        F.count("*").alias("n"),
        F.avg(F.col("x") * 1.0).alias("mx"),
        F.avg(F.col("y") * 1.0).alias("my"),
        F.avg(F.col("x") * 1.0 * F.col("x")).alias("mxx"),
        F.avg(F.col("x") * 1.0 * F.col("y")).alias("mxy"),
        F.avg(F.col("y") * 1.0 * F.col("y")).alias("myy"),
    ).select(
        "*",
        ((F.col("mxy") - F.col("mx") * F.col("my"))
         / F.nullif(F.col("mxx") - F.col("mx") * F.col("mx"), F.lit(0.0))
         ).alias("theta"),
        (F.col("mxy") - F.col("mx") * F.col("my")).alias("cxy"),
        (F.col("mxx") - F.col("mx") * F.col("mx")).alias("vx"),
        (F.col("myy") - F.col("my") * F.col("my")).alias("vy"),
    )
    adj = (
        per_user.crossJoin(F.broadcast(mom.select("theta", "mx")))
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_arm"),
            F.avg(F.col("y") * 1.0).alias("mean_y"),
            F.avg(
                F.col("y") - F.col("theta") * (F.col("x") - F.col("mx"))
            ).alias("mean_y_adj"),
        )
    )
    arm_a = adj.filter(F.col("variant") == "A").select(
        F.col("n_arm").alias("na"),
        F.col("mean_y").alias("mya"),
        F.col("mean_y_adj").alias("myadja"),
    )
    arm_b = adj.filter(F.col("variant") == "B").select(
        F.col("n_arm").alias("nb"),
        F.col("mean_y").alias("myb"),
        F.col("mean_y_adj").alias("myadjb"),
    )
    return (
        mom.crossJoin(F.broadcast(arm_a))
        .crossJoin(F.broadcast(arm_b))
        .select(
            F.round("theta", 4).alias("theta"),
            F.round(
                1
                - (
                    F.col("vy")
                    - F.col("cxy") * F.col("cxy") / F.nullif("vx", F.lit(0.0))
                )
                / F.nullif("vy", F.lit(0.0)),
                4,
            ).alias("var_reduction"),
            F.col("na").cast("long").alias("n_a"),
            F.round("mya", 4).alias("mean_y_a"),
            F.round("myadja", 4).alias("mean_y_adj_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.round("myb", 4).alias("mean_y_b"),
            F.round("myadjb", 4).alias("mean_y_adj_b"),
        )
    )


# --------------------------------------------------------------------------
# a_emd_drift
# --------------------------------------------------------------------------


@query(
    "a_emd_drift",
    oracle="""
    WITH tagged AS (
      SELECT event_type, round(value, 2) AS v,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    per_v AS (
      SELECT event_type, v,
             sum(is_base) AS nb, sum(1 - is_base) AS nc
      FROM tagged GROUP BY event_type, v
    ),
    tot AS (
      SELECT event_type, sum(nb) AS tb, sum(nc) AS tc
      FROM per_v GROUP BY event_type
    ),
    ecdf AS (
      SELECT p.event_type, p.v,
             sum(p.nb) OVER (PARTITION BY p.event_type ORDER BY p.v)
               * 1.0 / t.tb AS fb,
             sum(p.nc) OVER (PARTITION BY p.event_type ORDER BY p.v)
               * 1.0 / t.tc AS fc,
             lead(p.v) OVER (PARTITION BY p.event_type ORDER BY p.v) AS v_next
      FROM per_v p JOIN tot t ON t.event_type = p.event_type
    )
    SELECT event_type,
           round(sum(abs(fb - fc) * (v_next - v)), 4) AS emd
    FROM ecdf WHERE v_next IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def a_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D earth-mover (Wasserstein-1) drift per event type: the
    integral of |ECDF_base - ECDF_current| over the value axis, between
    the pre-2024-01-15 baseline and the current period (the a_ks_drift
    split). KS reports the worst POINT gap and saturates once
    distributions differ; EMD reports the total transport cost in
    value units — the magnitude-aware drift monitor that ranks which
    metric moved the most.

    Scale shape: identical to a_ks_drift — events pre-aggregate to
    (type, cents-value) counts map-side; the ECDF and the step-width
    lead() share one window over the bounded distinct-value frame; the
    integral is a final per-type fold. Values round to cents first so
    the ECDF support is identical on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    tagged = ev.select(
        "event_type",
        F.round("value", 2).alias("v"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("is_base"),
    )
    per_v = tagged.groupBy("event_type", "v").agg(
        F.sum("is_base").alias("nb"),
        F.sum(1 - F.col("is_base")).alias("nc"),
    )
    tot = per_v.groupBy("event_type").agg(
        F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
    )
    w = W.partitionBy("event_type").orderBy("v")
    ecdf = (
        per_v.join(tot, "event_type")
        .select(
            "event_type",
            "v",
            (F.sum("nb").over(w) * 1.0 / F.col("tb")).alias("fb"),
            (F.sum("nc").over(w) * 1.0 / F.col("tc")).alias("fc"),
            F.lead("v").over(w).alias("v_next"),
        )
    )
    return (
        ecdf.filter(F.col("v_next").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("fb") - F.col("fc"))
                    * (F.col("v_next") - F.col("v"))
                ),
                4,
            ).alias("emd")
        )
        .orderBy("event_type")
    )
