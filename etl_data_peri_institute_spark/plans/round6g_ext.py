"""Round-6 continuation, batch 6: embedding truncation (Matryoshka)
quality, distributed PCA power iteration, feed freshness, and A/B power
analysis.

Four more first-class operators (north-star extensions — the reference
repo has no embedding/experiment analytics):

- ``e_matryoshka_truncation_report``: how much cosine geometry survives
  truncating embeddings to a prefix of their dimensions (the
  Matryoshka-representation question "can we serve 16 of the 64
  dims?"). For prefix-vs-full cosine the closed form is the norm ratio
  ||v[:d]|| / ||v||, so the whole report is one conditional-sum
  aggregate — no pairs, no joins.
- ``e_pca_power_iteration``: dominant principal component of the
  embedding table by explicit covariance build + 2 deterministic power
  iterations — the iterative-linear-algebra shape on Spark (matvec =
  broadcast join + groupBy; normalization = 1-row aggregate broadcast).
- ``p_freshness_report``: per-feed last-arrival lag vs the newest data
  anywhere + staleness flag — the operational freshness twin of
  p_volume_anomaly.
- ``b_power_analysis``: two-proportion sample-size planning from the
  OBSERVED control rate of the hash-assigned experiment
  (b_ab_experiment_report's assignment), for a +10% relative lift at
  alpha=0.05 / power=0.8 — answers "can this experiment ever conclude
  at current traffic?".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from .catalog import query
from .round6e_ext import _AB_PER_USER_CTES, _CONV_MIN_PURCHASES

# --------------------------------------------------------------------------
# e_matryoshka_truncation_report
# --------------------------------------------------------------------------

_MRL_PREFIXES = (8, 16, 32)


def _mrl_oracle() -> str:
    selects = []
    for d in _MRL_PREFIXES:
        selects.append(
            f"""
    SELECT CAST({d} AS INT) AS dim_prefix,
           round(avg(cos), 4) AS avg_cos,
           round(min(cos), 4) AS min_cos,
           round(avg(energy), 4) AS avg_energy_ratio
    FROM (
      SELECT sqrt(sum(CASE WHEN i <= {d} THEN val * val ELSE 0 END)
                  / sum(val * val)) AS cos,
             sum(CASE WHEN i <= {d} THEN val * val ELSE 0 END)
               / sum(val * val) AS energy
      FROM (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
      )
      GROUP BY vec_id
    )"""
        )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY dim_prefix"
    )


@query("e_matryoshka_truncation_report", oracle=_mrl_oracle())
def e_matryoshka_truncation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation quality: for each candidate prefix length
    d in {8, 16, 32}, the cosine similarity between every vector and
    its d-dim truncation (zero-padded) and the retained-energy share.
    Prefix-vs-full cosine has the closed form ||v[:d]|| / ||v|| — no
    pair enumeration — so this is the cheap pre-flight for "serve a
    16-dim index, re-rank with the full vectors" (the IVF/PQ coarse
    stage sizing question).

    Scale shape: one position explode, one per-vector conditional-sum
    aggregate (map-side combinable on vec_id since vectors arrive
    whole), then a 3-row prefix report — per-vector cost O(dims),
    corpus cost one scan, no joins. Doubles round to 4 after the final
    fold (the standing absorb-in-round discipline).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("i"),
        F.col("valf").cast("double").alias("val"),
    )
    sq = F.col("val") * F.col("val")
    per_vec = pos.groupBy("vec_id").agg(
        F.sum(sq).alias("tot"),
        *[
            F.sum(F.when(F.col("i") <= d, sq).otherwise(0.0)).alias(f"p{d}")
            for d in _MRL_PREFIXES
        ],
    )
    outs = []
    for d in _MRL_PREFIXES:
        cos = F.sqrt(F.col(f"p{d}") / F.col("tot"))
        energy = F.col(f"p{d}") / F.col("tot")
        outs.append(
            per_vec.agg(
                F.lit(d).cast("int").alias("dim_prefix"),
                F.round(F.avg(cos), 4).alias("avg_cos"),
                F.round(F.min(cos), 4).alias("min_cos"),
                F.round(F.avg(energy), 4).alias("avg_energy_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("dim_prefix")


# --------------------------------------------------------------------------
# e_pca_power_iteration
# --------------------------------------------------------------------------

_PCA_ITERS = 2

_PCA_MATVEC = """
    mv{i} AS (
      SELECT c.i, round(sum(c.cv * v.v), 6) AS mv
      FROM cov c JOIN v{j} v ON v.i = c.j
      GROUP BY c.i
    ),
    n{i} AS (SELECT sqrt(sum(mv * mv)) AS nrm FROM mv{i}),
    v{i} AS (
      SELECT mv{i}.i, round(mv / NULLIF(nrm, 0), 6) AS v
      FROM mv{i}, n{i}
    )"""


def _pca_oracle() -> str:
    parts = [
        """
    WITH pos AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    mu AS (SELECT i, round(avg(val), 6) AS mu FROM pos GROUP BY i),
    cen AS (
      SELECT p.vec_id, p.i, p.val - m.mu AS c
      FROM pos p JOIN mu m ON m.i = p.i
    ),
    cov AS (
      SELECT a.i, b.i AS j,
             round(sum(a.c * b.c)
                   / (SELECT count(*) FROM embeddings), 6) AS cv
      FROM cen a JOIN cen b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ),
    v0 AS (SELECT i, 1.0 AS v FROM mu)"""
    ]
    for it in range(1, _PCA_ITERS + 1):
        parts.append("," + _PCA_MATVEC.format(i=it, j=it - 1))
    last = _PCA_ITERS
    parts.append(
        f"""
    SELECT v.i AS dim, round(v.v, 4) AS loading,
           (SELECT round(nrm, 4) FROM n{last}) AS eigenvalue_est
    FROM v{last} v
    ORDER BY dim
    """
    )
    return "".join(parts)


@query("e_pca_power_iteration", oracle=_pca_oracle())
def e_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding table: explicit
    covariance build (position self-join keyed on vec_id, population
    normalization) followed by {2} deterministic power iterations from
    the all-ones vector (normalized after each matvec) — reporting
    per-dimension loadings and the
    eigenvalue estimate ||A v|| after the final matvec (for a
    unit-normalized v, the power-iteration eigenvalue proxy). The
    iterative-linear-algebra shape on Spark: matvec = broadcast join +
    map-side-combined groupBy; normalization = a 1-row aggregate
    broadcast (the q11 global-threshold pattern).

    Scale shape: the covariance build is the only data-sized work —
    n x d^2 products partial-aggregate into a d^2-row frame (4096
    groups for d=64) before the exchange; every later frame is d- or
    d^2-sized. Per-entry rounding to 6 after each reduction keeps both
    engines iterating identical matrices (the e_kmeans_fit
    discipline); loadings round to 4 at the end. A d too large for a
    materialized d^2 covariance (d >~ 4k) would switch to
    Gram-accumulated matvecs without building A, same join shape.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("i"),
        F.col("valf").cast("double").alias("val"),
    )
    d = len(emb.select("embedding").first()[0])
    n = emb.count()
    mu = pos.groupBy("i").agg(F.round(F.avg("val"), 6).alias("mu"))
    cen = (
        pos.join(F.broadcast(mu), "i")
        .select("vec_id", "i", (F.col("val") - F.col("mu")).alias("c"))
    )
    a, b = cen.alias("a"), cen.alias("b")
    cov = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.round(F.sum(F.col("a.c") * F.col("b.c")) / n, 6).alias("cv"))
    )
    # d^2-row frame feeding every iteration: truncate lineage once.
    cov = cov.localCheckpoint(eager=True)
    # UNNORMALIZED all-ones init (not 1/sqrt(d)): for d a power of two,
    # 1/sqrt(d) is exactly dyadic, so matvec sums land on quarter-grid
    # points of the round-6 lattice — 1/8 of them EXACTLY on rounding
    # half-boundaries, where cross-engine summation order decides the
    # flip. With ones, the first matvec sums 1e-6-grid multiples
    # (boundary distance 5e-7 >> fp drift) and the first normalization
    # produces generic grid values; later products live on the 1e-12
    # grid. The first round's direction is identical either way.
    v = mu.select("i", F.lit(1.0).alias("v"))
    nrm_val = None
    for _ in range(_PCA_ITERS):
        mv = (
            cov.join(F.broadcast(v), cov["j"] == v["i"])
            .groupBy(cov["i"].alias("mi"))
            .agg(F.round(F.sum(F.col("cv") * F.col("v")), 6).alias("mv"))
            .withColumnRenamed("mi", "i")
        )
        nrm = mv.agg(F.sqrt(F.sum(F.col("mv") * F.col("mv"))).alias("nrm"))
        v = (
            mv.crossJoin(F.broadcast(nrm))
            .select(
                "i",
                F.round(
                    F.col("mv") / F.nullif("nrm", F.lit(0.0)), 6
                ).alias("v"),
            )
        )
        nrm_val = nrm
    return (
        v.crossJoin(F.broadcast(nrm_val))
        .select(
            F.col("i").alias("dim"),
            F.round("v", 4).alias("loading"),
            F.round("nrm", 4).alias("eigenvalue_est"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# p_freshness_report
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# b_power_analysis
# --------------------------------------------------------------------------

_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
_Z_BETA = 0.841621  # power = 0.8
_MDE_REL = 0.10  # +10% relative lift


@query(
    "b_power_analysis",
    oracle=f"""
    WITH {_AB_PER_USER_CTES},
    base AS (
      SELECT count(*) AS n_a, sum(conv) AS c_a,
             (SELECT count(*) FROM per_user WHERE variant = 'B') AS n_b
      FROM per_user WHERE variant = 'A'
    ),
    rates AS (
      SELECT n_a, n_b, c_a * 1.0 / NULLIF(n_a, 0) AS p1,
             least(c_a * 1.0 / NULLIF(n_a, 0) * (1 + {_MDE_REL}), 1.0) AS p2
      FROM base
    )
    SELECT round(p1, 4) AS p_base, round(p2, 4) AS p_target,
           CAST(ceil(
             power({_Z_ALPHA} * sqrt(2 * ((p1 + p2) / 2) * (1 - (p1 + p2) / 2))
                   + {_Z_BETA} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
             / NULLIF(power(p2 - p1, 2), 0)) AS BIGINT) AS n_required_per_arm,
           CAST(least(n_a, n_b) AS BIGINT) AS n_available_per_arm,
           CAST(CASE WHEN least(n_a, n_b) >= ceil(
             power({_Z_ALPHA} * sqrt(2 * ((p1 + p2) / 2) * (1 - (p1 + p2) / 2))
                   + {_Z_BETA} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
             / NULLIF(power(p2 - p1, 2), 0)) THEN 1 ELSE 0 END AS INT)
             AS powered_now
    FROM rates
    """,
)
def b_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion sample-size planning from the OBSERVED control
    conversion rate of the hash-assigned experiment
    (b_ab_experiment_report's md5 assignment): the required per-arm n
    to detect a +10% relative lift at two-sided alpha 0.05 with power
    0.8 (the standard pooled/unpooled z formula), against the per-arm n
    actually available — "can this experiment conclude at current
    traffic?". Degenerate control rates (0, or target clamped at 1)
    yield NULL required-n via NULLIF rather than a division error.

    Scale shape: identical to the readout query — one user-keyed
    shuffle for per-user conversion, then scalar closed-form
    arithmetic on a 1-row frame. The z constants are literals on both
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    nib = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= _CONV_MIN_PURCHASES
            )
            .cast("int")
            .alias("conv")
        )
        .withColumn("variant", F.when(nib < 8, "A").otherwise("B"))
    )
    base = per_user.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    p1 = F.col("c_a") * 1.0 / F.nullif(F.col("n_a"), F.lit(0).cast("long"))
    p2 = F.least(p1 * (1 + _MDE_REL), F.lit(1.0))
    pbar = (p1 + p2) / 2
    n_req = F.ceil(
        F.pow(
            _Z_ALPHA * F.sqrt(2 * pbar * (1 - pbar))
            + _Z_BETA * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)),
            2,
        )
        / F.nullif(F.pow(p2 - p1, 2), F.lit(0.0))
    )
    avail = F.least("n_a", "n_b")
    return base.select(
        F.round(p1, 4).alias("p_base"),
        F.round(p2, 4).alias("p_target"),
        n_req.cast("long").alias("n_required_per_arm"),
        avail.cast("long").alias("n_available_per_arm"),
        # when(...).otherwise(0) (not a bare cast) so a NULL required-n
        # (degenerate rates) reads 0 on both engines, matching the SQL
        # CASE's ELSE branch.
        F.when(avail >= n_req, 1).otherwise(0).cast("int").alias("powered_now"),
    )
