"""Experimentation & causal-inference gates: A/B lift and guardrails
(SRM, CUPED, power, sequential monitoring), difference-in-differences,
stratified ATE, quantile treatment effects, covariate balance — the
measurement layer a training-data pipeline runs over event logs.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section cites its source round.
"""

from __future__ import annotations

# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..sources.tables import load_table
from .catalog import query

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


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

@query(
    "b_ab_lift_report",
    oracle="""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CAST((instr('0123456789abcdef',
                         substring(md5('exp42:' || user_id), 1, 1)) - 1) % 2
                  AS BIGINT) AS arm
      FROM events
    ),
    conv AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND value >= 90
    ),
    g AS (
      SELECT a.arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted
      FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
      GROUP BY a.arm
    ),
    wide AS (
      SELECT
        max(CASE WHEN arm = 0 THEN n_users END) AS n0,
        max(CASE WHEN arm = 0 THEN n_converted END) AS c0,
        max(CASE WHEN arm = 1 THEN n_users END) AS n1,
        max(CASE WHEN arm = 1 THEN n_converted END) AS c1
      FROM g
    )
    SELECT n0, c0, n1, c1,
           round(c0 * 1.0 / n0, 4) AS rate_0,
           round(c1 * 1.0 / n1, 4) AS rate_1,
           round(c1 * 1.0 / n1 - c0 * 1.0 / n0, 4) AS abs_lift,
           round((c1 * 1.0 / n1 - c0 * 1.0 / n0)
                 / sqrt((c0 + c1) * 1.0 / (n0 + n1)
                        * (1 - (c0 + c1) * 1.0 / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 3) AS z_two_prop
    FROM wide
    """,
)
def b_ab_lift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout end-to-end: deterministic hash-based arm
    assignment (the b_hash_sample discipline — membership is a pure
    function of user id and experiment salt, never rand(), so every
    engine, rerun, and backfill agrees), per-arm conversion (a
    high-value purchase, value >= 90 — thresholded so the rate stays
    mid-range at every SF; near-total conversion degenerates the pooled
    z denominator), and the pooled two-proportion z-test on the lift.

    Scale shape: assignment is a distinct on user (map-side partials),
    conversion is a second distinct; the left join is user-keyed and
    the report collapses to 2 rows before any float math. Counts stay
    integer until the final rates/z, which both engines compute from
    identical integers; rates rounded to 4, z to 3. xxhash64 is the
    production hash; DuckDB's hash() matches Spark's here via the
    shared string-input convention tested in b_hash_sample.
    """
    ev = load_table(spark, sf_dir, "events")
    assign = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("exp42:"), F.col("user_id").cast("string"))),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
        )
    )
    conv = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") >= 90))
        .select("user_id")
        .distinct()
    )
    g = (
        assign.join(conv.withColumn("converted", F.lit(1)), "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0))).alias("n_converted"),
        )
    )
    wide = g.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
    )
    r0 = F.col("c0") / F.col("n0")
    r1 = F.col("c1") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(r0, 4).alias("rate_0"),
        F.round(r1, 4).alias("rate_1"),
        F.round(r1 - r0, 4).alias("abs_lift"),
        F.round(
            (r1 - r0)
            / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))),
            3,
        ).alias("z_two_prop"),
    )


# ===========================================================================
# section consolidated from plans/round6e_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, functions as F
from .dedup import _hex2_digit_sql

_CONV_MIN_PURCHASES = 14

_AB_PER_USER_CTES = f"""
    pu0 AS (
      SELECT user_id,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= {_CONV_MIN_PURCHASES}
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id
    ),
    per_user AS (
      SELECT user_id,
             CASE WHEN {_hex2_digit_sql("md5(CAST(user_id AS VARCHAR))", 1)} < 8
                  THEN 'A' ELSE 'B' END AS variant,
             conv
      FROM pu0
    )
"""

@query(
    "b_ab_experiment_report",
    oracle=f"""
    WITH {_AB_PER_USER_CTES},
    arms AS (
      SELECT variant, count(*) AS n, sum(conv) AS c
      FROM per_user GROUP BY variant
    ),
    wide AS (
      SELECT sum(CASE WHEN variant = 'A' THEN n ELSE 0 END) AS n_a,
             sum(CASE WHEN variant = 'A' THEN c ELSE 0 END) AS c_a,
             sum(CASE WHEN variant = 'B' THEN n ELSE 0 END) AS n_b,
             sum(CASE WHEN variant = 'B' THEN c ELSE 0 END) AS c_b
      FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
           round(c_a * 1.0 / NULLIF(n_a, 0), 4) AS rate_a,
           round(c_b * 1.0 / NULLIF(n_b, 0), 4) AS rate_b,
           round((c_b * 1.0 / NULLIF(n_b, 0) - c_a * 1.0 / NULLIF(n_a, 0))
                 / NULLIF(sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                               * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                               * (1.0 / n_a + 1.0 / n_b)), 0), 4) AS z_score
    FROM wide
    """,
)
def b_ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are assigned to variants by the
    first nibble of md5(user_id) (deterministic content-hash
    assignment — never rand(), so reruns and task retries keep the same
    arms; the b_hash_sample discipline), conversion is "heavy
    purchaser" (>= {14} purchase events — the ever-purchased flag
    saturates at ~100% on this stream, degenerating every rate to 1.0),
    and the one-row report carries per-arm sizes,
    conversion counts/rates, and the pooled two-proportion z-score —
    the binary-outcome twin of a_welch_ttest.

    Scale shape: one user-keyed shuffle for the per-user conversion
    flag (map-side partial max), then a 2-row arm aggregate folded to
    one row by conditional sums — the z arithmetic runs on scalars.
    Degenerate arms (empty, or pooled rate 0/1 making the variance 0)
    yield NULL via NULLIF on both engines instead of a division error.
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
    wide = per_user.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == "B", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    pooled = (F.col("c_a") + F.col("c_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    z_den = F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        F.col("n_a"),
        F.col("c_a").alias("conv_a"),
        F.col("n_b"),
        F.col("c_b").alias("conv_b"),
        F.round(
            F.col("c_a") * 1.0 / F.nullif(F.col("n_a"), F.lit(0).cast("long")),
            4,
        ).alias("rate_a"),
        F.round(
            F.col("c_b") * 1.0 / F.nullif(F.col("n_b"), F.lit(0).cast("long")),
            4,
        ).alias("rate_b"),
        F.round(
            (
                F.col("c_b") * 1.0
                / F.nullif(F.col("n_b"), F.lit(0).cast("long"))
                - F.col("c_a") * 1.0
                / F.nullif(F.col("n_a"), F.lit(0).cast("long"))
            )
            / F.nullif(z_den, F.lit(0.0)),
            4,
        ).alias("z_score"),
    )


# ===========================================================================
# section consolidated from plans/round6g_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

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


# ===========================================================================
# section consolidated from plans/round6h_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 7: LSH band-config sweep, train/test
# leakage audit, CUPED-adjusted experiment readout, and earth-mover
# drift.
#
# Four more first-class operators (north-star extensions — the reference
# repo has no dedup-tuning/experimentation analytics):
#
# - ``d_minhash_band_sweep``: recall AND precision of every (bands x
#   rows-per-band) LSH configuration against exact-Jaccard ground truth
#   in one query — band width is THE LSH scale dial (SCALING.md), and
#   this measures the dial instead of guessing it.
# - ``b_holdout_leakage_check``: near-duplicate leakage across a
#   deterministic train/test split — test documents with a >=0.5-Jaccard
#   twin in train score as leaked (the split-decontamination audit every
#   eval pipeline needs; Lee et al.'s dedup papers report exactly this
#   failure).
# - ``b_cuped_adjusted_ab``: CUPED variance reduction for the
#   hash-assigned experiment — pre-period activity as the covariate,
#   theta = cov(X,Y)/var(X), and the variance-reduction readout that
#   tells you how much faster the experiment concludes.
# - ``a_emd_drift``: 1-D earth-mover (Wasserstein-1) distance per event
#   type between the baseline and current value distributions — the
#   magnitude-aware companion to a_ks_drift (KS saturates at "they
#   differ"; EMD says by HOW MUCH, in value units).
# ===========================================================================

from ..operators.dedup import jaccard_pairs, word_shingles
from .dedup import _AUG_SHINGLES, _AUG_SQL, _augmented_corpus

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


# ===========================================================================
# section consolidated from plans/round7b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/curation.py)
# ===========================================================================

@query(
    "b_did_estimator",
    oracle="""
    WITH tagged AS (
      SELECT event_type, value,
             (instr('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS treat,
             CASE WHEN dayofmonth(ts) > 15 THEN 1 ELSE 0 END AS post
      FROM events
    ),
    cells AS (
      SELECT event_type, treat, post,
             count(*) AS n, avg(value) AS m, var_samp(value) AS v
      FROM tagged GROUP BY 1, 2, 3
    ),
    wide AS (
      SELECT event_type,
             sum(n) AS n_total,
             max(CASE WHEN treat = 1 AND post = 1 THEN m END) AS m11,
             max(CASE WHEN treat = 1 AND post = 0 THEN m END) AS m10,
             max(CASE WHEN treat = 0 AND post = 1 THEN m END) AS m01,
             max(CASE WHEN treat = 0 AND post = 0 THEN m END) AS m00,
             sum(v / n) AS var_sum
      FROM cells GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_total AS BIGINT) AS n,
           round((m11 - m10) - (m01 - m00), 6) AS did,
           round(sqrt(var_sum), 6) AS se,
           round(((m11 - m10) - (m01 - m00)) / sqrt(var_sum), 4) AS t_stat
    FROM wide ORDER BY event_type
    """,
)
def b_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout per event type: treatment by
    the portable md5-nibble user hash (the same deterministic
    assignment b_ab_experiment_report uses), pre/post by day-of-month.
    DiD = (ȳ₁post − ȳ₁pre) − (ȳ₀post − ȳ₀pre); SE pools the four cell
    variances (Welch-style, independent cells); t = DiD/SE. The
    parallel-trends counterfactual this estimates is the standard
    launch-impact readout when randomization is infeasible.

    Scale shape: ONE pass — groupBy(event_type, treat, post) with
    map-side combine to ≤ 4 cells per type, then a 4-row-per-type
    conditional pivot. Nothing joins, nothing is data-sized after the
    first aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    tagged = ev.select(
        "event_type",
        "value",
        treat.alias("treat"),
        (F.dayofmonth("ts") > 15).cast("int").alias("post"),
    )
    cells = tagged.groupBy("event_type", "treat", "post").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )

    def cell(t: int, p: int):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col("m"))
        )

    wide = cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n"),
        cell(1, 1).alias("m11"),
        cell(1, 0).alias("m10"),
        cell(0, 1).alias("m01"),
        cell(0, 0).alias("m00"),
        F.sum(F.col("v") / F.col("n")).alias("var_sum"),
    )
    did = (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
    se = F.sqrt(F.col("var_sum"))
    return wide.select(
        "event_type",
        "n",
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 4).alias("t_stat"),
    ).orderBy("event_type")


# ===========================================================================
# section consolidated from plans/round7d_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

@query(
    "b_ab_srm_check",
    oracle="""
    WITH assigned AS (
      SELECT event_type,
             (instr('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS treat
      FROM events
    ),
    counts AS (
      SELECT event_type,
             count(*) AS n,
             sum(treat) AS n_treat
      FROM assigned GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n_treat AS BIGINT) AS n_treat,
           CAST(n - n_treat AS BIGINT) AS n_control,
           round(pow(n_treat - n * 0.5, 2) / (n * 0.5)
                 + pow((n - n_treat) - n * 0.5, 2) / (n * 0.5), 4) AS chi2,
           CAST(pow(n_treat - n * 0.5, 2) / (n * 0.5)
                + pow((n - n_treat) - n * 0.5, 2) / (n * 0.5)
                > 3.841 AS BOOLEAN) AS srm_flag
    FROM counts ORDER BY event_type
    """,
)
def b_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the hash-assigned experiment
    (b_ab_experiment_report / b_did_estimator's assignment): χ²
    goodness-of-fit of the observed treat/control split against the
    designed 50/50, flagged at the 0.05 critical value (3.841, 1 dof).
    An SRM flag means the assignment or logging is broken and every
    downstream readout is invalid — the first gate any experiment
    pipeline runs.

    Scale shape: one scan, assignment in codegen, one map-side-combined
    groupBy(event_type); the χ² is arithmetic on the aggregate row.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    counts = (
        ev.select("event_type", treat.alias("treat"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("treat").alias("n_treat"))
    )
    exp = F.col("n") * 0.5
    chi2 = (
        F.pow(F.col("n_treat") - exp, 2) / exp
        + F.pow((F.col("n") - F.col("n_treat")) - exp, 2) / exp
    )
    return counts.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("n_treat").cast("long").alias("n_treat"),
        (F.col("n") - F.col("n_treat")).cast("long").alias("n_control"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    ).orderBy("event_type")


# ===========================================================================
# section consolidated from plans/round7e_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

@query(
    "a_ratio_metric_delta_ci",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             sum(value) AS x, count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT event_type,
             count(*) AS n,
             avg(x) AS mx, avg(y) AS my,
             var_samp(x) AS vx, var_samp(y) AS vy,
             covar_samp(x, y) AS cxy
      FROM per_user GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_users,
           round(mx / my, 6) AS ratio,
           round(sqrt((vx - 2 * (mx / my) * cxy
                       + (mx / my) * (mx / my) * vy) / n) / my, 6) AS se,
           round(mx / my - 1.96 * sqrt((vx - 2 * (mx / my) * cxy
                       + (mx / my) * (mx / my) * vy) / n) / my, 6) AS ci_lo,
           round(mx / my + 1.96 * sqrt((vx - 2 * (mx / my) * cxy
                       + (mx / my) * (mx / my) * vy) / n) / my, 6) AS ci_hi
    FROM mom ORDER BY event_type
    """,
)
def a_ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric with
    user-level clustering: value-per-event R = Σx_u / Σy_u where x_u /
    y_u are each user's value total and event count. Naively treating
    events as i.i.d. understates the variance whenever users contribute
    multiple events; the delta method (first-order Taylor) gives
    Var(R) ≈ (σ²_x − 2R·σ_xy + R²·σ²_y) / (n·ȳ²) over USERS — the
    standard correction every experimentation platform applies to
    per-user ratio metrics.

    Scale shape: one groupBy(event_type, user_id) with map-side
    combine, then an event-type-sized moment aggregate (var/covar are
    single-pass). Nothing is data-sized after the first aggregate; no
    resampling needed (contrast a_bootstrap_ci — the delta method is
    the closed-form fast path, the bootstrap the assumption-free one).
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("x"), F.count("*").alias("y")
    )
    mom = per_user.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    r = F.col("mx") / F.col("my")
    se = (
        F.sqrt(
            (F.col("vx") - 2 * r * F.col("cxy") + r * r * F.col("vy"))
            / F.col("n")
        )
        / F.col("my")
    )
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(r - 1.96 * se, 6).alias("ci_lo"),
        F.round(r + 1.96 * se, 6).alias("ci_hi"),
    ).orderBy("event_type")


# ===========================================================================
# section consolidated from plans/round7f_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 6: sequential monitoring,
# hashing-trick featurization, OHLC bars.
#
# - b_sequential_mean_monitor — always-valid-style sequential z path for
#   the treat/control mean difference with a first-crossing-day report
# - t_feature_hashing         — hashing-trick bag-of-words featurization
#   census (the classic fixed-width featurizer for streaming ML)
# (A daily OHLC variant was considered and dropped — ts_ohlc_hourly in
# plans/timeseries.py already covers the OHLC downsampling shape.)
#
# All single-scan + bounded-frame window plans with DuckDB oracles.
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W

_SEQ_BOUNDARY = 2.8  # early-stopping z boundary (rough always-valid bound)

@query(
    "b_sequential_mean_monitor",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             (instr('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS treat,
             count(*) AS n, sum(value) AS s, sum(value * value) AS ss
      FROM events GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT event_type, d, treat,
             sum(n) OVER w AS cn,
             sum(s) OVER w AS cs,
             sum(ss) OVER w AS css
      FROM cells
      WINDOW w AS (PARTITION BY event_type, treat ORDER BY d)
    ),
    wide AS (
      SELECT a.event_type, a.d,
             a.cn AS nt, a.cs / a.cn AS mt,
             (a.css - a.cs * a.cs / a.cn) / (a.cn - 1) AS vt,
             b.cn AS nc, b.cs / b.cn AS mc,
             (b.css - b.cs * b.cs / b.cn) / (b.cn - 1) AS vc
      FROM cum a JOIN cum b
        ON a.event_type = b.event_type AND a.d = b.d
       AND a.treat = 1 AND b.treat = 0
      WHERE a.cn > 1 AND b.cn > 1
    ),
    zpath AS (
      SELECT event_type, d,
             round((mt - mc) / sqrt(vt / nt + vc / nc), 6) AS z
      FROM wide
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(max(CASE WHEN rn_last = 1 THEN z END), 4) AS final_z,
           CAST(coalesce(min(CASE WHEN abs(z) > {_SEQ_BOUNDARY}
                                  THEN day_idx END), 0) AS BIGINT)
             AS first_cross_day,
           CAST(coalesce(min(CASE WHEN abs(z) > {_SEQ_BOUNDARY}
                                  THEN day_idx END), 0) > 0 AS BOOLEAN)
             AS crossed
    FROM (
      SELECT event_type, d, z,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS day_idx,
             row_number() OVER (PARTITION BY event_type ORDER BY d DESC)
               AS rn_last
      FROM zpath
    )
    GROUP BY event_type ORDER BY event_type
    """,
)
def b_sequential_mean_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential experiment monitoring: the cumulative Welch z for the
    treat-vs-control mean difference is recomputed after EVERY day of
    data (running sums n/Σv/Σv² per arm — the single-pass moments), and
    the report says when |z| first crossed the early-stopping boundary
    (2.8 ≈ an always-valid-inference bound; a fixed-horizon 1.96 peeked
    daily would inflate false positives — that gap is exactly why
    sequential boundaries exist). Complements the fixed-horizon
    readouts (b_ab_experiment_report, b_cuped_adjusted_ab) with the
    peeking-safe path an experimentation platform actually monitors.

    Evaluation days are those where BOTH arms logged events (the cell
    inner join) — a day with a silent arm contributes its events to the
    running moments but isn't itself a look; with balanced hash
    assignment that's every day in practice.

    Scale shape: ONE corpus groupBy to (type, day, arm) cells carrying
    additive moments; the z path and crossing scan are windows over the
    calendar-bounded cell frame. Days × types × 2 rows — never
    data-sized after the first aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    cells = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("d"),
            treat.alias("treat"),
            "value",
        )
        .groupBy("event_type", "d", "treat")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
    )
    w = W.partitionBy("event_type", "treat").orderBy("d")
    cum = cells.select(
        "event_type",
        "d",
        "treat",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
        F.sum("ss").over(w).alias("css"),
    )
    a = cum.where(F.col("treat") == 1).alias("a")
    b = cum.where(F.col("treat") == 0).alias("b")
    var = lambda side: (  # noqa: E731 — local closed form
        (F.col(f"{side}.css") - F.col(f"{side}.cs") ** 2 / F.col(f"{side}.cn"))
        / (F.col(f"{side}.cn") - 1)
    )
    mean = lambda side: F.col(f"{side}.cs") / F.col(f"{side}.cn")  # noqa: E731
    wide = (
        a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
               & (F.col("a.d") == F.col("b.d")))
        .where((F.col("a.cn") > 1) & (F.col("b.cn") > 1))
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.d").alias("d"),
            F.round(
                (mean("a") - mean("b"))
                / F.sqrt(var("a") / F.col("a.cn") + var("b") / F.col("b.cn")),
                6,
            ).alias("z"),
        )
    )
    wd = W.partitionBy("event_type").orderBy("d")
    wl = W.partitionBy("event_type").orderBy(F.desc("d"))
    path = wide.select(
        "event_type",
        "z",
        F.row_number().over(wd).alias("day_idx"),
        F.row_number().over(wl).alias("rn_last"),
    )
    return (
        path.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(
                F.max(F.when(F.col("rn_last") == 1, F.col("z"))), 4
            ).alias("final_z"),
            F.coalesce(
                F.min(
                    F.when(
                        F.abs("z") > _SEQ_BOUNDARY, F.col("day_idx")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("first_cross_day"),
            (
                F.coalesce(
                    F.min(
                        F.when(F.abs("z") > _SEQ_BOUNDARY, F.col("day_idx"))
                    ),
                    F.lit(0),
                )
                > 0
            ).alias("crossed"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# section consolidated from plans/round7h_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-7 continuation operators, batch 8: distributional and
# stratified treatment effects.
#
# - a_quantile_treatment_effect — per-quantile treat−control differences
#   (the distributional readout mean-based estimators hide)
# - b_stratified_ate            — activity-decile post-stratified average
#   treatment effect (the confounding-control workhorse)
#
# Both ride the deterministic md5-nibble assignment the rest of the
# experiment family uses (b_ab_experiment_report / b_did_estimator /
# b_ab_srm_check / b_sequential_mean_monitor), closing out the
# experimentation toolkit: means, ratios, variance reduction, sequential
# boundaries, SRM — and now distributional + stratified effects.
# ===========================================================================

_QTE_LEVELS = (0.25, 0.5, 0.75, 0.9)

def _treat_sql(col: str) -> str:
    return (
        f"(instr('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), 1, 1))"
        " - 1) % 2"
    )

@query(
    "a_quantile_treatment_effect",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value, {_treat_sql("user_id")} AS treat
      FROM events
    ),
    q AS (
      SELECT event_type, treat,
             quantile_cont(value, 0.25) AS q25,
             quantile_cont(value, 0.50) AS q50,
             quantile_cont(value, 0.75) AS q75,
             quantile_cont(value, 0.90) AS q90,
             count(*) AS n
      FROM tagged GROUP BY 1, 2
    )
    SELECT t.event_type,
           CAST(t.n + c.n AS BIGINT) AS n,
           round(t.q25 - c.q25, 6) AS qte_p25,
           round(t.q50 - c.q50, 6) AS qte_p50,
           round(t.q75 - c.q75, 6) AS qte_p75,
           round(t.q90 - c.q90, 6) AS qte_p90
    FROM q t JOIN q c
      ON t.event_type = c.event_type AND t.treat = 1 AND c.treat = 0
    ORDER BY t.event_type
    """,
)
def a_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: treat−control differences at p25 /
    p50 / p75 / p90 per event type — the distributional readout that
    catches effects the mean hides (a treatment that helps the median
    user while hurting the tail nets to zero in b_ab_experiment_report
    but shows opposite signs at p50 and p90 here).

    Scale shape: one groupBy(event_type, arm) computing all four exact
    interpolated quantiles in a single aggregate (the percentile
    machinery a_exact_percentile pinned cross-engine), then a 2-row-
    per-type self-join. At 100 TB the exact quantile swaps for
    percentile_approx exactly as a_winsorized_stats documents.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    pcts = F.expr(
        "percentile(value, array(0.25, 0.5, 0.75, 0.9))"
    )
    q = (
        ev.select("event_type", treat.alias("treat"), "value")
        .groupBy("event_type", "treat")
        .agg(pcts.alias("q"), F.count("*").alias("n"))
    )
    t = q.where(F.col("treat") == 1).alias("t")
    c = q.where(F.col("treat") == 0).alias("c")
    out = t.join(c, F.col("t.event_type") == F.col("c.event_type")).select(
        F.col("t.event_type").alias("event_type"),
        (F.col("t.n") + F.col("c.n")).cast("long").alias("n"),
        *[
            F.round(F.col("t.q")[i] - F.col("c.q")[i], 6).alias(
                f"qte_p{int(lv * 100)}"
            )
            for i, lv in enumerate(_QTE_LEVELS)
        ],
    )
    return out.orderBy("event_type")

_N_STRATA = 5

@query(
    "b_stratified_ate",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             {_treat_sql("user_id")} AS treat,
             count(*) AS activity,
             avg(value) AS y
      FROM events GROUP BY user_id
    ),
    strat AS (
      SELECT *,
             ntile({_N_STRATA}) OVER (ORDER BY activity, user_id) AS stratum
      FROM per_user
    ),
    cells AS (
      SELECT stratum, treat, count(*) AS n, avg(y) AS m, var_samp(y) AS v
      FROM strat GROUP BY 1, 2
    ),
    wide AS (
      SELECT stratum,
             sum(n) AS n_stratum,
             max(CASE WHEN treat = 1 THEN m END)
               - max(CASE WHEN treat = 0 THEN m END) AS effect,
             max(CASE WHEN treat = 1 THEN v / n END)
               + max(CASE WHEN treat = 0 THEN v / n END) AS var_eff
      FROM cells GROUP BY stratum
    )
    SELECT stratum,
           CAST(n_stratum AS BIGINT) AS n_stratum,
           round(effect, 6) AS stratum_effect,
           round(sqrt(var_eff), 6) AS stratum_se,
           round(sum(CASE WHEN effect IS NOT NULL
                          THEN effect * n_stratum END) OVER ()
                 / sum(CASE WHEN effect IS NOT NULL
                            THEN n_stratum END) OVER (), 6) AS ate_weighted
    FROM wide ORDER BY stratum
    """,
)
def b_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified average treatment effect: users are cut into
    {_N_STRATA} activity strata (exact ntile over per-user event
    counts, user_id tiebreak — fully deterministic), the treat−control
    mean difference of per-user outcomes is estimated INSIDE each
    stratum, and the overall ATE is the stratum-size-weighted
    combination. Stratification removes the variance (and, with
    observational assignment, the confounding) that activity
    differences inject into the pooled difference — the
    post-stratification workhorse between the raw readout
    (b_ab_experiment_report) and CUPED (b_cuped_adjusted_ab).

    Scale shape: one groupBy(user_id) with map-side combine; the ntile
    runs on the per-user frame (user-count-sized; the documented
    escape at extreme scale is grouped_ntile_from_rank over
    operators/cumsum.py — the same crossover every global rank in this
    repo documents); cells and the weighted fold are strata-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.max(treat).alias("treat"),
        F.count("*").alias("activity"),
        F.avg("value").alias("y"),
    )
    strat = per_user.withColumn(
        "stratum",
        F.ntile(_N_STRATA).over(W.orderBy("activity", "user_id")),
    )
    cells = strat.groupBy("stratum", "treat").agg(
        F.count("*").alias("n"),
        F.avg("y").alias("m"),
        F.var_samp("y").alias("v"),
    )
    arm = lambda t, col: F.max(  # noqa: E731
        F.when(F.col("treat") == t, F.col(col))
    )
    wide = cells.groupBy("stratum").agg(
        F.sum("n").alias("n_stratum"),
        (arm(1, "m") - arm(0, "m")).alias("effect"),
        (
            F.max(F.when(F.col("treat") == 1, F.col("v") / F.col("n")))
            + F.max(F.when(F.col("treat") == 0, F.col("v") / F.col("n")))
        ).alias("var_eff"),
    )
    everything = W.orderBy("stratum").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    # a stratum missing one arm entirely carries a NULL effect (honest:
    # no within-stratum contrast exists); the weighted ATE combines the
    # NON-degenerate strata only — identical CASE logic in the oracle
    ok = F.col("effect").isNotNull()
    return wide.select(
        "stratum",
        F.col("n_stratum").cast("long").alias("n_stratum"),
        F.round("effect", 6).alias("stratum_effect"),
        F.round(F.sqrt("var_eff"), 6).alias("stratum_se"),
        F.round(
            F.sum(F.when(ok, F.col("effect") * F.col("n_stratum"))).over(
                everything
            )
            / F.sum(F.when(ok, F.col("n_stratum"))).over(everything),
            6,
        ).alias("ate_weighted"),
    ).orderBy("stratum")


# ===========================================================================
# section consolidated from plans/round7j_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

_SMD_FLAG = 0.1  # the conventional |SMD| imbalance threshold

@query(
    "a_covariate_balance",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             (instr('0123456789abcdef',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
               AS treat,
             count(*) AS activity,
             avg(value) AS mean_value,
             count(DISTINCT event_type) AS type_breadth
      FROM events GROUP BY user_id
    ),
    long AS (
      SELECT treat, 'activity' AS covariate, activity * 1.0 AS x FROM per_user
      UNION ALL
      SELECT treat, 'mean_value', mean_value FROM per_user
      UNION ALL
      SELECT treat, 'type_breadth', type_breadth * 1.0 FROM per_user
    ),
    mom AS (
      SELECT covariate, treat, count(*) AS n, avg(x) AS m, var_samp(x) AS v
      FROM long GROUP BY 1, 2
    ),
    wide AS (
      SELECT covariate,
             max(CASE WHEN treat = 1 THEN n END) AS nt,
             max(CASE WHEN treat = 0 THEN n END) AS nc,
             max(CASE WHEN treat = 1 THEN m END) AS mt,
             max(CASE WHEN treat = 0 THEN m END) AS mc,
             max(CASE WHEN treat = 1 THEN v END) AS vt,
             max(CASE WHEN treat = 0 THEN v END) AS vc
      FROM mom GROUP BY covariate
    )
    SELECT covariate,
           CAST(nt AS BIGINT) AS n_treat,
           CAST(nc AS BIGINT) AS n_control,
           round((mt - mc) / nullif(sqrt((vt + vc) / 2), 0), 4) AS smd,
           CAST(abs((mt - mc) / nullif(sqrt((vt + vc) / 2), 0)) > {_SMD_FLAG}
                AS BOOLEAN) AS imbalanced
    FROM wide ORDER BY covariate
    """,
)
def a_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance check for the hash-assigned experiment:
    standardized mean difference SMD = (m̄_t − m̄_c)/√((s²_t+s²_c)/2)
    for each per-user covariate (activity, mean value, event-type
    breadth), flagged at the conventional |SMD| > 0.1. Completes the
    pre-readout gate pair: b_ab_srm_check certifies the COUNTS match
    the design; this certifies the ARMS LOOK ALIKE on covariates —
    with true hash randomization both pass, and a failure here on
    observational data is the signal to reach for b_stratified_ate /
    b_cuped_adjusted_ab instead of the raw readout.

    Scale shape: one groupBy(user) with map-side combine, a 3-way
    unpivot of the covariates (rows = 2·covariates after the moment
    aggregate), then arithmetic on the covariate-count frame.
    """
    ev = load_table(spark, sf_dir, "events")
    treat = (
        F.expr(
            "locate(substr(md5(cast(user_id as string)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.max(treat).alias("treat"),
        F.count("*").cast("double").alias("activity"),
        F.avg("value").alias("mean_value"),
        F.countDistinct("event_type").cast("double").alias("type_breadth"),
    )
    long = per_user.select(
        "treat",
        F.expr(
            "stack(3, 'activity', activity, 'mean_value', mean_value,"
            " 'type_breadth', type_breadth) AS (covariate, x)"
        ),
    )
    mom = long.groupBy("covariate", "treat").agg(
        F.count("*").alias("n"), F.avg("x").alias("m"), F.var_samp("x").alias("v")
    )
    arm = lambda t, col: F.max(  # noqa: E731
        F.when(F.col("treat") == t, F.col(col))
    )
    wide = mom.groupBy("covariate").agg(
        arm(1, "n").alias("nt"),
        arm(0, "n").alias("nc"),
        arm(1, "m").alias("mt"),
        arm(0, "m").alias("mc"),
        arm(1, "v").alias("vt"),
        arm(0, "v").alias("vc"),
    )
    # NULLIF guard: a zero-variance covariate (constant in both arms)
    # yields NULL smd on both engines instead of an ANSI divide error
    smd = (F.col("mt") - F.col("mc")) / F.nullif(
        F.sqrt((F.col("vt") + F.col("vc")) / 2), F.lit(0.0)
    )
    return wide.select(
        "covariate",
        F.col("nt").cast("long").alias("n_treat"),
        F.col("nc").cast("long").alias("n_control"),
        F.round(smd, 4).alias("smd"),
        (F.abs(smd) > _SMD_FLAG).alias("imbalanced"),
    ).orderBy("covariate")
