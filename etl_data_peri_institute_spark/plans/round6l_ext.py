"""Round-6 continuation, batch 11: censored survival analysis and the
partition-skew planner.

- ``a_survival_km``: the Kaplan–Meier survival curve for
  time-to-high-value-purchase with RIGHT-CENSORING — users who never
  reach the event are censored at their last activity instead of being
  dropped (b_time_to_convert reports uncensored conversion lags; KM is
  the correct estimator when some subjects haven't converted YET, the
  standard churn/retention statistic).
- ``p_partition_skew_planner``: per join/aggregation key, the measured
  key-frequency profile (cardinality, hottest key, exact p99) and the
  DERIVED scale knobs — recommended shuffle-partition count and
  per-hot-key salting factor — i.e. the engine measuring its own skew
  dials instead of leaving them as prose (SCALING.md's salting and
  AQE-skew sections reference exactly these numbers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.tables import load_table
from .catalog import query

# --------------------------------------------------------------------------
# a_survival_km
# --------------------------------------------------------------------------

_KM_VALUE_MIN = 98.0  # 'high-value purchase' event; ~18% of users never
# reach it at sf0.01 -> a real censored fraction


@query(
    "a_survival_km",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS first_s,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s,
             CAST(floor(epoch(min(CASE WHEN event_type = 'purchase'
                                        AND value >= {_KM_VALUE_MIN}
                                       THEN ts END))) AS BIGINT) AS ev_s
      FROM events GROUP BY user_id
    ),
    durs AS (
      SELECT user_id,
             CASE WHEN ev_s IS NOT NULL THEN 1 ELSE 0 END AS ev,
             ((coalesce(ev_s, last_s) - first_s) * 100 + 1800) // 3600 AS dur
      FROM per_user
    ),
    ud AS (
      SELECT dur, count(*) AS c, sum(ev) AS d FROM durs GROUP BY dur
    ),
    risk AS (
      SELECT dur, c, d,
             (SELECT count(*) FROM durs) - coalesce(
               sum(c) OVER (ORDER BY dur
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS n_risk
      FROM ud
    ),
    terms AS (
      SELECT dur, d, n_risk,
             CASE WHEN d < n_risk THEN ln(1 - d * 1.0 / n_risk) END AS lt,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS zf
      FROM risk WHERE d > 0
    ),
    curve AS (
      SELECT dur, d, n_risk,
             sum(lt) OVER (ORDER BY dur) AS cum_lt,
             max(zf) OVER (ORDER BY dur) AS cum_zero
      FROM terms
    )
    SELECT dur / 100.0 AS t_hours,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN cum_zero = 1 THEN 0.0
                ELSE round(exp(cum_lt), 4) END AS survival
    FROM curve ORDER BY t_hours
    """,
)
def a_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-high-value
    purchase (value >= {98}), measured in hours from each user's first
    activity, with RIGHT-CENSORING at last activity for users who
    never reach the event (~18% here). At each event time t: n_risk =
    users whose duration >= t, and S(t) multiplies by (1 - d/n_risk)
    — the estimator that stays unbiased when some users simply haven't
    converted yet (dropping them, as a naive average does, biases the
    curve optimistic). A risk set exhausted by its own events (d =
    n_risk) pins the curve to exactly 0 from there on.

    Scale shape: one user-keyed shuffle builds (duration, event); the
    curve machinery runs entirely over the DISTINCT-DURATION frame —
    risk counts are an exclusive prefix sum and the product is
    exp(cumulative sum of logs), both windows over the bounded support,
    never user-sized partitions. Durations are EXACT integer
    centihours — half-up integer division, no float rounding in the
    group key (round(s/3600.0, 2) hit a .xx5 double-rounding boundary
    at sf0.1: Spark's BigDecimal HALF_UP said 134.3, DuckDB's
    double-repr round said 134.29 — the round-8 sf0.1 full replay
    caught it); the log-sum runs in the same dur order on both sides.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.unix_timestamp(F.min("ts")).alias("first_s"),
        F.unix_timestamp(F.max("ts")).alias("last_s"),
        F.unix_timestamp(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= _KM_VALUE_MIN),
                    F.col("ts"),
                )
            )
        ).alias("ev_s"),
    )
    durs = per_user.select(
        F.when(F.col("ev_s").isNotNull(), 1).otherwise(0).alias("ev"),
        F.expr(
            "((coalesce(ev_s, last_s) - first_s) * 100 + 1800) div 3600"
        ).alias("dur"),
    )
    ud = durs.groupBy("dur").agg(
        F.count("*").alias("c"), F.sum("ev").alias("d")
    )
    n_total = durs.agg(F.count("*").alias("nn"))
    wcum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    risk = (
        ud.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            F.col("nn") - F.coalesce(F.sum("c").over(wcum), F.lit(0)),
        )
        .filter(F.col("d") > 0)
    )
    terms = risk.select(
        "dur",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(1 - F.col("d") * 1.0 / F.col("n_risk")),
        ).alias("lt"),
        (F.col("d") >= F.col("n_risk")).cast("int").alias("zf"),
    )
    wall = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        terms.select(
            (F.col("dur") / 100.0).alias("t_hours"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.when(F.max("zf").over(wall) == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.sum("lt").over(wall)), 4))
            .alias("survival"),
        )
        .orderBy("t_hours")
    )


# --------------------------------------------------------------------------
# p_partition_skew_planner
# --------------------------------------------------------------------------

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
