"""Time-series operators over the events table (north star extensions).

Calendar resampling is the step the reference's daily cron never needed
(it processes one day at a time) but any metrics/feature pipeline over
event history does: regularize an irregular event stream onto a fixed
grid (gap-fill + forward-fill), and downsample to coarser buckets
(OHLC). Both are pure window/aggregation compositions — one shuffle on
the entity key, everything else in-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


@query(
    "ts_gap_fill_ffill",
    oracle="""
    WITH bounds AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      FROM events GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, CAST(day AS DATE) AS day
      FROM bounds, UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                          CAST(d1 AS TIMESTAMP),
                                          INTERVAL 1 DAY)) AS t(day)
    ),
    ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day, value,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    daily AS (SELECT user_id, day, value AS day_close FROM ranked WHERE rn = 1)
    SELECT s.user_id AS user_id, s.day AS day,
           round(last_value(d.day_close IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled_value,
           CAST(CASE WHEN d.day_close IS NULL THEN 0 ELSE 1 END AS INT) AS observed
    FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    ORDER BY user_id, day
    """,
)
def ts_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample an irregular event stream onto a per-user daily grid:
    build the calendar spine with sequence() (no driver loop, no UDF),
    left-join the observed daily closes, forward-fill gaps with
    last(ignorenulls) over an unbounded-preceding frame.

    Scale shape: the spine explodes to (entity × days) rows — bounded by
    calendar length, not event count; one shuffle on user_id serves the
    spine join, the close ranking, and the fill window (same key). The
    daily close picks the LAST event of the day deterministically
    (ts, event_id tiebreak), never an engine-dependent first()."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    rank_w = W.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.to_date("ts").alias("day"), F.col("value").alias("day_close"))
    )
    fill_w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.round(F.last("day_close", ignorenulls=True).over(fill_w), 2).alias(
                "filled_value"
            ),
            F.when(F.col("day_close").isNull(), 0).otherwise(1).cast("int").alias("observed"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "ts_ohlc_hourly",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, value, ts, event_id,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT user_id, bucket,
           round(min(CASE WHEN rn_open = 1 THEN value END), 2)  AS open,
           round(max(value), 2)                                 AS high,
           round(min(value), 2)                                 AS low,
           round(min(CASE WHEN rn_close = 1 THEN value END), 2) AS close,
           CAST(count(*) AS BIGINT)                             AS n_events
    FROM b
    GROUP BY user_id, bucket
    ORDER BY user_id, bucket
    """,
)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample to hourly OHLC bars per user — the lossy-but-ordered
    compaction every metrics store applies before long-horizon queries.
    Open/close are the deterministic first/last events of the bucket
    (ts, event_id tiebreak) selected via row_number — not first()/
    last(), whose result is partition-order-dependent; high/low/count
    are plain map-side-combining aggregates. One shuffle on
    (user, bucket)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    w_open = W.partitionBy("user_id", bucket).orderBy("ts", "event_id")
    w_close = W.partitionBy("user_id", bucket).orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn_open", F.row_number().over(w_open))
        .withColumn("rn_close", F.row_number().over(w_close))
        .groupBy("user_id", bucket.alias("bucket"))
        .agg(
            F.round(F.min(F.when(F.col("rn_open") == 1, F.col("value"))), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.min(F.when(F.col("rn_close") == 1, F.col("value"))), 2).alias("close"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "bucket")
    )


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH bounds AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      FROM events GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, CAST(day AS DATE) AS day
      FROM bounds, UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                          CAST(d1 AS TIMESTAMP),
                                          INTERVAL 1 DAY)) AS t(day)
    ),
    ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day, value,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    daily AS (SELECT user_id, day, value AS day_close FROM ranked WHERE rn = 1),
    grid AS (
      SELECT s.user_id, s.day, d.day_close,
             last_value(d.day_close IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
             last_value(CASE WHEN d.day_close IS NOT NULL THEN s.day END IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
             first_value(d.day_close IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
             first_value(CASE WHEN d.day_close IS NOT NULL THEN s.day END IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
      FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    )
    SELECT user_id, day,
           CAST(round(
             (CASE
                WHEN day_close IS NOT NULL THEN day_close
                WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
                  prev_val + (next_val - prev_val)
                    * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                       / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
                ELSE coalesce(prev_val, next_val)
              END) * 10000) AS BIGINT) AS interp_e4,
           CAST(CASE WHEN day_close IS NULL THEN 0 ELSE 1 END AS INT) AS observed
    FROM grid
    ORDER BY user_id, day
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation onto the per-user daily grid: gaps between
    two observations take the time-weighted blend of the bracketing
    daily closes; leading/trailing gaps fall back to nearest-fill. The
    harder sibling of ts_gap_fill_ffill — the standard resampler for
    numeric sensors/metrics where forward-fill injects staircases.

    Determinism discipline: prev/next values are window SELECTIONS (no
    sums), so both engines see bit-identical doubles; the blend
    ``prev + (next - prev) * (dd1 / dd2)`` is written with the same
    parse tree on both sides (IEEE-754 ops are deterministic given
    identical operand order), and the output is scaled-integer e4 units
    — floats never reach the hash, per the repo's money discipline.

    Scale shape: identical to ts_gap_fill_ffill — spine bounded by
    entity-count × calendar days, one user_id shuffle serves the join
    and all four fill windows (same partition key, Catalyst collapses
    them into one Window node pair)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    rank_w = W.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.to_date("ts").alias("day"), F.col("value").alias("day_close"))
    )
    w_prev = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_next = W.partitionBy("user_id").orderBy("day").rowsBetween(W.currentRow, W.unboundedFollowing)
    obs_day = F.when(F.col("day_close").isNotNull(), F.col("day"))
    grid = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "day_close",
        F.last("day_close", ignorenulls=True).over(w_prev).alias("prev_val"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_day"),
        F.first("day_close", ignorenulls=True).over(w_next).alias("next_val"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("next_day"),
    )
    blend = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * (
        F.datediff("day", "prev_day").cast("double")
        / F.datediff("next_day", "prev_day").cast("double")
    )
    interp = (
        F.when(F.col("day_close").isNotNull(), F.col("day_close"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(), blend
        )
        .otherwise(F.coalesce("prev_val", "next_val"))
    )
    return grid.select(
        "user_id",
        "day",
        F.round(interp * 10000).cast("bigint").alias("interp_e4"),
        F.when(F.col("day_close").isNull(), 0).otherwise(1).cast("int").alias("observed"),
    ).orderBy("user_id", "day")
