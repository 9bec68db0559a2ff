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


# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

@query(
    "ts_time_bucket_rollup",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY event_type, ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
    HAVING date_trunc('day', ts) IS NOT NULL
    ORDER BY event_type, day, hour NULLS FIRST
    """,
)
def ts_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution time-bucket rollup: per event
    type, hourly AND daily aggregates from ONE pass using a partial
    ROLLUP over (day, hour) — the continuous-aggregate maintenance shape
    (TimescaleDB's time_bucket rollups, Druid's granularity trees)
    expressed as a single grouping-sets aggregate instead of two jobs.

    Scale shape: grouping-sets expand each input row once per grouping
    (2x here) BEFORE the shuffle, and partial aggregation compacts them
    map-side, so the shuffle carries bucket-count rows, not data rows.
    The per-type day/hour key space is bounded (time is); no skew
    hazard. Money-style exact integer cents keep the sum cross-engine
    deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    hour = F.date_trunc("hour", "ts")
    with_b = ev.select(
        "event_type", day.alias("day"), hour.alias("hour"),
        F.round(F.col("value") * 100).alias("v_cents"),
    )
    rolled = (
        with_b.rollup("event_type", "day", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("v_cents").cast("long").alias("value_cents"),
        )
        # partial rollup: keep (type, day, hour) and (type, day) levels;
        # drop (type) and () which the oracle's GROUP BY event_type,
        # ROLLUP(day, hour) never produces
        .filter(F.col("event_type").isNotNull() & F.col("day").isNotNull())
    )
    return rolled.select(
        "event_type", "day", "hour", "n_events", "value_cents"
    ).orderBy("event_type", "day", F.col("hour").asc_nulls_first())

_EWMA_ALPHA = 0.5

_EWMA_SPAN = 8  # rows of history (current + 7 preceding)

@query(
    "ts_ewma",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 40
    )
    SELECT a.user_id, a.event_id,
           round(sum(b.value * power({_EWMA_ALPHA}, a.rn - b.rn))
                 / sum(power({_EWMA_ALPHA}, a.rn - b.rn)), 4) AS ewma
    FROM r a JOIN r b
      ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - {_EWMA_SPAN - 1} AND a.rn
    GROUP BY a.user_id, a.event_id
    ORDER BY a.user_id, a.event_id
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (alpha=0.5 over
    the trailing 8 observations) — the smoothing baseline for metric
    dashboards and drift monitors.

    Expressed as a bounded band self-join on the per-user row number
    (|rn_a - rn_b| < span) + a weighted aggregate: each row joins at
    most ``span`` partners, so the join output is O(n * span) — linear,
    co-partitioned on user_id, no window-frame float recursion and no
    pow() overflow (weights are always in [alpha^7, 1]). The same rows
    could come from a collect_list window + higher-order functions;
    the band join keeps every term a flat column expression, which both
    engines sum in the same per-group order after rounding."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    r = ev.select(
        "user_id", "event_id", "value",
        F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id")).alias("rn"),
    )
    a, b = r.alias("a"), r.alias("b")
    w = F.pow(F.lit(_EWMA_ALPHA), F.col("a.rn") - F.col("b.rn"))
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & F.col("b.rn").between(F.col("a.rn") - (_EWMA_SPAN - 1), F.col("a.rn")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"), F.col("a.event_id").alias("event_id"))
        .agg(F.round(F.sum(F.col("b.value") * w) / F.sum(w), 4).alias("ewma"))
        .orderBy("user_id", "event_id")
    )

@query(
    "ts_rolling_zscore_anomaly",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sd,
             count(*) OVER w AS n_hist
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, round(value, 2) AS value,
           round((value - mu) / sd, 3) AS zscore
    FROM s
    WHERE n_hist >= 10 AND sd > 0.001 AND abs(round((value - mu) / sd, 3)) > 3.0
    ORDER BY user_id, event_id
    """,
)
def ts_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: flag events whose value is more
    than 3 sigma from the TRAILING 20-observation mean/stddev of the
    same user (frame excludes the current row, so the anomaly does not
    contaminate its own baseline; warm-up rows with <10 history are
    skipped).

    One shuffle on user_id + an in-partition sort — the same cost shape
    as any per-key window; at 100 TB the time axis is the partition-
    internal sort, never a global one. The sd floor avoids near-constant
    windows where a zero-variance division would amplify float noise
    into flag flips; thresholding on the ROUNDED z pins the cross-engine
    boundary."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    s = ev.select(
        "user_id", "event_id", "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n_hist"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 3)
    return (
        s.filter((F.col("n_hist") >= 10) & (F.col("sd") > 0.001) & (F.abs(z) > 3.0))
        .select("user_id", "event_id", F.round("value", 2).alias("value"), z.alias("zscore"))
        .orderBy("user_id", "event_id")
    )

@query(
    "ts_period_over_period",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT cur.event_type, cur.h AS hour, cur.n AS n_events,
           prev.n AS n_prev_day,
           CAST(cur.n - prev.n AS BIGINT) AS delta
    FROM hourly cur
    JOIN hourly prev
      ON prev.event_type = cur.event_type
     AND prev.h = cur.h - INTERVAL 24 HOUR
    ORDER BY cur.event_type, cur.h
    """,
)
def ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period comparison: each hour's event count vs the
    SAME hour 24 h earlier, per event type — the dashboard/alerting
    staple ("is this hour unusual for this hour-of-day?"). An equi
    self-join on the shifted bucket rather than a window lag: lag-N over
    a sparse hour axis silently compares against whatever row happens to
    be N positions back, while the shifted-key join compares against the
    true prior period or nothing.

    Both sides reduce to bucket-count rows BEFORE the join (map-side
    partial agg), so the join moves bounded aggregate rows, never
    events. All-integer output."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    cur, prev = hourly.alias("cur"), hourly.alias("prev")
    return (
        cur.join(
            prev,
            (F.col("prev.event_type") == F.col("cur.event_type"))
            & (F.col("prev.h") == F.col("cur.h") - F.expr("INTERVAL 24 HOURS")),
        )
        .select(
            F.col("cur.event_type").alias("event_type"),
            F.col("cur.h").alias("hour"),
            F.col("cur.n").alias("n_events"),
            F.col("prev.n").alias("n_prev_day"),
            (F.col("cur.n") - F.col("prev.n")).alias("delta"),
        )
        .orderBy("event_type", "hour")
    )

_LTTB_BUCKETS = 60

@query(
    "ts_downsample_lttb",
    oracle=f"""
    WITH pts AS (
      SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS x, round(value, 2) AS y
      FROM events WHERE event_type = 'click'
    ),
    bounds AS (
      SELECT min(x) AS x0,
             CAST(ceil((max(x) - min(x) + 1) * 1.0 / {_LTTB_BUCKETS}) AS BIGINT) AS w
      FROM pts
    ),
    bucketed AS (
      SELECT p.event_id, p.x, p.y, CAST((p.x - b.x0) // b.w AS BIGINT) AS bk
      FROM pts p CROSS JOIN bounds b
    ),
    bstats AS (
      SELECT bk, avg(x) AS bx, avg(y) AS by FROM bucketed GROUP BY bk
    ),
    ctx AS (
      SELECT bk, bx, by,
             lag(bx) OVER (ORDER BY bk) AS px, lag(by) OVER (ORDER BY bk) AS py,
             lead(bx) OVER (ORDER BY bk) AS nx, lead(by) OVER (ORDER BY bk) AS ny
      FROM bstats
    ),
    scored AS (
      SELECT b.bk, b.event_id,
             round(abs((c.px - c.nx) * (b.y - c.py) - (c.px - b.x) * (c.ny - c.py)), 4) AS area
      FROM bucketed b JOIN ctx c ON c.bk = b.bk
      WHERE c.px IS NOT NULL AND c.nx IS NOT NULL
    ),
    picked AS (
      SELECT bk, event_id FROM (
        SELECT bk, event_id,
               row_number() OVER (PARTITION BY bk ORDER BY area DESC, event_id) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT CAST(bk AS BIGINT) AS bucket, event_id FROM picked ORDER BY bucket
    """,
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard downsampling, LTTB-style (parallel variant): bucket the
    series into 60 fixed-width time bins and keep, per interior bucket,
    the point forming the largest triangle with the NEIGHBOR BUCKET
    AVERAGES — the shape-preserving alternative to naive every-Nth
    sampling (peaks and dips survive because extreme points make big
    triangles). The classic sequential LTTB anchors on the previously
    SELECTED point; this variant anchors on bucket averages, which
    removes the sequential dependency so every bucket picks in parallel
    — the standard distributed adaptation.

    All-integer bucketing (epoch arithmetic, ceil'd width) so bucket
    boundaries cannot drift between engines; areas rounded before the
    per-bucket argmax with an id tiebreak. Cost: one scan, one bucket
    groupBy (60 rows), a 60-row window, and a broadcast join back —
    output is bucket-count-sized."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    pts = ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("x"),
        F.round("value", 2).alias("y"),
    )
    bounds = pts.agg(
        F.min("x").alias("x0"),
        F.ceil((F.max("x") - F.min("x") + 1) / _LTTB_BUCKETS).cast("bigint").alias("w"),
    )
    bucketed = pts.crossJoin(F.broadcast(bounds)).withColumn(
        "bk", ((F.col("x") - F.col("x0")) / F.col("w")).cast("bigint")
    )
    bstats = bucketed.groupBy("bk").agg(F.avg("x").alias("bx"), F.avg("y").alias("by"))
    wov = W.orderBy("bk")
    ctx = bstats.select(
        "bk",
        F.lag("bx").over(wov).alias("px"), F.lag("by").over(wov).alias("py"),
        F.lead("bx").over(wov).alias("nx"), F.lead("by").over(wov).alias("ny"),
    )
    scored = (
        bucketed.join(F.broadcast(ctx), "bk")
        .filter(F.col("px").isNotNull() & F.col("nx").isNotNull())
        .select(
            "bk", "event_id",
            F.round(
                F.abs(
                    (F.col("px") - F.col("nx")) * (F.col("y") - F.col("py"))
                    - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
                ),
                4,
            ).alias("area"),
        )
    )
    picked = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("bk").orderBy(F.col("area").desc(), "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return picked.select(F.col("bk").alias("bucket"), "event_id").orderBy("bucket")

@query(
    "ts_autocorr",
    oracle="""
    WITH r AS (
      SELECT event_type, round(value, 2) AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      FROM events
    ),
    pairs AS (
      SELECT a.event_type, a.v AS x, b.v AS y
      FROM r a JOIN r b ON b.event_type = a.event_type AND b.rn = a.rn - 24
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           round(
             (avg(x * y) - avg(x) * avg(y))
             / (sqrt(avg(x * x) - avg(x) * avg(x)) * sqrt(avg(y * y) - avg(y) * avg(y))),
             3) AS acf_lag24
    FROM pairs GROUP BY event_type ORDER BY event_type
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-24 autocorrelation per event type (Pearson between the series
    and itself 24 observations back) — the seasonality/periodicity
    diagnostic that decides whether the period-over-period monitor
    (ts_period_over_period) is even the right comparison for a metric.

    The lagged pairing is an equi self-join on the per-type row number
    (exactly one partner per row — O(n) pairs), and the correlation is
    the moment formula over plain aggregates, so everything partial-
    aggregates map-side after the one type-keyed window sort.
    Rounded to 3 so the cross-engine float summation order cannot move
    the statistic; inputs cent-rounded first so both engines correlate
    identical series."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.select(
        "event_type",
        F.round("value", 2).alias("v"),
        F.row_number().over(
            W.partitionBy("event_type").orderBy("ts", "event_id")
        ).alias("rn"),
    )
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.rn") == F.col("a.rn") - 24),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.v").alias("x"),
        F.col("b.v").alias("y"),
    )
    num = F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")
    den = F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")) * F.sqrt(
        F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")
    )
    return (
        pairs.groupBy("event_type")
        .agg(F.count("*").alias("n_pairs"), F.round(num / den, 3).alias("acf_lag24"))
        .orderBy("event_type")
    )


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH v AS (
      SELECT event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT event_type, CAST(round(avg(cents)) AS BIGINT) AS mean_c,
             CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY event_type
    ),
    c AS (
      SELECT v.event_type, v.ts, m.n,
             CAST(sum(v.cents - m.mean_c) OVER (
               PARTITION BY v.event_type ORDER BY v.ts, v.event_id
             ) AS BIGINT) AS cusum
      FROM v JOIN m ON m.event_type = v.event_type
    ),
    peak AS (
      SELECT event_type, ts, n, cusum,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(cusum) DESC, ts, cusum
             ) AS rn
      FROM c
    )
    SELECT event_type, ts AS change_ts, cusum AS cusum_peak, n
    FROM peak WHERE rn = 1
    ORDER BY event_type
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: cumulative sum of
    deviations from the series mean, peak |CUSUM| marks the most likely
    level-shift point (Page's classic single-changepoint estimator —
    the monitoring companion to a_ks_drift, which only says THAT two
    windows differ, not WHEN the shift happened).

    Scale shape: the mean reduces each type to one integer row
    (broadcast back); the cumulative sum is ONE type-keyed ordered
    window — same single-shuffle shape as w_running_revenue. The peak
    argmax is a second pass over the same partitioning (no new
    exchange key). Everything stays in integer cents — the mean is
    rounded to an integer BEFORE subtraction, so the running sum is
    exact on both engines and the argmax cannot flip on float noise;
    the (ts, cusum) tiebreak pins equal-|peak| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    m = v.groupBy("event_type").agg(
        F.round(F.avg("cents")).cast("long").alias("mean_c"),
        F.count("*").alias("n"),
    )
    c = v.join(F.broadcast(m), "event_type").select(
        "event_type",
        "ts",
        "n",
        F.sum(F.col("cents") - F.col("mean_c"))
        .over(W.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("cusum"),
    )
    peak = c.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.abs(F.col("cusum")).desc(), "ts", "cusum"
            )
        ),
    )
    return (
        peak.filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("ts").alias("change_ts"),
            F.col("cusum").alias("cusum_peak"),
            "n",
        )
        .orderBy("event_type")
    )

@query(
    "ts_rolling_corr",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events
      GROUP BY 1
    ),
    daily AS (
      SELECT CAST(date_trunc('day', h) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM hourly GROUP BY 1
    )
    SELECT day, n_hours,
           -- NULLIF guard: a zero-variance day has no defined Pearson r;
           -- NULL on both engines (DuckDB IEEE ops would yield NaN/inf)
           round((n_hours * sxy - sx * 1.0 * sy)
                 / NULLIF(sqrt(n_hours * sxx - sx * 1.0 * sx)
                          * sqrt(n_hours * syy - sy * 1.0 * sy), 0), 3) AS corr_click_purchase
    FROM daily
    ORDER BY day
    """,
)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Pearson correlation between the hourly click count and
    the hourly purchase count — the "do these two streams move
    together" diagnostic run daily over metric pairs (the correlation
    twin of ts_period_over_period; a_corr_matrix correlates columns
    within one row, this correlates two SERIES over a shared time
    axis).

    Scale shape: raw events collapse to one row per hour in a single
    conditional-aggregation pass (no per-type scan, no join to align
    the two series — the hour spine is whatever hours have events,
    identical on both engines). Days then aggregate 24 hour-rows each,
    carrying exact integer moments; only the final Pearson division is
    float, rounded to 3. Two groupBys, both partial-aggregating
    map-side; output is days-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("y"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "h").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_hours"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_hours")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    # nullif mirrors the oracle guard: zero-variance day -> NULL r on
    # both engines rather than Spark-NULL vs DuckDB-NaN divergence
    return daily.select(
        "day",
        "n_hours",
        F.round(num / F.nullif(den, F.lit(0.0)), 3).alias("corr_click_purchase"),
    ).orderBy("day")

@query(
    "ts_seasonal_baseline",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    stats AS (
      SELECT event_type, hod,
             CAST(count(*) AS BIGINT) AS n,
             CAST(round(sum(cents) * 1.0 / count(*)) AS BIGINT) AS baseline_cents,
             -- NULLIF guard: an n=1 slot has no sample sd; NULL on both
             -- engines (DuckDB's default IEEE ops would otherwise yield
             -- NaN/inf where Spark yields NULL)
             CAST(round(sqrt((sum(cents * cents) - sum(cents) * 1.0 * sum(cents) / count(*))
                             / NULLIF(count(*) - 1, 0))) AS BIGINT) AS sd_cents
      FROM v GROUP BY event_type, hod
    )
    SELECT v.event_type, v.hod, max(s.n) AS n,
           max(s.baseline_cents) AS baseline_cents,
           max(s.sd_cents) AS sd_cents,
           CAST(sum(CASE WHEN abs(v.cents - s.baseline_cents) > 2 * s.sd_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM v JOIN stats s ON s.event_type = v.event_type AND s.hod = v.hod
    GROUP BY v.event_type, v.hod
    ORDER BY v.event_type, v.hod
    """,
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type (the 24-slot
    baseline a daily-cycle metric is judged against) plus the count of
    events violating their slot's 2-sigma band — seasonal anomaly
    detection by deviation from the within-slot distribution rather
    than the trailing window (complements ts_rolling_zscore_anomaly,
    which has no notion of time-of-day seasonality).

    Scale shape: the stats side reduces 100 TB to types x 24 rows of
    integer moments and broadcasts back onto the event scan; the final
    per-slot anomaly count partial-aggregates map-side. Baseline and
    sigma are rounded to INTEGER cents before the band compare, so the
    2-sigma threshold is exact integer arithmetic on both engines —
    no event can sit on a float boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s_, ss, cnt = F.sum("cents"), F.sum(F.col("cents") * F.col("cents")), F.count("*")
    stats = v.groupBy("event_type", "hod").agg(
        cnt.alias("n"),
        F.round(s_ / cnt).cast("long").alias("baseline_cents"),
        # nullif guard mirrors the oracle: an n=1 slot has no sample sd
        # (NULL on both engines, not DuckDB-NaN vs Spark-NULL)
        F.round(
            F.sqrt((ss - s_ * s_ / cnt) / F.nullif(cnt - 1, F.lit(0)))
        ).cast("long").alias("sd_cents"),
    )
    joined = v.join(F.broadcast(stats), ["event_type", "hod"])
    return (
        joined.groupBy("event_type", "hod")
        .agg(
            F.max("n").alias("n"),
            F.max("baseline_cents").alias("baseline_cents"),
            F.max("sd_cents").alias("sd_cents"),
            # when/otherwise (not a bare cast) so a NULL sd slot counts 0
            # anomalies on BOTH engines (matches the oracle's CASE ELSE 0)
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("baseline_cents"))
                    > 2 * F.col("sd_cents"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_anomalies"),
        )
        .orderBy("event_type", "hod")
    )


# ===========================================================================
# section consolidated from plans/round6i_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

_SNAIVE_LAG = 7

@query(
    "ts_snaive_forecast_eval",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(value), 2) AS rev
      FROM events GROUP BY 1, 2
    ),
    fc AS (
      SELECT event_type, day, rev,
             lag(rev, {_SNAIVE_LAG}) OVER (
               PARTITION BY event_type ORDER BY day
             ) AS forecast
      FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_scored,
           round(avg(abs(rev - forecast)), 2) AS mae,
           round(avg(abs(rev - forecast) / NULLIF(rev, 0)), 4) AS mape
    FROM fc WHERE forecast IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def ts_snaive_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: tomorrow's daily revenue per
    event type is forecast as the value {7} daily rows earlier (the
    weekly-seasonality baseline), scored with MAE and MAPE over every
    day that has a lag — the baseline any forecasting model must beat,
    and the harness that proves it. Lag is ROW-based over the observed
    daily series (a gap day shifts the reference; ts_gap_fill is the
    upstream densifier when calendar alignment is required).

    Scale shape: one map-side-combined daily aggregate (entity×days
    frame), one per-type lag window over that bounded series, and a
    per-type error fold. Revenue rounds to cents before the lag so
    both engines difference identical numbers; zero-revenue days drop
    out of MAPE via NULLIF (avg ignores NULL).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    w = W.partitionBy("event_type").orderBy("day")
    fc = daily.withColumn("forecast", F.lag("rev", _SNAIVE_LAG).over(w))
    err = F.abs(F.col("rev") - F.col("forecast"))
    return (
        fc.filter(F.col("forecast").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_days_scored"),
            F.round(F.avg(err), 2).alias("mae"),
            F.round(
                F.avg(err / F.nullif(F.col("rev"), F.lit(0.0))), 4
            ).alias("mape"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# section consolidated from plans/round6j_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

_ANOM_SIGMA = 2.0

@query(
    "ts_snaive_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(value), 2) AS rev
      FROM events GROUP BY 1, 2
    ),
    fc AS (
      SELECT event_type, day, rev,
             lag(rev, {_SNAIVE_LAG}) OVER (
               PARTITION BY event_type ORDER BY day
             ) AS forecast
      FROM daily
    ),
    resid AS (
      SELECT event_type, day, rev, forecast, rev - forecast AS r
      FROM fc WHERE forecast IS NOT NULL
    ),
    sig AS (
      SELECT event_type,
             sqrt(greatest(avg(r * r) - avg(r) * avg(r), 0)) AS sigma,
             avg(r) AS rbar
      FROM resid GROUP BY event_type
    )
    SELECT r.event_type, r.day, r.rev, r.forecast,
           round((r.r - s.rbar) / NULLIF(s.sigma, 0), 2) AS z
    FROM resid r JOIN sig s ON s.event_type = r.event_type
    WHERE abs(r.r - s.rbar) > {_ANOM_SIGMA} * s.sigma
    ORDER BY r.event_type, r.day
    """,
)
def ts_snaive_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly flags: days whose forecast residual
    (actual - snaive forecast) deviates more than {2.0} sigma from the
    per-type mean residual — the alerting layer over
    ts_snaive_forecast_eval's backtest (a volume spike that the weekly
    pattern does not explain). Residual moments are population
    statistics over the scored days; z is reported per flagged day.

    Scale shape: the snaive frame (map-side daily aggregate + one lag
    window over the bounded day series) plus one per-type moment
    aggregate joined back onto the residuals — the flag filter and z
    are row-local. Cents rounding before the lag keeps both engines
    differencing identical numbers; the 2-sigma threshold compares the
    same doubles on both sides.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    w = W.partitionBy("event_type").orderBy("day")
    resid = (
        daily.withColumn("forecast", F.lag("rev", _SNAIVE_LAG).over(w))
        .filter(F.col("forecast").isNotNull())
        .withColumn("r", F.col("rev") - F.col("forecast"))
    )
    sig = resid.groupBy("event_type").agg(
        F.sqrt(
            F.greatest(
                F.avg(F.col("r") * F.col("r")) - F.avg("r") * F.avg("r"),
                F.lit(0.0),
            )
        ).alias("sigma"),
        F.avg("r").alias("rbar"),
    )
    return (
        resid.join(F.broadcast(sig), "event_type")
        .filter(
            F.abs(F.col("r") - F.col("rbar")) > _ANOM_SIGMA * F.col("sigma")
        )
        .select(
            "event_type",
            "day",
            "rev",
            "forecast",
            F.round(
                (F.col("r") - F.col("rbar"))
                / F.nullif("sigma", F.lit(0.0)),
                2,
            ).alias("z"),
        )
        .orderBy("event_type", "day")
    )


# ===========================================================================
# section consolidated from plans/round6k_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

_ACF_LAGS = (1, 2, 7)

def _acf_oracle() -> str:
    selects = []
    for k in _ACF_LAGS:
        selects.append(
            f"""
    SELECT event_type, CAST({k} AS INT) AS lag,
           CAST(count(cl) AS BIGINT) AS n_pairs,
           round(sum(c * cl) / NULLIF(max(ssq), 0), 4) AS acf
    FROM (
      SELECT event_type, c, ssq,
             lag(c, {k}) OVER (PARTITION BY event_type ORDER BY day) AS cl
      FROM dev
    )
    WHERE cl IS NOT NULL
    GROUP BY event_type"""
        )
    union = " UNION ALL ".join(selects)
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(value), 2) AS rev
      FROM events GROUP BY 1, 2
    ),
    means AS (SELECT event_type, avg(rev) AS m FROM daily GROUP BY 1),
    cen AS (
      SELECT d.event_type, d.day, d.rev - mn.m AS c
      FROM daily d JOIN means mn ON mn.event_type = d.event_type
    ),
    ssqs AS (SELECT event_type, sum(c * c) AS ssq FROM cen GROUP BY 1),
    dev AS (
      SELECT c.event_type, c.day, c.c, s.ssq
      FROM cen c JOIN ssqs s ON s.event_type = c.event_type
    )
    SELECT event_type, lag, n_pairs, acf
    FROM ({union})
    ORDER BY event_type, lag
    """

@query("ts_autocorrelation_report", oracle=_acf_oracle())
def ts_autocorrelation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of daily revenue per event type at lags
    {1, 2, 7}: r_k = sum((x_t - xbar)(x_{{t-k}} - xbar)) / sum((x_t -
    xbar)^2), the standard ACF normalization (overall mean and total
    sum of squares, so r_k across lags are comparable). Lag 7 reads
    weekly seasonality directly; lags 1-2 read short-term persistence
    — the raw diagnostic behind every seasonality/forecast choice.

    Scale shape: one map-side daily aggregate, then per-type mean /
    total-SS / lagged values all share ONE window partitioning over
    the bounded day series; each lag is a filter + fold over that
    frame. Cents rounding pins the support across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    means = daily.groupBy("event_type").agg(F.avg("rev").alias("m"))
    cen = daily.join(F.broadcast(means), "event_type").select(
        "event_type", "day", (F.col("rev") - F.col("m")).alias("c")
    )
    ssqs = cen.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).alias("ssq")
    )
    wo = W.partitionBy("event_type").orderBy("day")
    dev = cen.join(F.broadcast(ssqs), "event_type").select(
        "event_type",
        "day",
        "c",
        "ssq",
        *[F.lag("c", k).over(wo).alias(f"cl{k}") for k in _ACF_LAGS],
    )
    outs = []
    for k in _ACF_LAGS:
        cl = F.col(f"cl{k}")
        outs.append(
            dev.filter(cl.isNotNull())
            .groupBy("event_type")
            .agg(
                F.lit(k).cast("int").alias("lag"),
                F.count(cl).cast("long").alias("n_pairs"),
                F.round(
                    F.sum(F.col("c") * cl)
                    / F.nullif(F.max("ssq"), F.lit(0.0)),
                    4,
                ).alias("acf"),
            )
            .select("event_type", "lag", "n_pairs", "acf")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("event_type", "lag")


# ===========================================================================
# section consolidated from plans/round7c_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    trended AS (
      SELECT event_type, d, n,
             avg(n) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      FROM daily
    ),
    det AS (
      SELECT event_type, dayofweek(d) AS dow, d, n - trend AS detr
      FROM trended
    ),
    seas AS (
      SELECT event_type, dow, avg(detr) AS s, count(*) AS n_days
      FROM det GROUP BY 1, 2
    ),
    rem AS (
      SELECT det.event_type, det.dow,
             det.detr, det.detr - seas.s AS r
      FROM det JOIN seas USING (event_type, dow)
    ),
    strength AS (
      SELECT event_type,
             round(greatest(0, 1 - var_samp(r) / var_samp(detr)), 4) AS seasonal_strength
      FROM rem GROUP BY event_type
    )
    SELECT s.event_type, s.dow,
           round(s.s, 4) AS seasonal_idx,
           CAST(s.n_days AS BIGINT) AS n_days,
           st.seasonal_strength
    FROM seas s JOIN strength st USING (event_type)
    ORDER BY s.event_type, s.dow
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the per-type daily count
    series: trend = centered 7-day moving average (rows frame — the
    series is dense daily), seasonal index = mean detrended value per
    day-of-week, remainder = detrended − seasonal, and the
    seasonal-strength statistic 1 − Var(remainder)/Var(detrended)
    (Hyndman's Fₛ, clamped at 0) that says whether the weekly cycle is
    signal or noise. The STL-lite every capacity/anomaly pipeline runs
    before picking ts_snaive vs flat baselines.

    Scale shape: the daily aggregate is the only corpus-sized groupBy
    (map-side combined); everything after runs on the days×types frame
    (bounded by calendar length), where per-type windows partition on
    event_type — no global window, no data-sized shuffle. dayofweek is
    engine-aligned (both 1=Sunday..7=Saturday on DuckDB vs Spark:
    DuckDB dayofweek is 0-6 Sunday-start — offset +1 NOT applied;
    values only need to AGREE per day, and both engines derive them
    from the same dates deterministically).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("n"))
    trend_w = (
        W.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    )
    det = daily.select(
        "event_type",
        F.dayofweek("d").alias("dow_spark"),
        "d",
        (F.col("n") - F.avg("n").over(trend_w)).alias("detr"),
    )
    # Align day-of-week numbering to the oracle: DuckDB dayofweek is
    # 0=Sunday..6=Saturday; Spark dayofweek is 1=Sunday..7=Saturday.
    det = det.withColumn("dow", F.col("dow_spark") - 1).drop("dow_spark")
    seas = det.groupBy("event_type", "dow").agg(
        F.avg("detr").alias("s"), F.count("*").alias("n_days")
    )
    rem = det.join(seas.select("event_type", "dow", "s"), ["event_type", "dow"]).select(
        "event_type", "detr", (F.col("detr") - F.col("s")).alias("r")
    )
    strength = rem.groupBy("event_type").agg(
        F.round(
            F.greatest(F.lit(0.0), 1 - F.var_samp("r") / F.var_samp("detr")), 4
        ).alias("seasonal_strength")
    )
    return (
        seas.join(strength, "event_type")
        .select(
            "event_type",
            "dow",
            F.round("s", 4).alias("seasonal_idx"),
            F.col("n_days").cast("long").alias("n_days"),
            "seasonal_strength",
        )
        .orderBy("event_type", "dow")
    )
