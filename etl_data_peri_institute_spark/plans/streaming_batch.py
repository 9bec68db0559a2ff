"""Time-window operators over the events stream table.

Tumbling / sliding / session windows — the Structured Streaming operator
set (SURVEY.md §2.9 north star), each expressed with the same built-in
window functions a streaming query would use, plus one entry that runs a
REAL ``readStream`` pipeline to completion (same oracle: a bounded
stream's complete-mode result equals the batch aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


@query(
    "st_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window (epoch-aligned, same buckets
    as date_trunc for whole-hour widths)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("window.start").alias("win_start"), "event_type", "n_events", "total_value")
        .orderBy("win_start", "event_type")
    )


@query(
    "st_sliding_window",
    oracle="""
    WITH offsets AS (SELECT * FROM (VALUES (0), (1800)) AS t(off)),
    slid AS (
      SELECT CAST(to_timestamp(
               CAST(floor((epoch(ts) - off) / 3600) AS BIGINT) * 3600 + off
             ) AS TIMESTAMP) AS win_start,
             value
      FROM events, offsets
    )
    SELECT win_start, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM slid
    GROUP BY win_start
    ORDER BY win_start
    """,
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour wide, 30 min slide) — each event lands in 2
    overlapping windows (Spark expands via Expand, the oracle via an
    offset cross join; both epoch-aligned)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("window.start").alias("win_start"), "n_events", "total_value")
        .orderBy("win_start")
    )


@query(
    "st_session_window",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM seq
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap via F.session_window.

    Spark's native session windows (merging state op in streaming, window
    merge in batch); the oracle derives identical sessions with the
    classic lag + gap-flag + running-sum construction.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_last", "n_events")
        .orderBy("user_id", "session_start")
    )


@query(
    "st_streaming_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
)
def st_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming: readStream → watermark → tumbling window
    → memory sink, driven to completion. Complete-mode result over a
    bounded stream equals the batch aggregation, so the same oracle
    applies — the driver's hash compare covers the streaming runtime."""
    from ..streaming.windows import tumbling_counts

    return tumbling_counts(spark, sf_dir).orderBy("win_start", "event_type")


@query(
    "st_stateful_user_totals",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(coalesce(value, 0.0)), 2) AS total_value
    FROM events
    WHERE user_id < 25
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def st_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState,
    streaming/stateful.py) driven to completion: the bounded source
    arrives as one micro-batch, so the update-mode emission IS the final
    per-user state — equal to the batch aggregation, which is the oracle.
    """
    from ..streaming.stateful import running_user_totals
    from ..streaming.windows import run_to_completion, stream_events

    ev = stream_events(spark, sf_dir).filter(F.col("user_id") < 25)
    out = run_to_completion(running_user_totals(ev), output_mode="update")
    return out.orderBy("user_id")


@query(
    "st_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id + 1
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def st_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension, then aggregated in complete mode. The standard
    streaming-enrichment topology. No pinned broadcast: customer is
    SF-scaled, so the join strategy is left to the planner (it broadcasts
    while the static side fits, falls back to a stateless shuffled join
    at scale)."""
    from ..sources.tables import load_table as _lt
    from ..streaming.windows import run_to_completion, stream_events

    ev = stream_events(spark, sf_dir)
    cust = _lt(spark, sf_dir, "customer")
    joined = ev.join(cust, cust.c_custkey == ev.user_id + 1, "inner")
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value")
    )
    return run_to_completion(agg).orderBy("c_mktsegment")


@query(
    "st_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
)
def st_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: readStream → dropDuplicates on the key
    columns → append-mode memory sink, driven to completion. Exactly the
    exactly-once event-dedup topology (duplicate deliveries collapse in
    flight); only the keys are emitted so which physical row survived
    never affects the result. At scale, state is bounded with
    dropDuplicatesWithinWatermark when the key embeds event time — here
    the bounded source needs no eviction."""
    from ..streaming.windows import run_to_completion, stream_events

    ev = stream_events(spark, sf_dir).select("user_id", "event_type")
    out = run_to_completion(
        ev.dropDuplicates(["user_id", "event_type"]), output_mode="append"
    )
    return out.orderBy("user_id", "event_type")


@query(
    "st_stream_stream_join",
    oracle="""
    SELECT c.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id AS p_user, ts FROM events WHERE event_type = 'purchase') p
      ON p.p_user = c.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    GROUP BY c.user_id
    ORDER BY user_id
    """,
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks and purchases as two
    watermarked streams, joined on user with an event-time range
    (purchase within 1 h after the click) — the real-time funnel
    topology (batch counterpart: b_funnel_click_to_purchase). Both
    sides carry watermarks so the state store can evict clicks older
    than the join horizon; append mode is the only stream-stream mode,
    so pairs are materialized first and the count is a batch agg over
    the sink. State is bounded by watermark + interval, not stream
    length — the property that keeps this runnable forever."""
    from ..streaming.windows import run_to_completion, stream_events

    ev = stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    pairs = clicks.join(
        purchases,
        F.expr(
            "p_user = c_user AND p_ts > c_ts AND p_ts <= c_ts + interval 1 hour"
        ),
    )
    out = run_to_completion(pairs, output_mode="append")
    return (
        out.groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )



@query(
    "st_streaming_drift_psi",
    oracle="""
    WITH tagged AS (
      SELECT event_type,
             least(greatest(CAST(floor(value / 50.0) AS INT), 0), 9) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    binned AS (
      SELECT event_type, bin,
             CAST(sum(is_base) AS BIGINT) AS nb,
             CAST(sum(1 - is_base) AS BIGINT) AS nc
      FROM tagged GROUP BY event_type, bin
    ),
    tot AS (
      SELECT event_type, CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc
      FROM binned GROUP BY event_type
    ),
    terms AS (
      SELECT b.event_type,
             ((b.nb + 0.5) / (t.tb + 0.5 * 10)) AS p,
             ((b.nc + 0.5) / (t.tc + 0.5 * 10)) AS q
      FROM binned b JOIN tot t ON t.event_type = b.event_type
    )
    SELECT event_type, round(sum((p - q) * ln(p / q)), 4) AS psi
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
)
def st_streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming drift monitoring: the CURRENT period's
    (type, bin) counts come from a readStream aggregation driven to
    completion (complete mode, memory sink — production: the
    epoch-guarded foreachBatch monitor in streaming/drift.py), then PSI
    vs the frozen batch baseline at read time. Same add-half-smoothed
    arithmetic as the batch a_psi_drift gate query, so the one oracle
    covers the streaming runtime too.

    At scale the streaming aggregation state is bin-cardinality-sized
    per type (bounded) — the smallest possible stateful footprint for a
    distribution monitor."""
    from ..streaming.drift import _bin_col, baseline_bins
    from ..streaming.windows import run_to_completion, stream_events

    split = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    baseline = baseline_bins(
        load_table(spark, sf_dir, "events").filter(F.col("ts") < split)
    )
    cur_stream = (
        stream_events(spark, sf_dir)
        .filter(F.col("ts") >= split)
        .select("event_type", _bin_col("value", 0.0, 500.0, 10).alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n_cur"))
    )
    cur = run_to_completion(cur_stream)
    joined = baseline.join(cur, ["event_type", "bin"], "full").fillna(
        0, subset=["n_base", "n_cur"]
    )
    wall = F.sum("n_base").over(W.partitionBy("event_type"))
    wallc = F.sum("n_cur").over(W.partitionBy("event_type"))
    terms = joined.select(
        "event_type",
        ((F.col("n_base") + 0.5) / (wall + 0.5 * 10)).alias("p"),
        ((F.col("n_cur") + 0.5) / (wallc + 0.5 * 10)).alias("q"),
    )
    return (
        terms.groupBy("event_type")
        .agg(F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 4).alias("psi"))
        .orderBy("event_type")
    )
