"""Behavioral / event-analytics operators over the events stream table.

Funnel conversion, cohort retention, and deterministic hash sampling —
the event-pipeline counterparts of the TPC-H relational suite. All
window/aggregation compositions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


@query(
    "b_funnel_click_to_purchase",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ),
    conv AS (
      SELECT c.user_id, c.click_ts,
             min(p.ts) AS first_purchase_ts
      FROM clicks c
      JOIN events p ON p.user_id = c.user_id
                   AND p.event_type = 'purchase'
                   AND p.ts > c.click_ts
                   AND p.ts <= c.click_ts + INTERVAL 1 HOUR
      GROUP BY c.user_id, c.click_ts
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS converting_clicks,
           min(first_purchase_ts) AS earliest_conversion
    FROM conv
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def b_funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: clicks followed by a purchase within 1 hour (same user).

    A bounded-range self-join on the user key — the time bound keeps the
    pair space linear-ish; at 100 TB pre-bucket both sides by
    (user_id, hour) so the range join becomes an equi-join on the bucket
    plus a residual filter.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id", "click_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return (
        conv.groupBy("user_id")
        .agg(
            F.count("*").alias("converting_clicks"),
            F.min("first_purchase_ts").alias("earliest_conversion"),
        )
        .orderBy("user_id")
    )


@query(
    "b_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def b_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, distinct active
    users per day-offset for the first week."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    activity = (
        # firsts is user-count-sized (unbounded) — AQE decides broadcast
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", F.col("day_offset").cast("int").alias("day_offset"))
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "b_hash_sample",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1 < 2
    ORDER BY event_id
    """,
)
def b_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample via content hashing (first md5 nibble
    < 2). Unlike TABLESAMPLE/rand(), the selection is reproducible across
    engines, runs, and partitionings — the right way to carve stable
    eval/holdout splits from a 100 TB corpus."""
    ev = load_table(spark, sf_dir, "events")
    nibble = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 1), 16, 10).cast("int")
    return (
        ev.filter(nibble < 2)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "b_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 14400
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def b_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts
    after a >4 h silence; session id = running count of session starts
    per user. The batch counterpart of st_session_window — same
    semantics, but replayable over the full history with plain windows
    (lag + cumulative sum over one user-partitioned sort — two window
    passes, one shuffle on user_id). Gap compare is fractional epoch
    seconds (timestamp cast to double) so both engines see identical
    boundary math."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    new_s = F.when(gap.isNull() | (gap > 14400), 1).otherwise(0)
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        ev.withColumn("session_id", F.sum(new_s).over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "b_rfm_segmentation",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders
      GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, frequency, monetary,
             ntile(4) OVER (ORDER BY last_order, o_custkey)  AS r_score,
             ntile(4) OVER (ORDER BY frequency, o_custkey)   AS f_score,
             ntile(4) OVER (ORDER BY monetary, o_custkey)    AS m_score
      FROM cust
    )
    SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(monetary), 2) AS segment_value
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def b_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    quartiles (ntile with deterministic tiebreaks) folded into segment
    cells — the standard customer-scoring rollup. One groupBy on the
    customer, three global ntile windows over the customer-level frame —
    kept HERE as the semantics pin. The production path is
    ``rfm_segmentation_production`` below (distributed global row
    number + exact ntile formula via operators/cumsum.py — no
    single-partition window), tested bit-identical; one
    final cell rollup."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = cust.select(
        "o_custkey",
        "frequency",
        "monetary",
        F.ntile(4).over(W.orderBy("last_order", "o_custkey")).cast("int").alias("r_score"),
        F.ntile(4).over(W.orderBy("frequency", "o_custkey")).cast("int").alias("f_score"),
        F.ntile(4).over(W.orderBy("monetary", "o_custkey")).cast("int").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("monetary"), 2).alias("segment_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def rfm_segmentation_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed form of ``b_rfm_segmentation``: the three quartile
    scores come from ONE distributed global row number
    (``operators.cumsum.global_row_number``: range exchange + Arrow
    local count + broadcast offsets) over the customer frame MELTED to
    (metric_id, sort_value) — round-6 fusion of what used to be three
    sequential rank passes (each with its own range exchange, eager
    checkpoint and offset collect; the fixed overhead tripled at bench
    scale, round-5 verdict item 2).

    Why the fusion is exact: the composite order (metric_id, v,
    custkey) ranks the three metric blocks back-to-back, and every
    block holds exactly n rows (the same customer set), so the
    per-metric rank is ``global_rn - metric_id * n`` — pure integer
    arithmetic folded through the exact ``ntile_from_rank`` formula:
    bit-identical ntile semantics (bucket sizes differ by at most one,
    larger buckets first, same (value, custkey) tiebreaks). The melt
    key is double — exact for all three metrics (dates as epoch days,
    counts, money already rounded to 2dp; all far under 2^53) and
    order-isomorphic to the native types. NO window anywhere; one
    range exchange over 3n dimension-sized rows replaces three global
    sorts, and the un-pivot back to one row per customer is a plain
    groupBy (monetary rides the melt as payload, so no join back)."""
    from ..operators.cumsum import global_row_number, ntile_from_rank

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    melted = cust.select(
        "o_custkey",
        "monetary",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("mid"),
                    F.datediff("last_order", F.lit("1970-01-01"))
                    .cast("double")
                    .alias("v"),
                ),
                F.struct(
                    F.lit(1).alias("mid"), F.col("frequency").cast("double").alias("v")
                ),
                F.struct(F.lit(2).alias("mid"), F.col("monetary").alias("v")),
            )
        ).alias("x"),
    ).select("o_custkey", "monetary", F.col("x.mid").alias("mid"), F.col("x.v").alias("v"))
    ranked, n3 = global_row_number(
        melted, [F.asc("mid"), F.asc("v"), F.asc("o_custkey")], out_col="__rn"
    )
    n = n3 // 3
    score = ntile_from_rank(F.col("__rn") - F.col("mid") * n, n, 4)
    scored = ranked.groupBy("o_custkey").agg(
        F.max(F.when(F.col("mid") == 0, score)).alias("r_score"),
        F.max(F.when(F.col("mid") == 1, score)).alias("f_score"),
        F.max(F.when(F.col("mid") == 2, score)).alias("m_score"),
        F.max("monetary").alias("monetary"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("monetary"), 2).alias("segment_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "w_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id, day,
             CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
               - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len, min(day) AS start_day
      FROM isl GROUP BY user_id, grp
    ),
    ranked AS (
      SELECT user_id, len, start_day,
             max(len) OVER (PARTITION BY user_id) AS longest,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks
      FROM streaks
    )
    SELECT user_id, max(longest) AS longest_streak, max(n_streaks) AS n_streaks,
           min(CASE WHEN len = longest THEN start_day END) AS longest_start
    FROM ranked
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def w_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands variant on the DISTINCT-day grid (b_sessionize
    islands on time gaps within a day; this islands on calendar-day
    runs). Island key = epoch-day minus the per-user day row_number —
    constant within a consecutive run, strictly decreasing across gaps.

    Deterministic throughout: integer day arithmetic, earliest start
    day breaks longest-streak ties. Scale shape: one user_id shuffle
    serves the distinct, the row_number window, the streak groupBy and
    the final per-user reduction (same key end-to-end — Catalyst reuses
    the partitioning; the frames strictly shrink at every step)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    grp = F.datediff("day", F.lit("1970-01-01").cast("date")).cast("long") - F.row_number().over(
        W.partitionBy("user_id").orderBy("day")
    )
    streaks = (
        days.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"), F.min("day").alias("start_day"))
    )
    wu = W.partitionBy("user_id")
    ranked = streaks.select(
        "user_id",
        "len",
        "start_day",
        F.max("len").over(wu).alias("longest"),
        F.count("*").over(wu).alias("n_streaks"),
    )
    return (
        ranked.groupBy("user_id")
        .agg(
            F.max("longest").alias("longest_streak"),
            F.max("n_streaks").alias("n_streaks"),
            F.min(F.when(F.col("len") == F.col("longest"), F.col("start_day"))).alias(
                "longest_start"
            ),
        )
        .orderBy("user_id")
    )
