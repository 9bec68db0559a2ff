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


# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

@query(
    "b_last_touch_attribution",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      FROM events
    )
    SELECT user_id, event_id AS purchase_event, last_touch
    FROM ordered WHERE event_type = 'purchase'
    ORDER BY user_id, purchase_event
    """,
)
def b_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the most recent
    PRECEDING non-purchase event type of the same user (NULL when the
    purchase is the user's first event) — the marketing-attribution
    primitive; first-touch and position-based models are the same carry
    with a different frame/aggregate.

    Same cost shape as the as-of join it generalizes (operators/asof.py
    uses the identical last-ignorenulls carry over a tagged union): ONE
    shuffle on user_id + an in-partition (ts, event_id) sort; the
    conditional inside the carry replaces a self-join entirely. The
    frame ends at 1 PRECEDING so a purchase can never attribute to
    itself or a same-timestamp later event."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = ev.select(
        "user_id", "event_id", "event_type",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w).alias("last_touch"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_event"), "last_touch")
        .orderBy("user_id", "purchase_event")
    )


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

@query(
    "b_time_to_convert",
    oracle="""
    WITH first_click AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ),
    first_purchase AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN first_click f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= f.t0
      GROUP BY e.user_id
    ),
    delta AS (
      SELECT f.user_id,
             CAST(floor((epoch(p.t1) - epoch(f.t0)) / 3600) AS BIGINT) AS hours_bucket
      FROM first_click f JOIN first_purchase p ON p.user_id = f.user_id
    )
    SELECT hours_bucket, CAST(count(*) AS BIGINT) AS n_users
    FROM delta GROUP BY hours_bucket
    ORDER BY hours_bucket
    """,
)
def b_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency histogram: hours between each user's first
    click and their first purchase AT OR AFTER that click, bucketed to
    hours — the funnel-velocity readout behind "how long does intent
    take to convert" (b_funnel_click_to_purchase counts WHO converts;
    this measures WHEN).

    Scale shape: two user-keyed min-aggregations (map-side partials)
    and one user-keyed join — all three share the user shuffle key, so
    AQE coalesces them into one exchange lineage; the histogram output
    is bucket-bounded. The at-or-after predicate makes the pair a
    true funnel (a purchase BEFORE the first click does not count).
    Timestamp difference floors to integer hours identically on both
    engines (epoch subtraction before division — the microsecond parts
    cancel below the hour grain only after the subtraction, which both
    engines perform on the same timestamps).
    """
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    delta = first_click.join(first_purchase, "user_id").select(
        "user_id",
        F.floor(
            (F.col("t1").cast("double") - F.col("t0").cast("double")) / 3600
        ).cast("long").alias("hours_bucket"),
    )
    return (
        delta.groupBy("hours_bucket")
        .agg(F.count("*").alias("n_users"))
        .orderBy("hours_bucket")
    )

@query(
    "b_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS first_day
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    )
    SELECT a.day,
           CAST(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(sum(CASE WHEN a.day <> f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning,
           round(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS new_share
    FROM active a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY a.day
    ORDER BY a.day
    """,
)
def b_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split: a user's first-ever active
    day marks them 'new' that day, 'returning' on every later active
    day — the growth-accounting headline metric (cohort_retention's
    day-0 column, computed standalone and cheaper).

    Scale shape: both the first-day frame and the active frame are
    user-keyed reductions of the same scan, and the join is user-keyed
    too — one shuffle key end to end, AQE reuses the exchange lineage.
    The daily report is day-bounded. At 100 TB the firsts frame is the
    incrementally-maintained "user birthday" dimension (min is
    mergeable — a_partial_agg_merge's algebra), so the daily job joins
    against yesterday's, never rescanning history.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    active = ev.select("user_id", day.alias("day")).distinct()
    is_new = (F.col("day") == F.col("first_day")).cast("long")
    return (
        active.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum(is_new).alias("n_new"),
            F.sum(1 - is_new).alias("n_returning"),
            F.round(F.sum(is_new) / F.count("*"), 4).alias("new_share"),
        )
        .orderBy("day")
    )

@query(
    "b_rolling_active_users",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    spine AS (SELECT DISTINCT day FROM active)
    SELECT s.day,
           CAST(count(DISTINCT CASE WHEN a.day = s.day THEN a.user_id END) AS BIGINT)
             AS dau,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau7,
           round(count(DISTINCT CASE WHEN a.day = s.day THEN a.user_id END) * 1.0
                 / count(DISTINCT a.user_id), 4) AS stickiness
    FROM spine s
    JOIN active a ON a.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
    GROUP BY s.day
    ORDER BY s.day
    """,
)
def b_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU) per day — the
    growth dashboard's headline triple. Distinct users over a SLIDING
    window cannot ride a window function (count distinct isn't
    frame-decomposable), so each distinct (user, day) row EXPLODES into
    the 7 spine days it covers and the count is a plain equi groupBy —
    no band join, no nested-loop (the band-join formulation, which the
    oracle keeps, plans as a BroadcastNestedLoopJoin in Spark and
    measured ~4x slower at sf0.1; the explode shape is shuffle-only).

    Scale shape: the fact collapses to distinct (user, day) FIRST (the
    shuffle that matters, map-side partials); the explode multiplies
    that frame by exactly the window width (7x) — days x daily-actives
    bounded, never events x days. The spine is data-derived (no
    calendar table needed; spine days the data never saw are clipped by
    the broadcast semi join against real days). At 100 TB the per-day
    distinct frame is the incrementally-maintained activity table and
    the daily job touches the trailing week's partitions only. DAU
    rides the same aggregation via a conditional distinct — one plan,
    not two scans. All counts integer; stickiness rounded.
    """
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    covered = active.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("sday"),
    )
    real_days = active.select("day").distinct().withColumnRenamed("day", "sday")
    joined = covered.join(F.broadcast(real_days), "sday")
    return (
        joined.groupBy("sday")
        .agg(
            F.count_distinct(
                F.when(F.col("day") == F.col("sday"), F.col("user_id"))
            ).alias("dau"),
            F.count_distinct("user_id").alias("wau7"),
            F.round(
                F.count_distinct(
                    F.when(F.col("day") == F.col("sday"), F.col("user_id"))
                )
                / F.count_distinct("user_id"),
                4,
            ).alias("stickiness"),
        )
        .select(F.col("sday").alias("day"), "dau", "wau7", "stickiness")
        .orderBy("day")
    )

_ABANDON_S = 3600  # 1 hour

@query(
    "b_abandonment_rate",
    oracle=f"""
    WITH clk AS (
      SELECT event_id, user_id, ts,
             CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events WHERE event_type = 'click'
    ),
    flagged AS (
      SELECT c.day, c.event_id,
             CASE WHEN EXISTS (
               SELECT 1 FROM events p
               WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                 AND p.ts >= c.ts
                 AND epoch(p.ts) - epoch(c.ts) <= {_ABANDON_S}
             ) THEN 0 ELSE 1 END AS abandoned
      FROM clk c
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(sum(abandoned) AS BIGINT) AS n_abandoned,
           round(sum(abandoned) * 1.0 / count(*), 4) AS abandonment_rate
    FROM flagged GROUP BY day
    ORDER BY day
    """,
)
def b_abandonment_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart abandonment: a click with NO purchase by the same user
    within the next hour counts as abandoned; reported as a daily
    rate — the time-bounded NOT-EXISTS that b_time_to_convert's
    converse implies (that op measures the latency of conversions;
    this counts the non-conversions a retargeting pipeline acts on).

    Scale shape: no correlated subquery and no join — the FORWARD
    as-of pattern (one union + one user-keyed ordered window, the
    operators/asof.py shape) carries each click's NEXT purchase
    timestamp; the abandonment flag is a projection on the carried
    age. The oracle keeps the EXISTS formulation as the semantic
    specification; Spark executes the single-window plan. Daily
    report is day-bounded; flags integer.
    """
    ev = load_table(spark, sf_dir, "events")
    rel = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_type").alias("et"),
    )
    # forward carry: next purchase ts at-or-after each row, per user.
    # side 0 = CLICK sorts first at equal ts, so an exact-timestamp
    # purchase sits inside the click's [currentRow, following) frame and
    # covers it (matches the oracle's p.ts >= c.ts and the probe-first
    # convention of operators/asof.py asof_join_forward).
    tagged = rel.select(
        "event_id",
        "user_id",
        "ts",
        "et",
        F.when(F.col("et") == "purchase", F.lit(1)).otherwise(F.lit(0)).alias("__side"),
        F.when(F.col("et") == "purchase", F.col("ts")).alias("__p_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "__side")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = tagged.withColumn(
        "next_purchase", F.first("__p_ts", ignorenulls=True).over(w)
    )
    clk = carried.filter(F.col("et") == "click").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        (
            F.col("next_purchase").isNull()
            | (
                F.col("next_purchase").cast("double") - F.col("ts").cast("double")
                > _ABANDON_S
            )
        ).cast("long").alias("abandoned"),
    )
    return (
        clk.groupBy("day")
        .agg(
            F.count("*").alias("n_clicks"),
            F.sum("abandoned").alias("n_abandoned"),
            F.round(F.sum("abandoned") / F.count("*"), 4).alias("abandonment_rate"),
        )
        .orderBy("day")
    )

@query(
    "b_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT f.cohort,
             date_diff('day', f.cohort, CAST(date_trunc('day', e.ts) AS DATE)) AS age,
             CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY cohort
    )
    SELECT r.cohort, r.age, s.cohort_users,
           CAST(sum(r.cents) OVER (
             PARTITION BY r.cohort ORDER BY r.age
           ) AS BIGINT) AS cum_cents,
           round(sum(r.cents) OVER (PARTITION BY r.cohort ORDER BY r.age)
                 / (s.cohort_users * 100.0), 2) AS ltv_per_user
    FROM rev r JOIN sizes s ON s.cohort = r.cohort
    ORDER BY r.cohort, r.age
    """,
)
def b_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users grouped by first-active day (the
    acquisition cohort), purchase revenue accumulated by cohort AGE —
    the per-user lifetime-value trajectory marketing uses to decide
    acquisition spend (b_cohort_retention counts who RETURNS; this
    sums what they are WORTH; the firsts frame is the same maintained
    "user birthday" dimension as b_new_vs_returning).

    Scale shape: the fact reduces to (cohort, age) integer-cents cells
    first (map-side partials after one user-keyed join to the firsts
    frame); the cumulative window runs over that days x days bounded
    frame only. Money stays integer cents through the cumsum; only the
    final per-user normalization is float, rounded to 2.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_users"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort", F.datediff(day, F.col("cohort")).alias("age")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    w = W.partitionBy("cohort").orderBy("age")
    return (
        rev.join(sizes, "cohort")
        .select(
            "cohort",
            "age",
            "cohort_users",
            F.sum("cents").over(w).alias("cum_cents"),
            F.round(
                F.sum("cents").over(w) / (F.col("cohort_users") * 100.0), 2
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort", "age")
    )


# ===========================================================================
# section consolidated from plans/round6_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

from .catalog import ORACLES, query

query("b_rfm_production", oracle=ORACLES["b_rfm_segmentation"])(
    rfm_segmentation_production
)


# ===========================================================================
# section consolidated from plans/round6e_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/dedup.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

@query(
    "b_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM cnt
    ORDER BY from_type, to_type
    """,
)
def b_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    every (from, to) event-type pair, the observed next-event count per
    user timeline (ts with event_id tiebreak) and the row-normalized
    transition probability — "after a click, 24% of next actions are a
    purchase". Timeline edges (a user's last event) emit no transition.

    Scale shape: ONE data-sized shuffle — the per-user lead() window on
    user_id; the (from, to) count partial-aggregates map-side down to
    at most |types|^2 rows, and the row normalization is a window over
    that bounded matrix (|types| partitions of |types| rows), never
    over event-sized data.
    """
    ev = load_table(spark, sf_dir, "events")
    nxt = F.lead("event_type").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    cnt = (
        ev.select(F.col("event_type").alias("from_type"), nxt.alias("to_type"))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(W.partitionBy("from_type")), 4
        ).alias("p"),
    ).orderBy("from_type", "to_type")


# ===========================================================================
# section consolidated from plans/round6f_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/graphs.py)
# ===========================================================================

_PATH_GAP_S = 14400  # 4 h, the b_sessionize convention

_PATH_TOP = 20

@query(
    "b_session_path_topk",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) > INTERVAL {_PATH_GAP_S} SECONDS
                  OR lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
             sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM marked
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {_PATH_TOP}
    """,
)
def b_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{20} session paths: each 4-h-gap session (the b_sessionize
    boundary convention) reduces to its ordered event-type sequence
    ("view>click>purchase"), counted across all sessions — the
    sequence-mining readout behind funnel design ("what do users
    actually do?"). Ties order by path for a deterministic cut.

    Scale shape: ONE data-sized shuffle — the session windows and the
    per-session path aggregation all share the user_id partitioning
    (the lag + running-sum + groupBy stack is the b_sessionize plan
    with a sort_array(collect_list) reduction on top); the path
    frequency count partial-aggregates map-side and the final cut is a
    TakeOrderedAndProject. Per-session collect_list is bounded by
    session length — a bot-length session would cap via slice() before
    the join in production, exactly like the degree caps on the graph
    family.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    new_s = F.when(gap.isNull() | (gap > _PATH_GAP_S), 1).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    paths = (
        ev.withColumn("session_id", F.sum(new_s).over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_PATH_TOP)
    )
