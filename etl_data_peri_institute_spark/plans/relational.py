"""Full relational operator surface (north star; absent from the reference).

SURVEY.md §2.3-§2.6 records that the reference has no general joins, no
group-by aggregation, no window functions, no sorts, and only a union —
this module supplies the complete surface as declarative Spark plans:
window functions (ranking/offset/frames), set operations, multi-dim
aggregation (cube/rollup/grouping sets), pivot, subqueries, and
statistical aggregates. Every query has a DuckDB oracle twin.

Determinism discipline: every window ORDER BY and top-k carries a unique
tiebreak key (event_id / orderkey) so both engines produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "w_topk_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             CAST(row_number() OVER (PARTITION BY c.c_custkey
                                     ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rn
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    ) t
    WHERE rn <= 3 AND c_custkey < 100
    ORDER BY c_custkey, rn
    """,
)
def w_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number over a desc window + filter.

    The canonical top-k-per-group: one shuffle on the partition key, no
    global sort. At scale, the `rn <= 3` filter runs inside the window
    stage (Spark pushes the limit via WindowGroupLimit in recent versions).
    The partition-key predicate (`c_custkey < 100`) is applied BEFORE the
    join and window — it prunes at the scan, so the window stage only
    ever sees the selected customers (round-2 review: don't rely on
    Catalyst to push a filter through a window). No pinned broadcast:
    customer is SF-scaled; after the selective filter AQE broadcasts the
    99-row side on its own.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
        .orderBy("c_custkey", "rn")
    )


@query(
    "w_running_revenue_per_supplier",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
    FROM lineitem
    WHERE l_suppkey < 5
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
)
def w_running_revenue_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame over a unique ordering."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_extendedprice").over(w), 2).alias("running_rev"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@query(
    "w_lag_lead_user_events",
    oracle="""
    SELECT user_id, event_id, event_type,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           CAST(coalesce(date_diff('second', lag(ts) OVER w, ts), -1) AS BIGINT) AS secs_since_prev
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def w_lag_lead_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offset functions + time delta vs previous event."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.coalesce(
                (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))),
                F.lit(-1),
            ).cast("long").alias("secs_since_prev"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "w_rank_dense_ntile",
    oracle="""
    SELECT p_brand, p_partkey,
           CAST(rank()       OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4)     OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank
    FROM part
    WHERE p_partkey < 400
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    ORDER BY p_brand, p_partkey
    """,
)
def w_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: rank, dense_rank, ntile, percent_rank."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        part.select(
            "p_brand",
            "p_partkey",
            F.rank().over(w).cast("int").alias("rnk"),
            F.dense_rank().over(w).cast("int").alias("drnk"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        )
        .orderBy("p_brand", "p_partkey")
    )


@query(
    "w_first_last_value",
    oracle="""
    SELECT user_id,
           min(first_et) AS first_type, min(last_et) AS last_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM (
      SELECT user_id,
             first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_et,
             last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_et
      FROM events WHERE user_id < 50
    ) t
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def w_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with full-partition frames, folded per user."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_et"),
            F.last("event_type").over(w).alias("last_et"),
        )
        .groupBy("user_id")
        .agg(
            F.min("first_et").alias("first_type"),
            F.min("last_et").alias("last_type"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "s_union_all_priorities",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    ORDER BY o_orderkey
    """,
)
def s_union_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) of two filtered scans."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "o_orderpriority")
    b = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_orderkey", "o_orderpriority")
    return a.unionByName(b).orderBy("o_orderkey")


@query(
    "s_intersect_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY custkey
    """,
)
def s_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both finished and open orders."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(o).orderBy("custkey")


@query(
    "s_except_customers_no_orders",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    ORDER BY c_custkey
    """,
)
def s_except_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers that never placed an order."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ordered = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.exceptAll(ordered.distinct()).distinct().orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation
# ---------------------------------------------------------------------------


@query(
    "a_rollup_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def a_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@query(
    "a_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def a_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping combinations in one pass (Expand + partial agg)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@query(
    "a_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst plan as cube)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@query(
    "a_pivot_returnflag_linestatus",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a_pivot_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no extra pass to discover values)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .orderBy("l_returnflag")
    )


@query(
    "a_stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)  AS sd_qty,
           round(var_samp(l_quantity), 4)     AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(min(l_extendedprice), 2)     AS min_price,
           round(max(l_extendedprice), 2)     AS max_price,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates + distinct agg (two-phase distinct rewrite)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.countDistinct("l_suppkey").alias("n_supp"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a_having_filter",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 20
    ORDER BY o_custkey
    """,
)
def a_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation predicate)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .filter(F.col("n_orders") >= 20)
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Subqueries / joins beyond equi
# ---------------------------------------------------------------------------


@query(
    "j_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def j_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join by both engines."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "j_not_in_anti",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
    ORDER BY s_suppkey
    """,
)
def j_not_in_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → left-anti join (null-safe: l_suppkey is non-null here)."""
    supp = load_table(spark, sf_dir, "supplier")
    hot = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49).select("l_suppkey")
    return (
        supp.join(hot, supp.s_suppkey == hot.l_suppkey, "left_anti")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "j_scalar_subquery",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
    ORDER BY c_custkey
    """,
)
def j_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (broadcast of a 1-row aggregate)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
        ORDER BY c_custkey
        """
    )


@query(
    "j_full_outer",
    oracle="""
    SELECT coalesce(a.k, b.k) AS nationkey,
           CAST(coalesce(a.n_cust, 0) AS BIGINT) AS n_cust,
           CAST(coalesce(b.n_supp, 0) AS BIGINT) AS n_supp
    FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) a
    FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) b
      ON a.k = b.k
    ORDER BY nationkey
    """,
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with coalesced keys."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, "k", "full_outer")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).cast("long").alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).cast("long").alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@query(
    "j_cross_join",
    oracle="""
    SELECT r.r_name, s.o_orderstatus, CAST(count(*) AS BIGINT) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r.r_name, s.o_orderstatus
    ORDER BY r_name, o_orderstatus
    """,
)
def j_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny inputs (BroadcastNestedLoopJoin)."""
    region = load_table(spark, sf_dir, "region")
    statuses = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return (
        region.crossJoin(statuses)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("r_name", "o_orderstatus")
    )


@query(
    "j_range_join_band",
    oracle="""
    SELECT p.p_partkey, b.bucket_id
    FROM part p
    JOIN (VALUES (0, 0.0, 950.0), (1, 950.0, 1050.0), (2, 1050.0, 100000.0))
         AS b(bucket_id, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    WHERE p.p_partkey < 200
    ORDER BY p_partkey, bucket_id
    """,
)
def j_range_join_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join against interval boundaries.

    Spark has no native range-join operator; with a small interval table a
    broadcast nested-loop join with range predicates is the right plan
    (each row tests k intervals). For large interval tables the scale path
    is bucketizing both sides and equi-joining on bucket (see
    operators/asof.py).
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    buckets = spark.createDataFrame(
        [(0, 0.0, 950.0), (1, 950.0, 1050.0), (2, 1050.0, 100000.0)],
        "bucket_id INT, lo DOUBLE, hi DOUBLE",
    )
    return (
        part.join(
            F.broadcast(buckets),
            (part.p_retailprice >= buckets.lo) & (part.p_retailprice < buckets.hi),
        )
        .select("p_partkey", "bucket_id")
        .orderBy("p_partkey", "bucket_id")
    )


@query(
    "j_asof_backward",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, c.ts AS click_ts_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def j_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): for each purchase, the latest click at or
    before it per user. Spark has no native ASOF operator — implemented
    as the union + last-ignorenulls window composition in
    operators/asof.py (one shuffle on the key, no range explosion);
    DuckDB's native ASOF JOIN is the oracle."""
    from ..operators.asof import asof_join_backward

    from ..sources.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join_backward(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["click_ts"],
    )
    return (
        out.select("event_id", "user_id", F.col("click_ts_asof"))
        .withColumnsRenamed({"click_ts_asof": "click_ts_asof"})
        .orderBy("event_id")
    )


@query(
    "w_moving_avg_range_frame",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS mv_avg_1h
    FROM events
    WHERE user_id < 10
    ORDER BY event_id
    """,
)
def w_moving_avg_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based moving average: RANGE frame over epoch seconds (all
    events in the trailing hour, however many rows that is) — the frame
    type ROWS can't express."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, W.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.avg("value").over(w), 4).alias("mv_avg_1h"),
        )
        .orderBy("event_id")
    )


@query(
    "w_cume_dist_nth",
    oracle="""
    SELECT s_suppkey,
           round(cume_dist() OVER w, 4) AS cd,
           round(nth_value(s_acctbal, 2) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_bal,
           CAST(s_nationkey AS INT) AS s_nationkey
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
)
def w_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value with a full-partition frame (completes the
    window-function family)."""
    supp = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        supp.select(
            "s_suppkey",
            F.round(F.cume_dist().over(w), 4).alias("cd"),
            F.round(F.nth_value("s_acctbal", 2).over(wfull), 2).alias("second_bal"),
            F.col("s_nationkey").cast("int").alias("s_nationkey"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "s_intersect_except_all",
    oracle="""
    SELECT 'inter' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    ) a
    UNION ALL
    SELECT 'except' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    ) b
    ORDER BY op, custkey
    """,
)
def s_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag (multiplicity-preserving) set ops."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    big = orders.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("custkey"))
    inter = f.intersectAll(big).select(F.lit("inter").alias("op"), "custkey")
    exc = f.exceptAll(big).select(F.lit("except").alias("op"), "custkey")
    return inter.unionByName(exc).orderBy("op", "custkey")


@query(
    "a_bool_aggs",
    oracle="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           CAST(bool_and(o_totalprice > 0) AS INT) AS all_positive,
           CAST(bool_or(o_orderpriority = '1-URGENT') AS INT) AS any_urgent
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def a_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: count_if / every / any (A5's any/all reductions
    as real aggregates, reference: etl/load.py:51,140)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.every(F.col("o_totalprice") > 0).cast("int").alias("all_positive"),
            F.some(F.col("o_orderpriority") == "1-URGENT").cast("int").alias("any_urgent"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "w_bounded_sliding_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(avg(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING), 4) AS centered_avg
    FROM lineitem
    WHERE l_suppkey < 3
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
)
def w_bounded_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded asymmetric ROWS frame (2 preceding .. 1 following) —
    centered smoothing over a unique ordering."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 3)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-2, 1)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.avg("l_quantity").over(w), 4).alias("centered_avg"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@query(
    "j_recursive_cte",
    oracle="""
    WITH RECURSIVE walk AS (
      SELECT c_custkey AS node, c_custkey AS anc, 0 AS depth
      FROM customer WHERE c_custkey <= 255
      UNION ALL
      SELECT node, CAST(floor(anc / 2) AS BIGINT) AS anc, depth + 1 AS depth
      FROM walk WHERE anc > 1
    )
    SELECT node, CAST(max(depth) AS INT) AS depth_to_root,
           CAST(count(*) AS BIGINT) AS n_ancestors
    FROM walk
    GROUP BY node
    ORDER BY node
    """,
)
def j_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk each node of an
    implicit binary hierarchy (parent = floor(key/2)) up to the root,
    emitting depth and ancestor count — the org-chart / BOM-traversal
    query shape, executed natively by both engines' recursive union.

    Scale note: Spark executes this as an iterative loop of unions —
    cost is depth × (frontier join); depth here is log2(key) ≤ 8. For
    unbounded-diameter graphs the iterative operator with checkpointing
    (operators/components.py) is the right tool; the recursive CTE is
    for bounded hierarchy walks expressed declaratively."""
    cust = load_table(spark, sf_dir, "customer")
    cust.filter(F.col("c_custkey") <= 255).select("c_custkey").createOrReplaceTempView(
        "rc_customer"
    )
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT c_custkey AS node, c_custkey AS anc, 0 AS depth
          FROM rc_customer
          UNION ALL
          SELECT node, CAST(floor(anc / 2) AS BIGINT) AS anc, depth + 1 AS depth
          FROM walk WHERE anc > 1
        )
        SELECT node, CAST(max(depth) AS INT) AS depth_to_root,
               CAST(count(*) AS BIGINT) AS n_ancestors
        FROM walk
        GROUP BY node
        ORDER BY node
        """
    )


@query(
    "j_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT nullif(o_orderpriority, '3-MEDIUM') AS k, o_orderkey
      FROM orders WHERE o_orderkey <= 2000
    ),
    b AS (
      SELECT nullif(o_orderpriority, '3-MEDIUM') AS k, CAST(count(*) AS BIGINT) AS nb
      FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 4000
      GROUP BY 1
    )
    SELECT a.k AS k, CAST(count(*) AS BIGINT) AS n_rows, max(b.nb) AS nb
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    ORDER BY k
    """,
)
def j_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — the semantics needed when the join key is a
    derived optional attribute and NULL means a real category, not
    'unknown'. Spark plans eqNullSafe as a hash join (the key is
    wrapped in a null-coalescing struct), so it stays shuffle/broadcast
    — no nested-loop penalty."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.nullif("o_orderpriority", F.lit("3-MEDIUM"))
    a = orders.filter(F.col("o_orderkey") <= 2000).select(k.alias("k"))
    b = (
        orders.filter(
            (F.col("o_orderkey") > 2000) & (F.col("o_orderkey") <= 4000)
        )
        .groupBy(k.alias("k"))
        .agg(F.count("*").alias("nb"))
    )
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.k").eqNullSafe(F.col("b.k")))
        .groupBy(F.col("a.k").alias("k"))
        .agg(F.count("*").alias("n_rows"), F.max("nb").alias("nb"))
        .orderBy("k")
    )


@query(
    "j_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT user_id, event_id AS a_id, epoch(ts) AS a_s,
             epoch(ts) + value * 60 AS a_e
      FROM events WHERE event_type = 'click'
        AND epoch(ts) + value * 60 >= epoch(ts)
    ),
    b AS (
      SELECT user_id, event_id AS b_id, epoch(ts) AS b_s,
             epoch(ts) + value * 60 AS b_e
      FROM events WHERE event_type = 'purchase'
        AND epoch(ts) + value * 60 >= epoch(ts)
    )
    SELECT a.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_overlaps
    FROM a JOIN b ON a.user_id = b.user_id
                 AND a.a_s <= b.b_e AND b.b_s <= a.a_e
    GROUP BY a.user_id
    ORDER BY user_id
    """,
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via grid binning
    (operators/intervals.py:interval_overlap_join): click activity
    windows × purchase windows per user. The oracle states the naive
    inequality join; the engine bins intervals onto a 1-hour grid and
    equi-joins on (user, bin) — same pairs, no nested loop; both sides
    drop degenerate end<start intervals (empty by the closed-bounds
    convention — the oracle guards match the operator). The count
    compare proves the binned rewrite loses/duplicates nothing."""
    from ..operators.intervals import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("double").alias("s"),
        (F.col("ts").cast("double") + F.col("value") * 60).alias("e"),
        "event_type",
    )
    a = base.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("a_id"),
        F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = base.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("b_id"),
        F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )
    pairs = interval_overlap_join(
        a, b, "user_id", ("a_s", "a_e"), ("b_s", "b_e"), bin_width=3600.0
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count("*").alias("n_overlaps"))
        .orderBy("user_id")
    )


@query(
    "j_asof_forward",
    oracle="""
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, p.ts AS purchase_ts_asof
    FROM clicks c
    ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id
    """,
)
def j_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (forward): for each click, the next purchase at or
    after it per user (operators/asof.py:asof_join_forward — the
    first-ignorenulls-over-following mirror of the backward op). DuckDB
    native ASOF with a <= inequality is the oracle."""
    from ..operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    out = asof_join_forward(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="purchase_ts",
        value_cols=["purchase_ts"],
    )
    return out.select("event_id", "user_id", "purchase_ts_asof").orderBy("event_id")


@query(
    "j_lateral_topk",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, round(l.l_quantity, 2) AS top_qty
    FROM orders o,
    LATERAL (SELECT l_linenumber, l_quantity FROM lineitem
             WHERE l_orderkey = o.o_orderkey
             ORDER BY l_quantity DESC, l_linenumber LIMIT 1) l
    WHERE o.o_orderkey <= 500
    ORDER BY o.o_orderkey
    """,
)
def j_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 3.4+/DuckDB): for each order,
    its heaviest line item — the per-row dependent subquery in FROM.
    Catalyst DECORRELATES this into a ranked join (same physical shape
    as the window top-1 the engine would write by hand), so the
    friendly SQL costs nothing extra at scale — no per-row execution
    ever happens."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lat_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber, round(l.l_quantity, 2) AS top_qty
        FROM lat_orders o,
        LATERAL (SELECT l_linenumber, l_quantity FROM lat_lineitem
                 WHERE l_orderkey = o.o_orderkey
                 ORDER BY l_quantity DESC, l_linenumber LIMIT 1) l
        WHERE o.o_orderkey <= 500
        ORDER BY o.o_orderkey
        """
    )


@query(
    "a_median_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(floor(100 * median(l_quantity)) AS BIGINT) AS median_qty_x100,
           CAST(floor(100 * percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)) AS BIGINT) AS p25_qty_x100,
           CAST(floor(100 * percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)) AS BIGINT) AS p75_qty_x100,
           CAST(floor(100 * (percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)
                             - percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity))) AS BIGINT) AS iqr_x100
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a_median_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / quartiles / IQR per group (percentile_cont
    semantics — linear interpolation between order statistics).

    Determinism discipline: quantities are integral, the interpolation
    fraction at p ∈ {.25, .5, .75} is a dyadic rational, so every
    interpolated value is exactly representable — both engines produce
    bit-identical doubles, and the ×100 floor emits integers for the
    hash compare.

    Scale shape: Spark's exact percentile aggregate buffers per-group
    values; per-group cardinality here is bounded by the distinct
    quantity domain after partial aggregation. At unbounded-domain 100
    TB scale the approximate twin (a_approx_sketches'
    approx_percentile, t-digest) is the right tool; this query is the
    exact-semantics member of that pair.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.floor(100 * F.median("l_quantity")).alias("median_qty_x100"),
            F.floor(100 * F.percentile("l_quantity", F.lit(0.25))).alias("p25_qty_x100"),
            F.floor(100 * F.percentile("l_quantity", F.lit(0.75))).alias("p75_qty_x100"),
            F.floor(
                100
                * (
                    F.percentile("l_quantity", F.lit(0.75))
                    - F.percentile("l_quantity", F.lit(0.25))
                )
            ).alias("iqr_x100"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "j_asof_nearest",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           CASE WHEN f.ts IS NULL
                  OR (b.ts IS NOT NULL
                      AND epoch(p.ts) - epoch(b.ts) <= epoch(f.ts) - epoch(p.ts))
                THEN b.ts ELSE f.ts END AS click_ts_nearest,
           CASE WHEN f.ts IS NULL
                  OR (b.ts IS NOT NULL
                      AND epoch(p.ts) - epoch(b.ts) <= epoch(f.ts) - epoch(p.ts))
                THEN 'b' ELSE 'f' END AS nearest_dir
    FROM purchases p
    ASOF LEFT JOIN clicks b ON p.user_id = b.user_id AND p.ts >= b.ts
    ASOF LEFT JOIN clicks f ON p.user_id = f.user_id AND p.ts <= f.ts
    ORDER BY p.event_id
    """,
)
def j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: for each purchase, the temporally CLOSEST
    click per user in either direction (ties backward) — the
    sensor-fusion alignment asof_backward/forward can't express alone.
    operators/asof.py:asof_join_nearest does both direction carries
    from ONE tagged union and one key-partitioned sort (same single
    shuffle as one as-of); the oracle chains DuckDB's two native ASOF
    directions and picks with the identical epoch arithmetic."""
    from ..operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join_nearest(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["click_ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("click_ts_nearest"),
        F.col("_nearest_dir").alias("nearest_dir"),
    ).orderBy("event_id")


# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession

@query(
    "j_band_join",
    oracle="""
    SELECT e.event_id, CAST(count(c.event_id) AS BIGINT) AS n_nearby_clicks
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND c.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    ORDER BY e.event_id
    """,
)
def j_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-band join: for every error event, how many clicks the same
    user made within +/-5 minutes — the incident-context join (what was
    the user doing around the failure?).

    Scale shape: a naive theta-join on the time inequality explodes; the
    engine form buckets both sides into 5-minute epochs and joins on
    (user_id, bucket) for the bucket and its two neighbors — every true
    +/-5 min pair falls in one of those three bucket alignments, so the
    equi-join bounds candidates to per-bucket volumes and the exact
    BETWEEN predicate filters the few false candidates. One shuffle
    on the composite key, no range explosion; skewed users salt like
    any hot key."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / F.lit(300)).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"), bucket.alias("b")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"), bucket.alias("cb"),
    )
    # candidate generation: click bucket must be error bucket +/- 1
    shifted = errors.withColumn("nb", F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)))
    joined = shifted.join(
        clicks,
        (F.col("e_user") == F.col("c_user")) & (F.col("nb") == F.col("cb")),
        "left",
    ).filter(
        F.col("c_ts").isNull()
        | F.col("c_ts").between(
            F.col("e_ts") - F.expr("INTERVAL 5 MINUTES"),
            F.col("e_ts") + F.expr("INTERVAL 5 MINUTES"),
        )
    )
    return (
        joined.groupBy("event_id")
        .agg(F.count("c_id").alias("n_nearby_clicks"))
        .orderBy("event_id")
    )


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

@query(
    "j_salted_skew_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join demonstrated end-to-end: lineitem (probe)
    joins orders (build) through operators/skew.py's salted_join with
    fan-out 4 — the static remedy a_skew_report prescribes when one
    key dominates a shuffle so badly that even AQE's split partitions
    re-skew. The ORACLE is the PLAIN join: salting is only correct if
    it is invisible in the result, so the gate pins exactly that
    equivalence (every probe row carries one salt and meets each build
    row once; the operator rejects right/full-outer, where replicated
    unmatched build rows would surface n_salt times).

    Scale shape: the build side is replicated n_salt x (a bandwidth
    cost paid to spread the hot key over n_salt reducers); the probe
    side's salt is a narrow projection. The per-priority aggregate
    collapses the join output so the gate compares 5 integer rows.
    """
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, key="l_orderkey", n_salt=4, how="inner")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )

_IU_PAD_S = 900  # each event spans [ts, ts + 15 min)

@query(
    "j_interval_union",
    oracle=f"""
    WITH iv AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) + {_IU_PAD_S} AS BIGINT) AS e
      FROM events WHERE event_type IN ('click', 'view')
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), -1) THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             CAST(sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
             ) AS BIGINT) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island,
             CAST(min(s) AS BIGINT) AS span_start,
             CAST(max(e) AS BIGINT) AS span_end,
             CAST(count(*) AS BIGINT) AS n_events
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(span_end - span_start) AS BIGINT) AS total_span_s,
           CAST(max(n_events) AS BIGINT) AS busiest_span_events
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def j_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union: each click/view event claims a 15-minute span;
    overlapping spans per user merge into maximal islands
    (gaps-and-islands via the running-max-end flag), reported as
    per-user span counts and total covered seconds — the
    interval-algebra complement of j_interval_overlap (which JOINS
    intervals; this COALESCES them) and the set-theoretic core of
    "time actually engaged" metrics (b_sessionize's gap rule is the
    special case where spans are points + timeout).

    Scale shape: one user-keyed window sort does everything — the
    new-island flag (running max of end over the sorted prefix) and
    the island id (running sum of flags) share the same partitioning
    and ordering, so both Window operators ride ONE user-keyed
    exchange (pinned by test_round4c's single-exchange plan test; the
    second sort is partition-local over already-sorted data); the
    merge groupBy reuses the user key. Pure integer epoch arithmetic;
    the (s, e) ordering tiebreak pins duplicate-start rows.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.floor(F.col("ts").cast("double")).cast("long").alias("s"),
        (F.floor(F.col("ts").cast("double")) + _IU_PAD_S).cast("long").alias("e"),
    )
    w_order = W.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w_order.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("int"),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_order))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count("*").alias("n_events"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start")).alias("total_span_s"),
            F.max("n_events").alias("busiest_span_events"),
        )
        .orderBy("user_id")
    )

_TOL_S = 600  # 10 minutes

@query(
    "j_asof_tolerance",
    oracle=f"""
    WITH err AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ),
    clk AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    matched AS (
      SELECT e.event_id, e.user_id, e.ts,
             (SELECT max(c.ts) FROM clk c
              WHERE c.user_id = e.user_id AND c.ts <= e.ts) AS last_click
      FROM err e
    )
    SELECT event_id, user_id, ts,
           CASE WHEN epoch(ts) - epoch(last_click) <= {_TOL_S}
                THEN last_click END AS click_ts_asof
    FROM matched
    ORDER BY event_id
    """,
)
def j_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas ``merge_asof(tolerance=)``
    parity): each error event carries its user's most recent click,
    but only if that click is at most 10 minutes old — older context
    is noise, and the tolerance turns "latest ever" into "latest
    RELEVANT" (the incident-triage join: what was the user doing just
    before the error?).

    Scale shape: identical to j_asof_backward — one union + one
    key-partitioned ordered window, no join node at all; the
    tolerance is a post-carry projection (no second window). The
    carried value here is the reference timestamp itself, so the
    duplicate-timestamp tiebreak is moot by construction (max of
    equal timestamps is that timestamp — the ADVICE-documented
    immunity pattern).
    """
    from ..operators.asof import asof_join_tolerance

    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join_tolerance(
        err, clk, on="user_id", left_time="ts", right_time="click_ts",
        value_cols=[], tolerance_s=_TOL_S,
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("click_ts_asof")
    ).orderBy("event_id")


# ===========================================================================
# section consolidated from plans/round8_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

_PSJ_ROWS_PER_REDUCER = 4

_PSJ_ORACLE = """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""

@query("j_planned_skew_join", oracle=_PSJ_ORACLE)
def j_planned_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ADAPTIVE salted join: lineitem (probe) joins orders
    (build) through operators/skew.py:planned_salted_join — each key's
    salt factor is ceil(measured_count / rows_per_reducer), so ONLY
    measured-hot keys replicate build rows, each by exactly the factor
    its size demands. The ORACLE is the PLAIN join (the salting-is-
    invisible contract j_salted_skew_join pins for the uniform variant).

    Measured gap this closes (round-7 verdict item 6): two halves of
    the skew remedy existed but never met — p_partition_skew_planner
    MEASURES per-key skew and derives hot_key_salt_factor, yet nothing
    consumed it per-key; j_salted_skew_join APPLIES salting but
    uniformly, replicating the whole build side n_salt× (the measured
    driver of its 3.8× 10×-probe ratio — every cold key pays the
    bandwidth for the hot ones). planned_salted_join is the planner's
    formula applied per key: replication cost is proportional to the
    skew being fixed, not to the build-table size.

    Scale shape: the hot-key factor table is bounded by
    n_rows / rows_per_reducer BY CONSTRUCTION (each hot key exceeds the
    target), i.e. at most the task count already being planned for —
    broadcast-safe at any corpus size, and in production it is the
    planner census, maintained, not recomputed per join (the operator
    accepts it precomputed via ``factors=``). The inline derivation
    here is one map-side-combined count groupBy on the join key. The
    per-priority aggregate collapses the join output to 5 integer rows.
    """
    from ..operators.skew import planned_salted_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = planned_salted_join(
        li, orders, key="l_orderkey", rows_per_reducer=_PSJ_ROWS_PER_REDUCER
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )
