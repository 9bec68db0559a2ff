"""TPC-H-style relational queries (north star, SURVEY.md §7.2 step 7).

These exercise the full scan → filter → join → aggregate → sort → limit
surface the reference lacks (SURVEY.md §2.3-§2.6 record the absences).
Written DataFrame-first; Catalyst handles predicate pushdown into the
parquet scans, column pruning, partial aggregation, and join selection.

Join strategy: only the genuinely bounded dimensions (region: 5 rows,
nation: 25 rows, and derived per-key aggregates that are bounded by a
dimension's cardinality) carry an explicit ``F.broadcast`` hint.
customer/supplier/part grow linearly with scale factor — a pinned hint
on them overrides AQE's size check and OOMs the driver at 100×; AQE
(`spark.sql.adaptive.autoBroadcastJoinThreshold`) promotes them to
broadcast at small SF on its own and falls back to shuffle joins at
scale. Pinned by ``test_plan_quality.py``.

Money discipline (why every money output is a scaled BIGINT):
the driver's correctness gate hashes cell values; a float aggregate
rounded to 2 decimals can land on a .005 boundary where Spark's and
DuckDB's different summation orders round differently (this exact
failure hit q10 in round 2). All money inputs in the testdata are
cents-exact doubles and discount/tax are 2-decimal fractions, so every
money expression here is converted to EXACT integer arithmetic at the
row level (cents ``floor(x*100 + 0.5)`` → BIGINT; discounted price is
``cents × (100-disc_pct)`` = dollars×10⁴; charge is
``... × (100+tax_pct)`` = dollars×10⁶) and summed as BIGINT — both
engines produce bit-identical integers regardless of sum order.
Averages/ratios are emitted as ``floor(scale * int / int)``: the
operands are identical exact integers, so the IEEE double division and
floor are bit-identical cross-engine (no round() semantics involved).
Int64 headroom: charge×10⁶ sums reach ~4e17 at sf0.1, bound ~9.2e18 —
safe through sf10 per group; at larger SF the gate would move to
DECIMAL(38) on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


def _cents(col: str) -> Column:
    """Exact integer cents from a cents-exact double column.

    floor(x*100 + 0.5), not round(): Spark's round() goes through a
    per-value BigDecimal (measurably slower in the agg hot loop), while
    floor is a plain codegen intrinsic. For cents-exact inputs x*100
    lands within ~1e-9 of an integer — never at a .5 boundary — so the
    +0.5/floor recovers that exact integer for positive AND negative
    values, identically in Spark and DuckDB."""
    return F.floor(F.col(col) * 100 + 0.5)


def _pct(col: str) -> Column:
    """Exact integer percent from a 2-decimal fraction column (0.07 → 7)."""
    return F.floor(F.col(col) * 100 + 0.5)


# Per-row exact-integer money expressions (see module docstring).
# Functions, not module constants: building a Column requires an active
# SparkContext, which doesn't exist at import time.
def _disc_x10k() -> Column:
    return _cents("l_extendedprice") * (100 - _pct("l_discount"))


def _charge_x1m() -> Column:
    return _disc_x10k() * (100 + _pct("l_tax"))

# The same expressions in DuckDB SQL.
_SQL_EP_CENTS = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_SQL_DISC_X10K = f"{_SQL_EP_CENTS} * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
_SQL_CHARGE_X1M = f"{_SQL_DISC_X10K} * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)      AS sum_qty,
           CAST(sum({_SQL_EP_CENTS}) AS BIGINT)                        AS sum_base_price_cents,
           CAST(sum({_SQL_DISC_X10K}) AS BIGINT)                       AS sum_disc_price_x10k,
           CAST(sum({_SQL_CHARGE_X1M}) AS BIGINT)                      AS sum_charge_x1m,
           CAST(floor(10000.0 * CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                      / count(*)) AS BIGINT)                           AS avg_qty_x10k,
           CAST(floor(100.0 * CAST(sum({_SQL_EP_CENTS}) AS BIGINT)
                      / count(*)) AS BIGINT)                           AS avg_price_x10k,
           CAST(floor(100.0 * CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
                      / count(*)) AS BIGINT)                           AS avg_disc_x10k,
           CAST(count(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: grouped pricing summary — partial+final hash agg, 8 aggregates.

    Scan-side: only 7 of 11 lineitem columns are read (column pruning) and
    the shipdate predicate is pushed to parquet. One shuffle (on the 2 group
    keys, ~6 groups → map-side partial agg does nearly all the work).
    All money/avg outputs are exact scaled integers (module docstring).
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.floor(F.col("l_quantity") + 0.5)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_price_cents"),
            F.sum(_disc_x10k()).alias("sum_disc_price_x10k"),
            F.sum(_charge_x1m()).alias("sum_charge_x1m"),
            F.floor(10000.0 * F.sum(qty) / F.count("*")).alias("avg_qty_x10k"),
            F.floor(100.0 * F.sum(_cents("l_extendedprice")) / F.count("*")).alias("avg_price_x10k"),
            F.floor(100.0 * F.sum(_pct("l_discount")) / F.count("*")).alias("avg_disc_x10k"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_top_revenue_orders",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(sum({_SQL_DISC_X10K}) AS BIGINT) AS revenue_x10k,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_x10k DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + top-k (TakeOrderedAndProject).

    lineitem↔orders is the one guaranteed shuffle; customer is left to
    AQE (broadcast at small SF, shuffle at scale — no pinned hint). The
    final sort is rewritten by Catalyst to a per-partition top-k +
    driver merge, not a full sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_x10k()).alias("revenue_x10k"))
        .select("o_orderkey", "revenue_x10k", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_x10k"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({_SQL_DISC_X10K}) AS BIGINT) AS revenue_x10k
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue_x10k DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join + agg + sort.

    region→nation stays a pinned broadcast chain (bounded: 5/25 rows);
    customer and supplier are SF-scaled, so their join strategy is left
    to AQE. orders↔lineitem is the one unavoidable fact shuffle.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_x10k()).alias("revenue_x10k"))
        .orderBy(F.desc("revenue_x10k"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(sum({_SQL_EP_CENTS} * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_x10k
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+scalar agg — everything pushes to the scan.

    At 100 TB this is the canonical pushdown test: all four predicates
    reach parquet row-group pruning; no shuffle at all (single global agg
    via partial aggregation). Revenue = price×discount, exact ×10⁴.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_cents("l_extendedprice") * _pct("l_discount")).alias("revenue_x10k"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_SQL_DISC_X10K}) AS BIGINT) AS revenue_x10k,
           CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS c_acctbal_cents, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue_x10k DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking (join + agg + top-k).

    Round 2's driver hash failure lived here: revenue rounded to 2
    decimals hit a .005 sum-order boundary. Now exact ×10⁴ integers on
    both sides — hash-stable by construction — and the top-k ORDER BY
    uses the exact integer, so the selected 20 rows are engine-invariant
    too. customer join is AQE-decided (no pinned broadcast).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_x10k()).alias("revenue_x10k"))
        .select(
            "c_custkey",
            "c_name",
            "revenue_x10k",
            F.floor(F.col("c_acctbal") * 100 + 0.5).alias("c_acctbal_cents"),
            "n_name",
        )
        .orderBy(F.desc("revenue_x10k"), "c_custkey")
        .limit(20)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS with a non-equi correlated predicate → left-semi
    join with a composite condition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q12_shipmode_buckets",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q12_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation (CASE inside sum)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(is_high.cast("int")).cast("long").alias("high_line_count"),
            F.sum((~is_high).cast("int")).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT CAST(floor(1000000.0
                 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_DISC_X10K} ELSE 0 END) AS BIGINT)
                 / CAST(sum({_SQL_DISC_X10K}) AS BIGINT)) AS BIGINT) AS promo_share_ppm
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — ratio of conditional aggregates.

    Share emitted in exact parts-per-million: floor of an IEEE division
    of two bit-identical exact integers (module docstring). part is
    SF-scaled → join strategy left to AQE.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_x10k()).otherwise(F.lit(0).cast("long"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.floor(1000000.0 * F.sum(promo) / F.sum(_disc_x10k())).alias("promo_share_ppm")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS o_totalprice_cents,
           CAST(t.sum_qty AS BIGINT) AS sum_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 150) t ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o_totalprice_cents DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders — agg-subquery join + top-k.

    sum_qty is an exact BIGINT (quantity is integral), o_totalprice is
    exact cents; the top-k ORDER BY uses the integer cents, so result
    selection is engine-invariant. customer join is AQE-decided.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor(F.col("l_quantity") + 0.5)).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + 0.5).alias("o_totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice_cents"), "o_orderkey")
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(sum({_SQL_DISC_X10K}) AS BIGINT) AS revenue_x10k
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-column join predicates (tests CNF
    conversion — Catalyst pushes the common p_partkey equi-key and keeps
    the OR residual as a post-join filter). part join is AQE-decided."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(F.sum(_disc_x10k()).alias("revenue_x10k"))


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(sum({_SQL_DISC_X10K}) AS BIGINT) AS revenue_x10k
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2') AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, year(l.l_shipdate)
    ORDER BY cust_nation, supp_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: cross-nation shipping volume — self-joined dimension
    (nation twice under different roles) + year extraction + agg.
    nation (25 rows) keeps pinned broadcasts; customer/supplier are
    AQE-decided."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cn_key)
        .join(F.broadcast(sn), supp.s_nationkey == sn.sn_key)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_x10k()).alias("revenue_x10k"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(floor(CAST(sum({_SQL_EP_CENTS}) AS BIGINT) / 7.0) AS BIGINT) AS avg_yearly_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated average subquery → decorrelated as a
    per-partkey aggregate joined back (the plan Catalyst produces for the
    SQL form, written out explicitly).

    The threshold compare stays in floats safely: quantities are
    integral, integer-valued double sums are EXACT in any order, so
    avg and 0.2*avg are bit-identical cross-engine. part is AQE-decided;
    the per-partkey avg frame is part-bounded but derived from lineitem,
    also AQE-decided.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.ap_key)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.floor(F.sum(_cents("l_extendedprice")) / 7.0).alias("avg_yearly_cents"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS ab_cents
      FROM customer WHERE c_acctbal > 0.0
    ),
    eligible AS (
      SELECT substr(c.c_name, 10, 1) AS cntrycode,
             CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
      FROM customer c, avg_bal
      WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) > avg_bal.ab_cents
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    )
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(acctbal_cents) AS BIGINT) AS totacctbal_cents
    FROM eligible
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: scalar subquery + NOT EXISTS anti-join + substring
    bucketing over customers with no orders.

    The avg-balance threshold compares exact integer cents against an
    avg of exact integers (bit-identical cross-engine: integer-valued
    sums are exact in any order, division is IEEE). avg_bal (1 row) keeps
    its broadcast.
    """
    cust = load_table(spark, sf_dir, "customer")
    acct_cents = F.floor(F.col("c_acctbal") * 100 + 0.5)
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_custkey")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg(acct_cents).alias("ab_cents"))
    )
    eligible = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(acct_cents > F.col("ab_cents"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        eligible.groupBy(F.substring("c_name", 10, 1).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(acct_cents).alias("totacctbal_cents"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — left outer join with
    a join-side predicate (kept out of the WHERE so unmatched customers
    count as 0), double aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(floor(1000000.0
                * CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_SQL_DISC_X10K} ELSE 0 END) AS BIGINT)
                / CAST(sum({_SQL_DISC_X10K}) AS BIGINT)) AS BIGINT) AS mkt_share_ppm
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA'
    GROUP BY year(o.o_orderdate)
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — dual-role nation dimension,
    conditional revenue ratio per year in exact parts-per-million.
    nation/region keep pinned broadcasts; customer/supplier are
    AQE-decided."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    nation3_rev = F.when(F.col("supp_nation") == "NATION_3", _disc_x10k()).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.floor(1000000.0 * F.sum(nation3_rev) / F.sum(_disc_x10k())).alias("mkt_share_ppm")
        )
        .orderBy("o_year")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_SQL_DISC_X10K}) AS BIGINT) AS total_revenue_x10k
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_x10k
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_x10k = (SELECT max(total_revenue_x10k) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier via a reused view (registered as a temp
    view + scalar-subquery max — the view-DDL path of the SQL API).

    The revenue view carries exact ×10⁴ integers, so the `= max(...)`
    equality is an exact integer compare — no float-tie ambiguity in
    which supplier wins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_x10k()).alias("total_revenue_x10k"))
    )
    rev.createOrReplaceTempView("revenue_view")
    supp.createOrReplaceTempView("supplier_view")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, r.total_revenue_x10k
        FROM supplier_view s JOIN revenue_view r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue_x10k = (SELECT max(total_revenue_x10k) FROM revenue_view)
        ORDER BY s_suppkey
        """
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 10, 15, 20)
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count by part attributes with negated
    and IN-list predicates. part is AQE-decided."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@query(
    "q20_excess_inventory_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 2500
    )
    ORDER BY s_suppkey
    """,
)
def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over an aggregated-HAVING subquery → semi join
    against the qualifying key set.

    `heavy` is bounded by supplier-key cardinality but SF-scaled, so no
    pinned hint — AQE broadcasts it while it fits. The HAVING compare is
    float-safe (integral quantities sum exactly in any order).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 2500)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_supplier_shape",
    oracle="""
    WITH los AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM los l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 SHAPE on the available columns: suppliers who were the
    SOLE late shipper on multi-supplier orders. The spec's
    receiptdate/commitdate are absent from the testdata (COVERAGE.md),
    so "late" is re-keyed to shipdate > orderdate + 90 days — the
    operator shape (correlated EXISTS on a different-key row plus
    NOT EXISTS on a different-key row of a derived set, then agg +
    top-k) is the spec's, which is what this suite exercises.

    Plan shape: instead of decorrelating to semi/anti self-joins (two
    extra shuffles of (order, supplier)-distinct frames), the EXISTS /
    NOT EXISTS pair collapses into window counts over the order key:
    per (order, supplier) fold the late flag, then n_suppliers and
    n_late_suppliers as window aggregates — "sole late on a
    multi-supplier order" is a row predicate. One fact join, one
    aggregate, one window; the aggregate's (orderkey, suppkey)
    partitioning feeds the orderkey window without loss of parallelism.
    No pinned broadcasts (all sides are SF-scaled); the oracle stays in
    the EXISTS form, pinning that both formulations agree.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier")
    is_late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(is_late).alias("is_late"))
    )
    w = W.partitionBy("l_orderkey")
    sole_late = (
        per_os.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        sole_late.join(supp, sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
             s.s_name AS s_name, n.n_name AS n_name,
             CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_cents,
             min(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS supply_cost_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'AMERICA'
      GROUP BY l.l_partkey, l.l_suppkey, s.s_name, n.n_name, s.s_acctbal
    )
    SELECT sp.s_acctbal_cents, sp.s_name, sp.n_name,
           sp.partkey AS p_partkey, sp.suppkey AS s_suppkey,
           sp.supply_cost_cents
    FROM supply sp
    JOIN part p ON p.p_partkey = sp.partkey
    WHERE p.p_type = 'ECONOMY' AND p.p_size < 25
      AND sp.supply_cost_cents = (
        SELECT min(sp2.supply_cost_cents) FROM supply sp2
        WHERE sp2.partkey = sp.partkey
      )
    ORDER BY sp.s_acctbal_cents DESC, sp.n_name, sp.s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part (correlated-min
    subquery), adapted to the testdata schema — there is no partsupp
    table, so the part-supplier supply relation is derived from
    lineitem (min observed extendedprice per (part, supplier)), exactly
    as q20 derives availability (reference has no relational joins at
    all — SURVEY.md §2.3).

    Plan shape: the correlated ``= min(...) per part`` is a window min
    over ``partkey`` on the aggregated supply frame — no decorrelated
    self-join, no second shuffle of lineitem. The region filter reaches
    the supplier side BEFORE the fact join (supplier × broadcast
    nation⋈region), so the big join's build side is pre-shrunk 1/5.
    The selective part predicate (ECONOMY & size<25, ~8% of parts)
    pre-prunes lineitem as a SEMI-JOIN on partkey (AQE-chosen build) BEFORE the
    supply aggregation (r11): the per-partkey window min is computed
    over all suppliers of a SURVIVING partkey either way, so filtering
    by partkey before or after the min is equivalent — but filtering
    first shrinks the aggregation/window input ~12× (measured at all
    three SFs) and makes the final part join redundant (part
    contributes no output columns; p_partkey is unique).
    Money outputs are exact cents BIGINTs (module docstring); ORDER BY
    carries (partkey, suppkey) as the deterministic tiebreak.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", _cents("s_acctbal").alias("s_acctbal_cents"))
    )
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") < 25))
        .select("p_partkey")
    )
    # no broadcast hint: part is SF-scaled (the repo's no-forced-
    # broadcast rule) — AQE picks broadcast for the filtered key
    # projection whenever it fits, shuffle semi-join otherwise
    supply = (
        li.join(
            part_keys,
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name", "s_acctbal_cents")
        .agg(F.min(_cents("l_extendedprice")).alias("supply_cost_cents"))
    )
    min_w = W.partitionBy("l_partkey")
    return (
        supply.withColumn("min_cost", F.min("supply_cost_cents").over(min_w))
        .filter(F.col("supply_cost_cents") == F.col("min_cost"))
        .select(
            "s_acctbal_cents",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "supply_cost_cents",
        )
        .orderBy(
            F.desc("s_acctbal_cents"), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(sum({_SQL_DISC_X10K}
                    - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l.l_quantity + 0.5) AS BIGINT) * 100
                ) AS BIGINT) AS profit_x10k
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and year.
    Adapted: no partsupp, so unit cost is part.p_retailprice (the only
    per-part price in the testdata) instead of ps_supplycost — profit =
    discounted revenue − retail_cost × qty, all in exact ×10⁴ integers.

    Plan shape: the selective ``p_name LIKE`` filter prunes part BEFORE
    its join (Catalyst pushes it into the parquet scan); part/supplier/
    orders joins are AQE-decided (SF-scaled sides, no pinned hints);
    nation stays a pinned broadcast (25 rows). Group-by lands on
    (nation, year) — 25×7 groups, so partial aggregation collapses
    nearly everything map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = _disc_x10k() - _cents("p_retailprice") * F.floor(
        F.col("l_quantity") + 0.5
    ) * 100
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("profit_x10k"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH vals AS (
      SELECT l.l_partkey AS p_partkey,
             CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT v.p_partkey, v.value_cents
    FROM vals v
    WHERE v.value_cents * 1000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM vals)
    ORDER BY value_cents DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value exceeds 0.1% of the
    national total (scalar-subquery threshold). Adapted: value is
    Σ extendedprice × qty from lineitem restricted to one nation's
    suppliers (no partsupp in the testdata).

    Plan shape: ONE scan/aggregation of the filtered fact builds
    ``vals``; the grand total is a 1-row aggregate of that same frame,
    broadcast into the threshold filter (bounded — the only kind of
    frame that may carry a pinned hint). The threshold compare is exact
    integer math: ``value_cents * 1000 > total_cents`` — no float
    fraction. Int64 headroom: value sums reach ~3e13 at sf1; ×1000 =
    3e16 « 9.2e18, safe through ~sf100.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey")
    )
    row_value = _cents("l_extendedprice") * F.floor(F.col("l_quantity") + 0.5)
    vals = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(row_value).alias("value_cents"))
    )
    total = vals.agg(F.sum("value_cents").alias("total_cents"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("p_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )
