"""Scalar/array/map/date function surface queries (north star breadth).

The reference uses no array, map, JSON, or date-part functions
(SURVEY.md §2.7 records the absences); these queries cover the standard
Spark surface a user of the full engine expects, each with a DuckDB
oracle (dialect differences — dayofweek bases, list lambdas — absorbed
on the oracle side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


@query(
    "f_array_functions",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           CAST(len(w) AS INT) AS n_words,
           CAST(len(list_filter(w, x -> length(x) > 4)) AS INT) AS n_long,
           coalesce(array_to_string(list_sort(list_distinct(list_transform(
             list_filter(w, x -> length(x) <= 3), x -> upper(x)))), ','), '') AS short_upper,
           CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END AS has_spark
    FROM t
    ORDER BY doc_id
    """,
)
def f_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform/filter/sort/distinct/
    contains — all JVM-side lambdas, no UDF."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    w = F.split("text", " ")
    short_upper = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.transform(F.filter(w, lambda x: F.length(x) <= 3), lambda x: F.upper(x))
            )
        ),
        ",",
    )
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.filter(w, lambda x: F.length(x) > 4)).alias("n_long"),
        short_upper.alias("short_upper"),
        F.array_contains(w, "spark").cast("int").alias("has_spark"),
    ).orderBy("doc_id")


@query(
    "f_map_functions",
    oracle="""
    WITH t AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS total
      FROM events GROUP BY event_type
    )
    SELECT map_keys AS event_type, round(map_vals, 2) AS avg_value
    FROM (
      SELECT unnest(map_keys(m)) AS map_keys, unnest(map_values(m)) AS map_vals
      FROM (SELECT map(list(event_type ORDER BY event_type),
                       list(total / n ORDER BY event_type)) AS m FROM t)
    )
    ORDER BY event_type
    """,
)
def f_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + explosion: aggregate into a map column, then
    map_keys/map_values back out (map_from_entries ↔ unnest)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )
    m = agg.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", (F.col("total") / F.col("n")).alias("avg"))))
        ).alias("m")
    )
    return (
        m.select(F.explode("m").alias("event_type", "avg_raw"))
        .select("event_type", F.round("avg_raw", 2).alias("avg_value"))
        .orderBy("event_type")
    )


@query(
    "f_date_parts",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST(CASE WHEN dayofweek(ts) = 0 THEN 1 ELSE dayofweek(ts) + 1 END AS INT) AS dow,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
           strftime(ts, '%Y-%m') AS ym
    FROM events
    WHERE event_id < 300
    ORDER BY event_id
    """,
)
def f_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (year/month/day/hour/dow/doy, truncation,
    formatting). Spark dayofweek is 1=Sunday; DuckDB's is 0=Sunday —
    the oracle rebases."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_epoch"),
        F.date_format("ts", "yyyy-MM").alias("ym"),
    ).orderBy("event_id")


@query(
    "f_null_handling",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'ok') AS type_or_ok,
           CASE WHEN value IS NULL THEN -1.0 ELSE round(value, 2) END AS value_or_neg1,
           CAST(value IS NOT NULL AS INT) AS has_value,
           round(coalesce(try_cast(json_extract_string(props, '$.missing') AS DOUBLE), 0.0), 2) AS missing_default
    FROM events
    WHERE event_id < 300
    ORDER BY event_id
    """,
)
def f_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: coalesce/nullif/isNotNull/try_cast defaults."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("ok")).alias("type_or_ok"),
        F.when(F.col("value").isNull(), -1.0).otherwise(F.round("value", 2)).alias("value_or_neg1"),
        F.col("value").isNotNull().cast("int").alias("has_value"),
        F.round(
            F.coalesce(F.get_json_object("props", "$.missing").try_cast("double"), F.lit(0.0)), 2
        ).alias("missing_default"),
    ).orderBy("event_id")


@query(
    "f_unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, round(val, 2) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'custkey_x10' AS metric, c_custkey * 10.0 AS val FROM customer
    ) t
    WHERE c_custkey < 50
    ORDER BY c_custkey, metric
    """,
)
def f_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack() — the inverse of pivot."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    return (
        cust.select(
            "c_custkey",
            F.expr(
                "stack(2, 'acctbal', c_acctbal, 'custkey_x10', CAST(c_custkey * 10.0 AS DOUBLE)) AS (metric, val)"
            ),
        )
        .select("c_custkey", "metric", F.round("val", 2).alias("val"))
        .orderBy("c_custkey", "metric")
    )


@query(
    "f_regexp_extract",
    oracle="""
    SELECT o_orderkey,
           regexp_extract(o_orderpriority, '^([0-9]+)-(.*)$', 1) AS prio_num,
           regexp_extract(o_orderpriority, '^([0-9]+)-(.*)$', 2) AS prio_name,
           CASE WHEN regexp_matches(o_orderpriority, '^[12]-') THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
)
def f_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction + match predicate (rlike)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return orders.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^([0-9]+)-(.*)$", 1).alias("prio_num"),
        F.regexp_extract("o_orderpriority", r"^([0-9]+)-(.*)$", 2).alias("prio_name"),
        F.col("o_orderpriority").rlike("^[12]-").cast("int").alias("is_urgent"),
    ).orderBy("o_orderkey")


@query(
    "f_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           CAST(json_valid(props) AS INT) AS is_valid,
           json_extract_string(props, '$.absent') AS absent_field
    FROM events
    WHERE event_id < 400
    ORDER BY event_id
    """,
)
def f_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsing into typed structs: from_json with an explicit schema
    (never schema inference in the hot path), validity probing, missing
    fields as NULL."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_int"),
        parsed.isNotNull().cast("int").alias("is_valid"),
        F.get_json_object("props", "$.absent").alias("absent_field"),
    ).orderBy("event_id")


@query(
    "f_like_matrix",
    oracle="""
    SELECT p_partkey,
           CAST(p_name LIKE '%widget%' AS INT) AS has_widget,
           CAST(p_name LIKE 'bl%' AS INT) AS starts_bl,
           CAST(p_name LIKE '%bolt' AS INT) AS ends_bolt,
           CAST(p_name ILIKE 'RED%' AS INT) AS istarts_red,
           CAST(p_name LIKE '_____' AS INT) AS five_chars
    FROM part
    WHERE p_partkey < 500
    ORDER BY p_partkey
    """,
)
def f_like_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-match surface: LIKE contains/prefix/suffix, case-insensitive
    ILIKE, single-char wildcards."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return part.select(
        "p_partkey",
        F.col("p_name").like("%widget%").cast("int").alias("has_widget"),
        F.col("p_name").like("bl%").cast("int").alias("starts_bl"),
        F.col("p_name").like("%bolt").cast("int").alias("ends_bolt"),
        F.col("p_name").ilike("RED%").cast("int").alias("istarts_red"),
        F.col("p_name").like("_____").cast("int").alias("five_chars"),
    ).orderBy("p_partkey")


@query(
    "f_histogram_width_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 400000 THEN 21
                ELSE CAST(floor(o_totalprice / 20000.0) AS BIGINT) + 1 END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def f_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the profiling/drift-check
    aggregation. Binning is a pure column expression, so the whole
    histogram is one map-side-combined groupBy over ≤ n_buckets+2
    groups; no sampling, no driver math. DuckDB has no width_bucket, so
    the oracle restates Spark's formula (floor(v / interval) + 1 with
    0 / n+1 out-of-range buckets; the 20000.0 interval is fp-exact, so
    the division is bit-identical cross-engine)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(F.width_bucket("o_totalprice", F.lit(0), F.lit(400000), F.lit(20)).alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "f_datetime_math",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS plus_45d,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_cutoff,
           CAST(round(date_diff('month', CAST(o_orderdate AS DATE), DATE '1998-12-31'), 0) AS BIGINT)
             AS months_to_cutoff
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def f_datetime_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic matrix: day/month addition, month-end,
    quarter truncation, day/month differences — all pure column
    expressions that constant-fold and push down. Month difference uses
    whole-month counting (DuckDB date_diff semantics) rather than
    Spark's fractional months_between, so both engines agree on
    calendar-boundary cases."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    d = F.to_date("o_orderdate")
    cutoff = F.lit("1998-12-31").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.date_add(d, 45).alias("plus_45d"),
        F.add_months(d, 3).alias("plus_3mo"),
        F.last_day(d).alias("month_end"),
        F.to_date(F.date_trunc("quarter", d)).alias("quarter_start"),
        F.datediff(cutoff, d).cast("long").alias("days_to_cutoff"),
        ((F.year(cutoff) - F.year(d)) * 12 + (F.month(cutoff) - F.month(d)))
        .cast("long")
        .alias("months_to_cutoff"),
    ).orderBy("o_orderkey")


@query(
    "f_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CASE WHEN json_extract(props, '$.k') IS NULL THEN 0 ELSE 1 END AS has_k,
           CAST(json_extract(props, '$.nope') AS INT) AS missing_field
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def f_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse once with
    try_parse_json into a binary-encoded variant, then typed
    try_variant_get extractions — the open-schema alternative to
    from_json-with-StructType when the JSON shape drifts. Unlike
    repeated get_json_object calls (each re-parses the string), the
    variant is parsed once per row and probed cheaply per field;
    missing paths yield NULL, not errors."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = F.try_parse_json("props")
    return (
        ev.select("event_id", "props", v.alias("v"))
        .select(
            "event_id",
            F.try_variant_get(F.col("v"), "$.k", "int").alias("k_val"),
            # RAW path existence (mirrors the oracle's json_extract IS
            # NULL) — a typed extraction would report a non-integer k as
            # absent while the oracle reports it present
            F.get_json_object("props", "$.k").isNotNull().cast("int").alias("has_k"),
            F.try_variant_get(F.col("v"), "$.nope", "int").alias("missing_field"),
        )
        .orderBy("event_id")
    )


@query(
    "f_try_arithmetic",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 5 = 0 THEN NULL
                ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) / (user_id % 5)
           END AS safe_div,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           TRY_CAST(event_type AS INTEGER) AS bad_int,
           CASE WHEN event_id > 0 THEN NULL
                ELSE CAST(9223372036854775807 AS BIGINT)
           END AS overflow_add
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def f_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-free arithmetic: the try_* family returns NULL
    where strict ANSI mode would raise — division by zero, string→int
    cast failures, and int64 overflow. At 100 TB one malformed row must
    not kill a 10-hour job, and NULL-on-error keeps the lineage
    filterable (count the NULLs, quarantine the rows) instead of
    exception-driven.

    Determinism: safe_div divides identical exact integers (IEEE
    double division, bit-identical cross-engine); overflow_add pins
    Spark's try_add NULL-on-overflow against an explicit CASE in the
    oracle (DuckDB has no TRY arithmetic — overflow raises there).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    cents = F.floor(F.col("value") * 100 + 0.5)
    return ev.select(
        "event_id",
        F.try_divide(cents, F.col("user_id") % 5).alias("safe_div"),
        F.expr("try_cast(get_json_object(props, '$.k') AS int)").alias("k_int"),
        F.expr("try_cast(event_type AS int)").alias("bad_int"),
        F.try_add(F.lit(9223372036854775807), F.col("event_id")).alias("overflow_add"),
    ).orderBy("event_id")


@query(
    "f_max_by_min_by",
    oracle="""
    SELECT n.n_name AS nation,
           max_by(c.c_name, CAST(round(c.c_acctbal * 100) AS BIGINT) * 1000000000 + c.c_custkey)
             AS richest_customer,
           min_by(c.c_name, CAST(round(c.c_acctbal * 100) AS BIGINT) * 1000000000 + c.c_custkey)
             AS poorest_customer,
           CAST(max(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS max_acctbal_cents,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def f_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates: per nation, the customer holding the
    highest / lowest account balance — ``max_by``/``min_by`` (Spark
    3.3+, same names in DuckDB) instead of the classic self-join or
    row_number subquery, so the answer comes out of ONE map-side-
    combining aggregate with no window shuffle.

    Determinism: max_by ties are engine-order-dependent, so the ordering
    key is made unique by construction — exact cents (the repo's money
    discipline) scaled past the key domain plus c_custkey as an embedded
    tiebreak (higher custkey wins among equal balances, in both engines,
    because the composite is a single integer compare).

    Scale shape: one shuffle on the group key; the argmax state per
    group is O(1) (current best key + payload), unlike the row_number
    alternative whose window must sort every group member."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    key = F.round(F.col("c_acctbal") * 100).cast("bigint") * 1000000000 + F.col("c_custkey")
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max_by("c_name", key).alias("richest_customer"),
            F.min_by("c_name", key).alias("poorest_customer"),
            F.max(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("max_acctbal_cents"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("nation")
    )


# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

@query(
    "f_url_parse",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || doc_id
             || '?lang=' || lang || '&v=2' AS url
      FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]*)', 1) AS lang_param
    FROM urls ORDER BY doc_id
    """,
)
def f_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction: build a deterministic URL per document,
    then recover host / path / one query parameter with Spark's native
    ``parse_url`` (JVM, codegen'd — the crawl-processing staple for
    domain-level grouping and robots/quality policies). The oracle
    re-derives the same components with portable regexes.

    Narrow one-scan transform; at crawl scale the host column feeds a
    domain groupBy whose skew (a few mega-domains) is the usual salting
    candidate."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")
