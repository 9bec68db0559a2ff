"""Graph-analytics gate queries: PageRank over the customer–supplier
transaction graph, and the event conversion funnel.

Both are driver-loop-free single plans EXCEPT the PageRank iterations,
which follow the connected-components pattern (declarative per-iteration
plan, driver only sequences). The oracle replays the identical fixed
iteration count as an unrolled CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..sources.tables import load_table
from .catalog import query

_DAMPING = 0.85
_ITERATIONS = 3


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration PageRank as a CTE chain — bit-for-bit the
    same arithmetic the Spark loop performs (init 1/N, then
    (1-d)/N + d·Σ rank/outdeg), so the only cross-engine difference is
    float summation order, absorbed by the round(·,8) output."""
    iters = []
    prev = "r0"
    for k in range(1, _ITERATIONS + 1):
        iters.append(
            f"""
    r{k} AS (
      SELECT n.id,
             (1 - {_DAMPING}) / nc.n + {_DAMPING} * coalesce(c.s, 0) AS rank
      FROM nodes n CROSS JOIN ncount nc
      LEFT JOIN (
        SELECT e.dst AS id, sum(r.rank / d.outdeg) AS s
        FROM {prev} r
        JOIN edges e ON e.src = r.id
        JOIN deg d ON d.src = r.id
        GROUP BY e.dst
      ) c ON c.id = n.id
    )"""
        )
        prev = f"r{k}"
    chain = ",".join(iters)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT 'c' || c AS src, 's' || s AS dst FROM pairs
      UNION ALL
      SELECT 's' || s AS src, 'c' || c AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    ncount AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT id, 1.0 / nc.n AS rank FROM nodes CROSS JOIN ncount nc),{chain}
    SELECT id, round(rank, 8) AS rank_r8
    FROM r{_ITERATIONS}
    WHERE id LIKE 's%'
    ORDER BY round(rank, 8) DESC, id
    LIMIT 20
    """


@query("g_pagerank_suppliers", oracle=_pagerank_oracle())
def g_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by PageRank on the symmetrized customer–supplier
    purchase graph — "importance" that flows through shared customers,
    not just raw degree (a supplier whose customers buy widely ranks
    above one with the same degree of single-supplier customers).

    Determinism discipline: fixed 3 iterations, exact 1/N init; the
    per-node contribution sum is the one order-dependent float reduction
    — round(·,8) absorbs its ~1e-15 relative drift (rank magnitudes are
    ~1e-3) and the top-k orders by the ROUNDED value with id tiebreak.

    Scale shape: see operators/graph.pagerank — per iteration two
    edge-keyed shuffles with map-side combine, node-sized state.
    Iteration keys are BIGINT node ids (2·custkey / 2·suppkey+1 — the
    parity bit disambiguates the bipartite key spaces), an order of
    magnitude cheaper to shuffle/compare than string-prefixed ids; the
    oracle-facing 'c'/'s' label is rebuilt only on the 20-row output.
    The pair set is deduped once on the narrow int pair; both directions
    of it are distinct by construction (disjoint src parities), so the
    operator's edge-level distinct — a full shuffle of the widest frame
    — is skipped via ``dedupe=False``."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    c = (2 * F.col("o_custkey")).cast("long")
    s = (2 * F.col("l_suppkey") + 1).cast("long")
    edges = pairs.select(c.alias("src"), s.alias("dst")).unionByName(
        pairs.select(s.alias("src"), c.alias("dst"))
    )
    ranks = pagerank(edges, iterations=_ITERATIONS, damping=_DAMPING, dedupe=False)
    return (
        ranks.filter(F.col("id") % 2 == 1)
        .select(
            F.concat(F.lit("s"), ((F.col("id") - 1) / 2).cast("long").cast("string")).alias("id"),
            F.round("rank", 8).alias("rank_r8"),
        )
        .orderBy(F.desc("rank_r8"), "id")
        .limit(20)
    )


@query(
    "b_conversion_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS tv
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.tv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.tc
      GROUP BY e.user_id
    )
    SELECT step, n_users FROM (
      SELECT 1 AS ord, 'view' AS step,
             CAST((SELECT count(*) FROM v WHERE tv IS NOT NULL) AS BIGINT) AS n_users
      UNION ALL
      SELECT 2, 'click_after_view', CAST((SELECT count(*) FROM c) AS BIGINT)
      UNION ALL
      SELECT 3, 'purchase_after_click', CAST((SELECT count(*) FROM p) AS BIGINT)
    ) ORDER BY ord
    """,
)
def b_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first qualifying click —
    the sequential-constraint funnel (not mere event presence; ordering
    is enforced between stages).

    Scale shape: three user-keyed aggregates, each consuming the
    previous stage's per-user timestamp — all shuffles share the
    user_id key, so Spark reuses one partitioning across stages
    (no re-shuffle between v → c → p); stage frames are user-sized,
    strictly shrinking. The final 3 counts are scalar aggregates."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv")
    ).filter(F.col("tv").isNotNull())
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("tv")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("tc")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    counts = (
        v.agg(F.count("*").alias("n")).select(F.lit(1).alias("ord"), F.lit("view").alias("step"), F.col("n").alias("n_users"))
        .unionByName(c.agg(F.count("*").alias("n")).select(F.lit(2).alias("ord"), F.lit("click_after_view").alias("step"), F.col("n").alias("n_users")))
        .unionByName(p.agg(F.count("*").alias("n")).select(F.lit(3).alias("ord"), F.lit("purchase_after_click").alias("step"), F.col("n").alias("n_users")))
    )
    return counts.orderBy("ord").select("step", "n_users")
