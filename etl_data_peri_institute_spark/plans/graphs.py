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


# ===========================================================================
# section consolidated from plans/round4_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/textops.py)
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W

_TRI_TOP_EDGES = 500

@query(
    "g_triangle_count",
    oracle=f"""
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    w AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS c
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    e AS (
      SELECT s1, s2 FROM (
        SELECT s1, s2, row_number() OVER (ORDER BY c DESC, s1, s2) AS rn FROM w
      ) WHERE rn <= {_TRI_TOP_EDGES}
    ),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM e e1
      JOIN e e2 ON e2.s1 = e1.s2
      JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    ),
    pern AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT node, n_triangles FROM pern
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
)
def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the supplier co-supply graph
    (strongest top-500-by-shared-part-count edges, oriented s1<s2) — the
    clustering/community-density primitive (triangle-dense nodes sit in
    tight supplier clusters; the same join shape backs clustering
    coefficients and truss decomposition).

    Scale shape: the standard compact-forward algorithm — edges oriented
    by id so each triangle is generated EXACTLY once by a two-hop join
    plus a closing-edge equi-join (no permutation blowup, no cartesian).
    Cost is sum over nodes of deg^2 on the ORIENTED graph; orienting
    low-id-first caps the quadratic term at the max oriented out-degree,
    and the top-N edge selection is the density guard (in production:
    a weight threshold; top-N here keeps the gate SF-independent). Three
    shuffles total (edge build, two-hop, close).

    Pair-generation strategy is MEASURED, not assumed: the per-part
    supplier self-join (2.44 s at sf0.1) beats the
    collect_set + nested-higher-order pair-explosion alternative
    (4.23 s, identical 499,500-pair output) — wide per-key arrays
    serialize/explode worse than the co-partitioned join, so the join
    stays.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Same pair-build widening as g_kcore_decomposition (they share
    # this exact stage): ~25k (p,s) rows per task keeps each task's
    # map-side partial-agg hash over distinct (s1,s2) pairs in memory
    # (measured at 10x: 6.2 GB spill -> 0); the self-join reuses the
    # co-partitioning. Sized off the CHEAP parquet row count
    # (metadata-only; upper-bounds the distinct row count — an
    # overestimate only adds cheap tasks, never spill).
    # r12 (guide §2.4): repartition FIRST, dedup ABOVE it — ONE
    # exchange instead of distinct-then-repartition's two.
    # hashpartitioning(p) co-locates every (p, s) duplicate (p ⊆
    # (p, s) satisfies the dedup's clustering requirement), so the
    # distinct rides the widening exchange; the old shape shuffled the
    # pair projection twice, and its map-side pre-dedup saved almost
    # nothing (measured: 600 000 raw vs 590 973 distinct (p, s) rows
    # at sf0.1 — 1.5% duplication, a property of the generator at
    # every SF).
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_pair_tasks = min(4096, max(shuffle_parts, li.count() // 25_000))
    ps = (
        li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .repartition(n_pair_tasks, "p")
        .dropDuplicates()
    )
    a, b = ps.alias("a"), ps.alias("b")
    w = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").alias("c"))
    )
    e = (
        w.withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("c").desc(), "s1", "s2")),
        )
        .filter(F.col("rn") <= _TRI_TOP_EDGES)
        .select("s1", "s2")
    )
    # the edge list feeds THREE join sides; without truncation the
    # part-pair derivation (the expensive part) is planned 3x. The frame
    # is bounded at _TRI_TOP_EDGES rows — eager checkpoint is ~free and
    # collapses the triangle plan to the three closing joins (same
    # discipline as connected_components / pagerank final frames).
    e = e.localCheckpoint(eager=True)
    from ..operators.graph import triangle_counts

    return (
        triangle_counts(e.select(F.col("s1").alias("src"), F.col("s2").alias("dst")))
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(20)
    )

_KCORE_K = 6

_KCORE_ROUNDS = 8  # converges in <= 6 at the tested SFs; 2 rounds margin

_KCORE_EDGE_FACTOR = 5  # edge budget = 5x the supplier count (SF-adaptive)

def _kcore_oracle() -> str:
    """Unrolled fixed-round peel as a CTE chain — the same rounds the
    Spark loop executes (converged well within the budget at the tested
    SFs, asserted by the pytest fixpoint check)."""
    prev = "e0"
    stages = []
    for r in range(1, _KCORE_ROUNDS + 1):
        stages.append(f"""
    d{r} AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT s1 AS node FROM {prev} UNION ALL SELECT s2 FROM {prev}
      ) GROUP BY node
    ),
    k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE degree >= {_KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT s1, s2 FROM {prev}
      WHERE s1 IN (SELECT node FROM k{r}) AND s2 IN (SELECT node FROM k{r})
    )""")
        prev = f"e{r}"
    chain = ",".join(stages)
    return f"""
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    ns AS (SELECT count(DISTINCT s) AS n FROM ps),
    w AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS c
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    e0 AS MATERIALIZED (
      SELECT s1, s2 FROM (
        SELECT s1, s2, row_number() OVER (ORDER BY c DESC, s1, s2) AS rn FROM w
      ), ns WHERE rn <= {_KCORE_EDGE_FACTOR} * ns.n
    ),{chain}
    SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
      SELECT s1 AS node FROM {prev} UNION ALL SELECT s2 FROM {prev}
    ) GROUP BY node
    ORDER BY node
    """

@query("g_kcore_decomposition", oracle=_kcore_oracle())
def g_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core (k=6) of the strongest co-supply edges: the maximal subgraph
    where every surviving supplier still has >= k strong partners —
    the graph-density community detector that complements triangle
    counts (a node can sit in many triangles yet fall out of the core).
    Fixed 8-round peel over an SF-adaptive edge budget (5x the supplier
    count — a FIXED budget left the sf0.1 graph too sparse for any core;
    converged within 6 rounds at every tested SF; the pytest
    check asserts a further round removes nothing), unrolled identically
    in the oracle.

    Each peel round's frames SHRINK monotonically and per-round lineage
    is checkpoint-truncated, so the cost is bounded by the first
    round's two small shuffles; the expensive part (edge-weight build)
    is shared with g_triangle_count and runs once.

    NOTE for plan-audit/bench callers: building this DataFrame RUNS
    Spark jobs (the 1-row supplier-count collect that makes the edge
    budget a literal, plus the eager localCheckpoint of the bounded
    edge list) — plan construction is not lazy here, by design."""
    li = load_table(spark, sf_dir, "lineitem")
    # The edge budget must be a LITERAL: with the old crossJoin'd column
    # bound (rn <= 5 * col(n)) InferWindowGroupLimit could not fire and
    # the row_number window single-partition-sorted the ENTIRE pair
    # frame — measured 6.2 GB memory spill at the 10x probe. The
    # supplier count is a 1-row aggregate; collecting it is
    # cluster-safe, and the literal bound re-enables the partial
    # WindowGroupLimit (only ~partitions x budget rows move). r12: the
    # sizing action runs on RAW lineitem (count_distinct(s) is
    # identical over raw rows and the distinct pair frame; the raw row
    # count upper-bounds the pair count — overestimates only add cheap
    # tasks), so it no longer executes the (p, s) distinct once just
    # for sizing.
    n_supp, li_rows = li.agg(
        F.count_distinct("l_suppkey"), F.count("*")
    ).collect()[0]
    # Widen the pair-build stage (round-5 telemetry: the map-side
    # partial-agg hash over ~5M distinct (s1,s2) pairs spilled 6.2 GB
    # at 10x under 32 fat tasks). Re-hashing on p into more, smaller
    # partitions shrinks every task's partial-agg hash proportionally;
    # the self-join then reuses the co-partitioning (both sides are the
    # same frame). Sized at ~25k (p,s) rows per task (measured: 10x
    # spill 6.2 GB -> 0, time 23 -> ~10 s), floored at the session's
    # shuffle parallelism so small SFs pay no extra tasks. r12 (guide
    # §2.4): repartition FIRST, dedup ABOVE it — one exchange instead
    # of distinct-then-repartition's two (see g_triangle_count's pair
    # stage for the duplication measurement).
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_pair_tasks = min(4096, max(shuffle_parts, int(li_rows) // 25_000))
    ps = (
        li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .repartition(n_pair_tasks, "p")
        .dropDuplicates()
    )
    a, b = ps.alias("a"), ps.alias("b")
    w = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").alias("c"))
    )
    e = (
        w.withColumn("rn", F.row_number().over(W.orderBy(F.col("c").desc(), "s1", "s2")))
        .filter(F.col("rn") <= F.lit(int(_KCORE_EDGE_FACTOR * n_supp)))
        .select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .localCheckpoint(eager=True)
    )
    from ..operators.graph import kcore_peel

    return kcore_peel(e, k=_KCORE_K, rounds=_KCORE_ROUNDS).orderBy("node")


# ===========================================================================
# section consolidated from plans/round4b_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/stats.py)
# ===========================================================================

@query(
    "g_bipartite_projection",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM op a JOIN op b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders
    FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def g_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite-graph projection: collapse the order–part bipartite
    graph onto the part side — part pairs that co-occur in at least
    one order, weighted by how many orders contain both (the
    market-basket / co-purchase graph that feeds recommendation and
    frequent-itemset stages).

    Scale shape: the self-join keys on l_orderkey, so candidate pairs
    are generated PER ORDER and bounded by the per-order line count
    squared (TPC-H caps lines/order at 7 → ≤ 21 pairs per order; real
    baskets are similarly bounded). The quadratic term never touches
    table size — it is the same "project through the bounded-degree
    side" rule that makes the supplier-similarity query below safe.
    One distinct + one co-partitioned self-join + one pair groupBy;
    orientation (part_b > part_a) generates each pair exactly once.
    All counts integer; top-20 carries the (part_a, part_b) tiebreak.
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_partkey") > F.col("a.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    return pairs.orderBy(
        F.desc("n_orders"), "part_a", "part_b"
    ).limit(20)

@query(
    "g_supplier_similarity",
    oracle="""
    WITH cs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    cdeg AS (SELECT c, CAST(count(*) AS BIGINT) AS cd FROM cs GROUP BY c),
    sdeg AS (SELECT s, CAST(count(*) AS BIGINT) AS sd FROM cs GROUP BY s),
    pairs AS (
      SELECT a.s AS supp_a, b.s AS supp_b,
             CAST(count(*) AS BIGINT) AS n_common,
             round(sum(1.0 / ln(d.cd)), 4) AS adamic_adar
      FROM cs a
      JOIN cs b ON b.c = a.c AND b.s > a.s
      JOIN cdeg d ON d.c = a.c
      GROUP BY 1, 2
    )
    SELECT p.supp_a, p.supp_b, p.n_common,
           round(p.n_common * 1.0 / (da.sd + db.sd - p.n_common), 4) AS jaccard,
           p.adamic_adar
    FROM pairs p
    JOIN sdeg da ON da.s = p.supp_a
    JOIN sdeg db ON db.s = p.supp_b
    ORDER BY p.adamic_adar DESC, p.supp_a, p.supp_b
    LIMIT 20
    """,
)
def g_supplier_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-similarity scores for supplier pairs on the
    customer–supplier bipartite graph: shared-customer count, neighbor
    Jaccard, and Adamic-Adar (shared customers down-weighted by their
    degree — a promiscuous customer says little about supplier
    affinity). The link-prediction triad of SCAN-style clustering and
    "suppliers like this one" retrieval.

    Scale shape: pairs are enumerated through the CUSTOMER side
    (self-join on c), so the quadratic term is per-customer-degree² —
    the docstring rule from g_bipartite_projection. Customer degree is
    bounded by the supplier universe (|S| ≪ |C|; here ≤ 100). The
    hot-customer degree cap is now a REAL parameter (round-5, verdict
    item 3): ``supplier_similarity_pairs(max_customer_degree=)`` below,
    mirroring jaccard_pairs(max_doc_freq=) — this gate query calls it
    with ``None`` (the oracle-pinned uncapped form); production callers
    get the float-fraction cap with an absolute floor by default.
    Both degrees ride the edge frame as node-keyed window counts and
    flow through the pair aggregation — no degree-table joins and no
    edge-frame re-derivation. Adamic-Adar terms are 1/ln(integer) — identical
    operands both engines; rounded to 4 before the top-20 sort with
    full (supp_a, supp_b) tiebreak.

    Degenerate-denominator note (round-5 advice audit): both divisions
    are non-degenerate BY CONSTRUCTION at any SF — a pair term only
    exists for a customer with >= 2 suppliers, so ``a.cd >= 2`` and
    ``ln(cd) >= ln 2 > 0`` in every Adamic-Adar term (a cd=1 customer
    produces no self-join match); and ``n_common <= min(sd_a, sd_b)``
    gives ``sd_a + sd_b - n_common >= max(sd_a, sd_b) >= 1`` for the
    Jaccard denominator. No NULLIF guard needed; this is the documented
    exclusion the cross-engine contract relies on.
    """
    cs = _customer_supplier_edges(spark, sf_dir)
    # sizing bound: the pre-distinct fact row count (metadata-speed
    # parquet count) upper-bounds the distinct (c, s) edge count, so
    # the operator skips its cs.count() sizing pass (r11)
    li_rows = load_table(spark, sf_dir, "lineitem").count()
    return (
        supplier_similarity_pairs(
            cs, max_customer_degree=None, pair_input_rows=li_rows
        )
        .orderBy(F.desc("adamic_adar"), "supp_a", "supp_b")
        .limit(20)
    )

def _customer_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )

def supplier_similarity_pairs(
    cs: DataFrame,
    max_customer_degree: float | int | None = 0.5,
    degree_floor: int = 64,
    pair_input_rows: int | None = None,
) -> DataFrame:
    """Scored supplier pairs (n_common / jaccard / adamic_adar) over a
    distinct ``(c, s)`` bipartite edge frame, with the hot-customer
    degree cap the round-4 verdict asked to make real (item 3) —
    mirroring ``operators/dedup.py shingle_intersections(max_doc_freq=)``
    exactly:

    - the quadratic term of the customer-side pair enumeration is
      per-customer-degree², so customers above the cap are the skew
      hazard AND carry the least signal (Adamic-Adar's own rationale:
      a promiscuous customer says nothing about supplier affinity);
    - a float cap is a fraction of the DISTINCT SUPPLIER universe (a
      customer's degree is bounded by it), never below ``degree_floor``
      absolute — small graphs and tests are never over-pruned, at scale
      the fraction governs; an int cap is absolute; ``None`` disables
      (the gate query's oracle-pinned form);
    - the cap is applied as an anti-join against the HOT set (tiny by
      construction, broadcasts at any scale), and degrees are then
      computed ON the capped edge set so jaccard/adamic_adar stay
      internally consistent (capped-universe semantics, same as the
      stop-shingle contract).

    Degrees ride the edge frame as windows (one extra exchange each on
    s and c) and flow THROUGH the pair aggregation as max() — no
    degree-table joins, no re-derivation of the edge frame (the
    single-pipeline discipline from the Jaccard rework; the b side of
    the self-join reuses the same exchange lineage).
    """
    if max_customer_degree is not None:
        cdeg = cs.groupBy("c").agg(F.count("*").alias("__cd"))
        if isinstance(max_customer_degree, float):
            total = cs.select("s").distinct().select(F.count("*").alias("__n_supp"))
            cap = F.greatest(
                F.lit(degree_floor), F.col("__n_supp") * max_customer_degree
            )
            hot = cdeg.crossJoin(F.broadcast(total)).filter(F.col("__cd") > cap)
        else:
            hot = cdeg.filter(F.col("__cd") > max_customer_degree)
        cs = cs.join(hot.select("c"), "c", "left_anti")
    # Pair-build widening (round-6; same discipline as the k-core /
    # triangle pair stage): the c-window's exchange would otherwise
    # feed the self-join at session shuffle parallelism, and at the 10x
    # probe the map-side partial-agg hash over distinct supplier pairs
    # spilled 11.3 GB. Re-hash on c to ~25k edge rows per task BETWEEN
    # the two windows: the c-window only needs clustering on c, so it
    # (and the self-join after it) reuse the widened exchange — one
    # exchange serves both, no extra data movement vs the old plan.
    spark = cs.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # task sizing wants only an UPPER BOUND on the edge rows; callers
    # with a cheap bound (e.g. the pre-distinct fact row count, a
    # metadata-speed parquet count) pass it via ``pair_input_rows`` —
    # the ``cs.count()`` fallback executes the whole edge derivation
    # (join + distinct) once JUST for sizing, a full extra pass the
    # r11 A/B measured at ~25% of this gate's runtime. An overestimate
    # only adds cheap tasks, never spill (same rule as the k-core /
    # triangle pair stages).
    edge_rows = pair_input_rows if pair_input_rows is not None else cs.count()
    n_pair_tasks = min(4096, max(shuffle_parts, edge_rows // 25_000))
    cs_w = (
        cs.withColumn("sd", F.count("*").over(W.partitionBy("s")))
        .repartition(n_pair_tasks, "c")
        .withColumn("cd", F.count("*").over(W.partitionBy("c")))
    )
    a, b = cs_w.alias("a"), cs_w.alias("b")
    pairs = (
        a.join(b, (F.col("b.c") == F.col("a.c")) & (F.col("b.s") > F.col("a.s")))
        .groupBy(F.col("a.s").alias("supp_a"), F.col("b.s").alias("supp_b"))
        .agg(
            F.count("*").alias("n_common"),
            F.round(F.sum(1.0 / F.log(F.col("a.cd"))), 4).alias("adamic_adar"),
            F.max(F.col("a.sd")).alias("sd_a"),
            F.max(F.col("b.sd")).alias("sd_b"),
        )
    )
    return pairs.select(
        "supp_a",
        "supp_b",
        "n_common",
        F.round(
            F.col("n_common") / (F.col("sd_a") + F.col("sd_b") - F.col("n_common")),
            4,
        ).alias("jaccard"),
        "adamic_adar",
    )

@query(
    "g_degree_distribution",
    oracle="""
    WITH cs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (
      SELECT 'customer' AS side, c AS id, CAST(count(*) AS BIGINT) AS degree
      FROM cs GROUP BY c
      UNION ALL
      SELECT 'supplier' AS side, s AS id, CAST(count(*) AS BIGINT) AS degree
      FROM cs GROUP BY s
    )
    SELECT side, degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY side, degree
    ORDER BY side, degree
    """,
)
def g_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the customer–supplier bipartite graph, per
    side — the first diagnostic before any graph algorithm runs (it is
    how the hot-key caps in g_supplier_similarity and
    d_ngram_jaccard_pairs get their thresholds, and how skew-join
    salting decides its fan-out).

    Scale shape: one distinct on the edge list, two node-keyed
    groupBys that partial-aggregate map-side, then a histogram groupBy
    over node-sized frames whose output is bounded by the distinct
    degree count. All integers — no rounding concerns.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = cs.groupBy("c").agg(F.count("*").alias("degree")).select(
        F.lit("customer").alias("side"), F.col("degree")
    ).unionAll(
        cs.groupBy("s").agg(F.count("*").alias("degree")).select(
            F.lit("supplier").alias("side"), F.col("degree")
        )
    )
    return (
        deg.groupBy("side", "degree")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("side", "degree")
    )

_AR_MIN_PAIR = 3

@query(
    "g_association_rules",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    nord AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
    item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM op GROUP BY l_partkey
    ),
    pair AS (
      SELECT a.l_partkey AS ant, b.l_partkey AS cons,
             CAST(count(*) AS BIGINT) AS n_both
      FROM op a JOIN op b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey <> a.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {_AR_MIN_PAIR}
    )
    SELECT p.ant, p.cons, p.n_both,
           round(p.n_both * 1.0 / t.n, 5) AS support,
           round(p.n_both * 1.0 / ia.n_orders, 4) AS confidence,
           round(p.n_both * 1.0 * t.n / (ia.n_orders * ic.n_orders), 3) AS lift
    FROM pair p
    JOIN item ia ON ia.l_partkey = p.ant
    JOIN item ic ON ic.l_partkey = p.cons
    CROSS JOIN nord t
    ORDER BY lift DESC, p.ant, p.cons
    LIMIT 25
    """,
)
def g_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules ant → cons over order baskets: support,
    confidence, and lift for directed part pairs co-occurring in at
    least {m} orders — the Apriori 2-itemset stage of market-basket
    mining (g_bipartite_projection computes the undirected graph; this
    adds the directional rule metrics a recommender thresholds on).

    Scale shape: identical candidate bounding to the projection (pairs
    enumerated per order, bounded by basket size squared); the
    min-support filter prunes the pair frame early, and the item
    frequencies ride the basket frame as a part-keyed window count
    carried through the pair aggregation — no item-table joins, no
    basket re-derivation. All counts integer; the
    three ratios are rounded (5/4/3) before the lift-ordered top-25
    with full (ant, cons) tiebreak.
    """.format(m=_AR_MIN_PAIR)
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    nord = op.agg(F.count_distinct("l_orderkey").alias("n"))
    # Item frequencies ride the basket frame as a part-keyed window and
    # flow through the pair aggregation as max() — no item-table joins,
    # no basket-frame re-derivation (same discipline as
    # g_supplier_similarity).
    op_w = op.withColumn("n_orders", F.count("*").over(W.partitionBy("l_partkey")))
    a, b = op_w.alias("a"), op_w.alias("b")
    pair = (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_partkey") != F.col("a.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("ant"), F.col("b.l_partkey").alias("cons")
        )
        .agg(
            F.count("*").alias("n_both"),
            F.max(F.col("a.n_orders")).alias("n_ant"),
            F.max(F.col("b.n_orders")).alias("n_cons"),
        )
        .filter(F.col("n_both") >= _AR_MIN_PAIR)
    )
    return (
        pair.crossJoin(F.broadcast(nord))
        .select(
            "ant",
            "cons",
            "n_both",
            F.round(F.col("n_both") / F.col("n"), 5).alias("support"),
            F.round(F.col("n_both") / F.col("n_ant"), 4).alias("confidence"),
            F.round(
                F.col("n_both") * F.col("n") / (F.col("n_ant") * F.col("n_cons")),
                3,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "ant", "cons")
        .limit(25)
    )


# ===========================================================================
# section consolidated from plans/round6f_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#
# Round-6 continuation, batch 5: label-propagation communities, RAG
# chunk manifest, session path mining, and column-entropy profiling.
#
# Four more first-class operators (north-star extensions per the build
# brief — the reference repo, /root/reference/etl/transform.py, has no
# graph/text/profiling analytics):
#
# - ``g_label_propagation``: synchronous label-propagation community
#   detection (2 deterministic rounds, most-frequent-neighbor-label with
#   min-label tiebreak) over the supplier co-supply graph — the
#   communities complement to the existing PageRank / triangles / k-core
#   family (connected components finds REACHABILITY islands; LPA finds
#   DENSITY communities inside one component).
# - ``t_rag_chunk_manifest``: overlapping sliding-window chunking (the
#   RAG-serving shape — stride < window so every boundary sentence lands
#   wholly inside at least one chunk), emitting the per-chunk manifest a
#   vector-index loader consumes. Distinct from the DEDUP chunkers
#   (d_chunk_dedup fixed non-overlapping, d_cdc_chunking content-defined):
#   those partition text, this covers it redundantly on purpose.
# - ``b_session_path_topk``: most common full session paths (ordered
#   event-type sequences per 4-h-gap session, the b_sessionize
#   convention) — the sequence-mining readout behind "what do users
#   actually do in a session?".
# - ``a_column_entropy_report``: Shannon entropy + distinct count per
#   profiled column across tables — the information-density profile that
#   ranks candidate blocking/partition keys (near-zero-entropy columns
#   prune nothing; the profiling complement to a_dataset_profile's
#   per-column stats).
# ===========================================================================

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

_LPA_TOP_EDGES = 500

_LPA_ROUNDS = 2

_LPA_ROUND = """
    nc{i} AS (
      SELECT s.a AS node, l.label, count(*) AS c
      FROM sym s JOIN l{j} l ON l.node = s.b
      GROUP BY s.a, l.label
    ),
    l{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label
               ) AS rn
        FROM nc{i}
      ) WHERE rn = 1
    )"""

def _lpa_oracle() -> str:
    parts = [
        f"""
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    w AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS c
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    e AS (
      SELECT s1, s2 FROM (
        SELECT s1, s2, row_number() OVER (ORDER BY c DESC, s1, s2) AS rn FROM w
      ) WHERE rn <= {_LPA_TOP_EDGES}
    ),
    sym AS (
      SELECT s1 AS a, s2 AS b FROM e UNION ALL SELECT s2, s1 FROM e
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym)"""
    ]
    for it in range(1, _LPA_ROUNDS + 1):
        parts.append("," + _LPA_ROUND.format(i=it, j=it - 1))
    parts.append(
        f"""
    SELECT label, CAST(count(*) AS BIGINT) AS n_members
    FROM l{_LPA_ROUNDS}
    GROUP BY label
    ORDER BY n_members DESC, label
    LIMIT 20
    """
    )
    return "".join(parts)

def lpa_state(spark: SparkSession, sf_dir: str):
    """Shared LPA machinery: returns (edges, sym, labels) — the
    strongest-500-edges co-supply graph, its symmetrized frame, and the
    final deterministic labels after _LPA_ROUNDS synchronous rounds.
    Consumed by g_label_propagation (community sizes) and
    g_community_modularity (partition quality, this module)."""
    li = load_table(spark, sf_dir, "lineitem")
    # r12: one widening exchange with the dedup riding it, instead of
    # distinct-then-repartition's two (the g_triangle_count pair-stage
    # restructure; duplication measured at 1.5%, so the old map-side
    # pre-dedup saved nothing).
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_pair_tasks = min(4096, max(shuffle_parts, li.count() // 25_000))
    ps = (
        li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .repartition(n_pair_tasks, "p")
        .dropDuplicates()
    )
    a, b = ps.alias("a"), ps.alias("b")
    wgt = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").alias("c"))
    )
    top = F.row_number().over(W.orderBy(F.desc("c"), "s1", "s2"))
    edges = wgt.withColumn("rn", top).filter(F.col("rn") <= _LPA_TOP_EDGES)
    edges = edges.select("s1", "s2").localCheckpoint(eager=True)
    sym = edges.select(F.col("s1").alias("a"), F.col("s2").alias("b")).unionAll(
        edges.select(F.col("s2").alias("a"), F.col("s1").alias("b"))
    )
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        # broadcast the label side (r12, guide §3.1): labels is bounded
        # by the _LPA_TOP_EDGES-node graph (≤ 2·500 nodes by
        # construction, NOT SF-scaled — the no-forced-broadcast rule
        # does not apply), so each round's neighbor-label join needs no
        # hash exchange on either side; only the (node, label) count
        # aggregation shuffles, and that frame is graph-bounded too.
        nc = (
            sym.join(F.broadcast(labels), sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("n"), "label")
            .agg(F.count("*").alias("c"))
        )
        pick = F.row_number().over(
            W.partitionBy("n").orderBy(F.desc("c"), F.asc("label"))
        )
        labels = (
            nc.withColumn("rn", pick)
            .filter(F.col("rn") == 1)
            .select(F.col("n").alias("node"), "label")
        )
    return edges, sym, labels

@query("g_label_propagation", oracle=_lpa_oracle())
def g_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the supplier co-supply graph
    (same strongest-500-edges base as g_triangle_count): labels start as
    node ids; each of 2 synchronous rounds relabels every node with its
    most frequent neighbor label (min label on ties — fully
    deterministic, unlike classic randomized LPA); the report is the 20
    largest resulting communities. Complements the graph family:
    components finds reachability islands, LPA finds density
    communities inside them.

    Scale shape per round: one edge-sized shuffle (the neighbor-label
    join re-keys edges by dst, then the (node, label) count
    partial-aggregates map-side) and one node-sized argmax window over
    per-node label groups (each partition is one node's <=deg labels,
    never data-sized). Round count is a literal, so lineage is a
    fixed-depth DAG — a deep fit would localCheckpoint between rounds
    like g_pagerank_suppliers. The edge budget is a literal so the
    top-edge window keeps its WindowGroupLimit rewrite
    (the g_triangle_count discipline above).
    """
    # (body shared with g_community_modularity via lpa_state above; the
    # pair-stage widening + _LPA_TOP_EDGES eager-checkpoint discipline
    # lives there — without truncation the expensive pair-enumeration
    # subtree is planned ~6x.)
    _edges, _sym, labels = lpa_state(spark, sf_dir)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(20)
    )


# ===========================================================================
# section consolidated from plans/round7e_ext.py (round-9 layout cleanup;
#   original registrations and docstrings preserved verbatim)
#   (module docstring carried in plans/ann.py)
# ===========================================================================

_MODULARITY_SQL = """
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    w AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS c
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    e AS (
      SELECT s1, s2 FROM (
        SELECT s1, s2, row_number() OVER (ORDER BY c DESC, s1, s2) AS rn FROM w
      ) WHERE rn <= 500
    ),
    sym AS (
      SELECT s1 AS a, s2 AS b FROM e UNION ALL SELECT s2, s1 FROM e
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
    nc1 AS (
      SELECT s.a AS node, l.label, count(*) AS c
      FROM sym s JOIN l0 l ON l.node = s.b
      GROUP BY s.a, l.label
    ),
    l1 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label
               ) AS rn
        FROM nc1
      ) WHERE rn = 1
    ),
    nc2 AS (
      SELECT s.a AS node, l.label, count(*) AS c
      FROM sym s JOIN l1 l ON l.node = s.b
      GROUP BY s.a, l.label
    ),
    l2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label
               ) AS rn
        FROM nc2
      ) WHERE rn = 1
    ),
    m AS (SELECT count(*) * 1.0 AS m FROM e),
    deg AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY a),
    comm AS (
      SELECT l2.label, count(*) AS n_members, sum(deg.d) AS degree_sum
      FROM l2 JOIN deg USING (node) GROUP BY l2.label
    ),
    internal AS (
      SELECT la.label, count(*) AS internal_edges
      FROM e
      JOIN l2 la ON la.node = e.s1
      JOIN l2 lb ON lb.node = e.s2
      WHERE la.label = lb.label
      GROUP BY la.label
    ),
    contrib AS (
      SELECT c.label, c.n_members,
             coalesce(i.internal_edges, 0) AS internal_edges,
             c.degree_sum,
             coalesce(i.internal_edges, 0) / m.m
               - pow(c.degree_sum / (2 * m.m), 2) AS q
      FROM comm c LEFT JOIN internal i USING (label) CROSS JOIN m
    ),
    total AS (SELECT sum(q) AS modularity FROM contrib)
    SELECT c.label,
           CAST(c.n_members AS BIGINT) AS n_members,
           CAST(c.internal_edges AS BIGINT) AS internal_edges,
           CAST(c.degree_sum AS BIGINT) AS degree_sum,
           round(c.q, 6) AS q_contribution,
           round(t.modularity, 4) AS modularity
    FROM contrib c CROSS JOIN total t
    ORDER BY c.n_members DESC, c.label
    LIMIT 20
"""

@query("g_community_modularity", oracle=_MODULARITY_SQL)
def g_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the deterministic-LPA partition over the
    strongest-500-edges co-supply graph: Q = Σ_c [ m_c/m −
    (d_c/2m)² ] with m_c = within-community edges, d_c = community
    degree sum. Per-community contributions (top 20 by size) ship next
    to the global Q — the quality readout that says whether
    g_label_propagation's communities beat a random partition (Q≈0) and
    when to stop adding LPA rounds.

    Scale shape: reuses round6f's lpa_state (edge build + label rounds,
    one edge-sized shuffle each); modularity itself adds one degree
    aggregate, one label-equality edge join, and arithmetic on the
    community-count-sized frame. The global Q is a window over that
    bounded frame, not over data.
    """
    from .graphs import lpa_state

    edges, sym, labels = lpa_state(spark, sf_dir)
    m = edges.count() * 1.0  # bounded at _LPA_TOP_EDGES by construction
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    comm = (
        labels.join(deg, "node")
        .groupBy("label")
        .agg(F.count("*").alias("n_members"), F.sum("d").alias("degree_sum"))
    )
    la = labels.select(F.col("node").alias("s1"), F.col("label").alias("lab1"))
    lb = labels.select(F.col("node").alias("s2"), F.col("label").alias("lab2"))
    internal = (
        edges.join(la, "s1")
        .join(lb, "s2")
        .where(F.col("lab1") == F.col("lab2"))
        .groupBy(F.col("lab1").alias("label"))
        .agg(F.count("*").alias("internal_edges"))
    )
    contrib = (
        comm.join(internal, "label", "left")
        .select(
            "label",
            "n_members",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            "degree_sum",
            (
                F.coalesce("internal_edges", F.lit(0)) / F.lit(m)
                - F.pow(F.col("degree_sum") / F.lit(2 * m), 2)
            ).alias("q"),
        )
    )
    everything = W.orderBy("label").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        contrib.select(
            "label",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("internal_edges").cast("long").alias("internal_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.round("q", 6).alias("q_contribution"),
            F.round(F.sum("q").over(everything), 4).alias("modularity"),
        )
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(20)
    )
