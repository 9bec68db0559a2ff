"""Iterative graph algorithms as DataFrame loops: PageRank.

Companion to operators/components.py (connected components): the same
driver-side-loop / executor-side-data pattern — each iteration is a
join + aggregate expressed declaratively, the driver only decides WHEN
to stop, never touches row data, and lineage is truncated periodically
so the DAG stays bounded.

Scale shape (100 TB edge list): per iteration, one shuffle keyed on the
edge source (rank/out-degree lookup) and one keyed on the destination
(contribution sum). Degrees are computed once and cached. Rank state is
node-sized, not edge-sized. GraphX/Pregel does the same dataflow with
message combiners; on the DataFrame API the map-side partial sum of
``groupBy(dst).sum`` IS the combiner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    dedupe: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)`` for a FIXED
    iteration count. Returns (id, rank).

    Every node is assumed to appear as a source at least once (true for
    any symmetrized graph — callers with genuine sinks add self-loops or
    accept the dropped dangling mass). Fixed-iteration semantics keep
    the result a pure deterministic function of the edge set, which is
    what lets a SQL oracle replay it; convergence-threshold stopping is
    a trivial driver-side variant (compare successive ranks, as
    connected_components does).
    """
    # the edge list is consumed 2 + iterations times (nodes, degrees,
    # every contribution join) — cache it or its upstream plan (often an
    # expensive fact-table join) re-executes per consumer. At cluster
    # scale use StorageLevel.MEMORY_AND_DISK via .persist() if the edge
    # set outgrows executor memory; the loop structure is unchanged.
    # ``dedupe=False`` skips the edge-level distinct for callers whose
    # edge list is distinct BY CONSTRUCTION (e.g. both directions of an
    # already-distinct pair set with disjoint src/dst key spaces) — at
    # fact-table edge counts that distinct is a full shuffle of the
    # widest frame in the algorithm, and skipping it when provably
    # redundant is the single biggest win
    edges = edges.select("src", "dst")
    if dedupe:
        edges = edges.distinct()
    # fold the out-degree into the edge frame ONCE: the degree groupBy +
    # join shuffle the edge list a single time up front, and the cached
    # result comes out hash-partitioned on src — so each iteration's
    # contribution join only shuffles the NODE-sized rank frame against
    # it (the edge side, the wide one, never moves again). The
    # alternative — a separate deg frame joined per iteration —
    # re-shuffles edge-sized data every round: 2×iterations extra wide
    # shuffles at 100 TB edge counts.
    raw = edges.cache()
    nodes = raw.select(F.col("src").alias("id")).distinct().cache()
    n = nodes.count()  # one job; node-sized frame, reused every iteration
    deg = raw.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges = raw.join(deg, "src").select("src", "dst", "outdeg").cache()

    ranks = nodes.select("id", (F.lit(1.0) / n).alias("rank"))
    base = (1.0 - damping) / n
    try:
        for i in range(iterations):
            contribs = (
                ranks.join(edges, ranks.id == edges.src)
                .select(
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("outdeg")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("contrib"))
            )
            new_ranks = nodes.join(contribs, "id", "left").select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            # same lineage discipline as connected_components: cache each
            # iterate, checkpoint periodically so the plan doesn't grow
            # linearly with the iteration count
            new_ranks = (
                new_ranks.localCheckpoint(eager=True)
                if (i + 1) % 4 == 0
                else new_ranks.cache()
            )
            prev, ranks = ranks, new_ranks
            if i > 0:
                prev.unpersist()
        # no action runs inside the loop, so the iteration caches are
        # still lazy here — materialize the FINAL ranks (node-sized)
        # before releasing the edge/degree caches, or the caller's first
        # action would replay the whole lineage against uncached inputs
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        nodes.unpersist()
        edges.unpersist()
        raw.unpersist()
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED graph
    given as oriented edges ``(src, dst)`` with ``src < dst`` (one row
    per undirected edge). Returns ``(node, n_triangles)`` for nodes in
    at least one triangle.

    Compact-forward enumeration: with every edge oriented low-id-first,
    each triangle {a<b<c} is generated EXACTLY once as the two-hop path
    a→b→c closed by the (a,c) edge — no permutation blowup, no
    cartesian. Cost is Σ deg_out² over the ORIENTED graph (the classic
    bound); the caller controls density (weight threshold / top-N edge
    selection). The edge frame feeds three join sides, so it is eagerly
    checkpointed when small or cached otherwise by the caller — this
    function assumes ``edges`` is already materialization-friendly.
    """
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """k-core via FIXED-round peeling over an undirected graph given as
    oriented edges ``(src, dst)``, ``src < dst``: each round drops nodes
    with degree < k and the edges touching them. Returns the surviving
    ``(node, degree)``. Fixed ``rounds`` keeps the result a pure
    function of the edge set (the oracle unrolls the same rounds);
    callers must size ``rounds`` to the graph — peeling converges when a
    round removes nothing, and an unconverged cut would overcount cores.

    Each round is two small shuffles (degree groupBy + survivor
    semi-joins) over a frame that only SHRINKS; per-round lineage is
    truncated via localCheckpoint, so the composed plan stays flat
    regardless of round count (the CC/PageRank discipline)."""
    cur = edges
    for _ in range(rounds):
        deg = (
            cur.select(F.col("src").alias("node"))
            .unionAll(cur.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    return (
        cur.select(F.col("src").alias("node"))
        .unionAll(cur.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
