"""Connected components via iterative min-label propagation.

The dedup-clustering step after LSH: candidate pairs form a graph; each
component keeps one canonical document. Spark has no native CC operator
(GraphFrames isn't in this image), so this is the classic iterative
DataFrame algorithm:

    label(v) ← min(label(v), min(label(u) for u adjacent))   until fixpoint

Each iteration is one shuffle (join on the edge list + groupBy-min);
convergence needs at most diameter(G) iterations — near-dup graphs are
shallow (small cliques/chains), so it converges in a handful. The loop
checks a convergence count per iteration (a driver-side action on an
aggregated 1-row result — not a data collect).

At 100 TB: checkpoint/localCheckpoint the label frame every few
iterations to truncate lineage, and persist the (small) edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """edges: (id_a, id_b) undirected. Returns (id, component) where
    component = min id reachable. Deterministic for any edge order."""
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = sym.distinct().cache()

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )

    # try/finally so the raise path doesn't leak executor storage: sym
    # and the last cached labels frame would otherwise stay pinned for
    # the session's lifetime after repeated failures
    converged = False
    try:
        for i in range(max_iterations):
            neighbor_min = (
                sym.join(labels, sym.dst == labels.id)
                .groupBy(F.col("src").alias("id"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = labels.join(neighbor_min, "id", "left").select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            # truncate lineage every few iterations — at large edge counts the
            # accumulated join DAG otherwise grows linearly with iterations
            new_labels = (
                new_labels.localCheckpoint(eager=True) if (i + 1) % 4 == 0 else new_labels.cache()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            prev, labels = labels, new_labels
            prev.unpersist()
            if changed == 0:
                converged = True
                break
        if not converged:
            # min-label propagation converges in O(graph diameter) rounds;
            # returning unconverged labels silently would mis-assign
            # components, so make it loud (callers pass a bigger budget or
            # precompute with large-star/small-star contraction)
            raise RuntimeError(
                f"connected_components: labels still changing after "
                f"{max_iterations} iterations — graph diameter exceeds the "
                f"iteration budget; raise max_iterations"
            )
        # Eagerly checkpoint the converged labels (node-sized — one row per
        # vertex, two columns) so the returned frame's lineage is a leaf.
        # Near-dup graphs converge in 2-3 iterations, before the every-4th
        # in-loop checkpoint fires, so without this the composed dedup plans
        # (d_dedup_apply, d_cluster_representative, d_embedding_dedup_apply)
        # inherit the entire LSH candidate derivation into every downstream
        # join — measured 265 hash exchanges in the static plan vs ~10 after
        # truncation. Mirrors the final-ranks checkpoint in graph.py.
        final = labels.localCheckpoint(eager=True)
        labels.unpersist()
        return final
    finally:
        sym.unpersist()
        if not converged:
            labels.unpersist()
