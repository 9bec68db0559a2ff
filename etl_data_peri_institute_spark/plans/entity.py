"""Entity-resolution gate queries: blocked fuzzy joins over dirty
dimension labels.

The reference reconciles near-identical labels only at the header level
(fuzzy column rename, transform.py:34-58); a data-scale engine needs the
same resolve-almost-equal move over *values*. These queries pin the
blocked levenshtein join (operators/fuzzy.py) against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fuzzy import blocked_fuzzy_pairs
from ..sources.tables import load_table
from .catalog import query


@query(
    "j_fuzzy_join_blocked",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM names)
    SELECT a.p_name AS name_a, c.p_name AS name_b,
           CAST(levenshtein(a.p_name, c.p_name) AS INT) AS dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
    WHERE levenshtein(a.p_name, c.p_name) <= 2
    ORDER BY name_a, name_b
    """,
)
def j_fuzzy_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-edit-distance self-join on part names ("cold widget" ~
    "old widget"), blocked on the head-noun token so the quadratic term
    is per-block, never corpus-wide.

    Plan: distinct-name dictionary (one vocabulary-sized shuffle) →
    equi-join on the block token (hash join, no cartesian — pinned by
    test_plan_quality) → codegen levenshtein verify on candidates only.
    The oracle disables the hot-block cap (``max_block_rows=None``) so
    both engines enumerate identical pairs; production callers keep the
    cap, exactly like the Jaccard shingle path.
    """
    part = load_table(spark, sf_dir, "part")
    pairs = blocked_fuzzy_pairs(
        part,
        "p_name",
        block=lambda c: F.element_at(F.split(c, " "), -1),
        max_dist=2,
        max_block_rows=None,
    )
    return pairs.select(
        F.col("name_a"), F.col("name_b"), F.col("dist").cast("int").alias("dist")
    ).orderBy("name_a", "name_b")


@query(
    "j_fuzzy_resolve_rows",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM names),
    pairs AS (
      SELECT a.p_name AS name_a, c.p_name AS name_b
      FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
      WHERE levenshtein(a.p_name, c.p_name) <= 1
    ),
    canon AS (  -- union-find-lite: map every name to the min name it pairs with
      SELECT p_name, min(canonical) AS canonical FROM (
        SELECT name_b AS p_name, name_a AS canonical FROM pairs
        UNION ALL
        SELECT p_name, p_name FROM names
      ) GROUP BY p_name
    )
    SELECT canonical, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT p.p_name) AS BIGINT) AS n_variants
    FROM part p JOIN canon USING (p_name)
    GROUP BY canonical
    HAVING count(DISTINCT p.p_name) > 1
    ORDER BY canonical
    """,
)
def j_fuzzy_resolve_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level application of the fuzzy resolution: canonicalize each
    part name to the lexicographically-least name within edit distance 1
    (single-hop — the d≤1 pair graph over this vocabulary is star-shaped,
    so one min-label pass is the fixpoint; multi-hop vocabularies chain
    into operators/components.connected_components, same as embedding
    dedup), then count rows and variants per canonical label.

    Scale shape: the pair graph and canonical map are vocabulary-sized —
    broadcast-joined back onto the full fact table. The 100 TB table is
    touched exactly once."""
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    pairs = blocked_fuzzy_pairs(
        part,
        "p_name",
        block=lambda c: F.element_at(F.split(c, " "), -1),
        max_dist=1,
        max_block_rows=None,
    )
    canon = (
        pairs.select(F.col("name_b").alias("p_name"), F.col("name_a").alias("canonical"))
        .unionByName(names.select("p_name", F.col("p_name").alias("canonical")))
        .groupBy("p_name")
        .agg(F.min("canonical").alias("canonical"))
    )
    # canon is vocabulary-sized (bounded) — safe to broadcast onto the
    # unbounded fact side
    return (
        part.join(F.broadcast(canon), "p_name")
        .groupBy("canonical")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("p_name").alias("n_variants"),
        )
        .filter(F.col("n_variants") > 1)
        .orderBy("canonical")
    )
