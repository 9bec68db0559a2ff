"""Blocked fuzzy matching (entity resolution): bounded-edit-distance
joins without the cross product.

The naive fuzzy join is O(n²) levenshtein calls — never viable. The
classic fix (Fellegi-Sunter blocking, as used by every record-linkage
system) is to join only within *blocks*: a cheap deterministic key
(phonetic code, a token, a prefix) that any true match must share.
Candidates = sum of per-block squares, not corpus²; the edit-distance
predicate then verifies only candidates.

Scale shape (100 TB): one shuffle on the block key for each side; the
levenshtein verify runs inside the joined partitions (JVM codegen —
``F.levenshtein`` is a built-in, no UDF). Skewed blocks are the hazard
(a block holding k rows costs k²); callers cap them the same way the
Jaccard path caps hot shingles — drop or sub-split blocks above a
frequency bound.

Reference parity: the reference has no fuzzy matching; this is a
north-star extension for dirty-dimension reconciliation (the reference's
fuzzy *header* rename at transform.py:34-58 is the same idea applied to
column labels — see sources/grid.py:fuzzy_rename).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    block: Callable[[Column], Column],
    max_dist: int = 2,
    max_block_rows: int | None = 10_000,
) -> DataFrame:
    """All unordered pairs of DISTINCT ``text_col`` values that share a
    block and are within ``max_dist`` edits: (name_a, name_b, dist),
    name_a < name_b. ``block`` maps the (deduplicated) name column to
    its blocking key — e.g. ``lambda c: F.soundex(c)`` or a token.

    Resolving the *value dictionary* rather than the row stream is the
    key scale move: a 100 TB fact table has billions of rows but a
    bounded label vocabulary — dedupe first (one shuffle,
    vocabulary-sized output), then the quadratic-per-block work runs on
    the dictionary only. Row-level linkage is a semi-join back on the
    resolved names.

    ``max_block_rows`` guards the quadratic term: blocks with more
    distinct values than the cap are dropped (same discipline as
    jaccard_pairs' hot-shingle cap — a block that common carries no
    discriminating signal). ``None`` disables the cap for oracle parity.
    """
    names = (
        df.select(F.col(text_col).alias("name"))
        .distinct()
        .withColumn("blk", block(F.col("name")))
        .filter(F.col("blk").isNotNull())
    )
    if max_block_rows is not None:
        hot = (
            names.groupBy("blk")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_block_rows)
            .select("blk")
        )
        # hot-block set is tiny by construction (it lists only
        # pathological keys) — AQE will broadcast the anti-join side
        names = names.join(hot, "blk", "left_anti")
    a = names.select(F.col("blk"), F.col("name").alias("name_a"))
    b = names.select(F.col("blk"), F.col("name").alias("name_b"))
    pairs = (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        # the same pair can match under several blocks (e.g. two shared
        # tokens) — distinct() collapses to the unordered-pair set
        .select("name_a", "name_b", "dist")
        .distinct()
    )
    return pairs
