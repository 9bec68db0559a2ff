"""Interval-overlap join — the scale path for range predicates.

A naive overlap join (``a.start <= b.end AND b.start <= a.end``) plans
as a broadcast-nested-loop: O(|A|·|B|) comparisons — fine for one small
side, fatal for two fact-sized interval sets. The standard distributed
rewrite is GRID BINNING: overlay a fixed grid, replicate each interval
into every bin it touches, equi-join on (key, bin) — only co-binned
pairs are compared — then dedup (a pair can share several bins) and
apply the exact overlap predicate.

Cost: |A|+|B| rows replicated by their interval-length/bin-width ratio,
one equi-shuffle on (key, bin), and exact checks only on co-binned
candidates. Bin width is the dial: ~median interval length keeps
replication ≈ 2× while making candidate sets local. Long outlier
intervals replicate across many bins — cap them by splitting the
interval set (long intervals join via the nested-loop path, which is
fine because there are few) when the length distribution is heavy-
tailed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bin_width: float,
) -> DataFrame:
    """All (left, right) row pairs whose [start, end] intervals overlap
    (closed bounds), optionally within the same ``on`` key. Bounds are
    numeric (epoch seconds for time intervals).

    Returns left columns + right columns (caller ensures distinct
    names; include a unique id per side so the bin-replica dedup
    collapses only replicas, never genuinely distinct pairs). Grid
    binning + equi-join + exact predicate — no cartesian, no nested
    loop."""
    ls, le = left_bounds
    rs, re_ = right_bounds

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        # end < start is not a real interval — drop it rather than let
        # sequence() silently generate a DESCENDING bin range
        df = df.filter(F.col(e) >= F.col(s))
        lo = F.floor(F.col(s) / bin_width).cast("long")
        hi = F.floor(F.col(e) / bin_width).cast("long")
        return df.withColumn("__bin", F.explode(F.sequence(lo, hi)))

    a = binned(left, ls, le)
    b = binned(right, rs, re_)
    join_keys = ["__bin"] if on is None else [on, "__bin"]
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
    out_cols = [c for c in left.columns] + [c for c in right.columns if c != on]
    return (
        a.join(b, join_keys)
        .filter(overlap)
        .select(*out_cols)
        # a pair overlapping k bins appears k times — dedup to row pairs
        .distinct()
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    lo: str = "lo",
    hi: str = "hi",
    adjacency: int | float = 0,
) -> DataFrame:
    """Per-key interval UNION (gaps-and-islands): collapse overlapping —
    and, with ``adjacency`` > 0, near-touching — [lo, hi] intervals into
    their minimal disjoint cover. Two intervals merge when
    ``next.lo <= running_max(hi) + adjacency`` (closed bounds; pass
    ``adjacency=1`` for integer coordinates where [1,3] and [4,6] are
    contiguous).

    Plan shape: ONE shuffle on ``key_cols`` (the window partition), an
    in-partition sort by (lo, hi), a running max and a running island
    counter, then a key-local groupBy that Catalyst plans WITHOUT a
    second exchange (it groups on a superset of the window partition
    key). Per-key state is the key's own interval count — the operator
    scales with the largest single key, not the table, so at 100 TB the
    skew axis is a hot key (e.g. one document with millions of flagged
    spans), which upstream producers bound (hot-gram caps, span
    coalescing at generation).
    """
    clash = {"__new", "__island"} & set(df.columns)
    if clash:  # the temp columns would silently clobber caller data
        raise ValueError(
            f"merge_intervals: input must not contain reserved columns {sorted(clash)}"
        )
    w = Window.partitionBy(*key_cols).orderBy(lo, hi)
    prev_max = F.max(hi).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(
        prev_max.isNull() | (F.col(lo) > prev_max + F.lit(adjacency)), 1
    ).otherwise(0)
    island = F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("__new", is_new)
        .withColumn("__island", island)
        .groupBy(*key_cols, "__island")
        .agg(F.min(lo).alias(lo), F.max(hi).alias(hi))
        .drop("__island")
    )
