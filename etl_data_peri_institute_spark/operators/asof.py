"""As-of (time-travel) join — an operator Spark lacks natively.

Implemented as the union + window trick (composition of existing
DataFrame ops, per the engine's custom-operator policy: built-ins before
Pandas UDFs):

1. tag left (probe) and right (reference) rows and union them on the
   shared key/time axis;
2. sort within each key by (time, side) — reference rows first at equal
   timestamps so backward as-of includes exact matches;
3. ``last(ref_value, ignorenulls)`` over an unbounded-preceding window
   carries the most recent reference value forward;
4. keep only probe rows.

Cost: one shuffle on the key (same as any join) + an in-partition sort —
no range explosion, no per-row search. Skewed keys behave like any
window partition (salt if one key dominates). The ``applyInPandas`` /
``pd.merge_asof`` alternative needs the same shuffle but adds Arrow
transfer; this stays fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_time] <= left[left_time]`` within the same ``on`` key.

    Output: all left columns + ``{value_col}{suffix}`` for each value col
    (NULL when no earlier right row exists).

    Duplicate-timestamp right rows: when several right rows share the
    same (key, time), the carried row is the one with the greatest
    content hash (``xxhash64`` over the value columns) — an arbitrary
    but RUN-DETERMINISTIC pick; without the tiebreak, ``last`` over the
    (time, side)-ordered window would depend on engine arrival order.
    All value columns are carried from the same winning row.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.xxhash64(*[F.col(c) for c in value_cols]).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    # __side 0 (reference) sorts before 1 (probe) at equal __t → backward
    # as-of includes exact-timestamp matches; __tb makes the pick among
    # duplicate-timestamp reference rows deterministic
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[f"{c}{suffix}" for c in value_cols]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right[right_time] >= left[left_time]`` within the same ``on`` key
    (the forward direction: "next reading at or after this event").

    Mirror of asof_join_backward: probe rows sort BEFORE reference rows
    at equal timestamps (so exact matches are included) and
    ``first(ignorenulls)`` over a current-row-to-unbounded-FOLLOWING
    frame pulls the nearest future reference value back. Same cost
    profile: one key shuffle + in-partition sort.

    Duplicate-timestamp right rows: the carried row is the one with the
    SMALLEST content hash (``first`` over the ascending-ordered
    following frame) — arbitrary but run-deterministic, mirroring the
    backward variant's tiebreak."""
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.xxhash64(*[F.col(c) for c in value_cols]).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    # __side 0 (probe) sorts before 1 (reference) at equal __t → forward
    # as-of includes exact-timestamp matches; __tb makes the pick among
    # duplicate-timestamp reference rows deterministic
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.first(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 0).select(
        *lcols, *[f"{c}{suffix}" for c in value_cols]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    suffix: str = "_nearest",
) -> DataFrame:
    """For each left row, attach the TEMPORALLY CLOSEST right row in
    either direction within the same ``on`` key (ties go backward — the
    at-or-before match). The sensor-fusion variant of as-of: align a
    reading with whichever reference sample is nearest, not merely the
    last one.

    Single-pass composition: ONE tagged union, ONE key-partitioned sort
    serving BOTH direction windows (last-ignorenulls preceding =
    backward carry, first-ignorenulls following = forward carry), then a
    per-row arithmetic pick. Same cost shape as one as-of join — one
    shuffle on the key, no second sort, no range explosion.

    Internal carry semantics (matters if you reuse the ``__b_``/``__f_``
    columns): right rows sort BEFORE probe rows at equal timestamps, so
    the backward carry is at-or-before (owns exact matches) while the
    forward carry is STRICTLY-after by construction — the opposite of
    ``asof_join_forward``'s at-or-after. The nearest result is still
    correct: an exact match has delta_b == 0 <= delta_f, so the backward
    side wins the pick.

    Duplicate-timestamp right rows: carried deterministically via a
    content-hash tiebreak in the window ordering (greatest hash wins
    backward, smallest wins forward — arbitrary but stable across runs;
    shared with the backward/forward variants).

    Output: all left columns + ``{col}{suffix}`` per value col +
    ``{suffix}_dir`` ('b'/'f', 'b' when unmatched both ways)."""
    lcols = left.columns
    vcols = list(dict.fromkeys([right_time, *value_cols]))
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in vcols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.xxhash64(*[F.col(c) for c in vcols]).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in vcols],
    )
    wb = (
        W.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in vcols
        ],
        *[
            F.first(f"__v_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in vcols
        ],
    )
    probes = carried.filter(F.col("__side") == 1)
    bt = F.col(f"__b_{right_time}")
    ft = F.col(f"__f_{right_time}")
    delta_b = F.col("__t").cast("double") - bt.cast("double")
    delta_f = ft.cast("double") - F.col("__t").cast("double")
    take_b = ft.isNull() | (bt.isNotNull() & (delta_b <= delta_f))
    picked = [
        F.when(take_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    direction = F.when(take_b, F.lit("b")).otherwise(F.lit("f")).alias(f"{suffix}_dir")
    return probes.select(*lcols, *picked, direction)


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance_s: int,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join with a match-age bound — pandas
    ``merge_asof(..., tolerance=...)`` parity: the carried right row
    must satisfy ``left_time - tolerance_s <= right_time <= left_time``;
    older matches are treated as no-match (all carried columns NULL).

    Built on asof_join_backward by additionally carrying the reference
    timestamp and NULLing every carried column where the age exceeds
    the bound — one extra projection, no second window or join. The
    duplicate-timestamp determinism tiebreak is inherited.
    """
    carry = list(value_cols)
    if right_time not in carry:
        carry.append(right_time)
    out = asof_join_backward(left, right, on, left_time, right_time, carry, suffix)
    matched_t = F.col(f"{right_time}{suffix}")
    ok = (
        F.col(left_time).cast("double") - matched_t.cast("double") <= F.lit(tolerance_s)
    )
    cols = []
    for c in left.columns:
        cols.append(F.col(c))
    for c in carry:
        cols.append(F.when(ok, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}"))
    return out.select(*cols)
