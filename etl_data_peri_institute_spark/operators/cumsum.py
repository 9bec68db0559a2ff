"""Distributed global running aggregates (cumsum / row_number / ntile).

The gate queries ``b_token_budget_selection``, ``a_pareto_abc`` and
``b_rfm_segmentation`` pin their SEMANTICS with an exact global ordered
window (``sum(x) OVER (ORDER BY ...)`` / ``ntile(4) OVER (ORDER BY
...)``) — fine as a correctness oracle, unusable as a production path:
Spark executes an un-partitioned window by moving the WHOLE frame to a
single partition (WindowExec warns exactly this). This module is the
distributed equivalent, the same upgrade ``b_shard_manifest`` got via
``sinks.write_sharded_corpus``:

1. ``repartitionByRange(n, *order)`` — Spark's sampled range partitioner
   places partition boundaries along the global order (reservoir sample
   of the keys; no global sort stage ever holds the frame).
2. ``sortWithinPartitions(*order)`` — each partition is locally sorted,
   so partition i's rows all precede partition i+1's rows in the global
   order (range partitions are emitted in boundary order).
3. A per-partition running sum via ``mapInArrow`` with a carry across
   batches — a NARROW op: no shuffle, no Python row-at-a-time loop,
   order preserved, and no pandas roundtrip (which would convert EVERY
   null-bearing int64 passthrough column to float64, corrupting values
   past 2^53). (The all-JVM alternative — a
   window partitioned by ``spark_partition_id()`` — would re-shuffle
   and re-sort the full frame on pid; the Arrow pass keeps the one
   range exchange as the only data-sized movement.)
4. Per-partition totals reduce to ONE row per partition (map-side
   partial aggregation), and the partitions-sized offset table — sized
   by the CLUSTER, not the data; a few thousand rows at most — is
   prefix-summed on the driver and re-attached as an array-literal
   lookup indexed by partition id (the grouped variant, whose offsets
   are keyed by (group, pid), broadcast-joins instead).

Result: exactly one data-sized shuffle (the range exchange), no
single-partition stage, and the grand total falls out for free (so
callers never need a ``sum() OVER ()`` companion window either).

Determinism: the caller must pass a TOTAL order (include a unique
tiebreak key, e.g. ``doc_id``); with a total order the result is
independent of where the sampled range boundaries fall.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame, functions as F, types as T

__all__ = [
    "global_running_sum",
    "global_row_number",
    "grouped_global_running_sum",
    "grouped_global_row_number",
    "ntile_from_rank",
    "grouped_ntile_from_rank",
]

_LOCAL = "__local_cum"
_PID = "__pid"
_OFFSET = "__offset"
_VAL = "__gsum_val"  # JVM-side null-coalesced copy of the value column

# Above this partition count the per-pid offsets attach via a broadcast
# join (the grouped variant's path) instead of a dense array literal: a
# 10^5-element literal repeated in every consumer's expression tree is a
# plan-size/codegen hazard, while cluster-scale thousands are fine
# (ADVICE r11 / r11 verdict item 3). The literal path stays the default
# because it drops a BroadcastExchange + join from every caller's plan.
_OFFSET_LITERAL_MAX = 8192


def _numeric_spark_type(dtype: T.DataType) -> T.DataType:
    """Running-sum output type: integral widens to long, else double
    (mirrors Spark's own sum() widening so the distributed result is
    type-identical to the global-window form)."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return T.LongType()
    return T.DoubleType()


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order_by: list[Column],
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, float]:
    """Global ordered running sum of ``value_col`` without a
    single-partition window.

    ``order_by`` must be a TOTAL order (include a unique tiebreak).
    Returns ``(frame with out_col appended, grand_total)`` — the grand
    total is a plain Python number (it was computed anyway for the
    offsets), so callers can embed it as a literal instead of running a
    ``sum() OVER ()`` global window.

    Semantics vs the global-window form (documented divergences):

    - NULL values count as 0 inside the running sum — identical to the
      window form everywhere EXCEPT an all-NULL prefix, where the
      window yields NULL until the first non-NULL and this operator
      yields 0.
    - DecimalType inputs widen to double (the window form keeps exact
      decimal); use the window form when exact decimal semantics are
      required.
    - Integral inputs accumulate in int64 end-to-end: nulls are
      coalesced to 0 on the JVM side BEFORE the Arrow handoff, so
      pandas receives a non-null int64 column (a null-bearing long
      column would arrive as float64 and silently round individual
      values past 2^53 before any cast could restore them) —
      bit-identical to the window form's long sum.

    Fault model: the frame is ``localCheckpoint``-ed (lazy,
    non-replicated); the totals collect is the first action, so it
    materializes the checkpoint and aggregates in one pass — building
    the operator therefore RUNS a Spark job, and an executor loss
    after the checkpoint is not recomputable from lineage (rerun the
    operator). On a real cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + reliable ``checkpoint()``
    if executor churn is expected.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    out_type = _numeric_spark_type(df.schema[value_col].dataType)
    # null->0 on the JVM side: Arrow then ships a NON-NULL int64/double
    # column, so integer accumulation is exact for every int64 value
    # (a nullable long would arrive in pandas as float64, corrupting
    # individual values past 2^53 before any cast could run)
    sanitized = df.withColumn(
        _VAL, F.coalesce(F.col(value_col).cast(out_type), F.lit(0).cast(out_type))
    )
    part = (
        sanitized.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(_PID, F.spark_partition_id())
    )

    schema = T.StructType(part.schema.fields + [T.StructField(_LOCAL, out_type)])
    is_int = isinstance(out_type, T.LongType)
    pa_type = pa.int64() if is_int else pa.float64()

    def local_cumsum(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # one call per partition; batches arrive in partition order, so a
        # scalar carry across batches yields the partition-local cumsum.
        # mapInArrow, NOT mapInPandas: the pandas roundtrip converts any
        # null-bearing int64 column — not just the value column, EVERY
        # passthrough column — to float64, silently corrupting values
        # past 2^53; Arrow batches carry all columns through exactly.
        carry = 0
        for batch in batches:
            vals = batch.column(batch.schema.get_field_index(_VAL)).to_numpy(
                zero_copy_only=False
            )  # non-null (JVM coalesce): int64/float64, exact
            run = np.cumsum(vals) + carry
            if len(run):
                carry = run[-1]
            yield batch.append_column(_LOCAL, pa.array(run, type=pa_type))

    local = part.mapInArrow(local_cumsum, schema)
    # LAZY checkpoint: the totals collect below is the first action, so
    # it both materializes the checkpoint AND aggregates in ONE pass;
    # the offset projection then reads the persisted blocks. (The
    # previous eager checkpoint spent a full extra pass — one job to
    # materialize, a second to aggregate totals — measured 2 jobs → 1
    # at identical results; at scale it is one fewer read of the
    # checkpointed frame.)
    local = local.localCheckpoint(eager=False)

    totals = (
        local.groupBy(_PID).agg(F.sum(value_col).alias("__ptotal")).collect()
    )  # partitions-sized (cluster-bounded, NOT data-sized): safe to collect
    by_pid = {r[_PID]: (r["__ptotal"] or 0) for r in totals}
    acc = 0
    dense: list = []  # offset per pid, DENSE over [0, n): element_at lookup
    for pid in range(n):
        dense.append(int(acc) if is_int else float(acc))
        acc += by_pid.get(pid, 0)
    grand_total = acc

    # partitions-sized offset table as an ARRAY LITERAL indexed by pid —
    # a narrow projection instead of the previous broadcast join (drops
    # the broadcast-build job and the join node from every caller's
    # plan; a few thousand literals at cluster partition counts is
    # well under expression-size limits). Guarded: past
    # _OFFSET_LITERAL_MAX partitions fall back to the broadcast join so
    # an extreme num_partitions cannot embed an extreme literal in
    # every consumer's plan (identical arithmetic either way).
    if n <= _OFFSET_LITERAL_MAX:
        off_arr = F.lit(dense).cast(T.ArrayType(out_type))
        out = local.withColumn(
            out_col, F.col(_LOCAL) + F.element_at(off_arr, F.col(_PID) + 1)
        ).drop(_PID, _LOCAL, _VAL)
        return out, grand_total
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in enumerate(dense)],
        T.StructType(
            [
                T.StructField(_PID, T.IntegerType()),
                T.StructField(_OFFSET, out_type),
            ]
        ),
    )
    out = (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col(_OFFSET))
        .drop(_PID, _LOCAL, _OFFSET, _VAL)
    )
    return out, grand_total


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Global 1-based row number over a total order, distributed — a
    running sum of 1s through the same range-partitioned machinery.
    Returns ``(frame, n_rows)``."""
    tagged = df.withColumn("__one", F.lit(1))
    out, n = global_running_sum(
        tagged, "__one", order_by, out_col=out_col, num_partitions=num_partitions
    )
    return out.drop("__one"), int(n)


def grouped_global_running_sum(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    order_by: list[Column],
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Per-group ordered running sum WITHOUT a per-group window — for
    the regime where one group dwarfs the rest (e.g. English is ~60% of
    a web corpus): ``sum(x) OVER (PARTITION BY g ORDER BY ...)`` sends
    the whole hot group to ONE task, which is the same single-partition
    pathology :func:`global_running_sum` removes for the global case.

    Same machinery, group-aware: range-partition on
    ``(group_cols..., order_by...)`` — groups occupy contiguous
    partition ranges and a hot group simply spans MANY partitions — then
    an Arrow local cumsum whose carry resets on group change, then
    per-``(partition, group)`` offsets (contiguity bounds that table at
    ~partitions + touched-groups rows) prefix-summed per group on the
    driver and broadcast back.

    ``order_by`` must totally order rows WITHIN each group (unique
    tiebreak). Group key columns must be non-null (pandas groupby drops
    null keys; enforce upstream). Returns ``(frame with out_col,
    {group_tuple: group_total})`` — the totals dict is groups-sized, so
    callers can broadcast-join it instead of running a
    ``sum() OVER (PARTITION BY g)`` companion window. NULL-value,
    decimal, int64-exactness and checkpoint semantics are identical to
    :func:`global_running_sum` (see its docstring)."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    gsort = [F.asc(c) for c in group_cols]
    out_type = _numeric_spark_type(df.schema[value_col].dataType)
    sanitized = df.withColumn(  # see global_running_sum: exact int64
        _VAL, F.coalesce(F.col(value_col).cast(out_type), F.lit(0).cast(out_type))
    )
    part = (
        sanitized.repartitionByRange(n, *gsort, *order_by)
        .sortWithinPartitions(*gsort, *order_by)
        .withColumn(_PID, F.spark_partition_id())
    )

    schema = T.StructType(part.schema.fields + [T.StructField(_LOCAL, out_type)])
    is_int = isinstance(out_type, T.LongType)
    pa_type = pa.int64() if is_int else pa.float64()

    def local_cumsum(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # rows arrive group-contiguous and ordered; a vectorized
        # SEGMENTED cumsum per batch (numpy over Arrow arrays — see
        # global_running_sum for why not mapInPandas) + a (key, value)
        # carry across batches yields the partition-local per-group
        # cumsum. Segment boundaries: any group column differs from the
        # previous row.
        carry_key: tuple | None = None
        carry = 0
        for batch in batches:
            n_rows = batch.num_rows
            if not n_rows:
                yield batch.append_column(_LOCAL, pa.array([], type=pa_type))
                continue
            keys = [
                batch.column(batch.schema.get_field_index(c)).to_numpy(
                    zero_copy_only=False
                )
                for c in group_cols
            ]
            starts = np.zeros(n_rows, dtype=bool)
            starts[0] = True
            for arr in keys:
                starts[1:] |= arr[1:] != arr[:-1]
            vals = batch.column(batch.schema.get_field_index(_VAL)).to_numpy(
                zero_copy_only=False
            )
            cum = np.cumsum(vals)
            start_pos = np.flatnonzero(starts)
            base = cum[start_pos] - vals[start_pos]  # cumsum BEFORE each segment
            seg = np.cumsum(starts) - 1
            run = cum - base[seg]
            first_key = tuple(arr[0] for arr in keys)
            if carry_key is not None and first_key == carry_key:
                # sorted input: the carried group is exactly the leading
                # segment of this batch
                run = run + np.where(seg == 0, carry, 0)
            carry_key = tuple(arr[-1] for arr in keys)
            carry = run[-1]
            yield batch.append_column(_LOCAL, pa.array(run, type=pa_type))

    local = part.mapInArrow(local_cumsum, schema)
    # lazy checkpoint, same fusion as global_running_sum: the totals
    # collect materializes the checkpoint in the same pass
    local = local.localCheckpoint(eager=False)

    totals = (
        local.groupBy(_PID, *group_cols)
        .agg(F.sum(value_col).alias("__ptotal"))
        .collect()
    )  # ~partitions + touched-groups rows (group-contiguity): safe to collect
    by_group: dict[tuple, dict[int, object]] = {}
    for r in totals:
        gkey = tuple(r[c] for c in group_cols)
        by_group.setdefault(gkey, {})[r[_PID]] = r["__ptotal"] or 0
    offset_rows: list[tuple] = []
    group_totals: dict[tuple, object] = {}
    for gkey, pids in by_group.items():
        acc = 0
        for pid in sorted(pids):
            offset_rows.append((*gkey, pid, int(acc) if is_int else float(acc)))
            acc += pids[pid]
        group_totals[gkey] = int(acc) if is_int else float(acc)

    off_schema = T.StructType(
        [part.schema[c] for c in group_cols]
        + [T.StructField(_PID, T.IntegerType()), T.StructField(_OFFSET, out_type)]
    )
    off_df = spark.createDataFrame(offset_rows, off_schema)
    out = (
        local.join(F.broadcast(off_df), [_PID, *group_cols])
        .withColumn(out_col, F.col(_LOCAL) + F.col(_OFFSET))
        .drop(_PID, _LOCAL, _OFFSET, _VAL)
    )
    return out, group_totals


def grouped_global_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Per-group 1-based row number over a within-group total order,
    distributed — a grouped running sum of 1s. Returns
    ``(frame, {group_tuple: group_n_rows})``."""
    tagged = df.withColumn("__one", F.lit(1))
    out, totals = grouped_global_running_sum(
        tagged, "__one", group_cols, order_by, out_col=out_col,
        num_partitions=num_partitions,
    )
    return out.drop("__one"), {k: int(v) for k, v in totals.items()}


def ntile_from_rank(rank: Column, n_rows: int, k: int) -> Column:
    """Exact ``ntile(k)`` bucket from a global 1-based rank and the
    (driver-known) row count — SQL ntile semantics: bucket sizes differ
    by at most one, larger buckets first. Pure integer arithmetic, so
    the distributed result is bit-identical to the window form."""
    extra = n_rows % k  # first `extra` buckets hold big rows each
    big = n_rows // k + 1
    small = n_rows // k
    if small == 0:  # fewer rows than buckets: rank IS the bucket
        return rank.cast("int")
    return (
        F.when(rank <= extra * big, F.floor((rank - 1) / big) + 1)
        .otherwise(extra + F.floor((rank - 1 - extra * big) / small) + 1)
        .cast("int")
    )


def grouped_ntile_from_rank(rank: Column, n_rows: Column, k: int) -> Column:
    """Exact per-group ``ntile(k) OVER (PARTITION BY g ORDER BY ...)``
    from a per-group 1-based rank (:func:`grouped_global_row_number`)
    and a per-group row count COLUMN (broadcast-joined from that
    function's totals dict). Same SQL ntile semantics as
    :func:`ntile_from_rank` — bucket sizes differ by at most one,
    larger buckets first — but with the group size as a Column, the
    ``n < k`` degenerate case must also be an expression: when a group
    has fewer rows than buckets, the rank IS the bucket. Pure integer
    arithmetic; bit-identical to the per-group window form."""
    extra = n_rows % k
    big = F.floor(n_rows / k) + 1
    small = F.floor(n_rows / k)
    return (
        F.when(small == 0, rank)
        .when(rank <= extra * big, F.floor((rank - 1) / big) + 1)
        .otherwise(extra + F.floor((rank - 1 - extra * big) / small) + 1)
        .cast("int")
    )
