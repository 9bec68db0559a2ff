"""Streaming distribution-drift monitor: incrementally-maintained bin
counts (exactly-once via the checkpointed file stream + epoch-guarded
merge of ``incremental_rollup``) compared against a FROZEN baseline
binning — the production form of the batch ``a_psi_drift`` gate query.

Why incremental: a drift monitor re-reading the whole current period
per evaluation is O(history) per tick; here each drain touches only the
new files plus the bin-cardinality-sized count table, and PSI is a
read-time derivation over those counts. The baseline's bin edges are
frozen at deployment (the training distribution), so scores stay
comparable across the monitor's lifetime — the same discipline the
batch query pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import ParquetStore
from .incremental import incremental_rollup

PSI_BINS = 10


def _bin_col(value_col: str, lo: float, hi: float, bins: int):
    width = (hi - lo) / bins
    return F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / width).cast("int"), F.lit(0)),
        F.lit(bins - 1),
    )


def baseline_bins(
    df: DataFrame, type_col: str = "event_type", value_col: str = "value",
    lo: float = 0.0, hi: float = 500.0, bins: int = PSI_BINS,
) -> DataFrame:
    """Freeze the baseline: (type, bin, n_base). Bin-cardinality-sized."""
    return (
        df.select(type_col, _bin_col(value_col, lo, hi, bins).alias("bin"))
        .groupBy(type_col, "bin")
        .agg(F.count("*").alias("n_base"))
    )


def drift_monitor_drain(
    spark: SparkSession,
    source_dir: str,
    schema,
    store: ParquetStore,
    table: str,
    checkpoint_dir: str,
    type_col: str = "event_type",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 500.0,
    bins: int = PSI_BINS,
) -> None:
    """Drain currently-available files into the incrementally-merged
    (type, bin) count table — exactly once per file, idempotent per
    epoch (see incremental_rollup)."""
    def add_bin(df: DataFrame) -> DataFrame:
        return df.select(type_col, _bin_col(value_col, lo, hi, bins).alias("bin"))

    incremental_rollup(
        spark, source_dir, schema, store, table, checkpoint_dir,
        group_cols=[type_col, "bin"],
        sum_cols={"n_cur": "count"},
        transform=add_bin,
    )


def psi_report(
    store: ParquetStore, table: str, baseline: DataFrame,
    type_col: str = "event_type", bins: int = PSI_BINS,
) -> DataFrame:
    """PSI per type from the maintained counts vs the frozen baseline —
    a read-time derivation over two bin-cardinality-sized frames
    (add-half smoothing keeps empty bins finite, exactly the batch
    a_psi_drift arithmetic)."""
    cur = store.read(table)
    joined = baseline.join(cur, [type_col, "bin"], "full").fillna(
        0, subset=["n_base", "n_cur"]
    )
    tot = joined.groupBy(type_col).agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    terms = joined.join(tot, type_col).select(
        type_col,
        ((F.col("n_base") + 0.5) / (F.col("tb") + 0.5 * bins)).alias("p"),
        ((F.col("n_cur") + 0.5) / (F.col("tc") + 0.5 * bins)).alias("q"),
    )
    return (
        terms.groupBy(type_col)
        .agg(F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 4).alias("psi"))
        .orderBy(type_col)
    )
