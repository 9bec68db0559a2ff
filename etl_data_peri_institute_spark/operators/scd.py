"""SCD Type-2 (slowly changing dimension) / CDC fold — MERGE-less.

The reference's UPSERT overwrites history (etl/load.py:283); SCD2 keeps
it: every key change closes the current version (valid_to, is_current =
false) and opens a new one. Without a Delta/Iceberg MERGE in this image,
the emulation is the standard anti-join + union rewrite (the guide's
CDC/SCD2 pattern): one shuffle on the key, then an atomic swap via the
ParquetStore. The changed-key set is snapshot-diff-sized (unbounded at
scale), so it is never force-broadcast — AQE promotes it when small. On Delta this whole function is one ``MERGE INTO`` with
``whenMatchedUpdate`` + insert — the surrounding plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def scd2_init(snapshot: DataFrame, effective_date: str) -> DataFrame:
    """First load: every row becomes an open version."""
    return snapshot.select(
        "*",
        F.lit(effective_date).alias("valid_from"),
        F.lit(OPEN_END).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    pk: str,
    compare_cols: list[str],
    effective_date: str,
) -> DataFrame:
    """Fold a new snapshot of ``updates`` into the SCD2 table ``dim``.

    - unchanged keys: kept as-is;
    - changed keys: current version closed at effective_date, new open
      version appended;
    - new keys: open version appended.
    Deletes are out of scope (append-only source, like the reference).
    """
    changed_flag = F.lit(False)
    for c in compare_cols:
        changed_flag = changed_flag | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))

    cur = dim.filter(F.col("is_current")).alias("cur")
    upd = updates.alias("upd")

    joined = cur.join(upd, F.col(f"cur.{pk}") == F.col(f"upd.{pk}"), "inner")
    changed_keys = joined.filter(changed_flag).select(F.col(f"cur.{pk}").alias(pk))

    # close current versions of changed keys
    closed = (
        dim.filter(F.col("is_current"))
        .join(changed_keys, pk, "left_semi")
        .withColumn("valid_to", F.lit(effective_date))
        .withColumn("is_current", F.lit(False))
    )
    untouched_current = dim.filter(F.col("is_current")).join(
        changed_keys, pk, "left_anti"
    )
    history = dim.filter(~F.col("is_current"))

    # new versions: changed keys + brand-new keys
    new_keys = upd.join(dim.filter(F.col("is_current")), pk, "left_anti")
    new_versions = (
        updates.join(changed_keys, pk, "left_semi")
        .unionByName(new_keys)
        .select(
            "*",
            F.lit(effective_date).alias("valid_from"),
            F.lit(OPEN_END).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return history.unionByName(untouched_current).unionByName(closed).unionByName(new_versions)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: str,
    compare_cols: list[str],
) -> DataFrame:
    """CDC changelog between two snapshots: one row per key whose state
    changed, with op ∈ {'I' (insert), 'U' (update), 'D' (delete)} and
    the old/new values of the compared columns. Unchanged keys are
    dropped.

    This is the diff step of a snapshot-based CDC pipeline (the inverse
    of scd2_apply's input contract: feed snapshot_diff's I/U rows in as
    updates, its D rows as soft deletes). One full-outer shuffle join on
    the key — no broadcast (both sides are table-sized); null-safe
    compare via a struct equality so NULL→value transitions register as
    updates."""
    o = old.select(F.col(pk).alias("__ok"), *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(F.col(pk).alias("__nk"), *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    changed = ~F.struct(*[F.col(f"old_{c}") for c in compare_cols]).eqNullSafe(
        F.struct(*[F.col(f"new_{c}").alias(f"old_{c}") for c in compare_cols])
    )
    return (
        o.join(n, F.col("__ok") == F.col("__nk"), "full_outer")
        .filter(F.col("__ok").isNull() | F.col("__nk").isNull() | changed)
        .select(
            F.coalesce(F.col("__ok"), F.col("__nk")).alias(pk),
            F.when(F.col("__ok").isNull(), "I")
            .when(F.col("__nk").isNull(), "D")
            .otherwise("U")
            .alias("op"),
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
