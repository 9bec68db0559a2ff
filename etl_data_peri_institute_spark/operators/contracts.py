"""Data-contract validation: declarative expectations → violations report.

The generalization of the reference's hand-rolled checks (required-null
split, FK guard, strict casts — operators/integrity.py): a table owner
states the contract (non-null columns, unique keys, accepted value
domains, numeric ranges) and gets back one small report frame with a
violation count per rule — the dbt-tests / Great-Expectations shape,
implemented as a SINGLE aggregation pass.

Scale: every rule compiles to an aggregate over the same scan — adding
rules adds agg columns, not jobs or scans. Uniqueness uses the
count-minus-countDistinct identity, so it rides the same aggregation
(Catalyst expands multi-distinct into one shuffle stage). Row-level
violation EXTRACTION (which rows failed) is a separate filter the
caller runs per failed rule — the report stays group-cardinality-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contract_report(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    accepted: dict[str, list] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """One row per rule: (rule, column, n_violations, passed).

    ``accepted`` maps column → allowed values (NULL counts as a
    violation — use ``not_null`` semantics deliberately); ``ranges``
    maps column → closed [lo, hi] bounds (NULLs are not range
    violations; list them under ``not_null`` if they should fail)."""
    aggs = []
    labels: list[tuple[str, str]] = []  # (rule, column) per agg, in order
    for c in not_null or []:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"v{len(aggs)}"))
        labels.append(("not_null", c))
    for c in unique or []:
        aggs.append((F.count(c) - F.count_distinct(F.col(c))).alias(f"v{len(aggs)}"))
        labels.append(("unique", c))
    for c, vals in (accepted or {}).items():
        bad = ~F.col(c).isin(*vals) | F.col(c).isNull()
        aggs.append(F.sum(bad.cast("long")).alias(f"v{len(aggs)}"))
        labels.append(("accepted_values", c))
    for c, (lo, hi) in (ranges or {}).items():
        bad = (F.col(c) < lo) | (F.col(c) > hi)
        aggs.append(F.sum(bad.cast("long")).alias(f"v{len(aggs)}"))
        labels.append(("range", c))
    if not aggs:
        raise ValueError("contract_report: no rules given")
    report = df.agg(*aggs)
    # unpivot via explode over literal structs — no string-SQL, so rule
    # and column names need no quoting/escaping
    entries = F.array(
        *[
            F.struct(
                F.lit(rule).alias("rule"),
                F.lit(col).alias("column"),
                F.coalesce(F.col(f"v{i}"), F.lit(0)).cast("long").alias("n_violations"),
            )
            for i, (rule, col) in enumerate(labels)
        ]
    )
    return (
        report.select(F.explode(entries).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("e.column").alias("column"),
            F.col("e.n_violations").alias("n_violations"),
            (F.col("e.n_violations") == 0).alias("passed"),
        )
    )
