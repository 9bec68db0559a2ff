"""Parquet table catalog for the synthetic TPC-H-ish testdata.

At cluster scale these would be external tables over object storage
(date-partitioned for the transactional ones so the incremental filters
prune partitions); locally they are single parquet files. Everything is
read through ``spark.read.parquet`` so Catalyst gets filter pushdown and
column pruning for free — no manual materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Timestamp normalization at the load boundary. The testdata has been
# generated with two different physical types across driver rounds:
#   * TIMESTAMP(NANOS): unreadable natively by Spark — read as raw nanos
#     (legacy conf) and convert to microsecond TimestampType (the same
#     truncation DuckDB applies);
#   * TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
#     TIMESTAMP_NTZ, which rejects arithmetic casts (e.g. to double)
#     that the plans rely on — cast to the session TimestampType (the
#     session is pinned to UTC, so the instant is the NTZ wall-clock
#     read as UTC, exactly DuckDB's naive-timestamp semantics).
# Both normalize to TimestampType(UTC) so every downstream plan sees one
# stable type regardless of which generator produced the files.
_NANO_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ->TimestampType cast below reads the wall-clock in the
    # session zone; the engine needs UTC to match DuckDB's naive
    # timestamps. session.py pins it at construction; a driver-owned
    # session that didn't go through session.py may not — set it there
    # too, but LOUDLY, because changing session.timeZone alters every
    # subsequent timestamp parse/format in that session, not just this
    # read.
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        import warnings

        warnings.warn(
            "load_table: overriding spark.sql.session.timeZone -> UTC "
            "(required for NTZ timestamp normalization; affects the whole "
            "session — construct sessions via session.get_spark to pin it "
            "up front)",
            stacklevel=2,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLUMNS.get(name, []):
        field = df.schema[col] if col in df.columns else None
        if field is None:
            continue
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API path)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
