"""File-format surface: parquet / ORC / CSV / JSON readers+writers and
date-partitioned layout helpers.

The reference reads one format (a Sheets grid) and writes one sink
(PostgREST); a general engine needs the standard format matrix. All
readers take explicit schemas (never ``inferSchema`` in production — it
double-scans and guesses) and all writers go through ``write_partitioned``
when the table has a time axis, so incremental date filters prune
partitions instead of scanning the corpus (the 100 TB story for F1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_READERS = {
    "parquet": lambda r, p: r.parquet(p),
    "orc": lambda r, p: r.orc(p),
    "csv": lambda r, p: r.option("header", True).csv(p),
    "json": lambda r, p: r.json(p),
}


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        fn = _READERS[fmt]
    except KeyError:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READERS)}")
    return fn(reader, path)


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write date-partitioned (dt=yyyy-MM-dd directories). A filter on
    ``dt`` — e.g. the daily incremental filter — then prunes partitions
    at planning time (PartitionFilters in the scan, zero data read for
    other days)."""
    out = df.withColumn("dt", F.date_format(ts_col, "yyyy-MM-dd"))
    writer = out.write.mode(mode).partitionBy("dt")
    getattr(writer, fmt)(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (and in-bucket sorted) external parquet
    table. Two tables bucketed on the same key into the same bucket
    count join WITHOUT a shuffle — each task reads matching bucket
    files from both sides (and the sortBy removes the sort too), which
    is how a 100 TB fact⋈fact equi-join avoids moving either table.
    The co-location survives restarts/engines because it lives in the
    table layout, not the session. Bucket count is a layout decision:
    pick ~(table size / target partition size), and keep it identical
    across tables meant to join."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Robust JSON-lines ingest: PERMISSIVE parse against the explicit
    schema with malformed lines captured in a corrupt-record column,
    split into (valid, quarantine). The landing-zone discipline for a
    100 TB crawl feed: one pass, bad bytes audited (raw line preserved
    verbatim for replay) instead of failing the job (FAILFAST) or
    silently vanishing (DROPMALFORMED).

    The returned quarantine frame is audit-ready for ``audit_csv``; the
    valid frame drops the marker column. Spark requires the corrupt
    column declared in the schema — this helper adds it so callers keep
    their clean business schema."""
    corrupt_col = "_corrupt_record"
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    # caching before the split is REQUIRED for correct corrupt-record
    # semantics: without it each branch re-parses and Spark may push the
    # isNull filter into the parser, changing which rows materialize
    df = df.cache()
    valid = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return valid, quarantine
