"""Sinks: a parquet-backed table store with INSERT / UPSERT semantics
plus the audit-CSV sink for rejected rows.

Replaces the reference's PostgREST sink (etl/load.py:260-346 — 100-row
JSON batches, 0.5 s pauses, retry/backoff ≈ 200 rows/s ceiling) with
parquet writes: Spark's task retries subsume the retry loop, and
throughput scales with executors instead of an HTTP rate limit.

UPSERT (reference etl/load.py:283 — insert-or-update on PK) without a
Delta/Iceberg jar in this image is emulated as anti-join + union +
atomic directory swap: target rows whose PK collides with incoming are
replaced. On a real deployment this is one ``MERGE INTO`` against Delta/
Iceberg — the surrounding plan (dedup → integrity → merge) is identical.
A JDBC variant is the same ``df.write.jdbc(mode="append")`` call plus a
staging-table MERGE; stubbed here (no database in the image).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class ParquetStore:
    """Directory-per-table parquet 'database' used by the pipeline and
    its tests. At scale each table is a partitioned object-store prefix
    (transactional tables date-partitioned so incremental filters prune)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        if self.exists(table):
            return self.spark.read.parquet(self.path(table))
        if schema is None:
            raise FileNotFoundError(table)
        return self.spark.createDataFrame([], schema)

    def insert(self, df: DataFrame, table: str) -> int:
        """Append-only INSERT (reference insert mode, etl/load.py:285)."""
        n = df.count()
        if n:
            df.write.mode("append").parquet(self.path(table))
        return n

    def upsert(self, df: DataFrame, table: str, pk: str) -> int:
        """Insert-or-update on PK (reference upsert, etl/load.py:283).

        anti-join keeps non-colliding target rows; union with incoming;
        write to a temp dir and swap so a failed write never corrupts
        the table (poor-man's MERGE INTO; see module docstring).
        """
        n = df.count()
        if not n:
            return 0
        if self.exists(table):
            current = self.read(table)
            kept = current.join(df.select(pk).distinct(), pk, "left_anti")
            merged = kept.unionByName(df)
        else:
            merged = df
        tmp = tempfile.mkdtemp(dir=self.root, prefix=f".{table}_stage_")
        merged.write.mode("overwrite").parquet(tmp)
        final = self.path(table)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        return n


def audit_csv(df: DataFrame, out_dir: str, reason: str) -> str | None:
    """S8: back up rejected rows to a timestamped CSV (reference
    etl/load.py:114-122,141-151,183-190; artifacts retained by CI —
    daily-etl.yml:48-55). Returns the written path, or None if empty."""
    rows = df.limit(100001).collect()
    if not rows:
        return None
    os.makedirs(out_dir, exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    path = os.path.join(out_dir, f"{reason}_{stamp}.csv")
    import csv

    with open(path, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(df.columns)
        writer.writerows([tuple(r) for r in rows])
    return path
