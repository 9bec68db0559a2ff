"""Format round-trips and partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_peri_institute_spark.sources.formats import (
    read_table,
    write_partitioned,
    write_table,
)
from etl_data_peri_institute_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path, fmt):
    df = load_table(spark, SF, "orders").limit(200)
    path = str(tmp_path / f"t_{fmt}")
    write_table(df, path, fmt)
    back = read_table(spark, path, fmt, schema=df.schema)
    assert back.count() == 200
    a = sorted(map(tuple, df.select("o_orderkey", "o_totalprice").collect()))
    b = sorted(map(tuple, back.select("o_orderkey", "o_totalprice").collect()))
    assert a == b


def test_unsupported_format_raises(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/tmp/x", "avro")


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, "ts")
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("dt") == "2024-01-05")
    # pruning is visible in the plan: PartitionFilters on dt, and the
    # count matches the source-side date filter
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "dt" in plan
    expected = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expected > 0
