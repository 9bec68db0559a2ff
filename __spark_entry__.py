"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 over sf0.001);
``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the north-star extensions; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for each (omitted only for non-SQL-expressible operators, which
get the weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_data_peri_institute_spark.plans import catalog as _catalog

_catalog.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + north star."""
    return {name: qd.fn for name, qd in _catalog.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (same column aliases)."""
    return dict(_catalog.ORACLES)
