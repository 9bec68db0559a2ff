"""SQL entry point: register the catalog and run Spark SQL directly.

The reference has no query language (SURVEY.md header); the engine
exposes the full Spark SQL surface over the registered tables — same
Catalyst plans as the DataFrame API, so every optimization and gate
query applies identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.tables import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register all testdata tables as temp views and execute ``query``."""
    register_views(spark, sf_dir)
    return spark.sql(query)
